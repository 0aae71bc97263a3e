"""Chunk classification + HTML boilerplate stripping.

The single semantic contract for span `kind` assignment and boilerplate
removal, implemented twice off the SAME regex constants:

- scalar Python (``classify_kind`` / ``is_boilerplate``) — used by the
  pure-Python oracle in synth.py and by unit tests;
- vectorized pandas (``classify_frame``) — the Arrow-batched kernel the
  Spark pipeline runs inside mapInPandas (north rule: no per-row Python
  in the hot path; pandas .str ops are C-vectorized).

Kind vocabulary = reference ChunkType (agentic_doc/common.py:22-26:
text|table|figure|marginalia) + 'media' for pure media spans. Boilerplate
stripping (nav/footer/aside DOM heuristics + anchor-link density) is the
north-rule addition with no reference analog (SURVEY.md §2 end note);
the link-density heuristic follows the shallow-text-features approach of
Kohlschütter/Fankhauser/Nejdl, "Boilerplate detection using shallow text
features" (WSDM 2010).
"""

from __future__ import annotations

import re

import pandas as pd

# --- shared regex contract -------------------------------------------------

#: marginalia: page numbers, "Page N of M", roman-numeral folios
#: (reference chunk type 'marginalia', agentic_doc/common.py:26).
MARGINALIA_RE = re.compile(
    r"^\s*(?:page\s+\d+(?:\s+of\s+\d+)?|\d{1,4}|[ivxlcdm]{1,7})\s*$",
    re.IGNORECASE,
)

#: table: at least one line with two-or-more pipe-separated cells.
TABLE_RE = re.compile(r"\|.*\|")

#: boilerplate DOM containers (north rule: nav/footer/header/aside strip).
BOILER_TAG_RE = re.compile(r"<(?:nav|footer|aside)[\s>/]", re.IGNORECASE)

#: boilerplate phrase heuristics (cookie banners, copyright lines).
BOILER_PHRASE_RE = re.compile(
    r"(?:accept\s+(?:all\s+)?cookies|cookie\s+policy|all\s+rights\s+reserved"
    r"|©\s*\d{4}|terms\s+of\s+service|privacy\s+policy)",
    re.IGNORECASE,
)

#: anchor contents, for link-density: chars inside <a ...>...</a>.
ANCHOR_RE = re.compile(r"<a[\s>].*?</a>", re.IGNORECASE | re.DOTALL)
#: capturing variant — pandas extractall requires a capture group
ANCHOR_CAP_RE = re.compile(r"(<a[\s>].*?</a>)", re.IGNORECASE | re.DOTALL)
TAG_RE = re.compile(r"<[^>]+>")

#: corrupt marker: NUL byte in text, or kind literal 'corrupt' — triggers
#: the per-part failure path (reference per-page error semantics,
#: agentic_doc/parse.py:722-739).
CORRUPT_MARKER = "\x00"

LINK_DENSITY_THRESHOLD = 0.5


# --- scalar implementations (oracle / tests) -------------------------------


def link_density(text: str) -> float:
    """chars inside <a> anchors / total tag-stripped chars (0 if no text)."""
    if not text:
        return 0.0
    anchor_chars = sum(len(TAG_RE.sub("", m)) for m in ANCHOR_RE.findall(text))
    total = len(TAG_RE.sub("", text))
    return anchor_chars / total if total else 0.0


def is_boilerplate(text: str | None) -> bool:
    if not text:
        return False
    if BOILER_TAG_RE.search(text):
        return True
    if BOILER_PHRASE_RE.search(text):
        return True
    return link_density(text) > LINK_DENSITY_THRESHOLD


def is_corrupt(kind: str | None, text: str | None) -> bool:
    return kind == "corrupt" or bool(text and CORRUPT_MARKER in text)


def classify_kind(kind: str | None, text: str | None, media_ref: str | None) -> str:
    """Assign the final span kind. Pre-labeled kinds pass through;
    'raw'/None are classified by heuristic."""
    if kind in ("text", "table", "figure", "marginalia", "media"):
        return kind
    if media_ref is not None and media_ref != "":
        return "media" if not text else "figure"
    t = text or ""
    if TABLE_RE.search(t):
        return "table"
    if MARGINALIA_RE.match(t):
        return "marginalia"
    return "text"


# --- vectorized implementation (Spark kernel) ------------------------------


def _anchor_chars(s: pd.Series) -> pd.Series:
    """Total anchor-text chars per row, vectorized via extractall."""
    out = pd.Series(0, index=s.index, dtype="int64")
    hits = s.str.extractall(ANCHOR_CAP_RE)
    if not hits.empty:
        lengths = (
            hits[0]
            .str.replace(TAG_RE, "", regex=True)
            .str.len()
            .groupby(level=0)
            .sum()
        )
        out.loc[lengths.index] = lengths
    return out


def classify_frame(pdf: pd.DataFrame) -> pd.DataFrame:
    """Vectorized classify + strip over a span batch.

    Input columns: kind, text, media_ref. Adds: kind_out (final kind),
    keep (survives boilerplate strip), corrupt (part-failure trigger).
    Pure pandas .str ops — one Arrow batch in, one out.

    The expensive DOM work (tag strip, anchor extraction, link density)
    runs only on rows that contain '<' at all — on clean-text corpora
    that's ~zero rows, so the kernel degrades to the cheap regexes.
    """
    kind = pdf["kind"]
    text = pdf["text"].fillna("")
    media = pdf["media_ref"]

    known = kind.isin(["text", "table", "figure", "marginalia", "media"])
    has_media = media.notna() & (media != "")
    is_table = text.str.contains(TABLE_RE, na=False)
    is_marg = text.str.match(MARGINALIA_RE, na=False)

    kind_out = pd.Series("text", index=pdf.index, dtype="object")
    kind_out[is_marg] = "marginalia"
    kind_out[is_table & ~is_marg] = "table"
    kind_out[has_media] = "figure"
    kind_out[has_media & (text == "")] = "media"
    kind_out[known] = kind[known]

    boiler = text.str.contains(BOILER_PHRASE_RE, na=False)
    htmlish = text.str.contains("<", regex=False)
    if htmlish.any():
        ht = text[htmlish]
        stripped = ht.str.replace(TAG_RE, "", regex=True).str.len()
        anchor = _anchor_chars(ht)
        ld = anchor / stripped.replace(0, pd.NA)
        boiler.loc[htmlish] = (
            boiler[htmlish]
            | ht.str.contains(BOILER_TAG_RE, na=False)
            | (ld.fillna(0.0) > LINK_DENSITY_THRESHOLD)
        )

    corrupt = (kind == "corrupt") | text.str.contains(CORRUPT_MARKER, regex=False)

    out = pdf.copy()
    out["kind_out"] = kind_out
    out["keep"] = ~boiler
    out["corrupt"] = corrupt
    return out
