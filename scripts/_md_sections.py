"""Shared helper: replace one '## <title>' section of a markdown file in
place, preserving every other section (each bench script owns exactly one
section of BENCH/BASELINE.md)."""

from __future__ import annotations

from pathlib import Path


def replace_section(path: Path, title: str, body: str) -> None:
    """Replace the section starting at '\\n## {title}' (up to the next
    '\\n## ' heading or EOF) with ``body``; append the section if absent.
    ``body`` must already start with its own '## {title}' heading."""
    text = path.read_text()
    marker = f"\n## {title}"
    start = text.find(marker)
    if start == -1:
        path.write_text(text.rstrip() + "\n\n" + body.strip() + "\n")
        return
    nxt = text.find("\n## ", start + 1)
    tail = text[nxt:] if nxt != -1 else "\n"
    path.write_text(
        text[:start].rstrip() + "\n\n" + body.strip() + "\n" + tail
    )
