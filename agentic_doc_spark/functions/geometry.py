"""Grounding-box geometry (SURVEY.md P5, F3, K2 plumbing).

Reference semantics (agentic_doc/utils.py:172-211): clamp normalized
coords to [0,1], convert to pixels with floor(left/top) / ceil(right/bottom),
clamp to the image, and reject degenerate boxes. All pure JVM expressions.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def clamp01(c: Column) -> Column:
    """P5: clamp a normalized coordinate into [0,1] (utils.py:184-190)."""
    return F.greatest(F.lit(0.0), F.least(F.lit(1.0), c))


def clamp_box(box: Column) -> Column:
    """Clamp a box struct <l,t,r,b> into the unit square."""
    return F.struct(
        clamp01(box["l"]).alias("l"),
        clamp01(box["t"]).alias("t"),
        clamp01(box["r"]).alias("r"),
        clamp01(box["b"]).alias("b"),
    )


def box_to_pixels(box: Column, width: Column, height: Column) -> Column:
    """F3: normalized → pixel coords — floor on l/t, ceil on r/b, clamped
    to the raster (utils.py:193-208). Returns <x0,y0,x1,y1> ints."""
    cb = clamp_box(box)
    x0 = F.floor(cb["l"] * width).cast("int")
    y0 = F.floor(cb["t"] * height).cast("int")
    x1 = F.least(F.ceil(cb["r"] * width).cast("int"), width.cast("int"))
    y1 = F.least(F.ceil(cb["b"] * height).cast("int"), height.cast("int"))
    return F.struct(
        x0.alias("x0"), y0.alias("y0"), x1.alias("x1"), y1.alias("y1")
    )


def box_is_valid(box: Column) -> Column:
    """Degenerate-box predicate: r>l and b>t after clamping
    (integ invariant tests/integ/test_parse_integ.py:375-401)."""
    cb = clamp_box(box)
    return (cb["r"] > cb["l"]) & (cb["b"] > cb["t"])
