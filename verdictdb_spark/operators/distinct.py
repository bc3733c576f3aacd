"""Approximate COUNT(DISTINCT) — the flagship VerdictDB-class query.

Answers ``SELECT g..., COUNT(DISTINCT c) FROM t GROUP BY g...`` via a
mergeable HLL state per group (reference path:
``ScrambleTableReplacer.java:133-180`` hash-scramble substitution +
``SparkSyntax.getApproximateCountDistinct:132-134``).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import types as T

from ..sketches.hll import HllSketch
from .approx_agg import finalize, sketch_agg


def approx_count_distinct_by(
    df: DataFrame,
    col: str | Column,
    group_by: Sequence[str] = (),
    p: int = 12,
    out_col: str = "approx_ndv",
    fanin: int = 64,
) -> DataFrame:
    """Grouped approximate distinct count with rel. std. error 1.04/sqrt(2^p).

    Plan shape: JVM xxhash64 -> map-side partial HLLs (mapInPandas,
    no raw-row shuffle) -> logarithmic tree merge of 2^p-byte states
    -> estimate.  Survives 10^12 rows because only states shuffle.
    """
    sketch = HllSketch(p=p)
    merged = sketch_agg(df, sketch, col, group_by, input_kind="hash", fanin=fanin)
    out = finalize(merged, sketch, out_col, T.DoubleType())
    return out


def hll_sketch_table(
    df: DataFrame,
    col: str | Column,
    group_by: Sequence[str] = (),
    p: int = 12,
) -> DataFrame:
    """Return merged HLL states (group cols + state binary) for persistence
    / later incremental merge — the sketch analogue of a scramble table."""
    return sketch_agg(df, HllSketch(p=p), col, group_by, input_kind="hash")
