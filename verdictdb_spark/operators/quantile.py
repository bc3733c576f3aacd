"""Approximate quantiles via KLL or t-digest mergeable states.

Answers ``SELECT g, percentile(x, q) FROM t GROUP BY g`` (a
"future supported" aggregate in the reference's docs) with
distributed mergeable states instead of a sort.
"""

from __future__ import annotations

from typing import Sequence

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..sketches.kll import KllSketch
from ..sketches.tdigest import TDigestSketch
from .approx_agg import GROUP_ALL, sketch_agg


def _make_sketch(method: str, k: int, compression: float):
    if method == "kll":
        return KllSketch(k=k)
    if method == "tdigest":
        return TDigestSketch(compression=compression)
    raise ValueError(f"unknown quantile method {method!r}")


def approx_quantiles(
    df: DataFrame,
    col: str | Column,
    probabilities: Sequence[float],
    group_by: Sequence[str] = (),
    method: str = "kll",
    k: int = 256,
    compression: float = 200.0,
    out_col: str = "quantiles",
    fanin: int = 64,
) -> DataFrame:
    """Grouped approximate quantiles -> array<double> column.

    Plan: numeric cast JVM-side -> map-side partial KLL/t-digest per
    (partition x group) -> logarithmic tree merge -> interpolation.
    """
    sketch = _make_sketch(method, k, compression)
    probs = [float(p) for p in probabilities]
    merged = sketch_agg(df, sketch, col, group_by, input_kind="double", fanin=fanin)

    @F.pandas_udf(T.ArrayType(T.DoubleType()))
    def _q(states: pd.Series) -> pd.Series:
        return pd.Series([list(sketch.quantiles(sketch.from_bytes(b), probs)) for b in states])

    out = merged.withColumn(out_col, _q(F.col("state"))).drop("state")
    return out.drop(GROUP_ALL) if not group_by else out


def approx_quantiles_wide(
    df: DataFrame,
    col: str | Column,
    probabilities: Sequence[float],
    group_by: Sequence[str] = (),
    names: Sequence[str] | None = None,
    **kwargs,
) -> DataFrame:
    """Grouped approximate quantiles, one SCALAR double column per
    probability (``q25, q50, ...`` by default) — the flat shape that
    sorts/hashes cleanly in result canonicalizers and BI tools."""
    probs = [float(p) for p in probabilities]
    if names is None:
        names = [f"q{round(p * 100):02d}" for p in probs]
    if len(names) != len(probs):
        raise ValueError("names must match probabilities")
    arr = approx_quantiles(df, col, probs, group_by, out_col="_qarr", **kwargs)
    cols = list(group_by) + [F.col("_qarr")[i].alias(n) for i, n in enumerate(names)]
    return arr.select(*cols)


def quantile_sketch_table(
    df: DataFrame,
    col: str | Column,
    group_by: Sequence[str] = (),
    method: str = "kll",
    k: int = 256,
    compression: float = 200.0,
) -> DataFrame:
    """Merged quantile states for persistence / incremental merge."""
    return sketch_agg(df, _make_sketch(method, k, compression), col, group_by, input_kind="double")
