"""Bloom-filter membership: build over a key set, probe any DataFrame.

The scale use case: pre-filter the probe side of a selective join so
the big shuffle only carries rows that can match (a semi-join
pushdown the reference delegated to its backing DBMS).  The built
filter is a few MB of bits — broadcast to every task via closure.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..sketches.bloom import BloomSketch
from .approx_agg import sketch_agg


def build_bloom(
    df: DataFrame,
    col: str | Column,
    capacity: int | None = None,
    fpr: float = 0.01,
) -> tuple[BloomSketch, bytes]:
    """Build a Bloom filter over distinct values of ``col``.

    Returns (sketch, state_bytes); the state is small enough to
    broadcast.  When ``capacity`` is unknown, the build side is hashed
    ONCE into a spill-to-disk cache (compact 8-byte longs); both the
    NDV sizing pass and the filter build read the cached hashes, and
    the cache is released after the build.  At extreme build-side
    cardinality (where even 8 bytes/row of disk cache is unwelcome)
    pass ``capacity`` explicitly — sizing then costs nothing and the
    source is scanned once with no cache at all.
    """
    if capacity is None:
        from pyspark import StorageLevel

        c = F.col(col) if isinstance(col, str) else col
        hashes = (
            df.where(c.isNotNull())
            .select(F.xxhash64(c).alias("_h"))
            .persist(StorageLevel.DISK_ONLY)
        )
        try:
            ndv = hashes.select(F.approx_count_distinct("_h", 0.05).alias("n")).first()["n"]
            capacity = max(int(ndv * 1.3), 1024)
            sk = BloomSketch(capacity=capacity, fpr=fpr)
            merged = sketch_agg(hashes, sk, "_h", group_by=(), input_kind="prehashed")
            row = merged.select("state").first()
        finally:
            hashes.unpersist()
    else:
        sk = BloomSketch(capacity=capacity, fpr=fpr)
        merged = sketch_agg(df, sk, col, group_by=(), input_kind="hash")
        row = merged.select("state").first()
    if row is None:  # empty build side -> empty filter (matches nothing)
        return sk, sk.to_bytes(sk.empty())
    return sk, bytes(row["state"])


def bloom_contains_col(sk: BloomSketch, state: bytes, col: str | Column) -> Column:
    """Boolean Column: probable membership of ``col`` in the filter.

    Vectorized pandas UDF over JVM-computed hashes; the state bytes
    ride the closure (broadcast once per executor).
    """
    st = sk.from_bytes(state)

    @F.pandas_udf(T.BooleanType())
    def _contains(h: pd.Series) -> pd.Series:
        return pd.Series(sk.contains(st, h.to_numpy()))

    c = F.col(col) if isinstance(col, str) else col
    return _contains(F.xxhash64(c))


def bloom_prefilter(
    probe: DataFrame,
    probe_col: str,
    build: DataFrame,
    build_col: str,
    fpr: float = 0.01,
) -> DataFrame:
    """Filter ``probe`` down to rows whose key probably exists in
    ``build`` — run before a join to cut the shuffle volume.
    Zero false negatives: never drops a matching row."""
    sk, state = build_bloom(build, build_col, fpr=fpr)
    return probe.where(bloom_contains_col(sk, state, probe_col))
