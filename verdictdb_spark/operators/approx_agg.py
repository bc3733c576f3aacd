"""Generic distributed sketch aggregation: partition partials + tree merge.

This is the rebuild of the reference's progressive-aggregation core —
partial aggregates per block (``ola/AsyncQueryExecutionPlan.java:149-340``)
combined pairwise in arbitrary tree shapes
(``ola/AggCombinerExecutionNode.composeUnionQuery:116-184``, stacking
``AsyncQueryExecutionPlan.java:314-326``) — re-expressed Spark-first:

* **Build** is map-side only: one ``mapInPandas`` pass computes a
  partial sketch per (input partition x group).  Raw rows are NEVER
  shuffled — the only thing that moves is a few-KB state per group
  per partition.  Hashing happens JVM-side (``xxhash64`` inside
  whole-stage codegen) before the Arrow boundary, so the Python side
  only does numpy array math.
* **Merge** is a logarithmic tree of ``applyInPandas`` rounds
  (north_rule: "per-partition partial sketches merged in a
  logarithmic tree reduce").  Each round buckets partials by
  ``pmod(xxhash64(partition_id), width)`` so a group with millions of
  partials (the skew case — one mega-repo) never funnels into a
  single task until its partial count is below ``fanin``.
* **Skew**: the build stage needs no salting at all (partials are
  per-partition, so a hot group just yields one partial per
  partition); the tree merge IS the salted two-stage combine.

At 100 TB / 10^12 rows: stage 1 is embarrassingly parallel over
~100k input splits; each split emits |groups-in-split| states
(bounded by distinct groups, e.g. repo x lang); the merge tree is
depth ceil(log_fanin(#splits)) = 3 rounds at fanin 64 — each round a
small shuffle of sketch states, KBs per group.
"""

from __future__ import annotations

import time
from math import ceil
from typing import Any, Callable, Iterator, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

GROUP_ALL = "__all__"  # sentinel group key for global (ungrouped) sketches

LINEAGE_FIELDS = [
    T.StructField("part_id", T.IntegerType()),
    T.StructField("n_rows", T.LongType()),
    T.StructField("checksum", T.LongType()),
    T.StructField("wall_ms", T.DoubleType()),
]


def _group_schema(df: DataFrame, group_by: Sequence[str]) -> list[T.StructField]:
    if not group_by:
        return [T.StructField(GROUP_ALL, T.IntegerType())]
    by_name = {f.name: f for f in df.schema.fields}
    return [by_name[g] for g in group_by]


def _value_column(col: str | Column, input_kind: str) -> Column:
    """JVM-side value preparation: hash or numeric cast, never Python."""
    c = F.col(col) if isinstance(col, str) else col
    if input_kind == "hash":
        return F.xxhash64(c)
    if input_kind == "double":
        return c.cast("double")
    if input_kind == "long":
        return c.cast("long")
    raise ValueError(f"unknown input_kind {input_kind!r}")


def build_partials(
    df: DataFrame,
    sketch: Any,
    value: str | Column,
    group_by: Sequence[str] = (),
    input_kind: str = "hash",
) -> DataFrame:
    """Stage 1: per-(partition x group) partial sketch states, map-side only.

    Returns DataFrame: group cols + state(binary) + lineage
    (part_id, n_rows, checksum, wall_ms).  The checksum is the
    xor-fold of the row hashes/values in the partial — persisted with
    the partial so a resumed run can verify per-partition integrity
    (north_rule: "per-partition lineage and metrics persisted").
    """
    group_by = list(group_by)
    gfields = _group_schema(df, group_by)
    out_schema = T.StructType(
        gfields + [T.StructField("state", T.BinaryType())] + LINEAGE_FIELDS
    )
    gcols = group_by if group_by else []
    raw = F.col(value) if isinstance(value, str) else value
    sel = [F.col(g) for g in gcols] + [_value_column(value, input_kind).alias("_v")]
    prepared = df.where(raw.isNotNull()).select(*sel)
    gnames = [f.name for f in gfields]

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        t0 = time.monotonic()
        pid = TaskContext.get().partitionId() if TaskContext.get() else -1
        acc: dict[tuple, Any] = {}
        nrows: dict[tuple, int] = {}
        cksum: dict[tuple, int] = {}
        for pdf in batches:
            if len(pdf) == 0:
                continue
            vals = pdf["_v"]
            if gcols:
                grouped = pdf.groupby(gcols, sort=False, dropna=False).indices
            else:
                grouped = {(0,): np.arange(len(pdf))}
            for key, idx in grouped.items():
                k = key if isinstance(key, tuple) else (key,)
                v = vals.to_numpy()[idx]
                v = v[~pd.isna(v)] if v.dtype == object else v
                st = sketch.build(v)
                acc[k] = sketch.merge(acc[k], st) if k in acc else st
                nrows[k] = nrows.get(k, 0) + len(idx)
                x = np.bitwise_xor.reduce(v.astype(np.int64, copy=False)) if len(v) else 0
                cksum[k] = cksum.get(k, 0) ^ int(x)
        wall = (time.monotonic() - t0) * 1e3
        rows = []
        for k, st in acc.items():
            rows.append(
                list(k)
                + [sketch.to_bytes(st), pid, nrows[k], cksum[k], wall / max(len(acc), 1)]
            )
        yield pd.DataFrame(rows, columns=gnames + ["state", "part_id", "n_rows", "checksum", "wall_ms"])

    return prepared.mapInPandas(build, out_schema)


def tree_merge(
    partials: DataFrame,
    sketch: Any,
    group_by: Sequence[str] = (),
    fanin: int = 64,
    n_partials_hint: int | None = None,
) -> DataFrame:
    """Stage 2: logarithmic tree-reduce of partial states per group.

    Each round shrinks the per-group partial count by ``fanin`` via an
    ``applyInPandas`` over (group, bucket) where bucket spreads a hot
    group's partials across ``width`` reducers.  Terminates with one
    state per group.
    """
    gnames = list(group_by) if group_by else [GROUP_ALL]
    gfields = [f for f in partials.schema.fields if f.name in gnames]
    merged_schema = T.StructType(gfields + [T.StructField("state", T.BinaryType())])
    bucket_schema = T.StructType(
        gfields + [T.StructField("_bkt", T.IntegerType()), T.StructField("state", T.BinaryType())]
    )

    def merge_group(pdf: pd.DataFrame) -> pd.DataFrame:
        states = [sketch.from_bytes(b) for b in pdf["state"]]
        acc = states[0]
        for s in states[1:]:
            acc = sketch.merge(acc, s)
        out = pdf.iloc[:1][gnames].copy()
        out["state"] = [sketch.to_bytes(acc)]
        return out

    def merge_bucketed(pdf: pd.DataFrame) -> pd.DataFrame:
        out = pdf.iloc[:1][gnames + ["_bkt"]].copy()
        states = [sketch.from_bytes(b) for b in pdf["state"]]
        acc = states[0]
        for s in states[1:]:
            acc = sketch.merge(acc, s)
        out["state"] = [sketch.to_bytes(acc)]
        return out

    cur = partials.select(*gnames, "state", "part_id")
    width = n_partials_hint or cur.sparkSession.sparkContext.defaultParallelism
    while width > fanin:
        width = ceil(width / fanin)
        cur = cur.withColumn("_bkt", F.pmod(F.xxhash64("part_id"), F.lit(width)).cast("int"))
        cur = (
            cur.groupBy(*gnames, "_bkt")
            .applyInPandas(merge_bucketed, bucket_schema)
            .withColumn("part_id", F.col("_bkt"))
        )
    return cur.groupBy(*gnames).applyInPandas(merge_group, merged_schema)


def sketch_agg(
    df: DataFrame,
    sketch: Any,
    value: str | Column,
    group_by: Sequence[str] = (),
    input_kind: str = "hash",
    fanin: int = 64,
) -> DataFrame:
    """Build + tree-merge: one merged state row per group."""
    partials = build_partials(df, sketch, value, group_by, input_kind)
    return tree_merge(partials, sketch, group_by, fanin=fanin)


def finalize(
    merged: DataFrame,
    sketch: Any,
    out_col: str,
    out_type: T.DataType,
    estimator: Callable[[Any, Any], Any] | None = None,
) -> DataFrame:
    """Apply the sketch's estimator to each merged state (tiny data)."""
    est = estimator or (lambda sk, st: sk.estimate(st))

    @F.pandas_udf(out_type)
    def _est(states: pd.Series) -> pd.Series:
        return pd.Series([est(sketch, sketch.from_bytes(b)) for b in states])

    out = merged.withColumn(out_col, _est(F.col("state"))).drop("state")
    if GROUP_ALL in out.columns:
        out = out.drop(GROUP_ALL)
    return out
