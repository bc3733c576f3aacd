"""Exact-size deterministic sampling (reservoir / stratified).

The reference's scrambles are *block* samples for progressive
aggregation; pipelines also need classic fixed-size samples — "give me
exactly n rows (per stratum)" for eval sets, spot checks, labeling
batches.  Spark has ``TABLESAMPLE``/``df.sample`` (Bernoulli — random
SIZE) and ``sampleBy`` (fractions, not counts); this provides exact-n,
deterministic (seeded-hash order, not RNG state), rerun-stable samples.

Scale design: the naive plan (row_number over a per-group window,
keep n) shuffles EVERY row to its group's reducer.  Here groups are
counted first (partial agg, tiny result), and each group is
pre-filtered to hash < oversample*n/count before the window — the
shuffle then carries ~oversample*n rows per group instead of the whole
group.  Hash uniformity makes undershoot astronomically rare
(Chernoff: P < exp(-n(o-1)^2/(2o)), ~1e-7 at n=64, o=2); a count-check
reruns any undershot group without the prefilter, so the n-row
contract is EXACT, not probabilistic.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..hashing import null_safe_group_key, unit_hash_col


def stratified_sample(
    df: DataFrame,
    n: int,
    group_by: Sequence[str] = (),
    seed: int = 42,
    oversample: float = 2.0,
) -> DataFrame:
    """Exactly ``min(n, group_size)`` rows per group, deterministic.

    Order within the sample is the seeded hash of the full row, so the
    same input always yields the same sample (append-only inputs keep
    previously sampled rows with probability (old_size/new_size) —
    standard reservoir semantics).
    """
    gcols = list(group_by)
    u = unit_hash_col(*[F.col(c) for c in df.columns], F.lit(seed))
    hashed = df.withColumn("_u", u)

    if not gcols:
        # global: orderBy(_u).limit(n) -> TakeOrderedAndProject, no
        # single-reducer window
        return hashed.orderBy("_u").limit(n).drop("_u")

    # null-safe synthetic group key: equi-joins drop NULL keys (null !=
    # null), but a null-keyed stratum is still a stratum
    hashed = hashed.withColumn("_gk", null_safe_group_key(*gcols))
    part = Window.partitionBy("_gk").orderBy("_u")

    def topn(src: DataFrame) -> DataFrame:
        return (
            src.withColumn("_rn", F.row_number().over(part))
            .where(F.col("_rn") <= n)
            .drop("_rn", "_u", "_gk")
        )

    counts = hashed.groupBy("_gk").agg(F.count(F.lit(1)).alias("_gn"))
    thr = F.least(F.lit(1.0), F.lit(float(oversample * n)) / F.col("_gn"))
    pre = hashed.join(F.broadcast(counts.withColumn("_thr", thr)), "_gk").where(
        F.col("_u") < F.col("_thr")
    )
    # materialize once: the undershoot check below AND the caller both
    # consume this frame — without a checkpoint the scan + broadcast
    # join + window pipeline would run twice
    sampled_k = (
        pre.drop("_gn", "_thr")
        .withColumn("_rn", F.row_number().over(part))
        .where(F.col("_rn") <= n)
        .drop("_rn", "_u")
        .localCheckpoint()
    )
    # exactness check: any group that undershot (possible only when the
    # prefilter bit, i.e. group_size > oversample*n) reruns unfiltered
    got = sampled_k.groupBy("_gk").agg(F.count(F.lit(1)).alias("_got"))
    short = (
        counts.join(got, "_gk", "left")
        .where(F.coalesce(F.col("_got"), F.lit(0)) < F.least(F.lit(n), F.col("_gn")))
        .select("_gk")
    )
    if short.isEmpty():
        return sampled_k.drop("_gk")
    redo = topn(hashed.join(F.broadcast(short), "_gk"))
    kept = sampled_k.join(F.broadcast(short), "_gk", "left_anti").drop("_gk")
    return kept.unionByName(redo)


def reservoir_sample(df: DataFrame, n: int, seed: int = 42) -> DataFrame:
    """Exactly ``min(n, rows)`` rows, deterministic across reruns."""
    return stratified_sample(df, n, (), seed)
