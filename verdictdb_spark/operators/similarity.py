"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k as the exact baseline, and a random-
hyperplane LSH-bucketed variant as the scale path (buckets prune the
candidate set; multi-probe widens recall).  Embedding-cosine near-
duplicate pairs for dedup pipelines.

JVM vs Python split: dot products over a whole partition are one
numpy matrix multiply inside a Pandas UDF (Arrow-batched) — this
beats per-element ``F.aggregate``/``zip_with`` expression trees for
wide vectors while staying fully vectorized.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_PLANE_SEED = 0xB1A5E5


def _normalize(v: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(v)
    return v / n if n > 0 else v


def cosine_scores(vec_col: str, query: Sequence[float]):
    """Column of cosine similarities vs a fixed query vector.

    One numpy matvec per Arrow batch; NaN-safe for zero vectors.
    """
    q = _normalize(np.asarray(query, dtype=np.float64))

    @F.pandas_udf(T.DoubleType())
    def _cos(vs: pd.Series) -> pd.Series:
        m = np.vstack(vs.to_numpy()).astype(np.float64)
        norms = np.linalg.norm(m, axis=1)
        norms[norms == 0] = 1.0
        return pd.Series((m @ q) / norms)

    return _cos(F.col(vec_col))


def cosine_top_k(
    df: DataFrame,
    vec_col: str,
    query: Sequence[float],
    k: int = 10,
    id_col: str | None = None,
) -> DataFrame:
    """Exact brute-force cosine top-k.

    Spark's orderBy+limit compiles to TakeOrderedAndProject: each
    partition keeps only its local top-k, the driver merges — no
    global sort, no full shuffle.  This is the 100 TB-safe exact
    baseline.
    """
    scored = df.withColumn("cosine", cosine_scores(vec_col, query))
    order = [F.desc("cosine")] + ([F.col(id_col)] if id_col else [])
    return scored.orderBy(*order).limit(k)


def hyperplane_signature(vec_col: str, dim: int, planes: int = 16, seed: int = _PLANE_SEED):
    """Column: LSH bucket id = sign bits of dot with random hyperplanes."""
    rng = np.random.default_rng(seed)
    H = rng.standard_normal((dim, planes)).astype(np.float32)

    @F.pandas_udf(T.LongType())
    def _sig(vs: pd.Series) -> pd.Series:
        m = np.vstack(vs.to_numpy())
        bits = (m @ H) >= 0
        out = np.zeros(len(m), dtype=np.int64)
        for j in range(planes):
            out |= bits[:, j].astype(np.int64) << j
        return pd.Series(out)

    return _sig(F.col(vec_col))


def ann_top_k(
    df: DataFrame,
    vec_col: str,
    query: Sequence[float],
    k: int = 10,
    planes: int = 12,
    probe_bits: int = 1,
    id_col: str | None = None,
    seed: int = _PLANE_SEED,
) -> DataFrame:
    """Approximate top-k: scan only LSH buckets near the query's.

    multi-probe: also visits buckets within ``probe_bits`` bit flips
    of the query bucket (recall/latency knob).  At scale, store the
    signature column at write time (partition/z-order by it) so this
    becomes a partition-pruned scan.
    """
    dim = len(query)
    rng = np.random.default_rng(seed)
    H = rng.standard_normal((dim, planes)).astype(np.float32)
    q = np.asarray(query, dtype=np.float32)
    qsig = 0
    bits = (q @ H) >= 0
    for j in range(planes):
        qsig |= int(bits[j]) << j
    probes = {qsig}
    if probe_bits >= 1:
        for j in range(planes):
            probes.add(qsig ^ (1 << j))
    if probe_bits >= 2:
        for j in range(planes):
            for l in range(j + 1, planes):
                probes.add(qsig ^ (1 << j) ^ (1 << l))
    sig = hyperplane_signature(vec_col, dim, planes, seed)
    pruned = df.withColumn("_sig", sig).where(F.col("_sig").isin(list(probes))).drop("_sig")
    return cosine_top_k(pruned, vec_col, query, k, id_col)


def embedding_near_duplicates(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float = 0.95,
    planes: int = 10,
    seed: int = _PLANE_SEED,
) -> DataFrame:
    """Near-duplicate pairs by cosine >= threshold.

    Bucket by hyperplane signature, then all-pairs cosine WITHIN each
    bucket via one numpy gram matrix per bucket (applyInPandas).
    High-cosine pairs collide with probability (1 - theta/pi)^planes,
    so near-dups rarely cross buckets; for audit-grade recall run
    twice with different seeds and union.
    """
    dim = len(df.select(vec_col).first()[vec_col])
    bucketed = df.select(
        F.col(id_col).alias("_id"), F.col(vec_col).alias("_v")
    ).withColumn("_sig", hyperplane_signature("_v", dim, planes, seed))

    out_schema = T.StructType(
        [
            T.StructField("id_a", df.schema[id_col].dataType),
            T.StructField("id_b", df.schema[id_col].dataType),
            T.StructField("cosine", T.DoubleType()),
        ]
    )

    def pairs_in_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) < 2:
            return pd.DataFrame(columns=["id_a", "id_b", "cosine"])
        m = np.vstack(pdf["_v"].to_numpy()).astype(np.float64)
        norms = np.linalg.norm(m, axis=1)
        norms[norms == 0] = 1.0
        mn = m / norms[:, None]
        gram = mn @ mn.T
        ia, ib = np.triu_indices(len(pdf), k=1)
        keep = gram[ia, ib] >= threshold
        ids = pdf["_id"].to_numpy()
        a, b = ids[ia[keep]], ids[ib[keep]]
        swap = a > b
        a2 = np.where(swap, b, a)
        b2 = np.where(swap, a, b)
        return pd.DataFrame({"id_a": a2, "id_b": b2, "cosine": gram[ia, ib][keep]})

    return (
        bucketed.groupBy("_sig")
        .applyInPandas(pairs_in_bucket, out_schema)
        .dropDuplicates(["id_a", "id_b"])
    )


def dedup_embeddings(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float = 0.95,
    planes: int = 10,
) -> DataFrame:
    """Drop near-duplicate embeddings, keeping the min-id representative."""
    from .dedup import connected_components

    pairs = embedding_near_duplicates(df, id_col, vec_col, threshold, planes)
    comp = connected_components(pairs, "id_a", "id_b")
    joined = df.join(comp, df[id_col] == comp["vertex"], "left")
    return joined.where(
        F.col("vertex").isNull() | (F.col(id_col) == F.col("component"))
    ).drop("vertex", "component")
