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


def ivf_assign(
    df: DataFrame,
    vec_col: str,
    n_centroids: int = 256,
    sample_rows: int = 8192,
    kmeans_iters: int = 8,
    seed: int = _PLANE_SEED,
    cluster_col: str = "ivf_cluster",
) -> tuple[DataFrame, np.ndarray]:
    """IVF (inverted-file) index build: coarse k-means centroids from a
    driver-side sample, then one matmul per Arrow batch assigns every
    vector to its nearest centroid.

    Returns (df + cluster column, centroid matrix (n_centroids, dim),
    L2-normalized).  At scale, WRITE the table partitioned by the
    cluster column: queries then probe a handful of clusters as
    partition-pruned scans (the standard IVF-flat layout, expressed as
    Spark partitioning).  Centroid training is a bounded driver-side
    sample — the cluster-scale path would swap in ML-lib k-means
    without changing the assignment or probe stages.
    """
    # hash-ordered top-N = a deterministic uniform sample; plain
    # limit() takes the FIRST partitions, which on a clustered/sorted
    # table trains every centroid on one region of the space
    samp_df = (
        df.select(F.col(vec_col).alias("_v"))
        .withColumn("_r", F.xxhash64(F.col("_v"), F.lit(seed)))
        .orderBy("_r")
        .limit(int(sample_rows))
    )
    samp = np.vstack(samp_df.toPandas()["_v"].to_numpy()).astype(np.float64)
    norms = np.linalg.norm(samp, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    samp = samp / norms
    k = min(n_centroids, len(samp))
    rng = np.random.default_rng(seed)
    cent = samp[rng.choice(len(samp), size=k, replace=False)]
    for _ in range(kmeans_iters):
        # spherical k-means: assign by max cosine, recenter, renormalize
        assign = np.argmax(samp @ cent.T, axis=1)
        for c in range(k):
            members = samp[assign == c]
            if len(members):
                m = members.mean(axis=0)
                n = np.linalg.norm(m)
                if n > 0:
                    cent[c] = m / n
    C = cent.astype(np.float32)

    @F.pandas_udf(T.IntegerType())
    def _assign(vs: pd.Series) -> pd.Series:
        m = np.vstack(vs.to_numpy()).astype(np.float32)
        n = np.linalg.norm(m, axis=1, keepdims=True)
        n[n == 0] = 1.0
        return pd.Series(np.argmax((m / n) @ C.T, axis=1).astype(np.int32))

    return df.withColumn(cluster_col, _assign(F.col(vec_col))), cent


def ivf_top_k(
    indexed: DataFrame,
    centroids: np.ndarray,
    vec_col: str,
    query: Sequence[float],
    k: int = 10,
    n_probes: int = 8,
    id_col: str | None = None,
    cluster_col: str = "ivf_cluster",
) -> DataFrame:
    """IVF probe: exact cosine top-k over only the ``n_probes``
    clusters nearest the query — a cluster-column filter, so on a
    table written partitioned by cluster it is a partition-pruned scan
    followed by TakeOrderedAndProject."""
    q = _normalize(np.asarray(query, dtype=np.float64))
    order = np.argsort(-(centroids @ q))[: int(n_probes)]
    probed = indexed.where(F.col(cluster_col).isin([int(c) for c in order]))
    return cosine_top_k(probed.drop(cluster_col), vec_col, query, k, id_col)


def band_signatures(vec_col: str, dim: int, bands: int, planes: int, seed: int = _PLANE_SEED):
    """Column: array<long> of per-band hyperplane bucket keys.

    One (dim x bands*planes) matmul per Arrow batch; band b's key is
    the packed sign bits of its ``planes`` hyperplanes.
    """
    rng = np.random.default_rng(seed)
    H = rng.standard_normal((dim, bands * planes)).astype(np.float32)
    weights = (1 << np.arange(planes, dtype=np.int64))

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def _sig(vs: pd.Series) -> pd.Series:
        m = np.vstack(vs.to_numpy())
        bits = ((m @ H) >= 0).reshape(len(m), bands, planes)
        keys = (bits * weights).sum(axis=2)  # (n, bands) int64
        return pd.Series(list(keys))

    return _sig(F.col(vec_col))


def _lsh_params(n: int, threshold: float, collisions_per_row: float = 1.0) -> tuple[int, int]:
    """(planes per band, bands), sized so CANDIDATE VERIFICATION stays
    linear: a random (near-orthogonal) pair collides in one band with
    probability ~0.5^planes, so expected random candidates per band are
    n^2/2 * 0.5^planes — planes = log2(n / (2*collisions_per_row))
    bounds that at ~collisions_per_row * n total.  Bands then restore
    recall for TRUE pairs at ``threshold``:
    P[caught] = 1 - (1 - (1-theta/pi)^planes)^bands >= 0.9.

    The earlier "target expected bucket ~1024 rows" sizing was a
    scale bug: a bucket of 1024 random vectors already emits ~500k
    all-pairs candidates; bucket size must be O(1), not O(1024)."""
    planes = int(np.clip(np.ceil(np.log2(max(n, 4) / (2.0 * collisions_per_row))), 8, 40))
    bands = _bands_for(planes, threshold)
    return planes, bands


def _bands_for(planes: int, threshold: float, target_recall: float = 0.9) -> int:
    """Bands needed for ``target_recall`` at ``threshold`` given a band
    key of ``planes`` bits, capped at 32 for bounded cost — warns when
    the cap actually costs recall (loose thresholds at extreme scale)."""
    theta = float(np.arccos(np.clip(threshold, -1.0, 1.0)))
    p_band = (1.0 - theta / np.pi) ** planes
    need = int(np.ceil(np.log(1 - target_recall) / np.log(max(1.0 - p_band, 1e-12))))
    bands = int(np.clip(need, 1, 32))
    if need > 32:
        import warnings

        recall = 1 - (1 - p_band) ** bands
        warnings.warn(
            f"LSH bands capped at 32 (needed {need} for {target_recall:.0%} recall "
            f"at threshold {threshold}): expected recall ~{recall:.0%}. Raise "
            "`bands` explicitly, raise the threshold, or run twice with "
            "different seeds and union.",
            RuntimeWarning,
            stacklevel=3,
        )
    return bands


def embedding_near_duplicates(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float = 0.95,
    planes: int | None = None,
    bands: int | None = None,
    seed: int = _PLANE_SEED,
    n_rows: int | None = None,
    hot_bucket_cap: int = 2048,
    collisions_per_row: float = 1.0,
) -> DataFrame:
    """Near-duplicate pairs by cosine >= threshold — banded hyperplane
    LSH, scale-safe at 10^9+ vectors:

    * ``planes`` grows with corpus size (~log2 n) so EXPECTED RANDOM
      candidates stay ~``collisions_per_row`` per row per band — no
      fixed bucket universe that degenerates to quadratic verify work;
    * multiple independent ``bands`` recover the recall that longer
      keys cost: P[caught] = 1-(1-p^planes)^bands >= 0.9 at threshold;
    * buckets above ``hot_bucket_cap`` (typically piles of identical
      vectors) link members to a representative instead of all-pairs
      (same ``_bucket_pairs`` kernel as MinHash-LSH);
    * candidates are verified with EXACT cosine (pairs only — never a
      per-bucket O(m^2) matrix), so precision is 1 by construction.

    Pass ``n_rows`` if known to skip the sizing count.
    """
    from .dedup import _bucket_pairs

    first = df.select(vec_col).where(F.col(vec_col).isNotNull()).first()
    if first is None:  # empty input: empty pair set, not a crash
        return df.sparkSession.createDataFrame(
            [],
            T.StructType([
                T.StructField("id_a", df.schema[id_col].dataType),
                T.StructField("id_b", df.schema[id_col].dataType),
                T.StructField("cosine", T.DoubleType()),
            ]),
        )
    dim = len(first[vec_col])
    if planes is None and bands is None:
        n = n_rows if n_rows is not None else df.count()
        planes, bands = _lsh_params(n, threshold, collisions_per_row)
    elif planes is None:  # bands given: size planes from the corpus
        n = n_rows if n_rows is not None else df.count()
        planes, _ = _lsh_params(n, threshold, collisions_per_row)
    elif bands is None:  # planes given: bands must match THAT geometry
        bands = _bands_for(planes, threshold)
    sigged = (
        df.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"))
        .withColumn("_sig", band_signatures("_v", dim, bands, planes, seed))
        .localCheckpoint()  # reused: banding + two verify joins
    )
    banded = sigged.select(
        "_id", F.posexplode("_sig").alias("band", "key")
    )
    pairs = _bucket_pairs(
        banded, ["band", "key"], hot_bucket_cap, warn_op="embedding_near_duplicates"
    )
    # exact-cosine verification of candidates only
    va = sigged.select(F.col("_id").alias("id_a"), F.col("_v").alias("_va"))
    vb = sigged.select(F.col("_id").alias("id_b"), F.col("_v").alias("_vb"))
    joined = pairs.join(va, "id_a").join(vb, "id_b")

    @F.pandas_udf(T.DoubleType())
    def _pair_cos(a: pd.Series, b: pd.Series) -> pd.Series:
        ma = np.vstack(a.to_numpy()).astype(np.float64)
        mb = np.vstack(b.to_numpy()).astype(np.float64)
        na = np.linalg.norm(ma, axis=1)
        nb = np.linalg.norm(mb, axis=1)
        na[na == 0] = 1.0
        nb[nb == 0] = 1.0
        return pd.Series((ma * mb).sum(axis=1) / (na * nb))

    return (
        joined.withColumn("cosine", _pair_cos("_va", "_vb"))
        .where(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


def dedup_embeddings(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float = 0.95,
    **kwargs,
) -> DataFrame:
    """Drop near-duplicate embeddings, keeping the min-id representative."""
    from .dedup import connected_components

    pairs = embedding_near_duplicates(df, id_col, vec_col, threshold, **kwargs)
    comp = connected_components(pairs, "id_a", "id_b")
    joined = df.join(comp, df[id_col] == comp["vertex"], "left")
    return joined.where(
        F.col("vertex").isNull() | (F.col(id_col) == F.col("component"))
    ).drop("vertex", "component")
