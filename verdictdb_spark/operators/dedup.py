"""Deduplication operators for training-data pipelines.

Exact (hash group-by), MinHash+LSH (shingle -> minhash -> band ->
bucket-join), SimHash (hamming-ball near-dup), and exact n-gram
Jaccard verification for candidate pairs.  Embedding-cosine near-dup
lives in ``similarity.py``.

Design rules at 10^12-row scale:
* shingling/hashing happens JVM-side (split / transform / xxhash64
  inside whole-stage codegen) — Python never touches a string;
* candidate generation is a shuffle on (band, band_hash) buckets,
  never an all-pairs join;
* clustering is iterative min-label propagation (the standard
  distributed connected-components pattern) with localCheckpoint to
  cut lineage; converges in O(log |V|) rounds.

ANSI-mode safe: no wrap-around arithmetic in JVM expressions — hash
families come from xxhash64(h, j) re-hashing instead of overflow
multiplies.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window


# --------------------------------------------------------------- exact
def fingerprint_col(*cols: str | Column, normalize: bool = False) -> Column:
    """sha256 fingerprint of one or more columns (optionally
    whitespace/case-normalized for text)."""
    cs = [F.col(c) if isinstance(c, str) else c for c in cols]
    if normalize:
        cs = [F.regexp_replace(F.lower(F.trim(c.cast("string"))), r"\s+", " ") for c in cs]
    return F.sha2(F.concat_ws("\x1f", *[c.cast("string") for c in cs]), 256)


def dedup_exact(
    df: DataFrame,
    key: Sequence[str] | Column | str,
    order_by: str | Column | None = None,
    normalize: bool = False,
) -> DataFrame:
    """Keep one row per exact (normalized) key — hash group-by dedup.

    One shuffle on the fingerprint; ties broken deterministically by
    ``order_by`` (required for reproducible runs).
    """
    if isinstance(key, (str, Column)):
        key = [key]
    fp = fingerprint_col(*key, normalize=normalize)
    order = F.col(order_by) if isinstance(order_by, str) else (order_by if order_by is not None else F.lit(1))
    w = Window.partitionBy(fp).orderBy(order)
    return (
        df.withColumn("_rn", F.row_number().over(w)).where(F.col("_rn") == 1).drop("_rn")
    )


# --------------------------------------------------------------- shingles
def shingles_col(text: str | Column, n: int = 5, mode: str = "word") -> Column:
    """Array of n-gram shingles, computed fully JVM-side."""
    t = F.col(text) if isinstance(text, str) else text
    if mode == "word":
        w = F.split(F.lower(F.trim(t)), r"\s+")
        return F.transform(
            F.sequence(F.lit(1), F.greatest(F.size(w) - F.lit(n - 1), F.lit(1))),
            lambda i: F.concat_ws(" ", F.slice(w, i, n)),
        )
    if mode == "char":
        lt = F.lower(t)
        return F.transform(
            F.sequence(F.lit(1), F.greatest(F.length(lt) - F.lit(n - 1), F.lit(1))),
            lambda i: lt.substr(i, F.lit(n)),
        )
    raise ValueError(f"unknown shingle mode {mode!r}")


# --------------------------------------------------------------- MinHash
def minhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 128,
    shingle: int = 5,
    mode: str = "word",
) -> DataFrame:
    """(id, sig: array<long>[num_hashes]) — MinHash of the shingle set.

    Pipeline: shingle + base hash JVM-side (explode + xxhash64 inside
    codegen); then ONE numpy pass per partition derives all
    ``num_hashes`` permutation hashes (multiply-shift family) and
    scatter-mins them into a per-doc signature matrix
    (``np.minimum.at`` — cost independent of doc count).  Docs are
    repartitioned by id first so each doc has a single owner — the
    only shuffle is (id, shingle-hash) int pairs.
    E[signature agreement] = Jaccard(shingles_a, shingles_b).

    (A pure-JVM 128-column min-aggregate version was 3-4x slower: 128
    aggregate buffers per row defeats codegen.)
    """
    import pandas as pd

    from ..hashing import _odd_multipliers
    from .approx_agg import factorize_keys

    sh = df.select(
        F.col(id_col).alias("_id"), F.explode(shingles_col(text_col, shingle, mode)).alias("_s")
    ).select("_id", F.xxhash64("_s").alias("_h"))
    out_schema = T.StructType(
        [df.schema[id_col], T.StructField("sig", T.ArrayType(T.LongType()))]
    )
    k = num_hashes
    a_mults = _odd_multipliers(k, 0x31415926)

    def build_sigs(batches):
        key_rows: dict = {}
        flat = np.full(0, np.iinfo(np.uint64).max, dtype=np.uint64)
        j_off = np.arange(k, dtype=np.int64)
        for pdf in batches:
            if not len(pdf):
                continue
            codes, uniq = factorize_keys(pdf, ["_id"])
            rows = np.empty(len(uniq), dtype=np.int64)
            for i, key in enumerate(uniq["_id"]):
                r = key_rows.get(key)
                if r is None:
                    r = len(key_rows)
                    key_rows[key] = r
                rows[i] = r
            if len(key_rows) * k > flat.size:
                flat = np.concatenate(
                    [flat, np.full(len(key_rows) * k - flat.size, np.iinfo(np.uint64).max, dtype=np.uint64)]
                )
            h = pdf["_h"].to_numpy().astype(np.uint64)
            gcodes = rows[codes]
            with np.errstate(over="ignore"):
                for j in range(k):
                    np.minimum.at(flat, gcodes * k + j, h * a_mults[j])
        if not key_rows:
            yield pd.DataFrame({out_schema[0].name: [], "sig": []})
            return
        mat = flat.reshape(-1, k).astype(np.int64)  # wraps to signed — fine, deterministic
        ids = list(key_rows.keys())
        yield pd.DataFrame({out_schema[0].name: ids, "sig": [r.tolist() for r in mat]})

    spark_parallelism = df.sparkSession.sparkContext.defaultParallelism
    return sh.repartition(spark_parallelism, "_id").mapInPandas(build_sigs, out_schema)


def lsh_candidate_pairs(
    sig_df: DataFrame,
    id_col: str,
    bands: int = 32,
    min_est_jaccard: float = 0.0,
) -> DataFrame:
    """Candidate near-duplicate pairs via LSH banding.

    Docs sharing any band bucket become a candidate pair; est_jaccard
    is the full-signature agreement fraction.  Returns
    (id_a, id_b, est_jaccard) with id_a < id_b, deduplicated across
    bands.  Shuffle cost: |docs| x bands rows of (hash, id, sig).
    """
    num_hashes = len(sig_df.select("sig").first()["sig"])
    assert num_hashes % bands == 0, "bands must divide num_hashes"
    r = num_hashes // bands
    sig_df = sig_df.localCheckpoint()  # reused three times below
    # slim banding rows: the self-join and the pair-dedup shuffle carry
    # only (id, band, hash) — the 1KB signature arrays would otherwise
    # be replicated x bands through the shuffle
    banded = sig_df.select(
        F.col(id_col).alias("_id"),
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(b).alias("band"),
                    F.xxhash64(F.slice("sig", b * r + 1, r)).alias("bh"),
                )
                for b in range(bands)
            ])
        ).alias("bb"),
    ).select("_id", "bb.band", "bb.bh")
    a, b = banded.alias("a"), banded.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bh") == F.col("b.bh"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .select(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    # attach signatures once per deduped pair to estimate jaccard
    sa = sig_df.select(F.col(id_col).alias("id_a"), F.col("sig").alias("sig_a"))
    sb = sig_df.select(F.col(id_col).alias("id_b"), F.col("sig").alias("sig_b"))
    joined = pairs.join(sa, "id_a").join(sb, "id_b")
    est = (
        F.aggregate(
            F.zip_with("sig_a", "sig_b", lambda x, y: (x == y).cast("int")),
            F.lit(0),
            lambda acc, v: acc + v,
        ).cast("double")
        / F.lit(float(num_hashes))
    ).alias("est_jaccard")
    out = joined.select("id_a", "id_b", est)
    if min_est_jaccard > 0:
        out = out.where(F.col("est_jaccard") >= min_est_jaccard)
    return out


def exact_jaccard(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str,
    text_col: str,
    shingle: int = 5,
    mode: str = "word",
) -> DataFrame:
    """Exact shingle-set Jaccard for candidate pairs (verification
    stage — only runs on the candidate set, never all pairs)."""
    sh = df.select(
        F.col(id_col).alias("_id"),
        F.array_distinct(shingles_col(text_col, shingle, mode)).alias("_set"),
    )
    j = (
        pairs.join(sh.withColumnRenamed("_id", "id_a").withColumnRenamed("_set", "set_a"), "id_a")
        .join(sh.withColumnRenamed("_id", "id_b").withColumnRenamed("_set", "set_b"), "id_b")
    )
    inter = F.size(F.array_intersect("set_a", "set_b")).cast("double")
    union = F.size(F.array_union("set_a", "set_b")).cast("double")
    return j.select("id_a", "id_b", "est_jaccard", (inter / union).alias("jaccard"))


def dedup_minhash(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.8,
    num_hashes: int = 128,
    bands: int = 32,
    shingle: int = 5,
    mode: str = "word",
) -> DataFrame:
    """Near-duplicate removal: keep one representative (min id) per
    connected cluster of pairs with est_jaccard >= threshold."""
    sig = minhash_signatures(df, id_col, text_col, num_hashes, shingle, mode)
    pairs = lsh_candidate_pairs(sig, id_col, bands, min_est_jaccard=threshold)
    comp = connected_components(pairs, "id_a", "id_b")
    # rows whose id maps to a component keep only the representative
    joined = df.join(comp, df[id_col] == comp["vertex"], "left")
    return joined.where(
        F.col("vertex").isNull() | (F.col(id_col) == F.col("component"))
    ).drop("vertex", "component")


# --------------------------------------------------------------- SimHash
def simhash_col_df(
    df: DataFrame, id_col: str, text_col: str, bits: int = 64
) -> DataFrame:
    """(id, simhash: long) — sign-aggregated token-hash fingerprint.

    Token hashes are xxhash64; each bit of the fingerprint is the
    sign of the per-bit +-1 vote sum.  All JVM aggregates.
    """
    tok = df.select(
        F.col(id_col).alias("_id"),
        F.explode(F.split(F.lower(F.trim(F.col(text_col))), r"\s+")).alias("_t"),
    ).withColumn("_h", F.xxhash64("_t"))
    votes = tok.groupBy("_id").agg(
        *[
            F.sum(
                F.when(F.shiftrightunsigned(F.col("_h"), i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
            ).alias(f"v{i}")
            for i in range(bits)
        ]
    )
    sig = None
    for i in range(bits):
        bit = F.when(F.col(f"v{i}") >= 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        term = F.shiftleft(bit, i)
        sig = term if sig is None else sig.bitwiseXOR(term)
    return votes.select(F.col("_id").alias(id_col), sig.alias("simhash"))


def simhash_near_duplicates(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 3,
    chunks: int = 4,
) -> DataFrame:
    """Pairs within hamming distance via pigeonhole banding: split the
    64-bit simhash into ``chunks`` pieces; any pair within
    max_hamming <= chunks-1 must agree on >= one chunk exactly."""
    sig = simhash_col_df(df, id_col, text_col)
    width = 64 // chunks
    banded = sig.select(
        F.col(id_col).alias("_id"),
        "simhash",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(c).alias("chunk"),
                    F.shiftrightunsigned(F.col("simhash"), c * width)
                    .bitwiseAND(F.lit((1 << width) - 1))
                    .alias("key"),
                )
                for c in range(chunks)
            ])
        ).alias("cc"),
    ).select("_id", "simhash", "cc.chunk", "cc.key")
    a, b = banded.alias("a"), banded.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .select(
            F.col("a._id").alias("id_a"),
            F.col("b._id").alias("id_b"),
            F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))).alias("hamming"),
        )
        .dropDuplicates(["id_a", "id_b"])
        .where(F.col("hamming") <= max_hamming)
    )
    return pairs


# ------------------------------------------------- connected components
def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 20,
) -> DataFrame:
    """Min-label propagation connected components on an edge list.

    Returns (vertex, component) where component = min vertex id in the
    cluster.  O(log n) join rounds; each round localCheckpoints to cut
    lineage (at cluster scale swap for reliable checkpoint dir).
    """
    e = edges.select(F.col(src).alias("s"), F.col(dst).alias("d"))
    # materialize once: every iteration re-reads the edge list, and the
    # upstream DAG (e.g. MinHash + LSH self-join) must not re-execute
    # per round
    sym = e.unionAll(e.select(F.col("d").alias("s"), F.col("s").alias("d"))).localCheckpoint()
    labels = (
        sym.select(F.col("s").alias("vertex"))
        .distinct()
        .withColumn("component", F.col("vertex"))
    )
    for _ in range(max_iter):
        neigh = (
            sym.join(labels, sym["s"] == labels["vertex"])
            .groupBy(F.col("d").alias("vertex"))
            .agg(F.min("component").alias("ncomp"))
        )
        new_labels = (
            labels.join(neigh, "vertex", "left")
            .select(
                "vertex",
                F.least(F.col("component"), F.coalesce("ncomp", "component")).alias("component"),
            )
            .localCheckpoint()
        )
        changed = (
            new_labels.join(labels.withColumnRenamed("component", "old"), "vertex")
            .where(F.col("component") != F.col("old"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels
