"""Metastore registry, per-row sha256 invariant, fastconverge scramble,
scramble append."""

from __future__ import annotations

import hashlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from verdictdb_spark.hashing import sha256_col
from verdictdb_spark.metastore import MetaStore
from verdictdb_spark.sampling import (
    AggSpec,
    append_scramble,
    create_fastconverge_scramble,
    create_scramble,
    progressive_agg,
)


def test_metastore_register_show_lookup_drop(tmp_path):
    ms = MetaStore(str(tmp_path))
    ms.register("scramble", "db.lineitem", "/data/s1", '{"nblocks": 10}')
    ms.register("scramble", "db.lineitem", "/data/s2", '{"nblocks": 20}')
    ms.register("sketch", "db.documents", "/data/hll1", '{"p": 12}')
    assert len(ms.show()) == 3
    assert len(ms.show("scramble")) == 2
    # newest wins (reference: ORDER BY ADDED_AT)
    assert ms.lookup("db.lineitem").artifact_path == "/data/s2"
    assert ms.lookup("db.documents", "sketch").artifact_path == "/data/hll1"
    assert ms.lookup("nope") is None
    ms.drop("/data/s2")
    assert ms.lookup("db.lineitem").artifact_path == "/data/s1"


def test_sha256_per_row_invariant(spark, files_df):
    """BASELINE input_hint: per-row sha256(content) equality vs source."""
    sample = files_df.limit(50).withColumn("fp", sha256_col("content")).toPandas()
    for _, row in sample.iterrows():
        assert row["fp"] == hashlib.sha256(row["content"].encode()).hexdigest()


def test_fastconverge_scramble_exact_at_full_coverage(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    sdf, meta = create_fastconverge_scramble(
        li, outlier_column="l_extendedprice", group_column="l_returnflag", nblocks=8
    )
    assert meta.method == "fastconverge" and set(meta.cdf) == {0, 1, 2}
    tiers = {r[0] for r in sdf.select("verdictdbtier").distinct().collect()}
    assert tiers <= {0, 1, 2} and 2 in tiers
    results = list(
        progressive_agg(sdf, meta, [AggSpec("sum", "l_extendedprice", "rev"),
                                    AggSpec("count", None, "cnt")], [])
    )
    final = results[-1]
    exact_rev = li.agg(F.sum("l_extendedprice")).first()[0]
    exact_cnt = li.count()
    assert final.estimates["rev"].iloc[0] == pytest.approx(exact_rev, rel=1e-9)
    assert final.estimates["cnt"].iloc[0] == pytest.approx(exact_cnt)
    # early estimates within loose sampling error despite stratification
    assert abs(results[0].estimates["rev"].iloc[0] - exact_rev) / exact_rev < 0.5


def test_fastconverge_packing_contract(spark):
    """The reference's packing bounds (FastConvergeScramblingMethod.java:
    75-78): within each block, tier-0 rows <= ~50% and tier-0+1 <= ~80%
    — checked on a skewed synthetic table with fat outlier and
    small-group strata (hash-assignment noise allowed for)."""
    import numpy as np
    from verdictdb_spark.sampling.scramble import _pack_tier_cdfs

    # the CDF math itself honors the caps exactly
    total = 100_000
    # cases where the caps are satisfiable (tier0 <= 50% of the table,
    # tier0+1 <= 80%); beyond that the documented overflow-spread applies
    for n0, n1 in [(30_000, 30_000), (5_000, 60_000), (45_000, 30_000)]:
        n2 = total - n0 - n1
        cdfs = _pack_tier_cdfs(n0, n1, n2, 10)
        B = total / 10
        a0 = np.diff([0] + cdfs[0]) * n0
        a1 = np.diff([0] + cdfs[1]) * n1
        assert (a0 <= 0.5 * B + 1e-6).all()
        assert (a0 + a1 <= 0.8 * B + 1e-6).all()

    # end-to-end: a table where 20% of rows are 3.09-sigma outliers is
    # impossible, so plant ~2% outliers + a rare group
    n = 40_000
    df = spark.range(n).select(
        F.col("id"),
        F.when(F.col("id") % 50 == 0, 1e6).otherwise(F.col("id") % 100).alias("x"),
        F.when(F.col("id") % 40 == 0, "rare").otherwise("common").alias("g"),
    )
    sdf, meta = create_fastconverge_scramble(
        df, outlier_column="x", group_column="g", nblocks=8
    )
    comp = (
        sdf.groupBy("verdictdbblock", "verdictdbtier").count().toPandas()
        .pivot_table(index="verdictdbblock", columns="verdictdbtier",
                     values="count", fill_value=0)
    )
    per_block = comp.sum(axis=1)
    t0 = comp.get(0, 0)
    t1 = comp.get(1, 0)
    # hash noise: allow 10 points of slack over the 50/80 design bounds
    assert ((t0 / per_block) <= 0.60).all()
    assert (((t0 + t1) / per_block) <= 0.90).all()
    # rare strata are front-loaded: block 0 holds a larger share of
    # tier 0 than the last block
    if hasattr(t0, "iloc") and t0.sum() > 0:
        assert t0.iloc[0] >= t0.iloc[-1]


def test_append_scramble_consistency(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    old, new = li.where("l_orderkey % 5 != 0"), li.where("l_orderkey % 5 = 0")
    sdf, meta = create_scramble(old, method="hash", column="l_orderkey", nblocks=6)
    appended = append_scramble(new, meta)
    both = sdf.unionByName(appended)
    # hash scramble: every distinct l_orderkey maps to exactly one block,
    # across original and appended rows alike
    assert (
        both.groupBy("l_orderkey")
        .agg(F.countDistinct("verdictdbblock").alias("nb"))
        .where("nb > 1").count()
        == 0
    )
    # appended full scramble == scrambling everything at once (deterministic)
    all_at_once, _ = create_scramble(li, method="hash", column="l_orderkey", nblocks=6)
    a = both.groupBy("verdictdbblock").count().toPandas().set_index("verdictdbblock")["count"].sort_index()
    b = all_at_once.groupBy("verdictdbblock").count().toPandas().set_index("verdictdbblock")["count"].sort_index()
    assert (a == b).all()
