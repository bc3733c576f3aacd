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
