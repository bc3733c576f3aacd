"""Exact-size deterministic sampling + HLL set algebra."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from verdictdb_spark.operators.distinct import hll_overlap
from verdictdb_spark.sampling import reservoir_sample, stratified_sample


@pytest.fixture(scope="module")
def li(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/lineitem.parquet")


def test_stratified_exact_sizes_and_determinism(spark, li):
    s1 = stratified_sample(li, 20, ["l_returnflag"]).toPandas()
    s2 = stratified_sample(li, 20, ["l_returnflag"]).toPandas()
    gsz = li.groupBy("l_returnflag").count().toPandas().set_index("l_returnflag")["count"]
    got = s1.groupby("l_returnflag").size()
    for g, n in gsz.items():
        assert got[g] == min(20, n)
    key = lambda d: sorted(map(tuple, d[["l_orderkey", "l_linenumber"]].values.tolist()))
    assert key(s1) == key(s2)  # rerun-stable
    # different seed -> different sample (overwhelmingly)
    s3 = stratified_sample(li, 20, ["l_returnflag"], seed=7).toPandas()
    assert key(s1) != key(s3)


def test_stratified_small_groups_kept_whole(spark):
    df = spark.createDataFrame(
        [(i, "big") for i in range(500)] + [(i, "tiny") for i in range(3)],
        "id long, g string",
    )
    out = stratified_sample(df, 10, ["g"]).groupBy("g").count().toPandas()
    cnt = dict(zip(out["g"], out["count"]))
    assert cnt == {"big": 10, "tiny": 3}


def test_stratified_prefilter_exactness_forced_undershoot(spark):
    """oversample < 1 GUARANTEES the prefilter undershoots for big
    groups — the rerun path must still deliver exactly n."""
    df = spark.createDataFrame([(i, i % 2) for i in range(2000)], "id long, g int")
    out = stratified_sample(df, 50, ["g"], oversample=0.01)
    cnt = out.groupBy("g").count().toPandas()
    assert sorted(cnt["count"].tolist()) == [50, 50]


def test_reservoir_global_topn_plan(spark, li):
    out = reservoir_sample(li, 37)
    assert out.count() == 37
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan  # no single-reducer global sort


def test_hll_overlap_known_sets(spark):
    a = spark.range(0, 20_000).select(F.col("id").alias("v"))
    b = spark.range(10_000, 30_000).select(F.col("id").alias("v"))
    r = hll_overlap(a, b, "v", p=14).toPandas().iloc[0]
    assert abs(r["ndv_a"] - 20_000) / 20_000 < 0.05
    assert abs(r["ndv_union"] - 30_000) / 30_000 < 0.05
    assert abs(r["ndv_intersection"] - 10_000) / 10_000 < 0.15
    assert abs(r["jaccard"] - 1 / 3) < 0.05


def test_hll_overlap_grouped_disjoint_and_missing_groups(spark):
    a = spark.createDataFrame([(i, "x") for i in range(1000)], "v long, g string")
    b = spark.createDataFrame(
        [(i + 10_000, "x") for i in range(1000)] + [(i, "only_b") for i in range(50)],
        "v long, g string",
    )
    out = hll_overlap(a, b, "v", ["g"], p=14).toPandas().set_index("g")
    assert out.loc["x", "ndv_intersection"] / 1000 < 0.1  # disjoint
    assert out.loc["only_b", "ndv_a"] == 0.0
    assert out.loc["only_b", "jaccard"] == 0.0


def test_null_group_keys_are_strata(spark):
    df = spark.createDataFrame(
        [(1, None), (2, None), (3, "x")], "id long, g string"
    )
    out = stratified_sample(df, 1, ["g"]).toPandas()
    assert len(out) == 2  # one row for g=NULL, one for g='x'
    # hll_overlap matches NULL groups across sides
    ov = hll_overlap(df, df, "id", ["g"], p=12).toPandas()
    assert len(ov) == 2
    nullrow = ov[ov["g"].isna()].iloc[0]
    assert nullrow["jaccard"] == pytest.approx(1.0, abs=0.01)
