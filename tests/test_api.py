"""VerdictContext front-door tests: automatic scramble substitution,
SQL entry point, scramble x dimension joins, partial-size scrambles,
and error-bar calibration across scramble kinds."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from verdictdb_spark.api import VerdictContext
from verdictdb_spark.sampling import (
    AggSpec,
    create_fastconverge_scramble,
    create_scramble,
    progressive_agg,
)


@pytest.fixture(scope="module")
def lineitem(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/lineitem.parquet").cache()
    yield df
    # unpersist: Spark's CacheManager substitutes this cached relation
    # into ANY later identical scan, which would defeat the pushdown
    # assertions in test_plans.py
    df.unpersist()


@pytest.fixture(scope="module")
def ctx(spark, tmp_path_factory, lineitem):
    c = VerdictContext(spark, str(tmp_path_factory.mktemp("verdict_root")))
    c.create_scramble("lineitem", lineitem, method="uniform", nblocks=8, seed=3)
    return c


# --------------------------------------------------------- substitution
def test_substitution_picks_newest(spark, tmp_path, lineitem):
    c = VerdictContext(spark, str(tmp_path))
    c.create_scramble("lineitem", lineitem, method="uniform", nblocks=4, seed=1)
    c.create_scramble("lineitem", lineitem, method="uniform", nblocks=6, seed=2)
    _, meta = c.load_scramble_for("lineitem")
    assert meta.nblocks == 6 and meta.seed == 2  # newest wins (ORDER BY ADDED_AT)


def test_create_scramble_returns_what_was_asked(spark, tmp_path, lineitem):
    c = VerdictContext(spark, str(tmp_path))
    c.create_scramble("lineitem", lineitem, method="uniform", nblocks=4, seed=1)
    _, meta_hash = c.create_scramble(
        "lineitem", lineitem, method="hash", column="l_orderkey", nblocks=5
    )
    assert meta_hash.method == "hash" and meta_hash.nblocks == 5


def test_missing_scramble_raises(spark, tmp_path):
    c = VerdictContext(spark, str(tmp_path))
    with pytest.raises(KeyError):
        c.load_scramble_for("nope")


# ------------------------------------------------------------- approx()
def test_approx_full_coverage_equals_exact(ctx, lineitem):
    res = ctx.approx(
        "lineitem",
        [AggSpec("sum", "l_quantity", "s"), AggSpec("count", None, "c")],
        group_by=["l_returnflag"],
        early_stop=False,
    )
    assert res.is_exact
    exact = (
        lineitem.groupBy("l_returnflag")
        .agg(F.sum("l_quantity").alias("s"), F.count(F.lit(1)).alias("c"))
        .toPandas()
        .set_index("l_returnflag")
    )
    got = res.estimates.set_index("l_returnflag")
    for flag in exact.index:
        assert got.loc[flag, "s"] == pytest.approx(exact.loc[flag, "s"])
        assert got.loc[flag, "c"] == pytest.approx(exact.loc[flag, "c"])


def test_approx_where_pushdown(ctx, lineitem):
    res = ctx.approx(
        "lineitem",
        [AggSpec("count", None, "c")],
        where="l_quantity > 25",
        early_stop=False,
    )
    exact = lineitem.where("l_quantity > 25").count()
    assert res.estimates["c"].iloc[0] == pytest.approx(exact)


# ------------------------------------------------------------------ sql
def test_sql_rewrites_aggregate_query(ctx, lineitem):
    out = ctx.sql(
        "SELECT l_returnflag, sum(l_quantity) AS s, count(*) AS c "
        "FROM lineitem GROUP BY l_returnflag",
        early_stop=False,
    ).toPandas().set_index("l_returnflag")
    exact = (
        lineitem.groupBy("l_returnflag")
        .agg(F.sum("l_quantity").alias("s"), F.count(F.lit(1)).alias("c"))
        .toPandas().set_index("l_returnflag")
    )
    for flag in exact.index:
        assert out.loc[flag, "s"] == pytest.approx(exact.loc[flag, "s"])
        assert out.loc[flag, "c"] == exact.loc[flag, "c"]


def test_sql_falls_back_to_exact_for_nonrewritable(ctx, spark, lineitem):
    lineitem.createOrReplaceTempView("lineitem")
    out = ctx.sql("SELECT l_orderkey FROM lineitem ORDER BY l_orderkey LIMIT 3")
    assert [r[0] for r in out.collect()] == [
        r[0] for r in spark.sql("SELECT l_orderkey FROM lineitem ORDER BY l_orderkey LIMIT 3").collect()
    ]


def test_sql_falls_back_when_no_scramble(spark, tmp_path, lineitem):
    lineitem.createOrReplaceTempView("lineitem")
    c = VerdictContext(spark, str(tmp_path))
    out = c.sql("SELECT count(*) AS c FROM lineitem GROUP BY l_returnflag")
    assert out.count() == 3


# ------------------------------------------------- scramble x dimension
def test_transform_join_dims_full_coverage_exact(ctx, spark, sf_dir, lineitem):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")

    def joined(batch):
        return batch.join(F.broadcast(orders), batch.l_orderkey == orders.o_orderkey)

    res = ctx.approx(
        "lineitem",
        [AggSpec("sum", "l_quantity", "s"), AggSpec("count", None, "c")],
        group_by=["o_orderpriority"],
        transform=joined,
        early_stop=False,
    )
    exact = (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(F.sum("l_quantity").alias("s"), F.count(F.lit(1)).alias("c"))
        .toPandas().set_index("o_orderpriority")
    )
    got = res.estimates.set_index("o_orderpriority")
    assert set(got.index) == set(exact.index)
    for k in exact.index:
        assert got.loc[k, "s"] == pytest.approx(exact.loc[k, "s"])
        assert got.loc[k, "c"] == exact.loc[k, "c"]


# --------------------------------------------------- partial-size scrambles
def test_partial_size_scramble_estimates_full_table(lineitem):
    n_exact = lineitem.count()
    sdf, meta = create_scramble(lineitem, method="uniform", nblocks=4, seed=5, size=0.25)
    kept = sdf.count()
    # the scramble holds ~25% of the rows (hash-binomial tolerance)
    assert abs(kept / n_exact - 0.25) < 0.03
    # full prefix of a partial scramble is NOT exact, but estimates the
    # ORIGINAL table via the truncated CDF (coverage == size)
    final = None
    for r in progressive_agg(sdf, meta, [AggSpec("count", None, "c")], []):
        final = r
    assert not final.is_exact
    assert final.coverage == pytest.approx(0.25, abs=0.01)
    est = final.estimates["c"].iloc[0]
    err = final.estimates["c_err"].iloc[0]
    assert abs(est - n_exact) < max(3 * err, 0.02 * n_exact)


def test_partial_size_hash_scramble_ndv(lineitem):
    exact_ndv = lineitem.select("l_orderkey").distinct().count()
    sdf, meta = create_scramble(
        lineitem, method="hash", column="l_orderkey", nblocks=4, size=0.5, seed=9
    )
    final = None
    for r in progressive_agg(
        sdf, meta, [AggSpec("countdistinct", "l_orderkey", "ndv")], []
    ):
        final = r
    # half the key universe scanned, scaled by 1/0.5
    assert abs(final.estimates["ndv"].iloc[0] - exact_ndv) < 0.1 * exact_ndv


def test_create_scramble_nrows_skips_count(lineitem):
    # explicit nblocks + nrows: no job should be needed to plan (we can
    # only assert the result is identical to the counted path)
    a, meta_a = create_scramble(lineitem, nblocks=4, seed=5, nrows=123456)
    assert meta_a.original_count == 123456
    b, meta_b = create_scramble(lineitem, nblocks=4, seed=5)
    assert a.exceptAll(b).count() == 0


# -------------------------------------------------- error-bar calibration
@pytest.mark.parametrize("kind", ["uniform", "fastconverge"])
def test_error_bars_cover_truth(spark, lineitem, kind):
    """~95% CI subsample error bars must cover the true value for the
    vast majority of (seed x agg x group) cells at partial coverage —
    for BOTH uniform and non-uniform (fastconverge) CDFs; the latter
    requires per-block scale from the CDF increments."""
    truth = (
        lineitem.groupBy("l_returnflag")
        .agg(
            F.sum("l_quantity").alias("s"),
            F.count(F.lit(1)).alias("c"),
            F.avg("l_extendedprice").alias("a"),
        )
        .toPandas().set_index("l_returnflag")
    )
    aggs = [
        AggSpec("sum", "l_quantity", "s"),
        AggSpec("count", None, "c"),
        AggSpec("avg", "l_extendedprice", "a"),
    ]
    hits, total = 0, 0
    for seed in range(6):
        if kind == "uniform":
            sdf, meta = create_scramble(lineitem, method="uniform", nblocks=12, seed=seed)
        else:
            sdf, meta = create_fastconverge_scramble(
                lineitem, outlier_column="l_extendedprice",
                group_column="l_returnflag", nblocks=12, seed=seed,
            )
        part = None
        for r in progressive_agg(sdf, meta, aggs, ["l_returnflag"]):
            part = r
            if r.blocks_covered >= 3:
                break
        est = part.estimates.set_index("l_returnflag")
        for flag in truth.index:
            for col in ["s", "c", "a"]:
                total += 1
                if abs(est.loc[flag, col] - truth.loc[flag, col]) <= est.loc[flag, f"{col}_err"]:
                    hits += 1
    # 95% nominal; allow slack for small block counts (t vs normal)
    assert hits / total >= 0.80, f"coverage {hits}/{total}"


def test_error_bars_all_aggregates_present(lineitem):
    sdf, meta = create_scramble(lineitem, method="uniform", nblocks=8, seed=2)
    aggs = [
        AggSpec("sum", "l_quantity", "s"),
        AggSpec("count", None, "c"),
        AggSpec("avg", "l_extendedprice", "a"),
        AggSpec("min", "l_discount", "mn"),
        AggSpec("max", "l_discount", "mx"),
    ]
    part = None
    for r in progressive_agg(sdf, meta, aggs, []):
        part = r
        if r.blocks_covered >= 3:
            break
    for col in ["s_err", "c_err", "a_err", "mn_err", "mx_err"]:
        assert col in part.estimates.columns
        assert np.isfinite(part.estimates[col].iloc[0])


def test_sql_falls_back_when_scramble_cannot_answer(spark, tmp_path, lineitem):
    """COUNT(DISTINCT) on a table whose registered scramble is uniform
    must pass through to exact spark.sql, not raise (the reference
    passes non-rewritable queries through)."""
    c = VerdictContext(spark, str(tmp_path))
    c.create_scramble("li_sqlfb", lineitem, method="uniform", nblocks=4, seed=1)
    lineitem.createOrReplaceTempView("li_sqlfb")
    out = c.sql("SELECT count(DISTINCT l_orderkey) AS n FROM li_sqlfb").first()["n"]
    exact = lineitem.select(F.countDistinct("l_orderkey")).first()[0]
    assert out == exact


def test_create_scramble_kwargs_distinct_artifacts(spark, tmp_path, lineitem):
    """fastconverge variants differing only in kwargs must not collide
    to one cached scramble path."""
    c = VerdictContext(spark, str(tmp_path))
    import os

    c.create_scramble(
        "li_kw", lineitem.limit(2000), method="fastconverge", column="l_extendedprice",
        nblocks=4, group_column="l_returnflag",
    )
    c.create_scramble(
        "li_kw", lineitem.limit(2000), method="fastconverge", column="l_extendedprice",
        nblocks=4,
    )
    # different kwargs -> different persisted artifacts (no collision)
    dirs = [d for d in os.listdir(str(tmp_path)) if d.startswith("scramble_li_kw_")]
    assert len(dirs) == 2


def test_avg_ignores_nulls_like_sql(spark, tmp_path, lineitem):
    """SQL AVG divides by count(col), not count(*): a scramble over a
    table with NULLs in the averaged column must still be exact at
    full coverage."""
    from verdictdb_spark.sampling import create_scramble, progressive_agg

    withnulls = lineitem.limit(4000).withColumn(
        "px", F.when(F.col("l_orderkey") % 2 == 0, F.col("l_extendedprice"))
    )
    sdf, meta = create_scramble(withnulls, method="uniform", nblocks=4, seed=5)
    final = None
    for r in progressive_agg(sdf, meta, [AggSpec("avg", "px", "a")], []):
        final = r
    exact = withnulls.agg(F.avg("px")).first()[0]
    assert final.estimates["a"].iloc[0] == pytest.approx(float(exact), rel=1e-9)
