"""Round-3 fixes: fastconverge append (persisted tier stats), the
hot-bucket pair-recall warning, and exactly-once marker placement."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from verdictdb_spark.sampling import (
    AggSpec,
    append_scramble,
    create_fastconverge_scramble,
    progressive_agg,
)


@pytest.fixture(scope="module")
def lineitem(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/lineitem.parquet").cache()
    yield df
    df.unpersist()


# ------------------------------------------------- fastconverge append
def test_fastconverge_append_full_coverage_exact(lineitem):
    """Create on the first half, append the second half with the STORED
    stats/CDFs; progressive full coverage over the union must equal the
    exact aggregate over the union (the reference's append contract)."""
    base = lineitem.where(F.col("l_orderkey") % 2 == 0)
    extra = lineitem.where(F.col("l_orderkey") % 2 == 1)
    sdf, meta = create_fastconverge_scramble(
        base, outlier_column="l_extendedprice",
        group_column="l_returnflag", nblocks=6, seed=3,
    )
    appended = append_scramble(extra, meta)
    union = sdf.select(appended.columns).unionByName(appended)
    final = None
    for r in progressive_agg(
        union, meta,
        [AggSpec("sum", "l_quantity", "s"), AggSpec("count", None, "c")],
        ["l_returnflag"],
    ):
        final = r
    exact = (
        lineitem.groupBy("l_returnflag")
        .agg(F.sum("l_quantity").alias("s"), F.count(F.lit(1)).alias("c"))
        .toPandas().set_index("l_returnflag")
    )
    got = final.estimates.set_index("l_returnflag")
    for flag in exact.index:
        assert got.loc[flag, "s"] == pytest.approx(exact.loc[flag, "s"], rel=1e-9)
        assert got.loc[flag, "c"] == pytest.approx(exact.loc[flag, "c"], rel=1e-9)


def test_fastconverge_append_deterministic_reassignment(lineitem):
    """A row appended later gets the same (tier, block) it would have
    gotten at create time — deterministic hashes + stored stats."""
    sub = lineitem.limit(4000)
    sdf, meta = create_fastconverge_scramble(
        sub, outlier_column="l_extendedprice", nblocks=4, seed=9
    )
    re_assigned = append_scramble(sub, meta)
    # identical rows -> identical assignment: the symmetric difference
    # of (row, tier, block) sets is empty
    assert sdf.select(re_assigned.columns).exceptAll(re_assigned).count() == 0
    assert re_assigned.exceptAll(sdf.select(re_assigned.columns)).count() == 0


def test_fastconverge_append_without_stats_raises():
    from verdictdb_spark.sampling import ScrambleMeta

    meta = ScrambleMeta(method="fastconverge", nblocks=4)
    meta.fc_stats = None
    with pytest.raises(ValueError, match="persisted tier stats"):
        append_scramble(None, meta)


def test_fc_stats_survive_json_roundtrip(lineitem):
    from verdictdb_spark.sampling import ScrambleMeta

    _, meta = create_fastconverge_scramble(
        lineitem.limit(3000), outlier_column="l_extendedprice",
        group_column="l_returnflag", nblocks=4, seed=3,
    )
    back = ScrambleMeta.from_json(meta.to_json())
    assert back.fc_stats["mu"] == meta.fc_stats["mu"]
    assert back.fc_stats["large_groups"] == meta.fc_stats["large_groups"]
    assert back.fc_stats["columns"] == meta.fc_stats["columns"]


# ------------------------------------------------- hot-bucket warning
def test_hot_bucket_warning_fires_for_pair_ops(spark):
    from verdictdb_spark.operators.dedup import simhash_near_duplicates

    docs = spark.range(60).select(
        F.col("id").alias("doc_id"),
        F.lit("identical text body repeated for every document").alias("text"),
    )
    with pytest.warns(RuntimeWarning, match="hot_bucket_cap"):
        out = simhash_near_duplicates(
            docs, "doc_id", "text", max_hamming=2, hot_bucket_cap=10
        ).toPandas()
    # star routing: representative (min id 0) linked to every member
    assert len(out) == 59
    assert set(out["id_a"]) == {0}


def test_no_warning_below_cap(spark, recwarn):
    from verdictdb_spark.operators.dedup import simhash_near_duplicates

    docs = spark.range(5).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("distinct text "), F.col("id").cast("string")).alias("text"),
    )
    simhash_near_duplicates(docs, "doc_id", "text", max_hamming=0).count()
    assert not [w for w in recwarn.list if "hot_bucket_cap" in str(w.message)]


# ------------------------------------------- exactly-once marker swap
def test_incremental_marker_committed_with_state(spark, tmp_path):
    """The batch marker must live inside the swapped state dir, so a
    replay of the last merged batch is a no-op (no CMS double-count)."""
    from verdictdb_spark.sketches.cms import CmsSketch
    from verdictdb_spark.streaming.incremental import (
        MARKER,
        _merge_into_state,
        _read_marker,
    )

    state = str(tmp_path / "state")
    os.makedirs(state)
    df = spark.range(100).select(
        F.lit("g").alias("g"), F.col("id").cast("string").alias("v")
    )
    cms = CmsSketch(eps=1 / 512, delta=0.01)
    _merge_into_state(df, cms, "v", ["g"], state, batch_id=0)
    assert _read_marker(state) == 0
    assert os.path.exists(os.path.join(state, "current", MARKER))
    # replaying batch 0 through the guard logic: marker says merged
    assert 0 <= _read_marker(state)


def test_fastconverge_append_null_groups(spark):
    """Review regression: NULL-group rows must land in the SAME tier on
    append as on create (tier 1 when the NULL group is small)."""
    from verdictdb_spark.sampling.scramble import TIER_COL

    df = spark.range(5000).select(
        F.col("id").cast("double").alias("x"),
        F.when(F.col("id") % 50 == 0, None).otherwise(
            (F.col("id") % 3).cast("string")
        ).alias("g"),
    )
    sdf, meta = create_fastconverge_scramble(
        df, outlier_column="x", group_column="g", nblocks=4, seed=7
    )
    re_assigned = append_scramble(df, meta)
    null_create = sdf.where(F.col("g").isNull()).select(TIER_COL).distinct().collect()
    null_append = re_assigned.where(F.col("g").isNull()).select(TIER_COL).distinct().collect()
    assert {r[0] for r in null_create} == {r[0] for r in null_append}
    assert sdf.select(re_assigned.columns).exceptAll(re_assigned).count() == 0
