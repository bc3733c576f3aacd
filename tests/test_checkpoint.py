"""Checkpoint/resume tests (FIXTURES.md §3 killed-and-resumed fixture)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from verdictdb_spark.lineage import SketchCheckpoint
from verdictdb_spark.operators.approx_agg import finalize
from verdictdb_spark.sketches.hll import HllSketch


def _estimates(merged, sk):
    return (
        finalize(merged, sk, "ndv", "double")
        .toPandas()
        .set_index("lang")["ndv"]
        .sort_index()
    )


def test_checkpoint_build_resume_and_equivalence(spark, files_df, tmp_path):
    sk = HllSketch(p=12)
    path = str(tmp_path / "ckpt")
    ck = SketchCheckpoint(path, sk, "content", ["lang"], nblocks=8, block_key=["path", "repo"])

    merged1, processed1 = ck.run(files_df)
    est1 = _estimates(merged1, sk)
    assert sorted(processed1) == list(range(8))  # cold run: all blocks

    # rerun: nothing to do, identical estimates
    merged2, processed2 = ck.run(files_df)
    assert processed2 == []
    assert (_estimates(merged2, sk) == est1).all()

    # simulate a killed run: drop half the completed blocks
    ck.invalidate([1, 3, 5])
    assert ck.complete_blocks() == {0, 2, 4, 6, 7}
    merged3, processed3 = ck.run(files_df)
    assert sorted(processed3) == [1, 3, 5]  # ONLY missing blocks recomputed
    assert (_estimates(merged3, sk) == est1).all()

    # and the resumed result equals a fresh non-checkpointed build
    from verdictdb_spark.operators.distinct import approx_count_distinct_by

    fresh = (
        approx_count_distinct_by(files_df, "content", ["lang"], p=12)
        .toPandas().set_index("lang")["approx_ndv"].sort_index()
    )
    assert np.allclose(est1.values, fresh.values)


def test_lineage_metrics(spark, files_df, tmp_path):
    sk = HllSketch(p=10)
    ck = SketchCheckpoint(
        str(tmp_path / "ck2"), sk, "content", ["lang"], nblocks=4, block_key=["path", "repo"]
    )
    ck.run(files_df)
    lin = ck.lineage(spark).toPandas()
    # lineage row count bounded by partitions x groups x blocks; rows sum to input
    assert lin["n_rows"].sum() == files_df.count()
    assert (lin["wall_ms"] >= 0).all()
    assert lin["checksum"].nunique() > 1  # checksums are per-slice content hashes


def test_checkpoint_global_group(spark, files_df, tmp_path):
    sk = HllSketch(p=12)
    ck = SketchCheckpoint(str(tmp_path / "ck3"), sk, "content", [], nblocks=4, block_key=["path"])
    merged, _ = ck.run(files_df)
    est = finalize(merged, sk, "ndv", "double").first()["ndv"]
    exact = files_df.select(F.countDistinct("content")).first()[0]
    assert abs(est - exact) / exact < 4 * sk.error_bound()


def test_checkpoint_refuses_changed_config(spark, files_df, tmp_path):
    from verdictdb_spark.lineage.checkpoint import SketchCheckpoint
    from verdictdb_spark.sketches.hll import HllSketch

    path = str(tmp_path / "cfg_ck")
    ck = SketchCheckpoint(path, HllSketch(p=8), "content", ["lang"], nblocks=8)
    ck.run(files_df.limit(2000))
    # changed nblocks moves rows between blocks -> must refuse
    with pytest.raises(ValueError, match="different parameters"):
        SketchCheckpoint(path, HllSketch(p=8), "content", ["lang"], nblocks=16)
    # identical config resumes fine
    _, missing = SketchCheckpoint(path, HllSketch(p=8), "content", ["lang"], nblocks=8).run(
        files_df.limit(2000)
    )
    assert missing == []


def test_checkpoint_all_null_value_column(spark, tmp_path):
    """Every block complete-and-empty is a valid empty result, not a
    poisoned checkpoint."""
    from verdictdb_spark.lineage.checkpoint import SketchCheckpoint
    from verdictdb_spark.sketches.hll import HllSketch

    df = spark.range(100).select(
        F.col("id"), F.lit(None).cast("string").alias("v"), F.lit("g").alias("g")
    )
    path = str(tmp_path / "null_ck")
    ck = SketchCheckpoint(path, HllSketch(p=8), "v", ["g"], nblocks=4)
    merged, missing = ck.run(df)
    assert len(missing) == 4
    assert merged.count() == 0
    # resume is also clean (not ValueError forever)
    merged2, missing2 = SketchCheckpoint(path, HllSketch(p=8), "v", ["g"], nblocks=4).run(df)
    assert missing2 == [] and merged2.count() == 0
