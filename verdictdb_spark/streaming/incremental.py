"""Incremental sketch maintenance from a stream (Structured Streaming).

The reference appends to a scramble by re-running the scramble
transform on new rows and INSERTing with the stored CDF
(``ScramblingCoordinator.appendScramble:212-285``).  Mergeability
makes the sketch version trivial and far cheaper: each micro-batch
builds partial states for its rows only and MERGES them into the
persisted per-group state table — no rescan of history, ever.

``foreachBatch`` is the right Structured Streaming primitive here
(not ``applyInPandasWithState``): sketch state is per-GROUP, tiny,
and must remain queryable at rest between batches; a persisted state
table with atomic swap gives exactly that, plus kill-resume for free
(the checkpointed source offset + the last swapped table).
"""

from __future__ import annotations

import os
import shutil
from typing import Any, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.approx_agg import GROUP_ALL, build_partials, tree_merge


def _merge_into_state(
    batch_df: DataFrame,
    sketch: Any,
    value: str,
    group_by: Sequence[str],
    state_path: str,
) -> None:
    spark = batch_df.sparkSession
    new_partials = build_partials(batch_df, sketch, value, group_by)
    cur_path = os.path.join(state_path, "current")
    sel = list(group_by) if group_by else [GROUP_ALL]
    if os.path.exists(cur_path):
        # old states join the merge as just another set of partials
        old = (
            spark.read.parquet(cur_path)
            .select(*sel, "state")
            .withColumn("part_id", F.lit(-1).cast("int"))
        )
        allp = new_partials.select(*sel, "state", "part_id").unionByName(old)
    else:
        allp = new_partials.select(*sel, "state", "part_id")
    merged = tree_merge(allp, sketch, group_by)
    tmp = os.path.join(state_path, "_next")
    merged.write.mode("overwrite").parquet(tmp)
    # atomic-ish swap (posix rename; object stores would version instead)
    bak = os.path.join(state_path, "_prev")
    shutil.rmtree(bak, ignore_errors=True)
    if os.path.exists(cur_path):
        os.rename(cur_path, bak)
    os.rename(tmp, cur_path)
    shutil.rmtree(bak, ignore_errors=True)


def incremental_sketch_sink(
    stream_df: DataFrame,
    sketch: Any,
    value: str,
    group_by: Sequence[str],
    state_path: str,
    checkpoint_path: str | None = None,
    trigger_once: bool = False,
):
    """Attach a sketch-maintenance sink to a streaming DataFrame.

    Returns the started StreamingQuery.  The persisted state table at
    ``state_path/current`` always holds one merged state per group and
    can be estimated at any time with ``read_sketch_state``.
    """
    os.makedirs(state_path, exist_ok=True)

    def for_each(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        _merge_into_state(batch_df, sketch, value, group_by, state_path)

    writer = stream_df.writeStream.foreachBatch(for_each).option(
        "checkpointLocation", checkpoint_path or os.path.join(state_path, "_chk")
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_sketch_state(spark: SparkSession, state_path: str) -> DataFrame:
    """The current merged per-group states (group cols + state binary)."""
    return spark.read.parquet(os.path.join(state_path, "current"))
