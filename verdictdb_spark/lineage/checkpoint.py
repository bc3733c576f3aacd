"""Checkpointed sketch builds: per-block partial persistence + resume.

The reference's analogue is scramble-append reusing the stored CDF
(``coordinator/ScramblingCoordinator.appendScramble:212-285``,
``UniformScramblingMethod.java:104-144``) plus its temp-table
materialization of every DAG node.  Here, mergeability makes
resumability natural: the unit of work is a deterministic hash block
of the input; each block's partial sketch states are persisted with
lineage (partition id, row count, xor-of-hashes checksum, wall time);
a rerun recomputes ONLY blocks whose partials are missing and
tree-merges everything.

Layout under ``path/``:
    block=<k>/...parquet      partial states + lineage for block k
    block=<k>/_COMPLETE       atomic completion marker
Completion markers make partially-written blocks (killed run)
invisible; the staging-dir + rename gives per-block atomicity on a
posix FS (an object store would use a manifest table instead — same
protocol, different commit primitive).

At 100 TB: blocks are hash partitions of the input (default 256), so
one failed/killed run loses at most the in-flight blocks; lineage
rows make partial progress observable and auditable.
"""

from __future__ import annotations

import os
import shutil
from typing import Any, Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.approx_agg import GROUP_ALL, build_partials, tree_merge

CKPT_BLOCK = "ckpt_block"


class SketchCheckpoint:
    def __init__(
        self,
        path: str,
        sketch: Any,
        value: str | Column,
        group_by: Sequence[str] = (),
        nblocks: int = 32,
        input_kind: str = "hash",
        block_key: Sequence[str] | None = None,
    ):
        self.path = path
        self.sketch = sketch
        self.value = value
        self.group_by = list(group_by)
        self.nblocks = nblocks
        self.input_kind = input_kind
        self.block_key = list(block_key) if block_key else None
        os.makedirs(path, exist_ok=True)

    # -- block bookkeeping ---------------------------------------------------
    def _block_dir(self, k: int) -> str:
        return os.path.join(self.path, f"block={k}")

    def complete_blocks(self) -> set[int]:
        out = set()
        for k in range(self.nblocks):
            if os.path.exists(os.path.join(self._block_dir(k), "_COMPLETE")):
                out.add(k)
        return out

    def invalidate(self, blocks: Sequence[int]) -> None:
        for k in blocks:
            shutil.rmtree(self._block_dir(k), ignore_errors=True)

    # -- main protocol ---------------------------------------------------------
    def _block_col(self, df: DataFrame) -> Column:
        cols = self.block_key or df.columns
        return F.pmod(F.xxhash64(*[F.col(c) for c in cols]), F.lit(self.nblocks)).cast("int")

    def run(self, df: DataFrame) -> tuple[DataFrame, list[int]]:
        """Build (or resume) the checkpointed sketch table.

        Returns (merged states DataFrame: group cols + state, list of
        block ids actually processed this run).
        """
        spark = df.sparkSession
        done = self.complete_blocks()
        missing = sorted(set(range(self.nblocks)) - done)
        if missing:
            blocked = df.withColumn(CKPT_BLOCK, self._block_col(df))
            todo = blocked.where(F.col(CKPT_BLOCK).isin([int(m) for m in missing]))
            partials = build_partials(
                todo, self.sketch, self.value, self.group_by + [CKPT_BLOCK], self.input_kind
            )
            staging = os.path.join(self.path, "_staging")
            shutil.rmtree(staging, ignore_errors=True)
            partials.write.mode("overwrite").partitionBy(CKPT_BLOCK).parquet(staging)
            for k in missing:
                src = os.path.join(staging, f"{CKPT_BLOCK}={k}")
                dst = self._block_dir(k)
                shutil.rmtree(dst, ignore_errors=True)
                if os.path.exists(src):
                    shutil.move(src, dst)
                else:  # block had zero rows — still complete
                    os.makedirs(dst, exist_ok=True)
                open(os.path.join(dst, "_COMPLETE"), "w").close()
            shutil.rmtree(staging, ignore_errors=True)
        p = self._read_partials(spark)
        if not self.group_by and GROUP_ALL not in p.columns:
            # partials were grouped by ckpt block only; restore the
            # global-group sentinel for the merge
            p = p.withColumn(GROUP_ALL, F.lit(0))
        merged = tree_merge(p, self.sketch, self.group_by, n_partials_hint=self.nblocks)
        return merged, missing

    def _read_partials(self, spark: SparkSession) -> DataFrame:
        dirs = [
            self._block_dir(k)
            for k in sorted(self.complete_blocks())
            if any(f.endswith(".parquet") for f in os.listdir(self._block_dir(k)))
        ]
        if not dirs:
            raise ValueError(f"no completed partials under {self.path}")
        return spark.read.parquet(*dirs)

    def lineage(self, spark: SparkSession) -> DataFrame:
        """Per-partition lineage/metrics rows persisted with the partials:
        (group cols..., part_id, n_rows, checksum, wall_ms) per block."""
        df = self._read_partials(spark)
        return df.select(*self.group_by, "part_id", "n_rows", "checksum", "wall_ms")
