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
    _CONFIG.json              fingerprint of the parameters that shaped
                              the persisted partials — resume REFUSES a
                              mismatched config instead of silently
                              double-counting (changed nblocks moves
                              rows between blocks) or mixing schemas
    block=<k>/...parquet      partial states + lineage for block k
    block=<k>/_COMPLETE       atomic completion marker
Completion markers make partially-written blocks (killed run)
invisible; a per-run staging dir + rename gives per-block atomicity on
a posix FS without cross-run interference (an object store would use a
manifest table instead — same protocol, different commit primitive).

At 100 TB: blocks are hash partitions of the input (default 256), so
one failed/killed run loses at most the in-flight blocks; lineage
rows make partial progress observable and auditable.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid
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
        self._check_config()

    # -- config fingerprint ----------------------------------------------------
    def _config(self) -> dict:
        return {
            "sketch": repr(self.sketch),
            "value": str(self.value),
            "group_by": self.group_by,
            "nblocks": self.nblocks,
            "input_kind": self.input_kind,
            "block_key": self.block_key,
        }

    def _check_config(self) -> None:
        """Resume safety: the persisted partials are only valid for the
        exact parameters that produced them — a changed ``nblocks`` (or
        ``block_key``) moves rows between blocks, so trusting old
        _COMPLETE markers would double-count or drop rows; a changed
        value/group_by/sketch mixes incompatible parquet schemas."""
        cfg_path = os.path.join(self.path, "_CONFIG.json")
        cfg = self._config()
        if os.path.exists(cfg_path):
            stored = json.load(open(cfg_path))
            if stored != cfg:
                diffs = {
                    k: (stored.get(k), cfg.get(k))
                    for k in set(stored) | set(cfg)
                    if stored.get(k) != cfg.get(k)
                }
                raise ValueError(
                    f"checkpoint at {self.path} was built with different "
                    f"parameters {diffs}; resuming would corrupt results — "
                    "use a new path or delete the old checkpoint"
                )
        else:
            with open(cfg_path, "w") as f:
                json.dump(cfg, f)

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
            # per-run staging dir: concurrent runs on one checkpoint
            # path never delete each other's in-flight writes, so an
            # absent partition dir really means "block had zero rows"
            staging = os.path.join(self.path, f"_staging_{uuid.uuid4().hex}")
            partials.write.mode("overwrite").partitionBy(CKPT_BLOCK).parquet(staging)
            for k in missing:
                src = os.path.join(staging, f"{CKPT_BLOCK}={k}")
                dst = self._block_dir(k)
                if os.path.exists(os.path.join(dst, "_COMPLETE")):
                    continue  # another run finished this block meanwhile
                shutil.rmtree(dst, ignore_errors=True)
                if os.path.exists(src):
                    shutil.move(src, dst)
                else:  # block genuinely had zero rows — still complete
                    os.makedirs(dst, exist_ok=True)
                open(os.path.join(dst, "_COMPLETE"), "w").close()
            shutil.rmtree(staging, ignore_errors=True)
        p = self._read_partials(spark, df)
        if not self.group_by and GROUP_ALL not in p.columns:
            # partials were grouped by ckpt block only; restore the
            # global-group sentinel for the merge
            p = p.withColumn(GROUP_ALL, F.lit(0))
        # the merge-tree depth must reflect the PARTIAL count (one per
        # build partition x block), not the block count — undersizing
        # funnels a hot group's partials into one task
        n_partials = p.count()
        merged = tree_merge(p, self.sketch, self.group_by, n_partials_hint=n_partials)
        return merged, missing

    def _read_partials(self, spark: SparkSession, template: DataFrame | None = None) -> DataFrame:
        dirs = [
            self._block_dir(k)
            for k in sorted(self.complete_blocks())
            if any(f.endswith(".parquet") for f in os.listdir(self._block_dir(k)))
        ]
        if not dirs:
            if template is not None:
                # all blocks complete-and-empty (e.g. all-NULL value
                # column): a valid empty result, not a poisoned state
                empty = template.limit(0).withColumn(CKPT_BLOCK, self._block_col(template))
                return build_partials(
                    empty,
                    self.sketch,
                    self.value,
                    self.group_by + [CKPT_BLOCK],
                    self.input_kind,
                )
            raise ValueError(f"no completed partials under {self.path}")
        return spark.read.parquet(*dirs)

    def lineage(self, spark: SparkSession) -> DataFrame:
        """Per-partition lineage/metrics rows persisted with the partials:
        (group cols..., part_id, n_rows, checksum, wall_ms) per block."""
        df = self._read_partials(spark)
        return df.select(*self.group_by, "part_id", "n_rows", "checksum", "wall_ms")
