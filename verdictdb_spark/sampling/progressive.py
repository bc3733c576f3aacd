"""Progressive approximate aggregation over a scramble.

Rebuild of the reference's async/OLA path: block-restricted partial
aggregates (``ola/AsyncQueryExecutionPlan.convertToProgressiveAgg:
149-340``), pairwise/tree combination of partials
(``AggCombinerExecutionNode.composeUnionQuery:116-184`` — SUM the
sum/count partials, MAX/MIN the extremes), Horvitz-Thompson inverse-
probability scaling per tier coverage (``AsyncAggExecutionNode.
createQuery:236-311``, ``AggMeta.computeScaleFactors:92-105``), avg
reconstructed as sum/count (``replaceColumnWithAggMeta:565-639``),
and a difference-based early stop (2% per value / 5% group count,
``QueryResultAccuracyEstimatorFromDifference.java:35-40``).

Spark-first architecture: each schedule step is ONE partition-pruned
scan of only the NEW blocks (the block column is the physical
partition column, so Catalyst prunes files), producing a tiny
per-(block, tier, group) partial table that is collected and merged
driver-side in pandas — the exact analogue of the reference's
in-memory H2 combiner (``ola/InMemoryAggregate.java:36-273``), with
pandas in place of H2.  Full coverage => exact (scale factor 1.0),
the reference's own oracle (SparkTpchSelectQueryCoordinatorTest).

COUNT(DISTINCT c) is only legal on a hash scramble on c: the block
id is a function of hash(c), so each distinct value lands in exactly
one block, per-block exact NDV partials are disjoint, and SUM is the
correct combiner — the same correctness rule the reference enforces
(``SelectQueryCoordinator.ensureScrambleCorrectness:189-238``).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterator, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .scramble import BLOCK_COL, TIER_COL, ScrambleMeta

SUMLIKE = {"sum", "count", "countdistinct"}
EXTREME = {"min", "max"}


@dataclass(frozen=True)
class AggSpec:
    op: str  # sum | count | avg | min | max | countdistinct
    col: str | None  # None => count(*)
    alias: str

    def __post_init__(self):
        if self.op not in SUMLIKE | EXTREME | {"avg"}:
            raise ValueError(f"unsupported aggregate {self.op!r}")
        if self.op != "count" and self.col is None:
            raise ValueError(f"{self.op} requires a column")


@dataclass
class ProgressiveResult:
    estimates: pd.DataFrame  # group cols + alias cols (+ <alias>_err)
    coverage: float
    blocks_covered: int
    iteration: int
    is_exact: bool


def _partial_exprs(aggs: Sequence[AggSpec]) -> list:
    """Decompose to mergeable partials (mirrors
    createUnfoldSelectlistWithBasicAgg:664-826: avg -> sum+count)."""
    exprs = []
    seen = set()

    def add(name, expr):
        if name not in seen:
            seen.add(name)
            exprs.append(expr.alias(name))

    for a in aggs:
        if a.op == "sum" or a.op == "avg":
            add(f"psum_{a.col}", F.sum(a.col))
        if a.op == "count" and a.col is None:
            add("pcnt_star", F.count(F.lit(1)))
        if a.op == "count" and a.col is not None:
            add(f"pcnt_{a.col}", F.count(a.col))
        if a.op == "avg":
            # SQL AVG ignores NULLs: denominator is count(col), NOT count(*)
            add(f"pcnt_{a.col}", F.count(a.col))
        if a.op == "min":
            add(f"pmin_{a.col}", F.min(a.col))
        if a.op == "max":
            add(f"pmax_{a.col}", F.max(a.col))
        if a.op == "countdistinct":
            add(f"pndv_{a.col}", F.countDistinct(a.col))
    add("pcnt_star", F.count(F.lit(1)))  # always: variance + group weights
    return exprs


def _validate(aggs: Sequence[AggSpec], meta: ScrambleMeta) -> None:
    for a in aggs:
        if a.op == "countdistinct" and (
            meta.method != "hash" or meta.hash_column != a.col
        ):
            raise ValueError(
                f"countdistinct({a.col}) requires a hash scramble on {a.col!r} "
                f"(got method={meta.method}, hash_column={meta.hash_column}) — "
                "the reference enforces the same rule "
                "(SelectQueryCoordinator.ensureScrambleCorrectness)"
            )


def _schedule(nblocks: int, kind: str) -> list[tuple[int, int]]:
    """Block spans per iteration. 'doubling' mirrors geometric coverage
    growth (few Spark jobs); 'linear' mirrors the reference's
    one-block-per-iteration stream."""
    if kind == "linear":
        return [(i, i) for i in range(nblocks)]
    spans, lo, step = [], 0, 1
    while lo < nblocks:
        hi = min(lo + step - 1, nblocks - 1)
        spans.append((lo, hi))
        lo, step = hi + 1, step * 2
    return spans


def _estimate(
    acc: pd.DataFrame,
    aggs: Sequence[AggSpec],
    group_by: list[str],
    meta: ScrambleMeta,
    hi_block: int,
) -> pd.DataFrame:
    gb = group_by + [TIER_COL]
    agg_map: dict[str, tuple] = {}
    for c in acc.columns:
        if c.startswith(("psum_", "pcnt_", "pndv_")):
            agg_map[c] = (c, "sum")
        elif c.startswith("pmin_"):
            agg_map[c] = (c, "min")
        elif c.startswith("pmax_"):
            agg_map[c] = (c, "max")
    per_tier = acc.groupby(gb, dropna=False, sort=False).agg(**agg_map).reset_index()
    # Horvitz-Thompson scale per tier (AggMeta.computeScaleFactors)
    per_tier["_scale"] = per_tier[TIER_COL].map(
        lambda t: 1.0 / meta.coverage(hi_block, int(t))
    )
    for c in agg_map:
        if c.startswith(("psum_", "pcnt_", "pndv_")):
            per_tier[c] = per_tier[c] * per_tier["_scale"]
    # consolidate tiers (sumUpTierGroup:703-768)
    if group_by:
        final = per_tier.groupby(group_by, dropna=False, sort=False).agg(**agg_map).reset_index()
    else:
        final = per_tier.drop(columns=[TIER_COL, "_scale"]).agg(
            {c: spec[1] for c, spec in agg_map.items()}
        ).to_frame().T

    out = final[group_by].copy() if group_by else pd.DataFrame(index=[0])
    for a in aggs:
        if a.op == "sum":
            out[a.alias] = final[f"psum_{a.col}"]
        elif a.op == "count":
            out[a.alias] = final["pcnt_star" if a.col is None else f"pcnt_{a.col}"]
        elif a.op == "avg":
            out[a.alias] = final[f"psum_{a.col}"] / final[f"pcnt_{a.col}"]
        elif a.op == "min":
            out[a.alias] = final[f"pmin_{a.col}"]
        elif a.op == "max":
            out[a.alias] = final[f"pmax_{a.col}"]
        elif a.op == "countdistinct":
            out[a.alias] = final[f"pndv_{a.col}"]
    _attach_errors(out, acc, aggs, group_by, meta, hi_block)
    return out.reset_index(drop=True)


def _attach_errors(
    out: pd.DataFrame,
    acc: pd.DataFrame,
    aggs: Sequence[AggSpec],
    group_by: list[str],
    meta: ScrambleMeta,
    hi_block: int,
) -> None:
    """Subsample error estimates for EVERY aggregate (the reference's
    rewriter covers all scaled aggs, SingleAggResultRewriter.java:
    203-281): each covered block yields an independent estimate of the
    final answer; <alias>_err = 1.96 * std(per-block estimates)/sqrt(b).

    Correctness details the naive version gets wrong:
    * per-block scale is the inverse CDF INCREMENT of that (tier,
      block) — NOT a constant nblocks — so fastconverge (non-uniform
      per-tier CDFs) and partial-size scrambles are calibrated;
    * (group, block) combinations with no rows are real observations
      of 0 for sum/count/ndv and must enter the variance (skipping
      them biases errors low for rare groups);
    * avg is a ratio of scaled sum to scaled count per block;
      min/max report the raw per-block spread (a stability heuristic,
      matching the reference's uniform subsample treatment).
    """
    blocks = sorted(acc[BLOCK_COL].unique())
    nb = len(blocks)
    if nb <= 1:
        return
    # inverse single-block inclusion probability per (tier, block) row
    inv_p = np.array(
        [1.0 / meta.block_prob(int(b), int(t)) for t, b in zip(acc[TIER_COL], acc[BLOCK_COL])]
    )

    def per_block_scaled(src: str) -> pd.DataFrame:
        """Per-(group, block) estimate of the population total from that
        block alone, zero-filled over groups x covered blocks."""
        tmp = acc[group_by + [BLOCK_COL]].copy()
        tmp["_v"] = acc[src].to_numpy() * inv_p
        per = tmp.groupby(group_by + [BLOCK_COL], dropna=False, sort=False)["_v"].sum()
        if group_by:
            full = pd.MultiIndex.from_product(
                [per.index.get_level_values(g).unique() for g in group_by] + [blocks],
                names=group_by + [BLOCK_COL],
            )
            per = per.reindex(full, fill_value=0.0)
        else:
            per = per.reindex(blocks, fill_value=0.0)
        return per.reset_index()

    def err_from(per: pd.DataFrame, col: str) -> pd.Series | float:
        if group_by:
            st = per.groupby(group_by, dropna=False, sort=False)[col].agg(["std", "count"])
            return 1.96 * st["std"] / np.sqrt(st["count"])
        return 1.96 * per[col].std() / np.sqrt(len(per))

    def put(alias: str, err) -> None:
        if group_by:
            err_map = err.to_dict()
            keys = (
                out[group_by].itertuples(index=False, name=None)
                if len(group_by) > 1
                else out[group_by[0]]
            )
            out[f"{alias}_err"] = [
                err_map.get(tuple(k) if len(group_by) > 1 else k, np.nan) for k in keys
            ]
        else:
            out[f"{alias}_err"] = err

    for a in aggs:
        if a.op in ("sum", "count", "countdistinct"):
            src = {
                "sum": f"psum_{a.col}",
                "count": "pcnt_star" if a.col is None else f"pcnt_{a.col}",
                "countdistinct": f"pndv_{a.col}",
            }[a.op]
            per = per_block_scaled(src)
            put(a.alias, err_from(per, "_v"))
        elif a.op == "avg":
            num = per_block_scaled(f"psum_{a.col}").rename(columns={"_v": "_num"})
            den = per_block_scaled(f"pcnt_{a.col}").rename(columns={"_v": "_den"})
            per = num.merge(den, on=group_by + [BLOCK_COL])
            # blocks with no rows of the group carry no ratio information
            per = per[per["_den"] > 0].copy()
            per["_r"] = per["_num"] / per["_den"]
            put(a.alias, err_from(per, "_r"))
        elif a.op in ("min", "max"):
            src = f"pmin_{a.col}" if a.op == "min" else f"pmax_{a.col}"
            per = (
                acc.groupby(group_by + [BLOCK_COL], dropna=False, sort=False)[src]
                .agg(a.op)
                .reset_index()
            )
            put(a.alias, err_from(per, src))


def progressive_agg(
    scramble: DataFrame,
    meta: ScrambleMeta,
    aggs: Sequence[AggSpec],
    group_by: Sequence[str] = (),
    schedule: str = "doubling",
    transform=None,
) -> Iterator[ProgressiveResult]:
    """Yield progressively refined estimates, one per block span.

    Each iteration scans ONLY the new blocks (partition-pruned when
    the scramble is stored partitioned by block) and merges their
    partials into the accumulated in-memory partial table.

    ``transform(batch_df) -> DataFrame`` is applied to each pruned
    block batch BEFORE aggregation — the scramble-join-dimension path
    (the reference plans scramble x dim joins as per-block cubes,
    ``ola/OlaAggregationPlan.java:43-68``): join broadcast dimensions,
    filter, derive columns.  The sampling contract: each scramble row
    may map to any number of output rows, but the mapping must be
    deterministic and row-local (FK joins / filters / projections),
    so per-block inclusion probabilities carry through unchanged.
    ``transform`` must preserve the tier/block columns.
    """
    _validate(aggs, meta)
    group_by = list(group_by)
    partial_exprs = _partial_exprs(aggs)
    acc: list[pd.DataFrame] = []
    spans = _schedule(meta.nblocks, schedule)
    for it, (lo, hi) in enumerate(spans):
        batch = scramble.where(F.col(BLOCK_COL).between(lo, hi))
        if transform is not None:
            batch = transform(batch)
        pdf = (
            batch.groupBy(*group_by, TIER_COL, BLOCK_COL)
            .agg(*partial_exprs)
            .toPandas()
        )
        if len(pdf):
            acc.append(pdf)
        if not acc:
            continue
        whole = pd.concat(acc, ignore_index=True)
        est = _estimate(whole, aggs, group_by, meta, hi)
        cov = meta.coverage(hi, 0)
        yield ProgressiveResult(
            estimates=est,
            coverage=cov,
            blocks_covered=hi + 1,
            iteration=it,
            # a partial-size scramble never reaches coverage 1: its
            # full prefix is still an estimate of the original table
            is_exact=hi + 1 >= meta.nblocks and cov >= 1.0 - 1e-9,
        )


def converged(
    prev: pd.DataFrame,
    cur: pd.DataFrame,
    group_by: Sequence[str],
    value_cols: Sequence[str],
    value_threshold: float = 0.02,
    group_threshold: float = 0.05,
) -> bool:
    """The reference's difference-based stop rule
    (QueryResultAccuracyEstimatorFromDifference.java:126-217)."""
    if abs(len(cur) - len(prev)) > group_threshold * max(len(prev), 1):
        return False
    gb = list(group_by)
    if gb:
        m = prev.merge(cur, on=gb, suffixes=("_p", "_c"))
        if len(m) < max(len(prev), len(cur)) * (1 - group_threshold):
            return False
    else:
        m = pd.concat(
            [prev.add_suffix("_p").reset_index(drop=True), cur.add_suffix("_c").reset_index(drop=True)],
            axis=1,
        )
    for v in value_cols:
        p, c = m[f"{v}_p"].astype(float), m[f"{v}_c"].astype(float)
        denom = np.maximum(np.abs(p), 1e-12)
        if (np.abs(c - p) / denom > value_threshold).any():
            return False
    return True


def approx_agg(
    scramble: DataFrame,
    meta: ScrambleMeta,
    aggs: Sequence[AggSpec],
    group_by: Sequence[str] = (),
    schedule: str = "doubling",
    value_threshold: float = 0.02,
    group_threshold: float = 0.05,
    transform=None,
    early_stop: bool = True,
) -> ProgressiveResult:
    """Run progressively until the stop rule fires (or full coverage).

    The early stop is the whole point at 100 TB: with 100 blocks and
    a converging aggregate this typically scans a few % of the data
    and never touches the remaining partitions.  ``early_stop=False``
    always runs to the full block prefix (the reference's own oracle
    mode: full coverage of a full-size scramble == exact).
    """
    prev: ProgressiveResult | None = None
    aliases = [a.alias for a in aggs]
    for res in progressive_agg(scramble, meta, aggs, group_by, schedule, transform):
        if early_stop and prev is not None and converged(
            prev.estimates, res.estimates, group_by, aliases,
            value_threshold, group_threshold,
        ):
            return res
        prev = res
    if prev is None:
        raise ValueError(
            "no blocks produced rows (empty scramble, or transform/where "
            "filtered out everything) — nothing to estimate"
        )
    return prev
