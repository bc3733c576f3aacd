"""Progressive aggregation over a JOIN OF TWO SCRAMBLES.

Rebuild of the reference's ripple/hyper-table-cube join planning
(``ola/OlaAggregationPlan.java:43-68`` plans the block-combination
sequence, ``ola/HyperTableCube.java:69-106`` slices the block plane,
``ola/AggMeta.java:149-185`` multiplies per-scramble coverage into the
scale factor).  Spark-first re-expression:

* The block plane (block1 x block2) is covered by an expanding square
  prefix, doubling per iteration.  Each iteration joins ONLY the
  L-shaped increment — (new blocks1 x covered blocks2) union
  (old blocks1 x new blocks2) — so a full run joins every block pair
  exactly once; with written scrambles both sides are partition-pruned
  file scans.  This is the cube-slicing idea with Catalyst doing the
  physical join planning per slice.
* A joined row pair survives iff BOTH source rows' blocks are in their
  prefixes.  With independent scramble hashes the inclusion
  probability multiplies: P = cdf1(tier1, hi1) * cdf2(tier2, hi2) —
  the reference's scale product (``AggMeta.java:149-185``).  The
  composite (tier1, tier2) plays the role of the tier, block1 the role
  of the subsample block, and the single-scramble estimator
  (``progressive._estimate`` incl. subsample error bars) is reused
  verbatim through a meta adapter.
* ALIGNED hash scrambles (both sides hash-scrambled on the join key
  with the same seed and block count) are detected and handled with
  the stronger rule: matching rows hash identically, so block1 ==
  block2 for every matching pair — the join is restricted with a
  block-equality predicate (co-partitioned slices, no cross terms) and
  inclusion is a SINGLE event with P = cdf(tier, hi), not a product.
  This is what makes COUNT(DISTINCT join_key) over a join legal, the
  reference's scramble-correctness rule
  (``SelectQueryCoordinator.ensureScrambleCorrectness:189-238``).
"""

from __future__ import annotations

from typing import Iterator, Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .progressive import (
    AggSpec,
    ProgressiveResult,
    _estimate,
    _partial_exprs,
    converged,
)
from .scramble import BLOCK_COL, TIER_COL, ScrambleMeta

_TIER2 = "_verdictdbtier2"
_BLOCK2 = "_verdictdbblock2"


class _JoinMeta:
    """Adapter presenting a scramble-pair as a single scramble to
    ``progressive._estimate``: tier = composite t1 * K + t2, block =
    block1, coverage/block_prob multiplied by side 2's prefix coverage
    (fixed per iteration).  ``aligned=True`` drops the product (the
    inclusion events coincide)."""

    def __init__(self, m1: ScrambleMeta, m2: ScrambleMeta, hi2: int, aligned: bool):
        self.m1, self.m2, self.hi2, self.aligned = m1, m2, hi2, aligned
        self.nblocks = m1.nblocks
        self.k2 = max(len(m2.cdf), 1)

    def composite(self, t1: int, t2: int) -> int:
        return t1 * self.k2 + t2

    def _split(self, t: int) -> tuple[int, int]:
        return t // self.k2, t % self.k2

    def coverage(self, upto_block: int, tier: int = 0) -> float:
        t1, t2 = self._split(int(tier))
        c1 = self.m1.coverage(upto_block, t1)
        if self.aligned:
            return c1
        return c1 * self.m2.coverage(self.hi2, t2)

    def block_prob(self, block: int, tier: int = 0) -> float:
        t1, t2 = self._split(int(tier))
        p1 = self.m1.block_prob(block, t1)
        if self.aligned:
            return p1
        return p1 * self.m2.coverage(self.hi2, t2)


def is_aligned(meta1: ScrambleMeta, meta2: ScrambleMeta, on: Sequence[tuple[str, str]]) -> bool:
    """True iff both scrambles hash-partition the join key identically:
    same method=hash, same seed, same block count, and the two hash
    columns are the two sides of the SAME equi-join pair (hash columns
    on different pairs hash different values — blocks would not match).
    Then every matching row pair shares a block."""
    if meta1.method != "hash" or meta2.method != "hash":
        return False
    if meta1.seed != meta2.seed or meta1.nblocks != meta2.nblocks:
        return False
    return any(
        meta1.hash_column == lc and meta2.hash_column == rc for lc, rc in on
    )


def _validate_join(
    aggs: Sequence[AggSpec],
    meta1: ScrambleMeta,
    meta2: ScrambleMeta,
    on: Sequence[tuple[str, str]],
    aligned: bool,
) -> None:
    for a in aggs:
        if a.op == "countdistinct":
            if not aligned:
                raise ValueError(
                    "countdistinct over a scramble join requires ALIGNED hash "
                    "scrambles on the join key (same seed and block count) — "
                    "the reference enforces the analogous rule "
                    "(SelectQueryCoordinator.ensureScrambleCorrectness:189-238)"
                )
            keys = {c for pair in on for c in pair}
            if a.col not in keys:
                raise ValueError(
                    f"countdistinct({a.col}) over a join is only exact per block "
                    f"when the column is the hash-aligned join key {sorted(keys)}"
                )


def _spans(n1: int, n2: int) -> list[tuple[int, int, int, int]]:
    """Square doubling prefixes: (lo1, hi1, lo2, hi2) per iteration,
    where lo marks the first NEW block of the iteration (lo > hi means
    that side gained nothing)."""
    out, p_prev1, p_prev2, p = [], 0, 0, 1
    while p_prev1 < n1 or p_prev2 < n2:
        p1, p2 = min(p, n1), min(p, n2)
        out.append((p_prev1, p1 - 1, p_prev2, p2 - 1))
        p_prev1, p_prev2, p = p1, p2, p * 2
    return out


def progressive_join_agg(
    scramble1: DataFrame,
    meta1: ScrambleMeta,
    scramble2: DataFrame,
    meta2: ScrambleMeta,
    on: Sequence[tuple[str, str]],
    aggs: Sequence[AggSpec],
    group_by: Sequence[str] = (),
    transform=None,
) -> Iterator[ProgressiveResult]:
    """Yield progressively refined estimates over scramble1 ⋈ scramble2.

    ``on`` is a list of (left_col, right_col) equi-join pairs.  Each
    iteration doubles the covered square of the block plane and joins
    only the L-shaped increment; partials accumulate driver-side (the
    reference's in-memory combiner) keyed by (group, tier1, block1,
    tier2), and the estimate applies the coverage-product scale.

    ``transform(joined_df) -> DataFrame`` runs on each joined increment
    before aggregation (broadcast-dim joins, filters, derived columns)
    under the same row-local contract as ``progressive_agg``.
    """
    group_by = list(group_by)
    aligned = is_aligned(meta1, meta2, on)
    _validate_join(aggs, meta1, meta2, on, aligned)
    partial_exprs = _partial_exprs(aggs)

    # side 2's tier/block columns are renamed so the join output keeps
    # both coordinate systems
    s2 = scramble2.withColumnRenamed(TIER_COL, _TIER2).withColumnRenamed(
        BLOCK_COL, _BLOCK2
    )
    cond = None
    for lc, rc in on:
        c = scramble1[lc] == s2[rc]
        cond = c if cond is None else cond & c
    if aligned:
        cond = cond & (scramble1[BLOCK_COL] == s2[_BLOCK2])

    def partials(lo1: int, hi1: int, lo2: int, hi2: int) -> list[pd.DataFrame]:
        """Aggregate the L-shaped increment (new1 x all2) + (old1 x new2)."""
        pieces = []
        slices = []
        if hi1 >= lo1:
            slices.append((lo1, hi1, 0, hi2))  # new blocks1 x full prefix2
        if hi2 >= lo2 and lo1 > 0:
            slices.append((0, lo1 - 1, lo2, hi2))  # old prefix1 x new blocks2
        if aligned:
            # block1 == block2 for matches: the only populated cells of
            # the increment are the new diagonal blocks
            slices = [(max(lo1, lo2), min(hi1, hi2), max(lo1, lo2), min(hi1, hi2))]
            if slices[0][0] > slices[0][1]:
                return []
        for a1, b1, a2, b2 in slices:
            left = scramble1.where(F.col(BLOCK_COL).between(a1, b1))
            right = s2.where(F.col(_BLOCK2).between(a2, b2))
            joined = left.join(right, cond)
            if transform is not None:
                joined = transform(joined)
            pdf = (
                joined.groupBy(*group_by, TIER_COL, BLOCK_COL, _TIER2)
                .agg(*partial_exprs)
                .toPandas()
            )
            if len(pdf):
                pieces.append(pdf)
        return pieces

    acc: list[pd.DataFrame] = []
    for it, (lo1, hi1, lo2, hi2) in enumerate(_spans(meta1.nblocks, meta2.nblocks)):
        acc.extend(partials(lo1, hi1, lo2, hi2))
        cur_hi1, cur_hi2 = max(hi1, lo1 - 1), max(hi2, lo2 - 1)
        if not acc:
            continue
        jm = _JoinMeta(meta1, meta2, cur_hi2, aligned)
        whole = pd.concat(acc, ignore_index=True)
        whole = whole.assign(
            **{
                TIER_COL: [
                    jm.composite(int(t1), int(t2))
                    for t1, t2 in zip(whole[TIER_COL], whole[_TIER2])
                ]
            }
        ).drop(columns=[_TIER2])
        est = _estimate(whole, aggs, group_by, jm, cur_hi1)
        cov1 = meta1.coverage(cur_hi1, 0)
        cov2 = meta2.coverage(cur_hi2, 0)
        cov = cov1 if aligned else cov1 * cov2
        yield ProgressiveResult(
            estimates=est,
            coverage=cov,
            blocks_covered=(cur_hi1 + 1) + (cur_hi2 + 1),
            iteration=it,
            is_exact=(
                cur_hi1 + 1 >= meta1.nblocks
                and cur_hi2 + 1 >= meta2.nblocks
                and cov >= 1.0 - 1e-9
            ),
        )


def approx_join_agg(
    scramble1: DataFrame,
    meta1: ScrambleMeta,
    scramble2: DataFrame,
    meta2: ScrambleMeta,
    on: Sequence[tuple[str, str]],
    aggs: Sequence[AggSpec],
    group_by: Sequence[str] = (),
    value_threshold: float = 0.02,
    group_threshold: float = 0.05,
    transform=None,
    early_stop: bool = True,
) -> ProgressiveResult:
    """Run the join progression until the difference-based stop rule
    fires (or the block plane is fully covered)."""
    prev: ProgressiveResult | None = None
    aliases = [a.alias for a in aggs]
    for res in progressive_join_agg(
        scramble1, meta1, scramble2, meta2, on, aggs, group_by, transform
    ):
        if early_stop and prev is not None and converged(
            prev.estimates, res.estimates, group_by, aliases,
            value_threshold, group_threshold,
        ):
            return res
        prev = res
    if prev is None:
        raise ValueError(
            "no block pairs produced rows (empty scrambles or an "
            "everything-filtering transform) — nothing to estimate"
        )
    return prev
