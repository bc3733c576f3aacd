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
from pyspark.sql import types as T

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


class ProgressiveResult:
    """Progressive estimate snapshot.

    ``estimates`` is the pandas frame (group cols + alias cols +
    ``<alias>_err``).  Under the Spark estimate engine (high-cardinality
    group-bys) the estimate lives in ``estimates_sdf`` and ``estimates``
    materializes it lazily — callers that never touch ``.estimates``
    (e.g. writing the result out with Spark) keep the whole pipeline
    distributed."""

    def __init__(
        self,
        estimates: pd.DataFrame | None = None,
        coverage: float = 0.0,
        blocks_covered: int = 0,
        iteration: int = 0,
        is_exact: bool = False,
        estimates_sdf: DataFrame | None = None,
    ):
        if estimates is None and estimates_sdf is None:
            raise ValueError("need estimates or estimates_sdf")
        self._pdf = estimates
        self.estimates_sdf = estimates_sdf
        self.coverage = coverage
        self.blocks_covered = blocks_covered
        self.iteration = iteration
        self.is_exact = is_exact

    @property
    def estimates(self) -> pd.DataFrame:
        if self._pdf is None:
            self._pdf = self.estimates_sdf.toPandas()
        return self._pdf

    def renamed(self, mapping: dict[str, str]) -> "ProgressiveResult":
        """Copy with estimate columns renamed (whichever engine holds
        them) — every other field carries over."""
        if not mapping:
            return self
        out = ProgressiveResult.__new__(ProgressiveResult)
        out.__dict__.update(self.__dict__)
        if self.estimates_sdf is not None:
            out.estimates_sdf = self.estimates_sdf.withColumnsRenamed(mapping)
            out._pdf = None if self._pdf is None else self._pdf.rename(columns=mapping)
        else:
            out._pdf = self._pdf.rename(columns=mapping)
        return out


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
    if kind == "single":
        # one span covering every block: the one-shot mode for callers
        # that consume only the FINAL estimate (nested/derived-table
        # inners executed at plan time with early_stop=False) — one
        # scan, one partial aggregation, one estimate, zero
        # intermediate materializations
        return [(0, nblocks - 1)]
    if kind == "probe":
        # two spans: block 0 alone, then everything else.  The final-
        # only mode for the AUTO engine — the 1-block first span bounds
        # the driver partial frame at O(groups x tiers) rows and arms
        # the engine-threshold switch BEFORE the full prefix is pulled,
        # while the remainder still scans in one job (vs the doubling
        # ladder's log2(nblocks) jobs)
        if nblocks <= 1:
            return [(0, 0)]
        return [(0, 0), (1, nblocks - 1)]
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
    nb = acc[BLOCK_COL].nunique()
    if nb <= 1:
        return
    # inverse single-block inclusion probability per (tier, block) row
    inv_p = np.array(
        [1.0 / meta.block_prob(int(b), int(t)) for t, b in zip(acc[TIER_COL], acc[BLOCK_COL])]
    )

    # one sparse per-(group, block) pass for ALL sources; the empty
    # (group, block) cells enter the variance via the CLOSED FORM
    # (mean = S1/nb, E[v^2] = S2/nb) rather than a dense groups x
    # blocks zero-fill — identical numbers, O(nnz) memory (round 2's
    # dense MultiIndex grid was the last scale-killer at 10^6 groups).
    srcs: list[str] = []
    for a in aggs:
        if a.op in ("sum", "count", "countdistinct"):
            srcs.append(
                {
                    "sum": f"psum_{a.col}",
                    "count": "pcnt_star" if a.col is None else f"pcnt_{a.col}",
                    "countdistinct": f"pndv_{a.col}",
                }[a.op]
            )
        elif a.op == "avg":
            srcs += [f"psum_{a.col}", f"pcnt_{a.col}"]
    srcs = list(dict.fromkeys(srcs))
    minmax = [
        (f"pmin_{a.col}" if a.op == "min" else f"pmax_{a.col}", a.op)
        for a in aggs
        if a.op in ("min", "max")
    ]
    tmp = acc[group_by + [BLOCK_COL]].copy()
    for s in srcs:
        tmp[s] = acc[s].to_numpy() * inv_p
    for s, op in minmax:
        tmp[s] = acc[s].to_numpy()
    agg_spec = {s: "sum" for s in srcs} | {s: op for s, op in minmax}
    if group_by:
        per = (
            tmp.groupby(group_by + [BLOCK_COL], dropna=False, sort=False)
            .agg(agg_spec)
            .reset_index()
        )
    else:
        per = tmp.groupby([BLOCK_COL], sort=False).agg(agg_spec).reset_index()

    def grouped(frame: pd.DataFrame, col_map: dict[str, tuple[str, str]]):
        if group_by:
            return frame.groupby(group_by, dropna=False, sort=False).agg(**col_map)
        return pd.DataFrame(
            {k: [frame[c].agg(how)] for k, (c, how) in col_map.items()}
        )

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
            out[f"{alias}_err"] = float(err.iloc[0]) if hasattr(err, "iloc") else err

    for s in srcs:
        per[f"_sq_{s}"] = per[s] ** 2
    sums = grouped(
        per,
        {f"S1_{s}": (s, "sum") for s in srcs}
        | {f"S2_{s}": (f"_sq_{s}", "sum") for s in srcs},
    )

    def closed_form_err(s: str):
        """std over nb per-block estimates (implicit zeros), ddof=1."""
        mean = sums[f"S1_{s}"] / nb
        var = (sums[f"S2_{s}"] - nb * mean**2) / (nb - 1)
        return 1.96 * np.sqrt(np.maximum(var, 0.0) / nb)

    for a in aggs:
        if a.op in ("sum", "count", "countdistinct"):
            s = {
                "sum": f"psum_{a.col}",
                "count": "pcnt_star" if a.col is None else f"pcnt_{a.col}",
                "countdistinct": f"pndv_{a.col}",
            }[a.op]
            put(a.alias, closed_form_err(s))
        elif a.op == "avg":
            # blocks with no rows of the group carry no ratio information
            num, den = f"psum_{a.col}", f"pcnt_{a.col}"
            sub = per[per[den] > 0].copy()
            sub["_r"] = sub[num] / sub[den]
            st = grouped(sub, {"_std": ("_r", "std"), "_n": ("_r", "count")})
            put(a.alias, 1.96 * st["_std"] / np.sqrt(st["_n"]))
        elif a.op in ("min", "max"):
            s = f"pmin_{a.col}" if a.op == "min" else f"pmax_{a.col}"
            st = grouped(per, {"_std": (s, "std"), "_n": (s, "count")})
            put(a.alias, 1.96 * st["_std"] / np.sqrt(st["_n"]))


def _estimate_spark(
    partials: DataFrame,
    aggs: Sequence[AggSpec],
    group_by: list[str],
    meta: ScrambleMeta,
    hi_block: int,
) -> DataFrame:
    """Spark-side twin of ``_estimate`` + ``_attach_errors`` for
    HIGH-CARDINALITY group-bys: the (group, tier, block) partial table
    stays a DataFrame and both the Horvitz-Thompson totals and the
    closed-form subsample errors are computed as two Spark
    aggregations, so the driver never holds O(groups x blocks) rows —
    the reference switches to its CTAS/temp-table combiner
    (``ola/SelectAsyncAggExecutionNode``) for exactly this case.

    Numerically identical to the pandas path: totals scale each
    (tier, block) partial by 1/coverage(hi, tier); errors treat the
    per-block inverse-probability estimates (implicit zeros over the
    ``nb`` covered blocks) with the same ddof=1 closed form."""
    spark = partials.sparkSession
    pairs = partials.select(TIER_COL, BLOCK_COL).distinct().collect()
    nb = len({int(r[BLOCK_COL]) for r in pairs})
    rows = [
        (
            int(r[TIER_COL]),
            int(r[BLOCK_COL]),
            1.0 / meta.coverage(hi_block, int(r[TIER_COL])),
            1.0 / meta.block_prob(int(r[BLOCK_COL]), int(r[TIER_COL])),
        )
        for r in pairs
    ]
    scale_df = spark.createDataFrame(
        rows, schema=f"{TIER_COL} int, {BLOCK_COL} int, _scale double, _invp double"
    )
    pcols = [c for c in partials.columns if c.startswith(("psum_", "pcnt_", "pndv_"))]
    mins = [c for c in partials.columns if c.startswith("pmin_")]
    maxs = [c for c in partials.columns if c.startswith("pmax_")]
    j = partials.join(F.broadcast(scale_df), [TIER_COL, BLOCK_COL])
    # level 1: per (group, block) — tier-consolidated totals (S_) and
    # per-block single-block population estimates (V_) in one pass
    perb = j.groupBy(*group_by, BLOCK_COL).agg(
        *[F.sum(F.col(c) * F.col("_scale")).alias(f"S_{c}") for c in pcols],
        *[F.sum(F.col(c) * F.col("_invp")).alias(f"V_{c}") for c in pcols],
        *[F.min(c).alias(c) for c in mins],
        *[F.max(c).alias(c) for c in maxs],
    )

    def closed_err(v):  # std over nb per-block estimates, implicit zeros
        s1, s2 = F.sum(v), F.sum(F.col(v) * F.col(v))
        var = (s2 - s1 * s1 / F.lit(float(nb))) / F.lit(float(nb - 1))
        return 1.96 * F.sqrt(F.greatest(var, F.lit(0.0)) / F.lit(float(nb)))

    def obs_err(col):  # observed-blocks-only spread (avg ratio, min/max)
        return F.when(
            F.count(col) > 1,
            1.96 * F.stddev_samp(col) / F.sqrt(F.count(col).cast("double")),
        )

    final_exprs, out_cols = [], list(group_by)
    seen: set[str] = set()

    def add(expr, name):
        if name not in seen:
            seen.add(name)
            final_exprs.append(expr.alias(name))

    for c in pcols:
        add(F.sum(f"S_{c}"), c)
    for c in mins:
        add(F.min(c), c)
    for c in maxs:
        add(F.max(c), c)
    for a in aggs:
        if a.op in ("sum", "count", "countdistinct"):
            src = {
                "sum": f"psum_{a.col}",
                "count": "pcnt_star" if a.col is None else f"pcnt_{a.col}",
                "countdistinct": f"pndv_{a.col}",
            }[a.op]
            if nb > 1:
                add(closed_err(f"V_{src}"), f"{a.alias}_err")
        elif a.op == "avg":
            num, den = f"V_psum_{a.col}", f"V_pcnt_{a.col}"
            r = F.when(F.col(den) > 0, F.col(num) / F.col(den))
            if nb > 1:
                add(obs_err(r), f"{a.alias}_err")
        elif a.op in ("min", "max"):
            src = f"pmin_{a.col}" if a.op == "min" else f"pmax_{a.col}"
            if nb > 1:
                add(obs_err(F.col(src)), f"{a.alias}_err")
    agged = perb.groupBy(*group_by).agg(*final_exprs)
    sel = [F.col(g) for g in group_by]
    for a in aggs:
        if a.op == "sum":
            sel.append(F.col(f"psum_{a.col}").alias(a.alias))
        elif a.op == "count":
            sel.append(
                F.col("pcnt_star" if a.col is None else f"pcnt_{a.col}").alias(a.alias)
            )
        elif a.op == "avg":
            sel.append((F.col(f"psum_{a.col}") / F.col(f"pcnt_{a.col}")).alias(a.alias))
        elif a.op == "min":
            sel.append(F.col(f"pmin_{a.col}").alias(a.alias))
        elif a.op == "max":
            sel.append(F.col(f"pmax_{a.col}").alias(a.alias))
        elif a.op == "countdistinct":
            sel.append(F.col(f"pndv_{a.col}").alias(a.alias))
        if nb > 1:
            sel.append(F.col(f"{a.alias}_err"))
    return agged.select(*sel)


def _lift_partials(spark, pdfs: list[pd.DataFrame], template: DataFrame) -> DataFrame:
    """Upload driver-accumulated partial chunks into a DataFrame with
    the partial table's own schema.  ``toPandas`` coerces nullable
    integer columns to float64 (NaN for NULL), so a schema'd
    ``createDataFrame`` would reject them — instead the frame is
    uploaded with inferred types and each column is ``try_cast`` back
    to the template type (NaN -> NULL, which is what the NaN meant).
    Raises on uninferable all-NULL object columns OR on float-coerced
    integer columns whose magnitude exceeds 2**53 (float64 can no
    longer represent the bigint exactly — the round-trip would be
    lossy); the caller falls back to a rescan in either case."""
    pdf = pd.concat(pdfs, ignore_index=True)
    by_name = {f.name: f.dataType for f in template.schema.fields}
    int_types = (T.ByteType, T.ShortType, T.IntegerType, T.LongType)
    for c in pdf.columns:
        if isinstance(by_name.get(c), int_types) and pd.api.types.is_float_dtype(
            pdf[c]
        ):
            vals = pdf[c].to_numpy()
            finite = vals[np.isfinite(vals)]
            if finite.size and np.abs(finite).max() > 2.0**53:
                raise ValueError(
                    f"partial column {c!r} exceeds float64 exact-integer "
                    "range; lift would lose precision"
                )
    sdf = spark.createDataFrame(pdf)
    return sdf.select(
        *[
            sdf[c].try_cast(by_name[c]).alias(c) if c in by_name else sdf[c]
            for c in sdf.columns
        ]
    )


def converged_sdf(
    prev: DataFrame,
    cur: DataFrame,
    group_by: Sequence[str],
    value_cols: Sequence[str],
    value_threshold: float = 0.02,
    group_threshold: float = 0.05,
) -> bool:
    """Spark-side difference-based stop rule — ONE action over a
    null-safe full-outer join of the two estimate frames (the driver
    never materializes either side)."""
    gb = list(group_by)
    p = prev.select(
        *gb, *[F.col(v).alias(f"{v}_p") for v in value_cols]
    ).withColumn("_pm", F.lit(1))
    c = cur.select(
        *[F.col(g).alias(f"{g}_c") for g in gb],
        *[F.col(v).alias(f"{v}_c") for v in value_cols],
    ).withColumn("_cm", F.lit(1))
    if gb:
        cond = None
        for g in gb:
            e = p[g].eqNullSafe(c[f"{g}_c"])
            cond = e if cond is None else cond & e
        m = p.join(c, cond, "full_outer")
    else:
        m = p.crossJoin(c)
    viol = None
    for v in value_cols:
        rel = F.abs(F.col(f"{v}_c") - F.col(f"{v}_p")) / F.greatest(
            F.abs(F.col(f"{v}_p")), F.lit(1e-12)
        )
        x = F.max(F.when(rel > value_threshold, 1).otherwise(0))
        viol = x if viol is None else F.greatest(viol, x)
    row = m.agg(
        F.sum("_pm").alias("np"),
        F.sum("_cm").alias("nc"),
        F.sum(F.col("_pm") * F.col("_cm")).alias("nm"),
        viol.alias("viol"),
    ).first()
    np_, nc_, nm_ = (int(row[k] or 0) for k in ("np", "nc", "nm"))
    if np_ == 0 or nc_ == 0:
        # no rows (or no groups) yet on either side — "nothing changed
        # between two empty estimates" is NOT convergence
        return False
    if abs(nc_ - np_) > group_threshold * max(np_, 1):
        return False
    if gb and nm_ < max(np_, nc_) * (1 - group_threshold):
        return False
    return int(row["viol"] or 0) == 0


def converged_result(
    prev: ProgressiveResult,
    res: ProgressiveResult,
    group_by: Sequence[str],
    value_cols: Sequence[str],
    value_threshold: float = 0.02,
    group_threshold: float = 0.05,
) -> bool:
    """Engine-aware convergence between two progressive snapshots:
    Spark-side when both are Spark frames, pandas when both are
    driver frames; the auto-engine transition iteration never counts
    as converged (comparing across engines would materialize the big
    frame on the driver)."""
    if res.estimates_sdf is not None and prev.estimates_sdf is not None:
        return converged_sdf(
            prev.estimates_sdf, res.estimates_sdf, group_by, value_cols,
            value_threshold, group_threshold,
        )
    if res.estimates_sdf is not None or prev.estimates_sdf is not None:
        return False
    return converged(
        prev.estimates, res.estimates, group_by, value_cols,
        value_threshold, group_threshold,
    )


def progressive_agg(
    scramble: DataFrame,
    meta: ScrambleMeta,
    aggs: Sequence[AggSpec],
    group_by: Sequence[str] = (),
    schedule: str = "doubling",
    transform=None,
    engine: str = "auto",
    engine_threshold: int = 200_000,
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

    ``engine`` selects where partials accumulate and estimates are
    computed: ``"driver"`` collects the tiny per-(group, tier, block)
    partial table to pandas (the reference's in-memory H2 combiner);
    ``"spark"`` keeps it a DataFrame and runs the whole estimator as
    Spark aggregations (the reference's CTAS/temp-table path for
    high-cardinality group-bys, ``ola/SelectAsyncAggExecutionNode``);
    ``"auto"`` starts on the driver and switches to Spark once the
    accumulated partial rows exceed ``engine_threshold``.  At cluster
    scale swap the per-iteration ``localCheckpoint`` for a reliable
    checkpoint directory.
    """
    _validate(aggs, meta)
    group_by = list(group_by)
    partial_exprs = _partial_exprs(aggs)
    acc: list[pd.DataFrame] = []
    total_rows = 0
    acc_sdf: DataFrame | None = None
    use_spark = engine == "spark"
    have_rows = False
    spans = _schedule(meta.nblocks, schedule)
    for it, (lo, hi) in enumerate(spans):
        batch = scramble.where(F.col(BLOCK_COL).between(lo, hi))
        if transform is not None:
            batch = transform(batch)
        agg_df = batch.groupBy(*group_by, TIER_COL, BLOCK_COL).agg(*partial_exprs)
        if not use_spark:
            pdf = agg_df.toPandas()
            if len(pdf):
                acc.append(pdf)
                total_rows += len(pdf)
            # PROJECTED full-coverage partial rows (rows scale ~linearly
            # with covered blocks until groups saturate): switching on
            # the projection instead of the accumulated count means a
            # high-cardinality query crosses after its FIRST small span
            # — before a later span pulls the whole O(groups x blocks)
            # frame through toPandas (the probe schedule's second span
            # is everything, so a react-after-collect rule would defeat
            # the bound the 1-block first span exists to provide)
            cov_now = meta.coverage(hi, 0)
            projected = total_rows / max(cov_now, 1e-9)
            if engine == "auto" and projected > engine_threshold:
                # switch to the Spark engine.  Early crossing (<= half
                # coverage): RE-AGGREGATE the covered prefix in one
                # partition-pruned Spark job — cheap, and sidesteps the
                # Arrow nullable-int -> float64 coercion of the
                # collected chunks.  Late crossing (past half coverage,
                # where a rescan would redo most of the work): LIFT the
                # accumulated driver chunks into a DataFrame instead —
                # either way the driver never keeps growing an
                # O(groups x blocks) frame once the threshold fires.
                use_spark = True
                lifted = None
                if meta.coverage(hi, 0) > 0.5 and acc:
                    try:
                        lifted = _lift_partials(
                            scramble.sparkSession, acc, agg_df
                        ).localCheckpoint(eager=True)
                    except Exception:
                        lifted = None  # uninferable chunk — rescan below
                if lifted is not None:
                    acc_sdf = lifted
                else:
                    prefix = scramble.where(F.col(BLOCK_COL).between(0, hi))
                    if transform is not None:
                        prefix = transform(prefix)
                    acc_sdf = (
                        prefix.groupBy(*group_by, TIER_COL, BLOCK_COL)
                        .agg(*partial_exprs)
                        .localCheckpoint(eager=True)
                    )
                acc = []
        else:
            nxt = agg_df if acc_sdf is None else acc_sdf.unionByName(agg_df)
            # materialize: old blocks must not be re-scanned per iteration
            acc_sdf = nxt.localCheckpoint(eager=True)
        cov = meta.coverage(hi, 0)
        # a partial-size scramble never reaches coverage 1: its
        # full prefix is still an estimate of the original table
        exact = hi + 1 >= meta.nblocks and cov >= 1.0 - 1e-9
        if use_spark:
            # mirror the driver branch's "no partials yet -> no
            # estimate": an empty partial frame would yield an empty
            # (or all-NULL scalar) estimate that the stop rule could
            # spuriously accept.  The isEmpty probe runs on the
            # checkpointed frame and stops at the first non-empty
            # iteration (rows only accumulate).
            if acc_sdf is None or (not have_rows and acc_sdf.isEmpty()):
                continue
            have_rows = True
            yield ProgressiveResult(
                estimates_sdf=_estimate_spark(acc_sdf, aggs, group_by, meta, hi),
                coverage=cov,
                blocks_covered=hi + 1,
                iteration=it,
                is_exact=exact,
            )
        else:
            if not acc:
                continue
            whole = pd.concat(acc, ignore_index=True)
            est = _estimate(whole, aggs, group_by, meta, hi)
            yield ProgressiveResult(
                estimates=est,
                coverage=cov,
                blocks_covered=hi + 1,
                iteration=it,
                is_exact=exact,
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


def fold_progressive(
    results: Iterator[ProgressiveResult],
    aggs: Sequence[AggSpec],
    group_by: Sequence[str],
    early_stop: bool = True,
    value_threshold: float = 0.02,
    group_threshold: float = 0.05,
    empty_message: str = "no blocks produced rows — nothing to estimate",
) -> ProgressiveResult:
    """Fold a progressive iterator to its final snapshot: stop at the
    difference-based rule (engine-aware) or run to exhaustion.  The
    single folding loop shared by every approx_* driver and the SQL
    front door."""
    prev: ProgressiveResult | None = None
    aliases = [a.alias for a in aggs]
    for res in results:
        if early_stop and prev is not None and converged_result(
            prev, res, group_by, aliases, value_threshold, group_threshold
        ):
            return res
        prev = res
    if prev is None:
        raise ValueError(empty_message)
    return prev


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
    engine: str = "auto",
    engine_threshold: int = 200_000,
) -> ProgressiveResult:
    """Run progressively until the stop rule fires (or full coverage).

    The early stop is the whole point at 100 TB: with 100 blocks and
    a converging aggregate this typically scans a few % of the data
    and never touches the remaining partitions.  ``early_stop=False``
    always runs to the full block prefix (the reference's own oracle
    mode: full coverage of a full-size scramble == exact).
    """
    return fold_progressive(
        progressive_agg(
            scramble, meta, aggs, group_by, schedule, transform,
            engine=engine, engine_threshold=engine_threshold,
        ),
        aggs, group_by, early_stop, value_threshold, group_threshold,
        empty_message=(
            "no blocks produced rows (empty scramble, or transform/where "
            "filtered out everything) — nothing to estimate"
        ),
    )
