"""Round-5 ADVICE regressions: OR-precedence guard on WHERE-subquery
extraction, const_false cache release, lossless-lift guard for bigint
partials, and undersized-AVI-frame-chunk validation."""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from verdictdb_spark.api import VerdictContext
from verdictdb_spark.sqlparse import Unsupported, parse_select


@pytest.fixture(scope="module")
def lineitem(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/lineitem.parquet").cache()
    df.createOrReplaceTempView("lineitem")
    yield df
    df.unpersist()


@pytest.fixture(scope="module")
def orders(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/orders.parquet").cache()
    df.createOrReplaceTempView("orders")
    yield df
    df.unpersist()


@pytest.fixture(scope="module")
def ctx(spark, tmp_path_factory, lineitem):
    c = VerdictContext(spark, str(tmp_path_factory.mktemp("r5_root")))
    c.create_scramble("lineitem", lineitem, method="uniform", nblocks=6, seed=5)
    return c


# --------------------------------------- OR precedence vs subquery hoist
def test_parse_or_beside_subquery_conjunct_unsupported():
    """`a OR b AND x IN (sub)` parses as `a OR (b AND x IN sub)`;
    splitting on AND would hoist the subquery into a mandatory filter
    and silently change results — must fall back to exact."""
    with pytest.raises(Unsupported):
        parse_select(
            "SELECT count(*) AS c FROM t "
            "WHERE a = 1 OR b = 2 AND x IN (SELECT y FROM u)"
        )


def test_parse_or_in_distant_conjunct_unsupported():
    # the OR lives in a DIFFERENT conjunct than the subquery — the
    # round-4 guard (which only looked inside the subquery conjunct's
    # own lhs) missed this shape
    with pytest.raises(Unsupported):
        parse_select(
            "SELECT count(*) AS c FROM t "
            "WHERE x IN (SELECT y FROM u) AND a = 1 OR b = 2"
        )


def test_parse_parenthesized_or_still_extracts():
    p = parse_select(
        "SELECT count(*) AS c FROM t "
        "WHERE (a = 1 OR b = 2) AND x IN (SELECT y FROM u)"
    )
    assert len(p.where_subqs) == 1
    assert p.where and "OR" in p.where


def test_parse_or_literal_not_confused():
    # 'OR' inside a string literal is not a disjunction
    p = parse_select(
        "SELECT count(*) AS c FROM t "
        "WHERE a = 'X OR Y' AND x IN (SELECT y FROM u)"
    )
    assert len(p.where_subqs) == 1


def test_sql_or_with_subquery_exact_fallback_matches(ctx, spark, lineitem, orders):
    q = (
        "SELECT count(*) AS c FROM lineitem "
        "WHERE l_linenumber = 7 OR l_quantity < 5 AND l_orderkey IN "
        "(SELECT o_orderkey FROM orders WHERE o_totalprice > 300000)"
    )
    got = ctx.sql(q).collect()[0]["c"]
    want = spark.sql(q).collect()[0]["c"]
    assert got == want


# ------------------------------------------- const_false cache release
def test_const_false_later_subquery_releases_earlier_inner(
    ctx, spark, lineitem, orders
):
    """First conjunct's inner is persisted at plan time; a LATER NOT IN
    over a NULL-bearing set proves the WHERE constant-false — the
    persisted inner must be dropped before the early return."""
    spark.sql(
        "SELECT CASE WHEN o_orderkey % 2 = 0 THEN o_custkey END AS k "
        "FROM orders"
    ).createOrReplaceTempView("nullable_keys")
    before = len(spark.sparkContext._jsc.sc().getRDDStorageInfo())
    q = (
        "SELECT count(*) AS c FROM lineitem "
        "WHERE l_orderkey IN (SELECT o_orderkey FROM orders WHERE "
        "o_totalprice > 300000) "
        "AND l_suppkey NOT IN (SELECT k FROM nullable_keys)"
    )
    got = ctx.sql(q).collect()[0]["c"]
    want = spark.sql(q).collect()[0]["c"]
    assert got == want == 0  # NOT IN over a null-bearing set is never true
    after = len(spark.sparkContext._jsc.sc().getRDDStorageInfo())
    assert after <= before  # no stranded persisted inner

    # stream(): same plan shape must yield nothing and leak nothing
    steps = list(ctx.stream(q))
    assert steps == []
    after2 = len(spark.sparkContext._jsc.sc().getRDDStorageInfo())
    assert after2 <= before


# ------------------------------------------------- lossless lift guard
def test_lift_partials_rejects_bigint_beyond_float64_exact(spark):
    from verdictdb_spark.sampling.progressive import _lift_partials

    template = spark.createDataFrame(
        [(1, 2)], "g int, psum_x bigint"
    )
    big = float(2**60)  # representable in float64 but NOT exact-integer
    pdf = pd.DataFrame({"g": [1], "psum_x": [big]})
    with pytest.raises(ValueError, match="exact-integer"):
        _lift_partials(spark, [pdf], template)
    # in-range values still lift fine and keep the template type
    ok = pd.DataFrame({"g": [1], "psum_x": [float(2**50)]})
    out = _lift_partials(spark, [ok], template)
    assert dict(out.dtypes)["psum_x"] == "bigint"
    assert out.collect()[0]["psum_x"] == 2**50


# -------------------------------------------- nested aggregation (depth 2+)
NESTED_INNER = (
    "SELECT l_orderkey, sum(l_quantity) AS s, count(*) AS n "
    "FROM lineitem GROUP BY l_orderkey"
)


def test_nested_agg_depth2_full_coverage_exact(ctx, spark, lineitem):
    """Exact outer over the approximate inner: full coverage == exact
    (the reference's aggregations-over-aggregations class,
    supported_queries.md:17-21)."""
    q = (
        "SELECT count(*) AS n_orders, sum(s) AS total_qty, max(n) AS max_lines "
        f"FROM ({NESTED_INNER}) t"
    )
    got = ctx.sql(q, early_stop=False).collect()[0]
    want = spark.sql(q).collect()[0]
    assert got["n_orders"] == want["n_orders"]
    assert got["total_qty"] == pytest.approx(want["total_qty"])
    assert got["max_lines"] == pytest.approx(want["max_lines"])


def test_nested_agg_outer_group_having_order(ctx, spark, lineitem):
    q = (
        "SELECT n, count(*) AS orders_with_n, avg(s) AS avg_qty "
        f"FROM ({NESTED_INNER}) t "
        "GROUP BY n HAVING count(*) > 10 ORDER BY n"
    )
    got = [r.asDict() for r in ctx.sql(q, early_stop=False).collect()]
    want = [r.asDict() for r in spark.sql(q).collect()]
    assert len(got) == len(want) > 0
    for g, w in zip(got, want):
        assert g["n"] == pytest.approx(w["n"])
        assert g["orders_with_n"] == w["orders_with_n"]
        assert g["avg_qty"] == pytest.approx(w["avg_qty"])


def test_nested_agg_depth3(ctx, spark, lineitem):
    q = (
        "SELECT max(m) AS mm FROM (SELECT n, avg(s) AS m "
        f"FROM ({NESTED_INNER}) a GROUP BY n) b"
    )
    got = ctx.sql(q, early_stop=False).collect()[0]["mm"]
    want = spark.sql(q).collect()[0]["mm"]
    assert got == pytest.approx(want)


def test_nested_agg_outer_window_function(ctx, spark, lineitem):
    """The outer runs at the FULL Spark SQL surface — a window function
    the front door itself rejects still works above a substituted
    inner."""
    q = (
        "SELECT l_orderkey, s, rank() OVER (ORDER BY s DESC, l_orderkey) AS rk "
        f"FROM ({NESTED_INNER}) t ORDER BY rk LIMIT 5"
    )
    got = [r.asDict() for r in ctx.sql(q, early_stop=False).collect()]
    want = [r.asDict() for r in spark.sql(q).collect()]
    for g, w in zip(got, want):
        assert g["l_orderkey"] == w["l_orderkey"]
        assert g["s"] == pytest.approx(w["s"])
        assert g["rk"] == w["rk"]


def test_nested_agg_consumes_spark_engine_frame(ctx, spark, lineitem, monkeypatch):
    """With the Spark estimate engine, the outer must consume the
    DISTRIBUTED inner frame — .estimates raising proves no driver
    round-trip of the inner's O(groups) rows."""
    from verdictdb_spark.sampling.progressive import ProgressiveResult

    def boom(self):
        raise AssertionError("driver materialization of inner estimates")

    monkeypatch.setattr(ProgressiveResult, "estimates", property(boom))
    ctx.sql("SET verdictdb.engine = spark")
    try:
        got = ctx.sql(
            f"SELECT count(*) AS n_orders, sum(s) AS total FROM ({NESTED_INNER}) t",
            early_stop=False,
        ).collect()[0]
    finally:
        ctx.sql("SET verdictdb.engine = auto")
    monkeypatch.undo()
    exact = (
        lineitem.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("s"))
        .agg(F.count(F.lit(1)).alias("n_orders"), F.sum("s").alias("total"))
        .collect()[0]
    )
    assert got["n_orders"] == exact["n_orders"]
    assert got["total"] == pytest.approx(exact["total"])


def test_nested_agg_no_scramble_falls_back(ctx, spark, orders):
    # inner over an UNSCRAMBLED table: nothing to substitute — plain
    # exact result, and no temp view left behind
    q = (
        "SELECT max(t) AS m FROM (SELECT o_custkey, sum(o_totalprice) AS t "
        "FROM orders GROUP BY o_custkey) x"
    )
    assert ctx._try_nested(q, early_stop=False) is None
    got = ctx.sql(q).collect()[0]["m"]
    want = spark.sql(q).collect()[0]["m"]
    assert got == want


def test_nested_agg_cleans_temp_views(ctx, spark, lineitem):
    ctx.sql(f"SELECT sum(s) AS t FROM ({NESTED_INNER}) x", early_stop=False).collect()
    leftover = [
        t.name for t in spark.catalog.listTables() if t.name.startswith("_vdb_nested")
    ]
    assert leftover == []


# ------------------------------------------- scalar comparison subquery
def test_scalar_subquery_full_coverage_exact(ctx, spark, lineitem):
    q = (
        "SELECT l_returnflag, count(*) AS c FROM lineitem "
        "WHERE l_quantity > (SELECT avg(l_quantity) FROM lineitem) "
        "GROUP BY l_returnflag ORDER BY l_returnflag"
    )
    got = [r.asDict() for r in ctx.sql(q, early_stop=False).collect()]
    want = [r.asDict() for r in spark.sql(q).collect()]
    assert [g["l_returnflag"] for g in got] == [w["l_returnflag"] for w in want]
    for g, w in zip(got, want):
        assert g["c"] == pytest.approx(w["c"])


def test_scalar_subquery_null_inner_const_false(ctx, spark, lineitem):
    q = (
        "SELECT count(*) AS c FROM lineitem "
        "WHERE l_quantity > (SELECT max(l_quantity) FROM lineitem WHERE 1 = 0)"
    )
    assert ctx.sql(q).collect()[0]["c"] == spark.sql(q).collect()[0]["c"] == 0


def test_scalar_subquery_multirow_inner_falls_back():
    from verdictdb_spark.sqlparse import parse_select

    # parse accepts the shape; the PLANNER rejects multi-row inners at
    # plan time (covered end-to-end by the exact fallback) — here pin
    # that parsing classifies the conjunct as scalar
    p = parse_select(
        "SELECT count(*) AS c FROM t WHERE x > (SELECT y FROM u)"
    )
    assert p.where_subqs[0].kind == "scalar"
    assert p.where_subqs[0].comp == ">"
    assert p.where is None


# ----------------------------------------------------- RIGHT JOIN mirror
def test_right_join_mirrors_to_left(ctx, spark, lineitem, orders):
    spark.sql(
        "SELECT * FROM orders WHERE o_totalprice > 150000"
    ).createOrReplaceTempView("orders_hot_r5")
    q = (
        "SELECT l_returnflag, count(*) AS n_rows, count(o_orderkey) AS n_matched "
        "FROM orders_hot_r5 RIGHT JOIN lineitem ON l_orderkey = o_orderkey "
        "GROUP BY l_returnflag ORDER BY l_returnflag"
    )
    got = [r.asDict() for r in ctx.sql(q, early_stop=False).collect()]
    want = [r.asDict() for r in spark.sql(q).collect()]
    for g, w in zip(got, want):
        assert g["n_rows"] == pytest.approx(w["n_rows"])
        assert g["n_matched"] == pytest.approx(w["n_matched"])
    # null-extension actually happened
    assert all(g["n_matched"] < g["n_rows"] for g in got)


def test_right_join_scramble_on_null_side_falls_back(ctx, spark, lineitem, orders):
    # lineitem RIGHT JOIN orders preserves orders; the scramble is on
    # the null-producing side -> mirrored plan must reject and fall
    # back to exact (never wrong)
    q = (
        "SELECT count(*) AS c FROM lineitem RIGHT JOIN orders "
        "ON l_orderkey = o_orderkey"
    )
    assert ctx.sql(q).collect()[0]["c"] == spark.sql(q).collect()[0]["c"]


# -------------------------------------------------------- CTE inlining
def test_cte_over_scramble_full_coverage_exact(ctx, spark, lineitem):
    q = (
        "WITH hot AS (SELECT l_returnflag, sum(l_quantity) AS s "
        "FROM lineitem WHERE l_quantity > 10 GROUP BY l_returnflag) "
        "SELECT max(s) AS m FROM hot"
    )
    got = ctx.sql(q, early_stop=False).collect()[0]["m"]
    want = spark.sql(q).collect()[0]["m"]
    assert got == pytest.approx(want)


def test_cte_chain_inlines(ctx, spark, lineitem):
    q = (
        "WITH a AS (SELECT l_returnflag, l_quantity FROM lineitem), "
        "b AS (SELECT l_returnflag FROM a WHERE l_quantity > 40) "
        "SELECT count(*) AS c FROM b"
    )
    got = ctx.sql(q, early_stop=False).collect()[0]["c"]
    want = spark.sql(q).collect()[0]["c"]
    assert got == pytest.approx(want)


def test_cte_multiuse_refuses_and_falls_back(ctx, spark, lineitem):
    from verdictdb_spark.sqlparse import inline_ctes

    q = (
        "WITH a AS (SELECT l_returnflag rf, count(*) c FROM lineitem "
        "GROUP BY l_returnflag) "
        "SELECT x.rf FROM a x JOIN a y ON x.rf = y.rf ORDER BY x.rf"
    )
    assert inline_ctes(q) is None  # multi-use -> keep original text
    got = [r["rf"] for r in ctx.sql(q).collect()]
    want = [r["rf"] for r in spark.sql(q).collect()]
    assert got == want


def test_cte_name_in_literal_not_counted():
    from verdictdb_spark.sqlparse import inline_ctes

    out = inline_ctes(
        "WITH a AS (SELECT x FROM t) SELECT count(*) AS c FROM a WHERE x <> 'a'"
    )
    assert out is not None and "WITH" not in out and "(SELECT x FROM t) a" in out


def test_cte_non_from_reference_refuses():
    from verdictdb_spark.sqlparse import inline_ctes

    # the single occurrence is a column qualifier, not a table position
    assert (
        inline_ctes("WITH a AS (SELECT x FROM t) SELECT y.a FROM y") is None
    )


# ---------------------------------------------------------- UNION ALL
def test_union_all_scramble_plus_exact(ctx, spark, lineitem, orders):
    q = (
        "SELECT l_returnflag AS k, count(*) AS c FROM lineitem GROUP BY l_returnflag "
        "UNION ALL "
        "SELECT o_orderstatus AS k, count(*) AS c FROM orders GROUP BY o_orderstatus"
    )
    got = sorted(
        (r["k"], round(r["c"])) for r in ctx.sql(q, early_stop=False).collect()
    )
    want = sorted((r["k"], r["c"]) for r in spark.sql(q).collect())
    assert got == want


def test_union_distinct_falls_back_exact(ctx, spark, lineitem, orders):
    q = (
        "SELECT l_returnflag AS k FROM lineitem GROUP BY l_returnflag "
        "UNION SELECT o_orderstatus AS k FROM orders GROUP BY o_orderstatus"
    )
    assert ctx._try_union(q, early_stop=False) is None
    got = sorted(r["k"] for r in ctx.sql(q).collect())
    want = sorted(r["k"] for r in spark.sql(q).collect())
    assert got == want


def test_union_all_trailing_order_by_handled(ctx, spark, lineitem, orders):
    # updated: a trailing ORDER BY/LIMIT scopes to the whole union and
    # is now handled by _try_union (stripped from the last block,
    # applied to the concatenated frame) instead of falling back
    q = (
        "SELECT l_returnflag AS k, count(*) AS c FROM lineitem GROUP BY l_returnflag "
        "UNION ALL "
        "SELECT o_orderstatus AS k, count(*) AS c FROM orders GROUP BY o_orderstatus "
        "ORDER BY c LIMIT 3"
    )
    handled = ctx._try_union(q, early_stop=False)
    assert handled is not None
    got = [(r["k"], r["c"]) for r in ctx.sql(q, early_stop=False).collect()]
    want = [(r["k"], r["c"]) for r in spark.sql(q).collect()]
    assert [k for k, _ in got] == [k for k, _ in want]
    for (_, g), (_, w) in zip(got, want):
        assert g == pytest.approx(w)


def test_stream_nested_refines_to_exact(ctx, spark, lineitem):
    """STREAM over a nested-aggregation statement: each step is the
    exact outer evaluated over the inner's refinement snapshot; the
    final step (full coverage) equals the exact answer."""
    q = (
        "SELECT count(*) AS n_flags, max(s) AS mx "
        "FROM (SELECT l_returnflag, sum(l_quantity) AS s "
        "FROM lineitem GROUP BY l_returnflag) t"
    )
    steps = list(ctx.stream(q))
    assert len(steps) > 1
    assert steps[0].coverage < steps[-1].coverage
    final = steps[-1].estimates
    want = spark.sql(q).collect()[0]
    assert int(final["n_flags"].iloc[0]) == want["n_flags"]
    assert float(final["mx"].iloc[0]) == pytest.approx(want["mx"])


def test_stream_non_nested_unsupported_still_raises(ctx, spark, orders):
    with pytest.raises(Exception):
        list(ctx.stream("SELECT max(o_totalprice) AS m FROM orders"))


# ----------------------------------------- review findings (round 5)
def test_nested_inner_valueerror_falls_back_exact(ctx, spark, lineitem):
    """COUNT DISTINCT on a uniform scramble raises ValueError at
    execution — _try_nested must treat it as the pass-through signal
    (like the front door), not crash sql()."""
    q = (
        "SELECT max(s) AS m FROM (SELECT l_returnflag, "
        "count(DISTINCT l_suppkey) AS s FROM lineitem "
        "GROUP BY l_returnflag) t"
    )
    got = ctx.sql(q).collect()[0]["m"]
    want = spark.sql(q).collect()[0]["m"]
    assert got == want


def test_nested_runs_inner_once_on_outer_reject(ctx, spark, lineitem, monkeypatch):
    """When the outer shape forces the nested path, the inner
    progressive run must execute exactly ONCE (the round-5 review
    found the except-branch fell through and re-ran it)."""
    calls = {"n": 0}
    orig = type(ctx)._try_nested

    def counting(self, query, early_stop):
        calls["n"] += 1
        return orig(self, query, early_stop)

    monkeypatch.setattr(type(ctx), "_try_nested", counting)
    ctx.sql(
        "SELECT DISTINCT s FROM (SELECT l_returnflag, sum(l_quantity) AS s "
        "FROM lineitem GROUP BY l_returnflag) t",
        early_stop=False,
    ).collect()
    # top-level call only — recursion would add one per depth, but this
    # is depth-2, so any value > 1 means the double-invocation regressed
    assert calls["n"] == 1


def test_union_autonamed_dotted_columns_no_crash(ctx, spark, lineitem, orders):
    # unaliased select items get dotted auto-names like '(count(1) * 2)';
    # alignment must index by exact name, not F.col dot-splitting
    q = (
        "SELECT count(*) * 2 FROM lineitem UNION ALL "
        "SELECT count(*) * 2 FROM orders"
    )
    got = sorted(round(r[0]) for r in ctx.sql(q, early_stop=False).collect())
    want = sorted(r[0] for r in spark.sql(q).collect())
    assert got == want


def test_union_with_mid_limit_surfaces_parse_error(ctx, spark, lineitem, orders):
    # LIMIT before a UNION is a Spark parse error; ctx.sql must surface
    # it, not fabricate a per-side answer
    q = (
        "SELECT l_orderkey FROM lineitem LIMIT 5 UNION ALL "
        "SELECT o_orderkey FROM orders"
    )
    with pytest.raises(Exception):
        spark.sql(q).collect()
    with pytest.raises(Exception):
        ctx.sql(q).collect()


def test_union_decimal_side_refuses_widening(ctx, spark, lineitem, orders):
    # decimal mixed with bigint keeps decimal under SQL promotion;
    # _try_union must refuse (exact fallback) instead of casting to
    # double and corrupting past 2^53
    q = (
        "SELECT CAST(count(*) AS DECIMAL(38,2)) AS c FROM orders UNION ALL "
        "SELECT count(*) AS c FROM orders"
    )
    assert ctx._try_union(q, early_stop=False) is None
    got = sorted(float(r["c"]) for r in ctx.sql(q).collect())
    want = sorted(float(r["c"]) for r in spark.sql(q).collect())
    assert got == want


def test_union_forwards_with_errors(ctx, spark, lineitem):
    # both sides over the scramble: _err flows through the union
    q = (
        "SELECT l_returnflag AS k, sum(l_quantity) AS s FROM lineitem "
        "WHERE l_quantity > 25 GROUP BY l_returnflag UNION ALL "
        "SELECT l_returnflag AS k, sum(l_quantity) AS s FROM lineitem "
        "WHERE l_quantity <= 25 GROUP BY l_returnflag"
    )
    out = ctx.sql(q, early_stop=True, with_errors=True)
    assert "s_err" in out.columns
    assert out.count() == 6


def test_union_arity_mismatch_not_masked_by_err_columns(ctx, spark, lineitem, orders):
    """A 1-column approximate side under STREAM grows an _err column;
    that must NOT make it unionable with a genuinely 2-column side —
    Spark rejects the arity mismatch and so must ctx.sql."""
    q = (
        "STREAM SELECT sum(l_quantity) AS s FROM lineitem UNION ALL "
        "SELECT o_orderkey, o_totalprice FROM orders"
    )
    with pytest.raises(Exception):
        ctx.sql(q).collect()


def test_stream_nested_steps_carry_no_err_and_star_expands(ctx, spark, lineitem):
    steps = list(
        ctx.stream(
            "SELECT * FROM (SELECT l_returnflag, sum(l_quantity) AS s "
            "FROM lineitem GROUP BY l_returnflag) t"
        )
    )
    for st in steps:
        assert list(st.estimates.columns) == ["l_returnflag", "s"]
    want = {
        r["l_returnflag"]: r["s"]
        for r in spark.sql(
            "SELECT l_returnflag, sum(l_quantity) AS s FROM lineitem "
            "GROUP BY l_returnflag"
        ).collect()
    }
    final = steps[-1].estimates.set_index("l_returnflag")["s"]
    for k, v in want.items():
        assert float(final[k]) == pytest.approx(v)


def test_stream_nested_early_steps_keep_their_snapshot(ctx, spark, lineitem):
    # per-step views: materializing EARLIER steps after the stream is
    # exhausted must still work (each step's frame holds its own
    # resolved plan; the old shared view name was re-registered every
    # iteration and would alias all steps under lazy analysis)
    steps = list(
        ctx.stream(
            "SELECT sum(s) AS total FROM (SELECT l_returnflag, "
            "sum(l_quantity) AS s FROM lineitem GROUP BY l_returnflag) t"
        )
    )
    assert len(steps) > 1
    first = float(steps[0].estimates["total"].iloc[0])  # post-exhaustion
    last = float(steps[-1].estimates["total"].iloc[0])
    exact = spark.sql(
        "SELECT sum(s) AS total FROM (SELECT l_returnflag, "
        "sum(l_quantity) AS s FROM lineitem GROUP BY l_returnflag) t"
    ).collect()[0]["total"]
    assert last == pytest.approx(exact)
    assert steps[0].coverage < 1.0 and steps[-1].coverage == 1.0
    assert first == pytest.approx(last, rel=0.25)  # H-T ballpark sanity


# ------------------------------------ aggregate dim beside a scramble
def test_aggdim_beside_scramble_full_coverage_exact(ctx, spark, lineitem, orders):
    """An aggregate derived table sitting beside a scramble in the same
    FROM now substitutes its own progressive estimate as the dimension
    (both sides approximate; full coverage on both == exact)."""
    ctx.create_scramble("orders", orders, method="uniform", nblocks=4, seed=9)
    q = (
        "SELECT o_orderstatus, count(*) AS n, "
        "sum(CAST(round(qty) AS BIGINT)) AS total_qty "
        "FROM orders JOIN (SELECT l_orderkey, sum(l_quantity) AS qty "
        "FROM lineitem GROUP BY l_orderkey) t ON o_orderkey = l_orderkey "
        "GROUP BY o_orderstatus ORDER BY o_orderstatus"
    )
    got = [r.asDict() for r in ctx.sql(q, early_stop=False).collect()]
    want = [r.asDict() for r in spark.sql(q).collect()]
    assert len(got) == len(want) > 0
    for g, w in zip(got, want):
        assert g["o_orderstatus"] == w["o_orderstatus"]
        assert g["n"] == pytest.approx(w["n"])
        assert g["total_qty"] == pytest.approx(w["total_qty"])


def test_aggdim_nonrewritable_inner_still_exact_dim(ctx, spark, lineitem, orders):
    # inner with DISTINCT (non-rewritable) keeps the old exact-dim path
    q = (
        "SELECT count(*) AS c FROM lineitem JOIN "
        "(SELECT DISTINCT o_orderkey FROM orders WHERE o_totalprice > 200000) t "
        "ON l_orderkey = o_orderkey"
    )
    got = ctx.sql(q, early_stop=False).collect()[0]["c"]
    want = spark.sql(q).collect()[0]["c"]
    assert got == pytest.approx(want)


# ------------------------------------------- composite error propagation
def test_composite_err_column_and_bound(ctx, spark, lineitem):
    out = ctx.sql(
        "SELECT l_returnflag, sum(l_quantity) AS s, "
        "sum(l_quantity)/count(*) AS r "
        "FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag",
        early_stop=True,
        with_errors=True,
    )
    assert out.columns == ["l_returnflag", "s", "s_err", "r", "r_err"]
    rows = out.collect()
    exact = {
        r["l_returnflag"]: r["r"]
        for r in spark.sql(
            "SELECT l_returnflag, sum(l_quantity)/count(*) AS r "
            "FROM lineitem GROUP BY l_returnflag"
        ).collect()
    }
    for r in rows:
        assert r["r_err"] is not None and r["r_err"] >= 0
        # the true ratio is a ratio of means — well inside estimate +-
        # a few half-widths even at partial coverage (generous x5)
        assert abs(r["r"] - exact[r["l_returnflag"]]) <= 5 * r["r_err"] + 1e-9


def test_composite_err_linear_matches_input_err(ctx, spark, lineitem):
    # for a LINEAR composite (s + 100) the delta bound equals s_err
    out = ctx.sql(
        "SELECT sum(l_quantity) AS s, sum(l_quantity) + 100 AS s1 FROM lineitem",
        early_stop=True,
        with_errors=True,
    ).collect()[0]
    assert out["s1_err"] == pytest.approx(out["s_err"], rel=1e-9)


# -------------------------------------------- AVI frame-chunk validation
def test_decode_avi_undersized_frame_chunk_raises():
    from verdictdb_spark.operators.multimodal import decode_avi, encode_avi

    frames = np.arange(2 * 4 * 6 * 3, dtype=np.uint8).reshape(2, 4, 6, 3)
    blob = bytearray(encode_avi(frames))
    pos = bytes(blob).index(b"00db")
    (size,) = struct.unpack_from("<I", blob, pos + 4)
    struct.pack_into("<I", blob, pos + 4, size - 8)  # shrink declared size
    with pytest.raises(ValueError, match="frame chunk holds"):
        decode_avi(bytes(blob))
    # untampered container still round-trips
    w, h, out = decode_avi(encode_avi(frames))
    assert (w, h, len(out)) == (6, 4, 2)
    assert np.array_equal(out[0], frames[0])
