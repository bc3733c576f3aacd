"""Round-4 front-door surface: composite aggregate expressions,
LEFT JOIN scramble->dims, FROM derived tables, the distributed
``sql()`` finish (no driver round-trip for the Spark estimate
engine), STREAM error columns, predicate-less APPEND, late
engine-switch lift, and the round-3 ADVICE regressions (literal
masking in rewrite_aggs, duplicate aliases, narrowed fallback
catch)."""

from __future__ import annotations

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
    c = VerdictContext(spark, str(tmp_path_factory.mktemp("r4_root")))
    c.create_scramble("lineitem", lineitem, method="uniform", nblocks=6, seed=3)
    return c


# ----------------------------------------- composite aggregate expressions
def test_parse_composite_ratio():
    p = parse_select(
        "SELECT g, sum(a)/sum(b) AS ratio FROM t GROUP BY g"
    )
    assert p.composites and p.composites[0][0] == "ratio"
    # both agg calls decomposed to hidden partial aliases
    hidden = [a for a in p.agg_items if a.hidden]
    assert len(hidden) == 2
    assert all(h.alias in p.composites[0][1] for h in hidden)
    assert p.select_order == ["g", "ratio"]


def test_parse_composite_reuses_selected_agg():
    p = parse_select("SELECT sum(a) AS s, sum(a)+1 AS s1 FROM t")
    # the composite references the VISIBLE agg's alias, no hidden dup
    assert not [a for a in p.agg_items if a.hidden]
    assert p.composites[0][1].replace(" ", "") == "s+1"


def test_sql_composite_ratio_full_coverage(ctx, lineitem):
    out = ctx.sql(
        "SELECT l_returnflag, "
        "sum(l_extendedprice * (1 - l_discount)) / sum(l_quantity) AS rpq, "
        "100 * avg(l_discount) AS disc_pct, "
        "count(*) + 1 AS cnt1 "
        "FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag",
        early_stop=False,
    ).toPandas()
    exact = (
        lineitem.groupBy("l_returnflag")
        .agg(
            (
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
                / F.sum("l_quantity")
            ).alias("rpq"),
            (100 * F.avg("l_discount")).alias("disc_pct"),
            (F.count(F.lit(1)) + 1).alias("cnt1"),
        )
        .orderBy("l_returnflag")
        .toPandas()
    )
    assert list(out.columns) == ["l_returnflag", "rpq", "disc_pct", "cnt1"]
    for c in ("rpq", "disc_pct", "cnt1"):
        assert out[c].to_numpy() == pytest.approx(
            exact[c].to_numpy(), rel=1e-9
        ), c


def test_sql_composite_in_having_and_order(ctx, lineitem):
    out = ctx.sql(
        "SELECT l_returnflag, sum(l_quantity)/count(*) AS qpr "
        "FROM lineitem GROUP BY l_returnflag "
        "HAVING sum(l_quantity)/count(*) > 0 ORDER BY qpr DESC LIMIT 2",
        early_stop=False,
    ).toPandas()
    exact = (
        lineitem.groupBy("l_returnflag")
        .agg((F.sum("l_quantity") / F.count(F.lit(1))).alias("qpr"))
        .orderBy(F.desc("qpr"))
        .limit(2)
        .toPandas()
    )
    assert out["qpr"].to_numpy() == pytest.approx(exact["qpr"].to_numpy(), rel=1e-9)


def test_parse_duplicate_alias_unsupported():
    with pytest.raises(Unsupported, match="duplicate"):
        parse_select("SELECT sum(a) AS x, sum(b) AS x FROM t")


def test_rewrite_aggs_ignores_agg_text_in_literals():
    p = parse_select(
        "SELECT g, sum(a) AS s FROM t GROUP BY g HAVING g = 'sum(a)'"
    )
    assert "'sum(a)'" in p.having  # literal untouched
    assert not [a for a in p.agg_items if a.hidden]


# --------------------------------------------------- LEFT JOIN front door
def test_parse_left_join_how():
    p = parse_select(
        "SELECT count(*) AS c FROM a LEFT JOIN b ON a.x = b.y"
    )
    assert p.joins[0].how == "left"
    # round 5: RIGHT JOIN now parses by mirroring to the LEFT shape
    pr = parse_select("SELECT count(*) AS c FROM a RIGHT JOIN b ON a.x = b.y")
    assert [t.name for t in pr.tables] == ["b", "a"]
    assert pr.joins[0].how == "left"
    with pytest.raises(Unsupported):
        parse_select("SELECT count(*) AS c FROM a FULL OUTER JOIN b ON a.x = b.y")


def test_sql_left_join_scramble_probe_side(ctx, spark, lineitem, orders):
    """Scrambled lineitem LEFT JOIN a FILTERED dim: unmatched probe
    rows null-extend; count(col-from-dim) < count(*) distinguishes
    LEFT from INNER.  Full coverage == exact."""
    orders.where("o_totalprice > 150000").createOrReplaceTempView("orders_hot")
    out = ctx.sql(
        "SELECT l_returnflag, count(*) AS n_rows, "
        "count(o_orderkey) AS n_matched, sum(l_quantity) AS s "
        "FROM lineitem LEFT JOIN orders_hot ON l_orderkey = o_orderkey "
        "GROUP BY l_returnflag ORDER BY l_returnflag",
        early_stop=False,
    ).toPandas()
    oh = orders.where("o_totalprice > 150000")
    exact = (
        lineitem.join(oh, lineitem.l_orderkey == oh.o_orderkey, "left")
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count("o_orderkey").alias("n_matched"),
            F.sum("l_quantity").alias("s"),
        )
        .orderBy("l_returnflag")
        .toPandas()
    )
    # the LEFT semantics must actually differ from inner here
    assert (exact["n_matched"] < exact["n_rows"]).all()
    for c in ("n_rows", "n_matched", "s"):
        assert out[c].to_numpy() == pytest.approx(exact[c].to_numpy()), c


def test_left_join_scramble_null_side_rejected(ctx, orders):
    """dim LEFT JOIN scramble: the scramble sits on the null-producing
    side — the plan must refuse (exact fallback), never rewrite."""
    with pytest.raises(Unsupported):
        ctx._plan(
            "SELECT count(*) AS c FROM orders LEFT JOIN lineitem "
            "ON o_orderkey = l_orderkey"
        )


# ----------------------------------------------------- FROM derived table
def test_sql_from_subquery_scramble_row_local(ctx, lineitem):
    """(SELECT proj/filter FROM scrambled-base) x — inner block planned
    into the per-block transform; full coverage == exact."""
    out = ctx.sql(
        "SELECT flag, count(*) AS c, sum(qty2) AS s FROM "
        "(SELECT l_returnflag AS flag, l_quantity * 2 AS qty2 "
        " FROM lineitem WHERE l_quantity > 10) x "
        "GROUP BY flag ORDER BY flag",
        early_stop=False,
    ).toPandas()
    inner = lineitem.where("l_quantity > 10").select(
        F.col("l_returnflag").alias("flag"),
        (F.col("l_quantity") * 2).alias("qty2"),
    )
    exact = (
        inner.groupBy("flag")
        .agg(F.count(F.lit(1)).alias("c"), F.sum("qty2").alias("s"))
        .orderBy("flag")
        .toPandas()
    )
    assert list(out["flag"]) == list(exact["flag"])
    assert out["c"].to_numpy() == pytest.approx(exact["c"].to_numpy())
    assert out["s"].to_numpy() == pytest.approx(exact["s"].to_numpy())


def test_sql_from_subquery_opaque_dim(ctx, lineitem, orders):
    """A derived table over an UNscrambled base joins as an exact dim."""
    out = ctx.sql(
        "SELECT count(*) AS c FROM lineitem JOIN "
        "(SELECT o_orderkey AS ok FROM orders WHERE o_totalprice > 200000) d "
        "ON l_orderkey = ok",
        early_stop=False,
    ).first()["c"]
    oh = orders.where("o_totalprice > 200000")
    exact = lineitem.join(oh, lineitem.l_orderkey == oh.o_orderkey).count()
    assert out == pytest.approx(exact)


def test_parse_subquery_still_needs_alias():
    with pytest.raises(Unsupported):
        parse_select("SELECT count(*) AS c FROM (SELECT * FROM t)")


# --------------------------------------------------- WHERE subqueries
def test_parse_where_in_subquery_extracted():
    p = parse_select(
        "SELECT count(*) AS c FROM t WHERE a > 1 AND "
        "x IN (SELECT y FROM u WHERE z = 'AND b IN (SELECT q FROM v)') "
        "AND NOT EXISTS (SELECT 1 FROM w)"
    )
    kinds = [(w.kind, w.lhs) for w in p.where_subqs]
    assert kinds == [("in", "x"), ("not_exists", None)]
    assert p.where_subqs[0].inner.startswith("SELECT y FROM u")
    assert p.where.strip() == "a > 1"


def test_parse_where_in_lhs_and_inner_not_masked():
    """Review regressions: the probe lhs must come from the ORIGINAL
    text (function calls / literals survive), and the inner may itself
    contain parens (functions, nested selects)."""
    p = parse_select(
        "SELECT count(*) AS c FROM t WHERE upper(x) IN "
        "(SELECT max(y) FROM u WHERE year(d) = 2024)"
    )
    w = p.where_subqs[0]
    assert w.lhs == "upper(x)"
    assert w.inner == "SELECT max(y) FROM u WHERE year(d) = 2024"
    p2 = parse_select(
        "SELECT count(*) AS c FROM t WHERE x || 'z' IN (SELECT y FROM u)"
    )
    assert p2.where_subqs[0].lhs == "x || 'z'"


def test_case_end_and_window_implicit_aliases():
    """Review regression: CASE ... END sign and sum(x) OVER (...) w
    are complete expressions — the trailing word IS an alias."""
    from verdictdb_spark.sqlparse import _split_alias

    assert _split_alias("CASE WHEN a > 0 THEN 'p' ELSE 'n' END sign") == (
        "CASE WHEN a > 0 THEN 'p' ELSE 'n' END",
        "sign",
    )
    assert _split_alias("sum(x) OVER (PARTITION BY g) w") == (
        "sum(x) OVER (PARTITION BY g)",
        "w",
    )
    p = parse_select(
        "SELECT CASE WHEN l_quantity > 25 THEN 'hi' ELSE 'lo' END band, "
        "count(*) AS c FROM t GROUP BY 1"
    )
    assert p.select_order == ["band", "c"]


def test_sql_case_group_implicit_alias(ctx, lineitem):
    out = ctx.sql(
        "SELECT CASE WHEN l_quantity > 25 THEN 'hi' ELSE 'lo' END band, "
        "count(*) AS c FROM lineitem GROUP BY 1 ORDER BY band",
        early_stop=False,
    ).toPandas()
    assert list(out.columns) == ["band", "c"]
    exact = (
        lineitem.groupBy(
            F.when(F.col("l_quantity") > 25, "hi").otherwise("lo").alias("band")
        )
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy("band")
        .toPandas()
    )
    assert out["c"].to_numpy() == pytest.approx(exact["c"].to_numpy())


def test_stream_const_false_yields_nothing(spark, tmp_path, lineitem):
    spark.sql(
        "SELECT * FROM VALUES (1), (CAST(NULL AS BIGINT)) AS t(k)"
    ).createOrReplaceTempView("ns_stream")
    c = VerdictContext(spark, str(tmp_path))
    c.create_scramble("lineitem", lineitem, method="uniform", nblocks=4, seed=1)
    res = list(
        c.stream(
            "SELECT count(*) AS c FROM lineitem WHERE l_orderkey NOT IN "
            "(SELECT k FROM ns_stream)"
        )
    )
    assert res == []  # constant-false: nothing to refine, no crash


def test_where_in_inner_unpersisted_after_run(ctx, spark, lineitem, orders):
    """Review regression: the plan-time-persisted inner must not leak
    into the Spark cache after the query completes."""
    before = len([r for r in spark.sparkContext._jsc.sc().getRDDStorageInfo()])
    ctx.sql(
        "SELECT count(*) AS c FROM lineitem WHERE l_orderkey IN "
        "(SELECT o_orderkey FROM orders WHERE o_totalprice > 300000)",
        early_stop=False,
    ).collect()
    after = len([r for r in spark.sparkContext._jsc.sc().getRDDStorageInfo()])
    assert after <= before + 1  # localCheckpoints aside, no growing leak


def test_stream_composite_div_by_zero_matches_sql_null(spark, tmp_path):
    """pandas-eval fast path must not report inf where Spark gives
    NULL for x/0."""
    pdf = spark.createDataFrame(
        [(i % 3, float(i), 0.0 if i % 3 == 0 else 1.0) for i in range(3000)],
        "g int, a double, b double",
    )
    pdf.createOrReplaceTempView("dz")
    c = VerdictContext(spark, str(tmp_path))
    c.create_scramble("dz", spark.table("dz"), method="uniform", nblocks=3, seed=2)
    res = list(
        c.stream("SELECT g, sum(a)/sum(b) AS r FROM dz GROUP BY g")
    )
    est = res[-1].estimates
    import numpy as np

    assert not np.isinf(est["r"].to_numpy(dtype=float)).any()
    # g=0 has sum(b)=0 -> NULL/NaN, matching Spark SQL
    assert est.set_index("g")["r"].isna().loc[0]


def test_parse_infix_tail_not_implicit_alias():
    p = parse_select("SELECT g, count(*) AS c FROM t WHERE a LIKE b GROUP BY g")
    assert p.where.strip() == "a LIKE b"
    # select-item side: `a LIKE b` must not split into expr+alias
    from verdictdb_spark.sqlparse import _split_alias

    assert _split_alias("a LIKE pat") == ("a LIKE pat", None)
    assert _split_alias("INTERVAL '1' DAY") == ("INTERVAL '1' DAY", None)
    assert _split_alias("sum(a) total") == ("sum(a)", "total")


def test_sql_where_in_function_lhs(ctx, lineitem, orders):
    out = ctx.sql(
        "SELECT count(*) AS c FROM lineitem WHERE (l_orderkey * 1) IN "
        "(SELECT max(o_orderkey) FROM orders)",
        early_stop=False,
    ).first()["c"]
    exact = (
        lineitem.join(
            orders.agg(F.max("o_orderkey").alias("mx")),
            F.col("l_orderkey") == F.col("mx"),
            "left_semi",
        ).count()
    )
    assert out == pytest.approx(exact)


def test_sql_where_in_subquery_executes(ctx, lineitem, orders):
    out = ctx.sql(
        "SELECT l_returnflag, count(*) AS c, sum(l_quantity) AS s "
        "FROM lineitem WHERE l_quantity > 5 AND l_orderkey IN "
        "(SELECT o_orderkey FROM orders WHERE o_totalprice > 200000) "
        "GROUP BY l_returnflag ORDER BY l_returnflag",
        early_stop=False,
    ).toPandas()
    exact = (
        lineitem.where("l_quantity > 5")
        .join(
            orders.where("o_totalprice > 200000").select("o_orderkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
            "left_semi",
        )
        .groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("c"), F.sum("l_quantity").alias("s"))
        .orderBy("l_returnflag")
        .toPandas()
    )
    assert list(out["l_returnflag"]) == list(exact["l_returnflag"])
    assert out["c"].to_numpy() == pytest.approx(exact["c"].to_numpy())
    assert out["s"].to_numpy() == pytest.approx(exact["s"].to_numpy())


def test_sql_where_not_in_null_semantics(ctx, spark, lineitem):
    """NOT IN against an inner set containing NULL must yield zero
    rows (SQL three-valued logic), not the anti-join answer."""
    spark.sql("SELECT * FROM VALUES (1), (CAST(NULL AS BIGINT)) AS t(k)").createOrReplaceTempView(
        "nullset"
    )
    out = ctx.sql(
        "SELECT count(*) AS c FROM lineitem WHERE l_orderkey NOT IN "
        "(SELECT k FROM nullset)",
        early_stop=False,
    )
    # progressive plan raises on empty estimates -> exact fallback also
    # returns 0; either way the SQL answer is 0 rows matched
    assert out.first()["c"] in (0, None)
    # and without the NULL the anti join is real
    spark.sql("SELECT * FROM VALUES (1), (2) AS t(k)").createOrReplaceTempView("nonull")
    out2 = ctx.sql(
        "SELECT count(*) AS c FROM lineitem WHERE l_orderkey NOT IN "
        "(SELECT k FROM nonull)",
        early_stop=False,
    ).first()["c"]
    exact2 = lineitem.where("l_orderkey NOT IN (1, 2)").count()
    assert out2 == pytest.approx(exact2)


def test_sql_where_exists_uncorrelated(ctx, lineitem, orders):
    out = ctx.sql(
        "SELECT count(*) AS c FROM lineitem WHERE EXISTS "
        "(SELECT 1 FROM orders WHERE o_totalprice > 200000)",
        early_stop=False,
    ).first()["c"]
    assert out == pytest.approx(lineitem.count())
    # correlated EXISTS (unresolvable inner) -> exact fallback, right answer
    out2 = ctx.sql(
        "SELECT count(*) AS c FROM lineitem WHERE EXISTS "
        "(SELECT 1 FROM orders WHERE o_orderkey = l_orderkey)"
    ).first()["c"]
    exact2 = (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"), "left_semi")
        .count()
    )
    assert out2 == exact2


# ------------------------------------------- distributed sql() finish line
def test_sql_spark_engine_no_driver_roundtrip(ctx, lineitem, monkeypatch):
    """With the Spark estimate engine, sql() must never materialize the
    estimates to driver pandas — the .estimates property raising proves
    the whole post-processing stayed on the DataFrame."""
    from verdictdb_spark.sampling.progressive import ProgressiveResult

    def boom(self):
        raise AssertionError("driver materialization of estimates")

    monkeypatch.setattr(ProgressiveResult, "estimates", property(boom))
    ctx.sql("SET verdictdb.engine = spark")
    try:
        out = ctx.sql(
            "SELECT l_orderkey, sum(l_quantity) AS s, count(*) AS c, "
            "sum(l_quantity)/count(*) AS r "
            "FROM lineitem GROUP BY l_orderkey "
            "HAVING count(*) > 0 ORDER BY l_orderkey LIMIT 50",
            early_stop=False,
        ).toPandas()
    finally:
        ctx.sql("SET verdictdb.engine = auto")
    monkeypatch.undo()
    exact = (
        lineitem.groupBy("l_orderkey")
        .agg(
            F.sum("l_quantity").alias("s"),
            F.count(F.lit(1)).alias("c"),
            (F.sum("l_quantity") / F.count(F.lit(1))).alias("r"),
        )
        .orderBy("l_orderkey")
        .limit(50)
        .toPandas()
    )
    assert list(out["l_orderkey"]) == list(exact["l_orderkey"])
    for c in ("s", "c", "r"):
        assert out[c].to_numpy() == pytest.approx(exact[c].to_numpy(), rel=1e-9)


# --------------------------------------------------- STREAM error columns
def test_sql_stream_prefix_exposes_err_columns(ctx):
    out = ctx.sql(
        "STREAM SELECT l_returnflag, sum(l_quantity) AS s "
        "FROM lineitem GROUP BY l_returnflag"
    )
    assert "s_err" in out.columns
    pdf = out.toPandas()
    assert (pdf["s_err"].dropna() >= 0).all()


# ------------------------------------------------- APPEND without WHERE
def test_ddl_append_without_where_appends_all(spark, tmp_path, lineitem):
    c = VerdictContext(spark, str(tmp_path))
    lineitem.limit(2000).createOrReplaceTempView("li_r4app")
    c.sql("CREATE SCRAMBLE r4app FROM li_r4app")
    n = c.sql("APPEND SCRAMBLE r4app").first()["appended_rows"]
    assert n == 2000
    out = c.sql("SELECT count(*) AS n FROM li_r4app", early_stop=False).first()["n"]
    assert out == pytest.approx(4000)  # doubled — everything re-appended


# --------------------------------------------------- late engine switch
def test_late_engine_switch_lifts_accumulated_partials(spark, lineitem):
    """Threshold crossed only past the coverage guard (>0.5): the
    engine must STILL switch — lifting the driver-accumulated chunks
    into a DataFrame — and the estimates must equal the exact answer
    at full coverage."""
    from verdictdb_spark.sampling import AggSpec
    from verdictdb_spark.sampling.progressive import progressive_agg
    from verdictdb_spark.sampling.scramble import create_scramble

    sdf, meta = create_scramble(lineitem, method="uniform", nblocks=8, seed=5)
    groups = lineitem.select("l_returnflag").distinct().count()
    # doubling spans: (0,0),(1,2),(3,6),(7,7) — with threshold higher
    # than 2 spans' partials but crossed at span 3 (coverage 7/8 > .5)
    thresh = groups * 3 * 2  # < rows after span (3,6), > after (1,2)
    results = list(
        progressive_agg(
            sdf, meta,
            [AggSpec("sum", "l_quantity", "s"), AggSpec("count", None, "c")],
            ["l_returnflag"], engine="auto", engine_threshold=thresh,
        )
    )
    final = results[-1]
    assert final.is_exact and final.estimates_sdf is not None
    got = final.estimates_sdf.orderBy("l_returnflag").toPandas()
    exact = (
        lineitem.groupBy("l_returnflag")
        .agg(F.sum("l_quantity").alias("s"), F.count(F.lit(1)).alias("c"))
        .orderBy("l_returnflag")
        .toPandas()
    )
    assert got["s"].to_numpy() == pytest.approx(exact["s"].to_numpy(), rel=1e-9)
    assert got["c"].to_numpy() == pytest.approx(exact["c"].to_numpy(), rel=1e-9)


# ------------------------------------------------ review-pass regressions
def test_parse_implicit_alias_without_as():
    """`sum(a) total` (no AS) must be the aliased aggregate, NOT a
    composite that silently renames the output column."""
    p = parse_select("SELECT g, sum(a) total FROM t GROUP BY g")
    assert not p.composites
    assert [a.alias for a in p.agg_items] == ["total"]
    assert p.select_order == ["g", "total"]
    p2 = parse_select("SELECT count(*) c FROM t")
    assert p2.agg_items[0].alias == "c"
    p3 = parse_select("SELECT g grp, sum(a)+1 s1 FROM t GROUP BY g")
    assert p3.group_items[0].alias == "grp"
    assert p3.composites[0][0] == "s1"
    # operators never read as implicit aliases
    p4 = parse_select("SELECT sum(a + b) AS s FROM t")
    assert p4.agg_items[0].expr.replace(" ", "") == "a+b"


def test_sql_implicit_alias_executes(ctx, lineitem):
    out = ctx.sql(
        "SELECT l_returnflag, sum(l_quantity) total FROM lineitem "
        "GROUP BY l_returnflag ORDER BY l_returnflag",
        early_stop=False,
    ).toPandas()
    assert list(out.columns) == ["l_returnflag", "total"]
    exact = (
        lineitem.groupBy("l_returnflag")
        .agg(F.sum("l_quantity").alias("total"))
        .orderBy("l_returnflag")
        .toPandas()
    )
    assert out["total"].to_numpy() == pytest.approx(exact["total"].to_numpy())


def test_stream_applies_composites(ctx, lineitem):
    results = list(
        ctx.stream(
            "SELECT l_returnflag, sum(l_quantity)/count(*) AS qpr "
            "FROM lineitem GROUP BY l_returnflag"
        )
    )
    est = results[-1].estimates
    assert "qpr" in est.columns
    assert not [c for c in est.columns if c.startswith("_vdb_h")]
    exact = (
        lineitem.groupBy("l_returnflag")
        .agg((F.sum("l_quantity") / F.count(F.lit(1))).alias("qpr"))
        .toPandas()
        .set_index("l_returnflag")
    )
    got = est.set_index("l_returnflag")
    for flag in exact.index:
        assert got.loc[flag, "qpr"] == pytest.approx(exact.loc[flag, "qpr"])


def test_debug_surfaces_unsupported_shape(ctx):
    ctx.sql("SET verdictdb.debug = true")
    try:
        from verdictdb_spark.sqlparse import Unsupported as U

        with pytest.raises(U):
            ctx.sql("SELECT sum(DISTINCT l_quantity) AS s FROM lineitem")
    finally:
        ctx.sql("SET verdictdb.debug = false")


def test_composite_residual_validated_at_plan_time(ctx):
    """An unparseable residual must reject BEFORE the progressive run
    (exact fallback), not after a full scan."""
    from verdictdb_spark.sqlparse import Unsupported as U

    with pytest.raises(U, match="composite"):
        ctx._plan(
            "SELECT l_returnflag, sum(l_quantity) OVER () AS w "
            "FROM lineitem GROUP BY l_returnflag"
        )


def test_avi_with_audio_stream_and_topdown():
    """strf belonging to an audio stream must not be read as pixel
    format; negative biHeight (top-down) frames must not be flipped."""
    import struct

    from verdictdb_spark.operators.multimodal import decode_avi, encode_avi

    rng = np.random.default_rng(3)
    px = rng.integers(0, 256, size=(2, 4, 6, 3), dtype=np.uint8)
    blob = bytearray(encode_avi(px))
    # splice an audio strl (strh 'auds' + WAVEFORMATEX strf whose
    # wBitsPerSample would alias as bpp=16) after the video strl
    strh = struct.pack("<4s4sIHHIIIIIIII4h", b"auds", b"\0\0\0\0",
                       0, 0, 0, 0, 1, 8000, 0, 100, 0, 0, 2, 0, 0, 0, 0)
    strf = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    aud = (b"LIST" + struct.pack("<I", 4 + 8 + len(strh) + 8 + len(strf))
           + b"strl" + b"strh" + struct.pack("<I", len(strh)) + strh
           + b"strf" + struct.pack("<I", len(strf)) + strf)
    hdrl_end = blob.index(b"LIST", 12 + blob.index(b"hdrl"))  # movi LIST start
    spliced = bytes(blob[:hdrl_end]) + aud + bytes(blob[hdrl_end:])
    # fix RIFF and hdrl sizes
    spliced = bytearray(spliced)
    struct.pack_into("<I", spliced, 4, len(spliced) - 8)
    hdrl_pos = spliced.index(b"hdrl") - 8
    old = struct.unpack_from("<I", spliced, hdrl_pos + 4)[0]
    struct.pack_into("<I", spliced, hdrl_pos + 4, old + len(aud))
    w, h, frames = decode_avi(bytes(spliced))
    assert (w, h, len(frames)) == (6, 4, 2)
    assert np.array_equal(frames[0], px[0])

    # top-down variant: negate biHeight in strf and un-flip the rows
    blob2 = bytearray(encode_avi(px[:1]))
    sf = blob2.index(b"strf") + 8
    struct.pack_into("<i", blob2, sf + 8, -4)  # biHeight = -h
    movi = blob2.index(b"00db") + 8
    row_bytes = 6 * 3 + ((-6 * 3) % 4)
    frame = bytes(blob2[movi : movi + row_bytes * 4])
    rows = [frame[i * row_bytes : (i + 1) * row_bytes] for i in range(4)]
    blob2[movi : movi + row_bytes * 4] = b"".join(reversed(rows))
    w2, h2, frames2 = decode_avi(bytes(blob2))
    assert np.array_equal(frames2[0], px[0])


def test_sample_frames_refuses_non_avi_clearly(spark):
    from verdictdb_spark.operators.multimodal import MEDIA_SCHEMA, sample_frames

    df = spark.createDataFrame(
        [(1, "video", bytearray(b"\x00\x00\x00 ftypmp42" + b"x" * 64), {"fmt": "mp4"})],
        MEDIA_SCHEMA,
    )
    with pytest.raises(Exception, match="ffmpeg"):
        sample_frames(df, n_frames=2).collect()


# ----------------------------------------------------- narrowed fallback
def test_debug_flag_surfaces_planner_errors(spark, tmp_path, lineitem):
    """countdistinct on a uniform scramble is a legal fallback by
    default, but SET verdictdb.debug = true must surface the error."""
    c = VerdictContext(spark, str(tmp_path))
    c.create_scramble("lineitem", lineitem, method="uniform", nblocks=4, seed=1)
    # default: silent exact fallback
    out = c.sql("SELECT count(DISTINCT l_orderkey) AS ndv FROM lineitem").first()["ndv"]
    assert out == lineitem.select("l_orderkey").distinct().count()
    c.sql("SET verdictdb.debug = true")
    with pytest.raises(ValueError, match="hash scramble"):
        c.sql("SELECT count(DISTINCT l_orderkey) AS ndv FROM lineitem")
