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
