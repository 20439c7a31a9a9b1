"""SQL registration: native SQL UDFs match the Column builders bit for
bit, stay in codegen, and the Arrow UDF surface answers from SQL."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from geo_spark.functions import sql as s2sql
from geo_spark.functions.register import register_sql


@pytest.fixture(scope="module")
def reg(spark):
    register_sql(spark)
    return spark


@pytest.fixture(scope="module")
def cells(reg):
    """Deterministic valid biased cell ids at mixed levels."""
    from geo_spark.kernel import cellid as ck

    rng = np.random.default_rng(5)
    lat = rng.uniform(-80, 80, 512)
    lng = rng.uniform(-179, 179, 512)
    leaf = ck.cellid_from_latlng(lat, lng)
    ids = []
    for lvl in (4, 10, 20, 30):
        ids.append(ck.to_signed(ck.parent(leaf[::4], lvl)))
    arr = np.concatenate(ids).astype(np.int64)
    df = reg.createDataFrame([(int(v),) for v in arr], "cid long")
    df.createOrReplaceTempView("cells_t")
    return df


def test_native_sql_udfs_match_column_builders(reg, cells):
    got = reg.sql(
        """SELECT cid, s2_level(cid) AS lvl, s2_parent(cid, 3) AS par,
                  s2_range_min(cid) AS rmin, s2_range_max(cid) AS rmax,
                  s2_is_leaf(cid) AS leaf, s2_face(cid) AS face,
                  s2_next(cid) AS nxt, s2_prev(cid) AS prv,
                  s2_advance(cid, 3) AS adv
           FROM cells_t"""
    )
    want = cells.select(
        "cid",
        s2sql.level(F.col("cid")).alias("lvl"),
        s2sql.parent(F.col("cid"), 3).alias("par"),
        s2sql.range_min(F.col("cid")).alias("rmin"),
        s2sql.range_max(F.col("cid")).alias("rmax"),
        s2sql.is_leaf(F.col("cid")).alias("leaf"),
        s2sql.face(F.col("cid")).alias("face"),
        s2sql.next_cell(F.col("cid")).alias("nxt"),
        s2sql.prev_cell(F.col("cid")).alias("prv"),
        s2sql.advance(F.col("cid"), F.lit(3)).alias("adv"),
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_native_sql_udfs_inline_into_codegen(reg, cells):
    plan = reg.sql(
        "SELECT s2_parent(cid, 8) AS p FROM cells_t"
    )._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_arrow_udfs_from_sql(reg, cells):
    from geo_spark.kernel import cellid as ck

    rows = reg.sql(
        """SELECT s2_cellid(48.8, 2.3) AS cid,
                  s2_token(s2_cellid(48.8, 2.3)) AS tok,
                  hex_cell_r3(48.8, 2.3) AS hx"""
    ).collect()[0]
    leaf = ck.cellid_from_latlng(np.array([48.8]), np.array([2.3]))
    assert rows["cid"] == int(ck.to_signed(leaf)[0])
    assert rows["tok"] == ck.to_token(leaf)[0]
    assert rows["hx"] is not None


def test_contains_from_sql(reg, cells):
    bad = reg.sql(
        """SELECT count(*) AS n FROM cells_t
           WHERE s2_level(cid) < 30
             AND NOT s2_contains(cid, s2_child_begin(cid, 30))"""
    ).collect()[0]["n"]
    assert bad == 0


def test_webgrid_sql_fns_match_kernel(reg):
    """geohash{p}/quadkey{z}/tile_{x,y}{z} native SQL functions ==
    numpy kernel byte-for-byte (the SQL bodies use direct bit gather,
    the kernel uses Morton spread — structurally different bit math)."""
    import pandas as pd

    from geo_spark.kernel import webgrid as W

    rng = np.random.default_rng(11)
    lat = np.degrees(np.arcsin(rng.uniform(-1, 1, 4000)))
    lng = rng.uniform(-180.0, 180.0, 4000)
    lat[:4] = [90.0, -90.0, 85.05112878, 0.0]
    lng[:4] = [180.0, -180.0, 0.0, 179.999999]
    df = reg.createDataFrame(
        pd.DataFrame({"i": np.arange(len(lat)), "lat": lat, "lng": lng})
    )
    df.createOrReplaceTempView("webgrid_pts_t")
    got = (
        reg.sql(
            """SELECT i, geohash5(lat, lng) AS g5, geohash12(lat, lng) AS g12,
                      quadkey12(lat, lng) AS qk,
                      tile_x12(lat, lng) AS tx, tile_y12(lat, lng) AS ty
               FROM webgrid_pts_t"""
        )
        .toPandas()
        .sort_values("i")
        .reset_index(drop=True)
    )
    assert (got["g5"].to_numpy() == W.geohash_encode(lat, lng, 5)).all()
    assert (got["g12"].to_numpy() == W.geohash_encode(lat, lng, 12)).all()
    x, y = W.mercator_tile(lat, lng, 12)
    assert (got["tx"].to_numpy() == x).all()
    assert (got["ty"].to_numpy() == y).all()
    assert (got["qk"].to_numpy() == W.quadkey_encode(x, y, 12)).all()


def test_webgrid_sql_fns_inline_into_codegen(reg):
    df = reg.sql("SELECT geohash7(1.0 * id, 2.0 * id) AS g FROM range(10)")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # the inlined bit math shows up as a codegen'd (*) Project over the
    # raw quantize/gather expressions — no ScalaUDF / PythonUDF wrapper
    assert "*(1)" in plan and "substring(0123456789bcdefghjkmnpqrstuvwxyz" in plan
    assert "UDF" not in plan


def test_webtext_sql_functions(spark):
    """The webcorpus Column builders, reachable from pure spark.sql —
    same Catalyst tree, so same results as the DataFrame surface."""
    from geo_spark.functions.register import register_sql

    register_sql(spark)
    row = spark.sql(
        "SELECT web_host('https://WWW.Example.CO.UK:443/p#f') AS h,"
        "       url_canon('HTTPS://WWW.Example.com:443/P?q=1#frag') AS c,"
        "       registered_domain('www.example.co.uk') AS d,"
        "       html_text('<p>a &amp; b</p><script>no()</script>') AS t,"
        "       robots_pattern('/*.tmp$') AS rp"
    ).collect()[0]
    assert row["h"] == "www.example.co.uk"
    assert row["c"] == "https://www.example.com/P?q=1"
    assert row["d"] == "example.co.uk"
    assert row["t"] == "a & b"
    assert row["rp"] == "^/.*\\.tmp$"


def test_webtext_sql_twins_match_column_builders(spark):
    """url_canon / registered_domain keep hand-written SQL bodies (the
    ColumnNode renderer emits unparseable '=(a,b)' comparisons) — this
    is the drift guard: both surfaces must agree on a sample covering
    every branch."""
    from pyspark.sql import functions as F

    from geo_spark.functions.register import register_sql
    from geo_spark.operators.webcorpus import (
        registered_domain_col,
        url_normalize_col,
    )

    register_sql(spark)
    urls = [
        "https://WWW.Ex.com:443/P?q=1#f",
        "http://A.B.co.uk:80/x",
        "HTTP://h:80",
        "not a url at all",
        "ftp://Host:21/z",
    ]
    hosts = ["www.example.co.uk", "a.b.c.com.au", "plain", "x.y", "e.org"]
    df = spark.createDataFrame(list(zip(urls, hosts)), "url string, host string")
    rows = df.select(
        url_normalize_col(F.col("url")).alias("c1"),
        F.expr("url_canon(url)").alias("c2"),
        registered_domain_col(F.col("host")).alias("d1"),
        F.expr("registered_domain(host)").alias("d2"),
    ).collect()
    for r in rows:
        assert r["c1"] == r["c2"], (r["c1"], r["c2"])
        assert r["d1"] == r["d2"], (r["d1"], r["d2"])
