"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship spatial pipeline on sf0.001.
``queries()`` / ``oracle_sql()`` — per-operator DataFrame builders with
DuckDB oracle SQL, compared by the driver at sf0.01 (row count + schema +
order-insensitive value hash).

Oracle strategy: geometry-kernel internals (Hilbert bit interleaving,
coverings, PIP parity) are pinned by golden-vector pytest suites
(tests/test_cellid_kernel.py etc.); the oracle-checked queries here verify
the *engine pipeline* — encode -> decode -> tile grouping -> joins/aggs —
against independent ANSI-SQL re-derivations (see
geo_spark/operators/geo_noise.py for why grouping by (face, i>>k, j>>k)
equals grouping by Parent(cell_id, level)).

Float discipline for hash-stable comparison: aggregates over doubles go
through DECIMAL casts (exact in both engines) or integer counts; the only
float ops allowed in compared columns are IEEE-deterministic (+,-,*,/,sqrt)
chains on identical inputs.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SF_DEFAULT = "/root/testdata/sf0.001"


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------


def _q_s2_tile_faceij_l8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events -> deterministic lat/lng -> S2 leaf cell (pandas UDF) ->
    decode (face,i,j) -> level-8 quadtree tile -> counts.

    Exercises the full encode+decode round trip: the oracle recomputes
    (face, i>>22, j>>22) from lat/lng with plain SQL, never touching the
    Hilbert code."""
    from geo_spark.functions.s2 import s2_cellid, s2_face_ij
    from geo_spark.operators.geo_noise import with_geo_noise

    ev = with_geo_noise(_t(spark, sf_dir, "events"), "event_id")
    enc = ev.withColumn("cell_id", s2_cellid(F.col("lat"), F.col("lng")))
    dec = enc.withColumn("fij", s2_face_ij(F.col("cell_id")))
    return (
        dec.select(
            F.col("fij.face").cast("long").alias("face"),
            F.shiftright(F.col("fij.i"), 22).alias("ti"),
            F.shiftright(F.col("fij.j"), 22).alias("tj"),
        )
        .groupBy("face", "ti", "tj")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def _oracle_s2_tile_faceij_l8() -> str:
    from geo_spark.operators.geo_noise import LAT_SQL, LNG_SQL, duckdb_face_ij_query

    lat = LAT_SQL.format(id="event_id")
    lng = LNG_SQL.format(id="event_id")
    src = f"SELECT event_id, {lat} AS lat, {lng} AS lng FROM events"
    fij = duckdb_face_ij_query(src)
    return f"""
        SELECT CAST(face AS BIGINT) AS face,
               i // 4194304 AS ti,
               j // 4194304 AS tj,
               COUNT(*) AS cnt
        FROM ({fij})
        GROUP BY 1, 2, 3
    """


def _q_tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 pricing summary; decimal-exact aggregation."""
    li = _t(spark, sf_dir, "lineitem")
    dec = lambda c: F.col(c).cast("decimal(18,4)")  # noqa: E731
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(dec("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(dec("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.sum(dec("l_extendedprice") * (F.lit(1).cast("decimal(18,4)") - dec("l_discount")))
            .cast("double")
            .alias("sum_disc_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def _oracle_tpch_q1() -> str:
    return """
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) *
                        (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4))))
                    AS DOUBLE) AS sum_disc_price,
               COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
    """


def _q_doc_stats_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language document stats (training-data text analysis shell)."""
    docs = _t(spark, sf_dir, "documents")
    return (
        docs.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("doc_cnt"),
            F.sum("n_chars").alias("total_chars"),
            F.sum(F.length("text").cast("long")).alias("total_text_len"),
            F.min("doc_id").alias("min_doc_id"),
            F.max("doc_id").alias("max_doc_id"),
        )
        .orderBy("lang")
    )


def _oracle_doc_stats_by_lang() -> str:
    return """
        SELECT lang,
               COUNT(*) AS doc_cnt,
               SUM(n_chars) AS total_chars,
               SUM(CAST(length(text) AS BIGINT)) AS total_text_len,
               MIN(doc_id) AS min_doc_id,
               MAX(doc_id) AS max_doc_id
        FROM documents
        GROUP BY lang
        ORDER BY lang
    """


def _q_orders_join_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast-join shell: orders x customer, per-segment order stats."""
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    return (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("order_cnt"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_price"),
            F.countDistinct("o_custkey").alias("active_custs"),
        )
        .orderBy("c_mktsegment")
    )


def _oracle_orders_join_agg() -> str:
    return """
        SELECT c_mktsegment,
               COUNT(*) AS order_cnt,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price,
               COUNT(DISTINCT o_custkey) AS active_custs
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY c_mktsegment
        ORDER BY c_mktsegment
    """


# ---------------------------------------------------------------------------
# contract surface
# ---------------------------------------------------------------------------


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: spatial tile-count pipeline over events at sf0.001."""
    return _q_s2_tile_faceij_l8(spark, SF_DEFAULT)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "q_s2_tile_faceij_l8": _q_s2_tile_faceij_l8,
        "q_tpch_q1": _q_tpch_q1,
        "q_doc_stats_by_lang": _q_doc_stats_by_lang,
        "q_orders_join_agg": _q_orders_join_agg,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "q_s2_tile_faceij_l8": _oracle_s2_tile_faceij_l8(),
        "q_tpch_q1": _oracle_tpch_q1(),
        "q_doc_stats_by_lang": _oracle_doc_stats_by_lang(),
        "q_orders_join_agg": _oracle_orders_join_agg(),
    }
