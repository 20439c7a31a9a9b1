"""quality_drift_by_source: per-source quality trend monitor."""


def test_quality_drift_by_source(spark):
    """Planted drift differential: a degrading source (alpha ratio
    falls daily), an improving one, a flat one — operator vs a pure
    python replay of the exact spec (alpha-micro ratio, per-day exact
    mean, MK decision, Sen milli-slope median)."""
    import math
    from collections import Counter

    from geo_spark.operators.text import quality_drift_by_source

    def make_text(n_alpha, n_other):
        return "a" * n_alpha + "1" * n_other

    rows = []
    fixtures = {
        "rotting": [(d, 80 - 7 * d, 20 + 7 * d) for d in range(8)],
        "healing": [(d, 40 + 5 * d, 60 - 5 * d) for d in range(8)],
        "steady": [(d, 50, 50) for d in range(8)],
        "oneday": [(3, 10, 5)],
    }
    i = 0
    for src_name, specs in fixtures.items():
        for d, na, no in specs:
            # two docs per (source, day) with slightly different mixes
            for k in (0, 1):
                rows.append((i, make_text(na + k, no), src_name, d))
                i += 1
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, source string, day long"
    )
    got = {
        r["source"]: (
            r["n_days"],
            r["s_stat"],
            r["c_alpha"],
            r["trend"],
            r["slope_mu"],
            r["degrading"],
        )
        for r in quality_drift_by_source(docs).collect()
    }
    assert set(got) == {"rotting", "healing", "steady"}

    def q_u(na, no):
        n = na + no
        return (1000000 * na) // n

    want = {}
    for src_name, specs in fixtures.items():
        daily = {}
        for d, na, no in specs:
            qs = [q_u(na + k, no) for k in (0, 1)]
            daily[d] = sum(qs) // len(qs)
        if len(daily) < 2:
            continue
        ds = sorted(daily)
        n = len(ds)
        s = sum(
            (daily[ds[j]] > daily[ds[i]]) - (daily[ds[j]] < daily[ds[i]])
            for i in range(n)
            for j in range(i + 1, n)
        )
        tie = sum(
            t * (t - 1) * (2 * t + 5)
            for t in Counter(daily.values()).values()
        )
        w = n * (n - 1) * (2 * n + 5) - tie
        c = math.isqrt(18 * 1960 * 1960 * w) // 18 // 1000
        trend = (
            1
            if s > 0 and s - 1 > c
            else (-1 if s < 0 and -s - 1 > c else 0)
        )
        k_ = 10**9
        slopes = sorted(
            ((daily[ds[j]] - daily[ds[i]]) * 1000 + k_ * (ds[j] - ds[i]))
            // (ds[j] - ds[i])
            - k_
            for i in range(n)
            for j in range(i + 1, n)
        )
        med = slopes[(len(slopes) + 1) // 2 - 1]
        want[src_name] = (n, s, c, trend, med, trend == -1)
    assert got == want
    assert got["rotting"][5] is True and got["rotting"][3] == -1
    assert got["healing"][3] == 1 and got["steady"][3] == 0


def test_quality_drift_plan_is_native(spark):
    from geo_spark.operators.text import quality_drift_by_source

    docs = spark.createDataFrame(
        [(1, "abc1", "s", 0), (2, "ab11", "s", 1)],
        "doc_id long, text string, source string, day long",
    )
    plan = (
        quality_drift_by_source(docs)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan


def _doc_rows():
    rows = []
    i = 0
    for d in range(5):
        for s, na, no in [
            ("alpha", 60 - 9 * d, 40 + 9 * d),
            ("beta", 30 + 6 * d, 70 - 6 * d),
        ]:
            for k in (0, 1, 2):
                rows.append((i, "a" * (na + k) + "1" * no, s, d))
                i += 1
    return rows


def test_stream_quality_daily_drained_equals_batch(spark, tmp_path):
    """20th batch==stream pair: drained per-(source, day) mean quality
    equals the batch builder exactly (same plan, by construction)."""
    import pandas as pd

    from geo_spark.operators.text import source_quality_daily
    from geo_spark.streaming.trend import stream_source_quality_daily

    schema = "doc_id long, text string, source string, day long"
    rows = _doc_rows()
    src = str(tmp_path / "docs")
    spark.createDataFrame(rows[:14], schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(src)
    spark.createDataFrame(rows[14:], schema).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    static = spark.read.parquet(src)
    stream = (
        spark.readStream.schema(static.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        stream_source_quality_daily(stream)
        .writeStream.format("memory")
        .queryName("qd_stream")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "qd_ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = (
        spark.sql("SELECT * FROM qd_stream")
        .toPandas()
        .sort_values(["qk", "day"])
        .reset_index(drop=True)
    )
    q.stop()
    want = (
        source_quality_daily(static)
        .toPandas()
        .sort_values(["qk", "day"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got.astype({"day": "int64", "cnt": "int64"}),
        want.astype({"day": "int64", "cnt": "int64"}),
    )


def test_stream_quality_daily_watermarked_append(spark, tmp_path):
    """Continuous mode: windowed watermark aggregation accepted by an
    append sink; flushed windows equal the batch builder on the days
    the watermark has passed."""
    import pandas as pd
    import pyspark.sql.functions as F

    from geo_spark.operators.text import source_quality_daily
    from geo_spark.streaming.trend import stream_source_quality_daily

    DAY_US = 86_400_000_000
    schema = "doc_id long, text string, source string, day long"
    rows = _doc_rows()
    src = str(tmp_path / "wm_docs")
    spark.createDataFrame(rows, schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(src)
    static = spark.read.parquet(src)
    stream = (
        spark.readStream.schema(static.schema)
        .parquet(src)
        .withColumn(
            "ev_time",
            F.expr(f"timestamp_micros(day * {DAY_US} + doc_id)"),
        )
    )
    out = stream_source_quality_daily(
        stream, event_time_col="ev_time", watermark="1 hour"
    )
    q = (
        out.writeStream.format("memory")
        .queryName("qd_wm")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "qd_wm_ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = spark.sql("SELECT * FROM qd_wm").toPandas()
    q.stop()
    max_ev = max(d * DAY_US + i for i, _, _, d in rows)
    wm = max_ev - 3_600_000_000
    want = source_quality_daily(static).toPandas()
    want = want[(want["day"] + 1) * DAY_US <= wm]
    got = got.sort_values(["qk", "day"]).reset_index(drop=True)
    want = want.sort_values(["qk", "day"]).reset_index(drop=True)
    assert len(want) > 0
    pd.testing.assert_frame_equal(
        got.astype({"day": "int64", "cnt": "int64"}),
        want.astype({"day": "int64", "cnt": "int64"}),
    )
