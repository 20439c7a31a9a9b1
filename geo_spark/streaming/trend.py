"""Streaming per-tile daily counts — the incremental half of the
Theil-Sen trend-band monitor (the 19th batch==stream pair).

The trend band (operators/tiling.trend_band_from_daily) is a rank
statistic over ALL pairwise day-slopes, so it cannot itself stream
incrementally — but its input can, and that input is where the data
volume lives: events are corpus-sized, the daily table is bounded by
active tiles x the monitoring horizon.  The split is therefore

  events stream -> ``stream_tile_daily_counts`` (native streaming
  groupBy(qk, day) — Spark-managed per-(tile, day) count state, ZERO
  Python in the plan, bounded by tiles x horizon days)
  -> drain / snapshot -> ``trend_band_from_daily`` as the batch
  finisher over the tiny daily table.

Drained equivalence (pinned in tests/test_streaming_trend.py): the
drained daily counts equal the batch ``tile_daily_counts`` exactly —
both run the SAME tiling expressions — and the finisher is a
deterministic function of that table, so the end-to-end band matches
the batch ``tile_theil_sen_band`` row-for-row.  Counting is
order-insensitive, so unlike the linking twins there is no intra-batch
ordering contract; late events only need to arrive inside the
watermark horizon.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from geo_spark.operators.tiling import (  # noqa: F401  (batch twins)
    tile_daily_counts,
    trend_band_from_daily,
)


def stream_tile_daily_counts(
    events: DataFrame,
    zoom: int = 4,
    ts_us_col: str = "ts_us",
    latlng: tuple[str, str] = ("lat", "lng"),
    event_time_col: str | None = None,
    watermark: str = "48 hours",
) -> DataFrame:
    """(qk, day, cnt) streaming aggregate over an event stream.

    Two modes:

    - drain/backfill (``event_time_col=None``, what the tests use):
      delegates VERBATIM to the batch :func:`tile_daily_counts` — one
      code path, so drained==batch holds by construction; state is
      bounded by tiles x observed days (the finisher's input size).
    - continuous (``event_time_col`` = a timestamp column): the day
      key DERIVES FROM the watermarked column via a 1-day event-time
      ``window``, which is what actually lets Spark retire per-
      (tile, day) state past the horizon — a watermark on a column
      the grouping keys don't contain would never evict anything (and
      append-mode sinks would reject the query outright).  The two
      modes agree when ``event_time_col`` is UTC and ``ts_us_col`` is
      its epoch-microseconds (``day`` = the same UTC epoch-day
      either way); that equivalence is pinned in
      test_streaming_trend.py."""
    from geo_spark.functions.webgrid import quadkey_from_latlng

    if event_time_col is None:
        return tile_daily_counts(events, zoom, ts_us_col, latlng)
    la, ln = latlng
    qk = quadkey_from_latlng(F.col(la), F.col(ln), zoom)
    return (
        events.withWatermark(event_time_col, watermark)
        .groupBy(
            F.window(event_time_col, "1 day").alias("_win"),
            qk.alias("qk"),
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            "qk",
            F.expr("unix_timestamp(_win.start) div 86400").alias("day"),
            "cnt",
        )
    )


def stream_source_quality_daily(
    docs: DataFrame,
    day_col: str = "day",
    source_col: str = "source",
    text_col: str = "text",
    event_time_col: str | None = None,
    watermark: str = "48 hours",
) -> DataFrame:
    """(qk, day, cnt) streaming per-(source, day) mean quality — the
    20th batch==stream pair, the incremental half of the quality-drift
    monitor (operators/text.quality_drift_by_source).

    Same two-mode contract as :func:`stream_tile_daily_counts`:

    - drain/backfill (``event_time_col=None``): delegates VERBATIM to
      the batch ``source_quality_daily`` — sum and count are
      incrementally-maintainable and the integer division is a post-
      aggregation projection, so the identical plan runs streaming.
    - continuous: the day derives from a 1-day event-time window of
      the watermarked column (real state retirement; the two modes
      agree when ``event_time_col`` is UTC and ``day_col`` is its
      epoch-day).
    """
    from geo_spark.operators.text import source_quality_daily

    if event_time_col is None:
        return source_quality_daily(docs, day_col, source_col, text_col)
    q_u = (
        f"(1000000 * (length({text_col}) - length(regexp_replace("
        f"{text_col}, '[A-Za-z]', '')))) div length({text_col})"
    )
    return (
        docs.where(F.length(F.col(text_col)) > 0)
        .withWatermark(event_time_col, watermark)
        .groupBy(
            F.window(event_time_col, "1 day").alias("_win"),
            F.col(source_col).alias("qk"),
        )
        .agg(
            F.expr(f"sum({q_u})").alias("_s"),
            F.count(F.lit(1)).alias("_c"),
        )
        .select(
            "qk",
            F.expr("unix_timestamp(_win.start) div 86400").alias("day"),
            F.expr("_s div _c").alias("cnt"),
        )
    )
