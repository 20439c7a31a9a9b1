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
    """(qk, day, cnt) streaming aggregate over an event stream — the
    identical quadkey + epoch-day expressions as the batch
    ``tile_daily_counts``, as a native streaming groupBy.

    With ``event_time_col`` (a timestamp column) the aggregate carries
    a watermark so Spark can retire per-(tile, day) state for days
    older than the horizon — the bounded-state mode a continuous
    deployment runs.  Without it (the availableNow drain/backfill
    mode the tests use) state is bounded by tiles x observed days,
    which is the finisher's input size anyway."""
    from geo_spark.functions.webgrid import quadkey_from_latlng

    la, ln = latlng
    qk = quadkey_from_latlng(F.col(la), F.col(ln), zoom)
    day = F.expr(f"{ts_us_col} div 86400000000")
    if event_time_col is not None:
        src = events.withWatermark(event_time_col, watermark)
    else:
        src = events
    return (
        src.select(qk.alias("qk"), day.alias("day"))
        .groupBy("qk", "day")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
