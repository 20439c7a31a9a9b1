"""Custom stateful streaming: per-host crawl sessionization.

``applyInPandasWithState`` over the pages stream grouped by host: a
session is a run of pages from one host with gaps < the session gap;
state holds (session_start, last_ts, n_pages, n_geotagged) per host and
emits the summary when the event-time timeout fires (watermark-driven).
This is the engine's custom-stateful-operator surface — the shape any
bespoke per-key streaming aggregation (crawl budgeting, per-host rate
stats, incremental tile rollups) plugs into.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "host string, session_start timestamp, session_end timestamp, "
    "n_pages long, n_geotagged long"
)
STATE_SCHEMA = "start long, last long, n long, tagged long"


def sessionize(
    pages: DataFrame,
    gap_minutes: int = 30,
    watermark: str = "2 hours",
) -> DataFrame:
    """pages(url, warc_ts, html, ...) -> closed per-host sessions."""
    hosted = pages.select(
        F.regexp_extract(F.col("url"), r"https?://([^/]+)/", 1).alias("host"),
        F.col("warc_ts"),
        F.col("html").cast("string").contains('name="geo.position"').alias("tagged"),
    ).withWatermark("warc_ts", watermark)

    gap_us = gap_minutes * 60 * 1_000_000

    def fn(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            start, last, n, tagged = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "host": [key[0]],
                    "session_start": [pd.Timestamp(start, unit="us")],
                    "session_end": [pd.Timestamp(last, unit="us")],
                    "n_pages": [n],
                    "n_geotagged": [tagged],
                }
            )
            return

        rows = pd.concat(list(pdfs)).sort_values("warc_ts")
        ts = (rows["warc_ts"].astype("int64") // 1000).to_numpy()  # ns -> us
        tg = rows["tagged"].to_numpy()
        # Split the batch itself into gap-separated runs (a single
        # micro-batch may span many sessions — availableNow backfills do).
        import numpy as np

        breaks = np.nonzero(np.diff(ts) > gap_us)[0] + 1
        runs = np.split(np.arange(len(ts)), breaks)
        closed = []
        if state.exists:
            start, last, n, tagged = state.get
        else:
            start = last = n = tagged = None
        for run in runs:
            lo, hi = int(ts[run[0]]), int(ts[run[-1]])
            cnt, tcnt = len(run), int(tg[run].sum())
            if start is None:
                start, last, n, tagged = lo, hi, cnt, tcnt
            elif lo - last > gap_us:
                closed.append((key[0], start, last, n, tagged))
                start, last, n, tagged = lo, hi, cnt, tcnt
            else:
                start = min(start, lo)
                last = max(last, hi)
                n += cnt
                tagged += tcnt
        state.update((start, last, n, tagged))
        state.setTimeoutTimestamp(last // 1000 + gap_minutes * 60 * 1000)
        if closed:
            yield pd.DataFrame(
                {
                    "host": [c[0] for c in closed],
                    "session_start": [pd.Timestamp(c[1], unit="us") for c in closed],
                    "session_end": [pd.Timestamp(c[2], unit="us") for c in closed],
                    "n_pages": [c[3] for c in closed],
                    "n_geotagged": [c[4] for c in closed],
                }
            )

    return hosted.groupBy("host").applyInPandasWithState(
        fn,
        OUTPUT_SCHEMA,
        STATE_SCHEMA,
        "append",
        GroupStateTimeout.EventTimeTimeout,
    )


def session_counts_native(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    gap_minutes: int = 30,
    watermark: str = "2 hours",
) -> DataFrame:
    """The built-in twin of :func:`sessionize` for the plain time-gap
    rule: ``F.session_window`` + watermark — Catalyst's own merging
    session state (no Python, no custom state schema).  Use this
    whenever the break rule is gap-only; the applyInPandasWithState
    operator above exists for rules the built-in can't express (the
    geotag counters here, teleport hops in operators/sessionize.py).

    Output: (key, session_start, session_end, n_events) where
    session_end is last-event-time + gap (the session_window
    convention).  In append mode a session emits once the watermark
    passes its close — a drained finite source needs one late flush
    row to advance the watermark past the last real session."""
    w = F.session_window(F.col(ts_col), f"{gap_minutes} minutes")
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.col(key_col), w)
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            key_col,
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
        )
    )
