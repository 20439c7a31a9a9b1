"""Native session_window streaming == batch lag/sum sessionization on
a drained source (append mode; a flush row advances the watermark past
the last real session)."""

from __future__ import annotations

import datetime as dt

import numpy as np
import pandas as pd

from geo_spark.streaming.sessions import session_counts_native

GAP_MIN = 30


def _fixture(seed=31, n=800, n_keys=6):
    rng = np.random.default_rng(seed)
    base = dt.datetime(2024, 1, 1)
    rows = []
    for i in range(n):
        rows.append(
            (
                f"h{rng.integers(0, n_keys)}",
                base + dt.timedelta(seconds=int(rng.integers(0, 6 * 86400))),
            )
        )
    rows.append(("_flush", base + dt.timedelta(days=30)))
    return pd.DataFrame(rows, columns=["host", "ts"])


def _batch_sessions(df):
    gap = dt.timedelta(minutes=GAP_MIN)
    out = set()
    for host, grp in df[df.host != "_flush"].groupby("host"):
        ts = sorted(grp["ts"])
        start, last, n = ts[0], ts[0], 1
        for t in ts[1:]:
            if t - last >= gap:
                out.add((host, start, last + gap, n))
                start, n = t, 0
            last = t
            n += 1
        out.add((host, start, last + gap, n))
    return out


def test_native_sessions_match_batch(spark, tmp_path):
    # in-order chunks (pinned mtimes): with a 0-second watermark delay,
    # cross-batch disorder would be DROPPED as late data — the ordered
    # source matches the stated contract (delay must cover disorder)
    from tests.test_streaming_asof import _write_ordered_chunks

    pdf = _fixture()
    # pyarrow writes pandas ns-datetimes as TIMESTAMP(NANOS), which the
    # Spark parquet reader rejects — force micros
    pdf["ts"] = pdf["ts"].astype("datetime64[us]").dt.tz_localize("UTC")
    src = str(tmp_path / "sess_src")
    _write_ordered_chunks(pdf.sort_values("ts"), src, n_chunks=4)
    static = spark.read.parquet(src)
    stream = (
        spark.readStream.schema(static.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        session_counts_native(stream, "host", "ts", GAP_MIN, "0 seconds")
        .writeStream.format("memory")
        .queryName("sess_native")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    rows = spark.sql(
        "SELECT * FROM sess_native WHERE host <> '_flush'"
    ).toPandas()
    q.stop()
    got = {
        (
            r["host"],
            r["session_start"].to_pydatetime(),
            r["session_end"].to_pydatetime(),
            int(r["n_events"]),
        )
        for _, r in rows.iterrows()
    }
    assert got == _batch_sessions(pdf.assign(ts=pdf['ts'].dt.tz_localize(None)))
