"""Streaming spatiotemporal co-occurrence: the stream-stream twin of
operators/spacetime.spacetime_join over a live pages/events stream.

Same banding idea, different time mechanics: batch buckets time into
window-width bins and equi-joins (bucket, cell); a stream instead keeps
the raw event-time in the JOIN CONDITION as a range constraint —
Structured Streaming uses exactly that constraint plus the watermarks
to bound the join state (each side's buffer holds only rows within
watermark + window of the frontier), which IS the streaming version of
"only adjacent buckets can match".

Plan shape per micro-batch: probe-grid emission (stateless mapInArrow,
cell 9-neighborhood), then a watermarked stream-stream inner equi-join
on the cell key with the time-range condition, codegen chord2/time
refine, canonical (least, greatest) pair projection, and
dropDuplicatesWithinWatermark on the pair key (the corner-asymmetry
dedup, state likewise watermark-evicted).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
import pyarrow as pa
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from geo_spark.functions import sql as s2sql
from geo_spark.functions.s2 import s2_cellid
from geo_spark.kernel import cellid as ck
from geo_spark.kernel.regions import chord2_from_angle
from geo_spark.operators.spacetime import spacetime_level


def _xyz_cols(df: DataFrame, latlng: tuple[str, str]) -> DataFrame:
    la, ln = (F.radians(F.col(c)) for c in latlng)
    return df.select(
        "*",
        (F.cos(ln) * F.cos(la)).alias("x"),
        (F.sin(ln) * F.cos(la)).alias("y"),
        F.sin(la).alias("z"),
    )


def _emit_probe_cells(pts: DataFrame, key: str, ts_col: str) -> DataFrame:
    """(key, ts, x, y, z, cell) -> 9 probe-cell rows per input row
    (self + neighbors, per-row deduped).  Stateless — streaming-safe."""
    key_type = pts.schema[key].dataType.simpleString()
    ts_type = pts.schema[ts_col].dataType.simpleString()
    schema = (
        f"{key} {key_type}, {ts_col} {ts_type}, "
        "x double, y double, z double, pcell long"
    )

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for b in batches:
            pdf = b.to_pandas()
            if not len(pdf):
                continue
            cells = ck.from_signed(pdf["cell"].to_numpy(np.int64))
            # neighbor lookup per DISTINCT cell, gathered back by inverse
            # index — the kernel cost scales with occupied cells, not
            # stream rows (the batch operator goes further and joins a
            # distinct-cell table; a stream cannot distinct() statelessly,
            # so dedup per micro-batch here)
            uniq, inv = np.unique(cells, return_inverse=True)
            grid = np.concatenate(
                [uniq[:, None], ck.all_neighbors_same_level(uniq)], axis=1
            )
            grid.sort(axis=1)
            ukeep = np.ones(grid.shape, dtype=bool)
            ukeep[:, 1:] = grid[:, 1:] != grid[:, :-1]
            grid = grid[inv]
            keep = ukeep[inv]
            rows, cols = np.nonzero(keep)
            out = pd.DataFrame(
                {
                    key: pdf[key].to_numpy()[rows],
                    # keep timestamps at Spark's us unit: a bare numpy
                    # take yields datetime64[ns], which Spark's Arrow
                    # reader rejects
                    ts_col: pdf[ts_col]
                    .to_numpy()[rows]
                    .astype("datetime64[us]"),
                    "x": pdf["x"].to_numpy(np.float64)[rows],
                    "y": pdf["y"].to_numpy(np.float64)[rows],
                    "z": pdf["z"].to_numpy(np.float64)[rows],
                    "pcell": ck.to_signed(grid[rows, cols]),
                }
            )
            yield pa.RecordBatch.from_pandas(out, preserve_index=False)

    return pts.mapInArrow(fn, schema)


def stream_spacetime_join(
    events: DataFrame,
    radius_rad: float,
    window_s: float,
    key: str = "event_id",
    latlng: tuple[str, str] = ("lat", "lng"),
    ts_col: str = "warc_ts",
    watermark: str = "2 hours",
    level: int | None = None,
) -> DataFrame:
    """(a, b, a_ts) pairs within radius AND window over a streaming
    DataFrame with event-time ``ts_col``.  Late data beyond the
    watermark is dropped by Spark's state eviction — the documented
    streaming trade against the exact batch operator."""
    if level is None:
        level = spacetime_level(radius_rad)
    limit2 = chord2_from_angle(radius_rad)
    w_int = f"INTERVAL {int(round(window_s))} SECONDS"

    base = _xyz_cols(
        events.select(key, ts_col, *latlng), latlng
    ).withColumn(
        "cell",
        s2sql.parent(s2_cellid(F.col(latlng[0]), F.col(latlng[1])), level),
    ).select(key, ts_col, "x", "y", "z", "cell")

    # watermark AFTER the Arrow emission: a map operation would not
    # carry the event-time designation through to the join analyzer
    probes = _emit_probe_cells(base, key, ts_col).withWatermark(
        ts_col, watermark
    )
    home = base.select(
        F.col(key).alias("_bk"),
        F.col(ts_col).alias("_bts"),
        F.col("x").alias("_bx"),
        F.col("y").alias("_by"),
        F.col("z").alias("_bz"),
        F.col("cell").alias("_bcell"),
    ).withWatermark("_bts", watermark)

    chord2 = (
        (F.col("x") - F.col("_bx")) * (F.col("x") - F.col("_bx"))
        + (F.col("y") - F.col("_by")) * (F.col("y") - F.col("_by"))
        + (F.col("z") - F.col("_bz")) * (F.col("z") - F.col("_bz"))
    )
    pairs = (
        probes.join(
            home,
            F.expr(
                f"pcell = _bcell AND _bts BETWEEN {ts_col} - {w_int} "
                f"AND {ts_col} + {w_int}"
            ),
        )
        .where(F.col(key) != F.col("_bk"))
        .where(chord2 <= F.lit(limit2))
        .select(
            F.least(F.col(key), F.col("_bk")).alias("a"),
            F.greatest(F.col(key), F.col("_bk")).alias("b"),
            F.col(ts_col).alias("a_ts"),
        )
    )
    return pairs.dropDuplicatesWithinWatermark(["a", "b"])
