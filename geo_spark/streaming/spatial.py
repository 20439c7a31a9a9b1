"""Streaming spatial join: a pages/events stream against a static
polygon layer.

Stream-static joins need no state: the layer's covering table is a
static dimension side (broadcast by Spark), the per-batch refine is the
same shuffle-free ``mapInPandas`` kernel as batch — so the streaming
query IS the batch `spatial_join` applied incrementally, and batch and
stream results agree row-for-row (asserted in tests).

At 10^12-page backfill scale this is the continuous-crawl shape: the
layer updates rarely (re-broadcast per restart), pages arrive forever.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from geo_spark.operators.spatial_join import Layer, spatial_join


def stream_spatial_join(
    points_stream: DataFrame,
    layer: Layer,
    point_key: str,
    cell_col: str = "cell_id",
    latlng: tuple[str, str] | None = None,
    carry: tuple[str, ...] = (),
) -> DataFrame:
    """Identical call surface as the batch join; works on a streaming
    DataFrame because every stage is stream-safe: per-level key explode
    (stateless projection), equi-join against the static covering
    (stream-static inner join), mapInPandas refine (stateless)."""
    return spatial_join(
        points_stream,
        layer,
        point_key=point_key,
        cell_col=cell_col,
        latlng=latlng,
        carry=carry,
    )
