"""Fused geotag-extract + S2-encode operator (single Arrow pass).

Why fused: a JVM-regex projection feeding a pandas UDF looks clean but plans
badly — Catalyst's CollapseProject treats struct-field extraction as
always-inlinable, so the regex tree gets duplicated into the Python-UDF
argument projection (evaluated without codegen subexpression elimination),
re-running the regex several times per row.  Fusing the whole
html -> (lat,lng) -> cell_id chain into one ``mapInArrow`` stage makes it a
single vectorized pass: RE2 C++ regex (pyarrow.compute.extract_regex), numpy
Hilbert encode, Arrow zero-copy in/out.  One Python hop total — the same
shape a 1000-executor cluster wants: pipeline-parallel, no shuffle, column-
pruned at the scan (only html + passthrough columns are read).

Semantics match geo_spark.sources.geotags.with_geotags:
geo.position takes precedence, ICBM is the fallback, out-of-range
coordinates -> null, text passthrough untouched.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from pyspark.sql import DataFrame

from geo_spark.kernel import cellid as ck

GEO_POSITION_RE = (
    r'<meta\s+name="geo\.position"\s+content="'
    r'(?P<lat>-?\d+(?:\.\d+)?)\s*;\s*(?P<lng>-?\d+(?:\.\d+)?)"'
)
ICBM_RE = (
    r'<meta\s+name="ICBM"\s+content="'
    r'(?P<lat>-?\d+(?:\.\d+)?)\s*,\s*(?P<lng>-?\d+(?:\.\d+)?)"'
)


def _extract_coords(html: pa.Array) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(lat, lng, valid-mask) numpy arrays from an Arrow string array."""
    gp = pc.extract_regex(html, GEO_POSITION_RE)
    need_fallback = pc.is_null(gp)
    if pc.any(need_fallback).as_py():
        ic = pc.extract_regex(html, ICBM_RE)
        gp = pc.if_else(need_fallback, ic, gp)

    lat = pc.cast(pc.struct_field(gp, "lat"), pa.float64()).to_numpy(
        zero_copy_only=False
    )
    lng = pc.cast(pc.struct_field(gp, "lng"), pa.float64()).to_numpy(
        zero_copy_only=False
    )
    ok = (
        np.isfinite(lat)
        & np.isfinite(lng)
        & (lat >= -90.0)
        & (lat <= 90.0)
        & (lng >= -180.0)
        & (lng <= 180.0)
    )
    return lat, lng, ok


def extract_encode(
    pages: DataFrame,
    keep: Sequence[str] = ("url",),
    html_col: str = "html",
    drop_untagged: bool = True,
) -> DataFrame:
    """pages -> (keep..., lat, lng, cell_id) in one Arrow pass.

    cell_id is the biased-int64 level-30 leaf (null when no/invalid geotag
    and drop_untagged=False; rows dropped entirely when True).
    """
    src = pages.select(*keep, html_col)
    keep = list(keep)

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for b in batches:
            html = pc.cast(b.column(html_col), pa.string())
            lat, lng, ok = _extract_coords(html)
            cell = ck.to_signed(
                ck.cellid_from_latlng(np.where(ok, lat, 0.0), np.where(ok, lng, 0.0))
            )
            arrays = [b.column(k) for k in keep]
            if drop_untagged:
                idx = np.nonzero(ok)[0]
                arrays = [a.take(pa.array(idx)) for a in arrays]
                out = arrays + [
                    pa.array(lat[idx]),
                    pa.array(lng[idx]),
                    pa.array(cell[idx]),
                ]
            else:
                mask = ~ok
                out = arrays + [
                    pa.array(np.where(ok, lat, np.nan), mask=mask),
                    pa.array(np.where(ok, lng, np.nan), mask=mask),
                    pa.array(cell, mask=mask),
                ]
            yield pa.RecordBatch.from_arrays(
                out, names=keep + ["lat", "lng", "cell_id"]
            )

    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in src.schema.fields
        if f.name in keep
    )
    schema = (schema + ", " if schema else "") + "lat double, lng double, cell_id long"
    return src.mapInArrow(fn, schema)
