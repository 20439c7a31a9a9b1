"""Pandas UDFs for the H3-style hex tiling (kernel/hexgrid.py)."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql import types as T

from geo_spark.kernel import hexgrid as H


def hex_cell_udf(res: int):
    """Factory: long hex id from degrees lat/lng at a fixed resolution."""

    @pandas_udf(T.LongType())
    def hex_cell(lat: pd.Series, lng: pd.Series) -> pd.Series:
        la = lat.to_numpy(dtype=np.float64, na_value=np.nan)
        ln = lng.to_numpy(dtype=np.float64, na_value=np.nan)
        ok = np.isfinite(la) & np.isfinite(ln)
        ids = H.latlng_to_hex(np.where(ok, la, 0.0), np.where(ok, ln, 0.0), res)
        return pd.Series(np.where(ok, ids, 0)).mask(~ok)

    return hex_cell


@pandas_udf(
    T.StructType(
        [T.StructField("lat", T.DoubleType()), T.StructField("lng", T.DoubleType())]
    )
)
def hex_center_udf(h: pd.Series) -> pd.DataFrame:
    lat, lng = H.hex_center(h.to_numpy(dtype=np.int64, na_value=0))
    return pd.DataFrame({"lat": lat, "lng": lng})
