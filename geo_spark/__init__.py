"""geo_spark — a PySpark-native S2 spatial-join + tiling engine.

Built from scratch against the semantics of akhenakh/geo (the Go port of the
S2 spherical-geometry library): cell-id Hilbert encoding, region coverings,
point-in-polygon joins, kNN via cell-ring expansion, and H3-style tiling
— all expressed as DataFrame plans with vectorized pandas/Arrow UDF kernels.
"""

__version__ = "0.1.0"
