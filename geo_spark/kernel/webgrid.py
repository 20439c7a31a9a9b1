"""Web-ecosystem grid systems: geohash and Web-Mercator XYZ/quadkey tiles
(vectorized numpy, byte-exact interoperable tokens).

Unlike the H3-style hex tiling (`kernel/hexgrid.py`, engine-canonical ids),
both systems here are FULLY interoperable with external data: the encodings
are pure published math with no opaque constant tables —

* **geohash** (Niemeyer 2008, public domain): bisect lat/lng alternately
  starting with longitude, emit 5 bits per character through the base-32
  alphabet ``0123456789bcdefghjkmnpqrstuvwxyz`` (no a/i/l/o).  Verified
  against the canonical public vectors (``(57.64911, 10.40744) ->
  "u4pruydqqvj"``, ``"ezs42" -> (42.605, -5.603)``).
* **XYZ slippy tiles / Bing quadkey** (OSM wiki "Slippy map tilenames",
  Bing Maps Tile System doc): Web-Mercator tile coordinates at zoom z,
  quadkey digit_i = 2*y_bit_i + x_bit_i MSB-first (tile (3,5) @ z=3 ->
  "213", the worked example in the Bing doc).

These compensate the deliberate H3-token deferral (SURVEY §8.1 #1): a user
with externally geohash- or quadkey-indexed data can equi-join it against
this engine's tokens byte-for-byte.

Reference analog: none (akhenakh/geo is S2-only); north-star tiling surface.
All functions take/return numpy arrays and are UDF-free upstream: the Spark
surface (`functions/webgrid.py`) re-expresses the same bit math as native
Column expressions that stay inside whole-stage codegen.
"""

from __future__ import annotations

import numpy as np

GEOHASH_BASE32 = "0123456789bcdefghjkmnpqrstuvwxyz"
_B32_ARR = np.array(list(GEOHASH_BASE32))
_B32_INV = np.full(256, -1, dtype=np.int64)
for _i, _c in enumerate(GEOHASH_BASE32):
    _B32_INV[ord(_c)] = _i

_DIGIT_CP = np.array([ord(c) for c in "0123"], dtype=np.uint32)

MAX_GEOHASH_PRECISION = 12  # 60 bits, fits int64
MAX_ZOOM = 30  # x,y < 2^30; quadkey <= 30 chars; morton fits int64

# Web-Mercator latitude clamp (Bing Maps Tile System doc).
MERCATOR_MAX_LAT = 85.05112878

_EVEN = np.uint64(0x5555555555555555)
_M1 = np.uint64(0x0000FFFF0000FFFF)
_M2 = np.uint64(0x00FF00FF00FF00FF)
_M3 = np.uint64(0x0F0F0F0F0F0F0F0F)
_M4 = np.uint64(0x3333333333333333)


def _spread(x: np.ndarray) -> np.ndarray:
    """Spread the low 32 bits of each uint64 to the even bit positions
    (Morton/Z-order magic masks)."""
    x = x.astype(np.uint64)
    x = (x | (x << np.uint64(16))) & _M1
    x = (x | (x << np.uint64(8))) & _M2
    x = (x | (x << np.uint64(4))) & _M3
    x = (x | (x << np.uint64(2))) & _M4
    x = (x | (x << np.uint64(1))) & _EVEN
    return x


def _compact(x: np.ndarray) -> np.ndarray:
    """Inverse of _spread: gather even bit positions into the low 32."""
    x = x.astype(np.uint64) & _EVEN
    x = (x | (x >> np.uint64(1))) & _M4
    x = (x | (x >> np.uint64(2))) & _M3
    x = (x | (x >> np.uint64(4))) & _M2
    x = (x | (x >> np.uint64(8))) & _M1
    x = (x | (x >> np.uint64(16))) & np.uint64(0x00000000FFFFFFFF)
    return x


# ---------------------------------------------------------------------------
# geohash
# ---------------------------------------------------------------------------


def _geohash_bits(precision: int) -> tuple[int, int]:
    """(lng_bits, lat_bits) for a precision-character geohash: 5p bits
    total, alternating starting with longitude (so lng gets the extra
    bit when 5p is odd)."""
    total = 5 * precision
    lng_bits = (total + 1) // 2
    return lng_bits, total - lng_bits


def geohash_quantize(
    lat: np.ndarray, lng: np.ndarray, precision: int
) -> tuple[np.ndarray, np.ndarray]:
    """Integer cell coordinates (lng_q, lat_q) of each point at the given
    precision.  floor of the linear map onto [0, 2^bits), clamped so
    lat=90 / lng=180 land in the last cell (the bisection convention:
    upper boundary belongs to the final interval)."""
    lng_bits, lat_bits = _geohash_bits(precision)
    lat = np.asarray(lat, dtype=np.float64)
    lng = np.asarray(lng, dtype=np.float64)
    lat_q = np.floor((lat + 90.0) / 180.0 * np.float64(1 << lat_bits))
    lng_q = np.floor((lng + 180.0) / 360.0 * np.float64(1 << lng_bits))
    # NaN coords clamp silently to the origin cell (kernel-wide convention)
    lat_q = np.clip(np.nan_to_num(lat_q, nan=0.0), 0, (1 << lat_bits) - 1).astype(np.uint64)
    lng_q = np.clip(np.nan_to_num(lng_q, nan=0.0), 0, (1 << lng_bits) - 1).astype(np.uint64)
    return lng_q, lat_q


def geohash_code(lat: np.ndarray, lng: np.ndarray, precision: int) -> np.ndarray:
    """The 5*precision-bit interleaved integer code (uint64), MSB = first
    bisection bit (a longitude bit)."""
    if not 1 <= precision <= MAX_GEOHASH_PRECISION:
        raise ValueError(f"precision must be in [1,{MAX_GEOHASH_PRECISION}]")
    lng_q, lat_q = geohash_quantize(lat, lng, precision)
    if (5 * precision) % 2 == 0:
        # even total: lng bits at odd positions (MSB is position 5p-1, odd)
        return (_spread(lng_q) << np.uint64(1)) | _spread(lat_q)
    # odd total: MSB position 5p-1 is even -> lng bits at even positions
    return _spread(lng_q) | (_spread(lat_q) << np.uint64(1))


_B32_CP = np.array([ord(c) for c in GEOHASH_BASE32], dtype=np.uint32)


def _codes_to_strings(code: np.ndarray, nchars: int, bits: int, cp_table: np.ndarray) -> np.ndarray:
    """Render fixed-width strings from packed codes: one (N, nchars)
    codepoint gather + a contiguous view as U{nchars} — no per-char
    python loop over string concats."""
    shifts = np.array([bits * (nchars - 1 - k) for k in range(nchars)], dtype=np.uint64)
    idx = (code[:, None] >> shifts[None, :]) & np.uint64((1 << bits) - 1)
    cps = np.ascontiguousarray(cp_table[idx.astype(np.int64)])
    return cps.view(f"U{nchars}").reshape(code.shape)


def geohash_encode(lat: np.ndarray, lng: np.ndarray, precision: int) -> np.ndarray:
    """Base-32 geohash strings (numpy unicode array), byte-exact vs the
    published algorithm."""
    code = geohash_code(lat, lng, precision)
    return _codes_to_strings(code, precision, 5, _B32_CP)


def geohash_decode_code(hashes: np.ndarray) -> tuple[np.ndarray, int]:
    """(code uint64, precision) from equal-length geohash strings."""
    hashes = np.ascontiguousarray(np.asarray(hashes, dtype="U"))
    lens = np.char.str_len(hashes)
    precision = int(lens[0]) if lens.size else 0
    if lens.size and not (lens == precision).all():
        raise ValueError("mixed-precision geohash batch")
    if not 1 <= precision <= MAX_GEOHASH_PRECISION:
        raise ValueError("bad geohash length")
    # view as uint32 codepoints: (N, precision)
    cp = hashes.view(np.uint32).reshape(len(hashes), -1)[:, :precision]
    vals = _B32_INV[np.minimum(cp, 255)]
    if (vals < 0).any():
        raise ValueError("invalid geohash character")
    code = np.zeros(len(hashes), dtype=np.uint64)
    for k in range(precision):
        code = (code << np.uint64(5)) | vals[:, k].astype(np.uint64)
    return code, precision


def geohash_bbox(
    hashes: np.ndarray,
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """(lat_lo, lat_hi, lng_lo, lng_hi) of each geohash cell."""
    code, precision = geohash_decode_code(hashes)
    lng_bits, lat_bits = _geohash_bits(precision)
    if (5 * precision) % 2 == 0:
        lng_q = _compact(code >> np.uint64(1))
        lat_q = _compact(code)
    else:
        lng_q = _compact(code)
        lat_q = _compact(code >> np.uint64(1))
    lat_cell = 180.0 / np.float64(1 << lat_bits)
    lng_cell = 360.0 / np.float64(1 << lng_bits)
    lat_lo = lat_q.astype(np.float64) * lat_cell - 90.0
    lng_lo = lng_q.astype(np.float64) * lng_cell - 180.0
    return lat_lo, lat_lo + lat_cell, lng_lo, lng_lo + lng_cell


def geohash_decode(hashes: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Cell-center (lat, lng) of each geohash."""
    lat_lo, lat_hi, lng_lo, lng_hi = geohash_bbox(hashes)
    return (lat_lo + lat_hi) * 0.5, (lng_lo + lng_hi) * 0.5


def geohash_neighbors(hashes: np.ndarray) -> np.ndarray:
    """(N, 8) neighbor geohashes in order N, NE, E, SE, S, SW, W, NW.

    Computed by stepping the cell center one cell width/height and
    re-encoding — longitude wraps across the antimeridian; stepping past
    a pole clamps back into the polar cell (a geohash cell touching the
    pole is its own north/south neighbor, matching the common
    convention for the degenerate case)."""
    lat_lo, lat_hi, lng_lo, lng_hi = geohash_bbox(hashes)
    precision = int(np.char.str_len(np.asarray(hashes, dtype="U"))[0])
    clat = (lat_lo + lat_hi) * 0.5
    clng = (lng_lo + lng_hi) * 0.5
    dlat = lat_hi - lat_lo
    dlng = lng_hi - lng_lo
    steps = [(1, 0), (1, 1), (0, 1), (-1, 1), (-1, 0), (-1, -1), (0, -1), (1, -1)]
    cols = []
    for di, dj in steps:
        nlat = np.clip(clat + di * dlat, -90.0 + 1e-12, 90.0 - 1e-12)
        nlng = clng + dj * dlng
        nlng = ((nlng + 180.0) % 360.0) - 180.0
        cols.append(geohash_encode(nlat, nlng, precision))
    return np.stack(cols, axis=1)


def geohash_cover_rect(
    lat_lo: float,
    lat_hi: float,
    lng_lo: float,
    lng_hi: float,
    precision: int,
) -> np.ndarray:
    """All geohash cells at `precision` intersecting the closed lat/lng
    rectangle (lng_lo > lng_hi = antimeridian wrap).  Exact, not an
    approximation: geohash cells are axis-aligned lat/lng boxes, so the
    covering is the cross product of the quantized index ranges."""
    lng_bits, lat_bits = _geohash_bits(precision)

    def q(v: float, lo: float, span: float, bits: int) -> int:
        c = int(np.floor((v - lo) / span * float(1 << bits)))
        return min(max(c, 0), (1 << bits) - 1)

    la0, la1 = q(lat_lo, -90.0, 180.0, lat_bits), q(lat_hi, -90.0, 180.0, lat_bits)
    spans = (
        [(lng_lo, lng_hi)]
        if lng_lo <= lng_hi
        else [(lng_lo, 180.0), (-180.0, lng_hi)]
    )
    lng_cells = np.concatenate(
        [
            np.arange(
                q(a, -180.0, 360.0, lng_bits), q(b, -180.0, 360.0, lng_bits) + 1
            )
            for a, b in spans
        ]
    )
    lat_cells = np.arange(la0, la1 + 1)
    lng_g, lat_g = np.meshgrid(
        lng_cells.astype(np.uint64), lat_cells.astype(np.uint64)
    )
    lng_q, lat_q = lng_g.ravel(), lat_g.ravel()
    if (5 * precision) % 2 == 0:
        code = (_spread(lng_q) << np.uint64(1)) | _spread(lat_q)
    else:
        code = _spread(lng_q) | (_spread(lat_q) << np.uint64(1))
    return np.unique(_codes_to_strings(code, precision, 5, _B32_CP))


def geohash_cover_adaptive(
    lat_lo: float,
    lat_hi: float,
    lng_lo: float,
    lng_hi: float,
    max_cells: int = 64,
    max_precision: int = MAX_GEOHASH_PRECISION,
) -> tuple[int, np.ndarray]:
    """(precision, cells): the finest precision whose covering stays
    within `max_cells` (the RegionCoverer budget idea on the geohash
    grid — big rects get coarse terms, small rects fine ones)."""
    best_p, best = 1, geohash_cover_rect(lat_lo, lat_hi, lng_lo, lng_hi, 1)
    for p in range(2, max_precision + 1):
        cells = geohash_cover_rect(lat_lo, lat_hi, lng_lo, lng_hi, p)
        if len(cells) > max_cells:
            break
        best_p, best = p, cells
    return best_p, best


# ---------------------------------------------------------------------------
# Web-Mercator XYZ tiles + Bing quadkeys
# ---------------------------------------------------------------------------


def mercator_tile(
    lat: np.ndarray, lng: np.ndarray, zoom: int
) -> tuple[np.ndarray, np.ndarray]:
    """(x, y) slippy-map tile coordinates at the given zoom (int64).

    x = floor((lng+180)/360 * 2^z); y from the Web-Mercator Gudermannian
    with latitude clamped to ±85.05112878 (Bing doc).  Both clamped to
    [0, 2^z-1] so lng=180 / the clamp boundary stay inside the grid."""
    if not 0 <= zoom <= MAX_ZOOM:
        raise ValueError(f"zoom must be in [0,{MAX_ZOOM}]")
    lat = np.clip(np.asarray(lat, dtype=np.float64), -MERCATOR_MAX_LAT, MERCATOR_MAX_LAT)
    lng = np.asarray(lng, dtype=np.float64)
    n = np.float64(1 << zoom)
    x = np.floor((lng + 180.0) / 360.0 * n)
    s = np.sin(np.radians(lat))
    y = np.floor((0.5 - np.log((1.0 + s) / (1.0 - s)) / (4.0 * np.pi)) * n)
    hi = (1 << zoom) - 1
    return (
        np.clip(np.nan_to_num(x, nan=0.0), 0, hi).astype(np.int64),
        np.clip(np.nan_to_num(y, nan=0.0), 0, hi).astype(np.int64),
    )


def quadkey_code(x: np.ndarray, y: np.ndarray, zoom: int) -> np.ndarray:
    """The 2*zoom-bit interleaved quadkey integer (uint64): digit_i =
    2*y_bit + x_bit, MSB-first — i.e. Morton order with y in the high
    bit of each pair."""
    x = np.asarray(x, dtype=np.uint64)
    y = np.asarray(y, dtype=np.uint64)
    return (_spread(y) << np.uint64(1)) | _spread(x)


def quadkey_encode(x: np.ndarray, y: np.ndarray, zoom: int) -> np.ndarray:
    """Bing quadkey strings of length `zoom` for tile coordinates."""
    if not 0 <= zoom <= MAX_ZOOM:
        raise ValueError(f"zoom must be in [0,{MAX_ZOOM}]")
    if zoom == 0:
        return np.full(np.asarray(x).shape, "", dtype="U1")
    code = quadkey_code(x, y, zoom)
    return _codes_to_strings(code, zoom, 2, _DIGIT_CP)


def quadkey_decode(quadkeys: np.ndarray) -> tuple[np.ndarray, np.ndarray, int]:
    """(x, y, zoom) from equal-length quadkey strings."""
    quadkeys = np.ascontiguousarray(np.asarray(quadkeys, dtype="U"))
    lens = np.char.str_len(quadkeys)
    zoom = int(lens[0]) if lens.size else 0
    if lens.size and not (lens == zoom).all():
        raise ValueError("mixed-zoom quadkey batch")
    if not 1 <= zoom <= MAX_ZOOM:
        raise ValueError("bad quadkey length")
    cp = quadkeys.view(np.uint32).reshape(len(quadkeys), -1)[:, :zoom]
    d = cp.astype(np.int64) - ord("0")
    if ((d < 0) | (d > 3)).any():
        raise ValueError("invalid quadkey digit")
    code = np.zeros(len(quadkeys), dtype=np.uint64)
    for k in range(zoom):
        code = (code << np.uint64(2)) | d[:, k].astype(np.uint64)
    x = _compact(code).astype(np.int64)
    y = _compact(code >> np.uint64(1)).astype(np.int64)
    return x, y, zoom


def tile_bounds(
    x: np.ndarray, y: np.ndarray, zoom: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """(lat_lo, lat_hi, lng_lo, lng_hi) of XYZ tiles (Web-Mercator
    inverse; lat_hi is the tile's *northern* edge, from the smaller y)."""
    n = np.float64(1 << zoom)
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    lng_lo = x / n * 360.0 - 180.0
    lng_hi = (x + 1.0) / n * 360.0 - 180.0

    def _lat(yy: np.ndarray) -> np.ndarray:
        return np.degrees(np.arctan(np.sinh(np.pi * (1.0 - 2.0 * yy / n))))

    return _lat(y + 1.0), _lat(y), lng_lo, lng_hi


def tile_parent(x: np.ndarray, y: np.ndarray, levels: int = 1) -> tuple[np.ndarray, np.ndarray]:
    """Parent tile `levels` zooms up (quadtree: floor-divide by 2^levels)."""
    x = np.asarray(x, dtype=np.int64)
    y = np.asarray(y, dtype=np.int64)
    return x >> levels, y >> levels
