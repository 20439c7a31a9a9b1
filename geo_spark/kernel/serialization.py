"""Binary interop encodings for cell ids and cell unions.

Matches the reference's little-endian encode framework byte-for-byte
(s2/encode.go:25-120; the README documents the format as interoperable
with the C++ and Java implementations):

* ``CellID``: one uint64, little-endian (s2/cellid.go:484-503).
* ``CellUnion``: version int8 (=1), count int64 LE, then each id as a
  uint64 LE; decode enforces the 1,000,000-cell cap
  (s2/cellunion.go:542-588).

The engine stores cell sets as Parquet columns — these codecs exist so
external blobs produced by the reference (or its C++/Java siblings) can
be ingested/emitted at the boundary.  Vectorized: the id block is one
numpy ``<u8`` array view, not a per-id loop.
"""

from __future__ import annotations

import struct

import numpy as np

ENCODING_VERSION = 1
MAX_CELLS = 1_000_000


def encode_cellid(cellid: int) -> bytes:
    """uint64 little-endian (s2/cellid.go:484-492)."""
    return struct.pack("<Q", int(cellid) & 0xFFFFFFFFFFFFFFFF)


def decode_cellid(data: bytes) -> int:
    """Inverse of :func:`encode_cellid` (s2/cellid.go:495-503)."""
    if len(data) < 8:
        raise ValueError("cell id blob shorter than 8 bytes")
    return struct.unpack_from("<Q", data)[0]


def encode_cellunion(cells) -> bytes:
    """version + count + ids, all little-endian
    (s2/cellunion.go:550-557); the input need not be a valid
    (normalized) union, matching the reference contract."""
    arr = np.asarray(list(cells) if not isinstance(cells, np.ndarray) else cells)
    arr = arr.astype(np.uint64, copy=False)
    head = struct.pack("<bq", ENCODING_VERSION, len(arr))
    return head + arr.astype("<u8").tobytes()


def decode_cellunion(data: bytes) -> np.ndarray:
    """Inverse of :func:`encode_cellunion` (s2/cellunion.go:566-588):
    rejects unknown versions and more than 1,000,000 cells."""
    if len(data) < 9:
        raise ValueError("cell union blob shorter than its header")
    version, n = struct.unpack_from("<bq", data)
    if version != ENCODING_VERSION:
        raise ValueError(f"only version {ENCODING_VERSION} is supported")
    if n > MAX_CELLS:
        raise ValueError(f"too many cells ({n}; max is {MAX_CELLS})")
    if n < 0 or len(data) < 9 + 8 * n:
        raise ValueError("cell union blob truncated")
    return np.frombuffer(data, dtype="<u8", count=n, offset=9).astype(np.uint64)
