"""Binary cell-id / cell-union codecs: byte-exact against the documented
little-endian layout (version int8, count int64 LE, uint64 ids LE) and
round-trip over random unions at every level."""

import struct

import numpy as np
import pytest

from geo_spark.kernel import cellid as ck
from geo_spark.kernel.serialization import (
    ENCODING_VERSION,
    decode_cellid,
    decode_cellunion,
    encode_cellid,
    encode_cellunion,
)


def test_cellid_layout_golden():
    # token 47e670ebdae55449 is a known Paris leaf cell from the kernel
    # golden-vector suite; its encoding is the raw uint64 little-endian
    cid = int(ck.from_token(["47e670ebdae55449"])[0])
    blob = encode_cellid(cid)
    assert blob == struct.pack("<Q", cid)
    assert len(blob) == 8
    assert decode_cellid(blob) == cid


def test_cellunion_layout_golden():
    cells = [0x1000000000000000, 0x4000000000000000, 0xB000000000000000]
    blob = encode_cellunion(cells)
    want = struct.pack("<bq", ENCODING_VERSION, 3) + b"".join(
        struct.pack("<Q", c) for c in cells
    )
    assert blob == want
    assert list(decode_cellunion(blob)) == cells


def test_round_trip_random_unions():
    rng = np.random.default_rng(7)
    for _ in range(50):
        lat = np.degrees(np.arcsin(rng.uniform(-1, 1, 20)))
        lng = rng.uniform(-180, 180, 20)
        leaf = ck.cellid_from_latlng(lat, lng)
        lvl = int(rng.integers(0, 31))
        cells = np.unique(ck.parent(leaf, lvl))
        got = decode_cellunion(encode_cellunion(cells))
        assert (got == cells).all()
        assert got.dtype == np.uint64


def test_empty_union():
    blob = encode_cellunion([])
    assert len(blob) == 9
    assert len(decode_cellunion(blob)) == 0


def test_decode_rejects_bad_inputs():
    cells = [1, 2, 3]
    blob = encode_cellunion(cells)
    with pytest.raises(ValueError, match="version"):
        decode_cellunion(b"\x02" + blob[1:])
    with pytest.raises(ValueError, match="truncated"):
        decode_cellunion(blob[:-1])
    with pytest.raises(ValueError, match="too many"):
        decode_cellunion(struct.pack("<bq", ENCODING_VERSION, 2_000_000))
    with pytest.raises(ValueError, match="shorter"):
        decode_cellid(b"\x00")
