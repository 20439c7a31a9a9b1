"""WARC source: byte-level parser round trip (incl. adversarial bodies
containing blank lines and 'WARC/1.0' text) and the Spark blob
pipeline."""

from __future__ import annotations

from geo_spark.sources.warc import (
    parse_warc,
    parse_warc_bytes,
    synth_warc_blobs,
    warc_record_bytes,
)


def test_parse_round_trip_adversarial_bodies():
    bodies = [
        b"plain",
        b"",  # empty body
        b"line1\r\n\r\nline2",  # blank line inside body
        b"WARC/1.0\r\nContent-Length: 3\r\n\r\nfoo",  # fake nested record
        bytes(range(256)),  # arbitrary binary
    ]
    blob = b"".join(
        warc_record_bytes(f"https://x/{i}", b) for i, b in enumerate(bodies)
    )
    recs = parse_warc_bytes(blob)
    assert [r[3] for r in recs] == bodies
    assert [r[0] for r in recs] == [f"https://x/{i}" for i in range(5)]
    assert all(r[2] == "text/plain" for r in recs)


def test_parse_rejects_torn_record():
    import pytest

    good = warc_record_bytes("https://x/0", b"abc")
    with pytest.raises(ValueError):
        parse_warc_bytes(good[:-2])  # terminator torn off
    with pytest.raises(ValueError):
        parse_warc_bytes(b"HTTP/1.1 200 OK\r\n\r\n")


def test_spark_blob_pipeline_round_trip(spark):
    docs = spark.createDataFrame(
        [(i, f"doc {i} body é中") for i in range(40)],
        "doc_id long, text string",
    )
    blobs = synth_warc_blobs(docs, per_blob=16)
    assert blobs.count() == 3  # 40 docs / 16
    recs = parse_warc(blobs)
    got = {
        r["uri"]: bytes(r["body"]).decode() for r in recs.collect()
    }
    assert got == {
        f"https://example.org/{i}": f"doc {i} body é中"
        for i in range(40)
    }
