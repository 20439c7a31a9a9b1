"""WARC (Web ARChive, ISO 28500) record source: the container format
Common Crawl actually ships.  A real byte-level parser — record
boundaries come from each record's Content-Length header (the spec's
rule; splitting on blank lines corrupts bodies that contain them) —
running as a ``mapInPandas`` stage over blob rows, so a 10^12-document
crawl parses embarrassingly parallel: one task per blob group, no
cross-blob state.

The synthesizer builds spec-shaped response records from the documents
table, which gives the parser an exact RELATIONAL oracle: DuckDB never
parses bytes, it re-derives every (uri, n_bytes, body_md5) row from the
same source table — byte-identical extracted text per url is precisely
the north rule's per-row invariant.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

WARC_DATE = "2026-01-01T00:00:00Z"
URI_PREFIX = "https://example.org/"

RECORD_SCHEMA = (
    "uri string, warc_date string, content_type string, body binary"
)


def warc_record_bytes(uri: str, body: bytes, date: str = WARC_DATE) -> bytes:
    """One WARC/1.0 response record (headers + Content-Length-framed
    body + the mandatory two CRLFs)."""
    header = (
        "WARC/1.0\r\n"
        "WARC-Type: response\r\n"
        f"WARC-Target-URI: {uri}\r\n"
        f"WARC-Date: {date}\r\n"
        "Content-Type: text/plain\r\n"
        f"Content-Length: {len(body)}\r\n"
        "\r\n"
    ).encode()
    return header + body + b"\r\n\r\n"


def parse_warc_bytes(data: bytes) -> list[tuple[str, str, str, bytes]]:
    """Parse concatenated WARC records: (uri, date, content_type, body)
    per record.  Content-Length frames the body — bodies containing
    blank lines or 'WARC/1.0' text parse correctly."""
    out = []
    pos = 0
    n = len(data)
    while pos < n:
        if data[pos : pos + 5] != b"WARC/":
            raise ValueError(f"bad record start at byte {pos}")
        hdr_end = data.index(b"\r\n\r\n", pos)
        headers = {}
        for line in data[pos:hdr_end].decode().split("\r\n")[1:]:
            k, _, v = line.partition(":")
            headers[k.strip().lower()] = v.strip()
        clen = int(headers["content-length"])
        body_start = hdr_end + 4
        body = data[body_start : body_start + clen]
        if data[body_start + clen : body_start + clen + 4] != b"\r\n\r\n":
            raise ValueError("missing record terminator")
        out.append(
            (
                headers.get("warc-target-uri", ""),
                headers.get("warc-date", ""),
                headers.get("content-type", ""),
                body,
            )
        )
        pos = body_start + clen + 4
    return out


def synth_warc_blobs(
    docs: DataFrame,
    per_blob: int = 16,
    key: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """documents -> (blob_id, data binary): spec-shaped WARC blobs of
    ``per_blob`` response records each, bodies = the documents' UTF-8
    text, uri = URI_PREFIX || key.  Records within a blob are laid out
    in ascending key order (deterministic bytes per blob)."""
    src = docs.select(
        F.col(key).alias("_k"),
        (F.col(key) / per_blob).cast("long").alias("blob_id"),
        F.col(text_col).alias("_t"),
    )

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("_k")
        data = b"".join(
            warc_record_bytes(f"{URI_PREFIX}{int(k)}", t.encode())
            for k, t in zip(pdf["_k"], pdf["_t"])
        )
        return pd.DataFrame(
            {"blob_id": [int(pdf["blob_id"].iloc[0])], "data": [data]}
        )

    return src.groupBy("blob_id").applyInPandas(
        build, "blob_id long, data binary"
    )


def parse_warc(blobs: DataFrame, data_col: str = "data") -> DataFrame:
    """(uri, warc_date, content_type, body) per record, one mapInPandas
    stage over blob rows."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for blob in pdf[data_col]:
                rows.extend(parse_warc_bytes(bytes(blob)))
            yield pd.DataFrame(
                rows, columns=["uri", "warc_date", "content_type", "body"]
            )

    return blobs.select(data_col).mapInPandas(fn, RECORD_SCHEMA)
