"""Deterministic Common-Crawl-style ``pages`` table (FIXTURES.md §1).

Schema per BASELINE.json input_hint:
    url string, warc_ts timestamp, html binary, text string, lang string

Synthesis is *partition-independent*: every column derives from the row index
``i`` through a counter-based splitmix64 hash, so the same row id produces the
same page regardless of parallelism or partitioning — the property that makes
the two-cluster-size scaling benchmark compare identical inputs, and that a
1000-executor cluster needs for deterministic regeneration of any partition.

Geotag skew (the north rule's hot-city skew): 80% of rows cluster around 20
hot cities (Gaussian sigma=0.05 deg via Box-Muller), 20% uniform on the
sphere.  Dense urban S2 cells are therefore Zipf-hot, exercising the salted
join path.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

SEED = 42

# 20 fixed hot-city centers (lat, lng) — deterministic fixture data.
HOT_CITIES = np.array(
    [
        (40.7128, -74.0060),  # New York
        (51.5074, -0.1278),  # London
        (35.6762, 139.6503),  # Tokyo
        (48.8566, 2.3522),  # Paris
        (-23.5505, -46.6333),  # Sao Paulo
        (19.4326, -99.1332),  # Mexico City
        (28.6139, 77.2090),  # Delhi
        (31.2304, 121.4737),  # Shanghai
        (-33.8688, 151.2093),  # Sydney
        (55.7558, 37.6173),  # Moscow
        (30.0444, 31.2357),  # Cairo
        (-1.2921, 36.8219),  # Nairobi
        (37.7749, -122.4194),  # San Francisco
        (52.5200, 13.4050),  # Berlin
        (1.3521, 103.8198),  # Singapore
        (34.0522, -118.2437),  # Los Angeles
        (41.0082, 28.9784),  # Istanbul
        (-34.6037, -58.3816),  # Buenos Aires
        (6.5244, 3.3792),  # Lagos
        (13.7563, 100.5018),  # Bangkok
    ],
    dtype=np.float64,
)

LANGS = np.array(["en", "de", "fr", "es", "pt", "zh"])

_GOLDEN = np.uint64(0x9E3779B97F4A7C15)


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Counter-based splitmix64 finalizer (public-domain construction)."""
    z = x + _GOLDEN
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


_SEED_MIX = np.uint64((SEED * 0x9E3779B97F4A7C15) % (1 << 64))


def _uniform(i: np.ndarray, stream: int) -> np.ndarray:
    """Deterministic U[0,1) for row i on a numbered stream."""
    with np.errstate(over="ignore"):
        h = _splitmix64(i * np.uint64(7919) + np.uint64(stream) + _SEED_MIX)
    return (h >> np.uint64(11)).astype(np.float64) / float(1 << 53)


def page_coords(i: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic (lat, lng) for row indices; 80% hot-city Gaussian,
    20% uniform-on-sphere."""
    i = np.asarray(i, dtype=np.uint64)
    u_mode = _uniform(i, 0)
    u_city = _uniform(i, 1)
    # Box-Muller from two uniforms (clip u away from 0)
    g_u1 = np.maximum(_uniform(i, 2), 1e-12)
    g_u2 = _uniform(i, 3)
    r = np.sqrt(-2.0 * np.log(g_u1))
    g1 = r * np.cos(2 * np.pi * g_u2)
    g2 = r * np.sin(2 * np.pi * g_u2)

    city = (u_city * len(HOT_CITIES)).astype(np.int64) % len(HOT_CITIES)
    hot_lat = HOT_CITIES[city, 0] + 0.05 * g1
    hot_lng = HOT_CITIES[city, 1] + 0.05 * g2

    u_lat = _uniform(i, 4)
    u_lng = _uniform(i, 5)
    uni_lat = np.degrees(np.arcsin(2.0 * u_lat - 1.0))
    uni_lng = 360.0 * u_lng - 180.0

    hot = u_mode < 0.8
    lat = np.clip(np.where(hot, hot_lat, uni_lat), -90.0, 90.0)
    lng = np.where(hot, hot_lng, uni_lng)
    lng = ((lng + 180.0) % 360.0) - 180.0
    return lat, lng


def _cat(*parts: np.ndarray | str) -> np.ndarray:
    out = None
    for p in parts:
        p = np.asarray(p, dtype="U") if isinstance(p, str) else p
        out = p if out is None else np.char.add(out, p)
    return out


def _render_batch(idx: np.ndarray) -> pd.DataFrame:
    lat, lng = page_coords(idx.astype(np.uint64))
    urls = np.char.add("https://example.org/", np.char.zfill(idx.astype("U12"), 12))
    ts = pd.Timestamp("2026-01-01T00:00:00") + pd.to_timedelta(idx, unit="s")
    lat_s = np.char.mod("%.7f", lat)
    lng_s = np.char.mod("%.7f", lng)
    text = _cat("page ", idx.astype("U12"), " at ", lat_s, ",", lng_s)
    html_str = _cat(
        '<html><head><meta name="geo.position" content="',
        lat_s,
        ";",
        lng_s,
        '"><meta name="ICBM" content="',
        lat_s,
        ", ",
        lng_s,
        '"></head><body>',
        text,
        "</body></html>",
    )
    html = np.char.encode(html_str, "utf-8")
    lang = LANGS[idx % len(LANGS)]
    return pd.DataFrame(
        {
            "url": urls,
            "warc_ts": ts,
            "html": pd.Series(list(html), dtype=object),
            "text": text,
            "lang": lang,
        }
    )


def synth_pages(spark: SparkSession, n: int, partitions: int | None = None) -> DataFrame:
    """Distributed deterministic pages table of n rows."""
    rng = spark.range(0, n, 1, numPartitions=partitions) if partitions else spark.range(n)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            yield _render_batch(b["id"].to_numpy())

    return rng.mapInPandas(
        gen,
        "url string, warc_ts timestamp, html binary, text string, lang string",
    )
