"""Integration tests: pages synthesis -> geotag extraction -> encode -> tiles.

Pins the engine's per-row invariants (BASELINE.json input_hint):
byte-identical text per url, deterministic partition-independent synthesis,
and agreement between the fused Arrow operator and the JVM-regex + UDF path.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from geo_spark.kernel import cellid as ck
from geo_spark.operators.tiling import tile_counts, with_cell_id, with_tiles
from geo_spark.sources.extract import extract_encode
from geo_spark.sources.geotags import with_geotags
from geo_spark.sources.pages import page_coords, synth_pages

N = 5000


@pytest.fixture(scope="module")
def pages(spark):
    return synth_pages(spark, N, partitions=4).cache()


def test_synth_partition_independent(spark, pages):
    a = pages.orderBy("url").toPandas()
    b = synth_pages(spark, N, partitions=13).orderBy("url").toPandas()
    assert a.equals(b)


def test_text_byte_identical_passthrough(spark, pages):
    # text must survive the pipeline byte-identically per url
    out = extract_encode(pages, keep=("url", "text")).orderBy("url").toPandas()
    src = pages.select("url", "text").orderBy("url").toPandas()
    merged = src.merge(out, on="url", suffixes=("_src", "_out"))
    assert (merged["text_src"] == merged["text_out"]).all()


def test_geotags_match_generator(spark, pages):
    sample = with_geotags(pages).select("url", "lat", "lng").orderBy("url").toPandas()
    idx = sample["url"].str[-12:].astype(np.uint64).to_numpy()
    glat, glng = page_coords(idx)
    # html rounds to 1e-7 degrees
    assert np.abs(sample["lat"].to_numpy() - glat).max() < 1e-6
    assert np.abs(sample["lng"].to_numpy() - glng).max() < 1e-6


def test_fused_equals_jvm_path(spark, pages):
    fused = extract_encode(pages).select("url", "cell_id").orderBy("url").toPandas()
    jvm = (
        with_cell_id(with_geotags(pages))
        .where(F.col("cell_id").isNotNull())
        .select("url", "cell_id")
        .orderBy("url")
        .toPandas()
    )
    assert fused.equals(jvm)


def test_cellid_matches_kernel(spark, pages):
    out = extract_encode(pages).select("lat", "lng", "cell_id").toPandas()
    want = ck.to_signed(
        ck.cellid_from_latlng(out["lat"].to_numpy(), out["lng"].to_numpy())
    )
    assert (out["cell_id"].to_numpy() == want).all()


def test_tile_counts_sum_and_levels(spark, pages):
    enc = extract_encode(pages)
    tc = tile_counts(enc, 10).toPandas()
    assert tc["cnt"].sum() == enc.count()
    u = ck.from_signed(tc["tile"].to_numpy())
    assert (ck.level(u) == 10).all()
    # Hilbert-sorted output
    assert (np.diff(tc["tile"].to_numpy()) > 0).all()


def test_with_tiles_native_parent(spark, pages):
    enc = with_tiles(extract_encode(pages), levels=(10, 16))
    df = enc.select("cell_id", "tile_l10", "tile_l16").limit(500).toPandas()
    u = ck.from_signed(df["cell_id"].to_numpy())
    assert (ck.to_signed(ck.parent(u, 10)) == df["tile_l10"].to_numpy()).all()
    assert (ck.to_signed(ck.parent(u, 16)) == df["tile_l16"].to_numpy()).all()


def test_untagged_pages_dropped_and_kept(spark):
    rows = [
        ("u1", bytearray(b'<html><head><meta name="geo.position" content="10.5;20.25"></head></html>')),
        ("u2", bytearray(b"<html><head>no tags</head></html>")),
        ("u3", bytearray(b'<html><head><meta name="ICBM" content="-45.25, 170.125"></head></html>')),
        ("u4", bytearray(b'<html><head><meta name="geo.position" content="95.0;20.0"></head></html>')),
    ]
    df = spark.createDataFrame(rows, "url string, html binary")
    kept = extract_encode(df, drop_untagged=True).orderBy("url").toPandas()
    assert list(kept["url"]) == ["u1", "u3"]
    assert kept["lat"].tolist() == [10.5, -45.25]
    assert kept["lng"].tolist() == [20.25, 170.125]
    all_rows = extract_encode(df, drop_untagged=False).orderBy("url").toPandas()
    assert len(all_rows) == 4
    assert all_rows["cell_id"].isna().tolist() == [False, True, False, True]
