"""Streaming KMV == batch KMV: drain a multi-file parquet source with
availableNow (several micro-batches, so the state-merge path runs) and
compare each tile's LAST update row against operators/sketches
kmv_distinct on the same static data."""

from __future__ import annotations

import numpy as np
import pandas as pd

from geo_spark.operators.sketches import kmv_distinct
from geo_spark.streaming.sketches import stream_tile_kmv

K = 16


def _fixture(n=5000, seed=13):
    rng = np.random.default_rng(seed)
    return pd.DataFrame(
        {
            "tile": rng.integers(0, 8, n).astype(np.int64),
            "user_id": rng.integers(0, 900, n).astype(np.int64),
        }
    )


def test_stream_matches_batch(spark, tmp_path):
    src = str(tmp_path / "kmv_events")
    pdf = _fixture()
    spark.createDataFrame(pdf).repartition(6).write.parquet(src)

    static = spark.read.parquet(src)
    want = {
        r["tile"]: (r["n_kept"], r["est_distinct"])
        for r in kmv_distinct(static, ["tile"], "user_id", k=K).collect()
    }
    assert len(want) == 8
    assert any(v[0] == K for v in want.values())  # estimator path used

    stream = (
        spark.readStream.schema(static.schema)
        .option("maxFilesPerTrigger", 2)  # force several micro-batches
        .parquet(src)
    )
    q = (
        stream_tile_kmv(stream, k=K)
        .writeStream.format("memory")
        .queryName("kmv_stream")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    rows = spark.sql("SELECT * FROM kmv_stream").toPandas()
    q.stop()
    # The sketch state only improves monotonically (n_kept never drops,
    # kth_hash never grows), so the FINAL state per tile is identifiable
    # without relying on sink row order: max n_kept, then min kth_hash.
    got = {}
    for tile, grp in rows.groupby("tile"):
        grp = grp.sort_values(["n_kept", "kth_hash"], ascending=[False, True])
        r = grp.iloc[0]
        got[int(tile)] = (int(r["n_kept"]), int(r["est_distinct"]))
    assert got == want


def _md5_mod(v, salt: str, mod: int) -> int:
    import hashlib

    return int(hashlib.md5(f"{salt}:{v}".encode()).hexdigest()[:13], 16) % mod


def test_stream_cms_matches_batch_sketch(spark, tmp_path):
    """Drained streaming CMS == the batch sketch probed at the same
    items (batch sketch itself is pinned to the python spec in
    test_sketches.py)."""
    from geo_spark.streaming.sketches import stream_cms_estimates

    depth, width = 3, 64
    rng = np.random.default_rng(31)
    pdf = pd.DataFrame(
        {
            "grp": np.where(rng.integers(0, 2, 3000) == 0, "a", "b"),
            "item": rng.zipf(1.7, 3000).astype(np.int64) % 40,
        }
    )
    probe = sorted(set(pdf["item"].tolist()))
    src = str(tmp_path / "cms_src")
    spark.createDataFrame(pdf).repartition(5).write.parquet(src)
    static = spark.read.parquet(src)

    # batch truth: python CMS replay (== cms_sketch by its own test)
    counters = {}
    for g, it in pdf.itertuples(index=False):
        for d in range(depth):
            kk = (g, d, _md5_mod(int(it), f"cms{d}", width))
            counters[kk] = counters.get(kk, 0) + 1
    want = {
        (g, it): min(
            counters.get((g, d, _md5_mod(int(it), f"cms{d}", width)), 0)
            for d in range(depth)
        )
        for g in ("a", "b")
        for it in probe
    }

    stream = (
        spark.readStream.schema(static.schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(src)
    )
    q = (
        stream_cms_estimates(stream, probe, depth=depth, width=width)
        .writeStream.format("memory")
        .queryName("cms_stream")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "cms_ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    rows = spark.sql("SELECT * FROM cms_stream").toPandas()
    q.stop()
    # counters only grow: final state per (grp, item) = max est seen
    got = (
        rows.groupby(["grp", "item"])["est_count"].max().to_dict()
    )
    assert got == want


def test_stream_cms_heavy_hitters_drained(spark, tmp_path):
    """Drained streaming heavy-hitter candidates: (1) ests equal the
    batch sketch probe reads, (2) candidates are a superset of the true
    heavies, (3) candidates + exact refine == batch cms_heavy_hitters
    output exactly."""
    from geo_spark.operators.sketches import cms_heavy_hitters
    from geo_spark.streaming.sketches import stream_cms_heavy_hitters

    depth, width, threshold = 3, 32, 60
    rng = np.random.default_rng(47)
    pdf = pd.DataFrame(
        {
            "grp": np.where(rng.integers(0, 2, 4000) == 0, "a", "b"),
            "item": rng.zipf(1.5, 4000).astype(np.int64) % 50,
        }
    )
    src = str(tmp_path / "hh_src")
    spark.createDataFrame(pdf).repartition(6).write.parquet(src)
    static = spark.read.parquet(src)

    want_exact = {
        (r["grp"], r["item"]): (r["est_count"], r["n_exact"])
        for r in cms_heavy_hitters(
            static, ["grp"], "item", threshold, depth=depth, width=width
        ).collect()
    }
    assert want_exact  # fixture produces real heavies

    # batch probe reads via the python CMS replay
    counters = {}
    for g, it in pdf.itertuples(index=False):
        for d in range(depth):
            kk = (g, d, _md5_mod(int(it), f"cms{d}", width))
            counters[kk] = counters.get(kk, 0) + 1

    def probe(g, it):
        return min(
            counters.get((g, d, _md5_mod(int(it), f"cms{d}", width)), 0)
            for d in range(depth)
        )

    stream = (
        spark.readStream.schema(static.schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(src)
    )
    q = (
        stream_cms_heavy_hitters(
            stream, threshold, depth=depth, width=width
        )
        .writeStream.format("memory")
        .queryName("hh_stream")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "hh_ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    rows = spark.sql("SELECT * FROM hh_stream").toPandas()
    q.stop()

    # final row per (grp, item) = max est (monotone)
    cand = (
        rows.groupby(["grp", "item"])["est_count"].max().to_dict()
    )
    # (1) drained ests == batch probe reads
    for (g, it), est in cand.items():
        assert est == probe(g, int(it)), (g, it)
        assert est >= threshold
    # (2) superset of true heavies
    true_counts = pdf.groupby(["grp", "item"]).size()
    heavies = {
        (g, int(it))
        for (g, it), c in true_counts.items()
        if c >= threshold
    }
    assert heavies <= set(cand)
    # (3) exact refine over candidates == batch heavy hitters
    refined = {}
    for (g, it), est in cand.items():
        n = int(true_counts.get((g, it), 0))
        if n >= threshold:
            refined[(g, int(it))] = (est, n)
    assert refined == want_exact


def test_stream_hll_matches_batch(spark, tmp_path):
    """Drained streaming HLL == batch hll_distinct row-for-row (max
    merge across micro-batches is the state path being certified)."""
    from geo_spark.operators.sketches import hll_distinct
    from geo_spark.streaming.sketches import stream_hll_distinct

    rng = np.random.default_rng(3)
    pdf = pd.DataFrame(
        {
            "grp": np.where(rng.integers(0, 2, 5000) == 0, "a", "b"),
            "v": rng.integers(0, 1200, 5000).astype(np.int64),
        }
    )
    src = str(tmp_path / "hll_src")
    spark.createDataFrame(pdf).repartition(6).write.parquet(src)
    static = spark.read.parquet(src)
    want = {
        r["grp"]: (r["n_regs"], r["est_distinct"])
        for r in hll_distinct(static, ["grp"], "v", p=6).collect()
    }

    stream = (
        spark.readStream.schema(static.schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(src)
    )
    q = (
        stream_hll_distinct(stream, p=6)
        .writeStream.format("memory")
        .queryName("hll_stream")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "hll_ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    rows = spark.sql("SELECT * FROM hll_stream").toPandas()
    q.stop()
    # state only grows: final row per group = max n_regs then max est
    got = {}
    for g, grp in rows.groupby("grp"):
        r = grp.sort_values(["n_regs", "est_distinct"]).iloc[-1]
        got[g] = (int(r["n_regs"]), int(r["est_distinct"]))
    assert got == want
