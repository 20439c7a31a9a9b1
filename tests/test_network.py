"""trail_network_edges / network_components: traces -> junction graph."""

import numpy as np
from pyspark.sql import functions as F

from geo_spark.operators.network import (
    network_components,
    site_key_col,
    snap_site_cols,
    trail_network_edges,
)


def _key(ilat: int, ilng: int, e: int = 0) -> int:
    s = 10**e
    return (ilat + 90 * s) * (360 * s + 1) + (ilng + 180 * s)


def _rows(user, pts):
    return [(user, i, float(la), float(ln)) for i, (la, ln) in enumerate(pts)]


def _trails(spark):
    rows = (
        # user 1: (0,0) -> (1,0) -> (1,1)
        _rows(1, [(0.1, 0.1), (0.1, 1.1), (1.1, 1.1)])
        # user 2 shares the (1,1)->(0,1) edge (reverse direction)
        + _rows(2, [(1.2, 1.2), (0.2, 1.2), (0.2, 2.2)])
        # user 3: detached two-site component
        + _rows(3, [(10.2, 10.3), (11.2, 10.3)])
        # user 4: both points snap to one site -> no edge at all
        + _rows(4, [(5.1, 5.2), (5.2, 5.3)])
    )
    return spark.createDataFrame(
        rows, "user_id long, ts long, lat double, lng double"
    )


def test_edges_weights_and_degenerate_drop(spark):
    edges = {
        (r["u"], r["v"]): r["n_segments"]
        for r in trail_network_edges(
            _trails(spark), order_cols=("ts",)
        ).collect()
    }
    k = _key
    want = {
        tuple(sorted((k(0, 0), k(0, 1)))): 1,
        tuple(sorted((k(0, 1), k(1, 1)))): 2,  # shared by users 1+2
        tuple(sorted((k(0, 1), k(0, 2)))): 1,
        tuple(sorted((k(10, 10), k(11, 10)))): 1,
    }
    assert edges == want


def test_components_rollup(spark):
    comps = {
        r["rep"]: (r["n_junctions"], r["n_edges"], r["n_segments"])
        for r in network_components(
            trail_network_edges(_trails(spark), order_cols=("ts",))
        ).collect()
    }
    k = _key
    main_rep = min(k(0, 0), k(0, 1), k(1, 1), k(0, 2))
    iso_rep = min(k(10, 10), k(11, 10))
    assert comps == {main_rep: (4, 3, 4), iso_rep: (2, 1, 1)}


def test_snap_matches_kernel(spark):
    from geo_spark.kernel.builder import snap_latlng_e

    rng = np.random.default_rng(7)
    lat = np.concatenate(
        [rng.uniform(-90, 90, 500), np.array([0.5, -0.5, 2.5, -2.5, 89.5])]
    )
    lng = np.concatenate(
        [rng.uniform(-180, 180, 500), np.array([0.5, -0.5, 179.5, -179.5, 0.0])]
    )
    for e in (0, 3):
        df = spark.createDataFrame(
            [(float(a), float(b)) for a, b in zip(lat, lng)],
            "lat double, lng double",
        )
        ila, iln = snap_site_cols(F.col("lat"), F.col("lng"), e)
        got = (
            df.select(ila.alias("a"), iln.alias("b"))
            .toPandas()
            .to_numpy(np.int64)
        )
        ka, kb = snap_latlng_e(lat, lng, e)
        assert (got[:, 0] == ka).all() and (got[:, 1] == kb).all()


def test_site_key_is_injective():
    s = 1
    seen = set()
    for ilat in range(-90, 91):
        for ilng in range(-180, 181):
            k = (ilat + 90 * s) * (360 * s + 1) + (ilng + 180 * s)
            assert k not in seen
            seen.add(k)
    assert min(seen) == 0


def test_site_key_fits_int64_at_boundary_exponent():
    """ADVICE r4 (medium): at the boundary exponent MAX_EXP the extreme
    corner keys must stay within int64 (non-ANSI Spark would wrap
    silently, colliding sites); one exponent higher must be rejected
    by both snap_site_cols and site_key_col."""
    import pytest

    from geo_spark.operators.network import MAX_EXP, site_key_col

    s = 10**MAX_EXP
    corners = [
        (ilat, ilng)
        for ilat in (-90 * s, 90 * s)
        for ilng in (-180 * s, 180 * s)
    ]
    keys = [(a + 90 * s) * (360 * s + 1) + (b + 180 * s) for a, b in corners]
    assert all(0 <= k <= 2**63 - 1 for k in keys)
    assert len(set(keys)) == len(keys)
    # e = MAX_EXP + 1 overflows int64: the guard must refuse it
    s2 = 10 ** (MAX_EXP + 1)
    overflow = (90 * s2 + 90 * s2) * (360 * s2 + 1) + 360 * s2
    assert overflow > 2**63 - 1
    with pytest.raises(ValueError):
        snap_site_cols(F.col("lat"), F.col("lng"), MAX_EXP + 1)
    with pytest.raises(ValueError):
        site_key_col(F.col("a"), F.col("b"), MAX_EXP + 1)


def test_site_key_boundary_exponent_injective_in_spark(spark):
    """End-to-end injectivity at e=MAX_EXP inside Spark's long
    arithmetic: distinct extreme sites must get distinct keys and
    round-trip exactly (no silent wrap)."""
    from geo_spark.operators.network import MAX_EXP, site_key_col

    s = 10**MAX_EXP
    pts = [
        (-90.0, -180.0),
        (-90.0, 180.0),
        (90.0, -180.0),
        (90.0, 180.0),
        (89.9999999, 179.9999999),
        (0.0, 0.0),
    ]
    df = spark.createDataFrame(pts, "lat double, lng double")
    ila, iln = snap_site_cols(F.col("lat"), F.col("lng"), MAX_EXP)
    got = sorted(
        r[0]
        for r in df.select(
            site_key_col(ila, iln, MAX_EXP).alias("k")
        ).collect()
    )
    expect = sorted(
        (round(a * s) + 90 * s) * (360 * s + 1) + (round(b * s) + 180 * s)
        for a, b in pts
    )
    assert got == expect
    assert len(set(got)) == len(pts)


def test_snap_plan_is_native(spark):
    df = spark.createDataFrame(
        [(1, 1, 0.1, 0.2)], "user_id long, ts long, lat double, lng double"
    )
    plan = (
        trail_network_edges(df, order_cols=("ts",))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_components_high_diameter(spark):
    """Regression: a path-shaped (high-diameter) graph must resolve to
    ONE component.  The pre-round-4 min-label + pointer-jumping scheme
    needed 31 one-hop rounds on graphs like this and, capped at
    max_iter=20, silently returned a split labeling; the
    large/small-star rewrite converges in O(log^2 n) rounds."""
    import random

    from geo_spark.operators.dedup import dedup_clusters

    rng = random.Random(42)
    perm = list(range(300))
    rng.shuffle(perm)
    pairs = spark.createDataFrame(
        [(perm[i], perm[i + 1]) for i in range(299)], "da long, db long"
    )
    lbl = dedup_clusters(pairs, key="id").toPandas()
    assert lbl["rep"].nunique() == 1
    assert lbl["rep"].iloc[0] == 0
    assert len(lbl) == 300


def test_components_mixed_shapes(spark):
    """Clique + path + singleton-from-docs in one pass."""
    from geo_spark.operators.dedup import dedup_clusters

    clique = [(10, 11), (10, 12), (11, 12), (12, 13)]
    path = [(100, 101), (101, 102), (102, 103)]
    pairs = spark.createDataFrame(clique + path, "da long, db long")
    docs = spark.createDataFrame([(i,) for i in [10, 11, 12, 13, 100, 101, 102, 103, 999]], "id long")
    lbl = {r["id"]: r["rep"] for r in dedup_clusters(pairs, docs=docs, key="id").collect()}
    assert lbl == {10: 10, 11: 10, 12: 10, 13: 10,
                   100: 100, 101: 100, 102: 100, 103: 100, 999: 999}


def test_components_randomized_differential(spark):
    """Seeded random graphs (mixed density incl. near-critical) vs a
    union-find ground truth — full labeling equality, not just counts."""
    import random

    from geo_spark.operators.dedup import dedup_clusters

    rng = random.Random(20260821)
    for trial in range(6):
        n = rng.choice([20, 60, 120])
        m = rng.choice([n // 2, n, 2 * n])
        edges = [
            (rng.randrange(n), rng.randrange(n)) for _ in range(m)
        ]
        edges = [(a, b) for a, b in edges if a != b]
        if not edges:
            continue
        parent = list(range(n))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        touched = set()
        for a, b in edges:
            touched.add(a)
            touched.add(b)
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        want = {x: find(x) for x in sorted(touched)}
        # min-relabel: rep must be the component MIN, which union-find
        # by-min merging already guarantees here
        pairs = spark.createDataFrame(edges, "da long, db long")
        got = {
            r["id"]: r["rep"]
            for r in dedup_clusters(pairs, key="id").collect()
        }
        assert got == want, f"trial {trial}"
