"""Geohash + Web-Mercator/quadkey tilings: public interop vectors, the
bisection-reference differential, round trips, neighbor topology, and the
numpy ↔ Spark-native-expression consistency gate (incl. a no-Python-UDF
plan assertion — the whole tile-assignment path must stay in codegen)."""

import numpy as np
import pytest

from geo_spark.kernel import webgrid as W

RNG = np.random.default_rng(20260817)


def _rand_latlng(n):
    lat = np.degrees(np.arcsin(RNG.uniform(-1, 1, n)))
    lng = RNG.uniform(-180.0, 180.0, n)
    return lat, lng


# ---------------------------------------------------------------------------
# public interop vectors
# ---------------------------------------------------------------------------


def test_geohash_public_vectors():
    # canonical published example (geohash.org / Wikipedia)
    got = W.geohash_encode(np.array([57.64911]), np.array([10.40744]), 11)
    assert got[0] == "u4pruydqqvj"
    # every prefix is the coarser encoding of the same point
    for p in range(1, 11):
        assert W.geohash_encode(np.array([57.64911]), np.array([10.40744]), p)[0] == (
            "u4pruydqqvj"[:p]
        )
    # decode of the other canonical vector
    lat, lng = W.geohash_decode(np.array(["ezs42"]))
    assert abs(lat[0] - 42.60498046875) < 1e-12
    assert abs(lng[0] - (-5.60302734375)) < 1e-12


def test_quadkey_public_vectors():
    # Bing Maps Tile System worked example: tile (3,5) @ level 3 -> "213"
    assert W.quadkey_encode(np.array([3]), np.array([5]), 3)[0] == "213"
    # z=1 quadrants (hand-derivable)
    x, y = W.mercator_tile(np.array([40.0, 40.0, -40.0, -40.0]), np.array([-100.0, 100.0, -100.0, 100.0]), 1)
    assert W.quadkey_encode(x, y, 1).tolist() == ["0", "1", "2", "3"]
    # equator/prime-meridian point falls in the (1,1) tile at z=1
    x, y = W.mercator_tile(np.array([0.0]), np.array([0.0]), 1)
    assert (x[0], y[0]) == (1, 1)


def test_geohash_bisection_reference_differential():
    """Bit-twiddled encode == the published character-by-character
    bisection algorithm, on random + boundary points."""

    def reference(lat, lng, precision):
        lat_lo, lat_hi = -90.0, 90.0
        lng_lo, lng_hi = -180.0, 180.0
        bits = []
        even = True
        while len(bits) < 5 * precision:
            if even:
                mid = (lng_lo + lng_hi) / 2
                if lng >= mid:
                    bits.append(1)
                    lng_lo = mid
                else:
                    bits.append(0)
                    lng_hi = mid
            else:
                mid = (lat_lo + lat_hi) / 2
                if lat >= mid:
                    bits.append(1)
                    lat_lo = mid
                else:
                    bits.append(0)
                    lat_hi = mid
            even = not even
        chars = []
        for k in range(precision):
            v = 0
            for b in bits[5 * k : 5 * k + 5]:
                v = v * 2 + b
            chars.append(W.GEOHASH_BASE32[v])
        return "".join(chars)

    lat, lng = _rand_latlng(200)
    lat = np.concatenate([lat, [0.0, 90.0, -90.0, 45.0]])
    lng = np.concatenate([lng, [0.0, 180.0, -180.0, 45.0]])
    for p in (1, 2, 5, 7, 12):
        got = W.geohash_encode(lat, lng, p)
        for i in range(len(lat)):
            assert got[i] == reference(lat[i], lng[i], p), (lat[i], lng[i], p)


# ---------------------------------------------------------------------------
# round trips + structure
# ---------------------------------------------------------------------------


def test_geohash_roundtrip_and_bbox():
    lat, lng = _rand_latlng(50000)
    for p in (4, 6, 9, 12):
        gh = W.geohash_encode(lat, lng, p)
        lo, hi, wlo, whi = W.geohash_bbox(gh)
        assert ((lat >= lo) & (lat < hi)).all()
        assert ((lng >= wlo) & (lng < whi)).all()
        # re-encoding the center reproduces the hash (cell stability)
        clat, clng = W.geohash_decode(gh)
        assert (W.geohash_encode(clat, clng, p) == gh).all()


def test_geohash_prefix_is_ancestor():
    lat, lng = _rand_latlng(10000)
    g9 = W.geohash_encode(lat, lng, 9)
    for p in (1, 3, 5, 8):
        gp = W.geohash_encode(lat, lng, p)
        assert (np.char.ljust(gp, p) == np.array([s[:p] for s in g9])).all()


def test_geohash_neighbors_topology():
    lat, lng = _rand_latlng(2000)
    # keep away from poles where N/S neighbors degenerate
    mask = np.abs(lat) < 80
    lat, lng = lat[mask], lng[mask]
    gh = W.geohash_encode(lat, lng, 6)
    nb = W.geohash_neighbors(gh)
    assert nb.shape == (len(gh), 8)
    # all 8 distinct and != self
    for i in range(min(len(gh), 200)):
        s = set(nb[i])
        assert len(s) == 8 and gh[i] not in s
    # E/W neighbors share the latitude band; N/S share the longitude band
    lo, hi, wlo, whi = W.geohash_bbox(gh)
    elo, ehi, _, _ = W.geohash_bbox(nb[:, 2])
    assert np.allclose(elo, lo) and np.allclose(ehi, hi)
    _, _, nwlo, nwhi = W.geohash_bbox(nb[:, 0])
    assert np.allclose(nwlo, wlo) and np.allclose(nwhi, whi)
    # antimeridian wrap: east of the last column is the first column
    g = W.geohash_encode(np.array([10.0]), np.array([179.9999]), 6)
    e = W.geohash_neighbors(g)[0, 2]
    _, _, wlo2, _ = W.geohash_bbox(np.array([e]))
    assert wlo2[0] == -180.0


def test_quadkey_roundtrip_parent():
    lat, lng = _rand_latlng(50000)
    for z in (1, 5, 12, 23, 30):
        x, y = W.mercator_tile(lat, lng, z)
        assert (x >= 0).all() and (x < (1 << z)).all()
        assert (y >= 0).all() and (y < (1 << z)).all()
        qk = W.quadkey_encode(x, y, z)
        x2, y2, z2 = W.quadkey_decode(qk)
        assert z2 == z and (x2 == x).all() and (y2 == y).all()
        if z > 1:
            px, py = W.tile_parent(x, y)
            pqk = W.quadkey_encode(px, py, z - 1)
            # quadkey prefix == parent quadkey (the quadtree property)
            assert (pqk == np.array([s[: z - 1] for s in qk])).all()


def test_tile_bounds_contain_points():
    lat, lng = _rand_latlng(20000)
    lat = np.clip(lat, -W.MERCATOR_MAX_LAT + 1e-6, W.MERCATOR_MAX_LAT - 1e-6)
    for z in (3, 10):
        x, y = W.mercator_tile(lat, lng, z)
        lo, hi, wlo, whi = W.tile_bounds(x, y, z)
        assert ((lat >= lo - 1e-9) & (lat <= hi + 1e-9)).all()
        assert ((lng >= wlo - 1e-9) & (lng < whi + 1e-9)).all()
        # y increases southward: northern edge above southern
        assert (hi > lo).all()


def test_mercator_y_ordering():
    # y monotonically increases as latitude decreases (north -> south)
    lats = np.linspace(85.0, -85.0, 1000)
    _, y = W.mercator_tile(lats, np.zeros_like(lats), 15)
    assert (np.diff(y) >= 0).all()


def test_geohash_cover_rect_exact():
    """Covering = exactly the cells intersecting the rect: every listed
    cell's bbox overlaps the rect (no slop), and every random point
    inside the rect lands in a listed cell (no gaps) — incl. the
    antimeridian wrap."""
    cases = [
        (30.0, 50.0, -90.0, -60.0),
        (-10.0, 10.0, 170.0, -170.0),  # wraps
        (-0.5, 0.5, -0.5, 0.5),
        (85.0, 90.0, -180.0, 180.0),  # polar band
    ]
    for la0, la1, ln0, ln1 in cases:
        for p in (2, 3, 4):
            cells = W.geohash_cover_rect(la0, la1, ln0, ln1, p)
            assert len(cells) == len(set(cells))
            lo, hi, wlo, whi = W.geohash_bbox(cells)
            # overlap in latitude always required
            assert ((hi >= la0) & (lo <= la1)).all()
            # longitude overlap respecting wrap
            if ln0 <= ln1:
                assert ((whi >= ln0) & (wlo <= ln1)).all()
            else:
                assert ((whi >= ln0) | (wlo <= ln1)).all()
            # completeness: points sampled inside must hash into the set
            n = 2000
            lat = RNG.uniform(la0, la1, n)
            if ln0 <= ln1:
                lng = RNG.uniform(ln0, ln1, n)
            else:
                lng = RNG.uniform(ln0, ln1 + 360.0, n)
                lng = ((lng + 180.0) % 360.0) - 180.0
            gh = W.geohash_encode(lat, lng, p)
            cellset = set(cells)
            assert all(g in cellset for g in gh)


def test_geohash_cover_adaptive_budget():
    p, cells = W.geohash_cover_adaptive(30.0, 50.0, -90.0, -60.0, max_cells=64)
    assert len(cells) <= 64 and p >= 2
    # a tiny rect gets a fine precision
    p2, cells2 = W.geohash_cover_adaptive(10.0, 10.01, 10.0, 10.01, max_cells=64)
    assert p2 > p
    assert len(cells2) <= 64


@pytest.mark.usefixtures("spark")
def test_geohash_rect_join_differential(spark):
    """Term join + refine == brute containment, on skewed random points
    x 4 rects (one antimeridian, one tiny)."""
    import pandas as pd
    from pyspark.sql import functions as F

    from geo_spark.operators.webgrid_join import (
        build_geohash_rect_layer,
        geohash_rect_join,
    )

    n = 20000
    lat, lng = _rand_latlng(n)
    # cluster some points near rect corners to stress boundaries
    lat[:500] = 30.0 + RNG.uniform(-0.01, 0.01, 500)
    lng[:500] = -90.0 + RNG.uniform(-0.01, 0.01, 500)
    pdf = pd.DataFrame({"pid": np.arange(n), "lat": lat, "lng": lng})
    pts = spark.createDataFrame(pdf).repartition(4)
    rects = [
        (1, 30.0, -90.0, 50.0, -60.0),
        (2, -10.0, 170.0, 10.0, -170.0),
        (3, 29.99, -90.01, 30.05, -89.95),
        (4, -90.0, -180.0, -80.0, 180.0),
    ]
    layer = build_geohash_rect_layer(spark, rects)
    got = (
        geohash_rect_join(pts, layer, point_key="pid", latlng=("lat", "lng"))
        .select("pid", "geom_id")
        .toPandas()
        .sort_values(["pid", "geom_id"])
        .reset_index(drop=True)
    )
    # plan gate: no Python nodes
    j = geohash_rect_join(pts, layer, point_key="pid")
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "BroadcastHashJoin" in plan
    # brute force
    exp_rows = []
    for g, la0, ln0, la1, ln1 in rects:
        in_lat = (lat >= la0) & (lat <= la1)
        in_lng = (
            (lng >= ln0) & (lng <= ln1) if ln0 <= ln1 else (lng >= ln0) | (lng <= ln1)
        )
        for pid in np.nonzero(in_lat & in_lng)[0]:
            exp_rows.append((pid, g))
    exp = (
        pd.DataFrame(exp_rows, columns=["pid", "geom_id"])
        .sort_values(["pid", "geom_id"])
        .reset_index(drop=True)
    )
    assert len(got) == len(exp)
    assert (got["pid"].to_numpy() == exp["pid"].to_numpy()).all()
    assert (got["geom_id"].to_numpy() == exp["geom_id"].to_numpy()).all()


# ---------------------------------------------------------------------------
# Spark-native expressions == numpy kernel, and stay UDF-free
# ---------------------------------------------------------------------------


@pytest.mark.usefixtures("spark")
def test_spark_native_matches_numpy(spark):
    from pyspark.sql import functions as F

    from geo_spark.functions import webgrid as SW

    n = 200_000
    lat, lng = _rand_latlng(n)
    # include hot boundary values
    lat[:6] = [90.0, -90.0, 0.0, 85.05112878, -85.05112878, 45.0]
    lng[:6] = [180.0, -180.0, 0.0, 179.999999, -179.999999, 45.0]
    import pandas as pd

    df = spark.createDataFrame(
        pd.DataFrame({"i": np.arange(n), "lat": lat, "lng": lng})
    ).repartition(8)
    out = df.select(
        "i",
        SW.geohash_col(F.col("lat"), F.col("lng"), 7).alias("gh7"),
        SW.geohash_col(F.col("lat"), F.col("lng"), 12).alias("gh12"),
        *[
            c.alias(nm)
            for c, nm in zip(SW.mercator_xy_cols(F.col("lat"), F.col("lng"), 13), ["tx", "ty"])
        ],
        SW.quadkey_from_latlng(F.col("lat"), F.col("lng"), 13).alias("qk"),
    )
    # plan must not contain any Python evaluation node
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    pdf = out.toPandas().sort_values("i").reset_index(drop=True)
    assert (pdf["gh7"].to_numpy() == W.geohash_encode(lat, lng, 7)).all()
    assert (pdf["gh12"].to_numpy() == W.geohash_encode(lat, lng, 12)).all()
    x, y = W.mercator_tile(lat, lng, 13)
    assert (pdf["tx"].to_numpy() == x).all()
    assert (pdf["ty"].to_numpy() == y).all()
    assert (pdf["qk"].to_numpy() == W.quadkey_encode(x, y, 13)).all()


@pytest.mark.usefixtures("spark")
def test_quadkey_pyramid_consistency(spark):
    """Every zoom level partitions the same total; each tile's count ==
    sum of its 4 children; exactly two exchanges in the plan (collapse +
    pyramid), never an input-times-zoom explode before the first agg."""
    import pandas as pd
    from pyspark.sql import functions as F

    from geo_spark.operators.tiling import quadkey_pyramid

    n = 30000
    lat, lng = _rand_latlng(n)
    df = spark.createDataFrame(pd.DataFrame({"lat": lat, "lng": lng})).repartition(4)
    zoom = 5
    out = quadkey_pyramid(df, zoom=zoom)
    pdf = out.toPandas()
    per_zoom = pdf.groupby("zoom")["cnt"].sum()
    assert (per_zoom == n).all() and len(per_zoom) == zoom + 1
    # parent-child consistency at every level
    for z in range(zoom):
        parents = pdf[pdf["zoom"] == z].set_index("qk")["cnt"]
        kids = pdf[pdf["zoom"] == z + 1].copy()
        kid_sum = kids.groupby(kids["qk"].str[:z])["cnt"].sum()
        assert parents.sort_index().equals(kid_sum.sort_index())
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # AQE's toString repeats the plan under "== Initial Plan ==" — count
    # exchanges in the final section only
    final_plan = plan.split("== Initial Plan ==")[0]
    assert final_plan.count("Exchange hashpartitioning") == 2


def test_tile_focal_mean_matches_numpy(spark):
    """3x3 focal mean over mercator tiles == dense numpy convolution
    with x wraparound and y edge clamp."""
    import pandas as pd

    from geo_spark.kernel import webgrid as W
    from geo_spark.operators.tiling import tile_focal_mean

    rng = np.random.default_rng(41)
    n_pts = 5000
    lat = np.degrees(np.arcsin(rng.uniform(-1, 1, n_pts)))
    lng = rng.uniform(-180.0, 180.0, n_pts)
    zoom = 4
    n = 1 << zoom
    df = spark.createDataFrame(pd.DataFrame({"lat": lat, "lng": lng}))
    got = {
        (r["tx"], r["ty"]): r["smoothed"]
        for r in tile_focal_mean(df, zoom).collect()
    }
    x, y = W.mercator_tile(lat, lng, zoom)
    grid = np.zeros((n, n), dtype=np.int64)
    np.add.at(grid, (x, y), 1)
    want = {}
    for tx in range(n):
        for ty in range(n):
            if grid[tx, ty] == 0:
                continue
            s = 0
            for dx in (-1, 0, 1):
                for dy in (-1, 0, 1):
                    ny = ty + dy
                    if 0 <= ny < n:
                        s += int(grid[(tx + dx) % n, ny])
            want[(tx, ty)] = int(np.floor(s * 1_000_000 / 9))
    assert got == want


def test_decayed_tile_counts_exact_scaling(spark):
    """score_x2w == sum of 2^(day div hl); n_events independent."""
    from geo_spark.operators.tiling import decayed_tile_counts

    day = 86_400_000_000
    rows = [
        # same tile (0,0): days 0, 1, 3 with hl=2 -> 2^0 + 2^0 + 2^1 = 4
        (10.0, 10.0, 0 * day),
        (10.0, 10.0, 1 * day + 5),
        (10.0, 10.0, 3 * day + 1),
        # different tile: day 4 -> 2^2 = 4
        (-40.0, -120.0, 4 * day),
    ]
    ev = spark.createDataFrame(rows, "lat double, lng double, ts_us long")
    got = {
        r["qk"]: (r["n_events"], r["score_x2w"])
        for r in decayed_tile_counts(ev, zoom=3, half_life_days=2).collect()
    }
    assert sorted(got.values()) == [(1, 4), (3, 4)]


def test_tile_day_anomalies_range_frame_gaps(spark):
    """The RANGE frame must skip over missing days, not count rows."""
    from geo_spark.operators.tiling import tile_day_anomalies

    day = 86_400_000_000
    rows = []
    # one tile: day 0 x2, day 1 x1, day 5 x9 (days 2-4 empty)
    rows += [(10.0, 10.0, 0 * day)] * 2
    rows += [(10.0, 10.0, 1 * day)] * 1
    rows += [(10.0, 10.0, 5 * day)] * 9
    ev = spark.createDataFrame(rows, "lat double, lng double, ts_us long")
    got = {
        r["day"]: (r["cnt"], r["prev"], r["is_spike"])
        for r in tile_day_anomalies(ev, zoom=3, window_days=3).collect()
    }
    assert got[0] == (2, 0, 0)  # no baseline yet
    assert got[1] == (1, 2, 0)  # prev = day0 only
    # day 5's 3-day RANGE window is days 2-4: all empty -> prev 0
    # (a ROWS frame would wrongly see days 0-1 here)
    assert got[5] == (9, 0, 0)


def test_tile_day_anomalies_spike_rule(spark):
    from geo_spark.operators.tiling import tile_day_anomalies

    day = 86_400_000_000
    rows = []
    rows += [(10.0, 10.0, 0 * day)] * 2
    rows += [(10.0, 10.0, 1 * day)] * 2
    rows += [(10.0, 10.0, 2 * day)] * 6  # prev=4, 6*2 >= 4*3 -> spike
    rows += [(10.0, 10.0, 3 * day)] * 2  # prev=10, no spike
    ev = spark.createDataFrame(rows, "lat double, lng double, ts_us long")
    got = {
        r["day"]: (r["prev"], r["is_spike"])
        for r in tile_day_anomalies(ev, zoom=3, window_days=3).collect()
    }
    assert got[2] == (4, 1)
    assert got[3] == (10, 0)


def _morans_python(tiles, z):
    """Exact integer replay of the morans_i spec."""
    n = 1 << z
    occ = dict(tiles)  # {(tx,ty): v}
    nn = len(occ)
    ss = sum(occ.values())
    d = {k: nn * v - ss for k, v in occ.items()}
    den = sum(x * x for x in d.values())
    num = 0
    w = 0
    for (tx, ty), ds in d.items():
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                if (dx, dy) == (0, 0):
                    continue
                k = ((tx + dx + n) % n, ty + dy)
                if k[1] < 0 or k[1] >= n or k not in d:
                    continue
                num += ds * d[k]
                w += 1
    if w == 0 or den == 0:
        return nn, w, None
    t = num * nn * 1_000_000
    i_ppm = abs(t) // (w * den)
    return nn, w, i_ppm if t >= 0 else -i_ppm


def test_morans_i_matches_python_and_signs(spark):
    from geo_spark.operators.tiling import morans_i

    z = 4
    # clustered surface: one hot 3x3 block in a cold field
    clustered = [
        ((tx, ty), 100 if 4 <= tx <= 6 and 4 <= ty <= 6 else 1)
        for tx in range(10)
        for ty in range(10)
    ]
    # checkerboard: perfect dispersion
    checker = [
        ((tx, ty), 100 if (tx + ty) % 2 == 0 else 1)
        for tx in range(10)
        for ty in range(10)
    ]
    rng = np.random.default_rng(3)
    random_grid = [
        ((tx, ty), int(rng.integers(1, 50)))
        for tx in range(12)
        for ty in range(12)
    ]
    for name, tiles in (
        ("clustered", clustered),
        ("checker", checker),
        ("random", random_grid),
    ):
        df = spark.createDataFrame(
            [(tx, ty, v) for (tx, ty), v in tiles],
            "tx long, ty long, cnt long",
        )
        got = morans_i(df, z).collect()[0]
        nn, w, want = _morans_python(tiles, z)
        assert (got["n_tiles"], got["w_pairs"], got["i_ppm"]) == (
            nn,
            w,
            want,
        ), name
    # sign sanity: clustered strongly positive; the checkerboard is
    # only mildly negative under QUEEN weights (its 4 diagonal
    # neighbors share the checker color and cancel most of the 4
    # rook neighbors' anti-correlation — rook weights would give -1)
    assert _morans_python(clustered, z)[2] > 200_000
    assert _morans_python(checker, z)[2] < 0


def test_morans_i_wraps_antimeridian(spark):
    """Tiles at tx=0 and tx=2^z-1 are neighbors (x wraps): two hot
    columns at the seam behave like one cluster."""
    from geo_spark.operators.tiling import morans_i

    z = 3
    n = 1 << z
    tiles = [
        ((tx, ty), 50 if tx in (0, n - 1) else 1)
        for tx in range(n)
        for ty in range(4)
    ]
    df = spark.createDataFrame(
        [(tx, ty, v) for (tx, ty), v in tiles], "tx long, ty long, cnt long"
    )
    got = morans_i(df, z).collect()[0]
    nn, w, want = _morans_python(tiles, z)
    assert (got["n_tiles"], got["w_pairs"], got["i_ppm"]) == (nn, w, want)
    assert want > 0  # the wrap makes the seam one positive cluster


def _local_morans_python(tiles, z):
    n = 1 << z
    occ = dict(tiles)
    nn = len(occ)
    ss = sum(occ.values())
    d = {k: nn * v - ss for k, v in occ.items()}
    den = sum(x * x for x in d.values())
    out = {}
    for (tx, ty), di in d.items():
        lag = None
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                if (dx, dy) == (0, 0):
                    continue
                k = ((tx + dx + n) % n, ty + dy)
                if k[1] < 0 or k[1] >= n or k not in d:
                    continue
                lag = (lag or 0) + d[k]
        if lag is None:
            out[(tx, ty)] = (None, "")
            continue
        t = di * lag * nn * 1_000_000
        ip = abs(t) // den
        ip = ip if t >= 0 else -ip
        if di == 0 or lag == 0:
            q = ""
        elif di > 0 and lag > 0:
            q = "HH"
        elif di < 0 and lag < 0:
            q = "LL"
        elif di > 0:
            q = "HL"
        else:
            q = "LH"
        out[(tx, ty)] = (ip, q)
    return out


def test_local_morans_matches_python_and_quadrants(spark):
    from geo_spark.operators.tiling import local_morans

    z = 4
    # hot block + one isolated hot outlier in a cold field, plus a
    # detached tile with no neighbors at all
    tiles = [
        ((tx, ty), 100 if 2 <= tx <= 4 and 2 <= ty <= 4 else 1)
        for tx in range(8)
        for ty in range(8)
    ]
    tiles.append(((12, 12), 100))  # isolated: no occupied neighbors
    df = spark.createDataFrame(
        [(tx, ty, v) for (tx, ty), v in tiles], "tx long, ty long, cnt long"
    )
    got = {
        (r["tx"], r["ty"]): (r["i_ppm"], r["quadrant"])
        for r in local_morans(df, z).collect()
    }
    want = _local_morans_python(tiles, z)
    assert got == want
    assert got[(3, 3)][1] == "HH"      # block core: hot in hot
    assert got[(0, 0)][1] == "LL"      # far field: cold in cold
    assert got[(12, 12)] == (None, "")  # no neighbors
    # block-adjacent cold tiles are LH (cold next to hot)
    assert got[(1, 3)][1] == "LH"


def test_colocation_lift_matches_python(spark):
    from geo_spark.operators.tiling import colocation_lift

    rng = np.random.default_rng(11)
    rows = []
    for i in range(400):
        tx, ty = int(rng.integers(0, 6)), int(rng.integers(0, 6))
        t = ["buy", "view", "click"][int(rng.integers(0, 3))]
        rows.append((tx, ty, t))
    # force attraction: 'pair_x' and 'pair_y' always share tiles
    for tx in range(3):
        rows += [(tx, 9, "pair_x"), (tx, 9, "pair_y")]
    df = spark.createDataFrame(rows, "tx long, ty long, event_type string")
    occ = {(tx, ty, t) for tx, ty, t in rows}
    tiles = {(tx, ty) for tx, ty, _ in occ}
    per_t = {}
    for tx, ty, t in occ:
        per_t[t] = per_t.get(t, 0) + 1
    from collections import defaultdict

    by_tile = defaultdict(set)
    for tx, ty, t in occ:
        by_tile[(tx, ty)].add(t)
    n_ab = defaultdict(int)
    for ts in by_tile.values():
        ts = sorted(ts)
        for i in range(len(ts)):
            for j in range(i + 1, len(ts)):
                n_ab[(ts[i], ts[j])] += 1
    want = {
        k: (per_t[k[0]], per_t[k[1]], v, len(tiles),
            (v * len(tiles) * 1_000_000) // (per_t[k[0]] * per_t[k[1]]))
        for k, v in n_ab.items()
    }
    got = {
        (r["type_a"], r["type_b"]): (
            r["n_a"], r["n_b"], r["n_ab"], r["n_tiles"], r["lift_ppm"]
        )
        for r in colocation_lift(df, 4).collect()
    }
    assert got == want
    assert got[("pair_x", "pair_y")][4] > 1_000_000  # attraction


def _contour_python(tiles, threshold):
    from geo_spark.operators.tiling import _MS_SEGMENTS

    occ = dict(tiles)
    blocks = set()
    for (x, y) in occ:
        for dx in (0, -1):
            for dy in (0, -1):
                blocks.add((x + dx, y + dy))
    out = set()
    for bx, by in blocks:
        mask = 0
        for bit, (dx, dy) in enumerate(((0, 0), (1, 0), (0, 1), (1, 1))):
            if occ.get((bx + dx, by + dy), 0) >= threshold:
                mask |= 1 << bit
        if mask in (0, 15):
            continue
        for (x1, y1), (x2, y2) in _MS_SEGMENTS[mask]:
            out.add((bx, by, mask, bx * 2 + x1, by * 2 + y1,
                     bx * 2 + x2, by * 2 + y2))
    return out


def test_contour_matches_python_and_single_tile(spark):
    from geo_spark.operators.tiling import contour_segments

    # single hot tile -> a 4-segment diamond around it
    tiles = [((5, 5), 10)]
    df = spark.createDataFrame(
        [(x, y, v) for (x, y), v in tiles], "tx long, ty long, cnt long"
    )
    got = {
        (r["bx"], r["by"], r["mask"], r["x1"], r["y1"], r["x2"], r["y2"])
        for r in contour_segments(df, 5).collect()
    }
    want = _contour_python(tiles, 5)
    assert got == want and len(got) == 4

    # random raster incl. saddle-producing patterns
    rng = np.random.default_rng(29)
    tiles = [
        ((int(x), int(y)), int(v))
        for x, y, v in zip(
            rng.integers(0, 12, 250),
            rng.integers(0, 12, 250),
            rng.integers(1, 20, 250),
        )
    ]
    dedup = {}
    for k, v in tiles:
        dedup[k] = v
    tiles = list(dedup.items())
    df = spark.createDataFrame(
        [(x, y, v) for (x, y), v in tiles], "tx long, ty long, cnt long"
    )
    got = {
        (r["bx"], r["by"], r["mask"], r["x1"], r["y1"], r["x2"], r["y2"])
        for r in contour_segments(df, 10).collect()
    }
    want = _contour_python(tiles, 10)
    assert got == want


def test_contour_segments_chain_evenly():
    """Every cut edge is shared by exactly two blocks in the emitted
    domain, so each segment endpoint must occur an EVEN number of
    times — the invariant that makes the segments chainable into
    closed isolines."""
    rng = np.random.default_rng(31)
    tiles = {}
    for x, y, v in zip(
        rng.integers(0, 10, 200),
        rng.integers(0, 10, 200),
        rng.integers(1, 30, 200),
    ):
        tiles[(int(x), int(y))] = int(v)
    segs = _contour_python(list(tiles.items()), 15)
    from collections import Counter

    ends = Counter()
    for _, _, _, x1, y1, x2, y2 in segs:
        ends[(x1, y1)] += 1
        ends[(x2, y2)] += 1
    assert segs
    assert all(c % 2 == 0 for c in ends.values()), ends


def test_tile_kde_matches_numpy_2d_kernel(spark):
    """Separable binomial KDE == dense numpy 2-D product-kernel
    convolution with x wraparound and y edge clamp (the separability
    identity), incl. points hugging the antimeridian and poles."""
    from math import comb

    import pandas as pd

    from geo_spark.kernel import webgrid as W
    from geo_spark.operators.tiling import tile_kde

    rng = np.random.default_rng(43)
    n_pts = 4000
    lat = np.degrees(np.arcsin(rng.uniform(-1, 1, n_pts)))
    lng = rng.uniform(-180.0, 180.0, n_pts)
    # force mass onto the wrap/clamp boundaries
    lat[:50] = 85.0
    lat[50:100] = -85.0
    lng[100:150] = 179.99
    lng[150:200] = -179.99
    zoom, radius = 4, 2
    n = 1 << zoom
    w = [comb(2 * radius, j) for j in range(2 * radius + 1)]
    df = spark.createDataFrame(pd.DataFrame({"lat": lat, "lng": lng}))
    got = {
        (r["tx"], r["ty"]): r["density"]
        for r in tile_kde(df, zoom, radius=radius).collect()
    }
    x, y = W.mercator_tile(lat, lng, zoom)
    grid = np.zeros((n, n), dtype=np.int64)
    np.add.at(grid, (x, y), 1)
    want = {}
    for tx in range(n):
        for ty in range(n):
            if grid[tx, ty] == 0:
                continue
            s = 0
            for i in range(-radius, radius + 1):
                for j in range(-radius, radius + 1):
                    ny = ty + j
                    if 0 <= ny < n:
                        s += int(grid[(tx + i) % n, ny]) * w[i + radius] * w[j + radius]
            want[(tx, ty)] = s
    assert got == want


def test_tile_kde_plan_python_free(spark):
    from geo_spark.operators.tiling import tile_kde

    df = spark.range(100).selectExpr(
        "cast(id % 60 - 30 as double) as lat",
        "cast(id % 300 - 150 as double) as lng",
    )
    plan = tile_kde(df, 5)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan
