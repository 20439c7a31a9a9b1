"""Batch geo-sessionization: per-user trajectory segmentation with
spatial roll-ups — the batch twin of streaming/sessions.py.

A session breaks when the time gap to the user's previous event exceeds
``gap_s`` OR the great-circle hop exceeds ``jump_rad`` (teleport
detection — crawl replays, account sharing, GPS glitches).  Output is
one row per session with count, span, and exact spherical travel
length.

Scale shape: everything is native window/aggregate SQL —

- ONE shuffle total: the lag window partitions by user; the session
  aggregation groups by (user, session_id), and HashPartitioning(user)
  already satisfies ClusteredDistribution(user, session_id), so
  Catalyst reuses the window's exchange for the final aggregate
  (asserted in tests/test_sessionize.py).
- the break flag is lag + boolean arithmetic, the session id its
  running sum over the same window (no second sort), the travel length
  a sum of codegen chord expressions — zero Python anywhere.
- skew: the window is per-user; a pathological single user serializes
  only their own partition (the same bound any per-key sequence
  operator has).  Hot users can be pre-split by a (user, day) composite
  key upstream when that bound matters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from geo_spark.kernel.regions import chord2_from_angle


def with_session_ids(
    events: DataFrame,
    gap_s: float,
    jump_rad: float,
    user_col: str = "user_id",
    ts_us_col: str = "ts_us",
    latlng: tuple[str, str] = ("lat", "lng"),
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Per-event session assignment: the input's keep columns plus
    (x, y, z, _brk, session_id) — the reusable first half of
    :func:`geo_sessionize`, for consumers that need per-event session
    membership (OD matrices, per-session endpoints) rather than the
    rolled-up summary.  One shuffle (the per-user lag window)."""
    gap_us = int(round(gap_s * 1_000_000))
    jump2 = chord2_from_angle(jump_rad)

    order = [ts_us_col] + ([tiebreak_col] if tiebreak_col else [])
    w = Window.partitionBy(user_col).orderBy(*order)
    keep = [user_col, ts_us_col] + ([tiebreak_col] if tiebreak_col else [])
    la, ln = (F.radians(F.col(c)) for c in latlng)
    base = (
        # native trig, not the s2_xyz Arrow UDF: the whole operator
        # stays inside whole-stage codegen (zero Python nodes)
        events.select(*keep, *latlng)
        .select(
            *keep,
            *latlng,
            (F.cos(ln) * F.cos(la)).alias("x"),
            (F.sin(ln) * F.cos(la)).alias("y"),
            F.sin(la).alias("z"),
        )
        .withColumn("_px", F.lag("x").over(w))
        .withColumn("_py", F.lag("y").over(w))
        .withColumn("_pz", F.lag("z").over(w))
        .withColumn("_pts", F.lag(ts_us_col).over(w))
    )
    hop2 = (
        (F.col("x") - F.col("_px")) * (F.col("x") - F.col("_px"))
        + (F.col("y") - F.col("_py")) * (F.col("y") - F.col("_py"))
        + (F.col("z") - F.col("_pz")) * (F.col("z") - F.col("_pz"))
    )
    brk = F.when(
        F.col("_pts").isNull()
        | (F.col(ts_us_col) - F.col("_pts") > F.lit(gap_us))
        | (hop2 > F.lit(jump2)),
        F.lit(1),
    ).otherwise(F.lit(0))
    return base.withColumn("_brk", brk).withColumn(
        "session_id", F.sum("_brk").over(w)
    )


def geo_sessionize(
    events: DataFrame,
    gap_s: float,
    jump_rad: float,
    user_col: str = "user_id",
    ts_us_col: str = "ts_us",
    latlng: tuple[str, str] = ("lat", "lng"),
    tiebreak_col: str | None = None,
) -> DataFrame:
    """One row per (user, session): (user, session_id, n_events,
    start_us, end_us, travel) where travel is the summed great-circle
    length (radians) of intra-session hops.

    ``tiebreak_col`` makes the within-user order total when timestamps
    can collide — without a total order the lag pairing (hence the
    segmentation) is nondeterministic across runs and engines."""
    sessioned = with_session_ids(
        events, gap_s, jump_rad, user_col, ts_us_col, latlng, tiebreak_col
    )
    hop2 = (
        (F.col("x") - F.col("_px")) * (F.col("x") - F.col("_px"))
        + (F.col("y") - F.col("_py")) * (F.col("y") - F.col("_py"))
        + (F.col("z") - F.col("_pz")) * (F.col("z") - F.col("_pz"))
    )
    # intra-session hop length (0 at session starts)
    hop_len = F.when(
        F.col("_brk") == 1, F.lit(0.0)
    ).otherwise(
        2.0 * F.asin(F.sqrt(hop2) / 2.0)
    )
    return (
        sessioned.withColumn("_hop", hop_len)
        .groupBy(user_col, "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min(ts_us_col).alias("start_us"),
            F.max(ts_us_col).alias("end_us"),
            F.sum("_hop").alias("travel"),
        )
    )


def transition_matrix(
    events: DataFrame,
    user_col: str = "user_id",
    order_cols: tuple[str, ...] = ("ts", "event_id"),
    state_col: str = "event_type",
    scope_cols: tuple[str, ...] = (),
) -> DataFrame:
    """(prev_state, state, n, p_ppm): first-order Markov transition
    counts and probabilities over per-user ordered event streams — the
    clickstream-modeling primitive (next-page prediction, funnel drop
    analysis).  p_ppm = n * 1e6 div row-total: integer floor, engine-
    portable.

    Scale shape: ONE per-user window shuffle for the lag, then a
    groupBy over the |states|^2-sized transition table; the per-prev
    normalization runs as a window over that already-tiny aggregate
    (no second full-data shuffle).  Deterministic given a total
    per-user order — pass a tiebreak column in ``order_cols`` when
    timestamps can collide.  ``scope_cols`` computes an independent
    matrix per scope (e.g. per geographic zone): sequence partitioning
    and normalization both pick up the scope, so consecutive-in-scope
    events pair even when other scopes' events intervene (documented
    semantics)."""
    w = Window.partitionBy(*scope_cols, user_col).orderBy(*order_cols)
    pr = (
        events.select(*scope_cols, user_col, *order_cols, state_col)
        .withColumn("_prev", F.lag(state_col).over(w))
        .where(F.col("_prev").isNotNull())
    )
    cnt = pr.groupBy(
        *scope_cols,
        F.col("_prev").alias("prev_state"),
        F.col(state_col).alias("state"),
    ).agg(F.count(F.lit(1)).alias("n"))
    tot = Window.partitionBy(*scope_cols, "prev_state")
    return (
        cnt.withColumn("_tot", F.sum("n").over(tot))
        .withColumn(
            "p_ppm", F.expr("(n * 1000000) div _tot").cast("long")
        )
        .drop("_tot")
    )


def stay_points(
    events: DataFrame,
    zoom: int = 6,
    min_duration_us: int = 3_600_000_000,
    user_col: str = "user_id",
    ts_us_col: str = "ts_us",
    latlng: tuple[str, str] = ("lat", "lng"),
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """(user_id, stay_idx, qk, n_events, start_us, dur_us): grid-based
    stay-point detection — maximal runs of consecutive events (per-user
    time order) inside the SAME web-mercator tile, kept when the dwell
    time reaches ``min_duration_us`` (the grid variant of Li et al.'s
    stay-point extraction; the anchor-radius variant is inherently
    sequential, the grid rule is pure windows).

    Plan: one per-user lag window flags tile changes, a running sum
    numbers runs, and the rollup groups by (user, run) — the window and
    the groupBy share the user hash partitioning, so the full data
    shuffles once.  All-integer output."""
    from geo_spark.functions.webgrid import quadkey_from_latlng

    la, ln = latlng
    w = Window.partitionBy(user_col).orderBy(ts_us_col, tiebreak_col)
    tiled = events.select(
        user_col,
        ts_us_col,
        tiebreak_col,
        quadkey_from_latlng(F.col(la), F.col(ln), zoom).alias("qk"),
    )
    runs = (
        tiled.withColumn("_pqk", F.lag("qk").over(w))
        .withColumn(
            "_brk",
            F.when(
                F.col("_pqk").isNull() | (F.col("_pqk") != F.col("qk")),
                F.lit(1),
            ).otherwise(F.lit(0)),
        )
        .withColumn("stay_idx", F.sum("_brk").over(w))
    )
    return (
        runs.groupBy(user_col, "stay_idx")
        .agg(
            F.min("qk").alias("qk"),  # constant within a run
            F.count(F.lit(1)).alias("n_events"),
            F.min(ts_us_col).alias("start_us"),
            (F.max(ts_us_col) - F.min(ts_us_col)).alias("dur_us"),
        )
        .where(F.col("dur_us") >= min_duration_us)
    )


def zone_crossings(
    events: DataFrame,
    zone_col: str = "zone",
    user_col: str = "user_id",
    order_cols: tuple[str, ...] = ("ts", "event_id"),
) -> DataFrame:
    """(user_id, order_cols..., from_zone, to_zone): the geofence
    ENTER/EXIT stream — rows where the per-user zone (from any upstream
    assignment: PIP join, reverse geocode, tiling) differs from the
    previous event's zone.  First events emit nothing (no prior zone).

    One per-user lag window; pure codegen.  The streaming twin
    (streaming/geofence.py) carries one (ts, zone) row per user and
    emits the same rows on an in-order drained source."""
    w = Window.partitionBy(user_col).orderBy(*order_cols)
    return (
        events.select(user_col, *order_cols, zone_col)
        .withColumn("_prev", F.lag(zone_col).over(w))
        .where(
            F.col("_prev").isNotNull()
            & (F.col("_prev") != F.col(zone_col))
        )
        .select(
            user_col,
            *order_cols,
            F.col("_prev").alias("from_zone"),
            F.col(zone_col).alias("to_zone"),
        )
    )


def radius_of_gyration(
    events: DataFrame,
    user_col: str = "user_id",
    latlng: tuple[str, str] = ("lat", "lng"),
    qscale: int = 100_000_000,
    xyz: tuple[str, str, str] | None = None,
) -> DataFrame:
    """(user_id, n_events, msd_q): per-user mean squared chordal
    deviation from the centroid — the mobility radius-of-gyration
    statistic (Gonzalez et al., "Understanding individual human
    mobility patterns"), kept exact-integer: unit-sphere coords
    quantize to floor(c * qscale), the centroid is the floor-mean, and
    the mean squared deviation is a DECIMAL(38)-summed integer divided
    by n (truncating) — engine-portable where float variance
    accumulation is partition-order dependent.

    Plan: two groupBy(user) aggregates with a join between them — all
    three hash-partition on the same key, so the full data shuffles
    once and the rest reuses the partitioning; zero Python."""
    # +1 shift keeps every quantity non-negative so truncating (Spark
    # div) and flooring (DuckDB //) division agree; both engines
    # evaluate the identical IEEE expression, and the shift perturbs
    # deviations by at most one quantum (1e-8 of a chord) — far below
    # anything the statistic is used for.  ``xyz`` bypasses the trig
    # when unit coordinates are already available — cross-engine
    # oracles should prefer it: the quantization floor tolerates the
    # ~1 ulp cos/sin divergence between engines (~1e-4 flips at 1e-15
    # quanta, measured), but NOT upstream chains like asin whose
    # divergence reaches ~1e-11.
    if xyz is not None:
        cx, cy, cz = (F.col(c) for c in xyz)
    else:
        la, ln = (F.radians(F.col(c)) for c in latlng)
        cx, cy, cz = F.cos(ln) * F.cos(la), F.sin(ln) * F.cos(la), F.sin(la)
    q = events.select(
        user_col,
        F.floor((cx + 1) * qscale).cast("long").alias("qx"),
        F.floor((cy + 1) * qscale).cast("long").alias("qy"),
        F.floor((cz + 1) * qscale).cast("long").alias("qz"),
    )
    m = q.groupBy(user_col).agg(
        F.count(F.lit(1)).alias("_n"),
        F.expr("sum(qx) div count(1)").alias("mx"),
        F.expr("sum(qy) div count(1)").alias("my"),
        F.expr("sum(qz) div count(1)").alias("mz"),
    )
    d2 = (
        q.join(m, user_col)
        .select(
            user_col,
            "_n",
            (
                (F.col("qx") - F.col("mx")) * (F.col("qx") - F.col("mx"))
                + (F.col("qy") - F.col("my")) * (F.col("qy") - F.col("my"))
                + (F.col("qz") - F.col("mz")) * (F.col("qz") - F.col("mz"))
            ).alias("_d2"),
        )
    )
    return (
        d2.groupBy(user_col)
        .agg(
            F.max("_n").alias("n_events"),
            F.sum(F.col("_d2").cast("decimal(38,0)")).alias("_s"),
        )
        .select(
            user_col,
            "n_events",
            F.expr("CAST(_s div n_events AS BIGINT)").alias("msd_q"),
        )
    )
