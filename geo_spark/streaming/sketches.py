"""Streaming KMV distinct-count sketch per tile.

The streaming twin of operators/sketches.kmv_distinct: state per tile is
the k smallest distinct hashes seen so far (a bounded long array — the
whole point of the sketch is that streaming distinct-count state does
NOT grow with the value set), merged per micro-batch inside
``applyInPandasWithState``.  Emits the refreshed (n_kept, kth_hash,
est_distinct) row for every tile touched by the batch ("update"
semantics); the estimator is the same integer floor-division as batch,
so on a drained source the final rows equal the batch operator's output
row-for-row (asserted in tests).
"""

from __future__ import annotations

from typing import Any, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from geo_spark.operators.sketches import KMV_HASH_SQL, _KMV_RANGE

OUTPUT_SCHEMA = "tile long, n_kept long, kth_hash long, est_distinct long"
STATE_SCHEMA = "hashes array<long>"


def stream_tile_kmv(
    tiled: DataFrame,
    k: int = 32,
    tile_col: str = "tile",
    value_col: str = "user_id",
) -> DataFrame:
    """tiled(tile, value) stream -> per-tile KMV estimate rows.

    The input must already carry the tile key (use the same codegen
    tiling exprs as batch); the hash is applied here so batch and
    stream share one definition."""
    from pyspark.sql import functions as F

    hashed = tiled.select(
        F.col(tile_col).alias("tile"),
        F.expr(KMV_HASH_SQL.format(v=value_col)).alias("h"),
    )

    def fn(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        batch = pd.concat(list(pdfs))
        hs = np.unique(batch["h"].to_numpy(np.int64))
        if state.exists:
            (old,) = state.get
            hs = np.union1d(np.asarray(old, dtype=np.int64), hs)
        hs = hs[:k]
        state.update((hs.tolist(),))
        n_kept = len(hs)
        kth = int(hs[-1]) if n_kept else 0
        est = (
            n_kept
            if n_kept < k
            else ((k - 1) * _KMV_RANGE) // kth
        )
        yield pd.DataFrame(
            {
                "tile": [key[0]],
                "n_kept": [n_kept],
                "kth_hash": [kth],
                "est_distinct": [est],
            }
        )

    return hashed.groupBy("tile").applyInPandasWithState(
        fn,
        OUTPUT_SCHEMA,
        STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )


CMS_OUTPUT_SCHEMA = "grp string, item long, est_count long"
CMS_STATE_SCHEMA = "counters array<long>"


def stream_cms_estimates(
    stream: DataFrame,
    probe_items: list[int],
    depth: int = 3,
    width: int = 256,
    group_col: str = "grp",
    item_col: str = "item",
) -> DataFrame:
    """Streaming Count-Min twin of operators/sketches.cms_sketch: state
    per group is the depth x width counter matrix (flattened long array
    — FIXED size no matter how many distinct items flow through, the
    CMS contract), incremented per micro-batch inside
    ``applyInPandasWithState``.  Each update emits the refreshed
    estimate (min over rows) for every ``probe_items`` entry, so on a
    drained source the final row per (group, item) equals the batch
    sketch's probe read bit-for-bit (asserted in tests).

    The (d, bucket) positions are computed UPSTREAM by the same
    md5_mod_sql expressions batch uses — one hash definition, shared;
    probe positions are precomputed driver-side with hashlib (pinned
    equal to the SQL hash in tests/test_sketches.py)."""
    import hashlib

    from pyspark.sql import functions as F

    from geo_spark.operators.sketches import md5_mod_sql

    pos = stream.select(
        F.col(group_col).alias("grp"),
        F.explode(
            F.array(
                *[
                    F.expr(
                        f"cast({d} * {width} + "
                        f"{md5_mod_sql(item_col, f'cms{d}', width)} as long)"
                    )
                    for d in range(depth)
                ]
            )
        ).alias("flat"),
    )

    probe_pos = {
        int(it): [
            d * width
            + int(
                hashlib.md5(f"cms{d}:{int(it)}".encode()).hexdigest()[:13],
                16,
            )
            % width
            for d in range(depth)
        ]
        for it in probe_items
    }

    def fn(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        batch = pd.concat(list(pdfs))
        counters = np.zeros(depth * width, dtype=np.int64)
        if state.exists:
            (old,) = state.get
            counters += np.asarray(old, dtype=np.int64)
        counters += np.bincount(
            batch["flat"].to_numpy(np.int64), minlength=depth * width
        )
        state.update((counters.tolist(),))
        items = sorted(probe_pos)
        ests = [int(counters[probe_pos[it]].min()) for it in items]
        yield pd.DataFrame(
            {
                "grp": [key[0]] * len(items),
                "item": items,
                "est_count": ests,
            }
        )

    return pos.groupBy("grp").applyInPandasWithState(
        fn,
        CMS_OUTPUT_SCHEMA,
        CMS_STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )

HH_OUTPUT_SCHEMA = "grp string, item long, est_count long"
HH_STATE_SCHEMA = (
    "counters array<long>, cand array<long>, cand_pos array<long>"
)


def stream_cms_heavy_hitters(
    stream: DataFrame,
    threshold: int,
    depth: int = 3,
    width: int = 256,
    candidate_cap: int = 1024,
    group_col: str = "grp",
    item_col: str = "item",
) -> DataFrame:
    """Streaming heavy-hitter emission with candidate tracking — the
    streaming twin of operators/sketches.cms_heavy_hitters' sketch cut.

    State per group stays FIXED-SIZE: the depth x width Count-Min
    counters plus a bounded candidate list (items whose CMS estimate
    has reached ``threshold``, with their probe positions so absent
    items keep re-estimating).  Every micro-batch increments the
    counters, folds the batch's items into the candidate pool, drops
    candidates below threshold (none ever leave — CMS estimates are
    monotone nondecreasing — the drop only prunes batch items that
    never qualified), and emits (grp, item, est_count) for every
    tracked candidate ("update" semantics).

    Guarantees (the cms_heavy_hitters contract, shifted to streams):
    every TRUE heavy hitter (exact count >= threshold) is tracked by
    the batch of its last occurrence — at that point est >= its full
    exact count >= threshold — so the drained candidate set is a
    superset of the true heavies, and a downstream exact refine makes
    the pipeline exact (asserted against batch cms_heavy_hitters in
    tests).  Estimates equal the batch sketch's probe reads bit-for-bit
    on a drained source.  ``candidate_cap`` is the memory valve: if
    more than cap candidates qualify, the top cap by (est desc, item
    asc) are kept and the superset guarantee degrades to top-cap —
    size the cap to eps-heavy-hitter theory (true heavies <= 1/eps
    when threshold = eps*N, plus CMS collision slack)."""
    import hashlib  # noqa: F401  (parity with stream_cms_estimates imports)

    from pyspark.sql import functions as F

    from geo_spark.operators.sketches import md5_mod_sql

    pos = stream.select(
        F.col(group_col).alias("grp"),
        F.col(item_col).cast("long").alias("item"),
        F.array(
            *[
                F.expr(
                    f"cast({d} * {width} + "
                    f"{md5_mod_sql(item_col, f'cms{d}', width)} as long)"
                )
                for d in range(depth)
            ]
        ).alias("pos"),
    )

    def fn(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        batch = pd.concat(list(pdfs))
        counters = np.zeros(depth * width, dtype=np.int64)
        tracked: dict[int, list[int]] = {}
        if state.exists:
            old_counters, cand, cand_pos = state.get
            counters += np.asarray(old_counters, dtype=np.int64)
            for i, it in enumerate(cand):
                tracked[int(it)] = [
                    int(p) for p in cand_pos[i * depth : (i + 1) * depth]
                ]
        flat = np.concatenate(batch["pos"].to_numpy()).astype(np.int64)
        counters += np.bincount(flat, minlength=depth * width)
        for it, ps in zip(batch["item"], batch["pos"]):
            tracked.setdefault(int(it), [int(p) for p in ps])
        ests = {
            it: int(counters[ps].min()) for it, ps in tracked.items()
        }
        keep = sorted(
            (it for it, e in ests.items() if e >= threshold),
            key=lambda it: (-ests[it], it),
        )[:candidate_cap]
        keep.sort()
        state.update(
            (
                counters.tolist(),
                keep,
                [p for it in keep for p in tracked[it]],
            )
        )
        yield pd.DataFrame(
            {
                "grp": [key[0]] * len(keep),
                "item": keep,
                "est_count": [ests[it] for it in keep],
            }
        )

    return pos.groupBy("grp").applyInPandasWithState(
        fn,
        HH_OUTPUT_SCHEMA,
        HH_STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )

HLL_OUTPUT_SCHEMA = "grp string, n_regs long, est_distinct long"
HLL_STATE_SCHEMA = "js array<long>, regs array<long>"


def stream_hll_distinct(
    stream: DataFrame,
    p: int = 6,
    group_col: str = "grp",
    value_col: str = "v",
) -> DataFrame:
    """Streaming HyperLogLog twin of operators/sketches.hll_distinct:
    state per group is the occupied (j, reg) register pairs (bounded by
    2^p cells — the HLL contract), MAX-merged per micro-batch inside
    ``applyInPandasWithState``; each update emits the refreshed
    integer estimate, so on a drained source the final row per group
    equals the batch operator bit-for-bit (asserted in tests).

    The (j, rank) pair is computed UPSTREAM by the same md5_52_sql +
    bin-length expressions batch uses — one hash definition, shared
    (the stream_cms_estimates discipline)."""
    from pyspark.sql import functions as F

    from geo_spark.operators.sketches import _hll_alpha_ppm, md5_52_sql

    m = 1 << p
    r_bits = 52 - p
    pow_top = 1 << (r_bits + 1)
    alpha_n = (_hll_alpha_ppm(m) * m * m * pow_top) // 1_000_000

    h = F.expr(md5_52_sql(value_col, "hll"))
    base = stream.select(F.col(group_col).alias("grp"), h.alias("_h"))
    w = F.expr(f"_h div {m}")
    rank = (
        F.when(w == 0, F.lit(r_bits + 1))
        .otherwise(F.lit(r_bits + 1) - F.length(F.bin(w)))
        .cast("long")
    )
    pos = base.select(
        "grp", (F.col("_h") % m).alias("j"), rank.alias("rnk")
    )

    def fn(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        batch = pd.concat(list(pdfs))
        regs: dict[int, int] = {}
        if state.exists:
            js, rs = state.get
            regs = dict(zip((int(x) for x in js), (int(x) for x in rs)))
        for j, r in zip(
            batch["j"].to_numpy(np.int64), batch["rnk"].to_numpy(np.int64)
        ):
            j = int(j)
            if r > regs.get(j, 0):
                regs[j] = int(r)
        js = sorted(regs)
        state.update((js, [regs[j] for j in js]))
        s = sum(1 << (r_bits + 1 - regs[j]) for j in js)
        s += (m - len(js)) * pow_top
        yield pd.DataFrame(
            {
                "grp": [key[0]],
                "n_regs": [len(js)],
                "est_distinct": [alpha_n // s],
            }
        )

    return pos.groupBy("grp").applyInPandasWithState(
        fn,
        HLL_OUTPUT_SCHEMA,
        HLL_STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )
