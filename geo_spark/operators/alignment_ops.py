"""Trajectory alignment operators: DTW pair costs and per-group medoids.

Spark surface over the alignment kernel (kernel/alignment.py; reference
s2/polyline_alignment.go:24-508 + the C++ approx recursion the Go port
stubs).  Shapes:

* ``dtw_pair_costs`` — given candidate (aid, bid) pairs (typically the
  output of a covering-term candidate join or a within-distance join),
  compute the optimal alignment cost per pair inside ``mapInPandas``
  batches.  Chains travel as a closure (same gated pattern as
  ``crossing_edge_join``); the per-pair DP is O(n*m) exact or
  O(n*radius) windowed.
* ``dtw_medoid_per_group`` — for a DataFrame of (group, traj_id,
  ordered vertices), pick each group's medoid trajectory (the one
  minimizing summed alignment cost to the rest, GetMedoidPolyline
  semantics) with one ``applyInPandas`` task per group.  Groups
  parallelize across executors; all-pairs cost stays inside one task, so
  keep per-group cardinality bounded (the operator enforces a cap) —
  the 100 TB shape is many groups, not one huge group.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from geo_spark.kernel.alignment import (
    approx_alignment_cost,
    exact_alignment_cost,
    medoid_index,
)

MAX_GROUP_TRAJS = 256  # all-pairs guard inside one medoid task


def dtw_pair_costs(
    pairs: DataFrame,
    chains: dict[int, np.ndarray],
    radius: int | None = None,
) -> DataFrame:
    """(aid, bid, dtw_cost) for every input pair; ``radius=None`` runs
    the exact DP, otherwise the windowed approximation."""
    chain_map = {int(k): np.asarray(v, dtype=np.float64) for k, v in chains.items()}

    def fn(batches):
        for pdf in batches:
            costs = []
            for aid, bid in zip(pdf["aid"].to_numpy(), pdf["bid"].to_numpy()):
                a = chain_map[int(aid)]
                b = chain_map[int(bid)]
                if radius is None:
                    costs.append(exact_alignment_cost(a, b))
                else:
                    costs.append(approx_alignment_cost(a, b, radius))
            yield pd.DataFrame(
                {
                    "aid": pdf["aid"].astype("int64"),
                    "bid": pdf["bid"].astype("int64"),
                    "dtw_cost": pd.Series(costs, dtype="float64"),
                }
            )

    return pairs.select("aid", "bid").mapInPandas(
        fn, "aid long, bid long, dtw_cost double"
    )


def frechet_pair_costs(
    pairs: DataFrame,
    chains: dict[int, np.ndarray],
) -> DataFrame:
    """(aid, bid, frechet_cost): discrete Fréchet distance per candidate
    pair — same gated closure/mapInPandas shape as :func:`dtw_pair_costs`
    (kernel/alignment.py:frechet_distance)."""
    from geo_spark.kernel.alignment import frechet_distance

    chain_map = {int(k): np.asarray(v, dtype=np.float64) for k, v in chains.items()}

    def fn(batches):
        for pdf in batches:
            costs = [
                frechet_distance(chain_map[int(a)], chain_map[int(b)])
                for a, b in zip(pdf["aid"].to_numpy(), pdf["bid"].to_numpy())
            ]
            yield pd.DataFrame(
                {
                    "aid": pdf["aid"].astype("int64"),
                    "bid": pdf["bid"].astype("int64"),
                    "frechet_cost": pd.Series(costs, dtype="float64"),
                }
            )

    return pairs.select("aid", "bid").mapInPandas(
        fn, "aid long, bid long, frechet_cost double"
    )


def dtw_medoid_per_group(
    trajs: DataFrame,
    group_col: str = "group",
    id_col: str = "traj_id",
    radius: int | None = 8,
) -> DataFrame:
    """One row per group: (group, medoid_traj_id, total_cost).

    Input rows: (group, traj_id, seq, lat, lng) — one row per vertex,
    ``seq`` ordering vertices within a trajectory.
    """
    from geo_spark.kernel import cellid as ck

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        grp = pdf[group_col].iloc[0]
        chains = []
        ids = []
        for tid, tdf in pdf.groupby(id_col):
            tdf = tdf.sort_values("seq")
            x, y, z = ck.latlng_to_xyz(
                tdf["lat"].to_numpy(np.float64), tdf["lng"].to_numpy(np.float64)
            )
            chains.append(np.stack([x, y, z], axis=1))
            ids.append(int(tid))
        if len(chains) > MAX_GROUP_TRAJS:
            raise ValueError(
                f"group {grp!r} has {len(chains)} trajectories "
                f"(> {MAX_GROUP_TRAJS}); pre-bucket or sample the group"
            )
        if len(chains) == 1:
            return pd.DataFrame(
                {group_col: [grp], "medoid_traj_id": ids, "total_cost": [0.0]}
            )
        k = len(chains)
        totals = np.zeros(k)
        for i in range(k):
            for j in range(i + 1, k):
                if radius is None:
                    c = exact_alignment_cost(chains[i], chains[j])
                else:
                    c = approx_alignment_cost(chains[i], chains[j], radius)
                totals[i] += c
                totals[j] += c
        best = int(np.argmin(totals))
        return pd.DataFrame(
            {
                group_col: [grp],
                "medoid_traj_id": [ids[best]],
                "total_cost": [float(totals[best])],
            }
        )

    out_schema = f"{group_col} string, medoid_traj_id long, total_cost double"
    return trajs.groupBy(group_col).applyInPandas(fn, out_schema)


__all__ = ["dtw_pair_costs", "frechet_pair_costs", "dtw_medoid_per_group", "medoid_index", "MAX_GROUP_TRAJS"]
