"""pagerank differential: the DataFrame power iteration must equal a
dense numpy replay of the same spec (teleport + damping + distributed
dangling mass) on graphs with dangling sinks and isolated nodes."""

from __future__ import annotations

import numpy as np
import pytest

from pyspark.sql import functions as F

from geo_spark.operators.linkgraph import pagerank


def _numpy_pagerank(n, edge_list, iters, d=0.85):
    edges = sorted(set((s, t) for s, t in edge_list if s != t))
    outdeg = np.zeros(n)
    for s, _ in edges:
        outdeg[s] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        contrib = np.zeros(n)
        for s, t in edges:
            contrib[t] += r[s] / outdeg[s]
        dangling = r[outdeg == 0].sum()
        r = (1.0 - d) / n + d * (contrib + dangling / n)
    return r


def _spark_pagerank(spark, n, edge_list, iters, **kw):
    edges = spark.createDataFrame(
        [(int(s), int(t)) for s, t in edge_list], "src long, dst long"
    )
    nodes = spark.createDataFrame([(int(i),) for i in range(n)], "id long")
    got = pagerank(edges, nodes, iterations=iters, **kw).collect()
    out = np.zeros(n)
    for r in got:
        out[r["id"]] = r["rank"]
    return out


def test_matches_numpy_with_dangling_and_isolated(spark):
    rng = np.random.default_rng(13)
    n = 60
    # nodes 50..54 dangle (no outlinks); 55..59 are fully isolated
    edge_list = [
        (int(s), int(t))
        for s in range(50)
        for t in rng.integers(0, 55, 3)
    ]
    want = _numpy_pagerank(n, edge_list, 4)
    got = _spark_pagerank(spark, n, edge_list, 4)
    assert np.allclose(got, want, rtol=0, atol=1e-12)
    assert abs(got.sum() - 1.0) < 1e-9  # rank mass conserved


def test_self_loops_and_duplicates_ignored(spark):
    n = 4
    edge_list = [(0, 1), (0, 1), (1, 1), (1, 2), (2, 3), (3, 0)]
    want = _numpy_pagerank(n, edge_list, 3)
    got = _spark_pagerank(spark, n, edge_list, 3)
    assert np.allclose(got, want, rtol=0, atol=1e-12)


def test_tol_early_stop_still_correct(spark):
    # a symmetric cycle converges immediately (uniform is stationary);
    # tol-based stop must return the same uniform vector
    n = 6
    edge_list = [(i, (i + 1) % n) for i in range(n)]
    got = _spark_pagerank(spark, n, edge_list, 10, tol=1e-9)
    assert np.allclose(got, np.full(n, 1.0 / n), atol=1e-12)


def _numpy_bfs(edge_list, seeds, max_hops):
    from collections import deque

    adj = {}
    for s, t in edge_list:
        if s != t:
            adj.setdefault(s, set()).add(t)
    dist = {s: 0 for s in seeds}
    q = deque(seeds)
    while q:
        u = q.popleft()
        if dist[u] >= max_hops:
            continue
        for v in adj.get(u, ()):
            if v not in dist:
                dist[v] = dist[u] + 1
                q.append(v)
    return dist


def _spark_bfs(spark, edge_list, seeds, max_hops):
    from geo_spark.operators.linkgraph import seed_distances

    e = spark.createDataFrame(
        [(int(s), int(t)) for s, t in edge_list], "src long, dst long"
    )
    sd = spark.createDataFrame([(int(s),) for s in seeds], "id long")
    return {
        r["node"]: r["dist"]
        for r in seed_distances(e, sd, max_hops=max_hops).collect()
    }


def test_seed_distances_chain_and_bound(spark):
    # 0->1->2->3->4; seed {0}, max_hops=3: node 4 unlabeled
    edges = [(i, i + 1) for i in range(4)]
    got = _spark_bfs(spark, edges, [0], 3)
    assert got == {0: 0, 1: 1, 2: 2, 3: 3}


def test_seed_distances_multi_source_min(spark):
    # two seeds racing to node 2: min wins; direction respected
    edges = [(0, 1), (1, 2), (5, 2), (2, 0)]
    got = _spark_bfs(spark, edges, [0, 5], 2)
    assert got == {0: 0, 5: 0, 1: 1, 2: 1}


def test_seed_distances_random_differential(spark):
    rng = np.random.default_rng(23)
    for seed in range(3):
        rng = np.random.default_rng(100 + seed)
        edges = [
            (int(a), int(b))
            for a, b in rng.integers(0, 60, (200, 2))
        ]
        seeds = sorted({int(s) for s in rng.integers(0, 60, 4)})
        want = _numpy_bfs(edges, seeds, 3)
        got = _spark_bfs(spark, edges, seeds, 3)
        assert got == want, seed


def _numpy_trustrank(n, edge_list, seeds, iters, d=0.85):
    edges = sorted(set((s, t) for s, t in edge_list if s != t))
    outdeg = np.zeros(n)
    for s, _ in edges:
        outdeg[s] += 1
    v = np.zeros(n)
    v[list(seeds)] = 1.0 / len(seeds)
    r = v.copy()
    for _ in range(iters):
        contrib = np.zeros(n)
        for s, t in edges:
            contrib[t] += r[s] / outdeg[s]
        dangling = r[outdeg == 0].sum()
        r = (1.0 - d) * v + d * (contrib + dangling * v)
    return r


def test_trustrank_matches_numpy_and_zeroes_unreachable(spark):
    from geo_spark.operators.linkgraph import trustrank

    rng = np.random.default_rng(77)
    n = 40
    # component A: nodes 0..19 wired densely; component B: 20..39
    edges = [(int(a), int(b)) for a, b in rng.integers(0, 20, (80, 2))]
    edges += [(int(a) + 20, int(b) + 20) for a, b in rng.integers(0, 20, (80, 2))]
    seeds = [0, 3, 7]  # all in component A
    want = _numpy_trustrank(n, edges, seeds, 3)
    e = spark.createDataFrame(edges, "src long, dst long")
    nodes = spark.createDataFrame([(i,) for i in range(n)], "id long")
    sd = spark.createDataFrame([(s,) for s in seeds], "id long")
    got = {
        r["id"]: r["trust"]
        for r in trustrank(e, nodes, sd, iterations=3).collect()
    }
    for i in range(n):
        assert abs(got[i] - want[i]) < 1e-12, i
    # component B never receives teleport or links -> exactly 0
    assert all(got[i] == 0.0 for i in range(20, 40))


def _lpa_python(n, edge_list, iterations):
    """Synchronous min-tiebreak LPA replay (exact spec)."""
    und = set()
    for s, d in edge_list:
        if s != d:
            und.add((s, d))
            und.add((d, s))
    nbrs = {}
    for s, d in und:
        nbrs.setdefault(s, []).append(d)
    labels = {i: i for i in range(n)}
    for _ in range(iterations):
        new = {}
        for i in range(n):
            ns = nbrs.get(i)
            if not ns:
                new[i] = labels[i]
                continue
            cnt = {}
            for j in ns:
                cnt[labels[j]] = cnt.get(labels[j], 0) + 1
            best = max(cnt.items(), key=lambda kv: (kv[1], -kv[0]))
            new[i] = best[0]
        labels = new
    return labels


def test_label_propagation_two_cliques(spark):
    """Two 5-cliques joined by one bridge edge: LPA labels each clique
    with its min id."""
    from geo_spark.operators.linkgraph import label_propagation

    edges = [(a, b) for a in range(5) for b in range(5) if a != b]
    edges += [(a, b) for a in range(5, 10) for b in range(5, 10) if a != b]
    edges.append((4, 5))
    e = spark.createDataFrame(edges, "src long, dst long")
    nodes = spark.range(10).select(F.col("id"))
    got = {
        r["id"]: r["label"]
        for r in label_propagation(e, nodes, iterations=3).collect()
    }
    assert got == _lpa_python(10, edges, 3)
    assert set(got[i] for i in range(5)) == {0}
    assert set(got[i] for i in range(5, 10)) == {5}


def test_label_propagation_random_matches_python(spark):
    from geo_spark.operators.linkgraph import label_propagation

    rng = np.random.default_rng(23)
    n = 60
    for seed in range(3):
        rng = np.random.default_rng(23 + seed)
        edges = [
            (int(a), int(b))
            for a, b in rng.integers(0, n, (150, 2))
        ]
        e = spark.createDataFrame(edges, "src long, dst long")
        nodes = spark.range(n).select(F.col("id"))
        got = {
            r["id"]: r["label"]
            for r in label_propagation(e, nodes, iterations=2).collect()
        }
        assert got == _lpa_python(n, edges, 2), seed


def test_label_propagation_isolated_nodes_keep_label(spark):
    from geo_spark.operators.linkgraph import label_propagation

    e = spark.createDataFrame([(0, 1)], "src long, dst long")
    nodes = spark.range(4).select(F.col("id"))
    got = {
        r["id"]: r["label"]
        for r in label_propagation(e, nodes, iterations=3).collect()
    }
    assert got[2] == 2 and got[3] == 3
    # the 2-node pair oscillates under SYNCHRONOUS propagation (swap
    # each round) — that's the spec, replayed exactly:
    assert {k: got[k] for k in (0, 1)} == {
        k: v for k, v in _lpa_python(4, [(0, 1)], 3).items() if k < 2
    }


def _brute_kcore(edge_list, k):
    """Python peel-to-fixpoint oracle on an undirected simple graph."""
    und = {tuple(sorted(e)) for e in edge_list if e[0] != e[1]}
    while True:
        deg = {}
        for u, v in und:
            deg[u] = deg.get(u, 0) + 1
            deg[v] = deg.get(v, 0) + 1
        drop = {n for n, d in deg.items() if d < k}
        if not drop:
            return deg
        und = {(u, v) for u, v in und if u not in drop and v not in drop}


def _run_kcore(spark, edge_list, k):
    from geo_spark.operators.linkgraph import kcore

    df = spark.createDataFrame(
        [(int(a), int(b)) for a, b in edge_list], "src long, dst long"
    )
    return {
        r["node"]: r["core_deg"] for r in kcore(df, k=k).collect()
    }


def test_kcore_clique_survives_tree_peels(spark):
    clique = [(i, j) for i in range(5) for j in range(i + 1, 5)]
    tree = [(100 + i, 100 + 2 * i + 1) for i in range(10)] + [
        (100 + i, 100 + 2 * i + 2) for i in range(10)
    ]
    got = _run_kcore(spark, clique + tree, k=3)
    # the 5-clique is a 4-core; every tree node peels (trees are 1-degenerate)
    assert got == {i: 4 for i in range(5)}


def test_kcore_star_peels_to_empty(spark):
    star = [(0, i) for i in range(1, 30)]
    assert _run_kcore(spark, star, k=2) == {}


def test_kcore_random_differential(spark):
    rng = np.random.default_rng(23)
    n = 120
    edges = [
        (int(a), int(b))
        for a, b in zip(rng.integers(0, n, 700), rng.integers(0, n, 700))
    ]
    # duplicates + reversed duplicates + self-loops must all collapse
    edges += [(b, a) for a, b in edges[:50]] + [(7, 7), (9, 9)]
    for k in (2, 3, 5, 8):
        assert _run_kcore(spark, edges, k) == _brute_kcore(edges, k)


def test_kcore_nested_cores(spark):
    # a 6-clique glued by one edge to a 4-clique: k=3 keeps both,
    # k=5 keeps only the 6-clique with its internal degrees
    six = [(i, j) for i in range(6) for j in range(i + 1, 6)]
    four = [(10 + i, 10 + j) for i in range(4) for j in range(i + 1, 4)]
    glue = [(0, 10)]
    edges = six + four + glue
    assert _run_kcore(spark, edges, 3) == _brute_kcore(edges, 3)
    got5 = _run_kcore(spark, edges, 5)
    assert got5 == {i: 5 for i in range(6)}


def _brute_cocitation(edge_list, min_common, max_df):
    e = {(s, t) for s, t in edge_list if s != t}
    if max_df is not None:
        od = {}
        for s, _ in e:
            od[s] = od.get(s, 0) + 1
        e = {(s, t) for s, t in e if od[s] <= max_df}
    cited = {}
    for _, t in e:
        cited[t] = cited.get(t, 0) + 1
    from collections import defaultdict

    outs = defaultdict(set)
    for s, t in e:
        outs[s].add(t)
    pairs = defaultdict(int)
    for s, ts in outs.items():
        ts = sorted(ts)
        for i in range(len(ts)):
            for j in range(i + 1, len(ts)):
                pairs[(ts[i], ts[j])] += 1
    return {
        (a, b): (c, cited[a], cited[b])
        for (a, b), c in pairs.items()
        if c >= min_common
    }


def test_cocitation_random_differential(spark):
    from geo_spark.operators.linkgraph import cocitation_pairs

    rng = np.random.default_rng(31)
    edges = [
        (int(a), int(b))
        for a, b in zip(rng.integers(0, 40, 400), rng.integers(0, 40, 400))
    ] + [(5, 5)]
    df = spark.createDataFrame(edges, "src long, dst long")
    for max_df in (None, 6):
        got = {
            (r["a"], r["b"]): (r["n_common"], r["cited_a"], r["cited_b"])
            for r in cocitation_pairs(df, min_common=2, max_df=max_df).collect()
        }
        assert got == _brute_cocitation(edges, 2, max_df)


def test_cocitation_valve_drops_hub_evidence(spark):
    from geo_spark.operators.linkgraph import cocitation_pairs

    # citer 0 cites 10 targets (hub); citers 1,2 cite {100, 101}
    edges = [(0, 100 + i) for i in range(10)]
    edges += [(1, 100), (1, 101), (2, 100), (2, 101)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        (r["a"], r["b"]): (r["n_common"], r["cited_a"], r["cited_b"])
        for r in cocitation_pairs(df, min_common=2, max_df=5).collect()
    }
    # hub 0's evidence is gone: pair (100,101) counted by citers 1,2
    # only, and cited degrees exclude the hub's citations too
    assert got == {(100, 101): (2, 2, 2)}


def _brute_dijkstra(edge_list, seeds):
    import heapq
    from collections import defaultdict

    adj = defaultdict(dict)
    for s, t, w in edge_list:
        if s != t and (t not in adj[s] or w < adj[s][t]):
            adj[s][t] = w
    dist = {s: 0 for s in seeds}
    pq = [(0, s) for s in seeds]
    heapq.heapify(pq)
    while pq:
        d, u = heapq.heappop(pq)
        if d > dist.get(u, float("inf")):
            continue
        for v, w in adj[u].items():
            nd = d + w
            if nd < dist.get(v, float("inf")):
                dist[v] = nd
                heapq.heappush(pq, (nd, v))
    return dist


def test_weighted_distances_random_differential(spark):
    from geo_spark.operators.linkgraph import weighted_distances

    rng = np.random.default_rng(37)
    n = 60
    edges = [
        (int(a), int(b), int(w))
        for a, b, w in zip(
            rng.integers(0, n, 400),
            rng.integers(0, n, 400),
            rng.integers(1, 20, 400),
        )
    ]
    # parallel edges with different weights: min must win
    edges += [(0, 1, 100), (0, 1, 2)]
    seeds = [0, 7]
    edf = spark.createDataFrame(edges, "src long, dst long, w long")
    sdf = spark.createDataFrame([(s,) for s in seeds], "id long")
    got = {
        r["node"]: r["dist"]
        for r in weighted_distances(edf, sdf, rounds=n).collect()
    }
    assert got == _brute_dijkstra(edges, seeds)


def test_weighted_distances_improvement_after_first_reach(spark):
    from geo_spark.operators.linkgraph import weighted_distances

    # direct heavy edge 0->3 (w=10) is reached in round 1; the light
    # 3-hop chain 0->1->2->3 (w=3) must REPLACE it in later rounds —
    # the case hop-BFS first-reach labeling gets wrong
    edges = [(0, 3, 10), (0, 1, 1), (1, 2, 1), (2, 3, 1)]
    edf = spark.createDataFrame(edges, "src long, dst long, w long")
    sdf = spark.createDataFrame([(0,)], "id long")
    got = {
        r["node"]: r["dist"]
        for r in weighted_distances(edf, sdf, rounds=4).collect()
    }
    assert got == {0: 0, 1: 1, 2: 2, 3: 3}
    # with rounds=1 the heavy edge's label stands (Bellman-Ford bound)
    got1 = {
        r["node"]: r["dist"]
        for r in weighted_distances(edf, sdf, rounds=1).collect()
    }
    assert got1[3] == 10


def _brute_resolve(edge_list, rounds):
    f = {}
    for s, t in edge_list:
        if s != t and (s not in f or t < f[s]):
            f[s] = t
    nodes = set(f) | set(f.values())
    out = {}
    for n in sorted(nodes):
        t, h = n, 0
        for _ in range(2**rounds):
            if t not in f:
                break
            t, h = f[t], h + 1
        out[n] = (t, h, t not in f)
    return out


def test_resolve_redirects_random_differential(spark):
    from geo_spark.operators.linkgraph import resolve_redirects

    rng = np.random.default_rng(11)
    n = 80
    edges = [
        (int(a), int(b))
        for a, b in zip(rng.integers(0, n, 150), rng.integers(0, n, 150))
    ]
    # parallel out-edges: min destination must win; self-loop dropped
    edges += [(0, 70), (0, 5), (3, 3)]
    edf = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r["node"]: (r["target"], r["hops"], r["resolved"])
        for r in resolve_redirects(edf, rounds=3).collect()
    }
    assert got == _brute_resolve(edges, 3)


def test_resolve_redirects_chain_cycle_feeder(spark):
    from geo_spark.operators.linkgraph import resolve_redirects

    # chain 4->3->2->1->0 (terminal 0); 2-cycle 10<->11 with feeder
    # 12->11; over-budget chain 20..26 -> 27 needs 7 hops (> 2^2=4)
    edges = (
        [(i, i - 1) for i in range(1, 5)]
        + [(10, 11), (11, 10), (12, 11)]
        + [(20 + i, 21 + i) for i in range(7)]
    )
    edf = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r["node"]: (r["target"], r["hops"], r["resolved"])
        for r in resolve_redirects(edf, rounds=2).collect()
    }
    assert got[4] == (0, 4, True)
    assert got[0] == (0, 0, True)  # terminal resolves to itself
    # cycle members: 4 edges walked, still on the cycle, unresolved
    assert got[10] == (10, 4, False)
    assert got[11] == (11, 4, False)
    assert got[12] == (10, 4, False)  # feeder lands inside the cycle
    # over-budget acyclic chain: deterministic 4-edge iterate, flagged
    assert got[20] == (24, 4, False)
    assert got[23] == (27, 4, True)  # within budget resolves
    # rounds=3 (2^3=8) resolves the whole 7-hop chain
    got3 = {
        r["node"]: (r["target"], r["hops"], r["resolved"])
        for r in resolve_redirects(edf, rounds=3).collect()
    }
    assert got3[20] == (27, 7, True)


def test_pagerank_lineage_cut_cadence_bounds_construction_jobs(spark):
    """Pin the lineage-cut-cadence contract (round-3 verdict task #4):
    building a K-iteration plan with no cut due (final round never
    cut) launches only the setup jobs (the node/seed-count
    aggregates), independent of K — no per-round driver sync.  Above
    the cadence, job count grows with the number of CUTS, each cut's
    job cost bounded (not exponential in K)."""
    from geo_spark.operators.linkgraph import hits, trustrank

    sc = spark.sparkContext
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 0), (2, 3)], "src long, dst long"
    )
    nodes = spark.createDataFrame([(i,) for i in range(5)], "id long")

    probe_seq = [0]

    def jobs_during(f):
        # NOT id(f): a GC'd lambda's address is reused by the next one,
        # colliding the job-group names and merging both runs' counts
        probe_seq[0] += 1
        group = f"plan-jobs-{probe_seq[0]}"
        sc.setJobGroup(group, "plan construction probe")
        try:
            f()
        finally:
            sc.setJobGroup(None, None)
        return len(sc.statusTracker().getJobIdsForGroup(group))

    # no cut due (K <= cadence, or only the skipped final-round cut):
    # constant setup-only job count, independent of K
    for op, kw, lo, hi in [
        (pagerank, {}, 1, 2),            # cadence 2: K=2's round-2 cut is
        (trustrank, {"seeds": nodes.limit(2)}, 1, 2),  # final -> skipped
        (hits, {}, 1, 1),                # cadence 1: K=1 has no mid round
    ]:
        j_lo = jobs_during(lambda: op(edges, nodes, iterations=lo, **kw))
        j_hi = jobs_during(lambda: op(edges, nodes, iterations=hi, **kw))
        assert j_hi == j_lo, (
            f"{op.__name__}: {j_lo} jobs at K={lo} vs {j_hi} at K={hi}"
        )
        assert j_lo <= 3, f"{op.__name__}: {j_lo} setup jobs at K={lo}"

    # above the cadence: pagerank K=4 runs one mid-loop cut (round 2),
    # K=6 runs two (rounds 2, 4; final round never cut).  Each cut's
    # job cost is bounded — job count is linear in cuts, not in K and
    # not exponential in plan depth.
    j2 = jobs_during(lambda: pagerank(edges, nodes, iterations=2))
    j4 = jobs_during(lambda: pagerank(edges, nodes, iterations=4))
    j6 = jobs_during(lambda: pagerank(edges, nodes, iterations=6))
    assert j4 > j2, "expected one cut's jobs at K=4"
    assert j4 - j2 <= 40, f"K=4 ran {j4 - j2} extra jobs — more than one cut"
    assert j6 - j4 <= (j4 - j2) + 6, (
        f"second cut cost {j6 - j4} jobs vs first {j4 - j2} — growing per cut"
    )
