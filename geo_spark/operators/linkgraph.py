"""Link-graph quality signals for web corpora: PageRank over a url/host
edge list.

Corpus curation at Common-Crawl scale weighs documents by link-graph
centrality (OPIC / PageRank / harmonic variants); this module gives the
engine that signal as a first-class DataFrame operator.  No reference
analog (akhenakh/geo is geometry-only) — this extends the webtext half
of the north rule alongside operators/webcorpus.py.

Scale shape:

- **One shuffle per iteration.**  Each power-iteration step is
  contributions = edges x ranks (equi-join on src, co-partitioned by the
  join key) -> groupBy(dst).sum (map-side combined).  The edge list is
  joined against the *previous* rank vector only — no growing state.
- **Out-degrees are fused into the edge list once** (``rank/deg`` needs
  deg; pre-joining avoids a second per-iteration join), and the fused
  edge table is cached: iterations re-scan it from memory/disk cache,
  the classic Spark iterative-workload shape.
- **Dangling mass stays distributed**: the sum of ranks of zero-outlink
  nodes is a 1-row aggregate cross-joined (broadcast) back in — no
  ``collect`` in the loop, so the whole K-iteration plan is lazy until
  the caller acts.
- **Lineage-cut CADENCE, not per-round driver sync**: rank vectors are
  localCheckpoint-ed every ``lineage_cut_every`` rounds instead of every
  round.  Under AQE even a lazy ``localCheckpoint(eager=False)``
  materializes every shuffle stage of the plan-so-far at CALL time
  (AdaptiveSparkPlanExec.execute() runs the stage jobs), so per-round
  checkpoints cost one driver sync + full materialization per round.
  Between cuts the plan nests (the rank vector is referenced twice per
  round: contributions + dangling mass), doubling logical-plan size per
  uncut round — and MEASUREMENT shows AQE does NOT collapse those
  duplicated subtrees back (self-reference dedup re-aliases them), so
  the cadence is a genuine trade: fewer driver syncs vs 2^cadence
  duplicated work between cuts.  The measured optimum is cadence 2 for
  the single-vector loops (pagerank/trustrank: ~1.5x faster than
  per-round at K=3) and cadence 1 for hits (two half-steps/round make
  anything deeper exponential) — with one JOINT cut per boundary, never
  one per vector.  The final round is never cut (the caller's action
  is its materialization).

The fixed iteration count is a hyperparameter (rank deltas decay
geometrically by the damping factor); convergence-threshold loops add a
per-iteration driver action for the delta norm — supported via
``tol`` but off by default to keep the plan action-free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from geo_spark.plans.checkpoints import free_local_checkpoint


def hits(
    edges: DataFrame,
    nodes: DataFrame,
    iterations: int = 3,
    src: str = "src",
    dst: str = "dst",
    node_key: str = "id",
    lineage_cut_every: int = 1,
) -> DataFrame:
    """HITS hubs & authorities (Kleinberg 1999) with L1 normalization:
    a_k = normalize(E^T h_{k-1}), h_k = normalize(E a_k) — the
    complementary link signal to PageRank (a page can be a poor
    authority but a great hub, e.g. a link directory).

    Same scale discipline as :func:`pagerank`: edges deduped/self-loop
    free and persisted; each half-step is ONE keyed shuffle
    (join on the edge key -> groupBy sum, map-side combined) plus a
    1-row normalization aggregate broadcast back; rank vectors are
    lineage-cut every ``lineage_cut_every`` rounds (module docstring) —
    cadence 1 here (one JOINT hub+auth cut per round, still half the
    old two-checkpoints-per-round protocol) because each round
    references the previous vector through two half-steps: 4x plan
    growth per uncut round, measured exponential past cadence 1.
    Returns (node_key, hub, auth); isolated nodes score 0.0."""
    n = nodes.count()
    e = (
        edges.select(F.col(src).alias("_src"), F.col(dst).alias("_dst"))
        .where(F.col("_src") != F.col("_dst"))
        .distinct()
        .persist()
    )
    ids = nodes.select(F.col(node_key).alias("_id"))
    hub = ids.withColumn("_h", F.lit(1.0 / n))
    auth = ids.withColumn("_a", F.lit(0.0))
    prev_cut = None

    for _i in range(iterations):
        araw = (
            e.join(hub, F.col("_src") == F.col("_id"))
            .groupBy("_dst")
            .agg(F.sum("_h").alias("_ar"))
        )
        atot = araw.agg(
            F.coalesce(F.sum("_ar"), F.lit(1.0)).alias("_t")
        )
        auth = (
            ids.join(F.broadcast(atot))
            .join(araw, F.col("_id") == F.col("_dst"), "left")
            .select(
                "_id",
                (F.coalesce(F.col("_ar"), F.lit(0.0)) / F.col("_t")).alias("_a"),
            )
        )
        hraw = (
            e.join(auth, F.col("_dst") == F.col("_id"))
            .groupBy("_src")
            .agg(F.sum("_a").alias("_hr"))
        )
        htot = hraw.agg(
            F.coalesce(F.sum("_hr"), F.lit(1.0)).alias("_t")
        )
        hub = (
            ids.join(F.broadcast(htot))
            .join(hraw, F.col("_id") == F.col("_src"), "left")
            .select(
                "_id",
                (F.coalesce(F.col("_hr"), F.lit(0.0)) / F.col("_t")).alias("_h"),
            )
        )
        if (_i + 1) % lineage_cut_every == 0 and (_i + 1) < iterations:
            # cut ONE joined frame and re-project: hub's plan embeds
            # auth's, so cutting them separately would materialize the
            # chain twice (the weighted_distances merge-cut pattern)
            both = hub.join(auth, "_id").localCheckpoint()
            # the cut before last has no consumer once this one is
            # materialized — release its executor blocks
            free_local_checkpoint(prev_cut)
            prev_cut = both
            hub = both.select("_id", "_h")
            auth = both.select("_id", "_a")
    e.unpersist()
    return (
        hub.join(auth, "_id")
        .select(
            F.col("_id").alias(node_key),
            F.col("_h").alias("hub"),
            F.col("_a").alias("auth"),
        )
    )


def pagerank(
    edges: DataFrame,
    nodes: DataFrame,
    iterations: int = 3,
    damping: float = 0.85,
    src: str = "src",
    dst: str = "dst",
    node_key: str = "id",
    tol: float | None = None,
    lineage_cut_every: int = 2,
) -> DataFrame:
    """(node_key, rank) after ``iterations`` power steps of
    rank = (1-d)/N + d * (in-contributions + dangling_mass/N).

    ``edges`` is deduplicated and self-loops are dropped (a self-loop
    is rank recycling, not linking).  ``nodes`` fixes the vertex set —
    isolated nodes keep receiving the teleport share.  With ``tol``
    set, iteration stops early once the L1 rank delta falls below it
    (costs one driver action per iteration, and the rank vector is
    then checkpointed every round — the delta collect materializes it
    anyway).  Without ``tol``, lineage is cut only every
    ``lineage_cut_every`` rounds (module docstring).  Cadence 2
    measured fastest (200k nodes, 600k edges, local[8], K=3: 5.9-6.8s
    vs 8.5-9.9s per-round vs 13.2s fully lazy — the rank vector is
    referenced twice per round and the duplicated subtrees do NOT
    collapse via exchange reuse, so deeper nesting loses)."""
    n = nodes.count()
    e = (
        edges.select(F.col(src).alias("_src"), F.col(dst).alias("_dst"))
        .where(F.col("_src") != F.col("_dst"))
        .distinct()
    )
    outdeg = e.groupBy("_src").agg(F.count(F.lit(1)).alias("_deg"))
    fused = e.join(outdeg, "_src").persist()

    ids = nodes.select(F.col(node_key).alias("_id"))
    ranks = ids.withColumn("_rank", F.lit(1.0 / n))
    # the zero-outlink node set is static — compute it once; each
    # iteration then reads the dangling mass with a broadcast semi-join
    # instead of a fresh anti-join shuffle against the rank vector
    dangling_ids = ids.join(
        outdeg, F.col("_id") == F.col("_src"), "left_anti"
    ).persist()
    prev_cut = None

    for _i in range(iterations):
        contrib = (
            fused.join(ranks, F.col("_src") == F.col("_id"))
            .groupBy("_dst")
            .agg(F.sum(F.col("_rank") / F.col("_deg")).alias("_c"))
        )
        dangling = (
            ranks.join(F.broadcast(dangling_ids), "_id", "semi")
            .agg(F.coalesce(F.sum("_rank"), F.lit(0.0)).alias("_dm"))
        )
        new_ranks = (
            ids.join(F.broadcast(dangling))
            .join(contrib, F.col("_id") == F.col("_dst"), "left")
            .select(
                "_id",
                (
                    F.lit((1.0 - damping) / n)
                    + F.lit(damping)
                    * (
                        F.coalesce(F.col("_c"), F.lit(0.0))
                        + F.col("_dm") / F.lit(float(n))
                    )
                ).alias("_rank"),
            )
        )
        if tol is not None:
            new_ranks = new_ranks.localCheckpoint()
            delta = (
                new_ranks.join(
                    ranks.withColumnRenamed("_rank", "_prev"), "_id"
                )
                .agg(F.sum(F.abs(F.col("_rank") - F.col("_prev"))))
                .collect()[0][0]
            )
            # the delta read above was the old cut's last consumer
            free_local_checkpoint(ranks)
            ranks = new_ranks
            if delta is not None and delta < tol:
                break
        else:
            if (_i + 1) % lineage_cut_every == 0 and (_i + 1) < iterations:
                new_ranks = new_ranks.localCheckpoint()
                # the previous cut's last consumer was the plan just
                # materialized into new_ranks
                free_local_checkpoint(prev_cut)
                prev_cut = new_ranks
            ranks = new_ranks
    fused.unpersist()
    dangling_ids.unpersist()
    return ranks.select(
        F.col("_id").alias(node_key), F.col("_rank").alias("rank")
    )


def trustrank(
    edges: DataFrame,
    nodes: DataFrame,
    seeds: DataFrame,
    iterations: int = 3,
    damping: float = 0.85,
    src: str = "src",
    dst: str = "dst",
    node_key: str = "id",
    seed_key: str = "id",
    lineage_cut_every: int = 2,
) -> DataFrame:
    """(node_key, trust): personalized PageRank with the teleport
    vector restricted to a vetted seed set (TrustRank, Gyongyi/
    Garcia-Molina/Pedersen VLDB 2004 — the spam-demotion signal;
    :func:`seed_distances` is its BFS skeleton, this is the real
    propagation): rank = (1-d)·v + d·(in-contributions +
    dangling_mass·v) with v uniform over seeds, 0 elsewhere, started
    at v.  Nodes unreachable from the seed set score exactly 0.

    Same scale discipline as :func:`pagerank` — one keyed shuffle per
    iteration over the fused edge table, dangling mass as a broadcast
    1-row aggregate, lineage cut every ``lineage_cut_every`` rounds;
    v rides in the node table (computed once), so personalization adds
    NO per-iteration cost."""
    ns = seeds.count()
    e = (
        edges.select(F.col(src).alias("_src"), F.col(dst).alias("_dst"))
        .where(F.col("_src") != F.col("_dst"))
        .distinct()
    )
    outdeg = e.groupBy("_src").agg(F.count(F.lit(1)).alias("_deg"))
    fused = e.join(outdeg, "_src").persist()

    sd = seeds.select(F.col(seed_key).alias("_id")).distinct()
    ids = (
        nodes.select(F.col(node_key).alias("_id"))
        .join(sd.withColumn("_is_seed", F.lit(1)), "_id", "left")
        .select(
            "_id",
            F.when(F.col("_is_seed") == 1, F.lit(1.0 / ns))
            .otherwise(F.lit(0.0))
            .alias("_v"),
        )
        .persist()
    )
    ranks = ids.select("_id", F.col("_v").alias("_rank"))
    dangling_ids = ids.select("_id").join(
        outdeg, F.col("_id") == F.col("_src"), "left_anti"
    ).persist()
    prev_cut = None

    for _i in range(iterations):
        contrib = (
            fused.join(ranks, F.col("_src") == F.col("_id"))
            .groupBy("_dst")
            .agg(F.sum(F.col("_rank") / F.col("_deg")).alias("_c"))
        )
        dangling = (
            ranks.join(F.broadcast(dangling_ids), "_id", "semi")
            .agg(F.coalesce(F.sum("_rank"), F.lit(0.0)).alias("_dm"))
        )
        ranks = (
            ids.join(F.broadcast(dangling))
            .join(contrib, F.col("_id") == F.col("_dst"), "left")
            .select(
                "_id",
                (
                    F.lit(1.0 - damping) * F.col("_v")
                    + F.lit(damping)
                    * (
                        F.coalesce(F.col("_c"), F.lit(0.0))
                        + F.col("_dm") * F.col("_v")
                    )
                ).alias("_rank"),
            )
        )
        if (_i + 1) % lineage_cut_every == 0 and (_i + 1) < iterations:
            ranks = ranks.localCheckpoint()
            free_local_checkpoint(prev_cut)
            prev_cut = ranks
    fused.unpersist()
    dangling_ids.unpersist()
    ids.unpersist()
    return ranks.select(
        F.col("_id").alias(node_key), F.col("_rank").alias("trust")
    )


def triangle_counts(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """(node, n_tri): per-node triangle counts of the undirected simple
    graph (self-loops dropped, directions and duplicates collapsed).

    Degree-ordered orientation (the standard skew bound: Suri/Vassilvitskii
    "Counting triangles and the curse of the last reducer"): orient
    every edge from the (degree, id)-smaller endpoint to the larger, so
    a hub's oriented OUT-degree is O(sqrt(m)) no matter how hot it is —
    the wedge join fans out on oriented out-neighborhoods, never on raw
    hub degree.  Wedges (a->b, a->c) with rank(b) < rank(c) close into
    triangles iff oriented edge b->c exists (rank order makes each
    triangle counted exactly once).

    Plan: 3 shuffles — degree aggregate, the wedge self-join on the
    oriented head, the closing semi-join — all codegen."""
    und = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("u"),
            F.greatest(F.col(src), F.col(dst)).alias("v"),
        )
        .where(F.col("u") != F.col("v"))
        .distinct()
    )
    deg = (
        und.select(F.col("u").alias("n"))
        .unionAll(und.select(F.col("v").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    with_deg = (
        und.join(deg.select(F.col("n").alias("u"), F.col("d").alias("du")), "u")
        .join(deg.select(F.col("n").alias("v"), F.col("d").alias("dv")), "v")
    )
    lower_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    oriented = with_deg.select(
        F.when(lower_first, F.col("u")).otherwise(F.col("v")).alias("a"),
        F.when(lower_first, F.col("v")).otherwise(F.col("u")).alias("b"),
        F.when(lower_first, F.col("du")).otherwise(F.col("dv")).alias("da"),
        F.when(lower_first, F.col("dv")).otherwise(F.col("du")).alias("db"),
    )
    e1 = oriented.select("a", F.col("b").alias("b1"), F.col("db").alias("d1"))
    e2 = oriented.select("a", F.col("b").alias("b2"), F.col("db").alias("d2"))
    wedge_rank = (F.col("d1") < F.col("d2")) | (
        (F.col("d1") == F.col("d2")) & (F.col("b1") < F.col("b2"))
    )
    wedges = e1.join(e2, "a").where(wedge_rank)
    closing = oriented.select(
        F.col("a").alias("b1"), F.col("b").alias("b2")
    )
    tris = wedges.join(closing, ["b1", "b2"]).select(
        F.col("a").alias("x"), F.col("b1").alias("y"), F.col("b2").alias("z")
    )
    corners = (
        tris.select(F.col("x").alias("node"))
        .unionAll(tris.select(F.col("y").alias("node")))
        .unionAll(tris.select(F.col("z").alias("node")))
    )
    return corners.groupBy("node").agg(F.count(F.lit(1)).alias("n_tri"))


def seed_distances(
    edges: DataFrame,
    seeds: DataFrame,
    max_hops: int = 3,
    src: str = "src",
    dst: str = "dst",
    seed_key: str = "id",
) -> DataFrame:
    """(node, dist): minimum hop count from the seed set along directed
    edges, bounded at ``max_hops`` — multi-source BFS, the "trust
    distance" signal (TrustRank's seed-propagation skeleton: distance
    from a vetted whitelist ranks crawl frontiers and weighs documents).

    Frontier BFS, not Bellman-Ford: each round expands ONLY the nodes
    first reached last round (equi-join frontier x edges -> distinct ->
    anti-join against everything already labeled), so a node is visited
    once and the round's shuffle is proportional to the frontier, never
    to the accumulated result — the property that keeps round cost flat
    when 100 TB of graph has bounded expansion.  ``max_hops`` bounds
    the loop with zero driver actions (the whole plan stays lazy);
    distances are exact because BFS labels at first reach.  Lineage is
    cut per round (localCheckpoint), same protocol as pagerank/HITS.
    """
    e = (
        edges.select(F.col(src).alias("_src"), F.col(dst).alias("_dst"))
        .where(F.col("_src") != F.col("_dst"))
        .distinct()
        .persist()
    )
    dist = (
        seeds.select(F.col(seed_key).alias("_n"))
        .distinct()
        .withColumn("_d", F.lit(0).cast("long"))
        .localCheckpoint()
    )
    frontier = dist
    prev_frontier = None
    for h in range(1, max_hops + 1):
        reached = (
            e.join(frontier, F.col("_src") == F.col("_n"))
            .select(F.col("_dst").alias("_n"))
            .distinct()
            .withColumn("_d", F.lit(h).cast("long"))
        )
        new = reached.join(
            dist.select("_n"), "_n", "left_anti"
        ).localCheckpoint()
        old_dist = dist
        dist = dist.unionByName(new).localCheckpoint()
        # old dist's rows are inside the new union cut; the previous
        # frontier was last read while materializing `new` above.  At
        # h=1 prev_frontier is still None and old_dist IS the seed
        # checkpoint `frontier` currently aliases — freeing it here is
        # safe only because `frontier` is reassigned to `new` below
        # before any further read.
        free_local_checkpoint(old_dist)
        free_local_checkpoint(prev_frontier)
        prev_frontier = new
        frontier = new
    e.unpersist()
    return dist.select(F.col("_n").alias("node"), F.col("_d").alias("dist"))


def label_propagation(
    edges: DataFrame,
    nodes: DataFrame,
    iterations: int = 3,
    node_key: str = "id",
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """(node_key, label): community detection by SYNCHRONOUS label
    propagation (Raghavan et al. 2007) made fully deterministic —
    labels start as node ids; each round every node adopts the most
    frequent label among its undirected neighbors, ties broken by the
    SMALLEST label; isolated nodes keep theirs.  A fixed iteration
    count plus the deterministic tiebreak is what makes an otherwise
    order-sensitive heuristic replayable on any engine/partitioning
    (the kmeans/pagerank portability discipline) — classic async LPA
    is not even self-reproducible.

    Scale shape per round: one edges x labels equi-join (shuffle ~
    |E|), one (node, label) count aggregate (map-side combined), one
    struct-max argmax per node — no windows, no driver actions;
    lineage cut per round (localCheckpoint).  Degree skew rides the
    same AQE story as pagerank's contribution join.
    """
    e = (
        edges.select(F.col(src).alias("_s"), F.col(dst).alias("_d"))
        .where(F.col("_s") != F.col("_d"))
        .distinct()
    )
    und = (
        e.unionByName(
            e.select(F.col("_d").alias("_s"), F.col("_s").alias("_d"))
        )
        .distinct()
        .persist()
    )
    base = nodes.select(F.col(node_key).alias("_n")).distinct()
    labels = base.withColumn("_l", F.col("_n")).localCheckpoint()
    for _ in range(iterations):
        prev_labels = labels
        nb = und.join(
            labels.select(F.col("_n").alias("_d"), "_l"), "_d"
        ).select(F.col("_s").alias("_n"), "_l")
        cnt = nb.groupBy("_n", "_l").agg(F.count(F.lit(1)).alias("_c"))
        best = (
            cnt.groupBy("_n")
            .agg(
                F.max(
                    F.struct(F.col("_c"), (-F.col("_l")).alias("_neg"))
                ).alias("_b")
            )
            .select("_n", (-F.col("_b._neg")).alias("_new"))
        )
        labels = (
            labels.join(best, "_n", "left")
            .select("_n", F.coalesce("_new", "_l").alias("_l"))
            .localCheckpoint()
        )
        free_local_checkpoint(prev_labels)
    und.unpersist()
    return labels.select(
        F.col("_n").alias(node_key), F.col("_l").alias("label")
    )


def _und_degrees(und: DataFrame) -> DataFrame:
    return (
        und.select(F.col("u").alias("n"))
        .unionAll(und.select(F.col("v").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("d"))
    )


def kcore(
    edges: DataFrame,
    k: int,
    src: str = "src",
    dst: str = "dst",
    max_rounds: int = 64,
) -> DataFrame:
    """(node, core_deg): the k-core of the undirected simple graph —
    the (unique) maximal subgraph where every node keeps degree >= k
    after directions, duplicates, and self-loops collapse.  Spam-farm
    and boilerplate-hub detection on web link graphs reach for this
    before anything iterative-numeric: cores survive, tendrils peel.

    Iterative peeling: each round simultaneously removes every node of
    degree < k and the edges touching it; the fixed point is reached
    when an entire round removes nothing.  Simultaneous removal makes
    the rounds confluent (the k-core is order-independent), so the
    result is engine/partitioning-portable and a fixed unrolling of
    the same rounds replays it relationally.

    Scale shape per round: one map-combined degree aggregate + two
    left-semi hash joins (keep-set is |nodes| and shrinking, and only
    node ids cross the wire), ONE driver action (the surviving-edge
    count that tests the fixed point), lineage cut per round
    (localCheckpoint).  Rounds needed = peeling depth of the graph
    (degeneracy ordering length), typically O(log n) on web graphs;
    ``max_rounds`` is a runaway bound, not a tuning knob."""
    cur = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("u"),
            F.greatest(F.col(src), F.col(dst)).alias("v"),
        )
        .where(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint()
    )
    prev_edges = cur.count()
    for _ in range(max_rounds):
        keep = _und_degrees(cur).where(F.col("d") >= k).select("n")
        nxt = (
            cur.join(keep.select(F.col("n").alias("u")), "u", "left_semi")
            .join(keep.select(F.col("n").alias("v")), "v", "left_semi")
            .localCheckpoint()
        )
        n_edges = nxt.count()
        free_local_checkpoint(cur)
        cur = nxt
        if n_edges == prev_edges:
            break
        prev_edges = n_edges
    return _und_degrees(cur).select(
        F.col("n").alias("node"), F.col("d").alias("core_deg")
    )


def cocitation_pairs(
    edges: DataFrame,
    min_common: int = 2,
    max_df: int | None = None,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """(a, b, n_common, cited_a, cited_b): co-citation "related pages"
    pairs — a < b cited together by at least ``min_common`` common
    citers (Small 1973; swap src/dst upstream for bibliographic
    coupling over shared references).  ``cited_*`` are the in-degrees
    within the retained edge set, so consumers can form Jaccard or
    cosine scores from integers alone.

    The quadratic hazard is the prolific citer: a src with out-degree
    d contributes d*(d-1)/2 wedges.  ``max_df`` is the stop-citer
    valve (the max_df stop-shingle rule of operators/dedup.py applied
    to the link graph): srcs citing more than ``max_df`` targets are
    excluded from evidence ENTIRELY (both the wedge join and the
    cited_* degrees), which bounds per-key fanout at max_df**2 and
    keeps the semantics replayable — the oracle applies the same rule.

    Plan: distinct + out-degree agg + one self-equi-join on src
    (fanout-bounded) + one map-combined pair count + two hash joins
    against the |V|-sized degree table (deliberately NOT broadcast —
    AQE may still choose to at small scale); all codegen, no windows."""
    e = edges.select(F.col(src).alias("s"), F.col(dst).alias("t")).where(
        F.col("s") != F.col("t")
    ).distinct()
    if max_df is not None:
        od = e.groupBy("s").agg(F.count(F.lit(1)).alias("od"))
        e = (
            e.join(od.where(F.col("od") <= max_df).select("s"), "s", "left_semi")
        )
    cited = e.groupBy("t").agg(F.count(F.lit(1)).alias("cited"))
    left = e.select("s", F.col("t").alias("a"))
    right = e.select("s", F.col("t").alias("b"))
    pairs = (
        left.join(right, "s")
        .where(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("n_common"))
        .where(F.col("n_common") >= min_common)
    )
    out = (
        pairs.join(
            cited.select(F.col("t").alias("a"), F.col("cited").alias("cited_a")),
            "a",
        )
        .join(
            cited.select(F.col("t").alias("b"), F.col("cited").alias("cited_b")),
            "b",
        )
        .select("a", "b", "n_common", "cited_a", "cited_b")
    )
    return out


def weighted_distances(
    edges: DataFrame,
    seeds: DataFrame,
    rounds: int = 4,
    src: str = "src",
    dst: str = "dst",
    weight: str = "w",
    seed_key: str = "id",
) -> DataFrame:
    """(node, dist): minimum total edge weight from the seed set along
    directed edges, after ``rounds`` Bellman-Ford relaxation rounds —
    the weighted generalization of ``seed_distances`` (latency-weighted
    crawl distance, click-cost attribution, route cost over a road
    graph).  Weights must be non-negative INTEGERS (milliseconds,
    meters — quantize upstream): integer min-sums are engine-portable
    with no float discipline at all.

    Unlike hop BFS, a weighted label can IMPROVE after first reach, so
    the frontier trick needs a delta twist: each round relaxes only
    edges out of nodes whose label improved last round (delta
    frontier), merges candidate labels with the incumbent via a
    min-aggregate, and the new frontier is the rows that beat their
    incumbent.  After r rounds every shortest path of <= r edges is
    exact (Bellman-Ford invariant); ``rounds`` >= the weighted-path
    hop diameter gives the fixed point.  Zero driver actions — the
    caller picks ``rounds`` (unrolled lazy plan, lineage cut per
    round), exactly the replayability contract the oracle needs.
    Parallel edges collapse to their min weight first."""
    e = (
        edges.select(
            F.col(src).alias("_src"),
            F.col(dst).alias("_dst"),
            F.col(weight).cast("long").alias("_w"),
        )
        .where(F.col("_src") != F.col("_dst"))
        .groupBy("_src", "_dst")
        .agg(F.min("_w").alias("_w"))
        .persist()
    )
    dist = (
        seeds.select(F.col(seed_key).alias("_n"))
        .distinct()
        .withColumn("_d", F.lit(0).cast("long"))
        .localCheckpoint()
    )
    frontier = dist
    prev_merged = None
    for _ in range(rounds):
        cand = (
            e.join(frontier, F.col("_src") == F.col("_n"))
            .groupBy(F.col("_dst").alias("_n"))
            .agg(F.min(F.col("_d") + F.col("_w")).alias("_c"))
        )
        # ONE checkpoint per round, of the merge itself: dist and the
        # delta frontier are then cheap projections over the
        # materialized rows (checkpointing them separately would run
        # the full-outer join twice per round — measured 2x on the
        # bench fixture)
        merged = dist.join(cand, "_n", "full_outer").select(
            "_n",
            F.coalesce(
                F.least(F.col("_d"), F.col("_c")), F.col("_d"), F.col("_c")
            ).alias("_d2"),
            "_d",
        ).localCheckpoint()
        # prior round's merge (and, at round 1, the seed cut wrapped in
        # dist's projection: a lazy plan the guard skips) has no
        # consumer once this merge materialized
        free_local_checkpoint(prev_merged)
        prev_merged = merged
        dist = merged.select("_n", F.col("_d2").alias("_d"))
        frontier = merged.where(
            F.col("_d").isNull() | (F.col("_d2") < F.col("_d"))
        ).select("_n", F.col("_d2").alias("_d"))
    e.unpersist()
    return dist.select(F.col("_n").alias("node"), F.col("_d").alias("dist"))


def resolve_redirects(
    edges: DataFrame,
    rounds: int = 4,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """(node, target, hops, resolved): terminal resolution of a
    redirect graph — every node follows its redirect chain to the
    first node with NO outgoing redirect (the canonical landing url:
    HTTP 301/302 chains, short-link hops, url-alias tables).  The
    chain map is made functional first: parallel out-edges collapse
    to the SMALLEST destination (deterministic on any engine) and
    self-redirects are dropped.

    Pointer jumping, not linear walking: each round replaces every
    pointer with its pointer's pointer (one self-equi-join on the
    pointer table, hops adding), so after ``rounds`` rounds each node
    has followed min(2**rounds, chain length) edges — chains of up to
    2**rounds hops resolve in O(log L) shuffles instead of L
    (the dedup_clusters discipline applied to a chain-shaped graph).
    Terminals map to themselves, which makes the iteration absorbing:
    a finished chain stops accumulating hops, so ``hops`` is the TRUE
    chain length for every resolved node.  ``resolved`` is false for
    nodes still pointing at a redirecting node after the budget —
    redirect CYCLES (the crawler's redirect-loop trap) and
    over-budget chains, both reported with their deterministic
    2**rounds-edge iterate rather than dropped.  Zero driver actions;
    lineage cut per round.

    The linear-walk twin (follow one edge at a time for 2**rounds
    steps) computes the same (target, hops, resolved) triple — that
    structural equality is the oracle's correctness argument."""
    f = (
        edges.select(F.col(src).alias("_n"), F.col(dst).alias("_p"))
        .where(F.col("_n") != F.col("_p"))
        .groupBy("_n")
        .agg(F.min("_p").alias("_p"))
    )
    nodes = (
        f.select("_n")
        .unionByName(f.select(F.col("_p").alias("_n")))
        .distinct()
    )
    ptr = (
        nodes.join(f, "_n", "left")
        .select(
            "_n",
            F.coalesce("_p", F.col("_n")).alias("_p"),
            F.when(F.col("_p").isNull(), F.lit(0))
            .otherwise(F.lit(1))
            .cast("long")
            .alias("_h"),
        )
        .localCheckpoint()
    )
    for _ in range(rounds):
        nxt = ptr.select(
            F.col("_n").alias("_p"),
            F.col("_p").alias("_p2"),
            F.col("_h").alias("_h2"),
        )
        prev_ptr = ptr
        ptr = (
            ptr.join(nxt, "_p")
            .select(
                "_n",
                F.col("_p2").alias("_p"),
                (F.col("_h") + F.col("_h2")).alias("_h"),
            )
            .localCheckpoint()
        )
        free_local_checkpoint(prev_ptr)
    out = ptr.join(
        f.select(F.col("_n").alias("_p"), F.lit(False).alias("_t")),
        "_p",
        "left",
    )
    return out.select(
        F.col("_n").alias("node"),
        F.col("_p").alias("target"),
        F.col("_h").alias("hops"),
        F.coalesce("_t", F.lit(True)).alias("resolved"),
    )
