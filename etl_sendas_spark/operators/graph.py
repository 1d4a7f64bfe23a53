"""Link-graph analytics: PageRank by iterated sparse matrix-vector
joins.

The second rung of the graph ladder after
:func:`..operators.dedupe.connected_components` (which labels
components by min-label propagation): PageRank weights nodes by link
structure — the classic quality prior a web-corpus pipeline feeds into
document filtering/sampling alongside the Gopher rules and the quality
model.

Plan shape per iteration: ONE join of the edge list against the current
rank vector on ``src`` plus ONE aggregation on ``dst`` — the
distributed sparse y = A^T x. The edge list (joined once up front with
out-degrees) is pinned via :mod:`..materialize` so every iteration
rescans the materialized edges rather than recomputing their lineage,
and each new rank vector is pinned and its predecessor released, so
lineage stays O(1) in the iteration count and storage stays O(nodes).
At 100 TB-graph scale the edge pin is the dominant store (one row per
edge); both per-iteration shuffles are keyed by node id, and a skewed
hub node skews only the ``dst`` aggregate, which AQE's skew handling
splits (the map-side partial aggregation absorbs most of it first).

No dangling-node handling is needed when callers symmetrize the edge
list (every node then has out-degree >= 1); ``pagerank`` asserts the
precondition cheaply instead of silently mis-normalizing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..materialize import materialize, release


def symmetrize(edges: DataFrame) -> DataFrame:
    """Undirected view of a directed edge list: both orientations,
    deduplicated. (PageRank on the symmetrized graph is the standard
    formulation for affinity graphs like customer<->supplier.)"""
    return (
        edges.select("src", "dst")
        .union(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
    )


def pagerank(
    edges: DataFrame,
    iterations: int = 5,
    damping: float = 0.85,
    strategy: str | None = None,
    reset: DataFrame | None = None,
) -> DataFrame:
    """Fixed-iteration PageRank over a directed edge list
    ``(src, dst)`` where every node has out-degree >= 1 (symmetrize
    first for affinity graphs).

    r_{t+1}(v) = (1-d)*reset(v) + d * sum_{u->v} r_t(u) / outdeg(u),
    r_0 = reset. With ``reset=None`` the reset distribution is the
    uniform 1/N — classic global PageRank. Passing ``reset`` as a
    ``(node, weight)`` frame (weights summing to 1, zero implied
    elsewhere) gives PERSONALIZED PageRank: mass teleports back to the
    seed set, so the stationary weights rank nodes by proximity to the
    seeds — the "related items" recommendation query. The seed frame
    is broadcast-joined onto the node set once; per-iteration cost is
    identical to the global case.

    Returns ``(node, pagerank)`` unrounded; callers hash-comparing
    across engines should round (the per-node contribution SUM is
    float-order-dependent at the last ulp).
    """
    if iterations < 0:
        raise ValueError(f"pagerank: iterations must be >= 0, got {iterations}")
    if not 0.0 < damping < 1.0:
        raise ValueError(f"pagerank: damping must be in (0, 1), got {damping}")
    # The dangling-node precondition promised by the module docstring:
    # a node with out-degree 0 silently leaks rank mass (the result no
    # longer sums to 1), so fail fast instead. Checked from frames the
    # plan builds anyway: |distinct src| < |nodes| iff some node never
    # appears as a source.
    # NOTE on pin width: an explicit repartition(shuffle_partitions, key)
    # before each pin was measured at x10 scale (1.2 M edges) and LOST to
    # letting AQE size the pinned frames (warm 12.4 s vs 10.2 s for the
    # entity-graph query): the extra exchanges cost more than the wider
    # loop parallelism returns, and AQE already re-plans each iteration's
    # join (broadcasting the node-sized rank vector). Keep the pins as
    # the optimizer leaves them.
    e = edges.select("src", "dst").distinct()
    node_set = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    if reset is not None:
        node_set = node_set.join(
            F.broadcast(reset.select("node", F.col("weight").alias("__w"))),
            "node",
            "left",
        ).select("node", F.coalesce(F.col("__w"), F.lit(0.0)).alias("__r0"))
    nodes = materialize(node_set, name="pagerank_nodes", strategy=strategy)
    deg = e.groupBy("src").agg(F.count("*").alias("outdeg"))
    ed = materialize(e.join(deg, "src"), name="pagerank_edges", strategy=strategy)

    n_nodes = nodes.count()  # driver scalar (a count, not a data collect)
    n_src = ed.select("src").distinct().count()  # ed is pinned: cheap rescan
    if n_src < n_nodes:
        release(ed)
        release(nodes)
        raise ValueError(
            f"pagerank: {n_nodes - n_src} node(s) have out-degree 0 "
            "(dangling) — rank mass would leak. Symmetrize the edge "
            "list first (graph.symmetrize) or add self-loops."
        )
    if reset is None:
        r0_col = F.lit(1.0 / n_nodes)
        base_col = F.lit((1.0 - damping) / n_nodes)
    else:
        r0_col = F.col("__r0")
        base_col = F.lit(1.0 - damping) * F.col("__r0")
    ranks = materialize(
        nodes.withColumn("r", r0_col).select("node", "r"),
        name="pagerank_r0",
        strategy=strategy,
    )
    for i in range(iterations):
        contrib = (
            ed.join(ranks.withColumnRenamed("node", "src"), "src")
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum(F.col("r") / F.col("outdeg")).alias("c"))
        )
        new = nodes.join(contrib, "node", "left").select(
            "node",
            (
                base_col + F.lit(damping) * F.coalesce(F.col("c"), F.lit(0.0))
            ).alias("r"),
        )
        new = materialize(new, name=f"pagerank_r{i + 1}", strategy=strategy)
        release(ranks)
        ranks = new
    release(ed)
    out = ranks.select("node", F.col("r").alias("pagerank"))
    # nodes stays pinned until the caller is done with `out` (it is not
    # in out's lineage — the final frame reads only the last rank pin).
    release(nodes)
    return out


def forest_roots(
    df: DataFrame,
    id_col: str = "id",
    parent_col: str = "parent",
    strategy: str | None = None,
    max_rounds: int = 40,
) -> DataFrame:
    """Root and depth for every node of a forest (``parent`` NULL at
    roots) by POINTER DOUBLING: each round replaces every node's
    ancestor pointer with its ancestor's ancestor, so after r rounds a
    node points min(2^r, depth) levels up — O(log depth) self-joins
    instead of the O(depth) sequential walk a recursive CTE performs.
    That is the distributed hierarchy-flattening algorithm (org charts,
    BOM explosions, category trees): at 100 TB a 30-deep hierarchy
    costs 5 rounds, each one equi-join + no driver state beyond the
    fixpoint counter. Each round's frame is pinned via the pluggable
    materializer and its predecessor released, so lineage stays O(1).

    Cycles are the caller's contract (a parent-pointer forest has
    none); ``max_rounds`` bounds the loop against bad input.

    Returns ``(id, root, depth)``.
    """
    cur = df.select(
        F.col(id_col).alias("id"),
        F.coalesce(F.col(parent_col), F.col(id_col)).alias("anc"),
        F.when(F.col(parent_col).isNull(), F.lit(0))
        .otherwise(F.lit(1))
        .alias("depth"),
        F.col(parent_col).isNull().alias("done"),
    )
    cur = materialize(cur, name="forest_r0", strategy=strategy)
    for i in range(max_rounds + 1):
        pending = cur.filter(~F.col("done")).count()
        if pending == 0:
            break
        if i == max_rounds:
            # fail fast instead of emitting partial anc/depth as if final
            raise ValueError(
                f"forest_roots: {pending} row(s) unresolved after "
                f"{max_rounds} rounds — cyclic or malformed parent "
                "pointers (a forest converges in ceil(log2(depth)) rounds)"
            )
        up = cur.select(
            F.col("id").alias("u_id"),
            F.col("anc").alias("u_anc"),
            F.col("depth").alias("u_depth"),
            F.col("done").alias("u_done"),
        )
        nxt = (
            cur.join(up, cur["anc"] == up["u_id"])
            .select(
                "id",
                F.when(F.col("done"), F.col("anc"))
                .otherwise(F.col("u_anc"))
                .alias("anc"),
                F.when(F.col("done"), F.col("depth"))
                .otherwise(F.col("depth") + F.col("u_depth"))
                .alias("depth"),
                (F.col("done") | F.col("u_done")).alias("done"),
            )
        )
        nxt = materialize(nxt, name=f"forest_r{i + 1}", strategy=strategy)
        release(cur)
        cur = nxt
    return cur.select("id", F.col("anc").alias("root"), "depth")


def hits(
    edges: DataFrame,
    iterations: int = 5,
    strategy: str | None = None,
) -> DataFrame:
    """HITS (Kleinberg) over a DIRECTED edge list ``(src, dst)``:
    authority(v) ∝ Σ hub(u) over in-edges, hub(u) ∝ Σ authority(v)
    over out-edges, alternating — the third rung of the graph ladder
    after connected components and PageRank, and the natural scorer
    for BIPARTITE-ish graphs (a customer↔supplier graph splits into
    hub-side buyers and authority-side sellers, which PageRank's
    single score conflates).

    Per iteration: ONE edge⨝hub join + dst aggregate (the authority
    pass) and ONE edge⨝authority join + src aggregate (the hub pass) —
    the same sparse mat-vec shape as :func:`pagerank`, shuffles keyed
    by node id, edges pinned once, vectors pinned per iteration with
    O(1) lineage. Normalization is L1 (vectors sum to 1; same ranking
    as the textbook L2, only the scale differs) and each normalized
    vector ROUNDS to 12 decimals per iteration — with ~node-count
    terms in the normalizing sum, ulp-level addition-order noise would
    otherwise compound across iterations and break cross-engine
    replay (the SQL oracle unrolls the same iterations and must
    hash-match after the final round to 6).

    Returns ``(node, hub, authority)`` over all nodes (0.0 on the
    side a node does not participate in)."""
    if iterations < 1:
        raise ValueError(f"hits: iterations must be >= 1, got {iterations}")
    e = edges.select("src", "dst").distinct()
    node_set = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    nodes = materialize(node_set, name="hits_nodes", strategy=strategy)
    ed = materialize(e, name="hits_edges", strategy=strategy)
    n_nodes = nodes.count()

    hub = materialize(
        nodes.withColumn("h", F.lit(1.0 / n_nodes)), name="hits_h0",
        strategy=strategy,
    )
    auth = None
    for i in range(iterations):
        a_raw = (
            ed.join(hub.withColumnRenamed("node", "src"), "src")
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum("h").alias("v"))
        )
        a_sum = a_raw.agg(F.sum("v").alias("t"))
        new_auth = (
            nodes.join(a_raw, "node", "left")
            .crossJoin(F.broadcast(a_sum))
            .select(
                "node",
                F.round(
                    F.coalesce(F.col("v"), F.lit(0.0)) / F.col("t"), 12
                ).alias("a"),
            )
        )
        new_auth = materialize(new_auth, name=f"hits_a{i + 1}", strategy=strategy)
        if auth is not None:
            release(auth)
        auth = new_auth

        h_raw = (
            ed.join(auth.withColumnRenamed("node", "dst"), "dst")
            .groupBy(F.col("src").alias("node"))
            .agg(F.sum("a").alias("v"))
        )
        h_sum = h_raw.agg(F.sum("v").alias("t"))
        new_hub = (
            nodes.join(h_raw, "node", "left")
            .crossJoin(F.broadcast(h_sum))
            .select(
                "node",
                F.round(
                    F.coalesce(F.col("v"), F.lit(0.0)) / F.col("t"), 12
                ).alias("h"),
            )
        )
        new_hub = materialize(new_hub, name=f"hits_h{i + 1}", strategy=strategy)
        release(hub)
        hub = new_hub
    release(ed)
    out = hub.join(auth, "node").select(
        "node", F.col("h").alias("hub"), F.col("a").alias("authority")
    )
    release(nodes)
    return out


def triangle_counts(edges: DataFrame) -> DataFrame:
    """Per-node triangle participation counts over an undirected edge
    list (``src``/``dst``; orientation and self-loops are normalized
    away). Fourth rung of the graph ladder: components label, PageRank
    weights, HITS splits roles, triangles measure local closure — the
    clustering-coefficient numerator used for community/spam signals.

    The scale trick is DEGREE ORIENTATION (the "compact-forward"
    algorithm): orient every canonical edge from its lower-degree
    endpoint to its higher-degree one (ties by node id), which makes
    the graph acyclic and bounds wedge generation by Σ_v out-deg(v)² =
    O(m^1.5) instead of Σ_v deg(v)² — the hub node that would square a
    naive wedge join has *in*-degree there, not out. Every triangle
    then has exactly one node with two out-edges, so the wedge-join +
    canonical-edge membership check counts each triangle once with no
    /3 correction.

    The canonical edge set feeds FOUR consumers (degree count, both
    orientation joins, the membership check) and the oriented list two
    (both wedge sides), so both are pinned via the pluggable
    materializer — unpinned, Catalyst re-derives the distinct+joins
    per consumer (measured 23 executed exchanges on a K50 clique vs 9
    with the pins). The distinct shuffle keys that remain are the
    canonical edge, the degree/node key, the wedge apex ``u``, and the
    membership pair (x, y).

    Returns (node, triangles) for every node in at least one triangle.
    """
    canon = materialize(
        edges.select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .filter(F.col("a") != F.col("b"))
        .distinct(),
        name="triangle_canon",
    )
    deg = (
        canon.select(F.col("a").alias("node"))
        .unionAll(canon.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("deg"))
    )
    # orient low -> high by (deg, node); carry both endpoints' keys
    ranked = (
        canon.join(deg.select(F.col("node").alias("a"), F.col("deg").alias("da")), "a")
        .join(deg.select(F.col("node").alias("b"), F.col("deg").alias("db")), "b")
    )
    fwd = materialize(
        ranked.select(
            F.when(
                (F.col("da") < F.col("db"))
                | ((F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))),
                F.struct(F.col("a").alias("u"), F.col("b").alias("v")),
            )
            .otherwise(F.struct(F.col("b").alias("u"), F.col("a").alias("v")))
            .alias("e")
        ).select(F.col("e")["u"].alias("u"), F.col("e")["v"].alias("v")),
        name="triangle_fwd",
    )

    e1 = fwd.select(F.col("u"), F.col("v").alias("x"))
    e2 = fwd.select(F.col("u"), F.col("v").alias("y"))
    wedges = e1.join(e2, "u").filter(F.col("x") < F.col("y"))
    tris = wedges.join(
        canon.select(F.col("a").alias("x"), F.col("b").alias("y")),
        ["x", "y"],
        "left_semi",
    )
    return (
        tris.select(F.explode(F.array("u", "x", "y")).alias("node"))
        .groupBy("node")
        .agg(F.count("*").alias("triangles"))
    )


def random_walks(
    edges: DataFrame, length: int = 4, seed: int = 17
) -> DataFrame:
    """Uniform random-walk corpus over the undirected graph — the
    training-data generation stage of DeepWalk/node2vec (walks become
    "sentences" for a skip-gram embedding): one walk of ``length``
    steps per distinct node.

    DERANDOMIZED like every sampler in this repo: step ``i`` of walk
    ``w`` picks neighbor index ``md5_60(w # seed # i) mod deg(cur)``
    over the value-sorted adjacency array — deterministic, replayable
    in SQL, and still uniform per step. (Hash-derandomization is the
    same trick Efraimidis-Spirakis weighted sampling uses here.)

    Plan shape: adjacency pre-grouped into one sorted array per node
    and PINNED (one build, ``length`` reuses); each step is ONE join of
    the walk frontier against it plus a narrow element_at pick — so a
    full walk corpus costs ``length`` frontier-sized joins, not
    ``length`` corpus shuffles of edge rows. Hub nodes mean big
    adjacency arrays: at web scale cap them with a df-cut (same
    policy as the dedup inverted index) or bucket the hot lists.

    Returns (walk_id, step, node): step 0 is the start node itself.
    """
    if length < 1:
        raise ValueError("random_walks: length must be >= 1")
    from ..operators.dedupe import portable_hash60

    und = symmetrize(edges)
    adj = materialize(
        und.groupBy("src").agg(F.sort_array(F.collect_list("dst")).alias("nb")),
        name="walk_adjacency",
    )
    frontier = adj.select(
        F.col("src").alias("walk_id"), F.col("src").alias("cur")
    )
    hops = [
        frontier.select("walk_id", F.lit(0).alias("step"), F.col("cur").alias("node"))
    ]
    for i in range(length):
        h = portable_hash60(
            F.concat(
                F.col("walk_id").cast("string"), F.lit(f"#{seed}#{i}")
            )
        )
        frontier = (
            frontier.join(adj, frontier["cur"] == adj["src"])
            .select(
                "walk_id",
                F.element_at(
                    F.col("nb"), (h % F.size("nb")).cast("int") + 1
                ).alias("cur"),
            )
        )
        hops.append(
            frontier.select(
                "walk_id", F.lit(i + 1).alias("step"), F.col("cur").alias("node")
            )
        )
    out = hops[0]
    for hdf in hops[1:]:
        out = out.unionByName(hdf)
    return out
