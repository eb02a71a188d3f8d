"""Distributed connected components over an edge list.

The shared label-graph primitive behind cross-tile dissolve
(operators/dissolve.py) and near-dup clustering (text/dedup.py).
Both produce edge lists that are metadata-sized relative to their
inputs (component adjacencies / verified dup pairs, never pixels or
documents) — but at 10^12-row scale even the edge list must not be
collected to the driver. This module resolves components with
iterative min-label propagation joins: every step is an edge-list-
sized shuffle, nothing ever materializes driver-side.

Semantics mirror the reference polygonizer's two-level merge map
(alg/polygonize_polygonizer.cpp: per-chunk labels + a cross-chunk
equivalence map resolved afterwards), lifted to the cluster setting.

Convergence: each round does one neighbor-min propagation (one hop)
followed by one POINTER-JUMPING shortcut (label(v) := label(label(v))),
so the distance any label still has to travel halves every round —
O(log diameter) rounds total, not O(eccentricity). A path-shaped
component spanning 10^6 tiles (cross-tile contour chaining produces
exactly these) converges in ~20 rounds instead of overflowing a
fixed hop budget. localCheckpoint() truncates lineage each round so
plans stay flat.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "connected_components",
    "shortest_paths",
    "k_shortest_walk_costs",
    "yen_k_shortest",
]


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 64,
) -> DataFrame:
    """-> (id long, root long): per vertex appearing in `edges`, the
    minimum vertex id reachable from it (the canonical component
    label). Vertices with no edges are absent — callers attach
    singletons with a left join + coalesce(root, id).

    Pure DataFrame iteration: symmetrize edges, then repeat
    label(v) = min(label(v), min over neighbors u of label(u))
    followed by the pointer jump label(v) = label(label(v)),
    until a fixpoint — O(log diameter) rounds. No driver-side
    collection of vertices or edges (the per-round `changed` count is
    a scalar action only).
    """
    e = edges.select(
        F.col(src).cast("long").alias("src"), F.col(dst).cast("long").alias("dst")
    )
    sym = (
        e.unionByName(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .where(F.col("src") != F.col("dst"))
        .dropDuplicates(["src", "dst"])
    )
    verts = sym.select(F.col("src").alias("id")).distinct()
    # self-loops make the neighbor-min include the vertex's own label,
    # so the loop body needs no union (a per-round Union over a
    # checkpointed self-join output trips Spark's constraint rewrite
    # with a stale-attribute NoSuchElementException)
    adj = (
        sym.unionByName(
            verts.select(F.col("id").alias("src"), F.col("id").alias("dst"))
        )
        .localCheckpoint()
    )
    labels = verts.withColumn("root", F.col("id")).localCheckpoint()
    for _ in range(max_iter):
        hop = (
            adj.join(labels, adj["dst"] == labels["id"])
            .groupBy(adj["src"].alias("id"))
            .agg(F.min("root").alias("root"))
            # checkpoint before the self-join below so both sides of
            # the pointer jump read one materialized relation
            .localCheckpoint()
        )
        # pointer jump: root := root's root (labels only decrease, so
        # the jump target is always <= the current root; roots are
        # themselves vertices, coalesce covers the canonical case)
        new_labels = (
            hop.alias("a")
            .join(
                hop.select(
                    F.col("id").alias("rid"), F.col("root").alias("rroot")
                ).alias("b"),
                F.col("a.root") == F.col("b.rid"),
                "left",
            )
            .select(
                F.col("a.id").alias("id"),
                F.coalesce(F.col("b.rroot"), F.col("a.root")).alias("root"),
            )
            .localCheckpoint()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .where(F.col("n.root") < F.col("o.root"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            return labels
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds"
    )


def shortest_paths(
    edges: DataFrame,
    sources: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight: str = "w",
    max_iter: int = 256,
) -> DataFrame:
    """Single/multi-source shortest path distances over a directed,
    positively-weighted edge DataFrame -> (node long, dist long).

    The reference computes this driver-side with a binary-heap
    Dijkstra (gnm/gnmgraph.h:173 CalcShortestPath; gnmgraph.cpp
    DijkstraShortestPathTree) over an in-memory graph. At 10^12-edge
    scale the graph never fits one machine, so the engine runs the
    join-relaxation form (distributed Bellman-Ford): each round joins
    the current distance frontier to the edge list, takes the
    per-node min, and stops when no distance improves. Identical
    results on positive weights; rounds = shortest-path hop count
    (the frontier join only carries IMPROVED nodes, so late rounds
    shuffle only the active frontier, not the whole graph).

    `sources`: DataFrame with column `node` (distance-0 seeds).
    Every step is an edge-sized shuffle; the only driver action is
    the scalar improved-count. localCheckpoint() keeps plans flat.
    """
    e = edges.select(
        F.col(src).cast("long").alias("src"),
        F.col(dst).cast("long").alias("dst"),
        F.col(weight).cast("long").alias("w"),
    ).localCheckpoint()
    dist = (
        sources.select(F.col("node").cast("long").alias("node"))
        .distinct()
        .withColumn("dist", F.lit(0).cast("long"))
        .localCheckpoint()
    )
    frontier = dist
    for _ in range(max_iter):
        relax = (
            frontier.join(e, frontier["node"] == e["src"])
            .select(
                F.col("dst").alias("node"),
                (F.col("dist") + F.col("w")).alias("dist"),
            )
            .groupBy("node")
            .agg(F.min("dist").alias("dist"))
        )
        improved = (
            relax.alias("r")
            .join(dist.alias("d"), "node", "left")
            .where(
                F.col("d.dist").isNull() | (F.col("r.dist") < F.col("d.dist"))
            )
            .select(F.col("node"), F.col("r.dist").alias("dist"))
            .localCheckpoint()
        )
        if improved.isEmpty():
            return dist
        dist = (
            dist.unionByName(improved)
            .groupBy("node")
            .agg(F.min("dist").alias("dist"))
            .localCheckpoint()
        )
        frontier = improved
    raise RuntimeError(f"shortest_paths did not converge in {max_iter} rounds")


# ---------------------------------------------------------------------------
# K-shortest paths (gnm/gnmgraph.h:195 KShortestPaths — Yen's
# algorithm driver-side in the reference).  Two duals here:
#
# - k_shortest_walk_costs: the SCALABLE form — per-node top-K cost
#   lists under full Bellman-Ford re-relaxation (round r holds the K
#   best <=r-hop walk costs; fixpoint = K best walk costs).  On a DAG
#   every walk is loopless, so this IS K-shortest-paths there; on
#   cyclic graphs it is the K-best-walks relaxation (documented).
#   Every round is one edge-sized shuffle of array<long> state —
#   nothing driver-side but the scalar convergence check.
#
# - yen_k_shortest: faithful loopless Yen for general graphs, driver-
#   orchestrated over the DISTRIBUTED shortest-path tree (the spur
#   loop is inherently sequential — the reference runs the whole
#   thing driver-side; here only the O(K * pathlen) path lists live
#   on the driver, the graph never does).
# ---------------------------------------------------------------------------


def k_shortest_walk_costs(
    edges: DataFrame,
    sources: DataFrame,
    k: int,
    src: str = "src",
    dst: str = "dst",
    weight: str = "w",
    max_iter: int = 128,
) -> DataFrame:
    """-> (node long, costs array<long>): the k smallest walk costs
    from the source set to every node (with multiplicity — two
    distinct walks of equal cost count twice, matching Yen's path
    multiset on DAGs)."""
    e = edges.select(
        F.col(src).cast("long").alias("src"),
        F.col(dst).cast("long").alias("dst"),
        F.col(weight).cast("long").alias("w"),
    ).localCheckpoint()
    seed = (
        sources.select(F.col("node").cast("long").alias("node"))
        .distinct()
        .withColumn("costs", F.array(F.lit(0).cast("long")))
        .localCheckpoint()
    )
    state = seed
    for _ in range(max_iter):
        # full re-relaxation: node v's new list is the k smallest of
        # (seed if source) ++ {c + w | (u,v,w), c in state[u]} —
        # never state[v] itself, so multiplicity is exact
        cand = (
            state.join(e, state["node"] == e["src"])
            .select(
                F.col("dst").alias("node"),
                F.expr("transform(costs, c -> c + w)").alias("costs"),
            )
            .unionByName(seed)
            .groupBy("node")
            .agg(
                F.slice(
                    F.array_sort(F.flatten(F.collect_list("costs"))), 1, k
                ).alias("costs")
            )
            .localCheckpoint()
        )
        changed = (
            cand.alias("c")
            .join(state.alias("s"), "node", "left")
            .where(
                F.col("s.costs").isNull()
                | (F.col("c.costs") != F.col("s.costs"))
            )
        )
        if changed.isEmpty():
            return state
        state = cand
    raise RuntimeError(f"k_shortest_walk_costs: no fixpoint in {max_iter}")


def _sp_tree(e: DataFrame, source: int, max_iter: int = 256) -> DataFrame:
    """Distributed shortest-path tree: (node, dist, pred) from one
    source over a pre-projected (src, dst, w) edge DataFrame.
    Deterministic pred tie-break: min (dist, pred) struct."""
    dist = e.sparkSession.createDataFrame(
        [(int(source), 0, None)], "node long, dist long, pred long"
    ).localCheckpoint()
    frontier = dist
    for _ in range(max_iter):
        relax = (
            frontier.join(e, frontier["node"] == e["src"])
            .select(
                F.col("dst").alias("node"),
                (F.col("dist") + F.col("w")).alias("dist"),
                F.col("src").alias("pred"),
            )
            .groupBy("node")
            .agg(F.min(F.struct("dist", "pred")).alias("dp"))
            .select("node", F.col("dp.dist").alias("dist"),
                    F.col("dp.pred").alias("pred"))
        )
        improved = (
            relax.alias("r")
            .join(dist.alias("d"), "node", "left")
            .where(
                F.col("d.dist").isNull() | (F.col("r.dist") < F.col("d.dist"))
                | (
                    (F.col("r.dist") == F.col("d.dist"))
                    & (F.col("r.pred") < F.col("d.pred"))
                )
            )
            .select("node", F.col("r.dist").alias("dist"),
                    F.col("r.pred").alias("pred"))
            .localCheckpoint()
        )
        if improved.isEmpty():
            return dist
        dist = (
            dist.alias("d")
            .join(improved.alias("i"), "node", "left_anti")
            .unionByName(improved)
            .localCheckpoint()
        )
        frontier = improved
    raise RuntimeError(f"_sp_tree did not converge in {max_iter} rounds")


def _route(tree_rows: dict, source: int, target: int):
    """Backtrack target -> source through the pred map (the tree is
    path-sized by then: only the rows along the walk are touched)."""
    if target not in tree_rows:
        return None, None
    path = [target]
    cost = tree_rows[target][0]
    cur = target
    while cur != source:
        cur = tree_rows[cur][1]
        if cur is None:
            return None, None
        path.append(cur)
    return cost, list(reversed(path))


def yen_k_shortest(
    edges: DataFrame,
    source: int,
    target: int,
    k: int,
    src: str = "src",
    dst: str = "dst",
    weight: str = "w",
) -> list[tuple[int, list[int]]]:
    """Yen's loopless K-shortest paths (gnm/gnmgraph.h:195 semantics)
    -> [(cost, [nodes])], ascending cost, deterministic path
    tie-break.  The graph stays a DataFrame; each spur run is a
    distributed _sp_tree over a filtered edge view.  Driver state is
    only the K path lists (the answer itself)."""
    e0 = edges.select(
        F.col(src).cast("long").alias("src"),
        F.col(dst).cast("long").alias("dst"),
        F.col(weight).cast("long").alias("w"),
    ).localCheckpoint()
    spark = edges.sparkSession

    def sp(removed_edges: set, removed_nodes: set, s: int):
        e = e0
        if removed_nodes:
            rn = spark.createDataFrame(
                [(int(n),) for n in removed_nodes], "node long"
            )
            e = (
                e.join(rn, e["src"] == rn["node"], "left_anti")
                .join(rn, F.col("dst") == rn["node"], "left_anti")
            )
        if removed_edges:
            re_ = spark.createDataFrame(
                [(int(a), int(b)) for a, b in removed_edges], "rs long, rd long"
            )
            e = e.join(
                re_,
                (e["src"] == re_["rs"]) & (e["dst"] == re_["rd"]),
                "left_anti",
            )
        tree = _sp_tree(e.localCheckpoint(), s)
        # the tree is node-count-sized for this spur subgraph; for the
        # backtrack we only need rows reachable toward target — pull
        # the (node -> (dist, pred)) map once per spur run.  At true
        # 10^12 scale the spur loop itself is the bottleneck (the
        # reference is fully driver-side); K*pathlen map pulls are the
        # honest cost of loopless Yen.
        rows = {
            r["node"]: (r["dist"], r["pred"]) for r in tree.collect()
        }
        return _route(rows, s, target)

    cost0, path0 = sp(set(), set(), source)
    if path0 is None:
        return []
    A = [(cost0, path0)]
    B: list[tuple[int, list[int]]] = []
    edge_cost: dict = {}

    def cache_path_weights(path: list[int]) -> None:
        """ONE broadcast-join job fetches every still-unknown edge
        weight along `path` (root costs only ever read edges of
        accepted A-paths, so this keeps the deviation loop at
        O(K * pathlen) Spark jobs — not O(K * pathlen * edges) as a
        per-edge lookup would)."""
        missing = [
            (int(path[j]), int(path[j + 1]))
            for j in range(len(path) - 1)
            if (path[j], path[j + 1]) not in edge_cost
        ]
        if not missing:
            return
        md = spark.createDataFrame(missing, "a long, b long")
        sc = spark.sparkContext
        # job-group tag: lets tests (and the Spark UI) count weight
        # fetches — exactly one job per accepted path, by contract.
        # Save/restore the caller's group so their cancelJobGroup
        # scoping survives this call (a hardcoded restore would
        # permanently re-tag the driver thread).
        prev_group = sc.getLocalProperty("spark.jobGroup.id")
        prev_desc = sc.getLocalProperty("spark.job.description")
        sc.setJobGroup("gdal-spark-yen-weights",
                       "batched spur-root edge weights")
        try:
            rows = (
                e0.join(
                    F.broadcast(md),
                    (e0["src"] == md["a"]) & (e0["dst"] == md["b"]),
                )
                .groupBy("src", "dst")
                .agg(F.min("w").alias("w"))
                .collect()
            )
        finally:
            sc.setLocalProperty("spark.jobGroup.id", prev_group)
            sc.setLocalProperty("spark.job.description", prev_desc)
        for r in rows:
            edge_cost[(r["src"], r["dst"])] = r["w"]

    cache_path_weights(path0)

    def w_of(a: int, b: int) -> int:
        return edge_cost[(a, b)]

    while len(A) < k:
        prev_path = A[-1][1]
        for i in range(len(prev_path) - 1):
            spur = prev_path[i]
            root = prev_path[: i + 1]
            removed_edges = set()
            for _c, p in A:
                if p[: i + 1] == root and len(p) > i + 1:
                    removed_edges.add((p[i], p[i + 1]))
            removed_nodes = set(root[:-1])
            spur_cost, spur_path = sp(removed_edges, removed_nodes, spur)
            if spur_path is None:
                continue
            root_cost = sum(
                w_of(root[j], root[j + 1]) for j in range(len(root) - 1)
            )
            cand = (root_cost + spur_cost, root[:-1] + spur_path)
            if cand not in B and cand not in A:
                B.append(cand)
        if not B:
            break
        B.sort(key=lambda cp: (cp[0], cp[1]))
        A.append(B.pop(0))
        cache_path_weights(A[-1][1])
    return A
