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

__all__ = ["connected_components", "shortest_paths"]


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
