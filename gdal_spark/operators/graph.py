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

__all__ = ["connected_components"]


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
