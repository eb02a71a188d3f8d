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

Convergence: labels only decrease and each round propagates the
component minimum one hop, so rounds == graph eccentricity of the
min vertex (tiny for dedup clusters / raster adjacency graphs).
localCheckpoint() truncates lineage each round so plans stay flat.
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
    until a fixpoint. No driver-side collection of vertices or edges.
    """
    e = edges.select(
        F.col(src).cast("long").alias("src"), F.col(dst).cast("long").alias("dst")
    )
    sym = (
        e.unionByName(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .where(F.col("src") != F.col("dst"))
        .dropDuplicates(["src", "dst"])
        .localCheckpoint()
    )
    labels = (
        sym.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("root", F.col("id"))
        .localCheckpoint()
    )
    for _ in range(max_iter):
        msgs = (
            sym.join(labels, sym["dst"] == labels["id"])
            .select(F.col("src").alias("id"), F.col("root"))
        )
        new_labels = (
            labels.select("id", "root")
            .unionByName(msgs)
            .groupBy("id")
            .agg(F.min("root").alias("root"))
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
