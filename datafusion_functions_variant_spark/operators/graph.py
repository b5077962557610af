"""Distributed graph primitives for dedup-cluster assembly.

One algorithm lives here: connected components by iterative min-label
propagation — the post-processing step every pair-mining dedup pipeline
(LSH, SimHash, exact-hash) runs to turn candidate PAIRS into duplicate
CLUSTERS.

Scale design (100 TB corpora): the edge set is candidate pairs, which
the blocked generators upstream keep ≪ corpus size. Each iteration is
one join + one groupBy on that small edge relation; labels converge in
≤ log2(component diameter) rounds (duplicate clusters are near-cliques,
so diameter is tiny — 8 rounds is already generous). Both relations are
persisted so an iteration never re-evaluates the expensive pair-mining
lineage, and the loop early-exits on the first fixpoint via a LIMIT 1
changed-row probe (no full count).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def min_label_components(
    pairs: DataFrame, src: str = "src", dst: str = "dst", max_iters: int = 8
) -> DataFrame:
    """Connected components of the undirected graph given by ``pairs``.

    Returns (v, component) for every vertex appearing in ``pairs``,
    where component = the minimum vertex id reachable from v — the
    min-id keeper convention shared with exact_dedup_groups and the
    LSH star-pair overflow path, so cluster labels agree across all
    dedup tiers. Vertices with no edges are absent (they are their own
    singleton component; callers left-join and coalesce to v).
    """
    edges = pairs.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    edges = edges.union(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).persist()
    labels = (
        edges.select(F.col("src").alias("v"))
        .distinct()
        .withColumn("component", F.col("v"))
        .persist()
    )
    for _ in range(max_iters):
        # neighbor minimum, then min(own, neighbors') — monotone
        # non-increasing, so the fixpoint is exactly the component min
        nbr = (
            edges.join(labels, edges.dst == labels.v)
            .groupBy("src")
            .agg(F.min("component").alias("nbr_min"))
        )
        new_labels = (
            labels.join(nbr, labels.v == nbr.src, "left")
            .select(
                "v",
                F.least(
                    F.col("component"), F.coalesce("nbr_min", F.col("component"))
                ).alias("component"),
            )
            .persist()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "v")
            .where(F.col("n.component") != F.col("o.component"))
            .limit(1)
            .count()
        )
        labels.unpersist()
        labels = new_labels
        if changed == 0:
            break
    # edges stay cached (tiny); labels' lineage is already cut by persist
    return labels
