"""Distributed graph primitives for dedup-cluster assembly.

One algorithm lives here: connected components by iterative min-label
propagation — the post-processing step every pair-mining dedup pipeline
(LSH, SimHash, exact-hash) runs to turn candidate PAIRS into duplicate
CLUSTERS.

Scale design (100 TB corpora): the edge set is candidate pairs, which
the blocked generators upstream keep ≪ corpus size. Each iteration is
one edge join + groupBy (one-hop min propagation) plus one label
self-join (pointer-doubling shortcut: component ← component of the
component), so convergence is O(log diameter) even on path-shaped
graphs, not O(diameter). Labels are localCheckpoint'ed EAGERLY each
iteration — persist alone caches data but leaves the logical plan
growing (each round references the previous twice, so the plan tree
doubles per round; by ~12 rounds plan stringification alone OOMs the
driver). The loop early-exits on the first fixpoint via a LIMIT 1
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
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iters):
        # one-hop: neighbor minimum, then min(own, neighbors') —
        # monotone non-increasing, fixpoint = the component min
        nbr = (
            edges.join(labels, edges.dst == labels.v)
            .groupBy("src")
            .agg(F.min("component").alias("nbr_min"))
        )
        hopped = labels.join(nbr, labels.v == nbr.src, "left").select(
            "v",
            F.least(
                F.col("component"), F.coalesce("nbr_min", F.col("component"))
            ).alias("component"),
        )
        # pointer-doubling shortcut: follow the label one more level
        # (component ← its component's component). Halves the longest
        # label chain each round → O(log diameter) total.
        short = hopped.select(
            F.col("v").alias("sv"), F.col("component").alias("sc")
        )
        new_labels = (
            hopped.join(short, hopped.component == short.sv, "left")
            .select(
                "v",
                F.least(
                    F.col("component"), F.coalesce("sc", F.col("component"))
                ).alias("component"),
            )
            # EAGER lineage cut: without it the logical plan doubles per
            # iteration (explain/compile alone OOMs around 12 rounds)
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "v")
            .where(F.col("n.component") != F.col("o.component"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    # edges stay cached (tiny); labels' lineage is cut by localCheckpoint
    return labels
