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


def triangle_counts(pairs: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Per-vertex triangle participation counts for the undirected
    graph given by ``pairs`` (one row per edge, any orientation,
    duplicates tolerated).

    Degree-ordered orientation — the standard distributed formulation:
    every edge is directed from its lower-degree endpoint to the
    higher (ties by id), so each wedge is enumerated exactly once at
    its lowest-degree vertex and a triangle is found exactly once.
    The join fan-out per vertex is then bounded by its ORIENTED
    out-degree, which is O(sqrt(m)) even for hub vertices — a
    100 TB-corpus hub with 10^6 dup-neighbors contributes its wedges
    from the low-degree side instead of exploding 10^12 wedge rows.
    Two shuffles (wedge build on the mid vertex, closure probe on the
    (lo, hi) edge key); the tiny degree relation broadcasts.

    Returns (v, n_triangles) for every vertex in at least one
    triangle.
    """
    e = pairs.select(F.col(src).alias("a"), F.col(dst).alias("b")).where(
        F.col("a") != F.col("b")
    )
    und = e.union(e.select(F.col("b").alias("a"), F.col("a").alias("b"))).distinct()
    deg = und.groupBy("a").agg(F.count(F.lit(1)).alias("d")).select(
        F.col("a").alias("v"), "d"
    )
    da = deg.select(F.col("v").alias("a"), F.col("d").alias("da"))
    db = deg.select(F.col("v").alias("b"), F.col("d").alias("db"))
    oriented = (
        und.join(F.broadcast(da), "a")
        .join(F.broadcast(db), "b")
        .where(
            (F.col("da") < F.col("db"))
            | ((F.col("da") == F.col("db")) & (F.col("a") < F.col("b")))
        )
        .select(F.col("a").alias("lo"), F.col("b").alias("hi"))
    )
    # wedges centered at the lowest-degree vertex: lo -> x, lo -> y
    w1 = oriented.select(F.col("lo"), F.col("hi").alias("x"))
    w2 = oriented.select(F.col("lo"), F.col("hi").alias("y"))
    wedges = w1.join(w2, "lo").where(F.col("x") < F.col("y"))
    closed = wedges.join(
        oriented.select(
            F.least("lo", "hi").alias("cx"), F.greatest("lo", "hi").alias("cy")
        ).distinct(),
        (F.col("x") == F.col("cx")) & (F.col("y") == F.col("cy"))
        # the closing edge may be oriented either way; compare unordered
    ).select("lo", "x", "y")
    per_vertex = (
        closed.select(F.col("lo").alias("v"))
        .union(closed.select(F.col("x").alias("v")))
        .union(closed.select(F.col("y").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    return per_vertex
