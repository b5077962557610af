"""Distributed total-order ranking without a single-partition window.

``row_number() OVER (ORDER BY …)`` with no PARTITION BY is the
canonical Spark scale anti-pattern: the whole dataset funnels through
ONE task. ``global_rank`` replaces it with literal range buckets:

1. ~``buckets`` quantile boundaries of the sort key are computed ONCE
   on the driver (``approxQuantile`` — a merged Greenwald-Khanna
   sketch, no materialized sort) and baked into the plan as literals,
   so every pass buckets rows identically. ``repartitionByRange`` is
   NOT used because its sampled boundaries can differ between the
   counts job and the final job, corrupting the offsets.
2. each row gets its bucket via the literal bounds — equal keys land
   in the same bucket, so bucket order respects global order;
3. rank within each bucket (one window exchange on the bucket id);
4. per-bucket counts (one bigint per bucket — driver-safe at any
   scale) become cumulative offsets: global = local + offset.

The reference has no sort/rank machinery at all (its only orderings
are intra-value binary searches, SURVEY.md §2 Part B row 7).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def global_rank(
    df: DataFrame,
    value_col: str,
    tiebreak_col: str,
    ascending: bool = False,
    buckets: int = 16,
    rank_col: str = "rank",
) -> DataFrame:
    """Append an exact global ``row_number`` over
    (value_col ``ascending``, tiebreak_col ASC) — (value, tiebreak)
    must be unique per row for the rank to be well-defined.

    NULL sort keys get a dedicated bucket matching Spark's window
    ordering defaults (ASC → NULLS FIRST, DESC → NULLS LAST); they
    never interleave with real values.
    """
    bounds = sorted(
        set(
            df.approxQuantile(
                value_col, [i / buckets for i in range(1, buckets)], 0.01
            )
        )
    )
    barr = F.array(*[F.lit(b) for b in bounds])
    if ascending:
        bucket = F.when(F.col(value_col).isNull(), F.lit(-1)).otherwise(
            F.size(F.filter(barr, lambda b: b < F.col(value_col)))
        )
        order = [F.asc(value_col), F.asc(tiebreak_col)]
    else:
        bucket = F.when(
            F.col(value_col).isNull(), F.lit(len(bounds) + 1)
        ).otherwise(F.size(F.filter(barr, lambda b: b > F.col(value_col))))
        order = [F.desc(value_col), F.asc(tiebreak_col)]
    bucketed = df.withColumn("_bucket", bucket)

    counts = {
        r["_bucket"]: r["cnt"]
        for r in bucketed.groupBy("_bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    offsets, running = {}, 0
    for b in sorted(counts):
        offsets[b] = running
        running += counts[b]
    offset_col = F.element_at(
        F.create_map(*[F.lit(x) for kv in offsets.items() for x in kv]),
        F.col("_bucket"),
    )
    w = Window.partitionBy("_bucket").orderBy(*order)
    return (
        bucketed.withColumn(
            rank_col, (F.row_number().over(w) + offset_col).cast("bigint")
        )
        .drop("_bucket")
    )
