"""Join operators Spark lacks as primitives: as-of join and banded
range join (SURVEY.md §2 Part B row 4 'as-of/range').

Both are compositions of existing DataFrame ops — no UDFs, no
mapPartitions — so Catalyst keeps full visibility.

**As-of join** uses the union-merge formulation, the scalable plan:
tag both sides, union, one shuffle on the join key, and a running
``last(payload, ignorenulls)`` window ordered by (time, side). This
is O(n log n) per key with a single shuffle — versus the naive
``JOIN ON key AND r.t <= l.t`` + argmax which explodes to the full
cross product per key before aggregating. At 100 TB the union-merge
plan's shuffle is the same size as the inputs; the naive plan's
intermediate is unbounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    left_time: str,
    right_time: str,
    payload_cols: list[str],
) -> DataFrame:
    """For each left row, attach the payload of the latest right row
    with ``right_time <= left_time`` on the same key (backward as-of,
    inclusive — DuckDB ``ASOF JOIN ... ON l.t >= r.t`` semantics).

    Requires right to be unique per (key, time); pre-aggregate
    duplicates first or the tie-winner is unspecified.

    All payload columns ride through the window as ONE struct so every
    output column comes from the SAME matched right row. Carrying each
    column independently via ``last(c, ignorenulls=True)`` would let a
    NULL field of the matched row be back-filled from an older row,
    silently mixing payloads across rows.
    """
    l2 = (
        left.withColumn("_k", F.col(left_on))
        .withColumn("_t", F.col(left_time))
        .withColumn("_side", F.lit(1))
    )
    r2 = right.select(
        F.col(right_on).alias("_k"),
        F.col(right_time).alias("_t"),
        F.lit(0).alias("_side"),
        F.struct(*[F.col(c) for c in payload_cols]).alias("_payload"),
    )
    u = l2.unionByName(r2, allowMissingColumns=True)
    # right rows sort before left rows at equal time (_side 0 < 1), so
    # an exactly-simultaneous right row IS visible to the left row.
    w = (
        Window.partitionBy("_k")
        .orderBy("_t", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    u = u.withColumn("_payload", F.last("_payload", ignorenulls=True).over(w))
    out = u.where(F.col("_side") == 1)
    for c in payload_cols:
        out = out.withColumn(c, F.col("_payload")[c])
    return out.drop("_k", "_t", "_side", "_payload")


def range_band_join(
    facts: DataFrame,
    bands: DataFrame,
    value_col: str,
    lo_col: str = "lo",
    hi_col: str = "hi",
) -> DataFrame:
    """Banded range join: attach the band whose [lo, hi] contains the
    value. Bands are by construction few → broadcast; the range
    predicate evaluates inside the broadcast hash join's stream side,
    never a cartesian shuffle."""
    return facts.join(
        F.broadcast(bands),
        (F.col(value_col) >= F.col(lo_col)) & (F.col(value_col) <= F.col(hi_col)),
        "left",
    )


def asof_join_forward(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    left_time: str,
    right_time: str,
    payload_cols: list[str],
    tolerance_us: int | None = None,
) -> DataFrame:
    """For each left row, attach the payload of the EARLIEST right row
    with ``right_time >= left_time`` on the same key (forward as-of,
    inclusive), optionally only when it lands within ``tolerance_us``
    microseconds. Same union-merge design as asof_join_backward — ONE
    shuffle on the key, a forward-looking window frame instead of a
    sort-merge self-join — so the plan scales identically. The matched
    right time and all payload columns ride through the window as ONE
    struct, so the tolerance check and every output column are
    guaranteed to come from the SAME matched right row (independent
    ``first(ignorenulls)`` carries could mix rows when a payload field
    of the matched row is NULL).

    Requires right to be unique per (key, time).
    """
    l2 = (
        left.withColumn("_k", F.col(left_on))
        .withColumn("_t", F.col(left_time))
        .withColumn("_side", F.lit(0))
    )
    r2 = right.select(
        F.col(right_on).alias("_k"),
        F.col(right_time).alias("_t"),
        F.lit(1).alias("_side"),
        F.struct(
            # cast: parquet may surface the right time as TIMESTAMP_NTZ
            # while the left is TIMESTAMP; unix_micros needs the latter
            F.col(right_time).cast("timestamp").alias("_rt"),
            *[F.col(c) for c in payload_cols],
        ).alias("_payload"),
    )
    u = l2.unionByName(r2, allowMissingColumns=True)
    # left rows sort before right rows at equal time (_side 0 < 1), so
    # an exactly-simultaneous right row IS visible forward.
    w = (
        Window.partitionBy("_k")
        .orderBy("_t", "_side")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    u = u.withColumn("_payload", F.first("_payload", ignorenulls=True).over(w))
    out = u.where(F.col("_side") == 0)
    out = out.withColumn("_matched_t", F.col("_payload._rt"))
    for c in payload_cols:
        out = out.withColumn(c, F.col("_payload")[c])
    if tolerance_us is not None:
        in_tol = (
            F.unix_micros(F.col("_matched_t")) - F.unix_micros(F.col("_t"))
        ) <= F.lit(tolerance_us)
        for c in payload_cols:
            out = out.withColumn(c, F.when(in_tol, F.col(c)))
        out = out.withColumn("_matched_t", F.when(in_tol, F.col("_matched_t")))
    return out.withColumnRenamed("_matched_t", "matched_time").drop(
        "_k", "_t", "_side", "_payload"
    )


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    l_start: str,
    l_end: str,
    r_start: str,
    r_end: str,
    bucket_us: int,
) -> DataFrame:
    """All pairs of overlapping intervals per key (inclusive bounds:
    ``l_start <= r_end AND r_start <= l_end``) — the temporal-overlap
    join Spark has no primitive for.

    Timeline-bucketed formulation: each interval explodes to the
    ``bucket_us``-wide epoch buckets it spans (in-row sequence), the
    sides equi-join on (key, bucket) — a plain hash join, never a
    cartesian range shuffle — and the exact overlap predicate filters
    the colliding pairs. A pair sharing several buckets is emitted
    ONCE without any distinct: only the FIRST shared bucket — which is
    exactly ``greatest(bucket(l_start), bucket(r_start))`` for
    overlapping intervals — keeps the pair. Choose ``bucket_us`` near
    the typical interval length: the per-row explode factor is
    interval_span/bucket_us + 1, and the join key cardinality stays
    ~rows, so the shuffle is input-sized. A pathological interval
    spanning the whole timeline fans out timeline/bucket_us rows —
    clamp or split such outliers upstream.

    Emits every left and right column plus ``overlap_us``.
    """
    def bucket(col: str) -> F.Column:
        return F.floor(F.unix_micros(F.col(col)) / F.lit(bucket_us))

    lb = left.withColumn(
        "_lsb", bucket(l_start)
    ).withColumn("_b", F.explode(F.sequence(bucket(l_start), bucket(l_end))))
    rb = right.withColumn(
        "_rsb", bucket(r_start)
    ).withColumn("_rb", F.explode(F.sequence(bucket(r_start), bucket(r_end))))
    joined = lb.join(
        rb,
        (lb[key] == rb[key]) & (F.col("_b") == F.col("_rb")),
    ).drop(rb[key])
    overlap = (
        joined.where(
            (F.col(l_start) <= F.col(r_end))
            & (F.col(r_start) <= F.col(l_end))
            # first-shared-bucket dedup: emit the pair only where the
            # later-starting interval's first bucket meets the join
            & (F.col("_b") == F.greatest(F.col("_lsb"), F.col("_rsb")))
        )
        .withColumn(
            "overlap_us",
            F.unix_micros(F.least(F.col(l_end), F.col(r_end)))
            - F.unix_micros(F.greatest(F.col(l_start), F.col(r_start))),
        )
        .drop("_b", "_rb", "_lsb", "_rsb")
    )
    return overlap


def asof_join_nearest(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    left_time: str,
    right_time: str,
    payload_cols: list[str],
) -> DataFrame:
    """For each left row, attach the payload of the CLOSEST right row
    in time on the same key, looking both directions (ties go to the
    backward/earlier match). Completes the as-of family
    (backward / forward / nearest — pandas merge_asof's three
    directions).

    Same union-merge design as the directional variants, and still
    ONE shuffle: both window frames (running last before, running
    first after) share the identical partitioning and ordering, so
    Catalyst evaluates them over a single sort. The matched time
    rides inside each payload struct, so the closer-of-the-two choice
    and every output column come from the same right row.
    """
    l2 = (
        left.withColumn("_k", F.col(left_on))
        .withColumn("_t", F.col(left_time))
        .withColumn("_side", F.lit(1))
    )
    r2 = right.select(
        F.col(right_on).alias("_k"),
        F.col(right_time).alias("_t"),
        F.lit(0).alias("_side"),
        F.struct(
            F.col(right_time).cast("timestamp").alias("_rt"),
            *[F.col(c) for c in payload_cols],
        ).alias("_payload"),
    )
    u = l2.unionByName(r2, allowMissingColumns=True)
    # backward pass: right rows sort first at equal _t (_side 0 < 1) so
    # simultaneous matches are visible; forward pass mirrors it.
    order_bwd = Window.partitionBy("_k").orderBy("_t", "_side")
    bwd = order_bwd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    fwd = order_bwd.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    u = u.withColumn("_pb", F.last("_payload", ignorenulls=True).over(bwd))
    u = u.withColumn("_pf", F.first("_payload", ignorenulls=True).over(fwd))
    gap_b = F.unix_micros(F.col("_t")) - F.unix_micros(F.col("_pb._rt"))
    gap_f = F.unix_micros(F.col("_pf._rt")) - F.unix_micros(F.col("_t"))
    pick = (
        F.when(F.col("_pb").isNull(), F.col("_pf"))
        .when(F.col("_pf").isNull(), F.col("_pb"))
        .when(gap_b <= gap_f, F.col("_pb"))
        .otherwise(F.col("_pf"))
    )
    out = u.where(F.col("_side") == 1).withColumn("_pick", pick)
    out = out.withColumn("matched_time", F.col("_pick._rt"))
    for c in payload_cols:
        out = out.withColumn(c, F.col("_pick")[c])
    return out.drop("_k", "_t", "_side", "_payload", "_pb", "_pf", "_pick")
