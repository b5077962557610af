"""Time-series operators: dense spine generation, gap-fill, and
last-observation-carried-forward — the hypertable-style resampling
layer (reference has nothing comparable; pure Spark capability).

Scale notes: the spine is ``sequence()``-generated from the data's own
bounds (two scalars, broadcast) crossed with the key dimension — never
a driver-side loop; LOCF is one window per key ordered by bucket, the
same single shuffle the aggregation already needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def hourly_gapfill_locf(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """Hourly resample per key with zero-filled counts and LOCF sums.

    Returns (key, hour, n, sum_value, locf_sum): every (key, hour) in
    the data's [min, max] hour range appears; missing hours carry
    n = 0, sum_value null, and locf_sum = the latest earlier non-null
    sum for that key.
    """
    hour = F.date_trunc("hour", F.col(ts_col))
    agg = (
        events.groupBy(F.col(key_col).alias("key"), hour.alias("hour"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col(value_col).cast("decimal(18,2)")).cast("double").alias("sum_value"),
        )
    )
    bounds = events.agg(
        F.date_trunc("hour", F.min(ts_col)).alias("lo"),
        F.date_trunc("hour", F.max(ts_col)).alias("hi"),
    )
    keys = events.select(F.col(key_col).alias("key")).distinct()
    spine = (
        keys.crossJoin(F.broadcast(bounds))
        .select(
            "key",
            F.explode(
                F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))
            ).alias("hour"),
        )
    )
    dense = spine.join(agg, ["key", "hour"], "left").select(
        "key",
        "hour",
        F.coalesce("n", F.lit(0)).alias("n"),
        "sum_value",
    )
    w = (
        Window.partitionBy("key")
        .orderBy("hour")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return dense.withColumn(
        "locf_sum", F.last("sum_value", ignorenulls=True).over(w)
    )


def hourly_interpolate_linear(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """Hourly resample per key with time-weighted LINEAR interpolation
    across gaps (the complement of LOCF): a missing hour gets
    prev + (next - prev) * (t - t_prev) / (t_next - t_prev) between its
    nearest observed neighbors; leading/trailing gaps stay null.

    Exactness: observed sums become integer cents, hour positions
    integer epoch-hours, and the interpolation is (pv*(nh-h) +
    nv*(h-ph)) floor-div (nh-ph) — all-integer, so any engine
    reproduces it bit-for-bit; the single final /100 maps back to
    value units. Both neighbor windows (last-non-null backward,
    first-non-null forward) share the key partitioning and hour order:
    one shuffle end-to-end, same as the LOCF path.
    """
    hour = F.date_trunc("hour", F.col(ts_col))
    agg = events.groupBy(F.col(key_col).alias("key"), hour.alias("hour")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col(value_col).cast("decimal(18,2)")).cast("double").alias("sum_value"),
    )
    bounds = events.agg(
        F.date_trunc("hour", F.min(ts_col)).alias("lo"),
        F.date_trunc("hour", F.max(ts_col)).alias("hi"),
    )
    keys = events.select(F.col(key_col).alias("key")).distinct()
    spine = keys.crossJoin(F.broadcast(bounds)).select(
        "key",
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))).alias("hour"),
    )
    dense = spine.join(agg, ["key", "hour"], "left").select(
        "key",
        "hour",
        F.coalesce("n", F.lit(0)).alias("n"),
        "sum_value",
        # epoch-hours: timestamp->long is epoch seconds independent of
        # the session zone, so neighbor distances are DST-proof
        (F.col("hour").cast("long") / F.lit(3600)).cast("long").alias("h"),
    )
    observed = F.col("n") > 0
    dense = dense.withColumn(
        "cents", F.when(observed, F.floor(F.col("sum_value") * 100).cast("long"))
    ).withColumn("oh", F.when(observed, F.col("h")))
    wp = (
        Window.partitionBy("key")
        .orderBy("hour")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wn = (
        Window.partitionBy("key")
        .orderBy("hour")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    neigh = (
        dense.withColumn("pv", F.last("cents", ignorenulls=True).over(wp))
        .withColumn("ph", F.last("oh", ignorenulls=True).over(wp))
        .withColumn("nv", F.first("cents", ignorenulls=True).over(wn))
        .withColumn("nh", F.first("oh", ignorenulls=True).over(wn))
    )
    interp_cents = F.when(observed, F.col("cents")).otherwise(
        F.when(
            F.col("pv").isNotNull() & F.col("nv").isNotNull(),
            F.expr("(pv * (nh - h) + nv * (h - ph)) div (nh - ph)"),
        )
    )
    return neigh.select(
        "key",
        "hour",
        "n",
        "sum_value",
        F.round(interp_cents / F.lit(100.0), 6).alias("interp_value"),
    )
