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
