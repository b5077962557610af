"""transformWithStateInPandas (Spark 4's typed-state successor to
applyInPandasWithState). Its state-server wire protocol needs the
python ``protobuf`` package, which this container lacks — the test
auto-skips here and runs on any normally-provisioned cluster."""

from __future__ import annotations

import pytest

from .conftest import SF_DIR

ROCKSDB = "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"


def test_transform_with_state_profile(spark):
    pytest.importorskip(
        "google.protobuf",
        reason="transformWithState state-server protocol requires protobuf",
    )
    import pyspark.sql.functions as F

    from datafusion_functions_variant_spark.sources.tables import load_table
    from datafusion_functions_variant_spark.streaming import core

    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set("spark.sql.streaming.stateStore.providerClass", ROCKSDB)
    try:
        st = core.read_events_stream(spark, SF_DIR)
        out = core.run_to_batch(core.transform_with_state_profile(st), "update")
        # counts are monotonic → last (= max) emission is the final state
        got = (
            out.groupBy("user_id", "event_type")
            .agg(
                F.max("n_type").alias("n_type"),
                F.max("n_total").alias("n_total"),
                F.max("sum_value").alias("sum_value"),
            )
            .orderBy("user_id", "event_type")
            .collect()
        )
        ev = load_table(spark, SF_DIR, "events")
        per_type = (
            ev.groupBy("user_id", "event_type")
            .agg(
                F.count(F.lit(1)).alias("n_type"),
                F.sum(F.col("value").cast("decimal(18,2)")).alias("s"),
            )
        )
        from pyspark.sql import Window

        uw = Window.partitionBy("user_id")
        want = (
            per_type.select(
                "user_id",
                "event_type",
                "n_type",
                F.sum("n_type").over(uw).alias("n_total"),
                F.sum("s").over(uw).cast("double").alias("sum_value"),
            )
            .orderBy("user_id", "event_type")
            .collect()
        )
        assert [tuple(r) for r in got] == [tuple(r) for r in want]
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)
