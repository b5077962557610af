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


def test_checkpoint_recovery_exactly_once(spark, tmp_path):
    """Checkpointed restart: a file-source → parquet-sink stream is
    run, stopped, fed a second input file, and restarted with the SAME
    checkpoint. The restarted query must process ONLY the new file
    (offset log) and the sink must stay exactly-once (no re-emission
    of batch 0's rows) — the recovery contract a 100 TB pipeline
    leans on after every executor/driver failure."""
    import shutil

    from pyspark.sql import functions as F

    from datafusion_functions_variant_spark.sources.tables import load_table

    from .conftest import SF_DIR

    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    chk_dir = str(tmp_path / "chk")
    ev = load_table(spark, SF_DIR, "events").select("event_id", "event_type")
    a = ev.where(F.col("event_id") % 2 == 0)
    b = ev.where(F.col("event_id") % 2 == 1)
    n_a, n_b = a.count(), b.count()

    a.coalesce(1).write.mode("overwrite").parquet(in_dir)
    schema = spark.read.parquet(in_dir).schema

    def run_once():
        q = (
            spark.readStream.schema(schema)
            .parquet(in_dir)
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", chk_dir)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run_once()
    assert spark.read.parquet(out_dir).count() == n_a

    # second generation of input arrives after the first run stopped
    stage = str(tmp_path / "stage")
    b.coalesce(1).write.mode("overwrite").parquet(stage)
    part = next(
        p for p in __import__("os").listdir(stage) if p.endswith(".parquet")
    )
    shutil.copy(f"{stage}/{part}", f"{in_dir}/gen2.parquet")

    run_once()
    out = spark.read.parquet(out_dir)
    assert out.count() == n_a + n_b  # batch 0 NOT re-emitted
    assert out.select("event_id").distinct().count() == n_a + n_b
