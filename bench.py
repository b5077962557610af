"""Benchmark harness — runs the headline queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Timed action: a value-consuming checksum — ``SUM(CRC32(TO_JSON(
STRUCT(*))))`` over the query's full result. ``count()`` is NOT used:
Catalyst prunes aggregate/window expressions whose values a bare count
never reads, so count-based timings understate real cost. The checksum
forces every output column of every row to be materialized while
keeping the consumption JVM-side (one scalar returns to the driver).

Each query is timed ``BENCH_RUNS`` times (default 5 as of round 5;
was 3) and the median is reported, bounding the run-to-run noise
(page cache / JIT) that made byte-identical code swing ~30% between
rounds 1 and 2 and again +26% between rounds 3 and 4 on unchanged
code (sub-second queries at sf0.1 are harness-noise dominated).

Round-over-round totals compare ONLY on shared keys. Round-5
verification of the r3→r4 +26% drift: with BENCH_RUNS=5 the r3-shared
total came back to 6.98 s vs r3's 7.51 s (0.93×) with the biggest r4
"regressors" reverting on byte-identical code (similarity_dot_topk
0.51→0.286 s, theta_join 0.653→0.453 s) — the drift was 3-run-median
harness noise, not a plan regression. Round 4 adds
``dedup_minhash_xxhash`` (the Spark-native fast-hash twin). Its
isolated signature stage is 1.47× faster than the md5 twin's
(sf0.1, 7-run medians 1.90 s vs 2.78 s); end-to-end the two queries
are within ~10% because the band-bucket join dominates — see
``operators/dedup.py::gram_hash``.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


HEADLINE = [
    # one per operator family: variant parse+extract, explicit codec,
    # scan-agg, broadcast join, multi-join, window, rollup, distinct,
    # as-of join, theta join, minhash dedup, embedding dedup,
    # similarity top-k, text analysis
    "variant_events_agg",
    "variant_explicit_codec",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "window_top3_orders_per_customer",
    "window_lag_lead_events",
    "rollup_order_status",
    "distinct_agg_suppliers",
    "asof_join_events_orders",
    "theta_join_late_shipments",
    "dedup_minhash_lsh",
    "dedup_minhash_xxhash",
    "dedup_embedding_cosine",
    "similarity_dot_topk",
    "text_token_counts",
    # round 5: broadcast-model classifier inference family
    "text_quality_classifier",
    # round 5 (second wave): continuous-ingest family
    "dedup_incremental_index",
    "similarity_knn_graph",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    os.environ.setdefault("PYTHONPATH", os.path.dirname(os.path.abspath(__file__)))

    from datafusion_functions_variant_spark.plans.session import get_session
    from datafusion_functions_variant_spark.queries import load_all_queries

    spark = get_session(app_name="bench", master=f"local[{cpus}]",
                        shuffle_partitions=max(cpus, 16))
    spark.sparkContext.setLogLevel("ERROR")
    registry = load_all_queries()

    # warm up the JVM + parquet footers once with a trivial action
    spark.read.parquet(os.path.join(sf_dir, "region.parquet")).count()

    from pyspark.sql import functions as F

    def consume(df) -> None:
        # Materialize EVERY output column of EVERY row: checksum the
        # row struct and fold to one scalar. Unlike count(), Catalyst
        # cannot prune any expression feeding the result.
        df.select(
            F.sum(F.crc32(F.to_json(F.struct(*df.columns)).cast("binary")))
        ).collect()

    runs = int(os.environ.get("BENCH_RUNS", "5"))
    timings: dict[str, float] = {}
    for name in HEADLINE:
        spec = registry.get(name)
        if spec is None:
            continue
        samples = []
        # one untimed warm-up: JIT + page cache + shuffle-file reuse
        # otherwise land in the first timed sample and skew a 3-run
        # median upward by ~2x on the UDF-heavy queries
        for i in range(runs + 1):
            df = spec.build(spark, sf_dir)
            t0 = time.perf_counter()
            consume(df)
            if i:
                samples.append(time.perf_counter() - t0)
        timings[name] = round(sorted(samples)[len(samples) // 2], 3)

    total = round(sum(timings.values()), 3)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall_clock",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
