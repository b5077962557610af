"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real logic lives in the ``datafusion_functions_variant_spark``
package; this module only adapts its query registry to the contract.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from datafusion_functions_variant_spark.queries import load_all_queries  # noqa: E402

_SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    JSON → variant ingestion, typed path extraction, grouped
    aggregation — the reference's whole pipeline in one query
    (SURVEY.md §3 entry point 1 + §2 Part B aggregation).
    """
    registry = load_all_queries()
    return registry["variant_events_agg"].build(spark, _SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: spec.build for name, spec in load_all_queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB twins; omitted entries get the weaker rows-only check."""
    return {
        name: spec.oracle
        for name, spec in load_all_queries().items()
        if spec.oracle is not None
    }
