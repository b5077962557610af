"""Test-table catalog: parquet sources with schema normalization.

The reference has no sources at all (SURVEY.md §2 Part B: Arrow arrays
in-memory only); in our engine the scan layer is Spark's parquet
DataSource — predicate pushdown, column pruning and partition pruning
come for free as long as we keep the plan declarative.

The one normalization: ``events.ts`` is physically parquet
timestamp[NANOS], which Spark 4 reads only as a raw BIGINT (with
``spark.sql.legacy.parquet.nanosAsLong=true``). We expose ``ts`` as a
proper TIMESTAMP (microsecond, floor-truncated from nanos — matching
what DuckDB does when it reads the same file) plus ``ts_ns`` with the
raw value.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.session import tune

TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def normalize_timestamps(df: DataFrame) -> DataFrame:
    """Normalize the two physical timestamp encodings the test driver
    has generated over time to one logical shape:

    * ``ts`` as parquet NANOS → Spark reads a raw BIGINT (with
      ``nanosAsLong``); expose TIMESTAMP (micros, floor-truncated like
      DuckDB) and keep the raw value as ``ts_ns``.
    * any TIMESTAMP_NTZ (parquet micros, isAdjustedToUTC=false, read
      before the session conf disabled NTZ inference) → cast to
      TIMESTAMP, epoch-identical under the UTC session timezone.
    """
    if dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumnRenamed("ts", "ts_ns").withColumn(
            "ts", F.expr("timestamp_micros(ts_ns div 1000)")
        )
    for col, dtype in df.dtypes:
        if dtype == "timestamp_ntz":
            df = df.withColumn(col, F.col(col).cast("timestamp"))
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    tune(spark)  # the driver's session may lack nanosAsLong etc.
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    return normalize_timestamps(df)


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every table as a temp view for spark.sql queries."""
    tables = load_tables(spark, sf_dir)
    for name, df in tables.items():
        df.createOrReplaceTempView(name)
    return tables
