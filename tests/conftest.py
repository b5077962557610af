"""Shared fixtures: one local SparkSession per test session, DuckDB
oracle connection with the driver's pre-registered views."""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# transformWithStateInPandas needs google.protobuf in BOTH the driver
# and the executor python workers; the vendor gate must adjust
# PYTHONPATH before the session-scoped JVM launches (workers inherit
# the JVM's env). No-op when the real wheel is installed.
from datafusion_functions_variant_spark.vendor import ensure_protobuf  # noqa: E402

PROTOBUF_PROVIDER = ensure_protobuf()

SF_DIR = os.environ.get("TEST_SF_DIR", "/root/testdata/sf0.001")
SF_DIR_MED = os.environ.get("TEST_SF_DIR_MED", "/root/testdata/sf0.01")

TABLE_NAMES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="session")
def spark():
    os.environ.setdefault("PYTHONPATH", os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from datafusion_functions_variant_spark.plans.session import get_session

    # overridable for driver-configuration replays, e.g.
    # TEST_SPARK_MASTER='local[32]' TEST_SHUFFLE_PARTITIONS=32
    # TEST_SF_DIR=/root/testdata/sf0.01 pytest tests/test_oracle_parity.py
    s = get_session(
        app_name="pytest",
        master=os.environ.get("TEST_SPARK_MASTER", "local[8]"),
        shuffle_partitions=int(os.environ.get("TEST_SHUFFLE_PARTITIONS", "8")),
    )
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


def make_duck(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


@pytest.fixture(scope="session")
def duck():
    return make_duck(SF_DIR)
