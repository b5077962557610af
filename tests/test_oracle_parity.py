"""Mimic the driver's correctness gate locally: run every registered
query on Spark AND its DuckDB oracle on the same parquet dir, compare
row count, column names, and order-insensitive values exactly.

Runs at sf0.001 by default (fast); set TEST_SF_DIR=/root/testdata/sf0.01
to match the driver's scale.
"""

from __future__ import annotations

import math

import pytest

from datafusion_functions_variant_spark.queries import load_all_queries

from .conftest import SF_DIR

REGISTRY = load_all_queries()
ORACLED = sorted(n for n, s in REGISTRY.items() if s.oracle is not None)


def normalize_cell(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return v
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # exact comparison intended — queries are written to be
        # bit-deterministic across engines; round only to kill
        # repr noise at the 12th decimal of double arithmetic
        return round(v, 9)
    if isinstance(v, int):
        return v
    return str(v)


def rows_to_multiset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    normalized = [tuple(normalize_cell(r[i]) for i in order) for r in rows]
    # sort key tolerates None and mixed types (null grouping keys)
    return sorted(
        normalized, key=lambda t: tuple((v is None, str(v)) for v in t)
    ), [cols[i] for i in order]


@pytest.mark.parametrize("name", ORACLED)
def test_parity(name, spark, duck):
    spec = REGISTRY[name]
    sdf = spec.build(spark, SF_DIR)
    srows = [tuple(r) for r in sdf.collect()]
    scols = sdf.columns

    rel = duck.sql(spec.oracle)
    dcols = list(rel.columns)
    drows = [tuple(r) for r in rel.fetchall()]

    assert sorted(scols) == sorted(dcols), f"{name}: column names differ"
    assert len(srows) == len(drows), f"{name}: row count {len(srows)} vs {len(drows)}"
    sset, _ = rows_to_multiset(scols, srows)
    dset, _ = rows_to_multiset(dcols, drows)
    mismatches = [(a, b) for a, b in zip(sset, dset) if a != b]
    assert not mismatches, f"{name}: first mismatches {mismatches[:3]}"
