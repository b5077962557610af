"""Registry-wide physical-plan audit (round 7): a TRUE CartesianProduct
is a defect in ANY registered query — the 100 TB blanket invariant the
per-query pins sample. Building ~225 batch plans takes minutes, so the
sweep is env-gated: run as part of the round battery with

    REGISTRY_PLAN_AUDIT=1 python -m pytest tests/test_registry_plan_audit.py -q

Streaming queries are excluded (their builders run real micro-batch
streams; tests/test_streaming_state.py and the stream plan pins cover
them). A 1-row broadcast cross join compiles to BroadcastNestedLoopJoin,
never CartesianProduct, so no whitelist is needed — and none has been.
"""

from __future__ import annotations

import os

import pytest

from datafusion_functions_variant_spark.queries import load_all_queries

REGISTRY = load_all_queries()
SF = os.environ.get("TEST_SF_DIR", "/root/testdata/sf0.001")
GATED = os.environ.get("REGISTRY_PLAN_AUDIT") != "1"

BATCH_NAMES = sorted(n for n in REGISTRY if not n.startswith("stream_"))


@pytest.mark.skipif(GATED, reason="set REGISTRY_PLAN_AUDIT=1 (round-battery sweep)")
def test_no_cartesian_product_anywhere(spark):
    offenders = []
    for name in BATCH_NAMES:
        df = REGISTRY[name].build(spark, SF)
        plan = df._jdf.queryExecution().executedPlan().toString()
        if "CartesianProduct" in plan:
            offenders.append(name)
    assert not offenders, f"CartesianProduct in: {offenders}"
