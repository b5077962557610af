"""Query registry — the driver-facing catalog of every implemented
operator (SURVEY.md §2 coverage).

Each query is a (Spark builder, DuckDB oracle SQL) pair registered via
the ``@query`` decorator. ``__spark_entry__.py`` exposes the registry
through the driver contract (``queries()`` / ``oracle_sql()``).

Determinism rules for oracle parity (the driver hash-compares values):

* Never SUM raw doubles — cast to DECIMAL first (exact, associative)
  and cast the result back to double: ``dsum`` / its SQL twin.
* DuckDB SUM over integers returns HUGEINT — always CAST to BIGINT in
  the oracle.
* Don't return raw timestamps; project dates as 'yyyy-MM-dd' strings
  or epoch integers.
* Alias every computed column identically on both sides.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass
class QuerySpec:
    name: str
    build: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # None → driver runs rows-only check
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def query(name: str, oracle: str | None = None):
    def deco(fn):
        REGISTRY[name] = QuerySpec(name=name, build=fn, oracle=oracle, doc=fn.__doc__ or "")
        return fn

    return deco


# --- determinism helpers ----------------------------------------------------


def dsum(col: str | Column, alias: str, scale: int = 2) -> Column:
    """Exact sum of a double column via decimal, surfaced as double."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal(18,{scale})")).cast("double").alias(alias)


def dsum_sql(expr: str, alias: str, scale: int = 2) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(18,{scale}))) AS DOUBLE) AS {alias}"


def davg(col: str | Column, alias: str, scale: int = 2) -> Column:
    """Deterministic average: exact decimal sum / count, as double."""
    c = F.col(col) if isinstance(col, str) else col
    return (
        F.sum(c.cast(f"decimal(18,{scale})")).cast("double") / F.count(F.lit(1))
    ).alias(alias)


def davg_sql(expr: str, alias: str, scale: int = 2) -> str:
    return (
        f"CAST(SUM(CAST({expr} AS DECIMAL(18,{scale}))) AS DOUBLE)"
        f" / COUNT(*) AS {alias}"
    )


def isum(col: str | Column, alias: str) -> Column:
    """Integer sum (Spark: bigint; oracle must CAST from HUGEINT)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c).cast("long").alias(alias)


def isum_sql(expr: str, alias: str) -> str:
    return f"CAST(SUM({expr}) AS BIGINT) AS {alias}"


#: Registry (= driver verification) order. The driver oracle-checks
#: the FIRST 50 entries per round. Ordering is two-level: queries
#: already verified in a past round (CORRECTNESS_r*.json, see
#: _driver_verified_names) rotate to the back automatically; among the
#: never-verified remainder, the names below come first (the flagship
#: variant set, all 22 TPC-H shapes, the window/streaming/approximate
#: sets), then module insertion order. So each round's 50-slot window
#: sweeps further through the registry with no manual reordering.
_DRIVER_PRIORITY = [
    # reference flagship: JSON → variant → typed extraction, both tracks
    "variant_events_agg",
    "variant_explicit_codec",
    "variant_get_typed",
    "variant_filter_pushdown",
    "variant_tolerant_parse",
    "variant_shredded_storage",
    "variant_array_paths",
    # all 22 TPC-H shapes
    *[f"q{i}_" for i in range(1, 23)],  # prefix-matched below
    # batch window set
    "window_top3_orders_per_customer",
    "window_running_total",
    "window_lag_lead_events",
    "window_time_range_frame",
    # streaming set (static-join + python-datasource already green)
    "stream_tumbling_counts",
    "stream_sliding_counts",
    "stream_session_windows",
    "stream_stream_join",
    "stream_dedup_count",
    "stream_foreachbatch_sink",
    "stream_stateful_running_max",
    "stream_variant_tumbling",
    "stream_stream_variant_join",
    # approximate queries, now bound-checked against the oracle
    "approx_distinct_users",
    "similarity_lsh_topk",
    "similarity_ivf_topk",
    "similarity_ivf_kmeans_topk",
    # zero-driver-coverage categories: top-k, set ops, scalars
    "topk_expensive_parts",
    "setops_nation_coverage",
    "scalar_functions_showcase",
    "date_functions_orders",
]


def _driver_verified_names() -> set[str]:
    """Names already driver-verified in ANY past round's
    CORRECTNESS_r*.json: hash-green, or rows-only-checked for queries
    that (still) have no oracle — if a formerly rows-only query gained
    an oracle since, it stays front for a real hash check. The driver
    only checks the first 50 registry entries per round, so
    auto-rotating verified names to the back makes the window sweep
    every query over successive rounds without manual reordering.
    Failed or missing rows stay front so they are retried."""
    import glob
    import json
    import os

    repo_root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    verified: set[str] = set()
    for path in sorted(glob.glob(os.path.join(repo_root, "CORRECTNESS_r*.json"))):
        try:
            with open(path) as f:
                results = json.load(f)
        except Exception:
            continue
        if not isinstance(results, dict):
            continue
        for name, row in results.items():
            if not isinstance(row, dict):
                continue
            spec = REGISTRY.get(name)
            if row.get("hash_match") is True or (
                row.get("err") == "no_oracle"
                and row.get("spark_rows") is not None
                and spec is not None
                and spec.oracle is None
            ):
                verified.add(name)
    return verified


def load_all_queries() -> dict[str, QuerySpec]:
    """Import every query module (side effect: registry fill), then
    order the registry: never-driver-verified queries first (within
    that, _DRIVER_PRIORITY order, then module order), already-verified
    ones behind them."""
    from . import variant_queries  # noqa: F401
    from . import relational  # noqa: F401
    from . import tpch_extra  # noqa: F401
    from . import tpch_gap  # noqa: F401
    from . import tpch_wide  # noqa: F401
    from . import streaming_queries  # noqa: F401
    from . import pipelines  # noqa: F401
    from . import advanced  # noqa: F401
    from . import catalog  # noqa: F401
    from . import clusters  # noqa: F401
    from . import extras  # noqa: F401
    from . import llmdata  # noqa: F401
    from . import analysis  # noqa: F401

    verified = _driver_verified_names()

    def rank(name: str) -> int:
        for i, pat in enumerate(_DRIVER_PRIORITY):
            if name == pat or (pat.endswith("_") and name.startswith(pat)):
                return i
        return len(_DRIVER_PRIORITY)

    ordered = sorted(REGISTRY, key=lambda n: (n in verified, rank(n)))
    # stable sort: ties keep their module insertion order
    reordered = {n: REGISTRY[n] for n in ordered}
    REGISTRY.clear()
    REGISTRY.update(reordered)
    return REGISTRY
