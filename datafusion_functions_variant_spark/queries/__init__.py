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


def load_all_queries() -> dict[str, QuerySpec]:
    """Import every query module (side effect: registry fill)."""
    # Import order = registry (insertion) order = driver verification
    # order. The driver oracle-checks the first 50 entries, so modules
    # whose queries have not yet earned a driver-green correctness row
    # come FIRST; modules fully verified in rounds 1-2 (advanced,
    # catalog, clusters, extras, llmdata) rotate to the back.
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

    return REGISTRY
