"""Pipeline-metrics surface: named observations riding on the plan.

``df.observe`` attaches aggregate metrics (row counts, null counts,
invariant checks) to a DataFrame WITHOUT a second job: the metrics are
computed inside the same pass that materializes the result — at 100 TB
that is the difference between monitoring for free and doubling the
read. This module wraps the raw API with the two shapes a pipeline
actually wants: a standard quality bundle per stage, and an assertion
helper that turns an observed invariant violation into a hard error.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Observation
from pyspark.sql import functions as F


def observe_quality(
    df: DataFrame, *, key_col: str, extra: dict[str, Column] | None = None
) -> tuple[DataFrame, Observation]:
    """Attach the standard quality bundle: row count, null-key count,
    distinct-key approximation. Returns (df, observation); read
    ``observation.get`` AFTER an action on the returned df."""
    obs = Observation()
    metrics = {
        "n_rows": F.count(F.lit(1)),
        "n_null_keys": F.count(F.lit(1)) - F.count(F.col(key_col)),
        "approx_distinct_keys": F.approx_count_distinct(key_col),
    }
    if extra:
        metrics.update(extra)
    out = df.observe(obs, *[c.alias(n) for n, c in metrics.items()])
    return out, obs


def observed_metrics(obs: Observation, **defaults) -> dict:
    """``obs.get`` tolerating the zero-input corner. When the observed
    subtree collapses to an empty relation at runtime (AQE
    empty-relation propagation on a zero-row scan — the first run of
    an incremental pipeline, an empty partition day), Spark records an
    EMPTY metrics row and pyspark's ``Observation.get`` raises while
    converting it (``PythonSQLUtils.toPyRow`` asserts non-empty).
    Return ``defaults`` in that case: the caller names the
    empty-aggregate values it expects (e.g. ``n_buckets=0``). Only
    that specific empty-row conversion failure is absorbed — a
    never-attached observation, a dead JVM, or any other error still
    raises (silently reporting 'empty corpus' for a crashed job would
    be worse than the crash)."""
    try:
        return dict(obs.get)
    except Exception as ex:
        if "toPyRow" in str(ex):
            return dict(defaults)
        raise


#: name → the Observation attached by the MOST RECENT build of that
#: registered query. Spark consumes an Observation once, so builders
#: mint a fresh one per build via ``registered_observation``; after
#: acting on the returned DataFrame, read the audit here (the r8
#: simhash incident — a 549-deep bucket silently star-routing 24 true
#: pairs — is why overflow routing is observable BY DEFAULT on every
#: banded-dedup registry query, not only when callers pass one in).
REGISTERED_OBSERVATIONS: dict[str, Observation] = {}


def registered_observation(name: str) -> Observation:
    """Mint a fresh Observation for a registered query's current build
    and remember it under the query name (latest build wins)."""
    obs = Observation()
    REGISTERED_OBSERVATIONS[name] = obs
    return obs


def assert_observed(obs: Observation, **bounds) -> dict:
    """Check observed metrics against ``name=(lo, hi)`` bounds (either
    side None = unbounded); raise ValueError listing every violation.
    Call after the observed DataFrame has been acted on."""
    got = obs.get
    problems = []
    for name, (lo, hi) in bounds.items():
        v = got.get(name)
        if v is None:
            problems.append(f"{name}: metric missing from observation")
        elif lo is not None and v < lo:
            problems.append(f"{name}={v} below lower bound {lo}")
        elif hi is not None and v > hi:
            problems.append(f"{name}={v} above upper bound {hi}")
    if problems:
        raise ValueError("; ".join(problems))
    return got
