"""Incremental view maintenance of grouping-sets rollups.

Algebraic (self-maintainable) aggregates — COUNT and SUM — merge via
addition, so a materialized rollup is maintained from a SIGNED
changelog (+1 inserts, -1 delete tombstones) with one delta-sized
aggregation plus one grouping-key join: cost O(|changelog| +
|affected groups|), never the corpus. MIN/MAX are not
self-maintainable under deletes (a retracted extremum forces a
per-group rescan) and are deliberately out of scope.

Used by ``queries/pipelines.py::rollup_incremental_maintenance`` (the
driver-verified query) and ``scale_probe.py``'s fixed-delta case (the
maintenance-vs-recompute contrast). No reference counterpart — the
reference is a variant codec (open-variant/src/values/mod.rs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: the rollup's grouping-set hierarchy (day / day+hour / day+hour+type)
GROUP_KEYS = ("day", "hour", "event_type")

_ROLLUP_SQL = """
    SELECT day,
           CASE WHEN GROUPING(hour) = 0 THEN hour END AS hour,
           CASE WHEN GROUPING(event_type) = 0 THEN event_type END
             AS event_type,
           {cnt} AS n,
           SUM({val}) AS s
    FROM {src}
    GROUP BY GROUPING SETS ((day), (day, hour), (day, hour, event_type))
"""


def rollup_full(src: DataFrame, view_name: str) -> DataFrame:
    """Full grouping-sets rollup of (day, hour, event_type, v) rows:
    one Expand (3 output rows per input) + one aggregation exchange."""
    src.createOrReplaceTempView(view_name)
    return src.sparkSession.sql(
        _ROLLUP_SQL.format(cnt="COUNT(*)", val="v", src=view_name)
    )


def rollup_delta(signed: DataFrame, view_name: str) -> DataFrame:
    """Signed-changelog partials over (day, hour, event_type, sign, v):
    n = SUM(sign), s = SUM(sign * v) per grouping set — the algebraic
    delta that merges into a stored rollup by addition."""
    signed.createOrReplaceTempView(view_name)
    return signed.sparkSession.sql(
        _ROLLUP_SQL.format(cnt="SUM(sign)", val="sign * v", src=view_name)
    )


def merge_rollup(stored: DataFrame, delta: DataFrame) -> DataFrame:
    """Merge delta partials into the stored rollup: one NULL-SAFE
    full-outer join on the grouping keys (the NULL pattern identifies
    the grouping set; source columns are never genuinely NULL), n and
    s add, and fully-deleted groups (n == 0) vanish — matching a full
    recompute, which cannot produce an empty group either."""
    r, d = stored.alias("r"), delta.alias("d")
    cond = None
    for k in GROUP_KEYS:
        eq = F.col(f"r.{k}").eqNullSafe(F.col(f"d.{k}"))
        cond = eq if cond is None else cond & eq
    merged = r.join(d, cond, "full_outer").select(
        *[
            F.coalesce(F.col(f"r.{k}"), F.col(f"d.{k}")).alias(k)
            for k in GROUP_KEYS
        ],
        (
            F.coalesce(F.col("r.n"), F.lit(0)) + F.coalesce(F.col("d.n"), F.lit(0))
        ).cast("long").alias("n"),
        (
            F.coalesce(F.col("r.s"), F.lit(0).cast("decimal(18,2)"))
            + F.coalesce(F.col("d.s"), F.lit(0).cast("decimal(18,2)"))
        ).alias("s"),
    )
    return merged.where(F.col("n") > 0)
