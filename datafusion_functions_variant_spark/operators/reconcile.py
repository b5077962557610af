"""Bucketed snapshot reconciliation — diff two table snapshots without
full-outer-joining the whole corpus.

The anti-entropy pattern for 100 TB replica repair / migration audit
(Merkle-style, flattened to one level because Spark aggregates a level
in one pass): reduce each side to an ``n_buckets``-row fingerprint
summary, join the TINY summaries to find mismatched buckets, then
expand ONLY those buckets into the exact row-level diff. With drift
fraction d, the expensive phase shuffles ~d of the corpus instead of
all of it; the summaries are pure map-side-combined scans.

No reference counterpart (the reference is a variant codec —
open-variant/src/values/mod.rs); this is engine infrastructure the
query layer needs at scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _rowhash(key_col: str, payload_cols: list[str]) -> Column:
    """Canonical per-row fingerprint, NULL- and delimiter-unambiguous.

    Columns are cast to string (so physically-different-but-equal
    encodings, e.g. decimal(19,2) vs decimal(18,2), hash identically),
    then '\\' and '|' are escaped before the '|' join — ('a|b','c') no
    longer collides with ('a','b|c') — and a parallel null-bitmap
    distinguishes NULL from '' and from any real value. Neither
    concat_ws (silently DROPS null args) nor multi-arg xxhash64 (Spark
    hash expressions SKIP null children — the seed passes through
    unchanged) is null-safe on its own.
    """
    parts = [F.col(key_col).cast("string")] + [
        F.col(c).cast("string") for c in payload_cols
    ]
    null_map = F.concat_ws(
        "", *[F.when(p.isNull(), F.lit("n")).otherwise(F.lit("v")) for p in parts]
    )
    escaped = [
        F.coalesce(
            F.replace(
                F.replace(p, F.lit("\\"), F.lit("\\\\")), F.lit("|"), F.lit("\\|")
            ),
            F.lit(""),
        )
        for p in parts
    ]
    return F.xxhash64(null_map, F.concat_ws("|", *escaped))


def bucketed_snapshot_diff(
    a: DataFrame,
    b: DataFrame,
    key_col: str,
    payload_cols: list[str],
    n_buckets: int = 4096,
) -> DataFrame:
    """Exact row-level diff of two snapshots via bucket-summary
    drill-down. Returns (kind 'D'/'I'/'M', key, old/new payloads);
    kinds: Deleted (in a only), Inserted (in b only), Modified.

    Phase 1: per-side groupBy(bucket) → (count, bit_xor(rowhash),
    exact decimal sum(rowhash)) — one map-side-combined shuffle per
    side, output size = n_buckets regardless of corpus size.
    Phase 2: full-outer join of the two summaries (tiny), null-safe
    compare of all three fingerprints → dirty-bucket list.
    Phase 3: broadcast-SEMI-join each side down to dirty buckets, then
    full-outer join ONLY those rows on the key. Clean buckets are
    never expanded. A missed bucket needs count AND xor AND decimal
    sum to all collide (~2^-64); deterministic on a given dataset.
    """
    rowhash = _rowhash(key_col, payload_cols)
    bucket = F.pmod(F.xxhash64(F.col(key_col)), F.lit(n_buckets)).cast("int")

    def summarize(side: DataFrame) -> DataFrame:
        return (
            side.select(bucket.alias("bucket"), rowhash.alias("rh"))
            .groupBy("bucket")
            .agg(
                F.count(F.lit(1)).alias("cnt"),
                F.expr("bit_xor(rh)").alias("hx"),
                F.sum(F.col("rh").cast("decimal(38,0)")).alias("hs"),
            )
        )

    sa, sb = summarize(a), summarize(b)
    dirty = (
        sa.alias("sa")
        .join(sb.alias("sb"), "bucket", "full_outer")
        .where(
            ~F.col("sa.cnt").eqNullSafe(F.col("sb.cnt"))
            | ~F.col("sa.hx").eqNullSafe(F.col("sb.hx"))
            | ~F.col("sa.hs").eqNullSafe(F.col("sb.hs"))
        )
        .select("bucket")
    )
    a_dirty = a.withColumn("bucket", bucket).join(
        F.broadcast(dirty), "bucket", "left_semi"
    )
    b_dirty = b.withColumn("bucket", bucket).join(
        F.broadcast(dirty), "bucket", "left_semi"
    )
    al, bl = a_dirty.alias("al"), b_dirty.alias("bl")
    # null-safe per-column compare: a NULL<->non-NULL flip must read as
    # "changed", not as SQL NULL (which WHERE would silently drop).
    payload_changed = F.lit(False)
    for c in payload_cols:
        payload_changed = payload_changed | ~F.col(f"al.{c}").eqNullSafe(
            F.col(f"bl.{c}")
        )
    return (
        al.join(bl, F.col(f"al.{key_col}") == F.col(f"bl.{key_col}"), "full_outer")
        .where(
            F.col(f"al.{key_col}").isNull()
            | F.col(f"bl.{key_col}").isNull()
            | payload_changed
        )
        .select(
            F.when(F.col(f"bl.{key_col}").isNull(), "D")
            .when(F.col(f"al.{key_col}").isNull(), "I")
            .otherwise("M")
            .alias("kind"),
            F.coalesce(F.col(f"al.{key_col}"), F.col(f"bl.{key_col}")).alias(
                key_col
            ),
            *[F.col(f"al.{c}").alias(f"old_{c}") for c in payload_cols],
            *[F.col(f"bl.{c}").alias(f"new_{c}") for c in payload_cols],
        )
    )
