"""Size-aware history relations for stream-static ingest probes.

A streaming ingest gate probes every arriving micro-batch against a
summary of the historical corpus (exact content hashes, LSH band
buckets, prefix hashes). At test scale that summary is kilobytes and a
broadcast hash join is optimal; at 100 TB it is ~10^10 rows x 16 bytes
~= 160 GB — NOT broadcastable. Pinning ``F.broadcast`` on the history
side (as rounds <=9 did) therefore works at sf0.01 and falls over at
scale. This module makes the probe topology a FUNCTION OF MEASURED
HISTORY SIZE:

* ``n_keys <= broadcast_threshold_rows``: return the history with a
  broadcast hint — one BroadcastHashJoin per micro-batch, zero history
  shuffle. This is the right plan while the summary fits in executor
  memory, and it is what the registered queries pick at every test SF.

* larger: the history is persisted ONCE as a bucketed+sorted table on
  the probe key (``bucketBy``; the ``dedup_incremental_bucketed_index``
  layout), so every micro-batch's stream-static join reads history
  buckets IN PLACE — the only per-batch Exchange is on the (small)
  arriving-batch side — and a size-capped Bloom bitset
  (operators/bloom.py) sheds definite-misses MAP-SIDE before that
  Exchange. Bloom filters have no false negatives, so routing
  bloom-negative rows around the exact join is lossless; false
  positives are removed by the join itself. The bitset is capped at
  ``bloom_max_bits`` (8 MiB of driver/broadcast state by default): as
  history grows the filter degrades gracefully to a higher
  false-positive rate — shedding less, never dropping a true match —
  and is omitted entirely once it can no longer pay for itself
  (< ~2 bits/key).

The build half runs once per history generation (the same persisted
artifact every micro-batch and the offline batch dedup share); the
probe half is the steady-state per-batch cost. No reference
counterpart (the reference is a variant codec with no streaming layer,
/root/reference/README.md:13-16).
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.bloom import bloom_build, bloom_m_bits, bloom_member_sql

#: Default history-size cutoff for the broadcast plan. ~4M 32-char md5
#: keys is ~256 MB of join-side hash table — the upper edge of what a
#: healthy executor should host; past it the bucketed-index plan wins.
#: Env-overridable so a cluster profile can re-dial it without code.
DEFAULT_BROADCAST_THRESHOLD_ROWS = int(
    os.environ.get("SPARK_GRAFT_HISTORY_BROADCAST_ROWS", 4_000_000)
)

#: Bloom bitset hard cap: 2^26 bits = 8 MiB — always broadcastable.
DEFAULT_BLOOM_MAX_BITS = 1 << 26


@dataclass(frozen=True)
class HistoryIndex:
    """A probe-ready history relation: ``relation`` joins on ``key``
    (broadcast-hinted on the small path, a bucketed in-place scan on
    the scale path); ``bitset``/``m_bits`` carry the optional Bloom
    prescreen (None on the broadcast path — prescreening a broadcast
    probe would cost more than the join it guards)."""

    relation: DataFrame
    key: str
    broadcasted: bool
    n_keys: int
    bitset: DataFrame | None = None
    m_bits: int | None = None
    bits_col: str = "bits"

    def member(self, key_expr: str) -> Column:
        """Map-side Bloom membership test for ``key_expr`` (a SQL
        expression string hashing identically to the build key).
        Requires the probe frame to have been ``attach_bitset``-ed.
        Returns literal True when no bitset exists (prescreen off)."""
        if self.bitset is None:
            return F.lit(True)
        return F.expr(bloom_member_sql(key_expr, self.m_bits, bits_col=self.bits_col))

    def attach_bitset(self, df: DataFrame) -> DataFrame:
        """Cross-join the 1-row broadcast bitset onto ``df`` so
        ``member`` can reference its ``bits_col`` column. No-op
        without a bitset."""
        if self.bitset is None:
            return df
        return df.crossJoin(F.broadcast(self.bitset))

    def drop_bitset(self, df: DataFrame) -> DataFrame:
        return df.drop(self.bits_col) if self.bitset is not None else df


def build_history_index(
    spark: SparkSession,
    hist: DataFrame,
    key: str,
    *,
    table_name: str,
    broadcast_threshold_rows: int = DEFAULT_BROADCAST_THRESHOLD_ROWS,
    bloom_max_bits: int = DEFAULT_BLOOM_MAX_BITS,
    bucket_count: int = 8,
    bits_col: str = "bits",
) -> HistoryIndex:
    """Materialize ``hist`` (single column ``key``, one row per
    distinct history key) into the probe shape its measured size
    calls for. One count job at plan-build time decides the path —
    negligible next to the stream it guards, and the decision is the
    entire point: no hint survives a 100x data growth.
    """
    hist = hist.select(key).distinct()
    n = hist.count()
    if n <= broadcast_threshold_rows:
        return HistoryIndex(
            relation=F.broadcast(hist), key=key, broadcasted=True, n_keys=n
        )

    from ..queries.catalog import _IO_DIR

    spark.sql(f"DROP TABLE IF EXISTS {table_name}")
    (
        hist.write.bucketBy(bucket_count, key)
        .sortBy(key)
        .option("path", os.path.join(_IO_DIR, table_name))
        .mode("overwrite")
        .saveAsTable(table_name)
    )
    relation = spark.table(table_name)
    m_bits = min(bloom_m_bits(n), bloom_max_bits)
    bitset = None
    if m_bits >= 2 * n:  # below ~2 bits/key the FPR makes it dead weight
        bitset = (
            bloom_build(relation, F.col(key), m_bits)
            .select(F.col("bits").alias(bits_col))
            # build ONCE, here: left lazy, the whole bloom aggregation
            # would re-run inside EVERY micro-batch plan — a per-batch
            # full index scan at 100 TB
            .localCheckpoint(eager=True)
        )
    else:
        m_bits = None
    return HistoryIndex(
        relation=relation,
        key=key,
        broadcasted=False,
        n_keys=n,
        bitset=bitset,
        m_bits=m_bits,
        bits_col=bits_col,
    )
