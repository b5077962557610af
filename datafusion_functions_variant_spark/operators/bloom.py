"""Explicit Bloom-filter build/probe as plain Spark aggregates.

Spark's own runtime bloom injection fires only on cost heuristics;
these helpers are the ENGINE-GRADE explicit form for when the pipeline
KNOWS a build side is selective: a distributed build (seeded-xxhash64
bit positions, word-level ``bit_or``, densified into ONE array<long>
row) and a map-side membership test that runs inside whole-stage
codegen — zero Python, zero shuffle on the probe side.

The bloom is pure PRUNING state: correctness must never depend on it
(follow every probe with an exact join/semi-join that removes false
positives). Used by ``join_bloom_prefilter`` (selective dim join) and
``dedup_bloom_prescreen`` (ingest screening against a corpus index).

No reference counterpart (the reference is a variant codec); this is
infrastructure the query layer needs at 100 TB, where shedding probe
rows BEFORE a shuffle converts shuffle bytes from O(|probe|) to
O(|hits| + FP).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_SEEDS = (1, 2, 3)


def bloom_m_bits(n_keys: int, bits_per_key: int = 20) -> int:
    """Power-of-two sizing, floor 4096 bits (64 words): ~20 bits/key
    with k=3 probes gives FP ≈ 0.1-1% — the count-based dial
    discipline (see similarity.knn_graph's auto-sized blocking)."""
    words = 1 << max(6, math.ceil(math.log2(max(n_keys, 1) * bits_per_key / 64 + 1)))
    return words * 64


def bloom_build(
    keys: DataFrame, key: Column, m_bits: int, seeds: tuple[int, ...] = DEFAULT_SEEDS
) -> DataFrame:
    """Distributed build → ONE row with ``bits: array<long>``
    (m_bits/64 words). One tiny shuffle on the build side (the word
    groupBy), then a single-partition densify over ≤ m_bits/64 rows —
    bounded model state, never corpus data. Broadcast the result and
    test with ``bloom_member_sql``."""
    m_words = m_bits // 64
    positions = F.array(
        *[F.pmod(F.xxhash64(key, F.lit(s)), F.lit(m_bits)) for s in seeds]
    )
    sparse = (
        keys.select(F.explode(positions).alias("p"))
        .select(
            F.expr("p div 64").alias("w"),
            F.expr("cast(p % 64 as int)").alias("b"),
        )
        .groupBy("w")
        .agg(F.expr("bit_or(shiftleft(1L, b))").alias("word"))
    )
    return sparse.agg(
        F.map_from_entries(F.collect_list(F.struct("w", "word"))).alias("mp")
    ).select(
        F.expr(
            f"transform(sequence(0L, {m_words - 1}L), i -> coalesce(mp[i], 0L))"
        ).alias("bits")
    )


def bloom_member_sql(
    key_expr: str,
    m_bits: int,
    seeds: tuple[int, ...] = DEFAULT_SEEDS,
    bits_col: str = "bits",
) -> str:
    """SQL condition testing ``key_expr``'s membership against a
    broadcast ``bits_col`` column — all k bits set. Pure built-ins
    (element_at/shiftright/&) so the probe stays in codegen. The
    key_expr must hash identically to the build side's ``key``;
    ``bits_col`` lets one frame carry several attached bitsets."""
    return " AND ".join(
        f"(shiftright(element_at({bits_col}, cast(pmod(xxhash64({key_expr}, {s}), {m_bits})"
        f" div 64 as int) + 1), cast(pmod(xxhash64({key_expr}, {s}), {m_bits}) % 64"
        f" as int)) & 1) = 1"
        for s in seeds
    )
