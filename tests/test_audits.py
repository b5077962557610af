"""Invariants of the approximation-quality audits (queries/audits.py)
and the canonical-vs-enumerating twin equivalence.

The parity suite already hash-matches these queries against DuckDB;
these tests pin the SEMANTIC invariants that a hash match alone would
not localize if broken: recall/precision stay in [0,1] and count
identities hold, and the canonicalized embedding-cosine twin carries
exactly the information of the pair-enumerating twin (Σ n_pairs over
canonical pairs = the number of raw cross-cluster pairs).
"""

from __future__ import annotations

from datafusion_functions_variant_spark.queries import load_all_queries

from .conftest import SF_DIR

REGISTRY = load_all_queries()


def test_similarity_recall_audit_invariants(spark):
    rows = REGISTRY["similarity_recall_audit"].build(spark, SF_DIR).collect()
    assert len(rows) == 8  # one row per audited query vector
    for r in rows:
        # top-3 audit: hits bounded by k and by the candidate pool
        assert 0 <= r.n_hits <= 3
        assert r.n_hits <= r.n_candidates
        # every query collides with at least itself
        assert r.n_candidates >= 1
        assert 0 <= r.bucket < 16  # 4 planes
        assert abs(r.recall - r.n_hits / 3.0) < 1e-6


def test_dedup_lsh_recall_audit_invariants(spark):
    [r] = REGISTRY["dedup_lsh_recall_audit"].build(spark, SF_DIR).collect()
    # canonicalization can only shrink the doc set
    assert 1 <= r.n_canon <= r.n_docs
    # the built-in block sample is hard-capped (round 9) and covers
    # the whole corpus when it fits under the cap
    assert 1 <= r.n_sample <= min(r.n_canon, 1000)
    assert r.n_sample == r.n_canon or r.n_sample >= 980  # whole blocks
    # hits are the intersection of candidates and truth
    assert r.n_hits <= min(r.n_truth, r.n_candidates)
    assert 0.0 <= r.recall <= 1.0
    assert 0.0 <= r.precision <= 1.0
    # the planted corpus has real near-dups and LSH must find most:
    # 8-gram Jaccard >= 0.9 implies high minhash band collision odds
    assert r.n_truth > 0
    assert r.recall >= 0.8


def test_embedding_cosine_canonical_equals_enumerated_mass(spark):
    """Σ n_pairs over canonical pairs must equal the count of raw
    cross-cluster pairs the enumerating twin emits — i.e. the
    canonical form is informationally lossless for cross-cluster
    near-dups (within-cluster pairs are exact duplicates, carried by
    n_dups, not pair rows)."""
    from pyspark.sql import functions as F

    canon = REGISTRY["dedup_embedding_cosine_canonical"].build(spark, SF_DIR)
    enum = REGISTRY["dedup_embedding_cosine"].build(spark, SF_DIR)
    mass = canon.agg(F.sum("n_pairs")).collect()[0][0] or 0
    # the enumerating twin emits raw-id pairs; cross-cluster raw pairs
    # are those whose endpoints have different embeddings. On the base
    # (replica-free) test corpus every vec_id is its own cluster, so
    # the two counts coincide exactly.
    n_enum = enum.count()
    assert mass == n_enum
    # and the canonical pair set is never larger than the enumerated
    assert canon.count() <= n_enum


def test_banded_dedup_queries_observe_overflow_by_default(spark):
    """Round-9 discipline: every banded-dedup registry query rides its
    bucket audit on the pair-producing pass BY DEFAULT (the r8 simhash
    incident — 24 true pairs silently star-routed past the 256 cap —
    showed silent overflow is a correctness hazard at scales the
    driver doesn't gate). At sf0.001 and sf0.01 no bucket may overflow
    (the caps clear every bucket these corpora produce — if this
    assertion ever fires, the query's max_bucket must be raised or the
    corpus exact-deduped first, NOT the assertion loosened), and the
    audit must actually fire: n_buckets > 0."""
    from datafusion_functions_variant_spark.plans.observe import (
        REGISTERED_OBSERVATIONS,
        observed_metrics,
    )

    from .conftest import SF_DIR_MED

    banded = [
        "dedup_minhash_lsh",
        "dedup_minhash_xxhash",
        "dedup_simhash",
        "dedup_image_phash",
    ]
    for sf_dir in (SF_DIR, SF_DIR_MED):
        for name in banded:
            df = REGISTRY[name].build(spark, sf_dir)
            df.count()  # act: the observation fires with the pass
            got = observed_metrics(
                REGISTERED_OBSERVATIONS[name],
                n_buckets=0,
                n_colliding_buckets=0,
                n_overflow_buckets=0,
                max_bucket_size=0,
            )
            assert got["n_overflow_buckets"] == 0, (name, sf_dir, got)
            assert got["n_buckets"] > 0, (name, sf_dir, got)
            assert got["max_bucket_size"] >= 1, (name, sf_dir, got)
