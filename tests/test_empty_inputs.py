"""Empty-input robustness: every operator family must return an empty
(not erroring) result when its input has zero rows — the edge every
incremental pipeline hits on its first run or an empty partition day."""

from __future__ import annotations

from pyspark.sql import functions as F

from datafusion_functions_variant_spark.operators import dedup, similarity, text
from datafusion_functions_variant_spark.sources.tables import load_table

from .conftest import SF_DIR


def _empty_docs(spark):
    return load_table(spark, SF_DIR, "documents").where(F.lit(False))


def _empty_emb(spark):
    return load_table(spark, SF_DIR, "embeddings").where(F.lit(False))


def test_exact_dedup_empty(spark):
    assert dedup.exact_dedup_groups(_empty_docs(spark), "text", "doc_id").count() == 0


def test_minhash_empty(spark):
    sigs = dedup.minhash_signatures_text(_empty_docs(spark), "text", "doc_id", n=8, num_hashes=8)
    assert sigs.count() == 0
    assert dedup.lsh_candidate_pairs(sigs, "doc_id", num_hashes=8, bands=2).count() == 0


def test_simhash_empty(spark):
    assert dedup.simhash_signatures(_empty_docs(spark), "text", "doc_id").count() == 0


def test_similarity_empty_corpus(spark):
    emb = _empty_emb(spark)
    queries = load_table(spark, SF_DIR, "embeddings").where(F.col("vec_id") < 2)
    assert similarity.brute_force_topk(emb, queries, k=3).count() == 0
    assert similarity.radius_search(emb, queries, threshold=0.2).count() == 0


def test_similarity_empty_queries(spark):
    emb = load_table(spark, SF_DIR, "embeddings")
    assert similarity.brute_force_topk(emb, _empty_emb(spark), k=3).count() == 0


def test_text_ops_empty(spark):
    docs = _empty_docs(spark)
    assert text.quality_stats(docs, "text", "doc_id").count() == 0
    assert text.lang_id(docs, "text", "doc_id").count() == 0
    assert text.token_counts(docs, "text", "doc_id").count() == 0
