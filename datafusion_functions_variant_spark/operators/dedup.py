"""Deduplication operators for large-scale training-data pipelines.

All algorithms are expressed as declarative DataFrame plans (zero
Python UDFs — everything stays in whole-stage codegen) and all hashes
are md5-based, so a SQL engine (the DuckDB oracle) can reproduce the
exact results.

Scale design (100 TB of documents):

* **Exact dedup** = hash → groupBy → min-keeper. One shuffle on the
  hash; partial aggregation collapses duplicates map-side first.
* **MinHash-LSH** = shingle explode → 1 groupBy for signatures →
  band explode → self-join on (band, value). The self-join shuffles
  on the band value whose cardinality ≈ #docs — no O(n²) pair blowup;
  only colliding buckets produce pairs. Skewed buckets (giant
  boilerplate clusters) are handled by AQE skew-join splitting.
* **Verification** re-computes exact Jaccard ONLY for candidate
  pairs — a join of the (small) candidate set back to the shingle
  table, never all-pairs.
* **SimHash** = per-token hash bits → weighted bit-majority per doc
  (one groupBy), 64-bit signature; candidate pairs by Hamming
  distance. The brute pair scan here is for the oracle-checkable
  small path; at scale you'd block on signature prefixes (same LSH
  pattern as above).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def normalize_text(col) -> F.Column:
    """Canonical form for exact dedup: lowercase, collapse whitespace."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(F.trim(F.lower(c)), r"\s+", " ")


def exact_dedup_groups(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Group identical (normalized) texts: keeper = min id, group size.

    Returns (content_hash, keeper_id, n_dupes). One shuffle on the
    128-bit content hash — uniform by construction, no skew.
    """
    return (
        df.select(F.md5(normalize_text(text_col)).alias("content_hash"), F.col(id_col))
        .groupBy("content_hash")
        .agg(
            F.min(id_col).alias("keeper_id"),
            (F.count(F.lit(1)) - 1).alias("n_dupes"),
        )
    )


def char_ngrams(df: DataFrame, text_col: str, id_col: str, n: int = 8) -> DataFrame:
    """Distinct character n-grams per document: (id, g).

    Explode via sequence(1, len-n+1) + substring — all JVM-side. The
    distinct collapses per-doc repeats before anything shuffles.
    """
    return (
        df.select(
            F.col(id_col),
            F.explode(F.sequence(F.lit(1), F.length(text_col) - (n - 1))).alias("_i"),
            F.col(text_col),
        )
        .select(F.col(id_col), F.expr(f"substring({text_col}, _i, {n})").alias("g"))
        .distinct()
    )


def minhash_signatures(
    grams: DataFrame, id_col: str, num_hashes: int = 8
) -> DataFrame:
    """H independent min-hashes per doc: mh_h = MIN(md5(h || ':' || g)).

    Hex-string minima order exactly like the underlying 128-bit
    values, and md5 is engine-portable (the oracle computes the same
    bytes). One groupBy over the gram table computes all H columns in
    a single pass (partial min map-side).
    """
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"{h}:"), F.col("g")))).alias(f"mh{h}")
        for h in range(num_hashes)
    ]
    return grams.groupBy(id_col).agg(*aggs)


def lsh_candidate_pairs(
    sigs: DataFrame, id_col: str, num_hashes: int = 8, bands: int = 2
) -> DataFrame:
    """Band the signature (r = H/bands rows per band), bucket-join.

    Returns (doc_a, doc_b, n_shared_bands) with doc_a < doc_b. The
    join key is (band_id, band_hash): collision probability for
    Jaccard j is 1-(1-j^r)^b — with H=8, b=2, r=4: j=0.98 → 0.996
    recall, j=0.03 → ~2e-6 false-candidate rate.
    """
    r = num_hashes // bands
    band_cols = []
    for b in range(bands):
        parts = [F.col(f"mh{b * r + i}") for i in range(r)]
        band_cols.append(
            F.struct(F.lit(b).alias("band_id"), F.md5(F.concat(*parts)).alias("band_hash"))
        )
    banded = sigs.select(
        F.col(id_col), F.explode(F.array(*band_cols)).alias("bnd")
    ).select(id_col, "bnd.band_id", "bnd.band_hash")
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .groupBy(
            F.col(f"a.{id_col}").alias("doc_a"), F.col(f"b.{id_col}").alias("doc_b")
        )
        .agg(F.count(F.lit(1)).alias("n_shared_bands"))
    )


def verified_near_dups(
    grams: DataFrame, candidates: DataFrame, id_col: str, threshold: float = 0.9
) -> DataFrame:
    """Exact Jaccard over n-gram sets, computed ONLY for candidates.

    (candidates ⋈ grams) twice → per-pair intersection count; union
    sizes come from per-doc gram counts (broadcastable map). Returns
    (doc_a, doc_b, jaccard) filtered to >= threshold.
    """
    sizes = grams.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_grams"))
    ga = grams.select(F.col(id_col).alias("doc_a"), F.col("g"))
    gb = grams.select(F.col(id_col).alias("doc_b"), F.col("g"))
    inter = (
        candidates.join(ga, "doc_a")
        .join(gb, ["doc_b", "g"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sa = sizes.select(F.col(id_col).alias("doc_a"), F.col("n_grams").alias("n_a"))
    sb = sizes.select(F.col(id_col).alias("doc_b"), F.col("n_grams").alias("n_b"))
    return (
        inter.join(F.broadcast(sa), "doc_a")
        .join(F.broadcast(sb), "doc_b")
        .select(
            "doc_a",
            "doc_b",
            (
                F.col("n_inter").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_inter"))
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )


def simhash_signatures(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """60-bit SimHash per document from word-level md5 hashes.

    Portable construction: token hash = first 15 hex chars of md5
    (60 bits, fits signed 64); bit j of the signature is the majority
    vote of token-hash bit j weighted by token frequency. Entirely
    JVM-side: explode words x explode 60 bit positions → one groupBy.
    (At 100 TB you'd fuse this into a pandas_udf to avoid the 60x row
    expansion; this formulation is the oracle-checkable reference.)
    """
    words = df.select(
        F.col(id_col),
        F.explode(F.split(F.col(text_col), " ")).alias("w"),
    ).where(F.length("w") > 0)
    hashed = words.select(
        id_col,
        F.conv(F.substring(F.md5("w"), 1, 15), 16, 10).cast("long").alias("h"),
    )
    bits = hashed.select(
        id_col,
        "h",
        F.explode(F.sequence(F.lit(0), F.lit(59))).alias("j"),
    ).select(
        id_col,
        "j",
        F.when(F.expr("shiftright(h, j) & 1") == 1, 1).otherwise(-1).alias("contrib"),
    )
    return (
        bits.groupBy(id_col, "j")
        .agg(F.sum("contrib").alias("s"))
        .groupBy(id_col)
        .agg(
            F.sum(
                F.when(F.col("s") > 0, F.expr("shiftleft(1L, j)")).otherwise(F.lit(0))
            ).alias("simhash")
        )
    )


def simhash_near_pairs(sigs: DataFrame, id_col: str, max_hamming: int = 10) -> DataFrame:
    """Pairs with Hamming(simhash) <= max_hamming (doc_a < doc_b).

    Brute all-pairs for oracle-checkable sizes; the scale path blocks
    on 16-bit signature prefixes first (LSH on bit-chunks) so only
    same-prefix docs pair up.
    """
    a = sigs.select(F.col(id_col).alias("doc_a"), F.col("simhash").alias("sig_a"))
    b = sigs.select(F.col(id_col).alias("doc_b"), F.col("simhash").alias("sig_b"))
    return (
        a.join(b, F.col("doc_a") < F.col("doc_b"))
        .select(
            "doc_a",
            "doc_b",
            F.bit_count(F.expr("sig_a ^ sig_b")).cast("int").alias("hamming"),
        )
        .where(F.col("hamming") <= max_hamming)
    )
