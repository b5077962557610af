"""Collection-analytics queries: BM25 ranked retrieval, exact
heavy-hitter token mining, and one-pass column profiling.

These extend the LLM-data-pipeline surface (SURVEY.md §2 Part B
north-star extensions) with the collection-statistics operators a
training-data curation stack needs: scoring documents against a term
set (retrieval / relevance filtering), mining the global
high-frequency vocabulary (tokenizer construction, stopword
discovery), and profiling a table's columns in a single scan (schema
drift / data-quality monitoring).

Scale notes (100 TB): every query here is one scan + one reduce to a
tiny (≤ vocabulary-sized) aggregate; the per-document work is a pure
JVM projection. BM25's collection statistics collapse to ONE row that
re-enters the plan via a broadcast cross-join — the corpus is never
shuffled. Heavy hitters is a map-side-combined groupBy on token; the
support threshold comparison joins against a 1-row aggregate, again
broadcast. Nothing collects to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.text import bucket_weight, token_bucket, words
from ..sources.tables import load_table
from . import dsum, query

# BM25 parameters (Robertson–Walker defaults) and the fixed query-term
# set (terms known to occur in the synthetic corpus).
BM25_K1 = 1.2
BM25_B = 0.75
BM25_TERMS = ["query", "spark", "merge"]

_DOC_WORDS_SQL = "list_filter(string_split(text, ' '), x -> len(x) > 0)"


def _tf_sql(term: str) -> str:
    return f"len(list_filter({_DOC_WORDS_SQL}, x -> x = '{term}'))"


@query(
    "text_bm25_search",
    oracle=f"""
    WITH docs AS (
      SELECT doc_id,
             CAST(len({_DOC_WORDS_SQL}) AS BIGINT) AS dl,
             {", ".join(f"CAST({_tf_sql(t)} AS BIGINT) AS tf{i}" for i, t in enumerate(BM25_TERMS))}
      FROM documents
    ),
    stats AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(dl) AS BIGINT) AS total_dl,
             {", ".join(f"CAST(SUM(CASE WHEN tf{i} > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df{i}" for i in range(len(BM25_TERMS)))}
      FROM docs
    ),
    scored AS (
      SELECT doc_id, dl,
             {" + ".join(
                 f"ln((CAST(n_docs AS DOUBLE) - CAST(df{i} AS DOUBLE) + 0.5)"
                 f" / (CAST(df{i} AS DOUBLE) + 0.5) + 1.0)"
                 f" * (CAST(tf{i} AS DOUBLE) * ({BM25_K1} + 1.0))"
                 f" / (CAST(tf{i} AS DOUBLE) + {BM25_K1} * (1.0 - {BM25_B}"
                 f" + {BM25_B} * CAST(dl AS DOUBLE) * CAST(n_docs AS DOUBLE)"
                 f" / CAST(total_dl AS DOUBLE)))"
                 for i in range(len(BM25_TERMS))
             )} AS score
      FROM docs, stats
    )
    SELECT doc_id, dl, ROUND(score, 6) AS score_r
    FROM scored
    ORDER BY ROUND(score, 6) DESC, doc_id
    LIMIT 20
    """,
)
def text_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 ranked retrieval for a fixed term set, end-to-end in one
    declarative plan: per-doc (dl, tf_t) projection → 1-row collection
    stats (N, Σdl, df_t) → broadcast cross-join → score → top-20 via
    TakeOrderedAndProject. The corpus never shuffles; the only
    exchange carries one row of statistics. Scores rounded to 6
    decimals to absorb ln() ulp drift between JVM and libm.
    """
    docs = load_table(spark, sf_dir, "documents")
    w = words("text")

    # NOTE: F.filter treats a 2-arg lambda as (element, index) — bind
    # the term via closure, keep the lambda unary (see operators/text.py).
    def eq_term(t):
        return lambda x: x == F.lit(t)

    per_doc = docs.select(
        "doc_id",
        F.size(w).cast("long").alias("dl"),
        *[
            F.size(F.filter(w, eq_term(t))).cast("long").alias(f"tf{i}")
            for i, t in enumerate(BM25_TERMS)
        ],
    )
    stats = per_doc.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("dl").cast("long").alias("total_dl"),
        *[
            F.sum((F.col(f"tf{i}") > 0).cast("long")).cast("long").alias(f"df{i}")
            for i in range(len(BM25_TERMS))
        ],
    )
    scored = per_doc.crossJoin(F.broadcast(stats))
    score = None
    for i in range(len(BM25_TERMS)):
        n, df_, tf = (
            F.col("n_docs").cast("double"),
            F.col(f"df{i}").cast("double"),
            F.col(f"tf{i}").cast("double"),
        )
        idf = F.log((n - df_ + F.lit(0.5)) / (df_ + F.lit(0.5)) + F.lit(1.0))
        norm = tf + F.lit(BM25_K1) * (
            F.lit(1.0 - BM25_B)
            + F.lit(BM25_B)
            * F.col("dl").cast("double")
            * n
            / F.col("total_dl").cast("double")
        )
        term_score = idf * (tf * F.lit(BM25_K1 + 1.0)) / norm
        score = term_score if score is None else score + term_score
    return (
        scored.select("doc_id", "dl", F.round(score, 6).alias("score_r"))
        .orderBy(F.col("score_r").desc(), "doc_id")
        .limit(20)
    )


@query(
    "retrieval_hybrid_rrf",
    oracle=f"""
    WITH w AS (
      SELECT doc_id, {_DOC_WORDS_SQL} AS ws FROM documents
    ),
    lex AS (
      SELECT doc_id,
             ({" + ".join(f"len(list_filter(ws, x -> x = '{t}'))" for t in BM25_TERMS)}) AS tf
      FROM w
    ),
    lex50 AS (
      SELECT doc_id, rank_lex FROM (
        SELECT doc_id,
               ROW_NUMBER() OVER (ORDER BY tf DESC, doc_id) AS rank_lex
        FROM lex
      ) WHERE rank_lex <= 50
    ),
    q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
    prods AS (
      SELECT vec_id,
             SUM(CAST(CAST(qe[i::INT] AS DOUBLE) * CAST(ee[i::INT] AS DOUBLE)
                      AS DECIMAL(30,15))) AS dot_dec
      FROM (SELECT e.vec_id, q.qe, e.embedding AS ee,
                   unnest(range(1, len(e.embedding) + 1)) AS i
            FROM embeddings e, q)
      GROUP BY 1
    ),
    sem50 AS (
      SELECT doc_id, rank_sem FROM (
        SELECT vec_id AS doc_id,
               ROW_NUMBER() OVER (ORDER BY dot_dec DESC, vec_id) AS rank_sem
        FROM prods
      ) WHERE rank_sem <= 50
    ),
    fused AS (
      SELECT COALESCE(l.doc_id, s.doc_id) AS doc_id,
             COALESCE(1000000000 // (60 + l.rank_lex), 0)
               + COALESCE(1000000000 // (60 + s.rank_sem), 0) AS rrf,
             l.rank_lex, s.rank_sem
      FROM lex50 l FULL OUTER JOIN sem50 s ON l.doc_id = s.doc_id
    )
    SELECT doc_id, CAST(rrf AS BIGINT) AS rrf,
           CAST(rank_lex AS BIGINT) AS rank_lex,
           CAST(rank_sem AS BIGINT) AS rank_sem
    FROM fused ORDER BY rrf DESC, doc_id LIMIT 15
    """,
)
def retrieval_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval via reciprocal-rank fusion — the standard way
    to combine a lexical ranker and an embedding ranker without score
    calibration (RRF: Σ 1/(60+rank), here in exact integer millionths
    so both engines agree bit-for-bit; missing-from-list contributes
    0). Lexical side: term-frequency ranking for the fixed term set;
    semantic side: exact decimal inner product against query vector
    vec_id=0 (the same discipline as similarity_dot_topk).

    Scale (100 TB): each side reduces to a global top-50 via
    TakeOrderedAndProject (distributed heap merge, never a global
    sort); rank assignment then runs on ≤50 rows — the single-
    partition window is over a CONSTANT-size list, not the corpus.
    The fusion join is 50×50. Corpus-side work is one scan per ranker;
    the semantic scan broadcasts the 1-row query vector.
    """
    from ..operators import similarity

    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    w = words("text")

    def eq_term(t):
        return lambda x: x == F.lit(t)

    tf = None
    for t in BM25_TERMS:
        term_tf = F.size(F.filter(w, eq_term(t)))
        tf = term_tf if tf is None else tf + term_tf
    lex_top = (
        docs.select("doc_id", tf.alias("tf"))
        .orderBy(F.col("tf").desc(), "doc_id")
        .limit(50)
    )
    wl = Window.orderBy(F.col("tf").desc(), "doc_id")
    lex50 = lex_top.select(
        "doc_id", F.row_number().over(wl).cast("long").alias("rank_lex")
    )

    sem = similarity.brute_force_topk(
        emb, emb.where(F.col("vec_id") == 0), k=50, exact=True
    )
    sem50 = sem.select(
        F.col("vec_id").alias("doc_id"), F.col("rank").cast("long").alias("rank_sem")
    )

    fused = lex50.join(sem50, "doc_id", "full_outer").select(
        "doc_id",
        (
            F.coalesce(F.expr("1000000000 div (60 + rank_lex)"), F.lit(0))
            + F.coalesce(F.expr("1000000000 div (60 + rank_sem)"), F.lit(0))
        )
        .cast("long")
        .alias("rrf"),
        "rank_lex",
        "rank_sem",
    )
    return fused.orderBy(F.col("rrf").desc(), "doc_id").limit(15)


@query(
    "text_heavy_hitters",
    oracle="""
    WITH toks AS (
      SELECT unnest(list_filter(string_split(text, ' '), x -> len(x) > 0)) AS token
      FROM documents
    ),
    counts AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS cnt FROM toks GROUP BY token),
    tot AS (
      SELECT CAST(SUM(len(list_filter(string_split(text, ' '), x -> len(x) > 0))) AS BIGINT) AS total
      FROM documents
    )
    SELECT token, cnt
    FROM counts, tot
    WHERE cnt >= total // 100
    ORDER BY cnt DESC, token
    """,
)
def text_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact heavy hitters: tokens with support ≥ 1% of the total
    token stream. explode → map-side-combined groupBy(token) → 1-row
    total re-broadcast for the threshold. At 100 TB the groupBy state
    is vocabulary-sized (≪ corpus); for unbounded vocabularies swap
    the exact count for a count-min sketch but keep this exact twin as
    the oracle.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(F.explode(words("text")).alias("token"))
    counts = toks.groupBy("token").agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    # total token count from per-doc lengths — a cheap second scan of
    # one column, NOT a recompute of the explode+groupBy subtree (the
    # plan would otherwise run the vocabulary aggregation twice)
    total = docs.agg(F.sum(F.size(words("text"))).cast("long").alias("total"))
    return (
        counts.crossJoin(F.broadcast(total))
        .where(F.col("cnt") >= F.expr("total div 100"))
        .select("token", "cnt")
        .orderBy(F.col("cnt").desc(), "token")
    )


@query(
    "text_unigram_logprob",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             unnest(list_filter(string_split(text, ' '), x -> len(x) > 0)) AS token
      FROM documents
    ),
    bt AS (
      SELECT doc_id,
             (('0x' || substr(md5(token), 1, 4))::INT) % 4096 AS b
      FROM toks
    ),
    model AS (SELECT b, CAST(COUNT(*) AS BIGINT) AS cnt FROM bt GROUP BY b),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS total FROM bt),
    scored AS (
      SELECT doc_id,
             CAST(COUNT(*) AS BIGINT) AS n_toks,
             CAST(SUM(length(printf('%b', total // cnt)) - 1) AS BIGINT) AS ssum
      FROM bt JOIN model USING (b) CROSS JOIN tot
      GROUP BY doc_id
    )
    SELECT (ssum * 8) // n_toks AS band,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_toks) AS BIGINT) AS tokens
    FROM scored GROUP BY band ORDER BY band
    """,
)
def text_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perplexity-proxy quality scoring (the CCNet/KenLM-style filter,
    LM-free): train a hashed unigram model on the corpus itself, score
    every document by its mean token surprisal, and histogram the
    corpus into surprisal bands (low band = common boilerplate-ish
    text, high band = rare/noisy token mix).

    Determinism discipline: NO transcendental functions — surprisal is
    the exact integer ``floor(log2(total/cnt))``, computed as the
    binary-digit count of an integer quotient (``length(bin(x)) - 1``
    in Spark, ``length(printf('%b', x)) - 1`` in DuckDB), so both
    engines produce bit-identical bands where a float ``ln`` could
    diverge in the last ulp and flip a floor.

    Scale (100 TB): the model is a FIXED 4096-bucket hash table —
    mergeable integer counts, broadcastable at any corpus size (this
    is the whole point of hashing the vocabulary: an open vocabulary's
    exact counts would be corpus-sized state). Token stream is scored
    via broadcast join (no shuffle), then map-side-combined into
    per-doc partials; the final band histogram is ≤ ~40 rows. Two
    shuffles total (model build, per-doc agg), both reduce-sized.
    """
    docs = load_table(spark, sf_dir, "documents")
    bucket = token_bucket("token").alias("b")
    bt = docs.select(
        "doc_id", F.explode(words("text")).alias("token")
    ).select("doc_id", bucket)
    model = bt.groupBy("b").agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    # total token count folds out of the 4096-row model — NOT a third
    # scan of the token stream (train + score = exactly two passes)
    tot = model.agg(F.sum("cnt").cast("long").alias("total"))
    scored = (
        bt.join(F.broadcast(model), "b")
        .crossJoin(F.broadcast(tot))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_toks"),
            F.sum(F.expr("length(bin(total div cnt)) - 1"))
            .cast("long")
            .alias("ssum"),
        )
    )
    return (
        scored.select(F.expr("(ssum * 8) div n_toks").alias("band"), "n_toks")
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_toks").cast("long").alias("tokens"),
        )
        .orderBy("band")
    )


@query(
    "text_quality_classifier",
    oracle="""
    WITH toks AS (
      SELECT doc_id, lang,
             unnest(list_filter(string_split(text, ' '), x -> len(x) > 0)) AS token
      FROM documents
    ),
    feat AS (
      SELECT doc_id, lang,
             (('0x' || substr(md5(token), 1, 4))::INT) % 4096 AS b
      FROM toks
    ),
    scored AS (
      SELECT doc_id, lang,
             CAST(COUNT(*) AS BIGINT) AS n_toks,
             CAST(SUM((b * 2654435761) % 2001 - 1000) AS BIGINT) AS raw
      FROM feat
      GROUP BY doc_id, lang
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN raw > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           CAST(SUM(raw) AS BIGINT) AS score_checksum
    FROM scored GROUP BY lang ORDER BY lang
    """,
)
def text_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear quality-classifier INFERENCE at scale — the
    fastText-style keep/drop gate (hashed bag-of-words → weight
    lookup → sign of the summed score) that curation stacks run over
    every document. The Spark-side plumbing is the deliverable: token
    → 4096-bucket feature hash (in-row, md5-based so the oracle
    reproduces it), per-bucket weight from a BROADCAST model relation,
    map-side-combined per-doc score, per-language keep rates.

    The weights here are a deterministic function of the bucket id
    (a multiplicative-hash pseudo-model) standing in for trained
    parameters — swapping in a real model is replacing the ``weight``
    column with a 4096-row lookup table, nothing else moves. The
    decision threshold is applied to the RAW integer score (sigmoid is
    monotone, so "p > 0.5" ≡ "raw > 0") — no float in the keep path.

    Scale (100 TB): model state is fixed at 4096 weights regardless of
    corpus size; the token stream is never shuffled (the feature hash
    is an in-row expression and the weight lookup is a broadcast-hash
    join); the only shuffle is the per-doc aggregate, map-side
    combined to one partial per doc. A real embedding-based classifier
    slots into the same shape with the weight lookup replaced by a
    Pandas-UDF matvec.
    """
    docs = load_table(spark, sf_dir, "documents")
    # the model: a genuine 4096-row relation (bucket → weight), joined
    # in via broadcast exactly as a trained weight table would be;
    # weight(b) is a multiplicative hash into [-1000, 1000]
    model = spark.range(4096).select(
        F.col("id").cast("int").alias("b"),
        bucket_weight("id").cast("long").alias("w"),
    )
    b = token_bucket("token")
    feat = docs.select(
        "doc_id", "lang", F.explode(words("text")).alias("token")
    ).select("doc_id", "lang", b.alias("b"))
    scored = (
        feat.join(F.broadcast(model), "b")
        .groupBy("doc_id", "lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_toks"),
            F.sum("w").cast("long").alias("raw"),
        )
    )
    return (
        scored.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum((F.col("raw") > 0).cast("long")).cast("long").alias("n_kept"),
            F.sum("raw").cast("long").alias("score_checksum"),
        )
        .orderBy("lang")
    )


@query(
    "profile_lineitem_stats",
    oracle="""
    SELECT 'l_quantity' AS col_name,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(l_quantity) AS BIGINT) AS n_nonnull,
           CAST(COUNT(DISTINCT l_quantity) AS BIGINT) AS n_distinct,
           CAST(MIN(l_quantity) AS DOUBLE) AS min_v,
           CAST(MAX(l_quantity) AS DOUBLE) AS max_v,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_v
    FROM lineitem
    UNION ALL
    SELECT 'l_extendedprice',
           CAST(COUNT(*) AS BIGINT),
           CAST(COUNT(l_extendedprice) AS BIGINT),
           CAST(COUNT(DISTINCT l_extendedprice) AS BIGINT),
           CAST(MIN(l_extendedprice) AS DOUBLE),
           CAST(MAX(l_extendedprice) AS DOUBLE),
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
    FROM lineitem
    UNION ALL
    SELECT 'l_discount',
           CAST(COUNT(*) AS BIGINT),
           CAST(COUNT(l_discount) AS BIGINT),
           CAST(COUNT(DISTINCT l_discount) AS BIGINT),
           CAST(MIN(l_discount) AS DOUBLE),
           CAST(MAX(l_discount) AS DOUBLE),
           CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE)
    FROM lineitem
    ORDER BY col_name
    """,
)
def profile_lineitem_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass column profiler (data-quality monitoring): null count,
    exact distinct, min/max, exact sum for three numeric columns in a
    SINGLE scan + single wide aggregate, then unpivoted to one row per
    column by exploding a literal struct array over the 1-row result
    (a Union of per-column selects would re-run the aggregate — and
    the scan — once per column). The oracle spells it as three scans —
    same values, the plan shape is the point.
    """
    li = load_table(spark, sf_dir, "lineitem")
    cols = ["l_quantity", "l_extendedprice", "l_discount"]
    aggs = []
    for c in cols:
        aggs += [
            F.count(F.lit(1)).cast("long").alias(f"{c}__n_rows"),
            F.count(F.col(c)).cast("long").alias(f"{c}__n_nonnull"),
            F.count_distinct(F.col(c)).cast("long").alias(f"{c}__n_distinct"),
            F.min(F.col(c)).cast("double").alias(f"{c}__min_v"),
            F.max(F.col(c)).cast("double").alias(f"{c}__max_v"),
            F.sum(F.col(c).cast("decimal(18,2)")).cast("double").alias(f"{c}__sum_v"),
        ]
    wide = li.agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(c).alias("col_name"),
                F.col(f"{c}__n_rows").alias("n_rows"),
                F.col(f"{c}__n_nonnull").alias("n_nonnull"),
                F.col(f"{c}__n_distinct").alias("n_distinct"),
                F.col(f"{c}__min_v").alias("min_v"),
                F.col(f"{c}__max_v").alias("max_v"),
                F.col(f"{c}__sum_v").alias("sum_v"),
            )
            for c in cols
        ]
    )
    return (
        wide.select(F.explode(rows).alias("r"))
        .select("r.*")
        .orderBy("col_name")
    )


@query(
    "join_strategy_hints",
    oracle="""
    SELECT p.p_brand, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE p.p_size > 40
    GROUP BY p.p_brand
    ORDER BY p.p_brand
    """,
)
def join_strategy_hints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit join-strategy control via hints: force a SHUFFLED HASH
    join where the optimizer would default to broadcast (small dim) or
    sort-merge. At 100 TB this is the escape hatch when BOTH sides are
    too big to broadcast but one still fits a per-partition hash table
    — SHJ skips the two sorts a sort-merge join pays. Plan-pinned to
    ShuffledHashJoin; broadcast and SMJ strategies are pinned by other
    queries (q5, bucketed_colocated_join).
    """
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").where(F.col("p_size") > 40)
    joined = li.join(p.hint("shuffle_hash"), li.l_partkey == p.p_partkey)
    return (
        joined.groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double").alias("sum_qty"),
        )
        .orderBy("p_brand")
    )


@query(
    "window_sliding_distinct_users",
    oracle="""
    WITH wins AS (
      SELECT user_id,
             time_bucket(INTERVAL '30 minutes', ts)
               - g.g * INTERVAL '30 minutes' AS ws
      FROM events, (VALUES (0), (1)) g(g)
    )
    SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS window_start,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
    FROM wins
    GROUP BY ws
    ORDER BY ws
    """,
)
def window_sliding_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window DISTINCT aggregation (1 h window, 30 min slide):
    unique users per overlapping window — the combination the tumbling
    and sliding COUNT queries don't cover. Spark's window() generator
    emits each row into its two containing windows (an in-row Expand,
    window_count = size/slide, no self-join); the distinct runs as one
    hash aggregate per (window, user) then per window. The oracle
    reproduces the window assignment arithmetic with time_bucket.
    """
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes").alias("win"))
        .agg(F.count_distinct("user_id").cast("long").alias("n_users"))
        .select(
            F.date_format(F.col("win.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "n_users",
        )
        .orderBy("window_start")
    )


@query(
    "stats_numeric_showcase",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(corr(l_quantity, l_extendedprice), 6) AS corr_qp,
           ROUND(covar_pop(l_quantity, l_extendedprice), 6) AS covar_qp,
           ROUND(stddev_samp(l_extendedprice), 6) AS std_price,
           ROUND(var_samp(l_quantity), 6) AS var_qty
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def stats_numeric_showcase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates (corr / covariance / stddev / variance)
    per group — single hash aggregate with map-side partials (all four
    are algebraic: sums of x, y, xy, x², y² merge associatively, so
    the shuffle carries one partial row per group per partition).
    Rounded to 6 places: Spark and DuckDB use different but
    numerically-equivalent update formulas.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("corr_qp"),
            F.round(F.covar_pop("l_quantity", "l_extendedprice"), 6).alias("covar_qp"),
            F.round(F.stddev_samp("l_extendedprice"), 6).alias("std_price"),
            F.round(F.var_samp("l_quantity"), 6).alias("var_qty"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "histogram_order_totals",
    oracle="""
    -- DuckDB has no width_bucket; this CASE is its exact definition
    -- for (min 0, max 500000, 25 buckets): bucket width 20000.
    SELECT CASE WHEN o_totalprice < 0 THEN 0
                WHEN o_totalprice >= 500000 THEN 26
                ELSE CAST(FLOOR(o_totalprice / 20000) AS BIGINT) + 1 END AS bin,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
    FROM orders
    GROUP BY bin
    ORDER BY bin
    """,
)
def histogram_order_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equal-width histogram via the SQL-standard width_bucket — the
    binning primitive for profiling and skew diagnosis. Fixed bounds
    keep it one scan + one aggregate (data-derived bounds would add a
    1-row broadcast like BM25's stats — same shape, still no second
    pass over the data).
    """
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy(
            F.expr("CAST(width_bucket(o_totalprice, 0, 500000, 25) AS BIGINT)").alias("bin")
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            dsum("o_totalprice", "sum_price"),
        )
        .orderBy("bin")
    )


@query(
    "fuzzy_match_blocked",
    oracle="""
    WITH names AS (SELECT DISTINCT p_name FROM part)
    SELECT a.p_name AS name_a, b.p_name AS name_b,
           CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist
    FROM names a JOIN names b
      ON split_part(a.p_name, ' ', 1) = split_part(b.p_name, ' ', 1)
     AND a.p_name < b.p_name
    WHERE levenshtein(a.p_name, b.p_name) BETWEEN 1 AND 3
    ORDER BY name_a, name_b
    """,
)
def fuzzy_match_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked fuzzy self-join (data-cleaning / entity-resolution
    primitive): distinct names, equi-join on a blocking key (first
    token) so the edit-distance UDF-free levenshtein only runs within
    blocks — never all-pairs. At 100 TB the blocking key IS the
    shuffle key; quadratic cost is confined to each block.
    """
    names = load_table(spark, sf_dir, "part").select("p_name").distinct()
    a = names.select(F.col("p_name").alias("name_a"))
    b = names.select(F.col("p_name").alias("name_b"))
    joined = a.join(
        b,
        (F.split_part(F.col("name_a"), F.lit(" "), F.lit(1))
         == F.split_part(F.col("name_b"), F.lit(" "), F.lit(1)))
        & (F.col("name_a") < F.col("name_b")),
    )
    return (
        joined.withColumn(
            "dist", F.levenshtein("name_a", "name_b").cast("long")
        )
        .where(F.col("dist").between(1, 3))
        .select("name_a", "name_b", "dist")
        .orderBy("name_a", "name_b")
    )


@query(
    "variant_grouping_sets",
    oracle="""
    SELECT event_type,
           CAST(CAST(props->>'$.k' AS BIGINT) % 10 AS BIGINT) AS k_mod,
           CAST(GROUPING(event_type) AS INT) AS g_type,
           CAST(GROUPING(CAST(CAST(props->>'$.k' AS BIGINT) % 10 AS BIGINT)) AS INT) AS g_kmod,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY GROUPING SETS ((event_type), (CAST(CAST(props->>'$.k' AS BIGINT) % 10 AS BIGINT)), ())
    ORDER BY g_type, g_kmod, event_type NULLS FIRST, k_mod NULLS FIRST
    """,
)
def variant_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS over a variant-extracted dimension — the
    shred-early rule composed with multi-granularity aggregation: $.k
    becomes a typed column in one projection, then a single Expand
    pass produces per-type, per-k-mod, and grand-total rows (no
    re-scan per grouping set).
    """
    ev = load_table(spark, sf_dir, "events")
    shredded = ev.select(
        "event_type",
        (F.variant_get(F.parse_json("props"), "$.k", "bigint") % 10).alias("k_mod"),
        "value",
    )
    shredded.createOrReplaceTempView("_ev_shredded")
    return shredded.sparkSession.sql("""
        SELECT event_type, k_mod,
               CAST(GROUPING(event_type) AS INT) AS g_type,
               CAST(GROUPING(k_mod) AS INT) AS g_kmod,
               COUNT(*) AS n,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        FROM _ev_shredded
        GROUP BY GROUPING SETS ((event_type), (k_mod), ())
        ORDER BY g_type, g_kmod, event_type NULLS FIRST, k_mod NULLS FIRST
    """)


@query(
    "events_anomaly_zscore",
    oracle="""
    WITH stats AS (
      SELECT event_type,
             AVG(value) AS mu,
             stddev_samp(value) AS sigma
      FROM events
      GROUP BY event_type
    )
    SELECT e.event_id, e.event_type,
           ROUND((e.value - s.mu) / NULLIF(s.sigma, 0), 6) AS z
    FROM events e JOIN stats s ON e.event_type = s.event_type
    -- filter on the ROUNDED z: Spark and DuckDB use different
    -- avg/stddev update orders, so an unrounded |z| within ulp drift
    -- of the 3.0 boundary could be a row-set mismatch
    WHERE abs(ROUND((e.value - s.mu) / NULLIF(s.sigma, 0), 6)) > 3
    ORDER BY e.event_id
    """,
)
def events_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-score outlier detection per group: tiny per-group (mu, sigma)
    statistics broadcast back over the events — two scans but zero
    fact-side shuffle (the alternative, a window over event_type,
    would shuffle ALL events by a low-cardinality — i.e. skewed —
    key). Emits |z| > 3 rows, z rounded to absorb engine-formula
    drift in stddev.
    """
    ev = load_table(spark, sf_dir, "events")
    stats = ev.groupBy("event_type").agg(
        F.avg("value").alias("mu"), F.stddev_samp("value").alias("sigma")
    )
    # nullif: a constant-valued group has sigma 0 — no outliers, not a
    # DIVIDE_BY_ZERO (Spark ANSI) or +inf z-score (DuckDB)
    z = (F.col("value") - F.col("mu")) / F.nullif(F.col("sigma"), F.lit(0.0))
    # filter on the ROUNDED z (matching the emitted value) so boundary
    # rows can't differ between engines' stddev formula orderings
    return (
        ev.join(F.broadcast(stats), "event_type")
        .where(F.abs(F.round(z, 6)) > 3)
        .select("event_id", "event_type", F.round(z, 6).alias("z"))
        .orderBy("event_id")
    )


@query(
    "stats_regression_median",
    oracle="""
    SELECT l_returnflag,
           ROUND(regr_slope(l_extendedprice, l_quantity), 6) AS slope,
           ROUND(regr_intercept(l_extendedprice, l_quantity), 6) AS intercept,
           ROUND(regr_r2(l_extendedprice, l_quantity), 6) AS r2,
           ROUND(median(l_quantity), 6) AS median_qty
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def stats_regression_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-standard linear-regression aggregates (slope / intercept /
    R²) plus exact interpolated median, per group. The regr_* family
    is algebraic (merges via sum partials — one shuffle of one partial
    row per group per partition); median is the one genuinely
    holistic aggregate here, handled by Spark's sort-based percentile
    within each (small) group. Rounded to absorb formula-order drift.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(F.regr_slope("l_extendedprice", "l_quantity"), 6).alias("slope"),
            F.round(F.regr_intercept("l_extendedprice", "l_quantity"), 6).alias("intercept"),
            F.round(F.regr_r2("l_extendedprice", "l_quantity"), 6).alias("r2"),
            F.round(F.median("l_quantity"), 6).alias("median_qty"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "nested_array_agg",
    oracle="""
    SELECT l_orderkey,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           to_json(list_sort(list(CAST(l_quantity AS BIGINT)))) AS quantities
    FROM lineitem
    WHERE l_orderkey % 500 = 0
    GROUP BY l_orderkey
    ORDER BY l_orderkey
    """,
)
def nested_array_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested (array-valued) aggregation: each order's line quantities
    collected into a SORTED array, emitted as canonical JSON so both
    engines compare byte-identically — collect_list alone is
    partition-order-dependent; sort_array makes it deterministic. The
    denormalize-into-arrays step every document/feature store needs;
    group state is bounded by lines-per-order, not corpus size.
    """
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_orderkey") % 500 == 0)
    return (
        li.groupBy("l_orderkey")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_lines"),
            F.to_json(
                F.sort_array(F.collect_list(F.col("l_quantity").cast("bigint")))
            ).alias("quantities"),
        )
        .orderBy("l_orderkey")
    )


@query(
    "approx_quantile_bounds",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           TRUE AS p50_ok, TRUE AS p90_ok
    FROM lineitem
    """,
)
def approx_quantile_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate percentile with a hash-checkable guarantee, in the
    same style as the ANN recall summaries: percentile_approx (GK
    sketch, accuracy 1/eps = 1000 → rank error ≤ 0.1%) must land
    between the EXACT quantiles at q ∓ 2·eps. The plan computes sketch
    and exact quantiles in ONE aggregate pass; the driver hash-checks
    the (n_rows, ok, ok) summary. At 100 TB only the sketch path
    survives (exact percentile is the oracle-side luxury); the GK
    sketch merges associatively across partitions.
    """
    li = load_table(spark, sf_dir, "lineitem")
    eps = 0.001
    agg = li.agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.percentile_approx("l_extendedprice", 0.5, int(1 / eps)).alias("a50"),
        F.percentile_approx("l_extendedprice", 0.9, int(1 / eps)).alias("a90"),
        F.expr(
            f"percentile(l_extendedprice, {0.5 - 2 * eps})"
        ).alias("lo50"),
        F.expr(
            f"percentile(l_extendedprice, {0.5 + 2 * eps})"
        ).alias("hi50"),
        F.expr(
            f"percentile(l_extendedprice, {0.9 - 2 * eps})"
        ).alias("lo90"),
        F.expr(
            f"percentile(l_extendedprice, {0.9 + 2 * eps})"
        ).alias("hi90"),
    )
    return agg.select(
        "n_rows",
        ((F.col("a50") >= F.col("lo50")) & (F.col("a50") <= F.col("hi50"))).alias("p50_ok"),
        ((F.col("a90") >= F.col("lo90")) & (F.col("a90") <= F.col("hi90"))).alias("p90_ok"),
    )


@query(
    "top_ngrams_per_lang",
    oracle="""
    WITH toks AS (
      SELECT lang, list_filter(string_split(text, ' '), x -> len(x) > 0) AS w
      FROM documents
    ),
    grams AS (
      -- scalar range(): bound derives from the data (no fixed cap
      -- that silently drops grams in longer regenerated documents)
      SELECT lang, w[i::INT] || ' ' || w[(i + 1)::INT] AS gram
      FROM (SELECT lang, w, unnest(range(1, len(w))) AS i FROM toks)
    ),
    counts AS (
      SELECT lang, gram, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM grams GROUP BY lang, gram
    ),
    ranked AS (
      SELECT lang, gram, cnt,
             ROW_NUMBER() OVER (PARTITION BY lang ORDER BY cnt DESC, gram) AS rnk
      FROM counts
    )
    SELECT lang, gram, cnt, CAST(rnk AS BIGINT) AS rnk
    FROM ranked WHERE rnk <= 3
    ORDER BY lang, rnk
    """,
)
def top_ngrams_per_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 word bigrams per language — corpus vocabulary analytics.
    Bigrams are built IN-ROW (zip of the word array with its tail, one
    Generate — no token-level self-join), counted with a map-side-
    combined groupBy, then cut per language by a rank window that
    Catalyst executes as WindowGroupLimit (per-partition top-k before
    the final shuffle, so the window never sees the full vocabulary).
    """
    docs = load_table(spark, sf_dir, "documents")
    w = words("text")
    grams = docs.select(
        "lang",
        F.explode(
            F.zip_with(
                F.slice(w, 1, F.greatest(F.size(w) - 1, F.lit(0))),
                F.slice(w, 2, F.greatest(F.size(w) - 1, F.lit(0))),
                lambda a, b: F.concat_ws(" ", a, b),
            )
        ).alias("gram"),
    )
    counts = grams.groupBy("lang", "gram").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    from pyspark.sql import Window

    rnk = F.row_number().over(
        Window.partitionBy("lang").orderBy(F.col("cnt").desc(), "gram")
    )
    return (
        counts.withColumn("rnk", rnk.cast("long"))
        .where(F.col("rnk") <= 3)
        .orderBy("lang", "rnk")
    )


def _word_ngrams(w, n: int):
    """Distinct in-row word n-grams from a word-array column: one
    Generate, no token-level self-join; empty for docs shorter than n
    (sequence() DESCENDS for a negative span, so the guard matters).

    Each gram is one slice+array_join — NOT n ``element_at`` calls: a
    lambda-body reference to the outer (computed) word-array expression
    is re-inlined per use, so n refs per gram re-evaluates the split n
    times per gram (the anti-pattern that cost text_repetition_stats
    290 s — operators/text.py::_dup_gram_char_fraction)."""
    grams = F.transform(
        F.sequence(F.lit(1), F.size(w) - (n - 1)),
        lambda i: F.array_join(F.slice(w, i, n), " "),
    )
    return F.when(F.size(w) >= n, F.array_distinct(grams)).otherwise(
        F.array().cast("array<string>")
    )


_WORDS_5G_SQL = """
words AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> len(x) > 0) AS ws
  FROM documents
),
grams AS (
  SELECT DISTINCT doc_id,
         ws[i::INT] || ' ' || ws[(i+1)::INT] || ' ' || ws[(i+2)::INT]
           || ' ' || ws[(i+3)::INT] || ' ' || ws[(i+4)::INT] AS g
  FROM (SELECT doc_id, ws, unnest(range(1, len(ws) - 3)) AS i FROM words)
)"""


@query(
    "text_boilerplate_coverage",
    oracle=f"""
    WITH {_WORDS_5G_SQL},
    df AS (SELECT g, COUNT(*) AS df FROM grams GROUP BY 1),
    boiler AS (SELECT g FROM df WHERE df >= 3)
    SELECT gr.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_grams,
           CAST(SUM(CASE WHEN b.g IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_boiler,
           ROUND(SUM(CASE WHEN b.g IS NOT NULL THEN 1 ELSE 0 END)::DOUBLE
                 / COUNT(*), 6) AS coverage
    FROM grams gr LEFT JOIN boiler b ON b.g = gr.g
    GROUP BY gr.doc_id ORDER BY gr.doc_id
    """,
)
def text_boilerplate_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document boilerplate detection (the CCNet/RefinedWeb-style
    filter the intra-document repetition stats can't see): word
    5-grams shared by >= 3 documents are 'boilerplate'; each document
    reports what fraction of its distinct 5-grams is boilerplate.
    Scale shape: grams are built IN-ROW (one Generate); the document-
    frequency aggregate is map-side combined and its >= 3 survivors —
    bounded by total_gram_occurrences / 3 and in practice template
    fragments — broadcast back into the per-document join, so the
    corpus-sized gram stream shuffles only for the df count, never for
    the coverage join."""
    docs = load_table(spark, sf_dir, "documents")
    grams = docs.select(
        "doc_id", F.explode(_word_ngrams(words("text"), 5)).alias("g")
    )
    boiler = (
        grams.groupBy("g")
        .agg(F.count(F.lit(1)).alias("df"))
        .where(F.col("df") >= 3)
        .select("g", F.lit(1).alias("is_boiler"))
    )
    return (
        grams.join(F.broadcast(boiler), "g", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(F.coalesce("is_boiler", F.lit(0))).cast("long").alias("n_boiler"),
            F.round(
                F.sum(F.coalesce("is_boiler", F.lit(0))).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("coverage"),
        )
        .orderBy("doc_id")
    )


@query(
    "text_inverted_index",
    oracle="""
    WITH words AS (
      SELECT doc_id, list_filter(string_split(text, ' '), x -> len(x) > 0) AS ws
      FROM documents
    ),
    grams AS (
      SELECT DISTINCT doc_id, ws[i::INT] || ' ' || ws[(i+1)::INT] AS g
      FROM (SELECT doc_id, ws, unnest(range(1, len(ws))) AS i FROM words)
    ),
    df AS (SELECT g, COUNT(*) AS df FROM grams GROUP BY 1),
    posts AS (SELECT g, string_agg(doc_id, ',' ORDER BY doc_id) AS postings
              FROM grams GROUP BY 1)
    SELECT d.g AS term, CAST(d.df AS BIGINT) AS df,
           CASE WHEN d.df <= 16 THEN p.postings END AS postings
    FROM df d JOIN posts p ON p.g = d.g
    ORDER BY term
    """,
)
def text_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialized inverted index over word bigrams with the df-GATED
    posting-list discipline a 100 TB index build needs: pass 1 counts
    document frequency per term (map-side-combined, count-only — safe
    on any skew); ONLY terms with df <= 16 — the broadcastable rare
    tail — get an exact sorted posting list in pass 2. A stopword-
    scale term therefore never reaches a collect_set (the single-task
    giant-array hazard); its row carries df with NULL postings, which
    is also what a real index does (frequent terms get block-skipped
    or bitmap-encoded, not naive id lists). The gram stream shuffles
    once per pass; the rare-term filter is broadcast into pass 2."""
    docs = load_table(spark, sf_dir, "documents")
    grams = docs.select(
        "doc_id", F.explode(_word_ngrams(words("text"), 2)).alias("g")
    )
    df_counts = grams.groupBy("g").agg(F.count(F.lit(1)).alias("df"))
    rare = df_counts.where(F.col("df") <= 16).select("g")
    postings = (
        grams.join(F.broadcast(rare), "g")
        .groupBy("g")
        .agg(
            F.array_join(
                F.transform(
                    F.sort_array(F.collect_set("doc_id")),
                    lambda x: x.cast("string"),
                ),
                ",",
            ).alias("postings")
        )
    )
    return (
        df_counts.join(postings, "g", "left")
        .select(F.col("g").alias("term"), F.col("df").cast("long"), "postings")
        .orderBy("term")
    )


@query(
    "embedding_gram_matrix",
    oracle="""
    SELECT CAST(t.i AS BIGINT) AS i, CAST(u.j AS BIGINT) AS j,
           ROUND(CAST(SUM(CAST(embedding[t.i::INT]::DOUBLE
                              * embedding[u.j::INT]::DOUBLE
                              AS DECIMAL(30,15))) AS DOUBLE), 9) AS gram
    FROM embeddings, range(1, 65) t(i), range(1, 65) u(j)
    WHERE t.i <= u.j
    GROUP BY t.i, u.j ORDER BY i, j
    """,
)
def embedding_gram_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed Gram matrix X^T X over the embedding corpus — the
    d x d sufficient statistic behind PCA / whitening / covariance
    analysis of an embedding store. Upper triangle only (symmetric):
    d(d+1)/2 = 2080 cells at d=64. Each row contributes its outer-
    product upper triangle via ONE in-row Generate (no row x dimension
    self-join); the hash aggregate has a FIXED 2080-group key space,
    so map-side partials collapse every partition to 2080 rows before
    the only shuffle — at 100 TB the reduce stage moves 2080 rows per
    partition regardless of corpus size, and the result is driver-
    bounded by construction. Products accumulate in DECIMAL(30,15)
    (engine-order-independent), rounded to 9 places on emit, matching
    the repo's similarity-operator convention. A production deployment
    would swap the per-row HOF for a numpy X^T X mapInArrow kernel per
    Arrow batch with the same (i, j, partial) output contract."""
    emb = load_table(spark, sf_dir, "embeddings")
    cells = emb.select(
        F.explode(
            F.expr(
                """
        flatten(transform(sequence(1, 64), i ->
          transform(sequence(i, 64), j ->
            struct(i AS i, j AS j,
              cast(cast(element_at(embedding, i) AS double)
                   * cast(element_at(embedding, j) AS double)
                   AS decimal(30,15)) AS p))))
        """
            )
        ).alias("c")
    ).select("c.*")
    return (
        cells.groupBy("i", "j")
        .agg(F.round(F.sum("p").cast("double"), 9).alias("gram"))
        .select(F.col("i").cast("long"), F.col("j").cast("long"), "gram")
        .orderBy("i", "j")
    )


@query(
    "timeseries_cusum_changepoint",
    oracle="""
    WITH daily AS (
      SELECT event_type,
             CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS day,
             CAST(COUNT(*) AS BIGINT) AS x
      FROM events GROUP BY 1, 2
    ),
    prefixed AS (
      SELECT event_type, day, x,
             SUM(x) OVER (PARTITION BY event_type ORDER BY day
                          ROWS BETWEEN UNBOUNDED PRECEDING
                          AND CURRENT ROW) AS pk,
             ROW_NUMBER() OVER (PARTITION BY event_type
                                ORDER BY day) AS k,
             SUM(x) OVER (PARTITION BY event_type) AS total,
             COUNT(*) OVER (PARTITION BY event_type) AS n
      FROM daily
    ),
    stats AS (
      SELECT event_type, day, n,
             ABS(n * pk - k * total) AS t_abs
      FROM prefixed
    )
    SELECT event_type,
           CAST(MAX(n) AS BIGINT) AS n_days,
           CAST(MIN(day) FILTER (
             WHERE t_abs = (SELECT MAX(s2.t_abs) FROM stats s2
                            WHERE s2.event_type = stats.event_type)
           ) AS BIGINT) AS cp_day,
           CAST(MAX(t_abs) AS BIGINT) AS cusum_stat
    FROM stats
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def timeseries_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Offline CUSUM changepoint detection per event-type series: the
    day k that maximizes |S_k| where S_k = Σ_{i≤k}(x_i − mean) over the
    daily event counts — the standard single-changepoint location
    statistic (ties → earliest day). Computed INTEGER-EXACTLY by
    scaling out the fractional mean: n·S_k = n·P_k − k·total, so both
    engines land on identical BIGINTs and the argmax is
    drift-free.

    Plan shape: one corpus scan → (type, day) count aggregate (the
    series relation is tiny — days × types), then ONE event_type-keyed
    window exchange computes prefix sums, ranks, and per-type totals
    in the same partitioning; the argmax is a per-type max_by. At
    100 TB the corpus cost is the daily aggregate's map-side combine;
    everything after runs on the bounded series."""
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.groupBy(
            "event_type",
            F.datediff(F.to_date("ts"), F.lit("1970-01-01"))
            .cast("long")
            .alias("day"),
        )
        .agg(F.count(F.lit(1)).alias("x"))
    )
    wp = Window.partitionBy("event_type").orderBy("day")
    wt = Window.partitionBy("event_type")
    stats = daily.select(
        "event_type",
        "day",
        F.abs(
            F.count(F.lit(1)).over(wt) * F.sum("x").over(wp)
            - F.row_number().over(wp) * F.sum("x").over(wt)
        ).alias("t_abs"),
        F.count(F.lit(1)).over(wt).alias("n"),
    )
    return (
        stats.groupBy("event_type")
        .agg(
            F.max("n").cast("long").alias("n_days"),
            F.expr("min_by(day, struct(-t_abs, day))")
            .cast("long")
            .alias("cp_day"),
            F.max("t_abs").cast("long").alias("cusum_stat"),
        )
        .orderBy("event_type")
    )


@query(
    "stats_mad_histogram",
    oracle="""
    WITH hist AS (
      SELECT event_type, CAST(FLOOR(value * 100) AS BIGINT) AS cents,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM events GROUP BY 1, 2),
    tot AS (SELECT event_type, CAST(SUM(cnt) AS BIGINT) AS n
            FROM hist GROUP BY 1),
    cum AS (SELECT h.event_type, h.cents, t.n,
                   SUM(h.cnt) OVER (PARTITION BY h.event_type
                                    ORDER BY h.cents) AS cum
            FROM hist h JOIN tot t USING (event_type)),
    med AS (SELECT event_type, MIN(n) AS n, MIN(cents) AS med_cents
            FROM cum WHERE cum >= (n + 1) // 2 GROUP BY event_type),
    dh AS (SELECT h.event_type, ABS(h.cents - m.med_cents) AS dev,
                  CAST(SUM(h.cnt) AS BIGINT) AS dcnt
           FROM hist h JOIN med m USING (event_type) GROUP BY 1, 2),
    dcum AS (SELECT d.event_type, d.dev, m.n, m.med_cents,
                    SUM(d.dcnt) OVER (PARTITION BY d.event_type
                                      ORDER BY d.dev) AS cum
             FROM dh d JOIN med m USING (event_type)),
    mad AS (SELECT event_type, MIN(n) AS n, MIN(med_cents) AS med_cents,
                   MIN(dev) AS mad_cents
            FROM dcum WHERE cum >= (n + 1) // 2 GROUP BY event_type)
    SELECT h.event_type, m.n, m.med_cents, m.mad_cents,
           CAST(COALESCE(SUM(CASE WHEN ABS(h.cents - m.med_cents)
                                       > 5 * m.mad_cents
                                  THEN h.cnt END), 0) AS BIGINT) AS n_outliers
    FROM hist h JOIN mad m USING (event_type)
    GROUP BY 1, 2, 3, 4 ORDER BY h.event_type
    """,
)
def stats_mad_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-group outlier statistics — exact weighted MEDIAN,
    MAD (median absolute deviation), and |x−med| > 5·MAD outlier
    counts — via HISTOGRAM REDUCTION, the scale path for holistic
    aggregates over low-cardinality groups. `events_anomaly_zscore`
    (mean/σ) is distorted by the very outliers it hunts; the median/
    MAD center-spread pair is the robust standard (5·MAD ≈ 3.37σ on
    normal data).

    Why not `median()` per group or a window sort: event_type has ~5
    distinct values, so any per-group sort/percentile shuffles the
    whole corpus onto ~5 reducers — the skew wall at 100 TB. Instead
    ONE map-side-combined groupBy reduces the corpus to a (group,
    cents) histogram bounded by the VALUE DOMAIN (≤ ~50k rows/group
    forever, regardless of corpus size); the weighted lower-median is
    then a cumulative-sum window over that compact table, the
    deviation histogram derives from the same hist rows (never
    re-scanning events), and the outlier count is a weighted sum over
    hist — identical Exchange subtrees collapse via ReuseExchange.
    All arithmetic is integer cents (FLOOR(value·100) — floor of a
    double is engine-exact where round-half modes are not), so every
    emitted number hash-matches bit-for-bit."""
    ev = load_table(spark, sf_dir, "events")
    hist = (
        ev.select(
            "event_type",
            F.expr("CAST(FLOOR(value * 100) AS BIGINT)").alias("cents"),
        )
        .groupBy("event_type", "cents")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    tot = hist.groupBy("event_type").agg(F.sum("cnt").cast("long").alias("n"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("cents")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = hist.withColumn("cum", F.sum("cnt").over(w)).join(
        F.broadcast(tot), "event_type"
    )
    med = (
        cum.where(F.expr("cum >= (n + 1) div 2"))
        .groupBy("event_type")
        .agg(F.min("n").alias("n"), F.min("cents").alias("med_cents"))
    )
    dh = (
        hist.join(F.broadcast(med), "event_type")
        .select(
            "event_type",
            F.abs(F.col("cents") - F.col("med_cents")).alias("dev"),
            "cnt",
        )
        .groupBy("event_type", "dev")
        .agg(F.sum("cnt").cast("long").alias("dcnt"))
    )
    wd = (
        Window.partitionBy("event_type")
        .orderBy("dev")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    mad = (
        dh.withColumn("cum", F.sum("dcnt").over(wd))
        .join(F.broadcast(med), "event_type")
        .where(F.expr("cum >= (n + 1) div 2"))
        .groupBy("event_type")
        .agg(
            F.min("n").alias("n"),
            F.min("med_cents").alias("med_cents"),
            F.min("dev").alias("mad_cents"),
        )
    )
    return (
        hist.join(F.broadcast(mad), "event_type")
        .groupBy("event_type", "n", "med_cents", "mad_cents")
        .agg(
            F.coalesce(
                F.sum(
                    F.when(
                        F.abs(F.col("cents") - F.col("med_cents"))
                        > 5 * F.col("mad_cents"),
                        F.col("cnt"),
                    )
                ),
                F.lit(0),
            )
            .cast("long")
            .alias("n_outliers")
        )
        .orderBy("event_type")
    )


@query(
    "text_phrase_search",
    oracle="""
    -- the oracle is the naive formulation: scan every token of every
    -- document and test adjacency in place — a different algorithm
    -- than the Spark postings-join, so agreement checks the algorithm
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
    hits AS (
      SELECT doc_id, COUNT(*) AS n_occurrences
      FROM (SELECT doc_id, tk, unnest(range(1, len(tk))) AS i FROM toks)
      WHERE tk[CAST(i AS INT)] = 'table' AND tk[CAST(i AS INT) + 1] = 'scan'
      GROUP BY doc_id)
    SELECT doc_id, CAST(n_occurrences AS BIGINT) AS n_occurrences
    FROM hits ORDER BY doc_id
    """,
)
def text_phrase_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact PHRASE search ("table scan") via a positional inverted
    index — the IR operator a LIKE-scan cannot provide at 100 TB.
    `text_inverted_index` / `text_bm25_search` rank by bag-of-words;
    phrase queries need token POSITIONS and an adjacency join.

    Spark-first shape: one corpus scan posexplodes to (doc, pos,
    term), immediately filtered to the postings of the two phrase
    terms (the filter sits inside the same codegen stage as the
    Generate, so only the phrase terms' postings — a tiny fraction of
    all tokens — survive to the shuffle); occurrences are an equi-join
    of the two postings lists on (doc_id, pos+1 = pos). Overlapping
    occurrences count correctly (each adjacency is its own postings
    pair). At 100 TB with a persisted positional index this probe
    touches ONLY the phrase terms' postings buckets — the same
    persisted-index discipline as `dedup_incremental_bucketed_index`;
    here the index build is in-plan because the corpus is the input.
    The oracle tests every adjacent token pair per document instead —
    a different algorithm confirming the same answer."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    toks = docs.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "term")
    )
    first = toks.where(F.col("term") == "table").select(
        "doc_id", (F.col("pos") + 1).alias("adj")
    )
    second = toks.where(F.col("term") == "scan").select(
        "doc_id", F.col("pos").alias("adj")
    )
    return (
        first.join(second, ["doc_id", "adj"])
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_occurrences"))
        .orderBy("doc_id")
    )


@query(
    "privacy_k_anonymity_audit",
    oracle="""
    WITH q AS (
      SELECT event_type,
             CAST(LEAST(GREATEST(CAST(FLOOR(value / 100) AS INT), 0), 4) AS INT)
               AS value_band,
             CAST(dayofweek(ts) AS INT) AS weekday,
             user_id
      FROM events),
    grp AS (
      SELECT event_type, value_band, weekday,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(COUNT(DISTINCT user_id) AS BIGINT) AS l_div
      FROM q GROUP BY 1, 2, 3)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_groups,
           CAST(SUM(CASE WHEN n < 5 THEN 1 ELSE 0 END) AS BIGINT)
             AS groups_below_k,
           CAST(SUM(CASE WHEN n < 5 THEN n ELSE 0 END) AS BIGINT)
             AS rows_to_suppress,
           CAST(SUM(CASE WHEN l_div < 3 THEN 1 ELSE 0 END) AS BIGINT)
             AS groups_below_l,
           CAST(MIN(n) AS BIGINT) AS min_group_size,
           CAST(MIN(l_div) AS BIGINT) AS min_l_diversity
    FROM grp
    """,
)
def privacy_k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-governance release audit: k-ANONYMITY and l-DIVERSITY over
    the quasi-identifier tuple (event_type, value band, weekday) with
    user_id as the sensitive attribute — the check a 100 TB dataset
    passes before third-party release (groups smaller than k=5 are
    re-identifiable; groups whose sensitive attribute takes < l=3
    distinct values leak it even at k). Pairs with
    `text_pii_redaction` as the governance family: redaction scrubs
    values, this audits STRUCTURE.

    Plan: ONE map-side-combined groupBy over the quasi-identifier
    (group count is bounded by the attribute domain — 5 types × 5
    bands × 7 weekdays — not the corpus), with l-diversity as a
    count_distinct inside the same aggregate (Expand rewrite); the
    release decision reduces to a 6-number summary. Suppression would
    then be ONE broadcast anti-join of the below-k group list back
    onto the corpus — the list is model-sized by construction."""
    ev = load_table(spark, sf_dir, "events")
    q = ev.select(
        "event_type",
        F.least(
            F.greatest(F.floor(F.col("value") / 100).cast("int"), F.lit(0)),
            F.lit(4),
        ).alias("value_band"),
        F.dayofweek("ts").cast("int").alias("weekday"),
        "user_id",
    )
    grp = q.groupBy("event_type", "value_band", "weekday").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.count_distinct("user_id").cast("long").alias("l_div"),
    )
    return grp.agg(
        F.count(F.lit(1)).cast("long").alias("n_groups"),
        F.sum(F.when(F.col("n") < 5, 1).otherwise(0)).cast("long").alias(
            "groups_below_k"
        ),
        F.sum(F.when(F.col("n") < 5, F.col("n")).otherwise(0))
        .cast("long")
        .alias("rows_to_suppress"),
        F.sum(F.when(F.col("l_div") < 3, 1).otherwise(0)).cast("long").alias(
            "groups_below_l"
        ),
        F.min("n").cast("long").alias("min_group_size"),
        F.min("l_div").cast("long").alias("min_l_diversity"),
    )


@query(
    "text_bigram_surprisal",
    oracle=f"""
    -- independent replay of the bigram LM: counts, integer floor-log2
    -- surprisal (length(bin(c1 // c2)) - 1), per-doc weighted sum
    WITH ws AS (
      SELECT doc_id, {_DOC_WORDS_SQL} AS w FROM documents),
    bg AS (
      SELECT doc_id, w[i] AS w1, w[i + 1] AS w2
      FROM ws, LATERAL (SELECT unnest(range(1, len(w))) AS i) i
      WHERE len(w) >= 2),
    c1 AS (
      SELECT u AS w1, COUNT(*) AS c1
      FROM (SELECT unnest(w) AS u FROM ws) GROUP BY u),
    c2 AS (SELECT w1, w2, COUNT(*) AS c2 FROM bg GROUP BY w1, w2),
    t AS (
      SELECT c2.w1, c2.w2, length(bin(c1.c1 // c2.c2)) - 1 AS s
      FROM c2 JOIN c1 ON c1.w1 = c2.w1),
    m AS (
      SELECT doc_id, w1, w2, COUNT(*) AS m FROM bg GROUP BY doc_id, w1, w2)
    SELECT m.doc_id,
           CAST(SUM(m.m) AS BIGINT) AS n_bigrams,
           CAST(SUM(m.m * t.s) AS BIGINT) AS surprisal_sum
    FROM m JOIN t ON m.w1 = t.w1 AND m.w2 = t.w2
    GROUP BY m.doc_id
    ORDER BY doc_id
    """,
)
def text_bigram_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """In-engine bigram language model + per-document surprisal
    scoring — the CCNet-style "LM perplexity" quality stage, trained
    and applied in one plan with INTEGER-EXACT arithmetic: per-bigram
    surprisal is floor(log2(c1(w1) / c2(w1,w2))) computed as
    length(bin(c1 div c2)) - 1, so both engines agree bit-for-bit
    (float ln() would diverge in the last ulp and break the value
    hash; the floor-log2 bucket is the standard integerized surprisal
    and c2 <= c1 always holds, every bigram occurrence IS a w1
    occurrence). High surprisal_sum/n_bigrams = improbable word
    transitions = boilerplate/garble candidates.

    Scale shape: adjacency comes from an array slice+zip INSIDE the
    row (no positional self-join of the corpus with itself); the
    unigram and bigram count tables are VOCABULARY-bounded aggregates
    (map-side combined); the model join keys are tokens, so every
    join is equi (vocab x vocab and per-doc-types x vocab) and the
    final per-doc aggregation shuffles on doc_id once. At 100 TB the
    count tables either broadcast (capped vocab) or bucket-join —
    same dial as the classifier/TF-IDF family; nothing is ever
    all-pairs and no driver-side state exists at all."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", words("text").alias("ws")
    )
    pairs = (
        docs.where(F.size("ws") >= 2)
        .withColumn("a", F.expr("slice(ws, 1, size(ws) - 1)"))
        .withColumn("b", F.expr("slice(ws, 2, size(ws) - 1)"))
        .select("doc_id", F.explode(F.arrays_zip("a", "b")).alias("bg"))
        .select(
            "doc_id",
            F.col("bg.a").alias("w1"),
            F.col("bg.b").alias("w2"),
        )
    )
    c1 = (
        docs.select(F.explode("ws").alias("w1"))
        .groupBy("w1")
        .agg(F.count(F.lit(1)).alias("c1"))
    )
    c2 = pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c2"))
    model = c2.join(c1, "w1").select(
        "w1",
        "w2",
        (F.length(F.bin(F.expr("c1 div c2"))) - 1).alias("s"),
    )
    m = pairs.groupBy("doc_id", "w1", "w2").agg(
        F.count(F.lit(1)).alias("m")
    )
    return (
        m.join(model, ["w1", "w2"])
        .groupBy("doc_id")
        .agg(
            F.sum("m").cast("long").alias("n_bigrams"),
            F.sum(F.col("m") * F.col("s")).cast("long").alias("surprisal_sum"),
        )
        .orderBy("doc_id")
    )


@query(
    "feature_equidepth_binning",
    oracle="""
    -- oracle allows itself the single-node luxury: one global window
    WITH r AS (
      SELECT CAST(o_totalprice AS DECIMAL(18,2)) AS p,
             ROW_NUMBER() OVER (ORDER BY CAST(o_totalprice AS DECIMAL(18,2)),
                                o_orderkey) AS rn,
             COUNT(*) OVER () AS n
      FROM orders)
    SELECT CAST((rn - 1) * 10 // n AS INT) AS bin,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(MIN(p) AS DOUBLE) AS lo,
           CAST(MAX(p) AS DOUBLE) AS hi,
           CAST(SUM(p) AS DOUBLE) AS sum_value
    FROM r GROUP BY 1 ORDER BY bin
    """,
)
def feature_equidepth_binning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT equi-depth (decile) binning of a numeric feature — the
    feature-engineering primitive behind quantile bucketing, monotone
    target encoding and histogram-equalized features: every bin holds
    exactly floor-or-ceil(n/10) rows (bin = (rank-1)*10 div n over the
    exact global rank), and the emitted (lo, hi) pairs ARE the bin
    boundary table a training pipeline broadcasts to bin the next
    batch. Unlike `approx_quantile_bounds` (sketch, ±1% rank error)
    the depths here are exact — the audit pair: run both, diff the
    boundaries.

    Scale shape: the exact rank comes from `operators/ranking.py::
    global_rank` — approxQuantile pre-buckets the value range, ranks
    are computed per bucket and offset by broadcast partial counts, so
    there is NO SinglePartition window anywhere (plan-pinned for the
    global_rank family); the total count joins in as a 1-row
    broadcast. The oracle allows itself the single-node global window
    — a DIFFERENT algorithm, so the hash checks the distributed
    rank/binning logic."""
    from ..operators.ranking import global_rank

    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_totalprice").cast("decimal(18,2)").alias("p"),
        "o_orderkey",
    )
    ranked = global_rank(
        orders, "p", "o_orderkey", ascending=True, rank_col="r"
    )
    n1 = orders.agg(F.count(F.lit(1)).alias("n"))
    binned = ranked.crossJoin(F.broadcast(n1)).select(
        F.expr("(r - 1) * 10 div n").cast("int").alias("bin"), "p"
    )
    return (
        binned.groupBy("bin")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.min("p").cast("double").alias("lo"),
            F.max("p").cast("double").alias("hi"),
            F.sum("p").cast("double").alias("sum_value"),
        )
        .orderBy("bin")
    )


@query(
    "attribution_first_last_touch",
    oracle="""
    -- champion selection via MIN/MAX over fixed-width (sk || type)
    -- strings: no conditional-key arg_min/arg_max (engines disagree
    -- on NULL-key handling), plain MIN/MAX skip NULLs identically
    WITH ev AS (
      SELECT user_id, event_type,
             CAST(value AS DECIMAL(18,2)) AS v,
             epoch_us(ts) AS tus,
             lpad(CAST(epoch_us(ts) + 4611686018427387904 AS VARCHAR),
                  20, '0')
               || lpad(CAST(event_id AS VARCHAR), 12, '0') AS sk
      FROM events),
    lagged AS (
      SELECT *, LAG(tus) OVER (PARTITION BY user_id ORDER BY sk) AS ptus
      FROM ev),
    sess AS (
      SELECT *, SUM(CASE WHEN ptus IS NULL OR tus - ptus > 1800000000
                         THEN 1 ELSE 0 END)
                  OVER (PARTITION BY user_id ORDER BY sk) AS s
      FROM lagged),
    marked AS (
      SELECT *, MIN(CASE WHEN event_type = 'purchase' THEN sk END)
                  OVER (PARTITION BY user_id, s) AS fp_sk
      FROM sess),
    agg AS (
      SELECT user_id, s,
             substr(MIN(sk || '|' || event_type), 34) AS first_touch,
             substr(MAX(CASE WHEN sk < fp_sk AND event_type <> 'purchase'
                             THEN sk || '|' || event_type END), 34)
               AS last_pre,
             SUM(CASE WHEN event_type = 'purchase' THEN v END) AS rev
      FROM marked WHERE fp_sk IS NOT NULL
      GROUP BY user_id, s)
    SELECT model, channel,
           CAST(COUNT(*) AS BIGINT) AS n_sessions,
           CAST(SUM(rev) AS DOUBLE) AS revenue
    FROM (
      SELECT 'first_touch' AS model, first_touch AS channel, rev FROM agg
      UNION ALL
      SELECT 'last_touch', COALESCE(last_pre, 'direct'), rev FROM agg)
    GROUP BY model, channel
    ORDER BY model, channel
    """,
)
def attribution_first_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marketing-style conversion ATTRIBUTION over gap-sessionized
    events: sessions split on >30-min inactivity (gaps-and-islands),
    converting sessions (>= 1 purchase) credit their purchase revenue
    to (a) the session's FIRST touch and (b) the LAST non-purchase
    touch before the first purchase ('direct' when the purchase opens
    the session) — the two classical single-touch models, reported per
    (model, channel). Champions are MIN/MAX over fixed-width
    (sort-key || type) strings, so NULL-key arg_min/arg_max
    differences between engines never matter (plain MIN/MAX skip
    NULLs identically everywhere); the sort key carries the +2^62
    epoch bias convention.

    Scale shape: the LAG and the running session-id SUM share ONE
    (user_id) sort+shuffle; the first-purchase window adds the
    (user_id, session) partitioning; then one grouped aggregate per
    session and a tiny (model, channel) re-aggregation. Revenue sums
    are decimal-exact. Nothing is corpus-crossing: every window and
    group is keyed by the user/session."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.col("value").cast("decimal(18,2)").alias("v"),
        F.unix_micros("ts").alias("tus"),
        F.concat(
            F.lpad(
                (F.unix_micros("ts") + F.lit(4611686018427387904)).cast(
                    "string"
                ),
                20,
                "0",
            ),
            F.lpad(F.col("event_id").cast("string"), 12, "0"),
        ).alias("sk"),
    )
    wu = Window.partitionBy("user_id").orderBy("sk")
    sess = ev.withColumn("ptus", F.lag("tus").over(wu)).withColumn(
        "s",
        F.sum(
            (
                F.col("ptus").isNull()
                | ((F.col("tus") - F.col("ptus")) > 1_800_000_000)
            ).cast("int")
        ).over(wu),
    )
    ws = Window.partitionBy("user_id", "s")
    marked = sess.withColumn(
        "fp_sk",
        F.min(
            F.when(F.col("event_type") == "purchase", F.col("sk"))
        ).over(ws),
    )
    packed = F.concat_ws("|", "sk", "event_type")
    agg = (
        marked.where(F.col("fp_sk").isNotNull())
        .groupBy("user_id", "s")
        .agg(
            F.substring(F.min(packed), 34, 64).alias("first_touch"),
            F.substring(
                F.max(
                    F.when(
                        (F.col("sk") < F.col("fp_sk"))
                        & (F.col("event_type") != "purchase"),
                        packed,
                    )
                ),
                34,
                64,
            ).alias("last_pre"),
            F.sum(
                F.when(F.col("event_type") == "purchase", F.col("v"))
            ).alias("rev"),
        )
    )
    both = agg.select(
        F.lit("first_touch").alias("model"),
        F.col("first_touch").alias("channel"),
        "rev",
    ).unionByName(
        agg.select(
            F.lit("last_touch").alias("model"),
            F.coalesce("last_pre", F.lit("direct")).alias("channel"),
            "rev",
        )
    )
    return (
        both.groupBy("model", "channel")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_sessions"),
            F.sum("rev").cast("double").alias("revenue"),
        )
        .orderBy("model", "channel")
    )
