"""Text-analysis operators for training-data pipelines: quality
scoring, language-ID heuristic, token counting, document
fingerprinting. All pure DataFrame expressions (JVM-side, oracle-
reproducible); no Python in the row path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: Tiny per-language marker lexicons for the n-gram/stopword heuristic.
#: Deterministic and engine-portable (plain IN-list membership).
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "to"],
    "es": ["el", "la", "de", "que", "los"],
    "fr": ["le", "la", "les", "des", "une"],
    "de": ["der", "die", "das", "und", "ein"],
    "zh": ["de5", "shi4", "le5", "zai4", "he2"],  # pinyin-ish placeholders
}

STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "it"]

TOKEN_REGEX = "[a-z0-9]+"


def words(col) -> F.Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(c, " "), lambda w: F.length(w) > 0)


def token_bucket(col, buckets: int = 4096) -> F.Column:
    """md5-based feature-hash bucket for a token — the
    oracle-reproducible vocabulary hash shared by the classifier and
    unigram-LM surfaces (batch + streaming + scale probe). DuckDB
    twin: ``(('0x' || substr(md5(x), 1, 4))::INT) % buckets``."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 4), 16, 10).cast("int") % buckets


def bucket_weight(col) -> F.Column:
    """Multiplicative-hash pseudo-weight in [-1000, 1000] for a bucket
    id — the stand-in for trained classifier parameters, shared by
    every classifier call site so the batch twin, the streaming twin
    and the scale probe can never drift apart. DuckDB twin:
    ``(b * 2654435761) % 2001 - 1000``."""
    b = F.col(col) if isinstance(col, str) else col
    return (b.cast("long") * F.lit(2654435761)) % 2001 - 1000


def max_word_run_frequency(ws) -> F.Column:
    """Max occurrence count of any single word in a word-array column,
    as the LONGEST EQUAL RUN of the sorted array — one fold whose
    lambda touches only (acc, x), O(W log W) in-row. The obvious
    array_distinct × filter scan is O(W·D) per row AND re-inlines the
    outer array per distinct word (the HOF re-inlining trap,
    ARCHITECTURE.md). Shared by curation_funnel_report,
    pipeline_crawl_to_shards, and their property test — the fold and
    the DuckDB oracles' list_max formulation must agree, so it lives
    in exactly one place."""
    c = F.col(ws) if isinstance(ws, str) else ws

    def _run_step(acc, x):
        cur = F.when(x.eqNullSafe(acc.prev), acc.cur + 1).otherwise(F.lit(1))
        return F.struct(
            cur.alias("cur"),
            F.greatest(acc.best, cur).alias("best"),
            x.alias("prev"),
        )

    return F.aggregate(
        F.array_sort(c),
        F.struct(
            F.lit(0).alias("cur"),
            F.lit(0).alias("best"),
            F.lit(None).cast("string").alias("prev"),
        ),
        _run_step,
        lambda acc: acc.best,
    )


def quality_stats(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Per-document quality features: lengths, word stats, character-
    class ratios, stopword ratio. The classic cheap quality filters
    (C4/Gopher-style) as one projection. Ratios are NULL for empty
    documents (nullif'd denominators — ANSI mode would otherwise raise
    DIVIDE_BY_ZERO; SQL twins divide by NULLIF the same way)."""
    w = words(text_col)
    n_words = F.size(w)
    n_chars = F.length(text_col)
    alpha_chars = F.length(F.regexp_replace(F.col(text_col), "[^a-z]", ""))
    stop_hits = F.size(F.filter(w, lambda x: x.isin(STOPWORDS)))
    nz_words = F.nullif(n_words.cast("double"), F.lit(0.0))
    nz_chars = F.nullif(n_chars.cast("double"), F.lit(0.0))
    return df.select(
        F.col(id_col),
        n_chars.cast("long").alias("n_chars_calc"),
        n_words.cast("long").alias("n_words"),
        (n_chars.cast("double") / nz_words).alias("chars_per_word"),
        (alpha_chars.cast("double") / nz_chars).alias("alpha_ratio"),
        (stop_hits.cast("double") / nz_words).alias("stopword_ratio"),
        (n_words >= 20).alias("passes_min_len"),
    )


def lang_id(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Marker-lexicon language ID: score = #marker-word hits per
    language; argmax with lexicographic tie-break; 'und' when all 0."""
    def member_of(markers):
        # NOTE: F.filter treats a 2-arg lambda as (element, index) —
        # capture the marker list via closure, keep the lambda unary.
        def pred(x):
            cond = F.lit(False)
            for m in markers:
                cond = cond | (x == F.lit(m))
            return cond

        return pred

    w = words(text_col)
    scores = {
        lang: F.size(F.filter(w, member_of(markers))).cast("long")
        for lang, markers in LANG_MARKERS.items()
    }
    # argmax with deterministic tie-break: iterate langs sorted, keep
    # strictly-greater winner
    langs = sorted(scores)
    best_lang = F.lit("und")
    best_score = F.lit(0).cast("long")
    for lang in langs:
        is_better = scores[lang] > best_score
        best_lang = F.when(is_better, F.lit(lang)).otherwise(best_lang)
        best_score = F.when(is_better, scores[lang]).otherwise(best_score)
    out = df.select(
        F.col(id_col),
        *[scores[lang].alias(f"score_{lang}") for lang in langs],
    )
    return out.withColumn(
        "lang_pred",
        _argmax_expr([f"score_{lang}" for lang in langs], langs),
    )


def _argmax_expr(score_cols: list[str], labels: list[str]) -> F.Column:
    best_lang = F.lit("und")
    best_score = F.lit(0).cast("long")
    for col, label in zip(score_cols, labels):
        is_better = F.col(col) > best_score
        best_lang = F.when(is_better, F.lit(label)).otherwise(best_lang)
        best_score = F.when(is_better, F.col(col)).otherwise(best_score)
    return best_lang


def token_counts(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Token counting two ways: whitespace tokens and regex tokens
    (a BPE-ish lower bound: alnum runs)."""
    return df.select(
        F.col(id_col),
        F.size(words(text_col)).cast("long").alias("ws_tokens"),
        F.size(F.regexp_extract_all(F.col(text_col), F.lit(TOKEN_REGEX), 0))
        .cast("long")
        .alias("re_tokens"),
    )


#: PII patterns — kept to syntax valid in BOTH Java regex (Spark) and
#: RE2 (DuckDB oracle) so the redaction is engine-portable.
PII_PATTERNS: dict[str, tuple[str, str]] = {
    "email": (r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}", "[EMAIL]"),
    "phone": (r"\d{3}-\d{3}-\d{4}", "[PHONE]"),
    "ssn": (r"\d{3}-\d{2}-\d{4}", "[SSN]"),
}


def pii_redact(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """PII scrubbing for training corpora: count and redact emails,
    phone numbers, and SSN-shaped tokens in one projection. Counts are
    taken BEFORE replacement (each pattern against the original text);
    replacements apply in the fixed PII_PATTERNS order so overlapping
    shapes (phone 3-3-4 vs SSN 3-2-4) resolve deterministically. Pure
    JVM regex — no Python in the row path, scan-parallel at any scale.
    """
    c = F.col(text_col)
    counts = [
        F.size(F.regexp_extract_all(c, F.lit(pat), 0)).cast("long").alias(f"n_{name}")
        for name, (pat, _) in PII_PATTERNS.items()
    ]
    redacted = c
    for name, (pat, repl) in PII_PATTERNS.items():
        redacted = F.regexp_replace(redacted, pat, repl)
    return df.select(
        F.col(id_col), *counts, F.md5(redacted).alias("redacted_md5")
    )


def gopher_rules(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Gopher-style document quality rules as one projection: word
    count bounds, mean word length bounds, alphabetic-character ratio
    floor — and the conjunction as the keep flag. The cheap rule
    bundle that gates a pretraining corpus before any model-based
    scoring; all flags are plain column expressions (oracle-portable,
    whole-stage codegen)."""
    w = words(text_col)
    n_words = F.size(w).cast("long")
    # total in-word chars = non-space chars (words() drops empties)
    n_word_chars = F.length(F.regexp_replace(F.col(text_col), r"\s", ""))
    # nullif'd denominators: empty documents yield NULL ratios (and a
    # false keep flag via ok_words) instead of ANSI DIVIDE_BY_ZERO
    mean_word_len = n_word_chars.cast("double") / F.nullif(
        n_words.cast("double"), F.lit(0.0)
    )
    alpha_ratio = (
        F.length(F.regexp_replace(F.col(text_col), "[^a-z]", "")).cast("double")
        / F.nullif(F.length(text_col).cast("double"), F.lit(0.0))
    )
    ok_words = (n_words >= 20) & (n_words <= 100000)
    ok_mwl = (mean_word_len >= 3.0) & (mean_word_len <= 12.0)
    ok_alpha = alpha_ratio > 0.5
    return df.select(
        F.col(id_col),
        n_words.alias("n_words"),
        mean_word_len.alias("mean_word_len"),
        alpha_ratio.alias("alpha_ratio"),
        ok_words.alias("ok_words"),
        ok_mwl.alias("ok_mwl"),
        ok_alpha.alias("ok_alpha"),
        (ok_words & ok_mwl & ok_alpha).alias("keep"),
    )


def chunk_text(
    df: DataFrame, text_col: str, id_col: str, size: int = 512, overlap: int = 64
) -> DataFrame:
    """Split documents into fixed-size overlapping character chunks —
    the retrieval/embedding prep step of an LLM pipeline. Chunk starts
    are generated IN-ROW (sequence + posexplode), so the plan is a
    single Generate over the scan with no shuffle; chunk_idx is the
    0-based position. Empty docs emit one empty chunk (stable row
    count per doc >= 1)."""
    if overlap >= size:
        raise ValueError("overlap must be < size")
    stride = size - overlap
    c = F.col(text_col)
    starts = F.sequence(F.lit(1), F.greatest(F.length(c), F.lit(1)), F.lit(stride))
    return df.select(
        F.col(id_col),
        c.alias("_t"),
        F.posexplode(starts).alias("chunk_idx", "_start"),
    ).select(
        F.col(id_col),
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        F.col("_t").substr(F.col("_start"), F.lit(size)).alias("chunk"),
    )


def pack_sequences(
    df: DataFrame, token_col: str, order_col: str, part_col: str, target: int = 2048
) -> DataFrame:
    """GPT-style sequence packing: documents are concatenated in a
    deterministic order and cut into fixed token budgets; each doc is
    assigned the sequence its FIRST token lands in (concatenate-then-
    chunk semantics — boundary docs span into the next sequence, as in
    standard pretraining packing). seq_id = floor(start_offset /
    target) from a running-sum window. Packing is PER part_col
    partition (source shard), so the window never needs a global
    single-partition sort — the 100 TB shape is one shuffle by shard."""
    w = Window.partitionBy(part_col).orderBy(order_col)
    start_offset = F.sum(token_col).over(w) - F.col(token_col)
    return df.withColumn(
        "seq_id", F.floor(start_offset / target).cast("long")
    )


def fingerprints(
    df: DataFrame, text_col: str, id_col: str, n: int = 8, k: int = 5
) -> DataFrame:
    """Winnowing-style fingerprint: md5 each char n-gram, keep the k
    smallest hashes, fingerprint = md5 of their concatenation.

    Robust to local edits (only grams near the edit change, rarely
    all k minima). Explode + ranking window + ordered re-concat; all
    engine-portable."""
    from .dedup import char_ngrams

    grams = char_ngrams(df, text_col, id_col, n=n)
    hashed = grams.select(F.col(id_col), F.md5("g").alias("h"))
    w = Window.partitionBy(id_col).orderBy("h")
    topk = hashed.withColumn("rnk", F.row_number().over(w)).where(F.col("rnk") <= k)
    return (
        topk.groupBy(id_col)
        .agg(F.md5(F.concat_ws("", F.sort_array(F.collect_list("h")))).alias("fingerprint"))
    )


def word_ngrams(text_col, n: int = 5) -> F.Column:
    """Distinct word n-grams of a text column as an in-row array:
    tokenize, slide an n-window via sequence+transform, array_distinct.
    Everything happens inside one projection (a single Generate when
    exploded downstream) — no per-gram shuffle ever exists. Docs with
    fewer than n words yield an empty array (guarded: Spark's
    sequence(1, k) would count DOWN for k < 1)."""
    t = words(F.lower(F.col(text_col) if isinstance(text_col, str) else text_col))
    grams = F.transform(
        F.sequence(F.lit(1), F.size(t) - (n - 1)),
        lambda i: F.array_join(F.slice(t, i, n), " "),
    )
    return F.array_distinct(F.when(F.size(t) >= n, grams).otherwise(F.array()))


def decontaminate(
    train: DataFrame,
    bench: DataFrame,
    text_col: str,
    id_col: str,
    extra: list[str] | None = None,
    n: int = 5,
) -> DataFrame:
    """Benchmark decontamination (GPT-3 appendix-C style): flag every
    training document sharing at least one word n-gram with a held-out
    benchmark set; emit (id, *extra, overlap_grams) for contaminated
    docs.

    100 TB shape: the benchmark side is small by definition — its
    distinct gram set BROADCASTS, so the training corpus never
    shuffles at gram granularity. Train-side grams are generated and
    deduplicated in-row (word_ngrams), exploded once, joined against
    the broadcast, and the only Exchange in the plan is the final
    per-document count. At production scale, xxhash64 the grams to 8
    bytes before the join to shrink the broadcast; raw gram strings
    are kept here so the DuckDB oracle reproduces the join exactly.
    """
    extra = extra or []
    bench_grams = (
        bench.select(F.explode(word_ngrams(text_col, n)).alias("g")).distinct()
    )
    train_grams = train.select(
        F.col(id_col), *[F.col(c) for c in extra],
        F.explode(word_ngrams(text_col, n)).alias("g"),
    )
    return (
        train_grams.join(F.broadcast(bench_grams), "g")
        .groupBy(id_col, *extra)
        .agg(F.count(F.lit(1)).alias("overlap_grams"))
        .orderBy(id_col)
    )


def _dup_gram_char_fraction(t: F.Column, n: int) -> F.Column:
    """Fraction of n-gram characters belonging to grams occurring
    more than once in the document (Gopher's duplicate-n-gram
    repetition signal). Denominator = total chars over ALL gram
    instances; numerator = chars over instances of duplicated grams.

    Computed fully IN-ROW in O(G log G): sort the gram multiset, then
    an instance is duplicated iff it equals a sorted neighbor — no
    explode, no gram-level shuffle, scales with document count not
    gram count. NULL when the doc has fewer than n words.

    Neighbor comparison is done by zipping the sorted array against
    its slice-shifted self — NEVER by per-index ``element_at`` inside
    an ``aggregate`` lambda: a lambda body's reference to an outer
    array expression is re-INLINED (and so re-evaluated, array_sort
    and all) for every element, which turns the intended O(G log G)
    into O(G² log G) per row — measured 290 s for 500 sf0.01 docs
    before this formulation, 0.5 s after."""
    grams = F.transform(
        F.sequence(F.lit(1), F.size(t) - (n - 1)),
        lambda i: F.array_join(F.slice(t, i, n), " "),
    )
    s = F.array_sort(grams)
    sz = F.size(s)
    null1 = F.array(F.lit(None).cast("string"))
    prev = F.concat(null1, F.slice(s, 1, sz - 1))  # s[i-1] (null at i=0)
    nxt = F.slice(s, 2, sz - 1)  # s[i+1] (absent → null pad)
    eq_prev = F.zip_with(s, prev, lambda a, b: a.eqNullSafe(b))
    eq_next = F.zip_with(s, nxt, lambda a, b: a.eqNullSafe(b))
    dup_flags = F.zip_with(eq_prev, eq_next, lambda x, y: x | y)
    lens = F.zip_with(
        s,
        dup_flags,
        lambda x, f: F.when(f, F.length(x).cast("long")).otherwise(
            F.lit(0).cast("long")
        ),
    )
    dup_len = F.aggregate(
        lens, F.lit(0).cast("long"), lambda acc, v: acc + v
    )
    tot_len = F.aggregate(
        s, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x).cast("long")
    )
    return F.when(
        F.size(t) >= n, dup_len.cast("double") / tot_len.cast("double")
    )


def repetition_stats(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Gopher-style repetition filters: per-document duplicate-2-gram
    and duplicate-3-gram character fractions plus the keep flag
    (both < 0.75 — synthetic corpus vocabulary is tiny, so the
    published 0.2 threshold would reject everything). One projection,
    no shuffle; the fractions are exact integer-ratio doubles, so the
    oracle reproduces them bit-for-bit."""
    t = words(F.lower(F.col(text_col)))
    d2 = _dup_gram_char_fraction(t, 2)
    d3 = _dup_gram_char_fraction(t, 3)
    return df.select(
        F.col(id_col),
        F.size(t).cast("long").alias("n_words"),
        d2.alias("dup_2gram_char_frac"),
        d3.alias("dup_3gram_char_frac"),
        (
            (F.coalesce(d2, F.lit(0.0)) < 0.75)
            & (F.coalesce(d3, F.lit(0.0)) < 0.75)
        ).alias("keep"),
    )


def bpe_merge_rounds(
    vocab: DataFrame, rounds: int = 3
) -> tuple[DataFrame, DataFrame]:
    """Distributed BPE merge training over a (word, n) frequency table:
    per round, score every adjacent symbol pair (frequency-weighted,
    overlaps counted — classic get_stats), pick the max with a
    (count DESC, pair) tie-break, and apply the greedy leftmost
    non-overlapping merge. Greedy-leftmost over a run of identical
    pairs ('aaaa' + pair a,a) needs no sequential state: candidate
    positions form gaps-and-islands (pos - row_number) and within each
    island exactly the odd ranks merge.

    Returns (merges, symbols): the (step, left_sym, right_sym, total)
    merge table a tokenizer persists, and the final per-word symbol
    rows (word, n, pos, sym). Rounds iterate on the vocabulary only;
    the best pair is a 1-row broadcast (never collected).

    Each round's frames are localCheckpoint'ed EAGERLY (the same
    lineage discipline as operators/graph.py): without truncation the
    final plan re-evaluates the whole per-round lineage once per
    consumer — measured 31 corpus scans for 3 rounds at test scale —
    and because every round references the previous round's frame
    several times, even plan STRINGIFICATION grows exponentially with
    rounds (a 4-round toy OOM'd the driver on generateTreeString with
    persist alone, which caches data but keeps the logical tree). The
    checkpointed relations are vocabulary-sized, not corpus-sized."""
    syms = vocab.select(
        "word",
        "n",
        F.posexplode(
            F.expr("transform(sequence(1, length(word)), i -> substring(word, i, 1))")
        ).alias("_p", "sym"),
    ).select("word", "n", (F.col("_p") + 1).alias("pos"), "sym")

    merges = []
    for r in range(rounds):
        w = Window.partitionBy("word").orderBy("pos")
        x = syms.withColumn("next", F.lead("sym").over(w)).localCheckpoint(
            eager=True
        )
        best = (
            x.where(F.col("next").isNotNull())
            .groupBy(F.col("sym").alias("a"), F.col("next").alias("b"))
            .agg(F.sum("n").alias("total"))
            .orderBy(F.col("total").desc(), "a", "b")
            .limit(1)
        )
        best = best.localCheckpoint(eager=True)
        merges.append(
            best.select(
                F.lit(r + 1).alias("step"),
                F.col("a").alias("left_sym"),
                F.col("b").alias("right_sym"),
                "total",
            )
        )
        cand = (
            x.crossJoin(F.broadcast(best))
            .where((F.col("sym") == F.col("a")) & (F.col("next") == F.col("b")))
            .select(
                "word",
                "pos",
                (F.col("pos") - F.row_number().over(w)).alias("island"),
            )
        )
        sel = cand.select(
            "word",
            "pos",
            (
                F.row_number().over(
                    Window.partitionBy("word", "island").orderBy("pos")
                )
                % 2
                == 1
            ).alias("sel"),
        ).where("sel")
        here = sel.select("word", F.col("pos").alias("pos"))
        prev = sel.select("word", (F.col("pos") + 1).alias("pos"))
        syms = (
            x.join(here.withColumn("_m", F.lit(True)), ["word", "pos"], "left")
            .join(prev.withColumn("_d", F.lit(True)), ["word", "pos"], "left")
            .where(F.col("_d").isNull())
            .select(
                "word",
                "n",
                # renumber: merges leave position gaps, and the next
                # round's adjacency (lead, islands, pos+1 drop) requires
                # consecutive positions — without this, a pair whose
                # halves came from earlier merges never coalesces
                F.row_number().over(w).alias("pos"),
                F.when(F.col("_m"), F.concat("sym", "next"))
                .otherwise(F.col("sym"))
                .alias("sym"),
            )
        )
    out = merges[0]
    for m in merges[1:]:
        out = out.union(m)
    return out, syms


def token_budget(
    df: DataFrame,
    text_col: str,
    id_col: str,
    group_col: str,
    budget: int,
) -> DataFrame:
    """Per-group token-budget capping: greedily keep documents in
    ``id_col`` order (ingestion order) until the group's cumulative
    whitespace-token count exceeds ``budget``; report per-group
    kept/total doc and token accounting.

    This is the "cap each domain/source at N tokens" step a training-
    data mixture pipeline runs before sampling (over-represented
    domains would otherwise dominate the mixture; the reference's
    relational layer — the DataFusion crate its README.md:13-16 marks
    TODO — has no counterpart, so the shape is defined here).

    Scale notes: ONE shuffle on ``group_col`` for the running-sum
    window; the follow-up groupBy reuses the same hash partitioning,
    so Catalyst plans zero additional Exchanges (plan-pinned). Domains
    are numerous and the per-domain state is a single running counter,
    so the window never concentrates a 100 TB corpus on few tasks
    unless one domain IS the corpus — in which case the same skew
    salting used by ``skew_salted_agg`` applies upstream.
    """
    w = (
        Window.partitionBy(group_col)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    toks = df.select(
        F.col(group_col),
        F.col(id_col),
        F.size(words(text_col)).cast("long").alias("toks"),
    )
    cum = toks.withColumn("cum_toks", F.sum("toks").over(w))
    kept = F.col("cum_toks") <= budget
    return cum.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("total_docs"),
        F.sum(F.when(kept, 1).otherwise(0)).cast("long").alias("kept_docs"),
        F.sum(F.when(kept, F.col("toks")).otherwise(0))
        .cast("long")
        .alias("kept_tokens"),
        F.sum("toks").cast("long").alias("total_tokens"),
    )
