"""Similarity search over embedding columns (array<float>).

Two paths, as the task demands:

* **Brute-force top-k** — exact; query set broadcast against the full
  corpus. The inner product runs JVM-side via zip_with/aggregate (no
  Python in the loop). The oracle-checkable variant accumulates in
  DECIMAL so Spark and DuckDB agree bit-for-bit; the fast variant
  accumulates in double (same plan, cheaper arithmetic).
* **LSH-bucketed top-k** — the scale path: random-hyperplane signs
  (SimHash for cosine) computed from deterministic md5-derived
  projections bucket the corpus; candidates only join within a
  bucket. Recall is tunable by number of planes/tables.

At 100 TB: corpus stays partitioned, queries broadcast; the top-k per
query uses a ranking window over (query, candidates-in-bucket), never
a global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..plans.session import stage_boundary


def _dot_decimal(qcol: str, ecol: str) -> F.Column:
    """Exact inner product: per-element double product (IEEE —
    identical on any engine) rounded into DECIMAL(30,15), then exact
    decimal summation. Engine-order-independent."""
    prods = F.zip_with(
        qcol,
        ecol,
        lambda x, y: (x.cast("double") * y.cast("double")).cast("decimal(30,15)"),
    )
    return F.aggregate(
        prods,
        F.lit(0).cast("decimal(30,15)"),
        lambda acc, v: (acc + v).cast("decimal(30,15)"),
    ).cast("double")


def _dot_double(qcol: str, ecol: str) -> F.Column:
    """Fast inner product in double (left-to-right fold)."""
    prods = F.zip_with(qcol, ecol, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, v: acc + v)


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exact: bool = True,
) -> DataFrame:
    """Exact top-k by inner product: (query_id, vec_id, dot, rank).

    queries is broadcast (it's the small side by construction); the
    cross join then never shuffles the corpus. Rank ties break by
    vec_id so results are total-ordered.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qvec")
    )
    c = corpus.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("_cvec"))
    if not exact:
        scored = c.crossJoin(F.broadcast(q)).select(
            "query_id", "vec_id", _dot_double("_qvec", "_cvec").alias("dot")
        )
        w = Window.partitionBy("query_id").orderBy(F.desc("dot"), "vec_id")
        return (
            scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("query_id", "vec_id", "dot", "rank")
        )
    # exact path: cheap double prefilter keeps a wide candidate margin,
    # the (BigDecimal-heavy) exact dot re-scores only those. The margin
    # is RANK-based (top max(16k, 64) per query), so it scales with the
    # values themselves: double fp error (~1e-12 RELATIVE to the dot
    # magnitude) would have to reorder a true top-k member past ≥61
    # closer candidates to escape the margin — impossible unless ≥61
    # distinct dots sit within ~1e-12 relative of each other, in which
    # case the decimal-exact rescore of the shared margin still breaks
    # the tie deterministically.
    margin = max(k * 16, 64)
    fast = c.crossJoin(F.broadcast(q)).select(
        "query_id", "vec_id", "_qvec", "_cvec",
        _dot_double("_qvec", "_cvec").alias("_fast"),
    )
    wf = Window.partitionBy("query_id").orderBy(F.desc("_fast"), "vec_id")
    cand = fast.withColumn("_frank", F.row_number().over(wf)).where(
        F.col("_frank") <= margin
    )
    rescored = cand.select(
        "query_id", "vec_id", _dot_decimal("_qvec", "_cvec").alias("dot")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("dot"), "vec_id")
    return (
        rescored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "vec_id", "dot", "rank")
    )


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine similarity (double math, fast path)."""
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qvec"))
    c = corpus.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("_cvec"))
    norm = lambda col: F.sqrt(_dot_double(col, col))  # noqa: E731
    scored = c.crossJoin(F.broadcast(q)).select(
        "query_id",
        "vec_id",
        (_dot_double("_qvec", "_cvec") / (norm("_qvec") * norm("_cvec"))).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), "vec_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "vec_id", "cosine", "rank")
    )


def quantize_int8(
    df: DataFrame, vec_col: str, id_col: str
) -> DataFrame:
    """Per-vector symmetric int8 quantization: scale = max|x|/127,
    q_i = round(x_i/scale) ∈ [-127, 127]. At 100 TB this is the
    difference between shipping 4 bytes and 1 byte per dimension
    through every shuffle and cache tier — the standard first
    compression step for embedding search. Zero-vector rows keep
    scale 1 (all-zero codes). Pure codegen expressions."""
    c = F.col(vec_col)
    amax = F.array_max(F.transform(c, lambda x: F.abs(x.cast("double"))))
    scale = F.when(amax > 0, amax / F.lit(127.0)).otherwise(F.lit(1.0))
    q = F.transform(c, lambda x: F.round(x.cast("double") / scale).cast("int"))
    return df.select(
        F.col(id_col), q.alias("qvec"), scale.cast("double").alias("qscale")
    )


def quantized_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k over int8-quantized vectors: the inner
    product runs in EXACT integer arithmetic (sum of int products into
    a long — engine- and order-independent), then de-quantizes by the
    two per-vector scales for ranking. Same broadcast-queries /
    corpus-never-shuffles shape as brute_force_topk, at a quarter of
    the bytes per vector."""
    qz = quantize_int8(queries, vec_col, id_col).select(
        F.col(id_col).alias("query_id"),
        F.col("qvec").alias("_qq"),
        F.col("qscale").alias("_qs"),
    )
    cz = quantize_int8(corpus, vec_col, id_col).select(
        F.col(id_col).alias("vec_id"),
        F.col("qvec").alias("_cq"),
        F.col("qscale").alias("_cs"),
    )
    prods = F.zip_with("_qq", "_cq", lambda x, y: (x * y).cast("long"))
    idot = F.aggregate(prods, F.lit(0).cast("long"), lambda a, v: a + v)
    scored = cz.crossJoin(F.broadcast(qz)).select(
        "query_id",
        "vec_id",
        (idot.cast("double") * F.col("_qs") * F.col("_cs")).alias("score"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), "vec_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "vec_id", "score", "rank")
    )


def _hyperplane(dim: int, plane: int) -> list[float]:
    """Deterministic pseudo-random unit-ish hyperplane from md5 bytes
    (no RNG: reproducible across runs and engines)."""
    import hashlib

    vals: list[float] = []
    i = 0
    while len(vals) < dim:
        h = hashlib.md5(f"plane:{plane}:{i}".encode()).digest()
        for b in h:
            vals.append((b - 127.5) / 127.5)
            if len(vals) == dim:
                break
        i += 1
    return vals


def lsh_bucket_signatures(
    df: DataFrame, vec_col: str = "embedding", num_planes: int = 8, dim: int = 64
) -> DataFrame:
    """Random-hyperplane LSH: sign bits of <v, plane_p> → bucket id.

    Adds a ``bucket`` column (0..2^planes-1). Vectors with high cosine
    land in the same bucket with probability (1 - theta/pi)^planes.
    """
    planes = [_hyperplane(dim, p) for p in range(num_planes)]
    sig = F.lit(0).cast("long")
    for p, plane in enumerate(planes):
        arr = F.array(*[F.lit(x) for x in plane])
        dot = F.aggregate(
            F.zip_with(vec_col, arr, lambda x, y: x.cast("double") * y),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        sig = sig + F.when(dot > 0, F.lit(1 << p).cast("long")).otherwise(F.lit(0))
    return df.withColumn("bucket", sig)


def _dot_lit(vec_col: str, vals: list[float]) -> F.Column:
    """Inner product of an array column with a driver-side literal
    vector (the centroid): zip_with against an array-of-literals, all
    JVM-side codegen, no shuffle and no Python."""
    lit_vec = F.array(*[F.lit(float(v)) for v in vals])
    prods = F.zip_with(vec_col, lit_vec, lambda x, y: x.cast("double") * y)
    return F.aggregate(prods, F.lit(0.0), lambda acc, v: acc + v)


def assign_nearest_centroid(
    df: DataFrame, cents: list[tuple[int, list[float]]], vec_col: str, out_col: str
) -> DataFrame:
    """Map-side nearest-centroid assignment (L2): for each centroid c
    the score dot(v, c) - |c|^2/2 orders identically to -|v - c|^2, so
    argmax over a greatest() of (score, cent_id) structs picks the
    nearest cluster with ZERO shuffle — the centroids are literals in
    the expression tree, not a join side. This is the 100 TB index
    build: one codegen'd pass over the corpus."""
    scored = [
        F.struct(
            (_dot_lit(vec_col, v) - sum(x * x for x in v) / 2.0).alias("s"),
            F.lit(cid).alias("cid"),
        )
        for cid, v in cents
    ]
    return df.withColumn(out_col, F.greatest(*scored)["cid"])


def kmeans_centroids(
    corpus: DataFrame,
    n_centroids: int = 16,
    n_iter: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[tuple[int, list[float]]]:
    """Distributed Lloyd refinement of deterministically-seeded
    centroids (first ``n_centroids`` corpus vectors — no RNG, so runs
    are reproducible). Per iteration: (1) map-side assignment via
    ``assign_nearest_centroid`` (no shuffle), (2) element-wise mean via
    posexplode + groupBy(cluster, pos) — partial aggregation combines
    map-side, so the exchange carries only
    partitions x n_centroids x dim rows, not the corpus. The centroid
    matrix (n_centroids x dim doubles) is the only driver-side state:
    that's the index, not the data."""
    cents = sorted(
        (int(r[0]), [float(x) for x in r[1]])
        for r in corpus.where(F.col(id_col) < n_centroids)
        .select(id_col, vec_col)
        .collect()
    )  # sort by id: collect order depends on partition layout
    cents = [(i, v) for i, (_, v) in enumerate(cents)]
    for _ in range(n_iter):
        assigned = assign_nearest_centroid(
            corpus.select(vec_col), cents, vec_col, "_cluster"
        )
        means = (
            assigned.select("_cluster", F.posexplode(vec_col).alias("_pos", "_val"))
            .groupBy("_cluster", "_pos")
            .agg(F.avg("_val").alias("_mean"))
            .groupBy("_cluster")
            .agg(F.array_sort(F.collect_list(F.struct("_pos", "_mean"))).alias("_m"))
            .select("_cluster", F.col("_m._mean").alias("_vec"))
            .collect()
        )
        refreshed = {int(r[0]): [float(x) for x in r[1]] for r in means}
        # empty clusters keep their previous centroid
        cents = [(cid, refreshed.get(cid, v)) for cid, v in cents]
    return cents


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 16,
    n_probe: int = 2,
    refine_iters: int = 0,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k: the corpus is clustered
    by nearest centroid once (the "index build"), queries probe only
    their ``n_probe`` closest centroid lists.

    Centroids are the first ``n_centroids`` corpus vectors
    (deterministic seeding), optionally k-means-refined for
    ``refine_iters`` Lloyd iterations (better-balanced lists -> better
    recall at the same probe budget). At 100 TB: centroid literals ride
    the expression tree (map-side assignment, zero shuffle), the probe
    join shuffles only on cluster id — candidate volume drops
    ~n_centroids/n_probe-fold vs brute force.
    """
    cent_list = kmeans_centroids(
        corpus, n_centroids, refine_iters, id_col, vec_col
    )
    cents = queries.sparkSession.createDataFrame(cent_list, ["cent_id", "cent_vec"])

    def nearest(df: DataFrame, side_id: str, keep: int) -> DataFrame:
        # same L2 score as assign_nearest_centroid, so probe lists
        # agree with the index's cluster assignment
        l2_score = _dot_double(vec_col, "cent_vec") - _dot_double(
            "cent_vec", "cent_vec"
        ) / 2.0
        scored = df.crossJoin(F.broadcast(cents)).select(
            "*", l2_score.alias("_cdot")
        )
        w = Window.partitionBy(side_id).orderBy(F.desc("_cdot"), "cent_id")
        return (
            scored.withColumn("_crank", F.row_number().over(w))
            .where(F.col("_crank") <= keep)
            .drop("_cdot", "_crank", "cent_vec")
        )

    assigned = assign_nearest_centroid(
        corpus.select(F.col(id_col).alias("vec_id"), F.col(vec_col)),
        cent_list,
        vec_col,
        "cluster",
    )
    probes = nearest(
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col)),
        "query_id",
        n_probe,
    ).withColumnRenamed("cent_id", "cluster")
    qv = probes.select(
        "query_id", "cluster", F.col(vec_col).alias("_qvec")
    )
    cv = assigned.select("vec_id", "cluster", F.col(vec_col).alias("_cvec"))
    norm = lambda col: F.sqrt(_dot_double(col, col))  # noqa: E731
    scored = cv.join(qv, "cluster").select(
        "query_id",
        "vec_id",
        (_dot_double("_qvec", "_cvec") / (norm("_qvec") * norm("_cvec"))).alias(
            "cosine"
        ),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), "vec_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "vec_id", "cosine", "rank")
    )


def lsh_bucketed_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_planes: int = 6,
    dim: int = 64,
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's bucket.

    The equi-join on bucket replaces the cross join — at N corpus
    vectors and B buckets the candidate set shrinks ~B-fold. Returns
    (query_id, vec_id, cosine, rank); recall < 1 by design.
    """
    cb = lsh_bucket_signatures(corpus, vec_col, num_planes, dim).select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("_cvec"), "bucket"
    )
    qb = lsh_bucket_signatures(queries, vec_col, num_planes, dim).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qvec"), "bucket"
    )
    norm = lambda col: F.sqrt(_dot_double(col, col))  # noqa: E731
    scored = cb.join(F.broadcast(qb), "bucket").select(
        "query_id",
        "vec_id",
        (_dot_double("_qvec", "_cvec") / (norm("_qvec") * norm("_cvec"))).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), "vec_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "vec_id", "cosine", "rank")
    )


def radius_search(
    corpus: DataFrame,
    queries: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All neighbors within a similarity radius: (query_id, vec_id,
    dot) for every corpus vector with inner product ≥ threshold.

    Same 100 TB shape as brute_force_topk: queries broadcast, corpus
    never shuffles, and a cheap double prefilter (threshold − a
    1e-6·‖q‖‖c‖ margin — the Cauchy-Schwarz bound on the double
    fold's accumulated error, so neither large magnitudes nor large
    cancelling terms can outgrow it) gates the DECIMAL-exact rescore
    so the heavy arithmetic touches only near-threshold candidates.
    The emitted dot and the membership test both use the exact
    decimal rounded to 9 places, so any engine reproduces the same
    set.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("_qvec"),
        F.sqrt(_dot_double(vec_col, vec_col)).alias("_qn"),
    )
    c = corpus.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("_cvec"),
        F.sqrt(_dot_double(vec_col, vec_col)).alias("_cn"),
    )
    # prefilter margin: fp error of the double fold is bounded by
    # ~dim·eps·Σ|q_i·c_i| ≤ dim·eps·‖q‖‖c‖ (Cauchy-Schwarz) ≈
    # 1.4e-14·‖q‖‖c‖ at dim 64 — 1e-6·‖q‖‖c‖ is a 10⁸× cushion that
    # still scales with magnitude (a margin keyed to |dot| would miss
    # large cancelling terms; an absolute 1e-6 would miss large
    # magnitudes). Norms are computed once per side before the join.
    cand = (
        c.crossJoin(F.broadcast(q))
        .withColumn("_fast", _dot_double("_qvec", "_cvec"))
        .where(
            F.col("_fast")
            >= threshold
            - 1e-6 * F.greatest(F.lit(1.0), F.col("_qn") * F.col("_cn"))
        )
    )
    rescored = cand.select(
        "query_id", "vec_id", F.round(_dot_decimal("_qvec", "_cvec"), 9).alias("dot")
    )
    return rescored.where(F.col("dot") >= threshold)


def pq_codebooks(
    corpus: DataFrame,
    m: int = 4,
    ks: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[tuple[int, list[float]]]]:
    """Product-quantization codebooks: the vector space is split into
    ``m`` contiguous subspaces of dim/m dims; each subspace gets ``ks``
    codewords = the matching subvectors of the first ``ks`` corpus
    vectors (deterministic seeding, same convention as
    ``kmeans_centroids`` — no RNG, reproducible runs). Driver-side
    state is the m x ks x (dim/m) codeword tensor = exactly dim x ks
    floats — the PQ index parameters, not data; bounded like the
    k-means centroid matrix."""
    sub = dim // m
    rows = sorted(
        (
            (int(r[0]), [float(x) for x in r[1]])
            for r in corpus.where(F.col(id_col) < ks)
            .select(id_col, vec_col)
            .collect()
        ),
    )
    return [
        [
            (code, vec[mi * sub : (mi + 1) * sub])
            for code, (_, vec) in enumerate(rows)
        ]
        for mi in range(m)
    ]


def pq_encode(
    corpus: DataFrame,
    books: list[list[tuple[int, list[float]]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Encode every corpus vector as m single-byte codes (nearest
    codeword per subspace, L2 via the same dot - |c|^2/2 argmax trick
    as ``assign_nearest_centroid``): a 64-dim float vector compresses
    to m bytes through every downstream shuffle/cache. Codeword
    literals ride the expression tree — the encode is one codegen'd
    map pass, zero shuffle: the 100 TB index build."""
    m = len(books)
    sub = len(books[0][0][1])
    out = corpus.select(F.col(id_col).alias("vec_id"), F.col(vec_col))
    for mi, words in enumerate(books):
        sl = F.slice(F.col(vec_col), mi * sub + 1, sub)
        scored = [
            F.struct(
                (
                    F.aggregate(
                        F.zip_with(
                            sl,
                            F.array(*[F.lit(float(x)) for x in w]),
                            lambda x, y: x.cast("double") * y,
                        ),
                        F.lit(0.0),
                        lambda acc, v: acc + v,
                    )
                    - sum(x * x for x in w) / 2.0
                ).alias("s"),
                F.lit(code).alias("c"),
            )
            for code, w in words
        ]
        out = out.withColumn(f"code{mi}", F.greatest(*scored)["c"])
    return out.drop(vec_col)


def pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 3,
    m: int = 4,
    ks: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    shortlist: int = 0,
) -> DataFrame:
    """PQ asymmetric-distance top-k: corpus vectors live only as m
    codes; each query precomputes its m x ks table of partial dots
    against the codewords (the ADC lookup table), and the approximate
    inner product is m array lookups summed — no float vector math per
    (query, vector) pair. Queries (with their lookup tables) broadcast;
    the corpus never shuffles; ranking is a per-query window top-k.
    Complements IVF (list pruning) and int8 (uniform scalar
    quantization): PQ is the memory-bound regime's index — 16x fewer
    bytes per vector than float32 at m=4.

    ``shortlist > k`` enables the standard production two-stage shape:
    ADC ranks a per-query shortlist of that size from the codes alone,
    then ONLY the shortlisted vectors are fetched (semi-join against
    the float corpus — queries x shortlist rows, broadcastable) and
    exactly re-scored for the final top-k. Quantization distortion
    then costs recall only if a true neighbor falls outside the whole
    shortlist, not outside the top-k."""
    books = pq_codebooks(corpus, m, ks, dim, id_col, vec_col)
    sub = dim // m
    encoded = pq_encode(corpus, books, id_col, vec_col)
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col))
    for mi, words in enumerate(books):
        sl = F.slice(F.col(vec_col), mi * sub + 1, sub)
        dots = [
            F.aggregate(
                F.zip_with(
                    sl,
                    F.array(*[F.lit(float(x)) for x in w]),
                    lambda x, y: x.cast("double") * y,
                ),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
            for _, w in words
        ]
        q = q.withColumn(f"adp{mi}", F.array(*dots))
    q = q.drop(vec_col)
    score = sum(
        (
            F.element_at(F.col(f"adp{mi}"), F.col(f"code{mi}") + 1)
            for mi in range(m)
        ),
        F.lit(0.0),
    )
    scored = encoded.crossJoin(F.broadcast(q)).select(
        "query_id", "vec_id", score.alias("_adc")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("_adc"), "vec_id")
    ranked = scored.withColumn("rank", F.row_number().over(w))
    # both exits emit the SAME schema (query_id, vec_id, score, rank):
    # the score column's name must not depend on the shortlist tuning
    # parameter (callers select it by name).
    if shortlist <= k:
        return ranked.where(F.col("rank") <= k).select(
            "query_id", "vec_id", F.col("_adc").alias("score"), "rank"
        )
    # exact re-rank of the ADC shortlist: the candidate list is
    # queries x shortlist rows — broadcast it onto the corpus and
    # rescore only those pairs with the true float dot
    cand = ranked.where(F.col("rank") <= shortlist).select("query_id", "vec_id")
    qvec = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qvec")
    )
    cvec = corpus.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("_cvec")
    )
    rescored = (
        cvec.join(F.broadcast(cand), "vec_id")
        .join(F.broadcast(qvec), "query_id")
        .select("query_id", "vec_id", _dot_double("_qvec", "_cvec").alias("score"))
    )
    w2 = Window.partitionBy("query_id").orderBy(F.desc("score"), "vec_id")
    return (
        rescored.withColumn("rank", F.row_number().over(w2))
        .where(F.col("rank") <= k)
        .select("query_id", "vec_id", "score", "rank")
    )


def knn_graph(
    emb: DataFrame,
    id_col: str,
    vec_col: str,
    bits_per_band: int = 8,
    bands: int = 2,
    exact: bool = True,
    k: int = 1,
    dim: int | None = None,
) -> DataFrame:
    """Approximate 1-NN graph over the WHOLE table by multi-probe
    sign-bit blocking: each band b buckets on the sign bits of dims
    [b*bits+1 .. (b+1)*bits] (fixed axis-aligned hyperplanes — data-
    independent, nothing to train or version); a pair is a candidate
    iff it collides in ANY band; candidates are scored by cosine
    (decimal-exact when ``exact``, double fast-path otherwise) and the
    top ``k`` neighbors per vector win by (cosine DESC, id ASC) —
    k=1 (default) emits (id, neighbor_id, cosine); k>1 adds a
    ``rank`` column, turning the output into the k-NN graph
    semantic-dedup and curriculum mining consume.

    **The scale dial is ``bits_per_band``.** Expected bucket depth is
    n / 2^bits, and the blocked self-join does O(depth) work per row —
    so bits must GROW with the corpus (bits ≈ log2(n) - log2(target
    depth)) to keep per-row work constant; a fixed 8 bits that is
    right at 10^4 vectors is quadratic trouble at 10^9. Raising bits
    costs recall per band; adding ``bands`` (disjoint dim ranges) buys
    it back — the same rows-per-band vs bands trade as MinHash-LSH.
    Measured in SCALE.md (probe case ``knn_graph``): scaling bits with
    K holds wall-clock near-linear where fixed bits degrade toward
    K². Degenerate corner: EXACT duplicate vectors collide in every
    band at any bits — run exact dedup (a content-hash groupBy)
    before graph construction, as ``text_dedup_pipeline`` does.

    Requires vec dim >= bands * bits_per_band sign dims — pass
    ``dim`` to enforce it: an out-of-range ``element_at`` returns NULL
    and the bit silently reads 0, collapsing that band's bucket space
    (256× the intended depth at 8 missing bits) with no error."""
    if dim is not None and bands * bits_per_band > dim:
        raise ValueError(
            f"bands*bits_per_band = {bands * bits_per_band} sign dims "
            f"requested but vectors have only dim={dim}"
        )
    norm = (
        F.sqrt(_dot_decimal(vec_col, vec_col))
        if exact
        else F.sqrt(_dot_double(vec_col, vec_col))
    )

    def bucket(lo: int) -> F.Column:
        # seed with a literal so bits_per_band=0 (degenerate single
        # bucket = exact all-pairs, used by property tests) stays a
        # Column rather than a bare Python int
        return (
            sum(
                (
                    F.when(
                        F.element_at(vec_col, lo + i + 1) > 0, F.lit(1 << i)
                    ).otherwise(0)
                    for i in range(bits_per_band)
                ),
                F.lit(0),
            )
        ).cast("int")

    # ONE exploded (band_id, bucket) relation serves every band: the
    # per-band-branch formulation joined `sides` once per band per
    # join side, re-executing the decimal norm pass 2*bands times —
    # the multi-branch re-execution trap (ARCHITECTURE.md). Here the
    # norm is evaluated once per side; explode only duplicates rows.
    # Measured (similarity_knn_graph, sf0.1, 5-run median): 0.85 s vs
    # 1.03-1.06 s for the branch-per-band form.
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band_id"),
                F.col(f"_bkt{b}").alias("bkt"),
            )
            for b in range(bands)
        ]
    )
    # The exploded side relation is MATERIALIZED once (localCheckpoint)
    # before the self-join: a self-join duplicates its input lineage
    # per side, so without this the source scan AND the decimal norm
    # fold run twice (2 FileScans in the executed plan, measured).
    # The checkpointed frame is narrow — (id, vec, norm, 2 ints) ×
    # bands rows — i.e. exactly the payload both join sides need
    # anyway; at cluster scale this is the per-stage artifact a real
    # pipeline persists (guide §3.3: materialise an intermediate to
    # stop a self-join re-executing it).
    sides = (
        emb.select(
            F.col(id_col).alias("_id"),
            F.col(vec_col).alias("_v"),
            norm.alias("_nrm"),
            *[
                bucket(b * bits_per_band).alias(f"_bkt{b}")
                for b in range(bands)
            ],
        )
        .select(
            "_id",
            "_v",
            "_nrm",
            # earlier bands' buckets ride along so a multi-band
            # collision can be attributed to its FIRST colliding band
            # below (bands-1 extra ints per row)
            *[f"_bkt{b}" for b in range(bands - 1)],
            F.explode(band_structs).alias("_bb"),
        )
        .select(
            "_id", "_v", "_nrm",
            *[f"_bkt{b}" for b in range(bands - 1)],
            "_bb.band_id", "_bb.bkt",
        )
    )
    # stage_boundary = localCheckpoint locally; conf-switchable to a
    # RELIABLE checkpoint at cluster scale (executor-loss-safe) — r16
    sides = stage_boundary(sides)
    a = sides.select(
        F.col("_id").alias("id_a"), F.col("_v").alias("va"),
        F.col("_nrm").alias("na"),
        *[F.col(f"_bkt{b}").alias(f"_bkta{b}") for b in range(bands - 1)],
        "band_id", "bkt",
    )
    b_side = sides.select(
        F.col("_id").alias("id_b"), F.col("_v").alias("vb"),
        F.col("_nrm").alias("nb"),
        *[F.col(f"_bkt{b}").alias(f"_bktb{b}") for b in range(bands - 1)],
        "band_id", "bkt",
    )
    raw_cos = (
        _dot_decimal("va", "vb") if exact else _dot_double("va", "vb")
    ) / (F.col("na") * F.col("nb"))
    cos = F.round(raw_cos, 9).alias("cosine")

    # Count each candidate pair exactly once WITHOUT a pair-level
    # dropDuplicates: a pair is kept only at its FIRST colliding band
    # (band b keeps it iff no earlier band j < b also collided). This
    # removes the (id_a, id_b) dedup exchange outright AND evaluates
    # the exact decimal cosine once per unique pair instead of once
    # per collision — exact duplicates collide in EVERY band, so the
    # all-dup scaled corpus previously paid the decimal fold ``bands``
    # times for precisely its hottest pairs.
    first_band = F.when(F.col("band_id") == 0, F.lit(True))
    for b in range(1, bands):
        no_earlier = F.lit(True)
        for j in range(b):
            no_earlier = no_earlier & (
                F.col(f"_bkta{j}") != F.col(f"_bktb{j}")
            )
        first_band = first_band.when(F.col("band_id") == b, no_earlier)

    cand = (
        a.join(b_side, ["band_id", "bkt"])
        .where((F.col("id_a") != F.col("id_b")) & first_band)
        .select("id_a", "id_b", cos)
    )

    if k == 1:
        # top-1 per vector as a partial-aggregating groupBy instead of
        # a sort + ranking window: the max over (cosine DESC, id_b
        # ASC) — encoded as max(struct(cosine, -id_b)) — combines
        # map-side, so the id_a exchange carries ONE candidate per
        # vector per map partition rather than the whole pair stream.
        best = F.max(
            F.struct(
                F.col("cosine"),
                (-F.col("id_b")).alias("_neg_id"),
            )
        ).alias("_best")
        return (
            cand.groupBy("id_a")
            .agg(best)
            .select(
                F.col("id_a").alias(id_col),
                (-F.col("_best._neg_id")).alias("neighbor_id"),
                F.col("_best.cosine").alias("cosine"),
            )
        )

    w = Window.partitionBy("id_a").orderBy(F.desc("cosine"), F.asc("id_b"))
    out = cand.withColumn("rn", F.row_number().over(w)).where(
        F.col("rn") <= k
    )
    return out.select(
        F.col("id_a").alias(id_col),
        F.col("id_b").alias("neighbor_id"),
        "cosine",
        F.col("rn").cast("long").alias("rank"),
    )
