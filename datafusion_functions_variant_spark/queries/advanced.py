"""Advanced operator coverage: remaining variant surface (to_json,
schema_of, variant-null duality, to_variant_object), as-of / range /
theta joins, GROUPING SETS, pivot, correlated EXISTS, approximate
distinct."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators import joins
from ..sources.tables import load_table, register_views
from . import dsum, dsum_sql, query


@query(
    "variant_surface_full",
    oracle="""
    SELECT event_id,
           regexp_replace(props, ' ', '', 'g') AS j,
           CASE WHEN json_type(props, '$.k') IN ('UBIGINT', 'BIGINT') THEN 'OBJECT<k: BIGINT>'
                WHEN json_type(props, '$.k') = 'NULL' THEN 'OBJECT<k: VOID>'
                ELSE NULL END AS sch,
           (CASE WHEN event_id % 10 = 0 THEN 'NULL' ELSE json_type(props, '$.k') END) = 'NULL' AS k_is_vnull,
           to_json(struct_pack(event_type := event_type, user_id := user_id))::VARCHAR AS obj
    FROM events
    ORDER BY event_id
    """,
)
def variant_surface_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The rest of the reference's function surface in one query:
    variant→JSON roundtrip (A39 inverse), runtime schema (A13-A14),
    variant-null vs SQL-null duality (json.rs:185-196), and
    to_variant_object from a typed struct (A38 ObjectBuilder path).
    Every 10th row gets a JSON null at $.k to exercise the duality."""
    ev = load_table(spark, sf_dir, "events")
    props_mod = F.when(F.col("event_id") % 10 == 0, F.lit('{"k": null}')).otherwise(
        F.col("props")
    )
    v = F.parse_json("props")
    return ev.select(
        "event_id",
        F.to_json(v).alias("j"),
        F.schema_of_variant(v).alias("sch"),
        F.is_variant_null(
            F.try_variant_get(F.parse_json(props_mod), "$.k", "variant")
        ).alias("k_is_vnull"),
        F.to_json(F.to_variant_object(F.struct("event_type", "user_id"))).alias("obj"),
    ).orderBy("event_id")


@query(
    "asof_join_events_orders",
    oracle="""
    WITH e AS (
      SELECT event_id, user_id,
             TIMESTAMP '1995-01-01' + (event_id % 2500) * INTERVAL 1 DAY AS asof_t
      FROM events
    ),
    o AS (
      SELECT o_custkey, o_orderdate, max(o_orderkey) AS o_orderkey
      FROM orders GROUP BY o_custkey, o_orderdate
    )
    SELECT e.event_id, e.user_id,
           o.o_orderkey AS last_orderkey,
           strftime(o.o_orderdate, '%Y-%m-%d') AS last_orderdate
    FROM e ASOF LEFT JOIN o ON e.user_id = o.o_custkey AND e.asof_t >= o.o_orderdate
    ORDER BY e.event_id
    """,
)
def asof_join_events_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (backward, inclusive): each event gets its user's
    most recent order at a synthetic as-of time. Implemented with the
    union-merge plan (operators/joins.py) — one shuffle, no range
    explosion; the oracle is DuckDB's native ASOF LEFT JOIN."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        F.expr(
            "timestamp(date_add(to_date('1995-01-01'), cast(event_id % 2500 AS int)))"
        ).alias("asof_t"),
    )
    orders = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey", "o_orderdate")
        .agg(F.max("o_orderkey").alias("o_orderkey"))
    )
    res = joins.asof_join_backward(
        ev,
        orders,
        left_on="user_id",
        right_on="o_custkey",
        left_time="asof_t",
        right_time="o_orderdate",
        payload_cols=["o_orderkey", "o_orderdate"],
    )
    return res.select(
        "event_id",
        "user_id",
        F.col("o_orderkey").alias("last_orderkey"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("last_orderdate"),
    ).orderBy("event_id")


@query(
    "range_join_quantity_bands",
    oracle="""
    WITH bands AS (
      SELECT t.i::INT AS band_id, (t.i * 10 + 1)::DOUBLE AS lo, ((t.i + 1) * 10)::DOUBLE AS hi
      FROM range(0, 5) t(i)
    )
    SELECT b.band_id, b.lo, b.hi, COUNT(*) AS n,
           CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
    FROM lineitem l JOIN bands b ON l.l_quantity >= b.lo AND l.l_quantity <= b.hi
    GROUP BY 1, 2, 3
    ORDER BY 1
    """,
)
def range_join_quantity_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded range join: quantities bucketed into [1-10]...[41-50]
    bands via a broadcast inequality join (never a cartesian shuffle)."""
    li = load_table(spark, sf_dir, "lineitem")
    bands = spark.range(0, 5).select(
        F.col("id").cast("int").alias("band_id"),
        (F.col("id") * 10 + 1).cast("double").alias("lo"),
        ((F.col("id") + 1) * 10).cast("double").alias("hi"),
    )
    joined = joins.range_band_join(li, bands, "l_quantity").where(
        F.col("band_id").isNotNull()
    )
    return (
        joined.groupBy("band_id", "lo", "hi")
        .agg(F.count(F.lit(1)).alias("n"), dsum("l_quantity", "sum_qty"))
        .orderBy("band_id")
    )


@query(
    "theta_join_late_shipments",
    oracle="""
    SELECT o.o_orderpriority,
           COUNT(*) AS n_late_lines
    FROM orders o JOIN lineitem l
      ON l.l_orderkey = o.o_orderkey
     AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
    GROUP BY 1
    ORDER BY 1
    """,
)
def theta_join_late_shipments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta join (equi key + inequality residual): lineitems shipped
    more than 90 days after their order date. The equi part keeps it
    a hash join; the inequality evaluates as a join residual."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(
            o,
            (li.l_orderkey == o.o_orderkey)
            & (li.l_shipdate > F.date_add(o.o_orderdate.cast("date"), 90).cast("timestamp")),
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_late_lines"))
        .orderBy("o_orderpriority")
    )


@query(
    "grouping_sets_sql",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           COUNT(*) AS n,
           {dsum_sql("l_extendedprice", "sum_price")}
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
    """,
)
def grouping_sets_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS through the SQL entry point (spark.sql
    over registered temp views) — same surface the reference's
    DataFusion crate would have exposed."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               COUNT(*) AS n,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST
        """
    )


@query(
    "pivot_status_by_priority",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT) AS f_cnt,
           CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS BIGINT) AS o_cnt,
           CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS BIGINT) AS p_cnt
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def pivot_status_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (wide aggregation): order counts by priority x status.
    Explicit value list → single-pass pivot, no extra value-discovery
    job."""
    o = load_table(spark, sf_dir, "orders")
    p = (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
    )
    return p.select(
        "o_orderpriority",
        F.coalesce(F.col("F"), F.lit(0)).alias("f_cnt"),
        F.coalesce(F.col("O"), F.lit(0)).alias("o_cnt"),
        F.coalesce(F.col("P"), F.lit(0)).alias("p_cnt"),
    ).orderBy("o_orderpriority")


@query(
    "exists_subquery_sql",
    oracle="""
    SELECT c_mktsegment, COUNT(*) AS n_customers
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'P')
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
)
def exists_subquery_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS / NOT EXISTS via the SQL surface — Catalyst
    rewrites both to semi/anti joins."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT c_mktsegment, COUNT(*) AS n_customers
        FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
          AND NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'P')
        GROUP BY c_mktsegment
        ORDER BY c_mktsegment
        """
    )


@query(
    "approx_distinct_users",
    oracle="""
    SELECT event_type,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
           TRUE AS approx_within_3rsd
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def approx_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog approximate distinct (sketch aggregation) per
    event_type. HLL values differ across engines by design, so the
    hash-checked output carries the exact count plus an error-bound
    boolean: |approx - exact| <= 3*rsd*exact (rsd=0.02 → 6%; measured
    error <= 0.4% at sf0.001-0.1)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id", rsd=0.02).alias("_approx"),
            F.countDistinct("user_id").alias("exact_users"),
        )
        .select(
            "event_type",
            "exact_users",
            (
                F.abs(F.col("_approx") - F.col("exact_users"))
                <= 0.06 * F.col("exact_users")
            ).alias("approx_within_3rsd"),
        )
        .orderBy("event_type")
    )


@query(
    "asof_join_forward_tolerance",
    oracle="""
    WITH e AS (
      SELECT event_id, user_id,
             TIMESTAMP '1995-01-01' + (event_id % 2500) * INTERVAL 1 DAY AS asof_t
      FROM events
    ),
    o AS (
      SELECT o_custkey, o_orderdate, min(o_orderkey) AS o_orderkey
      FROM orders GROUP BY o_custkey, o_orderdate
    )
    SELECT e.event_id, e.user_id,
           CASE WHEN o.o_orderdate <= e.asof_t + INTERVAL 30 DAY
                THEN o.o_orderkey END AS next_orderkey,
           CASE WHEN o.o_orderdate <= e.asof_t + INTERVAL 30 DAY
                THEN (epoch_us(o.o_orderdate) - epoch_us(e.asof_t))
                     // 86400000000 END AS days_wait
    FROM e ASOF LEFT JOIN o ON e.user_id = o.o_custkey
                           AND e.asof_t <= o.o_orderdate
    ORDER BY e.event_id
    """,
)
def asof_join_forward_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of join WITH tolerance: each event matches its
    user's NEXT order at-or-after the as-of time, kept only when it
    arrives within 30 days. Same union-merge single-shuffle plan as
    the backward variant, with a forward-looking window frame and the
    matched time carried through so the tolerance is a projection, not
    a second join. Oracle: DuckDB native ASOF LEFT JOIN (<=) + CASE.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        F.expr(
            "timestamp(date_add(to_date('1995-01-01'), cast(event_id % 2500 AS int)))"
        ).alias("asof_t"),
    )
    orders = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey", "o_orderdate")
        .agg(F.min("o_orderkey").alias("o_orderkey"))
    )
    res = joins.asof_join_forward(
        ev,
        orders,
        left_on="user_id",
        right_on="o_custkey",
        left_time="asof_t",
        right_time="o_orderdate",
        payload_cols=["o_orderkey"],
        tolerance_us=30 * 86_400_000_000,
    )
    return res.select(
        "event_id",
        "user_id",
        F.col("o_orderkey").alias("next_orderkey"),
        (
            (F.unix_micros("matched_time") - F.unix_micros("asof_t"))
            / F.lit(86_400_000_000)
        )
        .cast("long")
        .alias("days_wait"),
    ).orderBy("event_id")


@query(
    "hll_sketch_mergeable",
    oracle="""
    SELECT event_type,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
           TRUE AS merged_within_bound
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def hll_sketch_mergeable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable HLL sketches (Datasketches `hll_sketch_agg` /
    `hll_union_agg`): per-shard partial sketches are built
    independently, then UNIONED without touching raw rows again —
    the pattern that makes distinct-count maintainable at 100 TB
    (daily shard sketches merge into a rolling total in O(#shards),
    not O(#rows); re-aggregation needs no re-scan). Here 16 hash
    shards per event_type are sketched and merged; the output carries
    the exact count plus a bound check (lgConfigK=12 → rsd ≈ 1.6%,
    bound 3·rsd ≈ 5%) so the hash compare is engine-portable.
    Sketch values themselves are never emitted (binary differs across
    engines by design)."""
    ev = load_table(spark, sf_dir, "events")
    per_shard = ev.groupBy(
        "event_type", (F.crc32(F.col("user_id").cast("string")) % 16).alias("shard")
    ).agg(F.hll_sketch_agg("user_id", 12).alias("sk"))
    merged = per_shard.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk", False)).alias("est")
    )
    exact = ev.groupBy("event_type").agg(F.countDistinct("user_id").alias("exact_users"))
    return (
        exact.join(merged, "event_type")
        .select(
            "event_type",
            "exact_users",
            (
                F.abs(F.col("est") - F.col("exact_users"))
                <= 0.05 * F.col("exact_users")
            ).alias("merged_within_bound"),
        )
        .orderBy("event_type")
    )


@query(
    "bitmap_exact_distinct",
    oracle="""
    SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def bitmap_exact_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT mergeable distinct-count via bitmap aggregates — the
    lossless sibling of the HLL sketch pattern: user ids are mapped to
    (bucket, bit-position), per-(type, bucket, shard) bitmaps are built
    independently (`bitmap_construct_agg` — here 4 hash shards stand in
    for per-day partials), OR-merged per bucket without touching raw
    rows again (`bitmap_or_agg`), and popcounts summed. Unlike HLL the
    result is exactly COUNT(DISTINCT), so the oracle compares values
    directly, not a bound. At 100 TB: daily bitmap partials merge in
    O(#shards · #buckets), re-aggregation needs no re-scan, and memory
    stays bounded because each bitmap covers a fixed 32k-id bucket."""
    ev = load_table(spark, sf_dir, "events")
    per_shard = ev.groupBy(
        "event_type",
        F.bitmap_bucket_number("user_id").alias("bucket"),
        (F.col("user_id") % 4).alias("shard"),
    ).agg(F.bitmap_construct_agg(F.bitmap_bit_position("user_id")).alias("bm"))
    merged = per_shard.groupBy("event_type", "bucket").agg(
        F.bitmap_or_agg("bm").alias("bm")
    )
    return (
        merged.groupBy("event_type")
        .agg(F.sum(F.bitmap_count("bm")).cast("long").alias("n_users"))
        .orderBy("event_type")
    )


@query(
    "theta_sketch_setops",
    oracle="""
    WITH c AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'click'),
    p AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase')
    SELECT
      CAST((SELECT COUNT(*) FROM (SELECT user_id FROM c UNION SELECT user_id FROM p)) AS BIGINT) AS exact_union,
      CAST((SELECT COUNT(*) FROM c WHERE user_id IN (SELECT user_id FROM p)) AS BIGINT) AS exact_intersection,
      CAST((SELECT COUNT(*) FROM c WHERE user_id NOT IN (SELECT user_id FROM p)) AS BIGINT) AS exact_difference,
      TRUE AS union_within_bound,
      TRUE AS intersection_within_bound,
      TRUE AS difference_within_bound
    """,
)
def theta_sketch_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta sketches — the sketch family that supports SET ALGEBRA,
    not just union: distinct clickers and purchasers are sketched
    independently, then union / intersection / A-minus-B estimates are
    computed sketch-to-sketch (`theta_union` / `theta_intersection` /
    `theta_difference`) — no re-scan, no join. HLL can only union;
    theta answers "how many clicked but never purchased" from two
    pre-built sketches. Output carries the exact counts plus
    within-bound booleans (5% + 5 absolute slack: lgK=12 → rsd ≈ 1.6%,
    and below 4k entries the sketch is exact), so the hash compare is
    engine-portable; sketch bytes are never emitted."""
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.where(F.col("event_type") == "click")
    buys = ev.where(F.col("event_type") == "purchase")
    ska = clicks.agg(F.theta_sketch_agg("user_id", 12).alias("ska"))
    skb = buys.agg(F.theta_sketch_agg("user_id", 12).alias("skb"))
    ests = ska.crossJoin(skb).select(
        F.theta_sketch_estimate(F.theta_union("ska", "skb")).alias("est_u"),
        F.theta_sketch_estimate(F.theta_intersection("ska", "skb")).alias("est_i"),
        F.theta_sketch_estimate(F.theta_difference("ska", "skb")).alias("est_d"),
    )
    cu = clicks.select("user_id")
    pu = buys.select("user_id")
    exact = (
        cu.union(pu).distinct().agg(F.count(F.lit(1)).alias("exact_union"))
        .crossJoin(
            cu.distinct().intersect(pu.distinct())
            .agg(F.count(F.lit(1)).alias("exact_intersection"))
        )
        .crossJoin(
            cu.distinct().exceptAll(pu.distinct())
            .agg(F.count(F.lit(1)).alias("exact_difference"))
        )
    )

    def ok(est, exact_col):
        return (F.abs(F.col(est) - F.col(exact_col)) <= 0.05 * F.col(exact_col) + 5)

    return exact.crossJoin(ests).select(
        F.col("exact_union").cast("long").alias("exact_union"),
        F.col("exact_intersection").cast("long").alias("exact_intersection"),
        F.col("exact_difference").cast("long").alias("exact_difference"),
        ok("est_u", "exact_union").alias("union_within_bound"),
        ok("est_i", "exact_intersection").alias("intersection_within_bound"),
        ok("est_d", "exact_difference").alias("difference_within_bound"),
    )


@query(
    "join_interval_overlap_sessions",
    oracle="""
    WITH marked AS (
      SELECT user_id, ts,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > INTERVAL '30 minutes' THEN 1 ELSE 0 END AS brk,
             event_id
      FROM events
    ),
    sessioned AS (
      SELECT user_id, ts,
             SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS UNBOUNDED PRECEDING) AS sess
      FROM marked
    ),
    sessions AS (
      SELECT user_id, sess, min(ts) AS s_start, max(ts) AS s_end
      FROM sessioned GROUP BY 1, 2
    ),
    incidents AS (
      SELECT event_id AS error_id, user_id,
             ts - INTERVAL '15 minutes' AS i_start,
             ts + INTERVAL '15 minutes' AS i_end
      FROM events WHERE event_type = 'error'
    )
    SELECT s.user_id, epoch_us(s.s_start) AS session_start,
           i.error_id,
           CAST(epoch_us(LEAST(s.s_end, i.i_end))
                - epoch_us(GREATEST(s.s_start, i.i_start)) AS BIGINT) AS overlap_us
    FROM sessions s
    JOIN incidents i ON i.user_id = s.user_id
                    AND s.s_start <= i.i_end AND i.i_start <= s.s_end
    ORDER BY s.user_id, session_start, error_id
    """,
)
def join_interval_overlap_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal interval-overlap join (operators/joins.py): per-user
    activity sessions (30-minute-gap sessionization) joined against
    +/-15-minute error-incident windows of the same user — 'which
    sessions touched an incident'. The timeline-bucket equi-join keeps
    it a hash join (bucket = 30 min, ~ the interval scale); the exact
    overlap predicate and the first-shared-bucket dedup run inside the
    joined stream, so no distinct pass and no range cross product. The
    oracle joins the raw interval predicate directly."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    marked = ev.select(
        "user_id",
        "ts",
        "event_id",
        F.when(
            F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w)
            > 30 * 60 * 1_000_000,
            1,
        )
        .otherwise(0)
        .alias("brk"),
    )
    sessioned = marked.select(
        "user_id",
        "ts",
        F.sum("brk")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("sess"),
    )
    sessions = sessioned.groupBy("user_id", "sess").agg(
        F.min("ts").alias("s_start"), F.max("ts").alias("s_end")
    )
    incidents = (
        ev.where(F.col("event_type") == "error")
        .select(
            F.col("event_id").alias("error_id"),
            F.col("user_id"),
            (F.col("ts") - F.expr("INTERVAL 15 minutes")).alias("i_start"),
            (F.col("ts") + F.expr("INTERVAL 15 minutes")).alias("i_end"),
        )
    )
    out = joins.interval_overlap_join(
        sessions,
        incidents.withColumnRenamed("user_id", "user_id"),
        key="user_id",
        l_start="s_start",
        l_end="s_end",
        r_start="i_start",
        r_end="i_end",
        bucket_us=30 * 60 * 1_000_000,
    )
    return out.select(
        "user_id",
        F.unix_micros("s_start").alias("session_start"),
        "error_id",
        F.col("overlap_us").cast("long"),
    ).orderBy("user_id", "session_start", "error_id")


@query(
    "asof_join_nearest_orders",
    oracle="""
    WITH e AS (
      SELECT event_id, user_id,
             TIMESTAMP '1995-01-01' + (event_id % 2500) * INTERVAL 1 DAY AS asof_t
      FROM events
    ),
    o AS (
      SELECT o_custkey, o_orderdate, max(o_orderkey) AS o_orderkey
      FROM orders GROUP BY o_custkey, o_orderdate
    ),
    b AS (
      SELECT e.event_id, o.o_orderkey AS bk, o.o_orderdate AS bt
      FROM e ASOF LEFT JOIN o
        ON e.user_id = o.o_custkey AND e.asof_t >= o.o_orderdate
    ),
    f AS (
      SELECT e.event_id, o.o_orderkey AS fk, o.o_orderdate AS ft
      FROM e ASOF LEFT JOIN o
        ON e.user_id = o.o_custkey AND e.asof_t <= o.o_orderdate
    )
    SELECT e.event_id, e.user_id,
           CASE WHEN bt IS NOT NULL AND (ft IS NULL OR
                     epoch_us(e.asof_t) - epoch_us(bt)
                     <= epoch_us(ft) - epoch_us(e.asof_t))
                THEN bk ELSE fk END AS nearest_orderkey,
           strftime(CASE WHEN bt IS NOT NULL AND (ft IS NULL OR
                              epoch_us(e.asof_t) - epoch_us(bt)
                              <= epoch_us(ft) - epoch_us(e.asof_t))
                         THEN bt ELSE ft END, '%Y-%m-%d') AS nearest_orderdate
    FROM e JOIN b ON b.event_id = e.event_id
           JOIN f ON f.event_id = e.event_id
    ORDER BY e.event_id
    """,
)
def asof_join_nearest_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-direction as-of join (pandas merge_asof
    direction='nearest'): each event attaches its user's CLOSEST order
    in time, looking both ways, ties to the earlier order. One shuffle
    — both directional window frames share the same sort
    (operators/joins.py asof_join_nearest). The oracle composes
    DuckDB's two directional ASOF joins and picks the closer side."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        F.expr(
            "timestamp(date_add(to_date('1995-01-01'), cast(event_id % 2500 AS int)))"
        ).alias("asof_t"),
    )
    orders = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey", "o_orderdate")
        .agg(F.max("o_orderkey").alias("o_orderkey"))
    )
    res = joins.asof_join_nearest(
        ev,
        orders,
        left_on="user_id",
        right_on="o_custkey",
        left_time="asof_t",
        right_time="o_orderdate",
        payload_cols=["o_orderkey"],
    )
    return res.select(
        "event_id",
        "user_id",
        F.col("o_orderkey").alias("nearest_orderkey"),
        F.date_format("matched_time", "yyyy-MM-dd").alias("nearest_orderdate"),
    ).orderBy("event_id")
