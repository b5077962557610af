"""Dimension-maintenance and corpus-scoring pipelines: SCD-2 history
build, MERGE-style upsert, TF-IDF term ranking. These are the
warehouse-side operations a training-data platform runs around the
analytics core — all pure DataFrame plans, no custom execution.

Reference parity note: the reference implements none of this (its
relational layer is the TODO DataFusion crate, /root/reference/
README.md:15-16); these extend SURVEY.md §2 Part B with the mutation /
history patterns Spark expresses as joins + windows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators import ivm
from ..sources.tables import load_table
from . import query


@query(
    "scd2_user_status_history",
    oracle="""
    WITH ordered AS (
      SELECT user_id, event_type, ts, event_id,
             LAG(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_type
      FROM events
    ),
    changes AS (
      SELECT user_id, event_type, ts, event_id FROM ordered
      WHERE prev_type IS NULL OR prev_type <> event_type
    )
    SELECT user_id, event_type AS status,
           epoch_us(ts) AS valid_from_us,
           epoch_us(LEAD(ts) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id)) AS valid_to_us,
           CASE WHEN LEAD(ts) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) IS NULL
                THEN 1 ELSE 0 END AS is_current
    FROM changes
    ORDER BY user_id, valid_from_us
    """,
)
def scd2_user_status_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type 2 built from an event stream:
    collapse consecutive repeats of each user's event_type (gaps-and-
    islands via LAG), then LEAD gives each surviving row its validity
    interval; the open row is flagged current. Both windows share ONE
    partitioning (user_id) so Catalyst plans a single sort+shuffle and
    runs both window frames over it — the standard way to snapshot
    per-entity state history at any scale.
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes = (
        ev.withColumn("prev_type", F.lag("event_type").over(w))
        .where(F.col("prev_type").isNull() | (F.col("prev_type") != F.col("event_type")))
    )
    return (
        changes.select(
            "user_id",
            F.col("event_type").alias("status"),
            F.unix_micros("ts").alias("valid_from_us"),
            F.unix_micros(F.lead("ts").over(w)).alias("valid_to_us"),
            F.when(F.lead("ts").over(w).isNull(), F.lit(1))
            .otherwise(F.lit(0))
            .alias("is_current"),
        )
        .orderBy("user_id", "valid_from_us")
    )


@query(
    "merge_upsert_customer_balance",
    oracle="""
    WITH target AS (
      SELECT c_custkey, c_acctbal FROM customer
      WHERE c_custkey < (SELECT MAX(c_custkey) / 2 FROM customer)
    ),
    source AS (
      SELECT o_custkey,
             SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS order_total,
             COUNT(*) AS n_orders
      FROM orders
      WHERE o_orderdate >= DATE '1998-01-01'
      GROUP BY 1
    )
    SELECT COALESCE(t.c_custkey, s.o_custkey) AS custkey,
           CASE WHEN t.c_custkey IS NULL THEN 'insert'
                WHEN s.o_custkey IS NULL THEN 'keep'
                ELSE 'update' END AS action,
           CAST(CAST(COALESCE(t.c_acctbal, 0) AS DECIMAL(18,2))
                + COALESCE(s.order_total, 0) AS DOUBLE) AS new_balance,
           CAST(COALESCE(s.n_orders, 0) AS BIGINT) AS n_orders
    FROM target t FULL OUTER JOIN source s ON t.c_custkey = s.o_custkey
    ORDER BY custkey
    """,
)
def merge_upsert_customer_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO emulation on plain parquet (no table format in this
    container): a stale dimension snapshot (low half of customers)
    full-outer-joined with fresh per-customer order totals. Matched
    rows 'update' (balance += total), unmatched-source rows 'insert',
    unmatched-target rows 'keep' — exactly the three MERGE branches,
    computed as ONE shuffle-join pass + COALESCE projections. On a
    cluster the same plan is what Delta/Iceberg MERGE compiles to,
    minus the transactional file rewrite.
    """
    cust = load_table(spark, sf_dir, "customer")
    half = cust.agg((F.max("c_custkey") / 2).alias("h"))
    target = (
        cust.join(F.broadcast(half))
        .where(F.col("c_custkey") < F.col("h"))
        .select("c_custkey", "c_acctbal")
    )
    source = (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_orderdate") >= F.lit("1998-01-01").cast("timestamp"))
        .groupBy("o_custkey")
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("order_total"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )
    merged = target.join(source, target.c_custkey == source.o_custkey, "full_outer")
    return merged.select(
        F.coalesce("c_custkey", "o_custkey").alias("custkey"),
        F.when(F.col("c_custkey").isNull(), "insert")
        .when(F.col("o_custkey").isNull(), "keep")
        .otherwise("update")
        .alias("action"),
        (
            F.coalesce(F.col("c_acctbal"), F.lit(0)).cast("decimal(18,2)")
            + F.coalesce(F.col("order_total"), F.lit(0).cast("decimal(18,2)"))
        )
        .cast("double")
        .alias("new_balance"),
        F.coalesce("n_orders", F.lit(0)).cast("long").alias("n_orders"),
    ).orderBy("custkey")


@query(
    "text_tfidf_top_terms",
    oracle="""
    WITH words AS (
      SELECT doc_id, lower(w) AS w
      FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents)
      WHERE len(w) >= 3
    ),
    tf AS (SELECT doc_id, w, COUNT(*) AS tf FROM words GROUP BY 1, 2),
    df AS (SELECT w, COUNT(DISTINCT doc_id) AS df FROM words GROUP BY 1),
    n AS (SELECT COUNT(DISTINCT doc_id) AS n_docs FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.w, tf.tf, df.df,
             ROUND(tf.tf * LN(CAST(n.n_docs AS DOUBLE) / df.df), 6) AS tfidf
      FROM tf JOIN df USING (w), n
    )
    SELECT doc_id, w AS term, CAST(tf AS BIGINT) AS tf,
           CAST(df AS BIGINT) AS df, tfidf, rank FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                                   ORDER BY tfidf DESC, w) AS rank
      FROM scored)
    WHERE rank <= 3
    ORDER BY doc_id, rank
    """,
)
def text_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document top-3 TF-IDF terms: tokenize → term frequency per
    doc → document frequency per term (one distinct-agg) → join +
    window top-k. The document-frequency side aggregates to vocabulary
    size and is broadcast back onto the TF stream — the TF stream
    itself shuffles once on the term for the join, then once on doc_id
    for the ranking window. tfidf is rounded to 6 decimals BEFORE
    ranking so the cross-engine rank order can't flip on a last-ulp
    libm difference in ln().
    """
    from ..operators.dedup import fan_out

    docs = fan_out(load_table(spark, sf_dir, "documents"))
    words = (
        docs.select(
            "doc_id", F.explode(F.split(F.col("text"), " ")).alias("w")
        )
        .where(F.length("w") >= 3)
        .select("doc_id", F.lower("w").alias("w"))
    )
    tf = words.groupBy("doc_id", "w").agg(F.count(F.lit(1)).alias("tf"))
    df = words.groupBy("w").agg(F.countDistinct("doc_id").alias("df"))
    n_docs = docs.agg(F.countDistinct("doc_id").alias("n_docs"))
    scored = (
        tf.join(F.broadcast(df), "w")
        .join(F.broadcast(n_docs))
        .withColumn(
            "tfidf",
            F.round(
                F.col("tf") * F.log(F.col("n_docs").cast("double") / F.col("df")), 6
            ),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), "w")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 3)
        .select(
            "doc_id",
            F.col("w").alias("term"),
            F.col("tf").cast("long").alias("tf"),
            F.col("df").cast("long").alias("df"),
            "tfidf",
            "rank",
        )
        .orderBy("doc_id", "rank")
    )


@query(
    "window_time_range_frame",
    oracle="""
    SELECT event_id, user_id,
           CAST(SUM(CAST(value AS DECIMAL(18,2)))
                OVER (PARTITION BY user_id ORDER BY ts
                      RANGE BETWEEN INTERVAL '1 hour' PRECEDING
                            AND CURRENT ROW) AS DOUBLE) AS hour_sum,
           CAST(COUNT(*)
                OVER (PARTITION BY user_id ORDER BY ts
                      RANGE BETWEEN INTERVAL '1 hour' PRECEDING
                            AND CURRENT ROW) AS BIGINT) AS hour_n
    FROM events
    ORDER BY event_id
    """,
)
def window_time_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-based RANGE window frame: each event's trailing-1-hour
    per-user activity (sum + count). Spark's rangeBetween needs a
    numeric ordering column, so the frame runs over unix_micros(ts)
    with a ±3.6e9 µs bound — semantically identical to DuckDB's
    ``RANGE INTERVAL 1 HOUR PRECEDING`` (both include peer rows at
    equal timestamps). One shuffle on user_id; the frame itself is a
    streaming in-partition scan, never a self-join.
    """
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-3_600_000_000, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.sum(F.col("value").cast("decimal(18,2)")).over(w).cast("double").alias("hour_sum"),
        F.count(F.lit(1)).over(w).cast("long").alias("hour_n"),
    ).orderBy("event_id")


@query(
    "unpivot_lineitem_measures",
    oracle="""
    WITH long_form AS (
      SELECT l_returnflag, 'l_quantity' AS measure, l_quantity AS val FROM lineitem
      UNION ALL
      SELECT l_returnflag, 'l_extendedprice', l_extendedprice FROM lineitem
      UNION ALL
      SELECT l_returnflag, 'l_discount', l_discount FROM lineitem
      UNION ALL
      SELECT l_returnflag, 'l_tax', l_tax FROM lineitem
    )
    SELECT l_returnflag, measure,
           CAST(SUM(CAST(val AS DECIMAL(18,4))) AS DOUBLE) AS total,
           COUNT(*) AS n
    FROM long_form GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def unpivot_lineitem_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long reshape (unpivot/melt) of four lineitem measures,
    then a grouped rollup of the long form. Unpivot is a per-row
    generator (Expand node — 4 output rows per input, NO shuffle,
    NO union of 4 re-scans like the naive SQL); the only exchange is
    the final (returnflag, measure) aggregation, and partial
    aggregation collapses it map-side first.
    """
    li = load_table(spark, sf_dir, "lineitem")
    long_form = li.unpivot(
        ids=["l_returnflag"],
        values=["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        variableColumnName="measure",
        valueColumnName="val",
    )
    return (
        long_form.groupBy("l_returnflag", "measure")
        .agg(
            F.sum(F.col("val").cast("decimal(18,4)")).cast("double").alias("total"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("l_returnflag", "measure")
    )


@query(
    "timeseries_multires_rollup",
    oracle=f"""
    SELECT strftime(time_bucket(INTERVAL '1 day', ts), '%Y-%m-%d') AS day,
           CASE WHEN GROUPING(EXTRACT(HOUR FROM ts)) = 0
                THEN CAST(EXTRACT(HOUR FROM ts) AS INT) END AS hour,
           CASE WHEN GROUPING(event_type) = 0 THEN event_type END AS event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY GROUPING SETS (
      (time_bucket(INTERVAL '1 day', ts)),
      (time_bucket(INTERVAL '1 day', ts), EXTRACT(HOUR FROM ts)),
      (time_bucket(INTERVAL '1 day', ts), EXTRACT(HOUR FROM ts), event_type))
    ORDER BY day, hour NULLS FIRST, event_type NULLS FIRST
    """,
)
def timeseries_multires_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style multi-resolution rollup: day, day+hour, and
    day+hour+type aggregates of the event stream materialized in ONE
    pass — a ROLLUP over (day, hour, event_type) minus the grand total,
    expressed as GROUPING SETS. Catalyst compiles it to a single
    Expand (3 output rows per input) + one aggregation exchange, versus
    the naive three separate scan+agg jobs a continuous-aggregate
    hierarchy would otherwise run; at 100 TB the scan happens once.
    """
    ev = load_table(spark, sf_dir, "events").select(
        F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day"),
        F.hour("ts").alias("hour"),
        "event_type",
        F.col("value").cast("decimal(18,2)").alias("v"),
    )
    ev.createOrReplaceTempView("ev_rollup_src")
    return ev.sparkSession.sql(
        """
        SELECT day,
               CASE WHEN GROUPING(hour) = 0 THEN hour END AS hour,
               CASE WHEN GROUPING(event_type) = 0 THEN event_type END AS event_type,
               COUNT(*) AS n,
               CAST(SUM(v) AS DOUBLE) AS sum_value
        FROM ev_rollup_src
        GROUP BY GROUPING SETS ((day), (day, hour), (day, hour, event_type))
        ORDER BY day, hour ASC NULLS FIRST, event_type ASC NULLS FIRST
        """
    )


@query(
    "cdc_apply_changes",
    oracle="""
    WITH mk AS (SELECT MAX(c_custkey) AS m FROM customer),
    log AS (
      SELECT CASE WHEN o_orderkey % 7 = 0 THEN o_custkey + mk.m
                  ELSE o_custkey END AS key,
             o_orderkey AS seq,
             CASE WHEN o_orderkey % 13 = 0 THEN 'D' ELSE 'U' END AS op,
             CAST(o_totalprice AS DECIMAL(18,2)) AS val
      FROM orders, mk),
    last AS (
      SELECT key, op, val, n_changes FROM (
        SELECT key, op, val,
               ROW_NUMBER() OVER (PARTITION BY key ORDER BY seq DESC) AS rn,
               COUNT(*) OVER (PARTITION BY key) AS n_changes
        FROM log) WHERE rn = 1),
    snap AS (
      SELECT c_custkey AS key, CAST(c_acctbal AS DECIMAL(18,2)) AS bal
      FROM customer)
    SELECT COALESCE(s.key, l.key) AS key,
           CASE WHEN l.key IS NULL THEN 'keep'
                WHEN s.key IS NULL THEN 'insert'
                ELSE 'update' END AS action,
           CAST(COALESCE(l.val, s.bal) AS DOUBLE) AS balance,
           CAST(COALESCE(l.n_changes, 0) AS BIGINT) AS n_changes
    FROM snap s FULL JOIN last l ON s.key = l.key
    WHERE l.op IS NULL OR l.op <> 'D'
    ORDER BY key
    """,
)
def cdc_apply_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC APPLY: compact an ordered change log (insert/update rows +
    delete tombstones, multiple changes per key) down to the latest
    change per key, then apply it to a dimension snapshot — the
    Debezium/stream-ingest pattern Delta's APPLY CHANGES compiles to.
    The log is derived deterministically from orders (seq = orderkey;
    every 13th change is a tombstone; every 7th targets a brand-new
    key so all three branches are live). Log compaction is ONE window
    shuffle on key (row_number picks last-writer-wins, the same
    partition serves the per-key change count); the apply is one
    full-outer join; tombstoned keys drop. At 100 TB the log shuffle
    partitions by key — exactly how per-key changelog compaction
    scales — and the snapshot join can be bucket-co-located."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    mk = cust.agg(F.max("c_custkey").alias("m"))
    log = orders.join(F.broadcast(mk)).select(
        F.when(F.col("o_orderkey") % 7 == 0, F.col("o_custkey") + F.col("m"))
        .otherwise(F.col("o_custkey"))
        .alias("key"),
        F.col("o_orderkey").alias("seq"),
        F.when(F.col("o_orderkey") % 13 == 0, F.lit("D"))
        .otherwise(F.lit("U"))
        .alias("op"),
        F.col("o_totalprice").cast("decimal(18,2)").alias("val"),
    )
    wlast = Window.partitionBy("key").orderBy(F.desc("seq"))
    wcnt = Window.partitionBy("key")
    last = (
        log.select(
            "key",
            "op",
            "val",
            F.row_number().over(wlast).alias("rn"),
            F.count(F.lit(1)).over(wcnt).alias("n_changes"),
        )
        .where(F.col("rn") == 1)
        .drop("rn")
    )
    snap = cust.select(
        F.col("c_custkey").alias("key"),
        F.col("c_acctbal").cast("decimal(18,2)").alias("bal"),
    )
    applied = snap.join(last, ["key"], "full_outer").where(
        F.col("op").isNull() | (F.col("op") != "D")
    )
    return applied.select(
        "key",
        F.when(F.col("op").isNull(), "keep")
        .when(F.col("bal").isNull(), "insert")
        .otherwise("update")
        .alias("action"),
        F.coalesce("val", "bal").cast("double").alias("balance"),
        F.coalesce("n_changes", F.lit(0)).cast("long").alias("n_changes"),
    ).orderBy("key")


@query(
    "rollup_incremental_maintenance",
    oracle="""
    -- full recompute over the APPLIED corpus (base minus deletes plus
    -- inserts) — a different algorithm than the Spark side's
    -- delta-merge, so the hash checks the maintenance logic itself
    SELECT strftime(time_bucket(INTERVAL '1 day', ts), '%Y-%m-%d') AS day,
           CASE WHEN GROUPING(EXTRACT(HOUR FROM ts)) = 0
                THEN CAST(EXTRACT(HOUR FROM ts) AS INT) END AS hour,
           CASE WHEN GROUPING(event_type) = 0 THEN event_type END AS event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM events
    WHERE (event_id % 10 = 0) OR (event_id % 17 <> 0)
    GROUP BY GROUPING SETS (
      (time_bucket(INTERVAL '1 day', ts)),
      (time_bucket(INTERVAL '1 day', ts), EXTRACT(HOUR FROM ts)),
      (time_bucket(INTERVAL '1 day', ts), EXTRACT(HOUR FROM ts), event_type))
    ORDER BY day, hour NULLS FIRST, event_type NULLS FIRST
    """,
    hash_deps=(ivm.rollup_full, ivm.rollup_delta, ivm.merge_rollup),
)
def rollup_incremental_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental view maintenance of the multi-resolution rollup —
    the continuous-aggregate refresh a 100 TB warehouse runs instead
    of recomputing the cube: aggregate the CHANGELOG into signed
    algebraic partials (+1/-1 count, ±value sum per grouping set) and
    MERGE them into the stored rollup with one grouping-key join.
    Maintenance cost is O(|changelog| + |affected groups|), never the
    corpus; fully-deleted groups vanish (n reaches 0), brand-new
    groups appear from the delta side of the full-outer merge.

    Fixture: base = events with event_id % 10 != 0 (the corpus the
    materialized rollup was built from); the changelog INSERTs the
    id % 10 == 0 rows and DELETEs base rows with id % 17 == 0 — all
    three maintenance paths (insert-new-group, update, delete) are
    live. The oracle recomputes the rollup from scratch over the
    applied corpus, so the hash proves delta-merge == recompute.

    COUNT and SUM are self-maintainable (algebraic) aggregates — the
    delta merges via addition; MIN/MAX would need the per-group
    re-scan path and are deliberately out of scope here. Grouping-set
    keys merge NULL-safely (eqNullSafe per key): the NULL pattern
    identifies the grouping set (day / day+hour / day+hour+type), and
    source columns are never genuinely NULL, so patterns are
    unambiguous. In production the base rollup is a stored table
    (saveAsTable, like ``dedup_incremental_bucketed_index``); here it
    is built in-plan from the base corpus so the registered query is
    self-contained — the MAINTENANCE subplan (changelog Expand +
    delta aggregation + merge join) is exchange-sized by the
    changelog and the group count, pinned in tests/test_plans.py."""
    ev = load_table(spark, sf_dir, "events").select(
        F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day"),
        F.hour("ts").alias("hour"),
        "event_type",
        F.col("value").cast("decimal(18,2)").alias("v"),
        "event_id",
    )
    # the "stored" materialized view: rollup over the base corpus
    rollup0 = ivm.rollup_full(
        ev.where(F.col("event_id") % 10 != 0), "ivm_base_src"
    )
    # signed changelog: inserts carry +1, delete tombstones -1
    signed = ev.where(
        (F.col("event_id") % 10 == 0) | (F.col("event_id") % 17 == 0)
    ).select(
        "day",
        "hour",
        "event_type",
        F.when(F.col("event_id") % 10 == 0, F.lit(1))
        .otherwise(F.lit(-1))
        .alias("sign"),
        F.col("v"),
    )
    delta = ivm.rollup_delta(signed, "ivm_delta_src")
    return (
        ivm.merge_rollup(rollup0, delta)
        .select(
            "day",
            "hour",
            "event_type",
            "n",
            F.col("s").cast("double").alias("sum_value"),
        )
        .orderBy("day", F.col("hour").asc_nulls_first(),
                 F.col("event_type").asc_nulls_first())
    )


@query(
    "scd2_asof_snapshot",
    oracle="""
    WITH bounds AS (
      SELECT (MIN(epoch_us(ts)) + MAX(epoch_us(ts))) // 2 AS asof_us
      FROM events
    ),
    ordered AS (
      SELECT user_id, event_type, ts, event_id,
             LAG(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_type
      FROM events
    ),
    changes AS (
      SELECT user_id, event_type, ts, event_id FROM ordered
      WHERE prev_type IS NULL OR prev_type <> event_type
    ),
    hist AS (
      SELECT user_id, event_type AS status,
             epoch_us(ts) AS since_us,
             epoch_us(LEAD(ts) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id)) AS until_us
      FROM changes
    )
    SELECT h.user_id, h.status, h.since_us, b.asof_us
    FROM hist h CROSS JOIN bounds b
    WHERE h.since_us <= b.asof_us
      AND (h.until_us IS NULL OR h.until_us > b.asof_us)
    ORDER BY h.user_id
    """,
)
def scd2_asof_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time (time-travel) read over the SCD-2 history: rebuild
    each user's state AS OF a fixed instant — here the midpoint of the
    observed event range, derived with integer microsecond arithmetic
    so every engine lands on the identical instant. The history build
    shares ``scd2_user_status_history``'s single (user_id) sort+shuffle;
    the as-of instant is a 1-row aggregate broadcast into the filter,
    so the snapshot costs one corpus scan + one window exchange at any
    scale — never a second pass to "replay" history. This is the read
    side the reference's TODO relational layer would need for temporal
    queries (README.md:15-16); Spark expresses it as windows + a
    broadcast scalar."""
    ev = load_table(spark, sf_dir, "events")
    bounds = ev.agg(
        F.expr("(min(unix_micros(ts)) + max(unix_micros(ts))) div 2")
        .cast("long")
        .alias("asof_us")
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes = ev.withColumn("prev_type", F.lag("event_type").over(w)).where(
        F.col("prev_type").isNull()
        | (F.col("prev_type") != F.col("event_type"))
    )
    hist = changes.select(
        "user_id",
        F.col("event_type").alias("status"),
        F.unix_micros("ts").alias("since_us"),
        F.unix_micros(F.lead("ts").over(w)).alias("until_us"),
    )
    return (
        hist.crossJoin(F.broadcast(bounds))
        .where(
            (F.col("since_us") <= F.col("asof_us"))
            & (F.col("until_us").isNull() | (F.col("until_us") > F.col("asof_us")))
        )
        .select("user_id", "status", "since_us", "asof_us")
        .orderBy("user_id")
    )


@query(
    "rollup_rewrite_answering",
    oracle="""
    -- the oracle takes the path the rewrite AVOIDS: filter + group
    -- the applied corpus directly
    SELECT strftime(time_bucket(INTERVAL '1 day', ts), '%Y-%m-%d') AS day,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM events
    WHERE ((event_id % 10 = 0) OR (event_id % 17 <> 0))
      AND CAST(ts AS DATE) BETWEEN DATE '2024-01-08' AND DATE '2024-01-21'
    GROUP BY 1 ORDER BY day
    """,
    hash_deps=(ivm.rollup_full, ivm.rollup_delta, ivm.merge_rollup),
)
def rollup_rewrite_answering(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The continuous-aggregate READ path: a per-day business query
    for a two-week range answered FROM the maintained rollup (the
    `rollup_incremental_maintenance` pipeline) instead of scanning
    the corpus — the query-rewrite half of materialized-view
    maintenance, where the (day) grouping set's rows ARE the answer
    (NULL hour + NULL event_type selects the day level; no
    re-aggregation happens, just a filter on the GROUPS table). The
    oracle deliberately takes the path the rewrite avoids — filter +
    group over the applied corpus — so the hash proves
    rollup-as-answer == corpus recompute. At 100 TB the maintained
    rollup is a stored table and this plan touches only
    O(groups-in-range) rows; here it inherits the in-plan
    maintenance build (2 corpus scans, pinned — the rewrite itself
    adds NONE)."""
    ev = load_table(spark, sf_dir, "events").select(
        F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day"),
        F.hour("ts").alias("hour"),
        "event_type",
        F.col("value").cast("decimal(18,2)").alias("v"),
        "event_id",
    )
    rollup0 = ivm.rollup_full(
        ev.where(F.col("event_id") % 10 != 0), "ivm_rw_base_src"
    )
    signed = ev.where(
        (F.col("event_id") % 10 == 0) | (F.col("event_id") % 17 == 0)
    ).select(
        "day",
        "hour",
        "event_type",
        F.when(F.col("event_id") % 10 == 0, F.lit(1))
        .otherwise(F.lit(-1))
        .alias("sign"),
        F.col("v"),
    )
    maintained = ivm.merge_rollup(
        rollup0, ivm.rollup_delta(signed, "ivm_rw_delta_src")
    )
    return (
        maintained.where(
            F.col("hour").isNull()
            & F.col("event_type").isNull()
            & F.col("day").between("2024-01-08", "2024-01-21")
        )
        .select(
            "day",
            F.col("n"),
            F.col("s").cast("double").alias("sum_value"),
        )
        .orderBy("day")
    )


@query(
    "golden_record_survivorship",
    oracle="""
    WITH ev AS (
      SELECT user_id,
             arg_max(event_type,
                     lpad(CAST(epoch_us(ts) + 4611686018427387904 AS VARCHAR),
                          20, '0')
                       || lpad(CAST(event_id AS VARCHAR), 12, '0')) AS status,
             MAX(epoch_us(ts)) AS last_seen_us,
             SUM(CAST(value AS DECIMAL(18,2))) AS activity,
             COUNT(*) AS n_events
      FROM events GROUP BY user_id),
    cust AS (
      SELECT c_custkey AS user_id, c_name, c_mktsegment,
             CAST(c_acctbal AS DECIMAL(18,2)) AS bal
      FROM customer)
    SELECT COALESCE(c.user_id, e.user_id) AS entity_id,
           CASE WHEN c.user_id IS NOT NULL AND e.user_id IS NOT NULL
                THEN 'both'
                WHEN c.user_id IS NOT NULL THEN 'customer_only'
                ELSE 'events_only' END AS presence,
           COALESCE(c.c_name, '<unresolved>') AS name,
           CASE WHEN c.user_id IS NOT NULL THEN 'customer' ELSE 'none' END
             AS name_src,
           COALESCE(e.status, 'inactive') AS status,
           CASE WHEN e.user_id IS NOT NULL THEN 'events' ELSE 'none' END
             AS status_src,
           CAST(COALESCE(c.bal, 0) + COALESCE(e.activity, 0) AS DOUBLE)
             AS worth,
           CAST(COALESCE(e.n_events, 0) AS BIGINT) AS n_events,
           CAST(COALESCE(e.last_seen_us, 0) AS BIGINT) AS last_seen_us
    FROM cust c FULL JOIN ev e ON c.user_id = e.user_id
    ORDER BY entity_id
    """,
)
def golden_record_survivorship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity-resolution GOLDEN RECORD with field-level survivorship
    and per-field provenance — the finishing move after matching:
    each entity's record is assembled from two systems with per-field
    precedence rules (identity fields survive from the dimension
    system, activity fields from the event system, champion status by
    most-recent (epoch+2^62, event_id) key — the bias convention of
    `timeseries_ohlc_bars`), every surviving field carries its source
    system (the lineage auditors ask for), and entities present in
    only one system still resolve with documented defaults. One
    map-side-combined per-entity aggregate on the event system + one
    full-outer key join — at 100 TB both sides shuffle once on the
    entity key (or bucket-co-locate), and the survivorship is pure
    projection, adding nothing to the exchange."""
    ev = load_table(spark, sf_dir, "events")
    sk = F.concat(
        F.lpad(
            (F.unix_micros("ts") + F.lit(4611686018427387904)).cast("string"),
            20,
            "0",
        ),
        F.lpad(F.col("event_id").cast("string"), 12, "0"),
    )
    ev_agg = (
        ev.select("user_id", "event_type", "ts", "value", sk.alias("sk"))
        .groupBy("user_id")
        .agg(
            F.expr("max_by(event_type, sk)").alias("status"),
            F.max(F.unix_micros("ts")).alias("last_seen_us"),
            F.sum(F.col("value").cast("decimal(18,2)")).alias("activity"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"),
        "c_name",
        "c_mktsegment",
        F.col("c_acctbal").cast("decimal(18,2)").alias("bal"),
    )
    c, e = cust.alias("c"), ev_agg.alias("e")
    joined = c.join(e, F.col("c.user_id") == F.col("e.user_id"), "full_outer")
    in_c, in_e = F.col("c.user_id").isNotNull(), F.col("e.user_id").isNotNull()
    return joined.select(
        F.coalesce(F.col("c.user_id"), F.col("e.user_id")).alias("entity_id"),
        F.when(in_c & in_e, "both")
        .when(in_c, "customer_only")
        .otherwise("events_only")
        .alias("presence"),
        F.coalesce(F.col("c.c_name"), F.lit("<unresolved>")).alias("name"),
        F.when(in_c, "customer").otherwise("none").alias("name_src"),
        F.coalesce(F.col("e.status"), F.lit("inactive")).alias("status"),
        F.when(in_e, "events").otherwise("none").alias("status_src"),
        (
            F.coalesce(F.col("c.bal"), F.lit(0).cast("decimal(18,2)"))
            + F.coalesce(F.col("e.activity"), F.lit(0).cast("decimal(18,2)"))
        ).cast("double").alias("worth"),
        F.coalesce(F.col("e.n_events"), F.lit(0)).cast("long").alias("n_events"),
        F.coalesce(F.col("e.last_seen_us"), F.lit(0))
        .cast("long")
        .alias("last_seen_us"),
    ).orderBy("entity_id")
