"""Relational-layer queries (SURVEY.md §2 Part B) — the operator
categories the reference's never-written DataFusion crate would have
delegated: scans, filters, joins (broadcast/shuffle, semi/anti),
aggregations (incl. distinct, rollup, cube), windows (ranking, frames,
lag/lead), sorts/limits/top-k, set ops, scalar functions.

Every query is stock declarative DataFrame API — Catalyst supplies
pushdown, pruning, join selection, partial aggregation, AQE. Scale
notes are per-query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load_table
from . import davg, davg_sql, dsum, dsum_sql, isum, isum_sql, query


@query(
    "q1_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {dsum_sql("l_quantity", "sum_qty")},
           {dsum_sql("l_extendedprice", "sum_base_price")},
           {dsum_sql("l_extendedprice * (1 - l_discount)", "sum_disc_price", 4)},
           {dsum_sql("l_extendedprice * (1 - l_discount) * (1 + l_tax)", "sum_charge", 6)},
           {davg_sql("l_quantity", "avg_qty")},
           {davg_sql("l_extendedprice", "avg_price")},
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan-heavy groupBy with 6 aggregates over 2
    low-cardinality keys. At 100 TB this is the map-side-combine
    showcase — partial aggs shrink the shuffle to (#keys x #tasks)
    rows; the date filter reaches the parquet scan as a PushedFilter.
    """
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity", "sum_qty"),
            dsum("l_extendedprice", "sum_base_price"),
            dsum(disc_price, "sum_disc_price", 4),
            dsum(charge, "sum_charge", 6),
            davg("l_quantity", "avg_qty"),
            davg("l_extendedprice", "avg_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@query(
    "q3_shipping_priority",
    oracle=f"""
    SELECT l.l_orderkey,
           {dsum_sql("l.l_extendedprice * (1 - l.l_discount)", "revenue", 4)},
           strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate
    FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
                    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-03-15'
      AND l.l_shipdate > TIMESTAMP '1998-03-15'
    GROUP BY l.l_orderkey, o.o_orderdate
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective dim filter → join → agg → top-k.

    Scale: customer(filtered) is the dimension → broadcast it; the
    date filter keeps ~half of ORDERS (a fact table — hinting it
    broadcast would OOM the executors at 100 TB), so orders⋈lineitem
    shuffles on orderkey once and the groupBy reuses that partitioning
    (hashpartitioning(l_orderkey) satisfies the (l_orderkey,
    o_orderdate) clustering — no second exchange). AQE is free to
    promote the join to broadcast at small SF; we don't force it.
    LIMIT after ORDER BY is a TakeOrderedAndProject — no global sort.
    """
    c = load_table(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    l = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp")
    )
    return (
        l.join(o.join(F.broadcast(c), o.o_custkey == c.c_custkey),
               l.l_orderkey == F.col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue", 4))
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
        )
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


@query(
    "q5_local_supplier_volume",
    oracle=f"""
    SELECT n.n_name,
           {dsum_sql("l.l_extendedprice * (1 - l.l_discount)", "revenue", 4)}
    FROM customer c
      JOIN orders o   ON c.c_custkey = o.o_custkey
      JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
      JOIN nation n   ON s.s_nationkey = n.n_nationkey
      JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate <  TIMESTAMP '1997-01-01'
    GROUP BY n.n_name
    ORDER BY revenue DESC, n_name
    """,
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-table star join. All dimensions (region,
    nation, supplier, customer) broadcast; only orders⋈lineitem is a
    shuffle join. Catalyst + AQE pick this automatically for the small
    sides, but we hint broadcast explicitly so the plan is stable when
    dim-table stats are missing at 100 TB."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(s),
            (l.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue", 4))
        .orderBy(F.desc("revenue"), "n_name")
    )


@query(
    "join_semi_anti",
    oracle="""
    WITH with_orders AS (SELECT DISTINCT o_custkey FROM orders)
    SELECT c_mktsegment,
           CAST(COUNT(*) FILTER (WHERE w.o_custkey IS NOT NULL) AS BIGINT) AS n_with_orders,
           CAST(COUNT(*) FILTER (WHERE w.o_custkey IS NULL) AS BIGINT) AS n_without_orders
    FROM customer c LEFT JOIN with_orders w ON c.c_custkey = w.o_custkey
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
)
def join_semi_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI + LEFT ANTI joins (reference: absent; Part B row 4).

    Scale: semi/anti against a distinct-key build side broadcasts when
    small; at 100 TB Spark rewrites to a shuffled hash semi-join with
    only the key column shuffled — never materialize the DISTINCT."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    semi = (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_with_orders"))
    )
    anti = (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_without_orders"))
    )
    return (
        semi.join(anti, "c_mktsegment", "full_outer")
        .select(
            "c_mktsegment",
            F.coalesce("n_with_orders", F.lit(0)).alias("n_with_orders"),
            F.coalesce("n_without_orders", F.lit(0)).alias("n_without_orders"),
        )
        .orderBy("c_mktsegment")
    )


@query(
    "window_top3_orders_per_customer",
    oracle="""
    SELECT o_custkey, o_orderkey, rnk FROM (
      SELECT o_custkey, o_orderkey,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rnk
      FROM orders)
    WHERE rnk <= 3
    ORDER BY o_custkey, rnk
    """,
)
def window_top3_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group top-k via ranking window (Part B row 6). Scale: one
    shuffle on the partition key; rank+filter avoids a global sort.
    The ORDER BY includes the key → fully deterministic ranks."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), "o_orderkey")
    return (
        o.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= 3)
        .select("o_custkey", "o_orderkey", "rnk")
        .orderBy("o_custkey", "rnk")
    )


@query(
    "window_running_total",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                OVER (PARTITION BY o_custkey
                      ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS DOUBLE) AS running_spend
    FROM orders
    ORDER BY o_custkey, o_orderkey
    """,
)
def window_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running-frame window (rowsBetween): cumulative customer spend.
    Decimal accumulator keeps the running sum exact and engine-agnostic."""
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).over(w).cast("double").alias("running_spend"),
    ).orderBy("o_custkey", "o_orderkey")


@query(
    "window_lag_lead_events",
    oracle="""
    SELECT event_id, user_id,
           epoch_us(ts) - LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS gap_us,
           LEAD(event_type) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS next_type
    FROM events
    ORDER BY event_id
    """,
)
def window_lag_lead_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead over per-user event time — sessionization primitive.
    Compares at microsecond precision: DuckDB's TIMESTAMP floors the
    parquet NANOS to micros on read; Spark keeps raw nanos (bigint),
    floored here with integer division."""
    ev = load_table(spark, sf_dir, "events")
    # unix_micros on the normalized TIMESTAMP — integer micros, exact
    # (double division would lose precision above 2^53)
    ev = ev.withColumn("ts_us", F.unix_micros(F.col("ts")))
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    return ev.select(
        "event_id",
        "user_id",
        (F.col("ts_us") - F.lag("ts_us").over(w)).alias("gap_us"),
        F.lead("event_type").over(w).alias("next_type"),
    ).orderBy("event_id")


@query(
    "rollup_order_status",
    oracle=f"""
    SELECT o_orderstatus, o_orderpriority,
           GROUPING(o_orderstatus) AS g_status,
           GROUPING(o_orderpriority) AS g_priority,
           COUNT(*) AS n,
           {dsum_sql("o_totalprice", "total")}
    FROM orders
    GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
    ORDER BY g_status, g_priority, o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
    """,
)
def rollup_order_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP with GROUPING() disambiguation of the null markers."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.grouping("o_orderstatus").cast("int").alias("g_status"),
            F.grouping("o_orderpriority").cast("int").alias("g_priority"),
            F.count(F.lit(1)).alias("n"),
            dsum("o_totalprice", "total"),
        )
        .select("o_orderstatus", "o_orderpriority", "g_status", "g_priority", "n", "total")
        .orderBy(
            "g_status",
            "g_priority",
            F.col("o_orderstatus").asc_nulls_first(),
            F.col("o_orderpriority").asc_nulls_first(),
        )
    )


@query(
    "cube_lineitem_flags",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           GROUPING(l_returnflag) AS g_flag,
           GROUPING(l_linestatus) AS g_status,
           COUNT(*) AS n
    FROM lineitem
    GROUP BY CUBE(l_returnflag, l_linestatus)
    ORDER BY g_flag, g_status, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
    """,
)
def cube_lineitem_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over the two lineitem flags — all 2^2 grouping sets."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.grouping("l_returnflag").cast("int").alias("g_flag"),
            F.grouping("l_linestatus").cast("int").alias("g_status"),
            F.count(F.lit(1)).alias("n"),
        )
        .select("l_returnflag", "l_linestatus", "g_flag", "g_status", "n")
        .orderBy(
            "g_flag",
            "g_status",
            F.col("l_returnflag").asc_nulls_first(),
            F.col("l_linestatus").asc_nulls_first(),
        )
    )


@query(
    "setops_nation_coverage",
    oracle="""
    SELECT 'both' AS side, CAST(n_nationkey AS BIGINT) AS nationkey
    FROM (SELECT n_nationkey FROM nation WHERE n_nationkey IN (SELECT c_nationkey FROM customer)
          INTERSECT
          SELECT n_nationkey FROM nation WHERE n_nationkey IN (SELECT s_nationkey FROM supplier))
    UNION ALL
    SELECT 'customer_only' AS side, CAST(n_nationkey AS BIGINT) AS nationkey
    FROM (SELECT DISTINCT c_nationkey AS n_nationkey FROM customer
          EXCEPT
          SELECT DISTINCT s_nationkey FROM supplier)
    ORDER BY side, nationkey
    """,
)
def setops_nation_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT / EXCEPT / UNION ALL (Part B row 8)."""
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").cast("long").alias("nationkey")
    ).distinct()
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").cast("long").alias("nationkey")
    ).distinct()
    both = c.intersect(s).select(F.lit("both").alias("side"), "nationkey")
    cust_only = c.exceptAll(s).select(F.lit("customer_only").alias("side"), "nationkey")
    return both.unionAll(cust_only).orderBy("side", "nationkey")


@query(
    "topk_expensive_parts",
    oracle="""
    SELECT p_partkey, p_name, p_retailprice
    FROM part
    ORDER BY p_retailprice DESC, p_partkey
    LIMIT 20
    """,
)
def topk_expensive_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k: ORDER BY + LIMIT compiles to TakeOrderedAndProject
    (per-partition heap + driver merge) — no full sort at any scale."""
    p = load_table(spark, sf_dir, "part")
    return (
        p.select("p_partkey", "p_name", "p_retailprice")
        .orderBy(F.desc("p_retailprice"), "p_partkey")
        .limit(20)
    )


@query(
    "distinct_agg_suppliers",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS n_supp,
           CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_part,
           COUNT(*) AS n_rows
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def distinct_agg_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-distinct aggregation — Catalyst expands to a single-pass
    expand+aggregate; no per-distinct re-scan."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_suppkey").alias("n_supp"),
            F.countDistinct("l_partkey").alias("n_part"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "scalar_functions_showcase",
    oracle="""
    SELECT p_partkey,
           UPPER(p_name) AS name_upper,
           LENGTH(p_name) AS name_len,
           SUBSTRING(p_brand, 7, 2) AS brand_id,
           REPLACE(p_type, ' ', '_') AS type_key,
           CAST(FLOOR(p_retailprice) AS BIGINT) AS price_floor,
           CAST(CEIL(p_retailprice) AS BIGINT) AS price_ceil,
           p_size % 5 AS size_mod,
           CONCAT(p_brand, ':', CAST(p_size AS VARCHAR)) AS brand_size
    FROM part
    ORDER BY p_partkey
    """,
)
def scalar_functions_showcase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar string/math surface (Part B row 10) — engine-agnostic
    subset (no ROUND: Spark HALF_UP vs DuckDB HALF_EVEN differ)."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.length("p_name").cast("long").alias("name_len"),
        F.substring("p_brand", 7, 2).alias("brand_id"),
        F.replace(F.col("p_type"), F.lit(" "), F.lit("_")).alias("type_key"),
        F.floor("p_retailprice").cast("long").alias("price_floor"),
        F.ceil("p_retailprice").cast("long").alias("price_ceil"),
        (F.col("p_size") % 5).cast("int").alias("size_mod"),
        F.concat(F.col("p_brand"), F.lit(":"), F.col("p_size").cast("string")).alias("brand_size"),
    ).orderBy("p_partkey")


@query(
    "date_functions_orders",
    oracle="""
    SELECT CAST(year(o_orderdate) AS INT) AS yr,
           CAST(month(o_orderdate) AS INT) AS mo,
           COUNT(*) AS n,
           CAST(MIN(o_orderkey) AS BIGINT) AS first_key
    FROM orders
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
)
def date_functions_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date extraction + grouping (Part B scalar date functions)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy(
            F.year("o_orderdate").cast("int").alias("yr"),
            F.month("o_orderdate").cast("int").alias("mo"),
        )
        .agg(F.count(F.lit(1)).alias("n"), F.min("o_orderkey").alias("first_key"))
        .orderBy("yr", "mo")
    )


@query(
    "array_hof_showcase",
    oracle="""
    WITH g AS (
      SELECT l_orderkey, list_sort(list(CAST(l_quantity AS INT))) AS qtys
      FROM lineitem GROUP BY l_orderkey
    )
    SELECT l_orderkey,
           CAST(len(qtys) AS INT) AS n_items,
           CAST(list_sum(qtys) AS BIGINT) AS total_qty,
           CAST(len(list_filter(qtys, x -> x > 25)) AS INT) AS n_large,
           CAST(qtys[1] AS INT) AS min_qty,
           CAST(qtys[-1] AS INT) AS max_qty,
           CAST(list_sum(list_transform(qtys, x -> x * x)) AS BIGINT) AS sum_sq,
           CAST(len(list_filter(qtys, x -> x <= 0)) = 0 AS BOOLEAN) AS all_positive
    FROM g ORDER BY l_orderkey
    """,
)
def array_hof_showcase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array functions (Part B scalar surface): collect →
    sort_array for a deterministic element order, then transform /
    filter / aggregate / forall run as JVM codegen'd lambda
    expressions — the idiomatic replacement for exploding an array to
    rows and re-grouping (which would cost a second shuffle). One
    groupBy shuffle; every HOF is a per-row projection after it."""
    li = load_table(spark, sf_dir, "lineitem")
    g = li.groupBy("l_orderkey").agg(
        F.sort_array(F.collect_list(F.col("l_quantity").cast("int"))).alias("qtys")
    )
    zero = F.lit(0).cast("long")
    return g.select(
        "l_orderkey",
        F.size("qtys").alias("n_items"),
        F.aggregate("qtys", zero, lambda a, x: a + x).alias("total_qty"),
        F.size(F.filter("qtys", lambda x: x > 25)).alias("n_large"),
        F.element_at("qtys", 1).alias("min_qty"),
        F.element_at("qtys", -1).alias("max_qty"),
        F.aggregate("qtys", zero, lambda a, x: a + x * x).alias("sum_sq"),
        F.forall("qtys", lambda x: x > 0).alias("all_positive"),
    ).orderBy("l_orderkey")


@query(
    "lateral_join_top2_per_nation",
    oracle="""
    SELECT n.n_name, l.c_custkey, l.c_acctbal
    FROM nation n
    JOIN LATERAL (
      SELECT c_custkey, c_acctbal FROM customer c
      WHERE c.c_nationkey = n.n_nationkey
      ORDER BY c_acctbal DESC, c_custkey LIMIT 2
    ) l ON TRUE
    ORDER BY n.n_name, l.c_acctbal DESC, l.c_custkey
    """,
)
def lateral_join_top2_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL join (SQL surface): per-nation top-2
    customers by balance, expressed as a LATERAL subquery with its own
    ORDER BY ... LIMIT. Catalyst decorrelates it into the same
    window/top-k shape a hand-written row_number query plans — the
    point is the SQL front door exists and optimizes; no per-nation
    re-scan survives in the physical plan."""
    from ..sources.tables import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT n.n_name, l.c_custkey, l.c_acctbal
        FROM nation n
        JOIN LATERAL (
          SELECT c_custkey, c_acctbal FROM customer c
          WHERE c.c_nationkey = n.n_nationkey
          ORDER BY c_acctbal DESC, c_custkey LIMIT 2
        ) l
        ORDER BY n.n_name, l.c_acctbal DESC, l.c_custkey
        """
    )


@query(
    "recursive_cte_key_tree",
    oracle="""
    WITH RECURSIVE walk(k, root, depth) AS (
      SELECT c_custkey, c_custkey, 0 FROM customer WHERE c_custkey < 2
      UNION ALL
      SELECT c.c_custkey, w.root, w.depth + 1
      FROM customer c JOIN walk w ON c.c_custkey // 2 = w.k
      WHERE c.c_custkey >= 2
    )
    SELECT depth, COUNT(*) AS n, CAST(SUM(k) AS BIGINT) AS key_sum
    FROM walk GROUP BY depth ORDER BY depth
    """,
)
def recursive_cte_key_tree(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (Spark 4 WITH RECURSIVE): walk the implicit
    binary tree parent(k)=k DIV 2 over customer keys, emitting each
    node's depth — the declarative twin of the hand-rolled iterative
    loop in dedup_connected_components. Scale: each of the log2(N)
    iterations is one distributed join of the frontier against the
    base table (the frontier is broadcast-able once small); no driver
    materialization of intermediate levels. DuckDB runs the identical
    statement (`//` vs DIV integer division is the only dialect
    difference)."""
    from ..sources.tables import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        WITH RECURSIVE walk(k, root, depth) AS (
          SELECT c_custkey, c_custkey, 0 FROM customer WHERE c_custkey < 2
          UNION ALL
          SELECT c.c_custkey, w.root, w.depth + 1
          FROM customer c JOIN walk w ON c.c_custkey DIV 2 = w.k
          WHERE c.c_custkey >= 2
        )
        SELECT depth, COUNT(*) AS n, CAST(SUM(k) AS BIGINT) AS key_sum
        FROM walk GROUP BY depth ORDER BY depth
        """
    )
