"""Remaining TPC-H operator shapes the synthetic schema can express
(no partsupp table exists, and lineitem lacks commit/receipt dates and
ship modes, so Q12/Q21/Q22 are re-targeted onto available columns while
keeping the classic plan shape: conditional aggregation over a join,
EXISTS + NOT-EXISTS on the same fact, scalar-subquery + anti-join).

Reference parity note: the reference implements no relational operators
(SURVEY.md §2 Part B; /root/reference/README.md:15-16 — the DataFusion
crate is TODO), so these cover the relational layer that crate would
have delegated to DataFusion, expressed as Catalyst-friendly DataFrame
plans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window

from ..sources.tables import load_table
from . import dsum, dsum_sql, query


@query(
    "q8_market_share",
    oracle="""
    SELECT CAST(EXTRACT(YEAR FROM o.o_orderdate) AS INT) AS o_year,
           CAST(SUM(CASE WHEN ns.n_name = 'NATION_7'
                         THEN CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4))
                         ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
             / CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4))) AS DOUBLE)
             AS mkt_share
    FROM lineitem l
    JOIN orders o    ON l.l_orderkey = o.o_orderkey
    JOIN part p      ON p.p_partkey = l.l_partkey
    JOIN supplier s  ON s.s_suppkey = l.l_suppkey
    JOIN nation ns   ON ns.n_nationkey = s.s_nationkey
    JOIN customer c  ON c.c_custkey = o.o_custkey
    JOIN nation nc   ON nc.n_nationkey = c.c_nationkey
    JOIN region r    ON r.r_regionkey = nc.n_regionkey
    WHERE r.r_name = 'ASIA'
      AND p.p_type = 'ECONOMY'
      AND o.o_orderdate >= DATE '1995-01-01'
      AND o.o_orderdate < DATE '1997-01-01'
    GROUP BY 1 ORDER BY 1
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 (national market share): the widest dimension fan —
    lineitem joined to orders plus four broadcast dim chains (part,
    supplier→nation, customer→nation→region). Share = conditional sum /
    total sum in ONE aggregation pass, not two query branches. Only the
    lineitem⋈orders edge may shuffle at scale; every dim side is hinted
    broadcast, and the region/p_type filters prune before the fact join.
    """
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    p = load_table(spark, sf_dir, "part").where(F.col("p_type") == "ECONOMY")
    s = load_table(spark, sf_dir, "supplier")
    ns = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("ns_key"), F.col("n_name").alias("supp_nation")
    )
    c = load_table(spark, sf_dir, "customer")
    nc = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")

    cust_asia = (
        c.join(F.broadcast(nc), c.c_nationkey == nc.n_nationkey)
        .join(F.broadcast(r), nc.n_regionkey == r.r_regionkey)
        .select("c_custkey")
    )
    supp_nation = s.join(F.broadcast(ns), s.s_nationkey == F.col("ns_key")).select(
        "s_suppkey", "supp_nation"
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    vol_dec = vol.cast("decimal(18,4)")
    zero_dec = F.lit(0).cast("decimal(18,4)")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(supp_nation), li.l_suppkey == F.col("s_suppkey"))
        .join(F.broadcast(cust_asia), o.o_custkey == F.col("c_custkey"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            (
                F.sum(
                    F.when(F.col("supp_nation") == "NATION_7", vol_dec).otherwise(zero_dec)
                ).cast("double")
                / F.sum(vol_dec).cast("double")
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


@query(
    "q12_priority_lines",
    oracle="""
    SELECT l.l_returnflag,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
      AND l.l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY 1 ORDER BY 1
    """,
)
def q12_priority_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (shipping-mode priority, re-keyed on returnflag
    since the synthetic lineitem has no l_shipmode): join then
    conditional aggregation — both CASE branches computed in one pass
    over the joined rows, no second scan. The shipdate range filter
    pushes to the lineitem scan BEFORE the join, so only ~1/7 of the
    fact table reaches the shuffle."""
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    is_high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(is_high, 1).otherwise(0)).cast("long").alias("high_line_count"),
            F.sum(F.when(is_high, 0).otherwise(1)).cast("long").alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "q13_customer_distribution",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
          FROM customer c LEFT OUTER JOIN orders o
            ON c.c_custkey = o.o_custkey
           AND o.o_orderpriority <> '1-URGENT'
          GROUP BY c.c_custkey) t
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 (customer order-count distribution): LEFT OUTER join
    whose non-equi residual lives in the ON clause (NOT the WHERE — a
    WHERE would turn it inner and drop zero-order customers), then a
    two-level aggregation. COUNT(o_orderkey) counts only matched rows.
    The second agg groups on the tiny (customer-cardinality) result, so
    only the first shuffle moves real data."""
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_orderpriority"
    )
    per_cust = (
        c.join(
            o,
            (c.c_custkey == o.o_custkey) & (o.o_orderpriority != "1-URGENT"),
            "left_outer",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


@query(
    "q17_small_quantity_revenue",
    oracle=f"""
    SELECT {dsum_sql("l_extendedprice", "sum_price", 2)},
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM (SELECT l.l_extendedprice, l.l_quantity,
                 AVG(l.l_quantity) OVER (PARTITION BY l.l_partkey) AS avg_qty
          FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
          WHERE p.p_brand = 'Brand#11') t
    WHERE l_quantity < 0.5 * avg_qty
    """,
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape (small-quantity-order revenue): the classic
    correlated AVG subquery becomes a window average over the
    brand-filtered join — ONE shuffle on l_partkey instead of a
    separate aggregate + self-join that would re-read lineitem (a
    round-1 lesson: self-joins re-evaluate lineage unless the exchange
    is reused). The broadcast part filter prunes ~96% of lineitem
    before the window shuffle."""
    p = load_table(spark, sf_dir, "part").where(F.col("p_brand") == "Brand#11")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    w = Window.partitionBy("l_partkey")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .withColumn("avg_qty", F.avg("l_quantity").over(w))
        .where(F.col("l_quantity") < 0.5 * F.col("avg_qty"))
        .agg(
            dsum("l_extendedprice", "sum_price", 2),
            F.count(F.lit(1)).cast("long").alias("n_lines"),
        )
    )


@query(
    "q19_disjunctive_revenue",
    oracle=f"""
    SELECT {dsum_sql("l.l_extendedprice * (1 - l.l_discount)", "revenue", 4)},
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#11' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 1 AND 20)
       OR (p.p_brand = 'Brand#22' AND p.p_size BETWEEN 1 AND 25
           AND l.l_quantity BETWEEN 10 AND 30)
       OR (p.p_brand = 'Brand#33' AND p.p_size BETWEEN 1 AND 40
           AND l.l_quantity BETWEEN 20 AND 40)
    """,
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 (discounted revenue, disjunctive predicates): an OR of
    three brand/size/quantity conjunct groups straddling both join
    sides. The full OR can't push below the join, so we ALSO apply the
    per-side disjunct envelopes (p_brand IN (...) ∧ p_size ≤ 40;
    1 ≤ l_quantity ≤ 40) — those reach the parquet scans as
    PushedFilters while the exact OR evaluates post-join. Part side
    broadcasts after its envelope prune."""
    brands = ("Brand#11", "Brand#22", "Brand#33")
    p = load_table(spark, sf_dir, "part").where(
        F.col("p_brand").isin(*brands) & (F.col("p_size") >= 1) & (F.col("p_size") <= 40)
    )
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_quantity") >= 1) & (F.col("l_quantity") <= 40)
    )
    arm = lambda b, smax, qlo, qhi: (  # noqa: E731
        (F.col("p_brand") == b)
        & (F.col("p_size") <= smax)
        & (F.col("l_quantity") >= qlo)
        & (F.col("l_quantity") <= qhi)
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .where(arm("Brand#11", 15, 1, 20) | arm("Brand#22", 25, 10, 30) | arm("Brand#33", 40, 20, 40))
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue", 4),
            F.count(F.lit(1)).cast("long").alias("n_lines"),
        )
    )


@query(
    "q21_waiting_suppliers",
    oracle="""
    WITH late AS (
      SELECT DISTINCT l.l_suppkey, l.l_orderkey
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      WHERE l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
    SELECT s.s_name, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM late t JOIN supplier s ON s.s_suppkey = t.l_suppkey
    WHERE EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = t.l_orderkey
                    AND l2.l_suppkey <> t.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM late t2
                      WHERE t2.l_orderkey = t.l_orderkey
                        AND t2.l_suppkey <> t.l_suppkey)
    GROUP BY s.s_name
    ORDER BY numwait DESC, s_name
    LIMIT 20
    """,
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (suppliers who kept orders waiting; "late" means
    shipped >60 days after order date since the synthetic schema lacks
    commit/receipt dates). The classic EXISTS + NOT-EXISTS pair over the
    same fact is rewritten as ONE aggregation per order — total distinct
    suppliers and distinct LATE suppliers — so lineitem shuffles once on
    l_orderkey instead of three times (semi + anti would each reshuffle
    it). The sole late supplier of a multi-supplier order is "waiting":
    total_supps > 1 ∧ late_supps = 1."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    late_flag = F.col("l_shipdate") > F.date_add(
        F.col("o_orderdate").cast("date"), 60
    ).cast("timestamp")
    per_order = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey")
        .agg(
            F.countDistinct("l_suppkey").alias("total_supps"),
            F.countDistinct(F.when(late_flag, F.col("l_suppkey"))).alias("late_supps"),
            F.max(F.when(late_flag, F.col("l_suppkey"))).alias("sole_late_supp"),
        )
        .where((F.col("total_supps") > 1) & (F.col("late_supps") == 1))
    )
    return (
        per_order.join(F.broadcast(s), per_order.sole_late_supp == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).cast("long").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(20)
    )


@query(
    "q22_dormant_high_balance",
    oracle="""
    SELECT c.c_mktsegment, CAST(COUNT(*) AS BIGINT) AS numcust,
           CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
    FROM customer c
    WHERE c.c_acctbal > (SELECT AVG(c_acctbal) FROM customer WHERE c_acctbal > 0)
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderpriority = '1-URGENT')
    GROUP BY 1 ORDER BY 1
    """,
)
def q22_dormant_high_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (global sales opportunity; keyed on mktsegment
    since the synthetic customer has no phone column): a scalar
    subquery — the global positive-balance average — stays in-plan as a
    broadcast 1-row cross join (never .collect()'d to the driver), and
    NOT EXISTS becomes a left-anti join against the urgent-orders
    projection. The anti join's build side is pre-filtered and
    key-projected so at scale it shuffles only (custkey) pairs."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") == "1-URGENT"
    ).select("o_custkey")
    avg_bal = (
        c.where(F.col("c_acctbal") > 0)
        .agg(F.avg("c_acctbal").alias("avg_bal"))
    )
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("avg_bal"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).cast("long").alias("numcust"),
            dsum("c_acctbal", "totacctbal", 2),
        )
        .orderBy("c_mktsegment")
    )
