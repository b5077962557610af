"""The last TPC-H plan shapes the synthetic schema can express: Q2,
Q11, Q16, Q20 — all four reference `partsupp`, which the driver's
schema lacks, so the part↔supplier catalog is *derived from lineitem*
(``min(l_extendedprice)`` per (partkey, suppkey) stands in for
``ps_supplycost``; shipped quantity stands in for ``ps_availqty``).
``min`` over doubles is order-independent, so the derived cost is
bit-deterministic across engines — no decimal laundering needed.

Plus ``global_sort_rank``: a *distributed* global total-order rank.
The naive formulation — ``row_number() OVER (ORDER BY …)`` with no
PARTITION BY — collapses onto ONE task and is the canonical Spark
scale anti-pattern. Ours range-partitions, ranks within partitions,
and shifts by cumulative partition counts (the per-partition count
vector is tiny — one long per partition — so driver collect is fine at
any scale).

Reference parity note: the reference has no relational layer at all
(/root/reference/README.md:15-16 — the DataFusion crate is TODO);
these fill SURVEY.md §2 Part B join/agg/subquery categories.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load_table
from . import dsum, dsum_sql, query

# Derived partsupp: the cheapest observed sale of a part by a supplier.
_PARTSUPP_SQL = """
    SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
           MIN(l_extendedprice) AS ps_supplycost
    FROM lineitem GROUP BY 1, 2
"""


def _derived_partsupp(li: DataFrame) -> DataFrame:
    return li.groupBy(
        F.col("l_partkey").alias("ps_partkey"),
        F.col("l_suppkey").alias("ps_suppkey"),
    ).agg(F.min("l_extendedprice").alias("ps_supplycost"))


@query(
    "q2_min_cost_supplier",
    oracle=f"""
    WITH partsupp AS ({_PARTSUPP_SQL}),
    eligible AS (
        SELECT s.s_acctbal, s.s_name, n.n_name, p.p_partkey, p.p_name,
               ps.ps_supplycost
        FROM partsupp ps
        JOIN part p     ON p.p_partkey = ps.ps_partkey
        JOIN supplier s ON s.s_suppkey = ps.ps_suppkey
        JOIN nation n   ON n.n_nationkey = s.s_nationkey
        JOIN region r   ON r.r_regionkey = n.n_regionkey
        WHERE r.r_name = 'EUROPE' AND p.p_size <= 25 AND p.p_type = 'STANDARD'
    )
    SELECT s_acctbal, s_name, n_name, p_partkey, p_name,
           ps_supplycost AS supplycost
    FROM (SELECT *, MIN(ps_supplycost) OVER (PARTITION BY p_partkey) AS mc
          FROM eligible)
    WHERE ps_supplycost = mc
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    LIMIT 20
    """,
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 (minimum-cost supplier): correlated MIN subquery — for
    each European STANDARD part, the supplier(s) offering the lowest
    derived supply cost. The correlated ``= (SELECT MIN …)`` becomes a
    window MIN over the part key: ONE shuffle on ps_partkey, versus the
    self-join formulation's two (agg + join back). part / supplier /
    nation / region are all broadcast dims; the p_size + p_type + region
    filters prune before the window so only eligible rows shuffle.
    """
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").where(
        (F.col("p_size") <= 25) & (F.col("p_type") == "STANDARD")
    )
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")

    supp_eu = s.join(
        F.broadcast(n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)),
        s.s_nationkey == n.n_nationkey,
    ).select("s_suppkey", "s_acctbal", "s_name", "n_name")

    eligible = (
        _derived_partsupp(li)
        .join(F.broadcast(p), F.col("ps_partkey") == p.p_partkey)
        .join(F.broadcast(supp_eu), F.col("ps_suppkey") == F.col("s_suppkey"))
    )
    w = Window.partitionBy("p_partkey")
    return (
        eligible.withColumn("mc", F.min("ps_supplycost").over(w))
        .where(F.col("ps_supplycost") == F.col("mc"))
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            "p_partkey",
            "p_name",
            F.col("ps_supplycost").alias("supplycost"),
        )
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(20)
    )


@query(
    "q11_important_parts",
    oracle=f"""
    WITH partsupp AS ({_PARTSUPP_SQL}),
    scoped AS (
        SELECT ps.ps_partkey, ps.ps_supplycost
        FROM partsupp ps
        JOIN supplier s ON s.s_suppkey = ps.ps_suppkey
        JOIN nation n   ON n.n_nationkey = s.s_nationkey
        WHERE n.n_name IN ('NATION_3', 'NATION_7')
    )
    SELECT ps_partkey AS p_partkey,
           {dsum_sql('ps_supplycost', 'part_value', 4)}
    FROM scoped
    GROUP BY 1
    -- x1000 keeps the 0.1% threshold compare exact-decimal on both
    -- engines (a double 0.001 multiplier would make boundary rows
    -- engine-dependent)
    HAVING SUM(CAST(ps_supplycost AS DECIMAL(18,4))) * 1000 >
           (SELECT SUM(CAST(ps_supplycost AS DECIMAL(18,4)))
            FROM scoped)
    ORDER BY part_value DESC, p_partkey
    """,
)
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 (important stock): per-part catalog value for two
    nations' suppliers, keeping parts worth > 0.1% of the total — a
    grouped agg filtered against a SCALAR subquery over the same input.
    (TPC-H specifies FRACTION = 0.0001/SF; 0.1% keeps the driver's
    sf0.01 check non-empty — a 0-row hash match would exercise neither
    the scalar-subquery compare nor the sort.)
    The scoped relation is computed once and reused for both the group
    agg and the global total (Spark caches nothing here, but both aggs
    are partial/map-side combinable, and the 1-row total joins in via
    broadcast-cross-join, never a shuffle).
    """
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").where(
        F.col("n_name").isin("NATION_3", "NATION_7")
    )
    scoped = (
        _derived_partsupp(li)
        .join(
            F.broadcast(
                s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey).select(
                    "s_suppkey"
                )
            ),
            F.col("ps_suppkey") == F.col("s_suppkey"),
        )
        .select("ps_partkey", F.col("ps_supplycost").cast("decimal(18,4)").alias("v"))
    )
    per_part = scoped.groupBy(F.col("ps_partkey").alias("p_partkey")).agg(
        F.sum("v").alias("vsum")
    )
    total = scoped.agg(F.sum("v").alias("total_value"))
    return (
        per_part.join(F.broadcast(total))
        .where(F.col("vsum") * 1000 > F.col("total_value"))
        .select("p_partkey", F.col("vsum").cast("double").alias("part_value"))
        .orderBy(F.desc("part_value"), "p_partkey")
    )


@query(
    "q16_supplier_variety",
    oracle=f"""
    WITH partsupp AS ({_PARTSUPP_SQL})
    SELECT p.p_brand, p.p_type, p.p_size,
           COUNT(DISTINCT ps.ps_suppkey) AS supplier_cnt
    FROM partsupp ps
    JOIN part p ON p.p_partkey = ps.ps_partkey
    WHERE p.p_brand <> 'Brand#1'
      AND p.p_type NOT IN ('PROMO', 'ECONOMY')
      AND p.p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
      AND ps.ps_suppkey NOT IN
          (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY 1, 2, 3
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
)
def q16_supplier_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 (part/supplier variety): COUNT(DISTINCT supplier) per
    part attribute triple, with a NOT-IN exclusion of bad suppliers.
    The NOT IN becomes a broadcast LEFT ANTI join (never a shuffle —
    the exclusion list is tiny at any scale); distinct-count shuffles
    once on the (brand, type, size) grouping key with partial distinct
    done map-side by Catalyst's two-phase distinct-agg expansion.
    """
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#1")
        & (~F.col("p_type").isin("PROMO", "ECONOMY"))
        & (F.col("p_size").isin(1, 9, 14, 19, 23, 36, 45, 49))
    )
    bad = (
        load_table(spark, sf_dir, "supplier")
        .where(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    return (
        _derived_partsupp(li)
        .join(F.broadcast(bad), F.col("ps_suppkey") == F.col("s_suppkey"), "left_anti")
        .join(F.broadcast(p), F.col("ps_partkey") == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("ps_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


@query(
    "q20_dominant_suppliers",
    oracle="""
    WITH shipped AS (
        SELECT l.l_partkey, l.l_suppkey,
               SUM(CAST(l.l_quantity AS DECIMAL(18,2))) AS qty
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey
        WHERE p.p_name LIKE 'large%'
        GROUP BY 1, 2
    ),
    dominant AS (
        SELECT DISTINCT l_suppkey FROM (
            SELECT l_suppkey, qty,
                   SUM(qty) OVER (PARTITION BY l_partkey) AS part_total,
                   COUNT(*) OVER (PARTITION BY l_partkey) AS n_supp
            FROM shipped)
        WHERE qty > 2.5 * part_total / n_supp
    )
    SELECT s.s_name, n.n_name
    FROM supplier s
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE s.s_suppkey IN (SELECT l_suppkey FROM dominant)
    ORDER BY s.s_name
    """,
)
def q20_dominant_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 (potential part promotion): suppliers who shipped more
    than 2.5× the average supplier's share of some 'large…' part's
    volume (scale-invariant dominance — a fixed share threshold empties
    out as supplier count grows with SF). Nested-aggregate
    shape: per-(part, supplier) quantity, window total per part, ratio
    filter, then a SEMI join back to supplier (the IN-subquery). The
    part filter is a broadcast prune BEFORE the first agg, so the
    shuffle carries only 'large%' rows; the window reuses the agg's
    partitioning ONLY if keys align — here they don't (pair key vs part
    key), so it's agg-shuffle + window-shuffle, both on pruned data.
    """
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").where(F.col("p_name").like("large%"))
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")

    shipped = (
        li.join(F.broadcast(p.select("p_partkey")), li.l_partkey == F.col("p_partkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("qty"))
    )
    w = Window.partitionBy("l_partkey")
    dominant = (
        shipped.withColumn("part_total", F.sum("qty").over(w))
        .withColumn("n_supp", F.count(F.lit(1)).over(w))
        .where(F.col("qty") > F.lit(2.5) * F.col("part_total") / F.col("n_supp"))
        .select("l_suppkey")
        .distinct()
    )
    return (
        s.join(F.broadcast(dominant), s.s_suppkey == F.col("l_suppkey"), "left_semi")
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select("s_name", "n_name")
        .orderBy("s_name")
    )


@query(
    "global_sort_rank",
    oracle="""
    SELECT rank, o_orderkey, o_totalprice FROM (
        SELECT CAST(ROW_NUMBER() OVER
                 (ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rank,
               o_orderkey, o_totalprice
        FROM orders)
    WHERE (rank - 1) % 100 = 0
    ORDER BY rank
    """,
)
def global_sort_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed global total-order rank WITHOUT the single-partition
    window anti-pattern. ``row_number() OVER (ORDER BY …)`` with no
    PARTITION BY funnels the whole table through one task; instead:

    1. compute ~16 quantile boundaries of the sort key ONCE on the
       driver (``approxQuantile`` — a merged GK sketch, no full scan
       materialization) and bake them into the plan as literals, so
       every downstream pass buckets rows identically (unlike
       ``repartitionByRange``, whose sampled boundaries can differ
       between the counts job and the final job),
    2. assign each row its range bucket via the literal bounds (equal
       keys land in the same bucket → global order is respected),
    3. rank within each bucket (one window shuffle on the bucket id),
    4. collect per-bucket COUNTS (one bigint per bucket — driver-safe
       at any scale) → cumulative offsets → global = local + offset.

    Every 100th rank is returned so the result stays small while still
    requiring every row to be globally ranked. The oracle uses the
    naive window because DuckDB runs single-node anyway.
    """
    from ..operators.ranking import global_rank

    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    ranked = global_rank(
        o, "o_totalprice", "o_orderkey", ascending=False, buckets=16
    )
    return (
        ranked.where((F.col("rank") - 1) % 100 == 0)
        .select("rank", "o_orderkey", "o_totalprice")
        .orderBy("rank")
    )
