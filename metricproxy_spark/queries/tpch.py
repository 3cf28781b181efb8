"""Adapted TPC-H decision-support shapes (engine extension — SURVEY
§3.6 X-surface hardening).

The driver's star schema is a REDUCED TPC-H (no partsupp; fewer
columns), so these are the canonical queries' *shapes* adapted to the
available columns — the point is exercising the optimizer patterns the
full benchmark stresses, each oracle-EXACT under the repo's decimal-sum
determinism contract:

- q14: conditional-aggregate share over a fact⋈dim join (CASE inside
  SUM; dim side broadcast).
- q17: correlated per-group threshold (0.2·avg quantity per part)
  decorrelated into an aggregate + re-join — the classic magic-set
  rewrite Catalyst applies to correlated scalar subqueries.
- q18: HAVING over a fact-table group feeding a semi-join back onto
  two dimension joins (large-volume orders).
- q22: global scalar subquery (avg positive balance) + NOT EXISTS
  anti-join with a date-bounded build side.

Scale notes: fact tables only ever join dim tables (broadcast) or
aggregate on their own keys (partial combine); the q17 avg-by-part
table is partkey-partitioned, so its join with lineitem co-shuffles on
the same key. No driver-side state anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from metricproxy_spark.functions.aggregates import dsum, dsum_sql
from metricproxy_spark.io import load_table
from metricproxy_spark.registry import register


@register(
    "tpch_q14_promo_share",
    oracle=f"""
    SELECT date_trunc('month', l_shipdate) AS month,
           round(100.0 * {dsum_sql("CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1 - l_discount) ELSE 0 END")}
                 / {dsum_sql("l_extendedprice * (1 - l_discount)")}, 6)
             AS promo_share_pct,
           {dsum_sql("l_extendedprice * (1 - l_discount)")} AS total_revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= '1998-01-01' AND l_shipdate < '1999-01-01'
    GROUP BY 1
    """,
)
def tpch_q14_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: monthly share of promo-part revenue in 1998.
    ``part`` broadcasts (dim ≪ fact); the date filter reaches the
    lineitem scan; one hash agg on month. Decimal sums keep the
    share's numerator/denominator hash-exact before one double
    division."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    joined = (
        li.where(
            (F.col("l_shipdate") >= "1998-01-01")
            & (F.col("l_shipdate") < "1999-01-01")
        )
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
    )
    return joined.groupBy(
        F.date_trunc("month", "l_shipdate").alias("month")
    ).agg(
        F.round(
            100.0
            * dsum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0))
            / dsum(rev),
            6,
        ).alias("promo_share_pct"),
        dsum(rev).alias("total_revenue"),
    )


@register(
    "tpch_q17_small_qty_revenue",
    oracle=f"""
    WITH avg_qty AS (
        SELECT l_partkey AS ak,
               (CAST(SUM(CAST(l_quantity AS DECIMAL(27,4))) AS DOUBLE)
                / COUNT(l_quantity)) AS aq
        FROM lineitem GROUP BY l_partkey
    )
    SELECT p_brand,
           round({dsum_sql("l_extendedprice")} / 7.0, 6) AS avg_yearly,
           count(*) AS n_lines
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    JOIN avg_qty ON l_partkey = ak
    WHERE l_quantity < 0.2 * aq
    GROUP BY p_brand
    """,
)
def tpch_q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: revenue from lineitems whose quantity is below
    20% of that part's average, by brand. The correlated subquery is
    decorrelated by hand the way Catalyst would: aggregate quantities
    per partkey once, co-shuffle-join back to lineitem on the same key
    (no broadcast — avg_qty is part-cardinality), broadcast only the
    part dim. The 0.2·avg threshold is the same IEEE double in both
    engines (exact decimal sum / count), so the filter is boundary-
    safe."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    avg_qty = li.groupBy(F.col("l_partkey").alias("ak")).agg(
        (
            F.sum(F.col("l_quantity").cast("decimal(27,4)")).cast("double")
            / F.count("l_quantity")
        ).alias("aq")
    )
    return (
        li.join(avg_qty, F.col("l_partkey") == F.col("ak"))
        .where(F.col("l_quantity") < 0.2 * F.col("aq"))
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand")
        .agg(
            F.round(dsum("l_extendedprice") / 7.0, 6).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@register(
    "tpch_q18_large_orders",
    oracle=f"""
    WITH big AS (
        SELECT l_orderkey,
               CAST(SUM(CAST(l_quantity AS DECIMAL(27,4))) AS DOUBLE) AS total_qty
        FROM lineitem GROUP BY l_orderkey
        HAVING SUM(CAST(l_quantity AS DECIMAL(27,4))) > 180
    )
    SELECT c_name, o_orderkey, o_orderdate, o_totalprice, total_qty
    FROM big
    JOIN orders ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    """,
)
def tpch_q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: orders whose total quantity exceeds 180, with
    their customer. The HAVING aggregate runs on the fact table first
    (partial combine; the >180 filter shrinks it to a few % of orders)
    and the survivors join orders on its primary key, then the
    customer dim. Decimal quantity sums keep the HAVING boundary
    exact."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    big = (
        li.groupBy("l_orderkey")
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(27,4)")).alias("_dq")
        )
        .where(F.col("_dq") > 180)
        .select("l_orderkey", F.col("_dq").cast("double").alias("total_qty"))
    )
    return (
        big.join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(cust), F.col("c_custkey") == F.col("o_custkey"))
        .select(
            "c_name", "o_orderkey", "o_orderdate", "o_totalprice", "total_qty"
        )
    )


@register(
    "tpch_q22_idle_customers",
    oracle=f"""
    WITH recent AS (
        SELECT DISTINCT o_custkey FROM orders
        WHERE o_orderdate >= '1999-01-01'
    ), thr AS (
        SELECT (CAST(SUM(CAST(c_acctbal AS DECIMAL(27,4))) AS DOUBLE)
                / COUNT(c_acctbal)) AS avg_bal
        FROM customer WHERE c_acctbal > 0.0
    )
    SELECT c_mktsegment,
           count(*) AS n_custs,
           {dsum_sql("c_acctbal", 2)} AS total_bal
    FROM customer, thr
    WHERE c_acctbal > thr.avg_bal
      AND c_custkey NOT IN (SELECT o_custkey FROM recent)
    GROUP BY c_mktsegment
    """,
)
def tpch_q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: well-funded customers with no orders since
    1999, counted per market segment. The global average is a scalar
    (one-row cross join / broadcast), the "no recent orders" predicate
    is a LEFT ANTI join against the date-filtered distinct custkeys —
    the filter is pushed to the orders scan and the anti-join build
    side is customer-bounded. Exact decimal sums at scale 2 (account
    balances are 2dp)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    recent = (
        orders.where(F.col("o_orderdate") >= "1999-01-01")
        .select("o_custkey")
        .distinct()
    )
    thr = cust.where(F.col("c_acctbal") > 0.0).agg(
        (
            F.sum(F.col("c_acctbal").cast("decimal(27,4)")).cast("double")
            / F.count("c_acctbal")
        ).alias("avg_bal")
    )
    return (
        cust.crossJoin(F.broadcast(thr))
        .where(F.col("c_acctbal") > F.col("avg_bal"))
        .join(recent, cust.c_custkey == recent.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_custs"),
            dsum("c_acctbal", 2).alias("total_bal"),
        )
    )
