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

Round 3c completes the set: q3 (filter-early join-late), q4
(EXISTS→left-semi), q5 (six-table dim collapse), q6 (pure
scan-filter-agg pushdown canary), q7 (dim self-join nation pairs), q8
(one-pass conditional share), q9 (profit, retailprice-as-cost
adaptation), q10 (returned revenue), q12 (fact⋈fact conditional
counts), q13 (outer-join count histogram), q15 (CTE consumed twice +
scalar max), q19 (OR-of-ANDs partial pushdown), q21 (EXISTS/NOT-EXISTS
decorrelated into one per-order aggregate pass). q1 lives as
``analytic_pricing_summary``. Round 7 completes all 22: q2/q11/q16/q20
run against a DETERMINISTICALLY DERIVED partsupp (see the round-7
section below) since the reduced schema omits the physical table —
the query shapes, and their exact oracles, are the point.

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


@register(
    "tpch_q3_shipping_priority",
    oracle=f"""
    SELECT l_orderkey, o_orderdate,
           {dsum_sql("l_extendedprice * (1 - l_discount)")} AS revenue
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < '1998-06-01'
      AND l_shipdate > '1998-06-01'
    GROUP BY l_orderkey, o_orderdate
    """,
)
def tpch_q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: unshipped-revenue per order for one market
    segment. The segment filter reaches the customer scan and shrinks
    it to ~1/5 before its broadcast onto orders; the two date filters
    push to their own scans; one hash agg on the order key. This is
    the canonical filter-early/join-late plan Catalyst should produce
    from the declarative form — the plan-discipline tests assert no
    cartesian and partial aggregation."""
    cust = (
        load_table(spark, sf_dir, "customer")
        .where(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    orders = (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_orderdate") < "1998-06-01")
        .select("o_orderkey", "o_custkey", "o_orderdate")
    )
    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > "1998-06-01"
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("l_orderkey", "o_orderdate")
        .agg(dsum(rev).alias("revenue"))
    )


@register(
    "tpch_q4_order_priority",
    oracle="""
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders
    WHERE o_orderdate >= '1998-01-01' AND o_orderdate < '1998-04-01'
      AND EXISTS (
            SELECT 1 FROM lineitem
            WHERE l_orderkey = o_orderkey AND l_returnflag = 'R'
          )
    GROUP BY o_orderpriority
    """,
)
def tpch_q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape (adapted: the reduced schema has no commit/receipt
    dates, so the EXISTS predicate is "has a returned lineitem"):
    priority distribution of one quarter's orders having at least one
    matching lineitem. The EXISTS becomes a LEFT SEMI join — Spark's
    semi-join keeps the probe row on first build match (no fan-out, no
    distinct), and the date filter bounds the probe side before the
    shuffle."""
    orders = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= "1998-01-01")
        & (F.col("o_orderdate") < "1998-04-01")
    )
    returned = (
        load_table(spark, sf_dir, "lineitem")
        .where(F.col("l_returnflag") == "R")
        .select("l_orderkey")
    )
    return (
        orders.join(
            returned, F.col("o_orderkey") == F.col("l_orderkey"), "left_semi"
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@register(
    "tpch_q5_local_supplier_volume",
    oracle=f"""
    SELECT n_name,
           {dsum_sql("l_extendedprice * (1 - l_discount)")} AS revenue
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= '1997-01-01' AND o_orderdate < '1998-01-01'
    GROUP BY n_name
    """,
)
def tpch_q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: revenue by nation where customer and supplier
    share the nation, restricted to one region and year. Six-table
    join: the three dims (supplier, nation, region) collapse into one
    broadcast build side; customer broadcasts onto orders; only
    orders⋈lineitem shuffles, on the order key both sides already
    produce. The same-nation predicate rides the supplier join rather
    than a post-filter, so mismatched rows never materialize."""
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    orders = (
        load_table(spark, sf_dir, "orders")
        .where(
            (F.col("o_orderdate") >= "1997-01-01")
            & (F.col("o_orderdate") < "1998-01-01")
        )
        .select("o_orderkey", "o_custkey")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    nation = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    asia_supp = (
        supp.join(
            F.broadcast(nation),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .join(F.broadcast(reg), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_nationkey", "n_name")
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(
            F.broadcast(asia_supp),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .groupBy("n_name")
        .agg(dsum(rev).alias("revenue"))
    )


@register(
    "tpch_q7_volume_shipping",
    oracle=f"""
    SELECT supp_nation, cust_nation, l_year,
           {dsum_sql("volume")} AS revenue
    FROM (
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               CAST(year(l_shipdate) AS INT) AS l_year,
               l_extendedprice * (1 - l_discount) AS volume
        FROM supplier
        JOIN lineitem ON s_suppkey = l_suppkey
        JOIN orders ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
           OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    """,
)
def tpch_q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: bilateral trade volume between two nations by
    ship year. The nation dim joins twice under different roles (the
    classic self-join-of-a-dim pattern); both sides broadcast, and the
    disjunctive nation-pair predicate lands on the joined row before
    aggregation. Only orders⋈lineitem shuffles."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate", "l_extendedprice", "l_discount"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    )
    nation = load_table(spark, sf_dir, "nation")
    supp = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
        .where(F.col("supp_nation").isin("NATION_1", "NATION_2"))
    )
    cust = (
        load_table(spark, sf_dir, "customer")
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
        .where(F.col("cust_nation").isin("NATION_1", "NATION_2"))
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .where(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("l_year"),
        )
        .agg(dsum(vol).alias("revenue"))
    )


@register(
    "tpch_q8_market_share",
    oracle=f"""
    SELECT o_year,
           round(100.0 * {dsum_sql("CASE WHEN supp_nation = 'NATION_3' THEN volume ELSE 0 END")}
                 / {dsum_sql("volume")}, 6) AS mkt_share_pct
    FROM (
        SELECT CAST(year(o_orderdate) AS INT) AS o_year,
               l_extendedprice * (1 - l_discount) AS volume,
               n2.n_name AS supp_nation
        FROM part
        JOIN lineitem ON p_partkey = l_partkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation n1 ON c_nationkey = n1.n_nationkey
        JOIN region ON n1.n_regionkey = r_regionkey
        JOIN nation n2 ON s_nationkey = n2.n_nationkey
        WHERE r_name = 'EUROPE' AND p_type = 'STANDARD'
    ) all_nations
    GROUP BY o_year
    """,
)
def tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one nation's share of STANDARD-part revenue sold
    into EUROPE, by order year. Eight logical tables; every dim
    broadcasts, the conditional-share aggregate is numerator/denominator
    decimal sums in one pass (no second scan for the denominator), and
    the part-type filter prunes lineitem via the broadcast hash join's
    build-side filter."""
    part = (
        load_table(spark, sf_dir, "part")
        .where(F.col("p_type") == "STANDARD")
        .select("p_partkey")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    nation = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    cust_eu = (
        load_table(spark, sf_dir, "customer")
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(reg), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("c_custkey")
    )
    supp = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust_eu), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(
                100.0
                * dsum(
                    F.when(F.col("supp_nation") == "NATION_3", vol).otherwise(
                        0.0
                    )
                )
                / dsum(vol),
                6,
            ).alias("mkt_share_pct")
        )
    )


@register(
    "tpch_q10_returned_items",
    oracle=f"""
    SELECT c_custkey, c_name, n_name,
           {dsum_sql("l_extendedprice * (1 - l_discount)")} AS revenue,
           c_acctbal
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation ON c_nationkey = n_nationkey
    WHERE o_orderdate >= '1998-01-01' AND o_orderdate < '1998-07-01'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, n_name, c_acctbal
    """,
)
def tpch_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: per-customer revenue lost to returns in a
    half-year window. Both fact filters (date, returnflag) push to
    their scans; customer and nation broadcast; the agg keys include
    the functionally-dependent customer attributes so no second join
    is needed to decorate the result."""
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey", "c_acctbal"
    )
    orders = (
        load_table(spark, sf_dir, "orders")
        .where(
            (F.col("o_orderdate") >= "1998-01-01")
            & (F.col("o_orderdate") < "1998-07-01")
        )
        .select("o_orderkey", "o_custkey")
    )
    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_returnflag") == "R"
    )
    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name"
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name", "c_acctbal")
        .agg(dsum(rev).alias("revenue"))
        .select("c_custkey", "c_name", "n_name", "revenue", "c_acctbal")
    )


@register(
    "tpch_q13_customer_distribution",
    oracle="""
    SELECT c_count, count(*) AS custdist
    FROM (
        SELECT c_custkey, count(o_orderkey) AS c_count
        FROM customer
        LEFT JOIN orders ON c_custkey = o_custkey
              AND o_orderpriority <> '5-LOW'
        GROUP BY c_custkey
    ) c_orders
    GROUP BY c_count
    """,
)
def tpch_q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: distribution of per-customer order counts,
    keeping zero-order customers via the LEFT OUTER join (the join
    predicate carries the priority filter so those rows count as zero,
    not disappear). Two cascaded aggs: the first keyed on the customer
    (shuffle on c_custkey), the second on the tiny count domain —
    map-side combine collapses it to a handful of rows per task."""
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderpriority"
    )
    per_cust = (
        cust.join(
            orders,
            (F.col("c_custkey") == F.col("o_custkey"))
            & (F.col("o_orderpriority") != "5-LOW"),
            "left_outer",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(
        F.count(F.lit(1)).alias("custdist")
    )


@register(
    "tpch_q19_disjunctive_revenue",
    oracle=f"""
    SELECT {dsum_sql("l_extendedprice * (1 - l_discount)")} AS revenue,
           count(*) AS n_lines
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 1 AND 20)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25
           AND l_quantity BETWEEN 10 AND 30)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35
           AND l_quantity BETWEEN 20 AND 40)
    """,
)
def tpch_q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: OR-of-ANDs mixing build-side (brand/size) and
    probe-side (quantity) predicates. Catalyst extracts the common
    per-side disjuncts: the brand IN-list prunes the broadcast part
    build, the quantity range [1,40] pushes to the lineitem scan, and
    the full disjunction evaluates on joined rows — the standard
    partial-pushdown treatment of q19's famous predicate."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    part = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_brand", "p_size"
    )
    q = F.col("l_quantity")
    sz = F.col("p_size")
    pred = (
        ((F.col("p_brand") == "Brand#1") & sz.between(1, 15) & q.between(1, 20))
        | ((F.col("p_brand") == "Brand#2") & sz.between(1, 25) & q.between(10, 30))
        | ((F.col("p_brand") == "Brand#3") & sz.between(1, 35) & q.between(20, 40))
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .where(pred)
        .agg(
            dsum(rev).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@register(
    "tpch_q21_waiting_supplier",
    oracle="""
    SELECT s_name, count(*) AS numwait
    FROM supplier
    JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
    JOIN orders ON o_orderkey = l1.l_orderkey
    JOIN nation ON s_nationkey = n_nationkey
    WHERE o_orderstatus = 'F'
      AND l1.l_returnflag = 'R'
      AND n_name IN ('NATION_4', 'NATION_5', 'NATION_6')
      AND EXISTS (
            SELECT 1 FROM lineitem l2
            WHERE l2.l_orderkey = l1.l_orderkey
              AND l2.l_suppkey <> l1.l_suppkey
          )
      AND NOT EXISTS (
            SELECT 1 FROM lineitem l3
            WHERE l3.l_orderkey = l1.l_orderkey
              AND l3.l_suppkey <> l1.l_suppkey
              AND l3.l_returnflag = 'R'
          )
    GROUP BY s_name
    """,
)
def tpch_q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (adapted: returnflag = 'R' stands in for the
    missing receipt>commit lateness predicate): suppliers solely
    responsible for the returned item in finalized multi-supplier
    orders. The correlated EXISTS / NOT EXISTS pair is decorrelated
    into per-order aggregates computed in ONE pass over lineitem
    (distinct-supplier count and returned-supplier set bounds) and
    joined back on the order key — replacing two extra shuffled
    semi/anti joins of the fact table with one agg the size of orders."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_returnflag"
    )
    # One pass: per order, #distinct suppliers overall and among
    # returned lines, plus min/max returned supplier to identify "the
    # one returned supplier" without a second join.
    per_order = li.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(
            F.when(F.col("l_returnflag") == "R", F.col("l_suppkey"))
        ).alias("n_ret_supp"),
        F.min(
            F.when(F.col("l_returnflag") == "R", F.col("l_suppkey"))
        ).alias("ret_supp"),
    )
    qualifying = per_order.where(
        (F.col("n_supp") > 1) & (F.col("n_ret_supp") == 1)
    ).select(F.col("l_orderkey").alias("q_orderkey"), "ret_supp")
    orders = (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_orderstatus") == "F")
        .select("o_orderkey")
    )
    nation = load_table(spark, sf_dir, "nation").where(
        F.col("n_name").isin("NATION_4", "NATION_5", "NATION_6")
    )
    supp = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_name")
    )
    l1 = li.where(F.col("l_returnflag") == "R")
    return (
        l1.join(
            qualifying,
            (F.col("l_orderkey") == F.col("q_orderkey"))
            & (F.col("l_suppkey") == F.col("ret_supp")),
        )
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


@register(
    "tpch_q6_forecast_revenue",
    oracle=f"""
    SELECT {dsum_sql("l_extendedprice * l_discount")} AS revenue,
           count(*) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= '1997-01-01' AND l_shipdate < '1998-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def tpch_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: the pure scan-filter-aggregate query — no join
    at all. Every predicate (date range, discount band, quantity cap)
    must reach the parquet scan as a pushed filter; what remains is one
    partial+final aggregate pair. This is the query where scan
    efficiency IS the whole cost at 100 TB, so it doubles as the
    pushdown canary."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= "1997-01-01")
            & (F.col("l_shipdate") < "1998-01-01")
            & (F.col("l_discount").between(0.05, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(
            dsum(F.col("l_extendedprice") * F.col("l_discount")).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@register(
    "tpch_q9_product_profit",
    oracle=f"""
    SELECT nation, o_year,
           {dsum_sql("amount")} AS sum_profit
    FROM (
        SELECT n_name AS nation,
               CAST(year(o_orderdate) AS INT) AS o_year,
               l_extendedprice * (1 - l_discount)
                 - 0.6 * p_retailprice * l_quantity AS amount
        FROM part
        JOIN lineitem ON p_partkey = l_partkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN orders ON o_orderkey = l_orderkey
        JOIN nation ON s_nationkey = n_nationkey
        WHERE p_name LIKE '%red%'
    ) profit
    GROUP BY nation, o_year
    """,
)
def tpch_q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (adapted: no partsupp, so unit cost is
    0.6·p_retailprice): profit on a part-name-matched product line by
    supplier nation and order year. The LIKE filter prunes the part
    build side before broadcast; supplier/nation collapse into a second
    broadcast; only lineitem⋈orders shuffles. The profit expression
    mixes two money products — decimal scale 6 would put products of
    three 2dp factors on rounding boundaries, so the sum uses scale 4
    over each product separately composed (both engines compute the
    identical double before one decimal cast)."""
    part = (
        load_table(spark, sf_dir, "part")
        .where(F.col("p_name").like("%red%"))
        .select("p_partkey", "p_retailprice")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey",
        "l_extendedprice", "l_discount", "l_quantity",
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", F.col("n_name").alias("nation")
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate"
    )
    supp_nat = supp.join(
        F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey", "nation")
    amount = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - 0.6 * F.col("p_retailprice") * F.col("l_quantity")
    )
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supp_nat), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("nation", F.year("o_orderdate").alias("o_year"))
        .agg(dsum(amount).alias("sum_profit"))
    )


@register(
    "tpch_q12_priority_lines",
    oracle="""
    SELECT l_linestatus,
           count(*) FILTER (WHERE o_orderpriority IN
                            ('1-URGENT', '2-HIGH')) AS high_line_count,
           count(*) FILTER (WHERE o_orderpriority NOT IN
                            ('1-URGENT', '2-HIGH')) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= '1998-01-01' AND l_shipdate < '1999-01-01'
      AND l_returnflag = 'N'
    GROUP BY l_linestatus
    """,
)
def tpch_q12_priority_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (adapted: l_linestatus stands in for the missing
    shipmode, returnflag='N' for the commit/receipt sanity predicate):
    high- vs low-priority order counts per line status. The classic
    fact⋈fact equi-join on the order key with conditional counts —
    both date and flag filters push to the lineitem scan, shrinking
    the shuffled probe side before the join."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    li = (
        load_table(spark, sf_dir, "lineitem")
        .where(
            (F.col("l_shipdate") >= "1998-01-01")
            & (F.col("l_shipdate") < "1999-01-01")
            & (F.col("l_returnflag") == "N")
        )
        .select("l_orderkey", "l_linestatus")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_linestatus")
        .agg(
            F.count_if(high).alias("high_line_count"),
            F.count_if(~high).alias("low_line_count"),
        )
    )


@register(
    "tpch_q15_top_supplier",
    oracle=f"""
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no,
               {dsum_sql("l_extendedprice * (1 - l_discount)")} AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= '1998-01-01' AND l_shipdate < '1998-04-01'
        GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
    """,
)
def tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: the quarter's top-revenue supplier(s) — a CTE
    aggregated once and consumed twice (per-supplier revenue, and its
    max as a scalar subquery). The revenue table is supplier-
    cardinality so the double consumption is cheap; the scalar max
    broadcasts back as a one-row join. Decimal revenue sums make the
    equality predicate safe — both engines land on the identical
    double, so ties (all suppliers at the max) surface identically."""
    li = load_table(spark, sf_dir, "lineitem")
    revenue = (
        li.where(
            (F.col("l_shipdate") >= "1998-01-01")
            & (F.col("l_shipdate") < "1998-04-01")
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(
            dsum(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("total_revenue")
        )
    )
    mx = revenue.agg(F.max("total_revenue").alias("mx"))
    supp = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name"
    )
    return (
        revenue.crossJoin(F.broadcast(mx))
        .where(F.col("total_revenue") == F.col("mx"))
        .join(F.broadcast(supp), F.col("s_suppkey") == F.col("supplier_no"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


# ---------------------------------------------------------------------------
# Round 7: the four queries previously blocked on the omitted partsupp
# table (q2/q11/q16/q20). partsupp is DERIVED deterministically from
# part x supplier-count — 4 suppliers per part on a stride of
# S div 4 + 1 (distinct for i in 0..3 at every shipped SF), integer
# formulas for availqty, 2dp-exact supplycost — identically in both
# engines, so the canonical query SHAPES run with exact oracles.

_PARTSUPP_SQL = """
    scnt AS (SELECT count(*) AS s FROM supplier),
    partsupp AS (
        SELECT p_partkey AS ps_partkey,
               (p_partkey + i * (s // 4 + 1)) % s AS ps_suppkey,
               CAST((p_partkey * 13 + ((p_partkey + i * (s // 4 + 1)) % s) * 17)
                    % 9999 + 1 AS INT) AS ps_availqty,
               CAST(CAST((p_partkey * 31 + ((p_partkey + i * (s // 4 + 1)) % s) * 7)
                    % 100000 AS DOUBLE) / 100 + 1.0 AS DOUBLE) AS ps_supplycost
        FROM part, scnt, (SELECT unnest(generate_series(0, 3)) AS i)
    )
"""


def _partsupp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derived partsupp (module comment above): 4 rows per part."""
    part = load_table(spark, sf_dir, "part").select("p_partkey")
    scnt = load_table(spark, sf_dir, "supplier").agg(
        F.count(F.lit(1)).alias("s")
    )
    sk = (F.col("p_partkey") + F.col("i") * (F.expr("s div 4") + 1)) % F.col("s")
    return (
        part.crossJoin(F.broadcast(scnt))
        .select(
            "p_partkey", "s", F.explode(F.expr("sequence(0, 3)")).alias("i")
        )
        .select(
            F.col("p_partkey").alias("ps_partkey"),
            sk.alias("ps_suppkey"),
            ((F.col("p_partkey") * 13 + sk * 17) % 9999 + 1)
            .cast("int")
            .alias("ps_availqty"),
            (
                ((F.col("p_partkey") * 31 + sk * 7) % 100000).cast("double")
                / 100
                + 1.0
            ).alias("ps_supplycost"),
        )
    )


@register(
    "tpch_q2_min_cost_supplier",
    oracle=f"""
    WITH {_PARTSUPP_SQL}
    SELECT s.s_acctbal, s.s_name, n.n_name, p.p_partkey, ps.ps_supplycost
    FROM part p
    JOIN partsupp ps ON ps.ps_partkey = p.p_partkey
    JOIN supplier s ON s.s_suppkey = ps.ps_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    JOIN region r ON r.r_regionkey = n.n_regionkey
    WHERE p.p_size BETWEEN 10 AND 20 AND r.r_name = 'EUROPE'
      AND ps.ps_supplycost = (
          SELECT min(ps2.ps_supplycost) FROM partsupp ps2
          JOIN supplier s2 ON s2.s_suppkey = ps2.ps_suppkey
          JOIN nation n2 ON n2.n_nationkey = s2.s_nationkey
          JOIN region r2 ON r2.r_regionkey = n2.n_regionkey
          WHERE ps2.ps_partkey = p.p_partkey AND r2.r_name = 'EUROPE')
    """,
)
def tpch_q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q2 (minimum-cost supplier): for each mid-size part, the
    EUROPE supplier(s) quoting the per-part minimum supply cost. The
    oracle keeps the CORRELATED scalar subquery; the engine side runs
    the decorrelated form — one keyed MIN aggregate over the
    region-filtered partsupp, re-joined on (part, cost) — the
    magic-set rewrite Catalyst itself applies to such subqueries.
    Dims broadcast; the only big join is partsupp⋈supplier keyed on
    the derived suppkey."""
    ps = _partsupp(spark, sf_dir)
    supp = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    part = load_table(spark, sf_dir, "part").where(
        F.col("p_size").between(10, 20)
    )
    euro_ps = (
        ps.join(F.broadcast(supp), ps.ps_suppkey == supp.s_suppkey)
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(reg), F.col("n_regionkey") == F.col("r_regionkey"))
    )
    mins = (
        euro_ps.groupBy("ps_partkey")
        .agg(F.min("ps_supplycost").alias("min_cost"))
        .select(F.col("ps_partkey").alias("mk"), "min_cost")
    )
    return (
        euro_ps.join(
            mins,
            (euro_ps.ps_partkey == mins.mk)
            & (euro_ps.ps_supplycost == mins.min_cost),
        )
        .join(part, euro_ps.ps_partkey == part.p_partkey)
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "ps_supplycost")
    )


@register(
    "tpch_q11_important_stock",
    oracle=f"""
    WITH {_PARTSUPP_SQL},
    vals AS (
        SELECT ps.ps_partkey,
               CAST(SUM(CAST(ps.ps_supplycost AS DECIMAL(27,2))
                        * ps.ps_availqty) AS DOUBLE) AS value
        FROM partsupp ps JOIN supplier s ON s.s_suppkey = ps.ps_suppkey
        JOIN nation n ON n.n_nationkey = s.s_nationkey
        WHERE n.n_name = 'NATION_7' GROUP BY 1
    ), tot AS (
        SELECT CAST(SUM(CAST(ps.ps_supplycost AS DECIMAL(27,2))
                        * ps.ps_availqty) AS DOUBLE) AS t
        FROM partsupp ps JOIN supplier s ON s.s_suppkey = ps.ps_suppkey
        JOIN nation n ON n.n_nationkey = s.s_nationkey
        WHERE n.n_name = 'NATION_7'
    )
    SELECT ps_partkey, value FROM vals, tot WHERE value > 0.003 * t
    """,
)
def tpch_q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q11 (important stock identification): per-part inventory
    value held by one nation's suppliers, kept where it exceeds a
    fraction of that nation's total — the global-scalar-subquery +
    HAVING shape. Decimal-exact value sums; the 1-row total broadcasts
    back for the threshold filter."""
    ps = _partsupp(spark, sf_dir)
    supp = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation").where(
        F.col("n_name") == "NATION_7"
    )
    base = (
        ps.join(F.broadcast(supp), ps.ps_suppkey == supp.s_suppkey)
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            "ps_partkey",
            (F.col("ps_supplycost").cast("decimal(27,2)") * F.col("ps_availqty")).alias("v"),
        )
    )
    vals = base.groupBy("ps_partkey").agg(
        F.sum("v").cast("double").alias("value")
    )
    tot = base.agg(F.sum("v").cast("double").alias("t"))
    return (
        vals.crossJoin(F.broadcast(tot))
        .where(F.col("value") > 0.003 * F.col("t"))
        .select("ps_partkey", "value")
    )


@register(
    "tpch_q16_supplier_count",
    oracle=f"""
    WITH {_PARTSUPP_SQL}
    SELECT p.p_brand, p.p_type, p.p_size,
           CAST(count(DISTINCT ps.ps_suppkey) AS BIGINT) AS supplier_cnt
    FROM partsupp ps JOIN part p ON p.p_partkey = ps.ps_partkey
    WHERE p.p_brand <> 'Brand#15' AND p.p_type <> 'PROMO'
      AND p.p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
      AND ps.ps_suppkey NOT IN
          (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY 1, 2, 3
    """,
)
def tpch_q16_supplier_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q16 (parts/supplier relationship): distinct suppliers per
    (brand, type, size) bucket, excluding a supplier blacklist (the
    negative-balance set stands in for the comment-LIKE filter the
    reduced schema omits) — the NOT IN → broadcast anti-join +
    count-distinct shape."""
    ps = _partsupp(spark, sf_dir)
    part = load_table(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#15")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 9, 14, 19, 23, 36, 45, 49)
    )
    excl = load_table(spark, sf_dir, "supplier").where(
        F.col("s_acctbal") < 0
    ).select("s_suppkey")
    return (
        ps.join(F.broadcast(part), ps.ps_partkey == part.p_partkey)
        .join(
            F.broadcast(excl),
            ps.ps_suppkey == excl.s_suppkey,
            "left_anti",
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("ps_suppkey").cast("bigint").alias("supplier_cnt"))
    )


@register(
    "tpch_q20_potential_promotion",
    oracle=f"""
    WITH {_PARTSUPP_SQL},
    shipped AS (
        SELECT l_partkey, l_suppkey,
               CAST(SUM(CAST(l_quantity AS DECIMAL(27,2))) AS DOUBLE) AS qty
        FROM lineitem
        WHERE l_shipdate >= DATE '1995-01-01'
          AND l_shipdate < DATE '1996-01-01'
        GROUP BY 1, 2
    )
    SELECT DISTINCT s.s_suppkey, s.s_name
    FROM supplier s
    JOIN partsupp ps ON ps.ps_suppkey = s.s_suppkey
    JOIN part p ON p.p_partkey = ps.ps_partkey AND p.p_name LIKE 'red%'
    JOIN shipped sh ON sh.l_partkey = ps.ps_partkey
                   AND sh.l_suppkey = ps.ps_suppkey
    WHERE ps.ps_availqty > 0.5 * sh.qty
    """,
)
def tpch_q20_potential_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q20 (potential part promotion): suppliers holding excess
    stock (availqty > half of what they actually shipped in 1995) of
    'red' parts — the nested-IN chain decorrelated into one shipped-
    quantity aggregate joined on (part, supplier), then a DISTINCT
    supplier projection. The lineitem agg is the only fact-sized
    stage; everything else is dim-bounded."""
    ps = _partsupp(spark, sf_dir)
    supp = load_table(spark, sf_dir, "supplier")
    part = load_table(spark, sf_dir, "part").where(
        F.col("p_name").startswith("red")
    )
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1995-01-01").cast("date"))
        & (F.col("l_shipdate") < F.lit("1996-01-01").cast("date"))
    )
    shipped = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum(F.col("l_quantity").cast("decimal(27,2)"))
        .cast("double")
        .alias("qty")
    )
    return (
        ps.join(F.broadcast(part), ps.ps_partkey == part.p_partkey)
        .join(
            shipped,
            (ps.ps_partkey == shipped.l_partkey)
            & (ps.ps_suppkey == shipped.l_suppkey),
        )
        .where(F.col("ps_availqty") > 0.5 * F.col("qty"))
        .join(F.broadcast(supp), ps.ps_suppkey == supp.s_suppkey)
        .select("s_suppkey", "s_name")
        .distinct()
    )
