"""Window-function queries (SURVEY §3.6 X13-X15 + batch sessionization).

Cross-engine determinism: every ORDER BY inside a window that feeds an
order-sensitive function (row_number, ntile, lag/lead, running sums)
carries a unique tie-break key; rank/dense_rank are exercised WITH real
ties (they're tie-stable). Running sums go through DECIMAL (exact) like
all money aggregates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from metricproxy_spark.io import load_table
from metricproxy_spark.registry import register


@register(
    "analytic_topk_per_group",
    oracle="""
    SELECT p_brand, p_partkey, p_retailprice, rn
    FROM (
        SELECT p_brand, p_partkey, p_retailprice,
               row_number() OVER (PARTITION BY p_brand
                                  ORDER BY p_retailprice DESC, p_partkey) AS rn
        FROM part
    )
    WHERE rn <= 3
    """,
)
def analytic_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X13+X15: top-3 parts by price per brand (rank-window + filter).
    Scale: the window shuffles once on p_brand; with heavy groups a
    pre-aggregation (per-partition top-k before the shuffle) would cut
    data moved — Catalyst already inserts exactly that (WindowGroupLimit)
    for rank<=k filters."""
    part = load_table(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand").orderBy(
        F.col("p_retailprice").desc(), F.col("p_partkey").asc()
    )
    return (
        part.select(
            "p_brand",
            "p_partkey",
            "p_retailprice",
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") <= 3)
    )


@register(
    "analytic_window_analytic",
    oracle="""
    SELECT o_custkey, o_orderkey,
           lag(o_totalprice) OVER w AS prev_price,
           lead(o_totalprice) OVER w AS next_price,
           CAST(sum(CAST(o_totalprice AS DECIMAL(27,4)))
                OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS DOUBLE) AS running_spend,
           first_value(o_totalprice) OVER w AS first_price
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def analytic_window_analytic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X14: lag/lead/first_value/running sum per customer order history.
    One shuffle on o_custkey serves all four functions (same window)."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w_run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.lag("o_totalprice").over(w).alias("prev_price"),
        F.lead("o_totalprice").over(w).alias("next_price"),
        F.sum(F.col("o_totalprice").cast("decimal(27,4)"))
        .over(w_run)
        .cast("double")
        .alias("running_spend"),
        F.first("o_totalprice").over(w).alias("first_price"),
    )


@register(
    "analytic_ranking",
    oracle="""
    SELECT c_custkey, c_mktsegment,
           rank() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC) AS rnk,
           dense_rank() OVER (PARTITION BY c_mktsegment
                              ORDER BY c_acctbal DESC) AS drnk,
           ntile(4) OVER (PARTITION BY c_mktsegment
                          ORDER BY c_acctbal DESC, c_custkey) AS quartile,
           percent_rank() OVER (PARTITION BY c_mktsegment
                                ORDER BY c_acctbal DESC) AS prnk
    FROM customer
    """,
)
def analytic_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X13: rank/dense_rank under real ties (tie-stable), ntile over a
    unique order (tie-broken — ntile is order-sensitive)."""
    customer = load_table(spark, sf_dir, "customer")
    w_ties = Window.partitionBy("c_mktsegment").orderBy(F.col("c_acctbal").desc())
    w_uniq = Window.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey").asc()
    )
    return customer.select(
        "c_custkey",
        "c_mktsegment",
        F.rank().over(w_ties).alias("rnk"),
        F.dense_rank().over(w_ties).alias("drnk"),
        F.ntile(4).over(w_uniq).alias("quartile"),
        F.percent_rank().over(w_ties).alias("prnk"),
    )


@register(
    "analytic_sessionize",
    oracle="""
    WITH flagged AS (
        SELECT user_id, ts,
               CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                         OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
                    THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT user_id,
           CAST(sum(new_session) AS BIGINT) AS n_sessions,
           count(*) AS n_events
    FROM flagged
    GROUP BY user_id
    """,
)
def analytic_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization (lag + gap flag + count), the batch twin of
    streaming session_window (T3): 30-minute inactivity gap."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    gap = us - F.lag(us).over(w)
    flagged = ev.select(
        "user_id",
        F.when(gap.isNull() | (gap > 30 * 60 * 1_000_000), 1)
        .otherwise(0)
        .alias("new_session"),
    )
    return flagged.groupBy("user_id").agg(
        F.sum("new_session").alias("n_sessions"),
        F.count(F.lit(1)).alias("n_events"),
    )


@register(
    "analytic_range_frame",
    oracle=f"""
    SELECT o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(27,4))) OVER (
               PARTITION BY o_custkey ORDER BY epoch(o_orderdate)
               RANGE BETWEEN 604800 PRECEDING AND 604800 FOLLOWING
           ) AS DOUBLE) AS weekly_neighborhood_spend
    FROM orders
    """,
)
def analytic_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X14 rangeBetween: per order, the customer's total spend within a
    +/-7-day event-time neighborhood — a RANGE frame over epoch seconds
    (vs the rowsBetween running totals elsewhere). Decimal-exact sum."""
    orders = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.unix_timestamp("o_orderdate"))
        .rangeBetween(-604800, 604800)
    )
    return orders.select(
        "o_orderkey",
        F.sum(F.col("o_totalprice").cast("decimal(27,4)"))
        .over(w)
        .cast("double")
        .alias("weekly_neighborhood_spend"),
    )


@register(
    "analytic_ntile_cume",
    oracle="""
    SELECT c_custkey, c_mktsegment,
           ntile(4) OVER w AS quartile,
           cume_dist() OVER w AS cd,
           percent_rank() OVER w AS pr
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
    """,
)
def analytic_ntile_cume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X13+: distribution-rank window functions (ntile / cume_dist /
    percent_rank) per segment. The ORDER BY includes the key as a
    tiebreak so every row is its own peer group — that makes the
    rational-number outputs (k/n) identical across engines and the
    quartile assignment deterministic."""
    cust = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    return cust.select(
        "c_custkey",
        "c_mktsegment",
        F.ntile(4).over(w).alias("quartile"),
        F.cume_dist().over(w).alias("cd"),
        F.percent_rank().over(w).alias("pr"),
    )


@register(
    "analytic_running_distinct",
    oracle="""
    WITH marked AS (
        SELECT event_type, ts, event_id,
               CASE WHEN row_number() OVER (
                   PARTITION BY event_type, user_id
                   ORDER BY ts, event_id) = 1 THEN 1 ELSE 0 END AS is_first
        FROM events
    )
    SELECT event_type, ts, event_id,
           CAST(sum(is_first) OVER (
               PARTITION BY event_type ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS distinct_users_so_far
    FROM marked
    """,
)
def analytic_running_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X13 extension — running COUNT(DISTINCT) over an ordered window,
    which Spark does not support natively: rewritten as
    first-occurrence marking (row_number = 1 per (key, member)) + a
    running sum of the marks. Two windows, both partition-local sorts;
    the rewrite is the standard decorrelation every engine lacking
    distinct-over-window uses, and the oracle replays it identically."""
    ev = load_table(spark, sf_dir, "events")
    w_first = Window.partitionBy("event_type", "user_id").orderBy(
        "ts", "event_id"
    )
    w_run = (
        Window.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    marked = ev.select(
        "event_type",
        "ts",
        "event_id",
        F.when(F.row_number().over(w_first) == 1, 1).otherwise(0).alias(
            "is_first"
        ),
    )
    return marked.select(
        "event_type",
        "ts",
        "event_id",
        F.sum("is_first").over(w_run).cast("bigint").alias(
            "distinct_users_so_far"
        ),
    )
