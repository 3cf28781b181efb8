"""Join-family queries (SURVEY §3.6 X4-X9).

Scale notes inline per query; the common rules: small dimensions are
broadcast explicitly (bounded size by construction), fact-fact joins
shuffle once on the join key, inequality joins never run as raw
nested loops (bucketed time-band decomposition), and as-of alignment
is one window pass instead of a pair-explosion.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from metricproxy_spark.functions.aggregates import dsum, dsum_sql
from metricproxy_spark.io import load_table
from metricproxy_spark.operators.asof import asof_join, asof_join_forward
from metricproxy_spark.operators.rangejoin import time_band_join
from metricproxy_spark.registry import register


@register(
    "analytic_regional_revenue",
    oracle=f"""
    SELECT n.n_name AS nation,
           EXTRACT(year FROM o.o_orderdate) AS order_year,
           count(*) AS n_items,
           {dsum_sql('l.l_extendedprice * (1 - l.l_discount)')} AS revenue
    FROM region r
    JOIN nation n ON n.n_regionkey = r.r_regionkey
    JOIN customer c ON c.c_nationkey = n.n_nationkey
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE r.r_name IN ('ASIA', 'EUROPE')
    GROUP BY n.n_name, EXTRACT(year FROM o.o_orderdate)
    """,
)
def analytic_regional_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4+X5: five-way star join (TPC-H Q5 shape). region/nation are
    broadcast (bounded: 5/25 rows at any scale); customer⋈orders⋈lineitem
    shuffle on their keys — the one unavoidable fact-side shuffle chain.
    The region filter reaches the region scan (predicate pushdown) and
    prunes the whole join tree."""
    region = load_table(spark, sf_dir, "region").filter(
        F.col("r_name").isin("ASIA", "EUROPE")
    )
    nation = load_table(spark, sf_dir, "nation")
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    return (
        lineitem.join(orders, lineitem["l_orderkey"] == orders["o_orderkey"])
        .join(customer, orders["o_custkey"] == customer["c_custkey"])
        .join(
            F.broadcast(nation), customer["c_nationkey"] == nation["n_nationkey"]
        )
        .join(F.broadcast(region), nation["n_regionkey"] == region["r_regionkey"])
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("bigint").alias("order_year"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            ),
        )
    )


@register(
    "analytic_left_join_coverage",
    oracle=f"""
    SELECT c.c_mktsegment AS mktsegment,
           count(*) AS n_customers,
           CAST(sum(CASE WHEN o.o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_without_orders,
           {dsum_sql("coalesce(o.n_orders, 0)")} AS total_orders
    FROM customer c
    LEFT JOIN (
        SELECT o_custkey, count(*) AS n_orders FROM orders GROUP BY o_custkey
    ) o ON o.o_custkey = c.c_custkey
    GROUP BY c.c_mktsegment
    """,
)
def analytic_left_join_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X6: left outer join preserving customers with no orders.
    Aggregate-before-join: orders collapse to one row per customer
    first (map-side combinable), so the join input — and any skew — is
    bounded by customer cardinality, not order volume."""
    customer = load_table(spark, sf_dir, "customer")
    per_cust = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    joined = customer.join(
        per_cust, customer["c_custkey"] == per_cust["o_custkey"], "left"
    )
    return joined.groupBy(F.col("c_mktsegment").alias("mktsegment")).agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum(
            F.when(F.col("o_custkey").isNull(), 1).otherwise(0)
        ).alias("n_without_orders"),
        dsum(F.coalesce(F.col("n_orders"), F.lit(0))).alias("total_orders"),
    )


@register(
    "analytic_semi_join",
    oracle="""
    SELECT c_mktsegment AS mktsegment, count(*) AS n_active
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderstatus = 'F')
    GROUP BY c_mktsegment
    """,
)
def analytic_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X7: left-semi join — customers having at least one 'F' order.
    Semi join never duplicates left rows, so no post-join distinct (and
    the filter pushes to the orders scan)."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    )
    return (
        customer.join(
            orders, customer["c_custkey"] == orders["o_custkey"], "left_semi"
        )
        .groupBy(F.col("c_mktsegment").alias("mktsegment"))
        .agg(F.count(F.lit(1)).alias("n_active"))
    )


@register(
    "analytic_anti_join",
    oracle="""
    SELECT c_mktsegment AS mktsegment, count(*) AS n_inactive
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderstatus = 'P')
    GROUP BY c_mktsegment
    """,
)
def analytic_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X7: left-anti join — customers with no pending ('P') orders."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "P"
    )
    return (
        customer.join(
            orders, customer["c_custkey"] == orders["o_custkey"], "left_anti"
        )
        .groupBy(F.col("c_mktsegment").alias("mktsegment"))
        .agg(F.count(F.lit(1)).alias("n_inactive"))
    )


@register(
    "analytic_range_join",
    oracle=f"""
    SELECT e1.event_id AS error_id,
           count(*) AS n_purchases,
           {dsum_sql('e2.value')} AS purchase_value
    FROM events e1
    JOIN events e2
      ON e2.ts >= e1.ts AND e2.ts <= e1.ts + INTERVAL 60 SECOND
     AND e2.event_type = 'purchase'
    WHERE e1.event_type = 'error'
    GROUP BY e1.event_id
    """,
)
def analytic_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X8: time-band join — purchases within 60s after each error.
    Decomposed to a bucketed equi-join (operators.rangejoin): both
    sides shuffle once on floor(ts/band); the raw theta form would be a
    O(L*R) nested loop. Residual band predicate applied post-join."""
    ev = load_table(spark, sf_dir, "events")
    errors = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("error_id"), F.col("ts").alias("l_ts")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("value").alias("p_value"), F.col("ts").alias("r_ts")
    )
    joined = time_band_join(
        errors, purchases, band_seconds=60, left_ts="l_ts", right_ts="r_ts"
    )
    return joined.groupBy("error_id").agg(
        F.count(F.lit(1)).alias("n_purchases"),
        dsum("p_value").alias("purchase_value"),
    )


@register(
    "analytic_asof_join",
    oracle="""
    WITH p AS (
        SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
    ), e AS (
        SELECT user_id, ts, max(value) AS err_value
        FROM events WHERE event_type = 'error' GROUP BY user_id, ts
    )
    SELECT p.event_id, p.user_id, e.err_value AS err_value_asof
    FROM p ASOF LEFT JOIN e ON p.user_id = e.user_id AND p.ts >= e.ts
    """,
)
def analytic_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X9: as-of join — each purchase enriched with the latest prior
    error value for the same user. One union + one window pass
    (operators.asof), vs. DuckDB's native ASOF JOIN as oracle."""
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    errors = (
        ev.filter(F.col("event_type") == "error")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("err_value"))
    )
    joined = asof_join(purchases, errors, on="user_id", ts_col="ts")
    return joined.select("event_id", "user_id", "err_value_asof")


@register(
    "analytic_asof_forward",
    oracle="""
    WITH e AS (
        SELECT event_id, user_id, ts FROM events WHERE event_type = 'error'
    ), p AS (
        SELECT user_id, ts, max(value) AS next_purchase
        FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts
    )
    SELECT e.event_id, e.user_id,
           p.next_purchase AS next_purchase_asof,
           date_diff('microsecond', e.ts, p.ts) AS lead_us
    FROM e ASOF LEFT JOIN p ON e.user_id = p.user_id AND e.ts <= p.ts
    """,
)
def analytic_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X9 forward variant: each error enriched with the user's NEXT
    purchase at-or-after it (value + lead time in exact integer µs) —
    the look-ahead alignment of conversion/recovery analyses. Same
    one-shuffle union+window shape as the backward as-of, scan order
    mirrored (operators.asof.asof_join_forward); DuckDB's native
    forward ASOF JOIN (l.ts <= r.ts) is the oracle."""
    ev = load_table(spark, sf_dir, "events")
    errors = ev.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts"
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("next_purchase"))
    )
    joined = asof_join_forward(
        errors,
        purchases,
        on="user_id",
        ts_col="ts",
        right_payload=["next_purchase", "ts"],
    )
    return joined.select(
        "event_id",
        "user_id",
        F.col("next_purchase_asof"),
        (
            F.unix_micros(F.col("ts_asof")) - F.unix_micros(F.col("ts"))
        ).alias("lead_us"),
    )


@register(
    "analytic_asof_nearest",
    oracle="""
    WITH e AS (
        SELECT event_id, user_id, ts FROM events WHERE event_type = 'error'
    ), p AS (
        SELECT user_id, ts, max(value) AS pv
        FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts
    ), back AS (
        SELECT e.event_id, e.user_id, e.ts, p.pv AS bv, p.ts AS bts
        FROM e ASOF LEFT JOIN p ON e.user_id = p.user_id AND e.ts >= p.ts
    ), paired AS (
        SELECT b.event_id, b.user_id, b.ts, b.bv, b.bts,
               f.pv AS fv, f.ts AS fts
        FROM back b ASOF LEFT JOIN p f
          ON b.user_id = f.user_id AND b.ts <= f.ts
    )
    SELECT event_id, user_id,
           CASE
             WHEN bts IS NULL AND fts IS NULL THEN NULL
             WHEN fts IS NULL THEN bv
             WHEN bts IS NULL THEN fv
             WHEN date_diff('microsecond', bts, ts)
                  <= date_diff('microsecond', ts, fts) THEN bv
             ELSE fv
           END AS nearest_value,
           CASE
             WHEN bts IS NULL AND fts IS NULL THEN NULL
             WHEN fts IS NULL THEN 'prev'
             WHEN bts IS NULL THEN 'next'
             WHEN date_diff('microsecond', bts, ts)
                  <= date_diff('microsecond', ts, fts) THEN 'prev'
             ELSE 'next'
           END AS direction,
           CASE
             WHEN bts IS NULL AND fts IS NULL THEN NULL
             WHEN fts IS NULL THEN date_diff('microsecond', bts, ts)
             WHEN bts IS NULL THEN date_diff('microsecond', ts, fts)
             ELSE least(date_diff('microsecond', bts, ts),
                        date_diff('microsecond', ts, fts))
           END AS dist_us
    FROM paired
    """,
)
def analytic_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X9 nearest variant: each error enriched with the CLOSEST
    purchase in either direction (tie → the earlier one) — the full
    bidirectional alignment built by composing the backward and
    forward as-of operators (two one-shuffle window passes on the same
    user_id key; Exchange reuse makes the second pass cheap). The
    oracle chains DuckDB's two ASOF directions with the same
    tie-break."""
    ev = load_table(spark, sf_dir, "events")
    errors = ev.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts"
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("pv"))
    )
    back = asof_join(
        errors,
        purchases,
        on="user_id",
        ts_col="ts",
        right_payload=["pv", "ts"],
        suffix="_b",
    ).withColumnsRenamed({"pv_b": "bv", "ts_b": "bts"})
    both = asof_join_forward(
        back,
        purchases,
        on="user_id",
        ts_col="ts",
        right_payload=["pv", "ts"],
        suffix="_f",
    ).withColumnsRenamed({"pv_f": "fv", "ts_f": "fts"})
    d_b = F.unix_micros(F.col("ts")) - F.unix_micros(F.col("bts"))
    d_f = F.unix_micros(F.col("fts")) - F.unix_micros(F.col("ts"))
    take_prev = F.col("fts").isNull() | (
        F.col("bts").isNotNull() & (d_b <= d_f)
    )
    none = F.col("bts").isNull() & F.col("fts").isNull()
    return both.select(
        "event_id",
        "user_id",
        F.when(none, F.lit(None).cast("double"))
        .when(take_prev, F.col("bv"))
        .otherwise(F.col("fv"))
        .alias("nearest_value"),
        F.when(none, F.lit(None).cast("string"))
        .when(take_prev, F.lit("prev"))
        .otherwise(F.lit("next"))
        .alias("direction"),
        F.when(none, F.lit(None).cast("bigint"))
        .when(take_prev, d_b)
        .otherwise(d_f)
        .alias("dist_us"),
    )


@register(
    "analytic_interval_overlap",
    oracle="""
    WITH l AS (
        SELECT o_orderkey AS l_key, o_orderpriority AS pri,
               date_diff('day', TIMESTAMP '1992-01-01', o_orderdate)
                   AS l_start,
               date_diff('day', TIMESTAMP '1992-01-01', o_orderdate)
                   + o_orderkey % 20 + 1 AS l_end
        FROM orders WHERE o_orderkey % 7 = 0
    ), r AS (
        SELECT o_orderkey AS r_key, o_orderpriority AS pri,
               date_diff('day', TIMESTAMP '1992-01-01', o_orderdate)
                   AS r_start,
               date_diff('day', TIMESTAMP '1992-01-01', o_orderdate)
                   + o_orderkey % 15 + 1 AS r_end
        FROM orders WHERE o_orderkey % 11 = 3
    )
    SELECT l.pri AS priority,
           CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(SUM(least(l_end, r_end) - greatest(l_start, r_start))
                AS BIGINT) AS sum_overlap_days,
           CAST(MAX(least(l_end, r_end) - greatest(l_start, r_start))
                AS BIGINT) AS max_overlap_days
    FROM l JOIN r ON l.pri = r.pri
               AND l_start <= r_end AND r_start <= l_end
    GROUP BY l.pri
    """,
)
def analytic_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap join (X8 ext.): two sets of order-activity
    intervals (deterministic [orderdate, orderdate + key-derived
    length] windows) pair up wherever they overlap within the same
    order priority, then aggregate pair counts and total/max overlap
    length. Endpoints and overlaps are integer day offsets — sums are
    exact in any order, no decimal plumbing.

    Plan: :func:`metricproxy_spark.operators.rangejoin.
    interval_overlap_join` — both sides replicate into 32-day buckets
    (sequence+explode, ≤2x), equi-join on (priority, bucket), exact
    overlap predicate as residual, and the pair is emitted only from
    the bucket holding greatest(l_start, r_start) so NO distinct pass
    is needed. The oracle runs the naive theta join: the bucketed
    decomposition is value-checked against the O(n²) definition."""
    from metricproxy_spark.operators.rangejoin import interval_overlap_join

    orders = load_table(spark, sf_dir, "orders")
    day0 = F.lit("1992-01-01").cast("timestamp")
    base = F.datediff(F.col("o_orderdate"), day0)
    left = orders.where(F.col("o_orderkey") % 7 == 0).select(
        F.col("o_orderkey").alias("l_key"),
        F.col("o_orderpriority").alias("pri"),
        base.cast("long").alias("l_start"),
        (base + F.col("o_orderkey") % 20 + 1).cast("long").alias("l_end"),
    )
    right = orders.where(F.col("o_orderkey") % 11 == 3).select(
        F.col("o_orderkey").alias("r_key"),
        F.col("o_orderpriority").alias("r_pri"),
        base.cast("long").alias("r_start"),
        (base + F.col("o_orderkey") % 15 + 1).cast("long").alias("r_end"),
    )
    pairs = interval_overlap_join(
        left,
        right,
        "l_start",
        "l_end",
        "r_start",
        "r_end",
        bucket_width=32,
        extra_on=F.col("pri") == F.col("r_pri"),
    )
    olap = F.least("l_end", "r_end") - F.greatest("l_start", "r_start")
    return pairs.groupBy(F.col("pri").alias("priority")).agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum(olap).alias("sum_overlap_days"),
        F.max(olap).alias("max_overlap_days"),
    )


@register(
    "analytic_fuzzy_join",
    oracle="""
    WITH master AS (
        SELECT p_name AS mname, MIN(p_partkey) AS seed FROM part GROUP BY 1
    ), dirty AS (
        -- DISTINCT matches the operator's distinct-names contract:
        -- edit_distance_join dedupes internally, so if two master
        -- names ever collide to one dname the bag form would emit the
        -- pair twice while the engine emits it once (r7 ADVICE)
        SELECT DISTINCT
               substring(mname, 1, (1 + seed % length(mname)) - 1)
               || 'q' ||
               substring(mname, (1 + seed % length(mname)) + 1) AS dname
        FROM master
    )
    SELECT d.dname, m.mname,
           CAST(levenshtein(d.dname, m.mname) AS INT) AS distance
    FROM dirty d JOIN master m
      ON abs(length(d.dname) - length(m.mname)) <= 1
     AND levenshtein(d.dname, m.mname) <= 1
    """,
)
def analytic_fuzzy_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance fuzzy join (entity resolution): a "dirty" feed of
    part names (one deterministic character substitution per distinct
    name, seeded by its min partkey) matched back to the clean
    vocabulary within levenshtein <= 1 — the dedupe-against-master
    shape behind product/entity matching. The engine side runs
    `operators/fuzzyjoin.py`'s prefix-filtered q-gram blocking
    (globally-rarest k*q+1 gram signatures, multiset-safe occurrence
    annotation, short-string length-band fallback) + exact confirm —
    provably complete, no cross product — while the ORACLE is the
    quadratic within-length-band definition, so the driver check
    proves the blocking loses nothing. ASCII inputs (TPC-H names):
    the engines' levenshtein agree on ASCII and diverge on non-ASCII
    (bytes vs codepoints) — documented operator constraint."""
    from metricproxy_spark.operators.fuzzyjoin import edit_distance_join

    part = load_table(spark, sf_dir, "part")
    master = part.groupBy(F.col("p_name").alias("mname")).agg(
        F.min("p_partkey").alias("seed")
    )
    dirty = master.select(
        F.concat(
            F.expr("substring(mname, 1, (1 + seed % length(mname)) - 1)"),
            F.lit("q"),
            F.expr("substring(mname, (1 + seed % length(mname)) + 1)"),
        ).alias("dname")
    )
    return edit_distance_join(dirty, master, "dname", "mname", k=1).select(
        F.col("lname").alias("dname"),
        F.col("rname").alias("mname"),
        "distance",
    )
