"""Aggregation, multi-level grouping, set-op and subquery queries
(SURVEY §3.6 X10-X12, X16-X17, X24).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from metricproxy_spark.functions.aggregates import davg, davg_sql, dsum, dsum_sql
from metricproxy_spark.io import load_table, spread
from metricproxy_spark.registry import register


@register(
    "analytic_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {dsum_sql('l_quantity')} AS sum_qty,
           {dsum_sql('l_extendedprice')} AS sum_base_price,
           {dsum_sql('l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
           {dsum_sql('l_extendedprice * (1 - l_discount) * (1 + l_tax)', 6)} AS sum_charge,
           {davg_sql('l_quantity')} AS avg_qty,
           {davg_sql('l_extendedprice')} AS avg_price,
           {davg_sql('l_discount')} AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-09-01 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def analytic_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2+X3+X10: TPC-H Q1 shape — filter → computed columns → hash agg.
    Map-side partial aggregation collapses everything before the (tiny,
    ~6-key) shuffle; the shipdate predicate pushes to the parquet scan."""
    # Filter first (the shipdate predicate pushes to the scan), then
    # spread(): the sf-sized table is one parquet row group, so the
    # decimal partial aggregation would otherwise run on ONE core; the
    # round-robin exchange of the narrow filtered rows buys a
    # cores-wide agg stage and is a structural no-op on a wide scan.
    # Decimal sums are exact (order-independent), so the re-partition
    # cannot change any result.
    li = spread(
        load_table(spark, sf_dir, "lineitem").filter(
            F.col("l_shipdate") <= F.lit("2001-09-01").cast("timestamp")
        ),
        spark,
    )
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        dsum("l_quantity").alias("sum_qty"),
        dsum("l_extendedprice").alias("sum_base_price"),
        dsum(disc_price).alias("sum_disc_price"),
        dsum(charge, 6).alias("sum_charge"),
        davg("l_quantity").alias("avg_qty"),
        davg("l_extendedprice").alias("avg_price"),
        davg("l_discount").alias("avg_disc"),
        F.count(F.lit(1)).alias("count_order"),
    )


@register(
    "analytic_rollup",
    oracle=f"""
    SELECT r.r_name AS region, n.n_name AS nation,
           GROUPING(r.r_name, n.n_name) AS gid,
           count(*) AS n_customers,
           {dsum_sql('c.c_acctbal')} AS sum_acctbal
    FROM customer c
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    JOIN region r ON r.r_regionkey = n.n_regionkey
    GROUP BY ROLLUP (r.r_name, n.n_name)
    """,
)
def analytic_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X11: rollup — per-nation, per-region and grand totals in one agg
    (Expand + single shuffle), with grouping_id disambiguating NULL keys."""
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    joined = customer.join(
        F.broadcast(nation), customer["c_nationkey"] == nation["n_nationkey"]
    ).join(F.broadcast(region), nation["n_regionkey"] == region["r_regionkey"])
    return joined.rollup(
        F.col("r_name").alias("region"), F.col("n_name").alias("nation")
    ).agg(
        F.grouping_id().alias("gid"),
        F.count(F.lit(1)).alias("n_customers"),
        dsum("c_acctbal").alias("sum_acctbal"),
    )


@register(
    "analytic_cube",
    oracle=f"""
    SELECT o_orderstatus, o_orderpriority,
           count(*) AS n_orders,
           {dsum_sql('o_totalprice')} AS sum_price
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def analytic_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X11: cube over order status x priority."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        dsum("o_totalprice").alias("sum_price"),
    )


@register(
    "analytic_grouping_sets",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           count(*) AS n_items,
           {dsum_sql('l_quantity')} AS sum_qty
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
    """,
)
def analytic_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X11+X24: explicit grouping sets via the SQL surface (spark.sql)."""
    li = load_table(spark, sf_dir, "lineitem")
    # {li} = parameterized DataFrame substitution — no session-global
    # temp view to collide across concurrent invocations.
    return spark.sql(
        f"""
        SELECT l_returnflag, l_linestatus,
               count(*) AS n_items,
               {dsum_sql('l_quantity')} AS sum_qty
        FROM {{li}}
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        """,
        li=li,
    )


@register(
    "analytic_setops",
    oracle="""
    SELECT 'intersect' AS op, nk FROM (
        SELECT DISTINCT c_nationkey AS nk FROM customer
        INTERSECT
        SELECT DISTINCT s_nationkey AS nk FROM supplier)
    UNION ALL
    SELECT 'except' AS op, nk FROM (
        SELECT DISTINCT c_nationkey AS nk FROM customer
        EXCEPT
        SELECT DISTINCT s_nationkey AS nk FROM supplier)
    UNION ALL
    SELECT 'union' AS op, nk FROM (
        SELECT c_nationkey AS nk FROM customer
        UNION
        SELECT s_nationkey AS nk FROM supplier)
    """,
)
def analytic_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X17: INTERSECT / EXCEPT / UNION over customer vs supplier nations."""
    cust_nk = (
        load_table(spark, sf_dir, "customer")
        .select(F.col("c_nationkey").alias("nk"))
        .distinct()
    )
    supp_nk = (
        load_table(spark, sf_dir, "supplier")
        .select(F.col("s_nationkey").alias("nk"))
        .distinct()
    )
    tag = lambda df, op: df.select(F.lit(op).alias("op"), "nk")  # noqa: E731
    return (
        tag(cust_nk.intersect(supp_nk), "intersect")
        .unionByName(tag(cust_nk.subtract(supp_nk), "except"))
        .unionByName(tag(cust_nk.union(supp_nk).distinct(), "union"))
    )


_SCALAR_SUBQUERY_SQL_TEMPLATE = f"""
    SELECT p_brand,
           count(*) AS n_premium,
           {dsum_sql('p_retailprice')} AS premium_value
    FROM {{part}}
    WHERE p_retailprice > (SELECT {davg_sql('p_retailprice')} FROM {{part}})
    GROUP BY p_brand
"""


@register(
    "analytic_scalar_subquery",
    oracle=_SCALAR_SUBQUERY_SQL_TEMPLATE.format(part="part"),
)
def analytic_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X24: scalar subquery — parts priced above the global average.
    The same ANSI text runs on both engines; Spark plans the scalar
    subquery as a broadcast, not a per-row lookup."""
    part = load_table(spark, sf_dir, "part")
    # Same ANSI text, with {part} bound by parameterized DataFrame
    # substitution on the Spark side (view-free; the oracle binds the
    # DuckDB-registered table name instead).
    return spark.sql(_SCALAR_SUBQUERY_SQL_TEMPLATE, part=part)


@register(
    "analytic_orderby_limit",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10
    """,
)
def analytic_orderby_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X16: global sort + limit (planned as TakeOrderedAndProject — a
    per-partition top-k then a driver merge of k·P rows, never a full
    global sort). Unique tie-break keeps the row set deterministic."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.select("o_orderkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(10)
    )


# X12: approximate distinct — non-deterministic across engines by
# design, so registered WITHOUT an oracle (driver records rows-only).
@register("analytic_approx_distinct")
def analytic_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X12: HLL++ approximate user count per event type."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id").alias("approx_users"),
        F.count(F.lit(1)).alias("n_events"),
    )


@register(
    "analytic_salted_agg",
    oracle=f"""
    SELECT l_returnflag,
           count(*) AS n,
           {dsum_sql('l_extendedprice')} AS sum_price
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def analytic_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L6 skew technique: two-phase salted aggregation. l_returnflag
    has 3 values over the whole fact table — the canonical hot-key agg.
    Salting fans each key over 16 reducers in phase 1; the phase-2
    combine touches <= 16 partials per key. Result (and oracle) are the
    plain GROUP BY — algebraic aggregates are exact under the split."""
    from metricproxy_spark.operators.scale import salted_sum_count

    li = load_table(spark, sf_dir, "lineitem")
    return salted_sum_count(
        li,
        keys=["l_returnflag"],
        sum_cols={"sum_price": "l_extendedprice"},
        count_alias="n",
        n_salt=16,
    )


@register(
    "analytic_salted_join",
    oracle=f"""
    SELECT n_name AS nation,
           count(*) AS n_customers,
           {dsum_sql('c_acctbal')} AS sum_acctbal
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name
    """,
)
def analytic_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L6 skew technique: salted replicate join. customer⋈nation is the
    classic skewed-dim shape (25 nation keys, millions of customers per
    key at scale); the dim side replicates x8 and each fact row salts
    deterministically, spreading every hot key over 8 shuffle
    partitions. Output identical to the plain join (oracle)."""
    from metricproxy_spark.operators.scale import salted_join

    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nk"), "c_acctbal"
    )
    nat = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("nk"), "n_name"
    )
    joined = salted_join(cust, nat, key="nk", n_salt=8)
    return joined.groupBy(F.col("n_name").alias("nation")).agg(
        F.count(F.lit(1)).alias("n_customers"),
        dsum("c_acctbal").alias("sum_acctbal"),
    )


@register(
    "analytic_pivot",
    oracle=f"""
    SELECT CAST(user_id % 20 AS BIGINT) AS user_bucket,
           {dsum_sql("CASE WHEN event_type = 'click' THEN value END")} AS click,
           {dsum_sql("CASE WHEN event_type = 'view' THEN value END")} AS view,
           {dsum_sql("CASE WHEN event_type = 'purchase' THEN value END")} AS purchase
    FROM events
    GROUP BY 1
    """,
)
def analytic_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X10/X3 pivot: long -> wide per-type value sums with an explicit
    pivot column list (bounded width — the unbounded form needs a
    distinct-scan first, which Spark's pivot() does implicitly; always
    pass the list at scale). Oracle is the CASE-aggregation twin."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.withColumn("user_bucket", (F.col("user_id") % 20).cast("bigint"))
        .groupBy("user_bucket")
        .pivot("event_type", ["click", "view", "purchase"])
        .agg(F.sum(F.col("value").cast("decimal(27,4)")).cast("double"))
    )


@register(
    "analytic_unpivot",
    oracle="""
    SELECT l_orderkey, l_linenumber, measure, val FROM (
        SELECT l_orderkey, l_linenumber,
               'price' AS measure, l_extendedprice AS val FROM lineitem
        UNION ALL
        SELECT l_orderkey, l_linenumber, 'discount', l_discount FROM lineitem
        UNION ALL
        SELECT l_orderkey, l_linenumber, 'tax', l_tax FROM lineitem
    ) u
    """,
)
def analytic_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3 unpivot (wide -> long, the C3 normalization shape on a fact
    table): three measure columns melt into (measure, val) rows via
    unpivot/stack — one scan, no shuffle, fan-out 3x in the projection."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.unpivot(
        ["l_orderkey", "l_linenumber"],
        ["l_extendedprice", "l_discount", "l_tax"],
        "measure",
        "val",
    ).withColumn(
        "measure",
        F.when(F.col("measure") == "l_extendedprice", "price")
        .when(F.col("measure") == "l_discount", "discount")
        .otherwise("tax"),
    )


@register(
    "analytic_percentiles",
    oracle="""
    SELECT event_type,
           quantile_cont(value, 0.25) AS p25,
           quantile_cont(value, 0.5) AS p50,
           quantile_cont(value, 0.75) AS p75,
           max(value) AS vmax
    FROM events
    GROUP BY event_type
    """,
)
def analytic_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X10 exact percentiles: interpolated quantiles per group. Spark's
    percentile() and DuckDB's quantile_cont share the same linear-
    interpolation definition over sorted exact doubles, so the values
    hash-match (no summation-order hazard — only an ordered selection
    plus one interpolation)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.percentile("value", 0.25).alias("p25"),
        F.percentile("value", 0.5).alias("p50"),
        F.percentile("value", 0.75).alias("p75"),
        F.max("value").alias("vmax"),
    )


@register(
    "analytic_exact_moments",
    oracle="""
    WITH sums AS (
        SELECT event_type,
               CAST(count(*) AS DOUBLE) AS n,
               CAST(SUM(CAST(value AS DECIMAL(15,6))) AS DOUBLE) AS sx,
               CAST(SUM(CAST(user_id % 100 AS DECIMAL(15,6))) AS DOUBLE) AS sy,
               CAST(SUM(CAST(value AS DECIMAL(15,6)) * CAST(value AS DECIMAL(15,6))) AS DOUBLE) AS sxx,
               CAST(SUM(CAST(user_id % 100 AS DECIMAL(15,6)) * CAST(user_id % 100 AS DECIMAL(15,6))) AS DOUBLE) AS syy,
               CAST(SUM(CAST(value AS DECIMAL(15,6)) * CAST(user_id % 100 AS DECIMAL(15,6))) AS DOUBLE) AS sxy
        FROM events GROUP BY event_type
    )
    SELECT event_type,
           round((sxx - sx * sx / n) / (n - 1), 9) AS var_value,
           round(sqrt((sxx - sx * sx / n) / (n - 1)), 9) AS stddev_value,
           round((sxy - sx * sy / n) / (n - 1), 9) AS covar_vu,
           round((sxy - sx * sy / n)
                 / sqrt((sxx - sx * sx / n) * (syy - sy * sy / n)), 9) AS corr_vu
    FROM sums
    """,
)
def analytic_exact_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X10 statistical aggregates, reproducibly: var/stddev/covar/corr
    are order-DEPENDENT if computed with the builtin double aggregates
    (partial-aggregation order differs run to run and engine to
    engine). Here the distributed pass accumulates exact DECIMAL power
    sums (n, Σx, Σy, Σx², Σy², Σxy) — map-side combinable, one shuffle
    — and the moments are derived per group from those exact inputs
    with one identical double formula on both engines. This is the
    pattern for any reproducible distributed statistic."""
    ev = load_table(spark, sf_dir, "events")
    x = F.col("value").cast("decimal(15,6)")
    y = (F.col("user_id") % 100).cast("decimal(15,6)")
    sums = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(x).cast("double").alias("sx"),
        F.sum(y).cast("double").alias("sy"),
        F.sum(x * x).cast("double").alias("sxx"),
        F.sum(y * y).cast("double").alias("syy"),
        F.sum(x * y).cast("double").alias("sxy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxx, syy, sxy = F.col("sxx"), F.col("syy"), F.col("sxy")
    return sums.select(
        "event_type",
        F.round((sxx - sx * sx / n) / (n - 1), 9).alias("var_value"),
        F.round(F.sqrt((sxx - sx * sx / n) / (n - 1)), 9).alias(
            "stddev_value"
        ),
        F.round((sxy - sx * sy / n) / (n - 1), 9).alias("covar_vu"),
        F.round(
            (sxy - sx * sy / n)
            / F.sqrt((sxx - sx * sx / n) * (syy - sy * sy / n)),
            9,
        ).alias("corr_vu"),
    )


@register(
    "analytic_pandas_median",
    oracle="""
    SELECT event_type,
           quantile_cont(value, 0.5) AS median_value,
           count(*) AS n
    FROM events GROUP BY event_type
    """,
)
def analytic_pandas_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§3.9 UDF surface: grouped-map applyInPandas. Each group arrives
    as one pandas DataFrame (Arrow transfer); the kernel computes the
    interpolated median — a sorted SELECTION, not a summation, so the
    result is order-independent and hash-matches quantile_cont despite
    crossing the Python boundary. The grouped-map shape is the escape
    hatch for per-entity logic Catalyst can't express (model scoring,
    per-series fitting); groups must individually fit in executor
    memory — partitioned by the groupBy key, nothing else collects."""
    import pandas as pd

    from metricproxy_spark.io import ensure_package_on_workers

    ensure_package_on_workers(spark)
    ev = load_table(spark, sf_dir, "events").select("event_type", "value")

    def median_kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "event_type": [pdf["event_type"].iloc[0]],
                "median_value": [
                    pdf["value"].quantile(0.5, interpolation="linear")
                ],
                "n": [len(pdf)],
            }
        )

    return ev.groupBy("event_type").applyInPandas(
        median_kernel, "event_type string, median_value double, n bigint"
    )


@register(
    "analytic_table_profile",
    oracle="""
    SELECT 'l_quantity' AS col_name, count(*) AS n_rows,
           count(*) - count(l_quantity) AS n_nulls,
           count(DISTINCT l_quantity) AS n_distinct,
           CAST(min(l_quantity) AS VARCHAR) AS min_repr,
           CAST(max(l_quantity) AS VARCHAR) AS max_repr
    FROM lineitem
    UNION ALL
    SELECT 'l_returnflag', count(*), count(*) - count(l_returnflag),
           count(DISTINCT l_returnflag),
           CAST(min(l_returnflag) AS VARCHAR),
           CAST(max(l_returnflag) AS VARCHAR)
    FROM lineitem
    UNION ALL
    SELECT 'l_linestatus', count(*), count(*) - count(l_linestatus),
           count(DISTINCT l_linestatus),
           CAST(min(l_linestatus) AS VARCHAR),
           CAST(max(l_linestatus) AS VARCHAR)
    FROM lineitem
    """,
)
def analytic_table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-profiling utility (the "describe" a pipeline runs before
    trusting a new drop): per-column row/null/distinct counts + min/max
    reprs, one row per profiled column. One scan per column family via
    a single multi-aggregate pass each — count(distinct) is the only
    expand; min/max cast to string so heterogeneous columns stack into
    one schema. At 100 TB: swap exact distinct for HLL per column and
    this same shape streams."""
    li = load_table(spark, sf_dir, "lineitem")

    def profile(col: str) -> DataFrame:
        return li.agg(
            F.lit(col).alias("col_name"),
            F.count(F.lit(1)).alias("n_rows"),
            (F.count(F.lit(1)) - F.count(col)).alias("n_nulls"),
            F.countDistinct(col).alias("n_distinct"),
            F.min(col).cast("string").alias("min_repr"),
            F.max(col).cast("string").alias("max_repr"),
        )

    out = profile("l_quantity")
    for c in ("l_returnflag", "l_linestatus"):
        out = out.unionByName(profile(c))
    return out


@register(
    "analytic_histogram",
    oracle="""
    WITH b AS (
        SELECT min(l_extendedprice) AS lo, max(l_extendedprice) AS hi
        FROM lineitem
    ), binned AS (
        SELECT least(CAST(floor((l_extendedprice - lo) / ((hi - lo) / 20.0))
                         AS BIGINT), 19) AS bucket
        FROM lineitem, b
    )
    SELECT bucket, count(*) AS n
    FROM binned GROUP BY bucket
    """,
)
def analytic_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram (20 buckets) over l_extendedprice: min/max
    ride in as a 1-row broadcast cross join (no driver collect), bucket
    index is pure arithmetic, the final agg shuffles 20 keys. The
    two-pass shape (bounds, then binning) is the standard distributed
    histogram; bucket arithmetic is IEEE-identical across engines so
    the oracle is exact without rounding tricks."""
    li = load_table(spark, sf_dir, "lineitem").select("l_extendedprice")
    bounds = li.agg(
        F.min("l_extendedprice").alias("lo"),
        F.max("l_extendedprice").alias("hi"),
    )
    binned = li.crossJoin(F.broadcast(bounds)).select(
        F.least(
            F.floor(
                (F.col("l_extendedprice") - F.col("lo"))
                / ((F.col("hi") - F.col("lo")) / 20.0)
            ).cast("bigint"),
            F.lit(19).cast("bigint"),
        ).alias("bucket")
    )
    return binned.groupBy("bucket").agg(F.count(F.lit(1)).alias("n"))


@register(
    "analytic_setops_all",
    oracle="""
    WITH a AS (SELECT event_type FROM events WHERE event_id % 2 = 0),
         b AS (SELECT event_type FROM events WHERE user_id % 3 = 0)
    SELECT op, event_type, CAST(count(*) AS BIGINT) AS n FROM (
        SELECT 'intersect_all' AS op, event_type FROM (
            SELECT event_type FROM a INTERSECT ALL SELECT event_type FROM b)
        UNION ALL
        SELECT 'except_all' AS op, event_type FROM (
            SELECT event_type FROM a EXCEPT ALL SELECT event_type FROM b)
    ) GROUP BY op, event_type
    """,
)
def analytic_setops_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X17 bag semantics: INTERSECT ALL / EXCEPT ALL (multiset
    min/difference of duplicate counts — the variant the DISTINCT set
    ops cannot express), summarized per type so the multiplicity math
    itself is what the oracle checks."""
    ev = load_table(spark, sf_dir, "events")
    a = ev.where(F.col("event_id") % 2 == 0).select("event_type")
    b = ev.where(F.col("user_id") % 3 == 0).select("event_type")
    tagged = (
        a.intersectAll(b).select(F.lit("intersect_all").alias("op"), "event_type")
    ).unionByName(
        a.exceptAll(b).select(F.lit("except_all").alias("op"), "event_type")
    )
    return tagged.groupBy("op", "event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )


@register(
    "analytic_lateral_topn",
    oracle="""
    SELECT c.c_custkey, c.c_mktsegment, o.o_orderkey, o.o_totalprice
    FROM customer c, LATERAL (
        SELECT o_orderkey, o_totalprice FROM orders
        WHERE o_custkey = c.c_custkey
        ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) o
    """,
)
def analytic_lateral_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X24 extension — LATERAL correlated subquery with per-row
    ORDER/LIMIT (each customer's 2 priciest orders), the SQL:2016
    lateral-join surface Catalyst decorrelates into a ranked join
    rather than executing per-row. Identical text runs on DuckDB —
    the rare query where the oracle IS the query."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return spark.sql(
        """
        SELECT c.c_custkey, c.c_mktsegment, o.o_orderkey, o.o_totalprice
        FROM {cust} c, LATERAL (
            SELECT o_orderkey, o_totalprice FROM {orders}
            WHERE o_custkey = c.c_custkey
            ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) o
        """,
        cust=cust,
        orders=orders,
    )


@register(
    "analytic_conditional_aggs",
    oracle="""
    SELECT l_returnflag,
           CAST(count(*) FILTER (WHERE l_discount > 0.05) AS BIGINT)
             AS n_discounted,
           CAST(count(*) FILTER (WHERE l_quantity >= 25) AS BIGINT)
             AS n_bulk,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(27,4)))
                FILTER (WHERE l_tax = 0.0) AS DOUBLE) AS tax_free_price,
           CAST(max(l_linenumber) AS BIGINT) AS max_line,
           CAST(bool_or(l_quantity = 50) AS INT) AS any_max_qty
    FROM lineitem GROUP BY l_returnflag
    """,
)
def analytic_conditional_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X10 extension: conditional aggregation surface — count_if /
    FILTER-style predicated counts and sums plus bool_or, the idiom
    that replaces N self-joins with one pass. Decimal sum keeps the
    filtered money aggregate hash-exact; everything else is integer."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count_if(F.col("l_discount") > 0.05).cast("bigint").alias(
            "n_discounted"
        ),
        F.count_if(F.col("l_quantity") >= 25).cast("bigint").alias("n_bulk"),
        F.sum(
            F.when(
                F.col("l_tax") == 0.0,
                F.col("l_extendedprice").cast("decimal(27,4)"),
            )
        )
        .cast("double")
        .alias("tax_free_price"),
        F.max("l_linenumber").cast("bigint").alias("max_line"),
        F.max(F.when(F.col("l_quantity") == 50, 1).otherwise(0))
        .cast("int")
        .alias("any_max_qty"),
    )


@register(
    "analytic_copurchase_lift",
    oracle="""
    WITH op AS (
        SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ), part_cnt AS (
        SELECT l_partkey, count(*) AS c FROM op GROUP BY l_partkey
    ), total AS (
        SELECT count(DISTINCT l_orderkey) AS n_orders FROM op
    ), pairs AS (
        SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
               count(*) AS together
        FROM op a JOIN op b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY a.l_partkey, b.l_partkey
        HAVING count(*) >= 3
    )
    SELECT part_a, part_b, together,
           round(CAST(together AS DOUBLE) * total.n_orders
                 / (ca.c * cb.c), 6) AS lift
    FROM pairs
    JOIN part_cnt ca ON ca.l_partkey = part_a
    JOIN part_cnt cb ON cb.l_partkey = part_b
    CROSS JOIN total
    """,
)
def analytic_copurchase_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket co-occurrence with lift — the association-rule
    shape (co-purchase graph edges weighted by
    P(a,b)/(P(a)·P(b))). One distinct pass over (order, part), a
    self-equi-join on the order key (i<j dedupes the pair space), a
    pair-count agg with a ≥3 support floor bounding the output, and
    two broadcast joins against the per-part counts plus a broadcast
    scalar total. Lift is one integer-ratio double expression, so both
    engines compute the identical IEEE value. At 100 TB the self-join
    shuffles on the order key (baskets are small, so the per-order
    pair fan-out is bounded); the support floor keeps the result
    linear in genuinely-frequent pairs."""
    li = load_table(spark, sf_dir, "lineitem")
    op = li.select("l_orderkey", "l_partkey").distinct()
    part_cnt = op.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("c"))
    total = op.agg(
        F.countDistinct("l_orderkey").alias("n_orders")
    )
    a = op.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("part_a")
    )
    b = op.select(
        F.col("l_orderkey").alias("ok2"), F.col("l_partkey").alias("part_b")
    )
    pairs = (
        a.join(
            b,
            (F.col("ok") == F.col("ok2"))
            & (F.col("part_a") < F.col("part_b")),
        )
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("together"))
        .where(F.col("together") >= 3)
    )
    ca = part_cnt.select(
        F.col("l_partkey").alias("pa"), F.col("c").alias("ca")
    )
    cb = part_cnt.select(
        F.col("l_partkey").alias("pb"), F.col("c").alias("cb")
    )
    return (
        pairs.join(F.broadcast(ca), F.col("part_a") == F.col("pa"))
        .join(F.broadcast(cb), F.col("part_b") == F.col("pb"))
        .crossJoin(F.broadcast(total))
        .select(
            "part_a",
            "part_b",
            "together",
            F.round(
                F.col("together").cast("double")
                * F.col("n_orders")
                / (F.col("ca") * F.col("cb")),
                6,
            ).alias("lift"),
        )
    )


@register("analytic_approx_percentile")
def analytic_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X12 sibling: per-type approximate percentiles from Spark's
    built-in quantile sketch (`approx_percentile`, accuracy 10000 —
    rank error ≤ 1/accuracy). Registered rows-only (the sketch has no
    DuckDB twin); tests/test_round3c_ops.py bounds it against the
    exact interpolated percentiles. At 100 TB this is THE quantile
    path: the sketch is mergeable partial state (map-side combine),
    where exact percentiles need a full sort or all values per
    group.

    The sketch result is projected to SCALAR columns (p50/p95/p99) —
    array-typed result columns are unhashable in the driver's pandas
    canonicalizer (round-4 `unhashable type: 'list'` failure)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.percentile_approx("value", [0.5, 0.95, 0.99], 10000).alias(
                "approx_p"
            ),
            F.count(F.lit(1)).alias("n"),
        )
        .select(
            "event_type",
            F.col("approx_p")[0].alias("p50"),
            F.col("approx_p")[1].alias("p95"),
            F.col("approx_p")[2].alias("p99"),
            "n",
        )
    )


@register(
    "analytic_mode_per_group",
    oracle="""
    WITH counted AS (
        SELECT c.c_mktsegment, o.o_orderpriority, count(*) AS n
        FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
        GROUP BY 1, 2
    ), ranked AS (
        SELECT *, row_number() OVER (
            PARTITION BY c_mktsegment
            ORDER BY n DESC, o_orderpriority ASC
        ) AS rk
        FROM counted
    )
    SELECT c_mktsegment AS mktsegment,
           o_orderpriority AS modal_priority,
           n AS modal_n
    FROM ranked WHERE rk = 1
    """,
)
def analytic_mode_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-group MODE: the most frequent order priority
    per market segment, ties broken lexicographically — the native
    ``mode()`` of both engines leaves ties unspecified, so the
    portable form is count + row_number (two shuffles, both on bounded
    key spaces; the count agg map-side combines, so the window input
    is segments × priorities, not order volume)."""
    from pyspark.sql import Window

    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    counted = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_mktsegment", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("n").desc(), F.col("o_orderpriority").asc()
    )
    return (
        counted.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") == 1)
        .select(
            F.col("c_mktsegment").alias("mktsegment"),
            F.col("o_orderpriority").alias("modal_priority"),
            F.col("n").alias("modal_n"),
        )
    )


@register("analytic_hll_sketch")
def analytic_hll_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X12 sibling: Apache DataSketches HLL through Spark's native
    ``hll_sketch_agg`` — per-type user sketches UNION-merged
    (``hll_union_agg``) into an all-events estimate, the re-aggregable
    distinct-count path (a sketch per partition/day merges into any
    rollup without re-scanning, which exact distinct cannot do at
    100 TB). Registered rows-only (DataSketches has no DuckDB twin);
    tests/test_round4_ops.py bounds the estimates against exact
    distinct counts and checks merge consistency."""
    ev = load_table(spark, sf_dir, "events")
    per_type = ev.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id", 14).alias("sk"),
        F.count_distinct("user_id").alias("exact_users"),
    )
    merged = per_type.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est_users")
    ).select(
        F.lit("ALL").alias("event_type"),
        "est_users",
        F.lit(None).cast("bigint").alias("exact_users"),
    )
    return (
        per_type.select(
            "event_type",
            F.hll_sketch_estimate("sk").alias("est_users"),
            F.col("exact_users").cast("bigint"),
        )
        .unionByName(merged)
    )


@register(
    "analytic_skyline_frontier",
    oracle="""
    WITH pts AS (
        SELECT c.c_custkey, c.c_acctbal,
               CAST(count(o.o_orderkey) AS BIGINT) AS n_orders
        FROM customer c
        LEFT JOIN orders o ON o.o_custkey = c.c_custkey
        GROUP BY c.c_custkey, c.c_acctbal
    ), flagged AS (
        SELECT *,
               max(c_acctbal) OVER (
                   ORDER BY n_orders
                   RANGE BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING
               ) AS best_bal_more_orders,
               max(c_acctbal) OVER (PARTITION BY n_orders)
                   AS best_bal_same_orders
        FROM pts
    )
    SELECT c_custkey, n_orders, c_acctbal
    FROM flagged
    WHERE (best_bal_more_orders IS NULL
           OR c_acctbal > best_bal_more_orders)
      AND c_acctbal = best_bal_same_orders
    """,
)
def analytic_skyline_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto skyline (Börzsönyi et al. 2001) over customers on
    (n_orders ↑, acctbal ↑): the frontier no other customer dominates
    (≥ on both axes, > on one). NOT the textbook O(n²) dominance
    self-join, and NOT a global-order window (WindowExec would run a
    partition-less frame as ONE task). The 2-D skyline reduces to the
    per-x maxima first: best_same = max(acctbal) per n_orders — a
    KEYED hash agg whose output is bounded by the n_orders domain
    (max orders held by any single customer, ≪ row count at any SF).
    best_more = max over strictly-greater n_orders then falls out of a
    broadcast triangular self-join of that tiny aggregate (domain²
    pairs). A broadcast join ships both bests back to the row data; a
    point survives iff bal > best_more (or none) and bal = best_same.
    All row-data shuffles are keyed — the plan has no single-partition
    exchange at any scale. Oracle runs the equivalent window logic."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    pts = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey", "c_acctbal")
        .agg(F.count("o_orderkey").cast("bigint").alias("n_orders"))
    )
    per_n = pts.groupBy("n_orders").agg(
        F.max("c_acctbal").alias("best_same")
    )
    a, b = per_n.alias("a"), per_n.alias("b")
    bests = (
        a.join(
            F.broadcast(b), F.col("b.n_orders") > F.col("a.n_orders"), "left"
        )
        .groupBy(
            F.col("a.n_orders").alias("n_orders"),
            F.col("a.best_same").alias("best_same"),
        )
        .agg(F.max("b.best_same").alias("best_more"))
    )
    flagged = pts.join(F.broadcast(bests), "n_orders")
    return flagged.where(
        (
            F.col("best_more").isNull()
            | (F.col("c_acctbal") > F.col("best_more"))
        )
        & (F.col("c_acctbal") == F.col("best_same"))
    ).select("c_custkey", "n_orders", "c_acctbal")


@register("analytic_cms_heavy_hitters")
def analytic_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X12 sibling: count-min-sketch heavy hitters — the top-20 users
    by event count with BOTH their exact count and the CMS point
    estimate (depth 4 × width 256, seeded xxhash64 so the sketch is
    deterministic). The sketch build is one hash agg whose output is
    AT MOST d·w cells per mapper — at 100 TB the sketch is the shuffle
    compression (exact top-k needs the full key space; the sketch
    ships 1024 counters). Registered rows-only (the sketch family has
    no DuckDB twin); tests/test_round5_ops.py (TestCountMinSketch)
    pins est ≥ exact, the εN overestimate bound, and merge
    additivity."""
    from metricproxy_spark.operators.sketches import cms_build, cms_estimate

    ev = load_table(spark, sf_dir, "events")
    items = ev.select(F.col("user_id").cast("string").alias("item"))
    sketch = cms_build(items, "item")
    exact_top = (
        items.groupBy("item")
        .agg(F.count(F.lit(1)).alias("exact_n"))
        .orderBy(F.col("exact_n").desc(), F.col("item").asc())
        .limit(20)
    )
    est = cms_estimate(exact_top, sketch, "item")
    return est.select(
        F.col("item").alias("user_id"),
        "exact_n",
        "cms_est",
        (F.col("cms_est") - F.col("exact_n")).alias("overcount"),
    )


@register(
    "analytic_mad_outliers",
    oracle="""
    WITH med AS (
        SELECT event_type, quantile_cont(value, 0.5) AS med
        FROM events GROUP BY event_type
    ), dev AS (
        SELECT e.event_type, e.value, m.med,
               abs(e.value - m.med) AS adev
        FROM events e JOIN med m ON e.event_type = m.event_type
    ), mad AS (
        SELECT event_type,
               any_value(med) AS med,
               quantile_cont(adev, 0.5) AS mad
        FROM dev GROUP BY event_type
    )
    SELECT d.event_type,
           round(m.med, 9) AS med,
           round(m.mad, 9) AS mad,
           CAST(count(*) FILTER (
               WHERE abs(d.value - m.med) > 3 * 1.4826 * m.mad
           ) AS BIGINT) AS n_outliers,
           CAST(count(*) AS BIGINT) AS n
    FROM dev d JOIN mad m ON d.event_type = m.event_type
    GROUP BY d.event_type, m.med, m.mad
    """,
)
def analytic_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier detection per event type via MAD (median
    absolute deviation): median and MAD are selection statistics —
    unlike mean/stddev they are order-INdependent across engines
    (`percentile` and `quantile_cont` share the linear-interpolation
    definition), so the whole detector is exact cross-engine with no
    decimal plumbing, and a single corrupted hot point cannot drag
    the threshold the way it drags a z-score. Two grouped percentile
    passes + a broadcast of the (|types|)-row med/MAD table back onto
    the rows; the 1.4826 factor scales MAD to σ under normality
    (the standard robust z-score rule). At 100 TB the exact medians
    become `approx_percentile` sketches — same shape, documented
    swap."""
    ev = load_table(spark, sf_dir, "events")
    med = ev.groupBy("event_type").agg(
        F.percentile("value", 0.5).alias("med")
    )
    dev = ev.join(F.broadcast(med), "event_type").select(
        "event_type",
        "value",
        "med",
        F.abs(F.col("value") - F.col("med")).alias("adev"),
    )
    mad = dev.groupBy("event_type").agg(
        F.first("med").alias("med2"),
        F.percentile("adev", 0.5).alias("mad"),
    )
    out = dev.join(F.broadcast(mad), "event_type")
    return out.groupBy(
        "event_type",
        F.round("med2", 9).alias("med"),
        F.round("mad", 9).alias("mad"),
    ).agg(
        F.count_if(
            F.abs(F.col("value") - F.col("med2"))
            > 3 * 1.4826 * F.col("mad")
        ).cast("bigint").alias("n_outliers"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    )


@register("analytic_kll_quantiles")
def analytic_kll_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X12 quantile sibling: Apache DataSketches KLL (Karnin-Lang-
    Liberty 2016) through Spark 4's native ``kll_sketch_agg_double`` —
    the MERGEABLE quantile summary that makes percentiles re-aggregable
    the way HLL makes distinct counts re-aggregable: a sketch per
    partition/day merges (``kll_merge_agg_double``) into any rollup
    without re-scanning, with a proven normalized-rank-error bound
    (~1.7% at k=200), while exact percentile needs a full sort per
    rollup at 100 TB. Per event_type: n, KLL p50/p95/p99 and the exact
    percentiles alongside, so the error is visible in the output; an
    ALL row re-aggregates the per-type sketches by merge. Registered
    rows-only (DataSketches has no DuckDB twin); tests bound the rank
    error and verify merge consistency + map-side partial aggregation
    in the plan."""
    ev = load_table(spark, sf_dir, "events")
    per_type = ev.groupBy("event_type").agg(
        F.kll_sketch_agg_double("value", F.lit(200)).alias("sk"),
        F.count(F.lit(1)).alias("n"),
        F.percentile("value", F.lit(0.5)).alias("exact_p50"),
        F.percentile("value", F.lit(0.99)).alias("exact_p99"),
    )
    q = lambda s, p: F.kll_sketch_get_quantile_double(F.col(s), F.lit(p))  # noqa: E731
    merged = per_type.agg(
        F.kll_merge_agg_double("sk").alias("sk"),
        F.sum("n").alias("n"),
    ).select(
        F.lit("ALL").alias("event_type"),
        F.col("n").cast("bigint"),
        F.round(q("sk", 0.5), 6).alias("kll_p50"),
        F.round(q("sk", 0.95), 6).alias("kll_p95"),
        F.round(q("sk", 0.99), 6).alias("kll_p99"),
        F.lit(None).cast("double").alias("exact_p50"),
        F.lit(None).cast("double").alias("exact_p99"),
    )
    return (
        per_type.select(
            "event_type",
            F.col("n").cast("bigint"),
            F.round(q("sk", 0.5), 6).alias("kll_p50"),
            F.round(q("sk", 0.95), 6).alias("kll_p95"),
            F.round(q("sk", 0.99), 6).alias("kll_p99"),
            F.round("exact_p50", 6).alias("exact_p50"),
            F.round("exact_p99", 6).alias("exact_p99"),
        )
        .unionByName(merged)
    )


@register(
    "analytic_audience_overlap",
    oracle="""
    WITH ut AS (
        SELECT DISTINCT user_id, event_type FROM events
    ), per_type AS (
        SELECT event_type, count(*) AS n_users FROM ut GROUP BY 1
    ), pairs AS (
        SELECT a.event_type AS type_a, b.event_type AS type_b,
               count(*) AS n_both
        FROM ut a JOIN ut b
          ON a.user_id = b.user_id AND a.event_type < b.event_type
        GROUP BY 1, 2
    )
    SELECT p.type_a, p.type_b,
           pa.n_users AS n_users_a, pb.n_users AS n_users_b, p.n_both,
           round(CAST(p.n_both AS DOUBLE)
                 / CAST(pa.n_users + pb.n_users - p.n_both AS DOUBLE), 6)
             AS jaccard
    FROM pairs p
    JOIN per_type pa ON pa.event_type = p.type_a
    JOIN per_type pb ON pb.event_type = p.type_b
    """,
)
def analytic_audience_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X12-ext: exact pairwise audience overlap — for every ordered
    event-type pair, how many distinct users did BOTH, plus the
    audience Jaccard. The segmentation/overlap staple (and the exact
    twin the HLL sibling `analytic_hll_audience_overlap` is bounded
    against in tests).

    Scale shape: one distinct over (user, type) — the only data-sized
    shuffle — then a self-join keyed on user whose fan-out per user is
    type-count (bounded, here <= 5); per-type audience sizes are a
    5-row dim broadcast onto the pair counts. The jaccard is integer
    counts and one rounded IEEE division."""
    ev = load_table(spark, sf_dir, "events")
    ut = ev.select("user_id", "event_type").distinct()
    per_type = ut.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_users"))
    a = ut.select("user_id", F.col("event_type").alias("type_a"))
    b = ut.select("user_id", F.col("event_type").alias("type_b"))
    pairs = (
        a.join(b, ["user_id"])
        .where(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).alias("n_both"))
    )
    pa = per_type.select(
        F.col("event_type").alias("type_a"), F.col("n_users").alias("n_users_a")
    )
    pb = per_type.select(
        F.col("event_type").alias("type_b"), F.col("n_users").alias("n_users_b")
    )
    out = pairs.join(F.broadcast(pa), "type_a").join(F.broadcast(pb), "type_b")
    jac = F.col("n_both").cast("double") / (
        F.col("n_users_a") + F.col("n_users_b") - F.col("n_both")
    ).cast("double")
    return out.select(
        "type_a",
        "type_b",
        "n_users_a",
        "n_users_b",
        "n_both",
        F.round(jac, 6).alias("jaccard"),
    )


@register("analytic_hll_audience_overlap")
def analytic_hll_audience_overlap(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """X12-ext (sketch flavor): the same pairwise audience overlap via
    DataSketches HLL set algebra — est(|A n B|) = est(A) + est(B) -
    est(A u B) by inclusion-exclusion over merged sketches
    (``hll_union``). This is the 100 TB path: per-type sketches are
    built in ONE scan (mergeable partial agg), and every pairwise
    union happens on the 5-row sketch dim, never re-scanning data —
    exact distinct intersection cannot be pre-aggregated this way.
    Registered rows-only (DataSketches has no DuckDB twin); bounded
    against the exact twin in tests/test_round6b_ops.py. Estimates
    round-trip as DOUBLE; intersection estimates of small overlaps
    carry the known inclusion-exclusion error amplification, which the
    test bound reflects."""
    ev = load_table(spark, sf_dir, "events")
    # Materialize the (tiny) sketch dim once: without this the
    # self-join's two sides each re-run the full scan+agg — harmless
    # at test SF, two redundant 100 TB scans at scale.
    per_type = (
        ev.groupBy("event_type")
        .agg(F.hll_sketch_agg("user_id", 14).alias("sk"))
        .localCheckpoint(eager=True)
    )
    a = per_type.select(F.col("event_type").alias("type_a"), F.col("sk").alias("sk_a"))
    b = per_type.select(F.col("event_type").alias("type_b"), F.col("sk").alias("sk_b"))
    pairs = F.broadcast(a).crossJoin(F.broadcast(b)).where(
        F.col("type_a") < F.col("type_b")
    )
    est_a = F.hll_sketch_estimate("sk_a")
    est_b = F.hll_sketch_estimate("sk_b")
    est_u = F.hll_sketch_estimate(F.hll_union("sk_a", "sk_b"))
    return pairs.select(
        "type_a",
        "type_b",
        est_a.cast("bigint").alias("est_users_a"),
        est_b.cast("bigint").alias("est_users_b"),
        est_u.cast("bigint").alias("est_union"),
        (est_a + est_b - est_u).cast("bigint").alias("est_both"),
    )


@register("analytic_theta_set_algebra")
def analytic_theta_set_algebra(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X12-ext (Theta flavor): full audience SET ALGEBRA on Apache
    DataSketches Theta sketches — per-type user sketches built in one
    scan, then pairwise ``theta_intersection`` (a DIRECT estimate, no
    inclusion-exclusion error amplification like the HLL sibling),
    ``theta_difference`` (A-but-never-B — not expressible with HLL at
    all) and ``theta_union``. The complete mergeable-sketch family:
    HLL (cardinality), CMS (frequency), KLL (quantiles), bloom
    (membership), Theta (set algebra).

    Rows-only (DataSketches has no DuckDB twin); bounded against the
    exact `analytic_audience_overlap` twin in
    tests/test_round6b_ops.py. Scale: the sketch dim is built once and
    checkpoint-materialized (5 rows); all algebra happens on the dim,
    never re-scanning data.

    Driver-evidence note: pinned at the head of the round-7
    _PRIORITY window.
    """
    ev = load_table(spark, sf_dir, "events")
    per_type = (
        ev.groupBy("event_type")
        .agg(F.theta_sketch_agg("user_id").alias("sk"))
        .localCheckpoint(eager=True)
    )
    a = per_type.select(
        F.col("event_type").alias("type_a"), F.col("sk").alias("sk_a")
    )
    b = per_type.select(
        F.col("event_type").alias("type_b"), F.col("sk").alias("sk_b")
    )
    pairs = F.broadcast(a).crossJoin(F.broadcast(b)).where(
        F.col("type_a") < F.col("type_b")
    )
    est = F.theta_sketch_estimate
    return pairs.select(
        "type_a",
        "type_b",
        est(F.col("sk_a")).cast("bigint").alias("est_users_a"),
        est(F.col("sk_b")).cast("bigint").alias("est_users_b"),
        est(F.theta_intersection("sk_a", "sk_b"))
        .cast("bigint")
        .alias("est_both"),
        est(F.theta_difference("sk_a", "sk_b"))
        .cast("bigint")
        .alias("est_only_a"),
        est(F.theta_union("sk_a", "sk_b")).cast("bigint").alias("est_union"),
    )


# Benford first-digit probabilities log10(1 + 1/d) as 8dp LITERALS so
# both engines compute the chi-square from bit-identical doubles (libm
# log10 may differ in the last ulp between engines).
_BENFORD_P = {
    1: 0.30103000, 2: 0.17609126, 3: 0.12493874, 4: 0.09691001,
    5: 0.07918125, 6: 0.06694679, 7: 0.05799195, 8: 0.05115252,
    9: 0.04575749,
}


def _benford_case_sql() -> str:
    # CAST AS DOUBLE: newer DuckDB types the bare 8dp literals
    # DECIMAL(9,8) and computes total*p exactly in decimal — a 1-ulp
    # divergence from Spark's IEEE chi-square chain (exact-repr replay)
    return "CAST(CASE digit " + " ".join(
        f"WHEN {d} THEN {p!r}" for d, p in _BENFORD_P.items()
    ) + " END AS DOUBLE)"


@register(
    "analytic_benford_profile",
    oracle=f"""
    WITH cents AS (
        SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS c
        FROM lineitem
    ), digits AS (
        SELECT CAST(substring(CAST(c AS VARCHAR), 1, 1) AS INT) AS digit
        FROM cents WHERE c > 0
    ), counts AS (
        SELECT digit, CAST(COUNT(*) AS BIGINT) AS n_obs FROM digits GROUP BY 1
    ), tot AS (
        SELECT CAST(SUM(n_obs) AS BIGINT) AS total FROM counts
    )
    SELECT digit, n_obs,
           CAST(n_obs AS DOUBLE) / total AS observed_p,
           {_benford_case_sql()} AS benford_p,
           (n_obs - total * ({_benford_case_sql()}))
           * (n_obs - total * ({_benford_case_sql()}))
           / (total * ({_benford_case_sql()})) AS chi_term
    FROM counts, tot
    """,
)
def analytic_benford_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law data-quality profile over invoice amounts: the
    first-significant-digit histogram of l_extendedprice vs the
    log10(1+1/d) expectation, with per-digit chi-square terms — the
    standard forensic screen for fabricated or truncated financial
    feeds. Digits are extracted in INTEGER space (price -> exact
    cents -> leading digit of the decimal string) so no float-repr
    divergence exists, counts are exact, and the expectations are
    shared 8dp literals — making even the chi-square terms
    bit-identical IEEE. Scale: one map-side digit projection + a
    9-bucket hash agg; the 1-row total broadcasts back."""
    li = load_table(spark, sf_dir, "lineitem").select(
        F.round(F.col("l_extendedprice") * 100).cast("bigint").alias("c")
    )
    digits = li.where(F.col("c") > 0).select(
        F.substring(F.col("c").cast("string"), 1, 1).cast("int").alias("digit")
    )
    counts = digits.groupBy("digit").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_obs")
    )
    total = counts.agg(F.sum("n_obs").cast("bigint").alias("total"))
    p = F.create_map(
        *[F.lit(x) for kv in _BENFORD_P.items() for x in kv]
    )[F.col("digit")]
    j = counts.crossJoin(F.broadcast(total))
    exp_n = F.col("total") * p
    return j.select(
        "digit",
        "n_obs",
        (F.col("n_obs").cast("double") / F.col("total")).alias("observed_p"),
        p.alias("benford_p"),
        ((F.col("n_obs") - exp_n) * (F.col("n_obs") - exp_n) / exp_n).alias(
            "chi_term"
        ),
    )


@register(
    "analytic_market_basket",
    oracle="""
    WITH items AS (
        SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
    ), n_orders AS (
        SELECT CAST(COUNT(DISTINCT o) AS BIGINT) AS total FROM items
    ), item_n AS (
        SELECT p, CAST(COUNT(*) AS BIGINT) AS n FROM items GROUP BY 1
    ), pairs AS (
        SELECT a.p AS p1, b.p AS p2, CAST(COUNT(*) AS BIGINT) AS pair_n
        FROM items a JOIN items b ON a.o = b.o AND a.p < b.p
        GROUP BY 1, 2
        HAVING COUNT(*) >= 2
    )
    SELECT p1, p2, pair_n,
           CAST(pair_n AS DOUBLE) / total AS support,
           CAST(pair_n AS DOUBLE) / i1.n AS confidence,
           CAST(pair_n AS DOUBLE) * total / (i1.n * i2.n) AS lift
    FROM pairs
    JOIN item_n i1 ON i1.p = p1
    JOIN item_n i2 ON i2.p = p2
    CROSS JOIN n_orders
    """,
)
def analytic_market_basket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association-rule mining (a-priori 2-itemsets): parts that
    co-occur in the same order with support >= 2, scored by support,
    confidence P(p2|p1) and lift — the classic market-basket shape.
    Counts are exact integers and the three ratios are fixed IEEE
    expressions over them, so the full rule table hash-matches.
    Scale: the pair stream is Σ basket_size² (baskets are small and
    bounded — TPC-H ≤ 13, retail carts similar), generated by one
    self-join co-partitioned on the order key; item totals join back
    keyed on part. No all-pairs over the catalog — only observed
    co-occurrences materialize."""
    items = (
        load_table(spark, sf_dir, "lineitem")
        .select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p"))
        .distinct()
    )
    total = items.agg(F.count_distinct("o").cast("bigint").alias("total"))
    item_n = items.groupBy("p").agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    a = items.select("o", F.col("p").alias("p1"))
    b = items.select("o", F.col("p").alias("p2"))
    pairs = (
        a.join(b, "o")
        .where(F.col("p1") < F.col("p2"))
        .groupBy("p1", "p2")
        .agg(F.count(F.lit(1)).cast("bigint").alias("pair_n"))
        .where(F.col("pair_n") >= 2)
    )
    j = (
        pairs.join(item_n.select(F.col("p").alias("p1"), F.col("n").alias("n1")), "p1")
        .join(item_n.select(F.col("p").alias("p2"), F.col("n").alias("n2")), "p2")
        .crossJoin(F.broadcast(total))
    )
    return j.select(
        "p1",
        "p2",
        "pair_n",
        (F.col("pair_n").cast("double") / F.col("total")).alias("support"),
        (F.col("pair_n").cast("double") / F.col("n1")).alias("confidence"),
        (
            F.col("pair_n").cast("double") * F.col("total")
            / (F.col("n1") * F.col("n2"))
        ).alias("lift"),
    )


@register(
    "analytic_spatial_join",
    oracle="""
    WITH pts AS (
        SELECT c_custkey AS id,
               (c_custkey * 48271) % 40000 AS x,
               (c_custkey * 69621) % 40000 AS y
        FROM customer
    )
    SELECT a.id AS id_a, b.id AS id_b,
           CAST((a.x-b.x)*(a.x-b.x) + (a.y-b.y)*(a.y-b.y) AS BIGINT)
             AS dist_sq
    FROM pts a JOIN pts b
      ON a.id < b.id
     AND (a.x-b.x)*(a.x-b.x) + (a.y-b.y)*(a.y-b.y) <= 360000
    """,
)
def analytic_spatial_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spatial radius self-join (all point pairs within R = 600 on a
    deterministic integer scatter of customers) via GRID BLOCKING —
    the geospatial "find nearby" primitive. Each point hashes to its
    R-sized grid cell; one side replicates into its 3x3 neighbor
    cells (9x, bounded), candidates are the cell equi-join, and the
    exact integer distance-squared test confirms. A true pair's cell
    coordinates differ by at most 1 in each axis, so the neighborhood
    join finds every pair EXACTLY once — the oracle is the quadratic
    definition, proving the blocking loses nothing (same proof shape
    as `analytic_fuzzy_join`). Integer coordinates keep the whole
    thing hash-exact with no trig/float discipline. Scale: shuffle is
    9x the point count on cell keys, candidates are density-bounded
    per cell — no all-pairs; skewed hot cells split by AQE."""
    R = 600
    pts = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("id"),
        ((F.col("c_custkey") * 48271) % 40000).alias("x"),
        ((F.col("c_custkey") * 69621) % 40000).alias("y"),
    )
    a = pts.select(
        F.col("id").alias("id_a"),
        F.col("x").alias("xa"),
        F.col("y").alias("ya"),
        F.expr(f"x div {R}").alias("cx"),
        F.expr(f"y div {R}").alias("cy"),
    )
    b = (
        pts.select(
            F.col("id").alias("id_b"),
            F.col("x").alias("xb"),
            F.col("y").alias("yb"),
            F.explode(
                F.expr(f"transform(sequence(-1, 1), d -> x div {R} + d)")
            ).alias("cx"),
        )
        .select(
            "id_b",
            "xb",
            "yb",
            "cx",
            F.explode(
                F.expr(f"transform(sequence(-1, 1), d -> yb div {R} + d)")
            ).alias("cy"),
        )
    )
    dsq = (F.col("xa") - F.col("xb")) * (F.col("xa") - F.col("xb")) + (
        F.col("ya") - F.col("yb")
    ) * (F.col("ya") - F.col("yb"))
    return (
        a.join(b, ["cx", "cy"])
        .where((F.col("id_a") < F.col("id_b")) & (dsq <= R * R))
        .select("id_a", "id_b", dsq.cast("bigint").alias("dist_sq"))
    )


@register(
    "analytic_hierarchy_rollup",
    oracle="""
    WITH RECURSIVE closure AS (
        SELECT c_custkey AS node, c_custkey AS anc FROM customer
        UNION ALL
        SELECT node, anc // 10 FROM closure WHERE anc >= 10
    )
    SELECT anc, CAST(COUNT(*) AS BIGINT) AS n_desc,
           CAST(SUM(CAST(c.c_acctbal AS DECIMAL(27,2))) AS DOUBLE)
             AS subtree_total
    FROM closure JOIN customer c ON c.c_custkey = closure.node
    GROUP BY anc
    """,
)
def analytic_hierarchy_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical (org-chart / bill-of-materials) subtree rollup:
    account balances aggregated up a customer tree where
    parent(c) = c div 10 — every node's total covers ALL transitive
    descendants including itself, the query a recursive CTE answers in
    a warehouse. The ORACLE is exactly that recursive CTE; the engine
    side expands the ancestor closure as a bounded EXPLODE whose depth
    is derived PER ROW from the key's digit count (length of the
    decimal string), so scale-up can never silently drop deep
    ancestors (r7 ADVICE: a fixed sequence(0,5) under-rolled at
    c_custkey >= 10^6 — computable parent functions need no joins;
    pointer-style parents would use the iterated self-join /
    path-doubling form, same downstream agg). Decimal-exact sums.
    Scale: closure is ≤ depth× the table, one hash agg on the ancestor
    key — no recursion state on the driver."""
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", F.col("c_acctbal").cast("decimal(27,2)").alias("bal")
    )
    closure = cust.select(
        "bal",
        F.explode(
            F.expr(
                """
                filter(
                  transform(sequence(0, length(cast(c_custkey as string)) - 1), k -> CASE
                    WHEN k = 0 THEN c_custkey
                    WHEN c_custkey div cast(pow(10, k - 1) as bigint) >= 10
                      THEN c_custkey div cast(pow(10, k) as bigint)
                    ELSE NULL END),
                  x -> x IS NOT NULL)
                """
            )
        ).alias("anc"),
    )
    return closure.groupBy("anc").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_desc"),
        F.sum("bal").cast("double").alias("subtree_total"),
    )


@register(
    "analytic_hierarchy_recursive",
    oracle="""
    WITH RECURSIVE closure AS (
        SELECT c_custkey AS node, c_custkey AS anc FROM customer
        UNION ALL
        SELECT node, anc // 10 FROM closure WHERE anc >= 10
    )
    SELECT anc, CAST(COUNT(*) AS BIGINT) AS n_desc,
           CAST(SUM(CAST(c.c_acctbal AS DECIMAL(27,2))) AS DOUBLE)
             AS subtree_total
    FROM closure JOIN customer c ON c.c_custkey = closure.node
    GROUP BY anc
    """,
)
def analytic_hierarchy_recursive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NATIVE recursive-CTE twin of `analytic_hierarchy_rollup`: the
    same ancestor-closure subtree rollup written as Spark 4's
    `WITH RECURSIVE` (probed supported on PySpark 4.1.2 this round —
    round-9 VERDICT task 3), mirroring the DuckDB oracle text
    one-for-one instead of the bounded-explode closure. True
    recursion: no depth parameter anywhere — the fixpoint terminates
    when `anc >= 10` stops producing rows, at ANY key magnitude.
    Decimal-exact sums as in the twin. Scale: each recursion level is
    one distributed UNION step (closure rows ≤ depth x |customer|),
    followed by one hash agg on the ancestor key; recursion depth =
    digit count (~7 at 100 TB keys), far under Spark's recursion
    level limit (default 100)."""
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", F.col("c_acctbal").cast("decimal(27,2)").alias("bal")
    )
    return spark.sql(
        """
        WITH RECURSIVE closure AS (
            SELECT c_custkey AS node, c_custkey AS anc FROM {cust}
            UNION ALL
            SELECT node, anc div 10 FROM closure WHERE anc >= 10
        )
        SELECT anc,
               CAST(COUNT(*) AS BIGINT) AS n_desc,
               CAST(SUM(c.bal) AS DOUBLE) AS subtree_total
        FROM closure JOIN {cust} c ON c.c_custkey = closure.node
        GROUP BY anc
        """,
        cust=cust,
    )


@register(
    "analytic_merge_intervals",
    oracle="""
    WITH spans AS (
        SELECT event_type, user_id,
               epoch_us(ts) AS s,
               epoch_us(ts) + 2700000000 AS e
        FROM events
    ), marked AS (
        SELECT event_type, user_id, s, e,
               CASE WHEN s > COALESCE(MAX(e) OVER (
                        PARTITION BY event_type, user_id ORDER BY s, e
                        ROWS BETWEEN UNBOUNDED PRECEDING
                        AND 1 PRECEDING), -1)
                    THEN 1 ELSE 0 END AS is_new
        FROM spans
    ), islands AS (
        SELECT event_type, user_id, s, e,
               SUM(is_new) OVER (PARTITION BY event_type, user_id
                                 ORDER BY s, e
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND CURRENT ROW) AS island
        FROM marked
    ), merged AS (
        SELECT event_type, user_id, island,
               MIN(s) AS start_s, MAX(e) AS end_s,
               CAST(COUNT(*) AS BIGINT) AS n_spans
        FROM islands GROUP BY 1, 2, 3
    )
    SELECT event_type, user_id,
           CAST(COUNT(*) AS BIGINT) AS n_intervals,
           CAST(SUM(end_s - start_s) // 1000000 AS BIGINT)
             AS covered_seconds,
           CAST(SUM(n_spans) AS BIGINT) AS n_spans,
           CAST(MAX(end_s - start_s) // 1000000 AS BIGINT)
             AS longest_interval
    FROM merged GROUP BY 1, 2
    """,
)
def analytic_merge_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval COALESCING (merge overlapping spans) — the
    gaps-and-islands variant `analytic_sessionize` does NOT cover:
    each event carries a DURATION (45-minute activity span, tracked in
    exact MICROSECONDS — epoch seconds diverge on fractional
    timestamps: DuckDB's epoch cast rounds where Spark's
    unix_timestamp truncates), and
    overlapping or contained spans fuse into maximal covered
    intervals — the utilization/on-call-coverage/downtime-merge
    primitive. The classic two-window rewrite: a span starts a new
    island iff its start exceeds the RUNNING MAX of all previous
    ends (running max, not lag(e) — containment breaks the naive
    lag form), then the island id is the running sum of those
    flags; per-(series, user) interval counts, covered seconds and
    longest run are all integer-exact. Scale: two windows + two hash
    aggs, all partitioned by the (type, user) series key — no join,
    no self-comparison; the running-max trick is what keeps 100 TB
    of spans a linear per-partition scan instead of an
    interval-overlap self-join."""
    from pyspark.sql import Window

    events = load_table(spark, sf_dir, "events")
    spans = events.select(
        "event_type",
        "user_id",
        F.unix_micros("ts").alias("s"),
        (F.unix_micros("ts") + 2700000000).alias("e"),
    )
    wprev = (
        Window.partitionBy("event_type", "user_id")
        .orderBy("s", "e")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    marked = spans.withColumn(
        "is_new",
        F.when(
            F.col("s") > F.coalesce(F.max("e").over(wprev), F.lit(-1)),
            1,
        ).otherwise(0),
    )
    wcum = (
        Window.partitionBy("event_type", "user_id")
        .orderBy("s", "e")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    islands = marked.withColumn("island", F.sum("is_new").over(wcum))
    merged = islands.groupBy("event_type", "user_id", "island").agg(
        F.min("s").alias("start_s"),
        F.max("e").alias("end_s"),
        F.count(F.lit(1)).cast("bigint").alias("n_spans"),
    )
    return merged.groupBy("event_type", "user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_intervals"),
        F.expr("CAST(SUM(end_s - start_s) div 1000000 AS BIGINT)")
        .alias("covered_seconds"),
        F.sum("n_spans").cast("bigint").alias("n_spans"),
        F.expr("CAST(MAX(end_s - start_s) div 1000000 AS BIGINT)")
        .alias("longest_interval"),
    )
