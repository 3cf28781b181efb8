"""Scalar-function surface queries (SURVEY §3.6 X18-X23).

Map functions (X22) are exercised by the ingest queries (create_map,
str_to_map, transform_keys, map_filter, element_at); this module covers
string, date/time, math, array and JSON families. Function names differ
between Spark and DuckDB (split vs string_split, get_json_object vs
json_extract_string, 1- vs 0-based arrays) — each oracle is written in
explicit DuckDB dialect.

Determinism: libm functions (ln/sqrt/pow) may differ in the last ulp
across engines, so math outputs are rounded to 9 significant decimals
on BOTH sides before aggregation (collision probability ~1e-7/row).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from metricproxy_spark.functions.aggregates import dsum, dsum_sql
from metricproxy_spark.io import load_table
from metricproxy_spark.registry import register


@register(
    "analytic_string_funcs",
    oracle="""
    SELECT p_partkey,
           upper(p_name) AS name_upper,
           substring(p_name, 1, 8) AS name_prefix,
           length(p_name) AS name_len,
           string_split(p_name, ' ')[1] AS first_word,
           regexp_replace(p_name, '[aeiou]', '_', 'g') AS name_devoweled,
           concat_ws('|', p_brand, p_type) AS brand_type,
           trim('  ' || p_brand || '  ') AS brand_trim,
           CASE WHEN p_name LIKE '%steel%' THEN 1 ELSE 0 END AS has_steel
    FROM part
    """,
)
def analytic_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X18: upper/substring/length/split/regexp_replace/concat_ws/trim/LIKE."""
    part = load_table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.substring("p_name", 1, 8).alias("name_prefix"),
        F.length("p_name").cast("bigint").alias("name_len"),
        F.get(F.split("p_name", " "), 0).alias("first_word"),
        F.regexp_replace("p_name", "[aeiou]", "_").alias("name_devoweled"),
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
        F.trim(F.concat(F.lit("  "), F.col("p_brand"), F.lit("  "))).alias(
            "brand_trim"
        ),
        F.when(F.col("p_name").like("%steel%"), 1).otherwise(0).alias("has_steel"),
    )


@register(
    "analytic_datetime_funcs",
    oracle="""
    SELECT o_orderkey,
           EXTRACT(year FROM o_orderdate) AS order_year,
           EXTRACT(month FROM o_orderdate) AS order_month,
           EXTRACT(day FROM o_orderdate) AS order_day,
           EXTRACT(quarter FROM o_orderdate) AS order_quarter,
           dayofweek(o_orderdate) + 1 AS order_dow,
           weekofyear(o_orderdate) AS order_week,
           date_trunc('month', o_orderdate) AS month_start,
           date_diff('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate) AS days_since_epoch_start,
           CAST(floor(epoch(o_orderdate)) AS BIGINT) AS epoch_s
    FROM orders
    """,
)
def analytic_datetime_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X19: year/month/day/quarter/dow/week/date_trunc/datediff/epoch.
    Convention deltas handled on the oracle side: DuckDB dayofweek is
    0=Sunday vs Spark 1=Sunday."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.year("o_orderdate").cast("bigint").alias("order_year"),
        F.month("o_orderdate").cast("bigint").alias("order_month"),
        F.dayofmonth("o_orderdate").cast("bigint").alias("order_day"),
        F.quarter("o_orderdate").cast("bigint").alias("order_quarter"),
        F.dayofweek("o_orderdate").cast("bigint").alias("order_dow"),
        F.weekofyear("o_orderdate").cast("bigint").alias("order_week"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        F.datediff(
            F.col("o_orderdate"), F.lit("1995-01-01").cast("timestamp")
        ).cast("bigint").alias("days_since_epoch_start"),
        F.unix_timestamp("o_orderdate").alias("epoch_s"),
    )


@register(
    "analytic_math_funcs",
    oracle=f"""
    WITH rowvals AS (
        SELECT l_returnflag,
               round(l_extendedprice * l_discount, 4) AS discount_amt,
               abs(l_discount - 0.05) AS disc_dev,
               floor(l_extendedprice) AS price_floor,
               ceil(l_extendedprice) AS price_ceil,
               round(sqrt(l_extendedprice), 9) AS price_sqrt,
               round(ln(l_extendedprice + 1), 9) AS price_ln,
               round(pow(1 + l_discount, 2), 9) AS disc_sq
        FROM lineitem
    )
    SELECT l_returnflag,
           {dsum_sql('discount_amt', 4)} AS sum_discount_amt,
           {dsum_sql('disc_dev', 6)} AS sum_disc_dev,
           {dsum_sql('price_floor', 0)} AS sum_price_floor,
           {dsum_sql('price_ceil', 0)} AS sum_price_ceil,
           {dsum_sql('price_sqrt', 9)} AS sum_price_sqrt,
           {dsum_sql('price_ln', 9)} AS sum_price_ln,
           {dsum_sql('disc_sq', 9)} AS sum_disc_sq
    FROM rowvals
    GROUP BY l_returnflag
    """,
)
def analytic_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X20: round/abs/floor/ceil/sqrt/ln/pow, row-level then exact-summed.

    The seven per-row rounds + decimal casts are the cost (each walks a
    BigDecimal); a single-row-group local input runs them all on ONE
    core, so spread() the 3 needed columns first — a few-MB round-robin
    shuffle that buys a cores-wide agg stage, and a no-op at real scale
    where the scan already has thousands of splits (measured 3.3 s →
    ~1.4 s at local[32])."""
    from metricproxy_spark.io import spread

    li = spread(
        load_table(spark, sf_dir, "lineitem").select(
            "l_returnflag", "l_extendedprice", "l_discount"
        ),
        spark,
    )
    price, disc = F.col("l_extendedprice"), F.col("l_discount")
    rowvals = li.select(
        "l_returnflag",
        F.round(price * disc, 4).alias("discount_amt"),
        F.abs(disc - 0.05).alias("disc_dev"),
        F.floor(price).cast("double").alias("price_floor"),
        F.ceil(price).cast("double").alias("price_ceil"),
        F.round(F.sqrt(price), 9).alias("price_sqrt"),
        F.round(F.log(price + 1), 9).alias("price_ln"),
        F.round(F.pow(disc + 1, 2), 9).alias("disc_sq"),
    )
    return rowvals.groupBy("l_returnflag").agg(
        dsum("discount_amt", 4).alias("sum_discount_amt"),
        dsum("disc_dev", 6).alias("sum_disc_dev"),
        dsum("price_floor", 0).alias("sum_price_floor"),
        dsum("price_ceil", 0).alias("sum_price_ceil"),
        dsum("price_sqrt", 9).alias("sum_price_sqrt"),
        dsum("price_ln", 9).alias("sum_price_ln"),
        dsum("disc_sq", 9).alias("sum_disc_sq"),
    )


@register(
    "analytic_array_funcs",
    oracle="""
    SELECT doc_id,
           len(string_split(text, ' ')) AS n_words,
           len(list_distinct(string_split(text, ' '))) AS n_distinct_words,
           string_split(text, ' ')[1] AS first_word,
           string_split(text, ' ')[-1] AS last_word,
           CAST(list_contains(string_split(text, ' '), 'query') AS INTEGER)
               AS has_query,
           list_max(list_transform(string_split(text, ' '), w -> length(w)))
               AS longest_word_len,
           list_sort(list_distinct(string_split(text, ' ')))[1]
               AS first_alpha_word
    FROM documents
    """,
)
def analytic_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X21: size/distinct/element_at/contains + higher-order transform,
    array_max, sort_array over tokenized documents."""
    docs = load_table(spark, sf_dir, "documents")
    words = F.split(F.col("text"), " ")
    return docs.select(
        "doc_id",
        F.size(words).cast("bigint").alias("n_words"),
        F.size(F.array_distinct(words)).cast("bigint").alias("n_distinct_words"),
        F.get(words, 0).alias("first_word"),
        F.element_at(words, -1).alias("last_word"),
        F.array_contains(words, "query").cast("int").alias("has_query"),
        F.array_max(F.transform(words, lambda w: F.length(w)))
        .cast("bigint")
        .alias("longest_word_len"),
        F.get(F.sort_array(F.array_distinct(words)), 0).alias("first_alpha_word"),
    )


@register(
    "analytic_json_funcs",
    oracle=f"""
    SELECT event_type,
           count(*) AS n_events,
           min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
           max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k,
           {dsum_sql("CAST(json_extract_string(props, '$.k') AS BIGINT)", 0)} AS sum_k
    FROM events
    GROUP BY event_type
    """,
)
def analytic_json_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X23: JSON path extraction over the events.props payload column
    (the reference's event Properties map encoded as JSON, SURVEY §2.2)."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min(k).alias("min_k"),
        F.max(k).alias("max_k"),
        dsum(k, 0).alias("sum_k"),
    )


@register(
    "analytic_map_funcs",
    oracle="""
    SELECT event_id,
           upper(event_type) AS type_val,
           3 AS n_keys,
           array_to_string(list_sort([
               'proxy=MP',
               'type=' || upper(event_type),
               'user=' || CAST(user_id AS VARCHAR)
           ]), ',') AS entries
    FROM events
    """,
)
def analytic_map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X23+ MAP expression surface over the open dimensions model (the
    reference's ``Dimensions map[string]string`` is MAP<STRING,STRING>
    in the canonical schema): construct, transform_values, map_filter,
    map_concat, element_at — all JVM-side map primitives an enrichment
    middleware needs. Maps don't hash stably across engines, so the
    result projects entries as a sorted joined string; the oracle
    hand-builds the same strings, value-checking the map pipeline's
    NET semantics."""
    ev = load_table(spark, sf_dir, "events")
    dims = F.create_map(
        F.lit("user"), F.col("user_id").cast("string"),
        F.lit("type"), F.col("event_type"),
        F.lit("src"), F.lit("carbon"),
    )
    staged = ev.select("event_id", dims.alias("dims"))
    upcased = F.transform_values(
        "dims", lambda k, v: F.upper(v)
    )
    s2 = staged.select("event_id", upcased.alias("up"))
    filtered = F.map_filter("up", lambda k, v: k != F.lit("src"))
    s3 = s2.select("event_id", filtered.alias("flt"))
    merged = F.map_concat(
        "flt", F.create_map(F.lit("proxy"), F.lit("MP"))
    )
    s4 = s3.select("event_id", merged.alias("m"))
    entries = F.array_join(
        F.sort_array(
            F.transform(
                F.map_entries("m"),
                lambda e: F.concat(e.key, F.lit("="), e.value),
            )
        ),
        ",",
    )
    return s4.select(
        "event_id",
        F.element_at("m", F.lit("type")).alias("type_val"),
        F.size("m").alias("n_keys"),
        entries.alias("entries"),
    )


@register(
    "analytic_bitwise_funcs",
    oracle="""
    SELECT event_type,
           CAST(bit_and(event_id) AS BIGINT) AS all_and,
           CAST(bit_or(event_id) AS BIGINT) AS all_or,
           CAST(bit_xor(event_id) AS BIGINT) AS all_xor,
           CAST(sum(CASE WHEN event_id & 7 = 0 THEN 1 ELSE 0 END)
             AS BIGINT) AS low3_zero,
           CAST(sum(event_id >> 8) AS BIGINT) AS sum_shifted
    FROM events
    GROUP BY event_type
    """,
)
def analytic_bitwise_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X20 extension: bitwise aggregate (bit_and/or/xor) and scalar
    (&, >>) surface — integer-exact in both engines by construction."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.bit_and("event_id").cast("bigint").alias("all_and"),
        F.bit_or("event_id").cast("bigint").alias("all_or"),
        F.bit_xor("event_id").cast("bigint").alias("all_xor"),
        F.sum(
            F.when(F.col("event_id").bitwiseAND(7) == 0, 1).otherwise(0)
        )
        .cast("bigint")
        .alias("low3_zero"),
        F.sum(F.expr("event_id >> 8")).cast("bigint").alias("sum_shifted"),
    )


@register(
    "analytic_hash_funcs",
    oracle="""
    SELECT doc_id,
           sha256(text) AS sha_hex,
           md5(text) AS md5_hex,
           CAST(length(sha256(text)) AS INT) AS sha_len
    FROM documents
    """,
)
def analytic_hash_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-surface: cryptographic digests as portable row identities —
    sha2-256 and md5 hex must agree byte-for-byte across engines (the
    property the exact-dedup family and hash splits rest on, asserted
    directly)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.sha2("text", 256).alias("sha_hex"),
        F.md5("text").alias("md5_hex"),
        F.length(F.sha2("text", 256)).cast("int").alias("sha_len"),
    )
