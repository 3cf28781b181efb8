"""StatsD wire format: synthesis, parse, and aggregation shared by
the at-rest (`ingest_statsd`) and live-socket (`ingest_statsd_live`)
paths — one parser, two transports, one oracle.

Public spec: github.com/statsd/statsd ``docs/metric_types.md`` —
``name:value|type[|@rate]``; counters scale by 1/rate, sets count
distinct members.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_RX = r"^([^:]+):([^|]+)\|([a-z]+)(?:\|@([0-9.]+))?$"


def statsd_wire_lines(events: DataFrame) -> Column:
    """One deterministic UDP-style line per event row: counters
    (``|c``, event_id % 8 == 0 sampled at ``@0.5``, the rest bare so
    the rate-default path occurs on the wire too), gauges (``|g``),
    timers (``|ms``) and sets (``|s`` with string members)."""
    mtype = (
        F.when(F.col("event_id") % 4 == 0, "c")
        .when(F.col("event_id") % 4 == 1, "g")
        .when(F.col("event_id") % 4 == 2, "ms")
        .otherwise("s")
    )
    val_str = F.when(
        mtype == "s", F.concat(F.lit("u"), F.col("user_id").cast("string"))
    ).otherwise(F.col("value").cast("decimal(27,4)").cast("string"))
    return F.concat(
        F.col("event_type"),
        F.lit(".h"),
        (F.col("user_id") % 5).cast("string"),
        F.lit(":"),
        val_str,
        F.lit("|"),
        mtype,
        F.when(F.col("event_id") % 8 == 0, F.lit("|@0.5")).otherwise(
            F.lit("")
        ),
    )


def parse_statsd_lines(df: DataFrame, line_col: str = "line") -> DataFrame:
    """C-stage parse: one JVM regexp (whole-stage codegen) splitting
    name / raw value / type / optional sample rate; counter values are
    rate-corrected (value/rate — ONE IEEE division, identical across
    engines) into an exact DECIMAL(27,6) ``scaled`` so downstream sums
    are order-independent. Malformed lines drop (name '')."""
    g = lambda i: F.regexp_extract(F.col(line_col), _RX, i)  # noqa: E731
    parsed = df.select(
        g(1).alias("name"),
        g(2).alias("raw_val"),
        g(3).alias("mtype"),
        F.nullif(g(4), F.lit("")).alias("rate_str"),
    ).where(F.col("name") != "")
    return parsed.withColumn(
        "scaled",
        F.when(
            F.col("mtype") != "s",
            (
                F.col("raw_val").try_cast("double")
                / F.coalesce(F.col("rate_str").try_cast("double"), F.lit(1.0))
            ).cast("decimal(27,6)"),
        ),
    )


def aggregate_statsd(parsed: DataFrame) -> DataFrame:
    """Server-side flush aggregation per (name, type): line counts,
    rate-corrected totals, distinct set cardinality. One hash agg with
    map-side combine — scan-parallel at any scale."""
    return parsed.groupBy("name", "mtype").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum("scaled").cast("double").alias("total"),
        F.when(
            F.first("mtype") == "s",
            F.count_distinct(
                F.when(F.col("mtype") == "s", F.col("raw_val"))
            ),
        ).alias("n_members"),
    )
