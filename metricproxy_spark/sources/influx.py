"""InfluxDB line protocol: synthesis, parse, and aggregation shared
by the at-rest (`ingest_influx_line`) and live-socket
(`ingest_influx_live`) paths — one parser, two transports, one
oracle.

Public spec: docs.influxdata.com line-protocol reference —
``measurement,tag=v,... field=v,...i <ns-timestamp>``. The
synthesized corpus contains no escaped commas/spaces/quotes; the
escape grammar is out of scope (documented at the query site).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_RX = r"^([^,]+),([^ ]+) ([^ ]+) (\d+)$"


def influx_wire_lines(events: DataFrame) -> Column:
    """One deterministic line per event row: two tags (host, region),
    a float field, an integer field (``i`` suffix), nanosecond
    timestamp."""
    return F.concat(
        F.col("event_type"),
        F.lit(",host=h"),
        (F.col("user_id") % 5).cast("string"),
        F.lit(",region=r"),
        (F.col("user_id") % 3).cast("string"),
        F.lit(" value="),
        F.col("value").cast("decimal(27,4)").cast("string"),
        F.lit(",count="),
        (F.col("event_id") % 100).cast("string"),
        F.lit("i "),
        (F.unix_micros("ts") * 1000).cast("string"),
    )


def parse_influx_lines(df: DataFrame, line_col: str = "line") -> DataFrame:
    """C-stage parse: one regexp splits the three sections, then
    ``str_to_map`` (still whole-stage codegen) for the general n-tag /
    n-field sets — not positional groups. Typed projection: host tag,
    double ``val``, integer ``cnt`` (``i`` suffix stripped), ns
    timestamp. Malformed lines drop (measurement '')."""
    g = lambda i: F.regexp_extract(F.col(line_col), _RX, i)  # noqa: E731
    rx_sql = _RX.replace("\\", "\\\\")
    sec = df.select(
        g(1).alias("measurement"),
        F.expr(
            f"str_to_map(regexp_extract({line_col}, '{rx_sql}', 2), ',', '=')"
        ).alias("tags"),
        F.expr(
            f"str_to_map(regexp_extract({line_col}, '{rx_sql}', 3), ',', '=')"
        ).alias("fields"),
        g(4).cast("bigint").alias("ts_ns"),
    ).where(F.col("measurement") != "")
    return sec.select(
        "measurement",
        F.col("tags")["host"].alias("host"),
        F.col("tags")["region"].alias("region"),
        F.col("fields")["value"].cast("double").alias("val"),
        F.regexp_replace(F.col("fields")["count"], "i$", "")
        .cast("bigint")
        .alias("cnt"),
        "ts_ns",
    )


def aggregate_influx(typed: DataFrame) -> DataFrame:
    """Rollup per (measurement, host): counts, exact-decimal value
    sums, integer-field sums, ts range. One hash agg with map-side
    combine."""
    return typed.groupBy("measurement", "host").agg(
        F.count(F.lit(1)).alias("n_points"),
        F.sum(F.col("val").cast("decimal(27,4)"))
        .cast("double")
        .alias("sum_value"),
        F.sum("cnt").cast("bigint").alias("sum_count"),
        F.min("ts_ns").cast("bigint").alias("min_ts_ns"),
        F.max("ts_ns").cast("bigint").alias("max_ts_ns"),
    )
