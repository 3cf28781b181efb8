"""Graphite tagged-metric wire format: synthesis, parse, aggregation.

Public spec: Graphite docs "Graphite Tag Support"
(graphite.readthedocs.io/en/latest/tags.html) — the plaintext carbon
line grows inline tags: ``name;tag1=v1;tag2=v2 value timestamp``.
Tag keys sort lexically on the wire in graphite's canonical form; the
parser here accepts any order (``str_to_map``).

Shared by the at-rest query (`ingest_graphite_tags`) — same shape as
:mod:`metricproxy_spark.sources.statsd`: one parser, deterministic
synthesis from the events table so a DuckDB oracle can mirror the
whole roundtrip without parsing anything.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# path;tags... value epoch_seconds — tags section may be empty.
_RX = r"^([^;\s]+)((?:;[^=\s;]+=[^;\s]+)*)\s+(\S+)\s+(\d+)$"


def graphite_wire_lines(events: DataFrame) -> Column:
    """One deterministic tagged carbon line per event row. Every 9th
    line is emitted UNtagged (plain carbon path) so the empty-tags
    branch of the grammar occurs on the wire; values render through
    the DECIMAL(27,4) text form (the same exactness roundtrip as the
    statsd/influx wires)."""
    tags = F.when(F.col("event_id") % 9 == 0, F.lit("")).otherwise(
        F.concat(
            F.lit(";host=h"),
            (F.col("user_id") % 5).cast("string"),
            F.lit(";region=r"),
            (F.col("user_id") % 3).cast("string"),
        )
    )
    return F.concat(
        F.col("event_type"),
        F.lit(".latency"),
        tags,
        F.lit(" "),
        F.col("value").cast("decimal(27,4)").cast("string"),
        F.lit(" "),
        F.unix_timestamp("ts").cast("string"),
    )


def parse_graphite_lines(df: DataFrame, line_col: str = "line") -> DataFrame:
    """C-stage parse: one JVM regexp splits path / tag-block / value /
    timestamp; ``str_to_map`` over the tag block handles the general
    n-tag case (not positional groups). Untagged lines get an empty
    map. Malformed lines drop (empty path). Whole-stage codegen
    throughout — map-only, scan-parallel at any scale."""
    g = lambda i: F.regexp_extract(F.col(line_col), _RX, i)  # noqa: E731
    parsed = df.select(
        g(1).alias("name"),
        g(2).alias("tag_block"),
        g(3).try_cast("double").alias("value"),
        g(4).try_cast("bigint").alias("ts_sec"),
    ).where(F.col("name") != "")
    tags = F.when(
        F.col("tag_block") == "", F.expr("map()")
    ).otherwise(F.expr("str_to_map(substring(tag_block, 2), ';', '=')"))
    return parsed.withColumn("tags", tags).drop("tag_block")


def aggregate_graphite(parsed: DataFrame) -> DataFrame:
    """Rollup per (name, host-tag): point count, exact-decimal value
    total, observed time range. Untagged lines group under host NULL
    — kept (they are legal carbon traffic), so the oracle must model
    the same bucket. One hash agg with map-side combine."""
    host = F.col("tags").getItem("host")
    return (
        parsed.groupBy(F.col("name"), host.alias("host"))
        .agg(
            F.count(F.lit(1)).alias("n_points"),
            F.sum(F.col("value").cast("decimal(27,4)"))
            .cast("double")
            .alias("sum_value"),
            F.min("ts_sec").alias("min_ts_sec"),
            F.max("ts_sec").alias("max_ts_sec"),
        )
    )
