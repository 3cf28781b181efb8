"""DogStatsD wire format: synthesis, parse, aggregation.

Public spec: docs.datadoghq.com "DogStatsD datagram format" — the
statsd grammar extended with an inline tag section:
``name:value|type[|@rate][|#tag1:v1,tag2:v2]``. The dominant statsd
dialect in the wild; tags are what the plain protocol lacks.

Kept separate from :mod:`metricproxy_spark.sources.statsd` (whose
parser is shared verbatim by live/streamed twins): the tag section
changes the grammar and the rollup key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_RX = (
    r"^([^:]+):([^|]+)\|([a-z]+)"
    r"(?:\|@([0-9.]+))?(?:\|#([A-Za-z0-9_.:,-]+))?$"
)


def dogstatsd_wire_lines(events: DataFrame) -> Column:
    """One deterministic datagram per event: counters (every 8th
    sampled at ``@0.5``), gauges, timers and histograms (``|h``, the
    DogStatsD-specific type), all tagged ``#env:e{user%2},host:h{user%5}``
    except every 7th line which goes untagged (plain-statsd
    compatibility branch)."""
    mtype = (
        F.when(F.col("event_id") % 4 == 0, "c")
        .when(F.col("event_id") % 4 == 1, "g")
        .when(F.col("event_id") % 4 == 2, "ms")
        .otherwise("h")
    )
    tags = F.when(F.col("event_id") % 7 == 0, F.lit("")).otherwise(
        F.concat(
            F.lit("|#env:e"),
            (F.col("user_id") % 2).cast("string"),
            F.lit(",host:h"),
            (F.col("user_id") % 5).cast("string"),
        )
    )
    return F.concat(
        F.col("event_type"),
        F.lit(".dd:"),
        F.col("value").cast("decimal(27,4)").cast("string"),
        F.lit("|"),
        mtype,
        F.when(F.col("event_id") % 8 == 0, F.lit("|@0.5")).otherwise(
            F.lit("")
        ),
        tags,
    )


def parse_dogstatsd_lines(df: DataFrame, line_col: str = "line") -> DataFrame:
    """One JVM regexp splits name/value/type/rate/tag-block;
    ``str_to_map(tags, ',', ':')`` handles the general n-tag case.
    Counter values are rate-corrected into exact DECIMAL(27,6) like
    the plain-statsd parser. Untagged lines get an empty map."""
    g = lambda i: F.regexp_extract(F.col(line_col), _RX, i)  # noqa: E731
    parsed = df.select(
        g(1).alias("name"),
        g(2).alias("raw_val"),
        g(3).alias("mtype"),
        F.nullif(g(4), F.lit("")).alias("rate_str"),
        g(5).alias("tag_block"),
    ).where(F.col("name") != "")
    tags = F.when(F.col("tag_block") == "", F.expr("map()")).otherwise(
        F.expr("str_to_map(tag_block, ',', ':')")
    )
    return (
        parsed.withColumn("tags", tags)
        .withColumn(
            "scaled",
            (
                F.col("raw_val").try_cast("double")
                / F.coalesce(F.col("rate_str").try_cast("double"), F.lit(1.0))
            ).cast("decimal(27,6)"),
        )
        .drop("tag_block")
    )


def aggregate_dogstatsd(parsed: DataFrame) -> DataFrame:
    """Rollup per (name, type, env-tag) — the tag IS the point of the
    dialect, so it lands in the key; untagged traffic groups under env
    NULL. One hash agg with map-side combine."""
    env = F.col("tags").getItem("env")
    return parsed.groupBy("name", "mtype", env.alias("env")).agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum("scaled").cast("double").alias("total"),
    )
