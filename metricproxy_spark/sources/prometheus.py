"""Prometheus exposition-format ingest (engine extension to the §3.1
source family — the pull-scrape sibling of the push listeners).

The text exposition format (public spec: prometheus.io/docs/instrumenting/exposition_formats)
is line-oriented::

    # HELP http_requests_total The total number of HTTP requests.
    # TYPE http_requests_total counter
    http_requests_total{method="post",code="200"} 1027 1395066363000

- ``# TYPE name kind`` comments declare the metric kind — the same
  side-channel role as the sfx v1 type registry (S5), so they are
  parsed into a (metric, kind) dimension and broadcast-joined onto the
  samples, defaulting to ``untyped``.
- Samples: metric name, optional ``{k="v",...}`` label block, value,
  optional millisecond timestamp.

All parsing is JVM-side (regexp + str_to_map, whole-stage codegen);
tolerant reader: HELP/other comments and malformed lines drop out as
non-matches of the sample regex.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# name, optional {labels}, value, optional ms timestamp
_SAMPLE_RE = (
    r"^([a-zA-Z_:][a-zA-Z0-9_:]*)(\{[^}]*\})?\s+(\S+)(?:\s+(-?\d+))?\s*$"
)
_TYPE_RE = r"^# TYPE ([a-zA-Z_:][a-zA-Z0-9_:]*) ([a-z]+)\s*$"


def parse_prometheus_types(df: DataFrame, line_col: str = "line") -> DataFrame:
    """``# TYPE`` comment lines → (metric, prom_type) dimension rows."""
    name = F.regexp_extract(F.col(line_col), _TYPE_RE, 1)
    kind = F.regexp_extract(F.col(line_col), _TYPE_RE, 2)
    return (
        df.select(name.alias("metric"), kind.alias("prom_type"))
        .where(F.col("metric") != "")
        .distinct()
    )


def parse_prometheus_lines(df: DataFrame, line_col: str = "line") -> DataFrame:
    """Sample lines → (metric, labels MAP, value DOUBLE, ts_ms BIGINT).

    Non-sample lines (comments, blanks, garbage) are dropped. Label
    values must not contain escaped quotes/commas (tolerated subset;
    the scrape fixtures never emit them)."""
    m = F.regexp_extract(F.col(line_col), _SAMPLE_RE, 1)
    lab = F.regexp_extract(F.col(line_col), _SAMPLE_RE, 2)
    val = F.regexp_extract(F.col(line_col), _SAMPLE_RE, 3)
    ts = F.regexp_extract(F.col(line_col), _SAMPLE_RE, 4)
    labels = F.when(
        F.length(F.col("_lab")) > 2,
        F.expr(
            "str_to_map(regexp_replace(substring(_lab, 2, "
            "length(_lab) - 2), '\"', ''), ',', '=')"
        ),
    ).otherwise(F.create_map().cast("map<string,string>"))
    return (
        df.select(
            m.alias("metric"),
            lab.alias("_lab"),
            val.alias("_val"),
            ts.alias("_ts"),
        )
        .where((F.col("metric") != "") & ~F.col("metric").startswith("#"))
        .select(
            "metric",
            labels.alias("labels"),
            F.expr("try_cast(_val AS DOUBLE)").alias("value"),
            F.expr("try_cast(_ts AS BIGINT)").alias("ts_ms"),
        )
        .where(F.col("value").isNotNull())
    )


def with_prometheus_types(
    samples: DataFrame, types: DataFrame
) -> DataFrame:
    """Attach the TYPE registry (broadcast — bounded by metric-name
    cardinality, like the sfx v1 registry) with ``untyped`` default."""
    return samples.join(F.broadcast(types), "metric", "left").withColumn(
        "prom_type", F.coalesce(F.col("prom_type"), F.lit("untyped"))
    )
