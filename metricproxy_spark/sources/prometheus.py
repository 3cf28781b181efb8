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


# --------------------------------------------------------------- OpenMetrics
# Public spec: OpenMetrics (prometheus/OpenMetrics specification.md) —
# the strict successor of the classic exposition format above. Deltas
# this parser enforces / surfaces:
#
# - timestamps are SECONDS (optionally fractional), not milliseconds;
# - a sample may carry an EXEMPLAR after ``# ``:
#       name{l="v"} 17 1234.5 # {trace_id="abc"} 0.67 1234.1
# - ``# UNIT name unit`` metadata joins ``# TYPE`` in the registry;
# - an exposition MUST end with exactly ``# EOF`` — a missing/non-final
#   EOF means the scrape was TRUNCATED and the whole exposition is
#   malformed (enforced per exposition by :func:`openmetrics_eof_gate`).

# name, {labels}?, value, ts-seconds?, then an optional exemplar block:
# " # " + {labels} + value + ts-seconds?
_OM_SAMPLE_RE = (
    r"^([a-zA-Z_:][a-zA-Z0-9_:]*)(\{[^}]*\})?"
    r"\s+([^\s#]+)(?:\s+([0-9]+(?:\.[0-9]+)?))?"
    r"(?:\s+#\s+(\{[^}]*\})\s+([^\s#]+)(?:\s+([0-9]+(?:\.[0-9]+)?))?)?"
    r"\s*$"
)
_OM_META_RE = r"^# (TYPE|UNIT|HELP) ([a-zA-Z_:][a-zA-Z0-9_:]*) (.*)$"


def _om_label_map(raw: str):
    """``{k="v",...}`` capture → MAP (same tolerated subset as the
    classic parser: no escaped quotes/commas inside label values)."""
    return F.when(
        F.length(raw) > 2,
        F.expr(
            f"str_to_map(regexp_replace(substring({raw}, 2, "
            f"length({raw}) - 2), '\"', ''), ',', '=')"
        ),
    ).otherwise(F.create_map().cast("map<string,string>"))


def parse_openmetrics_metadata(
    df: DataFrame, line_col: str = "line"
) -> DataFrame:
    """``# TYPE`` / ``# UNIT`` metadata lines → one registry row per
    metric: (metric, prom_type, unit). HELP is recognized (so it never
    leaks into samples) but not materialized — free-text is not a
    dimension."""
    kind = F.regexp_extract(F.col(line_col), _OM_META_RE, 1)
    name = F.regexp_extract(F.col(line_col), _OM_META_RE, 2)
    rest = F.regexp_extract(F.col(line_col), _OM_META_RE, 3)
    meta = df.select(
        kind.alias("_kind"), name.alias("metric"), rest.alias("_rest")
    ).where(F.col("_kind").isin("TYPE", "UNIT"))
    return meta.groupBy("metric").agg(
        F.max(F.when(F.col("_kind") == "TYPE", F.col("_rest"))).alias(
            "prom_type"
        ),
        F.max(F.when(F.col("_kind") == "UNIT", F.col("_rest"))).alias("unit"),
    )


def parse_openmetrics_lines(
    df: DataFrame, line_col: str = "line"
) -> DataFrame:
    """OpenMetrics sample lines → (metric, labels MAP, value DOUBLE,
    ts_ms BIGINT, exemplar_labels MAP, exemplar_value DOUBLE,
    exemplar_ts_ms BIGINT).

    Timestamps are SECONDS with an optional fraction (the OpenMetrics
    rule; classic exposition used integer milliseconds) — converted to
    integer milliseconds through DECIMAL(20,3) x 1000, so any
    millisecond-resolution fraction round-trips exactly. Exemplar
    fields are NULL when the sample carries none."""
    c = F.col(line_col)
    ext = {i: F.regexp_extract(c, _OM_SAMPLE_RE, i) for i in range(1, 8)}
    ms = lambda s: (  # noqa: E731 — seconds-string -> exact millis
        F.expr(f"try_cast({s} AS DECIMAL(20,3)) * 1000").cast("bigint")
    )
    out = (
        df.select(
            ext[1].alias("metric"),
            ext[2].alias("_lab"),
            ext[3].alias("_val"),
            ext[4].alias("_ts"),
            ext[5].alias("_exlab"),
            ext[6].alias("_exval"),
            ext[7].alias("_exts"),
        )
        .where(F.col("metric") != "")
        .select(
            "metric",
            _om_label_map("_lab").alias("labels"),
            F.expr("try_cast(_val AS DOUBLE)").alias("value"),
            ms("_ts").alias("ts_ms"),
            F.when(F.col("_exlab") != "", _om_label_map("_exlab")).alias(
                "exemplar_labels"
            ),
            F.expr("try_cast(_exval AS DOUBLE)").alias("exemplar_value"),
            ms("_exts").alias("exemplar_ts_ms"),
        )
        .where(F.col("value").isNotNull())
    )
    return out


def openmetrics_eof_gate(
    df: DataFrame, scrape_col: str, lineno_col: str, line_col: str = "line"
) -> DataFrame:
    """Per-exposition ``# EOF`` framing check → a 1-row gate frame
    with a single column ``n_bad`` (always 0 when it survives).

    The OpenMetrics spec requires the exposition to end with exactly
    ``# EOF``; anything else means the scrape was truncated mid-body
    and MUST be rejected as a whole. Cross-joining the (broadcast,
    1-row) gate onto the parsed samples and FILTERING on ``n_bad``
    makes the parse FAIL at execution time (``assert_true`` raises)
    if any exposition is unterminated — distributed, no driver-side
    action. The assertion is embedded INSIDE the ``n_bad`` expression
    so column pruning can never optimize the check away. Scale: one
    per-scrape max_by aggregation over line numbers, scrape-cardinality
    sized."""
    last = df.groupBy(scrape_col).agg(
        F.max_by(F.col(line_col), F.col(lineno_col)).alias("_last")
    )
    return last.agg(
        F.coalesce(
            F.sum((F.col("_last") != "# EOF").cast("bigint")),
            F.lit(0).cast("bigint"),  # zero expositions = zero bad
        ).alias("_n_bad0")
    ).select(
        F.when(
            F.assert_true(
                F.col("_n_bad0") == 0,
                F.lit("OpenMetrics exposition not terminated by # EOF"),
            ).isNull(),
            F.col("_n_bad0"),
        ).alias("n_bad")
    )
