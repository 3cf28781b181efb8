"""SignalFx protocol listeners/forwarder transforms (SURVEY §3 rows
S2-S5, C3, C6).

v2 JSON [P: protocol/signalfx/signalfxlistener.go — JSONDecoderV2]: the
body is an object keyed by metric type — ``{"gauge": [{metric, value,
dimensions, timestamp}], "counter": [...], "cumulative_counter":
[...]}``. The decoder flattens all keys into one stream, tagging each
point with its type (C3 unpivot).

v1 JSON [P: — JSONDecoderV1]: newline-delimited ``{metric, value,
source}`` objects; the metric type comes from a registry populated via
``POST /metric`` (S5), defaulting to gauge. The registry is a tiny
dimension table → broadcast join at ingest.

Sanitization (C6) [P: signalfxforwarder.go]: dimension keys and metric
names are rewritten to the wire-legal charset before forwarding.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

SFX_POINT_SCHEMA = T.StructType(
    [
        T.StructField("metric", T.StringType(), True),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("dimensions", T.MapType(T.StringType(), T.StringType()), True),
        T.StructField("timestamp", T.LongType(), True),  # unix millis
    ]
)

SFX_V2_METRIC_TYPES = ("gauge", "counter", "cumulative_counter")

SFX_V2_BODY_SCHEMA = T.StructType(
    [
        T.StructField(mt, T.ArrayType(SFX_POINT_SCHEMA), True)
        for mt in SFX_V2_METRIC_TYPES
    ]
)

SFX_V1_LINE_SCHEMA = T.StructType(
    [
        T.StructField("metric", T.StringType(), True),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("source", T.StringType(), True),
    ]
)


def parse_sfx_v2_json(df: DataFrame, body_col: str = "body") -> DataFrame:
    """S2+C3: parse a v2 JSON body and unpivot the per-type arrays into
    a flat datapoint stream with a ``metric_type`` column.

    Implemented as ONE ``from_json`` + ONE generate: the per-type
    arrays are tagged with their key and concatenated, then exploded
    once. The earlier per-key-branch ``unionByName`` form re-scanned
    the source and re-ran ``from_json`` once per metric type (union
    children don't share subexpressions across branches); this form
    parses each body exactly once and stays shuffle-free.
    """
    parsed = df.withColumn("_body", F.from_json(F.col(body_col), SFX_V2_BODY_SCHEMA))
    empty = F.array().cast(T.ArrayType(SFX_POINT_SCHEMA))

    def _tag(mt: str) -> Column:
        # NB: the lambda must take exactly one parameter — PySpark
        # reads higher-order-function arity from the signature (a
        # second parameter would be bound to the element INDEX).
        return F.transform(
            F.coalesce(F.col("_body")[mt], empty),
            lambda p: F.struct(p.alias("pt"), F.lit(mt).alias("mt")),
        )

    tagged = F.concat(*[_tag(mt) for mt in SFX_V2_METRIC_TYPES])
    pt = F.col("_e")["pt"]
    return (
        parsed.select("*", F.explode(tagged).alias("_e"))
        .withColumns(
            {
                "metric": pt["metric"],
                "value": pt["value"],
                "metric_type": F.col("_e")["mt"],
                "ts_ms": pt["timestamp"],
                "ts": F.timestamp_millis(pt["timestamp"]),
                "dimensions": pt["dimensions"],
            }
        )
        .drop("_body", "_e")
    )


def parse_sfx_v1_json(
    df: DataFrame, registry: DataFrame, line_col: str = "line"
) -> DataFrame:
    """S4+S5: newline-JSON v1 points, metric type via registry lookup.

    ``registry`` is a (sf_metric STRING, metric_type STRING) dimension
    table; it is explicitly broadcast — it's bounded (one row per
    registered metric name) so this stays a map-side join at any fact
    scale, exactly how the reference's in-memory map behaves.
    """
    pt = F.col("_pt")
    parsed = (
        df.withColumn("_pt", F.from_json(F.col(line_col), SFX_V1_LINE_SCHEMA))
        .withColumns(
            {
                "metric": pt["metric"],
                "value": pt["value"],
                "source": pt["source"],
            }
        )
        .drop("_pt")
        .filter(F.col("metric").isNotNull())
    )
    joined = parsed.join(
        F.broadcast(registry.withColumnRenamed("metric_type", "_registered_type")),
        parsed["metric"] == registry["sf_metric"],
        "left",
    ).drop("sf_metric")
    return joined.withColumn(
        "metric_type", F.coalesce(F.col("_registered_type"), F.lit("gauge"))
    ).drop("_registered_type")


# --- C6 sanitization [P: signalfxforwarder.go — filtering helpers] ---

_LEGAL_CHARS = r"[^a-zA-Z0-9_.\-]"


def sanitize_name(col: Column | str) -> Column:
    """Replace wire-illegal characters in a metric/dimension name."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(c, _LEGAL_CHARS, "_")


def sanitize_dimension_keys(map_col: Column | str) -> Column:
    """C6 over a dimensions map: rewrite keys, values untouched."""
    c = F.col(map_col) if isinstance(map_col, str) else map_col
    return F.transform_keys(c, lambda k, _: F.regexp_replace(k, _LEGAL_CHARS, "_"))
