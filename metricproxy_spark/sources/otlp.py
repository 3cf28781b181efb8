"""OpenTelemetry OTLP/JSON metrics: synthesis, parse, aggregation.

Public spec: opentelemetry-proto ``metrics/v1/metrics.proto`` +
the proto3 JSON mapping (``ExportMetricsServiceRequest``):
``resourceMetrics[] -> scopeMetrics[] -> metrics[]`` where each metric
carries exactly one data oneof (``gauge`` / ``sum`` here), datapoint
attributes are ``[{key, value: {stringValue}}]`` pairs, and uint64
``timeUnixNano`` serializes as a JSON STRING. OTLP is the successor
wire format to the carbon/collectd/sfx generation the proxy family
terminates — a modern deployment ingests this first.

Design: the whole request/parse path stays JVM-side — ``to_json`` /
``from_json`` with an explicit schema (never schema inference), three
``explode``s down the nesting, ``F.filter`` for attribute lookup. No
Python. Synthesis batches one request per (metric, series) group so
dataPoints arrays are genuinely multi-element; at 100 TB the same
grouped build holds because group size is bounded by series cadence
(the collect_list buffer is one series' points for the batch window,
the same bound every OTLP exporter has).

Exactness: ``asDouble`` goes through the DECIMAL(27,4) text roundtrip
before JSON; Jackson writes the shortest round-trip double repr and
``from_json`` restores the identical IEEE value, so the DuckDB oracle
mirrors the synthesis arithmetic directly and never touches JSON.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DoubleType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

_KV = ArrayType(
    StructType(
        [
            StructField("key", StringType()),
            StructField(
                "value",
                StructType([StructField("stringValue", StringType())]),
            ),
        ]
    )
)

_DP = ArrayType(
    StructType(
        [
            StructField("attributes", _KV),
            StructField("timeUnixNano", StringType()),
            StructField("asDouble", DoubleType()),
        ]
    )
)

OTLP_SCHEMA = StructType(
    [
        StructField(
            "resourceMetrics",
            ArrayType(
                StructType(
                    [
                        StructField(
                            "resource",
                            StructType([StructField("attributes", _KV)]),
                        ),
                        StructField(
                            "scopeMetrics",
                            ArrayType(
                                StructType(
                                    [
                                        StructField(
                                            "scope",
                                            StructType(
                                                [
                                                    StructField(
                                                        "name", StringType()
                                                    )
                                                ]
                                            ),
                                        ),
                                        StructField(
                                            "metrics",
                                            ArrayType(
                                                StructType(
                                                    [
                                                        StructField(
                                                            "name",
                                                            StringType(),
                                                        ),
                                                        StructField(
                                                            "gauge",
                                                            StructType(
                                                                [
                                                                    StructField(
                                                                        "dataPoints",
                                                                        _DP,
                                                                    )
                                                                ]
                                                            ),
                                                        ),
                                                        StructField(
                                                            "sum",
                                                            StructType(
                                                                [
                                                                    StructField(
                                                                        "aggregationTemporality",
                                                                        IntegerType(),
                                                                    ),
                                                                    StructField(
                                                                        "isMonotonic",
                                                                        BooleanType(),
                                                                    ),
                                                                    StructField(
                                                                        "dataPoints",
                                                                        _DP,
                                                                    ),
                                                                ]
                                                            ),
                                                        ),
                                                    ]
                                                )
                                            ),
                                        ),
                                    ]
                                )
                            ),
                        ),
                    ]
                )
            ),
        )
    ]
)


def _kv(key: Column | str, value: Column) -> Column:
    k = F.lit(key) if isinstance(key, str) else key
    return F.struct(
        k.alias("key"),
        F.struct(value.alias("stringValue")).alias("value"),
    )


def otlp_request_json(events: DataFrame) -> DataFrame:
    """OTLP/JSON ``ExportMetricsServiceRequest`` strings, batched the
    way real exporters batch: one request per ``user_id % 23`` bucket,
    its ``metrics`` array holding every (event_type, user_id) series
    of the bucket — even user_ids as ``gauge``, odd as cumulative
    monotonic ``sum`` (temporality 2). Metrics are sorted by
    (name, series, type) and dataPoints by (time, id) inside their
    arrays so the JSON text is deterministic. Returns a one-column
    ``request`` frame. Batch-size bound: a bucket holds at most
    #series/23 metrics — the same bounded-batch contract every OTLP
    exporter has; the flattened parse+agg result is invariant to the
    batching, which is what the oracle checks."""
    is_gauge = F.col("user_id") % 2 == 0
    dp = F.struct(
        F.array(
            _kv("host", F.concat(F.lit("h"), (F.col("user_id") % 5).cast("string")))
        ).alias("attributes"),
        (F.unix_micros("ts") * 1000).cast("string").alias("timeUnixNano"),
        F.col("value")
        .cast("decimal(27,4)")
        .cast("string")
        .cast("double")
        .alias("asDouble"),
    )
    grouped = (
        events.select(
            "event_type",
            "user_id",
            is_gauge.alias("is_gauge"),
            F.struct(
                F.unix_micros("ts").alias("_ts"),
                F.col("event_id").alias("_id"),
                dp.alias("dp"),
            ).alias("keyed"),
        )
        .groupBy("event_type", "user_id", "is_gauge")
        .agg(F.sort_array(F.collect_list("keyed")).alias("keyed"))
        .withColumn("dps", F.col("keyed.dp"))
    )
    metric = F.struct(
        F.col("event_type").alias("name"),
        F.when(
            F.col("is_gauge"),
            F.struct(F.col("dps").alias("dataPoints")),
        ).alias("gauge"),
        F.when(
            ~F.col("is_gauge"),
            F.struct(
                F.lit(2).alias("aggregationTemporality"),
                F.lit(True).alias("isMonotonic"),
                F.col("dps").alias("dataPoints"),
            ),
        ).alias("sum"),
    )
    batched = (
        grouped.select(
            (F.col("user_id") % 23).alias("batch"),
            F.struct(
                F.col("event_type").alias("_name"),
                F.col("user_id").alias("_series"),
                F.col("is_gauge").alias("_g"),
                metric.alias("m"),
            ).alias("keyed_m"),
        )
        .groupBy("batch")
        .agg(F.sort_array(F.collect_list("keyed_m")).alias("keyed_m"))
    )
    request = F.struct(
        F.array(
            F.struct(
                F.struct(
                    F.array(_kv("service.name", F.lit("mps-synth"))).alias(
                        "attributes"
                    )
                ).alias("resource"),
                F.array(
                    F.struct(
                        F.struct(F.lit("mps").alias("name")).alias("scope"),
                        F.col("keyed_m.m").alias("metrics"),
                    )
                ).alias("scopeMetrics"),
            )
        ).alias("resourceMetrics")
    )
    return batched.select(F.to_json(request).alias("request"))


def parse_otlp_requests(df: DataFrame, col: str = "request") -> DataFrame:
    """Decode OTLP/JSON requests back to flat datapoints: explicit
    ``from_json`` schema (no inference pass), three explodes down
    resourceMetrics -> scopeMetrics -> metrics, the gauge/sum oneof
    resolved with coalesce, and the ``host`` attribute looked up with
    a higher-order ``filter``. Output: (name, mtype, host, ts_ns,
    value) — all JVM expressions, scan-parallel."""
    req = df.select(F.from_json(F.col(col), OTLP_SCHEMA).alias("r"))
    m = (
        req.select(F.explode("r.resourceMetrics").alias("rm"))
        .select(F.explode("rm.scopeMetrics").alias("sm"))
        .select(F.explode("sm.metrics").alias("m"))
    )
    dps = m.select(
        F.col("m.name").alias("name"),
        F.when(F.col("m.gauge").isNotNull(), F.lit("gauge"))
        .otherwise(F.lit("sum"))
        .alias("mtype"),
        F.explode(
            F.coalesce("m.gauge.dataPoints", "m.sum.dataPoints")
        ).alias("dp"),
    )
    host = F.try_element_at(
        F.expr("filter(dp.attributes, a -> a.key = 'host')"), F.lit(1)
    )["value"]["stringValue"]
    return dps.select(
        "name",
        "mtype",
        host.alias("host"),
        F.col("dp.timeUnixNano").cast("bigint").alias("ts_ns"),
        F.col("dp.asDouble").alias("value"),
    )


def aggregate_otlp(points: DataFrame) -> DataFrame:
    """Rollup per (name, mtype, host): point count, exact-decimal
    value total, observed nano time range. One hash agg with map-side
    combine over the flattened datapoints."""
    return points.groupBy("name", "mtype", "host").agg(
        F.count(F.lit(1)).alias("n_points"),
        F.sum(F.col("value").cast("decimal(27,4)"))
        .cast("double")
        .alias("sum_value"),
        F.min("ts_ns").alias("min_ts_ns"),
        F.max("ts_ns").alias("max_ts_ns"),
    )
