"""Canonical record schemas (SURVEY §2.2).

The reference's central type is the Datapoint struct
[P: golib datapoint/datapoint.go — Datapoint]:
``{Metric, Dimensions map[string]string, Value int|float|string,
MetricType, Timestamp, Meta}``. Spark mapping: the value union becomes
two nullable columns (exactly one non-null); open dimension keys become
``MAP<STRING,STRING>`` (not a struct — key set is dynamic per point).
"""

from __future__ import annotations

from pyspark.sql import types as T

# MetricType enum [P: golib datapoint/metrictype.go — MetricType]
METRIC_TYPES = ("gauge", "count", "cumulative_counter", "rate", "timestamp", "enum")

DATAPOINT_SCHEMA = T.StructType(
    [
        T.StructField("metric", T.StringType(), False),
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("value_str", T.StringType(), True),
        T.StructField("metric_type", T.StringType(), False),
        T.StructField("dimensions", T.MapType(T.StringType(), T.StringType()), True),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

# Event model [P: golib event/event.go — Event]; properties kept as a
# JSON string (map[string]any has no tight Spark type).
EVENT_SCHEMA = T.StructType(
    [
        T.StructField("event_type", T.StringType(), False),
        T.StructField("category", T.StringType(), False),
        T.StructField("dimensions", T.MapType(T.StringType(), T.StringType()), True),
        T.StructField("properties", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), True),
    ]
)

EVENT_CATEGORIES = (
    "USER_DEFINED",
    "ALERT",
    "AUDIT",
    "JOB",
    "COLLECTD",
    "SERVICE_DISCOVERY",
    "EXCEPTION",
)
