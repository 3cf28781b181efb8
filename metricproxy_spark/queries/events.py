"""Flagship + events-table queries (SURVEY Phase 1, §3.5 A1/A2).

The reference proxy's only aggregation is its internal stats loop:
every ``StatsDelay`` it emits per-component counters (datapoints
forwarded, events, errors) as new datapoints
[P: main.go — stats loop; golib dpsink/counter.go — Counter].
``events_hourly_stats`` is that same computation expressed on the
driver's ``events`` stream table: bucket by time, count and sum per
category — scan → time bucketing → hash agg.

Scale notes: single shuffle on (event_type, hour); partial aggregation
(map-side combine) happens automatically for count/sum; low-cardinality
group keys (5 types x ~720 hours) mean tiny shuffle output regardless
of input size. At 100 TB this is the canonical "metrics rollup" shape —
no skew risk worse than per-type volume imbalance, which AQE handles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from metricproxy_spark.functions.aggregates import davg, davg_sql, dsum, dsum_sql
from metricproxy_spark.io import load_table
from metricproxy_spark.registry import register


@register(
    "events_hourly_stats",
    oracle=f"""
    SELECT event_type,
           date_trunc('hour', ts) AS hour_ts,
           count(*) AS n_events,
           {dsum_sql('value')} AS sum_value,
           {davg_sql('value')} AS avg_value
    FROM events
    GROUP BY event_type, date_trunc('hour', ts)
    """,
)
def events_hourly_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2 stats-loop analog: per-type hourly count/sum/avg over events."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("hour_ts")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        dsum("value").alias("sum_value"),
        davg("value").alias("avg_value"),
    )


@register(
    "events_type_totals",
    oracle=f"""
    SELECT event_type,
           count(*) AS n_events,
           count(DISTINCT user_id) AS n_users,
           {dsum_sql('value')} AS sum_value,
           CAST(min(value) AS DOUBLE) AS min_value,
           CAST(max(value) AS DOUBLE) AS max_value
    FROM events
    GROUP BY event_type
    """,
)
def events_type_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 counter analog: lifetime totals per event type (X10 hash agg,
    incl. count-distinct which adds an expand+reshuffle — acceptable on
    5 group keys)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
        dsum("value").alias("sum_value"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
    )
