"""Kafka source/sink wrappers (SURVEY §3.1/§3.2 — the production slot
the file-stream source stands in for; reference analog: the TCP/HTTP
listeners and the SignalFx HTTP forwarder, S1/S2/K1).

The Kafka connector jar (`spark-sql-kafka-0-10`) is NOT in this
container, so everything here is split into two layers:

- **Record-shape transforms** (`decode_kafka_records`,
  `carbon_from_kafka`, `to_kafka_records`) — pure DataFrame ops over
  the well-known Kafka record schema (key/value binary, topic,
  partition, offset, timestamp). Fully unit-testable on static
  DataFrames; identical code path against a real topic.
- **I/O builders** (`kafka_reader`, `write_kafka_batch`) — configure
  `format("kafka")` readers/writers. Building them is classpath-free;
  only `.load()` / `.save()` touches the connector, so callers gate on
  :func:`kafka_available`.

Scale notes: one Kafka partition maps to one Spark task (use
``minPartitions`` to fan out hot topics); ``maxOffsetsPerTrigger``
is the F2 intake bound (the buffered-forwarder analog).
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

KAFKA_RECORD_SCHEMA = (
    "key binary, value binary, topic string, partition int, "
    "offset long, timestamp timestamp, timestampType int"
)


def kafka_available(spark: SparkSession) -> bool:
    """True iff the Kafka connector is on the session's classpath."""
    try:
        jvm = spark._jvm  # noqa: SLF001 — capability probe, public API has none
        jvm.java.lang.Class.forName(
            "org.apache.spark.sql.kafka010.KafkaSourceProvider"
        )
        return True
    except Exception:
        return False


def kafka_reader(
    spark: SparkSession,
    bootstrap_servers: str,
    topics: str,
    starting_offsets: str = "earliest",
    max_offsets_per_trigger: int | None = None,
    min_partitions: int | None = None,
    extra_options: dict[str, Any] | None = None,
):
    """Configured ``readStream`` for a topic subscription. Call
    ``.load()`` only when :func:`kafka_available`."""
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topics)
        .option("startingOffsets", starting_offsets)
    )
    if max_offsets_per_trigger is not None:
        reader = reader.option(
            "maxOffsetsPerTrigger", str(max_offsets_per_trigger)
        )
    if min_partitions is not None:
        reader = reader.option("minPartitions", str(min_partitions))
    for k, v in (extra_options or {}).items():
        reader = reader.option(k, v)
    return reader


def decode_kafka_records(records: DataFrame) -> DataFrame:
    """Kafka record → (line STRING, kafka_ts, topic, partition, offset).
    UTF-8 value decode; key kept as string for keyed topics."""
    return records.select(
        F.col("value").cast("string").alias("line"),
        F.col("key").cast("string").alias("key"),
        F.col("timestamp").alias("kafka_ts"),
        "topic",
        "partition",
        "offset",
    )


def carbon_from_kafka(records: DataFrame) -> DataFrame:
    """S1-over-Kafka: carbon plaintext lines in record values → canonical
    datapoint columns (C1 parse; invalid lines dropped-and-countable
    exactly as the TCP listener does)."""
    from metricproxy_spark.sources.carbon import parse_carbon_lines

    return parse_carbon_lines(decode_kafka_records(records), "line")


def to_kafka_records(
    df: DataFrame,
    key_col: str | None = "metric",
) -> DataFrame:
    """K1-over-Kafka: serialize datapoints to the (key, value) shape the
    Kafka writer requires — value is the v2-JSON wire body the SignalFx
    forwarder emits; key (default: metric name) gives stable partition
    routing so one metric's points stay ordered within a partition."""
    cols = set(df.columns)
    dims = (
        F.col("dimensions")
        if "dimensions" in cols
        else F.expr("map()").cast("map<string,string>")
    )
    value = F.to_json(
        F.struct(
            F.col("metric").alias("metric"),
            F.col("value").alias("value"),
            dims.alias("dimensions"),
            # millisecond wire timestamps (unix_timestamp*1000 truncates)
            F.unix_millis(F.col("ts")).alias("timestamp"),
        )
    )
    key = (
        F.col(key_col).cast("string")
        if key_col
        else F.lit(None).cast("string")
    )
    return df.select(key.alias("key"), value.alias("value"))


def write_kafka_batch(
    df: DataFrame,
    bootstrap_servers: str,
    topic: str,
    key_col: str | None = "metric",
) -> None:
    """Publish one (micro-)batch to a topic — the foreachBatch body for
    a Kafka-backed ProxyPipeline sink. Requires the connector."""
    (
        to_kafka_records(df, key_col)
        .write.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("topic", topic)
        .save()
    )


def kafka_sink(
    bootstrap_servers: str, topic: str, key_col: str | None = "metric"
):
    """BatchWriter factory for :class:`ProxyPipeline` (K1 slot)."""

    def write(df: DataFrame, batch_id: int) -> None:
        write_kafka_batch(df, bootstrap_servers, topic, key_col)

    return write
