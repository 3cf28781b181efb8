"""ProxyConfig → Structured Streaming plan.

Reference config shape [P: config/config.go — ProxyConfig]:

    {
      "ListenFrom": [ {"Type": "carbon", "ListenAddr": ...,
                       "MetricDeconstructor": "commakeys"} , ... ],
      "ForwardTo":  [ {"Type": "signalfx", "DefaultAuthToken": ...,
                       "BufferSize": ..., "DrainingThreads": ...}, ... ]
    }

One listener in the reference is a network server; here it is a
streaming source directory (the file source is the testable stand-in —
a Kafka topic drops in the same slot in production). Every listener's
output is normalized to the canonical datapoint schema (§2.2) before
the fan-out, exactly the reference's single in-memory datapoint model.
All ForwardTo entries receive all datapoints (demux F1); BufferSize
maps to load-shed emulation, DrainingThreads to per-batch repartition
(F4).
"""

from __future__ import annotations

import json
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from metricproxy_spark.sources.carbon import (
    commakeys_deconstruct,
    parse_carbon_lines,
)
from metricproxy_spark.streaming.pipeline import ProxyPipeline, SinkSpec
from metricproxy_spark.streaming.sinks import (
    carbon_sink,
    csv_sink,
    signalfx_sink,
)
from metricproxy_spark.streaming.source import read_stream_table

CANONICAL_COLS = (
    "metric",
    "value",
    "value_str",
    "ts",
    "metric_type",
    "dimensions",
    "meta",
)


def load_config(path_or_dict: str | dict[str, Any]) -> dict[str, Any]:
    """Parse the JSON config (path or pre-parsed dict) [P: config.Load]."""
    if isinstance(path_or_dict, dict):
        cfg = path_or_dict
    else:
        with open(path_or_dict) as f:
            cfg = json.load(f)
    for key in ("ListenFrom", "ForwardTo"):
        if key not in cfg:
            raise ValueError(f"config missing {key!r}")
    return cfg


def _canonicalize(df: DataFrame) -> DataFrame:
    cols = set(df.columns)
    out = df
    if "value_str" not in cols:
        out = out.withColumn("value_str", F.lit(None).cast("string"))
    if "metric_type" not in cols:
        out = out.withColumn("metric_type", F.lit("gauge"))
    if "dimensions" not in cols:
        out = out.withColumn(
            "dimensions", F.expr("map()").cast("map<string,string>")
        )
    if "meta" not in cols:
        out = out.withColumn(
            "meta", F.expr("map()").cast("map<string,string>")
        )
    return out.select(*CANONICAL_COLS)


def _build_listener(spark: SparkSession, spec: dict[str, Any]) -> DataFrame:
    ltype = spec["Type"].lower()
    src = spec["Source"]  # directory (file stream); Kafka topic in prod
    mft = spec.get("MaxFilesPerTrigger")
    if ltype == "carbon":
        lines = (
            spark.readStream.format("text")
            .option("maxFilesPerTrigger", mft)
            .load(src)
            if mft
            else spark.readStream.format("text").load(src)
        )
        lines = lines.withColumnRenamed("value", "line")
        parsed = parse_carbon_lines(lines, "line")
        decon = spec.get("MetricDeconstructor", "identity")
        if decon == "commakeys":
            parsed = commakeys_deconstruct(parsed, "metric")
        elif decon != "identity":
            raise ValueError(f"unknown MetricDeconstructor {decon!r}")
        return _canonicalize(parsed)
    if ltype == "parquet":
        # pre-normalized datapoints (the internal replay/loopback path)
        return _canonicalize(
            read_stream_table(spark, src, max_files_per_trigger=mft)
        )
    if ltype == "signalfx":
        # The reference's HTTP front door [P: signalfxlistener.go].
        # ``Source`` is the request spool (httpwire at-rest format); a
        # LIVE server bound per ``ListenAddr`` is started separately by
        # build_pipeline and spools into the same directory, so config
        # users get a real network endpoint feeding this stream.
        from metricproxy_spark.sources.signalfx import parse_sfx_v2_json
        from metricproxy_spark.streaming.httplistener import (
            http_spool_stream,
        )

        parsed = parse_sfx_v2_json(
            http_spool_stream(spark, src), body_col="body"
        )
        return _canonicalize(
            parsed.select("metric", "value", "ts", "metric_type", "dimensions")
        )
    if ltype == "statsd":
        # UDP/TCP statsd terminated by the line-socket listener; the
        # spool streams through the carbonwire connector and the
        # SAME parser as the at-rest/live/streamed query twins.
        # statsd lines carry no timestamp — points are stamped at
        # processing time, the statsd-server contract.
        from metricproxy_spark.sources.pyds import register_carbonwire
        from metricproxy_spark.sources.statsd import parse_statsd_lines

        register_carbonwire(spark)
        lines = (
            spark.readStream.format("carbonwire").option("path", src).load()
        )
        parsed = parse_statsd_lines(lines.select("line"))
        mtype_map = (
            F.when(F.col("mtype") == "g", "gauge")
            .when(F.col("mtype") == "ms", "gauge")
            .when(F.col("mtype") == "c", "count")
            .otherwise("count")  # sets report as counts of members
        )
        return _canonicalize(
            parsed.select(
                F.col("name").alias("metric"),
                F.col("scaled").cast("double").alias("value"),
                F.when(F.col("mtype") == "s", F.col("raw_val")).alias(
                    "value_str"
                ),
                F.current_timestamp().alias("ts"),
                mtype_map.alias("metric_type"),
            )
        )
    if ltype == "influx":
        # Influx line protocol through the same spool chain; the ns
        # wire timestamp truncates to the canonical µs timestamp and
        # tags ride the dimensions map.
        from metricproxy_spark.sources.influx import parse_influx_lines
        from metricproxy_spark.sources.pyds import register_carbonwire

        register_carbonwire(spark)
        lines = (
            spark.readStream.format("carbonwire").option("path", src).load()
        )
        typed = parse_influx_lines(lines.select("line"))
        return _canonicalize(
            typed.select(
                F.col("measurement").alias("metric"),
                F.col("val").alias("value"),
                F.expr("timestamp_micros(ts_ns div 1000)").alias("ts"),
                F.lit("gauge").alias("metric_type"),
                F.map_from_arrays(
                    F.array(F.lit("host"), F.lit("region")),
                    F.array("host", "region"),
                ).alias("dimensions"),
            )
        )
    raise ValueError(f"unknown listener type {spec['Type']!r}")


def _build_sink(spec: dict[str, Any]) -> SinkSpec:
    stype = spec["Type"].lower()
    name = spec.get("Name", stype)
    path = spec["Path"]
    if stype == "csv":
        return SinkSpec(name, csv_sink(path))
    if stype == "carbon":
        return SinkSpec(name, carbon_sink(path, meta_col="meta"))
    if stype == "signalfx":
        return SinkSpec(name, signalfx_sink(path=path))
    raise ValueError(f"unknown forwarder type {spec['Type']!r}")


def build_pipeline(
    spark: SparkSession, config: str | dict[str, Any]
) -> ProxyPipeline:
    """Wire the full graph: union of all listeners → demux → all sinks.

    The reference runs one demultiplexer over the merged listener
    output [P: main.go]; ``unionByName`` over the canonical schema is
    that merge. Returns an un-started :class:`ProxyPipeline` — call
    ``run_available_now(checkpoint_dir)`` (drain mode) or ``start``.
    """
    cfg = load_config(config)
    streams = [_build_listener(spark, s) for s in cfg["ListenFrom"]]
    source = streams[0]
    for s in streams[1:]:
        source = source.unionByName(s)
    sinks = [_build_sink(s) for s in cfg["ForwardTo"]]
    max_rows = None
    for fwd in cfg["ForwardTo"]:
        if "BufferSize" in fwd:
            # smallest configured buffer bounds the shared batch (F2)
            b = int(fwd["BufferSize"])
            max_rows = b if max_rows is None else min(max_rows, b)
    pipe = ProxyPipeline(source=source, sinks=sinks, max_batch_rows=max_rows)
    # Live network endpoints: a signalfx listener with a ListenAddr
    # gets a REAL HTTP server spooling into its Source dir. The caller
    # owns the lifecycle via pipe.live_listeners (stop() when done).
    # Started LAST, after every listener/sink spec has parsed, and
    # unwound on failure: a bad ListenAddr in the Nth spec must not
    # leak the N-1 already-bound ports/threads (round-4 ADVICE).
    try:
        for spec in cfg["ListenFrom"]:
            ltype = spec["Type"].lower()
            if not spec.get("ListenAddr"):
                continue
            host, _, port = spec["ListenAddr"].rpartition(":")
            if ltype == "signalfx":
                from metricproxy_spark.streaming.httplistener import (
                    HttpIngestListener,
                )

                lis = HttpIngestListener(
                    spec["Source"], host=host or "127.0.0.1", port=int(port)
                )
                lis.start()
                pipe.live_listeners.append(lis)
            elif ltype in ("statsd", "influx"):
                from metricproxy_spark.streaming.socketlistener import (
                    LineSocketListener,
                )

                lis = LineSocketListener(
                    spec["Source"],
                    mode=spec.get("Protocol", "tcp").lower(),
                    host=host or "127.0.0.1",
                    port=int(port),
                )
                lis.start()
                pipe.live_listeners.append(lis)
    except Exception:
        pipe.close_listeners()
        raise
    return pipe
