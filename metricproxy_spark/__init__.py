"""metricproxy_spark — a PySpark-native analytics engine with the query
and data-processing capabilities of signalfx/metricproxy.

The reference system (github.com/signalfx/metricproxy, Apache-2.0) is a
multi-protocol time-series datapoint proxy: listeners (carbon, signalfx
JSON/protobuf, collectd) -> normalize -> enrich -> buffered fan-out ->
forwarders. This engine re-expresses that dataflow Spark-first:

- ingestion/normalization as Catalyst expression transforms
  (:mod:`metricproxy_spark.sources`),
- the proxy's streaming loop as Structured Streaming with observed
  metrics and foreachBatch fan-out (:mod:`metricproxy_spark.streaming`),
- a full analytic query surface over the driver's star schema
  (:mod:`metricproxy_spark.queries`),
- LLM-data-pipeline operators (dedup, similarity search, text analysis,
  multimodal columns) designed for 100 TB scale
  (:mod:`metricproxy_spark.operators`).

See SURVEY.md for the operator inventory and provenance notes (the
reference mount was empty at survey time; citations are to the public
upstream repo by path + symbol).
"""

__version__ = "0.1.0"
