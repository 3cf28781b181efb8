"""Query registry — the single source of truth behind __spark_entry__.

Every implemented operator from SURVEY.md §3 registers here as a named
query: a callable ``(spark, sf_dir) -> DataFrame`` plus (when the
semantics are SQL-expressible) a DuckDB oracle SQL string the driver
runs side-by-side. The driver compares row-count + schema +
order-insensitive value hash, with columns sorted by name — so every
computed column is aliased identically in both forms.

Determinism contract (hash-stability across engines):

- Sums/avgs of DOUBLE columns are order-dependent in floating point;
  Spark and DuckDB will not reliably produce bit-identical doubles.
  Money-ish aggregates therefore go through exact DECIMAL arithmetic in
  BOTH engines and are cast back to DOUBLE at the end
  (:func:`metricproxy_spark.functions.aggregates.dsum`).
- Queries with genuinely approximate results (approx_count_distinct,
  MinHash) register without an oracle -> driver records rows-only.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}

# Registration order = the order a row-capped driver verifies queries
# (r1-r4 CORRECTNESS files each stopped at exactly 50 rows).
# _PRIORITY pins specific names to the FRONT of the registry. Round-6
# rotation: first analytic_json_funcs (the ONE name whose only driver
# row is r02's env-era failure — r5 VERDICT task 2), then every query
# whose semantics or plan changed this round (the two distributed
# window rewrites, the statsd sampling fix, the CMS left-join fix),
# then queries newly added in round 6. Union across r1-r6 then covers
# every query. Everything else keeps module order behind them.
_PRIORITY = (
    # --- evidence gap: only driver row is an r02 env-era failure ---
    "analytic_json_funcs",
    # --- changed in round 6, need re-verification ---
    "pipeline_pack_sequences",
    "analytic_skyline_frontier",
    "ingest_statsd",
    "analytic_cms_heavy_hitters",
    # --- changed in round 6 (guarded_series rewiring) ---
    "events_ema",
    "events_holt_trend",
    "events_cusum_score",
    # --- changed in round 6 (bench-tail staging/bucketing) ---
    "dedup_semantic",
    "dedup_semantic_prune",
    "ingest_carbon_connector_sink",
    # --- round-6 additions (new queries land here, inside the 50) ---
    "ingest_statsd_live",
    "ingest_influx_live",
    "graph_khop_reach_approx",
    "sim_pca_variance_check",
    "multimodal_decode_png",
    "multimodal_decode_jpeg",
    "stream_statsd_pipeline",
    "stream_influx_pipeline",
    "multimodal_decode_video",
    "ingest_avro_datasource",
    "layout_runtime_bloom_filter",
    "analytic_mad_outliers",
    "pipeline_pack_greedy",
    "dedup_image_dhash",
    "multimodal_resize",
    "multimodal_resample_audio",
    "text_html_extract",
    "pipeline_url_canonicalize",
    "cdc_scd2_asof_enrich",
    # --- round-6 continuation (streaming-runner fix re-drive + new) ---
    "stream_http_live_pipeline",
    "ingest_warc_records",
    "analytic_interval_overlap",
    "events_kalman_level",
    "text_boolean_retrieval",
    "analytic_kll_quantiles",
    # --- round-6 continuation, second batch ---
    "ingest_graphite_tags",
    "ingest_otlp_json",
    "events_apdex",
    "events_holt_winters",
    "text_collocations_pmi",
    "text_readability",
    "dedup_containment",
    "ingest_otlp_http_live",
    "analytic_audience_overlap",
    "analytic_hll_audience_overlap",
    "events_seasonal_outliers",
    "ingest_dogstatsd_tags",
    "ingest_graphite_pickle",
    "stream_graphite_pipeline",
)

_QUERY_MODULES = (
    "metricproxy_spark.queries.dedup",
    "metricproxy_spark.queries.similarity",
    "metricproxy_spark.queries.text",
    "metricproxy_spark.queries.functions_surface",
    "metricproxy_spark.queries.cdc",
    "metricproxy_spark.queries.layout",
    "metricproxy_spark.queries.streaming_surface",
    "metricproxy_spark.queries.events",
    "metricproxy_spark.queries.graph",
    "metricproxy_spark.queries.tpch",
    "metricproxy_spark.queries.ingest",
    "metricproxy_spark.queries.analytic",
    "metricproxy_spark.queries.joins",
    "metricproxy_spark.queries.windows",
)

_loaded = False


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a named query; ``oracle`` is DuckDB SQL or None (rows-only)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def load_all() -> None:
    """Import every query module exactly once, populating the registry."""
    global _loaded
    if _loaded:
        return
    for mod in _QUERY_MODULES:
        importlib.import_module(mod)
    front = [n for n in _PRIORITY if n in QUERIES]
    rest = [n for n in QUERIES if n not in _PRIORITY]
    reordered = {n: QUERIES[n] for n in (*front, *rest)}
    QUERIES.clear()
    QUERIES.update(reordered)
    _loaded = True
