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
# (r1-r3 CORRECTNESS files each stopped at exactly 50 rows).
# _PRIORITY pins specific names to the FRONT of the registry. Round-4
# rotation: the 38 queries never covered by ANY driver file (union of
# CORRECTNESS_r01-r03) fill the window first, then queries newly added
# this round; the union across rounds then gives every query hard
# driver evidence. Everything else keeps module order behind them.
_PRIORITY = (
    # --- never covered by any driver file (r1∪r2∪r3), 38 names ---
    "tpch_q3_shipping_priority",
    "tpch_q4_order_priority",
    "tpch_q5_local_supplier_volume",
    "tpch_q6_forecast_revenue",
    "tpch_q7_volume_shipping",
    "tpch_q8_market_share",
    "tpch_q9_product_profit",
    "tpch_q10_returned_items",
    "tpch_q12_priority_lines",
    "tpch_q13_customer_distribution",
    "tpch_q15_top_supplier",
    "tpch_q19_disjunctive_revenue",
    "tpch_q21_waiting_supplier",
    "dedup_semantic",
    "dedup_semantic_prune",
    "events_sessionize",
    "events_concurrency",
    "events_downsample_m4",
    "events_week_over_week",
    "stream_downsample_m4",
    "stream_alert_rules",
    "graph_triangles",
    "analytic_copurchase_lift",
    "analytic_conditional_aggs",
    "analytic_running_distinct",
    "analytic_setops_all",
    "analytic_bitwise_funcs",
    "analytic_hash_funcs",
    "analytic_approx_percentile",
    "text_bigram_coverage",
    "ingest_orc_roundtrip",
    "ingest_carbon_connector_sink",
    "sim_ivfpq_topk",
    "sim_lang_centroids",
    "pipeline_bpe_train",
    "pipeline_tokenizer_report",
    "multimodal_audio_spectral",
    "multimodal_image_stats",
    # --- round-4 additions (new queries land here, inside the 50) ---
    "ingest_http_listener_live",
    "layout_partition_pruning",
    "layout_bucketed_join",
    "ingest_prometheus_text",
    "analytic_asof_forward",
    "events_counter_to_rate",
    "analytic_mode_per_group",
    "analytic_hll_sketch",
    "stream_http_live_pipeline",
    "sim_pq_rerank",
    "events_downsample_lttb",
    "events_holt_trend",  # slot 50 — window exactly full
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
