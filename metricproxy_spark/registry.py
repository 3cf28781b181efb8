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
# _PRIORITY pins specific names to the FRONT of the registry. Round-7
# rotation: first the three round-6 queries that landed after the
# window filled (implemented + judge-verified but zero driver rows),
# then queries newly added in round 7, then the full r1-only-evidence
# cohort (their last green driver row is CORRECTNESS_r01 — five rounds
# of churn ago). The list intentionally exceeds 50: the driver records
# the first 50 registry rows, and the overflow rotates into round 8.
# Everything else keeps module order behind them.
#
# ROUND-8 rotation (r7 VERDICT task 1 + ADVICE note fix): the round-7
# window covered through events_type_totals (registry position 50), so
# the r1-cohort tail from events_multires_rollup through
# analytic_ntile_cume (34 names) overflowed with r1-only evidence.
# This round pins: 16 r8 additions + 2 r8-changed queries
# (analytic_fuzzy_join oracle DISTINCT fix, analytic_hierarchy_rollup
# digit-derived depth) + the first 32 of the 34-name r1-cohort tail =
# exactly the 50-row driver window (zero-evidence names outrank stale
# ones, the r6->r7 precedent; two-round cohort completion is the
# accepted fallback).
# ROUND-9 EXECUTED (this round): 27 r9 additions + 6 r9-changed
# (hashring HOF rewrite; gorilla bounds-hardening touched both gorilla
# queries; the shingle/trigram ANSI guards touched the minhash/simhash
# exact twins and language ID) + the 2 overflowed r1 names + the FULL
# 15-name r2 cohort =
# exactly the 50-row driver window. After CORRECTNESS_r09 lands, every
# registered name has r3+ evidence and the r3 cohort (34 left:
# events_funnel .. tpch_q22_idle_customers, see git history of this
# note) rotates next (all 42 r3-latest names left).
# ROUND-10 EXECUTED (this round): the prior note undercounted the
# r3-latest cohort as 34; the CORRECTNESS_r* union script (SURVEY §5)
# gives 42 (VERDICT r9 finding 3 — fixed here). This round pins:
# 12 r10 additions (PromQL binary ops ×3, remote-write 1.0 at-rest +
# streamed + 2.0, framed-snappy carbon transport, OTLP/protobuf
# at-rest + streamed, LZ4 block documents roundtrip, SLO multiwindow
# burn rate, alert for:-duration) + 3 r10-changed queries (the CBOR
# decoder grew two RFC-strictness raises -> both CBOR queries; the
# http-listener live load generator now routes through
# guarded_wire_pandas) + the first 35 of the 42 r3-latest names in
# registry order = exactly the 50-row driver window.
# ROUND-11 EXECUTED (this round): 10 r11 additions (PromQL subquery ×2
# incl. the rate-inner canonical form + offset/@, graphite render
# summarize/moving/derivative families, OpenMetrics strict ingest,
# remote-write 2.0 native histograms + exemplars, native-histogram
# quantile, streamed alert for:-duration twin) + 4 r11-changed
# queries (slo burn rate + time-range frame respelled view-free per
# ADVICE; lz4 documents' explicit max_out; framed-snappy carbon after
# the empty-chunk respelling) + the 7 overflowed r3 names + the first
# 29 of the 40-name r4-latest cohort (union-script truth — the prior
# note's 41 counted ingest_http_listener_live before its r10 re-pin)
# = exactly the 50-row driver window.
# ROUND-11b (continued, same round): 20 net additions (SPC Western
# Electric rules; parquet
# footers via a from-scratch Thrift compact decoder; OTLP/protobuf
# LOGS signal at-rest + STREAMED twins; Arrow IPC stream+file
# interchange; Kafka RecordBatch at-rest + STREAMED twins; Kafka
# RecordBatch v2 with cycling none/gzip/xerial-snappy/LZ4-frame
# compression; DEFLATE/gzip/
# zlib transport at-rest + STREAMED twin over live HTTP; prometheus
# REMOTE READ at-rest + LIVE server + STREAMED_XOR_CHUNKS response
# with from-scratch TSDB XOR chunks, completing the remote pair both
# response types; LZ4 FRAME format with from-scratch xxHash-32;
# PromQL count_values + holt_winters + the cross-series quantile
# aggregator (a drafted promql predict_linear was REMOVED as a
# duplicate of the existing events_predict_linear — same closed
# form, same alert story); graphite asPercent; train/eval
# contamination; lakehouse compaction planning + delta-log snapshot
# replay) pinned at the head, plus 2 more r11-changed names
# (events_histogram_quantile + analytic_benford_profile oracles
# forced to DOUBLE phi/benford_p literals — newer DuckDB types bare
# decimals DECIMAL and computes exactly, a 1-ulp divergence from
# Spark's IEEE chain, caught by a full-registry exact-repr replay);
# the r4 head shrinks 29 -> 7 to keep the 50-row window exact.
# ROUND-12 NOTE: pin r12 additions first, then the THIRTY-THREE
# overflowed r4 names (layout_partition_pruning,
# layout_bucketed_join, stream_alert_rules,
# stream_downsample_m4,
# ingest_orc_roundtrip, ingest_prometheus_text,
# events_week_over_week, events_sessionize,
# events_concurrency, events_downsample_m4, events_counter_to_rate,
# events_downsample_lttb, graph_triangles,
# tpch_q3_shipping_priority,
# tpch_q4_order_priority, tpch_q5_local_supplier_volume,
# tpch_q7_volume_shipping, tpch_q8_market_share,
# tpch_q10_returned_items, tpch_q13_customer_distribution,
# tpch_q19_disjunctive_revenue, tpch_q21_waiting_supplier,
# tpch_q6_forecast_revenue, tpch_q9_product_profit,
# tpch_q12_priority_lines, tpch_q15_top_supplier,
# analytic_setops_all, analytic_conditional_aggs,
# analytic_copurchase_lift, analytic_mode_per_group,
# analytic_hll_sketch, analytic_asof_forward,
# analytic_running_distinct -- recompute with the union script),
# then the r5-latest cohort.
_PRIORITY = (
    # --- new in round 11 (second wave) ---
    "ingest_gzip_documents",
    "ingest_remote_read",
    "ingest_remote_read_live",
    "ingest_remote_read_chunked",
    "ingest_lz4_frame_shards",
    "stream_gzip_pipeline",
    "ingest_kafka_recordbatch",
    "ingest_otlp_logs",
    "ingest_arrow_ipc",
    "stream_kafka_recordbatch_pipeline",
    "stream_otlp_logs_pipeline",
    "layout_compaction_plan",
    "cdc_delta_log_snapshot",
    "ingest_parquet_footer",
    "events_promql_count_values",
    "events_promql_holt_winters",
    "events_promql_quantile_agg",
    "events_spc_western_electric",
    "events_graphite_aspercent",
    "text_eval_contamination",
    # --- new in round 11 ---
    "events_promql_subquery",
    "events_promql_subquery_rate",
    "events_promql_offset_at",
    "events_graphite_summarize",
    "events_graphite_moving",
    "events_graphite_derivative",
    "ingest_openmetrics",
    "ingest_remote_write_v2_histograms",
    "events_native_histogram_quantile",
    "stream_alert_for_duration",
    # --- changed in round 11 (engine edits -> fresh evidence) ---
    "events_histogram_quantile",
    "analytic_benford_profile",
    "events_slo_burn_rate",
    "events_time_range_frame",
    "ingest_lz4_documents",
    "ingest_snappy_framed_carbon",
    # --- r3-latest evidence cohort (the 7 that overflowed round 10) ---
    "events_gap_report",
    "graph_pagerank",
    "tpch_q14_promo_share",
    "tpch_q17_small_qty_revenue",
    "tpch_q18_large_orders",
    "tpch_q22_idle_customers",
    "analytic_lateral_topn",
    # --- r4-latest evidence cohort (7 of 40; registry order) ---
    "pipeline_bpe_train",
    "multimodal_audio_spectral",
    "multimodal_image_stats",
    "pipeline_tokenizer_report",
    "text_bigram_coverage",
    "analytic_bitwise_funcs",
    "analytic_hash_funcs",
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
