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
# ROUND-10 NOTE: pin r10 additions first, then the remaining 34
# r3-latest names (compute with the CORRECTNESS_r* union script in
# SURVEY §5), then r4-latest names as space allows.
_PRIORITY = (
    # --- new in round 9 ---
    "analytic_hierarchy_recursive",
    "events_promql_over_time",
    "events_promql_quantile_over_time",
    "events_promql_topk",
    "events_promql_delta",
    "events_promql_irate",
    "events_exp_histogram",
    "events_sax_symbols",
    "events_series_churn",
    "graph_kcore",
    "ingest_cardinality_limit",
    "ingest_cbor_roundtrip",
    "stream_cbor_pipeline",
    "ingest_carbon_aggregation_rules",
    "pipeline_training_shard_manifest",
    "pipeline_dataset_card",
    "multimodal_decode_png_subbyte",
    "text_pii_scrub_corpus",
    "text_unicode_nfc",
    "layout_hilbert_stats",
    "events_time_range_frame",
    "events_promql_label_ops",
    "ingest_statsd_timer_digest",
    "events_promql_absent",
    "events_activity_heatmap",
    "events_quantile_disc",
    "analytic_merge_intervals",
    # --- changed in round 9 (engine edits -> fresh evidence) ---
    "ingest_hashring_route",
    "dedup_minhash_exact",
    "dedup_simhash_exact",
    "text_language_id",
    "events_gorilla_roundtrip",
    "stream_gorilla_pipeline",
    # --- r1-only-evidence names (overflowed from rounds 7 and 8) ---
    "analytic_range_frame",
    "analytic_ntile_cume",
    # --- the full r2-only-evidence cohort ---
    "text_tfidf",
    "pipeline_training_data",
    "pipeline_decontaminate",
    "pipeline_train_test_split",
    "pipeline_lang_balance",
    "cdc_incremental_agg",
    "layout_stratified_sample",
    "layout_zorder_stats",
    "analytic_array_funcs",
    "analytic_datetime_funcs",
    "analytic_math_funcs",
    "analytic_string_funcs",
    "text_ngram_udtf_analyze",
    "text_shingle_udtf",
    "text_topk_sketch",
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
