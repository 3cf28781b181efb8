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
# ROUND-8 NOTE: round 7 grew to 38 new names, so the r1-cohort tail
# from events_gapfill_ffill through analytic_ntile_cume (33 names)
# overflowed this round's window. Round 8's rotation: any r8 additions
# first, then that overflowed tail.
_PRIORITY = (
    # --- implemented+green in round 6 but registered after the 50-row
    # --- window filled: zero driver rows yet (r6 VERDICT task 1) ---
    "multimodal_decode_gif",
    "stream_otlp_pipeline",
    "analytic_theta_set_algebra",
    # --- new in round 7 ---
    "pipeline_web_curation_end2end",
    "stream_collectd_pipeline",
    "stream_sfx_v1_pipeline",
    "events_theta_rollup",
    "dedup_cdc_chunks",
    "dedup_incremental_ingest",
    "multimodal_decode_png16",
    "multimodal_decode_jpeg_dri",
    "multimodal_decode_jpeg_progressive",
    "multimodal_decode_g711",
    "graph_sssp_hops",
    "events_autocorrelation",
    "analytic_fuzzy_join",
    "multimodal_decode_flac",
    "multimodal_edge_detect",
    "events_rolling_median",
    "events_changepoint",
    "analytic_benford_profile",
    "events_theil_sen",
    "analytic_market_basket",
    "analytic_spatial_join",
    "graph_label_propagation",
    "analytic_hierarchy_rollup",
    "events_forecast_backtest",
    "ingest_msgpack_roundtrip",
    "stream_msgpack_pipeline",
    "events_rate_limit_audit",
    "tpch_q2_min_cost_supplier",
    "tpch_q11_important_stock",
    "tpch_q16_supplier_count",
    "tpch_q20_potential_promotion",
    "events_absence_alerts",
    # --- evidence rotation: the r1-only cohort (latest green row is
    # --- CORRECTNESS_r01, five rounds of churn ago). Listed in full;
    # --- the driver records the first 50 registry rows, so whatever
    # --- overflows this round rotates into round 8's window. ---
    "ingest_carbon_parse",
    "ingest_carbon_commakeys",
    "ingest_carbon_roundtrip",
    "ingest_collectd_explode",
    "ingest_sfx_v2_unpivot",
    "ingest_sfx_v1_registry",
    "ingest_sanitize",
    "ingest_delimiter_rules",
    "ingest_ts_normalize",
    "ingest_sfx_protobuf_roundtrip",
    "ingest_variant_props",
    "ingest_carbon_datasource",
    "ingest_schema_evolution",
    "events_hourly_stats",
    "events_type_totals",
    "events_multires_rollup",
    "events_gapfill_ffill",
    "events_interpolate_linear",
    "events_series_correlation",
    "events_hll_rollup",
    "analytic_pricing_summary",
    "analytic_rollup",
    "analytic_cube",
    "analytic_grouping_sets",
    "analytic_setops",
    "analytic_scalar_subquery",
    "analytic_orderby_limit",
    "analytic_approx_distinct",
    "analytic_salted_agg",
    "analytic_salted_join",
    "analytic_pivot",
    "analytic_unpivot",
    "analytic_percentiles",
    "analytic_exact_moments",
    "analytic_pandas_median",
    "analytic_table_profile",
    "analytic_histogram",
    "analytic_regional_revenue",
    "analytic_left_join_coverage",
    "analytic_semi_join",
    "analytic_anti_join",
    "analytic_range_join",
    "analytic_asof_join",
    "analytic_topk_per_group",
    "analytic_window_analytic",
    "analytic_ranking",
    "analytic_sessionize",
    "analytic_range_frame",
    "analytic_ntile_cume",
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
