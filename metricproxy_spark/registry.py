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
# ROUND-12 EXECUTED (this round): 12 r12 additions (Delta CHECKPOINT
# replay + per-file-stats data skipping; footer-driven parquet
# row-group pruning; parquet DATA-PAGE column decode from scratch
# plus their capstone composition (stats-pruned zero-library read);
# Iceberg v2 snapshot read composed from the
# from-scratch Avro codec; zstd shards decoded by the from-scratch
# RFC 8878 decoder; zstd fully STREAMED over live HTTP — the 16th
# streamed wire family; Delta DELETION VECTORS over a from-scratch
# portable RoaringBitmap; Iceberg v2 POSITIONAL DELETE files read as
# a distributed anti-join; Iceberg v2 EQUALITY DELETE files (the
# content=2 delete-by-value flavor, completing the row-level-delete
# triple); Delta CHANGE DATA FEED derived from the
# log tail with dataChange exclusion; STREAMING WRITES committing a
# real Delta log per micro-batch, log-replay-read back exactly-once)
# + 12 r12-changed queries (the Kafka batch query
# now cycles zstd as compression type 4; compaction planning binning
# respelled to exact BIGINT `div`; the TEN temp-view users respelled
# to parameterized {df} substitution — multires rollup, hll/theta
# rollups, grouping sets, scalar subquery, lateral topn, recursive
# hierarchy, both UDTF queries; the live-HTTP stream twin after the
# listener's link(2) spool-claim fix) + the first 26 of the 33-name
# r4-latest cohort = exactly the 50-row driver window
# (analytic_setops_all, analytic_conditional_aggs,
# analytic_copurchase_lift, analytic_mode_per_group,
# analytic_hll_sketch, analytic_asof_forward and
# analytic_running_distinct, the cohort tail, overflow to r13 — the
# additions-outrank-stale-evidence precedent).
# ROUND-13 EXECUTED (this round): 9 r13 additions (parquet
# DATA_PAGE_V2 decode of Spark's own v2-writer output; the pyarrow-
# staged DELTA_BYTE_ARRAY/DELTA_LENGTH_BYTE_ARRAY/BYTE_STREAM_SPLIT
# twin; parquet BLOOM-FILTER pruning — split-block bitsets checked
# with the repo's own XXH64; parquet PAGE-INDEX pruning —
# ColumnIndex/OffsetIndex page selection with row-range
# synchronization across columns; Delta TIME TRAVEL via checkpoint +
# version-bounded replay; the Iceberg stale-manifest-list
# time-travel twin; Iceberg manifest-entry stats pruning with
# Appendix-D LE bounds; full three-arm MERGE INTO over the Delta
# log; the merge commit's explicit-cdc CHANGE FEED read) + 4
# r13-changed queries (ingest_zstd_shards respelled to size-bounded
# cumsum-bin shards; ingest_kafka_recordbatch and
# stream_zstd_pipeline now encode through the entropy-coded
# compress_zstd; stream_delta_commit_pipeline publishes commits via
# link(2) put-if-absent per r12 ADVICE) + the SEVEN overflowed r4
# names + the first 30 of the 44-name r5-latest cohort = exactly the
# 50-row driver window.
# ROUND-14 EXECUTED (this round): 5 r14 additions (the from-scratch
# parquet WRITER roundtrip — Thrift-compact encoder, v1
# PLAIN/PLAIN_DICTIONARY pages, RLE def levels, stats, page indexes,
# split-block blooms, own-zstd page compression, one file per
# executor task; its capstone pruned read over self-written metadata;
# Iceberg SEQUENCE-NUMBER delete ordering with a same-sequence +
# later re-insert lifecycle; MERGE in DELETION-VECTOR mode —
# remove+re-add of the same path with a roaring DV, no rewrite of
# touched files; Delta COLUMN MAPPING mode=name with a metadata-only
# rename) + 4 r14-changed queries (ingest_kafka_recordbatch and
# stream_zstd_pipeline now ride the sequences-emitting zstd encoder;
# the two parquet-index pruning queries after the read_offset_index/
# read_column_index None-contract hardening — the r13 CBOR
# strictness-raise precedent; cdc_delta_deletion_vectors after its
# DV framing moved to the shared roaring.pack_dv_blobs definition —
# byte-identical, equality-pinned in tests) + the FULL 14-name
# r5-latest cohort + the first 26 of the 49-name r6-latest cohort =
# exactly the 50-row driver window.
# ROUND-15 NOTE: pin r15 additions/changes first, then the
# TWENTY-THREE overflowed r6 names (ingest_warc_records,
# ingest_graphite_tags, ingest_otlp_json,
# ingest_otlp_http_live, ingest_dogstatsd_tags,
# ingest_graphite_pickle, stream_influx_pipeline,
# stream_graphite_pipeline, events_ema, events_holt_trend,
# events_cusum_score, events_kalman_level, events_apdex,
# events_holt_winters, events_seasonal_outliers,
# graph_khop_reach_approx, analytic_skyline_frontier,
# analytic_cms_heavy_hitters, analytic_mad_outliers,
# analytic_kll_quantiles, analytic_audience_overlap,
# analytic_hll_audience_overlap, analytic_interval_overlap),
# then the r7-latest cohort head (46 names — recompute with the union
# script over CORRECTNESS_r*.json before trusting this note).
_PRIORITY = (
    # --- new in round 14 ---
    "ingest_parquet_write_roundtrip",
    "ingest_parquet_write_pruned_read",
    "cdc_iceberg_sequence_numbers",
    "cdc_delta_merge_dv",
    "cdc_delta_column_mapping",
    # --- changed in round 14 (engine edits -> fresh evidence) ---
    "ingest_kafka_recordbatch",
    "stream_zstd_pipeline",
    "ingest_parquet_bloom_prune",
    "ingest_parquet_page_index_prune",
    "cdc_delta_deletion_vectors",
    # --- r5-latest evidence cohort (all 14, overflowed from r13) ---
    "multimodal_decode_real",
    "text_winnow_fingerprints",
    "pipeline_quality_filter",
    "text_repetition_signals",
    "dedup_paragraphs",
    "pipeline_lm_typicality",
    "text_bm25_topk",
    "ingest_syslog_rfc3164",
    "ingest_influx_line",
    "events_sla_burn_rate",
    "events_time_weighted_avg",
    "graph_khop_reach",
    "analytic_approx_percentile",
    "analytic_asof_nearest",
    # --- r6-latest evidence cohort (first 26 of 49; the 23 names in
    # the ROUND-15 NOTE overflow to round 15) ---
    "dedup_semantic",
    "dedup_semantic_prune",
    "dedup_image_dhash",
    "dedup_containment",
    "sim_pca_variance_check",
    "multimodal_decode_png",
    "multimodal_decode_jpeg",
    "multimodal_decode_video",
    "pipeline_pack_sequences",
    "pipeline_pack_greedy",
    "multimodal_resize",
    "multimodal_resample_audio",
    "text_html_extract",
    "pipeline_url_canonicalize",
    "text_boolean_retrieval",
    "text_readability",
    "text_collocations_pmi",
    "analytic_json_funcs",
    "cdc_scd2_asof_enrich",
    "layout_runtime_bloom_filter",
    "stream_statsd_pipeline",
    "ingest_carbon_connector_sink",
    "ingest_statsd",
    "ingest_statsd_live",
    "ingest_influx_live",
    "ingest_avro_datasource",
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
