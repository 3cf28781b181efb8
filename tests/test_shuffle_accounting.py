"""Quantitative shuffle accounting (L6): the scale-design claims in
operator docstrings, measured from executed-plan SQLMetrics instead of
asserted rhetorically. Runs at sf0.01 so the numbers are meaningfully
above noise; every bound is stated relative to input/occurrence counts
so it survives testdata regeneration."""

from __future__ import annotations

import duckdb
import pytest

from pyspark.sql import functions as F

from tests.plan_metrics import total_shuffle_bytes_written


@pytest.fixture(scope="module")
def queries():
    import __spark_entry__ as e

    return e.queries()


def _table_count(sf_dir: str, table: str) -> int:
    return duckdb.sql(
        f"SELECT count(*) FROM '{sf_dir}/{table}.parquet'"
    ).fetchone()[0]


def test_rollup_aggs_shuffle_keyspace_not_rows(
    spark, sf_correctness_dir, queries
):
    """Grouped rollups must shuffle combine-level partials, not raw
    rows: bytes written ≤ ~16B × input rows (a raw-row shuffle of the
    events table is ≈50B+/row before compression; the hourly/seasonal
    key spaces are far smaller still)."""
    n_events = _table_count(sf_correctness_dir, "events")
    for name in (
        "events_hourly_stats",
        "events_seasonality",
        "events_histogram_rollup",
    ):
        b = total_shuffle_bytes_written(queries[name](spark, sf_correctness_dir))
        assert 0 < b <= 16 * n_events, (name, b, n_events)


def test_minhash_lsh_candidates_shuffle_ids_only(
    spark, sf_correctness_dir, queries
):
    """THE LSH scale claim: candidate generation shuffles band-bucket
    ids, never shingles or text. Measured ≈0.7 KB at sf0.01 against a
    ≈150 KB corpus — bound at 2% of corpus text bytes."""
    text_bytes = duckdb.sql(
        f"SELECT sum(n_chars) FROM '{sf_correctness_dir}/documents.parquet'"
    ).fetchone()[0]
    b = total_shuffle_bytes_written(
        queries["dedup_minhash_lsh"](spark, sf_correctness_dir)
    )
    assert b <= 0.02 * text_bytes, (b, text_bytes)


def test_common_span_shuffles_hashes_not_text(
    spark, sf_correctness_dir, queries
):
    """The k-gram occurrence stream is (id, int64-hash) pairs: total
    shuffle ≤ 30 B per occurrence (raw text never leaves the scan —
    shipping the 5-word spans themselves would be ≥5× wider)."""
    df = queries["text_common_span_frac"](spark, sf_correctness_dir)
    n_occ = (
        df.agg(F.sum("n_kgrams").alias("s")).first()["s"]
    )
    b = total_shuffle_bytes_written(
        queries["text_common_span_frac"](spark, sf_correctness_dir)
    )
    assert b <= 30 * n_occ, (b, n_occ)


def test_pagerank_shuffle_linear_in_edges_and_iters(
    spark, sf_correctness_dir, queries
):
    """3 iterations × (edge join + dst agg) must stay linear in the
    edge list: ≤ 48 B × directed-edge count × iterations (each shuffled
    record is a handful of int64s; anything quadratic in nodes would
    blow this bound immediately)."""
    n_edges = duckdb.sql(
        f"""
        SELECT 2 * count(*) FROM (
            SELECT DISTINCT o.o_custkey, l.l_suppkey
            FROM '{sf_correctness_dir}/orders.parquet' o
            JOIN '{sf_correctness_dir}/lineitem.parquet' l
              ON o.o_orderkey = l.l_orderkey
        )
        """
    ).fetchone()[0]
    b = total_shuffle_bytes_written(
        queries["graph_pagerank"](spark, sf_correctness_dir)
    )
    assert b <= 48 * n_edges * 3, (b, n_edges)


def test_mrl_truncated_ranking_overlaps_full(spark, sf_dir, queries):
    """Truncated-to-16-dims cosine top-10 vs the full 64-d top-10.
    The fixture embeddings are NOT matryoshka-trained (energy is
    uniform across dims, not front-loaded), so retained fidelity is
    bounded by retained energy: measured ~0.22 mean overlap — assert
    well above chance (10/500 = 0.02) rather than near-parity."""
    from metricproxy_spark.io import load_table
    from metricproxy_spark.operators.similarity import cosine_topk

    emb = load_table(spark, sf_dir, "embeddings")
    t16 = F.slice(F.col("embedding").cast("array<double>"), 1, 16)
    norm = F.sqrt(F.aggregate(t16, F.lit(0.0), lambda a, x: a + x * x))
    trunc = emb.select(
        "vec_id",
        F.transform(t16, lambda x: x / norm).alias("embedding"),
    )
    q_full = emb.filter(F.col("vec_id") < 10)
    q_trunc = trunc.filter(F.col("vec_id") < 10)
    full = {}
    for r in cosine_topk(q_full, emb, k=10).collect():
        full.setdefault(r.query_id, set()).add(r.match_id)
    cheap = {}
    for r in cosine_topk(q_trunc, trunc, k=10).collect():
        cheap.setdefault(r.query_id, set()).add(r.match_id)
    overlaps = [len(full[q] & cheap[q]) / 10 for q in full]
    assert sum(overlaps) / len(overlaps) >= 0.1, overlaps


def test_centroid_broadcasts_stay_kd_bounded(
    spark, sf_correctness_dir, queries
):
    """The k-means/IVF family claim 'only k·d floats broadcast': every
    BroadcastExchange in the assignment plan must carry < 64 KB
    (k=8 × d=64 doubles ≈ 4 KB + row overhead)."""
    from tests.plan_metrics import executed_metrics

    df = queries["sim_kmeans_assign"](spark, sf_correctness_dir)
    mets = executed_metrics(df)
    bcasts = [
        v.get("dataSize", 0)
        for _, name, v in mets
        if name == "BroadcastExchange"
    ]
    assert bcasts, mets  # the broadcast join must actually plan
    assert all(0 < b < 64 * 1024 for b in bcasts), bcasts


def test_exact_sweep_shuffle_linear_in_rows_times_blocks(
    spark, sf_correctness_dir
):
    """The distributed block-pair exact sweep's shuffle must be n·B
    replicated rows (each row visits its B block-pair groups), NOT the
    n² pair space: with B blocks forced, bytes ≤ ~700B × n × B (one
    64-dim float64 vector + ids per replicated row, uncompressed
    upper bound) — and the measured bytes must GROW ~linearly in B,
    proving replication factor, not pair materialization."""
    from metricproxy_spark.io import load_table
    from metricproxy_spark.operators.similarity import (
        embedding_near_dup_pairs,
    )

    n = _table_count(sf_correctness_dir, "embeddings")
    emb = load_table(spark, sf_correctness_dir, "embeddings")

    def bytes_at(blocks: int) -> int:
        return total_shuffle_bytes_written(
            embedding_near_dup_pairs(
                emb,
                threshold=0.4,
                target_block_rows=max(1, n // blocks),
            )
        )

    b4 = bytes_at(4)
    assert b4 <= 700 * n * 4, (b4, n)
    b8 = bytes_at(8)
    assert b8 <= 700 * n * 8, (b8, n)
    # replication scaling: doubling the block count roughly doubles
    # shuffle volume (allow wide slack; quadratic would blow past it)
    assert b8 <= 3.2 * b4, (b4, b8)


def test_containment_join_bitmask_regime_shuffles_masks_not_text(
    spark, sf_correctness_dir, queries
):
    """dedup_containment on the small-vocab corpus runs the bitmask
    regime: what shuffles is one (id, block, int64 mask, n) row per
    corpus document — never word arrays or text. Bound: ≤ 96B per
    corpus doc (2 masks frames + the planted-union overhead), checked
    against the raw text volume it must NOT approach."""
    n_docs = _table_count(sf_correctness_dir, "documents")
    text_bytes = duckdb.sql(
        f"SELECT sum(n_chars) FROM '{sf_correctness_dir}/documents.parquet'"
    ).fetchone()[0]
    n_corpus = n_docs + (n_docs + 10) // 11  # planted quote docs
    b = total_shuffle_bytes_written(
        queries["dedup_containment"](spark, sf_correctness_dir)
    )
    assert 0 < b <= 96 * n_corpus, (b, n_corpus)
    assert b <= 0.5 * text_bytes, (b, text_bytes)
