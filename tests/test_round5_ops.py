"""Edge semantics for the round-5 operators: count-min sketch bounds,
statsd rate correction, influx tag/field parsing, TWA hand-check, BM25
ranking sanity, and k-hop reach consistency."""

from __future__ import annotations

from pyspark.sql import functions as F

from metricproxy_spark.io import load_table
from metricproxy_spark.registry import QUERIES, load_all

load_all()


class TestCountMinSketch:
    def _sketch_and_exact(self, spark, rows, depth=4, width=64):
        from metricproxy_spark.operators.sketches import (
            cms_build,
            cms_estimate,
        )

        df = spark.createDataFrame([(x,) for x in rows], "item string")
        sketch = cms_build(df, "item", depth=depth, width=width)
        exact = df.groupBy("item").agg(F.count(F.lit(1)).alias("exact_n"))
        est = cms_estimate(exact, sketch, "item", depth=depth, width=width)
        return {r.item: (r.exact_n, r.cms_est) for r in est.collect()}

    def test_never_underestimates(self, spark):
        rows = [f"u{i % 37}" for i in range(1000)] + ["hot"] * 200
        got = self._sketch_and_exact(spark, rows)
        for item, (exact, est) in got.items():
            assert est >= exact, (item, exact, est)

    def test_overestimate_bounded(self, spark):
        # e/width * N bound (Cormode-Muthukrishnan) with depth=4 —
        # deterministic seeds, so assert the classical bound outright
        # with a 2x safety margin for the min over only 4 rows.
        rows = [f"u{i % 37}" for i in range(1000)]
        n = len(rows)
        width = 64
        got = self._sketch_and_exact(spark, rows, width=width)
        bound = 2 * 2.72 * n / width
        for item, (exact, est) in got.items():
            assert est - exact <= bound, (item, exact, est)

    def test_exact_when_no_collisions(self, spark):
        # few distinct items, wide sketch: every estimate is exact
        rows = ["a"] * 5 + ["b"] * 3 + ["c"] * 1
        got = self._sketch_and_exact(spark, rows, width=4096)
        assert got == {"a": (5, 5), "b": (3, 3), "c": (1, 1)}

    def test_absent_candidate_estimates_zero(self, spark):
        # A candidate never seen at build time must come back with
        # cms_est = 0 when its cells are empty (wide sketch => no
        # collisions), and must NOT be dropped from the output — the
        # CMS point-query contract treats a missing cell as 0.
        from metricproxy_spark.operators.sketches import (
            cms_build,
            cms_estimate,
        )

        build = spark.createDataFrame(
            [("a",)] * 5 + [("b",)] * 3, "item string"
        )
        sketch = cms_build(build, "item", width=4096)
        cands = spark.createDataFrame(
            [("a",), ("ghost",), ("phantom",)], "item string"
        )
        got = {
            r.item: r.cms_est
            for r in cms_estimate(cands, sketch, "item", width=4096).collect()
        }
        assert got == {"a": 5, "ghost": 0, "phantom": 0}

    def test_absent_candidate_narrow_sketch_still_bounded(self, spark):
        # Even when an absent item collides on SOME seeds, the min
        # over ALL d seeds (empty cells counting 0) keeps the
        # overestimate within the εN bound rather than min-ing over
        # only the collided subset.
        from metricproxy_spark.operators.sketches import (
            cms_build,
            cms_estimate,
        )

        rows = [(f"u{i % 37}",) for i in range(1000)]
        build = spark.createDataFrame(rows, "item string")
        width = 64
        sketch = cms_build(build, "item", width=width)
        cands = spark.createDataFrame(
            [(f"absent{i}",) for i in range(20)], "item string"
        )
        est = cms_estimate(cands, sketch, "item", width=width)
        bound = 2 * 2.72 * len(rows) / width
        out = est.collect()
        assert len(out) == 20
        for r in out:
            assert 0 <= r.cms_est <= bound, (r.item, r.cms_est)

    def test_sketch_is_mergeable(self, spark):
        # sketch(A ∪ B) == cell-wise sum of sketch(A) + sketch(B)
        from metricproxy_spark.operators.sketches import cms_build

        a = [f"u{i % 11}" for i in range(100)]
        b = [f"v{i % 7}" for i in range(50)]
        mk = lambda rows: {  # noqa: E731
            (r.seed, r.bucket): r.cell_n
            for r in cms_build(
                spark.createDataFrame([(x,) for x in rows], "item string"),
                "item",
                width=64,
            ).collect()
        }
        sa, sb, sab = mk(a), mk(b), mk(a + b)
        merged = {k: sa.get(k, 0) + sb.get(k, 0) for k in set(sa) | set(sb)}
        assert merged == sab


class TestStatsdSemantics:
    def test_counter_rate_correction_and_sets(self, spark, sf_dir):
        rows = QUERIES["ingest_statsd"](spark, sf_dir).collect()
        by_type = {}
        for r in rows:
            by_type.setdefault(r.mtype, []).append(r)
        assert set(by_type) == {"c", "g", "ms", "s"}
        # sets report distinct members, no total
        for r in by_type["s"]:
            assert r.total is None and r.n_members >= 1
        # non-sets report totals, no members
        for t in ("c", "g", "ms"):
            for r in by_type[t]:
                assert r.n_members is None and r.total is not None

    def test_sampled_counter_scales_up(self, spark):
        # two identical counters, one sampled at 0.5 → double weight
        import pandas as pd

        from metricproxy_spark.registry import ORACLES

        assert "val / rate" in ORACLES["ingest_statsd"]
        lines = ["m:2.0|c|@0.5", "m:2.0|c"]
        df = spark.createDataFrame([(l,) for l in lines], "line string")
        rx = r"^([^:]+):([^|]+)\|([a-z]+)(?:\|@([0-9.]+))?$"
        g = lambda i: F.regexp_extract("line", rx, i)  # noqa: E731
        got = (
            df.select(
                g(2).alias("v"),
                F.nullif(g(4), F.lit("")).alias("rate"),
            )
            .select(
                (
                    F.col("v").try_cast("double")
                    / F.coalesce(
                        F.col("rate").try_cast("double"), F.lit(1.0)
                    )
                ).alias("scaled")
            )
            .agg(F.sum("scaled"))
            .collect()[0][0]
        )
        assert got == 6.0  # 2/0.5 + 2/1


def test_influx_line_roundtrip_counts(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    rows = QUERIES["ingest_influx_line"](spark, sf_dir).collect()
    assert sum(r.n_points for r in rows) == ev.count()
    # 5 event types x 5 hosts
    assert len(rows) == 25
    for r in rows:
        assert r.min_ts_ns <= r.max_ts_ns
        assert r.min_ts_ns % 1000 == 0  # µs-sourced nanos


def test_twa_hand_case(spark, tmp_path):
    """value 10 held for 3s then 1 for 1s → TWA 7.75 for the day."""
    import datetime as dt

    rows = [
        (1, dt.datetime(2024, 1, 1, 0, 0, 0), 1, "t", 10.0, "{}"),
        (2, dt.datetime(2024, 1, 1, 0, 0, 3), 1, "t", 1.0, "{}"),
        (3, dt.datetime(2024, 1, 1, 0, 0, 4), 1, "t", 99.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string"
    )
    p = str(tmp_path / "events.parquet")
    df.write.parquet(p)
    got = QUERIES["events_time_weighted_avg"](spark, str(tmp_path)).collect()
    [r] = got
    assert r.n_segments == 2
    assert r.span_us == 4_000_000
    assert r.twa == (10.0 * 3 + 1.0 * 1) / 4


class TestBm25:
    def test_more_hits_rank_higher_same_length(self, spark, sf_dir):
        rows = QUERIES["text_bm25_topk"](spark, sf_dir).collect()
        assert len(rows) <= 20
        assert all(r.score > 0 for r in rows)
        scores = [r.score for r in rows]
        assert scores == sorted(scores, reverse=True)

    def test_doc_without_terms_scores_zero(self, spark, sf_dir):
        # every returned top doc must contain at least one query term
        for r in QUERIES["text_bm25_topk"](spark, sf_dir).collect():
            assert r.tf_hash + r.tf_join + r.tf_window > 0


def test_khop_reach_bounds(spark, sf_dir):
    sup = load_table(spark, sf_dir, "supplier")
    n_supp = sup.count()
    rows = QUERIES["graph_khop_reach"](spark, sf_dir).collect()
    assert 0 < len(rows) <= n_supp
    for r in rows:
        assert r.n_customers >= 1
        assert 0 <= r.n_peer_suppliers <= n_supp - 1
