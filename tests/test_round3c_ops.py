"""Edge-semantics unit tests for the round-3c operators, on hand-built
tiny fixtures (the registry contract tests prove oracle equality on the
driver data; these pin the boundary behaviors a future refactor could
silently change)."""

from __future__ import annotations

import datetime as dt
import os
import tempfile

import pandas as pd
import pytest


def _write_events(rows) -> str:
    """Write a minimal events.parquet (schema-compatible with the
    driver's) into a fresh sf-dir; rows = (event_id, ts, user_id,
    event_type, value)."""
    d = tempfile.mkdtemp(prefix="mps_r3c_fix_")
    pdf = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value"]
    )
    pdf["props"] = "{}"
    pdf["ts"] = pd.to_datetime(pdf["ts"])
    pdf.to_parquet(os.path.join(d, "events.parquet"), index=False)
    return d


TS0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _q(name):
    import __spark_entry__ as se

    return se.queries()[name]


class TestSessionize:
    def test_exact_30min_gap_does_not_split(self, spark):
        sf = _write_events(
            [
                (1, TS0, 7, "click", 1.0),
                # exactly 1800s later: same session (> 1800 splits)
                (2, TS0 + dt.timedelta(seconds=1800), 7, "click", 1.0),
                # 1801s after event 2: new session
                (3, TS0 + dt.timedelta(seconds=3601), 7, "click", 1.0),
            ]
        )
        rows = {
            (r.session_seq, r.n_events)
            for r in _q("events_sessionize")(spark, sf).collect()
        }
        assert rows == {(1, 2), (2, 1)}

    def test_fractional_second_gap_just_over_threshold_splits(self, spark):
        """A 1800.05s gap crosses exactly 1800 whole-second boundaries
        but 1_800_050_000 microseconds of elapsed time: the split
        predicate (and the DuckDB oracle) must compare ELAPSED
        microseconds, not boundary crossings — this gap is a split."""
        sf = _write_events(
            [
                (1, TS0, 7, "click", 1.0),
                (
                    2,
                    TS0 + dt.timedelta(seconds=1800, milliseconds=50),
                    7,
                    "click",
                    1.0,
                ),
            ]
        )
        rows = {
            (r.session_seq, r.n_events)
            for r in _q("events_sessionize")(spark, sf).collect()
        }
        assert rows == {(1, 1), (2, 1)}

    def test_fractional_second_gap_just_under_threshold_holds(self, spark):
        # 1799.95s elapsed: same session even though 1800 boundaries
        # may be crossed depending on phase
        sf = _write_events(
            [
                (1, TS0 + dt.timedelta(milliseconds=990), 7, "click", 1.0),
                (
                    2,
                    TS0 + dt.timedelta(seconds=1800, milliseconds=940),
                    7,
                    "click",
                    1.0,
                ),
            ]
        )
        [r] = _q("events_sessionize")(spark, sf).collect()
        assert (r.session_seq, r.n_events) == (1, 2)

    def test_timestamp_ties_break_by_event_id(self, spark):
        sf = _write_events(
            [
                (2, TS0, 7, "click", 1.0),
                (1, TS0, 7, "click", 1.0),  # same ts, lower id first
            ]
        )
        [r] = _q("events_sessionize")(spark, sf).collect()
        assert (r.session_seq, r.n_events, r.duration_us) == (1, 2, 0)


class TestConcurrency:
    def test_half_open_intervals_end_before_start(self, spark):
        # event B starts exactly when A's 300s interval ends: the -1
        # sorts before the +1 at that instant, so peak stays 1.
        sf = _write_events(
            [
                (1, TS0, 1, "click", 1.0),
                (2, TS0 + dt.timedelta(seconds=300), 2, "click", 1.0),
            ]
        )
        [r] = _q("events_concurrency")(spark, sf).collect()
        assert r.max_concurrent == 1

    def test_overlap_counts(self, spark):
        sf = _write_events(
            [
                (1, TS0, 1, "click", 1.0),
                (2, TS0 + dt.timedelta(seconds=299), 2, "click", 1.0),
            ]
        )
        [r] = _q("events_concurrency")(spark, sf).collect()
        assert r.max_concurrent == 2


class TestDownsampleM4:
    def test_first_last_tie_break_by_event_id(self, spark):
        # all four events in one hour bucket; two share the earliest ts
        sf = _write_events(
            [
                (2, TS0, 1, "click", 20.0),  # tied-first, higher id
                (1, TS0, 1, "click", 10.0),  # tied-first, lower id wins
                (3, TS0 + dt.timedelta(minutes=1), 1, "click", 99.0),
                (4, TS0 + dt.timedelta(minutes=2), 1, "click", 5.0),
            ]
        )
        [r] = _q("events_downsample_m4")(spark, sf).collect()
        assert (r.n_points, r.v_min, r.v_max) == (4, 5.0, 99.0)
        assert r.v_first == 10.0  # event_id 1 beats 2 at the same ts
        assert r.v_last == 5.0


class TestBigramCoverage:
    def test_short_docs_yield_null_permille(self, spark):
        d = tempfile.mkdtemp(prefix="mps_r3c_docs_")
        pdf = pd.DataFrame(
            {
                "doc_id": [1, 2, 3],
                "text": ["one", "a b a b", "a b c"],
                "lang": ["en"] * 3,
                "source": ["s"] * 3,
                "n_chars": [3, 7, 5],
            }
        )
        pdf.to_parquet(os.path.join(d, "documents.parquet"), index=False)
        got = {
            r.doc_id: (r.n_bigrams, r.common_permille)
            for r in _q("text_bigram_coverage")(spark, d).collect()
        }
        assert got[1] == (0, None)  # single word: no bigrams, NULL score
        # corpus counts: "a b" x3 (common), "b a" x1, "b c" x1 (rare)
        assert got[2] == (3, 666)  # 2 of 3 occurrences common
        assert got[3] == (2, 500)


class TestSemanticPruneInvariants:
    def test_kept_plus_dropped_equals_total(self, spark, sf_dir):
        rows = _q("dedup_semantic_prune")(spark, sf_dir).collect()
        assert rows, "expected at least one cluster"
        for r in rows:
            assert r.n_kept + r.n_dropped == r.n_total
            assert r.n_kept >= 1  # the lowest id in a cluster survives


class TestApproxPercentile:
    def test_rank_error_within_sketch_bound(self, spark, sf_dir):
        from pyspark.sql import functions as F

        from metricproxy_spark.io import load_table

        got = {
            r.event_type: (r.p50, r.p95, r.p99)
            for r in _q("analytic_approx_percentile")(spark, sf_dir).collect()
        }
        ev = load_table(spark, sf_dir, "events")
        for etype, approx in got.items():
            vals = sorted(
                r.value
                for r in ev.where(F.col("event_type") == etype)
                .select("value")
                .collect()
            )
            n = len(vals)
            for q, a in zip((0.5, 0.95, 0.99), approx):
                # rank of the sketch answer must be within 1/accuracy
                # (plus 1 position of slack for interpolation-free picks)
                import bisect

                lo = bisect.bisect_left(vals, a)
                hi = bisect.bisect_right(vals, a)
                target = q * (n - 1)
                slack = n / 10000.0 + 1
                assert lo - slack <= target <= hi + slack, (
                    etype, q, a, lo, hi, target,
                )
