"""Round-11 operator tests: OpenMetrics strictness (exemplars, # EOF
framing, UNIT metadata, seconds timestamps), remote-write 2.0 native
histograms + exemplars, and the streamed alert-for twin helpers."""

from __future__ import annotations

import pytest


class TestOpenMetrics:
    def _lines(self, spark, rows):
        return spark.createDataFrame(
            rows, "scrape int, lineno long, line string"
        )

    def test_sample_with_exemplar_parses_fully(self, spark):
        from metricproxy_spark.sources.prometheus import (
            parse_openmetrics_lines,
        )

        df = self._lines(
            spark,
            [
                (
                    0,
                    1,
                    'http_seconds{path="/x"} 3.5 1700000000.250 '
                    '# {trace_id="abc"} 0.125 1700000000.125',
                ),
                (0, 2, "# EOF"),
            ],
        )
        (r,) = parse_openmetrics_lines(df).collect()
        assert r.metric == "http_seconds"
        assert r.labels == {"path": "/x"}
        assert r.value == 3.5
        assert r.ts_ms == 1700000000250
        assert r.exemplar_labels == {"trace_id": "abc"}
        assert r.exemplar_value == 0.125
        assert r.exemplar_ts_ms == 1700000000125

    def test_sample_without_exemplar_has_null_exemplar(self, spark):
        from metricproxy_spark.sources.prometheus import (
            parse_openmetrics_lines,
        )

        df = self._lines(spark, [(0, 1, "up 1 1700000000.000")])
        (r,) = parse_openmetrics_lines(df).collect()
        assert r.value == 1.0
        assert r.ts_ms == 1700000000000
        assert r.exemplar_labels is None
        assert r.exemplar_value is None
        assert r.exemplar_ts_ms is None

    def test_exemplar_without_sample_timestamp(self, spark):
        # ts is optional even when an exemplar follows — the regex must
        # not let the exemplar's '#' be swallowed by a phantom ts.
        from metricproxy_spark.sources.prometheus import (
            parse_openmetrics_lines,
        )

        df = self._lines(
            spark, [(0, 1, 'c_total 7 # {trace_id="t1"} 2.5')]
        )
        (r,) = parse_openmetrics_lines(df).collect()
        assert r.value == 7.0
        assert r.ts_ms is None
        assert r.exemplar_value == 2.5
        assert r.exemplar_ts_ms is None

    def test_unit_and_type_metadata_registry(self, spark):
        from metricproxy_spark.sources.prometheus import (
            parse_openmetrics_metadata,
        )

        df = self._lines(
            spark,
            [
                (0, 1, "# TYPE http_seconds gauge"),
                (0, 2, "# UNIT http_seconds seconds"),
                (0, 3, "# HELP http_seconds Latency."),
                (0, 4, "# TYPE c_total counter"),
            ],
        )
        rows = {
            r.metric: (r.prom_type, r.unit)
            for r in parse_openmetrics_metadata(df).collect()
        }
        assert rows["http_seconds"] == ("gauge", "seconds")
        assert rows["c_total"] == ("counter", None)

    def test_eof_gate_passes_terminated_expositions(self, spark):
        from metricproxy_spark.sources.prometheus import (
            openmetrics_eof_gate,
        )

        df = self._lines(
            spark,
            [
                (0, 1, "up 1"),
                (0, 9, "# EOF"),
                (1, 1, "up 0"),
                (1, 9, "# EOF"),
            ],
        )
        (g,) = openmetrics_eof_gate(df, "scrape", "lineno").collect()
        assert g.n_bad == 0

    def test_eof_gate_rejects_truncated_exposition(self, spark):
        from metricproxy_spark.sources.prometheus import (
            openmetrics_eof_gate,
        )

        df = self._lines(
            spark,
            [
                (0, 1, "up 1"),
                (0, 9, "# EOF"),
                (1, 1, "up 0"),  # scrape 1 truncated mid-body
            ],
        )
        gate = openmetrics_eof_gate(df, "scrape", "lineno")
        with pytest.raises(Exception, match="not terminated by # EOF"):
            gate.collect()

    def test_eof_gate_rejects_eof_not_last(self, spark):
        from metricproxy_spark.sources.prometheus import (
            openmetrics_eof_gate,
        )

        df = self._lines(
            spark,
            [(0, 1, "# EOF"), (0, 2, "up 1")],
        )
        with pytest.raises(Exception, match="not terminated by # EOF"):
            openmetrics_eof_gate(df, "scrape", "lineno").collect()

    def test_fractional_seconds_are_exact_millis(self, spark):
        from metricproxy_spark.sources.prometheus import (
            parse_openmetrics_lines,
        )

        df = self._lines(
            spark,
            [
                (0, 1, "m 1 1700000000.001"),
                (0, 2, "m 2 1700000000"),
            ],
        )
        rows = sorted(
            parse_openmetrics_lines(df).collect(), key=lambda r: r.value
        )
        assert rows[0].ts_ms == 1700000000001
        assert rows[1].ts_ms == 1700000000000


class TestRemoteWriteV2Histograms:
    def _series(self):
        return [
            {
                "labels": {"__name__": "lat", "type": "click"},
                "samples": [(1.5, 1000)],
                "histograms": [
                    {
                        "count_int": 10,
                        "sum": 12.25,
                        "schema": 0,
                        "zero_threshold": 0.0,
                        "zero_count_int": 2,
                        "positive_buckets": [(0, 3), (1, 2), (5, 4), (6, 1)],
                        "negative_buckets": [(-2, 1), (3, 2)],
                        "timestamp_ms": 1700000000000,
                    }
                ],
                "exemplars": [({"trace_id": "abc"}, 0.125, 1699999999750)],
            },
            {
                "labels": {"__name__": "lat", "type": "error"},
                "samples": [],
                "histograms": [],
                "exemplars": [],
            },
        ]

    def test_roundtrip_full(self):
        from metricproxy_spark.sources.remote_write import (
            decode_remote_write_body_v2_full,
            encode_remote_write_body_v2_full,
        )

        series = self._series()
        assert (
            decode_remote_write_body_v2_full(
                encode_remote_write_body_v2_full(series)
            )
            == series
        )

    def test_exemplar_labels_share_symbol_table(self):
        # 'trace_id'/'abc' must appear ONCE in the symbol table even
        # when two series carry the same exemplar labels.
        from metricproxy_spark.sources.remote_write import (
            decode_write_request_v2_full,
            encode_write_request_v2_full,
        )

        series = [
            {
                "labels": {"__name__": "a"},
                "exemplars": [({"trace_id": "abc"}, 1.0, 1)],
            },
            {
                "labels": {"__name__": "b"},
                "exemplars": [({"trace_id": "abc"}, 2.0, 2)],
            },
        ]
        one = encode_write_request_v2_full(series)
        assert one.count(b"trace_id") == 1
        out = decode_write_request_v2_full(one)
        assert out[0]["exemplars"][0][0] == {"trace_id": "abc"}
        assert out[1]["exemplars"][0][0] == {"trace_id": "abc"}

    def test_every_prefix_truncation_raises_or_decodes(self):
        # The strict-codec contract: every proper prefix either raises
        # a clean ValueError or decodes (a prefix CAN be a valid
        # shorter message) — never an unhandled exception type.
        from metricproxy_spark.sources.remote_write import (
            decode_write_request_v2_full,
            encode_write_request_v2_full,
        )

        buf = encode_write_request_v2_full(self._series())
        for n in range(len(buf)):
            try:
                decode_write_request_v2_full(buf[:n])
            except ValueError:
                pass

    def test_histogram_unpacked_delta_spelling(self):
        # Protobuf compatibility: repeated sint64 may arrive unpacked
        # (one varint field per delta) — decoder must accept it.
        from metricproxy_spark.sources.remote_write import (
            _tag,
            _write_bytes_field,
            _write_varint,
            _zigzag,
            decode_histogram,
            _encode_span,
        )

        out = bytearray()
        _write_bytes_field(out, 11, _encode_span(2, 3))
        for d in (5, -2, 1):  # counts 5, 3, 4 at indices 2, 3, 4
            _write_varint(out, _tag(12, 0))
            _write_varint(out, _zigzag(d))
        h = decode_histogram(bytes(out))
        assert h["positive_buckets"] == [(2, 5), (3, 3), (4, 4)]

    def test_histogram_float_arms(self):
        import struct as _s

        from metricproxy_spark.sources.remote_write import (
            _tag,
            _write_varint,
            decode_histogram,
        )

        out = bytearray()
        _write_varint(out, _tag(2, 1))
        out.extend(_s.pack("<d", 10.5))
        _write_varint(out, _tag(7, 1))
        out.extend(_s.pack("<d", 0.5))
        h = decode_histogram(bytes(out))
        assert h["count_float"] == 10.5
        assert h["zero_count_float"] == 0.5

    def test_histogram_span_delta_mismatch_raises(self):
        from metricproxy_spark.sources.remote_write import (
            _encode_span,
            _tag,
            _write_bytes_field,
            _write_varint,
            _zigzag,
            decode_histogram,
        )

        out = bytearray()
        _write_bytes_field(out, 11, _encode_span(0, 3))  # 3 buckets...
        packed = bytearray()
        for d in (1, 1):  # ...but only 2 deltas
            _write_varint(packed, _zigzag(d))
        _write_bytes_field(out, 12, bytes(packed))
        with pytest.raises(ValueError, match="deltas"):
            decode_histogram(bytes(out))

    def test_histogram_negative_bucket_count_raises(self):
        from metricproxy_spark.sources.remote_write import (
            _encode_span,
            _tag,
            _write_bytes_field,
            _write_varint,
            _zigzag,
            decode_histogram,
        )

        out = bytearray()
        _write_bytes_field(out, 11, _encode_span(0, 2))
        packed = bytearray()
        for d in (1, -5):  # running count drops below zero
            _write_varint(packed, _zigzag(d))
        _write_bytes_field(out, 12, bytes(packed))
        with pytest.raises(ValueError, match="negative"):
            decode_histogram(bytes(out))

    def test_spans_deltas_gap_and_negative_offset(self):
        from metricproxy_spark.sources.remote_write import (
            _buckets_from_spans,
            _spans_deltas,
        )

        buckets = [(-3, 2), (-2, 1), (4, 7), (5, 7), (6, 1)]
        spans, deltas = _spans_deltas(buckets)
        assert spans == [(-3, 2), (5, 3)]
        assert deltas == [2, -1, 6, 0, -6]
        assert _buckets_from_spans(spans, deltas) == buckets

    def test_v1_decoder_skips_v2_arms(self):
        # A histogram-bearing series must not break the sample-only
        # decoder — unknown fields are skipped per protobuf rules.
        from metricproxy_spark.sources.remote_write import (
            decode_write_request_v2,
            encode_write_request_v2_full,
        )

        buf = encode_write_request_v2_full(self._series())
        out = decode_write_request_v2(buf)
        assert out[0] == ({"__name__": "lat", "type": "click"}, [(1.5, 1000)])


class TestStreamAlertForIslands:
    def test_islands_and_clusters_span_micro_batches(self, spark, tmp_path):
        """for:=3, keep:=2 over a crafted 3-batch replay: an island
        completing its for-duration ACROSS the batch-1/2 boundary, a
        keep-gap cluster merge across batch 2/3, a far gap opening a
        second incident, and a key silent for a whole middle batch."""
        import os
        import time

        from pyspark.sql import Window
        from pyspark.sql import functions as F

        from metricproxy_spark.streaming.source import read_stream_table
        from metricproxy_spark.streaming.stateful import alert_for_islands

        batches = [
            [("a", 1), ("a", 2), ("b", 10)],
            [("a", 3), ("a", 5)],
            [("a", 6), ("a", 20), ("a", 21), ("b", 11), ("b", 12)],
        ]
        src = str(tmp_path / "src")
        base = time.time() - 10_000
        for i, rows in enumerate(batches):
            path = os.path.join(src, f"part_{i:04d}")
            spark.createDataFrame(
                rows, "event_type string, hidx long"
            ).coalesce(1).write.mode("overwrite").parquet(path)
            for root, _dirs, files in os.walk(path):
                for f in files:
                    os.utime(os.path.join(root, f), (base + i, base + i))

        stream = read_stream_table(spark, src, max_files_per_trigger=1)
        q = (
            alert_for_islands(stream)
            .writeStream.format("memory")
            .queryName("t_alert_for")
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        out = spark.table("t_alert_for")
        w = Window.partitionBy("event_type")
        final = (
            out.withColumn("_vmax", F.max("version").over(w))
            .where(F.col("version") == F.col("_vmax"))
            .drop("_vmax", "version")
        )
        got = {
            (r.event_type, r.incident_id): (
                r.cluster_start,
                r.cluster_end,
                r.n_islands,
                r.n_true,
                r.fired,
                r.fired_at,
                r.resolved_at,
            )
            for r in final.collect()
        }
        assert got == {
            # island 1-3 stitched across batches 1/2 -> fires at step 3;
            # islands {5} and {5,6} merge via the keep gap (5-3=2);
            # resolved 2 steps after the last true eval + 1
            ("a", 1): (1, 6, 2, 5, True, 3, 9),
            # 20 is 14 steps past 6 -> a brand-new incident, never fires
            ("a", 2): (20, 21, 1, 2, False, None, None),
            # key b silent in batch 2; island 10-12 completes in batch 3
            ("b", 1): (10, 12, 1, 3, True, 12, 15),
        }

    def test_mid_stream_snapshots_are_versioned(self, spark, tmp_path):
        """Batch-1 snapshot rows (version 2) must survive in the sink
        and lose to the final version on the max-version filter."""
        import os
        import time

        from metricproxy_spark.streaming.source import read_stream_table
        from metricproxy_spark.streaming.stateful import alert_for_islands

        batches = [[("a", 1), ("a", 2)], [("a", 3)]]
        src = str(tmp_path / "src")
        base = time.time() - 10_000
        for i, rows in enumerate(batches):
            path = os.path.join(src, f"part_{i:04d}")
            spark.createDataFrame(
                rows, "event_type string, hidx long"
            ).coalesce(1).write.mode("overwrite").parquet(path)
            for root, _dirs, files in os.walk(path):
                for f in files:
                    os.utime(os.path.join(root, f), (base + i, base + i))

        stream = read_stream_table(spark, src, max_files_per_trigger=1)
        q = (
            alert_for_islands(stream)
            .writeStream.format("memory")
            .queryName("t_alert_ver")
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        rows = {
            (r.version, r.fired): (r.cluster_end, r.n_true)
            for r in spark.table("t_alert_ver").collect()
        }
        # batch 1: pending (len 2, not fired); batch 2: fired at step 3
        assert rows == {(2, False): (2, 2), (3, True): (3, 3)}


class TestRemoteWriteV2Metadata:
    def test_metadata_and_created_timestamp_roundtrip(self):
        from metricproxy_spark.sources.remote_write import (
            decode_write_request_v2_full,
            encode_write_request_v2_full,
        )

        series = [
            {
                "labels": {"__name__": "http_seconds"},
                "samples": [(0.5, 1000)],
                "histograms": [],
                "exemplars": [],
                "metadata": {
                    "type": 3,  # METRIC_TYPE_HISTOGRAM per the enum
                    "help": "Request latency.",
                    "unit": "seconds",
                },
                "created_timestamp_ms": 1690000000000,
            }
        ]
        out = decode_write_request_v2_full(
            encode_write_request_v2_full(series)
        )
        assert out == series

    def test_metadata_strings_are_interned(self):
        from metricproxy_spark.sources.remote_write import (
            encode_write_request_v2_full,
        )

        series = [
            {
                "labels": {"__name__": "a"},
                "metadata": {"help": "same help", "unit": "seconds"},
            },
            {
                "labels": {"__name__": "b"},
                "metadata": {"help": "same help", "unit": "seconds"},
            },
        ]
        buf = encode_write_request_v2_full(series)
        assert buf.count(b"same help") == 1
        assert buf.count(b"seconds") == 1

    def test_metadata_ref_out_of_range_raises(self):
        import pytest as _pytest

        from metricproxy_spark.sources.remote_write import (
            _tag,
            _write_bytes_field,
            _write_varint,
            decode_write_request_v2_full,
        )

        # symbols = [""], one series whose metadata unit_ref points
        # past the table
        out = bytearray()
        _write_bytes_field(out, 4, b"")
        ts = bytearray()
        _write_bytes_field(ts, 1, b"")
        md = bytearray()
        _write_varint(md, _tag(4, 0))
        _write_varint(md, 99)
        _write_bytes_field(ts, 5, bytes(md))
        _write_bytes_field(out, 5, bytes(ts))
        with _pytest.raises(ValueError, match="symbol table"):
            decode_write_request_v2_full(bytes(out))

    def test_series_without_metadata_has_no_key(self):
        from metricproxy_spark.sources.remote_write import (
            decode_write_request_v2_full,
            encode_write_request_v2_full,
        )

        series = [{"labels": {"__name__": "a"}, "samples": [(1.0, 1)]}]
        (out,) = decode_write_request_v2_full(
            encode_write_request_v2_full(series)
        )
        assert "metadata" not in out
        assert "created_timestamp_ms" not in out
