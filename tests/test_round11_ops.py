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
