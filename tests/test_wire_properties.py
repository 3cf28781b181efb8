"""Property-based grammar tests for the round-6 wire parsers:
arbitrary valid lines/frames must round-trip through the Spark-side
parse exactly; hostile inputs must drop or refuse, never throw.

One shared local session keeps these fast: lines are built in plain
Python (hypothesis drives the grammar), shipped as a one-column
DataFrame, and compared field-by-field after the JVM parse.
"""

from __future__ import annotations

import pickle

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_name = st.from_regex(r"[a-z][a-z0-9_.]{0,20}", fullmatch=True)
_tagk = st.from_regex(r"[a-z][a-z0-9_]{0,8}", fullmatch=True)
_tagv = st.from_regex(r"[a-zA-Z0-9_.-]{1,10}", fullmatch=True)
_val = st.decimals(
    min_value=-10**6, max_value=10**6, places=4, allow_nan=False
)
_ts = st.integers(1_000_000_000, 2_000_000_000)

_SETTINGS = settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


class TestGraphiteGrammar:
    @_SETTINGS
    @given(
        _name,
        st.dictionaries(_tagk, _tagv, min_size=0, max_size=4),
        _val,
        _ts,
    )
    def test_line_roundtrip(self, spark, name, tags, val, ts):
        from metricproxy_spark.sources.graphite import parse_graphite_lines

        tag_block = "".join(f";{k}={v}" for k, v in tags.items())
        line = f"{name}{tag_block} {val} {ts}"
        (row,) = parse_graphite_lines(
            spark.createDataFrame([(line,)], "line string")
        ).collect()
        assert row.name == name
        assert row.tags == tags
        assert row.value == float(val)
        assert row.ts_sec == ts

    @_SETTINGS
    @given(st.text(max_size=40).filter(lambda s: "\n" not in s))
    def test_arbitrary_garbage_never_throws(self, spark, junk):
        from metricproxy_spark.sources.graphite import parse_graphite_lines

        out = parse_graphite_lines(
            spark.createDataFrame([(junk,)], "line string")
        ).collect()
        # either parsed (if it happened to fit the grammar) or dropped
        assert len(out) in (0, 1)


class TestDogStatsdGrammar:
    @_SETTINGS
    @given(
        _name,
        st.sampled_from(["c", "g", "ms", "h"]),
        _val,
        st.one_of(st.none(), st.sampled_from(["0.1", "0.5", "1.0"])),
        st.dictionaries(_tagk, _tagv, min_size=0, max_size=3),
    )
    def test_datagram_roundtrip(self, spark, name, mtype, val, rate, tags):
        from metricproxy_spark.sources.dogstatsd import (
            parse_dogstatsd_lines,
        )

        line = f"{name}:{val}|{mtype}"
        if rate is not None:
            line += f"|@{rate}"
        if tags:
            line += "|#" + ",".join(f"{k}:{v}" for k, v in tags.items())
        (row,) = parse_dogstatsd_lines(
            spark.createDataFrame([(line,)], "line string")
        ).collect()
        assert row.name == name
        assert row.mtype == mtype
        assert row.tags == tags
        expect = float(val) / (float(rate) if rate is not None else 1.0)
        assert float(row.scaled) == pytest.approx(expect, abs=5e-7)


class TestGraphitePickleHostility:
    @_SETTINGS
    @given(st.binary(max_size=60))
    def test_arbitrary_bytes_refuse_cleanly(self, junk):
        """Random bytes must raise a pickle error (or decode to a
        harmless object for the rare valid prefix) — never execute
        anything or hang."""
        from metricproxy_spark.sources.graphite_pickle import _safe_loads

        try:
            _safe_loads(junk)
        except Exception as e:  # noqa: BLE001 - any clean refusal is fine
            assert not isinstance(e, (SystemExit, KeyboardInterrupt))

    def test_every_gadget_class_is_refused(self):
        from metricproxy_spark.sources.graphite_pickle import _safe_loads

        for target in ("os.system", "builtins.eval", "subprocess.Popen"):
            mod, name = target.rsplit(".", 1)
            hostile = (
                b"c" + mod.encode() + b"\n" + name.encode() + b"\n."
            )  # classic GLOBAL opcode payload
            with pytest.raises(pickle.UnpicklingError):
                _safe_loads(hostile)


class TestOtlpTolerance:
    def test_malformed_json_drops_not_throws(self, spark):
        from metricproxy_spark.sources.otlp import parse_otlp_requests

        df = spark.createDataFrame(
            [("{not json",), ("{}",), ('{"resourceMetrics": []}',)],
            "request string",
        )
        assert parse_otlp_requests(df).count() == 0

    def test_missing_optional_fields_tolerated(self, spark):
        from metricproxy_spark.sources.otlp import parse_otlp_requests

        raw = (
            '{"resourceMetrics":[{"scopeMetrics":[{"metrics":'
            '[{"name":"m","gauge":{"dataPoints":[{"timeUnixNano":"5",'
            '"asDouble":1.5}]}}]}]}]}'
        )
        (row,) = parse_otlp_requests(
            spark.createDataFrame([(raw,)], "request string")
        ).collect()
        assert row.name == "m" and row.host is None and row.value == 1.5
