"""Table-driven parse tests over tiny in-memory DataFrames — the
engine analog of the reference's per-package Go unit tests
[P: protocol/carbon/carbon_test.go, protocol/collectd/collectd_test.go].
"""

from __future__ import annotations

from pyspark.sql import functions as F

from metricproxy_spark.sources.carbon import (
    commakeys_deconstruct,
    delimiter_deconstruct,
    parse_carbon_lines,
    to_carbon_lines,
)
from metricproxy_spark.sources.collectd import (
    parse_collectd_json,
    parse_collectd_notifications,
)
from metricproxy_spark.sources.signalfx import (
    parse_sfx_v1_json,
    parse_sfx_v2_json,
    sanitize_dimension_keys,
    sanitize_name,
)


def lines_df(spark, lines):
    return spark.createDataFrame([(l,) for l in lines], "line string")


class TestCarbonParse:
    def test_valid_numeric_line(self, spark):
        row = parse_carbon_lines(lines_df(spark, ["cpu.load 1.5 1704067200"])).first()
        assert row.metric == "cpu.load"
        assert row.value == 1.5
        assert row.value_str is None
        assert row.epoch_s == 1704067200
        assert row.metric_type == "gauge"

    def test_int_value_widened(self, spark):
        row = parse_carbon_lines(lines_df(spark, ["m 42 1704067200"])).first()
        assert row.value == 42.0 and row.value_str is None

    def test_string_value_fallback(self, spark):
        row = parse_carbon_lines(lines_df(spark, ["m up 1704067200"])).first()
        assert row.value is None and row.value_str == "up"

    def test_invalid_lines_dropped(self, spark):
        bad = [
            "onlyname",
            "name value",  # missing ts
            "m 1 notatime",
            " 1 1704067200",  # empty name
            "m 1 1704067200 extra",  # 4 fields
        ]
        df = parse_carbon_lines(lines_df(spark, bad + ["ok 1 1704067200"]))
        assert df.count() == 1 and df.first().metric == "ok"

    def test_invalid_kept_and_flagged_when_not_dropping(self, spark):
        df = parse_carbon_lines(
            lines_df(spark, ["bad", "ok 1 1704067200"]), drop_invalid=False
        )
        flags = {r.line: r.is_valid for r in df.collect()}
        assert flags == {"bad": False, "ok 1 1704067200": True}

    def test_raw_line_passthrough_roundtrip(self, spark):
        line = "cpu.load 1.5000 1704067200"
        parsed = parse_carbon_lines(lines_df(spark, [line]))
        out = parsed.select(to_carbon_lines(parsed).alias("wire")).first()
        assert out.wire == line  # byte-identical via meta (C7)

    def test_rebuild_without_meta(self, spark):
        parsed = parse_carbon_lines(lines_df(spark, ["m up 1704067200"]))
        out = parsed.select(to_carbon_lines(parsed, meta_col=None).alias("w")).first()
        assert out.w == "m up 1704067200"  # string value echoed verbatim


class TestDeconstructors:
    def test_commakeys(self, spark):
        df = spark.createDataFrame([("a.b[host=h1,dc=us]",)], "metric string")
        row = commakeys_deconstruct(df).first()
        assert row.metric == "a.b"
        assert row.dimensions == {"host": "h1", "dc": "us"}

    def test_commakeys_identity_fallback(self, spark):
        row = commakeys_deconstruct(
            spark.createDataFrame([("plain.name",)], "metric string")
        ).first()
        assert row.metric == "plain.name" and row.dimensions == {}

    def test_delimiter_first_rule_wins_and_fallback(self, spark):
        rules = [
            {
                "pattern": ["svc", "%", "kpi"],
                "metric_part": 1,
                "dim_parts": {},
                "extra_dims": {"which": "first"},
                "metric_type": "count",
            },
            {
                "pattern": ["svc", "%", "%"],
                "metric_part": 2,
                "dim_parts": {},
                "extra_dims": {"which": "second"},
            },
        ]
        df = spark.createDataFrame(
            [("svc.api.kpi",), ("svc.api.other",), ("nomatch",)], "metric string"
        )
        rows = {
            r.metric: r for r in delimiter_deconstruct(df, rules).collect()
        }
        assert rows["api"].dimensions == {"which": "first"}
        assert rows["api"].metric_type == "count"
        assert rows["other"].dimensions == {"which": "second"}
        assert rows["nomatch"].dimensions == {} and rows["nomatch"].metric_type == "gauge"


class TestCollectd:
    BODY = (
        '[{"dsnames": ["shortterm", "value"], "dstypes": ["gauge", "derive"],'
        ' "values": [0.5, 7.0], "time": 1704067200.25, "interval": 10,'
        ' "host": "h1", "plugin": "load", "plugin_instance": "",'
        ' "type": "load", "type_instance": "avg"}]'
    )

    def test_expansion(self, spark):
        df = parse_collectd_json(
            spark.createDataFrame([(self.BODY,)], "body string")
        )
        rows = sorted(df.collect(), key=lambda r: r.metric)
        assert [r.metric for r in rows] == ["load.avg", "load.avg.shortterm"]
        by_metric = {r.metric: r for r in rows}
        # dsname == "value" omitted from the name; derive → cumulative_counter
        assert by_metric["load.avg"].value == 7.0
        assert by_metric["load.avg"].metric_type == "cumulative_counter"
        assert by_metric["load.avg.shortterm"].metric_type == "gauge"
        assert by_metric["load.avg"].epoch_us == 1704067200250000
        dims = by_metric["load.avg"].dimensions
        assert dims["host"] == "h1" and dims["dsname"] == "value"
        assert "plugin_instance" not in dims  # empty identity fields omitted

    NOTIF_BODY = (
        '[{"time": 1704067200.5, "host": "h1", "plugin": "load",'
        ' "plugin_instance": "", "type": "health", "type_instance": "ping",'
        ' "severity": "failure", "message": "disk full"},'
        ' {"dsnames": ["value"], "dstypes": ["gauge"], "values": [1.0],'
        ' "time": 1704067200.5, "host": "h1", "type": "cpu"}]'
    )

    def test_notifications_split_from_datapoints(self, spark):
        src = spark.createDataFrame(
            [(self.NOTIF_BODY, "x=1&sfxdim_dc=west&sfxdim_host=lose")],
            "body string, query string",
        )
        events = parse_collectd_notifications(src, query_col="query").collect()
        assert len(events) == 1  # the datapoint element is excluded
        ev = events[0]
        assert ev.event_type == "health.ping"
        assert ev.category == "COLLECTD"
        assert ev.epoch_us == 1704067200500000
        import json as _json

        props = _json.loads(ev.properties)
        assert props == {"message": "disk full", "severity": "FAILURE"}
        # sfxdim_* params become dims; element identity wins a key clash;
        # non-sfxdim params are ignored; empty identity fields omitted.
        assert ev.dimensions == {
            "host": "h1",
            "plugin": "load",
            "type_instance": "ping",
            "dc": "west",
        }
        # the datapoint path also takes request dims, and drops notifications
        dps = parse_collectd_json(src, query_col="query").collect()
        assert len(dps) == 1
        assert dps[0].metric == "cpu"
        assert dps[0].dimensions["dc"] == "west"
        assert dps[0].dimensions["host"] == "h1"


class TestSignalFx:
    def test_v2_unpivot_all_type_keys(self, spark):
        body = (
            '{"gauge": [{"metric": "g1", "value": 1.0, "timestamp": 1704067200000}],'
            ' "counter": [{"metric": "c1", "value": 2.0, "dimensions": {"k": "v"}}],'
            ' "cumulative_counter": [{"metric": "cc1", "value": 3.0}]}'
        )
        df = parse_sfx_v2_json(spark.createDataFrame([(body,)], "body string"))
        rows = {r.metric: r for r in df.collect()}
        assert set(rows) == {"g1", "c1", "cc1"}
        assert rows["g1"].metric_type == "gauge"
        assert rows["g1"].ts_ms == 1704067200000
        assert rows["c1"].metric_type == "counter"
        assert rows["c1"].dimensions == {"k": "v"}
        assert rows["cc1"].metric_type == "cumulative_counter"

    def test_v1_registry_join_defaults_gauge(self, spark):
        registry = spark.createDataFrame(
            [("known", "counter")], "sf_metric string, metric_type string"
        )
        lines = spark.createDataFrame(
            [
                ('{"metric": "known", "value": 1.0, "source": "s"}',),
                ('{"metric": "unknown", "value": 2.0, "source": "s"}',),
                ("not json at all",),
            ],
            "line string",
        )
        rows = {r.metric: r for r in parse_sfx_v1_json(lines, registry).collect()}
        assert set(rows) == {"known", "unknown"}  # unparseable line dropped
        assert rows["known"].metric_type == "counter"
        assert rows["unknown"].metric_type == "gauge"

    def test_sanitize(self, spark):
        df = spark.createDataFrame([("a b/c:d",)], "m string").select(
            sanitize_name("m").alias("m"),
            F.map_keys(
                sanitize_dimension_keys(
                    F.create_map(F.lit("bad key!"), F.lit("v"))
                )
            ).alias("keys"),
        )
        row = df.first()
        assert row.m == "a_b_c_d"
        assert row.keys == ["bad_key_"]
