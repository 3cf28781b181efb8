"""Round-6 second-batch operator tests: graphite tagged carbon,
OTLP/JSON metrics, and the analytics/text additions that ride the
same driver window."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from metricproxy_spark.registry import QUERIES, load_all

load_all()


def _q(name):
    return QUERIES[name]


class TestGraphiteTags:
    def test_tag_map_and_untagged_branch(self, spark):
        from metricproxy_spark.sources.graphite import parse_graphite_lines

        lines = spark.createDataFrame(
            [
                ("cpu.load;host=web1;dc=eu-1 0.75 1700000000",),
                ("plain.path 1.5 1700000001",),
                ("malformed line without numbers",),
                ("bad;tags;x 1 2",),  # tag block violates k=v grammar
            ],
            "line string",
        )
        rows = {r.name: r for r in parse_graphite_lines(lines).collect()}
        assert set(rows) == {"cpu.load", "plain.path"}
        assert rows["cpu.load"].tags == {"host": "web1", "dc": "eu-1"}
        assert rows["cpu.load"].value == 0.75
        assert rows["cpu.load"].ts_sec == 1700000000
        assert rows["plain.path"].tags == {}

    def test_wire_roundtrip_preserves_counts(self, spark, sf_dir):
        from metricproxy_spark.io import load_table
        from metricproxy_spark.sources.graphite import (
            graphite_wire_lines,
            parse_graphite_lines,
        )

        ev = load_table(spark, sf_dir, "events")
        lines = ev.select(graphite_wire_lines(ev).alias("line"))
        parsed = parse_graphite_lines(lines)
        assert parsed.count() == ev.count()  # no line lost to the grammar
        n_untagged = parsed.where(F.size(F.map_keys("tags")) == 0).count()
        assert n_untagged == ev.where(F.col("event_id") % 9 == 0).count()

    def test_query_matches_oracle(self, spark, sf_dir):
        from metricproxy_spark.registry import ORACLES
        from tests.oracle_utils import assert_matches_oracle

        assert_matches_oracle(
            _q("ingest_graphite_tags")(spark, sf_dir),
            ORACLES["ingest_graphite_tags"],
            sf_dir,
        )


class TestOtlpJson:
    def test_request_shape_is_spec_conformant(self, spark, sf_dir):
        from metricproxy_spark.io import load_table
        from metricproxy_spark.sources.otlp import otlp_request_json

        ev = load_table(spark, sf_dir, "events").limit(200)
        reqs = [r.request for r in otlp_request_json(ev).collect()]
        assert reqs
        saw_gauge = saw_sum = False
        for raw in reqs:
            d = json.loads(raw)
            (rm,) = d["resourceMetrics"]
            attrs = rm["resource"]["attributes"]
            assert attrs == [
                {"key": "service.name", "value": {"stringValue": "mps-synth"}}
            ]
            (sm,) = rm["scopeMetrics"]
            (metric,) = sm["metrics"]
            assert ("gauge" in metric) != ("sum" in metric)  # strict oneof
            if "gauge" in metric:
                saw_gauge = True
                dps = metric["gauge"]["dataPoints"]
            else:
                saw_sum = True
                assert metric["sum"]["aggregationTemporality"] == 2
                assert metric["sum"]["isMonotonic"] is True
                dps = metric["sum"]["dataPoints"]
            for dp in dps:
                # proto3 JSON: uint64 timeUnixNano is a STRING
                assert isinstance(dp["timeUnixNano"], str)
                assert isinstance(dp["asDouble"], (int, float))
                assert dp["attributes"][0]["key"] == "host"
        assert saw_gauge and saw_sum

    def test_parses_foreign_collector_payload(self, spark):
        """Interop: a hand-written payload in the shape an external
        OTLP exporter produces (multi-metric scope, multi-point
        series, extra attributes) — not our own synthesis."""
        from metricproxy_spark.sources.otlp import parse_otlp_requests

        payload = json.dumps(
            {
                "resourceMetrics": [
                    {
                        "resource": {
                            "attributes": [
                                {
                                    "key": "service.name",
                                    "value": {"stringValue": "checkout"},
                                }
                            ]
                        },
                        "scopeMetrics": [
                            {
                                "scope": {"name": "otelcol"},
                                "metrics": [
                                    {
                                        "name": "http.latency",
                                        "gauge": {
                                            "dataPoints": [
                                                {
                                                    "attributes": [
                                                        {
                                                            "key": "region",
                                                            "value": {
                                                                "stringValue": "eu"
                                                            },
                                                        },
                                                        {
                                                            "key": "host",
                                                            "value": {
                                                                "stringValue": "web7"
                                                            },
                                                        },
                                                    ],
                                                    "timeUnixNano": "1700000000000000000",
                                                    "asDouble": 12.5,
                                                },
                                                {
                                                    "attributes": [],
                                                    "timeUnixNano": "1700000001000000000",
                                                    "asDouble": 13.5,
                                                },
                                            ]
                                        },
                                    },
                                    {
                                        "name": "http.requests",
                                        "sum": {
                                            "aggregationTemporality": 2,
                                            "isMonotonic": True,
                                            "dataPoints": [
                                                {
                                                    "attributes": [
                                                        {
                                                            "key": "host",
                                                            "value": {
                                                                "stringValue": "web7"
                                                            },
                                                        }
                                                    ],
                                                    "timeUnixNano": "1700000002000000000",
                                                    "asDouble": 42.0,
                                                }
                                            ],
                                        },
                                    },
                                ],
                            }
                        ],
                    }
                ]
            }
        )
        df = spark.createDataFrame([(payload,)], "request string")
        rows = sorted(
            parse_otlp_requests(df).collect(), key=lambda r: (r.name, r.ts_ns)
        )
        assert [(r.name, r.mtype, r.host, r.value) for r in rows] == [
            ("http.latency", "gauge", "web7", 12.5),
            ("http.latency", "gauge", None, 13.5),  # no host attribute
            ("http.requests", "sum", "web7", 42.0),
        ]
        assert rows[0].ts_ns == 1700000000000000000

    def test_query_matches_oracle(self, spark, sf_dir):
        from metricproxy_spark.registry import ORACLES
        from tests.oracle_utils import assert_matches_oracle

        assert_matches_oracle(
            _q("ingest_otlp_json")(spark, sf_dir),
            ORACLES["ingest_otlp_json"],
            sf_dir,
        )
