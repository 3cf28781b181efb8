"""Round-6 second-batch operator tests: graphite tagged carbon,
OTLP/JSON metrics, and the analytics/text additions that ride the
same driver window."""

from __future__ import annotations

import json

import pytest
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
            assert sm["metrics"]  # batched: many series per request
            for metric in sm["metrics"]:
                assert ("gauge" in metric) != ("sum" in metric)  # oneof
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


class TestApdex:
    def test_score_bounds_and_known_values(self, spark):
        from metricproxy_spark.registry import ORACLES

        df = spark.createDataFrame(
            [
                (1, "2024-01-01 00:10:00", "api", 50.0),   # satisfied
                (2, "2024-01-01 00:20:00", "api", 100.0),  # boundary: satisfied
                (3, "2024-01-01 00:30:00", "api", 400.0),  # boundary: tolerating
                (4, "2024-01-01 00:40:00", "api", 900.0),  # frustrated
            ],
            "event_id long, ts string, event_type string, value double",
        ).withColumn("ts", F.col("ts").cast("timestamp"))
        import duckdb

        con = duckdb.connect()
        con.register("events", df.toPandas())
        row = con.execute(ORACLES["events_apdex"]).df().iloc[0]
        assert row.n_satisfied == 2 and row.n_tolerating == 1
        assert row.apdex == (2 + 0.5 * 1) / 4

    def test_query_matches_oracle(self, spark, sf_dir):
        from metricproxy_spark.registry import ORACLES
        from tests.oracle_utils import assert_matches_oracle

        assert_matches_oracle(
            _q("events_apdex")(spark, sf_dir), ORACLES["events_apdex"], sf_dir
        )


class TestReadability:
    def test_sentence_splitter_on_punctuated_prose(self, spark, sf_dir):
        """The synthetic corpus has no terminals (n_sentences == 1);
        prove the [.!?]+ splitter and the vowel-group syllable proxy
        on real punctuated prose, including '?!' runs counting once."""
        import duckdb

        from metricproxy_spark.registry import ORACLES

        prose = (
            "The cat sat on the mat. It was happy?! Then it left... "
            "What a day."
        )
        con = duckdb.connect()
        con.register(
            "documents",
            __import__("pandas").DataFrame(
                {"doc_id": [1], "lang": ["en"], "text": [prose]}
            ),
        )
        row = con.execute(ORACLES["text_readability"]).df().iloc[0]
        assert row.n_sentences == 4  # '?!' and '...' each count once
        assert row.n_words == 15
        # flesch for 4 words/sentence and this syllable density is high
        assert 80 < row.flesch <= 121.22
        assert row.fk_grade < 3

    def test_query_matches_oracle(self, spark, sf_dir):
        from metricproxy_spark.registry import ORACLES
        from tests.oracle_utils import assert_matches_oracle

        assert_matches_oracle(
            _q("text_readability")(spark, sf_dir),
            ORACLES["text_readability"],
            sf_dir,
        )


class TestCollocationsPmi:
    def test_lift_on_planted_collocation(self, spark):
        """'hong kong' always adjacent => lift = N / c_hong / c_kong
        * c_xy; independent fillers get lift ~1."""
        rows = [(i, "hong kong " + "x y " * 5) for i in range(10)]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        import duckdb

        from metricproxy_spark.registry import ORACLES

        con = duckdb.connect()
        con.register("documents", df.toPandas())
        out = {
            (r.x, r.y): (r.c_xy, r.lift)
            for _, r in con.execute(ORACLES["text_collocations_pmi"])
            .df()
            .iterrows()
        }
        # 12 tokens/doc, 11 bigrams/doc, N=110; hong:10, kong:10, xy pairs
        c_xy, lift = out[("hong", "kong")]
        assert c_xy == 10 and lift == (10 * 110) / (10 * 10)
        c_xy, lift = out[("x", "y")]
        assert c_xy == 50 and lift == (50 * 110) / (50 * 50)

    def test_spark_matches_oracle_and_broadcasts(self, spark, sf_dir):
        from metricproxy_spark.registry import ORACLES
        from tests.oracle_utils import assert_matches_oracle

        df = _q("text_collocations_pmi")(spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan  # unigram dims never shuffle
        assert_matches_oracle(df, ORACLES["text_collocations_pmi"], sf_dir)


class TestContainmentJoin:
    def test_planted_quote_has_containment_one(self, spark, sf_dir):
        df = _q("dedup_containment")(spark, sf_dir)
        # the pair (quote, its source) must surface with containment
        # exactly 1.0 (the quote's distinct words are a subset)
        vs_source = {
            r.id_a: r.containment
            for r in df.filter(
                F.col("id_b") == F.col("id_a") - 2000000
            ).collect()
        }
        from metricproxy_spark.io import load_table

        docs = load_table(spark, sf_dir, "documents")
        expect = {
            r.doc_id + 2000000
            for r in docs.filter(F.col("doc_id") % 11 == 0).collect()
        }
        assert set(vs_source) == expect
        assert all(c == 1.0 for c in vs_source.values())

    def test_directional_asymmetry(self, spark):
        """A subset of B: C(A in B) = 1, C(B in A) = |A|/|B| < t —
        only the forward direction must appear."""
        from metricproxy_spark.operators.dedup import (
            containment_similarity_join,
        )

        rows = [
            (1, ["a", "b", "c"]),
            (2, ["a", "b", "c", "d", "e", "f", "g", "h"]),
            (3, ["x", "y", "z"]),
        ]
        ws = spark.createDataFrame(
            rows, "doc_id long, words array<string>"
        )
        out = {
            (r.id_a, r.id_b): r.containment
            for r in containment_similarity_join(
                ws, "doc_id", "words", threshold=0.9
            ).collect()
        }
        assert out == {(1, 2): 1.0}

    def test_general_prefix_path_matches_naive(self, spark):
        """Force the >63-token regime with a wide vocabulary and check
        the prefix-filtered join returns exactly the naive result."""
        import itertools
        import random

        rng = random.Random(7)
        vocab = [f"tok{i}" for i in range(200)]
        docs = []
        for i in range(30):
            docs.append((i, sorted(rng.sample(vocab, rng.randint(8, 20)))))
        # plant subsets
        for i in range(0, 30, 10):
            base = docs[i][1]
            docs.append((1000 + i, base[: max(1, len(base) * 3 // 4)]))
        ws = spark.createDataFrame(docs, "doc_id long, words array<string>")
        from metricproxy_spark.operators.dedup import (
            containment_similarity_join,
        )

        t = 0.7
        got = {
            (r.id_a, r.id_b): round(r.containment, 9)
            for r in containment_similarity_join(
                ws, "doc_id", "words", threshold=t
            ).collect()
        }
        naive = {}
        for (ia, wa), (ib, wb) in itertools.permutations(docs, 2):
            inter = len(set(wa) & set(wb))
            c = inter / len(set(wa))
            if c >= t:
                naive[(ia, ib)] = round(c, 9)
        assert got == naive and naive  # non-empty and exact


class TestHoltWinters:
    def test_matches_numpy_reference(self, spark, sf_dir):
        """Re-run the recurrence in plain Python over the same hourly
        series and demand bit-equality with the Spark HOF fold."""
        from metricproxy_spark.functions.aggregates import dsum
        from metricproxy_spark.io import load_table

        m = 24
        ev = load_table(spark, sf_dir, "events")
        hourly = (
            ev.groupBy(
                "event_type", F.date_trunc("hour", "ts").alias("hour_ts")
            )
            .agg(dsum("value").alias("x"))
            .orderBy("event_type", "hour_ts")
            .collect()
        )
        series = {}
        for r in hourly:
            series.setdefault(r.event_type, []).append(r.x)

        got = {
            r.event_type: r
            for r in _q("events_holt_winters")(spark, sf_dir).collect()
        }
        assert set(got) == {t for t, v in series.items() if len(v) > m}
        for t, xs in series.items():
            if len(xs) <= m:
                continue
            l = sum_ = xs[0]
            for x in xs[1:m]:
                sum_ = sum_ + x
            l = sum_ / 24.0
            b = 0.0
            s = [x - l for x in xs[:m]]
            for x in xs[m:]:
                l_new = 0.5 * (x - s[0]) + 0.5 * (l + b)
                b = 0.25 * (l_new - l) + 0.75 * b
                s = s[1:] + [0.25 * (x - l_new) + 0.75 * s[0]]
                l = l_new
            r = got[t]
            assert r.level == l and r.trend == b
            assert r.forecast_1 == l + b + s[0]
            assert r.season_lo == min(s) and r.season_hi == max(s)

    def test_query_matches_oracle(self, spark, sf_dir):
        from metricproxy_spark.registry import ORACLES
        from tests.oracle_utils import assert_matches_oracle

        assert_matches_oracle(
            _q("events_holt_winters")(spark, sf_dir),
            ORACLES["events_holt_winters"],
            sf_dir,
        )


class TestOtlpHttpLive:
    def test_listener_accepts_v1_metrics_and_rejects_unknown(self, tmp_path):
        import http.client

        from metricproxy_spark.streaming.httplistener import (
            HttpIngestListener,
        )

        with HttpIngestListener(str(tmp_path)) as lis:
            conn = http.client.HTTPConnection(lis.host, lis.port, timeout=10)
            conn.request(
                "POST",
                "/v1/metrics",
                body=b'{"resourceMetrics":[]}',
                headers={"Content-Type": "application/json"},
            )
            r = conn.getresponse()
            assert r.status == 200
            r.read()
            conn.request("POST", "/v1/traces", body=b"{}")
            r = conn.getresponse()
            assert r.status == 404
            r.read()
            conn.close()
        import os

        assert len(os.listdir(tmp_path)) == 1  # only the accepted request


class TestAudienceOverlap:
    def test_hll_estimates_track_exact_within_bound(self, spark, sf_dir):
        exact = {
            (r.type_a, r.type_b): (r.n_users_a, r.n_users_b, r.n_both)
            for r in _q("analytic_audience_overlap")(spark, sf_dir).collect()
        }
        est = {
            (r.type_a, r.type_b): (r.est_users_a, r.est_users_b, r.est_both)
            for r in _q("analytic_hll_audience_overlap")(
                spark, sf_dir
            ).collect()
        }
        assert set(exact) == set(est)
        for k, (na, nb, nboth) in exact.items():
            ea, eb, eboth = est[k]
            # lgK=14 => ~0.8% standard error per sketch
            assert abs(ea - na) <= max(2, 0.04 * na)
            assert abs(eb - nb) <= max(2, 0.04 * nb)
            # inclusion-exclusion compounds three estimates: allow
            # 3 sketches' worth of relative error on the UNION size
            union = na + nb - nboth
            assert abs(eboth - nboth) <= max(4, 0.12 * union), (k, nboth, eboth)

    def test_sketch_build_is_single_scan_partial_agg(self, spark, sf_dir):
        df = _q("analytic_hll_audience_overlap")(spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        # the sketch dim is checkpoint-materialized ONCE: the pair
        # join reads ExistingRDD and re-scans no parquet at all
        assert plan.lower().count("filescan") == 0
        assert "ExistingRDD" in plan


class TestSeasonalOutliers:
    def test_planted_seasonal_spike_flagged(self, spark):
        """A value normal globally but 5-sigma for ITS hour must be
        flagged; the same value at a noisy hour must not be."""
        import duckdb
        import pandas as pd

        from metricproxy_spark.registry import ORACLES

        rows = []
        eid = 0
        # hour 3: tight around 10 +/- 1; hour 12: wide around 10 +/- 50
        for day in range(1, 21):
            for hod, spread_v in ((3, 1.0), (12, 50.0)):
                for k in (-1, 1):
                    rows.append(
                        (eid, f"2024-01-{day:02d} {hod:02d}:00:00", "api",
                         10.0 + k * spread_v)
                    )
                    eid += 1
        # the probe value 40 at both hours
        rows.append((eid, "2024-01-21 03:00:00", "api", 40.0))
        rows.append((eid + 1, "2024-01-21 12:00:00", "api", 40.0))
        pdf = pd.DataFrame(
            rows, columns=["event_id", "ts", "event_type", "value"]
        )
        pdf["ts"] = pd.to_datetime(pdf["ts"])
        con = duckdb.connect()
        con.register("events", pdf)
        out = {
            (r.event_type, r.hod): r.n_outliers
            for _, r in con.execute(ORACLES["events_seasonal_outliers"])
            .df()
            .iterrows()
        }
        assert out[("api", 3)] == 1  # probe is ~30 sigma at 03:00
        assert out[("api", 12)] == 0  # same value unremarkable at noon

    def test_query_matches_oracle(self, spark, sf_dir):
        from metricproxy_spark.registry import ORACLES
        from tests.oracle_utils import assert_matches_oracle

        assert_matches_oracle(
            _q("events_seasonal_outliers")(spark, sf_dir),
            ORACLES["events_seasonal_outliers"],
            sf_dir,
        )


class TestRound6bPlanDiscipline:
    def test_wire_parse_aggs_have_single_exchange(self, spark, sf_dir):
        """graphite/otlp at-rest ingest: map-only parse + ONE hash agg
        shuffle — no extra exchange may creep in (the OTLP batching
        group-by is part of synthesis, not parse, and is exempt)."""
        from metricproxy_spark.io import load_table
        from metricproxy_spark.sources.graphite import (
            aggregate_graphite,
            graphite_wire_lines,
            parse_graphite_lines,
        )

        ev = load_table(spark, sf_dir, "events")
        lines = ev.select(graphite_wire_lines(ev).alias("line"))
        plan = (
            aggregate_graphite(parse_graphite_lines(lines))
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert plan.count("Exchange") == 1
        assert "BatchScan" in plan or "FileScan" in plan

    def test_apdex_and_seasonal_push_column_pruning(self, spark, sf_dir):
        for name, need in (
            ("events_apdex", {"ts", "value", "event_type"}),
            ("events_seasonal_outliers", {"ts", "value", "event_type"}),
        ):
            df = _q(name)(spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
            import re

            schemas = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
            assert schemas
            for sch in schemas:
                cols = {c.split(":")[0] for c in sch.split(",") if c}
                assert cols <= need, (name, cols)


class TestDogStatsd:
    def test_grammar_branches(self, spark):
        from metricproxy_spark.sources.dogstatsd import parse_dogstatsd_lines

        lines = spark.createDataFrame(
            [
                ("api.lat:12.5|ms|#env:prod,host:web1",),
                ("hits:3|c|@0.25|#env:prod",),
                ("plain:1|g",),
                ("broken line",),
            ],
            "line string",
        )
        rows = {r.name: r for r in parse_dogstatsd_lines(lines).collect()}
        assert set(rows) == {"api.lat", "hits", "plain"}
        assert rows["api.lat"].tags == {"env": "prod", "host": "web1"}
        assert float(rows["hits"].scaled) == 12.0  # 3 / 0.25
        assert rows["plain"].tags == {}

    def test_query_matches_oracle(self, spark, sf_dir):
        from metricproxy_spark.registry import ORACLES
        from tests.oracle_utils import assert_matches_oracle

        assert_matches_oracle(
            _q("ingest_dogstatsd_tags")(spark, sf_dir),
            ORACLES["ingest_dogstatsd_tags"],
            sf_dir,
        )


class TestGraphitePickle:
    def test_restricted_unpickler_refuses_gadgets(self):
        import pickle

        import pytest

        from metricproxy_spark.sources.graphite_pickle import _safe_loads

        class Evil:
            def __reduce__(self):
                return (print, ("pwned",))

        hostile = pickle.dumps([("a.path", (1, Evil()))])
        with pytest.raises(pickle.UnpicklingError):
            _safe_loads(hostile)
        # the legitimate wire shape decodes fine
        ok = pickle.dumps([("a.path", (1700000000, 1.5))], protocol=2)
        assert _safe_loads(ok) == [("a.path", (1700000000, 1.5))]

    def test_doubles_survive_verbatim(self, spark):
        """pickle carries float64 bit-for-bit — no text-repr loss."""
        import math

        from metricproxy_spark.sources.graphite_pickle import (
            decode_graphite_pickle,
            graphite_pickle_frames,
        )

        vals = [0.1, 1 / 3, math.pi, 185.22]
        rows = [
            (i, "2024-01-01 00:00:%02d" % i, i, "t", v)
            for i, v in enumerate(vals)
        ]
        ev = spark.createDataFrame(
            rows,
            "event_id long, ts string, user_id long,"
            " event_type string, value double",
        ).withColumn("ts", F.col("ts").cast("timestamp"))
        back = decode_graphite_pickle(graphite_pickle_frames(ev)).collect()
        assert sorted(r.value for r in back) == sorted(vals)

    def test_query_matches_oracle(self, spark, sf_dir):
        from metricproxy_spark.registry import ORACLES
        from tests.oracle_utils import assert_matches_oracle

        assert_matches_oracle(
            _q("ingest_graphite_pickle")(spark, sf_dir),
            ORACLES["ingest_graphite_pickle"],
            sf_dir,
        )


class TestThetaSetAlgebra:
    def test_estimates_track_exact_set_algebra(self, spark, sf_dir):
        exact = {
            (r.type_a, r.type_b): (r.n_users_a, r.n_users_b, r.n_both)
            for r in _q("analytic_audience_overlap")(spark, sf_dir).collect()
        }
        theta = {
            (r.type_a, r.type_b): r
            for r in _q("analytic_theta_set_algebra")(
                spark, sf_dir
            ).collect()
        }
        assert set(exact) == set(theta)
        for k, (na, nb, nboth) in exact.items():
            t = theta[k]
            union = na + nb - nboth
            only_a = na - nboth
            # default lgK=12 theta: <1% std err; intersections inherit
            # the union's absolute error — allow 5% of the union + 2
            tol = max(2, 0.05 * union)
            assert abs(t.est_users_a - na) <= tol
            assert abs(t.est_users_b - nb) <= tol
            assert abs(t.est_both - nboth) <= tol, (k, nboth, t.est_both)
            assert abs(t.est_only_a - only_a) <= tol
            assert abs(t.est_union - union) <= tol
            # algebra consistency of the estimates themselves
            assert t.est_both + t.est_only_a == pytest.approx(
                t.est_users_a, abs=2
            )

    def test_sketch_dim_is_materialized_once(self, spark, sf_dir):
        df = _q("analytic_theta_set_algebra")(spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert plan.lower().count("filescan") == 0
        assert "ExistingRDD" in plan
