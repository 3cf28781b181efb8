"""OTLP/protobuf metrics wire codec tests."""

from __future__ import annotations

import math
import random

import pytest

from metricproxy_spark.sources.otlp_protobuf import (
    GAUGE_KIND,
    SUM_KIND,
    decode_export_request,
    encode_export_request,
)

_RES = {"service.name": "events", "host.name": "h-1"}
_METRICS = [
    (
        "events.click",
        GAUGE_KIND,
        [
            ({"user": "7"}, 1_700_000_000_000_000_000, 1.5, None),
            ({"user": "9", "az": "a"}, 1_700_000_000_000_001_000, -2.25, None),
        ],
    ),
    (
        "events.click.uid",
        SUM_KIND,
        [({"user": "7"}, 1_700_000_000_000_000_000, None, 7)],
    ),
    ("events.empty", GAUGE_KIND, []),
]


class TestOtlpProtobuf:
    def test_roundtrip(self):
        body = encode_export_request(_RES, "metricproxy-spark", _METRICS)
        res, scope, metrics = decode_export_request(body)
        assert res == _RES
        assert scope == "metricproxy-spark"
        assert metrics == _METRICS

    def test_special_doubles_and_int_extremes(self):
        metrics = [
            (
                "m",
                GAUGE_KIND,
                [
                    ({}, 0, float("inf"), None),
                    ({}, 2**63 - 1, -0.0, None),
                ],
            ),
            (
                "s",
                SUM_KIND,
                [
                    ({}, 1, None, -(2**63)),
                    ({}, 2, None, 2**63 - 1),
                ],
            ),
        ]
        _, _, dec = decode_export_request(
            encode_export_request({}, "", metrics)
        )
        assert dec == metrics
        nan_dec = decode_export_request(
            encode_export_request(
                {}, "", [("m", GAUGE_KIND, [({}, 5, float("nan"), None)])]
            )
        )[2][0][2][0]
        assert math.isnan(nan_dec[2]) and nan_dec[1] == 5

    def test_unknown_metric_kinds_skipped(self):
        # a Metric carrying field 9 (histogram) only: walked, dropped
        # (kind stays None), without disturbing siblings.
        from metricproxy_spark.sources.sfx_protobuf import (
            _write_bytes_field,
        )

        hist_metric = bytearray()
        _write_bytes_field(hist_metric, 1, b"h")  # name
        _write_bytes_field(hist_metric, 9, b"\x0a\x00")  # histogram blob
        sm = bytearray()
        _write_bytes_field(sm, 2, bytes(hist_metric))
        rm = bytearray()
        _write_bytes_field(rm, 2, bytes(sm))
        req = bytearray()
        _write_bytes_field(req, 1, bytes(rm))
        _, _, metrics = decode_export_request(bytes(req))
        assert metrics == []

    def test_every_truncated_prefix_raises_or_degrades(self):
        body = encode_export_request(_RES, "s", _METRICS)
        for cut in range(len(body)):
            try:
                res, scope, metrics = decode_export_request(body[:cut])
            except ValueError:
                continue
            # a clean parse of a prefix can only be a sub-request
            assert len(metrics) <= len(_METRICS)

    def test_fuzz_raises_valueerror_only(self):
        rng = random.Random(23)
        for _ in range(2000):
            b = bytes(rng.randrange(256) for _ in range(rng.randint(0, 80)))
            try:
                decode_export_request(b)
            except ValueError:
                pass
