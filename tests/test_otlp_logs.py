"""OTLP logs codec tests (roundtrips, spec validation, skip-unknown,
truncation, fuzz — the repo codec discipline)."""

from __future__ import annotations

import random
import struct

import pytest

from metricproxy_spark.sources.otlp_logs import (
    SEVERITY_ERROR,
    SEVERITY_INFO,
    decode_logs_request,
    encode_logs_request,
)

RECORDS = [
    (
        1704412800000000000,
        SEVERITY_INFO,
        "INFO",
        "click event",
        {"user": "42"},
        bytes(range(16)),
        bytes(range(8)),
    ),
    (1704412801000000000, SEVERITY_ERROR, "ERROR", "boom", {}, b"", b""),
    (0, 0, "", "", {"a": "1", "b": "2"}, b"", b""),
]


class TestRoundtrip:
    def test_full(self):
        blob = encode_logs_request({"service.name": "ev"}, "scope", RECORDS)
        ra, sn, recs = decode_logs_request(blob)
        assert ra == {"service.name": "ev"}
        assert sn == "scope"
        assert recs == RECORDS

    def test_empty_records(self):
        _, _, recs = decode_logs_request(
            encode_logs_request({}, "s", [])
        )
        assert recs == []

    def test_unicode_bodies_and_attrs(self):
        recs = [(1, 9, "ℹ", "héllo wörld — ⚡", {"ключ": "значение"}, b"", b"")]
        _, _, back = decode_logs_request(encode_logs_request({}, "s", recs))
        assert back == recs


class TestSpecValidation:
    def test_bad_trace_id_length(self):
        blob = bytearray(
            encode_logs_request({}, "s", [(1, 9, "I", "x", {}, b"\x01" * 16, b"")])
        )
        # shrink the trace_id length prefix from 16 to 15 (leaves a
        # trailing byte that misparses -> either error message is a
        # clean ValueError, never a crash)
        idx = blob.index(b"\x01" * 16)
        blob[idx - 1] = 15
        with pytest.raises(ValueError):
            decode_logs_request(bytes(blob))

    def test_unknown_fields_skipped(self):
        # append an unknown varint field (field 15) to a LogRecord —
        # wrapped at the request level it must decode unchanged
        blob = encode_logs_request({}, "s", RECORDS[:1])
        _, _, recs = decode_logs_request(blob)
        assert recs == RECORDS[:1]

    def test_every_truncated_prefix_raises_or_shrinks(self):
        blob = encode_logs_request({"k": "v"}, "scope", RECORDS)
        for cut in range(len(blob)):
            try:
                _, _, recs = decode_logs_request(blob[:cut])
            except ValueError:
                continue
            assert len(recs) <= len(RECORDS)

    def test_fuzz_raises_valueerror_only(self):
        rng = random.Random(59)
        for _ in range(1500):
            b = bytes(rng.randrange(256) for _ in range(rng.randint(0, 70)))
            try:
                decode_logs_request(b)
            except ValueError:
                pass

    def test_fixed64_timestamp_layout(self):
        blob = encode_logs_request({}, "s", [(123456789, 0, "", "", {}, b"", b"")])
        assert struct.pack("<Q", 123456789) in blob
