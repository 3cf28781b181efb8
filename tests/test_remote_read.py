"""Prometheus remote-read codec tests (same discipline as the
remote-write suite): roundtrips, matcher semantics, every-prefix
truncation, fuzz-only-ValueError."""

from __future__ import annotations

import random

import pytest

from metricproxy_spark.sources.remote_read import (
    EQ,
    NEQ,
    NRE,
    RE,
    decode_read_request,
    decode_read_request_body,
    decode_read_response,
    decode_read_response_body,
    encode_read_request,
    encode_read_request_body,
    encode_read_response,
    encode_read_response_body,
    matcher_accepts,
)

QUERIES = [
    (
        1704412800000,
        1705708800000,
        [
            (EQ, "__name__", "events_total"),
            (RE, "type", "(click|s.*)"),
            (NEQ, "type", "error"),
            (NRE, "type", "p.*"),
        ],
    ),
    (0, 1, []),
]

SERIES = [
    (
        {"__name__": "events_total", "type": "click"},
        [(1.5, 1704412800000), (2.0, 1704416400000)],
    ),
    ({"__name__": "events_total", "type": "signup"}, [(3.0, 1704412800000)]),
]


class TestRequestCodec:
    def test_roundtrip(self):
        assert decode_read_request(encode_read_request(QUERIES)) == QUERIES

    def test_body_roundtrip_through_snappy(self):
        body = encode_read_request_body(QUERIES)
        assert decode_read_request_body(body) == QUERIES

    def test_empty_request(self):
        assert decode_read_request(encode_read_request([])) == []

    def test_eq_matcher_type_omitted_as_proto3_default(self):
        # EQ=0 must not be written (proto3 default) yet decode as EQ
        blob = encode_read_request([(5, 9, [(EQ, "a", "b")])])
        (_, _, [(mtype, name, value)],) = decode_read_request(blob)[0:1][0]
        assert (mtype, name, value) == (EQ, "a", "b")

    def test_unknown_matcher_type_rejected(self):
        blob = bytearray(encode_read_request([(5, 9, [(NRE, "a", "b")])]))
        # the NRE type varint (value 3) is the byte after its tag;
        # patch it to 4 and expect the strict raise
        idx = blob.index(3)
        blob[idx] = 4
        with pytest.raises(ValueError, match="matcher type"):
            decode_read_request(bytes(blob))

    def test_every_prefix_truncation_raises_or_shrinks(self):
        blob = encode_read_request(QUERIES)
        for cut in range(len(blob)):
            try:
                got = decode_read_request(blob[:cut])
            except ValueError:
                continue
            # protobuf prefixes cut at message boundaries decode to a
            # prefix of the query list
            assert got == QUERIES[: len(got)]

    def test_fuzz_raises_valueerror_only(self):
        rng = random.Random(23)
        for _ in range(2000):
            b = bytes(rng.randrange(256) for _ in range(rng.randint(0, 60)))
            try:
                decode_read_request(b)
            except ValueError:
                pass


class TestResponseCodec:
    def test_roundtrip(self):
        results = [SERIES, [], SERIES[:1]]
        assert decode_read_response(encode_read_response(results)) == results

    def test_body_roundtrip_through_snappy(self):
        body = encode_read_response_body([SERIES])
        assert decode_read_response_body(body) == [SERIES]

    def test_queryresult_is_writerequest_bytes(self):
        # the structural-identity claim: QueryResult payload ==
        # WriteRequest encoding of the same series
        from metricproxy_spark.sources.remote_write import (
            encode_write_request,
        )

        resp = encode_read_response([SERIES])
        assert encode_write_request(SERIES) in resp

    def test_float_bit_fidelity(self):
        vals = [0.1, -0.0, 1e300, 5e-324]
        series = [({"n": "x"}, [(v, i) for i, v in enumerate(vals)])]
        back = decode_read_response(encode_read_response([series]))
        got = [v for v, _ in back[0][0][1]]
        import struct

        assert [struct.pack("<d", v) for v in got] == [
            struct.pack("<d", v) for v in vals
        ]


class TestMatcherSemantics:
    def test_all_four_types(self):
        ms = QUERIES[0][2]
        assert matcher_accepts({"__name__": "events_total", "type": "click"}, ms)
        assert matcher_accepts({"__name__": "events_total", "type": "signup"}, ms)
        assert not matcher_accepts({"__name__": "events_total", "type": "error"}, ms)
        assert not matcher_accepts({"__name__": "events_total", "type": "purchase"}, ms)
        assert not matcher_accepts({"__name__": "other", "type": "click"}, ms)

    def test_regex_is_fully_anchored(self):
        # "lick" substring-matches but must NOT fullmatch
        assert not matcher_accepts({"t": "clicked"}, [(RE, "t", "click")])
        assert matcher_accepts({"t": "click"}, [(RE, "t", "click")])

    def test_missing_label_reads_as_empty(self):
        assert matcher_accepts({}, [(EQ, "job", "")])
        assert matcher_accepts({}, [(NEQ, "job", "x")])
        assert not matcher_accepts({}, [(EQ, "job", "x")])
        assert matcher_accepts({}, [(NRE, "job", ".+")])


class TestRemoteReadServer:
    def _store(self):
        return [
            ({"__name__": "m", "type": "a"}, [(1.0, 100), (2.0, 200)]),
            ({"__name__": "m", "type": "b"}, [(3.0, 150)]),
        ]

    def test_live_roundtrip_over_tcp(self):
        import http.client

        from metricproxy_spark.streaming.httplistener import (
            RemoteReadServer,
        )

        with RemoteReadServer(self._store()) as srv:
            conn = http.client.HTTPConnection(srv.host, srv.port, timeout=10)
            body = encode_read_request_body(
                [(100, 160, [(EQ, "__name__", "m")])]
            )
            conn.request("POST", "/api/v1/read", body=body)
            resp = conn.getresponse()
            assert resp.status == 200
            assert resp.getheader("Content-Encoding") == "snappy"
            results = decode_read_response_body(resp.read())
            conn.close()
        # time range [100,160] inclusive keeps (1.0,100) and (3.0,150)
        assert results == [
            [
                ({"__name__": "m", "type": "a"}, [(1.0, 100)]),
                ({"__name__": "m", "type": "b"}, [(3.0, 150)]),
            ]
        ]
        assert srv.served == 1

    def test_matcher_filtering_on_server(self):
        import http.client

        from metricproxy_spark.streaming.httplistener import (
            RemoteReadServer,
        )

        with RemoteReadServer(self._store()) as srv:
            conn = http.client.HTTPConnection(srv.host, srv.port, timeout=10)
            body = encode_read_request_body(
                [(0, 1000, [(NEQ, "type", "a")])]
            )
            conn.request("POST", "/api/v1/read", body=body)
            results = decode_read_response_body(conn.getresponse().read())
            conn.close()
        assert [lbl["type"] for lbl, _ in results[0]] == ["b"]

    def test_healthz_and_404_and_400(self):
        import http.client

        from metricproxy_spark.streaming.httplistener import (
            RemoteReadServer,
        )

        with RemoteReadServer(self._store()) as srv:
            conn = http.client.HTTPConnection(srv.host, srv.port, timeout=10)
            conn.request("GET", "/healthz")
            assert conn.getresponse().read() == b"OK"
            conn.request("POST", "/nope", body=b"")
            assert conn.getresponse().status == 404
            conn.close()
            # malformed (non-snappy) body -> 400, never a 500/crash
            conn = http.client.HTTPConnection(srv.host, srv.port, timeout=10)
            conn.request("POST", "/api/v1/read", body=b"\xff\xff garbage")
            assert conn.getresponse().status == 400
            conn.close()
