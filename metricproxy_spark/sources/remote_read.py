"""Prometheus REMOTE READ protocol, from scratch (S-ext wire format).

The query-side twin of remote write (public spec: prometheus
prompb/remote.proto — ReadRequest/Query/LabelMatcher/ReadResponse/
QueryResult; transport = snappy-block-compressed protobuf, same as
write). A remote-read server is handed a time range plus label
matchers and returns raw series — the protocol federated storage
backends (Thanos/Cortex/Mimir ancestors) speak. This module gives the
engine BOTH roles: build/parse the request, evaluate matchers, and
build/parse the response.

Wire layout (proto3 field numbers from the public prompb):

- ``ReadRequest``: repeated ``Query queries = 1`` (and
  ``accepted_response_types = 2``, SAMPLES assumed — the streamed
  chunk variant is a negotiation, not a different data model).
- ``Query``: ``int64 start_timestamp_ms = 1``,
  ``int64 end_timestamp_ms = 2`` (both INCLUSIVE),
  ``repeated LabelMatcher matchers = 3``.
- ``LabelMatcher``: ``Type type = 1`` (EQ=0/NEQ=1/RE=2/NRE=3),
  ``string name = 2``, ``string value = 3``. Regex matchers are FULLY
  ANCHORED (PromQL wraps the pattern in ^(?:...)$ — ``fullmatch``
  here).
- ``ReadResponse``: repeated ``QueryResult results = 1``;
  ``QueryResult``: repeated ``TimeSeries timeseries = 1`` —
  structurally IDENTICAL to ``WriteRequest`` (both are exactly
  `repeated TimeSeries = 1`), so the QueryResult codec here IS
  `sources/remote_write.py`'s WriteRequest codec, reused rather than
  re-spelled.

Decode discipline is the repo codec contract: truncated varints /
length-delimited fields raise ``ValueError`` (via the shared
`sfx_protobuf` primitives); unknown fields skip per wire type; every-
prefix truncation tests in ``tests/test_remote_read.py``.
"""

from __future__ import annotations

import re

from metricproxy_spark.sources.remote_write import (
    _read_delimited,
    decode_write_request,
    encode_write_request,
)
from metricproxy_spark.sources.sfx_protobuf import (
    _read_varint,
    _signed64,
    _skip_field,
    _tag,
    _write_bytes_field,
    _write_varint,
)
from metricproxy_spark.sources.snappy import compress_snappy, decompress_snappy

EQ, NEQ, RE, NRE = 0, 1, 2, 3

Matcher = tuple[int, str, str]  # (type, label name, value/pattern)
Query = tuple[int, int, list[Matcher]]  # (start_ms, end_ms, matchers)

# ------------------------------------------------------------- request


def _encode_matcher(mtype: int, name: str, value: str) -> bytes:
    out = bytearray()
    if mtype:  # proto3 default 0 (EQ) is omitted
        _write_varint(out, _tag(1, 0))
        _write_varint(out, mtype)
    _write_bytes_field(out, 2, name.encode())
    _write_bytes_field(out, 3, value.encode())
    return bytes(out)


SAMPLES, STREAMED_XOR_CHUNKS = 0, 1  # ReadRequest.ResponseType


def encode_read_request(
    queries: list[Query],
    accepted_response_types: list[int] | None = None,
) -> bytes:
    out = bytearray()
    for start_ms, end_ms, matchers in queries:
        q = bytearray()
        _write_varint(q, _tag(1, 0))
        _write_varint(q, start_ms)
        _write_varint(q, _tag(2, 0))
        _write_varint(q, end_ms)
        for mtype, name, value in matchers:
            _write_bytes_field(q, 3, _encode_matcher(mtype, name, value))
        _write_bytes_field(out, 1, bytes(q))
    if accepted_response_types:
        # proto3 repeated enum: packed varints
        packed = bytearray()
        for rt in accepted_response_types:
            _write_varint(packed, rt)
        _write_bytes_field(out, 2, bytes(packed))
    return bytes(out)


def _decode_matcher(buf: bytes) -> Matcher:
    mtype = 0
    name = value = ""
    pos = 0
    while pos < len(buf):
        key, pos = _read_varint(buf, pos)
        field, wire = key >> 3, key & 7
        if field == 1 and wire == 0:
            mtype, pos = _read_varint(buf, pos)
            if mtype > NRE:
                raise ValueError("remote-read: unknown matcher type")
        elif field == 2 and wire == 2:
            raw, pos = _read_delimited(buf, pos)
            name = raw.decode("utf-8")
        elif field == 3 and wire == 2:
            raw, pos = _read_delimited(buf, pos)
            value = raw.decode("utf-8")
        else:
            pos = _skip_field(buf, pos, wire)
    return mtype, name, value


def _decode_query(buf: bytes) -> Query:
    start_ms = end_ms = 0
    matchers: list[Matcher] = []
    pos = 0
    while pos < len(buf):
        key, pos = _read_varint(buf, pos)
        field, wire = key >> 3, key & 7
        if field == 1 and wire == 0:
            raw, pos = _read_varint(buf, pos)
            start_ms = _signed64(raw)
        elif field == 2 and wire == 0:
            raw, pos = _read_varint(buf, pos)
            end_ms = _signed64(raw)
        elif field == 3 and wire == 2:
            raw, pos = _read_delimited(buf, pos)
            matchers.append(_decode_matcher(raw))
        else:
            pos = _skip_field(buf, pos, wire)
    return start_ms, end_ms, matchers


def decode_read_request(buf: bytes) -> list[Query]:
    queries, _ = decode_read_request_full(buf)
    return queries


def decode_read_request_full(buf: bytes) -> tuple[list[Query], list[int]]:
    """→ (queries, accepted_response_types) — the latter decoded from
    packed AND unpacked varint spellings (both are spec-valid)."""
    queries: list[Query] = []
    accepted: list[int] = []
    pos = 0
    while pos < len(buf):
        key, pos = _read_varint(buf, pos)
        field, wire = key >> 3, key & 7
        if field == 1 and wire == 2:
            raw, pos = _read_delimited(buf, pos)
            queries.append(_decode_query(raw))
        elif field == 2 and wire == 2:  # packed repeated enum
            raw, pos = _read_delimited(buf, pos)
            p = 0
            while p < len(raw):
                rt, p = _read_varint(raw, p)
                accepted.append(rt)
        elif field == 2 and wire == 0:  # unpacked spelling
            rt, pos = _read_varint(buf, pos)
            accepted.append(rt)
        else:
            pos = _skip_field(buf, pos, wire)
    return queries, accepted


# ------------------------------------------------------------ response

SeriesT = tuple[dict[str, str], list[tuple[float, int]]]


def encode_read_response(results: list[list[SeriesT]]) -> bytes:
    """One QueryResult per request query, in request order. The
    QueryResult body is byte-identical to a WriteRequest (both are
    `repeated TimeSeries = 1`) — the write codec is the codec."""
    out = bytearray()
    for series in results:
        _write_bytes_field(out, 1, encode_write_request(series))
    return bytes(out)


def decode_read_response(buf: bytes) -> list[list[SeriesT]]:
    results: list[list[SeriesT]] = []
    pos = 0
    while pos < len(buf):
        key, pos = _read_varint(buf, pos)
        field, wire = key >> 3, key & 7
        if field == 1 and wire == 2:
            raw, pos = _read_delimited(buf, pos)
            results.append(decode_write_request(raw))
        else:
            pos = _skip_field(buf, pos, wire)
    return results


# ----------------------------------------------------- wire transport


def encode_read_request_body(queries: list[Query]) -> bytes:
    return compress_snappy(encode_read_request(queries))


def decode_read_request_body(body: bytes) -> list[Query]:
    return decode_read_request(decompress_snappy(body))


def encode_read_response_body(results: list[list[SeriesT]]) -> bytes:
    return compress_snappy(encode_read_response(results))


def decode_read_response_body(body: bytes) -> list[list[SeriesT]]:
    return decode_read_response(decompress_snappy(body))


# --------------------------------------------------- matcher semantics


def matcher_accepts(labels: dict[str, str], matchers: list[Matcher]) -> bool:
    """PromQL label-matcher semantics: a missing label reads as the
    empty string (so ``NEQ("job", "x")`` accepts series WITHOUT a job
    label, and ``EQ("job", "")`` selects exactly those); regexes are
    fully anchored."""
    for mtype, name, value in matchers:
        actual = labels.get(name, "")
        if mtype == EQ:
            ok = actual == value
        elif mtype == NEQ:
            ok = actual != value
        elif mtype == RE:
            ok = re.fullmatch(value, actual) is not None
        elif mtype == NRE:
            ok = re.fullmatch(value, actual) is None
        else:
            raise ValueError("remote-read: unknown matcher type")
        if not ok:
            return False
    return True
