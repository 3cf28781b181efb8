"""Prometheus remote-write wire codec (S-ext ingest family).

The modern metrics PUSH protocol: an HTTP POST to ``/api/v1/write``
whose body is a snappy-block-compressed protobuf ``WriteRequest``
(public spec: prometheus/prometheus prompb/remote.proto and the
remote-write 1.0 specification):

    message WriteRequest { repeated TimeSeries timeseries = 1; }
    message TimeSeries  { repeated Label  labels  = 1;
                          repeated Sample samples = 2; }
    message Label       { string name = 1; string value = 2; }
    message Sample      { double value = 1; int64 timestamp = 2; }
                          // timestamp = unix millis

Like `sources/sfx_protobuf.py`, no protobuf runtime exists in this
environment, so the (public, stable) wire format — base-128 varints,
tag/wire-type framing, little-endian fixed64 doubles — is implemented
directly, reusing that module's varint machinery. Snappy block
compression comes from the sibling from-scratch codec
(`sources/snappy.py`).

Decode discipline: the STRICT codec contract — any malformed byte
stream (bad wire type for a known field, truncated length-delimited
payload, junk fields) raises a clean ``ValueError``; unknown fields
are SKIPPED per protobuf compatibility rules (wire types 0/1/2/5),
which is what lets a 1.x receiver ingest 2.x senders. Pure Python,
isolated inside Arrow-batched ``mapInPandas`` over whole request
bodies (SURVEY §8 risk 3).
"""

from __future__ import annotations

import struct

from metricproxy_spark.sources.sfx_protobuf import (
    _read_varint,
    _signed64,
    _skip_field,  # one field-skipping contract, shared with every codec
    _tag,
    _write_bytes_field,
    _write_varint,
)
from metricproxy_spark.sources.snappy import compress_snappy, decompress_snappy

# ------------------------------------------------------------- encoding


def _encode_label(name: str, value: str) -> bytes:
    out = bytearray()
    _write_bytes_field(out, 1, name.encode())
    _write_bytes_field(out, 2, value.encode())
    return bytes(out)


def _encode_sample(value: float, timestamp_ms: int) -> bytes:
    out = bytearray()
    _write_varint(out, _tag(1, 1))
    out.extend(struct.pack("<d", value))
    _write_varint(out, _tag(2, 0))
    _write_varint(out, timestamp_ms)
    return bytes(out)


def encode_write_request(
    timeseries: list[tuple[dict[str, str], list[tuple[float, int]]]],
) -> bytes:
    """``[(labels, [(value, ts_ms), ...]), ...]`` → WriteRequest bytes.

    Labels are emitted sorted by name — the remote-write spec requires
    sorted, unique label names."""
    out = bytearray()
    for labels, samples in timeseries:
        ts = bytearray()
        for name in sorted(labels):
            _write_bytes_field(ts, 1, _encode_label(name, labels[name]))
        for value, t in samples:
            _write_bytes_field(ts, 2, _encode_sample(value, t))
        _write_bytes_field(out, 1, bytes(ts))
    return bytes(out)


def encode_remote_write_body(
    timeseries: list[tuple[dict[str, str], list[tuple[float, int]]]],
) -> bytes:
    """Full wire body: snappy-block-compressed WriteRequest."""
    return compress_snappy(encode_write_request(timeseries))


# ------------------------------------------------------------- decoding


def _read_delimited(buf: bytes, pos: int) -> tuple[bytes, int]:
    ln, pos = _read_varint(buf, pos)
    if pos + ln > len(buf):
        raise ValueError("truncated length-delimited field")
    return buf[pos : pos + ln], pos + ln


def _decode_label(buf: bytes) -> tuple[str, str]:
    name = value = ""
    pos = 0
    while pos < len(buf):
        key, pos = _read_varint(buf, pos)
        field, wire = key >> 3, key & 7
        if field == 1 and wire == 2:
            raw, pos = _read_delimited(buf, pos)
            name = raw.decode("utf-8")
        elif field == 2 and wire == 2:
            raw, pos = _read_delimited(buf, pos)
            value = raw.decode("utf-8")
        else:
            pos = _skip_field(buf, pos, wire)
    return name, value


def _decode_sample(buf: bytes) -> tuple[float, int]:
    value = 0.0
    ts = 0
    pos = 0
    while pos < len(buf):
        key, pos = _read_varint(buf, pos)
        field, wire = key >> 3, key & 7
        if field == 1 and wire == 1:
            if pos + 8 > len(buf):
                raise ValueError("truncated sample value")
            (value,) = struct.unpack_from("<d", buf, pos)
            pos += 8
        elif field == 2 and wire == 0:
            raw, pos = _read_varint(buf, pos)
            ts = _signed64(raw)
        else:
            pos = _skip_field(buf, pos, wire)
    return value, ts


def decode_write_request(
    buf: bytes,
) -> list[tuple[dict[str, str], list[tuple[float, int]]]]:
    """WriteRequest bytes → ``[(labels, [(value, ts_ms), ...]), ...]``."""
    out: list[tuple[dict[str, str], list[tuple[float, int]]]] = []
    pos = 0
    while pos < len(buf):
        key, pos = _read_varint(buf, pos)
        field, wire = key >> 3, key & 7
        if field == 1 and wire == 2:
            raw, pos = _read_delimited(buf, pos)
            labels: dict[str, str] = {}
            samples: list[tuple[float, int]] = []
            tpos = 0
            while tpos < len(raw):
                tkey, tpos = _read_varint(raw, tpos)
                tfield, twire = tkey >> 3, tkey & 7
                if tfield == 1 and twire == 2:
                    lraw, tpos = _read_delimited(raw, tpos)
                    name, value = _decode_label(lraw)
                    labels[name] = value
                elif tfield == 2 and twire == 2:
                    sraw, tpos = _read_delimited(raw, tpos)
                    samples.append(_decode_sample(sraw))
                else:
                    tpos = _skip_field(raw, tpos, twire)
            out.append((labels, samples))
        else:
            pos = _skip_field(buf, pos, wire)
    return out


def decode_remote_write_body(
    body: bytes,
) -> list[tuple[dict[str, str], list[tuple[float, int]]]]:
    """Full wire body: snappy-decompress, then parse the WriteRequest."""
    return decode_write_request(decompress_snappy(body))


# ------------------------------------------------- remote-write 2.0
# Public spec: prometheus prompb io/prometheus/write/v2/types.proto +
# the remote-write 2.0 specification. The v2 Request interns every
# label name/value once in a request-wide symbol table and each series
# carries PACKED varint refs (even index = name ref, odd = value ref):
#
#     message Request    { repeated string symbols = 4;
#                          repeated TimeSeries timeseries = 5; }
#     message TimeSeries { repeated uint32 labels_refs = 1 [packed];
#                          repeated Sample sample  = 2; }  // v1 Sample
#
# symbols[0] MUST be the empty string (spec §"Symbols"). Packed fields
# are the one protobuf wire shape the v1 codec never needed; per the
# protobuf spec, decoders must accept BOTH packed (wire type 2) and
# unpacked (repeated varint) encodings of a packed field — this one
# does, and the tests pin both spellings.


def encode_write_request_v2(
    timeseries: list[tuple[dict[str, str], list[tuple[float, int]]]],
) -> bytes:
    """Same logical input as :func:`encode_write_request`, emitted as a
    v2 ``Request`` with an interned symbol table and packed refs."""
    symbols: list[str] = [""]
    interned: dict[str, int] = {"": 0}

    def ref(s: str) -> int:
        if s not in interned:
            interned[s] = len(symbols)
            symbols.append(s)
        return interned[s]

    series_blobs = []
    for labels, samples in timeseries:
        refs: list[int] = []
        for name in sorted(labels):
            refs.append(ref(name))
            refs.append(ref(labels[name]))
        ts = bytearray()
        packed = bytearray()
        for r in refs:
            _write_varint(packed, r)
        _write_bytes_field(ts, 1, bytes(packed))
        for value, t in samples:
            _write_bytes_field(ts, 2, _encode_sample(value, t))
        series_blobs.append(bytes(ts))

    out = bytearray()
    for s in symbols:
        _write_bytes_field(out, 4, s.encode())
    for blob in series_blobs:
        _write_bytes_field(out, 5, blob)
    return bytes(out)


def decode_write_request_v2(
    buf: bytes,
) -> list[tuple[dict[str, str], list[tuple[float, int]]]]:
    """v2 ``Request`` bytes → the same shape v1 decode returns; raises
    ``ValueError`` on out-of-range symbol refs, odd ref counts, or a
    non-empty symbols[0]."""
    symbols: list[str] = []
    raw_series: list[bytes] = []
    pos = 0
    while pos < len(buf):
        key, pos = _read_varint(buf, pos)
        field, wire = key >> 3, key & 7
        if field == 4 and wire == 2:
            raw, pos = _read_delimited(buf, pos)
            symbols.append(raw.decode("utf-8"))
        elif field == 5 and wire == 2:
            raw, pos = _read_delimited(buf, pos)
            raw_series.append(raw)
        else:
            pos = _skip_field(buf, pos, wire)
    if symbols and symbols[0] != "":
        raise ValueError("remote-write 2.0 symbols[0] must be empty")
    out: list[tuple[dict[str, str], list[tuple[float, int]]]] = []
    for raw in raw_series:
        refs: list[int] = []
        samples: list[tuple[float, int]] = []
        tpos = 0
        while tpos < len(raw):
            tkey, tpos = _read_varint(raw, tpos)
            tfield, twire = tkey >> 3, tkey & 7
            if tfield == 1 and twire == 2:  # packed refs
                packed, tpos = _read_delimited(raw, tpos)
                ppos = 0
                while ppos < len(packed):
                    r, ppos = _read_varint(packed, ppos)
                    refs.append(r)
            elif tfield == 1 and twire == 0:  # unpacked spelling
                r, tpos = _read_varint(raw, tpos)
                refs.append(r)
            elif tfield == 2 and twire == 2:
                sraw, tpos = _read_delimited(raw, tpos)
                samples.append(_decode_sample(sraw))
            else:
                tpos = _skip_field(raw, tpos, twire)
        if len(refs) % 2:
            raise ValueError("odd labels_refs count in v2 TimeSeries")
        labels: dict[str, str] = {}
        for i in range(0, len(refs), 2):
            ni, vi = refs[i], refs[i + 1]
            if ni >= len(symbols) or vi >= len(symbols):
                raise ValueError("v2 labels_ref outside symbol table")
            labels[symbols[ni]] = symbols[vi]
        out.append((labels, samples))
    return out


def encode_remote_write_body_v2(
    timeseries: list[tuple[dict[str, str], list[tuple[float, int]]]],
) -> bytes:
    return compress_snappy(encode_write_request_v2(timeseries))


def decode_remote_write_body_v2(
    body: bytes,
) -> list[tuple[dict[str, str], list[tuple[float, int]]]]:
    return decode_write_request_v2(decompress_snappy(body))
