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
    _unzigzag,
    _write_bytes_field,
    _write_varint,
    _zigzag,
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


# ---------------------------------------------- 2.0 histogram/exemplar arms
# Public spec: prometheus prompb io/prometheus/write/v2/types.proto —
# the two repeated TimeSeries arms beyond plain samples:
#
#     message TimeSeries { repeated uint32    labels_refs = 1 [packed];
#                          repeated Sample    samples     = 2;
#                          repeated Histogram histograms  = 3;
#                          repeated Exemplar  exemplars   = 4; }
#     message Exemplar   { repeated uint32 labels_refs = 1 [packed];
#                          double value = 2; int64 timestamp = 3; }
#     message Histogram  {   // the native (exponential) histogram,
#                            // shared layout with v1 prompb/types.proto
#       oneof count      { uint64 count_int = 1; double count_float = 2; }
#       double sum = 3;                sint32 schema = 4;
#       double zero_threshold = 5;
#       oneof zero_count { uint64 zero_count_int = 6;
#                          double zero_count_float = 7; }
#       repeated BucketSpan negative_spans  = 8;
#       repeated sint64     negative_deltas = 9  [packed];
#       repeated BucketSpan positive_spans  = 11;
#       repeated sint64     positive_deltas = 12 [packed];
#       int64 timestamp = 15; }
#     message BucketSpan { sint32 offset = 1; uint32 length = 2; }
#
# Bucket addressing (public algorithm: prometheus/model/histogram
# histogram.go bucket iterators): walking the spans with a running
# index that starts at 0, each span first ADVANCES the index by its
# (possibly negative, first-span-only) offset, then covers `length`
# consecutive buckets; deltas are successive count differences, the
# first delta being the first bucket's absolute count. At schema 0,
# positive bucket i covers (2^(i-1), 2^i].


def _encode_span(offset: int, length: int) -> bytes:
    out = bytearray()
    _write_varint(out, _tag(1, 0))
    _write_varint(out, _zigzag(offset))
    _write_varint(out, _tag(2, 0))
    _write_varint(out, length)
    return bytes(out)


def _decode_span(buf: bytes) -> tuple[int, int]:
    offset = length = 0
    pos = 0
    while pos < len(buf):
        key, pos = _read_varint(buf, pos)
        field, wire = key >> 3, key & 7
        if field == 1 and wire == 0:
            raw, pos = _read_varint(buf, pos)
            offset = _unzigzag(raw)
        elif field == 2 and wire == 0:
            length, pos = _read_varint(buf, pos)
        else:
            pos = _skip_field(buf, pos, wire)
    return offset, length


def _spans_deltas(buckets: list[tuple[int, int]]) -> tuple[list, list]:
    """Sparse sorted (index, count) buckets → (spans, deltas). A new
    span starts at every index gap (zero-count buckets are never
    materialized — one valid encoding among several the spec allows)."""
    spans: list[tuple[int, int]] = []
    deltas: list[int] = []
    prev_count = 0
    prev_idx: int | None = None
    for idx, cnt in buckets:
        if prev_idx is None:
            spans.append((idx, 1))
        elif idx == prev_idx + 1:
            spans[-1] = (spans[-1][0], spans[-1][1] + 1)
        else:
            # gap: offset is relative to the END of the previous span
            spans.append((idx - prev_idx - 1, 1))
        deltas.append(cnt - prev_count)
        prev_count = cnt
        prev_idx = idx
    return spans, deltas


def _buckets_from_spans(
    spans: list[tuple[int, int]], deltas: list[int]
) -> list[tuple[int, int]]:
    """(spans, deltas) → absolute sparse (index, count) buckets;
    raises ``ValueError`` on count/delta mismatch or negative counts
    (a malformed sender)."""
    n = sum(length for _, length in spans)
    if n != len(deltas):
        raise ValueError(
            f"histogram spans cover {n} buckets but {len(deltas)} deltas"
        )
    out: list[tuple[int, int]] = []
    idx = 0
    count = 0
    k = 0
    for offset, length in spans:
        idx += offset
        for _ in range(length):
            count += deltas[k]
            k += 1
            if count < 0:
                raise ValueError("negative native-histogram bucket count")
            out.append((idx, count))
            idx += 1
    return out


def encode_histogram(h: dict) -> bytes:
    """Histogram dict → wire bytes. Recognized keys: ``count_int``,
    ``sum``, ``schema``, ``zero_threshold``, ``zero_count_int``,
    ``positive_buckets`` / ``negative_buckets`` (sparse sorted
    (index, count) lists — converted to spans+deltas here), and
    ``timestamp_ms``."""
    out = bytearray()
    if "count_int" in h:
        _write_varint(out, _tag(1, 0))
        _write_varint(out, h["count_int"])
    if "sum" in h:
        _write_varint(out, _tag(3, 1))
        out.extend(struct.pack("<d", h["sum"]))
    if "schema" in h:
        _write_varint(out, _tag(4, 0))
        _write_varint(out, _zigzag(h["schema"]))
    if "zero_threshold" in h:
        _write_varint(out, _tag(5, 1))
        out.extend(struct.pack("<d", h["zero_threshold"]))
    if "zero_count_int" in h:
        _write_varint(out, _tag(6, 0))
        _write_varint(out, h["zero_count_int"])
    for skey, sfield, dfield in (
        ("negative_buckets", 8, 9),
        ("positive_buckets", 11, 12),
    ):
        buckets = h.get(skey) or []
        if not buckets:
            continue
        spans, deltas = _spans_deltas(buckets)
        for offset, length in spans:
            _write_bytes_field(out, sfield, _encode_span(offset, length))
        packed = bytearray()
        for d in deltas:
            _write_varint(packed, _zigzag(d))
        _write_bytes_field(out, dfield, bytes(packed))
    if "timestamp_ms" in h:
        _write_varint(out, _tag(15, 0))
        _write_varint(out, _signed64(h["timestamp_ms"]) & ((1 << 64) - 1))
    return bytes(out)


def decode_histogram(buf: bytes) -> dict:
    """Wire bytes → histogram dict (the :func:`encode_histogram` keys,
    plus ``count_float`` / ``zero_count_float`` when a sender used the
    float arms). Spans+deltas come back as resolved sparse
    ``positive_buckets`` / ``negative_buckets``; both packed and
    unpacked delta spellings are accepted (protobuf compatibility
    rule)."""
    h: dict = {}
    pos_spans: list[tuple[int, int]] = []
    neg_spans: list[tuple[int, int]] = []
    pos_deltas: list[int] = []
    neg_deltas: list[int] = []
    pos = 0
    while pos < len(buf):
        key, pos = _read_varint(buf, pos)
        field, wire = key >> 3, key & 7
        if field == 1 and wire == 0:
            h["count_int"], pos = _read_varint(buf, pos)
        elif field == 2 and wire == 1:
            if pos + 8 > len(buf):
                raise ValueError("truncated histogram count_float")
            (h["count_float"],) = struct.unpack_from("<d", buf, pos)
            pos += 8
        elif field == 3 and wire == 1:
            if pos + 8 > len(buf):
                raise ValueError("truncated histogram sum")
            (h["sum"],) = struct.unpack_from("<d", buf, pos)
            pos += 8
        elif field == 4 and wire == 0:
            raw, pos = _read_varint(buf, pos)
            h["schema"] = _unzigzag(raw)
        elif field == 5 and wire == 1:
            if pos + 8 > len(buf):
                raise ValueError("truncated histogram zero_threshold")
            (h["zero_threshold"],) = struct.unpack_from("<d", buf, pos)
            pos += 8
        elif field == 6 and wire == 0:
            h["zero_count_int"], pos = _read_varint(buf, pos)
        elif field == 7 and wire == 1:
            if pos + 8 > len(buf):
                raise ValueError("truncated histogram zero_count_float")
            (h["zero_count_float"],) = struct.unpack_from("<d", buf, pos)
            pos += 8
        elif field in (8, 11) and wire == 2:
            raw, pos = _read_delimited(buf, pos)
            (neg_spans if field == 8 else pos_spans).append(
                _decode_span(raw)
            )
        elif field in (9, 12) and wire == 2:  # packed sint64 deltas
            raw, pos = _read_delimited(buf, pos)
            ppos = 0
            target = neg_deltas if field == 9 else pos_deltas
            while ppos < len(raw):
                d, ppos = _read_varint(raw, ppos)
                target.append(_unzigzag(d))
        elif field in (9, 12) and wire == 0:  # unpacked spelling
            d, pos = _read_varint(buf, pos)
            (neg_deltas if field == 9 else pos_deltas).append(_unzigzag(d))
        elif field == 15 and wire == 0:
            raw, pos = _read_varint(buf, pos)
            h["timestamp_ms"] = _signed64(raw)
        else:
            pos = _skip_field(buf, pos, wire)
    if pos_spans or pos_deltas:
        h["positive_buckets"] = _buckets_from_spans(pos_spans, pos_deltas)
    if neg_spans or neg_deltas:
        h["negative_buckets"] = _buckets_from_spans(neg_spans, neg_deltas)
    return h


def _encode_exemplar_v2(
    refs: list[int], value: float, timestamp_ms: int
) -> bytes:
    out = bytearray()
    packed = bytearray()
    for r in refs:
        _write_varint(packed, r)
    _write_bytes_field(out, 1, bytes(packed))
    _write_varint(out, _tag(2, 1))
    out.extend(struct.pack("<d", value))
    _write_varint(out, _tag(3, 0))
    _write_varint(out, _signed64(timestamp_ms) & ((1 << 64) - 1))
    return bytes(out)


def encode_write_request_v2_full(series: list[dict]) -> bytes:
    """v2 ``Request`` with the full TimeSeries surface. Each series
    dict: ``labels`` (name→value), optional ``samples``
    [(value, ts_ms)], optional ``histograms`` [histogram dict],
    optional ``exemplars`` [(labels dict, value, ts_ms)], optional
    ``metadata`` {"type": int enum, "help": str, "unit": str}
    (help/unit strings are INTERNED — the v2 Metadata message carries
    help_ref=3/unit_ref=4 symbol refs, field 2 skipped per the public
    types.proto), and optional ``created_timestamp_ms`` (field 6, the
    counter birth time). Exemplar and metadata strings share the SAME
    request-wide symbol table as series labels."""
    symbols: list[str] = [""]
    interned: dict[str, int] = {"": 0}

    def ref(s: str) -> int:
        if s not in interned:
            interned[s] = len(symbols)
            symbols.append(s)
        return interned[s]

    def label_refs(labels: dict[str, str]) -> list[int]:
        refs: list[int] = []
        for name in sorted(labels):
            refs.append(ref(name))
            refs.append(ref(labels[name]))
        return refs

    blobs = []
    for s in series:
        ts = bytearray()
        packed = bytearray()
        for r in label_refs(s["labels"]):
            _write_varint(packed, r)
        _write_bytes_field(ts, 1, bytes(packed))
        for value, t in s.get("samples", ()):
            _write_bytes_field(ts, 2, _encode_sample(value, t))
        for h in s.get("histograms", ()):
            _write_bytes_field(ts, 3, encode_histogram(h))
        for elabels, ev, et in s.get("exemplars", ()):
            _write_bytes_field(
                ts, 4, _encode_exemplar_v2(label_refs(elabels), ev, et)
            )
        md = s.get("metadata")
        if md:
            mbuf = bytearray()
            if "type" in md:
                _write_varint(mbuf, _tag(1, 0))
                _write_varint(mbuf, md["type"])
            if "help" in md:
                _write_varint(mbuf, _tag(3, 0))
                _write_varint(mbuf, ref(md["help"]))
            if "unit" in md:
                _write_varint(mbuf, _tag(4, 0))
                _write_varint(mbuf, ref(md["unit"]))
            _write_bytes_field(ts, 5, bytes(mbuf))
        if "created_timestamp_ms" in s:
            _write_varint(ts, _tag(6, 0))
            _write_varint(
                ts, _signed64(s["created_timestamp_ms"]) & ((1 << 64) - 1)
            )
        blobs.append(bytes(ts))

    out = bytearray()
    for sym in symbols:
        _write_bytes_field(out, 4, sym.encode())
    for blob in blobs:
        _write_bytes_field(out, 5, blob)
    return bytes(out)


def decode_write_request_v2_full(buf: bytes) -> list[dict]:
    """v2 ``Request`` bytes → series dicts (the
    :func:`encode_write_request_v2_full` shape). Same strictness as
    the sample-only decoder: out-of-range refs, odd ref counts, and a
    non-empty symbols[0] raise ``ValueError``."""
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

    def resolve(refs: list[int]) -> dict[str, str]:
        if len(refs) % 2:
            raise ValueError("odd labels_refs count in v2 TimeSeries")
        labels: dict[str, str] = {}
        for i in range(0, len(refs), 2):
            ni, vi = refs[i], refs[i + 1]
            if ni >= len(symbols) or vi >= len(symbols):
                raise ValueError("v2 labels_ref outside symbol table")
            labels[symbols[ni]] = symbols[vi]
        return labels

    def read_refs(raw: bytes, tpos: int, wire: int, refs: list[int]) -> int:
        if wire == 2:
            packed, tpos = _read_delimited(raw, tpos)
            ppos = 0
            while ppos < len(packed):
                r, ppos = _read_varint(packed, ppos)
                refs.append(r)
        elif wire == 0:
            r, tpos = _read_varint(raw, tpos)
            refs.append(r)
        else:
            raise ValueError("bad wire type for labels_refs")
        return tpos

    def sym(ref: int) -> str:
        if ref >= len(symbols):
            raise ValueError("v2 metadata ref outside symbol table")
        return symbols[ref]

    out: list[dict] = []
    for raw in raw_series:
        refs: list[int] = []
        samples: list[tuple[float, int]] = []
        histograms: list[dict] = []
        exemplars: list[tuple[dict, float, int]] = []
        metadata: dict | None = None
        created_ms: int | None = None
        tpos = 0
        while tpos < len(raw):
            tkey, tpos = _read_varint(raw, tpos)
            tfield, twire = tkey >> 3, tkey & 7
            if tfield == 1 and twire in (0, 2):
                tpos = read_refs(raw, tpos, twire, refs)
            elif tfield == 2 and twire == 2:
                sraw, tpos = _read_delimited(raw, tpos)
                samples.append(_decode_sample(sraw))
            elif tfield == 3 and twire == 2:
                hraw, tpos = _read_delimited(raw, tpos)
                histograms.append(decode_histogram(hraw))
            elif tfield == 4 and twire == 2:
                eraw, tpos = _read_delimited(raw, tpos)
                erefs: list[int] = []
                ev = 0.0
                et = 0
                epos = 0
                while epos < len(eraw):
                    ekey, epos = _read_varint(eraw, epos)
                    efield, ewire = ekey >> 3, ekey & 7
                    if efield == 1 and ewire in (0, 2):
                        epos = read_refs(eraw, epos, ewire, erefs)
                    elif efield == 2 and ewire == 1:
                        if epos + 8 > len(eraw):
                            raise ValueError("truncated exemplar value")
                        (ev,) = struct.unpack_from("<d", eraw, epos)
                        epos += 8
                    elif efield == 3 and ewire == 0:
                        eraw_v, epos = _read_varint(eraw, epos)
                        et = _signed64(eraw_v)
                    else:
                        epos = _skip_field(eraw, epos, ewire)
                exemplars.append((resolve(erefs), ev, et))
            elif tfield == 5 and twire == 2:
                mraw, tpos = _read_delimited(raw, tpos)
                metadata = {}
                mpos = 0
                while mpos < len(mraw):
                    mkey, mpos = _read_varint(mraw, mpos)
                    mfield, mwire = mkey >> 3, mkey & 7
                    if mfield == 1 and mwire == 0:
                        metadata["type"], mpos = _read_varint(mraw, mpos)
                    elif mfield == 3 and mwire == 0:
                        r, mpos = _read_varint(mraw, mpos)
                        metadata["help"] = sym(r)
                    elif mfield == 4 and mwire == 0:
                        r, mpos = _read_varint(mraw, mpos)
                        metadata["unit"] = sym(r)
                    else:
                        mpos = _skip_field(mraw, mpos, mwire)
            elif tfield == 6 and twire == 0:
                raw_v, tpos = _read_varint(raw, tpos)
                created_ms = _signed64(raw_v)
            else:
                tpos = _skip_field(raw, tpos, twire)
        entry: dict = {
            "labels": resolve(refs),
            "samples": samples,
            "histograms": histograms,
            "exemplars": exemplars,
        }
        if metadata is not None:
            entry["metadata"] = metadata
        if created_ms is not None:
            entry["created_timestamp_ms"] = created_ms
        out.append(entry)
    return out


def encode_remote_write_body_v2_full(series: list[dict]) -> bytes:
    return compress_snappy(encode_write_request_v2_full(series))


def decode_remote_write_body_v2_full(body: bytes) -> list[dict]:
    return decode_write_request_v2_full(decompress_snappy(body))
