"""OTLP/protobuf LOGS wire codec (S-ext ingest family).

The logs signal of the OpenTelemetry protocol — the third leg next to
this repo's OTLP metrics bindings (`sources/otlp.py` JSON,
`sources/otlp_protobuf.py` binary). The reference domain treats log
lines as Events (collectd notifications already land on the events
table); OTLP logs are the modern transport for exactly that traffic.
Public schema: opentelemetry-proto ``logs/v1/logs.proto`` +
``collector/logs/v1`` ``ExportLogsServiceRequest``. Field numbers
(the wire contract) for the subset implemented here:

    ExportLogsServiceRequest { repeated ResourceLogs resource_logs = 1; }
    ResourceLogs { Resource resource = 1;
                   repeated ScopeLogs scope_logs = 2; }
    Resource     { repeated KeyValue attributes = 1; }
    ScopeLogs    { InstrumentationScope scope = 1;
                   repeated LogRecord log_records = 2; }
    LogRecord {
        fixed64 time_unix_nano = 1;
        SeverityNumber severity_number = 2;   // varint enum
        string severity_text = 3;
        AnyValue body = 5;                     // string_value arm
        repeated KeyValue attributes = 6;
        bytes trace_id = 9;                    // 16 bytes
        bytes span_id = 10;                    // 8 bytes
        fixed64 observed_time_unix_nano = 11;
    }

Same construction discipline as every codec here: raw protobuf wire
(varints + tag framing + little-endian fixed64), `sfx_protobuf` /
`otlp_protobuf` machinery reused (KeyValue/AnyValue string arm,
Resource, InstrumentationScope), unknown fields skipped per wire
type, malformed bytes raise clean ``ValueError``. trace_id/span_id
length-validated per the spec (16/8 bytes or absent). Pure Python,
Arrow-batched over whole request blobs.
"""

from __future__ import annotations

import struct

from metricproxy_spark.sources.otlp_protobuf import (
    _decode_keyvalue,
    _encode_keyvalue,
)
from metricproxy_spark.sources.remote_write import (
    _read_delimited,
    _skip_field,
)
from metricproxy_spark.sources.sfx_protobuf import (
    _read_varint,
    _tag,
    _write_bytes_field,
    _write_varint,
)

# SeverityNumber enum (logs.proto): the values the query maps onto
SEVERITY_INFO, SEVERITY_ERROR = 9, 17

# record tuple shape on both sides:
#   (time_unix_nano, severity_number, severity_text, body,
#    attributes: dict[str, str], trace_id: bytes, span_id: bytes)
LogRecordT = tuple[int, int, str, str, dict, bytes, bytes]


def _encode_log_record(rec: LogRecordT) -> bytes:
    t_ns, sev_num, sev_text, body, attrs, trace_id, span_id = rec
    out = bytearray()
    _write_varint(out, _tag(1, 1))
    out += struct.pack("<Q", t_ns)
    if sev_num:
        _write_varint(out, _tag(2, 0))
        _write_varint(out, sev_num)
    if sev_text:
        _write_bytes_field(out, 3, sev_text.encode("utf-8"))
    body_any = bytearray()
    _write_bytes_field(body_any, 1, body.encode("utf-8"))  # string arm
    _write_bytes_field(out, 5, bytes(body_any))
    for key in sorted(attrs):
        _write_bytes_field(out, 6, _encode_keyvalue(key, attrs[key]))
    if trace_id:
        _write_bytes_field(out, 9, trace_id)
    if span_id:
        _write_bytes_field(out, 10, span_id)
    # observed time: stamped equal to event time in this engine
    _write_varint(out, _tag(11, 1))
    out += struct.pack("<Q", t_ns)
    return bytes(out)


def encode_logs_request(
    resource_attrs: dict[str, str],
    scope_name: str,
    records: list[LogRecordT],
) -> bytes:
    resource = bytearray()
    for key in sorted(resource_attrs):
        _write_bytes_field(
            resource, 1, _encode_keyvalue(key, resource_attrs[key])
        )
    scope = bytearray()
    _write_bytes_field(scope, 1, scope_name.encode("utf-8"))
    scope_logs = bytearray()
    _write_bytes_field(scope_logs, 1, bytes(scope))
    for rec in records:
        _write_bytes_field(scope_logs, 2, _encode_log_record(rec))
    resource_logs = bytearray()
    _write_bytes_field(resource_logs, 1, bytes(resource))
    _write_bytes_field(resource_logs, 2, bytes(scope_logs))
    out = bytearray()
    _write_bytes_field(out, 1, bytes(resource_logs))
    return bytes(out)


def _decode_any_string(buf: bytes) -> str:
    pos = 0
    out = ""
    while pos < len(buf):
        key, pos = _read_varint(buf, pos)
        field, wire = key >> 3, key & 7
        if field == 1 and wire == 2:
            raw, pos = _read_delimited(buf, pos)
            out = raw.decode("utf-8")
        else:
            pos = _skip_field(buf, pos, wire)
    return out


def _decode_log_record(buf: bytes) -> LogRecordT:
    t_ns = sev_num = 0
    sev_text = body = ""
    attrs: dict[str, str] = {}
    trace_id = span_id = b""
    pos = 0
    while pos < len(buf):
        key, pos = _read_varint(buf, pos)
        field, wire = key >> 3, key & 7
        if field == 1 and wire == 1:
            if pos + 8 > len(buf):
                raise ValueError("otlp logs: truncated time_unix_nano")
            (t_ns,) = struct.unpack_from("<Q", buf, pos)
            pos += 8
        elif field == 2 and wire == 0:
            sev_num, pos = _read_varint(buf, pos)
        elif field == 3 and wire == 2:
            raw, pos = _read_delimited(buf, pos)
            sev_text = raw.decode("utf-8")
        elif field == 5 and wire == 2:
            raw, pos = _read_delimited(buf, pos)
            body = _decode_any_string(raw)
        elif field == 6 and wire == 2:
            raw, pos = _read_delimited(buf, pos)
            k, v = _decode_keyvalue(raw)
            attrs[k] = v
        elif field == 9 and wire == 2:
            trace_id, pos = _read_delimited(buf, pos)
            if len(trace_id) != 16:
                raise ValueError("otlp logs: trace_id must be 16 bytes")
        elif field == 10 and wire == 2:
            span_id, pos = _read_delimited(buf, pos)
            if len(span_id) != 8:
                raise ValueError("otlp logs: span_id must be 8 bytes")
        else:
            pos = _skip_field(buf, pos, wire)
    return t_ns, sev_num, sev_text, body, attrs, trace_id, span_id


def decode_logs_request(
    buf: bytes,
) -> tuple[dict[str, str], str, list[LogRecordT]]:
    """→ (resource attributes, scope name, log records) — flattened
    over all ResourceLogs/ScopeLogs groups (this engine emits one of
    each; foreign senders with several still decode, merged)."""
    resource_attrs: dict[str, str] = {}
    scope_name = ""
    records: list[LogRecordT] = []
    pos = 0
    while pos < len(buf):
        key, pos = _read_varint(buf, pos)
        field, wire = key >> 3, key & 7
        if field == 1 and wire == 2:
            rl, pos = _read_delimited(buf, pos)
            rpos = 0
            while rpos < len(rl):
                rkey, rpos = _read_varint(rl, rpos)
                rfield, rwire = rkey >> 3, rkey & 7
                if rfield == 1 and rwire == 2:  # Resource
                    res, rpos = _read_delimited(rl, rpos)
                    ppos = 0
                    while ppos < len(res):
                        pkey, ppos = _read_varint(res, ppos)
                        pfield, pwire = pkey >> 3, pkey & 7
                        if pfield == 1 and pwire == 2:
                            raw, ppos = _read_delimited(res, ppos)
                            k, v = _decode_keyvalue(raw)
                            resource_attrs[k] = v
                        else:
                            ppos = _skip_field(res, ppos, pwire)
                elif rfield == 2 and rwire == 2:  # ScopeLogs
                    sl, rpos = _read_delimited(rl, rpos)
                    spos = 0
                    while spos < len(sl):
                        skey, spos = _read_varint(sl, spos)
                        sfield, swire = skey >> 3, skey & 7
                        if sfield == 1 and swire == 2:  # scope
                            sc, spos = _read_delimited(sl, spos)
                            cpos = 0
                            while cpos < len(sc):
                                ckey, cpos = _read_varint(sc, cpos)
                                cfield, cwire = ckey >> 3, ckey & 7
                                if cfield == 1 and cwire == 2:
                                    raw, cpos = _read_delimited(sc, cpos)
                                    scope_name = raw.decode("utf-8")
                                else:
                                    cpos = _skip_field(sc, cpos, cwire)
                        elif sfield == 2 and swire == 2:
                            raw, spos = _read_delimited(sl, spos)
                            records.append(_decode_log_record(raw))
                        else:
                            spos = _skip_field(sl, spos, swire)
                else:
                    rpos = _skip_field(rl, rpos, rwire)
        else:
            pos = _skip_field(buf, pos, wire)
    return resource_attrs, scope_name, records
