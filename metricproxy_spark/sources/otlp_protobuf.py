"""OTLP/protobuf metrics wire codec (S-ext ingest family).

The binary binding of the OpenTelemetry metrics protocol — what
OTLP/gRPC and `Content-Type: application/x-protobuf` OTLP/HTTP carry.
Public schema: opentelemetry-proto ``metrics/v1/metrics.proto`` +
``collector/metrics/v1`` ``ExportMetricsServiceRequest``. Field
numbers (the wire contract) for the subset implemented here:

    ExportMetricsServiceRequest { repeated ResourceMetrics resource_metrics = 1; }
    ResourceMetrics { Resource resource = 1;
                      repeated ScopeMetrics scope_metrics = 2; }
    Resource        { repeated KeyValue attributes = 1; }
    ScopeMetrics    { InstrumentationScope scope = 1;
                      repeated Metric metrics = 2; }
    InstrumentationScope { string name = 1; string version = 2; }
    Metric { string name = 1; string description = 2; string unit = 3;
             oneof data { Gauge gauge = 5; Sum sum = 7; } }
    Gauge  { repeated NumberDataPoint data_points = 1; }
    Sum    { repeated NumberDataPoint data_points = 1;
             int32 aggregation_temporality = 2; bool is_monotonic = 3; }
    NumberDataPoint { fixed64 time_unix_nano = 3;
                      oneof value { double as_double = 4;    // fixed64
                                    sfixed64 as_int = 6; }
                      repeated KeyValue attributes = 7; }
    KeyValue { string key = 1; AnyValue value = 2; }
    AnyValue { oneof { string string_value = 1; } }

This is the sibling of the JVM-side OTLP/JSON path
(`sources/otlp.py`): same logical model, binary wire. Like every
codec in this repo it is built on the public protobuf wire format
directly (varints + tag framing + little-endian fixed64/sfixed64,
reusing the `sfx_protobuf` machinery), decodes unknown fields by
SKIPPING them (histogram/summary metrics pass through un-dropped),
and raises a clean ``ValueError`` on any malformed byte stream.
Pure Python, isolated inside Arrow-batched ``mapInPandas`` over whole
request blobs (SURVEY §8 risk 3).
"""

from __future__ import annotations

import struct

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

GAUGE_KIND = "gauge"
SUM_KIND = "sum"

# datapoint tuple shape used on both sides:
#   (attributes: dict[str, str], time_unix_nano: int,
#    as_double: float | None, as_int: int | None)


# ------------------------------------------------------------- encoding


def _encode_keyvalue(key: str, value: str) -> bytes:
    any_value = bytearray()
    _write_bytes_field(any_value, 1, value.encode())
    out = bytearray()
    _write_bytes_field(out, 1, key.encode())
    _write_bytes_field(out, 2, bytes(any_value))
    return bytes(out)


def _encode_datapoint(dp) -> bytes:
    attrs, t_ns, as_double, as_int = dp
    out = bytearray()
    _write_varint(out, _tag(3, 1))  # time_unix_nano fixed64
    out += int(t_ns).to_bytes(8, "little")
    if as_double is not None:
        _write_varint(out, _tag(4, 1))
        out += struct.pack("<d", as_double)
    elif as_int is not None:
        _write_varint(out, _tag(6, 1))
        out += int(as_int).to_bytes(8, "little", signed=True)
    for k in sorted(attrs):
        _write_bytes_field(out, 7, _encode_keyvalue(k, attrs[k]))
    return bytes(out)


def _encode_metric(name: str, kind: str, datapoints, unit: str = "") -> bytes:
    body = bytearray()
    for dp in datapoints:
        _write_bytes_field(body, 1, _encode_datapoint(dp))
    if kind == SUM_KIND:
        _write_varint(body, _tag(2, 0))  # aggregation_temporality
        _write_varint(body, 2)  # CUMULATIVE
        _write_varint(body, _tag(3, 0))  # is_monotonic
        _write_varint(body, 1)
    out = bytearray()
    _write_bytes_field(out, 1, name.encode())
    if unit:
        _write_bytes_field(out, 3, unit.encode())
    _write_bytes_field(out, 5 if kind == GAUGE_KIND else 7, bytes(body))
    return bytes(out)


def encode_export_request(
    resource_attrs: dict[str, str],
    scope_name: str,
    metrics: list[tuple[str, str, list]],
) -> bytes:
    """``metrics`` = [(metric_name, kind, [datapoint, ...]), ...] →
    one ``ExportMetricsServiceRequest`` under a single
    resource/scope."""
    resource = bytearray()
    for k in sorted(resource_attrs):
        _write_bytes_field(resource, 1, _encode_keyvalue(k, resource_attrs[k]))
    scope = bytearray()
    _write_bytes_field(scope, 1, scope_name.encode())
    sm = bytearray()
    _write_bytes_field(sm, 1, bytes(scope))
    for name, kind, dps in metrics:
        _write_bytes_field(sm, 2, _encode_metric(name, kind, dps))
    rm = bytearray()
    _write_bytes_field(rm, 1, bytes(resource))
    _write_bytes_field(rm, 2, bytes(sm))
    out = bytearray()
    _write_bytes_field(out, 1, bytes(rm))
    return bytes(out)


# ------------------------------------------------------------- decoding


def _decode_keyvalue(buf: bytes) -> tuple[str, str]:
    key = value = ""
    pos = 0
    while pos < len(buf):
        k, pos = _read_varint(buf, pos)
        field, wire = k >> 3, k & 7
        if field == 1 and wire == 2:
            raw, pos = _read_delimited(buf, pos)
            key = raw.decode("utf-8")
        elif field == 2 and wire == 2:
            any_raw, pos = _read_delimited(buf, pos)
            apos = 0
            while apos < len(any_raw):
                ak, apos = _read_varint(any_raw, apos)
                if ak >> 3 == 1 and ak & 7 == 2:
                    raw, apos = _read_delimited(any_raw, apos)
                    value = raw.decode("utf-8")
                else:
                    apos = _skip_field(any_raw, apos, ak & 7)
        else:
            pos = _skip_field(buf, pos, wire)
    return key, value


def _decode_datapoint(buf: bytes):
    attrs: dict[str, str] = {}
    t_ns = 0
    as_double = as_int = None
    pos = 0
    while pos < len(buf):
        k, pos = _read_varint(buf, pos)
        field, wire = k >> 3, k & 7
        if field == 3 and wire == 1:
            if pos + 8 > len(buf):
                raise ValueError("truncated time_unix_nano")
            t_ns = int.from_bytes(buf[pos : pos + 8], "little")
            pos += 8
        elif field == 4 and wire == 1:
            if pos + 8 > len(buf):
                raise ValueError("truncated as_double")
            (as_double,) = struct.unpack_from("<d", buf, pos)
            pos += 8
        elif field == 6 and wire == 1:
            if pos + 8 > len(buf):
                raise ValueError("truncated as_int")
            as_int = int.from_bytes(buf[pos : pos + 8], "little", signed=True)
            pos += 8
        elif field == 7 and wire == 2:
            raw, pos = _read_delimited(buf, pos)
            key, value = _decode_keyvalue(raw)
            attrs[key] = value
        else:
            pos = _skip_field(buf, pos, wire)
    return (attrs, t_ns, as_double, as_int)


def _decode_metric(buf: bytes):
    name = ""
    kind = None
    dps = []
    pos = 0
    while pos < len(buf):
        k, pos = _read_varint(buf, pos)
        field, wire = k >> 3, k & 7
        if field == 1 and wire == 2:
            raw, pos = _read_delimited(buf, pos)
            name = raw.decode("utf-8")
        elif field in (5, 7) and wire == 2:
            kind = GAUGE_KIND if field == 5 else SUM_KIND
            raw, pos = _read_delimited(buf, pos)
            gpos = 0
            while gpos < len(raw):
                gk, gpos = _read_varint(raw, gpos)
                if gk >> 3 == 1 and gk & 7 == 2:
                    dpraw, gpos = _read_delimited(raw, gpos)
                    dps.append(_decode_datapoint(dpraw))
                else:
                    gpos = _skip_field(raw, gpos, gk & 7)
        else:
            pos = _skip_field(buf, pos, wire)  # histogram/etc: skipped
    return name, kind, dps


def decode_export_request(buf: bytes):
    """``ExportMetricsServiceRequest`` bytes →
    ``(resource_attrs, scope_name, [(name, kind, [datapoint,...]), ...])``
    flattened across all resource/scope groups (this codec's encoder
    emits exactly one of each; foreign requests may have several — all
    are walked)."""
    resource_attrs: dict[str, str] = {}
    scope_name = ""
    metrics = []
    pos = 0
    while pos < len(buf):
        k, pos = _read_varint(buf, pos)
        field, wire = k >> 3, k & 7
        if field == 1 and wire == 2:
            rm, pos = _read_delimited(buf, pos)
            rpos = 0
            while rpos < len(rm):
                rk, rpos = _read_varint(rm, rpos)
                rfield, rwire = rk >> 3, rk & 7
                if rfield == 1 and rwire == 2:  # Resource
                    rraw, rpos = _read_delimited(rm, rpos)
                    apos = 0
                    while apos < len(rraw):
                        ak, apos = _read_varint(rraw, apos)
                        if ak >> 3 == 1 and ak & 7 == 2:
                            kvraw, apos = _read_delimited(rraw, apos)
                            key, value = _decode_keyvalue(kvraw)
                            resource_attrs[key] = value
                        else:
                            apos = _skip_field(rraw, apos, ak & 7)
                elif rfield == 2 and rwire == 2:  # ScopeMetrics
                    sm, rpos = _read_delimited(rm, rpos)
                    spos = 0
                    while spos < len(sm):
                        sk, spos = _read_varint(sm, spos)
                        sfield, swire = sk >> 3, sk & 7
                        if sfield == 1 and swire == 2:  # scope
                            sraw, spos = _read_delimited(sm, spos)
                            npos = 0
                            while npos < len(sraw):
                                nk, npos = _read_varint(sraw, npos)
                                if nk >> 3 == 1 and nk & 7 == 2:
                                    raw, npos = _read_delimited(sraw, npos)
                                    scope_name = raw.decode("utf-8")
                                else:
                                    npos = _skip_field(sraw, npos, nk & 7)
                        elif sfield == 2 and swire == 2:  # Metric
                            mraw, spos = _read_delimited(sm, spos)
                            name, kind, dps = _decode_metric(mraw)
                            if kind is not None:
                                metrics.append((name, kind, dps))
                        else:
                            spos = _skip_field(sm, spos, swire)
                else:
                    rpos = _skip_field(rm, rpos, rwire)
        else:
            pos = _skip_field(buf, pos, wire)
    return resource_attrs, scope_name, metrics
