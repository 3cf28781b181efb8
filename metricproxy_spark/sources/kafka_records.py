"""Kafka RecordBatch (message format v2) codec, from scratch (S-ext
wire format).

The on-wire/on-disk unit of the dominant streaming transport (public
spec: Kafka protocol docs "Record Batch" / KIP-98 message format v2 —
kafka/clients/src/main/java/org/apache/kafka/common/record/
DefaultRecordBatch.java, DefaultRecord.java). This engine's streaming
story is deliberately the Kafka split (listener → durable log →
replayable processing); this codec makes the log format itself a
first-class citizen, composing THREE of the repo's from-scratch
compression codecs as the batch compression types:

- **Batch header** (61 bytes, big-endian): baseOffset int64,
  batchLength int32 (bytes after this field), partitionLeaderEpoch
  int32, magic int8 (=2), crc uint32 — CRC-32C (Castagnoli, the
  from-scratch table in `sources/snappy.py`) of everything AFTER the
  crc field — attributes int16 (bits 0-2 compression type, bit 3
  timestamp type), lastOffsetDelta int32, baseTimestamp int64,
  maxTimestamp int64, producerId int64, producerEpoch int16,
  baseSequence int32, record count int32.
- **Records** (after optional whole-block compression): each record is
  length-prefixed with a SIGNED varint (zigzag — protobuf's varint
  machinery reused), then attributes int8, timestampDelta zigzag
  varint, offsetDelta zigzag varint, key/value as zigzag-length-
  prefixed bytes (−1 = null), and headers (count + per-header
  key/value, same length spelling).
- **Compression types** (attributes bits 0-2): 0 = none; 1 = gzip
  (RFC 1952 member — `sources/deflate.py`); 2 = snappy in XERIAL
  stream framing (the java client's SnappyOutputStream container:
  magic ``\\x82SNAPPY\\x00``, two version int32s, then
  [int32 BE length][snappy block] chunks — `sources/snappy.py` blocks
  underneath); 3 = LZ4 FRAME (`sources/lz4.py`); 4 = zstd
  (`sources/zstd.py` — RFC 8878 from scratch: full FSE/huff0/sequence
  decode, Raw_Block + XXH64-checksum frames on the encode leg), making
  it FOUR from-scratch codecs riding the batch attribute bits.

Decode discipline is the repo codec contract: the CRC is VERIFIED
before anything else is trusted, magic/compression/length mismatches
and truncations raise clean ``ValueError``; every-prefix truncation
and fuzz tests live in ``tests/test_kafka_records.py``.
"""

from __future__ import annotations

import struct

from metricproxy_spark.sources.deflate import compress_gzip, decompress_gzip
from metricproxy_spark.sources.zstd import compress_zstd, decompress_zstd
from metricproxy_spark.sources.lz4 import (
    compress_lz4_frame,
    decompress_lz4_frame,
)
from metricproxy_spark.sources.sfx_protobuf import (
    _read_varint,
    _unzigzag,
    _zigzag,
)
from metricproxy_spark.sources.snappy import (
    compress_snappy,
    crc32c,
    decompress_snappy,
)

NONE, GZIP, SNAPPY, LZ4, ZSTD = 0, 1, 2, 3, 4

# key: bytes | None; value: bytes | None; headers: list[(str, bytes)]
Record = tuple[int, bytes | None, bytes | None, list[tuple[str, bytes]]]

_XERIAL_MAGIC = b"\x82SNAPPY\x00"


def _xerial_frame(data: bytes) -> bytes:
    """Xerial SnappyOutputStream container (java client's snappy)."""
    out = bytearray(_XERIAL_MAGIC)
    out += struct.pack(">ii", 1, 1)  # version, min-compatible version
    for start in range(0, len(data), 32 * 1024):
        chunk = compress_snappy(data[start : start + 32 * 1024])
        out += struct.pack(">i", len(chunk))
        out += chunk
    return bytes(out)


def _xerial_unframe(buf: bytes) -> bytes:
    if buf[: len(_XERIAL_MAGIC)] != _XERIAL_MAGIC:
        raise ValueError("kafka batch: bad xerial snappy magic")
    pos = len(_XERIAL_MAGIC) + 8
    if pos > len(buf):
        raise ValueError("kafka batch: truncated xerial header")
    out = bytearray()
    while pos < len(buf):
        if pos + 4 > len(buf):
            raise ValueError("kafka batch: truncated xerial chunk length")
        (ln,) = struct.unpack_from(">i", buf, pos)
        pos += 4
        if ln < 0 or pos + ln > len(buf):
            raise ValueError("kafka batch: truncated xerial chunk")
        out += decompress_snappy(buf[pos : pos + ln])
        pos += ln
    return bytes(out)


def _write_zigzag(out: bytearray, v: int) -> None:
    u = _zigzag(v) & 0xFFFFFFFFFFFFFFFF
    while u >= 0x80:
        out.append((u & 0x7F) | 0x80)
        u >>= 7
    out.append(u)


def _read_zigzag(buf: bytes, pos: int) -> tuple[int, int]:
    u, pos = _read_varint(buf, pos)
    return _unzigzag(u), pos


def _encode_record(
    offset_delta: int, ts_delta: int, record: Record
) -> bytes:
    _ts, key, value, headers = record
    body = bytearray()
    body.append(0)  # record attributes: unused in v2
    _write_zigzag(body, ts_delta)
    _write_zigzag(body, offset_delta)
    for blob in (key, value):
        if blob is None:
            _write_zigzag(body, -1)
        else:
            _write_zigzag(body, len(blob))
            body += blob
    _write_zigzag(body, len(headers))
    for hkey, hval in headers:
        kb = hkey.encode("utf-8")
        _write_zigzag(body, len(kb))
        body += kb
        if hval is None:
            _write_zigzag(body, -1)
        else:
            _write_zigzag(body, len(hval))
            body += hval
    out = bytearray()
    _write_zigzag(out, len(body))
    out += body
    return bytes(out)


def encode_record_batch(
    records: list[Record],
    base_offset: int = 0,
    compression: int = NONE,
) -> bytes:
    """``[(timestamp_ms, key, value, headers), ...]`` → one v2
    RecordBatch. Timestamps ride as deltas from the batch minimum."""
    if not records:
        raise ValueError("kafka batch: empty batches are not written")
    base_ts = min(r[0] for r in records)
    max_ts = max(r[0] for r in records)
    payload = bytearray()
    for i, rec in enumerate(records):
        payload += _encode_record(i, rec[0] - base_ts, rec)
    if compression == GZIP:
        payload = bytearray(compress_gzip(bytes(payload)))
    elif compression == SNAPPY:
        payload = bytearray(_xerial_frame(bytes(payload)))
    elif compression == LZ4:
        payload = bytearray(compress_lz4_frame(bytes(payload)))
    elif compression == ZSTD:
        payload = bytearray(compress_zstd(bytes(payload)))
    elif compression != NONE:
        raise ValueError("kafka batch: unknown compression type")
    # everything covered by the CRC: attributes .. records
    crc_body = bytearray()
    crc_body += struct.pack(">h", compression)  # attributes
    crc_body += struct.pack(">i", len(records) - 1)  # lastOffsetDelta
    crc_body += struct.pack(">q", base_ts)
    crc_body += struct.pack(">q", max_ts)
    crc_body += struct.pack(">q", -1)  # producerId (idempotence off)
    crc_body += struct.pack(">h", -1)  # producerEpoch
    crc_body += struct.pack(">i", -1)  # baseSequence
    crc_body += struct.pack(">i", len(records))
    crc_body += payload
    out = bytearray()
    out += struct.pack(">q", base_offset)
    # batchLength counts bytes after itself: epoch(4)+magic(1)+crc(4)+body
    out += struct.pack(">i", 4 + 1 + 4 + len(crc_body))
    out += struct.pack(">i", -1)  # partitionLeaderEpoch
    out.append(2)  # magic v2
    out += struct.pack(">I", crc32c(bytes(crc_body)))
    out += crc_body
    return bytes(out)


def decode_record_batch(
    buf: bytes,
) -> tuple[int, int, list[tuple[int, int, Record]]]:
    """One RecordBatch → ``(base_offset, compression,
    [(offset, timestamp_ms, (ts, key, value, headers)), ...])``.
    CRC-32C verified FIRST; strict on magic, lengths, counts."""
    if len(buf) < 61:
        raise ValueError("kafka batch: truncated header")
    base_offset, batch_len = struct.unpack_from(">qi", buf, 0)
    if 12 + batch_len != len(buf):
        raise ValueError("kafka batch: batchLength mismatch")
    magic = buf[16]
    if magic != 2:
        raise ValueError("kafka batch: unsupported magic (not v2)")
    (crc,) = struct.unpack_from(">I", buf, 17)
    crc_body = buf[21:]
    if crc32c(crc_body) != crc:
        raise ValueError("kafka batch: CRC-32C mismatch")
    (attributes,) = struct.unpack_from(">h", buf, 21)
    compression = attributes & 0x7
    (last_offset_delta,) = struct.unpack_from(">i", buf, 23)
    (base_ts,) = struct.unpack_from(">q", buf, 27)
    (_max_ts,) = struct.unpack_from(">q", buf, 35)
    (count,) = struct.unpack_from(">i", buf, 57)
    payload = bytes(buf[61:])
    if compression == GZIP:
        payload = decompress_gzip(payload, max_out=1 << 26)
    elif compression == SNAPPY:
        payload = _xerial_unframe(payload)
    elif compression == LZ4:
        payload = decompress_lz4_frame(payload, max_out=1 << 26)
    elif compression == ZSTD:
        payload = decompress_zstd(payload, max_out=1 << 26)
    elif compression != NONE:
        raise ValueError("kafka batch: unknown compression type")
    records: list[tuple[int, int, Record]] = []
    pos = 0
    for _ in range(count):
        rec_len, pos = _read_zigzag(payload, pos)
        if rec_len < 0 or pos + rec_len > len(payload):
            raise ValueError("kafka batch: truncated record")
        end = pos + rec_len
        pos += 1  # record attributes (unused)
        ts_delta, pos = _read_zigzag(payload, pos)
        offset_delta, pos = _read_zigzag(payload, pos)
        klen, pos = _read_zigzag(payload, pos)
        key = None
        if klen >= 0:
            if pos + klen > len(payload):
                raise ValueError("kafka batch: truncated record key")
            key = payload[pos : pos + klen]
            pos += klen
        vlen, pos = _read_zigzag(payload, pos)
        value = None
        if vlen >= 0:
            if pos + vlen > len(payload):
                raise ValueError("kafka batch: truncated record value")
            value = payload[pos : pos + vlen]
            pos += vlen
        hcount, pos = _read_zigzag(payload, pos)
        if hcount < 0:
            raise ValueError("kafka batch: negative header count")
        headers: list[tuple[str, bytes]] = []
        for _h in range(hcount):
            hklen, pos = _read_zigzag(payload, pos)
            if hklen < 0 or pos + hklen > len(payload):
                raise ValueError("kafka batch: truncated header key")
            hkey = payload[pos : pos + hklen].decode("utf-8")
            pos += hklen
            hvlen, pos = _read_zigzag(payload, pos)
            hval = None
            if hvlen >= 0:
                if pos + hvlen > len(payload):
                    raise ValueError("kafka batch: truncated header value")
                hval = payload[pos : pos + hvlen]
                pos += hvlen
            headers.append((hkey, hval))
        if pos != end:
            raise ValueError("kafka batch: record length mismatch")
        ts = base_ts + ts_delta
        records.append(
            (base_offset + offset_delta, ts, (ts, key, value, headers))
        )
    if pos != len(payload):
        raise ValueError("kafka batch: trailing bytes after records")
    if records and records[-1][0] - base_offset != last_offset_delta:
        raise ValueError("kafka batch: lastOffsetDelta mismatch")
    return base_offset, compression, records


def decode_record_batches(
    buf: bytes,
) -> list[tuple[int, int, list[tuple[int, int, Record]]]]:
    """A log segment: consecutive RecordBatches back to back."""
    out = []
    pos = 0
    while pos < len(buf):
        if pos + 12 > len(buf):
            raise ValueError("kafka batch: truncated segment")
        (batch_len,) = struct.unpack_from(">i", buf, pos + 8)
        end = pos + 12 + batch_len
        if end > len(buf):
            raise ValueError("kafka batch: truncated segment")
        out.append(decode_record_batch(buf[pos:end]))
        pos = end
    return out
