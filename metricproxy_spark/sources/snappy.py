"""Snappy BLOCK-format codec, from scratch (S-ext wire transport).

Prometheus remote write (`sources/remote_write.py`) mandates snappy
block compression of the protobuf body — the one mainstream metrics
wire transport the engine still lacked. No snappy library ships in
this environment, so this implements the public block format directly
(google/snappy format_description.txt; the separate FRAMING stream
layer is implemented further down):

- preamble: uncompressed length as a little-endian base-128 varint
  (32-bit range);
- then back-to-back elements, tag byte ``t`` with element type in the
  low 2 bits:
  - ``00`` literal — length-1 in the upper 6 bits when < 60, else tag
    values 60..63 put the length-1 in the following 1..4 bytes LE;
  - ``01`` copy, 1-byte offset — length 4..11 = 4 + bits 2..4, offset
    0..2047 = bits 5..7 of the tag << 8 | next byte;
  - ``10`` copy, 2-byte offset — length 1..64 = 1 + upper 6 bits,
    offset = next 2 bytes LE;
  - ``11`` copy, 4-byte offset — same lengths, 4-byte LE offset.
- copies may overlap their own output (offset < length): the
  byte-by-byte semantics that make snappy's RLE work.

The decompressor is STRICT in this repo's codec discipline: any
malformed input — truncated varint/element, zero offset, offset past
the produced output, output over- or under-running the declared
length — raises a clean ``ValueError`` (never IndexError/overrun),
and every-prefix truncation scans in ``tests/test_remote_write.py``
keep it honest. The compressor is a greedy 4-byte-hash matcher
(literals + copy-1/copy-2 elements) — any spec-valid encoding is
acceptable on the wire, and the roundtrip property tests pin this one
against the decompressor.

Pure Python, but it only ever runs inside Arrow-batched
``mapInPandas`` over whole payload blobs (SURVEY §8 risk 3 isolation —
same seam as `sources/sfx_protobuf.py`).
"""

from __future__ import annotations

_MAX_LEN = 1 << 32  # preamble is a 32-bit length


def _write_uvarint(out: bytearray, v: int) -> None:
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return


def _read_uvarint32(buf: bytes, pos: int) -> tuple[int, int]:
    result = 0
    shift = 0
    while True:
        if pos >= len(buf) or shift > 31:
            raise ValueError("truncated or oversized snappy length varint")
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            if result >= _MAX_LEN:
                raise ValueError("snappy uncompressed length out of range")
            return result, pos
        shift += 7


def decompress_snappy(buf: bytes) -> bytes:
    """Decode one snappy BLOCK; raise ``ValueError`` on any
    malformation (the foreign-bytes contract)."""
    declared, pos = _read_uvarint32(buf, 0)
    out = bytearray()
    n = len(buf)
    while pos < n:
        if len(out) >= declared and pos < n:
            raise ValueError("snappy output exceeds declared length")
        t = buf[pos]
        pos += 1
        typ = t & 3
        if typ == 0:  # literal
            ln = t >> 2
            if ln >= 60:
                nb = ln - 59  # 60..63 -> 1..4 extra length bytes
                if pos + nb > n:
                    raise ValueError("truncated snappy literal length")
                ln = int.from_bytes(buf[pos : pos + nb], "little")
                pos += nb
            ln += 1
            if pos + ln > n:
                raise ValueError("truncated snappy literal")
            out += buf[pos : pos + ln]
            pos += ln
        else:
            if typ == 1:
                ln = 4 + ((t >> 2) & 0x7)
                if pos + 1 > n:
                    raise ValueError("truncated snappy copy-1 offset")
                off = ((t >> 5) << 8) | buf[pos]
                pos += 1
            elif typ == 2:
                ln = 1 + (t >> 2)
                if pos + 2 > n:
                    raise ValueError("truncated snappy copy-2 offset")
                off = int.from_bytes(buf[pos : pos + 2], "little")
                pos += 2
            else:
                ln = 1 + (t >> 2)
                if pos + 4 > n:
                    raise ValueError("truncated snappy copy-4 offset")
                off = int.from_bytes(buf[pos : pos + 4], "little")
                pos += 4
            if off == 0 or off > len(out):
                raise ValueError("snappy copy offset outside output")
            if ln <= off:  # non-overlapping: one slice
                start = len(out) - off
                out += out[start : start + ln]
            else:  # overlapping copy: byte-by-byte semantics (RLE)
                start = len(out) - off
                for i in range(ln):
                    out.append(out[start + i])
        if len(out) > declared:
            raise ValueError("snappy output exceeds declared length")
    if len(out) != declared:
        raise ValueError("snappy output shorter than declared length")
    return bytes(out)


def _emit_literal(out: bytearray, chunk: bytes) -> None:
    i = 0
    n = len(chunk)
    while i < n:
        ln = min(n - i, 65536)
        lm1 = ln - 1
        if lm1 < 60:
            out.append(lm1 << 2)
        elif lm1 < 256:
            out.append(60 << 2)
            out.append(lm1)
        else:
            out.append(61 << 2)
            out += lm1.to_bytes(2, "little")
        out += chunk[i : i + ln]
        i += ln


def _emit_copy(out: bytearray, off: int, ln: int) -> None:
    if 4 <= ln <= 11 and off < 2048:
        out.append(((off >> 8) << 5) | ((ln - 4) << 2) | 1)
        out.append(off & 0xFF)
    else:  # ln 1..64, off < 65536 by construction
        out.append(((ln - 1) << 2) | 2)
        out += off.to_bytes(2, "little")


def compress_snappy(data: bytes) -> bytes:
    """Encode one snappy BLOCK: greedy 4-byte-hash matching with
    64 KiB max offset and 64-byte max copy length (spec-valid; not
    byte-identical to C++ snappy output, which no consumer requires)."""
    if len(data) >= _MAX_LEN:
        raise ValueError("snappy block input too large")
    out = bytearray()
    _write_uvarint(out, len(data))
    n = len(data)
    table: dict[bytes, int] = {}
    i = 0
    lit_start = 0
    while i + 4 <= n:
        key = bytes(data[i : i + 4])
        cand = table.get(key)
        table[key] = i
        if cand is not None and i - cand <= 65535:
            mlen = 4
            while i + mlen < n and mlen < 64 and data[cand + mlen] == data[i + mlen]:
                mlen += 1
            _emit_literal(out, data[lit_start:i])
            _emit_copy(out, i - cand, mlen)
            i += mlen
            lit_start = i
        else:
            i += 1
    _emit_literal(out, data[lit_start:n])
    return bytes(out)


# ------------------------------------------------------ framed format
# The snappy FRAMING format (google/snappy framing_format.txt) — the
# chunked stream layer used where payloads arrive incrementally or
# need mid-stream integrity (Kafka's snappy framing, .sz files):
#
#   stream identifier  ff 06 00 00 "sNaPpY"     (must come first)
#   compressed data    00 <len u24le> <masked crc32c u32le> <block>
#   uncompressed data  01 <len u24le> <masked crc32c u32le> <raw>
#   padding            fe <len u24le> <ignored>
#   02..7f             reserved UNSKIPPABLE -> ValueError
#   80..fd             reserved skippable   -> skipped
#
# The CRC is CRC-32C (Castagnoli, reflected poly 0x82F63B78) over the
# UNCOMPRESSED data, masked ((crc>>15 | crc<<17) + 0xa282ead8) so that
# streams containing CRCs don't produce pathological CRC inputs. Both
# CRC table and masking are implemented here from the public spec —
# same from-scratch discipline as the block layer above.

_CRC32C_TABLE: list[int] = []


def _crc32c_table() -> list[int]:
    global _CRC32C_TABLE
    if not _CRC32C_TABLE:
        # build locally, assign in one step: concurrent first callers
        # must never observe (or append into) a half-built table
        tab = []
        for i in range(256):
            c = i
            for _ in range(8):
                c = (c >> 1) ^ 0x82F63B78 if c & 1 else c >> 1
            tab.append(c)
        _CRC32C_TABLE = tab
    return _CRC32C_TABLE


def crc32c(data: bytes) -> int:
    tab = _crc32c_table()
    c = 0xFFFFFFFF
    for b in data:
        c = tab[(c ^ b) & 0xFF] ^ (c >> 8)
    return c ^ 0xFFFFFFFF


def _mask_crc(crc: int) -> int:
    return (((crc >> 15) | (crc << 17)) + 0xA282EAD8) & 0xFFFFFFFF


_STREAM_ID = b"\xff\x06\x00\x00sNaPpY"
_MAX_CHUNK_DATA = 65536


def compress_snappy_framed(data: bytes) -> bytes:
    """Encode a framed snappy stream: identifier + one compressed-data
    chunk per 64 KiB of input (the spec's per-chunk cap)."""
    out = bytearray(_STREAM_ID)
    # Empty input still emits ONE empty chunk — special-cased
    # explicitly (the `range(...) or [0]` falsy-range trick this
    # replaced was refactor-fragile; ADVICE r10).
    starts = range(0, len(data), _MAX_CHUNK_DATA) if data else (0,)
    for i in starts:
        chunk = data[i : i + _MAX_CHUNK_DATA]
        body = _mask_crc(crc32c(chunk)).to_bytes(4, "little") + compress_snappy(
            chunk
        )
        out.append(0x00)
        out += len(body).to_bytes(3, "little")
        out += body
    return bytes(out)


def decompress_snappy_framed(buf: bytes) -> bytes:
    """Decode a framed snappy stream; ``ValueError`` on a missing or
    malformed identifier, bad chunk CRC, mid-chunk truncation, or any
    reserved unskippable chunk type.

    CAVEAT (inherent to the format, not this decoder): the framing
    spec has no total-length or end-of-stream marker, so a stream
    truncated EXACTLY at a chunk boundary is indistinguishable from a
    complete shorter stream and decodes to a silent partial prefix.
    Stream consumers needing completeness must carry their own check
    (e.g. an expected sample/byte count), as the carbon transport
    oracle does."""
    if not buf.startswith(_STREAM_ID):
        raise ValueError("missing snappy stream identifier")
    out = bytearray()
    pos = len(_STREAM_ID)
    n = len(buf)
    while pos < n:
        if pos + 4 > n:
            raise ValueError("truncated snappy frame header")
        typ = buf[pos]
        ln = int.from_bytes(buf[pos + 1 : pos + 4], "little")
        pos += 4
        if pos + ln > n:
            raise ValueError("truncated snappy frame chunk")
        body = buf[pos : pos + ln]
        pos += ln
        if typ in (0x00, 0x01):
            if ln < 4:
                raise ValueError("snappy data chunk shorter than its CRC")
            want = int.from_bytes(body[:4], "little")
            if typ == 0x00:
                # bound BEFORE decompressing: the block's declared
                # length is right there in the preamble, and refusing
                # an over-cap chunk in O(1) is what keeps a malicious
                # 16 MB body from materializing hundreds of MB first
                declared, _ = _read_uvarint32(body, 4)
                if declared > _MAX_CHUNK_DATA:
                    raise ValueError("snappy frame chunk exceeds 64 KiB cap")
                data = decompress_snappy(body[4:])
            else:
                data = bytes(body[4:])
            if len(data) > _MAX_CHUNK_DATA:
                raise ValueError("snappy frame chunk exceeds 64 KiB cap")
            if _mask_crc(crc32c(data)) != want:
                raise ValueError("snappy frame CRC mismatch")
            out += data
        elif typ == 0xFF:
            if body != _STREAM_ID[4:]:
                raise ValueError("malformed repeated stream identifier")
        elif typ == 0xFE or 0x80 <= typ <= 0xFD:
            continue  # padding / reserved skippable
        else:  # 0x02..0x7f reserved unskippable
            raise ValueError(f"unskippable snappy chunk type 0x{typ:02x}")
    return bytes(out)
