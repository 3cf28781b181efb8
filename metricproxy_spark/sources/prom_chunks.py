"""Prometheus TSDB XOR chunks + STREAMED remote-read framing, from
scratch (S-ext wire format).

Remote read negotiates two response types; `sources/remote_read.py`
implements SAMPLES, this module implements STREAMED_XOR_CHUNKS — the
production form (constant server memory: series stream out chunk by
chunk instead of one giant marshaled response). Three public layers,
each from its public spec:

1. **XOR chunk** (prometheus/tsdb/chunkenc/xor.go; the Gorilla VLDB'15
   scheme with prometheus's OWN bit layout, which differs from the
   paper and from `operators/gorilla.py`):
   - 2-byte big-endian sample count header;
   - sample 0: t (ms) as SIGNED varint (byte-aligned writes through
     the bitstream), value as raw 64 bits;
   - sample 1: tDelta as Uvarint, value XOR-encoded;
   - samples ≥2: delta-of-delta through prometheus's prefix code —
     ``0`` (dod=0), ``10``+14 bits, ``110``+17, ``1110``+20,
     ``1111``+64 — with xor.go's ASYMMETRIC bit ranges
     (−(2^(n−1)−1) … +2^(n−1), decoded with the strict-``>`` wrap);
   - value XOR: ``0`` same value; ``1 0`` reuse the previous
     leading/trailing window; ``1 1`` new window — 5 bits leading
     (capped at 31), 6 bits significant-bit count (64 encoded as 0),
     then the bits.
2. **Chunk / ChunkedSeries / ChunkedReadResponse** protobuf messages
   (prompb/types.proto, prompb/remote.proto), sharing the repo's
   varint/skip machinery.
3. **Stream framing** (prometheus remote-read streamed protocol,
   ``Content-Type: application/x-streamed-protobuf; proto=prometheus.ChunkedReadResponse``):
   each frame is ``uvarint(len(msg)) + msg + 4-byte BIG-endian
   CRC-32C(msg)`` — the Castagnoli table already built from scratch in
   `sources/snappy.py`.

Decode discipline is the repo codec contract: truncated bitstreams /
frames, CRC mismatches, sample-count mismatches and trailing bytes
raise clean ``ValueError``; roundtrip property tests plus hand-pinned
byte layouts live in ``tests/test_prom_chunks.py``.
"""

from __future__ import annotations

import struct

from metricproxy_spark.sources.remote_write import (
    _decode_label,
    _encode_label,
    _read_delimited,
)
from metricproxy_spark.sources.sfx_protobuf import (
    _read_varint,
    _signed64,
    _skip_field,
    _tag,
    _unzigzag,
    _write_bytes_field,
    _write_varint,
    _zigzag,
)
from metricproxy_spark.sources.snappy import crc32c

XOR_ENCODING = 1  # Chunk.Encoding.XOR


# ----------------------------------------------------- bit plumbing


class _BitWriter:
    """MSB-first bit accumulator (prometheus bstream semantics)."""

    __slots__ = ("out", "_acc", "_n")

    def __init__(self) -> None:
        self.out = bytearray()
        self._acc = 0
        self._n = 0

    def write(self, value: int, nbits: int) -> None:
        self._acc = (self._acc << nbits) | (value & ((1 << nbits) - 1))
        self._n += nbits
        while self._n >= 8:
            self.out.append((self._acc >> (self._n - 8)) & 0xFF)
            self._n -= 8
        self._acc &= (1 << self._n) - 1

    def write_byte(self, b: int) -> None:
        self.write(b, 8)

    def finish(self) -> bytes:
        if self._n:
            self.write(0, 8 - self._n)
        return bytes(self.out)


class _BitReader:
    __slots__ = ("buf", "bytepos", "bitpos")

    def __init__(self, buf: bytes, bytepos: int = 0) -> None:
        self.buf = buf
        self.bytepos = bytepos
        self.bitpos = 0

    def read(self, nbits: int) -> int:
        v = 0
        while nbits:
            if self.bytepos >= len(self.buf):
                raise ValueError("xor chunk: truncated bitstream")
            avail = 8 - self.bitpos
            take = min(nbits, avail)
            byte = self.buf[self.bytepos]
            v = (v << take) | ((byte >> (avail - take)) & ((1 << take) - 1))
            self.bitpos += take
            nbits -= take
            if self.bitpos == 8:
                self.bitpos = 0
                self.bytepos += 1
        return v

    def read_byte(self) -> int:
        return self.read(8)


def _write_varint_bits(bw: _BitWriter, u: int) -> None:
    """Unsigned LEB128 through the bitstream (byte-aligned writes in
    the bit domain, exactly how bstream.writeByte lands mid-bit)."""
    while u >= 0x80:
        bw.write_byte((u & 0x7F) | 0x80)
        u >>= 7
    bw.write_byte(u)


def _read_varint_bits(br: _BitReader) -> int:
    shift = 0
    out = 0
    while True:
        b = br.read_byte()
        out |= (b & 0x7F) << shift
        if not b & 0x80:
            return out
        shift += 7
        if shift > 70:
            raise ValueError("xor chunk: varint overlong")


# prometheus bitRange(): asymmetric — allows +2^(n-1) but only
# -(2^(n-1)-1); decode wraps with strict >.
_DOD_BUCKETS = ((0b10, 2, 14), (0b110, 3, 17), (0b1110, 4, 20))


def _bit_range(x: int, nbits: int) -> bool:
    return -((1 << (nbits - 1)) - 1) <= x <= (1 << (nbits - 1))


# ------------------------------------------------------- XOR chunk


def encode_xor_chunk(samples: list[tuple[int, float]]) -> bytes:
    """``[(t_ms, value), ...]`` (time-ordered) → chunk data bytes
    (chunkenc XOR layout; the chunk's 1-byte encoding tag lives in the
    protobuf Chunk.type field, not in the data)."""
    if len(samples) > 0xFFFF:
        raise ValueError("xor chunk: more than 65535 samples")
    bw = _BitWriter()
    bw.write_byte(len(samples) >> 8)
    bw.write_byte(len(samples) & 0xFF)
    t_prev = v_prev_bits = 0
    t_delta = 0
    leading, trailing = 0xFF, 0  # 0xff = no window yet (xor.go)
    for i, (t, v) in enumerate(samples):
        vbits = struct.unpack("<Q", struct.pack("<d", float(v)))[0]
        if i == 0:
            _write_varint_bits(bw, _zigzag(int(t)))
            bw.write(vbits, 64)
        elif i == 1:
            t_delta = int(t) - t_prev
            if t_delta < 0:
                raise ValueError("xor chunk: samples not time-ordered")
            _write_varint_bits(bw, t_delta)
            leading, trailing = _xor_write(
                bw, vbits, v_prev_bits, leading, trailing
            )
        else:
            new_delta = int(t) - t_prev
            if new_delta < 0:
                raise ValueError("xor chunk: samples not time-ordered")
            dod = new_delta - t_delta
            t_delta = new_delta
            if dod == 0:
                bw.write(0, 1)
            else:
                for prefix, plen, nbits in _DOD_BUCKETS:
                    if _bit_range(dod, nbits):
                        bw.write(prefix, plen)
                        bw.write(dod, nbits)
                        break
                else:
                    bw.write(0b1111, 4)
                    bw.write(dod, 64)
            leading, trailing = _xor_write(
                bw, vbits, v_prev_bits, leading, trailing
            )
        t_prev = int(t)
        v_prev_bits = vbits
    return bw.finish()


def _xor_write(
    bw: _BitWriter, vbits: int, prev_bits: int, leading: int, trailing: int
) -> tuple[int, int]:
    xor = vbits ^ prev_bits
    if xor == 0:
        bw.write(0, 1)
        return leading, trailing
    bw.write(1, 1)
    lead = 64 - xor.bit_length()
    if lead >= 32:
        lead = 31  # 5-bit field cap (xor.go)
    trail = (xor & -xor).bit_length() - 1
    if leading != 0xFF and lead >= leading and trail >= trailing:
        bw.write(0, 1)  # reuse previous window
        sig = 64 - leading - trailing
        bw.write(xor >> trailing, sig)
        return leading, trailing
    bw.write(1, 1)  # new window
    sig = 64 - lead - trail
    bw.write(lead, 5)
    bw.write(sig & 0x3F, 6)  # 64 significant bits encode as 0
    bw.write(xor >> trail, sig)
    return lead, trail


def decode_xor_chunk(data: bytes) -> list[tuple[int, float]]:
    """Chunk data bytes → ``[(t_ms, value), ...]``; strict: truncated
    bitstreams, bad sample counts and negative deltas raise."""
    if len(data) < 2:
        raise ValueError("xor chunk: truncated header")
    num = (data[0] << 8) | data[1]
    br = _BitReader(data, 2)
    out: list[tuple[int, float]] = []
    t = t_delta = 0
    vbits = 0
    leading, trailing = 0, 0
    for i in range(num):
        if i == 0:
            t = _unzigzag(_read_varint_bits(br))
            vbits = br.read(64)
        elif i == 1:
            t_delta = _read_varint_bits(br)
            t += t_delta
            vbits, leading, trailing = _xor_read(
                br, vbits, leading, trailing
            )
        else:
            bit = br.read(1)
            if bit == 0:
                dod = 0
            else:
                nbits = 0
                prefix = 1
                for _, plen, width in _DOD_BUCKETS:
                    bit = br.read(1)
                    prefix = (prefix << 1) | bit
                    if bit == 0:
                        nbits = width
                        break
                if nbits:
                    dod = br.read(nbits)
                    if dod > (1 << (nbits - 1)):  # strict >: xor.go wrap
                        dod -= 1 << nbits
                else:
                    dod = br.read(64)
                    if dod >= 1 << 63:
                        dod -= 1 << 64
            t_delta += dod
            if t_delta < 0:
                raise ValueError("xor chunk: negative time delta")
            t += t_delta
            vbits, leading, trailing = _xor_read(
                br, vbits, leading, trailing
            )
        out.append(
            (t, struct.unpack("<d", struct.pack("<Q", vbits))[0])
        )
    return out


def _xor_read(
    br: _BitReader, prev_bits: int, leading: int, trailing: int
) -> tuple[int, int, int]:
    if br.read(1) == 0:
        return prev_bits, leading, trailing
    if br.read(1) == 1:  # new window
        leading = br.read(5)
        sig = br.read(6)
        if sig == 0:
            sig = 64
        trailing = 64 - leading - sig
        if trailing < 0:
            raise ValueError("xor chunk: invalid leading/significant bits")
    sig = 64 - leading - trailing
    xor = br.read(sig) << trailing
    return prev_bits ^ xor, leading, trailing


# ----------------------------------------- chunked response protobuf


def encode_chunk(min_t: int, max_t: int, data: bytes) -> bytes:
    out = bytearray()
    _write_varint(out, _tag(1, 0))
    _write_varint(out, min_t)
    _write_varint(out, _tag(2, 0))
    _write_varint(out, max_t)
    _write_varint(out, _tag(3, 0))
    _write_varint(out, XOR_ENCODING)
    _write_bytes_field(out, 4, data)
    return bytes(out)


def encode_chunked_series(
    labels: dict[str, str], chunks: list[tuple[int, int, bytes]]
) -> bytes:
    out = bytearray()
    for name in sorted(labels):
        _write_bytes_field(out, 1, _encode_label(name, labels[name]))
    for min_t, max_t, data in chunks:
        _write_bytes_field(out, 2, encode_chunk(min_t, max_t, data))
    return bytes(out)


def encode_chunked_read_response(
    series: list[tuple[dict[str, str], list[tuple[int, int, bytes]]]],
    query_index: int = 0,
) -> bytes:
    out = bytearray()
    for labels, chunks in series:
        _write_bytes_field(out, 1, encode_chunked_series(labels, chunks))
    if query_index:
        _write_varint(out, _tag(2, 0))
        _write_varint(out, query_index)
    return bytes(out)


def _decode_chunk(buf: bytes) -> tuple[int, int, int, bytes]:
    min_t = max_t = 0
    enc = 0
    data = b""
    pos = 0
    while pos < len(buf):
        key, pos = _read_varint(buf, pos)
        field, wire = key >> 3, key & 7
        if field == 1 and wire == 0:
            raw, pos = _read_varint(buf, pos)
            min_t = _signed64(raw)
        elif field == 2 and wire == 0:
            raw, pos = _read_varint(buf, pos)
            max_t = _signed64(raw)
        elif field == 3 and wire == 0:
            enc, pos = _read_varint(buf, pos)
        elif field == 4 and wire == 2:
            data, pos = _read_delimited(buf, pos)
        else:
            pos = _skip_field(buf, pos, wire)
    return min_t, max_t, enc, data


def decode_chunked_read_response(
    buf: bytes,
) -> tuple[list[tuple[dict[str, str], list[tuple[int, float]]]], int]:
    """→ ``([(labels, [(t_ms, v), ...]), ...], query_index)`` — XOR
    chunk payloads decoded; unknown chunk encodings rejected."""
    series: list[tuple[dict[str, str], list[tuple[int, float]]]] = []
    query_index = 0
    pos = 0
    while pos < len(buf):
        key, pos = _read_varint(buf, pos)
        field, wire = key >> 3, key & 7
        if field == 1 and wire == 2:
            raw, pos = _read_delimited(buf, pos)
            labels: dict[str, str] = {}
            samples: list[tuple[int, float]] = []
            spos = 0
            while spos < len(raw):
                skey, spos = _read_varint(raw, spos)
                sfield, swire = skey >> 3, skey & 7
                if sfield == 1 and swire == 2:
                    lraw, spos = _read_delimited(raw, spos)
                    name, value = _decode_label(lraw)
                    labels[name] = value
                elif sfield == 2 and swire == 2:
                    craw, spos = _read_delimited(raw, spos)
                    min_t, max_t, enc, data = _decode_chunk(craw)
                    if enc != XOR_ENCODING:
                        raise ValueError(
                            "chunked read: unsupported chunk encoding"
                        )
                    decoded = decode_xor_chunk(data)
                    if decoded and (
                        decoded[0][0] < min_t or decoded[-1][0] > max_t
                    ):
                        raise ValueError(
                            "chunked read: samples outside chunk bounds"
                        )
                    samples.extend(decoded)
                else:
                    spos = _skip_field(raw, spos, swire)
            series.append((labels, samples))
        elif field == 2 and wire == 0:
            query_index, pos = _read_varint(buf, pos)
        else:
            pos = _skip_field(buf, pos, wire)
    return series, query_index


# ------------------------------------------------------ stream frames


def encode_chunked_stream(messages: list[bytes]) -> bytes:
    """Frame marshaled ChunkedReadResponse messages: uvarint length +
    message + 4-byte BIG-endian UNMASKED CRC-32C (Castagnoli — the
    from-scratch table in `sources/snappy.py`; snappy's framing masks
    its CRCs, this stream does not)."""
    out = bytearray()
    for msg in messages:
        _write_varint(out, len(msg))
        out += msg
        out += crc32c(msg).to_bytes(4, "big")
    return bytes(out)


def decode_chunked_stream(buf: bytes) -> list[bytes]:
    """→ the marshaled messages, CRC-verified; truncation and CRC
    mismatch raise."""
    out: list[bytes] = []
    pos = 0
    while pos < len(buf):
        ln, pos = _read_varint(buf, pos)
        if pos + ln + 4 > len(buf):
            raise ValueError("chunked stream: truncated frame")
        msg = buf[pos : pos + ln]
        pos += ln
        want = int.from_bytes(buf[pos : pos + 4], "big")
        pos += 4
        if crc32c(msg) != want:
            raise ValueError("chunked stream: CRC-32C mismatch")
        out.append(msg)
    return out
