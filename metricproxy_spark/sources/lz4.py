"""LZ4 BLOCK + FRAME format codec and xxHash-32, from scratch (S-ext
wire transport).

The other mainstream fast-compression block format beside snappy
(Kafka `compression.type=lz4`, parquet LZ4_RAW pages, journald). No
lz4 library ships in this environment; this implements the public
block format (lz4/lz4 doc/lz4_Block_format.md) directly:

- a block is a series of SEQUENCES: token byte with the literal count
  in the high nibble and the match length (− 4, the minmatch) in the
  low nibble; nibble value 15 means extension bytes follow (each 0xFF
  adds 255, the first non-0xFF closes the count);
- after the literals, a 2-byte little-endian match OFFSET (1..65535 —
  0 is invalid) and the match-length extension bytes;
- matches may overlap their own output (offset < length): byte-wise
  copy semantics, LZ4's RLE;
- END RULES: the last sequence is literals-only (no offset field),
  the final 5 bytes of a block are always literals, and the last
  match must start at least 12 bytes before the block end — the
  encoder here enforces both, the decoder accepts any spec-valid
  stream.

A raw LZ4 block carries NO uncompressed-length preamble (unlike
snappy), so the strict decoder takes a ``max_out`` bound and treats
exceeding it as malformed — the amplification-bomb guard the missing
header would otherwise leave open. Decode discipline is this repo's
codec contract: any malformed input (truncated token/extension/
literals/offset, zero offset, offset past the produced output) raises
a clean ``ValueError``; every-prefix truncation scans and fuzz tests
in ``tests/test_lz4.py`` keep it honest. The compressor is a greedy
4-byte-hash matcher (the same shape as `sources/snappy.py`'s) — any
spec-valid encoding is acceptable, pinned by roundtrip property
tests.

Pure Python, isolated inside Arrow-batched ``mapInPandas`` over whole
payload blobs (SURVEY §8 risk 3).
"""

from __future__ import annotations

_MINMATCH = 4


def _read_count(buf: bytes, pos: int, base: int) -> tuple[int, int]:
    """Nibble-15 extension: add 255 per 0xFF byte, close on non-0xFF."""
    count = base
    if base == 15:
        while True:
            if pos >= len(buf):
                raise ValueError("truncated LZ4 length extension")
            b = buf[pos]
            pos += 1
            count += b
            if b != 0xFF:
                break
    return count, pos


def decompress_lz4_block(buf: bytes, max_out: int = 1 << 26) -> bytes:
    """Decode one raw LZ4 block; ``ValueError`` on any malformation or
    on output exceeding ``max_out`` (no length preamble exists to
    bound it otherwise).

    The bound refusal carries a DISTINCT message ("exceeds max_out
    bound") from the malformation errors, so callers can tell a
    legitimately-large block from a corrupt one. Callers that know
    their payload should pass an explicit ``max_out`` sized to it —
    e.g. ``len(buf) * 255 + 64`` (the format's maximum amplification
    plus base-length headroom — the bound the in-repo caller uses)
    rather than relying on the 64 MiB default."""
    out = bytearray()
    pos = 0
    n = len(buf)
    if n == 0:
        # reference decoders reject srcSize=0; the minimal valid block
        # is the single end-mark token 0x00 (empty literals)
        raise ValueError("empty LZ4 block")
    while pos < n:
        token = buf[pos]
        pos += 1
        lit_len, pos = _read_count(buf, pos, token >> 4)
        if pos + lit_len > n:
            raise ValueError("truncated LZ4 literals")
        if len(out) + lit_len > max_out:
            raise ValueError("LZ4 output exceeds max_out bound")
        out += buf[pos : pos + lit_len]
        pos += lit_len
        if pos == n:
            break  # last sequence: literals only, no offset field
        if pos + 2 > n:
            raise ValueError("truncated LZ4 match offset")
        off = int.from_bytes(buf[pos : pos + 2], "little")
        pos += 2
        if off == 0 or off > len(out):
            raise ValueError("LZ4 match offset outside output")
        mlen, pos = _read_count(buf, pos, token & 0xF)
        mlen += _MINMATCH
        if len(out) + mlen > max_out:
            raise ValueError("LZ4 output exceeds max_out bound")
        if mlen <= off:  # non-overlapping: one slice
            start = len(out) - off
            out += out[start : start + mlen]
        else:  # overlapping copy: byte-by-byte semantics (RLE)
            start = len(out) - off
            for i in range(mlen):
                out.append(out[start + i])
    return bytes(out)


def _write_count(out: bytearray, count: int) -> None:
    while count >= 255:
        out.append(0xFF)
        count -= 255
    out.append(count)


def _emit_sequence(out: bytearray, literals: bytes, off: int, mlen: int) -> None:
    lit_len = len(literals)
    ml = mlen - _MINMATCH
    out.append((min(lit_len, 15) << 4) | min(ml, 15))
    if lit_len >= 15:
        _write_count(out, lit_len - 15)
    out += literals
    out += off.to_bytes(2, "little")
    if ml >= 15:
        _write_count(out, ml - 15)


def compress_lz4_block(data: bytes) -> bytes:
    """Encode one raw LZ4 block: greedy 4-byte-hash matching, 64 KiB
    max offset, spec end rules enforced (last match starts ≥ 12 bytes
    before block end; final sequence is literals-only)."""
    n = len(data)
    out = bytearray()
    # matches may not start within the final 12 bytes
    match_limit = n - 12
    table: dict[bytes, int] = {}
    i = 0
    lit_start = 0
    while i < match_limit and i + _MINMATCH <= n:
        key = bytes(data[i : i + 4])
        cand = table.get(key)
        table[key] = i
        if cand is not None and i - cand <= 65535:
            # extend, but a match may not cover the final 5 bytes
            cap = n - 5 - i
            mlen = 4
            while mlen < cap and data[cand + mlen] == data[i + mlen]:
                mlen += 1
            if mlen >= _MINMATCH and mlen <= cap:
                _emit_sequence(
                    out, data[lit_start:i], i - cand, mlen
                )
                i += mlen
                lit_start = i
                continue
        i += 1
    # final literals-only sequence — ALWAYS present, even when empty:
    # the empty input encodes as the single end-mark token 0x00, the
    # minimal block reference encoders emit
    tail = data[lit_start:n]
    lit_len = len(tail)
    out.append(min(lit_len, 15) << 4)
    if lit_len >= 15:
        _write_count(out, lit_len - 15)
    out += tail
    return bytes(out)


# ====================================================================
# LZ4 FRAME format (lz4_Frame_format.md) + xxHash-32 (from scratch)
# ====================================================================
#
# The interchange container around raw blocks — what `.lz4` files and
# streaming transports actually carry (magic, frame descriptor with
# header checksum, length-prefixed data blocks with optional per-block
# checksums, EndMark, optional whole-content checksum). Every checksum
# in the spec is xxHash-32 (Cyan4973/xxHash XXH32 spec), implemented
# from scratch below — the third checksum family in this engine next
# to CRC-32 (deflate) and CRC-32C (snappy framing).

_P1, _P2, _P3, _P4, _P5 = (
    2654435761, 2246822519, 3266489917, 668265263, 374761393,
)
_M32 = 0xFFFFFFFF


def _rotl32(x: int, r: int) -> int:
    return ((x << r) | (x >> (32 - r))) & _M32


def xxh32(data: bytes, seed: int = 0) -> int:
    """XXH32 (public spec, Cyan4973/xxHash doc/xxhash_spec.md):
    4-lane 16-byte stripes, 4-byte and 1-byte tails, avalanche."""
    n = len(data)
    pos = 0
    if n >= 16:
        v1 = (seed + _P1 + _P2) & _M32
        v2 = (seed + _P2) & _M32
        v3 = seed & _M32
        v4 = (seed - _P1) & _M32
        while pos + 16 <= n:
            lane = int.from_bytes(data[pos : pos + 4], "little")
            v1 = (_rotl32((v1 + lane * _P2) & _M32, 13) * _P1) & _M32
            lane = int.from_bytes(data[pos + 4 : pos + 8], "little")
            v2 = (_rotl32((v2 + lane * _P2) & _M32, 13) * _P1) & _M32
            lane = int.from_bytes(data[pos + 8 : pos + 12], "little")
            v3 = (_rotl32((v3 + lane * _P2) & _M32, 13) * _P1) & _M32
            lane = int.from_bytes(data[pos + 12 : pos + 16], "little")
            v4 = (_rotl32((v4 + lane * _P2) & _M32, 13) * _P1) & _M32
            pos += 16
        h = (
            _rotl32(v1, 1) + _rotl32(v2, 7) + _rotl32(v3, 12) + _rotl32(v4, 18)
        ) & _M32
    else:
        h = (seed + _P5) & _M32
    h = (h + n) & _M32
    while pos + 4 <= n:
        lane = int.from_bytes(data[pos : pos + 4], "little")
        h = (_rotl32((h + lane * _P3) & _M32, 17) * _P4) & _M32
        pos += 4
    while pos < n:
        h = (_rotl32((h + data[pos] * _P5) & _M32, 11) * _P1) & _M32
        pos += 1
    h ^= h >> 15
    h = (h * _P2) & _M32
    h ^= h >> 13
    h = (h * _P3) & _M32
    h ^= h >> 16
    return h


_FRAME_MAGIC = b"\x04\x22\x4d\x18"
_BLOCK_MAX = 64 * 1024  # BD block-max code 4
_UNCOMPRESSED_BIT = 0x80000000


def compress_lz4_frame(data: bytes) -> bytes:
    """One LZ4 frame: magic + descriptor (version 01, independent
    64 KiB blocks, block checksums, content size, content checksum —
    FLG 0x7C / BD 0x40 / xxh32 header check byte) + blocks (raw blocks
    from :func:`compress_lz4_block`; stored uncompressed with the high
    bit when compression does not shrink, as the spec requires) +
    EndMark + whole-content xxh32."""
    desc = (
        bytes((0x7C, 0x40))
        + len(data).to_bytes(8, "little")
    )
    out = bytearray(_FRAME_MAGIC)
    out += desc
    out.append((xxh32(desc) >> 8) & 0xFF)
    for start in range(0, len(data), _BLOCK_MAX):
        chunk = data[start : start + _BLOCK_MAX]
        enc = compress_lz4_block(chunk)
        if len(enc) < len(chunk):
            out += len(enc).to_bytes(4, "little")
            block = enc
        else:
            out += (len(chunk) | _UNCOMPRESSED_BIT).to_bytes(4, "little")
            block = chunk
        out += block
        out += xxh32(block).to_bytes(4, "little")
    out += (0).to_bytes(4, "little")  # EndMark
    out += xxh32(data).to_bytes(4, "little")  # content checksum
    return bytes(out)


def decompress_lz4_frame(buf: bytes, max_out: int = 1 << 26) -> bytes:
    """Decode one LZ4 frame, strict: magic, version, reserved bits,
    header-checksum byte, per-block xxh32 (when flagged), EndMark,
    content size and content checksum (when flagged) are ALL verified;
    trailing bytes after the frame are malformed. ``max_out`` bounds
    the decoded output (distinct refusal message, the repo codec
    contract)."""
    if len(buf) < 7:
        raise ValueError("lz4 frame: truncated header")
    if buf[:4] != _FRAME_MAGIC:
        raise ValueError("lz4 frame: bad magic")
    flg = buf[4]
    bd = buf[5]
    if (flg >> 6) != 0b01:
        raise ValueError("lz4 frame: unsupported version")
    if flg & 0b10 or bd & 0b10001111:
        raise ValueError("lz4 frame: reserved bits set")
    if not flg & 0x20:
        # FLG bit 5 = Block Independence. Linked blocks (reference
        # `lz4 -BD` output) let matches reach into PRIOR blocks' output
        # — this decoder keeps a fresh window per block, so a spec-valid
        # linked frame would misdecode into a misleading offset error.
        # Reject honestly up front, like FDICT and zstd skippable frames.
        raise ValueError("lz4 frame: linked blocks not supported")
    has_bchk = bool(flg & 0x10)
    has_csize = bool(flg & 0x08)
    has_cchk = bool(flg & 0x04)
    has_dict = bool(flg & 0x01)
    if (bd >> 4) & 0x7 not in (4, 5, 6, 7):
        raise ValueError("lz4 frame: invalid block max size")
    block_max = 1 << (8 + 2 * ((bd >> 4) & 0x7))
    pos = 6
    content_size = None
    if has_csize:
        if pos + 8 > len(buf):
            raise ValueError("lz4 frame: truncated content size")
        content_size = int.from_bytes(buf[pos : pos + 8], "little")
        pos += 8
    if has_dict:
        raise ValueError("lz4 frame: dictionaries not supported")
    if pos >= len(buf):
        raise ValueError("lz4 frame: truncated header checksum")
    if buf[pos] != (xxh32(buf[4:pos]) >> 8) & 0xFF:
        raise ValueError("lz4 frame: header checksum mismatch")
    pos += 1
    out = bytearray()
    while True:
        if pos + 4 > len(buf):
            raise ValueError("lz4 frame: truncated block size")
        size = int.from_bytes(buf[pos : pos + 4], "little")
        pos += 4
        if size == 0:  # EndMark
            break
        stored = bool(size & _UNCOMPRESSED_BIT)
        size &= ~_UNCOMPRESSED_BIT
        if size > block_max:
            raise ValueError("lz4 frame: block exceeds declared maximum")
        if pos + size > len(buf):
            raise ValueError("lz4 frame: truncated block")
        block = buf[pos : pos + size]
        pos += size
        if has_bchk:
            if pos + 4 > len(buf):
                raise ValueError("lz4 frame: truncated block checksum")
            if int.from_bytes(buf[pos : pos + 4], "little") != xxh32(block):
                raise ValueError("lz4 frame: block checksum mismatch")
            pos += 4
        if stored:
            if len(out) + size > max_out:
                raise ValueError("lz4 frame: output exceeds max_out bound")
            out += block
        else:
            decoded = decompress_lz4_block(
                block, max_out=min(block_max, max_out - len(out))
            )
            out += decoded
    if has_cchk:
        if pos + 4 > len(buf):
            raise ValueError("lz4 frame: truncated content checksum")
        if int.from_bytes(buf[pos : pos + 4], "little") != xxh32(bytes(out)):
            raise ValueError("lz4 frame: content checksum mismatch")
        pos += 4
    if content_size is not None and len(out) != content_size:
        raise ValueError("lz4 frame: content size mismatch")
    if pos != len(buf):
        raise ValueError("lz4 frame: trailing bytes after frame")
    return bytes(out)
