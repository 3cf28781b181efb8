"""LZ4 BLOCK-format codec, from scratch (S-ext wire transport).

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
