"""Zstandard (RFC 8878) — from-scratch decoder + raw-block encoder
(S-ext compression transport; the 14th from-scratch binary codec).

zstd is the dominant modern shard transport (`.jsonl.zst` is the
Common Crawl / RedPajama distribution format) and Kafka compression
type 4. Everything here is implemented directly from two public
specs, no zstd library anywhere:

1. **RFC 8878** (Zstandard Compression and the 'application/zstd'
   Media Type) — frame framing (magic `28 B5 2F FD`, frame header
   descriptor, window descriptor, optional content size/checksum,
   skippable frames), the three block types (Raw / RLE / Compressed),
   and inside compressed blocks the full entropy stack:
   - **FSE** (tabled ANS): the variable-bit normalized-count header
     (threshold-coded probabilities with the `previous0` zero-repeat
     escape), the spread-by-`(tableSize>>1)+(tableSize>>3)+3` symbol
     placement with less-than-one probabilities pinned to the table
     top, and baseline/nbBits state transitions.
   - **huff0**: canonical Huffman over 4-bit weights (direct or
     FSE-compressed with two interleaved states), the implicit last
     weight completing a power of two, max 11 bits, 1-stream and
     4-stream (6-byte jump table) literal payloads.
   - **Sequences**: LL/OF/ML codes with predefined / RLE /
     FSE-compressed / repeat table modes, baseline+extra-bit value
     tables, the three-slot repeat-offset history with the
     `literals_length == 0` rotation twist, and backward-bitstream
     interleaved state updates in LL→ML→OF order.
2. **xxHash** (Cyan4973/xxHash doc/xxhash_spec.md) — XXH64, the
   frame content checksum (low 32 bits), pinned against the spec's
   known-answer vectors. The THIRD checksum family in this repo next
   to CRC-32/CRC-32C and xxHash-32.

The encoder side has two tiers: :func:`compress_zstd_raw` (Raw_Block
frames, the zstd analog of stored-DEFLATE) and :func:`compress_zstd`
— real ENTROPY-CODED compressed blocks: package-merge length-limited
huffman over the block's literals, tree descriptions in both the
direct 4-bit-weight form and the FSE-compressed two-interleaved-state
form (with a from-scratch normalized-count writer and backward-
bitstream FSE encoder), 1- and 4-stream literal payloads, an empty
sequences section, and per-block Raw/RLE fallback when entropy coding
does not win. Both tiers carry content size + XXH64 checksum and feed
the Kafka type-4 encode leg; the decoder handles arbitrary compressed
frames. Everything is interop-pinned in pytest against pyarrow's
bundled libzstd IN BOTH DIRECTIONS, at multiple levels, and (when
present) the reference `zstd` CLI.

Decode discipline is the repo codec contract: strict ``ValueError``
on any malformed input, ``max_out`` bounds decoded output with a
DISTINCT refusal message (zstd-bomb guard), bitstreams must be
consumed exactly, checksums and declared content sizes are verified.
"""

from __future__ import annotations

import struct

_MAGIC = b"\x28\xb5\x2f\xfd"
_SKIP_MAGIC_LO = 0x184D2A50
_SKIP_MAGIC_HI = 0x184D2A5F
_BLOCK_HARD_MAX = 128 * 1024
# Refuse absurd window declarations outright (spec allows up to
# ~3.75 TB; real decoders refuse large windows too — zstd's own
# default limit is 2^27).
_WINDOW_HARD_MAX = 1 << 27

# ---------------------------------------------------------------------------
# XXH64 (xxhash_spec.md) — frame content checksum
# ---------------------------------------------------------------------------

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M64 = (1 << 64) - 1


def _rotl64(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64


def _round64(acc: int, lane: int) -> int:
    return (_rotl64((acc + lane * _P2) & _M64, 31) * _P1) & _M64


def xxh64(data: bytes, seed: int = 0) -> int:
    """XXH64 of ``data`` — one pass, spec-exact."""
    n = len(data)
    pos = 0
    if n >= 32:
        a1 = (seed + _P1 + _P2) & _M64
        a2 = (seed + _P2) & _M64
        a3 = seed & _M64
        a4 = (seed - _P1) & _M64
        while pos + 32 <= n:
            l1, l2, l3, l4 = struct.unpack_from("<QQQQ", data, pos)
            a1 = _round64(a1, l1)
            a2 = _round64(a2, l2)
            a3 = _round64(a3, l3)
            a4 = _round64(a4, l4)
            pos += 32
        acc = (
            _rotl64(a1, 1) + _rotl64(a2, 7) + _rotl64(a3, 12) + _rotl64(a4, 18)
        ) & _M64
        for a in (a1, a2, a3, a4):
            acc = ((acc ^ _round64(0, a)) * _P1 + _P4) & _M64
    else:
        acc = (seed + _P5) & _M64
    acc = (acc + n) & _M64
    while pos + 8 <= n:
        (lane,) = struct.unpack_from("<Q", data, pos)
        acc = (_rotl64(acc ^ _round64(0, lane), 27) * _P1 + _P4) & _M64
        pos += 8
    if pos + 4 <= n:
        (lane,) = struct.unpack_from("<I", data, pos)
        acc = (_rotl64(acc ^ (lane * _P1) & _M64, 23) * _P2 + _P3) & _M64
        pos += 4
    while pos < n:
        acc = (_rotl64(acc ^ (data[pos] * _P5) & _M64, 11) * _P1) & _M64
        pos += 1
    acc ^= acc >> 33
    acc = (acc * _P2) & _M64
    acc ^= acc >> 29
    acc = (acc * _P3) & _M64
    acc ^= acc >> 32
    return acc


# ---------------------------------------------------------------------------
# Bitstreams
# ---------------------------------------------------------------------------


class _BackBits:
    """zstd's backward bitstream: bytes written forward, bits consumed
    from the end; the highest set bit of the last byte is the padding
    sentinel. ``peek`` zero-fills past the origin (legal for huff0's
    fixed-width table peeks); ``take`` refuses to CONSUME past it."""

    __slots__ = ("val", "pos")

    def __init__(self, data: bytes):
        if not data or data[-1] == 0:
            raise ValueError("zstd: bitstream missing padding sentinel")
        self.val = int.from_bytes(data, "little")
        self.pos = (len(data) - 1) * 8 + data[-1].bit_length() - 1

    def peek(self, n: int) -> int:
        p = self.pos - n
        if p >= 0:
            return (self.val >> p) & ((1 << n) - 1)
        return ((self.val << -p) & ((1 << n) - 1)) if n else 0

    def take(self, n: int) -> int:
        if n > self.pos:
            raise ValueError("zstd: bitstream over-read")
        self.pos -= n
        return (self.val >> self.pos) & ((1 << n) - 1) if n else 0


class _FwdBits:
    """Little-endian forward bitstream (FSE table descriptions)."""

    __slots__ = ("val", "used", "nbits")

    def __init__(self, data: bytes):
        self.val = int.from_bytes(data, "little")
        self.used = 0
        self.nbits = len(data) * 8

    def read(self, n: int) -> int:
        v = (self.val >> self.used) & ((1 << n) - 1)
        self.used += n
        return v

    def unread(self, n: int) -> None:
        self.used -= n

    def bytes_used(self) -> int:
        return (self.used + 7) // 8


# ---------------------------------------------------------------------------
# FSE (tabled ANS)
# ---------------------------------------------------------------------------


def _fse_read_ncount(
    bits: _FwdBits, max_accuracy: int, max_symbols: int
) -> tuple[list[int], int]:
    """RFC 8878 §4.1.1 FSE table description → (normalized counts,
    accuracy_log). Counts may include -1 = "less than one"."""
    accuracy = 5 + bits.read(4)
    if accuracy > max_accuracy:
        raise ValueError("zstd: FSE accuracy log too large")
    remaining = (1 << accuracy) + 1
    threshold = 1 << accuracy
    nbits = accuracy + 1
    counts: list[int] = []
    previous0 = False
    while remaining > 1:
        if len(counts) > max_symbols:
            raise ValueError("zstd: FSE symbol count overflow")
        if previous0:
            while True:
                rep = bits.read(2)
                counts.extend([0] * rep)
                if rep != 3:
                    break
            if len(counts) > max_symbols:
                raise ValueError("zstd: FSE symbol count overflow")
        max_small = (2 * threshold - 1) - remaining
        v = bits.read(nbits)
        if (v & (threshold - 1)) < max_small:
            count = v & (threshold - 1)
            bits.unread(1)
        else:
            count = v & (2 * threshold - 1)
            if count >= threshold:
                count -= max_small
        count -= 1  # -1 = less-than-one probability
        remaining -= -count if count < 0 else count
        if remaining < 1:
            raise ValueError("zstd: FSE counts exceed table size")
        counts.append(count)
        previous0 = count == 0
        while remaining < threshold and remaining > 1:
            nbits -= 1
            threshold >>= 1
        if bits.used > bits.nbits:
            raise ValueError("zstd: FSE table description over-read")
    return counts, accuracy


def _fse_build_dtable(
    counts: list[int], accuracy: int
) -> list[tuple[int, int, int]]:
    """Normalized counts → decode table: cell -> (symbol, nbBits,
    baseline). Spec's spread step with less-than-one symbols pinned to
    the table top."""
    size = 1 << accuracy
    symbols = [0] * size
    high = size - 1
    for s, c in enumerate(counts):
        if c == -1:
            symbols[high] = s
            high -= 1
    step = (size >> 1) + (size >> 3) + 3
    mask = size - 1
    pos = 0
    for s, c in enumerate(counts):
        for _ in range(max(c, 0)):
            symbols[pos] = s
            pos = (pos + step) & mask
            while pos > high:
                pos = (pos + step) & mask
    if pos != 0:
        raise ValueError("zstd: FSE table spread incomplete")
    nxt = [c if c != -1 else 1 for c in counts]
    table = []
    for cell in range(size):
        s = symbols[cell]
        ns = nxt[s]
        nxt[s] += 1
        nb = accuracy - (ns.bit_length() - 1)
        table.append((s, nb, (ns << nb) - size))
    return table


class _FseState:
    __slots__ = ("table", "accuracy", "state")

    def __init__(self, table, accuracy: int, stream: _BackBits):
        self.table = table
        self.accuracy = accuracy
        self.state = stream.take(accuracy)

    def symbol(self) -> int:
        return self.table[self.state][0]

    def update(self, stream: _BackBits) -> None:
        _s, nb, base = self.table[self.state]
        self.state = base + stream.take(nb)


def _rle_table(symbol: int) -> list[tuple[int, int, int]]:
    """RLE mode = a 1-cell accuracy-0 FSE table: always ``symbol``,
    zero update bits."""
    return [(symbol, 0, 0)]


# ---------------------------------------------------------------------------
# huff0 (canonical Huffman literals)
# ---------------------------------------------------------------------------


def _huff_table_from_weights(
    weights: list[int],
) -> tuple[list[tuple[int, int]], int]:
    """Explicit weights (+ the implicit last) → (decode table indexed
    by ``max_bits`` peeked bits -> (symbol, nbBits), max_bits)."""
    total = sum((1 << (w - 1)) for w in weights if w > 0)
    if total == 0:
        raise ValueError("zstd: huffman weights all zero")
    max_bits = total.bit_length()  # smallest 2^k > total
    rest = (1 << max_bits) - total
    if rest & (rest - 1):
        raise ValueError("zstd: huffman weights do not complete a power of 2")
    weights = weights + [rest.bit_length()]
    if max_bits > 11 or any(w > max_bits for w in weights):
        raise ValueError("zstd: huffman weight exceeds 11-bit limit")
    if len(weights) > 256:
        raise ValueError("zstd: too many huffman symbols")
    size = 1 << max_bits
    table: list[tuple[int, int]] = [(0, 0)] * size
    pos = 0
    for w in range(1, max_bits + 1):
        span = 1 << (w - 1)
        nb = max_bits + 1 - w
        for sym, sw in enumerate(weights):
            if sw == w:
                if pos + span > size:
                    raise ValueError("zstd: huffman table overflow")
                table[pos : pos + span] = [(sym, nb)] * span
                pos += span
    if pos != size:
        raise ValueError("zstd: huffman table underfilled")
    return table, max_bits


def _read_huff_tree(data: bytes) -> tuple[list[tuple[int, int]], int, int]:
    """Huffman_Tree_Description → (table, max_bits, bytes consumed)."""
    if not data:
        raise ValueError("zstd: empty huffman tree description")
    h = data[0]
    if h >= 128:  # direct 4-bit weights
        n = h - 127
        nbytes = (n + 1) // 2
        if 1 + nbytes > len(data):
            raise ValueError("zstd: truncated huffman weights")
        weights = []
        for i in range(n):
            b = data[1 + i // 2]
            weights.append((b >> 4) if i % 2 == 0 else (b & 0x0F))
        table, mb = _huff_table_from_weights(weights)
        return table, mb, 1 + nbytes
    # FSE-compressed weights, two interleaved states
    if 1 + h > len(data):
        raise ValueError("zstd: truncated FSE weight payload")
    sub = data[1 : 1 + h]
    fwd = _FwdBits(sub)
    counts, accuracy = _fse_read_ncount(fwd, 6, 255)
    dtable = _fse_build_dtable(counts, accuracy)
    consumed = fwd.bytes_used()
    if consumed >= len(sub):
        raise ValueError("zstd: FSE weight bitstream missing")
    back = _BackBits(sub[consumed:])
    s1 = _FseState(dtable, accuracy, back)
    s2 = _FseState(dtable, accuracy, back)
    weights: list[int] = []
    while True:
        if len(weights) > 255:
            raise ValueError("zstd: huffman weight stream overflow")
        weights.append(s1.symbol())
        if back.pos < s1.table[s1.state][1]:
            weights.append(s2.symbol())
            break
        s1.update(back)
        weights.append(s2.symbol())
        if back.pos < s2.table[s2.state][1]:
            weights.append(s1.symbol())
            break
        s2.update(back)
    table, mb = _huff_table_from_weights(weights)
    return table, mb, 1 + h


def _huff_decode_stream(
    data: bytes, table: list[tuple[int, int]], max_bits: int, count: int
) -> bytearray:
    bits = _BackBits(data)
    out = bytearray()
    for _ in range(count):
        sym, nb = table[bits.peek(max_bits)]
        if nb > bits.pos:
            raise ValueError("zstd: huffman stream over-read")
        bits.pos -= nb
        out.append(sym)
    if bits.pos != 0:
        raise ValueError("zstd: huffman stream not fully consumed")
    return out


# ---------------------------------------------------------------------------
# Sequences: predefined distributions + code→value tables (RFC 8878)
# ---------------------------------------------------------------------------

_LL_DEFAULTS = (
    [4, 3, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 1, 1, 1, 2, 2, 2, 2, 2, 2,
     2, 2, 2, 3, 2, 1, 1, 1, 1, 1, -1, -1, -1, -1],
    6,
)
_ML_DEFAULTS = (
    [1, 4, 3, 2, 2, 2, 2, 2, 2, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
     1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
     1, 1, -1, -1, -1, -1, -1, -1, -1],
    6,
)
_OF_DEFAULTS = (
    [1, 1, 1, 1, 1, 1, 2, 2, 2, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
     1, 1, -1, -1, -1, -1, -1],
    5,
)

_LL_BASE = [
    0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15,
    16, 18, 20, 22, 24, 28, 32, 40, 48, 64, 128, 256, 512, 1024,
    2048, 4096, 8192, 16384, 32768, 65536,
]
_LL_BITS = [
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    1, 1, 1, 1, 2, 2, 3, 3, 4, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16,
]
_ML_BASE = [
    3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16, 17, 18, 19, 20,
    21, 22, 23, 24, 25, 26, 27, 28, 29, 30, 31, 32, 33, 34,
    35, 37, 39, 41, 43, 47, 51, 59, 67, 83, 99, 131, 259, 515, 1027,
    2051, 4099, 8195, 16387, 32771, 65539,
]
_ML_BITS = [
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    1, 1, 1, 1, 2, 2, 3, 3, 4, 4, 5, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16,
]

_PREDEF = {
    "ll": _fse_build_dtable(*_LL_DEFAULTS),
    "ml": _fse_build_dtable(*_ML_DEFAULTS),
    "of": _fse_build_dtable(*_OF_DEFAULTS),
}
_PREDEF_AL = {"ll": 6, "ml": 6, "of": 5}
_MAX_AL = {"ll": 9, "ml": 9, "of": 8}
_MAX_CODE = {"ll": 35, "ml": 52, "of": 31}


class _FrameCtx:
    """Per-frame decoder state the spec carries across blocks: the
    last huffman table (Treeless literals), the last LL/OF/ML FSE
    tables (Repeat_Mode) and the three repeat offsets."""

    def __init__(self) -> None:
        self.huff: tuple[list[tuple[int, int]], int] | None = None
        self.fse: dict[str, tuple[list[tuple[int, int, int]], int]] = {}
        self.reps = [1, 4, 8]


def _decode_literals(
    blk: bytes, ctx: _FrameCtx
) -> tuple[bytes, int]:
    """Literals_Section → (regenerated literals, bytes consumed)."""
    if not blk:
        raise ValueError("zstd: empty compressed block")
    b0 = blk[0]
    ltype = b0 & 3
    sizefmt = (b0 >> 2) & 3
    if ltype in (0, 1):  # Raw / RLE
        if sizefmt in (0, 2):
            rsize, hlen = b0 >> 3, 1
        elif sizefmt == 1:
            if len(blk) < 2:
                raise ValueError("zstd: truncated literals header")
            rsize, hlen = int.from_bytes(blk[:2], "little") >> 4, 2
        else:
            if len(blk) < 3:
                raise ValueError("zstd: truncated literals header")
            rsize, hlen = int.from_bytes(blk[:3], "little") >> 4, 3
        if ltype == 0:
            if hlen + rsize > len(blk):
                raise ValueError("zstd: truncated raw literals")
            return bytes(blk[hlen : hlen + rsize]), hlen + rsize
        if hlen + 1 > len(blk):
            raise ValueError("zstd: truncated RLE literal")
        return bytes(blk[hlen : hlen + 1]) * rsize, hlen + 1
    # Compressed (2) / Treeless (3)
    if sizefmt == 0:
        hlen, sbits, streams = 3, 10, 1
    elif sizefmt == 1:
        hlen, sbits, streams = 3, 10, 4
    elif sizefmt == 2:
        hlen, sbits, streams = 4, 14, 4
    else:
        hlen, sbits, streams = 5, 18, 4
    if len(blk) < hlen:
        raise ValueError("zstd: truncated literals header")
    h = int.from_bytes(blk[:hlen], "little")
    rsize = (h >> 4) & ((1 << sbits) - 1)
    csize = (h >> (4 + sbits)) & ((1 << sbits) - 1)
    if hlen + csize > len(blk):
        raise ValueError("zstd: truncated compressed literals")
    payload = blk[hlen : hlen + csize]
    if ltype == 2:
        table, max_bits, used = _read_huff_tree(payload)
        ctx.huff = (table, max_bits)
        payload = payload[used:]
    else:
        if ctx.huff is None:
            raise ValueError("zstd: treeless literals with no prior table")
        table, max_bits = ctx.huff
    if streams == 1:
        lit = _huff_decode_stream(payload, table, max_bits, rsize)
    else:
        if len(payload) < 6:
            raise ValueError("zstd: truncated huffman jump table")
        s1, s2, s3 = struct.unpack_from("<HHH", payload, 0)
        body = payload[6:]
        if s1 + s2 + s3 > len(body):
            raise ValueError("zstd: huffman jump table exceeds payload")
        r123 = (rsize + 3) // 4
        r4 = rsize - 3 * r123
        if r4 < 0:
            raise ValueError("zstd: 4-stream literals smaller than 4")
        parts = (
            body[:s1],
            body[s1 : s1 + s2],
            body[s1 + s2 : s1 + s2 + s3],
            body[s1 + s2 + s3 :],
        )
        lit = bytearray()
        for part, cnt in zip(parts, (r123, r123, r123, r4)):
            lit += _huff_decode_stream(part, table, max_bits, cnt)
    if len(lit) != rsize:
        raise ValueError("zstd: literals size mismatch")
    return bytes(lit), hlen + csize


def _sequence_table(
    kind: str, mode: int, sec: bytes, pos: int, ctx: _FrameCtx
) -> tuple[tuple[list[tuple[int, int, int]], int], int]:
    if mode == 0:  # Predefined_Mode
        table = (_PREDEF[kind], _PREDEF_AL[kind])
    elif mode == 1:  # RLE_Mode
        if pos >= len(sec):
            raise ValueError("zstd: truncated RLE symbol")
        sym = sec[pos]
        pos += 1
        if sym > _MAX_CODE[kind]:
            raise ValueError(f"zstd: {kind} RLE symbol out of range")
        table = (_rle_table(sym), 0)
    elif mode == 2:  # FSE_Compressed_Mode
        fwd = _FwdBits(sec[pos:])
        counts, accuracy = _fse_read_ncount(
            fwd, _MAX_AL[kind], _MAX_CODE[kind]
        )
        if len(counts) - 1 > _MAX_CODE[kind]:
            raise ValueError(f"zstd: {kind} symbol out of range")
        table = (_fse_build_dtable(counts, accuracy), accuracy)
        pos += fwd.bytes_used()
    else:  # Repeat_Mode
        if kind not in ctx.fse:
            raise ValueError("zstd: repeat mode with no prior table")
        table = ctx.fse[kind]
    ctx.fse[kind] = table
    return table, pos


def _decode_sequences(
    sec: bytes, ctx: _FrameCtx
) -> list[tuple[int, int, int]]:
    """Sequences_Section → [(literals_length, match_length, offset)]
    with repeat-offset resolution applied."""
    if not sec:
        raise ValueError("zstd: missing sequences section")
    b0 = sec[0]
    if b0 == 0:
        if len(sec) != 1:
            raise ValueError("zstd: trailing bytes after empty sequences")
        return []
    if b0 < 128:
        nseq, pos = b0, 1
    elif b0 < 255:
        if len(sec) < 2:
            raise ValueError("zstd: truncated sequence count")
        nseq, pos = ((b0 - 128) << 8) | sec[1], 2
    else:
        if len(sec) < 3:
            raise ValueError("zstd: truncated sequence count")
        nseq, pos = int.from_bytes(sec[1:3], "little") + 0x7F00, 3
    if pos >= len(sec):
        raise ValueError("zstd: truncated compression modes")
    modes = sec[pos]
    pos += 1
    if modes & 3:
        raise ValueError("zstd: reserved compression-mode bits set")
    (ll_t, ll_al), pos = _sequence_table("ll", (modes >> 6) & 3, sec, pos, ctx)
    (of_t, of_al), pos = _sequence_table("of", (modes >> 4) & 3, sec, pos, ctx)
    (ml_t, ml_al), pos = _sequence_table("ml", (modes >> 2) & 3, sec, pos, ctx)
    bits = _BackBits(sec[pos:])
    ll_s = _FseState(ll_t, ll_al, bits)
    of_s = _FseState(of_t, of_al, bits)
    ml_s = _FseState(ml_t, ml_al, bits)
    seqs = []
    for i in range(nseq):
        of_code = of_s.symbol()
        ml_code = ml_s.symbol()
        ll_code = ll_s.symbol()
        if (
            of_code > _MAX_CODE["of"]
            or ml_code > _MAX_CODE["ml"]
            or ll_code > _MAX_CODE["ll"]
        ):
            raise ValueError("zstd: sequence code out of range")
        offset_value = (1 << of_code) + bits.take(of_code)
        ml = _ML_BASE[ml_code] + bits.take(_ML_BITS[ml_code])
        ll = _LL_BASE[ll_code] + bits.take(_LL_BITS[ll_code])
        reps = ctx.reps
        if offset_value > 3:
            offset = offset_value - 3
            ctx.reps = [offset, reps[0], reps[1]]
        else:
            idx = offset_value - 1 + (1 if ll == 0 else 0)
            if idx == 0:
                offset = reps[0]
            elif idx == 1:
                offset = reps[1]
                ctx.reps = [offset, reps[0], reps[2]]
            elif idx == 2:
                offset = reps[2]
                ctx.reps = [offset, reps[0], reps[1]]
            else:
                offset = reps[0] - 1
                ctx.reps = [offset, reps[0], reps[1]]
            if offset == 0:
                raise ValueError("zstd: repeat offset resolved to zero")
        seqs.append((ll, ml, offset))
        if i != nseq - 1:  # states are not updated after the last seq
            ll_s.update(bits)
            ml_s.update(bits)
            of_s.update(bits)
    if bits.pos != 0:
        raise ValueError("zstd: sequence bitstream not fully consumed")
    return seqs


def _decode_block(
    blk: bytes,
    out: bytearray,
    ctx: _FrameCtx,
    block_max: int,
    max_out: int,
    frame_start: int,
) -> None:
    literals, used = _decode_literals(blk, ctx)
    seqs = _decode_sequences(blk[used:], ctx)
    produced = 0
    lit_pos = 0
    base = len(out)
    for ll, ml, offset in seqs:
        if lit_pos + ll > len(literals):
            raise ValueError("zstd: literals over-consumed")
        produced += ll + ml
        if produced > block_max:
            raise ValueError("zstd: block regenerates beyond maximum")
        if base + produced > max_out:
            raise ValueError("zstd: output exceeds max_out bound")
        out += literals[lit_pos : lit_pos + ll]
        lit_pos += ll
        # Matches may only reach back into the CURRENT frame's output
        # (RFC 8878 §3.1.1.4: the window never crosses a frame boundary
        # without a dictionary, which this decoder rejects).
        if offset > len(out) - frame_start:
            raise ValueError("zstd: match offset outside window")
        for _ in range(ml):  # overlap-correct byte copy
            out.append(out[-offset])
    rest = len(literals) - lit_pos
    produced += rest
    if produced > block_max:
        raise ValueError("zstd: block regenerates beyond maximum")
    if base + produced > max_out:
        raise ValueError("zstd: output exceeds max_out bound")
    out += literals[lit_pos:]


def _decode_frame(
    buf: bytes, pos: int, out: bytearray, max_out: int
) -> int:
    """One zstd frame starting at ``pos`` (past the magic) → next pos."""
    if pos >= len(buf):
        raise ValueError("zstd: truncated frame header")
    fhd = buf[pos]
    pos += 1
    if fhd & 0x08:
        raise ValueError("zstd: reserved frame-header bit set")
    single_segment = bool(fhd & 0x20)
    has_checksum = bool(fhd & 0x04)
    did_flag = fhd & 3
    fcs_flag = fhd >> 6
    window = None
    if not single_segment:
        if pos >= len(buf):
            raise ValueError("zstd: truncated window descriptor")
        wd = buf[pos]
        pos += 1
        wbase = 1 << (10 + (wd >> 3))
        window = wbase + (wbase // 8) * (wd & 7)
    did_size = (0, 1, 2, 4)[did_flag]
    if did_size:
        if pos + did_size > len(buf):
            raise ValueError("zstd: truncated dictionary id")
        if int.from_bytes(buf[pos : pos + did_size], "little"):
            raise ValueError("zstd: dictionaries not supported")
        pos += did_size
    fcs_size = (1 if single_segment else 0, 2, 4, 8)[fcs_flag]
    fcs = None
    if fcs_size:
        if pos + fcs_size > len(buf):
            raise ValueError("zstd: truncated frame content size")
        fcs = int.from_bytes(buf[pos : pos + fcs_size], "little")
        if fcs_size == 2:
            fcs += 256
        pos += fcs_size
    if single_segment:
        window = fcs
    if window is None:
        raise ValueError("zstd: frame declares no window")
    if window > _WINDOW_HARD_MAX:
        raise ValueError("zstd: window size beyond supported maximum")
    block_max = min(window, _BLOCK_HARD_MAX) or 1
    ctx = _FrameCtx()
    frame_start = len(out)
    while True:
        if pos + 3 > len(buf):
            raise ValueError("zstd: truncated block header")
        bh = int.from_bytes(buf[pos : pos + 3], "little")
        pos += 3
        last = bh & 1
        btype = (bh >> 1) & 3
        bsize = bh >> 3
        if btype == 3:
            raise ValueError("zstd: reserved block type")
        if btype == 1:  # RLE: bsize = regenerated size, content 1 byte
            if bsize > block_max:
                raise ValueError("zstd: block regenerates beyond maximum")
            if pos + 1 > len(buf):
                raise ValueError("zstd: truncated RLE block")
            if len(out) + bsize > max_out:
                raise ValueError("zstd: output exceeds max_out bound")
            out += buf[pos : pos + 1] * bsize
            pos += 1
        else:
            if bsize > block_max:
                raise ValueError("zstd: block size beyond maximum")
            if pos + bsize > len(buf):
                raise ValueError("zstd: truncated block")
            blk = buf[pos : pos + bsize]
            pos += bsize
            if btype == 0:
                if len(out) + bsize > max_out:
                    raise ValueError("zstd: output exceeds max_out bound")
                out += blk
            else:
                _decode_block(blk, out, ctx, block_max, max_out, frame_start)
        if last:
            break
    if fcs is not None and len(out) - frame_start != fcs:
        raise ValueError("zstd: frame content size mismatch")
    if has_checksum:
        if pos + 4 > len(buf):
            raise ValueError("zstd: truncated content checksum")
        want = int.from_bytes(buf[pos : pos + 4], "little")
        pos += 4
        if xxh64(bytes(out[frame_start:])) & 0xFFFFFFFF != want:
            raise ValueError("zstd: content checksum mismatch")
    return pos


def decompress_zstd(buf: bytes, max_out: int = 1 << 26) -> bytes:
    """Decode a sequence of zstd frames (skippable frames skipped),
    strict: magics, reserved bits, block framing, bitstream
    consumption, declared content sizes and XXH64 checksums are ALL
    verified; trailing bytes are malformed. ``max_out`` bounds decoded
    output (distinct refusal message — zstd-bomb guard)."""
    if len(buf) < 4:
        raise ValueError("zstd: input shorter than a frame magic")
    out = bytearray()
    pos = 0
    saw_frame = False
    while pos < len(buf):
        if pos + 4 > len(buf):
            raise ValueError("zstd: trailing bytes after final frame")
        magic = int.from_bytes(buf[pos : pos + 4], "little")
        if _SKIP_MAGIC_LO <= magic <= _SKIP_MAGIC_HI:
            if pos + 8 > len(buf):
                raise ValueError("zstd: truncated skippable frame")
            fsize = int.from_bytes(buf[pos + 4 : pos + 8], "little")
            if pos + 8 + fsize > len(buf):
                raise ValueError("zstd: truncated skippable frame")
            pos += 8 + fsize
            continue
        if buf[pos : pos + 4] != _MAGIC:
            raise ValueError("zstd: bad magic")
        pos = _decode_frame(buf, pos + 4, out, max_out)
        saw_frame = True
    if not saw_frame:
        raise ValueError("zstd: no data frame present")
    return bytes(out)


# ---------------------------------------------------------------------------
# Encoder: Raw_Block frames (the zstd analog of stored DEFLATE)
# ---------------------------------------------------------------------------


def compress_zstd_raw(data: bytes, checksum: bool = True) -> bytes:
    """A spec-valid single-frame zstd stream of Raw_Blocks with
    Frame_Content_Size and (by default) the XXH64 content checksum —
    no entropy coding, decodable by ANY zstd implementation."""
    n = len(data)
    if n < 256:
        fcs_flag, fcs_bytes = 0, n.to_bytes(1, "little")
    elif n < 65536 + 256:
        fcs_flag, fcs_bytes = 1, (n - 256).to_bytes(2, "little")
    elif n < 1 << 32:
        fcs_flag, fcs_bytes = 2, n.to_bytes(4, "little")
    else:
        fcs_flag, fcs_bytes = 3, n.to_bytes(8, "little")
    fhd = (fcs_flag << 6) | 0x20 | (0x04 if checksum else 0)
    out = bytearray(_MAGIC)
    out.append(fhd)
    out += fcs_bytes
    if n == 0:
        out += (1).to_bytes(3, "little")  # last=1, Raw, size 0
    else:
        pos = 0
        while pos < n:
            chunk = data[pos : pos + _BLOCK_HARD_MAX]
            pos += len(chunk)
            bh = (len(chunk) << 3) | (1 if pos >= n else 0)
            out += bh.to_bytes(3, "little")
            out += chunk
    if checksum:
        out += (xxh64(data) & 0xFFFFFFFF).to_bytes(4, "little")
    return bytes(out)


# ---------------------------------------------------------------------------
# Compressed-block ENCODER (RFC 8878 write side): huff0 literals with
# direct or FSE-compressed weights, zero sequences. Literals-only
# compression is spec-valid — every block is Raw/RLE/Compressed,
# whichever is smallest — and any conforming decoder (libzstd included)
# reads the output; tests pin both directions against pyarrow's real
# libzstd. No reference implementation consulted; written from the RFC
# against this module's own from-scratch decoder.
# ---------------------------------------------------------------------------


def _huff_lengths(freqs: dict[int, int], max_bits: int = 11) -> dict[int, int]:
    """Package-merge: optimal length-limited prefix code lengths for
    the used symbols (≥ 2 of them), every length ≤ ``max_bits``."""
    syms = sorted(freqs)
    if len(syms) < 2:
        raise ValueError("huffman needs at least two symbols")
    if len(syms) > (1 << max_bits):
        raise ValueError("alphabet exceeds code space")
    # coins: at each level, items are (weight, {sym: count}) merged pairwise
    lengths = dict.fromkeys(syms, 0)
    level = [(freqs[s], (s,)) for s in syms]
    level.sort()
    solution: list[tuple[int, tuple]] = []
    packages: list[tuple[int, tuple]] = []
    for _ in range(max_bits):
        merged = sorted(level + packages)
        packages = [
            (
                merged[i][0] + merged[i + 1][0],
                merged[i][1] + merged[i + 1][1],
            )
            for i in range(0, len(merged) - 1, 2)
        ]
        solution = merged
        level = [(freqs[s], (s,)) for s in syms]
    # take the first 2*(n-1) items of the final merged row
    take = 2 * (len(syms) - 1)
    for _w, members in solution[:take]:
        for s in members:
            lengths[s] += 1
    if any(v == 0 or v > max_bits for v in lengths.values()):
        raise ValueError("package-merge produced invalid lengths")
    return lengths


def _huff_codes(
    weights: list[int],
) -> tuple[dict[int, tuple[int, int]], int]:
    """Full weight vector (incl. the last symbol's) → {sym: (code,
    nbits)} matching :func:`_huff_table_from_weights` exactly, plus
    max_bits."""
    total = sum((1 << (w - 1)) for w in weights if w > 0)
    max_bits = total.bit_length() - 1
    if (1 << max_bits) != total:
        raise ValueError("huffman weights do not complete a power of 2")
    codes: dict[int, tuple[int, int]] = {}
    pos = 0
    for w in range(1, max_bits + 1):
        span = 1 << (w - 1)
        nb = max_bits + 1 - w
        for sym, sw in enumerate(weights):
            if sw == w:
                codes[sym] = (pos >> (w - 1), nb)
                pos += span
    return codes, max_bits


class _BitAcc:
    """Backward-bitstream builder: values are pushed in DECODER READ
    order and serialized little-endian with the sentinel on top —
    the exact inverse of :class:`_BackBits`. Pushes are buffered and
    the byte stream is materialized in one reversed LSB-first pass
    that flushes completed low bytes as it goes (the last-pushed value
    occupies the lowest bits, so reverse replay emits bytes in final
    order), keeping serialization linear in stream length instead of
    the O(n^2) single growing big-int shift-or."""

    __slots__ = ("_parts", "nbits")

    def __init__(self) -> None:
        self._parts: list[tuple[int, int]] = []
        self.nbits = 1  # the padding sentinel

    def push(self, value: int, nbits: int) -> None:
        if value >> nbits:
            raise ValueError("bit value wider than field")
        self._parts.append((value, nbits))
        self.nbits += nbits

    def bytes(self) -> bytes:
        out = bytearray()
        acc = 0
        fill = 0
        for value, nb in reversed(self._parts):
            acc |= value << fill
            fill += nb
            while fill >= 8:
                out.append(acc & 0xFF)
                acc >>= 8
                fill -= 8
        acc |= 1 << fill  # the padding sentinel rides on top
        fill += 1
        while fill > 0:
            out.append(acc & 0xFF)
            acc >>= 8
            fill -= 8
        return bytes(out)


class _FwdAcc:
    """Forward LSB-first bit writer — the inverse of :class:`_FwdBits`."""

    __slots__ = ("acc", "nbits")

    def __init__(self) -> None:
        self.acc = 0
        self.nbits = 0

    def push(self, value: int, nbits: int) -> None:
        self.acc |= (value & ((1 << nbits) - 1)) << self.nbits
        self.nbits += nbits

    def bytes(self) -> bytes:
        return self.acc.to_bytes((self.nbits + 7) // 8 or 1, "little")


def _fse_normalize(freqs: dict[int, int], accuracy: int) -> list[int]:
    """Histogram → normalized counts summing to 2^accuracy, every used
    symbol ≥ 1 and ≤ 2^(accuracy-1) (the cap keeps every decode-table
    cell at nbBits ≥ 1, which the two-state weight codec relies on for
    clean stream termination)."""
    size = 1 << accuracy
    cap = size >> 1
    total = sum(freqs.values())
    last = max(freqs)
    counts = [0] * (last + 1)
    for s, f in freqs.items():
        counts[s] = max(1, min(cap, (f * size) // total))
    diff = size - sum(counts)
    order = sorted(freqs, key=lambda s: -freqs[s])
    i = 0
    guard = 0
    while diff != 0:
        s = order[i % len(order)]
        if diff > 0 and counts[s] < cap:
            counts[s] += 1
            diff -= 1
        elif diff < 0 and counts[s] > 1:
            counts[s] -= 1
            diff += 1
        i += 1
        guard += 1
        if guard > 16 * size:
            raise ValueError("FSE normalization did not converge")
    return counts


def _fse_write_ncount(counts: list[int], accuracy: int) -> bytes:
    """Normalized counts → the §4.1.1 table description (forward
    bitstream, byte-padded) — the exact inverse of
    :func:`_fse_read_ncount` (no less-than-one counts emitted)."""
    bits = _FwdAcc()
    bits.push(accuracy - 5, 4)
    remaining = (1 << accuracy) + 1
    threshold = 1 << accuracy
    nbits = accuracy + 1
    i = 0
    while remaining > 1 and i < len(counts):
        c = counts[i]
        x = c + 1
        max_small = (2 * threshold - 1) - remaining
        if x < max_small:
            bits.push(x, nbits - 1)
        elif x < threshold:
            bits.push(x, nbits)
        else:  # high range rides offset by max_small (mirror of decode)
            if x + max_small >= 2 * threshold:
                raise ValueError("FSE count exceeds threshold")
            bits.push(x + max_small, nbits)
        remaining -= c
        i += 1
        if c == 0:
            # repeat flags for runs of zeros
            while i < len(counts):
                run = 0
                while run < 3 and i + run < len(counts) and counts[i + run] == 0:
                    run += 1
                bits.push(run, 2)
                i += run
                if run != 3:
                    break
        while remaining < threshold and remaining > 1:
            nbits -= 1
            threshold >>= 1
    if remaining != 1:
        raise ValueError("FSE counts do not fill the table")
    return bits.bytes()


def _fse_encode_two_state(
    symbols: list[int], counts: list[int], accuracy: int
) -> bytes:
    """Encode ``symbols`` for the two-interleaved-state decoder in
    :func:`_read_huff_tree`: backward pass chooses, for each emission,
    the decode-table cell whose (baseline, nbBits) window contains the
    NEXT same-state cell; init states ride first, raw."""
    table = _fse_build_dtable(counts, accuracy)
    by_symbol: dict[int, list[int]] = {}
    for cell, (s, _nb, _base) in enumerate(table):
        by_symbol.setdefault(s, []).append(cell)

    def predecessor(sym: int, nxt: int) -> tuple[int, int, int]:
        for cell in by_symbol[sym]:
            s, nb, base = table[cell]
            if base <= nxt < base + (1 << nb):
                return cell, nxt - base, nb
        raise ValueError("FSE encode: no predecessor state")

    m = len(symbols)
    if m < 2:
        raise ValueError("two-state FSE needs at least two symbols")
    # stream 1 = even emission indices, stream 2 = odd
    state = [None, None]  # current (later-in-time) cell per stream
    updates: list[tuple[int, int, int]] = []  # (emission idx, bits, nb)
    for i in range(m - 1, -1, -1):
        st = i & 1
        sym = symbols[i]
        if state[st] is None:
            state[st] = by_symbol[sym][0]  # last emission: free choice
        else:
            cell, bits_val, nb = predecessor(sym, state[st])
            updates.append((i, bits_val, nb))
            state[st] = cell
    acc = _BitAcc()
    acc.push(state[0], accuracy)  # init1 (emits symbols[0])
    acc.push(state[1], accuracy)  # init2 (emits symbols[1])
    # decoder reads updates in emission order of their TARGET (i = 2..m-1)
    for i, bits_val, nb in sorted(updates):
        acc.push(bits_val, nb)
    return acc.bytes()


def _encode_huff_tree(weights: list[int]) -> bytes:
    """Weight vector (all used symbols incl. the last) → the
    Huffman_Tree_Description. The LAST used symbol's weight is
    implicit; direct 4-bit form when ≤ 128 explicit weights, else the
    FSE-compressed form."""
    last_sym = max(s for s, w in enumerate(weights) if w > 0)
    explicit = weights[:last_sym]  # implicit: weights[last_sym]
    n = len(explicit)
    direct = None
    if 0 < n <= 128:
        body = bytearray()
        for i in range(0, n, 2):
            hi = explicit[i] << 4
            lo = explicit[i + 1] if i + 1 < n else 0
            body.append(hi | lo)
        direct = bytes([127 + n]) + bytes(body)
    fse = None
    freqs: dict[int, int] = {}
    for w in explicit:
        freqs[w] = freqs.get(w, 0) + 1
    if len(freqs) >= 2 and n >= 2:
        accuracy = 6
        counts = _fse_normalize(freqs, accuracy)
        payload = _fse_write_ncount(counts, accuracy) + _fse_encode_two_state(
            explicit, counts, accuracy
        )
        if len(payload) < 128:
            fse = bytes([len(payload)]) + payload
    if direct is None and fse is None:
        raise ValueError("huffman tree not representable")
    if fse is not None and (direct is None or len(fse) < len(direct)):
        return fse
    return direct


def _huff_encode_stream(
    data: bytes, codes: dict[int, tuple[int, int]]
) -> bytes:
    acc = _BitAcc()
    for b in data:
        code, nb = codes[b]
        acc.push(code, nb)
    return acc.bytes()


def _compress_literals(chunk: bytes) -> bytes | None:
    """Compressed_Literals_Block (type 2) for ``chunk``, or None when
    entropy coding does not win."""
    freqs: dict[int, int] = {}
    for b in chunk:
        freqs[b] = freqs.get(b, 0) + 1
    if len(freqs) < 2:
        return None
    lengths = _huff_lengths(freqs, 11)
    max_len = max(lengths.values())
    weights = [0] * 256
    for s, ln in lengths.items():
        weights[s] = max_len + 1 - ln
    weights = weights[: max(lengths) + 1]
    try:
        tree = _encode_huff_tree(weights)
    except ValueError:
        # e.g. a uniform >128-symbol alphabet: one distinct weight, so
        # neither the direct nor the FSE form applies — raw block wins
        return None
    codes, _mb = _huff_codes(weights)
    rsize = len(chunk)
    if rsize <= 1023:
        streams = _huff_encode_stream(chunk, codes)
        csize = len(tree) + len(streams)
        if csize >= 1 << 10:
            return None
        h = 2 | (0 << 2) | (rsize << 4) | (csize << 14)
        return h.to_bytes(3, "little") + tree + streams
    # 4-stream layout with the 6-byte jump table
    r123 = (rsize + 3) // 4
    parts = [
        chunk[0:r123],
        chunk[r123 : 2 * r123],
        chunk[2 * r123 : 3 * r123],
        chunk[3 * r123 :],
    ]
    encoded = [_huff_encode_stream(p, codes) for p in parts]
    if any(not e for e in encoded):
        return None
    if any(len(e) > 0xFFFF for e in encoded[:3]):
        return None  # jump-table entries are u16; raw block wins
    jump = struct.pack("<HHH", len(encoded[0]), len(encoded[1]), len(encoded[2]))
    body = tree + jump + b"".join(encoded)
    csize = len(body)
    if rsize < 1 << 14 and csize < 1 << 14:
        sizefmt, hlen, sbits = 2, 4, 14
    elif rsize < 1 << 18 and csize < 1 << 18:
        sizefmt, hlen, sbits = 3, 5, 18
    else:
        return None
    h = 2 | (sizefmt << 2) | (rsize << 4) | (csize << (4 + sbits))
    return h.to_bytes(hlen, "little") + body


_PREDEF_INDEX: dict[str, dict[int, list[int]]] = {}


def _predef_index(kind: str) -> dict[int, list[int]]:
    """symbol → [cells] for a predefined decode table (encoder side)."""
    idx = _PREDEF_INDEX.get(kind)
    if idx is None:
        idx = {}
        for cell, (s, _nb, _base) in enumerate(_PREDEF[kind]):
            idx.setdefault(s, []).append(cell)
        _PREDEF_INDEX[kind] = idx
    return idx


def _fse_choose_cells(codes: list[int], kind: str):
    """Backward state-selection pass for ONE FSE stream against the
    predefined table: returns (initial cell, [(delta, nb)] transition
    bits the decoder reads at update i to move from cell i to cell
    i+1). The FSE construction guarantees each (symbol, next-state)
    pair has exactly one predecessor cell — the (baseline, 1 << nb)
    windows of a symbol's cells tile the whole table."""
    table = _PREDEF[kind]
    by_symbol = _predef_index(kind)
    n = len(codes)
    cur = by_symbol[codes[n - 1]][0]  # last emission: free choice
    trans: list[tuple[int, int] | None] = [None] * (n - 1)
    for i in range(n - 2, -1, -1):
        for cell in by_symbol[codes[i]]:
            _s, nb, base = table[cell]
            if base <= cur < base + (1 << nb):
                trans[i] = (cur - base, nb)
                cur = cell
                break
        else:
            raise ValueError("zstd: FSE encode found no predecessor")
    return cur, trans


def _code_of(bases: list[int], value: int) -> int:
    import bisect

    return bisect.bisect_right(bases, value) - 1


def _encode_sequences(
    seqs: list[tuple[int, int, int]],
    reps: list[int] | None = None,
) -> tuple[bytes, list[int]]:
    """[(literals_length, match_length, offset)] → (the complete
    Sequences_Section with all three symbol types in Predefined_Mode
    (RFC 8878 §3.1.1.3.2.1.1), updated repeat offsets) — the exact
    inverse of :func:`_decode_sequences` for mode-0 streams. ``reps``
    is the frame's repeat-offset state (persists ACROSS blocks, init
    [1, 4, 8]); an offset matching a recent one emits offset_value
    1-3 — zero or near-zero extra bits — mirroring the decoder's
    resolution rules exactly (the ll == 0 index shift means repeat
    codes are only used when ll > 0)."""
    reps = [1, 4, 8] if reps is None else list(reps)
    nseq = len(seqs)
    if nseq == 0:
        return b"\x00", reps
    if nseq < 128:
        head = bytes([nseq])
    elif nseq < 0x7F00:
        head = bytes([128 | (nseq >> 8), nseq & 0xFF])
    else:
        head = b"\xff" + (nseq - 0x7F00).to_bytes(2, "little")
    head += b"\x00"  # Symbol_Compression_Modes: all Predefined_Mode
    ll_codes, ml_codes, of_codes = [], [], []
    extras = []  # (of_extra, of_nb, ml_extra, ml_nb, ll_extra, ll_nb)
    for ll, ml, offset in seqs:
        if ll != 0 and offset == reps[0]:
            ov = 1  # repeat offset 1: reps unchanged
        elif ll != 0 and offset == reps[1]:
            ov = 2
            reps = [offset, reps[0], reps[2]]
        elif ll != 0 and offset == reps[2]:
            ov = 3
            reps = [offset, reps[0], reps[1]]
        else:
            ov = offset + 3
            reps = [offset, reps[0], reps[1]]
        of_c = ov.bit_length() - 1
        ml_c = _code_of(_ML_BASE, ml)
        ll_c = _code_of(_LL_BASE, ll)
        if of_c > 28 or ml_c > 52 or ll_c > 35:
            raise ValueError("zstd: sequence exceeds predefined tables")
        of_codes.append(of_c)
        ml_codes.append(ml_c)
        ll_codes.append(ll_c)
        extras.append(
            (
                ov - (1 << of_c),
                of_c,
                ml - _ML_BASE[ml_c],
                _ML_BITS[ml_c],
                ll - _LL_BASE[ll_c],
                _LL_BITS[ll_c],
            )
        )
    ll_init, ll_tr = _fse_choose_cells(ll_codes, "ll")
    of_init, of_tr = _fse_choose_cells(of_codes, "of")
    ml_init, ml_tr = _fse_choose_cells(ml_codes, "ml")
    acc = _BitAcc()  # pushes ride in DECODER READ order
    acc.push(ll_init, _PREDEF_AL["ll"])
    acc.push(of_init, _PREDEF_AL["of"])
    acc.push(ml_init, _PREDEF_AL["ml"])
    for i in range(nseq):
        of_x, of_nb, ml_x, ml_nb, ll_x, ll_nb = extras[i]
        acc.push(of_x, of_nb)
        acc.push(ml_x, ml_nb)
        acc.push(ll_x, ll_nb)
        if i != nseq - 1:  # states are not updated after the last seq
            acc.push(ll_tr[i][0], ll_tr[i][1])
            acc.push(ml_tr[i][0], ml_tr[i][1])
            acc.push(of_tr[i][0], of_tr[i][1])
    return head + acc.bytes(), reps


def _raw_literals_section(lit: bytes) -> bytes:
    n = len(lit)
    if n < 32:
        return bytes([n << 3]) + lit  # 1-byte header, Size_Format 0
    if n < 4096:
        return ((n << 4) | 0x04).to_bytes(2, "little") + lit
    return ((n << 4) | 0x0C).to_bytes(3, "little") + lit  # 20-bit size


def _find_matches(
    data: bytes, lo: int, hi: int, table: dict
) -> tuple[list[tuple[int, int, int]], int]:
    """Greedy single-entry hash match finder over ``data[lo:hi]``
    (4-byte keys, verify-free because the key IS the prefix, matches
    may reach back across earlier blocks of the same frame — RFC 8878
    lets offsets span the whole frame window). Returns (sequences,
    trailing-literals start). The last 3 bytes of a block stay
    literal (spec: the last match must end before them)."""
    seqs = []
    i = anchor = lo
    last = hi - 3  # matches must not cover the final 3 bytes
    while i + 4 <= last:
        key = struct.unpack_from("<I", data, i)[0]
        cand = table.get(key, -1)
        table[key] = i
        if cand >= 0 and i - cand <= _WINDOW_HARD_MAX:
            max_ml = last - i
            ml = 4
            while ml < max_ml and data[cand + ml] == data[i + ml]:
                ml += 1
            seqs.append((i - anchor, ml, i - cand))
            # seed a few in-match positions so long repeats keep chaining
            step = 1 if ml < 32 else ml >> 3
            for j in range(i + 1, min(i + ml, len(data) - 4), step):
                table[struct.unpack_from("<I", data, j)[0]] = j
            i += ml
            anchor = i
        else:
            i += 1
    return seqs, anchor


def compress_zstd(data: bytes, checksum: bool = True) -> bytes:
    """A single-frame zstd stream with ENTROPY-CODED blocks: per
    128 KiB block, a greedy hash-chain LZ77 pass emits match/literal
    SEQUENCES (predefined FSE tables, §3.1.1.3.2.1.1) over
    huff0-compressed literals, falling back to a literals-only block,
    RLE, or Raw — whichever is smallest. Output is plain RFC 8878 —
    decodable by any conforming implementation (the tests pin it
    against libzstd via pyarrow AND the zstd CLI) and by this
    module's own :func:`decompress_zstd`."""
    n = len(data)
    if n < 256:
        fcs_flag, fcs_bytes = 0, n.to_bytes(1, "little")
    elif n < 65536 + 256:
        fcs_flag, fcs_bytes = 1, (n - 256).to_bytes(2, "little")
    elif n < 1 << 32:
        fcs_flag, fcs_bytes = 2, n.to_bytes(4, "little")
    else:
        fcs_flag, fcs_bytes = 3, n.to_bytes(8, "little")
    fhd = (fcs_flag << 6) | 0x20 | (0x04 if checksum else 0)
    out = bytearray(_MAGIC)
    out.append(fhd)
    out += fcs_bytes
    if n == 0:
        out += (1).to_bytes(3, "little")
    match_table: dict = {}  # frame-wide 4-byte-prefix hash table
    reps = [1, 4, 8]  # frame-wide repeat-offset state
    pos = 0
    while pos < n:
        blk_lo = pos
        blk_hi = min(pos + _BLOCK_HARD_MAX, n)
        chunk = data[blk_lo:blk_hi]
        pos = blk_hi
        last = 1 if pos >= n else 0
        if len(set(chunk)) == 1:
            out += ((len(chunk) << 3) | (1 << 1) | last).to_bytes(3, "little")
            out += chunk[:1]
            continue
        best = None  # smallest Compressed_Block body so far
        best_reps = reps  # reps advance ONLY if the seq block ships
        seqs, tail = _find_matches(data, blk_lo, blk_hi, match_table)
        if seqs:
            parts = []
            cur = blk_lo
            for ll, ml, _off in seqs:
                parts.append(data[cur : cur + ll])
                cur += ll + ml
            parts.append(data[tail:blk_hi])
            lits = b"".join(parts)
            lit_sec = _compress_literals(lits)
            raw_sec = _raw_literals_section(lits)
            if lit_sec is None or len(lit_sec) >= len(raw_sec):
                lit_sec = raw_sec
            seq_sec, seq_reps = _encode_sequences(seqs, reps)
            best = lit_sec + seq_sec
            best_reps = seq_reps
        literals = _compress_literals(chunk)
        if literals is not None and (
            best is None or len(literals) + 1 < len(best)
        ):
            best = literals + b"\x00"  # zero sequences
            best_reps = reps
        if best is not None and len(best) < len(chunk):
            reps = best_reps
            out += ((len(best) << 3) | (2 << 1) | last).to_bytes(3, "little")
            out += best
        else:
            out += ((len(chunk) << 3) | last).to_bytes(3, "little")
            out += chunk
    if checksum:
        out += (xxh64(data) & 0xFFFFFFFF).to_bytes(4, "little")
    return bytes(out)
