"""DEFLATE (RFC 1951) + gzip (RFC 1952) + zlib (RFC 1950) codec,
from scratch (S-ext wire transport).

THE ubiquitous wire compression: HTTP `Content-Encoding: gzip`,
carbon/graphite gzipped pickles, WARC record bodies, `.jsonl.gz`
training shards, parquet GZIP pages. Implemented directly from the
public RFCs (no zlib import anywhere in the decode/encode path; the
stdlib module appears ONLY in tests as the interop oracle):

- RFC 1951 bitstream: LSB-first bit packing; Huffman codes are packed
  MSB-of-code-first. Three block types — STORED (byte-aligned
  LEN/~LEN), FIXED Huffman (the spec's hardwired literal/distance
  code lengths), DYNAMIC Huffman (HLIT/HDIST/HCLEN header, the
  permuted code-length-code order, 16/17/18 run-length symbols).
- Canonical Huffman construction per §3.2.2 (count-by-length →
  next_code), decoded with per-length code dictionaries.
- LZ77 back-references: lengths 3..258 / distances 1..32768 through
  the spec's base+extra-bits tables; overlapping copies are byte-wise
  (RLE semantics, same as `sources/lz4.py`).
- RFC 1952 gzip member: magic/CM/FLG header with all four optional
  fields (FEXTRA/FNAME/FCOMMENT/FHCRC) parsed and validated, and the
  CRC-32 (IEEE reflected poly 0xEDB88320, from scratch — distinct
  from snappy framing's CRC-32C/Castagnoli) + ISIZE trailer checked.
- RFC 1950 zlib stream: CMF/FLG consistency check (the 31-divisor),
  FDICT rejected, Adler-32 trailer checked.

Decode discipline is this repo's codec contract: any malformed input
(truncated bits, NLEN mismatch, oversubscribed/incomplete Huffman
code, invalid symbol, distance past the produced output, bad CRC/
Adler/ISIZE, missing final block) raises a clean ``ValueError``, and
the ``max_out`` amplification bound refuses with a DISTINCT message
before producing unbounded output — DEFLATE's worst case is >1000:1,
the classic decompression bomb. The compressor emits one final
FIXED-Huffman block via a greedy 3-byte-hash matcher (the same shape
as the snappy/LZ4 encoders here); any spec-valid encoding is
acceptable, pinned by roundtrip property tests plus BOTH-direction
stdlib-zlib interop tests in ``tests/test_deflate.py``.

Pure Python, isolated inside Arrow-batched ``mapInPandas`` over whole
payload blobs (SURVEY §8 risk 3).
"""

from __future__ import annotations

import threading

# --- RFC 1951 constant tables -------------------------------------

_LEN_BASE = (
    3, 4, 5, 6, 7, 8, 9, 10, 11, 13, 15, 17, 19, 23, 27, 31, 35, 43,
    51, 59, 67, 83, 99, 115, 131, 163, 195, 227, 258,
)
_LEN_EXTRA = (
    0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 2, 2, 2, 2, 3, 3, 3, 3,
    4, 4, 4, 4, 5, 5, 5, 5, 0,
)
_DIST_BASE = (
    1, 2, 3, 4, 5, 7, 9, 13, 17, 25, 33, 49, 65, 97, 129, 193, 257,
    385, 513, 769, 1025, 1537, 2049, 3073, 4097, 6145, 8193, 12289,
    16385, 24577,
)
_DIST_EXTRA = (
    0, 0, 0, 0, 1, 1, 2, 2, 3, 3, 4, 4, 5, 5, 6, 6, 7, 7, 8, 8,
    9, 9, 10, 10, 11, 11, 12, 12, 13, 13,
)
# order in which code-length-code lengths appear in a dynamic header
_CLC_ORDER = (16, 17, 18, 0, 8, 7, 9, 6, 10, 5, 11, 4, 12, 3, 13, 2, 14, 1, 15)

# fixed literal/length code lengths (§3.2.6) and fixed distance lengths
_FIXED_LIT_LENGTHS = (8,) * 144 + (9,) * 112 + (7,) * 24 + (8,) * 8
_FIXED_DIST_LENGTHS = (5,) * 32


def _build_decode_tables(lengths) -> list[dict[int, int]]:
    """Canonical Huffman per RFC 1951 §3.2.2: per-bit-length dicts of
    {code: symbol}. Rejects oversubscribed codes; incomplete codes are
    accepted here (the fixed distance code is incomplete by spec) and
    surface as "invalid Huffman code" when an unassigned code is read.
    """
    max_len = max(lengths) if lengths else 0
    if max_len == 0:
        raise ValueError("deflate: empty Huffman code")
    bl_count = [0] * (max_len + 1)
    for ln in lengths:
        if ln:
            bl_count[ln] += 1
    code = 0
    next_code = [0] * (max_len + 1)
    for bits in range(1, max_len + 1):
        code = (code + bl_count[bits - 1]) << 1
        next_code[bits] = code
        if code + bl_count[bits] > (1 << bits):
            raise ValueError("deflate: oversubscribed Huffman code")
    tables: list[dict[int, int]] = [dict() for _ in range(max_len + 1)]
    for sym, ln in enumerate(lengths):
        if ln:
            tables[ln][next_code[ln]] = sym
            next_code[ln] += 1
    return tables


class _BitReader:
    """LSB-first bit reader over one bytes buffer."""

    __slots__ = ("buf", "pos", "bitbuf", "bitcnt")

    def __init__(self, buf: bytes, pos: int = 0) -> None:
        self.buf = buf
        self.pos = pos
        self.bitbuf = 0
        self.bitcnt = 0

    def bits(self, n: int) -> int:
        while self.bitcnt < n:
            if self.pos >= len(self.buf):
                raise ValueError("deflate: truncated bitstream")
            self.bitbuf |= self.buf[self.pos] << self.bitcnt
            self.pos += 1
            self.bitcnt += 8
        val = self.bitbuf & ((1 << n) - 1)
        self.bitbuf >>= n
        self.bitcnt -= n
        return val

    def align(self) -> None:
        self.bitbuf = 0
        self.bitcnt = 0

    def decode(self, tables: list[dict[int, int]]) -> int:
        """Read one Huffman-coded symbol (codes are MSB-first)."""
        code = 0
        for length in range(1, len(tables)):
            code = (code << 1) | self.bits(1)
            sym = tables[length].get(code)
            if sym is not None:
                return sym
        raise ValueError("deflate: invalid Huffman code")


def _read_dynamic_tables(br: _BitReader):
    hlit = br.bits(5) + 257
    hdist = br.bits(5) + 1
    hclen = br.bits(4) + 4
    clc_lengths = [0] * 19
    for i in range(hclen):
        clc_lengths[_CLC_ORDER[i]] = br.bits(3)
    clc = _build_decode_tables(clc_lengths)
    lengths: list[int] = []
    while len(lengths) < hlit + hdist:
        sym = br.decode(clc)
        if sym < 16:
            lengths.append(sym)
        elif sym == 16:
            if not lengths:
                raise ValueError("deflate: repeat with no prior length")
            lengths += [lengths[-1]] * (3 + br.bits(2))
        elif sym == 17:
            lengths += [0] * (3 + br.bits(3))
        else:  # 18
            lengths += [0] * (11 + br.bits(7))
    if len(lengths) != hlit + hdist:
        raise ValueError("deflate: code-length run overflows header counts")
    lit = _build_decode_tables(lengths[:hlit])
    dist_lengths = lengths[hlit:]
    if max(dist_lengths) == 0:
        # literal-only block: spec allows one distance code of zero
        # length; any distance reference is then malformed
        dist = None
    else:
        dist = _build_decode_tables(dist_lengths)
    return lit, dist


_FIXED_LIT_TABLES = _build_decode_tables(_FIXED_LIT_LENGTHS)
_FIXED_DIST_TABLES = _build_decode_tables(_FIXED_DIST_LENGTHS)


def inflate(buf: bytes, max_out: int = 1 << 26, *, _pos: int = 0):
    """Decode one raw DEFLATE stream (RFC 1951). Returns
    ``(data, end_pos)`` — the byte offset just past the stream, so
    container framings (gzip/zlib) can locate their trailers.

    ``ValueError`` on any malformation; output exceeding ``max_out``
    refuses with the DISTINCT message "exceeds max_out bound" (DEFLATE
    amplifies >1000:1, so the bound IS the bomb guard). Callers that
    know their payload should size the bound to it explicitly.
    """
    br = _BitReader(buf, _pos)
    out = bytearray()
    while True:
        bfinal = br.bits(1)
        btype = br.bits(2)
        if btype == 0:  # stored
            br.align()
            p = br.pos
            if p + 4 > len(buf):
                raise ValueError("deflate: truncated stored-block header")
            ln = int.from_bytes(buf[p : p + 2], "little")
            nlen = int.from_bytes(buf[p + 2 : p + 4], "little")
            if ln != (~nlen & 0xFFFF):
                raise ValueError("deflate: stored-block LEN/NLEN mismatch")
            p += 4
            if p + ln > len(buf):
                raise ValueError("deflate: truncated stored block")
            if len(out) + ln > max_out:
                raise ValueError("deflate: output exceeds max_out bound")
            out += buf[p : p + ln]
            br.pos = p + ln
        elif btype in (1, 2):
            if btype == 1:
                lit, dist = _FIXED_LIT_TABLES, _FIXED_DIST_TABLES
            else:
                lit, dist = _read_dynamic_tables(br)
            while True:
                sym = br.decode(lit)
                if sym < 256:
                    if len(out) + 1 > max_out:
                        raise ValueError(
                            "deflate: output exceeds max_out bound"
                        )
                    out.append(sym)
                elif sym == 256:
                    break
                else:
                    if sym > 285:
                        raise ValueError("deflate: invalid length symbol")
                    idx = sym - 257
                    mlen = _LEN_BASE[idx] + br.bits(_LEN_EXTRA[idx])
                    if dist is None:
                        raise ValueError(
                            "deflate: distance code in literal-only block"
                        )
                    dsym = br.decode(dist)
                    if dsym > 29:
                        raise ValueError("deflate: invalid distance symbol")
                    d = _DIST_BASE[dsym] + br.bits(_DIST_EXTRA[dsym])
                    if d > len(out):
                        raise ValueError(
                            "deflate: distance past start of output"
                        )
                    if len(out) + mlen > max_out:
                        raise ValueError(
                            "deflate: output exceeds max_out bound"
                        )
                    start = len(out) - d
                    if mlen <= d:  # non-overlapping: one slice
                        out += out[start : start + mlen]
                    else:  # overlapping copy: byte-wise RLE semantics
                        for i in range(mlen):
                            out.append(out[start + i])
        else:
            raise ValueError("deflate: reserved block type 3")
        if bfinal:
            return bytes(out), br.pos


# --- encoder: one final FIXED-Huffman block ------------------------

def _fixed_lit_code(sym: int) -> tuple[int, int]:
    """(code, nbits) for the fixed literal/length alphabet (§3.2.6)."""
    if sym < 144:
        return 0x30 + sym, 8
    if sym < 256:
        return 0x190 + (sym - 144), 9
    if sym < 280:
        return sym - 256, 7
    return 0xC0 + (sym - 280), 8


def _rev(code: int, nbits: int) -> int:
    r = 0
    for _ in range(nbits):
        r = (r << 1) | (code & 1)
        code >>= 1
    return r


class _BitWriter:
    __slots__ = ("out", "bitbuf", "bitcnt")

    def __init__(self) -> None:
        self.out = bytearray()
        self.bitbuf = 0
        self.bitcnt = 0

    def bits(self, val: int, n: int) -> None:
        self.bitbuf |= val << self.bitcnt
        self.bitcnt += n
        while self.bitcnt >= 8:
            self.out.append(self.bitbuf & 0xFF)
            self.bitbuf >>= 8
            self.bitcnt -= 8

    def huff(self, code: int, nbits: int) -> None:
        self.bits(_rev(code, nbits), nbits)

    def finish(self) -> bytes:
        if self.bitcnt:
            self.out.append(self.bitbuf & 0xFF)
        return bytes(self.out)


def _len_symbol(mlen: int) -> tuple[int, int, int]:
    """(length symbol, extra value, extra bits) for a match length."""
    for idx in range(len(_LEN_BASE) - 1, -1, -1):
        if mlen >= _LEN_BASE[idx]:
            # length 258 must use symbol 285 (0 extra), never 284+31
            if idx == len(_LEN_BASE) - 1 and mlen != 258:
                continue
            return 257 + idx, mlen - _LEN_BASE[idx], _LEN_EXTRA[idx]
    raise ValueError("deflate: match length out of range")


def _dist_symbol(d: int) -> tuple[int, int, int]:
    for idx in range(len(_DIST_BASE) - 1, -1, -1):
        if d >= _DIST_BASE[idx]:
            return idx, d - _DIST_BASE[idx], _DIST_EXTRA[idx]
    raise ValueError("deflate: distance out of range")


def deflate(data: bytes) -> bytes:
    """Encode one raw DEFLATE stream: a single final FIXED-Huffman
    block, greedy 3-byte-hash matching (lengths 3..258, distances
    ≤ 32768). Any spec decoder (including stdlib zlib with wbits=-15)
    accepts the output — pinned by interop tests."""
    bw = _BitWriter()
    bw.bits(1, 1)  # BFINAL
    bw.bits(1, 2)  # BTYPE = fixed Huffman
    n = len(data)
    table: dict[bytes, int] = {}
    i = 0
    while i < n:
        if i + 3 <= n:
            key = bytes(data[i : i + 3])
            cand = table.get(key)
            table[key] = i
            if cand is not None and i - cand <= 32768:
                cap = min(258, n - i)
                mlen = 3
                while mlen < cap and data[cand + mlen] == data[i + mlen]:
                    mlen += 1
                sym, extra, ebits = _len_symbol(mlen)
                code, nbits = _fixed_lit_code(sym)
                bw.huff(code, nbits)
                if ebits:
                    bw.bits(extra, ebits)
                dsym, dextra, debits = _dist_symbol(i - cand)
                bw.huff(dsym, 5)
                if debits:
                    bw.bits(dextra, debits)
                i += mlen
                continue
        code, nbits = _fixed_lit_code(data[i])
        bw.huff(code, nbits)
        i += 1
    code, nbits = _fixed_lit_code(256)  # end of block
    bw.huff(code, nbits)
    return bw.finish()


# --- CRC-32 (IEEE, reflected 0xEDB88320) and Adler-32 ---------------

_CRC_TABLE: list[int] | None = None
_CRC_LOCK = threading.Lock()


def _crc_table() -> list[int]:
    global _CRC_TABLE
    if _CRC_TABLE is None:
        with _CRC_LOCK:
            if _CRC_TABLE is None:
                table = []
                for i in range(256):
                    c = i
                    for _ in range(8):
                        c = (c >> 1) ^ 0xEDB88320 if c & 1 else c >> 1
                    table.append(c)
                _CRC_TABLE = table
    return _CRC_TABLE


def crc32(data: bytes, crc: int = 0) -> int:
    """CRC-32/ISO-HDLC (gzip, PNG, Ethernet) — reflected polynomial
    0xEDB88320, init/xorout 0xFFFFFFFF. Distinct from
    `sources/snappy.py`'s CRC-32C (Castagnoli, 0x82F63B78)."""
    table = _crc_table()
    c = crc ^ 0xFFFFFFFF
    for b in data:
        c = table[(c ^ b) & 0xFF] ^ (c >> 8)
    return c ^ 0xFFFFFFFF


def adler32(data: bytes) -> int:
    """Adler-32 (RFC 1950 §8): two mod-65521 running sums."""
    a, b = 1, 0
    for byte in data:
        a = (a + byte) % 65521
        b = (b + a) % 65521
    return (b << 16) | a


# --- RFC 1952 gzip member ------------------------------------------

_FTEXT, _FHCRC, _FEXTRA, _FNAME, _FCOMMENT = 1, 2, 4, 8, 16


def compress_gzip(data: bytes) -> bytes:
    """One gzip member: fixed header (MTIME=0 for determinism, XFL=0,
    OS=255 "unknown") + deflate stream + CRC-32/ISIZE trailer."""
    body = deflate(data)
    head = b"\x1f\x8b\x08\x00\x00\x00\x00\x00\x00\xff"
    trailer = crc32(data).to_bytes(4, "little") + (
        len(data) & 0xFFFFFFFF
    ).to_bytes(4, "little")
    return head + body + trailer


def decompress_gzip(buf: bytes, max_out: int = 1 << 26) -> bytes:
    """Decode one gzip member (RFC 1952), all optional header fields
    handled, CRC-32 and ISIZE trailer VERIFIED. ``ValueError`` on any
    malformation; the ``max_out`` bound refuses with its distinct
    message before producing unbounded output. Trailing bytes after
    the member are malformed (multi-member concatenation is a framing
    concern one level up, same posture as the LZ4 block decoder)."""
    if len(buf) < 10:
        raise ValueError("gzip: truncated header")
    if buf[0] != 0x1F or buf[1] != 0x8B:
        raise ValueError("gzip: bad magic")
    if buf[2] != 8:
        raise ValueError("gzip: unsupported compression method")
    flg = buf[3]
    if flg & 0xE0:
        raise ValueError("gzip: reserved FLG bits set")
    pos = 10
    if flg & _FEXTRA:
        if pos + 2 > len(buf):
            raise ValueError("gzip: truncated FEXTRA length")
        xlen = int.from_bytes(buf[pos : pos + 2], "little")
        pos += 2 + xlen
        if pos > len(buf):
            raise ValueError("gzip: truncated FEXTRA field")
    for flag, name in ((_FNAME, "FNAME"), (_FCOMMENT, "FCOMMENT")):
        if flg & flag:
            end = buf.find(b"\x00", pos)
            if end < 0:
                raise ValueError(f"gzip: unterminated {name}")
            pos = end + 1
    if flg & _FHCRC:
        if pos + 2 > len(buf):
            raise ValueError("gzip: truncated FHCRC")
        want = int.from_bytes(buf[pos : pos + 2], "little")
        if crc32(buf[:pos]) & 0xFFFF != want:
            raise ValueError("gzip: header CRC mismatch")
        pos += 2
    data, end = inflate(buf, max_out, _pos=pos)
    if end + 8 > len(buf):
        raise ValueError("gzip: truncated trailer")
    want_crc = int.from_bytes(buf[end : end + 4], "little")
    want_isize = int.from_bytes(buf[end + 4 : end + 8], "little")
    if crc32(data) != want_crc:
        raise ValueError("gzip: CRC-32 mismatch")
    if len(data) & 0xFFFFFFFF != want_isize:
        raise ValueError("gzip: ISIZE mismatch")
    if end + 8 != len(buf):
        raise ValueError("gzip: trailing bytes after member")
    return data


# --- RFC 1950 zlib stream ------------------------------------------

def compress_zlib(data: bytes) -> bytes:
    """One zlib stream: CMF/FLG (deflate, 32K window, check bits set
    so (CMF*256+FLG) % 31 == 0) + deflate stream + Adler-32."""
    cmf = 0x78  # CM=8, CINFO=7 (32K window)
    flg = 31 - (cmf * 256) % 31
    return (
        bytes((cmf, flg))
        + deflate(data)
        + adler32(data).to_bytes(4, "big")
    )


def decompress_zlib(buf: bytes, max_out: int = 1 << 26) -> bytes:
    """Decode one zlib stream (RFC 1950): CMF/FLG validated (the
    31-divisor check), FDICT rejected, Adler-32 trailer verified."""
    if len(buf) < 2:
        raise ValueError("zlib: truncated header")
    cmf, flg = buf[0], buf[1]
    if cmf & 0x0F != 8:
        raise ValueError("zlib: unsupported compression method")
    if (cmf >> 4) > 7:
        raise ValueError("zlib: window size exceeds spec maximum")
    if (cmf * 256 + flg) % 31 != 0:
        raise ValueError("zlib: header check bits invalid")
    if flg & 0x20:
        raise ValueError("zlib: preset dictionary not supported")
    data, end = inflate(buf, max_out, _pos=2)
    if end + 4 > len(buf):
        raise ValueError("zlib: truncated Adler-32 trailer")
    want = int.from_bytes(buf[end : end + 4], "big")
    if adler32(data) != want:
        raise ValueError("zlib: Adler-32 mismatch")
    if end + 4 != len(buf):
        raise ValueError("zlib: trailing bytes after stream")
    return data
