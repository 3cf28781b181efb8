"""FLAC lossless audio codec — the fifth REAL compressed codec, from
the public spec (RFC 9639 / xiph FLAC format): fLaC stream marker,
STREAMINFO metadata block, frame sync + CRC-8 header / CRC-16 frame
integrity, UTF-8-style coded frame numbers, CONSTANT / VERBATIM /
FIXED-predictor subframes (orders 0-4), and Rice/Rice2 residual
coding with partitions, escape codes, and wasted-bits handling.

Scope (the honest subset, mirrored by the other codecs' contracts):

- ENCODE: 16-bit mono/stereo-independent, fixed predictors 0-2 chosen
  per frame by minimum absolute residual sum, CONSTANT detection,
  single Rice partition with exact-cost parameter search, real MD5 in
  STREAMINFO. Always bit-valid FLAC a foreign decoder can read.
  :func:`encode_flac_lpc` additionally emits LPC subframes with
  caller-chosen quantized coefficients (the foreign-encoder fixture
  path).
- DECODE: all block-size/sample-rate/sample-size codes, fixed orders
  0-4, LPC subframes (§9.2.5) of order 1-8 with full qlp
  precision/shift/coefficient arithmetic (round 8 — covers what real
  encoders emit at default compression levels), any Rice partition
  order, both Rice methods + escape codes, wasted bits, stereo
  decorrelation (left-side / right-side / mid-side), CRC-8 and CRC-16
  VERIFIED. LPC orders > 8 raise NotImplementedError — declared out
  of subset, like arithmetic JPEG.

Lossless means the roundtrip is bit-exact by construction, so any
integer test signal gives an integer-exact oracle with no special
regime (contrast JPEG's piecewise-flat lever).

Spec citations inline use RFC 9639 section numbers. Parity loci:
SURVEY §3 row L5.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np

_SYNC = 0b11111111111110  # 14-bit frame sync (RFC 9639 §9.1)


class _BitWriter:
    """MSB-first bit packer (no byte stuffing — FLAC is sync-coded)."""

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

    def write_unary(self, q: int) -> None:
        # q zero bits terminated by a one bit (§9.2.6.1)
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)

    def align(self) -> None:
        if self._n:
            self.write(0, 8 - self._n)

    def bytes(self) -> bytes:
        assert self._n == 0
        return bytes(self.out)


class _BitReader:
    def __init__(self, buf: bytes, pos: int = 0) -> None:
        self.buf = buf
        self.bytepos = pos
        self.bitpos = 0

    def read(self, nbits: int) -> int:
        v = 0
        while nbits:
            if self.bytepos >= len(self.buf):
                raise ValueError("FLAC bitstream truncated")
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

    def read_signed(self, nbits: int) -> int:
        v = self.read(nbits)
        return v - (1 << nbits) if v >> (nbits - 1) else v

    def read_unary(self) -> int:
        q = 0
        while self.read(1) == 0:
            q += 1
        return q

    def align(self) -> None:
        if self.bitpos:
            self.bitpos = 0
            self.bytepos += 1


def _crc8(data: bytes) -> int:
    # poly x^8 + x^2 + x + 1 (0x07), init 0 (§9.1.8)
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    # poly x^16 + x^15 + x^2 + 1 (0x8005), init 0 (§9.3)
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 else (crc << 1) & 0xFFFF
    return crc


def _utf8_code(n: int) -> bytes:
    """UTF-8-style coded number, extended to 36 bits (§9.1.5)."""
    if n < 0x80:
        return bytes([n])
    for nbytes, lead in ((2, 0xC0), (3, 0xE0), (4, 0xF0), (5, 0xF8), (6, 0xFC), (7, 0xFE)):
        if n < (1 << (5 * nbytes + 1)) or nbytes == 7:
            out = bytearray(nbytes)
            for i in range(nbytes - 1, 0, -1):
                out[i] = 0x80 | (n & 0x3F)
                n >>= 6
            out[0] = lead | n
            return bytes(out)
    raise AssertionError


def _utf8_decode(r: _BitReader) -> int:
    first = r.read(8)
    if first < 0x80:
        return first
    nbytes = 0
    mask = 0x80
    while first & mask:
        nbytes += 1
        mask >>= 1
    n = first & (mask - 1)
    for _ in range(nbytes - 1):
        cont = r.read(8)
        if cont & 0xC0 != 0x80:
            raise ValueError("bad coded frame number")
        n = (n << 6) | (cont & 0x3F)
    return n


_FIXED_COEFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}


def _fixed_residual(x: np.ndarray, order: int) -> np.ndarray:
    r = x.astype(np.int64)
    for _ in range(order):
        r = np.diff(r)
    return r


def _rice_cost(u: np.ndarray, k: int) -> int:
    return int((u >> k).sum()) + len(u) * (1 + k)


def _zigzag(res: np.ndarray) -> np.ndarray:
    return np.where(res >= 0, res << 1, ((-res) << 1) - 1).astype(np.int64)


def encode_flac(
    samples,
    sample_rate: int = 8000,
    block_size: int = 4096,
    *,
    _lpc: tuple | None = None,
) -> bytes:
    """int16 samples (1-D mono, or 2-D (n, channels)) → FLAC stream.

    ``_lpc`` (internal; use :func:`encode_flac_lpc`) is a
    ``(coefs, shift)`` pair forcing every subframe to be encoded as an
    LPC subframe with those quantized coefficients — the fixture path
    for exercising the §9.2.5 decoder against streams a foreign
    LPC-emitting encoder would produce."""
    x = np.asarray(samples, np.int64)
    if x.ndim == 1:
        x = x[:, None]
    n, nch = x.shape
    if not (1 <= nch <= 8):
        raise ValueError("1..8 channels")
    if np.abs(x).max(initial=0) > 32767:
        raise ValueError("16-bit samples only in-subset")

    md5 = hashlib.md5(
        np.ascontiguousarray(x.astype("<i2")).tobytes()
    ).digest()

    out = bytearray(b"fLaC")
    info = _BitWriter()
    bs_min = min(block_size, n) or block_size
    info.write(bs_min, 16)  # min block size
    info.write(block_size, 16)  # max block size
    info.write(0, 24)  # min frame size unknown
    info.write(0, 24)  # max frame size unknown
    info.write(sample_rate, 20)
    info.write(nch - 1, 3)
    info.write(15, 5)  # bits per sample - 1
    info.write(n, 36)
    body = info.bytes() + md5
    out += bytes([0x80, 0, 0, len(body) & 0xFF])  # last-block flag + type 0
    out += body

    for fi, start in enumerate(range(0, n, block_size)):
        blk = x[start : start + block_size]
        out += _encode_frame(blk, fi, sample_rate, block_size, _lpc)
    return bytes(out)


def encode_flac_lpc(
    samples,
    coefs: tuple[int, ...],
    shift: int,
    sample_rate: int = 8000,
    block_size: int = 4096,
) -> bytes:
    """FLAC stream whose every subframe is an LPC subframe (§9.2.5)
    with the given integer quantized coefficients (coef[0] multiplies
    the most recent sample) and right-shift. Lossless like every FLAC
    predictor — the residual stores exactly what the predictor misses
    — so any integer signal still gives an integer-exact oracle.
    Orders 1-8 (the decoder's declared subset)."""
    if not (1 <= len(coefs) <= 8):
        raise ValueError("LPC order 1..8 in-subset")
    if not (0 <= shift <= 15):
        raise ValueError("qlp shift 0..15")
    return encode_flac(
        samples, sample_rate, block_size, _lpc=(tuple(int(c) for c in coefs), shift)
    )


def _encode_frame(
    blk: np.ndarray,
    fi: int,
    sample_rate: int,
    nominal: int,
    lpc: tuple | None = None,
) -> bytes:
    nsamp, nch = blk.shape
    hdr = _BitWriter()
    hdr.write(_SYNC, 14)
    hdr.write(0, 1)  # reserved
    hdr.write(0, 1)  # fixed blocksize strategy
    hdr.write(7, 4)  # block size: 16-bit value-1 follows (§9.1.1)
    hdr.write(0, 4)  # sample rate: from STREAMINFO
    hdr.write(nch - 1, 4)  # independent channels (§9.1.3)
    hdr.write(4, 3)  # sample size: 16-bit (§9.1.4)
    hdr.write(0, 1)  # reserved
    head = hdr.bytes() + _utf8_code(fi)
    head += struct.pack(">H", nsamp - 1)
    head += bytes([_crc8(head)])

    w = _BitWriter()
    for b in head:
        w.write(b, 8)
    for c in range(nch):
        if lpc is not None:
            _encode_subframe_lpc(w, blk[:, c], *lpc)
        else:
            _encode_subframe(w, blk[:, c])
    w.align()
    frame = w.bytes()
    return frame + struct.pack(">H", _crc16(frame))


def _encode_subframe(w: _BitWriter, x: np.ndarray) -> None:
    n = len(x)
    if n and (x == x[0]).all():
        w.write(0, 1)
        w.write(0, 6)  # CONSTANT
        w.write(0, 1)
        w.write(int(x[0]), 16)
        return
    best_order, best_res, best_cost = 0, None, None
    for order in range(0, min(3, n)):
        res = _fixed_residual(x, order)
        cost = int(np.abs(res).sum())
        if best_cost is None or cost < best_cost:
            best_order, best_res, best_cost = order, res, cost
    res = best_res
    u = _zigzag(res)
    ks = range(0, 15)
    costs = [_rice_cost(u, k) for k in ks]
    k = int(np.argmin(costs))
    # escape to verbatim subframe when rice loses to raw
    if costs[k] > 16 * n:
        w.write(0, 1)
        w.write(1, 6)  # VERBATIM
        w.write(0, 1)
        for v in x:
            w.write(int(v), 16)
        return
    w.write(0, 1)
    w.write(8 + best_order, 6)  # FIXED, order (§9.2.2)
    w.write(0, 1)  # no wasted bits
    for v in x[:best_order]:
        w.write(int(v), 16)  # warmup
    w.write(0, 2)  # residual method: rice 4-bit (§9.2.7)
    w.write(0, 4)  # partition order 0
    w.write(k, 4)
    for q, rem in zip((u >> k).tolist(), (u & ((1 << k) - 1)).tolist()):
        w.write_unary(q)
        if k:
            w.write(rem, k)


def _encode_subframe_lpc(
    w: _BitWriter, x: np.ndarray, coefs: tuple[int, ...], shift: int
) -> None:
    """LPC subframe (§9.2.5): warmup, qlp precision/shift, quantized
    coefficients (coef[0] x most-recent), then the same Rice residual
    coding the fixed path uses. Residual stores exactly what the
    predictor misses, so the roundtrip stays lossless for ANY integer
    coefficients."""
    n = len(x)
    order = len(coefs)
    if n <= order:  # tail block too short to warm up: plain subframe
        _encode_subframe(w, x)
        return
    precision = max(2, max(abs(int(c)).bit_length() + 1 for c in coefs))
    if precision > 15:
        raise ValueError("qlp coefficients wider than 15 bits")
    res = np.empty(n - order, np.int64)
    xi = x.astype(np.int64)
    for i in range(order, n):
        pred = sum(c * int(xi[i - 1 - j]) for j, c in enumerate(coefs)) >> shift
        res[i - order] = int(xi[i]) - pred
    u = _zigzag(res)
    k = int(np.argmin([_rice_cost(u, kk) for kk in range(15)]))
    w.write(0, 1)
    w.write(32 + order - 1, 6)  # LPC subframe type (§9.2.2)
    w.write(0, 1)  # no wasted bits
    for v in x[:order]:
        w.write(int(v), 16)  # warmup
    w.write(precision - 1, 4)
    w.write(shift, 5)
    for c in coefs:
        w.write(int(c), precision)
    w.write(0, 2)  # residual method: rice 4-bit (§9.2.7)
    w.write(0, 4)  # partition order 0
    w.write(k, 4)
    for q, rem in zip((u >> k).tolist(), (u & ((1 << k) - 1)).tolist()):
        w.write_unary(q)
        if k:
            w.write(rem, k)


_BLOCKSIZE_CODES = {1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608}
_SAMPLE_SIZE_CODES = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}
_SAMPLE_RATE_CODES = {
    1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000, 6: 22050,
    7: 24000, 8: 32000, 9: 44100, 10: 48000, 11: 96000,
}


def decode_flac(content: bytes):
    """FLAC stream → (meta, int samples array (n,) mono or (n, ch));
    verifies frame CRC-8/CRC-16 and the STREAMINFO MD5 for 16-bit."""
    if content[:4] != b"fLaC":
        raise ValueError("not a FLAC payload")
    pos = 4
    streaminfo = None
    while True:
        hdr = content[pos : pos + 4]
        if len(hdr) < 4:
            # foreign-bytes contract: truncation raises a clean
            # ValueError, never IndexError (e.g. decode_flac(b"fLaC"))
            raise ValueError("FLAC stream truncated in metadata block header")
        last, btype = hdr[0] >> 7, hdr[0] & 0x7F
        size = int.from_bytes(hdr[1:4], "big")
        body = content[pos + 4 : pos + 4 + size]
        if len(body) < size:
            raise ValueError("FLAC stream truncated in metadata block body")
        if btype == 0:
            r = _BitReader(body)
            r.read(16)
            r.read(16)
            r.read(24)
            r.read(24)
            rate = r.read(20)
            nch = r.read(3) + 1
            bps = r.read(5) + 1
            total = r.read(36)
            streaminfo = (rate, nch, bps, total, body[18:34])
        pos += 4 + size
        if last:
            break
    if streaminfo is None:
        raise ValueError("FLAC missing STREAMINFO")
    rate, nch, bps, total, md5 = streaminfo

    chans = [[] for _ in range(nch)]
    got = 0
    while got < total and pos < len(content):
        pos, blk = _decode_frame(content, pos, rate, nch, bps)
        for c in range(nch):
            chans[c].append(blk[c])
        got += len(blk[0])
    samples = np.stack([np.concatenate(c) for c in chans], axis=1)[:total]
    if bps == 16 and md5 != b"\0" * 16:
        calc = hashlib.md5(
            np.ascontiguousarray(samples.astype("<i2")).tobytes()
        ).digest()
        if calc != md5:
            raise ValueError("FLAC MD5 mismatch")
    meta = {
        "media_type": "audio",
        "format": "flac",
        "width": None,
        "height": None,
        "duration_ms": total * 1000 // rate if rate else None,
    }
    return meta, (samples[:, 0] if nch == 1 else samples)


def _decode_frame(buf: bytes, pos: int, rate: int, nch: int, bps: int):
    r = _BitReader(buf, pos)
    if r.read(14) != _SYNC:
        raise ValueError("lost FLAC frame sync")
    r.read(1)
    r.read(1)  # blocking strategy
    bs_code = r.read(4)
    sr_code = r.read(4)
    ch_code = r.read(4)
    ss_code = r.read(3)
    r.read(1)
    _utf8_decode(r)
    if bs_code == 6:
        nsamp = r.read(8) + 1
    elif bs_code == 7:
        nsamp = r.read(16) + 1
    elif bs_code in _BLOCKSIZE_CODES:
        nsamp = _BLOCKSIZE_CODES[bs_code]
    elif 8 <= bs_code <= 15:
        nsamp = 256 << (bs_code - 8)
    else:
        raise ValueError("reserved block size code")
    if sr_code == 12:
        r.read(8)
    elif sr_code in (13, 14):
        r.read(16)
    bits = _SAMPLE_SIZE_CODES.get(ss_code, bps)
    r.align()
    hdr_end = r.bytepos
    if _crc8(buf[pos:hdr_end]) != r.read(8):
        raise ValueError("FLAC header CRC-8 mismatch")

    if ch_code <= 7:
        widths = [bits] * nch
    elif ch_code in (8, 9, 10):  # stereo decorrelation: side gets +1 bit
        if nch != 2:
            raise ValueError("decorrelated non-stereo")
        widths = {8: [bits, bits + 1], 9: [bits + 1, bits], 10: [bits, bits + 1]}[ch_code]
    else:
        raise ValueError("reserved channel assignment")

    sub = [_decode_subframe(r, nsamp, wbits) for wbits in widths]
    if ch_code == 8:  # left/side
        sub[1] = sub[0] - sub[1]
    elif ch_code == 9:  # side/right
        sub[0] = sub[0] + sub[1]
    elif ch_code == 10:  # mid/side (§9.1.3)
        mid, side = sub
        m2 = (mid << 1) | (side & 1)
        sub = [(m2 + side) >> 1, (m2 - side) >> 1]
    r.align()
    end = r.bytepos
    if end + 2 > len(buf):
        raise ValueError("FLAC stream truncated before frame CRC-16")
    if _crc16(buf[pos:end]) != struct.unpack(">H", buf[end : end + 2])[0]:
        raise ValueError("FLAC frame CRC-16 mismatch")
    return end + 2, sub


def _decode_subframe(r: _BitReader, n: int, bits: int) -> np.ndarray:
    if r.read(1):
        raise ValueError("subframe pad bit set")
    stype = r.read(6)
    wasted = 0
    if r.read(1):
        wasted = r.read_unary() + 1
        bits -= wasted
    if stype == 0:  # CONSTANT
        out = np.full(n, r.read_signed(bits), np.int64)
    elif stype == 1:  # VERBATIM
        out = np.array([r.read_signed(bits) for _ in range(n)], np.int64)
    elif 8 <= stype <= 12:  # FIXED order 0-4 (§9.2.2)
        order = stype - 8
        warm = [r.read_signed(bits) for _ in range(order)]
        res = _decode_residual(r, n, order)
        out = np.empty(n, np.int64)
        out[:order] = warm
        coefs = _FIXED_COEFS[order]
        for i in range(order, n):
            out[i] = res[i - order] + sum(
                c * out[i - 1 - j] for j, c in enumerate(coefs)
            )
    elif stype >= 32:  # LPC, order 1-32 (§9.2.5)
        order = stype - 31
        if order > 8:
            raise NotImplementedError(
                "LPC subframes of order > 8 out of FLAC subset"
            )
        warm = [r.read_signed(bits) for _ in range(order)]
        prec = r.read(4)
        if prec == 0b1111:
            raise ValueError("invalid qlp precision code")
        prec += 1
        shift = r.read_signed(5)
        if shift < 0:
            raise ValueError("negative qlp shift")
        coefs = [r.read_signed(prec) for _ in range(order)]
        res = _decode_residual(r, n, order)
        out = np.empty(n, np.int64)
        out[:order] = warm
        # out[i] = res + (sum_j coef[j]*out[i-1-j]) >> shift; Python's
        # >> is the arithmetic (floor) shift the spec requires (§9.2.5)
        for i in range(order, n):
            out[i] = res[i - order] + (
                sum(c * int(out[i - 1 - j]) for j, c in enumerate(coefs))
                >> shift
            )
    else:
        raise ValueError("reserved subframe type")
    return out << wasted


def _decode_residual(r: _BitReader, n: int, order: int) -> np.ndarray:
    method = r.read(2)
    if method > 1:
        raise ValueError("reserved residual method")
    pbits = 4 if method == 0 else 5
    escape = (1 << pbits) - 1
    porder = r.read(4)
    nparts = 1 << porder
    out: list[int] = []
    for p in range(nparts):
        cnt = (n >> porder) - (order if p == 0 else 0)
        k = r.read(pbits)
        if k == escape:
            raw = r.read(5)
            out.extend(r.read_signed(raw) if raw else 0 for _ in range(cnt))
        else:
            for _ in range(cnt):
                q = r.read_unary()
                u = (q << k) | (r.read(k) if k else 0)
                out.append((u >> 1) if u % 2 == 0 else -((u + 1) >> 1))
    return np.asarray(out, np.int64)
