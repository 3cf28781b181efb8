"""Baseline JPEG codec, pure numpy + stdlib (SURVEY §3.8 L5).

The one genuinely compressed *image* codec a real multimodal corpus
needs (r5 VERDICT "What's missing" #4). Implements the baseline DCT
profile of ITU-T T.81 (public spec): SOI/APP0/DQT/SOF0/DHT/SOS/EOI
marker framing, 8×8 forward/inverse DCT, quantization, zigzag, DC
DPCM + AC run-length over canonical Huffman codes, 0xFF byte
stuffing, restart intervals (DRI + RSTn resync with DC-predictor
reset, both directions), grayscale and YCbCr 4:4:4 / 4:2:0. NOT
supported (raise): progressive (SOF2), arithmetic coding, 12-bit
precision.

The encoder declares its OWN canonical Huffman tables in DHT (one
4-bit-code table for the 12 DC size classes, one 8-bit-code table
for the ≤162 AC (run,size) symbols) — valid JPEG, simpler than
Annex K, and the decoder reads whatever tables the stream declares,
so it also decodes Annex-K-coded baseline streams.

Exactness lever used by the oracle query: with all-ones quant tables
a block that is FLAT decodes bit-exactly (its AC coefficients
quantize to 0 and the DC path is integer-exact after the final
rounding), so piecewise-flat images give integer pixel sums with no
float tolerance anywhere. General content round-trips within the
usual quantization error (tested with tolerance).

Scale shape: both halves run executor-side over Arrow batches
(mapInPandas at the query layer) — a map-only decode stage; nothing
here touches the driver.
"""

from __future__ import annotations

import struct

import numpy as np

ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ]
)

# Orthonormal 8-point DCT-II matrix: T @ block @ T.T == JPEG FDCT.
_T = np.zeros((8, 8))
for _i in range(8):
    for _j in range(8):
        _T[_i, _j] = (np.sqrt(0.125) if _i == 0 else 0.5) * np.cos(
            (2 * _j + 1) * _i * np.pi / 16
        )


def _fdct(block: np.ndarray) -> np.ndarray:
    return _T @ block @ _T.T


def _idct(coef: np.ndarray) -> np.ndarray:
    return _T.T @ coef @ _T


# -- canonical Huffman (encode side) ----------------------------------


def _canonical_table(symbols: list[int]) -> tuple[list[int], list[int], dict]:
    """All symbols at one code length L with 2^L > len(symbols):
    valid canonical JPEG table (the all-ones code stays unused).
    Returns (bits[1..16], huffval, {sym: (code, L)})."""
    n = len(symbols)
    length = max(2, (n + 1).bit_length())
    bits = [0] * 17
    bits[length] = n
    codes = {s: (i, length) for i, s in enumerate(symbols)}
    return bits[1:], list(symbols), codes

_DC_SYMBOLS = list(range(12))
_AC_SYMBOLS = [0x00, 0xF0] + [
    (run << 4) | size for run in range(16) for size in range(1, 11)
]
_DC_BITS, _DC_VALS, _DC_CODES = _canonical_table(_DC_SYMBOLS)
_AC_BITS, _AC_VALS, _AC_CODES = _canonical_table(_AC_SYMBOLS)


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self._acc = 0
        self._nbits = 0

    def write(self, code: int, length: int) -> None:
        self._acc = (self._acc << length) | (code & ((1 << length) - 1))
        self._nbits += length
        while self._nbits >= 8:
            byte = (self._acc >> (self._nbits - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self._nbits -= 8
        self._acc &= (1 << self._nbits) - 1

    def flush(self) -> bytes:
        if self._nbits:
            pad = 8 - self._nbits
            byte = ((self._acc << pad) | ((1 << pad) - 1)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)
            self._nbits = 0
            self._acc = 0
        return bytes(self.out)


def _magnitude(v: int) -> tuple[int, int]:
    """JPEG magnitude coding: (size, size-bit value); negatives use
    one's complement."""
    if v == 0:
        return 0, 0
    size = int(abs(v)).bit_length()
    if v < 0:
        v = v + (1 << size) - 1
    return size, v


def _encode_block(
    w: _BitWriter, coefs: np.ndarray, prev_dc: int
) -> int:
    zz = coefs.reshape(64)[ZIGZAG]
    dc = int(zz[0])
    size, bitsv = _magnitude(dc - prev_dc)
    code, length = _DC_CODES[size]
    w.write(code, length)
    if size:
        w.write(bitsv, size)
    run = 0
    last_nz = 0
    for k in range(63, 0, -1):
        if zz[k] != 0:
            last_nz = k
            break
    for k in range(1, last_nz + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run >= 16:
            code, length = _AC_CODES[0xF0]  # ZRL
            w.write(code, length)
            run -= 16
        size, bitsv = _magnitude(v)
        code, length = _AC_CODES[(run << 4) | size]
        w.write(code, length)
        w.write(bitsv, size)
        run = 0
    if last_nz != 63:
        code, length = _AC_CODES[0x00]  # EOB
        w.write(code, length)
    return dc


def _blocks_of(plane: np.ndarray):
    """Pad a (H, W) float plane to 8-multiples (edge replicate) and
    yield 8×8 blocks in raster order."""
    h, w = plane.shape
    ph, pw = -h % 8, -w % 8
    if ph or pw:
        plane = np.pad(plane, ((0, ph), (0, pw)), mode="edge")
    for by in range(0, plane.shape[0], 8):
        for bx in range(0, plane.shape[1], 8):
            yield plane[by : by + 8, bx : bx + 8]


def _dht_segment(tc: int, th: int, bits: list[int], vals: list[int]) -> bytes:
    body = bytes([tc << 4 | th]) + bytes(bits) + bytes(vals)
    return b"\xff\xc4" + struct.pack(">H", len(body) + 2) + body


def encode_jpeg(
    pixels,
    quant_luma=None,
    quant_chroma=None,
    subsampling: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """numpy uint8 (H, W) gray or (H, W, 3) RGB → baseline JFIF bytes.

    Default quant tables are ALL ONES (maximum fidelity; flat blocks
    become bit-exact). Pass 8×8 integer tables for real compression.
    ``subsampling``: '444' or '420' (RGB only). ``restart_interval``
    > 0 writes a DRI segment and splits the entropy stream with RSTn
    markers every that-many MCUs (T.81 §B.2.4.4 / §E.1.4): each
    segment byte-aligns with 1-padding, the marker index cycles D0–D7,
    and DC predictors reset — the resync structure real encoders emit
    so corrupt streams lose one interval, not the image."""
    px = np.asarray(pixels, dtype=np.uint8)
    gray = px.ndim == 2
    ql = np.ones((8, 8), np.uint16) if quant_luma is None else np.asarray(
        quant_luma, np.uint16
    )
    qc = ql if quant_chroma is None else np.asarray(quant_chroma, np.uint16)
    h, w = px.shape[:2]
    if gray:
        planes = [px.astype(np.float64) - 128.0]
        sampling = [(1, 1)]
        quants = [ql]
    else:
        r = px[:, :, 0].astype(np.float64)
        g = px[:, :, 1].astype(np.float64)
        b = px[:, :, 2].astype(np.float64)
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        if subsampling == "444":
            planes = [y - 128.0, cb - 128.0, cr - 128.0]
            sampling = [(1, 1), (1, 1), (1, 1)]
        elif subsampling == "420":
            ph, pw = -h % 2, -w % 2
            if ph or pw:
                cb = np.pad(cb, ((0, ph), (0, pw)), mode="edge")
                cr = np.pad(cr, ((0, ph), (0, pw)), mode="edge")
            cb2 = cb.reshape(cb.shape[0] // 2, 2, cb.shape[1] // 2, 2).mean(
                axis=(1, 3)
            )
            cr2 = cr.reshape(cr.shape[0] // 2, 2, cr.shape[1] // 2, 2).mean(
                axis=(1, 3)
            )
            planes = [y - 128.0, cb2 - 128.0, cr2 - 128.0]
            sampling = [(2, 2), (1, 1), (1, 1)]
        else:
            raise ValueError("subsampling must be 444 or 420")
        quants = [ql, qc, qc]

    out = bytearray(b"\xff\xd8")  # SOI
    jfif = b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    out += b"\xff\xe0" + struct.pack(">H", len(jfif) + 2) + jfif
    for tq, q in enumerate([ql] if gray else [ql, qc]):
        body = bytes([tq]) + bytes(int(q.reshape(64)[ZIGZAG][k]) for k in range(64))
        out += b"\xff\xdb" + struct.pack(">H", len(body) + 2) + body
    ncomp = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci in range(ncomp):
        hs, vs = sampling[ci]
        tq = 0 if ci == 0 else 1
        sof += bytes([ci + 1, hs << 4 | vs, 0 if gray else tq])
    out += b"\xff\xc0" + struct.pack(">H", len(sof) + 2) + sof
    out += _dht_segment(0, 0, _DC_BITS, _DC_VALS)
    out += _dht_segment(1, 0, _AC_BITS, _AC_VALS)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    sos = bytes([ncomp])
    for ci in range(ncomp):
        sos += bytes([ci + 1, 0x00])  # DC table 0, AC table 0 for all
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", len(sos) + 2) + sos

    # entropy-coded segment: interleaved MCUs
    hmax = max(s[0] for s in sampling)
    vmax = max(s[1] for s in sampling)
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    mcus_x = -(-w // mcu_w)
    mcus_y = -(-h // mcu_h)
    padded = []
    for ci, plane in enumerate(planes):
        hs, vs = sampling[ci]
        tw, th_ = mcus_x * 8 * hs, mcus_y * 8 * vs
        ph, pw = th_ - plane.shape[0], tw - plane.shape[1]
        padded.append(
            np.pad(plane, ((0, max(0, ph)), (0, max(0, pw))), mode="edge")
        )
    writer = _BitWriter()
    prev_dc = [0] * len(planes)
    mcu_i = 0
    n_restarts = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_i and mcu_i % restart_interval == 0:
                out += writer.flush()  # byte-align with 1-padding
                out += bytes([0xFF, 0xD0 + n_restarts % 8])
                n_restarts += 1
                writer = _BitWriter()
                prev_dc = [0] * len(planes)
            mcu_i += 1
            for ci, plane in enumerate(padded):
                hs, vs = sampling[ci]
                for by in range(vs):
                    for bx in range(hs):
                        y0 = (my * vs + by) * 8
                        x0 = (mx * hs + bx) * 8
                        block = plane[y0 : y0 + 8, x0 : x0 + 8]
                        coefs = np.round(
                            _fdct(block) / quants[ci]
                        ).astype(np.int32)
                        prev_dc[ci] = _encode_block(
                            writer, coefs, prev_dc[ci]
                        )
    out += writer.flush()
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# -- decoder ----------------------------------------------------------


class _BitReader:
    """MSB-first reader over the entropy-coded segment with 0xFF00
    unstuffing; stops at any marker."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self._acc = 0
        self._nbits = 0

    def _fill(self) -> None:
        b = self.data[self.pos]
        if b == 0xFF:
            nxt = self.data[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            else:
                raise EOFError("hit marker inside entropy segment")
        else:
            self.pos += 1
        self._acc = (self._acc << 8) | b
        self._nbits += 8

    def bit(self) -> int:
        if self._nbits == 0:
            self._fill()
        self._nbits -= 1
        return (self._acc >> self._nbits) & 1

    def bits(self, n: int) -> int:
        if n == 0:
            return 0
        while self._nbits < n:
            self._fill()
        self._nbits -= n
        v = (self._acc >> self._nbits) & ((1 << n) - 1)
        self._acc &= (1 << self._nbits) - 1
        return v

    def restart(self, expect_m: int) -> None:
        """Byte-align (discard the segment's 1-padding bits — always
        < 8 remain buffered) and consume the RSTn marker, checking its
        index cycles as T.81 §E.1.4 requires."""
        self._acc = 0
        self._nbits = 0
        if (
            self.pos + 2 > len(self.data)
            or self.data[self.pos] != 0xFF
            or self.data[self.pos + 1] != 0xD0 + expect_m
        ):
            raise ValueError("expected RST marker at restart interval")
        self.pos += 2


class _HuffTable:
    """Canonical Huffman decode table. Single-length tables (what our
    encoder emits) decode with ONE fixed-width bits() read; mixed-
    length tables (Annex K streams) walk lengths ascending."""

    def __init__(self, bits_counts: list[int], vals: list[int]):
        self.map: dict = {}
        lengths = [
            length
            for length in range(1, 17)
            if bits_counts[length - 1]
        ]
        code = 0
        k = 0
        for length in range(1, 17):
            for _ in range(bits_counts[length - 1]):
                self.map[(length, code)] = vals[k]
                code += 1
                k += 1
            code <<= 1
        self.fixed = lengths[0] if len(lengths) == 1 else None


def _build_decode_table(bits: list[int], vals: list[int]) -> _HuffTable:
    return _HuffTable(bits, vals)


def _read_symbol(r: _BitReader, table: _HuffTable) -> int:
    if table.fixed is not None:
        sym = table.map.get((table.fixed, r.bits(table.fixed)))
        if sym is None:
            raise ValueError("invalid Huffman code in stream")
        return sym
    code = 0
    for length in range(1, 17):
        code = (code << 1) | r.bit()
        sym = table.map.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code in stream")


def _extend(v: int, size: int) -> int:
    if size == 0:
        return 0
    if v < (1 << (size - 1)):
        return v - (1 << size) + 1
    return v


def decode_jpeg(content: bytes):
    """Baseline JFIF bytes → (meta, uint8 array (H, W) or (H, W, 3)).

    Parses whatever DQT/DHT tables the stream declares (Annex K or
    otherwise); supports grayscale and 3-component YCbCr with 4:4:4 or
    4:2:0 sampling, and restart intervals (DRI → RSTn resync with DC
    reset). Progressive, arithmetic and 12-bit raise."""
    if content[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}
    frame = None
    restart_interval = 0
    n = len(content)
    while pos + 4 <= n:
        if content[pos] != 0xFF:
            raise ValueError("marker expected")
        marker = content[pos + 1]
        if marker == 0xD9:  # EOI
            break
        (seglen,) = struct.unpack_from(">H", content, pos + 2)
        body = content[pos + 4 : pos + 2 + seglen]
        pos += 2 + seglen
        if marker == 0xDB:  # DQT
            off = 0
            while off < len(body):
                pq, tq = body[off] >> 4, body[off] & 0xF
                off += 1
                if pq == 0:
                    vals = np.frombuffer(body, np.uint8, 64, off)
                    off += 64
                else:
                    vals = np.frombuffer(body, ">u2", 64, off).astype(
                        np.uint16
                    )
                    off += 128
                table = np.zeros(64, np.uint16)
                table[ZIGZAG] = vals
                qt[tq] = table.reshape(8, 8)
        elif marker == 0xC4:  # DHT
            off = 0
            while off < len(body):
                tc, th = body[off] >> 4, body[off] & 0xF
                bits = list(body[off + 1 : off + 17])
                nv = sum(bits)
                vals = list(body[off + 17 : off + 17 + nv])
                huff[(tc, th)] = _build_decode_table(bits, vals)
                off += 17 + nv
        elif marker == 0xC0:  # SOF0 baseline
            prec, fh, fw, ncomp = struct.unpack_from(">BHHB", body, 0)
            if prec != 8:
                raise NotImplementedError("only 8-bit precision")
            comps = []
            for ci in range(ncomp):
                cid, hv, tq = body[6 + 3 * ci : 9 + 3 * ci]
                comps.append((cid, hv >> 4, hv & 0xF, tq))
            frame = (fh, fw, comps)
        elif marker in (0xC1,):  # extended sequential — same decode
            prec, fh, fw, ncomp = struct.unpack_from(">BHHB", body, 0)
            comps = [
                (
                    body[6 + 3 * ci],
                    body[7 + 3 * ci] >> 4,
                    body[7 + 3 * ci] & 0xF,
                    body[8 + 3 * ci],
                )
                for ci in range(ncomp)
            ]
            frame = (fh, fw, comps)
        elif marker == 0xC2:
            raise NotImplementedError("progressive JPEG not supported")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = body[0]
            scan_tables = {}
            for si in range(ns):
                cs, tdta = body[1 + 2 * si], body[2 + 2 * si]
                scan_tables[cs] = (tdta >> 4, tdta & 0xF)
            return _decode_scan(
                content, pos, frame, scan_tables, qt, huff,
                restart_interval,
            )
        # all other markers (APPn, COM): skipped
    raise ValueError("no SOS marker found")


def _decode_scan(content, pos, frame, scan_tables, qt, huff, restart_interval=0):
    fh, fw, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    for _cid, hs, vs, _tq in comps:
        if (hs, vs) not in {(1, 1), (2, 2)} or (
            len(comps) == 3 and (hmax, vmax) not in {(1, 1), (2, 2)}
        ):
            raise NotImplementedError(
                "only 4:4:4 and 4:2:0 sampling supported"
            )
    mcus_x = -(-fw // (8 * hmax))
    mcus_y = -(-fh // (8 * vmax))
    planes = []
    for _cid, hs, vs, _tq in comps:
        planes.append(
            np.zeros((mcus_y * 8 * vs, mcus_x * 8 * hs), np.float64)
        )
    reader = _BitReader(content, pos)
    prev_dc = [0] * len(comps)
    mcu_i = 0
    n_restarts = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_i and mcu_i % restart_interval == 0:
                reader.restart(n_restarts % 8)
                n_restarts += 1
                prev_dc = [0] * len(comps)
            mcu_i += 1
            for ci, (cid, hs, vs, tq) in enumerate(comps):
                td, ta = scan_tables[cid]
                dc_tab, ac_tab = huff[(0, td)], huff[(1, ta)]
                for by in range(vs):
                    for bx in range(hs):
                        zz = np.zeros(64, np.int32)
                        size = _read_symbol(reader, dc_tab)
                        diff = _extend(reader.bits(size), size)
                        prev_dc[ci] += diff
                        zz[0] = prev_dc[ci]
                        k = 1
                        while k < 64:
                            sym = _read_symbol(reader, ac_tab)
                            if sym == 0x00:  # EOB
                                break
                            if sym == 0xF0:  # ZRL
                                k += 16
                                continue
                            run, size = sym >> 4, sym & 0xF
                            k += run
                            if k > 63:
                                raise ValueError("AC run past block end")
                            zz[k] = _extend(reader.bits(size), size)
                            k += 1
                        coefs = np.zeros(64, np.float64)
                        coefs[ZIGZAG] = zz
                        block = _idct(
                            coefs.reshape(8, 8) * qt[tq]
                        )
                        y0 = (my * vs + by) * 8
                        x0 = (mx * hs + bx) * 8
                        planes[ci][y0 : y0 + 8, x0 : x0 + 8] = block
    out_planes = []
    for ci, (_cid, hs, vs, _tq) in enumerate(comps):
        p = planes[ci] + 128.0
        if hs != hmax or vs != vmax:  # nearest upsample (4:2:0 chroma)
            p = p.repeat(vmax // vs, axis=0).repeat(hmax // hs, axis=1)
        out_planes.append(p[:fh, :fw])
    meta = {
        "media_type": "image",
        "format": "jpeg",
        "width": fw,
        "height": fh,
        "duration_ms": None,
    }
    if len(out_planes) == 1:
        px = np.clip(np.round(out_planes[0]), 0, 255).astype(np.uint8)
        return meta, px
    y, cb, cr = out_planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    px = np.clip(np.round(np.stack([r, g, b], axis=2)), 0, 255).astype(
        np.uint8
    )
    return meta, px
