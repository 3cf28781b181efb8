"""Baseline JPEG codec, pure numpy + stdlib (SURVEY §3.8 L5).

The one genuinely compressed *image* codec a real multimodal corpus
needs (r5 VERDICT "What's missing" #4). Implements the baseline DCT
profile of ITU-T T.81 (public spec): SOI/APP0/DQT/SOF0/DHT/SOS/EOI
marker framing, 8×8 forward/inverse DCT, quantization, zigzag, DC
DPCM + AC run-length over canonical Huffman codes, 0xFF byte
stuffing, restart intervals (DRI + RSTn resync with DC-predictor
reset, both directions), grayscale and YCbCr 4:4:4 / 4:2:0, and
PROGRESSIVE mode (SOF2, T.81 Annex G) in both directions: the decoder
accumulates any scan script (spectral selection + successive
approximation, DC/AC first + refinement with EOBRUN); the encoder
emits a four-stage script covering every scan type. Progressive and
baseline encode the same quantized coefficients, so their decoded
pixels are bit-identical — the invariant the tests pin. NOT supported
(raise): arithmetic coding, 12-bit precision.

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


def _encode_setup(pixels, quant_luma, quant_chroma, subsampling):
    """Shared encoder front half: RGB→YCbCr (or gray), level shift,
    chroma subsampling, quant-table defaulting. Used by both the
    baseline and progressive encoders."""
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
    return px, gray, ql, qc, planes, sampling, quants, h, w


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
    px, gray, ql, qc, planes, sampling, quants, h, w = _encode_setup(
        pixels, quant_luma, quant_chroma, subsampling
    )

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
    4:2:0 sampling, restart intervals (DRI → RSTn resync with DC
    reset), and PROGRESSIVE streams (SOF2, T.81 Annex G: spectral
    selection + successive approximation, DC/AC first and refinement
    scans with EOBRUN). Arithmetic coding and 12-bit raise.

    Foreign-bytes contract (round 8): ANY malformed/truncated input
    raises a clean ValueError (or NotImplementedError for declared
    out-of-subset features) — low-level IndexError/struct.error from
    short segment reads are wrapped at this boundary so tolerant
    count-and-drop pipelines never see them."""
    try:
        return _decode_jpeg_inner(content)
    except (IndexError, struct.error) as e:
        raise ValueError(f"JPEG stream truncated or malformed: {e}") from e


def _decode_jpeg_inner(content: bytes):
    if content[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}
    frame = None
    restart_interval = 0
    progressive = False
    store = None  # progressive coefficient accumulator (zigzag order)
    n = len(content)
    while pos + 2 <= n:
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
                if len(bits) < 16:
                    raise ValueError("JPEG DHT segment truncated")
                nv = sum(bits)
                vals = list(body[off + 17 : off + 17 + nv])
                if len(vals) < nv:
                    raise ValueError("JPEG DHT segment truncated")
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
        elif marker == 0xC2:  # SOF2 progressive
            prec, fh, fw, ncomp = struct.unpack_from(">BHHB", body, 0)
            if prec != 8:
                raise NotImplementedError("only 8-bit precision")
            comps = []
            for ci in range(ncomp):
                cid, hv, tq = body[6 + 3 * ci : 9 + 3 * ci]
                comps.append((cid, hv >> 4, hv & 0xF, tq))
            frame = (fh, fw, comps)
            progressive = True
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = body[0]
            scan_list = [
                (body[1 + 2 * si], body[2 + 2 * si]) for si in range(ns)
            ]
            if not progressive:
                scan_tables = {
                    cs: (t >> 4, t & 0xF) for cs, t in scan_list
                }
                return _decode_scan(
                    content, pos, frame, scan_tables, qt, huff,
                    restart_interval,
                )
            ss, se = body[1 + 2 * ns], body[2 + 2 * ns]
            ahal = body[3 + 2 * ns]
            ah, al = ahal >> 4, ahal & 0xF
            if (ss == 0 and se != 0) or se > 63 or ss > se:
                raise ValueError("bad progressive spectral selection")
            if store is None:
                store = _alloc_coef_store(frame)
            if ss == 0:
                pos = _decode_prog_dc(
                    content, pos, frame, scan_list, huff, store,
                    ah, al, restart_interval,
                )
            else:
                pos = _decode_prog_ac(
                    content, pos, frame, scan_list, huff, store,
                    ss, se, ah, al, restart_interval,
                )
            continue  # pos already sits at the next marker
        # all other markers (APPn, COM): skipped
    if progressive and store is not None:
        return _progressive_result(frame, store, qt)
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
    return _planes_to_image(planes, comps, hmax, vmax, fh, fw)


def _planes_to_image(planes, comps, hmax, vmax, fh, fw):
    """Level shift, chroma upsample, crop, and (for color) YCbCr→RGB —
    the shared back half of baseline and progressive decode."""
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


# -- progressive (SOF2, T.81 Annex G) ---------------------------------


def _frame_geometry(frame):
    fh, fw, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcus_x = -(-fw // (8 * hmax))
    mcus_y = -(-fh // (8 * vmax))
    return hmax, vmax, mcus_x, mcus_y


def _true_block_dims(frame, ci):
    """Non-interleaved scans cover the component's TRUE block grid
    (ceil(comp_size/8)), not the MCU-padded grid (T.81 §A.2.2)."""
    fh, fw, comps = frame
    hmax, vmax, _, _ = _frame_geometry(frame)
    _cid, hs, vs, _tq = comps[ci]
    cw = -(-fw * hs // hmax)
    ch = -(-fh * vs // vmax)
    return -(-ch // 8), -(-cw // 8)


def _alloc_coef_store(frame):
    """Per-component (BY, BX, 64) int32 coefficient grids in ZIGZAG
    order, sized to the MCU-padded grid (interleaved DC scans cover
    padding blocks; AC scans cover only the true grid inside it)."""
    _fh, _fw, comps = frame
    _hmax, _vmax, mcus_x, mcus_y = _frame_geometry(frame)
    return [
        np.zeros((mcus_y * vs, mcus_x * hs, 64), np.int32)
        for _cid, hs, vs, _tq in comps
    ]


def _decode_prog_dc(content, pos, frame, scan_list, huff, store, ah, al, ri):
    """One DC scan: first pass (Ah=0) is DPCM in the Al-shifted
    domain; refinement (Ah>0) appends one raw bit per block. Units for
    restart counting are MCUs (interleaved) or blocks (single-comp)."""
    _fh, _fw, comps = frame
    _hmax, _vmax, mcus_x, mcus_y = _frame_geometry(frame)
    idxs = []
    for cs, tdta in scan_list:
        ci = next(i for i, c in enumerate(comps) if c[0] == cs)
        idxs.append((ci, tdta >> 4))
    units = []
    if len(idxs) > 1:  # interleaved MCU order over the padded grid
        for my in range(mcus_y):
            for mx in range(mcus_x):
                u = []
                for ci, td in idxs:
                    _cid, hs, vs, _tq = comps[ci]
                    for by in range(vs):
                        for bx in range(hs):
                            u.append((ci, my * vs + by, mx * hs + bx, td))
                units.append(u)
    else:
        ci, td = idxs[0]
        bh, bw = _true_block_dims(frame, ci)
        for by in range(bh):
            for bx in range(bw):
                units.append([(ci, by, bx, td)])
    reader = _BitReader(content, pos)
    pred = {ci: 0 for ci, _td in idxs}
    n_rst = 0
    for ui, unit in enumerate(units):
        if ri and ui and ui % ri == 0:
            reader.restart(n_rst % 8)
            n_rst += 1
            pred = dict.fromkeys(pred, 0)
        for ci, by, bx, td in unit:
            zz = store[ci][by, bx]
            if ah == 0:
                size = _read_symbol(reader, huff[(0, td)])
                pred[ci] += _extend(reader.bits(size), size)
                zz[0] = pred[ci] << al
            elif reader.bits(1):
                zz[0] |= 1 << al
    return reader.pos


def _decode_prog_ac(
    content, pos, frame, scan_list, huff, store, ss, se, ah, al, ri
):
    """One AC scan (always single-component, raster over the true
    block grid): first pass decodes magnitudes at precision Al with
    EOBRUN block skips; refinement adds one bit of precision with
    correction bits on already-nonzero coefficients (Annex G.2)."""
    if len(scan_list) != 1:
        raise ValueError("progressive AC scan must be single-component")
    _fh, _fw, comps = frame
    cs, tdta = scan_list[0]
    ci = next(i for i, c in enumerate(comps) if c[0] == cs)
    ac = huff[(1, tdta & 0xF)]
    bh, bw = _true_block_dims(frame, ci)
    reader = _BitReader(content, pos)
    eobrun = 0
    n_rst = 0
    unit = 0
    for by in range(bh):
        for bx in range(bw):
            if ri and unit and unit % ri == 0:
                reader.restart(n_rst % 8)
                n_rst += 1
                eobrun = 0
            unit += 1
            zz = store[ci][by, bx]
            if ah == 0:
                eobrun = _ac_first_block(reader, ac, zz, ss, se, al, eobrun)
            else:
                eobrun = _ac_refine_block(reader, ac, zz, ss, se, al, eobrun)
    return reader.pos


def _ac_first_block(reader, ac, zz, ss, se, al, eobrun):
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        sym = _read_symbol(reader, ac)
        r, s = sym >> 4, sym & 0xF
        if s == 0:
            if r != 15:
                eobrun = (1 << r) - 1
                if r:
                    eobrun += reader.bits(r)
                return eobrun
            k += 16  # ZRL
            continue
        k += r
        if k > se:
            raise ValueError("AC run past band end")
        zz[k] = _extend(reader.bits(s), s) << al
        k += 1
    return 0


def _ac_refine_block(reader, ac, zz, ss, se, al, eobrun):
    """The successive-approximation refinement pass: newly-nonzero
    coefficients arrive as (run-of-zero-history, ±1<<Al) symbols;
    every already-nonzero coefficient passed on the way — and, in the
    EOB region, through the end of the band — consumes a correction
    bit that may add 1<<Al toward its sign (G.2 / the canonical
    decode_mcu_AC_refine structure)."""
    p1, m1 = 1 << al, -(1 << al)
    k = ss
    if eobrun == 0:
        while k <= se:
            sym = _read_symbol(reader, ac)
            r, s = sym >> 4, sym & 0xF
            val = 0
            if s == 0:
                if r != 15:
                    eobrun = 1 << r
                    if r:
                        eobrun += reader.bits(r)
                    break
                # r == 15: run of 16 zero-history coefficients
            else:
                if s != 1:
                    raise ValueError("bad refinement magnitude")
                val = p1 if reader.bits(1) else m1
            while k <= se:
                c = int(zz[k])
                if c != 0:
                    if reader.bits(1) and (c & p1) == 0:
                        zz[k] = c + (p1 if c > 0 else m1)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if val and k <= se:
                zz[k] = val
            k += 1
    if eobrun > 0:
        while k <= se:
            c = int(zz[k])
            if c != 0 and reader.bits(1) and (c & p1) == 0:
                zz[k] = c + (p1 if c > 0 else m1)
            k += 1
        eobrun -= 1
    return eobrun


def _progressive_result(frame, store, qt):
    fh, fw, comps = frame
    hmax, vmax, _mx, _my = _frame_geometry(frame)
    planes = []
    for ci, (_cid, _hs, _vs, tq) in enumerate(comps):
        grid = store[ci]
        by_n, bx_n = grid.shape[:2]
        plane = np.zeros((by_n * 8, bx_n * 8))
        q = qt[tq]
        for by in range(by_n):
            for bx in range(bx_n):
                coefs = np.zeros(64)
                coefs[ZIGZAG] = grid[by, bx]
                plane[8 * by : 8 * by + 8, 8 * bx : 8 * bx + 8] = _idct(
                    coefs.reshape(8, 8) * q
                )
        planes.append(plane)
    return _planes_to_image(planes, comps, hmax, vmax, fh, fw)


def _sos_segment(scan_comps, ss, se, ah, al):
    body = bytes([len(scan_comps)])
    for cid, td, ta in scan_comps:
        body += bytes([cid, td << 4 | ta])
    body += bytes([ss, se, ah << 4 | al])
    return b"\xff\xda" + struct.pack(">H", len(body) + 2) + body


def _enc_ac_first(wtr, zz, ss, se, al):
    """AC first pass over one block at precision Al (G.1.2.2: the
    point transform divides MAGNITUDES, keeping sign)."""
    r = 0
    for k in range(ss, se + 1):
        v = int(zz[k])
        t = abs(v) >> al
        if t == 0:
            r += 1
            continue
        while r > 15:
            code, length = _AC_CODES[0xF0]
            wtr.write(code, length)
            r -= 16
        size, bitsv = _magnitude(-t if v < 0 else t)
        code, length = _AC_CODES[(r << 4) | size]
        wtr.write(code, length)
        wtr.write(bitsv, size)
        r = 0
    if r:
        code, length = _AC_CODES[0x00]  # EOB, run of 1
        wtr.write(code, length)


def _enc_ac_refine(wtr, zz, ss, se, al):
    """AC refinement pass over one block (G.1.2.3 / the canonical
    encode_mcu_AC_refine): newly-nonzero coefficients (|coef|>>Al ==
    1) emit (run, 1) + sign; already-nonzero ones buffer their next
    magnitude bit, flushed after each emitted symbol; trailing state
    folds into a run-of-1 EOB. EOB runs are flushed per block, which
    is legal (EOBRUN=1) and keeps the encoder simple."""
    absv = [0] * (se + 1)
    eob = ss - 1
    for k in range(ss, se + 1):
        t = abs(int(zz[k])) >> al
        absv[k] = t
        if t == 1:
            eob = k
    r = 0
    pending = []
    for k in range(ss, se + 1):
        t = absv[k]
        if t == 0:
            r += 1
            continue
        while r > 15 and k <= eob:
            code, length = _AC_CODES[0xF0]
            wtr.write(code, length)
            r -= 16
            for b in pending:
                wtr.write(b, 1)
            pending = []
        if t > 1:
            pending.append(t & 1)
            continue
        code, length = _AC_CODES[(r << 4) | 1]
        wtr.write(code, length)
        r = 0
        wtr.write(1 if int(zz[k]) > 0 else 0, 1)
        for b in pending:
            wtr.write(b, 1)
        pending = []
    if r or pending:
        code, length = _AC_CODES[0x00]
        wtr.write(code, length)
        for b in pending:
            wtr.write(b, 1)


def encode_jpeg_progressive(
    pixels,
    quant_luma=None,
    quant_chroma=None,
    subsampling: str = "444",
) -> bytes:
    """numpy uint8 (H, W) gray or (H, W, 3) RGB → PROGRESSIVE JFIF
    bytes (SOF2) with a four-stage scan script that exercises every
    Annex-G scan type: interleaved DC first at Al=1, per-component AC
    first (Ss=1..63) at Al=1, DC refinement to Al=0, per-component AC
    refinement to Al=0. The quantized coefficients are identical to
    what the baseline encoder produces, so decoding a progressive
    stream must yield pixels BIT-IDENTICAL to the baseline round-trip
    — the property the tests pin."""
    _px, gray, ql, qc, planes, sampling, quants, h, w = _encode_setup(
        pixels, quant_luma, quant_chroma, subsampling
    )
    ncomp = len(planes)
    hmax = max(s[0] for s in sampling)
    vmax = max(s[1] for s in sampling)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    # quantize everything up front, zigzag order, MCU-padded grids
    coef = []
    for ci, plane in enumerate(planes):
        hs, vs = sampling[ci]
        tw, th_ = mcus_x * 8 * hs, mcus_y * 8 * vs
        ph, pw = th_ - plane.shape[0], tw - plane.shape[1]
        padded = np.pad(
            plane, ((0, max(0, ph)), (0, max(0, pw))), mode="edge"
        )
        grid = np.zeros((mcus_y * vs, mcus_x * hs, 64), np.int32)
        for by in range(grid.shape[0]):
            for bx in range(grid.shape[1]):
                block = padded[8 * by : 8 * by + 8, 8 * bx : 8 * bx + 8]
                q = np.round(_fdct(block) / quants[ci]).astype(np.int32)
                grid[by, bx] = q.reshape(64)[ZIGZAG]
        coef.append(grid)

    out = bytearray(b"\xff\xd8")
    jfif = b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    out += b"\xff\xe0" + struct.pack(">H", len(jfif) + 2) + jfif
    for tq, q in enumerate([ql] if gray else [ql, qc]):
        body = bytes([tq]) + bytes(
            int(q.reshape(64)[ZIGZAG][k]) for k in range(64)
        )
        out += b"\xff\xdb" + struct.pack(">H", len(body) + 2) + body
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci in range(ncomp):
        hs, vs = sampling[ci]
        sof += bytes([ci + 1, hs << 4 | vs, 0 if gray else (0 if ci == 0 else 1)])
    out += b"\xff\xc2" + struct.pack(">H", len(sof) + 2) + sof
    out += _dht_segment(0, 0, _DC_BITS, _DC_VALS)
    out += _dht_segment(1, 0, _AC_BITS, _AC_VALS)

    frame = (h, w, [(ci + 1, *sampling[ci], 0) for ci in range(ncomp)])

    # scan 1: DC first, interleaved, Al=1
    out += _sos_segment([(ci + 1, 0, 0) for ci in range(ncomp)], 0, 0, 0, 1)
    wtr = _BitWriter()
    pred = [0] * ncomp
    for my in range(mcus_y):
        for mx in range(mcus_x):
            for ci in range(ncomp):
                hs, vs = sampling[ci]
                for by in range(vs):
                    for bx in range(hs):
                        v = int(coef[ci][my * vs + by, mx * hs + bx, 0]) >> 1
                        size, bitsv = _magnitude(v - pred[ci])
                        pred[ci] = v
                        code, length = _DC_CODES[size]
                        wtr.write(code, length)
                        if size:
                            wtr.write(bitsv, size)
    out += wtr.flush()

    # scans 2..: AC first per component, Ss=1..63, Al=1
    for ci in range(ncomp):
        out += _sos_segment([(ci + 1, 0, 0)], 1, 63, 0, 1)
        wtr = _BitWriter()
        bh, bw = _true_block_dims(frame, ci)
        for by in range(bh):
            for bx in range(bw):
                _enc_ac_first(wtr, coef[ci][by, bx], 1, 63, 1)
        out += wtr.flush()

    # DC refinement to Al=0: raw bits, no Huffman
    out += _sos_segment([(ci + 1, 0, 0) for ci in range(ncomp)], 0, 0, 1, 0)
    wtr = _BitWriter()
    for my in range(mcus_y):
        for mx in range(mcus_x):
            for ci in range(ncomp):
                hs, vs = sampling[ci]
                for by in range(vs):
                    for bx in range(hs):
                        wtr.write(
                            int(coef[ci][my * vs + by, mx * hs + bx, 0]) & 1,
                            1,
                        )
    out += wtr.flush()

    # AC refinement per component to Al=0
    for ci in range(ncomp):
        out += _sos_segment([(ci + 1, 0, 0)], 1, 63, 1, 0)
        wtr = _BitWriter()
        bh, bw = _true_block_dims(frame, ci)
        for by in range(bh):
            for bx in range(bw):
                _enc_ac_refine(wtr, coef[ci][by, bx], 1, 63, 0)
        out += wtr.flush()

    out += b"\xff\xd9"
    return bytes(out)
