"""GIF87a/89a codec — pure numpy + stdlib, from the public spec
(W3C/CompuServe "GRAPHICS INTERCHANGE FORMAT Version 89a", 1990).

The fourth real compressed codec next to PNG/JPEG/MJPEG-AVI: header +
logical screen descriptor, global color table, optional Graphic
Control Extensions (frame delays, GIF89a), image descriptors, and the
GIF flavor of LZW (variable code width 3..12 bits, LSB-first bit
packing, CLEAR/EOI codes, 255-byte data sub-blocks).

LZW code-width synchronization (the classic off-by-one): the encoder
widens after ASSIGNING entry 2^cs (its next emission may need cs+1
bits); the decoder runs one table entry behind the encoder, so it
widens after assigning entry 2^cs - 1 — both switch at the same BIT
position of the stream. At 4096 entries the encoder emits CLEAR and
resets; the decoder also tolerates foreign "deferred clear" streams by
freezing its table instead of overflowing.

The 4-pass interlace scheme is supported on both encode and decode
(spec appendix E row schedule).
Indices are encoded losslessly — GIF is a lossless format for <=256
colors — so integer-exact oracles need no special construction.
"""

from __future__ import annotations

import struct

import numpy as np

_MAX_CODE = 4096

# GIF 4-pass interlace row schedule (spec appendix E): pass starts/steps
_INTERLACE = ((0, 8), (4, 8), (2, 4), (1, 2))


def _interlace_order(h: int) -> np.ndarray:
    """Row indices in on-wire order for an interlaced frame."""
    return np.concatenate(
        [np.arange(start, h, step) for start, step in _INTERLACE]
    ).astype(np.int64)


class _BitWriter:
    """LSB-first bit packer (GIF's LZW bit order)."""

    def __init__(self) -> None:
        self.out = bytearray()
        self._acc = 0
        self._nbits = 0

    def write(self, code: int, width: int) -> None:
        self._acc |= code << self._nbits
        self._nbits += width
        while self._nbits >= 8:
            self.out.append(self._acc & 0xFF)
            self._acc >>= 8
            self._nbits -= 8

    def flush(self) -> bytes:
        if self._nbits:
            self.out.append(self._acc & 0xFF)
        return bytes(self.out)


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self._acc = 0
        self._nbits = 0

    def read(self, width: int) -> int | None:
        while self._nbits < width:
            if self.pos >= len(self.data):
                return None
            self._acc |= self.data[self.pos] << self._nbits
            self.pos += 1
            self._nbits += 8
        code = self._acc & ((1 << width) - 1)
        self._acc >>= width
        self._nbits -= width
        return code


def lzw_encode(indices: np.ndarray, min_code_size: int) -> bytes:
    """GIF-LZW compress a flat uint8 index stream."""
    clear = 1 << min_code_size
    eoi = clear + 1
    bw = _BitWriter()

    def fresh():
        return {bytes([i]): i for i in range(clear)}, eoi + 1, min_code_size + 1

    table, nxt, cs = fresh()
    bw.write(clear, cs)
    w = b""
    for sym in indices.astype(np.uint8).tobytes():
        wk = w + bytes([sym])
        if wk in table:
            w = wk
            continue
        bw.write(table[w], cs)
        table[wk] = nxt
        nxt += 1
        if nxt == (1 << cs) and cs < 12:
            cs += 1
        elif nxt == _MAX_CODE:
            bw.write(clear, cs)
            table, nxt, cs = fresh()
        w = bytes([sym])
    if w:
        bw.write(table[w], cs)
    bw.write(eoi, cs)
    return bw.flush()


def lzw_decode(data: bytes, min_code_size: int, n_expected: int) -> np.ndarray:
    """GIF-LZW decompress to exactly ``n_expected`` uint8 indices."""
    clear = 1 << min_code_size
    eoi = clear + 1
    br = _BitReader(data)
    out = bytearray()

    def fresh():
        return {i: bytes([i]) for i in range(clear)}, eoi + 1, min_code_size + 1

    table, nxt, cs = fresh()
    prev: bytes | None = None
    while len(out) < n_expected:
        code = br.read(cs)
        if code is None or code == eoi:
            break
        if code == clear:
            table, nxt, cs = fresh()
            prev = None
            continue
        if code in table:
            entry = table[code]
        elif code == nxt and prev is not None:
            entry = prev + prev[:1]
        else:
            raise ValueError(f"corrupt LZW stream: code {code} (next={nxt})")
        out += entry
        if prev is not None and nxt < _MAX_CODE:
            table[nxt] = prev + entry[:1]
            nxt += 1
            # decoder runs one table entry behind the encoder: widen
            # after assigning 2^cs - 1 so both flip at the same bit
            if nxt == (1 << cs) - 1 and cs < 12:
                cs += 1
        prev = entry
    if len(out) != n_expected:
        raise ValueError(
            f"LZW stream ended early: {len(out)}/{n_expected} pixels"
        )
    return np.frombuffer(bytes(out), np.uint8)


def _sub_blocks(raw: bytes) -> bytes:
    out = bytearray()
    for i in range(0, len(raw), 255):
        chunk = raw[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


def encode_gif(
    frames: list[np.ndarray] | np.ndarray,
    palette: np.ndarray,
    delays_cs: list[int] | None = None,
    interlace: bool = False,
) -> bytes:
    """Encode index frame(s) + palette to GIF bytes.

    ``frames``: one (h, w) uint8 index array or a list of them (all
    same shape — an animation); ``palette``: (n, 3) uint8 with n a
    power of two in 4..256; ``delays_cs``: per-frame delay in
    centiseconds (GIF89a Graphic Control Extension) — required for
    multi-frame, optional for single; ``interlace``: write rows in
    the spec's 4-pass order (progressive rendering era; decoders must
    still honor it)."""
    if isinstance(frames, np.ndarray):
        frames = [frames]
    n_colors = len(palette)
    bits = max(2, int(n_colors - 1).bit_length())
    if n_colors != 1 << bits or not 4 <= n_colors <= 256:
        raise ValueError("palette length must be a power of two in 4..256")
    h, w = frames[0].shape
    animated = len(frames) > 1
    if animated and delays_cs is None:
        raise ValueError("multi-frame GIF needs delays_cs")
    out = bytearray(b"GIF89a" if (animated or delays_cs) else b"GIF87a")
    out += struct.pack("<HH", w, h)
    out.append(0x80 | ((bits - 1) << 4) | (bits - 1))  # GCT, cr, size
    out += b"\x00\x00"  # bg index, aspect
    out += np.asarray(palette, np.uint8).tobytes()
    for k, fr in enumerate(frames):
        if fr.shape != (h, w):
            raise ValueError("all frames must share one shape")
        if fr.max(initial=0) >= n_colors:
            raise ValueError("index out of palette range")
        if delays_cs is not None:
            out += b"\x21\xf9\x04\x00"  # GCE, block size, no disposal
            out += struct.pack("<H", delays_cs[k] if animated else delays_cs[0])
            out += b"\x00\x00"  # no transparency, terminator
        out += b"\x2c" + struct.pack("<HHHH", 0, 0, w, h)
        out.append(0x40 if interlace else 0x00)
        mcs = max(2, bits)
        out.append(mcs)
        wire = fr[_interlace_order(h)] if interlace else fr
        out += _sub_blocks(lzw_encode(wire.reshape(-1), mcs))
    out.append(0x3B)
    return bytes(out)


def decode_gif(content: bytes) -> tuple[dict, list[np.ndarray], np.ndarray]:
    """Decode GIF bytes -> (meta, [index frames], palette).

    meta: format/width/height/n_colors/n_frames/delays_cs. Local color
    tables are honored per frame (last one wins in the returned
    palette); interlaced frames are de-interlaced back to scanline
    order via the 4-pass GIF89a row schedule. Foreign-bytes contract:
    malformed/truncated input raises a clean ValueError (struct/index
    errors wrapped at this boundary)."""
    try:
        return _decode_gif_inner(content)
    except (IndexError, struct.error) as e:
        raise ValueError(f"GIF stream truncated or malformed: {e}") from e


def _decode_gif_inner(content: bytes) -> tuple[dict, list[np.ndarray], np.ndarray]:
    if content[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF stream")
    w, h = struct.unpack_from("<HH", content, 6)
    packed = content[10]
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(content, np.uint8, n * 3, pos).reshape(n, 3)
        pos += n * 3
    frames: list[np.ndarray] = []
    delays: list[int] = []
    palette = gct
    pending_delay: int | None = None
    while pos < len(content):
        b0 = content[pos]
        pos += 1
        if b0 == 0x3B:  # trailer
            break
        if b0 == 0x21:  # extension
            label = content[pos]
            pos += 1
            if label == 0xF9:  # GCE
                size = content[pos]
                pending_delay = struct.unpack_from(
                    "<H", content, pos + 2
                )[0]
                pos += 1 + size + 1
            else:  # skip any other extension's sub-blocks
                while True:
                    size = content[pos]
                    pos += 1 + size
                    if size == 0:
                        break
            continue
        if b0 != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{b0:02x}")
        _, _, fw, fh = struct.unpack_from("<HHHH", content, pos)
        ipacked = content[pos + 8]
        pos += 9
        interlaced = bool(ipacked & 0x40)
        if ipacked & 0x80:  # local color table
            n = 2 << (ipacked & 0x07)
            palette = np.frombuffer(
                content, np.uint8, n * 3, pos
            ).reshape(n, 3)
            pos += n * 3
        mcs = content[pos]
        pos += 1
        raw = bytearray()
        while True:
            size = content[pos]
            pos += 1
            if size == 0:
                break
            raw += content[pos : pos + size]
            pos += size
        fr = lzw_decode(bytes(raw), mcs, fw * fh).reshape(fh, fw)
        if interlaced:
            # invert the 4-pass row schedule back to scanline order
            deinter = np.empty_like(fr)
            deinter[_interlace_order(fh)] = fr
            fr = deinter
        frames.append(fr)
        delays.append(pending_delay or 0)
        pending_delay = None
    if palette is None:
        raise ValueError("GIF without any color table")
    meta = {
        "format": "gif",
        "width": w,
        "height": h,
        "n_colors": len(palette),
        "n_frames": len(frames),
        "delays_cs": delays,
    }
    return meta, frames, palette
