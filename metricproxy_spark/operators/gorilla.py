"""Gorilla time-series compression — the in-memory TSDB codec from
the public paper (Pelkonen et al., "Gorilla: A Fast, Scalable,
In-Memory Time Series Database", VLDB 2015, §4.1) that Prometheus'
TSDB chunks and M3/InfluxDB derivatives popularized. Lossless for
ANY (int64 second, float64 value) stream:

- Timestamps (§4.1.1): block header stores t0 raw (64 bits) and the
  first delta in 14 bits; every later point stores the
  delta-of-delta D through a prefix code —
  ``0`` for D == 0, ``10``+7 bits for [-63, 64], ``110``+9 bits for
  [-255, 256], ``1110``+12 bits for [-2047, 2048], ``1111``+32 bits
  otherwise (each bucket stores D + bias so the all-ones escape is
  unambiguous).
- Values (§4.1.2): first value raw (64 bits); every later value XORs
  with its predecessor — ``0`` when the XOR is zero, else ``1`` and a
  control bit: ``0`` reuses the previous leading/length window and
  stores only the meaningful bits inside it, ``1`` stores 5 bits of
  leading-zero count, 6 bits of meaningful-bit length, then the bits.

Lossless means the roundtrip is bit-exact by construction — the FLAC
lever: any closed-form test series gives an exact oracle with no
float discipline. Regular cadences (the metrics common case) spend
~1-2 bits per timestamp and ~1 bit per repeated value, the paper's
headline 12x; the compression-bound property is pinned in tests.

Used Arrow-batched (mapInPandas) like every codec here: series in,
bytes out, map-only. Foreign-bytes contract: truncated/malformed
input raises a clean ValueError.

Parity loci: SURVEY §3 row L5/L6 (codec family); [P: Gorilla VLDB'15
§4.1].
"""

from __future__ import annotations

import struct

import numpy as np

_MAGIC = b"GOR1"

# (prefix-code bits, payload width, bias) per §4.1.1 bucket
_TS_BUCKETS = (
    ((0b10, 2), 7, 63),       # [-63, 64]
    ((0b110, 3), 9, 255),     # [-255, 256]
    ((0b1110, 4), 12, 2047),  # [-2047, 2048]
)


class _BitWriter:
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

    def finish(self) -> bytes:
        if self._n:
            self.write(0, 8 - self._n)
        return bytes(self.out)


class _BitReader:
    def __init__(self, buf: bytes) -> None:
        self.buf = buf
        self.bytepos = 0
        self.bitpos = 0

    def read(self, nbits: int) -> int:
        v = 0
        while nbits:
            if self.bytepos >= len(self.buf):
                raise ValueError("gorilla stream truncated")
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


def compress_gorilla(ts, values, first_delta_bits: int = 14) -> bytes:
    """(int64 seconds array, float64 array) → Gorilla block bytes.

    ``first_delta_bits`` is the paper's 14 for 2-hour blocks; longer
    blocks (e.g. day-aligned) pass a wider field — the width is
    recorded in the header byte so decode is self-describing."""
    if not (1 <= first_delta_bits <= 32):
        raise ValueError("first_delta_bits must be in 1..32")
    t = np.asarray(ts, np.int64)
    v = np.asarray(values, np.float64)
    if t.shape != v.shape or t.ndim != 1:
        raise ValueError("ts and values must be equal-length 1-D")
    n = len(t)
    out = bytearray(_MAGIC)
    out += struct.pack(">IB", n, first_delta_bits)
    if n == 0:
        return bytes(out)
    w = _BitWriter()
    w.write(int(t[0]) & ((1 << 64) - 1), 64)
    w.write(int(np.float64(v[0]).view(np.int64)) & ((1 << 64) - 1), 64)
    win = _Window()  # ONE value window carried across the whole block
    if n > 1:
        d0 = int(t[1]) - int(t[0])
        if not (0 <= d0 < (1 << first_delta_bits)):
            raise ValueError("first timestamp delta out of header range")
        w.write(d0, first_delta_bits)
        _write_value(w, int(np.float64(v[1]).view(np.int64)),
                     int(np.float64(v[0]).view(np.int64)), win)
    prev_delta = int(t[1]) - int(t[0]) if n > 1 else 0
    for i in range(2, n):
        dod = (int(t[i]) - int(t[i - 1])) - prev_delta
        prev_delta = int(t[i]) - int(t[i - 1])
        if dod == 0:
            w.write(0, 1)
        else:
            for (code, cbits), width, bias in _TS_BUCKETS:
                if -bias <= dod <= bias + 1:
                    w.write(code, cbits)
                    w.write(dod + bias, width)
                    break
            else:
                if not (-(1 << 31) <= dod < (1 << 31)):
                    # The 32-bit escape bucket cannot represent this
                    # delta-of-delta; truncating would silently corrupt
                    # timestamps, so refuse (mirrors first-delta check).
                    raise ValueError("timestamp delta-of-delta exceeds 32-bit escape range")
                w.write(0b1111, 4)
                w.write(dod & 0xFFFFFFFF, 32)
        _write_value(w, int(np.float64(v[i]).view(np.int64)),
                     int(np.float64(v[i - 1]).view(np.int64)), win)
    return bytes(out) + w.finish()


class _Window:
    """Previous leading-zeros / meaningful-length value window."""

    def __init__(self) -> None:
        self.leading = -1
        self.length = 0


def _write_value(w: _BitWriter, cur: int, prev: int, win: _Window) -> None:
    xor = (cur ^ prev) & ((1 << 64) - 1)
    if xor == 0:
        w.write(0, 1)
        return
    w.write(1, 1)
    lead = 64 - xor.bit_length()
    trail = (xor & -xor).bit_length() - 1
    length = 64 - lead - trail
    if (
        win.leading >= 0
        and lead >= win.leading
        and 64 - win.leading - win.length <= trail
    ):
        w.write(0, 1)
        w.write(xor >> (64 - win.leading - win.length), win.length)
    else:
        lead = min(lead, 31)  # 5-bit field
        length = 64 - lead - trail
        w.write(1, 1)
        w.write(lead, 5)
        w.write(length & 0x3F, 6)  # 64 encodes as 0 (length >= 1 always)
        w.write(xor >> trail, length)
        win.leading, win.length = lead, length


def decompress_gorilla(blob: bytes):
    """Gorilla block bytes → (int64 ts array, float64 values array)."""
    if blob[:4] != _MAGIC:
        raise ValueError("not a gorilla block")
    if len(blob) < 9:
        raise ValueError("gorilla stream truncated")
    n, first_delta_bits = struct.unpack_from(">IB", blob, 4)
    if not (1 <= first_delta_bits <= 32):
        raise ValueError("bad gorilla first-delta width")
    # Bound the declared count against the payload BEFORE allocating:
    # every point past the first costs >= 2 bits, so a malformed header
    # claiming n=2^32-1 over a 9-byte blob must not attempt a 64 GB
    # np.empty. (First point alone costs 128 bits.)
    payload_bits = 8 * (len(blob) - 9)
    if n > 0 and payload_bits < 128 + 2 * (n - 1):
        raise ValueError("gorilla header count exceeds payload capacity")
    r = _BitReader(blob[9:])
    ts = np.empty(n, np.int64)
    vals = np.empty(n, np.int64)
    if n == 0:
        return ts, vals.view(np.float64)
    t0 = r.read(64)
    ts[0] = t0 - (1 << 64) if t0 >> 63 else t0
    vals[0] = _signed64(r.read(64))
    if n > 1:
        try:
            delta = r.read(first_delta_bits)
            ts[1] = ts[0] + delta
            win = _Window()
            vals[1] = _read_value(r, int(vals[0]), win)
            for i in range(2, n):
                if r.read(1) == 0:
                    dod = 0
                else:
                    matched = False
                    for (code, cbits), width, bias in _TS_BUCKETS:
                        # prefix already consumed one '1'; read remaining
                        if r.read(1) == 0:
                            dod = r.read(width) - bias
                            matched = True
                            break
                    if not matched:
                        raw = r.read(32)
                        dod = raw - (1 << 32) if raw >> 31 else raw
                delta += dod
                ts[i] = ts[i - 1] + delta
                vals[i] = _read_value(r, int(vals[i - 1]), win)
        except OverflowError as exc:
            # Adversarial deltas can walk the running timestamp outside
            # int64; numpy raises OverflowError on assignment — surface
            # it under the foreign-bytes clean-ValueError contract.
            raise ValueError("gorilla timestamp overflows int64") from exc
    return ts, vals.view(np.float64)


def _signed64(u: int) -> int:
    return u - (1 << 64) if u >> 63 else u


def _read_value(r: _BitReader, prev: int, win: _Window) -> int:
    if r.read(1) == 0:
        return prev
    if r.read(1) == 0:
        if win.leading < 0:
            raise ValueError("gorilla value window reused before set")
        xor = r.read(win.length) << (64 - win.leading - win.length)
    else:
        lead = r.read(5)
        length = r.read(6) or 64
        trail = 64 - lead - length
        if trail < 0:
            raise ValueError("gorilla value window out of range")
        xor = r.read(length) << trail
        win.leading, win.length = lead, length
    return _signed64((prev ^ xor) & ((1 << 64) - 1))
