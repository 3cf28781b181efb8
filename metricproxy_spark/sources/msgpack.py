"""MessagePack wire codec — pure-Python, spec-complete for the JSON
data model (the subset telemetry agents emit).

MessagePack (msgpack.org spec) is the compact binary JSON used by
fluentd's forward protocol and various agent pipelines. This module
implements encode/decode for nil, bool, all int widths (fixint,
u/int 8-64), float64, str (fixstr/8/16/32), bin 8/16/32, array
(fix/16/32) and map (fix/16/32) — i.e. every type a JSON-shaped
datapoint payload can contain. float32 decodes too (foreign
encoders); the encoder always emits float64.

Encoding is canonical-smallest (ints take the shortest form, str/bin/
array/map take the smallest length header), so synthesized payloads
are deterministic — the lever that lets wire queries value-check the
full encode → decode chain against a SQL recompute.

Used Arrow-batched (mapInPandas) like the protobuf codec
(`sources/sfx_protobuf.py`): bytes in, rows out; no row-at-a-time
Python on any hot path outside the batch.

Parity loci: SURVEY §3 S-ext wire formats; [P: msgpack.org spec].
"""

from __future__ import annotations

import struct


def encode_msgpack(obj) -> bytes:
    out = bytearray()
    _enc(obj, out)
    return bytes(out)


def _enc(o, out: bytearray) -> None:
    if o is None:
        out.append(0xC0)
    elif o is True:
        out.append(0xC3)
    elif o is False:
        out.append(0xC2)
    elif isinstance(o, int):
        if 0 <= o <= 0x7F:
            out.append(o)
        elif -32 <= o < 0:
            out.append(0x100 + o)
        elif 0 <= o <= 0xFF:
            out += bytes([0xCC, o])
        elif 0 <= o <= 0xFFFF:
            out += b"\xcd" + struct.pack(">H", o)
        elif 0 <= o <= 0xFFFFFFFF:
            out += b"\xce" + struct.pack(">I", o)
        elif 0 <= o <= 0xFFFFFFFFFFFFFFFF:
            out += b"\xcf" + struct.pack(">Q", o)
        elif -0x80 <= o < 0:
            out += b"\xd0" + struct.pack(">b", o)
        elif -0x8000 <= o < 0:
            out += b"\xd1" + struct.pack(">h", o)
        elif -0x80000000 <= o < 0:
            out += b"\xd2" + struct.pack(">i", o)
        elif -0x8000000000000000 <= o < 0:
            out += b"\xd3" + struct.pack(">q", o)
        else:
            raise ValueError("int out of msgpack range")
    elif isinstance(o, float):
        out += b"\xcb" + struct.pack(">d", o)
    elif isinstance(o, str):
        b = o.encode("utf-8")
        n = len(b)
        if n <= 31:
            out.append(0xA0 | n)
        elif n <= 0xFF:
            out += bytes([0xD9, n])
        elif n <= 0xFFFF:
            out += b"\xda" + struct.pack(">H", n)
        else:
            out += b"\xdb" + struct.pack(">I", n)
        out += b
    elif isinstance(o, (bytes, bytearray)):
        n = len(o)
        if n <= 0xFF:
            out += bytes([0xC4, n])
        elif n <= 0xFFFF:
            out += b"\xc5" + struct.pack(">H", n)
        else:
            out += b"\xc6" + struct.pack(">I", n)
        out += bytes(o)
    elif isinstance(o, (list, tuple)):
        n = len(o)
        if n <= 15:
            out.append(0x90 | n)
        elif n <= 0xFFFF:
            out += b"\xdc" + struct.pack(">H", n)
        else:
            out += b"\xdd" + struct.pack(">I", n)
        for v in o:
            _enc(v, out)
    elif isinstance(o, dict):
        n = len(o)
        if n <= 15:
            out.append(0x80 | n)
        elif n <= 0xFFFF:
            out += b"\xde" + struct.pack(">H", n)
        else:
            out += b"\xdf" + struct.pack(">I", n)
        for k, v in o.items():
            _enc(k, out)
            _enc(v, out)
    else:
        raise TypeError(f"msgpack cannot encode {type(o).__name__}")


def decode_msgpack(buf: bytes):
    """Decode one msgpack object; raises ValueError on trailing
    garbage and on ANY malformed input (truncation, invalid UTF-8,
    unhashable map keys) — foreign wire bytes must fail cleanly, never
    leak IndexError/UnicodeDecodeError into a tolerant-decode path."""
    try:
        obj, pos = _dec(buf, 0)
    except (IndexError, UnicodeDecodeError, TypeError, struct.error) as e:
        raise ValueError(f"malformed msgpack: {e}") from e
    if pos != len(buf):
        raise ValueError(f"trailing bytes after msgpack object at {pos}")
    return obj


def decode_msgpack_stream(buf: bytes) -> list:
    """Decode back-to-back msgpack objects (fluentd-forward framing).
    Same clean-ValueError contract as :func:`decode_msgpack`."""
    out, pos = [], 0
    try:
        while pos < len(buf):
            obj, pos = _dec(buf, pos)
            out.append(obj)
    except (IndexError, UnicodeDecodeError, TypeError, struct.error) as e:
        raise ValueError(f"malformed msgpack at object {len(out)}: {e}") from e
    return out


def _need(buf: bytes, pos: int, n: int) -> None:
    """Raise ValueError when fewer than ``n`` bytes remain at ``pos``.

    int.from_bytes / bytes slicing silently accept short slices, so every
    fixed-width read must bounds-check first or a truncated suffix decodes
    to a WRONG value instead of raising (the module contract is that ANY
    malformed input raises a clean ValueError).
    """
    if pos + n > len(buf):
        raise ValueError(f"truncated msgpack: need {n} bytes at {pos}, have {len(buf) - pos}")


def _dec(buf: bytes, pos: int):
    t = buf[pos]
    pos += 1
    if t <= 0x7F:
        return t, pos
    if t >= 0xE0:
        return t - 0x100, pos
    if 0x80 <= t <= 0x8F:
        return _dec_map(buf, pos, t & 0xF)
    if 0x90 <= t <= 0x9F:
        return _dec_arr(buf, pos, t & 0xF)
    if 0xA0 <= t <= 0xBF:
        n = t & 0x1F
        _need(buf, pos, n)
        return buf[pos : pos + n].decode("utf-8"), pos + n
    if t == 0xC0:
        return None, pos
    if t == 0xC2:
        return False, pos
    if t == 0xC3:
        return True, pos
    if t in (0xC4, 0xC5, 0xC6):
        w = {0xC4: 1, 0xC5: 2, 0xC6: 4}[t]
        _need(buf, pos, w)
        n = int.from_bytes(buf[pos : pos + w], "big")
        pos += w
        _need(buf, pos, n)
        return bytes(buf[pos : pos + n]), pos + n
    if t == 0xCA:
        return struct.unpack_from(">f", buf, pos)[0], pos + 4
    if t == 0xCB:
        return struct.unpack_from(">d", buf, pos)[0], pos + 8
    if t in (0xCC, 0xCD, 0xCE, 0xCF):
        w = 1 << (t - 0xCC)
        _need(buf, pos, w)
        return int.from_bytes(buf[pos : pos + w], "big"), pos + w
    if t in (0xD0, 0xD1, 0xD2, 0xD3):
        w = 1 << (t - 0xD0)
        _need(buf, pos, w)
        return int.from_bytes(buf[pos : pos + w], "big", signed=True), pos + w
    if t in (0xD9, 0xDA, 0xDB):
        w = {0xD9: 1, 0xDA: 2, 0xDB: 4}[t]
        _need(buf, pos, w)
        n = int.from_bytes(buf[pos : pos + w], "big")
        pos += w
        _need(buf, pos, n)
        return buf[pos : pos + n].decode("utf-8"), pos + n
    if t in (0xDC, 0xDD):
        w = 2 if t == 0xDC else 4
        _need(buf, pos, w)
        n = int.from_bytes(buf[pos : pos + w], "big")
        return _dec_arr(buf, pos + w, n)
    if t in (0xDE, 0xDF):
        w = 2 if t == 0xDE else 4
        _need(buf, pos, w)
        n = int.from_bytes(buf[pos : pos + w], "big")
        return _dec_map(buf, pos + w, n)
    raise ValueError(f"unsupported msgpack type byte 0x{t:02x}")


def _dec_arr(buf: bytes, pos: int, n: int):
    out = []
    for _ in range(n):
        v, pos = _dec(buf, pos)
        out.append(v)
    return out, pos


def _dec_map(buf: bytes, pos: int, n: int):
    out = {}
    for _ in range(n):
        k, pos = _dec(buf, pos)
        v, pos = _dec(buf, pos)
        out[k] = v
    return out, pos
