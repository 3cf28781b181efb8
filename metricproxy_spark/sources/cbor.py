"""CBOR wire codec (RFC 8949) — pure-Python, spec-complete for the
JSON data model plus the CBOR-distinctive forms agents actually emit.

CBOR is the IETF-standard compact binary JSON (CoAP/SenML telemetry,
WebAuthn, COSE). This module implements encode/decode for major types
0/1 (unsigned/negative ints, all widths), 2 (byte strings), 3 (text),
4 (arrays), 5 (maps) and 7 (false/true/null plus float16/32/64
decode; the encoder emits float64). The decoder additionally accepts
the INDEFINITE-LENGTH framing (RFC 8949 §3.2) for arrays, maps and
chunked byte/text strings — the streaming form CoAP senders use —
and the encoder can emit it on request so round-trip tests exercise
both framings. Tags (major type 6) decode transparently to their
content (the RFC's default for unknown tags).

Encoding is preferred-serialization canonical (RFC 8949 §4.1:
shortest-form ints and lengths), so synthesized payloads are
deterministic — the lever that lets wire queries value-check the full
encode → decode chain against a SQL recompute, exactly like the
msgpack twin (`sources/msgpack.py`).

Foreign-bytes contract: ANY malformed input — truncation, bad UTF-8,
reserved additional-info values, stray break codes, nesting/count
headers exceeding the remaining payload — raises a clean ValueError,
never IndexError/UnicodeDecodeError/RecursionError.

Parity loci: SURVEY §3 S-ext wire formats; [P: RFC 8949].
"""

from __future__ import annotations

import struct

_BREAK = object()  # sentinel for the 0xFF stop code
_MAX_DEPTH = 256


def encode_cbor(obj, indefinite: bool = False) -> bytes:
    """Encode one CBOR data item. ``indefinite=True`` frames every
    array and map in the indefinite-length form (strings stay
    definite — chunked strings are a decode-side capability)."""
    out = bytearray()
    _enc(obj, out, indefinite)
    return bytes(out)


def _head(major: int, n: int, out: bytearray) -> None:
    if n < 24:
        out.append((major << 5) | n)
    elif n <= 0xFF:
        out.append((major << 5) | 24)
        out.append(n)
    elif n <= 0xFFFF:
        out.append((major << 5) | 25)
        out += struct.pack(">H", n)
    elif n <= 0xFFFFFFFF:
        out.append((major << 5) | 26)
        out += struct.pack(">I", n)
    elif n <= 0xFFFFFFFFFFFFFFFF:
        out.append((major << 5) | 27)
        out += struct.pack(">Q", n)
    else:
        raise ValueError("CBOR length exceeds 64 bits")


def _enc(o, out: bytearray, indef: bool) -> None:
    if o is None:
        out.append(0xF6)
    elif o is True:
        out.append(0xF5)
    elif o is False:
        out.append(0xF4)
    elif isinstance(o, int):
        if o >= 0:
            _head(0, o, out)
        else:
            _head(1, -1 - o, out)
    elif isinstance(o, float):
        out.append(0xFB)
        out += struct.pack(">d", o)
    elif isinstance(o, str):
        b = o.encode("utf-8")
        _head(3, len(b), out)
        out += b
    elif isinstance(o, (bytes, bytearray)):
        _head(2, len(o), out)
        out += bytes(o)
    elif isinstance(o, (list, tuple)):
        if indef:
            out.append(0x9F)
            for v in o:
                _enc(v, out, indef)
            out.append(0xFF)
        else:
            _head(4, len(o), out)
            for v in o:
                _enc(v, out, indef)
    elif isinstance(o, dict):
        if indef:
            out.append(0xBF)
            for k, v in o.items():
                _enc(k, out, indef)
                _enc(v, out, indef)
            out.append(0xFF)
        else:
            _head(5, len(o), out)
            for k, v in o.items():
                _enc(k, out, indef)
                _enc(v, out, indef)
    else:
        raise TypeError(f"CBOR cannot encode {type(o).__name__}")


def decode_cbor(buf: bytes):
    """Decode exactly one CBOR data item; trailing bytes raise."""
    try:
        obj, pos = _dec(buf, 0, 0)
    except (IndexError, UnicodeDecodeError, struct.error, RecursionError) as e:
        raise ValueError(f"malformed CBOR: {e}") from e
    if obj is _BREAK:
        raise ValueError("unexpected CBOR break code at top level")
    if pos != len(buf):
        raise ValueError(f"trailing bytes after CBOR item at {pos}")
    return obj


def decode_cbor_sequence(buf: bytes) -> list:
    """Decode a CBOR Sequence (RFC 8742: back-to-back data items) —
    the framing telemetry batches ride. Clean-ValueError contract."""
    out, pos = [], 0
    try:
        while pos < len(buf):
            obj, pos = _dec(buf, pos, 0)
            if obj is _BREAK:
                raise ValueError("unexpected CBOR break code in sequence")
            out.append(obj)
    except (IndexError, UnicodeDecodeError, struct.error, RecursionError) as e:
        raise ValueError(f"malformed CBOR at item {len(out)}: {e}") from e
    return out


def _need(buf: bytes, pos: int, n: int) -> None:
    # int.from_bytes / slicing silently accept short slices, so every
    # fixed-width read bounds-checks first (the msgpack _need lesson).
    if pos + n > len(buf):
        raise ValueError(
            f"truncated CBOR: need {n} bytes at {pos}, have {len(buf) - pos}"
        )


def _read_len(buf: bytes, pos: int, info: int):
    """Resolve the additional-info field → (count | None, new_pos);
    None means indefinite length."""
    if info < 24:
        return info, pos
    if info == 31:
        return None, pos
    if info in (28, 29, 30):
        raise ValueError(f"reserved CBOR additional info {info}")
    w = 1 << (info - 24)
    _need(buf, pos, w)
    return int.from_bytes(buf[pos : pos + w], "big"), pos + w


def _f16(h: int) -> float:
    """IEEE 754 binary16 → float (RFC 8949 appendix D reference)."""
    sign = -1.0 if h & 0x8000 else 1.0
    exp = (h >> 10) & 0x1F
    frac = h & 0x3FF
    if exp == 0:
        return sign * frac * 2.0**-24
    if exp == 31:
        return sign * (float("nan") if frac else float("inf"))
    return sign * (frac + 1024) * 2.0 ** (exp - 25)


def _dec(buf: bytes, pos: int, depth: int):
    if depth > _MAX_DEPTH:
        raise ValueError("CBOR nesting too deep")
    _need(buf, pos, 1)
    b = buf[pos]
    pos += 1
    major, info = b >> 5, b & 0x1F
    if major == 0:
        n, pos = _read_len(buf, pos, info)
        if n is None:
            raise ValueError("indefinite length invalid for uint")
        return n, pos
    if major == 1:
        n, pos = _read_len(buf, pos, info)
        if n is None:
            raise ValueError("indefinite length invalid for negint")
        return -1 - n, pos
    if major in (2, 3):
        n, pos = _read_len(buf, pos, info)
        if n is None:  # chunked string: definite chunks of same major
            parts = bytearray()
            while True:
                _need(buf, pos, 1)
                if buf[pos] == 0xFF:
                    pos += 1
                    break
                if buf[pos] >> 5 != major:
                    raise ValueError("mixed-major chunks in CBOR string")
                cn, cpos = _read_len(buf, pos + 1, buf[pos] & 0x1F)
                if cn is None:
                    raise ValueError("nested indefinite CBOR string chunk")
                _need(buf, cpos, cn)
                chunk = bytes(buf[cpos : cpos + cn])
                if major == 3:
                    # RFC 8949 §3.2.3: every text chunk must itself be a
                    # well-formed text string — a codepoint split across
                    # chunk boundaries is ill-formed CBOR, so validate
                    # UTF-8 per chunk, not only on the concatenation.
                    chunk.decode("utf-8")
                parts += chunk
                pos = cpos + cn
            data = bytes(parts)
        else:
            _need(buf, pos, n)
            data = bytes(buf[pos : pos + n])
            pos += n
        return (data.decode("utf-8") if major == 3 else data), pos
    if major == 4:
        n, pos = _read_len(buf, pos, info)
        out = []
        if n is None:
            while True:
                v, pos = _dec(buf, pos, depth + 1)
                if v is _BREAK:
                    return out, pos
                out.append(v)
        # each element costs >= 1 byte: bound n before looping
        _need(buf, pos, n)
        for _ in range(n):
            v, pos = _dec(buf, pos, depth + 1)
            if v is _BREAK:
                raise ValueError("break code inside definite array")
            out.append(v)
        return out, pos
    if major == 5:
        n, pos = _read_len(buf, pos, info)
        out = {}
        if n is None:
            while True:
                k, pos = _dec(buf, pos, depth + 1)
                if k is _BREAK:
                    return out, pos
                v, pos = _dec(buf, pos, depth + 1)
                if v is _BREAK:
                    raise ValueError("break code as CBOR map value")
                _set_key(out, k, v)
        _need(buf, pos, 2 * n)  # each pair costs >= 2 bytes
        for _ in range(n):
            k, pos = _dec(buf, pos, depth + 1)
            v, pos = _dec(buf, pos, depth + 1)
            if k is _BREAK or v is _BREAK:
                raise ValueError("break code inside definite map")
            _set_key(out, k, v)
        return out, pos
    if major == 6:  # tag: decode content transparently (RFC default)
        n, pos = _read_len(buf, pos, info)
        if n is None:  # RFC 8949 §3.2: indefinite length ill-formed for tags
            raise ValueError("indefinite length invalid for CBOR tag")
        return _dec(buf, pos, depth + 1)
    # major 7: simple values and floats
    if info == 20:
        return False, pos
    if info == 21:
        return True, pos
    if info in (22, 23):  # null / undefined → None
        return None, pos
    if info == 24:
        _need(buf, pos, 1)
        if buf[pos] < 32:
            raise ValueError("invalid two-byte CBOR simple value < 32")
        return buf[pos], pos + 1  # simple value: return its number
    if info == 25:
        _need(buf, pos, 2)
        return _f16(int.from_bytes(buf[pos : pos + 2], "big")), pos + 2
    if info == 26:
        _need(buf, pos, 4)
        return struct.unpack_from(">f", buf, pos)[0], pos + 4
    if info == 27:
        _need(buf, pos, 8)
        return struct.unpack_from(">d", buf, pos)[0], pos + 8
    if info == 31:
        return _BREAK, pos
    if info < 20:
        return info, pos  # unassigned simple value
    raise ValueError(f"reserved CBOR simple/float info {info}")


def _set_key(out: dict, k, v) -> None:
    try:
        out[k] = v
    except TypeError as e:  # unhashable decoded key (list/dict)
        raise ValueError(f"unhashable CBOR map key: {e}") from e
