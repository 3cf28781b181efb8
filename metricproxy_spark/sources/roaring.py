"""Portable RoaringBitmap + Delta DELETION-VECTOR framing, from
scratch (S-ext lakehouse format; the 15th from-scratch binary codec).

Deletion vectors are how modern Delta tables delete ROWS without
rewriting files: an `add` action carries a `deletionVector` pointing
at a serialized bitmap of deleted row POSITIONS, and readers drop
those positions at scan time (merge-on-read). Three public specs,
implemented directly:

1. **RoaringBitmap portable format** (RoaringBitmap/RoaringFormatSpec
   — the interoperable serialization every implementation ships):
   little-endian cookie 12346 (SERIAL_COOKIE_NO_RUNCONTAINER) +
   container count, or 12347 (SERIAL_COOKIE) with the count packed in
   the high 16 bits and a run-flag bitset; per-container
   (high-16-bit key, cardinality-1) descriptors; descriptive offsets
   (always for cookie 12346, only at >= 4 containers for 12347);
   then the containers themselves — ARRAY (sorted uint16s,
   cardinality <= 4096), BITMAP (1024 x uint64, 8 KiB) or RUN
   (count + (start, length-1) pairs).
2. **Delta RoaringBitmapArray** (delta-io/delta PROTOCOL.md +
   RoaringBitmapArray.scala) — the 64-bit wrapper Delta serializes:
   magic 1681511377 (int32 LE), number of 32-bit bitmaps (int64 LE),
   then each 32-bit portable bitmap for consecutive high words.
3. **Deletion Vector file framing** (delta-io/delta PROTOCOL.md —
   "Deletion Vector Format"): a version byte (1); each DV blob is
   [size int32 BE][RoaringBitmapArray bytes][CRC-32 int32 BE of the
   bytes]; the `add.deletionVector.offset` points at the size field
   and `cardinality` must match the decoded bitmap.

Decode discipline is the repo codec contract: strict ``ValueError``
on malformed input (bad cookies, truncations, unsorted containers,
checksum/cardinality mismatches), with the CRC verified BEFORE the
bitmap is trusted. CRC-32 is the from-scratch IEEE table in
`sources/deflate.py` — the same polynomial family gzip uses.
"""

from __future__ import annotations

import struct

from metricproxy_spark.sources.deflate import crc32

_SERIAL_COOKIE_NO_RUN = 12346
_SERIAL_COOKIE = 12347
_NO_OFFSET_THRESHOLD = 4
_ARRAY_MAX = 4096
_MAGIC_RBA = 1681511377  # Delta RoaringBitmapArray magic
_DV_VERSION = 1


# ---------------------------------------------------------------------------
# 32-bit portable RoaringBitmap
# ---------------------------------------------------------------------------


def serialize_roaring32(values: list[int]) -> bytes:
    """Sorted-or-not uint32 values → portable no-run serialization
    (cookie 12346 — what a writer without run optimization emits)."""
    containers: dict[int, list[int]] = {}
    for v in sorted(set(values)):
        if not 0 <= v < 1 << 32:
            raise ValueError("roaring32: value out of uint32 range")
        containers.setdefault(v >> 16, []).append(v & 0xFFFF)
    keys = sorted(containers)
    out = bytearray()
    out += struct.pack("<ii", _SERIAL_COOKIE_NO_RUN, len(keys))
    for k in keys:
        out += struct.pack("<HH", k, len(containers[k]) - 1)
    # descriptive offsets: absolute byte position of each container
    header_end = 8 + 4 * len(keys) + 4 * len(keys)
    pos = header_end
    blobs = []
    for k in keys:
        vals = containers[k]
        if len(vals) <= _ARRAY_MAX:
            blob = struct.pack(f"<{len(vals)}H", *vals)
        else:
            words = [0] * 1024
            for lo in vals:
                words[lo >> 6] |= 1 << (lo & 63)
            blob = struct.pack("<1024Q", *words)
        out += struct.pack("<i", pos)
        blobs.append(blob)
        pos += len(blob)
    for blob in blobs:
        out += blob
    return bytes(out)


def deserialize_roaring32(buf: bytes, pos: int = 0) -> tuple[list[int], int]:
    """Portable serialization → (sorted uint32 values, next pos).
    Handles both cookies incl. run containers."""
    if pos + 4 > len(buf):
        raise ValueError("roaring32: truncated cookie")
    (cookie_word,) = struct.unpack_from("<I", buf, pos)
    cookie = cookie_word & 0xFFFF
    if cookie == _SERIAL_COOKIE_NO_RUN:
        pos += 4
        if pos + 4 > len(buf):
            raise ValueError("roaring32: truncated container count")
        (size,) = struct.unpack_from("<i", buf, pos)
        pos += 4
        run_flags = [False] * size
        has_offsets = True
    elif cookie == _SERIAL_COOKIE:
        size = ((cookie_word >> 16) & 0xFFFF) + 1
        pos += 4
        nbytes = (size + 7) // 8
        if pos + nbytes > len(buf):
            raise ValueError("roaring32: truncated run flags")
        flags = buf[pos : pos + nbytes]
        run_flags = [bool(flags[i // 8] & (1 << (i % 8))) for i in range(size)]
        pos += nbytes
        has_offsets = size >= _NO_OFFSET_THRESHOLD
    else:
        raise ValueError(f"roaring32: unknown cookie {cookie}")
    if size < 0 or size > 1 << 16:
        raise ValueError("roaring32: container count out of range")
    descr = []
    for _ in range(size):
        if pos + 4 > len(buf):
            raise ValueError("roaring32: truncated descriptor")
        k, cm1 = struct.unpack_from("<HH", buf, pos)
        descr.append((k, cm1 + 1))
        pos += 4
    if has_offsets:
        pos += 4 * size  # descriptive offsets; containers follow anyway
    out: list[int] = []
    last_key = -1
    for (key, card), is_run in zip(descr, run_flags):
        if key <= last_key:
            raise ValueError("roaring32: container keys not increasing")
        last_key = key
        hi = key << 16
        if is_run:
            if pos + 2 > len(buf):
                raise ValueError("roaring32: truncated run count")
            (n_runs,) = struct.unpack_from("<H", buf, pos)
            pos += 2
            if pos + 4 * n_runs > len(buf):
                raise ValueError("roaring32: truncated run container")
            got = 0
            for _ in range(n_runs):
                start, length = struct.unpack_from("<HH", buf, pos)
                pos += 4
                out.extend(hi | v for v in range(start, start + length + 1))
                got += length + 1
            if got != card:
                raise ValueError("roaring32: run cardinality mismatch")
        elif card <= _ARRAY_MAX:
            if pos + 2 * card > len(buf):
                raise ValueError("roaring32: truncated array container")
            vals = struct.unpack_from(f"<{card}H", buf, pos)
            pos += 2 * card
            if any(b <= a for a, b in zip(vals, vals[1:])):
                raise ValueError("roaring32: array container not sorted")
            out.extend(hi | v for v in vals)
        else:
            if pos + 8192 > len(buf):
                raise ValueError("roaring32: truncated bitmap container")
            words = struct.unpack_from("<1024Q", buf, pos)
            pos += 8192
            got = 0
            for wi, w in enumerate(words):
                base = hi | (wi << 6)
                while w:
                    b = w & -w
                    out.append(base | b.bit_length() - 1)
                    w ^= b
                    got += 1
            if got != card:
                raise ValueError("roaring32: bitmap cardinality mismatch")
    return out, pos


# ---------------------------------------------------------------------------
# Delta RoaringBitmapArray (64-bit) + DV file framing
# ---------------------------------------------------------------------------


def serialize_rba(values: list[int]) -> bytes:
    """uint64 row positions → Delta RoaringBitmapArray bytes."""
    by_hi: dict[int, list[int]] = {}
    for v in sorted(set(values)):
        if not 0 <= v < 1 << 64:
            raise ValueError("rba: value out of uint64 range")
        by_hi.setdefault(v >> 32, []).append(v & 0xFFFFFFFF)
    n = (max(by_hi) + 1) if by_hi else 0
    out = bytearray(struct.pack("<iq", _MAGIC_RBA, n))
    for hi in range(n):  # consecutive high words, empties included
        out += serialize_roaring32(by_hi.get(hi, []))
    return bytes(out)


def deserialize_rba(buf: bytes) -> list[int]:
    if len(buf) < 12:
        raise ValueError("rba: truncated header")
    magic, n = struct.unpack_from("<iq", buf, 0)
    if magic != _MAGIC_RBA:
        raise ValueError("rba: bad magic")
    if n < 0 or n > 1 << 20:
        raise ValueError("rba: bitmap count out of range")
    pos = 12
    out: list[int] = []
    for hi in range(n):
        vals, pos = deserialize_roaring32(buf, pos)
        out.extend((hi << 32) | v for v in vals)
    if pos != len(buf):
        raise ValueError("rba: trailing bytes")
    return out


def pack_dv_blobs(blobs: list[bytes]) -> tuple[bytes, list[dict]]:
    """Already-serialized RoaringBitmapArray blobs → (DV file bytes,
    per-DV {offset, sizeInBytes}). THE single definition of the
    multi-DV file framing (version byte, then per DV a big-endian
    int32 size, the blob, a big-endian CRC-32) — the executor-side
    twin of :func:`write_dv_file` for callers that serialized each
    bitmap where its file was scanned and ship only KB blobs."""
    out = bytearray([_DV_VERSION])
    descs = []
    for blob in blobs:
        blob = bytes(blob)
        offset = len(out)
        out += struct.pack(">i", len(blob))
        out += blob
        out += struct.pack(">I", crc32(blob))
        descs.append({"offset": offset, "sizeInBytes": len(blob)})
    return bytes(out), descs


def write_dv_file(dvs: list[list[int]]) -> tuple[bytes, list[dict]]:
    """Deletion vectors (each a list of row positions) → (file bytes,
    per-DV descriptors {offset, sizeInBytes, cardinality}) — the
    fields an `add.deletionVector` action carries."""
    out, descs = pack_dv_blobs([serialize_rba(p) for p in dvs])
    for positions, d in zip(dvs, descs):
        d["cardinality"] = len(set(positions))
    return out, descs


def read_dv(data: bytes, offset: int, size: int, cardinality: int) -> set[int]:
    """One DV out of a DV file, strict per the protocol: version byte,
    the size field at ``offset``, CRC-32 verified BEFORE decode, and
    the declared cardinality checked against the decoded bitmap."""
    if not data or data[0] != _DV_VERSION:
        raise ValueError("dv: unsupported file version")
    if offset + 4 > len(data):
        raise ValueError("dv: offset out of range")
    (dsize,) = struct.unpack_from(">i", data, offset)
    if dsize != size:
        raise ValueError("dv: size field mismatch")
    start = offset + 4
    if start + dsize + 4 > len(data):
        raise ValueError("dv: truncated blob")
    blob = data[start : start + dsize]
    (want,) = struct.unpack_from(">I", data, start + dsize)
    if crc32(blob) != want:
        raise ValueError("dv: CRC-32 mismatch")
    positions = deserialize_rba(blob)
    if len(positions) != cardinality:
        raise ValueError("dv: cardinality mismatch")
    return set(positions)
