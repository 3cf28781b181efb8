"""Parquet PAGE INDEX + BLOOM FILTERS from scratch — the two footer
side-structures that close the metadata pruning ladder
(file stats → row-group stats → PAGE stats → membership), decoded
directly from the public format (apache/parquet-format PageIndex.md +
BloomFilter.md + parquet.thrift):

- **OffsetIndex** (ColumnChunk.offset_index_offset/length, fields 4/5):
  ``page_locations`` = list of PageLocation{offset(1), compressed_page_
  size(2), first_row_index(3)} — the seek table that makes a single
  page independently readable.
- **ColumnIndex** (ColumnChunk.column_index_offset/length, fields 6/7):
  per-page ``null_pages``(1), ``min_values``(2)/``max_values``(3) as
  plain-encoded binary, ``boundary_order``(4), ``null_counts``(5) —
  page-granular min/max that answer a range predicate BEFORE the page
  body is fetched.
- **Split-block Bloom filter** (ColumnMetaData.bloom_filter_offset/
  length, fields 14/15): a Thrift BloomFilterHeader {numBytes(1),
  algorithm(2)=BLOCK, hash(3)=XXHASH, compression(4)=UNCOMPRESSED}
  followed by the bitset. Membership hashing is XXH64(seed 0) of the
  PLAIN-encoded value — THIS REPO'S own xxh64 (`sources/zstd.py`,
  spec-vector pinned) — block selection by the 32-bit fixed-point
  multiply of the high hash word, and the eight SALT-scheduled bits,
  one per 32-bit lane of the 256-bit block.

Strictness contract as everywhere: truncated/oversized structures and
unsupported algorithm/hash/compression variants raise ``ValueError``.
"""

from __future__ import annotations

import struct

from metricproxy_spark.sources.parquet_footer import (
    _read_struct,
    read_footer_bytes,
)

# BloomFilter.md block salt schedule (public spec constants)
_SALT = (
    0x47B6137B,
    0x44974D91,
    0x8824AD5B,
    0xA2B7289D,
    0x705495C7,
    0x2DF1424B,
    0x9EFC4947,
    0x5C6BFB31,
)
_M32 = 0xFFFFFFFF


def column_chunk_indexes(footer: bytes, column: str) -> list[dict]:
    """Per-row-group side-structure locations for one leaf column:
    {offset_index: (off, len) | None, column_index: (off, len) | None,
    bloom: (off, len) | None, type}."""
    meta, _ = _read_struct(footer, 0)
    out = []
    for rg_i, rg in enumerate(meta.get(4) or []):
        found = None
        for chunk in rg.get(1) or []:
            cm = chunk.get(3)
            if not isinstance(cm, dict):
                continue
            path = b".".join(cm.get(3) or []).decode("utf-8")
            if path != column:
                continue
            bloom_off = cm.get(14)
            bloom_len = cm.get(15)
            found = {
                "type": int(cm.get(1, -1)),
                "offset_index": (
                    (int(chunk.get(4)), int(chunk.get(5)))
                    if chunk.get(4) is not None
                    else None
                ),
                "column_index": (
                    (int(chunk.get(6)), int(chunk.get(7)))
                    if chunk.get(6) is not None
                    else None
                ),
                "bloom": (
                    (int(bloom_off), int(bloom_len) if bloom_len else None)
                    if bloom_off is not None
                    else None
                ),
            }
            break
        if found is None:
            raise ValueError(
                f"parquet index: no chunk for {column!r} in rg {rg_i}"
            )
        out.append(found)
    return out


def read_offset_index(path: str, loc: tuple[int, int]) -> list[dict]:
    """OffsetIndex → [{offset, compressed_page_size, first_row_index}]."""
    if loc is None:
        raise ValueError("parquet index: file has no offset index")
    off, length = loc
    with open(path, "rb") as fh:
        fh.seek(off)
        buf = fh.read(length)
    if len(buf) != length:
        raise ValueError("parquet index: truncated offset index")
    oi, _ = _read_struct(buf, 0)
    pages = []
    for pl in oi.get(1) or []:
        pages.append(
            {
                "offset": int(pl.get(1)),
                "compressed_page_size": int(pl.get(2)),
                "first_row_index": int(pl.get(3)),
            }
        )
    if not pages:
        raise ValueError("parquet index: empty offset index")
    return pages


def read_column_index(path: str, loc: tuple[int, int]) -> dict:
    """ColumnIndex → {null_pages: [bool], min_values: [bytes],
    max_values: [bytes], null_counts: [int] | None}."""
    if loc is None:
        raise ValueError("parquet index: file has no column index")
    off, length = loc
    with open(path, "rb") as fh:
        fh.seek(off)
        buf = fh.read(length)
    if len(buf) != length:
        raise ValueError("parquet index: truncated column index")
    ci, _ = _read_struct(buf, 0)
    null_pages = [bool(b) for b in (ci.get(1) or [])]
    mins = [bytes(b) for b in (ci.get(2) or [])]
    maxs = [bytes(b) for b in (ci.get(3) or [])]
    if not (len(null_pages) == len(mins) == len(maxs)) or not mins:
        raise ValueError("parquet index: inconsistent column index")
    ncs = ci.get(5)
    return {
        "null_pages": null_pages,
        "min_values": mins,
        "max_values": maxs,
        "null_counts": [int(x) for x in ncs] if ncs else None,
    }


def stat_int64(raw: bytes) -> int:
    if len(raw) != 8:
        raise ValueError("parquet index: INT64 bound must be 8 bytes")
    return struct.unpack("<q", raw)[0]


class SplitBlockBloom:
    """The spec's split-block Bloom filter, read side."""

    def __init__(self, bitset: bytes):
        if len(bitset) < 32 or len(bitset) % 32:
            raise ValueError(
                "parquet bloom: bitset must be a multiple of 32 bytes"
            )
        self.words = struct.unpack(f"<{len(bitset) // 4}I", bitset)
        self.num_blocks = len(bitset) // 32

    def might_contain_hash(self, h: int) -> bool:
        block = ((h >> 32) * self.num_blocks) >> 32
        key = h & _M32
        base = block * 8
        for i in range(8):
            bit = ((key * _SALT[i]) & _M32) >> 27
            if not (self.words[base + i] >> bit) & 1:
                return False
        return True


def read_bloom_filter(
    path: str, offset: int, length: int | None
) -> SplitBlockBloom:
    """BloomFilterHeader + bitset at ``offset`` → checker. Rejects any
    algorithm/hash/compression other than BLOCK/XXHASH/UNCOMPRESSED
    (the only variants the format defines today)."""
    with open(path, "rb") as fh:
        fh.seek(offset)
        # the header is tiny; over-read generously when length unknown
        buf = fh.read(length if length else 64)
        hdr, used = _read_struct(buf, 0)
        nbytes = int(hdr.get(1, 0))
        if nbytes <= 0 or nbytes > 1 << 27:
            raise ValueError("parquet bloom: numBytes out of range")
        for fid, name in ((2, "algorithm"), (3, "hash"), (4, "compression")):
            union = hdr.get(fid)
            if not isinstance(union, dict) or list(union.keys()) != [1]:
                raise ValueError(f"parquet bloom: unsupported {name}")
        bitset = buf[used : used + nbytes]
        if len(bitset) < nbytes:
            fh.seek(offset + used)
            bitset = fh.read(nbytes)
    if len(bitset) != nbytes:
        raise ValueError("parquet bloom: truncated bitset")
    return SplitBlockBloom(bitset)


def bloom_hash_int64(value: int) -> int:
    """XXH64(seed 0) of the PLAIN encoding (8-byte LE) — BloomFilter.md
    'hash input is the little-endian plain encoding'."""
    from metricproxy_spark.sources.zstd import xxh64

    return xxh64(struct.pack("<q", value))


def bloom_hash_bytes(value: bytes) -> int:
    """XXH64 of a BYTE_ARRAY value (the bytes themselves, no length
    prefix)."""
    from metricproxy_spark.sources.zstd import xxh64

    return xxh64(value)


def bloom_hash_int32(value: int) -> int:
    """XXH64 of the 4-byte little-endian plain encoding."""
    from metricproxy_spark.sources.zstd import xxh64

    return xxh64(struct.pack("<i", value))


def bloom_hash_double(value: float) -> int:
    """XXH64 of the 8-byte little-endian plain encoding; -0.0 is
    normalized to +0.0 first (the parquet-mr convention — the two
    encodings differ but the values compare equal, so hashing both
    patterns is the only way to avoid false negatives)."""
    from metricproxy_spark.sources.zstd import xxh64

    if value == 0.0:
        value = 0.0
    return xxh64(struct.pack("<d", value))


def decode_selected_pages(
    path: str, chunk: dict, locations: list[dict], wanted: list[int]
) -> list:
    """Decode ONLY the pages at ``wanted`` indices of a column chunk —
    the OffsetIndex makes each page independently seekable, so a
    page-pruned read never touches skipped page bytes. The dictionary
    page (when the chunk has one) is read once from the chunk start.
    Returns values (None = null) in page order."""
    from metricproxy_spark.sources import parquet_pages as pp

    dictionary = None
    with open(path, "rb") as fh:
        first_data_off = locations[0]["offset"]
        if chunk["start"] < first_data_off:
            # dictionary page sits at the chunk start, before page 0
            fh.seek(chunk["start"])
            region = fh.read(first_data_off - chunk["start"])
            hdr, body_pos = _read_struct(region, 0)
            if hdr.get(1) == 2:  # DICTIONARY_PAGE
                body = pp._decompress(
                    region[body_pos : body_pos + int(hdr.get(3, 0))],
                    chunk["codec"],
                    int(hdr.get(2, 0)),
                )
                dhdr = hdr.get(7) or {}
                dictionary = pp._plain_values(
                    body, chunk["type"], int(dhdr.get(1, 0))
                )
        values: list = []
        for pi in wanted:
            loc = locations[pi]
            fh.seek(loc["offset"])
            region = fh.read(loc["compressed_page_size"])
            if len(region) != loc["compressed_page_size"]:
                raise ValueError("parquet index: truncated page read")
            values.extend(
                _decode_one_page(region, chunk, dictionary)
            )
    return values


def _decode_one_page(region: bytes, chunk: dict, dictionary) -> list:
    """One framed page (header + body) → values; v1 and v2 framing."""
    from metricproxy_spark.sources import parquet_pages as pp

    hdr, body_pos = _read_struct(region, 0)
    ptype = hdr.get(1)
    comp_size = int(hdr.get(3, 0))
    uncomp_size = int(hdr.get(2, 0))
    raw = region[body_pos : body_pos + comp_size]
    if len(raw) != comp_size:
        raise ValueError("parquet index: truncated page body")
    if ptype == 0:  # DATA_PAGE v1
        body = pp._decompress(raw, chunk["codec"], uncomp_size)
        dph = hdr.get(5) or {}
        n = int(dph.get(1, 0))
        encoding = int(dph.get(2, 0))
        p = 0
        if chunk["optional"]:
            # same strictness as decode_column_chunk: levels must ride
            # the RLE hybrid (legacy BIT_PACKED would mis-decode)
            if int(dph.get(3, 3)) != 3:
                raise ValueError(
                    "parquet index: non-RLE definition levels unsupported"
                )
            if len(body) < 4:
                raise ValueError("parquet index: truncated def levels")
            (dlen,) = struct.unpack_from("<I", body, 0)
            p = 4
            defs, _ = pp.rle_hybrid(body, p, p + dlen, 1, n)
            p += dlen
        else:
            defs = [1] * n
    elif ptype == 3:  # DATA_PAGE_V2
        dph = hdr.get(8) or {}
        n = int(dph.get(1, 0))
        num_nulls = int(dph.get(2, 0))
        encoding = int(dph.get(4, 0))
        def_len = int(dph.get(5, 0))
        if int(dph.get(6, 0)):
            raise ValueError("parquet index: repetition levels unsupported")
        if def_len > len(raw):
            raise ValueError(
                "parquet index: truncated v2 definition levels"
            )
        vraw = raw[def_len:]
        body = (
            pp._decompress(vraw, chunk["codec"], uncomp_size - def_len)
            if bool(dph.get(7, True)) and chunk["codec"]
            else vraw
        )
        if chunk["optional"] and def_len:
            defs, _ = pp.rle_hybrid(raw, 0, def_len, 1, n)
        else:
            defs = [1] * n
        if n - sum(defs) != num_nulls:
            raise ValueError("parquet index: v2 null count mismatch")
        p = 0
    else:
        raise ValueError(f"parquet index: unexpected page type {ptype}")
    present = pp._decode_values(
        body, p, encoding, chunk["type"], sum(defs), dictionary
    )
    it = iter(present)
    return [next(it) if d else None for d in defs]
