"""Parquet WRITER from scratch — the encode inverse of the repo's
from-scratch read stack (``parquet_footer`` Thrift walker →
``parquet_index`` → ``parquet_pages``), closing the read/write
asymmetry the same way ``sources/zstd.py`` closed it for RFC 8878.

Everything here derives from two public specs:

1. **Thrift compact protocol** (apache/thrift
   doc/specs/thrift-compact-protocol.md) — the exact inverse of the
   walker in :mod:`metricproxy_spark.sources.parquet_footer`: struct
   field headers are ``(field-id delta << 4) | type`` with bools
   riding in the header nibble, i16/i32/i64 as zigzag varints, binary
   as varint-length + bytes, lists as ``(size << 4) | elem-type``
   (size 15 escapes to a varint).
2. **Parquet format** (apache/parquet-format: README, parquet.thrift,
   Encodings.md) — v1 DATA_PAGE framing ``[rle def levels w/ 4-byte
   LE length prefix][values]`` (whole body compressed as one unit),
   PLAIN encodings (little-endian fixed width; BYTE_ARRAY as 4-byte
   LE length + bytes; BOOLEAN bit-packed LSB-first), the legacy
   PLAIN_DICTIONARY pair (dictionary page holds plain values, data
   pages hold a bit-width byte + RLE/bit-packed hybrid indices — the
   v1-writer convention every reader accepts), RLE/bit-packed hybrid
   (varint header, ``run << 1`` repeated runs / ``(groups << 1) | 1``
   bit-packed groups of 8), ``Statistics.min_value/max_value``
   (unsigned byte order for UTF8 per LogicalTypes.md), and the file
   framing ``PAR1 … footer … int32-LE footer length … PAR1``.

Pages can be compressed with the repo's OWN RFC 8878 encoder
(``codec="zstd"``), making a written file zero-library end to end;
the tests cross-read every output with pyarrow, DuckDB, Spark's
parquet-mr reader AND this repo's own page decoder.
"""

from __future__ import annotations

import struct

# thrift compact type nibbles (mirror of parquet_footer's constants)
_T_BOOL_TRUE, _T_BOOL_FALSE = 1, 2
_T_I32, _T_I64, _T_BINARY, _T_LIST, _T_STRUCT = 5, 6, 8, 9, 12

# parquet.thrift enums
_PQ_BOOLEAN, _PQ_INT32, _PQ_INT64, _PQ_DOUBLE, _PQ_BYTE_ARRAY = 0, 1, 2, 5, 6
_ENC_PLAIN, _ENC_PLAIN_DICTIONARY, _ENC_RLE = 0, 2, 3
_ENC_DELTA_BP, _ENC_DELTA_LEN_BA, _ENC_DELTA_BA = 5, 6, 7
_ENC_RLE_DICTIONARY, _ENC_BYTE_STREAM_SPLIT = 8, 9
_CODEC = {"uncompressed": 0, "zstd": 6}
_TYPES = {
    "boolean": _PQ_BOOLEAN,
    "int32": _PQ_INT32,
    "int64": _PQ_INT64,
    "double": _PQ_DOUBLE,
    "string": _PQ_BYTE_ARRAY,
}


def _varint(n: int) -> bytes:
    if n < 0:
        raise ValueError("parquet writer: varint must be non-negative")
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _zigzag(n: int) -> int:
    return (n << 1) ^ (n >> 63) if n >= 0 else (n << 1) ^ -1


# A struct value is a list of (field_id, ttype, value) with ttype in
# {"bool","i32","i64","binary","list","struct"}; list values are
# (elem_ttype, [items]). Fields must be in increasing field-id order
# (the delta encoding requires it).


def _enc_value(ttype: str, value) -> bytes:
    if ttype in ("i32", "i64"):
        return _varint(_zigzag(int(value)))
    if ttype == "binary":
        return _varint(len(value)) + bytes(value)
    if ttype == "list":
        etype, items = value
        nib = {
            "bool": _T_BOOL_TRUE,
            "i32": _T_I32,
            "i64": _T_I64,
            "binary": _T_BINARY,
            "list": _T_LIST,
            "struct": _T_STRUCT,
        }[etype]
        if len(items) < 15:
            out = bytearray([(len(items) << 4) | nib])
        else:
            out = bytearray([(15 << 4) | nib]) + _varint(len(items))
        for it in items:
            if etype == "bool":
                # list<bool> elements are ONE BYTE each (1=true 2=false)
                out.append(1 if it else 2)
            else:
                out += _enc_value(etype, it)
        return bytes(out)
    if ttype == "struct":
        return _enc_struct(value)
    raise ValueError(f"parquet writer: unknown thrift type {ttype!r}")


def _enc_struct(fields) -> bytes:
    out = bytearray()
    last = 0
    for fid, ttype, value in fields:
        if ttype == "bool":
            nib = _T_BOOL_TRUE if value else _T_BOOL_FALSE
        else:
            nib = {
                "i32": _T_I32,
                "i64": _T_I64,
                "binary": _T_BINARY,
                "list": _T_LIST,
                "struct": _T_STRUCT,
            }[ttype]
        delta = fid - last
        if 0 < delta < 16:
            out.append((delta << 4) | nib)
        else:
            out.append(nib)
            out += _varint(_zigzag(fid))
        last = fid
        if ttype != "bool":
            out += _enc_value(ttype, value)
    out.append(0)  # STOP
    return bytes(out)


def _rle_runs(values, bit_width: int) -> bytes:
    """Pure-RLE hybrid encoding (every run is ``run_len << 1`` +
    fixed-width LE value) — always legal, optimal for def levels."""
    out = bytearray()
    width = (bit_width + 7) // 8
    i, n = 0, len(values)
    while i < n:
        j = i
        while j < n and values[j] == values[i]:
            j += 1
        out += _varint((j - i) << 1)
        out += int(values[i]).to_bytes(width, "little")
        i = j
    return bytes(out)


def _bitpacked(values, bit_width: int) -> bytes:
    """Single bit-packed hybrid run covering all values (LSB-first,
    final group padded with zeros — legal only at sequence end, which
    a single run trivially is)."""
    n = len(values)
    if n == 0:
        return b""
    groups = (n + 7) // 8
    out = bytearray(_varint((groups << 1) | 1))
    acc = 0
    fill = 0
    for k in range(groups * 8):
        v = int(values[k]) if k < n else 0
        acc |= v << fill
        fill += bit_width
        while fill >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            fill -= 8
    if fill:
        out.append(acc & 0xFF)
    return bytes(out)


def _plain(ptype: int, values) -> bytes:
    if ptype == _PQ_INT64:
        return struct.pack(f"<{len(values)}q", *values)
    if ptype == _PQ_INT32:
        return struct.pack(f"<{len(values)}i", *values)
    if ptype == _PQ_DOUBLE:
        return struct.pack(f"<{len(values)}d", *values)
    if ptype == _PQ_BYTE_ARRAY:
        out = bytearray()
        for v in values:
            b = v.encode("utf-8") if isinstance(v, str) else bytes(v)
            out += struct.pack("<I", len(b)) + b
        return bytes(out)
    if ptype == _PQ_BOOLEAN:
        out = bytearray()
        acc = fill = 0
        for v in values:
            acc |= (1 if v else 0) << fill
            fill += 1
            if fill == 8:
                out.append(acc)
                acc = fill = 0
        if fill:
            out.append(acc)
        return bytes(out)
    raise ValueError(f"parquet writer: unsupported physical type {ptype}")


def _stat_bytes(ptype: int, v) -> bytes:
    if ptype == _PQ_INT64:
        return struct.pack("<q", v)
    if ptype == _PQ_INT32:
        return struct.pack("<i", v)
    if ptype == _PQ_DOUBLE:
        return struct.pack("<d", v)
    if ptype == _PQ_BYTE_ARRAY:
        return v.encode("utf-8") if isinstance(v, str) else bytes(v)
    if ptype == _PQ_BOOLEAN:
        return b"\x01" if v else b"\x00"
    raise ValueError(f"parquet writer: unsupported stat type {ptype}")


def _stat_values(typ: str, values) -> list:
    """Values eligible for min/max bounds — NaN is excluded for
    doubles (parquet spec: NaN must never appear in statistics; a
    Python ``min()`` over a NaN-first list would otherwise poison the
    bound and make pruning readers skip matching data)."""
    if typ == "double":
        return [v for v in values if v == v]
    return list(values)


def _compress(codec: str, body: bytes) -> bytes:
    if codec == "uncompressed":
        return body
    if codec == "zstd":
        from metricproxy_spark.sources.zstd import compress_zstd

        return compress_zstd(body)
    raise ValueError(f"parquet writer: unsupported codec {codec!r}")


def _page_header(
    n_values: int,
    encoding: int,
    raw_len: int,
    comp_len: int,
    dictionary: bool = False,
) -> bytes:
    if dictionary:
        inner = [(1, "i32", n_values), (2, "i32", encoding)]
        return _enc_struct(
            [
                (1, "i32", 2),  # PageType.DICTIONARY_PAGE
                (2, "i32", raw_len),
                (3, "i32", comp_len),
                (7, "struct", inner),
            ]
        )
    inner = [
        (1, "i32", n_values),
        (2, "i32", encoding),
        (3, "i32", _ENC_RLE),  # definition_level_encoding
        (4, "i32", _ENC_RLE),  # repetition_level_encoding
    ]
    return _enc_struct(
        [
            (1, "i32", 0),  # PageType.DATA_PAGE
            (2, "i32", raw_len),
            (3, "i32", comp_len),
            (5, "struct", inner),
        ]
    )


def _page_header_v2(
    n_values: int,
    n_nulls: int,
    encoding: int,
    def_len: int,
    raw_vals: int,
    comp_vals: int,
    compressed: bool,
) -> bytes:
    """DATA_PAGE_V2 header: levels ride UNCOMPRESSED and un-prefixed
    at the page front; only the values section is under the codec."""
    inner = [
        (1, "i32", n_values),
        (2, "i32", n_nulls),
        (3, "i32", n_values),  # num_rows == num_values (flat schema)
        (4, "i32", encoding),
        (5, "i32", def_len),  # definition_levels_byte_length
        (6, "i32", 0),  # repetition_levels_byte_length
        (7, "bool", compressed),
    ]
    return _enc_struct(
        [
            (1, "i32", 3),  # PageType.DATA_PAGE_V2
            (2, "i32", def_len + raw_vals),
            (3, "i32", def_len + comp_vals),
            (8, "struct", inner),
        ]
    )


def _schema_elements(schema, nullable) -> list:
    root = [
        (4, "binary", b"schema"),
        (5, "i32", len(schema)),
    ]
    elems = [root]
    for name, typ in schema:
        f = [
            (1, "i32", _TYPES[typ]),
            (3, "i32", 1 if name in nullable else 0),  # OPTIONAL/REQUIRED
            (4, "binary", name.encode("utf-8")),
        ]
        if typ == "string":
            f.append((6, "i32", 0))  # ConvertedType.UTF8
            # LogicalType union: field 1 = StringType (empty struct)
            f.append((10, "struct", [(1, "struct", [])]))
        elems.append(f)
    return elems


def delta_binary_packed_enc(
    values, width: int, block_size: int = 128, n_mini: int = 4
) -> bytes:
    """DELTA_BINARY_PACKED encoder (Encodings.md §Delta Encoding) —
    the write inverse of ``parquet_pages._delta_binary_packed``:
    header ``<block_size> <miniblocks_per_block> <total> <first
    zigzag>``, then per block a zigzag min_delta, one bit-width byte
    per miniblock (trailing empty miniblocks get width 0 and NO
    body), and LSB-first bit-packed residues padded with zeros."""
    if n_mini == 0 or block_size % n_mini or (block_size // n_mini) % 8:
        raise ValueError("parquet writer: bad delta block geometry")
    per_mini = block_size // n_mini
    full = 1 << width
    sign = full >> 1

    def wrap(v: int) -> int:
        v &= full - 1
        return v - full if v & sign else v

    out = bytearray(
        _varint(block_size) + _varint(n_mini) + _varint(len(values))
    )
    if not values:
        out += _varint(_zigzag(0))
        return bytes(out)
    out += _varint(_zigzag(int(values[0])))
    deltas = [
        wrap(int(values[i + 1]) - int(values[i]))
        for i in range(len(values) - 1)
    ]
    for b_lo in range(0, len(deltas), block_size):
        blk = deltas[b_lo : b_lo + block_size]
        min_d = min(blk)
        residues = [d - min_d for d in blk]
        out += _varint(_zigzag(min_d))
        widths = []
        for m in range(n_mini):
            part = residues[m * per_mini : (m + 1) * per_mini]
            widths.append(max((r.bit_length() for r in part), default=0))
        out += bytes(widths)
        for m, bw in enumerate(widths):
            part = residues[m * per_mini : (m + 1) * per_mini]
            if not part:
                continue  # trailing empty miniblock: width byte only
            acc = 0
            fill = 0
            body = bytearray()
            for i in range(per_mini):
                r = part[i] if i < len(part) else 0
                acc |= r << fill
                fill += bw
                while fill >= 8:
                    body.append(acc & 0xFF)
                    acc >>= 8
                    fill -= 8
            if fill:
                body.append(acc & 0xFF)
            out += body[: bw * per_mini // 8]
    return bytes(out)


def _as_bytes(v) -> bytes:
    return v.encode("utf-8") if isinstance(v, str) else bytes(v)


def delta_length_byte_array_enc(values) -> bytes:
    """DELTA_LENGTH_BYTE_ARRAY: DBP-encoded int32 lengths followed by
    the concatenated bytes."""
    bs = [_as_bytes(v) for v in values]
    return delta_binary_packed_enc([len(b) for b in bs], 32) + b"".join(bs)


def delta_byte_array_enc(values) -> bytes:
    """DELTA_BYTE_ARRAY incremental front-coding: DBP shared-prefix
    lengths + DLBA suffixes."""
    bs = [_as_bytes(v) for v in values]
    prefixes = []
    prev = b""
    suffixes = []
    for b in bs:
        n = min(len(prev), len(b))
        p = 0
        while p < n and prev[p] == b[p]:
            p += 1
        prefixes.append(p)
        suffixes.append(b[p:])
        prev = b
    return delta_binary_packed_enc(prefixes, 32) + (
        delta_binary_packed_enc([len(s) for s in suffixes], 32)
        + b"".join(suffixes)
    )


def byte_stream_split_enc(ptype: int, values) -> bytes:
    """BYTE_STREAM_SPLIT: k byte-planes of n values — byte j of value
    i lands at plane[j][i] (the float layout that makes doubles
    compressible)."""
    plain = _plain(ptype, values)
    size = {_PQ_INT32: 4, _PQ_INT64: 8, _PQ_DOUBLE: 8}.get(ptype)
    if size is None:
        raise ValueError(
            "parquet writer: BYTE_STREAM_SPLIT needs a fixed-width type"
        )
    n = len(values)
    out = bytearray(size * n)
    for j in range(size):
        out[j * n : (j + 1) * n] = plain[j::size]
    return bytes(out)


def build_split_block_bloom(hashes, num_blocks: int) -> bytes:
    """Split-block Bloom filter bitset (parquet-format BloomFilter.md)
    — the insert inverse of ``parquet_index.SplitBlockBloom``: the top
    32 hash bits pick the 256-bit block, the low 32 set one bit per
    salted word."""
    from metricproxy_spark.sources.parquet_index import _M32, _SALT

    if num_blocks < 1:
        raise ValueError("parquet bloom: need at least one block")
    words = [0] * (num_blocks * 8)
    for h in hashes:
        block = ((h >> 32) * num_blocks) >> 32
        key = h & _M32
        base = block * 8
        for i in range(8):
            words[base + i] |= 1 << (((key * _SALT[i]) & _M32) >> 27)
    return struct.pack(f"<{len(words)}I", *words)


def _bloom_hashes(ptype: int, values) -> list:
    """Hash inputs via the READ side's own helpers in
    ``parquet_index`` — one definition of the hash-input contract for
    both directions. Dedup happens on the resulting hashes (not raw
    values), so double 0.0/-0.0 — equal values with different plain
    encodings — both normalize through ``bloom_hash_double``."""
    from metricproxy_spark.sources.parquet_index import (
        bloom_hash_bytes,
        bloom_hash_double,
        bloom_hash_int32,
        bloom_hash_int64,
    )

    if ptype == _PQ_INT64:
        hasher = bloom_hash_int64
    elif ptype == _PQ_INT32:
        hasher = bloom_hash_int32
    elif ptype == _PQ_DOUBLE:
        hasher = bloom_hash_double
    elif ptype == _PQ_BYTE_ARRAY:

        def hasher(v):
            return bloom_hash_bytes(_as_bytes(v))

    else:
        raise ValueError("parquet bloom: unsupported column type")
    return list({hasher(v) for v in values})


def write_parquet(
    path: str,
    schema: list,
    columns: dict,
    *,
    nullable=frozenset(),
    dictionary=frozenset(),
    row_group_rows: int = 1 << 20,
    page_rows: int = 1 << 16,
    codec: str = "uncompressed",
    page_index: bool = True,
    bloom=frozenset(),
    data_page_version: int = 1,
    column_encoding=None,
) -> int:
    """Write ``columns`` (name → list of Python values, ``None`` only
    in ``nullable`` columns) as a parquet file readable by pyarrow,
    DuckDB, Spark AND this repo's own page decoder. ``schema`` is
    ``[(name, "int64"|"int32"|"double"|"string"|"boolean"), ...]`` in
    column order; ``dictionary`` names string columns to encode via
    the v1 PLAIN_DICTIONARY pair. With ``page_index`` (default) every
    chunk also gets a ColumnIndex/OffsetIndex pair in the
    between-data-and-footer section (parquet-format PageIndex.md) —
    the same side structures the repo's own page-index pruning reads.
    Returns the number of row groups."""
    if codec not in _CODEC:
        raise ValueError(f"parquet writer: unsupported codec {codec!r}")
    if data_page_version not in (1, 2):
        raise ValueError("parquet writer: data_page_version must be 1 or 2")
    v2 = data_page_version == 2
    colenc = dict(column_encoding or {})
    if colenc and not v2:
        raise ValueError(
            "parquet writer: column_encoding requires data_page_version=2"
        )
    _ENC_BY_NAME = {
        "plain": _ENC_PLAIN,
        "delta_binary_packed": _ENC_DELTA_BP,
        "delta_length_byte_array": _ENC_DELTA_LEN_BA,
        "delta_byte_array": _ENC_DELTA_BA,
        "byte_stream_split": _ENC_BYTE_STREAM_SPLIT,
    }
    for cname, ce in colenc.items():
        if ce not in _ENC_BY_NAME:
            raise ValueError(f"parquet writer: unknown encoding {ce!r}")
        if cname in dictionary:
            raise ValueError(
                "parquet writer: column_encoding conflicts with dictionary"
            )
    names = [n for n, _ in schema]
    n_rows = len(columns[names[0]])
    for n in names:
        if len(columns[n]) != n_rows:
            raise ValueError("parquet writer: ragged columns")
        if n not in nullable and any(v is None for v in columns[n]):
            raise ValueError(f"parquet writer: null in REQUIRED column {n!r}")
    out = bytearray(b"PAR1")
    row_groups = []  # thrift RowGroup structs
    index_recs = []  # (chunk struct, page records) for the page index
    bloom_recs = []  # (cmeta struct, value hashes) for bloom filters
    rg_starts = list(range(0, n_rows, row_group_rows)) or [0]
    for rg_lo in rg_starts:
        rg_hi = min(rg_lo + row_group_rows, n_rows)
        chunks = []
        rg_total_raw = 0
        for name, typ in schema:
            ptype = _TYPES[typ]
            vals = columns[name][rg_lo:rg_hi]
            opt = name in nullable
            use_dict = name in dictionary
            if use_dict and typ != "string":
                raise ValueError(
                    "parquet writer: dictionary supported for strings only"
                )
            encodings = {_ENC_RLE}
            first_off = len(out)
            dict_off = None
            raw_sum = comp_sum = 0
            non_null = [v for v in vals if v is not None]
            dict_vals = None
            if use_dict:
                # dictionary page first: PLAIN values, insertion
                # order (v1 labels it with the legacy pair; v2 with
                # the modern PLAIN + RLE_DICTIONARY convention)
                seen = {}
                for v in non_null:
                    if v not in seen:
                        seen[v] = len(seen)
                dict_vals = seen
                body = _plain(ptype, list(seen))
                comp = _compress(codec, body)
                hdr = _page_header(
                    len(seen),
                    _ENC_PLAIN if v2 else _ENC_PLAIN_DICTIONARY,
                    len(body),
                    len(comp),
                    dictionary=True,
                )
                dict_off = len(out)
                out += hdr + comp
                raw_sum += len(body) + len(hdr)
                comp_sum += len(comp) + len(hdr)
                encodings.add(
                    _ENC_RLE_DICTIONARY if v2 else _ENC_PLAIN_DICTIONARY
                )
            elif name in colenc:
                encodings.add(_ENC_BY_NAME[colenc[name]])
            elif v2 and typ in ("int64", "int32"):
                encodings.add(_ENC_DELTA_BP)
            else:
                encodings.add(_ENC_PLAIN)
            data_off = len(out)
            pages_rec = []  # per data page, for the page index
            for p_lo in range(0, len(vals), page_rows):
                pv = vals[p_lo : p_lo + page_rows]
                pnn = [v for v in pv if v is not None]
                if v2:
                    # v2 framing: RLE def levels UNCOMPRESSED and
                    # un-prefixed at the page front; only the values
                    # section rides the codec
                    defs_bytes = (
                        _rle_runs([0 if v is None else 1 for v in pv], 1)
                        if opt
                        else b""
                    )
                    ce = colenc.get(name)
                    if use_dict:
                        bw = max((len(dict_vals) - 1).bit_length(), 1)
                        vbody = bytes([bw]) + _bitpacked(
                            [dict_vals[v] for v in pnn], bw
                        )
                        enc = _ENC_RLE_DICTIONARY
                    elif ce == "byte_stream_split":
                        vbody = byte_stream_split_enc(ptype, pnn)
                        enc = _ENC_BYTE_STREAM_SPLIT
                    elif ce == "delta_byte_array":
                        vbody = delta_byte_array_enc(pnn)
                        enc = _ENC_DELTA_BA
                    elif ce == "delta_length_byte_array":
                        vbody = delta_length_byte_array_enc(pnn)
                        enc = _ENC_DELTA_LEN_BA
                    elif ce == "plain":
                        vbody = _plain(ptype, pnn)
                        enc = _ENC_PLAIN
                    elif typ in ("int64", "int32"):
                        vbody = delta_binary_packed_enc(
                            pnn, 64 if typ == "int64" else 32
                        )
                        enc = _ENC_DELTA_BP
                    else:
                        vbody = _plain(ptype, pnn)
                        enc = _ENC_PLAIN
                    comp = _compress(codec, vbody)
                    hdr = _page_header_v2(
                        len(pv),
                        len(pv) - len(pnn),
                        enc,
                        len(defs_bytes),
                        len(vbody),
                        len(comp),
                        codec != "uncompressed",
                    )
                    body = defs_bytes + vbody  # raw size accounting
                    comp = defs_bytes + comp
                else:
                    body = bytearray()
                    if opt:
                        defs = [0 if v is None else 1 for v in pv]
                        rle = _rle_runs(defs, 1)
                        body += struct.pack("<I", len(rle)) + rle
                    if use_dict:
                        bw = max((len(dict_vals) - 1).bit_length(), 1)
                        body.append(bw)
                        body += _bitpacked([dict_vals[v] for v in pnn], bw)
                        enc = _ENC_PLAIN_DICTIONARY
                    else:
                        body += _plain(ptype, pnn)
                        enc = _ENC_PLAIN
                    body = bytes(body)
                    comp = _compress(codec, body)
                    hdr = _page_header(
                        len(pv), enc, len(body), len(comp)
                    )
                p_stat = _stat_values(typ, pnn)
                pages_rec.append(
                    {
                        "offset": len(out),
                        "size": len(hdr) + len(comp),
                        "first_row": p_lo,  # relative to the row group
                        "min": (
                            _stat_bytes(ptype, min(p_stat))
                            if p_stat
                            else b""
                        ),
                        "max": (
                            _stat_bytes(ptype, max(p_stat))
                            if p_stat
                            else b""
                        ),
                        "null_count": len(pv) - len(pnn),
                        "null_page": not pnn,
                        # a non-null page whose values are ALL NaN has
                        # undefined bounds: the whole chunk's page
                        # index is skipped rather than lie
                        "no_bounds": bool(pnn) and not p_stat,
                    }
                )
                out += hdr + comp
                raw_sum += len(body) + len(hdr)
                comp_sum += len(comp) + len(hdr)
            rg_total_raw += raw_sum
            stats = []
            c_stat = _stat_values(typ, non_null)
            if c_stat:
                mx = _stat_bytes(ptype, max(c_stat))
                mn = _stat_bytes(ptype, min(c_stat))
                stats = [
                    (3, "i64", len(vals) - len(non_null)),  # null_count
                    (5, "binary", mx),  # max_value
                    (6, "binary", mn),  # min_value
                ]
            cmeta = [
                (1, "i32", ptype),
                (2, "list", ("i32", sorted(encodings))),
                (3, "list", ("binary", [name.encode("utf-8")])),
                (4, "i32", _CODEC[codec]),
                (5, "i64", len(vals)),
                (6, "i64", raw_sum),
                (7, "i64", comp_sum),
                (9, "i64", data_off),
            ]
            if dict_off is not None:
                cmeta.append((11, "i64", dict_off))
            if stats:
                cmeta.append((12, "struct", stats))
            if name in bloom:
                bloom_recs.append((cmeta, _bloom_hashes(ptype, non_null)))
            chunk = [(2, "i64", first_off), (3, "struct", cmeta)]
            chunks.append(chunk)
            index_recs.append((chunk, pages_rec))
        row_groups.append(
            [
                (1, "list", ("struct", chunks)),
                (2, "i64", rg_total_raw),
                (3, "i64", rg_hi - rg_lo),
            ]
        )
    # Bloom-filter section (BloomFilter.md): header + bitset per
    # opted-in chunk; ColumnMetaData fields 14/15 point at it. Sized
    # to the next power of two >= ~10 bits per distinct value
    # (split-block fpp ~1% at that density).
    for cmeta, hashes in bloom_recs:
        nblocks = 1
        while nblocks * 256 < max(len(hashes), 1) * 10:
            nblocks <<= 1
        bitset = build_split_block_bloom(hashes, nblocks)
        hdr = _enc_struct(
            [
                (1, "i32", len(bitset)),  # numBytes
                (2, "struct", [(1, "struct", [])]),  # algorithm: BLOCK
                (3, "struct", [(1, "struct", [])]),  # hash: XXHASH
                (4, "struct", [(1, "struct", [])]),  # compression: none
            ]
        )
        cmeta.append((14, "i64", len(out)))  # bloom_filter_offset
        cmeta.append((15, "i32", len(hdr) + len(bitset)))
        out += hdr + bitset
    if page_index:
        # PageIndex section (parquet-format PageIndex.md): all
        # ColumnIndex structs, then all OffsetIndex structs, between
        # the last data page and the footer; each ColumnChunk points
        # at its pair via fields 4-7.
        index_recs = [
            (chunk, pages_rec)
            for chunk, pages_rec in index_recs
            if not any(p["no_bounds"] for p in pages_rec)
        ]
        for chunk, pages_rec in index_recs:
            ci = _enc_struct(
                [
                    (1, "list", ("bool", [p["null_page"] for p in pages_rec])),
                    (2, "list", ("binary", [p["min"] for p in pages_rec])),
                    (3, "list", ("binary", [p["max"] for p in pages_rec])),
                    (4, "i32", 0),  # BoundaryOrder.UNORDERED
                    (5, "list", ("i64", [p["null_count"] for p in pages_rec])),
                ]
            )
            chunk.append((6, "i64", len(out)))  # column_index_offset
            chunk.append((7, "i32", len(ci)))  # column_index_length
            out += ci
        for chunk, pages_rec in index_recs:
            oi = _enc_struct(
                [
                    (
                        1,
                        "list",
                        (
                            "struct",
                            [
                                [
                                    (1, "i64", p["offset"]),
                                    (2, "i32", p["size"]),
                                    (3, "i64", p["first_row"]),
                                ]
                                for p in pages_rec
                            ],
                        ),
                    )
                ]
            )
            # insert before fields 6/7 so field ids stay sorted
            chunk.insert(2, (4, "i64", len(out)))  # offset_index_offset
            chunk.insert(3, (5, "i32", len(oi)))  # offset_index_length
            out += oi
    footer = _enc_struct(
        [
            (1, "i32", 1),  # version
            (2, "list", ("struct", _schema_elements(schema, nullable))),
            (3, "i64", n_rows),
            (4, "list", ("struct", row_groups)),
            (6, "binary", b"metricproxy_spark parquet writer"),
        ]
    )
    out += footer
    out += struct.pack("<i", len(footer))
    out += b"PAR1"
    import os

    tmp = f"{path}.tmp.{os.getpid()}"
    with open(tmp, "wb") as fh:
        fh.write(out)
    os.replace(tmp, path)
    return len(rg_starts)
