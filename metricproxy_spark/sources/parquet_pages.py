"""Parquet DATA-PAGE decoding from scratch — the footer story
completed into an actual column READ (S-ext format introspection,
zero libraries end to end).

`sources/parquet_footer.py` decodes the Thrift-compact footer; this
module walks a real column chunk's pages and regenerates the values,
directly from the public format (apache/parquet-format README +
parquet.thrift + Encodings.md):

- **Page framing**: each page is a Thrift-compact ``PageHeader``
  (type(1), uncompressed_page_size(2), compressed_page_size(3),
  data_page_header(5){num_values, encoding, definition_level_
  encoding}, dictionary_page_header(7){num_values, encoding})
  followed by ``compressed_page_size`` bytes of page data.
- **Compression**: the page body rides UNCOMPRESSED(0), SNAPPY(1),
  GZIP(2) or ZSTD(6) — three of which are THIS REPO'S own
  from-scratch codecs (`sources/snappy.py`, `sources/deflate.py`,
  `sources/zstd.py`), so a Spark-written snappy file decodes with no
  library anywhere in the stack.
- **Definition levels** (optional columns, max level 1 in flat
  schemas): a 4-byte LE length then the RLE/BIT-PACKED HYBRID —
  varint header, LSB 0 = run (value in ceil(bitwidth/8) bytes),
  LSB 1 = bit-packed groups of 8, values packed LSB-first.
- **Values**: PLAIN (little-endian int32/int64/float/double;
  length-prefixed byte arrays), PLAIN_/RLE_DICTIONARY (a PLAIN
  dictionary page + indices as one-byte-bitwidth RLE hybrid), and the
  MODERN encodings (Encodings.md): DELTA_BINARY_PACKED (zigzag-varint
  header + per-block min_delta + bit-packed miniblocks, wrapping
  two's-complement arithmetic at the physical width),
  DELTA_LENGTH_BYTE_ARRAY (DBP lengths + concatenated bytes),
  DELTA_BYTE_ARRAY (DBP prefix lengths + DLBA suffixes, incremental
  front-coding) and BYTE_STREAM_SPLIT (k byte-planes of n values).
- **DATA_PAGE_V2** framing: the ``data_page_header_v2`` Thrift struct
  (num_values(1), num_nulls(2), num_rows(3), encoding(4),
  definition_levels_byte_length(5), repetition_levels_byte_length(6),
  is_compressed(7)); levels ride UNCOMPRESSED and un-prefixed at the
  front of the page — only the values section goes through the codec.

Nested schemas (repetition levels) raise clean, named errors.
Strictness contract as everywhere: truncated varints/pages/levels
raise ``ValueError``; the decoded value count must equal the chunk's
declared ``num_values``.
"""

from __future__ import annotations

import struct

from metricproxy_spark.sources.parquet_footer import (
    _read_struct,
    read_footer_bytes,
)

_PLAIN, _PLAIN_DICT, _RLE, _RLE_DICT = 0, 2, 3, 8
_DELTA_BP, _DELTA_LEN_BA, _DELTA_BA, _BYTE_STREAM_SPLIT = 5, 6, 7, 9
_DATA_PAGE, _DICT_PAGE, _DATA_PAGE_V2 = 0, 2, 3
_TYPES = {1: "int32", 2: "int64", 4: "float", 5: "double", 6: "byte_array"}
_FIXED = {"int32": ("i", 4), "int64": ("q", 8), "float": ("f", 4), "double": ("d", 8)}


def column_chunk_meta(footer: bytes, column: str) -> list[dict]:
    """Per-row-group chunk metadata for one leaf ``column``:
    {type, codec, num_values, start, nbytes, optional}."""
    meta, _end = _read_struct(footer, 0)
    # repetition_type from the schema walk (flat schemas: root + leaves)
    optional = None
    for elem in meta.get(2) or []:
        name = elem.get(4, b"").decode("utf-8")
        if not elem.get(5) and name == column:
            optional = elem.get(3, 1) == 1
            if elem.get(3, 1) == 2:
                raise ValueError("parquet pages: repeated fields unsupported")
    if optional is None:
        raise ValueError(f"parquet pages: no leaf column {column!r}")
    out = []
    for rg_i, rg in enumerate(meta.get(4) or []):
        cmeta = None
        for chunk in rg.get(1) or []:
            cm = chunk.get(3)
            if isinstance(cm, dict):
                path = b".".join(cm.get(3) or []).decode("utf-8")
                if path == column:
                    cmeta = cm
                    break
        if cmeta is None:
            raise ValueError(
                f"parquet pages: no chunk for {column!r} in rg {rg_i}"
            )
        ptype = cmeta.get(1)
        if ptype not in _TYPES:
            raise ValueError(
                f"parquet pages: unsupported physical type {ptype}"
            )
        data_off = int(cmeta.get(9))
        dict_off = cmeta.get(11)
        start = int(dict_off) if dict_off is not None else data_off
        out.append(
            {
                "type": _TYPES[ptype],
                "codec": int(cmeta.get(4, 0)),
                "num_values": int(cmeta.get(5, 0)),
                "start": start,
                "nbytes": int(cmeta.get(7, 0)),  # total_compressed_size
                "optional": optional,
            }
        )
    return out


def _decompress(data: bytes, codec: int, out_size: int) -> bytes:
    if codec == 0:
        out = data
    elif codec == 1:
        from metricproxy_spark.sources.snappy import decompress_snappy

        # snappy's own preamble declares the size; the equality check
        # below is the bomb guard for this path
        out = decompress_snappy(data)
    elif codec == 2:
        from metricproxy_spark.sources.deflate import decompress_gzip

        out = decompress_gzip(data, max_out=out_size + 64)
    elif codec == 6:
        from metricproxy_spark.sources.zstd import decompress_zstd

        out = decompress_zstd(data, max_out=out_size + 64)
    else:
        raise ValueError(f"parquet pages: unsupported codec {codec}")
    if len(out) != out_size:
        raise ValueError("parquet pages: page size mismatch after codec")
    return out


def _uvarint(buf: bytes, pos: int) -> tuple[int, int]:
    out = shift = 0
    while True:
        if pos >= len(buf):
            raise ValueError("parquet pages: truncated varint")
        b = buf[pos]
        pos += 1
        out |= (b & 0x7F) << shift
        if not b & 0x80:
            return out, pos
        shift += 7
        # DELTA_BINARY_PACKED headers carry zigzag int64 (10 bytes max)
        if shift > 66:
            raise ValueError("parquet pages: varint overlong")


def rle_hybrid(
    buf: bytes, pos: int, end: int, bit_width: int, count: int
) -> tuple[list[int], int]:
    """The RLE/BIT-PACKED hybrid (Encodings.md) → exactly ``count``
    ints. ``end`` bounds the encoded region."""
    out: list[int] = []
    wbytes = (bit_width + 7) // 8
    mask = (1 << bit_width) - 1
    while len(out) < count:
        if pos >= end:
            raise ValueError("parquet pages: hybrid runs out of bytes")
        header, pos = _uvarint(buf, pos)
        if header & 1:  # bit-packed groups of 8
            groups = header >> 1
            nbytes = groups * bit_width
            if pos + nbytes > end:
                raise ValueError("parquet pages: truncated bit-packed run")
            word = int.from_bytes(buf[pos : pos + nbytes], "little")
            pos += nbytes
            n = min(groups * 8, count - len(out))
            for i in range(n):
                out.append((word >> (i * bit_width)) & mask)
        else:
            run = header >> 1
            if pos + wbytes > end:
                raise ValueError("parquet pages: truncated RLE run")
            val = (
                int.from_bytes(buf[pos : pos + wbytes], "little")
                if wbytes
                else 0
            )
            pos += wbytes
            if run > count - len(out):
                run = count - len(out)  # trailing-run padding is legal
            out.extend([val] * run)
    return out, pos


def _plain_values(buf: bytes, ptype: str, count: int) -> list:
    if ptype == "byte_array":
        out = []
        pos = 0
        for _ in range(count):
            if pos + 4 > len(buf):
                raise ValueError("parquet pages: truncated byte array")
            (n,) = struct.unpack_from("<I", buf, pos)
            pos += 4
            if pos + n > len(buf):
                raise ValueError("parquet pages: truncated byte array")
            out.append(bytes(buf[pos : pos + n]))
            pos += n
        return out
    fmt, size = _FIXED[ptype]
    if size * count > len(buf):
        raise ValueError("parquet pages: truncated plain values")
    return list(struct.unpack_from(f"<{count}{fmt}", buf, 0))


def _zigzag_varint(buf: bytes, pos: int) -> tuple[int, int]:
    u, pos = _uvarint(buf, pos)
    return (u >> 1) ^ -(u & 1), pos


def _delta_binary_packed(
    buf: bytes, pos: int, count: int, width: int
) -> tuple[list[int], int]:
    """DELTA_BINARY_PACKED (Encodings.md §Delta Encoding): header
    ``<block_size> <miniblocks_per_block> <total_count> <first zigzag>``
    then per block a zigzag ``min_delta``, one bit-width byte per
    miniblock, and LSB-first bit-packed delta residues. Arithmetic
    wraps two's-complement at the physical ``width`` (32/64) — exact
    accumulation followed by a masked fold is congruent mod 2^width,
    so plain Python ints are safe."""
    block_size, pos = _uvarint(buf, pos)
    n_mini, pos = _uvarint(buf, pos)
    total, pos = _uvarint(buf, pos)
    first, pos = _zigzag_varint(buf, pos)
    if total != count:
        raise ValueError("parquet pages: delta value count mismatch")
    if n_mini == 0 or block_size % n_mini or (block_size // n_mini) % 8:
        raise ValueError("parquet pages: bad delta block geometry")
    per_mini = block_size // n_mini
    full = 1 << width
    sign = full >> 1

    def wrap(v: int) -> int:
        v &= full - 1
        return v - full if v & sign else v

    if total == 0:
        return [], pos
    out = [wrap(first)]
    value = first
    while len(out) < total:
        min_delta, pos = _zigzag_varint(buf, pos)
        if pos + n_mini > len(buf):
            raise ValueError("parquet pages: truncated miniblock widths")
        widths = buf[pos : pos + n_mini]
        pos += n_mini
        for bw in widths:
            if len(out) >= total:
                break  # trailing miniblock bodies are not written
            if bw > width:
                raise ValueError("parquet pages: miniblock width too wide")
            nbytes = bw * per_mini // 8
            if pos + nbytes > len(buf):
                raise ValueError("parquet pages: truncated miniblock")
            word = int.from_bytes(buf[pos : pos + nbytes], "little")
            pos += nbytes
            mask = (1 << bw) - 1
            for i in range(min(per_mini, total - len(out))):
                value += min_delta + ((word >> (i * bw)) & mask)
                out.append(wrap(value))
    return out, pos


def _delta_length_byte_array(
    buf: bytes, pos: int, count: int
) -> tuple[list[bytes], int]:
    """DELTA_LENGTH_BYTE_ARRAY: DBP-encoded int32 lengths followed by
    the concatenated bytes."""
    lengths, pos = _delta_binary_packed(buf, pos, count, 32)
    out = []
    for n in lengths:
        if n < 0 or pos + n > len(buf):
            raise ValueError("parquet pages: truncated delta byte array")
        out.append(bytes(buf[pos : pos + n]))
        pos += n
    return out, pos


def _delta_byte_array(
    buf: bytes, pos: int, count: int
) -> tuple[list[bytes], int]:
    """DELTA_BYTE_ARRAY (incremental front-coding): DBP prefix lengths
    + DLBA suffixes; value[i] = value[i-1][:prefix[i]] + suffix[i]."""
    prefixes, pos = _delta_binary_packed(buf, pos, count, 32)
    suffixes, pos = _delta_length_byte_array(buf, pos, count)
    out: list[bytes] = []
    prev = b""
    for pl, suf in zip(prefixes, suffixes):
        if pl < 0 or pl > len(prev):
            raise ValueError("parquet pages: prefix length out of range")
        prev = prev[:pl] + suf
        out.append(prev)
    return out, pos


def _byte_stream_split(buf: bytes, ptype: str, count: int) -> list:
    """BYTE_STREAM_SPLIT: k planes of n bytes each — byte j of value i
    lives at plane[j][i]. Exact-length by construction."""
    if ptype not in _FIXED:
        raise ValueError("parquet pages: BYTE_STREAM_SPLIT needs fixed width")
    fmt, size = _FIXED[ptype]
    if len(buf) != size * count:
        raise ValueError("parquet pages: byte-stream-split size mismatch")
    recon = bytearray(size * count)
    for j in range(size):
        recon[j::size] = buf[j * count : (j + 1) * count]
    return list(struct.unpack(f"<{count}{fmt}", bytes(recon)))


def _decode_values(
    body: bytes,
    p: int,
    encoding: int,
    ptype: str,
    count: int,
    dictionary: list | None,
) -> list:
    """The shared value-section dispatch for v1 and v2 data pages."""
    if encoding == _PLAIN:
        return _plain_values(body[p:], ptype, count)
    if encoding in (_PLAIN_DICT, _RLE_DICT):
        if dictionary is None:
            raise ValueError(
                "parquet pages: dictionary-encoded page with no "
                "dictionary page"
            )
        if count == 0:
            return []
        if p >= len(body):
            raise ValueError("parquet pages: truncated index page")
        bw = body[p]
        idx, _ = rle_hybrid(body, p + 1, len(body), bw, count)
        if any(i >= len(dictionary) for i in idx):
            raise ValueError("parquet pages: dictionary index overflow")
        return [dictionary[i] for i in idx]
    if encoding == _DELTA_BP:
        if ptype not in ("int32", "int64"):
            raise ValueError("parquet pages: DELTA_BINARY_PACKED on non-int")
        vals, _ = _delta_binary_packed(
            body, p, count, 32 if ptype == "int32" else 64
        )
        return vals
    if encoding == _DELTA_LEN_BA:
        if ptype != "byte_array":
            raise ValueError("parquet pages: DLBA on non-byte-array")
        vals, _ = _delta_length_byte_array(body, p, count)
        return vals
    if encoding == _DELTA_BA:
        if ptype != "byte_array":
            raise ValueError("parquet pages: DELTA_BYTE_ARRAY on non-BA")
        vals, _ = _delta_byte_array(body, p, count)
        return vals
    if encoding == _BYTE_STREAM_SPLIT:
        return _byte_stream_split(body[p:], ptype, count)
    raise ValueError(f"parquet pages: unsupported value encoding {encoding}")


def decode_column_chunk(path: str, chunk: dict) -> list:
    """One row group's column chunk → Python values (None = null),
    walking every page from raw bytes."""
    with open(path, "rb") as fh:
        fh.seek(chunk["start"])
        region = fh.read(chunk["nbytes"])
    pos = 0
    dictionary: list | None = None
    values: list = []
    while len(values) < chunk["num_values"]:
        hdr, body_pos = _read_struct(region, pos)
        ptype = hdr.get(1)
        comp_size = int(hdr.get(3, 0))
        uncomp_size = int(hdr.get(2, 0))
        if body_pos + comp_size > len(region):
            raise ValueError("parquet pages: truncated page body")
        raw = region[body_pos : body_pos + comp_size]
        pos = body_pos + comp_size
        if ptype == _DICT_PAGE:
            body = _decompress(raw, chunk["codec"], uncomp_size)
            dhdr = hdr.get(7) or {}
            dictionary = _plain_values(
                body, chunk["type"], int(dhdr.get(1, 0))
            )
            continue
        if ptype == _DATA_PAGE:
            body = _decompress(raw, chunk["codec"], uncomp_size)
            dph = hdr.get(5) or {}
            n = int(dph.get(1, 0))
            encoding = int(dph.get(2, 0))
            p = 0
            if chunk["optional"]:
                if int(dph.get(3, _RLE)) != _RLE:
                    raise ValueError(
                        "parquet pages: non-RLE definition levels unsupported"
                    )
                if len(body) < p + 4:
                    raise ValueError(
                        "parquet pages: truncated definition levels"
                    )
                (dlen,) = struct.unpack_from("<I", body, p)
                p += 4
                defs, _ = rle_hybrid(body, p, p + dlen, 1, n)
                p += dlen
            else:
                defs = [1] * n
        elif ptype == _DATA_PAGE_V2:
            dph = hdr.get(8) or {}
            n = int(dph.get(1, 0))
            num_nulls = int(dph.get(2, 0))
            encoding = int(dph.get(4, 0))
            def_len = int(dph.get(5, 0))
            rep_len = int(dph.get(6, 0))
            is_comp = bool(dph.get(7, True))
            if rep_len:
                raise ValueError(
                    "parquet pages: repetition levels unsupported"
                )
            if def_len > len(raw):
                raise ValueError(
                    "parquet pages: truncated v2 definition levels"
                )
            # v2: levels ride uncompressed and un-prefixed at the front
            # of the page; only the values section goes through the codec
            vraw = raw[def_len:]
            body = (
                _decompress(vraw, chunk["codec"], uncomp_size - def_len)
                if is_comp and chunk["codec"]
                else vraw
            )
            if chunk["optional"] and def_len:
                defs, _ = rle_hybrid(raw, 0, def_len, 1, n)
            else:
                defs = [1] * n
            if n - sum(defs) != num_nulls:
                raise ValueError("parquet pages: v2 null count mismatch")
            p = 0
        else:
            raise ValueError(f"parquet pages: unexpected page type {ptype}")
        present = _decode_values(
            body, p, encoding, chunk["type"], sum(defs), dictionary
        )
        it = iter(present)
        values.extend(next(it) if d else None for d in defs)
    if len(values) != chunk["num_values"]:
        raise ValueError("parquet pages: value count mismatch")
    return values


def decode_columns(
    path: str, columns: list[str], rg_index: int
) -> dict[str, list]:
    """Decode several columns of one row group of a parquet FILE —
    the unit a distributed scan parallelizes over."""
    footer = read_footer_bytes(path)
    out = {}
    for col in columns:
        chunks = column_chunk_meta(footer, col)
        if rg_index >= len(chunks):
            raise ValueError("parquet pages: row group out of range")
        out[col] = decode_column_chunk(path, chunks[rg_index])
    return out
