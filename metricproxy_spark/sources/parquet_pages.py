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
  length-prefixed byte arrays) or PLAIN_/RLE_DICTIONARY (a PLAIN
  dictionary page + indices as one-byte-bitwidth RLE hybrid) — the
  two encodings parquet-mr actually emits for v1 pages.

DATA_PAGE_V2, nested schemas (repetition levels) and the remaining
codecs raise clean, named errors. Strictness contract as everywhere:
truncated varints/pages/levels raise ``ValueError``; the decoded
value count must equal the chunk's declared ``num_values``.
"""

from __future__ import annotations

import struct

from metricproxy_spark.sources.parquet_footer import (
    _read_struct,
    read_footer_bytes,
)

_PLAIN, _PLAIN_DICT, _RLE, _RLE_DICT = 0, 2, 3, 8
_DATA_PAGE, _DICT_PAGE, _DATA_PAGE_V2 = 0, 2, 3
_TYPES = {1: "int32", 2: "int64", 4: "float", 5: "double", 6: "byte_array"}


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
        if shift > 35:
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
    fmt, size = {
        "int32": ("<i", 4),
        "int64": ("<q", 8),
        "float": ("<f", 4),
        "double": ("<d", 8),
    }[ptype]
    if size * count > len(buf):
        raise ValueError("parquet pages: truncated plain values")
    return list(struct.unpack_from(f"<{count}{fmt[1:]}", buf, 0))


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
        body = _decompress(
            region[body_pos : body_pos + comp_size],
            chunk["codec"],
            uncomp_size,
        )
        pos = body_pos + comp_size
        if ptype == _DICT_PAGE:
            dhdr = hdr.get(7) or {}
            dictionary = _plain_values(
                body, chunk["type"], int(dhdr.get(1, 0))
            )
            continue
        if ptype == _DATA_PAGE_V2:
            raise ValueError("parquet pages: DATA_PAGE_V2 not supported")
        if ptype != _DATA_PAGE:
            raise ValueError(f"parquet pages: unexpected page type {ptype}")
        dph = hdr.get(5) or {}
        n = int(dph.get(1, 0))
        encoding = int(dph.get(2, 0))
        p = 0
        if chunk["optional"]:
            if int(dph.get(3, _RLE)) != _RLE:
                raise ValueError(
                    "parquet pages: non-RLE definition levels unsupported"
                )
            (dlen,) = struct.unpack_from("<I", body, p)
            p += 4
            defs, _ = rle_hybrid(body, p, p + dlen, 1, n)
            p += dlen
        else:
            defs = [1] * n
        n_present = sum(defs)
        if encoding == _PLAIN:
            present = _plain_values(body[p:], chunk["type"], n_present)
        elif encoding in (_PLAIN_DICT, _RLE_DICT):
            if dictionary is None:
                raise ValueError(
                    "parquet pages: dictionary-encoded page with no "
                    "dictionary page"
                )
            if p >= len(body):
                raise ValueError("parquet pages: truncated index page")
            bw = body[p]
            idx, _ = rle_hybrid(body, p + 1, len(body), bw, n_present)
            if any(i >= len(dictionary) for i in idx):
                raise ValueError("parquet pages: dictionary index overflow")
            present = [dictionary[i] for i in idx]
        else:
            raise ValueError(
                f"parquet pages: unsupported value encoding {encoding}"
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
