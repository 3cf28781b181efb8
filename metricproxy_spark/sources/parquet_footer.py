"""Parquet FOOTER reader via a from-scratch Thrift COMPACT-protocol
decoder (S-ext format introspection).

Parquet is the repo's bloodstream — every testdata table, every sink.
Its metadata (the footer) is a Thrift-compact-serialized
``FileMetaData`` struct; being able to read it with ZERO libraries is
what a catalog/compaction/pruning layer does at 100 TB (file pruning
reads footers, never data). Two public specs, both implemented
directly:

1. **Thrift compact protocol** (apache/thrift
   doc/specs/thrift-compact-protocol.md): struct fields are
   ``(field-id delta << 4) | type`` headers with zigzag-varint i16/
   i32/i64, type nibbles BOOL_TRUE(1)/BOOL_FALSE(2)/BYTE(3)/I16(4)/
   I32(5)/I64(6)/DOUBLE(7)/BINARY(8)/LIST(9)/SET(10)/MAP(11)/
   STRUCT(12); long-form field ids follow as zigzag varint; list
   headers pack ``(size << 4) | elem-type`` with size 15 escaping to
   a varint. The walker here decodes ANY compact struct into
   ``{field_id: value}`` dicts — unknown fields are parsed (not
   skipped blind), which is exactly what format evolution needs.
2. **Parquet footer framing** (apache/parquet-format README +
   parquet.thrift): file tail is ``[footer bytes][int32 LE footer
   length]["PAR1"]``; ``FileMetaData`` field ids used here: 1 version,
   2 schema (list<SchemaElement>: 4 = name, 5 = num_children),
   3 num_rows, 4 row_groups (list<RowGroup>: 1 columns, 2
   total_byte_size, 3 num_rows), 6 created_by.

The decode is strict (truncated varints/structs, bad magic, negative
lengths raise ``ValueError``) and the tests verify every decoded
number against DuckDB's independent ``parquet_metadata()`` /
``parquet_file_metadata()`` readers over the real testdata files.
"""

from __future__ import annotations

import struct

_BOOL_TRUE, _BOOL_FALSE = 1, 2
_BYTE, _I16, _I32, _I64, _DOUBLE, _BINARY = 3, 4, 5, 6, 7, 8
_LIST, _SET, _MAP, _STRUCT = 9, 10, 11, 12


def _read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    out = shift = 0
    while True:
        if pos >= len(buf):
            raise ValueError("thrift: truncated varint")
        b = buf[pos]
        pos += 1
        out |= (b & 0x7F) << shift
        if not b & 0x80:
            return out, pos
        shift += 7
        if shift > 70:
            raise ValueError("thrift: varint overlong")


def _unzigzag(u: int) -> int:
    return (u >> 1) ^ -(u & 1)


def _read_value(buf: bytes, pos: int, vtype: int):
    if vtype == _BOOL_TRUE:
        return True, pos
    if vtype == _BOOL_FALSE:
        return False, pos
    if vtype == _BYTE:
        if pos >= len(buf):
            raise ValueError("thrift: truncated byte")
        return struct.unpack_from("b", buf, pos)[0], pos + 1
    if vtype in (_I16, _I32, _I64):
        u, pos = _read_varint(buf, pos)
        return _unzigzag(u), pos
    if vtype == _DOUBLE:
        if pos + 8 > len(buf):
            raise ValueError("thrift: truncated double")
        return struct.unpack_from("<d", buf, pos)[0], pos + 8
    if vtype == _BINARY:
        ln, pos = _read_varint(buf, pos)
        if pos + ln > len(buf):
            raise ValueError("thrift: truncated binary")
        return bytes(buf[pos : pos + ln]), pos + ln
    if vtype in (_LIST, _SET):
        return _read_list(buf, pos)
    if vtype == _MAP:
        return _read_map(buf, pos)
    if vtype == _STRUCT:
        return _read_struct(buf, pos)
    raise ValueError(f"thrift: unknown compact type {vtype}")


def _read_list(buf: bytes, pos: int):
    if pos >= len(buf):
        raise ValueError("thrift: truncated list header")
    header = buf[pos]
    pos += 1
    size = header >> 4
    etype = header & 0x0F
    if size == 15:
        size, pos = _read_varint(buf, pos)
    # Bomb guard (repo codec contract, same discipline as the deflate
    # and LZ4 max_out bounds): the size varint is attacker-controlled.
    # Every non-bool element consumes >=1 input byte, and packed bools
    # are capped by the same remaining-bytes bound — a 2^60-element
    # header over a 20-byte footer is rejected before allocation.
    if size > len(buf) - pos:
        raise ValueError("thrift: list size exceeds remaining bytes")
    out = []
    if etype in (_BOOL_TRUE, _BOOL_FALSE):
        # In a STRUCT the bool rides in the field header, but LIST
        # elements occupy one byte each (compact spec: 1=true, 2=false)
        # — e.g. ColumnIndex.null_pages.
        for _ in range(size):
            if pos >= len(buf):
                raise ValueError("thrift: truncated bool list")
            out.append(buf[pos] == 1)
            pos += 1
        return out, pos
    for _ in range(size):
        v, pos = _read_value(buf, pos, etype)
        out.append(v)
    return out, pos


def _read_map(buf: bytes, pos: int):
    size, pos = _read_varint(buf, pos)
    if size == 0:
        return {}, pos
    if size > len(buf) - pos:  # same bomb guard as _read_list
        raise ValueError("thrift: map size exceeds remaining bytes")
    if pos >= len(buf):
        raise ValueError("thrift: truncated map header")
    ktype, vtype = buf[pos] >> 4, buf[pos] & 0x0F
    pos += 1
    out = {}
    for _ in range(size):
        k, pos = _read_value(buf, pos, ktype)
        v, pos = _read_value(buf, pos, vtype)
        out[k] = v
    return out, pos


def _read_struct(buf: bytes, pos: int):
    """Compact struct → {field_id: value}; booleans are packed in the
    field header, deltas accumulate, long-form ids are zigzag."""
    fields: dict[int, object] = {}
    last_id = 0
    while True:
        if pos >= len(buf):
            raise ValueError("thrift: truncated struct")
        header = buf[pos]
        pos += 1
        if header == 0:  # STOP
            return fields, pos
        delta = header >> 4
        vtype = header & 0x0F
        if delta:
            fid = last_id + delta
        else:
            u, pos = _read_varint(buf, pos)
            fid = _unzigzag(u)
        last_id = fid
        v, pos = _read_value(buf, pos, vtype)
        fields[fid] = v


def decode_footer(footer: bytes) -> dict:
    """Footer bytes (the Thrift blob, no framing) → summary dict:
    ``num_rows``, ``created_by``, ``columns`` (leaf names in schema
    order), ``row_groups`` = [(num_rows, total_byte_size, n_chunks)]."""
    meta, _end = _read_struct(footer, 0)
    schema = meta.get(2) or []
    columns = []
    for elem in schema:
        name = elem.get(4, b"").decode("utf-8")
        num_children = elem.get(5)
        if not num_children:  # leaf (root carries num_children)
            columns.append(name)
    row_groups = []
    for rg in meta.get(4) or []:
        row_groups.append(
            (
                int(rg.get(3, 0)),
                int(rg.get(2, 0)),
                len(rg.get(1) or []),
            )
        )
    created = meta.get(6)
    return {
        "version": int(meta.get(1, 0)),
        "num_rows": int(meta.get(3, 0)),
        "created_by": created.decode("utf-8") if created else None,
        "columns": columns,
        "row_groups": row_groups,
    }


def decode_rowgroup_stats(footer: bytes, column: str) -> list[dict]:
    """Per-ROW-GROUP statistics of one leaf ``column`` from the raw
    footer bytes — the data-skipping half of the catalog story
    (parquet.thrift: RowGroup.columns → ColumnChunk.meta_data(3) →
    ColumnMetaData.path_in_schema(3) / num_values(5) /
    statistics(12); Statistics.max_value(5)/min_value(6) with the
    deprecated max(1)/min(2) as fallback). Values are returned as the
    raw plain-encoded bytes — :func:`stat_int64` decodes the INT64
    case (8-byte little-endian two's complement). One dict per row
    group: ``{"num_rows", "min_raw", "max_raw", "null_count"}``.
    Raises if the column has no chunk or no statistics in any group —
    a pruning layer must never silently treat "no stats" as "matches
    nothing"."""
    meta, _end = _read_struct(footer, 0)
    out = []
    for rg_i, rg in enumerate(meta.get(4) or []):
        found = None
        for chunk in rg.get(1) or []:
            cmeta = chunk.get(3)
            if not isinstance(cmeta, dict):
                continue
            path = b".".join(cmeta.get(3) or []).decode("utf-8")
            if path == column:
                found = cmeta
                break
        if found is None:
            raise ValueError(
                f"parquet: no column chunk for {column!r} "
                f"in row group {rg_i}"
            )
        st = found.get(12)
        if not isinstance(st, dict) or not (
            (5 in st and 6 in st) or (1 in st and 2 in st)
        ):
            raise ValueError(
                f"parquet: no min/max statistics for {column!r} "
                f"in row group {rg_i}"
            )
        out.append(
            {
                "num_rows": int(rg.get(3, 0)),
                "min_raw": st.get(6, st.get(2)),
                "max_raw": st.get(5, st.get(1)),
                "null_count": int(st.get(3, 0)) if 3 in st else None,
            }
        )
    return out


def stat_int64(raw: bytes) -> int:
    """Plain-encoded INT64 statistics value → Python int."""
    if len(raw) != 8:
        raise ValueError("parquet: INT64 stat is not 8 bytes")
    return struct.unpack("<q", raw)[0]


def read_parquet_footer(data: bytes) -> dict:
    """A whole parquet file's bytes → :func:`decode_footer` summary.
    Validates both magics and the footer length frame."""
    if len(data) < 12:
        raise ValueError("parquet: file shorter than framing")
    if data[:4] != b"PAR1" or data[-4:] != b"PAR1":
        raise ValueError("parquet: bad magic")
    (flen,) = struct.unpack_from("<i", data, len(data) - 8)
    if flen < 0 or flen + 8 > len(data):
        raise ValueError("parquet: footer length out of range")
    start = len(data) - 8 - flen
    return decode_footer(data[start : len(data) - 8])


def read_footer_bytes(path: str) -> bytes:
    """Read ONLY a parquet file's footer from disk — the two tail
    seeks a real catalog sweep does (never the data pages): 8-byte
    tail frame → footer length → one ranged read of the Thrift blob.
    Validates both magics (head magic via a 4-byte ranged read)."""
    import os

    size = os.path.getsize(path)
    if size < 12:
        raise ValueError("parquet: file shorter than framing")
    with open(path, "rb") as fh:
        if fh.read(4) != b"PAR1":
            raise ValueError("parquet: bad magic")
        fh.seek(size - 8)
        tail = fh.read(8)
        if tail[4:] != b"PAR1":
            raise ValueError("parquet: bad magic")
        (flen,) = struct.unpack("<i", tail[:4])
        if flen < 0 or flen + 8 > size:
            raise ValueError("parquet: footer length out of range")
        fh.seek(size - 8 - flen)
        return fh.read(flen)
