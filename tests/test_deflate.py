"""DEFLATE/gzip/zlib codec tests (same discipline as the snappy/LZ4
suites) — plus BOTH-direction stdlib-zlib interop: stdlib zlib is the
one compression library baked into this environment, so unlike the
other from-scratch codecs this one has a true reference oracle."""

from __future__ import annotations

import gzip as stdlib_gzip
import random
import zlib

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from metricproxy_spark.sources.deflate import (
    adler32,
    compress_gzip,
    compress_zlib,
    crc32,
    decompress_gzip,
    decompress_zlib,
    deflate,
    inflate,
)

SAMPLES = (
    b"",
    b"a",
    b"abc",
    b"a" * 300,
    b"the quick brown fox jumps over the lazy dog " * 64,
    bytes(random.Random(11).randrange(256) for _ in range(5000)),
    bytes(random.Random(13).randrange(4) for _ in range(5000)),
)


class TestInflateInterop:
    def test_stdlib_compress_all_levels_decode(self):
        # level 0 emits STORED blocks, level 1 mostly FIXED, level 6/9
        # DYNAMIC Huffman — all three RFC 1951 block types exercised
        for data in SAMPLES:
            for level in (0, 1, 6, 9):
                raw = zlib.compress(data, level)[2:-4]
                got, _end = inflate(raw, max_out=len(data) + 64)
                assert got == data, (level, len(data))

    def test_our_deflate_accepted_by_stdlib(self):
        for data in SAMPLES:
            assert zlib.decompress(deflate(data), wbits=-15) == data

    def test_roundtrip_ours_both_ways(self):
        for data in SAMPLES:
            got, _ = inflate(deflate(data), max_out=len(data) + 64)
            assert got == data

    @settings(max_examples=120, deadline=None)
    @given(st.binary(max_size=2000))
    def test_hypothesis_roundtrip(self, data):
        got, _ = inflate(deflate(data), max_out=len(data) + 64)
        assert got == data
        assert zlib.decompress(deflate(data), wbits=-15) == data

    def test_length_258_uses_symbol_285(self):
        # a 259-byte run forces one 258-length match + literals; the
        # spec forbids spelling 258 as symbol 284 + extra 31
        data = b"q" * 300
        assert zlib.decompress(deflate(data), wbits=-15) == data

    def test_rle_compresses(self):
        data = b"z" * 50_000
        enc = deflate(data)
        assert len(enc) < 600
        got, _ = inflate(enc, max_out=len(data) + 64)
        assert got == data


class TestInflateMalformed:
    def test_reserved_block_type(self):
        # BFINAL=1 BTYPE=3 -> first byte 0b00000111
        with pytest.raises(ValueError, match="reserved block type"):
            inflate(b"\x07\x00")

    def test_stored_len_nlen_mismatch(self):
        with pytest.raises(ValueError, match="LEN/NLEN"):
            inflate(b"\x01\x05\x00\x00\x00hello")

    def test_stored_truncated(self):
        with pytest.raises(ValueError, match="truncated stored"):
            inflate(b"\x01\x05\x00\xfa\xffhel")

    def test_distance_past_output(self):
        # fixed block whose first symbol is a match: any distance
        # reaches past the (empty) output window
        from metricproxy_spark.sources.deflate import (
            _BitWriter,
            _fixed_lit_code,
        )

        bw = _BitWriter()
        bw.bits(1, 1)  # BFINAL
        bw.bits(1, 2)  # BTYPE fixed
        code, nbits = _fixed_lit_code(257)  # length 3, no extra
        bw.huff(code, nbits)
        bw.huff(0, 5)  # distance symbol 0 -> distance 1 > len(out)=0
        code, nbits = _fixed_lit_code(256)
        bw.huff(code, nbits)
        with pytest.raises(ValueError, match="distance past start"):
            inflate(bw.finish())

    def test_truncated_bitstream(self):
        with pytest.raises(ValueError, match="truncated"):
            inflate(zlib.compress(b"hello world", 6)[2:-4][:3])

    def test_empty_input(self):
        with pytest.raises(ValueError, match="truncated"):
            inflate(b"")

    def test_max_out_bound_distinct_message(self):
        enc = deflate(b"x" * 100_000)
        with pytest.raises(ValueError, match="max_out"):
            inflate(enc, max_out=1000)

    def test_every_truncated_prefix_raises(self):
        # unlike LZ4, DEFLATE has an explicit end-of-block sentinel:
        # every strict prefix must raise (no silent partial decode)
        data = bytes(random.Random(17).randrange(8) for _ in range(800))
        enc = deflate(data)
        for cut in range(len(enc)):
            with pytest.raises(ValueError):
                inflate(enc[:cut])

    def test_fuzz_raises_valueerror_only(self):
        rng = random.Random(19)
        for _ in range(2000):
            b = bytes(rng.randrange(256) for _ in range(rng.randint(0, 60)))
            try:
                inflate(b, max_out=1 << 16)
            except ValueError:
                pass


class TestChecksums:
    def test_crc32_matches_stdlib(self):
        for data in SAMPLES:
            assert crc32(data) == zlib.crc32(data)

    def test_adler32_matches_stdlib(self):
        for data in SAMPLES:
            assert adler32(data) == zlib.adler32(data)

    def test_crc32_incremental(self):
        whole = b"".join(SAMPLES)
        c = 0
        for part in SAMPLES:
            c = crc32(part, c)
        assert c == zlib.crc32(whole)


class TestGzipMember:
    def test_roundtrip_and_stdlib_interop(self):
        for data in SAMPLES:
            blob = compress_gzip(data)
            assert decompress_gzip(blob, max_out=len(data) + 64) == data
            assert stdlib_gzip.decompress(blob) == data
            theirs = stdlib_gzip.compress(data, mtime=0)
            assert decompress_gzip(theirs, max_out=len(data) + 64) == data

    def test_deterministic_output(self):
        # MTIME pinned to 0: same input -> same bytes, a requirement
        # for content-addressed shard writes
        assert compress_gzip(b"abc") == compress_gzip(b"abc")

    def test_optional_header_fields(self):
        data = b"payload " * 20
        body = deflate(data)
        trailer = crc32(data).to_bytes(4, "little") + len(data).to_bytes(
            4, "little"
        )
        # FNAME + FCOMMENT + FEXTRA
        head = (
            b"\x1f\x8b\x08"
            + bytes([1 | 4 | 8 | 16])  # FTEXT|FEXTRA|FNAME|FCOMMENT
            + b"\x00\x00\x00\x00\x00\xff"
            + b"\x04\x00ABCD"  # FEXTRA: xlen=4
            + b"file.txt\x00"
            + b"a comment\x00"
        )
        assert decompress_gzip(head + body + trailer) == data

    def test_header_crc_field(self):
        data = b"hcrc payload"
        body = deflate(data)
        trailer = crc32(data).to_bytes(4, "little") + len(data).to_bytes(
            4, "little"
        )
        head = b"\x1f\x8b\x08\x02\x00\x00\x00\x00\x00\xff"
        hcrc = (crc32(head) & 0xFFFF).to_bytes(2, "little")
        assert decompress_gzip(head + hcrc + body + trailer) == data
        bad = (crc32(head) & 0xFFFF ^ 1).to_bytes(2, "little")
        with pytest.raises(ValueError, match="header CRC"):
            decompress_gzip(head + bad + body + trailer)

    def test_bad_magic(self):
        with pytest.raises(ValueError, match="magic"):
            decompress_gzip(b"\x1f\x8c" + b"\x00" * 10)

    def test_wrong_method(self):
        with pytest.raises(ValueError, match="method"):
            decompress_gzip(b"\x1f\x8b\x07" + b"\x00" * 10)

    def test_crc_mismatch(self):
        blob = bytearray(compress_gzip(b"hello world"))
        blob[-8] ^= 1
        with pytest.raises(ValueError, match="CRC-32 mismatch"):
            decompress_gzip(bytes(blob))

    def test_isize_mismatch(self):
        blob = bytearray(compress_gzip(b"hello world"))
        blob[-4] ^= 1
        with pytest.raises(ValueError, match="ISIZE"):
            decompress_gzip(bytes(blob))

    def test_trailing_bytes_rejected(self):
        with pytest.raises(ValueError, match="trailing"):
            decompress_gzip(compress_gzip(b"abc") + b"x")

    def test_every_truncated_prefix_raises(self):
        blob = compress_gzip(b"prefix discipline " * 10)
        for cut in range(len(blob)):
            with pytest.raises(ValueError):
                decompress_gzip(blob[:cut])


class TestZlibStream:
    def test_roundtrip_and_stdlib_interop(self):
        for data in SAMPLES:
            blob = compress_zlib(data)
            assert decompress_zlib(blob, max_out=len(data) + 64) == data
            assert zlib.decompress(blob) == data
            assert (
                decompress_zlib(zlib.compress(data, 9), max_out=len(data) + 64)
                == data
            )

    def test_header_check_bits(self):
        blob = bytearray(compress_zlib(b"abc"))
        blob[1] ^= 1
        with pytest.raises(ValueError, match="check bits"):
            decompress_zlib(bytes(blob))

    def test_preset_dictionary_rejected(self):
        cmf = 0x78
        flg_base = 0x20
        flg = flg_base + (31 - (cmf * 256 + flg_base) % 31)
        with pytest.raises(ValueError, match="dictionary"):
            decompress_zlib(bytes((cmf, flg)) + b"\x00" * 8)

    def test_adler_mismatch(self):
        blob = bytearray(compress_zlib(b"hello world"))
        blob[-1] ^= 1
        with pytest.raises(ValueError, match="Adler-32"):
            decompress_zlib(bytes(blob))
