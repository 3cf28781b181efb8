"""CBOR codec (sources/cbor.py, RFC 8949): exhaustive type-palette
roundtrips in BOTH framings, the RFC's appendix-A reference vectors,
indefinite-length / chunked-string / tag / float16 decode, and the
foreign-bytes clean-ValueError contract."""

from __future__ import annotations

import math

import pytest

from metricproxy_spark.sources.cbor import (
    decode_cbor,
    decode_cbor_sequence,
    encode_cbor,
)

_CASES = [
    None, True, False,
    0, 1, 23, 24, 255, 256, 65535, 65536, 2**32 - 1, 2**32, 2**64 - 1,
    -1, -24, -25, -256, -257, -65536, -65537, -(2**32), -(2**64),
    1.5, -0.125, math.pi, 0.0,
    "", "a", "x" * 23, "y" * 24, "z" * 300, "é" * 100,
    b"", b"\x00\xff", b"q" * 300,
    [], [1, 2, 3], list(range(30)),
    {}, {"a": 1}, {f"k{i}": i for i in range(30)},
    {"name": "cpu", "value": 1.25, "ts": 1700000000,
     "dims": {"host": "h1", "az": None}, "tags": ["a", "b"]},
]


class TestCbor:
    @pytest.mark.parametrize("obj", _CASES, ids=lambda o: repr(o)[:30])
    def test_roundtrip_definite(self, obj):
        rt = decode_cbor(encode_cbor(obj))
        assert rt == obj
        assert type(rt) is type(obj)

    @pytest.mark.parametrize("obj", _CASES, ids=lambda o: repr(o)[:30])
    def test_roundtrip_indefinite_framing(self, obj):
        rt = decode_cbor(encode_cbor(obj, indefinite=True))
        assert rt == obj

    def test_sequence_framing(self):
        blob = b"".join(encode_cbor(c) for c in _CASES)
        assert decode_cbor_sequence(blob) == _CASES

    def test_rfc8949_appendix_a_vectors(self):
        # encode side (preferred serialization)
        enc_vectors = [
            (0, "00"), (10, "0a"), (23, "17"), (24, "1818"),
            (100, "1864"), (1000, "1903e8"), (1000000, "1a000f4240"),
            (1000000000000, "1b000000e8d4a51000"),
            (18446744073709551615, "1bffffffffffffffff"),
            (-1, "20"), (-10, "29"), (-100, "3863"), (-1000, "3903e7"),
            (1.1, "fb3ff199999999999a"),
            (False, "f4"), (True, "f5"), (None, "f6"),
            ("", "60"), ("a", "6161"), ("IETF", "6449455446"),
            ("ü", "62c3bc"), ("水", "63e6b0b4"),
            (b"", "40"), (bytes.fromhex("01020304"), "4401020304"),
            ([], "80"), ([1, 2, 3], "83010203"),
            ([1, [2, 3], [4, 5]], "8301820203820405"),
            (list(range(1, 26)),
             "98190102030405060708090a0b0c0d0e0f101112131415161718181819"),
            ({}, "a0"),
            ({"a": 1, "b": [2, 3]}, "a26161016162820203"),
            (["a", {"b": "c"}], "826161a161626163"),
        ]
        for obj, hexs in enc_vectors:
            assert encode_cbor(obj) == bytes.fromhex(hexs), obj
            assert decode_cbor(bytes.fromhex(hexs)) == obj, obj
        # decode-only vectors: float16/32, indefinite forms, tags
        dec_vectors = [
            ("f90000", 0.0), ("f93c00", 1.0), ("f93e00", 1.5),
            ("f97bff", 65504.0), ("f90001", 2.0 ** -24),
            ("f9c400", -4.0),
            ("fa47c35000", 100000.0),
            ("c11a514b67b0", 1363896240),  # tag 1 → content
            ("5f42010243030405ff", bytes.fromhex("0102030405")),
            ("7f657374726561646d696e67ff", "streaming"),
            ("9fff", []),
            ("9f018202039f0405ffff", [1, [2, 3], [4, 5]]),
            ("bf61610161629f0203ffff", {"a": 1, "b": [2, 3]}),
            ("826161bf61626163ff", ["a", {"b": "c"}]),
        ]
        for hexs, want in dec_vectors:
            got = decode_cbor(bytes.fromhex(hexs))
            assert got == want, (hexs, got)
        # float16 infinities / NaN
        assert decode_cbor(bytes.fromhex("f97c00")) == float("inf")
        assert decode_cbor(bytes.fromhex("f9fc00")) == float("-inf")
        assert math.isnan(decode_cbor(bytes.fromhex("f97e00")))

    def test_trailing_garbage_rejected(self):
        with pytest.raises(ValueError, match="trailing"):
            decode_cbor(encode_cbor(1) + b"\x01")

    def test_stray_break_rejected(self):
        with pytest.raises(ValueError):
            decode_cbor(b"\xff")
        with pytest.raises(ValueError):
            decode_cbor_sequence(b"\x01\xff")
        with pytest.raises(ValueError):
            decode_cbor(b"\x82\x01\xff")  # break inside definite array

    def test_reserved_info_rejected(self):
        for b in (b"\x1c", b"\x1d", b"\x1e", b"\x3c", b"\xfc", b"\xfe"):
            with pytest.raises(ValueError):
                decode_cbor(b)

    def test_indefinite_tag_rejected(self):
        # 0xDF = major 6 (tag) with info 31: RFC 8949 §3.2 makes
        # indefinite length ill-formed for tags.
        with pytest.raises(ValueError, match="tag"):
            decode_cbor(b"\xdf\x01")

    def test_text_chunk_split_codepoint_rejected(self):
        # U+00E9 is 0xC3 0xA9; splitting it across two text chunks is
        # ill-formed per RFC 8949 §3.2.3 even though the concatenation
        # is valid UTF-8.
        ill = b"\x7f\x61\xc3\x61\xa9\xff"
        with pytest.raises(ValueError):
            decode_cbor(ill)
        # the same bytes as a single chunk decode fine
        assert decode_cbor(b"\x7f\x62\xc3\xa9\xff") == "é"

    def test_huge_declared_count_bounded_before_loop(self):
        # 4-billion-element array/map headers over a 5-byte payload
        # must refuse up front, not append for minutes.
        with pytest.raises(ValueError, match="truncated"):
            decode_cbor(b"\x9a\xff\xff\xff\xff")
        with pytest.raises(ValueError, match="truncated"):
            decode_cbor(b"\xba\xff\xff\xff\xff\x00")

    def test_deep_nesting_bounded(self):
        with pytest.raises(ValueError, match="nesting"):
            decode_cbor(b"\x81" * 4096 + b"\x00")

    def test_fuzz_malformed_raises_valueerror_only(self):
        import random

        rng = random.Random(1)
        for _ in range(3000):
            b = bytes(rng.randrange(256) for _ in range(rng.randint(0, 60)))
            try:
                decode_cbor(b)
                decode_cbor_sequence(b)
            except ValueError:
                pass  # the ONLY permitted failure for foreign bytes

    def test_every_truncated_prefix_raises(self):
        for obj in _CASES:
            for indef in (False, True):
                enc = encode_cbor(obj, indefinite=indef)
                for cut in range(len(enc)):
                    with pytest.raises(ValueError):
                        decode_cbor(enc[:cut])
