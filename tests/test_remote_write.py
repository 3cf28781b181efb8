"""Snappy block codec + Prometheus remote-write wire codec tests."""

from __future__ import annotations

import math
import random

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from metricproxy_spark.sources.remote_write import (
    decode_remote_write_body,
    decode_write_request,
    encode_remote_write_body,
    encode_write_request,
)
from metricproxy_spark.sources.snappy import compress_snappy, decompress_snappy


class TestSnappy:
    def test_empty(self):
        assert compress_snappy(b"") == b"\x00"
        assert decompress_snappy(b"\x00") == b""

    def test_tiny_literal(self):
        # 2-byte input: varint(2) + literal tag ((2-1)<<2) + bytes
        assert decompress_snappy(b"\x02\x04ab") == b"ab"
        assert decompress_snappy(compress_snappy(b"ab")) == b"ab"

    def test_hand_built_copy_elements(self):
        # "abcd" literal then copy-1 (off=4, len=4) -> "abcdabcd"
        blob = b"\x08" + b"\x0c" + b"abcd" + bytes([((4 >> 8) << 5) | 1, 4])
        assert decompress_snappy(blob) == b"abcdabcd"
        # copy-2 spelling of the same copy
        blob2 = b"\x08" + b"\x0c" + b"abcd" + bytes([(3 << 2) | 2, 4, 0])
        assert decompress_snappy(blob2) == b"abcdabcd"
        # copy-4 spelling
        blob4 = b"\x08" + b"\x0c" + b"abcd" + bytes([(3 << 2) | 3, 4, 0, 0, 0])
        assert decompress_snappy(blob4) == b"abcdabcd"

    def test_overlapping_copy_is_rle(self):
        # literal "a" then copy off=1 len=7 -> "a" * 8
        blob = b"\x08" + b"\x00a" + bytes([(6 << 2) | 2, 1, 0])
        assert decompress_snappy(blob) == b"a" * 8

    def test_rle_compresses(self):
        data = b"x" * 10_000
        enc = compress_snappy(data)
        assert decompress_snappy(enc) == data
        # ~156 copy-2 elements x 3 bytes: 20x+ smaller than the input
        assert len(enc) < 500

    def test_long_literal_forms(self):
        for n in (60, 61, 100, 255, 256, 300, 5000):
            data = bytes(random.Random(n).randrange(256) for _ in range(n))
            assert decompress_snappy(compress_snappy(data)) == data

    def test_seeded_random_roundtrips(self):
        rng = random.Random(7)
        for _ in range(50):
            n = rng.randint(0, 4000)
            # small alphabet -> plenty of matches (copy paths exercised)
            data = bytes(rng.randrange(4) for _ in range(n))
            assert decompress_snappy(compress_snappy(data)) == data

    @settings(max_examples=150, deadline=None)
    @given(st.binary(max_size=2000))
    def test_hypothesis_roundtrip(self, data):
        assert decompress_snappy(compress_snappy(data)) == data

    def test_zero_offset_rejected(self):
        blob = b"\x08" + b"\x0c" + b"abcd" + bytes([(3 << 2) | 2, 0, 0])
        with pytest.raises(ValueError, match="offset"):
            decompress_snappy(blob)

    def test_offset_past_output_rejected(self):
        blob = b"\x08" + b"\x0c" + b"abcd" + bytes([(3 << 2) | 2, 5, 0])
        with pytest.raises(ValueError, match="offset"):
            decompress_snappy(blob)

    def test_wrong_declared_length_rejected(self):
        with pytest.raises(ValueError, match="shorter"):
            decompress_snappy(b"\x03\x04ab")  # declares 3, produces 2
        with pytest.raises(ValueError, match="exceeds"):
            decompress_snappy(b"\x01\x04ab")  # declares 1, produces 2

    def test_every_truncated_prefix_raises(self):
        for seed in (1, 2, 3):
            rng = random.Random(seed)
            data = bytes(rng.randrange(8) for _ in range(rng.randint(1, 800)))
            enc = compress_snappy(data)
            for cut in range(len(enc)):
                with pytest.raises(ValueError):
                    decompress_snappy(enc[:cut])

    def test_fuzz_malformed_raises_valueerror_only(self):
        rng = random.Random(11)
        for _ in range(3000):
            b = bytes(rng.randrange(256) for _ in range(rng.randint(0, 80)))
            try:
                decompress_snappy(b)
            except ValueError:
                pass  # the ONLY permitted failure for foreign bytes


_SERIES = [
    (
        {"__name__": "http_requests_total", "job": "api", "instance": "i-1"},
        [(1.5, 1700000000000), (2.5, 1700000015000)],
    ),
    (
        {"__name__": "up", "job": "api"},
        [(1.0, 1700000000000)],
    ),
    ({"__name__": "empty_series"}, []),
]


class TestWriteRequest:
    def test_roundtrip(self):
        enc = encode_write_request(_SERIES)
        assert decode_write_request(enc) == _SERIES

    def test_full_body_roundtrip_via_snappy(self):
        body = encode_remote_write_body(_SERIES)
        assert decode_remote_write_body(body) == _SERIES

    def test_special_values(self):
        series = [
            (
                {"__name__": "m"},
                [
                    (float("inf"), -5),
                    (float("-inf"), 0),
                    (-0.0, 2**53),
                    (1e-300, -(2**40)),
                ],
            )
        ]
        dec = decode_remote_write_body(encode_remote_write_body(series))
        assert dec == series
        nan_dec = decode_write_request(
            encode_write_request([({"n": "v"}, [(float("nan"), 1)])])
        )
        assert math.isnan(nan_dec[0][1][0][0]) and nan_dec[0][1][0][1] == 1

    def test_labels_emitted_sorted(self):
        enc = encode_write_request([({"z": "1", "a": "2"}, [])])
        # label "a" must serialize before label "z"
        assert enc.find(b"\x01a") < enc.find(b"\x01z")

    def test_unknown_fields_skipped(self):
        # TimeSeries with an extra field 3 (varint) and field 4
        # (length-delimited) interleaved: decoder must skip both.
        inner = bytearray()
        inner += b"\x0a\x06\x0a\x01n\x12\x01v"  # Label{name:"n",value:"v"}
        inner += b"\x18\x2a"  # field 3 varint 42
        inner += b"\x22\x03xyz"  # field 4 bytes "xyz"
        msg = bytes([0x0A, len(inner)]) + bytes(inner)
        assert decode_write_request(msg) == [({"n": "v"}, [])]

    def test_every_truncated_body_prefix_raises_or_degrades_cleanly(self):
        body = encode_remote_write_body(_SERIES)
        for cut in range(len(body)):
            with pytest.raises(ValueError):
                decode_remote_write_body(body[:cut])

    def test_fuzz_raises_valueerror_only(self):
        rng = random.Random(13)
        for _ in range(2000):
            b = bytes(rng.randrange(256) for _ in range(rng.randint(0, 60)))
            try:
                decode_write_request(b)
            except ValueError:
                pass
            try:
                decode_remote_write_body(b)
            except ValueError:
                pass


class TestWriteRequestV2:
    def _rt(self, series):
        from metricproxy_spark.sources.remote_write import (
            decode_write_request_v2,
            encode_write_request_v2,
        )

        return decode_write_request_v2(encode_write_request_v2(series))

    def test_roundtrip(self):
        assert self._rt(_SERIES) == _SERIES

    def test_symbol_table_interned_once(self):
        from metricproxy_spark.sources.remote_write import (
            encode_write_request,
            encode_write_request_v2,
        )

        # 50 series sharing the same label names/values: v2 must be
        # far smaller than v1's repeated Label messages.
        series = [
            (
                {"__name__": "http_requests_total", "job": "api",
                 "instance": f"i-{i % 3}"},
                [(float(i), 1000 + i)],
            )
            for i in range(50)
        ]
        v1 = encode_write_request(series)
        v2 = encode_write_request_v2(series)
        assert self._rt(series) == series
        assert len(v2) < len(v1) / 2
        # the shared name appears exactly once in the v2 body
        assert v2.count(b"http_requests_total") == 1

    def test_unpacked_refs_accepted(self):
        from metricproxy_spark.sources.remote_write import (
            decode_write_request_v2,
        )

        # symbols ["", "n", "v"]; series with UNPACKED field-1 varints
        body = (
            b"\x22\x00" + b"\x22\x01n" + b"\x22\x01v"
            + bytes([0x2A, 4, 0x08, 1, 0x08, 2])
        )
        assert decode_write_request_v2(body) == [({"n": "v"}, [])]

    def test_bad_refs_rejected(self):
        from metricproxy_spark.sources.remote_write import (
            decode_write_request_v2,
        )

        # ref outside the symbol table
        with pytest.raises(ValueError, match="symbol"):
            decode_write_request_v2(
                b"\x22\x00" + bytes([0x2A, 4, 0x0A, 2, 1, 9])
            )
        # odd ref count
        with pytest.raises(ValueError, match="odd"):
            decode_write_request_v2(
                b"\x22\x00\x22\x01n" + bytes([0x2A, 3, 0x0A, 1, 1])
            )
        # non-empty symbols[0]
        with pytest.raises(ValueError, match="empty"):
            decode_write_request_v2(b"\x22\x01x")

    def test_body_roundtrip_and_truncation(self):
        from metricproxy_spark.sources.remote_write import (
            decode_remote_write_body_v2,
            encode_remote_write_body_v2,
        )

        body = encode_remote_write_body_v2(_SERIES)
        assert decode_remote_write_body_v2(body) == _SERIES
        for cut in range(len(body)):
            with pytest.raises(ValueError):
                decode_remote_write_body_v2(body[:cut])

    def test_fuzz_raises_valueerror_only(self):
        from metricproxy_spark.sources.remote_write import (
            decode_write_request_v2,
        )

        rng = random.Random(17)
        for _ in range(2000):
            b = bytes(rng.randrange(256) for _ in range(rng.randint(0, 60)))
            try:
                decode_write_request_v2(b)
            except ValueError:
                pass


class TestSnappyFramed:
    def test_crc32c_known_vectors(self):
        from metricproxy_spark.sources.snappy import crc32c

        # Public CRC-32C check values (RFC 3720 appendix / common
        # catalog): "123456789" -> 0xE3069283; 32 zero bytes -> 0x8A9136AA.
        assert crc32c(b"123456789") == 0xE3069283
        assert crc32c(b"\x00" * 32) == 0x8A9136AA
        assert crc32c(b"") == 0

    def test_roundtrip(self):
        from metricproxy_spark.sources.snappy import (
            compress_snappy_framed,
            decompress_snappy_framed,
        )

        for data in (b"", b"a", b"hello world" * 1000, bytes(range(256)) * 300):
            assert decompress_snappy_framed(compress_snappy_framed(data)) == data

    def test_multi_chunk_over_64k(self):
        from metricproxy_spark.sources.snappy import (
            compress_snappy_framed,
            decompress_snappy_framed,
        )

        data = bytes(random.Random(3).randrange(16) for _ in range(200_000))
        enc = compress_snappy_framed(data)
        assert decompress_snappy_framed(enc) == data
        assert enc.startswith(b"\xff\x06\x00\x00sNaPpY")
        # walk the chunk headers: 200k/64k -> exactly 4 compressed-data
        # chunks, each decoding to <= 64 KiB (the spec cap)
        pos, kinds = 10, []
        while pos < len(enc):
            typ = enc[pos]
            ln = int.from_bytes(enc[pos + 1 : pos + 4], "little")
            kinds.append(typ)
            if typ == 0x00:
                body = enc[pos + 4 : pos + 4 + ln]
                assert len(decompress_snappy(body[4:])) <= 65536
            pos += 4 + ln
        assert kinds == [0x00] * 4

    def test_identifier_required(self):
        from metricproxy_spark.sources.snappy import decompress_snappy_framed

        with pytest.raises(ValueError, match="identifier"):
            decompress_snappy_framed(b"\x00\x04\x00\x00abcd")

    def test_bad_crc_rejected(self):
        from metricproxy_spark.sources.snappy import (
            compress_snappy_framed,
            decompress_snappy_framed,
        )

        enc = bytearray(compress_snappy_framed(b"hello"))
        enc[14] ^= 0xFF  # flip a CRC byte (identifier=10 + header=4)
        with pytest.raises(ValueError, match="CRC"):
            decompress_snappy_framed(bytes(enc))

    def test_uncompressed_padding_skippable_chunks(self):
        from metricproxy_spark.sources.snappy import (
            _STREAM_ID,
            _mask_crc,
            crc32c,
            decompress_snappy_framed,
        )

        body = _mask_crc(crc32c(b"raw!")).to_bytes(4, "little") + b"raw!"
        stream = (
            _STREAM_ID
            + b"\xfe\x02\x00\x00zz"  # padding
            + b"\x01" + len(body).to_bytes(3, "little") + body  # uncompressed
            + b"\x80\x01\x00\x00q"  # reserved skippable
            + _STREAM_ID  # repeated identifier mid-stream is legal
        )
        assert decompress_snappy_framed(stream) == b"raw!"

    def test_unskippable_chunk_rejected(self):
        from metricproxy_spark.sources.snappy import (
            _STREAM_ID,
            decompress_snappy_framed,
        )

        with pytest.raises(ValueError, match="unskippable"):
            decompress_snappy_framed(_STREAM_ID + b"\x02\x01\x00\x00x")

    def test_every_truncated_prefix_raises_or_shrinks(self):
        from metricproxy_spark.sources.snappy import (
            compress_snappy_framed,
            decompress_snappy_framed,
        )

        data = b"the quick brown fox " * 50
        enc = compress_snappy_framed(data)
        # every cut either raises or (cut at a chunk boundary) yields
        # a strict prefix made of whole chunks — never silent garbage
        for cut in range(len(enc)):
            try:
                got = decompress_snappy_framed(enc[:cut])
            except ValueError:
                continue
            assert data.startswith(got) and len(got) < len(data)

    def test_fuzz_raises_valueerror_only(self):
        from metricproxy_spark.sources.snappy import (
            _STREAM_ID,
            decompress_snappy_framed,
        )

        rng = random.Random(19)
        for _ in range(2000):
            b = _STREAM_ID + bytes(
                rng.randrange(256) for _ in range(rng.randint(0, 60))
            )
            try:
                decompress_snappy_framed(b)
            except ValueError:
                pass


class TestSnappyFramedBombGuard:
    def test_over_cap_chunk_refused_before_materialization(self):
        from metricproxy_spark.sources.snappy import (
            _STREAM_ID,
            _mask_crc,
            compress_snappy,
            crc32c,
        )
        from metricproxy_spark.sources.snappy import (
            decompress_snappy_framed,
        )

        # a single chunk whose BLOCK declares ~1 MB (over the 64 KiB
        # cap): the decoder must refuse from the declared length alone
        big = b"b" * 1_000_000
        body = _mask_crc(crc32c(big)).to_bytes(4, "little") + compress_snappy(
            big
        )
        stream = _STREAM_ID + b"\x00" + len(body).to_bytes(3, "little") + body
        with pytest.raises(ValueError, match="64 KiB"):
            decompress_snappy_framed(stream)
