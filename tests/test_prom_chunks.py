"""Prometheus XOR chunk + streamed remote-read framing tests (codec
discipline: roundtrips, hand-pinned layouts, truncation scans, CRC)."""

from __future__ import annotations

import random
import struct

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from metricproxy_spark.sources.prom_chunks import (
    decode_chunked_read_response,
    decode_chunked_stream,
    decode_xor_chunk,
    encode_chunked_read_response,
    encode_chunked_stream,
    encode_xor_chunk,
)
from metricproxy_spark.sources.remote_read import (
    STREAMED_XOR_CHUNKS,
    decode_read_request_full,
    encode_read_request,
)


def _bits_equal(a, b):
    return [(t, struct.pack("<d", v)) for t, v in a] == [
        (t, struct.pack("<d", v)) for t, v in b
    ]


class TestXorChunk:
    def test_empty(self):
        assert decode_xor_chunk(encode_xor_chunk([])) == []

    def test_single_sample_layout(self):
        # count=1 big-endian, t=5 zigzag varint (10), v=1.0 raw bits
        enc = encode_xor_chunk([(5, 1.0)])
        assert enc[:2] == b"\x00\x01"
        assert enc[2] == 10  # zigzag(5)
        assert enc[3:11] == struct.pack(">Q", 0x3FF0000000000000)

    def test_repeated_value_spends_one_bit(self):
        # constant series: after the 2 raw samples, each point costs
        # 1 bit (dod=0) + 1 bit (xor=0)
        samples = [(i * 60000, 42.0) for i in range(1000)]
        enc = encode_xor_chunk(samples)
        assert len(enc) < 2 + 20 + 1000 // 4 + 16
        assert _bits_equal(decode_xor_chunk(enc), samples)

    def test_irregular_timestamps(self):
        rng = random.Random(3)
        t, samples = 0, []
        for _ in range(500):
            t += rng.randint(0, 10**7)
            samples.append((t, rng.random() * 1e9))
        assert _bits_equal(decode_xor_chunk(encode_xor_chunk(samples)), samples)

    def test_nan_negzero_denormal_bit_fidelity(self):
        samples = [
            (0, float("nan")),
            (1, -0.0),
            (2, 5e-324),
            (3, float("inf")),
            (4, -1.7976931348623157e308),
        ]
        assert _bits_equal(decode_xor_chunk(encode_xor_chunk(samples)), samples)

    def test_all_dod_buckets(self):
        # deltas engineered to hit every prefix bucket incl. 64-bit
        ts = [0, 100]
        for jump in (100, 101, 5000, 400_000, 10**12):
            ts.append(ts[-1] + jump)
        samples = [(t, float(i)) for i, t in enumerate(ts)]
        assert _bits_equal(decode_xor_chunk(encode_xor_chunk(samples)), samples)

    @settings(max_examples=100, deadline=None)
    @given(
        st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=1 << 40),
                st.floats(allow_nan=False),
            ),
            max_size=200,
        )
    )
    def test_hypothesis_roundtrip(self, raw):
        # enforce the time-ordered contract by cumulative deltas
        t, samples = 0, []
        for dt, v in raw:
            t += dt
            samples.append((t, v))
        assert _bits_equal(decode_xor_chunk(encode_xor_chunk(samples)), samples)

    def test_unordered_rejected(self):
        with pytest.raises(ValueError, match="time-ordered"):
            encode_xor_chunk([(100, 1.0), (50, 2.0)])
        with pytest.raises(ValueError, match="time-ordered"):
            encode_xor_chunk([(0, 1.0), (100, 2.0), (50, 3.0)])

    def test_too_many_samples_rejected(self):
        with pytest.raises(ValueError, match="65535"):
            encode_xor_chunk([(i, 0.0) for i in range(65536)])

    def test_every_truncated_prefix_raises(self):
        samples = [(i * 1000, float(i % 7)) for i in range(50)]
        enc = encode_xor_chunk(samples)
        for cut in range(2, len(enc)):
            with pytest.raises(ValueError):
                decode_xor_chunk(enc[:cut])

    def test_fuzz_raises_valueerror_only(self):
        rng = random.Random(47)
        for _ in range(2000):
            b = bytes(rng.randrange(256) for _ in range(rng.randint(0, 60)))
            try:
                decode_xor_chunk(b)
            except ValueError:
                pass


class TestChunkedResponse:
    def _series(self):
        samples = [(100, 1.0), (200, 2.5), (300, 2.5)]
        chunk = encode_xor_chunk(samples)
        return (
            {"__name__": "m", "type": "a"},
            [(100, 300, chunk)],
            samples,
        )

    def test_roundtrip_with_query_index(self):
        labels, chunks, samples = self._series()
        msg = encode_chunked_read_response([(labels, chunks)], query_index=3)
        series, qi = decode_chunked_read_response(msg)
        assert qi == 3
        assert series == [(labels, samples)]

    def test_unsupported_encoding_rejected(self):
        labels, chunks, _ = self._series()
        msg = bytearray(
            encode_chunked_read_response([(labels, chunks)])
        )
        # Chunk.type enum value 1 (XOR) follows its field-3 tag 0x18;
        # patch to HISTOGRAM(2)
        idx = msg.index(0x18)
        assert msg[idx + 1] == 1
        msg[idx + 1] = 2
        with pytest.raises(ValueError, match="encoding"):
            decode_chunked_read_response(bytes(msg))

    def test_samples_outside_bounds_rejected(self):
        labels, _, samples = self._series()
        bad_chunk = [(150, 300, encode_xor_chunk(samples))]  # min_t lies
        msg = encode_chunked_read_response([(labels, bad_chunk)])
        with pytest.raises(ValueError, match="bounds"):
            decode_chunked_read_response(msg)


class TestStreamFraming:
    def test_roundtrip_multi_frame(self):
        msgs = [b"", b"abc", bytes(range(100))]
        assert decode_chunked_stream(encode_chunked_stream(msgs)) == msgs

    def test_crc_mismatch(self):
        blob = bytearray(encode_chunked_stream([b"payload"]))
        blob[3] ^= 1  # flip a payload byte
        with pytest.raises(ValueError, match="CRC-32C"):
            decode_chunked_stream(bytes(blob))

    def test_truncated_frame(self):
        blob = encode_chunked_stream([b"payload"])
        for cut in range(1, len(blob)):
            with pytest.raises(ValueError):
                decode_chunked_stream(blob[:cut])


class TestResponseTypeNegotiation:
    def test_packed_roundtrip(self):
        blob = encode_read_request(
            [(0, 10, [])], accepted_response_types=[STREAMED_XOR_CHUNKS]
        )
        queries, accepted = decode_read_request_full(blob)
        assert queries == [(0, 10, [])]
        assert accepted == [STREAMED_XOR_CHUNKS]

    def test_unpacked_spelling_accepted(self):
        # field 2, wire 0, value 1 appended manually
        blob = encode_read_request([(0, 10, [])]) + bytes([0x10, 0x01])
        _, accepted = decode_read_request_full(blob)
        assert accepted == [STREAMED_XOR_CHUNKS]

    def test_absent_means_samples_only(self):
        _, accepted = decode_read_request_full(
            encode_read_request([(0, 10, [])])
        )
        assert accepted == []
