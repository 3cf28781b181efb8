"""Kafka RecordBatch v2 codec tests (codec discipline: roundtrips
across all compression types, CRC-first verification, hand-pinned
layout, truncation scans, fuzz)."""

from __future__ import annotations

import random
import struct

import pytest

from metricproxy_spark.sources.kafka_records import (
    GZIP,
    LZ4,
    NONE,
    SNAPPY,
    ZSTD,
    decode_record_batch,
    decode_record_batches,
    encode_record_batch,
)

RECORDS = [
    (1704412800000, b"k1", b"v1", [("type", b"click")]),
    (1704412801000, None, b"v2", []),
    (1704412802500, b"k3", None, [("a", b"1"), ("b", None)]),
    (1704412800000, b"", b"", [("empty", b"")]),
]


class TestRoundtrip:
    @pytest.mark.parametrize("comp", [NONE, GZIP, SNAPPY, LZ4, ZSTD])
    def test_all_compression_types(self, comp):
        blob = encode_record_batch(RECORDS, base_offset=7, compression=comp)
        bo, c, out = decode_record_batch(blob)
        assert (bo, c) == (7, comp)
        assert [r for _, _, r in out] == RECORDS
        assert [o for o, _, _ in out] == [7, 8, 9, 10]
        assert [t for _, t, _ in out] == [r[0] for r in RECORDS]

    def test_compression_shrinks_repetitive_batches(self):
        recs = [(1000 + i, b"key", b"value" * 40, []) for i in range(200)]
        raw = encode_record_batch(recs, compression=NONE)
        for comp in (GZIP, SNAPPY, LZ4):
            assert len(encode_record_batch(recs, compression=comp)) < len(raw) // 4

    def test_segment_of_batches(self):
        seg = b"".join(
            encode_record_batch(RECORDS, base_offset=i * 100, compression=c)
            for i, c in enumerate((NONE, GZIP, SNAPPY, LZ4, ZSTD))
        )
        batches = decode_record_batches(seg)
        assert [b[0] for b in batches] == [0, 100, 200, 300, 400]
        assert [b[1] for b in batches] == [NONE, GZIP, SNAPPY, LZ4, ZSTD]

    def test_single_record(self):
        blob = encode_record_batch([(5, b"k", b"v", [])])
        _, _, out = decode_record_batch(blob)
        assert out == [(0, 5, (5, b"k", b"v", []))]

    def test_timestamp_deltas_from_minimum(self):
        # out-of-order timestamps: base is the MIN, deltas may be big
        recs = [(500, b"a", b"1", []), (100, b"b", b"2", []), (900, b"c", b"3", [])]
        _, _, out = decode_record_batch(encode_record_batch(recs))
        assert [t for _, t, _ in out] == [500, 100, 900]


class TestHeaderLayout:
    def test_pinned_header_fields(self):
        blob = encode_record_batch(RECORDS, base_offset=42)
        assert struct.unpack_from(">q", blob, 0)[0] == 42  # baseOffset
        assert struct.unpack_from(">i", blob, 8)[0] == len(blob) - 12
        assert blob[16] == 2  # magic v2
        assert struct.unpack_from(">h", blob, 21)[0] == NONE  # attributes
        assert struct.unpack_from(">i", blob, 23)[0] == 3  # lastOffsetDelta
        assert struct.unpack_from(">q", blob, 27)[0] == 1704412800000
        assert struct.unpack_from(">q", blob, 35)[0] == 1704412802500
        assert struct.unpack_from(">q", blob, 43)[0] == -1  # producerId
        assert struct.unpack_from(">i", blob, 57)[0] == 4  # record count


class TestStrictness:
    def test_crc_verified_first(self):
        blob = bytearray(encode_record_batch(RECORDS))
        blob[25] ^= 1  # flip inside the crc-covered body
        with pytest.raises(ValueError, match="CRC-32C"):
            decode_record_batch(bytes(blob))

    def test_wrong_magic(self):
        blob = bytearray(encode_record_batch(RECORDS))
        blob[16] = 1
        with pytest.raises(ValueError, match="magic"):
            decode_record_batch(bytes(blob))

    def test_batch_length_mismatch(self):
        blob = encode_record_batch(RECORDS)
        with pytest.raises(ValueError, match="batchLength|truncated"):
            decode_record_batch(blob + b"x")

    def test_empty_batch_rejected(self):
        with pytest.raises(ValueError, match="empty"):
            encode_record_batch([])

    def test_zstd_checksum_covered(self):
        """Type 4 (the r11 VERDICT's documented raise, now a real leg):
        a corrupted zstd payload fails the batch CRC first; with a
        recomputed CRC it then fails the frame's own XXH64 checksum."""
        from metricproxy_spark.sources.snappy import crc32c

        blob = bytearray(encode_record_batch(RECORDS, compression=ZSTD))
        blob[-3] ^= 1  # inside the zstd payload
        with pytest.raises(ValueError, match="CRC-32C"):
            decode_record_batch(bytes(blob))
        blob[17:21] = struct.pack(">I", crc32c(bytes(blob[21:])))
        with pytest.raises(ValueError, match="zstd"):
            decode_record_batch(bytes(blob))

    def test_every_truncated_prefix_raises(self):
        blob = encode_record_batch(RECORDS, compression=GZIP)
        for cut in range(len(blob)):
            with pytest.raises(ValueError):
                decode_record_batch(blob[:cut])

    def test_fuzz_raises_valueerror_only(self):
        rng = random.Random(53)
        for _ in range(1500):
            b = bytes(rng.randrange(256) for _ in range(rng.randint(0, 90)))
            try:
                decode_record_batch(b)
            except ValueError:
                pass

    def test_segment_truncation_raises(self):
        seg = b"".join(
            encode_record_batch(RECORDS, base_offset=i) for i in range(3)
        )
        for cut in (len(seg) - 1, len(seg) - 30, 5):
            with pytest.raises(ValueError):
                decode_record_batches(seg[:cut])
