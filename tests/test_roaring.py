"""Portable RoaringBitmap + Delta deletion-vector framing tests
(codec discipline: roundtrips across container types, hand-pinned
byte layout against the public RoaringFormatSpec, run-container and
both-cookie decode, truncation scans, CRC/cardinality strictness)."""

from __future__ import annotations

import random
import struct

import pytest

from metricproxy_spark.sources.roaring import (
    deserialize_rba,
    deserialize_roaring32,
    read_dv,
    serialize_rba,
    serialize_roaring32,
    write_dv_file,
)


class TestRoaring32:
    @pytest.mark.parametrize(
        "values",
        [
            [],
            [0],
            [65535],
            [65536],
            [1, 2, 3, 70000, 70001, (5 << 16) | 9],
            list(range(100000, 105000)),  # one bitmap container
            [0xFFFFFFFF],
        ],
    )
    def test_roundtrip(self, values):
        got, end = deserialize_roaring32(serialize_roaring32(values))
        assert got == sorted(set(values))

    def test_random_roundtrips(self):
        rng = random.Random(42)
        for _ in range(20):
            n = rng.randrange(0, 8000)
            vals = [rng.randrange(1 << 32) for _ in range(n)]
            got, _ = deserialize_roaring32(serialize_roaring32(vals))
            assert got == sorted(set(vals))

    def test_pinned_layout_no_run_cookie(self):
        """RoaringFormatSpec: cookie 12346 LE, container count, then
        (key, cardinality-1) pairs, offsets, array containers."""
        blob = serialize_roaring32([1, 2, 100000])
        cookie, size = struct.unpack_from("<ii", blob, 0)
        assert (cookie, size) == (12346, 2)
        k0, c0, k1, c1 = struct.unpack_from("<HHHH", blob, 8)
        assert (k0, c0) == (0, 1)  # key 0, cardinality 2
        assert (k1, c1) == (1, 0)  # key 1 (65536..), cardinality 1
        off0, off1 = struct.unpack_from("<ii", blob, 16)
        assert off0 == 24 and off1 == 28  # past 8+8+8 header
        assert struct.unpack_from("<HH", blob, off0) == (1, 2)
        assert struct.unpack_from("<H", blob, off1) == (100000 - 65536,)

    def test_bitmap_container_threshold(self):
        # 4097 values in one chunk -> 8 KiB bitmap container
        vals = list(range(4097))
        blob = serialize_roaring32(vals)
        assert len(blob) == 8 + 4 + 4 + 8192
        got, _ = deserialize_roaring32(blob)
        assert got == vals

    def test_run_container_decode(self):
        """The encoder never emits runs, but spec-valid run streams
        (cookie 12347) must decode: hand-build one run container
        [5, 6, 7, 8] + [20]."""
        size = 1
        blob = struct.pack("<i", 12347 | ((size - 1) << 16))
        blob += bytes([0b1])  # run flag for container 0
        blob += struct.pack("<HH", 0, 4)  # key 0, cardinality 5
        # < NO_OFFSET_THRESHOLD containers -> no offsets
        blob += struct.pack("<H", 2)  # two runs
        blob += struct.pack("<HH", 5, 3)  # 5..8
        blob += struct.pack("<HH", 20, 0)  # 20
        got, end = deserialize_roaring32(blob)
        assert got == [5, 6, 7, 8, 20]
        assert end == len(blob)

    def test_bad_cookie_and_truncations(self):
        with pytest.raises(ValueError, match="cookie"):
            deserialize_roaring32(struct.pack("<i", 9999))
        blob = serialize_roaring32([1, 2, 100000])
        for cut in range(len(blob)):
            with pytest.raises(ValueError):
                deserialize_roaring32(blob[:cut])

    def test_unsorted_array_rejected(self):
        blob = bytearray(serialize_roaring32([10, 20]))
        # swap the two sorted uint16s in the array container
        off = struct.unpack_from("<i", blob, 12)[0]
        blob[off : off + 4] = struct.pack("<HH", 20, 10)
        with pytest.raises(ValueError, match="not sorted"):
            deserialize_roaring32(bytes(blob))


class TestRbaAndDv:
    def test_rba_64bit_roundtrip(self):
        vals = [0, 1, (1 << 32) + 5, (3 << 32) | 0xFFFF, (1 << 40) + 9]
        assert deserialize_rba(serialize_rba(vals)) == sorted(set(vals))

    def test_rba_bad_magic_and_trailing(self):
        blob = serialize_rba([1, 2])
        with pytest.raises(ValueError, match="magic"):
            deserialize_rba(b"\x00\x00\x00\x00" + blob[4:])
        with pytest.raises(ValueError, match="trailing"):
            deserialize_rba(blob + b"x")

    def test_dv_file_roundtrip_and_descriptors(self):
        dvs = [[0, 1, 5], [1000, (1 << 33) + 7], list(range(5000))]
        data, descs = write_dv_file(dvs)
        assert data[0] == 1  # version byte
        for dv, d in zip(dvs, descs):
            got = read_dv(
                data, d["offset"], d["sizeInBytes"], d["cardinality"]
            )
            assert got == set(dv)

    def test_dv_crc_verified_before_decode(self):
        data, descs = write_dv_file([[0, 1, 5]])
        bad = bytearray(data)
        bad[6] ^= 1  # inside the bitmap blob
        with pytest.raises(ValueError, match="CRC-32"):
            read_dv(
                bytes(bad),
                descs[0]["offset"],
                descs[0]["sizeInBytes"],
                descs[0]["cardinality"],
            )

    def test_dv_cardinality_and_size_mismatch(self):
        data, descs = write_dv_file([[0, 1, 5]])
        d = descs[0]
        with pytest.raises(ValueError, match="cardinality"):
            read_dv(data, d["offset"], d["sizeInBytes"], 99)
        with pytest.raises(ValueError, match="size field"):
            read_dv(data, d["offset"], d["sizeInBytes"] + 1, 3)

    def test_dv_bad_version(self):
        data, descs = write_dv_file([[1]])
        d = descs[0]
        with pytest.raises(ValueError, match="version"):
            read_dv(b"\x02" + data[1:], d["offset"], d["sizeInBytes"], 1)
