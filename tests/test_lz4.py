"""LZ4 block codec tests (same discipline as the snappy suite)."""

from __future__ import annotations

import random

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from metricproxy_spark.sources.lz4 import (
    compress_lz4_block,
    decompress_lz4_block,
)


class TestLz4Block:
    def test_empty(self):
        # the minimal valid block is the lone end-mark token 0x00;
        # srcSize=0 is rejected, matching reference decoders
        assert compress_lz4_block(b"") == b"\x00"
        assert decompress_lz4_block(b"\x00") == b""
        with pytest.raises(ValueError, match="empty"):
            decompress_lz4_block(b"")

    def test_small_inputs_are_all_literals(self):
        # inputs under the 12-byte end rule can never contain a match
        for data in (b"a", b"hello", b"0123456789ab"):
            enc = compress_lz4_block(data)
            assert decompress_lz4_block(enc) == data
            assert data in enc  # literals appear verbatim

    def test_hand_built_sequence(self):
        # 4 literals "abcd", match off=4 len=4, final literal "x":
        # token 0x40 (lit 4, ml 4-4=0), "abcd", offset 04 00, then
        # literals-only token 0x10 + "x"
        blob = b"\x40abcd\x04\x00" + b"\x10x"
        assert decompress_lz4_block(blob) == b"abcdabcdx"

    def test_overlap_rle(self):
        # literal "a", match off=1 len=8 -> "a"*9; final empty literals
        blob = b"\x14a\x01\x00" + b"\x00"
        assert decompress_lz4_block(blob) == b"a" * 9

    def test_rle_compresses(self):
        data = b"z" * 50_000
        enc = compress_lz4_block(data)
        assert decompress_lz4_block(enc) == data
        assert len(enc) < 500  # length extensions: ~197 bytes

    def test_length_extension_boundaries(self):
        # literal runs around the 15 and 15+255 nibble boundaries
        for n in (14, 15, 16, 269, 270, 271, 1000):
            data = bytes(random.Random(n).randrange(256) for _ in range(n))
            assert decompress_lz4_block(compress_lz4_block(data)) == data

    def test_seeded_random_roundtrips(self):
        rng = random.Random(29)
        for _ in range(50):
            n = rng.randint(0, 5000)
            data = bytes(rng.randrange(4) for _ in range(n))
            assert decompress_lz4_block(compress_lz4_block(data)) == data

    @settings(max_examples=150, deadline=None)
    @given(st.binary(max_size=2000))
    def test_hypothesis_roundtrip(self, data):
        assert decompress_lz4_block(compress_lz4_block(data)) == data

    def test_end_rules_hold_on_compressible_tails(self):
        # highly compressible data whose matches would otherwise run
        # into the final 5 bytes: the encoder must stop matches early
        data = b"ab" * 40 + b"abcde"
        enc = compress_lz4_block(data)
        assert decompress_lz4_block(enc) == data
        # the final sequence is literals-only: low nibble of its token
        # is 0 and at least 5 trailing bytes arrive as literals
        assert enc.endswith(data[-5:])

    def test_zero_offset_rejected(self):
        with pytest.raises(ValueError, match="offset"):
            decompress_lz4_block(b"\x40abcd\x00\x00\x00")

    def test_offset_past_output_rejected(self):
        with pytest.raises(ValueError, match="offset"):
            decompress_lz4_block(b"\x40abcd\x05\x00\x00")

    def test_max_out_bound_enforced(self):
        # 1-byte literal + enormous RLE match: must refuse at the
        # bound, not materialize gigabytes
        blob = b"\x1fa\x01\x00" + b"\xff" * 5000 + b"\x00" + b"\x00"
        with pytest.raises(ValueError, match="max_out"):
            decompress_lz4_block(blob, max_out=100_000)

    def test_every_truncated_prefix_raises_or_shrinks(self):
        rng = random.Random(31)
        data = bytes(rng.randrange(8) for _ in range(1200))
        enc = compress_lz4_block(data)
        for cut in range(len(enc)):
            try:
                got = decompress_lz4_block(enc[:cut])
            except ValueError:
                continue
            # a prefix cut at a sequence boundary decodes to a strict
            # prefix of the data (raw blocks have no length header to
            # catch this — the framing layer above would)
            assert data.startswith(got)

    def test_fuzz_raises_valueerror_only(self):
        rng = random.Random(37)
        for _ in range(3000):
            b = bytes(rng.randrange(256) for _ in range(rng.randint(0, 80)))
            try:
                decompress_lz4_block(b, max_out=1 << 20)
            except ValueError:
                pass
