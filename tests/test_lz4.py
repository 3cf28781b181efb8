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


class TestXxh32:
    def test_known_answer_vectors(self):
        # public XXH32 test vectors (Cyan4973/xxHash)
        from metricproxy_spark.sources.lz4 import xxh32

        assert xxh32(b"") == 0x02CC5D05
        assert xxh32(b"abc") == 0x32D153FF

    def test_seed_changes_hash(self):
        from metricproxy_spark.sources.lz4 import xxh32

        assert xxh32(b"abc", 1) != xxh32(b"abc", 0)

    def test_all_code_paths(self):
        # <16 bytes (small path), 4-byte tail, 1-byte tail, stripes
        from metricproxy_spark.sources.lz4 import xxh32

        for n in (0, 1, 3, 4, 5, 15, 16, 17, 31, 32, 100):
            data = bytes(range(n % 256))[:n] or b""
            data = bytes((i * 7) % 256 for i in range(n))
            h = xxh32(data)
            assert 0 <= h <= 0xFFFFFFFF
            assert h == xxh32(data)  # deterministic


class TestLz4Frame:
    def _rt(self, data, **kw):
        from metricproxy_spark.sources.lz4 import (
            compress_lz4_frame,
            decompress_lz4_frame,
        )

        blob = compress_lz4_frame(data)
        assert decompress_lz4_frame(blob, max_out=len(data) + 64, **kw) == data
        return blob

    def test_empty_and_small(self):
        self._rt(b"")
        self._rt(b"x")
        self._rt(b"hello frame world")

    def test_multi_block(self):
        # >64 KiB forces multiple blocks
        data = (b"abcdefgh" * 8192) + b"tail"
        blob = self._rt(data)
        assert len(blob) < len(data) // 4  # RLE-ish input compresses

    def test_incompressible_blocks_stored_raw(self):
        import random

        from metricproxy_spark.sources.lz4 import compress_lz4_frame

        rng = random.Random(9)
        data = bytes(rng.randrange(256) for _ in range(70_000))
        blob = self._rt(data)
        # stored blocks carry the high-bit size flag; total overhead
        # stays under header+checksums bounds
        assert len(blob) < len(data) + 64

    def test_bad_magic(self):
        import pytest as _pytest

        from metricproxy_spark.sources.lz4 import decompress_lz4_frame

        with _pytest.raises(ValueError, match="magic"):
            decompress_lz4_frame(b"\x00\x00\x00\x00" + b"\x00" * 8)

    def test_header_checksum_enforced(self):
        import pytest as _pytest

        from metricproxy_spark.sources.lz4 import (
            compress_lz4_frame,
            decompress_lz4_frame,
        )

        blob = bytearray(compress_lz4_frame(b"payload"))
        blob[14] ^= 0xFF  # the HC byte (magic4 + FLG/BD2 + size8)
        with _pytest.raises(ValueError, match="header checksum"):
            decompress_lz4_frame(bytes(blob))

    def test_block_checksum_enforced(self):
        import pytest as _pytest

        from metricproxy_spark.sources.lz4 import (
            compress_lz4_frame,
            decompress_lz4_frame,
        )

        blob = bytearray(compress_lz4_frame(b"block checksum payload"))
        blob[20] ^= 1  # inside the first block's bytes
        with _pytest.raises(ValueError, match="checksum"):
            decompress_lz4_frame(bytes(blob))

    def test_content_size_and_checksum_enforced(self):
        import pytest as _pytest

        from metricproxy_spark.sources.lz4 import (
            compress_lz4_frame,
            decompress_lz4_frame,
        )

        blob = bytearray(compress_lz4_frame(b"content checks"))
        blob[-1] ^= 1  # content checksum trailer
        with _pytest.raises(ValueError, match="content checksum"):
            decompress_lz4_frame(bytes(blob))

    def test_trailing_bytes_rejected(self):
        import pytest as _pytest

        from metricproxy_spark.sources.lz4 import (
            compress_lz4_frame,
            decompress_lz4_frame,
        )

        with _pytest.raises(ValueError, match="trailing"):
            decompress_lz4_frame(compress_lz4_frame(b"abc") + b"z")

    def test_every_truncated_prefix_raises(self):
        import pytest as _pytest

        from metricproxy_spark.sources.lz4 import (
            compress_lz4_frame,
            decompress_lz4_frame,
        )

        blob = compress_lz4_frame(b"prefix discipline " * 30)
        for cut in range(len(blob)):
            with _pytest.raises(ValueError):
                decompress_lz4_frame(blob[:cut])

    def test_max_out_bound(self):
        import pytest as _pytest

        from metricproxy_spark.sources.lz4 import (
            compress_lz4_frame,
            decompress_lz4_frame,
        )

        blob = compress_lz4_frame(b"z" * 200_000)
        with _pytest.raises(ValueError, match="max_out"):
            decompress_lz4_frame(blob, max_out=1000)


    def test_linked_blocks_rejected_up_front(self):
        """FLG bit 5 clear = linked blocks (`lz4 -BD` output): matches
        may reach into PRIOR blocks' output, which this per-block-window
        decoder cannot honor — it must refuse at the header, not
        misdecode into a confusing offset error (r11 ADVICE)."""
        import pytest as _pytest

        from metricproxy_spark.sources.lz4 import (
            decompress_lz4_frame,
            xxh32,
        )

        desc = bytes((0x5C, 0x40))  # version 01, b.indep CLEAR, bchk+csize+cchk
        hdr = (
            b"\x04\x22\x4d\x18"
            + desc
            + b"\x00" * 8  # content size field (csize flag set)
        )
        chk = (xxh32(desc + b"\x00" * 8) >> 8) & 0xFF
        with _pytest.raises(ValueError, match="linked blocks"):
            decompress_lz4_frame(hdr + bytes([chk]))
