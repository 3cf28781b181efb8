"""GIF codec tests: roundtrip properties (all palette widths, LZW
code-width growth, the 4096 clear-reset), animation metadata, foreign
fixture interop, and honest failure modes."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from metricproxy_spark.operators.gif import (
    decode_gif,
    encode_gif,
    lzw_decode,
    lzw_encode,
)

# the widely-published smallest transparent GIF (1x1, white+black GCT)
TINY_1X1 = (
    b"GIF89a\x01\x00\x01\x00\x80\x00\x00\xff\xff\xff\x00\x00\x00"
    b"!\xf9\x04\x01\x00\x00\x00\x00"
    b",\x00\x00\x00\x00\x01\x00\x01\x00\x00\x02\x02D\x01\x00;"
)


class TestLzw:
    @settings(max_examples=60, deadline=None)
    @given(
        st.integers(2, 8),
        st.lists(st.integers(0, 255), min_size=1, max_size=400),
    )
    def test_roundtrip_any_stream(self, bits, symbols):
        n = 1 << bits
        data = np.array([s % n for s in symbols], np.uint8)
        back = lzw_decode(lzw_encode(data, max(2, bits)), max(2, bits), len(data))
        assert np.array_equal(back, data)

    def test_dict_overflow_forces_clear_reset(self):
        rng = np.random.default_rng(1)
        data = rng.integers(0, 256, 30_000).astype(np.uint8)
        enc = lzw_encode(data, 8)
        assert np.array_equal(lzw_decode(enc, 8, len(data)), data)

    def test_code_width_growth_boundaries(self):
        # a stream long enough to cross 3->4->...->12-bit widths with
        # a tiny alphabet exercises every growth point
        data = np.tile(np.arange(4, dtype=np.uint8), 3000)
        enc = lzw_encode(data, 2)
        assert np.array_equal(lzw_decode(enc, 2, len(data)), data)


class TestGifContainer:
    def test_roundtrip_grid(self):
        rng = np.random.default_rng(2)
        for bits in (2, 4, 7, 8):
            n = 1 << bits
            img = rng.integers(0, n, (11, 17)).astype(np.uint8)
            pal = rng.integers(0, 256, (n, 3)).astype(np.uint8)
            meta, frames, palette = decode_gif(encode_gif(img, pal))
            assert meta["n_colors"] == n and meta["n_frames"] == 1
            assert np.array_equal(frames[0], img)
            assert np.array_equal(palette, pal)

    def test_animation_delays_and_frames(self):
        pal = np.zeros((4, 3), np.uint8)
        f = [np.full((3, 5), k, np.uint8) for k in range(3)]
        blob = encode_gif(f, pal, delays_cs=[7, 11, 13])
        meta, frames, _ = decode_gif(blob)
        assert blob[:6] == b"GIF89a"
        assert meta["delays_cs"] == [7, 11, 13]
        assert all(np.array_equal(a, b) for a, b in zip(frames, f))

    def test_foreign_fixture_decodes(self):
        meta, frames, palette = decode_gif(TINY_1X1)
        assert (meta["width"], meta["height"]) == (1, 1)
        assert frames[0][0, 0] == 0
        assert list(palette[0]) == [255, 255, 255]

    def test_invalid_inputs_raise(self):
        pal4 = np.zeros((4, 3), np.uint8)
        with pytest.raises(ValueError):
            encode_gif(np.zeros((2, 2), np.uint8), np.zeros((5, 3), np.uint8))
        with pytest.raises(ValueError):
            encode_gif(np.full((2, 2), 9, np.uint8), pal4)  # index >= n
        with pytest.raises(ValueError):
            encode_gif(
                [np.zeros((2, 2), np.uint8)] * 2, pal4
            )  # animation without delays
        with pytest.raises(ValueError):
            decode_gif(b"NOTAGIF")

    def test_interlace_roundtrip_all_heights(self):
        """The 4-pass row schedule must invert exactly for every
        height mod 8 (each pass's row set shifts with h)."""
        rng = np.random.default_rng(3)
        pal = rng.integers(0, 256, (16, 3)).astype(np.uint8)
        for h in range(1, 18):
            img = rng.integers(0, 16, (h, 9)).astype(np.uint8)
            blob = encode_gif(img, pal, interlace=True)
            meta, frames, _ = decode_gif(blob)
            assert np.array_equal(frames[0], img), h
            # and the wire really is interlaced: progressive decode of
            # the raw stream differs from scanline order for h >= 3
            if h >= 3:
                from metricproxy_spark.operators.gif import (
                    _interlace_order,
                )

                assert not np.array_equal(
                    _interlace_order(h), np.arange(h)
                )
