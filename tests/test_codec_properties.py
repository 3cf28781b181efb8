"""Property-based codec tests (hypothesis): PNG/JPEG/Avro hold their
contracts over generated inputs, not just the fixed-seed cases."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from metricproxy_spark.operators.jpeg import decode_jpeg, encode_jpeg
from metricproxy_spark.operators.multimodal import decode_png, encode_png
from metricproxy_spark.sources.avro import _dec_long, _enc_long


@st.composite
def _gray_images(draw):
    h = draw(st.integers(1, 24))
    w = draw(st.integers(1, 24))
    seed = draw(st.integers(0, 2**31 - 1))
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, (h, w), dtype=np.uint8)


class TestPngProperties:
    @settings(max_examples=40, deadline=None)
    @given(_gray_images(), st.integers(0, 4))
    def test_roundtrip_any_shape_any_filter(self, px, filt):
        filters = [filt] * px.shape[0]
        meta, back = decode_png(encode_png(px, row_filters=filters))
        assert back.shape == px.shape
        assert (back == px).all()

    @settings(max_examples=25, deadline=None)
    @given(_gray_images(), st.lists(st.integers(0, 4), min_size=24, max_size=24))
    def test_roundtrip_mixed_filters(self, px, filters):
        filters = filters[: px.shape[0]]
        meta, back = decode_png(encode_png(px, row_filters=filters))
        assert (back == px).all()


class TestJpegProperties:
    @settings(max_examples=30, deadline=None)
    @given(_gray_images())
    def test_unit_quant_error_bounded(self, px):
        _, back = decode_jpeg(encode_jpeg(px))
        assert back.shape == px.shape
        assert np.abs(back.astype(int) - px.astype(int)).max() <= 1

    @settings(max_examples=20, deadline=None)
    @given(st.integers(0, 255), st.integers(1, 40), st.integers(1, 40))
    def test_flat_always_bit_exact(self, v, h, w):
        px = np.full((h, w), v, np.uint8)
        _, back = decode_jpeg(encode_jpeg(px))
        assert (back == px).all()


class TestAvroVarint:
    @settings(max_examples=200, deadline=None)
    @given(st.integers(-(2**63), 2**63 - 1))
    def test_zigzag_roundtrip_full_i64_range(self, n):
        buf = _enc_long(n)
        got, pos = _dec_long(buf, 0)
        assert got == n and pos == len(buf)

    @settings(max_examples=100, deadline=None)
    @given(st.lists(st.integers(-(2**40), 2**40), max_size=20))
    def test_concatenated_varints_parse_in_sequence(self, ns):
        buf = b"".join(_enc_long(n) for n in ns)
        pos = 0
        out = []
        for _ in ns:
            v, pos = _dec_long(buf, pos)
            out.append(v)
        assert out == ns and pos == len(buf)
