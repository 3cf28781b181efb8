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


class TestG711Properties:
    """ITU-T G.711 companding invariants — exhaustive over the full
    code/sample spaces (they're tiny), plus the WAV container path."""

    def test_mulaw_exhaustive_idempotent(self):
        from metricproxy_spark.operators.g711 import mulaw_decode, mulaw_encode

        codes = np.arange(256, dtype=np.uint8)
        v = mulaw_decode(codes)
        assert int(v.min()) == -32124 and int(v.max()) == 32124
        assert np.array_equal(mulaw_decode(mulaw_encode(v)), v)

    def test_alaw_exhaustive_idempotent(self):
        from metricproxy_spark.operators.g711 import alaw_decode, alaw_encode

        codes = np.arange(256, dtype=np.uint8)
        v = alaw_decode(codes)
        assert int(v.min()) == -32256 and int(v.max()) == 32256
        assert np.array_equal(alaw_decode(alaw_encode(v)), v)

    def test_full_range_error_bound_and_monotone(self):
        from metricproxy_spark.operators import g711

        x = np.arange(-32767, 32768, dtype=np.int32)
        for enc, dec in (
            (g711.mulaw_encode, g711.mulaw_decode),
            (g711.alaw_encode, g711.alaw_decode),
        ):
            y = dec(enc(x)).astype(np.int64)
            err = np.abs(y - x)
            # segmented quantizer: ~6% relative past the small-signal floor
            assert (err <= np.maximum(np.abs(x), 1) / 16 + 40).all()
            xm = np.arange(0, 32768)
            dm = dec(enc(xm)).astype(np.int64)
            assert (np.diff(dm) >= 0).all()

    @settings(max_examples=25, deadline=None)
    @given(st.integers(0, 2**31 - 1), st.sampled_from(["mulaw", "alaw"]))
    def test_wav_container_roundtrip(self, seed, codec):
        from metricproxy_spark.operators import g711
        from metricproxy_spark.operators.multimodal import decode_wav, encode_wav

        dec = g711.mulaw_decode if codec == "mulaw" else g711.alaw_decode
        rng = np.random.default_rng(seed)
        sig = dec(rng.integers(0, 256, rng.integers(1, 400), dtype=np.uint8))
        meta, s = decode_wav(encode_wav(sig, sample_rate=8000, codec=codec))
        assert np.array_equal(s, sig)
        assert meta["format"] == f"wav/{codec}"
        assert meta["duration_ms"] == len(sig) * 1000 // 8000


class TestForeignBytesContract:
    """Round 8: EVERY media decoder raises a clean ValueError (or
    NotImplementedError for out-of-subset features) on EVERY truncated
    prefix of a valid stream — never IndexError/struct.error/zlib.error
    — so tolerant count-and-drop pipelines can catch narrowly."""

    def _scan(self, enc, dec):
        for cut in range(len(enc)):
            try:
                dec(enc[:cut])
            except (ValueError, NotImplementedError):
                pass
            # any other exception propagates and fails the test

    def test_gif_every_prefix(self):
        import numpy as np

        from metricproxy_spark.operators.gif import decode_gif, encode_gif

        px = (np.arange(192).reshape(12, 16) % 64).astype(np.uint8)
        pal = [(i, i, i) for i in range(256)]
        self._scan(encode_gif([px, px + 1], pal, delays_cs=[10, 10]), decode_gif)

    def test_bmp_every_prefix(self):
        import numpy as np

        from metricproxy_spark.operators.multimodal import decode_bmp, encode_bmp

        px = (np.arange(192).reshape(12, 16) % 64).astype(np.uint8)
        self._scan(encode_bmp(np.stack([px] * 3, axis=2)), decode_bmp)

    def test_avi_every_prefix(self):
        import numpy as np

        from metricproxy_spark.operators.multimodal import (
            decode_avi_mjpeg,
            encode_avi_mjpeg,
        )

        frames = [
            ((np.arange(256).reshape(16, 16) % 50) + k).astype(np.uint8)
            for k in range(3)
        ]
        self._scan(encode_avi_mjpeg(frames, fps=5), decode_avi_mjpeg)

    def test_jpeg_every_prefix_all_modes(self):
        import numpy as np

        from metricproxy_spark.operators.jpeg import (
            decode_jpeg,
            encode_jpeg,
            encode_jpeg_progressive,
        )

        px = np.zeros((16, 16), np.uint8)
        for by in range(2):
            for bx in range(2):
                px[8 * by : 8 * by + 8, 8 * bx : 8 * bx + 8] = bx + 2 * by + 40
        for enc in (
            encode_jpeg(px),
            encode_jpeg(px, restart_interval=2),
            encode_jpeg_progressive(px),
        ):
            self._scan(enc, decode_jpeg)

    def test_png_every_prefix_8_and_16_bit(self):
        import numpy as np

        from metricproxy_spark.operators.multimodal import decode_png, encode_png

        for px in (
            (np.arange(64).reshape(8, 8) * 7 + 300).astype(np.uint16),
            (np.arange(64).reshape(8, 8)).astype(np.uint8),
        ):
            self._scan(encode_png(px), decode_png)


class TestZstdEncoderProperties:
    """The entropy-coded zstd encoder holds its contract over
    generated inputs: self-roundtrip AND libzstd-decodes, any
    alphabet, any size class."""

    @settings(max_examples=50, deadline=None)
    @given(
        st.binary(min_size=0, max_size=4096),
    )
    def test_roundtrip_arbitrary_bytes(self, payload):
        import pyarrow as pa

        from metricproxy_spark.sources.zstd import (
            compress_zstd,
            decompress_zstd,
        )

        enc = compress_zstd(payload)
        assert decompress_zstd(enc, max_out=len(payload) + 64) == payload
        dec = pa.Codec("zstd").decompress(enc, len(payload))
        dec = dec.to_pybytes() if hasattr(dec, "to_pybytes") else bytes(dec)
        assert dec == payload

    @settings(max_examples=25, deadline=None)
    @given(
        st.integers(2, 40),  # alphabet width
        st.integers(1, 3000),  # length
        st.integers(0, 2**31 - 1),  # seed
    )
    def test_roundtrip_skewed_text_like(self, alpha, n, seed):
        import pyarrow as pa

        from metricproxy_spark.sources.zstd import (
            compress_zstd,
            decompress_zstd,
        )

        rng = np.random.default_rng(seed)
        # zipf-ish skew exercises many distinct huffman weights (the
        # FSE-compressed tree-description form)
        z = np.minimum(rng.zipf(1.3, size=n), alpha) - 1
        payload = bytes((z + 97).astype(np.uint8).tolist())
        enc = compress_zstd(payload)
        assert decompress_zstd(enc, max_out=len(payload) + 64) == payload
        dec = pa.Codec("zstd").decompress(enc, len(payload))
        dec = dec.to_pybytes() if hasattr(dec, "to_pybytes") else bytes(dec)
        assert dec == payload

    @settings(max_examples=30, deadline=None)
    @given(st.binary(min_size=1, max_size=512))
    def test_corrupt_byte_never_silently_wrong(self, payload):
        """Flipping any byte of a checksummed entropy frame either
        raises or (for frame-header fcs paths) never returns wrong
        bytes silently — mirror of the decoder's r12 byte-flip scan."""
        from metricproxy_spark.sources.zstd import (
            compress_zstd,
            decompress_zstd,
        )

        enc = bytearray(compress_zstd(payload))
        pos = len(enc) // 2
        enc[pos] ^= 0x5A
        try:
            out = decompress_zstd(bytes(enc), max_out=len(payload) + 64)
        except ValueError:
            return
        assert out == payload  # undetected flip must be a no-op flip


class TestDeltaEncodingProperties:
    """DELTA_BINARY_PACKED / DELTA_BYTE_ARRAY via pyarrow-written
    files over generated data."""

    @settings(max_examples=20, deadline=None)
    @given(
        st.lists(
            st.integers(-(2**63), 2**63 - 1), min_size=1, max_size=700
        )
    )
    def test_dbp_int64_any_values(self, tmp_path_factory, vals):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from metricproxy_spark.sources.parquet_pages import decode_columns

        p = str(tmp_path_factory.mktemp("dbp") / "x.parquet")
        pq.write_table(
            pa.table({"x": pa.array(vals, pa.int64())}),
            p,
            data_page_version="2.0",
            use_dictionary=False,
            column_encoding={"x": "DELTA_BINARY_PACKED"},
        )
        assert decode_columns(p, ["x"], 0)["x"] == vals

    @settings(max_examples=20, deadline=None)
    @given(
        st.lists(
            st.one_of(st.none(), st.text(max_size=40)),
            min_size=1,
            max_size=400,
        )
    )
    def test_dba_strings_with_nulls(self, tmp_path_factory, vals):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from metricproxy_spark.sources.parquet_pages import decode_columns

        p = str(tmp_path_factory.mktemp("dba") / "x.parquet")
        pq.write_table(
            pa.table({"s": pa.array(vals, pa.string())}),
            p,
            data_page_version="2.0",
            use_dictionary=False,
            column_encoding={"s": "DELTA_BYTE_ARRAY"},
        )
        got = decode_columns(p, ["s"], 0)["s"]
        assert [
            g if g is None else g.decode("utf-8") for g in got
        ] == vals
