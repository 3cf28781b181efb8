"""Baseline JPEG codec: exactness regime, error bounds, profile
errors, stream-declared table handling."""

from __future__ import annotations

import numpy as np
import pytest

from metricproxy_spark.operators.jpeg import decode_jpeg, encode_jpeg


class TestExactRegime:
    def test_flat_gray_bit_exact(self):
        px = np.full((16, 24), 77, np.uint8)
        meta, back = decode_jpeg(encode_jpeg(px))
        assert (meta["width"], meta["height"]) == (24, 16)
        assert (back == px).all()

    def test_piecewise_flat_blocks_bit_exact(self):
        v = np.zeros((24, 32), np.uint8)
        for by in range(3):
            for bx in range(4):
                v[8 * by : 8 * by + 8, 8 * bx : 8 * bx + 8] = (
                    bx + 2 * by + 50
                )
        _, back = decode_jpeg(encode_jpeg(v))
        assert (back == v).all()

    def test_non_multiple_of_8_dims_pad_and_crop(self):
        px = np.full((13, 19), 90, np.uint8)
        meta, back = decode_jpeg(encode_jpeg(px))
        assert back.shape == (13, 19)
        assert (back == px).all()


class TestErrorBounds:
    def test_random_gray_unit_quant_within_one(self):
        rng = np.random.default_rng(5)
        px = rng.integers(0, 256, (24, 17), np.uint8)
        _, back = decode_jpeg(encode_jpeg(px))
        assert np.abs(back.astype(int) - px.astype(int)).max() <= 1

    def test_rgb_444_unit_quant_small_error(self):
        rng = np.random.default_rng(6)
        px = rng.integers(0, 256, (15, 21, 3), np.uint8)
        _, back = decode_jpeg(encode_jpeg(px))
        assert back.shape == px.shape
        assert np.abs(back.astype(int) - px.astype(int)).max() <= 3

    def test_rgb_420_smooth_content(self):
        xs = np.linspace(0, 200, 32)[None, :]
        ys = np.linspace(0, 55, 20)[:, None]
        smooth = np.stack(
            [xs + ys, np.flip(xs + ys, 1), 0 * xs + ys + 100], axis=2
        ).astype(np.uint8)
        meta, back = decode_jpeg(encode_jpeg(smooth, subsampling="420"))
        assert back.shape == smooth.shape
        assert np.abs(back.astype(int) - smooth.astype(int)).max() <= 24

    def test_real_quant_table_compresses_and_bounds_error(self):
        rng = np.random.default_rng(7)
        px = rng.integers(0, 256, (32, 32), np.uint8)
        q = np.full((8, 8), 16, np.uint16)
        blob_q, blob_1 = encode_jpeg(px, quant_luma=q), encode_jpeg(px)
        assert len(blob_q) < len(blob_1)
        _, back = decode_jpeg(blob_q)
        # quantization error bounded by ~q/2 per coefficient spread
        # across the block; 3q is a generous per-pixel bound
        assert np.abs(back.astype(int) - px.astype(int)).max() <= 3 * 16


class TestProfileErrors:
    def test_not_a_jpeg(self):
        with pytest.raises(ValueError):
            decode_jpeg(b"\x89PNG")

    def test_baseline_scan_header_invalid_for_progressive(self):
        # rewriting SOF0 → SOF2 leaves a baseline scan header
        # (Ss=0, Se=63) that is illegal in progressive mode — the
        # decoder must reject it rather than desync
        blob = bytearray(encode_jpeg(np.zeros((8, 8), np.uint8)))
        i = bytes(blob).find(b"\xff\xc0")
        blob[i + 1] = 0xC2
        with pytest.raises(ValueError):
            decode_jpeg(bytes(blob))

    def test_foreign_dri_with_no_rst_decodes(self):
        # a foreign stream may declare DRI but fit inside one interval
        # (no RST markers ever emitted) — must decode, not raise
        blob = encode_jpeg(np.full((8, 8), 55, np.uint8))
        i = blob.find(b"\xff\xda")
        dri = b"\xff\xdd\x00\x04\x00\x08"
        _, px = decode_jpeg(blob[:i] + dri + blob[i:])
        assert (px == 55).all()


class TestRestartIntervals:
    """DRI/RSTn (T.81 §B.2.4.4, §E.1.4): encoder splits the entropy
    stream every N MCUs with byte-aligned RST markers + DC-predictor
    reset; decoder resyncs and verifies the D0–D7 cycle."""

    def test_flat_regime_bit_exact_across_intervals(self):
        for wb, hb in [(4, 3), (1, 1), (5, 2)]:
            px = np.zeros((8 * hb, 8 * wb), np.uint8)
            for by in range(hb):
                for bx in range(wb):
                    px[8 * by : 8 * by + 8, 8 * bx : 8 * bx + 8] = (
                        10 * bx + 20 * by + 30
                    )
            for ri in (0, 1, 2, 3, 7, 100):
                blob = encode_jpeg(px, restart_interval=ri)
                _, back = decode_jpeg(blob)
                assert np.array_equal(back, px), (wb, hb, ri)
                if ri and wb * hb > ri:
                    assert b"\xff\xdd" in blob and b"\xff\xd0" in blob

    def test_restarts_do_not_change_decoded_pixels(self):
        rng = np.random.default_rng(3)
        px = rng.integers(0, 256, (24, 40, 3), dtype=np.uint8)
        for sub in ("444", "420"):
            base = decode_jpeg(encode_jpeg(px, subsampling=sub))[1]
            for ri in (1, 2, 5):
                seg = decode_jpeg(
                    encode_jpeg(px, subsampling=sub, restart_interval=ri)
                )[1]
                assert np.array_equal(base, seg), (sub, ri)

    def test_rst_index_cycles_past_d7(self):
        px = np.full((8, 8 * 20), 77, np.uint8)  # 20 MCUs, 19 restarts
        blob = encode_jpeg(px, restart_interval=1)
        assert blob.count(b"\xff\xd0") >= 2  # D0 again after D7
        assert np.array_equal(decode_jpeg(blob)[1], px)

    def test_out_of_sequence_rst_raises(self):
        px = np.full((8, 8 * 20), 77, np.uint8)
        blob = encode_jpeg(px, restart_interval=1)
        i = blob.index(b"\xff\xd3")
        with pytest.raises(ValueError):
            decode_jpeg(blob[:i] + b"\xff\xd5" + blob[i + 2 :])


class TestStreamTables:
    def test_decoder_uses_tables_from_the_stream(self):
        # 16-bit (Pq=1) quant table parse path: hand-build a DQT with
        # Pq=1 and verify the stream still decodes identically
        import struct

        px = np.full((8, 8), 44, np.uint8)
        blob = encode_jpeg(px)
        i = blob.find(b"\xff\xdb")
        (seglen,) = struct.unpack_from(">H", blob, i + 2)
        body = blob[i + 4 : i + 2 + seglen]
        vals = body[1:65]
        body16 = bytes([0x10]) + b"".join(
            struct.pack(">H", v) for v in vals
        )
        dqt16 = b"\xff\xdb" + struct.pack(">H", len(body16) + 2) + body16
        patched = blob[:i] + dqt16 + blob[i + 2 + seglen :]
        _, back = decode_jpeg(patched)
        assert (back == px).all()

    def test_unknown_app_segments_skipped(self):
        px = np.full((8, 8), 10, np.uint8)
        blob = encode_jpeg(px)
        i = blob.find(b"\xff\xdb")
        com = b"\xff\xfe\x00\x07hello"
        _, back = decode_jpeg(blob[:i] + com + blob[i:])
        assert (back == px).all()


class TestAviMjpeg:
    def test_roundtrip_piecewise_flat_exact(self):
        from metricproxy_spark.operators.multimodal import (
            decode_avi_mjpeg,
            encode_avi_mjpeg,
        )

        frames = []
        for f in range(5):
            v = np.zeros((16, 24), np.uint8)
            for by in range(2):
                for bx in range(3):
                    v[8 * by : 8 * by + 8, 8 * bx : 8 * bx + 8] = (
                        bx + 2 * by + 40 + f
                    )
            frames.append(v)
        meta, out = decode_avi_mjpeg(encode_avi_mjpeg(frames, fps=10))
        assert meta == {
            "media_type": "video",
            "format": "avi/mjpeg",
            "width": 24,
            "height": 16,
            "duration_ms": 500,
        }
        assert len(out) == 5
        for a, b in zip(frames, out):
            assert (a == b).all()

    def test_rgb_frames_lossy_bound(self):
        from metricproxy_spark.operators.multimodal import (
            decode_avi_mjpeg,
            encode_avi_mjpeg,
        )

        rng = np.random.default_rng(11)
        frames = [
            rng.integers(0, 256, (8, 16, 3), np.uint8) for _ in range(3)
        ]
        _, out = decode_avi_mjpeg(encode_avi_mjpeg(frames))
        for a, b in zip(frames, out):
            assert np.abs(a.astype(int) - b.astype(int)).max() <= 3

    def test_non_mjpeg_codec_raises(self):
        from metricproxy_spark.operators.multimodal import (
            decode_avi_mjpeg,
            encode_avi_mjpeg,
        )

        blob = bytearray(
            encode_avi_mjpeg([np.zeros((8, 8), np.uint8)])
        )
        i = bytes(blob).find(b"MJPG")  # strh fccHandler
        blob[i : i + 4] = b"H264"
        with pytest.raises(NotImplementedError):
            decode_avi_mjpeg(bytes(blob))

    def test_decode_media_dispatches_avi_not_wav(self):
        from metricproxy_spark.operators.multimodal import (
            decode_media,
            encode_avi_mjpeg,
            encode_wav,
        )

        m1, _ = decode_media(encode_avi_mjpeg([np.zeros((8, 8), np.uint8)]))
        assert m1["media_type"] == "video"
        m2, _ = decode_media(encode_wav(np.zeros(100, np.int16)))
        assert m2["media_type"] == "audio"


class TestProgressive:
    """SOF2 progressive (T.81 Annex G). The load-bearing invariant:
    progressive and baseline encode the SAME quantized coefficients,
    so their decoded pixels must be bit-identical — any defect in the
    spectral-selection / successive-approximation scan machinery
    (EOBRUN, correction bits, DC bit planes) breaks the equality."""

    def test_progressive_equals_baseline_gray_and_color(self):
        from metricproxy_spark.operators.jpeg import encode_jpeg_progressive

        rng = np.random.default_rng(5)
        for shape in [(8, 8), (16, 24), (13, 19), (24, 40, 3), (17, 9, 3)]:
            px = rng.integers(0, 256, shape).astype(np.uint8)
            for q in (None, np.arange(64).reshape(8, 8) % 16 + 1):
                base = decode_jpeg(encode_jpeg(px, quant_luma=q))[1]
                prog = decode_jpeg(
                    encode_jpeg_progressive(px, quant_luma=q)
                )[1]
                assert np.array_equal(base, prog), (shape, q is not None)

    def test_progressive_equals_baseline_420(self):
        from metricproxy_spark.operators.jpeg import encode_jpeg_progressive

        rng = np.random.default_rng(9)
        px = rng.integers(0, 256, (24, 40, 3)).astype(np.uint8)
        base = decode_jpeg(encode_jpeg(px, subsampling="420"))[1]
        prog = decode_jpeg(encode_jpeg_progressive(px, subsampling="420"))[1]
        assert np.array_equal(base, prog)

    def test_flat_regime_stays_bit_exact(self):
        from metricproxy_spark.operators.jpeg import encode_jpeg_progressive

        px = np.zeros((24, 32), np.uint8)
        for by in range(3):
            for bx in range(4):
                px[8 * by : 8 * by + 8, 8 * bx : 8 * bx + 8] = (
                    10 * bx + 20 * by + 30
                )
        assert np.array_equal(decode_jpeg(encode_jpeg_progressive(px))[1], px)

    def test_wire_really_is_progressive(self):
        from metricproxy_spark.operators.jpeg import encode_jpeg_progressive

        blob = encode_jpeg_progressive(np.full((16, 16), 200, np.uint8))
        assert b"\xff\xc2" in blob and b"\xff\xc0" not in blob
        # gray: 4 scans (DC first, AC first, DC refine, AC refine)
        assert blob.count(b"\xff\xda") == 4

    def test_decode_media_dispatches_progressive(self):
        from metricproxy_spark.operators.jpeg import encode_jpeg_progressive
        from metricproxy_spark.operators.multimodal import decode_media

        px = np.full((8, 8), 42, np.uint8)
        meta, back = decode_media(encode_jpeg_progressive(px))
        assert meta["format"] == "jpeg" and np.array_equal(back, px)
