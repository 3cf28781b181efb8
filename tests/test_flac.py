"""FLAC codec (operators/flac.py, RFC 9639 subset): encoder roundtrips
bit-exactly, and the decoder handles the wire features our encoder
never emits — stereo decorrelation, Rice2, partitions, escape codes,
wasted bits — proven on hand-built spec-conformant frames."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from metricproxy_spark.operators import flac as FL


def _build_stream(frame_bytes: bytes, n: int, nch: int, bps: int = 16, rate: int = 8000) -> bytes:
    info = FL._BitWriter()
    info.write(n, 16)
    info.write(n, 16)
    info.write(0, 24)
    info.write(0, 24)
    info.write(rate, 20)
    info.write(nch - 1, 3)
    info.write(bps - 1, 5)
    info.write(n, 36)
    body = info.bytes() + b"\0" * 16  # zero MD5 = unverified
    return bytes(
        bytearray(b"fLaC") + bytes([0x80, 0, 0, len(body) & 0xFF]) + body
    ) + frame_bytes


def _frame_header(nsamp: int, ch_code: int, fi: int = 0) -> bytes:
    h = FL._BitWriter()
    h.write(FL._SYNC, 14)
    h.write(0, 1)
    h.write(0, 1)
    h.write(7, 4)
    h.write(0, 4)
    h.write(ch_code, 4)
    h.write(4, 3)
    h.write(0, 1)
    head = h.bytes() + FL._utf8_code(fi) + struct.pack(">H", nsamp - 1)
    return head + bytes([FL._crc8(head)])


def _sub_verbatim(w: FL._BitWriter, x, bits: int) -> None:
    w.write(0, 1)
    w.write(1, 6)
    w.write(0, 1)
    for v in x:
        w.write(int(v) & ((1 << bits) - 1), bits)


def _finish(w: FL._BitWriter) -> bytes:
    w.align()
    fr = w.bytes()
    return fr + struct.pack(">H", FL._crc16(fr))


class TestFlacRoundtrip:
    @pytest.mark.parametrize("n", [1, 5, 100, 4096, 5000, 9000])
    def test_mono_ramp_wiggle(self, n):
        sig = (
            3 * np.arange(n) % 20011 - 10000 + (np.arange(n) * 7 % 7) - 3
        ).astype(np.int16)
        meta, s = FL.decode_flac(FL.encode_flac(sig, 8000))
        assert np.array_equal(s, sig)
        assert meta["format"] == "flac"
        assert meta["duration_ms"] == n * 1000 // 8000

    def test_constant_noise_stereo(self):
        rng = np.random.default_rng(3)
        sig = np.full(500, -123, np.int16)
        assert np.array_equal(FL.decode_flac(FL.encode_flac(sig))[1], sig)
        noise = rng.integers(-32768, 32768, 3000).astype(np.int16)
        assert np.array_equal(FL.decode_flac(FL.encode_flac(noise))[1], noise)
        st = np.stack(
            [np.arange(1000) % 100 - 50, (np.arange(1000) * 3) % 77], axis=1
        ).astype(np.int16)
        meta, s = FL.decode_flac(FL.encode_flac(st, 44100))
        assert s.shape == (1000, 2) and np.array_equal(s, st)

    def test_smooth_signal_compresses(self):
        t = np.arange(8000)
        smooth = (1000 * np.sin(t / 50)).astype(np.int16)
        f = FL.encode_flac(smooth)
        assert len(f) < 2 * len(smooth) * 0.6  # fixed+rice must earn keep

    def test_md5_verified(self):
        sig = (np.arange(600) % 97 - 48).astype(np.int16)
        f = bytearray(FL.encode_flac(sig))
        # STREAMINFO MD5 lives in the first metadata block; flip a byte
        f[30] ^= 0xFF
        with pytest.raises(ValueError, match="MD5"):
            FL.decode_flac(bytes(f))


class TestFlacForeignFrames:
    """Wire features the subset encoder never emits, decoded from
    hand-built spec frames."""

    def test_stereo_decorrelation_modes(self):
        L = np.arange(50) * 3 - 60
        R = (np.arange(50) * 5) % 41 - 20
        side = L - R
        mid = (L + R) >> 1
        for code, subs in {
            8: [(L, 16), (side, 17)],
            9: [(side, 17), (R, 16)],
            10: [(mid, 16), (side, 17)],
        }.items():
            w = FL._BitWriter()
            for b in _frame_header(50, code):
                w.write(b, 8)
            for x, bits in subs:
                _sub_verbatim(w, x, bits)
            stream = _build_stream(_finish(w), 50, 2)
            _meta, s = FL.decode_flac(stream)
            assert np.array_equal(s[:, 0], L) and np.array_equal(s[:, 1], R), code

    def test_order3_partitions_rice2_escape_wasted(self):
        n = 64
        x2 = ((np.arange(n) ** 2) % 97 - 48) * 4  # *4 -> 2 wasted bits
        xs = x2 >> 2
        order = 3
        res = FL._fixed_residual(xs, order)
        w = FL._BitWriter()
        for b in _frame_header(n, 0):
            w.write(b, 8)
        w.write(0, 1)
        w.write(8 + order, 6)
        w.write(1, 1)  # wasted-bits flag
        w.write(1, 2)  # unary(count-1 = 1) = "01"
        bits = 16 - 2
        for v in xs[:order]:
            w.write(int(v) & ((1 << bits) - 1), bits)
        w.write(1, 2)  # method: rice2
        w.write(2, 4)  # partition order 2 -> 4 partitions
        per = n >> 2
        ri = 0
        for p in range(4):
            cnt = per - (order if p == 0 else 0)
            chunk = res[ri : ri + cnt]
            ri += cnt
            if p == 1:  # escape partition, raw 9-bit residuals
                w.write(31, 5)
                w.write(9, 5)
                for v in chunk:
                    w.write(int(v) & 0x1FF, 9)
            else:
                k = 3
                w.write(k, 5)
                u = FL._zigzag(chunk)
                for q, rem in zip((u >> k).tolist(), (u & ((1 << k) - 1)).tolist()):
                    w.write_unary(q)
                    w.write(rem, k)
        assert ri == len(res)
        stream = _build_stream(_finish(w), n, 1)
        _meta, s = FL.decode_flac(stream)
        assert np.array_equal(s, x2)

    def test_crc16_corruption_caught(self):
        sig = (np.arange(200) % 50).astype(np.int16)
        bad = bytearray(FL.encode_flac(sig))
        bad[-1] ^= 0xFF
        with pytest.raises(ValueError, match="CRC-16"):
            FL.decode_flac(bytes(bad))

    def test_lpc_order_gt8_raises_honestly(self):
        # orders 1-8 decode since round 8; the honest raise narrows to >8
        w = FL._BitWriter()
        for b in _frame_header(16, 0):
            w.write(b, 8)
        w.write(0, 1)
        w.write(32 + 8, 6)  # LPC order 9
        w.write(0, 1)
        stream = _build_stream(_finish(w), 16, 1)
        with pytest.raises(NotImplementedError, match="order > 8"):
            FL.decode_flac(stream)


_LPC_PALETTE = [
    ((1,), 0),
    ((2, -1), 0),
    ((58, -27), 5),
    ((104, -61, 22, -5), 6),
    ((31, -12, 7, -3, 1, 2, -1, 1), 5),
]


class TestFlacLpc:
    """§9.2.5 LPC subframes: encode_flac_lpc emits them with chosen
    quantized coefficients; decode reconstructs bit-exactly (lossless
    holds under ANY integer predictor)."""

    @pytest.mark.parametrize("coefs,shift", _LPC_PALETTE)
    def test_lpc_roundtrip_exact(self, coefs, shift):
        rng = np.random.default_rng(7)
        for sig in (
            (np.arange(1000) % 97).astype(np.int16),
            (1000 * np.sin(np.arange(3000) / 10)).astype(np.int16),
            rng.integers(-32768, 32767, 500).astype(np.int16),
            np.zeros(10, np.int16),
        ):
            _meta, out = FL.decode_flac(
                FL.encode_flac_lpc(sig, coefs, shift, block_size=256)
            )
            flat = out if out.ndim == 1 else out[:, 0]
            assert (flat == sig).all()

    def test_lpc_stereo(self):
        st = np.stack(
            [(np.arange(800) % 50), (np.arange(800) % 31)], axis=1
        ).astype(np.int16)
        _meta, out = FL.decode_flac(
            FL.encode_flac_lpc(st, (58, -27), 5, block_size=300)
        )
        assert (out == st).all()

    def test_lpc_encoder_order_guard(self):
        with pytest.raises(ValueError, match="1..8"):
            FL.encode_flac_lpc(np.zeros(32, np.int16), tuple(range(1, 10)), 0)

    def test_negative_shift_rejected(self):
        # hand-built frame whose qlp shift field is -1 (two's
        # complement 0b11111): decoder must reject, not mis-predict
        w = FL._BitWriter()
        for b in _frame_header(16, 0):
            w.write(b, 8)
        w.write(0, 1)
        w.write(32, 6)  # LPC order 1
        w.write(0, 1)
        w.write(5, 16)  # warmup sample
        w.write(11, 4)  # precision 12
        w.write(0b11111, 5)  # shift = -1
        stream = _build_stream(_finish(w), 16, 1)
        with pytest.raises(ValueError, match="negative qlp shift"):
            FL.decode_flac(stream)

    def test_invalid_precision_rejected(self):
        w = FL._BitWriter()
        for b in _frame_header(16, 0):
            w.write(b, 8)
        w.write(0, 1)
        w.write(32, 6)  # LPC order 1
        w.write(0, 1)
        w.write(5, 16)  # warmup sample
        w.write(0b1111, 4)  # invalid precision code (§9.2.5)
        stream = _build_stream(_finish(w), 16, 1)
        with pytest.raises(ValueError, match="qlp precision"):
            FL.decode_flac(stream)

    def test_lpc_truncations_raise_valueerror_only(self):
        sig = (np.arange(300) % 50).astype(np.int16)
        enc = FL.encode_flac_lpc(sig, (104, -61, 22, -5), 6, block_size=128)
        for cut in range(0, len(enc)):
            try:
                FL.decode_flac(enc[:cut])
            except (ValueError, NotImplementedError):
                pass

    def test_utf8_coded_numbers(self):
        r = lambda b: FL._BitReader(b)
        for n in (0, 0x7F, 0x80, 0x7FF, 0x800, 0xFFFF, 0x1FFFFF, 2**35):
            assert FL._utf8_decode(r(FL._utf8_code(n))) == n


class TestFlacWavForeignBytes:
    def test_truncations_raise_valueerror_only(self):
        """Every prefix of a valid stream must fail with a clean
        ValueError (or decode, for whole-frame prefixes) — never leak
        IndexError/struct.error into tolerant count-and-drop paths."""
        from metricproxy_spark.operators.multimodal import decode_wav, encode_wav

        sig = (np.arange(300) % 50).astype(np.int16)
        for enc, dec in (
            (FL.encode_flac(sig), FL.decode_flac),
            (encode_wav(sig), decode_wav),
        ):
            # step 1, not 3: r7 ADVICE found the 3-step grid skipped
            # offsets 4-5 where decode_flac(b"fLaC") leaked IndexError
            for cut in range(0, len(enc)):
                try:
                    dec(enc[:cut])
                except (ValueError, NotImplementedError):
                    pass
