"""G.711 companded telephony audio — µ-law (PCMU) and A-law (PCMA).

Implements the two ITU-T G.711 companding codecs from the public spec
(ITU-T Recommendation G.711, tables 1a/1b and 2a/2b) as vectorized
numpy transforms, at the conventional 16-bit linear PCM scale
(µ-law peak ±32124 = 8031·4, A-law peak ±32256 = 4032·8 — the same
scale `audioop`/libg711 use), so decoded samples drop straight into
the PCM-16 pipeline (`decode_wav` / `resample_linear`).

Why it matters at 100 TB: telephony / call-center corpora ship as
8 kHz G.711 WAV (WAVE_FORMAT_MULAW=7 / WAVE_FORMAT_ALAW=6); a
training-data pipeline must expand them to linear PCM before feature
extraction. Both transforms are branch-free numpy over the whole
sample array — map-only inside Arrow batches, no Python per sample.

Exactness lever for the driver oracle: both DECODE transforms are
pure integer arithmetic with closed forms expressible in ANSI SQL
(see `multimodal_decode_g711`), and both codecs are IDEMPOTENT —
``decode(encode(decode(c))) == decode(c)`` for all 256 codes (pytest
asserts this exhaustively) — so a signal synthesized as decoded code
values survives the full encode → WAV container → parse → decode
chain bit-exactly.

Parity loci: [P: spec ITU-T G.711 §4 companding tables]; SURVEY §3
row L5 (multimodal decode family).
"""

from __future__ import annotations

import numpy as np

# µ-law constants (G.711 table 2a): bias 0x84 = 132, clip 8031
_MU_BIAS = 0x84
_MU_CLIP = 8031


def mulaw_decode(codes) -> np.ndarray:
    """µ-law bytes → int16 linear PCM (±32124 peak).

    Closed form per code c (after the spec's ones-complement):
    ``mag = (mant·8 + 132)·2^exp − 132`` — pure integer arithmetic,
    mirrored verbatim in the driver oracle SQL.
    """
    c = ~np.asarray(codes, np.uint8) & 0xFF
    sign = (c & 0x80) != 0
    exp = (c >> 4) & 7
    mant = (c & 0xF).astype(np.int32)
    mag = ((mant * 8 + _MU_BIAS) << exp) - _MU_BIAS
    return np.where(sign, -mag, mag).astype(np.int16)


def mulaw_encode(samples) -> np.ndarray:
    """int16 linear PCM → µ-law bytes (G.711 segmented quantizer).

    16-bit-domain form: ``mag = min(|x|, 32635) + 132`` then the
    segment is the position of mag's top bit above bit 7 (frexp keeps
    the log integer-exact — no float-boundary risk at powers of two).
    """
    x = np.asarray(samples, np.int32)
    sign = x < 0
    mag = np.minimum(np.abs(x), 32767 - _MU_BIAS) + _MU_BIAS
    exp = np.clip(np.frexp(mag.astype(np.float64))[1] - 8, 0, 7)
    mant = (mag >> (exp + 3)) & 0xF
    code = (sign.astype(np.int32) << 7) | (exp << 4) | mant
    return (~code & 0xFF).astype(np.uint8)


def alaw_decode(codes) -> np.ndarray:
    """A-law bytes → int16 linear PCM (±32256 peak).

    Closed form per code c (after the spec's 0x55 toggle):
    segment 0 → ``mant·16 + 8``; segment e ≥ 1 →
    ``(mant·16 + 264)·2^(e−1)`` — integer arithmetic, mirrored in SQL.
    A-law sign bit SET means positive (opposite of µ-law).
    """
    c = np.asarray(codes, np.uint8) ^ 0x55
    sign = (c & 0x80) != 0
    exp = ((c >> 4) & 7).astype(np.int32)
    mant = (c & 0xF).astype(np.int32)
    mag = np.where(exp == 0, mant * 16 + 8, (mant * 16 + 0x108) << np.maximum(exp - 1, 0))
    return np.where(sign, mag, -mag).astype(np.int16)


def alaw_encode(samples) -> np.ndarray:
    """int16 linear PCM → A-law bytes (G.711 segmented quantizer)."""
    x = np.asarray(samples, np.int32)
    sign = x >= 0
    mag = np.minimum(np.abs(x), 32767) // 8
    exp = np.zeros_like(mag)
    for e in range(1, 8):
        exp = np.where(mag >= (32 << (e - 1)), e, exp)
    mant = np.where(exp == 0, mag >> 1, (mag >> exp) & 0xF)
    code = (sign.astype(np.int32) << 7) | (exp << 4) | mant
    return (code ^ 0x55).astype(np.uint8)
