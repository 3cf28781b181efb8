"""Gorilla codec (operators/gorilla.py, VLDB'15 §4.1): lossless
roundtrips across the full float64 domain, paper-regime compression
bounds, self-describing first-delta width, and the foreign-bytes
clean-ValueError contract."""

from __future__ import annotations

import numpy as np
import pytest

from metricproxy_spark.operators.gorilla import (
    compress_gorilla,
    decompress_gorilla,
)


def _assert_same(td, vd, t, v):
    assert (td == t).all()
    assert len(vd) == len(v)
    for a, b in zip(vd, v):
        if np.isnan(b):
            assert np.isnan(a)
        else:
            assert a == b and np.signbit(a) == np.signbit(b)


class TestGorillaRoundtrip:
    def test_regular_cadence_random_walk(self):
        rng = np.random.default_rng(5)
        t = np.arange(0, 3600 * 720, 3600, dtype=np.int64) + 1_700_000_000
        v = np.round(np.cumsum(rng.normal(0, 1, len(t))), 2)
        blob = compress_gorilla(t, v)
        _assert_same(*decompress_gorilla(blob), t, v)

    def test_irregular_timestamps_wild_values(self):
        rng = np.random.default_rng(6)
        t = np.unique(rng.integers(0, 10_000, 500).astype(np.int64))
        v = rng.normal(0, 1e12, len(t))
        _assert_same(*decompress_gorilla(compress_gorilla(t, v)), t, v)

    def test_special_values(self):
        t = np.arange(10, dtype=np.int64)
        v = np.array(
            [1.5] * 3 + [np.nan, np.inf, -np.inf, -0.0, 0.0, 1e-300, -1.5]
        )
        _assert_same(*decompress_gorilla(compress_gorilla(t, v)), t, v)

    def test_empty_and_single(self):
        for t, v in (
            (np.array([], np.int64), np.array([])),
            (np.array([7], np.int64), np.array([3.25])),
        ):
            _assert_same(*decompress_gorilla(compress_gorilla(t, v)), t, v)

    def test_negative_and_backward_deltas(self):
        # dod < 0 and all four bucket widths exercised
        t = np.array([0, 60, 120, 121, 400, 1000, 5000, 200000], np.int64)
        v = np.arange(8.0)
        _assert_same(*decompress_gorilla(compress_gorilla(t, v)), t, v)

    def test_first_delta_width_self_describing(self):
        t = np.array([0, 90000, 93600], np.int64)
        v = np.arange(3.0)
        with pytest.raises(ValueError, match="header range"):
            compress_gorilla(t, v)  # 14 bits cannot hold 90000
        blob = compress_gorilla(t, v, first_delta_bits=17)
        _assert_same(*decompress_gorilla(blob), t, v)


class TestGorillaCompression:
    def test_constant_regular_series_paper_regime(self):
        """dod == 0 and xor == 0 everywhere: ~2 bits/point — the
        paper's steady-state headline."""
        t = np.arange(0, 3600 * 1000, 3600, dtype=np.int64)
        v = np.full(1000, 42.0)
        blob = compress_gorilla(t, v)
        assert 8 * len(blob) / len(t) < 3.0

    def test_smooth_series_beats_raw(self):
        rng = np.random.default_rng(7)
        t = np.arange(0, 60 * 2000, 60, dtype=np.int64)
        v = np.round(np.cumsum(rng.normal(0, 0.25, len(t))), 1)
        blob = compress_gorilla(t, v)
        assert len(blob) < 16 * len(t)  # strictly below raw (t, v) pairs


class TestGorillaForeignBytes:
    def test_every_prefix_raises_cleanly(self):
        rng = np.random.default_rng(8)
        t = np.arange(0, 3600 * 50, 3600, dtype=np.int64)
        v = np.round(rng.normal(0, 5, len(t)), 2)
        blob = compress_gorilla(t, v)
        for cut in range(len(blob)):
            try:
                decompress_gorilla(blob[:cut])
            except ValueError:
                pass

    def test_not_gorilla(self):
        with pytest.raises(ValueError, match="not a gorilla"):
            decompress_gorilla(b"XXXX\x00\x00\x00\x00\x0e")

    def test_header_count_bounded_before_alloc(self):
        # n = 2^32-1 over a 9-byte payload must refuse BEFORE the
        # ~64 GB np.empty, with the contract's clean ValueError.
        import struct

        blob = b"GOR1" + struct.pack(">IB", (1 << 32) - 1, 14)
        with pytest.raises(ValueError, match="exceeds payload"):
            decompress_gorilla(blob)

    def test_dod_escape_overflow_refused(self):
        # |dod| >= 2^31 cannot ride the 32-bit escape bucket; encoding
        # must raise rather than silently truncate (round-9 ADVICE).
        t = np.array([0, 100, 100 + (1 << 35)], np.int64)
        v = np.arange(3.0)
        with pytest.raises(ValueError, match="escape range"):
            compress_gorilla(t, v)

    def test_large_but_representable_dod_roundtrips(self):
        t = np.array([0, 100, 100 + (1 << 31) + 99], np.int64)  # dod=2^31-1
        v = np.arange(3.0)
        _assert_same(*decompress_gorilla(compress_gorilla(t, v)), t, v)


class TestGorillaHypothesis:
    def test_roundtrip_arbitrary_floats_hypothesis(self):
        from hypothesis import given, settings
        from hypothesis import strategies as st

        @settings(max_examples=60, deadline=None)
        @given(
            st.lists(
                st.floats(allow_nan=True, allow_infinity=True, width=64),
                min_size=0,
                max_size=50,
            ),
            st.lists(st.integers(0, 5000), min_size=0, max_size=50),
        )
        def roundtrip(vals, deltas):
            n = min(len(vals), len(deltas))
            t = np.cumsum(np.asarray(deltas[:n], np.int64))
            v = np.asarray(vals[:n], np.float64)
            # strictly ordered but possibly zero deltas are fine;
            # first delta must fit the header width
            blob = compress_gorilla(t, v, first_delta_bits=14)
            _assert_same(*decompress_gorilla(blob), t, v)

        roundtrip()
