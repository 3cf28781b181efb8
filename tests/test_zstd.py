"""Zstandard (RFC 8878) codec tests — the repo codec discipline:
known-answer vectors for XXH64, cross-implementation interop pins
(pyarrow's bundled libzstd at multiple levels; the reference `zstd`
CLI when present), both-direction raw-frame interop, truncation
scans, corruption raises and the max_out bomb guard."""

from __future__ import annotations

import random
import shutil
import subprocess

import pytest

from metricproxy_spark.sources.zstd import (
    compress_zstd_raw,
    decompress_zstd,
    xxh64,
)


def _pa_zstd(data: bytes, level: int = 3) -> bytes:
    import pyarrow as pa

    out = pa.Codec("zstd", compression_level=level).compress(data)
    return out.to_pybytes() if hasattr(out, "to_pybytes") else bytes(out)


def _payloads() -> dict[str, bytes]:
    rng = random.Random(42)
    return {
        "empty": b"",
        "tiny": b"a",
        "hello": b"hello hello hello hello zstd world" * 10,
        "text": b"The quick brown fox jumps over the lazy dog. " * 500,
        "jsonl": b'{"doc_id": 1, "text": "training shard line"}\n' * 2000,
        "random": rng.randbytes(70000),
        "rle": b"\x00" * 100000,
        "lowentropy": b"".join(
            bytes([rng.randrange(4)]) * rng.randrange(1, 50)
            for _ in range(5000)
        ),
        "big": b"abcdefgh" * 40000
        + rng.randbytes(10000)
        + b"pattern! " * 30000,
    }


class TestXxh64:
    def test_spec_vectors(self):
        # xxhash_spec.md known answers (seed 0 and the spec's test
        # string), plus a seeded case.
        assert xxh64(b"") == 0xEF46DB3751D8E999
        assert (
            xxh64(b"Nobody inspects the spammish repetition")
            == 0xFBCEA83C8A378BF1
        )
        assert xxh64(b"", seed=1) != xxh64(b"")

    def test_all_length_classes(self):
        # <4, <8, <32, exact stripe, stripe+tail — just determinism +
        # dispersion here; correctness is pinned transitively by every
        # checksummed CLI frame below.
        vals = {xxh64(b"x" * n) for n in (0, 1, 3, 4, 7, 8, 31, 32, 33, 100)}
        assert len(vals) == 10


class TestInteropDecode:
    @pytest.mark.parametrize("level", [1, 3, 9, 19])
    def test_pyarrow_frames_decode_exact(self, level):
        for name, p in _payloads().items():
            got = decompress_zstd(_pa_zstd(p, level), max_out=1 << 24)
            assert got == p, f"level={level} payload={name}"

    @pytest.mark.skipif(
        shutil.which("zstd") is None, reason="no reference zstd CLI"
    )
    @pytest.mark.parametrize(
        "args",
        [["-1"], ["-19"], ["--long=20", "-9"], ["-3", "--no-check"]],
    )
    def test_reference_cli_frames_decode_exact(self, args):
        p = _payloads()["big"]
        blob = subprocess.run(
            ["zstd", "-c"] + args, input=p, capture_output=True, check=True
        ).stdout
        assert decompress_zstd(blob, max_out=1 << 24) == p

    def test_multi_frame_and_skippable(self):
        skip = (
            (0x184D2A50).to_bytes(4, "little")
            + (5).to_bytes(4, "little")
            + b"metad"
        )
        blob = _pa_zstd(b"frame one|") + skip + _pa_zstd(b"frame two")
        assert decompress_zstd(blob) == b"frame one|frame two"


class TestRawEncoder:
    def test_both_direction_interop(self):
        import pyarrow as pa

        for name, p in _payloads().items():
            enc = compress_zstd_raw(p)
            assert decompress_zstd(enc, max_out=1 << 24) == p, name
            dec = pa.Codec("zstd").decompress(enc, len(p))
            dec = (
                dec.to_pybytes() if hasattr(dec, "to_pybytes") else bytes(dec)
            )
            assert dec == p, f"libzstd rejects raw frame: {name}"

    def test_checksum_present_and_verified(self):
        enc = bytearray(compress_zstd_raw(b"checksummed content"))
        enc[-1] ^= 0xFF
        with pytest.raises(ValueError, match="checksum"):
            decompress_zstd(bytes(enc))

    def test_multiblock_large_content(self):
        p = bytes(random.Random(1).randbytes(300_000))  # > 2 raw blocks
        assert decompress_zstd(compress_zstd_raw(p), max_out=1 << 20) == p


class TestStrictness:
    def test_bad_magic(self):
        with pytest.raises(ValueError, match="magic"):
            decompress_zstd(b"\x28\xb5\x2f\xfe" + b"\x00" * 10)

    def test_short_input(self):
        with pytest.raises(ValueError, match="shorter"):
            decompress_zstd(b"\x28")

    def test_reserved_frame_header_bit(self):
        blob = bytearray(compress_zstd_raw(b"x"))
        blob[4] |= 0x08
        with pytest.raises(ValueError, match="reserved frame-header"):
            decompress_zstd(bytes(blob))

    def test_dictionary_rejected(self):
        # single-segment, 1-byte FCS, 1-byte dict id = 7
        blob = bytes(
            [0x28, 0xB5, 0x2F, 0xFD, 0x21, 0x01, 0x07]
        ) + b"\x09\x00\x00x"
        with pytest.raises(ValueError, match="dictionaries"):
            decompress_zstd(blob)

    def test_window_too_large_rejected(self):
        # window descriptor exponent 31 → 2 TB; refuse before decoding
        blob = bytes([0x28, 0xB5, 0x2F, 0xFD, 0x00, 0xF8]) + b"\x01\x00\x00"
        with pytest.raises(ValueError, match="window"):
            decompress_zstd(blob)

    def test_reserved_block_type(self):
        blob = bytearray(compress_zstd_raw(b"abc", checksum=False))
        # block header starts after magic(4)+fhd(1)+fcs(1)
        bh = int.from_bytes(blob[6:9], "little") | 0b110
        blob[6:9] = bh.to_bytes(3, "little")
        with pytest.raises(ValueError, match="reserved block"):
            decompress_zstd(bytes(blob))

    def test_content_size_mismatch(self):
        blob = bytearray(compress_zstd_raw(b"abcd", checksum=False))
        blob[5] = 5  # declare 5, frame carries 4
        with pytest.raises(ValueError, match="content size"):
            decompress_zstd(bytes(blob))
        blob[5] = 3  # declare 3: the 4-byte block now exceeds window
        with pytest.raises(ValueError, match="beyond maximum"):
            decompress_zstd(bytes(blob))

    def test_trailing_bytes_rejected(self):
        with pytest.raises(ValueError, match="magic|trailing"):
            decompress_zstd(compress_zstd_raw(b"abc") + b"z")

    def test_every_truncated_prefix_raises(self):
        blob = _pa_zstd(b"prefix discipline " * 300, 3)
        for cut in range(len(blob)):
            with pytest.raises(ValueError):
                decompress_zstd(blob[:cut])

    @pytest.mark.skipif(
        shutil.which("zstd") is None, reason="no reference zstd CLI"
    )
    def test_corruption_scan_checksummed_frame(self):
        # flip one byte at a time through a CHECKSUMMED frame (the CLI
        # default): never a silent wrong answer — either ValueError or
        # the exact original.
        p = b"The quick brown fox jumps over the lazy dog. " * 200
        blob = bytearray(
            subprocess.run(
                ["zstd", "-c", "-3"], input=p, capture_output=True,
                check=True,
            ).stdout
        )
        for pos in range(len(blob)):
            blob[pos] ^= 0x55
            try:
                out = decompress_zstd(bytes(blob), max_out=1 << 22)
                assert out == p, f"silent corruption at byte {pos}"
            except ValueError:
                pass
            finally:
                blob[pos] ^= 0x55

    def test_corruption_differential_vs_libzstd(self):
        # pyarrow frames carry NO checksum, so some flips legitimately
        # change output; soundness here is differential: whenever this
        # decoder accepts a corrupted frame, libzstd must accept it too
        # and produce the identical bytes.
        import pyarrow as pa

        p = b"The quick brown fox jumps over the lazy dog. " * 200
        blob = bytearray(_pa_zstd(p, 3))
        for pos in range(len(blob)):
            blob[pos] ^= 0x55
            try:
                mine = decompress_zstd(bytes(blob), max_out=1 << 22)
            except ValueError:
                mine = None
            if mine is not None:
                ref = pa.Codec("zstd").decompress(bytes(blob), len(mine))
                ref = (
                    ref.to_pybytes()
                    if hasattr(ref, "to_pybytes")
                    else bytes(ref)
                )
                assert mine == ref, f"diverges from libzstd at byte {pos}"
            blob[pos] ^= 0x55

    def test_max_out_bound_distinct_message(self):
        blob = _pa_zstd(b"z" * 200_000, 3)
        with pytest.raises(ValueError, match="max_out"):
            decompress_zstd(blob, max_out=1000)
        # RLE-block bomb: tiny input declaring huge regenerated size
        # is refused by the block-maximum check before allocation
        bomb = bytes([0x28, 0xB5, 0x2F, 0xFD, 0x01, 0x00, 0x00])
        bh = (0x1FFFFF << 3) | 0b011  # last, RLE, max 21-bit size
        bomb += bh.to_bytes(3, "little") + b"A"
        with pytest.raises(ValueError, match="beyond maximum|max_out"):
            decompress_zstd(bomb, max_out=1000)

    def test_treeless_literals_without_table(self):
        # hand-built compressed block whose literals are Treeless (3)
        # with no prior huffman table in the frame
        lits = bytes([3 | (0 << 2), 0x00, 0x00])  # type=3, sf=0
        bh = ((len(lits) + 1) << 3) | 0b101  # last, Compressed
        frame = (
            bytes([0x28, 0xB5, 0x2F, 0xFD, 0x20, 0x05])
            + bh.to_bytes(3, "little")
            + lits
            + b"\x00"
        )
        with pytest.raises(ValueError, match="treeless|truncated|huffman"):
            decompress_zstd(frame)


class TestRandomizedRoundtrip:
    def test_random_payloads_all_levels(self):
        rng = random.Random(1234)
        for _ in range(30):
            n = rng.randrange(0, 5000)
            p = rng.randbytes(n) if rng.random() < 0.5 else bytes(
                rng.choice(b"abcd e") for _ in range(n)
            )
            level = rng.choice([1, 3, 9, 19])
            assert decompress_zstd(_pa_zstd(p, level), max_out=1 << 22) == p


class TestEntropyEncoder:
    """compress_zstd: huff0-coded literals, both tree-description
    forms, per-block Raw/RLE fallback — pinned against libzstd in BOTH
    directions on every payload."""

    def test_both_direction_interop(self):
        import pyarrow as pa

        from metricproxy_spark.sources.zstd import compress_zstd

        for name, p in _payloads().items():
            enc = compress_zstd(p)
            assert decompress_zstd(enc, max_out=1 << 24) == p, name
            dec = pa.Codec("zstd").decompress(enc, len(p))
            dec = (
                dec.to_pybytes() if hasattr(dec, "to_pybytes") else bytes(dec)
            )
            assert dec == p, f"libzstd rejects entropy frame: {name}"

    def test_actually_compresses(self):
        from metricproxy_spark.sources.zstd import compress_zstd

        p = b'{"doc_id": 1, "text": "training shard line"}\n' * 2000
        enc = compress_zstd(p)
        # literals-only coding reaches the order-0 entropy bound (~53%
        # here) — no match-finding, so not libzstd's ratio, but far
        # from a raw passthrough
        assert len(enc) < (len(p) * 6) // 10
        # and the skewed-text case exercises FSE-compressed weights:
        # >1 distinct weight, tree shorter than direct form sometimes
        assert decompress_zstd(enc, max_out=1 << 24) == p

    def test_fse_weight_form_used_and_valid(self):
        """A wide skewed alphabet forces many distinct weights — the
        FSE-compressed tree description round-trips through libzstd."""
        import pyarrow as pa

        from metricproxy_spark.sources.zstd import compress_zstd

        rng = random.Random(7)
        p = bytes(
            min(200, int(rng.expovariate(1 / 20.0))) for _ in range(50000)
        )
        enc = compress_zstd(p)
        assert len(enc) < len(p)
        assert decompress_zstd(enc, max_out=1 << 20) == p
        dec = pa.Codec("zstd").decompress(enc, len(p))
        dec = dec.to_pybytes() if hasattr(dec, "to_pybytes") else bytes(dec)
        assert dec == p

    def test_fuzz_sizes_and_alphabets(self):
        import pyarrow as pa

        from metricproxy_spark.sources.zstd import compress_zstd

        rng = random.Random(13)
        for _ in range(60):
            size = rng.choice(
                [1, 2, 3, 17, 1023, 1024, 1025, 4096, 131072, 131073]
            )
            alpha = rng.choice([2, 3, 16, 129, 256])
            p = bytes(
                min(alpha - 1, int(rng.expovariate(2.0 / alpha)))
                for _ in range(size)
            )
            enc = compress_zstd(p)
            assert decompress_zstd(enc, max_out=len(p) + 64) == p
            dec = pa.Codec("zstd").decompress(enc, len(p))
            dec = (
                dec.to_pybytes() if hasattr(dec, "to_pybytes") else bytes(dec)
            )
            assert dec == p

    @pytest.mark.skipif(
        shutil.which("zstd") is None, reason="no reference zstd CLI"
    )
    def test_reference_cli_decodes(self, tmp_path):
        import subprocess

        from metricproxy_spark.sources.zstd import compress_zstd

        p = b"reference cli pin: " + b"entropy coded payload " * 400
        f = tmp_path / "x.zst"
        f.write_bytes(compress_zstd(p))
        r = subprocess.run(
            ["zstd", "-d", "-c", str(f)], capture_output=True
        )
        assert r.returncode == 0
        assert r.stdout == p

    def test_checksum_verified(self):
        from metricproxy_spark.sources.zstd import compress_zstd

        enc = bytearray(compress_zstd(b"checksummed entropy content" * 20))
        enc[-1] ^= 0xFF
        with pytest.raises(ValueError, match="checksum"):
            decompress_zstd(bytes(enc))
