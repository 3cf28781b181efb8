"""Round-14 regression tests: the three r13 ADVICE fixes first
(zstd 4-stream guard order, parquet index None contract, _BitAcc
linearization), then the round's new operators as they land."""

from __future__ import annotations

import pytest


class TestAdviceFixes:
    def test_offset_index_none_is_named_valueerror(self, tmp_path):
        from metricproxy_spark.sources.parquet_index import (
            read_column_index,
            read_offset_index,
        )

        p = str(tmp_path / "x.parquet")
        with pytest.raises(ValueError, match="no offset index"):
            read_offset_index(p, None)
        with pytest.raises(ValueError, match="no column index"):
            read_column_index(p, None)

    def test_file_without_page_index_rejected_cleanly(self, tmp_path):
        # pyarrow writes parquet WITHOUT page indexes by default —
        # the pruning path must fail with the repo's named ValueError,
        # not a TypeError tuple-unpack (r13 ADVICE finding 2).
        import pyarrow as pa
        import pyarrow.parquet as pq

        from metricproxy_spark.sources.parquet_footer import (
            read_footer_bytes,
        )
        from metricproxy_spark.sources.parquet_index import (
            column_chunk_indexes,
            read_offset_index,
        )

        path = str(tmp_path / "noindex.parquet")
        pq.write_table(
            pa.table({"a": list(range(100))}),
            path,
            write_page_index=False,
        )
        meta = column_chunk_indexes(read_footer_bytes(path), "a")[0]
        if meta["offset_index"] is None:
            with pytest.raises(ValueError, match="no offset index"):
                read_offset_index(path, meta["offset_index"])
        else:
            pytest.skip("this pyarrow wrote page indexes anyway")

    def test_bitacc_matches_bigint_reference(self):
        # The linearized byte-flushing serializer must be bit-identical
        # to the original single-big-int construction.
        import random

        from metricproxy_spark.sources.zstd import _BitAcc

        rng = random.Random(1414)
        for _ in range(25):
            acc = _BitAcc()
            ref = 1
            nbits = 1
            for _ in range(rng.randrange(1, 400)):
                nb = rng.randrange(1, 24)
                v = rng.randrange(1 << nb)
                acc.push(v, nb)
                ref = (ref << nb) | v
                nbits += nb
            assert acc.bytes() == ref.to_bytes((nbits + 7) // 8, "little")
            assert acc.nbits == nbits

    def test_bitacc_rejects_wide_value(self):
        from metricproxy_spark.sources.zstd import _BitAcc

        acc = _BitAcc()
        with pytest.raises(ValueError, match="wider than field"):
            acc.push(4, 2)

    def test_large_single_stream_block_linear_roundtrip(self):
        # A full 128 KiB low-entropy block exercises the hot path the
        # r13 ADVICE flagged as quadratic; with the flush rewrite this
        # runs in well under a second.
        import time

        import pyarrow as pa

        from metricproxy_spark.sources.zstd import (
            compress_zstd,
            decompress_zstd,
        )

        data = bytes((i * 7 + (i >> 5)) % 48 for i in range(128 * 1024))
        t0 = time.monotonic()
        enc = compress_zstd(data)
        elapsed = time.monotonic() - t0
        assert decompress_zstd(enc, max_out=1 << 20) == data
        assert (
            pa.Codec("zstd")
            .decompress(enc, decompressed_size=len(data))
            .to_pybytes()
            == data
        )
        assert len(enc) < len(data)
        assert elapsed < 5.0  # was tens of seconds under the big-int acc
