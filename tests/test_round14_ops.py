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


class TestParquetWriter:
    """Four-reader cross-check of the from-scratch writer: pyarrow,
    DuckDB, (Spark covered by the driver query) and the repo's own
    page decoder all read the same hand-written bytes."""

    @staticmethod
    def _cols(n=5000):
        return {
            "id": list(range(n)),
            "name": [f"type_{i % 7}" for i in range(n)],
            "score": [i * 0.5 for i in range(n)],
            "flag": [i % 3 == 0 for i in range(n)],
            "opt": [None if i % 4 == 0 else i * 2 for i in range(n)],
            "small": [i % 100 for i in range(n)],
        }

    _SCHEMA = [
        ("id", "int64"),
        ("name", "string"),
        ("score", "double"),
        ("flag", "boolean"),
        ("opt", "int64"),
        ("small", "int32"),
    ]

    @pytest.mark.parametrize("codec", ["uncompressed", "zstd"])
    def test_pyarrow_and_duckdb_cross_read(self, tmp_path, codec):
        import duckdb
        import pyarrow.parquet as pq

        from metricproxy_spark.sources.parquet_writer import write_parquet

        cols = self._cols()
        p = str(tmp_path / f"own_{codec}.parquet")
        n_rgs = write_parquet(
            p,
            self._SCHEMA,
            cols,
            nullable={"opt"},
            dictionary={"name"},
            row_group_rows=2048,
            page_rows=600,
            codec=codec,
        )
        assert n_rgs == 3
        t = pq.read_table(p)
        for name in cols:
            assert t.column(name).to_pylist() == cols[name], name
        got = duckdb.sql(
            f"SELECT count(*), sum(id), sum(opt), count(opt), sum(small),"
            f" min(name), max(name), count_if(flag)"
            f" FROM read_parquet('{p}')"
        ).fetchone()
        assert got == (
            5000,
            sum(cols["id"]),
            sum(v for v in cols["opt"] if v is not None),
            sum(v is not None for v in cols["opt"]),
            sum(cols["small"]),
            "type_0",
            "type_6",
            sum(cols["flag"]),
        )

    def test_own_page_decoder_reads_own_writer(self, tmp_path):
        from metricproxy_spark.sources.parquet_footer import (
            decode_rowgroup_stats,
            read_footer_bytes,
            stat_int64,
        )
        from metricproxy_spark.sources.parquet_pages import decode_columns
        from metricproxy_spark.sources.parquet_writer import write_parquet

        cols = self._cols()
        p = str(tmp_path / "own.parquet")
        write_parquet(
            p,
            self._SCHEMA,
            cols,
            nullable={"opt"},
            dictionary={"name"},
            row_group_rows=2048,
            page_rows=600,
            codec="zstd",
        )
        stats = decode_rowgroup_stats(read_footer_bytes(p), "id")
        assert [s["num_rows"] for s in stats] == [2048, 2048, 904]
        assert [stat_int64(s["min_raw"]) for s in stats] == [0, 2048, 4096]
        assert [stat_int64(s["max_raw"]) for s in stats] == [
            2047,
            4095,
            4999,
        ]
        null_stats = decode_rowgroup_stats(read_footer_bytes(p), "opt")
        assert null_stats[0]["null_count"] == 512
        for rg, lo in enumerate((0, 2048, 4096)):
            got = decode_columns(p, ["id", "name", "score", "opt"], rg)
            hi = min(lo + 2048, 5000)
            assert list(got["id"]) == cols["id"][lo:hi]
            assert [b.decode() for b in got["name"]] == cols["name"][lo:hi]
            assert list(got["score"]) == cols["score"][lo:hi]
            assert list(got["opt"]) == cols["opt"][lo:hi]

    def test_thrift_encoder_roundtrips_own_walker(self):
        from metricproxy_spark.sources.parquet_footer import _read_struct
        from metricproxy_spark.sources.parquet_writer import _enc_struct

        blob = _enc_struct(
            [
                (1, "i32", 42),
                (2, "binary", b"hello"),
                (3, "list", ("i64", [0, -5, 1 << 40])),
                (5, "bool", True),
                (6, "struct", [(1, "i32", -7)]),
                (300, "i64", -(1 << 50)),  # long-form field id
                (301, "list", ("bool", [True, False, True])),
            ]
        )
        got, end = _read_struct(blob, 0)
        assert end == len(blob)
        assert got[1] == 42 and got[2] == b"hello"
        assert got[3] == [0, -5, 1 << 40]
        assert got[5] is True and got[6] == {1: -7}
        assert got[300] == -(1 << 50)
        assert got[301] == [True, False, True]

    def test_all_null_page_and_single_row_group(self, tmp_path):
        import duckdb
        import pyarrow.parquet as pq

        from metricproxy_spark.sources.parquet_writer import write_parquet

        # a page whose values are ALL null exercises the empty
        # dictionary-index / empty plain sections
        cols = {"k": list(range(20)), "v": [None] * 10 + list(range(10))}
        p = str(tmp_path / "nulls.parquet")
        write_parquet(
            p,
            [("k", "int64"), ("v", "int64")],
            cols,
            nullable={"v"},
            page_rows=10,
        )
        assert pq.read_table(p).column("v").to_pylist() == cols["v"]
        assert duckdb.sql(
            f"SELECT sum(v) FROM read_parquet('{p}')"
        ).fetchone() == (45,)

    def test_writer_contract_errors(self, tmp_path):
        from metricproxy_spark.sources.parquet_writer import write_parquet

        p = str(tmp_path / "x.parquet")
        with pytest.raises(ValueError, match="null in REQUIRED"):
            write_parquet(p, [("a", "int64")], {"a": [1, None]})
        with pytest.raises(ValueError, match="ragged"):
            write_parquet(
                p,
                [("a", "int64"), ("b", "int64")],
                {"a": [1], "b": [1, 2]},
            )
        with pytest.raises(ValueError, match="unsupported codec"):
            write_parquet(p, [("a", "int64")], {"a": [1]}, codec="lzo")
        with pytest.raises(ValueError, match="strings only"):
            write_parquet(
                p, [("a", "int64")], {"a": [1]}, dictionary={"a"}
            )


class TestZstdSequences:
    """Round-14: the LZ77 sequences half of the from-scratch zstd
    ENCODER (greedy hash match finder + predefined-FSE three-stream
    sequence emission) — interop-pinned in both directions."""

    @staticmethod
    def _corpus():
        return b"".join(
            b'{"metric":"cpu.usage","host":"web-%03d","value":%d.5}\n'
            % (i % 40, i % 97)
            for i in range(4000)
        )

    def test_sequences_beat_literals_only(self):
        from metricproxy_spark.sources.zstd import (
            _compress_literals,
            compress_zstd,
            decompress_zstd,
        )

        doc = self._corpus()
        enc = compress_zstd(doc)
        assert decompress_zstd(enc, max_out=len(doc) + 16) == doc
        # literals-only lower bound: sum of per-block huff0 sections
        lit_total = sum(
            len(_compress_literals(doc[i : i + 128 * 1024]) or b"")
            for i in range(0, len(doc), 128 * 1024)
        )
        assert len(enc) < lit_total / 3  # sequences win by a wide margin

    def test_libzstd_decodes_sequences_frame(self):
        import pyarrow as pa

        from metricproxy_spark.sources.zstd import compress_zstd

        doc = self._corpus()
        enc = compress_zstd(doc)
        assert (
            pa.Codec("zstd")
            .decompress(enc, decompressed_size=len(doc))
            .to_pybytes()
            == doc
        )

    def test_zstd_cli_decodes_sequences_frame(self, tmp_path):
        import shutil as _sh
        import subprocess

        cli = "/root/miniconda/bin/zstd"
        if not _sh.which(cli) and not __import__("os").path.exists(cli):
            pytest.skip("no zstd CLI in this environment")
        from metricproxy_spark.sources.zstd import compress_zstd

        doc = self._corpus()
        p = tmp_path / "seq.zst"
        p.write_bytes(compress_zstd(doc))
        out = subprocess.run(
            [cli, "-d", "-c", str(p)], capture_output=True
        )
        assert out.returncode == 0 and out.stdout == doc

    def test_cross_block_matches_roundtrip(self):
        # a repeat whose matches reach back into the PREVIOUS block
        from metricproxy_spark.sources.zstd import (
            compress_zstd,
            decompress_zstd,
        )

        import pyarrow as pa

        data = (b"0123456789abcdef" * 20000)[: 300_000]
        enc = compress_zstd(data)
        assert len(enc) < len(data) // 100
        assert decompress_zstd(enc, max_out=len(data) + 16) == data
        assert (
            pa.Codec("zstd")
            .decompress(enc, decompressed_size=len(data))
            .to_pybytes()
            == data
        )

    def test_incompressible_falls_back_to_raw(self):
        import os as _os

        from metricproxy_spark.sources.zstd import (
            compress_zstd,
            decompress_zstd,
        )

        data = _os.urandom(150_000)
        enc = compress_zstd(data)
        assert len(enc) <= len(data) + 32  # raw blocks + framing only
        assert decompress_zstd(enc, max_out=len(data) + 16) == data

    @pytest.mark.parametrize("n", [0, 1, 4, 7, 8, 31, 32, 4095, 4096])
    def test_size_edges_roundtrip(self, n):
        from metricproxy_spark.sources.zstd import (
            compress_zstd,
            decompress_zstd,
        )

        data = bytes((i * 13) % 251 for i in range(n))
        assert decompress_zstd(compress_zstd(data), max_out=n + 16) == data

    def test_encode_sequences_inverse_of_decode(self):
        from metricproxy_spark.sources.zstd import (
            _decode_sequences,
            _encode_sequences,
            _FrameCtx,
        )

        seqs = [(5, 7, 4), (0, 4, 1), (130, 65, 4000), (1, 9, 2)]
        sec, reps = _encode_sequences(seqs)
        got = _decode_sequences(sec, _FrameCtx())
        assert got == seqs
        # repeat-offset round: same offset back-to-back with ll > 0
        # must resolve through the rep codes and carried state
        rep_seqs = [(3, 8, 40), (2, 5, 40), (0, 4, 40), (1, 6, 7), (4, 4, 40)]
        sec2, _ = _encode_sequences(rep_seqs)
        assert _decode_sequences(sec2, _FrameCtx()) == rep_seqs
        # cross-block state: the second section starts from the reps
        # the first one ended with
        a = [(5, 4, 100), (1, 4, 100)]
        b = [(2, 4, 100), (3, 4, 7)]
        sec_a, reps_a = _encode_sequences(a)
        sec_b, _ = _encode_sequences(b, reps_a)
        ctx = _FrameCtx()
        assert _decode_sequences(sec_a, ctx) == a
        assert _decode_sequences(sec_b, ctx) == b


class TestIcebergSequenceNumbers:
    def test_naive_unordered_application_over_deletes(self, spark, sf_dir):
        """The spec's ordering rule is load-bearing: applying the
        equality delete table-wide (ignoring sequence numbers) erases
        the two re-insert files and returns a strictly smaller,
        different result than the sequence-aware reader."""
        from pyspark.sql import functions as F

        from metricproxy_spark.io import load_table
        from metricproxy_spark.queries.cdc import (
            cdc_iceberg_sequence_numbers,
        )

        correct = cdc_iceberg_sequence_numbers(spark, sf_dir)
        events = load_table(spark, sf_dir, "events")
        n_events = events.count()
        n_err = events.where(F.col("event_type") == "error").count()
        assert n_err > 0, "fixture needs error rows"
        # sequence-aware: every original non-error row + both re-inserts
        assert correct.count() == n_events + n_err
        assert (
            correct.where(F.col("event_type") == "error").count()
            == 2 * n_err
        )
        # naive reader: same files, delete applied without the
        # sequence guard -> the re-inserted error rows vanish too
        from metricproxy_spark.io import staged_artifact_dir

        root = staged_artifact_dir("icebergseq", sf_dir)
        import glob as _glob
        import os as _os

        data_dirs = sorted(
            _glob.glob(_os.path.join(root, "data", "b=*"))
        ) + [
            _os.path.join(root, "reinsert-a"),
            _os.path.join(root, "reinsert-b"),
        ]
        data = spark.read.parquet(*data_dirs).select(
            "event_id", "event_type", "user_id", "value"
        )
        dele = spark.read.parquet(_os.path.join(root, "eq-deletes"))
        unordered = data.join(
            F.broadcast(dele), on=["event_type"], how="left_anti"
        )
        assert unordered.count() == n_events - n_err
        assert unordered.count() != correct.count()


class TestDeltaMergeDv:
    def test_dv_merge_matches_cow_merge_without_rewrites(
        self, spark, sf_dir
    ):
        import json as _json
        import os as _os

        from metricproxy_spark.io import staged_artifact_dir
        from metricproxy_spark.queries.cdc import (
            cdc_delta_merge,
            cdc_delta_merge_dv,
        )

        cow = cdc_delta_merge(spark, sf_dir)
        dv = cdc_delta_merge_dv(spark, sf_dir)
        # identical final state, row for row
        assert dv.count() == cow.count()
        assert dv.exceptAll(cow).count() == 0
        assert cow.exceptAll(dv).count() == 0

        root = staged_artifact_dir("deltamergedv", sf_dir)
        # no rewritten copy of any touched file exists anywhere
        assert not _os.path.exists(_os.path.join(root, "merge-rewrite"))
        plan = _json.load(open(_os.path.join(root, "_merge_plan.json")))
        log_dir = _os.path.join(root, "_delta_log")
        v1_adds, v1_removes = [], []
        with open(_os.path.join(log_dir, f"{1:020d}.json")) as fh:
            for line in fh:
                act = _json.loads(line)
                if "add" in act:
                    v1_adds.append(act["add"])
                if "remove" in act:
                    v1_removes.append(act["remove"]["path"])
        # every touched file is re-added AT ITS ORIGINAL PATH with a
        # deletionVector; only the update/insert files are new
        touched_paths = {f"data/file-{b:02d}.parquet" for b in plan["touched"]}
        dv_adds = {a["path"] for a in v1_adds if "deletionVector" in a}
        assert dv_adds == touched_paths == set(v1_removes)
        new_files = {a["path"] for a in v1_adds} - dv_adds
        assert new_files == {"merge-updates", "merge-inserts"}
        # untouched files appear in NO commit-1 action at all
        for b in plan["untouched"]:
            path = f"data/file-{b:02d}.parquet"
            assert path not in v1_removes
            assert all(a["path"] != path for a in v1_adds)
        # DV bytes are proportional to changed rows: the shared DV
        # file is KB-scale next to the data it masks
        dv_file = _os.path.join(root, "dv", "merge-deletions.bin")
        data_bytes = sum(
            _os.path.getsize(_os.path.join(root, "data", f))
            for f in _os.listdir(_os.path.join(root, "data"))
        )
        assert _os.path.getsize(dv_file) < data_bytes / 20


class TestDeltaColumnMapping:
    def test_logical_names_absent_from_files_and_rename_is_free(
        self, spark, sf_dir
    ):
        import os as _os

        from pyspark.sql.utils import AnalysisException

        from metricproxy_spark.io import staged_artifact_dir
        from metricproxy_spark.queries.cdc import cdc_delta_column_mapping

        df = cdc_delta_column_mapping(spark, sf_dir)
        assert df.columns == ["event_id", "event_type", "user_id", "reading"]
        assert df.count() > 0
        root = staged_artifact_dir("deltacolmap", sf_dir)
        raw = spark.read.parquet(_os.path.join(root, "data"))
        # the parquet files genuinely hold PHYSICAL names only — a
        # logical==physical reader cannot resolve the logical column
        assert "event_id" not in raw.columns
        assert "col-eid-8f21" in raw.columns
        with pytest.raises(AnalysisException):
            raw.select("event_id").collect()
        # the rename commit is metadata-only: no add/remove actions
        import json as _json

        with open(
            _os.path.join(root, "_delta_log", f"{1:020d}.json")
        ) as fh:
            acts = [_json.loads(x) for x in fh]
        assert all("add" not in a and "remove" not in a for a in acts)
        assert any("metaData" in a for a in acts)


class TestParquetWriterPageIndex:
    def test_own_index_readers_prune_own_files(self, tmp_path):
        """write -> page-index -> prune -> decode, zero libraries end
        to end: the writer's ColumnIndex/OffsetIndex pair drives the
        repo's own page-selection readers over its own file."""
        import struct as _struct

        from metricproxy_spark.sources.parquet_footer import (
            read_footer_bytes,
        )
        from metricproxy_spark.sources.parquet_index import (
            column_chunk_indexes,
            decode_selected_pages,
            read_column_index,
            read_offset_index,
        )
        from metricproxy_spark.sources.parquet_pages import (
            column_chunk_meta,
        )
        from metricproxy_spark.sources.parquet_writer import write_parquet

        n = 10000
        cols = {
            "id": list(range(n)),
            "name": [f"t{i % 7}" for i in range(n)],
            "opt": [None if i % 5 == 0 else i * 3 for i in range(n)],
        }
        p = str(tmp_path / "own_idx.parquet")
        write_parquet(
            p,
            [("id", "int64"), ("name", "string"), ("opt", "int64")],
            cols,
            nullable={"opt"},
            dictionary={"name"},
            row_group_rows=4096,
            page_rows=512,
            codec="zstd",
        )
        ftr = read_footer_bytes(p)
        idx = column_chunk_indexes(ftr, "id")
        assert all(m["offset_index"] and m["column_index"] for m in idx)
        oi = read_offset_index(p, idx[0]["offset_index"])
        ci = read_column_index(p, idx[0]["column_index"])
        assert [pg["first_row_index"] for pg in oi] == list(
            range(0, 4096, 512)
        )
        assert ci["null_pages"] == [False] * 8
        assert _struct.unpack("<q", ci["min_values"][3])[0] == 3 * 512
        assert _struct.unpack("<q", ci["max_values"][3])[0] == 4 * 512 - 1
        chunk = column_chunk_meta(ftr, "id")[0]
        assert decode_selected_pages(p, chunk, oi, [3]) == list(
            range(3 * 512, 4 * 512)
        )
        # dictionary column: selected-page decode pulls the dict page
        oin = read_offset_index(
            p, column_chunk_indexes(ftr, "name")[1]["offset_index"]
        )
        got = decode_selected_pages(
            p, column_chunk_meta(ftr, "name")[1], oin, [2]
        )
        assert got == [
            f"t{i % 7}".encode()
            for i in range(4096 + 2 * 512, 4096 + 3 * 512)
        ]
        # nullable column: null_counts per page + def-level decode
        cio = read_column_index(
            p, column_chunk_indexes(ftr, "opt")[0]["column_index"]
        )
        assert sum(cio["null_counts"]) == sum(
            1 for i in range(4096) if i % 5 == 0
        )
        oio = read_offset_index(
            p, column_chunk_indexes(ftr, "opt")[0]["offset_index"]
        )
        vo = decode_selected_pages(
            p, column_chunk_meta(ftr, "opt")[0], oio, [0]
        )
        assert vo == [None if i % 5 == 0 else i * 3 for i in range(512)]

    def test_page_index_off_still_reads_everywhere(self, tmp_path):
        import duckdb
        import pyarrow.parquet as pq

        from metricproxy_spark.sources.parquet_footer import (
            read_footer_bytes,
        )
        from metricproxy_spark.sources.parquet_index import (
            column_chunk_indexes,
        )
        from metricproxy_spark.sources.parquet_writer import write_parquet

        p = str(tmp_path / "own_noidx.parquet")
        write_parquet(
            p,
            [("a", "int64")],
            {"a": list(range(100))},
            page_index=False,
        )
        assert pq.read_table(p).column("a").to_pylist() == list(range(100))
        assert duckdb.sql(
            f"SELECT sum(a) FROM read_parquet('{p}')"
        ).fetchone() == (4950,)
        meta = column_chunk_indexes(read_footer_bytes(p), "a")[0]
        assert meta["offset_index"] is None
        assert meta["column_index"] is None


class TestParquetWriterBloom:
    def test_bloom_write_read_roundtrip_and_fpp(self, tmp_path):
        from metricproxy_spark.sources.parquet_footer import (
            read_footer_bytes,
        )
        from metricproxy_spark.sources.parquet_index import (
            bloom_hash_bytes,
            bloom_hash_int64,
            column_chunk_indexes,
            read_bloom_filter,
        )
        from metricproxy_spark.sources.parquet_writer import write_parquet

        n = 8000
        cols = {
            "uid": [i * 37 % 5000 for i in range(n)],
            "name": [f"u{i % 11}" for i in range(n)],
        }
        p = str(tmp_path / "own_bloom.parquet")
        write_parquet(
            p,
            [("uid", "int64"), ("name", "string")],
            cols,
            dictionary={"name"},
            bloom={"uid", "name"},
            row_group_rows=4000,
            page_rows=1000,
            codec="zstd",
        )
        ftr = read_footer_bytes(p)
        for rg in range(2):
            meta = column_chunk_indexes(ftr, "uid")[rg]
            assert meta["bloom"] is not None
            bf = read_bloom_filter(p, *meta["bloom"])
            present = set(cols["uid"][rg * 4000 : (rg + 1) * 4000])
            # NO false negatives, ever
            assert all(
                bf.might_contain_hash(bloom_hash_int64(v))
                for v in present
            )
            absent = [v for v in range(5001, 15001) if v not in present]
            fp = sum(
                bf.might_contain_hash(bloom_hash_int64(v))
                for v in absent[:2000]
            )
            assert fp < 100  # ~1% design point; observed ~0.15%
            bfn = read_bloom_filter(
                p, *column_chunk_indexes(ftr, "name")[rg]["bloom"]
            )
            assert all(
                bfn.might_contain_hash(bloom_hash_bytes(f"u{i}".encode()))
                for i in range(11)
            )

    def test_bloom_builder_rejects_zero_blocks(self):
        from metricproxy_spark.sources.parquet_writer import (
            build_split_block_bloom,
        )

        with pytest.raises(ValueError, match="at least one block"):
            build_split_block_bloom([1, 2], 0)


class TestOwnWriterPrunedRead:
    def test_task_list_is_a_minority_of_row_groups(self, spark, sf_dir):
        """The capstone's planning must actually PRUNE: the middle
        third of a range-clustered table touches well under all
        (file, row-group) pairs."""
        import glob as _glob
        import os as _os

        from metricproxy_spark.io import staged_artifact_dir
        from metricproxy_spark.queries.ingest import (
            ingest_parquet_write_pruned_read,
        )
        from metricproxy_spark.sources.parquet_footer import (
            decode_rowgroup_stats,
            read_footer_bytes,
            stat_int64,
        )

        df = ingest_parquet_write_pruned_read(spark, sf_dir)
        assert df.count() > 0
        root = staged_artifact_dir("ownsorted", sf_dir)
        files = sorted(
            _glob.glob(_os.path.join(root, "part-*.parquet"))
        )
        assert len(files) == 4
        total = surviving = 0
        n_ids = 0
        stats_by_file = {}
        for f in files:
            stats = decode_rowgroup_stats(read_footer_bytes(f), "event_id")
            stats_by_file[f] = stats
            n_ids = max(
                n_ids, max(stat_int64(s["max_raw"]) for s in stats) + 1
            )
        lo, hi_ex = n_ids // 3, (2 * n_ids) // 3
        for stats in stats_by_file.values():
            for s in stats:
                total += 1
                if (
                    stat_int64(s["min_raw"]) < hi_ex
                    and stat_int64(s["max_raw"]) >= lo
                ):
                    surviving += 1
        assert surviving < total, (surviving, total)
        assert surviving <= total // 2 + 1, (surviving, total)


class TestParquetWriterV2:
    """DATA_PAGE_V2 write mode: DELTA_BINARY_PACKED ints,
    RLE_DICTIONARY strings, v2 level framing — cross-read by pyarrow,
    DuckDB, (Spark via the driver roundtrip) and the own decoder."""

    @staticmethod
    def _cols(n=10000):
        return {
            "id": list(range(n)),
            "name": [f"type_{i % 7}" for i in range(n)],
            "score": [i * 0.5 for i in range(n)],
            "opt": [None if i % 4 == 0 else i * 2 for i in range(n)],
            "small": [(-1) ** i * (i % 100) for i in range(n)],
        }

    _SCHEMA = [
        ("id", "int64"),
        ("name", "string"),
        ("score", "double"),
        ("opt", "int64"),
        ("small", "int32"),
    ]

    def test_dbp_encoder_roundtrips_own_decoder(self):
        import random

        from metricproxy_spark.sources.parquet_pages import (
            _delta_binary_packed,
        )
        from metricproxy_spark.sources.parquet_writer import (
            delta_binary_packed_enc,
        )

        rng = random.Random(7)
        cases = [
            [],
            [5],
            [0, 0, 0],
            list(range(1000)),
            [rng.randrange(-(2**62), 2**62) for _ in range(777)],
            [(-1) ** i * i**3 for i in range(300)],
            [2**63 - 1, -(2**63), 0, 5, -5] * 30,
        ]
        for vals in cases:
            enc = delta_binary_packed_enc(vals, 64)
            dec, pos = _delta_binary_packed(enc, 0, len(vals), 64)
            wrapped = [((v + 2**63) % 2**64) - 2**63 for v in vals]
            assert dec == wrapped
            assert pos == len(enc)
        v32 = [rng.randrange(-(2**31), 2**31) for _ in range(513)]
        enc = delta_binary_packed_enc(v32, 32)
        dec, pos = _delta_binary_packed(enc, 0, len(v32), 32)
        assert dec == v32 and pos == len(enc)

    @pytest.mark.parametrize("codec", ["uncompressed", "zstd"])
    def test_v2_cross_read(self, tmp_path, codec):
        import duckdb
        import pyarrow.parquet as pq

        from metricproxy_spark.sources.parquet_writer import write_parquet

        cols = self._cols()
        p = str(tmp_path / f"v2_{codec}.parquet")
        write_parquet(
            p,
            self._SCHEMA,
            cols,
            nullable={"opt"},
            dictionary={"name"},
            row_group_rows=4096,
            page_rows=1000,
            codec=codec,
            data_page_version=2,
        )
        t = pq.read_table(p)
        for c in cols:
            assert t.column(c).to_pylist() == cols[c], c
        got = duckdb.sql(
            f"SELECT sum(id), sum(opt), count(opt), min(name),"
            f" max(name), sum(small) FROM read_parquet('{p}')"
        ).fetchone()
        assert got == (
            sum(cols["id"]),
            sum(v for v in cols["opt"] if v is not None),
            sum(v is not None for v in cols["opt"]),
            "type_0",
            "type_6",
            sum(cols["small"]),
        )

    def test_own_decoder_reads_own_v2(self, tmp_path):
        from metricproxy_spark.sources.parquet_pages import decode_columns
        from metricproxy_spark.sources.parquet_writer import write_parquet

        cols = self._cols()
        p = str(tmp_path / "v2.parquet")
        write_parquet(
            p,
            self._SCHEMA,
            cols,
            nullable={"opt"},
            dictionary={"name"},
            row_group_rows=4096,
            page_rows=1000,
            codec="zstd",
            data_page_version=2,
        )
        for rg, lo in enumerate((0, 4096, 8192)):
            got = decode_columns(
                p, ["id", "name", "score", "opt", "small"], rg
            )
            hi = min(lo + 4096, 10000)
            assert list(got["id"]) == cols["id"][lo:hi]
            assert [b.decode() for b in got["name"]] == cols["name"][lo:hi]
            assert list(got["opt"]) == cols["opt"][lo:hi]
            assert list(got["small"]) == cols["small"][lo:hi]

    def test_bad_page_version_rejected(self, tmp_path):
        from metricproxy_spark.sources.parquet_writer import write_parquet

        with pytest.raises(ValueError, match="data_page_version"):
            write_parquet(
                str(tmp_path / "x.parquet"),
                [("a", "int64")],
                {"a": [1]},
                data_page_version=3,
            )


class TestParquetWriterDeltaStrings:
    """The remaining v2 encodings on the WRITE side: DELTA_BYTE_ARRAY
    front-coding, DELTA_LENGTH_BYTE_ARRAY, BYTE_STREAM_SPLIT — the
    writer now emits every encoding the r13 decoder reads."""

    def test_delta_string_encodings_cross_read(self, tmp_path):
        import duckdb
        import pyarrow.parquet as pq

        from metricproxy_spark.sources.parquet_pages import decode_columns
        from metricproxy_spark.sources.parquet_writer import write_parquet

        n = 6000
        docs = [f"doc-{i//50:04d}-common-prefix-{i%50}" for i in range(n)]
        cols = {
            "doc_id": list(range(n)),
            "text": docs,
            "lang": [("en", "de", "fr")[i % 3] for i in range(n)],
            "score": [i * 0.125 for i in range(n)],
        }
        p = str(tmp_path / "v2_delta.parquet")
        write_parquet(
            p,
            [
                ("doc_id", "int64"),
                ("text", "string"),
                ("lang", "string"),
                ("score", "double"),
            ],
            cols,
            row_group_rows=2500,
            page_rows=700,
            codec="zstd",
            data_page_version=2,
            column_encoding={
                "text": "delta_byte_array",
                "lang": "delta_length_byte_array",
                "score": "byte_stream_split",
            },
        )
        t = pq.read_table(p)
        for c in cols:
            assert t.column(c).to_pylist() == cols[c], c
        got = duckdb.sql(
            f"SELECT sum(doc_id), min(text), max(lang), sum(score)"
            f" FROM read_parquet('{p}')"
        ).fetchone()
        assert got == (
            sum(cols["doc_id"]),
            min(docs),
            "fr",
            sum(cols["score"]),
        )
        for rg, lo in enumerate((0, 2500, 5000)):
            dec = decode_columns(p, ["doc_id", "text", "lang", "score"], rg)
            hi = min(lo + 2500, n)
            assert [b.decode() for b in dec["text"]] == docs[lo:hi]
            assert [b.decode() for b in dec["lang"]] == cols["lang"][lo:hi]
            assert list(dec["score"]) == cols["score"][lo:hi]

    def test_front_coding_actually_shrinks(self, tmp_path):
        from metricproxy_spark.sources.parquet_writer import (
            delta_byte_array_enc,
        )

        docs = [f"shared-long-prefix-{i:06d}" for i in range(2000)]
        enc = delta_byte_array_enc(docs)
        plain_size = sum(4 + len(d) for d in docs)
        assert len(enc) < plain_size / 2

    def test_column_encoding_contract_errors(self, tmp_path):
        from metricproxy_spark.sources.parquet_writer import write_parquet

        p = str(tmp_path / "x.parquet")
        with pytest.raises(ValueError, match="requires data_page_version"):
            write_parquet(
                p,
                [("a", "int64")],
                {"a": [1]},
                column_encoding={"a": "byte_stream_split"},
            )
        with pytest.raises(ValueError, match="unknown encoding"):
            write_parquet(
                p,
                [("a", "int64")],
                {"a": [1]},
                data_page_version=2,
                column_encoding={"a": "rle_surprise"},
            )
        with pytest.raises(ValueError, match="conflicts with dictionary"):
            write_parquet(
                p,
                [("a", "string")],
                {"a": ["x"]},
                data_page_version=2,
                dictionary={"a"},
                column_encoding={"a": "delta_byte_array"},
            )
        with pytest.raises(ValueError, match="fixed-width"):
            from metricproxy_spark.sources.parquet_writer import (
                byte_stream_split_enc,
            )

            byte_stream_split_enc(6, ["s"])  # BYTE_ARRAY type id


class TestReviewFixes:
    """Closing-review regressions: NaN-poisoned stats, -0.0 bloom
    false negatives, shared DV framing."""

    def test_nan_double_stats_are_skipped(self, tmp_path):
        import math

        from metricproxy_spark.sources.parquet_footer import (
            decode_rowgroup_stats,
            read_footer_bytes,
        )
        import struct as _struct

        from metricproxy_spark.sources.parquet_writer import write_parquet

        nan = float("nan")
        cols = {"v": [nan, 1.0, 5.0, nan, -2.0]}
        p = str(tmp_path / "nanstats.parquet")
        write_parquet(p, [("v", "double")], cols)
        stats = decode_rowgroup_stats(read_footer_bytes(p), "v")
        mn = _struct.unpack("<d", stats[0]["min_raw"])[0]
        mx = _struct.unpack("<d", stats[0]["max_raw"])[0]
        assert (mn, mx) == (-2.0, 5.0)
        assert not math.isnan(mn) and not math.isnan(mx)

    def test_all_nan_page_omits_page_index(self, tmp_path):
        from metricproxy_spark.sources.parquet_footer import (
            read_footer_bytes,
        )
        from metricproxy_spark.sources.parquet_index import (
            column_chunk_indexes,
        )
        from metricproxy_spark.sources.parquet_writer import write_parquet

        nan = float("nan")
        # page 0 is all-NaN -> the chunk's bounds would be lies; the
        # writer must omit the pair, and the reader's None contract
        # (r13 ADVICE fix) reports it cleanly
        cols = {"v": [nan] * 10 + [float(i) for i in range(10)]}
        p = str(tmp_path / "nanpage.parquet")
        write_parquet(p, [("v", "double")], cols, page_rows=10)
        meta = column_chunk_indexes(read_footer_bytes(p), "v")[0]
        assert meta["offset_index"] is None
        assert meta["column_index"] is None
        # chunk-LEVEL stats still exist (NaN-skipped, not omitted)
        import pyarrow.parquet as pq

        got = pq.read_table(p).column("v").to_pylist()
        assert got[10:] == [float(i) for i in range(10)]

    def test_bloom_negative_zero_no_false_negative(self, tmp_path):
        from metricproxy_spark.sources.parquet_footer import (
            read_footer_bytes,
        )
        from metricproxy_spark.sources.parquet_index import (
            bloom_hash_double,
            column_chunk_indexes,
            read_bloom_filter,
        )
        from metricproxy_spark.sources.parquet_writer import write_parquet

        cols = {"v": [0.0, -0.0, 1.5, -0.0, 2.5]}
        p = str(tmp_path / "zerobloom.parquet")
        write_parquet(p, [("v", "double")], cols, bloom={"v"})
        meta = column_chunk_indexes(read_footer_bytes(p), "v")[0]
        bf = read_bloom_filter(p, *meta["bloom"])
        # probing EITHER sign of zero must hit (equal values)
        assert bf.might_contain_hash(bloom_hash_double(0.0))
        assert bf.might_contain_hash(bloom_hash_double(-0.0))
        assert bf.might_contain_hash(bloom_hash_double(1.5))

    def test_dv_framing_single_definition(self):
        from metricproxy_spark.sources.roaring import (
            pack_dv_blobs,
            read_dv,
            serialize_rba,
            write_dv_file,
        )

        positions = [[1, 5, 9], [2, 100, 2**33]]
        file_a, descs_a = write_dv_file(positions)
        file_b, descs_b = pack_dv_blobs(
            [serialize_rba(p) for p in positions]
        )
        assert file_a == file_b
        for p, d in zip(positions, descs_b):
            got = read_dv(file_b, d["offset"], d["sizeInBytes"], len(p))
            assert got == set(p)


class TestWriterPropertyRoundtrip:
    def test_randomized_schemas_roundtrip_three_readers(self, tmp_path):
        """Randomized schemas/values (nulls, NaN, unicode, empty
        strings, negative ints, both page versions, all encodings)
        must roundtrip through pyarrow, DuckDB and the own decoder."""
        import math
        import random

        import duckdb
        import pyarrow.parquet as pq

        from metricproxy_spark.sources.parquet_footer import (
            decode_rowgroup_stats,
            read_footer_bytes,
        )
        from metricproxy_spark.sources.parquet_pages import decode_columns
        from metricproxy_spark.sources.parquet_writer import write_parquet

        rng = random.Random(2024)
        strings = ["", "a", "längere-zeichen", "共通接頭辞", "x" * 300]
        for case in range(6):
            n = rng.choice([1, 7, 100, 1333])
            pver = 1 + (case % 2)
            cols = {
                "i": [rng.randrange(-(2**62), 2**62) for _ in range(n)],
                "s": [
                    rng.choice(strings) + str(rng.randrange(100))
                    for _ in range(n)
                ],
                "d": [
                    rng.choice([rng.uniform(-1e9, 1e9), float("nan")])
                    for _ in range(n)
                ],
                "o": [
                    None if rng.random() < 0.3 else rng.randrange(10**6)
                    for _ in range(n)
                ],
            }
            schema = [
                ("i", "int64"),
                ("s", "string"),
                ("d", "double"),
                ("o", "int64"),
            ]
            kwargs = {}
            if pver == 2 and case % 3 == 0:
                kwargs["column_encoding"] = {
                    "s": "delta_byte_array",
                    "d": "byte_stream_split",
                }
            elif rng.random() < 0.5:
                kwargs["dictionary"] = {"s"} if n > 1 else frozenset()
            p = str(tmp_path / f"prop{case}.parquet")
            write_parquet(
                p,
                schema,
                cols,
                nullable={"o"},
                row_group_rows=rng.choice([64, 500, 10**6]),
                page_rows=rng.choice([32, 256, 10**6]),
                codec=rng.choice(["uncompressed", "zstd"]),
                data_page_version=pver,
                **kwargs,
            )
            t = pq.read_table(p)
            assert t.column("i").to_pylist() == cols["i"], case
            assert t.column("s").to_pylist() == cols["s"], case
            assert t.column("o").to_pylist() == cols["o"], case
            got_d = t.column("d").to_pylist()
            assert len(got_d) == n
            for a, b in zip(got_d, cols["d"]):
                assert (a == b) or (math.isnan(a) and math.isnan(b))
            dk = duckdb.sql(
                f"SELECT count(*), sum(i), count(o)"
                f" FROM read_parquet('{p}')"
            ).fetchone()
            assert dk == (
                n,
                sum(cols["i"]),
                sum(v is not None for v in cols["o"]),
            ), case
            n_rgs = len(decode_rowgroup_stats(read_footer_bytes(p), "i"))
            seen_i, seen_s = [], []
            for rg in range(n_rgs):
                dec = decode_columns(p, ["i", "s", "o"], rg)
                seen_i.extend(dec["i"])
                seen_s.extend(b.decode() for b in dec["s"])
            assert seen_i == cols["i"], case
            assert seen_s == cols["s"], case
