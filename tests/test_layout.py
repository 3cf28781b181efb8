"""Layout/sampling behavior beyond the oracle hash: the z-order
locality property and stratified-sample reproducibility."""

from __future__ import annotations

from metricproxy_spark.queries.layout import (
    layout_stratified_sample,
    layout_zorder_stats,
)


def test_zorder_buckets_are_local(spark, sf_dir):
    """Every z-bucket must cover a narrow range of BOTH grid axes —
    the property that makes min/max row-group stats prunable on either
    predicate. Top-10-bit buckets fix the high 5 bits of each 16-bit
    axis, so a bucket's span is < 2^11 on each axis (one 1/32 slice)."""
    rows = layout_zorder_stats(spark, sf_dir).collect()
    assert len(rows) > 100  # grid quantization actually spread the keys
    for r in rows:
        assert r.max_x - r.min_x < 2048
        assert r.max_y - r.min_y < 2048


def test_stratified_sample_reproducible_and_rated(spark, sf_dir):
    a = layout_stratified_sample(spark, sf_dir)
    b = layout_stratified_sample(spark, sf_dir)
    ra = {tuple(r) for r in a.collect()}
    rb = {tuple(r) for r in b.collect()}
    assert ra == rb  # deterministic: identical membership across runs
    # every sampled row carries its stratum's configured rate
    rates = {r.c_mktsegment: r.rate for r in ra and a.collect()}
    assert rates.get("BUILDING", 20) == 20
    assert all(v in (20, 10, 5, 2) for v in rates.values())


def test_morton_interleave_matches_reference():
    """Property check: the SQL bit-twiddle in zorder_key equals a
    direct Python bit-interleave for random 16-bit pairs."""
    import random

    from pyspark.sql import SparkSession

    from metricproxy_spark.queries.layout import zorder_key

    spark = SparkSession.getActiveSession() or SparkSession.builder.getOrCreate()

    def morton_ref(x: int, y: int) -> int:
        z = 0
        for i in range(16):
            z |= ((x >> i) & 1) << (2 * i)
            z |= ((y >> i) & 1) << (2 * i + 1)
        return z

    rng = random.Random(7)
    pairs = [(rng.randrange(65536), rng.randrange(65536)) for _ in range(64)]
    # BIGINT like the real query's quantized keys — int32 would wrap
    # at bit 31 when y's top bit lands there
    df = spark.createDataFrame(pairs, "x long, y long")
    got = {
        (r.x, r.y): r.z
        for r in df.selectExpr("x", "y", f"{zorder_key('x', 'y')} AS z").collect()
    }
    for x, y in pairs:
        assert got[(x, y)] == morton_ref(x, y)


def test_staged_artifact_gc_removes_stale_fingerprints(sf_dir, tmp_path):
    """An AGED sibling mps_{tag}_{sf}_<old-fp> dir from regenerated
    testdata is swept on the next staged_artifact_dir call; a YOUNG
    sibling (possibly another live process whose different dataset
    shares the sf basename), in-flight *.staging.* dirs and other tags
    are never touched."""
    import os
    import tempfile
    import time

    from metricproxy_spark.io import (
        _GC_AGE_S,
        sf_fingerprint,
        staged_artifact_dir,
    )

    tmp = tempfile.gettempdir()
    sf = os.path.basename(sf_dir.rstrip("/"))
    fp = sf_fingerprint(sf_dir)
    stale_fp = ("0" * 10) if fp != "0" * 10 else ("1" * 10)
    young_fp = ("2" * 10) if fp != "2" * 10 else ("3" * 10)
    stale = os.path.join(tmp, f"mps_gctest_{sf}_{stale_fp}")
    young = os.path.join(tmp, f"mps_gctest_{sf}_{young_fp}")
    staging = os.path.join(tmp, f"mps_gctest_{sf}_{stale_fp}.staging.999")
    other_tag = os.path.join(tmp, f"mps_gctestx_{sf}_{stale_fp}")
    for d in (stale, young, staging, other_tag):
        os.makedirs(d, exist_ok=True)
    old = time.time() - _GC_AGE_S - 60
    os.utime(stale, (old, old))
    try:
        got = staged_artifact_dir("gctest", sf_dir)
        assert got.endswith(fp)
        assert not os.path.isdir(stale), "aged stale generation not swept"
        assert os.path.isdir(young), "young sibling (maybe live) was swept"
        assert os.path.isdir(staging), "in-flight staging dir was swept"
        assert os.path.isdir(other_tag), "foreign tag was swept"
    finally:
        import shutil

        for d in (stale, young, staging, other_tag):
            shutil.rmtree(d, ignore_errors=True)


class TestHilbert:
    """The SQL Hilbert chain vs an independent Python xy2d reference
    (the oracle alone cannot catch a shared bug — both engines run
    the identical CASE text)."""

    @staticmethod
    def _xy2d_ref(order, x, y):
        # Wikipedia "Hilbert curve" xy2d, public-domain convert loop
        d = 0
        s = 1 << (order - 1)
        while s > 0:
            rx = 1 if (x & s) > 0 else 0
            ry = 1 if (y & s) > 0 else 0
            d += s * s * ((3 * rx) ^ ry)
            if ry == 0:
                if rx == 1:
                    x = s - 1 - x
                    y = s - 1 - y
                x, y = y, x
            s //= 2
        return d

    def test_sql_chain_matches_reference(self, spark):
        from metricproxy_spark.queries.layout import (
            _HILBERT_ORDER,
            _hilbert_level_sql,
        )

        pts = [(x, y) for x in range(0, 256, 17) for y in range(0, 256, 23)]
        pts += [(0, 0), (255, 255), (255, 0), (0, 255), (1, 0), (0, 1)]
        cur = spark.createDataFrame(
            [(x, y) for x, y in pts], "hx long, hy long"
        ).selectExpr("hx", "hy", "CAST(0 AS BIGINT) AS hd", "hx AS ox", "hy AS oy")
        for i in range(_HILBERT_ORDER):
            lvl = _hilbert_level_sql(1 << (_HILBERT_ORDER - 1 - i))
            cur = cur.selectExpr(
                f"{lvl['hd']} AS hd",
                f"{lvl['hx']} AS hx",
                f"{lvl['hy']} AS hy",
                "ox",
                "oy",
            )
        got = {(r.ox, r.oy): r.hd for r in cur.collect()}
        for x, y in pts:
            assert got[(x, y)] == self._xy2d_ref(8, x, y), (x, y)

    def test_curve_is_a_bijection_with_unit_steps(self, spark):
        """Full 16x16 grid at order 4: d is a bijection onto [0, 256)
        and consecutive d values are GRID-ADJACENT (|dx|+|dy| = 1) —
        the locality property that beats Z-order's diagonal jumps."""
        ref = {}
        for x in range(16):
            for y in range(16):
                ref[self._xy2d_ref(4, x, y)] = (x, y)
        assert sorted(ref) == list(range(256))
        for d in range(255):
            (x1, y1), (x2, y2) = ref[d], ref[d + 1]
            assert abs(x1 - x2) + abs(y1 - y2) == 1, d
