"""Testdata loaders (SURVEY Phase 0).

The driver generates a TPC-H-ish star schema plus ``events`` (the
stream-shaped table standing in for the reference's datapoint stream),
``documents`` and ``embeddings`` (LLM-pipeline fixtures) as parquet
under /root/testdata/sf{0.001,0.01,0.1}/.

Loads are plain ``spark.read.parquet`` — column pruning and predicate
pushdown reach the scan automatically when queries select/filter on the
returned DataFrames (verify with ``df.explain``: ``ReadSchema`` /
``PushedFilters``).
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_SHIPPED_SESSIONS: set[int] = set()


def ensure_package_on_workers(spark: SparkSession) -> None:
    """Ship this package to executor Python workers via ``addPyFile``.

    Cloudpickled UDFs/closures reference module-level symbols by import
    path, so workers must be able to ``import metricproxy_spark`` — which
    isn't guaranteed when the driver process found the repo via a
    ``sys.path`` hack (driver sys.path does not propagate to workers).
    Zipping the package once per session and registering it with
    ``addPyFile`` makes every query self-contained on any cluster.
    """
    key = id(spark.sparkContext)
    if key in _SHIPPED_SESSIONS:
        return
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    base = os.path.join(
        tempfile.gettempdir(), f"metricproxy_spark_pkg_{os.getpid()}"
    )
    zip_path = base + ".zip"
    if not os.path.exists(zip_path):
        staging = tempfile.mkdtemp(prefix="mps_pkg_")
        shutil.copytree(pkg_dir, os.path.join(staging, "metricproxy_spark"))
        shutil.make_archive(base, "zip", staging)
        shutil.rmtree(staging, ignore_errors=True)
    spark.sparkContext.addPyFile(zip_path)
    _SHIPPED_SESSIONS.add(key)

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


# GC grace period for superseded staged artifacts: siblings younger
# than this are presumed live in another process and left alone.
_GC_AGE_S = 6 * 3600


def sf_fingerprint(sf_dir: str) -> str:
    """Short content fingerprint of an sf testdata directory.

    Hashes every parquet file's (relative path, size, mtime_ns), so
    REGENERATED testdata under the same sf name yields a different
    value. Shared staged artifacts (wire dirs, SemDeDup assignment,
    bucketed layouts) embed this in their path — a stale cache from a
    prior testdata generation is then simply never found, instead of
    silently reused (round-4 ADVICE). Cost: one os.stat per table.
    """
    import hashlib

    h = hashlib.sha256()
    root = sf_dir.rstrip("/")
    for name in sorted(os.listdir(root)):
        if not name.endswith(".parquet"):
            continue
        p = os.path.join(root, name)
        if os.path.isdir(p):  # spark-style parquet dir: stat its parts
            for part in sorted(os.listdir(p)):
                st = os.stat(os.path.join(p, part))
                h.update(f"{name}/{part}:{st.st_size}:{st.st_mtime_ns};".encode())
        else:
            st = os.stat(p)
            h.update(f"{name}:{st.st_size}:{st.st_mtime_ns};".encode())
    return h.hexdigest()[:10]


def staged_artifact_dir(tag: str, sf_dir: str) -> str:
    """Canonical path for a shared derived artifact of ``sf_dir``:
    ``$TMP/mps_{tag}_{sf}_{fingerprint}``. Callers write to a private
    staging dir and publish with ``os.rename`` (atomic on one fs);
    concurrent losers delete their copy — identical by construction.

    Superseded generations are garbage-collected here: a sibling
    ``mps_{tag}_{sf}_<other-fp>`` dir usually belongs to REGENERATED
    testdata and is best-effort removed so /tmp doesn't accumulate one
    orphan per generation. But the sf BASENAME is not unique across
    checkouts — a second process whose different ``sf0.1`` dataset is
    live right now would lose its artifact mid-read. So only siblings
    whose mtime is older than ``_GC_AGE_S`` are removed; anything
    younger is presumed live. In-flight ``*.staging.*`` dirs are never
    touched (length filter).
    """
    sf = os.path.basename(sf_dir.rstrip("/"))
    fp = sf_fingerprint(sf_dir)
    prefix = f"mps_{tag}_{sf}_"
    tmp = tempfile.gettempdir()
    import shutil
    import time

    now = time.time()
    try:
        for name in os.listdir(tmp):
            if (
                name.startswith(prefix)
                and name != prefix + fp
                and len(name) == len(prefix) + len(fp)
            ):
                p = os.path.join(tmp, name)
                try:
                    if now - os.stat(p).st_mtime < _GC_AGE_S:
                        continue
                except OSError:
                    continue
                shutil.rmtree(p, ignore_errors=True)
    except OSError:
        pass
    return os.path.join(tmp, prefix + fp)


# Inferred-schema memo: spark.read.parquet() re-reads the footer and
# re-infers the schema on EVERY call (~120-200 ms each on this box, vs
# ~35 ms when the reader is given the schema). The schema of a testdata
# or staged-artifact parquet file is static metadata — a real engine
# holds it in a catalog — so infer it once per (paths, size, mtime) and
# hand it to every subsequent reader. Keyed by the PATH TUPLE with the
# file-stat stamp stored in the value: a REGENERATED file's new stamp
# mismatches and re-infers (never served stale), and re-inserting under
# the same path set REPLACES the superseded entry, so the memo stays
# bounded by the number of distinct path sets (r14 ADVICE: the old
# stamp-in-key layout leaked one dead entry per regeneration). Nothing
# about query *results* is cached (the scan itself still runs from the
# parquet bytes each time), and the memo lives only in the driver
# process.
_SCHEMA_CACHE: dict[tuple, tuple] = {}


def _path_stamp(path: str) -> tuple | None:
    """(size, mtime_ns) fingerprint of a file/dir/glob, or ``None``
    when the path can't be stamped reliably — an empty glob match (a
    literal '[' in a plain path routes here too) or a file vanishing
    between list and stat (e.g. another process's staged-artifact GC).
    Callers treat None as uncacheable and fall back to a plain
    inference read (r14 ADVICE)."""
    try:
        if any(c in path for c in "*?["):  # glob: stat every match
            import glob as _glob

            matches = sorted(_glob.glob(path))
            if not matches:
                return None
            return tuple(
                (p, st.st_size, st.st_mtime_ns)
                for p in matches
                for st in (os.stat(p),)
            )
        if os.path.isdir(path):  # spark-style parquet dir: stat parts
            return tuple(
                (part, st.st_size, st.st_mtime_ns)
                for part in sorted(os.listdir(path))
                for st in (os.stat(os.path.join(path, part)),)
            )
        st = os.stat(path)
        return (st.st_size, st.st_mtime_ns)
    except OSError:
        return None


def read_parquet_cached(spark: SparkSession, *paths: str) -> DataFrame:
    """``spark.read.parquet(*paths)`` with the inferred schema memoized
    per (path, file-stat) so repeat invocations skip footer inference.
    Identical result by construction: the memo stores exactly what
    inference produced for these bytes and every scan still reads the
    parquet data per invocation."""
    stamp = tuple(_path_stamp(p) for p in paths)
    if any(s is None for s in stamp):  # unstampable: read uncached
        return spark.read.parquet(*paths)
    key = ("parquet",) + paths
    hit = _SCHEMA_CACHE.get(key)
    if hit is not None and hit[0] == stamp:
        schema = hit[1]
    else:
        schema = spark.read.parquet(*paths).schema
        _SCHEMA_CACHE[key] = (stamp, schema)
    return spark.read.schema(schema).parquet(*paths)


# Back-compat internal alias (load_table's original single-path helper).
_read_parquet_cached = read_parquet_cached


def read_json_cached(spark: SparkSession, *paths: str) -> DataFrame:
    """``spark.read.json(list(paths))`` with the inferred schema
    memoized per (path, file-stat). JSON schema inference costs a FULL
    extra pass over the files (a separate Spark job); the staged commit
    logs this reads are static artifacts, so the memo removes that job
    on repeat invocations. It stores exactly what inference produced —
    downstream ``"add" in df.columns`` checks see the identical schema
    — and the data pass still reads the JSON bytes per invocation."""
    stamp = tuple(_path_stamp(p) for p in paths)
    if any(s is None for s in stamp):  # unstampable: read uncached
        return spark.read.json(list(paths))
    key = ("json",) + paths
    hit = _SCHEMA_CACHE.get(key)
    if hit is not None and hit[0] == stamp:
        schema = hit[1]
    else:
        schema = spark.read.json(list(paths)).schema
        _SCHEMA_CACHE[key] = (stamp, schema)
    return spark.read.schema(schema).json(list(paths))


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    ensure_package_on_workers(spark)
    if name not in TABLES:
        raise ValueError(f"unknown table {name!r}; expected one of {TABLES}")
    if name == "events":
        # events.ts has shipped as two physical types across testdata
        # generations: parquet TIMESTAMP(NANOS) (which Spark 4 only reads
        # via the nanosAsLong legacy conf, as raw int64 nanos) and plain
        # TIMESTAMP(MICROS) (read as TIMESTAMP_NTZ). Detect which we got
        # and normalize both to a session-local TIMESTAMP truncated to
        # microseconds — DuckDB's TIMESTAMP is us-precision and naive, so
        # oracle comparisons agree either way (sessions run tz=UTC).
        # The conf is set BEFORE the (possibly memoized) schema read so
        # inference always happens under nanosAsLong=true.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = _read_parquet_cached(spark, table_path(sf_dir, name))
        ts_type = dict(df.dtypes).get("ts", "")
        if ts_type in ("bigint", "long"):
            return df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
        if ts_type == "timestamp_ntz":
            return df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df
    return _read_parquet_cached(spark, table_path(sf_dir, name))


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def spread(df: DataFrame, spark: SparkSession) -> DataFrame:
    """Normalize parallelism before a CPU-heavy narrow transform.

    A parquet scan yields one partition per ~maxPartitionBytes of input,
    so a small (or unsplittable, e.g. gzip) file parses on ONE core no
    matter how wide the cluster is. When the source produced fewer
    splits than the cluster has slots, a round-robin repartition (a few
    MB over the wire) buys a cores-wide stage for the expensive
    JSON/protobuf/string work that follows. At 100 TB the scan already
    produces thousands of splits and this is a no-op — the guard keeps
    it from injecting a shuffle where the source is already wide."""
    target = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
