"""CDC / merge-upsert operators — apply a keyed change stream onto a
snapshot (last-writer-wins, with tombstone deletes).

The reference proxy is append-only (forwarders never update), so this
is engine-extension surface (SURVEY §3.8): the shape every warehouse
ingestion pipeline needs — Delta/Iceberg ``MERGE INTO`` semantics
re-expressed as pure DataFrame ops so they run anywhere Spark runs.

Scale notes:
- The merge is ONE window over the union, partitioned by key — a
  single hash shuffle on the merge key, no join. At 100 TB the base
  snapshot should be bucketed/partitioned by the same key so only
  changed partitions rewrite (see ``upsert_sink`` in
  streaming/sinks.py for the incremental form).
- Priority encoding (changes beat base, later seq beats earlier)
  rides in the same sort — no extra pass.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def latest_snapshot(
    changes: DataFrame,
    keys: Sequence[str],
    seq_cols: Sequence[str],
    delete_predicate: Column | None = None,
) -> DataFrame:
    """Collapse a change stream to its final state: one row per key —
    the one with the highest ``seq_cols`` (last writer wins) — then
    drop rows whose winning version satisfies ``delete_predicate``
    (tombstones). ``seq_cols`` must totally order versions within a
    key (e.g. (ts, event_id))."""
    w = Window.partitionBy(*keys).orderBy(
        *[F.col(c).desc() for c in seq_cols]
    )
    latest = (
        changes.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    if delete_predicate is not None:
        latest = latest.filter(~delete_predicate)
    return latest


def merge_upsert(
    base: DataFrame,
    changes: DataFrame,
    keys: Sequence[str],
    seq_cols: Sequence[str],
    delete_predicate: Column | None = None,
) -> DataFrame:
    """MERGE: apply ``changes`` onto ``base``. Any change beats the
    base row for its key; among changes, last writer (by ``seq_cols``)
    wins; a winning tombstone removes the key. Columns of ``base`` and
    ``changes`` must match (``unionByName``).

    One window over the union — the priority column makes base rows
    sort after every change without a join.
    """
    tagged = base.withColumn("_prio", F.lit(0)).unionByName(
        changes.withColumn("_prio", F.lit(1))
    )
    w = Window.partitionBy(*keys).orderBy(
        F.col("_prio").desc(), *[F.col(c).desc() for c in seq_cols]
    )
    merged = (
        tagged.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_prio")
    )
    if delete_predicate is not None:
        merged = merged.filter(~delete_predicate)
    return merged
