"""The proxy pipeline: demultiplex, buffer, count, drain (F1–F7).

Reference shape [P: protocol/demultiplexer/demultiplexer.go —
Demultiplexer.AddDatapoints; dp/dpbuffered/bufferedforwarder.go —
BufferedForwarder; main.go — setupForwarders]:

    listener → counter middleware → demultiplexer → per-sink
    bounded buffer → N drain goroutines → forwarder

Spark mapping implemented here:

- **Fan-out (F1)**: one ``foreachBatch`` that persists the micro-batch
  and hands it to every sink — one source scan per batch regardless of
  sink count, exactly the demultiplexer's "loop over sinks" with the
  slice shared.
- **Counters (A1/F7)**: per-batch, per-sink row counts accumulated
  driver-side (``foreachBatch`` runs on the driver) — the analog of the
  proxy's atomic ``TotalDatapoints`` counters, queryable at any time
  via :meth:`ProxyPipeline.stats_df`.
- **Load shedding (F2)**: the reference *drops* datapoints past
  ``BufferSize`` rather than block the listener. Spark's backpressure
  is pull-based (a slow sink slows the trigger, nothing is lost), so
  shedding is opt-in emulation: ``max_batch_rows`` caps each
  micro-batch with ``limit`` and counts the dropped remainder —
  semantics documented as *approximate* (drop choice is arbitrary,
  like the reference's "whatever overflowed").
- **Per-sink isolation (F5)**: ``independent=True`` starts one
  streaming query per sink, each with its own checkpoint subdir and
  trigger — a slow sink then only delays itself (the buffered-forwarder
  property). The default shared-batch mode matches the reference's
  synchronous demux instead.
- **Graceful drain (F6)**: ``run_available_now`` = process everything
  then stop, the SIGTERM drain path.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

BatchWriter = Callable[[DataFrame, int], None]


@dataclass
class SinkSpec:
    """A named terminal for the fan-out; ``writer`` receives each
    (batch_df, batch_id) — the ``dpsink.Sink.AddDatapoints`` analog."""

    name: str
    writer: BatchWriter


OBSERVATION_NAME = "proxy_stats"


@dataclass
class ProxyPipeline:
    source: DataFrame
    transform: Callable[[DataFrame], DataFrame] | None = None
    sinks: list[SinkSpec] = field(default_factory=list)
    max_batch_rows: int | None = None
    stats: dict[str, int] = field(default_factory=dict)
    # live network endpoints feeding this pipeline's sources (e.g. the
    # HTTP ingest listener a config's ListenAddr starts); owned by the
    # caller — see close_listeners()
    live_listeners: list = field(default_factory=list)

    def close_listeners(self) -> None:
        """Stop every live network endpoint attached by build_pipeline
        (idempotent; drain the stream first for exactly-once intake)."""
        for lis in self.live_listeners:
            lis.stop()

    def _count(self, key: str, n: int) -> None:
        self.stats[key] = self.stats.get(key, 0) + n

    def _observed_source(self) -> DataFrame:
        """A1 the Spark way: attach an ``observe`` to the source so
        every micro-batch reports row/value counters through
        ``StreamingQueryProgress.observedMetrics`` — the exact analog
        of the reference's lock-free stat counters read by the stats
        loop [P: golib dpsink/counter.go — Counter]. Zero extra jobs:
        metrics ride the batch's existing action."""
        from pyspark.sql import functions as F

        return self.source.observe(
            OBSERVATION_NAME,
            F.count(F.lit(1)).alias("datapoints"),
            F.sum(F.lit(1) * 0).alias("_zero"),  # schema anchor
        )

    def drain_observed_metrics(self, query) -> dict[str, int]:
        """Fold every progress event's observed metrics into stats
        (call after awaitTermination; also usable live)."""
        total = 0
        for p in query.recentProgress:
            om = (p or {}).get("observedMetrics", {}).get(
                OBSERVATION_NAME
            )
            if om is not None:  # a Row (batch) — index, don't .get
                total += int(om["datapoints"])
        if total:
            self.stats["observed_datapoints"] = (
                self.stats.get("observed_datapoints", 0) + total
            )
        return dict(self.stats)

    def _process_batch(self, batch: DataFrame, batch_id: int) -> None:
        df = self.transform(batch) if self.transform else batch
        # Persist once, serve all sinks: the demultiplexer's shared
        # slice. Count via the persisted data (one job; sinks reuse).
        # Capture the persisted handle BEFORE the limit() shedding path
        # reassigns df, and unpersist that same handle — otherwise every
        # transformed micro-batch leaks its cached blocks for the life
        # of the stream (cache debt that eventually evicts/OOMs).
        persisted = df.persist()
        try:
            n = persisted.count()
            self._count("datapoints_in", n)
            if self.max_batch_rows is not None and n > self.max_batch_rows:
                # F2 emulation: shed everything past the cap, count it —
                # the buffered forwarder's drop-on-overflow.
                self._count("datapoints_dropped", n - self.max_batch_rows)
                df = persisted.limit(self.max_batch_rows)
                n = self.max_batch_rows
            for sink in self.sinks:
                sink.writer(df, batch_id)
                self._count(f"sink.{sink.name}.datapoints", n)
        finally:
            persisted.unpersist()

    def start(
        self,
        checkpoint_dir: str,
        independent: bool = False,
        available_now: bool = True,
        processing_time: str | None = None,
    ) -> list[StreamingQuery]:
        """Start the pipeline; returns the running queries (one in
        shared mode, one per sink in independent mode).

        ``available_now=True`` (default) drains and stops (F6);
        ``available_now=False`` runs continuously on a
        ``processing_time`` trigger (default "5 seconds") — the daemon
        mode `serve` uses."""

        def with_trigger(writer):
            if available_now:
                return writer.trigger(availableNow=True)
            return writer.trigger(
                processingTime=processing_time or "5 seconds"
            )

        if not independent:
            q = (
                with_trigger(
                    self._observed_source().writeStream.foreachBatch(
                        self._process_batch
                    ).option(
                        "checkpointLocation",
                        os.path.join(checkpoint_dir, "demux"),
                    )
                )
                .start()
            )
            return [q]
        queries = []
        for sink in self.sinks:
            def per_sink(batch: DataFrame, batch_id: int, _s=sink) -> None:
                df = self.transform(batch) if self.transform else batch
                _s.writer(df, batch_id)
                self._count(f"sink.{_s.name}.datapoints", df.count())

            q = (
                with_trigger(
                    self.source.writeStream.foreachBatch(per_sink).option(
                        "checkpointLocation",
                        os.path.join(checkpoint_dir, f"sink_{sink.name}"),
                    )
                )
                .start()
            )
            queries.append(q)
        return queries

    def run_available_now(self, checkpoint_dir: str, independent: bool = False) -> dict[str, int]:
        """Drain everything currently available and stop (F6); returns
        the counter snapshot."""
        for q in self.start(checkpoint_dir, independent=independent):
            q.awaitTermination()
            if not independent:
                self.drain_observed_metrics(q)
        return dict(self.stats)
