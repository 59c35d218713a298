"""Streaming observability (SURVEY §2.4 A6): the reference's generator
tracks events/min throughput by hand (reference generator.py:214-262);
Structured Streaming surfaces the same accounting per micro-batch through
StreamingQueryListener / lastProgress. This module is the thin engine-side
collector: rates per batch and a cumulative summary, no driver-side loops
over data."""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQueryListener


@dataclass
class ThroughputStats:
    batches: int = 0
    total_rows: int = 0
    rows_per_sec: list[float] = field(default_factory=list)

    @property
    def mean_rate(self) -> float:
        return (
            sum(self.rows_per_sec) / len(self.rows_per_sec)
            if self.rows_per_sec
            else 0.0
        )


class ThroughputListener(StreamingQueryListener):
    """Collects per-batch row counts and processing rates for every query
    on the session — the engine analog of the reference's events/min
    counter, fed by the engine's own progress events instead of client-side
    arithmetic."""

    def __init__(self) -> None:
        self.stats: dict[str, ThroughputStats] = {}

    def onQueryStarted(self, event) -> None:  # noqa: N802 (Spark API)
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        p = event.progress
        s = self.stats.setdefault(p.name or p.id, ThroughputStats())
        s.batches += 1
        s.total_rows += p.numInputRows
        if p.processedRowsPerSecond is not None:
            s.rows_per_sec.append(p.processedRowsPerSecond)

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        pass

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass


def attach(spark: SparkSession) -> ThroughputListener:
    listener = ThroughputListener()
    spark.streams.addListener(listener)
    return listener


def detach(spark: SparkSession, listener: ThroughputListener) -> None:
    spark.streams.removeListener(listener)
