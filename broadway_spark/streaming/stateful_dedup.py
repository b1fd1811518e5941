"""Unbounded exact streaming dedup — transformWithStateInPandas.

``operators.dedup.dedup_stream`` covers the watermark-bounded case
(``dropDuplicatesWithinWatermark`` — state is GC'd past the
watermark, so a duplicate arriving later than the watermark delay
slips through). This operator is the EXACT complement: per-key
ValueState that never expires, so a key is emitted exactly once for
the lifetime of the stream, across micro-batches and restarts (state
lives in the checkpointed state store).

100 TB framing: state is one boolean row per DISTINCT key, sharded by
the same key hash that shuffles the input — with the RocksDB provider
that's disk-backed per executor, so capacity scales with cluster disk,
not heap. For corpus dedup, key on the md5 ``fingerprint`` (32 bytes/
distinct doc); 1B distinct docs ≈ 50 GB of state across the fleet.
An optional ``ttl_ms`` turns it into sliding-retention dedup (state
expiring after idle TTL), the middle ground between exact-forever and
watermark-bounded.

First-occurrence semantics within a micro-batch: rows sort by
``order_by`` per key, the first row wins (deterministic, mirroring the
keeper-selection of the batch operator ``exact_dedup_stats``).
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.stateful_processor import (
    ExpiredTimerInfo,
    StatefulProcessor,
    StatefulProcessorHandle,
    TimerValues,
)


class DedupProcessor(StatefulProcessor):
    def __init__(self, order_by: str | None, ttl_ms: int | None):
        self.order_by = order_by
        self.ttl_ms = ttl_ms

    def init(self, handle: StatefulProcessorHandle) -> None:
        if self.ttl_ms is not None:
            self.seen = handle.getValueState("seen", "seen boolean", self.ttl_ms)
        else:
            self.seen = handle.getValueState("seen", "seen boolean")

    def handleInputRows(
        self, key: Any, rows: Iterator[pd.DataFrame], timerValues: TimerValues
    ) -> Iterator[pd.DataFrame]:
        if self.seen.exists():
            # Consume the iterator (protocol requires draining) but
            # emit nothing: the key was already delivered.
            for _ in rows:
                pass
            if self.ttl_ms is not None:
                self.seen.update((True,))  # refresh TTL on re-sight
            return
        first = None
        for pdf in rows:
            if len(pdf) == 0:
                continue
            if self.order_by is not None:
                pdf = pdf.sort_values(self.order_by)
            head = pdf.iloc[:1]
            if first is None or (
                self.order_by is not None
                and head.iloc[0][self.order_by] < first.iloc[0][self.order_by]
            ):
                first = head
        if first is not None:
            self.seen.update((True,))
            yield first.reset_index(drop=True)

    def handleExpiredTimer(
        self, key: Any, timerValues: TimerValues, expiredTimerInfo: ExpiredTimerInfo
    ) -> Iterator[pd.DataFrame]:
        return iter(())

    def close(self) -> None:
        pass


def streaming_exact_dedup(
    df: DataFrame,
    key_cols: list[str],
    order_by: str | None = None,
    ttl_ms: int | None = None,
) -> DataFrame:
    """Streaming DataFrame → first occurrence per key, exactly once for
    the stream's lifetime (or per TTL window when ``ttl_ms`` set).

    Requires the RocksDB state store provider (see
    ``use_rocksdb_state``); the caller's writeStream owns checkpointing.
    """
    out_ddl = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema
    )
    # timeMode 'none' when no TTL: TTL state needs the processing-time
    # clock, but with it the query schedules wall-clock work and an
    # availableNow drain never reaches AVAILABLE_NOW termination (it
    # kept running empty micro-batches — observed 300+ state versions
    # on a one-file input). Without TTL there are no timers, so 'none'
    # both terminates and skips per-batch timer scans.
    return df.groupBy(*key_cols).transformWithStateInPandas(
        statefulProcessor=DedupProcessor(order_by, ttl_ms),
        outputStructType=out_ddl,
        outputMode="append",
        timeMode="none" if ttl_ms is None else "processingTime",
    )


ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state."
    "RocksDBStateStoreProvider"
)
_PROVIDER_CONF = "spark.sql.streaming.stateStore.providerClass"


def use_rocksdb_state(spark: SparkSession) -> None:
    """transformWithState requires the RocksDB provider (typed
    column-family state); the default HDFS-backed provider fails its
    schema validation. Prefer ``scoped_rocksdb_state`` — this session-
    global setter leaks into every LATER streaming query of the
    session (a streaming query captures the conf at START), which the
    r10 bench measured as a broad drain slowdown: HDFS-provider
    drains silently ran on RocksDB after any TWS query had run."""
    spark.conf.set(_PROVIDER_CONF, ROCKSDB_PROVIDER)


def scoped_rocksdb_state(spark: SparkSession):
    """Context manager: RocksDB provider for the queries STARTED
    inside the block, previous provider restored on exit. Safe because
    a streaming query captures the session conf at start() — restoring
    after start() does not affect the running query."""
    from contextlib import contextmanager

    @contextmanager
    def _cm():
        prev = spark.conf.get(_PROVIDER_CONF, None)
        spark.conf.set(_PROVIDER_CONF, ROCKSDB_PROVIDER)
        try:
            yield
        finally:
            if prev is None:
                spark.conf.unset(_PROVIDER_CONF)
            else:
                spark.conf.set(_PROVIDER_CONF, prev)

    return _cm()
