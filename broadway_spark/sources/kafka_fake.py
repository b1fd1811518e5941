"""File-backed fake Kafka broker — an embedded-broker test double.

The reference's connector packages are exercised against in-memory /
embedded brokers in their test suites; this plays that role for the S6
connector here (no broker and no spark-sql-kafka jars in the test
environment). The fake is a custom Python ``DataSource`` that emits
EXACTLY the Spark Kafka source schema::

    key binary, value binary, topic string, partition int,
    offset long, timestamp timestamp, timestampType int

so ``KafkaSource``'s envelope projection (``kafka.py``) runs unchanged
on top of it — the projection, offsets-as-acks via checkpoint, restart
resume, and maxOffsetsPerTrigger admission are all testable for real.

Broker layout on disk::

    <path>/<topic>/<partition>.jsonl     # one record per line:
        {"key": str|null, "value": str, "ts": iso-timestamp}

Offsets are line numbers per (topic, partition) — append-only, exactly
Kafka's log model. ``maxOffsetsPerTrigger`` is a total cap distributed
over partitions proportionally to lag (Spark's Kafka source does the
same rate-limit split).
"""

from __future__ import annotations

import json
import os
from datetime import datetime

from pyspark.sql import SparkSession
from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import StructType

FAKE_KAFKA_FORMAT = "fake_kafka"

KAFKA_RECORD_DDL = (
    "key binary, value binary, topic string, partition int, "
    "offset long, timestamp timestamp, timestampType int"
)


def _tp_files(path: str, topics: list[str]) -> dict[str, str]:
    """{'topic/partition': file} for every partition log on disk."""
    out = {}
    for t in topics:
        tdir = os.path.join(path, t)
        try:
            names = sorted(f for f in os.listdir(tdir) if f.endswith(".jsonl"))
        except FileNotFoundError:
            continue
        for f in names:
            out[f"{t}/{f[: -len('.jsonl')]}"] = os.path.join(tdir, f)
    return out


def _count_lines(fn: str) -> int:
    with open(fn, "rb") as fh:
        return sum(1 for line in fh if line.strip())


class _FakeKafkaPartition(InputPartition):
    def __init__(self, file: str, topic: str, partition: int, start: int, end: int):
        self.file = file
        self.topic = topic
        self.partition = partition
        self.start = start
        self.end = end


class _FakeKafkaStreamReader(DataSourceStreamReader):
    def __init__(self, schema: StructType, options: dict):
        self.path = options["path"]
        self.topics = [t.strip() for t in options["topics"].split(",") if t.strip()]
        self.cap = int(options.get("max_offsets_per_trigger", 0)) or None

    def initialOffset(self) -> dict:
        return {tp: 0 for tp in _tp_files(self.path, self.topics)}

    def latestOffset(self) -> dict:
        prev = getattr(self, "_last_end", None) or self.initialOffset()
        files = _tp_files(self.path, self.topics)
        counts = {tp: _count_lines(fn) for tp, fn in files.items()}
        lags = {
            tp: max(0, counts[tp] - prev.get(tp, 0)) for tp in counts
        }
        total_lag = sum(lags.values())
        if self.cap is None or total_lag <= self.cap:
            end = {tp: prev.get(tp, 0) + lags[tp] for tp in counts}
        else:
            # Proportional rate-limit split (Spark Kafka source
            # semantics): each partition advances by lag * cap /
            # total_lag, remainder given to the laggiest partitions.
            end = {}
            admitted = {
                tp: (lags[tp] * self.cap) // total_lag for tp in counts
            }
            leftover = self.cap - sum(admitted.values())
            for tp in sorted(counts, key=lambda x: -lags[x]):
                if leftover <= 0:
                    break
                if admitted[tp] < lags[tp]:
                    admitted[tp] += 1
                    leftover -= 1
            end = {tp: prev.get(tp, 0) + admitted[tp] for tp in counts}
        self._last_end = end
        return end

    def partitions(self, start: dict, end: dict):
        files = _tp_files(self.path, self.topics)
        parts = []
        for tp, fn in files.items():
            lo, hi = start.get(tp, 0), end.get(tp, 0)
            if hi > lo:
                topic, p = tp.rsplit("/", 1)
                parts.append(_FakeKafkaPartition(fn, topic, int(p), lo, hi))
        # Spark requires ≥1 partition even for an empty range.
        return parts or [_FakeKafkaPartition("", "", 0, 0, 0)]

    def read(self, partition: _FakeKafkaPartition):
        if not partition.file:
            return
        idx = 0
        with open(partition.file, "r", encoding="utf-8") as fh:
            for line in fh:
                line = line.strip()
                if not line:
                    continue
                if idx >= partition.end:
                    return
                if idx >= partition.start:
                    rec = json.loads(line)
                    key = rec.get("key")
                    yield (
                        key.encode() if isinstance(key, str) else key,
                        rec["value"].encode(),
                        partition.topic,
                        partition.partition,
                        idx,
                        datetime.fromisoformat(rec["ts"]),
                        0,  # CreateTime
                    )
                idx += 1

    def commit(self, end: dict) -> None:
        # Offsets-as-acks: journal the committed per-partition offsets
        # (the checkpoint commit log is authoritative; this is the
        # broker-visible record, like Kafka group-offset commits).
        with open(os.path.join(self.path, "_commits.jsonl"), "a") as fh:
            fh.write(json.dumps({"committed": end}) + "\n")
        self._last_end = {
            tp: max((getattr(self, "_last_end", None) or {}).get(tp, 0), v)
            for tp, v in end.items()
        } | {
            tp: v
            for tp, v in (getattr(self, "_last_end", None) or {}).items()
            if tp not in end
        }

    def stop(self) -> None:
        pass


class FakeKafkaDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return FAKE_KAFKA_FORMAT

    def schema(self) -> str:
        return KAFKA_RECORD_DDL

    def streamReader(self, schema: StructType) -> _FakeKafkaStreamReader:
        return _FakeKafkaStreamReader(schema, dict(self.options))


def register_fake_kafka(spark: SparkSession) -> None:
    spark.dataSource.register(FakeKafkaDataSource)


class FakeKafkaBroker:
    """Test-side producer handle for the fake broker directory."""

    def __init__(self, path: str):
        self.path = path

    def produce(
        self,
        topic: str,
        partition: int,
        records: list[tuple[str | None, str]],
        ts: str = "2026-01-01T00:00:00",
    ) -> None:
        """Append (key, value) records to a partition log."""
        tdir = os.path.join(self.path, topic)
        os.makedirs(tdir, exist_ok=True)
        with open(
            os.path.join(tdir, f"{partition}.jsonl"), "a", encoding="utf-8"
        ) as fh:
            for key, value in records:
                fh.write(
                    json.dumps({"key": key, "value": value, "ts": ts}) + "\n"
                )
