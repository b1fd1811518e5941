"""Test harness — the Spark equivalents of Broadway's first-class
testing utilities, which the reference ships as library code and
documents in their own section (``lib/broadway.ex:379-523``):

- ``DummySource`` ≈ ``Broadway.DummyProducer``
  (``lib/broadway/dummy_producer.ex:1-20``): a source that emits
  nothing on its own and only carries what tests push into it.
- ``run_test_batch`` / ``run_test_message`` ≈ ``Broadway.test_batch``
  / ``test_message`` (``lib/broadway.ex:1334-1445``): wrap plain
  dicts as messages, run ONE availableNow drain of the full pipeline
  against temp sinks, and hand back the successful/failed ack groups
  — the ``assert_receive {:ack, ref, successful, failed}`` analogue
  (``lib/broadway/caller_acknowledger.ex:40-56``).

Replicated semantics: ``test_message``/``test_batch`` force
``batch_mode: :flush`` (``broadway.ex:1374-1380``) so assertions never
wait on batch size or timers; pass ``batch_mode='bulk'`` to exercise
real batching (the ``test_batch`` opt-out, ``broadway.ex:1418-1427``).
"""

from __future__ import annotations

import dataclasses
import tempfile
import uuid
from dataclasses import dataclass
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from broadway_spark.config import SinkConfig, TopologyConfig
from broadway_spark.plans import Pipeline
from broadway_spark.sources.spool import SpoolSource


class DummySource(SpoolSource):
    """A producer that produces nothing until a test pushes messages
    (``push_messages``) — Broadway.DummyProducer, spool-backed."""

    def __init__(self, schema_ddl: str, ack_data_column: str, path: str | None = None):
        super().__init__(
            name=f"dummy_{uuid.uuid4().hex[:8]}",
            path=path or tempfile.mkdtemp(prefix="broadway_dummy_"),
            schema_ddl=schema_ddl,
            ack_data_column=ack_data_column,
        )


@dataclass
class AckResult:
    """What the caller acknowledger reports back: per-message outcomes
    plus the raw sink contents for deeper assertions."""

    successful: list[dict]
    failed: list[dict]
    ack_log: list[dict]
    sinks: dict[str, DataFrame]
    dlq: DataFrame | None

    @property
    def successful_ids(self) -> set[str]:
        return {r["ack_data"] for r in self.successful}

    @property
    def failed_ids(self) -> set[str]:
        return {r["ack_data"] for r in self.failed}


def _with_temp_io(config: TopologyConfig, workdir: str) -> TopologyConfig:
    sinks = dict(config.sinks)
    for name in config.batchers:
        if name not in sinks:
            sinks[name] = SinkConfig(path=f"{workdir}/sink_{name}")
    if not config.batchers and "default" not in sinks:
        sinks["default"] = SinkConfig(path=f"{workdir}/sink_default")
    return dataclasses.replace(
        config,
        name=f"{config.name}_test_{uuid.uuid4().hex[:6]}",
        sinks=sinks,
        dlq=config.dlq or SinkConfig(path=f"{workdir}/dlq"),
        ack_log=SinkConfig(path=f"{workdir}/ack"),
        checkpoint_dir=f"{workdir}/ckpt",
    )


def run_test_batch(
    spark: SparkSession,
    config: TopologyConfig,
    schema_ddl: str,
    messages: list[dict[str, Any]],
    batch_mode: str = "flush",
    timeout_s: int = 300,
) -> AckResult:
    """Push ``messages`` through the full pipeline once and return the
    ack outcomes (``Broadway.test_batch``). The pipeline runs with
    temp sinks/DLQ/ack-log/checkpoint; the caller's config is not
    mutated. ``batch_mode='flush'`` (default) delivers everything
    immediately, mirroring ``broadway.ex:1374-1380``."""
    workdir = tempfile.mkdtemp(prefix="broadway_test_")
    cfg = _with_temp_io(config, workdir)

    if batch_mode == "flush":
        user_hm = cfg.handle_message

        def flush_all(df: DataFrame) -> DataFrame:
            out = user_hm(df) if user_hm else df
            return out.withColumn("batch_mode", F.lit("flush"))

        cfg = dataclasses.replace(cfg, handle_message=flush_all)

    source = DummySource(
        schema_ddl=schema_ddl,
        ack_data_column=config.order_by if config.order_by != "ack_data" else
        next(iter(f.split()[0] for f in schema_ddl.split(","))),
        path=f"{workdir}/spool",
    )
    source.push_messages(messages, "000.jsonl")
    Pipeline(cfg, source).run_to_completion(spark, timeout_s=timeout_s)

    ack_rows = [r.asDict() for r in spark.read.parquet(cfg.ack_log.path).collect()]
    sinks: dict[str, DataFrame] = {}
    for name, s in cfg.sinks.items():
        try:
            sinks[name] = spark.read.parquet(s.path)
        except Exception:
            pass  # sink never received rows
    try:
        dlq = spark.read.parquet(cfg.dlq.path)
    except Exception:
        dlq = None
    return AckResult(
        successful=[r for r in ack_rows if r["outcome"] == "ok"],
        failed=[r for r in ack_rows if r["outcome"] == "failed"],
        ack_log=ack_rows,
        sinks=sinks,
        dlq=dlq,
    )


def run_test_message(
    spark: SparkSession,
    config: TopologyConfig,
    schema_ddl: str,
    message: dict[str, Any],
    **kwargs: Any,
) -> AckResult:
    """Single-message variant (``Broadway.test_message``,
    ``broadway.ex:1334-1380``)."""
    return run_test_batch(spark, config, schema_ddl, [message], **kwargs)
