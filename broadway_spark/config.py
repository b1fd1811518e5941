"""Topology configuration — validated dataclasses.

Replicates the semantics of the reference's NimbleOptions schema
(``lib/broadway/options.ex``) and the extra semantic checks in
``Broadway.start_link`` (``lib/broadway.ex:1141-1182``):

- exactly one processor layer (``topology.ex:269-271``)
- batch_size > 0, or a budget splitter (the ``{init_acc, fun}`` form,
  ``options.ex:233-264``, expressed here as a (weight_column, budget)
  pair)
- rate limiting: allowed_messages per interval_ms (``options.ex:98-128``)
- partition_by carried down to processors and batchers unless they
  define their own (``broadway.ex:1154-1182``)
- defaults: processor concurrency = 2× cores (``topology.ex:178-182``),
  batch_size 100 (``options.ex:237``), batch_timeout 1000 ms
  (``options.ex:276-283``), max_demand 10 (``options.ex:175``)

Errors raise ``ConfigError`` with NimbleOptions-style messages so tests
can assert on them the way the reference suite does
(``test/broadway_test.exs:198-291``).
"""

from __future__ import annotations

import os
from collections.abc import Callable
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import Column, DataFrame


class ConfigError(ValueError):
    """Invalid topology configuration (NimbleOptions-style)."""


def _require(cond: bool, msg: str) -> None:
    if not cond:
        raise ConfigError(msg)


def _default_concurrency() -> int:
    return (os.cpu_count() or 4) * 2  # topology.ex:178-182


@dataclass
class RateLimit:
    """≤ allowed_messages admitted per interval_ms, globally.

    (reference ``options.ex:98-128``, ``rate_limiter.ex:44-106``)
    """

    allowed_messages: int
    interval_ms: int

    def validate(self) -> None:
        _require(
            isinstance(self.allowed_messages, int) and self.allowed_messages > 0,
            ":allowed_messages is required and must be a positive integer",
        )
        _require(
            isinstance(self.interval_ms, int) and self.interval_ms > 0,
            ":interval is required and must be a positive integer",
        )


@dataclass
class ProcessorConfig:
    """The single processor layer (``options.ex:153-199``)."""

    concurrency: int = field(default_factory=_default_concurrency)
    max_demand: int = 10  # options.ex:175 — maps to Arrow batch size
    # options.ex:306-316 — column form (name or Column) or function
    # form (callable DataFrame -> Column, the arbitrary-function parity)
    partition_by: str | Column | Callable | None = None

    def validate(self) -> None:
        _require(
            isinstance(self.concurrency, int) and self.concurrency > 0,
            "invalid value for :concurrency option: expected positive integer",
        )
        _require(
            isinstance(self.max_demand, int) and self.max_demand > 0,
            "invalid value for :max_demand option: expected positive integer",
        )
        _require(
            self.partition_by is None
            or isinstance(self.partition_by, (str, Column))
            or callable(self.partition_by),
            "invalid value for :partition_by option: expected a column "
            "name, Column, or function (options.ex:306-316)",
        )


@dataclass
class BatcherConfig:
    """One named batcher (``options.ex:200-290``).

    ``batch_size`` may be an int (size splitter) or a
    ``(weight_column, budget)`` pair — the declarative analogue of the
    reference's ``{init_acc, fun}`` custom splitter.
    """

    batch_size: int | tuple[str, float] = 100  # options.ex:237
    batch_timeout_ms: int = 1000  # options.ex:276-283
    concurrency: int = 1  # options.ex:221-232
    partition_by: str | Column | Callable | None = None

    def validate(self, name: str) -> None:
        bs = self.batch_size
        if isinstance(bs, tuple):
            _require(
                len(bs) == 2 and isinstance(bs[0], str) and float(bs[1]) > 0,
                f"invalid value for :batch_size option in batcher "
                f"{name!r}: expected positive integer or "
                f"(weight_column, budget) pair",
            )
        else:
            _require(
                isinstance(bs, int) and bs > 0,
                f"invalid value for :batch_size option in batcher "
                f"{name!r}: expected positive integer",
            )
        _require(
            isinstance(self.batch_timeout_ms, int) and self.batch_timeout_ms > 0,
            f"invalid value for :batch_timeout option in batcher {name!r}: "
            f"expected positive integer",
        )
        _require(
            isinstance(self.concurrency, int) and self.concurrency > 0,
            f"invalid value for :concurrency option in batcher {name!r}: "
            f"expected positive integer",
        )


@dataclass
class SinkConfig:
    """Where a batcher's (or the DLQ's) rows land.

    ``idempotent=True`` makes the write replay-safe: each micro-batch
    lands in its own ``batch_id=N`` partition directory with overwrite
    semantics, so a replayed micro-batch (crash between sink write and
    checkpoint commit — the at-least-once window of foreachBatch)
    REPLACES its previous attempt instead of appending duplicates.
    Readers scan the root path; ``batch_id`` surfaces as a partition
    column. This is the standard exactly-once-output recipe for
    deterministic batches; the default stays plain append (matching
    at-least-once acks).
    """

    path: str
    format: str = "parquet"
    idempotent: bool = False

    def validate(self, label: str) -> None:
        _require(bool(self.path), f"sink {label!r} requires a path")
        _require(
            not (self.idempotent and self.format == "noop"),
            f"sink {label!r}: idempotent mode is meaningless for noop",
        )
        _require(
            self.format in ("parquet", "json", "csv", "noop"),
            f"sink {label!r}: unsupported format {self.format!r}",
        )


@dataclass
class TopologyConfig:
    """The full pipeline definition — what ``Broadway.start_link`` takes.

    Callables operate on DataFrames (declarative, Catalyst-visible):

    - ``transformer(df)``: raw source rows → payload columns
      (producer_stage.ex:267-281)
    - ``handle_message(df)``: per-message transform; use
      ``operators.failure.with_status`` to fail rows
      (broadway.ex:949-999)
    - ``route_by``: Column producing the batcher name
      (topology.ex:286-289)
    - ``batch_key_by``: Column producing the batch key (message.ex:98-112)
    - ``handle_batch(name, pdf)``: per-materialized-batch pandas hook
      (broadway.ex:1001-1029); None = identity
    - ``handle_failed(pdf)``: dead-letter hook before acking failures
      (broadway.ex:1031-1056); None = identity
    """

    name: str
    processors: ProcessorConfig = field(default_factory=ProcessorConfig)
    batchers: dict[str, BatcherConfig] = field(default_factory=dict)
    sinks: dict[str, SinkConfig] = field(default_factory=dict)
    dlq: SinkConfig | None = None
    ack_log: SinkConfig | None = None
    rate_limit: RateLimit | None = None
    partition_by: str | Column | Callable | None = None
    checkpoint_dir: str | None = None
    transformer: Callable[[DataFrame], DataFrame] | None = None
    handle_message: Callable[[DataFrame], DataFrame] | None = None
    route_by: Column | None = None
    batch_key_by: Column | None = None
    handle_batch: Callable[[str, Any], Any] | None = None
    handle_failed: Callable[[Any], Any] | None = None
    # A1 connector bulk-ack (acknowledger.ex:63-85): called once per
    # micro-batch with the ack-row DataFrame (ACK_LOG_SCHEMA) and the
    # batch_id, AFTER sinks and the ack log. Connectors with
    # per-message acks (SQS delete) plug in here —
    # e.g. SQSSource.make_ack_executor(). None = checkpoint-only acks
    # (Kafka/spool offset commit).
    ack_executor: Callable[[DataFrame, int], None] | None = None
    # L5: a streaming.spans.SpanRecorder collecting the 13-event
    # Broadway span catalogue (broadway.ex:651-887). None = no span
    # accounting (zero overhead).
    telemetry: Any | None = None
    # Shuffle/state-store partition count for stateful queries. Unlike
    # joins/aggs, stateful operators can't rely on AQE: the state store
    # shards by the shuffle partitioning fixed at first run. Size it to
    # the expected distinct (batcher, batch_key) cardinality / executor
    # count; a vanilla session's 200 is pathological for small key
    # spaces.
    state_partitions: int = 32
    # Column giving the deterministic intra-key processing order (the
    # arrival-order stand-in; Broadway relies on mailbox order,
    # broadway.ex:524-607). Defaults to ack_data, which is only safe if
    # ack_data sorts correctly as a string — set a payload column (e.g.
    # an id or timestamp) for numeric order.
    order_by: str = "ack_data"

    def validate(self) -> "TopologyConfig":
        _require(
            isinstance(self.name, str) and self.name != "",
            "invalid value for :name option: expected non-empty string",
        )
        self.processors.validate()
        for bname, b in self.batchers.items():
            _require(
                isinstance(bname, str) and bname != "",
                "batcher names must be non-empty strings",
            )
            b.validate(bname)
        for label, s in self.sinks.items():
            _require(
                label in self.batchers or (label == "default" and not self.batchers),
                f"sink {label!r} does not match any batcher",
            )
            s.validate(label)
        if self.batchers:
            missing = [b for b in self.batchers if b not in self.sinks]
            _require(
                not missing,
                f"batchers {missing} have no sink configured",
            )
        if self.dlq is not None:
            self.dlq.validate("dlq")
        if self.ack_log is not None:
            self.ack_log.validate("ack_log")
        if self.rate_limit is not None:
            self.rate_limit.validate()
        _require(
            self.route_by is None or bool(self.batchers),
            ":route_by requires at least one batcher "
            "(message routed to undefined batcher)",
        )
        # Without route_by every row keeps the default batcher name; if
        # no batcher is called 'default' the per-batcher filters match
        # nothing and ok rows would be silently dropped (never written,
        # never acked) while offsets still commit. The reference raises
        # on an unknown batcher (processor_stage.ex:213-220) — so do we,
        # at validation time.
        _require(
            not self.batchers
            or self.route_by is not None
            or "default" in self.batchers,
            "batchers are configured without :route_by — a batcher named "
            "'default' is required (every message routes to :default, "
            "broadway.ex batcher-existence check)",
        )
        # Carry-over (broadway.ex:1154-1182): top-level partition_by
        # cascades to layers that don't define their own.
        if self.partition_by is not None:
            if self.processors.partition_by is None:
                self.processors.partition_by = self.partition_by
            for b in self.batchers.values():
                if b.partition_by is None:
                    b.partition_by = self.partition_by
        return self
