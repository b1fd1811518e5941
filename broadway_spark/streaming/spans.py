"""Span telemetry — the full 13-event catalogue of the reference
(``lib/broadway.ex:651-887``), re-expressed for micro-batch execution.

Event names mirror the reference's `[:broadway, ...]` atoms:

    topology:init                      (broadway.ex:656-662)
    processor:start / stop             (:664-700)
    processor:message:start / stop / exception   (:702-766)
    batch_processor:start / stop       (:768-800)
    handle_failed:start / stop / exception       (:802-846)
    batcher:start / stop               (:848-882)

Semantics adaptation, documented rather than hidden: the reference
emits per-MESSAGE spans from an actor processing one message at a
time. A vectorized engine processes a micro-batch per stage, so
``processor:message:*`` spans are emitted once per micro-batch with
message COUNTS in the metadata (the per-message span payload,
aggregated); ``processor:message:exception`` fires when any row
failed, carrying the failure count and sample reasons — our
crash-containment captures user-code exceptions as failed rows
(operators/failure.py), so "an exception was raised" is exactly
"failed rows exist at the processor boundary".

Start events carry ``system_time`` (epoch seconds); stop/exception
events carry ``duration`` (seconds since the matching start) — the
:telemetry.span/3 convention.

The recorder is driver-side and in-memory (optionally JSONL-mirrored).
Span accounting adds at most two small aggregate jobs per micro-batch
on the already-persisted batch DataFrame, and nothing at all when no
recorder is configured.
"""

from __future__ import annotations

import json
import threading
import time
from contextlib import contextmanager
from dataclasses import dataclass, field


@dataclass
class Span:
    event: str  # e.g. "processor:stop"
    measurement: dict = field(default_factory=dict)
    metadata: dict = field(default_factory=dict)


class SpanRecorder:
    """Collects Broadway-taxonomy spans; thread-safe (foreachBatch may
    run concurrently with listener callbacks)."""

    CATALOGUE = (
        "topology:init",
        "processor:start",
        "processor:stop",
        "processor:message:start",
        "processor:message:stop",
        "processor:message:exception",
        "batch_processor:start",
        "batch_processor:stop",
        "handle_failed:start",
        "handle_failed:stop",
        "handle_failed:exception",
        "batcher:start",
        "batcher:stop",
    )

    def __init__(self, jsonl_path: str | None = None):
        self.spans: list[Span] = []
        self._lock = threading.Lock()
        self._jsonl_path = jsonl_path

    def emit(self, event: str, measurement: dict, metadata: dict) -> None:
        sp = Span(event, measurement, metadata)
        with self._lock:
            self.spans.append(sp)
            if self._jsonl_path:
                with open(self._jsonl_path, "a") as fh:
                    fh.write(
                        json.dumps(
                            {
                                "event": event,
                                **measurement,
                                "metadata": metadata,
                            },
                            default=str,
                        )
                        + "\n"
                    )

    @contextmanager
    def span(self, name: str, **metadata):
        """start → yield → stop; exception → `<name>:exception` span
        (re-raised). The :telemetry.span/3 shape."""
        self.emit(name + ":start", {"system_time": time.time()}, metadata)
        t0 = time.monotonic()
        try:
            yield metadata
        except Exception as e:
            self.emit(
                name + ":exception",
                {"duration": time.monotonic() - t0},
                {**metadata, "kind": "error", "reason": repr(e)},
            )
            raise
        self.emit(name + ":stop", {"duration": time.monotonic() - t0}, metadata)

    # -- queries (test/ops surface) -----------------------------------

    def events(self, event: str | None = None) -> list[Span]:
        with self._lock:
            if event is None:
                return list(self.spans)
            return [s for s in self.spans if s.event == event]

    def kinds(self) -> set[str]:
        with self._lock:
            return {s.event for s in self.spans}
