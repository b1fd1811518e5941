"""Telemetry — the Spark translation of the reference's 13 :telemetry
span events (catalogued at ``lib/broadway.ex:651-887``).

The reference emits per-stage start/stop/exception spans with message
counts and durations. Spark's natural equivalents:

- ``StreamingQueryListener.onQueryProgress``: per-micro-batch rows/sec,
  durations, state-store metrics — the processor/batcher span analogue
- ``DataFrame.observe`` + named metrics: per-operator row/failure
  counters evaluated inside the plan (no extra pass)

``PipelineTelemetry`` collects both into an in-memory event list (and
optionally a JSONL file) so tests and operators can assert on them the
way the reference suite asserts on telemetry messages.
"""

from __future__ import annotations

import json
import threading
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.listener import StreamingQueryListener


def observed(df: DataFrame, name: str) -> DataFrame:
    """Attach engine-standard observed metrics to a stage boundary:
    message count + failure count (the start/stop span payload of
    processor_stage telemetry)."""
    return df.observe(
        name,
        F.count(F.lit(1)).alias("messages"),
        F.sum(F.when(~F.col("status.ok"), 1).otherwise(0)).alias("failed"),
    )


@dataclass
class TelemetryEvent:
    kind: str
    query: str
    batch_id: int | None
    payload: dict = field(default_factory=dict)


class PipelineTelemetry(StreamingQueryListener):
    """Collects query lifecycle + progress events (L5)."""

    def __init__(self, jsonl_path: str | None = None):
        self.events: list[TelemetryEvent] = []
        self._lock = threading.Lock()
        self._jsonl_path = jsonl_path

    def _emit(self, ev: TelemetryEvent) -> None:
        with self._lock:
            self.events.append(ev)
            if self._jsonl_path:
                with open(self._jsonl_path, "a") as fh:
                    fh.write(
                        json.dumps(
                            {
                                "kind": ev.kind,
                                "query": ev.query,
                                "batch_id": ev.batch_id,
                                **ev.payload,
                            }
                        )
                        + "\n"
                    )

    # -- StreamingQueryListener callbacks ------------------------------

    def onQueryStarted(self, event) -> None:  # topology init span
        self._emit(TelemetryEvent("query_started", event.name or event.id, None))

    def onQueryProgress(self, event) -> None:  # processor/batcher spans
        p = event.progress
        observed = {}
        try:
            observed = dict(p.observedMetrics or {})
            observed = {
                k: {f: getattr(v, f) for f in v.__fields__}
                if hasattr(v, "__fields__")
                else str(v)
                for k, v in observed.items()
            }
        except Exception:
            pass
        self._emit(
            TelemetryEvent(
                "query_progress",
                p.name or str(p.id),
                p.batchId,
                {
                    "num_input_rows": p.numInputRows,
                    "duration_ms": dict(p.durationMs or {}),
                    "observed": observed,
                },
            )
        )

    def onQueryTerminated(self, event) -> None:  # drain/stop span
        self._emit(
            TelemetryEvent(
                "query_terminated",
                str(event.id),
                None,
                {"exception": event.exception},
            )
        )

    def onQueryIdle(self, event) -> None:
        pass
