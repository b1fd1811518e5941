"""Streaming quality-gate admission stats — transformWithStateInPandas.

The batch corpus-clean composite (``q_pipeline_corpus_clean``) gates
documents on quality + token budget and reports the per-language yield.
A production ingest runs the SAME gate as a stream: every arriving
micro-batch of documents is scored, admitted or rejected with a reason,
and the pipeline keeps RUNNING totals per (reason, group) — the
admission dashboard a corpus ingest publishes (reference parity:
Broadway's batcher/telemetry surface exposes per-stage counters,
``lib/broadway.ex:370-420`` topology docs; this operator is that
counter state expressed as typed streaming state).

This module holds the generic accumulator: per-key ValueState carrying
(n_docs, per-column sums, seq), updated per micro-batch, emitting the
UPDATED running totals row each time a batch touches the key. The
emitted ``seq`` is the per-key batch counter, so a reader takes the
max-seq row per key for the final totals; intermediate rows ARE the
admission time-series. Totals are associative integer sums, so the
final row is independent of micro-batch packing — which is what makes
the operator oracle-checkable against a batch GROUP BY.

100 TB framing: state is one short integer tuple per DISTINCT key
(reasons × languages — dozens, not millions); the heavy work (scoring,
reason assignment) is stateless codegen BEFORE the keyed shuffle, so
the state stage receives only (key, n_tokens, quality_ppm) rows.
Exactly-once across restarts: state versions commit per micro-batch
with the checkpoint, and a replayed batch recomputes from the previous
state version, so running totals never double-count (verified by the
s35 kill-and-resume twin).
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


class AdmissionStatsProcessor(StatefulProcessor):
    """Running (count, Σ sum_cols) per key in one ValueState tuple."""

    def __init__(self, key_cols: list[str], sum_cols: list[str]):
        self.key_cols = key_cols
        self.sum_cols = sum_cols

    def init(self, handle: StatefulProcessorHandle) -> None:
        ddl = "n_docs bigint, " + ", ".join(
            f"s{i} bigint" for i in range(len(self.sum_cols))
        ) + ", seq bigint"
        self.totals = handle.getValueState("totals", ddl)

    def handleInputRows(
        self, key: Any, rows: Iterator[pd.DataFrame], timerValues: TimerValues
    ) -> Iterator[pd.DataFrame]:
        n = 0
        sums = [0] * len(self.sum_cols)
        for pdf in rows:
            if len(pdf) == 0:
                continue
            n += len(pdf)
            for i, c in enumerate(self.sum_cols):
                sums[i] += int(pdf[c].sum())
        if n == 0:
            return
        prev = (
            tuple(self.totals.get())
            if self.totals.exists()
            else (0,) * (len(self.sum_cols) + 2)
        )
        cur = (
            prev[0] + n,
            *[prev[1 + i] + sums[i] for i in range(len(self.sum_cols))],
            prev[-1] + 1,
        )
        self.totals.update(cur)
        out = {c: [k] for c, k in zip(self.key_cols, key)}
        out["n_docs"] = [cur[0]]
        for i, c in enumerate(self.sum_cols):
            out[f"sum_{c}"] = [cur[1 + i]]
        out["seq"] = [cur[-1]]
        yield pd.DataFrame(out)

    def handleExpiredTimer(
        self, key: Any, timerValues: TimerValues, expiredTimerInfo: ExpiredTimerInfo
    ) -> Iterator[pd.DataFrame]:
        return iter(())

    def close(self) -> None:
        pass


def streaming_admission_stats(
    df: DataFrame, key_cols: list[str], sum_cols: list[str]
) -> DataFrame:
    """Streaming DataFrame → one row per (key, touching micro-batch)
    holding the RUNNING totals (n_docs, sum_<c> for each sum col) and
    the per-key batch counter ``seq``. The max-seq row per key is the
    stream-lifetime total; the full set is the admission time-series.

    Requires the RocksDB state store provider (``use_rocksdb_state`` /
    ``scoped_rocksdb_state``); the caller's writeStream owns
    checkpointing. timeMode 'none': no timers, so availableNow drains
    terminate (see stateful_dedup.py's negative result with
    processingTime)."""
    types = {f.name: f.dataType.simpleString() for f in df.schema}
    out_ddl = ", ".join(
        [f"{c} {types[c]}" for c in key_cols]
        + ["n_docs bigint"]
        + [f"sum_{c} bigint" for c in sum_cols]
        + ["seq bigint"]
    )
    return df.groupBy(*key_cols).transformWithStateInPandas(
        statefulProcessor=AdmissionStatsProcessor(key_cols, sum_cols),
        outputStructType=out_ddl,
        outputMode="append",
        timeMode="none",
    )
