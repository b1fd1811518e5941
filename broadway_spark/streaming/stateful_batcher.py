"""Stateful batcher — cross-micro-batch batch assembly with per-key
timeout timers.

This is the faithful translation of the reference's batcher stage
(``lib/broadway/topology/batcher_stage.ex``): messages buffer per
(batcher, batch_key) *across micro-batches*; a batch is emitted when

- the buffer reaches ``batch_size``            → trigger 'size'
  (batcher_stage.ex:108-176)
- the per-key timer fires                      → trigger 'timeout'
  (batcher_stage.ex:80-89, 240-256; default 1000 ms, options.ex:276-283)
- a message arrives with batch_mode 'flush'    → trigger 'flush'
  (message.ex:118-133: flush delivers everything buffered immediately)

Implemented with ``applyInPandasWithState`` + ProcessingTimeTimeout:
one key-group = one task = serial per-key processing, which is exactly
Broadway's one-batcher-process-per-key guarantee. State (the buffered
rows) lives in the state store, spills with the checkpoint, and
survives restarts — at 100 TB the state store shards across executors
by the same key hash that routes the messages, so there is no hot
driver path.

Failed rows pass through unbuffered (Broadway: failed messages skip
batchers, ``processor_stage.ex:78-95``).
"""

from __future__ import annotations

import json
from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

# Flattened wire schema for the stateful stage (structs flattened so
# state round-trips through pandas cleanly).
BATCH_OUT_SUFFIX = (
    "chunk_seq long, trigger string, batch_size int"
)


def _flatten(df: DataFrame) -> DataFrame:
    # metadata MAP → JSON string: a null map round-trips through pandas
    # as NaN, which Arrow can't convert back to MapType.
    return df.select(
        *[c for c in df.columns if c not in ("status", "ack", "metadata")],
        F.to_json("metadata").alias("metadata_json"),
        F.col("status.ok").alias("status_ok"),
        F.col("status.reason").alias("status_reason"),
        F.col("status.stage").alias("status_stage"),
        F.col("ack.source").alias("ack_source"),
        F.col("ack.ack_ref").alias("ack_ref"),
        F.col("ack.ack_data").alias("ack_data"),
    )


def _buffer_from_json(buffered_json: str | None):
    if not buffered_json:
        return None
    import io

    # dtype=False / convert_*=False: the wire schema is authoritative;
    # letting read_json re-infer would turn numeric-looking strings
    # (e.g. ack_data) back into ints and break Arrow conversion.
    return pd.read_json(
        io.StringIO(buffered_json),
        orient="split",
        dtype=False,
        convert_axes=False,
        convert_dates=False,
    )


def stateful_batch_stream(
    enveloped: DataFrame,
    batch_sizes: dict[str, int],
    batch_timeouts_ms: dict[str, int],
    order_by: str,
    default_batch_size: int = 100,
    default_timeout_ms: int = 1000,
) -> DataFrame:
    """enveloped (streaming) → stream of batch-annotated rows.

    ``batch_sizes`` / ``batch_timeouts_ms`` are per-batcher (the group
    key's first element), mirroring per-batcher config
    (options.ex:200-290). Output = flattened input +
    (chunk_seq, trigger, batch_size).
    """
    flat = _flatten(enveloped)
    in_cols = flat.schema.fieldNames()
    out_schema = (
        ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in flat.schema)
        + ", "
        + BATCH_OUT_SUFFIX
    )
    state_schema = "buffered string, chunk_seq long"

    # Temporal payload columns need an explicit wire format: pandas
    # to_json serializes datetimes as epoch ints and read_json(dtype=
    # False, convert_dates=False) never converts them back, so a buffer
    # carrying an event-time column would corrupt on Arrow conversion
    # when the chunk is emitted. Encode as ISO strings, decode by the
    # authoritative wire schema.
    ts_cols = [
        f.name
        for f in flat.schema
        if f.dataType.simpleString().startswith("timestamp")
    ]
    date_cols = [
        f.name for f in flat.schema if f.dataType.simpleString() == "date"
    ]

    def _wire_encode(buf: pd.DataFrame) -> str:
        if ts_cols or date_cols:
            buf = buf.copy()
            for c in ts_cols:
                buf[c] = buf[c].map(
                    lambda v: None if pd.isna(v) else pd.Timestamp(v).isoformat()
                )
            for c in date_cols:
                buf[c] = buf[c].map(lambda v: None if pd.isna(v) else str(v))
        return buf.to_json(orient="split")

    def _wire_decode(buffered_json: str | None):
        buf = _buffer_from_json(buffered_json)
        if buf is not None:
            for c in ts_cols:
                buf[c] = pd.to_datetime(buf[c])
            for c in date_cols:
                buf[c] = buf[c].map(
                    lambda v: None if v in (None, "") else pd.Timestamp(v).date()
                )
        return buf

    def assemble(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        batcher_name = key[0]
        batch_size = batch_sizes.get(batcher_name, default_batch_size)
        batch_timeout_ms = batch_timeouts_ms.get(batcher_name, default_timeout_ms)
        # --- load buffer from state
        if state.exists:
            buffered_json, chunk_seq = state.get
            buffer = _wire_decode(buffered_json)
        else:
            buffer, chunk_seq = None, 0

        if state.hasTimedOut:
            # Timer fired with no new input: flush the partial batch
            # (batcher_stage.ex:80-89).
            state.remove()
            if buffer is not None and len(buffer):
                buffer["chunk_seq"] = chunk_seq
                buffer["trigger"] = "timeout"
                buffer["batch_size"] = len(buffer)
                yield buffer[in_cols + ["chunk_seq", "trigger", "batch_size"]]
            return

        new = pd.concat(list(pdfs), ignore_index=True)
        new = new.sort_values(order_by).reset_index(drop=True)

        # Failed rows pass through immediately, never buffered.
        failed = new[~new["status_ok"]]
        if len(failed):
            failed = failed.copy()
            failed["chunk_seq"] = -1
            failed["trigger"] = "flush"
            failed["batch_size"] = len(failed)
            yield failed[in_cols + ["chunk_seq", "trigger", "batch_size"]]
        ok = new[new["status_ok"]]

        buffer = ok if buffer is None else pd.concat([buffer, ok], ignore_index=True)

        flush_all = bool(len(ok)) and (ok["batch_mode"] == "flush").any()

        # Emit full chunks.
        while len(buffer) >= batch_size:
            chunk = buffer.iloc[:batch_size].copy()
            buffer = buffer.iloc[batch_size:].reset_index(drop=True)
            chunk["chunk_seq"] = chunk_seq
            chunk["trigger"] = "size"
            chunk["batch_size"] = batch_size
            chunk_seq += 1
            yield chunk[in_cols + ["chunk_seq", "trigger", "batch_size"]]

        if flush_all and len(buffer):
            chunk = buffer.copy()
            buffer = buffer.iloc[0:0]
            chunk["chunk_seq"] = chunk_seq
            chunk["trigger"] = "flush"
            chunk["batch_size"] = len(chunk)
            chunk_seq += 1
            yield chunk[in_cols + ["chunk_seq", "trigger", "batch_size"]]

        # --- persist remainder + arm the per-key timer
        if len(buffer):
            state.update((_wire_encode(buffer), chunk_seq))
            state.setTimeoutDuration(batch_timeout_ms)
        else:
            state.remove()

    return flat.groupBy("batcher", "batch_key").applyInPandasWithState(
        assemble,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
