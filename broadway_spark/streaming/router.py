"""The foreachBatch router — one micro-batch through the back half of
the pipeline.

This is the Spark translation of Broadway's batcher + batch-processor +
acknowledger stages (SURVEY §3.2 steps 4-6). Per micro-batch:

1. persist the batch (it feeds the failed branch, every batcher branch,
   and the ack log — one compute, many consumers)
2. failed rows → ``handle_failed`` hook → DLQ sink → acked as failed
   (reference ``acknowledger.ex:96-150``)
3. ok rows, per batcher: chunk per batch_key by size or weight budget
   (``batcher_stage.ex:108-221``), run ``handle_batch`` as
   ``applyInPandas`` over (batch_key, chunk) groups
   (``batch_processor_stage.ex:52-127``), write the batcher's sink
4. append the ack log — the bulk-ack analogue of
   ``acknowledger.ex:63-85``'s one-ack-call-per-source-handle, keyed by
   (batch_id, ack_ref) so at-least-once reruns are deduplicatable

Trigger labels on ack rows mirror ``BatchInfo.trigger``
(``batch_info.ex:40-41``): full chunks are 'size', the trailing partial
chunk of a micro-batch is 'timeout' (the micro-batch boundary plays the
role of the batch-timeout timer), and 'flush' when the row's
batch_mode is 'flush'.

Scale notes: the only shuffle is the per-batcher chunking window keyed
by batch_key; consumer-mode pipelines (no batchers) are shuffle-free.
Sinks receive partition-parallel writes; nothing funnels through the
driver.
"""

from __future__ import annotations

import time
from collections.abc import Callable
from contextlib import nullcontext

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from broadway_spark.config import TopologyConfig
from broadway_spark.operators.batching import (
    apply_per_batch_streamed,
    chunk_by_budget,
    chunk_by_size,
)

ACK_LOG_SCHEMA = (
    "batch_id long, ack_ref string, ack_data string, outcome string, "
    "reason string, batcher string, batch_key string, trigger string, "
    "batch_size int"
)


def _write(
    df: DataFrame,
    path: str,
    fmt: str,
    batch_id: int | None = None,
    idempotent: bool = False,
) -> None:
    if fmt == "noop":
        df.write.format("noop").mode("overwrite").save()
    elif idempotent and batch_id is not None:
        # Exactly-once output for deterministic batches: the replayed
        # micro-batch overwrites its own batch_id partition instead of
        # appending a duplicate (the standard foreachBatch recipe).
        df.write.format(fmt).mode("overwrite").save(
            f"{path}/batch_id={batch_id}"
        )
    else:
        df.write.format(fmt).mode("append").save(path)


def _ack_rows(
    df: DataFrame, batch_id: int, outcome: str, trigger_col=None
) -> DataFrame:
    trig = trigger_col if trigger_col is not None else F.lit(None).cast("string")
    return df.select(
        F.lit(batch_id).alias("batch_id"),
        F.col("ack.ack_ref").alias("ack_ref"),
        F.col("ack.ack_data").alias("ack_data"),
        F.lit(outcome).alias("outcome"),
        F.col("status.reason").alias("reason"),
        F.col("batcher").alias("batcher"),
        F.col("batch_key").alias("batch_key"),
        trig.alias("trigger"),
        F.col("batch_size_").alias("batch_size")
        if "batch_size_" in df.columns
        else F.lit(None).cast("int").alias("batch_size"),
    )


def _make_batch_hook(batcher_name: str, hook, order_col: str):
    """Wrap the user's handle_batch for applyInPandas (single-arg),
    presenting rows in processing order (Broadway delivers batches in
    arrival order per key) and enforcing the all-messages contract
    (batch_processor_stage.ex:78-84)."""

    def per_batch(pdf):
        pdf = pdf.sort_values(order_col).reset_index(drop=True)
        out = hook(batcher_name, pdf)
        if len(out) != len(pdf):
            raise RuntimeError(
                "handle_batch must return exactly the messages it "
                f"received: got {len(out)}, want {len(pdf)}"
            )
        return out

    return per_batch


def build_router(
    config: TopologyConfig,
) -> Callable[[DataFrame, int], None]:
    """Compile the topology's back half into a foreachBatch function."""

    def router(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        rec = getattr(config, "telemetry", None)
        batch_df = batch_df.persist()
        # Span accounting (L5, broadway.ex:651-887): the processor half
        # executes inside the first materialization of the persisted
        # batch, so the counting aggregate below IS the processor span
        # body. Aggregated per-message spans + exception variant follow
        # (see streaming/spans.py for the vectorization contract).
        n_ok = n_failed = 0
        if rec is not None:
            with rec.span(
                "processor", topology_name=config.name, batch_id=batch_id
            ) as meta:
                counts = {
                    r["ok"]: r["n"]
                    for r in batch_df.groupBy(
                        F.col("status.ok").alias("ok")
                    )
                    .agg(F.count(F.lit(1)).alias("n"))
                    .collect()
                }
                n_ok = counts.get(True, 0)
                n_failed = counts.get(False, 0)
                meta["messages"] = n_ok + n_failed
                meta["failed"] = n_failed
            with rec.span(
                "processor:message",
                topology_name=config.name,
                batch_id=batch_id,
                messages=n_ok + n_failed,
            ):
                pass
            if n_failed:
                reasons = [
                    r[0]
                    for r in batch_df.filter(~F.col("status.ok"))
                    .select("status.reason")
                    .limit(3)
                    .collect()
                ]
                rec.emit(
                    "processor:message:exception",
                    {"duration": 0.0},
                    {
                        "topology_name": config.name,
                        "batch_id": batch_id,
                        "failed": n_failed,
                        "sample_reasons": reasons,
                    },
                )
        # Post-hook DataFrames are consumed twice (sink/DLQ write + ack
        # log). Broadway's contract is exactly-once hook execution per
        # batch (batch_processor_stage.ex:52-127) — persist every
        # DataFrame that carries user-hook lineage so the hook runs once
        # per micro-batch, not once per consumer.
        hook_cache: list[DataFrame] = []
        try:
            ack_parts: list[DataFrame] = []

            failed = batch_df.filter(~F.col("status.ok"))
            ok = batch_df.filter(F.col("status.ok"))

            has_policy = "ack_policy" in batch_df.columns
            retry_acks = None
            if has_policy:
                # A3: early-acked rows get their ack at the processor
                # stage (message.ex:172-201); terminal ack is a no-op.
                early = ok.filter(F.col("ack_policy") == "early")
                ack_parts.append(
                    _ack_rows(early, batch_id, "ok", trigger_col=F.lit("early"))
                )

            # --- failed branch: handle_failed hook → DLQ → ack failed
            span_failed = (
                rec.span(
                    "handle_failed",
                    topology_name=config.name,
                    batch_id=batch_id,
                    messages=n_failed,
                )
                if rec is not None and config.handle_failed is not None
                else nullcontext()
            )
            with span_failed:
                if config.handle_failed is not None:
                    hook_failed = config.handle_failed
                    failed_schema = failed.schema

                    def _apply_failed(batches, _hook=hook_failed):
                        for pdf in batches:
                            if not len(pdf):
                                yield pdf
                                continue
                            out = _hook(pdf)
                            # All-messages contract: the reference
                            # raises if handle_failed returns a
                            # different message set than it received
                            # (acknowledger.ex:126-141 count check) —
                            # a hook that drops rows would silently
                            # lose DLQ entries and their failed-acks.
                            if out is None or len(out) != len(pdf):
                                got = 0 if out is None else len(out)
                                raise RuntimeError(
                                    "handle_failed must return exactly "
                                    "the messages it received: got "
                                    f"{got}, want {len(pdf)}"
                                )
                            yield out

                    # Arrow-batched, distributed — the hook never sees
                    # the driver (reference handle_failed runs in the
                    # stage process, acknowledger.ex:96-150; ours runs
                    # in the task).
                    failed = failed.mapInPandas(
                        _apply_failed, schema=failed_schema
                    )
                    failed = failed.persist()
                    hook_cache.append(failed)
                    if rec is not None:
                        # materialize inside the span so its duration
                        # covers the hook's actual execution
                        failed.count()
                if config.dlq is not None:
                    # Tag each DLQ row with its disposition so consumers
                    # can tell transient retry failures (the source will
                    # redeliver; the row may later succeed) from
                    # terminal ones. Without the tag, DLQ counts
                    # overstate permanent failures.
                    disposition = (
                        F.when(
                            F.col("ack_policy") == "retry", F.lit("retry")
                        ).otherwise(F.lit("terminal"))
                        if has_policy
                        else F.lit("terminal")
                    )
                    _write(
                        failed.withColumn("dlq_disposition", disposition),
                        config.dlq.path,
                        config.dlq.format,
                        batch_id,
                        config.dlq.idempotent,
                    )
            # A4: failed rows with on_failure=retry flow through
            # handle_failed and the DLQ like any failure (the reference
            # runs handle_failed for every failed message,
            # acknowledger.ex:96-150) but are NOT acked — the source's
            # redelivery owns them (A6: no built-in retries,
            # broadway.ex:332-338). They are surfaced to the connector's
            # ack executor as outcome='retry' (never written to the ack
            # log) so per-message-ack brokers can fast-track redelivery
            # (SQS ChangeMessageVisibility(0)).
            ackable_failed = failed
            if has_policy:
                retry_acks = _ack_rows(
                    failed.filter(F.col("ack_policy") == "retry"),
                    batch_id,
                    "retry",
                )
                ackable_failed = failed.filter(F.col("ack_policy") != "retry")
            ack_parts.append(_ack_rows(ackable_failed, batch_id, "failed"))

            if not config.batchers:
                # Consumer mode (topology.ex:277-281): processors are
                # terminal; ack in place, optional default sink.
                sink = config.sinks.get("default")
                if sink is not None:
                    _write(ok, sink.path, sink.format, batch_id, sink.idempotent)
                late_ok = (
                    ok.filter(F.col("ack_policy") != "early") if has_policy else ok
                )
                ack_parts.append(_ack_rows(late_ok, batch_id, "ok"))
            else:
                order_col = config.order_by
                per_batcher: dict[str, int] = {}
                if rec is not None:
                    per_batcher = {
                        r["batcher"]: r["n"]
                        for r in ok.groupBy("batcher")
                        .agg(F.count(F.lit(1)).alias("n"))
                        .collect()
                    }
                for name, bcfg in config.batchers.items():
                    sub = ok.filter(F.col("batcher") == name)
                    if rec is not None:
                        rec.emit(
                            "batcher:start",
                            {"system_time": time.time()},
                            {
                                "topology_name": config.name,
                                "batcher_key": name,
                                "batch_id": batch_id,
                                "messages": per_batcher.get(name, 0),
                            },
                        )
                    _t0 = time.monotonic()
                    if isinstance(bcfg.batch_size, tuple):
                        weight_col, budget = bcfg.batch_size
                        chunked = chunk_by_budget(
                            sub, ["batch_key"], order_col, weight_col, budget
                        )
                        size_lit = None
                    else:
                        chunked = chunk_by_size(
                            sub, ["batch_key"], order_col, bcfg.batch_size
                        )
                        size_lit = bcfg.batch_size
                    w = Window.partitionBy("batch_key", "chunk_id")
                    chunked = chunked.withColumn(
                        "batch_size_", F.count(F.lit(1)).over(w).cast("int")
                    )
                    trigger = (
                        F.when(F.col("batch_mode") == "flush", F.lit("flush"))
                        .when(
                            F.lit(size_lit is not None)
                            & (F.col("batch_size_") == F.lit(size_lit or -1)),
                            F.lit("size"),
                        )
                        .otherwise(F.lit("timeout"))
                    )
                    chunked = chunked.withColumn("trigger_", trigger)

                    if config.handle_batch is not None:
                        per_batch = _make_batch_hook(
                            name, config.handle_batch, order_col
                        )
                        # streamed runner: one Python entry per Arrow
                        # chunk instead of per (batch_key, chunk) group
                        # — at millions of keys per micro-batch the
                        # per-group dispatch tax dominates otherwise.
                        chunked = apply_per_batch_streamed(
                            chunked,
                            ["batch_key", "chunk_id"],
                            per_batch,
                            schema=chunked.schema,
                        )
                        chunked = chunked.persist()
                        hook_cache.append(chunked)
                    if rec is not None:
                        # batcher stage = grouping/annotation (ends
                        # here); batch_processor = the sink write,
                        # where handle_batch actually executes.
                        rec.emit(
                            "batcher:stop",
                            {"duration": time.monotonic() - _t0},
                            {
                                "topology_name": config.name,
                                "batcher_key": name,
                                "batch_id": batch_id,
                            },
                        )

                    sink = config.sinks[name]
                    span_bp = (
                        rec.span(
                            "batch_processor",
                            topology_name=config.name,
                            batcher_key=name,
                            batch_id=batch_id,
                            messages=per_batcher.get(name, 0),
                        )
                        if rec is not None
                        else nullcontext()
                    )
                    with span_bp:
                        _write(
                            chunked.drop("chunk_id", "batch_size_", "trigger_"),
                            sink.path,
                            sink.format,
                            batch_id,
                            sink.idempotent,
                        )
                    late_chunked = (
                        chunked.filter(F.col("ack_policy") != "early")
                        if has_policy
                        else chunked
                    )
                    ack_parts.append(
                        _ack_rows(
                            late_chunked,
                            batch_id,
                            "ok",
                            trigger_col=F.col("trigger_"),
                        )
                    )

            if config.ack_log is not None or config.ack_executor is not None:
                acks = ack_parts[0]
                for p in ack_parts[1:]:
                    acks = acks.unionByName(p)
                if config.ack_executor is not None:
                    if retry_acks is not None:
                        acks = acks.unionByName(retry_acks)
                    # two consumers (log + executor): one compute
                    acks = acks.persist()
                    hook_cache.append(acks)
                if config.ack_log is not None:
                    # retry rows are executor-only signals, not acks
                    logged = (
                        acks.filter(F.col("outcome") != "retry")
                        if config.ack_executor is not None
                        else acks
                    )
                    _write(
                        logged,
                        config.ack_log.path,
                        config.ack_log.format,
                        batch_id,
                        config.ack_log.idempotent,
                    )
                if config.ack_executor is not None:
                    # A1 bulk ack: the connector's one-call-per-source
                    # hook (acknowledger.ex:63-85) — e.g. SQS deletes,
                    # fanned out executor-side by the connector.
                    config.ack_executor(acks, batch_id)
        finally:
            for cached in hook_cache:
                cached.unpersist()
            batch_df.unpersist()

    return router
