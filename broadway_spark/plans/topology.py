"""Pipeline — compile and run a Broadway-style topology on Structured
Streaming.

The reference builds a supervision tree of GenStage processes
(``lib/broadway/topology.ex:47-76``); we build ONE streaming query:

    source.read_stream() → transformer → envelope-normalize →
    handle_message (status capture) → route_by/batch_key annotation →
    [partition_by repartition] → writeStream.foreachBatch(router)

Front half is declarative DataFrame work (Catalyst prunes/pushes down
through it); the router (``streaming/router.py``) is the batcher +
batch-processor + ack back half. The checkpoint replaces per-message
acknowledgement for source progress (SURVEY §1.2: ack ≈ offset commit);
the ack-log sink replaces ``CallerAcknowledger`` messages.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from broadway_spark import message as M
from broadway_spark.config import ConfigError, TopologyConfig
from broadway_spark.operators.partitioning import (
    partition_by_label,
    resolve_partition_expr,
)
from broadway_spark.streaming.router import build_router


def all_running(spark: SparkSession) -> list[str]:
    """Names of every active pipeline query in this session — the
    analogue of ``Broadway.all_running/0`` (broadway.ex:1257-1276,
    backed by the config-storage registry; ours is the session's
    StreamingQueryManager)."""
    return sorted(q.name for q in spark.streams.active if q.name)


def producer_names(pipeline: "Pipeline") -> list[str]:
    """The pipeline's producer (source) names — the analogue of
    ``Broadway.producer_names/1`` (broadway.ex:1184-1205). One source
    per pipeline in this engine; returned as a list for API parity."""
    return [pipeline.source.name]


class Pipeline:
    """A validated topology bound to a source.

    ``source`` must provide ``read_stream(spark) -> DataFrame`` (raw
    rows), ``name``, and ``ack_data_column`` (the column carried into
    ``ack.ack_data`` as the per-message identity).
    """

    def __init__(self, config: TopologyConfig, source) -> None:
        self.config = config.validate()
        self.source = source

    # -- front half ---------------------------------------------------

    def build_stream(self, spark: SparkSession) -> DataFrame:
        cfg = self.config
        df = self.source.read_stream(spark)
        if cfg.transformer is not None:
            df = cfg.transformer(df)
        df = M.normalize(
            df,
            source_name=self.source.name,
            ack_ref=f"{self.source.name}#{cfg.name}",
            ack_data=F.col(self.source.ack_data_column).cast("string"),
        )
        if cfg.handle_message is not None:
            df = cfg.handle_message(df)
        if cfg.route_by is not None:
            valid = list(cfg.batchers)
            routed = F.coalesce(cfg.route_by, F.lit(M.DEFAULT_BATCHER))
            ok_route = routed.isin(valid)
            # Unknown batcher → failure channel, mirroring the raise at
            # processor_stage.ex:213-220 but as data, not a crash. Rows
            # already failed keep their original status (first failure
            # wins).
            df = df.withColumn(
                "batcher", F.when(ok_route, routed).otherwise(F.lit("invalid"))
            ).withColumn(
                "status",
                F.when(ok_route | ~F.col("status.ok"), F.col("status")).otherwise(
                    M.failed_status(
                        F.concat(F.lit("unknown batcher: "), routed), "router"
                    )
                ),
            )
        if cfg.batch_key_by is not None:
            df = df.withColumn("batch_key", cfg.batch_key_by.cast("string"))
        if cfg.processors.partition_by is not None:
            # partition_by contract (options.ex:306-316): co-locate equal
            # keys so per-key order survives parallelism. Hash-shuffle on
            # the key into `concurrency` partitions. Accepts the column
            # form (name/Column) or function form (DataFrame -> Column).
            df = df.repartition(
                cfg.processors.concurrency,
                resolve_partition_expr(cfg.processors.partition_by, df),
            )
        return df

    # -- introspection (L4: Broadway.topology/1, broadway.ex:1184-1276)

    def topology(self) -> dict:
        """Describe the compiled topology — producer, processor, and
        batcher layers with their effective settings."""
        cfg = self.config
        return {
            "name": cfg.name,
            "producers": [
                {
                    "name": self.source.name,
                    "kind": type(self.source).__name__,
                    "rate_limit": (
                        {
                            "allowed_messages": cfg.rate_limit.allowed_messages,
                            "interval_ms": cfg.rate_limit.interval_ms,
                        }
                        if cfg.rate_limit
                        else None
                    ),
                }
            ],
            "processors": [
                {
                    "concurrency": cfg.processors.concurrency,
                    "max_demand": cfg.processors.max_demand,
                    "partition_by": partition_by_label(
                        cfg.processors.partition_by
                    ),
                }
            ],
            "batchers": [
                {
                    "name": n,
                    "batch_size": b.batch_size,
                    "batch_timeout_ms": b.batch_timeout_ms,
                    "concurrency": b.concurrency,
                    "partition_by": partition_by_label(b.partition_by),
                    "sink": cfg.sinks[n].path if n in cfg.sinks else None,
                }
                for n, b in cfg.batchers.items()
            ],
        }

    # -- run ----------------------------------------------------------

    def _emit_topology_init(self) -> None:
        """topology:init span (broadway.ex:656-662) — dispatched when
        the pipeline topology is initialized, config in metadata."""
        rec = self.config.telemetry
        if rec is not None:
            import time as _time

            rec.emit(
                "topology:init",
                {"system_time": _time.time()},
                {"config": self.topology()},
            )

    def start(
        self,
        spark: SparkSession,
        trigger: str = "availableNow",
        processing_time: str | None = None,
    ) -> StreamingQuery:
        cfg = self.config
        if cfg.checkpoint_dir is None:
            raise ConfigError("checkpoint_dir is required to start a pipeline")
        self._emit_topology_init()
        stream = self.build_stream(spark)
        writer = stream.writeStream.foreachBatch(build_router(cfg)).option(
            "checkpointLocation", cfg.checkpoint_dir
        )
        if trigger == "availableNow":
            writer = writer.trigger(availableNow=True)
        elif trigger == "processingTime":
            writer = writer.trigger(processingTime=processing_time or "0 seconds")
        else:
            raise ConfigError(f"unknown trigger {trigger!r}")
        return writer.queryName(cfg.name).start()

    def start_stateful(
        self,
        spark: SparkSession,
        processing_time: str = "500 milliseconds",
        impl: str = "v1",
    ) -> StreamingQuery:
        """Run with the *stateful* batcher: cross-micro-batch buffers +
        per-key timeout timers (``streaming/stateful_batcher.py``) — the
        faithful B2/B3 semantics. Requires integer batch sizes.

        ``impl='v1'`` uses ``applyInPandasWithState``; ``impl='tws'``
        uses Spark 4's ``transformWithStateInPandas`` (typed composite
        state + named timers, ``streaming/stateful_batcher_v2.py``) —
        identical output contract. ``impl='auto'`` picks ``tws`` when
        the environment can run it (PySpark's transformWithState state
        protocol needs the protobuf package) and otherwise falls back
        to ``v1`` with a loud warning — same semantics either way.

        The stateful stage does the chunking; foreachBatch only fans
        chunks out to sinks and appends the ack log.
        """
        cfg = self.config
        if cfg.checkpoint_dir is None:
            raise ConfigError("checkpoint_dir is required to start a pipeline")
        self._emit_topology_init()
        for name, b in cfg.batchers.items():
            if not isinstance(b.batch_size, int):
                raise ConfigError(
                    f"stateful batching requires integer batch_size "
                    f"(batcher {name!r})"
                )
        from broadway_spark.streaming.router import _write

        if impl == "auto":
            from broadway_spark.streaming.stateful_batcher_v2 import (
                tws_available,
            )

            if tws_available():
                impl = "tws"
            else:
                import warnings

                warnings.warn(
                    "stateful batcher impl='auto': transformWithState "
                    "unavailable (no protobuf in this environment); "
                    "falling back to the applyInPandasWithState v1 "
                    "implementation (identical output contract)",
                    RuntimeWarning,
                    stacklevel=2,
                )
                impl = "v1"
        if impl == "tws":
            from broadway_spark.streaming.stateful_batcher_v2 import (
                stateful_batch_stream_v2 as stateful_batch_stream,
                tws_available,
            )

            if not tws_available():
                raise ConfigError(
                    "impl='tws' needs the protobuf package (PySpark's "
                    "transformWithState state-server protocol); this "
                    "environment lacks it — use impl='v1'"
                )
            # transformWithState requires the RocksDB state store (typed
            # column-family state); the default HDFS-backed provider
            # crashes the TWS driver worker at schema validation.
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass",
                "org.apache.spark.sql.execution.streaming.state."
                "RocksDBStateStoreProvider",
            )
        elif impl == "v1":
            from broadway_spark.streaming.stateful_batcher import (
                stateful_batch_stream,
            )
        else:
            raise ConfigError(f"unknown stateful batcher impl {impl!r}")

        stream = self.build_stream(spark)
        batched = stateful_batch_stream(
            stream,
            batch_sizes={n: b.batch_size for n, b in cfg.batchers.items()},
            batch_timeouts_ms={
                n: b.batch_timeout_ms for n, b in cfg.batchers.items()
            },
            order_by=cfg.order_by,
        )

        def sink_writer(batch_df: DataFrame, batch_id: int) -> None:
            from contextlib import nullcontext

            rec = cfg.telemetry
            batch_df = batch_df.persist()
            try:
                ok = batch_df.filter(F.col("status_ok"))
                failed = batch_df.filter(~F.col("status_ok"))
                if rec is not None:
                    # processor-stage span on the stateful path: the
                    # upstream stages execute inside this first
                    # materialization of the persisted batch.
                    with rec.span(
                        "processor", topology_name=cfg.name, batch_id=batch_id
                    ) as meta:
                        meta["messages"] = batch_df.count()
                        meta["failed"] = failed.count()
                for name, sink in cfg.sinks.items():
                    span_bp = (
                        rec.span(
                            "batch_processor",
                            topology_name=cfg.name,
                            batcher_key=name,
                            batch_id=batch_id,
                        )
                        if rec is not None
                        else nullcontext()
                    )
                    with span_bp:
                        _write(
                            ok.filter(F.col("batcher") == name).drop(
                                "chunk_seq", "trigger", "batch_size"
                            ),
                            sink.path,
                            sink.format,
                            batch_id,
                            sink.idempotent,
                        )
                if cfg.dlq is not None:
                    _write(
                        failed, cfg.dlq.path, cfg.dlq.format,
                        batch_id, cfg.dlq.idempotent,
                    )
                if cfg.ack_log is not None or cfg.ack_executor is not None:
                    # A3/A4 on the stateful path, mirroring the
                    # foreachBatch router (router.py): failed rows with
                    # on_failure=retry are NOT acked (the source's
                    # redelivery owns them); early-acked ok rows are
                    # labelled trigger='early' (their ack conceptually
                    # happened at the processor stage, message.ex:
                    # 172-201) and are not terminal-acked again.
                    has_policy = "ack_policy" in batch_df.columns
                    ackable = batch_df
                    trigger_col = F.col("trigger")
                    if has_policy:
                        ackable = batch_df.filter(
                            F.col("status_ok")
                            | (F.col("ack_policy") != "retry")
                        )
                        trigger_col = F.when(
                            F.col("status_ok")
                            & (F.col("ack_policy") == "early"),
                            F.lit("early"),
                        ).otherwise(F.col("trigger"))

                    def _ack_select(df, outcome_col):
                        return df.select(
                            F.lit(batch_id).alias("batch_id"),
                            F.col("ack_ref"),
                            F.col("ack_data"),
                            outcome_col.alias("outcome"),
                            F.col("status_reason").alias("reason"),
                            F.col("batcher"),
                            F.col("batch_key"),
                            trigger_col.alias("trigger"),
                            F.col("batch_size"),
                        )

                    acks = _ack_select(
                        ackable,
                        F.when(F.col("status_ok"), "ok").otherwise("failed"),
                    )
                    exec_acks = acks
                    if cfg.ack_executor is not None and has_policy:
                        # executor-only retry signals (never logged):
                        # per-message-ack brokers fast-track redelivery
                        exec_acks = acks.unionByName(
                            _ack_select(
                                batch_df.filter(
                                    ~F.col("status_ok")
                                    & (F.col("ack_policy") == "retry")
                                ),
                                F.lit("retry"),
                            )
                        )
                    if cfg.ack_executor is not None:
                        exec_acks = exec_acks.persist()
                    try:
                        if cfg.ack_log is not None:
                            logged = (
                                exec_acks.filter(F.col("outcome") != "retry")
                                if cfg.ack_executor is not None
                                else acks
                            )
                            _write(
                                logged, cfg.ack_log.path,
                                cfg.ack_log.format, batch_id,
                                cfg.ack_log.idempotent,
                            )
                        if cfg.ack_executor is not None:
                            # A1 connector bulk ack (acknowledger.ex:
                            # 63-85) — e.g. SQS per-message deletes.
                            cfg.ack_executor(exec_acks, batch_id)
                    finally:
                        if cfg.ack_executor is not None:
                            exec_acks.unpersist()
            finally:
                batch_df.unpersist()

        # Pin the state-store partition count for this query: the query
        # captures the conf at start; restore the session value after.
        prev = spark.conf.get("spark.sql.shuffle.partitions")  # effective value
        spark.conf.set("spark.sql.shuffle.partitions", cfg.state_partitions)
        try:
            return (
                batched.writeStream.foreachBatch(sink_writer)
                .option("checkpointLocation", cfg.checkpoint_dir)
                .trigger(processingTime=processing_time)
                .queryName(f"{cfg.name}-stateful")
                .start()
            )
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", prev)

    def run_to_completion(self, spark: SparkSession, timeout_s: int = 300) -> None:
        """Drain everything currently available, then stop — the
        graceful-drain analogue (``terminator.ex:41-59``): every
        in-flight message is processed and acked before return."""
        q = self.start(spark, trigger="availableNow")
        try:
            q.awaitTermination(timeout_s)
        finally:
            if q.isActive:
                q.stop()
