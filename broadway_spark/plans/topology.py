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
from broadway_spark.streaming.router import build_router


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
            # the key into `concurrency` partitions.
            df = df.repartition(
                cfg.processors.concurrency, F.col(cfg.processors.partition_by)
            )
        return df

    # -- run ----------------------------------------------------------

    def start(
        self,
        spark: SparkSession,
        trigger: str = "availableNow",
        processing_time: str | None = None,
    ) -> StreamingQuery:
        cfg = self.config
        if cfg.checkpoint_dir is None:
            raise ConfigError("checkpoint_dir is required to start a pipeline")
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
