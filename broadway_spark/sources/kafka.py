"""Kafka source — the S6 connector surface (SURVEY §2.1).

Broadway ships Kafka as a separate package (broadway_kafka); Spark has
it built in (``format("kafka")``). This wrapper maps the Kafka record
shape into the engine's envelope convention:

- ``value`` (BINARY) is the raw payload → the transformer parses it
- topic/partition/offset/timestamp → ``metadata`` map (mirroring what
  broadway_kafka puts in ``Message.metadata``)
- back-pressure: ``maxOffsetsPerTrigger`` = the demand knob
- ack = offset commit via checkpoint (Kafka group commits are advisory
  in Spark; the checkpoint is authoritative)

No broker runs in the test environment, so ``fmt='fake_kafka'`` points
the SAME envelope projection at the file-backed fake broker
(``kafka_fake.py``), which emits the exact Kafka record schema —
envelope mapping, offsets-as-acks, restart resume, and rate-limit
admission are integration-tested through it
(``tests/test_kafka_connector.py``).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass
class KafkaSource:
    name: str
    bootstrap_servers: str
    topics: str  # comma-separated, or pattern via subscribe_pattern
    ack_data_column: str = "kafka_offset_id"
    starting_offsets: str = "earliest"
    max_offsets_per_trigger: int | None = None
    subscribe_pattern: bool = False
    extra_options: dict = field(default_factory=dict)
    # 'kafka' (real broker) or 'fake_kafka' (file-backed test double,
    # same record schema — see kafka_fake.py). The projection below is
    # identical either way; that shared path is what the fake verifies.
    fmt: str = "kafka"
    path: str | None = None  # fake_kafka broker directory

    def read_stream(self, spark: SparkSession) -> DataFrame:
        if self.fmt == "fake_kafka":
            from broadway_spark.sources.kafka_fake import register_fake_kafka

            register_fake_kafka(spark)
            reader = (
                spark.readStream.format("fake_kafka")
                .option("path", self.path)
                .option("topics", self.topics)
            )
            if self.max_offsets_per_trigger is not None:
                reader = reader.option(
                    "max_offsets_per_trigger", self.max_offsets_per_trigger
                )
        else:
            reader = (
                spark.readStream.format("kafka")
                .option("kafka.bootstrap.servers", self.bootstrap_servers)
                .option(
                    "subscribePattern" if self.subscribe_pattern else "subscribe",
                    self.topics,
                )
                .option("startingOffsets", self.starting_offsets)
            )
            if self.max_offsets_per_trigger is not None:
                reader = reader.option(
                    "maxOffsetsPerTrigger", self.max_offsets_per_trigger
                )
            for k, v in self.extra_options.items():
                reader = reader.option(k, v)
        df = reader.load()
        # Envelope-friendly projection: payload stays binary for the
        # transformer; a unique ack identity is derived from
        # (topic, partition, offset).
        return df.select(
            F.col("key").cast("string").alias("kafka_key"),
            F.col("value").alias("value"),
            F.concat_ws(
                ":", F.col("topic"), F.col("partition"), F.col("offset")
            ).alias("kafka_offset_id"),
            F.col("topic"),
            F.col("partition").alias("kafka_partition"),
            F.col("offset").alias("kafka_offset"),
            F.col("timestamp").alias("kafka_timestamp"),
        )
