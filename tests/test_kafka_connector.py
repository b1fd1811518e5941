"""S6 connector integration tests — KafkaSource driven end-to-end
against the file-backed fake broker (``sources/kafka_fake.py``), which
emits the exact Spark Kafka record schema. What's under test is the
REAL connector surface: the envelope projection in ``kafka.py``,
offsets-as-acks via checkpoint, restart resume without duplicates, and
maxOffsetsPerTrigger admission — the analogue of the reference's
connector guides (guides/examples/introduction.md:17-24) run against
an embedded broker.
"""

import json
import os

from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from broadway_spark.config import SinkConfig, TopologyConfig
from broadway_spark.plans import Pipeline
from broadway_spark.sources.kafka import KafkaSource
from broadway_spark.sources.kafka_fake import FakeKafkaBroker


def _value_transformer(df):
    parsed = F.from_json(
        F.col("value").cast("string"), "event_id long, amount double"
    )
    return df.select(
        "*", parsed["event_id"].alias("event_id"), parsed["amount"].alias("amount")
    )


def _make_pipeline(tmp_dirs, broker_dir, cap=None):
    src = KafkaSource(
        name="kafka",
        bootstrap_servers="",
        topics="events",
        fmt="fake_kafka",
        path=broker_dir,
        max_offsets_per_trigger=cap,
    )
    cfg = TopologyConfig(
        name="kafka-e2e",
        order_by="kafka_offset_id",
        transformer=_value_transformer,
        sinks={"default": SinkConfig(path=tmp_dirs["sink"])},
        ack_log=SinkConfig(path=tmp_dirs["ack"]),
        checkpoint_dir=tmp_dirs["ckpt"],
    )
    return Pipeline(cfg, src)


def _produce(broker, start, n, partition):
    broker.produce(
        "events",
        partition,
        [
            (f"k{i}", json.dumps({"event_id": i, "amount": i / 4.0}))
            for i in range(start, start + n)
        ],
    )


def test_kafka_envelope_mapping_and_drain(spark, tmp_dirs, tmp_path):
    broker_dir = str(tmp_path / "broker")
    broker = FakeKafkaBroker(broker_dir)
    _produce(broker, 0, 30, partition=0)
    _produce(broker, 100, 30, partition=1)

    pipe = _make_pipeline(tmp_dirs, broker_dir)
    pipe.run_to_completion(spark, timeout_s=120)

    out = spark.read.parquet(tmp_dirs["sink"])
    assert out.count() == 60
    # envelope mapping: parsed payload + kafka metadata columns
    row = out.filter(F.col("event_id") == 5).collect()[0]
    assert row["amount"] == 1.25
    assert row["topic"] == "events"
    assert row["kafka_partition"] == 0
    assert row["kafka_offset"] == 5
    assert row["kafka_key"] == "k5"
    assert row["kafka_offset_id"] == "events:0:5"
    # per-partition offsets are the full contiguous log
    offs = {
        (r["kafka_partition"], r["kafka_offset"])
        for r in out.select("kafka_partition", "kafka_offset").collect()
    }
    assert offs == {(p, o) for p in (0, 1) for o in range(30)}

    # ack log: one terminal ack per record, identity = topic:part:offset
    ack = spark.read.parquet(tmp_dirs["ack"])
    assert ack.count() == 60
    assert ack.select("ack_data").distinct().count() == 60

def test_kafka_rate_limit_spreads_micro_batches(spark, tmp_dirs, tmp_path):
    """maxOffsetsPerTrigger=25 over 60 records under a ProcessingTime
    trigger: ≥3 micro-batches, each admitting ≤25 records, split across
    partitions proportionally to lag."""
    import time

    broker_dir = str(tmp_path / "broker")
    broker = FakeKafkaBroker(broker_dir)
    _produce(broker, 0, 30, partition=0)
    _produce(broker, 100, 30, partition=1)

    pipe = _make_pipeline(tmp_dirs, broker_dir, cap=25)
    q = pipe.start(spark, trigger="processingTime", processing_time="300 milliseconds")
    try:
        deadline = time.time() + 120
        while time.time() < deadline:
            try:
                if spark.read.parquet(tmp_dirs["ack"]).count() >= 60:
                    break
            except Exception:
                pass
            time.sleep(1)
    finally:
        q.stop()

    ack = spark.read.parquet(tmp_dirs["ack"])
    assert ack.count() == 60
    per_batch = {
        r["batch_id"]: r["n"]
        for r in ack.groupBy("batch_id").agg(F.count("*").alias("n")).collect()
    }
    assert len(per_batch) >= 3
    assert max(per_batch.values()) <= 25


def test_kafka_restart_resumes_without_duplicates(spark, tmp_dirs, tmp_path):
    broker_dir = str(tmp_path / "broker")
    broker = FakeKafkaBroker(broker_dir)
    _produce(broker, 0, 25, partition=0)

    pipe = _make_pipeline(tmp_dirs, broker_dir)
    pipe.run_to_completion(spark, timeout_s=120)
    assert spark.read.parquet(tmp_dirs["sink"]).count() == 25

    # restart shape: new records appended, fresh query, same checkpoint
    _produce(broker, 25, 20, partition=0)
    pipe2 = _make_pipeline(tmp_dirs, broker_dir)
    pipe2.run_to_completion(spark, timeout_s=120)

    out = spark.read.parquet(tmp_dirs["sink"])
    assert out.count() == 45, "only the 20 new records may be appended"
    assert out.select("kafka_offset_id").distinct().count() == 45
    ack = spark.read.parquet(tmp_dirs["ack"])
    assert ack.count() == 45
    assert ack.select("ack_data").distinct().count() == 45

    # offsets-as-acks: the second run's first trigger commits the first
    # run's offsets back to the broker journal (commit lags one trigger
    # by design — the checkpoint commit log is authoritative).
    with open(os.path.join(broker_dir, "_commits.jsonl")) as fh:
        committed = [json.loads(line) for line in fh if line.strip()]
    assert committed, "restart must re-commit the checkpointed offset"
    assert committed[-1]["committed"]["events/0"] >= 25
