"""Unbounded exact streaming dedup (transformWithStateInPandas): a key
is emitted exactly once across micro-batches AND across a restart —
the exact complement of the watermark-bounded ``dedup_stream``.
"""

import time

from pyspark.sql import functions as F

from broadway_spark.sources import SpoolSource
from broadway_spark.streaming.stateful_dedup import (
    streaming_exact_dedup,
    use_rocksdb_state,
)

from .conftest import EVENTS_DDL, make_events


def _run_dedup(spark, src, sink, ckpt, want, timeout_s=90):
    use_rocksdb_state(spark)
    stream = src.read_stream(spark)
    # key on a derived fingerprint column (the corpus-dedup shape):
    # event_id % 10 gives 10 distinct keys over any number of events
    keyed = stream.withColumn("fp", (F.col("event_id") % 10).cast("string"))
    deduped = streaming_exact_dedup(keyed, ["fp"], order_by="event_id")
    q = (
        deduped.writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .trigger(processingTime="300 milliseconds")
        .start()
    )
    try:
        deadline = time.time() + timeout_s
        while time.time() < deadline:
            try:
                if spark.read.parquet(sink).count() >= want:
                    break
            except Exception:
                pass
            time.sleep(1)
        time.sleep(2)  # settle: no extra rows may trickle in
    finally:
        q.stop()


def test_exactly_one_row_per_key_across_micro_batches(spark, tmp_dirs):
    src = SpoolSource(
        name="spool",
        path=tmp_dirs["spool"],
        schema_ddl=EVENTS_DDL,
        ack_data_column="event_id",
        allowed_per_trigger=25,  # spread 100 rows over ≥4 micro-batches
    )
    src.push_messages(make_events(100), "000.jsonl")
    _run_dedup(spark, src, tmp_dirs["sink"], tmp_dirs["ckpt"], want=10)

    out = spark.read.parquet(tmp_dirs["sink"])
    rows = {r["fp"]: r["event_id"] for r in out.collect()}
    assert len(rows) == 10 and out.count() == 10
    # deterministic first-occurrence: the smallest event_id per key
    assert rows == {str(k): k for k in range(10)}


def test_dedup_state_survives_restart(spark, tmp_dirs):
    src = SpoolSource(
        name="spool",
        path=tmp_dirs["spool"],
        schema_ddl=EVENTS_DDL,
        ack_data_column="event_id",
    )
    src.push_messages(make_events(50), "000.jsonl")
    _run_dedup(spark, src, tmp_dirs["sink"], tmp_dirs["ckpt"], want=10)
    assert spark.read.parquet(tmp_dirs["sink"]).count() == 10

    # restart: 50 more events, ALL keys already seen → nothing new
    src.push_messages(make_events(50, start=50), "001.jsonl")
    _run_dedup(
        spark, src, tmp_dirs["sink"], tmp_dirs["ckpt"], want=10, timeout_s=30
    )
    out = spark.read.parquet(tmp_dirs["sink"])
    assert out.count() == 10, "restarted stream must remember seen keys"
    assert {int(r["fp"]) for r in out.collect()} == set(range(10))
