"""S6/A1/A6 — the SQS-shaped per-message-ack connector, end-to-end
against the file-backed queue double (``sources/sqs_fake.py``).

What's under test is the connector contract of broadway_sqs
(``guides/examples/amazon-sqs.md``): destructive receive, delete-as-ack
fanned out executor-side (``acknowledger.ex:63-85``), and redelivery of
un-acked messages via the broker's visibility timeout — the reference's
documented retry story (``broadway.ex:332-338``: no built-in retries,
redelivery is the producer's job).
"""

import time

from pyspark.sql import functions as F

from broadway_spark import message as M
from broadway_spark.config import SinkConfig, TopologyConfig
from broadway_spark.plans import Pipeline
from broadway_spark.sources.sqs import SQSSource
from broadway_spark.sources.sqs_fake import FakeSQSQueue

BODY_DDL = "event_id long, event_type string, value double"


def _events(n, start=0):
    types = ["view", "click", "purchase", "error", "signup"]
    return [
        {
            "event_id": i,
            "event_type": types[i % 5],
            "value": round(i / 4.0, 2),
        }
        for i in range(start, start + n)
    ]


def _wait(pred, timeout_s=90):
    deadline = time.time() + timeout_s
    while time.time() < deadline:
        try:
            if pred():
                return True
        except Exception:
            pass
        time.sleep(1)
    return False


def test_fake_queue_visibility_semantics(tmp_path):
    """Broker-level contract: claims go invisible, reappear after the
    timeout with a fresh receipt and bumped delivery count; deletes
    with stale receipts are ignored."""
    q = FakeSQSQueue(str(tmp_path / "q"))
    q.send_batch([{"k": 1}, {"k": 2}, {"k": 3}])

    got = q.receive(2, visibility_timeout_s=1.0)
    assert [m["id"] for m in got] == [0, 1]
    assert all(m["delivery_count"] == 1 for m in got)
    # in-flight messages are not re-claimable
    assert [m["id"] for m in q.receive(10, 1.0)] == [2]
    assert q.counts() == {"visible": 0, "inflight": 3, "deleted": 0}

    time.sleep(1.2)  # visibility expires → redelivery
    again = q.receive(10, visibility_timeout_s=30.0)
    assert [m["id"] for m in again] == [0, 1, 2]
    assert all(m["delivery_count"] == 2 for m in again)

    # stale receipt (from delivery 1) must be a no-op
    assert q.delete_batch([got[0]["receipt"]]) == 0
    assert q.delete_batch([m["receipt"] for m in again]) == 3
    assert q.counts() == {"visible": 0, "inflight": 0, "deleted": 3}


def test_driver_claims_hold_no_bodies(spark, tmp_path):
    """Scale contract: ``latestOffset`` stashes (id, receipt,
    delivery_count) claims ONLY — payloads are fetched in ``read()``
    on the executor, so the driver never funnels message bodies."""
    from pyspark.sql.types import StructType

    from broadway_spark.sources.sqs import _SQSStreamReader

    q = FakeSQSQueue(str(tmp_path / "q"))
    q.send_batch(_events(10))
    schema = StructType.fromDDL(
        BODY_DDL + ", sqs_message_id long, sqs_receipt string,"
        " sqs_delivery_count int"
    )
    rdr = _SQSStreamReader(
        schema, {"path": str(tmp_path / "q"), "max_per_trigger": "10"}
    )
    end = rdr.latestOffset()
    assert end == {"seq": 1}
    for claims in rdr._stash.values():
        for c in claims:
            assert len(c) == 3  # (id, receipt, delivery_count) — no body
            assert all(not isinstance(v, dict) for v in c)
    # read() reconstitutes full rows broker-side
    rows = [
        r
        for p in rdr.partitions({"seq": 0}, end)
        for r in rdr.read(p)
    ]
    assert len(rows) == 10
    by_id = {r[3]: r for r in rows}  # sqs_message_id position
    assert by_id[5][0] == 5 and by_id[5][2] == 1.25  # body fields present
    assert by_id[5][4] == "r-5-1" and by_id[5][5] == 1


def test_restart_fast_forwards_reader_seq(spark, tmp_path):
    """ADVICE r3: a restarted reader must not claim into a seq range
    below the checkpoint — that burns a whole receive round (messages
    invisible until timeout, phantom delivery_count bump). reader_seq
    is persisted broker-side and fast-forwarded before claiming."""
    from pyspark.sql.types import StructType

    from broadway_spark.sources.sqs import _SQSStreamReader

    qpath = str(tmp_path / "q")
    schema = StructType.fromDDL(
        BODY_DDL + ", sqs_message_id long, sqs_receipt string,"
        " sqs_delivery_count int"
    )
    opts = {"path": qpath, "max_per_trigger": "5", "visibility_timeout_s": "300"}

    q = FakeSQSQueue(qpath)
    q.send_batch(_events(5))
    r1 = _SQSStreamReader(schema, dict(opts))
    assert r1.latestOffset() == {"seq": 1}
    r1.commit({"seq": 1})

    # restart: fresh reader, checkpoint says seq=1; new messages queued
    q.send_batch(_events(5, start=5))
    r2 = _SQSStreamReader(schema, dict(opts))
    end = r2.latestOffset()
    # without fast-forward this would be {"seq": 1} → empty planned
    # batch and a burned round
    assert end == {"seq": 2}
    rows = [r for p in r2.partitions({"seq": 1}, end) for r in r2.read(p)]
    assert {r[3] for r in rows} == {5, 6, 7, 8, 9}
    # first delivery, not a phantom retry
    assert {r[5] for r in rows} == {1}


def test_sqs_pipeline_drains_and_deletes(spark, tmp_dirs, tmp_path):
    """E2E: 60 queued messages flow through the pipeline; the ack
    executor deletes every terminal message from the broker (delete =
    ack), including failed-but-acked ones; payload + sqs metadata
    columns arrive in the sink."""
    src = SQSSource(
        name="sqs",
        path=str(tmp_path / "q"),
        schema_ddl=BODY_DDL,
        max_per_trigger=25,
        visibility_timeout_s=120.0,
    )
    src.send_messages(_events(60))

    cfg = TopologyConfig(
        name="sqs-e2e",
        order_by="event_id",
        sinks={"default": SinkConfig(path=tmp_dirs["sink"])},
        ack_log=SinkConfig(path=tmp_dirs["ack"]),
        ack_executor=src.make_ack_executor(),
        checkpoint_dir=tmp_dirs["ckpt"],
    )
    q = Pipeline(cfg, src).start(
        spark, trigger="processingTime", processing_time="300 milliseconds"
    )
    try:
        assert _wait(
            lambda: src.counts()["deleted"] == 60, timeout_s=120
        ), f"queue not drained: {src.counts()}"
    finally:
        q.stop()

    out = spark.read.parquet(tmp_dirs["sink"])
    assert out.count() == 60
    row = out.filter(F.col("event_id") == 5).collect()[0]
    assert row["value"] == 1.25
    assert row["sqs_message_id"] == 5
    assert row["sqs_delivery_count"] == 1
    assert row["sqs_receipt"] == "r-5-1"
    # admission: ≤ max_per_trigger per micro-batch
    ack = spark.read.parquet(tmp_dirs["ack"])
    assert ack.count() == 60
    per_batch = {
        r["batch_id"]: r["n"]
        for r in ack.groupBy("batch_id").agg(F.count("*").alias("n")).collect()
    }
    assert max(per_batch.values()) <= 25
    assert len(per_batch) >= 3


def test_sqs_retry_redelivers_after_visibility_timeout(spark, tmp_dirs, tmp_path):
    """A6: a message failed with ack_policy='retry' is NOT deleted —
    the ack executor resets its visibility to 0 (the broadway_sqs
    no-delete retry pattern) so the broker redelivers it immediately
    with delivery_count=2, and the handler (which only fails first
    deliveries) then succeeds — at-least-once via the broker, no
    engine-side retry machinery. The generous visibility timeout
    proves redelivery comes from the reset, not from expiry."""
    src = SQSSource(
        name="sqs",
        path=str(tmp_path / "q"),
        schema_ddl=BODY_DDL,
        max_per_trigger=100,
        visibility_timeout_s=120.0,
    )
    src.send_messages(_events(20))  # ids 3, 8, 13, 18 are 'error' type

    def handle_message(df):
        poison = (F.col("event_type") == "error") & (
            F.col("sqs_delivery_count") == 1
        )
        df = df.withColumn(
            "status",
            F.when(poison, M.failed_status(F.lit("transient"), "proc")).otherwise(
                F.col("status")
            ),
        )
        return M.configure_ack(df, M.ACK_RETRY_ON_FAILURE, when=poison)

    cfg = TopologyConfig(
        name="sqs-retry",
        order_by="event_id",
        handle_message=handle_message,
        sinks={"default": SinkConfig(path=tmp_dirs["sink"])},
        dlq=SinkConfig(path=tmp_dirs["dlq"]),
        ack_log=SinkConfig(path=tmp_dirs["ack"]),
        ack_executor=src.make_ack_executor(),
        checkpoint_dir=tmp_dirs["ckpt"],
    )
    q = Pipeline(cfg, src).start(
        spark, trigger="processingTime", processing_time="300 milliseconds"
    )
    try:
        assert _wait(
            lambda: src.counts()["deleted"] == 20, timeout_s=120
        ), f"redelivered messages not drained: {src.counts()}"
    finally:
        q.stop()

    out = spark.read.parquet(tmp_dirs["sink"])
    # every message lands exactly once as ok; the 4 poison ones on
    # their second delivery
    assert out.count() == 20
    retried = out.filter(F.col("event_type") == "error")
    assert retried.count() == 4
    assert {r[0] for r in retried.select("sqs_delivery_count").collect()} == {2}
    assert {r[0] for r in retried.select("event_id").collect()} == {3, 8, 13, 18}
    # first deliveries of poison rows reached the DLQ but were not acked
    dlq = spark.read.parquet(tmp_dirs["dlq"])
    assert dlq.count() == 4
    ack = spark.read.parquet(tmp_dirs["ack"])
    assert ack.filter(F.col("outcome") == "failed").count() == 0
    assert ack.filter(F.col("outcome") == "ok").count() == 20
