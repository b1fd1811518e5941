"""S6/A1/A6 — the Pub/Sub-shaped ack-deadline connector, end-to-end
against the file-backed subscription double (``sources/pubsub_fake.py``).

Under test is the connector contract of Broadway's Cloud Pub/Sub family
(``guides/examples/google-cloud-pubsub.md``): pull deliveries leased
under an ack deadline, acknowledgement by ack_id, **lease renewal**
while work is in flight (the family's distinguishing feature vs SQS's
fixed visibility timeout), nack = modifyAckDeadline(0), and redelivery
of expired leases with a bumped delivery_attempt.
"""

import time

from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from broadway_spark import message as M
from broadway_spark.config import SinkConfig, TopologyConfig
from broadway_spark.plans import Pipeline
from broadway_spark.sources.pubsub import PubSubSource, _PubSubStreamReader
from broadway_spark.sources.pubsub_fake import FakePubSubSubscription

BODY_DDL = "event_id long, event_type string, value double"
FULL_DDL = (
    BODY_DDL + ", ps_message_id long, ps_ack_id string,"
    " ps_delivery_attempt int, ps_publish_time double"
)


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


def test_fake_subscription_lease_semantics(tmp_path):
    """Broker-level contract: pulls lease messages; expired leases
    redeliver with a bumped delivery_attempt and fresh ack_id; stale
    ack_ids are no-ops; nack (deadline 0) redelivers immediately;
    renewal extends the lease."""
    sub = FakePubSubSubscription(str(tmp_path / "sub"))
    sub.publish([{"k": 1}, {"k": 2}, {"k": 3}])

    got = sub.pull(2, ack_deadline_s=1.0)
    assert [m["id"] for m in got] == [0, 1]
    assert all(m["delivery_attempt"] == 1 for m in got)
    # leased messages are not re-pullable
    assert [m["id"] for m in sub.pull(10, 1.0)] == [2]
    assert sub.counts() == {"available": 0, "leased": 3, "acked": 0}

    time.sleep(1.2)  # leases expire → redelivery
    again = sub.pull(10, ack_deadline_s=30.0)
    assert [m["id"] for m in again] == [0, 1, 2]
    assert all(m["delivery_attempt"] == 2 for m in again)

    # stale ack_id (from delivery 1) must be a no-op
    assert sub.acknowledge([got[0]["ack_id"]]) == 0
    # nack one: it becomes available immediately
    assert sub.modify_ack_deadline([again[2]["ack_id"]], 0) == 1
    assert [m["id"] for m in sub.pull(10, 30.0)] == [2]
    # ack the rest with current ack_ids
    assert sub.acknowledge([again[0]["ack_id"], again[1]["ack_id"]]) == 2
    assert sub.counts()["acked"] == 2


def test_fake_subscription_lease_renewal_prevents_redelivery(tmp_path):
    """The family's signature: a renewed lease outlives the original
    deadline without redelivery."""
    sub = FakePubSubSubscription(str(tmp_path / "sub"))
    sub.publish([{"k": 1}])
    got = sub.pull(1, ack_deadline_s=1.0)
    time.sleep(0.6)
    assert sub.modify_ack_deadline([got[0]["ack_id"]], 1.0) == 1
    time.sleep(0.6)  # 1.2s since pull — original lease would be dead
    assert sub.pull(1, 1.0) == []  # still leased: renewal held it
    assert got[0]["delivery_attempt"] == 1
    assert sub.acknowledge([got[0]["ack_id"]]) == 1


def test_driver_leases_hold_no_bodies_and_renew(spark, tmp_path):
    """Scale contract: the driver stashes (id, ack_id, attempt,
    publish_time) only; read() fetches payloads; uncommitted stashes
    are lease-renewed on every trigger."""
    spath = str(tmp_path / "sub")
    sub = FakePubSubSubscription(spath)
    sub.publish(_events(10))
    schema = StructType.fromDDL(FULL_DDL)
    rdr = _PubSubStreamReader(
        schema,
        {"path": spath, "max_per_trigger": "10", "ack_deadline_s": "1.0"},
    )
    end = rdr.latestOffset()
    assert end == {"seq": 1}
    for claims in rdr._stash.values():
        for c in claims:
            assert len(c) == 4
            assert all(not isinstance(v, dict) for v in c)
    # two renewal rounds straddling the original 1 s deadline: the
    # stash is uncommitted, so latestOffset must keep the leases alive
    time.sleep(0.6)
    assert rdr.latestOffset() == {"seq": 1}  # nothing new; renews
    time.sleep(0.6)
    assert rdr.latestOffset() == {"seq": 1}
    assert sub.counts() == {"available": 0, "leased": 10, "acked": 0}

    rows = [r for p in rdr.partitions({"seq": 0}, end) for r in rdr.read(p)]
    assert len(rows) == 10
    by_id = {r[3]: r for r in rows}
    assert by_id[5][0] == 5 and by_id[5][2] == 1.25
    assert by_id[5][4] == "a-5-1" and by_id[5][5] == 1
    # once committed, the stash is dropped and no longer renewed
    rdr.commit(end)
    assert rdr._stash == {}


def test_restart_fast_forwards_reader_seq(spark, tmp_path):
    spath = str(tmp_path / "sub")
    schema = StructType.fromDDL(FULL_DDL)
    opts = {"path": spath, "max_per_trigger": "5", "ack_deadline_s": "300"}

    sub = FakePubSubSubscription(spath)
    sub.publish(_events(5))
    r1 = _PubSubStreamReader(schema, dict(opts))
    assert r1.latestOffset() == {"seq": 1}
    r1.commit({"seq": 1})

    sub.publish(_events(5, start=5))
    r2 = _PubSubStreamReader(schema, dict(opts))
    end = r2.latestOffset()
    assert end == {"seq": 2}
    rows = [r for p in r2.partitions({"seq": 1}, end) for r in r2.read(p)]
    assert {r[3] for r in rows} == {5, 6, 7, 8, 9}
    assert {r[5] for r in rows} == {1}


def test_pubsub_pipeline_drains_and_acks(spark, tmp_dirs, tmp_path):
    """E2E: 60 published messages flow through the pipeline; the ack
    executor acknowledges every terminal message (including
    failed-but-acked); payload + ps metadata columns arrive in the
    sink; admission respects max_per_trigger."""
    src = PubSubSource(
        name="ps",
        path=str(tmp_path / "sub"),
        schema_ddl=BODY_DDL,
        max_per_trigger=25,
        ack_deadline_s=120.0,
    )
    src.publish_messages(_events(60))

    cfg = TopologyConfig(
        name="pubsub-e2e",
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
            lambda: src.counts()["acked"] == 60, timeout_s=120
        ), f"subscription not drained: {src.counts()}"
    finally:
        q.stop()

    out = spark.read.parquet(tmp_dirs["sink"])
    assert out.count() == 60
    row = out.filter(F.col("event_id") == 5).collect()[0]
    assert row["value"] == 1.25
    assert row["ps_message_id"] == 5
    assert row["ps_delivery_attempt"] == 1
    assert row["ps_ack_id"] == "a-5-1"
    assert row["ps_publish_time"] > 0
    ack = spark.read.parquet(tmp_dirs["ack"])
    assert ack.count() == 60
    per_batch = {
        r["batch_id"]: r["n"]
        for r in ack.groupBy("batch_id").agg(F.count("*").alias("n")).collect()
    }
    assert max(per_batch.values()) <= 25
    assert len(per_batch) >= 3


def test_pubsub_nack_redelivers_immediately(spark, tmp_dirs, tmp_path):
    """A6: a message failed with ack_policy='retry' is nack'd
    (modifyAckDeadline 0) so the broker redelivers it immediately with
    delivery_attempt=2, and the handler (which only fails first
    attempts) then succeeds — at-least-once via the broker. The
    generous ack deadline proves redelivery comes from the nack, not
    from lease expiry."""
    src = PubSubSource(
        name="ps",
        path=str(tmp_path / "sub"),
        schema_ddl=BODY_DDL,
        max_per_trigger=100,
        ack_deadline_s=120.0,
    )
    src.publish_messages(_events(20))  # ids 3, 8, 13, 18 are 'error'

    def handle_message(df):
        poison = (F.col("event_type") == "error") & (
            F.col("ps_delivery_attempt") == 1
        )
        df = df.withColumn(
            "status",
            F.when(poison, M.failed_status(F.lit("transient"), "proc")).otherwise(
                F.col("status")
            ),
        )
        return M.configure_ack(df, M.ACK_RETRY_ON_FAILURE, when=poison)

    cfg = TopologyConfig(
        name="pubsub-retry",
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
            lambda: src.counts()["acked"] == 20, timeout_s=120
        ), f"redelivered messages not drained: {src.counts()}"
    finally:
        q.stop()

    out = spark.read.parquet(tmp_dirs["sink"])
    assert out.count() == 20
    retried = out.filter(F.col("event_type") == "error")
    assert retried.count() == 4
    assert {r[0] for r in retried.select("ps_delivery_attempt").collect()} == {2}
    assert {r[0] for r in retried.select("event_id").collect()} == {3, 8, 13, 18}
    dlq = spark.read.parquet(tmp_dirs["dlq"])
    assert dlq.count() == 4
    assert {r[0] for r in dlq.select("dlq_disposition").collect()} == {"retry"}
    ack = spark.read.parquet(tmp_dirs["ack"])
    assert ack.filter(F.col("outcome") == "failed").count() == 0
    assert ack.filter(F.col("outcome") == "ok").count() == 20
