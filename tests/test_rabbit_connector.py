"""S6/A1/A6 — the RabbitMQ-shaped channel connector, end-to-end
against the file-backed queue double (``sources/rabbit_fake.py``).

Under test is the connector contract of Broadway's RabbitMQ family
(``guides/examples/rabbitmq.md``): push deliveries over a channel with
``basic.qos`` prefetch as back-pressure, ack by channel-scoped
delivery_tag (including the family's native cumulative
``multiple=True`` bulk ack), ``basic.nack`` requeue vs dead-letter
routing, and crash redelivery via channel close.
"""

import time

from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from broadway_spark import message as M
from broadway_spark.config import SinkConfig, TopologyConfig
from broadway_spark.plans import Pipeline
from broadway_spark.sources.rabbit import RabbitSource, _RabbitStreamReader
from broadway_spark.sources.rabbit_fake import FakeRabbitQueue

BODY_DDL = "event_id long, event_type string, value double"
FULL_DDL = (
    BODY_DDL + ", rmq_message_id long, rmq_delivery_tag long,"
    " rmq_redelivered boolean"
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


def test_fake_queue_channel_semantics(tmp_path):
    """Broker-level contract: prefetch caps unacked deliveries;
    delivery_tag is channel-scoped and monotone; cumulative
    multiple=True ack settles every tag ≤ N; nack routes to requeue
    (redelivered flag) or the dead-letter store; channel close
    requeues."""
    q = FakeRabbitQueue(str(tmp_path / "q"))
    q.publish([{"k": i} for i in range(6)])
    q.open_channel("ch1", prefetch_count=4)

    got = q.deliver("ch1", 10)
    assert [m["id"] for m in got] == [0, 1, 2, 3]  # prefetch-capped
    assert [m["delivery_tag"] for m in got] == [1, 2, 3, 4]
    assert not any(m["redelivered"] for m in got)
    assert q.deliver("ch1", 10) == []  # window saturated
    assert q.counts() == {"ready": 2, "unacked": 4, "acked": 0, "dead": 0}

    # cumulative ack of tags 1-3 in one call frees three window slots
    assert q.basic_ack("ch1", 3, multiple=True) == 3
    assert q.counts()["acked"] == 3
    more = q.deliver("ch1", 10)
    assert [m["id"] for m in more] == [4, 5]
    assert [m["delivery_tag"] for m in more] == [5, 6]

    # nack tag 4 with requeue → ready again, redelivered on next push
    assert q.basic_nack("ch1", 4, requeue=True) == 1
    again = q.deliver("ch1", 10)
    assert [m["id"] for m in again] == [3]
    assert again[0]["redelivered"] is True
    assert again[0]["delivery_tag"] == 7

    # nack tag 5 without requeue → dead-letter store
    assert q.basic_nack("ch1", 5, requeue=False) == 1
    assert q.counts()["dead"] == 1

    # channel close requeues whatever is still unacked (ids 3, 5)
    assert q.close_channel("ch1") == 2
    assert q.counts() == {"ready": 2, "unacked": 0, "acked": 3, "dead": 1}


def test_reader_prefetch_backpressure_and_claims_only(spark, tmp_path):
    """The reader's admission is the broker's prefetch window: with
    prefetch 10 and no acks, trigger 2 delivers nothing. The driver
    stash holds (id, tag, redelivered) claims only; read() fetches
    payloads."""
    qpath = str(tmp_path / "q")
    q = FakeRabbitQueue(qpath)
    q.publish(_events(25))
    schema = StructType.fromDDL(FULL_DDL)
    rdr = _RabbitStreamReader(
        schema,
        {"path": qpath, "max_per_trigger": "100", "prefetch_count": "10"},
    )
    end = rdr.latestOffset()
    assert end == {"seq": 1}
    for claims in rdr._stash.values():
        for c in claims:
            assert len(c) == 3
            assert all(not isinstance(v, dict) for v in c)
    # prefetch saturated → next trigger admits nothing
    assert rdr.latestOffset() == {"seq": 1}
    assert q.counts()["unacked"] == 10

    rows = [r for p in rdr.partitions({"seq": 0}, end) for r in rdr.read(p)]
    assert len(rows) == 10
    by_id = {r[3]: r for r in rows}
    assert by_id[5][0] == 5 and by_id[5][2] == 1.25
    assert by_id[5][4] == 6 and by_id[5][5] is False  # tag, redelivered

    # acks drain the window → the next trigger delivers again
    for tag in range(1, 11):
        q.basic_ack(rdr.channel_id, tag)
    assert rdr.latestOffset() == {"seq": 2}
    assert sum(len(v) for v in rdr._stash.values()) == 20


def test_reader_restart_requeues_via_channel_reopen(spark, tmp_path):
    """Crash redelivery is channel death: a restarted reader reopens
    its channel, requeueing the dead reader's unacked deliveries,
    which then redeliver immediately with redelivered=True — no
    timeout to wait out."""
    qpath = str(tmp_path / "q")
    schema = StructType.fromDDL(FULL_DDL)
    opts = {"path": qpath, "max_per_trigger": "50", "prefetch_count": "50"}

    q = FakeRabbitQueue(qpath)
    q.publish(_events(5))
    r1 = _RabbitStreamReader(schema, dict(opts))
    assert r1.latestOffset() == {"seq": 1}
    r1.commit({"seq": 1})  # offsets committed, but nothing acked

    r2 = _RabbitStreamReader(schema, dict(opts))
    end = r2.latestOffset()
    assert end == {"seq": 2}
    rows = [r for p in r2.partitions({"seq": 1}, end) for r in r2.read(p)]
    assert {r[3] for r in rows} == {0, 1, 2, 3, 4}
    assert all(r[5] is True for r in rows)  # redelivered flag set


def test_rabbit_pipeline_drains_and_acks(spark, tmp_dirs, tmp_path):
    """E2E: 60 published messages flow through the pipeline; the ack
    executor settles every delivery (cumulative-prefix + singles);
    payload + rmq metadata columns arrive in the sink; admission
    respects the prefetch window per trigger."""
    src = RabbitSource(
        name="rmq",
        path=str(tmp_path / "q"),
        schema_ddl=BODY_DDL,
        prefetch_count=25,
        max_per_trigger=100,
    )
    src.publish_messages(_events(60))

    cfg = TopologyConfig(
        name="rabbit-e2e",
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
        ), f"queue not drained: {src.counts()}"
    finally:
        q.stop()

    out = spark.read.parquet(tmp_dirs["sink"])
    assert out.count() == 60
    row = out.filter(F.col("event_id") == 5).collect()[0]
    assert row["value"] == 1.25
    assert row["rmq_message_id"] == 5
    assert row["rmq_redelivered"] is False
    ack = spark.read.parquet(tmp_dirs["ack"])
    assert ack.count() == 60
    per_batch = {
        r["batch_id"]: r["n"]
        for r in ack.groupBy("batch_id").agg(F.count("*").alias("n")).collect()
    }
    assert max(per_batch.values()) <= 25  # prefetch window per trigger
    assert len(per_batch) >= 3


def test_rabbit_retry_requeues_and_reject_dead_letters(spark, tmp_dirs, tmp_path):
    """A6: ack_policy='retry' failures are reject_and_requeue'd — the
    broker redelivers immediately with redelivered=True and the
    handler (which only fails first deliveries) succeeds. Terminal
    failures with on_failure='reject' land in the broker's
    dead-letter store (the DLX pattern)."""
    src = RabbitSource(
        name="rmq",
        path=str(tmp_path / "q"),
        schema_ddl=BODY_DDL,
        prefetch_count=100,
        max_per_trigger=100,
        on_failure="reject",
    )
    src.publish_messages(_events(20))  # ids 3, 8, 13, 18 are 'error'

    def handle_message(df):
        # transient: error rows on first delivery; terminal: id 13 always
        transient = (
            (F.col("event_type") == "error")
            & ~F.col("rmq_redelivered")
            & (F.col("event_id") != 13)
        )
        terminal = (F.col("event_id") == 13) & ~F.col("rmq_redelivered")
        df = df.withColumn(
            "status",
            F.when(
                transient, M.failed_status(F.lit("transient"), "proc")
            )
            .when(terminal, M.failed_status(F.lit("poison"), "proc"))
            .otherwise(F.col("status")),
        )
        return M.configure_ack(df, M.ACK_RETRY_ON_FAILURE, when=transient)

    cfg = TopologyConfig(
        name="rabbit-retry",
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
            lambda: src.counts()["acked"] == 19 and src.counts()["dead"] == 1,
            timeout_s=120,
        ), f"not drained: {src.counts()}"
    finally:
        q.stop()

    out = spark.read.parquet(tmp_dirs["sink"])
    ok_rows = out.filter(F.col("status.ok"))
    assert ok_rows.count() == 19  # all but the poison one
    retried = ok_rows.filter(F.col("event_type") == "error")
    assert {r[0] for r in retried.select("event_id").collect()} == {3, 8, 18}
    assert all(r[0] for r in retried.select("rmq_redelivered").collect())
    # the terminal failure went to the broker's dead-letter store
    assert src.counts()["dead"] == 1
