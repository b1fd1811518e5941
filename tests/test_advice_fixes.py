"""Regression tests for the round-1 advisory findings:

1. handle_batch / handle_failed hooks must run exactly once per row per
   micro-batch even though their output feeds two consumers (sink + ack
   log) — Broadway's per-batch contract (batch_processor_stage.ex).
2. Spool admission must resume from the committed offset after restart,
   not from zero (otherwise the stream stalls for ceil(committed/allowed)
   empty triggers re-walking already-committed rows).
3. Batchers configured without route_by require a batcher named
   'default', else ok rows are silently dropped (broadway.ex raises on
   unknown batchers; we raise at validation time).
4. The stateful path honors ack_policy: retry-failed rows are not
   acked; early rows ack with trigger='early'.
"""

import glob
import os
import time
import uuid

import pytest
from pyspark.sql import functions as F

from broadway_spark import message as M
from broadway_spark.config import (
    BatcherConfig,
    ConfigError,
    SinkConfig,
    TopologyConfig,
)
from broadway_spark.plans import Pipeline
from broadway_spark.sources import SpoolSource
from broadway_spark.sources.spool import COMMIT_JOURNAL, _SpoolStreamReader

from .conftest import EVENTS_DDL, make_events


def test_config_requires_default_batcher_without_route_by(spark, tmp_path):
    cfg = TopologyConfig(
        name="no-default",
        batchers={"hot": BatcherConfig(batch_size=10)},
        sinks={"hot": SinkConfig(path=str(tmp_path / "s"))},
    )
    with pytest.raises(ConfigError, match="default"):
        cfg.validate()
    # with route_by it validates (routing decides, unknown → failure row)
    TopologyConfig(
        name="routed",
        batchers={"hot": BatcherConfig(batch_size=10)},
        sinks={"hot": SinkConfig(path=str(tmp_path / "s"))},
        route_by=F.lit("hot"),
    ).validate()
    # and a 'default' batcher alone validates
    TopologyConfig(
        name="plain",
        batchers={"default": BatcherConfig(batch_size=10)},
        sinks={"default": SinkConfig(path=str(tmp_path / "s"))},
    ).validate()


def test_spool_admission_resumes_from_committed_offset(spark, tmp_path):
    """Fresh reader + existing commit journal (the restart shape): the
    first latestOffset must continue from the committed row, and the
    reported end must never regress below it."""
    spool = str(tmp_path / "spool")
    src = SpoolSource(
        name="s", path=spool, schema_ddl=EVENTS_DDL, ack_data_column="event_id"
    )
    src.push_messages(make_events(100), "000.jsonl")
    with open(os.path.join(spool, COMMIT_JOURNAL), "w") as fh:
        fh.write('{"committed_row": 60}\n')

    schema = spark.createDataFrame([], EVENTS_DDL).schema
    reader = _SpoolStreamReader(
        schema, {"path": spool, "allowed_per_trigger": "10"}
    )
    first = reader.latestOffset()
    assert first == {"row": 70}, "admission must resume at committed+allowed"
    assert reader.latestOffset() == {"row": 80}

    # commit() keeps _last_end monotone even if called with an offset
    # ahead of what this reader handed out (e.g. checkpoint replay).
    reader2 = _SpoolStreamReader(
        schema, {"path": spool, "allowed_per_trigger": "10"}
    )
    reader2.commit({"row": 90})
    assert reader2.latestOffset() == {"row": 100}


def test_handle_batch_and_handle_failed_run_once_per_row(spark, tmp_dirs, tmp_path):
    """Each hook's output feeds the sink AND the ack log; without a
    persist the hook lineage would recompute and side-effecting hooks
    would double-fire. Count actual hook executions via marker files."""
    batch_log = str(tmp_path / "hooklog_batch")
    failed_log = str(tmp_path / "hooklog_failed")
    os.makedirs(batch_log)
    os.makedirs(failed_log)

    def handle_message(df):
        return df.withColumn(
            "status",
            F.when(
                F.col("event_type") == "error",
                M.failed_status(F.lit("boom"), "proc"),
            ).otherwise(F.col("status")),
        )

    def handle_batch(name, pdf):
        fn = os.path.join(batch_log, f"{uuid.uuid4().hex}.txt")
        with open(fn, "w") as fh:
            for v in pdf["event_id"]:
                fh.write(f"{v}\n")
        return pdf

    def handle_failed(pdf):
        fn = os.path.join(failed_log, f"{uuid.uuid4().hex}.txt")
        with open(fn, "w") as fh:
            for v in pdf["event_id"]:
                fh.write(f"{v}\n")
        return pdf

    src = SpoolSource(
        name="spool",
        path=tmp_dirs["spool"],
        schema_ddl=EVENTS_DDL,
        ack_data_column="event_id",
    )
    src.push_messages(make_events(100), "000.jsonl")
    cfg = TopologyConfig(
        name="hook-once",
        order_by="event_id",
        handle_message=handle_message,
        handle_batch=handle_batch,
        handle_failed=handle_failed,
        batchers={"default": BatcherConfig(batch_size=10)},
        sinks={"default": SinkConfig(path=tmp_dirs["sink"])},
        dlq=SinkConfig(path=tmp_dirs["dlq"]),
        ack_log=SinkConfig(path=tmp_dirs["ack"]),
        checkpoint_dir=tmp_dirs["ckpt"],
    )
    Pipeline(cfg, src).run_to_completion(spark, timeout_s=120)

    def counts(d):
        seen = {}
        for fn in glob.glob(os.path.join(d, "*.txt")):
            with open(fn) as fh:
                for line in fh:
                    if line.strip():
                        seen[int(line)] = seen.get(int(line), 0) + 1
        return seen

    # 100 events: event_type cycles 5 values, 'error' hits 20 rows.
    ok_counts = counts(batch_log)
    failed_counts = counts(failed_log)
    assert len(ok_counts) == 80 and set(ok_counts.values()) == {1}, (
        "handle_batch must run exactly once per ok row"
    )
    assert len(failed_counts) == 20 and set(failed_counts.values()) == {1}, (
        "handle_failed must run exactly once per failed row"
    )


def _wait_for_rows(spark, path, want, timeout_s=90):
    deadline = time.time() + timeout_s
    while time.time() < deadline:
        try:
            if spark.read.parquet(path).count() >= want:
                return True
        except Exception:
            pass
        time.sleep(1)
    return False


def test_stateful_path_honors_ack_policy(spark, tmp_dirs):
    """A3/A4 on start_stateful: retry-failed rows are never acked,
    early rows ack with trigger='early' (router.py parity)."""

    def handle_message(df):
        fail = F.col("event_id") % 5 == 0
        df = df.withColumn(
            "status",
            F.when(fail, M.failed_status(F.lit("boom"), "proc")).otherwise(
                F.col("status")
            ),
        )
        df = M.configure_ack(df, M.ACK_RETRY_ON_FAILURE, when=fail)
        return M.ack_immediately(df, when=F.col("event_id") % 5 == 1)

    src = SpoolSource(
        name="spool",
        path=tmp_dirs["spool"],
        schema_ddl=EVENTS_DDL,
        ack_data_column="event_id",
    )
    src.push_messages(make_events(30), "000.jsonl")
    cfg = TopologyConfig(
        name="stateful-ackpol",
        order_by="event_id",
        handle_message=handle_message,
        batchers={"default": BatcherConfig(batch_size=6, batch_timeout_ms=1000)},
        sinks={"default": SinkConfig(path=tmp_dirs["sink"])},
        dlq=SinkConfig(path=tmp_dirs["dlq"]),
        ack_log=SinkConfig(path=tmp_dirs["ack"]),
        checkpoint_dir=tmp_dirs["ckpt"],
    )
    q = Pipeline(cfg, src).start_stateful(spark, processing_time="300 milliseconds")
    try:
        # 30 rows: 6 retry-failed (never acked) → 24 ackable
        assert _wait_for_rows(spark, tmp_dirs["ack"], 24), "drain incomplete"
        time.sleep(2)  # settle: no further acks may appear
    finally:
        q.stop()

    ack = spark.read.parquet(tmp_dirs["ack"])
    assert ack.count() == 24
    acked_ids = {int(r[0]) for r in ack.select("ack_data").collect()}
    assert all(i % 5 != 0 for i in acked_ids), "retry rows must not be acked"
    early = ack.filter(F.col("trigger") == "early")
    assert {int(r[0]) % 5 for r in early.select("ack_data").collect()} == {1}
    assert early.count() == 6
    # failed-but-retry rows still reach the DLQ for observability
    dlq = spark.read.parquet(tmp_dirs["dlq"])
    assert dlq.count() == 6
