"""L5 span parity: one pipeline run must emit the full 13-event
Broadway telemetry catalogue (``lib/broadway.ex:651-887``) with the
:telemetry.span/3 measurement shapes (start → system_time,
stop/exception → duration). See ``streaming/spans.py`` for the
per-message→per-batch vectorization contract.
"""

from pyspark.sql import functions as F

from broadway_spark import message as M
from broadway_spark.config import BatcherConfig, SinkConfig, TopologyConfig
from broadway_spark.plans import Pipeline
from broadway_spark.sources import SpoolSource
from broadway_spark.streaming.spans import SpanRecorder

from .conftest import EVENTS_DDL, make_events


def test_full_span_catalogue_emitted(spark, tmp_dirs):
    rec = SpanRecorder()

    def handle_message(df):
        return df.withColumn(
            "status",
            F.when(
                F.col("event_type") == "error",
                M.failed_status(F.lit("boom"), "proc"),
            ).otherwise(F.col("status")),
        )

    def handle_batch(name, pdf):
        return pdf

    def handle_failed(pdf):
        return pdf

    src = SpoolSource(
        name="spool",
        path=tmp_dirs["spool"],
        schema_ddl=EVENTS_DDL,
        ack_data_column="event_id",
    )
    src.push_messages(make_events(100), "000.jsonl")
    cfg = TopologyConfig(
        name="spans",
        order_by="event_id",
        handle_message=handle_message,
        handle_batch=handle_batch,
        handle_failed=handle_failed,
        batchers={"default": BatcherConfig(batch_size=10)},
        sinks={"default": SinkConfig(path=tmp_dirs["sink"])},
        dlq=SinkConfig(path=tmp_dirs["dlq"]),
        ack_log=SinkConfig(path=tmp_dirs["ack"]),
        checkpoint_dir=tmp_dirs["ckpt"],
        telemetry=rec,
    )
    Pipeline(cfg, src).run_to_completion(spark, timeout_s=120)

    # handle_failed:exception only fires when the hook raises — that
    # path is test_handle_failed_exception_span; everything else of the
    # 13-event catalogue must appear in this single run.
    missing = set(SpanRecorder.CATALOGUE) - rec.kinds()
    assert missing == {"handle_failed:exception"}, (
        f"span catalogue incomplete: missing {missing}"
    )

    # measurement shapes (:telemetry.span/3 convention)
    for s in rec.events():
        if s.event.endswith(":start") or s.event == "topology:init":
            assert "system_time" in s.measurement, s.event
        else:
            assert "duration" in s.measurement, s.event

    # processor span counts: 100 messages, 20 failed ('error' type)
    proc_stop = rec.events("processor:stop")[0]
    assert proc_stop.metadata["messages"] == 100
    assert proc_stop.metadata["failed"] == 20
    exc = rec.events("processor:message:exception")[0]
    assert exc.metadata["failed"] == 20
    assert exc.metadata["sample_reasons"] == ["boom", "boom", "boom"]

    # handle_failed span carries the failed-message count
    hf = rec.events("handle_failed:start")[0]
    assert hf.metadata["messages"] == 20

    # batcher/batch_processor spans carry batcher_key + routed count
    b = rec.events("batcher:start")[0]
    assert b.metadata["batcher_key"] == "default"
    assert b.metadata["messages"] == 80
    bp = rec.events("batch_processor:stop")[0]
    assert bp.metadata["batcher_key"] == "default"

    # topology:init carries the introspected config
    init = rec.events("topology:init")[0]
    assert init.metadata["config"]["name"] == "spans"


def test_handle_failed_exception_span(spark, tmp_dirs):
    """A raising handle_failed hook must emit handle_failed:exception
    (and the failure propagates — no silent swallow)."""
    rec = SpanRecorder()

    def handle_message(df):
        return df.withColumn(
            "status", M.failed_status(F.lit("all fail"), "proc")
        )

    def handle_failed(pdf):
        raise RuntimeError("hook blew up")

    src = SpoolSource(
        name="spool",
        path=tmp_dirs["spool"],
        schema_ddl=EVENTS_DDL,
        ack_data_column="event_id",
    )
    src.push_messages(make_events(10), "000.jsonl")
    cfg = TopologyConfig(
        name="spans-exc",
        order_by="event_id",
        handle_message=handle_message,
        handle_failed=handle_failed,
        sinks={"default": SinkConfig(path=tmp_dirs["sink"])},
        dlq=SinkConfig(path=tmp_dirs["dlq"]),
        ack_log=SinkConfig(path=tmp_dirs["ack"]),
        checkpoint_dir=tmp_dirs["ckpt"],
        telemetry=rec,
    )
    try:
        Pipeline(cfg, src).run_to_completion(spark, timeout_s=60)
    except Exception:
        pass  # the query fails; the span record is what's under test
    exc = rec.events("handle_failed:exception")
    assert exc, "handle_failed:exception span must be emitted"
    assert "hook blew up" in exc[0].metadata["reason"]


def test_stateful_path_emits_processor_and_batch_processor_spans(spark, tmp_dirs):
    """start_stateful: the stateful batcher does the chunking, so the
    span surface there is processor (+counts) and batch_processor per
    sink write — asserted over a drained run."""
    rec = SpanRecorder()
    src = SpoolSource(
        name="spool",
        path=tmp_dirs["spool"],
        schema_ddl=EVENTS_DDL,
        ack_data_column="event_id",
    )
    src.push_messages(make_events(40), "000.jsonl")
    cfg = TopologyConfig(
        name="spans-stateful",
        order_by="event_id",
        batchers={"default": BatcherConfig(batch_size=20, batch_timeout_ms=800)},
        sinks={"default": SinkConfig(path=tmp_dirs["sink"])},
        ack_log=SinkConfig(path=tmp_dirs["ack"]),
        checkpoint_dir=tmp_dirs["ckpt"],
        telemetry=rec,
    )
    import time as _time

    q = Pipeline(cfg, src).start_stateful(spark, processing_time="300 milliseconds")
    try:
        deadline = _time.time() + 90
        while _time.time() < deadline:
            try:
                if spark.read.parquet(tmp_dirs["ack"]).count() >= 40:
                    break
            except Exception:
                pass
            _time.sleep(1)
    finally:
        q.stop()

    kinds = rec.kinds()
    assert "topology:init" in kinds
    assert "processor:start" in kinds and "processor:stop" in kinds
    assert "batch_processor:start" in kinds and "batch_processor:stop" in kinds
    total = sum(
        s.metadata.get("messages", 0) for s in rec.events("processor:stop")
    )
    assert total >= 40
