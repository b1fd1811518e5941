"""Tests for ack policies (A3/A4), telemetry (L5), topology
introspection (L4), and the multimodal featurizer plumbing."""

import time

import pytest
from pyspark.sql import functions as F

from broadway_spark import message as M
from broadway_spark.config import BatcherConfig, SinkConfig, TopologyConfig
from broadway_spark.message import failed_status
from broadway_spark.plans import Pipeline
from broadway_spark.sources import SpoolSource
from broadway_spark.streaming.telemetry import PipelineTelemetry, observed

from .conftest import EVENTS_DDL, make_events


def _source(dirs, n):
    src = SpoolSource(
        name="spool",
        path=dirs["spool"],
        schema_ddl=EVENTS_DDL,
        ack_data_column="event_id",
    )
    src.push_messages(make_events(n), "000.jsonl")
    return src


def _cfg(dirs, **overrides):
    base = dict(
        name="ackpol",
        order_by="event_id",
        batchers={"default": BatcherConfig(batch_size=50)},
        sinks={"default": SinkConfig(path=dirs["sink"])},
        dlq=SinkConfig(path=dirs["dlq"]),
        ack_log=SinkConfig(path=dirs["ack"]),
        checkpoint_dir=dirs["ckpt"],
    )
    base.update(overrides)
    return TopologyConfig(**base)


def test_ack_immediately_early_acks(spark, tmp_dirs):
    """A3: early-acked rows appear once, with trigger='early', and are
    not re-acked at the terminal stage (message.ex:172-201)."""

    def handle_message(df):
        return M.ack_immediately(df, F.col("event_type") == "signup")

    src = _source(tmp_dirs, n=100)
    pipe = Pipeline(_cfg(tmp_dirs, handle_message=handle_message), src)
    pipe.run_to_completion(spark)

    ack = spark.read.parquet(tmp_dirs["ack"])
    assert ack.count() == 100
    assert ack.select("ack_data").distinct().count() == 100
    early = ack.filter(F.col("trigger") == "early")
    assert early.count() == 20  # the signup rows


def test_configure_ack_retry_skips_ack(spark, tmp_dirs):
    """A4: failed rows with on_failure=retry are NOT acked (source
    redelivery owns them); discard rows are acked as failed."""

    def handle_message(df):
        df = df.withColumn(
            "status",
            F.when(
                F.col("event_type") == "error",
                failed_status("poison", "processor"),
            ).otherwise(F.col("status")),
        )
        return M.configure_ack(
            df, M.ACK_RETRY_ON_FAILURE, F.col("user_id") % 2 == 0
        )

    src = _source(tmp_dirs, n=100)
    pipe = Pipeline(_cfg(tmp_dirs, handle_message=handle_message), src)
    pipe.run_to_completion(spark)

    ack = spark.read.parquet(tmp_dirs["ack"])
    failed_acks = ack.filter(F.col("outcome") == "failed")
    # 20 error rows; those with even user_id (retry policy) unacked
    raw = make_events(100)
    errors = [e for e in raw if e["event_type"] == "error"]
    want_failed = len([e for e in errors if e["user_id"] % 2 == 1])
    assert failed_acks.count() == want_failed
    # every failure — retry or discard — flows through handle_failed
    # and the DLQ (the reference runs handle_failed for all failed
    # messages, acknowledger.ex:96-150); retry only withholds the ACK
    dlq = spark.read.parquet(tmp_dirs["dlq"])
    assert dlq.count() == len(errors)
    retry_ids = {e["event_id"] for e in errors if e["user_id"] % 2 == 0}
    acked_ids = {int(r[0]) for r in failed_acks.select("ack_data").collect()}
    assert retry_ids.isdisjoint(acked_ids)


def test_telemetry_listener_and_observe(spark, tmp_dirs):
    """L5: query lifecycle + per-batch progress events with observed
    per-stage metrics (the 13-telemetry-span analogue)."""
    tel = PipelineTelemetry()
    spark.streams.addListener(tel)
    try:
        src = _source(tmp_dirs, n=80)
        cfg = _cfg(tmp_dirs, handle_message=lambda df: observed(df, "processor"))
        pipe = Pipeline(cfg, src)
        pipe.run_to_completion(spark)
        deadline = time.time() + 30
        while time.time() < deadline:
            kinds = {e.kind for e in tel.events}
            if {"query_started", "query_progress"} <= kinds:
                break
            time.sleep(0.5)
        kinds = {e.kind for e in tel.events}
        assert "query_started" in kinds
        assert "query_progress" in kinds
        progress = [e for e in tel.events if e.kind == "query_progress"]
        assert any(e.payload.get("num_input_rows", 0) > 0 for e in progress)
    finally:
        spark.streams.removeListener(tel)


def test_topology_introspection(spark, tmp_dirs):
    """L4: Broadway.topology/1, producer_names/1 and all_running/0
    equivalents (broadway.ex:1184-1276)."""
    from broadway_spark.plans import all_running, producer_names

    src = _source(tmp_dirs, n=5)
    pipe = Pipeline(_cfg(tmp_dirs), src)
    topo = pipe.topology()
    assert topo["name"] == "ackpol"
    assert topo["producers"][0]["kind"] == "SpoolSource"
    assert topo["batchers"][0]["name"] == "default"
    assert topo["batchers"][0]["batch_size"] == 50
    assert producer_names(pipe) == ["spool"]
    q = pipe.start(spark, trigger="processingTime", processing_time="1 second")
    try:
        assert "ackpol" in all_running(spark)
    finally:
        q.stop()
    assert "ackpol" not in all_running(spark)


def test_multimodal_stub_and_strict(spark):
    from broadway_spark.operators import multimodal as MM

    df = spark.createDataFrame(
        [(1, bytearray(b"hello")), (2, bytearray(b"world"))], "id long, content binary"
    )
    media = MM.attach_media(df, "content", "image/fake")
    feats = MM.featurize(media, "content").collect()
    assert all(len(r["feature"]) == MM.FEATURE_DIM for r in feats)
    # deterministic: same bytes → same feature
    again = MM.featurize(media, "content").collect()
    assert {r["id"]: r["feature"] for r in feats} == {
        r["id"]: r["feature"] for r in again
    }
    with pytest.raises(Exception, match="NotImplementedError|real media decode"):
        MM.featurize(media, "content", backend="strict").collect()


def test_multimodal_frame_sampling(spark):
    from broadway_spark.operators import multimodal as MM

    df = spark.createDataFrame([(1, bytearray(b"x" * 100))], "id long, content binary")
    media = MM.attach_media(df, "content", "video/fake")
    frames = MM.frame_sample_plan(media, "content", every_n=10)
    assert frames.count() == 10
    idxs = [r["frame_idx"] for r in frames.select("frame_idx").collect()]
    assert sorted(idxs) == list(range(10))
