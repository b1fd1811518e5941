"""Tests for the Broadway-style test harness (testing.py):
test_message / test_batch / DummyProducer equivalents
(reference lib/broadway.ex:1334-1445, dummy_producer.ex,
caller_acknowledger.ex — the reference's own dummy_producer_test.exs
smoke-tests the whole pipeline through test_batch the same way)."""

from pyspark.sql import functions as F

from broadway_spark.config import BatcherConfig, SinkConfig, TopologyConfig
from broadway_spark.operators.failure import with_status
from broadway_spark.testing import run_test_batch, run_test_message

from .conftest import EVENTS_DDL, make_events


def _cfg(**overrides):
    base = dict(
        name="harness",
        order_by="event_id",
        handle_message=lambda df: with_status(
            df, F.col("event_type") == "error", "poison"
        ),
        batchers={"default": BatcherConfig(batch_size=10)},
        sinks={},
    )
    base.update(overrides)
    return TopologyConfig(**base)


def test_batch_reports_successful_and_failed(spark):
    """test_batch: outcomes split by the status channel, every message
    acked exactly once (assert_receive {:ack, ref, successful, failed})."""
    events = make_events(30)
    for e in events[:4]:
        e["event_type"] = "error"
    n_err = sum(1 for e in events if e["event_type"] == "error")
    res = run_test_batch(spark, _cfg(), EVENTS_DDL, events)
    assert len(res.successful) == 30 - n_err
    assert len(res.failed) == n_err
    assert res.successful_ids | res.failed_ids == {
        str(e["event_id"]) for e in events
    }
    # failed rows landed in the DLQ with the failure reason
    assert res.dlq is not None and res.dlq.count() == n_err
    assert {r["event_type"] for r in res.dlq.collect()} == {"error"}


def test_message_forces_flush(spark):
    """test_message forces batch_mode='flush' (broadway.ex:1374-1380):
    a single message must not wait for batch_size to fill."""
    res = run_test_message(
        spark,
        _cfg(batchers={"default": BatcherConfig(batch_size=100_000)}),
        EVENTS_DDL,
        make_events(1)[0],
    )
    assert len(res.successful) == 1
    assert res.successful[0]["trigger"] == "flush"
    assert res.sinks["default"].count() == 1


def test_batch_bulk_mode_exercises_real_batching(spark):
    """batch_mode='bulk' opt-out (broadway.ex:1418-1427): size chunks
    form normally."""
    events = make_events(25)
    for e in events:
        e["event_type"] = "view"  # no failures in this scenario
    res = run_test_batch(
        spark,
        _cfg(batchers={"default": BatcherConfig(batch_size=10)}),
        EVENTS_DDL,
        events,
        batch_mode="bulk",
    )
    assert len(res.successful) == 25
    sizes = sorted(r["batch_size"] for r in res.successful)
    assert sizes.count(10) == 20  # two full chunks of 10


def test_caller_config_not_mutated(spark):
    """The harness must not leak temp sinks/checkpoints into the
    caller's config (test pipelines are throwaway)."""
    cfg = _cfg()
    run_test_batch(spark, cfg, EVENTS_DDL, make_events(5))
    assert cfg.checkpoint_dir is None
    assert cfg.sinks == {}
    assert cfg.ack_log is None
