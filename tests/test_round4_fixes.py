"""Round-4 contract fixes.

1. ``handle_failed`` all-messages contract: the reference raises if the
   hook does not return every message it received
   (``lib/broadway/acknowledger.ex:126-141`` count check); a hook that
   drops rows would silently lose DLQ entries and their failed-acks.
2. DLQ disposition tagging: failed rows with ``ack_policy='retry'`` are
   redelivered by the source and may later succeed, so their DLQ rows
   are tagged ``retry`` (vs ``terminal``) — DLQ counts no longer
   overstate permanent failures.
"""

import pytest
from pyspark.sql import functions as F

from broadway_spark import message as M
from broadway_spark.config import SinkConfig, TopologyConfig
from broadway_spark.operators.failure import with_status
from broadway_spark.testing import run_test_batch

from .conftest import EVENTS_DDL, make_events


def _failing_config(handle_failed, name):
    def handle_message(df):
        return with_status(
            df, F.col("event_type") == "error", reason="poison:error"
        )

    return TopologyConfig(
        name=name,
        order_by="event_id",
        handle_message=handle_message,
        handle_failed=handle_failed,
        # dlq omitted: run_test_batch provides a temp DLQ sink
    )


def test_handle_failed_wrong_count_fails_loudly(spark):
    """A handle_failed hook that drops messages must fail the batch,
    not silently shrink the DLQ (acknowledger.ex:126-141)."""

    def drops_rows(pdf):
        return pdf.iloc[:1]  # returns 1 of N failed messages

    cfg = _failing_config(drops_rows, "hf-wrong-count")
    with pytest.raises(Exception, match="handle_failed must return exactly"):
        run_test_batch(spark, cfg, EVENTS_DDL, make_events(30), timeout_s=120)


def test_handle_failed_none_return_fails_loudly(spark):
    def returns_none(pdf):
        return None

    cfg = _failing_config(returns_none, "hf-none")
    with pytest.raises(Exception, match="handle_failed must return exactly"):
        run_test_batch(spark, cfg, EVENTS_DDL, make_events(30), timeout_s=120)


def test_handle_failed_correct_count_passes(spark):
    """The contract permits mutation, just not cardinality change."""

    def annotates(pdf):
        pdf = pdf.copy()
        pdf["props"] = "seen-by-hook"
        return pdf

    cfg = _failing_config(annotates, "hf-ok")
    res = run_test_batch(spark, cfg, EVENTS_DDL, make_events(30), timeout_s=120)
    # 30 events, event_type cycle of 5 → 6 'error' rows failed
    assert len(res.failed) == 6
    assert res.dlq is not None and res.dlq.count() == 6
    assert {r[0] for r in res.dlq.select("props").collect()} == {"seen-by-hook"}


def test_dlq_disposition_tags_retry_vs_terminal(spark):
    """DLQ rows carry dlq_disposition so consumers can separate
    redeliverable failures from permanent ones (ADVICE r3)."""

    def handle_message(df):
        fail = F.col("event_type") == "error"
        df = with_status(df, fail, reason="poison:error")
        # half the failures opt into source redelivery
        return M.configure_ack(
            df, M.ACK_RETRY_ON_FAILURE, when=fail & (F.col("event_id") % 2 == 0)
        )

    cfg = TopologyConfig(
        name="dlq-tags",
        order_by="event_id",
        handle_message=handle_message,
    )
    res = run_test_batch(spark, cfg, EVENTS_DDL, make_events(30), timeout_s=120)
    assert res.dlq is not None
    rows = {
        int(r["event_id"]): r["dlq_disposition"] for r in res.dlq.collect()
    }
    assert len(rows) == 6
    for eid, tag in rows.items():
        assert tag == ("retry" if eid % 2 == 0 else "terminal")
    # retry rows are never acked; terminal failures are acked as failed
    assert {int(r["ack_data"]) for r in res.failed} == {
        e for e, t in rows.items() if t == "terminal"
    }


def test_spool_max_backlog_discards_oldest_and_journals(spark, tmp_dirs, caplog):
    """F4 bounded buffer (the one row with zero engine surface in r3):
    with max_backlog=30, a 100-row backlog discards the oldest 70 —
    skipped by the offset, never admitted, never acked — and the loss
    is journaled and logged (format_discarded/2 analogue,
    broadway.ex:1083-1092). Unbounded (default) discards nothing."""
    import logging

    from broadway_spark.sources import SpoolSource
    from broadway_spark.sources.spool import _SpoolStreamReader

    src = SpoolSource(
        name="s",
        path=tmp_dirs["spool"],
        schema_ddl=EVENTS_DDL,
        ack_data_column="event_id",
        max_backlog=30,
    )
    src.push_messages(make_events(100), "000.jsonl")
    schema = spark.createDataFrame([], EVENTS_DDL).schema
    rdr = _SpoolStreamReader(
        schema, {"path": tmp_dirs["spool"], "max_backlog": "30"}
    )
    with caplog.at_level(logging.WARNING, logger="broadway_spark.spool"):
        end = rdr.latestOffset()
    assert end == {"row": 100}
    from .conftest import iter_spool_rows

    rows = [
        r
        for p in rdr.partitions({"row": 70}, end)
        for r in iter_spool_rows(rdr, p)
    ]
    assert [r[0] for r in rows] == list(range(70, 100))
    assert src.discards() == [
        {"from_row": 0, "to_row": 70, "discarded": 70}
    ]
    assert any("Discarding 70 messages" in r.message for r in caplog.records)
    # steady state: no further discard while backlog stays bounded
    assert rdr.latestOffset() == {"row": 100}
    assert len(src.discards()) == 1


def test_idempotent_sink_replay_does_not_duplicate(spark, tmp_path):
    """Exactly-once output: foreachBatch is at-least-once (a crash
    between sink write and checkpoint commit replays the micro-batch).
    With SinkConfig(idempotent=True) the replay OVERWRITES its own
    batch_id partition; plain append duplicates. Driven by invoking
    the compiled router twice with the same batch_id — exactly what a
    replay does."""
    from broadway_spark.config import BatcherConfig
    from broadway_spark.streaming.router import build_router

    def make_batch(n):
        from broadway_spark import message as M

        df = spark.createDataFrame(make_events(n), EVENTS_DDL)
        return M.normalize(
            df,
            source_name="t",
            ack_ref="t#idem",
            ack_data=F.col("event_id").cast("string"),
        )

    idem_path = str(tmp_path / "idem_sink")
    plain_path = str(tmp_path / "plain_sink")
    cfg = TopologyConfig(
        name="idem",
        order_by="event_id",
        batchers={"default": BatcherConfig(batch_size=10)},
        sinks={"default": SinkConfig(path=idem_path, idempotent=True)},
        ack_log=SinkConfig(path=str(tmp_path / "ack")),
    ).validate()
    router = build_router(cfg)
    batch = make_batch(40)
    router(batch, 0)
    router(batch, 0)  # replay of the same micro-batch
    router(make_batch(40), 1)
    out = spark.read.parquet(idem_path)
    assert out.count() == 80  # 40 per batch, replay replaced itself
    assert set(
        r[0] for r in out.select("batch_id").distinct().collect()
    ) == {0, 1}

    cfg2 = TopologyConfig(
        name="plain",
        order_by="event_id",
        batchers={"default": BatcherConfig(batch_size=10)},
        sinks={"default": SinkConfig(path=plain_path)},
        ack_log=SinkConfig(path=str(tmp_path / "ack2")),
    ).validate()
    router2 = build_router(cfg2)
    router2(batch, 0)
    router2(batch, 0)
    assert spark.read.parquet(plain_path).count() == 80  # duplicated
