"""Failure diversion: the status error channel.

Broadway embeds errors in the row (``Message.status``, reference
``lib/broadway/message.ex:52-56``, ``Message.failed/2`` at 167-170)
and diverts failed rows instead of raising
(``lib/broadway/topology/processor_stage.ex:78-95``). We mirror that
with a ``status STRUCT<ok BOOLEAN, reason STRING, stage STRING>``
column: failures are data, the pipeline never throws, and the failed
branch flows to a dead-letter sink.

Both branches of a split share one physical scan under AQE; the filter
is a codegen'd predicate, so at 100 TB the split costs one pass.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

STATUS_COL = "status"


def with_status(
    df: DataFrame,
    fail_when: Column,
    reason: Column | str = "failed",
    stage: str = "processor",
) -> DataFrame:
    """Attach the status error-channel column.

    ``fail_when`` marks rows as failed (mirrors a handle_message callback
    calling ``Message.failed/2``); ``reason`` may be a literal or column.
    Rows already failed by an earlier stage stay failed — first failure
    wins, like the reference where a failed message skips later stages.
    """
    reason_col = F.lit(reason) if isinstance(reason, str) else reason
    new_status = F.when(
        fail_when,
        F.struct(
            F.lit(False).alias("ok"),
            reason_col.alias("reason"),
            F.lit(stage).alias("stage"),
        ),
    ).otherwise(
        F.struct(
            F.lit(True).alias("ok"),
            F.lit(None).cast("string").alias("reason"),
            F.lit(None).cast("string").alias("stage"),
        )
    )
    if STATUS_COL in df.columns:
        prev = F.col(STATUS_COL)
        merged = F.when(~prev.getField("ok"), prev).otherwise(new_status)
        return df.withColumn(STATUS_COL, merged)
    return df.withColumn(STATUS_COL, new_status)


def split_failures(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(ok_df, failed_df) — the forward path and the dead-letter path.

    Mirrors ``processor_stage.ex:78-95`` splitting successful vs failed
    after each processing stage.
    """
    ok = df.filter(F.col(STATUS_COL).getField("ok"))
    failed = df.filter(~F.col(STATUS_COL).getField("ok"))
    return ok, failed
