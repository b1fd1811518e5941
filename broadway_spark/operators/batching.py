"""Batch assembly: group rows into bounded batches by key + size/budget.

Broadway's batcher stage accumulates per ``batch_key`` and emits when a
size or budget threshold is reached (reference
``lib/broadway/topology/batcher_stage.ex:108-221``; custom splitter
``lib/broadway/options.ex:233-264``). The batch-relational translation:

- size batching  → ``floor((row_number() - 1) / batch_size)`` per key
- budget batching → exclusive running sum of a weight, integer-divided
  by the budget (a row opens a new chunk once the previous rows have
  consumed a full budget multiple)

Both are single window functions over ``(key, order)`` — one shuffle on
the batch key, then linear per-partition work; skewed keys are the only
scale hazard (same caveat the reference documents for partition_by,
``lib/broadway.ex:579-597``) and AQE skew handling applies.

``apply_per_batch`` is the ``handle_batch/4`` analogue
(``lib/broadway.ex:1001-1029``): one pandas DataFrame per materialized
batch via Arrow-vectorized ``applyInPandas``.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

CHUNK_COL = "chunk_id"


def chunk_by_size(
    df: DataFrame,
    key_cols: Sequence[str],
    order_col: str,
    batch_size: int = 100,
) -> DataFrame:
    """Assign ``chunk_id`` so each (key, chunk) has ≤ batch_size rows.

    Default size 100 mirrors the reference default
    (``lib/broadway/options.ex:233-237``).
    """
    w = Window.partitionBy(*key_cols).orderBy(order_col)
    return df.withColumn(
        CHUNK_COL,
        F.floor((F.row_number().over(w) - F.lit(1)) / F.lit(batch_size)),
    )


def chunk_by_budget(
    df: DataFrame,
    key_cols: Sequence[str],
    order_col: str,
    weight_col: str,
    budget: float,
) -> DataFrame:
    """Assign ``chunk_id`` by a cumulative weight budget per key.

    The batch analogue of the ``{init_acc, fun}`` custom splitter
    (``options.ex:233-264``): a row belongs to chunk
    ``floor(prefix_weight_before_row / budget)``. The exclusive prefix
    sum is the inclusive running sum minus the row's own weight —
    deterministic given a total order within the key.
    """
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum(F.col(weight_col)).over(w)
    return df.withColumn(
        CHUNK_COL, F.floor((cum - F.col(weight_col)) / F.lit(budget))
    )


def apply_per_batch(
    df: DataFrame,
    key_cols: Sequence[str],
    fn: Callable[[pd.DataFrame], pd.DataFrame],
    schema: str,
) -> DataFrame:
    """Run ``fn`` once per materialized batch (the handle_batch hook).

    Spark guarantees one group → one task, so per-batch code sees the
    whole batch exactly once, like the reference's batch processor
    (``batch_processor_stage.ex:52-127``). ``fn`` gets and returns a
    pandas DataFrame; exchange is Arrow-batched.
    """
    return df.groupBy(*key_cols).applyInPandas(fn, schema=schema)


def apply_per_batch_streamed(
    df: DataFrame,
    key_cols: Sequence[str],
    fn: Callable[[pd.DataFrame], pd.DataFrame],
    schema: str,
    num_partitions: int | None = None,
) -> DataFrame:
    """``apply_per_batch`` without the per-group dispatch tax.

    ``applyInPandas`` makes one Python roundtrip per GROUP — at
    millions of small batch keys the fixed ~ms cost per group dwarfs
    the work (measured 14× over the JVM equivalent at 1500 groups).
    Here rows are hash-repartitioned and sorted by key, and each
    partition streams through ``mapInPandas`` as large Arrow chunks;
    group boundaries are cut client-side (a group's rows are contiguous
    after the sort, and the chunk tail holding a possibly-unfinished
    group is carried into the next chunk). ``fn`` still sees exactly
    one complete pandas DataFrame per batch — the handle_batch contract
    is unchanged — but Python is entered once per Arrow chunk, not once
    per key.

    Memory bound: one Arrow chunk + one in-flight group per task, same
    order as applyInPandas's largest-group bound. Keys must be
    non-null (the envelope's batch_key defaults to 'default'; NaN
    equality would mis-cut the carry tail).
    """
    key_cols = list(key_cols)
    spark = df.sparkSession
    n = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    parted = df.repartition(n, *key_cols).sortWithinPartitions(*key_cols)

    def runner(chunks):
        carry: pd.DataFrame | None = None

        def run_groups(pdf: pd.DataFrame):
            outs = [
                fn(g.reset_index(drop=True))
                for _, g in pdf.groupby(key_cols, sort=False, dropna=False)
            ]
            return pd.concat(outs, ignore_index=True) if outs else None

        for pdf in chunks:
            if carry is not None:
                pdf = pd.concat([carry, pdf], ignore_index=True)
                carry = None
            if not len(pdf):
                continue
            # Rows are key-sorted: the final key's rows are a suffix.
            last = pdf[key_cols].iloc[-1]
            tail_mask = (pdf[key_cols] == last.values).all(axis=1)
            carry = pdf[tail_mask]
            head = pdf[~tail_mask]
            out = run_groups(head)
            if out is not None:
                yield out
        if carry is not None and len(carry):
            out = run_groups(carry)
            if out is not None:
                yield out

    return parted.mapInPandas(runner, schema=schema)
