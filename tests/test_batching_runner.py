"""apply_per_batch_streamed must honor the exact handle_batch contract
of applyInPandas — fn sees each batch whole, exactly once — including
when a group spans many Arrow chunks (the carry-tail path)."""

import pandas as pd
from pyspark.sql import functions as F

from broadway_spark.operators.batching import (
    apply_per_batch,
    apply_per_batch_streamed,
)


def _per_batch(pdf: pd.DataFrame) -> pd.DataFrame:
    # One output row per invocation: if fn ever saw a partial group,
    # n/min/max would disagree with the grouped-API reference run.
    return pd.DataFrame(
        {
            "k": [pdf["k"].iloc[0]],
            "n": [len(pdf)],
            "lo": [int(pdf["v"].min())],
            "hi": [int(pdf["v"].max())],
        }
    )


def test_streamed_equals_grouped_with_chunk_spanning_groups(spark):
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "128")
    try:
        # key 'big' (1000 rows) spans ~8 Arrow chunks; 60 small keys
        # exercise many cuts per chunk.
        rows = [("big", i) for i in range(1000)] + [
            (f"k{j:02d}", 10_000 + j * 10 + i) for j in range(60) for i in range(5)
        ]
        df = spark.createDataFrame(rows, "k string, v long")
        schema = "k string, n long, lo long, hi long"
        got = {
            tuple(r)
            for r in apply_per_batch_streamed(
                df, ["k"], _per_batch, schema, num_partitions=4
            ).collect()
        }
        want = {
            tuple(r)
            for r in apply_per_batch(df, ["k"], _per_batch, schema).collect()
        }
        assert got == want
        assert ("big", 1000, 0, 999) in got
        assert len(got) == 61  # every key exactly once
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)


def test_streamed_empty_input(spark):
    df = spark.createDataFrame([], "k string, v long")
    out = apply_per_batch_streamed(
        df, ["k"], _per_batch, "k string, n long, lo long, hi long"
    )
    assert out.count() == 0
