"""Blocked fuzzy (edit-distance) joins — the entity-resolution
primitive.

The classic ER design (Christen, "Data Matching", 2012): never compare
all pairs; hash both sides into candidate blocks with a cheap blocking
key, run the expensive distance only within blocks, and accept the
blocking function as the declared recall boundary. On Spark the block
key becomes an AQE-skew-eligible equi-join key, so a hot block (a very
common head token) splits across reducers instead of stalling one.

Used by `__spark_entry__.q_j4_fuzzy_names`; exact-within-blocks is
property-tested against a brute-force Levenshtein in
`tests/test_round7_ops.py`.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def head_token_block(col: Column) -> Column:
    """Default blocking key: the first whitespace token."""
    return F.split_part(col, F.lit(" "), F.lit(1))


def blocked_fuzzy_join(
    left: DataFrame,
    right: DataFrame,
    left_col: str,
    right_col: str,
    max_dist: int = 3,
    block_fn: Callable[[Column], Column] = head_token_block,
    self_dedup: bool = False,
) -> DataFrame:
    """Pairs (left row, right row) whose string columns sit within
    Levenshtein ``max_dist``, compared only inside equal blocking-key
    groups.

    ``self_dedup=True`` (for self-joins) keeps only canonically
    ordered pairs (left value < right value), halving the candidate
    set and dropping self-matches. Output: every left column (as-is),
    every right column, plus ``dist``. Collisions between column
    names should be resolved by aliasing before the call.

    Scale shape: each side is scanned once; the join shuffles on the
    block key only; the Levenshtein runs post-join inside blocks. If
    a side holds duplicated strings, DISTINCT-aggregate it first so
    the block join pairs unique values (see q_j4_fuzzy_names).
    """
    lb = left.withColumn("__blk", block_fn(F.col(left_col)))
    rb = right.withColumn("__blk", block_fn(F.col(right_col)))
    joined = lb.join(rb, "__blk")
    if self_dedup:
        joined = joined.where(F.col(left_col) < F.col(right_col))
    return (
        joined.withColumn(
            "dist",
            F.levenshtein(F.col(left_col), F.col(right_col)).cast(
                "bigint"
            ),
        )
        .where(F.col("dist") <= max_dist)
        .drop("__blk")
    )
