"""Skew mitigation: salting for hot keys.

At 100 TB a handful of hot keys (a viral user, a default tenant, an
empty-string key) can pin one reducer while 999 executors idle. AQE's
skew-join handling covers sort-merge joins; these helpers cover the
cases it doesn't:

- ``salted_aggregate``: two-phase aggregation — salt the key, partial
  aggregate on (key, salt), then final aggregate on key. Correct for
  any algebraic aggregate expressed as (partial, merge) pairs.
- ``salted_broadcast_left``: replicate the broadcast side across salt
  values so a skewed stream side still spreads over `salt_n` tasks.

Salting is deterministic (pmod of a hash on a uniformly-distributed
column, or a random-free row hash) so results stay reproducible.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, salt_n: int, from_cols: Sequence[str] | None = None) -> DataFrame:
    """Add a deterministic __salt column in [0, salt_n).

    Derived from a hash of ``from_cols`` (default: all columns), so the
    same row always gets the same salt — no RNG, re-runnable, and
    oracle-friendly.
    """
    cols = list(from_cols) if from_cols else df.columns
    return df.withColumn(
        "__salt", F.pmod(F.xxhash64(*[F.col(c) for c in cols]), F.lit(salt_n))
    )


def salted_aggregate(
    df: DataFrame,
    key_cols: Sequence[str],
    aggs: dict[str, tuple[Column, Column]],
    salt_n: int = 16,
    salt_from: Sequence[str] | None = None,
) -> DataFrame:
    """Two-phase aggregation over possibly-skewed keys.

    ``aggs`` maps output name → (partial_agg_expr, merge_agg_expr) where
    the partial runs per (key, salt) and the merge combines partials per
    key — e.g. ``{"n": (F.count(F.lit(1)), F.sum("n")), "s":
    (F.sum("x"), F.sum("s"))}``. The first shuffle spreads a hot key
    over ``salt_n`` reducers; the second handles only salt_n rows/key.
    """
    salted = with_salt(df, salt_n, salt_from)
    partial = salted.groupBy(*key_cols, "__salt").agg(
        *[expr.alias(name) for name, (expr, _merge) in aggs.items()]
    )
    return partial.groupBy(*key_cols).agg(
        *[merge.alias(name) for name, (_expr, merge) in aggs.items()]
    )


def salted_broadcast_left(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    salt_n: int = 16,
) -> DataFrame:
    """Join a skewed ``left`` against a small ``right``: the right side
    is broadcast (replication across salts is free — every executor
    holds the whole table), the left spreads naturally. Exists mainly
    to document the decision; a plain broadcast join already avoids
    key-based shuffles entirely.
    """
    return left.join(F.broadcast(right), list(on))
