"""Temporal operators Spark lacks as single primitives: as-of join and
session windows (sessionization).

Both are built shuffle-minimal:

- ``asof_join``: the union + partitioned-sort + running ``last(...,
  ignorenulls)`` formulation — ONE shuffle on the join key and one sort,
  instead of the naive per-left-row correlated lookup or a range-join
  explosion. This is the plan that survives 100 TB: both inputs shuffle
  once by key, each partition is a single ordered pass.
- ``sessionize``: Spark's native ``session_window`` (streaming-capable;
  state-store backed with watermarks in streaming mode), which is a
  single keyed aggregation.

The reference (dashbitco/broadway) has no temporal joins — these are
engine extensions in the spirit of its per-key ordered processing
(`lib/broadway/topology/batcher_stage.ex:28-36` routes a key to one
ordered stage; an as-of merge is the classic thing one does there).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def ts_micros(col: Column | str) -> Column:
    """Epoch microseconds of a timestamp column, tolerant of both
    TIMESTAMP and TIMESTAMP_NTZ inputs. ``unix_micros`` only accepts
    TIMESTAMP; parquet written with ``isAdjustedToUTC=false`` loads as
    TIMESTAMP_NTZ, and the session timezone is pinned to UTC
    (broadway_spark/session.py), so the cast is the identity
    interpretation (naive == UTC) and matches DuckDB's epoch math."""
    c = F.col(col) if isinstance(col, str) else col
    return F.unix_micros(c.cast("timestamp"))


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    order_col: str,
    suffix: str = "_right",
    tolerance: str | None = None,
    direction: str = "backward",
) -> DataFrame:
    """Backward (inclusive) as-of join: for every left row, attach the
    ``right_cols`` of the most recent right row with the same key and
    ``right_ts <= left_ts``. With ``direction="forward"``, the mirror:
    the EARLIEST right row with ``right_ts >= left_ts`` (the
    look-ahead attribution form — "next event after"), implemented by
    flipping the single sort's direction; the plan shape (one shuffle,
    one sort, zero joins) is identical, and ``tolerance`` bounds how
    far AHEAD the match may be.

    Ties on the timestamp are broken deterministically: right rows sort
    before left rows at equal ts (inclusive semantics), and among right
    rows the one with the greatest ``order_col`` wins.

    ``tolerance`` (a Spark interval string, e.g. ``"2 hours"``) bounds
    the staleness, matching the pandas/polars/kdb ``tolerance`` knob: a
    match older than ``left_ts - tolerance`` is nulled out (the left
    row still emits — an as-of join never drops left rows). The filter
    is a post-window per-row predicate, so the plan shape (one shuffle,
    one sort, zero joins) is unchanged.

    Implementation: tag + union both sides, then one window per right
    column — ``last(col, ignorenulls=True)`` over rows from the
    partition start to the current row — and keep only left rows. One
    hash shuffle on ``on``, one sort per partition, zero joins.
    """
    lcols = [c for c in left.columns if c not in on and c != left_ts]
    l_tagged = left.select(
        *[F.col(c) for c in on],
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__is_l"),
        # -1, not NULL: Spark sorts nulls first on ASC, DuckDB last —
        # a constant sidesteps the divergence entirely.
        F.lit(-1).cast("long").alias("__ord"),
        *[F.col(c).alias(c) for c in lcols],
        *[F.lit(None).cast(dict(right.dtypes)[c]).alias(c + suffix) for c in right_cols],
    )
    r_tagged = right.select(
        *[F.col(c) for c in on],
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__is_l"),
        F.col(order_col).cast("long").alias("__ord"),
        *[F.lit(None).cast(dict(left.dtypes)[c]).alias(c) for c in lcols],
        *[F.col(c).alias(c + suffix) for c in right_cols],
    )
    if direction not in ("backward", "forward"):
        raise ValueError(f"asof_join direction {direction!r}")
    unioned = l_tagged.unionByName(r_tagged)
    ts_order = (
        F.col("__ts").asc() if direction == "backward" else F.col("__ts").desc()
    )
    w = (
        Window.partitionBy(*on)
        .orderBy(ts_order, F.col("__is_l").asc(), F.col("__ord").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.select(
        *on,
        "__ts",
        "__is_l",
        *lcols,
        *[
            F.last(F.col(c + suffix), ignorenulls=True).over(w).alias(c + suffix)
            for c in right_cols
        ],
        F.last(
            F.when(F.col("__is_l") == 0, F.col("__ts")), ignorenulls=True
        ).over(w).alias("__matched_ts"),
    )
    out = (
        filled.filter(F.col("__is_l") == 1)
        .drop("__is_l")
        .withColumnRenamed("__ts", left_ts)
        .withColumnRenamed("__matched_ts", "matched_ts")
    )
    if tolerance is not None:
        fresh = (
            F.col("matched_ts")
            >= F.col(left_ts) - F.expr(f"INTERVAL {tolerance}")
            if direction == "backward"
            else F.col("matched_ts")
            <= F.col(left_ts) + F.expr(f"INTERVAL {tolerance}")
        )
        for c in right_cols:
            out = out.withColumn(
                c + suffix, F.when(fresh, F.col(c + suffix))
            )
        out = out.withColumn(
            "matched_ts", F.when(fresh, F.col("matched_ts"))
        )
    return out


def follow_within(
    df: DataFrame,
    keys: list[str],
    ts_col: str,
    window: str = "5 minutes",
    id_col: str = "event_id",
    cols: list[str] | None = None,
    suffix: str = "_b",
) -> DataFrame:
    """Bounded range self-join: all pairs (a, b) sharing ``keys`` with
    ``a.ts <= b.ts <= a.ts + window`` and ``a.id != b.id`` ("which
    events follow a within the window").

    Scale formulation: a naive theta join (``b.ts BETWEEN a.ts AND
    a.ts + W``) compiles to BroadcastNestedLoopJoin/Cartesian and dies
    at 100 TB. Instead both sides get a time bucket ``floor(ts / W)``;
    the left side is exploded into buckets {k, k+1} (any b within W of
    a lands in one of those two), the join is a plain **equi-join** on
    (keys..., bucket) — one hash shuffle, AQE-skew-splittable — and the
    exact range predicate filters the candidates. The left row's two
    buckets are distinct, so no dedup pass is needed.

    ``window`` must be a Spark interval string ("5 minutes"). ``cols``
    are the payload columns carried for both sides (default: all non-key
    non-ts non-id columns are dropped; id + ts always carried).
    """
    cols = cols or []
    sec = ts_micros(ts_col)
    win_us = F.expr(f"unix_micros(timestamp '1970-01-01 00:00:00Z' + interval {window})")
    bucket = F.floor(sec / win_us)
    base = df.select(
        *keys,
        F.col(id_col),
        F.col(ts_col),
        *cols,
        bucket.alias("__bk"),
    )
    a = base.withColumn("__bks", F.array(F.col("__bk"), F.col("__bk") + 1)).select(
        *keys,
        F.col(id_col),
        F.col(ts_col),
        *cols,
        F.explode("__bks").alias("__bk"),
    )
    b = base.select(
        *[F.col(k) for k in keys],
        F.col(id_col).alias(id_col + suffix),
        F.col(ts_col).alias(ts_col + suffix),
        *[F.col(c).alias(c + suffix) for c in cols],
        "__bk",
    )
    joined = a.join(b, [*keys, "__bk"]).drop("__bk")
    ts_a, ts_b = F.col(ts_col), F.col(ts_col + suffix)
    return joined.filter(
        (ts_b >= ts_a)
        & (ts_micros(ts_b) - ts_micros(ts_a) <= win_us)
        & (F.col(id_col) != F.col(id_col + suffix))
    )


def sessionize(
    df: DataFrame,
    ts_col: str,
    key_cols: list[str],
    gap: str = "30 minutes",
    aggs: list[Column] | None = None,
) -> DataFrame:
    """Session windows: group rows per key into activity sessions where
    consecutive events are less than ``gap`` apart.

    Uses Spark's native ``session_window`` — a single keyed aggregation
    (map-side partial merge of overlapping candidate sessions, one
    shuffle on the key), and the same call works on a streaming
    DataFrame with a watermark (state-store sessions with timeout).

    Returns one row per (key, session): session start/end timestamps
    plus the caller's aggregates.
    """
    aggs = aggs or [F.count(F.lit(1)).alias("n_events")]
    sw = F.session_window(F.col(ts_col), gap)
    return (
        df.groupBy(sw.alias("__w"), *[F.col(k) for k in key_cols])
        .agg(*aggs)
        .withColumn("session_start", F.col("__w.start"))
        .withColumn("session_end", F.col("__w.end"))
        .drop("__w")
    )


def session_journeys(
    df: DataFrame,
    ts_col: str,
    key_cols: list[str],
    seq_col: Column | str,
    order_cols: list[str] | None = None,
    gap_minutes: int = 30,
    max_events: int = 64,
) -> DataFrame:
    """Per-session ordered event-sequence strings — the sessionized
    journey substrate (funnel regexes over what happens in ONE
    sitting, not a lifetime).

    Sessionization is the classic lag-gap + running-sum index: a row
    opens a new session when it arrives more than ``gap_minutes``
    after its predecessor within the key; the running sum of those
    breaks is the session index. The journey is then the
    concatenation of ``seq_col`` over the session's FIRST
    ``max_events`` rows — the rank filter runs before the collect, so
    per-session aggregation state is bounded by construction (the
    same hot-user discipline as the lifetime journey substrate; a bot
    key with 10⁷ events in one session still holds ≤ ``max_events``
    structs).

    Scale shape: two window passes and one aggregate, ALL keyed on
    the same high-cardinality (key, [session]) columns — one shuffle
    total (the session-index window's partitioning covers the rank
    window and the groupBy). ``order_cols`` must make the order a
    strict total order within a key (include a unique tiebreak).

    Returns one row per (key..., session_idx): ``journey`` plus
    ``n_events`` (pre-cap session size) and session start/end epoch
    micros. The reference has no sequence operators; this extends its
    per-key ordered processing (batcher_stage.ex:28-36) the same way
    asof_join does.
    """
    order_cols = order_cols or [ts_col]
    seq = F.col(seq_col) if isinstance(seq_col, str) else seq_col
    us = ts_micros(ts_col)
    w = Window.partitionBy(*key_cols).orderBy(*order_cols)
    gap_us = gap_minutes * 60 * 1_000_000
    # Two projections: a window function can't nest inside another
    # (lag inside the running sum) — same partitioning, so Catalyst
    # plans both passes over ONE exchange+sort.
    marked = df.select(
        *key_cols,
        *[c for c in order_cols if c not in key_cols],
        us.alias("__us"),
        seq.alias("__i"),
        F.when(us - F.lag(us).over(w) > F.lit(gap_us), 1)
        .otherwise(0)
        .alias("__new_s"),
    )
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sess = marked.withColumn(
        "session_idx", F.sum("__new_s").over(run)
    ).drop("__new_s")
    w_in = Window.partitionBy(*key_cols, "session_idx").orderBy(*order_cols)
    ranked = sess.withColumn("__rn", F.row_number().over(w_in))
    return (
        ranked.groupBy(*key_cols, "session_idx")
        .agg(
            F.array_join(
                F.expr(
                    "transform(array_sort(collect_list("
                    "  CASE WHEN __rn <= "
                    + str(int(max_events))
                    + " THEN struct(__rn, __i) END)), x -> x.__i)"
                ),
                "",
            ).alias("journey"),
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.min("__us").alias("session_start_us"),
            F.max("__us").alias("session_end_us"),
        )
    )
