"""Distributed global ranking — exact row_number / ntile over a total
order WITHOUT a single-task window.

``Window.orderBy(...)`` with no partition key moves every row through
ONE task: correct at any size, catastrophic past ~10⁷ rows (the r9
verdict's `agg_deciles` finding). Spark's own global *sort* does not
have this problem — it range-partitions — so this module recreates the
window semantics on top of the sort's strategy:

1. ``repartitionByRange`` on the sort expressions (the same sampled
   range partitioner a global ORDER BY uses — every partition holds a
   contiguous slice of the total order),
2. ``row_number`` WITHIN each range partition (distributed window,
   one partition per task),
3. per-partition row counts (a ≤num_partitions-row aggregate,
   collected driver-side like the other k-row scalar sites) turned
   into broadcast cumulative offsets,
4. global rank = partition offset + local row_number.

The result is EXACTLY ``row_number() OVER (ORDER BY ...)`` — provided
the sort expressions form a strict total order (callers must include a
unique tiebreak column, same as any deterministic ranking) — and
``exact ntile`` derives the tile from (rank, n) with PostgreSQL/Spark
ntile semantics: the first ``n MOD t`` tiles get ``n DIV t + 1`` rows.
Range-partitioner boundary placement (sampling) does not affect the
answer: with a strict total order, ANY contiguous split yields the
same global ranks.

Scale shape: one range shuffle + one hash shuffle on the partition id
(both full-width but parallel), one broadcast of ≤P offset rows. At
10⁹ input rows this is the plan a 1000-executor cluster wants; the
old single-task ntile is the plan it cannot run.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .materialize import materialize, shuffle_partitions


def global_rank(
    df: DataFrame,
    order_by: list[Column],
    rank_col: str = "__rank",
    num_partitions: int | None = None,
) -> tuple[DataFrame, int]:
    """Add an exact 1-based global rank over ``order_by`` (which must
    be a strict total order — include a unique tiebreak). Returns
    ``(ranked_df, total_rows)``; the total is known driver-side as a
    byproduct of the offset computation and is handed back so callers
    can fold it into literals instead of an extra count job.

    Lifecycle: pins one cached frame per call (``materialize``);
    long-lived sessions must call ``materialize.release_all()``
    between queries or run with the ``staging`` strategy."""
    spark = df.sparkSession
    if num_partitions is None:
        num_partitions = shuffle_partitions(spark)
    ranged = df.repartitionByRange(num_partitions, *order_by).withColumn(
        "__gr_pid", F.spark_partition_id()
    )
    # Barrier: freeze the pid assignment before the two consumers
    # (counts + the ranked join) fan out — without it each branch
    # re-runs the sampled range partitioner independently.
    ranged = materialize(ranged, "global_rank")
    counts = {
        r["__gr_pid"]: r["cnt"]
        for r in ranged.groupBy("__gr_pid")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()  # ≤ num_partitions rows — a k-row scalar collect
    }
    offsets, acc = [], 0
    for pid in sorted(counts):  # range partitions ARE the total order
        offsets.append((pid, acc))
        acc += counts[pid]
    off_df = spark.createDataFrame(
        offsets or [(0, 0)], "__gr_pid int, __gr_off long"
    )
    w_local = Window.partitionBy("__gr_pid").orderBy(*order_by)
    ranked = (
        ranged.join(F.broadcast(off_df), "__gr_pid")
        .withColumn(
            rank_col,
            (F.col("__gr_off") + F.row_number().over(w_local)).cast("long"),
        )
        .drop("__gr_pid", "__gr_off")
    )
    return ranked, acc


def exact_ntile_col(rank_col: str, n_rows: int, n_tiles: int) -> Column:
    """The tile of global rank ``rank_col`` under ntile(n_tiles) over
    ``n_rows`` total rows — pure integer arithmetic on literals
    (PostgreSQL/Spark/DuckDB ntile semantics: first n%t tiles hold
    ⌈n/t⌉ rows). ⌈a/b⌉ is (a+b-1) DIV b throughout: exact at any
    BIGINT rank, no float."""
    base, rem = divmod(max(n_rows, 0), n_tiles)
    if base == 0:
        # fewer rows than tiles: tile = rank (ntile's degenerate case)
        return F.col(rank_col).cast("int")
    cut = rem * (base + 1)
    return F.expr(
        f"CAST(CASE WHEN {rank_col} <= {cut}"
        f" THEN ({rank_col} + {base}) DIV {base + 1}"
        f" ELSE {rem} + ({rank_col} - {cut} + {base} - 1) DIV {base}"
        f" END AS INT)"
    )


def exact_ntile_cols(rank_col: str, n_col: str, n_tiles: int) -> Column:
    """``exact_ntile_col`` with the partition row count carried as a
    COLUMN — for per-key ntile where n varies by key (the per-key
    totals are a tiny broadcast-joined aggregate). Same closed form,
    all integer ops, exact at any BIGINT rank."""
    t = int(n_tiles)
    base = f"({n_col} DIV {t})"
    rem = f"({n_col} % {t})"
    cut = f"({rem} * ({base} + 1))"
    return F.expr(
        f"CAST(CASE WHEN {base} = 0 THEN {rank_col}"
        f" WHEN {rank_col} <= {cut}"
        f" THEN ({rank_col} + {base}) DIV ({base} + 1)"
        f" ELSE {rem} + ({rank_col} - {cut} + {base} - 1) DIV {base}"
        f" END AS INT)"
    )


def with_exact_ntile(
    df: DataFrame,
    order_by: list[Column],
    n_tiles: int,
    tile_col: str,
    num_partitions: int | None = None,
) -> DataFrame:
    """``ntile(n_tiles) OVER (ORDER BY order_by)`` as a distributed
    plan: global_rank + the closed-form tile expression. Exactly
    equal to the window function for any strict total order."""
    ranked, n = global_rank(
        df, order_by, rank_col="__nt_rank", num_partitions=num_partitions
    )
    return ranked.withColumn(
        tile_col, exact_ntile_col("__nt_rank", n, n_tiles)
    ).drop("__nt_rank")


def topk_per_group(
    df: DataFrame,
    key_cols: list[str],
    order_by: list[Column],
    k,
    rank_col: str = "rank",
    num_partitions: int | None = None,
) -> DataFrame:
    """EXACT top-k per group at ANY group cardinality — including the
    case Spark's own machinery mishandles: for a LITERAL small k over
    high-cardinality keys, Catalyst's WindowGroupLimit already bounds
    the per-partition sort and a plain rank window is the right plan;
    but with a LOW-cardinality group domain (a handful of languages /
    flags), or a DYNAMIC k (a column/quota Catalyst can't push), the
    rank window funnels every group's full stream through one task.
    Here the rank is a running count on the distributed prefix-sum
    core (``batching.running_sums_distributed``) — range blocks +
    broadcast offsets — so parallelism scales with partitions, never
    with |groups|.

    ``k`` may be an int or a Column (dynamic per-row quota, e.g. a
    broadcast per-group budget). ``order_by`` must be a strict total
    order within each group (include a unique tiebreak). Output keeps
    all input columns plus ``rank_col`` (1-based within group).
    """
    from .batching import running_sums_distributed

    ranked = running_sums_distributed(
        df,
        key_cols,
        order_by,
        {rank_col: F.lit(1).cast("long")},
        num_partitions=num_partitions,
    )
    limit = k if isinstance(k, Column) else F.lit(int(k))
    return ranked.filter(F.col(rank_col) <= limit)
