"""Z-order (Morton) data layout — the OPTIMIZE ZORDER primitive.

Multi-dimensional data skipping: interleave the bits of two
range-normalized keys so rows close in EITHER dimension land close in
the one-dimensional sort order, then range-partition the write on the
Morton code. Each output file then covers a narrow min/max extent on
BOTH columns, which is exactly what parquet row-group / file-level
stats pruning needs for predicates on either key.

Everything is pure integer arithmetic (DIV / %), so the same formula
runs as codegen in Spark and verbatim SQL in DuckDB (the oracle twin
of `__spark_entry__.q_pack_zorder`). No UDFs, no bit intrinsics.

`write_zordered` + `file_extents` make the claim testable: write a
table z-ordered, read back per-file extents, and assert they are
narrow (tests/test_round7_ops.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

Z_BITS = 8  # interleaved bits per (range-normalized) dimension


def znorm_expr(col: str, lo: str, hi: str, div_op: str = "DIV") -> str:
    """Range-normalize ``col`` into [0, 2^Z_BITS) by integer division.
    ``div_op`` is ``DIV`` for Spark SQL, ``//`` for DuckDB."""
    return (
        f"(((CAST({col} AS BIGINT) - {lo}) * {1 << Z_BITS})"
        f" {div_op} ({hi} - {lo} + 1))"
    )


def zorder_expr(xexpr: str, yexpr: str, div_op: str = "DIV") -> str:
    """Bit-interleave (Morton code) of two Z_BITS-wide values as pure
    integer arithmetic."""
    terms = []
    for i in range(Z_BITS):
        terms.append(
            f"((({xexpr}) {div_op} {1 << i}) % 2) * {1 << (2 * i)}"
        )
        terms.append(
            f"((({yexpr}) {div_op} {1 << i}) % 2) * {1 << (2 * i + 1)}"
        )
    return " + ".join(terms)


def with_zcode(df: DataFrame, xcol: str, ycol: str) -> DataFrame:
    """Add a ``__z`` Morton-code column over two numeric columns,
    range-normalized from a broadcast 1-row bounds aggregate."""
    bounds = df.agg(
        F.min(xcol).cast("bigint").alias("__xlo"),
        F.max(xcol).cast("bigint").alias("__xhi"),
        F.min(ycol).cast("bigint").alias("__ylo"),
        F.max(ycol).cast("bigint").alias("__yhi"),
    )
    xn = znorm_expr(xcol, "__xlo", "__xhi")
    yn = znorm_expr(ycol, "__ylo", "__yhi")
    return (
        df.crossJoin(F.broadcast(bounds))
        .withColumn(
            "__z", F.expr(f"CAST(({zorder_expr(xn, yn)}) AS BIGINT)")
        )
        .drop("__xlo", "__xhi", "__ylo", "__yhi")
    )


def write_zordered(
    df: DataFrame, xcol: str, ycol: str, path: str, n_files: int = 8
) -> None:
    """Write ``df`` as parquet z-ordered on (xcol, ycol): compute the
    Morton code, range-partition on it (one file per contiguous
    z-range), sort within partitions, drop the helper column. At
    cluster scale this is the OPTIMIZE ZORDER rewrite; file/row-group
    stats then prune on either key."""
    (
        with_zcode(df, xcol, ycol)
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )


def file_extents(
    spark: SparkSession, path: str, cols: list[str]
) -> DataFrame:
    """Per-file min/max extents of ``cols`` — what a stats-pruning
    reader sees. One scan grouped by input_file_name()."""
    df = spark.read.parquet(path).withColumn(
        "__file", F.input_file_name()
    )
    aggs = [F.count(F.lit(1)).alias("n")]
    for c in cols:
        aggs.append(F.min(c).alias(f"{c}_min"))
        aggs.append(F.max(c).alias(f"{c}_max"))
    return df.groupBy("__file").agg(*aggs)


def write_bucketed(
    df: DataFrame,
    table: str,
    path: str,
    bucket_cols: list[str],
    num_buckets: int,
    sort_cols: list[str] | None = None,
) -> None:
    """Persist ``df`` as a BUCKETED parquet table (external, at
    ``path``): rows are hash-partitioned into ``num_buckets`` files
    per write-task group on ``bucket_cols``, optionally sorted within
    buckets, and the bucket spec is recorded in the catalog. A join
    or aggregation keyed on ``bucket_cols`` between tables bucketed
    the SAME way then reads co-located data and plans with NO
    Exchange on the bucketed sides — the shuffle is paid once at
    write time and amortized over every downstream query, which is
    the canonical 100 TB strategy for a fact table joined on the
    same key by many consumers (Spark's equivalent of Hive bucketing
    / Iceberg bucket partition transforms).

    ``saveAsTable`` (not ``save``) is required: bucket metadata lives
    in the catalog, and a path-only parquet read cannot recover it.
    Mode is overwrite, so re-running is idempotent."""
    writer = (
        df.write.mode("overwrite")
        .option("path", path)
        .bucketBy(num_buckets, *bucket_cols)
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.format("parquet").saveAsTable(table)


class InjectedLayoutCrash(RuntimeError):
    """Raised by publish_bucketed_pair's fault-injection seam."""


def publish_bucketed_pair(
    specs: list[tuple[DataFrame, str, str, list[str], int]],
    manifest_path: str,
    version: str,
    fail_between: bool = False,
) -> list[str]:
    """TRANSACTIONAL two-table bucketed layout: write every table of
    the pair under a version-suffixed catalog name and path, then
    publish them ALL in one atomic manifest rename. Readers resolve
    table names through the manifest, so a crash after the first
    write but before the second (the exact window a naive two-write
    layout job leaves torn) is invisible: the manifest still names
    the previous consistent pair (or nothing), and the orphaned
    versioned staging table is ignorable garbage a later publish
    never reads. This is the s21 manifest-commit pattern applied to
    the bucketed-layout write path.

    After a successful publish, the PREVIOUS manifest version's tables
    and data paths are garbage-collected (the Iceberg/Delta
    expire-snapshots step at its minimum size): superseded staging
    tables would otherwise accumulate in the catalog/warehouse without
    bound across publishes. GC runs strictly AFTER the atomic rename,
    so a crash anywhere before it leaves the old version fully
    readable — readers never see a window with neither version intact.

    ``specs``: (df, table_base_name, path_base, bucket_cols,
    num_buckets) per table. ``fail_between=True`` raises
    InjectedLayoutCrash after the first table's write — the
    kill-between-the-writes fault the restart twin drives.
    Returns the published versioned table names."""
    import json
    import os

    spark = specs[0][0].sparkSession
    try:
        with open(manifest_path) as fh:
            prev = json.load(fh)
    except FileNotFoundError:
        prev = None
    names, paths = [], []
    for i, (df, tname, pbase, cols, n) in enumerate(specs):
        versioned = f"{tname}_{version}"
        vpath = f"{pbase}_{version}"
        write_bucketed(df, versioned, vpath, cols, n)
        names.append(versioned)
        paths.append(vpath)
        if fail_between and i == 0:
            raise InjectedLayoutCrash(
                "injected crash between bucketed writes"
            )
    tmp = manifest_path + ".tmp"
    with open(tmp, "w") as fh:
        json.dump({"version": version, "tables": names, "paths": paths}, fh)
    os.rename(tmp, manifest_path)
    if prev is not None and prev.get("version") != version:
        drop_layout_tables(
            spark, prev.get("tables", []), prev.get("paths", [])
        )
    return names


def drop_layout_tables(
    spark: SparkSession, tables: list[str], paths: list[str]
) -> None:
    """Best-effort GC of superseded/orphaned versioned layout tables:
    drop the catalog entries, then remove the external data dirs
    (saveAsTable with an explicit path makes EXTERNAL tables, so DROP
    alone leaves the parquet behind)."""
    import shutil

    for t in tables:
        spark.sql(f"DROP TABLE IF EXISTS `{t}`")
    for p in paths:
        shutil.rmtree(p, ignore_errors=True)


def read_bucketed_pair(
    spark: SparkSession, manifest_path: str
) -> list[DataFrame]:
    """Resolve the current consistent bucketed pair via the manifest.
    Raises FileNotFoundError if no version was ever published — the
    correct outcome after a crash that preceded the first commit."""
    import json

    with open(manifest_path) as fh:
        m = json.load(fh)
    return [spark.table(t) for t in m["tables"]]
