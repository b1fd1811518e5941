"""Pluggable in-operator materialization barrier.

Several dedup operators compute a subtree that is read by multiple
plan branches (both sides of a candidate self-join plus the verify
join). Without a barrier Catalyst plans the subtree once per consumer
and re-executes the shingle explode / md5 hashing two or three times.
Two strategies, selected per call or globally:

- ``persist`` (default — single-node / interactive): ``cache()`` +
  an eager ``count()`` barrier. Cached frames are tracked so a suite
  driver can release them between queries (``release_all``) instead
  of letting cached blocks accumulate across a 150+-query run.
- ``staging`` (the 100 TB form): write the subtree to a parquet
  staging table and read it back. No executor-memory/cache pressure,
  the staged relation survives stage retries and executor loss, and
  each consumer scans it with its own column pruning — on a real
  cluster this is a path on the shared filesystem
  (``spark.broadway.materialize.stagingDir``).

Resolution order: explicit ``strategy`` arg → Spark conf
``spark.broadway.materialize.strategy`` → ``persist``.
"""

from __future__ import annotations

import shutil
import tempfile
import uuid
from pathlib import Path

from pyspark.sql import DataFrame

STRATEGY_CONF = "spark.broadway.materialize.strategy"
STAGING_DIR_CONF = "spark.broadway.materialize.stagingDir"

# Persisted frames / staged dirs awaiting cleanup. A suite driver
# calls release_all() between queries; leaving them tracked is safe
# (worst case: the old behavior, cache blocks held until session end).
# _STAGED_DIRS holds temp parents we created; _STAGED_PATHS holds every
# per-call stage table (including ones under a user-configured
# stagingDir) so a long suite run doesn't accumulate stage tables.
_PERSISTED: list[DataFrame] = []
_STAGED_DIRS: list[str] = []
_STAGED_PATHS: list[str] = []


def shuffle_partitions(spark, fallback: int = 32) -> int:
    """``spark.sql.shuffle.partitions`` as an int, tolerating the
    non-numeric values some platforms set it to (e.g. ``'auto'``)
    by falling back to ``defaultParallelism`` and then ``fallback``."""
    raw = spark.conf.get("spark.sql.shuffle.partitions", str(fallback))
    try:
        return int(raw)
    except (TypeError, ValueError):
        try:
            return int(spark.sparkContext.defaultParallelism)
        except Exception:
            return fallback


def materialize(
    df: DataFrame,
    name: str = "stage",
    strategy: str | None = None,
    staging_dir: str | None = None,
) -> DataFrame:
    """Materialize ``df`` once for multi-branch reuse; see module doc."""
    spark = df.sparkSession
    if strategy is None:
        strategy = spark.conf.get(STRATEGY_CONF, "persist")
    if strategy == "staging":
        if staging_dir is None:
            staging_dir = spark.conf.get(STAGING_DIR_CONF, None)
        if staging_dir is None:
            staging_dir = tempfile.mkdtemp(prefix="broadway_stage_")
            _STAGED_DIRS.append(staging_dir)
        path = str(Path(staging_dir) / f"{name}_{uuid.uuid4().hex[:12]}")
        df.write.mode("overwrite").parquet(path)
        _STAGED_PATHS.append(path)
        return spark.read.parquet(path)
    if strategy != "persist":
        raise ValueError(
            f"unknown materialize strategy {strategy!r} "
            "(expected 'persist' or 'staging')"
        )
    cached = df.persist()
    cached.count()  # eager barrier: fill the cache before fan-out
    _PERSISTED.append(cached)
    return cached


def release_all() -> None:
    """Unpersist every tracked frame and delete owned staging dirs.

    Suite drivers (bench, selfcheck, the correctness gate) call this
    between queries so cached blocks never accumulate across a run.
    """
    while _PERSISTED:
        df = _PERSISTED.pop()
        try:
            df.unpersist()
        except Exception:
            pass  # session already stopped — nothing to release
    while _STAGED_PATHS:
        shutil.rmtree(_STAGED_PATHS.pop(), ignore_errors=True)
    while _STAGED_DIRS:
        shutil.rmtree(_STAGED_DIRS.pop(), ignore_errors=True)
