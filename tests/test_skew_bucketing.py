"""Skew-mitigation and bucketing tests — scale strategies verified on
small data (correct results + the intended plan shape)."""

import os
import shutil

from pyspark.sql import functions as F

from broadway_spark.operators.skew import salted_aggregate, with_salt


def test_salted_aggregate_matches_plain(spark):
    """Two-phase salted aggregation must equal the direct groupBy."""
    df = spark.range(0, 10_000).select(
        (F.col("id") % 5).alias("key"),  # 5 hot keys
        (F.col("id") * 37 % 1000).alias("v"),
    )
    salted = salted_aggregate(
        df,
        ["key"],
        {
            "n": (F.count(F.lit(1)), F.sum("n")),
            "s": (F.sum("v"), F.sum("s")),
            "mx": (F.max("v"), F.max("mx")),
        },
        salt_n=8,
    )
    plain = df.groupBy("key").agg(
        F.count(F.lit(1)).alias("n"), F.sum("v").alias("s"), F.max("v").alias("mx")
    )
    got = {r["key"]: (r["n"], r["s"], r["mx"]) for r in salted.collect()}
    want = {r["key"]: (r["n"], r["s"], r["mx"]) for r in plain.collect()}
    assert got == want


def test_salt_is_deterministic_and_spread(spark):
    df = spark.range(0, 1000).select(F.lit(1).alias("key"), F.col("id").alias("v"))
    s1 = with_salt(df, 16, ["v"]).select("v", "__salt").collect()
    s2 = with_salt(df, 16, ["v"]).select("v", "__salt").collect()
    assert {(r["v"], r["__salt"]) for r in s1} == {(r["v"], r["__salt"]) for r in s2}
    n_salts = len({r["__salt"] for r in s1})
    assert n_salts == 16  # the hot key actually spreads


def test_bucketed_join_avoids_shuffle(spark, tmp_path):
    """Pre-bucketed tables joined on the bucket key: neither side
    re-shuffles (co-located join — the 100 TB repeated-join strategy).

    The bucketed tables live under this test's ``tmp_path`` (explicit
    LOCATION), so a stale ``spark-warehouse/`` directory left by an
    earlier interrupted run can never collide with ``saveAsTable``
    (a fresh session's metastore doesn't know the old table, making
    DROP a no-op while the directory still blocks the write).
    """
    left = spark.range(0, 5000).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("a")
    )
    right = spark.range(0, 5000).select(
        F.col("id").alias("k"), (F.col("id") * 7).alias("b")
    )
    for name in ("bk_left", "bk_right"):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        # Defensive: clear any stale default-warehouse leftover too.
        wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
        shutil.rmtree(os.path.join(wh, name), ignore_errors=True)
    left.write.bucketBy(8, "k").sortBy("k").option(
        "path", str(tmp_path / "bk_left")
    ).saveAsTable("bk_left")
    right.write.bucketBy(8, "k").sortBy("k").option(
        "path", str(tmp_path / "bk_right")
    ).saveAsTable("bk_right")

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = spark.table("bk_left").join(spark.table("bk_right"), "k")
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert j.count() == 5000
        # co-located: a sort-merge join with NO shuffle exchange
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS bk_left")
        spark.sql("DROP TABLE IF EXISTS bk_right")
