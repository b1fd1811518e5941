"""Unit tests: as-of join, sessionization, portable HLL, IVF ANN.

Semantics pinned here (oracle parity is checked separately by
scripts/selfcheck.py):
- asof_join: backward inclusive, per-key, deterministic tie-breaks,
  null fill when no prior right row exists.
- sessionize: strict session boundary at exactly `gap` (Spark's
  session_window half-open interval).
- HLL: estimate within theoretical error of exact; two-level register
  plan merges under parallelism.
- IVF: results are a subset of brute-force scores (same cosine), ranks
  contiguous from 1.
"""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from broadway_spark.functions.sketches import hll_count_distinct
from broadway_spark.operators.similarity import ann_bruteforce_topk, ann_ivf_topk
from broadway_spark.operators.temporal import asof_join, sessionize


def _ts(minute: int, second: int = 0):
    return datetime.datetime(2024, 1, 1, 10, minute, second)


def test_asof_join_backward_inclusive_and_null_fill(spark):
    left = spark.createDataFrame(
        [
            (1, 100, _ts(10)),  # matches click 11 (ts 5 < 10)
            (1, 101, _ts(20)),  # matches click 12 (inclusive at ts 20)
            (2, 102, _ts(5)),   # user 2 has no click before ts 5 -> null
        ],
        "user_id long, event_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (1, 11, _ts(5), 1.0),
            (1, 12, _ts(20), 2.0),   # equal-ts: inclusive match
            (1, 13, _ts(25), 3.0),   # after both lefts: never matched
            (2, 14, _ts(6), 4.0),
        ],
        "user_id long, event_id long, ts timestamp, value double",
    )
    out = asof_join(
        left, right, ["user_id"], "ts", "ts", ["event_id", "value"], "event_id"
    )
    rows = {r["event_id"]: r for r in out.collect()}
    assert rows[100]["event_id_right"] == 11 and rows[100]["value_right"] == 1.0
    assert rows[101]["event_id_right"] == 12  # inclusive semantics
    assert rows[102]["event_id_right"] is None
    assert rows[102]["matched_ts"] is None


def test_asof_join_tie_breaks_on_order_col(spark):
    left = spark.createDataFrame(
        [(1, 100, _ts(10))], "user_id long, event_id long, ts timestamp"
    )
    right = spark.createDataFrame(
        [(1, 11, _ts(10), 1.0), (1, 12, _ts(10), 2.0)],
        "user_id long, event_id long, ts timestamp, value double",
    )
    out = asof_join(
        left, right, ["user_id"], "ts", "ts", ["event_id", "value"], "event_id"
    ).collect()
    # Greatest order_col among equal-ts right rows wins.
    assert out[0]["event_id_right"] == 12


def test_sessionize_gap_boundary(spark):
    # Gap of 10 minutes. Spark's session_window treats the boundary as
    # CLOSED: an event at exactly prev_ts + gap still merges (verified
    # empirically; the DuckDB oracle uses `> gap` for new-session to
    # match). An event strictly past the gap starts a new session.
    df = spark.createDataFrame(
        [
            (1, _ts(0)),
            (1, _ts(9, 59)),   # within gap -> same session
            (1, _ts(19, 59)),  # exactly 10:00 after prev -> merges
            (1, _ts(30)),      # 10:01 after prev -> NEW session
            (2, _ts(0)),
        ],
        "user_id long, ts timestamp",
    )
    out = sessionize(df, "ts", ["user_id"], gap="10 minutes")
    per_user = {
        u: sorted(
            r["session_start"] for r in out.collect() if r["user_id"] == u
        )
        for u in (1, 2)
    }
    # user 1: session {0, 9:59, 19:59} and a separate session {30:00}
    assert len(per_user[1]) == 2
    assert per_user[1][0] == _ts(0) and per_user[1][1] == _ts(30)
    assert len(per_user[2]) == 1
    n = {
        (r["user_id"], r["session_start"]): r["n_events"] for r in out.collect()
    }
    assert n[(1, _ts(0))] == 3


def test_hll_estimate_accuracy_and_merge(spark):
    n = 2000
    df = spark.range(n).select(
        (F.col("id") % 2).alias("g"), F.col("id").alias("v")
    )
    # Estimate per group (1000 distinct each); m=512 -> stderr ~4.6%.
    out = {r["g"]: r["n_hll"] for r in hll_count_distinct(df, ["g"], "v").collect()}
    for g in (0, 1):
        assert abs(out[g] - 1000) / 1000 < 0.15
    # Parallelism invariance: same result with a different partitioning.
    out2 = {
        r["g"]: r["n_hll"]
        for r in hll_count_distinct(df.repartition(13), ["g"], "v").collect()
    }
    assert out == out2


def test_ivf_results_subset_of_bruteforce(spark, sf_dir="/root/testdata/sf0.001"):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 3)
    bf = ann_bruteforce_topk(emb, queries, "vec_id", "embedding", k=50)
    ivf = ann_ivf_topk(
        emb, queries, "vec_id", "embedding", k=5, num_centroids=8, nprobe=2
    )
    bf_scores = {
        (r["query_id"], r["neighbor_id"]): r["cos_sim"] for r in bf.collect()
    }
    ivf_rows = ivf.collect()
    assert len(ivf_rows) > 0
    for r in ivf_rows:
        key = (r["query_id"], r["neighbor_id"])
        # Every IVF hit that brute force ranked within its k=50 horizon
        # must carry the identical cosine score.
        if key in bf_scores:
            assert r["cos_sim"] == pytest.approx(bf_scores[key], abs=1e-9)
    # Ranks are contiguous from 1 per query.
    by_q: dict[int, list[int]] = {}
    for r in ivf_rows:
        by_q.setdefault(r["query_id"], []).append(r["rank"])
    for q, ranks in by_q.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))


def test_heavy_hitters_exact_vs_plain_groupby(spark):
    """Two-pass Misra-Gries must return EXACTLY the keys with
    freq > phi*n and their exact counts — identical to the plain
    groupBy+having — under a skewed distribution spread across many
    partitions (the MG candidate pass only affects the superset,
    never the verified answer)."""
    from pyspark.sql import functions as F

    from broadway_spark.functions.sketches import heavy_hitters

    # 3 heavy keys (~20% each), long uniform tail, 16 partitions
    df = (
        spark.range(0, 30_000, numPartitions=16)
        .select(
            F.when(F.col("id") % 5 == 0, F.lit("hot_a"))
            .when(F.col("id") % 5 == 1, F.lit("hot_b"))
            .when(F.col("id") % 5 == 2, F.lit("hot_c"))
            .otherwise(F.concat(F.lit("tail_"), (F.col("id") % 4000)))
            .alias("k")
        )
    )
    got = {
        (r["key"], r["n"]) for r in heavy_hitters(df, "k", phi=0.05).collect()
    }
    n = df.count()
    want = {
        (r["k"], r["n"])
        for r in df.groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 0.05 * n)
        .collect()
    }
    assert got == want and len(want) == 3


def test_heavy_hitters_boundary_not_included(spark):
    """A key at EXACTLY phi*n must not qualify (strict >)."""
    from pyspark.sql import functions as F

    from broadway_spark.functions.sketches import heavy_hitters

    # 100 rows: 'edge' has exactly 10 = phi*n at phi=0.1;
    # 'heavy' has 30 > 10.
    rows = [("edge",)] * 10 + [("heavy",)] * 30 + [
        (f"t{i}",) for i in range(60)
    ]
    df = spark.createDataFrame(rows, "k string").repartition(8)
    got = {r["key"] for r in heavy_hitters(df, "k", phi=0.1).collect()}
    assert got == {"heavy"}


def test_cms_never_undercounts_and_is_mergeable(spark):
    """CMS contract: estimates upper-bound true counts (never under);
    building on two halves and summing counters equals building once
    (mergeability — the distributed/streaming composition property)."""
    from pyspark.sql import functions as F

    from broadway_spark.functions.sketches import cms_build, cms_estimate

    df = spark.range(0, 5000).select((F.col("id") % 97).alias("v"))
    counters = cms_build(df, "v")
    keys = df.select("v").distinct()
    est = {r["key"]: r["est_n"] for r in cms_estimate(counters, keys, "v").collect()}
    true = {
        r["v"]: r["n"]
        for r in df.groupBy("v").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert set(est) == set(true)
    assert all(est[k] >= true[k] for k in true), "CMS undercounted"

    h1 = cms_build(df.filter(F.col("v") < 50), "v")
    h2 = cms_build(df.filter(F.col("v") >= 50), "v")
    merged = (
        h1.unionByName(h2)
        .groupBy("row", "idx")
        .agg(F.sum("c").alias("c"))
    )
    est_m = {
        r["key"]: r["est_n"]
        for r in cms_estimate(merged, keys, "v").collect()
    }
    assert est_m == est, "merged halves != single build"


def test_bloom_no_false_negatives_and_mergeable(spark):
    """Bloom contract: every inserted key probes present=1 (no false
    negatives — the filter's only hard guarantee); union of the bitsets
    of two halves equals the single build (mergeability)."""
    from pyspark.sql import functions as F

    from broadway_spark.functions.sketches import bloom_build, bloom_probe

    df = spark.range(0, 3000).select((F.col("id") * 13 % 911).alias("v"))
    bits = bloom_build(df, "v")
    keys = df.select("v").distinct()
    probed = bloom_probe(bits, keys, "v")
    n_keys = keys.count()
    assert (
        probed.filter(F.col("present") == 1).count() == n_keys
    ), "Bloom false negative"

    b1 = bloom_build(df.filter(F.col("v") < 400), "v")
    b2 = bloom_build(df.filter(F.col("v") >= 400), "v")
    merged = b1.unionByName(b2).distinct()
    assert merged.count() == bits.count()
    assert (
        bloom_probe(merged, keys, "v").filter(F.col("present") == 1).count()
        == n_keys
    )


def test_shingle_instances_multiplicity(spark):
    """shingle_instances keeps duplicate k-grams (shingle_rows dedups):
    'a b a b a' has 2-grams [a b, b a, a b, b a] — 4 instances, 2
    distinct."""
    from broadway_spark.functions.text import shingle_instances, shingle_rows

    df = spark.createDataFrame([(1, "a b a b a")], ["id", "text"])
    inst = shingle_instances(df, "id", "text", 2).collect()
    assert len(inst) == 4
    assert len(shingle_rows(df, "id", "text", 2).collect()) == 2


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    weights=st.lists(st.integers(min_value=1, max_value=400), min_size=3, max_size=25),
    phi_pct=st.integers(min_value=5, max_value=40),
    nparts=st.integers(min_value=1, max_value=12),
)
def test_heavy_hitters_matches_exact_for_any_distribution(
    spark, weights, phi_pct, nparts
):
    """Property: for ANY multiset, threshold and partitioning, the
    two-pass Misra-Gries result equals the exact groupBy+having —
    the weighted-decrement candidate pass may only affect the
    SUPERSET, never the verified answer (the MG guarantee: a key with
    global freq > phi*n is locally heavy in some batch and a local
    MG(ceil(1/phi)) never evicts a locally heavy key)."""
    from pyspark.sql import functions as F

    from broadway_spark.functions.sketches import heavy_hitters

    phi = phi_pct / 100.0
    rows = [(f"k{i}",) for i, w in enumerate(weights) for _ in range(w)]
    df = spark.createDataFrame(rows, "k string").repartition(nparts)
    got = {
        (r["key"], r["n"]) for r in heavy_hitters(df, "k", phi=phi).collect()
    }
    n = len(rows)
    want = {
        (r["k"], r["n"])
        for r in df.groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > phi * n)
        .collect()
    }
    assert got == want
