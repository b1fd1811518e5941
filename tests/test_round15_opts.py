"""Round-15 optimization invariants: the per-caller ppjoin base
barrier cannot change results, the PQ/k-means row-block chunking is
value-identical to the unblocked kernels, and the new contract guards
(dim % m, bounded qtable collect) fail loudly."""

import numpy as np
import pytest
from pyspark.sql import Row

from broadway_spark.operators import dedup as D
from broadway_spark.operators import materialize as M
from broadway_spark.operators import similarity as S


@pytest.fixture(autouse=True)
def _clean_tracked():
    yield
    M.release_all()


def _docs(spark):
    rows = [
        Row(doc_id=i, text=t)
        for i, t in enumerate(
            [
                "the quick brown fox jumps over the lazy dog today",
                "the quick brown fox jumps over the lazy dog tonight",
                "completely different text about spark partitions here",
                "another unrelated document mentioning shuffles and joins",
                "the quick brown fox jumps over the lazy cat today",
            ]
        )
    ]
    return spark.createDataFrame(rows)


def test_ppjoin_base_barrier_flag_is_result_invariant(spark):
    """jaccard_pairs_prefix_filter(materialize_base=True|False) must
    return identical pairs — the flag is a pure execution hint (r15:
    per-caller opt-in after the r14 blanket barrier regressed cheap-
    token callers)."""
    from pyspark.sql import functions as F

    docs = _docs(spark).select(
        "doc_id", F.array_distinct(F.split(F.lower("text"), " ")).alias("toks")
    )
    out = {}
    for flag in (True, False):
        out[flag] = sorted(
            tuple(r)
            for r in D.jaccard_pairs_prefix_filter(
                docs, "doc_id", "toks", 0.5, materialize_base=flag
            ).collect()
        )
        M.release_all()
    assert out[True] == out[False]
    assert out[True]  # the near-dup corpus must actually produce pairs


def test_pq_assign_batch_blocking_is_value_identical():
    """_pq_assign_batch must give identical codes/distances for any
    row-block size (r15 §5 memory cap): assignments are per-row and
    the int64 math is order-independent."""
    rng = np.random.default_rng(7)
    m, sub, ncodes, n = 4, 3, 5, 500
    vm = rng.integers(-1000, 1000, size=(n, m * sub)).astype(np.int64)
    cb = [
        sorted(
            (int(c), [int(v) for v in rng.integers(-1000, 1000, size=sub)])
            for c in range(ncodes)
        )
        for _ in range(m)
    ]
    codes, mats = S._pq_cb_matrices(cb, m, sub)
    orig_block = S._PQ_ROW_BLOCK
    try:
        S._PQ_ROW_BLOCK = 10**9  # one block = unblocked reference
        ref = S._pq_assign_batch(vm, codes, mats, m, sub)
        for blk in (1, 7, 64, n, n + 13):
            S._PQ_ROW_BLOCK = blk
            got = S._pq_assign_batch(vm, codes, mats, m, sub)
            assert np.array_equal(ref[0], got[0]), f"codes differ at block={blk}"
            assert np.array_equal(ref[1], got[1]), f"dists differ at block={blk}"
    finally:
        S._PQ_ROW_BLOCK = orig_block


def test_check_pq_dims_raises_on_non_divisible():
    with pytest.raises(ValueError, match="dim % m"):
        S._check_pq_dims(63, 8)
    S._check_pq_dims(64, 8)  # divisible: no raise


def test_qtable_bounded_collect_guard(spark):
    """_pq_qtable_from_cb must refuse a query side past the bounded-
    collect ceiling with a clear error instead of a driver OOM."""
    qdf = spark.createDataFrame(
        [Row(vid=i, vec=[float(i), float(i + 1)]) for i in range(5)]
    )
    cb = [[(0, [0, 0])], [(0, [0, 0])]]
    orig = S._QTABLE_MAX_QUERIES
    try:
        S._QTABLE_MAX_QUERIES = 3
        with pytest.raises(ValueError, match="query side exceeds"):
            S._pq_qtable_from_cb(qdf, "vid", "vec", cb, m=2, sub=1)
        S._QTABLE_MAX_QUERIES = 5
        out = S._pq_qtable_from_cb(qdf, "vid", "vec", cb, m=2, sub=1)
        assert out.count() == 5 * 2 * 1  # |Q| * m * codes-per-subspace
    finally:
        S._QTABLE_MAX_QUERIES = orig
