"""Property-based check (hypothesis) for the budget splitter: on
arbitrary inputs, chunk assignment must equal the reference greedy
fold (a row joins the chunk of its EXCLUSIVE running-sum quotient —
the declarative analogue of the reference's {init_acc, fun} splitter,
options.ex:233-264). Both b2_chunk_budget and pack_sequences build on
this contract."""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from broadway_spark.operators.batching import (
    chunk_by_budget,
    chunk_by_budget_distributed,
)

# integer weights: the running sum is exact in both the Spark window
# and the Python fold, so the property tests SEMANTICS, not float LSBs
_ROW = st.tuples(
    st.integers(min_value=0, max_value=2),  # key
    st.integers(min_value=0, max_value=999),  # order (unique-ified below)
    st.integers(min_value=1, max_value=50),  # weight
)


def _reference_fold(rows, budget):
    """Per key, in order: chunk = floor(prefix_sum_before_row / budget)."""
    out = {}
    by_key = {}
    for k, o, w in rows:
        by_key.setdefault(k, []).append((o, w))
    for k, items in by_key.items():
        acc = 0.0
        for o, w in sorted(items):
            out[(k, o)] = int(acc // budget)
            acc += w
    return out


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(
    rows=st.lists(_ROW, min_size=1, max_size=20, unique_by=lambda r: (r[0], r[1])),
    budget=st.sampled_from([1.0, 7.5, 40.0]),
)
def test_chunk_by_budget_matches_greedy_fold(spark, rows, budget):
    df = spark.createDataFrame(
        [(k, o, float(w)) for k, o, w in rows], "k long, o long, w double"
    )
    got = {
        (r["k"], r["o"]): r["chunk_id"]
        for r in chunk_by_budget(df, ["k"], "o", "w", budget).collect()
    }
    assert got == _reference_fold(rows, budget)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[
        HealthCheck.too_slow,
        HealthCheck.function_scoped_fixture,
    ],
)
@given(
    rows=st.lists(
        _ROW, min_size=1, max_size=24, unique_by=lambda r: (r[0], r[1])
    ),
    budget=st.sampled_from([1.0, 7.5, 40.0]),
    nparts=st.sampled_from([1, 3, 8]),
)
def test_chunk_by_budget_distributed_matches_greedy_fold(
    spark, rows, budget, nparts
):
    """Block composition == single-stream chunking: the distributed
    prefix-sum splitter must produce the SAME chunk ids as the
    sequential fold for every partition count — range-block boundaries
    land anywhere (including mid-chunk), the broadcast offsets must
    stitch them exactly."""
    df = spark.createDataFrame(
        [(k, o, w) for k, o, w in rows], "k long, o long, w long"
    )
    got = {
        (r["k"], r["o"]): r["chunk_id"]
        for r in chunk_by_budget_distributed(
            df, ["k"], "o", "w", budget, num_partitions=nparts
        ).collect()
    }
    assert got == _reference_fold(rows, budget)


def test_chunk_by_budget_distributed_boundary_heavy(spark):
    """Adversarial block stitching: ONE key, weights that land exactly
    on budget multiples (every boundary is a tie with the budget), and
    more range partitions than chunks — block cuts fall mid-chunk and
    ON chunk boundaries; composed ids must still equal the sequential
    fold, and the same rows run through the plain per-key window must
    agree too (distributed ≡ sequential operator equivalence)."""
    budget = 10.0
    rows = [(0, i, w) for i, w in enumerate([5, 5, 10, 3, 7, 10, 10, 1, 9, 2])]
    df = spark.createDataFrame(rows, "k long, o long, w long")
    want = _reference_fold(rows, budget)
    for nparts in (1, 4, 16):
        got = {
            (r["k"], r["o"]): r["chunk_id"]
            for r in chunk_by_budget_distributed(
                df, ["k"], "o", "w", budget, num_partitions=nparts
            ).collect()
        }
        assert got == want, f"nparts={nparts}"
    seq = {
        (r["k"], r["o"]): r["chunk_id"]
        for r in chunk_by_budget(df, ["k"], "o", "w", budget).collect()
    }
    assert seq == want


def test_running_sums_distributed_null_key_rows_kept(spark):
    """NULL keys are a first-class group (r11 ADVICE): groupBy, the
    offsets window, and the range partitioner all put NULLs in one
    group, and the offsets join back with null-safe equality — a plain
    equi-join would silently DROP every NULL-keyed row (red-on-revert:
    change the eqNullSafe join back to the column-list join and the
    NULL rows vanish). The running sums over the NULL group must equal
    the sequential per-key window's, which also groups NULLs."""
    from pyspark.sql import functions as F

    from broadway_spark.operators.batching import running_sums_distributed

    rows = [
        (None, 0, 3),
        (None, 1, 4),
        ("a", 0, 10),
        (None, 2, 5),
        ("a", 1, 20),
        ("b", 0, 7),
    ]
    df = spark.createDataFrame(rows, "k string, o long, w long")
    for nparts in (1, 4):
        got = {
            (r["k"], r["o"]): r["rsum"]
            for r in running_sums_distributed(
                df, ["k"], "o", {"rsum": F.col("w")}, num_partitions=nparts
            ).collect()
        }
        want = {
            (None, 0): 3,
            (None, 1): 7,
            (None, 2): 12,
            ("a", 0): 10,
            ("a", 1): 30,
            ("b", 0): 7,
        }
        assert got == want, f"nparts={nparts}"


def test_shuffle_partitions_non_numeric_conf(spark):
    """Platforms whose forks set spark.sql.shuffle.partitions to
    'auto' must not crash the default-partitions path (r11 ADVICE):
    fall back to defaultParallelism instead of ValueError. Stock
    Spark rejects 'auto' at conf.set time, so exercise the helper
    against a stub session shaped like the real one."""
    from broadway_spark.operators.materialize import shuffle_partitions

    class _Conf:
        def __init__(self, val):
            self._val = val

        def get(self, key, default=None):
            return self._val if self._val is not None else default

    class _SC:
        defaultParallelism = 7

    class _Sess:
        def __init__(self, val):
            self.conf = _Conf(val)
            self.sparkContext = _SC()

    assert shuffle_partitions(_Sess("auto")) == 7
    assert shuffle_partitions(_Sess("48")) == 48
    assert shuffle_partitions(_Sess(None), fallback=32) == 32
    # and the real session round-trips its numeric value
    assert shuffle_partitions(spark) == int(
        spark.conf.get("spark.sql.shuffle.partitions")
    )
