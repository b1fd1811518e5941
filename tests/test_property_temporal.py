"""Property-based check (hypothesis) for the as-of join: on arbitrary
small inputs, the union + running-last formulation must equal a
brute-force per-row lookup — ties on the timestamp resolved inclusive
(right row at equal ts matches) with the greatest order_col winning.

The reference suite is example-driven only (SURVEY §5); randomized
inputs cover the tie/no-match/duplicate shapes examples miss."""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from broadway_spark.operators.temporal import asof_join

_ROW = st.tuples(
    st.integers(min_value=0, max_value=3),  # key
    st.integers(min_value=0, max_value=20),  # ts
    st.integers(min_value=0, max_value=99),  # order / payload id
)


def _brute_force(left, right):
    out = set()
    for lk, lts, lid in left:
        cands = [(rts, rid) for rk, rts, rid in right if rk == lk and rts <= lts]
        if cands:
            best_ts = max(c[0] for c in cands)
            best_id = max(c[1] for c in cands if c[0] == best_ts)
            out.add((lk, lts, lid, best_id, best_ts))
        else:
            out.add((lk, lts, lid, None, None))
    return out


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(
    left=st.lists(_ROW, min_size=1, max_size=12, unique=True),
    right=st.lists(_ROW, min_size=0, max_size=12, unique=True),
)
def test_asof_join_matches_brute_force(spark, left, right):
    ldf = spark.createDataFrame(
        [(k, t, i) for k, t, i in left], "k long, ts long, lid long"
    )
    rdf = spark.createDataFrame(
        [(k, t, i) for k, t, i in right], "k long, ts long, rid long"
    )
    got = {
        (r["k"], r["ts"], r["lid"], r["rid_right"], r["matched_ts"])
        for r in asof_join(
            ldf,
            rdf,
            on=["k"],
            left_ts="ts",
            right_ts="ts",
            right_cols=["rid"],
            order_col="rid",
        ).collect()
    }
    assert got == _brute_force(left, right)


def _brute_force_tolerance(left, right, tol):
    out = set()
    for lk, lts, lid in left:
        cands = [(rts, rid) for rk, rts, rid in right if rk == lk and rts <= lts]
        if cands:
            best_ts = max(c[0] for c in cands)
            best_id = max(c[1] for c in cands if c[0] == best_ts)
            if best_ts >= lts - tol:
                out.add((lk, lts, lid, best_id, best_ts))
            else:
                out.add((lk, lts, lid, None, None))
        else:
            out.add((lk, lts, lid, None, None))
    return out


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(
    left=st.lists(_ROW, min_size=1, max_size=10, unique=True),
    right=st.lists(_ROW, min_size=0, max_size=10, unique=True),
    tol=st.integers(min_value=0, max_value=6),
)
def test_asof_tolerance_matches_brute_force(spark, left, right, tol):
    """The staleness tolerance nulls too-old matches and keeps the left
    row — equal to the brute-force lookup with the same cutoff."""
    from pyspark.sql import functions as F

    ldf = spark.createDataFrame(
        [(k, t, i) for k, t, i in left], "k long, s long, lid long"
    ).select("k", F.timestamp_seconds("s").alias("ts"), "lid")
    rdf = spark.createDataFrame(
        [(k, t, i) for k, t, i in right], "k long, s long, rid long"
    ).select("k", F.timestamp_seconds("s").alias("ts"), "rid")
    got = {
        (
            r["k"],
            int(r["ts"].timestamp()),
            r["lid"],
            r["rid_right"],
            None if r["matched_ts"] is None else int(r["matched_ts"].timestamp()),
        )
        for r in asof_join(
            ldf,
            rdf,
            on=["k"],
            left_ts="ts",
            right_ts="ts",
            right_cols=["rid"],
            order_col="rid",
            tolerance=f"{tol} seconds",
        ).collect()
    }
    assert got == _brute_force_tolerance(left, right, tol)


def _brute_force_forward(left, right):
    out = set()
    for lk, lts, lid in left:
        cands = [(rts, rid) for rk, rts, rid in right if rk == lk and rts >= lts]
        if cands:
            best_ts = min(c[0] for c in cands)
            best_id = max(c[1] for c in cands if c[0] == best_ts)
            out.add((lk, lts, lid, best_id, best_ts))
        else:
            out.add((lk, lts, lid, None, None))
    return out


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(
    left=st.lists(_ROW, min_size=1, max_size=12, unique=True),
    right=st.lists(_ROW, min_size=0, max_size=12, unique=True),
)
def test_asof_join_forward_matches_brute_force(spark, left, right):
    """direction="forward" must equal the earliest right row at-or-
    after each left ts, greatest order_col winning on ts ties — the
    exact mirror of the backward contract."""
    ldf = spark.createDataFrame(
        [(k, t, i) for k, t, i in left], "k long, ts long, lid long"
    )
    rdf = spark.createDataFrame(
        [(k, t, i) for k, t, i in right], "k long, ts long, rid long"
    )
    got = {
        (r["k"], r["ts"], r["lid"], r["rid_right"], r["matched_ts"])
        for r in asof_join(
            ldf,
            rdf,
            on=["k"],
            left_ts="ts",
            right_ts="ts",
            right_cols=["rid"],
            order_col="rid",
            direction="forward",
        ).collect()
    }
    assert got == _brute_force_forward(left, right)
