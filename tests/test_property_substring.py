"""Property test: substring_containment_pairs has NO false negatives
(and no false positives) versus brute-force double-loop containment at
tiny scale — the exactness contract of the doc-in-doc dedup operator."""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Row

from broadway_spark.operators.dedup import substring_containment_pairs

# Small alphabet + repetition-heavy fragments maximize real containment.
_frag = st.text(alphabet="ab ", min_size=0, max_size=30)


def _brute(docs, k=8):
    out = set()
    for ia, ta in docs:
        if len(ta) < k:
            continue
        for ib, tb in docs:
            if ia == ib:
                continue
            if len(ta) < len(tb) or (len(ta) == len(tb) and ia < ib):
                if ta in tb:
                    out.add((ia, ib))
    return out


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(st.lists(_frag, min_size=2, max_size=8), st.data())
def test_no_false_negatives_vs_brute_force(spark, frags, data):
    # build docs by concatenating fragments, so some docs literally
    # contain others
    docs = []
    for i, f in enumerate(frags):
        docs.append((i, "x" * 8 + f + "y" * 8))
    # doc embedding another doc verbatim
    if len(frags) >= 2:
        docs.append((len(docs), docs[0][1] + docs[1][1]))
    k = 8
    expected = _brute(docs, k)
    df = spark.createDataFrame([Row(doc_id=i, text=t) for i, t in docs])
    got = {
        (r["contained_id"], r["container_id"])
        for r in substring_containment_pairs(
            df, "doc_id", "text", k=k
        ).collect()
    }
    assert got == expected


def test_probe_hash_md5_same_result(spark):
    docs = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "PREFIX the quick brown fox jumps over the lazy dog SUFFIX"),
        (3, "completely unrelated text that stands alone here"),
    ]
    df = spark.createDataFrame([Row(doc_id=i, text=t) for i, t in docs])
    for h in ("xxhash64", "md5"):
        got = {
            (r[0], r[1])
            for r in substring_containment_pairs(
                df, "doc_id", "text", k=16, probe_hash=h
            ).collect()
        }
        assert got == {(1, 2)}
