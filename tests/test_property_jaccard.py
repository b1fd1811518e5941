"""Property-based check (hypothesis) for prefix-filter Jaccard pairs:
the AllPairs/PPJoin candidate bound must have NO false negatives — on
arbitrary small corpora the exact pair set equals a brute-force
all-pairs computation. Randomized inputs stress the prefix-length,
length-ratio, and positional-filter boundaries where an off-by-one
would silently drop pairs."""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from broadway_spark.operators.dedup import jaccard_pairs_prefix_filter

THRESH = 0.5

# small vocabulary forces overlapping token sets (interesting pairs)
_DOC = st.lists(
    st.sampled_from("a b c d e f g h".split()), min_size=1, max_size=8
)


def _brute_force(docs):
    # exact integer ppm, matching the operator's numeric policy:
    # jaccard_ppm = (|∩|·1e6) DIV |∪|, acceptance ppm ≥ t·1e6 ⟺ J ≥ t
    out = set()
    sets = [(i, set(toks)) for i, toks in docs]
    thresh_ppm = round(THRESH * 1_000_000)
    for x in range(len(sets)):
        for y in range(x + 1, len(sets)):
            ia, sa = sets[x]
            ib, sb = sets[y]
            ppm = len(sa & sb) * 1_000_000 // len(sa | sb)
            if ppm >= thresh_ppm:
                out.add((min(ia, ib), max(ia, ib), ppm))
    return out


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(texts=st.lists(_DOC, min_size=2, max_size=10))
def test_prefix_filter_jaccard_matches_brute_force(spark, texts):
    docs = [(i, " ".join(toks)) for i, toks in enumerate(texts)]
    df = spark.createDataFrame(docs, "doc_id long, text string").select(
        "doc_id",
        F.array_distinct(F.split(F.lower("text"), " ")).alias("toks"),
    )
    got = {
        (r["id_a"], r["id_b"], r["jaccard_ppm"])
        for r in jaccard_pairs_prefix_filter(
            df, "doc_id", "toks", THRESH
        ).collect()
    }
    want = _brute_force([(i, toks) for i, toks in enumerate(texts)])
    spark.catalog.clearCache()  # the operator persists its prefix table
    assert got == want
