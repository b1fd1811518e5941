"""Approximation-quality contracts for the ANN family: the LSH and IVF
paths trade recall for pruning — these tests pin HOW MUCH. Brute-force
cosine top-k is ground truth; the approximate variants must keep recall
above a floor on the fixed testdata (deterministic — hashes and
centroid seeds are fixed, so these are regression tests, not flaky
statistical ones).
"""

import sys

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entry  # noqa: E402

SF = "/root/testdata/sf0.01"


def _result_pairs(df):
    return {(r["query_id"], r["neighbor_id"]) for r in df.collect()}


def test_lsh_and_ivf_recall_vs_bruteforce(spark):
    truth = _result_pairs(entry.q_sim_ann_bruteforce(spark, SF))
    assert truth, "ground truth must be non-empty"

    lsh = _result_pairs(entry.q_sim_ann_lsh(spark, SF))
    ivf = _result_pairs(entry.q_sim_ann_ivf(spark, SF))

    lsh_recall = len(lsh & truth) / len(truth)
    ivf_recall = len(ivf & truth) / len(truth)
    # floors from measured values on this corpus (LSH multi-probe 0.48,
    # IVF 0.92) with headroom — a hash-family or bucketing regression
    # trips them
    assert lsh_recall >= 0.4, f"LSH recall collapsed: {lsh_recall:.2f}"
    assert ivf_recall >= 0.75, f"IVF recall collapsed: {ivf_recall:.2f}"
