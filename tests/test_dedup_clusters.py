"""Connected-components operator (near-dup clustering): the
large-star/small-star formulation must agree with min-label
propagation on ordinary graphs and, unlike it, converge on long
chains within a diameter-independent round budget (Kiveris et al.,
SoCC'14 — O(log² n) rounds vs rounds ∝ diameter)."""

import random

from broadway_spark.operators.dedup import near_dup_clusters, near_dup_labels


def _pairs_df(spark, edges):
    return spark.createDataFrame(
        [(a, b) for a, b in edges], "id_a long, id_b long"
    )


def _result(df):
    return {(r["cluster_id"], r["size"]) for r in df.collect()}


def test_labels_cover_every_node_with_component_min(spark):
    """near_dup_labels: every node of the pair graph gets exactly one
    label, the label is the component minimum, and labels agree with
    near_dup_clusters' (cluster_id, size) view of the same graph."""
    edges = [(2, 1), (2, 3), (3, 4), (10, 11), (20, 21), (21, 20)]
    labels = {
        r["id"]: r["cluster_id"]
        for r in near_dup_labels(_pairs_df(spark, edges)).collect()
    }
    assert labels == {
        1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20, 21: 20,
    }
    sizes = _result(near_dup_clusters(_pairs_df(spark, edges)))
    assert sizes == {(1, 4), (10, 2), (20, 2)}


def test_star_matches_label_prop_on_random_graph(spark):
    rng = random.Random(7)
    edges = set()
    # 8 clusters of ~12 nodes, random intra-cluster wiring
    for c in range(8):
        nodes = list(range(c * 100, c * 100 + 12))
        for n in nodes[1:]:
            edges.add((rng.choice(nodes[: nodes.index(n)]), n))
        for _ in range(6):
            a, b = rng.sample(nodes, 2)
            edges.add((min(a, b), max(a, b)))
    df = _pairs_df(spark, sorted(edges))
    star = _result(near_dup_clusters(df, algorithm="star"))
    label = _result(near_dup_clusters(df, algorithm="label", max_iter=50))
    assert star == label
    assert {c for c, _ in star} == {c * 100 for c in range(8)}
    assert all(s == 12 for _, s in star)


def test_star_converges_on_long_chain(spark):
    """A 200-node path graph: diameter 199. Min-label propagation
    needs ~199 rounds; large/small-star must solve it in the default
    20-round budget (it needs O(log² n))."""
    n = 200
    df = _pairs_df(spark, [(i, i + 1) for i in range(n - 1)])
    star = _result(near_dup_clusters(df, algorithm="star"))
    assert star == {(0, n)}


def test_star_handles_hub_component(spark):
    """A 150-spoke hub plus a separate triangle: the skewed-degree
    shape that would concentrate a collect_set-based formulation into
    one task. Sizes and min-roots must be exact."""
    edges = [(0, i) for i in range(1, 151)]
    edges += [(1000, 1001), (1001, 1002), (1000, 1002)]
    star = _result(near_dup_clusters(_pairs_df(spark, edges)))
    assert star == {(0, 151), (1000, 3)}
