"""connected_components unit semantics: multi-hop convergence, multiple
components, isolated pair symmetry."""

from __future__ import annotations

from automated_dow30_earnings_reports_spark.operators.dedup import connected_components


def _cc(spark, edges):
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    return {r.doc_id: r.cluster_id for r in connected_components(df).collect()}


def test_chain_converges_across_iterations(spark):
    # path 1-2-3-4-5: label 1 must propagate 4 hops
    got = _cc(spark, [(1, 2), (2, 3), (3, 4), (4, 5)])
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1}


def test_two_components(spark):
    got = _cc(spark, [(1, 2), (2, 3), (10, 11), (12, 11)])
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 12: 10}


def test_edge_direction_irrelevant(spark):
    # min id on the b-side: cluster id is still the component min
    got = _cc(spark, [(5, 1), (5, 9)])
    assert got == {1: 1, 5: 1, 9: 1}


def test_cycle(spark):
    got = _cc(spark, [(1, 2), (2, 3), (3, 1)])
    assert got == {1: 1, 2: 1, 3: 1}


def test_random_graphs_match_union_find(spark):
    # Seeded fuzz: label propagation must agree with a reference
    # union-find on sparse random graphs (isolated chains, dense knots,
    # and long paths all occur across these seeds).
    import random

    def union_find(n_nodes, edges):
        parent = list(range(n_nodes))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        # canonical label = min node id reachable
        labels = {}
        for v in range(n_nodes):
            labels.setdefault(find(v), []).append(v)
        return {v: min(members) for members in labels.values() for v in members}

    for seed in (3, 17, 29):
        rng = random.Random(seed)
        n, m = 60, 45
        edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(m)]
        edges = [(a, b) for a, b in edges if a != b]
        want = union_find(n, edges)
        touched = {v for e in edges for v in e}

        df = spark.createDataFrame(edges, "id_a long, id_b long")
        got = {r.doc_id: r.cluster_id for r in connected_components(df).collect()}
        # operator only labels nodes that appear in an edge
        assert got == {v: c for v, c in want.items() if v in touched}, f"seed={seed}"
