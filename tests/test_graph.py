"""operators/graph.py::pagerank — pinned against a pure-Python reference."""

from __future__ import annotations

from seoul_big_data_spark.operators.graph import pagerank


def _reference_pagerank(n_ids, edges, iterations=10, damping=0.85):
    ids = list(n_ids)
    n = len(ids)
    outdeg = {}
    for s, _ in edges:
        outdeg[s] = outdeg.get(s, 0) + 1
    ranks = {i: 1.0 / n for i in ids}
    for _ in range(iterations):
        incoming = {i: 0.0 for i in ids}
        for s, d in edges:
            incoming[d] += ranks[s] / outdeg[s]
        ranks = {i: (1.0 - damping) / n + damping * incoming[i] for i in ids}
    return ranks


def test_pagerank_matches_reference_on_chain(spark):
    # undirected chain 1-2-3 plus isolated vertex 4
    ids = [1, 2, 3, 4]
    und = [(1, 2), (2, 3)]
    edges = und + [(b, a) for a, b in und]
    v = spark.createDataFrame([(i,) for i in ids], "id long")
    e = spark.createDataFrame(edges, "src long, dst long")
    got = {r["id"]: r["rank"] for r in pagerank(v, e).collect()}
    want = _reference_pagerank(ids, edges)
    assert got.keys() == want.keys()
    for i in ids:
        assert abs(got[i] - want[i]) < 1e-12, (i, got[i], want[i])
    # isolated vertex holds the floor; the center of the chain dominates
    assert abs(got[4] - 0.15 / 4) < 1e-12
    assert got[2] > got[1] == got[3]


def test_pagerank_mass_bounded(spark):
    # with dangling mass dropped, total rank stays <= 1 and >= (1-d)
    ids = [(i,) for i in range(6)]
    v = spark.createDataFrame(ids, "id long")
    e = spark.createDataFrame([(0, 1), (1, 0), (2, 3)], "src long, dst long")
    total = sum(r["rank"] for r in pagerank(v, e, iterations=5).collect())
    assert 0.15 <= total <= 1.0 + 1e-9
