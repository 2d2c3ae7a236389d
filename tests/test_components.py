"""Connected-components correctness vs a pure-python union-find oracle."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from lash_spark.operators.components import assign_clusters, connected_components


def _uf_oracle(n_nodes, edges):
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
    # canonical label = min node in component
    comp = {}
    for v in range(n_nodes):
        r = find(v)
        comp.setdefault(r, []).append(v)
    return {v: min(members) for r, members in comp.items() for v in members}


def _check(spark, n_nodes, edges):
    e = spark.createDataFrame(edges or [(0, 0)], "src bigint, dst bigint")
    if not edges:
        e = e.filter(F.lit(False))
    got = {
        r["node"]: r["component"]
        for r in connected_components(e, "src", "dst").collect()
    }
    want = _uf_oracle(n_nodes, edges)
    for node, comp in got.items():
        assert comp == want[node], (node, comp, want[node])
    # every non-isolated node labeled
    touched = {x for ab in edges for x in ab}
    assert set(got) == touched


def test_cc_path_graph(spark):
    _check(spark, 20, [(i, i + 1) for i in range(19)])


def test_cc_two_cliques_and_bridge(spark):
    edges = [(i, j) for i in range(5) for j in range(i + 1, 5)]
    edges += [(i, j) for i in range(10, 15) for j in range(i + 1, 15)]
    _check(spark, 15, edges)
    _check(spark, 15, edges + [(4, 10)])


def test_cc_random_graphs(spark):
    rnd = random.Random(42)
    for trial in range(3):
        n = 60
        edges = [(rnd.randrange(n), rnd.randrange(n)) for _ in range(70)]
        edges = [(a, b) for a, b in edges if a != b]
        _check(spark, n, edges)


def test_cc_empty_edges(spark):
    _check(spark, 5, [])


def test_assign_clusters_singletons(spark):
    docs = spark.createDataFrame([(i,) for i in range(8)], "url bigint")
    edges = spark.createDataFrame([(1, 3), (3, 5)], "url_a bigint, url_b bigint")
    got = {r["url"]: r["cluster_id"] for r in assign_clusters(docs, edges, "url").collect()}
    assert got == {0: 0, 1: 1, 2: 2, 3: 1, 4: 4, 5: 1, 6: 6, 7: 7}
