"""Property-based invariants (hypothesis) over random small graphs —
the robustness layer on top of the golden fixtures. Example counts are kept
small: every example executes real Spark jobs.
"""

import pytest
import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from metagraph_spark.graph import build
from metagraph_spark.operators.components import connected_components
from metagraph_spark.operators.kernel import pagerank_kernel
from metagraph_spark.operators.pagerank import pagerank
from metagraph_spark.operators.triangles import triangle_count
from tests.conftest import df_from_edges

SETTINGS = dict(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

edge_lists = st.lists(
    st.tuples(st.integers(0, 9), st.integers(0, 9)),
    min_size=1,
    max_size=20,
)


def union_find(edges, nodes):
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for s, d in edges:
        parent[find(s)] = find(d)
    groups = {}
    for n in nodes:
        groups.setdefault(find(n), set()).add(n)
    return frozenset(frozenset(g) for g in groups.values())


@given(edges=edge_lists)
@settings(**SETTINGS)
@pytest.mark.slow
def test_cc_matches_union_find(spark, edges):
    nodes = sorted({n for e in edges for n in e})
    g = build(df_from_edges(spark, edges, weighted=False), is_directed=False)
    got = {}
    for r in connected_components(g).collect():
        got.setdefault(r["label"], set()).add(r["id"])
    assert frozenset(frozenset(s) for s in got.values()) == union_find(edges, nodes)


@given(edges=edge_lists)
@settings(**SETTINGS)
@pytest.mark.slow
def test_triangles_match_bruteforce(spark, edges):
    adj = {}
    for s, d in edges:
        if s != d:
            adj.setdefault(s, set()).add(d)
            adj.setdefault(d, set()).add(s)
    nodes = sorted(adj)
    expected = 0
    for i, u in enumerate(nodes):
        for v in nodes[i + 1:]:
            if v not in adj[u]:
                continue
            for w in nodes:
                if w > v and w in adj[u] and w in adj[v]:
                    expected += 1
    g = build(df_from_edges(spark, edges, weighted=False), is_directed=False)
    assert triangle_count(g) == expected


@given(edges=edge_lists)
@settings(**SETTINGS)
@pytest.mark.slow
def test_pagerank_strategies_agree_and_sum_to_one(spark, edges):
    g = build(df_from_edges(spark, edges, weighted=False), is_directed=True)
    jb = {r["id"]: r["rank"] for r in
          pagerank(g, maxiter=200, tolerance=1e-9).collect()}
    kb = {r["id"]: r["rank"] for r in
          pagerank_kernel(g, maxiter=200, tolerance=1e-9).collect()}
    assert set(jb) == set(kb)
    for k in jb:
        assert math.isclose(jb[k], kb[k], rel_tol=1e-8, abs_tol=1e-12)
    assert math.isclose(sum(jb.values()), 1.0, rel_tol=1e-9)
