"""Coloring, random-walk sampling, APSP, duplicate clusters, and the
vectorized-callable utility surface."""

import pytest
import pandas as pd
from pyspark.sql import functions as F

from metagraph_spark.functions import dedup, similarity
from metagraph_spark.graph import build
from metagraph_spark.operators.coloring import greedy_coloring
from metagraph_spark.operators.centrality import all_pairs_shortest_paths
from metagraph_spark.operators.subgraph import random_walk_sampling
from metagraph_spark.operators import utility as mutil
from tests.conftest import df_from_edges

# reference coloring fixture (tests/algorithms/test_clustering.py:230-251)
COLOR_EDGES = [(0, 1), (0, 3), (0, 5), (1, 2), (2, 4), (3, 5), (4, 5)]


def test_greedy_coloring_reference_contract(spark):
    g = build(df_from_edges(spark, COLOR_EDGES, weighted=False), is_directed=False)
    colors_df, n_colors = greedy_coloring(g)
    colors = {r["id"]: r["color"] for r in colors_df.collect()}
    # proper coloring: no edge with equal endpoint colors
    for s, d in COLOR_EDGES:
        assert colors[s] != colors[d], (s, d, colors)
    # triangle (0,3,5) needs 3 distinct colors
    assert len({colors[0], colors[3], colors[5]}) == 3
    # greedy bound: at most max_degree+1 colors (max degree = 3 here)
    assert n_colors <= 4
    assert set(colors) == {0, 1, 2, 3, 4, 5}


@pytest.mark.slow
def test_greedy_coloring_deterministic(spark):
    g = build(df_from_edges(spark, COLOR_EDGES, weighted=False), is_directed=False)
    c1 = sorted(map(tuple, greedy_coloring(g)[0].collect()))
    c2 = sorted(map(tuple, greedy_coloring(g)[0].collect()))
    assert c1 == c2


@pytest.mark.slow
def test_random_walk_sampling(spark):
    edges = [(0, 1), (1, 2), (2, 0), (2, 3), (3, 0)]
    g = build(df_from_edges(spark, edges, weighted=False), is_directed=True)
    paths = random_walk_sampling(
        g, num_walks=4, num_steps=6, jump_probability=0.2, start_node=0
    ).collect()
    edge_set = set(edges)
    for r in paths:
        # every emitted step is a real edge
        assert (r["src"], r["dst"]) in edge_set
        assert 0 <= r["step"] < 6
        assert 0 <= r["walk_id"] < 4
    # walks are deterministic
    again = random_walk_sampling(
        g, num_walks=4, num_steps=6, jump_probability=0.2, start_node=0
    ).collect()
    assert sorted(map(tuple, paths)) == sorted(map(tuple, again))
    # per-walk continuity: step k's dst == step k+1's src unless a reset
    bywalk = {}
    for r in sorted(paths, key=lambda r: (r["walk_id"], r["step"])):
        bywalk.setdefault(r["walk_id"], []).append(r)
    for steps in bywalk.values():
        for a, b in zip(steps, steps[1:]):
            if b["step"] == a["step"] + 1:
                assert b["src"] in (a["dst"], 0)  # continued or reset to start


@pytest.mark.slow
def test_apsp_subset_matches_networkx(spark):
    import networkx as nx

    edges = [(0, 1, 1.0), (1, 2, 2.0), (0, 2, 5.0), (2, 3, 1.0), (4, 4, 1.0)]
    g = build(df_from_edges(spark, edges, weighted=True), is_directed=False)
    srcs = g.node_ids().orderBy("id").limit(3)
    got = {
        (r["src"], r["dst"]): r["dist"]
        for r in all_pairs_shortest_paths(g, srcs).collect()
    }
    nxg = nx.Graph()
    nxg.add_weighted_edges_from(edges)
    for s in [0, 1, 2]:
        dists = nx.single_source_dijkstra_path_length(nxg, s)
        for t, d in dists.items():
            assert abs(got[(s, t)] - d) < 1e-9, (s, t)
    # unreachable pairs absent
    assert (0, 4) not in got


def test_duplicate_clusters_transitive(spark):
    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(6)], "doc_id long, text string"
    )
    # chain 0-1, 1-2 => one cluster {0,1,2}; pair 4-5; 3 singleton
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (4, 5)], "doc_a long, doc_b long"
    )
    out = {r["doc_id"]: (r["cluster"], r["keep"])
           for r in dedup.duplicate_clusters(docs, pairs).collect()}
    assert out[0] == (0, True)
    assert out[1] == (0, False)
    assert out[2] == (0, False)
    assert out[3] == (3, True)
    assert out[4] == (4, True)
    assert out[5] == (4, False)


def test_nodemap_apply_filter_reduce_callables(spark):
    nm = spark.createDataFrame(
        [(i, float(i)) for i in range(10)], "id long, value double"
    )
    applied = {
        r["id"]: r["value"]
        for r in mutil.nodemap_apply(nm, lambda s: s * 2 + 1).collect()
    }
    assert applied == {i: 2.0 * i + 1 for i in range(10)}
    kept = {
        r["id"] for r in mutil.nodemap_filter(nm, lambda s: s % 2 == 0).collect()
    }
    assert kept == {0, 2, 4, 6, 8}
    total = mutil.nodemap_reduce(nm, lambda s: float(s.max() - s.min()))
    assert total == 9.0


def test_aggregate_edges_callable(spark):
    edges = [(0, 1, 2.0), (0, 2, 3.0), (1, 2, 4.0)]
    g = build(df_from_edges(spark, edges, weighted=True), is_directed=True)
    got = {
        r["id"]: r["value"]
        for r in mutil.aggregate_edges(
            g, lambda s: float(s.sum()), initial_value=-1.0
        ).collect()
    }
    assert got[0] == 5.0 and got[1] == 4.0
    assert got[2] == -1.0  # no out-edges -> initial_value


def test_embedding_apply(spark):
    emb = spark.createDataFrame(
        pd.DataFrame({"vec_id": [1, 2, 3], "embedding": [[1.0, 0.0], [0.0, 1.0], [1.0, 1.0]]})
    )
    nodes = spark.createDataFrame([(3,), (1,)], "id long")
    got = {r["vec_id"]: list(r["embedding"])
           for r in similarity.embedding_apply(emb, nodes).collect()}
    assert got == {1: [1.0, 0.0], 3: [1.0, 1.0]}
