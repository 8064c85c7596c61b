"""CC / LPA / triangle / SCC parity tests.

Golden fixtures ported from
/root/reference/metagraph/tests/algorithms/test_clustering.py:
- CC/LPA graph (:7-51, :186-227): expected partition {0,1,3,4} | {2,5,6,7}
- triangle graph (:91-120): expected count 5
- transitivity fixture (:123-147): expected 3/11
Partition outputs compare as groupings, not literal labels (comparator
analog :33-51). Oracle for random graphs: pure-python union-find.
"""

import math

import pytest

from metagraph_spark.graph import build
from metagraph_spark.operators.components import (
    connected_components,
    strongly_connected_components,
)
from metagraph_spark.operators.lpa import label_propagation_community
from metagraph_spark.operators.triangles import (
    global_clustering_coefficient,
    triangle_count,
    triangles_per_node,
)
from tests.conftest import df_from_edges

CC_EDGES = [
    (0, 3, 1), (1, 0, 2), (1, 4, 3), (2, 5, 5), (2, 7, 6),
    (3, 1, 7), (3, 4, 8), (5, 6, 10), (6, 2, 11),
]
TRI_EDGES = [
    (0, 1, 100), (0, 3, 200), (0, 4, 300), (1, 3, 50), (1, 4, 55),
    (2, 4, 60), (2, 5, 65), (2, 6, 70), (3, 4, 75), (5, 6, 20), (6, 7, 10),
]


def partition_of(rows):
    groups = {}
    for r in rows:
        groups.setdefault(r["label"], set()).add(r["id"])
    return frozenset(frozenset(g) for g in groups.values())


def union_find_oracle(edges, nodes):
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


def test_connected_components_golden(spark):
    g = build(df_from_edges(spark, CC_EDGES), is_directed=False)
    labels = connected_components(g)
    assert partition_of(labels.collect()) == frozenset(
        [frozenset({0, 1, 3, 4}), frozenset({2, 5, 6, 7})]
    )


def test_connected_components_isolates_and_random(spark):
    import random

    rng = random.Random(7)
    nodes = list(range(60))
    edges = [(rng.randrange(60), rng.randrange(60)) for _ in range(50)]
    nodes_df = spark.createDataFrame([(n,) for n in nodes], "id long")
    g = build(df_from_edges(spark, edges, weighted=False), nodes=nodes_df,
              is_directed=False)
    labels = connected_components(g)
    assert partition_of(labels.collect()) == union_find_oracle(edges, nodes)


def test_two_phase_cc_matches_hash_min(spark):
    """Round-6 plan rewrite (single dedup per round, partition-local
    aggs/joins under one repartition per phase): labels must stay exactly
    the hash-min path's min-id-per-component on varied shapes."""
    import random

    from metagraph_spark.operators.components import _two_phase_cc

    rng = random.Random(11)
    shapes = [
        [(rng.randrange(300), rng.randrange(300)) for _ in range(500)],
        [(i, i + 1) for i in range(200)],  # long path: O(log V) rounds
        [(0, i) for i in range(1, 80)] + [(500 + i, 900 + i)
                                          for i in range(30)],
        [(5, 5), (7, 7), (1, 2)],  # self-loops only + one edge
        # ids outside int32 (and negative): the round-6 narrow-int route
        # must NOT engage, and results must still match
        [(2**40 + i, 2**40 + i + 1) for i in range(40)]
        + [(-(2**35), 2**40), (-5, -9)],
    ]
    for edges in shapes:
        g = build(df_from_edges(spark, edges, weighted=False),
                  is_directed=False)
        two = _two_phase_cc(
            spark, g.edges.select("src", "dst"), g.node_ids(), 50
        )
        ref = connected_components(g, strategy="join")
        assert sorted(map(tuple, two.collect())) == sorted(
            map(tuple, ref.collect())
        )


def test_lpa_golden_partition(spark):
    g = build(df_from_edges(spark, CC_EDGES), is_directed=False)
    labels = label_propagation_community(g)
    assert partition_of(labels.collect()) == frozenset(
        [frozenset({0, 1, 3, 4}), frozenset({2, 5, 6, 7})]
    )


def test_incremental_cc_warm_start(spark):
    """Warm-starting converged CC from the previous labels after an
    appended edge batch (the streaming-ingest shape: new nodes attach to
    existing components) yields exactly the cold labels in FAR fewer
    |E|-row rounds."""
    from metagraph_spark.operators.components import (
        incremental_connected_components,
    )

    base = [(i, i + 1) for i in range(100)] + [
        (200 + i, 200 + i + 1) for i in range(40)
    ]
    g1 = build(df_from_edges(spark, base, weighted=False), is_directed=False)
    labels1 = connected_components(g1, strategy="join")
    # appended micro-batch: three new actors hook onto both components
    appended = base + [(50, 300), (300, 301), (220, 302)]
    g2 = build(
        df_from_edges(spark, appended, weighted=False), is_directed=False
    )
    warm_m: list = []
    warm = incremental_connected_components(g2, labels1, metrics_sink=warm_m)
    cold_m: list = []
    empty_prev = spark.createDataFrame([], "id long, label long")
    cold = incremental_connected_components(
        g2, empty_prev, metrics_sink=cold_m
    )
    want = {r["id"]: r["label"] for r in connected_components(
        g2, strategy="join").collect()}
    got_w = {r["id"]: r["label"] for r in warm.collect()}
    got_c = {r["id"]: r["label"] for r in cold.collect()}
    assert got_w == want
    assert got_c == want
    # warm settles in a couple of rounds; cold pays the full chain sweep
    assert len(warm_m) <= 3
    assert len(cold_m) >= 2 * len(warm_m), (len(warm_m), len(cold_m))


def test_triangle_count_golden(spark):
    g = build(df_from_edges(spark, TRI_EDGES), is_directed=False)
    assert triangle_count(g) == 5


def test_triangle_count_duplicate_and_selfloop_robust(spark):
    noisy = TRI_EDGES + [(1, 0, 1), (4, 4, 9), (3, 1, 2)]  # dup reversed + loop
    g = build(df_from_edges(spark, noisy), is_directed=False)
    assert triangle_count(g) == 5


def test_triangle_count_join_strategy_golden(spark):
    # the kernel is the auto default; keep the join plan's golden pinned
    g = build(df_from_edges(spark, TRI_EDGES), is_directed=False)
    assert triangle_count(g, strategy="join") == 5
    assert triangle_count(g, strategy="kernel") == 5


def test_triangle_kernel_join_parity_random(spark, tmp_path):
    """Sorted-key kernel == three-way-join count on random graphs (with
    duplicate edges, reversed duplicates, and self-loops mixed in), both
    owned-temp and explicit spill_dir key files."""
    import random

    for seed, nv, ne in ((7, 25, 80), (23, 60, 240), (41, 12, 60)):
        rng = random.Random(seed)
        edges = [
            (rng.randrange(nv), rng.randrange(nv), 1.0) for _ in range(ne)
        ]
        edges += [(d, s, w) for s, d, w in edges[: ne // 5]]  # rev dups
        edges += [(i, i, 1.0) for i in range(0, nv, 5)]  # self-loops
        g = build(df_from_edges(spark, edges), is_directed=False)
        want = triangle_count(g, strategy="join")
        assert triangle_count(g, strategy="kernel") == want, seed
        from metagraph_spark.operators.tri_kernel import (
            triangle_count_kernel,
        )

        got_dir = triangle_count_kernel(
            g, spill_dir=str(tmp_path / f"trik{seed}")
        )
        assert got_dir == want, seed
        # tiny chunk budget exercises the wedge-chunking path
        assert (
            triangle_count_kernel(g, chunk_pairs=8) == want
        ), f"chunked seed={seed}"


def test_triangles_per_node(spark):
    g = build(df_from_edges(spark, TRI_EDGES), is_directed=False)
    got = {r["id"]: r["triangles"] for r in triangles_per_node(g).collect()}
    # brute-force oracle
    adj = {}
    for s, d, _ in TRI_EDGES:
        adj.setdefault(s, set()).add(d)
        adj.setdefault(d, set()).add(s)
    expected = {}
    for v, nbrs in adj.items():
        nb = sorted(nbrs)
        t = sum(
            1
            for i in range(len(nb))
            for j in range(i + 1, len(nb))
            if nb[j] in adj[nb[i]]
        )
        if t:
            expected[v] = t
    assert got == expected


def test_global_clustering_coefficient_golden(spark):
    # reference transitivity fixture (test_clustering.py:123-147): 7-edge graph -> 3/11
    edges = [(1, 2, 1), (1, 5, 1), (2, 3, 1), (2, 5, 1), (3, 4, 1), (4, 5, 1), (4, 6, 1)]
    g = build(df_from_edges(spark, edges), is_directed=False)
    assert math.isclose(global_clustering_coefficient(g), 3 / 11, rel_tol=1e-12)


def test_scc_golden(spark):
    # reference SCC fixture (test_clustering.py:54-88): expected partition
    # {0,1,2} | {3}
    edges = [(0, 1), (0, 2), (2, 0), (1, 2), (3, 2)]
    g = build(df_from_edges(spark, edges, weighted=False), is_directed=True)
    labels = strongly_connected_components(g)
    assert partition_of(labels.collect()) == frozenset(
        [frozenset({0, 1, 2}), frozenset({3})]
    )


def test_scc_two_cycles_and_singletons(spark):
    # two disjoint cycles bridged one-way + a sink and an isolate-in-edges node
    edges = [
        (0, 3), (1, 0), (3, 1),          # cycle {0,1,3}
        (1, 4), (3, 4),                  # into sink 4
        (2, 5), (5, 6), (6, 2),          # cycle {2,5,6}
        (2, 7), (4, 5),                  # bridge 4 -> cycle, 2 -> 7
    ]
    g = build(df_from_edges(spark, edges, weighted=False), is_directed=True)
    labels = strongly_connected_components(g)
    assert partition_of(labels.collect()) == frozenset(
        [
            frozenset({0, 1, 3}),
            frozenset({2, 5, 6}),
            frozenset({4}),
            frozenset({7}),
        ]
    )


@pytest.mark.slow
def test_cc_high_diameter_chain(spark):
    """A 2000-node path has diameter 1999 — plain hash-min would blow
    max_rounds=200; pointer jumping must converge it in O(log V) rounds."""
    edges = [(i, i + 1) for i in range(1999)]
    g = build(df_from_edges(spark, edges, weighted=False), is_directed=False)
    labels = connected_components(g, max_rounds=40)
    got = {r["label"] for r in labels.collect()}
    assert got == {0}
    assert labels.count() == 2000


def test_incremental_triangle_count_matches_cold(spark):
    """Random splits: count(old) + incremental delta == cold count(full),
    across batches that create 0, 1, and many new triangles."""
    import random

    from metagraph_spark.operators.triangles import (
        incremental_triangle_count,
        triangle_count,
    )

    rng = random.Random(13)
    edges = set()
    while len(edges) < 120:
        a, b = rng.randrange(25), rng.randrange(25)
        if a != b:
            edges.add((min(a, b), max(a, b)))
    edges = sorted(edges)
    for split_seed in (1, 3):
        r2 = random.Random(split_seed)
        new = [e for e in edges if r2.random() < 0.25]
        old = [e for e in edges if e not in set(new)]
        g_old = build(
            df_from_edges(spark, [(s, d, 1.0) for s, d in old]), is_directed=False
        )
        g_full = build(
            df_from_edges(spark, [(s, d, 1.0) for s, d in edges]), is_directed=False
        )
        prev = triangle_count(g_old, strategy="join")
        cold = triangle_count(g_full, strategy="join")
        new_df = spark.createDataFrame(new, "src long, dst long")
        got = incremental_triangle_count(g_full, new_df, prev)
        assert got == cold, (split_seed, got, cold, prev)
    # empty batch: no-op
    g_full = build(
        df_from_edges(spark, [(s, d, 1.0) for s, d in edges]), is_directed=False
    )
    empty = spark.createDataFrame([], "src long, dst long")
    assert incremental_triangle_count(g_full, empty, 7) == 7
    # batch rows not present in the maintained table are ignored
    phantom = spark.createDataFrame([(100, 101)], "src long, dst long")
    assert incremental_triangle_count(g_full, phantom, 7) == 7
