"""Louvain-step / modularity / bipartite projection tests.

Louvain contract from the reference (test_clustering.py:150-183): all nodes
labeled, modularity > 0.45 on the golden graph. Modularity oracle: networkx
(the reference's own backend family).
"""

import pytest
import math

import networkx as nx

from metagraph_spark.graph import build
from metagraph_spark.operators.community import (
    graph_projection,
    louvain_community,
    modularity,
)
from tests.conftest import df_from_edges

LOUVAIN_EDGES = [
    (0, 3, 1), (1, 0, 2), (1, 4, 3), (2, 5, 5), (2, 7, 6),
    (3, 1, 7), (3, 4, 8), (5, 6, 10), (6, 2, 11),
]


def test_louvain_step_golden(spark):
    g = build(df_from_edges(spark, LOUVAIN_EDGES), is_directed=False)
    labels, q = louvain_community(g)
    assert labels.count() == 8
    assert q > 0.45


def test_modularity_matches_networkx(spark):
    g = build(df_from_edges(spark, LOUVAIN_EDGES), is_directed=False)
    labels_df = spark.createDataFrame(
        [(0, 1), (1, 1), (3, 1), (4, 1), (2, 2), (5, 2), (6, 2), (7, 2)],
        "id long, label long",
    )
    got = modularity(g, labels_df)
    nxg = nx.Graph()
    nxg.add_weighted_edges_from(LOUVAIN_EDGES)
    expected = nx.community.modularity(
        nxg, [{0, 1, 3, 4}, {2, 5, 6, 7}], weight="weight"
    )
    assert math.isclose(got, expected, rel_tol=1e-12), (got, expected)


def test_graph_projection(spark):
    # bipartite: convs {10,11} -> tools {1,2,3}
    edges = [(10, 1), (10, 2), (11, 2), (11, 3)]
    bip = spark.createDataFrame(edges, "src long, dst long")
    # retain tool side (dst): tools sharing a conv
    proj = graph_projection(bip, nodes_retained=1)
    got = {(r["src"], r["dst"]): r["weight"] for r in proj.edges.collect()}
    assert got == {(1, 2): 1.0, (2, 3): 1.0}
    # retain conv side: convs sharing a tool
    proj0 = graph_projection(bip, nodes_retained=0)
    got0 = {(r["src"], r["dst"]): r["weight"] for r in proj0.edges.collect()}
    assert got0 == {(10, 11): 1.0}


@pytest.mark.slow
def test_louvain_multilevel_golden(spark):
    """Multi-level Louvain must beat (or match) the single-sweep
    approximation and clear the reference's modularity contract."""
    from metagraph_spark.operators.community import louvain_community_multilevel

    g = build(df_from_edges(spark, LOUVAIN_EDGES), is_directed=False)
    labels, q_multi = louvain_community_multilevel(g)
    assert labels.count() == 8
    _, q_step = louvain_community(g)
    assert q_multi >= q_step - 1e-9
    assert q_multi > 0.45


@pytest.mark.slow
def test_louvain_multilevel_vs_networkx_karate(spark):
    """Modularity on Zachary's karate club within 0.02 of python-louvain
    semantics (networkx louvain_communities is the same algorithm)."""
    from metagraph_spark.operators.community import louvain_community_multilevel

    # compare UNWEIGHTED on both sides (nx's karate club carries edge
    # weights; louvain_communities would otherwise optimize a different Q)
    G = nx.karate_club_graph()
    edges = [(u, v, 1.0) for u, v in G.edges()]
    g = build(df_from_edges(spark, edges), is_directed=False)
    labels, q = louvain_community_multilevel(g)
    assert labels.count() == G.number_of_nodes()
    ref_q = nx.community.modularity(
        G, nx.community.louvain_communities(G, weight=None, seed=1),
        weight=None,
    )
    assert q >= ref_q - 0.02, (q, ref_q)
    # the partition we report must score what we claim (cross-check in nx)
    part = {r["id"]: r["label"] for r in labels.collect()}
    comms = {}
    for n, c in part.items():
        comms.setdefault(c, set()).add(n)
    nx_q = nx.community.modularity(G, list(comms.values()), weight=None)
    assert abs(nx_q - q) < 1e-6, (nx_q, q)


@pytest.mark.slow
def test_louvain_multilevel_edgeless_graph(spark):
    from metagraph_spark.operators.community import louvain_community_multilevel
    from metagraph_spark.graph import Graph

    nodes = spark.createDataFrame([(1,), (2,), (3,)], "id long")
    empty = spark.createDataFrame([], "src long, dst long, weight double")
    g = Graph(edges=empty, nodes=nodes, is_directed=False)
    labels, q = louvain_community_multilevel(g, max_levels=2)
    assert labels.count() == 3
    assert q == 0.0


def test_modularity_counts_input_self_loops(spark):
    """python-louvain counts a self-loop once in m/e_in and twice in
    degree; our modularity must match networkx on a graph with one."""
    edges = [(0, 1, 1.0), (1, 2, 1.0), (2, 2, 2.0)]
    g = build(df_from_edges(spark, edges), is_directed=False)
    labels_df = spark.createDataFrame(
        [(0, 1), (1, 1), (2, 2)], "id long, label long"
    )
    got = modularity(g, labels_df)
    nxg = nx.Graph()
    nxg.add_weighted_edges_from(edges)
    want = nx.community.modularity(nxg, [{0, 1}, {2}], weight="weight")
    assert abs(got - want) < 1e-9, (got, want)


@pytest.mark.slow
def test_sweep_metrics_add_no_jobs(spark):
    """A phase-1 Louvain sweep is ONE materialization action: the moved
    count + estimated-ΔQ metrics ride an `observe` on the move decision and
    are collected by the same localCheckpoint action (VERDICT r3 #4 — the
    per-sweep exact-modularity passes are gone). Literal job count per
    action varies under AQE (one job per re-planned stage), so the
    invariant tested is: a sweep WITH metric collection runs exactly as
    many jobs as the bare sweep — observation costs zero extra jobs."""
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    from metagraph_spark.operators.community import (
        _one_refinement_sweep,
        _sweep_ctx,
    )
    from metagraph_spark.state import truncate_lineage

    g = build(df_from_edges(spark, LOUVAIN_EDGES), is_directed=False)
    ctx = _sweep_ctx(g)
    try:
        labels = truncate_lineage(
            g.node_ids().select("id", F.col("id").alias("label"))
        )
        sc = spark.sparkContext

        def run(group, observer):
            sc.setJobGroup(group, "sweep job count probe")
            try:
                out = truncate_lineage(
                    _one_refinement_sweep(
                        g, labels, direction=0, ctx=ctx, observer=observer
                    )
                )
            finally:
                sc.setJobGroup("", "")
            return out, sc.statusTracker().getJobIdsForGroup(group)

        _, bare_jobs = run("sweep_probe_bare", None)
        obs = Observation("sweep_probe_obs")
        out, obs_jobs = run("sweep_probe_observed", obs)
        stats = obs.get
        assert len(obs_jobs) == len(bare_jobs), (obs_jobs, bare_jobs)
        assert stats["moved"] > 0 and stats["est_dq"] > 0
        assert out.count() == 8
    finally:
        ctx[0].unpersist()
