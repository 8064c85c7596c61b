"""clustering.louvain_community (one step) + modularity + bipartite
projection.

Reference contracts:

- ``louvain_community(Graph(is_directed=False, edge_type=map)) ->
  (NodeMap, float modularity)`` (abstract ``plugins/core/algorithms/
  clustering.py:21-26``; concrete via python-louvain,
  ``plugins/networkx/algorithms.py:603-615``). The reference test only
  asserts: every node labeled AND modularity > 0.45 on the golden graph
  (``tests/algorithms/test_clustering.py:150-183``) — SURVEY.md marks full
  distributed Louvain as research-grade and prescribes LPA + quotient as
  the approximation. We run deterministic LPA for the partition, then ONE
  greedy modularity-refinement sweep (each node moves to the neighboring
  community with the best positive gain, synchronously, ties to the
  smallest label), and report weighted modularity.
- ``bipartite.graph_projection(BipartiteGraph, nodes_retained=0) -> Graph``
  (``plugins/core/algorithms/bipartite.py:5-7``; nx impl
  ``plugins/networkx/algorithms.py:284-293``): connect nodes of the
  retained partition that share a neighbor in the other partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from metagraph_spark.exceptions import GraphPropertyError
from metagraph_spark.graph import DST, ID, SRC, WEIGHT, Graph
from metagraph_spark.operators.lpa import label_propagation_community


def modularity(graph: Graph, labels: DataFrame) -> float:
    """Weighted Newman modularity of a partition of an undirected graph:
    ``Q = Σ_c [ e_in(c)/m − (deg(c)/2m)² ]`` with self-loops counted once
    in e_in and twice in degree (standard convention, matches
    python-louvain)."""
    if graph.is_directed:
        raise GraphPropertyError("modularity requires an undirected graph")
    e = graph.canonical_undirected_edges()
    if not graph.is_weighted:
        e = e.withColumn(WEIGHT, F.lit(1.0))
    lab_s = labels.select(F.col(ID).alias(SRC), F.col("label").alias("_ls"))
    lab_d = labels.select(F.col(ID).alias(DST), F.col("label").alias("_ld"))
    ej = e.join(lab_s, SRC).join(lab_d, DST).persist()
    m = ej.agg(F.sum(WEIGHT)).collect()[0][0]
    if not m:
        ej.unpersist()
        return 0.0
    e_in = (
        ej.filter(F.col("_ls") == F.col("_ld"))
        .groupBy("_ls")
        .agg(F.sum(WEIGHT).alias("win"))
        .withColumnRenamed("_ls", "label")
    )
    # degree per community: each endpoint contributes its incident weight
    # (self-loops twice)
    deg = (
        ej.select(F.col("_ls").alias("label"), F.col(WEIGHT))
        .unionAll(ej.select(F.col("_ld").alias("label"), F.col(WEIGHT)))
        .groupBy("label")
        .agg(F.sum(WEIGHT).alias("dc"))
    )
    parts = (
        deg.join(e_in, "label", "left")
        .select(
            (
                F.coalesce("win", F.lit(0.0)) / F.lit(float(m))
                - (F.col("dc") / F.lit(2.0 * m)) * (F.col("dc") / F.lit(2.0 * m))
            ).alias("q")
        )
        .agg(F.sum("q"))
        .collect()[0][0]
    )
    ej.unpersist()
    return float(parts)


def _one_refinement_sweep(graph: Graph, labels: DataFrame) -> DataFrame:
    """Synchronous greedy modularity sweep: each node adopts the incident
    community maximizing (w_to_community − deg_v·deg_community/(2m)),
    staying put on non-positive gain; ties to smallest label."""
    e = graph.canonical_undirected_edges()
    if not graph.is_weighted:
        e = e.withColumn(WEIGHT, F.lit(1.0))
    sym = e.unionAll(
        e.filter(F.col(SRC) != F.col(DST)).select(
            F.col(DST).alias(SRC), F.col(SRC).alias(DST), WEIGHT
        )
    )
    m = sym.agg(F.sum(WEIGHT)).collect()[0][0] / 2.0
    node_deg = sym.groupBy(F.col(SRC).alias(ID)).agg(F.sum(WEIGHT).alias("kv"))
    comm_deg = (
        node_deg.join(labels, ID)
        .groupBy("label")
        .agg(F.sum("kv").alias("kc"))
    )
    # weight from each node to each incident community
    w_nc = (
        sym.join(labels.select(F.col(ID).alias(DST), "label"), DST)
        .groupBy(F.col(SRC).alias(ID), "label")
        .agg(F.sum(WEIGHT).alias("w"))
    )
    cand = (
        w_nc.join(node_deg, ID)
        .join(comm_deg, "label")
        .select(
            ID,
            "label",
            (
                F.col("w")
                - F.col("kv") * F.col("kc") / F.lit(2.0 * m)
            ).alias("gain"),
        )
    )
    best = cand.groupBy(ID).agg(
        F.max(F.struct(F.col("gain"), (-F.col("label")).alias("nl"))).alias("b")
    ).select(ID, (-F.col("b.nl")).alias("new_label"), F.col("b.gain").alias("gain"))
    return (
        labels.join(best, ID, "left")
        .select(
            ID,
            F.when(
                F.col("gain") > 0, F.col("new_label")
            ).otherwise(F.col("label")).alias("label"),
        )
    )


def louvain_community(graph: Graph, lpa_rounds: int = 20) -> tuple[DataFrame, float]:
    """APPROXIMATE Louvain: LPA seeding + ONE greedy modularity-refinement
    sweep — NOT the full multi-level Louvain of the reference's
    python-louvain backend (``plugins/networkx/algorithms.py:603-615``).

    The reference abstract contract is "one step of the Louvain algorithm"
    with a weak test (modularity > 0.45,
    ``tests/algorithms/test_clustering.py:176-183``), which this satisfies;
    callers needing the exact python-louvain partition should treat this as
    ``louvain_step_approx``. Returns ``(labels_df, modularity)``; labels
    cover every node and the higher-modularity of (seed, refined) wins."""
    if graph.is_directed:
        raise GraphPropertyError("louvain requires an undirected graph")
    labels = label_propagation_community(graph, max_rounds=lpa_rounds)
    refined = _one_refinement_sweep(graph, labels)
    q_before = modularity(graph, labels)
    q_after = modularity(graph, refined)
    if q_after > q_before:
        return refined, q_after
    return labels, q_before


def graph_projection(
    bipartite_edges: DataFrame, nodes_retained: int = 0
) -> Graph:
    """Project a bipartite edge table ``(src, dst[, weight])`` onto one
    side: retained=0 connects src-nodes sharing a dst; retained=1 connects
    dst-nodes sharing a src. Result is undirected, weight = number of
    shared counterparts."""
    if nodes_retained == 0:
        key, keep = DST, SRC
    else:
        key, keep = SRC, DST
    a = bipartite_edges.select(F.col(key).alias("_k"), F.col(keep).alias("_a"))
    b = bipartite_edges.select(F.col(key).alias("_k"), F.col(keep).alias("_b"))
    edges = (
        a.join(b, "_k")
        .filter(F.col("_a") < F.col("_b"))
        .groupBy(F.col("_a").alias(SRC), F.col("_b").alias(DST))
        .agg(F.count(F.lit(1)).cast("double").alias(WEIGHT))
    )
    nodes = bipartite_edges.select(F.col(keep).alias(ID)).distinct()
    return Graph(edges=edges, nodes=nodes, is_directed=False)
