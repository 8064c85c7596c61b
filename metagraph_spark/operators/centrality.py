"""centrality.* beyond PageRank: katz, eigenvector, HITS, closeness,
betweenness (degree centrality lives in operators/utility.py).

Reference contracts (abstract defs ``plugins/core/algorithms/centrality.py``,
nx concrete impls ``plugins/networkx/algorithms.py`` — all WEIGHTED, unlike
pagerank):

- ``katz(Graph, attenuation_factor=0.01, immediate_neighbor_weight=1.0,
  maxiter=50, tolerance=1e-05) -> NodeMap`` (:16-23; nx :30-46):
  ``x' = α·Aᵀx + β``; converge on ``Σ|x'-x| < N·tol``; L2-normalize the
  result; ConvergenceError past maxiter. Golden values
  ``tests/algorithms/test_centrality.py:106-144``.
- ``eigenvector(Graph, maxiter=50, tolerance=1e-05) -> NodeMap`` (:48-53;
  nx :192-199): ``x' = x + Aᵀx`` then L2-normalize EVERY iteration;
  converge on ``Σ|x'-x| < N·tol``.
- ``hits(Graph(is_directed=True), maxiter=50, tolerance=1e-05,
  normalize=True) -> (hubs, authorities)`` (:57-69; nx :201-206):
  ``a = Aᵀh; h = A·a``; max-normalize both every iteration; converge on
  ``Σ|h'-h| < tol`` (NOT N-scaled — nx semantics); final sum-normalize.
- ``closeness(Graph(edge_type=map), Optional[NodeSet]) -> NodeMap``
  (:40-44; nx :175-190): weighted distances; wf-improved formula
  ``C(v) = ((r-1)/(n-1)) · ((r-1)/Σ_{u reachable to v} d(u,v))`` where r =
  #nodes that can reach v (v included). Physical plan: ONE multi-source
  Bellman-Ford relaxation with composite state (root, id, dist) — S·V state
  rows; full closeness is inherently all-pairs, callers pass a NodeSet at
  scale.
- ``betweenness(Graph(edge_type=map), Optional[NodeSet], normalize=False)
  -> NodeMap`` (:7-12; nx :158-173 = Brandes subset): parallelized OVER
  SOURCES — the edge list broadcasts to every task and an Arrow-batched
  grouped kernel (applyInPandas over source batches) runs weighted Brandes
  per source, summing dependency scores. Scales in #sources, requires the
  adjacency to fit per-task (betweenness at 10^12 edges is out of scope for
  any engine; the reference's is single-threaded networkx).
"""

from __future__ import annotations

import math
from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from metagraph_spark.exceptions import ConvergenceError, GraphPropertyError
from metagraph_spark.graph import DST, ID, SRC, WEIGHT, Graph
from metagraph_spark.state import truncate_lineage


def _weighted_edges(graph: Graph) -> DataFrame:
    e = graph.symmetrized()
    if not graph.is_weighted:
        e = e.withColumn(WEIGHT, F.lit(1.0))
    return e.select(SRC, DST, WEIGHT)


def katz_centrality(
    graph: Graph,
    attenuation_factor: float = 0.01,
    immediate_neighbor_weight: float = 1.0,
    maxiter: int = 50,
    tolerance: float = 1e-05,
) -> DataFrame:
    """Returns ``(id, katz)``."""
    edges = _weighted_edges(graph).persist()
    n = graph.num_nodes()
    nodes = graph.node_ids()
    alpha, beta = attenuation_factor, immediate_neighbor_weight
    x = truncate_lineage(nodes.select(ID, F.lit(0.0).alias("v")))
    for _ in range(maxiter):
        gather = (
            edges.join(x.select(F.col(ID).alias(SRC), "v"), SRC)
            .groupBy(F.col(DST).alias(ID))
            .agg(F.sum(F.col("v") * F.col(WEIGHT)).alias("g"))
        )
        new_x = (
            nodes.join(gather, ID, "left")
            .select(
                ID,
                (
                    F.lit(alpha) * F.coalesce("g", F.lit(0.0)) + F.lit(beta)
                ).alias("v"),
            )
        )
        new_x = truncate_lineage(new_x)
        err = (
            new_x.join(x.withColumnRenamed("v", "p"), ID)
            .agg(F.sum(F.abs(F.col("v") - F.col("p"))))
            .collect()[0][0]
        )
        x.unpersist()
        x = new_x
        if err < n * tolerance:
            s2 = x.agg(F.sum(F.col("v") * F.col("v"))).collect()[0][0]
            norm = 1.0 / math.sqrt(s2) if s2 > 0 else 1.0
            edges.unpersist()
            return x.select(ID, (F.col("v") * F.lit(norm)).alias("katz"))
    edges.unpersist()
    raise ConvergenceError(f"katz failed to converge in {maxiter} iterations")


def eigenvector_centrality(
    graph: Graph, maxiter: int = 50, tolerance: float = 1e-05
) -> DataFrame:
    """Returns ``(id, eigenvector)``."""
    edges = _weighted_edges(graph).persist()
    n = graph.num_nodes()
    nodes = graph.node_ids()
    x = truncate_lineage(nodes.select(ID, F.lit(1.0 / n).alias("v")))
    for _ in range(maxiter):
        gather = (
            edges.join(x.select(F.col(ID).alias(SRC), "v"), SRC)
            .groupBy(F.col(DST).alias(ID))
            .agg(F.sum(F.col("v") * F.col(WEIGHT)).alias("g"))
        )
        new_x = (
            x.join(gather, ID, "left")
            .select(ID, (F.col("v") + F.coalesce("g", F.lit(0.0))).alias("v"))
        )
        new_x = truncate_lineage(new_x)
        s2 = new_x.agg(F.sum(F.col("v") * F.col("v"))).collect()[0][0]
        norm = math.sqrt(s2) if s2 > 0 else 1.0
        new_x = truncate_lineage(new_x.select(ID, (F.col("v") / F.lit(norm)).alias("v")))
        err = (
            new_x.join(x.withColumnRenamed("v", "p"), ID)
            .agg(F.sum(F.abs(F.col("v") - F.col("p"))))
            .collect()[0][0]
        )
        x.unpersist()
        x = new_x
        if err < n * tolerance:
            edges.unpersist()
            return x.withColumnRenamed("v", "eigenvector")
    edges.unpersist()
    raise ConvergenceError(
        f"eigenvector failed to converge in {maxiter} iterations"
    )


def hits_centrality(
    graph: Graph,
    maxiter: int = 50,
    tolerance: float = 1e-05,
    normalize: bool = True,
) -> tuple[DataFrame, DataFrame]:
    """Returns ``(hubs, authorities)`` NodeMaps ``(id, hubs)/(id, authority)``."""
    if not graph.is_directed:
        raise GraphPropertyError("hits requires a directed graph")
    edges = _weighted_edges(graph).persist()
    n = graph.num_nodes()
    nodes = graph.node_ids()
    h = truncate_lineage(nodes.select(ID, F.lit(1.0 / n).alias("v")))
    err = None
    for _ in range(maxiter):
        # authorities: gather hub scores along edges (src -> dst)
        a = (
            nodes.join(
                edges.join(h.select(F.col(ID).alias(SRC), "v"), SRC)
                .groupBy(F.col(DST).alias(ID))
                .agg(F.sum(F.col("v") * F.col(WEIGHT)).alias("g")),
                ID,
                "left",
            )
            .select(ID, F.coalesce("g", F.lit(0.0)).alias("v"))
        )
        a = truncate_lineage(a)
        amax = a.agg(F.max("v")).collect()[0][0] or 1.0
        a = truncate_lineage(a.select(ID, (F.col("v") / F.lit(amax)).alias("v")))
        # hubs: gather authority scores along reversed edges
        new_h = (
            nodes.join(
                edges.join(a.select(F.col(ID).alias(DST), "v"), DST)
                .groupBy(F.col(SRC).alias(ID))
                .agg(F.sum(F.col("v") * F.col(WEIGHT)).alias("g")),
                ID,
                "left",
            )
            .select(ID, F.coalesce("g", F.lit(0.0)).alias("v"))
        )
        new_h = truncate_lineage(new_h)
        hmax = new_h.agg(F.max("v")).collect()[0][0] or 1.0
        new_h = truncate_lineage(
            new_h.select(ID, (F.col("v") / F.lit(hmax)).alias("v"))
        )
        err = (
            new_h.join(h.withColumnRenamed("v", "p"), ID)
            .agg(F.sum(F.abs(F.col("v") - F.col("p"))))
            .collect()[0][0]
        )
        h.unpersist()
        h = new_h
        if err < tolerance:
            break
    else:
        edges.unpersist()
        raise ConvergenceError(f"hits failed to converge in {maxiter} iterations")
    if normalize:
        hs = h.agg(F.sum("v")).collect()[0][0] or 1.0
        asum_df = a.agg(F.sum("v")).collect()[0][0] or 1.0
        h = h.select(ID, (F.col("v") / F.lit(hs)).alias("hubs"))
        a = a.select(ID, (F.col("v") / F.lit(asum_df)).alias("authority"))
    else:
        h = h.withColumnRenamed("v", "hubs")
        a = a.withColumnRenamed("v", "authority")
    edges.unpersist()
    return h, a


def _multi_source_distances(
    graph: Graph, sources: DataFrame, reverse: bool, max_rounds: int | None = None
) -> DataFrame:
    """Multi-source weighted relaxation → ``(root, id, dist)`` over pairs
    with a path root→id (or id→root when ``reverse``). One iterative loop
    relaxes ALL roots simultaneously — state is (S·reached) rows."""
    edges = _weighted_edges(graph)
    if reverse:
        edges = edges.select(
            F.col(DST).alias(SRC), F.col(SRC).alias(DST), WEIGHT
        )
    edges = edges.persist()
    state = truncate_lineage(
        sources.select(
            F.col(ID).alias("root"), F.col(ID), F.lit(0.0).alias("dist")
        )
    )
    limit = max_rounds if max_rounds is not None else graph.num_nodes() + 1
    for _ in range(limit):
        cand = (
            edges.join(
                state.select("root", F.col(ID).alias(SRC), F.col("dist").alias("_d")),
                SRC,
            )
            .select(
                "root",
                F.col(DST).alias(ID),
                (F.col("_d") + F.col(WEIGHT)).alias("dist"),
            )
        )
        merged = (
            state.unionAll(cand)
            .groupBy("root", ID)
            .agg(F.min("dist").alias("dist"))
        )
        merged = truncate_lineage(merged)
        improved = (
            merged.join(
                state.select("root", ID, F.col("dist").alias("_old")),
                ["root", ID],
                "left",
            )
            .filter(F.col("_old").isNull() | (F.col("dist") < F.col("_old")))
            .count()
        )
        state.unpersist()
        state = merged
        if improved == 0:
            edges.unpersist()
            return state
    edges.unpersist()
    raise ConvergenceError("multi-source relaxation did not converge")


def closeness_centrality(
    graph: Graph, nodes: Optional[DataFrame] = None
) -> DataFrame:
    """Returns ``(id, closeness)`` for ``nodes`` (default: all nodes)."""
    if graph.has_negative_weights():
        raise GraphPropertyError("closeness requires non-negative weights")
    n = graph.num_nodes()
    targets = nodes.select(ID) if nodes is not None else graph.node_ids()
    # distances of paths u -> v for target v: relax on REVERSED edges from v
    dists = _multi_source_distances(graph, targets, reverse=True)
    agg = dists.groupBy("root").agg(
        F.sum("dist").alias("total"), F.count(F.lit(1)).alias("r")
    )
    # r includes the root itself (dist 0); wf-improved formula
    return agg.select(
        F.col("root").alias(ID),
        F.when(
            (F.col("r") > 1) & (F.col("total") > 0),
            ((F.col("r") - 1) * (F.col("r") - 1))
            / (F.lit(float(n - 1)) * F.col("total")),
        )
        .otherwise(F.lit(0.0))
        .alias("closeness"),
    )


def betweenness_centrality(
    graph: Graph,
    nodes: Optional[DataFrame] = None,
    normalize: bool = False,
    sources_per_batch: int = 16,
) -> DataFrame:
    """Brandes betweenness, parallelized over sources.

    The edge list is broadcast (sc.broadcast of a numpy CSR built once on
    the driver); sources are distributed ``sources_per_batch`` per Arrow
    batch through ``applyInPandas``; each task runs weighted Brandes
    (Dijkstra + dependency accumulation, pure numpy/heapq on the broadcast
    CSR) for its sources and emits partial (id, score) rows which a final
    groupBy sums. Matches nx ``betweenness_centrality_subset`` with
    sources == targets == nodes (``plugins/networkx/algorithms.py:158-173``).
    """
    import numpy as np
    import pandas as pd

    spark = graph.edges.sparkSession
    all_nodes = [r[0] for r in graph.node_ids().collect()]
    idx = {v: i for i, v in enumerate(all_nodes)}
    nv = len(all_nodes)
    e_rows = _weighted_edges(graph).collect()
    # CSR over positional indices
    adj_heads: list[list[int]] = [[] for _ in range(nv)]
    adj_w: list[list[float]] = [[] for _ in range(nv)]
    for r in e_rows:
        adj_heads[idx[r[SRC]]].append(idx[r[DST]])
        adj_w[idx[r[SRC]]].append(float(r[WEIGHT]))
    if nodes is not None:
        srcs = [idx[r[0]] for r in nodes.select(ID).collect()]
        targets = set(srcs)
    else:
        srcs = list(range(nv))
        targets = set(srcs)
    bc_adj = spark.sparkContext.broadcast((adj_heads, adj_w, nv, targets))
    node_arr = np.array(all_nodes, dtype=np.int64)

    def brandes_batch(pdf: pd.DataFrame):
        import heapq

        heads, ws, nvv, tgts = bc_adj.value
        score = np.zeros(nvv)
        for s in pdf["s"].to_numpy():
            s = int(s)
            dist = np.full(nvv, np.inf)
            sigma = np.zeros(nvv)
            dist[s] = 0.0
            sigma[s] = 1.0
            preds: list[list[int]] = [[] for _ in range(nvv)]
            seen_order: list[int] = []
            heap = [(0.0, s)]
            done = np.zeros(nvv, dtype=bool)
            while heap:
                d, u = heapq.heappop(heap)
                if done[u]:
                    continue
                done[u] = True
                seen_order.append(u)
                for v, w in zip(heads[u], ws[u]):
                    nd = d + w
                    if nd < dist[v] - 1e-15:
                        dist[v] = nd
                        sigma[v] = sigma[u]
                        preds[v] = [u]
                        heapq.heappush(heap, (nd, v))
                    elif abs(nd - dist[v]) <= 1e-15 and not done[v]:
                        sigma[v] += sigma[u]
                        preds[v].append(u)
            delta = np.zeros(nvv)
            for w_ in reversed(seen_order):
                coeff = (1.0 + delta[w_]) if (w_ in tgts and w_ != s) else delta[w_]
                for u in preds[w_]:
                    delta[u] += sigma[u] / sigma[w_] * coeff
            delta[s] = 0.0
            score += delta
        return pd.DataFrame({"id": node_arr, "partial": score})

    src_df = spark.createDataFrame(
        [(int(s), int(s) // sources_per_batch) for s in srcs], "s long, grp long"
    )
    partials = src_df.groupBy("grp").applyInPandas(
        brandes_batch, schema="id long, partial double"
    )
    out = partials.groupBy(ID).agg(F.sum("partial").alias("betweenness"))
    if normalize:
        scale = (
            1.0 / ((nv - 1) * (nv - 2))
            if graph.is_directed
            else 2.0 / ((nv - 1) * (nv - 2))
        )
        out = out.select(ID, (F.col("betweenness") * F.lit(scale)).alias("betweenness"))
    elif not graph.is_directed:
        out = out.select(ID, (F.col("betweenness") / F.lit(2.0)).alias("betweenness"))
    return out
