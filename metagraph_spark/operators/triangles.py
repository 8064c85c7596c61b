"""clustering.triangle_count and global_clustering_coefficient.

Reference contracts:

- ``triangle_count(Graph(is_directed=False)) -> int``
  (abstract ``plugins/core/algorithms/clustering.py:29-32``). Concrete
  oracles: scipy ``(L @ U.T).multiply(L).sum()`` with L=tril/U=triu
  (``plugins/scipy/algorithms.py:66-81``, citing the Sandia HPEC tricount);
  grblas Burkhardt ``sum(sum(A@A)*A)/6`` (``plugins/graphblas/algorithms.py:18-32``);
  golden value 5 on the 8-node fixture
  (``tests/algorithms/test_clustering.py:91-120``). Weights are ignored.
- ``global_clustering_coefficient(Graph(is_directed=False)) -> float`` =
  transitivity = 3·triangles / #wedges (abstract ``clustering.py:35-50``;
  nx ``plugins/networkx/algorithms.py:56-59``); golden 3/11
  (``test_clustering.py:123-147``).

Spark plan — degree-ordered orientation + join intersection (the standard
distributed tricount; same asymptotics as the HPEC L/U formulation):

1. canonicalize: self-loops dropped, one row per undirected edge.
2. orient each edge from the lower-(degree, id) endpoint to the higher —
   every triangle is counted exactly once, and the oriented out-degree is
   bounded by O(sqrt(E)), which caps the size of the wedge join.
3. wedges = oriented ⋈ oriented on (e1.dst = e2.src); close with a third
   join back onto oriented edges; count.

All three joins are equi-joins Catalyst can shuffle-hash/sort-merge; AQE
handles residual skew. No Python in the plan.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from metagraph_spark.graph import DST, SRC, Graph


def _oriented_edges(graph: Graph):
    """Canonical undirected edges oriented by (degree, id) ascending."""
    canon = graph.canonical_undirected_edges().select(SRC, DST)
    deg = (
        canon.select(F.col(SRC).alias("n"))
        .unionAll(canon.select(F.col(DST).alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    e = (
        canon.join(deg.withColumnRenamed("n", SRC).withColumnRenamed("d", "ds"), SRC)
        .join(deg.withColumnRenamed("n", DST).withColumnRenamed("d", "dd"), DST)
    )
    # orient low (degree, id) -> high (degree, id)
    keep = (F.col("ds") < F.col("dd")) | (
        (F.col("ds") == F.col("dd")) & (F.col(SRC) < F.col(DST))
    )
    return e.select(
        F.when(keep, F.col(SRC)).otherwise(F.col(DST)).alias("a"),
        F.when(keep, F.col(DST)).otherwise(F.col(SRC)).alias("b"),
    )


def triangle_count(graph: Graph, strategy: str = "auto",
                   kernel_spill_dir: str | None = None) -> int:
    """Exact global triangle count (weights ignored).

    ``strategy``: ``"auto"`` (default — the sorted-key CSR kernel,
    ``operators/tri_kernel.py``, when rank keys fit int64 AND the
    executors share a filesystem with the driver; join plan otherwise),
    ``"kernel"`` (force the kernel), or ``"join"`` (the three-way
    self-join plan — the no-shared-fs scale fallback). Both count the
    same triangles (parity-asserted in tests)."""
    if strategy not in ("join", "kernel", "auto"):
        raise ValueError(f"unknown triangle_count strategy {strategy!r}")
    if strategy != "join":
        from metagraph_spark.operators.kernel import shared_fs_available
        from metagraph_spark.operators.tri_kernel import (
            TRI_KERNEL_MAX_NODES,
            triangle_count_kernel,
        )

        import tempfile

        probe_dir = kernel_spill_dir or tempfile.gettempdir()
        if strategy == "kernel" or (
            graph.num_nodes() <= TRI_KERNEL_MAX_NODES
            and shared_fs_available(graph.edges.sparkSession, probe_dir)
        ):
            return triangle_count_kernel(
                graph, spill_dir=kernel_spill_dir
            )
    o = _oriented_edges(graph).persist()
    e1, e2, e3 = o.alias("e1"), o.alias("e2"), o.alias("e3")
    n = (
        e1.join(e2, F.col("e1.b") == F.col("e2.a"))
        .join(
            e3,
            (F.col("e3.a") == F.col("e1.a")) & (F.col("e3.b") == F.col("e2.b")),
            "left_semi",
        )
        .count()
    )
    o.unpersist()
    return int(n)


def triangles_per_node(graph: Graph):
    """NodeMap ``(id, triangles)`` — per-node triangle participation
    (reference analog: ``nx.triangles`` used by ``plugins/networkx/
    algorithms.py:48-54``). Each triangle (x,y,z) credits all three nodes."""
    o = _oriented_edges(graph).persist()
    e1, e2, e3 = o.alias("e1"), o.alias("e2"), o.alias("e3")
    tri = (
        e1.join(e2, F.col("e1.b") == F.col("e2.a"))
        .join(
            e3,
            (F.col("e3.a") == F.col("e1.a")) & (F.col("e3.b") == F.col("e2.b")),
            "left_semi",
        )
        .select(
            F.col("e1.a").alias("x"), F.col("e1.b").alias("y"), F.col("e2.b").alias("z")
        )
    )
    per_node = (
        tri.select(F.col("x").alias("id"))
        .unionAll(tri.select(F.col("y").alias("id")))
        .unionAll(tri.select(F.col("z").alias("id")))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("triangles"))
    )
    result = per_node
    o.unpersist()
    return result


def global_clustering_coefficient(graph: Graph) -> float:
    """Transitivity: 3·triangles / Σ_v deg(v)·(deg(v)−1)/2."""
    canon = graph.canonical_undirected_edges().select(SRC, DST).persist()
    tri = triangle_count(Graph(edges=canon, is_directed=False))
    wedges = (
        canon.select(F.col(SRC).alias("n"))
        .unionAll(canon.select(F.col(DST).alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("d"))
        .agg(F.sum(F.col("d") * (F.col("d") - 1) / 2).alias("w"))
        .collect()[0]["w"]
    )
    canon.unpersist()
    if not wedges:
        return 0.0
    return 3.0 * tri / wedges
