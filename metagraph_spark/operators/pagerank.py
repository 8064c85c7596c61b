"""centrality.pagerank — power iteration with networkx dangling semantics.

Reference contract (abstract def ``plugins/core/algorithms/centrality.py:27-37``):
``(Graph(edge_type=map), damping=0.85, maxiter=50, tolerance=1e-05) -> NodeMap``
and MUST raise ConvergenceError when maxiter is exceeded.

Semantics pinned by the reference implementations:

- the networkx concrete impl passes ``weight=None`` — PageRank is UNWEIGHTED
  (``plugins/networkx/algorithms.py:16-28``); out-degree = out-edge count.
- update: ``r'[v] = d·Σ_{(u,v)∈E} r[u]/outdeg(u) + d·danglesum/N + (1-d)/N``
  where ``danglesum = Σ_{u dangling} r[u]`` — dangling mass is redistributed
  uniformly (networkx semantics; the grblas impl at
  ``plugins/graphblas/algorithms.py:34-72`` drops it, networkx is the oracle).
- convergence: L1 error ``Σ|r'-r| < N·tolerance``
  (``plugins/graphblas/algorithms.py:66-67``; networkx uses the same rule).

Spark plan per superstep (all JVM-side; no Python in the hot path):

1. ``contrib = ranks ⋈ deg`` (deg computed once, persisted) → ``edges ⋈
   contrib on src → groupBy(dst).sum`` — map-side partial aggregation is
   automatic; AQE splits skewed reduce partitions. The edge table is
   hash-partitioned by src once; ranks is the only DataFrame that shuffles
   per superstep.
2. exactly TWO actions per superstep: (a) materialize the new rank state
   (localCheckpoint or durable parquet checkpoint), (b) one combined
   aggregate computing the L1 error AND the next iteration's dangling mass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from metagraph_spark.exceptions import ConvergenceError
from metagraph_spark.graph import DST, ID, SRC, Graph
from metagraph_spark.state import CheckpointManager, truncate_lineage


def pagerank(
    graph: Graph,
    damping: float = 0.85,
    maxiter: int = 50,
    tolerance: float = 1e-05,
    fixed_iterations: int | None = None,
    checkpointer: CheckpointManager | None = None,
    metrics_sink: list | None = None,
) -> DataFrame:
    """Return NodeMap DataFrame ``(id: long, rank: double)``.

    ``fixed_iterations`` runs exactly k supersteps with no convergence test
    (used for oracle-vs-engine comparisons where both sides unroll the same
    k). Otherwise iterates until ``Σ|r'-r| < N·tolerance`` and raises
    :class:`ConvergenceError` past ``maxiter``.

    With a ``checkpointer``, rank state + metrics persist per superstep and a
    re-run resumes from the newest complete iteration. ``metrics_sink``
    (optional list) receives one dict per superstep for benchmarking.
    """
    spark = graph.edges.sparkSession
    # persist the (symmetrized) edge table once — every superstep reuses it;
    # without this the whole upstream derivation re-executes per iteration
    edges = graph.symmetrized().select(SRC, DST).persist()
    n = graph.num_nodes()
    if n == 0:
        edges.unpersist()
        return spark.createDataFrame([], "id long, rank double")

    out_deg = edges.groupBy(F.col(SRC).alias(ID)).agg(
        F.count(F.lit(1)).alias("outdeg")
    )
    # deg covers every node; dangling nodes carry outdeg NULL → flag column
    deg = (
        graph.node_ids()
        .join(out_deg, ID, "left")
        .select(ID, "outdeg", F.col("outdeg").isNull().alias("dangling"))
        .persist()
    )
    n_dangling = deg.filter("dangling").count()  # also materializes deg

    start_iter = 0
    ranks = None
    danglesum = None
    if checkpointer is not None:
        latest = checkpointer.latest()
        if latest is not None:
            ranks = checkpointer.load(spark, latest)
            start_iter = latest + 1
    if ranks is None:
        ranks = truncate_lineage(deg.select(ID, F.lit(1.0 / n).alias("rank")))
        danglesum = n_dangling / n
    else:
        danglesum = (
            ranks.join(deg.filter("dangling"), ID)
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)))
            .collect()[0][0]
        )

    base = (1.0 - damping) / n
    total_iters = fixed_iterations if fixed_iterations is not None else maxiter
    err = None

    it = start_iter
    while it < total_iters:
        contrib = (
            ranks.join(deg, ID)
            .filter(~F.col("dangling"))
            .select(F.col(ID).alias(SRC), (F.col("rank") / F.col("outdeg")).alias("c"))
        )
        gather = edges.join(contrib, SRC).groupBy(F.col(DST).alias(ID)).agg(
            F.sum("c").alias("g")
        )
        new_ranks = (
            deg.select(ID)
            .join(gather, ID, "left")
            .select(
                ID,
                (
                    F.lit(damping) * F.coalesce(F.col("g"), F.lit(0.0))
                    + F.lit(damping * danglesum / n + base)
                ).alias("rank"),
            )
        )
        if checkpointer is not None:
            new_ranks = checkpointer.save(
                it, new_ranks, {"algorithm": "pagerank", "n": n}
            )
        else:
            new_ranks = truncate_lineage(new_ranks)
        # one combined action: L1 error + next iteration's dangling mass
        stats = (
            new_ranks.join(ranks.withColumnRenamed("rank", "prev"), ID)
            .join(deg.select(ID, "dangling"), ID)
            .agg(
                F.sum(F.abs(F.col("rank") - F.col("prev"))).alias("err"),
                F.coalesce(
                    F.sum(F.when(F.col("dangling"), F.col("rank"))), F.lit(0.0)
                ).alias("danglesum"),
            )
            .collect()[0]
        )
        err, danglesum = stats["err"], stats["danglesum"]
        if metrics_sink is not None:
            metrics_sink.append({"iteration": it, "l1_error": err})
        ranks.unpersist()
        ranks = new_ranks
        it += 1
        if fixed_iterations is None and err < n * tolerance:
            deg.unpersist()
            edges.unpersist()
            return ranks
    deg.unpersist()
    edges.unpersist()
    if fixed_iterations is not None:
        return ranks
    raise ConvergenceError(
        f"pagerank failed to converge in {maxiter} iterations (err={err!r}, "
        f"threshold={n * tolerance!r})"
    )
