"""clustering.label_propagation_community — synchronous LPA.

Reference contract (abstract def ``plugins/core/algorithms/clustering.py:16-18``):
``(Graph(is_directed=False)) -> NodeMap``. The nx concrete impl
(``plugins/networkx/algorithms.py:77-86``) is randomized; the reference test
only checks the resulting PARTITION (``tests/algorithms/test_clustering.py:212-227``).

We therefore fix a DETERMINISTIC synchronous variant (reproducible and
checkpoint-resumable, see SURVEY.md §7):

- each round every node adopts the most frequent label among its neighbors
  PLUS ITS OWN current label (one self-vote); ties break to the SMALLEST
  label. The self-vote damps the 2-cycling that pure synchronous LPA
  exhibits on bipartite-ish structures (e.g. the reference's golden CC/LPA
  fixture oscillates without it and converges to the expected partition
  {0,1,3,4}/{2,5,6,7} with it).
- isolated nodes keep their own label.
- stop when no label changes (or after ``fixed_rounds`` for oracle parity
  runs); synchronous LPA can 2-cycle on bipartite-ish structures, so
  ``max_rounds`` caps the loop and the last state is returned rather than
  raising (community detection has no convergence contract in the
  reference).

Spark plan per round: (sym_edges ⋈ labels on src) → groupBy(dst, label).count
→ per-dst argmax via ``max_by``-style struct ordering — two shuffles on the
vertex-state-sized table; the edge table never moves.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

from metagraph_spark.graph import DST, ID, SRC, Graph
from metagraph_spark.state import CheckpointManager, truncate_lineage


def label_propagation_community(
    graph: Graph,
    max_rounds: int = 50,
    fixed_rounds: int | None = None,
    checkpointer: CheckpointManager | None = None,
    strategy: str = "auto",
    kernel_max_vertices: int | None = None,
    kernel_spill_dir: str | None = None,
) -> DataFrame:
    """Return NodeMap ``(id: long, label: long)``.

    Deterministic tie-break: per node, winning label = max count, then min
    label. Implemented with a single ``min_by(label, struct(-count, label))``
    — equivalently ``min(struct(neg_count, label))`` — so each round is one
    aggregation, no window sort.

    ``strategy="kernel"``/``"auto"`` (default) routes to the CSR-block vote kernel
    (``operators/kernel_algos.py:lpa_kernel`` — lexsorted run-length vote
    counting, segmented argmax; EXACTLY the same labels, capped at
    ``pagerank.KERNEL_MAX_VERTICES`` for ``"auto"``). The kernel keeps no
    durable per-round state (explicit ``"kernel"`` + checkpointer raises).
    """
    if strategy not in ("join", "kernel", "auto"):
        raise ValueError(f"unknown lpa strategy {strategy!r}")
    if strategy == "kernel" and checkpointer is not None:
        raise ValueError(
            "strategy='kernel' keeps no durable per-round state and cannot "
            "honor a checkpointer; use strategy='join' or 'auto'"
        )
    if strategy != "join" and checkpointer is None:
        from metagraph_spark.operators.pagerank import KERNEL_MAX_VERTICES

        cap = (
            kernel_max_vertices
            if kernel_max_vertices is not None
            else KERNEL_MAX_VERTICES
        )
        from metagraph_spark.operators.pagerank import KERNEL_AUTO_MAX_EDGES

        if (
            strategy == "kernel"
            or kernel_spill_dir is not None
            or (
                graph.num_nodes() <= cap
                and graph.num_edges() <= KERNEL_AUTO_MAX_EDGES
            )
        ):
            from metagraph_spark.operators.kernel_algos import lpa_kernel

            return lpa_kernel(
                graph,
                max_rounds=max_rounds,
                fixed_rounds=fixed_rounds,
                spill_dir=kernel_spill_dir,
            )
    spark = graph.edges.sparkSession
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions"))
    sym = Graph(
        edges=graph.canonical_undirected_edges().select(SRC, DST),
        is_directed=False,
    ).symmetrized()
    # self-loops implement the one-self-vote rule; persist once for the
    # loop, SRC-partitioned so the per-round vote join never re-shuffles
    # the 2|E|+V-row table (only the |V|-row label state moves)
    sym = (
        sym.unionAll(
            graph.node_ids().select(F.col(ID).alias(SRC), F.col(ID).alias(DST))
        )
        .repartition(n_part, SRC)
        .persist()
    )

    start_round = 0
    labels = None
    if checkpointer is not None:
        latest = checkpointer.latest()
        if latest is not None:
            # saved state carries the loop's _changed marker column; the
            # public NodeMap surface is (id, label) only (as in components.py)
            labels = checkpointer.load(spark, latest)
            if "_changed" in labels.columns:
                labels = labels.drop("_changed")
            start_round = latest + 1
    if labels is None:
        labels = truncate_lineage(
            graph.node_ids().select(ID, F.col(ID).alias("label"))
        )

    total = fixed_rounds if fixed_rounds is not None else max_rounds
    rnd = start_round
    while rnd < total:
        # shuffle_hash: hash-build the |V|-row label side; SMJ would sort
        # the src-partitioned edge cache every round (operators/pagerank.py
        # measurement)
        votes = (
            sym.join(
                labels.select(F.col(ID).alias(SRC), "label").hint(
                    "shuffle_hash"
                ),
                SRC,
            )
            .groupBy(F.col(DST).alias(ID), F.col("label"))
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        # argmax by (count desc, label asc): min over struct(-cnt, label)
        winners = votes.groupBy(ID).agg(
            F.min(F.struct((-F.col("cnt")).alias("nc"), F.col("label"))).alias("w")
        ).select(ID, F.col("w.label").alias("new_label"))
        new_labels = (
            labels.join(winners, ID, "left")
            .select(
                ID,
                F.coalesce("new_label", "label").alias("label"),
                (F.coalesce("new_label", "label") != F.col("label")).alias(
                    "_changed"
                ),
            )
        )
        obs = Observation(f"lpa_round_{rnd}")
        new_labels = new_labels.observe(
            obs, F.count(F.when(F.col("_changed"), 1)).alias("changed")
        )
        if checkpointer is not None:
            new_labels = checkpointer.save(rnd, new_labels, {"algorithm": "lpa"})
        else:
            new_labels = truncate_lineage(new_labels)
        changed = obs.get["changed"]
        labels.unpersist()
        labels = new_labels.drop("_changed")
        rnd += 1
        if fixed_rounds is None and changed == 0:
            break
    sym.unpersist()
    return labels
