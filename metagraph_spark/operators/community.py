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

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

from metagraph_spark.exceptions import GraphPropertyError
from metagraph_spark.graph import DST, ID, SRC, WEIGHT, Graph
from metagraph_spark.operators.lpa import label_propagation_community
from metagraph_spark.state import truncate_lineage


def modularity(graph: Graph, labels: DataFrame, m: float | None = None) -> float:
    """Weighted Newman modularity of a partition of an undirected graph:
    ``Q = Σ_c [ e_in(c)/m − (deg(c)/2m)² ]`` with self-loops counted once
    in e_in and twice in degree (standard convention, matches
    python-louvain). ``m`` (total edge weight) may be passed in when the
    caller already holds it (the sweep ctx does) to skip one scan."""
    if graph.is_directed:
        raise GraphPropertyError("modularity requires an undirected graph")
    e = _canon_edges(graph)
    lab_s = labels.select(F.col(ID).alias(SRC), F.col("label").alias("_ls"))
    lab_d = labels.select(F.col(ID).alias(DST), F.col("label").alias("_ld"))
    ej = e.join(lab_s, SRC).join(lab_d, DST).persist()
    if m is None:
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


def _canon_edges(graph: Graph) -> DataFrame:
    """Canonical undirected weighted edges, KEEPING self-loops: quotient
    graphs carry contracted intra-community weight on them, and
    python-louvain counts an input graph's self-loops once in m/e_in and
    twice in degree — the class canonical method drops them, so they are
    re-added here (deduplicated by max weight, the same rule the canonical
    method applies to parallel pairs)."""
    if graph.metadata.get("louvain_quotient"):
        return graph.edges
    e = graph.canonical_undirected_edges()
    loops = graph.edges.filter(F.col(SRC) == F.col(DST))
    if not graph.is_weighted:
        e = e.withColumn(WEIGHT, F.lit(1.0))
        loops = loops.withColumn(WEIGHT, F.lit(1.0))
    loops = (
        loops.select(SRC, DST, WEIGHT)
        .groupBy(SRC, DST)
        .agg(F.max(WEIGHT).alias(WEIGHT))
    )
    return e.unionAll(loops)


def _sweep_ctx(graph: Graph):
    """Graph-invariant aggregates shared by every sweep at one level:
    ``(sym, m, node_deg)``. sym mirrors self-loops too — a (contracted)
    node's internal weight w must contribute 2w to its degree
    (python-louvain convention) and w to m. Computed once per level and
    passed into each sweep instead of being rebuilt per sweep (a full-edge
    scan plus a driver collect each time)."""
    e = _canon_edges(graph)
    sym = e.unionAll(
        e.select(F.col(DST).alias(SRC), F.col(SRC).alias(DST), WEIGHT)
    ).persist()
    total = sym.agg(F.sum(WEIGHT)).collect()[0][0]
    m = (total or 0.0) / 2.0
    node_deg = truncate_lineage(
        sym.groupBy(F.col(SRC).alias(ID)).agg(F.sum(WEIGHT).alias("kv"))
    )
    return sym, m, node_deg


def _one_refinement_sweep(
    graph: Graph,
    labels: DataFrame,
    direction: int | None = None,
    ctx=None,
    observer: Observation | None = None,
) -> DataFrame:
    """Synchronous greedy modularity sweep with python-louvain move
    semantics: v is removed from its community, the insertion gain of every
    incident community is compared against RE-INSERTING into its own
    (``kc - kv`` mass), and v moves to the argmax only on a STRICT
    improvement over staying — a move whose insertion gain is negative but
    still better than the own-community gain is taken, matching
    python-louvain (a plain ``gain > 0`` rule misses those strictly
    improving moves). Ties to the smallest label.

    ``direction`` gates moves when the sweep is ITERATED (the multi-level
    loop): 0 allows only moves to labels <= the node's own, 1 only to
    labels >= it. Two adjacent nodes can then never adopt each other's
    labels in the same sweep (a swap needs one move down and one move up),
    which kills the 2-cycle oscillation synchronous sweeps are prone to —
    the alternating-direction trick from parallel Louvain implementations
    (Grappolo-style). ``None`` = ungated single sweep (the
    ``louvain_community`` step)."""
    sym, m, node_deg = ctx if ctx is not None else _sweep_ctx(graph)
    if m <= 0:
        return labels  # edgeless graph: nothing can move
    comm_deg = (
        node_deg.join(labels, ID)
        .groupBy("label")
        .agg(F.sum("kv").alias("kc"))
    )
    # weight from each node to each incident community, EXCLUDING the
    # node's own self-loops: a (contracted) node's internal weight moves
    # with it wherever it goes, so it must cancel out of the move
    # comparison (python-louvain likewise drops the self edge from
    # neighboring-community weights)
    w_nc = (
        sym.filter(F.col(SRC) != F.col(DST))
        .join(labels.select(F.col(ID).alias(DST), "label"), DST)
        .groupBy(F.col(SRC).alias(ID), "label")
        .agg(F.sum(WEIGHT).alias("w"))
    )
    own = labels.select(ID, F.col("label").alias("_own"))
    # gain of re-inserting v into its own community after removal (its
    # edge weight to it may be zero — the community may not be incident)
    own_gain = (
        labels.join(node_deg, ID)
        .join(comm_deg, "label")
        .join(w_nc, [ID, "label"], "left")
        .select(
            ID,
            (
                F.coalesce("w", F.lit(0.0))
                - F.col("kv") * (F.col("kc") - F.col("kv")) / F.lit(2.0 * m)
            ).alias("own_gain"),
        )
    )
    cand = (
        w_nc.join(node_deg, ID)
        .join(comm_deg, "label")
        .join(own, ID)
        .filter(F.col("label") != F.col("_own"))
        .select(
            ID,
            "label",
            "_own",
            (
                F.col("w") - F.col("kv") * F.col("kc") / F.lit(2.0 * m)
            ).alias("gain"),
        )
    )
    if direction == 0:
        cand = cand.filter(F.col("label") <= F.col("_own"))
    elif direction == 1:
        cand = cand.filter(F.col("label") >= F.col("_own"))
    best = cand.groupBy(ID).agg(
        F.max(F.struct(F.col("gain"), (-F.col("label")).alias("nl"))).alias("b")
    ).select(ID, (-F.col("b.nl")).alias("new_label"), F.col("b.gain").alias("gain"))
    moved = F.col("gain") > F.col("own_gain")
    decided = (
        labels.join(best, ID, "left")
        .join(own_gain, ID, "left")
        .select(
            ID,
            F.when(moved, F.col("new_label")).otherwise(F.col("label"))
            .alias("label"),
            F.when(moved, F.lit(1)).otherwise(F.lit(0)).alias("_moved"),
            # exact single-move ΔQ in modularity units ((gain-own_gain)/m);
            # simultaneous moves interact, so the SUM is an estimate of the
            # sweep's actual ΔQ — good enough to judge convergence without
            # a per-sweep exact-modularity pass
            F.when(moved, (F.col("gain") - F.col("own_gain")) / F.lit(m))
            .otherwise(F.lit(0.0)).alias("_dq"),
        )
    )
    if observer is not None:
        decided = decided.observe(
            observer,
            F.sum("_moved").alias("moved"),
            F.sum("_dq").alias("est_dq"),
        )
    return decided.select(ID, "label")


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
    # build the sweep ctx HERE so the persisted symmetrized edge table can
    # be unpersisted once the sweep's result is materialized — letting
    # _one_refinement_sweep build it internally strands a cached 2|E|-row
    # copy in executor storage for the session lifetime
    ctx = _sweep_ctx(graph)
    try:
        refined = truncate_lineage(
            _one_refinement_sweep(graph, labels, ctx=ctx)
        )
    finally:
        ctx[0].unpersist()
    q_before = modularity(graph, labels)
    q_after = modularity(graph, refined)
    if q_after > q_before:
        return refined, q_after
    return labels, q_before


def _quotient_graph(graph: Graph, labels: DataFrame) -> Graph:
    """Louvain phase-2 contraction: one node per community, edge weights
    summed between communities, intra-community weight kept as self-loops
    (they carry e_in into the next level's modularity/gain arithmetic)."""
    e = _canon_edges(graph)
    ls = labels.select(F.col(ID).alias(SRC), F.col("label").alias("_ls"))
    ld = labels.select(F.col(ID).alias(DST), F.col("label").alias("_ld"))
    q_edges = (
        e.join(ls, SRC)
        .join(ld, DST)
        .select(
            F.least("_ls", "_ld").alias(SRC),
            F.greatest("_ls", "_ld").alias(DST),
            WEIGHT,
        )
        .groupBy(SRC, DST)
        .agg(F.sum(WEIGHT).alias(WEIGHT))
    )
    nodes = labels.select(F.col("label").alias(ID)).distinct()
    return Graph(
        edges=truncate_lineage(q_edges),
        nodes=nodes,
        is_directed=False,
        metadata={"louvain_quotient": True},
    )


def louvain_community_multilevel(
    graph: Graph,
    max_levels: int = 10,
    max_sweeps_per_level: int = 20,
    min_gain: float = 1e-6,
) -> tuple[DataFrame, float]:
    """Full multi-level Louvain, matching the reference's python-louvain
    backend semantics (``plugins/networkx/algorithms.py:603-615``): phase 1
    iterates greedy local-move sweeps until no node moves, phase 2
    contracts communities to a quotient graph (``_quotient_graph``), and
    the two phases repeat until the modularity gain drops below
    ``min_gain``. Starts from singleton communities like python-louvain.

    Distributed shape: each sweep is a bounded number of |E|-row shuffles
    on the CURRENT level's graph, and the quotient shrinks geometrically,
    so total work is O(|E| · sweeps) at level 0 plus a fast-decaying tail —
    the standard distributed-Louvain decomposition. Sweeps alternate a
    DIRECTION gate (even sweeps allow only moves to labels <= the node's
    own, odd sweeps only >=), so two neighbors can never adopt each
    other's labels in the same sweep — the 2-cycle oscillation killer;
    every per-level state is lineage-truncated. Returns ``(labels over
    the ORIGINAL nodes, modularity)``."""
    if graph.is_directed:
        raise GraphPropertyError("louvain requires an undirected graph")
    labels = graph.node_ids().select(ID, F.col(ID).alias("label"))
    q_best = modularity(graph, labels)
    g_cur = graph
    for _level in range(max_levels):
        lab = g_cur.node_ids().select(ID, F.col(ID).alias("label"))
        best_lab, best_q = _phase1(g_cur, lab, max_sweeps_per_level)
        if best_q <= q_best + min_gain:
            break
        labels = truncate_lineage(
            labels.join(
                best_lab.select(
                    F.col(ID).alias("label"), F.col("label").alias("_nl")
                ),
                "label",
            ).select(ID, F.col("_nl").alias("label"))
        )
        q_best = best_q
        g_cur = _quotient_graph(g_cur, best_lab)
    # final refinement on the ORIGINAL graph: the coarse levels move whole
    # communities; one more sweep phase at node granularity recovers the
    # individual-node corrections the contraction froze out
    ref_lab, ref_q = _phase1(graph, labels, max_sweeps_per_level)
    if ref_q > q_best + 1e-12:
        labels, q_best = ref_lab, ref_q
    return labels, q_best


def _phase1(
    g_cur: Graph, lab: DataFrame, max_sweeps: int
) -> tuple[DataFrame, float]:
    """Louvain phase 1: iterate alternating-direction synchronous sweeps.

    ONE Spark job per sweep: the sweep's move decision carries an
    ``observe`` with the moved-node count and the summed single-move ΔQ
    estimate, collected by the same localCheckpoint action that
    materializes the new labels — no per-sweep exact-modularity pass (that
    was 2 extra jobs + 2 extra |E|-row label joins per sweep). Convergence:
    two consecutive dry sweeps (one per gate direction — a sweep dry in one
    direction can still move nodes in the other). Exact ``modularity`` is
    evaluated ONCE on level exit, reusing the ctx's total weight ``m``;
    modularity is invariant under self-loop-preserving contraction, so q
    computed on the level graph IS q on the original graph. The accepted
    labeling is the LAST sweep's on the converged path (gated sweeps only
    take strictly-improving moves, so estimated ΔQ is monotone
    non-negative); if the loop EXHAUSTS max_sweeps without converging —
    synchronous moves can 2-cycle with every single move individually
    positive — the last TWO states are compared by exact modularity and
    the better one returned."""
    ctx = _sweep_ctx(g_cur)
    sym, m, _node_deg = ctx
    if m <= 0:
        sym.unpersist()
        return lab, 0.0
    stall = 0
    exhausted = True
    prev_lab = lab
    try:
        for sweep in range(max_sweeps):
            prev_lab = lab
            obs = Observation(f"louvain_sweep_{sweep}_{id(lab)}")
            lab = truncate_lineage(
                _one_refinement_sweep(
                    g_cur, lab, direction=sweep % 2, ctx=ctx, observer=obs
                )
            )
            stats = obs.get
            if stats["moved"] == 0 or stats["est_dq"] <= 1e-12:
                stall += 1
                if stall >= 2:  # both gate directions dry -> converged
                    exhausted = False
                    break
            else:
                stall = 0
        # loop ran ALL max_sweeps without the stall gate firing: the
        # synchronous sweeps may be oscillating (each single move has
        # est_dq > 0 while exact Q drops when applied simultaneously) —
        # the common failure mode is a 2-cycle, so compare the last two
        # states by EXACT modularity and keep the better. This costs 2
        # exact-Q passes only on exhaustion, never on the converged path
        # (one-job-per-sweep discipline preserved).
        if exhausted and max_sweeps > 0:
            q_last = modularity(g_cur, lab, m=m)
            q_prev = modularity(g_cur, prev_lab, m=m)
            if q_prev > q_last:
                return prev_lab, q_prev
            return lab, q_last
    finally:
        sym.unpersist()
    return lab, modularity(g_cur, lab, m=m)


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
