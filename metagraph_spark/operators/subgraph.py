"""subgraph.* — extraction, k-core, k-truss, MIS, sampling.

Reference contracts (abstract defs ``plugins/core/algorithms/subgraph.py``;
nx impls ``plugins/networkx/algorithms.py``):

- ``extract_subgraph(Graph, NodeSet) -> Graph`` (:6-8; nx :88-93): node-
  induced subgraph — double semi-join on the edge table.
- ``k_core(Graph(is_directed=False), k) -> Graph`` (:11-13; nx :95-102):
  iteratively drop nodes with degree < k until fixpoint (same loop skeleton
  as connected components).
- ``k_truss(Graph(is_directed=False), k) -> Graph`` (:16-18; nx :104-116,
  modern convention: every kept edge participates in ≥ k-2 triangles within
  the truss): iterative triangle-support filter built on the oriented
  wedge join from triangles.py.
- ``maximal_independent_set(Graph) -> NodeSet`` (:21-23; nx :118-121):
  non-deterministic in the reference; the test only checks independence +
  maximality (``tests/algorithms/test_subgraph.py:87-111``). We run Luby's
  algorithm with seeded hash priorities — deterministic given the seed.
- ``sample.node_sampling / edge_sampling / ties (Graph, p) -> Graph``
  (:31-47; nx :415-509): Bernoulli samples. node_sampling = sample nodes,
  induce edges; edge_sampling = sample edges, keep endpoint nodes;
  TIES = sample edges, then TOTALLY induce over the endpoint node set
  (Ahmed et al., totally-induced edge sampling). Seeded hash Bernoulli
  instead of ``random.random()`` so results are reproducible and
  partition-independent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from metagraph_spark.exceptions import GraphPropertyError
from metagraph_spark.graph import DST, ID, SRC, WEIGHT, Graph
from metagraph_spark.state import truncate_lineage

# --- cross-engine deterministic hash ("mix31") ---------------------------
# Sampling and Luby priorities need a seeded hash that an independent SQL
# engine (the DuckDB oracle) can reproduce exactly. xxhash64 is Spark-only,
# so we use 31-bit modular multiplies + xor-shifts: every intermediate fits
# int64 (no overflow wrap, which DuckDB rejects), and both engines compute
# the identical value. Quality is ample for Bernoulli thresholds/priorities.
_P31 = 2147483647  # 2^31 - 1 (Mersenne prime)


def mix31(col, seed: int):
    """Deterministic 31-bit hash of a non-negative long column (cross-engine:
    see ``mix31_sql`` in ``__spark_entry__.py`` for the DuckDB twin)."""
    h1 = F.pmod(
        F.pmod(col.cast("long"), F.lit(_P31)) * F.lit(2654435761)
        + F.lit(int(seed)),
        F.lit(_P31),
    )
    h2 = F.pmod(
        h1.bitwiseXOR(F.shiftrightunsigned(h1, 15)) * F.lit(1597334677),
        F.lit(_P31),
    )
    return h2.bitwiseXOR(F.shiftrightunsigned(h2, 13))


def edge_key31(src_col, dst_col):
    """Single non-negative long key for an edge, cross-engine computable."""
    return F.pmod(
        F.pmod(src_col.cast("long"), F.lit(_P31)) * F.lit(8191)
        + F.pmod(dst_col.cast("long"), F.lit(_P31)),
        F.lit(_P31),
    )


def extract_subgraph(graph: Graph, nodes: DataFrame) -> Graph:
    """Node-induced subgraph; ``nodes`` is a NodeSet DataFrame ``(id)``."""
    nodes = nodes.select(ID)
    e = (
        graph.edges.join(nodes.withColumnRenamed(ID, SRC), SRC, "left_semi")
        .join(nodes.withColumnRenamed(ID, DST), DST, "left_semi")
    )
    g_nodes = (
        graph.nodes.join(nodes, ID, "left_semi") if graph.nodes is not None else nodes
    )
    return Graph(edges=e, nodes=g_nodes, is_directed=graph.is_directed)


def k_core(graph: Graph, k: int, max_rounds: int = 10_000) -> Graph:
    """Maximal subgraph where every node has degree ≥ k (undirected)."""
    if graph.is_directed:
        raise GraphPropertyError("k_core requires an undirected graph")
    edges = truncate_lineage(graph.canonical_undirected_edges())
    while max_rounds > 0:
        max_rounds -= 1
        deg = (
            edges.select(F.col(SRC).alias(ID))
            .unionAll(edges.select(F.col(DST).alias(ID)))
            .groupBy(ID)
            .agg(F.count(F.lit(1)).alias("d"))
        )
        keep = deg.filter(F.col("d") >= k).select(ID)
        nxt = (
            edges.join(keep.withColumnRenamed(ID, SRC), SRC, "left_semi")
            .join(keep.withColumnRenamed(ID, DST), DST, "left_semi")
        )
        nxt = truncate_lineage(nxt)
        if nxt.count() == edges.count():
            edges = nxt
            break
        edges = nxt
    nodes = (
        edges.select(F.col(SRC).alias(ID))
        .unionAll(edges.select(F.col(DST).alias(ID)))
        .distinct()
    )
    return Graph(edges=edges, nodes=nodes, is_directed=False)


def _edge_support(edges: DataFrame) -> DataFrame:
    """Triangle support per canonical undirected edge ``(src, dst, support)``.

    Uses the oriented wedge join (triangles.py plan): each triangle
    (a<b<c by id) contributes support to its three edges."""
    e = edges.select(SRC, DST)
    # id-ordered orientation is enough for support counting (a<b guaranteed
    # by canonical form)
    e1, e2, e3 = e.alias("e1"), e.alias("e2"), e.alias("e3")
    tri = (
        e1.join(e2, F.col("e1.dst") == F.col("e2.src"))
        .join(
            e3,
            (F.col("e3.src") == F.col("e1.src")) & (F.col("e3.dst") == F.col("e2.dst")),
            "left_semi",
        )
        .select(
            F.col("e1.src").alias("a"),
            F.col("e1.dst").alias("b"),
            F.col("e2.dst").alias("c"),
        )
    )
    sides = (
        tri.select(F.col("a").alias(SRC), F.col("b").alias(DST))
        .unionAll(tri.select(F.col("a").alias(SRC), F.col("c").alias(DST)))
        .unionAll(tri.select(F.col("b").alias(SRC), F.col("c").alias(DST)))
    )
    return sides.groupBy(SRC, DST).agg(F.count(F.lit(1)).alias("support"))


def k_truss(graph: Graph, k: int, max_rounds: int = 10_000) -> Graph:
    """Maximal subgraph where every edge participates in ≥ k-2 triangles
    (modern nx convention, see module docstring). Iterative support filter."""
    if graph.is_directed:
        raise GraphPropertyError("k_truss requires an undirected graph")
    need = k - 2
    edges = truncate_lineage(graph.canonical_undirected_edges().select(SRC, DST))
    while max_rounds > 0:
        max_rounds -= 1
        support = _edge_support(edges)
        kept = (
            edges.join(support, [SRC, DST], "left")
            .filter(F.coalesce("support", F.lit(0)) >= need)
            .select(SRC, DST)
        )
        kept = truncate_lineage(kept)
        if kept.count() == edges.count():
            edges = kept
            break
        edges = kept
    nodes = (
        edges.select(F.col(SRC).alias(ID))
        .unionAll(edges.select(F.col(DST).alias(ID)))
        .distinct()
    )
    return Graph(edges=edges, nodes=nodes, is_directed=False)


def maximal_independent_set(
    graph: Graph, seed: int = 42, max_rounds: int = 200
) -> DataFrame:
    """Luby's algorithm with seeded hash priorities → NodeSet ``(id)``.

    Each round: a node joins the MIS iff its priority beats every remaining
    neighbor's; MIS members and their neighbors leave the residual graph.
    O(log V) rounds w.h.p.; deterministic given the seed."""
    sym = Graph(
        edges=graph.canonical_undirected_edges().select(SRC, DST),
        is_directed=False,
    ).symmetrized()
    sym = truncate_lineage(sym.filter(F.col(SRC) != F.col(DST)))
    remaining = truncate_lineage(graph.node_ids())
    spark = graph.edges.sparkSession
    mis = spark.createDataFrame([], "id long")
    for rnd in range(max_rounds):
        if remaining.isEmpty():
            break
        # cross-engine hash so the DuckDB oracle can replay the exact rounds
        prio = mix31(F.col(ID), seed + rnd)
        cand = remaining.select(ID, prio.alias("p"))
        edges_r = (
            sym.join(cand.withColumnRenamed(ID, SRC).withColumnRenamed("p", "ps"), SRC)
            .join(cand.withColumnRenamed(ID, DST).withColumnRenamed("p", "pd"), DST)
        )
        # a node loses if any neighbor has (higher priority, or equal and larger id)
        beaten = edges_r.filter(
            (F.col("pd") > F.col("ps"))
            | ((F.col("pd") == F.col("ps")) & (F.col(DST) > F.col(SRC)))
        ).select(F.col(SRC).alias(ID)).distinct()
        winners = truncate_lineage(cand.select(ID).join(beaten, ID, "left_anti"))
        mis = truncate_lineage(mis.unionAll(winners))
        nbrs = (
            sym.join(winners.withColumnRenamed(ID, SRC), SRC, "left_semi")
            .select(F.col(DST).alias(ID))
            .distinct()
        )
        remaining = truncate_lineage(
            remaining.join(winners.unionAll(nbrs), ID, "left_anti")
        )
        sym = truncate_lineage(
            sym.join(remaining.withColumnRenamed(ID, SRC), SRC, "left_semi")
            .join(remaining.withColumnRenamed(ID, DST), DST, "left_semi")
        )
    return mis


_SALT31 = {"node": 101, "edge": 202, "ties": 303}


def _bernoulli(col, p: float, seed: int, salt: str):
    """Deterministic Bernoulli(p) from a cross-engine hash of the key
    columns (mix31 — replayable by the DuckDB oracle, see module head)."""
    if len(col) == 1:
        key = col[0].cast("long")
    else:
        key = edge_key31(col[0], col[1])
    h = F.pmod(mix31(key, seed + _SALT31[salt]), F.lit(1_000_000))
    return (h.cast("double") + 0.5) / 1_000_000.0 < p


def node_sampling(graph: Graph, p: float = 0.20, seed: int = 42) -> Graph:
    """Bernoulli node sample + induced edges (nx :415-451)."""
    if not 0 < p <= 1:
        raise ValueError(f"Probability `p` must be between 0 and 1, found {p}")
    ns = graph.node_ids().filter(_bernoulli([F.col(ID)], p, seed, "node"))
    return extract_subgraph(graph, ns)


def edge_sampling(graph: Graph, p: float = 0.20, seed: int = 42) -> Graph:
    """Bernoulli edge sample; nodes = endpoints of kept edges (nx :453-478)."""
    if not 0 < p <= 1:
        raise ValueError(f"Probability `p` must be between 0 and 1, found {p}")
    es = graph.edges.filter(
        _bernoulli([F.col(SRC), F.col(DST)], p, seed, "edge")
    )
    nodes = (
        es.select(F.col(SRC).alias(ID)).unionAll(es.select(F.col(DST).alias(ID)))
    ).distinct()
    return Graph(edges=es, nodes=nodes, is_directed=graph.is_directed)


def totally_induced_edge_sampling(
    graph: Graph, p: float = 0.20, seed: int = 42
) -> Graph:
    """TIES (nx :480-509; Ahmed et al.): Bernoulli edge sample → take the
    endpoint node set → return the TOTALLY induced subgraph over it."""
    if not 0 < p <= 1:
        raise ValueError(f"Probability `p` must be between 0 and 1, found {p}")
    es = graph.edges.filter(
        _bernoulli([F.col(SRC), F.col(DST)], p, seed, "ties")
    )
    nodes = (
        es.select(F.col(SRC).alias(ID)).unionAll(es.select(F.col(DST).alias(ID)))
    ).distinct()
    return extract_subgraph(graph, nodes)


def random_walk_sampling(
    graph: Graph,
    num_walks: int = 8,
    num_steps: int = 10,
    jump_probability: float = 0.15,
    start_node: int | None = None,
    seed: int = 42,
) -> DataFrame:
    """subgraph.sample.random_walk, distributed analog: ``num_walks``
    PARALLEL seeded walks of ``num_steps`` steps each; returns the visited
    edge rows ``(walk_id, step, src, dst)``.

    Reference (nx :511-581) runs ONE sequential walk with
    ``jump_probability`` resets; a single walk is inherently sequential, so
    the distributed form runs many walks at once — each walk replicates the
    per-step semantics (reset w.p. p, else uniform random neighbor; dead
    ends reset). All randomness is mix31-derived from (walk_id, step), so
    runs are deterministic, partition-independent, and replayable by the
    DuckDB oracle. Each step is one join of the walker state (W rows)
    against the indexed edge table — W·steps total work, no driver loop
    over edges.

    Pass the result to :func:`extract_subgraph`/``util.graph.build`` to get
    the sampled Graph (endpoint-induced), mirroring the reference's
    returned visited-subgraph."""
    if not 0 < jump_probability <= 1:
        raise ValueError(
            f"`jump_probability` must be between 0 and 1, found {jump_probability}"
        )
    spark = graph.edges.sparkSession
    from pyspark.sql import Window

    # neighbor index: rn-th out-neighbor of src (deterministic order by dst);
    # undirected graphs walk both directions (symmetrized)
    ie = truncate_lineage(
        graph.symmetrized().select(SRC, DST)
        .distinct()
        .withColumn(
            "rn", F.row_number().over(Window.partitionBy(SRC).orderBy(DST))
        )
    )
    deg = ie.groupBy(F.col(SRC).alias("cur")).agg(F.max("rn").alias("outdeg"))
    walks = spark.range(num_walks).select(F.col("id").alias("walk_id"))
    if start_node is not None:
        starts = walks.select("walk_id", F.lit(int(start_node)).alias("start"))
    else:
        n = graph.num_nodes()
        idx_nodes = graph.node_ids().withColumn(
            "nrn", F.row_number().over(Window.orderBy(ID))
        )
        pick = walks.select(
            "walk_id",
            (F.pmod(mix31(F.col("walk_id"), seed + 404), F.lit(n)) + 1).alias(
                "nrn"
            ),
        )
        starts = pick.join(idx_nodes, "nrn").select(
            "walk_id", F.col(ID).alias("start")
        )
    state = truncate_lineage(
        starts.select("walk_id", "start", F.col("start").alias("cur"))
    )
    visited = []
    for k in range(num_steps):
        key = edge_key31(F.col("walk_id") * F.lit(num_steps) + F.lit(k), F.col("cur"))
        u = (
            F.pmod(mix31(key, seed + 505), F.lit(1_000_000)).cast("double")
            + 0.5
        ) / 1_000_000.0
        st = state.join(deg, "cur", "left").select(
            "walk_id",
            "start",
            "cur",
            "outdeg",
            (u < jump_probability).alias("_jump"),
            F.pmod(
                mix31(
                    edge_key31(
                        F.col("walk_id") * F.lit(num_steps) + F.lit(k + 7919),
                        F.col("cur"),
                    ),
                    seed + 606,
                ),
                F.greatest(F.coalesce("outdeg", F.lit(1)), F.lit(1)),
            ).alias("_idx"),
        )
        moved = (
            st.filter(~F.col("_jump") & F.col("outdeg").isNotNull())
            .join(ie.select(F.col(SRC).alias("cur"), DST, "rn"), ["cur"])
            .filter(F.col("rn") == F.col("_idx") + 1)
            .select(
                "walk_id",
                "start",
                F.col("cur").alias(SRC),
                F.col(DST).alias("nxt"),
            )
        )
        visited.append(
            moved.select(
                "walk_id",
                F.lit(k).alias("step"),
                F.col(SRC),
                F.col("nxt").alias(DST),
            )
        )
        resets = st.filter(
            F.col("_jump") | F.col("outdeg").isNull()
        ).select("walk_id", "start", F.col("start").alias("cur"))
        state = truncate_lineage(
            moved.select(
                "walk_id", "start", F.col("nxt").alias("cur")
            ).unionAll(resets)
        )
    out = visited[0]
    for v in visited[1:]:
        out = out.unionAll(v)
    return out
