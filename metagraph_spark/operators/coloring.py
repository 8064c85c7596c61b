"""clustering.coloring.greedy — distributed speculative graph coloring.

Reference contract (abstract def ``plugins/core/algorithms/clustering.py:53-61``;
nx impl ``plugins/networkx/algorithms.py:409-413``): returns ``(NodeMap
node→color, int num_colors)``; the test asserts a PROPER coloring with a
small color count (``tests/algorithms/test_clustering.py:230-251``). The nx
impl is sequential greedy; the distributed analog here is SPECULATIVE
coloring (Gebremedhin-Manne style):

per round, every uncolored vertex tentatively takes the smallest color not
used by any already-colored neighbor (mex); conflicts — adjacent vertices
speculating the SAME color — are resolved by a per-round mix31 priority
(higher (priority, id) wins, losers retry next round). Each round is two
joins + one aggregation; rounds ≈ O(log V) on bounded-degree graphs.
Deterministic given the seed, so the DuckDB oracle replays rounds exactly.

Color count ≤ Δ+1 like sequential greedy (a vertex only ever needs at most
deg+1 candidate colors), but the specific coloring differs from nx's —
allowed: the reference contract is validity + count, not a fixed partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from metagraph_spark.exceptions import ConvergenceError, GraphPropertyError
from metagraph_spark.graph import DST, ID, SRC, Graph
from metagraph_spark.operators.subgraph import mix31
from metagraph_spark.state import truncate_lineage


def greedy_coloring(
    graph: Graph, seed: int = 42, max_rounds: int = 500
) -> tuple[DataFrame, int]:
    """Returns ``(colors, num_colors)`` — colors is ``(id, color:long)``."""
    if graph.is_directed:
        raise GraphPropertyError("coloring requires an undirected graph")
    spark = graph.edges.sparkSession
    sym = truncate_lineage(
        Graph(
            edges=graph.canonical_undirected_edges().select(SRC, DST),
            is_directed=False,
        ).symmetrized()
    )
    uncolored = truncate_lineage(graph.node_ids())
    colored = spark.createDataFrame([], "id long, color long")
    for rnd in range(max_rounds):
        if uncolored.isEmpty():
            num_colors = colored.agg(
                F.countDistinct("color").alias("c")
            ).collect()[0][0]
            return colored, int(num_colors or 0)
        # tentative color = mex over already-colored neighbors (sequence has
        # size+1 candidates, so pigeonhole guarantees a free slot)
        used = (
            sym.join(uncolored.withColumnRenamed(ID, SRC), SRC, "left_semi")
            .join(colored.select(F.col(ID).alias(DST), "color"), DST)
            .groupBy(F.col(SRC).alias(ID))
            .agg(F.array_sort(F.collect_set("color")).alias("used"))
        )
        tent = (
            uncolored.join(used, ID, "left")
            .select(
                ID,
                F.coalesce(
                    F.filter(
                        F.sequence(
                            F.lit(0), F.coalesce(F.size("used"), F.lit(0))
                        ),
                        lambda c: ~F.array_contains(
                            F.coalesce("used", F.array()), c
                        ),
                    )[0],
                    F.lit(0),
                ).alias("color"),
            )
        )
        tent = truncate_lineage(tent)
        # conflict resolution: keep a speculated color only if no neighbor
        # speculated the SAME color with a higher (per-round priority, id)
        e_t = (
            sym.join(
                tent.select(F.col(ID).alias(SRC), F.col("color").alias("cs")),
                SRC,
            )
            .join(
                tent.select(F.col(ID).alias(DST), F.col("color").alias("cd")),
                DST,
            )
            .filter(F.col("cs") == F.col("cd"))
        )
        ps, pd_ = mix31(F.col(SRC), seed + rnd), mix31(F.col(DST), seed + rnd)
        beaten = (
            e_t.filter(
                (pd_ > ps) | ((pd_ == ps) & (F.col(DST) > F.col(SRC)))
            )
            .select(F.col(SRC).alias(ID))
            .distinct()
        )
        winners = truncate_lineage(tent.join(beaten, ID, "left_anti"))
        colored = truncate_lineage(colored.unionAll(winners))
        uncolored = truncate_lineage(
            uncolored.join(winners.select(ID), ID, "left_anti")
        )
    raise ConvergenceError(f"coloring did not finish in {max_rounds} rounds")
