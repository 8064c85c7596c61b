"""Graph handle: the engine's single concrete graph representation.

Reference analogs:

- abstract ``Graph`` with explicit schema properties (is_directed, edge_type,
  dtype, …): ``metagraph/plugins/core/types.py:87-96``.
- canonical physical form = edge triple table (``plugins/pandas/types.py:39-71``
  PandasEdgeMap: src/dst/weight columns).
- lazily-computed-and-cached properties (``core/plugin.py:233-280``,
  ``core/typecache.py:28-80``) → here: explicit metadata carried on the
  handle, computed at most once with DataFrame aggregates.

Spark-first design notes:

- ``edges`` is hash-partitioned by ``src`` once (``partition_by_src``) and
  persisted, so every superstep join (rank ⋈ edges on src) reuses the edge
  side's exchange; only the small vertex-state DataFrame shuffles per
  iteration.
- undirected graphs store each edge ONCE in canonical (min,max) orientation;
  algorithms that need both directions call ``symmetrized()``
  (reference analog: scipy translator symmetrization,
  ``plugins/scipy/translators.py:120-126``).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SRC, DST, WEIGHT = "src", "dst", "weight"
ID, VALUE = "id", "value"


@dataclass
class Graph:
    """A graph = edge DataFrame + optional node DataFrame + metadata.

    ``edges`` columns: ``src:long, dst:long[, weight:double]``.
    ``nodes`` columns: ``id:long[, value]`` (NodeSet / NodeMap attached to the
    graph, reference ``plugins/core/types.py:29-56``). When ``nodes`` is None
    the node set is the set of edge endpoints.
    """

    edges: DataFrame
    nodes: Optional[DataFrame] = None
    is_directed: bool = True
    metadata: dict = field(default_factory=dict)

    # ---------------------------------------------------------------- props
    @property
    def is_weighted(self) -> bool:
        return WEIGHT in self.edges.columns

    def node_ids(self) -> DataFrame:
        """All node ids as a single-column DataFrame ``(id:long)``.

        Endpoint union ∪ explicit isolate nodes — matches
        ``util.graph.build`` semantics (``plugins/core/algorithms/utility.py:103-108``:
        nodes argument may add isolates).
        """
        ids = (
            self.edges.select(F.col(SRC).alias(ID))
            .unionAll(self.edges.select(F.col(DST).alias(ID)))
            .distinct()
        )
        if self.nodes is not None:
            ids = ids.unionAll(self.nodes.select(ID)).distinct()
        return ids

    def num_nodes(self) -> int:
        n = self.metadata.get("num_nodes")
        if n is None:
            n = self.node_ids().count()
            self.metadata["num_nodes"] = n
        return n

    def num_edges(self) -> int:
        n = self.metadata.get("num_edges")
        if n is None:
            n = self.edges.count()
            self.metadata["num_edges"] = n
        return n

    def has_negative_weights(self) -> bool:
        """Computed once and cached on the handle (reference computes
        ``min(weights) < 0`` lazily, ``plugins/pandas/types.py:215-222``)."""
        v = self.metadata.get("has_negative_weights")
        if v is None:
            if not self.is_weighted:
                v = False
            else:
                row = self.edges.agg(F.min(WEIGHT).alias("m")).collect()[0]
                v = bool(row["m"] is not None and row["m"] < 0)
            self.metadata["has_negative_weights"] = v
        return v

    # ------------------------------------------------------------ transforms
    def symmetrized(self) -> DataFrame:
        """Both directions of every edge (used by undirected algorithms).

        Reference analog: the scipy translator duplicates non-self-loop edges
        in reverse for undirected graphs (``plugins/scipy/translators.py:120-126``).
        Directed graphs are returned as-is.
        """
        if self.is_directed:
            return self.edges
        cols = [F.col(DST).alias(SRC), F.col(SRC).alias(DST)]
        if self.is_weighted:
            cols.append(F.col(WEIGHT))
        reverse = self.edges.filter(F.col(SRC) != F.col(DST)).select(*cols)
        return self.edges.unionAll(reverse)

    def canonical_undirected_edges(self) -> DataFrame:
        """One row per undirected edge in (min,max) orientation, self-loops
        dropped, duplicates removed. Weighted input keeps the max weight per
        canonical pair (deterministic). Needed before triangle counting
        (reference dedup contract ``plugins/pandas/types.py:171-182``)."""
        e = self.edges.filter(F.col(SRC) != F.col(DST))
        lo = F.least(SRC, DST).alias(SRC)
        hi = F.greatest(SRC, DST).alias(DST)
        if self.is_weighted:
            return e.select(lo, hi, F.col(WEIGHT)).groupBy(SRC, DST).agg(
                F.max(WEIGHT).alias(WEIGHT)
            )
        return e.select(lo, hi).distinct()

    def out_degrees(self, weighted: bool = False) -> DataFrame:
        """``(id, degree)`` over outgoing edges (directed) or incident edges
        counted once per neighbor (undirected, via symmetrization)."""
        e = self.symmetrized()
        agg = F.sum(WEIGHT) if (weighted and self.is_weighted) else F.count(F.lit(1))
        return e.groupBy(F.col(SRC).alias(ID)).agg(agg.alias("degree"))

    def partition_by_src(self, num_partitions: int | None = None) -> "Graph":
        """Hash-partition edges by src and persist — the one-time layout step
        every iterative algorithm amortizes across supersteps (reference
        analog: chunked CSR load, ``core/dask/loader.py:15-74``)."""
        n = num_partitions or self.edges.sparkSession.conf.get(
            "spark.sql.shuffle.partitions"
        )
        e = self.edges.repartition(int(n), SRC).persist()
        meta = dict(self.metadata)
        meta["partitioned_by_src"] = int(n)
        return Graph(
            edges=e,
            nodes=self.nodes,
            is_directed=self.is_directed,
            metadata=meta,
        )

    def unpersist(self) -> None:
        self.edges.unpersist()


def build(
    edges: DataFrame,
    nodes: Optional[DataFrame] = None,
    is_directed: bool = True,
) -> Graph:
    """``util.graph.build`` (reference ``plugins/core/algorithms/utility.py:103-108``):
    construct a Graph from an EdgeSet/EdgeMap DataFrame plus optional
    NodeSet/NodeMap DataFrame (isolate nodes allowed)."""
    cols = [F.col(SRC).cast("long").alias(SRC), F.col(DST).cast("long").alias(DST)]
    if WEIGHT in edges.columns:
        cols.append(F.col(WEIGHT).cast("double").alias(WEIGHT))
    e = edges.select(*cols)
    if nodes is not None:
        ncols = [F.col(ID).cast("long").alias(ID)]
        if VALUE in nodes.columns:
            ncols.append(F.col(VALUE))
        nodes = nodes.select(*ncols)
    return Graph(edges=e, nodes=nodes, is_directed=is_directed)
