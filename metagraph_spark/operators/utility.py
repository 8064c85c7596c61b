"""util.* operators — graph/node-collection algebra (SURVEY.md §2.1 #5-11, §2.2).

Every function documents the reference semantics it implements (file:line
into /root/reference). All are single Catalyst plans — projections, filters,
semi-joins, aggregations — no iteration, no Python row funcs. Arbitrary
user callables (the reference accepts any Python function in
nodemap.apply/filter/reduce and aggregate_edges/filter_edges,
``plugins/core/algorithms/utility.py:39-100``) are accepted here three ways:

1. a Spark Column expression or SQL string — the fast path, whole-stage
   codegen, use whenever the function is expressible;
2. a named builtin aggregator (``"sum"/"min"/...``) for the fold ops;
3. a VECTORIZED Python callable (``pd.Series -> pd.Series`` for
   apply/filter, ``pd.Series -> scalar`` for aggregate/reduce) — wrapped in
   an Arrow-batched pandas UDF, mirroring the reference's numba
   vectorization (``plugins/numpy/algorithms.py:53-68``). Never per-row.
"""

from __future__ import annotations

from typing import Callable, Optional, Union

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from metagraph_spark.exceptions import GraphPropertyError
from metagraph_spark.graph import DST, ID, SRC, VALUE, WEIGHT, Graph

ColumnLike = Union[Column, str]
FuncLike = Union[Column, str, Callable]

_AGGS = {
    "sum": F.sum,
    "min": F.min,
    "max": F.max,
    "count": F.count,
    "avg": F.avg,
    "mean": F.avg,
}


def _as_expr(func: ColumnLike) -> Column:
    return F.expr(func) if isinstance(func, str) else func


def _value_expr(func: FuncLike, value_col: str, return_type: str) -> Column:
    """Column over ``value_col``: Column/SQL pass through; a Python callable
    becomes an Arrow-batched scalar pandas UDF (``pd.Series -> pd.Series``)."""
    if callable(func) and not isinstance(func, Column):
        import pandas as pd

        def _wrapped(s):
            out = func(s)
            return out if isinstance(out, pd.Series) else pd.Series(out)

        # real annotation objects (postponed-annotation strings from this
        # module would not resolve inside pyspark's hint inference)
        _wrapped.__annotations__ = {"s": pd.Series, "return": pd.Series}
        return F.pandas_udf(_wrapped, return_type)(F.col(value_col))
    return _as_expr(func)


def _grouped_agg(func: Callable, value_col: str, return_type: str = "double"):
    """Grouped-agg pandas UDF from a ``pd.Series -> scalar`` callable
    (Arrow-batched; the callable sees each group's values as one Series)."""
    import pandas as pd

    def _wrapped(s):
        return func(s)

    _wrapped.__annotations__ = {"s": pd.Series, "return": float}
    return F.pandas_udf(_wrapped, return_type)(F.col(value_col))


# --------------------------------------------------------------------- graph
def degree(
    graph: Graph, in_edges: bool = False, out_edges: bool = True
) -> DataFrame:
    """``util.graph.degree`` (``plugins/core/algorithms/utility.py:59-63``;
    nx impl ``plugins/networkx/algorithms.py:338-354``): NodeMap
    ``(id, degree)``. For undirected graphs each incident edge counts once
    regardless of flags (matching nx .degree on an undirected graph); for
    directed, in/out flags select which incidences count. Nodes with no
    counted edges return 0 (NodeMap covers all nodes)."""
    if not (in_edges or out_edges):
        counted = None
    elif not graph.is_directed:
        counted = graph.symmetrized().select(F.col(SRC).alias(ID))
    else:
        parts = []
        if out_edges:
            parts.append(graph.edges.select(F.col(SRC).alias(ID)))
        if in_edges:
            parts.append(graph.edges.select(F.col(DST).alias(ID)))
        counted = parts[0] if len(parts) == 1 else parts[0].unionAll(parts[1])
    nodes = graph.node_ids()
    if counted is None:
        return nodes.select(ID, F.lit(0).cast("long").alias("degree"))
    deg = counted.groupBy(ID).agg(F.count(F.lit(1)).alias("degree"))
    return nodes.join(deg, ID, "left").select(
        ID, F.coalesce("degree", F.lit(0)).alias("degree")
    )


def degree_centrality(
    graph: Graph, in_edges: bool = False, out_edges: bool = True
) -> DataFrame:
    """``centrality.degree`` (``plugins/core/algorithms/centrality.py:72-77``):
    degree / (N - 1). Returns ``(id, centrality)``."""
    n = graph.num_nodes()
    if n <= 1:
        return graph.node_ids().select(ID, F.lit(0.0).alias("centrality"))
    return degree(graph, in_edges, out_edges).select(
        ID, (F.col("degree") / F.lit(float(n - 1))).alias("centrality")
    )


def aggregate_edges(
    graph: Graph,
    func: Union[str, Callable] = "sum",
    initial_value: float = 0.0,
    in_edges: bool = False,
    out_edges: bool = True,
) -> DataFrame:
    """``util.graph.aggregate_edges`` (``utility.py:66-79``; nx
    ``plugins/networkx/algorithms.py:356-379``): fold edge weights per node.
    Undirected graphs aggregate each incident edge ONCE even when both flags
    are set (reference doc: "each edge will only be counted one time").
    Nodes with no counted edges get ``initial_value``; counted edges fold
    starting from ``initial_value`` (sum → initial + sum, min → min(initial,
    min), ...).

    ``func`` may also be a VECTORIZED callable ``pd.Series -> scalar``
    (Arrow grouped-agg pandas UDF, one call per node's weight Series — the
    reference's arbitrary-Python fold without per-row Python); the callable
    owns the initial-value fold, isolated nodes still get
    ``initial_value``."""
    if callable(func):
        return _aggregate_edges_callable(
            graph, func, initial_value, in_edges, out_edges
        )
    if func not in _AGGS:
        raise ValueError(f"unsupported aggregator {func!r}; use one of {list(_AGGS)}")
    if not graph.is_weighted:
        raise GraphPropertyError("aggregate_edges requires an edge weight")
    if not (in_edges or out_edges):
        return graph.node_ids().select(
            ID, F.lit(float(initial_value)).alias(VALUE)
        )
    if not graph.is_directed:
        # each incident edge once per endpoint (self-loops once)
        e = graph.edges
        incid = e.select(F.col(SRC).alias(ID), WEIGHT).unionAll(
            e.filter(F.col(SRC) != F.col(DST)).select(F.col(DST).alias(ID), WEIGHT)
        )
    else:
        parts = []
        if out_edges:
            parts.append(graph.edges.select(F.col(SRC).alias(ID), WEIGHT))
        if in_edges:
            parts.append(graph.edges.select(F.col(DST).alias(ID), WEIGHT))
        incid = parts[0] if len(parts) == 1 else parts[0].unionAll(parts[1])
    agg = incid.groupBy(ID).agg(_AGGS[func](WEIGHT).alias("_agg"))
    init = F.lit(float(initial_value))
    if func == "sum":
        folded = init + F.col("_agg")
    elif func == "min":
        folded = F.least(init, F.col("_agg"))
    elif func == "max":
        folded = F.greatest(init, F.col("_agg"))
    elif func in ("avg", "mean"):
        folded = F.col("_agg")
    else:  # count
        folded = F.col("_agg").cast("double")
    return (
        graph.node_ids()
        .join(agg, ID, "left")
        .select(
            ID,
            F.when(F.col("_agg").isNull(), init)
            .otherwise(folded)
            .cast("double")
            .alias(VALUE),
        )
    )


def _aggregate_edges_callable(
    graph: Graph,
    func: Callable,
    initial_value: float,
    in_edges: bool,
    out_edges: bool,
) -> DataFrame:
    if not graph.is_weighted:
        raise GraphPropertyError("aggregate_edges requires an edge weight")
    if not (in_edges or out_edges):
        return graph.node_ids().select(
            ID, F.lit(float(initial_value)).alias(VALUE)
        )
    if not graph.is_directed:
        e = graph.edges
        incid = e.select(F.col(SRC).alias(ID), WEIGHT).unionAll(
            e.filter(F.col(SRC) != F.col(DST)).select(F.col(DST).alias(ID), WEIGHT)
        )
    else:
        parts = []
        if out_edges:
            parts.append(graph.edges.select(F.col(SRC).alias(ID), WEIGHT))
        if in_edges:
            parts.append(graph.edges.select(F.col(DST).alias(ID), WEIGHT))
        incid = parts[0] if len(parts) == 1 else parts[0].unionAll(parts[1])
    agg = incid.groupBy(ID).agg(_grouped_agg(func, WEIGHT).alias("_agg"))
    return (
        graph.node_ids()
        .join(agg, ID, "left")
        .select(
            ID,
            F.coalesce(F.col("_agg"), F.lit(float(initial_value)))
            .cast("double")
            .alias(VALUE),
        )
    )


def filter_edges(graph: Graph, predicate: FuncLike) -> Graph:
    """``util.graph.filter_edges`` (``utility.py:82-90``; scipy vectorized
    mask ``plugins/scipy/algorithms.py:255-268``): keep edges where
    ``predicate(weight)`` holds; ALL nodes are retained (may create
    isolates), so the node set is pinned to the pre-filter node ids.
    ``predicate``: Column / SQL string, or vectorized callable over the
    weight Series."""
    nodes = graph.nodes if graph.nodes is not None else graph.node_ids()
    return Graph(
        edges=graph.edges.filter(_value_expr(predicate, WEIGHT, "boolean")),
        nodes=nodes,
        is_directed=graph.is_directed,
    )


def assign_uniform_weight(graph: Graph, weight: float = 1.0) -> Graph:
    """``util.graph.assign_uniform_weight`` (``utility.py:93-100``)."""
    e = graph.edges.select(SRC, DST).withColumn(WEIGHT, F.lit(float(weight)))
    return Graph(edges=e, nodes=graph.nodes, is_directed=graph.is_directed)


def collapse_by_label(
    graph: Graph, labels: DataFrame, aggregator: str = "sum"
) -> Graph:
    """``util.graph.collapse_by_label`` (``utility.py:111-117``, quotient
    graph; no concrete impl exists in the reference — semantics from the
    abstract docstring): nodes with the same label collapse into one node
    (named by the label); parallel edges combine via ``aggregator``.
    Self-edges from intra-cluster edges are kept (quotient semantics)."""
    if aggregator not in _AGGS:
        raise ValueError(f"unsupported aggregator {aggregator!r}")
    lab_s = labels.select(F.col(ID).alias(SRC), F.col("label").alias("_ls"))
    lab_d = labels.select(F.col(ID).alias(DST), F.col("label").alias("_ld"))
    e = graph.edges.join(lab_s, SRC).join(lab_d, DST)
    w = F.col(WEIGHT) if graph.is_weighted else F.lit(1.0)
    if not graph.is_directed:
        src_c = F.least("_ls", "_ld")
        dst_c = F.greatest("_ls", "_ld")
    else:
        src_c, dst_c = F.col("_ls"), F.col("_ld")
    edges = (
        e.select(src_c.alias(SRC), dst_c.alias(DST), w.alias(WEIGHT))
        .groupBy(SRC, DST)
        .agg(_AGGS[aggregator](WEIGHT).cast("double").alias(WEIGHT))
    )
    nodes = labels.select(F.col("label").alias(ID)).distinct()
    return Graph(edges=edges, nodes=nodes, is_directed=graph.is_directed)


def edgemap_from_edgeset(graph: Graph, default_value: float = 1.0) -> Graph:
    """``util.edgemap.from_edgeset`` (``utility.py:54-56``; pandas impl
    ``plugins/pandas/algorithms.py:10-22``)."""
    return assign_uniform_weight(graph, default_value)


def graph_isomorphic_quick_reject(g1: Graph, g2: Graph) -> bool:
    """Cheap necessary conditions for isomorphism (the reference declares
    ``util.graph.isomorphic`` ``utility.py:120-122`` but ships no concrete
    implementation; full subgraph isomorphism is out of scope for a
    distributed engine). Returns False when provably non-isomorphic, True
    when the invariants (|V|, |E|, sorted degree sequence) agree."""
    if g1.is_directed != g2.is_directed:
        return False
    if g1.num_nodes() != g2.num_nodes() or g1.num_edges() != g2.num_edges():
        return False
    d1 = degree(g1, in_edges=True, out_edges=True).groupBy("degree").count()
    d2 = degree(g2, in_edges=True, out_edges=True).groupBy("degree").count()
    return d1.exceptAll(d2).isEmpty() and d2.exceptAll(d1).isEmpty()


# ------------------------------------------------------------------- nodeset
def nodeset_choose_random(nodes: DataFrame, k: int, seed: int = 42) -> DataFrame:
    """``util.nodeset.choose_random`` (``utility.py:17-19``; np impl
    ``plugins/numpy/algorithms.py:17-20``): k-subset without replacement.
    Deterministic under a seed: top-k by hash order (scales as a TopK, no
    global sort materialization)."""
    return (
        nodes.orderBy(F.xxhash64(ID, F.lit(seed)))
        .limit(k)
        .select(ID)
    )


def nodeset_from_vector(df: DataFrame, column: str) -> DataFrame:
    """``util.nodeset.from_vector`` (``utility.py:22-24``)."""
    return df.select(F.col(column).cast("long").alias(ID)).distinct()


# ------------------------------------------------------------------- nodemap
def nodemap_sort(
    nodemap: DataFrame,
    ascending: bool = True,
    limit: Optional[int] = None,
    value_col: str = VALUE,
) -> DataFrame:
    """``util.nodemap.sort`` (``utility.py:27-31``; np argsort
    ``plugins/numpy/algorithms.py:28-39``): ids ordered by value (ties by id
    for determinism), optional top-k. Returns a single-column ``(id)``
    DataFrame in sorted order — with ``limit`` this is Spark's TakeOrdered
    (no full sort at scale)."""
    order = [F.col(value_col), F.col(ID)] if ascending else [
        F.col(value_col).desc(),
        F.col(ID),
    ]
    out = nodemap.orderBy(*order).select(ID)
    return out.limit(limit) if limit is not None else out


def nodemap_select(nodemap: DataFrame, nodes: DataFrame) -> DataFrame:
    """``util.nodemap.select`` (``utility.py:34-36``): semi-join restrict."""
    return nodemap.join(nodes.select(ID), ID, "left_semi")


def nodemap_filter(
    nodemap: DataFrame,
    predicate: FuncLike,
    as_nodeset: bool = True,
    value_col: str = VALUE,
) -> DataFrame:
    """``util.nodemap.filter`` (``utility.py:39-41``): keys where
    pred(value); reference returns a NodeSet. ``predicate`` may be a Column,
    SQL string, or vectorized callable ``pd.Series -> pd.Series[bool]``."""
    out = nodemap.filter(_value_expr(predicate, value_col, "boolean"))
    return out.select(ID) if as_nodeset else out


def nodemap_apply(
    nodemap: DataFrame,
    func: FuncLike,
    value_col: str = VALUE,
    return_type: str = "double",
) -> DataFrame:
    """``util.nodemap.apply`` (``utility.py:44-46``): map values. ``func``
    is a Column over ``value`` / SQL string (codegen fast path), or a
    vectorized callable ``pd.Series -> pd.Series`` (Arrow pandas UDF —
    the reference's arbitrary-Python surface without per-row Python)."""
    return nodemap.select(
        ID, _value_expr(func, value_col, return_type).alias(value_col)
    )


def nodemap_reduce(
    nodemap: DataFrame, func: Union[str, Callable] = "sum", value_col: str = VALUE
):
    """``util.nodemap.reduce`` (``utility.py:49-51``): fold values to a
    scalar. Named builtins aggregate JVM-side; a Python callable
    (``pd.Series -> scalar``) runs as ONE grouped-agg pandas UDF — it must
    therefore be safe to see all values in a single Series (compat escape
    hatch; prefer the named builtins at scale)."""
    if callable(func):
        return nodemap.agg(
            _grouped_agg(func, value_col).alias(VALUE)
        ).collect()[0][VALUE]
    if func not in _AGGS:
        raise ValueError(f"unsupported aggregator {func!r}")
    return nodemap.agg(_AGGS[func](value_col).alias(VALUE)).collect()[0][VALUE]
