"""metagraph_spark — a from-scratch PySpark-native link-graph analytics engine.

Re-expresses the query semantics of metagraph-dev/metagraph (a multi-backend
graph-algorithm dispatch layer, see ``/root/reference``) as ONE concrete
implementation over Spark DataFrames:

- data model: an edge table ``(src: long, dst: long, weight: double)`` plus an
  optional node table, wrapped in :class:`metagraph_spark.graph.Graph`
  (reference analog: ``plugins/pandas/types.py:39-71`` PandasEdgeMap — the
  canonical edge-triple representation).
- algorithms: iterative DataFrame joins + vectorized Arrow/pandas kernels
  (no per-row Python UDFs anywhere).
- ingest: transcript tables ``(conv_id, turn_idx, role, text, tool, ts)`` →
  turn-adjacency and co-occurrence edges.

All structure here is derived from public knowledge: the Apache Spark API and
the Apache-2.0 metagraph reference semantics.
"""

from metagraph_spark.exceptions import ConvergenceError
from metagraph_spark.graph import Graph
from metagraph_spark.session import get_spark

__all__ = ["ConvergenceError", "Graph", "get_spark"]

__version__ = "0.1.0"
