"""flow.max_flow / min_cut parity with the reference fixtures
(``/root/reference/metagraph/tests/algorithms/test_flow.py:7-121``)."""

import math

from pyspark.sql import functions as F

from metagraph_spark.graph import build
from metagraph_spark.operators.flow import max_flow, min_cut
from tests.conftest import df_from_edges

MAXFLOW_EDGES = [
    (0, 1, 9.0), (0, 3, 10.0), (1, 4, 3.0), (2, 7, 6.0), (3, 1, 2.0),
    (3, 4, 8.0), (4, 5, 7.0), (4, 2, 4.0), (5, 2, 5.0), (5, 6, 1.0),
    (6, 2, 11.0),
]
MINCUT_EDGES = [
    (0, 1, 9.0), (0, 3, 10.0), (1, 4, 3.0), (2, 7, 6.0), (3, 1, 2.0),
    (3, 4, 8.0), (4, 5, 1.0), (4, 2, 4.0), (5, 2, 5.0), (5, 6, 1.0),
    (6, 2, 11.0),
]


def test_max_flow_reference_fixture(spark):
    g = build(df_from_edges(spark, MAXFLOW_EDGES, weighted=True), is_directed=True)
    value, fg = max_flow(g, 0, 7)
    # reference expected flow value = 6
    assert math.isclose(value, 6.0)
    # flow graphs are non-unique; reference asserts per-bottleneck-node
    # in/out flow sums {2: 6, 4: 6}
    out_sum = {
        r["id"]: r["v"]
        for r in fg.edges.groupBy(F.col("src").alias("id"))
        .agg(F.sum("weight").alias("v"))
        .collect()
    }
    in_sum = {
        r["id"]: r["v"]
        for r in fg.edges.groupBy(F.col("dst").alias("id"))
        .agg(F.sum("weight").alias("v"))
        .collect()
    }
    for node in (2, 4):
        assert math.isclose(out_sum[node], 6.0), (node, out_sum)
        assert math.isclose(in_sum[node], 6.0), (node, in_sum)
    # conservation: all input nodes present on the flow graph handle
    assert fg.node_ids().count() == 8


def test_min_cut_reference_fixture(spark):
    g = build(df_from_edges(spark, MINCUT_EDGES, weighted=True), is_directed=True)
    value, cg = min_cut(g, 0, 7)
    assert math.isclose(value, 5.0)
    got = {(r["src"], r["dst"], r["weight"]) for r in cg.edges.collect()}
    assert got == {(4, 5, 1.0), (4, 2, 4.0)}
    assert cg.node_ids().count() == 8


def test_max_flow_disconnected(spark):
    g = build(
        df_from_edges(spark, [(0, 1, 2.0), (2, 3, 5.0)], weighted=True),
        is_directed=True,
    )
    value, fg = max_flow(g, 0, 3)
    assert value == 0.0
    assert fg.edges.count() == 0


def test_min_cut_validates_source_target(spark):
    import pytest

    g = build(df_from_edges(spark, MINCUT_EDGES, weighted=True), is_directed=True)
    with pytest.raises(ValueError, match="not in graph"):
        min_cut(g, 999, 7)
    with pytest.raises(ValueError, match="not in graph"):
        min_cut(g, 0, -5)
