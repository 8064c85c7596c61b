"""Ingest invariants (SURVEY.md §5 test plan item c):

- determinism: two generations of the same spec are row-identical.
- per-row invariant: per-turn text equality under stable turn ordering.
- turn-adjacency edge weights match a pandas-side oracle.
- node_labels is a bijection over observed actors.
"""

from pyspark.sql import functions as F

from metagraph_spark.ingest import (
    node_labels,
    synthesize_transcripts,
    tool_cooccurrence_edges,
    transcript_graph,
    turn_adjacency_edges,
)


def test_generator_deterministic(spark):
    a = synthesize_transcripts(spark, 50).orderBy("conv_id", "turn_idx").collect()
    b = synthesize_transcripts(spark, 50).orderBy("conv_id", "turn_idx").collect()
    assert a == b
    assert len(a) > 50


def test_schema_and_text_invariant(spark):
    t = synthesize_transcripts(spark, 30)
    assert dict(t.dtypes) == {
        "conv_id": "string",
        "turn_idx": "int",
        "role": "string",
        "text": "string",
        "tool": "string",
        "ts": "timestamp",
    }
    rows = t.collect()
    for r in rows:
        assert r["text"] == f"turn {r['conv_id']}/{r['turn_idx']}"
    # stable ordering: ts strictly increasing per conv, turn_idx contiguous
    per_conv = {}
    for r in rows:
        per_conv.setdefault(r["conv_id"], []).append(r)
    for conv, rs in per_conv.items():
        rs.sort(key=lambda r: r["turn_idx"])
        assert [r["turn_idx"] for r in rs] == list(range(len(rs)))
        ts = [r["ts"] for r in rs]
        assert ts == sorted(ts) and len(set(ts)) == len(ts)


def test_turn_adjacency_oracle(spark):
    t = synthesize_transcripts(spark, 40)
    edges = turn_adjacency_edges(t).collect()
    pdf = t.toPandas().sort_values(["conv_id", "turn_idx"])
    from metagraph_spark.ingest import node_id  # noqa
    # oracle: count adjacent actor pairs in pandas, then map via labels df
    labels = {r["label"]: r["id"] for r in node_labels(t).collect()}
    expected = {}
    for conv, grp in pdf.groupby("conv_id"):
        actors = [
            (row.tool if isinstance(row.tool, str) else row.role)
            for row in grp.itertuples()
        ]
        for x, y in zip(actors, actors[1:]):
            expected[(labels[x], labels[y])] = (
                expected.get((labels[x], labels[y]), 0) + 1
            )
    got = {(r["src"], r["dst"]): r["weight"] for r in edges}
    assert got == {k: float(v) for k, v in expected.items()}


def test_tool_cooccurrence_oracle(spark):
    t = synthesize_transcripts(spark, 60)
    got = {
        (r["src"], r["dst"]): r["weight"]
        for r in tool_cooccurrence_edges(t).collect()
    }
    labels = {r["label"]: r["id"] for r in node_labels(t).collect()}
    pdf = t.toPandas()
    pdf = pdf[pdf.tool.notna()][["conv_id", "tool"]].drop_duplicates()
    expected = {}
    for conv, grp in pdf.groupby("conv_id"):
        tools = sorted(grp.tool)
        for i in range(len(tools)):
            for j in range(i + 1, len(tools)):
                k = (labels[tools[i]], labels[tools[j]])
                expected[k] = expected.get(k, 0) + 1
    assert got == {k: float(v) for k, v in expected.items()}
    # undirected canonical orientation: no reversed duplicates
    assert not set(got) & {(d, s) for s, d in got}


def test_transcript_graph_roundtrip(spark):
    t = synthesize_transcripts(spark, 40)
    g, labels = transcript_graph(t, "turn_adjacency")
    assert g.is_directed and g.is_weighted
    # every edge endpoint resolves to a label
    ids = {r["id"] for r in labels.collect()}
    for r in g.edges.collect():
        assert r["src"] in ids and r["dst"] in ids
    # labels unique both ways
    n = labels.count()
    assert labels.select("id").distinct().count() == n
    assert labels.select("label").distinct().count() == n
