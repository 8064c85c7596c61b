"""Transcript ingest: synthetic generator + edge builders + node labeling.

Input schema (BASELINE.json input_hint): an Iceberg/parquet table of
multi-turn conversation / agent transcripts::

    (conv_id: string, turn_idx: int32, role: string, text: string,
     tool: string, ts: timestamp)

Per-row invariant vs the reference: per-turn text equality under stable turn
ordering — the generator derives ``text`` deterministically from
``(conv_id, turn_idx)`` so any two runs (and any two engines) agree row-wise.

Reference analogs:

- graph-from-edge-table ingestion: ``util.graph.build``
  (``plugins/core/algorithms/utility.py:103-108``) +
  ``nx_graph_build_from_pandas`` (``plugins/networkx/algorithms.py:622-639``).
- string-labeled nodes via an explicit bidirectional label↔int map:
  ``metagraph/core/node_labels.py:1-53`` → here a dimension DataFrame
  ``node_labels(id, label, kind)`` with ``xxhash64``-derived ids (stable,
  distributed, no driver-side counter; collision probability at 10^12 nodes
  is the 64-bit birthday bound, acceptable for link analytics).
- co-occurrence edges = bipartite projection
  (``bipartite.graph_projection``, ``plugins/core/algorithms/bipartite.py:5-7``).

Everything is whole-stage-codegen DataFrame ops: the generator is
``spark.range`` + hash arithmetic (no Python row funcs), the edge builders
are window ``lag`` + groupBy/self-join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from metagraph_spark.graph import DST, SRC, Graph

ROLES = ["user", "assistant", "system", "tool"]
NODE_KIND_ROLE = "role"
NODE_KIND_TOOL = "tool"
NODE_KIND_CONV = "conv"


def synthesize_transcripts(
    spark: SparkSession,
    num_convs: int,
    max_turns: int = 8,
    num_tools: int = 200,
    tool_zipf_s: float = 1.1,
    seed: int = 42,
) -> DataFrame:
    """Deterministic synthetic transcripts (seeded; no RNG state — every
    column is a pure hash function of (conv_id, turn_idx, seed) so the table
    is reproducible at any scale and any partitioning).

    Tool choice follows an approximate Zipf(s) over ``num_tools`` names via
    inverse-CDF on a uniform hash — a few hub tools dominate, exercising the
    skew handling (FIXTURES.md §1).
    """
    conv = spark.range(num_convs).select(
        F.format_string("conv_%08d", F.col("id")).alias("conv_id"),
        (F.pmod(F.xxhash64(F.col("id"), F.lit(seed)), F.lit(max_turns)) + 1).alias(
            "n_turns"
        ),
        F.col("id").alias("_conv_seq"),
    )
    turns = conv.select(
        "conv_id",
        "_conv_seq",
        F.explode(F.sequence(F.lit(0), F.col("n_turns") - 1)).alias("turn_idx"),
    )
    h = F.pmod(F.xxhash64("conv_id", "turn_idx", F.lit(seed)), F.lit(1_000_000))
    # role cycles user/assistant with occasional system/tool rows
    role = (
        F.when(F.col("turn_idx") == 0, F.lit("user"))
        .when(h % 17 == 0, F.lit("system"))
        .when(h % 5 == 0, F.lit("tool"))
        .when(F.col("turn_idx") % 2 == 1, F.lit("assistant"))
        .otherwise(F.lit("user"))
    )
    # Zipf(s) inverse-CDF approximation: rank = floor(N^(u)) biased low.
    u = (h.cast("double") + 0.5) / 1_000_000.0
    zipf_rank = F.floor(
        F.pow(F.lit(float(num_tools)), F.pow(u, F.lit(tool_zipf_s)))
    ) % num_tools
    tool = F.when(
        role.isin("assistant", "tool") & (h % 3 != 0),
        F.format_string("tool_%03d", zipf_rank.cast("int")),
    ).otherwise(F.lit(None).cast("string"))
    return turns.select(
        "conv_id",
        F.col("turn_idx").cast("int").alias("turn_idx"),
        role.alias("role"),
        F.format_string("turn %s/%s", F.col("conv_id"), F.col("turn_idx")).alias(
            "text"
        ),
        tool.alias("tool"),
        (
            F.timestamp_seconds(
                F.lit(1700000000) + F.col("_conv_seq") * 10000 + F.col("turn_idx")
            )
        ).alias("ts"),
    )


def zipf_graph(
    spark: SparkSession,
    num_nodes: int,
    num_edges: int,
    zipf_s: float = 1.05,
    seed: int = 42,
) -> DataFrame:
    """Deterministic directed Zipf-out-degree benchmark graph
    (FIXTURES.md §2): edge i has ``src`` drawn by inverse-CDF Zipf(s) over
    node ids (a few hubs dominate), ``dst`` uniform. Tail nodes never appear
    as src → natural dangling vertices. Pure hash arithmetic over
    ``spark.range`` — reproducible at any scale and partitioning."""
    e = spark.range(num_edges)
    h1 = F.pmod(F.xxhash64("id", F.lit(seed)), F.lit(1_000_000))
    u = (h1.cast("double") + 0.5) / 1_000_000.0
    src = F.floor(
        F.pow(F.lit(float(num_nodes)), F.pow(u, F.lit(zipf_s)))
    ) % num_nodes
    dst = F.pmod(F.xxhash64("id", F.lit(seed + 1)), F.lit(num_nodes))
    return e.select(
        src.cast("long").alias(SRC),
        dst.cast("long").alias(DST),
    )


def node_id(label_col, kind: str):
    """Stable 64-bit node id for a string label, namespaced by kind.

    xxhash64 over (kind, label): distributed, order-free, reproducible —
    the Spark-native replacement for the reference's NodeLabels positional
    map (``core/node_labels.py:14-27``)."""
    return F.xxhash64(F.lit(kind), label_col)


def actor_label(df: DataFrame) -> DataFrame:
    """Per-turn actor label: the tool name when present, else the role."""
    return df.withColumn(
        "_actor", F.coalesce(F.col("tool"), F.col("role"))
    ).withColumn(
        "_kind",
        F.when(F.col("tool").isNotNull(), F.lit(NODE_KIND_TOOL)).otherwise(
            F.lit(NODE_KIND_ROLE)
        ),
    )


def node_labels(transcripts: DataFrame) -> DataFrame:
    """Dimension table ``(id:long, label:string, kind:string)`` for every
    actor appearing in the transcripts (bidirectional label↔id map)."""
    actors = actor_label(transcripts).select(
        F.col("_actor").alias("label"), F.col("_kind").alias("kind")
    ).distinct()
    return actors.select(
        node_id(F.col("label"), "actor").alias("id"), "label", "kind"
    )


def turn_adjacency_edges(transcripts: DataFrame) -> DataFrame:
    """Directed weighted edges between consecutive turn actors.

    ``lag`` over ``Window.partitionBy(conv_id).orderBy(turn_idx)`` (stable
    turn ordering = the per-row invariant); weight = number of adjacent
    occurrences across all conversations. One shuffle (the window) + one
    aggregation."""
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    t = actor_label(transcripts)
    pairs = (
        t.withColumn("_prev", F.lag("_actor").over(w))
        .filter(F.col("_prev").isNotNull())
        .select(
            node_id(F.col("_prev"), "actor").alias(SRC),
            node_id(F.col("_actor"), "actor").alias(DST),
        )
    )
    return pairs.groupBy(SRC, DST).agg(
        F.count(F.lit(1)).cast("double").alias("weight")
    )


def tool_cooccurrence_edges(
    transcripts: DataFrame, max_tools_per_conv: int = 64
) -> DataFrame:
    """Undirected weighted edges between tools used in the same conversation
    (bipartite conv→tool projection, reference
    ``bipartite.graph_projection`` ``plugins/core/algorithms/bipartite.py:5-7``).

    Plan: distinct (conv, tool) pairs → self-join on conv with ``tool_a <
    tool_b`` (each undirected pair once, canonical orientation) → count.
    ``max_tools_per_conv`` caps the quadratic blow-up from pathological
    conversations (drop-and-log strategy at scale: a conv using hundreds of
    distinct tools contributes O(k²) pairs)."""
    ct = (
        transcripts.filter(F.col("tool").isNotNull())
        .select("conv_id", "tool")
        .distinct()
    )
    w = Window.partitionBy("conv_id").orderBy("tool")
    ct = ct.withColumn("_rn", F.row_number().over(w)).filter(
        F.col("_rn") <= max_tools_per_conv
    )
    a, b = ct.alias("a"), ct.alias("b")
    pairs = (
        a.join(b, "conv_id")
        .filter(F.col("a.tool") < F.col("b.tool"))
        .select(
            node_id(F.col("a.tool"), "actor").alias(SRC),
            node_id(F.col("b.tool"), "actor").alias(DST),
        )
    )
    return pairs.groupBy(SRC, DST).agg(
        F.count(F.lit(1)).cast("double").alias("weight")
    )


def conv_tool_edges(transcripts: DataFrame) -> DataFrame:
    """Directed weighted edges conv-node → tool-node (the conv_id/tool
    bipartite graph from the north rule). Unlike the aggregated actor
    graphs, this edge table SCALES with the number of conversations
    (|E| ≈ convs × distinct tools per conv) and its tool side is
    Zipf-skewed — the hub-vertex case the skew handling exists for."""
    ct = (
        transcripts.filter(F.col("tool").isNotNull())
        .groupBy("conv_id", "tool")
        .agg(F.count(F.lit(1)).cast("double").alias("weight"))
    )
    return ct.select(
        node_id(F.col("conv_id"), "conv").alias(SRC),
        node_id(F.col("tool"), "actor").alias(DST),
        "weight",
    )


def transcript_graph(
    transcripts: DataFrame,
    kind: str = "turn_adjacency",
) -> tuple[Graph, DataFrame]:
    """Build ``(Graph, node_labels)`` from a transcript table.

    ``kind``: ``turn_adjacency`` (directed), ``tool_cooccurrence``
    (undirected), or ``conv_tool_bipartite`` (directed, scales with input)."""
    labels = node_labels(transcripts)
    if kind == "turn_adjacency":
        edges = turn_adjacency_edges(transcripts)
        g = Graph(edges=edges, is_directed=True)
    elif kind == "tool_cooccurrence":
        edges = tool_cooccurrence_edges(transcripts)
        g = Graph(edges=edges, is_directed=False)
    elif kind == "conv_tool_bipartite":
        edges = conv_tool_edges(transcripts)
        conv_labels = transcripts.select(
            F.col("conv_id").alias("label")
        ).distinct().select(
            node_id(F.col("label"), "conv").alias("id"),
            "label",
            F.lit(NODE_KIND_CONV).alias("kind"),
        )
        labels = labels.unionAll(conv_labels)
        g = Graph(edges=edges, is_directed=True)
    else:
        raise ValueError(f"unknown edge kind: {kind}")
    return g, labels
