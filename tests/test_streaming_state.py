"""Structured Streaming incremental ingest + checkpoint/resume tests.

Resume test = SURVEY.md §5 plan item (d): run killed after superstep k must
resume from checkpoint and produce identical results.
"""

import os

import pytest
from pyspark.sql import functions as F

from metagraph_spark.graph import build
from metagraph_spark.ingest import synthesize_transcripts, turn_adjacency_edges
from metagraph_spark.operators.components import connected_components
from metagraph_spark.operators.pagerank import pagerank
from metagraph_spark.state import CheckpointManager
from metagraph_spark.streaming.ingest_stream import (
    current_edges,
    read_transcript_stream,
    start_edge_maintenance,
    tool_activity_counts,
)
from tests.conftest import df_from_edges

GOLDEN_EDGES = [(0, 1), (0, 2), (2, 0), (1, 2), (3, 2)]


@pytest.mark.slow
def test_pagerank_checkpoint_resume(spark, tmp_path):
    g = build(df_from_edges(spark, GOLDEN_EDGES, weighted=False), is_directed=True)
    full = pagerank(g, maxiter=50, tolerance=1e-7)
    expected = {r["id"]: r["rank"] for r in full.collect()}

    # run k supersteps with a checkpointer ("crash" after 3 iterations)
    ck = CheckpointManager(root=str(tmp_path / "ck"), run_id="run1")
    pagerank(g, fixed_iterations=3, checkpointer=ck)
    assert ck.latest() == 2
    # resume: continue to convergence from iteration 3
    resumed = pagerank(g, maxiter=50, tolerance=1e-7, checkpointer=ck)
    got = {r["id"]: r["rank"] for r in resumed.collect()}
    for k in expected:
        assert abs(got[k] - expected[k]) < 1e-9, (k, got[k], expected[k])
    # metrics were persisted per superstep
    assert len(ck.metrics()) >= 4


def test_cc_checkpoint_resume(spark, tmp_path):
    edges = [(0, 1), (1, 2), (3, 4), (5, 6), (6, 3)]
    g = build(df_from_edges(spark, edges, weighted=False), is_directed=False)
    expected = {r["id"]: r["label"] for r in connected_components(g).collect()}
    ck = CheckpointManager(root=str(tmp_path / "ck"), run_id="cc1")
    connected_components(g, fixed_rounds=1, checkpointer=ck)
    resumed = connected_components(g, checkpointer=ck)
    got = {r["id"]: r["label"] for r in resumed.collect()}
    assert got == expected


@pytest.mark.slow
def test_streaming_edge_maintenance(spark, tmp_path):
    # write transcripts as two file batches; stream them; final edge table
    # must equal the batch turn-adjacency result
    t = synthesize_transcripts(spark, 30)
    in_dir = str(tmp_path / "in")
    os.makedirs(in_dir)
    t.filter(F.col("conv_id") < "conv_00000015").coalesce(1).write.mode(
        "overwrite"
    ).parquet(in_dir + "/batch1")
    # streaming source reads a directory of files; put both batches as files
    import shutil

    stage = str(tmp_path / "stage")
    t.coalesce(2).write.mode("overwrite").parquet(stage)
    src_dir = str(tmp_path / "src")
    os.makedirs(src_dir)
    files = [f for f in os.listdir(stage) if f.endswith(".parquet")]
    for f in files:
        shutil.copy(os.path.join(stage, f), os.path.join(src_dir, f))

    stream = read_transcript_stream(spark, src_dir, max_files_per_trigger=1)
    q = start_edge_maintenance(
        stream,
        edge_table_path=str(tmp_path / "edges"),
        state_table_path=str(tmp_path / "state"),
        checkpoint_dir=str(tmp_path / "ckpt"),
    ).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        (r["src"], r["dst"]): r["weight"]
        for r in current_edges(spark, str(tmp_path / "edges")).collect()
    }
    expected = {
        (r["src"], r["dst"]): r["weight"]
        for r in turn_adjacency_edges(t).collect()
    }
    assert got == expected


def test_streaming_epoch_replay_idempotent(spark, tmp_path):
    """Structured Streaming replays the last epoch after a failure/restart;
    the epoch-partitioned overwrite write must make the replay a no-op for
    the aggregated edge view (regression test for the append-double-count
    bug)."""
    from metagraph_spark.streaming.ingest_stream import process_edge_batch

    t = synthesize_transcripts(spark, 20).cache()
    edges_dir = str(tmp_path / "edges")
    state_dir = str(tmp_path / "state")
    process_edge_batch(t, 0, edges_dir, state_dir)
    once = {
        (r["src"], r["dst"]): r["weight"]
        for r in current_edges(spark, edges_dir).collect()
    }
    # replay the SAME epoch (same input, same epoch_id) — must not change
    # the aggregated view
    process_edge_batch(t, 0, edges_dir, state_dir)
    twice = {
        (r["src"], r["dst"]): r["weight"]
        for r in current_edges(spark, edges_dir).collect()
    }
    assert once == twice


def test_streaming_replay_after_state_advance(spark, tmp_path):
    """Replay of an epoch AFTER its state snapshot was already written
    (failure between the state write and the streaming commit) must still
    produce the same deltas — the cross-batch adjacency (previous epoch's
    last turn → this batch's first turn) must survive the replay.

    With a single mutable state table this undercounted: the replay read
    the already-advanced state, so the carried row was the batch's own
    last turn and the epoch partition was overwritten with a smaller
    delta set. Epoch-versioned state closes the hole."""
    from metagraph_spark.streaming.ingest_stream import process_edge_batch

    t = synthesize_transcripts(spark, 20).cache()
    first = t.filter(F.col("turn_idx") < 3)
    second = t.filter(F.col("turn_idx") >= 3)
    assert second.count() > 0  # the split really crosses batches
    edges_dir = str(tmp_path / "edges")
    state_dir = str(tmp_path / "state")
    process_edge_batch(first, 0, edges_dir, state_dir)
    process_edge_batch(second, 1, edges_dir, state_dir)
    once = {
        (r["src"], r["dst"]): r["weight"]
        for r in current_edges(spark, edges_dir).collect()
    }
    expected = {
        (r["src"], r["dst"]): r["weight"]
        for r in turn_adjacency_edges(t).collect()
    }
    assert once == expected
    # epoch 1 state snapshot exists already — replay epoch 1 anyway
    process_edge_batch(second, 1, edges_dir, state_dir)
    twice = {
        (r["src"], r["dst"]): r["weight"]
        for r in current_edges(spark, edges_dir).collect()
    }
    assert twice == expected


def test_streaming_tool_activity(spark, tmp_path):
    t = synthesize_transcripts(spark, 50)
    src_dir = str(tmp_path / "src2")
    t.coalesce(1).write.mode("overwrite").parquet(src_dir)
    stream = read_transcript_stream(spark, src_dir)
    agg = tool_activity_counts(stream, window="1 hour", watermark="1 hour")
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("tool_counts")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = spark.sql(
        "SELECT sum(n_turns) FROM tool_counts"
    ).collect()[0][0]
    expected = t.filter(F.col("tool").isNotNull()).count()
    assert got == expected
