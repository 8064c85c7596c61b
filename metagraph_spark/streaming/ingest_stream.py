"""Incremental transcript ingest via Structured Streaming.

Pattern: ``readStream`` over the transcripts table directory →
per-micro-batch edge-delta computation (the same deterministic builders as
batch ingest) → ``foreachBatch`` merge into the canonical edge table.
Turn-adjacency needs the per-conversation predecessor turn, which crosses
micro-batch boundaries — handled with a watermark + self-contained lag
within (conv_id) groups per batch plus a small carried state table of each
conversation's last seen turn, versioned per epoch for replay safety.

Windowed per-tool activity counts are a plain watermarked streaming agg.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from metagraph_spark.ingest import actor_label, node_id

TRANSCRIPT_SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, "
    "tool string, ts timestamp"
)


def read_transcript_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int = 16
) -> DataFrame:
    return (
        spark.readStream.schema(TRANSCRIPT_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def tool_activity_counts(
    stream: DataFrame, window: str = "5 minutes", watermark: str = "10 minutes"
) -> DataFrame:
    """Watermarked windowed counts per tool — late turns folded in until the
    watermark passes."""
    return (
        stream.filter(F.col("tool").isNotNull())
        .withWatermark("ts", watermark)
        .groupBy(F.window("ts", window), "tool")
        .agg(F.count(F.lit(1)).alias("n_turns"))
    )


def _list_state_epochs(spark: SparkSession, state_table_path: str) -> list[int]:
    """Epoch ids of existing state snapshots under ``state_table_path``,
    via the Hadoop FS API (portable to HDFS/S3A, not just local paths)."""
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(state_table_path)
    fs = p.getFileSystem(conf)
    if not fs.exists(p):
        return []
    out = []
    for st in fs.listStatus(p):
        name = st.getPath().getName()
        if name.startswith("epoch="):
            try:
                out.append(int(name.split("=", 1)[1]))
            except ValueError:
                pass
    return sorted(out)


def _delete_state_epoch(
    spark: SparkSession, state_table_path: str, epoch: int
) -> None:
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(f"{state_table_path}/epoch={epoch}")
    p.getFileSystem(conf).delete(p, True)


def process_edge_batch(
    batch: DataFrame,
    epoch_id: int,
    edge_table_path: str,
    state_table_path: str,
) -> None:
    """One micro-batch of edge maintenance (module-level so the epoch-replay
    idempotency contract is directly testable). See
    :func:`start_edge_maintenance` for the per-step description.

    The carried last-turn state is VERSIONED PER EPOCH: epoch ``e`` reads
    the newest snapshot with epoch < e and writes its own full snapshot to
    ``state_table_path/epoch=e``. A replay of epoch ``e`` after a failure —
    even one that landed after the state write but before the streaming
    commit — therefore reads exactly the state the original attempt read
    and rewrites identical deltas. A single mutable state table had a
    replay hole here: the replay would see the already-advanced state, lose
    the cross-batch adjacency, and overwrite the epoch partition with a
    smaller delta set (permanent undercount)."""
    from pyspark.sql import Window

    spark = batch.sparkSession
    prior = [e for e in _list_state_epochs(spark, state_table_path) if e < epoch_id]
    if prior:
        carried = spark.read.parquet(f"{state_table_path}/epoch={prior[-1]}")
    else:  # first batch: no state yet
        carried = spark.createDataFrame([], TRANSCRIPT_SCHEMA)
    relevant_convs = batch.select("conv_id").distinct()
    carried_ctx = carried.join(relevant_convs, "conv_id", "left_semi")
    full = batch.unionByName(carried_ctx)
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    t = actor_label(full)
    pairs = (
        t.withColumn("_prev", F.lag("_actor").over(w))
        .withColumn("_prev_idx", F.lag("turn_idx").over(w))
        .filter(
            F.col("_prev").isNotNull()
            # only adjacencies with one endpoint in THIS batch (carried
            # rows only provide context, their old adjacencies already
            # counted)
            & (F.col("turn_idx") > F.coalesce(F.col("_prev_idx"), F.lit(-1)))
        )
        .join(batch.select("conv_id", "turn_idx").distinct(),
              ["conv_id", "turn_idx"], "left_semi")
        .select(
            node_id(F.col("_prev"), "actor").alias("src"),
            node_id(F.col("_actor"), "actor").alias("dst"),
        )
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).cast("double").alias("weight_delta"))
    )
    # Idempotent per epoch: Structured Streaming replays the last epoch
    # after a failure/restart, so a plain append would double-count
    # deltas. Writing each epoch into its own partition directory with
    # overwrite makes the replay a no-op-equivalent rewrite; readers
    # discover `epoch` as a partition column.
    pairs.write.mode("overwrite").parquet(
        os.path.join(edge_table_path, f"epoch={epoch_id}")
    )
    # new carried state snapshot for THIS epoch: max turn per conversation
    # over (batch ∪ untouched conversations from the prior snapshot)
    w_last = Window.partitionBy("conv_id").orderBy(F.desc("turn_idx"))
    new_state = (
        full.withColumn("_rn", F.row_number().over(w_last))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    new_state = new_state.unionByName(
        carried.join(relevant_convs, "conv_id", "left_anti")
    )
    new_state.write.mode("overwrite").parquet(
        f"{state_table_path}/epoch={epoch_id}"
    )
    # bound storage: Structured Streaming only ever replays the LAST
    # uncommitted epoch, so snapshots older than epoch_id-1 are dead
    for e in prior[:-1]:
        _delete_state_epoch(spark, state_table_path, e)


def start_edge_maintenance(
    stream: DataFrame,
    edge_table_path: str,
    state_table_path: str,
    checkpoint_dir: str,
    trigger_seconds: int = 10,
):
    """Maintain the turn-adjacency edge table incrementally.

    Every micro-batch:
    1. union the batch with each conversation's carried last-turn row,
    2. window-lag within conv_id to form (prev_actor → actor) pairs,
    3. write the pair deltas into this epoch's partition directory
       (overwrite — so a Structured Streaming epoch REPLAY after
       failure/restart rewrites the same data instead of double-counting;
       aggregate at read time: weight = sum of deltas),
    4. write the epoch's full last-turn-per-conversation snapshot to
       ``state_table_path/epoch=<id>`` (epoch-versioned so a replay reads
       the predecessor epoch's state, never its own output).
    """

    def process_batch(batch: DataFrame, epoch_id: int) -> None:
        process_edge_batch(batch, epoch_id, edge_table_path, state_table_path)

    return (
        stream.writeStream.outputMode("append")
        .foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(processingTime=f"{trigger_seconds} seconds")
    )


def current_edges(spark: SparkSession, edge_table_path: str) -> DataFrame:
    """Aggregate the append-only deltas into the canonical edge view.

    Downstream analytics over the maintained table are incremental too:
    after each appended epoch, converged connected components warm-start
    from the previous epoch's labels via
    ``operators.components.incremental_connected_components`` —
    label corrections only propagate from where components fused, so an
    appended micro-batch settles in 1-2 |E|-row rounds instead of a cold
    O(log V) run (appends only; deletions require a cold recompute).
    PageRank maintenance is the same shape:
    ``operators.pagerank.incremental_pagerank`` re-converges from the
    previous epoch's rank vector in a handful of supersteps (power
    iteration contracts from any unit-mass seed, so the fixpoint equals
    the cold run's). Triangle counts update exactly with work sized by
    the batch via ``operators.triangles.incremental_triangle_count``
    (inclusion-exclusion over triangles touching new edges). LPA is the
    one north-rule algorithm WITHOUT an incremental path: its sync
    fixpoint depends on the init, so a warm start converges to a
    different stable labeling than a cold run — callers wanting
    epoch-over-epoch label continuity should prefer CC/Louvain."""
    return (
        spark.read.parquet(edge_table_path)
        .groupBy("src", "dst")
        .agg(F.sum("weight_delta").alias("weight"))
    )
