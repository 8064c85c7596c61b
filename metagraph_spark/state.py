"""Per-superstep checkpoint state for iterative algorithms.

Spark has no native iteration: the driver loop must truncate lineage every
superstep or plans grow without bound (the #1 performance-correctness issue
for iterative DataFrame jobs). Two modes:

- ``localCheckpoint`` (default): fast, in-cluster, NOT durable. Used when no
  checkpoint directory is given.
- durable table checkpoints: every superstep writes
  ``{dir}/{run_id}/state/iter={k}/`` (parquet; Iceberg when its catalog jar is
  present — same layout, format is a config switch) plus a metrics row to
  ``{dir}/{run_id}/metrics/``. ``latest()`` finds the newest complete
  iteration so a killed run resumes mid-iteration with identical results.

Reference analog: metagraph has no durability story at all (in-process,
single-threaded, ``core/resolver.py:382-397``); the dask loader's
shared-memory chunk registry (``core/dask/loader.py:153-240``) is the closest
ancestor — we replace it with table-format checkpoints, which is the
idiomatic Spark answer.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass
class CheckpointManager:
    """Writes/reads per-iteration state + metrics under ``root/run_id``."""

    root: str
    run_id: str

    def _state_path(self, iteration: int) -> str:
        return os.path.join(self.root, self.run_id, "state", f"iter={iteration:05d}")

    def _marker_path(self, iteration: int) -> str:
        return os.path.join(
            self.root, self.run_id, "state", f"iter={iteration:05d}._COMPLETE"
        )

    def _metrics_path(self) -> str:
        return os.path.join(self.root, self.run_id, "metrics.jsonl")

    def save(self, iteration: int, state: DataFrame, metrics: dict) -> DataFrame:
        """Persist this superstep's vertex state; returns the reloaded
        (lineage-free) DataFrame. A _COMPLETE marker written after the
        parquet commit makes the checkpoint atomic-enough for resume: a kill
        mid-write leaves no marker and resume falls back to iter k-1."""
        path = self._state_path(iteration)
        state.write.mode("overwrite").parquet(path)
        os.makedirs(os.path.dirname(self._marker_path(iteration)), exist_ok=True)
        with open(self._marker_path(iteration), "w") as f:
            f.write(json.dumps({"iteration": iteration, "ts": time.time()}))
        with open(self._metrics_path(), "a") as f:
            f.write(json.dumps({"iteration": iteration, **metrics}) + "\n")
        return state.sparkSession.read.parquet(path)

    def latest(self) -> int | None:
        """Newest iteration with a _COMPLETE marker, or None."""
        d = os.path.join(self.root, self.run_id, "state")
        if not os.path.isdir(d):
            return None
        iters = [
            int(name[len("iter=") : -len("._COMPLETE")])
            for name in os.listdir(d)
            if name.endswith("._COMPLETE")
        ]
        return max(iters) if iters else None

    def load(self, spark: SparkSession, iteration: int) -> DataFrame:
        return spark.read.parquet(self._state_path(iteration))

    def metrics(self) -> list[dict]:
        p = self._metrics_path()
        if not os.path.exists(p):
            return []
        with open(p) as f:
            return [json.loads(line) for line in f if line.strip()]


# Debug hook (bench_extra.py plan capture): when set to a list, every
# superstep materialization appends its pre-execution formatted plan here.
# None in production — zero cost.
PLAN_SINK: list | None = None


def _capture_plan(df: DataFrame) -> None:
    if PLAN_SINK is not None:
        try:
            PLAN_SINK.append(
                df.sparkSession._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"
                )
            )
        except Exception:
            pass


def truncate_lineage(df: DataFrame) -> DataFrame:
    """Break lineage without durability (localCheckpoint, eager), and RESET
    plan statistics.

    ``Dataset.localCheckpoint`` rewrites the ORIGINAL plan's statistics
    onto the new ``LogicalRDD``. An iterative loop whose next plan
    references the state twice (hash-min gather + merge, or a pointer-jump
    self-join) then roughly SQUARES the ``sizeInBytes`` estimate every
    round — the stat is an unbounded BigInteger whose digit count doubles
    per round, and after a few dozen rounds Catalyst's size-only stats
    visitor spends minutes multiplying million-digit integers on the
    driver (observed: Boruvka's inner CC hung exactly there once pointer
    jumping doubled the growth rate). Rebuilding the DataFrame from the
    checkpointed internal RDD yields a ``LogicalRDD`` with bounded default
    stats instead. Join strategy is unaffected in practice: AQE (enabled
    session-wide, ``session.py``) re-plans joins from RUNTIME sizes, which
    the carried-forward estimates misstated anyway."""
    _capture_plan(df)
    ck = df.localCheckpoint(eager=True)
    try:
        jdf = ck._jdf
        spark = df.sparkSession
        new_jdf = spark._jsparkSession.internalCreateDataFrame(
            jdf.queryExecution().toRdd(), jdf.schema(), False
        )
        return DataFrame(new_jdf, spark)
    except Exception:  # Connect or internal-API drift: checkpoint is valid
        return ck


def truncate_lineage_partitioned(
    df: DataFrame, cols: list[str], n_part: int
) -> DataFrame:
    """:func:`truncate_lineage` that PRESERVES hash-partitioning metadata.

    ``localCheckpoint`` under AQE always reports ``UnknownPartitioning`` on
    its ``LogicalRDD`` (the adaptive plan hides the final stage's
    partitioning at checkpoint time), so every superstep loop that
    re-joins its vertex state against col-partitioned edges pays a
    planner-inserted |V|-row Exchange per superstep even though the
    checkpointed RDD is ALREADY physically hash-partitioned. This variant:
    (plan capture: see module-level ``PLAN_SINK``)

    1. eagerly localCheckpoints ``df``;
    2. inspects the executed adaptive plan's FINAL stage partitioning; if
       it is exactly ``HashPartitioning(cols, n_part)`` (matched by output
       position — exprIds differ across plans), STAMPS that partitioning
       onto a rebuilt ``LogicalRDD`` leaf (stats and constraints reset, as
       in :func:`truncate_lineage`);
    3. otherwise re-shuffles once (``repartition(n_part, cols)`` — a
       user-numbered exchange AQE never coalesces, so the claim is
       physically true by construction), re-checkpoints, and stamps.

    The stamped claim is only ever attached to an RDD whose layout was
    either observed (2) or forced (3) to match. Falls back to the plain
    stats-reset checkpoint on internal-API drift / Spark Connect."""
    _capture_plan(df)
    ck = df.localCheckpoint(eager=True)
    try:
        spark = df.sparkSession
        jvm = spark._jvm

        def col_positions_of(partitioning, output) -> list | None:
            if partitioning.getClass().getSimpleName() != "HashPartitioning":
                return None
            if partitioning.numPartitions() != n_part:
                return None
            exprs = partitioning.expressions()
            pos = []
            for i in range(exprs.size()):
                e = exprs.apply(i)
                if e.getClass().getSimpleName() != "AttributeReference":
                    return None
                j = next(
                    (
                        k
                        for k in range(output.size())
                        if output.apply(k).exprId().equals(e.exprId())
                    ),
                    None,
                )
                if j is None:
                    return None
                pos.append(j)
            return pos

        want = [df.columns.index(c) for c in cols]
        try:
            final = df._jdf.queryExecution().executedPlan().finalPhysicalPlan()
            matched = (
                col_positions_of(final.outputPartitioning(), final.output())
                == want
            )
        except Exception:  # non-adaptive plan: no finalPhysicalPlan
            matched = False
        if not matched:
            ck = ck.repartition(n_part, *cols).localCheckpoint(eager=True)
        plan = ck._jdf.queryExecution().analyzed()
        if plan.getClass().getName() != (
            "org.apache.spark.sql.execution.LogicalRDD"
        ):
            return truncate_lineage(ck)
        out = plan.output()
        attrs = {out.apply(i).name(): out.apply(i) for i in range(out.size())}
        hp = jvm.org.apache.spark.sql.catalyst.plans.physical.HashPartitioning(
            jvm.PythonUtils.toSeq([attrs[c] for c in cols]), n_part
        )
        none = jvm.scala.Option.empty()
        oc = plan.otherCopyArgs()
        new_plan = plan.copy(
            plan.productElement(0),
            plan.productElement(1),
            hp,
            plan.productElement(3),
            plan.productElement(4),
            plan.productElement(5),
            oc.apply(0),
            none,
            none,
        )
        jds = jvm.org.apache.spark.sql.classic.Dataset.ofRows(
            spark._jsparkSession, new_plan
        )
        return DataFrame(jds, spark)
    except Exception:  # Connect or internal-API drift: checkpoint is valid
        return truncate_lineage(ck)


class LineageManager:
    """Per-iteration state materializer for superstep loops.

    Policy: ``localCheckpoint(eager=True)`` EVERY superstep — the
    materialized state becomes a leaf (``LogicalRDD``) so the logical plan
    stays constant-size across iterations.

    Why not a persist() chain (tried and reverted in round 1/2): a
    superstep's plan references the previous state TWICE (once for the
    gather contributions, once for the state merge), and ``persist`` caches
    blocks but does NOT replace the logical plan — the InMemoryRelation
    substitution happens only at physical planning. The analyzed plan
    therefore DOUBLES per persisted iteration; after ~8 iterations merely
    stringifying it for the SQL listener OOMs the driver heap
    (``java.lang.OutOfMemoryError`` inside
    ``QueryExecution.explainString -> TreeNode.generateTreeString``,
    reproduced via ``pytest tests/test_kernel.py tests/test_pagerank.py``).
    The cost of the leaf policy is that ``LogicalRDD`` reports
    ``UnknownPartitioning``, re-introducing one |V|-row Exchange per
    superstep on the vertex-state side — minor next to the |E|-row gather
    shuffle, and AQE coalesces it.

    ``finalize``/``release`` are kept as the loop's exit protocol so a
    future safe block-reuse policy can slot in without touching operators."""

    def __init__(self, checkpoint_every: int = 1,
                 partition_cols: list[str] | None = None,
                 n_part: int | None = None):
        self.checkpoint_every = checkpoint_every
        self.partition_cols = partition_cols
        self.n_part = n_part
        self._i = 0

    def materialize(self, df: DataFrame) -> DataFrame:
        self._i += 1
        # shares truncate_lineage's stats reset: superstep plans reference
        # the previous state twice, so carried-forward estimates compound
        # across supersteps (see truncate_lineage's docstring). With
        # partition_cols set, the leaf keeps its hash-partitioning metadata
        # so the next superstep's state-side join needs no Exchange.
        if self.partition_cols:
            return truncate_lineage_partitioned(
                df, self.partition_cols, self.n_part
            )
        return truncate_lineage(df)

    def finalize(self, state: DataFrame) -> DataFrame:
        """Close out the loop on a successful exit path."""
        return state

    def release(self) -> None:
        """Free intermediate state (error paths); no-op under leaf policy."""
