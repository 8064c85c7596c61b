"""Benchmark harness (driver contract).

Runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON
line: ``{"metric": ..., "value": N, "unit": "sec", "queries": {...},
"sf": ...}``.

Headline metric (BASELINE.json north rule): edges/sec per superstep to
PageRank convergence (1e-6) on the transcript-derived edge graph — reported
in the JSON as ``edges_per_sec_per_superstep`` alongside per-query wall
times. The scaling-efficiency evidence (same job at local[8] vs local[32])
is produced by ``tools/scaling_bench.py`` → ``BENCH/BASELINE.md``.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from metagraph_spark.functions import dedup as mdedup  # noqa: E402
from metagraph_spark.functions import similarity as msim  # noqa: E402
from metagraph_spark.graph import build  # noqa: E402
from metagraph_spark.ingest import synthesize_transcripts, transcript_graph  # noqa: E402
from metagraph_spark.operators.components import connected_components  # noqa: E402
from metagraph_spark.operators.lpa import label_propagation_community  # noqa: E402
from metagraph_spark.operators.pagerank import pagerank  # noqa: E402
from metagraph_spark.operators.triangles import triangle_count  # noqa: E402
from metagraph_spark.session import get_spark  # noqa: E402
from metagraph_spark.sources.io import read_table  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
# transcript graph scale ~ sf: sf0.1 -> 200k convs (~800k turns)
N_CONVS = int(os.environ.get("SPARK_GRAFT_BENCH_CONVS", "200000"))
# best-of-N per query, per-trial walls recorded in extras.trials — the
# shared host varies up to 3x between identical runs, so a single trial
# cannot distinguish a regression from hypervisor steal
TRIALS = int(os.environ.get("SPARK_GRAFT_BENCH_TRIALS", "3"))
# large-graph section: plans only show their shape once scheduler overhead
# stops dominating; 100M edges is the smallest scale where the join
# superstep is compute/shuffle bound. 0 disables.
BIG_EDGES = int(os.environ.get("SPARK_GRAFT_BENCH_BIG_EDGES", "100000000"))


def copurchase_graph(spark, sf_dir):
    lp = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    ).distinct()
    a, b = lp.alias("a"), lp.alias("b")
    edges = (
        a.join(b, "l_orderkey")
        .filter(F.col("a.l_partkey") < F.col("b.l_partkey"))
        .groupBy(
            F.col("a.l_partkey").alias("src"), F.col("b.l_partkey").alias("dst")
        )
        .agg(F.count(F.lit(1)).cast("double").alias("weight"))
    )
    return build(edges, is_directed=False)


def main() -> None:
    spark = get_spark("bench", master=f"local[{CPUS}]", shuffle_partitions=CPUS)
    timings: dict[str, float] = {}
    extras: dict = {}
    trial_log: dict[str, list[float]] = {}
    extras["trials"] = trial_log

    def timed(name, fn, trials=TRIALS):
        out = None
        walls = []
        for _ in range(trials):
            t0 = time.time()
            out = fn()
            walls.append(round(time.time() - t0, 3))
        timings[name] = min(walls)
        trial_log[name] = walls
        return out

    # ---- transcript-derived graph: the north-rule headline -----------------
    # conv↔tool bipartite graph: |E| scales with conversations, tool side is
    # Zipf-skewed (hub vertices) — the representative 10^12-turn workload
    t = synthesize_transcripts(spark, N_CONVS)
    g_t, _labels = transcript_graph(t, "conv_tool_bipartite")
    n_edges_t = g_t.num_edges()
    # size-aware partitioning: ~50k edges per partition, min 8, capped at
    # 2x cores — at 10^12 edges this caps at cluster width, at toy scale it
    # stops per-superstep task-scheduling overhead from dominating
    n_part = max(8, min(CPUS * 2, n_edges_t // 50_000 or 8))
    spark.conf.set("spark.sql.shuffle.partitions", str(n_part))
    g_t = g_t.partition_by_src(n_part)
    metrics: list[dict] = []

    def _run_pr():
        metrics.clear()
        pagerank(g_t, maxiter=100, tolerance=1e-6, metrics_sink=metrics,
                 strategy="join").count()

    timed("transcript_pagerank_1e6", _run_pr)
    supersteps = len(metrics)
    extras["transcript_edges"] = n_edges_t
    extras["pagerank_supersteps"] = supersteps
    eps = n_edges_t * supersteps / timings["transcript_pagerank_1e6"]
    extras["edges_per_sec_per_superstep"] = round(eps, 1)

    # CSR/Arrow kernel strategy on the same graph (file-backed blocks)
    import tempfile

    from metagraph_spark.operators.kernel import build_edge_blocks, pagerank_kernel

    eb = build_edge_blocks(g_t, spill_dir=tempfile.mkdtemp(prefix="mgspark_blocks_"))
    pagerank_kernel(eb, fixed_iterations=1)  # warm worker block caches
    kmetrics: list = []

    def _run_kernel():
        kmetrics.clear()
        pagerank_kernel(eb, maxiter=100, tolerance=1e-6, metrics_sink=kmetrics)

    timed("transcript_pagerank_kernel_1e6", _run_kernel)
    extras["kernel_supersteps"] = len(kmetrics)
    extras["kernel_edges_per_sec_per_superstep"] = round(
        n_edges_t * len(kmetrics) / timings["transcript_pagerank_kernel_1e6"], 1
    )
    eb.unpersist()

    timed("transcript_cc", lambda: connected_components(g_t).count())

    # HOPE-katz embedding train (round 5): distributed randomized SVD —
    # (2q+2)*k_terms mat-vec supersteps at r=d/2+oversample columns each,
    # plus r(r+1)/2-column Gram aggregates; single trial (32 supersteps
    # dominate, same rationale as the katz entries)
    from metagraph_spark.operators.embedding import hope_katz_train

    timed("transcript_hope_katz_d16",
          lambda: hope_katz_train(
              g_t, embedding_size=16, k_terms=8, power_iters=1).count(),
          trials=1)
    g_t.unpersist()
    extras["transcript_partitions"] = n_part
    spark.conf.set("spark.sql.shuffle.partitions", str(CPUS))

    # ---- co-purchase graph ------------------------------------------------
    # single trial: each build persists a fresh edge layout and only the
    # last binding could be unpersisted — 3 trials would strand two
    # materialized copies in executor storage for the rest of the bench
    g_c = timed("copurchase_build",
                lambda: copurchase_graph(spark, SF_DIR).partition_by_src(),
                trials=1)
    extras["copurchase_edges"] = g_c.num_edges()
    timed("copurchase_pagerank_1e6",
          lambda: pagerank(g_c, maxiter=100, tolerance=1e-6,
                           strategy="join").count())
    timed("copurchase_cc", lambda: connected_components(g_c).count())
    timed("copurchase_lpa_10r",
          lambda: label_propagation_community(g_c, fixed_rounds=10).count())
    timed("copurchase_triangles", lambda: triangle_count(g_c))
    # 100 fixed supersteps, one Spark job each (observe-based stats) — the
    # round-2 rework target: prior shape ran 2-4 driver actions per superstep
    from metagraph_spark.operators.centrality import katz_centrality

    timed("copurchase_katz_100iter",
          lambda: katz_centrality(
              g_c, attenuation_factor=1e-4, fixed_iterations=100,
              strategy="join").count(),
          trials=1)  # 100 fixed supersteps: dominated by per-job cost, and
    # 3 trials would triple the longest query for no extra signal
    # CSR/Arrow kernel strategy for the same 100 supersteps (weighted
    # file-backed blocks + slice-store loop — zero shuffles, vector never
    # on the driver); layout is built once and excluded like the
    # transcript kernel entry
    from metagraph_spark.operators.kernel_algos import katz_kernel

    ebw = build_edge_blocks(
        g_c, spill_dir=tempfile.mkdtemp(prefix="mgspark_katzb_"),
        with_weights=True,
    )
    katz_kernel(ebw, fixed_iterations=1)  # warm worker block caches
    timed("copurchase_katz_100iter_kernel",
          lambda: katz_kernel(
              ebw, attenuation_factor=1e-4, fixed_iterations=100).count(),
          trials=1)
    ebw.unpersist()
    g_c.unpersist()

    # ---- large-graph section (plans at scale, single trial) ---------------
    # 100M-edge Zipf graph (hub skew + dangling tail): at this size the join
    # superstep is shuffle/compute bound, not scheduler bound, so
    # edges/s/superstep reflects the plan the 10^12-edge cluster would run
    if BIG_EDGES > 0:
        from metagraph_spark.ingest import zipf_graph

        big_nodes = max(BIG_EDGES // 50, 1000)
        # fresh session: the preceding ~30 queries leave GC/shuffle debris
        # that measured 2.3x on the 100M-edge supersteps (80s in-session vs
        # 35.5s standalone for 3 supersteps) — restart so this section
        # measures the plan, not the session history
        spark.stop()
        spark = get_spark(
            "bench-big", master=f"local[{CPUS}]", shuffle_partitions=CPUS
        )
        # shuffle partitions must equal the src layout for pagerank to
        # reuse it (same protocol as tools/scaling_bench.py JOIN_WORKER)
        spark.conf.set("spark.sql.shuffle.partitions", str(CPUS * 2))
        g_z = build(
            zipf_graph(spark, big_nodes, BIG_EDGES), is_directed=True
        ).partition_by_src(CPUS * 2)
        t0 = time.time()
        g_z.edges.count()  # materialize the persisted layout OUTSIDE the
        # superstep windows — edges/s/superstep measures the iteration
        # plan, not the one-off generate+partition (same protocol as
        # tools/scaling_bench.py)
        extras["big_layout_sec"] = round(time.time() - t0, 3)
        extras["big_edges"] = BIG_EDGES
        extras["big_nodes"] = big_nodes
        pagerank(g_z, fixed_iterations=1, strategy="join")  # warm superstep (JIT/codegen)
        zmetrics: list = []

        def _run_big_pr():
            zmetrics.clear()
            pagerank(
                g_z, fixed_iterations=3, metrics_sink=zmetrics,
                strategy="join",
            ).count()

        timed("big_pagerank_join_3iter", _run_big_pr, trials=1)
        extras["big_join_edges_per_sec_per_superstep"] = round(
            BIG_EDGES * len(zmetrics) / timings["big_pagerank_join_3iter"], 1
        )
        timed("big_cc", lambda: connected_components(g_z).count(), trials=1)
        timed("big_lpa_3r",
              lambda: label_propagation_community(
                  g_z, fixed_rounds=3, strategy="join").count(),
              trials=1)
        # CSR-kernel strategies (operators/kernel_algos.py): file-backed
        # blocks are built ONCE outside the timer (layout seconds reported
        # in extras — the same build-once-iterate-many protocol as the
        # transcript kernel entry); the walls measure the rounds
        from metagraph_spark.operators.kernel_algos import (
            cc_kernel,
            label_blocks,
            lpa_kernel,
        )

        # ONE shared layout (canonical symmetrized, degree-free) feeds
        # BOTH label kernels — LPA's self-votes are synthesized per block
        # at read time, so the ~190s second vote-layout pass is gone
        t0 = time.time()
        eb_sh = label_blocks(
            g_z, spill_dir=tempfile.mkdtemp(prefix="mgspark_lblb_")
        )
        extras["big_shared_layout_sec"] = round(time.time() - t0, 3)
        timed("big_cc_kernel", lambda: cc_kernel(eb_sh).count(), trials=1)
        timed("big_lpa_3r_kernel",
              lambda: lpa_kernel(eb_sh, fixed_rounds=3).count(), trials=1)
        eb_sh.unpersist()
        g_z.unpersist()
        spark.conf.set("spark.sql.shuffle.partitions", str(CPUS))

    # ---- pipeline ops -----------------------------------------------------
    docs = read_table(spark, SF_DIR, "documents")
    timed("dedup_minhash_lsh",
          lambda: mdedup.minhash_lsh_pairs(docs, 64, 16, threshold=0.7).count())
    timed("dedup_simhash",
          lambda: mdedup.simhash_pairs(docs, max_hamming=3).count())
    emb = read_table(spark, SF_DIR, "embeddings")
    timed("ann_bruteforce_topk",
          lambda: msim.cosine_topk_bruteforce(
              emb, emb.filter(F.col("vec_id") < 50), k=10).count())

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "total wall time of headline queries; "
                "extras.edges_per_sec_per_superstep = north-rule throughput "
                "(PageRank to 1e-6 on the transcript-derived edge graph)",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "extras": extras,
                "sf": SF_DIR,
                "cpus": CPUS,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
