"""Standalone dissection bench (round 6) — NOT the driver contract.

``bench.py`` is frozen for measurement; this file exists so single queries
can be measured in isolation (guide §1.4: fresh session, labelled jobs,
noop-style sinks) and their ``.explain("formatted")`` captured for
``plans/r06/``. Usage::

    python bench_extra.py big_lpa_join [--plan plans/r06/big_lpa_3r.txt]
    python bench_extra.py katz_join --trials 2

Environment contract matches bench.py: ``$SPARK_GRAFT_SF_DIR``,
``$SPARK_GRAFT_CPUS``, ``$SPARK_GRAFT_BENCH_BIG_EDGES``.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
BIG_EDGES = int(os.environ.get("SPARK_GRAFT_BENCH_BIG_EDGES", "100000000"))
N_CONVS = int(os.environ.get("SPARK_GRAFT_BENCH_CONVS", "200000"))


def _spark(name, shuffle_partitions=None):
    from metagraph_spark.session import get_spark

    return get_spark(
        name, master=f"local[{CPUS}]",
        shuffle_partitions=shuffle_partitions or CPUS,
    )


def _big_graph(spark):
    """Same protocol as bench.py's large-graph section."""
    from metagraph_spark.graph import build
    from metagraph_spark.ingest import zipf_graph

    big_nodes = max(BIG_EDGES // 50, 1000)
    spark.conf.set("spark.sql.shuffle.partitions", str(CPUS * 2))
    g = build(zipf_graph(spark, big_nodes, BIG_EDGES), is_directed=True)
    g = g.partition_by_src(CPUS * 2)
    t0 = time.time()
    g.edges.count()
    print(f"# big layout: {time.time() - t0:.1f}s", file=sys.stderr)
    return g


def _copurchase(spark):
    from metagraph_spark.graph import build
    from metagraph_spark.sources.io import read_table

    lp = read_table(spark, SF_DIR, "lineitem").select(
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
    g = build(edges, is_directed=False).partition_by_src()
    g.edges.count()
    return g


def _transcript(spark):
    from metagraph_spark.ingest import synthesize_transcripts, transcript_graph

    t = synthesize_transcripts(spark, N_CONVS)
    g, _ = transcript_graph(t, "conv_tool_bipartite")
    n_edges = g.num_edges()
    n_part = max(8, min(CPUS * 2, n_edges // 50_000 or 8))
    spark.conf.set("spark.sql.shuffle.partitions", str(n_part))
    g = g.partition_by_src(n_part)
    g.edges.count()
    return g


def _timed(label, fn, trials):
    walls = []
    for i in range(trials):
        t0 = time.time()
        out = fn()
        walls.append(round(time.time() - t0, 3))
        print(f"# {label} trial {i}: {walls[-1]}s", file=sys.stderr)
    return walls, out


def _save_plan(df, path):
    if path:
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "w") as f:
            f.write(df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"))
        print(f"# plan -> {path}", file=sys.stderr)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("target")
    ap.add_argument("--trials", type=int, default=1)
    ap.add_argument("--plan", default=None)
    args = ap.parse_args()
    t = args.target

    def _sink_capture(fn, path, index=-1):
        """Run ``fn`` with state.PLAN_SINK enabled; write captured
        superstep plan(s) to ``path``."""
        from metagraph_spark import state as mstate

        mstate.PLAN_SINK = []
        try:
            fn()
            os.makedirs(os.path.dirname(path), exist_ok=True)
            plans = mstate.PLAN_SINK
            with open(path, "w") as f:
                if index is None:
                    for i, p in enumerate(plans):
                        f.write(f"==== captured plan {i} ====\n{p}\n")
                else:
                    f.write(plans[index])
            print(f"# plan -> {path} ({len(plans)} captured)", file=sys.stderr)
        finally:
            mstate.PLAN_SINK = None

    if t == "big_lpa_join":
        from metagraph_spark.operators.lpa import label_propagation_community

        spark = _spark("bx-big-lpa")
        g = _big_graph(spark)
        spark.sparkContext.setJobDescription("big_lpa_3r join")
        walls, _ = _timed(t, lambda: label_propagation_community(
            g, fixed_rounds=3, strategy="join").count(), args.trials)
        if args.plan:
            _sink_capture(
                lambda: label_propagation_community(
                    g, fixed_rounds=1, strategy="join").count(),
                args.plan,
            )
    elif t == "big_cc":
        from metagraph_spark.operators.components import connected_components

        spark = _spark("bx-big-cc")
        g = _big_graph(spark)
        spark.sparkContext.setJobDescription("big_cc two-phase")
        walls, _ = _timed(t, lambda: connected_components(g).count(),
                          args.trials)
    elif t == "big_pr":
        from metagraph_spark.operators.pagerank import pagerank

        spark = _spark("bx-big-pr")
        g = _big_graph(spark)
        pagerank(g, fixed_iterations=1, strategy="join")  # warm
        spark.sparkContext.setJobDescription("big_pagerank_join_3iter")
        walls, _ = _timed(t, lambda: pagerank(
            g, fixed_iterations=3, strategy="join").count(), args.trials)
    elif t == "big_lpa_kernel":
        from metagraph_spark.operators.kernel_algos import (
            label_blocks, lpa_kernel, cc_kernel,
        )

        spark = _spark("bx-big-lpak")
        g = _big_graph(spark)
        t0 = time.time()
        eb = label_blocks(
            g, spill_dir=tempfile.mkdtemp(prefix="bx_lblb_"))
        print(f"# shared layout: {time.time() - t0:.1f}s", file=sys.stderr)
        spark.sparkContext.setJobDescription("big_cc_kernel")
        cwalls, _ = _timed("big_cc_kernel",
                           lambda: cc_kernel(eb).count(), args.trials)
        spark.sparkContext.setJobDescription("big_lpa_3r_kernel")
        walls, _ = _timed(t, lambda: lpa_kernel(
            eb, fixed_rounds=3).count(), args.trials)
        print(json.dumps({"big_cc_kernel": cwalls}))
    elif t == "katz_join":
        from metagraph_spark.operators.centrality import katz_centrality

        spark = _spark("bx-katz")
        g = _copurchase(spark)
        spark.sparkContext.setJobDescription("copurchase_katz_100iter")
        walls, _ = _timed(t, lambda: katz_centrality(
            g, attenuation_factor=1e-4, fixed_iterations=100,
            strategy="join").count(), args.trials)
        if args.plan:
            _sink_capture(
                lambda: katz_centrality(
                    g, attenuation_factor=1e-4, fixed_iterations=2,
                    strategy="join").count(),
                args.plan,
            )
    elif t == "katz_kernel":
        from metagraph_spark.operators.kernel import build_edge_blocks
        from metagraph_spark.operators.kernel_algos import katz_kernel

        spark = _spark("bx-katzk")
        g = _copurchase(spark)
        eb = build_edge_blocks(
            g, spill_dir=tempfile.mkdtemp(prefix="bx_katzb_"),
            with_weights=True)
        katz_kernel(eb, fixed_iterations=1)
        spark.sparkContext.setJobDescription("copurchase_katz_100iter_kernel")
        walls, _ = _timed(t, lambda: katz_kernel(
            eb, attenuation_factor=1e-4, fixed_iterations=100).count(),
            args.trials)
    elif t == "copurchase_small":
        from metagraph_spark.operators.components import connected_components
        from metagraph_spark.operators.lpa import label_propagation_community
        from metagraph_spark.operators.triangles import triangle_count
        from metagraph_spark.operators.pagerank import pagerank

        spark = _spark("bx-cosmall")
        g = _copurchase(spark)
        out = {}
        for name, fn in [
            ("copurchase_pagerank_1e6", lambda: pagerank(
                g, maxiter=100, tolerance=1e-6, strategy="join").count()),
            ("copurchase_cc", lambda: connected_components(g).count()),
            ("copurchase_lpa_10r", lambda: label_propagation_community(
                g, fixed_rounds=10).count()),
            ("copurchase_triangles", lambda: triangle_count(g)),
        ]:
            spark.sparkContext.setJobDescription(name)
            out[name], _ = _timed(name, fn, args.trials)
        print(json.dumps(out))
        walls = []
    elif t == "transcript":
        from metagraph_spark.operators.components import connected_components
        from metagraph_spark.operators.pagerank import pagerank
        from metagraph_spark.operators.embedding import hope_katz_train

        spark = _spark("bx-transcript")
        g = _transcript(spark)
        out = {}
        for name, fn, tr in [
            ("transcript_pagerank_1e6", lambda: pagerank(
                g, maxiter=100, tolerance=1e-6, strategy="join").count(),
                args.trials),
            ("transcript_cc", lambda: connected_components(g).count(),
                args.trials),
            ("transcript_hope_katz_d16", lambda: hope_katz_train(
                g, embedding_size=16, k_terms=8, power_iters=1).count(), 1),
        ]:
            spark.sparkContext.setJobDescription(name)
            out[name], _ = _timed(name, fn, tr)
        print(json.dumps(out))
        walls = []
    elif t == "pipeline":
        from metagraph_spark.functions import dedup as mdedup
        from metagraph_spark.functions import similarity as msim
        from metagraph_spark.sources.io import read_table

        spark = _spark("bx-pipe")
        docs = read_table(spark, SF_DIR, "documents")
        emb = read_table(spark, SF_DIR, "embeddings")
        out = {}
        for name, fn in [
            ("dedup_minhash_lsh", lambda: mdedup.minhash_lsh_pairs(
                docs, 64, 16, threshold=0.7).count()),
            ("dedup_simhash", lambda: mdedup.simhash_pairs(
                docs, max_hamming=3).count()),
            ("ann_bruteforce_topk", lambda: msim.cosine_topk_bruteforce(
                emb, emb.filter(F.col("vec_id") < 50), k=10).count()),
        ]:
            spark.sparkContext.setJobDescription(name)
            out[name], _ = _timed(name, fn, args.trials)
        print(json.dumps(out))
        walls = []
    else:
        raise SystemExit(f"unknown target {t}")

    if walls:
        print(json.dumps({t: walls}))
    spark.stop()


if __name__ == "__main__":
    main()
