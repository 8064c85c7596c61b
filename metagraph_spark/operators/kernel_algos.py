"""CSR/Arrow kernels for katz / connected components / LPA supersteps.

Same physical strategy as ``operators/kernel.py``'s PageRank kernel (the
north-star design: per-partition CSR blocks held in Arrow, vectorized
numpy gather-scatter inside ``mapInPandas``, ZERO shuffles per superstep)
applied to the other iterative operators:

- ``katz_kernel`` — ``x' = α·Aᵀx + β`` over weighted blocks
  (``build_edge_blocks(..., with_weights=True)``); per superstep each task
  bincounts its dst-range slice with ``weights = x[srcs]·ws`` and the
  driver applies the affine update. Semantics are EXACTLY
  ``operators/centrality.py:katz_centrality`` (reference contract
  ``plugins/core/algorithms/centrality.py:16-23``, nx impl
  ``plugins/networkx/algorithms.py:30-46``): L1 convergence ``Σ|x'-x| <
  N·tol``, final L2 normalization, ConvergenceError past maxiter.
- ``cc_kernel`` — hash-min label exchange on positional labels: blocks are
  dst-sorted at pack time, so each round's per-dst neighbor minimum is one
  ``np.minimum.reduceat`` (C-speed segmented min, no hash tables); the
  driver applies ``label = min(label, gathered)`` and — on the converged
  path only — pointer-jumps the dense label array to full compression
  (``lab = lab[lab]``), giving the O(log V) round bound. ``fixed_rounds``
  stays PURE hash-min (the unrolled-SQL oracle contract, exactly
  ``operators/components.py:_min_label_fixpoint``). Labels are positions
  during iteration; positions are order-isomorphic to sorted ids, so
  ``node_ids[lab]`` equals the join path's min-id labels at EVERY round,
  not just at convergence.
- ``lpa_kernel`` — deterministic synchronous LPA, exactly
  ``operators/lpa.py`` semantics (most frequent neighbor label + one
  self-vote, ties to the smallest label): per round each task lexsorts its
  block's (dst, neighbor-label) pairs, run-length-counts votes, and picks
  each dst's winner via segmented ``maximum.reduceat`` /
  ``minimum.reduceat`` — all C loops, no per-row python.

All three accept a prebuilt :class:`EdgeBlocks` (amortize the layout) or a
Graph. Integer-label kernels (cc, lpa) are EXACTLY equal to the join path
(asserted in tests/test_kernel_algos.py); katz agrees to float rounding.
Applicability: the dense driver vector caps at
``pagerank.KERNEL_MAX_VERTICES`` — the join paths remain the uncapped
scale route, selected by ``strategy="auto"`` in the operator wrappers.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from metagraph_spark.exceptions import ConvergenceError
from metagraph_spark.graph import DST, ID, SRC, Graph
from metagraph_spark.operators.kernel import (
    EdgeBlocks,
    _open_block,
    _open_block_weights,
    build_edge_blocks,
)

_IMAX = np.iinfo(np.int64).max


def _resolve_blocks(graph_or_blocks, *, edges=None, with_weights=False):
    """(EdgeBlocks, owned, spark) — builds blocks when given a Graph."""
    if isinstance(graph_or_blocks, EdgeBlocks):
        eb = graph_or_blocks
        src_df = eb.blocks if eb.blocks is not None else eb.manifest
        return eb, False, src_df.sparkSession
    eb = build_edge_blocks(
        graph_or_blocks, edges=edges, with_weights=with_weights
    )
    return eb, True, graph_or_blocks.edges.sparkSession


def _block_arrays(row, file_backed: bool, weighted: bool):
    """(srcs, dsts_local, ws|None) for one manifest/blocks row."""
    if file_backed:
        srcs, dsts = _open_block(row["path"])
        ws = _open_block_weights(row["path"]) if weighted else None
    else:
        srcs = np.asarray(row["srcs"], dtype=np.int64)
        dsts = np.asarray(row["dsts"], dtype=np.int64)
        ws = np.asarray(row["ws"], dtype=np.float64) if weighted else None
    return srcs, dsts, ws


def katz_kernel(
    graph_or_blocks,
    attenuation_factor: float = 0.01,
    immediate_neighbor_weight: float = 1.0,
    maxiter: int = 50,
    tolerance: float = 1e-05,
    fixed_iterations: int | None = None,
    metrics_sink: list | None = None,
) -> DataFrame:
    """Katz centrality via CSR blocks. Returns ``(id, katz)``.

    A Graph argument builds weighted blocks internally; a prebuilt
    EdgeBlocks must have been built ``with_weights=True`` if the graph is
    weighted (unweighted blocks run with implicit weight 1.0)."""
    if isinstance(graph_or_blocks, Graph):
        eb, owned, spark = _resolve_blocks(
            graph_or_blocks, with_weights=graph_or_blocks.is_weighted
        )
    else:
        eb, owned, spark = _resolve_blocks(graph_or_blocks)
    try:
        n = eb.n
        if n == 0:
            return spark.createDataFrame([], "id long, katz double")
        sc = spark.sparkContext
        file_backed = eb.manifest is not None
        source_df = eb.manifest if file_backed else eb.blocks
        weighted = eb.has_weights
        alpha, beta = attenuation_factor, immediate_neighbor_weight
        x = np.zeros(n)
        total = fixed_iterations if fixed_iterations is not None else maxiter
        err = None
        for it in range(total):
            bc = sc.broadcast(x)

            def gather(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
                c = np.asarray(bc.value)
                for pdf in batches:
                    for _, row in pdf.iterrows():
                        srcs, dsts, ws = _block_arrays(row, file_backed, weighted)
                        w = c[srcs]
                        if ws is not None:
                            w = w * ws
                        g = np.bincount(dsts, weights=w)
                        yield pd.DataFrame(
                            {"dst_lo": [np.int64(row["dst_lo"])], "g": [g]}
                        )

            out = source_df.mapInPandas(
                gather, schema="dst_lo long, g array<double>"
            ).toPandas()
            bc.unpersist()
            g_vec = np.zeros(n)
            for lo, g in zip(out["dst_lo"], out["g"]):
                g_vec[lo : lo + len(g)] += g
            new_x = alpha * g_vec + beta
            err = float(np.abs(new_x - x).sum())
            if metrics_sink is not None:
                metrics_sink.append({"iteration": it, "l1_error": err})
            x = new_x
            if fixed_iterations is None and err < n * tolerance:
                break
        else:
            if fixed_iterations is None:
                raise ConvergenceError(
                    f"katz failed to converge in {maxiter} iterations "
                    f"(err={err!r})"
                )
        sumsq = float((x * x).sum())
        norm = 1.0 / math.sqrt(sumsq) if sumsq > 0 else 1.0
        return spark.createDataFrame(
            pd.DataFrame({"id": np.asarray(eb.node_ids), "katz": x * norm}),
            schema="id long, katz double",
        )
    finally:
        if owned:
            eb.unpersist()


def _segmented_min(dsts: np.ndarray, vals: np.ndarray) -> np.ndarray:
    """Dense per-local-dst minimum; absent dsts hold ``_IMAX``.

    Blocks are dst-sorted at pack time → one ``reduceat``; unsorted legacy
    blocks fall back to ``np.minimum.at``."""
    if len(dsts) == 0:
        return np.empty(0, dtype=np.int64)
    width = int(dsts[-1]) + 1
    if width >= 1 and np.all(dsts[:-1] <= dsts[1:]):
        starts = np.flatnonzero(np.r_[True, dsts[1:] != dsts[:-1]])
        mins = np.minimum.reduceat(vals, starts)
        m = np.full(width, _IMAX, dtype=np.int64)
        m[np.asarray(dsts)[starts]] = mins
        return m
    width = int(np.max(dsts)) + 1
    m = np.full(width, _IMAX, dtype=np.int64)
    np.minimum.at(m, np.asarray(dsts), vals)
    return m


def cc_kernel(
    graph_or_blocks,
    max_rounds: int = 200,
    fixed_rounds: int | None = None,
) -> DataFrame:
    """Connected components via CSR blocks. Returns ``(id, label)``,
    label = min node id in the component (exactly the join path's labels).

    A Graph argument builds blocks from the RAW both-directions union
    (matching ``operators/components.py``'s symmetrization — duplicate
    edges are harmless under min). Converged runs pointer-jump the dense
    positional label array to full compression after every round; the
    ``fixed_rounds`` oracle path is pure hash-min."""
    if isinstance(graph_or_blocks, Graph):
        g = graph_or_blocks
        e = g.edges.select(SRC, DST)
        sym = e.unionAll(
            e.select(F.col(DST).alias(SRC), F.col(SRC).alias(DST))
        )
        eb, owned, spark = _resolve_blocks(g, edges=sym)
    else:
        eb, owned, spark = _resolve_blocks(graph_or_blocks)
    try:
        n = eb.n
        if n == 0:
            return spark.createDataFrame([], "id long, label long")
        sc = spark.sparkContext
        file_backed = eb.manifest is not None
        source_df = eb.manifest if file_backed else eb.blocks
        lab = np.arange(n, dtype=np.int64)
        total = fixed_rounds if fixed_rounds is not None else max_rounds
        rnd = 0
        while rnd < total:
            bc = sc.broadcast(lab)

            def gather(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
                cur = np.asarray(bc.value)
                for pdf in batches:
                    for _, row in pdf.iterrows():
                        srcs, dsts, _ = _block_arrays(row, file_backed, False)
                        m = _segmented_min(np.asarray(dsts), cur[srcs])
                        yield pd.DataFrame(
                            {"dst_lo": [np.int64(row["dst_lo"])], "m": [m]}
                        )

            out = source_df.mapInPandas(
                gather, schema="dst_lo long, m array<long>"
            ).toPandas()
            bc.unpersist()
            m_vec = np.full(n, _IMAX, dtype=np.int64)
            for lo, m in zip(out["dst_lo"], out["m"]):
                seg = m_vec[lo : lo + len(m)]
                np.minimum(seg, np.asarray(m, dtype=np.int64), out=seg)
            new_lab = np.minimum(lab, np.where(m_vec == _IMAX, lab, m_vec))
            changed = int((new_lab != lab).sum())
            rnd += 1
            if fixed_rounds is None:
                # pointer jumping to full compression: lab[v] <- lab[lab[v]]
                # until stable. Positional labels make this a pure vector
                # gather; preserves the min-position fixpoint exactly (same
                # argument as components.py:96-118), and a hash-min round
                # with zero changes is still a true fixpoint.
                while True:
                    nl = new_lab[new_lab]
                    if np.array_equal(nl, new_lab):
                        break
                    new_lab = nl
            lab = new_lab
            if fixed_rounds is None and changed == 0:
                break
        else:
            if fixed_rounds is None:
                raise ConvergenceError(
                    f"connected_components kernel did not stabilize in "
                    f"{max_rounds} rounds"
                )
        ids = np.asarray(eb.node_ids)
        return spark.createDataFrame(
            pd.DataFrame({"id": ids, "label": ids[lab]}),
            schema="id long, label long",
        )
    finally:
        if owned:
            eb.unpersist()


def _segmented_mode(dsts: np.ndarray, labs: np.ndarray):
    """Per-local-dst modal label, ties to the smallest label.

    Returns (uniq_local_dsts, winning_labels). One lexsort + run-length
    counting + two segmented reduceats — no python loops."""
    if len(dsts) == 0:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
    idx = np.lexsort((labs, dsts))
    d2, w2 = np.asarray(dsts)[idx], np.asarray(labs)[idx]
    newrun = np.r_[True, (d2[1:] != d2[:-1]) | (w2[1:] != w2[:-1])]
    run_starts = np.flatnonzero(newrun)
    run_d = d2[run_starts]
    run_w = w2[run_starts]
    run_cnt = np.diff(np.r_[run_starts, len(d2)])
    segnew = np.r_[True, run_d[1:] != run_d[:-1]]
    seg_starts = np.flatnonzero(segnew)
    seg_max = np.maximum.reduceat(run_cnt, seg_starts)
    seg_id = np.cumsum(segnew) - 1
    is_max = run_cnt == seg_max[seg_id]
    # first max-count run per segment; runs are label-ascending within a
    # segment, so "first" == smallest label among the most frequent
    cand = np.where(is_max, np.arange(len(run_d)), len(run_d))
    win_idx = np.minimum.reduceat(cand, seg_starts)
    return run_d[seg_starts], run_w[win_idx]


def lpa_kernel(
    graph_or_blocks,
    max_rounds: int = 50,
    fixed_rounds: int | None = None,
) -> DataFrame:
    """Deterministic synchronous LPA via CSR blocks. Returns ``(id, label)``
    — exactly ``operators/lpa.py``'s partition AND labels (vote multiset =
    canonical undirected edges both directions + one self-vote; winner =
    max count then min label; stop on no change or ``max_rounds``; the
    capped loop returns the last state rather than raising, matching the
    reference's no-convergence-contract for community detection)."""
    if isinstance(graph_or_blocks, Graph):
        g = graph_or_blocks
        sym = Graph(
            edges=g.canonical_undirected_edges().select(SRC, DST),
            is_directed=False,
        ).symmetrized()
        votes_edges = sym.unionAll(
            g.node_ids().select(F.col(ID).alias(SRC), F.col(ID).alias(DST))
        )
        eb, owned, spark = _resolve_blocks(g, edges=votes_edges)
    else:
        eb, owned, spark = _resolve_blocks(graph_or_blocks)
    try:
        n = eb.n
        if n == 0:
            return spark.createDataFrame([], "id long, label long")
        sc = spark.sparkContext
        file_backed = eb.manifest is not None
        source_df = eb.manifest if file_backed else eb.blocks
        # labels are POSITIONS: positions are order-isomorphic to sorted
        # ids, so min-label tie-breaks agree with the join path's id-space
        # tie-breaks at every round, and vote counts are label-agnostic
        lab = np.arange(n, dtype=np.int64)
        total = fixed_rounds if fixed_rounds is not None else max_rounds
        for _ in range(total):
            bc = sc.broadcast(lab)

            def gather(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
                cur = np.asarray(bc.value)
                for pdf in batches:
                    for _, row in pdf.iterrows():
                        srcs, dsts, _ = _block_arrays(row, file_backed, False)
                        uniq, win = _segmented_mode(
                            np.asarray(dsts), cur[srcs]
                        )
                        yield pd.DataFrame(
                            {
                                "dst_lo": [np.int64(row["dst_lo"])],
                                "uniq": [uniq],
                                "win": [win],
                            }
                        )

            out = source_df.mapInPandas(
                gather, schema="dst_lo long, uniq array<long>, win array<long>"
            ).toPandas()
            bc.unpersist()
            new_lab = lab.copy()
            for lo, uniq, win in zip(out["dst_lo"], out["uniq"], out["win"]):
                new_lab[lo + np.asarray(uniq, dtype=np.int64)] = np.asarray(
                    win, dtype=np.int64
                )
            changed = int((new_lab != lab).sum())
            lab = new_lab
            if fixed_rounds is None and changed == 0:
                break
        ids = np.asarray(eb.node_ids)
        return spark.createDataFrame(
            pd.DataFrame({"id": ids, "label": ids[lab]}),
            schema="id long, label long",
        )
    finally:
        if owned:
            eb.unpersist()
