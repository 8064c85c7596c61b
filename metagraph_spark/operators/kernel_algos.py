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
    LocalSliceStore,
    _blk_lo,
    _open_block,
    _open_block_weights,
    build_edge_blocks,
)

_IMAX = np.iinfo(np.int64).max


def _distributed_katz_loop(
    eb: EdgeBlocks,
    alpha: float,
    beta: float,
    total: int,
    tolerance: float,
    fixed_iterations: int | None,
    metrics_sink: list | None,
) -> DataFrame | None:
    """Fully distributed katz supersteps for file-backed blocks with full
    dst-range coverage — the vector never crosses the driver (same
    slice-store protocol as ``kernel._distributed_superstep_loop``; this is
    what removes the ~0.2-0.4 s/superstep broadcast+collect floor the
    in-memory loop pays). Each task writes its dst slice ``α·gather + β``
    and returns (err, Σnew²) partials; the L2 norm for the final
    normalization is the last superstep's Σnew² — no extra pass. Returns
    None when coverage is partial (caller falls back to the broadcast
    loop)."""
    import os
    import uuid

    n = eb.n
    rows = [(r["path"], int(r["dst_lo"])) for r in eb.manifest.collect()]
    nb = len(rows)
    los = sorted(lo for _, lo in rows)
    if nb == 0 or los != [_blk_lo(k, n, nb) for k in range(nb)]:
        return None
    hi_of = {_blk_lo(k, n, nb): _blk_lo(k + 1, n, nb) for k in range(nb)}
    weighted = eb.has_weights
    store = LocalSliceStore(
        os.path.join(eb.spill_dir, f"katz_{uuid.uuid4().hex[:12]}")
    )
    store.init_run()
    store.write_full(-1, np.zeros(n))
    err = sumsq = None
    for it in range(total):
        cur = it
        store.create_vector(cur, n)

        def step(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            prev = store.open_read(cur - 1)
            out_vec = store.open_write(cur)
            for pdf in batches:
                for _, row in pdf.iterrows():
                    path = row["path"]
                    srcs, dsts = _open_block(path)
                    lo = int(row["dst_lo"])
                    hi = hi_of[lo]
                    width = hi - lo
                    w = np.asarray(prev)[srcs]
                    if weighted:
                        w = w * np.asarray(_open_block_weights(path))
                    g = np.bincount(dsts, weights=w, minlength=width)[:width]
                    new_slice = alpha * g + beta
                    out_vec[lo:hi] = new_slice
                    yield pd.DataFrame(
                        {
                            "dst_lo": [np.int64(lo)],
                            "err": [
                                float(
                                    np.abs(
                                        new_slice - np.asarray(prev[lo:hi])
                                    ).sum()
                                )
                            ],
                            "sumsq": [float((new_slice * new_slice).sum())],
                        }
                    )
            store.flush(out_vec)

        out = eb.manifest.mapInPandas(
            step, schema="dst_lo long, err double, sumsq double"
        ).toPandas()
        if set(out["dst_lo"]) != set(hi_of):
            store.cleanup()
            raise RuntimeError("distributed katz superstep lost a slice")
        err = float(out["err"].sum())
        sumsq = float(out["sumsq"].sum())
        if metrics_sink is not None:
            metrics_sink.append({"iteration": it, "l1_error": err})
        if it >= 1:
            store.delete_vector(it - 2)
        if fixed_iterations is None and err < n * tolerance:
            total = it + 1
            break
    else:
        if fixed_iterations is None:
            store.cleanup()
            raise ConvergenceError(
                f"katz failed to converge (err={err!r})"
            )
    norm = 1.0 / math.sqrt(sumsq) if sumsq and sumsq > 0 else 1.0
    ids_path = os.path.join(eb.spill_dir, "node_ids.npy")
    final_it = total - 1

    def emit(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ids = np.load(ids_path, mmap_mode="r")
        r = store.open_read(final_it)
        for pdf in batches:
            for _, row in pdf.iterrows():
                lo = int(row["dst_lo"])
                hi = hi_of[lo]
                yield pd.DataFrame(
                    {
                        "id": np.asarray(ids[lo:hi]),
                        "katz": np.asarray(r[lo:hi]) * norm,
                    }
                )

    from metagraph_spark.state import truncate_lineage

    result = truncate_lineage(
        eb.manifest.mapInPandas(emit, schema="id long, katz double")
    )
    store.cleanup()
    return result


def _resolve_blocks(graph_or_blocks, *, edges=None, with_weights=False,
                    spill_dir=None):
    """(EdgeBlocks, owned, spark) — builds blocks when given a Graph."""
    if isinstance(graph_or_blocks, EdgeBlocks):
        eb = graph_or_blocks
        src_df = eb.blocks if eb.blocks is not None else eb.manifest
        return eb, False, src_df.sparkSession
    eb = build_edge_blocks(
        graph_or_blocks, edges=edges, with_weights=with_weights,
        spill_dir=spill_dir, with_degrees=False,
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
        total_d = fixed_iterations if fixed_iterations is not None else maxiter
        # round-6 size route: small layouts run every superstep on the
        # driver over the block arrays (no Spark job per superstep — see
        # kernel.KERNEL_DRIVER_LOOP_MAX_EDGES); per-block bincount + slice
        # accumulation is the identical arithmetic, so values are
        # bit-exact with both distributed loops.
        from metagraph_spark.operators.kernel import (
            KERNEL_DRIVER_LOOP_MAX_VERTICES,
            driver_block_arrays,
        )

        blks = (
            driver_block_arrays(eb)
            if n <= KERNEL_DRIVER_LOOP_MAX_VERTICES
            else None
        )
        if blks is not None:
            x = np.zeros(n)
            err = None
            for it in range(total_d):
                g_vec = np.zeros(n)
                for lo, srcs, dsts, ws in blks:
                    if len(srcs) == 0:
                        continue
                    w = x[srcs]
                    if ws is not None:
                        w = w * ws
                    g = np.bincount(dsts, weights=w)
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
                pd.DataFrame(
                    {"id": np.asarray(eb.node_ids), "katz": x * norm}
                ),
                schema="id long, katz double",
            )
        if file_backed and eb.spill_dir:
            r_df = _distributed_katz_loop(
                eb, alpha, beta, total_d, tolerance, fixed_iterations,
                metrics_sink,
            )
            if r_df is not None:
                return r_df
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


def _gather_once(source_df, file_backed, weighted, vec, n):
    """One dense ``Aᵀ·vec`` pass over the blocks (broadcast feed). Returns
    the assembled length-``n`` gather vector."""
    sc = source_df.sparkSession.sparkContext
    bc = sc.broadcast(vec)

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
    return g_vec


def eigenvector_kernel(
    graph_or_blocks,
    maxiter: int = 50,
    tolerance: float = 1e-05,
    fixed_iterations: int | None = None,
) -> DataFrame:
    """Eigenvector centrality via CSR blocks. Returns ``(id, eigenvector)``.

    Exactly ``operators/centrality.py:eigenvector_centrality`` (reference
    ``plugins/networkx/algorithms.py:192-199``): ``x' = x + Aᵀx`` then
    L2-normalize every iteration; same lagged convergence schedule as the
    join path (error checked from iteration 1 over ``maxiter+1`` total),
    so converged runs take identical superstep counts."""
    if isinstance(graph_or_blocks, Graph):
        eb, owned, spark = _resolve_blocks(
            graph_or_blocks, with_weights=graph_or_blocks.is_weighted
        )
    else:
        eb, owned, spark = _resolve_blocks(graph_or_blocks)
    try:
        n = eb.n
        if n == 0:
            return spark.createDataFrame([], "id long, eigenvector double")
        file_backed = eb.manifest is not None
        source_df = eb.manifest if file_backed else eb.blocks
        weighted = eb.has_weights
        xn = np.full(n, 1.0 / n)  # current NORMALIZED iterate
        total = (
            fixed_iterations if fixed_iterations is not None else maxiter + 1
        )
        for it in range(total):
            g = _gather_once(source_df, file_backed, weighted, xn, n)
            z = xn + g
            zn = math.sqrt(float((z * z).sum()))
            new_xn = z / zn if zn > 0 else z
            if fixed_iterations is None and it >= 1:
                err = float(np.abs(xn - new_xn).sum())
                if err < n * tolerance:
                    xn = new_xn
                    break
            xn = new_xn
        else:
            if fixed_iterations is None:
                raise ConvergenceError(
                    f"eigenvector failed to converge in {maxiter} iterations"
                )
        return spark.createDataFrame(
            pd.DataFrame({"id": np.asarray(eb.node_ids), "eigenvector": xn}),
            schema="id long, eigenvector double",
        )
    finally:
        if owned:
            eb.unpersist()


def hits_kernel(
    graph: Graph,
    maxiter: int = 50,
    tolerance: float = 1e-05,
    normalize: bool = True,
    fixed_iterations: int | None = None,
) -> tuple[DataFrame, DataFrame]:
    """HITS via CSR blocks (directed). Returns ``(hubs, authorities)``.

    Exactly ``operators/centrality.py:hits_centrality`` (nx semantics,
    ``plugins/networkx/algorithms.py:201-206``): ``a = Aᵀh`` /
    ``h = A·a`` with max-normalization each half-step, convergence on
    ``Σ|h'-h| < tol`` (not N-scaled), optional final sum-normalization.
    Builds TWO block layouts (forward for the authority gather, reversed
    for the hub gather) — the two mat-vecs are data-dependent, so two
    passes per superstep is the algorithmic minimum here too."""
    from metagraph_spark.exceptions import GraphPropertyError

    if not graph.is_directed:
        raise GraphPropertyError("hits requires a directed graph")
    from metagraph_spark.graph import WEIGHT

    spark = graph.edges.sparkSession
    weighted = graph.is_weighted
    e = graph.edges
    cols = [SRC, DST] + ([WEIGHT] if weighted else [])
    fwd_edges = e.select(*cols)
    rev_cols = [F.col(DST).alias(SRC), F.col(SRC).alias(DST)] + (
        [F.col(WEIGHT)] if weighted else []
    )
    rev_edges = e.select(*rev_cols)
    eb_f = build_edge_blocks(
        graph, edges=fwd_edges, with_weights=weighted, with_degrees=False
    )
    eb_r = build_edge_blocks(
        graph, edges=rev_edges, with_weights=weighted, with_degrees=False
    )
    try:
        n = eb_f.n
        if n == 0:
            empty_h = spark.createDataFrame([], "id long, hubs double")
            empty_a = spark.createDataFrame([], "id long, authority double")
            return empty_h, empty_a
        src_f = eb_f.blocks if eb_f.blocks is not None else eb_f.manifest
        src_r = eb_r.blocks if eb_r.blocks is not None else eb_r.manifest
        fb_f = eb_f.manifest is not None
        fb_r = eb_r.manifest is not None
        h = np.full(n, 1.0 / n)
        h_norm = 1.0
        a = np.zeros(n)
        a_norm = 1.0
        total = fixed_iterations if fixed_iterations is not None else maxiter
        converged = fixed_iterations is not None
        for _ in range(total):
            a = _gather_once(src_f, fb_f, weighted, h / h_norm, n)
            # join parity: Observation max(v) `or 1.0` — 0.0 falls back,
            # a negative max (negative weights) is kept as the divisor
            am = float(a.max())
            a_norm = am if am != 0.0 else 1.0
            h_prev_normed = h / h_norm
            h = _gather_once(src_r, fb_r, weighted, a / a_norm, n)
            hm = float(h.max())
            hmax = hm if hm != 0.0 else 1.0
            if fixed_iterations is None:
                err = float(np.abs(h / hmax - h_prev_normed).sum())
                h_norm = hmax
                if err < tolerance:
                    converged = True
                    break
            else:
                h_norm = hmax
        if not converged:
            raise ConvergenceError(
                f"hits failed to converge in {maxiter} iterations"
            )
        hv = h / h_norm
        av = a / a_norm
        if normalize:
            hv = hv / (float(hv.sum()) or 1.0)
            av = av / (float(av.sum()) or 1.0)
        ids = np.asarray(eb_f.node_ids)
        h_df = spark.createDataFrame(
            pd.DataFrame({"id": ids, "hubs": hv}), schema="id long, hubs double"
        )
        a_df = spark.createDataFrame(
            pd.DataFrame({"id": ids, "authority": av}),
            schema="id long, authority double",
        )
        return h_df, a_df
    finally:
        eb_f.unpersist()
        eb_r.unpersist()


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


def _vector_feed(spark, eb):
    """Per-round distribution of the driver's dense vector to workers.

    File-backed blocks (shared filesystem): write one ``.npy`` per round
    and let every task mmap it — the OS page cache keeps ONE host-wide
    copy, where ``sc.broadcast`` deserializes a private copy into every
    python worker each round. In-memory blocks: broadcast (no shared-fs
    assumption). Returns (publish(arr) -> opener, release(opener))."""
    import os
    import uuid

    sc = spark.sparkContext
    if eb.spill_dir:
        feed_dir = os.path.join(eb.spill_dir, f"feed_{uuid.uuid4().hex[:8]}")
        os.makedirs(feed_dir, exist_ok=True)

        def publish(arr):
            path = os.path.join(feed_dir, f"v_{uuid.uuid4().hex[:8]}.npy")
            np.save(path, arr)
            return ("file", path)

        def release(handle):
            try:
                os.unlink(handle[1])
            except FileNotFoundError:
                pass

        return publish, release

    def publish(arr):
        return ("bc", sc.broadcast(arr))

    def release(handle):
        handle[1].unpersist()

    return publish, release


def _feed_value(handle):
    if handle[0] == "file":
        return np.load(handle[1], mmap_mode="r")
    return np.asarray(handle[1].value)


def cc_blocks(graph: Graph, spill_dir: str | None = None,
              num_blocks: int | None = None) -> EdgeBlocks:
    """Prebuild :func:`cc_kernel` blocks (RAW both-directions union,
    degree-free) — the layout is the dominant one-time cost at scale;
    build once, run many."""
    e = graph.edges.select(SRC, DST)
    sym = e.unionAll(e.select(F.col(DST).alias(SRC), F.col(SRC).alias(DST)))
    return build_edge_blocks(
        graph, num_blocks=num_blocks, spill_dir=spill_dir, edges=sym,
        with_degrees=False,
    )


def label_blocks(graph: Graph, spill_dir: str | None = None,
                 num_blocks: int | None = None) -> EdgeBlocks:
    """ONE shared layout for :func:`cc_kernel` AND :func:`lpa_kernel`:
    canonical undirected edges in both directions (deduplicated, no
    self-loops), degree-free. CC is invariant to the dedup (min over a
    multiset ignores multiplicity); LPA REQUIRES it (vote counts are
    multiplicities) plus exactly one self-vote per node, which the LPA
    kernels synthesize per block at read time (``self_votes_baked=False``)
    instead of materializing V extra edge rows in a second full layout —
    at 100M edges the separate vote layout cost ~190 s on top of the CC
    layout for nearly the same symmetrized edge set (VERDICT r4 #5).
    Build once, feed both kernels."""
    sym = Graph(
        edges=graph.canonical_undirected_edges().select(SRC, DST),
        is_directed=False,
    ).symmetrized()
    return build_edge_blocks(
        graph, num_blocks=num_blocks, spill_dir=spill_dir,
        edges=sym, with_degrees=False,
    )


def lpa_vote_blocks(graph: Graph, spill_dir: str | None = None,
                    num_blocks: int | None = None) -> EdgeBlocks:
    """Legacy LPA layout: canonical undirected edges both directions PLUS
    one baked self-loop row per node (the self-vote), degree-free. The LPA
    kernels detect ``self_votes_baked=True`` and skip their synthetic
    self-vote suffix. Prefer :func:`label_blocks` (shared with CC, no
    second layout pass) for new callers."""
    sym = Graph(
        edges=graph.canonical_undirected_edges().select(SRC, DST),
        is_directed=False,
    ).symmetrized()
    votes_edges = sym.unionAll(
        graph.node_ids().select(F.col(ID).alias(SRC), F.col(ID).alias(DST))
    )
    return build_edge_blocks(
        graph, num_blocks=num_blocks, spill_dir=spill_dir,
        edges=votes_edges, with_degrees=False, self_votes_baked=True,
    )


def _distributed_cc_loop(
    eb: EdgeBlocks, max_rounds: int, fixed_rounds: int | None,
    slice_store=None, resume: bool = False,
) -> DataFrame | None:
    """Hash-min label exchange where the label vector NEVER crosses the
    driver: int64 label vectors live in the slice store (same protocol as
    the pagerank/katz distributed loops), each gather task writes its
    dst-slice minimum and returns a changed-count partial, and converged
    rounds append ONE pointer-doubling job (``J[lo:hi] = L[L[lo:hi]]`` over
    the mmap'd global vector) — O(log V) rounds, driver state
    O(num_blocks). This removes :func:`cc_kernel`'s dense driver label
    array, so the FAST cc path is capped only by int32 positions, like the
    file-backed pagerank route. Returns None when block coverage is
    partial (caller falls back to the feed loop)."""
    import os
    import uuid

    n = eb.n
    rows = [(r["path"], int(r["dst_lo"])) for r in eb.manifest.collect()]
    nb = len(rows)
    los = sorted(lo for _, lo in rows)
    if nb == 0 or los != [_blk_lo(k, n, nb) for k in range(nb)]:
        return None
    hi_of = {_blk_lo(k, n, nb): _blk_lo(k + 1, n, nb) for k in range(nb)}
    store = slice_store
    if store is None:
        store = LocalSliceStore(
            os.path.join(eb.spill_dir, f"cc_{uuid.uuid4().hex[:12]}")
        )
    store.init_run()
    # durability: every committed label vector is a valid min-label state
    # (hash-min is monotone), so resume restarts from the NEWEST committed
    # vector — same marker protocol as the pagerank loop. Crashing between
    # a gather commit and its jump commit just loses the jump (an
    # optimization, not state); the round counter persists via put_meta
    # and at worst replays one gather, which is idempotent under min.
    durable = hasattr(store, "mark_complete") and hasattr(
        store, "latest_complete"
    )
    mode = "fixed" if fixed_rounds is not None else "converged"
    cur, rnd = 0, 0
    resumed = False
    if resume and durable:
        prior = store.get_meta() if hasattr(store, "get_meta") else None
        latest = store.latest_complete()
        if prior is not None and latest is not None:
            if prior.get("algo") != "cc" or prior.get("n") != n:
                raise ValueError(
                    "resume requested but the slice store holds a "
                    f"different run (stored {prior}, this run algo=cc "
                    f"n={n})"
                )
            if prior.get("mode", mode) != mode:
                # converged-mode vectors include pointer-jump commits, so
                # "vector index == round" does NOT hold across modes: a
                # fixed-round resume from a converged store would
                # overstate the completed rounds and unroll a different k
                # (ADVICE r5)
                raise ValueError(
                    "resume requested with "
                    f"{mode} rounds but the slice store holds a "
                    f"{prior.get('mode')!r}-mode run; finish it with the "
                    "same mode or start a fresh store"
                )
            # fixed-round runs never jump, so vector index == round and
            # the count is EXACT (oracle comparisons unroll a specific k);
            # converged runs take the persisted round counter, which can
            # lag one commit behind — replaying one gather is idempotent
            # under min and only consumes max_rounds slack
            cur = latest
            rnd = cur if fixed_rounds is not None else int(
                prior.get("round", 0)
            )
            resumed = True
    if not resumed:
        if hasattr(store, "put_meta"):
            store.put_meta({"algo": "cc", "n": n, "round": 0, "mode": mode})
        store.write_full(0, np.arange(n, dtype=np.int64))
        if durable:
            store.mark_complete(0)
    total = fixed_rounds if fixed_rounds is not None else max_rounds
    converged = fixed_rounds is not None
    while rnd < total:
        prev_idx, out_idx = cur, cur + 1
        store.create_vector(out_idx, n, dtype=np.int64)

        def gather(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            prev = store.open_read(prev_idx)
            out_vec = store.open_write(out_idx)
            for pdf in batches:
                for _, row in pdf.iterrows():
                    srcs, dsts = _open_block(row["path"])
                    lo = int(row["dst_lo"])
                    hi = hi_of[lo]
                    prev_slice = np.asarray(prev[lo:hi])
                    if len(srcs):
                        m = _segmented_min(
                            np.asarray(dsts), np.asarray(prev)[srcs]
                        )
                        new_slice = prev_slice.copy()
                        np.minimum(
                            new_slice[: len(m)], m, out=new_slice[: len(m)]
                        )
                    else:
                        new_slice = prev_slice
                    out_vec[lo:hi] = new_slice
                    yield pd.DataFrame(
                        {
                            "dst_lo": [np.int64(lo)],
                            "changed": [
                                int((new_slice != prev_slice).sum())
                            ],
                        }
                    )
            store.flush(out_vec)

        out = eb.manifest.mapInPandas(
            gather, schema="dst_lo long, changed long"
        ).toPandas()
        if set(out["dst_lo"]) != set(hi_of):
            store.cleanup()
            raise RuntimeError("distributed cc round lost a slice")
        changed = int(out["changed"].sum())
        if durable:
            store.mark_complete(out_idx)
        cur = out_idx
        rnd += 1
        if fixed_rounds is None and changed:
            # one pointer-doubling job per round: J = L[L] slice-wise over
            # the mmap'd global vector (valid min-label state; fixpoint
            # unchanged — components.py:96-118 argument)
            jmp_idx = cur + 1
            store.create_vector(jmp_idx, n, dtype=np.int64)
            src_idx = cur

            def jump(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
                full = store.open_read(src_idx)
                out_vec = store.open_write(jmp_idx)
                for pdf in batches:
                    for _, row in pdf.iterrows():
                        lo = int(row["dst_lo"])
                        hi = hi_of[lo]
                        sl = np.asarray(full[lo:hi])
                        out_vec[lo:hi] = np.asarray(full)[sl]
                        yield pd.DataFrame({"dst_lo": [np.int64(lo)]})
                store.flush(out_vec)

            jout = eb.manifest.mapInPandas(
                jump, schema="dst_lo long"
            ).toPandas()
            if set(jout["dst_lo"]) != set(hi_of):
                store.cleanup()
                raise RuntimeError("distributed cc jump lost a slice")
            if durable:
                store.mark_complete(jmp_idx)
            cur = jmp_idx
        # drop everything older than the newest vector
        for old in range(max(0, cur - 3), cur):
            store.delete_vector(old)
        if durable and hasattr(store, "put_meta"):
            store.put_meta({"algo": "cc", "n": n, "round": rnd, "mode": mode})
        if fixed_rounds is None and changed == 0:
            converged = True
            break
    if fixed_rounds is None and not converged:
        store.cleanup()
        raise ConvergenceError(
            f"connected_components kernel did not stabilize in "
            f"{max_rounds} rounds"
        )
    ids_path = os.path.join(eb.spill_dir, "node_ids.npy")
    final_idx = cur

    def emit(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ids = np.load(ids_path, mmap_mode="r")
        lab = store.open_read(final_idx)
        for pdf in batches:
            for _, row in pdf.iterrows():
                lo = int(row["dst_lo"])
                hi = hi_of[lo]
                sl = np.asarray(lab[lo:hi])
                yield pd.DataFrame(
                    {
                        "id": np.asarray(ids[lo:hi]),
                        "label": np.asarray(ids)[sl],
                    }
                )

    from metagraph_spark.state import truncate_lineage

    result = truncate_lineage(
        eb.manifest.mapInPandas(emit, schema="id long, label long")
    )
    store.cleanup()
    return result


def cc_kernel(
    graph_or_blocks,
    max_rounds: int = 200,
    fixed_rounds: int | None = None,
    spill_dir: str | None = None,
    slice_store=None,
    resume: bool = False,
) -> DataFrame:
    """Connected components via CSR blocks. Returns ``(id, label)``,
    label = min node id in the component (exactly the join path's labels).

    A Graph argument builds blocks from the RAW both-directions union
    (matching ``operators/components.py``'s symmetrization — duplicate
    edges are harmless under min); ``spill_dir`` builds them FILE-BACKED,
    which is the scale layout: per-round gathers mmap the block files
    directly, instead of re-converting Spark-cached array rows to Arrow
    every round (measured 2-3x the whole runtime at 100M edges), and the
    label vector reaches workers through one page-cache-shared file per
    round rather than a per-worker broadcast copy. Converged runs
    pointer-jump the dense positional label array to full compression
    after every round; the ``fixed_rounds`` oracle path is pure
    hash-min.

    File-backed blocks run :func:`_distributed_cc_loop` — labels live in
    the slice store and the driver holds O(num_blocks) state only, so the
    kernel route has no vertex cap below int32 positions (measured at
    parity with the driver-assembled feed loop at 100M edges / 2M nodes:
    15.6 s vs 15.2 s); the feed loop below remains the in-memory-blocks
    path."""
    if resume and slice_store is None:
        raise ValueError(
            "resume=True requires an injected slice_store (the default "
            "store lives under a fresh uuid dir per call and can never "
            "hold a prior run's vectors)"
        )
    if isinstance(graph_or_blocks, Graph):
        spark = graph_or_blocks.edges.sparkSession
        if slice_store is None and not resume and spill_dir is None:
            # round-6 small-graph route: skip the block-layout Spark jobs
            # entirely — one Arrow collect of the edge pairs, then the
            # whole loop on the driver (identical labels; see
            # _driver_graph_arrays / _driver_cc_loop)
            arrs = _driver_graph_arrays(graph_or_blocks, "raw_sym")
            if arrs is not None:
                ids, srcs, dsts = arrs
                if len(ids) == 0:
                    return spark.createDataFrame([], "id long, label long")
                return _driver_cc_loop(
                    spark, len(ids), [(0, srcs, dsts, None)], ids,
                    max_rounds, fixed_rounds,
                )
        eb = cc_blocks(graph_or_blocks, spill_dir=spill_dir)
        owned = True
    else:
        eb, owned, spark = _resolve_blocks(graph_or_blocks)
    try:
        n = eb.n
        if n == 0:
            return spark.createDataFrame([], "id long, label long")
        file_backed = eb.manifest is not None
        source_df = eb.manifest if file_backed else eb.blocks
        # round-6 size route: small layouts run the whole hash-min loop on
        # the driver over the block arrays (no per-round Spark job); the
        # per-block segmented-min + slice-minimum is the identical integer
        # arithmetic, so labels are exactly the distributed loops'. Never
        # when a durable slice-store contract is in play.
        if slice_store is None and not resume:
            from metagraph_spark.operators.kernel import (
                KERNEL_DRIVER_LOOP_MAX_VERTICES,
                driver_block_arrays,
            )

            blks = (
                driver_block_arrays(eb)
                if n <= KERNEL_DRIVER_LOOP_MAX_VERTICES
                else None
            )
            if blks is not None:
                return _driver_cc_loop(
                    spark, n, blks, eb.node_ids, max_rounds, fixed_rounds
                )
        if file_backed and (eb.spill_dir or slice_store is not None):
            r_df = _distributed_cc_loop(
                eb, max_rounds, fixed_rounds, slice_store=slice_store,
                resume=resume,
            )
            if r_df is not None:
                return r_df
        publish, release = _vector_feed(spark, eb)
        lab = np.arange(n, dtype=np.int64)
        total = fixed_rounds if fixed_rounds is not None else max_rounds
        rnd = 0
        while rnd < total:
            handle = publish(lab)

            def gather(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
                cur = _feed_value(handle)
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
            release(handle)
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

    Returns (uniq_local_dsts, winning_labels). One composite-key sort +
    run-length counting + two segmented reduceats — no python loops. The
    (dst, label) pair is packed into one int64 key (dst·stride + label):
    ``np.sort`` on the single key measured 20x faster than
    ``np.lexsort((labs, dsts))`` on 3M-edge blocks, and the sort order is
    identical. Fits int64 for any V < 2^31 (the positional-layout cap)."""
    if len(dsts) == 0:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
    labs = np.asarray(labs, dtype=np.int64)
    stride = int(labs.max()) + 1
    key = np.asarray(dsts, dtype=np.int64) * stride + labs
    key.sort()
    n_e = len(key)
    newrun = np.empty(n_e, dtype=bool)
    newrun[0] = True
    np.not_equal(key[1:], key[:-1], out=newrun[1:])
    run_starts = np.flatnonzero(newrun)
    n_r = len(run_starts)
    # decompose dst/label ONLY at run starts (runs << edges after the
    # first rounds; the full-array divmod measured 0.4 s/block at 3M)
    run_key = key[run_starts]
    run_d = run_key // stride
    run_w = run_key - run_d * stride
    run_cnt = np.empty(n_r, dtype=np.int64)
    np.subtract(run_starts[1:], run_starts[:-1], out=run_cnt[: n_r - 1])
    run_cnt[n_r - 1] = n_e - run_starts[n_r - 1]
    segnew = np.empty(n_r, dtype=bool)
    segnew[0] = True
    np.not_equal(run_d[1:], run_d[:-1], out=segnew[1:])
    seg_starts = np.flatnonzero(segnew)
    n_s = len(seg_starts)
    seg_cnt = np.empty(n_s, dtype=np.int64)
    np.subtract(seg_starts[1:], seg_starts[:-1], out=seg_cnt[: n_s - 1])
    seg_cnt[n_s - 1] = n_r - seg_starts[n_s - 1]
    seg_max = np.maximum.reduceat(run_cnt, seg_starts)
    is_max = run_cnt == np.repeat(seg_max, seg_cnt)
    # first max-count run per segment; runs are label-ascending within a
    # segment, so "first" == smallest label among the most frequent
    cand = np.where(is_max, np.arange(n_r), n_r)
    win_idx = np.minimum.reduceat(cand, seg_starts)
    return run_d[seg_starts], run_w[win_idx]


def _driver_graph_arrays(graph: Graph, edge_mode: str):
    """(sorted_ids, src_pos, dst_pos) for a SMALL graph, built entirely on
    the driver (one Arrow ``toPandas`` of the edge pairs — no block-layout
    Spark jobs), or ``None`` past the driver-loop caps. ``edge_mode``:
    ``"raw_sym"`` (both directions of the raw rows — cc_blocks' edge set)
    or ``"canonical_sym"`` (deduplicated canonical pairs, self-loops
    dropped, both directions — label_blocks' edge set). Node universe =
    edge endpoints ∪ explicit graph.nodes, exactly ``node_ids()``. Output
    is dst-position sorted like packed blocks, so the driver loops and
    their segmented kernels apply unchanged (identical label results)."""
    from metagraph_spark.operators.kernel import (
        KERNEL_DRIVER_LOOP_MAX_EDGES,
        KERNEL_DRIVER_LOOP_MAX_VERTICES,
    )

    if KERNEL_DRIVER_LOOP_MAX_EDGES < 0:
        return None
    if graph.num_edges() > KERNEL_DRIVER_LOOP_MAX_EDGES:
        return None
    pdf = graph.edges.select(SRC, DST).toPandas()
    s = pdf[SRC].to_numpy(dtype=np.int64)
    d = pdf[DST].to_numpy(dtype=np.int64)
    endpoints = [s, d]
    if graph.nodes is not None:
        endpoints.append(
            graph.nodes.select(ID).toPandas()[ID].to_numpy(dtype=np.int64)
        )
    ids = np.unique(np.concatenate(endpoints))
    n = len(ids)
    if n > KERNEL_DRIVER_LOOP_MAX_VERTICES:
        return None
    sp = np.searchsorted(ids, s)
    dp = np.searchsorted(ids, d)
    if edge_mode == "canonical_sym":
        keep = sp != dp
        lo = np.minimum(sp[keep], dp[keep])
        hi = np.maximum(sp[keep], dp[keep])
        uniq = np.unique(lo * np.int64(n) + hi)
        lo = uniq // n
        hi = uniq - lo * n
        src_pos = np.concatenate([lo, hi])
        dst_pos = np.concatenate([hi, lo])
    else:
        src_pos = np.concatenate([sp, dp])
        dst_pos = np.concatenate([dp, sp])
    order = np.argsort(dst_pos, kind="stable")
    return ids, src_pos[order], dst_pos[order]


def _driver_cc_loop(spark, n, blks, ids, max_rounds, fixed_rounds):
    """Hash-min loop over driver-resident block arrays (see
    ``kernel.KERNEL_DRIVER_LOOP_MAX_EDGES``): per-block segmented-min +
    slice-minimum, pointer jumping on the converged path — the identical
    integer arithmetic as the feed/distributed loops, no per-round Spark
    job."""
    lab = np.arange(n, dtype=np.int64)
    total = fixed_rounds if fixed_rounds is not None else max_rounds
    rnd = 0
    while rnd < total:
        m_vec = np.full(n, _IMAX, dtype=np.int64)
        for lo, srcs, dsts, _ws in blks:
            if len(srcs) == 0:
                continue
            m = _segmented_min(dsts, lab[srcs])
            seg = m_vec[lo : lo + len(m)]
            np.minimum(seg, m, out=seg)
        new_lab = np.minimum(lab, np.where(m_vec == _IMAX, lab, m_vec))
        changed = int((new_lab != lab).sum())
        rnd += 1
        if fixed_rounds is None:
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
    ids = np.asarray(ids)
    return spark.createDataFrame(
        pd.DataFrame({"id": ids, "label": ids[lab]}),
        schema="id long, label long",
    )


def _driver_lpa_loop(spark, n, blks, ids, baked, max_rounds, fixed_rounds):
    """Synchronous-LPA loop over driver-resident block arrays — identical
    votes/winners as the feed/distributed loops, no per-round Spark job."""
    lab = np.arange(n, dtype=np.int64)
    total = fixed_rounds if fixed_rounds is not None else max_rounds
    for _ in range(total):
        new_lab = lab.copy()
        for lo, srcs, dsts, _ws in blks:
            if len(srcs) == 0:
                continue
            uniq, win = _mode_votes(dsts, lab[srcs], lab[lo:], not baked)
            new_lab[lo + uniq] = win
        changed = int((new_lab != lab).sum())
        lab = new_lab
        if fixed_rounds is None and changed == 0:
            break
    ids = np.asarray(ids)
    return spark.createDataFrame(
        pd.DataFrame({"id": ids, "label": ids[lab]}),
        schema="id long, label long",
    )


# Segments at least this long take the dense-bincount mode path inside
# ``_mode_votes`` instead of entering the composite-key sort.
_BIG_SEG = 4096


def _mode_votes(dsts, labs, prev_tail, include_self_votes: bool):
    """Per-local-dst modal label (ties to the smallest label) over
    dst-sorted neighbor votes, with the one-self-vote rule applied
    ALGEBRAICALLY when ``include_self_votes`` (+1 to the dst's own
    previous label — exactly the synthetic self-vote row's effect; a lone
    self-vote on an unvoted position is a no-op either way, so only voted
    dsts need it). Returns ``(uniq_local_dsts, winners)``.

    Skew guard (guide §2.5, round 6): hub-degree segments (>= _BIG_SEG
    rows) are counted with a dense ``np.bincount`` + ``argmax`` — O(rows)
    per segment, first-max == smallest label, identical winner — instead
    of entering the composite sort: on the 100M-edge Zipf bench one block
    held a 65M-row hub segment and its single-threaded sort was 55 s of a
    57 s round. Small segments keep the measured-fast composite-key sort
    (:func:`_segmented_mode`). ``prev_tail`` is the previous label vector
    FROM the block's dst_lo onward (indexed by local dst)."""
    dsts = np.asarray(dsts, dtype=np.int64)
    labs = np.asarray(labs, dtype=np.int64)
    if len(dsts) == 0:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
    if not np.all(dsts[:-1] <= dsts[1:]):
        order = np.argsort(dsts, kind="stable")
        dsts, labs = dsts[order], labs[order]
    starts = np.flatnonzero(np.r_[True, dsts[1:] != dsts[:-1]])
    lens = np.diff(np.r_[starts, len(dsts)])
    seg_d = dsts[starts]
    big = lens >= _BIG_SEG
    big_d, big_w = [], []
    for i in np.flatnonzero(big):
        s = int(starts[i])
        seg = labs[s : s + int(lens[i])]
        cnt = np.bincount(seg)
        d_loc = int(seg_d[i])
        if include_self_votes:
            own = int(prev_tail[d_loc])
            if own >= len(cnt):
                cnt = np.concatenate(
                    [cnt, np.zeros(own - len(cnt) + 1, dtype=cnt.dtype)]
                )
            cnt[own] += 1
        big_d.append(d_loc)
        big_w.append(int(np.argmax(cnt)))
    if big.all():
        return (
            np.asarray(big_d, dtype=np.int64),
            np.asarray(big_w, dtype=np.int64),
        )
    row_small = np.repeat(~big, lens)
    d_small = dsts[row_small]
    l_small = labs[row_small]
    if include_self_votes:
        sd = seg_d[~big]
        d_small = np.concatenate([d_small, sd])
        l_small = np.concatenate(
            [l_small, np.asarray(prev_tail)[sd]]
        )
    uniq, win = _segmented_mode(d_small, l_small)
    if big_d:
        uniq = np.concatenate([uniq, np.asarray(big_d, dtype=np.int64)])
        win = np.concatenate([win, np.asarray(big_w, dtype=np.int64)])
    return uniq, win


def _distributed_lpa_loop(
    eb: EdgeBlocks, max_rounds: int, fixed_rounds: int | None,
    slice_store=None, resume: bool = False,
) -> DataFrame | None:
    """LPA rounds with the label vector in the slice store (never on the
    driver): each task computes its dst-range's modal votes and writes the
    slice directly — positions without a vote keep their previous label
    (isolated nodes; with the self-loop vote edges every node in a block's
    range normally votes). One job per round, driver state O(num_blocks).
    Returns None when block coverage is partial."""
    import os
    import uuid

    n = eb.n
    rows = [(r["path"], int(r["dst_lo"])) for r in eb.manifest.collect()]
    nb = len(rows)
    los = sorted(lo for _, lo in rows)
    if nb == 0 or los != [_blk_lo(k, n, nb) for k in range(nb)]:
        return None
    hi_of = {_blk_lo(k, n, nb): _blk_lo(k + 1, n, nb) for k in range(nb)}
    store = slice_store
    if store is None:
        store = LocalSliceStore(
            os.path.join(eb.spill_dir, f"lpa_{uuid.uuid4().hex[:12]}")
        )
    store.init_run()
    # durability (same marker protocol as the pagerank/CC loops): the LPA
    # vector index IS the round number (one vector per round, previous
    # deleted after commit), so resume restarts at round latest_complete()
    # and runs exactly the REMAINING rounds — deterministic sync LPA
    # replays bit-identically from any committed round
    durable = hasattr(store, "mark_complete") and hasattr(
        store, "latest_complete"
    )
    cur = 0
    resumed = False
    if resume and durable:
        prior = store.get_meta() if hasattr(store, "get_meta") else None
        latest = store.latest_complete()
        if prior is not None and latest is not None:
            if prior.get("algo") != "lpa" or prior.get("n") != n:
                raise ValueError(
                    "resume requested but the slice store holds a "
                    f"different run (stored {prior}, this run algo=lpa "
                    f"n={n})"
                )
            cur = latest
            resumed = True
    if not resumed:
        if hasattr(store, "put_meta"):
            store.put_meta({"algo": "lpa", "n": n})
        store.write_full(0, np.arange(n, dtype=np.int64))
        if durable:
            store.mark_complete(0)
    total = fixed_rounds if fixed_rounds is not None else max_rounds
    for rnd in range(cur, total):
        prev_idx, out_idx = cur, cur + 1
        store.create_vector(out_idx, n, dtype=np.int64)

        baked = eb.self_votes_baked

        def step(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            prev = store.open_read(prev_idx)
            out_vec = store.open_write(out_idx)
            for pdf in batches:
                for _, row in pdf.iterrows():
                    srcs, dsts = _open_block(row["path"])
                    lo = int(row["dst_lo"])
                    hi = hi_of[lo]
                    prev_slice = np.asarray(prev[lo:hi])
                    new_slice = prev_slice.copy()
                    if len(srcs):
                        # self-votes applied algebraically inside
                        # _mode_votes (one per voted dst — identical
                        # winners to the synthetic suffix rows; unvoted
                        # positions keep prev either way)
                        labs = np.asarray(prev)[srcs]
                        uniq, win = _mode_votes(
                            dsts, labs, prev_slice, not baked
                        )
                        new_slice[uniq] = win
                    changed = int(
                        (new_slice != prev_slice).sum()
                    )
                    out_vec[lo:hi] = new_slice
                    yield pd.DataFrame(
                        {"dst_lo": [np.int64(lo)], "changed": [changed]}
                    )
            store.flush(out_vec)

        out = eb.manifest.mapInPandas(
            step, schema="dst_lo long, changed long"
        ).toPandas()
        if set(out["dst_lo"]) != set(hi_of):
            store.cleanup()
            raise RuntimeError("distributed lpa round lost a slice")
        changed = int(out["changed"].sum())
        if durable:
            store.mark_complete(out_idx)
        cur = out_idx
        store.delete_vector(prev_idx)
        if fixed_rounds is None and changed == 0:
            break
    ids_path = os.path.join(eb.spill_dir, "node_ids.npy")
    final_idx = cur

    def emit(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ids = np.load(ids_path, mmap_mode="r")
        lab = store.open_read(final_idx)
        for pdf in batches:
            for _, row in pdf.iterrows():
                lo = int(row["dst_lo"])
                hi = hi_of[lo]
                sl = np.asarray(lab[lo:hi])
                yield pd.DataFrame(
                    {
                        "id": np.asarray(ids[lo:hi]),
                        "label": np.asarray(ids)[sl],
                    }
                )

    from metagraph_spark.state import truncate_lineage

    result = truncate_lineage(
        eb.manifest.mapInPandas(emit, schema="id long, label long")
    )
    store.cleanup()
    return result


def lpa_kernel(
    graph_or_blocks,
    max_rounds: int = 50,
    fixed_rounds: int | None = None,
    spill_dir: str | None = None,
    slice_store=None,
    resume: bool = False,
) -> DataFrame:
    """Deterministic synchronous LPA via CSR blocks. Returns ``(id, label)``
    — exactly ``operators/lpa.py``'s partition AND labels (vote multiset =
    canonical undirected edges both directions + one self-vote; winner =
    max count then min label; stop on no change or ``max_rounds``; the
    capped loop returns the last state rather than raising, matching the
    reference's no-convergence-contract for community detection). A Graph
    argument builds the SHARED :func:`label_blocks` layout (also valid
    for :func:`cc_kernel`); the self-votes are synthesized per block at
    read time, so no second layout pass. Prebuilt blocks may be either
    :func:`label_blocks` or legacy :func:`lpa_vote_blocks`
    (``self_votes_baked`` disambiguates). ``spill_dir`` builds the blocks
    file-backed — the scale layout. File-
    backed blocks run :func:`_distributed_lpa_loop` (labels in the slice
    store, driver O(num_blocks) — no vertex cap below int32 positions, and
    measured 2.4x FASTER than the driver-assembled feed loop at 100M
    edges: 41.7 s vs 102.2 s for 3 rounds — tasks write slices and return
    one scalar instead of shipping per-block winner arrays through Arrow
    every round); the feed loop remains the in-memory-blocks path."""
    if resume and slice_store is None:
        raise ValueError(
            "resume=True requires an injected slice_store (the default "
            "store lives under a fresh uuid dir per call and can never "
            "hold a prior run's vectors)"
        )
    if isinstance(graph_or_blocks, Graph):
        spark = graph_or_blocks.edges.sparkSession
        if slice_store is None and not resume and spill_dir is None:
            # round-6 small-graph route: skip the block-layout Spark jobs
            # entirely — one Arrow collect of the edge pairs, then the
            # whole vote loop on the driver (identical labels; see
            # _driver_graph_arrays / _driver_lpa_loop)
            arrs = _driver_graph_arrays(graph_or_blocks, "canonical_sym")
            if arrs is not None:
                ids, srcs, dsts = arrs
                if len(ids) == 0:
                    return spark.createDataFrame([], "id long, label long")
                return _driver_lpa_loop(
                    spark, len(ids), [(0, srcs, dsts, None)], ids, False,
                    max_rounds, fixed_rounds,
                )
        eb = label_blocks(graph_or_blocks, spill_dir=spill_dir)
        owned = True
    else:
        eb, owned, spark = _resolve_blocks(graph_or_blocks)
    try:
        n = eb.n
        if n == 0:
            return spark.createDataFrame([], "id long, label long")
        file_backed = eb.manifest is not None
        source_df = eb.manifest if file_backed else eb.blocks
        # round-6 size route: small layouts run the whole vote loop on the
        # driver over the block arrays (no per-round Spark job); per-block
        # segmented mode + synthetic self-vote suffix is the identical
        # integer arithmetic, so labels are exactly the distributed
        # loops'. Never when a durable slice-store contract is in play.
        if slice_store is None and not resume:
            from metagraph_spark.operators.kernel import (
                KERNEL_DRIVER_LOOP_MAX_VERTICES,
                driver_block_arrays,
            )

            blks = (
                driver_block_arrays(eb)
                if n <= KERNEL_DRIVER_LOOP_MAX_VERTICES
                else None
            )
            if blks is not None:
                return _driver_lpa_loop(
                    spark, n, blks, eb.node_ids, eb.self_votes_baked,
                    max_rounds, fixed_rounds,
                )
        if file_backed and (eb.spill_dir or slice_store is not None):
            r_df = _distributed_lpa_loop(
                eb, max_rounds, fixed_rounds, slice_store=slice_store,
                resume=resume,
            )
            if r_df is not None:
                return r_df
        publish, release = _vector_feed(spark, eb)
        # labels are POSITIONS: positions are order-isomorphic to sorted
        # ids, so min-label tie-breaks agree with the join path's id-space
        # tie-breaks at every round, and vote counts are label-agnostic
        lab = np.arange(n, dtype=np.int64)
        total = fixed_rounds if fixed_rounds is not None else max_rounds
        for _ in range(total):
            handle = publish(lab)

            baked = eb.self_votes_baked

            def gather(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
                cur = _feed_value(handle)
                for pdf in batches:
                    for _, row in pdf.iterrows():
                        srcs, dsts, _ = _block_arrays(row, file_backed, False)
                        if len(srcs) == 0:
                            continue
                        lo = int(row["dst_lo"])
                        labs = np.asarray(cur)[srcs]
                        # self-votes applied algebraically inside
                        # _mode_votes (identical winners to the old
                        # synthetic suffix rows)
                        uniq, win = _mode_votes(
                            dsts, labs, np.asarray(cur)[lo:], not baked
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
            release(handle)
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
