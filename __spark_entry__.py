"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query (PageRank over the part co-purchase graph
at sf0.001). ``queries()`` — one callable per implemented operator from
SURVEY.md §2 plus the training-data pipeline ops. ``oracle_sql()`` — DuckDB
ANSI-SQL equivalents; iterative operators are oracle-checked EXACTLY by
running both engines for the same fixed number of unrolled
supersteps (identical update rule ⇒ identical output regardless of
convergence). Operators whose semantics are not SQL-expressible
(LSH/minhash internals, converged power iteration, Luby MIS, Boruvka MST,
…) appear in queries() without an oracle entry → rows-only check.

Shared derivations (identical in both engines):
- co-purchase graph: distinct (l_orderkey, l_partkey) self-joined per order
  with ``a < b``; weight = #orders sharing the pair (undirected, canonical).
- event-type adjacency graph: per user_id ordered by (ts, event_id), lag of
  event_type → directed weighted edges over dense_rank'd type ids.
Float outputs are rounded to 6 decimals on BOTH sides before hashing.
"""

from __future__ import annotations

import re
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from metagraph_spark.functions import dedup as mdedup
from metagraph_spark.functions import similarity as msim
from metagraph_spark.functions import text as mtext
from metagraph_spark.graph import Graph, build
from metagraph_spark.operators import utility as mutil
from metagraph_spark.operators.community import (
    louvain_community,
    louvain_community_multilevel,
    modularity,
)
from metagraph_spark.operators.components import (
    connected_components,
    strongly_connected_components,
)
from metagraph_spark.operators.centrality import (
    betweenness_centrality,
    closeness_centrality,
    eigenvector_centrality,
    hits_centrality,
    katz_centrality,
)
from metagraph_spark.operators.kernel import pagerank_kernel
from metagraph_spark.operators.lpa import label_propagation_community
from metagraph_spark.operators.pagerank import pagerank
from metagraph_spark.operators.coloring import greedy_coloring
from metagraph_spark.operators.flow import max_flow, min_cut
from metagraph_spark.operators.subgraph import (
    edge_sampling,
    k_core,
    k_truss,
    maximal_independent_set,
    node_sampling,
    random_walk_sampling,
    totally_induced_edge_sampling,
)
from metagraph_spark.operators.traversal import (
    bellman_ford,
    bfs_tree,
    minimum_spanning_tree,
)
from metagraph_spark.operators.triangles import (
    global_clustering_coefficient,
    triangle_count,
)
from metagraph_spark.sources.io import read_table

DAMPING = 0.85
PR_ITERS = 5
# measured: tolerance-1e-8 pagerank on the sf0.01 co-purchase graph
# converges at superstep 5 (final L1 err 1.896e-5 < N·tol 2e-5)
PR_CONV_ITERS = 5
CC_ROUNDS = 8
LPA_ROUNDS = 4
BFS_DEPTH = 4
BF_ROUNDS = 5


# --------------------------------------------------------------- derivations
def _copurchase_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Undirected canonical part co-purchase edges (src<dst, weight=count)."""
    lp = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    ).distinct()
    a, b = lp.alias("a"), lp.alias("b")
    return (
        a.join(b, "l_orderkey")
        .filter(F.col("a.l_partkey") < F.col("b.l_partkey"))
        .groupBy(
            F.col("a.l_partkey").alias("src"), F.col("b.l_partkey").alias("dst")
        )
        .agg(F.count(F.lit(1)).cast("double").alias("weight"))
    )


def _copurchase_graph(spark: SparkSession, sf_dir: str) -> Graph:
    return build(_copurchase_edges(spark, sf_dir), is_directed=False)


def _event_type_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directed weighted edges between consecutive event types per user;
    node id = dense_rank of event_type (alphabetical)."""
    ev = read_table(spark, sf_dir, "events")
    types = ev.select("event_type").distinct().withColumn(
        "tid", F.dense_rank().over(Window.orderBy("event_type")).cast("long")
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.join(types, "event_type")
        .withColumn("nxt", F.lead("tid").over(w))
        .filter(F.col("nxt").isNotNull())
        .groupBy(F.col("tid").alias("src"), F.col("nxt").alias("dst"))
        .agg(F.count(F.lit(1)).cast("double").alias("weight"))
    )


_SQL_COPURCHASE = """
lp AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
e AS (SELECT a.l_partkey AS src, b.l_partkey AS dst,
             count(*)::double AS weight
      FROM lp a JOIN lp b ON a.l_orderkey = b.l_orderkey
                         AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2),
sym AS (SELECT src, dst, weight FROM e
        UNION ALL SELECT dst, src, weight FROM e),
nodes AS (SELECT DISTINCT src AS id FROM sym)
"""

_SQL_EVENT_TYPE = """
types AS (SELECT event_type, dense_rank() OVER (ORDER BY event_type) AS tid
          FROM (SELECT DISTINCT event_type FROM events)),
seq AS (SELECT t.tid,
               lead(t.tid) OVER (PARTITION BY e.user_id
                                 ORDER BY e.ts, e.event_id) AS nxt
        FROM events e JOIN types t USING (event_type)),
de AS (SELECT tid AS src, nxt AS dst, count(*)::double AS weight
       FROM seq WHERE nxt IS NOT NULL GROUP BY 1, 2),
dnodes AS (SELECT tid AS id FROM types)
"""


def _pagerank_sql(iters: int) -> str:
    """Unrolled PageRank over the symmetrized co-purchase graph (no dangling
    nodes by construction: every node has an out-edge in sym)."""
    ctes = [
        _SQL_COPURCHASE.strip().rstrip(","),
        "nn AS (SELECT count(*)::double AS c FROM nodes)",
        "deg AS (SELECT src AS id, count(*)::double AS outdeg FROM sym GROUP BY 1)",
        "r0 AS (SELECT id, 1.0/(SELECT c FROM nn) AS rank FROM nodes)",
    ]
    for k in range(iters):
        ctes.append(
            f"""r{k + 1} AS (
  SELECT nodes.id,
         (1 - {DAMPING})/(SELECT c FROM nn)
         + {DAMPING} * coalesce(t.g, 0) AS rank
  FROM nodes LEFT JOIN (
    SELECT sym.dst AS id, sum(r{k}.rank / deg.outdeg) AS g
    FROM sym JOIN r{k} ON sym.src = r{k}.id JOIN deg ON sym.src = deg.id
    GROUP BY 1) t ON nodes.id = t.id)"""
        )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"\nSELECT id, round(rank, 6) AS rank FROM r{iters} ORDER BY id"
    )


def _cc_sql(rounds: int) -> str:
    ctes = [
        _SQL_COPURCHASE.strip().rstrip(","),
        "l0 AS (SELECT id, id AS label FROM nodes)",
    ]
    for k in range(rounds):
        ctes.append(
            f"""l{k + 1} AS (
  SELECT l{k}.id, least(l{k}.label, coalesce(t.m, l{k}.label)) AS label
  FROM l{k} LEFT JOIN (
    SELECT sym.dst AS id, min(l{k}.label) AS m
    FROM sym JOIN l{k} ON sym.src = l{k}.id GROUP BY 1) t
  ON l{k}.id = t.id)"""
        )
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT id, label FROM l{rounds} ORDER BY id"
    )


def _lpa_ctes(rounds: int) -> str:
    ctes = [
        _SQL_COPURCHASE.strip().rstrip(","),
        "l0 AS (SELECT id, id AS label FROM nodes)",
    ]
    for k in range(rounds):
        ctes.append(
            f"""v{k + 1} AS (
  SELECT id, label, count(*) AS cnt FROM (
    SELECT sym.dst AS id, l{k}.label FROM sym JOIN l{k} ON sym.src = l{k}.id
    UNION ALL SELECT id, label FROM l{k}) GROUP BY 1, 2),
l{k + 1} AS (
  SELECT id, label FROM (
    SELECT id, label,
           row_number() OVER (PARTITION BY id
                              ORDER BY cnt DESC, label ASC) AS rn
    FROM v{k + 1}) WHERE rn = 1)"""
        )
    return "WITH " + ",\n".join(ctes)


def _lpa_sql(rounds: int) -> str:
    return _lpa_ctes(rounds) + f"\nSELECT id, label FROM l{rounds} ORDER BY id"


def _modularity_sql(rounds: int) -> str:
    """Weighted Newman modularity of the fixed-round LPA partition."""
    return (
        _lpa_ctes(rounds)
        + f"""
, lab AS (SELECT id, label FROM l{rounds}),
ew AS (SELECT e.weight, ls.label AS lsrc, ld.label AS ldst
       FROM e JOIN lab ls ON e.src = ls.id JOIN lab ld ON e.dst = ld.id),
mm AS (SELECT sum(weight)::double AS m FROM e),
ein AS (SELECT lsrc AS label, sum(weight) AS win FROM ew
        WHERE lsrc = ldst GROUP BY 1),
degc AS (SELECT label, sum(w) AS dc FROM (
    SELECT lsrc AS label, weight AS w FROM ew
    UNION ALL SELECT ldst AS label, weight AS w FROM ew) GROUP BY 1)
SELECT round(sum(coalesce(win, 0) / (SELECT m FROM mm)
             - dc * dc / (4 * (SELECT m FROM mm) * (SELECT m FROM mm))), 6)
       AS modularity
FROM degc LEFT JOIN ein USING (label)"""
    )


LPA_CONV_UNROLL = 8  # LPA partition is stable from round 5 at sf0.01


def _louvain_sql() -> str:
    """Replica of louvain_community: converged LPA (unrolled past the
    measured stability round) + ONE synchronous greedy modularity sweep;
    the higher-modularity partition of (seed, refined) is returned. All
    gain arithmetic is exact (integer-valued weights summed below 2^53),
    so the argmax/tie-break replays identically across engines."""
    return (
        _lpa_ctes(LPA_CONV_UNROLL)
        + f"""
, lab AS (SELECT id, label FROM l{LPA_CONV_UNROLL}),
symw AS (SELECT src, dst, weight FROM e
         UNION ALL SELECT dst, src, weight FROM e WHERE src <> dst),
mm AS (SELECT sum(weight) / 2.0 AS m FROM symw),
nd AS (SELECT src AS id, sum(weight) AS kv FROM symw GROUP BY 1),
cd AS (SELECT lab.label, sum(nd.kv) AS kc
       FROM nd JOIN lab ON nd.id = lab.id GROUP BY 1),
wnc AS (SELECT s.src AS id, lab.label, sum(s.weight) AS w
        FROM symw s JOIN lab ON s.dst = lab.id
        WHERE s.src <> s.dst GROUP BY 1, 2),
owng AS (SELECT lab.id,
                coalesce(w.w, 0) - nd.kv * (cd.kc - nd.kv)
                                   / (2 * (SELECT m FROM mm)) AS g
         FROM lab JOIN nd ON lab.id = nd.id
         JOIN cd ON lab.label = cd.label
         LEFT JOIN wnc w ON w.id = lab.id AND w.label = lab.label),
cand AS (SELECT w.id, w.label,
                w.w - nd.kv * cd.kc / (2 * (SELECT m FROM mm)) AS gain
         FROM wnc w JOIN nd ON w.id = nd.id JOIN cd ON w.label = cd.label
         JOIN lab ON w.id = lab.id
         WHERE w.label <> lab.label),
best AS (SELECT id, label AS new_label, gain FROM (
           SELECT id, label, gain,
                  row_number() OVER (PARTITION BY id
                                     ORDER BY gain DESC, label ASC) AS rn
           FROM cand) WHERE rn = 1),
refined AS (SELECT lab.id,
                   CASE WHEN b.gain > og.g THEN b.new_label
                        ELSE lab.label END AS label
            FROM lab LEFT JOIN best b ON lab.id = b.id
            JOIN owng og ON lab.id = og.id),
m2 AS (SELECT sum(weight) AS m FROM e),
q1 AS (SELECT sum(coalesce(win, 0) / (SELECT m FROM m2)
              - dc * dc / (4 * (SELECT m FROM m2) * (SELECT m FROM m2))) AS q
       FROM (SELECT lt.label, sum(w) AS dc FROM (
               SELECT ls.label AS label, e.weight AS w
               FROM e JOIN lab ls ON e.src = ls.id
               UNION ALL
               SELECT ld.label, e.weight
               FROM e JOIN lab ld ON e.dst = ld.id) lt GROUP BY 1) d
       LEFT JOIN (SELECT ls.label, sum(e.weight) AS win
                  FROM e JOIN lab ls ON e.src = ls.id
                  JOIN lab ld ON e.dst = ld.id
                  WHERE ls.label = ld.label GROUP BY 1) i
       USING (label)),
q2 AS (SELECT sum(coalesce(win, 0) / (SELECT m FROM m2)
              - dc * dc / (4 * (SELECT m FROM m2) * (SELECT m FROM m2))) AS q
       FROM (SELECT lt.label, sum(w) AS dc FROM (
               SELECT ls.label AS label, e.weight AS w
               FROM e JOIN refined ls ON e.src = ls.id
               UNION ALL
               SELECT ld.label, e.weight
               FROM e JOIN refined ld ON e.dst = ld.id) lt GROUP BY 1) d
       LEFT JOIN (SELECT ls.label, sum(e.weight) AS win
                  FROM e JOIN refined ls ON e.src = ls.id
                  JOIN refined ld ON e.dst = ld.id
                  WHERE ls.label = ld.label GROUP BY 1) i
       USING (label))
SELECT lab.id,
       CASE WHEN (SELECT q FROM q2) > (SELECT q FROM q1)
            THEN r.label ELSE lab.label END AS label
FROM lab JOIN refined r ON lab.id = r.id
ORDER BY lab.id"""
    )


def _ml_sweep_ctes(inl: str, out: str, direction: int) -> list[str]:
    """One direction-gated Louvain sweep as CTEs: community degrees and
    node→community weights recomputed against ``inl``'s labels, corrected
    move gain (own community's mass excludes the mover), direction filter,
    argmax with (gain desc, label asc) tie-break. Shares ``symw``/``nd``/
    ``mm`` (label-independent)."""
    d_filter = "w.label <= lab.label" if direction == 0 else "w.label >= lab.label"
    return [
        f"""cd_{out} AS (SELECT l.label, sum(nd.kv) AS kc
  FROM nd JOIN {inl} l ON nd.id = l.id GROUP BY 1)""",
        f"""wnc_{out} AS (SELECT s.src AS id, l.label, sum(s.weight) AS w
  FROM symw s JOIN {inl} l ON s.dst = l.id
  WHERE s.src <> s.dst GROUP BY 1, 2)""",
        f"""owng_{out} AS (SELECT l.id,
       coalesce(w.w, 0) - nd.kv * (cd.kc - nd.kv)
                          / (2 * (SELECT m FROM mm)) AS g
  FROM {inl} l JOIN nd ON l.id = nd.id
  JOIN cd_{out} cd ON l.label = cd.label
  LEFT JOIN wnc_{out} w ON w.id = l.id AND w.label = l.label)""",
        f"""cand_{out} AS (SELECT w.id, w.label,
       w.w - nd.kv * cd.kc / (2 * (SELECT m FROM mm)) AS gain
  FROM wnc_{out} w JOIN nd ON w.id = nd.id
  JOIN cd_{out} cd ON w.label = cd.label
  JOIN {inl} lab ON w.id = lab.id
  WHERE w.label <> lab.label AND {d_filter})""",
        f"""best_{out} AS (SELECT id, label AS new_label, gain FROM (
  SELECT id, label, gain,
         row_number() OVER (PARTITION BY id
                            ORDER BY gain DESC, label ASC) AS rn
  FROM cand_{out}) WHERE rn = 1)""",
        f"""{out} AS (SELECT l.id,
       CASE WHEN b.gain > og.g THEN b.new_label ELSE l.label END AS label
  FROM {inl} l LEFT JOIN best_{out} b ON l.id = b.id
  JOIN owng_{out} og ON l.id = og.id)""",
    ]


def _ml_q_cte(lab: str) -> str:
    """Weighted Newman modularity of the ``lab`` partition as a 1-row CTE
    ``q_{lab}`` (same arithmetic as ``operators.community.modularity``)."""
    return f"""q_{lab} AS (
  SELECT sum(coalesce(win, 0) / (SELECT m2.m FROM m2)
         - dc * dc / (4 * (SELECT m2.m FROM m2) * (SELECT m2.m FROM m2))) AS q
  FROM (SELECT lt.label, sum(w) AS dc FROM (
          SELECT ls.label AS label, e.weight AS w
          FROM e JOIN {lab} ls ON e.src = ls.id
          UNION ALL
          SELECT ld.label, e.weight
          FROM e JOIN {lab} ld ON e.dst = ld.id) lt GROUP BY 1) d
  LEFT JOIN (SELECT ls.label, sum(e.weight) AS win
             FROM e JOIN {lab} ls ON e.src = ls.id
             JOIN {lab} ld ON e.dst = ld.id
             WHERE ls.label = ld.label GROUP BY 1) i USING (label))"""


def _louvain_ml_sql(min_gain: float = 1e-6) -> str:
    """Replica of ``louvain_community_multilevel(max_levels=1,
    max_sweeps_per_level=2)`` on the co-purchase graph — the fixed-unroll
    driver contract for the multi-level operator: phase 1 = sweep(dir 0)
    then sweep(dir 1) from singletons, the LAST sweep's labeling is the
    phase result (the operator judges per-sweep convergence on observed
    move metrics and evaluates exact modularity only on phase exit);
    accept the level only if the phase result beats the singleton
    partition by ``min_gain``; refinement = the same two sweeps from the
    accepted labels, adopted if strictly better. All move/selection
    arithmetic is exact-integer-weight double math, so the replay is
    deterministic across engines; selection thresholds (1e-12
    improvement, min_gain) mirror the operator's constants."""
    ctes = [
        _SQL_COPURCHASE.strip().rstrip(","),
        "symw AS (SELECT src, dst, weight FROM e"
        " UNION ALL SELECT dst, src, weight FROM e)",
        "mm AS (SELECT sum(weight) / 2.0 AS m FROM symw)",
        "m2 AS (SELECT sum(weight) AS m FROM e)",
        "nd AS (SELECT src AS id, sum(weight) AS kv FROM symw GROUP BY 1)",
        "l0 AS (SELECT id, id AS label FROM nodes)",
        _ml_q_cte("l0"),
    ]
    ctes += _ml_sweep_ctes("l0", "s1", 0)
    ctes += _ml_sweep_ctes("s1", "s2", 1)
    ctes.append(_ml_q_cte("s2"))
    ctes.append(
        f"""mid AS (SELECT l0.id,
  CASE WHEN (SELECT q FROM q_s2) > (SELECT q FROM q_l0) + {min_gain!r}
       THEN s2.label ELSE l0.label END AS label
  FROM l0 JOIN s2 ON l0.id = s2.id)"""
    )
    ctes.append(
        f"""midq AS (SELECT
  CASE WHEN (SELECT q FROM q_s2) > (SELECT q FROM q_l0) + {min_gain!r}
       THEN (SELECT q FROM q_s2) ELSE (SELECT q FROM q_l0) END AS q)"""
    )
    ctes += _ml_sweep_ctes("mid", "r1", 0)
    ctes += _ml_sweep_ctes("r1", "r2", 1)
    ctes.append(_ml_q_cte("r2"))
    return (
        "WITH " + ",\n".join(ctes)
        + """
SELECT mid.id,
       CASE WHEN (SELECT q FROM q_r2) > (SELECT q FROM midq) + 1e-12
            THEN r2.label ELSE mid.label END AS label
FROM mid JOIN r2 ON mid.id = r2.id
ORDER BY mid.id"""
    )


def _bfs_sql(depth: int) -> str:
    ctes = [
        _SQL_COPURCHASE.strip().rstrip(","),
        "s AS (SELECT min(id) AS sid FROM nodes)",
        "d0 AS (SELECT sid AS id, 0 AS depth FROM s)",
    ]
    for k in range(depth):
        ctes.append(
            f"""d{k + 1} AS (
  SELECT id, min(depth) AS depth FROM (
    SELECT id, depth FROM d{k}
    UNION ALL
    SELECT sym.dst AS id, d{k}.depth + 1 AS depth
    FROM sym JOIN d{k} ON sym.src = d{k}.id) GROUP BY 1)"""
        )
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT id, depth FROM d{depth} ORDER BY id"
    )


def _bellman_ford_sql(rounds: int) -> str:
    """Fixed-round relaxation distances on the DIRECTED event-type graph,
    source = min node id; weight of an edge = 1/weight (rarer transition =
    longer) to make distances non-trivial."""
    ctes = [
        _SQL_EVENT_TYPE.strip().rstrip(","),
        "src0 AS (SELECT min(id) AS sid FROM dnodes)",
        "t0 AS (SELECT sid AS id, 0.0::double AS dist FROM src0)",
    ]
    for k in range(rounds):
        ctes.append(
            f"""t{k + 1} AS (
  SELECT id, min(dist) AS dist FROM (
    SELECT id, dist FROM t{k}
    UNION ALL
    SELECT de.dst AS id, t{k}.dist + 1.0/de.weight AS dist
    FROM de JOIN t{k} ON de.src = t{k}.id) GROUP BY 1)"""
        )
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT id, round(dist, 6) AS dist FROM t{rounds} ORDER BY id"
    )


# ------------------------------------------------- fixed-round Spark runners
def _bfs_depths_fixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Depth-limited BFS min-depth map matching _bfs_sql exactly."""
    g = _copurchase_graph(spark, sf_dir)
    src = g.node_ids().agg(F.min("id")).collect()[0][0]
    depths, _ = bfs_tree(g, src, depth_limit=BFS_DEPTH)
    return depths.select("id", "depth").orderBy("id")


def _bf_fixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _event_type_edges(spark, sf_dir).select(
        "src", "dst", (F.lit(1.0) / F.col("weight")).alias("weight")
    )
    g = build(e, is_directed=True)
    src = g.node_ids().agg(F.min("id")).collect()[0][0]
    _, dists = bellman_ford(g, src, max_rounds=BF_ROUNDS + 1)
    return dists.select("id", F.round("dist", 6).alias("dist")).orderBy("id")


# ----------------------------------------------------- cross-engine hashing
_P31 = 2147483647


def _mix31_sql(x: str, seed: int) -> str:
    """DuckDB twin of ``operators.subgraph.mix31`` (bit-identical)."""
    h1 = f"((({x}) % {_P31}) * 2654435761 + {seed}) % {_P31}"
    h2 = f"(xor(({h1}), ({h1}) >> 15) * 1597334677) % {_P31}"
    return f"xor(({h2}), ({h2}) >> 13)"


def _bernoulli31_sql(key: str, p: float, seed: int, salt: int) -> str:
    h = _mix31_sql(key, seed + salt)
    return f"((({h}) % 1000000) + 0.5) / 1000000.0 < {p}"


# ----------------------------------------------- more unrolled graph oracles
KATZ_ITERS = 8
EIG_ITERS = 8
HITS_ITERS = 8
CLOSENESS_UNROLL = 8  # fixpoint at sf0.01 is 4 rounds; margin 2x
KCORE_UNROLL = 3  # fixpoint at sf0.01 is 1 round
CC_CONV_UNROLL = 8  # fixpoint at sf0.01 is 3 rounds
MIS_UNROLL = 10  # Luby finishes in 6 rounds at sf0.01; extras are no-ops
MIS_SEED = 42
TIES_P = 0.3
TIES_SEED = 42


def _katz_sql(iters: int, alpha: float, beta: float) -> str:
    """Unrolled weighted Katz on the symmetrized co-purchase graph:
    x0=0; x' = α·(Σ_in w·x) + β; final L2 normalization."""
    ctes = [
        _SQL_COPURCHASE.strip().rstrip(","),
        "x0 AS (SELECT id, 0.0::double AS v FROM nodes)",
    ]
    for k in range(iters):
        ctes.append(
            f"""x{k + 1} AS (
  SELECT nodes.id, {alpha} * coalesce(t.g, 0) + {beta} AS v
  FROM nodes LEFT JOIN (
    SELECT sym.dst AS id, sum(sym.weight * x{k}.v) AS g
    FROM sym JOIN x{k} ON sym.src = x{k}.id GROUP BY 1) t
  ON nodes.id = t.id)"""
        )
    return (
        "WITH " + ",\n".join(ctes)
        + f"""
SELECT id, round(v / sqrt((SELECT sum(v * v) FROM x{iters})), 6) AS katz
FROM x{iters} ORDER BY id"""
    )


def _eig_sql(iters: int) -> str:
    """Unrolled eigenvector: y0=1/n; z = y + Σ_in w·y; y' = z/‖z‖₂."""
    ctes = [
        _SQL_COPURCHASE.strip().rstrip(","),
        "nn AS (SELECT count(*)::double AS c FROM nodes)",
        "y0 AS (SELECT id, 1.0/(SELECT c FROM nn) AS v FROM nodes)",
    ]
    for k in range(iters):
        ctes.append(
            f"""z{k + 1} AS (
  SELECT nodes.id, y{k}.v + coalesce(t.g, 0) AS v
  FROM nodes JOIN y{k} ON nodes.id = y{k}.id LEFT JOIN (
    SELECT sym.dst AS id, sum(sym.weight * y{k}.v) AS g
    FROM sym JOIN y{k} ON sym.src = y{k}.id GROUP BY 1) t
  ON nodes.id = t.id),
y{k + 1} AS (
  SELECT id, v / sqrt((SELECT sum(v * v) FROM z{k + 1})) AS v FROM z{k + 1})"""
        )
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT id, round(v, 6) AS eigenvector FROM y{iters} ORDER BY id"
    )


def _hits_sql(iters: int) -> str:
    """Unrolled HITS on the directed event-type graph; outputs authorities
    (max-normalized per iteration, sum-normalized at the end)."""
    ctes = [
        _SQL_EVENT_TYPE.strip().rstrip(","),
        "nn AS (SELECT count(*)::double AS c FROM dnodes)",
        "h0 AS (SELECT id, 1.0/(SELECT c FROM nn) AS v FROM dnodes)",
    ]
    for k in range(iters):
        ctes.append(
            f"""ar{k + 1} AS (
  SELECT dnodes.id, coalesce(t.g, 0.0) AS v
  FROM dnodes LEFT JOIN (
    SELECT de.dst AS id, sum(de.weight * h{k}.v) AS g
    FROM de JOIN h{k} ON de.src = h{k}.id GROUP BY 1) t
  ON dnodes.id = t.id),
an{k + 1} AS (
  SELECT id, v / (CASE WHEN (SELECT max(v) FROM ar{k + 1}) IS NULL
                        OR (SELECT max(v) FROM ar{k + 1}) = 0
                  THEN 1.0 ELSE (SELECT max(v) FROM ar{k + 1}) END) AS v
  FROM ar{k + 1}),
hr{k + 1} AS (
  SELECT dnodes.id, coalesce(t.g, 0.0) AS v
  FROM dnodes LEFT JOIN (
    SELECT de.src AS id, sum(de.weight * an{k + 1}.v) AS g
    FROM de JOIN an{k + 1} ON de.dst = an{k + 1}.id GROUP BY 1) t
  ON dnodes.id = t.id),
h{k + 1} AS (
  SELECT id, v / (CASE WHEN (SELECT max(v) FROM hr{k + 1}) IS NULL
                        OR (SELECT max(v) FROM hr{k + 1}) = 0
                  THEN 1.0 ELSE (SELECT max(v) FROM hr{k + 1}) END) AS v
  FROM hr{k + 1})"""
        )
    return (
        "WITH " + ",\n".join(ctes)
        + f"""
SELECT id, round(v / (SELECT sum(v) FROM an{iters}), 6) AS authority
FROM an{iters} ORDER BY id"""
    )


def _closeness_sql(rounds: int, n_sources: int) -> str:
    """Multi-source weighted relaxation to fixpoint (unrolled with margin)
    over REVERSED symmetrized edges (= same edges: undirected), then the
    wf-improved closeness formula."""
    ctes = [
        _SQL_COPURCHASE.strip().rstrip(","),
        "nn AS (SELECT count(*)::double AS c FROM nodes)",
        f"srcs AS (SELECT id FROM nodes ORDER BY id LIMIT {n_sources})",
        "t0 AS (SELECT id AS root, id, 0.0::double AS dist FROM srcs)",
    ]
    for k in range(rounds):
        ctes.append(
            f"""t{k + 1} AS (
  SELECT root, id, min(dist) AS dist FROM (
    SELECT root, id, dist FROM t{k}
    UNION ALL
    SELECT t{k}.root, sym.dst AS id, t{k}.dist + sym.weight AS dist
    FROM sym JOIN t{k} ON sym.src = t{k}.id) GROUP BY 1, 2)"""
        )
    return (
        "WITH " + ",\n".join(ctes)
        + f"""
, agg AS (SELECT root, sum(dist) AS total, count(*) AS r
          FROM t{rounds} GROUP BY 1)
SELECT root AS id,
       round(CASE WHEN r > 1 AND total > 0
                  THEN (r - 1) * (r - 1)
                       / (((SELECT c FROM nn) - 1) * total)
                  ELSE 0.0 END, 6) AS closeness
FROM agg ORDER BY id"""
    )


def _kcore_sql(k_deg: int, rounds: int) -> str:
    """Unrolled degree-peel (fixpoint + margin); edges are already canonical
    (src<dst) so degree = count over both endpoint roles."""
    ctes = [
        _SQL_COPURCHASE.strip().rstrip(","),
        "ke0 AS (SELECT src, dst, weight FROM e)",
    ]
    for r in range(rounds):
        ctes.append(
            f"""kd{r} AS (
  SELECT id, count(*) AS d FROM (
    SELECT src AS id FROM ke{r} UNION ALL SELECT dst FROM ke{r}) GROUP BY 1),
ke{r + 1} AS (
  SELECT src, dst, weight FROM ke{r}
  WHERE src IN (SELECT id FROM kd{r} WHERE d >= {k_deg})
    AND dst IN (SELECT id FROM kd{r} WHERE d >= {k_deg}))"""
        )
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT src, dst, weight FROM ke{rounds} ORDER BY src, dst"
    )


def _scc_sql() -> str:
    """SCC labels via recursive transitive closure on the (tiny) event-type
    graph: label(v) = min{u : v→*u and u→*v} ∪ {v} — identical to the
    FW-BW peeling labels (min SCC member)."""
    return (
        "WITH RECURSIVE "
        + _SQL_EVENT_TYPE.strip().rstrip(",")
        + """
, reach(a, b) AS (
    SELECT src, dst FROM de
    UNION
    SELECT r.a, d.dst FROM reach r JOIN de d ON r.b = d.src),
mutual AS (
    SELECT r1.a AS v, r1.b AS u
    FROM reach r1 JOIN reach r2 ON r1.a = r2.b AND r1.b = r2.a)
SELECT n.id, least(n.id, coalesce(min(m.u), n.id)) AS label
FROM dnodes n LEFT JOIN mutual m ON n.id = m.v
GROUP BY n.id ORDER BY n.id"""
    )


def _mis_sql(rounds: int, seed: int) -> str:
    """Unrolled Luby MIS with mix31 priorities — replays the Spark rounds
    exactly (beaten = any neighbor with higher (priority, id))."""
    ctes = [
        _SQL_COPURCHASE.strip().rstrip(","),
        "rem0 AS (SELECT id FROM nodes)",
        "sym0 AS (SELECT src, dst FROM sym)",
    ]
    for r in range(rounds):
        prio = _mix31_sql("id", seed + r)
        ctes.append(
            f"""c{r} AS (SELECT id, {prio} AS p FROM rem{r}),
b{r} AS (
  SELECT DISTINCT s.src AS id
  FROM sym{r} s JOIN c{r} cs ON s.src = cs.id JOIN c{r} cd ON s.dst = cd.id
  WHERE cd.p > cs.p OR (cd.p = cs.p AND s.dst > s.src)),
w{r} AS (SELECT id FROM c{r} WHERE id NOT IN (SELECT id FROM b{r})),
nb{r} AS (SELECT DISTINCT s.dst AS id
          FROM sym{r} s JOIN w{r} w ON s.src = w.id),
rem{r + 1} AS (
  SELECT id FROM rem{r}
  WHERE id NOT IN (SELECT id FROM w{r})
    AND id NOT IN (SELECT id FROM nb{r})),
sym{r + 1} AS (
  SELECT src, dst FROM sym{r}
  WHERE src IN (SELECT id FROM rem{r + 1})
    AND dst IN (SELECT id FROM rem{r + 1}))"""
        )
    union = " UNION ALL ".join(f"SELECT id FROM w{r}" for r in range(rounds))
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT id FROM ({union}) ORDER BY id"
    )


KTRUSS_UNROLL = 4  # fixpoint at sf0.01 is 2 rounds
SAMPLE_P = 0.3
SAMPLE_SEED = 42


def _ktruss_sql(k: int, rounds: int) -> str:
    """Unrolled triangle-support peel (fixpoint + margin) on the canonical
    co-purchase edges; keeps edges in ≥ k-2 triangles within the truss."""
    need = k - 2
    ctes = [
        _SQL_COPURCHASE.strip().rstrip(","),
        "kt0 AS (SELECT src, dst FROM e)",
    ]
    for r in range(rounds):
        ctes.append(
            f"""tri{r} AS (
  SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
  FROM kt{r} e1 JOIN kt{r} e2 ON e1.dst = e2.src
  JOIN kt{r} e3 ON e3.src = e1.src AND e3.dst = e2.dst),
sup{r} AS (
  SELECT src, dst, count(*) AS s FROM (
    SELECT a AS src, b AS dst FROM tri{r}
    UNION ALL SELECT a, c FROM tri{r}
    UNION ALL SELECT b, c FROM tri{r}) GROUP BY 1, 2),
kt{r + 1} AS (
  SELECT k.src, k.dst FROM kt{r} k
  JOIN sup{r} s ON k.src = s.src AND k.dst = s.dst
  WHERE s.s >= {need})"""
        )
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT src, dst FROM kt{rounds} ORDER BY src, dst"
    )


def _node_sample_sql(p: float, seed: int) -> str:
    keep = _bernoulli31_sql("id", p, seed, 101)
    return (
        "WITH "
        + _SQL_COPURCHASE.strip().rstrip(",")
        + f"""
, ns AS (SELECT id FROM nodes WHERE {keep})
SELECT src, dst, weight FROM e
WHERE src IN (SELECT id FROM ns) AND dst IN (SELECT id FROM ns)
ORDER BY src, dst"""
    )


def _edge_sample_sql(p: float, seed: int) -> str:
    key = f"((src % {_P31}) * 8191 + (dst % {_P31})) % {_P31}"
    keep = _bernoulli31_sql(key, p, seed, 202)
    return (
        "WITH "
        + _SQL_COPURCHASE.strip().rstrip(",")
        + f"\nSELECT src, dst, weight FROM e WHERE {keep} ORDER BY src, dst"
    )


def _ties_sql(p: float, seed: int) -> str:
    """TIES sample: mix31-Bernoulli edge pick, then totally induced."""
    key = f"((src % {_P31}) * 8191 + (dst % {_P31})) % {_P31}"
    keep = _bernoulli31_sql(key, p, seed, 303)
    return (
        "WITH "
        + _SQL_COPURCHASE.strip().rstrip(",")
        + f"""
, picked AS (SELECT src, dst FROM e WHERE {keep}),
ns AS (SELECT DISTINCT id FROM (
    SELECT src AS id FROM picked UNION ALL SELECT dst FROM picked))
SELECT src, dst, weight FROM e
WHERE src IN (SELECT id FROM ns) AND dst IN (SELECT id FROM ns)
ORDER BY src, dst"""
    )


# ---------------------------------------------- coloring / walks / apsp sql
COLORING_UNROLL = 10  # speculative coloring: 6 rounds at sf0.01 + margin
COLORING_SEED = 42
RW_WALKS = 8
RW_STEPS = 10
RW_JUMP = 0.15
RW_SEED = 42
APSP_SOURCES = 5
APSP_UNROLL = 8


def _coloring_sql(rounds: int, seed: int) -> str:
    """Unrolled speculative coloring on the weight>=2 co-purchase subgraph
    (sparse: Δ=13 at sf0.01) — replays operators/coloring.py exactly."""
    ctes = [
        _SQL_COPURCHASE.strip().rstrip(","),
        "se AS (SELECT src, dst FROM e WHERE weight >= 2)",
        "ssym AS (SELECT src, dst FROM se UNION ALL SELECT dst, src FROM se)",
        "snodes AS (SELECT DISTINCT src AS id FROM ssym)",
        "col0 AS (SELECT id, 0::BIGINT AS color FROM snodes WHERE false)",
        "unc0 AS (SELECT id FROM snodes)",
    ]
    for r in range(rounds):
        pa = _mix31_sql("s.src", seed + r)
        pb = _mix31_sql("s.dst", seed + r)
        ctes.append(
            f"""used{r} AS (
  SELECT u.id, list(DISTINCT c.color) AS cols
  FROM unc{r} u JOIN ssym s ON s.src = u.id JOIN col{r} c ON s.dst = c.id
  GROUP BY u.id),
tent{r} AS (
  SELECT u.id,
         coalesce((SELECT min(i) FROM unnest(range(len(uu.cols) + 1)) AS t(i)
                   WHERE NOT list_contains(uu.cols, i)), 0)::BIGINT AS color
  FROM unc{r} u LEFT JOIN used{r} uu ON u.id = uu.id),
win{r} AS (
  SELECT t.id, t.color FROM tent{r} t
  WHERE NOT EXISTS (
    SELECT 1 FROM ssym s JOIN tent{r} t2 ON s.dst = t2.id
    WHERE s.src = t.id AND t2.color = t.color
      AND (({pb}) > ({pa}) OR (({pb}) = ({pa}) AND s.dst > s.src)))),
col{r + 1} AS (SELECT id, color FROM col{r} UNION ALL SELECT id, color FROM win{r}),
unc{r + 1} AS (SELECT id FROM unc{r} WHERE id NOT IN (SELECT id FROM win{r}))"""
        )
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT id, color FROM col{rounds} ORDER BY id"
    )


def _rw_sql(
    num_walks: int, num_steps: int, p: float, seed: int
) -> str:
    """Unrolled parallel random walks on the directed event-type graph,
    start = min node id — replays subgraph.random_walk_sampling exactly."""
    ctes = [
        _SQL_EVENT_TYPE.strip().rstrip(","),
        "st AS (SELECT min(id) AS v FROM dnodes)",
        """ie AS (SELECT src, dst,
                  row_number() OVER (PARTITION BY src ORDER BY dst) AS rn
           FROM (SELECT DISTINCT src, dst FROM de))""",
        "degt AS (SELECT src AS cur, max(rn) AS outdeg FROM ie GROUP BY 1)",
        f"""s0 AS (SELECT unnest(range({num_walks})) AS walk_id,
                  (SELECT v FROM st) AS cur)""",
    ]
    for k in range(num_steps):
        jkey = (
            f"(((w.walk_id * {num_steps} + {k}) % {_P31}) * 8191 "
            f"+ (w.cur % {_P31})) % {_P31}"
        )
        ikey = (
            f"(((w.walk_id * {num_steps} + {k + 7919}) % {_P31}) * 8191 "
            f"+ (w.cur % {_P31})) % {_P31}"
        )
        jump = (
            f"((({_mix31_sql(jkey, seed + 505)}) % 1000000) + 0.5)"
            f" / 1000000.0 < {p}"
        )
        idx = (
            f"({_mix31_sql(ikey, seed + 606)})"
            f" % greatest(coalesce(d.outdeg, 1), 1)"
        )
        ctes.append(
            f"""dec{k} AS (
  SELECT w.walk_id, w.cur, d.outdeg, ({jump}) AS jmp, ({idx}) AS idx
  FROM s{k} w LEFT JOIN degt d ON w.cur = d.cur),
mv{k} AS (
  SELECT t.walk_id, t.cur AS src, ie.dst
  FROM dec{k} t JOIN ie ON t.cur = ie.src AND ie.rn = t.idx + 1
  WHERE NOT t.jmp AND t.outdeg IS NOT NULL),
s{k + 1} AS (
  SELECT walk_id, dst AS cur FROM mv{k}
  UNION ALL
  SELECT walk_id, (SELECT v FROM st) AS cur FROM dec{k}
  WHERE jmp OR outdeg IS NULL)"""
        )
    union = "\nUNION ALL\n".join(
        f"SELECT walk_id, {k} AS step, src, dst FROM mv{k}"
        for k in range(num_steps)
    )
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT * FROM ({union}) ORDER BY walk_id, step"
    )


def _apsp_sql(rounds: int, n_sources: int) -> str:
    """Bounded-source APSP distances on the weighted co-purchase graph."""
    ctes = [
        _SQL_COPURCHASE.strip().rstrip(","),
        f"srcs AS (SELECT id FROM nodes ORDER BY id LIMIT {n_sources})",
        "a0 AS (SELECT id AS root, id, 0.0::double AS dist FROM srcs)",
    ]
    for k in range(rounds):
        ctes.append(
            f"""a{k + 1} AS (
  SELECT root, id, min(dist) AS dist FROM (
    SELECT root, id, dist FROM a{k}
    UNION ALL
    SELECT a{k}.root, sym.dst AS id, a{k}.dist + sym.weight AS dist
    FROM sym JOIN a{k} ON sym.src = a{k}.id) GROUP BY 1, 2)"""
        )
    return (
        "WITH " + ",\n".join(ctes)
        + f"""
SELECT root AS src, id AS dst, round(dist, 6) AS dist
FROM a{rounds} ORDER BY src, dst"""
    )


def _maxflow_value_sql() -> str:
    """Max-flow value on the event-type graph via min-cut enumeration
    (max-flow = min-cut duality; the node count is tiny, masks ≤ 2^n)."""
    return (
        "WITH " + _SQL_EVENT_TYPE.strip().rstrip(",")
        + """
, sdef AS (SELECT min(id) AS s, max(id) AS t FROM dnodes),
others AS (SELECT id, row_number() OVER (ORDER BY id) - 1 AS pos
           FROM dnodes WHERE id <> (SELECT s FROM sdef)
                         AND id <> (SELECT t FROM sdef)),
masks AS (SELECT unnest(range(1 << (SELECT count(*) FROM others)::INT)) AS m),
member AS (SELECT m.m, o.id FROM masks m
           JOIN others o ON ((m.m >> o.pos::INT) & 1) = 1
           UNION ALL SELECT m.m, (SELECT s FROM sdef) FROM masks m),
cutv AS (SELECT m.m, coalesce(sum(d.weight), 0.0) AS cv
         FROM masks m LEFT JOIN (
           SELECT mem.m, d.weight
           FROM de d JOIN member mem ON d.src = mem.id
           WHERE NOT EXISTS (SELECT 1 FROM member m2
                             WHERE m2.m = mem.m AND m2.id = d.dst)
         ) d ON d.m = m.m
         GROUP BY m.m)
SELECT round(min(cv), 6) AS flow FROM cutv"""
    )


def _mincut_edges_sql() -> str:
    """Exact replica of ``min_cut``'s canonical cut on the event-type graph.

    Enumerates every s-side subset (node count tiny, masks ≤ 2^n — same
    enumeration as ``_maxflow_value_sql``), keeps the subsets achieving the
    minimum cut value, and INTERSECTS their member sets. Min-cut source
    sides are closed under intersection (submodularity), and the minimal
    source side is exactly the residual-reachable set Edmonds–Karp emits
    (``operators/flow.py:min_cut``), so the intersection reproduces the
    engine's canonical cut edge-for-edge. Weights are integer-valued
    doubles, so the ``cv = min(cv)`` equality is exact."""
    return (
        "WITH " + _SQL_EVENT_TYPE.strip().rstrip(",")
        + """
, sdef AS (SELECT min(id) AS s, max(id) AS t FROM dnodes),
others AS (SELECT id, row_number() OVER (ORDER BY id) - 1 AS pos
           FROM dnodes WHERE id <> (SELECT s FROM sdef)
                         AND id <> (SELECT t FROM sdef)),
masks AS (SELECT unnest(range(1 << (SELECT count(*) FROM others)::INT)) AS m),
member AS (SELECT m.m, o.id FROM masks m
           JOIN others o ON ((m.m >> o.pos::INT) & 1) = 1
           UNION ALL SELECT m.m, (SELECT s FROM sdef) FROM masks m),
cutv AS (SELECT m.m, coalesce(sum(d.weight), 0.0) AS cv
         FROM masks m LEFT JOIN (
           SELECT mem.m, d.weight
           FROM de d JOIN member mem ON d.src = mem.id
           WHERE NOT EXISTS (SELECT 1 FROM member m2
                             WHERE m2.m = mem.m AND m2.id = d.dst)
         ) d ON d.m = m.m
         GROUP BY m.m),
winners AS (SELECT m FROM cutv WHERE cv = (SELECT min(cv) FROM cutv)),
sstar AS (SELECT mem.id FROM member mem JOIN winners w ON mem.m = w.m
          GROUP BY mem.id
          HAVING count(*) = (SELECT count(*) FROM winners))
SELECT d.src, d.dst, d.weight FROM de d
WHERE d.src IN (SELECT id FROM sstar)
  AND d.dst NOT IN (SELECT id FROM sstar)
ORDER BY d.src, d.dst"""
    )


MST_MIN_WEIGHT = 2  # mst query runs on the weight>=2 co-purchase subgraph
MST_MAX_W = 6       # unroll thresholds 1..MST_MAX_W (max observed weight 5)
MST_CC_ROUNDS = 12  # pointer-jumped hash-min; converged at 10 on every sf


def _mst_hist_sql(
    rounds: int = MST_CC_ROUNDS,
    max_w: int = MST_MAX_W,
    min_weight: int = MST_MIN_WEIGHT,
) -> str:
    """MST weight-class histogram oracle via the cut-counting identity.

    Every minimum spanning forest of a graph has the SAME number of edges
    per weight class (the classic MSF exchange argument), so the histogram
    is implementation-independent — unlike the edge list, which depends on
    Borůvka's tie-breaking and is not practically SQL-unrollable. The
    number of MSF edges of integer weight w equals
    ``ncomp(weight <= w-1) - ncomp(weight <= w)``; each threshold component
    count is an unrolled hash-min label propagation with per-round pointer
    jumping (``label <- label[label]``), which converges in O(log V)
    rounds."""
    ctes = [
        _SQL_COPURCHASE.strip().rstrip(","),
        f"eh AS (SELECT src, dst, weight FROM e WHERE weight >= {min_weight})",
        "symh AS (SELECT src, dst, weight FROM eh"
        " UNION ALL SELECT dst, src, weight FROM eh)",
        "hnodes AS (SELECT DISTINCT src AS id FROM symh)",
    ]
    for t in range(1, max_w + 1):
        ctes.append(
            f"s{t} AS (SELECT src, dst FROM symh WHERE weight <= {t})"
        )
        ctes.append(f"l{t}_0 AS (SELECT id, id AS label FROM hnodes)")
        for k in range(rounds):
            ctes.append(
                f"""a{t}_{k + 1} AS (
  SELECT l.id, least(l.label, coalesce(t.m, l.label)) AS label
  FROM l{t}_{k} l LEFT JOIN (
    SELECT s.dst AS id, min(l2.label) AS m
    FROM s{t} s JOIN l{t}_{k} l2 ON s.src = l2.id GROUP BY 1) t
  ON l.id = t.id)"""
            )
            ctes.append(
                f"""l{t}_{k + 1} AS (
  SELECT p.id, q.label FROM a{t}_{k + 1} p
  JOIN a{t}_{k + 1} q ON p.label = q.id)"""
            )
        ctes.append(
            f"c{t} AS (SELECT count(DISTINCT label) AS c FROM l{t}_{rounds})"
        )
    ctes.append("c0 AS (SELECT count(*) AS c FROM hnodes)")
    classes = " UNION ALL ".join(
        f"SELECT {w}::DOUBLE AS weight, "
        f"((SELECT c FROM c{w - 1}) - (SELECT c FROM c{w}))::BIGINT AS n_edges"
        for w in range(min_weight, max_w + 1)
    )
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT weight, n_edges FROM ({classes})"
        + " WHERE n_edges > 0 ORDER BY weight"
    )


def _betweenness_sql() -> str:
    """Exact weighted betweenness on the (tiny) directed event-type graph
    via recursive simple-path enumeration: sigma(s,t) over min-cost paths,
    interior-node visit fractions summed — matches Brandes with
    sources == targets == all nodes, normalize=False. Edge weights are
    integer counts (exact double sums), so cost equality is exact."""
    return (
        "WITH RECURSIVE "
        + _SQL_EVENT_TYPE.strip().rstrip(",")
        + """
, paths(s, t, cost, pathlist) AS (
    SELECT src, dst, weight, [src, dst] FROM de
    UNION ALL
    SELECT p.s, d.dst, p.cost + d.weight, list_append(p.pathlist, d.dst)
    FROM paths p JOIN de d ON p.t = d.src
    WHERE NOT list_contains(p.pathlist, d.dst)),
mind AS (SELECT s, t, min(cost) AS mc FROM paths WHERE s <> t GROUP BY 1, 2),
sp AS (SELECT p.s, p.t, p.pathlist
       FROM paths p JOIN mind m ON p.s = m.s AND p.t = m.t AND p.cost = m.mc),
sig AS (SELECT s, t, count(*) AS sigma FROM sp GROUP BY 1, 2),
inter AS (SELECT s, t, unnest(pathlist[2:len(pathlist) - 1]) AS v FROM sp),
cnt AS (SELECT s, t, v, count(*) AS through FROM inter GROUP BY 1, 2, 3),
bt AS (SELECT c.v AS id, sum(c.through::double / g.sigma) AS b
       FROM cnt c JOIN sig g ON c.s = g.s AND c.t = g.t
       GROUP BY c.v)
SELECT n.id, round(coalesce(bt.b, 0.0), 6) AS betweenness
FROM dnodes n LEFT JOIN bt ON n.id = bt.id ORDER BY n.id"""
    )


def _lsh_topk_sql(
    bits: int, num_tables: int, seed: int, dim: int, k: int, max_qid: int
) -> str:
    """Exact replica of ``functions.similarity.lsh_topk``: the seeded
    Gaussian hyperplanes are regenerated from the same seed
    (``similarity._hyperplanes``) and embedded as a literal table — the
    same export trick the minhash oracle uses for its permutations. Bucket
    = sum of sign bits of plane dot products; candidates = bucket
    collisions in any table; exact cosine rerank on candidates only. Signs
    are computed on the raw vectors (positive normalization cannot change
    a sign; |dot| is O(1) for Gaussian planes, far from the ~1e-16
    rounding boundary)."""
    from metagraph_spark.functions.similarity import _hyperplanes

    rows = []
    for t in range(num_tables):
        planes = _hyperplanes(dim, bits, t, seed)
        for b in range(bits):
            vec = ", ".join(repr(float(x)) for x in planes[:, b])
            rows.append(f"({t}, {1 << b}, [{vec}]::DOUBLE[])")
    values = ",\n".join(rows)
    return f"""
WITH planes(t, bitval, p) AS (VALUES
{values}),
qv AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < {max_qid}),
cb AS (SELECT e.vec_id AS neighbor_id, pl.t,
              sum(CASE WHEN list_inner_product(e.embedding::DOUBLE[], pl.p) > 0
                       THEN pl.bitval ELSE 0 END) AS bucket
       FROM embeddings e CROSS JOIN planes pl GROUP BY 1, 2),
qb AS (SELECT q.vec_id AS query_id, pl.t,
              sum(CASE WHEN list_inner_product(q.embedding::DOUBLE[], pl.p) > 0
                       THEN pl.bitval ELSE 0 END) AS bucket
       FROM qv q CROSS JOIN planes pl GROUP BY 1, 2),
cand AS (SELECT DISTINCT qb.query_id, cb.neighbor_id
         FROM qb JOIN cb ON qb.t = cb.t AND qb.bucket = cb.bucket
         WHERE qb.query_id <> cb.neighbor_id),
scored AS (SELECT c.query_id, c.neighbor_id,
                  list_cosine_similarity(qe.embedding, ce.embedding) AS cosine
           FROM cand c
           JOIN qv qe ON c.query_id = qe.vec_id
           JOIN embeddings ce ON c.neighbor_id = ce.vec_id),
ranked AS (SELECT query_id, neighbor_id,
                  row_number() OVER (PARTITION BY query_id
                                     ORDER BY cosine DESC, neighbor_id) AS rank
           FROM scored)
SELECT query_id, neighbor_id, rank FROM ranked
WHERE rank <= {k} ORDER BY query_id, rank"""


def _ivf_topk_sql(
    num_cells: int, nprobe: int, seed: int, k: int, max_qid: int,
    lloyd_iters: int = 2,
) -> str:
    """Exact replica of ``functions.similarity.ivf_topk``: seeded-sample
    centroid init via the shared cross-engine mix31 hash, ``lloyd_iters``
    unrolled spherical-k-means refinements (argmax-dot assignment over
    UNIT vectors → per-dimension mean of the unit members, renormalized
    to unit length exactly as the engine does, zero-norm cells dropped),
    final assignment, nprobe probing, exact rerank — every score is the
    SAME plain dot product of unit-normalized vectors the Spark plan
    computes (no list_cosine_similarity-of-raw-vectors shortcut: cosine
    is scale-invariant mathematically but rounds differently, and a
    near-tie cell assignment flipping after two Lloyd iterations would
    compound into different probe sets), all tie-breaks to the smaller
    cell/neighbor id."""
    h = _mix31_sql("vec_id", seed)
    ctes = [
        f"q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < {max_qid})",
        "nrm AS (SELECT vec_id, list_transform(embedding, x -> x /"
        " sqrt(list_sum(list_transform(embedding, y -> y*y)))) AS un"
        " FROM embeddings)",
        f"""cents_0 AS (SELECT vec_id AS cell, un AS cv FROM nrm
          ORDER BY ({h}), vec_id LIMIT {num_cells})""",
    ]
    for i in range(1, lloyd_iters + 1):
        ctes.append(
            f"""lasg_{i} AS (SELECT vec_id AS nid, cell FROM (
          SELECT n.vec_id, c.cell,
                 row_number() OVER (
                   PARTITION BY n.vec_id
                   ORDER BY list_inner_product(n.un, c.cv) DESC,
                            c.cell) AS rn
          FROM nrm n CROSS JOIN cents_{i - 1} c) WHERE rn = 1)"""
        )
        ctes.append(
            f"""cents_{i} AS (SELECT cell,
            list_transform(mv, x -> x / sqrt(list_sum(
                list_transform(mv, y -> y*y)))) AS cv FROM (
          SELECT cell, list(m ORDER BY d) AS mv FROM (
            SELECT a.cell, u.d AS d, avg(n.un[u.d]) AS m
            FROM lasg_{i} a JOIN nrm n ON a.nid = n.vec_id,
                 UNNEST([{{'d': j}} FOR j IN range(1, len(n.un) + 1)]) AS s(u)
            GROUP BY a.cell, u.d) GROUP BY cell)
          WHERE sqrt(list_sum(list_transform(mv, x -> x*x))) > 0)"""
        )
    final = f"cents_{lloyd_iters}"
    head = "WITH " + ",\n".join(ctes) + ",\n"
    return head + f"""cents AS (SELECT cell, cv FROM {final}),
asg AS (SELECT vec_id AS neighbor_id, cell FROM (
          SELECT n.vec_id, c.cell,
                 row_number() OVER (
                   PARTITION BY n.vec_id
                   ORDER BY list_inner_product(n.un, c.cv) DESC,
                            c.cell) AS rn
          FROM nrm n CROSS JOIN cents c) WHERE rn = 1),
probes AS (SELECT query_id, cell FROM (
             SELECT q.vec_id AS query_id, c.cell,
                    row_number() OVER (
                      PARTITION BY q.vec_id
                      ORDER BY list_inner_product(nq.un, c.cv) DESC,
                               c.cell) AS rn
             FROM q JOIN nrm nq ON q.vec_id = nq.vec_id
                  CROSS JOIN cents c) WHERE rn <= {nprobe}),
cand AS (SELECT p.query_id, a.neighbor_id
         FROM probes p JOIN asg a USING (cell)
         WHERE a.neighbor_id <> p.query_id),
scored AS (SELECT c.query_id, c.neighbor_id,
                  list_inner_product(nc.un, nq.un) AS cosine
           FROM cand c
           JOIN nrm nq ON c.query_id = nq.vec_id
           JOIN nrm nc ON c.neighbor_id = nc.vec_id),
ranked AS (SELECT query_id, neighbor_id,
                  row_number() OVER (PARTITION BY query_id
                                     ORDER BY cosine DESC, neighbor_id) AS rank
           FROM scored)
SELECT query_id, neighbor_id, rank FROM ranked
WHERE rank <= {k} ORDER BY query_id, rank"""


# --------------------------------------------------------------- dedup sql
_TK_SQL = r"string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ')"


def _hex_int_sql(expr: str, nchars: int) -> str:
    """DuckDB: first ``nchars`` hex chars of ``expr`` as BIGINT (twin of
    ``functions.dedup.md5_key48/60`` — exact integer shifts, no doubles)."""
    return (
        f"list_sum(list_transform(range({nchars}), i -> "
        f"((strpos('0123456789abcdef', substr({expr}, (i+1)::INT, 1)) - 1)"
        f"::BIGINT << (4*({nchars - 1} - i))::INT)))"
    )


def _minhash_sql(
    num_hashes: int, bands: int, threshold: float, seed: int
) -> str:
    """Exact replica of minhash_lsh_pairs: md5-48bit shingle keys, the same
    affine permutations (regenerated from the seed), candidate = ≥1 fully
    equal band (slice equality — hash-bucket collisions are the only
    divergence and are ~2^-64), est_jaccard = matching positions / k."""
    from metagraph_spark.functions.dedup import _MERSENNE_P, minhash_params

    a, b = minhash_params(num_hashes, seed)
    p = _MERSENNE_P
    hex48 = _hex_int_sql("md5(s)", 12)
    sig_cols = ",\n       ".join(
        f"min(((x * {a[i]}) + {b[i]}) % {p}) AS h{i}" for i in range(num_hashes)
    )
    rpb = num_hashes // bands
    band_conds = "\n   OR ".join(
        "("
        + " AND ".join(f"a.h{bi * rpb + j} = b.h{bi * rpb + j}" for j in range(rpb))
        + ")"
        for bi in range(bands)
    )
    matches = " + ".join(
        f"(CASE WHEN a.h{i} = b.h{i} THEN 1 ELSE 0 END)"
        for i in range(num_hashes)
    )
    return rf"""
WITH d AS (SELECT doc_id, {_TK_SQL} tk FROM documents),
sh0 AS (SELECT doc_id, unnest(
          CASE WHEN len(tk) >= 3
               THEN [array_to_string(tk[i:i+2], ' ') FOR i IN range(1, len(tk) - 1)]
               ELSE [array_to_string(tk, ' ')] END) s
        FROM d),
shd AS (SELECT DISTINCT doc_id, s FROM sh0),
keys AS (SELECT doc_id, ({hex48}) % {p} AS x FROM shd),
sig AS (SELECT doc_id, {sig_cols} FROM keys GROUP BY doc_id)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       round(({matches})::double / {num_hashes}, 6) AS est_jaccard
FROM sig a JOIN sig b ON a.doc_id < b.doc_id
WHERE ({band_conds})
  AND ({matches})::double / {num_hashes} >= {threshold}
ORDER BY doc_a, doc_b"""


def _simhash_sql(max_hamming: int, seed: int, nbits: int = 60) -> str:
    """Brute-force hamming pairs over the replica simhash — equals the
    blocked Spark output because blocking is recall-complete for
    max_hamming <= blocks-1 and candidates are exact-hamming filtered."""
    hex60 = _hex_int_sql(f"md5(concat('{seed}', tok))", 15)
    return rf"""
WITH d AS (SELECT doc_id, {_TK_SQL} tk FROM documents),
t AS (SELECT doc_id, unnest(tk) AS tok FROM d),
h AS (SELECT doc_id, {hex60} AS hv FROM t),
bb AS (SELECT doc_id, b, sum(CASE WHEN (hv >> b::INT) & 1 = 1 THEN 1 ELSE -1 END) AS vote
       FROM h CROSS JOIN (SELECT unnest(range({nbits})) AS b) GROUP BY 1, 2),
packed AS (SELECT doc_id,
                  sum(CASE WHEN vote > 0 THEN (1::BIGINT << b::INT) ELSE 0 END) AS v
           FROM bb GROUP BY 1),
sh AS (SELECT documents.doc_id, coalesce(packed.v, 0) AS simhash
       FROM documents LEFT JOIN packed USING (doc_id))
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       bit_count(xor(a.simhash, b.simhash)) AS hamming
FROM sh a JOIN sh b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= {max_hamming}
ORDER BY doc_a, doc_b"""


_MEDIA_BYTE_STATS_SQL = r"""
WITH f AS (SELECT doc_id,
                  unnest(list_transform(range(length(text)),
                         i -> ord(substr(text, (i+1)::INT, 1)))) AS v
           FROM documents),
h AS (SELECT doc_id, v, count(*) AS c FROM f GROUP BY 1, 2),
tot AS (SELECT doc_id, sum(c) AS n FROM h GROUP BY 1),
agg AS (SELECT h.doc_id,
               sum(h.c * h.v)::double / max(tot.n) AS mb,
               -sum((h.c::double / tot.n) * log2(h.c::double / tot.n)) AS e,
               count(*) AS nd,
               max(tot.n) AS n
        FROM h JOIN tot ON h.doc_id = tot.doc_id GROUP BY h.doc_id)
SELECT d.doc_id AS media_id,
       coalesce(a.n, 0)::BIGINT AS n_bytes,
       round(coalesce(a.mb, 0.0), 6) AS mean_byte,
       round(coalesce(a.e, 0.0), 6) AS byte_entropy,
       coalesce(a.nd, 0)::BIGINT AS n_distinct
FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id
ORDER BY media_id"""


_DEDUP_CLUSTERS_SQL = r"""
WITH n AS (SELECT doc_id,
                  regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS nt
           FROM documents)
SELECT doc_id,
       min(doc_id) OVER (PARTITION BY nt) AS cluster,
       doc_id = min(doc_id) OVER (PARTITION BY nt) AS keep
FROM n ORDER BY doc_id"""


# ----------------------------------------------------------------- text sql
_LANGS = list(mtext.STOPWORDS)


def _langid_sql() -> str:
    toks = r"string_split_regex(trim(lower(text)), '\s+')"
    hits = {
        lang: (
            f"len(list_filter({toks}, x -> list_contains("
            f"[{', '.join(repr(w) for w in ws)}], x)))"
        )
        for lang, ws in mtext.STOPWORDS.items()
    }
    expr, max_expr = "'und'", "0"
    for lang in _LANGS:
        s = f"s_{lang}"
        expr = f"(CASE WHEN {s} > {max_expr} THEN '{lang}' ELSE {expr} END)"
        max_expr = f"greatest({max_expr}, {s})"
    sel = ", ".join(f"{hits[lang]} AS s_{lang}" for lang in _LANGS)
    return f"""
WITH h AS (SELECT doc_id, {sel} FROM documents)
SELECT doc_id, {expr} AS lang_guess FROM h ORDER BY doc_id"""


# -------------------------------------------------------------------- entry
def entry(spark: SparkSession) -> DataFrame:
    """Flagship: converged PageRank over the sf0.001 co-purchase graph."""
    g = _copurchase_graph(spark, "/root/testdata/sf0.001")
    ranks = pagerank(g, damping=DAMPING, maxiter=100, tolerance=1e-8)
    return ranks.orderBy(F.desc("rank"), "id").limit(20)


# ------------------------------------------------------------------ queries
def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    q: dict[str, Callable[[SparkSession, str], DataFrame]] = {}

    # -- ingest / edge builders (SURVEY §2.1 #9, #35)
    q["cooccurrence_edges"] = lambda spark, sf: (
        _copurchase_edges(spark, sf).orderBy("src", "dst")
    )
    q["turn_adjacency_edges"] = lambda spark, sf: (
        _event_type_edges(spark, sf).orderBy("src", "dst")
    )

    # -- degree / utility operators (§2.1 #5-8, §2.2)
    # degree + degree_centrality share one entry (centrality is the same
    # aggregate one projection later) so queries() fits the driver's 50-row
    # correctness-artifact cap with every entry visible
    def _graph_degree(spark, sf):
        g = _copurchase_graph(spark, sf)
        deg = mutil.degree(g)
        cen = mutil.degree_centrality(g)
        return (
            deg.join(cen, "id")
            .select("id", "degree", F.round("centrality", 6).alias("centrality"))
            .orderBy("id")
        )

    q["graph_degree"] = _graph_degree
    q["aggregate_edges_sum"] = lambda spark, sf: (
        mutil.aggregate_edges(
            _copurchase_graph(spark, sf), "sum", 0.0, in_edges=True, out_edges=True
        )
        .select("id", F.round("value", 6).alias("value"))
        .orderBy("id")
    )
    q["filter_edges_heavy"] = lambda spark, sf: (
        mutil.filter_edges(_copurchase_graph(spark, sf), "weight >= 2")
        .edges.orderBy("src", "dst")
    )
    q["nodemap_topk_degree"] = lambda spark, sf: (
        mutil.degree(_copurchase_graph(spark, sf))
        .orderBy(F.desc("degree"), "id")
        .limit(20)
        .select("id", "degree")
    )
    def _collapse_by_brand(spark, sf):
        part = read_table(spark, sf, "part")
        brands = part.select("p_brand").distinct().withColumn(
            "label", F.dense_rank().over(Window.orderBy("p_brand")).cast("long")
        )
        labels = part.join(brands, "p_brand").select(
            F.col("p_partkey").alias("id"), "label"
        )
        return mutil.collapse_by_label(
            _copurchase_graph(spark, sf), labels, "sum"
        ).edges.orderBy("src", "dst")

    q["collapse_by_brand"] = _collapse_by_brand
    q["extract_subgraph_bigparts"] = lambda spark, sf: (
        __import__("metagraph_spark.operators.subgraph", fromlist=["extract_subgraph"])
        .extract_subgraph(
            _copurchase_graph(spark, sf),
            read_table(spark, sf, "part")
            .filter(F.col("p_size") >= 25)
            .select(F.col("p_partkey").alias("id")),
        ).edges.orderBy("src", "dst")
    )

    # -- triangles (§2.1 #4, #32)
    def _tri(spark, sf):
        n = triangle_count(_copurchase_graph(spark, sf))
        return spark.createDataFrame([(n,)], "triangles long")

    q["triangle_count"] = _tri

    def _gcc(spark, sf):
        v = global_clustering_coefficient(_copurchase_graph(spark, sf))
        return spark.createDataFrame([(round(v, 6),)], "gcc double")

    q["global_clustering_coefficient"] = _gcc

    # -- iterative operators, fixed supersteps (oracle-exact)
    # strategy="join" PINNED on the fixed-round trio: defaults are now
    # "auto" (kernel), and pinning keeps the join superstep plans under
    # driver-oracle coverage alongside the kernel variants
    # (pagerank_kernel_fixed, modularity_fixed_lpa via auto, and the
    # converged queries below which route auto->kernel)
    q["pagerank_fixed"] = lambda spark, sf: (
        pagerank(
            _copurchase_graph(spark, sf), DAMPING, fixed_iterations=PR_ITERS,
            strategy="join",
        )
        .select("id", F.round("rank", 6).alias("rank"))
        .orderBy("id")
    )
    q["connected_components_fixed"] = lambda spark, sf: (
        connected_components(
            _copurchase_graph(spark, sf), fixed_rounds=CC_ROUNDS,
            strategy="join",
        ).orderBy("id")
    )
    q["lpa_fixed"] = lambda spark, sf: (
        label_propagation_community(
            _copurchase_graph(spark, sf), fixed_rounds=LPA_ROUNDS,
            strategy="join",
        ).orderBy("id")
    )

    def _modularity_fixed_lpa(spark, sf):
        g = _copurchase_graph(spark, sf)
        labels = label_propagation_community(g, fixed_rounds=LPA_ROUNDS)
        return spark.createDataFrame(
            [(round(modularity(g, labels), 6),)], "modularity double"
        )

    q["modularity_fixed_lpa"] = _modularity_fixed_lpa

    def _louvain(spark, sf):
        labels, qv = louvain_community(_copurchase_graph(spark, sf))
        return labels.orderBy("id")

    q["louvain_step"] = _louvain

    def _louvain_ml(spark, sf):
        # fixed-unroll contract for the multi-level operator: 1 level,
        # 2 sweeps per phase (the karate-club pytest exercises the full
        # contraction loop; this pins the distributed sweep/selection
        # machinery against the SQL replica)
        labels, _qv = louvain_community_multilevel(
            _copurchase_graph(spark, sf), max_levels=1, max_sweeps_per_level=2
        )
        return labels.orderBy("id")

    q["louvain_multilevel_l1"] = _louvain_ml
    q["bfs_depths"] = _bfs_depths_fixed
    q["bellman_ford_fixed"] = _bf_fixed
    # CSR/Arrow kernel strategy must agree with the same unrolled SQL oracle
    q["pagerank_kernel_fixed"] = lambda spark, sf: (
        pagerank_kernel(
            _copurchase_graph(spark, sf), DAMPING, fixed_iterations=PR_ITERS
        )
        .select("id", F.round("rank", 6).alias("rank"))
        .orderBy("id")
    )

    # -- iterative operators, run to convergence
    # At sf0.01 the 1e-8-tolerance run converges in exactly PR_CONV_ITERS
    # supersteps (measured; deterministic math -> stable across runs), so
    # the oracle unrolls exactly that many updates — both engines land on
    # the same fixed point.
    q["pagerank_converged"] = lambda spark, sf: (
        pagerank(_copurchase_graph(spark, sf), DAMPING, maxiter=100, tolerance=1e-8)
        .select("id", F.round("rank", 6).alias("rank"))
        .orderBy("id")
    )
    q["connected_components"] = lambda spark, sf: (
        connected_components(_copurchase_graph(spark, sf)).orderBy("id")
    )
    q["scc"] = lambda spark, sf: (
        strongly_connected_components(
            build(_event_type_edges(spark, sf), is_directed=True)
        ).orderBy("id")
    )
    q["k_core_3"] = lambda spark, sf: (
        k_core(_copurchase_graph(spark, sf), 3).edges.orderBy("src", "dst")
    )
    def _mst(spark, sf):
        # weight>=2 subgraph: the weight-1 edges alone already span the full
        # co-purchase graph, which would make the histogram trivial. The
        # weight-class histogram (not the edge list) is the oracle surface:
        # it is identical for EVERY minimum spanning forest, so it is
        # independent of Borůvka's tie-breaking (see _mst_hist_sql).
        sub = mutil.filter_edges(
            _copurchase_graph(spark, sf), f"weight >= {MST_MIN_WEIGHT}"
        )
        sub = Graph(edges=sub.edges, nodes=None, is_directed=False)
        return (
            minimum_spanning_tree(sub)
            .edges.groupBy("weight")
            .agg(F.count(F.lit(1)).alias("n_edges"))
            .orderBy("weight")
        )

    q["mst"] = _mst
    q["maximal_independent_set"] = lambda spark, sf: (
        maximal_independent_set(_copurchase_graph(spark, sf)).orderBy("id")
    )
    q["ties_sample"] = lambda spark, sf: (
        totally_induced_edge_sampling(_copurchase_graph(spark, sf), 0.3)
        .edges.orderBy("src", "dst")
    )
    q["node_sample"] = lambda spark, sf: (
        node_sampling(_copurchase_graph(spark, sf), SAMPLE_P, SAMPLE_SEED)
        .edges.orderBy("src", "dst")
    )
    q["edge_sample"] = lambda spark, sf: (
        edge_sampling(_copurchase_graph(spark, sf), SAMPLE_P, SAMPLE_SEED)
        .edges.orderBy("src", "dst")
    )
    q["k_truss_4"] = lambda spark, sf: (
        k_truss(_copurchase_graph(spark, sf), 4).edges.orderBy("src", "dst")
    )
    # fixed-iteration variants: the DuckDB oracle unrolls the identical k
    # updates, so values match exactly (after round-6)
    q["katz"] = lambda spark, sf: (
        katz_centrality(
            _copurchase_graph(spark, sf),
            attenuation_factor=1e-4,
            fixed_iterations=KATZ_ITERS,
            strategy="join",
        )
        .select("id", F.round("katz", 6).alias("katz"))
        .orderBy("id")
    )
    q["eigenvector"] = lambda spark, sf: (
        eigenvector_centrality(
            _copurchase_graph(spark, sf), fixed_iterations=EIG_ITERS,
            strategy="join",
        )
        .select("id", F.round("eigenvector", 6).alias("eigenvector"))
        .orderBy("id")
    )
    q["hits"] = lambda spark, sf: (
        hits_centrality(
            build(_event_type_edges(spark, sf), is_directed=True),
            fixed_iterations=HITS_ITERS,
            strategy="join",
        )[1]
        .select("id", F.round("authority", 6).alias("authority"))
        .orderBy("id")
    )
    def _coloring(spark, sf):
        sub = mutil.filter_edges(_copurchase_graph(spark, sf), "weight >= 2")
        # drop isolates so node set == SQL's edge-endpoint set
        sub = Graph(edges=sub.edges, nodes=None, is_directed=False)
        colors, _n = greedy_coloring(sub, seed=COLORING_SEED)
        return colors.orderBy("id")

    q["coloring_greedy"] = _coloring

    def _rw(spark, sf):
        g = build(_event_type_edges(spark, sf), is_directed=True)
        start = g.node_ids().agg(F.min("id")).collect()[0][0]
        return random_walk_sampling(
            g,
            num_walks=RW_WALKS,
            num_steps=RW_STEPS,
            jump_probability=RW_JUMP,
            start_node=start,
            seed=RW_SEED,
        ).orderBy("walk_id", "step")

    q["random_walk"] = _rw

    def _apsp(spark, sf):
        from metagraph_spark.operators.centrality import (
            all_pairs_shortest_paths,
        )

        g = _copurchase_graph(spark, sf)
        srcs = g.node_ids().orderBy("id").limit(APSP_SOURCES)
        return (
            all_pairs_shortest_paths(g, srcs)
            .select("src", "dst", F.round("dist", 6).alias("dist"))
            .orderBy("src", "dst")
        )

    q["apsp_subset"] = _apsp

    def _maxflow_value(spark, sf):
        g = build(_event_type_edges(spark, sf), is_directed=True)
        ids = g.node_ids().agg(
            F.min("id").alias("s"), F.max("id").alias("t")
        ).collect()[0]
        value, _fg = max_flow(g, ids["s"], ids["t"])
        return spark.createDataFrame([(round(value, 6),)], "flow double")

    q["max_flow_value"] = _maxflow_value

    def _mincut(spark, sf):
        g = build(_event_type_edges(spark, sf), is_directed=True)
        ids = g.node_ids().agg(
            F.min("id").alias("s"), F.max("id").alias("t")
        ).collect()[0]
        _value, cg = min_cut(g, ids["s"], ids["t"])
        return cg.edges.orderBy("src", "dst")

    q["min_cut_edges"] = _mincut
    q["closeness_subset"] = lambda spark, sf: (
        closeness_centrality(
            g := _copurchase_graph(spark, sf),
            g.node_ids().orderBy("id").limit(8),
        )
        .select("id", F.round("closeness", 6).alias("closeness"))
        .orderBy("id")
    )
    q["betweenness_subset"] = lambda spark, sf: (
        betweenness_centrality(
            build(_event_type_edges(spark, sf), is_directed=True),
            normalize=False,
        )
        .select("id", F.round("betweenness", 6).alias("betweenness"))
        .orderBy("id")
    )

    # -- dedup / text / similarity pipeline
    q["dedup_exact_counts"] = lambda spark, sf: (
        read_table(spark, sf, "documents")
        .select(
            "doc_id",
            F.count(F.lit(1))
            .over(Window.partitionBy(mdedup.normalized_text(F.col("text"))))
            .alias("dup_count"),
        )
        .orderBy("doc_id")
    )
    # (dedup_ngram_jaccard moved to tests/test_functions.py::
    # test_ngram_jaccard_duckdb_oracle — same DuckDB-oracle comparison at
    # sf0.001 — to keep queries() within the driver's 50-entry artifact cap)
    q["dedup_minhash_lsh"] = lambda spark, sf: (
        mdedup.minhash_lsh_pairs(
            read_table(spark, sf, "documents"),
            num_hashes=64, bands=16, threshold=0.8,
        )
        .select("doc_a", "doc_b", F.round("est_jaccard", 6).alias("est_jaccard"))
        .orderBy("doc_a", "doc_b")
    )
    q["dedup_simhash"] = lambda spark, sf: (
        mdedup.simhash_pairs(read_table(spark, sf, "documents"), max_hamming=3)
        .orderBy("doc_a", "doc_b")
    )

    def _dedup_clusters(spark, sf):
        """exact pairs → distributed CC → keep-one-per-duplicate-CLUSTER."""
        docs = read_table(spark, sf, "documents")
        keyed = docs.select(
            "doc_id", mdedup.normalized_text(F.col("text")).alias("_n")
        )
        grp = keyed.groupBy("_n").agg(F.min("doc_id").alias("rep"))
        pairs = (
            keyed.join(grp, "_n")
            .filter(F.col("doc_id") != F.col("rep"))
            .select(
                F.col("rep").alias("doc_a"), F.col("doc_id").alias("doc_b")
            )
        )
        return mdedup.duplicate_clusters(docs, pairs).orderBy("doc_id")

    q["dedup_clusters"] = _dedup_clusters

    def _media_byte_stats(spark, sf):
        """REAL byte-level media screen over text payloads (documents are
        pure ASCII, so the DuckDB codepoint oracle sees identical bytes)."""
        from metagraph_spark.functions.multimodal import byte_features

        media = read_table(spark, sf, "documents").select(
            F.col("doc_id").alias("media_id"),
            F.col("text").cast("binary").alias("payload"),
        )
        return (
            byte_features(media)
            .select(
                "media_id",
                "n_bytes",
                F.round("mean_byte", 6).alias("mean_byte"),
                F.round("byte_entropy", 6).alias("byte_entropy"),
                "n_distinct",
            )
            .orderBy("media_id")
        )

    q["media_byte_stats"] = _media_byte_stats
    q["text_stats"] = lambda spark, sf: (
        read_table(spark, sf, "documents").select(
            "doc_id",
            mtext.token_count(F.col("text")).alias("n_tokens"),
            F.length("text").alias("n_chars"),
            F.round(mtext.punct_ratio(F.col("text")), 6).alias("punct_ratio"),
        ).orderBy("doc_id")
    )
    q["text_langid"] = lambda spark, sf: (
        read_table(spark, sf, "documents").select(
            "doc_id", mtext.language_id(F.col("text")).alias("lang_guess")
        ).orderBy("doc_id")
    )
    q["text_fingerprint"] = lambda spark, sf: (
        read_table(spark, sf, "documents").select(
            "doc_id",
            F.md5(mdedup.normalized_text(F.col("text"))).alias("fp"),
        ).orderBy("doc_id")
    )
    q["similarity_topk"] = lambda spark, sf: (
        msim.cosine_topk_bruteforce(
            read_table(spark, sf, "embeddings"),
            read_table(spark, sf, "embeddings").filter(F.col("vec_id") < 10),
            k=3,
        ).select("query_id", "neighbor_id", "rank").orderBy("query_id", "rank")
    )
    q["similarity_lsh_topk"] = lambda spark, sf: (
        msim.lsh_topk(
            read_table(spark, sf, "embeddings"),
            read_table(spark, sf, "embeddings").filter(F.col("vec_id") < 10),
            k=3, bits=4, num_tables=16,
        ).select("query_id", "neighbor_id", "rank").orderBy("query_id", "rank")
    )
    q["similarity_ivf_topk"] = lambda spark, sf: (
        msim.ivf_topk(
            read_table(spark, sf, "embeddings"),
            read_table(spark, sf, "embeddings").filter(F.col("vec_id") < 10),
            k=3, num_cells=16, nprobe=4,
        ).select("query_id", "neighbor_id", "rank").orderBy("query_id", "rank")
    )
    return q


# --------------------------------------------------------------- oracle SQL
def _materialize_ctes(sql: str) -> str:
    """Force DuckDB to materialize every named CTE (``AS MATERIALIZED``).

    Without this DuckDB inlines CTEs per reference; the deeply unrolled
    iterative oracles (each round referencing the previous round's CTE
    multiple times) expand exponentially and exhaust file descriptors
    re-opening the parquet scans. Materialization keeps one scan per base
    table and one evaluation per round. Recursive CTE heads like
    ``reach(a, b) AS (`` are excluded (lookbehind requires a word char)."""
    return re.sub(r"(?<=\w) AS \(", " AS MATERIALIZED (", sql)


def oracle_sql() -> dict[str, str]:
    raw = _oracle_sql_raw()
    # "_extra_*" oracles back pytest/selfcheck comparisons for operators not
    # in queries() (50-entry driver cap) — exclude them from the driver dict
    return {
        k: _materialize_ctes(v)
        for k, v in raw.items()
        if not k.startswith("_extra_")
    }


def _oracle_sql_raw() -> dict[str, str]:
    cp = "WITH " + _SQL_COPURCHASE.strip().rstrip(",")
    et = "WITH " + _SQL_EVENT_TYPE.strip().rstrip(",")
    toks = r"list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '')"
    return {
        "cooccurrence_edges": cp + "\nSELECT src, dst, weight FROM e ORDER BY src, dst",
        "turn_adjacency_edges": et
        + "\nSELECT src, dst, weight FROM de ORDER BY src, dst",
        "graph_degree": cp
        + """
, nn AS (SELECT count(*)::double AS c FROM nodes),
deg AS (SELECT src AS id, count(*) AS degree FROM sym GROUP BY 1)
SELECT nodes.id, coalesce(deg.degree, 0) AS degree,
       round(coalesce(deg.degree, 0) / ((SELECT c FROM nn) - 1), 6) AS centrality
FROM nodes LEFT JOIN deg ON nodes.id = deg.id ORDER BY 1""",
        "aggregate_edges_sum": cp
        + """
, s AS (SELECT src AS id, sum(weight) AS v FROM sym GROUP BY 1)
SELECT nodes.id, round(coalesce(s.v, 0.0), 6) AS value
FROM nodes LEFT JOIN s ON nodes.id = s.id ORDER BY 1""",
        "filter_edges_heavy": cp
        + "\nSELECT src, dst, weight FROM e WHERE weight >= 2 ORDER BY src, dst",
        "nodemap_topk_degree": cp
        + """
, deg AS (SELECT src AS id, count(*) AS degree FROM sym GROUP BY 1)
SELECT id, degree FROM deg ORDER BY degree DESC, id LIMIT 20""",
        "collapse_by_brand": cp
        + """
, brands AS (SELECT p_brand, dense_rank() OVER (ORDER BY p_brand) AS label
             FROM (SELECT DISTINCT p_brand FROM part)),
lab AS (SELECT p_partkey AS id, label FROM part JOIN brands USING (p_brand))
SELECT least(ls.label, ld.label) AS src,
       greatest(ls.label, ld.label) AS dst,
       sum(e.weight) AS weight
FROM e JOIN lab ls ON e.src = ls.id JOIN lab ld ON e.dst = ld.id
GROUP BY 1, 2 ORDER BY src, dst""",
        "extract_subgraph_bigparts": cp
        + """
, keep AS (SELECT p_partkey AS id FROM part WHERE p_size >= 25)
SELECT src, dst, weight FROM e
WHERE src IN (SELECT id FROM keep) AND dst IN (SELECT id FROM keep)
ORDER BY src, dst""",
        "triangle_count": cp
        + """
SELECT count(*) AS triangles
FROM e e1 JOIN e e2 ON e1.dst = e2.src
JOIN e e3 ON e3.src = e1.src AND e3.dst = e2.dst""",
        "global_clustering_coefficient": cp
        + """
, tri AS (SELECT count(*)::double AS t
          FROM e e1 JOIN e e2 ON e1.dst = e2.src
          JOIN e e3 ON e3.src = e1.src AND e3.dst = e2.dst),
wed AS (SELECT sum(d * (d - 1) / 2.0) AS w FROM (
          SELECT count(*)::double AS d FROM sym GROUP BY src))
SELECT round(3.0 * (SELECT t FROM tri) / (SELECT w FROM wed), 6) AS gcc""",
        "pagerank_fixed": _pagerank_sql(PR_ITERS),
        "pagerank_kernel_fixed": _pagerank_sql(PR_ITERS),
        "connected_components_fixed": _cc_sql(CC_ROUNDS),
        "lpa_fixed": _lpa_sql(LPA_ROUNDS),
        "modularity_fixed_lpa": _modularity_sql(LPA_ROUNDS),
        "bfs_depths": _bfs_sql(BFS_DEPTH),
        "bellman_ford_fixed": _bellman_ford_sql(BF_ROUNDS),
        # converged/fixpoint operators: the SQL unrolls past the empirically
        # measured fixpoint (constants above), so both engines return the
        # same fixed point
        "connected_components": _cc_sql(CC_CONV_UNROLL),
        "pagerank_converged": _pagerank_sql(PR_CONV_ITERS),
        "louvain_step": _louvain_sql(),
        "louvain_multilevel_l1": _louvain_ml_sql(),
        "k_core_3": _kcore_sql(3, KCORE_UNROLL),
        "scc": _scc_sql(),
        "katz": _katz_sql(KATZ_ITERS, 1e-4, 1.0),
        "eigenvector": _eig_sql(EIG_ITERS),
        "hits": _hits_sql(HITS_ITERS),
        "closeness_subset": _closeness_sql(CLOSENESS_UNROLL, 8),
        "maximal_independent_set": _mis_sql(MIS_UNROLL, MIS_SEED),
        "ties_sample": _ties_sql(TIES_P, TIES_SEED),
        "node_sample": _node_sample_sql(SAMPLE_P, SAMPLE_SEED),
        "edge_sample": _edge_sample_sql(SAMPLE_P, SAMPLE_SEED),
        "k_truss_4": _ktruss_sql(4, KTRUSS_UNROLL),
        "betweenness_subset": _betweenness_sql(),
        "coloring_greedy": _coloring_sql(COLORING_UNROLL, COLORING_SEED),
        "random_walk": _rw_sql(RW_WALKS, RW_STEPS, RW_JUMP, RW_SEED),
        "apsp_subset": _apsp_sql(APSP_UNROLL, APSP_SOURCES),
        "max_flow_value": _maxflow_value_sql(),
        "min_cut_edges": _mincut_edges_sql(),
        "mst": _mst_hist_sql(),
        "dedup_minhash_lsh": _minhash_sql(64, 16, 0.8, 42),
        "dedup_simhash": _simhash_sql(3, 42),
        "dedup_clusters": _DEDUP_CLUSTERS_SQL,
        "media_byte_stats": _MEDIA_BYTE_STATS_SQL,
        "dedup_exact_counts": r"""
SELECT doc_id,
       count(*) OVER (
         PARTITION BY regexp_replace(lower(trim(text)), '\s+', ' ', 'g')
       ) AS dup_count
FROM documents ORDER BY doc_id""",
        # retained for tests/test_functions.py::test_ngram_jaccard_duckdb_oracle
        # and tools/selfcheck.py --extra; NOT in queries() (50-entry cap)
        "_extra_dedup_ngram_jaccard": r"""
WITH d AS (SELECT doc_id,
                  string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') tk
           FROM documents),
sh AS (SELECT doc_id, unnest(
         CASE WHEN len(tk) >= 3
              THEN [array_to_string(tk[i:i+2], ' ') FOR i IN range(1, len(tk) - 1)]
              ELSE [array_to_string(tk, ' ')] END) s
       FROM d),
shd AS (SELECT DISTINCT doc_id, s FROM sh),
sz AS (SELECT doc_id, count(*) sz FROM shd GROUP BY 1),
inter AS (SELECT a.doc_id da, b.doc_id db, count(*) i
          FROM shd a JOIN shd b USING (s)
          WHERE a.doc_id < b.doc_id GROUP BY 1, 2)
SELECT da AS doc_a, db AS doc_b,
       round(i::double / (sa.sz + sb.sz - i), 6) AS jaccard
FROM inter JOIN sz sa ON da = sa.doc_id JOIN sz sb ON db = sb.doc_id
WHERE i::double / (sa.sz + sb.sz - i) >= 0.8
ORDER BY doc_a, doc_b""",
        "text_stats": rf"""
SELECT doc_id,
       len({toks}) AS n_tokens,
       length(text) AS n_chars,
       round(length(regexp_replace(text, '[A-Za-z0-9\s]', '', 'g'))::double
             / greatest(length(text), 1), 6) AS punct_ratio
FROM documents ORDER BY doc_id""",
        "text_langid": _langid_sql(),
        "text_fingerprint": r"""
SELECT doc_id,
       md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp
FROM documents ORDER BY doc_id""",
        "similarity_topk": """
WITH q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 10),
scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         list_cosine_similarity(q.embedding, c.embedding) AS cosine
  FROM q JOIN embeddings c ON q.vec_id <> c.vec_id),
ranked AS (
  SELECT query_id, neighbor_id,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cosine DESC, neighbor_id) AS rank
  FROM scored)
SELECT query_id, neighbor_id, rank FROM ranked
WHERE rank <= 3 ORDER BY query_id, rank""",
        "similarity_lsh_topk": _lsh_topk_sql(
            bits=4, num_tables=16, seed=42, dim=64, k=3, max_qid=10
        ),
        "similarity_ivf_topk": _ivf_topk_sql(
            num_cells=16, nprobe=4, seed=42, k=3, max_qid=10
        ),
    }
