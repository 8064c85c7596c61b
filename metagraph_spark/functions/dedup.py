"""Deduplication over a documents table ``(doc_id: long, text: string)``.

Five public-recipe strategies, each returning DataFrames a pipeline can act
on (duplicate groups or candidate pairs):

- ``exact_duplicates``: hash-groupBy on normalized text. One shuffle, fully
  JVM-side; the canonical keeper is the min doc_id per group.
- ``ngram_jaccard_pairs``: exact n-gram (shingle) Jaccard via
  explode → pair-join → count ratio. Exact but quadratic per shared
  shingle — the small/verification path.
- ``minhash_lsh_pairs``: MinHash signatures (k permutations, affine hashes
  over md5-derived 48-bit shingle keys — md5 chosen because Spark, Python's
  ``hashlib`` and DuckDB all agree bit-for-bit, giving exact cross-engine
  test oracles) + LSH banding → candidate pairs with estimated Jaccard.
  Scale path: signatures are one shuffle-free projection; banding is one
  groupBy; the candidate join touches only colliding buckets (hot buckets
  capped).
- ``simhash_64``: 60-bit SimHash over md5 token keys in a vectorized pandas
  UDF (numpy bit matrix per Arrow batch); hamming-distance pairs via
  pigeonhole blocking.
- ``duplicate_clusters``: candidate pairs → connected components → one
  canonical keeper per duplicate CLUSTER (wired to operators/components.py).
- ``embedding_near_duplicates`` lives in similarity.py (cosine top-k).

All hash seeds are explicit so every run, every engine, and every test
oracle agrees.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from metagraph_spark.functions.text import tokenize

# Mersenne prime 2^31-1: affine MinHash permutations h_i(x) = (a_i·(x mod P) +
# b_i) mod P. P is kept at 31 bits so a·x stays < 2^62 — no int64 overflow in
# either Spark or the numpy oracle.
_MERSENNE_P = (1 << 31) - 1

# SimHash width: 60 bits (not 64) so the packed value is positive int64 in
# every engine (no sign-bit shifts) and divides evenly into 6 blocks of 10
# for pigeonhole blocking.
SIMHASH_BITS = 60


def md5_key48(col: Column) -> Column:
    """48-bit integer key from the first 12 hex chars of md5 — chosen because
    Spark (``conv(substr(md5(x),1,12),16,10)``) and DuckDB (strpos-unrolled
    hex parse) produce the identical value, giving an exact cross-engine
    oracle; 48 bits also stays exact inside a double if an engine routes the
    arithmetic through floats."""
    return F.conv(F.substring(F.md5(col.cast("binary")), 1, 12), 16, 10).cast(
        "long"
    )


def md5_key60(col: Column) -> Column:
    """60-bit integer key from the first 15 hex chars of md5 (positive in
    int64; same cross-engine rationale as :func:`md5_key48`)."""
    return F.conv(F.substring(F.md5(col.cast("binary")), 1, 15), 16, 10).cast(
        "long"
    )


def normalized_text(text: Column) -> Column:
    return F.regexp_replace(F.lower(F.trim(text)), r"\s+", " ")


def exact_duplicates(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Groups of exact duplicates (after whitespace/case normalization):
    ``(group_key: long, doc_id: long, keep: boolean)`` — ``keep`` marks the
    min doc_id canonical representative. Docs with no duplicate are
    excluded."""
    keyed = docs.select(
        F.xxhash64(normalized_text(F.col(text_col))).alias("group_key"),
        F.col("doc_id"),
    )
    w_min = (
        keyed.groupBy("group_key")
        .agg(F.count(F.lit(1)).alias("n"), F.min("doc_id").alias("_keeper"))
        .filter(F.col("n") > 1)
    )
    return (
        keyed.join(w_min, "group_key")
        .select(
            "group_key",
            "doc_id",
            (F.col("doc_id") == F.col("_keeper")).alias("keep"),
        )
    )


def shingles(text: Column, n: int = 3) -> Column:
    """array<string> of word n-gram shingles (space-joined), distinct."""
    toks = tokenize(normalized_text(text))
    idxs = F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0)))
    return F.array_distinct(
        F.when(
            F.size(toks) >= n,
            F.transform(
                idxs, lambda i: F.array_join(F.slice(toks, i + 1, n), " ")
            ),
        ).otherwise(F.array(F.array_join(toks, " ")))
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    n: int = 3,
    threshold: float = 0.8,
    text_col: str = "text",
) -> DataFrame:
    """Exact shingle-Jaccard duplicate pairs ``(doc_a, doc_b, jaccard)``
    with doc_a < doc_b and jaccard ≥ threshold. Plan: explode shingles →
    self-join on shingle → count intersections → ratio vs sizes."""
    sh = docs.select(
        F.col("doc_id"), F.explode(shingles(F.col(text_col), n)).alias("sh")
    )
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(b, "sh")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    return (
        inter.join(sizes.withColumnRenamed("doc_id", "doc_a")
                   .withColumnRenamed("sz", "sza"), "doc_a")
        .join(sizes.withColumnRenamed("doc_id", "doc_b")
              .withColumnRenamed("sz", "szb"), "doc_b")
        .select(
            "doc_a",
            "doc_b",
            (
                F.col("inter")
                / (F.col("sza") + F.col("szb") - F.col("inter"))
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def minhash_params(num_hashes: int, seed: int = 42) -> tuple[list[int], list[int]]:
    """Deterministic affine-permutation parameters (a odd, b) — the same
    sequence any oracle implementation regenerates from the seed."""
    rng = np.random.RandomState(seed)
    a = (rng.randint(1, _MERSENNE_P, size=num_hashes).astype(np.int64) | 1).tolist()
    b = rng.randint(0, _MERSENNE_P, size=num_hashes).astype(np.int64).tolist()
    return a, b


def minhash_signatures(
    docs: DataFrame,
    num_hashes: int = 64,
    shingle_n: int = 3,
    seed: int = 42,
    text_col: str = "text",
) -> DataFrame:
    """``(doc_id, sig: array<long>)`` MinHash signatures.

    Shingle keys are :func:`md5_key48` (bit-identical in Spark, the Python
    ``hashlib`` replica, and the DuckDB SQL oracle); the k affine
    permutations + min-fold run in ONE vectorized numpy pandas UDF per Arrow
    batch (``min(((x mod P)\u00b7a_i + b_i) mod P)`` per slot). An earlier
    all-Catalyst variant with k array-transform expressions compiled into a
    pathological codegen unit; the numpy kernel is far faster and exactly
    equal (int64 math, no overflow: (x mod P) < 2^31, a_i < 2^31)."""
    a_list, b_list = minhash_params(num_hashes, seed)
    a_np = np.array(a_list, dtype=np.int64)
    b_np = np.array(b_list, dtype=np.int64)
    p = _MERSENNE_P

    sh = shingles(F.col(text_col), shingle_n)
    keys = F.transform(sh, lambda s: md5_key48(s))

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def sig_udf(key_arrays: pd.Series) -> pd.Series:
        # Deliberately per-ROW inside the Arrow batch: each (keys x hashes)
        # matrix is a few hundred x 64 int64s and stays in L1/L2. Measured
        # alternatives that vectorize across rows LOSE on cache locality:
        # flattening the whole batch into one (N_total x 64) pass +
        # minimum.reduceat ran 40x slower (hundreds of MB of intermediates
        # thrash), a per-hash transposed loop 2x slower — both bit-identical.
        out = []
        for keys_row in key_arrays:
            x = np.asarray(keys_row, dtype=np.int64) % p
            vals = (x[:, None] * a_np + b_np) % p
            out.append(vals.min(axis=0))
        return pd.Series(out)

    return docs.select(F.col("doc_id"), sig_udf(keys).alias("sig"))


def minhash_lsh_pairs(
    docs: DataFrame,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    threshold: float = 0.7,
    seed: int = 42,
    text_col: str = "text",
    max_bucket_size: int | None = 1000,
) -> DataFrame:
    """Near-duplicate candidate pairs ``(doc_a, doc_b, est_jaccard)`` via
    LSH banding (rows = num_hashes/bands per band); pairs sharing ≥1 band
    bucket are scored by signature agreement and filtered at ``threshold``.

    Scale behavior: buckets are a groupBy on (band, bucket_hash); only
    colliding docs join. Hot buckets (boilerplate text hashing to one
    bucket) make the candidate self-join quadratic in bucket size — a
    single 10^6-doc bucket is 10^12 candidate pairs. ``max_bucket_size``
    caps that: buckets larger than the cap are DROPPED from candidate
    generation (docs in them still pair through their other, smaller
    bands). The exact-dedup path catches identical boilerplate anyway, so
    the recall loss is confined to near-identical giant clusters. Set
    ``max_bucket_size=None`` to disable (small/verification runs only)."""
    assert num_hashes % bands == 0, "bands must divide num_hashes"
    rows_per_band = num_hashes // bands
    sigs = minhash_signatures(docs, num_hashes, shingle_n, seed, text_col)
    sigs = sigs.persist()
    banded = sigs.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(bi).alias("band"),
                        F.xxhash64(
                            F.slice(F.col("sig"), bi * rows_per_band + 1, rows_per_band)
                        ).alias("bucket"),
                    )
                    for bi in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("doc_id", "bb.band", "bb.bucket")
    if max_bucket_size is not None:
        # hot-bucket cap: one aggregate over the banded rows, then an
        # inner join keeps only rows in buckets under the cap. Broadcast is
        # wrong here (bucket count ~ |docs|·bands); sort-merge is fine — it
        # reuses the (band,bucket) shuffle the candidate join needs anyway.
        small = (
            banded.groupBy("band", "bucket")
            .agg(F.count(F.lit(1)).alias("_bsz"))
            .filter(F.col("_bsz") <= max_bucket_size)
            .select("band", "bucket")
        )
        banded = banded.join(small, ["band", "bucket"])
    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(b, ["band", "bucket"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )
    sa = sigs.select(F.col("doc_id").alias("doc_a"), F.col("sig").alias("_sa"))
    sb = sigs.select(F.col("doc_id").alias("doc_b"), F.col("sig").alias("_sb"))
    est = (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            (
                F.size(
                    F.filter(
                        F.zip_with(
                            "_sa", "_sb", lambda x, y: (x == y).cast("int")
                        ),
                        lambda z: z == 1,
                    )
                )
                / F.lit(float(num_hashes))
            ).alias("est_jaccard"),
        )
        .filter(F.col("est_jaccard") >= threshold)
    )
    return est


def simhash_64(
    docs: DataFrame, text_col: str = "text", seed: int = 42
) -> DataFrame:
    """``(doc_id, simhash: long)`` — :data:`SIMHASH_BITS`-bit SimHash over
    token hashes.

    Token hashes: :func:`md5_key60` over the seeded token (cross-engine
    exact — Spark, hashlib, DuckDB agree); the bit-vote fold runs in a
    vectorized pandas UDF (numpy unpack → sign sum → pack), Arrow-batched —
    no per-row Python at the DataFrame surface."""
    toks = tokenize(normalized_text(F.col(text_col)))
    hbits = F.transform(
        toks, lambda t: md5_key60(F.concat(F.lit(str(seed)), t))
    )
    with_h = docs.select(F.col("doc_id"), hbits.alias("hs"))
    nbits = SIMHASH_BITS

    @F.pandas_udf(T.LongType())
    def fold(hs: pd.Series) -> pd.Series:
        # Per-ROW inside the Arrow batch on purpose — a cross-row flatten +
        # add.reduceat variant measured 0.92x (slightly SLOWER, same
        # cache-locality story as the minhash kernel); the final bit-pack
        # uses one weights dot instead of a Python bit loop.
        weights = np.uint64(1) << np.arange(nbits, dtype=np.uint64)
        out = np.empty(len(hs), dtype=np.int64)
        for i, arr in enumerate(hs):
            if arr is None or len(arr) == 0:
                out[i] = 0
                continue
            v = np.asarray(arr, dtype=np.int64).astype(np.uint64)
            bits = ((v[:, None] >> np.arange(nbits, dtype=np.uint64)) & 1).astype(
                np.int64
            )
            votes = np.where(bits > 0, 1, -1).sum(axis=0)
            out[i] = (((votes > 0).astype(np.uint64) * weights).sum()).astype(
                np.int64
            )
        return pd.Series(out)

    return with_h.select("doc_id", fold("hs").alias("simhash"))


def simhash_pairs(
    docs: DataFrame,
    max_hamming: int = 3,
    text_col: str = "text",
    seed: int = 42,
    blocks: int = 6,
) -> DataFrame:
    """Near-dup pairs ``(doc_a, doc_b, hamming)`` with hamming ≤ max_hamming.

    Blocking: split the :data:`SIMHASH_BITS`-bit simhash into ``blocks``
    contiguous blocks — any pair within hamming ≤ blocks-1 shares at least
    one exact block (pigeonhole), so candidates = equi-join per block.
    Recall is only guaranteed for ``max_hamming <= blocks - 1``; larger
    values would silently miss qualifying pairs, so they are rejected."""
    if max_hamming >= blocks:
        raise ValueError(
            f"simhash blocking guarantees recall only for max_hamming <= "
            f"blocks-1 (got max_hamming={max_hamming}, blocks={blocks}); "
            f"raise `blocks` to cover larger distances"
        )
    if SIMHASH_BITS % blocks != 0:
        raise ValueError(
            f"blocks={blocks} must divide SIMHASH_BITS={SIMHASH_BITS} "
            f"(pigeonhole coverage)"
        )
    sh = simhash_64(docs, text_col, seed).persist()
    width = SIMHASH_BITS // blocks
    mask = (1 << width) - 1
    block_rows = sh.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("blk"),
                        (
                            F.shiftrightunsigned("simhash", i * width)
                            .bitwiseAND(F.lit(mask))
                        ).alias("key"),
                    )
                    for i in range(blocks)
                ]
            )
        ).alias("bk"),
    ).select("doc_id", "simhash", "bk.blk", "bk.key")
    a, b = block_rows.alias("a"), block_rows.alias("b")
    cand = (
        a.join(b, ["blk", "key"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.simhash").alias("_ha"),
            F.col("b.simhash").alias("_hb"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("_ha").bitwiseXOR(F.col("_hb")))
    return cand.select(
        "doc_a", "doc_b", hamming.alias("hamming")
    ).filter(F.col("hamming") <= max_hamming)


def duplicate_clusters(docs: DataFrame, pairs: DataFrame) -> DataFrame:
    """Resolve candidate duplicate PAIRS into duplicate CLUSTERS and pick
    one keeper per cluster: ``(doc_id, cluster, keep)``.

    ``pairs`` is any ``(doc_a, doc_b)`` DataFrame (from exact, n-gram,
    MinHash-LSH or SimHash candidates); clusters are the connected
    components of the pair graph (transitive closure — A~B, B~C ⇒ one
    cluster), computed with the engine's distributed hash-min CC operator
    (operators/components.py). Docs in no pair form singleton clusters.
    ``cluster`` = min doc_id in the cluster; ``keep`` = (doc_id == cluster),
    i.e. keep exactly one doc per near-duplicate cluster."""
    from metagraph_spark.graph import build
    from metagraph_spark.operators.components import connected_components

    edges = pairs.select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    )
    g = build(
        edges,
        nodes=docs.select(F.col("doc_id").alias("id")),
        is_directed=False,
    )
    cc = connected_components(g)
    return cc.select(
        F.col("id").alias("doc_id"),
        F.col("label").alias("cluster"),
        (F.col("id") == F.col("label")).alias("keep"),
    )
