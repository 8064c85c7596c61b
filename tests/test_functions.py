"""Training-data pipeline function tests: dedup / similarity / text /
multimodal. Oracles: pure Python (hashlib.md5 MinHash replica), DuckDB
(list_cosine_similarity), numpy brute force.
"""

import hashlib
import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from metagraph_spark.functions import dedup, similarity, text
from metagraph_spark.functions.multimodal import (
    extract_features,
    sample_frames,
    synthesize_media,
)

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "the quick brown fox jumps over the lazy cat"),
    (2, "The  quick brown fox jumps over the lazy dog"),  # exact dup of 0 (norm)
    (3, "completely different text about spark engines and shuffles"),
    (4, "el rapido zorro marron salta sobre el perro perezoso y la casa es"),
    (5, "the quick brown fox jumps over the lazy dog"),  # exact dup of 0
]


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_exact_duplicates(spark, docs_df):
    groups = dedup.exact_duplicates(docs_df).collect()
    ids = {r["doc_id"] for r in groups}
    assert ids == {0, 2, 5}
    keepers = {r["doc_id"] for r in groups if r["keep"]}
    assert keepers == {0}


def test_ngram_jaccard_pairs(spark, docs_df):
    pairs = dedup.ngram_jaccard_pairs(docs_df, n=3, threshold=0.5).collect()
    got = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in pairs}
    # oracle: python shingle jaccard
    def sh(t):
        toks = " ".join(t.lower().split()).split(" ")
        return set(" ".join(toks[i:i+3]) for i in range(max(len(toks)-2, 1)))
    expected = {}
    for i, ta in DOCS:
        for j, tb in DOCS:
            if i < j:
                a, b = sh(ta), sh(tb)
                jac = len(a & b) / len(a | b)
                if jac >= 0.5:
                    expected[(i, j)] = jac
    assert set(got) == set(expected)
    for k in expected:
        assert math.isclose(got[k], expected[k], rel_tol=1e-12)


def python_minhash(text_str, num_hashes, n=3, seed=42):
    """Oracle replica: same md5-48bit keys, same affine permutations."""
    a, b = dedup.minhash_params(num_hashes, seed)
    toks = " ".join(text_str.lower().split()).split(" ")
    if len(toks) >= n:
        shs = set(" ".join(toks[i:i+n]) for i in range(len(toks) - n + 1))
    else:
        shs = {" ".join(toks)}
    keys = [
        int(hashlib.md5(s.encode()).hexdigest()[:12], 16) for s in shs
    ]
    P = dedup._MERSENNE_P
    return [min(((x % P) * a[i] + b[i]) % P for x in keys) for i in range(num_hashes)]


def test_minhash_signature_matches_python_oracle(spark, docs_df):
    sigs = {r["doc_id"]: r["sig"] for r in
            dedup.minhash_signatures(docs_df, num_hashes=32).collect()}
    for doc_id, t in DOCS:
        assert sigs[doc_id] == python_minhash(t, 32), doc_id


def test_minhash_lsh_finds_near_dups(spark, docs_df):
    pairs = dedup.minhash_lsh_pairs(
        docs_df, num_hashes=64, bands=16, threshold=0.5
    ).collect()
    got = {(r["doc_a"], r["doc_b"]) for r in pairs}
    # exact dups must always collide with estimate 1.0
    assert (0, 2) in got and (0, 5) in got and (2, 5) in got
    est = {(r["doc_a"], r["doc_b"]): r["est_jaccard"] for r in pairs}
    assert est[(0, 5)] == 1.0
    # near-dup 0-1 (one word differs) should be found at 0.5
    assert (0, 1) in got


def test_minhash_hot_bucket_cap(spark):
    """One boilerplate cluster hashing to a single LSH bucket must not make
    the candidate join quadratic: buckets over max_bucket_size are dropped
    (docs in them still pair through other, smaller bands; identical
    boilerplate is the exact-dedup path's job). Bounded time + correct
    survivors."""
    import time as _time

    boiler = "this exact license header boilerplate appears on every file"
    rows = [(i, boiler) for i in range(5000)]
    rows += [
        (10_000, "a unique document all about spark shuffles and joins"),
        (10_001, "a unique document all about spark shuffles and join"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    t0 = _time.time()
    pairs = dedup.minhash_lsh_pairs(
        docs, num_hashes=16, bands=4, threshold=0.5, max_bucket_size=100
    ).collect()
    dt = _time.time() - t0
    got = {(r["doc_a"], r["doc_b"]) for r in pairs}
    # the 5000-doc boilerplate cluster was dropped from candidates entirely
    assert not any(a < 5000 and b < 5000 for a, b in got)
    # small buckets still pair: the near-dup unique pair survives
    assert (10_000, 10_001) in got
    assert dt < 120, f"hot bucket not bounded: {dt:.1f}s"
    # ...and the exact path catches the boilerplate cluster regardless
    groups = dedup.exact_duplicates(docs).collect()
    assert {r["doc_id"] for r in groups} == set(range(5000))


def test_simhash(spark, docs_df):
    sh = {r["doc_id"]: r["simhash"] for r in dedup.simhash_64(docs_df).collect()}
    # normalized-identical docs -> identical simhash
    assert sh[0] == sh[2] == sh[5]
    # near-identical docs -> small hamming
    ham = bin((sh[0] ^ sh[1]) & ((1 << 64) - 1)).count("1")
    assert ham <= 16
    # unrelated docs -> larger hamming than near-dups
    ham_far = bin((sh[0] ^ sh[3]) & ((1 << 64) - 1)).count("1")
    assert ham_far > ham
    # 60-bit simhash: blocks=20 (width 3) guarantees recall to hamming 19
    pairs = dedup.simhash_pairs(docs_df, max_hamming=16, blocks=20).collect()
    got = {(r["doc_a"], r["doc_b"]) for r in pairs}
    assert (0, 2) in got and (0, 5) in got
    # recall guarantee violated -> explicit error, not silent misses
    with pytest.raises(ValueError):
        dedup.simhash_pairs(docs_df, max_hamming=6, blocks=6)


@pytest.fixture(scope="module")
def emb_df(spark):
    return spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")


def test_cosine_topk_matches_numpy(spark, emb_df):
    sub = emb_df.limit(120)
    got = similarity.cosine_topk_bruteforce(sub, sub.limit(10), k=5)
    rows = got.collect()
    pdf = sub.toPandas()
    m = np.vstack(pdf.embedding.to_numpy()).astype(np.float64)
    m = m / np.linalg.norm(m, axis=1, keepdims=True)
    ids = pdf.vec_id.to_numpy()
    sims = m @ m.T
    for qpos in range(10):
        qid = ids[qpos]
        order = sorted(
            [(float(sims[qpos, j]), int(ids[j])) for j in range(len(ids)) if ids[j] != qid],
            key=lambda t: (-t[0], t[1]),
        )[:5]
        expected = [nid for _, nid in order]
        got_n = [r["neighbor_id"] for r in sorted(
            (r for r in rows if r["query_id"] == qid), key=lambda r: r["rank"])]
        assert got_n == expected, qid


def test_lsh_topk_recall(spark, emb_df):
    sub = emb_df.limit(300)
    queries = sub.limit(20)
    exact = similarity.cosine_topk_bruteforce(sub, queries, k=10).collect()
    # testdata embeddings are near-random (top-10 cosine ~0.27): collision
    # prob per bit ~0.59, so keep bands short and tables many
    approx = similarity.lsh_topk(
        sub, queries, k=10, bits=4, num_tables=16
    ).collect()
    exact_sets = {}
    for r in exact:
        exact_sets.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    approx_sets = {}
    for r in approx:
        approx_sets.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    recalls = [
        len(exact_sets[q] & approx_sets.get(q, set())) / len(exact_sets[q])
        for q in exact_sets
    ]
    assert sum(recalls) / len(recalls) >= 0.6, recalls


def test_text_functions(spark, docs_df):
    out = docs_df.select(
        "doc_id",
        text.token_count(F.col("text")).alias("ntok"),
        text.punct_ratio(F.col("text")).alias("punct"),
        text.stopword_ratio(F.col("text")).alias("sw"),
        text.quality_score(F.col("text")).alias("q"),
        text.language_id(F.col("text")).alias("lang"),
        text.fingerprint(F.col("text")).alias("fp"),
    ).collect()
    by_id = {r["doc_id"]: r for r in out}
    assert by_id[0]["ntok"] == 9
    assert by_id[0]["sw"] == pytest.approx(2 / 9)  # two "the"
    assert by_id[0]["lang"] == "en"
    assert by_id[4]["lang"] == "es"
    assert by_id[0]["fp"] == by_id[2]["fp"] == by_id[5]["fp"]
    assert 0.0 <= by_id[0]["q"] <= 1.0
    # quality: repetitive junk scores below normal prose
    junk = spark.createDataFrame([(9, "spam " * 50)], "doc_id long, text string")
    junk_q = junk.select(text.quality_score(F.col("text")).alias("q")).collect()[0]["q"]
    assert junk_q < by_id[3]["q"]


def test_multimodal_pipeline(spark):
    media = synthesize_media(spark, 20, kind="video")
    feats = extract_features(media, feature_dim=32, fake=True)
    rows = feats.collect()
    assert len(rows) == 20
    assert all(len(r["feature"]) == 32 for r in rows)
    # deterministic
    again = extract_features(media, feature_dim=32, fake=True).collect()
    assert sorted(map(str, rows)) == sorted(map(str, again))
    frames = sample_frames(media, frame_dim=16, fake=True)
    n_frames = media.select(F.sum("meta.n_frames")).collect()[0][0]
    assert frames.count() == n_frames
    # stub path: real decode raises cleanly
    with pytest.raises(Exception) as ei:
        extract_features(media, fake=False).collect()
    assert "NotImplementedError" in str(ei.value) or "decode" in str(ei.value)


def test_byte_features_real(spark):
    from metagraph_spark.functions.multimodal import (
        byte_features,
        chunk_fingerprints,
        exact_media_duplicates,
    )
    import math as _math

    rows = [(0, b"aaaa"), (1, b"abab"), (2, b"aaaa"), (3, b"")]
    media = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {r["media_id"]: r for r in byte_features(media).collect()}
    assert got[0]["n_bytes"] == 4 and got[0]["n_distinct"] == 1
    assert got[0]["byte_entropy"] == 0.0
    assert _math.isclose(got[1]["byte_entropy"], 1.0)  # two equiprobable bytes
    assert _math.isclose(got[1]["mean_byte"], (97 + 98) / 2)
    assert got[3]["n_bytes"] == 0 and got[3]["byte_entropy"] == 0.0
    # chunk fingerprints: identical payloads share all chunk hashes
    ch = chunk_fingerprints(media.filter("media_id < 3"), chunk_bytes=2).collect()
    by_id = {}
    for r in ch:
        by_id.setdefault(r["media_id"], []).append((r["chunk_idx"], r["chunk_hash"]))
    assert sorted(by_id[0]) == sorted(by_id[2])
    assert sorted(by_id[0]) != sorted(by_id[1])
    # exact duplicates: 0 and 2 grouped, keeper = min id
    dup = {r["media_id"]: r["keep"] for r in exact_media_duplicates(media).collect()}
    assert dup[0] is True and dup[2] is False and dup[1] is True


def test_ivf_topk_structure_and_recall(spark, emb_df):
    """IVF ANN: every reported neighbor must live in a probed cell of its
    query, results are deterministic across runs, and recall vs brute
    force is non-trivial at nprobe=8/16 cells."""
    sub = emb_df.limit(300)
    queries = sub.limit(20)
    got = similarity.ivf_topk(sub, queries, k=10, num_cells=16, nprobe=8)
    rows = got.collect()
    again = similarity.ivf_topk(sub, queries, k=10, num_cells=16, nprobe=8).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))  # deterministic
    # per query: ranks contiguous from 1, neighbors unique, no self
    per_q = {}
    for r in rows:
        per_q.setdefault(r["query_id"], []).append(r)
    for qid, rs in per_q.items():
        ranks = sorted(r["rank"] for r in rs)
        assert ranks == list(range(1, len(rs) + 1))
        ns = [r["neighbor_id"] for r in rs]
        assert len(set(ns)) == len(ns) and qid not in ns
    exact = similarity.cosine_topk_bruteforce(sub, queries, k=10).collect()
    exact_sets = {}
    for r in exact:
        exact_sets.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    approx_sets = {q: {r["neighbor_id"] for r in rs} for q, rs in per_q.items()}
    recalls = [
        len(exact_sets[q] & approx_sets.get(q, set())) / len(exact_sets[q])
        for q in exact_sets
    ]
    assert sum(recalls) / len(recalls) >= 0.5, recalls


def test_ngram_jaccard_duckdb_oracle(spark):
    """Replaces the retired `dedup_ngram_jaccard` queries() entry (dropped to
    fit the driver's 50-row correctness-artifact cap): same Spark query vs the
    same DuckDB oracle (`_extra_dedup_ngram_jaccard`), same compare semantics
    (sorted columns, floats rounded to 6)."""
    import duckdb

    import __spark_entry__ as entrymod

    sf = "/root/testdata/sf0.001"
    got = (
        dedup.ngram_jaccard_pairs(
            spark.read.parquet(f"{sf}/documents.parquet"), n=3, threshold=0.8
        )
        .select("doc_a", "doc_b", F.round("jaccard", 6).alias("jaccard"))
        .orderBy("doc_a", "doc_b")
        .collect()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')"
    )
    sql = entrymod._oracle_sql_raw()["_extra_dedup_ngram_jaccard"]
    want = con.execute(entrymod._materialize_ctes(sql)).fetchall()
    got_n = sorted((r["doc_a"], r["doc_b"], round(r["jaccard"], 6)) for r in got)
    want_n = sorted((a, b, round(j, 6)) for a, b, j in want)
    assert got_n == want_n and len(got_n) > 0


def test_ivf_lloyd_refinement_improves_recall(spark, emb_df):
    """Lloyd refinement (spherical k-means over the seeded init) must not
    hurt — and on this corpus measurably improves — recall vs brute force
    at FIXED nprobe (measured here: 0.455 → 0.545 @ nprobe=4, k=10)."""
    sub = emb_df.limit(300)
    queries = sub.limit(20)
    exact = similarity.cosine_topk_bruteforce(sub, queries, k=10).collect()
    es = {}
    for r in exact:
        es.setdefault(r["query_id"], set()).add(r["neighbor_id"])

    def recall(lloyd_iters):
        got = similarity.ivf_topk(
            sub, queries, k=10, num_cells=16, nprobe=4, lloyd_iters=lloyd_iters
        ).collect()
        ap = {}
        for r in got:
            ap.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        return sum(
            len(es[q] & ap.get(q, set())) / len(es[q]) for q in es
        ) / len(es)

    r0, r2 = recall(0), recall(2)
    assert r2 > r0, (r0, r2)
    assert r2 >= 0.5, r2


def test_media_decode_probe(spark):
    """fake=False must decode through Pillow when the container ships it
    (skip-marked here) and raise NotImplementedError when it does not —
    never silently fall back to the fake."""
    from metagraph_spark.functions.multimodal import pil_available

    media = synthesize_media(spark, 4)
    if not pil_available():
        with pytest.raises(Exception) as ei:
            extract_features(media, feature_dim=8, fake=False).collect()
        assert "NotImplementedError" in str(ei.value) or isinstance(
            ei.value, NotImplementedError
        )
    else:  # future container with Pillow: synthetic payloads are not valid
        # images, so a real decode error (not NotImplementedError) is the
        # correct outcome; real-image decoding is covered below
        with pytest.raises(Exception) as ei:
            extract_features(media, feature_dim=8, fake=False).collect()
        assert "NotImplementedError" not in str(ei.value)


@pytest.mark.skipif(
    not __import__(
        "metagraph_spark.functions.multimodal", fromlist=["pil_available"]
    ).pil_available(),
    reason="Pillow not in this container (probe is the product behavior)",
)
def test_media_decode_real_pillow(spark):
    """Runs only when Pillow exists: a real 2x2 PNG decodes to the expected
    normalized grayscale feature."""
    import io

    from PIL import Image

    buf = io.BytesIO()
    Image.new("L", (2, 2), color=128).save(buf, format="PNG")
    payload = buf.getvalue()
    media = spark.createDataFrame(
        [(1, "image", payload, (2, 2, 0, 1))],
        "media_id long, kind string, payload binary, "
        "meta struct<width:int, height:int, sample_rate:int, n_frames:int>",
    )
    rows = extract_features(media, feature_dim=4, fake=False).collect()
    assert len(rows) == 1 and len(rows[0]["feature"]) == 4
    assert all(abs(v - 128 / 255.0) < 1e-6 for v in rows[0]["feature"])
