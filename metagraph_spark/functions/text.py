"""Text analysis over a documents table ``(doc_id, text, ...)``.

All pure JVM-side column expressions (whole-stage codegen; zero Python in
the hot path), so they run at scan speed and push down through Catalyst:

- ``tokenize``: whitespace split (the BPE-ish regex variant keeps
  punctuation as its own tokens).
- ``token_count`` / ``char_count``.
- ``quality_features`` / ``quality_score``: length, punctuation ratio,
  stopword ratio, mean word length, repetition — the classic cheap quality
  heuristics (C4/Gopher-style rules, public recipe).
- ``language_id``: stopword-hit heuristic over a tiny per-language lexicon
  (n-gram/stopword language ID is a standard public technique).
- ``fingerprint``: order-sensitive 64-bit document fingerprint via
  xxhash64 of the normalized text (rolling content hash analog).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

TOKEN_SPLIT_RE = r"\s+"
# BPE-ish: words, numbers, or single punctuation marks
BPE_TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "it", "that", "for"],
    "es": ["el", "la", "de", "y", "que", "en", "un", "una", "es", "por"],
    "de": ["der", "die", "das", "und", "ist", "ein", "eine", "zu", "mit", "von"],
    "fr": ["le", "la", "de", "et", "que", "en", "un", "une", "est", "pour"],
}


def tokenize(text: Column, pattern: str = TOKEN_SPLIT_RE) -> Column:
    """array<string> of tokens; empty strings removed."""
    return F.filter(F.split(F.trim(text), pattern), lambda t: t != "")


def bpe_ish_tokens(text: Column) -> Column:
    """Regex token stream that isolates punctuation (BPE-ish pre-tokenizer)."""
    return F.regexp_extract_all(F.lower(text), F.lit(BPE_TOKEN_RE), 0)


def token_count(text: Column) -> Column:
    return F.size(tokenize(text))


def char_count(text: Column) -> Column:
    return F.length(text)


def punct_ratio(text: Column) -> Column:
    """(#non-alnum-non-space chars) / max(1, #chars)."""
    punct = F.length(F.regexp_replace(text, r"[A-Za-z0-9\s]", ""))
    return punct / F.greatest(F.length(text), F.lit(1))


def stopword_ratio(text: Column, lang: str = "en") -> Column:
    toks = tokenize(F.lower(text))
    sw = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    hits = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    return hits / F.greatest(F.size(toks), F.lit(1))


def mean_word_length(text: Column) -> Column:
    toks = tokenize(text)
    total = F.aggregate(
        toks, F.lit(0), lambda acc, t: acc + F.length(t)
    )
    return total / F.greatest(F.size(toks), F.lit(1))


def repetition_ratio(text: Column) -> Column:
    """1 - distinct_tokens/tokens — crude boilerplate/repetition signal."""
    toks = tokenize(F.lower(text))
    return F.lit(1.0) - F.size(F.array_distinct(toks)) / F.greatest(
        F.size(toks), F.lit(1)
    )


def quality_score(text: Column) -> Column:
    """Composite [0,1] quality score from the cheap heuristics: long enough,
    low punctuation, low repetition, sane word length. Deterministic,
    monotone in each feature."""
    n_tok = token_count(text)
    len_ok = F.least(n_tok / F.lit(20.0), F.lit(1.0))
    punct_ok = F.lit(1.0) - F.least(punct_ratio(text) * 4, F.lit(1.0))
    rep_ok = F.lit(1.0) - repetition_ratio(text)
    mwl = mean_word_length(text)
    mwl_ok = F.when((mwl >= 3) & (mwl <= 10), F.lit(1.0)).otherwise(F.lit(0.5))
    return (len_ok + punct_ok + rep_ok + mwl_ok) / 4


def language_id(text: Column) -> Column:
    """Best-guess language from stopword hit counts; 'und' when nothing
    matches. Pure CASE/array expressions — one pass over the tokens."""
    toks = tokenize(F.lower(text))
    scores = []
    for lang, words in STOPWORDS.items():
        sw = F.array(*[F.lit(w) for w in words])
        scores.append(
            (lang, F.size(F.filter(toks, lambda t: F.array_contains(sw, t))))
        )
    best = None
    best_score = None
    # fold into nested CASE: pick argmax with deterministic lang-order tiebreak
    expr = F.lit("und")
    max_expr = F.lit(0)
    for lang, score in scores:
        expr = F.when(score > max_expr, F.lit(lang)).otherwise(expr)
        max_expr = F.greatest(max_expr, score)
    return expr


def fingerprint(text: Column) -> Column:
    """64-bit content fingerprint of whitespace-normalized lowercase text."""
    normalized = F.regexp_replace(F.lower(F.trim(text)), r"\s+", " ")
    return F.xxhash64(normalized)
