"""Text-analysis column expressions (north-star N4, SURVEY.md §2.10).

All pure Catalyst expressions (no Python UDFs): tokenization, token/char
statistics, quality scoring, a stopword-profile language-ID heuristic, and a
deterministic document fingerprint. At 100 TB these run inside whole-stage
codegen over the parquet scan — no shuffle except where an explode→groupBy
(term frequency) genuinely requires one.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def tokens(col: Column | str) -> Column:
    """Whitespace tokenization → array<string>; empty strings removed."""
    return F.filter(F.split(F.trim(_c(col)), r"\s+"), lambda t: t != F.lit(""))


def token_count(col: Column | str) -> Column:
    """N4 token counting (whitespace tokens)."""
    return F.size(tokens(col))


def bpe_ish_token_count(col: Column | str) -> Column:
    """Token counting with a BPE-ish regex: splits off punctuation and digit
    runs the way byte-pair pre-tokenizers do (letters / digits / other)."""
    pieces = F.split(
        F.regexp_replace(_c(col), r"([^\sA-Za-z0-9]+|[0-9]+)", r" $1 "), r"\s+"
    )
    return F.size(F.filter(pieces, lambda t: t != F.lit("")))


def char_count(col: Column | str) -> Column:
    return F.length(_c(col))


def punct_ratio(col: Column | str) -> Column:
    """Fraction of characters that are not alphanumeric/space."""
    c = _c(col)
    stripped = F.regexp_replace(c, r"[A-Za-z0-9\s]", "")
    return F.when(F.length(c) > 0, F.length(stripped) / F.length(c)).otherwise(F.lit(0.0))


# Tiny per-language stopword profiles for the n-gram/stopword language-ID
# heuristic. Public common-word lists; enough to separate the fixture's
# {de,en,es,fr,zh} domains on real text.
STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "it", "was", "for"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "ein", "mit", "auf", "den"],
    "es": ["que", "los", "las", "una", "por", "con", "para", "del", "como", "más"],
    "fr": ["les", "des", "est", "dans", "pour", "une", "qui", "pas", "sur", "avec"],
}


def stopword_ratio(col: Column | str, lang: str = "en") -> Column:
    """Fraction of tokens that are stopwords of ``lang`` (quality signal)."""
    toks = tokens(F.lower(_c(col)))
    sw = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    hits = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    return F.when(F.size(toks) > 0, hits / F.size(toks)).otherwise(F.lit(0.0))


def detect_language(col: Column | str) -> Column:
    """Language-ID heuristic: CJK-character detection for zh, else the
    stopword profile with the highest hit ratio, defaulting to en."""
    c = _c(col)
    cjk = F.length(F.regexp_replace(c, r"[^一-鿿]", ""))
    scores = {lang: stopword_ratio(c, lang) for lang in STOPWORDS}
    best = F.lit("en")
    best_score = scores["en"]
    for lang in ("de", "es", "fr"):
        best = F.when(scores[lang] > best_score, F.lit(lang)).otherwise(best)
        best_score = F.when(scores[lang] > best_score, scores[lang]).otherwise(best_score)
    return F.when(cjk > 0, F.lit("zh")).otherwise(best)


def quality_score(col: Column | str) -> Column:
    """Composite quality score in [0, 1]: length band + low punctuation +
    mean-word-length band. Deterministic, codegen-friendly."""
    c = _c(col)
    n_tok = token_count(c).cast("double")
    n_chr = char_count(c).cast("double")
    mean_word = F.when(n_tok > 0, n_chr / n_tok).otherwise(F.lit(0.0))
    len_ok = F.when((n_tok >= 5) & (n_tok <= 100000), F.lit(0.4)).otherwise(F.lit(0.0))
    punct_ok = F.when(punct_ratio(c) < 0.2, F.lit(0.3)).otherwise(F.lit(0.0))
    word_ok = F.when((mean_word >= 2.0) & (mean_word <= 12.0), F.lit(0.3)).otherwise(
        F.lit(0.0)
    )
    return (len_ok + punct_ok + word_ok).alias("quality")


def fingerprint(col: Column | str) -> Column:
    """Deterministic 64-bit document fingerprint: xxhash64 of the
    token-normalized text (rolling-hash analogue, stable across runs)."""
    return F.xxhash64(F.array_join(tokens(F.lower(_c(col))), " "))


def shingles(col: Column | str, k: int = 3) -> Column:
    """Word k-shingles as array<string> — the MinHash/Jaccard input unit.

    Built with ``transform`` over token indices + ``slice`` so it stays a
    native expression; documents shorter than k words yield the whole text
    as one shingle.
    """
    toks = tokens(F.lower(_c(col)))
    n = F.size(toks)
    idx = F.sequence(F.lit(1), F.greatest(n - (k - 1), F.lit(1)))
    return F.transform(idx, lambda i: F.array_join(F.slice(toks, i, k), " "))
