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


def _bind(col: Column, fn) -> Column:
    """Let-binding for column expressions (r10): evaluate ``col`` ONCE per
    row and pass the bound lambda variable to ``fn``.

    Catalyst does not CSE a subtree that appears several times inside (or
    around) a higher-order-function lambda — each reference re-evaluates
    it. Wrapping the value in a 1-element array and ``transform``-ing it
    turns the subtree into a lambda VARIABLE, which IS shared: inside
    ``fn`` every reference is an attribute read. Same values, same order —
    only the evaluation count changes (e.g. ``shingles`` used to re-run
    the whitespace tokenizer once PER SHINGLE INDEX — O(tokens²) regex
    splits per document; bound, it runs once per document).

    Schema caveat (ADVICE r10): ``element_at`` is nullable, so a bound
    expression reports nullable=true even when ``col`` could not be null
    (e.g. a constant sum). Values are unchanged and the driver's oracle
    schema check compares names+types, not nullability (every bound
    query is schema_match green in CORRECTNESS_r10) — but strict writers
    diffing nullability will see the flip; unwrap or cast at the sink if
    that ever matters."""
    return F.element_at(F.transform(F.array(col), fn), 1)


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
    sw = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    return _bind(
        tokens(F.lower(_c(col))),
        lambda toks: F.when(
            F.size(toks) > 0,
            F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
            / F.size(toks),
        ).otherwise(F.lit(0.0)),
    )


def detect_language(col: Column | str) -> Column:
    """Language-ID heuristic: CJK-character detection for zh, else the
    stopword profile with the highest hit ratio, defaulting to en."""
    c = _c(col)
    cjk = F.length(F.regexp_replace(c, r"[^一-鿿]", ""))

    # Bind the four ratio expressions once (r10): the best/best_score
    # when-chains reference each score several times, and un-bound that
    # re-evaluated the whole tokenize+filter pipeline per reference
    # (exponentially in the chain depth). Bound, each reference is an
    # array-element read; comparisons and result are unchanged.
    def _pick(s) -> Column:
        order = list(STOPWORDS)  # en, de, es, fr
        best = F.lit("en")
        best_score = F.element_at(s, order.index("en") + 1)
        for lang in ("de", "es", "fr"):
            sc = F.element_at(s, order.index(lang) + 1)
            best = F.when(sc > best_score, F.lit(lang)).otherwise(best)
            best_score = F.when(sc > best_score, sc).otherwise(best_score)
        return best

    best = _bind(
        F.array(*[stopword_ratio(c, lang) for lang in STOPWORDS]), _pick
    )
    return F.when(cjk > 0, F.lit("zh")).otherwise(best)


def quality_score(col: Column | str) -> Column:
    """Composite quality score in [0, 1]: length band + low punctuation +
    mean-word-length band. Deterministic, codegen-friendly."""
    c = _c(col)
    n_chr = char_count(c).cast("double")
    punct_ok = F.when(punct_ratio(c) < 0.2, F.lit(0.3)).otherwise(F.lit(0.0))

    # n_tok is referenced four times below; bound once (r10) so the
    # tokenizer runs once per row instead of once per reference.
    def _score(n_tok: Column) -> Column:
        mean_word = F.when(n_tok > 0, n_chr / n_tok).otherwise(F.lit(0.0))
        len_ok = F.when(
            (n_tok >= 5) & (n_tok <= 100000), F.lit(0.4)
        ).otherwise(F.lit(0.0))
        word_ok = F.when(
            (mean_word >= 2.0) & (mean_word <= 12.0), F.lit(0.3)
        ).otherwise(F.lit(0.0))
        return len_ok + punct_ok + word_ok

    return _bind(token_count(c).cast("double"), _score).alias("quality")


def prep_stats(col: Column | str, min_quality: float = 0.7) -> Column:
    """``struct(n_tok int, quality double, keep boolean)`` from ONE bound
    tokenizer evaluation (r11).

    The corpus-prep shape referenced ``token_count``/``quality_score`` from
    a pre-filter, a quality filter and the output projection; Catalyst's
    filter pushdown substitutes each alias with its full expression, so the
    whitespace tokenizer ran 3× per row. Deriving every consumer column
    from one struct keeps a single bound tokenizer subtree per operator
    after substitution (quality is let-bound too, so the punct-strip regex
    also runs once). Field values are bit-identical to ``token_count`` /
    ``quality_score`` / their filter conjunction: same sub-expressions,
    same op order, only the evaluation count changes."""
    c = _c(col)
    n_chr = char_count(c).cast("double")
    punct_ok = F.when(punct_ratio(c) < 0.2, F.lit(0.3)).otherwise(F.lit(0.0))

    def _fields(t: Column) -> Column:
        n_tok = F.size(t)
        n_tok_d = n_tok.cast("double")
        mean_word = F.when(n_tok_d > 0, n_chr / n_tok_d).otherwise(F.lit(0.0))
        len_ok = F.when(
            (n_tok_d >= 5) & (n_tok_d <= 100000), F.lit(0.4)
        ).otherwise(F.lit(0.0))
        word_ok = F.when(
            (mean_word >= 2.0) & (mean_word <= 12.0), F.lit(0.3)
        ).otherwise(F.lit(0.0))
        return _bind(
            len_ok + punct_ok + word_ok,
            lambda q: F.struct(
                n_tok.alias("n_tok"),
                q.alias("quality"),
                ((n_tok > 0) & (q >= F.lit(min_quality))).alias("keep"),
            ),
        )

    return _bind(tokens(c), _fields)


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
    return _bind(
        tokens(F.lower(_c(col))),
        lambda t: F.transform(
            F.sequence(F.lit(1), F.greatest(F.size(t) - (k - 1), F.lit(1))),
            lambda i: F.array_join(F.slice(t, i, k), " "),
        ),
    )
