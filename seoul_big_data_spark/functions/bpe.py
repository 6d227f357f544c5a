"""Subword (BPE-vocab) tokenization — the token-counting unit a training-
data pipeline actually bills by (whitespace tokens misestimate it; VERDICT
r8 #5).

Scheme: greedy longest-match encoding of whitespace-pre-tokenized words
against the frozen vocabulary in ``bpe_vocab.json`` (trained once by
``tools/gen_bpe_vocab.py`` — classic frequency-weighted BPE merges; merge
ORDER is not needed at encode time for the longest-match scheme). Any
character outside the vocab falls back to itself as a single-char token, so
encoding is total.

Scale shape (the dictionary-encode pattern): the per-word encoder runs over
the DISTINCT-word table — for a 100 TB corpus that is the vocabulary, a
table millions of rows small, not the corpus — via an Arrow-batched
mapInPandas; the corpus-sized work is an equi-join of the exploded words
against that encoded dictionary plus combinable aggregates. The Python cost
is one C-speed regex scan per DISTINCT word (alternation ordered by length
descending = longest-match-first), never per occurrence.
"""

from __future__ import annotations

import hashlib
import json
import os
import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_VOCAB_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)), "bpe_vocab.json")


def load_vocab() -> list[str]:
    with open(_VOCAB_PATH) as fh:
        return json.load(fh)["vocab"]


def _pattern(vocab: list[str]) -> re.Pattern:
    # Python alternation takes the FIRST matching branch at each position;
    # ordering branches by length descending makes that the LONGEST match.
    # Same-length distinct tokens cannot match the same position, so the
    # within-length lexicographic tie-break never fires. The (?s:.) tail is
    # the single-char fallback for out-of-vocab characters.
    alts = sorted(vocab, key=lambda t: (-len(t), t))
    return re.compile("|".join(re.escape(t) for t in alts) + "|(?s:.)")


def encode_word(word: str, pat: re.Pattern) -> list[str]:
    """Greedy longest-match token pieces of one word (total: every char is
    covered — vocab tokens first, single-char fallback otherwise)."""
    return pat.findall(word)


def piece_string(tokens: list[str]) -> str:
    """Length-prefixed serialization of one word's token pieces, with a
    trailing word terminator — injective over token SEQUENCES (``2:ab`` vs
    ``1:a1:b`` disambiguate alignment; ``/`` disambiguates word
    boundaries), so the md5 over a document's concatenated piece strings is
    a fingerprint of the exact tokenization. Mirrored verbatim in the
    DuckDB oracle (q_text.py::text_bpe_tokenize)."""
    return "".join(f"{len(t)}:{t}" for t in tokens) + "/"


def encode_words(words: DataFrame, word_col: str = "word") -> DataFrame:
    """Encode a DISTINCT-word frame → (word, n_toks, enc). Arrow-batched;
    the regex compiles once per executor python worker."""
    vocab = load_vocab()
    schema = T.StructType(
        [
            T.StructField(word_col, T.StringType()),
            T.StructField("n_toks", T.LongType()),
            T.StructField("enc", T.StringType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pat = _pattern(vocab)
        for pdf in batches:
            toks = [pat.findall(w) for w in pdf[word_col].astype(str)]
            yield pd.DataFrame(
                {
                    word_col: pdf[word_col],
                    "n_toks": [len(t) for t in toks],
                    "enc": [piece_string(t) for t in toks],
                }
            )

    return words.mapInPandas(run, schema)


def doc_fingerprint(enc_concat: str) -> str:
    return hashlib.md5(enc_concat.encode()).hexdigest()
