"""BPE-vocab greedy longest-match tokenizer (functions/bpe.py +
q_text.py::text_bpe_tokenize).

The oracle SQL replays the encode as a recursive pointer-chase, so the
driver gate certifies cross-engine parity; these tests pin the ENCODE
CONTRACT itself: totality, greedy-longest semantics vs a brute-force
reference, piece-string injectivity, and vocab-artifact invariants."""

from __future__ import annotations

import json
import os
import random

from seoul_big_data_spark.functions.bpe import (
    _pattern,
    encode_word,
    load_vocab,
    piece_string,
)

VOCAB = load_vocab()
PAT = _pattern(VOCAB)


def brute_force_encode(word: str, vocab: set[str]) -> list[str]:
    """Reference greedy longest-match: at each position scan match lengths
    descending; fall back to the single char."""
    out, i = [], 0
    while i < len(word):
        for ln in range(min(len(word) - i, max(map(len, vocab))), 0, -1):
            if word[i : i + ln] in vocab:
                out.append(word[i : i + ln])
                i += ln
                break
        else:
            out.append(word[i])
            i += 1
    return out


def test_vocab_artifact_invariants():
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "seoul_big_data_spark",
        "functions",
        "bpe_vocab.json",
    )
    doc = json.load(open(path))
    v = doc["vocab"]
    assert v == sorted(set(v))  # deterministic artifact, no dups
    assert all(v)  # no empty token (would loop the encoder forever)
    multi = [t for t in v if len(t) > 1]
    assert multi, "vocab must contain merged (multi-char) units"
    # every char of every multi-char unit is itself in the vocab (BPE
    # closure: merges compose from existing symbols)
    singles = {t for t in v if len(t) == 1}
    assert all(set(t) <= singles for t in multi)


def test_encode_matches_brute_force():
    vs = set(VOCAB)
    rng = random.Random(13)
    words = ["window", "query", "scan", "sort", "x", "", "zzz", "windowscan"]
    alphabet = sorted({c for t in VOCAB for c in t}) + ["#", "9"]
    for _ in range(300):
        words.append("".join(rng.choice(alphabet) for _ in range(rng.randrange(1, 14))))
    for w in words:
        got = encode_word(w, PAT)
        assert got == brute_force_encode(w, vs), w
        assert "".join(got) == w  # totality: pieces reassemble the word


def test_out_of_vocab_char_falls_back_to_itself():
    assert encode_word("#", PAT) == ["#"]
    got = encode_word("scan#sort", PAT)
    assert "#" in got and "".join(got) == "scan#sort"


def test_piece_string_injective_over_alignments():
    # '2:ab/' vs '1:a1:b/' — same chars, different tokenization, distinct
    # serialization; and word boundaries disambiguate too
    assert piece_string(["ab"]) != piece_string(["a", "b"])
    assert piece_string(["a"]) + piece_string(["b"]) != piece_string(["a", "b"])


def test_longest_match_is_greedy_not_optimal():
    # pin the semantics: GREEDY longest-match, not minimal-token encode.
    # 'windowscan': greedy takes 'window', then 's','can' — even if some
    # other split had fewer pieces, greedy is the contract both engines
    # replay.
    got = encode_word("windowscan", PAT)
    assert got[0] == "window" and "".join(got) == "windowscan"
