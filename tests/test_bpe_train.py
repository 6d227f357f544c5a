"""Distributed BPE vocabulary training (functions/bpe.py::bpe_train_merges)
vs the pinned single-node twin (tools/gen_bpe_vocab.py::train) and the
committed artifact.

The merge loop's observable contract: identical merge SEQUENCE (pair,
count, order) under the (-count, a, b) tie-break, identical greedy
left-to-right merge application (positions matter — later steps' pair
counts depend on them), identical stop rule (best count < 2), and a derived
vocab byte-equal to the frozen bpe_vocab.json on its training corpus.
"""

from __future__ import annotations

import importlib.util
import json
import os

from pyspark.sql import functions as F

from seoul_big_data_spark.functions.bpe import bpe_train_merges, bpe_train_vocab

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _twin():
    spec = importlib.util.spec_from_file_location(
        "gen_bpe_vocab", os.path.join(REPO, "tools", "gen_bpe_vocab.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _twin_merges(word_freqs, n_merges):
    """The twin's merge SEQUENCE (its train() returns only the vocab, so
    re-run its loop body verbatim semantics via train() + diff of vocab is
    not enough — replicate the documented (-count, pair) argmin here
    against collections.Counter exactly as the twin does)."""
    import collections

    seqs = [(list(w), f) for w, f in word_freqs if w]
    merges = []
    for step in range(1, n_merges + 1):
        pairs = collections.Counter()
        for s, f in seqs:
            for a, b in zip(s, s[1:]):
                pairs[(a, b)] += f
        if not pairs:
            break
        (a, b), cnt = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if cnt < 2:
            break
        merged = a + b
        merges.append((step, a, b, merged, cnt))
        for i, (s, f) in enumerate(seqs):
            out, j = [], 0
            while j < len(s):
                if j + 1 < len(s) and s[j] == a and s[j + 1] == b:
                    out.append(merged)
                    j += 2
                else:
                    out.append(s[j])
                    j += 1
            seqs[i] = (out, f)
    return merges


def _spark_wf(spark, word_freqs):
    return spark.createDataFrame(word_freqs, "w string, f bigint")


def test_vocab_byte_equals_committed_artifact(spark):
    """Distributed training on the artifact's own corpus reproduces the
    frozen vocab byte-for-byte (VERDICT r9 #4 done-criterion)."""
    import seoul_big_data_spark.functions.text as tx

    with open(
        os.path.join(REPO, "seoul_big_data_spark", "functions", "bpe_vocab.json")
    ) as fh:
        committed = json.load(fh)
    d = spark.read.parquet(committed["corpus"]).select("text")
    wf = (
        d.select(F.explode(tx.tokens("text")).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("f"))
    )
    vocab = bpe_train_vocab(wf, committed["n_merges"], "w", "f")
    assert vocab == committed["vocab"]


def test_merge_sequence_matches_twin_on_run_corpus(spark):
    """Runs of the same char — the shape where merge POSITION semantics
    (greedy one-pass, merged output never re-merges within a step) decide
    the answer; a replace-based scan diverges here."""
    wf = [("aaaaa", 3), ("aaaa", 2), ("aa", 7), ("ba", 4), ("ab", 4)]
    got = bpe_train_merges(_spark_wf(spark, wf), 8, "w", "f")
    assert got == _twin_merges(wf, 8)


def test_merge_sequence_matches_twin_random(spark):
    import random

    rng = random.Random(1234)
    alpha = "abcde"
    wf = {}
    for _ in range(60):
        w = "".join(rng.choice(alpha) for _ in range(rng.randrange(1, 9)))
        wf[w] = wf.get(w, 0) + rng.randrange(1, 9)
    wf = sorted(wf.items())
    got = bpe_train_merges(_spark_wf(spark, wf), 10, "w", "f")
    assert got == _twin_merges(wf, 10)


def test_tie_break_lexicographic(spark):
    # (a,b) and (b,a)... distinct pairs with EQUAL weighted counts — the
    # (-count, a, b) tie-break must pick the lexicographically first pair
    wf = [("ab", 5), ("cd", 5)]
    got = bpe_train_merges(_spark_wf(spark, wf), 1, "w", "f")
    assert [(m[1], m[2]) for m in got] == [("a", "b")]
    assert got == _twin_merges(wf, 1)


def test_stop_rule_count_below_two(spark):
    # every pair occurs exactly once → no merge at all
    wf = [("ab", 1), ("cd", 1)]
    assert bpe_train_merges(_spark_wf(spark, wf), 5, "w", "f") == []
    # one mergeable pair, then starvation → exactly one merge
    wf2 = [("ab", 2), ("c", 9)]
    got = bpe_train_merges(_spark_wf(spark, wf2), 5, "w", "f")
    assert [(m[3], m[4]) for m in got] == [("ab", 2)]
    assert got == _twin_merges(wf2, 5)
