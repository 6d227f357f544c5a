"""Train a small byte-pair-encoding vocabulary on the sf0.001 documents
corpus and freeze it into seoul_big_data_spark/functions/bpe_vocab.json.

Run once; the output is committed. The engine's tokenizer
(q_text.py::text_bpe_tokenize) does greedy longest-match encoding against
the frozen token SET (merge order is not needed at encode time for the
longest-match scheme — VERDICT r8 #5), so the artifact is just the sorted
token list plus provenance.

Determinism: word iteration is sorted, pair counting uses sorted dicts,
ties in pair frequency break lexicographically — re-running this script on
the same corpus reproduces the identical vocab byte-for-byte.
"""

from __future__ import annotations

import collections
import json
import os

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CORPUS = "/root/testdata/sf0.001/documents.parquet"
OUT = os.path.join(REPO, "seoul_big_data_spark", "functions", "bpe_vocab.json")
N_MERGES = 40


def train(word_freqs: list[tuple[str, int]], n_merges: int = N_MERGES) -> list[str]:
    """Classic word-level BPE: pair counts weighted by word frequency,
    most-frequent pair merged each step, lexicographic tie-break.
    N_MERGES is deliberately small so frequent words become single tokens
    while the tail stays multi-token — the shape a real subword tokenizer
    produces."""
    seqs = [(list(w), f) for w, f in word_freqs if w]
    merges: list[str] = []
    for _ in range(n_merges):
        pairs: collections.Counter[tuple[str, str]] = collections.Counter()
        for s, f in seqs:
            for a, b in zip(s, s[1:]):
                pairs[(a, b)] += f
        if not pairs:
            break
        # max count, lexicographic tie-break → deterministic
        (a, b), cnt = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if cnt < 2:
            break
        merged = a + b
        merges.append(merged)
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
    chars = sorted({c for w, _ in word_freqs for c in w})
    vocab = sorted(set(chars) | set(merges))
    return vocab


def main() -> None:
    word_freqs = duckdb.sql(
        f"""
        SELECT w, CAST(count(*) AS BIGINT) FROM (
          SELECT unnest(list_filter(string_split_regex(trim(text), '\\s+'),
                                    x -> x != '')) AS w
          FROM '{CORPUS}')
        GROUP BY w ORDER BY w
        """
    ).fetchall()
    vocab = train(word_freqs)
    with open(OUT, "w") as fh:
        json.dump(
            {
                "corpus": CORPUS,
                "n_merges": N_MERGES,
                "scheme": "bpe-train + greedy-longest-match-encode",
                "vocab": vocab,
            },
            fh,
            indent=1,
            ensure_ascii=False,
        )
    print(f"{len(vocab)} tokens -> {OUT}")


if __name__ == "__main__":
    main()
