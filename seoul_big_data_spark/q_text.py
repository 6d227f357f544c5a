"""Text analysis + dedup queries over ``documents`` (north-star N1/N2/N4).

Oracle notes: tokenization is mirrored in DuckDB with
``list_filter(string_split_regex(trim(text), '\\s+'), x -> x != '')``;
shingles with a 1-based list comprehension (DuckDB slices are inclusive).
Hash-based operators (MinHash/LSH, SimHash, xxhash64 fingerprints) have no
cross-engine oracle — they are rows-only here and verified against exact
ground truth in tests/test_dedup.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .functions import text as tx
from .operators import dedup
from .registry import query
from .sources.tables import load

_DUCK_TOKENS = "list_filter(string_split_regex(trim(text), '\\s+'), x -> x != '')"


@query(
    "text_token_stats",
    f"""
    SELECT doc_id, lang,
           CAST(len({_DUCK_TOKENS}) AS INTEGER) AS n_tokens,
           CAST(length(text) AS INTEGER)        AS n_chars_actual,
           round(length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g')) * 1.0
                 / length(text), 6)             AS punct_ratio
    FROM documents
    """,
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N4 — per-document token/char counts + punctuation ratio as native
    expressions (no UDFs; functions/text.py)."""
    d = load(spark, "documents", sf_dir)
    return d.select(
        "doc_id",
        "lang",
        tx.token_count("text").alias("n_tokens"),
        tx.char_count("text").cast("int").alias("n_chars_actual"),
        F.round(tx.punct_ratio("text"), 6).alias("punct_ratio"),
    )


@query(
    "text_term_frequency",
    f"""
    SELECT token, count(*) AS tf, count(DISTINCT doc_id) AS df
    FROM (
      SELECT doc_id, unnest({_DUCK_TOKENS}) AS token FROM documents
    )
    GROUP BY token HAVING count(*) >= 5
    """,
)
def text_term_frequency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N4 — corpus term/document frequency: tokenize → explode → groupBy.
    The explode shuffle is on the token key; at 100 TB add a stop-token
    filter before the shuffle (same HAVING threshold, applied map-side)."""
    d = load(spark, "documents", sf_dir)
    toks = d.select("doc_id", F.explode(tx.tokens("text")).alias("token"))
    return (
        toks.groupBy("token")
        .agg(F.count("*").alias("tf"), F.count_distinct("doc_id").alias("df"))
        .filter(F.col("tf") >= 5)
    )


@query(
    "text_lang_profile",
    """
    SELECT lang, source, count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars,
           round(avg(n_chars), 2) AS avg_chars
    FROM documents GROUP BY lang, source
    """,
)
def text_lang_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N4 — corpus composition profile by language and source."""
    d = load(spark, "documents", sf_dir)
    return d.groupBy("lang", "source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.round(F.avg("n_chars"), 2).alias("avg_chars"),
    )


@query(
    "text_quality_filter",
    f"""
    WITH scored AS (
      SELECT doc_id, lang,
             len({_DUCK_TOKENS}) AS n_tok,
             length(text) AS n_chr,
             length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g')) * 1.0
               / length(text) AS pr
      FROM documents
    )
    SELECT doc_id, lang,
           round(CAST((CASE WHEN n_tok >= 5 THEN 0.4 ELSE 0.0 END)
               + (CASE WHEN pr < 0.2 THEN 0.3 ELSE 0.0 END)
               + (CASE WHEN n_chr * 1.0 / n_tok BETWEEN 2.0 AND 12.0
                       THEN 0.3 ELSE 0.0 END) AS DOUBLE), 2) AS quality
    FROM scored WHERE n_tok > 0
    """,
)
def text_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N4 — composite quality score (length band + punctuation + mean word
    length), the pre-training corpus filter signal."""
    d = load(spark, "documents", sf_dir).filter(tx.token_count("text") > 0)
    return d.select(
        "doc_id", "lang", F.round(tx.quality_score("text"), 2).alias("quality")
    )


@query(
    "text_fingerprint",
    """
    WITH n AS (
      SELECT source,
             array_to_string(
               list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                           x -> x != ''), ' ') AS norm
      FROM documents
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(DISTINCT norm) AS BIGINT) AS n_fingerprints,
           CAST(count(DISTINCT norm) AS BIGINT) AS n_norm_texts
    FROM n GROUP BY source
    """,
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N4 — deterministic 64-bit fingerprint of normalized text
    (functions/text.py::fingerprint, xxhash64 over the token-normalized
    string; the per-doc hash values are the md5 twin's surface,
    `text_fingerprint_md5`).

    Oracle-checked (converted from rows-only, VERDICT r5 #5): xxhash64
    values are engine-specific, but the fingerprint's defining property is
    checkable cross-engine — it must be INJECTIVE on the corpus's distinct
    normalized texts (count(DISTINCT fp) == count(DISTINCT norm), which the
    oracle states as two copies of its own distinct-norm count: an xxhash64
    collision makes n_fingerprints hash red) and the normalization itself
    must agree with the SQL regexp pipeline (n_norm_texts)."""
    d = load(spark, "documents", sf_dir)
    norm = F.array_join(tx.tokens(F.lower(F.col("text"))), " ")
    per_doc = d.select(
        "source", tx.fingerprint("text").alias("fp"), norm.alias("norm")
    )
    return per_doc.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.count_distinct("fp").cast("bigint").alias("n_fingerprints"),
        F.count_distinct("norm").cast("bigint").alias("n_norm_texts"),
    )


def _langdetect_oracle_sql() -> str:
    """Mirror of functions/text.py::detect_language: CJK char check, else
    the stopword-profile fold (en base; de, es, fr challengers in that
    order, strict >). Stopword lists injected from the same STOPWORDS
    constant so the two engines can never drift."""
    sw = {
        lang: "[" + ", ".join(f"'{w}'" for w in tx.STOPWORDS[lang]) + "]"
        for lang in tx.STOPWORDS
    }
    ratios = ",\n".join(
        f"""         CASE WHEN len(toks) > 0
              THEN CAST(len(list_filter(toks, x -> list_contains({sw[lang]}, x)))
                   AS DOUBLE) / len(toks) ELSE 0.0 END AS s_{lang}"""
        for lang in ("en", "de", "es", "fr")
    )
    return f"""
    WITH t AS (
      SELECT doc_id, lang,
             list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                         x -> x != '') AS toks,
             length(regexp_replace(text, '[^一-鿿]', '', 'g')) AS cjk
      FROM documents
    ), sc AS (
      SELECT doc_id, lang, cjk,
{ratios}
      FROM t
    ), fold AS (
      SELECT doc_id, lang, cjk,
             CASE WHEN s_de > s_en THEN 'de' ELSE 'en' END AS b1,
             CASE WHEN s_de > s_en THEN s_de ELSE s_en END AS v1,
             s_es, s_fr
      FROM sc
    ), fold2 AS (
      SELECT doc_id, lang, cjk,
             CASE WHEN s_es > v1 THEN 'es' ELSE b1 END AS b2,
             CASE WHEN s_es > v1 THEN s_es ELSE v1 END AS v2,
             s_fr
      FROM fold
    )
    SELECT doc_id, lang,
           CASE WHEN cjk > 0 THEN 'zh'
                WHEN s_fr > v2 THEN 'fr' ELSE b2 END AS lang_pred
    FROM fold2
    """


@query("text_language_detect", _langdetect_oracle_sql())
def text_language_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N4 — language-ID heuristic (CJK detection + stopword profiles);
    accuracy asserted against the lang label in tests/test_text.py, and the
    full prediction oracle-checked via the SQL mirror built from the same
    STOPWORDS constant."""
    d = load(spark, "documents", sf_dir)
    return d.select("doc_id", "lang", tx.detect_language("text").alias("lang_pred"))


# --- dedup family (N1/N2) ---------------------------------------------------


@query(
    "dedup_exact",
    """
    SELECT doc_id, lang FROM (
      SELECT doc_id, lang,
             row_number() OVER (PARTITION BY text ORDER BY doc_id) AS rn
      FROM documents
    ) WHERE rn = 1
    """,
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N1 — exact dedup with deterministic survivor (lowest doc_id per text);
    one shuffle on the text hash (operators/dedup.py::exact)."""
    d = load(spark, "documents", sf_dir)
    return dedup.exact(d).select("doc_id", "lang")


@query(
    "dedup_ngram_jaccard",
    """
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                         x -> x != '') AS t
      FROM documents
    ), sh AS (
      SELECT doc_id,
             list_distinct([array_to_string(t[i:i+2], ' ')
                            FOR i IN range(1, greatest(len(t) - 2, 1) + 1)])
               AS shingles
      FROM toks
    ), ex AS (
      SELECT doc_id, unnest(shingles) AS shingle FROM sh
    ), sizes AS (
      SELECT doc_id, count(*) AS n_sh FROM ex GROUP BY doc_id
    ), inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_common
      FROM ex a JOIN ex b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    )
    SELECT id_a, id_b,
           round(n_common * 1.0 / (sa.n_sh + sb.n_sh - n_common), 6) AS jaccard
    FROM inter
    JOIN sizes sa ON sa.doc_id = id_a
    JOIN sizes sb ON sb.doc_id = id_b
    WHERE n_common * 1.0 / (sa.n_sh + sb.n_sh - n_common) >= 0.3
    """,
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N2 ground truth — exact 3-shingle Jaccard pairs ≥ 0.3
    (operators/dedup.py::ngram_jaccard_pairs)."""
    d = load(spark, "documents", sf_dir)
    out = dedup.ngram_jaccard_pairs(d, k_shingle=3, threshold=0.3)
    return out.select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))


@query(
    "dedup_ngram_jaccard_skewsafe",
    """
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                         x -> x != '') AS t
      FROM documents
    ), sh AS (
      SELECT doc_id,
             list_distinct([array_to_string(t[i:i+2], ' ')
                            FOR i IN range(1, greatest(len(t) - 2, 1) + 1)])
               AS shingles
      FROM toks
    ), ex0 AS (
      SELECT doc_id, unnest(shingles) AS shingle FROM sh
    ), ex AS (
      SELECT * FROM ex0 WHERE shingle NOT IN (
        SELECT shingle FROM ex0 GROUP BY shingle HAVING count(*) > 25
      )
    ), sizes AS (
      SELECT doc_id, count(*) AS n_sh FROM ex GROUP BY doc_id
    ), inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_common
      FROM ex a JOIN ex b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    )
    SELECT id_a, id_b,
           round(n_common * 1.0 / (sa.n_sh + sb.n_sh - n_common), 6) AS jaccard
    FROM inter
    JOIN sizes sa ON sa.doc_id = id_a
    JOIN sizes sb ON sb.doc_id = id_b
    WHERE n_common * 1.0 / (sa.n_sh + sb.n_sh - n_common) >= 0.3
    """,
)
def dedup_ngram_jaccard_skewsafe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N2 — exact Jaccard with the stop-shingle (hot-key) filter applied:
    shingles in more than 25 documents are dropped before the self-join, so
    a boilerplate shingle shared by d documents can no longer contribute
    O(d^2) rows to the shuffle — the skew guard the 100 TB run requires
    (operators/dedup.py::ngram_jaccard_pairs with ``max_shingle_df``)."""
    d = load(spark, "documents", sf_dir)
    out = dedup.ngram_jaccard_pairs(d, k_shingle=3, threshold=0.3, max_shingle_df=25)
    return out.select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))


@query("dedup_minhash_lsh")  # hash-based bucketing → rows-only
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N2 — MinHash+LSH candidate pairs (16 hashes, 4 bands). Recall vs the
    exact-Jaccard ground truth is asserted in tests/test_dedup.py."""
    d = load(spark, "documents", sf_dir)
    return dedup.minhash_lsh_candidates(d, n_hashes=16, bands=4)


@query(
    "dedup_minhash_lsh_md5",
    """
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                         x -> x != '') AS t
      FROM documents
    ), sh AS (
      SELECT doc_id,
             unnest(list_distinct([array_to_string(t[i:i+2], ' ')
                                   FOR i IN range(1, greatest(len(t) - 2, 1) + 1)]))
               AS s
      FROM toks
    ), mins AS (
      SELECT doc_id, j.j AS j,
             min(('0x' || substr(md5(j.j || ':' || s), 1, 8))::BIGINT) AS mh
      FROM sh CROSS JOIN (SELECT unnest(generate_series(0, 15)) AS j) j
      GROUP BY doc_id, j.j
    ), bands AS (
      SELECT doc_id, j // 4 AS band,
             string_agg(CAST(mh AS VARCHAR), ':' ORDER BY j) AS bucket
      FROM mins GROUP BY doc_id, j // 4
    )
    SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
    FROM bands a JOIN bands b
      ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
    """,
)
def dedup_minhash_lsh_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N2 — the FULL MinHash+LSH pipeline (16 hashes, 4 bands) with the
    portable md5 hash family: signature construction, banding, bucket
    collision and pair generation are all reproduced by the SQL oracle, so
    the flagship near-dup operator is hash-checked END TO END (the
    xxhash64 twin `dedup_minhash_lsh` stays the engine-native fast path,
    recall-pinned in tests). Same physical shape: shingle explode →
    map-side partial mins → one signature shuffle → bucket grouping; the
    portable bucket key is the band minima themselves rendered as a string
    (exact, engine-independent) instead of a re-hash."""
    d = load(spark, "documents", sf_dir)
    return dedup.minhash_lsh_candidates(d, n_hashes=16, bands=4, portable=True)


@query("dedup_simhash")  # hash-based fingerprint → rows-only
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N2 — 64-bit SimHash fingerprints (operators/dedup.py::simhash)."""
    d = load(spark, "documents", sf_dir)
    return dedup.simhash(d).select("doc_id", "simhash")


@query(
    "dedup_simhash_md5",
    """
    WITH toks AS (
      SELECT doc_id,
             unnest(list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                                x -> x != '')) AS t
      FROM documents
    ), h AS (
      SELECT doc_id, ('0x' || substr(md5(t), 1, 15))::BIGINT AS h FROM toks
    ), bitsums AS (
      SELECT doc_id, i.i AS i,
             sum(CASE WHEN (h >> i.i) & 1 = 1 THEN 1 ELSE -1 END) AS s
      FROM h CROSS JOIN (SELECT unnest(generate_series(0, 59)) AS i) i
      GROUP BY doc_id, i.i
    ), fp AS (
      SELECT doc_id,
             CAST(sum(CASE WHEN s > 0 THEN 1::BIGINT << i ELSE 0 END)
                  AS BIGINT) AS simhash
      FROM bitsums GROUP BY doc_id
    )
    SELECT d.doc_id, CAST(coalesce(fp.simhash, 0) AS BIGINT) AS simhash
    FROM documents d LEFT JOIN fp ON d.doc_id = fp.doc_id
    """,
)
def dedup_simhash_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N2 — cross-engine-portable SimHash: 60-bit fingerprints whose
    per-token hash is the first 15 hex chars of md5 (engine-independent,
    unlike xxhash64), so the same documents produce the same fingerprints on
    any engine — the form to persist when near-dup state must survive an
    engine migration. Same plan shape as the xxhash64 twin `dedup_simhash`:
    explode tokens → 60 conditional-sum aggregates → pack bits."""
    d = load(spark, "documents", sf_dir)
    return dedup.simhash(d, bits=60, portable=True).select("doc_id", "simhash")


@query(
    "corpus_prep_pipeline",
    f"""
    WITH scored AS (
      SELECT doc_id, lang, text,
             len({_DUCK_TOKENS}) AS n_tok,
             length(text) AS n_chr,
             length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g')) * 1.0
               / length(text) AS pr
      FROM documents WHERE length(text) > 0
    ), q AS (
      SELECT doc_id, lang, text, n_tok,
             CAST((CASE WHEN n_tok >= 5 THEN 0.4 ELSE 0.0 END)
               + (CASE WHEN pr < 0.2 THEN 0.3 ELSE 0.0 END)
               + (CASE WHEN n_chr * 1.0 / n_tok BETWEEN 2.0 AND 12.0
                       THEN 0.3 ELSE 0.0 END) AS DOUBLE) AS quality
      FROM scored WHERE n_tok > 0
    ), kept AS (
      SELECT * FROM (
        SELECT doc_id, lang, n_tok, quality,
               row_number() OVER (PARTITION BY text ORDER BY doc_id) AS rn
        FROM q WHERE quality >= 0.7
      ) WHERE rn = 1
    )
    SELECT lang, count(*) AS n_docs,
           CAST(sum(n_tok) AS BIGINT) AS total_tokens,
           round(avg(quality), 4) AS avg_quality
    FROM kept GROUP BY lang
    """,
)
def corpus_prep_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The end-to-end training-data prep composition: quality scoring (N4)
    → threshold filter → exact dedup with deterministic survivor (N1) →
    per-language corpus profile. One plan, three shuffles (dedup window,
    group-by) — the shape of a real corpus-curation job at 100 TB."""
    d = load(spark, "documents", sf_dir).filter(F.length("text") > 0)
    # ONE bound tokenizer evaluation per row (r11): n_tok, quality and the
    # keep predicate all read fields of a single let-bound struct
    # (functions/text.py::prep_stats). The previous form's pre-filter +
    # pushed quality filter + projection re-tokenized 3× per row after
    # Catalyst's alias substitution.
    q = (
        d.select("doc_id", "lang", "text", tx.prep_stats("text").alias("_s"))
        .filter(F.col("_s.keep"))
        .select(
            "doc_id",
            "lang",
            "text",
            F.col("_s.n_tok").alias("n_tok"),
            F.col("_s.quality").alias("quality"),
        )
    )
    kept = dedup.exact(q)
    return kept.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tok").alias("total_tokens"),
        F.round(F.avg("quality"), 4).alias("avg_quality"),
    )


@query(
    "dedup_clusters",
    """
    WITH RECURSIVE toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                         x -> x != '') AS t
      FROM documents
    ), sh AS (
      SELECT doc_id,
             list_distinct([array_to_string(t[i:i+2], ' ')
                            FOR i IN range(1, greatest(len(t) - 2, 1) + 1)])
               AS shingles
      FROM toks
    ), ex0 AS (
      SELECT doc_id, unnest(shingles) AS shingle FROM sh
    ), ex AS (
      SELECT * FROM ex0 WHERE shingle NOT IN (
        SELECT shingle FROM ex0 GROUP BY shingle HAVING count(*) > 25
      )
    ), sizes AS (
      SELECT doc_id, count(*) AS n_sh FROM ex GROUP BY doc_id
    ), inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_common
      FROM ex a JOIN ex b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    ), edges AS (
      SELECT id_a, id_b
      FROM inter JOIN sizes sa ON sa.doc_id = id_a JOIN sizes sb ON sb.doc_id = id_b
      WHERE n_common * 1.0 / (sa.n_sh + sb.n_sh - n_common) >= 0.3
    ), sym AS (
      SELECT id_a AS u, id_b AS v FROM edges
      UNION SELECT id_b, id_a FROM edges
    ), walk AS (
      SELECT doc_id AS id, doc_id AS label FROM documents
      UNION
      SELECT s.v, w.label FROM walk w JOIN sym s ON s.u = w.id
    )
    SELECT id AS doc_id, CAST(min(label) AS BIGINT) AS component
    FROM walk GROUP BY id
    """,
)
def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N2 — near-duplicate clustering: connected components over the exact
    3-shingle Jaccard (>= 0.3) similarity graph via iterative min-label
    propagation (operators/dedup.py::connected_components). Edges use the
    skew-safe capped form (max_shingle_df=25 — the 100 TB shape; the
    uncapped exact twin remains `dedup_ngram_jaccard`), and the oracle
    applies the identical stop-shingle filter. The iterative
    DataFrame loop is checked against DuckDB's recursive-CTE transitive
    closure — the iterative-algorithm parity case (SURVEY.md §2.8 note).

    Oracle note: DuckDB WITH RECURSIVE is declared non-recursively here
    (``walk`` references ``sym``) — DuckDB resolves the recursion on the
    final CTE.
    """
    d = load(spark, "documents", sf_dir)
    edges = dedup.ngram_jaccard_pairs(d, k_shingle=3, threshold=0.3, max_shingle_df=25)
    return dedup.connected_components(
        d.select("doc_id"), edges, id_col="doc_id"
    ).select("doc_id", F.col("component").cast("long").alias("component"))


@query(
    "dedup_span_exact",
    """
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                         x -> x != '') AS t
      FROM documents
    ), spans AS (
      SELECT doc_id, unnest([array_to_string(t[i:i+7], ' ')
                             FOR i IN range(1, greatest(len(t) - 7, 0) + 1, 8)])
               AS span
      FROM toks
    )
    SELECT span, count(DISTINCT doc_id) AS n_docs, count(*) AS n_total
    FROM spans
    GROUP BY span
    HAVING count(DISTINCT doc_id) > 1
    """,
)
def dedup_span_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N1/N2 at sub-document granularity — cross-document repeated 8-token
    spans (the boilerplate/template detector a corpus pipeline runs before
    training; sentence splitting degenerates on punctuation-free text, so
    fixed-width non-overlapping token spans are the granularity): tokenize →
    non-overlapping 8-token windows → one hash aggregate on the span.
    At 100 TB this is the same explode → map-side-combine → single-shuffle
    shape as the shingle pipeline — span count is n_tokens/8 per doc (vs
    n_tokens for overlapping shingles), and the HAVING prunes the dominant
    unique-span mass before any downstream join."""
    d = load(spark, "documents", sf_dir)
    # sequence(1, stop, 8) throws on stop < 1 — short docs yield no spans.
    # Token array let-bound (r10, tx._bind): referenced by the size guard,
    # the sequence bound, and the per-span slice — un-bound, the tokenizer
    # re-ran once per span (O(tokens²/8) splits per document).
    spans = tx._bind(
        tx.tokens(F.lower(F.col("text"))),
        lambda toks: F.when(
            F.size(toks) >= 8,
            F.transform(
                F.sequence(F.lit(1), F.size(toks) - 7, F.lit(8)),
                lambda i: F.array_join(F.slice(toks, i, 8), " "),
            ),
        ).otherwise(F.array().cast("array<string>")),
    )
    exploded = d.select("doc_id", F.explode(spans).alias("span"))
    return (
        exploded.groupBy("span")
        .agg(
            F.count_distinct("doc_id").alias("n_docs"),
            F.count("*").alias("n_total"),
        )
        .filter(F.col("n_docs") > 1)
    )


@query(
    "dedup_substring_runs",
    """
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                         x -> x != '') AS t
      FROM documents
    ), w AS (
      SELECT doc_id,
             unnest([{'pos': i, 'h': md5(array_to_string(t[i:i+7], ' '))}
                     FOR i IN range(1, greatest(len(t) - 7, 0) + 1)]) AS s
      FROM toks
    ), wp AS (
      SELECT doc_id, s.pos AS pos, s.h AS h FROM w
    ), dup AS (
      SELECT h FROM wp GROUP BY h HAVING count(DISTINCT doc_id) > 1
    ), hits AS (
      SELECT wp.doc_id, wp.pos FROM wp JOIN dup USING (h)
    ), runs AS (
      SELECT doc_id, pos,
             pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos)
               AS grp
      FROM hits
    )
    SELECT doc_id,
           CAST(min(pos) AS INTEGER) AS start_pos,
           CAST(max(pos) - min(pos) + 8 AS INTEGER) AS len_tokens
    FROM runs GROUP BY doc_id, grp
    """,
)
def dedup_substring_runs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N1/N2 — ANY-alignment exact substring dedup (suffix-array semantics,
    the Lee et al. 'Deduplicating Training Data' operator) expressed
    Spark-first: every OVERLAPPING 8-token window is hashed (stride 1 —
    `dedup_span_exact`'s stride-8 detector misses duplicates offset by
    <8 tokens), windows whose hash appears in >1 document are matched
    positions, and consecutive matched positions merge into MAXIMAL
    duplicated runs per document (pos − row_number grouping — the
    sessionization trick at token granularity). Output: one row per
    maximal cross-document-duplicated span (doc_id, start_pos,
    len_tokens >= 8).

    Scale shape at 100 TB: the window explode emits one row per token
    (same cardinality as the shingle pipeline), the duplicate-hash
    aggregate map-side-combines before its single shuffle, the join back
    is hash-partitioned on the window hash, and the run merge is a
    per-document window — doc-grain, bounded by document length. No
    suffix array is materialized; the rolling windows + run merge
    compute the same maximal-duplicated-span answer for spans >= the
    window width."""
    d = load(spark, "documents", sf_dir)
    L = 8
    # Tokenization materialized in a LOWER projection: referenced once by
    # size() and once inside the window lambda, and Catalyst does not CSE
    # through higher-order functions — inlined, the regex split re-runs
    # once PER WINDOW, i.e. O(n_tokens) tokenizations per doc (the
    # kmeans_fit norm lesson, operators/ivf.py).
    # Spread the scan before the heavy per-window md5 generation: a table
    # written as one large row group scans as ONE task regardless of
    # byte-range splits (empty-split stragglers — measured at x128: 28
    # instant tasks + 1 doing all 30M windows for minutes). The shuffle
    # moves only the raw docs and is amortized by the explode it
    # parallelizes — the minhash_signatures precedent.
    from .operators.skew import spread_scan

    td = spread_scan(d).select(
        "doc_id", tx.tokens(F.lower(F.col("text"))).alias("_t")
    )
    wins = F.when(
        F.size("_t") >= L,
        F.transform(
            F.sequence(F.lit(1), F.size("_t") - (L - 1)),
            lambda i: F.struct(
                i.alias("pos"),
                F.md5(F.array_join(F.slice("_t", i, L), " ")).alias("h"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<pos:int,h:string>>"))
    w = (
        td.select("doc_id", F.explode(wins).alias("w"))
        .select("doc_id", F.col("w.pos").alias("pos"), F.col("w.h").alias("h"))
    )
    # ">1 distinct doc" as min != max, NOT count_distinct: a template span
    # shared by ~every document is a hot hash, and count_distinct funnels
    # that key's whole doc-id set through one reducer (measured: the x128
    # weak-scaling run straggled for minutes on one task). min/max carry
    # O(1) state per group and combine map-side — skew-immune.
    dup = (
        w.groupBy("h")
        .agg((F.min("doc_id") != F.max("doc_id")).alias("multi"))
        .filter(F.col("multi"))
        .select("h")
    )
    hits = w.join(dup, "h").select("doc_id", "pos")
    ww = Window.partitionBy("doc_id").orderBy("pos")
    runs = hits.withColumn("grp", F.col("pos") - F.row_number().over(ww))
    return (
        runs.groupBy("doc_id", "grp")
        .agg(
            F.min("pos").alias("start_pos"),
            (F.max("pos") - F.min("pos") + F.lit(L)).alias("len_tokens"),
        )
        .select("doc_id", "start_pos", "len_tokens")
    )


@query(
    "text_fingerprint_md5",
    """
    SELECT doc_id,
           md5(array_to_string(
             list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                         x -> x != ''), ' ')) AS fp
    FROM documents
    """,
)
def text_fingerprint_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N4 — cross-engine-portable document fingerprint: md5 of the
    token-normalized text. The xxhash64 twin (`text_fingerprint`) is the
    faster engine-internal form; this md5 form is the one to persist when
    fingerprints must survive an engine migration or be compared against an
    external system — both are pure column expressions riding the scan."""
    d = load(spark, "documents", sf_dir)
    norm = F.array_join(tx.tokens(F.lower(F.col("text"))), " ")
    return d.select("doc_id", F.md5(norm).alias("fp"))


@query(
    "text_token_count_bpe",
    """
    SELECT doc_id,
           len(list_filter(string_split_regex(
                 regexp_replace(text, '([^\\sA-Za-z0-9]+|[0-9]+)', ' \\1 ', 'g'),
                 '\\s+'), x -> x != '')) AS n_bpe,
           len(list_filter(string_split_regex(trim(text), '\\s+'),
                           x -> x != '')) AS n_ws
    FROM documents
    """,
)
def text_token_count_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N4 — BPE-ish token counting beside the whitespace count: punctuation
    runs and digit runs are split off the way byte-pair pre-tokenizers do
    (functions/text.py::bpe_ish_token_count), giving the budget-accurate
    token estimate a training pipeline plans capacity with. Pure map-side
    regex + split — rides the scan, no shuffle; the pattern avoids
    lookaround so Java regex (Spark) and RE2 (DuckDB/most engines) agree
    exactly."""
    d = load(spark, "documents", sf_dir)
    return d.select(
        "doc_id",
        tx.bpe_ish_token_count("text").alias("n_bpe"),
        tx.token_count("text").alias("n_ws"),
    )


@query(
    "text_chunk_fixed_tokens",
    """
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(trim(text), '\\s+'),
                         x -> x != '') AS t
      FROM documents
    ), nz AS (
      SELECT doc_id, t, len(t) AS n FROM toks WHERE len(t) > 0
    ), st AS (
      SELECT doc_id, t,
             unnest(generate_series(1, n, 96)) AS chunk_start
      FROM nz
    )
    SELECT doc_id, chunk_start,
           len(t[chunk_start : chunk_start + 127]) AS n_tok,
           array_to_string(t[chunk_start : chunk_start + 127], ' ') AS chunk_text
    FROM st
    """,
)
def text_chunk_fixed_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N4 — fixed-size token chunking with overlap (window 128, stride 96 →
    32-token overlap): the context-length packing primitive that turns
    documents into training sequences. One sequence()+explode per document
    (bounded by its own token count — no global grid) and pure array slices;
    everything rides the scan, the only data movement is whatever the sink
    needs. Chunks are keyed (doc_id, chunk_start) so downstream dedup or
    loss-masking can address them stably."""
    d = load(spark, "documents", sf_dir)
    toks = tx.tokens("text")
    nz = d.select("doc_id", toks.alias("t")).filter(F.size("t") > 0)
    st = nz.select(
        "doc_id",
        "t",
        F.explode(F.sequence(F.lit(1), F.size("t"), F.lit(96))).alias("chunk_start"),
    )
    chunk = F.slice(F.col("t"), F.col("chunk_start"), 128)
    return st.select(
        "doc_id",
        "chunk_start",
        F.size(chunk).alias("n_tok"),
        F.array_join(chunk, " ").alias("chunk_text"),
    )


@query(
    "dedup_survivor_best_quality",
    """
    WITH RECURSIVE toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                         x -> x != '') AS t
      FROM documents
    ), sh AS (
      SELECT doc_id,
             list_distinct([array_to_string(t[i:i+2], ' ')
                            FOR i IN range(1, greatest(len(t) - 2, 1) + 1)])
               AS shingles
      FROM toks
    ), ex0 AS (
      SELECT doc_id, unnest(shingles) AS shingle FROM sh
    ), ex AS (
      SELECT * FROM ex0 WHERE shingle NOT IN (
        SELECT shingle FROM ex0 GROUP BY shingle HAVING count(*) > 25
      )
    ), sizes AS (
      SELECT doc_id, count(*) AS n_sh FROM ex GROUP BY doc_id
    ), inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_common
      FROM ex a JOIN ex b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    ), edges AS (
      SELECT id_a, id_b
      FROM inter JOIN sizes sa ON sa.doc_id = id_a JOIN sizes sb ON sb.doc_id = id_b
      WHERE n_common * 1.0 / (sa.n_sh + sb.n_sh - n_common) >= 0.3
    ), sym AS (
      SELECT id_a AS u, id_b AS v FROM edges
      UNION SELECT id_b, id_a FROM edges
    ), walk AS (
      SELECT doc_id AS id, doc_id AS label FROM documents
      UNION
      SELECT s.v, w.label FROM walk w JOIN sym s ON s.u = w.id
    ), comp AS (
      SELECT id AS doc_id, CAST(min(label) AS BIGINT) AS component
      FROM walk GROUP BY id
    ), q AS (
      SELECT doc_id,
             len(list_filter(string_split_regex(trim(text), '\\s+'),
                             x -> x != '')) AS n_tok,
             length(text) AS n_chr,
             CASE WHEN length(text) > 0 THEN
               length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g')) * 1.0
                 / length(text) ELSE 0.0 END AS pr
      FROM documents
    ), scored AS (
      SELECT doc_id,
             CAST((CASE WHEN n_tok BETWEEN 5 AND 100000 THEN 0.4 ELSE 0.0 END)
                + (CASE WHEN pr < 0.2 THEN 0.3 ELSE 0.0 END)
                + (CASE WHEN n_tok > 0 AND n_chr * 1.0 / n_tok
                          BETWEEN 2.0 AND 12.0
                        THEN 0.3 ELSE 0.0 END) AS DOUBLE) AS quality
      FROM q
    )
    SELECT component, doc_id, round(quality, 2) AS quality FROM (
      SELECT c.component, c.doc_id, s.quality,
             row_number() OVER (
               PARTITION BY c.component
               ORDER BY s.quality DESC, c.doc_id
             ) AS rk
      FROM comp c JOIN scored s ON c.doc_id = s.doc_id
    ) WHERE rk = 1
    """,
)
def dedup_survivor_best_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N2 — quality-preferring survivor selection: near-dup clusters
    (connected components over the exact Jaccard >= 0.3 graph, as
    `dedup_clusters`) keep their highest-quality member instead of the
    lowest id — the corpus-curation policy that preserves the best copy of
    boilerplate-mutated documents. One window over the component key on top
    of the clustering; ties broken by doc_id so the survivor is
    deterministic."""
    d = load(spark, "documents", sf_dir)
    edges = dedup.ngram_jaccard_pairs(d, k_shingle=3, threshold=0.3, max_shingle_df=25)
    comp = dedup.connected_components(d.select("doc_id"), edges, id_col="doc_id")
    scored = d.select("doc_id", tx.quality_score("text").alias("quality"))
    joined = comp.join(scored, "doc_id").select(
        F.col("component").cast("long").alias("component"), "doc_id", "quality"
    )
    w = Window.partitionBy("component").orderBy(F.desc("quality"), F.asc("doc_id"))
    return (
        joined.select(
            "component", "doc_id", "quality", F.row_number().over(w).alias("rk")
        )
        .filter(F.col("rk") == 1)
        .select("component", "doc_id", F.round("quality", 2).alias("quality"))
    )


def _pagerank_oracle_sql(iterations: int = 10, damping: float = 0.85) -> str:
    """Unrolled power-iteration oracle: one CTE stage per iteration (DuckDB
    recursive CTEs forbid aggregates in the recursive term, so the fixed
    iteration count is expanded at build time — same numbers, plain SQL)."""
    edges_cte = """
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                         x -> x != '') AS t
      FROM documents
    ), sh AS (
      SELECT doc_id,
             list_distinct([array_to_string(t[i:i+2], ' ')
                            FOR i IN range(1, greatest(len(t) - 2, 1) + 1)])
               AS shingles
      FROM toks
    ), ex0 AS (
      SELECT doc_id, unnest(shingles) AS shingle FROM sh
    ), ex AS (
      SELECT * FROM ex0 WHERE shingle NOT IN (
        SELECT shingle FROM ex0 GROUP BY shingle HAVING count(*) > 25
      )
    ), sizes AS (
      SELECT doc_id, count(*) AS n_sh FROM ex GROUP BY doc_id
    ), inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_common
      FROM ex a JOIN ex b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    ), pairs AS (
      SELECT id_a, id_b
      FROM inter JOIN sizes sa ON sa.doc_id = id_a JOIN sizes sb ON sb.doc_id = id_b
      WHERE n_common * 1.0 / (sa.n_sh + sb.n_sh - n_common) >= 0.3
    ), edges AS (
      SELECT id_a AS src, id_b AS dst FROM pairs
      UNION ALL SELECT id_b, id_a FROM pairs
    ), vx AS (
      SELECT doc_id AS id FROM documents
    ), nn AS (
      SELECT count(*) * 1.0 AS n FROM vx
    ), outdeg AS (
      SELECT src, count(*) AS deg FROM edges GROUP BY src
    ), pr0 AS (
      SELECT id, 1.0 / (SELECT n FROM nn) AS rank FROM vx
    )"""
    steps = []
    for i in range(1, iterations + 1):
        steps.append(f""", pr{i} AS (
      SELECT vx.id,
             ({1.0 - damping:g} / (SELECT n FROM nn))
               + {damping:g} * COALESCE(agg.s, 0.0) AS rank
      FROM vx LEFT JOIN (
        SELECT e.dst AS id, sum(p.rank / o.deg) AS s
        FROM edges e
        JOIN pr{i - 1} p ON p.id = e.src
        JOIN outdeg o ON o.src = e.src
        GROUP BY e.dst
      ) agg ON vx.id = agg.id
    )""")
    return (
        edges_cte
        + "".join(steps)
        + f"\n    SELECT id AS doc_id, round(rank * 1000000, 4) AS rank_ppm"
        f" FROM pr{iterations}"
    )


@query("graph_pagerank_neardup", _pagerank_oracle_sql())
def graph_pagerank_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterative-algorithm breadth beyond connected components: 10
    power-iterations of PageRank (d = 0.85, dangling mass dropped) over the
    undirected near-dup similarity graph — the authority signal a curation
    pipeline uses to pick canonical documents inside big duplicate families.
    Each iteration is one edge join + one vertex aggregate
    (operators/graph.py::pagerank, cached per iteration so lineage stays
    flat); the oracle unrolls the same ten iterations as plain CTE stages.
    Ranks are reported in parts-per-million rounded to 4 decimals — double
    summation order across engines differs at ~1e-15 per iteration, far
    inside the rounding."""
    d = load(spark, "documents", sf_dir)
    pairs = dedup.ngram_jaccard_pairs(d, k_shingle=3, threshold=0.3, max_shingle_df=25)
    edges = pairs.select(
        F.col("id_a").alias("src"), F.col("id_b").alias("dst")
    ).unionAll(pairs.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst")))
    from .operators.graph import pagerank

    ranks = pagerank(d.select("doc_id"), edges, id_col="doc_id")
    return ranks.select(
        F.col("id").alias("doc_id"),
        F.round(F.col("rank") * 1000000, 4).alias("rank_ppm"),
    )


@query(
    "text_pack_sequences",
    """
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(trim(text), '\\s+'),
                         x -> x != '') AS t
      FROM documents
    ), nz AS (
      SELECT doc_id, t, len(t) AS n FROM toks WHERE len(t) > 0
    ), st AS (
      SELECT doc_id, t,
             unnest(generate_series(1, n, 96)) AS chunk_start
      FROM nz
    ), chunks AS (
      SELECT doc_id, chunk_start,
             len(t[chunk_start : chunk_start + 127]) AS n_tok
      FROM st
    ), cum AS (
      SELECT doc_id, chunk_start, n_tok,
             sum(n_tok) OVER (ORDER BY doc_id, chunk_start
                              ROWS UNBOUNDED PRECEDING) AS running
      FROM chunks
    )
    SELECT doc_id, chunk_start, n_tok,
           CAST(floor((running - n_tok) / 512.0) AS BIGINT) AS seq_id
    FROM cum
    """,
)
def text_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N4 — sequence packing: chunks (the `text_chunk_fixed_tokens` output)
    are assigned to fixed 512-token training sequences by a running token
    total — seq_id = floor(tokens-before-this-chunk / 512), the contiguous
    greedy packing every data loader uses. Ordered by (doc_id, chunk_start):
    deterministic. Scale shape (r4): the running total comes from
    ``windows.bucketed_cumsum`` — range buckets on the numeric doc_id
    (ties of a doc's chunks share a bucket, composite within-bucket order
    keeps the global cumsum exact) — so no unpartitioned window ever sees
    chunk-grain data; the chunk frame is persisted so tokenization runs
    once across the probe/partials/main consumers."""
    from pyspark import StorageLevel

    from .operators.windows import bucketed_cumsum

    d = load(spark, "documents", sf_dir)
    toks = tx.tokens("text")
    nz = d.select("doc_id", toks.alias("t")).filter(F.size("t") > 0)
    st = nz.select(
        "doc_id",
        "t",
        F.explode(F.sequence(F.lit(1), F.size("t"), F.lit(96))).alias("chunk_start"),
    )
    chunks = st.select(
        "doc_id",
        "chunk_start",
        F.size(F.slice(F.col("t"), F.col("chunk_start"), 128)).alias("n_tok"),
    ).persist(StorageLevel.MEMORY_AND_DISK)
    cum = bucketed_cumsum(
        chunks, "doc_id", ["n_tok"], order_cols=["doc_id", "chunk_start"]
    )
    return cum.select(
        "doc_id",
        "chunk_start",
        "n_tok",
        F.floor((F.col("cum_n_tok") - F.col("n_tok")) / 512.0)
        .cast("long")
        .alias("seq_id"),
    )


@query(
    "text_bm25_top_terms",
    f"""
    WITH toks AS (
      SELECT doc_id, unnest({_DUCK_TOKENS}) AS token FROM documents
    ), tf AS (
      SELECT doc_id, token, count(*) AS tf FROM toks GROUP BY doc_id, token
    ), dl AS (
      SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id
    ), df AS (
      SELECT token, count(DISTINCT doc_id) AS df FROM toks GROUP BY token
    ), n AS (
      SELECT CAST(count(*) AS DOUBLE) AS n_docs,
             CAST((SELECT count(*) FROM toks) AS DOUBLE)
               / count(*) AS avgdl
      FROM documents
    )
    SELECT doc_id, token, round(score, 6) AS bm25, rk FROM (
      SELECT t.doc_id, t.token,
             ln((n.n_docs - d.df + 0.5) / (d.df + 0.5) + 1.0)
               * (t.tf * 2.2)
               / (t.tf + 1.2 * (0.25 + 0.75 * l.dl / n.avgdl)) AS score,
             row_number() OVER (
               PARTITION BY t.doc_id
               ORDER BY ln((n.n_docs - d.df + 0.5) / (d.df + 0.5) + 1.0)
                          * (t.tf * 2.2)
                          / (t.tf + 1.2 * (0.25 + 0.75 * l.dl / n.avgdl))
                        DESC, t.token
             ) AS rk
      FROM tf t
      JOIN df d ON t.token = d.token
      JOIN dl l ON t.doc_id = l.doc_id
      CROSS JOIN n
    ) WHERE rk <= 3
    """,
)
def text_bm25_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N4 — BM25 (k1=1.2, b=0.75, Lucene's +1 idf) top-3 terms per document.

    Same two-aggregation shape as ``text_tfidf_top_terms`` plus the
    per-document length join: term frequencies shuffle once on
    (doc_id, token), document lengths once on doc_id; the document-frequency
    table is token-vocabulary-sized and broadcast. ``n_docs``/``avgdl`` are
    scalars (one aggregate, driver-sized). The BM25 expression is written
    with the same operation order on both engines so the 6-decimal rounding
    is stable cross-engine."""
    from pyspark import StorageLevel

    d = load(spark, "documents", sf_dir)
    # The tokenize+explode subtree feeds THREE aggregations (tf, dl, df);
    # Catalyst replans it per consumer, so persist the exploded tokens once
    # (spills to disk at scale) — documents is then scanned once for the
    # token pipeline plus once for the cheap n_docs count.
    toks = d.select(
        "doc_id",
        F.explode(
            F.filter(F.split(F.trim("text"), r"\s+"), lambda t: t != F.lit(""))
        ).alias("token"),
    ).persist(StorageLevel.MEMORY_AND_DISK)
    tf = toks.groupBy("doc_id", "token").agg(F.count("*").alias("tf"))
    dl = toks.groupBy("doc_id").agg(F.count("*").alias("dl"))
    dfreq = toks.groupBy("token").agg(F.count_distinct("doc_id").alias("df"))
    # n_docs/avgdl ride in the plan as a broadcast 1-row aggregate (total
    # tokens = Σ dl, so no extra pass over toks) instead of eager collects —
    # the whole query is one job, no fact re-scan for driver-side scalars.
    nstats = (
        d.agg(F.count("*").cast("double").alias("n_docs"))
        .crossJoin(dl.agg(F.sum("dl").cast("double").alias("_tot")))
        .select("n_docs", (F.col("_tot") / F.col("n_docs")).alias("avgdl"))
    )
    score = (
        F.log((F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0)
        * (F.col("tf") * 2.2)
        / (F.col("tf") + 1.2 * (0.25 + 0.75 * F.col("dl") / F.col("avgdl")))
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc(score), F.asc("token"))
    return (
        tf.join(F.broadcast(dfreq), "token")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(nstats))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("doc_id", "token", F.round(score, 6).alias("bm25"), "rk")
    )


@query(
    "graph_triangle_count",
    """
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                         x -> x != '') AS t
      FROM documents
    ), sh AS (
      SELECT doc_id,
             list_distinct([array_to_string(t[i:i+2], ' ')
                            FOR i IN range(1, greatest(len(t) - 2, 1) + 1)])
               AS shingles
      FROM toks
    ), ex0 AS (
      SELECT doc_id, unnest(shingles) AS shingle FROM sh
    ), ex AS (
      SELECT * FROM ex0 WHERE shingle NOT IN (
        SELECT shingle FROM ex0 GROUP BY shingle HAVING count(*) > 25
      )
    ), sizes AS (
      SELECT doc_id, count(*) AS n_sh FROM ex GROUP BY doc_id
    ), inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_common
      FROM ex a JOIN ex b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    ), edges AS (
      SELECT id_a, id_b
      FROM inter JOIN sizes sa ON sa.doc_id = id_a JOIN sizes sb ON sb.doc_id = id_b
      WHERE n_common * 1.0 / (sa.n_sh + sb.n_sh - n_common) >= 0.3
    )
    SELECT CAST(count(*) AS BIGINT) AS n_triangles,
           CAST((SELECT count(*) FROM edges) AS BIGINT) AS n_edges
    FROM edges x
    JOIN edges y ON x.id_b = y.id_a
    JOIN edges z ON x.id_a = z.id_a AND y.id_b = z.id_b
    """,
)
def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle counting over the near-dup similarity graph — the clustering
    cohesion metric (a triangle-dense component is a true duplicate clique;
    a star is one template touching many docs). Edges are already oriented
    (id_a < id_b), so each triangle is counted exactly once by the standard
    two-join wedge-closure: edges ⋈ edges on the middle vertex, closed
    against edges on the outer pair. Both joins are hash equi-joins on
    vertex keys — at 100 TB this is the degree-ordered triangle algorithm,
    no enumeration ever leaves the join."""
    d = load(spark, "documents", sf_dir)
    e = dedup.ngram_jaccard_pairs(d, k_shingle=3, threshold=0.3, max_shingle_df=25).select(
        "id_a", "id_b"
    ).localCheckpoint()
    x = e.select(F.col("id_a").alias("a"), F.col("id_b").alias("b"))
    y = e.select(F.col("id_a").alias("b"), F.col("id_b").alias("c"))
    z = e.select(F.col("id_a").alias("a"), F.col("id_b").alias("c"))
    tri = x.join(y, "b").join(z, ["a", "c"])
    # Edge count joins the plan as a broadcast 1-row aggregate over the
    # checkpointed edges (no separate count() action / extra job).
    ecnt = e.agg(F.count("*").alias("n_edges"))
    return (
        tri.groupBy()
        .agg(F.count("*").alias("n_triangles"))
        .crossJoin(F.broadcast(ecnt))
    )


@query(
    "text_udtf_run_length",
    f"""
    WITH toks AS (
      SELECT doc_id, unnest({_DUCK_TOKENS}) AS token,
             generate_subscripts({_DUCK_TOKENS}, 1) AS idx
      FROM documents WHERE doc_id % 20 = 0
    ), marked AS (
      SELECT doc_id, token, idx,
             CASE WHEN lag(token) OVER w IS DISTINCT FROM token
                  THEN 1 ELSE 0 END AS new_run
      FROM toks WINDOW w AS (PARTITION BY doc_id ORDER BY idx)
    ), runs AS (
      SELECT doc_id, token, idx,
             sum(new_run) OVER (PARTITION BY doc_id ORDER BY idx
                                ROWS UNBOUNDED PRECEDING) AS run_id
      FROM marked
    )
    SELECT doc_id, token,
           CAST(min(idx) AS INTEGER) AS run_start,
           CAST(count(*) AS INTEGER) AS run_len
    FROM runs GROUP BY doc_id, token, run_id
    """,
)
def text_udtf_run_length(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.9 UDTF surface — token run-length encoding as a lateral-joined
    Python table function (operators/udtf_ops.py::TokenRunLength), checked
    exactly against the declarative lag/cumsum run grouping the oracle
    runs. One UDTF invocation per document row; the 1-in-20 document
    subset keeps the deliberately-slow-path demonstration off the hot
    loop."""
    from .operators.udtf_ops import register_udtfs
    from .session import ensure_package_shipped

    ensure_package_shipped(spark)
    register_udtfs(spark)
    d = load(spark, "documents", sf_dir).filter(F.col("doc_id") % 20 == 0)
    d.createOrReplaceTempView("_udtf_docs")
    return spark.sql(
        """
        SELECT d.doc_id, f.token, f.run_start, f.run_len
        FROM _udtf_docs d, LATERAL token_run_length(d.text) f
        """
    )


@query(
    "text_zipf_slope",
    f"""
    WITH toks AS (
      SELECT unnest({_DUCK_TOKENS}) AS token FROM documents
    ), freq AS (
      SELECT token, count(*) AS n FROM toks GROUP BY token
    ), ranked AS (
      SELECT n, row_number() OVER (ORDER BY n DESC, token) AS rk FROM freq
    )
    SELECT round(regr_slope(ln(n), ln(rk)), 6) AS zipf_slope,
           round(regr_r2(ln(n), ln(rk)), 6) AS r2,
           CAST(count(*) AS BIGINT) AS vocab_size
    FROM ranked
    """,
)
def text_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf rank-frequency fit over the corpus vocabulary: OLS slope of
    ln(freq) on ln(rank) (natural text ≈ -1; templated/synthetic corpora
    flatten) — a one-number corpus-naturalness screen. Token counts are one
    aggregate; the regression runs over the vocabulary-sized table with
    closed-form regr_slope/regr_r2 on both engines; rank ties broken by
    token for a deterministic ordering."""
    d = load(spark, "documents", sf_dir)
    toks = d.select(
        F.explode(
            F.filter(F.split(F.trim("text"), r"\s+"), lambda t: t != F.lit(""))
        ).alias("token")
    )
    freq = toks.groupBy("token").agg(F.count("*").alias("n"))
    ranked = freq.select(
        "n",
        F.row_number()
        .over(Window.orderBy(F.desc("n"), F.asc("token")))
        .alias("rk"),
    )
    return ranked.agg(
        F.round(F.regr_slope(F.log("n"), F.log("rk")), 6).alias("zipf_slope"),
        F.round(F.regr_r2(F.log("n"), F.log("rk")), 6).alias("r2"),
        F.count("*").alias("vocab_size"),
    )


@query(
    "dedup_containment_pairs",
    """
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                         x -> x != '') AS t
      FROM documents
    ), sh AS (
      SELECT doc_id,
             list_distinct([array_to_string(t[i:i+2], ' ')
                            FOR i IN range(1, greatest(len(t) - 2, 1) + 1)])
               AS shingles
      FROM toks
    ), ex0 AS (
      SELECT doc_id, unnest(shingles) AS shingle FROM sh
    ), ex AS (
      SELECT * FROM ex0 WHERE shingle NOT IN (
        SELECT shingle FROM ex0 GROUP BY shingle HAVING count(*) > 25
      )
    ), sizes AS (
      SELECT doc_id, count(*) AS n_sh FROM ex GROUP BY doc_id
    ), inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_common
      FROM ex a JOIN ex b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    )
    SELECT id_a, id_b, CAST(n_common AS BIGINT) AS n_common,
           round(n_common * 1.0 / least(sa.n_sh, sb.n_sh), 6) AS containment
    FROM inter
    JOIN sizes sa ON sa.doc_id = id_a
    JOIN sizes sb ON sb.doc_id = id_b
    WHERE n_common * 1.0 / least(sa.n_sh, sb.n_sh) >= 0.6
    """,
)
def dedup_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N2 — CONTAINMENT near-dup pairs: |A∩B| / min(|A|,|B|) over 3-word
    shingle sets. Jaccard misses subset duplication (a short doc pasted
    inside a long one scores low Jaccard but containment ≈ 1) — this is the
    asymmetric detector every corpus-refinery needs next to it. Same
    skew-safe candidate generation as the Jaccard family: pairs meet only
    on shared shingles, hot boilerplate shingles capped at df<=25 (cap
    mirrored in the oracle), so work is bounded by Σdf² over surviving
    shingles, never |docs|²."""
    d = load(spark, "documents", sf_dir)
    out = dedup.ngram_containment_pairs(
        d, k_shingle=3, threshold=0.6, max_shingle_df=25
    )
    return out.select(
        "id_a",
        "id_b",
        F.col("n_common").cast("long").alias("n_common"),
        F.round("containment", 6).alias("containment"),
    )


@query(
    "dedup_incremental_vs_corpus",
    """
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                         x -> x != '') AS t
      FROM documents
    ), sh AS (
      SELECT doc_id,
             list_distinct([array_to_string(t[i:i+2], ' ')
                            FOR i IN range(1, greatest(len(t) - 2, 1) + 1)])
               AS shingles
      FROM toks
    ), ex0 AS (
      SELECT doc_id, unnest(shingles) AS shingle FROM sh
    ), ex AS (
      SELECT * FROM ex0 WHERE shingle NOT IN (
        SELECT shingle FROM ex0 GROUP BY shingle HAVING count(*) > 25
      )
    ), sizes AS (
      SELECT doc_id, count(*) AS n_sh FROM ex GROUP BY doc_id
    ), inter AS (
      SELECT a.doc_id AS id_new, b.doc_id AS id_old, count(*) AS n_common
      FROM ex a JOIN ex b ON a.shingle = b.shingle
      WHERE a.doc_id % 5 = 0 AND b.doc_id % 5 <> 0
      GROUP BY a.doc_id, b.doc_id
    )
    SELECT id_new, id_old,
           round(n_common * 1.0 / (sn.n_sh + so.n_sh - n_common), 6) AS jaccard
    FROM inter
    JOIN sizes sn ON sn.doc_id = id_new
    JOIN sizes so ON so.doc_id = id_old
    WHERE n_common * 1.0 / (sn.n_sh + so.n_sh - n_common) >= 0.3
    """,
)
def dedup_incremental_vs_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N2 — incremental dedup: the NEW batch (doc_id % 5 == 0 stands in for
    today's increment) checked against the EXISTING corpus (the rest),
    pairing ONLY new x old — never old x old. This is the shape a
    continuously-ingesting 100 TB corpus actually runs daily: the corpus
    side is already deduped, so re-pairing it with itself would be almost
    all of the naive cost for zero information. One groupBy(shingle)
    collects old-ids and new-ids separately (conditional collect_list); the
    df<=25 cap bounds both lists; pair work is O(|old| x |new|) per
    shingle (operators/dedup.py::incremental_jaccard_pairs)."""
    d = load(spark, "documents", sf_dir)
    corpus = d.filter(F.col("doc_id") % 5 != 0)
    incr = d.filter(F.col("doc_id") % 5 == 0)
    out = dedup.incremental_jaccard_pairs(
        corpus, incr, k_shingle=3, threshold=0.3, max_shingle_df=25
    )
    return out.select("id_new", "id_old", F.round("jaccard", 6).alias("jaccard"))


@query(
    "text_vocab_oov_rate",
    """
    WITH lt AS (
      SELECT lang,
             unnest(list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                                x -> x != '')) AS tok
      FROM documents
    ), cnt AS (
      SELECT lang, tok, count(*) AS c FROM lt GROUP BY lang, tok
    ), vocab AS (
      SELECT tok FROM (
        SELECT tok, row_number() OVER (ORDER BY sum(c) DESC, tok) AS rn
        FROM cnt GROUP BY tok
      ) WHERE rn <= 1000
    )
    SELECT lang,
           CAST(sum(c) AS BIGINT) AS n_tokens,
           CAST(sum(CASE WHEN v.tok IS NULL THEN c ELSE 0 END) AS BIGINT)
             AS n_oov,
           round(sum(CASE WHEN v.tok IS NULL THEN c ELSE 0 END) * 1.0
                 / sum(c), 6) AS oov_rate
    FROM cnt LEFT JOIN vocab v ON cnt.tok = v.tok
    GROUP BY lang
    """,
)
def text_vocab_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-vocabulary coverage: build the corpus top-1000 vocabulary
    (by frequency, ties broken by token) and report each language's
    out-of-vocabulary token rate — the number that decides whether a
    tokenizer/vocab is fit for a multilingual corpus before a training run.

    One fact scan: the token stream reduces to (lang, token) counts
    immediately (persisted — lang×vocab cardinality); the global vocabulary
    is that table re-aggregated, picked via sort+limit
    (TakeOrderedAndProject, no single-partition rank window), and
    broadcast back against it."""
    from pyspark import StorageLevel

    d = load(spark, "documents", sf_dir)
    cnt = (
        d.select("lang", F.explode(tx.tokens(F.lower(F.col("text")))).alias("tok"))
        .groupBy("lang", "tok")
        .agg(F.count("*").alias("c"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    vocab = (
        cnt.groupBy("tok")
        .agg(F.sum("c").alias("tc"))
        .orderBy(F.desc("tc"), F.asc("tok"))
        .limit(1000)
        .select("tok", F.lit(1).alias("in_vocab"))
    )
    j = cnt.join(F.broadcast(vocab), "tok", "left")
    oov_c = F.when(F.col("in_vocab").isNull(), F.col("c")).otherwise(F.lit(0))
    return j.groupBy("lang").agg(
        F.sum("c").cast("bigint").alias("n_tokens"),
        F.sum(oov_c).cast("bigint").alias("n_oov"),
        F.round(F.sum(oov_c) * 1.0 / F.sum("c"), 6).alias("oov_rate"),
    )


@query(
    "text_bigram_logprob",
    """
    WITH base AS (
      SELECT doc_id,
             list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                         x -> x != '') AS toks
      FROM documents
    ), uni AS (
      SELECT count(DISTINCT t) AS v
      FROM (SELECT unnest(toks) AS t FROM base)
    ), sp AS (
      SELECT doc_id,
             split_part(b, ' ', 1) AS w1, split_part(b, ' ', 2) AS w2
      FROM (
        SELECT doc_id,
               unnest(list_transform(generate_series(1, len(toks) - 1),
                                     i -> toks[i] || ' ' || toks[i + 1])) AS b
        FROM base WHERE len(toks) >= 2
      )
    ), d2 AS (
      SELECT doc_id, w1, w2, count(*) AS k FROM sp GROUP BY doc_id, w1, w2
    ), c2 AS (
      SELECT w1, w2, sum(k) AS c2 FROM d2 GROUP BY w1, w2
    ), c1 AS (
      SELECT w1, sum(k) AS c1 FROM d2 GROUP BY w1
    )
    SELECT d2.doc_id,
           CAST(sum(d2.k) AS BIGINT) AS n_bigrams,
           round(sum(d2.k * ln((c2.c2 + 1.0) / (c1.c1 + uni.v)))
                 / sum(d2.k), 6) AS avg_lp
    FROM d2
    JOIN c2 ON d2.w1 = c2.w1 AND d2.w2 = c2.w2
    JOIN c1 ON d2.w1 = c1.w1
    CROSS JOIN uni
    GROUP BY d2.doc_id
    """,
)
def text_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram language model with add-one smoothing, trained on the corpus
    and scoring every document: P(w2|w1) = (c(w1,w2)+1)/(c(w1)+V) over
    context counts, reported as each doc's mean log-probability — the
    perplexity-style fluency signal quality pipelines use (gibberish and
    boilerplate both fall out of the bulk of the distribution). Extends the
    unigram scorer (`text_unigram_logprob`) with conditional context.

    One fact scan: bigrams come straight from the token array
    (``transform`` over an index sequence — no posexplode, no per-doc
    window), reduced immediately to per-(doc, bigram) counts ``d2``
    (persisted). The LM tables c2/c1, the vocab size V (1-row broadcast),
    and the per-doc scores are ALL re-aggregations or joins of d2 — the
    corpus-sized bigram stream is never shuffled twice, and the doc_id in
    d2's grouping key keeps the final per-doc rollup co-partitioned."""
    from pyspark import StorageLevel

    d = load(spark, "documents", sf_dir)
    base = d.select(
        "doc_id", tx.tokens(F.lower(F.col("text"))).alias("toks")
    )
    toks = F.col("toks")
    bigrams = F.transform(
        F.sequence(F.lit(0), F.size(toks) - 2),
        lambda i: F.struct(
            F.element_at(toks, i + 1).alias("w1"),
            F.element_at(toks, i + 2).alias("w2"),
        ),
    )
    d2 = (
        base.filter(F.size(toks) >= 2)
        .select("doc_id", F.explode(bigrams).alias("bg"))
        .select("doc_id", "bg.w1", "bg.w2")
        .groupBy("doc_id", "w1", "w2")
        .agg(F.count("*").alias("k"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    # V counts distinct unigrams (incl. last tokens), so it reads the token
    # array once more — a column-pruned second scan of documents (budget 2).
    uni = (
        base.select(F.explode(toks).alias("t"))
        .agg(F.count_distinct("t").alias("v"))
    )
    c2 = d2.groupBy("w1", "w2").agg(F.sum("k").alias("c2"))
    c1 = d2.groupBy("w1").agg(F.sum("k").alias("c1"))
    lp = F.log((F.col("c2") + 1.0) / (F.col("c1") + F.col("v")))
    return (
        d2.join(c2, ["w1", "w2"])
        .join(c1, ["w1"])
        .crossJoin(F.broadcast(uni))
        .groupBy("doc_id")
        .agg(
            F.sum("k").cast("bigint").alias("n_bigrams"),
            F.round(F.sum(F.col("k") * lp) / F.sum("k"), 6).alias("avg_lp"),
        )
    )


@query(
    "text_js_divergence",
    """
    WITH cnt AS (
      SELECT lang,
             unnest(list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                                x -> x != '')) AS tok
      FROM documents WHERE lang IN ('en', 'zh')
    ), c AS (
      SELECT lang, tok, count(*) AS n FROM cnt GROUP BY lang, tok
    ), t AS (
      SELECT sum(CASE WHEN lang = 'en' THEN n ELSE 0 END) AS te,
             sum(CASE WHEN lang = 'zh' THEN n ELSE 0 END) AS tz
      FROM c
    ), probs AS (
      SELECT coalesce(e.tok, z.tok) AS tok,
             coalesce(e.n, 0) * 1.0 / t.te AS p,
             coalesce(z.n, 0) * 1.0 / t.tz AS q
      FROM (SELECT tok, n FROM c WHERE lang = 'en') e
      FULL OUTER JOIN (SELECT tok, n FROM c WHERE lang = 'zh') z
        ON e.tok = z.tok
      CROSS JOIN t
    )
    SELECT round(sum(
             CASE WHEN p > 0 THEN 0.5 * p * ln(p / ((p + q) / 2)) ELSE 0 END
             + CASE WHEN q > 0 THEN 0.5 * q * ln(q / ((p + q) / 2)) ELSE 0 END
           ), 6) AS jsd_nats,
           CAST(max(t2.te) AS BIGINT) AS n_tokens_en,
           CAST(max(t2.tz) AS BIGINT) AS n_tokens_zh
    FROM probs CROSS JOIN t AS t2
    """,
)
def text_js_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jensen–Shannon divergence between the English and Chinese token
    distributions — the bounded, symmetric corpus-similarity metric behind
    mixture tuning and domain-shift monitoring (0 = identical corpora,
    ln 2 = disjoint). KL terms guard p=0/q=0 explicitly, mirroring the
    0·log 0 = 0 convention on both engines.

    One fact scan to (lang, token) counts (persisted — vocab-cardinality);
    the two distributions come from that table filtered per language and
    full-outer-joined over the union vocabulary; totals ride a 1-row
    broadcast cross join, so no unpartitioned window touches the
    vocab-sized table."""
    from pyspark import StorageLevel

    d = load(spark, "documents", sf_dir)
    c = (
        d.filter(F.col("lang").isin("en", "zh"))
        .select("lang", F.explode(tx.tokens(F.lower(F.col("text")))).alias("tok"))
        .groupBy("lang", "tok")
        .agg(F.count("*").alias("n"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    t = c.agg(
        F.sum(F.when(F.col("lang") == "en", F.col("n")).otherwise(0)).alias("te"),
        F.sum(F.when(F.col("lang") == "zh", F.col("n")).otherwise(0)).alias("tz"),
    )
    e = c.filter(F.col("lang") == "en").select("tok", F.col("n").alias("ne"))
    z = c.filter(F.col("lang") == "zh").select("tok", F.col("n").alias("nz"))
    probs = (
        e.join(z, "tok", "full_outer")
        .crossJoin(F.broadcast(t))
        .select(
            (F.coalesce(F.col("ne"), F.lit(0)) * 1.0 / F.col("te")).alias("p"),
            (F.coalesce(F.col("nz"), F.lit(0)) * 1.0 / F.col("tz")).alias("q"),
            "te",
            "tz",
        )
    )
    m = (F.col("p") + F.col("q")) / 2
    kl_p = F.when(F.col("p") > 0, 0.5 * F.col("p") * F.log(F.col("p") / m)).otherwise(
        0.0
    )
    kl_q = F.when(F.col("q") > 0, 0.5 * F.col("q") * F.log(F.col("q") / m)).otherwise(
        0.0
    )
    return probs.agg(
        F.round(F.sum(kl_p + kl_q), 6).alias("jsd_nats"),
        F.max("te").cast("bigint").alias("n_tokens_en"),
        F.max("tz").cast("bigint").alias("n_tokens_zh"),
    )


@query(
    "dedup_jaccard_prefix_filter",
    """
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                         x -> x != '') AS t
      FROM documents
    ), sh AS (
      SELECT doc_id,
             list_distinct([array_to_string(t[i:i+2], ' ')
                            FOR i IN range(1, greatest(len(t) - 2, 1) + 1)])
               AS shingles
      FROM toks
    ), ex AS (
      SELECT doc_id, unnest(shingles) AS shingle FROM sh
    ), sizes AS (
      SELECT doc_id, count(*) AS n_sh FROM ex GROUP BY doc_id
    ), inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_common
      FROM ex a JOIN ex b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    )
    SELECT id_a, id_b,
           round(n_common * 1.0 / (sa.n_sh + sb.n_sh - n_common), 6) AS jaccard
    FROM inter
    JOIN sizes sa ON sa.doc_id = id_a
    JOIN sizes sb ON sb.doc_id = id_b
    WHERE n_common * 5 >= 4 * (sa.n_sh + sb.n_sh - n_common)
    """,
)
def dedup_jaccard_prefix_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N2 — the exact-Jaccard contract (3-shingles, t=0.8 — the near-dup
    regime where prefixes are short) through the prefix-filtering generator
    (operators/dedup.py::prefix_filter_jaccard_pairs; All-Pairs/PPJoin,
    public algorithms). The oracle is the full inverted-index self-join —
    prefix filtering is lossless, so the outputs must be identical; the
    physical plan joins only on each document's rarest shingles instead of
    all of them. The oracle's threshold test is integer arithmetic
    (n_common*10 >= 3*union) to mirror the operator's exact rational
    boundary (a float `>= 0.3` can disagree on boundary pairs)."""
    d = load(spark, "documents", sf_dir)
    out = dedup.prefix_filter_jaccard_pairs(d, k_shingle=3, threshold=0.8)
    return out.select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))


@query(
    "text_ngram_novelty",
    """
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                         x -> x != '') AS t
      FROM documents
    ), sh AS (
      SELECT doc_id,
             list_distinct([array_to_string(t[i:i+2], ' ')
                            FOR i IN range(1, greatest(len(t) - 2, 1) + 1)])
               AS shingles
      FROM toks
    ), ex AS (
      SELECT doc_id, unnest(shingles) AS shingle FROM sh
    ), df AS (
      SELECT shingle, count(*) AS sdf FROM ex GROUP BY 1
    )
    SELECT e.doc_id,
           CAST(count(*) AS BIGINT) AS n_sh,
           CAST(sum(CASE WHEN d.sdf = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_novel,
           round(sum(CASE WHEN d.sdf = 1 THEN 1 ELSE 0 END) * 1.0
                 / count(*), 6) AS novelty
    FROM ex e JOIN df d ON d.shingle = e.shingle
    GROUP BY e.doc_id
    """,
)
def text_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-gram novelty score: the fraction of a document's 3-shingles that
    appear NOWHERE else in the corpus — the inverse signal of boilerplate
    density, used to up-weight genuinely original documents in curation
    (a near-zero score means the document is assembled from corpus-common
    fragments even if no single near-duplicate exists).

    One explode feeds both the document-frequency table and the per-doc
    reduction; the df join is shingle-keyed (the same shuffle key), and
    everything after the explode is integer counting — round(6) on the
    final ratio only."""
    from pyspark import StorageLevel

    d = load(spark, "documents", sf_dir)
    sh = d.select(
        "doc_id",
        F.explode(F.array_distinct(tx.shingles("text", 3))).alias("shingle"),
    ).persist(StorageLevel.MEMORY_AND_DISK)
    sdf = sh.groupBy("shingle").agg(F.count("*").alias("sdf"))
    return (
        sh.join(sdf, "shingle")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_sh"),
            F.sum((F.col("sdf") == 1).cast("long")).cast("bigint").alias(
                "n_novel"
            ),
            F.round(
                F.sum((F.col("sdf") == 1).cast("long")) / F.count("*"), 6
            ).alias("novelty"),
        )
    )


@query(
    "dedup_cluster_size_histogram",
    """
    WITH RECURSIVE toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                         x -> x != '') AS t
      FROM documents
    ), sh AS (
      SELECT doc_id,
             list_distinct([array_to_string(t[i:i+2], ' ')
                            FOR i IN range(1, greatest(len(t) - 2, 1) + 1)])
               AS shingles
      FROM toks
    ), ex0 AS (
      SELECT doc_id, unnest(shingles) AS shingle FROM sh
    ), ex AS (
      SELECT * FROM ex0 WHERE shingle NOT IN (
        SELECT shingle FROM ex0 GROUP BY shingle HAVING count(*) > 25
      )
    ), sizes AS (
      SELECT doc_id, count(*) AS n_sh FROM ex GROUP BY doc_id
    ), inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_common
      FROM ex a JOIN ex b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    ), edges AS (
      SELECT id_a, id_b
      FROM inter JOIN sizes sa ON sa.doc_id = id_a JOIN sizes sb ON sb.doc_id = id_b
      WHERE n_common * 1.0 / (sa.n_sh + sb.n_sh - n_common) >= 0.3
    ), sym AS (
      SELECT id_a AS u, id_b AS v FROM edges
      UNION SELECT id_b, id_a FROM edges
    ), walk AS (
      SELECT doc_id AS id, doc_id AS label FROM documents
      UNION
      SELECT s.v, w.label FROM walk w JOIN sym s ON s.u = w.id
    ), comp AS (
      SELECT id, CAST(min(label) AS BIGINT) AS component FROM walk GROUP BY id
    ), csize AS (
      SELECT component, count(*) AS cluster_size FROM comp GROUP BY component
    )
    SELECT CAST(cluster_size AS BIGINT) AS cluster_size,
           CAST(count(*) AS BIGINT) AS n_clusters,
           CAST(sum(cluster_size) AS BIGINT) AS n_docs
    FROM csize GROUP BY cluster_size
    """,
)
def dedup_cluster_size_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N2 reporting — the near-dup cluster size distribution (how much of
    the corpus sits in singletons vs duplicate blobs), the histogram a
    dedup run reports before choosing survivors. Two tiny aggregates on
    top of the `dedup_clusters` component labels; the iterative CC loop
    is still checked against the recursive-CTE oracle end to end."""
    d = load(spark, "documents", sf_dir)
    edges = dedup.ngram_jaccard_pairs(
        d, k_shingle=3, threshold=0.3, max_shingle_df=25
    )
    comp = dedup.connected_components(
        d.select("doc_id"), edges, id_col="doc_id"
    )
    csize = comp.groupBy("component").agg(F.count("*").alias("cluster_size"))
    return csize.groupBy(
        F.col("cluster_size").cast("bigint").alias("cluster_size")
    ).agg(
        F.count("*").cast("bigint").alias("n_clusters"),
        F.sum("cluster_size").cast("bigint").alias("n_docs"),
    )


@query(
    "text_lexical_diversity",
    """
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                         x -> x != '') AS t
      FROM documents
    ), ex AS (
      SELECT doc_id, unnest(t) AS w FROM toks
    ), wc AS (
      SELECT doc_id, w, count(*) AS c FROM ex GROUP BY doc_id, w
    )
    SELECT doc_id,
           CAST(sum(c) AS BIGINT)   AS n_tokens,
           CAST(count(*) AS BIGINT) AS n_types,
           round(count(*) * 1.0 / sum(c), 6) AS ttr,
           round(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) * 1.0 / count(*), 6)
             AS hapax_rate
    FROM wc GROUP BY doc_id
    """,
)
def text_lexical_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lexical diversity per document: type-token ratio and hapax-legomenon
    rate — the corpus-linguistics quality signals that separate generative
    word-salad and template boilerplate (low TTR, low hapax) from natural
    prose. One explode + two nested integer aggregates; complements the
    repetition metrics (`text_repetition_metrics`) and Zipf slope."""
    d = load(spark, "documents", sf_dir)
    wc = (
        d.select(
            "doc_id",
            F.explode(
                F.filter(
                    F.split(F.trim(F.lower("text")), r"\s+"),
                    lambda t: t != F.lit(""),
                )
            ).alias("w"),
        )
        .groupBy("doc_id", "w")
        .agg(F.count("*").alias("c"))
    )
    return wc.groupBy("doc_id").agg(
        F.sum("c").cast("bigint").alias("n_tokens"),
        F.count("*").cast("bigint").alias("n_types"),
        F.round(F.count("*") / F.sum("c"), 6).alias("ttr"),
        F.round(
            F.sum((F.col("c") == 1).cast("long")) / F.count("*"), 6
        ).alias("hapax_rate"),
    )


def _bpe_vocab_sql() -> str:
    """Inline the frozen BPE vocab (functions/bpe_vocab.json) as a VALUES
    list — the oracle must embed the identical token set the engine
    encodes with."""
    from .functions.bpe import load_vocab

    return ", ".join(
        "('" + t.replace("'", "''") + "')" for t in load_vocab()
    )


@query(
    "text_bpe_tokenize",
    f"""
    WITH RECURSIVE vocab(tok) AS (VALUES {{BPE_VOCAB}}),
    v AS (SELECT tok, length(tok) AS vlen, substr(tok, 1, 1) AS c1 FROM vocab),
    t AS (SELECT doc_id, {_DUCK_TOKENS} AS toks FROM documents),
    w AS (SELECT doc_id, unnest(toks) AS word,
                 generate_subscripts(toks, 1) AS wpos
          FROM t),
    dw AS (SELECT DISTINCT word FROM w),
    -- greedy longest-match at every char position of every DISTINCT word:
    -- pick the longest vocab token matching there, single char as fallback
    pos AS (SELECT dw.word, g.pos, substr(dw.word, g.pos, 1) AS ch
            FROM dw, LATERAL (SELECT unnest(generate_series(1, length(dw.word))) AS pos) g),
    jump AS (
      SELECT p.word, p.pos,
             coalesce(arg_max(v.tok, v.vlen), any_value(p.ch)) AS tok
      FROM pos p LEFT JOIN v
        ON p.ch = v.c1 AND substr(p.word, p.pos, v.vlen) = v.tok
      GROUP BY p.word, p.pos
    ),
    -- pointer-chase the greedy encode: next position = pos + len(match)
    walk(word, pos, tok, tlen) AS (
      SELECT word, pos, tok, length(tok) FROM jump WHERE pos = 1
      UNION ALL
      SELECT j.word, j.pos, j.tok, length(j.tok)
      FROM walk x JOIN jump j ON j.word = x.word AND j.pos = x.pos + x.tlen
    ),
    enc AS (
      SELECT word, CAST(count(*) AS BIGINT) AS n_toks,
             string_agg(CAST(length(tok) AS VARCHAR) || ':' || tok, ''
                        ORDER BY pos) || '/' AS enc
      FROM walk GROUP BY word
    ),
    we AS (SELECT w.doc_id, w.wpos, e.n_toks, e.enc
           FROM w JOIN enc e USING (word))
    SELECT doc_id,
           CAST(sum(n_toks) AS BIGINT) AS n_tokens,
           CAST(count(*) AS BIGINT)    AS n_words,
           md5(string_agg(enc, '' ORDER BY wpos)) AS token_fingerprint,
           CAST(sum(n_toks) AS DOUBLE) / count(*) AS tokens_per_word
    FROM we GROUP BY doc_id
    """.replace("{BPE_VOCAB}", _bpe_vocab_sql()),
)
def text_bpe_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Subword (BPE-vocab) token accounting per document — the unit an LLM
    training pipeline bills by; whitespace counts misestimate it (VERDICT
    r8 #5). Greedy longest-match against the frozen vocab
    (functions/bpe_vocab.json; see functions/bpe.py for the encode
    contract).

    Scale shape — dictionary encode: the Python-side encoder (Arrow-batched
    mapInPandas, one C-speed regex scan per word) runs over the
    DISTINCT-word table only — the corpus VOCABULARY, not the corpus — and
    the corpus-sized work is the exploded-words equi-join against that
    dictionary plus combinable per-doc aggregates (sum/count/ordered
    string concat). The per-doc fingerprint is md5 over the length-prefixed
    token stream in word order — injective over tokenizations — and the
    oracle replays the identical greedy encode in SQL (recursive
    pointer-chase over per-position longest matches), so the hash check
    certifies every token boundary of every word.
    """
    from .functions.bpe import encode_words

    d = load(spark, "documents", sf_dir).select("doc_id", "text")
    w = d.select(
        "doc_id",
        F.posexplode(tx.tokens("text")).alias("wpos", "word"),
    )
    enc = encode_words(w.select("word").distinct())
    we = w.join(enc, "word")
    return we.groupBy("doc_id").agg(
        F.sum("n_toks").cast("bigint").alias("n_tokens"),
        F.count("*").cast("bigint").alias("n_words"),
        F.md5(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("wpos", "enc"))),
                    lambda r: r["enc"],
                ),
                "",
            )
        ).alias("token_fingerprint"),
        (F.sum("n_toks").cast("double") / F.count("*")).alias("tokens_per_word"),
    )


@query(
    "text_bpe_token_budget",
    f"""
    WITH RECURSIVE vocab(tok) AS (VALUES {{BPE_VOCAB}}),
    v AS (SELECT tok, length(tok) AS vlen, substr(tok, 1, 1) AS c1 FROM vocab),
    t AS (SELECT source, {_DUCK_TOKENS} AS toks FROM documents),
    w AS (SELECT source, unnest(toks) AS word FROM t),
    dw AS (SELECT DISTINCT word FROM w),
    pos AS (SELECT dw.word, g.pos, substr(dw.word, g.pos, 1) AS ch
            FROM dw, LATERAL (SELECT unnest(generate_series(1, length(dw.word))) AS pos) g),
    jump AS (
      SELECT p.word, p.pos,
             coalesce(arg_max(v.tok, v.vlen), any_value(p.ch)) AS tok
      FROM pos p LEFT JOIN v
        ON p.ch = v.c1 AND substr(p.word, p.pos, v.vlen) = v.tok
      GROUP BY p.word, p.pos
    ),
    walk(word, pos, tlen) AS (
      SELECT word, pos, length(tok) FROM jump WHERE pos = 1
      UNION ALL
      SELECT j.word, j.pos, length(j.tok)
      FROM walk x JOIN jump j ON j.word = x.word AND j.pos = x.pos + x.tlen
    ),
    enc AS (SELECT word, CAST(count(*) AS BIGINT) AS n_toks
            FROM walk GROUP BY word),
    src AS (
      SELECT source, CAST(sum(e.n_toks) AS BIGINT) AS tokens
      FROM w JOIN enc e USING (word) GROUP BY source
    ), tot AS (
      SELECT CAST(sum(tokens) AS BIGINT) AS total,
             CAST(count(*) AS BIGINT) AS n_src
      FROM src
    ), ordered AS (
      SELECT source, tokens,
             row_number() OVER (ORDER BY tokens, source) AS rk,
             sum(tokens) OVER (ORDER BY tokens, source
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS csum
      FROM src
    ), caps AS (
      SELECT o.source, o.tokens, o.rk, t.total, t.n_src,
             (0.5e0 * t.total - (o.csum - o.tokens)) / (t.n_src - o.rk + 1)
               AS cap_cand
      FROM ordered o CROSS JOIN tot t
    ), cap AS (
      SELECT max(cap_cand) AS c FROM caps WHERE cap_cand <= tokens
    )
    SELECT source, tokens,
           round(least(CAST(tokens AS DOUBLE), cap.c), 4) AS allocation,
           round(least(CAST(tokens AS DOUBLE), cap.c) / tokens, 6)
             AS keep_fraction
    FROM src CROSS JOIN cap
    """.replace("{BPE_VOCAB}", _bpe_vocab_sql()),
)
def text_bpe_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Water-filling token-budget allocation keyed on REAL subword token
    counts (mlprep_token_budget_allocation uses n_chars as the proxy; a
    training pipeline bills by tokenizer output — VERDICT r8 #5). Same
    closed-form cap solve: sort sources by token mass; for each prefix the
    candidate cap is (budget − smaller-source mass)/(remaining sources);
    the true cap is the max candidate within its own source size.

    The corpus-sized work is the same dictionary-encode join as
    text_bpe_tokenize followed by a combinable sum to the |sources| grain;
    the solve is windows over ≤|sources| rows.
    """
    from .functions.bpe import encode_words

    d = load(spark, "documents", sf_dir).select("source", "text")
    w = d.select("source", F.explode(tx.tokens("text")).alias("word"))
    enc = encode_words(w.select("word").distinct()).select("word", "n_toks")
    src = (
        w.join(enc, "word")
        .groupBy("source")
        .agg(F.sum("n_toks").cast("bigint").alias("tokens"))
    )
    from pyspark import StorageLevel

    src = src.persist(StorageLevel.MEMORY_AND_DISK)
    tot = src.agg(
        F.sum("tokens").cast("bigint").alias("total"),
        F.count("*").cast("bigint").alias("n_src"),
    )
    w_ord = Window.orderBy("tokens", "source")
    ordered = src.select(
        "source",
        "tokens",
        F.row_number().over(w_ord).alias("rk"),
        F.sum("tokens")
        .over(w_ord.rowsBetween(Window.unboundedPreceding, 0))
        .alias("csum"),
    )
    caps = ordered.crossJoin(F.broadcast(tot)).select(
        "source",
        "tokens",
        (
            (F.lit(0.5) * F.col("total") - (F.col("csum") - F.col("tokens")))
            / (F.col("n_src") - F.col("rk") + 1)
        ).alias("cap_cand"),
    )
    cap = caps.filter(F.col("cap_cand") <= F.col("tokens")).agg(
        F.max("cap_cand").alias("c")
    )
    alloc = F.least(F.col("tokens").cast("double"), F.col("c"))
    return src.crossJoin(F.broadcast(cap)).select(
        "source",
        "tokens",
        F.round(alloc, 4).alias("allocation"),
        F.round(alloc / F.col("tokens"), 6).alias("keep_fraction"),
    )


@query(
    "text_bpe_chunk",
    f"""
    WITH RECURSIVE vocab(tok) AS (VALUES {{BPE_VOCAB}}),
    v AS (SELECT tok, length(tok) AS vlen, substr(tok, 1, 1) AS c1 FROM vocab),
    t AS (SELECT doc_id, {_DUCK_TOKENS} AS toks FROM documents),
    w AS (SELECT doc_id, unnest(toks) AS word,
                 generate_subscripts(toks, 1) AS wpos
          FROM t),
    dw AS (SELECT DISTINCT word FROM w),
    pos AS (SELECT dw.word, g.pos, substr(dw.word, g.pos, 1) AS ch
            FROM dw, LATERAL (SELECT unnest(generate_series(1, length(dw.word))) AS pos) g),
    jump AS (
      SELECT p.word, p.pos,
             coalesce(arg_max(v.tok, v.vlen), any_value(p.ch)) AS tok
      FROM pos p LEFT JOIN v
        ON p.ch = v.c1 AND substr(p.word, p.pos, v.vlen) = v.tok
      GROUP BY p.word, p.pos
    ),
    walk(word, pos, tlen) AS (
      SELECT word, pos, length(tok) FROM jump WHERE pos = 1
      UNION ALL
      SELECT j.word, j.pos, length(j.tok)
      FROM walk x JOIN jump j ON j.word = x.word AND j.pos = x.pos + x.tlen
    ),
    enc AS (SELECT word, CAST(count(*) AS BIGINT) AS n_toks
            FROM walk GROUP BY word),
    we AS (
      SELECT w.doc_id, w.wpos, e.n_toks,
             sum(e.n_toks) OVER (PARTITION BY w.doc_id ORDER BY w.wpos
                                 ROWS UNBOUNDED PRECEDING) AS cum
      FROM w JOIN enc e USING (word)
    )
    SELECT doc_id,
           CAST((cum - n_toks) // 128 AS BIGINT) AS chunk_id,
           CAST(count(*) AS BIGINT) AS n_words,
           CAST(sum(n_toks) AS BIGINT) AS n_tokens,
           CAST(min(wpos) AS BIGINT) AS first_wpos
    FROM we GROUP BY doc_id, (cum - n_toks) // 128
    """.replace("{BPE_VOCAB}", _bpe_vocab_sql()),
)
def text_bpe_chunk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window packing counted in REAL subword tokens: each word
    lands in the chunk its starting token offset falls in
    (chunk_id = tokens-before-word div 128) — word-aligned, deterministic,
    non-overlapping; the whitespace-token chunker
    (text_chunk_fixed_tokens) misestimates training-sequence budgets the
    same way whitespace counts misestimate billing (VERDICT r8 #5).

    Scale shape: the same dictionary-encode join as text_bpe_tokenize,
    then ONE doc-grain cumulative window (partitioned by doc_id — bounded
    by document length, never a global or user-hot partition) and a
    combinable per-(doc, chunk) rollup. Oracle replays encode + cumsum +
    integer chunk arithmetic exactly — hash-checked."""
    from .functions.bpe import encode_words

    d = load(spark, "documents", sf_dir).select("doc_id", "text")
    w = d.select(
        "doc_id",
        F.posexplode(tx.tokens("text")).alias("wpos0", "word"),
    ).select("doc_id", (F.col("wpos0") + 1).alias("wpos"), "word")
    enc = encode_words(w.select("word").distinct()).select("word", "n_toks")
    wd = Window.partitionBy("doc_id").orderBy("wpos").rowsBetween(
        Window.unboundedPreceding, 0
    )
    we = w.join(enc, "word").withColumn("cum", F.sum("n_toks").over(wd))
    chunk = ((F.col("cum") - F.col("n_toks")) / 128).cast("bigint")
    return (
        we.groupBy("doc_id", chunk.alias("chunk_id"))
        .agg(
            F.count("*").cast("bigint").alias("n_words"),
            F.sum("n_toks").cast("bigint").alias("n_tokens"),
            F.min("wpos").cast("bigint").alias("first_wpos"),
        )
    )


def _bpe_train_oracle_sql(n_merges: int = 40) -> str:
    """text_bpe_train's oracle: the FULL merge trajectory replayed in
    DuckDB as chained MATERIALIZED CTEs (the rounded-fit replay pattern of
    the kmeans/PQ oracles, q_ml.py) — per step, adjacent-pair counts over
    the token-list table, the (count DESC, a, b) argmax, and the greedy
    left-to-right merge application as a recursive pointer-chase over each
    word's token list (the same scan the Spark fold and the pinned twin
    tools/gen_bpe_vocab.py::train perform; a string REPLACE would diverge
    on runs — see functions/bpe.py::_apply_merge). A step whose best count
    drops below 2 yields an empty b{i} CTE: the NULL scalar subqueries make
    every later step a pass-through and the merge table simply ends, which
    is exactly the trainer's stop rule."""
    parts = [
        """wf AS MATERIALIZED (
      SELECT w, CAST(count(*) AS BIGINT) AS f FROM (
        SELECT unnest(list_filter(string_split_regex(trim(text), '\\s+'),
                                  x -> x != '')) AS w
        FROM documents)
      WHERE length(w) > 0 GROUP BY w
    ),
    t0 AS MATERIALIZED (
      SELECT w, f, list_transform(range(1, length(w) + 1), i -> w[i]) AS t
      FROM wf
    )"""
    ]
    for i in range(n_merges):
        parts.append(f"""p{i} AS MATERIALIZED (
      SELECT t[j] AS a, t[j + 1] AS b, CAST(sum(f) AS BIGINT) AS cnt
      FROM t{i}, unnest(range(1, len(t))) AS u(j)
      GROUP BY 1, 2
    ),
    b{i} AS MATERIALIZED (
      SELECT a, b, cnt FROM p{i} WHERE cnt >= 2
      ORDER BY cnt DESC, a, b LIMIT 1
    ),
    s{i} AS (
      SELECT w, f, t, 1 AS j, CAST([] AS VARCHAR[]) AS out FROM t{i}
      UNION ALL
      SELECT w, f, t,
        CASE WHEN j < len(t) AND t[j] = (SELECT a FROM b{i})
                  AND t[j + 1] = (SELECT b FROM b{i})
             THEN j + 2 ELSE j + 1 END,
        list_append(out,
          CASE WHEN j < len(t) AND t[j] = (SELECT a FROM b{i})
                    AND t[j + 1] = (SELECT b FROM b{i})
               THEN (SELECT a || b FROM b{i}) ELSE t[j] END)
      FROM s{i} WHERE j <= len(t)
    ),
    t{i + 1} AS MATERIALIZED (
      SELECT w, f, out AS t FROM s{i} WHERE j = len(t) + 1
    )""")
    union = "\n      UNION ALL ".join(
        f"SELECT CAST({i + 1} AS INTEGER) AS step, a || b AS tok, cnt FROM b{i}"
        for i in range(n_merges)
    )
    return (
        "\n    WITH RECURSIVE "
        + ",\n    ".join(parts)
        + f"\n    SELECT step, tok, cnt FROM ({union})"
    )


@query("text_bpe_train", _bpe_train_oracle_sql(40))
def text_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed BPE vocabulary TRAINING (VERDICT r9 #4 — the committed
    bpe_vocab.json was driver-trained offline; a 100 TB pipeline must learn
    its tokenizer on the corpus). The merge loop runs as an iterative
    DataFrame job over the vocabulary-grain distinct-word table
    (functions/bpe.py::bpe_train_merges: per step one combinable
    adjacent-pair aggregate + a 1-row driver argmax with the deterministic
    (-count, a, b) tie-break + a fold projection applying the merge;
    lineage truncated per step). Output is the learned merge table —
    (step, merged token, weighted pair count) — whose derived vocab
    byte-equals the committed artifact on its training corpus
    (tests/test_bpe_train.py).

    Hash-checked end-to-end: the oracle replays the ENTIRE training
    trajectory in SQL (chained per-step CTEs; greedy merge application as
    a recursive pointer-chase), so the hash certifies every merge decision
    — pair statistics, tie-breaks, and merge positions — of every step.
    All-integer arithmetic: no rounding contract needed, the trajectories
    are exactly equal or not."""
    from .functions.bpe import bpe_train_merges

    d = load(spark, "documents", sf_dir).select("text")
    wf = (
        d.select(F.explode(tx.tokens("text")).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("f"))
    )
    merges = bpe_train_merges(wf, n_merges=40, word_col="w", freq_col="f")
    return spark.createDataFrame(
        [(s, m, c) for (s, _a, _b, m, c) in merges],
        "step int, tok string, cnt bigint",
    )
