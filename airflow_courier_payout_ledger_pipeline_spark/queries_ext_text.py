"""Text analysis & tokenization queries: stats/quality scoring, language id, fingerprinting, repetition/Gopher-C4 rules, vocab/contamination, BPE train+encode.

Split out of the former monolithic queries_ext.py (round 10) so the
changed-file -> re-adjudicate rule schedules only this domain's queries.
Registration side effects: importing this module registers its queries.
"""

from __future__ import annotations
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from airflow_courier_payout_ledger_pipeline_spark.plans.tpch_adapter import load_tables
from airflow_courier_payout_ledger_pipeline_spark.registry import register

# SQL fragment: Spark normalize_text() twin (DuckDB needs the 'g' flag explicitly)
NORM = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"

# =====================================================================================
# Text analysis
# =====================================================================================

_STOP_SQL = " + ".join(
    f"(length(text) - length(replace(text, '{m}', ''))) / {len(m)}"
    for m in [" the ", " and ", " of "]
)

TEXT_STATS_ORACLE = f"""
WITH c AS (
    SELECT doc_id,
           length(text) AS n0,
           greatest(length(text), 1)::BIGINT AS n,
           len(string_split(text, ' ')) AS ws_tokens,
           greatest(len(string_split(text, ' ')), 1)::BIGINT AS w,
           ({_STOP_SQL})::BIGINT AS s,
           len(regexp_extract_all(text, '[a-z]+|[A-Z][a-z]*|[0-9]+|[^A-Za-z0-9 ]')) AS bpe_tokens,
           len(regexp_extract_all(text, '[.,!?;:]'))::BIGINT AS p,
           len(regexp_extract_all(text, '[0-9]'))::BIGINT AS d
    FROM documents
)
SELECT doc_id,
       n0 AS n_chars_measured,
       ws_tokens,
       bpe_tokens,
       p::BIGINT AS punct_chars,
       d::BIGINT AS digit_chars,
       round(
         ((CASE WHEN n0 >= 100 AND n0 <= 20000 THEN 4 ELSE 2 END)::BIGINT * w * n
          + 3 * n * least(5 * s, w)
          + 2 * w * (n - least(10 * p, n))
          + w * (n - least(10 * d, n)))::DOUBLE
         / (10 * w * n)::DOUBLE, 4) AS quality
FROM c
"""


@register("text_stats", TEXT_STATS_ORACLE)
def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting (whitespace + BPE-ish regex), punctuation/digit density, and
    the composite quality score — all codegen'd projections, zero shuffles."""
    from airflow_courier_payout_ledger_pipeline_spark.functions import text as T

    docs = load_tables(spark, sf_dir, "documents")["documents"]
    t = F.col("text")
    return docs.select(
        "doc_id",
        F.length(t).cast("long").alias("n_chars_measured"),
        T.whitespace_token_count(t).cast("long").alias("ws_tokens"),
        T.regex_token_count(t).cast("long").alias("bpe_tokens"),
        T.punct_count(t).cast("long").alias("punct_chars"),
        T.digit_count(t).cast("long").alias("digit_chars"),
        T.quality_score(t).alias("quality"),
    )


def _lang_score_sql(markers: list[str]) -> str:
    padded = "(' ' || lower(text) || ' ')"
    return " + ".join(
        f"(length({padded}) - length(replace({padded}, '{m}', ''))) / {len(m)}"
        for m in markers
    )


def _build_lang_oracle() -> str:
    from airflow_courier_payout_ledger_pipeline_spark.functions.text import LANG_MARKERS

    scores = {lang: _lang_score_sql(ms) for lang, ms in LANG_MARKERS.items()}
    best = "greatest(" + ", ".join(f"s_{lang}" for lang in scores) + ")"
    case = " ".join(
        f"WHEN s_{lang} = {best} THEN '{lang}'" for lang in sorted(scores)
    )
    inner = ", ".join(f"({sql}) AS s_{lang}" for lang, sql in scores.items())
    return f"""
WITH scored AS (SELECT doc_id, lang AS declared_lang, {inner} FROM documents)
SELECT doc_id, declared_lang,
       CASE WHEN {best} > 0 THEN (CASE {case} END) ELSE 'und' END AS predicted_lang
FROM scored
"""


@register("lang_id", _build_lang_oracle())
def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-based language ID (argmax over per-language stopword scores)."""
    from airflow_courier_payout_ledger_pipeline_spark.functions.text import predict_lang

    docs = load_tables(spark, sf_dir, "documents")["documents"]
    return docs.select(
        "doc_id",
        F.col("lang").alias("declared_lang"),
        predict_lang(F.col("text")).alias("predicted_lang"),
    )


DOC_FINGERPRINT_ORACLE = f"""
SELECT doc_id, md5({NORM}) AS fp FROM documents
"""


@register("doc_fingerprint", DOC_FINGERPRINT_ORACLE)
def q_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic content fingerprint of the normalized text (dedup key)."""
    from airflow_courier_payout_ledger_pipeline_spark.functions.text import fingerprint

    docs = load_tables(spark, sf_dir, "documents")["documents"]
    return docs.select("doc_id", fingerprint(F.col("text")).alias("fp"))


# =====================================================================================
# Corpus quality: repetition signals & benchmark contamination (operators/quality.py)
# =====================================================================================

REPETITION_ORACLE = f"""
WITH norm AS (SELECT doc_id, string_split({NORM}, ' ') AS ws FROM documents),
toks AS (
    SELECT doc_id, unnest(ws) AS tok FROM norm
),
ucnt AS (SELECT doc_id, tok, count(*) AS c FROM toks WHERE tok != '' GROUP BY 1, 2),
ustats AS (
    SELECT doc_id, SUM(c)::BIGINT AS n_tokens, count(*) AS n_distinct,
           max(c) AS top_tok
    FROM ucnt GROUP BY 1
),
bpos AS (
    SELECT doc_id, ws, unnest(generate_series(1, len(ws) - 1)) AS i
    FROM norm WHERE len(ws) >= 2
),
bcnt AS (
    SELECT doc_id, concat_ws(' ', ws[i], ws[i+1]) AS bigram, count(*) AS c
    FROM bpos GROUP BY 1, 2
),
bstats AS (SELECT doc_id, SUM(c)::BIGINT AS n_bi, max(c) AS top_bi FROM bcnt GROUP BY 1)
SELECT u.doc_id AS id, u.n_tokens, u.n_distinct,
       round((u.n_tokens - u.n_distinct)::DOUBLE / u.n_tokens::DOUBLE, 4) AS dup_token_frac,
       round(u.top_tok::DOUBLE / u.n_tokens::DOUBLE, 4) AS top_token_frac,
       round(b.top_bi::DOUBLE / b.n_bi::DOUBLE, 4) AS top_bigram_frac
FROM ustats u LEFT JOIN bstats b USING (doc_id)
"""


@register("repetition_stats", REPETITION_ORACLE)
def q_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-family repetition filters: duplicate-token fraction, top-token
    share, top-bigram share per document (operators/quality.repetition_stats —
    explode → hash-agg, linear, no UDFs)."""
    from airflow_courier_payout_ledger_pipeline_spark.operators.quality import (
        repetition_stats,
    )

    docs = load_tables(spark, sf_dir, "documents")["documents"]
    return repetition_stats(docs, "doc_id", "text")


_QSTOP_SQL = " + ".join(
    f"(length(padded) - length(replace(padded, '{m}', ''))) / {len(m)}"
    for m in [" the ", " and ", " of "]
)

QUALITY_RULES_ORACLE = f"""
WITH c AS (
    SELECT doc_id, {NORM} AS norm, length(text) AS rawlen,
           len(regexp_extract_all(text, '[0-9]'))::BIGINT AS digits
    FROM documents
),
t AS (
    SELECT doc_id, rawlen, digits,
           CASE WHEN norm = '' THEN 0 ELSE len(string_split(norm, ' ')) END::INTEGER AS n_words,
           CASE WHEN norm = '' THEN 0
                ELSE length(norm) - (len(string_split(norm, ' ')) - 1) END::BIGINT AS sum_len,
           concat(' ', norm, ' ') AS padded
    FROM c
),
f AS (
    SELECT doc_id, n_words, sum_len,
           n_words BETWEEN 10 AND 100000 AS words_ok,
           n_words > 0 AND sum_len >= 2 * n_words AND sum_len <= 12 * n_words AS mean_len_ok,
           ({_QSTOP_SQL})::BIGINT >= 1 AS stopword_ok,
           100 * digits <= 20 * rawlen AS digit_ok
    FROM t
)
SELECT doc_id AS id, n_words,
       CASE WHEN n_words > 0
            THEN round(sum_len::DOUBLE / n_words::DOUBLE, 4) END AS mean_word_len,
       words_ok, mean_len_ok, stopword_ok, digit_ok,
       words_ok AND mean_len_ok AND stopword_ok AND digit_ok AS keep
FROM f
"""


@register("quality_rules", QUALITY_RULES_ORACLE)
def q_quality_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher/C4-style rule flags per document (word-count band, mean-word-length
    band, stopword presence, digit density) plus the combined keep verdict —
    zero-shuffle map-side codegen, the cheapest first stage of a curation funnel
    (operators/quality.quality_rule_flags)."""
    from airflow_courier_payout_ledger_pipeline_spark.operators.quality import (
        quality_rule_flags,
    )

    docs = load_tables(spark, sf_dir, "documents")["documents"]
    return quality_rule_flags(docs, "doc_id", "text")


VOCAB_ORACLE = f"""
WITH toks AS (
    SELECT doc_id, unnest(string_split({NORM}, ' ')) AS token FROM documents
)
SELECT token, count(*) AS tf, count(DISTINCT doc_id) AS df
FROM toks WHERE token != ''
GROUP BY 1 HAVING count(*) >= 2
"""


@register("vocab_counts", VOCAB_ORACLE)
def q_vocab_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary (token → total occurrences + document frequency), the
    tokenizer-training / idf input: explode → single grouped agg keyed by token,
    map-side partials absorbing hot tokens (operators/quality.vocab_counts)."""
    from airflow_courier_payout_ledger_pipeline_spark.operators.quality import (
        vocab_counts,
    )

    docs = load_tables(spark, sf_dir, "documents")["documents"]
    return vocab_counts(docs, "doc_id", "text", min_count=2)


CONTAMINATION_N = 8  # published standard for train-test overlap screening

_C8 = ", ".join(f"ws[i+{j}]" for j in range(CONTAMINATION_N))

CONTAMINATION_ORACLE = f"""
WITH norm AS (SELECT doc_id, string_split({NORM}, ' ') AS ws FROM documents),
pos AS (
    SELECT doc_id, ws,
           unnest(generate_series(1, greatest(len(ws) - {CONTAMINATION_N - 1}, 1))) AS i
    FROM norm
),
g AS (SELECT DISTINCT doc_id AS id, concat_ws(' ', {_C8}) AS ngram FROM pos),
b AS (SELECT id AS bench_id, ngram FROM g WHERE id % 20 = 0),
c AS (SELECT id, ngram FROM g WHERE id % 20 != 0)
SELECT c.id, count(DISTINCT c.ngram) AS n_shared_ngrams,
       count(DISTINCT b.bench_id) AS n_bench_docs
FROM c JOIN b ON c.ngram = b.ngram
GROUP BY 1
"""


@register("ngram_contamination", CONTAMINATION_ORACLE)
def q_ngram_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark contamination screen: corpus docs sharing any word 8-gram with
    the held-out suite (here: every 20th doc stands in for the benchmark). The
    benchmark gram set is broadcast — the corpus side never shuffles for the
    probe (operators/quality.ngram_contamination)."""
    from airflow_courier_payout_ledger_pipeline_spark.operators.dedup import word_ngrams
    from airflow_courier_payout_ledger_pipeline_spark.operators.quality import (
        ngram_contamination,
    )

    docs = load_tables(spark, sf_dir, "documents")["documents"]
    grams = word_ngrams(docs, "doc_id", "text", n=CONTAMINATION_N)
    bench = grams.filter(F.col("id") % 20 == 0)
    corpus = grams.filter(F.col("id") % 20 != 0)
    return ngram_contamination(corpus, bench)


BPE_ORACLE = """
WITH w0 AS (
    SELECT trim(regexp_replace(word, '(.)', '\\1 ', 'g')) AS seq, count(*)::BIGINT AS n
    FROM (SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS word FROM documents)
    GROUP BY 1
),
pc1 AS (
    SELECT syms[i] || ' ' || syms[i+1] AS pair, SUM(n)::BIGINT AS c
    FROM (SELECT string_split(seq, ' ') AS syms, n FROM w0) t,
         unnest(generate_series(1, len(t.syms) - 1)) AS g(i)
    GROUP BY 1
),
p1 AS (SELECT pair, c FROM pc1 ORDER BY c DESC, pair LIMIT 1),
w1 AS (
    -- boundary-anchored merge: pad (double inter-symbol gaps, wrap ends),
    -- literal-replace the padded pair, un-pad — a raw replace could match
    -- ACROSS symbol boundaries ('b al l' contains 'l l')
    SELECT trim(replace(replace(' ' || replace(w0.seq, ' ', '  ') || ' ', ' ' || replace(p1.pair, ' ', '  ') || ' ', ' ' || replace(p1.pair, ' ', '') || ' '), '  ', ' ')) AS seq, w0.n
    FROM w0 CROSS JOIN p1
),
pc2 AS (
    SELECT syms[i] || ' ' || syms[i+1] AS pair, SUM(n)::BIGINT AS c
    FROM (SELECT string_split(seq, ' ') AS syms, n FROM w1) t,
         unnest(generate_series(1, len(t.syms) - 1)) AS g(i)
    GROUP BY 1
),
p2 AS (SELECT pair, c FROM pc2 ORDER BY c DESC, pair LIMIT 1)
SELECT 1::INT AS iter, pair, c AS pair_count FROM p1
UNION ALL
SELECT 2::INT AS iter, pair, c AS pair_count FROM p2
"""


@register("bpe_merges", BPE_ORACLE)
def q_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenizer training (2 merge iterations) as a driver-checked query:
    one corpus pass builds the word-frequency table, then each iteration
    counts adjacent symbol pairs over DISTINCT WORDS only, argmaxes with a
    lexicographic tiebreak, and merges via literal string replace — the
    subword-NMT algorithm whose chosen merges the DuckDB oracle replays and
    hash-checks (operators/tokenize.bpe_train_merges)."""
    from airflow_courier_payout_ledger_pipeline_spark.operators.tokenize import (
        bpe_train_merges,
    )

    docs = load_tables(spark, sf_dir, "documents")["documents"]
    return bpe_train_merges(docs, iters=2)


# Re-derives the two trained merges exactly as BPE_ORACLE does, then applies
# them per word IN TRAINING ORDER (nested replace — greedy left-to-right in
# both engines) and counts surviving symbols per doc.
BPE_ENCODE_ORACLE = """
WITH w0 AS (
    SELECT trim(regexp_replace(word, '(.)', '\\1 ', 'g')) AS seq, count(*)::BIGINT AS n
    FROM (SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS word FROM documents)
    GROUP BY 1
),
pc1 AS (
    SELECT syms[i] || ' ' || syms[i+1] AS pair, SUM(n)::BIGINT AS c
    FROM (SELECT string_split(seq, ' ') AS syms, n FROM w0) t,
         unnest(generate_series(1, len(t.syms) - 1)) AS g(i)
    GROUP BY 1
),
p1 AS (SELECT pair FROM pc1 ORDER BY c DESC, pair LIMIT 1),
w1 AS (
    -- boundary-anchored merge: pad (double inter-symbol gaps, wrap ends),
    -- literal-replace the padded pair, un-pad — a raw replace could match
    -- ACROSS symbol boundaries ('b al l' contains 'l l')
    SELECT trim(replace(replace(' ' || replace(w0.seq, ' ', '  ') || ' ', ' ' || replace(p1.pair, ' ', '  ') || ' ', ' ' || replace(p1.pair, ' ', '') || ' '), '  ', ' ')) AS seq, w0.n
    FROM w0 CROSS JOIN p1
),
pc2 AS (
    SELECT syms[i] || ' ' || syms[i+1] AS pair, SUM(n)::BIGINT AS c
    FROM (SELECT string_split(seq, ' ') AS syms, n FROM w1) t,
         unnest(generate_series(1, len(t.syms) - 1)) AS g(i)
    GROUP BY 1
),
p2 AS (SELECT pair FROM pc2 ORDER BY c DESC, pair LIMIT 1),
docw AS (
    SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS word
    FROM documents
),
enc AS (
    SELECT doc_id,
           len(string_split(trim(replace(replace(' ' || replace((trim(replace(replace(' ' || replace(trim(regexp_replace(word, '(.)', '\\1 ', 'g')), ' ', '  ') || ' ', ' ' || replace((SELECT pair FROM p1), ' ', '  ') || ' ', ' ' || replace((SELECT pair FROM p1), ' ', '') || ' '), '  ', ' '))), ' ', '  ') || ' ', ' ' || replace((SELECT pair FROM p2), ' ', '  ') || ' ', ' ' || replace((SELECT pair FROM p2), ' ', '') || ' '), '  ', ' ')), ' ')) AS ntok
    FROM docw
),
agg AS (
    SELECT doc_id, count(*)::BIGINT AS n_words, SUM(ntok)::BIGINT AS bpe_tokens
    FROM enc GROUP BY 1
)
SELECT d.doc_id,
       coalesce(a.n_words, 0)::BIGINT AS n_words,
       coalesce(a.bpe_tokens, 0)::BIGINT AS bpe_tokens
FROM documents d LEFT JOIN agg a USING (doc_id)
"""


@register("bpe_token_counts", BPE_ENCODE_ORACLE)
def q_bpe_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The apply half of the tokenizer: train two BPE merges on the corpus
    (`bpe_train_merges` — O(1) driver state), then encode every document with
    them and report per-doc word and TOKEN counts — the number packing, batch
    sizing, and mix budgeting actually consume. Encoding is map-side chained
    literal replace; one explode + one doc-grain shuffle
    (operators/tokenize.bpe_encode_counts). The oracle re-derives the same two
    merges and replays the same greedy replace chain."""
    from airflow_courier_payout_ledger_pipeline_spark.operators.tokenize import (
        bpe_encode_counts,
        bpe_train_merges,
    )

    docs = load_tables(spark, sf_dir, "documents")["documents"]
    merges = [r["pair"] for r in bpe_train_merges(docs, iters=2).collect()]
    return bpe_encode_counts(docs, merges)
