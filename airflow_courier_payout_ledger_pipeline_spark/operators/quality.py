"""Corpus-quality operators for training-data curation: Gopher-style repetition
signals and benchmark n-gram contamination screening.

Both are pure built-in-expression plans (no Python UDFs): explode → hash-agg
shapes whose shuffles carry (doc, gram) pairs — linear in corpus size, never
pairwise. Patterns follow the published filters (Gopher/MassiveText repetition
thresholds; the GPT-3/PaLM n-gram train-test overlap check) re-expressed as
Spark plans; the reference pipeline has no corpus operators (its compute is
Postgres SQL, cf. sql/courier_ledger_update.sql), so these extend SURVEY §2's
surface for the 100 TB training-data story.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from airflow_courier_payout_ledger_pipeline_spark.functions.text import normalize_text
from airflow_courier_payout_ledger_pipeline_spark.operators.dedup import _spread


def repetition_stats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-document repetition signals (the Gopher repetition filter family):

    - ``dup_token_frac``   — fraction of tokens that are repeats of an earlier
      token (1 − distinct/total);
    - ``top_token_frac``   — share of the single most frequent token;
    - ``top_bigram_frac``  — share of the most frequent bigram (NULL for
      one-token documents, which have no bigrams).

    Plan: two explodes (tokens, bigrams) each followed by two partial-agg
    shuffles keyed by doc — linear in corpus size, and the (doc, gram) keys are
    near-unique so there is no skew. Fractions divide identical int64 counts,
    so the doubles (and their round(·, 4)) are bit-identical across engines.

    Cross-engine contract (mirrors the DuckDB oracle): tokens come from a
    single-space split of the normalized text; empty documents vanish (their
    only token is '' and is filtered on both sides); bigrams are built only for
    docs with ≥ 2 tokens so no partial grams are ever counted.
    """
    # split materialized below the Exchange barrier so the regexp-backed
    # normalization runs once per doc, not per exploded token/bigram
    # (see dedup.char_shingles)
    base = _spread(
        df.select(
            F.col(id_col).alias("id"),
            F.split(normalize_text(F.col(text_col)), " ").alias("__w"),
        )
    )

    toks = base.select("id", F.explode("__w").alias("tok")).filter(F.col("tok") != "")
    ucnt = toks.groupBy("id", "tok").agg(F.count("*").alias("c"))
    ustats = ucnt.groupBy("id").agg(
        F.sum("c").alias("n_tokens"),
        F.count("*").alias("n_distinct"),
        F.max("c").alias("__top_tok"),
    )

    # bigram array built in ONE per-doc expression, then exploded — projecting
    # grams over an exploded index lets the optimizer inline the regexp-backed
    # split so it re-executes per bigram (see dedup.char_shingles)
    bi = base.filter(F.size("__w") >= 2).select(
        "id",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("__w") - 1),
                lambda i: F.concat_ws(
                    " ",
                    F.try_element_at(F.col("__w"), i),
                    F.try_element_at(F.col("__w"), i + F.lit(1)),
                ),
            )
        ).alias("bigram"),
    )
    bcnt = bi.groupBy("id", "bigram").agg(F.count("*").alias("c"))
    bstats = bcnt.groupBy("id").agg(
        F.sum("c").alias("__n_bi"), F.max("c").alias("__top_bi")
    )

    n = F.col("n_tokens").cast("double")
    return ustats.join(bstats, "id", "left").select(
        "id",
        "n_tokens",
        "n_distinct",
        F.round((F.col("n_tokens") - F.col("n_distinct")).cast("double") / n, 4).alias(
            "dup_token_frac"
        ),
        F.round(F.col("__top_tok").cast("double") / n, 4).alias("top_token_frac"),
        F.round(
            F.col("__top_bi").cast("double") / F.col("__n_bi").cast("double"), 4
        ).alias("top_bigram_frac"),
    )


def quality_rule_flags(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    min_words: int = 10,
    max_words: int = 100_000,
    min_mean_len: int = 2,
    max_mean_len: int = 12,
    max_digit_pct: int = 20,
    min_stopword_hits: int = 1,
) -> DataFrame:
    """Gopher/C4-style per-document quality rules, each surfaced as its own flag
    plus the combined ``keep`` verdict (audit-friendly: a curation run wants to
    know *why* a document was dropped, not just that it was).

    Rules (defaults follow the published MassiveText ranges):
    - ``words_ok``    — word count within [min_words, max_words];
    - ``mean_len_ok`` — mean word length within [min_mean_len, max_mean_len];
    - ``stopword_ok`` — at least ``min_stopword_hits`` common-stopword hits
      (natural-language signal);
    - ``digit_ok``    — digit characters ≤ ``max_digit_pct``% of raw length.

    Scale shape: ZERO shuffles — every rule is a map-side codegen expression, so
    at 100 TB this is a pure scan-speed filter (the cheapest possible plan; the
    ideal first stage of a curation funnel, shrinking the corpus before any
    shuffle-bearing dedup runs).

    Determinism: no explode — word count and summed word length come from
    arithmetic identities on the whitespace-collapsed text (sum of token lengths
    = length(norm) − (n_words − 1) separators), and every threshold compares
    exact int64s (e.g. mean-length bounds as ``sum_len BETWEEN lo·n AND hi·n``),
    so the booleans — and the one derived double, ``mean_word_len`` — are
    bit-identical in any engine.
    """
    from airflow_courier_payout_ledger_pipeline_spark.functions.text import (
        LANG_MARKERS,
        digit_count,
        substring_count,
    )

    norm = normalize_text(F.col(text_col))
    n_words = F.when(norm == "", F.lit(0)).otherwise(F.size(F.split(norm, " "))).cast("int")
    sum_len = F.when(norm == "", F.lit(0)).otherwise(
        F.length(norm) - (F.size(F.split(norm, " ")) - F.lit(1))
    ).cast("long")
    padded = F.concat(F.lit(" "), norm, F.lit(" "))
    stop_hits = sum(
        (substring_count(padded, m) for m in LANG_MARKERS["en"]), F.lit(0.0)
    ).cast("long")
    nw = n_words.cast("long")
    words_ok = (n_words >= min_words) & (n_words <= max_words)
    mean_len_ok = (
        (n_words > 0)
        & (sum_len >= min_mean_len * nw)
        & (sum_len <= max_mean_len * nw)
    )
    stopword_ok = stop_hits >= min_stopword_hits
    digit_ok = (100 * digit_count(F.col(text_col)).cast("long")) <= (
        max_digit_pct * F.length(text_col).cast("long")
    )
    return df.select(
        F.col(id_col).alias("id"),
        n_words.alias("n_words"),
        F.when(
            n_words > 0, F.round(sum_len.cast("double") / nw.cast("double"), 4)
        ).alias("mean_word_len"),
        words_ok.alias("words_ok"),
        mean_len_ok.alias("mean_len_ok"),
        stopword_ok.alias("stopword_ok"),
        digit_ok.alias("digit_ok"),
        (words_ok & mean_len_ok & stopword_ok & digit_ok).alias("keep"),
    )


def vocab_counts(
    df: DataFrame, id_col: str, text_col: str, min_count: int = 2
) -> DataFrame:
    """Corpus vocabulary table: per token, total occurrences (``tf``) and the
    number of distinct documents containing it (``df``) — the input to tokenizer
    training, stopword discovery, and idf weighting.

    Scale shape: explode → one grouped aggregation keyed by token. Hot tokens
    ('the') are absorbed by map-side partial aggregation for ``tf``; the
    distinct-doc count shuffles (token, id) pairs once (Spark plans the mixed
    count/count-distinct agg as a single Expand + two-phase agg). Never pairwise,
    linear in corpus token count. The ``min_count`` filter applies post-agg
    (HAVING), pruning the hapax-legomena long tail from the output only.
    """
    base = _spread(
        df.select(
            F.col(id_col).alias("id"),
            F.split(normalize_text(F.col(text_col)), " ").alias("__w"),
        )
    )
    toks = base.select("id", F.explode("__w").alias("token")).filter(
        F.col("token") != ""
    )
    return (
        toks.groupBy("token")
        .agg(F.count("*").alias("tf"), F.countDistinct("id").alias("df"))
        .filter(F.col("tf") >= min_count)
    )


def ngram_contamination(corpus_grams: DataFrame, bench_grams: DataFrame) -> DataFrame:
    """Benchmark-contamination screen: for each corpus document, how many of its
    distinct n-grams appear in ANY benchmark document, and how many benchmark
    documents it overlaps. Inputs are (id, ngram) pair tables (see
    ``dedup.word_ngrams``; 8-grams are the published standard).

    Scale shape: a benchmark suite is fixed-size (thousands of docs) while the
    corpus is the 100 TB side — so the benchmark gram set is **broadcast** and
    the corpus is never shuffled for the probe; the only shuffle is the final
    per-doc aggregation over matching rows (contaminated docs only, a tiny
    fraction of the corpus). Uncontaminated documents produce no output row.
    """
    b = bench_grams.select(F.col("id").alias("bench_id"), "ngram")
    hits = corpus_grams.join(F.broadcast(b), "ngram")
    return hits.groupBy("id").agg(
        F.countDistinct("ngram").alias("n_shared_ngrams"),
        F.countDistinct("bench_id").alias("n_bench_docs"),
    )
