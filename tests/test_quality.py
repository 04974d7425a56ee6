"""Unit tests for operators/quality.py: Gopher repetition signals and n-gram
contamination — edge cases the registry queries can't hit (the testdata has no
one-word or empty docs) plus the broadcast plan-shape guarantee."""

from __future__ import annotations

from pyspark.sql import functions as F

from airflow_courier_payout_ledger_pipeline_spark.operators.dedup import word_ngrams
from airflow_courier_payout_ledger_pipeline_spark.operators.quality import (
    ngram_contamination,
    repetition_stats,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_repetition_fractions_exact(spark):
    docs = _docs(
        spark,
        [
            (1, "a a a a"),          # one token repeated 4x
            (2, "a b c d"),          # all distinct
            (3, "x y x y x"),        # top bigram 'x y' 2/4, 'y x' 2/4
        ],
    )
    out = {r["id"]: r for r in repetition_stats(docs, "doc_id", "text").collect()}
    assert out[1]["n_tokens"] == 4 and out[1]["n_distinct"] == 1
    assert out[1]["dup_token_frac"] == 0.75 and out[1]["top_token_frac"] == 1.0
    assert out[1]["top_bigram_frac"] == 1.0  # 'a a' is every bigram
    assert out[2]["dup_token_frac"] == 0.0 and out[2]["top_token_frac"] == 0.25
    assert out[3]["n_tokens"] == 5 and out[3]["top_token_frac"] == 0.6  # 'x' 3/5
    assert out[3]["top_bigram_frac"] == 0.5  # max count 2 over 4 bigrams


def test_repetition_one_word_and_empty_docs(spark):
    docs = _docs(spark, [(1, "solo"), (2, ""), (3, "   "), (4, "a b")])
    rows = {r["id"]: r for r in repetition_stats(docs, "doc_id", "text").collect()}
    # empty / whitespace-only docs vanish (no tokens after normalization)
    assert set(rows) == {1, 4}
    assert rows[1]["n_tokens"] == 1 and rows[1]["top_bigram_frac"] is None
    assert rows[4]["top_bigram_frac"] == 1.0


def test_contamination_flags_overlap_only(spark):
    shared = "one two three four five six seven eight"
    docs = _docs(
        spark,
        [
            (0, f"benchmark prefix {shared} suffix words"),  # benchmark doc
            (1, f"corpus copy {shared} trailing tail here"),  # contaminated
            (2, "totally unrelated text with no overlap at all ok"),
        ],
    )
    grams = word_ngrams(docs, "doc_id", "text", n=8)
    bench = grams.filter(F.col("id") == 0)
    corpus = grams.filter(F.col("id") != 0)
    out = ngram_contamination(corpus, bench).collect()
    assert [(r["id"], r["n_bench_docs"]) for r in out] == [(1, 1)]
    assert out[0]["n_shared_ngrams"] >= 1


def test_contamination_broadcasts_benchmark_side(spark):
    docs = _docs(spark, [(i, f"w{i} x y z p q r s t") for i in range(10)])
    grams = word_ngrams(docs, "doc_id", "text", n=8)
    plan = ngram_contamination(
        grams.filter(F.col("id") > 0), grams.filter(F.col("id") == 0)
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastExchange" in plan


def test_quality_rule_flags_edges(spark):
    from airflow_courier_payout_ledger_pipeline_spark.operators.quality import (
        quality_rule_flags,
    )

    good = "the quick brown fox and the lazy dog of the north " * 3  # 33 words
    docs = _docs(
        spark,
        [
            (1, good),                           # passes every rule
            (2, ""),                             # empty: 0 words, NULL mean len
            (3, "   "),                          # whitespace-only ≡ empty
            (4, "one two three"),                # too few words
            (5, "the " + "x " * 20),             # short mean length ok (>=2? 'x'=1)
            (6, ("12345 " * 12) + "the end of and it"),  # digit-heavy
        ],
    )
    out = {r["id"]: r for r in quality_rule_flags(docs, "doc_id", "text").collect()}
    assert out[1]["keep"] and out[1]["n_words"] == 33
    assert out[2]["n_words"] == 0 and out[2]["mean_word_len"] is None
    assert not out[2]["keep"] and not out[2]["words_ok"] and not out[2]["mean_len_ok"]
    assert out[3]["n_words"] == 0
    assert not out[4]["words_ok"] and out[4]["mean_len_ok"]
    # doc 5: mean length (3+20)/21 < 2 → mean_len_ok False
    assert not out[5]["mean_len_ok"] and out[5]["stopword_ok"]
    # doc 6: 60 digit chars of 90 raw → digit_ok False; stopwords present
    assert not out[6]["digit_ok"] and out[6]["stopword_ok"] and not out[6]["keep"]


def test_quality_rule_flags_zero_shuffle_plan(spark):
    from airflow_courier_payout_ledger_pipeline_spark.operators.quality import (
        quality_rule_flags,
    )

    docs = _docs(spark, [(1, "a few words here")])
    plan = (
        quality_rule_flags(docs, "doc_id", "text")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan  # pure map-side: the curation-funnel fast path


def test_vocab_counts_tf_df(spark):
    from airflow_courier_payout_ledger_pipeline_spark.operators.quality import (
        vocab_counts,
    )

    docs = _docs(
        spark,
        [(1, "a b a"), (2, "a c"), (3, "  A  b  "), (4, "")],  # norm folds case/space
    )
    out = {r["token"]: r for r in vocab_counts(docs, "doc_id", "text", 2).collect()}
    assert out["a"]["tf"] == 4 and out["a"]["df"] == 3
    assert out["b"]["tf"] == 2 and out["b"]["df"] == 2
    assert "c" not in out  # below min_count


def test_redact_pii_and_counts(spark):
    from airflow_courier_payout_ledger_pipeline_spark.functions.text import (
        pii_counts,
        redact_pii,
    )

    docs = _docs(
        spark,
        [
            (1, "mail me at jane.doe+x@corp.example.com or call +1 (555) 123-4567"),
            (2, "ssn 123-45-6789 hidden in text"),
            (3, "clean document, nothing to scrub"),
        ],
    )
    t = F.col("text")
    out = {
        r["doc_id"]: r
        for r in docs.select(
            "doc_id",
            redact_pii(t).alias("redacted"),
            *[c.alias(k) for k, c in pii_counts(t).items()],
        ).collect()
    }
    assert "[EMAIL]" in out[1]["redacted"] and "@" not in out[1]["redacted"]
    assert "[PHONE]" in out[1]["redacted"]
    assert out[1]["email"] == 1 and out[1]["phone"] == 1
    assert out[2]["redacted"] == "ssn [SSN] hidden in text" and out[2]["ssn"] == 1
    assert out[3]["redacted"] == "clean document, nothing to scrub"
    # selective redaction keeps other kinds intact
    sel = docs.filter(F.col("doc_id") == 1).select(
        redact_pii(t, kinds=["email"]).alias("r")
    ).first()["r"]
    assert "[EMAIL]" in sel and "[PHONE]" not in sel
