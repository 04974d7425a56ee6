"""Trigram-index substring search: exact-equivalence to a full scan, prebuilt
index reuse, short-needle fallback."""

from __future__ import annotations

from pyspark.sql import functions as F

from airflow_courier_payout_ledger_pipeline_spark.operators.search import (
    substring_search,
    trigram_index,
)


def _docs(spark):
    return spark.createDataFrame(
        [
            (1, "the quick brown fox"),
            (2, "quick silver"),
            (3, "slow brown dog"),
            (4, "qu"),  # shorter than a trigram
            (5, "the quick quick one"),
        ],
        "doc_id long, text string",
    )


def test_indexed_search_equals_full_scan(spark):
    docs = _docs(spark)
    got = {(r.doc_id, r.first_pos) for r in substring_search(docs, "quick").collect()}
    want = {
        (r.doc_id, r.first_pos)
        for r in docs.filter(F.instr("text", "quick") > 0)
        .select("doc_id", F.instr("text", "quick").alias("first_pos"))
        .collect()
    }
    assert got == want == {(1, 5), (2, 1), (5, 5)}


def test_trigram_candidates_do_not_false_negative(spark):
    # needle spanning a space: trigrams include 'k s' etc. — doc 2 has
    # 'quick silver'; every trigram of 'ck si' must hit
    docs = _docs(spark)
    got = {r.doc_id for r in substring_search(docs, "ck si").collect()}
    assert got == {2}


def test_prebuilt_index_path_same_results(spark):
    docs = _docs(spark)
    idx = trigram_index(docs).localCheckpoint()  # the persisted-index stand-in
    got = {r.doc_id for r in substring_search(docs, "brown", index=idx).collect()}
    assert got == {1, 3}


def test_short_needle_falls_back_to_scan(spark):
    docs = _docs(spark)
    got = {(r.doc_id, r.first_pos) for r in substring_search(docs, "qu").collect()}
    assert got == {(1, 5), (2, 1), (4, 1), (5, 5)}


def test_no_match_returns_empty(spark):
    assert substring_search(_docs(spark), "zebra").count() == 0
