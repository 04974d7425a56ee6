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


# ---------------------------------------------------------------------------
# BM25 ranked retrieval
# ---------------------------------------------------------------------------

import pytest

from airflow_courier_payout_ledger_pipeline_spark.operators.search import bm25_topk


def _corpus(spark):
    return spark.createDataFrame(
        [
            (1, "spark stream stream stream"),
            (2, "spark batch"),
            (3, "stream"),
            (4, "batch batch batch batch"),
        ],
        "doc_id long, text string",
    )


def test_bm25_matches_hand_computed_reference(spark):
    """Pin the exact formula (raw-odds idf × k1/b tf saturation, fixed-order
    fold) against a pure-Python replica on a corpus small enough to audit."""
    docs = _corpus(spark)
    got = {r["doc_id"]: (r["bm25"], r["n_terms_hit"], r["rank"]) for r in bm25_topk(docs, ["stream", "batch"], k=4).collect()}

    toks = {1: ["spark", "stream", "stream", "stream"], 2: ["spark", "batch"], 3: ["stream"], 4: ["batch"] * 4}
    n_docs, sum_dl = 4, sum(len(v) for v in toks.values())
    avgdl = sum_dl / n_docs
    df = {"stream": 2, "batch": 2}
    k1, b = 1.2, 0.75

    def score(doc, term):
        tf = toks[doc].count(term)
        if tf == 0:
            return 0.0
        idf = (n_docs - df[term] + 0.5) / (df[term] + 0.5)
        return idf * ((tf * (k1 + 1.0)) / (tf + k1 * (1.0 - b + (b * len(toks[doc])) / avgdl)))

    want = {d: score(d, "stream") + score(d, "batch") for d in toks}
    ranked = sorted(want, key=lambda d: (-want[d], d))
    for d in toks:
        bm, hits, rank = got[d]
        assert bm == want[d], (d, bm, want[d])
        assert hits == sum(1 for t in ("stream", "batch") if t in toks[d])
        assert rank == ranked.index(d) + 1


def test_bm25_topk_uses_take_ordered_not_global_sort(spark):
    """The corpus-wide top-k must plan as TakeOrderedAndProject (per-partition
    heaps + driver merge of k·partitions rows), never a full global Sort or a
    single-partition Window over the corpus."""
    plan = bm25_topk(_corpus(spark), ["stream"], k=2)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_bm25_rejects_empty_or_duplicate_query(spark):
    with pytest.raises(ValueError):
        bm25_topk(_corpus(spark), [])
    with pytest.raises(ValueError):
        bm25_topk(_corpus(spark), ["a", "a"])


def test_bm25_is_partitioning_invariant(spark):
    """Bit-identical scores under any input partitioning: per-doc tf/dl are
    exact-integer aggregates and the per-term fold is fixed-order, so no float
    ever folds in partition order — the same discipline that makes the oracle
    hash reproducible (and pagerank repartition-stable)."""
    docs = _corpus(spark)
    base = sorted(map(tuple, bm25_topk(docs, ["stream", "batch"], k=4).collect()))
    for n in (1, 7):
        got = sorted(map(tuple, bm25_topk(docs.repartition(n), ["stream", "batch"], k=4).collect()))
        assert got == base, n


def test_bm25_query_terms_lowercased_and_validated(spark):
    """Tokens are lowercased with punctuation attached; query terms must be
    lowercased to match (an uppercase term could never hit), and terms with
    whitespace or duplicates-after-lowercasing raise."""
    import pytest as _pytest

    from airflow_courier_payout_ledger_pipeline_spark.operators.search import (
        bm25_topk,
    )

    docs = spark.createDataFrame(
        [(1, "Stream processing"), (2, "batch only")], "doc_id long, text string"
    )
    hits = bm25_topk(docs, ["Stream"], k=5).collect()
    assert [r.doc_id for r in hits] == [1]
    with _pytest.raises(ValueError, match="distinct"):
        bm25_topk(docs, ["Stream", "stream"])
    with _pytest.raises(ValueError, match="whitespace-free"):
        bm25_topk(docs, ["two words"])
