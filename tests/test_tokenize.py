"""BPE merge training: hand-computed merges, tie-breaks, greedy overlap."""

from __future__ import annotations

from airflow_courier_payout_ledger_pipeline_spark.operators.tokenize import (
    bpe_train_merges,
    word_frequencies,
)


def test_word_frequencies_lowercase_letters_only(spark):
    docs = spark.createDataFrame(
        [(1, "Hello, hello WORLD!"), (2, "world 123 world")], "doc_id long, text string"
    )
    got = {r.word: r.n for r in word_frequencies(docs).collect()}
    assert got == {"hello": 2, "world": 3}


def test_bpe_merges_hand_computed(spark):
    # corpus: 'abab' x3, 'ab' x2 → pairs over DISTINCT words weighted by count:
    # 'a b': abab contributes 2 per occurrence? NO — pairs count per word type
    # weighted by word frequency: abab(3): a b, b a, a b → 'a b'x2*3=6, 'b a'x3
    # ab(2): 'a b'x2 → total 'a b'=8, 'b a'=3 → merge1 = 'a b' (8)
    # after merge: 'ab ab'(3), 'ab'(2) → pairs: 'ab ab'x3 → merge2 = 'ab ab' (3)
    docs = spark.createDataFrame(
        [(1, "abab abab abab ab ab")], "doc_id long, text string"
    )
    got = [(r.iter, r.pair, r.pair_count) for r in bpe_train_merges(docs, iters=2).collect()]
    assert got == [(1, "a b", 8), (2, "ab ab", 3)]


def test_bpe_tie_breaks_lexicographically(spark):
    # 'xy' and 'xz' both appear twice → pairs 'x y'=2, 'x z'=2 → pick 'x y'
    docs = spark.createDataFrame([(1, "xy xy xz xz")], "doc_id long, text string")
    got = [(r.iter, r.pair) for r in bpe_train_merges(docs, iters=1).collect()]
    assert got == [(1, "x y")]


def test_bpe_greedy_overlap_matches_replace_semantics(spark):
    # 'aaa': pairs 'a a'x2 per word; merge 'a a' → replace left-to-right
    # gives 'aa a' (NOT 'a aa'), the greedy BPE convention
    docs = spark.createDataFrame([(1, "aaa aaa")], "doc_id long, text string")
    out = bpe_train_merges(docs, iters=2).collect()
    assert (out[0].iter, out[0].pair, out[0].pair_count) == (1, "a a", 4)
    # second iteration sees 'aa a' → top pair is 'aa a'
    assert (out[1].iter, out[1].pair, out[1].pair_count) == (2, "aa a", 2)


def test_bpe_exhausted_corpus_stops_early(spark):
    docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    # all words single-symbol: no pairs at all → zero merge rows, no crash
    assert bpe_train_merges(docs, iters=3).count() == 0


def test_bpe_encode_counts_hand_computed(spark):
    """Apply trained merges to text: 'hello' spaced is 'h e l l o'; merge
    'l l' → 'h e ll o' (4 symbols), then 'h e' → 'he ll o' (3 symbols)."""
    from airflow_courier_payout_ledger_pipeline_spark.operators.tokenize import (
        bpe_encode_counts,
    )

    docs = spark.createDataFrame(
        [(1, "hello hell"), (2, "ho")], "doc_id long, text string"
    )
    got = {
        r.doc_id: (r.n_words, r.bpe_tokens)
        for r in bpe_encode_counts(docs, ["l l", "h e"]).collect()
    }
    # doc 1: 'hello' → 'he ll o' = 3 toks; 'hell' → 'he ll' = 2 toks
    # doc 2: 'ho' → 'h o' = 2 toks (no merge applies)
    assert got == {1: (2, 5), 2: (1, 2)}


def test_bpe_encode_applies_merges_in_training_order(spark):
    """Order matters: merging 'a a' before 'aa a' reproduces training's greedy
    cascade; the reverse order would leave 'aa a' unmatched."""
    from airflow_courier_payout_ledger_pipeline_spark.operators.tokenize import (
        bpe_encode_counts,
    )

    docs = spark.createDataFrame([(1, "aaa")], "doc_id long, text string")
    fwd = bpe_encode_counts(docs, ["a a", "aa a"]).collect()[0]
    assert (fwd.n_words, fwd.bpe_tokens) == (1, 1)  # 'a a a'→'aa a'→'aaa'
    rev = bpe_encode_counts(docs, ["aa a", "a a"]).collect()[0]
    assert (rev.n_words, rev.bpe_tokens) == (1, 2)  # 'aa a' never matches first


def test_bpe_merge_never_crosses_symbol_boundaries(spark):
    """The reviewer-confirmed defect class: after merging ('a','l'), the word
    'ball' is symbols b|al|l whose RAW text contains 'l l' straddling the 'al'
    symbol — an unanchored replace would merge it ('b all', 2 tokens), which
    BPE never does (adjacent pairs are only (b,al) and (al,l)). The anchored
    encode must report b|al|l = 3 tokens."""
    from airflow_courier_payout_ledger_pipeline_spark.operators.tokenize import (
        bpe_encode_counts,
    )

    docs = spark.createDataFrame([(1, "ball")], "doc_id long, text string")
    [row] = bpe_encode_counts(docs, ["a l", "l l"]).collect()
    assert (row.n_words, row.bpe_tokens) == (1, 3)
    # and the pair DOES merge where it is a true adjacent-symbol pair
    docs2 = spark.createDataFrame([(1, "llama ball")], "doc_id long, text string")
    [r2] = bpe_encode_counts(docs2, ["l l"]).collect()
    # 'llama' -> ll|a|m|a (4), 'ball' -> b|a|l|l ('l l' IS adjacent here) -> 3
    assert (r2.n_words, r2.bpe_tokens) == (2, 7)


def test_bpe_encode_reports_zero_for_wordless_docs(spark):
    """Docs with no [a-z]+ words (digits, punctuation, empty, NULL) must
    report (0, 0), not vanish from the output."""
    from airflow_courier_payout_ledger_pipeline_spark.operators.tokenize import (
        bpe_encode_counts,
    )

    docs = spark.createDataFrame(
        [(1, "hello world"), (2, "123 456 !!!"), (3, ""), (4, None)],
        "doc_id long, text string",
    )
    got = {r.doc_id: (r.n_words, r.bpe_tokens) for r in bpe_encode_counts(docs, []).collect()}
    assert got[2] == (0, 0) and got[3] == (0, 0) and got[4] == (0, 0)
    assert got[1] == (2, 10)  # no merges: 5 + 5 symbols


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_chunk_documents_hand_computed_windows_and_tail(spark):
    """11 tokens, window 4, stride 3 → starts 1,4,7,10; the tail chunk keeps
    its natural 2-token length and every token is covered."""
    from airflow_courier_payout_ledger_pipeline_spark.operators.tokenize import (
        chunk_documents,
    )

    toks = [f"t{i}" for i in range(11)]
    out = sorted(
        chunk_documents(_docs(spark, [" ".join(toks)]), 4, 3).collect(),
        key=lambda r: r.chunk_id,
    )
    assert [(r.chunk_id, r.start_tok, r.n_tokens) for r in out] == [
        (0, 1, 4),
        (1, 4, 4),
        (2, 7, 4),
        (3, 10, 2),
    ]
    assert out[1].chunk_text == "t3 t4 t5 t6"
    assert out[3].chunk_text == "t9 t10"


def test_chunk_documents_short_doc_is_one_whole_chunk(spark):
    from airflow_courier_payout_ledger_pipeline_spark.operators.tokenize import (
        chunk_documents,
    )

    out = chunk_documents(_docs(spark, ["only three tokens"]), 32, 24).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.chunk_id, r.start_tok, r.n_tokens, r.chunk_text) == (
        0,
        1,
        3,
        "only three tokens",
    )


def test_chunk_documents_exact_multiple_has_no_empty_tail(spark):
    """n - window divisible by stride → the last start is n - window + 1 and
    every chunk is full; no phantom empty chunk after it."""
    from airflow_courier_payout_ledger_pipeline_spark.operators.tokenize import (
        chunk_documents,
    )

    toks = [f"w{i}" for i in range(10)]  # n=10, window=4, stride=2 → 4 starts
    out = chunk_documents(_docs(spark, [" ".join(toks)]), 4, 2).collect()
    assert sorted((r.start_tok, r.n_tokens) for r in out) == [
        (1, 4),
        (3, 4),
        (5, 4),
        (7, 4),
    ]


def test_chunk_documents_overlap_reconstructs_and_normalizes(spark):
    """Stride == window (no overlap) concatenates back to the NORMALIZED
    text; NULL-text, empty, and whitespace-only docs produce ZERO chunks
    (the bpe_encode_counts zero-for-wordless convention — split('') would
    otherwise fabricate a phantom 1-token '' chunk)."""
    from airflow_courier_payout_ledger_pipeline_spark.operators.tokenize import (
        chunk_documents,
    )

    df = _docs(spark, ["A  B\tC   d E f G", None, "", "  \t "])
    out = sorted(chunk_documents(df, 3, 3).collect(), key=lambda r: r.chunk_id)
    assert {r.doc_id for r in out} == {0}
    assert " ".join(r.chunk_text for r in out) == "a b c d e f g"


def test_chunk_documents_rejects_bad_stride(spark):
    import pytest

    from airflow_courier_payout_ledger_pipeline_spark.operators.tokenize import (
        chunk_documents,
    )

    with pytest.raises(ValueError):
        chunk_documents(_docs(spark, ["x"]), 4, 5)
    with pytest.raises(ValueError):
        chunk_documents(_docs(spark, ["x"]), 4, 0)
