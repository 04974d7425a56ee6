"""Distributed BPE tokenizer training: the byte-pair-merge loop that produces
the merge table every LLM tokenizer ships, run as Spark aggregations.

Shape (Sennrich et al. 2016, the standard subword-NMT algorithm):
1. ONE corpus-sized pass aggregates documents into a (word, count) frequency
   table — the corpus text is never read again;
2. each merge iteration counts adjacent symbol pairs over the DISTINCT-WORD
   table (orders of magnitude smaller than the corpus), picks the most
   frequent pair (ties → lexicographically smallest, so training is
   deterministic), and merges it in every word;
3. the chosen (pair, count) per iteration IS the tokenizer artifact.

Symbol sequences are space-joined strings (``"h e l l o"``); a merge is a
literal replace over a BOUNDARY-PADDED form of the sequence. A naive
``replace(seq, 'l l', 'll')`` can match ACROSS symbol boundaries — after
merging ('a','l'), the word 'ball' is ``'b al l'`` whose raw text contains
``'l l'`` straddling the 'al' symbol, a merge BPE never performs (subword-NMT
anchors its replace with boundary lookarounds for exactly this reason; RE2 —
DuckDB's engine — has no lookarounds, hence the padding trick instead).
Padding doubles the inter-symbol spaces and wraps the ends
(``' b  al  l '``): the pattern ``' l  l '`` then only matches WHOLE adjacent
symbols, each match consumes one space from each neighboring gap so the
representation stays intact for the next non-overlapping match
(``x y x y`` merges both occurrences, ``l l l`` merges leftmost-first — BPE's
greedy convention), and un-padding is trim + collapse doubles. All literal
replaces, identical in any engine. Driver state per iteration: ONE (pair, count) row —
the same O(1) class as a watermark cursor. The word table localCheckpoints
each round to stop plan growth (the connected_components discipline).

A fixed iteration count keeps the loop SQL-unrollable: the registered query's
DuckDB oracle replays two full iterations (count → argmax → replace → recount)
in one statement and hash-checks the chosen merges — the iterative-training
pattern proven driver-checkable, like graph.pagerank.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: lowercase word extraction: runs of ASCII letters (the reference corpora are
#: synthetic English-ish text; swap the pattern for real multilingual corpora)
WORD_RE = "[a-z]+"


def word_frequencies(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, n) frequency table — the single corpus-sized pass of BPE
    training. One explode + one groupBy shuffle on near-unique word keys."""
    return (
        docs.select(
            F.explode(
                F.expr(f"regexp_extract_all(lower({text_col}), '{WORD_RE}', 0)")
            ).alias("word")
        )
        .groupBy("word")
        .agg(F.count("*").alias("n"))
    )


def _spaced(word: Column) -> Column:
    """'hello' → 'h e l l o' (space-joined symbol sequence)."""
    return F.trim(F.regexp_replace(word, "(.)", "$1 "))


def _adjacent_pairs(seq_col: Column) -> Column:
    """array of adjacent symbol pairs of a spaced sequence: 'h e l' →
    ['h e', 'e l'] (zip of the symbol list with its own tail — JVM-side)."""
    syms = F.split(seq_col, " ")
    return F.when(F.size(syms) < 2, F.array().cast("array<string>")).otherwise(
        F.zip_with(
            F.slice(syms, 1, F.size(syms) - 1),
            F.slice(syms, 2, F.size(syms) - 1),
            lambda a, b: F.concat_ws(" ", a, b),
        )
    )


def _merge_pair_expr(seq: Column, pair: str) -> Column:
    """Boundary-anchored greedy merge of ``pair`` ('x y') into 'xy' within a
    space-joined symbol sequence (see module docstring): pad (double the
    inter-symbol gaps, wrap with single spaces), literal-replace the padded
    pair, un-pad. Non-overlapping left-to-right replace = BPE's convention."""
    padded_pair = " " + pair.replace(" ", "  ") + " "
    padded_merged = " " + pair.replace(" ", "") + " "
    padded = F.concat(F.lit(" "), F.replace(seq, F.lit(" "), F.lit("  ")), F.lit(" "))
    rep = F.replace(padded, F.lit(padded_pair), F.lit(padded_merged))
    return F.trim(F.replace(rep, F.lit("  "), F.lit(" ")))


def bpe_train_merges(
    docs: DataFrame, iters: int = 2, text_col: str = "text"
) -> DataFrame:
    """Run ``iters`` BPE merge iterations; returns one row per iteration:
    (iter, pair, pair_count) — the ordered merge rules. Deterministic: the
    argmax pair breaks count ties lexicographically."""
    spark = docs.sparkSession
    words = (
        word_frequencies(docs, text_col)
        .select(_spaced(F.col("word")).alias("seq"), "n")
        .localCheckpoint(eager=False)
    )
    merges: list[tuple[int, str, int]] = []
    for it in range(1, iters + 1):
        top = (
            words.select(F.explode(_adjacent_pairs(F.col("seq"))).alias("pair"), "n")
            .groupBy("pair")
            .agg(F.sum("n").alias("c"))
            .orderBy(F.desc("c"), F.asc("pair"))
            .limit(1)
            .collect()
        )
        if not top:  # corpus exhausted (all words single-symbol) or empty
            break
        pair, count = top[0]["pair"], int(top[0]["c"])
        merges.append((it, pair, count))
        words = words.select(
            _merge_pair_expr(F.col("seq"), pair).alias("seq"), "n"
        ).localCheckpoint(eager=False)
    return spark.createDataFrame(merges, "iter int, pair string, pair_count bigint")


def bpe_encode_counts(
    docs: DataFrame,
    merges: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document token count under a TRAINED merge list — the apply half of
    the tokenizer (train = ``bpe_train_merges``): (id, n_words, bpe_tokens).
    ``bpe_tokens`` is what every batch-size / packing / mix-budget decision
    consumes, and applying the learned merges (not whitespace) is what makes
    the number honest.

    Encoding is pure map-side JVM expression work: each word's spaced symbol
    sequence gets the merge rules applied IN TRAINING ORDER via chained
    literal ``replace`` (non-overlapping left-to-right = BPE's greedy
    convention, identical in DuckDB — the same portability argument as
    training), then the token count is the surviving symbol count. One
    explode + ONE doc-grain shuffle; the merge table rides the closure as
    literals (tokenizers are KBs — broadcast-by-construction)."""
    seq = _spaced(F.col("word"))
    for pair in merges:
        seq = _merge_pair_expr(seq, pair)
    words = docs.select(
        F.col(id_col),
        F.explode(
            F.expr(f"regexp_extract_all(lower({text_col}), '{WORD_RE}', 0)")
        ).alias("word"),
    )
    counts = (
        words.select(F.col(id_col), F.size(F.split(seq, " ")).alias("__ntok"))
        .groupBy(id_col)
        .agg(
            F.count("*").cast("bigint").alias("n_words"),
            F.sum("__ntok").cast("bigint").alias("bpe_tokens"),
        )
    )
    # a doc with NO [a-z]+ words (digits/punctuation/empty/NULL text) must
    # still report (id, 0, 0) — the docs most in need of flagging by a
    # packing/mix-budget consumer are exactly the ones the bare groupBy
    # would silently drop
    return (
        docs.select(id_col)
        .join(counts, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_words", F.lit(0)).cast("bigint").alias("n_words"),
            F.coalesce("bpe_tokens", F.lit(0)).cast("bigint").alias("bpe_tokens"),
        )
    )


def chunk_documents(
    docs: DataFrame,
    window: int,
    stride: int,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Sliding-window document chunking — the step that turns a corpus into
    fixed-length training sequences (every pretraining pipeline runs this
    between cleaning and packing). Each document's whitespace tokens (over
    the repo's canonical normalized form, cf. ``functions/text.normalize_text``)
    are cut into windows of ``window`` tokens advancing by ``stride``
    (overlap = window - stride preserves context across boundaries); the
    tail chunk keeps its natural shorter length rather than re-padding —
    chunk boundaries are then a pure function of the text, so downstream
    exact/near dedup over chunks stays deterministic.

    Chunk count per doc is ``1 + ceil(max(n - window, 0) / stride)``,
    computed as pure BIGINT arithmetic (``(n - window + stride - 1) div
    stride`` — replays as DuckDB ``//``; no float ceil hazard). Output grain:
    (id, chunk_id 0-based, start_tok 1-based, n_tokens, chunk_text).

    Scale shape: ZERO shuffles — split, sequence-explode, slice and re-join
    are all map-side JVM expressions inside one whole-stage codegen span;
    the fan-out is bounded at ~n/stride rows per doc and the token array is
    never exchanged. Docs with NULL text or no tokens after normalization
    (empty / whitespace-only — ``split('')`` would otherwise yield a phantom
    ``['']`` "token") are excluded: no tokens, no chunks — the same
    zero-for-wordless convention as ``bpe_encode_counts``.
    No reference twin: the reference pipeline has no text surface; this is
    part of the 100 TB training-data extension."""
    if not (0 < stride <= window):
        raise ValueError(f"need 0 < stride <= window, got {stride=} {window=}")
    from airflow_courier_payout_ledger_pipeline_spark.functions.text import (
        normalize_text,
    )

    ws = F.split(normalize_text(F.col(text_col)), " ")
    n = F.size("__ws")
    last_j = F.when(n <= window, F.lit(0)).otherwise(
        F.expr(f"(size(__ws) - {window} + {stride - 1}) div {stride}")
    )
    start = (F.col("__j") * stride + 1).cast("bigint")
    toks = F.slice(F.col("__ws"), F.col("__j") * stride + 1, window)
    return (
        docs.filter(
            F.col(text_col).isNotNull()
            & (normalize_text(F.col(text_col)) != F.lit(""))
        )
        .select(F.col(id_col), ws.alias("__ws"))
        .select(
            id_col,
            "__ws",
            F.explode(F.sequence(F.lit(0), last_j.cast("int"))).alias("__j"),
        )
        .select(
            id_col,
            F.col("__j").cast("bigint").alias("chunk_id"),
            start.alias("start_tok"),
            F.size(toks).cast("bigint").alias("n_tokens"),
            F.array_join(toks, " ").alias("chunk_text"),
        )
    )
