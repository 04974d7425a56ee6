"""Corpus substring search through a trigram inverted index — the grep-a-
100-TB-corpus operator (find contaminated phrases, PII strings, attribution
lines) without a full-text scan per query.

Layout (the standard pg_trgm / code-search design):
1. the INDEX is (trigram, doc_id) distinct pairs, built in one explode pass
   and — at deployment — persisted and maintained incrementally (new docs
   append their trigrams; the index is ~10× the token count but each posting
   list is tiny relative to the corpus);
2. a PROBE intersects the posting lists of the needle's distinct trigrams
   (groupBy doc count == n_trigrams — docs containing every needle trigram);
3. only the candidates are read for exact ``contains`` verification — the
   false-positive rate of trigram intersection is what makes candidate reads
   negligible next to a full scan.

The registered query builds the index inline (the testdata corpus is small);
the operator takes a prebuilt index DataFrame for the persisted-index path —
same plan from the probe onward.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def trigram_index(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(trigram, id) distinct pairs — one explode + one distinct shuffle.
    Trigrams are raw character windows (no normalization: search is exact)."""
    return (
        docs.select(
            F.col(id_col),
            F.explode(
                F.expr(
                    f"transform(sequence(1, greatest(length({text_col}) - 2, 1)), "
                    f"i -> substring({text_col}, i, 3))"
                )
            ).alias("tg"),
        )
        .filter(F.length("tg") == 3)
        .distinct()
    )


def substring_search(
    docs: DataFrame,
    needle: str,
    index: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """All docs containing ``needle`` (exact, case-sensitive), returned as
    (id, first_pos) with 1-based first occurrence. Needles shorter than 3
    chars cannot use the trigram prefilter and fall back to a full scan —
    stated contract, same results."""
    if len(needle) < 3:
        return docs.filter(F.instr(F.col(text_col), needle) > 0).select(
            F.col(id_col), F.instr(F.col(text_col), needle).alias("first_pos")
        )
    grams = sorted({needle[i : i + 3] for i in range(len(needle) - 2)})
    idx = index if index is not None else trigram_index(docs, id_col, text_col)
    candidates = (
        idx.filter(F.col("tg").isin(grams))
        .groupBy(id_col)
        # DISTINCT, not count(*): a streaming-maintained index is appended
        # at-least-once (stream_index_sink), so replayed postings may repeat —
        # the probe must not over-count a doc into a false candidate
        .agg(F.countDistinct("tg").alias("__k"))
        .filter(F.col("__k") == len(grams))
        .select(id_col)
    )
    return (
        docs.join(candidates, id_col, "leftsemi")
        .filter(F.instr(F.col(text_col), needle) > 0)
        .select(F.col(id_col), F.instr(F.col(text_col), needle).alias("first_pos"))
    )
