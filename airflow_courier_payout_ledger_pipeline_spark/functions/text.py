"""Text-analysis functions for large-scale training-data pipelines: token counting,
quality scoring, language ID, fingerprinting.

All pure built-in Catalyst expressions (whole-stage codegen; no Python UDFs), each
with an exact DuckDB-SQL equivalent so the oracle harness can verify values — the
engine-portable tricks are replace-based substring counting and md5-based hashing.
At 100 TB these are embarrassingly parallel map-side projections: no shuffle at all.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Distinctive high-frequency markers per language (surrounded-by-space matching).
#: Deliberately tiny — a real deployment swaps in proper n-gram tables; the operator
#: shape (score per language → argmax) is what matters.
LANG_MARKERS: dict[str, list[str]] = {
    "en": [" the ", " and ", " of "],
    "es": [" el ", " la ", " de "],
    "de": [" der ", " und ", " die "],
    "fr": [" le ", " et ", " les "],
}

BPE_ISH_TOKEN_RE = "[a-z]+|[A-Z][a-z]*|[0-9]+|[^A-Za-z0-9 ]"


def whitespace_token_count(text: Column) -> Column:
    """Tokens by single-space split (keeps empties — same as DuckDB string_split)."""
    return F.size(F.split(text, " "))


def regex_token_count(text: Column) -> Column:
    """BPE-ish subword proxy: letter runs / digit runs / single punctuation."""
    return F.regexp_count(text, F.lit(BPE_ISH_TOKEN_RE))


def substring_count(text: Column, needle: str) -> Column:
    """Occurrences of ``needle`` via replace-length arithmetic — exact and portable
    (no regex dialect differences)."""
    return (F.length(text) - F.length(F.replace(text, F.lit(needle), F.lit("")))) / len(
        needle
    )


def punct_count(text: Column) -> Column:
    return F.regexp_count(text, F.lit("[.,!?;:]"))


def digit_count(text: Column) -> Column:
    return F.regexp_count(text, F.lit("[0-9]"))


def quality_score(text: Column) -> Column:
    """Heuristic document quality in [0,1]: penalize extreme length, high punctuation
    and digit density; reward stopword presence (natural-language signal). Weights
    are illustrative; the operator shape is the deliverable.

    score = 0.4·len_ok + 0.3·min(5·stop/words, 1)
          + 0.2·(1 − min(10·punct/chars, 1)) + 0.1·(1 − min(10·digits/chars, 1))

    Computed as ONE division of two exact int64 products (common denominator
    10·words·chars) so the pre-round double is bit-identical in any engine —
    floating-point accumulation order would otherwise flip round() at midpoints
    (a real mismatch we hit against the DuckDB oracle)."""
    n0 = F.length(text)
    n = F.greatest(n0, F.lit(1)).cast("long")
    w = F.greatest(whitespace_token_count(text), F.lit(1)).cast("long")
    s = sum(
        (substring_count(text, m) for m in LANG_MARKERS["en"]), F.lit(0.0)
    ).cast("long")
    p = punct_count(text).cast("long")
    d = digit_count(text).cast("long")
    len_factor = F.when((n0 >= 100) & (n0 <= 20000), F.lit(4)).otherwise(F.lit(2)).cast("long")
    num = (
        len_factor * w * n
        + 3 * n * F.least(5 * s, w)
        + 2 * w * (n - F.least(10 * p, n))
        + w * (n - F.least(10 * d, n))
    )
    return F.round(num.cast("double") / (10 * w * n).cast("double"), 4)


def lang_scores(text: Column) -> dict[str, Column]:
    """Marker-occurrence score per language over the lowercased, space-padded text."""
    padded = F.concat(F.lit(" "), F.lower(text), F.lit(" "))
    return {
        lang: sum((substring_count(padded, m) for m in markers), F.lit(0.0))
        for lang, markers in LANG_MARKERS.items()
    }


def predict_lang(text: Column) -> Column:
    """Argmax over language scores; 'und' (undetermined) when all scores are 0.
    Ties break by language code order — deterministic and oracle-reproducible."""
    scores = lang_scores(text)
    best = F.greatest(*scores.values())
    expr: Column | None = None
    for lang in sorted(scores):  # alphabetical tiebreak
        cond = scores[lang] == best
        expr = F.when(cond, F.lit(lang)) if expr is None else expr.when(cond, F.lit(lang))
    assert expr is not None
    return F.when(best > 0, expr).otherwise(F.lit("und"))


#: PII patterns for corpus scrubbing, ordered — earlier kinds are redacted first,
#: so phone/ssn never match inside an already-redacted email. Conservative,
#: precision-leaning regexes (a production deployment swaps in its compliance
#: set; the operator shape — ordered regexp_replace chain, map-side, no UDF —
#: is the deliverable).
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ssn": r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b",
    "phone": r"\+?[0-9][0-9()\-\s.]{7,}[0-9]",
}


def pii_counts(text: Column) -> dict[str, Column]:
    """Per-kind PII match counts (audit metric before/after scrubbing)."""
    return {kind: F.regexp_count(text, F.lit(p)) for kind, p in PII_PATTERNS.items()}


def redact_pii(text: Column, kinds: list[str] | None = None) -> Column:
    """Replace each PII match with its ``[KIND]`` token — a chained
    ``regexp_replace`` (global, map-side, whole-stage codegen; zero shuffles at
    any corpus size). Order follows PII_PATTERNS so overlapping patterns can't
    double-redact."""
    out = text
    for kind, pattern in PII_PATTERNS.items():
        if kinds is None or kind in kinds:
            out = F.regexp_replace(out, pattern, f"[{kind.upper()}]")
    return out


def normalize_text(text: Column) -> Column:
    """Canonical form for exact dedup/fingerprinting: lowercase, collapse runs of
    whitespace, trim."""
    return F.trim(F.regexp_replace(F.lower(text), "\\s+", " "))


def fingerprint(text: Column) -> Column:
    """Deterministic 128-bit content fingerprint of the normalized text."""
    return F.md5(normalize_text(text))
