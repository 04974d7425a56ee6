"""Deduplication operators for training-data pipelines: exact, MinHash+LSH,
SimHash, n-gram Jaccard, and embedding-cosine near-dup.

Everything is expressed as shuffle-conscious DataFrame algebra (no Python UDFs):

- **exact**: hash-groupBy on a normalized-content fingerprint — one shuffle on the
  hash, trivially skew-safe (md5 keys are uniform).
- **MinHash+LSH**: shingle explode → per-doc min-hash signature (map-side partial
  min aggs) → band hashing → self-join on (band, band_hash). The band join is the
  classic sub-quadratic near-dup path at 100 TB: candidate pairs only, never the
  full cross product.
- **n-gram Jaccard**: inverted-index join on shingles (pairs share ≥1 shingle) —
  exact Jaccard for candidate verification; at scale you run it only on LSH
  candidates.
- **SimHash**: per-token 32-bit hashes, ±1 bit votes summed per doc (two shuffles:
  token agg, doc agg); near-pairs by pigeonholed half-fingerprint join + Hamming
  filter via xor/bit_count.
- **embedding near-dup**: see operators/similarity.py (cosine ≥ τ pairs).

Hashing is md5-based so every operator has an exact DuckDB oracle twin (same hex
strings, same lexicographic mins) — engine-portable determinism beats xxhash64
speed for verifiability; swap the hash in one place if needed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from airflow_courier_payout_ledger_pipeline_spark.functions.text import (
    fingerprint,
    normalize_text,
)

# --- exact dedup ---------------------------------------------------------------------


def exact_dedup_groups(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Group rows by normalized-content fingerprint; keep the smallest id as the
    canonical representative. Returns (fingerprint, keep_id, dup_count)."""
    return (
        df.select(F.col(id_col).alias("id"), fingerprint(F.col(text_col)).alias("fp"))
        .groupBy("fp")
        .agg(F.min("id").alias("keep_id"), F.count("*").alias("dup_count"))
    )


def exact_dedup(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Keep one row per distinct normalized content (the min-id representative)."""
    keep = exact_dedup_groups(df, id_col, text_col).select(
        F.col("keep_id").alias(id_col)
    )
    return df.join(keep, id_col, "left_semi")


def incremental_exact_dedup(
    incoming: DataFrame,
    corpus_fingerprints: DataFrame,
    id_col: str,
    text_col: str,
) -> DataFrame:
    """Dedup an increment against an already-deduped corpus — the shape a 100 TB
    pipeline actually runs nightly: you never re-dedup history, you probe the
    increment against a persisted **fingerprint index** (one md5 per corpus doc,
    ~3 orders of magnitude smaller than the corpus) and within itself.

    Per incoming document:
    - ``dup_of_corpus``     — its content already exists in the corpus index;
    - ``dup_within_increment`` — a smaller-id duplicate exists in the same
      increment (the first occurrence keeps ``False`` and is the survivor);
    - ``keep``              — neither.

    Scale shape: the daily increment is the small side, so BOTH probes avoid
    shuffling the big data — the corpus index probe is an equi-join on uniform
    md5 keys (AQE broadcasts the increment's fingerprint set when it fits), and
    the within-increment check is one groupBy over increment fingerprints. The
    corpus itself (the 100 TB of text) is never read. The same index-probe shape
    extends to near-dup: persist MinHash band buckets alongside and probe those
    (``lsh_candidate_pairs``); exact fingerprints keep this operator
    SQL-checkable end-to-end.

    ``corpus_fingerprints``: one column ``fp`` (md5 hex), e.g. from
    ``exact_dedup_groups(...).select("fp")``.
    """
    inc = incoming.select(
        F.col(id_col).alias("id"), fingerprint(F.col(text_col)).alias("fp")
    )
    in_corpus = corpus_fingerprints.select("fp").distinct().withColumn(
        "__hit", F.lit(True)
    )
    first_in_inc = inc.groupBy("fp").agg(F.min("id").alias("__first_id"))
    out = (
        inc.join(in_corpus, "fp", "left")
        .join(first_in_inc, "fp", "inner")
        .select(
            "id",
            "fp",
            F.coalesce(F.col("__hit"), F.lit(False)).alias("dup_of_corpus"),
            (F.col("id") != F.col("__first_id")).alias("dup_within_increment"),
        )
    )
    return out.withColumn(
        "keep", ~F.col("dup_of_corpus") & ~F.col("dup_within_increment")
    )


# --- shingling -----------------------------------------------------------------------


def _spread(df: DataFrame) -> DataFrame:
    """Round-robin repartition to the session's parallelism ahead of a high
    fan-out operator (explode); no-op cost relative to the work it unlocks."""
    return df.repartition(df.sparkSession.sparkContext.defaultParallelism)


def char_shingles(
    df: DataFrame, id_col: str, text_col: str, k: int = 9, distinct: bool = True
) -> DataFrame:
    """(id, shingle) pairs: all k-character substrings of the normalized text.
    Documents shorter than k yield one short shingle (substr clamps).

    Explode-amplification guard: a small input file is one scan partition, but the
    output is ~chars-per-doc× larger — repartition *before* exploding so the
    fan-out work parallelizes (otherwise the whole corpus shingles on one task)."""
    # Materialize the normalized text BELOW the repartition Exchange: the
    # optimizer inlines single-referenced projection aliases through Generate,
    # which re-executes the regexp-backed normalization per EXPLODED row (~300×
    # per doc). An Exchange is a physical barrier — __t is shuffled as a column,
    # so the regexp provably runs once per doc.
    pre = _spread(
        df.select(
            F.col(id_col).alias("id"), normalize_text(F.col(text_col)).alias("__t")
        )
    )
    arr = F.transform(
        F.sequence(F.lit(1), F.greatest(F.length("__t") - (k - 1), F.lit(1))),
        lambda i: F.col("__t").substr(i, F.lit(k)),
    )
    out = pre.select("id", F.explode(arr).alias("shingle"))
    return out.distinct() if distinct else out


def word_ngrams(
    df: DataFrame, id_col: str, text_col: str, n: int = 3, distinct: bool = True
) -> DataFrame:
    """(id, ngram) pairs: word n-grams of the normalized text (space-joined)."""
    # Word array materialized below the Exchange (see char_shingles — otherwise
    # the regexp-backed split re-executes per exploded gram).
    pre = _spread(
        df.select(
            F.col(id_col).alias("id"),
            F.split(normalize_text(F.col(text_col)), " ").alias("__w"),
        )
    )
    # try_element_at, not element_at: Spark 4 runs ANSI mode by default, where an
    # out-of-bounds element_at throws — a doc with < n words must instead yield
    # one partial n-gram (NULLs skipped by concat_ws, matching the DuckDB
    # oracle's NULL-skipping concat_ws over ws[i+j]).
    arr = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size("__w") - (n - 1), F.lit(1))),
        lambda i: F.concat_ws(
            " ", *[F.try_element_at(F.col("__w"), i + F.lit(j)) for j in range(n)]
        ),
    )
    out = pre.select("id", F.explode(arr).alias("ngram"))
    return out.distinct() if distinct else out


# --- MinHash + LSH -------------------------------------------------------------------


def _seeded_md5(col: Column, seed: int) -> Column:
    return F.md5(F.concat(F.lit(f"{seed}:"), col))


#: Mersenne prime modulus for the universal-hash MinHash family.
MINHASH_P = (1 << 61) - 1

#: Fixed (a, b) coefficients for h_j(x) = (a_j*x + b_j) mod P. Bounds keep the
#: arithmetic overflow-free int64 in BOTH engines (Spark runs ANSI mode, DuckDB
#: BIGINT throws on overflow): x < 2^32 and a < 2^29 give a*x < 2^61, plus
#: b < 2^60 stays under 2^62 < int64 max. Seeded generator, not literals —
#: deterministic across runs, and the oracle SQL is built from the same list.
_rng = __import__("random").Random(0x5EED)
MINHASH_AB = [
    (_rng.randrange(1, 1 << 29), _rng.randrange(0, 1 << 60)) for _ in range(64)
]
del _rng


def minhash_signatures(shingles: DataFrame, num_hashes: int = 12) -> DataFrame:
    """Per-doc MinHash signature: one column per hash function, each the min over
    the doc's shingles. Partial (map-side) min aggregation makes this one cheap
    shuffle.

    The digest is the dominant cost at corpus scale, so each shingle is md5'd
    exactly ONCE: 32 bits of the digest are parsed to int64 and the ``num_hashes``
    functions are the universal family h_j(x) = (a_j*x + b_j) mod (2^61-1) —
    pure codegen'd integer ops, ~6× less digest work than seeding md5 per
    function. The DuckDB oracle reproduces it bit-for-bit
    (('0x' || substr(md5(sh),1,8))::BIGINT and the same (a, b) list)."""
    x = F.conv(F.substring(F.md5(F.col("shingle")), 1, 8), 16, 10).cast("long")
    # project x once so the digest provably evaluates once per shingle (not
    # relying on subexpression elimination across the 12 agg expressions)
    xs = shingles.select("id", x.alias("__x"))
    aggs = [
        F.min((F.lit(a) * F.col("__x") + F.lit(b)) % F.lit(MINHASH_P)).alias(f"h{j}")
        for j, (a, b) in enumerate(MINHASH_AB[:num_hashes])
    ]
    return xs.groupBy("id").agg(*aggs)


#: md5 of the empty string — the degenerate band hash of an all-NULL signature band
_EMPTY_MD5 = "d41d8cd98f00b204e9800998ecf8427e"


def _band_entries(bands: int, rows: int) -> Column:
    """The (band, band_hash) struct array — ONE definition of the band-hash
    scheme (separator, hash, layout). This is the persisted-index contract
    shared by self-join candidates, the cross-corpus probe, and any stored
    band buckets: two copies drifting apart would silently stop increments
    matching historical buckets."""
    return F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.md5(
                    F.concat_ws("|", *[F.col(f"h{b * rows + r}") for r in range(rows)])
                ).alias("band_hash"),
            )
            for b in range(bands)
        ]
    )


def lsh_bands(signatures: DataFrame, bands: int, rows: int) -> DataFrame:
    """Signature → (id, band, band_hash): hash each band of ``rows`` consecutive
    minhashes. Docs agreeing on any band become candidates.

    Built as one explode over an array of (band, hash) structs — a single pass over
    the signatures (a per-band union would recompute the signature aggregation
    once per band)."""
    return signatures.select("id", F.explode(_band_entries(bands, rows)).alias("__b")).select(
        "id", F.col("__b.band").alias("band"), F.col("__b.band_hash").alias("band_hash")
    )


def lsh_candidate_pairs(
    signatures: DataFrame,
    bands: int = 4,
    rows: int = 3,
    max_bucket: int | None = None,
) -> DataFrame:
    """Distinct candidate pairs (id_a < id_b) sharing at least one LSH band, with
    the estimated Jaccard = fraction of agreeing minhash components.

    Truly single-pass shape: instead of a band-table self-join (whose two sides
    each re-execute the whole shingle-explode + min-agg pipeline — Spark's
    exchange reuse does not fire across the differently-aliased sides, verified
    via .explain showing two parquet scans), bucket members are collected per
    (band, band_hash) and pairs are generated *within* each bucket:

        signature → explode bands → groupBy(band, band_hash) collect_list
        → posexplode members × explode tail-slice → per-pair agreement
        → groupBy(pair) dedup

    One scan, md5 computed once, 4 total shuffles (spread, signature agg, bucket
    agg, pair dedup) vs 7 + a doubled pipeline before. Per-bucket state is
    O(bucket²) pairs generated by nested Generate operators — streamed, not
    materialized; ``max_bucket`` caps pathological buckets (identical-content
    piles, the dominant real-corpus skew) at scale. The registered query passes
    ``queries_ext_dedup.LSH_MAX_BUCKET`` and its oracle mirrors the cap as a
    HAVING-filtered bucket CTE; None disables the guard for exact all-pairs
    candidate generation."""
    from pyspark.sql.window import Window

    num_hashes = len([c for c in signatures.columns if c.startswith("h")])
    hcols = [f"h{j}" for j in range(num_hashes)]
    bt = signatures.select(
        "id", F.array(*hcols).alias("sig"), F.explode(_band_entries(bands, rows)).alias("__b")
    ).select("id", "sig", F.col("__b.band"), F.col("__b.band_hash"))
    # NULL-text docs carry all-NULL signatures (normalize_text(NULL) is NULL);
    # concat_ws skips NULLs, so every such doc's band hash degenerates to
    # md5('') and the whole NULL pile would bucket together, emitting up to
    # n**2/2 meaningless candidates. Exclude them by comparing the COMPUTED
    # band_hash against that constant — a doc with no content has no near-dup
    # signature (exact dedup still fingerprints it); a present-but-empty text
    # still shingles ('' substr-clamps to one shingle), so only all-NULL bands
    # hit the sentinel. Filtering on h0 IS NOT NULL instead would re-inline
    # the whole inline-signature expression tree into the pushed-down
    # predicate (measured 13x on the sf0.1 bench) — the band_hash compare is
    # one scalar string test on an already-computed column.
    bt = bt.filter(F.col("band_hash") != F.lit(_EMPTY_MD5))
    if max_bucket is not None:
        # cap BEFORE collecting: a window count over the same (band, band_hash)
        # partitioning drops pathological buckets' rows up front (no extra
        # exchange — the groupBy below reuses the partitioning), so an
        # identical-content pile is never materialized as one giant array in a
        # single aggregation buffer only to be size-filtered afterwards
        bt = (
            bt.withColumn(
                "__bsz", F.count("*").over(Window.partitionBy("band", "band_hash"))
            )
            .filter(F.col("__bsz") <= max_bucket)
            .drop("__bsz")
        )
    buckets = (
        bt.groupBy("band", "band_hash")
        .agg(F.collect_list(F.struct("id", "sig")).alias("members"))
        .filter(F.size("members") > 1)
    )
    pairs = buckets.select(
        F.posexplode("members").alias("__i", "a"), "members"
    ).select(
        "a",
        # tail slice: partner every member AFTER position __i exactly once
        # (slice clamps at the array end; length arg = an upper bound)
        F.explode(
            F.slice(F.col("members"), F.col("__i") + 2, F.size("members"))
        ).alias("b"),
    )
    agree = F.aggregate(
        F.zip_with(
            F.col("a.sig"),
            F.col("b.sig"),
            lambda x, y: F.when(x == y, F.lit(1)).otherwise(F.lit(0)),
        ),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    return (
        pairs.select(
            F.least(F.col("a.id"), F.col("b.id")).alias("id_a"),
            F.greatest(F.col("a.id"), F.col("b.id")).alias("id_b"),
            (agree.cast("double") / F.lit(float(num_hashes))).alias("est_jaccard"),
        )
        # a pair matching k bands appears k times with the same estimate; max is
        # a deterministic dedup (any of the k values is the same number)
        .groupBy("id_a", "id_b")
        .agg(F.max("est_jaccard").alias("est_jaccard"))
    )


def lsh_dropped_buckets(
    signatures: DataFrame,
    bands: int,
    rows: int,
    max_bucket: int,
) -> DataFrame:
    """Coverage accounting for ``lsh_candidate_pairs``' ``max_bucket`` skew cap:
    one row per (band, band_hash) bucket the cap DROPS, with its size and the
    candidate-pair count it suppressed (size·(size−1)/2) — so a 100 TB run's
    recall loss from capping is an observable report, never silent. Same
    single-pass topology as the candidate path (explode bands → groupBy count),
    and the same NULL-pile sentinel exclusion (all-NULL signatures are dropped
    by design, not by the cap, and must not inflate this report). Emits
    nothing when no bucket exceeds the cap — the report doubling as a
    cap-was-harmless certificate for the run.

    ``max_bucket`` is REQUIRED (no default): the report's complement property
    only holds at the SAME cap the candidate path ran with
    (``lsh_candidate_pairs`` defaults to uncapped — a defaulted report would
    claim suppression that never happened), so the caller must state it."""
    bt = lsh_bands(signatures, bands, rows).filter(F.col("band_hash") != F.lit(_EMPTY_MD5))
    sz = F.col("bucket_size")
    # exact integer n·(n−1)/2: divide the EVEN factor first (bigint DIV, no
    # double rounding at ~2^53, no long-multiply overflow until the pair
    # count itself exceeds 2^63) — the giant skew buckets are precisely what
    # this report exists to account for, so their arithmetic must be exact
    pairs = F.when(sz % 2 == 0, F.expr("(bucket_size DIV 2) * (bucket_size - 1)")).otherwise(
        F.expr("bucket_size * ((bucket_size - 1) DIV 2)")
    )
    return (
        bt.groupBy("band", "band_hash")
        .agg(F.count("*").alias("bucket_size"))
        .filter(sz > max_bucket)
        .withColumn("pairs_suppressed", pairs.cast("bigint"))
    )


def verify_pairs_ngram_jaccard(
    candidates: DataFrame, grams: DataFrame, min_jaccard: float
) -> DataFrame:
    """Stage-2 verification: exact n-gram Jaccard computed ONLY for candidate
    pairs (id_a < id_b), joined back to the full gram sets — the production
    two-stage shape where stage 1 (LSH) bounds the pair count and this stage
    never touches the n² space. Cost: |candidates| × doc size.

    CONTRACT: a candidate pair sharing ZERO n-grams produces no output row
    (the intersection join has nothing to count), even at min_jaccard=0.0 —
    LSH candidates share a shingle band, not necessarily a word n-gram.
    Callers that need every candidate scored LEFT-join this result back onto
    the candidate set with coalesce(jaccard, 0.0), as `minhash_calibration`
    does (its oracle mirrors the same left join)."""
    sizes = grams.groupBy("id").agg(F.count("*").alias("n"))
    fa = grams.select(F.col("id").alias("id_a"), "ngram")
    fb = grams.select(F.col("id").alias("id_b"), "ngram")
    inter = (
        candidates.select("id_a", "id_b")
        .join(fa, "id_a")
        .join(fb, ["id_b", "ngram"])
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("inter"))
    )
    return (
        inter.join(sizes.select(F.col("id").alias("id_a"), F.col("n").alias("na")), "id_a")
        .join(sizes.select(F.col("id").alias("id_b"), F.col("n").alias("nb")), "id_b")
        .select(
            "id_a",
            "id_b",
            (
                F.col("inter").cast("double")
                / (F.col("na") + F.col("nb") - F.col("inter")).cast("double")
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= F.lit(min_jaccard))
    )


# --- exact n-gram Jaccard ------------------------------------------------------------


def ngram_jaccard_pairs(
    grams: DataFrame, min_jaccard: float = 0.0, max_doc_freq: int | None = None
) -> DataFrame:
    """Exact Jaccard over distinct n-gram sets via inverted-index self-join:
    pairs sharing ≥1 gram, |A∩B| from the join, |A|/|B| from per-doc counts.
    Input: (id, ngram) distinct pairs (from word_ngrams/char_shingles).

    ``max_doc_freq`` (the 100 TB guard): a gram shared by k documents fans out
    k² join rows, so one corpus-wide hot phrase ("click here to subscribe")
    would dominate the whole job. With a cap, grams whose document frequency
    exceeds it are dropped from *candidate generation only*; the Jaccard for
    surviving candidates is still computed over the FULL gram sets, so reported
    values are exact. Only pairs whose every shared gram is hot are missed —
    near-dup pairs share many grams, overwhelmingly non-hot ones (cap 20 loses
    zero true pairs on the test corpora at every SF, measured).

    Capped-path shape (the scale path): doc frequency via a window over the
    ngram partitioning drops hot-gram rows BEFORE the (ngram → id list)
    buckets are collected (the cap bounds aggregation memory, not just
    output); in-bucket pair
    explode counts each pair's shared-rare-gram count c in one pass. Before the
    expensive full-set verification join, pairs are pre-filtered by a SOUND
    Jaccard upper bound — the true intersection is ≤ c + min(hot_a, hot_b)
    (every shared gram is rare-shared or hot in both), so
    ub = (c + min(ha, hb)) / (na + nb − c − min(ha, hb)) ≥ J. Dropping
    pairs with ub < min_jaccard cannot drop a reported pair (prefix-filter
    reasoning à la AllPairs/PPJoin). On shared-template corpora this collapses
    the verify fan-out by ~1000× (1.12 M loose candidates → the few that can
    actually reach the threshold, measured at sf0.1)."""
    sizes = grams.groupBy("id").agg(F.count("*").alias("n"))
    if max_doc_freq is None:
        a, b = grams.alias("ga"), grams.alias("gb")
        # uncapped: the candidate join already touched every co-occurrence, so
        # count the intersection straight off it (one pass, no re-join)
        inter = (
            a.join(b, (F.col("ga.ngram") == F.col("gb.ngram")) & (F.col("ga.id") < F.col("gb.id")))
            .groupBy(F.col("ga.id").alias("id_a"), F.col("gb.id").alias("id_b"))
            .agg(F.count("*").alias("inter"))
        )
    else:
        # df via a window over the SAME ngram partitioning the bucket agg needs
        # (no extra exchange), so hot-bucket rows are dropped BEFORE any
        # collect_list — a corpus-wide hot phrase is never materialized as one
        # multi-million-element array in a single aggregation buffer only to be
        # size-filtered afterwards (the cap must bound memory, not just output)
        from pyspark.sql.window import Window

        gdf = grams.withColumn(
            "__df", F.count("*").over(Window.partitionBy("ngram"))
        )
        small = (
            gdf.filter((F.col("__df") >= 2) & (F.col("__df") <= max_doc_freq))
            .groupBy("ngram")
            .agg(F.collect_list("id").alias("ids"))
        )
        cooc = (
            small.select(F.posexplode("ids").alias("__i", "pa"), "ids")
            .select(
                "pa",
                F.explode(
                    F.slice(F.col("ids"), F.col("__i") + 2, F.size("ids"))
                ).alias("pb"),
            )
            .select(
                F.least("pa", "pb").alias("id_a"),
                F.greatest("pa", "pb").alias("id_b"),
            )
            .groupBy("id_a", "id_b")
            .agg(F.count("*").alias("c"))
        )
        # per-doc gram budget: n total, nh of them hot (df > cap)
        nhot = (
            gdf.filter(F.col("__df") > max_doc_freq)
            .groupBy("id")
            .agg(F.count("*").alias("nh"))
        )
        stats = sizes.join(nhot, "id", "left").select(
            "id", "n", F.coalesce("nh", F.lit(0)).alias("nh")
        )
        pref = cooc.join(
            stats.select(
                F.col("id").alias("id_a"), F.col("n").alias("na"), F.col("nh").alias("ha")
            ),
            "id_a",
        ).join(
            stats.select(
                F.col("id").alias("id_b"), F.col("n").alias("nb"), F.col("nh").alias("hb")
            ),
            "id_b",
        )
        iub = F.col("c") + F.least("ha", "hb")
        cand = pref.filter(
            iub.cast("double") / (F.col("na") + F.col("nb") - iub).cast("double")
            >= F.lit(min_jaccard)
        ).select("id_a", "id_b")
        # exact verification over the FULL gram sets, only for survivors —
        # ONE implementation of the verify join (a drifted copy here was the
        # three-places-to-fix maintenance trap)
        return verify_pairs_ngram_jaccard(cand, grams, min_jaccard)
    return (
        inter.join(sizes.select(F.col("id").alias("id_a"), F.col("n").alias("na")), "id_a")
        .join(sizes.select(F.col("id").alias("id_b"), F.col("n").alias("nb")), "id_b")
        .select(
            "id_a",
            "id_b",
            (
                F.col("inter").cast("double")
                / (F.col("na") + F.col("nb") - F.col("inter")).cast("double")
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= F.lit(min_jaccard))
    )


# --- SimHash -------------------------------------------------------------------------

#: 32 bits = 8 md5 nibbles — portable to the DuckDB oracle via nibble math.
#: (16 bits collides heavily on shared-vocabulary corpora — observed; 64 would
#: overflow signed int64 bit-summing, 32 is the portable sweet spot.)
SIMHASH_BITS = 32


def simhash(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """SimHash per document: each token votes ±1 on each of the fingerprint's bits
    (taken from its md5 nibbles); fingerprint bit = sign of the vote sum.
    Returns (id, simhash int64).

    CONTRACT: a document whose normalized text is empty (or NULL) has NO
    tokens, hence no votes, hence NO output row — SimHash of nothing is
    undefined, and emitting an arbitrary all-zeros fingerprint would make
    every empty doc a Hamming-0 "near-dup" of any doc that happens to hash
    near zero. Empty/identical-empty documents are exact duplicates and are
    collapsed by the fingerprint path (``exact_dedup`` emits a row for every
    doc); pipelines joining simhash output back to the corpus should
    left-join. The DuckDB oracle replays the same token filter, so both
    engines agree row-for-row."""
    tokens = (
        df.select(
            F.col(id_col).alias("id"),
            F.explode(F.split(normalize_text(F.col(text_col)), " ")).alias("tok"),
        )
        .filter(F.col("tok") != "")
        # digest once per token as a projected column: the 32 per-bit aggregate
        # expressions below each reference __m — inlining md5 into every agg
        # expression would rely on subexpression elimination to avoid 32 digests
        # per token (CollapseProject keeps the projection: __m is multi-referenced
        # and non-cheap)
        .select("id", F.md5(F.col("tok")).alias("__m"))
    )
    bit_votes = []
    for i in range(SIMHASH_BITS):
        nib_pos, bit_in_nib = i // 4 + 1, 3 - (i % 4)
        nib_val = F.expr(f"instr('0123456789abcdef', substr(__m, {nib_pos}, 1)) - 1")
        bit = (nib_val.cast("int") / (2**bit_in_nib)).cast("int") % 2
        bit_votes.append(F.sum(bit * 2 - 1).alias(f"v{i}"))
    votes = tokens.groupBy("id").agg(*bit_votes)
    fp = sum(
        (
            F.when(F.col(f"v{i}") > 0, F.lit(2**i).cast("long")).otherwise(F.lit(0).cast("long"))
            for i in range(SIMHASH_BITS)
        ),
        F.lit(0).cast("long"),
    )
    return votes.select("id", fp.alias("simhash"))


def simhash_near_pairs(fingerprints: DataFrame, max_hamming: int = 3) -> DataFrame:
    """Near-dup pairs by Hamming distance ≤ ``max_hamming`` (≤ 3): pigeonhole on the
    four 8-bit quarters — with ≤ 3 differing bits at least one quarter is identical,
    so the quarter-join finds every such pair; the xor/bit_count filter then makes
    the candidate set exact. This is the sub-quadratic SimHash pattern that scales:
    the join key (quarter_idx, quarter_value) has bounded fan-out."""
    assert max_hamming <= 3, "quarter-pigeonhole guarantees recall only up to 3"
    qw = SIMHASH_BITS // 4  # quarter width in bits
    quarters = fingerprints.select(
        "id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(q).alias("q"),
                        ((F.col("simhash") / (2 ** (qw * q))).cast("long") % (2**qw)).alias(
                            "qv"
                        ),
                    )
                    for q in range(4)
                ]
            )
        ).alias("__q"),
    ).select("id", "simhash", F.col("__q.q").alias("q"), F.col("__q.qv").alias("qv"))
    a, b = quarters.alias("a"), quarters.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.q") == F.col("b.q"))
            & (F.col("a.qv") == F.col("b.qv"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.simhash").alias("sa"),
            F.col("b.simhash").alias("sb"),
        )
        .distinct()
    )
    ham = F.bit_count(F.col("sa").bitwiseXOR(F.col("sb")))
    return (
        cand.select("id_a", "id_b", ham.cast("int").alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
    )


def minhash_signatures_inline(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 9,
    num_hashes: int = 12,
) -> DataFrame:
    """Zero-shuffle MinHash signatures: shingling, digest, and each hash
    family's min all evaluate IN-ARRAY per document (transform + array_min) —
    no exploded-row materialization and no aggregation shuffle, so the only
    shuffle left in an LSH dedup pipeline is the band-bucket groupBy.
    Bit-identical to ``minhash_signatures`` over ``char_shingles(distinct=
    False)``: the min over a multiset equals the min over its set.

    Expression-inlining notes (the correctness-of-cost details):
    - ``__t`` is materialized by the repartition Exchange (physical barrier),
      so the regexp normalization runs once per doc — same guard as
      ``char_shingles``;
    - ``__xs`` (the per-shingle digests) is referenced by all ``num_hashes``
      array_min columns, but CollapseProject refuses to duplicate expensive
      multi-referenced aliases (SPARK-36718), so the md5 work provably runs
      once per shingle, not once per hash function."""
    pre = _spread(
        df.select(
            F.col(id_col).alias("id"), normalize_text(F.col(text_col)).alias("__t")
        )
    )
    shingles = F.transform(
        F.sequence(F.lit(1), F.greatest(F.length("__t") - (k - 1), F.lit(1))),
        lambda i: F.col("__t").substr(i, F.lit(k)),
    )
    xs = F.transform(
        shingles, lambda s: F.conv(F.substring(F.md5(s), 1, 8), 16, 10).cast("long")
    )
    with_digests = pre.select("id", xs.alias("__xs"))
    sig_cols = [
        F.array_min(
            F.transform(F.col("__xs"), lambda x: (F.lit(a) * x + F.lit(b)) % F.lit(MINHASH_P))
        ).alias(f"h{j}")
        for j, (a, b) in enumerate(MINHASH_AB[:num_hashes])
    ]
    return with_digests.select("id", *sig_cols)


def lsh_probe_pairs(
    increment_sigs: DataFrame,
    corpus_sigs: DataFrame,
    bands: int = 4,
    rows: int = 3,
    max_bucket: int | None = None,
) -> DataFrame:
    """Cross-corpus LSH probe: near-dup candidates between an INCREMENT and an
    already-indexed CORPUS — the O(increment) nightly shape of near-dedup (the
    exact-dup twin is ``incremental_exact_dedup``). Corpus signatures are the
    persisted index; history is never re-paired against itself.

    Scale shape: the increment's distinct band hashes are broadcast and the
    corpus band table is semi-filtered by them FIRST, so bucket capping, pair
    generation, and agreement scoring all run over O(matched) rows, never
    O(corpus). ``max_bucket`` caps the corpus-side bucket population per
    matched (band, band_hash) — the identical-boilerplate pile guard of
    ``lsh_candidate_pairs``, applied to the probe side."""
    num_hashes = len([c for c in increment_sigs.columns if c.startswith("h")])
    hcols = [f"h{j}" for j in range(num_hashes)]
    inc_b = lsh_bands(increment_sigs, bands, rows).select(
        F.col("id").alias("inc_id"), "band", "band_hash"
    )
    cor_b = lsh_bands(corpus_sigs, bands, rows).select(
        F.col("id").alias("corpus_id"), "band", "band_hash"
    )
    hot = inc_b.select("band", "band_hash").distinct()
    matched = cor_b.join(F.broadcast(hot), ["band", "band_hash"])
    if max_bucket is not None:
        ok = (
            matched.groupBy("band", "band_hash")
            .agg(F.count("*").alias("__n"))
            .filter(F.col("__n") <= max_bucket)
            .select("band", "band_hash")
        )
        matched = matched.join(F.broadcast(ok), ["band", "band_hash"])
    pairs = (
        inc_b.join(matched, ["band", "band_hash"])
        .select("inc_id", "corpus_id")
        .distinct()
    )
    agree = F.aggregate(
        F.zip_with(
            F.col("__sa"),
            F.col("__sb"),
            lambda x, y: F.when(x == y, F.lit(1)).otherwise(F.lit(0)),
        ),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    sa = increment_sigs.select(
        F.col("id").alias("inc_id"), F.array(*hcols).alias("__sa")
    )
    sb = corpus_sigs.select(
        F.col("id").alias("corpus_id"), F.array(*hcols).alias("__sb")
    )
    return (
        pairs.join(sa, "inc_id")
        .join(sb, "corpus_id")
        .select(
            "inc_id",
            "corpus_id",
            (agree.cast("double") / F.lit(float(num_hashes))).alias("est_jaccard"),
        )
    )


def ngram_containment_pairs(
    grams: DataFrame, min_containment: float = 0.0, max_doc_freq: int | None = None
) -> DataFrame:
    """ASYMMETRIC near-dup: set containment |A∩B| / min(|A|, |B|) over distinct
    n-gram sets — the quote/subset detector. A short doc fully embedded in a
    long one scores ~1.0 here while its Jaccard stays tiny (the union is
    dominated by the long doc), so this catches exactly the overlap class
    ``ngram_jaccard_pairs`` is blind to: quotations, boilerplate wrapping,
    excerpt reposts.

    Same inverted-index candidate topology as the Jaccard path: ``max_doc_freq``
    drops hot grams from CANDIDATE GENERATION only (k-doc grams fan out k²),
    while the reported containment is verified over the FULL gram sets — exact
    values, bounded fan-out."""
    sizes = grams.groupBy("id").agg(F.count("*").alias("n"))
    pool = grams
    if max_doc_freq is not None:
        rare = (
            grams.groupBy("ngram")
            .agg(F.count("*").alias("__df"))
            .filter(F.col("__df") <= max_doc_freq)
            .select("ngram")
        )
        pool = grams.join(rare, "ngram", "leftsemi")
    a = pool.select(F.col("id").alias("id_a"), "ngram")
    b = pool.select(F.col("id").alias("id_b"), "ngram")
    cand = (
        a.join(b, ["ngram"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    fa = grams.select(F.col("id").alias("id_a"), "ngram")
    fb = grams.select(F.col("id").alias("id_b"), "ngram")
    inter = (
        cand.join(fa, "id_a")
        .join(fb, ["id_b", "ngram"])
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("inter"))
    )
    return (
        inter.join(sizes.select(F.col("id").alias("id_a"), F.col("n").alias("na")), "id_a")
        .join(sizes.select(F.col("id").alias("id_b"), F.col("n").alias("nb")), "id_b")
        .select(
            "id_a",
            "id_b",
            (F.col("inter").cast("double") / F.least("na", "nb").cast("double")).alias(
                "containment"
            ),
        )
        .filter(F.col("containment") >= F.lit(min_containment))
    )


# --- Duplicated-span removal (the scrub step of Lee et al. 2022) ---------------------


def duplicated_span_scrub(
    df: DataFrame, id_col: str, text_col: str, n: int = 5
) -> DataFrame:
    """REMOVE cross-document duplicated spans from each document — the rewrite
    step of "Deduplicating Training Data Makes Language Models Better" (Lee et
    al. 2022) that `dedup_span_profile`'s coverage metric only measures: a
    word position is duplicated when any word n-gram covering it also occurs
    in ≥ 2 distinct documents, and the scrubbed text is the remaining words
    (original order, single-space joined). Returns (id, n_words, n_dup_words,
    scrubbed_text) for every document.

    Scale shape — the span_profile plan plus one uniform doc-keyed join:
    1. positional n-grams roll up to (ngram, id, starts[]) — the one
       corpus-sized exchange, keyed on near-unique (ngram, id); a hot
       boilerplate gram is ONE row per containing doc with its start list,
       never a row per occurrence;
    2. doc-frequency is a count window over ngram on that rolled-up grain
       (the span_profile trick — no self-join, no gram-keyed re-shuffle);
    3. shared-gram start lists explode to covered positions and fold straight
       to one deduped array per doc — ``collect_set`` dedups overlapping-gram
       repeats inside the aggregation (map-side partials), so there is no
       separate (id, p) DISTINCT exchange;
    4. the rewrite joins that per-doc array back to the word arrays (doc-keyed
       join over the UNSPREAD doc scan — the round-robin spread guards only
       the explode side; spreading the join side would round-robin-shuffle the
       whole corpus for nothing) and filters words by position map-side —
       `filter(ws, (w, i) -> NOT array_contains(cov, i+1))`.
    Nothing is collected; the only window runs on the rolled-up gram grain.
    Like every text operator here, grams use try_element_at + NULL-skipping
    concat_ws so sub-n documents yield one partial gram (ANSI-safe, oracle-
    identical)."""
    from pyspark.sql.window import Window

    norm = df.select(
        F.col(id_col).alias("id"),
        F.split(normalize_text(F.col(text_col)), " ").alias("__w"),
    )
    starts = F.sequence(F.lit(1), F.greatest(F.size("__w") - (n - 1), F.lit(1)))
    gram = lambda s: F.concat_ws(  # noqa: E731
        " ", *[F.try_element_at(F.col("__w"), s + F.lit(j)) for j in range(n)]
    )
    g = _spread(norm).select(
        "id",
        "__w",
        F.size("__w").alias("__nw"),
        F.explode(starts).alias("s"),
    ).select("id", "__nw", "s", gram(F.col("s")).alias("ngram"))
    rolled = g.groupBy("ngram", "id").agg(
        F.collect_list("s").alias("__starts"), F.first("__nw").alias("__nw")
    )
    with_df = rolled.withColumn(
        "__df", F.count("*").over(Window.partitionBy("ngram"))
    )
    covered = (
        with_df.filter(F.col("__df") >= 2)
        .select(
            "id",
            F.explode("__starts").alias("s"),
            F.col("__nw"),
        )
        .select(
            "id",
            F.explode(
                F.sequence(F.col("s"), F.least(F.col("s") + (n - 1), F.col("__nw")))
            ).alias("p"),
        )
        .groupBy("id")
        .agg(F.collect_set("p").alias("__cov"))
    )
    joined = norm.join(covered, "id", "left").select(
        "id",
        "__w",
        F.coalesce(F.col("__cov"), F.array().cast("array<int>")).alias("__cov"),
    )
    kept = F.filter(
        F.col("__w"),
        lambda w, i: ~F.array_contains(F.col("__cov"), (i + F.lit(1)).cast("int")),
    )
    return joined.select(
        "id",
        F.size("__w").cast("bigint").alias("n_words"),
        F.size("__cov").cast("bigint").alias("n_dup_words"),
        F.array_join(kept, " ").alias("scrubbed_text"),
    )
