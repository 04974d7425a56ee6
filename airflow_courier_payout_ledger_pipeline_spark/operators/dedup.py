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
    df = _spread(df)
    norm = normalize_text(F.col(text_col))
    out = df.select(
        F.col(id_col).alias("id"),
        norm.alias("__t"),
        F.explode(
            F.sequence(F.lit(1), F.greatest(F.length(norm) - (k - 1), F.lit(1)))
        ).alias("__i"),
    ).select("id", F.expr(f"substr(__t, __i, {k})").alias("shingle"))
    return out.distinct() if distinct else out


def word_ngrams(
    df: DataFrame, id_col: str, text_col: str, n: int = 3, distinct: bool = True
) -> DataFrame:
    """(id, ngram) pairs: word n-grams of the normalized text (space-joined)."""
    df = _spread(df)
    words = F.split(normalize_text(F.col(text_col)), " ")
    idx = F.explode(F.sequence(F.lit(1), F.greatest(F.size(words) - (n - 1), F.lit(1))))
    df2 = df.select(F.col(id_col).alias("id"), words.alias("__w"), idx.alias("__i"))
    # try_element_at, not element_at: Spark 4 runs ANSI mode by default, where an
    # out-of-bounds element_at throws — a doc with < n words must instead yield
    # one partial n-gram (NULLs skipped by concat_ws, matching the DuckDB
    # oracle's NULL-skipping concat_ws over ws[i+j]).
    gram = F.concat_ws(
        " ", *[F.expr(f"try_element_at(__w, __i + {j})") for j in range(n)]
    )
    out = df2.select("id", gram.alias("ngram"))
    return out.distinct() if distinct else out


# --- MinHash + LSH -------------------------------------------------------------------


def _seeded_md5(col: Column, seed: int) -> Column:
    return F.md5(F.concat(F.lit(f"{seed}:"), col))


def minhash_signatures(shingles: DataFrame, num_hashes: int = 12) -> DataFrame:
    """Per-doc MinHash signature: one column per hash function, each the min over
    the doc's shingles. Partial (map-side) min aggregation makes this one cheap
    shuffle.

    md5 dominates the cost, so each seeded md5 yields TWO independent hash
    functions (its 16-hex-char halves — both uniform in the shingle): h{2j} =
    md5(j:sh)[0:16], h{2j+1} = md5(j:sh)[16:32]. Halves the digest work for the
    same signature width; the DuckDB oracle mirrors the same split."""
    aggs = []
    for j in range(num_hashes):
        seed, half = divmod(j, 2)
        h = F.substring(_seeded_md5(F.col("shingle"), seed), 1 + 16 * half, 16)
        aggs.append(F.min(h).alias(f"h{j}"))
    return shingles.groupBy("id").agg(*aggs)


def lsh_bands(signatures: DataFrame, bands: int, rows: int) -> DataFrame:
    """Signature → (id, band, band_hash): hash each band of ``rows`` consecutive
    minhashes. Docs agreeing on any band become candidates.

    Built as one explode over an array of (band, hash) structs — a single pass over
    the signatures (a per-band union would recompute the signature aggregation
    once per band)."""
    entries = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.md5(
                    F.concat_ws(
                        "|", *[F.col(f"h{b * rows + r}") for r in range(rows)]
                    )
                ).alias("band_hash"),
            )
            for b in range(bands)
        ]
    )
    return signatures.select("id", F.explode(entries).alias("__b")).select(
        "id", F.col("__b.band").alias("band"), F.col("__b.band_hash").alias("band_hash")
    )


def lsh_candidate_pairs(
    signatures: DataFrame, bands: int = 4, rows: int = 3
) -> DataFrame:
    """Distinct candidate pairs (id_a < id_b) sharing at least one LSH band, with
    the estimated Jaccard = fraction of agreeing minhash components.

    Single-pass shape: the band table carries the full signature columns through
    the explode, so the band self-join computes each pair's agreement directly
    and one groupBy both dedupes multi-band matches and emits the estimate.
    Compared to distinct + two signature re-joins, that is three fewer shuffles
    (2.8 s → 1.7 s steady-state at sf0.1, measured) and nothing is persisted
    (no cache-lifecycle leak). Wider shuffle rows (the signature travels with
    each of its bands), but a signature is ~200 B — bandwidth-trivial next to
    the shingle explode upstream."""
    num_hashes = len([c for c in signatures.columns if c.startswith("h")])
    hcols = [f"h{j}" for j in range(num_hashes)]
    entries = F.array(
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
    bt = signatures.select("id", *hcols, F.explode(entries).alias("__b")).select(
        "id", *hcols, F.col("__b.band").alias("band"), F.col("__b.band_hash").alias("band_hash")
    )
    # shuffle_hash: a broadcast of one side would force the whole signature
    # pipeline (shingle explode + min aggs) to execute twice — once to build
    # the broadcast, once on the probe side. Pinning the shuffle-hash strategy
    # keeps the plan deterministic across AQE's size estimates; band keys are
    # near-unique, so there is no join skew to trade away.
    bt = bt.hint("shuffle_hash")
    a = bt.select(
        F.col("id").alias("id_a"), "band", "band_hash",
        *[F.col(h).alias(f"a{j}") for j, h in enumerate(hcols)],
    )
    b = bt.select(
        F.col("id").alias("id_b"), "band", "band_hash",
        *[F.col(h).alias(f"b{j}") for j, h in enumerate(hcols)],
    )
    agree = sum(
        (F.when(F.col(f"a{j}") == F.col(f"b{j}"), 1).otherwise(0) for j in range(num_hashes)),
        F.lit(0),
    )
    return (
        a.join(b, ["band", "band_hash"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            (agree.cast("double") / F.lit(float(num_hashes))).alias("est_jaccard"),
        )
        # a pair matching k bands appears k times with the same estimate; max is
        # a deterministic dedup (any of the k values is the same number)
        .groupBy("id_a", "id_b")
        .agg(F.max("est_jaccard").alias("est_jaccard"))
    )


def verify_pairs_ngram_jaccard(
    candidates: DataFrame, grams: DataFrame, min_jaccard: float
) -> DataFrame:
    """Stage-2 verification: exact n-gram Jaccard computed ONLY for candidate
    pairs (id_a < id_b), joined back to the full gram sets — the production
    two-stage shape where stage 1 (LSH) bounds the pair count and this stage
    never touches the n² space. Cost: |candidates| × doc size."""
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
    zero true pairs on the test corpora at every SF, measured)."""
    sizes = grams.groupBy("id").agg(F.count("*").alias("n"))
    if max_doc_freq is None:
        join_grams = grams
    else:
        rare = (
            grams.groupBy("ngram")
            .agg(F.count("*").alias("__df"))
            .filter(F.col("__df") <= max_doc_freq)
            .select("ngram")
        )
        join_grams = grams.join(rare, "ngram", "left_semi")
    a, b = join_grams.alias("ga"), join_grams.alias("gb")
    cand = (
        a.join(b, (F.col("ga.ngram") == F.col("gb.ngram")) & (F.col("ga.id") < F.col("gb.id")))
        .select(F.col("ga.id").alias("id_a"), F.col("gb.id").alias("id_b"))
        .distinct()
    )
    if max_doc_freq is None:
        # uncapped: the candidate join already touched every co-occurrence, so
        # count the intersection straight off it (one pass, no re-join)
        inter = (
            a.join(b, (F.col("ga.ngram") == F.col("gb.ngram")) & (F.col("ga.id") < F.col("gb.id")))
            .groupBy(F.col("ga.id").alias("id_a"), F.col("gb.id").alias("id_b"))
            .agg(F.count("*").alias("inter"))
        )
    else:
        # capped: verify candidates against the FULL gram sets — fan-out is
        # bounded by |candidates| × doc size, never by hot-gram df²
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
    Returns (id, simhash int64)."""
    tokens = df.select(
        F.col(id_col).alias("id"),
        F.explode(F.split(normalize_text(F.col(text_col)), " ")).alias("tok"),
    ).filter(F.col("tok") != "")
    h = F.md5(F.col("tok"))
    bit_votes = []
    for i in range(SIMHASH_BITS):
        nib_pos, bit_in_nib = i // 4 + 1, 3 - (i % 4)
        nib_val = F.expr(f"instr('0123456789abcdef', substr(md5(tok), {nib_pos}, 1)) - 1")
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
