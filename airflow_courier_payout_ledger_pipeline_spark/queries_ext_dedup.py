"""Exact & near-duplicate detection: hash dedup, MinHash/LSH, n-gram Jaccard, SimHash, containment, two-stage verify, connected components.

Split out of the former monolithic queries_ext.py (round 10) so the
changed-file -> re-adjudicate rule schedules only this domain's queries.
Registration side effects: importing this module registers its queries.
"""

from __future__ import annotations
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from airflow_courier_payout_ledger_pipeline_spark.plans.tpch_adapter import load_tables
from airflow_courier_payout_ledger_pipeline_spark.registry import register
from airflow_courier_payout_ledger_pipeline_spark.queries_ext_text import NORM


# =====================================================================================
# Deduplication
# =====================================================================================

DEDUP_EXACT_ORACLE = f"""
SELECT md5({NORM}) AS fp, min(doc_id) AS keep_id, count(*) AS dup_count
FROM documents GROUP BY 1
"""


@register("dedup_exact", DEDUP_EXACT_ORACLE)
def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup groups: hash-groupBy on the normalized-content fingerprint."""
    from airflow_courier_payout_ledger_pipeline_spark.operators.dedup import (
        exact_dedup_groups,
    )

    docs = load_tables(spark, sf_dir, "documents")["documents"]
    return exact_dedup_groups(docs, "doc_id", "text")


NUM_HASHES, BANDS, ROWS_PER_BAND = 12, 4, 3

def _sig_cte() -> str:
    from airflow_courier_payout_ledger_pipeline_spark.operators.dedup import (
        MINHASH_AB,
        MINHASH_P,
    )

    hs = ", ".join(
        f"min(({a} * x + {b}) % {MINHASH_P}) AS h{j}"
        for j, (a, b) in enumerate(MINHASH_AB[:NUM_HASHES])
    )
    return f"""
norm AS (SELECT doc_id, {NORM} AS t FROM documents),
pos AS (SELECT doc_id, t, unnest(generate_series(1, greatest(length(t) - 8, 1))) AS i FROM norm),
sh AS (SELECT DISTINCT doc_id, substr(t, i, 9) AS shingle FROM pos),
xs AS (SELECT doc_id, ('0x' || substr(md5(shingle), 1, 8))::BIGINT AS x FROM sh),
sig AS (SELECT doc_id AS id, {hs} FROM xs GROUP BY doc_id)
"""


_SHINGLES_CTE = _sig_cte()

MINHASH_SIG_ORACLE = f"""
WITH {_SHINGLES_CTE}
SELECT * FROM sig
"""


@register("minhash_signatures", MINHASH_SIG_ORACLE)
def q_minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document MinHash signature over 9-char shingles: one md5 per shingle,
    12 universal-hash functions (a·x + b mod 2^61−1) over 32 digest bits."""
    from airflow_courier_payout_ledger_pipeline_spark.operators.dedup import (
        minhash_signatures_inline,
    )

    docs = load_tables(spark, sf_dir, "documents")["documents"]
    # in-array formulation: shingling, digest, and the 12 mins all evaluate
    # per-document with no explode and no aggregation shuffle (bit-identical
    # to the exploded path — min over a multiset equals min over the set)
    return minhash_signatures_inline(docs, "doc_id", "text", k=9, num_hashes=NUM_HASHES)


_BANDS_SQL = " UNION ALL ".join(
    f"SELECT id, {b} AS band, md5("
    + " || '|' || ".join(f"h{b * ROWS_PER_BAND + r}" for r in range(ROWS_PER_BAND))
    + ") AS band_hash FROM sig"
    for b in range(BANDS)
)

_AGREE_SQL = " + ".join(
    f"(CASE WHEN sa.h{j} = sb.h{j} THEN 1 ELSE 0 END)" for j in range(NUM_HASHES)
)

# In-bucket pair generation is O(bucket²): one pile of identical boilerplate —
# the #1 real-corpus skew — makes a single bucket quadratic at 100×. The cap
# drops any band bucket holding more than LSH_MAX_BUCKET members (such buckets
# carry no dedup information anyway: everything in them is near-identical, and
# the exact-hash dedup path already collapses identical piles). Mirrored in the
# oracle as a HAVING-capped bucket CTE so the registered artifact is the
# skew-safe configuration, not just the small-SF-correct one.
LSH_MAX_BUCKET = 50

MINHASH_LSH_ORACLE = f"""
WITH {_SHINGLES_CTE},
bands AS ({_BANDS_SQL}),
ok AS (
    SELECT band, band_hash FROM bands
    GROUP BY band, band_hash HAVING count(*) <= {LSH_MAX_BUCKET}
),
capped AS (SELECT b.* FROM bands b JOIN ok USING (band, band_hash)),
pairs AS (
    SELECT DISTINCT a.id AS id_a, b.id AS id_b
    FROM capped a JOIN capped b
      ON a.band = b.band AND a.band_hash = b.band_hash AND a.id < b.id
)
SELECT p.id_a, p.id_b, ({_AGREE_SQL}) / {NUM_HASHES}.0 AS est_jaccard
FROM pairs p JOIN sig sa ON p.id_a = sa.id JOIN sig sb ON p.id_b = sb.id
"""


# band_hash IS NOT NULL mirrors the Spark operator's NULL-pile sentinel
# exclusion: a NULL-text doc's h-columns are NULL, which DuckDB's `||` chain
# turns into band_hash = NULL (GROUP BY would pile them into one per-band
# NULL bucket), while Spark's concat_ws skips NULLs into the md5('')
# sentinel that lsh_dropped_buckets filters. Both sides must agree that
# NULL piles are dropped by design, never reported as cap loss. The exact
# odd/even split keeps pairs_suppressed pure bigint arithmetic (no double
# rounding, no overflow below 2^63 pairs) in both engines.
LSH_DROPPED_ORACLE = f"""
WITH {_SHINGLES_CTE},
bands AS ({_BANDS_SQL})
SELECT band, band_hash, count(*) AS bucket_size,
       CASE WHEN count(*) % 2 = 0
            THEN (count(*) // 2) * (count(*) - 1)
            ELSE count(*) * ((count(*) - 1) // 2)
       END AS pairs_suppressed
FROM bands WHERE band_hash IS NOT NULL
GROUP BY 1, 2 HAVING count(*) > {LSH_MAX_BUCKET}
"""


@register("dedup_lsh_dropped_buckets", LSH_DROPPED_ORACLE)
def q_dedup_lsh_dropped_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Coverage accounting for `dedup_minhash_lsh`'s max_bucket skew cap AT THE
    SHIPPED CONFIGURATION (LSH_MAX_BUCKET): every (band, band_hash) bucket the
    cap drops, with its size and the candidate-pair count it suppressed —
    the observability rail that turns a 100 TB run's capping recall loss from
    a silent property of the plan into a checkable report (empty report ⇒ the
    cap was harmless this run). Hash-checked: the oracle replays shingling,
    signatures, banding, and the HAVING-capped census in one statement."""
    from airflow_courier_payout_ledger_pipeline_spark.operators.dedup import (
        lsh_dropped_buckets,
        minhash_signatures_inline,
    )

    docs = load_tables(spark, sf_dir, "documents")["documents"]
    sig = minhash_signatures_inline(docs, "doc_id", "text", k=9, num_hashes=NUM_HASHES)
    return lsh_dropped_buckets(sig, BANDS, ROWS_PER_BAND, max_bucket=LSH_MAX_BUCKET)


@register("dedup_minhash_lsh", MINHASH_LSH_ORACLE)
def q_dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup candidate pairs (4 bands × 3 rows) with the estimated
    Jaccard from signature agreement — the sub-quadratic dedup path at scale.
    Registered with the skew guard (max_bucket=LSH_MAX_BUCKET) so a pathological
    identical-content pile can't turn one bucket quadratic; the oracle applies
    the same cap."""
    from airflow_courier_payout_ledger_pipeline_spark.operators.dedup import (
        lsh_candidate_pairs,
        minhash_signatures_inline,
    )

    docs = load_tables(spark, sf_dir, "documents")["documents"]
    sig = minhash_signatures_inline(docs, "doc_id", "text", k=9, num_hashes=NUM_HASHES)
    return lsh_candidate_pairs(sig, BANDS, ROWS_PER_BAND, max_bucket=LSH_MAX_BUCKET)


NGRAM_DF_CAP = 20  # hot-shingle guard: grams in > cap docs skip candidate gen

NGRAM_JACCARD_ORACLE = f"""
WITH norm AS (SELECT doc_id, string_split({NORM}, ' ') AS ws FROM documents),
pos AS (SELECT doc_id, ws, unnest(generate_series(1, greatest(len(ws) - 2, 1))) AS i FROM norm),
g AS (SELECT DISTINCT doc_id AS id, concat_ws(' ', ws[i], ws[i+1], ws[i+2]) AS ngram FROM pos),
rare AS (SELECT ngram FROM g GROUP BY ngram HAVING count(*) <= {NGRAM_DF_CAP}),
gj AS (SELECT g.id, g.ngram FROM g JOIN rare USING (ngram)),
cand AS (
    SELECT DISTINCT a.id AS id_a, b.id AS id_b
    FROM gj a JOIN gj b ON a.ngram = b.ngram AND a.id < b.id
),
sizes AS (SELECT id, count(*) AS n FROM g GROUP BY id),
inter AS (
    SELECT c.id_a, c.id_b, count(*) AS ci
    FROM cand c
    JOIN g a ON a.id = c.id_a
    JOIN g b ON b.id = c.id_b AND b.ngram = a.ngram
    GROUP BY 1, 2
)
SELECT id_a, id_b, ci::DOUBLE / (sa.n + sb.n - ci)::DOUBLE AS jaccard
FROM inter JOIN sizes sa ON id_a = sa.id JOIN sizes sb ON id_b = sb.id
WHERE ci::DOUBLE / (sa.n + sb.n - ci)::DOUBLE >= 0.3
"""


@register("dedup_ngram_jaccard", NGRAM_JACCARD_ORACLE)
def q_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact word-trigram Jaccard ≥ 0.3: df-capped inverted-index candidates
    (bounded hot-shingle fan-out), then exact verification over full gram sets —
    the verification stage after LSH candidate generation."""
    from airflow_courier_payout_ledger_pipeline_spark.operators.dedup import (
        ngram_jaccard_pairs,
        word_ngrams,
    )

    docs = load_tables(spark, sf_dir, "documents")["documents"]
    return ngram_jaccard_pairs(
        word_ngrams(docs, "doc_id", "text", n=3), 0.3, max_doc_freq=NGRAM_DF_CAP
    )


# Asymmetric twin of NGRAM_JACCARD_ORACLE: same candidate CTEs, score is
# containment ci / min(|A|,|B|) — a short doc embedded in a long one scores
# ~1.0 here while its Jaccard stays tiny (union dominated by the long doc).
NGRAM_CONTAINMENT_ORACLE = f"""
WITH norm AS (SELECT doc_id, string_split({NORM}, ' ') AS ws FROM documents),
pos AS (SELECT doc_id, ws, unnest(generate_series(1, greatest(len(ws) - 2, 1))) AS i FROM norm),
g AS (SELECT DISTINCT doc_id AS id, concat_ws(' ', ws[i], ws[i+1], ws[i+2]) AS ngram FROM pos),
rare AS (SELECT ngram FROM g GROUP BY ngram HAVING count(*) <= {NGRAM_DF_CAP}),
gj AS (SELECT g.id, g.ngram FROM g JOIN rare USING (ngram)),
cand AS (
    SELECT DISTINCT a.id AS id_a, b.id AS id_b
    FROM gj a JOIN gj b ON a.ngram = b.ngram AND a.id < b.id
),
sizes AS (SELECT id, count(*) AS n FROM g GROUP BY id),
inter AS (
    SELECT c.id_a, c.id_b, count(*) AS ci
    FROM cand c
    JOIN g a ON a.id = c.id_a
    JOIN g b ON b.id = c.id_b AND b.ngram = a.ngram
    GROUP BY 1, 2
)
SELECT id_a, id_b, ci::DOUBLE / least(sa.n, sb.n)::DOUBLE AS containment
FROM inter JOIN sizes sa ON id_a = sa.id JOIN sizes sb ON id_b = sb.id
WHERE ci::DOUBLE / least(sa.n, sb.n)::DOUBLE >= 0.4
"""


@register("ngram_containment", NGRAM_CONTAINMENT_ORACLE)
def q_ngram_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quote/subset detection: word-trigram CONTAINMENT ≥ 0.4 — the asymmetric
    overlap class symmetric Jaccard is blind to (a short doc fully embedded in
    a long one: containment ~1.0, Jaccard tiny). Same df-capped inverted-index
    candidates as the Jaccard path, exact verification over full gram sets
    (operators/dedup.ngram_containment_pairs)."""
    from airflow_courier_payout_ledger_pipeline_spark.operators.dedup import (
        ngram_containment_pairs,
        word_ngrams,
    )

    docs = load_tables(spark, sf_dir, "documents")["documents"]
    return ngram_containment_pairs(
        word_ngrams(docs, "doc_id", "text", n=3), 0.4, max_doc_freq=NGRAM_DF_CAP
    )


# --- two-stage production dedup: LSH candidates -> exact verification ---------------

TWO_STAGE_ORACLE = f"""
WITH {_SHINGLES_CTE},
bands AS ({_BANDS_SQL}),
ok AS (
    SELECT band, band_hash FROM bands
    GROUP BY band, band_hash HAVING count(*) <= {LSH_MAX_BUCKET}
),
capped AS (SELECT b.* FROM bands b JOIN ok USING (band, band_hash)),
cand AS (
    SELECT DISTINCT a.id AS id_a, b.id AS id_b
    FROM capped a JOIN capped b
      ON a.band = b.band AND a.band_hash = b.band_hash AND a.id < b.id
),
wnorm AS (SELECT doc_id, string_split({NORM}, ' ') AS ws FROM documents),
wpos AS (SELECT doc_id, ws, unnest(generate_series(1, greatest(len(ws) - 2, 1))) AS i FROM wnorm),
g AS (SELECT DISTINCT doc_id AS id, concat_ws(' ', ws[i], ws[i+1], ws[i+2]) AS ngram FROM wpos),
sizes AS (SELECT id, count(*) AS n FROM g GROUP BY id),
inter AS (
    SELECT c.id_a, c.id_b, count(*) AS ci
    FROM cand c
    JOIN g a ON a.id = c.id_a
    JOIN g b ON b.id = c.id_b AND b.ngram = a.ngram
    GROUP BY 1, 2
)
SELECT id_a, id_b, ci::DOUBLE / (sa.n + sb.n - ci)::DOUBLE AS jaccard
FROM inter JOIN sizes sa ON id_a = sa.id JOIN sizes sb ON id_b = sb.id
WHERE ci::DOUBLE / (sa.n + sb.n - ci)::DOUBLE >= 0.3
"""


@register("dedup_two_stage", TWO_STAGE_ORACLE)
def q_dedup_two_stage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The production near-dup pipeline in one plan: MinHash+LSH candidate
    generation (sub-quadratic) feeding exact word-trigram Jaccard verification
    computed only for candidates — the n² space is never touched; stage-2 cost
    is |candidates| × doc size."""
    from airflow_courier_payout_ledger_pipeline_spark.operators.dedup import (
        lsh_candidate_pairs,
        minhash_signatures_inline,
        verify_pairs_ngram_jaccard,
        word_ngrams,
    )

    docs = load_tables(spark, sf_dir, "documents")["documents"]
    sig = minhash_signatures_inline(docs, "doc_id", "text", k=9, num_hashes=NUM_HASHES)
    candidates = lsh_candidate_pairs(sig, BANDS, ROWS_PER_BAND, max_bucket=LSH_MAX_BUCKET)
    grams = word_ngrams(docs, "doc_id", "text", n=3)
    return verify_pairs_ngram_jaccard(candidates, grams, 0.3)


def _simhash_votes_sql() -> str:
    from airflow_courier_payout_ledger_pipeline_spark.operators.dedup import SIMHASH_BITS

    votes = []
    for i in range(SIMHASH_BITS):
        nib_pos, bit = i // 4 + 1, 3 - (i % 4)
        votes.append(
            f"SUM((((strpos('0123456789abcdef', substr(md5(tok), {nib_pos}, 1)) - 1)"
            f" // {2 ** bit}) % 2) * 2 - 1) AS v{i}"
        )
    return ", ".join(votes)


from airflow_courier_payout_ledger_pipeline_spark.operators.dedup import SIMHASH_BITS

_SIMHASH_FP_SQL = (
    "("
    + " + ".join(f"CASE WHEN v{i} > 0 THEN {2 ** i} ELSE 0 END" for i in range(SIMHASH_BITS))
    + ")::BIGINT"
)

SIMHASH_ORACLE = f"""
WITH toks AS (
    SELECT doc_id, unnest(string_split({NORM}, ' ')) AS tok FROM documents
),
votes AS (
    SELECT doc_id, {_simhash_votes_sql()}
    FROM toks WHERE tok != '' GROUP BY doc_id
)
SELECT doc_id AS id, {_SIMHASH_FP_SQL} AS simhash FROM votes
"""


@register("dedup_simhash", SIMHASH_ORACLE)
def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """32-bit SimHash fingerprints (per-token md5 bit votes)."""
    from airflow_courier_payout_ledger_pipeline_spark.operators.dedup import simhash

    docs = load_tables(spark, sf_dir, "documents")["documents"]
    return simhash(docs, "doc_id", "text")


SIMHASH_PAIRS_ORACLE = f"""
WITH toks AS (
    SELECT doc_id, unnest(string_split({NORM}, ' ')) AS tok FROM documents
),
votes AS (
    SELECT doc_id, {_simhash_votes_sql()}
    FROM toks WHERE tok != '' GROUP BY doc_id
),
fp AS (SELECT doc_id AS id, {_SIMHASH_FP_SQL} AS simhash FROM votes),
q AS (
    SELECT id, simhash, k AS q, (simhash // (256 ** k)::BIGINT) % 256 AS qv
    FROM fp, (SELECT unnest(generate_series(0, 3)) AS k)
),
cand AS (
    SELECT DISTINCT a.id AS id_a, b.id AS id_b, a.simhash AS sa, b.simhash AS sb
    FROM q a JOIN q b ON a.q = b.q AND a.qv = b.qv AND a.id < b.id
)
SELECT id_a, id_b, bit_count(xor(sa::BIGINT, sb::BIGINT))::INT AS hamming
FROM cand WHERE bit_count(xor(sa::BIGINT, sb::BIGINT)) <= 3
"""


@register("dedup_simhash_pairs", SIMHASH_PAIRS_ORACLE)
def q_dedup_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs: quarter-pigeonhole candidates + exact Hamming ≤ 3."""
    from airflow_courier_payout_ledger_pipeline_spark.operators.dedup import (
        simhash,
        simhash_near_pairs,
    )

    docs = load_tables(spark, sf_dir, "documents")["documents"]
    return simhash_near_pairs(simhash(docs, "doc_id", "text"), 3)


# --- dedup clustering: pair edges → connected components → canonical doc ------------

COMPONENTS_ORACLE = f"""
WITH RECURSIVE toks AS (
    SELECT doc_id, unnest(string_split({NORM}, ' ')) AS tok FROM documents
),
votes AS (
    SELECT doc_id, {{votes}}
    FROM toks WHERE tok != '' GROUP BY doc_id
),
fp AS (SELECT doc_id AS id, {{fp}} AS simhash FROM votes),
qq AS (
    SELECT id, simhash, k AS q, (simhash // (256 ** k)::BIGINT) % 256 AS qv
    FROM fp, (SELECT unnest(generate_series(0, 3)) AS k)
),
cand AS (
    SELECT DISTINCT a.id AS id_a, b.id AS id_b, a.simhash AS sa, b.simhash AS sb
    FROM qq a JOIN qq b ON a.q = b.q AND a.qv = b.qv AND a.id < b.id
),
pairs AS (
    SELECT id_a, id_b FROM cand WHERE bit_count(xor(sa::BIGINT, sb::BIGINT)) <= 3
),
edges AS (
    SELECT id_a AS src, id_b AS dst FROM pairs
    UNION SELECT id_b, id_a FROM pairs
),
reach AS (
    SELECT doc_id AS id, doc_id AS r FROM documents
    UNION
    SELECT e.dst AS id, reach.r FROM reach JOIN edges e ON e.src = reach.id
)
SELECT id AS doc_id, min(r) AS component FROM reach GROUP BY id
"""


def _components_oracle() -> str:
    return COMPONENTS_ORACLE.format(votes=_simhash_votes_sql(), fp=_SIMHASH_FP_SQL)


@register("dedup_components", _components_oracle())
def q_dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise near-dup edges (SimHash, Hamming ≤ 3) collapsed into dedup
    clusters: every document labeled with its component's min doc_id (the
    canonical representative) via distributed min-label propagation
    (operators/graph.py). Oracle: recursive-CTE transitive closure — the
    iterative Spark loop and the fixpoint recursion agree exactly."""
    from airflow_courier_payout_ledger_pipeline_spark.operators.dedup import (
        simhash,
        simhash_near_pairs,
    )
    from airflow_courier_payout_ledger_pipeline_spark.operators.graph import (
        connected_components,
    )

    docs = load_tables(spark, sf_dir, "documents")["documents"]
    pairs = simhash_near_pairs(simhash(docs, "doc_id", "text"), 3)
    comp = connected_components(docs.select("doc_id"), pairs, id_col="doc_id")
    return comp.select(F.col("id").alias("doc_id"), "component")
