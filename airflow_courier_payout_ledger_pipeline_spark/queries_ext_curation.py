"""Corpus curation & layout: deterministic/stratified sampling, z-order values, top-k per group, sequence packing, incremental dedup probe, incremental z-order compaction, end-to-end training shards.

Split out of the former monolithic queries_ext.py (round 10) so the
changed-file -> re-adjudicate rule schedules only this domain's queries.
Registration side effects: importing this module registers its queries.
"""

from __future__ import annotations
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from airflow_courier_payout_ledger_pipeline_spark.plans.tpch_adapter import load_tables
from airflow_courier_payout_ledger_pipeline_spark.registry import register
from airflow_courier_payout_ledger_pipeline_spark.queries_ext_state import CHUNK_S, CHUNK_W
from airflow_courier_payout_ledger_pipeline_spark.queries_ext_text import NORM


SAMPLE_ORACLE = """
SELECT doc_id, lang
FROM documents
WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '20'
"""


@register("deterministic_sample", SAMPLE_ORACLE)
def q_deterministic_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible ~1/8 sample by content-independent key hash — the sampling a
    training pipeline can re-run months later and get byte-identical splits
    (df.sample() depends on partitioning and seed plumbing; a hash predicate
    depends on nothing). md5 keeps it engine-portable; pushdown-friendly map-side
    filter, zero shuffles."""
    docs = load_tables(spark, sf_dir, "documents")["documents"]
    return docs.select("doc_id", "lang").filter(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2) < "20"
    )


# =====================================================================================
# Data layout: Z-order clustering (operators/layout.py)
# =====================================================================================

from airflow_courier_payout_ledger_pipeline_spark.operators.layout import morton_sql  # noqa: E402

ZORDER_ORACLE = f"""
WITH d AS (
    SELECT event_id,
           (user_id % 1024)::BIGINT AS x,
           (hour(ts) * 60 + minute(ts))::BIGINT AS y
    FROM events
)
SELECT event_id, x, y, ({morton_sql(["x", "y"], bits=11)})::BIGINT AS zvalue
FROM d
"""


@register("zorder_values", ZORDER_ORACLE)
def q_zorder_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton z-value of (user bucket, minute-of-day) per event — the interleaved
    sort key behind multi-column row-group skipping (Delta's OPTIMIZE ZORDER
    shape on vanilla parquet; pure shift/mask codegen, SQL-reproducible so any
    engine can audit the layout). Write path: operators/layout.zorder_layout."""
    from airflow_courier_payout_ledger_pipeline_spark.operators.layout import (
        morton_zvalue,
    )

    ev = load_tables(spark, sf_dir, "events")["events"]
    x = F.pmod(F.col("user_id"), F.lit(1024)).cast("long")
    y = (F.hour("ts") * 60 + F.minute("ts")).cast("long")
    return ev.select(
        "event_id",
        x.alias("x"),
        y.alias("y"),
        morton_zvalue([x, y], bits=11).alias("zvalue"),
    )


TOPK_PER_GROUP_ORACLE = """
SELECT source, doc_id, n_chars,
       CAST(row_number() OVER (PARTITION BY source
                               ORDER BY n_chars DESC, doc_id) AS INT) AS rn
FROM documents
QUALIFY rn <= 3
"""


@register("topk_per_group", TOPK_PER_GROUP_ORACLE)
def q_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 longest documents per source (deterministic (len desc, id)
    tiebreak) — the per-domain selection shape of curation. Spark 3.5+ rewrites
    the rank-filter into WindowGroupLimit: each map task keeps only k rows per
    group BEFORE the shuffle, so the sort never sees the full corpus
    (plan-asserted in tests)."""
    from pyspark.sql.window import Window

    docs = load_tables(spark, sf_dir, "documents")["documents"]
    w = Window.partitionBy("source").orderBy(F.col("n_chars").desc(), F.col("doc_id"))
    return (
        docs.select("source", "doc_id", "n_chars")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
    )


# =====================================================================================
# Curation sampling & packing (operators/sampling.py)
# =====================================================================================

# thresholds = hash_threshold(f): 0.9→e666, 0.6→999a, 0.3→4ccd, 0.1→199a, 0.05→0ccd
_MIX = {"src0": 0.9, "src1": 0.6, "src2": 0.3, "src3": 0.1}
_MIX_DEFAULT = 0.05

STRATIFIED_ORACLE = """
SELECT doc_id, source FROM documents
WHERE substring(md5(doc_id::VARCHAR), 1, 4) <
      CASE source WHEN 'src0' THEN 'e666' WHEN 'src1' THEN '999a'
                  WHEN 'src2' THEN '4ccd' WHEN 'src3' THEN '199a'
                  ELSE '0ccd' END
"""


@register("stratified_sample", STRATIFIED_ORACLE)
def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-mix sampling: per-source keep fractions (curated sources
    up-weighted, long-tail crawl at 5%) applied as a deterministic md5-threshold
    CASE — zero shuffles, reproducible across runs/cluster sizes
    (operators/sampling.stratified_sample)."""
    from airflow_courier_payout_ledger_pipeline_spark.operators.sampling import (
        stratified_sample,
    )

    docs = load_tables(spark, sf_dir, "documents")["documents"]
    return stratified_sample(
        docs.select("doc_id", "source"), "doc_id", "source", _MIX, _MIX_DEFAULT
    )


PACKING_ORACLE = """
WITH cs AS (
    SELECT doc_id, n_chars,
           SUM(n_chars) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS c
    FROM documents
)
-- ::BIGINT on every column derived from the windowed SUM: DuckDB's SUM(int) is
-- HUGEINT, which its pandas bridge converts to float64 — the driver hashes
-- float 3.0 != Spark int64 3 even though fetchall()'s Python ints agree
-- (CORRECTNESS_r04's one hash_match=false; guarded in oracle_harness.compare).
SELECT ((c - n_chars) // 2000)::BIGINT AS bin_id, count(*) AS n_docs,
       SUM(n_chars)::BIGINT AS tokens_total,
       min(c - n_chars)::BIGINT AS first_offset
FROM cs GROUP BY 1
"""


@register("sequence_packing", PACKING_ORACLE)
def q_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Offset-based packing of documents into 2000-token training bins, built on
    a two-pass distributed prefix sum (range repartition → local window →
    broadcast partition offsets) — never the single-partition global-window
    trap. Emits the per-bin fill report (operators/sampling.pack_sequences)."""
    from airflow_courier_payout_ledger_pipeline_spark.operators.sampling import (
        pack_sequences,
        pack_stats,
    )

    docs = load_tables(spark, sf_dir, "documents")["documents"]
    packed = pack_sequences(
        docs.select("doc_id", "n_chars"), "doc_id", "n_chars", target=2000
    )
    return pack_stats(packed, "n_chars")


INCREMENTAL_DEDUP_ORACLE = f"""
WITH f AS (SELECT doc_id, md5({NORM}) AS fp FROM documents),
corpus AS (SELECT DISTINCT fp FROM f WHERE doc_id % 5 != 0),
inc AS (SELECT doc_id AS id, fp FROM f WHERE doc_id % 5 = 0),
firsts AS (SELECT fp, min(id) AS first_id FROM inc GROUP BY 1)
SELECT i.id, i.fp,
       (c.fp IS NOT NULL) AS dup_of_corpus,
       (i.id != fi.first_id) AS dup_within_increment,
       (c.fp IS NULL AND i.id = fi.first_id) AS keep
FROM inc i
LEFT JOIN corpus c ON i.fp = c.fp
JOIN firsts fi ON i.fp = fi.fp
"""


@register("dedup_incremental", INCREMENTAL_DEDUP_ORACLE)
def q_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nightly-increment dedup against a persisted corpus fingerprint index
    (every 5th doc stands in for the increment): flags corpus dups and
    within-increment dups without ever reading corpus text — the O(increment)
    pattern that replaces full re-dedup at 100 TB
    (operators/dedup.incremental_exact_dedup)."""
    from airflow_courier_payout_ledger_pipeline_spark.operators.dedup import (
        exact_dedup_groups,
        incremental_exact_dedup,
    )

    docs = load_tables(spark, sf_dir, "documents")["documents"]
    corpus = docs.filter(F.col("doc_id") % 5 != 0)
    incoming = docs.filter(F.col("doc_id") % 5 == 0)
    corpus_fp = exact_dedup_groups(corpus, "doc_id", "text").select("fp")
    return incremental_exact_dedup(incoming, corpus_fp, "doc_id", "text")


# =====================================================================================
# Round-10 additions: incremental z-order compaction (operators/layout.py) and the
# end-to-end pretraining-shard job (chunk -> pack -> shard-layout composition)
# =====================================================================================

ZCOMPACT_FILE_ROWS = 512

ZCOMPACT_ORACLE = f"""
WITH d AS (
    SELECT event_id, ts::DATE AS day,
           (user_id % 1024)::BIGINT AS x,
           (hour(ts) * 60 + minute(ts))::BIGINT AS y
    FROM events
),
z AS (
    SELECT event_id, day, x, y, ({morton_sql(["x", "y"], bits=11)})::BIGINT AS zvalue
    FROM d
),
r AS (
    SELECT event_id, day, zvalue,
           row_number() OVER (PARTITION BY day ORDER BY zvalue, x, y, event_id) AS rn
    FROM z
)
SELECT event_id, day, zvalue, rn::BIGINT AS pos,
       ((rn - 1) // {ZCOMPACT_FILE_ROWS})::INT AS file_id
FROM r
"""


@register("zorder_incremental_compaction", ZCOMPACT_ORACLE)
def q_zorder_incremental_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental z-order compaction
    (``operators/layout.incremental_zorder_compaction``): the nightly
    increment (here: even-id events of the last 3 days — late-arriving rows
    that OVERLAP already-compacted day partitions) lands append-only, then
    compaction re-runs the deterministic z-ordered file layout ONLY for the
    touched day partitions; untouched days keep their layout verbatim. The
    ORACLE is the FULL REBUILD over all events — the hash match IS the
    equivalence proof that re-clustering only affected partitions yields the
    exact layout a from-scratch rebuild would (licensed by the layout being
    a pure function of each day's rowset: rank by (z, x, y, id), files cut
    every {ZCOMPACT_FILE_ROWS} rows — no sampled range boundaries anywhere).
    Scale shape: affected-day list is broadcast to an anti/semi-join split,
    so compaction cost is O(touched partitions) not O(table) — at 100 TB the
    nightly pass reads ~days_touched/365ths of the table; per-day window
    sorts only, never a global sort. Row-group pruning on BOTH x and y after
    the layout is asserted in tests/test_layout.py."""
    from airflow_courier_payout_ledger_pipeline_spark.operators.layout import (
        incremental_zorder_compaction,
    )

    ev = load_tables(spark, sf_dir, "events")["events"]
    d = ev.select(
        "event_id",
        F.to_date("ts").alias("day"),
        F.pmod(F.col("user_id"), F.lit(1024)).cast("long").alias("x"),
        (F.hour("ts") * 60 + F.minute("ts")).cast("long").alias("y"),
    )
    # simulate the append: the last 3 days' even event ids are "tonight's"
    # rows. The cutoff is a collected 1-row bound (the watermark-cursor
    # pattern — O(1) driver data): a broadcast-crossJoin bound would re-execute
    # the bounds agg in BOTH branch subtrees (+4 exchanges measured at
    # sf0.001), and a literal keeps base/inc as plain pushdown-able filters
    import datetime  # noqa: PLC0415

    maxd = d.agg(F.max("day")).collect()[0][0]
    if maxd is None:  # cold start: no events -> empty increment, empty base
        cutoff = datetime.date(1970, 1, 1)
    else:
        cutoff = maxd - datetime.timedelta(days=2)
    is_inc = (F.col("day") >= F.lit(cutoff)) & (F.col("event_id") % 2 == 0)
    inc = d.filter(is_inc)
    base = d.filter(~is_inc)
    out = incremental_zorder_compaction(
        base,
        inc,
        "day",
        ["x", "y"],
        bits=11,
        rows_per_file=ZCOMPACT_FILE_ROWS,
        tiebreak=["event_id"],
    )
    return out.select("event_id", "day", "zvalue", "pos", "file_id")


E2E_TARGET = 256
E2E_SHARDS = 8
E2E_MULT = 100_000

SHARDS_E2E_ORACLE = f"""
WITH norm AS (
    SELECT doc_id, string_split({NORM}, ' ') AS ws
    FROM documents WHERE text IS NOT NULL AND {NORM} != ''
),
szn AS (SELECT doc_id, len(ws) AS n FROM norm),
c AS (
    SELECT doc_id, n,
           unnest(generate_series(
               0,
               CASE WHEN n <= {CHUNK_W} THEN 0
                    ELSE (n - {CHUNK_W} + {CHUNK_S - 1}) // {CHUNK_S} END
           )) AS j
    FROM szn
),
ck AS (
    SELECT doc_id, j::BIGINT AS chunk_id,
           (least(j * {CHUNK_S} + {CHUNK_W}, n) - j * {CHUNK_S})::BIGINT AS n_tokens,
           (doc_id * {E2E_MULT} + j)::BIGINT AS ck_id
    FROM c
),
cs AS (
    SELECT *, SUM(n_tokens) OVER (ORDER BY ck_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
    FROM ck
),
p AS (
    SELECT doc_id, chunk_id, n_tokens,
           (cum - n_tokens)::BIGINT AS start_offset,
           ((cum - n_tokens) // {E2E_TARGET})::BIGINT AS bin_id
    FROM cs
),
bins AS (SELECT DISTINCT bin_id FROM p),
lay AS (
    SELECT bin_id, md5(bin_id::VARCHAR) AS pr,
           (('0x' || substr(md5(bin_id::VARCHAR), 1, 4))::BIGINT % {E2E_SHARDS})::INT
               AS shard
    FROM bins
),
shards AS (
    SELECT bin_id, shard,
           row_number() OVER (PARTITION BY shard ORDER BY pr, bin_id)::BIGINT
               AS shard_pos
    FROM lay
)
SELECT p.doc_id, p.chunk_id, p.n_tokens, p.bin_id, p.start_offset,
       s.shard, s.shard_pos
FROM p JOIN shards s USING (bin_id)
"""


@register("training_shards_end_to_end", SHARDS_E2E_ORACLE)
def q_training_shards_end_to_end(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The nightly pretraining-shard job as ONE pipeline — corpus in,
    shard-addressed packed sequences out — pinning the cross-operator grain
    contracts each stage is individually proven on:

      token grain  — ``tokenize.chunk_documents`` cuts 32-token windows,
                     stride 24 (zero shuffles, map-side codegen);
      bin grain    — ``sampling.pack_sequences`` lays chunks out in stable
                     chunk-key order and assigns each to the 256-token bin
                     where it starts (distributed two-pass prefix sum — the
                     only driver traffic is one scalar per partition);
      shard grain  — ``sampling.attach_shard_layout`` addresses each BIN
                     to an append-stable shard + within-shard position (pure
                     md5-of-bin-id function: corpus growth appends new bins
                     without migrating existing ones between shards) — the
                     row-grain form proven ≡ ``training_shard_layout`` over
                     the distinct bins joined back (r18; law-pinned).

    The chunk key ``doc_id·100000 + chunk_id`` keeps the packing order a
    pure BIGINT function of (doc, window) — reproducible in any engine.
    Capacity bound: the multiplier caps docs at 100k chunks (≈ 2.4M tokens
    at stride 24) and doc ids at ~9·10^13 before BIGINT overflow; a corpus
    of longer documents raises the multiplier (both engines take the same
    constant, so the contract stays replayable). The
    whole composition is hash-checked against a single DuckDB replay. Final
    join (chunk grain x bin-grain layout) is keyed by bin_id — sort-merge
    at scale, never a cartesian. What a training pipeline runs nightly;
    reference-free extension (the reference has no text surface)."""
    from airflow_courier_payout_ledger_pipeline_spark.operators.sampling import (
        attach_shard_layout,
        pack_sequences,
    )
    from airflow_courier_payout_ledger_pipeline_spark.operators.tokenize import (
        chunk_documents,
    )

    docs = load_tables(spark, sf_dir, "documents")["documents"]
    chunks = chunk_documents(docs, CHUNK_W, CHUNK_S).select(
        (F.col("doc_id") * E2E_MULT + F.col("chunk_id")).alias("ck_id"),
        "n_tokens",
    )
    packed = pack_sequences(chunks, "ck_id", "n_tokens", E2E_TARGET)
    # r18: the bin layout attaches at chunk grain via attach_shard_layout —
    # row-for-row ≡ the previous distinct → training_shard_layout → join
    # composition (the law is pinned in tests/test_sampling.py), at ONE
    # hash(shard) exchange instead of that chain's three
    return attach_shard_layout(packed, "bin_id", E2E_SHARDS).select(
        F.expr(f"CAST(ck_id DIV {E2E_MULT} AS BIGINT)").alias("doc_id"),
        F.pmod(F.col("ck_id"), F.lit(E2E_MULT)).cast("bigint").alias("chunk_id"),
        F.col("n_tokens").cast("bigint").alias("n_tokens"),
        "bin_id",
        "start_offset",
        "shard",
        "shard_pos",
    )
