"""Operational queries: streaming static enrich, target mix, token budgets, cross-corpus dedup, CDC roundtrip, transitions, mix epochs, substring/BM25 search, CMS heavy hitters & migration.

Split out of the former monolithic queries_ext.py (round 10) so the
changed-file -> re-adjudicate rule schedules only this domain's queries.
Registration side effects: importing this module registers its queries.
"""

from __future__ import annotations
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from airflow_courier_payout_ledger_pipeline_spark.plans.tpch_adapter import load_tables
from airflow_courier_payout_ledger_pipeline_spark.registry import register
from airflow_courier_payout_ledger_pipeline_spark.queries_ext_dedup import BANDS, LSH_MAX_BUCKET, NUM_HASHES, ROWS_PER_BAND, _AGREE_SQL, _BANDS_SQL, _SHINGLES_CTE
from airflow_courier_payout_ledger_pipeline_spark.queries_ext_text import NORM


# =====================================================================================
# Round-4 breadth beyond the full window (r5 rotation candidates — see OPERATORS.md):
# stream-static enrichment, data-derived mix rates, token budgets, cross-corpus probe.
# =====================================================================================

STREAM_STATIC_ORACLE = """
SELECT e.event_id, e.user_id, c.c_name AS user_name,
       c.c_mktsegment AS segment, e.event_type, e.value
FROM events e JOIN customer c ON e.user_id = c.c_custkey
"""


@register("streaming_static_enrich", STREAM_STATIC_ORACLE)
def q_streaming_static_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static enrichment join: an unbounded event stream joined to a
    batch dimension table. Spark plans the static side as a broadcast into
    every micro-batch — no stream state at all (unlike stream-stream joins),
    which is why dimension enrichment is the one join you do freely at any
    scale. Drained with availableNow and hash-checked against the batch SQL
    join — stream ≡ batch on bounded input."""
    from airflow_courier_payout_ledger_pipeline_spark.streaming.events import (
        read_event_stream,
        run_available_now,
    )

    stream = read_event_stream(spark, sf_dir)
    cust = load_tables(spark, sf_dir, "customer")["customer"].select(
        F.col("c_custkey").alias("user_id"),
        F.col("c_name").alias("user_name"),
        F.col("c_mktsegment").alias("segment"),
    )
    enriched = stream.join(F.broadcast(cust), "user_id").select(
        "event_id", "user_id", "user_name", "segment", "event_type", "value"
    )
    return run_available_now(enriched, "drv_stream_static")


# Target mix: named sources get explicit shares, the long tail splits the rest
# evenly. Rates are DERIVED from the actual per-source counts (two small aggs),
# not hard-coded — the operator a training-mix planner actually runs.
_MIX_SHARES = {"src0": 0.4, "src1": 0.2, "src2": 0.1}
_MIX_OTHER = 0.3 / 17  # remaining share split across the 17 tail sources

# all share arithmetic in IEEE doubles in BOTH engines — bare 0.3/17 would be
# DECIMAL division in DuckDB (different truncation than Spark's double math)
TARGET_MIX_ORACLE = f"""
WITH counts AS (SELECT source, count(*) AS n_s FROM documents GROUP BY 1),
tot AS (SELECT SUM(n_s)::BIGINT AS n FROM counts),
rates AS (
    SELECT source, n_s,
           least(1.0::DOUBLE, ((CASE source
                         WHEN 'src0' THEN 0.4 WHEN 'src1' THEN 0.2 WHEN 'src2' THEN 0.1
                         ELSE 0.3::DOUBLE / 17 END)::DOUBLE
                       * (tot.n // 2)) / n_s) AS rate
    FROM counts, tot
),
kept AS (
    SELECT d.source,
           CASE WHEN ('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 4))::BIGINT
                     < floor(r.rate * 65536) THEN 1 ELSE 0 END AS keep
    FROM documents d JOIN rates r USING (source)
)
SELECT r.source, r.n_s AS n_candidates, SUM(k.keep)::BIGINT AS n_kept,
       round(r.rate, 6) AS applied_rate
FROM kept k JOIN rates r USING (source)
GROUP BY 1, 2, 4
"""


@register("target_mix_sample", TARGET_MIX_ORACLE)
def q_target_mix_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-mix sampling with DATA-DERIVED rates: per-source keep rates are
    computed from target shares × a total budget (half the corpus) over the
    actual per-source counts, then applied as the same deterministic
    md5-threshold predicate ``stratified_sample`` uses. The rates table is
    tiny (|sources| rows, broadcast); the corpus pass stays a zero-shuffle
    map-side filter. Up-capped at 1.0 — a source smaller than its target share
    contributes everything it has."""
    docs = load_tables(spark, sf_dir, "documents")["documents"]
    counts = docs.groupBy("source").agg(F.count("*").alias("n_s"))
    total = counts.agg(F.sum("n_s").cast("bigint").alias("n"))
    share = F.coalesce(
        *[
            F.when(F.col("source") == s, F.lit(v))
            for s, v in _MIX_SHARES.items()
        ],
        F.lit(_MIX_OTHER),
    )
    rates = counts.crossJoin(F.broadcast(total)).select(
        "source",
        "n_s",
        F.least(F.lit(1.0), share * F.expr("n div 2") / F.col("n_s")).alias("rate"),
    )
    draw = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10).cast(
        "long"
    )
    kept = (
        docs.join(F.broadcast(rates), "source")
        .select(
            "source",
            "n_s",
            "rate",
            F.when(draw < F.floor(F.col("rate") * 65536), 1).otherwise(0).alias("keep"),
        )
    )
    return kept.groupBy(
        "source", F.col("n_s").alias("n_candidates"), F.round("rate", 6).alias("applied_rate")
    ).agg(F.sum("keep").cast("bigint").alias("n_kept")).select(
        "source", "n_candidates", "n_kept", "applied_rate"
    )


TOKEN_BUDGET = 30_000  # chars per source (stand-in for a per-domain token budget)

TOKEN_BUDGET_ORACLE = f"""
WITH ordered AS (
    SELECT doc_id, source, n_chars,
           SUM(n_chars) OVER (
               PARTITION BY source
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
               ROWS UNBOUNDED PRECEDING
           ) AS cum
    FROM documents
)
SELECT doc_id, source, (cum - n_chars)::BIGINT AS chars_before
FROM ordered WHERE cum - n_chars < {TOKEN_BUDGET}
"""


@register("token_budget_cap", TOKEN_BUDGET_ORACLE)
def q_token_budget_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source TOKEN-budget cap (the volume twin of per_source_cap's row
    cap): documents admitted in deterministic md5 order until the source's
    budget is spent — a doc is kept iff the budget wasn't already exhausted
    before it. One window per source partition (key-partitioned, never
    global); the md5 order makes the admitted set reproducible across runs
    and cluster sizes."""
    from pyspark.sql.window import Window

    docs = load_tables(spark, sf_dir, "documents")["documents"]
    w = (
        Window.partitionBy("source")
        .orderBy(F.md5(F.col("doc_id").cast("string")), F.col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = docs.select(
        "doc_id",
        "source",
        (F.sum("n_chars").over(w) - F.col("n_chars")).cast("bigint").alias("chars_before"),
    )
    return out.filter(F.col("chars_before") < TOKEN_BUDGET)


CROSS_PROBE_ORACLE = f"""
WITH {_SHINGLES_CTE},
bands AS ({_BANDS_SQL}),
inc_b AS (SELECT id AS inc_id, band, band_hash FROM bands WHERE id % 5 = 0),
cor_b AS (SELECT id AS corpus_id, band, band_hash FROM bands WHERE id % 5 != 0),
hot AS (SELECT DISTINCT band, band_hash FROM inc_b),
matched AS (SELECT c.* FROM cor_b c JOIN hot USING (band, band_hash)),
ok AS (
    SELECT band, band_hash FROM matched
    GROUP BY 1, 2 HAVING count(*) <= {LSH_MAX_BUCKET}
),
capped AS (SELECT m.* FROM matched m JOIN ok USING (band, band_hash)),
pairs AS (
    SELECT DISTINCT i.inc_id, c.corpus_id
    FROM inc_b i JOIN capped c USING (band, band_hash)
)
SELECT p.inc_id, p.corpus_id, ({_AGREE_SQL}) / {NUM_HASHES}.0 AS est_jaccard
FROM pairs p JOIN sig sa ON p.inc_id = sa.id JOIN sig sb ON p.corpus_id = sb.id
"""


@register("dedup_cross_corpus", CROSS_PROBE_ORACLE)
def q_dedup_cross_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental NEAR-dedup: tonight's increment (doc_id % 5 = 0 stands in)
    LSH-probed against the persisted corpus signature index — candidates and
    estimates only for increment×corpus, never corpus×corpus. The increment's
    band hashes are broadcast and the corpus band table is filtered by them
    before any capping or pairing, so the whole probe is O(increment +
    matched), the nightly cost a 100 TB near-dedup actually pays
    (operators/dedup.lsh_probe_pairs; exact-dup twin: dedup_incremental)."""
    from airflow_courier_payout_ledger_pipeline_spark.operators.dedup import (
        lsh_probe_pairs,
        minhash_signatures_inline,
    )

    docs = load_tables(spark, sf_dir, "documents")["documents"]
    sigs = minhash_signatures_inline(docs, "doc_id", "text", k=9, num_hashes=NUM_HASHES)
    inc = sigs.filter(F.col("id") % 5 == 0)
    corpus = sigs.filter(F.col("id") % 5 != 0)
    return lsh_probe_pairs(
        inc, corpus, BANDS, ROWS_PER_BAND, max_bucket=LSH_MAX_BUCKET
    )


CDC_ROUNDTRIP_ORACLE = """
SELECT o_orderkey,
       CASE WHEN o_orderkey % 11 = 0 THEN o_orderstatus || 'X' ELSE o_orderstatus END
           AS status,
       CAST(o_totalprice AS DECIMAL(14,2)) AS price
FROM orders WHERE o_orderkey % 5 != 0
"""


@register("cdc_apply_roundtrip", CDC_ROUNDTRIP_ORACLE)
def q_cdc_apply_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC round-trip law, driver-checked: diff two order snapshots
    (yesterday = keys % 7 != 0; today = keys % 5 != 0 with % 11 == 0 statuses
    mutated), then APPLY the changelog back onto yesterday — the result must
    hash-equal today's snapshot computed directly (the oracle). Proves
    snapshot_diff and apply_changelog are exact inverses over adds, drops,
    changes, and pass-throughs, i.e. ship-the-diff replication reconstructs
    the table exactly (operators/merge.snapshot_diff / apply_changelog)."""
    from airflow_courier_payout_ledger_pipeline_spark.operators.merge import (
        apply_changelog,
        snapshot_diff,
    )

    orders = load_tables(spark, sf_dir, "orders")["orders"].select(
        "o_orderkey",
        F.col("o_orderstatus").alias("status"),
        F.col("o_totalprice").cast("decimal(14,2)").alias("price"),
    )
    old = orders.filter(F.col("o_orderkey") % 7 != 0)
    new = orders.filter(F.col("o_orderkey") % 5 != 0).withColumn(
        "status",
        F.when(
            F.col("o_orderkey") % 11 == 0, F.concat(F.col("status"), F.lit("X"))
        ).otherwise(F.col("status")),
    )
    diff = snapshot_diff(old, new, ["o_orderkey"], ["status", "price"])
    return apply_changelog(old, diff, ["o_orderkey"], ["status", "price"])


TRANSITIONS_ORACLE = """
WITH o AS (
    SELECT user_id, event_type,
           lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS prev_type
    FROM events
)
SELECT prev_type AS from_type, event_type AS to_type, count(*) AS n_transitions
FROM o WHERE prev_type IS NOT NULL
GROUP BY 1, 2
"""


@register("event_transitions", TRANSITIONS_ORACLE)
def q_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-type transition matrix (the Markov-chain input of user-journey
    analysis): per-user lag over (ts, event_id) — deterministic under
    timestamp ties — then one global count per (from, to) pair. The window is
    user-partitioned; the final agg is |types|² rows regardless of SF."""
    from pyspark.sql.window import Window

    events = load_tables(spark, sf_dir, "events")["events"]
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    o = events.select(
        "user_id",
        "event_type",
        F.lag("event_type").over(w).alias("prev_type"),
    )
    return (
        o.filter(F.col("prev_type").isNotNull())
        .groupBy(F.col("prev_type").alias("from_type"), F.col("event_type").alias("to_type"))
        .agg(F.count("*").alias("n_transitions"))
    )


# target token-mix shares for the epochs planner (long-tail sources pooled)
_MIX_TARGET = {"src0": 0.4, "src1": 0.3, "src2": 0.2}
_MIX_TARGET_OTHER = 0.1
_MIX_BUDGET = 1_000_000

# shares carried as integer TENTHS: wanted = budget/10 * tenths stays in exact
# integer arithmetic in both engines (1e6 * 0.3 in binary double is
# 299999.99999999994 and would truncate differently per engine's cast)
MIX_EPOCHS_ORACLE = f"""
WITH r AS (
    SELECT CASE WHEN source IN ('src0','src1','src2') THEN source ELSE 'other' END AS mix_source,
           n_chars,
           CASE source WHEN 'src0' THEN 4 WHEN 'src1' THEN 3 WHEN 'src2' THEN 2 ELSE 1 END AS tenths
    FROM documents
)
SELECT mix_source,
       SUM(n_chars)::BIGINT AS tokens_available,
       ({_MIX_BUDGET} // 10 * max(tenths))::BIGINT AS tokens_wanted,
       round(({_MIX_BUDGET} // 10 * max(tenths))::DOUBLE / SUM(n_chars)::DOUBLE, 4) AS epochs
FROM r GROUP BY 1
"""


@register("mix_epochs_report", MIX_EPOCHS_ORACLE)
def q_mix_epochs_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-mix planning: per target source (long tail pooled as 'other'),
    available tokens vs the tokens a {_MIX_BUDGET}-token training budget wants
    at the target shares, and the implied EPOCH count (wanted/available > 1 =
    the source repeats; the number every mixture decision hangs on). One
    grouped agg over source — the corpus is scanned once, n_chars only."""
    docs = load_tables(spark, sf_dir, "documents")["documents"]
    pooled = F.when(
        F.col("source").isin(*_MIX_TARGET), F.col("source")
    ).otherwise(F.lit("other"))
    tenths = (
        F.when(F.col("source") == "src0", F.lit(4))
        .when(F.col("source") == "src1", F.lit(3))
        .when(F.col("source") == "src2", F.lit(2))
        .otherwise(F.lit(1))
    )
    # integer-exact: budget/10 * tenths (a double 1e6*0.3 would truncate to
    # 299999 on cast; the oracle mirrors the same integer form)
    wanted = (F.lit(_MIX_BUDGET // 10) * F.max(tenths)).cast("bigint")
    return (
        docs.select(pooled.alias("mix_source"), F.col("n_chars"), F.col("source"))
        .groupBy("mix_source")
        .agg(
            F.sum("n_chars").cast("bigint").alias("tokens_available"),
            wanted.alias("tokens_wanted"),
            F.round(
                wanted.cast("double") / F.sum("n_chars").cast("double"), 4
            ).alias("epochs"),
        )
    )


SUBSTRING_SEARCH_ORACLE = """
SELECT doc_id, strpos(text, 'batch stream')::INT AS first_pos
FROM documents WHERE contains(text, 'batch stream')
"""


@register("substring_search", SUBSTRING_SEARCH_ORACLE)
def q_substring_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus grep through a trigram inverted index (pg_trgm layout): the
    needle's posting lists intersect to a candidate set, and only candidates
    are read for exact verification — contaminated-phrase / PII-string search
    over 100 TB without a per-query full scan. The oracle states the naive
    full-scan contains(); the indexed plan must return the identical rows
    (operators/search.substring_search)."""
    from airflow_courier_payout_ledger_pipeline_spark.operators.search import (
        substring_search,
    )

    docs = load_tables(spark, sf_dir, "documents")["documents"]
    return substring_search(docs, "batch stream")


# The idf is the raw Robertson odds (N - df + 0.5)/(df + 0.5) — monotone in
# the textbook ln-idf but free of ln(), which is not bit-specified across
# engines (same discipline as TERM_IMPORTANCE_ORACLE). Per-term scores fold in
# FIXED query-term order (float + is non-associative; SUM() in engine order
# would not reproduce). Constants are exact-double identities (2.2 == 1.2+1.0,
# 0.25 == 1.0-0.75 bit-exact; DuckDB DECIMAL→DOUBLE is correctly rounded).
BM25_ORACLE = f"""
WITH tok AS (
    SELECT doc_id, unnest(string_split({NORM}, ' ')) AS term FROM documents
),
t AS (SELECT * FROM tok WHERE term != ''),
dl AS (SELECT doc_id, count(*)::BIGINT AS dl FROM t GROUP BY 1),
st AS (SELECT count(*)::BIGINT AS n_docs, sum(dl)::BIGINT AS sum_dl FROM dl),
qtf AS (
    SELECT doc_id, term, count(*)::BIGINT AS tf FROM t
    WHERE term IN ('vector', 'stream', 'hash') GROUP BY 1, 2
),
dfq AS (SELECT term, count(DISTINCT doc_id)::BIGINT AS df FROM qtf GROUP BY 1),
sc AS (
    SELECT q.doc_id, q.term,
           (((st.n_docs - dfq.df)::DOUBLE + 0.5) / (dfq.df::DOUBLE + 0.5))
           * ((q.tf::DOUBLE * 2.2) /
              (q.tf::DOUBLE + 1.2 * (0.25 + (0.75 * dl.dl::DOUBLE)
                                            / (st.sum_dl::DOUBLE / st.n_docs::DOUBLE)))) AS score
    FROM qtf q JOIN dl USING (doc_id) JOIN dfq USING (term) CROSS JOIN st
),
pd AS (
    SELECT doc_id,
           coalesce(max(CASE WHEN term = 'vector' THEN score END), 0.0)
           + coalesce(max(CASE WHEN term = 'stream' THEN score END), 0.0)
           + coalesce(max(CASE WHEN term = 'hash' THEN score END), 0.0) AS bm25,
           count(DISTINCT term)::INT AS n_terms_hit
    FROM sc GROUP BY 1
),
r AS (SELECT *, row_number() OVER (ORDER BY bm25 DESC, doc_id)::INT AS rank FROM pd)
SELECT doc_id, bm25, n_terms_hit, rank FROM r WHERE rank <= 10
"""


@register("bm25_search", BM25_ORACLE)
def q_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25-ranked top-10 retrieval for the query {vector, stream, hash} — the
    ranked-retrieval primitive behind contamination lookup and dedup-by-
    retrieval. Scale shape (operators/search.bm25_topk): query-term postings
    filtered BEFORE the tf shuffle, df broadcast, global top-k via
    TakeOrderedAndProject (per-partition heaps), never a corpus-wide
    single-partition window; the oracle reconstructs the identical
    fixed-order float fold."""
    from airflow_courier_payout_ledger_pipeline_spark.operators.search import bm25_topk

    docs = load_tables(spark, sf_dir, "documents")["documents"]
    return bm25_topk(docs, ["vector", "stream", "hash"], k=10)


#: (kind, documents stat) -> committed BM25 index lake. The postings layout
#: is a PERSISTED deployment artifact (the annindex economics: tokenize once
#: at build, serve every query from committed postings) — re-building per
#: registered-query call would re-pay the corpus tokenization each time the
#: bench or driver touches an indexed variant. Keyed by the source parquet's
#: stat so a testdata rewrite invalidates instead of serving stale postings.
_BM25_INDEX_LAKES: dict[tuple, object] = {}


def _docs_stat_key(sf_dir: str) -> tuple[str, int, int]:
    import os

    from airflow_courier_payout_ledger_pipeline_spark.idxcache import stat_key

    return stat_key(os.path.join(sf_dir, "documents.parquet"))


def _evict_superseded_lakes(kind: str, stat_key: tuple) -> None:
    """A changed source parquet (same path, new size/mtime) supersedes every
    cached index built from its old bytes: drop those entries AND their
    mkdtemp roots (the r14 ADVICE disk/dict leak). One shared definition
    with queries_ext_similarity — see ``idxcache.evict_superseded``."""
    from airflow_courier_payout_ledger_pipeline_spark.idxcache import evict_superseded

    evict_superseded(_BM25_INDEX_LAKES, kind, stat_key)


def _fresh_index_lake(prefix: str):
    """A Lakehouse on a mkdtemp root removed at process exit — see
    ``idxcache.fresh_scratch_lake`` (the shared definition)."""
    from airflow_courier_payout_ledger_pipeline_spark.idxcache import fresh_scratch_lake

    return fresh_scratch_lake(prefix)


def _bm25_index_lake(
    docs: DataFrame, sf_dir: str, split: bool, compacted: bool = False
):
    """The committed postings index over this SF's documents table — built
    once per process (and per parquet mtime). ``split=False`` builds over
    the full corpus; ``split=True`` builds on even doc_ids and extends with
    the odds (the living-index form — multi-file postings/doclen versions);
    ``compacted=True`` additionally runs ``compact_bm25_index`` after the
    extend (the maintenance-schedule form — the multi-file versions folded
    back to single term-clustered snapshots)."""
    from airflow_courier_payout_ledger_pipeline_spark.operators.textindex import (
        build_bm25_index,
        compact_bm25_index,
        extend_bm25_index,
    )

    kind = "bm25_index" + ("_split" if split else "") + ("_compacted" if compacted else "")
    key = (kind, _docs_stat_key(sf_dir))
    if key not in _BM25_INDEX_LAKES:
        _evict_superseded_lakes(kind, key[1])
        if compacted:
            # derive from the cached LIVING lake (clone dirs + compact) —
            # one build+extend per rail per process, not two (r15 verdict
            # item 6); parity is unchanged because compaction is layout
            from airflow_courier_payout_ledger_pipeline_spark.idxcache import (
                derive_scratch_lake,
            )

            living = _bm25_index_lake(docs, sf_dir, split=split, compacted=False)
            lake = derive_scratch_lake(living, "bm25_idx_cmp_")
            compact_bm25_index(lake, "idx", docs.sparkSession)
        else:
            lake = _fresh_index_lake("bm25_idx_")
            if split:
                build_bm25_index(lake, "idx", docs.filter(F.col("doc_id") % 2 == 0))
                extend_bm25_index(lake, "idx", docs.filter(F.col("doc_id") % 2 == 1))
            else:
                build_bm25_index(lake, "idx", docs)
        _BM25_INDEX_LAKES[key] = lake
    return _BM25_INDEX_LAKES[key]


def _vacuumed_lake(base_lake, kind: str, sf_dir: str, prefix: str):
    """The stat-memoized cache entry around ``idxcache.vacuumed_scratch_lake``
    (clone the compacted lake + full retention sweep + raise-on-no-op — one
    shared definition with the ANN rail). No emptiness probe needed on the
    lexical rails: build and extend each commit a manifest even on an empty
    corpus, so the sweep always reclaims at least the pre-compaction
    manifests."""
    kind = kind + "_vacuumed"
    key = (kind, _docs_stat_key(sf_dir))
    if key not in _BM25_INDEX_LAKES:
        _evict_superseded_lakes(kind, key[1])
        from airflow_courier_payout_ledger_pipeline_spark.idxcache import (
            vacuumed_scratch_lake,
        )

        _BM25_INDEX_LAKES[key] = vacuumed_scratch_lake(base_lake, prefix, kind)
    return _BM25_INDEX_LAKES[key]


@register("bm25_search_indexed", BM25_ORACLE)
def q_bm25_search_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-10 served from the PERSISTED postings index
    (operators/textindex.bm25_search_indexed) — the lexical twin of
    `ann_index_persisted_search`: tokenization is paid ONCE at build into
    term-clustered (term, doc_id, tf, dl) postings published by one manifest
    flip, and a query reads term-pruned postings + the bounded df/stats
    tables, never the corpus. BIT-identical to `bm25_search`'s live scorer
    (shared `_bm25_rank_tail`, exact integer inputs) — hash-checked against
    the SAME oracle, which is the claim: the index is layout, never
    semantics. At 100 TB the query-time cost drops from a corpus token pass
    to ≤Σdf(term) posting rows."""
    from airflow_courier_payout_ledger_pipeline_spark.operators.textindex import (
        bm25_search_indexed,
    )

    docs = load_tables(spark, sf_dir, "documents")["documents"]
    lake = _bm25_index_lake(docs, sf_dir, split=False)
    return bm25_search_indexed(lake, "idx", spark, ["vector", "stream", "hash"], k=10)


@register("substring_search_indexed", SUBSTRING_SEARCH_ORACLE)
def q_substring_search_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus grep with the trigram probe served from the COMMITTED index —
    the substring rail's steady-state (operators/textindex: build once,
    extend O(increment) on the multi-file manifest rail, probe from
    trigram-clustered committed postings). The living-index form is proven
    here end to end: build on the even-id half, `extend_trigram_index`
    folds the odd half in, and the search must return the identical rows to
    the naive full-scan contains() oracle — index lag is ZERO here by
    construction, which is the extend law in query form. Only the
    candidates read text; the corpus is never shingled at query time."""
    from airflow_courier_payout_ledger_pipeline_spark.operators.textindex import (
        substring_search_indexed,
    )

    docs = load_tables(spark, sf_dir, "documents")["documents"]
    lake = _trigram_index_lake(docs, sf_dir)
    return substring_search_indexed(lake, "idx", docs, "batch stream")


def _trigram_index_lake(docs: DataFrame, sf_dir: str, compacted: bool = False):
    """The committed trigram index over this SF's documents table, living-
    index form (build even ids, extend odd ids), stat-memoized like the BM25
    lakes; ``compacted=True`` additionally folds the per-extend version dirs
    with ``compact_trigram_index`` (the maintenance-schedule form)."""
    from airflow_courier_payout_ledger_pipeline_spark.operators.textindex import (
        build_trigram_index,
        compact_trigram_index,
        extend_trigram_index,
    )

    kind = "trigram_index" + ("_compacted" if compacted else "")
    key = (kind, _docs_stat_key(sf_dir))
    if key not in _BM25_INDEX_LAKES:
        _evict_superseded_lakes(kind, key[1])
        if compacted:
            # derive from the cached living lake — see _bm25_index_lake
            from airflow_courier_payout_ledger_pipeline_spark.idxcache import (
                derive_scratch_lake,
            )

            living = _trigram_index_lake(docs, sf_dir, compacted=False)
            lake = derive_scratch_lake(living, "tg_idx_cmp_")
            compact_trigram_index(lake, "idx", docs.sparkSession)
        else:
            lake = _fresh_index_lake("tg_idx_")
            build_trigram_index(lake, "idx", docs.filter(F.col("doc_id") % 2 == 0))
            extend_trigram_index(lake, "idx", docs.filter(F.col("doc_id") % 2 == 1))
        _BM25_INDEX_LAKES[key] = lake
    return _BM25_INDEX_LAKES[key]


@register("substring_search_compacted", SUBSTRING_SEARCH_ORACLE)
def q_substring_search_compacted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The trigram rail's COMPACTION law in query form (r15): build on the
    even ids, extend with the odds (two version dirs per table), then
    `textindex.compact_trigram_index` folds both lists back to single
    tg-clustered snapshots in one manifest flip — and the probe over the
    compacted index must still return the identical rows to the naive
    full-scan contains() oracle. With `substring_search_indexed` (the
    pre-compaction form, same oracle) this puts the whole maintenance cycle
    — build -> extend -> compact -> serve — under driver evidence, not just
    unit tests: compaction is layout, never semantics."""
    from airflow_courier_payout_ledger_pipeline_spark.operators.textindex import (
        substring_search_indexed,
    )

    docs = load_tables(spark, sf_dir, "documents")["documents"]
    lake = _trigram_index_lake(docs, sf_dir, compacted=True)
    return substring_search_indexed(lake, "idx", docs, "batch stream")


@register("bm25_search_compacted", BM25_ORACLE)
def q_bm25_search_compacted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The BM25 postings rail's COMPACTION law in query form (r15): build on
    the even ids, extend with the odds (multi-file postings/doclen
    versions), `textindex.compact_bm25_index` re-clusters both tables to
    single term-sorted snapshots, and the search over the compacted index
    must stay BIT-identical to the live scorer — the same full-corpus
    oracle as `bm25_search` / `bm25_search_indexed` /
    `bm25_index_incremental_extend`, now also covering the maintenance
    schedule's rewrite. Equality is the license to run compaction at all:
    the fold may touch O(corpus) bytes but may never move a score."""
    from airflow_courier_payout_ledger_pipeline_spark.operators.textindex import (
        bm25_search_indexed,
    )

    docs = load_tables(spark, sf_dir, "documents")["documents"]
    lake = _bm25_index_lake(docs, sf_dir, split=True, compacted=True)
    return bm25_search_indexed(lake, "idx", spark, ["vector", "stream", "hash"], k=10)


@register("bm25_search_vacuumed", BM25_ORACLE)
def q_bm25_search_vacuumed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The RETENTION verb on the BM25 rail (r16, completing the maintenance
    matrix: extend/compact/retention × ANN/BM25/trigram all carry driver
    evidence): after build → extend → compact, the full retention policy
    runs (`Lakehouse.retention_sweep(keep_manifests=1, keep_versions=1)` —
    the pre-compaction manifests and the postings/doclen dirs they pinned
    are DELETED; the serve raises if nothing was reclaimable), and the
    search over what remains must stay BIT-identical to the live scorer —
    the SAME full-corpus oracle as every other bm25 form. Retention deletes
    history, never the serving surface."""
    from airflow_courier_payout_ledger_pipeline_spark.operators.textindex import (
        bm25_search_indexed,
    )

    docs = load_tables(spark, sf_dir, "documents")["documents"]
    base = _bm25_index_lake(docs, sf_dir, split=True, compacted=True)
    lake = _vacuumed_lake(base, "bm25_index_split_compacted", sf_dir, "bm25_idx_vac_")
    return bm25_search_indexed(lake, "idx", spark, ["vector", "stream", "hash"], k=10)


@register("substring_search_vacuumed", SUBSTRING_SEARCH_ORACLE)
def q_substring_search_vacuumed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The RETENTION verb on the trigram rail (r16 — see
    `bm25_search_vacuumed`): clone the compacted index, run
    `retention_sweep(keep_manifests=1, keep_versions=1)` (real deletions,
    raise-on-no-op), and the probe over the surviving snapshot must return
    the identical rows to the naive full-scan contains() oracle."""
    from airflow_courier_payout_ledger_pipeline_spark.operators.textindex import (
        substring_search_indexed,
    )

    docs = load_tables(spark, sf_dir, "documents")["documents"]
    base = _trigram_index_lake(docs, sf_dir, compacted=True)
    lake = _vacuumed_lake(base, "trigram_index_compacted", sf_dir, "tg_idx_vac_")
    return substring_search_indexed(lake, "idx", docs, "batch stream")


@register("bm25_index_incremental_extend", BM25_ORACLE)
def q_bm25_index_incremental_extend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The postings index as a LIVING artifact: build on the even-id half of
    the corpus (standing in for history), `textindex.extend_bm25_index`
    folds the odd-id half in at O(increment) compute AND write (new docs'
    postings/doclen dirs append as multi-file manifest versions — the r14
    codes-rail protocol; termstats/stats fold by exact integer addition),
    then the search over the extended index must be indistinguishable from
    one built on the whole corpus — hash-checked against the SAME
    full-corpus oracle as `bm25_search`, exactly the claim that licenses
    nightly O(increment) upkeep instead of nightly re-tokenization at
    100 TB."""
    from airflow_courier_payout_ledger_pipeline_spark.operators.textindex import (
        bm25_search_indexed,
    )

    docs = load_tables(spark, sf_dir, "documents")["documents"]
    lake = _bm25_index_lake(docs, sf_dir, split=True)
    return bm25_search_indexed(lake, "idx", spark, ["vector", "stream", "hash"], k=10)


# RRF fold: FIXED leg order (lexical + semantic), each term one correctly-
# rounded IEEE division with exact-integer operands (60 + rank) — the same
# cross-engine bit-reproducibility discipline as BM25_ORACLE. The two legs
# share the testdata contract doc_id == vec_id (documents row i embeds to
# embeddings row i).
HYBRID_RRF_ORACLE = f"""
WITH tok AS (
    SELECT doc_id, unnest(string_split({NORM}, ' ')) AS term FROM documents
),
t AS (SELECT * FROM tok WHERE term != ''),
dl AS (SELECT doc_id, count(*)::BIGINT AS dl FROM t GROUP BY 1),
st AS (SELECT count(*)::BIGINT AS n_docs, sum(dl)::BIGINT AS sum_dl FROM dl),
qtf AS (
    SELECT doc_id, term, count(*)::BIGINT AS tf FROM t
    WHERE term IN ('vector', 'stream', 'hash') GROUP BY 1, 2
),
dfq AS (SELECT term, count(DISTINCT doc_id)::BIGINT AS df FROM qtf GROUP BY 1),
sc AS (
    SELECT q.doc_id, q.term,
           (((st.n_docs - dfq.df)::DOUBLE + 0.5) / (dfq.df::DOUBLE + 0.5))
           * ((q.tf::DOUBLE * 2.2) /
              (q.tf::DOUBLE + 1.2 * (0.25 + (0.75 * dl.dl::DOUBLE)
                                            / (st.sum_dl::DOUBLE / st.n_docs::DOUBLE)))) AS score
    FROM qtf q JOIN dl USING (doc_id) JOIN dfq USING (term) CROSS JOIN st
),
pd AS (
    SELECT doc_id,
           coalesce(max(CASE WHEN term = 'vector' THEN score END), 0.0)
           + coalesce(max(CASE WHEN term = 'stream' THEN score END), 0.0)
           + coalesce(max(CASE WHEN term = 'hash' THEN score END), 0.0) AS bm25
    FROM sc GROUP BY 1
),
lexr AS (SELECT doc_id, row_number() OVER (ORDER BY bm25 DESC, doc_id)::INT AS lex_rank FROM pd),
lex AS (SELECT * FROM lexr WHERE lex_rank <= 30),
qv AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id = 7),
sv AS (
    SELECT c.vec_id AS doc_id,
           round(list_cosine_similarity(qv.embedding::DOUBLE[], c.embedding::DOUBLE[]), 4) AS sim
    FROM embeddings c, qv WHERE c.vec_id != qv.vec_id
),
semr AS (SELECT doc_id, row_number() OVER (ORDER BY sim DESC, doc_id)::INT AS sem_rank FROM sv),
sem AS (SELECT * FROM semr WHERE sem_rank <= 30),
fused AS (
    SELECT coalesce(lex.doc_id, sem.doc_id) AS doc_id, lex.lex_rank, sem.sem_rank,
           coalesce(CAST(1.0 AS DOUBLE) / (CAST(60 AS DOUBLE) + lex.lex_rank::DOUBLE), CAST(0.0 AS DOUBLE))
           + coalesce(CAST(1.0 AS DOUBLE) / (CAST(60 AS DOUBLE) + sem.sem_rank::DOUBLE), CAST(0.0 AS DOUBLE)) AS rrf
    FROM lex FULL OUTER JOIN sem ON lex.doc_id = sem.doc_id
),
fr AS (SELECT *, row_number() OVER (ORDER BY rrf DESC, doc_id)::INT AS rank FROM fused)
SELECT doc_id, lex_rank, sem_rank, rrf, rank FROM fr WHERE rank <= 10
"""


@register("hybrid_search_rrf", HYBRID_RRF_ORACLE)
def q_hybrid_search_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval: reciprocal-rank fusion (rrf_k=60) of the BM25 top-30
    for {vector, stream, hash} and the exact cosine top-30 around query vector
    7, fused over the doc_id == vec_id contract — the two-tower hybrid search
    behind RAG corpus probes where lexical or semantic alone misses. Scale
    shape (operators/search.hybrid_rrf_topk): both legs are k-bounded global
    top-n (TakeOrderedAndProject / broadcast-query heap), so the fusion joins
    two ≤30-row frames — driver-scale regardless of corpus size. The oracle
    replays both legs and the fixed-order IEEE rrf fold in one statement."""
    from airflow_courier_payout_ledger_pipeline_spark.operators.search import (
        hybrid_rrf_topk,
    )

    t = load_tables(spark, sf_dir, "documents", "embeddings")
    return hybrid_rrf_topk(
        t["documents"],
        t["embeddings"],
        ["vector", "stream", "hash"],
        query_vec_id=7,
        k=10,
        n_each=30,
    )


# The CMS is internal pruning state: estimates OVERESTIMATE (one-sided error),
# so candidates(est ≥ T) ⊇ true heavy hitters, and the exact verify restores
# equality with the naive oracle — the same prune-then-verify contract as the
# trigram index. The threshold is integer-relative (freq·100 ≥ total tokens):
# no float, scale-invariant across SFs.
HEAVY_HITTERS_ORACLE = f"""
WITH t AS (
    SELECT unnest(string_split({NORM}, ' ')) AS term FROM documents
),
tok AS (SELECT term FROM t WHERE term != '')
SELECT term, count(*)::BIGINT AS freq
FROM tok GROUP BY 1
HAVING count(*) * 100 >= (SELECT count(*) FROM tok)
"""


@register("heavy_hitters", HEAVY_HITTERS_ORACLE)
def q_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent-term mining (all terms with ≥1% of total token mass) through a
    count-min sketch prune: the ≤4×1024-row CMS state is collected (O(1)
    driver state) and the candidate test enters the token scan as a PURE MAP
    PREDICATE — per seed a ``bucket IN (<passing buckets>)`` list, ANDed
    across seeds (operators/sketch.cms_candidate_expr). By mass conservation
    each seed's counts sum to N, so ≤ 100 buckets per seed can carry ≥ 1% of
    mass — the whole predicate is 4 hashes + 4 ≤100-element IN lists, not a
    width-sized literal array per seed (the round-6 construction pathology:
    4×1024 scalar literals cost ~3 s of py4j round-trips per build). The
    candidate set stays a guaranteed superset (CMS error is one-sided), and
    the exact count + filter restore oracle equality. The ONLY post-state
    exchange is the exact count over candidate postings: no ``distinct()``
    vocabulary shuffle before the prune (a 13-gram vocab at 100 TB is
    corpus-sized, so a pre-prune distinct would itself be the bottleneck the
    sketch exists to avoid). The state stays mergeable across increments
    (operators/sketch.cms_state / merge_cms_states)."""
    from airflow_courier_payout_ledger_pipeline_spark.functions.text import normalize_text
    from airflow_courier_payout_ledger_pipeline_spark.operators.sketch import (
        CMS_DEPTH,
        cms_candidate_expr,
        cms_state,
    )

    docs = load_tables(spark, sf_dir, "documents")["documents"]
    toks = docs.select(
        F.explode(F.split(normalize_text(F.col("text")), " ")).alias("term")
    ).filter(F.col("term") != "")
    # one grouped agg builds the ≤4×1024-row state; collect is the same O(1)
    # driver-state bound as watermark cursors / k×dim centroids. The total
    # token count reads off it exactly (Σcnt = depth·N — every token lands in
    # depth buckets), saving a separate corpus count.
    state_rows = cms_state(toks, "term").collect()
    total = sum(r["cnt"] for r in state_rows) // CMS_DEPTH
    # freq*100 >= total  ⟺  freq >= ceil(total/100) for integer freq
    candidate = cms_candidate_expr(state_rows, "term", (total + 99) // 100)
    return (
        toks.filter(candidate)  # map-side prune, zero pre-prune shuffle
        .groupBy("term")
        .agg(F.count("*").cast("bigint").alias("freq"))
        .filter(F.col("freq") * 100 >= F.lit(total))
    )


@register("cms_state_migration", HEAVY_HITTERS_ORACLE)
def q_cms_state_migration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The nightly CMS maintenance shape WITH a legacy artifact in the fold:
    half the corpus's token stream is sketched and persisted-style STRIPPED of
    its width column (a pre-width-schema artifact, exactly what an old
    deployment left behind), the other half is sketched by the current code,
    and the two fold through ``merge_cms_states`` — which stamps the declared
    width onto the legacy side (``stamp_legacy_width``, with its provenance
    warning) and applies the GLOBAL width-mismatch check before bucket-wise
    summing. Because CMS merge is exact integer bucket algebra,
    merged(A) ⊕ merged(B) ≡ build(A ∪ B) row-for-row, so the heavy-hitter
    prune + exact verify over the MERGED state must reproduce
    ``heavy_hitters``'s oracle exactly — the end-to-end proof that folding a
    migrated legacy state loses nothing (the round-8 change previously
    carried only unit-test evidence; ADVICE r8 item 1).

    Scale shape is identical to ``q_heavy_hitters``: ≤ depth×width rows of
    state ever reach the driver, the candidate test enters the scan as a pure
    map predicate, and the only post-state exchange is the exact count over
    candidate postings."""
    import warnings

    from airflow_courier_payout_ledger_pipeline_spark.functions.text import normalize_text
    from airflow_courier_payout_ledger_pipeline_spark.operators.sketch import (
        CMS_DEPTH,
        cms_candidate_expr,
        cms_state,
        merge_cms_states,
    )

    docs = load_tables(spark, sf_dir, "documents")["documents"]
    toks = docs.select(
        "doc_id",
        F.explode(F.split(normalize_text(F.col("text")), " ")).alias("term"),
    ).filter(F.col("term") != "")
    # deterministic doc-grain split: the two halves model yesterday's persisted
    # state (legacy, width column stripped) and tonight's increment (current).
    # Left lazy: the build exchanges are reused across the merge's branches
    # (an eager localCheckpoint pin A/B'd measurably slower at this size)
    legacy = cms_state(toks.filter(F.col("doc_id") % 2 == 0), "term").drop("width")
    current = cms_state(toks.filter(F.col("doc_id") % 2 == 1), "term")
    with warnings.catch_warnings():
        # the stamp's declared-width provenance warning is the POINT here —
        # asserted separately in tests/test_sketch.py; keep driver stderr calm
        warnings.simplefilter("ignore", UserWarning)
        state_rows = merge_cms_states(legacy, current).collect()
    total = sum(r["cnt"] for r in state_rows) // CMS_DEPTH
    candidate = cms_candidate_expr(state_rows, "term", (total + 99) // 100)
    return (
        toks.filter(candidate)
        .groupBy("term")
        .agg(F.count("*").cast("bigint").alias("freq"))
        .filter(F.col("freq") * 100 >= F.lit(total))
    )
