"""Persisted BM25 postings index: the LEXICAL twin of ``operators/annindex``.

``search.bm25_topk`` is the exact one-shot scorer — one token pass over the
corpus per query batch. At 100 TB a retrieval service cannot re-tokenize the
corpus per query; the standard deployment (Lucene/Elasticsearch, and the
repo's own trigram index for substring search) pays tokenization ONCE into a
persisted postings layout and serves every query from term-pruned postings.
This module IS that layout, on the Lakehouse manifest protocol:

- ``bm25_postings`` (term, id, tf, dl) — the only corpus-sized table. dl is
  DENORMALIZED into the posting row (the classic impact-postings trick:
  storing the length norm inline removes the query-time doc-length join
  entirely), written term-clustered (repartition + sortWithinPartitions on
  term) so parquet row-group min/max prune a query's scan to its terms'
  postings;
- ``bm25_doclen`` (id, dl) — one row per tokenized doc; the SCD0 identity
  set for extends and the n_docs/sum_dl source of truth;
- ``bm25_termstats`` (term, df) — vocabulary-sized (df = docs containing the
  term), additive under extension;
- ``bm25_stats`` (n_docs, sum_dl) — ONE row, additive under extension.

All four publish via ONE ``Lakehouse.commit_multi`` manifest flip — a reader
never scores postings against stats they weren't built with (the annindex
crash-window guarantee). ``extend_bm25_index`` appends O(increment): new
docs' postings and doclen rows stage as their OWN version dirs and the
manifest commits MULTI-FILE versions (the r14 codes-rail protocol);
termstats/stats re-stage whole (vocabulary-/single-row-bounded, never
corpus-sized). ``bm25_search_indexed`` reproduces ``search.bm25_topk``
BIT-identically — both run the shared ``_bm25_rank_tail`` on identical
(dl, tf) inputs — so both forms hash-check against the same DuckDB oracle
(the bucketed-flagship "layout, never semantics" pattern).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from airflow_courier_payout_ledger_pipeline_spark.operators.search import (
    _bm25_rank_tail,
    _validated_query_terms,
)
from airflow_courier_payout_ledger_pipeline_spark.sources.lakehouse import Lakehouse

POSTINGS, DOCLEN, TERMSTATS, STATS = (
    "bm25_postings",
    "bm25_doclen",
    "bm25_termstats",
    "bm25_stats",
)

_TERMSTATS_SCHEMA = "term string, df bigint"
_STATS_SCHEMA = "n_docs bigint, sum_dl bigint"

#: per-manifest driver artifacts (the annindex ``_ARTIFACT_CACHE`` rule:
#: committed snapshots are immutable, so the id-field validation, the 1-row
#: corpus stats, and a query's term dfs collect ONCE per manifest, not per
#: search — each entry is O(1)/O(|terms|) driver state, FIFO-capped, keyed
#: (root, layer, manifest id, pointer mtime, ...) so a wiped-and-rebuilt
#: lake can never serve stale artifacts and ``idxcache`` eviction can purge
#: by root prefix).
_IDX_CACHE: dict[tuple, object] = {}
_IDX_CACHE_CAP = 64

#: per-(manifest, query-terms) df lists live in their OWN FIFO (r17 ADVICE):
#: high-cardinality term tuples could otherwise churn the few manifest-level
#: id-field/stats entries out of the shared cache, silently re-paying the
#: footer/stats reads the cache exists to avoid (perf only, never stale —
#: keys still carry the manifest id + pointer mtime).
_TERMS_CACHE: dict[tuple, object] = {}
_TERMS_CACHE_CAP = 64


def _idx_cache_put(key, value) -> None:
    if len(_IDX_CACHE) >= _IDX_CACHE_CAP:
        _IDX_CACHE.pop(next(iter(_IDX_CACHE)))
    _IDX_CACHE[key] = value


def _terms_cache_put(key, value) -> None:
    if len(_TERMS_CACHE) >= _TERMS_CACHE_CAP:
        _TERMS_CACHE.pop(next(iter(_TERMS_CACHE)))
    _TERMS_CACHE[key] = value


def invalidate_idx_caches(root) -> None:
    """Purge this module's per-manifest artifacts for a lakehouse root —
    called from ``annindex.invalidate_artifact_caches`` so one eviction hook
    covers every index rail's driver caches."""
    r = str(root)
    for cache in (_IDX_CACHE, _TERMS_CACHE):
        for k in [k for k in cache if k[0] == r]:
            cache.pop(k, None)


def _validated_id_field(
    lake: Lakehouse, layer: str, table: str, spark: SparkSession, id_col: str, what: str
):
    """The committed ``table``'s FIRST field, validated to carry ``id_col``
    (the annindex by-name-read rule: a silent NULL-id read is worse than a
    raise) — one footer read per (manifest, table, id_col), cached."""
    from airflow_courier_payout_ledger_pipeline_spark.operators.annindex import (
        _manifest_cache_key,
    )

    vs = Lakehouse.as_versions(lake.current_manifest().get(f"{layer}/{table}"))
    if not vs:
        return None
    base = _manifest_cache_key(lake, layer)
    key = None if base is None else (*base, "idfield", table, id_col)
    if key is not None and key in _IDX_CACHE:
        return _IDX_CACHE[key]
    actual = spark.read.parquet(
        str(lake.root / layer / table / f"v={vs[0]}")
    ).schema.fields
    if actual[0].name != id_col:
        raise ValueError(
            f"committed {what} under {layer!r} is keyed by "
            f"{actual[0].name!r}, caller expects {id_col!r} — pass the id_col "
            "the index was BUILT with"
        )
    if key is not None:
        _idx_cache_put(key, actual[0])
    return actual[0]


def _postings_schema(id_field) -> StructType:
    from pyspark.sql.types import LongType, StringType, StructField

    return StructType(
        [
            StructField("term", StringType()),
            id_field,
            StructField("tf", LongType()),
            StructField("dl", LongType()),
        ]
    )


def _doclen_schema(id_field) -> StructType:
    from pyspark.sql.types import LongType, StructField

    return StructType([id_field, StructField("dl", LongType())])


def _tokenize(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """The ONE tokenization both index builds and the live scorer share
    (``normalize_text`` + whitespace split, empties dropped) — a postings
    table built with a different tokenizer would silently score differently."""
    from airflow_courier_payout_ledger_pipeline_spark.functions.text import (
        normalize_text,
    )

    return docs.select(
        F.col(id_col),
        F.explode(F.split(normalize_text(F.col(text_col)), " ")).alias("term"),
    ).filter(F.col("term") != "")


def _index_frames(
    docs: DataFrame, id_col: str, text_col: str
) -> tuple[DataFrame, DataFrame, DataFrame, DataFrame]:
    """(postings, doclen, termstats, stats) for ``docs`` — exact integer
    aggregates only, so extension merges are EXACT (count/sum algebra, the
    ledger-state pattern). Postings land term-clustered for row-group
    pruning."""
    toks = _tokenize(docs, id_col, text_col)
    tf = toks.groupBy(id_col, "term").agg(F.count("*").alias("tf"))
    dl = toks.groupBy(id_col).agg(F.count("*").alias("dl"))
    postings = (
        tf.join(dl, id_col)
        .select("term", F.col(id_col), "tf", "dl")
        .repartition(F.col("term"))
        .sortWithinPartitions("term", id_col)
    )
    termstats = tf.groupBy("term").agg(F.count("*").alias("df"))
    stats = dl.agg(
        F.count("*").alias("n_docs"), F.coalesce(F.sum("dl"), F.lit(0)).alias("sum_dl")
    )
    return postings, dl, termstats, stats


def build_bm25_index(
    lake: Lakehouse,
    layer: str,
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> int:
    """Tokenize the corpus ONCE and publish the four index tables atomically.
    Returns the manifest id. An empty corpus commits a consistent EMPTY
    index (searches return typed-empty) — the annindex cold-start contract;
    there is no quantizer artifact here, so no wipe-guard is needed (a
    rebuild is just the build cost, not a trained-state loss)."""
    postings, dl, termstats, stats = _index_frames(docs, id_col, text_col)
    return lake.commit_multi(
        [
            (postings, layer, POSTINGS),
            (dl, layer, DOCLEN),
            (termstats, layer, TERMSTATS),
            (stats, layer, STATS),
        ]
    )


def extend_bm25_index(
    lake: Lakehouse,
    layer: str,
    increment: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> int:
    """The nightly O(increment) index update, write included: only ids not
    already in the committed doclen set tokenize (SCD0 insert-ignore —
    replaying a crashed extend is a no-op), their postings and doclen rows
    stage as their OWN version dirs (multi-file manifest values — history's
    bytes never rewritten, the r14 codes-rail protocol), and termstats/stats
    fold by EXACT integer addition and re-stage whole (vocabulary-/one-row-
    bounded). One manifest flip publishes all four; ``extend(build(A), B)``
    is row-identical to ``build(A ∪ B)`` on every table (pinned in
    tests/test_textindex.py). Fold the postings/doclen dir lists back to one
    with ``compact_bm25_index`` on the maintenance schedule."""
    if f"{layer}/{DOCLEN}" not in lake.current_manifest():
        raise ValueError(
            f"extend_bm25_index: no committed index under {layer!r} — "
            "build_bm25_index first (extending an index that doesn't exist "
            "would silently build one on the increment alone)"
        )
    spark = increment.sparkSession
    id_field = increment.select(F.col(id_col)).schema.fields[0]
    old_dl = lake.read_committed(spark, layer, DOCLEN, _doclen_schema(id_field))
    new_rows = increment.join(old_dl.select(F.col(id_col)), id_col, "left_anti")
    postings, dl, termstats_d, stats_d = _index_frames(new_rows, id_col, text_col)

    old_ts = lake.read_committed(
        spark, layer, TERMSTATS, StructType.fromDDL(_TERMSTATS_SCHEMA)
    )
    termstats = (
        old_ts.unionByName(termstats_d)
        .groupBy("term")
        .agg(F.sum("df").alias("df"))
    )
    old_st = lake.read_committed(spark, layer, STATS, StructType.fromDDL(_STATS_SCHEMA))
    stats = (
        old_st.unionByName(stats_d)
        .agg(
            F.coalesce(F.sum("n_docs"), F.lit(0)).alias("n_docs"),
            F.coalesce(F.sum("sum_dl"), F.lit(0)).alias("sum_dl"),
        )
    )
    manifest = lake.current_manifest()
    staged = {
        (layer, POSTINGS): Lakehouse.as_versions(manifest.get(f"{layer}/{POSTINGS}"))
        + [lake.stage_version(postings, layer, POSTINGS)],
        (layer, DOCLEN): Lakehouse.as_versions(manifest.get(f"{layer}/{DOCLEN}"))
        + [lake.stage_version(dl, layer, DOCLEN)],
        (layer, TERMSTATS): lake.stage_version(termstats, layer, TERMSTATS),
        (layer, STATS): lake.stage_version(stats, layer, STATS),
    }
    return lake.commit_manifest(staged)


def compact_bm25_index(lake: Lakehouse, layer: str, spark: SparkSession) -> int:
    """Maintenance compaction: fold the postings/doclen multi-file versions
    (one dir per extend) back into single term-clustered snapshots and flip
    the manifest once. O(corpus) by design — the compaction schedule's cost,
    not the nightly's. Re-clusters postings by term, so row-group pruning
    recovers its build-time selectivity after many extends. No-op when both
    tables are already single-dir. ``spark`` is explicit (never a
    ``getActiveSession`` fallback): a maintenance job must run on the
    caller's configured session, not a conjured default."""
    manifest = lake.current_manifest()
    pv = Lakehouse.as_versions(manifest.get(f"{layer}/{POSTINGS}"))
    dv = Lakehouse.as_versions(manifest.get(f"{layer}/{DOCLEN}"))
    # guard EACH table's version list (r15 ADVICE): a manifest with postings
    # but no doclen (or the converse) is inconsistent — raise the named
    # error instead of reaching a zero-path spark.read.parquet
    if not pv or not dv:
        raise ValueError(f"compact_bm25_index: no committed index under {layer!r}")
    mid = lake.current_manifest_id()
    if len(pv) <= 1 and len(dv) <= 1:
        assert mid is not None
        return mid
    postings = spark.read.parquet(
        *[str(lake.root / layer / POSTINGS / f"v={v}") for v in pv]
    ).repartition(F.col("term")).sortWithinPartitions("term")
    dl = spark.read.parquet(*[str(lake.root / layer / DOCLEN / f"v={v}") for v in dv])
    return lake.commit_multi([(postings, layer, POSTINGS), (dl, layer, DOCLEN)])


def bm25_search_indexed(
    lake: Lakehouse,
    layer: str,
    spark: SparkSession,
    query_terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
) -> DataFrame:
    """BM25 top-``k`` served from the COMMITTED postings — what a query costs
    once the tokenization is paid into the index: a term-pruned postings
    scan (parquet row-group min/max on the term-clustered layout; at
    deployment, partition or z-order by term), ONE doc-grain aggregation
    over those ≤Σdf(term) rows pivoting tf per query term (dl rides the
    posting row — no doc-length join), and the shared ``_bm25_rank_tail``
    with df/N/Σdl read from the bounded driver tables. The corpus is never
    tokenized, scanned, or shuffled at query time. Results are BIT-identical
    to ``search.bm25_topk`` over the same corpus (same integer inputs, same
    shared IEEE tail) — hash-checked against the same oracle. Terms absent
    from the vocabulary score like the live path (df = 0, no hits)."""
    terms = _validated_query_terms(query_terms)
    from airflow_courier_payout_ledger_pipeline_spark.operators.annindex import (
        _manifest_cache_key,
    )

    # the committed doclen table's first field carries the id name/type the
    # index was built with; validated-per-manifest (cached footer read)
    id_field = _validated_id_field(lake, layer, DOCLEN, spark, id_col, "BM25 index")
    if id_field is None:
        return _empty_result(spark, id_col)
    base = _manifest_cache_key(lake, layer)
    skey = None if base is None else (*base, "bm25stats")
    stats_val = _IDX_CACHE.get(skey) if skey is not None else None
    if stats_val is None:
        st = lake.read_committed(
            spark, layer, STATS, StructType.fromDDL(_STATS_SCHEMA)
        ).first()
        stats_val = (
            (0, 0) if st is None or not st["n_docs"]
            else (int(st["n_docs"]), int(st["sum_dl"]))
        )
        if skey is not None:
            _idx_cache_put(skey, stats_val)
    n_docs, sum_dl = stats_val
    if not n_docs:
        return _empty_result(spark, id_col, id_field)
    dkey = None if base is None else (*base, "bm25dfs", tuple(terms))
    dfs = _TERMS_CACHE.get(dkey) if dkey is not None else None
    if dfs is None:
        dfmap = {
            r["term"]: int(r["df"])
            for r in lake.read_committed(
                spark, layer, TERMSTATS, StructType.fromDDL(_TERMSTATS_SCHEMA)
            )
            .filter(F.col("term").isin(terms))
            .collect()  # ≤ |terms| rows — driver-bounded, cursor class
        }
        dfs = [dfmap.get(t, 0) for t in terms]
        if dkey is not None:
            _terms_cache_put(dkey, dfs)
    p = lake.read_committed(
        spark, layer, POSTINGS, _postings_schema(id_field)
    ).filter(F.col("term").isin(terms))
    per_doc = p.groupBy(id_col).agg(
        F.max("dl").alias("dl"),  # denormalized per posting row — all equal
        *[
            F.sum(F.when(F.col("term") == t, F.col("tf")).otherwise(0)).alias(
                f"tf_{i}"
            )
            for i, t in enumerate(terms)
        ],
    )
    return _bm25_rank_tail(per_doc, terms, n_docs, sum_dl, dfs, k, k1, b, id_col)


def _empty_result(spark: SparkSession, id_col: str, id_field=None) -> DataFrame:
    """Typed-empty search result. The id type comes from the COMMITTED
    doclen field when one exists (a string-keyed index must return a
    string-typed empty frame, matching the non-empty path); only the
    never-committed cold start — where no committed type exists to honor —
    defaults to long."""
    from pyspark.sql.types import (
        DoubleType,
        IntegerType,
        LongType,
        StructField,
        StructType,
    )

    id_f = id_field if id_field is not None else StructField(id_col, LongType())
    return spark.createDataFrame(
        [],
        StructType(
            [
                id_f,
                StructField("bm25", DoubleType()),
                StructField("n_terms_hit", IntegerType()),
                StructField("rank", IntegerType()),
            ]
        ),
    )


# --- Persisted trigram index (the substring-search rail) ------------------------------
#
# ``search.substring_search`` already takes a prebuilt (id, tg) index frame;
# these helpers make that frame a COMMITTED artifact on the same manifest
# protocol as the postings above, completing the set: every retrieval rail
# (substring / BM25 / ANN) now has a build-once, extend-O(increment),
# serve-from-committed form.

TRIGRAMS, TGDOCS = "tg_postings", "tg_docids"


def _trigram_schema(id_field) -> StructType:
    from pyspark.sql.types import StringType, StructField

    return StructType([id_field, StructField("tg", StringType())])


def _tgdocs_schema(id_field) -> StructType:
    return StructType([id_field])


def build_trigram_index(
    lake: Lakehouse,
    layer: str,
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> int:
    """Publish the (id, trigram) posting pairs plus the indexed-id set in one
    manifest flip. Postings land trigram-clustered (repartition +
    sortWithinPartitions on tg) so a probe's scan prunes to its needle's
    grams by row-group min/max. The id set (``tg_docids``, one row per doc —
    INCLUDING sub-trigram docs, which contribute no postings) is the SCD0
    identity for extends: without it a replayed extend would re-admit a
    short doc forever."""
    from airflow_courier_payout_ledger_pipeline_spark.operators.search import (
        trigram_index,
    )

    idx = (
        trigram_index(docs, id_col, text_col)
        .repartition(F.col("tg"))
        .sortWithinPartitions("tg", id_col)
    )
    ids = docs.select(F.col(id_col)).distinct()
    return lake.commit_multi([(idx, layer, TRIGRAMS), (ids, layer, TGDOCS)])


def extend_trigram_index(
    lake: Lakehouse,
    layer: str,
    increment: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> int:
    """O(increment) upkeep for the trigram rail, write included: only ids
    absent from the committed id set shingle, and both tables append their
    increment dirs as multi-file manifest versions (the codes-rail
    protocol). ``extend(build(A), B) ≡ build(A ∪ B)`` row-identically;
    replay is a no-op (SCD0 on the id set)."""
    if f"{layer}/{TGDOCS}" not in lake.current_manifest():
        raise ValueError(
            f"extend_trigram_index: no committed index under {layer!r} — "
            "build_trigram_index first"
        )
    from airflow_courier_payout_ledger_pipeline_spark.operators.search import (
        trigram_index,
    )

    spark = increment.sparkSession
    id_field = increment.select(F.col(id_col)).schema.fields[0]
    old_ids = lake.read_committed(spark, layer, TGDOCS, _tgdocs_schema(id_field))
    new_rows = increment.join(old_ids, id_col, "left_anti")
    idx = trigram_index(new_rows, id_col, text_col)
    ids = new_rows.select(F.col(id_col)).distinct()
    manifest = lake.current_manifest()
    return lake.commit_manifest(
        {
            (layer, TRIGRAMS): Lakehouse.as_versions(
                manifest.get(f"{layer}/{TRIGRAMS}")
            )
            + [lake.stage_version(idx, layer, TRIGRAMS)],
            (layer, TGDOCS): Lakehouse.as_versions(manifest.get(f"{layer}/{TGDOCS}"))
            + [lake.stage_version(ids, layer, TGDOCS)],
        }
    )


def compact_trigram_index(lake: Lakehouse, layer: str, spark: SparkSession) -> int:
    """Maintenance compaction for the trigram rail — the missing twin of
    ``compact_bm25_index`` / ``annindex.compact_residual_ivfpq_codes``: fold
    the ``tg_postings``/``tg_docids`` multi-file versions (one dir per
    nightly extend) back into single snapshots and flip the manifest once.
    Without it the probe's read fans over an unbounded dir list and the
    per-dir tg-clustering decays global row-group pruning. O(corpus) by
    design — the compaction schedule's cost. Re-clusters postings by tg;
    row-identical by construction (one union-read, one rewrite). No-op
    (returns the current manifest id) when both tables are single-dir."""
    manifest = lake.current_manifest()
    pv = Lakehouse.as_versions(manifest.get(f"{layer}/{TRIGRAMS}"))
    iv = Lakehouse.as_versions(manifest.get(f"{layer}/{TGDOCS}"))
    # guard EACH table's version list (r15 ADVICE): postings without the id
    # set (or the converse) is an inconsistent manifest — raise the named
    # error instead of reaching a zero-path spark.read.parquet
    if not pv or not iv:
        raise ValueError(f"compact_trigram_index: no committed index under {layer!r}")
    mid = lake.current_manifest_id()
    if len(pv) <= 1 and len(iv) <= 1:
        assert mid is not None
        return mid
    idx = spark.read.parquet(
        *[str(lake.root / layer / TRIGRAMS / f"v={v}") for v in pv]
    ).repartition(F.col("tg")).sortWithinPartitions("tg")
    ids = spark.read.parquet(*[str(lake.root / layer / TGDOCS / f"v={v}") for v in iv])
    return lake.commit_multi([(idx, layer, TRIGRAMS), (ids, layer, TGDOCS)])


def substring_search_indexed(
    lake: Lakehouse,
    layer: str,
    docs: DataFrame,
    needle: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """``search.substring_search`` with the probe served from the COMMITTED
    trigram index: posting lists for the needle's grams prune by row-group
    stats, candidates verify exactly against ``docs`` (the only corpus read,
    a broadcast-semi-pruned fetch). Results cover the INDEXED corpus —
    ``docs`` rows not yet extended into the index cannot match (index lag,
    the standard inverted-index contract); sub-trigram needles fall back to
    the full scan exactly as the live operator does."""
    from airflow_courier_payout_ledger_pipeline_spark.operators.search import (
        substring_search,
    )

    spark = docs.sparkSession
    id_field = docs.select(F.col(id_col)).schema.fields[0]
    # the annindex by-name-read rule: raise, never NULL-id reads (validated
    # once per manifest — cached footer read)
    _validated_id_field(lake, layer, TRIGRAMS, spark, id_col, "trigram index")
    idx = lake.read_committed(spark, layer, TRIGRAMS, _trigram_schema(id_field))
    return substring_search(docs, needle, index=idx, id_col=id_col, text_col=text_col)
