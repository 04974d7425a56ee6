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

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def trigram_index(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(trigram, id) distinct pairs — one explode + one distinct shuffle.
    Trigrams are raw character windows (no normalization: search is exact).
    Spread before the explode (dedup._spread): the output is ~chars-per-doc×
    larger than the input, and a corpus read as a handful of files would
    otherwise fan out on a handful of tasks — the same guard char_shingles
    documents."""
    from airflow_courier_payout_ledger_pipeline_spark.operators.dedup import _spread

    return (
        _spread(docs.select(F.col(id_col), F.col(text_col)))
        .select(
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


def bm25_topk(
    docs: DataFrame,
    query_terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """BM25-ranked top-``k`` documents for a bag-of-words query — the retrieval
    primitive behind contamination lookup, RAG corpus probes, and dedup-by-
    retrieval. Returns (id, bm25, n_terms_hit, rank).

    Scale shape: ONE token pass and ONE doc-grain shuffle — per-doc length and
    every query-term tf come out of a single conditional aggregation (map-side
    partials compact the exchange to a row per doc per map task), corpus stats
    (N, Σdl, per-term df) fold into the same plan as a broadcast 1-row
    aggregate over the shared per-doc subtree (ReusedExchange — r18; the
    stats never touch the driver), and scoring is pure map-side projection. Global top-k goes through ``orderBy().limit(k)`` —
    Spark's TakeOrderedAndProject, a per-partition heap + driver merge of
    k×partitions rows — never a single-partition window over the corpus; rank
    is assigned AFTER the limit, over k rows.

    Matching contract: documents tokenize via ``normalize_text`` + whitespace
    split — LOWERCASED, punctuation left ATTACHED ('world!' is one token,
    distinct from 'world'). Query terms are lowercased here to match (an
    uppercase term could otherwise never hit anything); terms containing
    whitespace or empty after normalization raise.

    Cross-engine determinism (the repo's oracle discipline): idf is the raw
    Robertson odds (N - df + 0.5)/(df + 0.5) — PER-TERM monotone in the usual
    ln-idf but free of ``ln()``, which is not bit-specified across engines.
    Note the deliberate trade: a sum of per-term odds is NOT rank-equivalent
    to a sum of per-term ln-odds for MULTI-term queries (a monotone transform
    of addends does not preserve the order of sums — one rare term can outvote
    two common ones here where ln-BM25 would rank the two-hit doc first), so
    this scorer is "odds-BM25", a BM25-family ranking that is bit-reproducible
    across engines rather than ranking-identical to the ln formulation.
    Every float op is a single correctly-rounded IEEE op in a fixed order, and
    the per-term scores fold in FIXED query-term order (float addition is not
    associative; a SUM() in arbitrary order would not reproduce)."""
    query_terms = _validated_query_terms(query_terms)
    from airflow_courier_payout_ledger_pipeline_spark.functions.text import normalize_text

    # NOT spread (r17 A/B): the pre-explode repartition measured +0.3 s at
    # sf0.1 against ~0.1 s of parallelized tokenize work (and under the r18
    # one-pass fold below, the tokenize stage runs once via ReusedExchange,
    # so there is even less serial work for a spread to reclaim)
    toks = docs.select(
        F.col(id_col),
        F.explode(F.split(normalize_text(F.col(text_col)), " ")).alias("term"),
    ).filter(F.col("term") != "")
    # ONE token pass, ONE doc-grain shuffle: dl and every query-term tf come out
    # of the same conditional aggregation (map-side partials compact the
    # exchange to one row per doc per map task — no separate postings shuffle,
    # no dl⨝tf join afterwards)
    per_doc = toks.groupBy(id_col).agg(
        F.count("*").alias("dl"),
        *[
            F.sum(F.when(F.col("term") == t, 1).otherwise(0)).alias(f"tf_{i}")
            for i, t in enumerate(query_terms)
        ],
    )
    # ONE-PASS since r18 (the r17 deferral, resolved): corpus stats (N, Σdl,
    # per-term df) fold into the scoring plan as a broadcast 1-row aggregate
    # over the SAME per_doc subtree, instead of a separate synchronous
    # ``.first()`` corpus pass at query-build time. Both subtrees share the
    # identical doc-grain exchange (same DataFrame object → canonically
    # equal → runtime ReusedExchange), so the corpus tokenizes ONCE per
    # search. idf/avgdl move from Python-literal to JVM-column arithmetic:
    # every operand is an exact-in-double integer (< 2^53 — corpora past
    # 9e15 tokens exceed 100 TB of text) and every op is the same single
    # correctly-rounded IEEE op in the same order, so scores are
    # BIT-identical — proved by oracle hash-checks at 3 SFs
    # (tests/test_oracle_parity.py + the driver contract).
    stats = per_doc.agg(
        F.count("*").alias("__n_docs"),
        F.sum("dl").alias("__sum_dl"),
        *[
            F.sum((F.col(f"tf_{i}") > 0).cast("int")).alias(f"__df_{i}")
            for i in range(len(query_terms))
        ],
    )
    n_col = F.col("__n_docs").cast("double")
    avgdl = F.col("__sum_dl").cast("double") / n_col
    idfs = [
        (n_col - F.col(f"__df_{i}").cast("double") + F.lit(0.5))
        / (F.col(f"__df_{i}").cast("double") + F.lit(0.5))
        for i in range(len(query_terms))
    ]
    return _bm25_tail_shared(
        per_doc.crossJoin(F.broadcast(stats)), query_terms, avgdl, idfs, k, k1, b, id_col
    )


def _validated_query_terms(query_terms: list[str]) -> list[str]:
    """The ONE query-term contract (lowercased to match `normalize_text`
    tokens; non-empty, whitespace-free, distinct) shared by the live scorer
    and the persisted-index scorer."""
    query_terms = [t.lower() for t in query_terms]
    if (
        not query_terms
        or len(set(query_terms)) != len(query_terms)
        or any((not t) or (" " in t) for t in query_terms)
    ):
        raise ValueError(
            "query_terms must be non-empty, whitespace-free, and distinct "
            "after lowercasing"
        )
    return query_terms


def _bm25_rank_tail(
    per_doc: DataFrame,
    query_terms: list[str],
    n_docs,
    sum_dl,
    dfs: list,
    k: int,
    k1: float,
    b: float,
    id_col: str,
) -> DataFrame:
    """The leg-agnostic scoring/ranking tail shared by ``bm25_topk`` (live
    per-doc frame from one token pass) and ``textindex.bm25_search_indexed``
    (per-doc frame pivoted from committed postings): identical IEEE op
    sequence, fixed-order per-term fold, TakeOrderedAndProject top-k —
    BIT-identical scores for identical (dl, tf_i) inputs, which is what lets
    both forms hash-check against the same oracle. ``per_doc`` carries
    (``id_col``, dl, tf_0..tf_n); docs with no query-term hit may be absent
    (the tail filters non-hits anyway)."""
    if not n_docs:  # cold-start corpus: no docs → typed empty result
        return per_doc.select(
            F.col(id_col),
            F.lit(0.0).alias("bm25"),
            F.lit(0).cast("int").alias("n_terms_hit"),
            F.lit(0).cast("int").alias("rank"),
        ).limit(0)
    avgdl = sum_dl / n_docs  # one IEEE division of exact ints — engines agree
    # per-term idf folds to a Python double literal via the same correctly-
    # rounded op sequence the oracle states (and the same sequence the live
    # one-pass path evaluates as JVM columns — bit-equal either way)
    idfs = [
        F.lit((n_docs - dfs[i] + 0.5) / (dfs[i] + 0.5))
        for i in range(len(query_terms))
    ]
    return _bm25_tail_shared(
        per_doc, query_terms, F.lit(avgdl), idfs, k, k1, b, id_col
    )


def _bm25_tail_shared(
    frame: DataFrame,
    query_terms: list[str],
    avgdl: Column,
    idfs: list[Column],
    k: int,
    k1: float,
    b: float,
    id_col: str,
) -> DataFrame:
    """The expression-form scoring core behind BOTH stats deliveries —
    Python literals (the indexed path's cached driver stats) and broadcast
    1-row columns (the live one-pass path): one definition of the IEEE op
    sequence, so the two forms cannot drift. ``frame`` carries (id_col, dl,
    tf_0..tf_n [, stats columns]); scoring is map-side, top-k is
    TakeOrderedAndProject, rank is assigned over ≤ k rows."""
    norm_len = F.lit(1.0 - b) + (F.lit(b) * F.col("dl").cast("double")) / avgdl

    def term_score(i: int):
        tf = F.col(f"tf_{i}").cast("double")
        return F.when(
            F.col(f"tf_{i}") > 0,
            idfs[i] * ((tf * F.lit(k1 + 1.0)) / (tf + F.lit(k1) * norm_len)),
        ).otherwise(F.lit(0.0))

    # fixed-order fold: term_0 + term_1 + ... (left-assoc; float + is not
    # associative, so the order is part of the operator's contract)
    total = term_score(0)
    for i in range(1, len(query_terms)):
        total = total + term_score(i)
    hits = F.col("tf_0") > 0
    n_hit = (F.col("tf_0") > 0).cast("int")
    for i in range(1, len(query_terms)):
        hits = hits | (F.col(f"tf_{i}") > 0)
        n_hit = n_hit + (F.col(f"tf_{i}") > 0).cast("int")
    scored = frame.filter(hits).select(
        F.col(id_col), total.alias("bm25"), n_hit.cast("int").alias("n_terms_hit")
    )
    from pyspark.sql.window import Window

    top = scored.orderBy(F.desc("bm25"), F.asc(id_col)).limit(k)
    w = Window.orderBy(F.desc("bm25"), F.asc(id_col))
    return top.withColumn("rank", F.row_number().over(w).cast("int"))


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


def hybrid_rrf_topk(
    docs: DataFrame,
    emb: DataFrame,
    query_terms: list[str],
    query_vec_id: int,
    k: int = 10,
    n_each: int = 30,
    rrf_k: int = 60,
    doc_id_col: str = "doc_id",
    text_col: str = "text",
    vec_id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Hybrid retrieval: reciprocal-rank fusion of a lexical BM25 ranking and a
    semantic cosine ranking over the SAME id space — the standard two-tower
    fusion (Cormack et al.'s RRF, the default hybrid mode in Elasticsearch /
    Vespa / Weaviate) used to curate RAG training corpora where either signal
    alone misses. Returns (doc_id, lex_rank, sem_rank, rrf, rank) for the
    fused top-``k``; lex_rank / sem_rank are NULL when the doc appears in only
    one leg.

    Scale shape: each leg is already a k-bounded global top-``n_each`` —
    ``bm25_topk`` (one token pass, one doc-grain shuffle, TakeOrderedAndProject)
    and ``brute_force_topk`` (broadcast queries, one corpus pass, per-query
    heap) — so the fusion joins two ≤``n_each``-row frames: driver-scale work,
    independent of corpus size. Nothing corpus-sized is shuffled by the fusion
    itself.

    Determinism contract (the repo's oracle discipline): rrf folds in FIXED
    leg order, lexical + semantic, each term the single correctly-rounded IEEE
    division 1.0/(rrf_k + rank) with integer-valued operands — bit-reproducible
    in DuckDB with the same expression shape. Ties break on doc id ascending.
    """
    lex = bm25_topk(docs, query_terms, k=n_each, id_col=doc_id_col, text_col=text_col).select(
        F.col(doc_id_col), F.col("rank").alias("lex_rank")
    )
    from airflow_courier_payout_ledger_pipeline_spark.operators.similarity import (
        brute_force_topk,
    )

    sem = brute_force_topk(
        emb,
        emb.filter(F.col(vec_id_col) == query_vec_id),
        k=n_each,
        id_col=vec_id_col,
        vec_col=vec_col,
    ).select(F.col("neighbor_id").alias(doc_id_col), F.col("rank").alias("sem_rank"))
    return rrf_fuse(lex, sem, k=k, rrf_k=rrf_k, id_col=doc_id_col, leg_bound=n_each)


def rrf_fuse(
    lex: DataFrame,
    sem: DataFrame,
    k: int = 10,
    rrf_k: int = 60,
    id_col: str = "doc_id",
    leg_bound: int | None = None,
) -> DataFrame:
    """Reciprocal-rank fusion of two (id, rank) legs — the leg-agnostic core
    of ``hybrid_rrf_topk``, so any lexical leg (BM25, trigram-prefiltered) and
    any semantic leg (brute force, persisted IVF-PQ index) fuse identically.
    ``lex`` must carry (``id_col``, lex_rank), ``sem`` (``id_col``, sem_rank);
    legs are expected k-bounded (the fusion is exact over whatever they
    return, but its driver-scale cost argument assumes top-n inputs).
    ``leg_bound`` makes that assumption a CHECK: when set, the union frame
    (each leg pre-limited to ``bound + 1`` rows — O(bound) rows even against
    a mis-wired corpus-sized leg) is COLLECTED once in one job — both legs'
    stages run inside that single action, keeping their parallelism — the
    per-leg ROW counts (a leg-tag column, not the nullable rank: a NULL-rank
    row must still count against the bound) are read driver-side, and an
    over-bound leg raises instead of silently turning the "driver-scale"
    fusion into a corpus-sized shuffle. The fusion then consumes the
    collected rows as a local relation, so each leg's plan executes exactly
    ONCE (measured: probing by separate counts re-ran the legs and 2.5×'d
    the hybrid headline; separate per-leg checkpoints serialized them for
    +30%) and NOTHING stays pinned on executors after the call — the r14
    localCheckpoint form leaked its checkpointed blocks for the session's
    lifetime, which a long-lived retrieval service fusing thousands of
    queries cannot afford. Collecting ≤2·(bound+1) (id, rank, rank) rows is
    the same driver-scale class as the top-k result itself.

    Same determinism contract as the caller: fixed leg order (lex + sem),
    each term one correctly-rounded IEEE division 1.0/(rrf_k + rank), ties on
    id ascending."""
    # fuse by union + one groupBy over ≤2·n rows (Spark cannot broadcast a
    # full-outer join, which would cost two exchanges on the tiny frames; the
    # union-agg shape is ONE trivial exchange regardless of corpus size)
    lex_u = lex.select(
        F.col(id_col).alias("__id"),
        "lex_rank",
        F.lit(None).cast("int").alias("sem_rank"),
    )
    sem_u = sem.select(
        F.col(id_col).alias("__id"),
        F.lit(None).cast("int").alias("lex_rank"),
        "sem_rank",
    )
    if leg_bound is not None:
        tagged = (
            lex_u.limit(leg_bound + 1)
            .withColumn("__leg", F.lit("lex"))
            .unionAll(sem_u.limit(leg_bound + 1).withColumn("__leg", F.lit("sem")))
        )
        rows = tagged.collect()  # ONE job, both legs inside; ≤2·(bound+1) rows
        for name in ("lex", "sem"):
            if sum(r["__leg"] == name for r in rows) > leg_bound:
                raise ValueError(
                    f"rrf_fuse: {name} leg exceeds its declared bound "
                    f"(> {leg_bound} rows) — legs must be top-n "
                    "frames, not corpus-sized rankings"
                )
        u = lex.sparkSession.createDataFrame(rows, tagged.schema).drop("__leg")
    else:
        u = lex_u.unionAll(sem_u)
    fused = (
        u.groupBy("__id")
        # min, not max: identical for contract-conforming unique-id legs, and
        # the fail-safer choice (RRF convention keeps the BEST rank) if a
        # caller ever passes a leg with duplicate ids
        .agg(F.min("lex_rank").alias("lex_rank"), F.min("sem_rank").alias("sem_rank"))
    )
    rrf = F.coalesce(
        F.lit(1.0) / (F.lit(rrf_k).cast("double") + F.col("lex_rank").cast("double")),
        F.lit(0.0),
    ) + F.coalesce(
        F.lit(1.0) / (F.lit(rrf_k).cast("double") + F.col("sem_rank").cast("double")),
        F.lit(0.0),
    )
    from pyspark.sql.window import Window

    top = (
        fused.select(
            F.col("__id").alias(id_col),
            F.col("lex_rank").cast("int").alias("lex_rank"),
            F.col("sem_rank").cast("int").alias("sem_rank"),
            rrf.alias("rrf"),
        )
        .orderBy(F.desc("rrf"), F.asc(id_col))
        .limit(k)
    )
    w = Window.orderBy(F.desc("rrf"), F.asc(id_col))
    return top.withColumn("rank", F.row_number().over(w).cast("int"))


def knn_label_vote(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """kNN majority-vote labeling: each query vector takes the modal label of
    its ``k`` exact cosine neighbors (self excluded) — the weak-supervision /
    label-propagation primitive behind auto-labeling an unlabeled slice of a
    training corpus from a labeled seed set, and the standard embedding-quality
    probe (kNN accuracy). Returns (query_id, predicted_label, votes,
    true_label, correct); ties in the vote break on the SMALLEST label.

    Scale shape: one corpus pass for the neighbors (``brute_force_topk``:
    broadcast queries, per-query heap — swap in any ANN leg for 100 TB, same
    fusion downstream); the label attach then BROADCASTS the q×k-row NN frame
    against the column-pruned (id, label) projection of the corpus — the big
    side is never shuffled; the vote is a groupBy over q×k rows.
    """
    from airflow_courier_payout_ledger_pipeline_spark.operators.similarity import (
        brute_force_topk,
    )

    nn = brute_force_topk(emb, queries, k=k, id_col=id_col, vec_col=vec_col)
    return _vote_over_nn(nn, emb, queries, id_col, label_col)


def knn_label_vote_indexed(
    lake,
    layer: str,
    emb: DataFrame,
    queries: DataFrame,
    k: int = 10,
    shortlist: int = 20,
    nprobe: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """``knn_label_vote`` in its production steady-state: the neighbor leg is
    served from the PERSISTED residual IVF-PQ index (ADC shortlist over the
    committed 8-byte codes, then exact cosine re-rank of the |Q|·shortlist
    winners — ``annindex.refine_search_residual_ivfpq_index``) instead of the
    O(corpus×queries) brute-force pass; the label attach, vote, and truth
    join downstream are the IDENTICAL code (``_vote_over_nn``) — the same
    leg-swap contract ``rrf_fuse`` gives the hybrid rail. At 100 TB this is
    what auto-labeling a corpus slice costs per batch: one pruned scan of
    committed codes + exact math on a broadcast-sized shortlist, with the
    quantizer/encode paid once at index build. Same output schema and vote
    semantics as ``knn_label_vote``; the predictions differ only where
    quantization drops a true neighbor from the shortlist — measured, not
    assumed, by ``knn_vote_agreement_indexed``. ``shortlist`` must cover
    ``k`` (a shortlist smaller than k can't rank k neighbors — raise, don't
    silently vote over fewer; the same guard ``knn_accuracy_curve_indexed``
    applies to its k grid)."""
    if shortlist < k:
        raise ValueError(
            f"knn_label_vote_indexed: shortlist ({shortlist}) < k ({k}) — "
            "the re-rank stage cannot rank more neighbors than the ADC "
            "shortlist supplies"
        )
    from airflow_courier_payout_ledger_pipeline_spark.operators.annindex import (
        refine_search_residual_ivfpq_index,
    )

    nn = refine_search_residual_ivfpq_index(
        lake,
        layer,
        emb,
        queries,
        k=k,
        shortlist=shortlist,
        nprobe=nprobe,
        id_col=id_col,
        vec_col=vec_col,
    )
    return _vote_over_nn(nn, emb, queries, id_col, label_col)


def knn_vote_agreement_indexed(
    lake,
    layer: str,
    emb: DataFrame,
    queries: DataFrame,
    k: int = 10,
    shortlist: int = 20,
    nprobe: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    max_queries: int = 1000,
) -> DataFrame:
    """The refine-vs-exact agreement eval for the labeling rail — the recall
    eval's analogue one level up: how often does the index-served vote
    (``knn_label_vote_indexed``) return the SAME label the exact brute-force
    vote would have, and how do their accuracies compare? One summary row:
    (n_queries, n_agree, agreement, exact_correct, indexed_correct) with the
    rates rounded to 4 decimals. Agreement uses null-safe equality (two NULL
    modal labels agree); both inner vote legs are the shared
    ``_vote_over_nn``. Driver-scale: both legs are q-row frames, the compare
    is a broadcast join over them.

    Eval-on-a-SAMPLE contract: this gate deliberately embeds the exact
    O(corpus×|Q|) brute-force leg — that is the eval's definition — so |Q|
    must be a bounded sample, never the corpus. ``max_queries`` makes that a
    CHECK (the ``leg_bound`` pattern): the query frame is counted and an
    over-bound frame raises, naming the fix, instead of silently becoming a
    corpus×corpus job."""
    _bounded_eval_queries(queries, max_queries, "knn_vote_agreement_indexed")
    exact = knn_label_vote(
        emb, queries, k=k, id_col=id_col, vec_col=vec_col, label_col=label_col
    ).select(
        "query_id",
        F.col("predicted_label").alias("__exact"),
        F.col("correct").alias("__exact_ok"),
    )
    indexed = knn_label_vote_indexed(
        lake,
        layer,
        emb,
        queries,
        k=k,
        shortlist=shortlist,
        nprobe=nprobe,
        id_col=id_col,
        vec_col=vec_col,
        label_col=label_col,
    ).select(
        "query_id",
        F.col("predicted_label").alias("__idx"),
        F.col("correct").alias("__idx_ok"),
    )
    joined = exact.join(F.broadcast(indexed), "query_id")
    return joined.agg(
        F.count("*").cast("bigint").alias("n_queries"),
        F.sum(F.col("__exact").eqNullSafe(F.col("__idx")).cast("int"))
        .cast("bigint")
        .alias("n_agree"),
        F.sum("__exact_ok").cast("bigint").alias("exact_correct"),
        F.sum("__idx_ok").cast("bigint").alias("indexed_correct"),
    ).select(
        "n_queries",
        "n_agree",
        F.round(
            F.col("n_agree").cast("double") / F.col("n_queries").cast("double"), 4
        ).alias("agreement"),
        "exact_correct",
        "indexed_correct",
    )


def _bounded_eval_queries(queries: DataFrame, max_queries: int, caller: str) -> None:
    """The eval rails' ``leg_bound`` twin: an eval that embeds a brute-force
    or per-query-corpus-pass leg must run on a BOUNDED query sample. Counts
    the (limit-probed) query frame and raises past the declared bound — the
    count reads at most ``max_queries + 1`` rows, so the check itself never
    scans an accidentally-corpus-sized frame.

    CALLER CONTRACT (r15 ADVICE): the query frame must be DETERMINISTIC —
    the probe is a separate action and the eval re-executes the same
    lineage, so a nondeterministic frame (an unseeded ``sample``, a
    ``limit`` over an unordered shuffle whose row choice varies by plan)
    could pass the probe yet exceed the bound in the eval proper. Every
    registered caller passes a deterministic predicate filter
    (``vec_id < N``). The probe also costs one extra (tiny: ≤ bound+1 rows)
    job per eval — kept as a separate action deliberately, because folding
    the count into the eval (the ``rrf_fuse`` leg-tag pattern) would make
    the guard part of the measured plan on a hot path that exists precisely
    to measure the eval's own cost."""
    n = queries.limit(max_queries + 1).count()
    if n > max_queries:
        raise ValueError(
            f"{caller}: query frame exceeds max_queries ({max_queries}) — "
            "this eval embeds an O(corpus×|Q|) leg by design; run it on a "
            "bounded sample (deterministic_sample / .limit) or raise "
            "max_queries deliberately"
        )


def _vote_over_nn(
    nn: DataFrame,
    emb: DataFrame,
    queries: DataFrame,
    id_col: str,
    label_col: str,
) -> DataFrame:
    """The leg-agnostic tail shared by the exact and index-served labeling
    rails: attach labels to a (query_id, neighbor_id, …) NN frame, take the
    modal label per query, join the truth, and emit the contract schema
    (query_id, predicted_label, votes, true_label, correct)."""
    nn_lab = _attach_labels(nn, emb, id_col, label_col)
    pred = _modal_label_vote(nn_lab, ["query_id"])
    truth = queries.select(
        F.col(id_col).alias("query_id"), F.col(label_col).alias("true_label")
    )
    return pred.join(F.broadcast(truth), "query_id").select(
        "query_id",
        F.col("__nl").alias("predicted_label"),
        F.col("votes").cast("bigint").alias("votes"),
        "true_label",
        _correct_flag().cast("int").alias("correct"),
    )


def _attach_labels(
    nn: DataFrame, emb: DataFrame, id_col: str, label_col: str
) -> DataFrame:
    """Label attach shared by the vote and the accuracy curve: the q×k NN
    frame BROADCASTS against the column-pruned (id, label) projection — the
    labeled corpus is never shuffled."""
    labels = emb.select(
        F.col(id_col).alias("neighbor_id"), F.col(label_col).alias("__nl")
    )
    return labels.join(F.broadcast(nn), "neighbor_id")


def _modal_label_vote(nn_lab: DataFrame, group_cols: list[str]) -> DataFrame:
    """ONE definition of the vote semantics `knn_label_vote` and
    `knn_accuracy_curve` both promise: count votes per (group, label), argmax
    by votes desc then label ASC NULLS LAST — asc_nulls_last, not asc, so a
    nullable label column tie-breaks the way the SQL oracles' ORDER BY does
    (NULLS LAST in DuckDB/ANSI) and NULL never beats a real label on a tied
    vote. Input carries ``group_cols`` + '__nl'; output is one row per group
    with the winning '__nl' and its 'votes'."""
    # r18 (guide §2.4 family, the r17 deferral): the rank window replaced by
    # a struct-min ARGMAX aggregation — same two static exchanges (the
    # (group, label) count then the group-keyed argmax), but the second is a
    # partially-aggregated exchange carrying ≤ one row per group per map
    # task with NO sort, where the window shuffled every (group, label) row
    # and sorted each partition. (The r17 repartition(group) attempt did
    # not collapse anything: the planner kept it AND added its own
    # ENSURE_REQUIREMENTS exchange.) Tie semantics are encoded in the
    # struct's field order and PROVEN identical: min over (-votes,
    # isnull(label), label) = max votes first, then NULLS LAST (the flag
    # differs before any NULL label is ever compared — a NULL field only
    # meets another NULL, i.e. the same single all-NULL row of its group),
    # then label ascending; row-set equality vs the window form is pinned
    # for all five vote consumers at 2 SFs in tests/test_search.py and by
    # the oracle hashes. A/B (pairwise, idle): label_vote_indexed −11%,
    # accuracy_curve_indexed −14%, exact forms −3%, agreement eval flat.
    votes = nn_lab.groupBy(*group_cols, "__nl").agg(F.count("*").alias("votes"))
    return (
        votes.groupBy(*group_cols)
        .agg(
            F.min(
                F.struct(
                    (-F.col("votes")).alias("nv"),
                    F.isnull("__nl").cast("int").alias("nn"),
                    F.col("__nl").alias("__nl"),
                    F.col("votes").alias("votes"),
                )
            ).alias("__s")
        )
        .select(
            *group_cols,
            F.col("__s.__nl").alias("__nl"),
            F.col("__s.votes").alias("votes"),
        )
    )


def _correct_flag():
    """CASE semantics, not bare ==: a NULL on either side must yield 0 (the
    SQL CASE's ELSE), never a NULL correct flag."""
    return F.when(F.col("__nl") == F.col("true_label"), F.lit(1)).otherwise(F.lit(0))


def knn_accuracy_curve(
    emb: DataFrame,
    queries: DataFrame,
    ks: list[int] | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """kNN accuracy@k for every k in ``ks`` — THE standard embedding-quality
    probe (how well does the space cluster labels?), the eval companion to
    ``knn_label_vote`` the way the recall evals accompany the ANN searches.
    Returns (k, n_queries, n_correct, accuracy) with accuracy rounded to 4
    decimals; per-k vote semantics are exactly ``knn_label_vote``'s (modal
    label of the top-k neighbors, ties to the smallest label, NULLS LAST).

    One-pass sweep (the nprobe-sweep pattern): the neighbor list is computed
    ONCE at max(ks) — one corpus pass — and the k grid broadcasts into the
    q×k_max NN frame; votes, argmax, and the accuracy rollup all run over
    grid×q×k_max rows, never the corpus."""
    ks = _validate_ks(ks)
    from airflow_courier_payout_ledger_pipeline_spark.operators.similarity import (
        brute_force_topk,
    )

    nn = brute_force_topk(emb, queries, k=ks[-1], id_col=id_col, vec_col=vec_col)
    return _accuracy_sweep(nn, emb, queries, ks, id_col, label_col)


def knn_accuracy_curve_indexed(
    lake,
    layer: str,
    emb: DataFrame,
    queries: DataFrame,
    ks: list[int] | None = None,
    shortlist: int = 20,
    nprobe: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    max_queries: int = 1000,
) -> DataFrame:
    """``knn_accuracy_curve`` with the neighbor leg served from the PERSISTED
    index (ADC shortlist -> exact re-rank, exactly ``knn_label_vote_indexed``'s
    leg); the sweep tail is the IDENTICAL shared code (``_accuracy_sweep``).
    Read next to the exact curve, this is the labeling-rail dial: how much
    accuracy@k does serving from the index cost at each k — the per-k view
    of what ``knn_vote_agreement_indexed`` summarizes at the vote grain.
    ``shortlist`` must cover max(ks) (a shortlist smaller than k can't rank
    k neighbors — raise, don't silently truncate the curve). Eval-on-a-
    SAMPLE contract: the refine leg re-ranks |Q|·shortlist exact pairs per
    sweep, so |Q| must be a bounded sample — ``max_queries`` enforces it
    (see ``_bounded_eval_queries``)."""
    ks = _validate_ks(ks)
    _bounded_eval_queries(queries, max_queries, "knn_accuracy_curve_indexed")
    if shortlist < ks[-1]:
        raise ValueError(
            f"knn_accuracy_curve_indexed: shortlist ({shortlist}) < max k "
            f"({ks[-1]}) — the re-rank stage cannot rank more neighbors than "
            "the ADC shortlist supplies"
        )
    from airflow_courier_payout_ledger_pipeline_spark.operators.annindex import (
        refine_search_residual_ivfpq_index,
    )

    nn = refine_search_residual_ivfpq_index(
        lake,
        layer,
        emb,
        queries,
        k=ks[-1],
        shortlist=shortlist,
        nprobe=nprobe,
        id_col=id_col,
        vec_col=vec_col,
    )
    return _accuracy_sweep(nn, emb, queries, ks, id_col, label_col)


def _validate_ks(ks: list[int] | None) -> list[int]:
    if ks is not None and (not ks or any(k < 1 for k in ks)):
        raise ValueError("ks must be positive ints")
    return sorted(set(ks)) if ks is not None else [1, 3, 5, 10]


def _accuracy_sweep(
    nn: DataFrame,
    emb: DataFrame,
    queries: DataFrame,
    ks: list[int],
    id_col: str,
    label_col: str,
) -> DataFrame:
    """The leg-agnostic accuracy@k sweep shared by the exact and
    index-served curves: labels attach to the (query_id, rank, …) NN frame
    computed ONCE at max(ks), the k grid broadcasts in, votes/argmax/rollup
    run over grid×q×k_max rows — never the corpus."""
    spark = emb.sparkSession
    nn_lab = _attach_labels(nn, emb, id_col, label_col).select(
        "query_id", "rank", "__nl"
    )
    grid = spark.createDataFrame([(k,) for k in ks], "k int")
    per_k = nn_lab.crossJoin(F.broadcast(grid)).filter(F.col("rank") <= F.col("k"))
    pred = _modal_label_vote(per_k, ["k", "query_id"])
    truth = queries.select(
        F.col(id_col).alias("query_id"), F.col(label_col).alias("true_label")
    )
    return (
        pred.join(F.broadcast(truth), "query_id")
        .groupBy("k")
        .agg(
            F.count("*").cast("bigint").alias("n_queries"),
            F.sum(_correct_flag()).cast("bigint").alias("n_correct"),
        )
        .select(
            "k",
            "n_queries",
            "n_correct",
            F.round(
                F.col("n_correct").cast("double") / F.col("n_queries").cast("double"), 4
            ).alias("accuracy"),
        )
    )
