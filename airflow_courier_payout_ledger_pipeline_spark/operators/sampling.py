"""Curation sampling operators: deterministic stratified (domain-mix) sampling,
distributed prefix sums, and sequence packing to a token budget.

All engine-portable and reproducible by construction: sampling predicates are
md5-hex threshold compares (no rand(), no seed plumbing — re-running months later
on re-partitioned data selects byte-identical rows), and packing derives from an
exact global prefix sum over a total order. The reference pipeline has no
sampling surface (its compute is Postgres SQL); these extend the engine's
training-data story the way a 100 TB corpus actually gets consumed: mixed by
domain weight, then packed into fixed-size training sequences.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

#: hash-space width for thresholds: first 4 md5 hex chars = 65536 buckets
_HASH_BUCKETS = 16**4


def hash_threshold(fraction: float) -> str:
    """Hex threshold ``t`` such that ``substring(md5(key),1,4) < t`` keeps
    ~``fraction`` of keys (granularity 1/65536 — document when quoting rates).
    fraction ≥ 1 returns 'g', which sorts above every hex string ('10000' would
    NOT: lexicographic compare, '1…' < 'a…')."""
    bucket = max(0, min(_HASH_BUCKETS, round(fraction * _HASH_BUCKETS)))
    return "g" if bucket >= _HASH_BUCKETS else format(bucket, "04x")


def stratified_sample(
    df: DataFrame,
    key_col: str,
    stratum_col: str,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
) -> DataFrame:
    """Domain-mix sampling: keep a per-stratum fraction of rows (e.g. up-weight
    curated sources, down-weight crawl), deterministically — the keep decision is
    a pure function of (key, stratum), independent of partitioning, cluster size,
    and run date.

    Scale shape: ZERO shuffles — a map-side CASE over the stratum column and one
    md5 per row, fused into the scan's codegen stage. This is how mixture
    weights are applied to a 100 TB corpus without materializing per-source
    splits: the filter runs inline in whatever job consumes the mix.

    The per-stratum rate is exact in expectation with 1/65536 granularity; the
    CASE (not a map-literal lookup) keeps the predicate portable to any SQL
    engine for audit queries.
    """
    bucket = F.substring(F.md5(F.col(key_col).cast("string")), 1, 4)
    thr: Column | None = None
    for stratum in sorted(fractions):
        t = F.lit(hash_threshold(fractions[stratum]))
        cond = F.col(stratum_col) == stratum
        thr = F.when(cond, t) if thr is None else thr.when(cond, t)
    assert thr is not None, "fractions must be non-empty"
    thr = thr.otherwise(F.lit(hash_threshold(default_fraction)))
    return df.filter(bucket < thr)


def distributed_prefix_sum(
    df: DataFrame,
    order_col: str,
    value_col: str,
    out_col: str = "cumsum",
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact running sum of ``value_col`` over the global ``order_col`` order,
    WITHOUT collapsing to one partition (the naive
    ``Window.orderBy`` — no partitionBy — executes single-threaded on one
    executor and is the classic prefix-sum scale trap).

    Two-pass shape (the textbook distributed scan):
    1. range-repartition on ``order_col`` so partition i holds a contiguous key
       range, then a per-partition window computes local prefix sums;
    2. per-partition totals (one tiny row each) come back to the driver, their
       exclusive prefix becomes each partition's offset, broadcast-joined back.

    Driver-side data is O(num_partitions) scalars — the same class as a
    watermark cursor. The result is independent of the partition count or
    boundaries (offsets always reconcile), so the output is deterministic for
    any cluster size.
    """
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    d = df.repartitionByRange(n, F.col(order_col)).withColumn(
        "__pid", F.spark_partition_id()
    )
    # PIN the range assignment: repartitionByRange picks its boundaries by
    # SAMPLING, and this frame is executed three times (totals collect, the
    # offset join, the caller's action) — without a materialization barrier
    # each execution may re-sample different boundaries, so rows near a
    # boundary change __pid between the totals pass and the join and the
    # reconciled offsets go stale (observed at sf0.1: bins corrupted from the
    # first boundary onward, nondeterministically). localCheckpoint
    # materializes the partitioned projection once; every downstream action
    # reuses those blocks. Cost: one cached copy of the (order, value)
    # projection — the caller should pass a pruned frame, as pack_sequences
    # does.
    d = d.localCheckpoint()
    w = Window.partitionBy("__pid").orderBy(order_col)
    local = d.withColumn("__local", F.sum(F.col(value_col)).over(w))

    totals = (
        local.groupBy("__pid")
        .agg(F.sum(F.col(value_col)).alias("__total"), F.min(order_col).alias("__lo"))
        .collect()
    )
    # exclusive prefix of partition totals, in key-range order
    offsets, acc = [], 0
    for row in sorted(totals, key=lambda r: r["__lo"]):
        offsets.append((row["__pid"], acc))
        acc += row["__total"]
    off_df = df.sparkSession.createDataFrame(offsets, "__pid int, __offset bigint")
    return (
        local.join(F.broadcast(off_df), "__pid")
        .withColumn(out_col, F.col("__local") + F.col("__offset"))
        .drop("__pid", "__local")
    )


def pack_sequences(
    df: DataFrame,
    id_col: str,
    size_col: str,
    target: int,
) -> DataFrame:
    """Assign documents to fixed-budget training bins: documents are laid out in
    ``id_col`` order and bin ``b`` covers global token offsets
    [b·target, (b+1)·target) — a document belongs to the bin where it STARTS
    (offset-based packing: deterministic, one pass, no per-bin sequential
    state; the standard scalable approximation of first-fit, over-filling a bin
    by at most one document).

    Emits one row per document: id, size, ``bin_id``, and the document's start
    offset within the global layout. Built on :func:`distributed_prefix_sum`,
    so it never single-threads regardless of corpus size.
    """
    with_cs = distributed_prefix_sum(df, id_col, size_col, out_col="__cs")
    start = (F.col("__cs") - F.col(size_col)).cast("bigint")
    return with_cs.select(
        F.col(id_col),
        F.col(size_col),
        start.alias("start_offset"),
        # integer DIV, not floor(double /): offsets in a 100 TB layout overflow
        # double's 2^53 exact range
        F.expr(f"CAST((__cs - {size_col}) DIV {target} AS BIGINT)").alias("bin_id"),
    )


def pack_stats(packed: DataFrame, size_col: str) -> DataFrame:
    """Per-bin fill report for a :func:`pack_sequences` layout: document count,
    token total, and fill ratio vs a ``target``-sized budget carried by the
    caller. One grouped agg keyed by bin — linear, near-uniform keys."""
    return packed.groupBy("bin_id").agg(
        F.count("*").alias("n_docs"),
        F.sum(size_col).cast("bigint").alias("tokens_total"),
        F.min("start_offset").alias("first_offset"),
    )


# --- DSIR-style hashed n-gram importance scoring -------------------------------------

#: hashed n-gram feature-space width: 1024 buckets ≈ the CMS width — O(B)
#: driver state regardless of vocabulary or corpus size
DSIR_BUCKETS = 1024


def _gram_bucket(gram: Column, buckets: int) -> Column:
    """Hashed-feature bucket for a word n-gram: first 8 md5 hex chars as an
    integer mod ``buckets`` — replayable bit-for-bit in any engine with md5
    (DuckDB: ``('0x' || substr(md5(g),1,8))::BIGINT % B``), unlike xxhash64
    which exists only JVM-side. 32 hash bits over ≤ 2^16 buckets keeps the
    modulo unbiased to < 2^-16."""
    return (
        F.conv(F.substring(F.md5(gram), 1, 8), 16, 10).cast("long") % buckets
    ).cast("int")


def dsir_gram_counts(
    docs: DataFrame,
    target: Column,
    buckets: int = DSIR_BUCKETS,
    text_col: str = "text",
) -> DataFrame:
    """Hashed n-gram (unigram + bigram) bucket counts over the corpus and over
    its target subset, in ONE pass: (bucket, raw_n, tgt_n), ≤ ``buckets`` rows.
    This is the sufficient statistic of DSIR's two hashed n-gram models — the
    raw (proposal) distribution and the target distribution — and, like the
    CMS state, it is mergeable across increments by bucket-wise sum and small
    enough to collect (O(B) driver state).

    Scale shape: the gram explode is map-side; the grouped agg's exchange
    carries ≤ ``buckets`` rows per map task after partial aggregation — never
    raw grams. The target indicator rides the same pass (`count_if`), so the
    target model costs no second corpus read. The tokenized input is SPREAD
    (``dedup._spread``) ahead of the explode — guide §2.5: a single-row-group
    docs file is ONE scan task, which serialized the whole per-gram md5 +
    bucket fan-out on one core (r18 measurement: this pass is an embedded
    collect, ~0.85 s of the query's construction); the spread exchange
    carries one (flag, word-array) row per doc and doubles as the barrier
    that materializes the regexp-backed tokenization once per doc (the
    char_shingles lesson)."""
    from airflow_courier_payout_ledger_pipeline_spark.functions.text import (
        normalize_text,
    )
    from airflow_courier_payout_ledger_pipeline_spark.operators.dedup import _spread

    ws = F.split(normalize_text(F.col(text_col)), " ")
    grams = F.expr(
        "concat(ws, CASE WHEN size(ws) < 2 THEN CAST(array() AS ARRAY<STRING>) "
        "ELSE transform(sequence(1, size(ws) - 1), "
        "i -> concat_ws(' ', element_at(ws, i), element_at(ws, i + 1))) END)"
    )
    g = (
        _spread(docs.select(target.alias("__t"), ws.alias("ws")))
        .filter((F.size("ws") > 1) | (F.element_at("ws", 1) != ""))
        .select("__t", F.explode(grams).alias("gram"))
        .filter(F.col("gram") != "")
    )
    return g.groupBy(_gram_bucket(F.col("gram"), buckets).alias("bucket")).agg(
        F.count(F.lit(1)).alias("raw_n"),
        F.count_if(F.col("__t")).alias("tgt_n"),
    )


def dsir_importance_scores(
    docs: DataFrame,
    target: Column,
    buckets: int = DSIR_BUCKETS,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """DSIR-style importance score per document: how much more likely the
    document's hashed n-gram features are under the TARGET distribution than
    under the RAW corpus distribution — the data-selection signal of Xie et
    al.'s "Data Selection for Language Models via Importance Resampling"
    (hashed n-gram feature space, add-1-smoothed bag-of-grams models). Keeping
    the top-scored documents (or weighted-sampling by score with the
    ``weighted_sample`` integer-hash draw) tilts a raw 100 TB crawl toward a
    curated target mix.

    Emits (id, n_grams, dsir_score) for every document with ≥ 1 gram, where
    ``dsir_score = round(avg over grams of p_target(bucket)/p_raw(bucket), 4)``
    with add-1 smoothing. The PROBABILITY-DOMAIN mean replaces the paper's
    mean log-ratio (this repo's cross-engine discipline: ln() is not
    bit-specified across libm implementations and would break oracle hashes —
    same monotone-signal rationale as ``bigram_lm_score`` / the ln-free BM25
    idf). Per-gram ratios are EXACT across engines: each is
    ``((tgt_b+1)·(R+B)) / ((raw_b+1)·(T+B))`` computed driver-side with exact
    integer arithmetic (Python's correctly-rounded int/int division); an
    oracle computing the same quotient from BIGINT products gets the same
    double as long as both products stay < 2^53 (corpora to ~10^15 grams —
    beyond 100 TB of text). Each ratio is then FLOOR-QUANTIZED to a multiple
    of 2^-20 (floor is unambiguous where round-half rules differ; ×2^20 and
    ÷2^20 are exact power-of-two scalings), which makes the per-doc SUM
    order-free EXACT — every partial sum is a multiple of 2^-20, exactly
    representable while the doc's ratio total stays < 2^33 — so the mean
    cannot flip round(·, 4) at a boundary under a different aggregation
    order, and ``dsir_resample``'s keep/drop membership derived from the
    rounded score is partitioning-independent by construction (a plain
    float avg's fold order is not, and here it would decide row membership,
    not just a displayed value).

    Scale shape: TWO corpus passes, ONE exchange each — (1) the O(B)-row
    count state (``dsir_gram_counts``, collected like the CMS state), (2)
    scoring, where the B ratios re-enter the plan as ONE literal-array lookup
    (``functions/literals.array_lit``, a single parsed plan node — the
    heavy-hitters lesson, extended in round 9: ``F.lit(list)`` builds the
    same node but converts per element driver-side) and the
    only exchange is the doc-grain mean. No joins, no vocabulary broadcast,
    nothing corpus-sized on the driver.

    A zero-shuffle variant — folding the per-doc mean in the ARRAY domain
    (``F.filter`` + ``F.aggregate`` over the doc's own gram array, no explode,
    no exchange) — was A/B'd in round 9 and REJECTED: Spark evaluates
    higher-order-function lambdas interpreted per element, outside
    whole-stage codegen, and the measured cost was ~4x the explode + codegen
    hash-agg plan (6.8 s vs 1.7 s at sf0.1) — the exchange it saves is doc-
    grain (one tiny row per doc), far cheaper than losing codegen on the
    per-gram ratio lookup.

    FLOOR PROFILE (round 9, sf0.1 best-of-3, local[32]): full 1.83 s =
    state pass 0.76 s + scoring pass ~1.07 s. Per pass: tokenize+bigram
    explode 0.33 s, md5 bucketing +0.23 s, aggregation the rest. The only
    compressible term is md5 (~0.46 s across both passes — xxhash64 measures
    +0.006 s) and it is PINNED: the bucket function must be bit-identical in
    Spark and the DuckDB oracle, and md5 is the only hash both engines share.
    The plan is otherwise at its floor — every remaining second is tokenize/
    explode/codegen-agg work proportional to corpus grams."""
    from airflow_courier_payout_ledger_pipeline_spark.functions.text import (
        normalize_text,
    )

    state = {r["bucket"]: (r["raw_n"], r["tgt_n"]) for r in
             dsir_gram_counts(docs, target, buckets, text_col).collect()}
    big_r = sum(v[0] for v in state.values())
    big_t = sum(v[1] for v in state.values())
    import math  # noqa: PLC0415

    ratios = [
        math.floor(
            ((state.get(b, (0, 0))[1] + 1) * (big_r + buckets))
            / ((state.get(b, (0, 0))[0] + 1) * (big_t + buckets))
            * 1048576.0
        )
        / 1048576.0
        for b in range(buckets)
    ]
    ws = F.split(normalize_text(F.col(text_col)), " ")
    grams = F.expr(
        "concat(ws, CASE WHEN size(ws) < 2 THEN CAST(array() AS ARRAY<STRING>) "
        "ELSE transform(sequence(1, size(ws) - 1), "
        "i -> concat_ws(' ', element_at(ws, i), element_at(ws, i + 1))) END)"
    )
    from airflow_courier_payout_ledger_pipeline_spark.functions.literals import (
        array_lit,
    )

    from airflow_courier_payout_ledger_pipeline_spark.operators.dedup import _spread

    # spread before the explode (guide §2.5, same rationale and exchange
    # payload as dsir_gram_counts above): the scoring pass re-runs the
    # tokenize + md5-bucket fan-out, off the same one-task scan
    g = (
        _spread(docs.select(F.col(id_col), ws.alias("ws")))
        .filter((F.size("ws") > 1) | (F.element_at("ws", 1) != ""))
        .select(id_col, F.explode(grams).alias("gram"))
        .filter(F.col("gram") != "")
    )
    # array_lit: one parsed literal; F.lit(list) converts per element (~0.4 s
    # of driver-side py4j at B=1024 on every query build — round-9 finding,
    # revising the earlier "plan at its floor" note, which had only profiled
    # the EXECUTED plan, not the build)
    ratio = F.element_at(
        array_lit([float(r) for r in ratios]),
        (_gram_bucket(F.col("gram"), buckets) + 1).cast("int"),
    )
    return g.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_grams"),
        F.round(F.avg(ratio), 4).alias("dsir_score"),
    )


def training_shard_layout(
    df: DataFrame, id_col: str, n_shards: int
) -> DataFrame:
    """Deterministic training-shard layout — the writer step between curation
    and training: every row gets a shard (16-bit md5 draw mod ``n_shards``,
    the repo's standard hash-space width) and a within-shard position
    (rank by (md5(id), id) — a pseudo-random order decorrelated from source
    order, i.e. the GLOBAL SHUFFLE training requires, without ever running
    a global sort). Both coordinates are pure functions of the row id, so:

    - the layout is REPRODUCIBLE (re-running the pipeline yields the same
      shard files bit-for-bit — no rand(), no seed plumbing, replays in any
      engine);
    - it is APPEND-STABLE: adding documents can never move an existing
      document to another shard (unlike round-robin or repartition(N),
      where the layout is a function of the whole corpus), so incremental
      corpus updates rewrite only positions within shards, and per-shard
      dedup/state remains valid across versions.

    Scale shape: ONE exchange, keyed by shard — exactly the partitioning
    the writer needs (`df.repartition(n_shards, "shard")` is then a no-op;
    write with `partitionBy("shard")` + `sortWithinPartitions` on the same
    key). The per-shard rank window sorts corpus/n_shards rows inside each
    shard partition — the sort the sorted-shard writer performs anyway,
    never a global one. The 16-bit draw mod n_shards carries the usual
    ≤ 1/65536-per-shard modulo bias — immaterial for file layout; use more
    hex chars if n_shards approaches 2^16. NULL ids are excluded (md5(NULL)
    is NULL and NULL ordering is engine-dependent).

    Every INPUT column is preserved (plus ``shard``/``shard_pos``), so the
    output IS the writer's frame: ``.write.partitionBy("shard")`` after a
    ``repartition(n_shards, "shard")`` + ``sortWithinPartitions("shard_pos")``
    ships payload bytes exactly once — no join back to the corpus by id.
    Pass a pruned projection when only the layout table is wanted."""
    if not (0 < n_shards <= 65536):
        raise ValueError(f"need 0 < n_shards <= 65536, got {n_shards}")
    # the layout appends shard/shard_pos (and a transient __pri) alongside
    # '*'; an input already carrying one of those names would otherwise
    # produce ambiguous duplicate columns downstream
    reserved = {"shard", "shard_pos", "__pri"} & set(df.columns)
    if reserved:
        raise ValueError(
            f"input columns collide with reserved layout names: "
            f"{sorted(reserved)} — rename them before training_shard_layout"
        )
    pri = F.md5(F.col(id_col).cast("string"))
    shard = (
        F.conv(F.substring(pri, 1, 4), 16, 10).cast("long") % n_shards
    ).cast("int")
    w = Window.partitionBy("shard").orderBy("__pri", id_col)
    return (
        df.filter(F.col(id_col).isNotNull())
        .select("*", pri.alias("__pri"), shard.alias("shard"))
        .withColumn("shard_pos", F.row_number().over(w).cast("bigint"))
        .drop("__pri")
    )


def attach_shard_layout(df: DataFrame, id_col: str, n_shards: int) -> DataFrame:
    """:func:`training_shard_layout`'s (shard, shard_pos) attached AT ROW
    GRAIN to a frame whose ``id_col`` repeats — e.g. chunk rows sharing a
    bin. Row-for-row identical to
    ``df.join(training_shard_layout(df.select(id_col).distinct(), ...),
    id_col)`` (law-pinned in tests/test_sampling.py) because ``shard`` is the
    same pure md5 function of the id, and ``dense_rank`` over the same
    (md5(id), id) order assigns every row of an id the id's rank among the
    shard's DISTINCT ids — the ordering key is unique per id, so equal ids
    tie exactly and the dense-rank sequence over distinct ids equals the
    row_number the distinct-grain layout computes.

    Scale shape (r18, the shards-pipeline restructure): ONE hash(shard)
    exchange replaces the distinct-grain composition's THREE data exchanges
    (id distinct + shard window + the id-keyed sort-merge join back, whose
    row side re-sorted the frame at row grain anyway). The window sorts
    corpus/n_shards rows per shard partition — the same sort volume the
    writer's ``sortWithinPartitions`` pays, never a global sort. NULL ids
    are excluded exactly as the join form would drop them (inner join
    against a layout that filters NULL)."""
    if not (0 < n_shards <= 65536):
        raise ValueError(f"need 0 < n_shards <= 65536, got {n_shards}")
    reserved = {"shard", "shard_pos", "__pri"} & set(df.columns)
    if reserved:
        raise ValueError(
            f"input columns collide with reserved layout names: "
            f"{sorted(reserved)} — rename them before attach_shard_layout"
        )
    pri = F.md5(F.col(id_col).cast("string"))
    shard = (
        F.conv(F.substring(pri, 1, 4), 16, 10).cast("long") % n_shards
    ).cast("int")
    w = Window.partitionBy("shard").orderBy("__pri", id_col)
    return (
        df.filter(F.col(id_col).isNotNull())
        .select("*", pri.alias("__pri"), shard.alias("shard"))
        .withColumn("shard_pos", F.dense_rank().over(w).cast("bigint"))
        .drop("__pri")
    )
