"""Planted-case unit tests for dedup, similarity, and text operators (the oracle
harness checks engine-parity; these check the *semantics* against known answers)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from airflow_courier_payout_ledger_pipeline_spark.functions.text import (
    fingerprint,
    predict_lang,
    quality_score,
)
from airflow_courier_payout_ledger_pipeline_spark.operators.dedup import (
    char_shingles,
    exact_dedup,
    lsh_candidate_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash,
    simhash_near_pairs,
    word_ngrams,
)
from airflow_courier_payout_ledger_pipeline_spark.operators.similarity import (
    brute_force_topk,
    bucketed_ann_topk,
    embedding_near_dup_pairs,
)


def _docs(spark, texts):
    return spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")


def test_exact_dedup_collapses_normalized_duplicates(spark):
    df = _docs(spark, ["Hello  World", "hello world", "HELLO\tWORLD", "other text"])
    kept = sorted(r.doc_id for r in exact_dedup(df, "doc_id", "text").collect())
    assert kept == [0, 3]  # min-id representative per group


def test_minhash_identical_docs_have_identical_signatures(spark):
    df = _docs(spark, ["the quick brown fox jumps over the lazy dog"] * 2 + ["something else entirely here"])
    sig = minhash_signatures(char_shingles(df, "doc_id", "text", distinct=False))
    rows = {r.id: tuple(r[f"h{j}"] for j in range(12)) for r in sig.collect()}
    assert rows[0] == rows[1]
    assert rows[0] != rows[2]
    pairs = lsh_candidate_pairs(sig).collect()
    assert [(p.id_a, p.id_b, p.est_jaccard) for p in pairs] == [(0, 1, 1.0)]


def test_ngram_jaccard_known_value(spark):
    # doc0: 4 trigrams {abc,bcd,cde,def}; doc1: 4 trigrams {abc,bcd,cde,dex}
    # → inter=3, union=5, jaccard=0.6
    df = _docs(spark, ["a b c d e f", "a b c d e x"])
    grams = word_ngrams(df, "doc_id", "text", n=3)
    pairs = ngram_jaccard_pairs(grams).collect()
    assert len(pairs) == 1
    assert pairs[0].jaccard == pytest.approx(3 / 5)


def test_ngram_jaccard_doc_freq_cap_bounds_fanout_keeps_exact_values(spark):
    # 24 docs all share one hot trigram; only docs 0/1 are real near-dups.
    # With the cap, the hot gram generates no candidates (no k² fan-out), but
    # the surviving pair's Jaccard is still computed over FULL sets (hot gram
    # included in the intersection) — identical value to the uncapped run.
    texts = ["alpha beta gamma delta epsilon common phrase here"] * 2 + [
        f"filler{i} word{i} extra{i} common phrase here" for i in range(22)
    ]
    grams = word_ngrams(_docs(spark, texts), "doc_id", "text", n=3)
    capped = {(r.id_a, r.id_b): r.jaccard for r in ngram_jaccard_pairs(grams, 0.0, max_doc_freq=10).collect()}
    uncapped = {(r.id_a, r.id_b): r.jaccard for r in ngram_jaccard_pairs(grams, 0.0).collect()}
    assert set(capped) == {(0, 1)}  # hot-gram-only pairs pruned
    assert capped[(0, 1)] == uncapped[(0, 1)] == pytest.approx(1.0)
    assert len(uncapped) == 24 * 23 / 2  # uncapped fans out quadratically


def test_word_ngrams_short_docs_survive_ansi_mode(spark):
    # Spark 4 defaults to ANSI mode: out-of-bounds element_at throws. A doc with
    # fewer than n words must yield one partial n-gram (NULL components skipped
    # by concat_ws), same as the DuckDB oracle's NULL-skipping concat_ws.
    df = _docs(spark, ["only two", "one", "a b c d"])
    grams = {(r.id, r.ngram) for r in word_ngrams(df, "doc_id", "text", n=3).collect()}
    assert (0, "only two") in grams
    assert (1, "one") in grams
    assert (2, "a b c") in grams and (2, "b c d") in grams


def test_simhash_identical_and_near(spark):
    df = _docs(
        spark,
        [
            "spark query engine for big data processing",
            "spark query engine for big data processing",
            "completely different words about cooking recipes",
        ],
    )
    fps = {r.id: r.simhash for r in simhash(df, "doc_id", "text").collect()}
    assert fps[0] == fps[1]
    assert 0 <= fps[0] < 2**32
    pairs = simhash_near_pairs(simhash(df, "doc_id", "text"), 0).collect()
    assert [(p.id_a, p.id_b, p.hamming) for p in pairs] == [(0, 1, 0)]


def _emb(spark, vecs):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )


def test_brute_force_topk_orders_by_cosine(spark):
    emb = _emb(spark, [[1, 0, 0, 0], [0.9, 0.1, 0, 0], [0, 1, 0, 0], [-1, 0, 0, 0]])
    out = brute_force_topk(emb, emb.filter(F.col("vec_id") == 0), k=3)
    got = [(r.neighbor_id, r.rank) for r in out.orderBy("rank").collect()]
    assert got == [(1, 1), (2, 2), (3, 3)]  # 0.9939 > 0.0 > -1.0


def test_ann_restricts_to_bucket_and_documents_recall_tradeoff(spark):
    # vec 3 is the true nearest to vec 0 but lives across the first hyperplane
    emb = _emb(
        spark,
        [
            [1, 1, 1, 1],
            [1, 2, 1, 1],
            [-1, 1, 1, 1],
            [0.99, 1, 1, 1],
        ],
    )
    brute = brute_force_topk(emb, emb.filter(F.col("vec_id") == 0), k=3)
    ann = bucketed_ann_topk(emb, emb.filter(F.col("vec_id") == 0), k=3, bits=4)
    brute_ids = {r.neighbor_id for r in brute.collect()}
    ann_ids = {r.neighbor_id for r in ann.collect()}
    assert 2 not in ann_ids  # across the hyperplane → missed (documented tradeoff)
    assert ann_ids <= brute_ids
    assert 1 in ann_ids and 3 in ann_ids


def test_embedding_near_dup_threshold(spark):
    emb = _emb(spark, [[1, 0], [1, 0.01], [0, 1]])
    pairs = embedding_near_dup_pairs(emb, 0.95)
    assert [(r.id_a, r.id_b) for r in pairs.collect()] == [(0, 1)]


def test_text_quality_and_lang_and_fingerprint(spark):
    df = spark.createDataFrame(
        [
            (0, "The cat and the dog sat on the mat because of the sun and the wind."),
            (1, "El perro y el gato en la casa de la abuela con el sol."),
            (2, "x" * 50),
        ],
        "doc_id long, text string",
    )
    rows = {
        r.doc_id: r
        for r in df.select(
            "doc_id",
            quality_score(F.col("text")).alias("q"),
            predict_lang(F.col("text")).alias("lang"),
            fingerprint(F.col("text")).alias("fp"),
        ).collect()
    }
    assert 0.0 <= rows[2].q <= rows[0].q <= 1.0  # natural text ≥ junk, all bounded
    assert rows[0].lang == "en"
    assert rows[1].lang == "es"
    assert rows[2].lang == "und"
    # fingerprint invariant under case/whitespace
    df2 = spark.createDataFrame(
        [(0, "  the CAT and the dog sat on the mat because of the sun and the wind. ")],
        "doc_id long, text string",
    )
    fp2 = df2.select(fingerprint(F.col("text")).alias("fp")).first().fp
    assert fp2 == rows[0].fp


def test_lsh_probe_is_restriction_of_self_join_pairs(spark):
    """Cross-corpus probe soundness: probing increment sigs against corpus sigs
    must yield exactly the self-join candidate pairs restricted to
    increment x corpus (same bands/rows, no bucket cap), with identical
    estimates."""
    from airflow_courier_payout_ledger_pipeline_spark.operators.dedup import (
        lsh_candidate_pairs,
        lsh_probe_pairs,
        minhash_signatures_inline,
    )

    texts = [
        "the quick brown fox jumps over the lazy dog again and again",
        "the quick brown fox jumps over the lazy dog again and again!",  # near-dup
        "a completely different document about distributed query engines",
        "the quick brown fox jumps over the lazy cat again and again",
        "yet another unrelated text concerning parquet column pruning",
    ]
    docs = _docs(spark, texts)
    sigs = minhash_signatures_inline(docs, "doc_id", "text", k=9, num_hashes=12)
    inc = sigs.filter(F.col("id") % 2 == 0)
    corpus = sigs.filter(F.col("id") % 2 == 1)

    probe = {
        (r.inc_id, r.corpus_id): round(r.est_jaccard, 6)
        for r in lsh_probe_pairs(inc, corpus, 4, 3).collect()
    }
    self_pairs = {}
    for r in lsh_candidate_pairs(sigs, 4, 3).collect():
        a, b = r.id_a, r.id_b
        if a % 2 == 0 and b % 2 == 1:
            self_pairs[(a, b)] = round(r.est_jaccard, 6)
        elif b % 2 == 0 and a % 2 == 1:
            self_pairs[(b, a)] = round(r.est_jaccard, 6)
    assert probe == self_pairs and probe  # non-trivial: the near-dup pair found


def test_lsh_probe_bucket_cap_drops_pile(spark):
    """max_bucket on the probe caps the CORPUS-side bucket population: a pile
    of identical corpus docs larger than the cap produces no candidates."""
    from airflow_courier_payout_ledger_pipeline_spark.operators.dedup import (
        lsh_probe_pairs,
        minhash_signatures_inline,
    )

    pile = ["identical boilerplate text repeated in every mirror copy"] * 6
    docs = _docs(spark, pile)
    sigs = minhash_signatures_inline(docs, "doc_id", "text", k=9, num_hashes=12)
    inc = sigs.filter(F.col("id") == 0)
    corpus = sigs.filter(F.col("id") != 0)
    assert lsh_probe_pairs(inc, corpus, 4, 3, max_bucket=3).count() == 0
    assert lsh_probe_pairs(inc, corpus, 4, 3, max_bucket=10).count() == 5


def test_contrastive_triplets_properties(spark):
    """Structural contract: positive shares the anchor's LSH bucket and is the
    lowest other id there; the negative comes from the fixed pool; neg_is_clean
    ⟺ the negative's bucket differs; lone-bucket anchors emit nothing."""
    import pyspark.sql.functions as F

    from airflow_courier_payout_ledger_pipeline_spark.operators.similarity import (
        contrastive_triplets,
        sign_bucket,
    )

    # 4-dim vectors: bucket = sign bits; ids 0,1,2 share bucket 0 (all negative
    # coords), id 3 is alone in bucket 15, ids 4,5 share bucket 1
    rows = [
        (0, [-1.0, -1.0, -1.0, -1.0]),
        (1, [-2.0, -1.0, -1.0, -1.0]),
        (2, [-3.0, -1.0, -1.0, -1.0]),
        (3, [1.0, 1.0, 1.0, 1.0]),
        (4, [1.0, -1.0, -1.0, -1.0]),
        (5, [2.0, -1.0, -1.0, -1.0]),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {r.anchor_id: r for r in contrastive_triplets(emb).collect()}
    # anchor 3 is alone in its bucket: no triplet
    assert set(got) == {0, 1, 2, 4, 5}
    # positives: lowest OTHER id in the bucket
    assert got[0].positive_id == 1 and got[1].positive_id == 0 and got[2].positive_id == 0
    assert got[4].positive_id == 5 and got[5].positive_id == 4
    buckets = {r.vec_id: r.b for r in emb.select("vec_id", sign_bucket(F.col("embedding")).alias("b")).collect()}
    ids = set(buckets)
    for a, r in got.items():
        assert r.negative_id in ids
        assert r.neg_is_clean == (buckets[r.negative_id] != buckets[a])


def test_contrastive_triplets_empty_corpus_is_typed_empty(spark):
    from airflow_courier_payout_ledger_pipeline_spark.operators.similarity import (
        contrastive_triplets,
    )

    emb = spark.createDataFrame([], "vec_id long, embedding array<double>")
    out = contrastive_triplets(emb)
    assert out.columns == ["anchor_id", "positive_id", "negative_id", "neg_is_clean"]
    assert out.count() == 0


def test_semdedup_pairs_subset_of_global_near_dups_and_cluster_scoped(spark):
    """Cluster scoping trades recall for Σ|cluster|² cost: every reported pair
    must appear in the exact global near-dup set at the same threshold, and
    both members must share the reported cluster; pairs straddling clusters
    are (by design) absent."""
    import pyspark.sql.functions as F

    from airflow_courier_payout_ledger_pipeline_spark.operators.similarity import (
        _assign_to_centroids,
        embedding_near_dup_pairs,
        semdedup_pairs,
    )
    from airflow_courier_payout_ledger_pipeline_spark.plans.tpch_adapter import (
        load_tables,
    )

    emb = load_tables(spark, "/root/testdata/sf0.001", "embeddings")["embeddings"]
    cents = sorted(
        (int(r["vec_id"]), [float(x) for x in r["embedding"]])
        for r in emb.filter(F.col("vec_id") < 8).collect()
    )
    got = semdedup_pairs(emb, cents, 0.38).collect()
    assert got  # threshold chosen so the testdata yields pairs
    global_pairs = {
        (r.id_a, r.id_b) for r in embedding_near_dup_pairs(emb, 0.38).collect()
    }
    clusters = {
        r["vec_id"]: r["c"]
        for r in emb.select(
            "vec_id", _assign_to_centroids(cents, "embedding").alias("c")
        ).collect()
    }
    for r in got:
        assert (r.id_a, r.id_b) in global_pairs
        assert clusters[r.id_a] == r.cluster == clusters[r.id_b]


def test_semdedup_incremental_equals_full_filtered_for_any_split(spark):
    """The O(increment) law: semdedup_pairs_incremental(history, increment)
    must equal semdedup_pairs(history ∪ increment) FILTERED to pairs with at
    least one increment side — for several splits, capped and uncapped.
    History's cluster is supplied (the committed-codes contract), here the
    same deterministic assignment the full form computes."""
    import pyspark.sql.functions as F

    from airflow_courier_payout_ledger_pipeline_spark.operators.similarity import (
        _assign_to_centroids,
        semdedup_pairs,
        semdedup_pairs_incremental,
    )
    from airflow_courier_payout_ledger_pipeline_spark.plans.tpch_adapter import (
        load_tables,
    )

    emb = load_tables(spark, "/root/testdata/sf0.001", "embeddings")["embeddings"]
    cents = sorted(
        (int(r["vec_id"]), [float(x) for x in r["embedding"]])
        for r in emb.filter(F.col("vec_id") < 8).collect()
    )
    nonempty = 0
    for modulus, cap in ((2, None), (3, 10), (5, 3)):
        inc_pred = F.col("vec_id") % modulus == 1
        history = emb.filter(~inc_pred).withColumn(
            "cluster", _assign_to_centroids(cents, "embedding")
        )
        increment = emb.filter(inc_pred)
        got = sorted(
            map(
                tuple,
                semdedup_pairs_incremental(
                    history, increment, cents, 0.38, max_cluster=cap
                ).collect(),
            )
        )
        full = semdedup_pairs(emb, cents, 0.38, max_cluster=cap)
        want = sorted(
            map(
                tuple,
                full.filter(
                    (F.col("id_a") % modulus == 1) | (F.col("id_b") % modulus == 1)
                ).collect(),
            )
        )
        assert got == want, (modulus, cap)
        nonempty += bool(got)
    # the fixture must actually yield pairs somewhere (the tightest cap
    # legitimately shards sf0.001's clusters below pair density)
    assert nonempty >= 2


def test_semdedup_incremental_committed_sizes_match_fallback_and_prune(spark):
    """The O(increment)-in-scan form (r16 verdict item 2): (a) supplying
    corpus_cluster_sizes — the committed index's maintained per-cell counts
    — must produce bit-identical pairs to the fallback that counts the
    pruned history (the shard draw sees the same sizes either way); (b) the
    history side is pruned to increment-touched clusters BEFORE the pair
    join (plan-asserted), so untouched cells' row groups are never read."""
    import pyspark.sql.functions as F

    from airflow_courier_payout_ledger_pipeline_spark.operators.similarity import (
        _assign_to_centroids,
        semdedup_pairs_incremental,
    )
    from airflow_courier_payout_ledger_pipeline_spark.plans.tpch_adapter import (
        load_tables,
    )

    emb = load_tables(spark, "/root/testdata/sf0.001", "embeddings")["embeddings"]
    cents = sorted(
        (int(r["vec_id"]), [float(x) for x in r["embedding"]])
        for r in emb.filter(F.col("vec_id") < 8).collect()
    )
    history = emb.filter(F.col("vec_id") % 2 == 0).withColumn(
        "cluster", _assign_to_centroids(cents, "embedding")
    )
    increment = emb.filter(F.col("vec_id") % 2 == 1)
    # the committed counts the caller would read from ann_list_state:
    # history ∪ increment per-cell sizes
    sizes = [
        (int(r["c"]), int(r["n"]))
        for r in emb.select(_assign_to_centroids(cents, "embedding").alias("c"))
        .groupBy("c")
        .agg(F.count("*").alias("n"))
        .collect()
    ]
    fallback = sorted(
        map(
            tuple,
            semdedup_pairs_incremental(
                history, increment, cents, 0.38, max_cluster=10
            ).collect(),
        )
    )
    supplied = sorted(
        map(
            tuple,
            semdedup_pairs_incremental(
                history,
                increment,
                cents,
                0.38,
                max_cluster=10,
                corpus_cluster_sizes=sizes,
            ).collect(),
        )
    )
    assert supplied == fallback and fallback
    # (b) the pruning filter: a single-cluster increment must leave an
    # IN/equality predicate on history's cluster column in the plan
    one_cell_inc = spark.createDataFrame(
        [(100001, [float(x) for x in cents[0][1]])],
        "vec_id long, embedding array<double>",
    )
    plan = (
        semdedup_pairs_incremental(history, one_cell_inc, cents, 0.38)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    assert "cluster" in plan and ("IN (" in plan or "= 0" in plan or "(0)" in plan), (
        "expected a touched-cluster predicate on the history side:\n" + plan[:2000]
    )


def test_semdedup_incremental_respects_supplied_history_cluster(spark):
    """History pairs are scoped to the cluster history was INDEXED with —
    never re-derived: a history row carrying a (deliberately) different
    cluster must pair inside THAT cluster, which is what makes a later
    quantizer retrain safe for committed history."""
    from airflow_courier_payout_ledger_pipeline_spark.operators.similarity import (
        semdedup_pairs_incremental,
    )

    # two far-apart centroids; one history vector NEAR centroid 0 but
    # committed (historically) to cluster 1, where the increment's vector sits
    cents = [(0, [1.0, 0.0]), (1, [0.0, 1.0])]
    history = spark.createDataFrame(
        [(10, [0.9, 0.1], 1)],  # geometrically cluster 0, committed as 1
        "vec_id long, embedding array<double>, cluster int",
    )
    increment = spark.createDataFrame(
        [(11, [0.8, 0.2])], "vec_id long, embedding array<double>"
    )
    # the increment assigns to cluster 0 (nearest centroid); history sits in
    # its COMMITTED cluster 1 — so no pair, despite high cosine
    out = semdedup_pairs_incremental(history, increment, cents, 0.5)
    assert out.count() == 0
    # re-committed consistently, the pair appears in the committed cluster
    history0 = spark.createDataFrame(
        [(10, [0.9, 0.1], 0)], "vec_id long, embedding array<double>, cluster int"
    )
    rows = semdedup_pairs_incremental(history0, increment, cents, 0.5).collect()
    assert [(r.cluster, r.id_a, r.id_b) for r in rows] == [(0, 10, 11)]


def test_semdedup_incremental_empty_increment_is_empty(spark):
    from airflow_courier_payout_ledger_pipeline_spark.operators.similarity import (
        semdedup_pairs_incremental,
    )

    history = spark.createDataFrame(
        [(1, [0.5, 0.5], 0)], "vec_id long, embedding array<double>, cluster int"
    )
    inc = history.filter("false").drop("cluster")
    out = semdedup_pairs_incremental(history, inc, [(0, [1.0, 0.0])], 0.1)
    assert out.columns == ["cluster", "id_a", "id_b", "sim"]
    assert out.count() == 0


def test_semdedup_pairs_empty_centroids_is_typed_empty(spark):
    from airflow_courier_payout_ledger_pipeline_spark.operators.similarity import (
        semdedup_pairs,
    )

    emb = spark.createDataFrame([(1, [0.5, 0.5])], "vec_id long, embedding array<double>")
    out = semdedup_pairs(emb, [], 0.9)
    assert out.columns == ["cluster", "id_a", "id_b", "sim"]
    assert out.count() == 0


def test_semdedup_max_cluster_caps_fat_cluster_pair_space(spark):
    """One fat Voronoi cell (200 near-identical vectors, a single centroid)
    must NOT produce the unbounded 200·199/2 quadratic tile when max_cluster
    is set: the cluster splits into ceil(200/20)=10 deterministic md5 shards
    and the result is EXACTLY the same-shard subset of the uncapped pairs —
    bounded work, replayable draw (the oracle mirrors it in SQL)."""
    import hashlib
    import math

    from airflow_courier_payout_ledger_pipeline_spark.operators.similarity import (
        semdedup_pairs,
    )

    n, cap = 200, 20
    rows = [(i, [1.0, 0.0]) for i in range(n)]  # all identical → sim 1.0, one cluster
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = [(0, [1.0, 0.0])]

    capped = semdedup_pairs(emb, cents, 0.9, max_cluster=cap).collect()

    shards = math.ceil(n / cap)
    shard_of = {
        i: int(hashlib.md5(f"sem:{i}".encode()).hexdigest()[:4], 16) % shards
        for i in range(n)
    }
    expected = {
        (a, b)
        for a in range(n)
        for b in range(a + 1, n)
        if shard_of[a] == shard_of[b]
    }
    assert {(r.id_a, r.id_b) for r in capped} == expected
    assert len(capped) < n * (n - 1) // 2  # strictly below the quadratic tile
    # Σ s_i·(s_i−1)/2 bound: per-shard pair blocks, never the full cluster²
    sizes: dict[int, int] = {}
    for s in shard_of.values():
        sizes[s] = sizes.get(s, 0) + 1
    assert len(capped) == sum(s * (s - 1) // 2 for s in sizes.values())


def test_zero_norm_embedding_yields_minus_one_cosine_not_a_crash(spark):
    """A zero embedding (empty doc's vector) has undefined cosine: the PINNED
    contract is -1.0 — DuckDB's list_cosine_similarity answer — so both
    engines agree if testdata ever gains a zero-norm vector; it drops out of
    positive threshold filters and ranks deterministically last. Under Spark
    4's default ANSI mode a plain division here kills the whole job
    (hypothesis-found)."""
    from airflow_courier_payout_ledger_pipeline_spark.operators.similarity import (
        brute_force_topk,
        cosine,
        embedding_near_dup_pairs,
    )

    emb = spark.createDataFrame(
        [(0, [0.0, 0.0]), (1, [1.0, 0.0]), (2, [0.9, 0.1])],
        "vec_id long, embedding array<double>",
    )
    pairs = {(r.id_a, r.id_b) for r in embedding_near_dup_pairs(emb, 0.5).collect()}
    assert pairs == {(1, 2)}  # the zero vector pairs with nothing
    top = brute_force_topk(emb, emb.filter("vec_id = 1"), k=2).collect()
    # neighbors ranked: real cosine first; the zero vector's -1.0 sim is last
    assert [r.neighbor_id for r in top] == [2, 0]
    assert [r.sim for r in top][-1] == -1.0
    # NULL input still propagates NULL (both engines agree on that already)
    row = (
        emb.filter("vec_id = 0")
        .select(
            cosine(F.col("embedding"), F.col("embedding")).alias("zz"),
            cosine(F.lit(None).cast("array<double>"), F.col("embedding")).alias("nz"),
        )
        .first()
    )
    assert row["zz"] == -1.0 and row["nz"] is None


def test_containment_catches_embedded_quote_that_jaccard_misses(spark):
    """The asymmetric class: a short doc fully embedded in a long one has
    containment 1.0 but Jaccard far below any dedup threshold — the overlap
    family (quotes, boilerplate wrapping, excerpt reposts) symmetric scores
    are blind to."""
    from airflow_courier_payout_ledger_pipeline_spark.operators.dedup import (
        ngram_containment_pairs,
        ngram_jaccard_pairs,
        word_ngrams,
    )

    quote = "the quick brown fox jumps over the lazy dog"
    filler = " ".join(f"w{i}" for i in range(60))  # 58 distinct filler trigrams
    long_doc = f"{filler} {quote}"
    docs = spark.createDataFrame(
        [(1, quote), (2, long_doc)], "doc_id long, text string"
    )
    grams = word_ngrams(docs, "doc_id", "text", n=3)
    [c] = ngram_containment_pairs(grams, 0.9).collect()
    assert (c.id_a, c.id_b) == (1, 2) and c.containment == 1.0
    jac = ngram_jaccard_pairs(grams, 0.0).collect()
    assert all(r.jaccard < 0.3 for r in jac)  # same pair, sub-threshold Jaccard


def test_span_scrub_removes_shared_spans_and_keeps_unique_text(spark):
    """The rewrite step of Lee et al. 2022: positions covered by a cross-doc
    shared 5-gram are cut; everything else survives verbatim (order intact).
    Docs 1 and 2 share an 8-word run (all its 5-grams match), wrapped in
    distinct prefixes/suffixes; doc 3 shares nothing."""
    from airflow_courier_payout_ledger_pipeline_spark.operators.dedup import (
        duplicated_span_scrub,
    )

    boiler = "one two three four five six seven eight"
    docs = spark.createDataFrame(
        [
            (1, f"intro a {boiler} outro a"),
            (2, f"intro b {boiler} outro b"),
            (3, "totally unrelated text with no overlap at all"),
        ],
        "doc_id long, text string",
    )
    got = {
        r.id: (r.n_words, r.n_dup_words, r.scrubbed_text)
        for r in duplicated_span_scrub(docs, "doc_id", "text").collect()
    }
    # 12 words each. Covered = positions 3-11: the boiler's own grams (starts
    # 3-6) cover 3-10, and the gram at start 7 ("five six seven eight outro")
    # ALSO matches because both docs share the word "outro" — coverage extends
    # through any shared run, not just the planted block. The distinct words
    # ("intro a/b" at 1-2 via differing grams, the trailing a/b at 12) survive.
    assert got[1] == (12, 9, "intro a a")
    assert got[2] == (12, 9, "intro b b")
    # the unique doc is untouched
    assert got[3] == (8, 0, "totally unrelated text with no overlap at all")


def test_span_scrub_consistent_with_span_profile_counts(spark):
    """n_dup_words (positions) and span_profile's n_dup_grams (gram starts)
    measure the same sharing: every doc with dup grams has dup words, covering
    at least as many positions as there are duplicated starts."""
    from airflow_courier_payout_ledger_pipeline_spark.registry import all_queries

    sf = "/root/testdata/sf0.001"
    scrub = {
        r.doc_id: r.n_dup_words
        for r in all_queries()["dedup_span_scrub"](spark, sf).collect()
    }
    prof = {
        r.doc_id: r.n_dup_grams
        for r in all_queries()["dedup_span_profile"](spark, sf).collect()
    }
    assert set(scrub) == set(prof)
    for d, n_grams_dup in prof.items():
        if n_grams_dup > 0:
            assert scrub[d] >= min(n_grams_dup, 1)
        else:
            assert scrub[d] == 0


def test_span_scrub_shuffle_budget(spark):
    """Pinned plan shape: round-robin spread ahead of the gram explode, the
    rolled (ngram, id) agg, the ngram count window, and the per-doc
    collect_set fold — 4 data exchanges total. No separate (id, p) DISTINCT
    exchange (collect_set dedups inside the aggregation), no second corpus
    round-robin on the join side, no SortMergeJoin-forced extra sorts beyond
    the window's, no CartesianProduct."""
    from airflow_courier_payout_ledger_pipeline_spark.registry import all_queries

    df = all_queries()["dedup_span_scrub"](spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    shuffles = [
        line
        for line in plan.splitlines()
        if "Exchange" in line and "BroadcastExchange" not in line
    ]
    assert len(shuffles) <= 4, shuffles
    assert "CartesianProduct" not in plan


def test_semdedup_capped_empty_corpus_is_empty_not_a_crash(spark):
    """Cold start at deployment: persisted centroids + an empty (or fully
    filtered) embedding increment, with the cluster cap ON. The collected
    size table is empty; the literal shard map must degrade to a constant
    divisor, not an empty create_map() whose void key type fails analysis."""
    from airflow_courier_payout_ledger_pipeline_spark.operators.similarity import (
        semdedup_pairs,
    )

    emb = spark.createDataFrame([], "vec_id long, embedding array<double>")
    out = semdedup_pairs(emb, [(0, [1.0, 0.0]), (1, [0.0, 1.0])], 0.5, max_cluster=10)
    assert out.count() == 0
    assert out.columns == ["cluster", "id_a", "id_b", "sim"]


def test_lsh_null_text_docs_do_not_collapse_into_one_bucket(spark):
    """NULL-text docs carry all-NULL signatures; concat_ws skips NULLs, so
    without a guard every such doc's band hash degenerates to md5('') and the
    whole NULL pile pairs quadratically. They must emit NO candidates (no
    content -> no near-dup signature); real docs are unaffected."""
    from airflow_courier_payout_ledger_pipeline_spark.operators.dedup import (
        lsh_candidate_pairs,
        minhash_signatures_inline,
    )

    docs = spark.createDataFrame(
        [(0, None), (1, None), (2, None),
         (3, "the quick brown fox jumps over the lazy dog"),
         (4, "the quick brown fox jumps over the lazy dog")],
        "doc_id long, text string",
    )
    sig = minhash_signatures_inline(docs, "doc_id", "text")
    pairs = {(r.id_a, r.id_b) for r in lsh_candidate_pairs(sig).collect()}
    assert pairs == {(3, 4)}


def test_lsh_bucket_cap_filters_before_collecting(spark):
    """The skew cap must bound aggregation memory, not just output: the plan
    filters bucket rows via a window count BEFORE collect_list, so a
    pathological identical-content pile is never materialized as one array.
    Results are identical to the old post-collect filter (pinned here)."""
    from airflow_courier_payout_ledger_pipeline_spark.operators.dedup import (
        lsh_candidate_pairs,
        minhash_signatures_inline,
    )

    texts = [(i, "identical boilerplate content repeated everywhere") for i in range(8)]
    texts += [(100, "something unique first"), (101, "something unique first")]
    docs = spark.createDataFrame(texts, "doc_id long, text string")
    sig = minhash_signatures_inline(docs, "doc_id", "text")
    capped = lsh_candidate_pairs(sig, max_bucket=5)
    # the 8-doc pile exceeds the cap -> no pairs from it; the small pair stays
    assert {(r.id_a, r.id_b) for r in capped.collect()} == {(100, 101)}
    plan = capped._jdf.queryExecution().executedPlan().toString()
    # the cap is a pre-collect window filter, not a post-collect size filter
    assert "windowspecdefinition" in plan.lower() or "Window" in plan


def test_pq_codes_reject_codebooks_beyond_tinyint(spark):
    """Codes >= 128 overflow the signed TINYINT cast under ANSI mode at
    runtime; the guard must raise at construction instead."""
    import pytest as _pytest

    from airflow_courier_payout_ledger_pipeline_spark.operators.similarity import (
        pq_encode,
    )

    emb = spark.createDataFrame([(0, [1.0, 2.0])], "vec_id long, embedding array<float>")
    with _pytest.raises(ValueError, match="SMALLINT"):
        pq_encode(emb, [[[float(c)] for c in range(129)], [[0.0]]])


def test_near_dup_pairs_scale_guard_requires_explicit_quadratic_optin(spark):
    """r11 verdict item 4: past the comparison budget the exact Ω(n²) tiling
    must refuse with the sub-quadratic alternatives named, run only under an
    explicit allow_quadratic=True, and leave in-budget calls untouched."""
    import pytest as _pytest

    from airflow_courier_payout_ledger_pipeline_spark.operators.similarity import (
        embedding_near_dup_pairs,
    )

    emb = spark.createDataFrame(
        [(i, [float(i % 3), float(i % 5)]) for i in range(20)],
        "vec_id long, embedding array<float>",
    )
    with _pytest.raises(ValueError, match="allow_quadratic"):
        embedding_near_dup_pairs(emb, 0.5, max_comparisons=10)
    # explicit opt-in runs, and matches the default in-budget result
    opted = {(r.id_a, r.id_b) for r in embedding_near_dup_pairs(
        emb, 0.5, max_comparisons=10, allow_quadratic=True).collect()}
    default = {(r.id_a, r.id_b) for r in embedding_near_dup_pairs(emb, 0.5).collect()}
    assert opted == default and default


def test_lsh_dropped_buckets_accounts_for_cap_loss(spark):
    """The dropped-bucket report is the exact complement of the capped
    candidate path: a pile over the cap appears in the report with its size
    and suppressed-pair count (size·(size−1)/2 per band), a corpus under the
    cap yields an empty report, and pairs dropped by the NULL-pile sentinel
    (not the cap) never show up."""
    from airflow_courier_payout_ledger_pipeline_spark.operators.dedup import (
        lsh_candidate_pairs,
        lsh_dropped_buckets,
        minhash_signatures_inline,
    )

    pile = ["identical boilerplate text repeated in every mirror copy"] * 6 + [
        "a genuinely different document about couriers"
    ]
    docs = _docs(spark, pile)
    sigs = minhash_signatures_inline(docs, "doc_id", "text", k=9, num_hashes=12)

    # cap below the pile: candidates vanish, report accounts for every band
    assert lsh_candidate_pairs(sigs, 4, 3, max_bucket=3).count() == 0
    rep = lsh_dropped_buckets(sigs, 4, 3, max_bucket=3).collect()
    assert len(rep) == 4  # the identical pile collides in all 4 bands
    assert all(r.bucket_size == 6 and r.pairs_suppressed == 15 for r in rep)

    # cap above the pile: nothing dropped, report is the harmless-certificate
    assert lsh_dropped_buckets(sigs, 4, 3, max_bucket=10).count() == 0
    assert lsh_candidate_pairs(sigs, 4, 3, max_bucket=10).count() == 15

    # NULL-text docs are sentinel-dropped, not cap-dropped: no report rows
    null_docs = spark.createDataFrame(
        [(i, None) for i in range(8)], "doc_id long, text string"
    )
    nsigs = minhash_signatures_inline(null_docs, "doc_id", "text", k=9, num_hashes=12)
    assert lsh_dropped_buckets(nsigs, 4, 3, max_bucket=2).count() == 0


def test_semdedup_indexed_centroids_roundtrip_and_pairs_match_literal_form(
    spark, tmp_path
):
    """The r14 verdict item 5 law: SemDeDup served from the persisted index
    must be ROW-IDENTICAL to the literal-centroid form built with the same
    quantizer — load_index_artifacts returns the centroids the index was
    BUILT with bit-exactly (parquet doubles round-trip), so assignment,
    shard draw, and pair scan cannot diverge. The only thing the indexed
    form changes is the centroid SOURCE."""
    import pyspark.sql.functions as F

    from airflow_courier_payout_ledger_pipeline_spark.operators.annindex import (
        build_residual_ivfpq_index,
        load_index_artifacts,
    )
    from airflow_courier_payout_ledger_pipeline_spark.operators.similarity import (
        kmeans_centroids_exact,
        pq_codebooks_exact,
        residual_frame,
        semdedup_pairs,
    )
    from airflow_courier_payout_ledger_pipeline_spark.plans.tpch_adapter import (
        load_tables,
    )
    from airflow_courier_payout_ledger_pipeline_spark.sources.lakehouse import (
        Lakehouse,
    )

    emb = load_tables(spark, "/root/testdata/sf0.001", "embeddings")["embeddings"]
    cents = kmeans_centroids_exact(emb, k=4, iters=1)
    res = residual_frame(emb, cents).select("vec_id", "__res")
    books = pq_codebooks_exact(res, m=2, kc=2, iters=1, vec_col="__res")
    lake = Lakehouse(str(tmp_path))
    build_residual_ivfpq_index(lake, "idx", emb, cents, books)

    loaded, _books = load_index_artifacts(lake, "idx", spark)
    assert loaded == cents  # bit-exact centroid round-trip through parquet

    lit_rows = sorted(map(tuple, semdedup_pairs(emb, cents, 0.38, max_cluster=40).collect()))
    idx_rows = sorted(map(tuple, semdedup_pairs(emb, loaded, 0.38, max_cluster=40).collect()))
    assert lit_rows == idx_rows and lit_rows


def test_spread_corpus_gate_is_conditional(spark, tmp_path):
    """r18 (r17 verdict item 7): the corpus spread must fire on a deficient
    scan (single small file — the testdata shape), must NOT re-spread a frame
    whose lineage already carries a repartition (the eval rails hoist ONE
    shared spread across variant arms), and must NOT add a shuffle when the
    file scan already splits to at least the session parallelism (a
    multi-split production table)."""
    from airflow_courier_payout_ledger_pipeline_spark.operators.similarity import (
        _spread_corpus,
    )

    one = str(tmp_path / "one_file")
    spark.range(64).selectExpr(
        "id AS vec_id", "array(CAST(id AS FLOAT)) AS embedding"
    ).coalesce(1).write.parquet(one)
    single = spark.read.parquet(one).select("vec_id", "embedding")
    spread = _spread_corpus(single)
    assert spread is not single
    assert "Repartition" in spread._jdf.queryExecution().logical().toString()

    # already-spread lineage: identity, no second exchange
    assert _spread_corpus(spread) is spread
    assert _spread_corpus(spread.select("vec_id", "embedding")) is not None
    again = _spread_corpus(spread.select("vec_id", "embedding"))
    assert (
        again._jdf.queryExecution().logical().toString().count("Repartition") == 1
    )

    many = str(tmp_path / "many_files")
    n_files = spark.sparkContext.defaultParallelism + 1
    spark.range(64).selectExpr(
        "id AS vec_id", "array(CAST(id AS FLOAT)) AS embedding"
    ).repartition(n_files).write.parquet(many)
    multi = spark.read.parquet(many).select("vec_id", "embedding")
    assert len(multi.inputFiles()) >= spark.sparkContext.defaultParallelism
    assert _spread_corpus(multi) is multi
