"""Property-based spot checks (SURVEY.md §5.4): randomized inputs, invariants
from the reference DDLs, and independent pure-Python reference implementations.
Few examples per property (each runs real Spark jobs); hypothesis still explores
the edge space (empty groups, all-unrated, ties) far better than hand cases.
"""

from __future__ import annotations

from bisect import bisect_right
from decimal import ROUND_HALF_UP, Decimal

import hypothesis.strategies as st
import numpy as np
from hypothesis import HealthCheck, example, given, settings

SET = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)


def _d2(x) -> Decimal:
    return Decimal(x).quantize(Decimal("0.01"), rounding=ROUND_HALF_UP)


# --- mart invariants (sql/courier_ledger_update.sql, DDL_cdm.dm_courier_ledger) -----

deliveries_strategy = st.lists(
    st.tuples(
        st.integers(1, 3),                                  # courier
        st.integers(1, 4),                                  # order
        st.integers(100, 100_000),                          # order_sum cents
        st.integers(0, 5),                                  # rating (0 = unrated)
        st.integers(0, 20_000),                             # tips cents
        st.integers(1, 3),                                  # month
    ),
    min_size=1,
    max_size=25,
)


@SET
@given(rows=deliveries_strategy)
def test_mart_invariants_on_random_deliveries(spark, rows):
    from airflow_courier_payout_ledger_pipeline_spark.plans.ledger import courier_ledger

    deliveries = spark.createDataFrame(
        [
            (
                i,
                f"{oid}-{m}",
                oid * 10 + m,
                Decimal(cents) / 100,
                c,
                r,
                Decimal(tips) / 100,
            )
            for i, (c, oid, cents, r, tips, m) in enumerate(rows)
        ],
        "id long, delivery_key string, order_id long, order_sum decimal(14,2), "
        "courier_id long, rating smallint, tips decimal(14,2)",
    )
    dm_couriers = spark.createDataFrame(
        [(c, f"C{c}") for c in {r[0] for r in rows}], "id long, courier_name string"
    )
    dm_orders = spark.createDataFrame(
        [(oid * 10 + m, 1000 + m) for oid, m in {(r[1], r[5]) for r in rows}],
        "id long, timestamp_id long",
    )
    dm_timestamps = spark.createDataFrame(
        [(1000 + m, 2023, m) for m in {r[5] for r in rows}],
        "id long, year smallint, month smallint",
    )
    out = courier_ledger(deliveries, dm_couriers, dm_orders, dm_timestamps).collect()

    # reference aggregation in exact Decimal
    groups: dict = {}
    for c, oid, cents, r, tips, m in rows:
        g = groups.setdefault((str(c), 2023, m), {"n": 0, "sum": Decimal(0), "tips": Decimal(0), "rates": []})
        g["n"] += 1
        g["sum"] += Decimal(cents) / 100
        g["tips"] += Decimal(tips) / 100
        if 1 <= r <= 5:
            g["rates"].append(r)

    assert len(out) == len(groups)  # mart unique on (courier, year, month)
    tiers = [(4, Decimal("0.05"), 100), (Decimal("4.5"), Decimal("0.07"), 150),
             (Decimal("4.9"), Decimal("0.08"), 175), (None, Decimal("0.10"), 200)]
    for row in out:
        g = groups[(row.courier_id, row.settlement_year, row.settlement_month)]
        assert row.orders_count == g["n"]
        assert row.orders_total_sum == g["sum"]
        assert row.courier_tips_sum == g["tips"]
        assert row.order_processing_fee == _d2(g["sum"] * Decimal("0.25"))
        if not g["rates"]:
            # §2.3 NULL hazard: all-unrated month → NULL payout chain
            assert row.rate_avg is None and row.courier_order_sum is None
            continue
        avg = Decimal(sum(g["rates"])) / len(g["rates"])
        pct, floor_unit = next(
            (p, f) for cut, p, f in tiers if cut is None or avg < cut
        )
        payout = max(g["sum"] * pct, Decimal(floor_unit * g["n"]))
        assert row.courier_order_sum == _d2(payout)
        assert row.courier_reward_sum == _d2(payout + g["tips"] * Decimal("0.95"))


# --- as-of join vs bisect reference -------------------------------------------------

asof_strategy = st.tuples(
    st.lists(st.tuples(st.integers(0, 2), st.integers(0, 50)), min_size=1, max_size=20),
    st.lists(st.tuples(st.integers(0, 2), st.integers(0, 50)), min_size=0, max_size=10),
)


@SET
@given(data=asof_strategy)
def test_asof_join_matches_bisect_reference(spark, data):
    from airflow_courier_payout_ledger_pipeline_spark.operators.asof import asof_join

    lefts, rights = data
    rights = sorted({(k, t) for k, t in rights})  # unique per (key, ts)
    left = spark.createDataFrame(
        [(i, k, t) for i, (k, t) in enumerate(lefts)], "lid int, k int, ts int"
    )
    right = spark.createDataFrame(
        [(k, t, f"p{k}:{t}") for k, t in rights] or [],
        "k int, rts int, payload string",
    )
    out = {
        r.lid: (r.rts_asof, r.payload)
        for r in asof_join(left, right, "k", "ts", "rts", ["payload"]).collect()
    }
    by_key: dict = {}
    for k, t in rights:
        by_key.setdefault(k, []).append(t)
    for lid, (k, t) in enumerate(lefts):
        ts_list = by_key.get(k, [])
        i = bisect_right(ts_list, t)  # backward-inclusive
        expect = (ts_list[i - 1], f"p{k}:{ts_list[i - 1]}") if i else (None, None)
        assert out[lid] == expect
    assert len(out) == len(lefts)


# --- tiled near-dup ≡ numpy brute force ---------------------------------------------

vectors_strategy = st.lists(
    st.lists(st.integers(-5, 5), min_size=4, max_size=4).filter(lambda v: any(v)),
    min_size=2,
    max_size=15,
)


@SET
@given(vecs=vectors_strategy)
def test_tiled_near_dup_equals_brute_force(spark, vecs):
    from airflow_courier_payout_ledger_pipeline_spark.operators.similarity import (
        embedding_near_dup_pairs,
    )

    emb = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )
    got = {(r.id_a, r.id_b) for r in embedding_near_dup_pairs(emb, 0.5, num_blocks=4).collect()}
    X = np.array(vecs, dtype=np.float64)
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    S = np.round(Xn @ Xn.T, 4)
    expect = {
        (i, j)
        for i in range(len(vecs))
        for j in range(i + 1, len(vecs))
        if S[i, j] >= 0.5
    }
    assert got == expect


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=30),
            st.sampled_from(["x", "y", "z", None]),
        ),
        max_size=25,
    ),
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=30),
            st.sampled_from(["x", "y", "z", None]),
        ),
        max_size=25,
    ),
)
@SET
def test_snapshot_diff_changelog_replays_old_to_new(spark, old_rows, new_rows):
    """Applying the diff to the old snapshot must reproduce the new snapshot
    exactly: upsert added+changed, delete removed — the CDC replay contract."""
    from pyspark.sql import functions as F

    from airflow_courier_payout_ledger_pipeline_spark.operators.merge import (
        scd1_upsert,
        snapshot_diff,
    )

    dedup_old = {k: v for k, v in old_rows}
    dedup_new = {k: v for k, v in new_rows}
    old = spark.createDataFrame(
        [(k, v) for k, v in dedup_old.items()] or [(None, None)], "k int, v string"
    ).filter(F.col("k").isNotNull())
    new = spark.createDataFrame(
        [(k, v) for k, v in dedup_new.items()] or [(None, None)], "k int, v string"
    ).filter(F.col("k").isNotNull())

    diff = snapshot_diff(old, new, ["k"], ["v"]).cache()
    upserts = diff.filter(F.col("change_type").isin("added", "changed")).select(
        "k", F.col("new_v").alias("v")
    )
    removed = diff.filter(F.col("change_type") == "removed").select("k")
    replayed = scd1_upsert(old, upserts, ["k"]).join(removed, "k", "left_anti")

    assert {(r.k, r.v) for r in replayed.collect()} == {
        (k, v) for k, v in dedup_new.items()
    }
    diff.unpersist()


# --- round-5 operators: BM25 vs a pure-Python replica, CMS one-sided error ----------

corpus_strategy = st.lists(
    st.lists(st.sampled_from(["ant", "bee", "cat", "dog", "elk", "fox"]), min_size=0, max_size=8),
    min_size=1,
    max_size=10,
)


@SET
@given(docs=corpus_strategy)
def test_bm25_matches_pure_python_reference_on_random_corpora(spark, docs):
    """The whole formula — raw-odds idf, k1/b saturation, fixed-order fold,
    top-k with (score desc, id) ties — against an independent float replica.
    Equality is EXACT (==): every engine op is a single correctly-rounded IEEE
    step mirrored in the replica, which is the property the DuckDB oracle
    relies on."""
    from airflow_courier_payout_ledger_pipeline_spark.operators.search import bm25_topk

    terms = ["bee", "dog"]
    rows = [(i, " ".join(ws)) for i, ws in enumerate(docs)]
    got = {
        r["doc_id"]: (r["bm25"], r["rank"])
        for r in bm25_topk(
            spark.createDataFrame(rows, "doc_id long, text string"), terms, k=5
        ).collect()
    }

    toks = {i: ws for i, ws in enumerate(docs) if ws}
    if not toks:
        assert got == {}
        return
    n, sum_dl = len(toks), sum(len(w) for w in toks.values())
    avgdl = sum_dl / n
    k1, b = 1.2, 0.75

    def score(ws, t):
        tf = ws.count(t)
        if tf == 0:
            return 0.0
        df = sum(1 for w in toks.values() if t in w)
        return ((n - df + 0.5) / (df + 0.5)) * (
            (tf * (k1 + 1.0)) / (tf + k1 * (1.0 - b + (b * len(ws)) / avgdl))
        )

    want = {
        i: score(ws, terms[0]) + score(ws, terms[1])
        for i, ws in toks.items()
        if any(t in ws for t in terms)
    }
    ranked = sorted(want, key=lambda i: (-want[i], i))[:5]
    assert set(got) == set(ranked)
    for rank, i in enumerate(ranked, 1):
        assert got[i] == (want[i], rank), (i, got[i], want[i])


@SET
@given(
    values=st.lists(st.sampled_from(list("abcdefgh")), min_size=1, max_size=60),
    width=st.sampled_from([4, 16, 1024]),
)
def test_cms_one_sided_error_holds_at_any_width(spark, values, width):
    """The heavy-hitters prune is sound iff estimate ≥ exact for EVERY value —
    including tiny widths where collisions are guaranteed. (Exactness at the
    default width is a separate, dataset-specific test.)"""
    from collections import Counter

    from airflow_courier_payout_ledger_pipeline_spark.operators.sketch import (
        cms_estimate,
        cms_state,
    )

    df = spark.createDataFrame([(v,) for v in values], "term string")
    state = cms_state(df, "term", width=width)
    est = {
        r["term"]: r["freq_est"]
        for r in cms_estimate(df.distinct(), state, "term", width=width).collect()
    }
    exact = Counter(values)
    for t, c in exact.items():
        assert est[t] >= c, (t, est[t], c, width)


vec_corpus_strategy = st.lists(
    st.lists(st.floats(-1.0, 1.0, allow_nan=False, width=32), min_size=4, max_size=4),
    min_size=2,
    max_size=14,
)


@SET
@given(vecs=vec_corpus_strategy)
def test_semdedup_pairs_subset_property_on_random_vectors(spark, vecs):
    """For ANY corpus: cluster-scoped pairs ⊆ exact global pairs at the same
    threshold, and both members of every pair share the reported cluster —
    the recall trade is the ONLY difference from the exact twin."""
    import pyspark.sql.functions as F

    from airflow_courier_payout_ledger_pipeline_spark.operators.similarity import (
        _assign_to_centroids,
        embedding_near_dup_pairs,
        semdedup_pairs,
    )

    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = sorted((i, v) for i, v in rows[: min(3, len(rows))])
    got = semdedup_pairs(emb, cents, 0.2).collect()
    global_pairs = {(r.id_a, r.id_b) for r in embedding_near_dup_pairs(emb, 0.2).collect()}
    clusters = {
        r["vec_id"]: r["c"]
        for r in emb.select(
            "vec_id", _assign_to_centroids(cents, "embedding").alias("c")
        ).collect()
    }
    for r in got:
        assert (r.id_a, r.id_b) in global_pairs
        assert clusters[r.id_a] == r.cluster == clusters[r.id_b]


@SET
@given(
    words=st.lists(
        st.text(alphabet="abc", min_size=1, max_size=6), min_size=1, max_size=12
    ),
    merges=st.lists(
        st.sampled_from(["a b", "b a", "a a", "c c", "ab c", "b c"]),
        min_size=0,
        max_size=3,
        unique=True,
    ),
)
# The round-7 judge's falsifying example for the old raw-replace replica:
# 'b ab' raw-contains 'b a' across the 'ab' symbol boundary. Pinned explicitly
# (not just in .hypothesis/examples) so the regression stays covered on any
# fresh checkout.
@example(words=["bab"], merges=["a b", "b a"])
def test_bpe_encode_counts_matches_python_replica(spark, words, merges):
    """Encoding under ANY merge list equals a pure-Python replay of the same
    greedy left-to-right BOUNDARY-ANCHORED replace chain — token counts are
    exact integers, so equality is exact. The replica mirrors
    ``_merge_pair_expr``'s padding trick (double inter-symbol gaps, wrap ends,
    literal-replace the padded pair, un-pad): a raw ``seq.replace(m, ...)``
    would merge ACROSS symbol boundaries (e.g. 'b ab' raw-contains 'b a'
    straddling the 'ab' symbol — a merge BPE never performs)."""
    from airflow_courier_payout_ledger_pipeline_spark.operators.tokenize import (
        bpe_encode_counts,
    )

    docs = spark.createDataFrame([(1, " ".join(words))], "doc_id long, text string")
    [row] = bpe_encode_counts(docs, merges).collect()

    def merge_once(seq, m):
        padded = " " + seq.replace(" ", "  ") + " "
        rep = padded.replace(
            " " + m.replace(" ", "  ") + " ", " " + m.replace(" ", "") + " "
        )
        return rep.replace("  ", " ").strip()

    def encode(word):
        seq = " ".join(word)
        for m in merges:
            seq = merge_once(seq, m)
        return len(seq.split(" "))

    assert row.n_words == len(words)
    assert row.bpe_tokens == sum(encode(w) for w in words)


# --- duplicated-span scrub vs pure-Python reference ----------------------------------

scrub_corpus_strategy = st.lists(
    st.lists(st.sampled_from(list("abcd")), min_size=0, max_size=12).map(" ".join),
    min_size=2,
    max_size=8,
)


@SET
@given(texts=scrub_corpus_strategy)
def test_span_scrub_matches_python_reference(spark, texts):
    """Differential check over a tiny 4-word alphabet (dense gram collisions,
    sub-n docs, empty docs): the distributed scrub must equal an independent
    pure-Python implementation of the same contract — positions covered by an
    n-gram occurring in >= 2 distinct docs are cut, the rest survive in
    order."""
    from airflow_courier_payout_ledger_pipeline_spark.operators.dedup import (
        duplicated_span_scrub,
    )

    n = 3  # denser collisions than the query's 5 at these lengths
    docs = list(enumerate(texts))

    # reference: same normalize (lower/collapse/trim is identity here), same
    # partial-gram rule (one gram from start 1, NULL-skipping join)
    words = {i: t.split(" ") for i, t in docs}  # '' splits to ['']
    grams: dict[int, list[tuple[int, str]]] = {}
    for i, ws in words.items():
        out = []
        for s in range(1, max(len(ws) - (n - 1), 1) + 1):
            out.append((s, " ".join(w for w in ws[s - 1 : s + n - 1])))
        grams[i] = out
    by_gram: dict[str, set[int]] = {}
    for i, gs in grams.items():
        for _, g in gs:
            by_gram.setdefault(g, set()).add(i)
    want = {}
    for i, ws in words.items():
        cov = set()
        for s, g in grams[i]:
            if len(by_gram[g]) >= 2:
                cov.update(range(s, min(s + n - 1, len(ws)) + 1))
        kept = [w for p, w in enumerate(ws, 1) if p not in cov]
        want[i] = (len(ws), len(cov), " ".join(kept))

    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r.id: (r.n_words, r.n_dup_words, r.scrubbed_text)
        for r in duplicated_span_scrub(df, "doc_id", "text", n=n).collect()
    }
    assert got == want


# --- mergeable bloom state laws under random inputs ---------------------------------

bloom_strategy = st.tuples(
    st.lists(st.text(alphabet="abcdef", min_size=1, max_size=6), min_size=1, max_size=30),
    st.lists(st.text(alphabet="abcdef", min_size=1, max_size=6), min_size=0, max_size=30),
    st.integers(0, 2**31),
)


@SET
@given(data=bloom_strategy)
def test_bloom_merge_and_no_false_negatives_on_random_sets(spark, data):
    """Any member set, any 2-way split (random salt): merged state ≡ direct
    build row-for-row, every member passes the probe (no false negatives),
    and exact verification of the candidates recovers exactly the true
    membership — regardless of bloom false positives on the probe set."""
    from pyspark.sql import functions as F

    from airflow_courier_payout_ledger_pipeline_spark.operators.bloom import (
        bloom_build,
        bloom_might_contain_expr,
        merge_bloom_states,
    )

    members, probes, salt = data
    m = spark.createDataFrame([(v,) for v in members], "v string")
    split = F.abs(F.xxhash64("v", F.lit(salt))) % 2
    merged = merge_bloom_states(
        bloom_build(m.filter(split == 0), "v", m_bits=1 << 10, k=3),
        bloom_build(m.filter(split == 1), "v", m_bits=1 << 10, k=3),
    )
    direct = bloom_build(m, "v", m_bits=1 << 10, k=3)
    assert sorted(tuple(r) for r in merged.collect()) == sorted(
        tuple(r) for r in direct.collect()
    )
    state = merged.collect()
    assert m.filter(bloom_might_contain_expr(state, "v")).count() == m.count()
    p = spark.createDataFrame([(v,) for v in set(members) | set(probes)], "v string")
    cand = p.filter(bloom_might_contain_expr(state, "v"))
    verified = {r.v for r in cand.join(m.distinct(), "v", "left_semi").collect()}
    assert verified == set(members)


# --- mergeable exact-quantile state vs a pure-Python reference ----------------------

quantile_strategy = st.tuples(
    st.lists(st.integers(-50, 50), min_size=1, max_size=40),
    st.integers(0, 2**31),
)


@SET
@given(data=quantile_strategy)
def test_quantile_state_matches_pure_python_order_statistics(spark, data):
    """Any multiset, any 2-way split: merged histogram ≡ direct build, and
    p50/p90/p99 equal the independent reference (smallest value whose
    cumulative count·den ≥ num·N — the ⌈p·N⌉-th order statistic)."""
    from pyspark.sql import functions as F

    from airflow_courier_payout_ledger_pipeline_spark.operators.quantile import (
        histogram_state,
        merge_histogram_states,
        quantiles_from_state,
    )

    vals, salt = data
    df = spark.createDataFrame(
        [("g", v, i) for i, v in enumerate(vals)], "grp string, v long, i long"
    )
    split = F.abs(F.xxhash64("i", F.lit(salt))) % 2
    merged = merge_histogram_states(
        histogram_state(df.filter(split == 0), ["grp"], "v"),
        histogram_state(df.filter(split == 1), ["grp"], "v"),
        ["grp"],
    )
    direct = histogram_state(df, ["grp"], "v")
    assert sorted(tuple(r) for r in merged.collect()) == sorted(
        tuple(r) for r in direct.collect()
    )
    row = quantiles_from_state(merged, ["grp"]).collect()[0]

    def ref(num, den):
        s, n = sorted(vals), len(vals)
        cum = 0
        for v in s:
            cum += 1
            if cum * den >= num * n:
                return v
        return s[-1]

    assert (row.n_values, row.p50, row.p90, row.p99) == (
        len(vals), ref(1, 2), ref(9, 10), ref(99, 100),
    )


# --- CMS merge law + one-sidedness under random inputs ------------------------------

cms_strategy = st.tuples(
    st.lists(st.text(alphabet="xyz", min_size=1, max_size=3), min_size=1, max_size=40),
    st.integers(0, 2**31),
)


@SET
@given(data=cms_strategy)
def test_cms_merge_law_and_one_sidedness_on_random_multisets(spark, data):
    """Any multiset, any 2-way split: merged CMS ≡ direct build bucket-exact,
    and every estimate ≥ the true count (the one-sided guarantee the
    heavy-hitter prune relies on)."""
    from collections import Counter

    from pyspark.sql import functions as F

    from airflow_courier_payout_ledger_pipeline_spark.operators.sketch import (
        cms_probe_expr,
        cms_state,
        merge_cms_states,
    )

    vals, salt = data
    df = spark.createDataFrame(
        [(v, i) for i, v in enumerate(vals)], "v string, i long"
    )
    split = F.abs(F.xxhash64("i", F.lit(salt))) % 2
    merged = merge_cms_states(
        cms_state(df.filter(split == 0), "v", width=64),
        cms_state(df.filter(split == 1), "v", width=64),
    )
    direct = cms_state(df, "v", width=64)
    assert sorted(tuple(r) for r in merged.collect()) == sorted(
        tuple(r) for r in direct.collect()
    )
    state = merged.collect()
    truth = Counter(vals)
    est = {
        r.v: r.e
        for r in df.select("v").distinct()
        .select("v", cms_probe_expr(state, "v", width=64).alias("e"))
        .collect()
    }
    assert all(est[v] >= c for v, c in truth.items())


# --- sliding-window chunking (operators/tokenize.chunk_documents) -------------------

chunk_strategy = st.tuples(
    st.lists(st.integers(0, 400), min_size=1, max_size=6),  # token counts per doc
    st.integers(1, 12),                                      # window
    st.integers(1, 12),                                      # stride (capped to window)
)


@SET
@given(data=chunk_strategy)
def test_chunking_covers_every_token_against_python_reference(spark, data):
    """Pure-Python replica: every token position is covered by at least one
    chunk, mid chunks are exactly `window` tokens, chunk grid matches the
    BIGINT ceil formula, and stride == window concatenates losslessly."""
    from airflow_courier_payout_ledger_pipeline_spark.operators.tokenize import (
        chunk_documents,
    )

    counts, window, stride = data
    stride = min(stride, window)
    docs = [(i, " ".join(f"w{j}" for j in range(n))) for i, n in enumerate(counts)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        (r.doc_id, r.chunk_id): (r.start_tok, r.n_tokens, r.chunk_text)
        for r in chunk_documents(df, window, stride).collect()
    }

    expect = {}
    for i, n in enumerate(counts):
        if n == 0:
            continue  # wordless docs produce zero chunks
        toks = [f"w{j}" for j in range(n)]
        last_j = 0 if n <= window else -(-(n - window) // stride)
        for j in range(last_j + 1):
            s = j * stride
            sl = toks[s : s + window]
            expect[(i, j)] = (s + 1, len(sl), " ".join(sl))
    assert got == expect
    # coverage: every token index in [1, n] falls inside some chunk
    for i, n in enumerate(counts):
        covered = set()
        for (d, _), (s, ln, _) in expect.items():
            if d == i:
                covered.update(range(s, s + ln))
        assert covered == set(range(1, n + 1))


# --- KMV set-operation readout (operators/sample.kmv_set_estimates) -----------------

kmv_sets_strategy = st.tuples(
    st.sets(st.integers(0, 5000), min_size=1, max_size=120),
    st.sets(st.integers(0, 5000), min_size=1, max_size=120),
    st.sampled_from([4, 16, 64]),
)


@SET
@given(data=kmv_sets_strategy)
def test_kmv_set_estimates_match_python_replica_and_exact_path(spark, data):
    """Pure-Python replica of the full estimator pipeline (md5 draws, merged
    bottom-k, K∩, the exact double arithmetic) — and the exact-path guarantee:
    whenever the merged union holds < k ids, the readout returns true union
    and intersection counts flagged exact."""
    import hashlib
    import math

    from airflow_courier_payout_ledger_pipeline_spark.operators.sample import (
        kmv_set_estimates,
        sample_state,
    )

    a_ids, b_ids, k = data
    dfa = spark.createDataFrame([(i,) for i in a_ids], "id long")
    dfb = spark.createDataFrame([(i,) for i in b_ids], "id long")
    sa = sample_state(dfa, [], "id", k)
    sb = sample_state(dfb, [], "id", k)
    r = kmv_set_estimates(sa, sb, [], "id", k).collect()[0]

    def h(i):
        return hashlib.md5(str(i).encode()).hexdigest()

    bk = lambda ids: sorted((h(i), i) for i in ids)[:k]  # noqa: E731
    sa_py, sb_py = bk(a_ids), bk(b_ids)
    uni = sorted(set(sa_py) | set(sb_py))[:k]
    rows = len(uni)
    kboth = sum(1 for e in uni if e in set(sa_py) and e in set(sb_py))
    if rows < k:
        want = (rows, kboth, True)
    else:
        uk = int(uni[-1][0][:12], 16) / float(1 << 48)
        want = (
            math.floor((k - 1) / uk),
            math.floor(float(kboth * (k - 1)) / (uk * k)),
            False,
        )
    assert (r.union_est, r.inter_est, r.exact) == want
    if r.exact:
        assert r.union_est == len(a_ids | b_ids)
        assert r.inter_est == len(a_ids & b_ids)


# --- MAD outlier audit (operators/quantile.mad_outlier_stats) -----------------------

mad_strategy = st.lists(
    st.tuples(st.integers(0, 2), st.integers(-1000, 1000)),
    min_size=1,
    max_size=60,
)


@SET
@given(rows=mad_strategy)
def test_mad_audit_matches_python_order_statistic_replica(spark, rows):
    """Pure-Python replica using the same lower-median (⌈N/2⌉-th order
    statistic) convention: median, MAD, and the |v-med| > 3·MAD count agree
    on random multisets including negatives, ties, and singleton groups."""
    from airflow_courier_payout_ledger_pipeline_spark.operators.quantile import (
        mad_outlier_stats,
    )

    df = spark.createDataFrame(
        [(f"g{g}", v) for g, v in rows], "grp string, v long"
    )
    got = {
        r.grp: (r.n_values, r.median, r.mad, r.n_outliers)
        for r in mad_outlier_stats(df, ["grp"], "v", k=3).collect()
    }

    def lower_median(vals):
        s = sorted(vals)
        return s[(len(s) + 1) // 2 - 1]

    by_grp = {}
    for g, v in rows:
        by_grp.setdefault(f"g{g}", []).append(v)
    want = {}
    for g, vals in by_grp.items():
        med = lower_median(vals)
        mad = lower_median([abs(v - med) for v in vals])
        nout = sum(1 for v in vals if abs(v - med) > 3 * mad)
        want[g] = (len(vals), med, mad, nout)
    assert got == want


# --- incremental z-order compaction ≡ full rebuild, ANY increment (r10) --------------

compaction_strategy = st.tuples(
    st.lists(
        st.tuples(
            st.integers(0, 4),     # day
            st.integers(0, 63),    # x
            st.integers(0, 63),    # y
        ),
        min_size=0,
        max_size=60,
    ),
    st.randoms(use_true_random=False),
)


@SET
@given(data=compaction_strategy)
def test_incremental_compaction_equals_rebuild_for_any_increment(spark, data):
    """The compaction equivalence is not split-shape-specific: for ANY subset
    of rows arriving as the increment (including empty, full, single-day, and
    duplicate-coordinate rows), re-clustering only touched partitions must be
    row-identical to a full rebuild — the pure-function-of-partition-rowset
    law that licenses O(touched) nightly compaction."""
    from airflow_courier_payout_ledger_pipeline_spark.operators.layout import (
        incremental_zorder_compaction,
        zorder_file_layout,
    )

    rows, rng = data
    rows = [(i, d, x, y) for i, (d, x, y) in enumerate(rows)]
    inc_ids = {i for i, *_ in rows if rng.random() < 0.4}
    df = spark.createDataFrame(rows, "id bigint, day int, x bigint, y bigint")
    from pyspark.sql import functions as F

    inc = df.filter(F.col("id").isin(list(inc_ids)) if inc_ids else F.lit(False))
    base = df.filter(~F.col("id").isin(list(inc_ids)) if inc_ids else F.lit(True))
    out = incremental_zorder_compaction(
        base, inc, "day", ["x", "y"], bits=6, rows_per_file=7, tiebreak=["id"]
    )
    full = zorder_file_layout(
        df, "day", ["x", "y"], bits=6, rows_per_file=7, tiebreak=["id"]
    )
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, full.collect()))


# --- day-state rollup readouts ≡ direct window recompute (r10) -----------------------

rollup_strategy = st.lists(
    st.tuples(
        st.integers(0, 9),      # day offset
        st.integers(1, 30),     # user id
        st.integers(0, 500),    # value cents
    ),
    min_size=0,
    max_size=80,
)


@SET
@given(rows=rollup_strategy)
def test_quantile_rollup_equals_direct_window_percentiles(spark, rows):
    """Histogram day-states fanned out and merged per readout day must give
    the same exact percentiles as computing them directly over each trailing
    7-day window's raw rows (lossless-state law at window grain)."""
    from airflow_courier_payout_ledger_pipeline_spark.operators.quantile import (
        histogram_state,
        quantiles_from_state,
    )
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(d, v) for d, _, v in rows], "day int, v long"
    )
    state = histogram_state(df, ["day"], "v")
    spine = df.select("day").distinct().withColumnRenamed("day", "rd")
    contrib = state.withColumn(
        "rd", F.explode(F.sequence(F.col("day"), F.col("day") + 6))
    ).join(F.broadcast(spine), "rd", "left_semi")
    merged = contrib.groupBy("rd", "value").agg(F.sum("cnt").alias("cnt"))
    got = {
        r.rd: (r.n_values, r.p50, r.p90, r.p99)
        for r in quantiles_from_state(merged, ["rd"]).collect()
    }

    days = sorted({d for d, _, v in rows})
    for rd in days:
        window = sorted(v for d, _, v in rows if rd - 6 <= d <= rd)
        n = len(window)
        def pct(num, den):
            for i, v in enumerate(window, start=1):
                if i * den >= num * n:
                    return v
            return None
        assert got[rd] == (n, pct(1, 2), pct(9, 10), pct(99, 100)), rd


# --- as-of join direction/tolerance vs pandas merge_asof (r10) -----------------------

asof_strategy = st.tuples(
    st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 60)), min_size=1, max_size=30
    ),
    st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 60), st.integers(1, 99)),
        min_size=0,
        max_size=20,
    ),
    st.sampled_from(["backward", "forward", "nearest"]),
    st.one_of(st.none(), st.integers(0, 20)),
)


@SET
@given(data=asof_strategy)
def test_asof_join_matches_pandas_merge_asof_any_direction_tolerance(spark, data):
    """asof_join must agree with pandas' reference merge_asof for all THREE
    directions (incl. nearest — whose equal-gap tie both engines resolve to
    the backward match) and any tolerance on random (key, ts) data —
    including duplicate left timestamps, empty right sides, and
    horizon-excluded nearest matches."""
    import pandas as pd

    from airflow_courier_payout_ledger_pipeline_spark.operators.asof import asof_join

    left_rows, right_rows, direction, tol = data
    # right must be unique per (key, ts) — the operator's documented contract
    right_rows = list({(k, t): v for k, t, v in right_rows}.items())
    right_rows = [(k, t, v) for (k, t), v in right_rows]
    left_rows = [(k, t, i) for i, (k, t) in enumerate(left_rows)]

    left = spark.createDataFrame(left_rows, "key int, ts long, lid long")
    right = spark.createDataFrame(
        right_rows, "key int, rts long, v long"
    ) if right_rows else spark.createDataFrame([], "key int, rts long, v long")
    out = {
        r.lid: (r.rts_asof, r.v)
        for r in asof_join(
            left, right, "key", "ts", "rts", ["v"],
            direction=direction, tolerance_seconds=tol,
        ).collect()
    }

    lp = (
        pd.DataFrame(left_rows, columns=["key", "ts", "lid"])
        .astype("int64")
        .sort_values("ts")
    )
    rp = (
        pd.DataFrame(right_rows, columns=["key", "rts", "v"])
        .astype("int64")
        .sort_values("rts")
    )
    ref = pd.merge_asof(
        lp, rp, left_on="ts", right_on="rts", by="key",
        direction=direction, **({} if tol is None else {"tolerance": tol}),
    )
    assert len(out) == len(left_rows)
    for _, row in ref.iterrows():
        want = (
            (None, None)
            if pd.isna(row["rts"])
            else (int(row["rts"]), int(row["v"]))
        )
        assert out[int(row["lid"])] == want, (dict(row), out[int(row["lid"])])


# --- connected components vs union-find; range join vs brute force (r10) -------------

graph_strategy = st.tuples(
    st.integers(1, 25),  # node count
    st.lists(st.tuples(st.integers(0, 24), st.integers(0, 24)), max_size=40),
)


@SET
@given(data=graph_strategy)
def test_connected_components_match_union_find_reference(spark, data):
    """Min-label propagation + pointer jumping must agree with a pure-Python
    union-find on random graphs — including self-loops, duplicate edges,
    isolated nodes, and edges citing both directions."""
    n, edges = data
    edges = [(a % n, b % n) for a, b in edges]
    from airflow_courier_payout_ledger_pipeline_spark.operators.graph import (
        connected_components,
    )

    nodes = spark.createDataFrame([(i,) for i in range(n)], "id long")
    pairs = (
        spark.createDataFrame(edges, "id_a long, id_b long")
        if edges
        else spark.createDataFrame([], "id_a long, id_b long")
    )
    got = {
        r.id: r.component
        for r in connected_components(nodes, pairs, id_col="id").collect()
    }

    parent = list(range(n))
    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x
    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {}
    roots = {}
    for i in range(n):
        r = find(i)
        roots.setdefault(r, []).append(i)
    for r, members in roots.items():
        label = min(members)
        for m in members:
            want[m] = label
    assert got == want


rangejoin_strategy = st.tuples(
    st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 10_000)), min_size=0, max_size=30
    ),
    st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 10_000), st.integers(0, 1_500)),
        min_size=0,
        max_size=12,
    ),
)


@SET
@given(data=rangejoin_strategy)
def test_range_join_bucketed_matches_brute_force(spark, data):
    """The bucketed interval join must equal the naive theta join for random
    events/intervals on a numeric-seconds axis (cast to timestamps), including
    empty sides, zero-length intervals, and bucket-boundary-straddling spans
    (interval length <= bucket width = 30 min holds: spans <= 1500 s)."""
    ev_rows, iv_rows = data
    from airflow_courier_payout_ledger_pipeline_spark.operators.rangejoin import (
        range_join_bucketed,
    )
    from pyspark.sql import functions as F

    ev = spark.createDataFrame(
        [(k, i, t) for i, (k, t) in enumerate(ev_rows)], "key int, eid long, tsec long"
    ).withColumn("ts", F.timestamp_seconds("tsec"))
    iv = spark.createDataFrame(
        [(k, j, t, t + d) for j, (k, t, d) in enumerate(iv_rows)],
        "key int, iid long, s long, e long",
    ).withColumn("t0", F.timestamp_seconds("s")).withColumn(
        "t1", F.timestamp_seconds("e")
    )
    got = {
        (r.eid, r.iid)
        for r in range_join_bucketed(
            ev.select("key", "eid", "ts"),
            iv.select("key", "iid", "t0", "t1"),
            "key",
            "ts",
            "t0",
            "t1",
            30,
        ).collect()
    }
    want = {
        (i, j)
        for i, (ek, et) in enumerate(ev_rows)
        for j, (ik, s, d) in enumerate(iv_rows)
        if ek == ik and s <= et < s + d
    }
    assert got == want


# --- RRF fusion vs a pure-Python reference ------------------------------------------

rrf_legs_strategy = st.tuples(
    st.lists(st.integers(0, 30), min_size=0, max_size=12, unique=True),  # lex ids
    st.lists(st.integers(0, 30), min_size=0, max_size=12, unique=True),  # sem ids
)


@SET
@given(legs=rrf_legs_strategy)
def test_rrf_fuse_matches_python_reference(spark, legs):
    """rrf_fuse ≡ the textbook fold computed in pure Python: rank-ordered ids
    per leg (rank = list position + 1), score = Σ 1/(60+rank) over the legs a
    doc appears in, top-k by (score desc, id asc)."""
    from airflow_courier_payout_ledger_pipeline_spark.operators.search import rrf_fuse

    lex_ids, sem_ids = legs
    k = 5
    lex = spark.createDataFrame(
        [(i, r + 1) for r, i in enumerate(lex_ids)] or [(None, None)],
        "doc_id long, lex_rank int",
    ).filter("doc_id is not null")
    sem = spark.createDataFrame(
        [(i, r + 1) for r, i in enumerate(sem_ids)] or [(None, None)],
        "doc_id long, sem_rank int",
    ).filter("doc_id is not null")
    got = rrf_fuse(lex, sem, k=k).collect()

    ref: dict[int, float] = {}
    for r, i in enumerate(lex_ids):
        ref[i] = ref.get(i, 0.0) + 1.0 / (60.0 + (r + 1))
    for r, i in enumerate(sem_ids):
        ref[i] = ref.get(i, 0.0) + 1.0 / (60.0 + (r + 1))
    want = sorted(ref.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    assert [(r.doc_id, r.rrf) for r in got] == want
    assert [r.rank for r in got] == list(range(1, len(want) + 1))


# --- SCD0 NULL-key semantics vs the Postgres ON CONFLICT reference ------------------

scd0_strategy = st.tuples(
    st.lists(  # increment: (key or None, payload)
        st.tuples(st.one_of(st.none(), st.integers(0, 5)), st.integers(0, 99)),
        min_size=0,
        max_size=12,
    ),
    st.lists(st.integers(0, 5), min_size=0, max_size=6, unique=True),  # existing keys
)


@SET
@given(data=scd0_strategy)
def test_scd0_null_keys_follow_postgres_on_conflict(spark, data):
    """Postgres UNIQUE/ON CONFLICT reference: NULL keys never conflict — every
    NULL-keyed increment row inserts (none suppressed, none collapsed); non-NULL
    keys insert once each, existing keys skipped."""
    from pyspark.sql import functions as F

    from airflow_courier_payout_ledger_pipeline_spark.operators.merge import (
        scd0_new_rows,
    )

    inc_rows, existing_keys = data
    inc = spark.createDataFrame(
        [(kk, p, i) for i, (kk, p) in enumerate(inc_rows)] or [(None, None, None)],
        "k long, payload long, seq long",
    ).filter("seq is not null" if inc_rows else "false")
    existing = spark.createDataFrame(
        [(kk,) for kk in existing_keys] or [(None,)], "k long"
    ).filter("k is not null")
    got = scd0_new_rows(inc, existing, ["k"], tiebreaker=F.col("seq")).collect()

    null_rows = [(kk, p) for kk, p in inc_rows if kk is None]
    first_by_key: dict[int, int] = {}
    for i, (kk, p) in enumerate(inc_rows):
        if kk is not None and kk not in existing_keys and kk not in first_by_key:
            first_by_key[kk] = i
    got_null = sorted((r.payload) for r in got if r.k is None)
    got_keyed = {r.k: r.seq for r in got if r.k is not None}
    assert got_null == sorted(p for _, p in null_rows)  # all NULL rows, uncollapsed
    assert got_keyed == first_by_key  # first-wins per new key, existing skipped


# --- persisted-index maintenance cycle under ARBITRARY increment splits --------------

maintenance_strategy = st.tuples(
    st.lists(  # corpus: doc texts over a small vocab (collisions + empties)
        st.lists(st.sampled_from(list("abcdefgh")), min_size=0, max_size=8),
        min_size=1,
        max_size=16,
    ),
    st.lists(st.integers(0, 2), min_size=1, max_size=16),  # increment assignment
    st.sets(st.sampled_from(list("abcdefgh")), min_size=1, max_size=3),  # query terms
)


@SET
@given(data=maintenance_strategy)
def test_bm25_maintenance_cycle_invariant_under_any_split(spark, data):
    """The r16 maintenance-matrix law, generalized past the even/odd unit
    fixtures: for ANY partition of a random corpus into up to 3 increments,
    build(first) → extend(rest) → compact → retention_sweep(keep=1,1) must
    serve BIT-identically to a fresh full build, for random query-term sets
    — i.e. no increment shape, compaction fold, or retention deletion can
    move a score. (The sweep's reclamation itself is asserted by the unit
    laws; random tiny corpora legitimately produce nothing reclaimable when
    an increment is empty, so this property pins only the serving law.)"""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from airflow_courier_payout_ledger_pipeline_spark.operators.textindex import (
        bm25_search_indexed,
        build_bm25_index,
        compact_bm25_index,
        extend_bm25_index,
    )
    from airflow_courier_payout_ledger_pipeline_spark.sources.lakehouse import Lakehouse

    docs, assign, terms = data
    rows = [(i, " ".join(ws)) for i, ws in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    parts = [
        df.filter(F.col("doc_id").isin([i for i in range(len(docs))
                                        if assign[i % len(assign)] == g]))
        for g in (0, 1, 2)
    ]

    root = tempfile.mkdtemp(prefix="bm25_prop_")
    try:
        lake = Lakehouse(root + "/inc")
        build_bm25_index(lake, "idx", parts[0])
        for p in parts[1:]:
            extend_bm25_index(lake, "idx", p)
        compact_bm25_index(lake, "idx", spark)
        lake.retention_sweep(keep_manifests=1, keep_versions=1)

        full = Lakehouse(root + "/full")
        build_bm25_index(full, "idx", df)

        q = sorted(terms)
        got = sorted(map(tuple, bm25_search_indexed(lake, "idx", spark, q, k=8).collect()))
        want = sorted(map(tuple, bm25_search_indexed(full, "idx", spark, q, k=8).collect()))
        assert got == want
    finally:
        shutil.rmtree(root, ignore_errors=True)
