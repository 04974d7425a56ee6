"""IVF similarity search: k-means convergence on clustered data and recall vs
brute force."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from airflow_courier_payout_ledger_pipeline_spark.operators.similarity import (
    brute_force_topk,
    ivf_topk,
    kmeans_centroids,
)


@pytest.fixture(scope="module")
def clustered(spark):
    # two tight, well-separated clusters around (10,0...) and (0,10...)
    rows = []
    for i in range(40):
        base = [10.0, 0.0, 0.0, 0.0] if i % 2 == 0 else [0.0, 10.0, 0.0, 0.0]
        jitter = [((i * 7 + j * 3) % 5) / 10.0 for j in range(4)]
        rows.append((i, [b + d for b, d in zip(base, jitter)]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_kmeans_finds_the_two_clusters(clustered):
    cents = kmeans_centroids(clustered, k=2, iters=4)
    axes = sorted((round(v[0]), round(v[1])) for _, v in cents)
    assert axes[0][1] >= 9 and axes[1][0] >= 9  # one centroid per cluster


def test_ivf_matches_brute_force_on_separated_clusters(clustered):
    """With well-separated clusters, every true neighbor shares the query's
    inverted list — IVF top-k equals exact top-k."""
    cents = kmeans_centroids(clustered, k=2, iters=4)
    queries = clustered.filter(F.col("vec_id") < 4)
    ivf = ivf_topk(clustered, queries, cents, k=3)
    brute = brute_force_topk(clustered, queries, k=3)
    ivf_rows = {(r.query_id, r.rank): r.neighbor_id for r in ivf.collect()}
    brute_rows = {(r.query_id, r.rank): r.neighbor_id for r in brute.collect()}
    assert ivf_rows == brute_rows


def test_ivf_restricts_candidates(clustered):
    cents = kmeans_centroids(clustered, k=2, iters=4)
    queries = clustered.filter(F.col("vec_id") == 0)  # even → cluster 1
    out = ivf_topk(clustered, queries, cents, k=100)
    ids = {r.neighbor_id for r in out.collect()}
    assert ids and all(i % 2 == 0 for i in ids)  # only same-cluster candidates


def test_ivf_multiprobe_widens_candidates_and_recovers_recall(clustered):
    """nprobe=2 probes both inverted lists: candidates span both clusters and
    the result equals brute force even for boundary-ish queries."""
    cents = kmeans_centroids(clustered, k=2, iters=4)
    queries = clustered.filter(F.col("vec_id") == 0)
    ids = {r.neighbor_id for r in ivf_topk(clustered, queries, cents, k=100, nprobe=2).collect()}
    assert any(i % 2 for i in ids) and any(not i % 2 for i in ids)  # both clusters
    brute = brute_force_topk(clustered, queries, k=10)
    probe2 = ivf_topk(clustered, queries, cents, k=10, nprobe=2)
    assert {(r.query_id, r.rank, r.neighbor_id) for r in probe2.collect()} == {
        (r.query_id, r.rank, r.neighbor_id) for r in brute.collect()
    }


def test_mllib_quantizer_feeds_same_search_topology(spark):
    """The large-scale quantizer path: MLlib-trained centers drive ivf_topk
    unchanged — k centers come back in the canonical layout, the search
    returns well-formed ranked neighbors, and nprobe=2 recall is at least
    nprobe=1 recall against the exact brute-force top-k."""
    from airflow_courier_payout_ledger_pipeline_spark.operators.similarity import (
        brute_force_topk,
        ivf_topk,
        kmeans_centroids_mllib,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    cents = kmeans_centroids_mllib(emb, k=4, seed=7)
    assert len(cents) == 4 and all(len(v) > 0 for _, v in cents)

    queries = emb.filter(F.col("vec_id") < 10)
    exact = {
        (r.query_id, r.neighbor_id)
        for r in brute_force_topk(emb, queries, k=5).collect()
    }

    def recall(nprobe):
        got = ivf_topk(emb, queries, cents, k=5, nprobe=nprobe).collect()
        for r in got:
            assert -1.0 <= r.sim <= 1.0 and 1 <= r.rank <= 5
        return len({(r.query_id, r.neighbor_id) for r in got} & exact) / len(exact)

    r1, r2 = recall(1), recall(2)
    assert 0.0 < r1 <= r2 <= 1.0


# --- product quantization (pq_encode / pq_adc_topk) -------------------------------


def test_pq_codes_are_tinyint_and_deterministic(clustered):
    from airflow_courier_payout_ledger_pipeline_spark.operators.similarity import (
        pq_codebooks_from_seeds,
        pq_encode,
    )

    seeds = [
        (int(r.vec_id), [float(x) for x in r.embedding])
        for r in clustered.filter(F.col("vec_id") < 4).collect()
    ]
    books = pq_codebooks_from_seeds(seeds, m=2)  # d=4 → 2 subspaces × 2 dims
    enc = pq_encode(clustered, books)
    assert dict(enc.dtypes)["pq_codes"] == "array<tinyint>"
    got = {r.vec_id: list(r.pq_codes) for r in enc.collect()}
    again = {r.vec_id: list(r.pq_codes) for r in pq_encode(clustered, books).collect()}
    assert got == again
    assert all(len(v) == 2 and all(0 <= c < 4 for c in v) for v in got.values())
    # seeds quantize to themselves: seed c's nearest codebook entry in every
    # subspace is its own slice (distance 0)
    for c in range(4):
        assert got[c] == [c, c]


def test_pq_adc_recall_on_separated_clusters(clustered):
    """Clusters are 10 apart, PQ reconstruction error is the sub-unit jitter —
    every ADC top-3 neighbor must come from the query's own cluster (the
    coarse-grained correctness PQ promises; exact ranks may differ from
    brute force inside a cluster)."""
    from airflow_courier_payout_ledger_pipeline_spark.operators.similarity import (
        pq_adc_topk,
        pq_codebooks_from_seeds,
    )

    seeds = [
        (int(r.vec_id), [float(x) for x in r.embedding])
        for r in clustered.filter(F.col("vec_id") < 4).collect()
    ]
    books = pq_codebooks_from_seeds(seeds, m=2)
    out = pq_adc_topk(clustered, clustered.filter(F.col("vec_id") < 4), books, k=3)
    rows = out.collect()
    assert {r.query_id for r in rows} == {0, 1, 2, 3}
    for r in rows:
        assert r.query_id % 2 == r.neighbor_id % 2, (r.query_id, r.neighbor_id)
        assert r.rank <= 3 and r.adc_dist >= 0.0


def test_pq_search_plan_broadcasts_queries_and_drops_vectors(clustered):
    """The search side must be a broadcast nested loop over CODES: corpus
    embedding vectors may appear only below the encode projection, never as a
    join input column (that is the 32x memory point of PQ)."""
    from airflow_courier_payout_ledger_pipeline_spark.operators.similarity import (
        pq_adc_topk,
        pq_codebooks_from_seeds,
    )

    seeds = [
        (int(r.vec_id), [float(x) for x in r.embedding])
        for r in clustered.filter(F.col("vec_id") < 4).collect()
    ]
    books = pq_codebooks_from_seeds(seeds, m=2)
    out = pq_adc_topk(clustered, clustered.filter(F.col("vec_id") < 2), books, k=2)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan
    # the join's streamed (corpus) side projects only id + codes
    join_part = plan.split("BroadcastNestedLoopJoin")[1]
    assert "pq_codes" in join_part


def test_pq_codebooks_reject_indivisible_dim():
    import pytest as _pytest

    from airflow_courier_payout_ledger_pipeline_spark.operators.similarity import (
        pq_codebooks_from_seeds,
    )

    with _pytest.raises(ValueError, match="not divisible"):
        pq_codebooks_from_seeds([(0, [1.0, 2.0, 3.0])], m=2)


def test_ivf_pq_routes_then_adc_ranks(clustered):
    """IVF-PQ: candidates restricted to the query's inverted list (never a
    cross-cluster neighbor with separated clusters), distances from PQ code
    lookups. k=100 surfaces the FULL candidate set — it must be the query's
    own cluster minus self, proving the router cut, not just top-k luck."""
    from airflow_courier_payout_ledger_pipeline_spark.operators.similarity import (
        ivf_pq_topk,
        kmeans_centroids,
        pq_codebooks_from_seeds,
    )

    cents = kmeans_centroids(clustered, k=2, iters=4)
    seeds = [
        (int(r.vec_id), [float(x) for x in r.embedding])
        for r in clustered.filter(F.col("vec_id") < 4).collect()
    ]
    books = pq_codebooks_from_seeds(seeds, m=2)
    out = ivf_pq_topk(
        clustered, clustered.filter(F.col("vec_id") < 2), cents, books, k=100
    ).collect()
    by_q = {}
    for r in out:
        assert r.query_id % 2 == r.neighbor_id % 2, (r.query_id, r.neighbor_id)
        by_q.setdefault(r.query_id, []).append(r)
    # full inverted list = 20 same-parity vectors minus the query itself
    assert {q: len(v) for q, v in by_q.items()} == {0: 19, 1: 19}
    for rows in by_q.values():
        dists = [r.adc_dist for r in sorted(rows, key=lambda r: r.rank)]
        assert dists == sorted(dists)  # rank follows ADC distance


@pytest.mark.parametrize("h", [0, 1, 2])
def test_pq_hamming_banding_is_exact_vs_naive(spark, h):
    """The (m choose h) leave-h-out band join must return EXACTLY the naive
    all-pairs Hamming<=h set — pigeonhole recall is a guarantee at every
    supported threshold, not a probability (h=0 full-code equality, h=1
    leave-one-out, h=2 combination bands)."""
    from airflow_courier_payout_ledger_pipeline_spark.operators.similarity import (
        pq_codebooks_from_seeds,
        pq_encode,
        pq_hamming_pairs,
    )

    rows = [(i, [float((i * 13 + j * 5) % 7) for j in range(8)]) for i in range(30)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    seeds = [(v, list(e)) for v, e in rows[:3]]
    books = pq_codebooks_from_seeds(seeds, m=4)

    got = {
        (r.id_a, r.id_b, r.hamming)
        for r in pq_hamming_pairs(emb, books, max_hamming=h).collect()
    }

    codes = {r.vec_id: list(r.pq_codes) for r in pq_encode(emb, books).collect()}
    want = set()
    ids = sorted(codes)
    for x in ids:
        for y in ids:
            if x < y:
                d = sum(1 for a, b in zip(codes[x], codes[y]) if a != b)
                if d <= h:
                    want.add((x, y, d))
    assert got == want and want  # non-trivial: dup pairs exist at every h


def test_pq_hamming_rejects_unblocked_thresholds(spark):
    """h >= m degenerates every band to the empty signature — an all-pairs
    join — so it must raise, not silently go quadratic."""
    import pytest as _pytest

    from airflow_courier_payout_ledger_pipeline_spark.operators.similarity import (
        pq_hamming_pairs,
    )

    emb = spark.createDataFrame([(0, [1.0, 2.0])], "vec_id long, embedding array<float>")
    with _pytest.raises(ValueError, match="all-pairs"):
        pq_hamming_pairs(emb, [[[1.0]], [[2.0]]], max_hamming=2)


def test_exact_trainer_is_partitioning_invariant_and_matches_seed_degenerate(clustered):
    """kmeans_centroids_exact's whole point: the centroid update must be
    independent of partitioning/merge order (decimal sums), and iters=0 must
    degenerate to the lowest-id seed quantizer the oracle twins freeze."""
    from airflow_courier_payout_ledger_pipeline_spark.operators.similarity import (
        kmeans_centroids_exact,
    )

    a = kmeans_centroids_exact(clustered, k=2, iters=3)
    b = kmeans_centroids_exact(clustered.repartition(7), k=2, iters=3)
    assert a == b  # bit-identical, not approximately equal
    seeds = kmeans_centroids_exact(clustered, k=2, iters=0)
    init = clustered.orderBy("vec_id").limit(2).collect()
    assert seeds == [(i, [float(x) for x in r.embedding]) for i, r in enumerate(init)]


def test_trained_quantizer_beats_adversarial_seeds_on_clustered_data(spark):
    """The recall claim training is FOR, on data where structure exists: all k
    seed vectors sit inside ONE true cluster (the worst init a lowest-id rule
    can draw), so the seeded quantizer splits that cluster and lumps the other
    into half a cell — while two Lloyd iterations separate the true clusters
    and IVF@nprobe=1 recall@5 strictly improves. (On isotropic data — e.g.
    the synthetic testdata embeddings — training moves recall only at noise
    level at equal scan cost; `ivf_recall_trained_vs_seeded` reports those
    honest numbers, this test pins the mechanism.)"""
    from airflow_courier_payout_ledger_pipeline_spark.operators.similarity import (
        kmeans_centroids_exact,
    )

    # Constructed so the seeded partition provably splits cluster B in half:
    # the two seeds (ids 0, 1) sit in big cluster A and differ ONLY along dim
    # 2 (+1 vs -1) — exactly the axis that separates B's two halves — so under
    # the seed quantizer B+ routes to cell 0 (with all of A) and B- to cell 1,
    # and every B query's top-5 (2 same-sign + 3 cross-sign neighbors) loses
    # its cross-sign half: seeded recall = 2/5. Lloyd recovers the true A/B
    # cells in two iterations (B+ defects to the B--mean cell in iteration 2).
    rows = [(0, [10.0, 0.0, 1.0, 0.0]), (1, [10.0, 0.0, -1.0, 0.0])]
    for i in range(2, 42):  # cluster A bulk: dim-3 jitter keeps the dim-2 tie
        rows.append((i, [10.0, 0.0, 0.0, (i % 8) / 16.0]))
    for i in range(42, 48):  # cluster B: 3 points at s=+1, 3 at s=-1
        rows.append((i, [0.0, 10.0, 1.0 if i % 2 else -1.0, 0.0]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    queries = emb.filter(F.col("vec_id") >= 42)

    def recall_at_5(cents):
        truth = {
            (r.query_id, r.neighbor_id)
            for r in brute_force_topk(emb, queries, k=5).collect()
        }
        got = {
            (r.query_id, r.neighbor_id)
            for r in ivf_topk(emb, queries, cents, k=5, nprobe=1).collect()
        }
        return len(truth & got) / len(truth)

    seeded = kmeans_centroids_exact(emb, k=2, iters=0)
    trained = kmeans_centroids_exact(emb, k=2, iters=2)
    r_seed, r_train = recall_at_5(seeded), recall_at_5(trained)
    assert r_seed == pytest.approx(0.4)  # each B query keeps only its 2 same-sign
    assert r_train == 1.0  # separated clusters: trained IVF == brute force


def test_pq_exact_trainer_determinism_degeneracy_and_mse_descent(clustered):
    """pq_codebooks_exact: partitioning-invariant (decimal sums), iters=0
    degenerates to the seed slices, and training descends quantization MSE
    (Lloyd's monotone property — the number ADC accuracy rides on)."""
    from airflow_courier_payout_ledger_pipeline_spark.operators.similarity import (
        pq_codebooks_exact,
        pq_codebooks_from_seeds,
        pq_encode,
    )

    m = 2
    a = pq_codebooks_exact(clustered, m=m, kc=2, iters=3)
    b = pq_codebooks_exact(clustered.repartition(5), m=m, kc=2, iters=3)
    assert a == b
    seeds = [
        (int(r.vec_id), [float(x) for x in r.embedding])
        for r in clustered.orderBy("vec_id").limit(2).collect()
    ]
    assert pq_codebooks_exact(clustered, m=m, kc=2, iters=0) == (
        pq_codebooks_from_seeds(seeds, m)
    )

    def mse(books):
        rows = clustered.collect()
        codes = {r.vec_id: list(r.pq_codes) for r in pq_encode(clustered, books).collect()}
        sub = len(books[0][0])
        tot = n = 0
        for r in rows:
            v = [float(x) for x in r.embedding]
            for j in range(m):
                w = books[j][codes[r.vec_id][j]]
                tot += sum((x - y) ** 2 for x, y in zip(v[j * sub:(j + 1) * sub], w))
                n += 1
        return tot / n

    trained = pq_codebooks_exact(clustered, m=m, kc=2, iters=3)
    assert mse(trained) < mse(pq_codebooks_from_seeds(seeds, m))


def test_residual_pq_tightens_adc_error(clustered):
    """Residual IVF-PQ's whole point (Jégou et al. §IV): with cluster offsets
    removed, the same m×k_c codebook budget quantizes only the small in-cell
    displacement, so reconstruction MSE drops hard vs raw-vector PQ — here
    the clusters sit 10 apart while jitter is sub-unit. (With k_c=2 the raw
    codebooks can still dedicate one codeword per cluster offset, so the gap
    here is ~2.5x; with offsets outnumbering codewords it grows unboundedly.) Also pins the search contract:
    well-formed ranked output, neighbors from the query's own cell."""
    from airflow_courier_payout_ledger_pipeline_spark.operators.similarity import (
        ivf_pq_residual_topk,
        kmeans_centroids_exact,
        pq_codebooks_exact,
        pq_encode,
        residual_frame,
    )

    m = 2
    cents = kmeans_centroids_exact(clustered, k=2, iters=2)
    res = residual_frame(clustered, cents).select("vec_id", "__res")
    books_res = pq_codebooks_exact(res, m=m, kc=2, iters=2, vec_col="__res")
    books_raw = pq_codebooks_exact(clustered, m=m, kc=2, iters=2)

    def mse(df, vec_col, books):
        vecs = {r.vec_id: [float(x) for x in r[vec_col]] for r in df.collect()}
        codes = {
            r.vec_id: list(r.pq_codes)
            for r in pq_encode(df, books, vec_col=vec_col).collect()
        }
        sub = len(books[0][0])
        tot = n = 0
        for vid, v in vecs.items():
            for j in range(m):
                w = books[j][codes[vid][j]]
                tot += sum((x - y) ** 2 for x, y in zip(v[j * sub:(j + 1) * sub], w))
                n += 1
        return tot / n

    mse_res = mse(res, "__res", books_res)
    mse_raw = mse(clustered, "embedding", books_raw)
    assert mse_res < mse_raw / 2, (mse_res, mse_raw)

    out = ivf_pq_residual_topk(
        clustered, clustered.filter(F.col("vec_id") < 4), cents, books_res, k=3
    ).collect()
    assert {r.query_id for r in out} == {0, 1, 2, 3}
    for r in out:
        # separated clusters: candidates only from the query's own cell
        assert r.query_id % 2 == r.neighbor_id % 2, (r.query_id, r.neighbor_id)
        assert 1 <= r.rank <= 3 and r.adc_dist >= 0.0


def test_ivf_list_state_merge_equals_rebuild_and_flags_skew(spark):
    """The maintenance algebra's law: folding per-increment list states must be
    bit-identical to indexing everything in one pass (count + quantized-error
    sums are associative/commutative), and the readout must surface list
    skew — the signal that says split-the-cell/probe-wider at 100 TB."""
    from airflow_courier_payout_ledger_pipeline_spark.operators.similarity import (
        ivf_list_state,
        ivf_list_stats,
        kmeans_centroids_exact,
        merge_ivf_list_states,
    )

    # skewed corpus: 3/4 of rows in cluster A
    rows = []
    for i in range(80):
        in_a = i % 4 != 0
        base = [10.0, 0.0, 0.0, 0.0] if in_a else [0.0, 10.0, 0.0, 0.0]
        rows.append((i, [b + ((i * 3 + j) % 5) / 8.0 for j, b in enumerate(base)]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cents = kmeans_centroids_exact(emb, k=2, iters=2)

    full = ivf_list_state(emb, cents)
    merged = merge_ivf_list_states(
        ivf_list_state(emb.filter(F.col("vec_id") % 3 == 0), cents),
        merge_ivf_list_states(
            ivf_list_state(emb.filter(F.col("vec_id") % 3 == 1), cents),
            ivf_list_state(emb.filter(F.col("vec_id") % 3 == 2), cents),
        ),
    )
    key = lambda df: sorted((r.centroid, r.n, r.err_q) for r in df.collect())  # noqa: E731
    assert key(merged) == key(full)

    stats = {r.centroid: r for r in ivf_list_stats(merged).collect()}
    shares = sorted(r.list_share for r in stats.values())
    assert shares[-1] >= 0.7 and shares[0] <= 0.3  # the skew is visible
    assert all(r.mean_quant_err >= 0 for r in stats.values())
    assert sum(r.n for r in stats.values()) == 80


def test_exact_trainers_reject_reserved_column_collisions(spark):
    """Trainer iterations crossJoin reserved-named frames; an input already
    carrying one of those names must raise clearly instead of producing
    ambiguous columns (the r10 training_shard_layout ADVICE, applied here)."""
    from airflow_courier_payout_ledger_pipeline_spark.operators.similarity import (
        kmeans_centroids_exact,
        pq_codebooks_exact,
    )

    df = spark.createDataFrame(
        [(0, [1.0, 2.0], 9)], "vec_id long, embedding array<float>, __cid int"
    )
    with pytest.raises(ValueError, match="reserved trainer names"):
        kmeans_centroids_exact(df, k=1, iters=1)
    df2 = spark.createDataFrame(
        [(0, [1.0, 2.0], 9)], "vec_id long, embedding array<float>, __sv int"
    )
    with pytest.raises(ValueError, match="reserved trainer names"):
        pq_codebooks_exact(df2, m=2, kc=1, iters=1)


def test_ivf_list_state_merge_rejects_scale_mismatch(spark):
    """States quantized at different err_scale cannot fold — the merged scale
    column raises lazily on global mismatch (the CMS width-check pattern);
    re-building at a matching scale merges cleanly and the readout derives
    the scale from the state, not a caller-repeated parameter."""
    from airflow_courier_payout_ledger_pipeline_spark.operators.similarity import (
        ivf_list_state,
        ivf_list_stats,
        kmeans_centroids_exact,
        merge_ivf_list_states,
    )

    emb = spark.createDataFrame(
        [(i, [float(i % 3), float(i % 5)]) for i in range(12)],
        "vec_id long, embedding array<float>",
    )
    cents = kmeans_centroids_exact(emb, k=2, iters=1)
    a = ivf_list_state(emb.filter(F.col("vec_id") < 6), cents, err_scale=6)
    b = ivf_list_state(emb.filter(F.col("vec_id") >= 6), cents, err_scale=4)
    with pytest.raises(Exception, match="err_scale mismatch"):
        merge_ivf_list_states(a, b).collect()
    b6 = ivf_list_state(emb.filter(F.col("vec_id") >= 6), cents, err_scale=6)
    out = ivf_list_stats(merge_ivf_list_states(a, b6)).collect()
    assert sum(r.n for r in out) == 12 and all(r.mean_quant_err >= 0 for r in out)


def test_multiprobe_recall_monotone_and_validates_n_probes(spark):
    """Multi-probe LSH: recall against brute force is non-decreasing in
    n_probes (each step only ADDS candidate buckets), home-only equals the
    single-probe path exactly, and out-of-range n_probes raises."""
    from airflow_courier_payout_ledger_pipeline_spark.operators.similarity import (
        brute_force_topk,
        bucketed_ann_topk,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 10)
    truth = {(r.query_id, r.neighbor_id) for r in brute_force_topk(emb, q, k=5).collect()}

    def recall(n):
        got = {
            (r.query_id, r.neighbor_id)
            for r in bucketed_ann_topk(emb, q, k=5, n_probes=n).collect()
        }
        return len(truth & got) / len(truth)

    r1, r3, r5 = recall(1), recall(3), recall(5)
    assert r1 <= r3 <= r5, (r1, r3, r5)
    assert r5 > r1  # the dial actually buys recall on this data
    # n_probes=1 is byte-equivalent to the pre-dial single-probe path
    a = bucketed_ann_topk(emb, q, k=5, n_probes=1).collect()
    b = bucketed_ann_topk(emb, q, k=5).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    for bad in (0, 6):
        with pytest.raises(ValueError, match="n_probes"):
            bucketed_ann_topk(emb, q, k=5, n_probes=bad)


# --- recall-gated quantizer selection (r11 verdict item 2) --------------------------


def test_recall_gate_ships_dominating_candidate_on_clustered_data(spark):
    """On structured data the Lloyd candidate dominates the adversarial seeds
    at every nprobe and the gate ships it — the mechanism that makes the
    'trained' production quantizer worth having."""
    from airflow_courier_payout_ledger_pipeline_spark.operators.similarity import (
        kmeans_centroids_exact,
        select_ivf_quantizer,
    )

    # the adversarial-seed construction from
    # test_trained_quantizer_beats_adversarial_seeds_on_clustered_data:
    # seeded recall 0.4, trained recall 1.0 at nprobe=1
    rows = [(0, [10.0, 0.0, 1.0, 0.0]), (1, [10.0, 0.0, -1.0, 0.0])]
    for i in range(2, 42):
        rows.append((i, [10.0, 0.0, 0.0, (i % 8) / 16.0]))
    for i in range(42, 48):
        rows.append((i, [0.0, 10.0, 1.0 if i % 2 else -1.0, 0.0]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    queries = emb.filter(F.col("vec_id") >= 42)

    seeded = kmeans_centroids_exact(emb, k=2, iters=0)
    trained = kmeans_centroids_exact(emb, k=2, iters=2)
    name, cents = select_ivf_quantizer(
        emb, queries, [("lloyd_seed", trained)], ("seeded", seeded), nprobes=(1, 2)
    )
    assert name == "lloyd_seed" and cents == trained


def test_recall_gate_keeps_baseline_when_no_candidate_dominates(clustered):
    """The gate's reason to exist: a candidate that measures worse than the
    baseline anywhere NEVER ships — the production entry falls back to the
    seeds instead of shipping a marginal regression (the shipped-testdata
    outcome, measured in OPERATORS.md)."""
    from airflow_courier_payout_ledger_pipeline_spark.operators.similarity import (
        kmeans_centroids_exact,
        select_ivf_quantizer,
    )

    queries = clustered.filter(F.col("vec_id") < 8)
    # seeds 0 (cluster A) and 1 (cluster B): perfect separation, recall 1.0
    seeded = kmeans_centroids_exact(clustered, k=2, iters=0)
    # bad candidate: both centroids inside cluster A, splitting on the dim-3
    # jitter — every query's inverted list loses the neighbors whose jitter
    # falls on the other side, so recall < 1 at nprobe=1 and dominance fails
    bad = [(0, [10.0, 0.0, 0.0, 0.0]), (1, [10.0, 0.0, 0.0, 0.25])]
    name, cents = select_ivf_quantizer(
        clustered, queries, [("bad", bad)], ("seeded", seeded), nprobes=(1, 2)
    )
    assert name == "seeded" and cents == seeded


def test_farthest_first_init_is_deterministic_and_spans_clusters(clustered):
    """Maximin init: starts at the lowest id, then picks across the gap —
    one centroid per true cluster on the two-cluster fixture; ids are the
    REAL chosen vec_ids; result is partitioning-invariant."""
    from airflow_courier_payout_ledger_pipeline_spark.operators.similarity import (
        farthest_first_centroids_exact,
    )

    a = farthest_first_centroids_exact(clustered, k=2)
    b = farthest_first_centroids_exact(clustered.repartition(7), k=2)
    assert a == b
    assert a[0][0] == 0  # start = lowest vec_id (cluster A: even ids)
    assert a[1][0] % 2 == 1  # farthest point sits in cluster B (odd ids)


def test_exact_trainer_preserves_real_seed_vec_ids(spark):
    """r11 ADVICE: centroid ids must be the collected vec_ids (the
    _ivf_seed_centroids convention), not an enumerate renumbering — on
    corpora whose lowest k ids are not {0..k-1} the two conventions train
    different-looking quantizers per engine."""
    from airflow_courier_payout_ledger_pipeline_spark.operators.similarity import (
        farthest_first_centroids_exact,
        kmeans_centroids,
        kmeans_centroids_exact,
    )

    emb = spark.createDataFrame(
        [(100 + i, [float(i % 4), float(i % 6)]) for i in range(10)],
        "vec_id long, embedding array<float>",
    )
    for fn in (kmeans_centroids, kmeans_centroids_exact):
        cents = fn(emb, k=3, iters=1)
        assert [cid for cid, _ in cents] == [100, 101, 102]
    ff = farthest_first_centroids_exact(emb, k=3)
    assert all(cid >= 100 for cid, _ in ff) and ff[0][0] == 100


def test_pq_trainer_guards_non_dense_seed_ids(spark):
    """PQ codeword ids ARE list positions (the _pq_codes array-index
    convention, mirrored by the oracles' c = vec_id) — training on a corpus
    whose lowest kc ids are not {0..kc-1} must raise loudly, not silently
    diverge from the SQL twin (r11 ADVICE)."""
    from airflow_courier_payout_ledger_pipeline_spark.operators.similarity import (
        pq_codebooks_exact,
    )

    emb = spark.createDataFrame(
        [(100 + i, [float(i), float(i + 1)]) for i in range(6)],
        "vec_id long, embedding array<float>",
    )
    with pytest.raises(ValueError, match="0..1"):
        pq_codebooks_exact(emb, m=2, kc=2, iters=1)


def test_ivf_list_state_scale_mismatch_survives_err_scale_pruning(spark):
    """r11 ADVICE: the mismatch guard must ride err_q too — a projection
    that drops err_scale (so Catalyst prunes that column's check) may not
    expose mixed-scale sums."""
    from airflow_courier_payout_ledger_pipeline_spark.operators.similarity import (
        ivf_list_state,
        kmeans_centroids_exact,
        merge_ivf_list_states,
    )

    emb = spark.createDataFrame(
        [(i, [float(i % 3), float(i % 5)]) for i in range(12)],
        "vec_id long, embedding array<float>",
    )
    cents = kmeans_centroids_exact(emb, k=2, iters=1)
    a = ivf_list_state(emb.filter(F.col("vec_id") < 6), cents, err_scale=6)
    b = ivf_list_state(emb.filter(F.col("vec_id") >= 6), cents, err_scale=4)
    pruned = merge_ivf_list_states(a, b).select("centroid", "n", "err_q")
    with pytest.raises(Exception, match="err_scale mismatch"):
        pruned.collect()


# --- k·dim budget enforcement (r11 verdict item 3) -----------------------------------


def test_join_form_assignment_matches_literal_and_carries_large_quantizers(spark):
    """The large-quantizer path: MLlib trains k=64 over dim=64 (k·dim=4096)
    and ivf_topk(assign_mode='join') runs the IDENTICAL inverted-list search
    topology with the centroid matrix as a broadcast frame — byte-equal rows
    to the unrolled-literal mode on the same centroids (tie rules match), at
    both nprobe settings. This is the route 'auto' takes past
    UNROLLED_LITERAL_BUDGET, where the literal builders raise instead of
    stalling in Janino."""
    from airflow_courier_payout_ledger_pipeline_spark.operators.similarity import (
        ivf_topk,
        kmeans_centroids_mllib,
    )

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    cents = kmeans_centroids_mllib(emb, k=64, seed=7)
    assert len(cents) == 64
    q = emb.filter(F.col("vec_id") < 10)
    for nprobe in (1, 3):
        lit = ivf_topk(emb, q, cents, k=5, nprobe=nprobe, assign_mode="literal")
        jn = ivf_topk(emb, q, cents, k=5, nprobe=nprobe, assign_mode="join")
        assert sorted(map(tuple, lit.collect())) == sorted(map(tuple, jn.collect()))


def test_literal_builders_raise_past_budget_and_auto_routes(spark):
    """Past UNROLLED_LITERAL_BUDGET the literal path must fail at plan
    CONSTRUCTION with a clear error (never a codegen stall), and 'auto' must
    route to the join form instead of raising."""
    from airflow_courier_payout_ledger_pipeline_spark.operators.similarity import (
        UNROLLED_LITERAL_BUDGET,
        _assign_to_centroids,
        _centroid_probes,
        ivf_topk,
    )

    dim = 64
    k = UNROLLED_LITERAL_BUDGET // dim + 1  # first size over budget
    big = [(i, [float(i % 7)] * dim) for i in range(k)]
    with pytest.raises(ValueError, match="unrolled-literal budget"):
        _assign_to_centroids(big, "embedding")
    with pytest.raises(ValueError, match="unrolled-literal budget"):
        _centroid_probes("embedding", big, 2)
    emb = spark.createDataFrame(
        [(i, [float(i)] * dim) for i in range(4)], "vec_id long, embedding array<float>"
    )
    with pytest.raises(ValueError, match="unrolled-literal budget"):
        ivf_topk(emb, emb, big, k=2, assign_mode="literal")
    # auto routes to the join form: the plan builds and executes
    out = ivf_topk(emb, emb.filter(F.col("vec_id") < 2), big, k=2, assign_mode="auto")
    rows = out.collect()
    assert all(r.rank <= 2 for r in rows)
    with pytest.raises(ValueError, match="assign_mode"):
        ivf_topk(emb, emb, big, k=2, assign_mode="nope")


def test_ivf_family_join_mode_matches_literal(clustered):
    """The whole IVF family routes through assign_mode: ivf_pq_topk,
    ivf_pq_residual_topk, ivf_list_state (and residual_frame inside it)
    return byte-equal rows in 'join' and 'literal' modes — so 'auto' can
    carry any nlist past UNROLLED_LITERAL_BUDGET without changing a single
    result."""
    from airflow_courier_payout_ledger_pipeline_spark.operators.similarity import (
        ivf_list_state,
        ivf_pq_residual_topk,
        ivf_pq_topk,
        kmeans_centroids_exact,
        pq_codebooks_exact,
        residual_frame,
    )

    cents = kmeans_centroids_exact(clustered, k=2, iters=1)
    books = pq_codebooks_exact(clustered, m=2, kc=2, iters=1)
    q = clustered.filter(F.col("vec_id") < 4)

    def rows(df):
        return sorted(map(tuple, df.collect()))

    for nprobe in (1, 2):
        assert rows(
            ivf_pq_topk(clustered, q, cents, books, k=3, nprobe=nprobe, assign_mode="literal")
        ) == rows(
            ivf_pq_topk(clustered, q, cents, books, k=3, nprobe=nprobe, assign_mode="join")
        )
    res = residual_frame(clustered, cents, assign_mode="join").select("vec_id", "__res")
    rbooks = pq_codebooks_exact(res, m=2, kc=2, iters=1, vec_col="__res")
    for nprobe in (1, 2):
        assert rows(
            ivf_pq_residual_topk(clustered, q, cents, rbooks, k=3, nprobe=nprobe, assign_mode="literal")
        ) == rows(
            ivf_pq_residual_topk(clustered, q, cents, rbooks, k=3, nprobe=nprobe, assign_mode="join")
        )
    assert rows(ivf_list_state(clustered, cents, assign_mode="literal")) == rows(
        ivf_list_state(clustered, cents, assign_mode="join")
    )
    # residual_frame itself: identical assignments and residuals
    lit = residual_frame(clustered, cents, assign_mode="literal")
    jn = residual_frame(clustered, cents, assign_mode="join")
    assert rows(lit.select("vec_id", "centroid")) == rows(jn.select("vec_id", "centroid"))


def test_pq_literal_builders_raise_past_budget():
    """kc·dim past the budget must fail at plan construction with the
    join-form encode hint, not stall in codegen."""
    from airflow_courier_payout_ledger_pipeline_spark.operators.similarity import (
        _pq_adc_table,
        _pq_codes,
    )

    # m=16 subspaces × sub=16 dims (dim=256) × kc=128 codewords = 32768 literals
    books = [[[0.0] * 16 for _ in range(128)] for _ in range(16)]
    with pytest.raises(ValueError, match="unrolled-literal budget"):
        _pq_codes("embedding", books)
    with pytest.raises(ValueError, match="unrolled-literal budget"):
        _pq_adc_table("embedding", books)


def test_residual_sweep_matches_per_nprobe_searches(clustered):
    """ivf_pq_residual_topk_sweep must be per-setting identical to running
    ivf_pq_residual_topk at each nprobe — one corpus encode evaluating the
    whole dial."""
    from airflow_courier_payout_ledger_pipeline_spark.operators.similarity import (
        ivf_pq_residual_topk,
        ivf_pq_residual_topk_sweep,
        kmeans_centroids_exact,
        pq_codebooks_exact,
        residual_frame,
    )

    cents = kmeans_centroids_exact(clustered, k=2, iters=1)
    res = residual_frame(clustered, cents).select("vec_id", "__res")
    books = pq_codebooks_exact(res, m=2, kc=2, iters=1, vec_col="__res")
    q = clustered.filter(F.col("vec_id") < 4)
    for mode in ("literal", "join"):
        sweep = ivf_pq_residual_topk_sweep(
            clustered, q, cents, books, k=3, nprobes=(1, 2), assign_mode=mode
        ).collect()
        by_np = {}
        for r in sweep:
            by_np.setdefault(r.nprobe, set()).add(
                (r.query_id, r.neighbor_id, r.adc_dist, r.rank)
            )
        for np_ in (1, 2):
            single = {
                (r.query_id, r.neighbor_id, r.adc_dist, r.rank)
                for r in ivf_pq_residual_topk(
                    clustered, q, cents, books, k=3, nprobe=np_, assign_mode=mode
                ).collect()
            }
            assert by_np.get(np_, set()) == single, (mode, np_)


def test_refine_recovers_exact_order_within_shortlist(clustered):
    """Two-stage refine: with a shortlist covering the whole inverted list,
    the final top-k equals EXACT brute-force cosine restricted to the probed
    cell — quantization error decides which candidates are seen, never their
    final order — and refine's hit rate vs exact top-k is >= plain ADC's."""
    from airflow_courier_payout_ledger_pipeline_spark.operators.similarity import (
        ivf_pq_residual_refine_topk,
        ivf_pq_residual_topk,
        ivf_topk,
        kmeans_centroids_exact,
        pq_codebooks_exact,
        residual_frame,
    )

    cents = kmeans_centroids_exact(clustered, k=2, iters=2)
    res = residual_frame(clustered, cents).select("vec_id", "__res")
    books = pq_codebooks_exact(res, m=2, kc=2, iters=1, vec_col="__res")
    q = clustered.filter(F.col("vec_id") < 4)

    # shortlist >= list size: refine == exact cosine within the probed cell
    refined = ivf_pq_residual_refine_topk(
        clustered, q, cents, books, k=3, shortlist=40
    )
    exact_in_cell = ivf_topk(clustered, q, cents, k=3, nprobe=1)
    assert sorted(map(tuple, refined.collect())) == sorted(
        map(tuple, exact_in_cell.collect())
    )

    # tight shortlist: refine's agreement with the exact in-cell top-k is
    # at least plain ADC's (re-ranking can only fix orderings, not lose
    # candidates ADC already surfaced)
    truth = {
        (r.query_id, r.neighbor_id) for r in exact_in_cell.collect()
    }
    ref5 = {
        (r.query_id, r.neighbor_id)
        for r in ivf_pq_residual_refine_topk(
            clustered, q, cents, books, k=3, shortlist=6
        ).collect()
    }
    adc = {
        (r.query_id, r.neighbor_id)
        for r in ivf_pq_residual_topk(clustered, q, cents, books, k=3).collect()
    }
    assert len(ref5 & truth) >= len(adc & truth)


def test_variant_hits_sweep_matches_per_nprobe_ivf_topk(clustered):
    """ivf_variant_hits' single-assignment probe-rank sweep must produce the
    exact hit counts of running ivf_topk per (variant, nprobe) — the gate's
    integer evidence may not drift when the compute path is optimized."""
    from airflow_courier_payout_ledger_pipeline_spark.operators.similarity import (
        ivf_variant_hits,
        kmeans_centroids_exact,
    )

    q = clustered.filter(F.col("vec_id") < 6)
    variants = [
        ("seeded", kmeans_centroids_exact(clustered, k=2, iters=0)),
        ("trained", kmeans_centroids_exact(clustered, k=2, iters=2)),
    ]
    got = {
        (r.variant, r.nprobe): r.n_hit
        for r in ivf_variant_hits(clustered, q, variants, nprobes=(1, 2), k=3).collect()
    }
    truth = {
        (r.query_id, r.neighbor_id)
        for r in brute_force_topk(clustered, q, k=3).collect()
    }
    for vname, cents in variants:
        for np_ in (1, 2):
            single = {
                (r.query_id, r.neighbor_id)
                for r in ivf_topk(clustered, q, cents, k=3, nprobe=np_).collect()
            }
            assert got.get((vname, np_), 0) == len(single & truth), (vname, np_)
