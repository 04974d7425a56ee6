"""Mergeable Bloom-filter state: set-membership pruning at 100 TB.

The exact incremental-dedup probe (``dedup.incremental_exact_dedup``) joins the
nightly increment's fingerprints against a persisted corpus index — at corpus
scale that join shuffles (or at best broadcast-hashes) the FULL increment even
though almost none of it matches. A Bloom filter over the indexed side turns
the membership test into a pure map predicate: ~10 bits per indexed key (vs
32-byte md5 hex strings — a ~25x reduction), probed inline in the increment
scan with k hash+bit-test expressions, no join build side, no exchange. The
filter's one-sided error (NO false negatives) makes it a safe prune: the
candidate set is a guaranteed SUPERSET of true members, and the downstream
exact join — now over the tiny candidate remainder — restores equality, the
same prune-then-verify contract as the CMS heavy-hitter candidates and the
trigram substring index (``operators/sketch.py``, ``operators/search.py``).

State design mirrors the CMS discipline exactly:
- the DataFrame state is (word, bits, m_bits, k): ≤ m_bits/64 rows of bigint
  bitmap words, built by one grouped ``bit_or`` with map-side partials — the
  exchange carries ≤ m_bits/64 rows per map task, never raw values;
- the BUILD geometry (m_bits, k) rides along as constant columns: geometry
  drift between build and probe mis-indexes every bit and silently breaks the
  no-false-negative guarantee, so ``merge_bloom_states`` / the probe builders
  fail loudly on mismatch (global check — a per-word check would pass
  whenever occupied words don't overlap, exactly the CMS sparse-state trap);
- merging states built on increments is bit-or algebra: associative,
  commutative, idempotent — replay-safe under at-least-once delivery, and
  merged(A) OR merged(B) carries the same bits as build(A ∪ B), so a probe
  against the fold of nightly increment states equals a probe against a full
  rebuild (law pinned in ``tests/test_bloom.py``).

Sizing: with m bits and k hashes over n keys, false-positive rate ≈
(1 − e^(−kn/m))^k; the 2^17-bit default holds ~1 % FP at n ≈ 12k keys with
k = 5. The collected literal-expression probe (``bloom_might_contain_expr``)
is the zero-exchange path and is appropriate while m_bits/64 longs stay
driver-bounded (the 2^17 default is 2 KiB; ~10^7 indexed keys at 10 bits/key
is ~12 MiB — still a fine literal/broadcast). Beyond that, keep the state as
a DataFrame and use ``bloom_semi_probe`` (broadcast word join) — same
contract, Spark manages the shipping.

NULL values: ``xxhash64`` skips NULL arguments, so every NULL probes the same
k seed-only positions — "NULL ∈ set" is not meaningful, and a state built
over NULLs will bloom-accept any NULL probe. This is SAFE under the
prune-then-verify contract (an equi-join never matches NULL, so the exact
verify always classifies NULL probes as non-members), but a caller using the
raw predicate without a verify should filter NULLs first.

No reference twin: the reference pipeline has no membership-prune surface;
this is part of the 100 TB extension surface next to CMS/HLL.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

#: 2^17 bits = 2 KiB of bitmap; with k=5 holds ~1% FP to ~12k indexed keys.
BLOOM_M_BITS = 1 << 17
BLOOM_K = 5

#: probe-Column memo keyed on state content (see bloom_might_contain_expr)
_PROBE_MEMO: dict[tuple, Column] = {}
_PROBE_MEMO_CAP = 64


def _positions(value: Column, m_bits: int, k: int, seed: Column) -> Column:
    """Bit position for one (value, seed) pair: xxhash64 — JVM-side, no Python.
    Internal pruning state never crosses engines, so the hash needs no DuckDB
    twin (same rationale as the CMS bucket hash's xxhash64)."""
    return F.pmod(F.xxhash64(value, seed), F.lit(m_bits))


def bloom_build(
    df: DataFrame,
    value_col: str,
    m_bits: int = BLOOM_M_BITS,
    k: int = BLOOM_K,
) -> DataFrame:
    """Bloom state over a column: (word, bits, m_bits, k), ≤ m_bits/64 rows.
    One grouped bit_or with map-side partials; duplicates in the input are
    free (bit-or is idempotent), so no pre-distinct shuffle is ever needed."""
    if m_bits % 64 != 0 or m_bits <= 0:
        raise ValueError(f"m_bits must be a positive multiple of 64, got {m_bits}")
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    seeds = F.explode(F.array(*[F.lit(i) for i in range(k)])).alias("seed")
    pos = _positions(F.col("__v"), m_bits, k, F.col("seed"))
    return (
        df.select(F.col(value_col).alias("__v"), seeds)
        .select(pos.alias("__pos"))
        .select(
            (F.col("__pos") / 64).cast("int").alias("word"),
            # F.shiftleft takes only a literal bit count — the column-shift
            # spelling needs the SQL expression form
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pmod(__pos, 64) AS INT))").alias(
                "__m"
            ),
        )
        .groupBy("word")
        .agg(
            F.bit_or("__m").alias("bits"),
            F.lit(m_bits).alias("m_bits"),
            F.lit(k).alias("k"),
        )
    )


def bloom_build_partitioned(
    df: DataFrame,
    value_col: str,
    part_col: str,
    m_bits: int = BLOOM_M_BITS,
    k: int = BLOOM_K,
) -> DataFrame:
    """Per-partition-key Bloom states in ONE input scan: (part, word, bits,
    m_bits, k) — selecting one key and dropping ``part`` yields exactly the
    state ``bloom_build`` would produce from that key's subset (law-tested).
    This is how a backfill builds MANY increment states (one per day/source)
    without one scan per key; the states then fold forward one merge at a
    time as increments retire. A further bonus under Spark's exchange reuse:
    two branches filtering different keys off this ONE grouped result share
    the same exchange, where two separate ``bloom_build`` calls would scan
    the input once each."""
    if m_bits % 64 != 0 or m_bits <= 0:
        raise ValueError(f"m_bits must be a positive multiple of 64, got {m_bits}")
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    seeds = F.explode(F.array(*[F.lit(i) for i in range(k)])).alias("seed")
    pos = _positions(F.col("__v"), m_bits, k, F.col("seed"))
    return (
        df.select(F.col(part_col).alias("part"), F.col(value_col).alias("__v"), seeds)
        .select("part", pos.alias("__pos"))
        .select(
            "part",
            (F.col("__pos") / 64).cast("int").alias("word"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pmod(__pos, 64) AS INT))").alias(
                "__m"
            ),
        )
        .groupBy("part", "word")
        .agg(
            F.bit_or("__m").alias("bits"),
            F.lit(m_bits).alias("m_bits"),
            F.lit(k).alias("k"),
        )
    )


def merge_bloom_states(a: DataFrame, b: DataFrame) -> DataFrame:
    """Fold two Bloom states built with the same (m_bits, k): word-wise bit_or.
    Associative, commutative, idempotent — nightly increment states compose in
    any order and replays are no-ops. Geometry mismatch raises lazily via a
    GLOBAL bounds check (an unpartitioned window over the merged state — the
    state is ≤ m_bits/64 rows, so this costs nothing); a per-word check would
    pass silently whenever the two states' occupied words are disjoint."""
    u = a.unionByName(b)
    # per-group min/max ride the SAME aggregation as the bit_or, and the
    # GLOBAL bounds come from an unpartitioned window over the merged
    # (≤ m_bits/64-row) result — one plan, one execution. The previous
    # crossJoin(broadcast(agg)) shape planned the bounds as a separate
    # broadcast subtree that RE-EXECUTED both input builds (4 file scans,
    # zero ReusedExchange — verified on the physical plan); the window runs
    # over rows already merged. The single-partition window is safe by
    # construction: the state is geometry-bounded, never data-sized.
    # Detection is equivalent: global min over per-group mins == min over
    # all union rows, so disjoint-word geometry drift still fails loudly.
    merged = u.groupBy("word").agg(
        F.bit_or("bits").alias("bits"),
        F.min("m_bits").alias("__mmin"),
        F.max("m_bits").alias("__mmax"),
        F.min("k").alias("__kmin"),
        F.max("k").alias("__kmax"),
    )
    w = Window.partitionBy()
    bad = (F.min("__mmin").over(w) != F.max("__mmax").over(w)) | (
        F.min("__kmin").over(w) != F.max("__kmax").over(w)
    )
    return merged.select(
        "word",
        "bits",
        F.when(
            bad, F.raise_error(F.lit("bloom geometry mismatch between merged states"))
        )
        .otherwise(F.col("__mmax"))
        .alias("m_bits"),
        F.when(bad, F.raise_error(F.lit("bloom geometry mismatch between merged states")))
        .otherwise(F.col("__kmax"))
        .alias("k"),
    )


def _state_geometry(state_rows: list) -> tuple[list[int], int, int]:
    """Dense word list + validated (m_bits, k) from collected state rows."""
    if not state_rows:
        return [], BLOOM_M_BITS, BLOOM_K
    ms = {r["m_bits"] for r in state_rows}
    ks = {r["k"] for r in state_rows}
    if len(ms) > 1 or len(ks) > 1:
        raise ValueError(
            f"bloom state has inconsistent geometry m_bits={sorted(ms)} k={sorted(ks)}"
        )
    (m_bits,), (k,) = ms, ks
    n_words = m_bits // 64
    words = [0] * n_words
    for r in state_rows:
        if not (0 <= r["word"] < n_words):
            raise ValueError(
                f"bloom state word {r['word']} outside geometry m_bits={m_bits}"
            )
        words[r["word"]] = r["bits"]
    return words, m_bits, k


def bloom_might_contain_expr(state_rows: list, value_col) -> Column:
    """Membership test as a pure column expression over a COLLECTED state
    (≤ m_bits/64 bigint words — the same O(1) driver-state bound as the CMS
    probe): AND over the k seeds of ``words[pos/64] & (1 << pos%64) != 0``.
    The word array is ONE parsed ``array(...)`` literal
    (``functions/literals.array_lit``, a single expr call / plan node — the
    heavy-hitters py4j lesson, extended round 9 to literal CONSTRUCTION). TRUE is a maybe (FP rate by sizing); FALSE is
    certain — the predicate is a guaranteed-superset prune, so an exact
    verify downstream restores equality. An EMPTY state contains nothing:
    the expression is ``lit(False)``. The built Column memoizes on the state
    CONTENT (words, geometry, probed column name — r18): the k-seed
    hash/getbit chain costs ~0.1 s of py4j per build against a state that
    repeats across constructions; content keys cannot go stale and the
    Column is an immutable AST (the state collect feeding ``state_rows``
    still runs at every build — this caches construction metadata only)."""
    words, m_bits, k = _state_geometry(state_rows)
    if not words:
        return F.lit(False)
    key = (
        (tuple(words), m_bits, k, value_col)
        if isinstance(value_col, str)
        else None
    )
    if key is not None:
        cached = _PROBE_MEMO.get(key)
        if cached is not None:
            return cached
    from airflow_courier_payout_ledger_pipeline_spark.functions.literals import (
        array_lit,
    )

    value_col = F.col(value_col) if isinstance(value_col, str) else value_col
    # array_lit renders BIGINT elements (the L suffix), which also preserves
    # the width getbit validates positions against: an inferred array<int>
    # from all-small words would reject every bit >= 32 (hypothesis-found on
    # random small member sets). One expr parse vs ~0.75 s of per-element
    # py4j conversions for F.lit(list) at the 2048-word default.
    arr = array_lit(words)
    conj = None
    for i in range(k):
        pos = _positions(value_col, m_bits, k, F.lit(i))
        word = F.element_at(arr, (pos / 64).cast("int") + 1)
        term = F.getbit(word, (pos % 64).cast("int")) == 1
        conj = term if conj is None else (conj & term)
    if key is not None:
        if len(_PROBE_MEMO) >= _PROBE_MEMO_CAP:
            _PROBE_MEMO.clear()
        _PROBE_MEMO[key] = conj
    return conj


def bloom_semi_probe(
    items: DataFrame, state: DataFrame, value_col: str
) -> DataFrame:
    """DataFrame-state probe for geometries too large to collect as a literal:
    items surviving the Bloom test (a SUPERSET of true members). The state is
    ≤ m_bits/64 rows → broadcast; each of the k seeds contributes one
    broadcast LEFT join resolving the item's word for that seed, and the item
    survives iff every joined word has its bit set (absent word = bit clear =
    certain miss). ZERO exchanges of the items side and ROW-PRESERVING: this
    is a pure filter, so duplicate input rows survive as duplicates — the
    previous explode + groupBy-over-all-columns shape silently collapsed
    identical rows to one (set semantics where filter semantics were
    promised; caught in the round-9 review pass) and shuffled the items at
    item grain besides."""
    geo = state.agg(
        F.min("m_bits").alias("mmin"),
        F.max("m_bits").alias("mmax"),
        F.min("k").alias("kmin"),
        F.max("k").alias("kmax"),
    ).first()
    if geo["mmin"] is None:
        return items.limit(0)
    if geo["mmin"] != geo["mmax"] or geo["kmin"] != geo["kmax"]:
        raise ValueError("bloom state has inconsistent geometry")
    m_bits, k = geo["mmax"], geo["kmax"]
    keep = list(items.columns)
    out = items
    conds = []
    for i in range(k):
        pos = _positions(F.col(value_col), m_bits, k, F.lit(i))
        st = state.select(
            F.col("word").alias(f"__w{i}"), F.col("bits").alias(f"__bits{i}")
        )
        out = out.join(
            F.broadcast(st), F.col(f"__w{i}") == (pos / 64).cast("int"), "left"
        )
        conds.append(
            F.getbit(
                F.coalesce(F.col(f"__bits{i}"), F.lit(0).cast("long")),
                (pos % 64).cast("int"),
            )
            == 1
        )
    cond = conds[0]
    for c in conds[1:]:
        cond = cond & c
    return out.filter(cond).select(*keep)
