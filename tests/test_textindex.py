"""Persisted BM25 postings index: bit-parity with the live scorer, the
extend law and its O(increment) write, crash windows, compaction."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from airflow_courier_payout_ledger_pipeline_spark.operators.search import bm25_topk
from airflow_courier_payout_ledger_pipeline_spark.operators.textindex import (
    DOCLEN,
    POSTINGS,
    STATS,
    TERMSTATS,
    build_bm25_index,
    bm25_search_indexed,
    compact_bm25_index,
    extend_bm25_index,
)
from airflow_courier_payout_ledger_pipeline_spark.sources.lakehouse import Lakehouse


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "alpha beta gamma alpha"),
        (1, "alpha alpha alpha"),
        (2, "beta delta"),
        (3, "Gamma, beta! alpha?"),
        (4, "delta delta epsilon"),
        (5, "zeta eta theta"),
        (6, "alpha beta"),
        (7, "unique words only here"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _search_rows(df):
    return sorted(map(tuple, df.collect()))


def test_indexed_search_bit_identical_to_live_scorer(spark, docs, tmp_path):
    lake = Lakehouse(str(tmp_path))
    build_bm25_index(lake, "idx", docs)
    for terms in (["alpha", "beta"], ["delta"], ["alpha", "nosuchterm"], ["gamma,"]):
        live = _search_rows(bm25_topk(docs, terms, k=5))
        idx = _search_rows(bm25_search_indexed(lake, "idx", spark, terms, k=5))
        assert live == idx, terms


def test_extend_equals_full_build_and_replays_as_noop(spark, docs, tmp_path):
    even = docs.filter(F.col("doc_id") % 2 == 0)
    odd = docs.filter(F.col("doc_id") % 2 == 1)
    inc = Lakehouse(str(tmp_path / "inc"))
    build_bm25_index(inc, "idx", even)
    extend_bm25_index(inc, "idx", odd)
    full = Lakehouse(str(tmp_path / "full"))
    build_bm25_index(full, "idx", docs)
    schemas = {
        POSTINGS: "term string, doc_id long, tf bigint, dl bigint",
        DOCLEN: "doc_id long, dl bigint",
        TERMSTATS: "term string, df bigint",
        STATS: "n_docs bigint, sum_dl bigint",
    }
    for table, ddl in schemas.items():
        a = sorted(map(tuple, inc.read_committed(
            spark, "idx", table, StructType.fromDDL(ddl)).collect()))
        b = sorted(map(tuple, full.read_committed(
            spark, "idx", table, StructType.fromDDL(ddl)).collect()))
        assert a == b, table
    assert _search_rows(
        bm25_search_indexed(inc, "idx", spark, ["alpha", "beta"], k=5)
    ) == _search_rows(bm25_search_indexed(full, "idx", spark, ["alpha", "beta"], k=5))
    # replay: already-indexed ids change nothing
    before = sorted(map(tuple, inc.read_committed(
        spark, "idx", POSTINGS, StructType.fromDDL(schemas[POSTINGS])).collect()))
    extend_bm25_index(inc, "idx", odd)
    after = sorted(map(tuple, inc.read_committed(
        spark, "idx", POSTINGS, StructType.fromDDL(schemas[POSTINGS])).collect()))
    assert before == after


def test_extend_write_is_o_increment(spark, docs, tmp_path):
    even = docs.filter(F.col("doc_id") % 2 == 0)
    odd = docs.filter(F.col("doc_id") % 2 == 1)
    lake = Lakehouse(str(tmp_path))
    build_bm25_index(lake, "idx", even)
    v0 = lake.current_manifest()[f"idx/{POSTINGS}"]
    assert isinstance(v0, int)
    d0 = lake.root / "idx" / POSTINGS / f"v={v0}"
    before_files = {p.name: (p.stat().st_size, p.stat().st_mtime_ns)
                    for p in d0.rglob("*.parquet")}
    extend_bm25_index(lake, "idx", odd)
    vs = lake.current_manifest()[f"idx/{POSTINGS}"]
    assert isinstance(vs, list) and vs[0] == v0 and len(vs) == 2
    after_files = {p.name: (p.stat().st_size, p.stat().st_mtime_ns)
                  for p in d0.rglob("*.parquet")}
    assert after_files == before_files  # history's bytes untouched
    # the new dir holds exactly the increment's postings
    new_rows = spark.read.parquet(str(lake.root / "idx" / POSTINGS / f"v={vs[1]}"))
    from airflow_courier_payout_ledger_pipeline_spark.operators.textindex import (
        _index_frames,
    )

    want = _index_frames(odd, "doc_id", "text")[0].count()
    assert new_rows.count() == want
    # doclen appended the same way; termstats/stats restaged as single dirs
    assert isinstance(lake.current_manifest()[f"idx/{DOCLEN}"], list)
    assert isinstance(lake.current_manifest()[f"idx/{TERMSTATS}"], int)


def test_extend_crash_window_preserves_old_index(spark, docs, tmp_path):
    from unittest import mock

    even = docs.filter(F.col("doc_id") % 2 == 0)
    odd = docs.filter(F.col("doc_id") % 2 == 1)
    lake = Lakehouse(str(tmp_path))
    build_bm25_index(lake, "idx", even)
    before = _search_rows(bm25_search_indexed(lake, "idx", spark, ["alpha"], k=5))
    mid_before = lake.current_manifest_id()
    with pytest.raises(RuntimeError, match="kill"), mock.patch.object(
        Lakehouse, "commit_manifest", side_effect=RuntimeError("kill")
    ):
        extend_bm25_index(lake, "idx", odd)
    assert lake.current_manifest_id() == mid_before
    assert _search_rows(
        bm25_search_indexed(lake, "idx", spark, ["alpha"], k=5)
    ) == before
    # replay converges to the full index
    extend_bm25_index(lake, "idx", odd)
    full = Lakehouse(str(tmp_path / "full"))
    build_bm25_index(full, "idx", docs)
    assert _search_rows(
        bm25_search_indexed(lake, "idx", spark, ["alpha"], k=5)
    ) == _search_rows(bm25_search_indexed(full, "idx", spark, ["alpha"], k=5))


def test_compact_folds_multifile_and_is_noop_when_single(spark, docs, tmp_path):
    lake = Lakehouse(str(tmp_path))
    build_bm25_index(lake, "idx", docs.filter(F.col("doc_id") < 3))
    extend_bm25_index(lake, "idx", docs.filter((F.col("doc_id") >= 3) & (F.col("doc_id") < 6)))
    extend_bm25_index(lake, "idx", docs.filter(F.col("doc_id") >= 6))
    assert len(Lakehouse.as_versions(lake.current_manifest()[f"idx/{POSTINGS}"])) == 3
    before = _search_rows(bm25_search_indexed(lake, "idx", spark, ["alpha", "beta"], k=8))
    compact_bm25_index(lake, "idx", spark)
    assert isinstance(lake.current_manifest()[f"idx/{POSTINGS}"], int)
    assert isinstance(lake.current_manifest()[f"idx/{DOCLEN}"], int)
    assert _search_rows(
        bm25_search_indexed(lake, "idx", spark, ["alpha", "beta"], k=8)
    ) == before
    assert compact_bm25_index(lake, "idx", spark) == lake.current_manifest_id()


def test_cold_start_and_guards(spark, docs, tmp_path):
    lake = Lakehouse(str(tmp_path))
    with pytest.raises(ValueError, match="build_bm25_index first"):
        extend_bm25_index(lake, "idx", docs)
    empty = docs.filter(F.col("doc_id") < 0)
    build_bm25_index(lake, "idx", empty)
    assert bm25_search_indexed(lake, "idx", spark, ["alpha"], k=5).count() == 0
    # extend over the empty index bootstraps it (no trained artifact to lose)
    extend_bm25_index(lake, "idx", docs)
    assert bm25_search_indexed(lake, "idx", spark, ["alpha"], k=5).count() > 0
    # wrong id_col raises instead of NULL-id reads
    with pytest.raises(ValueError, match="keyed by"):
        bm25_search_indexed(lake, "idx", spark, ["alpha"], k=5, id_col="vec_id")
    # a never-committed layer searches empty
    assert bm25_search_indexed(lake, "nope", spark, ["alpha"], k=5).count() == 0


def test_trigram_index_build_extend_search(spark, docs, tmp_path):
    """The committed trigram rail: indexed search ≡ the live full-derive
    search; extend(build(A), B) ≡ build(A ∪ B) on both tables; replay is a
    no-op; wrong id_col raises."""
    from airflow_courier_payout_ledger_pipeline_spark.operators.search import (
        substring_search,
    )
    from airflow_courier_payout_ledger_pipeline_spark.operators.textindex import (
        TGDOCS,
        TRIGRAMS,
        build_trigram_index,
        extend_trigram_index,
        substring_search_indexed,
    )

    even = docs.filter(F.col("doc_id") % 2 == 0)
    odd = docs.filter(F.col("doc_id") % 2 == 1)
    inc = Lakehouse(str(tmp_path / "inc"))
    build_trigram_index(inc, "idx", even)
    extend_trigram_index(inc, "idx", odd)
    full = Lakehouse(str(tmp_path / "full"))
    build_trigram_index(full, "idx", docs)
    for table, ddl in ((TRIGRAMS, "doc_id long, tg string"), (TGDOCS, "doc_id long")):
        a = sorted(map(tuple, inc.read_committed(
            spark, "idx", table, StructType.fromDDL(ddl)).collect()))
        b = sorted(map(tuple, full.read_committed(
            spark, "idx", table, StructType.fromDDL(ddl)).collect()))
        assert a == b, table
    assert isinstance(inc.current_manifest()[f"idx/{TRIGRAMS}"], list)  # multi-file
    for needle in ("alpha", "beta!", "zz"):  # incl. punctuation + sub-trigram fallback
        live = sorted(map(tuple, substring_search(docs, needle).collect()))
        idx = sorted(map(tuple, substring_search_indexed(inc, "idx", docs, needle).collect()))
        assert live == idx, needle
    # replay no-op
    before = sorted(map(tuple, inc.read_committed(
        spark, "idx", TRIGRAMS, StructType.fromDDL("doc_id long, tg string")).collect()))
    extend_trigram_index(inc, "idx", odd)
    after = sorted(map(tuple, inc.read_committed(
        spark, "idx", TRIGRAMS, StructType.fromDDL("doc_id long, tg string")).collect()))
    assert before == after
    # guards
    with pytest.raises(ValueError, match="build_trigram_index first"):
        extend_trigram_index(Lakehouse(str(tmp_path / "none")), "idx", docs)
    with pytest.raises(ValueError, match="keyed by"):
        substring_search_indexed(
            inc, "idx", docs.withColumnRenamed("doc_id", "vec_id"), "alpha",
            id_col="vec_id",
        )

def test_trigram_compact_folds_multifile_and_is_noop_when_single(spark, docs, tmp_path):
    """The trigram rail's compaction twin (r14 verdict item 2): after two
    extends the postings/docids tables are 3-dir lists; compaction folds both
    to ONE tg-clustered dir, row-identically vs a fresh full build, searches
    are unchanged, and compacting a single-dir index is a no-op returning the
    current manifest id. The tightest retention sweep keeps the compacted
    index readable (multi-file members are manifest-pinned until superseded)."""
    from airflow_courier_payout_ledger_pipeline_spark.operators.textindex import (
        TGDOCS,
        TRIGRAMS,
        build_trigram_index,
        compact_trigram_index,
        extend_trigram_index,
        substring_search_indexed,
    )

    lake = Lakehouse(str(tmp_path / "inc"))
    build_trigram_index(lake, "idx", docs.filter(F.col("doc_id") < 3))
    extend_trigram_index(
        lake, "idx", docs.filter((F.col("doc_id") >= 3) & (F.col("doc_id") < 6))
    )
    extend_trigram_index(lake, "idx", docs.filter(F.col("doc_id") >= 6))
    assert len(Lakehouse.as_versions(lake.current_manifest()[f"idx/{TRIGRAMS}"])) == 3
    before = sorted(
        map(tuple, substring_search_indexed(lake, "idx", docs, "alpha").collect())
    )
    compact_trigram_index(lake, "idx", spark)
    assert isinstance(lake.current_manifest()[f"idx/{TRIGRAMS}"], int)
    assert isinstance(lake.current_manifest()[f"idx/{TGDOCS}"], int)
    # row-identity vs a fresh full build on BOTH tables
    full = Lakehouse(str(tmp_path / "full"))
    build_trigram_index(full, "idx", docs)
    for table, ddl in ((TRIGRAMS, "doc_id long, tg string"), (TGDOCS, "doc_id long")):
        a = sorted(map(tuple, lake.read_committed(
            spark, "idx", table, StructType.fromDDL(ddl)).collect()))
        b = sorted(map(tuple, full.read_committed(
            spark, "idx", table, StructType.fromDDL(ddl)).collect()))
        assert a == b, table
    assert sorted(
        map(tuple, substring_search_indexed(lake, "idx", docs, "alpha").collect())
    ) == before
    # no-op law on the already-single-dir index
    assert compact_trigram_index(lake, "idx", spark) == lake.current_manifest_id()
    # retention: the tightest sweep keeps the compacted snapshot readable
    lake.retention_sweep(keep_manifests=1, keep_versions=1, drop_staged=True)
    assert sorted(
        map(tuple, substring_search_indexed(lake, "idx", docs, "alpha").collect())
    ) == before
    # guard: compacting a never-committed layer raises
    with pytest.raises(ValueError, match="no committed index"):
        compact_trigram_index(Lakehouse(str(tmp_path / "none")), "idx", spark)


def test_empty_index_search_preserves_committed_id_type(spark, tmp_path):
    """The r14 ADVICE hazard: a STRING-keyed index built over an empty corpus
    must return a string-typed empty frame (the committed doclen field's
    type), not the long default — only the never-committed cold start, where
    no committed type exists to honor, defaults to long."""
    lake = Lakehouse(str(tmp_path))
    sdocs = spark.createDataFrame([], "doc_key string, text string")
    build_bm25_index(lake, "idx", sdocs, id_col="doc_key")
    out = bm25_search_indexed(lake, "idx", spark, ["alpha"], k=5, id_col="doc_key")
    assert out.count() == 0
    assert dict(out.dtypes)["doc_key"] == "string"
    # never-committed layer: documented long default
    cold = bm25_search_indexed(lake, "nope", spark, ["alpha"], k=5, id_col="doc_key")
    assert cold.count() == 0 and dict(cold.dtypes)["doc_key"] == "bigint"


def test_bm25_retention_sweep_keeps_multifile_members_readable(spark, docs, tmp_path):
    """Every member dir of the committed multi-file postings/doclen versions
    is pinned by the manifest refs — the tightest retention sweep must not
    break the union read (the annindex law, here for the lexical rail)."""
    even = docs.filter(F.col("doc_id") % 2 == 0)
    odd = docs.filter(F.col("doc_id") % 2 == 1)
    lake = Lakehouse(str(tmp_path))
    build_bm25_index(lake, "idx", even)
    extend_bm25_index(lake, "idx", odd)
    lake.retention_sweep(keep_manifests=1, keep_versions=1, drop_staged=True)
    full = Lakehouse(str(tmp_path / "full"))
    build_bm25_index(full, "idx", docs)
    assert _search_rows(
        bm25_search_indexed(lake, "idx", spark, ["alpha", "beta"], k=8)
    ) == _search_rows(bm25_search_indexed(full, "idx", spark, ["alpha", "beta"], k=8))


def test_bm25_full_maintenance_cycle_reclaims_history_and_spares_serving(
    spark, docs, tmp_path
):
    """The bm25_search_vacuumed contract as a unit law (the annindex r16
    twin): after build → extend → compact, the tightest retention sweep must
    RECLAIM the pre-compaction manifests and the postings/doclen dirs they
    pinned — real deletions — and leave the search bit-identical to a fresh
    full build. Retention deletes history, never the serving surface."""
    even = docs.filter(F.col("doc_id") % 2 == 0)
    odd = docs.filter(F.col("doc_id") % 2 == 1)
    lake = Lakehouse(str(tmp_path))
    build_bm25_index(lake, "idx", even)
    extend_bm25_index(lake, "idx", odd)
    pre_posting_dirs = set(lake.versions("idx", POSTINGS))
    compact_bm25_index(lake, "idx", spark)
    compacted_v = lake.current_manifest()[f"idx/{POSTINGS}"]

    audit = lake.retention_sweep(keep_manifests=1, keep_versions=1)
    assert audit["manifests"], "sweep reclaimed no manifests"
    assert set(audit["versions"].get(f"idx/{POSTINGS}", [])) == pre_posting_dirs
    assert audit["versions"].get(f"idx/{DOCLEN}"), "doclen history not reclaimed"
    for v in pre_posting_dirs:
        assert not (tmp_path / "idx" / POSTINGS / f"v={v}").exists()
    assert (tmp_path / "idx" / POSTINGS / f"v={compacted_v}").exists()

    full = Lakehouse(str(tmp_path / "full"))
    build_bm25_index(full, "idx", docs)
    assert _search_rows(
        bm25_search_indexed(lake, "idx", spark, ["alpha", "beta"], k=8)
    ) == _search_rows(bm25_search_indexed(full, "idx", spark, ["alpha", "beta"], k=8))


def test_trigram_full_maintenance_cycle_reclaims_history_and_spares_serving(
    spark, docs, tmp_path
):
    """The substring_search_vacuumed contract as a unit law — the trigram
    rail's retention twin of the bm25/annindex laws above."""
    from airflow_courier_payout_ledger_pipeline_spark.operators.textindex import (
        TGDOCS,
        TRIGRAMS,
        build_trigram_index,
        compact_trigram_index,
        extend_trigram_index,
        substring_search_indexed,
    )

    even = docs.filter(F.col("doc_id") % 2 == 0)
    odd = docs.filter(F.col("doc_id") % 2 == 1)
    lake = Lakehouse(str(tmp_path))
    build_trigram_index(lake, "idx", even)
    extend_trigram_index(lake, "idx", odd)
    pre_tg_dirs = set(lake.versions("idx", TRIGRAMS))
    compact_trigram_index(lake, "idx", spark)
    compacted_v = lake.current_manifest()[f"idx/{TRIGRAMS}"]

    audit = lake.retention_sweep(keep_manifests=1, keep_versions=1)
    assert audit["manifests"], "sweep reclaimed no manifests"
    assert set(audit["versions"].get(f"idx/{TRIGRAMS}", [])) == pre_tg_dirs
    assert audit["versions"].get(f"idx/{TGDOCS}"), "id-set history not reclaimed"
    for v in pre_tg_dirs:
        assert not (tmp_path / "idx" / TRIGRAMS / f"v={v}").exists()
    assert (tmp_path / "idx" / TRIGRAMS / f"v={compacted_v}").exists()

    full = Lakehouse(str(tmp_path / "full"))
    build_trigram_index(full, "idx", docs)
    for needle in ("alpha", "ta de", "zz-none"):
        assert sorted(
            map(tuple, substring_search_indexed(lake, "idx", docs, needle).collect())
        ) == sorted(
            map(tuple, substring_search_indexed(full, "idx", docs, needle).collect())
        ), needle


def test_trigram_extend_crash_window_preserves_old_index(spark, docs, tmp_path):
    """The codes-rail crash law, for the trigram rail: a kill at the manifest
    flip leaves the committed index untouched (searches unchanged), and the
    replay converges to the full index — the SCD0 id set makes the replay
    exact, not approximate."""
    from unittest import mock

    from airflow_courier_payout_ledger_pipeline_spark.operators.textindex import (
        build_trigram_index,
        extend_trigram_index,
        substring_search_indexed,
    )

    even = docs.filter(F.col("doc_id") % 2 == 0)
    odd = docs.filter(F.col("doc_id") % 2 == 1)
    lake = Lakehouse(str(tmp_path / "inc"))
    build_trigram_index(lake, "idx", even)
    before = sorted(
        map(tuple, substring_search_indexed(lake, "idx", docs, "alpha").collect())
    )
    mid_before = lake.current_manifest_id()
    with pytest.raises(RuntimeError, match="kill"), mock.patch.object(
        Lakehouse, "commit_manifest", side_effect=RuntimeError("kill")
    ):
        extend_trigram_index(lake, "idx", odd)
    assert lake.current_manifest_id() == mid_before
    assert sorted(
        map(tuple, substring_search_indexed(lake, "idx", docs, "alpha").collect())
    ) == before
    # replay converges to the full index
    extend_trigram_index(lake, "idx", odd)
    full = Lakehouse(str(tmp_path / "full"))
    build_trigram_index(full, "idx", docs)
    assert sorted(
        map(tuple, substring_search_indexed(lake, "idx", docs, "alpha").collect())
    ) == sorted(
        map(tuple, substring_search_indexed(full, "idx", docs, "alpha").collect())
    )
