"""The r14 ADVICE disk/dict leak, closed in both query modules: superseded
index-lake cache entries (same kind + same source path, older stat key) evict
WITH their mkdtemp roots when the source parquet's bytes change; entries for
other kinds, other paths, and the current stat key are never touched. Driver-
side logic — no SparkSession needed."""

from __future__ import annotations

from pathlib import Path

from airflow_courier_payout_ledger_pipeline_spark import queries_ext_ops as ops
from airflow_courier_payout_ledger_pipeline_spark import (
    queries_ext_similarity as sim,
)


class _FakeLake:
    def __init__(self, root: Path) -> None:
        self.root = root


def _mk(tmp_path: Path, name: str) -> _FakeLake:
    d = tmp_path / name
    d.mkdir()
    (d / "marker").write_text("x")
    return _FakeLake(d)


def test_ops_evicts_superseded_same_kind_same_path_only(tmp_path):
    old = _mk(tmp_path, "old")
    other_kind = _mk(tmp_path, "other_kind")
    other_path = _mk(tmp_path, "other_path")
    current = _mk(tmp_path, "current")
    p = "/data/documents.parquet"
    try:
        ops._BM25_INDEX_LAKES[("bm25_index", (p, 1, 100))] = old
        ops._BM25_INDEX_LAKES[("trigram_index", (p, 1, 100))] = other_kind
        ops._BM25_INDEX_LAKES[("bm25_index", ("/else.parquet", 1, 100))] = other_path
        new_stat = (p, 2, 200)
        ops._BM25_INDEX_LAKES[("bm25_index", new_stat)] = current
        ops._evict_superseded_lakes("bm25_index", new_stat)
        assert ("bm25_index", (p, 1, 100)) not in ops._BM25_INDEX_LAKES
        assert not old.root.exists()  # the mkdtemp root went with the entry
        # same path but different kind, different path, and the live entry
        # are untouched
        assert other_kind.root.exists() and other_path.root.exists()
        assert current.root.exists()
        assert ("trigram_index", (p, 1, 100)) in ops._BM25_INDEX_LAKES
        assert ("bm25_index", new_stat) in ops._BM25_INDEX_LAKES
    finally:
        for k in [
            ("trigram_index", (p, 1, 100)),
            ("bm25_index", ("/else.parquet", 1, 100)),
            ("bm25_index", (p, 2, 200)),
        ]:
            ops._BM25_INDEX_LAKES.pop(k, None)


def test_eviction_purges_annindex_driver_caches(tmp_path):
    """Evicting a cached index LAKE must also purge annindex's manifest-keyed
    driver caches under that root (r15 ADVICE: dead centroid/codebook lists
    accumulated across testdata rewrites); entries for other roots survive."""
    from airflow_courier_payout_ledger_pipeline_spark.operators import annindex

    lake = _mk(tmp_path, "ann_evict")
    p = "/data/embeddings.parquet"
    root_key = str(lake.root)
    annindex._ARTIFACT_CACHE[(root_key, "idx", 0, 123)] = ([], [])
    annindex._VALIDATED_CODES[(root_key, "idx", 0, 123, (0,), "vec_id")] = True
    other = ("/somewhere/else", "idx", 0, 1)
    annindex._ARTIFACT_CACHE[other] = ([], [])
    try:
        sim._TRAINED_ARTIFACTS[("ann_index", (p, 1, 100))] = lake
        sim._evict_superseded_artifacts("ann_index", (p, 2, 200))
        assert all(k[0] != root_key for k in annindex._ARTIFACT_CACHE)
        assert all(k[0] != root_key for k in annindex._VALIDATED_CODES)
        assert other in annindex._ARTIFACT_CACHE  # other roots untouched
        assert not lake.root.exists()
    finally:
        annindex._ARTIFACT_CACHE.pop(other, None)
        sim._TRAINED_ARTIFACTS.pop(("ann_index", (p, 1, 100)), None)


def test_similarity_evicts_lakes_and_plain_artifacts(tmp_path):
    lake = _mk(tmp_path, "ann_old")
    p = "/data/embeddings.parquet"
    try:
        sim._TRAINED_ARTIFACTS[("ann_index", (p, 1, 100))] = lake
        # driver-side artifacts (no .root) just fall out of the dict
        sim._TRAINED_ARTIFACTS[("centroids", (p, 1, 100))] = [(0, [1.0])]
        new_stat = (p, 2, 200)
        sim._evict_superseded_artifacts("ann_index", new_stat)
        sim._evict_superseded_artifacts("centroids", new_stat)
        assert ("ann_index", (p, 1, 100)) not in sim._TRAINED_ARTIFACTS
        assert ("centroids", (p, 1, 100)) not in sim._TRAINED_ARTIFACTS
        assert not lake.root.exists()
    finally:
        sim._TRAINED_ARTIFACTS.pop(("ann_index", (p, 1, 100)), None)
        sim._TRAINED_ARTIFACTS.pop(("centroids", (p, 1, 100)), None)
