"""Streaming ingestion: watermarked dedup semantics and the foreachBatch SCD1
lakehouse sink (incremental micro-batches converge to the batch result)."""

from __future__ import annotations

from pathlib import Path

import pytest
from pyspark.sql import functions as F

from airflow_courier_payout_ledger_pipeline_spark.sources.lakehouse import Lakehouse
from airflow_courier_payout_ledger_pipeline_spark.streaming.ingest import (
    stream_dedup,
    stream_scd1_sink,
)


def _write_batch(spark, path: Path, rows, schema):
    spark.createDataFrame(rows, schema).coalesce(1).write.mode("append").parquet(str(path))


SCHEMA = "delivery_key string, ts timestamp, payload string"


def test_stream_dedup_drops_resubmissions(spark, tmp_path):
    src = tmp_path / "src"
    _write_batch(
        spark,
        src,
        [
            ("d1", "2024-01-01 10:00:00", "first"),
            ("d1", "2024-01-01 10:05:00", "dup-must-drop"),
            ("d2", "2024-01-01 10:10:00", "ok"),
        ],
        SCHEMA.replace("timestamp", "string"),
    )
    stream = (
        spark.readStream.schema(SCHEMA.replace("timestamp", "string"))
        .parquet(str(src))
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    q = (
        stream_dedup(stream, ["delivery_key"])
        .writeStream.format("memory")
        .queryName("dedup_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {r.delivery_key: r.payload for r in spark.table("dedup_out").collect()}
    assert got == {"d1": "first", "d2": "ok"}


def test_stream_compact_latest_is_batch_split_independent(spark, tmp_path):
    """The CDC compaction sink must converge to the same latest-per-key state no
    matter how the change log is split into micro-batches — newer versions here
    arrive in an EARLIER file than older ones to prove argmax ≠ source-wins."""
    from airflow_courier_payout_ledger_pipeline_spark.streaming.ingest import (
        latest_by_key,
        stream_compact_latest,
    )

    schema = "k string, ver bigint, seq bigint, v string"
    src = tmp_path / "src"
    # file 1 carries the NEWEST version of k1; file 2 an older resend
    _write_batch(spark, src, [("k1", 5, 1, "new"), ("k2", 1, 2, "only")], schema)
    _write_batch(spark, src, [("k1", 3, 3, "stale"), ("k3", 2, 4, "x")], schema)
    _write_batch(spark, src, [("k2", 1, 5, "tie-later-seq")], schema)  # tie on ver

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)  # force one micro-batch per file
        .parquet(str(src))
    )
    lake = Lakehouse(str(tmp_path / "lake"))
    q = stream_compact_latest(
        stream, lake, "dds", "t", ["k"], ["ver", "seq"], str(tmp_path / "ckpt")
    )
    q.awaitTermination()
    got = {
        r.k: (r.ver, r.v)
        for r in lake.read(spark, "dds", "t", stream.schema).collect()
    }
    assert got == {"k1": (5, "new"), "k2": (1, "tie-later-seq"), "k3": (2, "x")}

    # batch equivalence: one-shot latest_by_key over the full log agrees
    full = spark.read.schema(schema).parquet(str(src))
    batch = {
        r.k: (r.ver, r.v)
        for r in latest_by_key(full, ["k"], ["ver", "seq"]).collect()
    }
    assert batch == got


def test_stream_scd1_sink_converges_to_batch_state(spark, tmp_path):
    src = tmp_path / "src"
    lake = Lakehouse(str(tmp_path / "lake"))
    ckpt = str(tmp_path / "ckpt")
    schema = "courier_key string, courier_name string"

    # micro-batch 1: two couriers
    _write_batch(spark, src, [("c1", "Alice"), ("c2", "Bob")], schema)
    q = stream_scd1_sink(
        spark.readStream.schema(schema).parquet(str(src)),
        lake,
        "dds",
        "dm_couriers_stream",
        ["courier_key"],
        ckpt,
    )
    q.awaitTermination()
    from pyspark.sql.types import StructType

    tbl = lambda: {
        r.courier_key: r.courier_name
        for r in spark.read.parquet(lake.path("dds", "dm_couriers_stream")).collect()
    }
    assert tbl() == {"c1": "Alice", "c2": "Bob"}

    # micro-batch 2: rename c1, add c3 — upsert keeps c2, overwrites c1
    _write_batch(spark, src, [("c1", "Alice Cooper"), ("c3", "Cara")], schema)
    q2 = stream_scd1_sink(
        spark.readStream.schema(schema).parquet(str(src)),
        lake,
        "dds",
        "dm_couriers_stream",
        ["courier_key"],
        ckpt,
    )
    q2.awaitTermination()
    assert tbl() == {"c1": "Alice Cooper", "c2": "Bob", "c3": "Cara"}


def test_stream_scd1_sink_partitioned_rewrites_only_touched(spark, tmp_path):
    """foreachBatch + merge_upsert_partitioned: a micro-batch touching one
    partition leaves every other partition's files byte-identical (inodes)."""
    import os

    src = tmp_path / "src"
    lake = Lakehouse(str(tmp_path / "lake"))
    schema = "courier_key string, courier_name string, region int"

    _write_batch(spark, src, [("c1", "Alice", 1), ("c2", "Bob", 2)], schema)
    q = stream_scd1_sink(
        spark.readStream.schema(schema).parquet(str(src)),
        lake, "dds", "dm_p", ["courier_key"], str(tmp_path / "ck1"),
        partition_col="region",
    )
    q.awaitTermination()
    r1 = Path(lake.path("dds", "dm_p")) / "region=1"
    before = {p: os.stat(p).st_ino for p in r1.rglob("*.parquet")}
    assert before

    # same checkpoint: only the NEW file forms micro-batch 2 (region 2 only)
    _write_batch(spark, src, [("c2", "Bobby", 2), ("c3", "Cara", 2)], schema)
    q = stream_scd1_sink(
        spark.readStream.schema(schema).parquet(str(src)),
        lake, "dds", "dm_p", ["courier_key"], str(tmp_path / "ck1"),
        partition_col="region",
    )
    q.awaitTermination()

    from pyspark.sql.types import StructType

    got = {
        r.courier_key: (r.courier_name, r.region)
        for r in lake.read(spark, "dds", "dm_p", StructType.fromDDL(schema)).collect()
    }
    assert got == {"c1": ("Alice", 1), "c2": ("Bobby", 2), "c3": ("Cara", 2)}
    after = {p: os.stat(p).st_ino for p in r1.rglob("*.parquet")}
    assert after == before  # region=1 never rewritten


def test_stream_fold_state_restart_is_exactly_once(spark, tmp_path):
    """Checkpoint restart-safety of the incremental-mart fold: a second
    availableNow run over the SAME checkpoint must process nothing new (no
    double-counting), and new files arriving after a restart fold in exactly
    once."""
    from airflow_courier_payout_ledger_pipeline_spark.streaming.ingest import (
        stream_fold_state,
    )

    src = tmp_path / "src"
    schema = "k string, n int"
    _write_batch(spark, src, [("a", 1), ("b", 2)], schema)
    lake = Lakehouse(str(tmp_path / "lake"))
    ckpt = str(tmp_path / "ckpt")

    def state_fn(batch):
        return batch.groupBy("k").agg(F.sum("n").cast("long").alias("total"))

    def merge_fn(existing, s):
        return (
            existing.unionByName(s)
            .groupBy("k")
            .agg(F.sum("total").cast("long").alias("total"))
        )

    def drain():
        stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(str(src))
        q = stream_fold_state(
            stream, lake, "cdm", "state", state_fn, merge_fn, ckpt, "t_fold"
        )
        q.awaitTermination()

    drain()
    state_schema = "k string, total long"
    from pyspark.sql.types import StructType

    read = lambda: {
        r.k: r.total
        for r in lake.read(spark, "cdm", "state", StructType.fromDDL(state_schema)).collect()
    }
    assert read() == {"a": 1, "b": 2}

    drain()  # restart over the same checkpoint: nothing reprocessed
    assert read() == {"a": 1, "b": 2}

    _write_batch(spark, src, [("a", 10)], schema)
    drain()  # only the new file folds in
    assert read() == {"a": 11, "b": 2}


def test_stream_fold_state_batch_replay_does_not_double_fold(spark, tmp_path):
    """At-least-once replay protection: foreachBatch may re-deliver a batch
    whose state write already committed (crash before the checkpoint commit —
    same checkpoint lineage, batch id restarts). Simulated by deleting the
    checkpoint dir and re-draining the same path: batch 0 is re-delivered
    under the SAME lineage; the _APPLIED_BATCH sidecar (committed atomically
    with the state swap) must make the replayed fold a no-op instead of
    doubling the additive state. A DIFFERENT checkpoint path over the same
    state table must refuse loudly instead of silently swallowing batches."""
    import shutil

    import pytest

    from airflow_courier_payout_ledger_pipeline_spark.streaming.ingest import (
        stream_fold_state,
    )

    src = tmp_path / "src"
    schema = "k string, n int"
    _write_batch(spark, src, [("a", 1), ("b", 2)], schema)
    lake = Lakehouse(str(tmp_path / "lake"))

    def state_fn(batch):
        return batch.groupBy("k").agg(F.sum("n").cast("long").alias("total"))

    def merge_fn(existing, s):
        return (
            existing.unionByName(s)
            .groupBy("k")
            .agg(F.sum("total").cast("long").alias("total"))
        )

    def drain(ckpt):
        stream = spark.readStream.schema(schema).parquet(str(src))
        q = stream_fold_state(
            stream, lake, "cdm", "state2", state_fn, merge_fn, str(ckpt), "t_fold2"
        )
        q.awaitTermination()

    ck = tmp_path / "ck_a"
    drain(ck)
    from pyspark.sql.types import StructType

    read = lambda: {
        r.k: r.total
        for r in lake.read(
            spark, "cdm", "state2", StructType.fromDDL("k string, total long")
        ).collect()
    }
    assert read() == {"a": 1, "b": 2}
    assert lake.read_sidecar("cdm", "state2", "_APPLIED_BATCH") == f"{ck}\n0"

    # replay under the SAME lineage: lost checkpoint dir, same path — batch 0
    # is re-delivered and must be a no-op
    shutil.rmtree(ck)
    drain(ck)
    assert read() == {"a": 1, "b": 2}  # NOT doubled

    # a DIFFERENT lineage over existing state raises instead of silently
    # skipping (its fresh batch ids would be swallowed by the <= guard)
    with pytest.raises(Exception, match="checkpoint"):
        drain(tmp_path / "ck_b")
    assert read() == {"a": 1, "b": 2}  # state untouched by the refused fold


def test_stream_index_sink_maintains_search_and_ann_indexes(spark, tmp_path):
    """Docs stream in across two micro-batch rounds; the trigram index appends
    per batch and a PQ-codes table upserts via the scd1 sink (pq_encode is a
    map-side projection → one code path batch/streaming). After the drain:
    searching with the MAINTAINED index must equal a fresh full-corpus search,
    and the codes table must equal a batch encode."""
    from airflow_courier_payout_ledger_pipeline_spark.operators.search import (
        substring_search,
    )
    from airflow_courier_payout_ledger_pipeline_spark.operators.similarity import (
        pq_codebooks_from_seeds,
        pq_encode,
    )
    from airflow_courier_payout_ledger_pipeline_spark.streaming.ingest import (
        stream_index_sink,
    )

    lake = Lakehouse(str(tmp_path / "lake"))
    src = tmp_path / "docs"
    doc_schema = "doc_id long, text string"
    rows1 = [(1, "alpha beta gamma"), (2, "beta gamma delta")]
    rows2 = [(3, "gamma delta alpha"), (4, "omega")]
    _write_batch(spark, src, rows1, doc_schema)

    def drain(tag):
        stream = spark.readStream.schema(doc_schema).parquet(str(src))
        q = stream_index_sink(
            stream, lake, "idx", "postings",
            checkpoint=str(tmp_path / "ck_idx"), query_name=f"idx_{tag}",
        )
        q.awaitTermination()

    drain("r1")
    _write_batch(spark, src, rows2, doc_schema)
    drain("r2")

    docs = spark.createDataFrame(rows1 + rows2, doc_schema)
    from pyspark.sql.types import StructType
    postings = lake.read(
        spark, "idx", "postings", StructType.fromDDL("doc_id long, tg string")
    )
    maintained = {
        r.doc_id for r in substring_search(docs, "gamma", index=postings).collect()
    }
    fresh = {r.doc_id for r in substring_search(docs, "gamma").collect()}
    assert maintained == fresh == {1, 2, 3}

    # replayed postings (at-least-once) must not corrupt the probe
    lake.append(postings.limit(3), "idx", "postings")
    replayed = lake.read(
        spark, "idx", "postings", StructType.fromDDL("doc_id long, tg string")
    )
    assert {
        r.doc_id for r in substring_search(docs, "gamma", index=replayed).collect()
    } == {1, 2, 3}

    # ANN twin: stream PQ codes through the scd1 sink, converge to batch encode
    emb_schema = "vec_id long, embedding array<float>"
    vecs = [(i, [float((i * 7 + j) % 5) for j in range(4)]) for i in range(8)]
    books = pq_codebooks_from_seeds([(v, list(e)) for v, e in vecs[:2]], m=2)
    esrc = tmp_path / "emb"
    _write_batch(spark, esrc, vecs[:5], emb_schema)
    _write_batch(spark, esrc, vecs[5:], emb_schema)
    estream = spark.readStream.schema(emb_schema).parquet(str(esrc))
    q = stream_scd1_sink(
        pq_encode(estream, books), lake, "idx", "codes", ["vec_id"],
        checkpoint=str(tmp_path / "ck_codes"), query_name="codes_sink",
    )
    q.awaitTermination()
    got = {
        r.vec_id: list(r.pq_codes)
        for r in lake.read(
            spark, "idx", "codes", StructType.fromDDL("vec_id long, pq_codes array<tinyint>")
        ).collect()
    }
    want = {
        r.vec_id: list(r.pq_codes)
        for r in pq_encode(spark.createDataFrame(vecs, emb_schema), books).collect()
    }
    assert got == want


def test_stream_fold_state_maintains_cms_frequency_state(spark, tmp_path):
    """The CMS frequency sketch rides the SAME continuous-maintenance rail as
    the ledger state: fold micro-batches with cms_state/merge_cms_states and
    the streamed state is row-for-row IDENTICAL to a direct batch build over
    the concatenated input (the bucket-exact merge law), so heavy-hitter
    candidates probed from the streamed state equal the batch answer — a
    frequency monitor over an ingest stream with O(batch + 4096 rows) per
    trigger and no history re-read."""
    from pyspark.sql.types import StructType

    from airflow_courier_payout_ledger_pipeline_spark.operators.sketch import (
        cms_estimate,
        cms_state,
        merge_cms_states,
    )
    from airflow_courier_payout_ledger_pipeline_spark.streaming.ingest import (
        stream_fold_state,
    )

    src = tmp_path / "src"
    schema = "term string"
    batch1 = [("alpha",)] * 30 + [("beta",)] * 5
    batch2 = [("alpha",)] * 10 + [("gamma",)] * 40 + [("beta",)] * 1
    _write_batch(spark, src, batch1, schema)
    _write_batch(spark, src, batch2, schema)
    lake = Lakehouse(str(tmp_path / "lake"))

    q = stream_fold_state(
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(str(src)),
        lake,
        "cdm",
        "term_cms",
        lambda b: cms_state(b, "term"),
        merge_cms_states,
        str(tmp_path / "ckpt"),
        "t_cms_fold",
    )
    q.awaitTermination()

    streamed = lake.read(
        spark,
        "cdm",
        "term_cms",
        StructType.fromDDL("seed int, bucket long, cnt long, width int"),
    )
    allrows = spark.createDataFrame(batch1 + batch2, schema)
    direct = cms_state(allrows, "term")
    key = lambda r: (r["seed"], r["bucket"], r["cnt"])  # noqa: E731
    assert sorted(map(key, streamed.collect())) == sorted(map(key, direct.collect()))

    est = {
        r["term"]: r["freq_est"]
        for r in cms_estimate(allrows.distinct(), streamed, "term").collect()
    }
    assert est == {"alpha": 40, "beta": 6, "gamma": 40}
