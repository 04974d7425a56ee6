"""Multimodal (binary-column) pipelines: PNG decode/features, content dedup, video frame sampling, image resize, audio resample - Arrow-batched mapInPandas codecs.

Split out of the former monolithic queries_ext.py (round 10) so the
changed-file -> re-adjudicate rule schedules only this domain's queries.
Registration side effects: importing this module registers its queries.
"""

from __future__ import annotations
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from airflow_courier_payout_ledger_pipeline_spark.plans.tpch_adapter import load_tables
from airflow_courier_payout_ledger_pipeline_spark.registry import register


# =====================================================================================
# Multimodal: binary payload → decoded scalar features (Arrow-batched mapInPandas)
# =====================================================================================

# The FIMG payload is a pure function of (media_id, w, h): header + pixel bytes
# (media_id*31 + i*7) % 251 — so the decoded scalar features ARE SQL-expressible
# and the mapInPandas decode path gets a real hash-checked oracle. The pooled
# feature vector (array<float>) stays a library-level output (driver's pandas
# canonicalizer can't hash arrays).
MULTIMODAL_ORACLE = """
WITH meta AS (
    SELECT doc_id AS media_id,
           ((doc_id % 16) + 4)::INT AS width,
           ((doc_id % 8) + 4)::INT AS height
    FROM documents
),
px AS (
    SELECT media_id, width, height,
           unnest(generate_series(0, width * height * 3 - 1)) AS i
    FROM meta
)
SELECT media_id, width, height, 3::INT AS channels,
       (width * height * 3)::INT AS n_bytes,
       SUM((media_id * 31 + i * 7) % 251)::DOUBLE / COUNT(*)::DOUBLE AS mean_byte
FROM px GROUP BY 1, 2, 3
"""


@register("multimodal_features", MULTIMODAL_ORACLE)
def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary media column → decoded scalar features via Arrow-batched mapInPandas.
    Payloads are deterministic fake images derived from the documents table (the
    container ships no codecs — the Spark plumbing is the deliverable); both the
    payload synthesis and the decode run batch-wise, no row-at-a-time UDF."""
    from airflow_courier_payout_ledger_pipeline_spark.operators.multimodal import (
        extract_image_features,
        synthesize_payloads,
    )

    docs = load_tables(spark, sf_dir, "documents")["documents"]
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image/fimg").alias("media_type"),
        ((F.col("doc_id") % 16) + 4).cast("int").alias("declared_w"),
        ((F.col("doc_id") % 8) + 4).cast("int").alias("declared_h"),
    )
    return extract_image_features(synthesize_payloads(media)).drop("feature")


@register("image_png_features", MULTIMODAL_ORACLE)
def q_image_png_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SAME decoded-feature contract as multimodal_features, but through a
    REAL codec end-to-end: payloads are genuine PNGs (stdlib-zlib encoder with
    per-row cycling None/Sub/Up/Average/Paeth filters) and the decode is the
    stdlib PNG path of the chain (operators/multimodal._decode_png) — chunk
    walk, IDAT inflate, full scanline defilter. Pixels keep the FIMG
    closed form, so the identical SQL oracle hash-checks real-codec output."""
    from airflow_courier_payout_ledger_pipeline_spark.operators.multimodal import (
        extract_image_features,
        synthesize_png_payloads,
    )

    docs = load_tables(spark, sf_dir, "documents")["documents"]
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image/png").alias("media_type"),
        ((F.col("doc_id") % 16) + 4).cast("int").alias("declared_w"),
        ((F.col("doc_id") % 8) + 4).cast("int").alias("declared_h"),
    )
    return extract_image_features(synthesize_png_payloads(media)).drop("feature")


# Planted duplicates: content id = doc_id % 50, so ~10 docs share pixel-
# identical images at sf0.01 — but their PNG BYTES differ (the encoder cycles
# row filters per payload), which is the point: payload-hash dedup misses
# them; decoding and grouping on content stats finds them. The oracle replays
# the closed-form pixels per content id.
IMAGE_DEDUP_ORACLE = """
WITH meta AS (
    SELECT doc_id % 50 AS cid,
           ((doc_id % 50) % 16 + 4)::INT AS width,
           ((doc_id % 50) % 8 + 4)::INT AS height
    FROM documents
),
m AS (SELECT DISTINCT cid, width, height FROM meta),
pm AS (
    SELECT cid, width, height,
           SUM((cid * 31 + i * 7) % 251)::DOUBLE / COUNT(*)::DOUBLE AS mean_byte
    FROM (SELECT cid, width, height,
                 unnest(generate_series(0, width * height * 3 - 1)) AS i
          FROM m) t
    GROUP BY 1, 2, 3
),
cnt AS (SELECT cid, count(*)::BIGINT AS n_copies FROM meta GROUP BY 1),
g AS (
    SELECT width, height, mean_byte,
           SUM(n_copies)::BIGINT AS n_copies, MIN(cid)::BIGINT AS rep_id
    FROM pm JOIN cnt USING (cid)
    GROUP BY 1, 2, 3
)
SELECT rep_id, width, height, mean_byte, n_copies FROM g WHERE n_copies >= 2
"""


@register("image_content_dedup", IMAGE_DEDUP_ORACLE)
def q_image_content_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decoded-content image dedup: payloads whose PNG BYTES all differ (the
    encoder cycles row filters) but whose PIXELS are identical are grouped by
    decoded content stats after a real stdlib-PNG decode — the content-dedup
    pattern byte-level hashing cannot do. Per duplicate group (≥2 copies):
    representative id, dims, exact mean byte, copy count. Arrow-batched
    decode, one content-grain shuffle; oracle replays the closed-form pixels
    per planted content id (doc_id % 50)."""
    from airflow_courier_payout_ledger_pipeline_spark.operators.multimodal import (
        extract_image_features,
        synthesize_png_payloads,
    )

    docs = load_tables(spark, sf_dir, "documents")["documents"]
    media = docs.select(
        F.col("doc_id").cast("bigint").alias("media_id"),  # unique owner
        (F.col("doc_id") % 50).cast("bigint").alias("content_id"),
        F.lit("image/png").alias("media_type"),
        ((F.col("doc_id") % 50) % 16 + 4).cast("int").alias("declared_w"),
        ((F.col("doc_id") % 50) % 8 + 4).cast("int").alias("declared_h"),
    )
    feats = extract_image_features(synthesize_png_payloads(media))
    return (
        feats.groupBy("width", "height", "mean_byte")
        .agg(
            F.count("*").cast("bigint").alias("n_copies"),
            F.min(F.col("media_id") % 50).cast("bigint").alias("rep_id"),
        )
        .filter(F.col("n_copies") >= 2)
        .select("rep_id", "width", "height", "mean_byte", "n_copies")
    )


# The FVID payload's frame f is the constant byte (media_id*31 + f*7) % 256, so
# each sampled frame's exact mean is closed-form — the full demux path
# (synthesize binary container → mapInPandas frame sampler) hash-checks in SQL.
VIDEO_FRAMES_ORACLE = """
WITH fr AS (
    SELECT doc_id AS media_id,
           unnest(generate_series(0, doc_id % 8 + 3, 2)) AS f
    FROM documents
)
SELECT media_id,
       f::INT AS frame_idx,
       8::INT AS frame_w,
       6::INT AS frame_h,
       ((media_id * 31 + f * 7) % 256)::DOUBLE AS frame_mean
FROM fr
"""


@register("video_frame_sample", VIDEO_FRAMES_ORACLE)
def q_video_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame sampling: binary FVID containers (synthesized Arrow-batch-wise
    from the documents table: doc_id % 8 + 4 frames of 8×6 grayscale) demuxed by
    a mapInPandas sampler that emits every 2nd frame's index and exact mean —
    the 1→N-rows-per-payload decode shape a real ffmpeg-backed pipeline needs
    (operators/multimodal.sample_frames)."""
    from airflow_courier_payout_ledger_pipeline_spark.operators.multimodal import (
        sample_frames,
        synthesize_video_payloads,
    )

    docs = load_tables(spark, sf_dir, "documents")["documents"]
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        ((F.col("doc_id") % 8) + 4).cast("int").alias("n_frames"),
        F.lit(8).cast("int").alias("w"),
        F.lit(6).cast("int").alias("h"),
    )
    return sample_frames(synthesize_video_payloads(media), every_k=2)


# --- Image resize (thumbnail/normalize stage) ----------------------------------------

# End-to-end oracle through FOUR codec stages — FIMG decode -> nearest-neighbor
# resize -> PNG encode -> PNG decode -> features — possible because floor-index
# nearest neighbor over the closed-form FIMG pixels is replayable in SQL:
# source index for resized byte t is exact integer arithmetic, and mean_byte is
# an exact int sum / exact division (identical double both engines).
RESIZE_W, RESIZE_H = 8, 6

IMAGE_RESIZE_ORACLE = f"""
WITH meta AS (
    SELECT doc_id AS media_id,
           ((doc_id % 16) + 4)::BIGINT AS w,
           ((doc_id % 8) + 4)::BIGINT AS h
    FROM documents
),
t AS (
    SELECT media_id, w, h,
           unnest(generate_series(0, {RESIZE_W * RESIZE_H * 3} - 1)) AS t
    FROM meta
),
src AS (
    SELECT media_id, w, h, t,
           (((((t // {RESIZE_W * 3}) * h) // {RESIZE_H}) * w
             + ((((t % {RESIZE_W * 3}) // 3) * w) // {RESIZE_W})) * 3
            + (t % 3)) AS i
    FROM t
)
SELECT media_id,
       {RESIZE_W}::INT AS width,
       {RESIZE_H}::INT AS height,
       3::INT AS channels,
       {RESIZE_W * RESIZE_H * 3}::INT AS n_bytes,
       SUM((media_id * 31 + i * 7) % 251)::DOUBLE / COUNT(*)::DOUBLE AS mean_byte
FROM src GROUP BY 1
"""


@register("image_resize_features", IMAGE_RESIZE_ORACLE)
def q_image_resize_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Thumbnail/normalize stage of a multimodal pipeline: binary images are
    decoded, nearest-neighbor-resized to a uniform {RESIZE_W}x{RESIZE_H} grid
    with exact integer floor indexing, re-encoded as REAL PNG, and the
    resulting PNG corpus is decoded again for features — four codec stages,
    all Arrow-batched mapInPandas, hash-checked end-to-end against a SQL
    replay of the closed-form pixels (operators/multimodal.resize_images +
    extract_image_features; the PNG round-trip exercises every defilter
    branch via the cycling encoder)."""
    from airflow_courier_payout_ledger_pipeline_spark.operators.multimodal import (
        RESIZED_SCHEMA,  # noqa: F401  (schema contract exercised here)
        extract_image_features,
        resize_images,
        synthesize_payloads,
    )

    docs = load_tables(spark, sf_dir, "documents")["documents"]
    media = synthesize_payloads(
        docs.select(
            F.col("doc_id").alias("media_id"),
            F.lit("image/fimg").alias("media_type"),
            ((F.col("doc_id") % 16) + 4).cast("int").alias("declared_w"),
            ((F.col("doc_id") % 8) + 4).cast("int").alias("declared_h"),
        )
    )
    resized = resize_images(media, RESIZE_W, RESIZE_H)
    return extract_image_features(resized).select(
        "media_id", "width", "height", "channels", "n_bytes", "mean_byte"
    )


# --- Audio resample (rate-normalize stage) -------------------------------------------

# 8 kHz -> 6 kHz (a non-divisor downsample: output j reads source (4j) DIV 3,
# length (3n) DIV 4). End-to-end through FAUD decode -> nearest-sample
# resample -> REAL WAV encode -> stdlib wave decode -> features, replayable in
# SQL because every index is exact integer arithmetic over the closed-form
# samples. n >= 100 in the meta, so the resampled length is always > 0.
AUDIO_RESAMPLE_RATE = 6000

AUDIO_RESAMPLE_ORACLE = f"""
WITH meta AS (
    SELECT doc_id AS media_id, (doc_id % 400 + 100)::BIGINT AS n FROM documents
),
m2 AS (SELECT media_id, n, (n * {AUDIO_RESAMPLE_RATE}) // 8000 AS m FROM meta),
s AS (SELECT media_id, m, unnest(generate_series(0, m - 1)) AS j FROM m2),
v AS (
    SELECT media_id, m, j,
           ((media_id * 37 + ((j * 8000) // {AUDIO_RESAMPLE_RATE}) * 11) % 201 - 100) AS sj,
           CASE WHEN j < m - 1
                THEN ((media_id * 37 + (((j + 1) * 8000) // {AUDIO_RESAMPLE_RATE}) * 11) % 201 - 100)
           END AS sk
    FROM s
),
agg AS (
    SELECT media_id, m,
           SUM(sj)::DOUBLE / COUNT(*)::DOUBLE AS mean_amp,
           SUM(CASE WHEN sj * sk < 0 THEN 1 ELSE 0 END)::BIGINT AS zero_crossings
    FROM v GROUP BY 1, 2
)
SELECT media_id, {AUDIO_RESAMPLE_RATE}::INT AS sample_rate, m::INT AS n_samples,
       m::DOUBLE / {AUDIO_RESAMPLE_RATE} AS duration_s, mean_amp, zero_crossings
FROM agg
"""


@register("audio_resample_features", AUDIO_RESAMPLE_ORACLE)
def q_audio_resample_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rate-normalize stage of an audio pipeline: FAUD clips (8 kHz) are
    decoded, nearest-sample-resampled to {AUDIO_RESAMPLE_RATE} Hz with exact
    integer floor indexing, re-encoded as REAL RIFF/WAV, and the WAV corpus is
    decoded again (stdlib ``wave``) for features — the audio twin of
    `image_resize_features`, hash-checked end-to-end against a SQL replay
    (operators/multimodal.resample_audio + extract_audio_features)."""
    from airflow_courier_payout_ledger_pipeline_spark.operators.multimodal import (
        extract_audio_features,
        resample_audio,
        synthesize_audio_payloads,
    )

    docs = load_tables(spark, sf_dir, "documents")["documents"]
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit(8000).cast("int").alias("sample_rate"),
        (F.col("doc_id") % 400 + 100).cast("int").alias("n_samples"),
    )
    resampled = resample_audio(synthesize_audio_payloads(media), AUDIO_RESAMPLE_RATE)
    return extract_audio_features(resampled)


# --- Perceptual-hash (dHash) near-duplicate images -----------------------------------

# 8x8 grayscale grid -> 7 horizontal compare bits x 8 rows = 56-bit hash
# (bit 63 would need the int64 sign bit; see operators/multimodal.dhash_images).
# Candidates via 4 x 14-bit pigeonhole bands, verified at Hamming <= DHASH_T
# (= 3). The pigeonhole guarantee — any pair within Hamming d shares at least
# one identical band when d < number of bands — holds exactly up to d = 3
# with 4 bands; raising DHASH_T past 3 would need more bands for full recall.
DHASH_T, DHASH_BANDS, DHASH_BAND_BITS = 3, 4, 14

DHASH_NEAR_DUP_ORACLE = f"""
WITH meta AS (
    SELECT doc_id AS media_id, (doc_id // 2)::BIGINT AS seed,
           (16 + (doc_id % 2) * 16)::BIGINT AS w,
           (16 + (doc_id % 2) * 16)::BIGINT AS h
    FROM documents
),
grid AS (
    SELECT media_id, seed, w, h, tx.x AS tx, ty.y AS ty,
           ((((tx.x * w) // 8) * 32) // w) AS vx,
           ((((ty.y * h) // 8) * 32) // h) AS vy
    FROM meta,
         (SELECT unnest(generate_series(0, 7)) AS x) tx,
         (SELECT unnest(generate_series(0, 7)) AS y) ty
),
blk AS (
    SELECT media_id, tx, ty,
           (seed * 131 + (vy // 4) * 8 + (vx // 4)) AS base
    FROM grid
),
g AS (
    SELECT media_id, tx, ty,
           (((base * base * 31) % 251)
          + ((base * base * 31 + 11) % 251)
          + ((base * base * 31 + 22) % 251)) // 3 AS gray
    FROM blk
),
bits AS (
    SELECT a.media_id, a.ty, a.tx,
           CASE WHEN a.gray > b.gray THEN 1::BIGINT ELSE 0::BIGINT END AS bit
    FROM g a JOIN g b ON a.media_id = b.media_id AND a.ty = b.ty AND b.tx = a.tx + 1
    WHERE a.tx < 7
),
hashes AS (
    SELECT media_id, SUM(bit << (ty * 7 + tx))::BIGINT AS dhash FROM bits GROUP BY 1
),
bands AS (
    SELECT media_id, dhash, k,
           (dhash >> (k * {DHASH_BAND_BITS})) & {(1 << DHASH_BAND_BITS) - 1} AS bv
    FROM hashes, (SELECT unnest(generate_series(0, {DHASH_BANDS - 1})) AS k)
),
cand AS (
    SELECT DISTINCT a.media_id AS id_a, b.media_id AS id_b,
           a.dhash AS ha, b.dhash AS hb
    FROM bands a JOIN bands b ON a.k = b.k AND a.bv = b.bv
                             AND a.media_id < b.media_id
)
SELECT id_a, id_b, bit_count(xor(ha, hb))::INT AS hamming
FROM cand WHERE bit_count(xor(ha, hb)) <= {DHASH_T}
"""


@register("image_dhash_near_dup", DHASH_NEAR_DUP_ORACLE)
def q_image_dhash_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RESOLUTION-INVARIANT image near-dup via perceptual difference hashing:
    the corpus renders each virtual picture (seed = doc_id DIV 2) at TWO
    different sizes, and the pipeline — real PNG-decodable synth ->
    nearest-neighbor resize to the 8x8 hash grid -> integer grayscale ->
    56-bit dHash (``operators/multimodal.dhash_images``) — must land the two
    renders on Hamming-close hashes even though their BYTES share nothing
    (``image_content_dedup``'s exact content hash cannot pair them). Pairing
    is the repo's standard prune-then-verify shape: 4 x 14-bit pigeonhole
    bands generate candidates (one band-keyed exchange, never all-pairs;
    recall is exact for Hamming <= 3 — pairs must share one of the 4 bands),
    ``bit_count(a XOR b) <= 3`` verifies. Every stage is exact integer
    arithmetic over the deterministic decode, so the DuckDB oracle replays
    decode -> resize -> grayscale -> bit-pack -> band-join -> verify
    end-to-end. At 100 TB the hashes are the persisted state (8 bytes/image)
    and nightly increments band-probe it — the visual twin of the MinHash
    band index."""
    from airflow_courier_payout_ledger_pipeline_spark.operators.multimodal import (
        dhash_images,
        resize_images,
        synthesize_virtual_payloads,
    )

    docs = load_tables(spark, sf_dir, "documents")["documents"]
    meta = docs.select(
        F.col("doc_id").alias("media_id"),
        # integer DIV (not floor(double /)): exact for all bigint doc_ids,
        # matching the oracle's doc_id // 2 beyond double's 2^53 range
        F.expr("CAST(doc_id DIV 2 AS BIGINT)").alias("seed"),
        (16 + (F.col("doc_id") % 2) * 16).cast("int").alias("declared_w"),
        (16 + (F.col("doc_id") % 2) * 16).cast("int").alias("declared_h"),
    )
    hashes = dhash_images(
        resize_images(synthesize_virtual_payloads(meta, grid=32), 8, 8)
    )
    bands = hashes.select(
        "media_id",
        "dhash",
        F.explode(F.array(*[F.lit(k) for k in range(DHASH_BANDS)])).alias("k"),
    ).withColumn(
        "bv",
        F.expr(
            f"shiftright(dhash, k * {DHASH_BAND_BITS}) & {(1 << DHASH_BAND_BITS) - 1}"
        ),
    )
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.k") == F.col("b.k"))
            & (F.col("a.bv") == F.col("b.bv"))
            & (F.col("a.media_id") < F.col("b.media_id")),
        )
        .select(
            F.col("a.media_id").alias("id_a"),
            F.col("b.media_id").alias("id_b"),
            F.col("a.dhash").alias("ha"),
            F.col("b.dhash").alias("hb"),
        )
        .distinct()
    )
    ham = F.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))
    return cand.filter(ham <= DHASH_T).select(
        "id_a", "id_b", ham.cast("int").alias("hamming")
    )
