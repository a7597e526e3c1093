"""Multimodal-column extension queries over the `documents` table.

Not reference-derived (the reference is text/relational only) — the
image/audio/video pipeline shapes BASELINE.json's north star calls for,
backed by operators/multimodal.py. Payloads are deterministic fakes
(UTF-8 bytes of the text), so the DuckDB oracles reproduce every derived
value with `encode`/`octet_length` arithmetic — proving the Arrow/
mapInPandas plumbing end-to-end, not just "it ran".

The feature-extraction query hash-checks exact integer bin counts (the
normalized float32 vectors de-normalize losslessly); determinism across
partitionings is additionally covered by tests/test_multimodal.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from world_cup_duckdb_spark.operators.multimodal import (
    DIM_MOD,
    FRAME_CHUNK,
    FRAME_MOD,
    attach_payload,
    decode_media,
    extract_features,
    resize_images,
    sample_frames,
)
from world_cup_duckdb_spark.queries import register
from world_cup_duckdb_spark.sources.catalog import load_tables

_MEDIA_CASE = (
    "CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' "
    "ELSE 'video' END"
)


@register(
    "ext_mm_metadata",
    oracle=f"""
    SELECT doc_id, {_MEDIA_CASE} AS media_type,
           CAST(octet_length(encode(text)) AS INT) AS n_bytes
    FROM documents
    """,
)
def ext_mm_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Opaque binary payload + typed metadata struct (JVM-side attach;
    metadata queries never touch the blob column)."""
    mm = attach_payload(load_tables(spark, sf_dir)["documents"])
    return mm.select("doc_id", "meta.media_type", "meta.n_bytes")


@register(
    "ext_mm_decode",
    oracle=f"""
    WITH m AS (
      SELECT doc_id, {_MEDIA_CASE} AS media_type,
             octet_length(encode(text)) AS n_bytes
      FROM documents
    )
    SELECT doc_id, media_type,
           CAST(16 + n_bytes % {DIM_MOD} AS INT) AS width,
           CAST(16 + (n_bytes * 7) % {DIM_MOD} AS INT) AS height,
           CAST(CASE WHEN media_type = 'audio' THEN 1 ELSE 3 END AS INT)
             AS channels
    FROM m
    """,
)
def ext_mm_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode stage: payload → (width, height, channels) through the
    Arrow-batched mapInPandas fake codec (operators/multimodal.py)."""
    return decode_media(attach_payload(load_tables(spark, sf_dir)["documents"]))


@register(
    "ext_mm_features",
    oracle="""
    WITH d AS (
      SELECT doc_id,
             list_transform(string_split(text, ''), c -> ord(c) % 8) AS bins
      FROM documents
    )
    SELECT doc_id,
           array_to_string(
             list_transform(generate_series(0, 7),
                 b -> CAST(length(list_filter(bins, x -> x = b)) AS BIGINT)),
             ',') AS counts
    FROM d
    """,
)
def ext_mm_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature extraction: 8-bin byte histogram per payload (vectorized
    numpy in mapInPandas, operators/multimodal.py:194).

    Oracle strategy: the mapInPandas stage emits L1-normalized float32
    vectors — not portably hashable across engines — so the registered
    query de-normalizes back to exact integer bin COUNTS (feature ×
    n_bytes, rounded; exact because counts ≤ payload size are well inside
    float32's 2^24 integer range) and the DuckDB oracle recomputes the
    same counts from the text bytes (fixtures are ASCII, so codepoint ==
    byte). The float path itself stays exercised end-to-end; determinism
    across partitionings is additionally pytest-verified.

    Output shape: the 8-bin count vector is emitted as its canonical CSV
    string — a scalar cell the correctness harness can sort and hash
    (driver canonicalization rejects array cells: CORRECTNESS_r03). The
    array form is available via mm_feature_counts_vector for callers."""
    return mm_feature_counts_vector(spark, sf_dir).select(
        "doc_id",
        F.array_join(
            F.transform("counts", lambda x: x.cast("string")), ","
        ).alias("counts"),
    )


def mm_feature_counts_vector(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array-typed twin of ext_mm_features: (doc_id, counts array<bigint>)."""
    mm = attach_payload(load_tables(spark, sf_dir)["documents"])
    feats = extract_features(mm)
    sized = feats.join(mm.select("doc_id", "meta.n_bytes"), "doc_id")
    return sized.select(
        "doc_id",
        F.transform(
            "features",
            lambda x: F.round(x.cast("double") * F.col("n_bytes"))
            .cast("bigint"),
        ).alias("counts"),
    )


@register(
    "ext_mm_resize",
    oracle="""
    SELECT doc_id, CAST(64 AS INT) AS width, CAST(64 AS INT) AS height,
           CAST(64 * 64 * 3 AS INT) AS out_bytes
    FROM documents WHERE doc_id % 3 = 0
    """,
)
def ext_mm_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize stage: binary→binary rewrite to a fixed 64×64×3 buffer;
    the query projects the rewritten sizes (blob equality itself is not
    SQL-expressible; byte-content checks live in tests)."""
    mm = attach_payload(load_tables(spark, sf_dir)["documents"])
    out = resize_images(mm, 64, 64)
    return out.select(
        "doc_id",
        "width",
        "height",
        F.length("payload").cast("int").alias("out_bytes"),
    )


@register(
    "ext_mm_frames",
    oracle=f"""
    WITH v AS (
      SELECT doc_id, octet_length(encode(text)) AS n_bytes
      FROM documents WHERE doc_id % 3 = 2
    ), fan AS (
      SELECT doc_id, n_bytes,
             unnest(generate_series(0, n_bytes % {FRAME_MOD})) AS frame_idx
      FROM v
    )
    SELECT doc_id, CAST(frame_idx AS INT) AS frame_idx,
           CAST(GREATEST(0, LEAST({FRAME_CHUNK},
                n_bytes - frame_idx * {FRAME_CHUNK})) AS INT) AS frame_bytes
    FROM fan
    """,
)
def ext_mm_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling: 1→N row fan-out per video payload inside
    mapInPandas (batch grows; schema fixed)."""
    mm = attach_payload(load_tables(spark, sf_dir)["documents"])
    return sample_frames(mm).select("doc_id", "frame_idx", "frame_bytes")


@register(
    "ext_mm_decode_real",
    oracle="""
    SELECT doc_id,
           CAST(16 + n_chars % 31 AS INT) AS width,
           CAST(16 + (n_chars * 7) % 31 AS INT) AS height,
           CAST(3 AS INT) AS channels
    FROM documents WHERE doc_id % 50 = 0
    """,
)
def ext_mm_decode_real(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image decode end-to-end: each sampled document becomes a
    genuine binary PPM (P6) image (operators/multimodal.py:encode_ppm —
    header + raw RGB, dims derived from n_chars), and
    `decode_image_real` parses width/height/channels back FROM THE BYTES
    inside an Arrow mapInPandas batch. The oracle recomputes the expected
    dims from n_chars — a hash match proves the encode→decode round trip
    through a real image format, not a metadata echo. The 1-in-50 sample
    bounds payload volume; the map is narrow (no shuffle), so the path
    scales with input splits like every other multimodal stage."""
    from world_cup_duckdb_spark.operators.multimodal import (
        decode_media_real,
        encode_ppm,
    )

    docs = (
        load_tables(spark, sf_dir)["documents"]
        .filter(F.col("doc_id") % 50 == 0)
        .select("doc_id", "text", "n_chars")
    )

    def encode_batches(it):
        import pandas as pd

        for pdf in it:
            payloads = [
                encode_ppm(
                    16 + int(n) % 31, 16 + (int(n) * 7) % 31, t.encode("utf-8")
                )
                for n, t in zip(pdf["n_chars"], pdf["text"])
            ]
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    ppm = docs.mapInPandas(encode_batches, "doc_id bigint, payload binary")
    return decode_media_real(ppm)


@register(
    "ext_mm_audio_real",
    oracle="""
    WITH d AS (
      SELECT doc_id, 64 + doc_id % 64 AS n
      FROM documents WHERE doc_id % 50 = 0
    ),
    s AS (
      SELECT doc_id, n, unnest(range(0, n)) AS i
      FROM d
    ),
    v AS (
      SELECT doc_id, n, i,
             ((doc_id * 31 + i * 97) % 2048) - 1024 AS v
      FROM s
    ),
    lagged AS (
      SELECT doc_id, n, v,
             LAG(v) OVER (PARTITION BY doc_id ORDER BY i) AS prev
      FROM v
    )
    SELECT doc_id,
           CAST(8000 AS INT) AS sample_rate,
           CAST(MAX(n) AS BIGINT) AS n_samples,
           CAST(1 AS INT) AS n_channels,
           CAST(COALESCE(SUM(CASE WHEN prev IS NOT NULL
                                   AND (v >= 0) <> (prev >= 0)
                              THEN 1 END), 0) AS BIGINT) AS zero_crossings,
           CAST(SUM(ABS(v)) AS BIGINT) AS sum_abs
    FROM lagged GROUP BY doc_id
    """,
)
def ext_mm_audio_real(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio decode end-to-end — the WAV twin of
    ``ext_mm_decode_real``: each sampled document becomes a GENUINE
    RIFF/WAVE PCM16 file (operators/multimodal.py:encode_wav_pcm16, stdlib
    wave module — no codec stub), samples generated by a deterministic
    integer formula; ``decode_audio_batches`` then parses the header
    AND the PCM frames back FROM THE BYTES inside an Arrow mapInPandas
    batch and computes integer features over the decoded samples
    (zero-crossing count, Σ|s|). The oracle recomputes the features
    from the same generative formula directly — a hash match therefore
    proves the encode→decode round trip through a real audio container
    is sample-exact, not a metadata echo.

    Scale: 1-in-50 sample bounds payload volume; both maps are narrow
    (no shuffle) and scale with input splits; per-row payload is ≤128
    samples ≈ 300 bytes. Swapping soundfile/librosa in for compressed
    codecs changes only decode_wav_samples's body (documented seam)."""
    from world_cup_duckdb_spark.operators.multimodal import (
        decode_audio_batches,
        encode_wav_pcm16,
    )

    docs = (
        load_tables(spark, sf_dir)["documents"]
        .filter(F.col("doc_id") % 50 == 0)
        .select("doc_id")
    )

    def encode_batches(it):
        import pandas as pd

        for pdf in it:
            payloads = []
            for did in pdf["doc_id"]:
                did = int(did)
                n = 64 + did % 64
                samples = [
                    ((did * 31 + i * 97) % 2048) - 1024 for i in range(n)
                ]
                payloads.append(encode_wav_pcm16(8000, samples))
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "payload": payloads}
            )

    wav = docs.mapInPandas(encode_batches, "doc_id bigint, payload binary")
    return decode_audio_batches(wav)


@register(
    "ext_mm_video_real",
    oracle="""
    WITH d AS (SELECT doc_id FROM documents WHERE doc_id % 50 = 0),
    f AS (
      SELECT doc_id, unnest(range(0, 1 + doc_id % 4)) AS frame_idx
      FROM d
    ),
    dims AS (
      SELECT doc_id, frame_idx,
             8 + doc_id % 5 AS w, 8 + frame_idx % 3 AS h
      FROM f
    ),
    px AS (
      SELECT doc_id, frame_idx, w, h,
             unnest(range(0, w * h * 3)) AS j
      FROM dims
    )
    SELECT doc_id, CAST(frame_idx AS INT) AS frame_idx,
           CAST(w AS INT) AS width, CAST(h AS INT) AS height,
           CAST(SUM((doc_id + frame_idx * 13 + j * 7) % 256) AS BIGINT)
             AS pix_sum
    FROM px
    GROUP BY doc_id, frame_idx, w, h
    """,
)
def ext_mm_video_real(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL multi-frame (video-shaped) decode — the 1→N upgrade of
    ``ext_mm_frames``'s synthetic fan-out: each sampled document becomes
    a GENUINE concatenated-P6 stream (1 + doc_id % 4 frames, per-frame
    dims and pixel bytes from deterministic integer formulas), and
    ``decode_video_batches`` parses the stream frame by frame FROM THE
    BYTES — header dims, body length, next-frame offset — emitting one
    row per decoded frame with an exact integer pixel checksum. The
    oracle recomputes dims and checksums from the generative formulas;
    the hash match proves the frame segmentation and every decoded body
    byte, not just metadata. Compressed video is the documented ffmpeg
    seam (same ValueError contract as the image/audio paths).

    Scale: 1-in-50 sample; narrow maps (no shuffle); the 1→N fan-out
    grows the OUTPUT, not any shuffle — the batch-growing shape
    ext_mm_frames already pins."""
    from world_cup_duckdb_spark.operators.multimodal import (
        decode_video_batches,
        encode_ppm,
    )

    docs = (
        load_tables(spark, sf_dir)["documents"]
        .filter(F.col("doc_id") % 50 == 0)
        .select("doc_id")
    )

    def encode_batches(it):
        import pandas as pd

        for pdf in it:
            payloads = []
            for did in pdf["doc_id"]:
                did = int(did)
                stream = b""
                for f in range(1 + did % 4):
                    w, h = 8 + did % 5, 8 + f % 3
                    body = bytes(
                        (did + f * 13 + j * 7) % 256
                        for j in range(w * h * 3)
                    )
                    stream += encode_ppm(w, h, body)
                payloads.append(stream)
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "payload": payloads}
            )

    stream = docs.mapInPandas(encode_batches, "doc_id bigint, payload binary")
    return decode_video_batches(stream)
