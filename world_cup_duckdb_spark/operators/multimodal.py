"""Multimodal (image/audio/video) column operators for training-data
pipelines.

Extension surface (not reference-derived — SURVEY.md Phase 5 / BASELINE
north star). Media are opaque ``binary`` payload columns with a typed
metadata struct alongside; decode / feature-extract / resize / frame-sample
run as Arrow-batched ``mapInPandas`` transforms.

Codec boundary: compressed-format libraries (PIL/libav) are NOT in this
container. Uncompressed formats need no library, so the decode seam is
REAL where it can be — :func:`decode_image_real` genuinely parses PPM
(P6) and BMP headers from raw bytes (round-tripped end-to-end by
``ext_mm_decode_real`` against a DuckDB oracle), and raises ValueError
for compressed formats, whose PIL integration point is that exact seam.
The bulk pipeline additionally keeps a deterministic fake decode
(:func:`decode_media`) so every media_type flows without real payloads.
Everything Spark-side — schemas, Arrow batch shapes, UDF signatures,
1→N row fan-out, partitioning behavior — is real and tested
(tests/test_multimodal.py).

Scale design: every transform here is a *narrow* map — no shuffle, no
driver involvement; throughput scales linearly with input splits. Arrow
moves whole columnar batches across the Python boundary (vectorized, not
per-row pickling). Payload columns are large: at 100 TB keep
``spark.sql.files.maxPartitionBytes`` sized so a batch of payloads fits
executor memory, and select the payload column as late as possible so scans
of metadata-only queries never read the blob pages (parquet column
pruning does this for free when the payload lives in its own column).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

if TYPE_CHECKING:  # pandas only inside executors at runtime
    import pandas as pd

#: media_type assignment for the synthetic corpus: deterministic by doc_id.
MEDIA_TYPES = ("image", "audio", "video")

#: fake-codec constants (mirrored exactly by the DuckDB oracles in
#: queries/ext_multimodal.py — keep in sync).
DIM_MOD = 497  # width/height range 16..512
FRAME_CHUNK = 256  # bytes per sampled frame
FRAME_MOD = 4  # 1..4 frames per video


def attach_payload(docs: DataFrame) -> DataFrame:
    """documents → multimodal table: opaque binary payload + typed metadata.

    The payload is the UTF-8 encoding of the text (a deterministic fake
    standing in for real media bytes); metadata is a proper struct column
    ``meta(media_type, n_bytes)`` so downstream operators can prune to
    metadata without touching the blob. All JVM-side expressions.
    """
    payload = F.encode(F.col("text"), "UTF-8")
    media = (
        F.when(F.col("doc_id") % 3 == 0, MEDIA_TYPES[0])
        .when(F.col("doc_id") % 3 == 1, MEDIA_TYPES[1])
        .otherwise(MEDIA_TYPES[2])
    )
    return docs.select(
        "doc_id",
        payload.alias("payload"),
        F.struct(
            media.alias("media_type"),
            F.length(payload).cast("int").alias("n_bytes"),
        ).alias("meta"),
    )


def encode_ppm(width: int, height: int, pixels: bytes) -> bytes:
    """Encode raw RGB bytes as a binary PPM (P6) image — a real,
    standardized uncompressed format, writable with no codec library.
    ``pixels`` is tiled/truncated to exactly width*height*3 bytes."""
    need = width * height * 3
    reps = -(-need // max(len(pixels), 1))
    body = (pixels * reps)[:need]
    return b"P6\n%d %d\n255\n" % (width, height) + body


def decode_image_real(payload: bytes) -> tuple[int, int, int]:
    """REAL image decode for the two standard uncompressed formats a
    container with no codec libraries can still parse honestly:

    - **PPM (P6)**: ASCII header ``P6 <w> <h> <maxval>`` then raw RGB.
    - **BMP (BITMAPINFOHEADER)**: little-endian width/height at byte
      offsets 18/22, bits-per-pixel at 28.

    Returns (width, height, channels) parsed from the actual bytes — not
    derived from metadata. Compressed formats (JPEG/PNG/...) raise
    ``ValueError``: wiring PIL.Image.open at this exact seam is the
    documented integration point, and everything around it (mapInPandas
    batching, schemas, fan-out) is unchanged by that swap.
    """
    # Truncated/garbled payloads must fail with the SAME documented
    # ValueError as unknown formats — a corrupt corpus row raising
    # IndexError/struct.error from deep inside an Arrow batch is the kind
    # of unhandled task failure a 100 TB scan cannot afford to leak.
    if payload[:2] == b"P6":
        try:
            fields: list[bytes] = []
            i = 2
            while len(fields) < 3:
                while i < len(payload) and payload[i : i + 1].isspace():
                    i += 1
                if payload[i : i + 1] == b"#":  # comment line
                    while i < len(payload) and payload[i : i + 1] != b"\n":
                        i += 1
                    continue
                if i >= len(payload):
                    raise ValueError("truncated PPM header")
                j = i
                while j < len(payload) and not payload[j : j + 1].isspace():
                    j += 1
                fields.append(payload[i:j])
                i = j
            width, height = int(fields[0]), int(fields[1])
        except ValueError:
            raise ValueError("corrupt PPM payload: malformed P6 header")
        return width, height, 3
    if payload[:2] == b"BM":
        import struct

        try:
            width = struct.unpack_from("<i", payload, 18)[0]
            height = abs(struct.unpack_from("<i", payload, 22)[0])
            bpp = struct.unpack_from("<H", payload, 28)[0]
        except struct.error:
            raise ValueError("corrupt BMP payload: truncated header")
        return width, height, max(1, bpp // 8)
    raise ValueError(
        "unsupported image format (PPM/BMP decodable here; wire "
        "PIL.Image.open for compressed formats at this seam)"
    )


def _fake_dims(n_bytes: "pd.Series") -> tuple["pd.Series", "pd.Series"]:
    width = 16 + (n_bytes % DIM_MOD)
    height = 16 + ((n_bytes * 7) % DIM_MOD)
    return width, height


DECODE_SCHEMA = (
    "doc_id bigint, media_type string, width int, height int, channels int"
)


def decode_media(mm: DataFrame) -> DataFrame:
    """Decode payloads to (width, height, channels) via mapInPandas.

    Deterministic fake decode (see module docstring): dims are a pure
    function of the byte length, channels of the media type. The batch
    loop measures the *actual* payload bytes (``len(b)``) rather than
    trusting metadata — the plumbing a real codec needs.
    """

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in it:
            # Nullable Int64: a NULL payload (null source text) must
            # yield NULL dims like the oracle's octet_length(NULL), not
            # a TypeError from len(None) killing the whole task.
            n_bytes = pd.Series(
                [len(b) if b is not None else None for b in pdf["payload"]],
                index=pdf.index,
                dtype="Int64",
            )
            width, height = _fake_dims(n_bytes)
            media = pdf["meta"].map(lambda m: m["media_type"])
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": media,
                    "width": width.astype("Int32"),
                    "height": height.astype("Int32"),
                    "channels": media.map(
                        lambda m: 1 if m == "audio" else 3
                    ).astype("int32"),
                }
            )

    return mm.mapInPandas(batches, DECODE_SCHEMA)


FEATURES_SCHEMA = "doc_id bigint, features array<float>"


def extract_features(mm: DataFrame, dim: int = 8) -> DataFrame:
    """Byte-histogram feature vectors (L1-normalized, ``dim`` bins) per
    payload — the feature-extraction stage shape (swap the histogram for a
    real model's forward pass; batch shape and output schema hold).

    numpy does the histogram per Arrow batch — vectorized within each
    payload, no per-byte Python.
    """

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        for pdf in it:
            feats = []
            for b in pdf["payload"]:
                # NULL payload → all-zero histogram (no per-task crash)
                arr = np.frombuffer(b if b is not None else b"", dtype=np.uint8)
                hist = np.bincount(arr % dim, minlength=dim).astype("float32")
                total = hist.sum()
                feats.append(hist / total if total else hist)
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "features": feats})

    return mm.mapInPandas(batches, FEATURES_SCHEMA)


RESIZE_SCHEMA = "doc_id bigint, payload binary, width int, height int"


def resize_images(mm: DataFrame, width: int = 64, height: int = 64) -> DataFrame:
    """Fake resize: tile/truncate the payload to exactly width*height*3
    bytes (binary→binary transform with updated metadata — the in-place
    media-rewrite shape). Images only; narrow map, no shuffle."""

    target = width * height * 3

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        for pdf in it:
            mask = pdf["meta"].map(lambda m: m["media_type"] == "image")
            pdf = pdf[mask]
            out = []
            for b in pdf["payload"]:
                arr = np.frombuffer(b if b is not None else b"", dtype=np.uint8)
                if len(arr) == 0:
                    # np.tile of an empty array stays empty for any reps:
                    # an empty/NULL source must still produce the full
                    # target-size buffer (zeros), as the oracle pins.
                    out.append(bytes(target))
                    continue
                reps = -(-target // len(arr))
                out.append(np.tile(arr, reps)[:target].tobytes())
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": out,
                    "width": np.full(len(pdf), width, dtype="int32"),
                    "height": np.full(len(pdf), height, dtype="int32"),
                }
            )

    return mm.mapInPandas(batches, RESIZE_SCHEMA)


FRAMES_SCHEMA = "doc_id bigint, frame_idx int, frame_bytes int, frame binary"


def sample_frames(mm: DataFrame) -> DataFrame:
    """Frame sampling for video payloads: one output row per sampled frame
    (1→N fan-out inside mapInPandas — the batch may grow). Frame count is
    1 + n_bytes % FRAME_MOD; frame i is the payload's i-th FRAME_CHUNK
    slice (may be empty past EOF, mirroring short final frames)."""

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in it:
            rows: list[tuple[int, int, int, bytes]] = []
            for doc_id, b, meta in zip(
                pdf["doc_id"], pdf["payload"], pdf["meta"]
            ):
                if meta["media_type"] != "video":
                    continue
                if b is None:  # NULL payload: nothing to sample
                    continue
                n = len(b)
                for i in range(1 + n % FRAME_MOD):
                    chunk = b[i * FRAME_CHUNK : (i + 1) * FRAME_CHUNK]
                    rows.append((doc_id, i, len(chunk), chunk))
            yield pd.DataFrame(
                rows, columns=["doc_id", "frame_idx", "frame_bytes", "frame"]
            ).astype({"frame_idx": "int32", "frame_bytes": "int32"})

    return mm.mapInPandas(batches, FRAMES_SCHEMA)


DECODE_REAL_SCHEMA = "doc_id bigint, width int, height int, channels int"


def decode_media_real(mm_ppm: DataFrame) -> DataFrame:
    """Decode REAL PPM payloads via mapInPandas using
    :func:`decode_image_real` — the genuine parse-the-bytes path (header
    fields, not metadata, produce the dims). Input needs (doc_id,
    payload) where payload is P6 bytes (see :func:`encode_ppm`)."""

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in it:
            decoded = [decode_image_real(bytes(b)) for b in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": pd.Series(
                        [d[0] for d in decoded], dtype="int32", index=pdf.index
                    ),
                    "height": pd.Series(
                        [d[1] for d in decoded], dtype="int32", index=pdf.index
                    ),
                    "channels": pd.Series(
                        [d[2] for d in decoded], dtype="int32", index=pdf.index
                    ),
                }
            )

    return mm_ppm.mapInPandas(batches, DECODE_REAL_SCHEMA)


def encode_wav(sample_rate: int, channels: int, samples: bytes) -> bytes:
    """Encode raw 16-bit PCM bytes as a real RIFF/WAVE file (header +
    fmt + data chunks) — like PPM, writable with no codec library."""
    import struct

    n = len(samples) - (len(samples) % 2)
    samples = samples[:n]
    byte_rate = sample_rate * channels * 2
    block_align = channels * 2
    fmt = struct.pack(
        "<4sIHHIIHH", b"fmt ", 16, 1, channels, sample_rate, byte_rate,
        block_align, 16,
    )
    data = struct.pack("<4sI", b"data", n) + samples
    riff_len = 4 + len(fmt) + len(data)
    return struct.pack("<4sI4s", b"RIFF", riff_len, b"WAVE") + fmt + data


def decode_audio_real(payload: bytes) -> tuple[int, int, int]:
    """REAL audio decode for RIFF/WAVE PCM: walks the chunk list, reads
    (sample_rate, channels, n_samples) from the fmt/data chunks — parsed
    from the actual bytes, no codec library. Compressed audio (MP3/OGG)
    raises ValueError at the soundfile/libav integration seam."""
    import struct

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError(
            "unsupported audio format (WAV/PCM decodable here; wire "
            "soundfile/libav for compressed formats at this seam)"
        )
    i = 12
    rate = chans = bits = None
    n_data = 0
    while i + 8 <= len(payload):
        cid, clen = struct.unpack_from("<4sI", payload, i)
        if cid == b"fmt ":
            _, chans, rate, _, _, bits = struct.unpack_from(
                "<HHIIHH", payload, i + 8
            )
        elif cid == b"data":
            n_data = clen
        i += 8 + clen + (clen % 2)  # chunks are word-aligned
    if rate is None:
        raise ValueError("WAV missing fmt chunk")
    n_samples = n_data // (chans * (bits // 8)) if chans and bits else 0
    return rate, chans, n_samples


def encode_wav_pcm16(sample_rate: int, samples: list[int]) -> bytes:
    """Encode 16-bit mono PCM SAMPLES as a REAL RIFF/WAVE file via the
    stdlib ``wave`` module. Complements :func:`encode_wav` (the raw
    chunk-level writer above): this one takes integer samples, which is
    what the sample-exact feature path needs."""
    import io
    import struct
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(struct.pack("<%dh" % len(samples), *samples))
    return buf.getvalue()


def decode_wav_samples(payload: bytes) -> tuple[int, int, int, int, int]:
    """REAL audio decode AT SAMPLE LEVEL: parse RIFF/WAVE bytes (header
    + PCM frames) and return (sample_rate, n_samples, n_channels,
    zero_crossings, sum_abs). Goes deeper than
    :func:`decode_audio_real` (header-only chunk walk above): the PCM
    frames themselves are decoded, and the features are INTEGER
    arithmetic over the decoded samples — sign-flip count under the
    >=0 convention and Σ|s| — so a cross-engine oracle can recompute
    them exactly from the generative formula. Compressed codecs
    (MP3/FLAC/...) raise ``ValueError``: wiring soundfile/librosa at
    this exact seam is the documented integration point — batching,
    schema, and fan-out are unchanged by that swap (same contract as
    :func:`decode_image_real`)."""
    import io
    import struct
    import wave

    try:
        with wave.open(io.BytesIO(bytes(payload)), "rb") as w:
            sr = w.getframerate()
            n = w.getnframes()
            ch = w.getnchannels()
            raw = w.readframes(n)
        samples = struct.unpack("<%dh" % (n * ch), raw)
    except (wave.Error, struct.error, EOFError) as e:
        raise ValueError(f"not a decodable WAV payload: {e}") from e
    zc = sum(
        1
        for a, b in zip(samples, samples[1:])
        if (a >= 0) != (b >= 0)
    )
    return sr, n, ch, zc, sum(abs(s) for s in samples)


def decode_audio_batches(mm_wav: DataFrame) -> DataFrame:
    """Decode REAL WAV payloads via mapInPandas using
    :func:`decode_wav_samples` — (doc_id, payload) in, parsed header
    fields + integer features out."""

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in it:
            decoded = [decode_wav_samples(bytes(b)) for b in pdf["payload"]]
            cols = list(zip(*decoded)) if decoded else [[]] * 5
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "sample_rate": pd.Series(
                        cols[0], dtype="int32", index=pdf.index
                    ),
                    "n_samples": pd.Series(
                        cols[1], dtype="int64", index=pdf.index
                    ),
                    "n_channels": pd.Series(
                        cols[2], dtype="int32", index=pdf.index
                    ),
                    "zero_crossings": pd.Series(
                        cols[3], dtype="int64", index=pdf.index
                    ),
                    "sum_abs": pd.Series(
                        cols[4], dtype="int64", index=pdf.index
                    ),
                }
            )

    return mm_wav.mapInPandas(
        batches,
        "doc_id bigint, sample_rate int, n_samples bigint, "
        "n_channels int, zero_crossings bigint, sum_abs bigint",
    )


def decode_ppm_stream(payload: bytes) -> list[tuple[int, int, int]]:
    """REAL multi-frame decode: parse a CONCATENATED-P6 stream (the
    motion-JPEG idea on the uncompressed format this container can
    honestly write) frame by frame — each frame's ASCII header gives its
    dims, the body length follows from them, and the next frame starts
    right after. Returns [(width, height, pix_sum)] per frame, where
    pix_sum = Σ body bytes — an integer feature a cross-engine oracle
    recomputes exactly. Garbled streams raise ``ValueError`` (same
    contract as :func:`decode_image_real`); compressed video is the
    documented ffmpeg seam."""
    frames: list[tuple[int, int, int]] = []
    buf = bytes(payload)
    pos = 0
    while pos < len(buf):
        if buf[pos : pos + 3] != b"P6\n":
            raise ValueError(f"not a P6 frame at offset {pos}")
        try:
            nl2 = buf.index(b"\n", pos + 3)
            dims = buf[pos + 3 : nl2].split()
            w, h = int(dims[0]), int(dims[1])
            nl3 = buf.index(b"\n", nl2 + 1)  # maxval line
            body_start = nl3 + 1
            body_end = body_start + w * h * 3
            body = buf[body_start:body_end]
            if len(body) != w * h * 3:
                raise ValueError("truncated frame body")
        except (ValueError, IndexError) as e:
            raise ValueError(f"garbled P6 stream at offset {pos}: {e}") from e
        frames.append((w, h, sum(body)))
        pos = body_end
    return frames


def decode_video_batches(mm_stream: DataFrame) -> DataFrame:
    """1→N frame extraction from REAL concatenated-P6 payloads via
    mapInPandas (:func:`decode_ppm_stream`): (doc_id, payload) in,
    one row per decoded frame out — the genuine-bytes upgrade of the
    synthetic ``sample_frames`` fan-out."""

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in it:
            ids, fidx, ws, hs, sums = [], [], [], [], []
            for did, b in zip(pdf["doc_id"], pdf["payload"]):
                for i, (w, h, s) in enumerate(decode_ppm_stream(bytes(b))):
                    ids.append(int(did))
                    fidx.append(i)
                    ws.append(w)
                    hs.append(h)
                    sums.append(s)
            yield pd.DataFrame(
                {
                    "doc_id": pd.array(ids, dtype="int64"),
                    "frame_idx": pd.array(fidx, dtype="int32"),
                    "width": pd.array(ws, dtype="int32"),
                    "height": pd.array(hs, dtype="int32"),
                    "pix_sum": pd.array(sums, dtype="int64"),
                }
            )

    return mm_stream.mapInPandas(
        batches,
        "doc_id bigint, frame_idx int, width int, height int, "
        "pix_sum bigint",
    )
