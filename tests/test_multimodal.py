"""Multimodal operator plumbing tests (operators/multimodal.py).

The parity suite already proves metadata/decode/resize/frames values
against the DuckDB oracle; these tests cover what SQL can't see: byte
content of rewritten payloads, feature determinism across partitionings,
Arrow batch shapes, and the real PPM/BMP/WAV header parsers (including
their loud rejection of compressed formats at the codec seam).
"""

from __future__ import annotations

import pytest

from world_cup_duckdb_spark.operators.multimodal import (
    FRAME_CHUNK,
    attach_payload,
    decode_image_real,
    decode_media,
    extract_features,
    resize_images,
    sample_frames,
)
from world_cup_duckdb_spark.sources.catalog import table


@pytest.fixture(scope="module")
def mm(spark, sf_dir):
    return attach_payload(table(spark, sf_dir, "documents")).cache()


def test_payload_is_utf8_of_text(spark, sf_dir, mm):
    docs = {r["doc_id"]: r["text"] for r in
            table(spark, sf_dir, "documents").collect()}
    for r in mm.collect():
        assert bytes(r["payload"]) == docs[r["doc_id"]].encode("utf-8")
        assert r["meta"]["n_bytes"] == len(bytes(r["payload"]))


def test_decode_schema_and_channels(mm):
    out = decode_media(mm)
    assert [f.name for f in out.schema.fields] == [
        "doc_id", "media_type", "width", "height", "channels"]
    rows = out.collect()
    assert rows, "decode produced no rows"
    for r in rows:
        assert 16 <= r["width"] <= 512 and 16 <= r["height"] <= 512
        assert r["channels"] == (1 if r["media_type"] == "audio" else 3)


def test_features_deterministic_across_partitioning(mm):
    a = {r["doc_id"]: list(r["features"])
         for r in extract_features(mm).collect()}
    b = {r["doc_id"]: list(r["features"])
         for r in extract_features(mm.repartition(7)).collect()}
    assert a == b
    for vec in a.values():
        assert len(vec) == 8
        assert abs(sum(vec) - 1.0) < 1e-5  # L1-normalized


def test_resize_rewrites_bytes(mm):
    for r in resize_images(mm, 8, 4).collect():
        assert len(bytes(r["payload"])) == 8 * 4 * 3
        assert r["width"] == 8 and r["height"] == 4


def test_frames_fanout_slices_payload(mm):
    payloads = {r["doc_id"]: bytes(r["payload"]) for r in mm.collect()}
    frames = sample_frames(mm).collect()
    assert frames, "no video frames sampled"
    for r in frames:
        src = payloads[r["doc_id"]]
        i = r["frame_idx"]
        expected = src[i * FRAME_CHUNK:(i + 1) * FRAME_CHUNK]
        assert bytes(r["frame"]) == expected
        assert r["frame_bytes"] == len(expected)
    # fan-out count: 1 + n_bytes % 4 rows per video doc
    by_doc: dict[int, int] = {}
    for r in frames:
        by_doc[r["doc_id"]] = by_doc.get(r["doc_id"], 0) + 1
    for doc_id, n in by_doc.items():
        assert n == 1 + len(payloads[doc_id]) % 4


def test_real_codec_rejects_compressed_formats_loudly():
    # PPM/BMP decode for real; compressed formats fail at the documented
    # PIL integration seam instead of returning garbage.
    with pytest.raises(ValueError):
        decode_image_real(b"\x89PNG...")


def test_at_rest_metadata_scan_skips_blob(spark, mm, tmp_path_factory):
    # The 100 TB layout claim: payload in its own parquet column means
    # metadata-only queries never read blob pages. Write the multimodal
    # table to disk, scan only metadata, and assert the reader's schema
    # excludes the payload column entirely.
    base = str(tmp_path_factory.mktemp("mm_at_rest") / "mm")
    mm.write.mode("overwrite").parquet(base)
    at_rest = spark.read.parquet(base).select("doc_id", "meta.media_type")
    plan = at_rest._jdf.queryExecution().executedPlan().toString()
    read_schema = plan.split("ReadSchema:")[1]
    assert "payload" not in read_schema, plan
    assert at_rest.count() == mm.count()


def test_no_shuffle_in_narrow_maps(spark, mm):
    # decode is a narrow map over the scan: no Exchange in the plan.
    plan = decode_media(mm)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_decode_image_real_parses_actual_bytes():
    """decode_image_real must parse dims from real format headers: PPM
    with whitespace/comments, BMP little-endian fields, and reject
    compressed formats at the documented seam."""
    import struct

    import pytest as _pytest

    from world_cup_duckdb_spark.operators.multimodal import (
        decode_image_real,
        encode_ppm,
    )

    assert decode_image_real(encode_ppm(33, 21, b"xyz")) == (33, 21, 3)
    # PPM allows comments and arbitrary whitespace in the header
    ppm = b"P6\n# a comment\n  640\t480\n255\n" + b"\0" * (640 * 480 * 3)
    assert decode_image_real(ppm) == (640, 480, 3)
    # minimal BMP: magic + header fields at fixed offsets
    bmp = bytearray(54)
    bmp[:2] = b"BM"
    struct.pack_into("<i", bmp, 18, 320)
    struct.pack_into("<i", bmp, 22, -200)  # top-down bitmaps are negative
    struct.pack_into("<H", bmp, 28, 24)
    assert decode_image_real(bytes(bmp)) == (320, 200, 3)
    with _pytest.raises(ValueError):
        decode_image_real(b"\x89PNG\r\n\x1a\n")


def test_decode_audio_real_roundtrips_wav():
    from world_cup_duckdb_spark.operators.multimodal import (
        decode_audio_real,
        encode_wav,
    )

    payload = encode_wav(16000, 2, b"\x01\x02" * 750)
    assert decode_audio_real(payload) == (16000, 2, 375)
    mono = encode_wav(8000, 1, b"\x00\x01" * 10)
    assert decode_audio_real(mono) == (8000, 1, 10)
    import pytest as _pytest

    with _pytest.raises(ValueError):
        decode_audio_real(b"ID3\x04...mp3")


def test_wav_codec_roundtrip_and_corrupt_rejection(spark):
    """encode_wav_pcm16 → decode_wav_samples is sample-exact through real RIFF
    bytes (features recomputed from the raw samples agree), and corrupt
    or non-WAV payloads fail with the documented ValueError contract —
    a garbled corpus row must never decode into silent garbage."""
    import pytest as _pytest

    from world_cup_duckdb_spark.operators.multimodal import (
        decode_wav_samples,
        encode_wav_pcm16,
    )

    samples = [((i * 37) % 512) - 256 for i in range(100)]
    payload = encode_wav_pcm16(16000, samples)
    assert payload[:4] == b"RIFF" and payload[8:12] == b"WAVE"
    sr, n, ch, zc, sabs = decode_wav_samples(payload)
    assert (sr, n, ch) == (16000, 100, 1)
    assert sabs == sum(abs(s) for s in samples)
    assert zc == sum(
        1 for a, b in zip(samples, samples[1:]) if (a >= 0) != (b >= 0)
    )
    with _pytest.raises(ValueError, match="WAV"):
        decode_wav_samples(b"ID3\x04not audio we can parse")
    with _pytest.raises(ValueError, match="WAV"):
        decode_wav_samples(payload[:20])  # truncated header


def test_ppm_stream_codec_roundtrip_and_garble_rejection(spark):
    """decode_ppm_stream segments a real concatenated-P6 stream into
    exact frames (dims + byte checksums), and garbled streams — wrong
    magic, truncated body — fail with the documented ValueError."""
    import pytest as _pytest

    from world_cup_duckdb_spark.operators.multimodal import (
        decode_ppm_stream,
        encode_ppm,
    )

    b0 = bytes((j * 3) % 256 for j in range(4 * 2 * 3))
    b1 = bytes((j * 5 + 1) % 256 for j in range(2 * 3 * 3))
    stream = encode_ppm(4, 2, b0) + encode_ppm(2, 3, b1)
    frames = decode_ppm_stream(stream)
    assert frames == [(4, 2, sum(b0)), (2, 3, sum(b1))]
    with _pytest.raises(ValueError, match="P6"):
        decode_ppm_stream(b"RIFF not a ppm")
    with _pytest.raises(ValueError, match="garbled|truncated"):
        decode_ppm_stream(stream[:-5])  # truncated last frame body
