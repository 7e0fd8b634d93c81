"""Multimodal binary-column plumbing: schema, mapInPandas batch shape,
stub fallback, and pushdown behavior."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ssiintegrateddatapipeline_spark.operators import multimodal as M


def test_payload_is_binary_with_typed_metadata(spark, sf_dir):
    mm = M.multimodal_table(spark, sf_dir)
    assert isinstance(mm.schema["payload"].dataType, T.BinaryType)
    meta = mm.schema["meta"].dataType
    assert isinstance(meta, T.StructType)
    assert [f.name for f in meta.fields] == ["media_type", "byte_len", "sha256"]
    row = mm.where(F.col("doc_id") == 0).collect()[0]
    assert isinstance(row["payload"], (bytes, bytearray))
    assert row["meta"]["byte_len"] == len(row["payload"])


def test_real_decoder_is_stubbed():
    with pytest.raises(NotImplementedError):
        M._decode_image_real(b"\x89PNG")


def test_fake_decode_deterministic():
    a = M._decode_image_fake(b"hello world")
    assert a == M._decode_image_fake(b"hello world")
    assert a[2] == 3  # channels


def test_decode_runs_batched(spark, sf_dir):
    decoded = M.decode_images(M.multimodal_table(spark, sf_dir))
    rows = decoded.collect()
    assert rows, "expected image rows"
    for r in rows[:5]:
        assert 64 <= r["width"] < 64 + 512
        assert 64 <= r["height"] < 64 + 512


def test_frame_sampling_counts(spark, sf_dir):
    frames = M.frame_sample_plan(M.multimodal_table(spark, sf_dir), every_n=10)
    agg = frames.groupBy("doc_id").count().collect()
    mm = (
        M.multimodal_table(spark, sf_dir)
        .where(F.col("meta.media_type") == "video/mp4")
        .select("doc_id", (F.col("meta.byte_len") / 100).cast("int").alias("n"))
        .where(F.col("n") > 0)
        .collect()
    )
    want = {r["doc_id"]: (r["n"] + 9) // 10 for r in mm}
    got = {r["doc_id"]: r["count"] for r in agg}
    assert got == want


def test_metadata_predicate_prunes_payload_column(spark, sf_dir):
    """Selecting only metadata must not read the payload bytes: the scan's
    ReadSchema should exclude `text` (the payload source column)."""
    docs_meta = M.multimodal_meta(spark, sf_dir).select("doc_id", "media_type")
    plan = docs_meta._jdf.queryExecution().executedPlan().toString()
    # media_type derives from doc_id only; text must be pruned from the scan
    assert "text" not in plan.split("ReadSchema")[-1]


# --- capability-probed real codecs ------------------------------------------


def test_codec_probes_match_import_reality():
    """The probes must report what an import would actually find — not a
    hard-coded environment assumption (Pillow may or may not be
    installed; stdlib wave is always there)."""
    from ssiintegrateddatapipeline_spark.operators import multimodal as M

    try:
        import PIL  # noqa: F401

        pillow_present = True
    except ImportError:
        pillow_present = False
    assert M.image_codec_available() is pillow_present
    assert M.audio_codec_available() is True


def test_png_header_real_decode():
    import struct

    from ssiintegrateddatapipeline_spark.operators import multimodal as M

    png = (
        M._PNG_MAGIC
        + struct.pack(">I", 13)
        + b"IHDR"
        + struct.pack(">II", 640, 480)
        + bytes([8, 6, 0, 0, 0])  # bit depth 8, color type 6 (RGBA)
    )
    assert M._decode_image(png) == (640, 480, 4)
    # grayscale color type
    png_gray = png[:25] + bytes([0]) + png[26:]
    assert M._decode_image(png_gray) == (640, 480, 1)
    # non-media payload falls back to the deterministic fake
    assert M._decode_image(b"just text") == M._decode_image_fake(b"just text")


def test_wav_real_decode(tmp_path):
    import io
    import struct
    import wave

    import pytest

    from ssiintegrateddatapipeline_spark.operators import multimodal as M

    if not M.audio_codec_available():
        pytest.skip("no audio codec available")

    samples = [0, 1000, -1000, 32767, -32768, 500]
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(struct.pack(f"<{len(samples)}h", *samples))
    payload = buf.getvalue()

    mean, lo, hi = M._audio_features_real(payload)
    assert lo == -32768.0 and hi == 32767.0
    assert abs(mean - sum(samples) / len(samples)) < 1e-9
    # a text payload routes to the fake path
    with pytest.raises(NotImplementedError):
        M._audio_features_real(b"definitely not audio")


def test_phash_pairs_cover_minhash_image_dups(spark, sf_dir):
    """The perceptual-hash blocking must recover every MinHash-LSH image
    near-dup pair (byte-stream aHash is coarser, so extra low-hamming
    pairs are allowed — missing true dups are not)."""
    from ssiintegrateddatapipeline_spark.operators.dedup import minhash_lsh_pairs
    from ssiintegrateddatapipeline_spark.operators.multimodal import (
        AHASH_MAX_HAMMING,
        multimodal_phash_pairs,
    )

    ph = {
        (r.doc_id_a, r.doc_id_b, r.hamming)
        for r in multimodal_phash_pairs(spark, sf_dir).collect()
    }
    assert all(h <= AHASH_MAX_HAMMING for _, _, h in ph)
    assert all(a < b for a, b, _ in ph)
    mh_img = {
        (r.doc_id_a, r.doc_id_b)
        for r in minhash_lsh_pairs(spark, sf_dir).collect()
        if r.doc_id_a % 3 == 0 and r.doc_id_b % 3 == 0
    }
    assert mh_img <= {(a, b) for a, b, _ in ph}
