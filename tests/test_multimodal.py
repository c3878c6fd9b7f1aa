"""Multimodal binary plumbing: container round-trip, kernel batch shape,
codec stub contract."""

from __future__ import annotations

import hashlib

import pytest

from ai_service_ocr_grading_handler_spark.operators import multimodal as mm

SF = "/root/testdata/sf0.001"


def test_pack_unpack_roundtrip():
    kind, blob = mm.pack_media(7, "hello world payload")
    assert kind == "audio"  # 7 % 3 == 1
    k, w, h, payload = mm.unpack_media(blob)
    assert (k, w, h) == ("audio", 320 + 2 * 16, 240 + 1 * 16)
    assert payload == b"hello world payload"


def _has_pil() -> bool:
    try:
        import PIL.Image  # noqa: F401

        return True
    except ImportError:
        return False


@pytest.mark.skipif(_has_pil(), reason="PIL present: real-decode branch applies")
def test_decode_pixels_guards_when_no_codec():
    with pytest.raises(NotImplementedError):
        mm.decode_pixels(b"\x00" * 16)


@pytest.mark.skipif(not _has_pil(), reason="no image codec in this runtime")
def test_decode_pixels_real_when_codec_present():
    import io

    import PIL.Image

    im = PIL.Image.new("RGB", (4, 3), (255, 0, 0))
    buf = io.BytesIO()
    im.save(buf, format="PNG")
    w, h, mode, raw = mm.decode_pixels(buf.getvalue())
    assert (w, h, mode) == (4, 3, "RGB")
    assert raw == b"\xff\x00\x00" * 12


def test_metadata_kernel_batch_invariant(spark):
    media = mm.media_df(spark, SF)
    out = mm.media_metadata(media).orderBy("doc_id").collect()
    assert len(out) == 500
    for r in out[:25]:
        w, h = mm.media_dims(r.doc_id)
        assert (r.width, r.height) == (w, h)
        assert r.n_bytes == r.payload_len + mm.HEADER_LEN
    # repartitioned input -> identical output (pure function of the blob)
    out2 = mm.media_metadata(media.repartition(7)).orderBy("doc_id").collect()
    assert out == out2


def test_frame_sampling_hashes_payload_slices(spark):
    media = mm.media_df(spark, SF)
    frames = mm.sample_frames(media, every_k=3).collect()
    assert frames
    docs = {
        r.doc_id: r.text
        for r in spark.read.parquet(f"{SF}/documents.parquet").collect()
    }
    for r in frames[:50]:
        assert r.doc_id % 3 == 2  # only 'video' rows sampled
        payload = docs[r.doc_id].encode()
        frame = payload[r.frame_idx * mm.FRAME_BYTES : (r.frame_idx + 1) * mm.FRAME_BYTES]
        assert r.frame_hex == frame.hex().upper()


def test_native_synthesis_equals_pack_media(spark):
    """media_df's native (unhex-header || encode-payload) construction must
    be BYTE-identical to the Python pack_media reference for every doc."""
    docs = {
        r.doc_id: r.text
        for r in spark.read.parquet(f"{SF}/documents.parquet").collect()
    }
    for r in mm.media_df(spark, SF).collect():
        kind, blob = mm.pack_media(r.doc_id, docs[r.doc_id])
        assert (r.kind, bytes(r.media)) == (kind, blob)
