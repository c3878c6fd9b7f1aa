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
def test_decode_pixels_guards_on_non_png_without_codec():
    # payloads beyond PNG/JPEG still need a codec library
    with pytest.raises(NotImplementedError):
        mm.decode_pixels(b"\x00" * 16)


def test_decode_pixels_jpeg_runs_for_real():
    """JPEG decodes in every runtime now (stdlib baseline decoder) — the
    last media format whose decode had never executed here (round-3 ask)."""
    from tests.test_jpegx import encode_jpeg

    flat = bytes([200] * 64)
    w, h, mode, rgb = mm.decode_pixels(encode_jpeg(8, 8, [(flat, 8, 8)], [(1, 1)]))
    assert (w, h, mode) == (8, 8, "RGB")
    assert max(abs(p - 200) for p in rgb) <= 1


def test_decode_pixels_png_runs_for_real():
    """PNG decodes in EVERY runtime now (stdlib zlib + unfiltering) — the
    reference's cv2.imdecode position executes end-to-end here, 0 skips."""
    from ai_service_ocr_grading_handler_spark.core import pngx

    rgb = b"\xff\x00\x00" * 12  # 4x3 solid red
    png = pngx.encode_png(4, 3, rgb)
    w, h, mode, raw = mm.decode_pixels(png)
    assert (w, h, mode) == (4, 3, "RGB")
    assert raw == rgb


def test_png_codec_filters_and_color_types():
    """Decoder handles every scanline filter (a zlib-compressed gradient
    exercises Sub/Up/Average/Paeth via round-trip vs a reference pattern)
    and the gray/RGBA/palette color types."""
    import struct as _st
    import zlib as _z

    from ai_service_ocr_grading_handler_spark.core import pngx

    # gradient exercises value reconstruction; encode(filter 0) -> decode
    w, h = 7, 5
    rgb = bytes((x * 37 + y * 11 + c * 5) % 256 for y in range(h) for x in range(w) for c in range(3))
    assert pngx.decode_png(pngx.encode_png(w, h, rgb)) == (w, h, "RGB", rgb)

    def chunk(ctype, body):
        return _st.pack(">I", len(body)) + ctype + body + _st.pack(">I", _z.crc32(ctype + body) & 0xFFFFFFFF)

    def make(color_type, channels, scanlines, plte=b""):
        ihdr = _st.pack(">IIBBBBB", 3, 2, 8, color_type, 0, 0, 0)
        body = b"".join(scanlines)
        out = pngx._SIG + chunk(b"IHDR", ihdr)
        if plte:
            out += chunk(b"PLTE", plte)
        return out + chunk(b"IDAT", _z.compress(body)) + chunk(b"IEND", b"")

    # grayscale 3x2 with Sub filter on row 0, Up on row 1
    # row0 raw: 10, 20, 30 -> Sub deltas: 10, 10, 10
    # row1 raw: 11, 22, 33 -> Up deltas: 1, 2, 3
    g = make(0, 1, [b"\x01\x0a\x0a\x0a", b"\x02\x01\x02\x03"])
    assert pngx.decode_png(g) == (
        3, 2, "RGB",
        bytes(v for v in (10, 20, 30, 11, 22, 33) for _ in range(3)),
    )
    # RGBA: alpha dropped
    rgba_row = b"\x00" + b"".join(bytes((r, 0, 0, 128)) for r in (1, 2, 3))
    rgba = make(6, 4, [rgba_row] * 2)
    want_rgb = b"".join(bytes((r, 0, 0)) for r in (1, 2, 3)) * 2
    assert pngx.decode_png(rgba)[3] == want_rgb
    # palette
    plte = bytes((9, 8, 7)) + bytes((1, 2, 3))
    pal = make(3, 1, [b"\x00\x00\x01\x00"] * 2, plte=plte)
    assert pngx.decode_png(pal)[3] == bytes((9, 8, 7, 1, 2, 3, 9, 8, 7)) * 2
    # 16-bit depth decodes since r4 (high byte kept, PIL convert style):
    # 1x1 RGB16 pixel 0x1234 0xABCD 0x00FF -> (0x12, 0xAB, 0x00)
    px16 = b"\x00" + bytes.fromhex("1234ABCD00FF")
    deep = pngx._SIG + chunk(b"IHDR", _st.pack(">IIBBBBB", 1, 1, 16, 2, 0, 0, 0)) + chunk(b"IDAT", _z.compress(px16)) + chunk(b"IEND", b"")
    assert pngx.decode_png(deep) == (1, 1, "RGB", bytes((0x12, 0xAB, 0x00)))
    # sub-byte depths still refuse cleanly
    bad = pngx._SIG + chunk(b"IHDR", _st.pack(">IIBBBBB", 1, 1, 4, 0, 0, 0, 0)) + chunk(b"IDAT", _z.compress(b"\x00\x00")) + chunk(b"IEND", b"")
    with pytest.raises(NotImplementedError):
        pngx.decode_png(bad)


def test_png_palette_index_out_of_range_raises():
    """A malformed palette PNG whose pixels reference entries beyond PLTE
    must fail at the decode boundary, not return a misaligned RGB buffer
    (review finding)."""
    import struct as _st
    import zlib as _z

    from ai_service_ocr_grading_handler_spark.core import pngx

    def chunk(ctype, body):
        return _st.pack(">I", len(body)) + ctype + body + _st.pack(">I", _z.crc32(ctype + body) & 0xFFFFFFFF)

    ihdr = _st.pack(">IIBBBBB", 2, 1, 8, 3, 0, 0, 0)
    plte = bytes((1, 2, 3)) + bytes((4, 5, 6))  # 2 entries
    scan = _z.compress(b"\x00\x00\x04")  # pixel index 4 > max 1
    bad = pngx._SIG + chunk(b"IHDR", ihdr) + chunk(b"PLTE", plte) + chunk(b"IDAT", scan) + chunk(b"IEND", b"")
    with pytest.raises(ValueError, match="palette index"):
        pngx.decode_png(bad)


def test_wav_features_match_independent_derivation():
    """The WAV path runs for real: stdlib container parse + PCM features.
    RMS/zero-crossings must equal an independent recomputation from the
    sawtooth synth formula; malformed bytes raise typed errors."""
    import struct as _st

    for doc_id in (0, 3, 17, 123):
        blob = mm.synth_wav(doc_id)
        f = mm.wav_features(blob)
        rate = 8000 + (doc_id % 4) * 4000
        n = 400 + (doc_id % 50) * 8
        period = 20 + (doc_id % 30)
        amp = 1000 + (doc_id % 7) * 500
        samples = [(2 * amp * (i % period)) // period - amp for i in range(n)]
        rms = round((sum(s * s for s in samples) / n) ** 0.5, 3)
        zc = sum(
            1 for i in range(1, n) if (samples[i - 1] < 0) != (samples[i] < 0)
        )
        assert f == {
            "n_channels": 1, "sample_rate": rate, "n_frames": n,
            "duration_ms": (n * 1000) // rate, "rms": rms, "zero_crossings": zc,
        }
    # stereo averages to mono; >16-bit refuses; garbage raises ValueError
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(_st.pack("<4h", 100, 300, -100, -300))
    st = mm.wav_features(buf.getvalue())
    assert st["n_channels"] == 2 and st["n_frames"] == 2
    assert st["zero_crossings"] == 1  # mono-averaged: +200 then -200
    with pytest.raises(ValueError):
        mm.wav_features(b"RIFFgarbage")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(4)
        w.setframerate(8000)
        w.writeframes(b"\x00" * 8)
    with pytest.raises(NotImplementedError):
        mm.wav_features(buf.getvalue())


def test_stack_geometry_pixel_exact():
    """The reference's stacked-crop layout (llm_number_prediction.py:83-99)
    reproduced pixel-for-pixel: black borders, white canvas, left-aligned
    crops, 10px white spacing, min-width padding."""
    import numpy as np

    # two tiny crops: 2x1 red, 3x2 green
    red = bytes([200, 0, 0] * 2)
    green = bytes([0, 150, 0] * 6)
    w, h, rgb = mm.stack_rgb_images([(2, 1, red), (3, 2, green)])
    b, sp = mm.STACK_BORDER, mm.STACK_SPACING
    assert w == mm.STACK_MIN_WIDTH  # 3+10 < 300 -> min width wins
    assert h == (1 + 2) + 2 * 2 * b + sp
    a = np.frombuffer(rgb, dtype=np.uint8).reshape(h, w, 3)
    # crop 1 pixel at (b, b); border black around it; canvas white to the right
    assert tuple(a[b, b]) == (200, 0, 0)
    assert tuple(a[0, 0]) == (0, 0, 0)              # top-left border black
    assert tuple(a[b, 2 + 2 * b]) == (255, 255, 255)  # right of crop1's border
    # spacing row between the crops is white
    assert tuple(a[1 + 2 * b + sp // 2, 0]) == (255, 255, 255)
    # crop 2 first pixel
    y2 = 1 + 2 * b + sp
    assert tuple(a[y2 + b, b]) == (0, 150, 0)
    # round-trips the real codec byte-exactly
    from ai_service_ocr_grading_handler_spark.core import pngx

    assert pngx.decode_png(pngx.encode_png(w, h, rgb)) == (w, h, "RGB", rgb)
    # widths past the minimum flip the max() branch
    wide = mm.synth_rgb(1, 400, 2)
    w2, _, _ = mm.stack_rgb_images([(400, 2, wide)])
    assert w2 == 400 + 2 * b


def test_resize_rgb_nearest_neighbor():
    import numpy as np

    # 4x2 gradient -> 2x1: picks pixels at x in {0,2}, y=0
    src = bytes(v for x in range(8) for v in (x * 10, 0, 0))
    a = np.frombuffer(src, dtype=np.uint8).reshape(2, 4, 3)
    out = mm.resize_rgb(4, 2, src, 2, 1)
    got = np.frombuffer(out, dtype=np.uint8).reshape(1, 2, 3)
    assert tuple(got[0, 0]) == tuple(a[0, 0])
    assert tuple(got[0, 1]) == tuple(a[0, 2])
    # upscale replicates
    up = mm.resize_rgb(4, 2, src, 8, 4)
    u = np.frombuffer(up, dtype=np.uint8).reshape(4, 8, 3)
    assert tuple(u[0, 0]) == tuple(u[1, 1]) == tuple(a[0, 0])


def test_png_decoder_refuses_decompression_bombs():
    """Review finding: the raw-buffer size is known from IHDR before
    inflating — absurd dimensions refuse up front, and an IDAT inflating
    past the header's claim trips the mismatch, so a crafted ~1 MB bomb
    can never force multi-GB allocations."""
    import struct as _st
    import zlib as _z

    from ai_service_ocr_grading_handler_spark.core import pngx

    def chunk(ctype, body):
        return _st.pack(">I", len(body)) + ctype + body + _st.pack(">I", _z.crc32(ctype + body) & 0xFFFFFFFF)

    # 20000 x 20000 RGB = 1.2 GB raw claimed by a tiny file
    ihdr = _st.pack(">IIBBBBB", 20000, 20000, 8, 2, 0, 0, 0)
    bomb = pngx._SIG + chunk(b"IHDR", ihdr) + chunk(b"IDAT", _z.compress(b"\x00" * 64)) + chunk(b"IEND", b"")
    with pytest.raises(ValueError, match="exceeds"):
        pngx.decode_png(bomb)
    # small claimed dims but an IDAT inflating far beyond them
    ihdr = _st.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0)
    fat = pngx._SIG + chunk(b"IHDR", ihdr) + chunk(b"IDAT", _z.compress(b"\x00" * 100000)) + chunk(b"IEND", b"")
    with pytest.raises(ValueError, match="mismatch"):
        pngx.decode_png(fat)
    # truncated deflate stream that happens to yield exactly the expected
    # bytes must still fail (d.eof check — review finding)
    good = pngx.encode_png(2, 2, b"\x11" * 12)
    idat_start = good.index(b"IDAT") + 4
    (idat_len,) = _st.unpack(">I", good[good.index(b"IDAT") - 4 : good.index(b"IDAT")])
    stream = good[idat_start : idat_start + idat_len]
    # re-chunk with the trailer stripped
    trunc = stream[:-5]
    cut = pngx._SIG + chunk(b"IHDR", _st.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0)) + chunk(b"IDAT", trunc) + chunk(b"IEND", b"")
    with pytest.raises(ValueError):
        pngx.decode_png(cut)


def test_codec_fuzz_fails_cleanly():
    """Random/garbage bytes into the stdlib codecs must raise a typed,
    catchable error (ValueError/NotImplementedError/zlib/struct) or return
    a valid result — never hang or escape with an arbitrary exception."""
    import struct as _st
    import zlib as _z

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from ai_service_ocr_grading_handler_spark.core import jpegx, pdfx, pngx

    allowed = (ValueError, NotImplementedError, _z.error, _st.error)

    @settings(max_examples=150, deadline=None)
    @given(st.binary(max_size=400))
    def run(b):
        for fn in (
            pngx.decode_png, pdfx.extract_text_boxes, mm.wav_features,
            jpegx.decode_jpeg,
        ):
            try:
                fn(b)
            except allowed:
                pass
        # prefix-poisoned variants exercise the post-signature paths
        for prefix in (pngx._SIG, b"%PDF-1.4\n", b"RIFF", b"\xff\xd8\xff"):
            try:
                mm.wav_features(prefix + b)
            except allowed:
                pass
            try:
                pngx.decode_png(prefix + b)
            except allowed:
                pass
            try:
                pdfx.extract_text_boxes(prefix + b)
            except allowed:
                pass
            try:
                jpegx.decode_jpeg(prefix + b)
            except allowed:
                pass

    run()


def test_png_paeth_average_roundtrip_against_reference_pattern():
    """Hand-filtered Average and Paeth rows reconstruct exactly."""
    import struct as _st
    import zlib as _z

    from ai_service_ocr_grading_handler_spark.core import pngx

    def chunk(ctype, body):
        return _st.pack(">I", len(body)) + ctype + body + _st.pack(">I", _z.crc32(ctype + body) & 0xFFFFFFFF)

    # gray 3x2: row0 = (100, 110, 120) via filter 0; row1 target (90, 105, 130)
    # Average: recon = raw + floor((left + up)/2)
    #   i0: left=0 up=100 -> raw = 90 - 50 = 40
    #   i1: left=90 up=110 -> raw = 105 - 100 = 5
    #   i2: left=105 up=120 -> raw = 130 - 112 = 18
    avg = (
        pngx._SIG
        + chunk(b"IHDR", _st.pack(">IIBBBBB", 3, 2, 8, 0, 0, 0, 0))
        + chunk(b"IDAT", _z.compress(bytes([0, 100, 110, 120, 3, 40, 5, 18])))
        + chunk(b"IEND", b"")
    )
    assert pngx.decode_png(avg)[3] == bytes(
        v for v in (100, 110, 120, 90, 105, 130) for _ in range(3)
    )
    # Paeth row: predictor picks nearest of (left, up, upper-left)
    #   i0: a=0 b=100 c=0 -> p=100 -> pb=0 smallest -> pred=100; raw = 95-100 mod 256 = 251
    #   i1: a=95 b=110 c=100 -> p=105; pa=10 pb=5 pc=5 -> pb<=pc -> pred=110; raw = 115-110 = 5
    #   i2: a=115 b=120 c=110 -> p=125; pa=10 pb=5 pc=15 -> pred=120; raw = 128-120 = 8
    pae = (
        pngx._SIG
        + chunk(b"IHDR", _st.pack(">IIBBBBB", 3, 2, 8, 0, 0, 0, 0))
        + chunk(b"IDAT", _z.compress(bytes([0, 100, 110, 120, 4, 251, 5, 8])))
        + chunk(b"IEND", b"")
    )
    assert pngx.decode_png(pae)[3] == bytes(
        v for v in (100, 110, 120, 95, 115, 128) for _ in range(3)
    )


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


def test_png_adam7_interlace_decodes():
    """A hand-interlaced Adam7 PNG decodes to exactly the same pixels as
    the straight row-major encoding of the same image; 16-bit Adam7 also
    exercises the high-byte reduction on the scatter path."""
    import struct as _st
    import zlib as _z

    from ai_service_ocr_grading_handler_spark.core import pngx

    def chunk(ctype, body):
        return _st.pack(">I", len(body)) + ctype + body + _st.pack(
            ">I", _z.crc32(ctype + body) & 0xFFFFFFFF
        )

    w, h = 9, 6  # non-multiples of 8: several passes are ragged/empty-edge
    rgb = bytes(
        (x * 29 + y * 53 + c * 17) % 256
        for y in range(h)
        for x in range(w)
        for c in range(3)
    )

    def interlaced_idat(sample_bytes):
        body = bytearray()
        for x0, y0, dx, dy in pngx._ADAM7:
            xs = list(range(x0, w, dx))
            ys = list(range(y0, h, dy))
            if not xs or not ys:
                continue
            for yy in ys:
                body.append(0)  # filter None
                for xx in xs:
                    for c in range(3):
                        v = rgb[(yy * w + xx) * 3 + c]
                        body.append(v)
                        if sample_bytes == 2:
                            body.append(0x42)  # low byte, dropped on decode
        return bytes(body)

    for depth in (8, 16):
        ihdr = _st.pack(">IIBBBBB", w, h, depth, 2, 0, 0, 1)  # interlace=1
        png = (
            pngx._SIG
            + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", _z.compress(interlaced_idat(depth // 8)))
            + chunk(b"IEND", b"")
        )
        assert pngx.decode_png(png) == (w, h, "RGB", rgb), f"depth {depth}"
