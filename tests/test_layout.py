"""Layout-aware segmentation: XY-cut reading order, furniture removal,
box-order invariance, codec stub contract."""

from __future__ import annotations

import random

import pytest

from ai_service_ocr_grading_handler_spark.core import layout
from ai_service_ocr_grading_handler_spark.corpus import golden_text
from ai_service_ocr_grading_handler_spark.operators import layout_extract as lx

SF = "/root/testdata/sf0.001"


def _doc(doc_id=7, text="one two three four five six seven eight nine ten "
                        "eleven twelve thirteen fourteen fifteen sixteen "
                        "seventeen eighteen nineteen twenty"):
    return doc_id, text, lx.synth_layout_doc(doc_id, text)


def test_reading_order_reassembles_columns():
    doc_id, text, blob = _doc()
    r = layout.extract_layout(blob)
    assert r.text == f"Section {doc_id}\n\n" + golden_text(text)


def test_box_order_within_container_is_irrelevant():
    """Shuffling box order inside each page must not change the output —
    reading order comes from geometry, not container order."""
    doc_id, text, blob = _doc()
    boxes = layout.unpack_layout(blob)
    rng = random.Random(4)
    pages: list[list] = []
    n_pages = max(b.page for b in boxes) + 1
    for p in range(n_pages):
        pb = [
            (b.x0, b.y0, b.x1, b.y1, b.font, b.text)
            for b in boxes
            if b.page == p
        ]
        rng.shuffle(pb)
        pages.append(pb)
    shuffled = layout.pack_layout(pages)
    assert layout.extract_layout(shuffled).text == layout.extract_layout(blob).text


def test_furniture_detection():
    _, _, blob = _doc()
    r = layout.extract_layout(blob)
    furn = {b.text for b in r.blocks if b.label == "furniture"}
    assert "Journal of Spark Extraction" in furn
    assert any(t.startswith("Page ") for t in furn)  # digit-normalized recurrence
    assert all("Page" not in t or t.startswith("Page ") for t in furn)
    heads = [b for b in r.blocks if b.label == "heading"]
    assert len(heads) == 1 and heads[0].text.startswith("Section ")
    assert heads[0].confidence == 0.9


def _fixture_pdf(compress: bool = True) -> bytes:
    """Hand-built two-page PDF (stdlib only): page 1 has a Tm-positioned
    title, Td-advanced body line, and a TJ array; page 2 draws under a `cm`
    translation inside q/Q. FlateDecode when compress=True."""
    import zlib

    c1 = (
        b"BT /F1 18 Tf 1 0 0 1 72 700 Tm (Title Line) Tj ET\n"
        b"BT /F1 10 Tf 72 650 Td (body one) Tj 0 -14 TD (body two) Tj ET\n"
        b"BT /F1 10 Tf 72 600 Td [(arr one) -250 (arr two)] TJ ET\n"
    )
    c2 = b"q 1 0 0 1 50 100 cm BT /F1 12 Tf 10 20 Td (shifted) Tj ET Q\n"

    def stream_obj(num, data):
        if compress:
            comp = zlib.compress(data)
            return (
                f"{num} 0 obj\n<< /Length {len(comp)} /Filter /FlateDecode >>\n"
                .encode() + b"stream\n" + comp + b"\nendstream\nendobj\n"
            )
        return (
            f"{num} 0 obj\n<< /Length {len(data)} >>\n".encode()
            + b"stream\n" + data + b"\nendstream\nendobj\n"
        )

    return (
        b"%PDF-1.4\n"
        b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
        b"2 0 obj\n<< /Type /Pages /Kids [3 0 R 4 0 R] /Count 2"
        b" /MediaBox [0 0 612 792] >>\nendobj\n"
        b"3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 5 0 R >>\nendobj\n"
        b"4 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 6 0 R >>\nendobj\n"
        + stream_obj(5, c1)
        + stream_obj(6, c2)
        + b"trailer\n<< /Root 1 0 R >>\n%%EOF\n"
    )


def test_pdf_codec_runs_for_real():
    """PDF parsing executes in EVERY runtime now: pypdf when present, the
    stdlib content-stream interpreter (core.pdfx) otherwise — 0 skips.
    Both branches produce Boxes through identical math."""
    boxes = layout.parse_pdf_bytes(_fixture_pdf(compress=True))
    by_text = {b.text: b for b in boxes}
    assert set(by_text) == {
        "Title Line", "body one", "body two", "arr one", "arr two", "shifted",
    }
    t = by_text["Title Line"]
    # y-down flip: y0 = page_h - y - fs = 792 - 700 - 18
    assert (t.page, t.x0, t.y0, t.y1, t.font) == (0, 72.0, 74.0, 92.0, 18)
    b2 = by_text["body two"]
    assert (b2.page, round(b2.x0), round(b2.y1)) == (0, 72, 792 - (650 - 14))
    # TJ elements share the text line (same y), advance not simulated
    assert by_text["arr one"].y1 == by_text["arr two"].y1
    # cm translation applies: (10,20) + (50,100)
    s = by_text["shifted"]
    assert (s.page, s.x0, s.y1) == (1, 60.0, 792 - 120)
    # uncompressed variant parses identically
    raw_boxes = layout.parse_pdf_bytes(_fixture_pdf(compress=False))
    assert [(b.page, b.text, b.x0, b.y1) for b in raw_boxes] == [
        (b.page, b.text, b.x0, b.y1) for b in boxes
    ]


def test_pdf_codec_rejects_garbage():
    from ai_service_ocr_grading_handler_spark.core import pdfx

    with pytest.raises(ValueError):
        pdfx.extract_text_boxes(b"not a pdf at all")
    with pytest.raises(ValueError):
        pdfx.extract_text_boxes(b"%PDF-1.7 fake no objects")


def _one_page_pdf(content: bytes) -> bytes:
    import struct as _st
    import zlib as _z

    return (
        b"%PDF-1.4\n"
        b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
        b"2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1"
        b" /MediaBox [0 0 612 792] >>\nendobj\n"
        b"3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>\nendobj\n"
        + b"4 0 obj\n<< /Length " + str(len(content)).encode() + b" >>\n"
        + b"stream\n" + content + b"\nendstream\nendobj\n"
        + b"trailer\n<< /Root 1 0 R >>\n%%EOF\n"
    )


def test_pdf_content_stream_edge_cases():
    """Review findings: nested inline dicts must be skipped with depth
    (not to the first '>>'), \\8 and \\9 are unknown escapes whose
    backslash drops (not octal crashes), and BI inline images skip."""
    from ai_service_ocr_grading_handler_spark.core import pdfx

    # nested dict between text ops: '(B)' inside the dict must NOT leak
    # into the operand stream and get emitted by Tj
    nested = _one_page_pdf(
        b"BT /F1 10 Tf 10 20 Td (A) Tj ET"
        b" << /X << /Y 1 >> /S (B) >>"
        b" BT /F1 10 Tf 10 40 Td (C) Tj ET"
    )
    texts = [t for (_, _, _, _, t, _) in pdfx.extract_text_boxes(nested)]
    assert texts == ["A", "C"]
    # \8 / \9: backslash dropped, no octal ValueError
    esc = _one_page_pdf(rb"BT /F1 10 Tf 10 20 Td (foo\9bar\8baz\101) Tj ET")
    texts = [t for (_, _, _, _, t, _) in pdfx.extract_text_boxes(esc)]
    assert texts == ["foo9bar8bazA"]  # \101 octal = 'A'
    # inline images are skipped exactly (round 5), never garbage-tokenized:
    # the trailing text op still extracts (font state survives the image)
    bi = _one_page_pdf(
        b"BI /W 1 /H 1 ID \x00\x01\x02 EI BT /F1 10 Tf 5 6 Td (x) Tj ET"
    )
    texts = [t for (_, _, _, _, t, _) in pdfx.extract_text_boxes(bi)]
    assert texts == ["x"]


def test_pdf_codec_malformed_structures_raise_typed_errors():
    """Review findings: a cyclic /Kids page tree must raise ValueError (not
    RecursionError), and a non-numeric operand reaching a numeric operator
    must raise ValueError (not TypeError)."""
    from ai_service_ocr_grading_handler_spark.core import pdfx

    cyclic = (
        b"%PDF-1.4\n"
        b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
        b"2 0 obj\n<< /Type /Pages /Kids [2 0 R] /Count 1 >>\nendobj\n"
        b"trailer\n<< /Root 1 0 R >>\n%%EOF\n"
    )
    with pytest.raises(ValueError, match="cyclic"):
        pdfx.extract_text_boxes(cyclic)
    # array operand near Tf: `2 Tf` legitimately consumes the trailing
    # number, so either a clean parse or ValueError is fine — a TypeError
    # escaping would fail the test by propagation
    bad_ops = _one_page_pdf(b"BT /F [ (a) ] 2 Tf (x) Tj ET")
    try:
        pdfx.extract_text_boxes(bad_ops)
    except ValueError:
        pass
    # list reaching Td's numeric slot is the confirmed repro: it MUST
    # raise ValueError (review finding: the old try/except asserted
    # nothing if the parser silently accepted garbage)
    bad_td = _one_page_pdf(b"BT [ (a) ] 5 Td (x) Tj ET")
    with pytest.raises(ValueError):
        pdfx.extract_text_boxes(bad_td)


def test_spark_layout_byte_identity(spark):
    out = {
        r.doc_id: r.text
        for r in lx.extract_layout_docs(lx.layout_df_from_documents(spark, SF)).collect()
    }
    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    assert len(out) == len(docs)
    for d in docs:
        assert out[d.doc_id] == f"Section {d.doc_id}\n\n" + golden_text(d.text)


def test_corrupt_bytes_are_total():
    """One poisoned row must never kill a task: garbage, truncation, wrong
    magic, and empty input all yield the empty result."""
    good = _doc()[2]
    for blob in (b"", b"garbage", b"%PDF-1.7 real pdf bytes", good[: len(good) // 2], None):
        r = layout.extract_layout(blob)
        assert r.text == "" and r.n_boxes == 0


def test_layout_determinism_fuzz():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=200, deadline=None)
    @given(st.binary(max_size=300))
    def run(b):
        r1 = layout.extract_layout(b)
        r2 = layout.extract_layout(b)
        assert r1.text == r2.text and r1.n_boxes == r2.n_boxes

    run()


def test_xy_cut_handles_thousand_stacked_lines():
    """A dense page of vertically separated line boxes must not blow the
    recursion limit (1-vs-rest splits made the old recursive depth O(n);
    review finding)."""
    from ai_service_ocr_grading_handler_spark.core.layout import Box, _xy_cut

    boxes = [
        Box(0, 0.0, float(i * 20), 100.0, float(i * 20 + 10), 10, f"line {i}")
        for i in range(1500)
    ]
    ordered = _xy_cut(list(reversed(boxes)))
    assert [b.text for b in ordered] == [f"line {i}" for i in range(1500)]


def test_pdf_dag_page_tree_terminates_cycle_still_raises():
    """A shared subtree (DAG, malformed but terminating) re-emits its
    pages instead of misdiagnosing a cycle; a true cycle still raises
    (review finding)."""
    from ai_service_ocr_grading_handler_spark.core import pdfx

    import struct as _st
    import zlib as _z

    def chunkobj(num, body):
        return f"{num} 0 obj\n".encode() + body + b"\nendobj\n"

    content = b"4 0 obj\n<< /Length 30 >>\nstream\nBT /F1 9 Tf 5 10 Td (x) Tj ET\nendstream\nendobj\n"
    dag = (
        b"%PDF-1.4\n"
        + chunkobj(1, b"<< /Type /Catalog /Pages 2 0 R >>")
        + chunkobj(2, b"<< /Type /Pages /Kids [5 0 R 5 0 R] /Count 2 /MediaBox [0 0 100 100] >>")
        + chunkobj(5, b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>")
        + content
        + b"trailer\n<< /Root 1 0 R >>\n%%EOF\n"
    )
    boxes = pdfx.extract_text_boxes(dag)
    assert [b[0] for b in boxes] == [0, 1]  # page emitted twice, two page_nos
    cyclic = (
        b"%PDF-1.4\n"
        + chunkobj(1, b"<< /Type /Catalog /Pages 2 0 R >>")
        + chunkobj(2, b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>")
        + chunkobj(3, b"<< /Type /Pages /Kids [2 0 R] /Count 1 >>")
        + b"trailer\n<< /Root 1 0 R >>\n%%EOF\n"
    )
    with pytest.raises(ValueError, match="cyclic"):
        pdfx.extract_text_boxes(cyclic)


# --- round-4 filter breadth: ASCIIHex/ASCII85/LZW, predictors, ObjStm ---------


def test_lzw_decode_spec_vector():
    """The PDF 1.7 spec's own LZWDecode example (7.4.4.2): 9-bit codes
    256 45 258 258 65 259 66 257 packed as 80 0B 60 50 22 0C 0C 85 01
    decode to 45x5 65 45x3 66."""
    from ai_service_ocr_grading_handler_spark.core import pdfx

    encoded = bytes.fromhex("800B6050220C0C8501")
    assert pdfx._lzw_decode(encoded) == bytes([45] * 5 + [65] + [45] * 3 + [66])


def _filtered_one_page_pdf(stream: bytes, filter_entry: bytes) -> bytes:
    return (
        b"%PDF-1.4\n"
        b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
        b"2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1"
        b" /MediaBox [0 0 612 792] >>\nendobj\n"
        b"3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>\nendobj\n"
        + b"4 0 obj\n<< /Length " + str(len(stream)).encode()
        + b" " + filter_entry + b" >>\n"
        + b"stream\n" + stream + b"\nendstream\nendobj\n"
        + b"trailer\n<< /Root 1 0 R >>\n%%EOF\n"
    )


_FILTER_CONTENT = b"BT /F1 12 Tf 72 700 Td (filtered text) Tj ET\n"


def test_asciihex_ascii85_and_chained_filters():
    import base64
    import zlib as _z

    from ai_service_ocr_grading_handler_spark.core import pdfx

    expect = [(0, 72.0, 700.0, 12.0, "filtered text", 792.0)]
    hex_pdf = _filtered_one_page_pdf(
        _FILTER_CONTENT.hex().encode() + b">", b"/Filter /ASCIIHexDecode"
    )
    assert pdfx.extract_text_boxes(hex_pdf) == expect

    a85 = base64.a85encode(_FILTER_CONTENT, adobe=True)[2:]  # strip <~, keep ~>
    a85_pdf = _filtered_one_page_pdf(a85, b"/Filter /ASCII85Decode")
    assert pdfx.extract_text_boxes(a85_pdf) == expect

    # chain: decode order is array order — ASCII85 first, then Flate
    chained = base64.a85encode(_z.compress(_FILTER_CONTENT), adobe=True)[2:]
    chain_pdf = _filtered_one_page_pdf(
        chained, b"/Filter [/ASCII85Decode /FlateDecode]"
    )
    assert pdfx.extract_text_boxes(chain_pdf) == expect


def test_runlength_decode():
    from ai_service_ocr_grading_handler_spark.core import pdfx

    # literal run + repeat run + EOD
    assert pdfx._runlength_decode(b"\x02abc\xfeZ\x80tail") == b"abcZZZ"
    with pytest.raises(ValueError):
        pdfx._runlength_decode(b"\x05ab")  # truncated literal
    with pytest.raises(ValueError):
        pdfx._runlength_decode(b"\xfe")  # truncated repeat
    # end-to-end through a content stream
    content = _FILTER_CONTENT
    rle = bytearray()
    for i in range(0, len(content), 100):
        chunk_ = content[i : i + 100]
        rle.append(len(chunk_) - 1)
        rle += chunk_
    rle.append(128)
    pdf = _filtered_one_page_pdf(bytes(rle), b"/Filter /RunLengthDecode")
    assert [b[4] for b in pdfx.extract_text_boxes(pdf)] == ["filtered text"]


def test_flate_with_png_up_predictor():
    """A Flate stream with /Predictor 12 (PNG Up) and /Columns reconstructs
    — the encoding every xref stream in the wild uses."""
    import zlib as _z

    from ai_service_ocr_grading_handler_spark.core import pdfx

    cols = 16
    data = _FILTER_CONTENT + b" " * ((-len(_FILTER_CONTENT)) % cols)
    rows = [data[i : i + cols] for i in range(0, len(data), cols)]
    prev = bytes(cols)
    filtered = bytearray()
    for row in rows:
        filtered.append(2)  # Up
        filtered += bytes((c - p) & 0xFF for c, p in zip(row, prev))
        prev = row
    pdf = _filtered_one_page_pdf(
        _z.compress(bytes(filtered)),
        b"/Filter /FlateDecode /DecodeParms << /Predictor 12 /Columns 16 >>",
    )
    boxes = pdfx.extract_text_boxes(pdf)
    assert [b[4] for b in boxes] == ["filtered text"]


def test_object_stream_documents_parse():
    """PDF 1.5 layout: catalog/pages/page dicts packed into a /ObjStm, only
    the ObjStm and the content stream scannable at top level (what an
    xref-stream PDF looks like to an object scanner)."""
    import zlib as _z

    from ai_service_ocr_grading_handler_spark.core import pdfx

    inner = [
        (1, b"<< /Type /Catalog /Pages 2 0 R >>"),
        (2, b"<< /Type /Pages /Kids [3 0 R] /Count 1 /MediaBox [0 0 612 792] >>"),
        (3, b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>"),
    ]
    bodies = b""
    pairs = []
    for num, body in inner:
        pairs.append(f"{num} {len(bodies)}")
        bodies += body + b"\n"
    header = (" ".join(pairs) + "\n").encode()
    payload = _z.compress(header + bodies)
    objstm = (
        b"7 0 obj\n<< /Type /ObjStm /N 3 /First " + str(len(header)).encode()
        + b" /Length " + str(len(payload)).encode()
        + b" /Filter /FlateDecode >>\nstream\n" + payload + b"\nendstream\nendobj\n"
    )
    content = (
        b"4 0 obj\n<< /Length " + str(len(_FILTER_CONTENT)).encode() + b" >>\n"
        b"stream\n" + _FILTER_CONTENT + b"\nendstream\nendobj\n"
    )
    pdf = b"%PDF-1.5\n" + objstm + content + b"trailer\n<< /Root 1 0 R >>\n%%EOF\n"
    assert pdfx.extract_text_boxes(pdf) == [
        (0, 72.0, 700.0, 12.0, "filtered text", 792.0)
    ]


def test_new_filter_paths_fuzz_cleanly():
    """Garbage into the new decoders raises the codec's typed errors —
    never hangs, never escapes with an arbitrary exception."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from ai_service_ocr_grading_handler_spark.core import pdfx

    allowed = (ValueError, NotImplementedError)

    @settings(max_examples=150, deadline=None)
    @given(st.binary(max_size=300))
    def run(b):
        for fn in (
            pdfx._lzw_decode,
            pdfx._ascii85_decode,
            pdfx._asciihex_decode,
            lambda d: pdfx._png_predictor(d, 1, 8, 5),
            lambda d: pdfx._expand_object_streams(
                {7: b"<< /Type /ObjStm /N 2 /First 8 >>\nstream\n" + d + b"\nendstream"}
            ),
        ):
            try:
                fn(b)
            except allowed:
                pass
        # filtered-PDF wrapper path
        try:
            pdfx.extract_text_boxes(
                _filtered_one_page_pdf(b, b"/Filter [/ASCII85Decode /LZWDecode]")
            )
        except allowed:
            pass

    run()


def test_indirect_filter_refuses_not_silently_skips():
    """An unresolvable /Filter entry (e.g. indirect `/Filter 5 0 R`) must
    raise the typed error, not silently return compressed bytes to the
    interpreter (review finding: the filter-chain rewrite lost the old
    any-/Filter refusal)."""
    import zlib as _z

    from ai_service_ocr_grading_handler_spark.core import pdfx

    comp = _z.compress(_FILTER_CONTENT)
    pdf = _filtered_one_page_pdf(comp, b"/Filter 5 0 R")
    with pytest.raises(NotImplementedError):
        pdfx.extract_text_boxes(pdf)


def test_payload_bytes_cannot_spoof_stream_dict_keys():
    """Dict-key regexes must consult only the prefix BEFORE the `stream`
    keyword: raw payload bytes legally containing b'/Filter ...' or
    b'/Type /ObjStm' must neither trigger a bogus decode nor be expanded
    as an object stream (round-4 advice)."""
    from ai_service_ocr_grading_handler_spark.core import pdfx

    # a RAW content stream whose payload embeds both spoof strings
    payload = (
        b"BT /F1 12 Tf 72 700 Td (spoof safe) Tj ET\n"
        b"% /Filter /FlateDecode /DecodeParms << /Predictor 12 >>\n"
        b"% /Type /ObjStm /N 99 /First 8\n"
    )
    pdf = _filtered_one_page_pdf(payload, b"")
    assert pdfx.extract_text_boxes(pdf) == [
        (0, 72.0, 700.0, 12.0, "spoof safe", 792.0)
    ]
    # decode_stream directly: the body's dict has no /Filter; the payload
    # mention must not raise the unresolvable-/Filter refusal
    body = b"<< /Length 9 >>\nstream\n/Filter /LZWDecode\nendstream"
    m = pdfx._STREAM_RE.search(body)
    assert pdfx.decode_stream(body, m.group(1)) == m.group(1)


def test_runlength_missing_eod_is_truncation():
    from ai_service_ocr_grading_handler_spark.core import pdfx

    with pytest.raises(ValueError, match="EOD"):
        pdfx._runlength_decode(b"\x02abc")  # valid run, no EOD byte


def test_expanding_filters_are_bomb_bounded(monkeypatch):
    """LZW table-growth and Flate expansion are capped BEFORE allocation
    (same policy as pngx) — a crafted stream raises ValueError instead of
    attempting a multi-GB buffer."""
    import zlib as _z

    from ai_service_ocr_grading_handler_spark.core import pdfx

    monkeypatch.setattr(pdfx, "_MAX_STREAM_BYTES", 10_000)
    with pytest.raises(ValueError, match="bound"):
        pdfx._bounded_inflate(_z.compress(b"\x00" * 20_000))
    # LZW bomb: after 256(clear) + one literal, repeatedly emitting
    # code == next_code grows each table entry by one byte — quadratic
    # output from linear input
    codes = [256, 65] + [258 + i for i in range(400)]
    acc = 0
    nbits = 0
    width = 9
    out = bytearray()
    table_len = 258
    for c in codes:
        acc = (acc << width) | c
        nbits += width
        while nbits >= 8:
            out.append((acc >> (nbits - 8)) & 0xFF)
            nbits -= 8
        if c != 256:
            table_len += 1 if c != 65 else 0
        if c == 65:
            table_len = 258  # first code after clear adds nothing
        if table_len + 1 >= (1 << width) and width < 12:
            width += 1
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    with pytest.raises(ValueError, match="bound|bomb"):
        pdfx._lzw_decode(bytes(out))


def test_inline_images_are_skipped_exactly():
    """BI..EI inline images (PDF 32000-1 §8.9.7) must be stepped over,
    not refused (pre-round-5) and not garbage-tokenized. Three length
    resolutions: computed from /W /H /BPC /CS for unfiltered data (exact
    even when the payload embeds ' EI '), /L for filtered data (exact),
    and the whitespace-delimited EI scan when no length is derivable."""
    from ai_service_ocr_grading_handler_spark.core import pdfx

    expect = [(0, 10.0, 20.0, 9.0, "after", 792.0)]
    tail = b" BT /F1 9 Tf 10 20 Td (after) Tj ET"
    # computed length: 2x2 gray 8bpc = 4 bytes, deliberately ' EI '
    computed = b"BI /W 2 /H 2 /BPC 8 /CS /G ID \x20EI\x20Q" + tail
    assert pdfx.extract_text_boxes(_filtered_one_page_pdf(computed, b"")) == expect
    # /L exact over filtered data embedding a fake ' EI '
    exact = b"BI /W 1 /H 1 /F /AHx /L 6 ID \nAB EI>\nEI" + tail
    assert pdfx.extract_text_boxes(_filtered_one_page_pdf(exact, b"")) == expect
    # no length derivable (filtered, no /L): EI scan
    scanned = b"BI /W 1 /H 1 /F /Fl ID \x78\x9c\x03\x00\x00\x01 EI" + tail
    assert pdfx.extract_text_boxes(_filtered_one_page_pdf(scanned, b"")) == expect
    # full-name keys + 1-bit image mask (/IM: 1 channel x 1 bit,
    # row-padded). The 6 mask bytes deliberately EMBED ' EI ' — only the
    # computed-length path skips this exactly; the heuristic scan would
    # stop mid-payload and garbage-tokenize the rest (review finding:
    # boolean keyword tokens were stored as None, deadening this path)
    mask = (
        b"BI /Width 24 /Height 2 /ImageMask true ID "
        # 3 bytes/row x 2 rows; ' EI ' inside, then an unbalanced '(' so
        # a mis-skip that resumes mid-payload swallows the tail as an
        # unterminated literal string and provably loses the text
        + b"\x20EI\x20(b"
        + b" EI" + tail
    )
    assert pdfx.extract_text_boxes(_filtered_one_page_pdf(mask, b"")) == expect
    # CRLF after ID (real-writer form; spec says one whitespace byte)
    crlf = b"BI /W 1 /H 1 /BPC 8 /CS /G ID\r\n\xffEI" + tail
    # data byte is 0xff; terminator scan confirms the computed end
    assert pdfx.extract_text_boxes(_filtered_one_page_pdf(crlf, b"")) == expect


def test_inline_image_truncation_is_typed():
    """A BI with no EI terminator is data truncation -> ValueError (the
    codec error contract), never a hang or a garbage parse."""
    import pytest as _pytest

    from ai_service_ocr_grading_handler_spark.core import pdfx

    with _pytest.raises(ValueError):
        pdfx.extract_text_boxes(
            _filtered_one_page_pdf(b"BI /W 2 /H 2 ID \xff\xff", b"")
        )
