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


def _has_pypdf() -> bool:
    try:
        import pypdf  # noqa: F401

        return True
    except ImportError:
        return False


@pytest.mark.skipif(_has_pypdf(), reason="pypdf present: real-parse branch applies")
def test_pdf_codec_guards_when_no_parser():
    with pytest.raises(NotImplementedError):
        layout.parse_pdf_bytes(b"%PDF-1.7 fake")


@pytest.mark.skipif(not _has_pypdf(), reason="no PDF parser in this runtime")
def test_pdf_codec_real_when_parser_present():
    """Build a minimal one-page PDF with pypdf itself, then parse it back
    into positioned boxes feeding the same XY-cut kernel."""
    import io

    from pypdf import PdfWriter

    w = PdfWriter()
    w.add_blank_page(width=200, height=300)
    buf = io.BytesIO()
    w.write(buf)
    boxes = layout.parse_pdf_bytes(buf.getvalue())
    assert boxes == []  # blank page: no text boxes, but parse succeeds


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
