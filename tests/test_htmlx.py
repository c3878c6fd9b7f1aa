"""Pure-Python extraction-core tests: byte-identity, spans, edge semantics."""

from __future__ import annotations

import duckdb

from ai_service_ocr_grading_handler_spark.core.htmlx import classify_blocks, extract_doc, normalize_ws, segment_blocks
from ai_service_ocr_grading_handler_spark.corpus import (
    DUCKDB_GOLDEN_TEXT_EXPR,
    fixture_pages,
    golden_text,
    pages_rows_from_documents,
    synth_html,
)

SF = "/root/testdata/sf0.001"


def _doc_rows():
    return duckdb.sql(
        f"select doc_id, text, lang, source from read_parquet('{SF}/documents.parquet')"
    ).df().to_dict("records")


def test_byte_identity_documents_corpus():
    rows = list(pages_rows_from_documents(iter(_doc_rows())))
    assert len(rows) > 0
    for row in rows:
        assert extract_doc(row["html"]).text == row["text"], row["url"]


def test_byte_identity_fixture_corpus():
    for row in fixture_pages():
        assert extract_doc(row["html"]).text == row["text"], row["url"]


def test_empty_doc_extracts_empty():
    row = next(r for r in fixture_pages() if r["url"].endswith("/empty"))
    r = extract_doc(row["html"])
    assert r.text == ""
    assert r.spans == []


def test_none_and_garbage_input():
    assert extract_doc(None).text == ""
    assert extract_doc(b"").text == ""
    # non-html bytes: everything is one unclassified text run, long enough -> content
    r = extract_doc(("word " * 40).strip().encode())
    assert r.text == ("word " * 40).strip()
    # invalid utf-8 must not raise
    extract_doc(b"\xff\xfe<p>hi</p>")


def test_spans_point_into_source():
    rows = list(pages_rows_from_documents(iter(_doc_rows()[:20])))
    for row in rows:
        html_text = row["html"].decode("utf-8")
        r = extract_doc(row["html"])
        assert len(r.spans) == len([b for b in r.blocks if b.is_content])
        for start, end, block_id in r.spans:
            assert 0 <= start < end <= len(html_text)
            blk = r.blocks[block_id]
            # normalized source slice contains the block text (escaping aside)
            assert normalize_ws(html_text[start:end]) != "" and blk.is_content


def test_golden_text_matches_duckdb_expr():
    expr = DUCKDB_GOLDEN_TEXT_EXPR.format(col="text")
    sql = f"select text, {expr} as g from read_parquet('{SF}/documents.parquet')"
    for text, g in duckdb.sql(sql).fetchall():
        assert g == golden_text(text)


def test_boilerplate_is_rejected():
    # a page with ONLY boilerplate extracts to ''
    html = synth_html([], "only-boiler")
    assert extract_doc(html).text == ""


def test_script_style_comments_ignored():
    html = (
        b"<html><body><script>var x = '<p>fake</p>';</script>"
        b"<style>p{color:red}</style><!-- <p>ghost</p> -->"
        b"<article><p>real content that is part of the article body</p></article>"
        b"</body></html>"
    )
    assert extract_doc(html).text == "real content that is part of the article body"


def test_entity_unescape_roundtrip():
    para = 'Tom & Jerry say 2 < 3 and "quotes" survive'
    html = synth_html([para], "entities")
    assert extract_doc(html).text == para


def test_link_density_classifier():
    # a block outside article/main dominated by links is boilerplate
    html = (
        b"<html><body><div>"
        b'<a href="/a">click here now</a> <a href="/b">more links here</a> ok</div>'
        b"<div>"
        + ("meaningful prose " * 10).strip().encode()
        + b"</div></body></html>"
    )
    r = extract_doc(html)
    assert r.text == ("meaningful prose " * 10).strip()


def test_segment_blocks_inline_tags_do_not_split():
    blocks = [
        b
        for b in segment_blocks("<body><p>Hel<b>lo</b> wor<i>ld</i></p></body>")
        if b.text
    ]
    assert len(blocks) == 1
    assert blocks[0].text == "Hello world"


def test_block_confidence_scores():
    """Per-block confidence (north star): confident about long link-free
    content in <article>, confident about nav furniture, less sure about
    short smoothing-rescued blocks."""
    from ai_service_ocr_grading_handler_spark.core.htmlx import extract_doc

    long_p = ("strong signal content paragraph with plenty of words to be "
              "sure about it and then some more to pass every threshold set")
    html = (
        f"<body><nav><a href='/'>home</a> <a href='/s'>shop</a></nav>"
        f"<article><p>{long_p}</p><p>Short bridge here.</p><p>{long_p}</p></article>"
        f"</body>"
    ).encode()
    blocks = extract_doc(html).blocks
    by_text = {b.text[:12]: b for b in blocks}
    assert all(0.0 <= b.confidence <= 1.0 for b in blocks)
    long_b = by_text["strong signa"]
    bridge = by_text["Short bridge"]
    nav = by_text["home shop"] if "home shop" in by_text else next(
        b for b in blocks if not b.is_content
    )
    assert long_b.is_content and long_b.confidence > 0.85
    assert bridge.is_content and bridge.confidence < long_b.confidence
    assert not nav.is_content and nav.confidence > 0.8


def test_unclosed_anchor_does_not_poison_following_blocks():
    """An unclosed <a> early in a page must not mark the rest of the
    document as anchor text (link_density 1.0 -> everything boilerplate;
    review finding). Anchor state resets at non-void block boundaries;
    <br> keeps anchor scope."""
    body = " ".join(f"word{i}" for i in range(40))
    html = (
        "<html><body>"
        "<div><a href='/x'>Home</div>"  # unclosed anchor
        f"<p>{body}</p>"
        "</body></html>"
    ).encode()
    r = extract_doc(html)
    assert body in r.text  # the long paragraph survives as content
    # and a legitimate line-broken anchor still counts fully as anchor text
    html2 = b"<p><a href='/y'>line one<br>line two</a></p>"
    blocks = classify_blocks(segment_blocks(html2.decode()))
    joined = [b for b in blocks if "line" in b.text]
    assert joined and all(b.link_density > 0.9 for b in joined)


def test_charset_sniffing():
    """Encoding declarations are honored (BOM > meta charset > utf-8
    default), and undeclared documents decode exactly as before."""
    from ai_service_ocr_grading_handler_spark.core.htmlx import decode_html, extract_doc

    body = "café résumé naïve " * 10
    html = f'<html><head><meta charset="iso-8859-1"></head><body><p>{body}</p></body></html>'
    latin = html.encode("iso-8859-1")
    assert "café résumé" in extract_doc(latin).text
    # same bytes WITHOUT the declaration mangle into replacement chars
    undeclared = html.replace('<meta charset="iso-8859-1">', "").encode("iso-8859-1")
    assert "caf�" in extract_doc(undeclared).text
    # http-equiv spelling
    he = (
        '<html><head><meta http-equiv="Content-Type" content="text/html;'
        f' charset=windows-1252"></head><body><p>{body}</p></body></html>'
    ).encode("cp1252")
    assert "café résumé" in extract_doc(he).text
    # BOMs win
    assert decode_html("﻿hé".encode("utf-8"))[0:2] == "hé"
    assert decode_html(b"\xff\xfe" + "hé".encode("utf-16-le")) == "hé"
    assert decode_html(b"\xfe\xff" + "hé".encode("utf-16-be")) == "hé"
    # unknown declared label falls back to utf-8-replace, never raises
    junk = b'<meta charset="no-such-enc"><p>plain ascii</p>'
    assert "plain ascii" in decode_html(junk)
    # meta-declared utf-16 is treated as utf-8 per WHATWG: the bytes
    # matched an ASCII regex, so they cannot actually be utf-16 — and the
    # guard must survive Python-only aliases (utf_16, u16, utf_16_le)
    # the codec lookup also accepts (review finding)
    for label in ("utf-16", "utf_16", "u16", "utf_16_le", "utf-16be", "unicode"):
        lying = f'<meta charset="{label}"><p>ascii-compatible body</p>'.encode()
        assert "ascii-compatible body" in decode_html(lying), label
    # utf-8 declared = fast path, identical to default
    u8 = f'<meta charset="utf-8"><p>{body}</p>'.encode()
    assert extract_doc(u8).text == extract_doc(u8.replace(b'<meta charset="utf-8">', b"")).text
