"""Hand-verified extraction on diverse realistic layouts — guards against
the classifier overfitting the synthetic corpus's one page shape."""

from __future__ import annotations

from ai_service_ocr_grading_handler_spark.core.htmlx import extract_doc

LONG = (
    "This is a long enough paragraph of body text that the word count "
    "threshold for content classification is comfortably exceeded by it."
)
LONG2 = (
    "A second long paragraph continues the article with more than enough "
    "words to stand on its own as main content for the classifier."
)


def _text(html: str) -> str:
    return extract_doc(html.encode()).text


def test_inline_formatting_does_not_split_blocks():
    html = f"<body><p>{LONG[:60]} <b>bold</b> <i>italic</i> <span>span</span> {LONG[60:]}</p></body>"
    out = _text(html)
    assert out.count("\n\n") == 0  # one block
    assert "bold" in out and "italic" in out and "span" in out


def test_entities_unescaped_in_content():
    html = f"<body><p>{LONG} Fish &amp; chips cost &#163;5 &lt;always&gt;.</p></body>"
    out = _text(html)
    assert "Fish & chips cost £5 <always>." in out


def test_table_of_data_with_article():
    rows = "".join(f"<tr><td>cell {i}</td><td>{i*7}</td></tr>" for i in range(8))
    html = f"<body><article><p>{LONG}</p></article><table>{rows}</table></body>"
    out = _text(html)
    assert LONG in out
    assert "cell 3" not in out  # short table cells are not main content


def test_nav_list_rejected_even_without_nav_tag():
    items = "".join(
        f'<li><a href="/{w}">{w}</a></li>' for w in ["home", "shop", "blog", "about", "contact"]
    )
    html = f"<body><ul>{items}</ul><p>{LONG}</p></body>"
    out = _text(html)
    assert out == LONG


def test_multi_paragraph_article_with_short_connector():
    # the short connector between two long content paragraphs is rescued by
    # neighbor smoothing (Boilerpipe-style)
    html = f"<body><p>{LONG}</p><p>However, despite that.</p><p>{LONG2}</p></body>"
    out = _text(html)
    assert out == f"{LONG}\n\nHowever, despite that.\n\n{LONG2}"


def test_comments_cdata_doctype_ignored():
    html = (
        f"<!DOCTYPE html><!-- top comment --><body><![CDATA[junk]]>"
        f"<p>{LONG}</p><!-- <p>commented out</p> --></body>"
    )
    out = _text(html)
    assert out == LONG
    assert "commented out" not in out


def test_footer_legal_text_long_and_linkfree_is_kept():
    legal = (
        "Copyright notice and license terms continue for many words here "
        "describing rights obligations warranties disclaimers and liability "
        "limitations in one long link free passage of more than fifty words "
        "total so the footer exemption rule for substantial legal text fires "
        "and keeps this passage classified as content despite its location."
    )
    html = f"<body><p>{LONG}</p><footer><p>{legal}</p></footer></body>"
    assert legal in _text(html)


def test_blockquote_inside_article_kept():
    quote = "Quoted words from a source, short but inside the article body."
    html = f"<body><article><p>{LONG}</p><blockquote>{quote}</blockquote></article></body>"
    out = _text(html)
    assert quote in out


def test_duplicate_page_chrome_across_sections():
    html = (
        f"<body><header><h1>Site</h1></header><main><p>{LONG}</p></main>"
        f'<aside><a href="/x">related</a> <a href="/y">links</a></aside>'
        f"<footer><a href='/'>home</a></footer></body>"
    )
    assert _text(html) == LONG
