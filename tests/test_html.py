"""HTML boilerplate-stripping tests: density heuristics, structure handling."""

from docling_parse_spark.web.boilerplate import (
    classify_blocks,
    extract_html_spans,
    segment_blocks,
)

PAGE = """
<html><head><title>A Study Of Span Extraction</title>
<style>p{color:red}</style></head><body>
<nav><a href="/">Home</a> <a href="/a">About</a> <a href="/b">Blog</a></nav>
<header><h1>Span Extraction At Scale</h1></header>
<main><article>
<p>This is the main content paragraph with plenty of meaningful words inside it.</p>
<img src="doc-x/img0.png">
<p>Another substantial paragraph that carries the actual information of the page
and even mentions <a href="/ref">one reference</a> among many words.</p>
</article></main>
<aside><ul><li><a href="/t/x">x</a></li><li><a href="/t/y">y</a></li></ul></aside>
<footer>© 2026 Example · <a href="/">Home</a> <a href="/a">About</a></footer>
<script>var boilerplate = true;</script>
</body></html>
"""


def test_nav_footer_aside_stripped():
    spans = extract_html_spans(PAGE)
    texts = [t for k, t, _ in spans if k == "text"]
    joined = " ".join(texts)
    assert "Home" not in joined
    assert "©" not in joined
    assert "boilerplate" not in joined  # script never leaks


def test_main_content_kept_in_order():
    spans = extract_html_spans(PAGE)
    assert spans[0][0] == "text"
    kinds = [k for k, _, _ in spans]
    assert kinds.count("media") == 1
    texts = [t for k, t, _ in spans if k == "text"]
    assert any(t.startswith("This is the main content") for t in texts)
    # image sits between the two paragraphs
    i_img = kinds.index("media")
    assert 0 < i_img < len(spans) - 1


def test_heading_kept_when_content_follows():
    spans = extract_html_spans(PAGE)
    texts = [t for k, t, _ in spans if k == "text"]
    assert "Span Extraction At Scale" not in texts  # inside <header> container
    html2 = "<h2>Short Title</h2><p>" + "word " * 30 + "</p>"
    texts2 = [t for k, t, _ in extract_html_spans(html2) if k == "text"]
    assert texts2[0] == "Short Title"


def test_link_farm_rejected():
    farm = "<p>" + " ".join(f'<a href="/{i}">link {i} here now</a>' for i in range(20)) + "</p>"
    assert extract_html_spans(farm) == []


def test_short_fragments_rejected():
    assert extract_html_spans("<p>too short</p>") == []


def test_link_density_computation():
    html = '<p>many plain words surround the single <a href="/x">link</a> in this block</p>'
    b = segment_blocks(html)[0]
    assert 0.0 < b.link_density < 0.33
    assert classify_blocks([b]) == [True]


def test_malformed_html_survives():
    spans = extract_html_spans("<p>unclosed paragraph with lots of meaningful words going on and on")
    assert len(spans) == 1


def test_empty():
    assert extract_html_spans("") == []


def test_inter_element_whitespace_preserved():
    """Round-4 review: a whitespace-only text node between inline elements
    is a word separator, not droppable."""
    from docling_parse_spark.web.boilerplate import extract_html_spans

    out = extract_html_spans(
        "<p>fine <i>one</i> <i>two</i> and some more words here to pass filter</p>"
    )
    assert out == [("text", "fine one two and some more words here to pass filter", None)]
    # leading whitespace nodes still never open empty blocks
    assert extract_html_spans("  \n  <p>short</p>") == []


def test_captioned_figure_between_paragraphs_keeps_image():
    """Round-4 review: a figcaption with a short caption must keep its
    image when flanked by kept paragraphs, like a bare <img> does."""
    from docling_parse_spark.web.boilerplate import extract_html_spans

    html = ("<p>one long kept paragraph with plenty of words in it here</p>"
            '<figcaption>Fig 1 <img src="f.png"></figcaption>'
            "<p>another long kept paragraph with plenty of words here too</p>")
    out = extract_html_spans(html)
    assert ("media", None, "f.png") in out
    assert ("text", "Fig 1", None) in out
