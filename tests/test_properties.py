"""Property-based robustness: the kernels must never crash on arbitrary
input and must be deterministic — a distributed decode retries tasks, so
nondeterminism or crashes would break exactly-once span semantics."""

import json

from hypothesis import given, settings, strategies as st

from docling_parse_spark.document import decode_document
from docling_parse_spark.web.boilerplate import extract_html_spans
from docling_parse_spark.pdf.fonts import font_from_json, parse_cmap
from docling_parse_spark.pdf.page import build_fonts, decode_page
from docling_parse_spark.pdf.tokenizer import tokenize

FONT = json.dumps({"font_key": "F1", "base_font": "Helvetica", "subtype": "Type1",
                   "encoding": "WinAnsiEncoding", "first_char": 32, "widths": [500.0] * 95})


@given(st.binary(max_size=512))
@settings(max_examples=300, deadline=None)
def test_tokenizer_never_crashes(data):
    ins = tokenize(data)
    assert isinstance(ins, list)
    for op, args in ins:
        assert isinstance(op, str)


@given(st.binary(max_size=256))
@settings(max_examples=150, deadline=None)
def test_decode_page_never_crashes_never_nondeterministic(data):
    fonts = build_fonts([FONT])
    r1 = decode_page(data, fonts)
    r2 = decode_page(data, fonts)
    assert r1.spans == r2.spans
    assert not r1.failed or r1.error


@given(st.text(max_size=400))
@settings(max_examples=150, deadline=None)
def test_html_extractor_never_crashes(html):
    spans = extract_html_spans(html)
    for kind, text, ref in spans:
        assert kind in ("text", "media")


@given(st.text(alphabet="0123456789abcdefABCDEF<> \nbeginbfcharrange", max_size=300))
@settings(max_examples=100, deadline=None)
def test_cmap_parser_never_crashes(text):
    mapping, lengths = parse_cmap(text)
    assert isinstance(mapping, dict)


@given(st.dictionaries(
    st.sampled_from(["font_key", "base_font", "subtype", "encoding", "first_char", "dw"]),
    st.one_of(st.text(max_size=10), st.integers(-5, 300)),
))
@settings(max_examples=100, deadline=None)
def test_font_from_json_tolerates_odd_descriptors(d):
    # descriptor fields of wrong-but-JSON types must not break decode
    d.setdefault("font_key", "F1")
    try:
        f = font_from_json(json.dumps(d))
    except (ValueError, TypeError):
        return  # rejecting is fine; crashing elsewhere is not
    f.get_string(65)
    f.get_width(65)


@given(st.lists(st.tuples(
    st.sampled_from(["pdf_ops", "pdf_font", "html", "media", "pdf_page", "junk"]),
    st.text(max_size=60),
), max_size=8))
@settings(max_examples=100, deadline=None)
def test_decode_document_arbitrary_span_mix(items):
    spans = [
        {"kind": k, "text": t, "media_ref": None, "offset": i}
        for i, (k, t) in enumerate(items)
    ]
    out = decode_document("doc-x", spans)
    assert [s["offset"] for s in out] == list(range(len(out)))
