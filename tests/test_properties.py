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


def test_locale_independent_decode():
    """Reference runs a locale matrix (tests/test_locale_safety.py:125-523:
    decimal-comma locales corrupt naive float parsing). Our tokenizer uses
    locale-independent parsing; verify under a comma-decimal locale when the
    host provides one."""
    import locale

    from docling_parse_spark.corpus import generate_corpus
    from docling_parse_spark.document import decode_document

    doc = generate_corpus(3, seed=11)[1]
    before = decode_document(doc["doc_id"], doc["spans"])
    set_ok = False
    for loc in ("de_DE.UTF-8", "de_DE.utf8", "fr_FR.UTF-8", "German"):
        try:
            locale.setlocale(locale.LC_NUMERIC, loc)
            set_ok = True
            break
        except locale.Error:
            continue
    try:
        after = decode_document(doc["doc_id"], doc["spans"])
    finally:
        locale.setlocale(locale.LC_NUMERIC, "C")
    if not set_ok:
        import pytest

        pytest.skip("no decimal-comma locale available in this container")
    assert after == before


@given(st.binary(max_size=64))
@settings(max_examples=200, deadline=None)
def test_cmap_segment_total(raw):
    """CJK codespace segmentation consumes every input byte exactly once and
    never raises, for arbitrary byte strings (Shift-JIS codespaces)."""
    from docling_parse_spark.pdf.resources_data import cmap_segment, predefined_cmap

    pm = predefined_cmap("90ms-RKSJ-H")
    segs = cmap_segment(raw, pm["codespaces"])
    assert sum(nb for _c, nb in segs) == len(raw)
    for code, nb in segs:
        assert 0 <= code < (1 << (8 * nb))
