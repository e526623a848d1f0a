"""Annotation branch: hyperlinks, widgets, AP appearance-stream sub-decode —
the analog of the reference's decode_annots stage (page.h:1158-1753)."""

import json

from docling_parse_spark.document import decode_document


FONT = json.dumps({"font_key": "F1", "base_font": "Helvetica", "subtype": "Type1",
                   "encoding": "WinAnsiEncoding", "first_char": 32, "widths": [500.0] * 95})


def doc_with_annots():
    return [
        {"kind": "pdf_font", "text": FONT, "media_ref": None, "offset": 0},
        {"kind": "pdf_ops", "text": "BT /F1 12 Tf 72 700 Td (Body text) Tj ET",
         "media_ref": None, "offset": 1},
        {"kind": "pdf_annot", "media_ref": None, "offset": 2,
         "text": json.dumps({"page": 0, "subtype": "link", "rect": [72, 60, 200, 75],
                             "uri": "https://example.com/x"})},
        {"kind": "pdf_annot", "media_ref": None, "offset": 3,
         "text": json.dumps({"page": 0, "subtype": "widget", "rect": [72, 40, 220, 55],
                             "field": "name_field",
                             "ap_ops": "BT /F1 9 Tf 2 3 Td (John Doe) Tj ET"})},
    ]


def test_annots_decode_after_content():
    out = decode_document("d1", doc_with_annots())
    seq = [(s["kind"], s["text"], s["media_ref"]) for s in out]
    assert seq == [
        ("text", "Body", None),
        ("text", "text", None),
        ("hyperlink", None, "https://example.com/x"),
        ("widget", "name_field", None),
        ("widget_text", "John", None),
        ("widget_text", "Doe", None),
    ]
    assert [s["offset"] for s in out] == list(range(6))


def test_link_without_uri_dropped():
    spans = doc_with_annots()[:3]
    spans[2]["text"] = json.dumps({"page": 0, "subtype": "link", "rect": [0, 0, 1, 1]})
    out = decode_document("d2", spans)
    assert all(s["kind"] != "hyperlink" for s in out)


def test_annot_on_second_page_stays_there():
    spans = [
        {"kind": "pdf_font", "text": FONT, "media_ref": None, "offset": 0},
        {"kind": "pdf_ops", "text": "BT /F1 12 Tf 72 700 Td (PageOne) Tj ET",
         "media_ref": None, "offset": 1},
        {"kind": "pdf_ops", "text": "BT /F1 12 Tf 72 700 Td (PageTwo) Tj ET",
         "media_ref": None, "offset": 2},
        {"kind": "pdf_annot", "media_ref": None, "offset": 3,
         "text": json.dumps({"page": 1, "subtype": "link", "uri": "u://2"})},
    ]
    out = decode_document("d3", spans)
    kinds_texts = [(s["kind"], s["text"]) for s in out]
    assert kinds_texts == [("text", "PageOne"), ("text", "PageTwo"), ("hyperlink", None)]
    assert out[2]["media_ref"] == "u://2"


def test_ap_font_fallback_chain():
    """AP streams resolve fonts through ap_fonts -> AcroForm /DR -> page
    fonts (reference page.h:1653-1663)."""
    import json

    from docling_parse_spark.corpus import FONT_HELV, FONT_TIMES
    from docling_parse_spark.document import decode_document

    dr = dict(FONT_TIMES)
    dr["font_key"] = "FD"
    own = dict(FONT_HELV)
    own["font_key"] = "FA"
    spans = [
        {"kind": "pdf_font", "text": json.dumps(FONT_HELV), "media_ref": None, "offset": 0},
        {"kind": "pdf_acroform_dr", "text": json.dumps([dr]), "media_ref": None, "offset": 1},
        {"kind": "pdf_ops", "text": "BT /F1 10 Tf 72 700 Td (body) Tj ET",
         "media_ref": None, "offset": 2},
        {"kind": "pdf_annot",
         "text": json.dumps({"page": 0, "subtype": "widget", "field": "f1",
                             "rect": [0, 0, 10, 10],
                             "ap_ops": "BT /FD 9 Tf 1 1 Td (fromdr) Tj ET"}),
         "media_ref": None, "offset": 3},
        {"kind": "pdf_annot",
         "text": json.dumps({"page": 0, "subtype": "widget", "field": "f2",
                             "rect": [0, 0, 10, 10],
                             "ap_fonts": [json.dumps(own)],
                             "ap_ops": "BT /FA 9 Tf 1 1 Td (fromown) Tj ET"}),
         "media_ref": None, "offset": 4},
    ]
    out = decode_document("d", spans)
    texts = [s["text"] for s in out]
    assert "fromdr" in texts   # resolved via AcroForm /DR
    assert "fromown" in texts  # resolved via the AP's own resources
