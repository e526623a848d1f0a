"""Failure handling: corrupt payloads are contained per unit and counted —
the analog of the reference's corrupt-document tests (tests/test_load_failure.py)."""

import json

from docling_parse_spark.corpus import corpus_to_spark_rows, generate_corpus
from docling_parse_spark.extract import extract_spans
from docling_parse_spark.schemas import SPANS_TABLE_SCHEMA


def test_corrupt_font_counted_not_fatal(spark):
    corpus = generate_corpus(10, seed=13)
    corpus.append({
        "doc_id": "doc-corrupt",
        "spans": [
            {"kind": "pdf_font", "text": '{"font_key": "F1", "widths": "NOT-A-LIST"}',
             "media_ref": None, "offset": 0},
            {"kind": "pdf_ops", "text": "BT /F1 10 Tf (x) Tj ET", "media_ref": None, "offset": 1},
        ],
    })
    docs = spark.createDataFrame(corpus_to_spark_rows(corpus), schema=SPANS_TABLE_SCHEMA)
    spans, metrics = extract_spans(docs, num_partitions=4, with_metrics=True)
    rows = {r["doc_id"]: r["spans"] for r in spans.collect()}
    # corrupt doc is present with an empty span array; others unaffected
    assert rows["doc-corrupt"] == []
    assert len(rows) == 11
    assert sum(len(v) for v in rows.values()) > 0
    m = metrics.agg({"decode_failures": "sum"}).collect()[0][0]
    assert m == 1


def test_emit_shapes_spans():
    from docling_parse_spark.pdf.page import DecodeConfig, build_fonts, decode_page

    font = json.dumps({"font_key": "F1", "base_font": "Helvetica", "subtype": "Type1",
                       "encoding": "WinAnsiEncoding", "first_char": 32, "widths": [500.0] * 95})
    src = b"0 0 1 rg 10 10 100 4 re f BT /F1 10 Tf 72 700 Td (t) Tj ET"
    res = decode_page(src, build_fonts([font]), config=DecodeConfig(emit_shapes=True))
    kinds = [k for k, _, _ in res.spans]
    assert "shape" in kinds and "text" in kinds
    # default config omits shapes (parity with the reference's span output)
    res2 = decode_page(src, build_fonts([font]))
    assert all(k != "shape" for k, _, _ in res2.spans)


def test_shape_span_descriptor():
    """Shape spans carry a geometry descriptor (bbox/stroked/filled) when
    emit_shapes is on — reference serializes full shape records."""
    from docling_parse_spark.pdf.page import DecodeConfig, build_fonts, decode_page

    font = json.dumps({"font_key": "F1", "base_font": "Helvetica", "subtype": "Type1",
                       "encoding": "WinAnsiEncoding", "first_char": 32, "widths": [500.0] * 95})
    src = b"0 0 1 rg 10 10 100 4 re f"
    res = decode_page(src, build_fonts([font]), config=DecodeConfig(emit_shapes=True))
    shapes = [(k, t) for k, t, _ in res.spans if k == "shape"]
    assert len(shapes) == 1
    d = json.loads(shapes[0][1])
    assert d["bbox"] == [10.0, 10.0, 110.0, 14.0]
    assert d["filled"] and not d["stroked"]
    assert d["n_points"] >= 4
