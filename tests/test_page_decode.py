"""End-to-end single-page decode: content stream -> ordered spans."""

import json

from docling_parse_spark.pdf.page import DecodeConfig, build_fonts, decode_page, parse_page_descriptor


FONT = json.dumps({
    "font_key": "F1", "base_font": "Helvetica", "subtype": "Type1",
    "encoding": "WinAnsiEncoding", "first_char": 32, "widths": [500.0] * 95,
})


def test_text_and_media_interleaved_in_stream_order():
    fonts = build_fonts([FONT])
    src = (b"BT /F1 12 Tf 72 720 Td (Before image) Tj ET "
           b"q 200 0 0 100 72 500 cm /Im1 Do Q "
           b"BT /F1 12 Tf 72 400 Td (After image) Tj ET")
    res = decode_page(src, fonts, images={"Im1": "img-0"})
    assert not res.failed
    assert res.spans == [
        ("text", "Before", None),
        ("text", "image", None),
        ("media", None, "img-0"),
        ("text", "After", None),
        ("text", "image", None),
    ]


def test_line_unit():
    fonts = build_fonts([FONT])
    src = b"BT /F1 12 Tf 72 720 Td (Hello world) Tj 0 -14 Td (Second line) Tj ET"
    res = decode_page(src, fonts, config=DecodeConfig(output_unit="line"))
    assert [s[1] for s in res.spans] == ["Hello world", "Second line"]


def test_rotation_page():
    fonts = build_fonts([FONT])
    desc = parse_page_descriptor(json.dumps({"media_box": [0, 0, 612, 792], "rotate": 90}))
    res = decode_page(b"BT /F1 12 Tf 72 720 Td (Rot) Tj ET", fonts, page_desc=desc)
    assert [s[1] for s in res.spans] == ["Rot"]


def test_failure_captured():
    # tokenizer/interpreter survive garbage; force failure with a non-bytes type
    res = decode_page(12345, {})  # type: ignore[arg-type]
    assert res.failed and res.error


def test_crop_box_translation():
    import math

    fonts = build_fonts([FONT])
    desc = parse_page_descriptor(json.dumps(
        {"media_box": [0, 0, 612, 792], "crop_box": [50, 40, 562, 752], "rotate": 0}
    ))
    res = decode_page(b"BT /F1 10 Tf 100 700 Td (C) Tj ET", fonts, page_desc=desc)
    assert [s[1] for s in res.spans] == ["C"]
    # verify via the cell table that coordinates shifted by the crop origin
    assert math.isclose(res.cells[0].x0, 100 - 50)
    assert math.isclose(res.cells[0].y0, (700 - 2.5) - 40)


def test_overprint_removed_end_to_end():
    fonts = build_fonts([FONT])
    src = (b"BT /F1 10 Tf 1 0 0 1 100 700 Tm (Bold) Tj"
           b" 1 0 0 1 100.2 700.1 Tm (Bold) Tj ET")
    res = decode_page(src, fonts)
    assert [s[1] for s in res.spans] == ["Bold"]


def test_crop_box_translates_shapes_with_cells():
    """Round-4 review: shape spans must live in the same crop-translated
    frame as cells and bitmaps."""
    import json

    from docling_parse_spark.pdf.page import DecodeConfig, decode_page

    desc = {"page": 0, "media_box": [0, 0, 700, 900],
            "crop_box": [50, 50, 662, 842], "rotate": 0}
    pr = decode_page(
        b"100 90 50 5 re f BT /F0 10 Tf 100 90 Td (A) Tj ET",
        {},
        page_desc=desc,
        config=DecodeConfig(emit_shapes=True),
    )
    shape = next(s for s in pr.spans if s[0] == "shape")
    bb = json.loads(shape[1])["bbox"]
    assert bb[:2] == [50.0, 40.0]  # (100,90) - (50,50): same frame as cells
