"""XY-cut reading-order tests on hand-placed layouts (y-up coordinates)."""

from docling_parse_spark.operators.xycut import xy_cut_order


def test_two_columns():
    # two columns, each two lines; reading order = left col top->bottom, then right
    boxes = [
        (300, 700, 400, 710),  # right top
        (72, 700, 172, 710),   # left top
        (72, 650, 172, 660),   # left bottom
        (300, 650, 400, 660),  # right bottom
    ]
    order = xy_cut_order(boxes)
    assert order == [1, 2, 0, 3]


def test_title_above_columns():
    boxes = [
        (72, 650, 172, 660),   # left col
        (300, 650, 400, 660),  # right col
        (72, 750, 400, 770),   # full-width title
    ]
    assert xy_cut_order(boxes) == [2, 0, 1]


def test_simple_lines_top_to_bottom():
    boxes = [(72, 600, 300, 610), (72, 700, 300, 710), (72, 650, 300, 660)]
    assert xy_cut_order(boxes) == [1, 2, 0]


def test_no_gap_falls_back_stable():
    # overlapping boxes: no split; top-to-bottom then left-to-right
    boxes = [(0, 0, 10, 10), (5, 0, 15, 10), (2, 1, 12, 11)]
    order = xy_cut_order(boxes)
    assert order == [2, 0, 1]


def test_empty_and_single():
    assert xy_cut_order([]) == []
    assert xy_cut_order([(0, 0, 1, 1)]) == [0]


def test_xycut_config_in_decode(tmp_path):
    import json

    from docling_parse_spark.pdf.page import DecodeConfig, build_fonts, decode_page

    font = json.dumps({"font_key": "F1", "base_font": "Helvetica", "subtype": "Type1",
                       "encoding": "WinAnsiEncoding", "first_char": 32, "widths": [500.0] * 95})
    fonts = build_fonts([font])
    # draw right column FIRST in the stream; xycut must reorder left-first
    src = (b"BT /F1 10 Tf 1 0 0 1 300 700 Tm (right) Tj ET"
           b" BT /F1 10 Tf 1 0 0 1 72 700 Tm (left) Tj ET"
           b" BT /F1 10 Tf 1 0 0 1 72 650 Tm (leftlow) Tj ET")
    stream_order = decode_page(src, fonts)
    assert [s[1] for s in stream_order.spans] == ["right", "left", "leftlow"]
    xy = decode_page(src, fonts, config=DecodeConfig(reading_order="xycut"))
    assert [s[1] for s in xy.spans] == ["left", "leftlow", "right"]
