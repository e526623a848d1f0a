"""Sanitizer tests: overprint dedup, text normalization, word/line merge,
rotation — against hand-computed expectations."""

import json
import math

from docling_parse_spark.pdf.fonts import font_from_json
from docling_parse_spark.pdf.interpreter import PageInterpreter
from docling_parse_spark.pdf.sanitize import (
    create_line_cells,
    create_word_cells,
    remove_duplicate_cells,
    rotate_cells,
    sanitize_text,
)
from docling_parse_spark.pdf.tokenizer import tokenize


def cells_of(src: bytes, widths=None):
    d = {"font_key": "F1", "base_font": "Helvetica", "subtype": "Type1",
         "encoding": "WinAnsiEncoding", "first_char": 32,
         "widths": widths or [500.0] * 95}
    it = PageInterpreter({"F1": font_from_json(json.dumps(d))})
    it.run(tokenize(src))
    return it.cells


def test_overprint_dedup():
    # same text drawn twice at (almost) the same spot = fake bold
    src = b"BT /F1 10 Tf 100 700 Td (Hi) Tj 100.2 700.1 Td (Hi) Tj ET"
    # rewrite: second Td is relative; use Tm to place absolutely
    src = (b"BT /F1 10 Tf 1 0 0 1 100 700 Tm (Hi) Tj"
           b" 1 0 0 1 100.2 700.1 Tm (Hi) Tj ET")
    cells = cells_of(src)
    assert len(cells) == 4
    kept = remove_duplicate_cells(cells)
    assert [c.text for c in kept] == ["H", "i"]


def test_dedup_requires_same_font_and_text():
    src = (b"BT /F1 10 Tf 1 0 0 1 100 700 Tm (A) Tj"
           b" 1 0 0 1 100.1 700 Tm (B) Tj ET")
    kept = remove_duplicate_cells(cells_of(src))
    assert [c.text for c in kept] == ["A", "B"]


def test_sanitize_text_normalization():
    from docling_parse_spark.pdf.interpreter import Cell

    cs = [Cell(text="a b"), Cell(text="x—y"), Cell(text="“q”"), Cell(text="ﬁn")]
    sanitize_text(cs)
    assert [c.text for c in cs] == ["a b", "x-y", '"q"', "fin"]


def test_word_cells_basic():
    # "Hi there" as chars: adjacent glyphs merge, space splits words
    cells = cells_of(b"BT /F1 10 Tf 100 700 Td (Hi there) Tj ET")
    words = create_word_cells(cells)
    assert [w.text for w in words] == ["Hi", "there"]
    # geometry: 'Hi' spans two 5pt glyphs from x=100
    assert math.isclose(words[0].r_x0, 100.0) and math.isclose(words[0].r_x1, 110.0)


def test_word_cells_split_on_large_gap():
    # Two runs separated by a 50pt jump: no merge even without a space char
    src = (b"BT /F1 10 Tf 1 0 0 1 100 700 Tm (ab) Tj"
           b" 1 0 0 1 160 700 Tm (cd) Tj ET")
    words = create_word_cells(cells_of(src))
    assert [w.text for w in words] == ["ab", "cd"]


def test_line_cells_join_with_gap_space():
    # Gap > 0.33 * avg char width inserts a space in line unit
    src = (b"BT /F1 10 Tf 1 0 0 1 100 700 Tm (ab) Tj"
           b" 1 0 0 1 113 700 Tm (cd) Tj ET")
    lines = create_line_cells(cells_of(src))
    assert [ln.text for ln in lines] == ["ab cd"]


def test_line_cells_distinct_lines():
    src = (b"BT /F1 10 Tf 1 0 0 1 100 700 Tm (ab) Tj"
           b" 1 0 0 1 100 680 Tm (cd) Tj ET")
    lines = create_line_cells(cells_of(src))
    assert [ln.text for ln in lines] == ["ab", "cd"]


def test_word_merge_ligature():
    # /f_i ligature then 'n' continue one word
    d = {"font_key": "F1", "base_font": "Custom", "subtype": "Type1",
         "encoding": "WinAnsiEncoding", "first_char": 32,
         "widths": [500.0] * 95, "differences": {"200": "f_i"}}
    it = PageInterpreter({"F1": font_from_json(json.dumps(d))})
    it.run(tokenize(b"BT /F1 10 Tf 100 700 Td (\xc8n) Tj ET"))
    cells = it.cells
    sanitize_text(cells)
    words = create_word_cells(cells)
    assert [w.text for w in words] == ["fin"]


def test_rotation_90():
    cells = cells_of(b"BT /F1 10 Tf 100 700 Td (A) Tj ET")
    rotate_cells(cells, 90, 612.0, 792.0)
    c = cells[0]
    # (x,y) -> (y, W - x): bottom-left (100,697.5) -> (697.5, 512)
    assert math.isclose(c.r_x0, 697.5) and math.isclose(c.r_y0, 512.0)


def test_rtl_merge():
    # Hebrew: cells emitted in logical order advance right-to-left visually
    cmap = ("begincodespacerange <0000> <FFFF> endcodespacerange "
            "3 beginbfchar <0001> <05E9> <0002> <05DC> <0003> <05D5> endbfchar")
    d = {"font_key": "F1", "base_font": "David", "subtype": "Type0",
         "encoding": "Identity-H", "to_unicode": cmap,
         "w": {"1": 500, "2": 500, "3": 500}, "dw": 500}
    it = PageInterpreter({"F1": font_from_json(json.dumps(d))})
    # place with Tm so successive glyphs move leftward (RTL writers emit
    # each glyph at decreasing x)
    it.run(tokenize(
        b"BT /F1 10 Tf 1 0 0 1 110 700 Tm <0001> Tj"
        b" 1 0 0 1 105 700 Tm <0002> Tj"
        b" 1 0 0 1 100 700 Tm <0003> Tj ET"))
    cells = it.cells
    assert all(not c.left_to_right for c in cells)
    words = create_word_cells(cells)
    assert len(words) == 1
    assert words[0].text == "שלו"  # logical order preserved
