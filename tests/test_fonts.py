"""Font/encoding resolution tests — the precedence chain of
reference page_font.h:461-661 and the ToUnicode CMap parser."""

import json

from docling_parse_spark.pdf.fonts import (
    Font,
    font_from_json,
    glyph_name_to_unicode,
    parse_cmap,
)


def mk(**kw):
    base = {"font_key": "F1", "base_font": "Helvetica", "subtype": "Type1",
            "encoding": "WinAnsiEncoding", "first_char": 32,
            "widths": [500.0] * 95}
    base.update(kw)
    return font_from_json(json.dumps(base))


def test_winansi_basic():
    f = mk()
    assert f.get_string(ord("A")) == "A"
    assert f.get_string(0x93) == "“"  # cp1252 left double quote


def test_standard_quoteright():
    f = mk(encoding="StandardEncoding")
    assert f.get_string(0x27) == "’"


def test_differences_override():
    f = mk(differences={"65": "alpha"})
    assert f.get_string(65) == "α"
    assert f.get_string(66) == "B"  # untouched codes fall through


def test_differences_ligature_names():
    f = mk(differences={"100": "f_i", "101": "ffi"})
    assert f.get_string(100) == "ﬁ"
    assert f.get_string(101) == "ﬃ"


def test_unknown_glyph_squashed_to_space():
    f = mk(differences={"200": "nonexistentglyphname"})
    assert f.get_string(200) == " "  # keep_glyphs=False production squash
    assert f.get_string(200, keep_glyphs=True) == "GLYPH<c=200>"


def test_uni_names():
    assert glyph_name_to_unicode("uni0041") == "A"
    assert glyph_name_to_unicode("u1F600") == "\U0001f600"


def test_identity_h_with_tounicode():
    cmap = """
    /CIDInit /ProcSet findresource begin
    begincodespacerange <0000> <FFFF> endcodespacerange
    2 beginbfchar
    <0003> <0041>
    <0004> <00480069>
    endbfchar
    1 beginbfrange
    <0010> <0012> <0061>
    endbfrange
    end
    """
    f = mk(encoding="Identity-H", subtype="Type0", to_unicode=cmap,
           w={"3": 722, "4": 600}, dw=1000)
    codes = f.analyse_string(b"\x00\x03\x00\x04\x00\x10\x00\x12")
    assert codes == [3, 4, 16, 18]
    assert f.get_string(3) == "A"
    assert f.get_string(4) == "Hi"
    assert f.get_string(16) == "a"
    assert f.get_string(18) == "c"
    assert f.get_width(3) == 722
    assert f.get_width(99) == 1000  # DW default


def test_bfrange_array_form():
    cmap = "1 beginbfrange <0001> <0003> [<0058> <0059> <005A>] endbfrange"
    mapping, _ = parse_cmap(cmap)
    assert mapping == {1: "X", 2: "Y", 3: "Z"}


def test_simple_width_lookup():
    f = mk(first_char=32, widths=[250.0, 333.0])
    assert f.get_width(32) == 250.0
    assert f.get_width(33) == 333.0
    assert f.get_width(200) == 500.0  # fallback


def test_space_width():
    f = mk(first_char=32, widths=[278.0])
    assert f.space_width == 278.0


def test_word_spacing_only_simple_encodings():
    f = Font(encoding="Identity-H", subtype="Type0")
    assert f.analyse_string(b"\x00A") == [0x41]


def test_base14_width_fallback():
    # font with no /Widths: falls back to the embedded AFM metrics
    f = mk(base_font="Helvetica", widths=[], first_char=0)
    assert f.get_width(ord("i")) == 222.0
    assert f.get_width(ord("W")) == 944.0
    assert f.get_width(32) == 278.0
    f2 = mk(base_font="Courier", widths=[], first_char=0)
    assert f2.get_width(ord("i")) == 600.0
    f3 = mk(base_font="ABCDEF+Times-Roman", widths=[], first_char=0)
    assert f3.get_width(ord("m")) == 778.0
    f4 = mk(base_font="NoSuchFont", widths=[], first_char=0)
    assert f4.get_width(ord("x")) == 500.0
