"""Tokenizer unit tests — syntax coverage + the malformed-number repair rules
(reference: src/parse/qpdf/stream_decoder.h:45-47,120-174)."""

from docling_parse_spark.pdf.tokenizer import tokenize


def ops(data):
    return tokenize(data if isinstance(data, bytes) else data.encode())


def test_basic_text_ops():
    ins = ops(b"BT /F1 12 Tf 72 720 Td (Hello) Tj ET")
    assert [i[0] for i in ins] == ["BT", "Tf", "Td", "Tj", "ET"]
    assert ins[1][1] == ["F1", 12.0]
    assert ins[2][1] == [72.0, 720.0]
    assert ins[3][1] == [b"Hello"]


def test_tj_array_with_kerning():
    ins = ops(b"[(He) -120 (llo) 30 (!)] TJ")
    assert ins[0][0] == "TJ"
    assert ins[0][1][0] == [b"He", -120.0, b"llo", 30.0, b"!"]


def test_literal_string_escapes():
    ins = ops(rb"(a\(b\)c \\ \n \101) Tj")
    assert ins[0][1][0] == b"a(b)c \\ \n A"


def test_nested_parens():
    ins = ops(b"(a(b)c) Tj")
    assert ins[0][1][0] == b"a(b)c"


def test_hex_string():
    ins = ops(b"<48 65 6C6C6F> Tj <486> Tj")
    assert ins[0][1][0] == b"Hello"
    assert ins[1][1][0] == b"\x48\x60"  # odd digit padded with 0


def test_malformed_number_split():
    # '1.23-45' is two numbers: 1.23 and -45 (stream_decoder.h repair)
    ins = ops(b"1.23-45 Td")
    assert ins[0][1] == [1.23, -45.0]


def test_malformed_double_minus():
    ins = ops(b"--12.3 0 Td")
    assert ins[0][1] == [-12.3, 0.0]


def test_malformed_triple_chain():
    ins = ops(b"10-20-30 cm_x")
    assert ins[0][1] == [10.0, -20.0, -30.0]


def test_null_becomes_empty_array():
    ins = ops(b"null Tj")
    assert ins[0][1] == [[]]


def test_comment_skipped():
    ins = ops(b"% a comment\n(z) Tj")
    assert ins[0][1] == [b"z"]


def test_dict_operand():
    ins = ops(b"<< /Type /Page /N 3 >> BDC")
    assert ins[0][0] == "BDC"
    assert ins[0][1][0] == {"Type": "Page", "N": 3.0}


def test_inline_image_skipped():
    ins = ops(b"(a) Tj BI /W 2 /H 2 ID \x00\xff\x00\xffEI (b) Tj")
    names = [i[0] for i in ins]
    assert "ID" in names and "EI" in names
    assert ins[-1][1] == [b"b"]


def test_name_with_hex_escape():
    ins = ops(b"/A#20B Do")
    assert ins[0][1] == ["A B"]


def test_negative_and_real_numbers():
    ins = ops(b"-1.5 .25 +3 4. Td_x")
    assert ins[0][1] == [-1.5, 0.25, 3.0, 4.0]
