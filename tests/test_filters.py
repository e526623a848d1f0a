"""PDF stream filters (pdf/filters.py): spec vectors, round trips,
predictor reversal, chains, hostile inputs, and the media transport path."""

import zlib

import pytest

from docling_parse_spark.pdf.filters import (
    apply_filters,
    ascii85_decode,
    asciihex_decode,
    flate_decode,
    lzw_decode,
    runlength_decode,
)


def test_asciihex_spec_behavior():
    assert asciihex_decode(b"48 65 6c 6C 6f>") == b"Hello"
    assert asciihex_decode(b"7>") == b"\x70"  # odd digit padded with 0
    assert asciihex_decode(b"48656c6c6f") == b"Hello"  # EOD optional
    with pytest.raises(ValueError):
        asciihex_decode(b"4g>")


def test_ascii85_spec_behavior():
    enc = b"87cUR_+qcLDY4F&9+EM%2Ch*u~>"
    # reference vector via the inverse of python's base64.a85encode
    import base64

    data = b"PDF filters from the spec"
    assert ascii85_decode(base64.a85encode(data) + b"~>") == data
    assert ascii85_decode(base64.a85encode(data, adobe=True)) == data  # <~..~>
    assert enc  # keep the literal for documentation
    assert ascii85_decode(b"z~>") == b"\x00\x00\x00\x00"
    with pytest.raises(ValueError):
        ascii85_decode(b"!!z!~>")  # z inside a group
    with pytest.raises(ValueError):
        ascii85_decode(b"v~>")  # out of alphabet
    # partial final group: 4 chars -> 3 bytes
    assert len(ascii85_decode(base64.a85encode(b"abc") + b"~>")) == 3


def test_runlength_roundtrip_and_eod():
    # literal run + replicate run + EOD
    enc = bytes([2]) + b"abc" + bytes([257 - 5]) + b"x" + bytes([128])
    assert runlength_decode(enc) == b"abc" + b"x" * 5
    with pytest.raises(ValueError):
        runlength_decode(bytes([2]) + b"ab")  # truncated literal
    with pytest.raises(ValueError):
        runlength_decode(bytes([2]) + b"abc")  # missing EOD


def test_lzw_spec_example_sequence():
    """The §7.4.4.2 worked example: the data 45 45 45 65 65 65 66 66 66
    is carried by the code sequence 256,45,258,65,260,66,262,257 (clear,
    literals, and the KwKwK back-references); packed at 9 bits that is
    80 0B 60 44 18 21 0A 0D 01."""
    encoded = bytes.fromhex("800b604418210a0d01")
    assert lzw_decode(encoded) == bytes([45, 45, 45, 65, 65, 65, 66, 66, 66])


def test_lzw_longer_roundtrip_against_tiff_style_encoder():
    """Encode with a from-scratch LZW encoder (early-change) and decode."""

    def lzw_encode(data: bytes) -> bytes:
        table = {bytes([i]): i for i in range(256)}
        next_code = 258
        width = 9
        out_bits: list[tuple[int, int]] = [(256, 9)]
        w = b""
        for ch in data:
            wc = w + bytes([ch])
            if wc in table:
                w = wc
            else:
                out_bits.append((table[w], width))
                table[wc] = next_code
                next_code += 1
                # encoder bumps width when the NEXT code would not fit
                # (early change: one code early)
                if next_code + 1 - 1 >= (1 << width) and width < 12:
                    width += 1
                if next_code == 4096:
                    out_bits.append((256, width))
                    table = {bytes([i]): i for i in range(256)}
                    next_code = 258
                    width = 9
                w = bytes([ch])
        if w:
            out_bits.append((table[w], width))
        out_bits.append((257, width))
        acc = nbits = 0
        buf = bytearray()
        for code, wd in out_bits:
            acc = (acc << wd) | code
            nbits += wd
            while nbits >= 8:
                buf.append((acc >> (nbits - 8)) & 0xFF)
                nbits -= 8
        if nbits:
            buf.append((acc << (8 - nbits)) & 0xFF)
        return bytes(buf)

    data = (b"the quick brown fox jumps over the lazy dog " * 50
            + bytes(range(256)) * 3)
    assert lzw_decode(lzw_encode(data)) == data


def test_flate_with_png_predictors():
    """Forward-filter rows with each PNG predictor, deflate, decode back."""
    cols, colors = 7, 3
    rowlen = cols * colors
    rows = [bytes((r * 31 + i * 7) % 256 for i in range(rowlen)) for r in range(6)]

    def fwd(tag, row, prior, bpp):
        out = bytearray([tag])
        for i in range(len(row)):
            a = row[i - bpp] if i >= bpp else 0
            b = prior[i]
            c = prior[i - bpp] if i >= bpp else 0
            if tag == 0:
                v = row[i]
            elif tag == 1:
                v = row[i] - a
            elif tag == 2:
                v = row[i] - b
            elif tag == 3:
                v = row[i] - ((a + b) >> 1)
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                v = row[i] - pred
            out.append(v & 0xFF)
        return bytes(out)

    filtered = bytearray()
    prior = bytes(rowlen)
    for r, row in enumerate(rows):
        filtered += fwd(r % 5, row, prior, colors)
        prior = row
    parms = {"Predictor": 15, "Colors": colors, "BitsPerComponent": 8, "Columns": cols}
    assert flate_decode(zlib.compress(bytes(filtered)), parms) == b"".join(rows)


def test_flate_with_tiff_predictor():
    cols, colors = 5, 2
    row = bytes([10, 200, 30, 190, 50, 180, 70, 170, 90, 160])
    diffed = bytearray(row[:2])
    for i in range(2, len(row)):
        diffed.append((row[i] - row[i - 2]) & 0xFF)
    parms = {"Predictor": 2, "Colors": colors, "BitsPerComponent": 8, "Columns": cols}
    assert flate_decode(zlib.compress(bytes(diffed)), parms) == row


def test_filter_chain_order_and_abbreviations():
    import base64

    data = b"chained transport" * 20
    enc = base64.a85encode(zlib.compress(data)) + b"~>"
    # first listed filter is the first DECODING step (§7.4.1)
    assert apply_filters(enc, ["/ASCII85Decode", "/FlateDecode"]) == data
    assert apply_filters(enc, ["A85", "Fl"]) == data
    assert apply_filters(data, None) == data


def test_image_format_filters_hand_off():
    """DCT/CCITT/JPX terminate the transport chain untouched (reference
    'format filters take priority' routing)."""
    blob = b"\xff\xd8fakejpeg"
    assert apply_filters(blob, ["/DCTDecode"]) == blob
    assert apply_filters(zlib.compress(blob), ["/FlateDecode", "/DCTDecode"]) == blob
    with pytest.raises(ValueError):
        apply_filters(blob, ["/NoSuchFilter"])


def test_flate_bomb_is_capped():
    bomb = zlib.compress(b"\x00" * (80 * 1024 * 1024))
    assert len(bomb) < 100_000  # it really is a bomb
    with pytest.raises(ValueError, match="cap"):
        flate_decode(bomb)


def test_hostile_filter_bytes_raise_valueerror_only():
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=120, deadline=None)
    @given(st.binary(max_size=80))
    def run(data):
        for fn in (asciihex_decode, ascii85_decode, runlength_decode, lzw_decode):
            try:
                fn(data)
            except ValueError:
                pass
        try:
            flate_decode(data, {"Predictor": 12, "Columns": 3})
        except ValueError:
            pass

    run()


def test_flate_transport_through_media_operators(spark):
    """A zlib-wrapped PNG payload decodes through decode_media exactly
    like the bare payload; nested-bomb wrapping is error-accounted."""
    import numpy as np

    from docling_parse_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        _decode_payload,
        decode_media,
    )
    from docling_parse_spark.render import _png_encode

    arr = ((np.arange(24)[:, None] * 7 + np.arange(16)[None, :] * 3) % 256).astype(
        np.uint8
    )
    png = _png_encode(arr)
    wrapped = zlib.compress(png)
    m = _decode_payload(wrapped)
    assert (m["width"], m["height"]) == (16, 24) and "pixels" in m

    triple = zlib.compress(zlib.compress(wrapped))  # depth 3 > cap 2
    df = spark.createDataFrame(
        [("m-0", "image", bytearray(wrapped), 16, 24, 1),
         ("m-1", "image", bytearray(triple), 16, 24, 1)],
        schema=MEDIA_SCHEMA,
    )
    out = {r["media_ref"]: r for r in decode_media(df).collect()}
    assert out["m-0"]["ok"] and out["m-0"]["width"] == 16
    assert not out["m-1"]["ok"] and out["m-1"]["error"] == "ValueError"


def test_content_stream_filter_transport_in_decode_unit():
    """A unit whose descriptor declares content_filters decodes to exactly
    the same spans as the bare stream; a corrupt transport is per-unit
    failure accounting, not an exception."""
    import base64
    import json
    import zlib

    from docling_parse_spark.document import decode_unit

    font = json.dumps(
        {"font_key": "F0", "base_font": "Helvetica", "subtype": "Type1",
         "encoding": "WinAnsiEncoding", "first_char": 32,
         "widths": [500.0] * 95}
    )
    stream = b"BT /F0 12 Tf 10 700 Td (Filtered content stream) Tj ET"
    bare = decode_unit(
        "pdf", stream.decode("ascii"), 0, json.dumps({"fonts": [font]}), None, {}
    )
    assert not bare.failed and bare.spans

    enc = base64.a85encode(zlib.compress(stream)) + b"~>"
    res = json.dumps(
        {"fonts": [font],
         "content_filters": ["/ASCII85Decode", "/FlateDecode"]}
    )
    filtered = decode_unit(
        "pdf", enc.decode("ascii"), 0, res, None, {}
    )
    assert not filtered.failed
    assert filtered.spans == bare.spans

    # binary flate payload round-trips through the string column via
    # surrogateescape (the path a parquet-stored stream takes)
    raw = zlib.compress(stream)
    res2 = json.dumps({"fonts": [font], "content_filters": ["FlateDecode"]})
    f2 = decode_unit(
        "pdf", raw.decode("utf-8", "surrogateescape"), 0, res2, None, {}
    )
    assert not f2.failed and f2.spans == bare.spans

    # corrupt transport -> failure accounting
    bad = decode_unit("pdf", "not-a-zlib-stream", 0, res2, None, {})
    assert bad.failed and bad.error.startswith("filter:")


def test_truncated_flate_raises_not_partial():
    """Round-4 review: a truncated deflate stream inflates without error
    but never reaches end-of-stream — that must be a ValueError, not a
    silently partial content stream. Trailing bytes AFTER eof stay OK."""
    data = bytes(range(256)) * 8
    full = zlib.compress(data)
    assert len(full) > 60  # poorly compressible: truncation leaves a tail
    with pytest.raises(ValueError, match="truncated"):
        flate_decode(full[: len(full) // 2])
    assert flate_decode(full + b"\r\n") == data  # EOL padding after eof ok


def test_malformed_decodeparms_raise_valueerror():
    """Wrong-typed DecodeParms / filter names must be ValueError (the
    per-row and per-unit handlers catch exactly that), never
    TypeError/AttributeError escaping to kill a task."""
    import json

    from docling_parse_spark.document import decode_unit

    data = zlib.compress(b"x")
    with pytest.raises(ValueError, match="dict"):
        flate_decode(data, "x")
    with pytest.raises(ValueError, match="Predictor"):
        flate_decode(data, {"Predictor": None})
    with pytest.raises(ValueError, match="string"):
        apply_filters(data, [3])

    # ...and through decode_unit: failure accounting, not a raise
    res = json.dumps({"content_filters": ["FlateDecode"], "content_parms": ["x"]})
    ur = decode_unit("pdf", data.decode("utf-8", "surrogateescape"), 0, res, None, {})
    assert ur.failed and ur.error.startswith("filter:")
