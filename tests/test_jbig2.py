"""JBIG2 generic-region codec (jbig2.py): round-trips across every
template/TPGDON/MMR combination, a frozen known-answer stream, page
composition, and hostile-input bounds. Reference parity target: the
vendored pdfium codec (src/third_party/pdfium_jbig2/) the reference uses
for /JBIG2Decode payloads."""

import numpy as np
import pytest

from docling_parse_spark.jbig2 import (
    _MQDecoder,
    _MQEncoder,
    decode_jbig2,
    encode_jbig2_generic,
)


def _rand_img(rng, h, w, density=0.3):
    img = (rng.random((h, w)) < density).astype(np.uint8)
    img[h // 3:h // 3 + 3] = img[h // 3 - 1]  # some typical rows
    return img


@pytest.mark.parametrize("template", [0, 1, 2, 3])
@pytest.mark.parametrize("tpgdon", [False, True])
def test_roundtrip_all_templates(template, tpgdon):
    rng = np.random.default_rng(template * 10 + tpgdon)
    img = _rand_img(rng, 40, 57)
    out, meta = decode_jbig2(encode_jbig2_generic(img, template=template, tpgdon=tpgdon))
    assert np.array_equal(out, img)
    assert (meta["width"], meta["height"]) == (57, 40)


def test_roundtrip_mmr():
    """MMR=1 generic regions ride the T.6 reader — the codec path that is
    externally pinned by tests/test_ccitt.py's spec vectors."""
    rng = np.random.default_rng(7)
    img = _rand_img(rng, 30, 64, 0.4)
    out, _ = decode_jbig2(encode_jbig2_generic(img, mmr=True))
    assert np.array_equal(out, img)


@pytest.mark.parametrize("mmr,unknown_height", [
    (False, False), (False, True), (True, False)])
def test_roundtrip_unknown_length_segment(mmr, unknown_height):
    """§7.2.7 unknown data length (0xFFFFFFFF): the region data ends at
    a profile terminator + 4-byte row count; a region-info height of
    0xFFFFFFFF is backfilled from the count. Segments FOLLOWING the
    unknown-length one must still parse (the end-of-page here)."""
    from docling_parse_spark.jbig2 import encode_jbig2_generic

    rng = np.random.default_rng(11)
    img = _rand_img(rng, 17, 41, 0.35)
    data = encode_jbig2_generic(img, mmr=mmr, unknown_length=True,
                                unknown_height=unknown_height)
    out, meta = decode_jbig2(data)
    assert np.array_equal(out, img)
    assert meta["n_regions"] == 1


def test_unknown_length_hostile_inputs():
    """Unknown length on a non-generic-region segment, and a stream with
    no terminator, both fail typed."""
    import struct

    from docling_parse_spark.jbig2 import _seg_header, encode_jbig2_generic

    rng = np.random.default_rng(13)
    img = _rand_img(rng, 8, 16, 0.5)
    good = encode_jbig2_generic(img, unknown_length=True)
    # strip the trailing end-of-page header and the 6 terminator+count
    # bytes before it: the scan must run off the end and raise
    with pytest.raises(ValueError, match="unterminated|truncated"):
        decode_jbig2(good[:len(good) - 11 - 6])
    # a page-info segment with unknown length is malformed
    page_body = struct.pack(">IIIIBH", 8, 8, 0, 0, 0, 0)
    stream = _seg_header(0, 48, 1, 0xFFFFFFFF) + page_body
    with pytest.raises(ValueError, match="immediate generic region"):
        decode_jbig2(stream)


def test_roundtrip_custom_at_pixels():
    rng = np.random.default_rng(11)
    img = _rand_img(rng, 25, 33)
    s = encode_jbig2_generic(img, template=0, at=[(1, -1), (-2, -1), (1, -2), (-1, -2)])
    out, _ = decode_jbig2(s)
    assert np.array_equal(out, img)


def test_non_causal_at_pixel_rejected():
    with pytest.raises(ValueError, match="causal"):
        encode_jbig2_generic(np.ones((4, 4)), template=1, at=[(0, 0)])


def test_frozen_known_answer():
    """Both codec sides pinned against a frozen stream: encoder drift OR
    decoder drift breaks this, independently of the round-trip tests
    (which a mirrored bug could survive)."""
    img = np.zeros((16, 24), dtype=np.uint8)
    img[2:14, 3:5] = 1
    img[2:4, 3:15] = 1
    img[7:9, 3:12] = 1
    img[2:14, 18:20] = 1
    frozen = bytes.fromhex(
        "000000003000010000001300000018000000100000000000000000000000000000"
        "012600010000002800000018000000100000000000000000000803fffdff02fefe"
        "febdc5ded293b65a2a70f8bd9133ff0000000231000100000000"
    )
    assert encode_jbig2_generic(img, template=0, tpgdon=True) == frozen
    out, meta = decode_jbig2(frozen)
    assert np.array_equal(out, img)
    assert meta["n_regions"] == 1


def test_mq_coder_identity_long_stream():
    """MQ encoder/decoder agree over a long adversarial bit sequence in a
    single context (maximal state-machine coverage incl. 0xFF stuffing)."""
    rng = np.random.default_rng(42)
    bits = []
    # runs of MPS (drives Qe down the table) + bursts of LPS (switch paths)
    for _ in range(60):
        bits += [0] * int(rng.integers(1, 120)) + [1] * int(rng.integers(1, 4))
    enc = _MQEncoder()
    ci, cm = bytearray(1), bytearray(1)
    for b in bits:
        enc.encode(ci, cm, 0, b)
    coded = enc.finish()
    dec = _MQDecoder(coded)
    ci2, cm2 = bytearray(1), bytearray(1)
    assert [dec.decode(ci2, cm2, 0) for _ in bits] == bits


def test_page_composition_or_and_replace():
    """Two regions composited onto one page with OR (op 0 — what the
    writer emits) and the page default pixel applied."""
    import struct

    from docling_parse_spark.jbig2 import _seg_header, _encode_generic_arith

    a = np.zeros((4, 6), dtype=np.uint8)
    a[1, 1:4] = 1
    b = np.zeros((3, 4), dtype=np.uint8)
    b[0, :2] = 1

    def region(num, img, x, y):
        h, w = img.shape
        body = (struct.pack(">IIIIB", w, h, x, y, 0) + bytes([0 << 1])
                + struct.pack("bb", 3, -1) + struct.pack("bb", -3, -1)
                + struct.pack("bb", 2, -2) + struct.pack("bb", -2, -2)
                + _encode_generic_arith(img, 0, [(3, -1), (-3, -1), (2, -2), (-2, -2)], False))
        return _seg_header(num, 38, 1, len(body)) + body

    page_body = struct.pack(">IIIIBH", 8, 6, 0, 0, 0, 0)
    stream = (_seg_header(0, 48, 1, len(page_body)) + page_body
              + region(1, a, 0, 0) + region(2, b, 3, 2))
    out, meta = decode_jbig2(stream)
    assert meta["n_regions"] == 2
    want = np.zeros((6, 8), dtype=np.uint8)
    want[1, 1:4] = 1
    want[2, 3:5] = 1
    assert np.array_equal(out, want)


def test_globals_stream_prepended():
    """/JBIG2Globals carries the page info; the content stream carries the
    region — the split PDF writers produce."""
    rng = np.random.default_rng(3)
    img = _rand_img(rng, 12, 20)
    full = encode_jbig2_generic(img)
    # writer layout: [page hdr+19] [region] [eop]; split after page info
    split = 11 + 19
    out, _ = decode_jbig2(full[split:], globals_data=full[:split])
    assert np.array_equal(out, img)


def test_truncated_segments_raise_value_error():
    import struct

    from docling_parse_spark.jbig2 import _seg_header

    # every segment family is supported now; malformed/truncated bodies
    # surface as ValueError, not NotImplementedError
    for stype in (0, 20):  # symbol dictionary, halftone region
        stream = _seg_header(0, stype, 1, 4) + struct.pack(">I", 0)
        with pytest.raises(ValueError):
            decode_jbig2(stream)


def test_hostile_inputs_bounded():
    """Garbage and truncation surface as ValueError (the repo-wide codec
    contract), never index/struct crashes; oversized dimensions are
    rejected before allocation."""
    import struct

    from docling_parse_spark.jbig2 import _seg_header

    rng = np.random.default_rng(9)
    good = encode_jbig2_generic(_rand_img(rng, 10, 10))
    for cut in (1, 5, 11, 17, len(good) - 3):
        with pytest.raises((ValueError, NotImplementedError)):
            decode_jbig2(good[:cut])
    for _ in range(50):
        blob = bytes(rng.integers(0, 256, size=int(rng.integers(1, 60)), dtype=np.uint8))
        try:
            decode_jbig2(blob)
        except (ValueError, NotImplementedError):
            pass
    # 2^31-pixel region: must raise, not allocate
    body = struct.pack(">IIIIB", 1 << 16, 1 << 15, 0, 0, 0) + bytes([0]) + b"\x00" * 8
    stream = _seg_header(0, 38, 1, len(body)) + body
    with pytest.raises(ValueError, match="too large"):
        decode_jbig2(stream)


def test_default_pixel_one_page():
    """Page info bit 2 sets the page default to black; an AND region
    carves white into it."""
    import struct

    from docling_parse_spark.jbig2 import _seg_header, _encode_generic_arith

    img = np.ones((3, 5), dtype=np.uint8)
    img[1, 2] = 0
    body = (struct.pack(">IIIIB", 5, 3, 0, 0, 1)  # op 1 = AND
            + bytes([0]) + struct.pack("bbbbbbbb", 3, -1, -3, -1, 2, -2, -2, -2)
            + _encode_generic_arith(img, 0, None, False))
    page_body = struct.pack(">IIIIBH", 5, 3, 0, 0, 0x04, 0)  # default = 1
    stream = (_seg_header(0, 48, 1, len(page_body)) + page_body
              + _seg_header(1, 38, 1, len(body)) + body)
    out, _ = decode_jbig2(stream)
    assert np.array_equal(out, img)  # 1 AND x = x


def test_pdf_embedded_jbig2_with_globals_end_to_end():
    """PDF §7.4.7: a /JBIG2Decode image whose page-info lives in a shared
    /JBIG2Globals stream. parse_pdf_media must prepend the globals so the
    payload row is self-contained, and multimodal._decode_payload must
    decode it to real pixels."""
    from docling_parse_spark.operators.multimodal import _decode_payload
    from docling_parse_spark.pdf.file import parse_pdf_media
    from test_pdf_file import build_classic_pdf, minimal_objects

    rng = np.random.default_rng(21)
    img = (rng.random((9, 14)) < 0.35).astype(np.uint8)
    full = encode_jbig2_generic(img)
    glob_part, data_part = full[:30], full[30:]  # split after page info
    objs = minimal_objects(b"q /ImJ Do Q")
    objs[3] = (b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R "
               b"/Resources << /Font << /F1 5 0 R >> "
               b"/XObject << /ImJ 6 0 R >> >> >>")
    objs[6] = (f"<< /Type /XObject /Subtype /Image /Width 14 /Height 9 "
               f"/ColorSpace /DeviceGray /BitsPerComponent 1 "
               f"/Filter /JBIG2Decode "
               f"/DecodeParms << /JBIG2Globals 7 0 R >> "
               f"/Length {len(data_part)} >>\nstream\n".encode()
               + data_part + b"\nendstream")
    objs[7] = (f"<< /Length {len(glob_part)} >>\nstream\n".encode()
               + glob_part + b"\nendstream")
    pdf = build_classic_pdf(objs, root=1)
    media = {m["media_ref"]: m for m in parse_pdf_media(pdf, doc_id="d")}
    row = media["d/p0/ImJ"]
    assert row["content_type"] == "jbig2"
    assert bytes(row["payload"]) == full  # globals prepended
    m = _decode_payload(row["payload"])
    assert (m["width"], m["height"]) == (14, 9)
    # ink (1) -> luma 0, paper (0) -> luma 255
    assert np.array_equal(m["pixels"], (1 - img) * np.uint8(255))


def test_at_pixels_keep_spec_context_slots():
    """r6 review: T.88 pins each adaptive pixel to a FIXED context-bit
    slot; moving an AT pixel must substitute its coordinates into that
    slot, not re-sort the template. Layout pinned against pdfium
    JBig2_GrdProc.cpp DecodeArithTemplate{0123}Unopt (what the reference
    vendors), bit 15/12/9/9 = MSB first."""
    from docling_parse_spark.jbig2 import _template_pixels

    # sentinel AT coords, deliberately NOT in (y,x)-sorted positions
    a1, a2, a3, a4 = (-1, -3), (-5, -1), (-6, -2), (-7, 0)
    t0 = _template_pixels(0, [a1, a2, a3, a4])
    assert t0 == [a4, (-1, -2), (0, -2), (1, -2), a3, a2, (-2, -1),
                  (-1, -1), (0, -1), (1, -1), (2, -1), a1, (-4, 0),
                  (-3, 0), (-2, 0), (-1, 0)]
    t1 = _template_pixels(1, [a1])
    assert t1 == [(-1, -2), (0, -2), (1, -2), (2, -2), (-2, -1), (-1, -1),
                  (0, -1), (1, -1), (2, -1), a1, (-3, 0), (-2, 0), (-1, 0)]
    t2 = _template_pixels(2, [a1])
    assert t2 == [(-1, -2), (0, -2), (1, -2), (-2, -1), (-1, -1), (0, -1),
                  (1, -1), a1, (-2, 0), (-1, 0)]
    t3 = _template_pixels(3, [a1])
    assert t3 == [(-3, -1), (-2, -1), (-1, -1), (0, -1), (1, -1), a1,
                  (-4, 0), (-3, 0), (-2, 0), (-1, 0)]


def test_non_nominal_at_round_trip():
    """Encode/decode with AT pixels moved off their nominal rows (legal
    per §6.2.5.3, incl. one colliding with a fixed template pixel)."""
    import numpy as np

    from docling_parse_spark.jbig2 import decode_jbig2, encode_jbig2_generic

    rng = np.random.default_rng(6)
    img = (rng.random((23, 31)) < 0.3).astype(np.uint8)
    for template, at in [
        (0, [(-1, -3), (-3, -2), (1, -2), (-2, 0)]),  # rows moved
        (0, [(0, -1), (-3, -1), (2, -2), (-2, -2)]),  # A1 collides w/ fixed
        (1, [(-2, -2)]),
        (2, [(-4, 0)]),
        (3, [(1, -2)]),
    ]:
        for tpgdon in (False, True):
            data = encode_jbig2_generic(img, template=template, at=at,
                                        tpgdon=tpgdon)
            page, meta = decode_jbig2(data)
            assert np.array_equal(page, img), (template, at, tpgdon)


def _expected_page(symbols, placements, W, H):
    import numpy as np

    page = np.zeros((H, W), np.uint8)
    for i, x, y in placements:
        s = symbols[i]
        h, w = s.shape
        page[y:y + min(h, H - y), x:x + min(w, W - x)] |= \
            s[:min(h, H - y), :min(w, W - x)]
    return page


def test_symbol_text_region_round_trip():
    """jbig2enc profile: arithmetic symbol dictionary + text region.
    Round trips across every REFCORNER, transposed or not, multi-strip,
    and nonzero SBDSOFFSET; multiple height classes and symbol reuse."""
    import numpy as np

    from docling_parse_spark.jbig2 import decode_jbig2, encode_jbig2_symbol_text

    rng = np.random.default_rng(42)

    def sym(h, w):
        return (rng.random((h, w)) < 0.45).astype(np.uint8)

    symbols = [sym(5, 4), sym(5, 7), sym(8, 3), sym(3, 3), sym(8, 3)]
    placements = [(0, 2, 1), (1, 10, 1), (2, 20, 0), (3, 30, 3),
                  (0, 2, 12), (4, 12, 10), (1, 22, 14), (3, 38, 38)]
    W = H = 44
    exp = _expected_page(symbols, placements, W, H)
    for refcorner in (0, 1, 2, 3):
        for transposed in (False, True):
            for sbstrips, dsoffset in ((1, 0), (4, -3), (2, 5)):
                data = encode_jbig2_symbol_text(
                    symbols, placements, W, H, refcorner=refcorner,
                    transposed=transposed, sbstrips=sbstrips,
                    dsoffset=dsoffset)
                page, meta = decode_jbig2(data)
                assert np.array_equal(page, exp), (
                    refcorner, transposed, sbstrips, dsoffset)


def test_symbol_text_templates_and_single_symbol():
    """Symbol bitmaps decode through every generic template; a one-symbol
    dictionary exercises SBSYMCODELEN == 0 (zero ID bits)."""
    import numpy as np

    from docling_parse_spark.jbig2 import decode_jbig2, encode_jbig2_symbol_text

    rng = np.random.default_rng(3)
    glyph = (rng.random((6, 5)) < 0.4).astype(np.uint8)
    placements = [(0, 1, 1), (0, 8, 2), (0, 15, 3)]
    exp = _expected_page([glyph], placements, 24, 12)
    for template in (0, 1, 2, 3):
        data = encode_jbig2_symbol_text([glyph], placements, 24, 12,
                                        template=template)
        page, _ = decode_jbig2(data)
        assert np.array_equal(page, exp), template


def test_chained_symbol_dictionaries():
    """A dictionary may import the exports of referred dictionaries
    (§7.4.3.5): text-region symbol IDs then index the concatenation."""
    import struct

    import numpy as np

    from docling_parse_spark import jbig2 as j

    a = np.eye(4, dtype=np.uint8)
    b = (1 - np.eye(4)).astype(np.uint8)

    def dict_body(new_syms, n_in):
        enc = j._MQEncoder()
        iadh, iadw, iaex = j._ArithInt(), j._ArithInt(), j._ArithInt()
        ci, cm = j._fresh_contexts(0)
        at = [tuple(p) for p in j._NOMINAL_AT[0]]
        hc = 0
        for s in new_syms:  # one symbol per height class (heights equal ok)
            iadh.encode(enc, s.shape[0] - hc)
            hc = s.shape[0]
            iadw.encode(enc, s.shape[1])
            j._encode_generic_shared(enc, ci, cm, s, 0, at, tpgdon=False)
            iadw.encode(enc, j._OOB)
        iaex.encode(enc, 0)
        iaex.encode(enc, n_in + len(new_syms))  # export imports + new
        return (struct.pack(">H", 0)
                + b"".join(struct.pack("bb", dx, dy) for dx, dy in at)
                + struct.pack(">II", n_in + len(new_syms), len(new_syms))
                + enc.finish())

    # text region placing id0 (from dict A via B) and id1 (new in B)
    enc = j._MQEncoder()
    iadt, iafs, iads = j._ArithInt(), j._ArithInt(), j._ArithInt()
    iaid = j._ArithIaid(1)
    iadt.encode(enc, 0)
    iadt.encode(enc, 0)          # strip t=0
    iafs.encode(enc, 1)          # first S = 1
    iaid.encode(enc, 0)
    iads.encode(enc, 2)          # next S = 1+(4-1)+2 = 6
    iaid.encode(enc, 1)
    iads.encode(enc, j._OOB)
    tr_body = (struct.pack(">IIIIB", 12, 6, 0, 0, 0)
               + struct.pack(">H", 1 << 4)  # TL corner, strips=1
               + struct.pack(">I", 2) + enc.finish())

    page_body = struct.pack(">IIIIBH", 12, 6, 0, 0, 0, 0)
    stream = (j._seg_header(0, 48, 1, len(page_body)) + page_body
              + j._seg_header(1, 0, 1, len(dict_body([a], 0))) + dict_body([a], 0)
              + j._seg_header(2, 0, 1, len(dict_body([b], 1)), refs=(1,))
              + dict_body([b], 1)
              + j._seg_header(3, 6, 1, len(tr_body), refs=(2,)) + tr_body
              + j._seg_header(4, 49, 1, 0))
    page, _ = decode_jbig2(stream)
    exp = _expected_page([a, b], [(0, 1, 0), (1, 6, 0)], 12, 6)
    assert np.array_equal(page, exp)


def test_symbol_text_hostile_inputs():
    """Truncated/corrupt symbol+text streams fail as ValueError (or the
    typed NotImplementedError for declared-unsupported modes), never
    IndexError/struct.error."""
    import numpy as np
    import pytest

    from docling_parse_spark.jbig2 import decode_jbig2, encode_jbig2_symbol_text

    glyph = np.ones((3, 3), np.uint8)
    data = bytearray(encode_jbig2_symbol_text([glyph], [(0, 1, 1)], 10, 6))
    for cut in (30, 45, 60, len(data) - 3):
        with pytest.raises((ValueError, NotImplementedError)):
            decode_jbig2(bytes(data[:cut]) + b"\x00")
    # every symbol-dictionary coding mode is supported now; flipped
    # profile flags on an arithmetic stream fail as malformed data
    hd = bytearray(data)
    # symbol dict body starts after page-info segment: find its flags
    # (first segment is 11-byte header + 19-byte page body; dict header 11)
    sd_flags_at = 11 + 19 + 11
    hd[sd_flags_at + 1] |= 0x03  # SDHUFF | SDREFAGG
    with pytest.raises((ValueError, NotImplementedError)):
        decode_jbig2(bytes(hd))


def test_frozen_symbol_text_known_answer():
    """Symbol/text pair pinned against a frozen stream, like the generic
    KAT: encoder OR decoder drift breaks this independently of the
    round-trip tests."""
    import numpy as np

    from docling_parse_spark.jbig2 import decode_jbig2, encode_jbig2_symbol_text

    t = np.zeros((6, 5), np.uint8)
    t[0, :] = 1
    t[:, 2] = 1
    o = np.zeros((6, 5), np.uint8)
    o[0, :] = 1
    o[5, :] = 1
    o[:, 0] = 1
    o[:, 4] = 1
    placements = [(0, 1, 1), (1, 7, 1), (1, 13, 1), (0, 19, 1)]
    frozen = bytes.fromhex(
        "00000000300001000000130000001a0000000800000000000000000000000000"
        "00010000010000001d000003fffdff02fefefe00000002000000024fea535414"
        "e0d5ec7a82ff00000002062001010000001c0000001a00000008000000000000"
        "000000001000000004a5d4a55fff0000000331000100000000"
    )
    assert encode_jbig2_symbol_text([t, o], placements, 26, 8) == frozen
    page, meta = decode_jbig2(frozen)
    assert np.array_equal(page, _expected_page([t, o], placements, 26, 8))
    assert meta["n_regions"] == 1


def test_refinement_region_round_trip():
    """§6.3 generic refinement region: an immediate segment (type 42,
    REPLACE op) refines the page content under its box into the target,
    across both GRTEMPLATE values and TPGRON on/off."""
    from docling_parse_spark.jbig2 import encode_jbig2_refinement

    rng = np.random.default_rng(17)
    base = (rng.random((18, 26)) < 0.35).astype(np.uint8)
    target = base.copy()
    target[rng.random(base.shape) < 0.08] ^= 1
    target[4:7, 5:9] = 1        # a solid patch: TPGRON typical rows
    target[10:13, 14:20] = 0
    for template in (0, 1):
        for tpgron in (False, True):
            data = encode_jbig2_refinement(base, target, template=template,
                                           tpgron=tpgron)
            page, meta = decode_jbig2(data)
            assert np.array_equal(page, target), (template, tpgron)
            assert meta["n_regions"] == 2  # base compose + refinement


def test_refinement_via_intermediate_region():
    """§7.4.7.2: the refinement segment refers to an INTERMEDIATE generic
    region (type 36 — stored, never composed) as its reference, so the
    decoded page carries only the refinement output."""
    from docling_parse_spark.jbig2 import encode_jbig2_refinement

    rng = np.random.default_rng(23)
    base = (rng.random((11, 16)) < 0.4).astype(np.uint8)
    target = base.copy()
    target[rng.random(base.shape) < 0.15] ^= 1
    data = encode_jbig2_refinement(base, target, via_intermediate=True)
    page, meta = decode_jbig2(data)
    assert np.array_equal(page, target)
    assert meta["n_regions"] == 1  # the intermediate base never composes


def test_refinement_custom_at_and_noncausal_rejected():
    """Template-0 refinement AT pixels may move (A1 over the current
    bitmap stays causal; A2 over the reference is unconstrained)."""
    from docling_parse_spark.jbig2 import encode_jbig2_refinement

    rng = np.random.default_rng(29)
    base = (rng.random((13, 19)) < 0.3).astype(np.uint8)
    target = base.copy()
    target[rng.random(base.shape) < 0.1] ^= 1
    data = encode_jbig2_refinement(base, target, template=0,
                                   at=[(-2, 0), (0, 1)])
    page, _ = decode_jbig2(data)
    assert np.array_equal(page, target)
    with pytest.raises(ValueError, match="causal"):
        encode_jbig2_refinement(base, target, at=[(0, 0), (-1, -1)])


def test_refined_text_instances():
    """§6.4.11 SBREFINE=1: flagged instances decode as refinements of
    their dictionary symbol, including nonzero RDW/RDH size deltas."""
    from docling_parse_spark.jbig2 import encode_jbig2_symbol_text

    rng = np.random.default_rng(31)
    a = (rng.random((6, 5)) < 0.45).astype(np.uint8)
    b = (rng.random((4, 7)) < 0.45).astype(np.uint8)
    # same-size tweak of a, grown variant of b, shrunken variant of a
    ta = a ^ (rng.random(a.shape) < 0.2)
    tb = (rng.random((6, 9)) < 0.45).astype(np.uint8)   # rdw=+2, rdh=+2
    tc = (rng.random((4, 4)) < 0.45).astype(np.uint8)   # rdw=-1, rdh=-2
    placements = [(0, 1, 1), (1, 9, 1), (0, 20, 1), (1, 1, 10), (0, 14, 10)]
    refined = {1: ta.astype(np.uint8), 3: tb, 4: tc}
    data = encode_jbig2_symbol_text([a, b], placements, 32, 18,
                                    refined=refined)
    page, _ = decode_jbig2(data)
    exp = np.zeros((18, 32), np.uint8)
    for pidx, (i, x, y) in enumerate(placements):
        bm = refined.get(pidx, [a, b][i])
        exp[y:y + bm.shape[0], x:x + bm.shape[1]] |= bm
    assert np.array_equal(page, exp)


def test_refagg_symbol_dictionary():
    """§6.5.8.2 SDREFAGG=1: a second dictionary imports the first and
    codes each new symbol as a single-instance refinement of an imported
    one; the text region addresses the concatenated exports."""
    from docling_parse_spark.jbig2 import encode_jbig2_symbol_text

    rng = np.random.default_rng(37)
    a = (rng.random((5, 4)) < 0.5).astype(np.uint8)
    b = (rng.random((7, 6)) < 0.5).astype(np.uint8)
    ra = a ^ (rng.random(a.shape) < 0.25)  # refined twin of a
    rb = b ^ (rng.random(b.shape) < 0.25)  # refined twin of b
    ra, rb = ra.astype(np.uint8), rb.astype(np.uint8)
    # ids 0,1 = dict-1 symbols; ids 2,3 = dict-2 refagg symbols
    placements = [(0, 1, 1), (2, 8, 1), (1, 15, 1), (3, 24, 1), (2, 1, 10)]
    data = encode_jbig2_symbol_text([a, b], placements, 32, 20,
                                    refagg_symbols=[(0, ra), (1, rb)])
    page, _ = decode_jbig2(data)
    exp = _expected_page([a, b, ra, rb], placements, 32, 20)
    assert np.array_equal(page, exp)


def test_refinement_hostile_inputs():
    """Truncated refinement streams fail typed; a refinement region with
    neither an intermediate referent nor page info is a ValueError."""
    import struct

    from docling_parse_spark.jbig2 import (_seg_header,
                                           encode_jbig2_refinement)

    rng = np.random.default_rng(41)
    base = (rng.random((8, 8)) < 0.4).astype(np.uint8)
    target = base ^ (rng.random(base.shape) < 0.2)
    good = encode_jbig2_refinement(base, target.astype(np.uint8))
    for cut in (35, 60, len(good) - 5):
        with pytest.raises((ValueError, NotImplementedError)):
            decode_jbig2(good[:cut])
    # refinement segment with no page info and no referent
    body = struct.pack(">IIIIB", 4, 4, 0, 0, 4) + bytes([1]) + b"\x00" * 8
    stream = _seg_header(0, 42, 1, len(body)) + body
    with pytest.raises(ValueError, match="page info"):
        decode_jbig2(stream)


# ------------------------------------------------ §6.6/§6.7 halftone profile

def _halftone_expected(patterns, gray, W, H, hgx=0, hgy=0, hrx=None,
                       hry=0, defpixel=0, combop=0):
    """Independent §6.6.5 grid composition (clipped stamping)."""
    from docling_parse_spark.jbig2 import _composite

    hph, hpw = patterns[0].shape
    if hrx is None:
        hrx = hpw << 8
    exp = np.full((H, W), defpixel, dtype=np.uint8)
    for m in range(gray.shape[0]):
        for n in range(gray.shape[1]):
            x = (hgx + m * hry + n * hrx) >> 8
            y = (hgy + m * hrx - n * hry) >> 8
            _composite(exp, patterns[gray[m, n]], x, y, combop)
    return exp


@pytest.mark.parametrize("template", [0, 2])
@pytest.mark.parametrize("hd_template", [0, 1])
def test_halftone_round_trip(template, hd_template):
    """Pattern dictionary + halftone region: gray-coded bitplanes through
    shared contexts select patterns stamped on the §6.6.5 grid."""
    from docling_parse_spark.jbig2 import encode_jbig2_halftone

    rng = np.random.default_rng(43)
    patterns = [(rng.random((5, 5)) < d).astype(np.uint8)
                for d in (0.1, 0.35, 0.6, 0.9)]
    gray = rng.integers(0, 4, size=(7, 9))
    data = encode_jbig2_halftone(patterns, gray, template=template,
                                 hd_template=hd_template)
    page, meta = decode_jbig2(data)
    assert np.array_equal(
        page, _halftone_expected(patterns, gray, page.shape[1],
                                 page.shape[0]))
    assert meta["n_regions"] == 1


def test_halftone_non_pow2_pattern_count():
    """HNUMPATS=5 -> 3 bitplanes; indices above GRAYMAX cannot occur but
    the third plane still round-trips exactly."""
    from docling_parse_spark.jbig2 import encode_jbig2_halftone

    rng = np.random.default_rng(47)
    patterns = [(rng.random((4, 6)) < 0.2 * (i + 1)).astype(np.uint8)
                for i in range(5)]
    gray = rng.integers(0, 5, size=(6, 5))
    # non-square patterns need an explicit vertical-compatible grid: keep
    # the nominal axis-aligned tiling and a region box sized to it
    data = encode_jbig2_halftone(patterns, gray, width=5 * 6, height=6 * 6)
    page, _ = decode_jbig2(data)
    assert np.array_equal(
        page, _halftone_expected(patterns, gray, 30, 36))


def test_halftone_mmr_pattern_dict():
    """HDMMR=1: the collective pattern bitmap rides the T.6 reader."""
    from docling_parse_spark.jbig2 import encode_jbig2_halftone

    rng = np.random.default_rng(53)
    patterns = [(rng.random((6, 6)) < d).astype(np.uint8)
                for d in (0.25, 0.75)]
    gray = rng.integers(0, 2, size=(5, 5))
    data = encode_jbig2_halftone(patterns, gray, mmr_patterns=True)
    page, _ = decode_jbig2(data)
    assert np.array_equal(
        page, _halftone_expected(patterns, gray, page.shape[1],
                                 page.shape[0]))


def test_halftone_mmr_gray_planes():
    """HMMR=1: the gray-coded bitplanes ride ONE continuous T.6 stream,
    each plane EOFB-terminated with no byte alignment between planes
    (T.88 Annex C.5); the MMR and arithmetic encodings of the same gray
    image must decode to the identical page."""
    from docling_parse_spark.jbig2 import encode_jbig2_halftone

    rng = np.random.default_rng(59)
    patterns = [(rng.random((5, 4)) < d).astype(np.uint8)
                for d in (0.15, 0.4, 0.65, 0.9, 0.5)]
    gray = rng.integers(0, 5, size=(6, 8))
    kw = dict(width=8 * 4, height=6 * 5)
    mmr = encode_jbig2_halftone(patterns, gray, mmr_gray=True, **kw)
    page, meta = decode_jbig2(mmr)
    assert np.array_equal(page, _halftone_expected(patterns, gray, 32, 30))
    arith_page, _ = decode_jbig2(encode_jbig2_halftone(patterns, gray, **kw))
    assert np.array_equal(page, arith_page)
    assert meta["n_regions"] == 1


def test_halftone_mmr_gray_with_mmr_patterns():
    """Fully-MMR halftone profile: HDMMR=1 pattern dictionary and HMMR=1
    grayscale planes in one stream (plus a skewed grid)."""
    from docling_parse_spark.jbig2 import encode_jbig2_halftone

    rng = np.random.default_rng(61)
    patterns = [(rng.random((4, 4)) < d).astype(np.uint8)
                for d in (0.2, 0.5, 0.8)]
    gray = rng.integers(0, 3, size=(5, 5))
    data = encode_jbig2_halftone(patterns, gray, mmr_patterns=True,
                                 mmr_gray=True, width=40, height=36,
                                 hgx=512, hgy=256, hry=128)
    page, _ = decode_jbig2(data)
    assert np.array_equal(
        page, _halftone_expected(patterns, gray, 40, 36, hgx=512, hgy=256,
                                 hry=128))


def test_halftone_enable_skip():
    """HENABLESKIP=1: grid cells entirely outside the region box code no
    plane data and decode gray 0 (§6.2.5.7 USESKIP + §6.6.5.1 HSKIP)."""
    from docling_parse_spark.jbig2 import encode_jbig2_halftone

    rng = np.random.default_rng(59)
    patterns = [(rng.random((4, 4)) < d).astype(np.uint8)
                for d in (0.2, 0.5, 0.8, 0.95)]
    gray = rng.integers(0, 4, size=(6, 8))
    hgx = -(4 << 8)  # first grid column lands at x=-4: fully outside
    W, H = 7 * 4, 6 * 4
    data = encode_jbig2_halftone(patterns, gray, width=W, height=H,
                                 hgx=hgx, enable_skip=True)
    page, _ = decode_jbig2(data)
    gray_eff = gray.copy()
    gray_eff[:, 0] = 0  # skipped cells are forced to pattern 0
    assert np.array_equal(
        page, _halftone_expected(patterns, gray_eff, W, H, hgx=hgx))


def test_halftone_skewed_grid():
    """Nonzero HRY rotates the grid: placement follows x=HGX+m*HRY+n*HRX,
    y=HGY+m*HRX-n*HRY in 1/256 units."""
    from docling_parse_spark.jbig2 import encode_jbig2_halftone

    rng = np.random.default_rng(61)
    patterns = [(rng.random((4, 4)) < d).astype(np.uint8)
                for d in (0.3, 0.7)]
    gray = rng.integers(0, 2, size=(5, 6))
    hrx, hry, hgy = 4 << 8, 96, 6 << 8
    data = encode_jbig2_halftone(patterns, gray, hrx=hrx, hry=hry, hgy=hgy)
    page, _ = decode_jbig2(data)
    assert np.array_equal(
        page, _halftone_expected(patterns, gray, page.shape[1],
                                 page.shape[0], hgy=hgy, hrx=hrx, hry=hry))


def test_halftone_defpixel_combop():
    """HDEFPIXEL=1 + HCOMBOP=XOR: the region starts black and patterns
    are XORed in before the region ORs onto the page."""
    from docling_parse_spark.jbig2 import encode_jbig2_halftone

    rng = np.random.default_rng(67)
    patterns = [(rng.random((5, 5)) < d).astype(np.uint8)
                for d in (0.25, 0.6)]
    gray = rng.integers(0, 2, size=(4, 4))
    data = encode_jbig2_halftone(patterns, gray, defpixel=1, combop=2)
    page, _ = decode_jbig2(data)
    assert np.array_equal(
        page, _halftone_expected(patterns, gray, page.shape[1],
                                 page.shape[0], defpixel=1, combop=2))


def test_halftone_hostile_inputs():
    """Truncated streams fail typed; a halftone region without a referred
    pattern dictionary is a ValueError; an empty-body HMMR=1 region fails
    as malformed data (the profile is supported since r6)."""
    import struct

    from docling_parse_spark.jbig2 import _seg_header, encode_jbig2_halftone

    rng = np.random.default_rng(71)
    patterns = [(rng.random((4, 4)) < 0.4).astype(np.uint8)
                for _ in range(2)]
    gray = rng.integers(0, 2, size=(3, 3))
    good = encode_jbig2_halftone(patterns, gray)
    for cut in (30, 55, len(good) - 4):
        with pytest.raises((ValueError, NotImplementedError)):
            decode_jbig2(good[:cut])
    # halftone region referring to nothing
    body = (struct.pack(">IIIIB", 8, 8, 0, 0, 0) + bytes([0])
            + struct.pack(">IIii", 2, 2, 0, 0) + struct.pack(">HH", 1024, 0))
    stream = _seg_header(0, 22, 1, len(body)) + body
    with pytest.raises(ValueError, match="pattern dictionary"):
        decode_jbig2(stream)
    # HMMR=1 with an empty coded body: malformed, not a hang
    pd_body = (bytes([0, 4, 4]) + struct.pack(">I", 1)
               + b"\x00" * 8)
    ht_body = (struct.pack(">IIIIB", 8, 8, 0, 0, 0) + bytes([1])
               + struct.pack(">IIii", 2, 2, 0, 0)
               + struct.pack(">HH", 1024, 0))
    stream = (_seg_header(0, 16, 1, len(pd_body)) + pd_body
              + _seg_header(1, 22, 1, len(ht_body), refs=(0,)) + ht_body)
    with pytest.raises(ValueError):
        decode_jbig2(stream)
    # HMMR=1 + HENABLESKIP: flag combination the spec forbids
    ht_body = (struct.pack(">IIIIB", 8, 8, 0, 0, 0) + bytes([1 | 8])
               + struct.pack(">IIii", 2, 2, 0, 0)
               + struct.pack(">HH", 1024, 0))
    stream = (_seg_header(0, 16, 1, len(pd_body)) + pd_body
              + _seg_header(1, 22, 1, len(ht_body), refs=(0,)) + ht_body)
    with pytest.raises(ValueError, match="HENABLESKIP"):
        decode_jbig2(stream)


# --------------------------------------------- Annex B Huffman profile

def test_huffman_std_table_round_trip_values():
    """Every standard table encodes/decodes representative values across
    its normal lines and 32-bit range extensions."""
    from docling_parse_spark.jbig2 import (_BitReader, _BitWriter, _OOB,
                                           _std_table)

    cases = {
        1: [0, 15, 16, 271, 272, 65807, 65808, 70000],
        2: [0, 1, 2, 3, 10, 11, 74, 75, 200],
        3: [-256, -1, -257, -500, 0, 11, 74, 75, 300],
        4: [1, 2, 3, 4, 11, 12, 75, 76, 200],
        5: [-255, -1, -256, -999, 1, 12, 75, 76, 300],
        6: [-2048, -1, 0, 127, 128, 2047, -2049, -9999, 2048, 9999],
        7: [-1024, -32, 0, 31, 1023, 2047, -1025, -5000, 2048, 5000],
        8: [-15, -2, 0, 1, 2, 22, 645, 1669, -16, -100, 1670, 2000],
        9: [-31, -3, -1, 1, 7, 38, 1290, 3338, -32, -99, 3339, 4000],
        10: [-21, -5, -2, 1, 5, 69, 2117, 4165, -22, -99, 4166, 9000],
        11: [1, 2, 3, 76, 140, 141, 500],
        12: [1, 2, 3, 40, 72, 73, 500],
        13: [1, 2, 6, 14, 140, 141, 500],
        14: [-2, -1, 0, 1, 2],
        15: [-24, -8, -1, 0, 1, 8, 24, -25, -99, 25, 99],
    }
    for tno, values in cases.items():
        tab = _std_table(tno)
        bw = _BitWriter()
        for v in values:
            tab.encode(bw, v)
        if tab.oob:
            tab.encode(bw, _OOB)
        br = _BitReader(bw.getvalue())
        got = [tab.decode(br) for _ in values]
        assert got == values, f"table B.{tno}"
        if tab.oob:
            assert tab.decode(br) is _OOB, f"table B.{tno} OOB"


def test_huffman_table_b1_known_codes():
    """Pin table B.1's canonical prefix codes against the spec: lengths
    1/2/3/3 -> codes 0/10/110/111 (the lower-range placeholder has no
    code)."""
    from docling_parse_spark.jbig2 import _std_table

    tab = _std_table(1)
    assert [(l[0], c) for l, c in zip(tab.lines, tab.codes)] == [
        (1, 0), (2, 2), (3, 6), (0, 0), (3, 7)]


@pytest.mark.parametrize("mmr", [False, True])
def test_huffman_symbol_text_round_trip(mmr):
    """SDHUFF=1 + SBHUFF=1: height-class collective bitmaps (uncompressed
    and MMR) + runcode symbol ID codes place instances exactly like the
    arithmetic profile."""
    from docling_parse_spark.jbig2 import encode_jbig2_symbol_text_huffman

    rng = np.random.default_rng(73)
    a = (rng.random((6, 5)) < 0.5).astype(np.uint8)
    b = (rng.random((6, 8)) < 0.4).astype(np.uint8)
    c = (rng.random((4, 4)) < 0.6).astype(np.uint8)
    placements = [(0, 1, 1), (1, 8, 1), (2, 18, 2), (0, 1, 9), (2, 24, 9)]
    data = encode_jbig2_symbol_text_huffman([a, b, c], placements, 30, 16,
                                            mmr_collective=mmr)
    page, meta = decode_jbig2(data)
    assert np.array_equal(page, _expected_page([a, b, c], placements, 30, 16))
    assert meta["n_regions"] == 1


@pytest.mark.parametrize("refcorner", [0, 1, 2, 3])
def test_huffman_text_refcorners(refcorner):
    from docling_parse_spark.jbig2 import encode_jbig2_symbol_text_huffman

    rng = np.random.default_rng(79)
    a = (rng.random((5, 7)) < 0.5).astype(np.uint8)
    b = (rng.random((3, 4)) < 0.5).astype(np.uint8)
    placements = [(0, 2, 2), (1, 11, 3), (0, 17, 2), (1, 2, 9)]
    data = encode_jbig2_symbol_text_huffman([a, b], placements, 26, 14,
                                            refcorner=refcorner)
    page, _ = decode_jbig2(data)
    assert np.array_equal(page, _expected_page([a, b], placements, 26, 14))


def test_huffman_text_transposed_strips_dsoffset():
    from docling_parse_spark.jbig2 import encode_jbig2_symbol_text_huffman

    rng = np.random.default_rng(83)
    a = (rng.random((4, 6)) < 0.5).astype(np.uint8)
    b = (rng.random((6, 3)) < 0.5).astype(np.uint8)
    placements = [(0, 1, 1), (1, 9, 2), (0, 14, 6), (1, 22, 3)]
    data = encode_jbig2_symbol_text_huffman(
        [a, b], placements, 28, 14, transposed=True, sbstrips=4, dsoffset=-3)
    page, _ = decode_jbig2(data)
    assert np.array_equal(page, _expected_page([a, b], placements, 28, 14))


def test_huffman_custom_code_table_segment():
    """Selector 3 routes DT through a type-53 custom code table (§B.2
    parse), which also exercises DT=0 — unreachable via standard B.11."""
    from docling_parse_spark.jbig2 import encode_jbig2_symbol_text_huffman

    rng = np.random.default_rng(89)
    a = (rng.random((5, 5)) < 0.5).astype(np.uint8)
    b = (rng.random((5, 6)) < 0.5).astype(np.uint8)
    placements = [(0, 1, 0), (1, 8, 0), (0, 16, 7), (1, 1, 8)]
    data = encode_jbig2_symbol_text_huffman([a, b], placements, 24, 14,
                                            custom_dt=True)
    page, _ = decode_jbig2(data)
    assert np.array_equal(page, _expected_page([a, b], placements, 24, 14))


def test_huffman_multi_height_class_widths():
    """Several height classes, multiple symbols per class, widths forcing
    nonzero DW deltas and byte-padded collective rows."""
    from docling_parse_spark.jbig2 import encode_jbig2_symbol_text_huffman

    rng = np.random.default_rng(97)
    syms = [(rng.random((h, w)) < 0.45).astype(np.uint8)
            for h, w in ((3, 9), (3, 9), (3, 17), (5, 2), (5, 30), (8, 11))]
    placements = [(i, 2 + 33 * (i % 2), 2 + 11 * (i // 2))
                  for i in range(len(syms))]
    data = encode_jbig2_symbol_text_huffman(syms, placements, 70, 40)
    page, _ = decode_jbig2(data)
    assert np.array_equal(page, _expected_page(syms, placements, 70, 40))


def test_huffman_hostile_inputs():
    """Truncated Huffman streams fail typed; a custom-table selector with
    no referred table segment is a ValueError."""
    import struct

    from docling_parse_spark.jbig2 import (_seg_header,
                                           encode_jbig2_symbol_text_huffman)

    rng = np.random.default_rng(101)
    a = (rng.random((4, 4)) < 0.5).astype(np.uint8)
    good = encode_jbig2_symbol_text_huffman([a, a ^ 1], [(0, 1, 1), (1, 6, 1)],
                                            12, 8)
    for cut in (35, 50, 65, len(good) - 4):
        with pytest.raises((ValueError, NotImplementedError)):
            decode_jbig2(good[:cut])
    # text region demanding a custom FS table (selector 3) without one
    tr_flags = 1
    hflags = 3  # SBHUFFFS custom, nothing referred
    body = (struct.pack(">IIIIB", 8, 8, 0, 0, 0)
            + struct.pack(">HH", tr_flags, hflags)
            + struct.pack(">I", 1) + b"\x00" * 20)
    one = encode_jbig2_symbol_text_huffman([a], [(0, 0, 0)], 8, 8)
    # splice: page + the real symbol dict from `one` + our bad text region
    # (segment layout: [hdr 11][page 19][hdr 11][sd ...][hdr][tr ...][eop])
    sd_len = struct.unpack(">I", one[30 + 7:30 + 11])[0]
    prefix = one[:30 + 11 + sd_len]
    stream = prefix + _seg_header(2, 6, 1, len(body), refs=(1,)) + body
    with pytest.raises(ValueError, match="custom Huffman table"):
        decode_jbig2(stream)


def test_refagg_multi_instance_aggregate():
    """§6.5.8.2.1 REFAGGNINST > 1: a dictionary symbol decodes as an
    embedded text region compositing several imported instances through
    the dictionary's shared decoder state; mixed with single-instance
    refinements in the same dictionary."""
    from docling_parse_spark.jbig2 import encode_jbig2_symbol_text

    rng = np.random.default_rng(103)
    a = (rng.random((4, 3)) < 0.55).astype(np.uint8)
    b = (rng.random((3, 5)) < 0.5).astype(np.uint8)
    ra = (a ^ (rng.random(a.shape) < 0.3)).astype(np.uint8)
    # aggregate glyph: 'a' twice and 'b' once on a 7x10 canvas
    agg_pl = [(0, 0, 0), (1, 3, 1), (0, 7, 3)]
    agg_exp = np.zeros((7, 10), np.uint8)
    for si, x, y in agg_pl:
        bm = [a, b][si]
        agg_exp[y:y + bm.shape[0], x:x + bm.shape[1]] |= bm
    # ids: 0,1 = dict-1; 2 = refined twin; 3 = aggregate
    placements = [(0, 1, 1), (1, 6, 1), (2, 13, 1), (3, 1, 8), (3, 13, 8)]
    data = encode_jbig2_symbol_text(
        [a, b], placements, 26, 18,
        refagg_symbols=[(0, ra), ("agg", agg_pl, (7, 10))])
    page, _ = decode_jbig2(data)
    exp = _expected_page([a, b, ra, agg_exp], placements, 26, 18)
    assert np.array_equal(page, exp)


def test_refagg_aggregate_multirow_strips():
    """Aggregate instances spread across several strip rows exercise the
    shared IADT/IADS bookkeeping over consecutive aggregate symbols."""
    from docling_parse_spark.jbig2 import encode_jbig2_symbol_text

    rng = np.random.default_rng(107)
    g = (rng.random((2, 2)) < 0.7).astype(np.uint8)
    h = (rng.random((2, 3)) < 0.6).astype(np.uint8)
    agg1 = [(0, 0, 0), (1, 3, 0), (0, 0, 3), (1, 3, 3)]
    agg2 = [(1, 0, 0), (0, 4, 1), (1, 0, 4)]
    def compose(pl, size):
        out = np.zeros(size, np.uint8)
        for si, x, y in pl:
            bm = [g, h][si]
            out[y:y + bm.shape[0], x:x + bm.shape[1]] |= bm
        return out
    e1, e2 = compose(agg1, (5, 6)), compose(agg2, (6, 7))
    placements = [(2, 1, 1), (3, 9, 1), (2, 1, 8), (3, 9, 8)]
    data = encode_jbig2_symbol_text(
        [g, h], placements, 18, 16,
        refagg_symbols=[("agg", agg1, (5, 6)), ("agg", agg2, (6, 7))])
    page, _ = decode_jbig2(data)
    exp = _expected_page([g, h, e1, e2], placements, 18, 16)
    assert np.array_equal(page, exp)


def test_huffman_refined_text_instances():
    """SBHUFF=1 + SBREFINE: flagged instances decode as BMSIZE-framed
    arithmetic refinements with B.15-coded size deltas, refinement
    contexts persisting across instances."""
    from docling_parse_spark.jbig2 import encode_jbig2_symbol_text_huffman

    rng = np.random.default_rng(109)
    a = (rng.random((6, 5)) < 0.45).astype(np.uint8)
    b = (rng.random((4, 7)) < 0.45).astype(np.uint8)
    ta = (a ^ (rng.random(a.shape) < 0.2)).astype(np.uint8)  # same-size
    tb = (rng.random((6, 9)) < 0.45).astype(np.uint8)        # grown
    tc = (rng.random((4, 4)) < 0.45).astype(np.uint8)        # shrunken
    placements = [(0, 1, 1), (1, 9, 1), (0, 20, 1), (1, 1, 10), (0, 14, 10)]
    refined = {1: ta, 3: tb, 4: tc}
    data = encode_jbig2_symbol_text_huffman([a, b], placements, 32, 18,
                                            refined=refined)
    page, _ = decode_jbig2(data)
    exp = np.zeros((18, 32), np.uint8)
    for pidx, (i, x, y) in enumerate(placements):
        bm = refined.get(pidx, [a, b][i])
        exp[y:y + bm.shape[0], x:x + bm.shape[1]] |= bm
    assert np.array_equal(page, exp)


# ------------------------------------------------- hypothesis fuzzing

from hypothesis import given, settings, strategies as st


@st.composite
def _sym_corpus(draw):
    """Random symbol set + placements + profile knobs for a round trip."""
    rng = np.random.default_rng(draw(st.integers(0, 2**32 - 1)))
    n_syms = draw(st.integers(1, 5))
    syms = []
    for _ in range(n_syms):
        h = draw(st.integers(1, 9))
        w = draw(st.integers(1, 11))
        syms.append((rng.random((h, w)) < draw(
            st.floats(0.05, 0.95))).astype(np.uint8))
    n_place = draw(st.integers(1, 7))
    placements = [(draw(st.integers(0, n_syms - 1)),
                   draw(st.integers(0, 30)), draw(st.integers(0, 20)))
                  for _ in range(n_place)]
    return syms, placements


@settings(max_examples=60, deadline=None)
@given(corpus=_sym_corpus(),
       huffman=st.booleans(),
       refcorner=st.integers(0, 3),
       transposed=st.booleans(),
       sbstrips=st.sampled_from([1, 2, 4, 8]),
       dsoffset=st.integers(-4, 4),
       mode_bit=st.booleans())
def test_property_symbol_text_round_trip(corpus, huffman, refcorner,
                                         transposed, sbstrips, dsoffset,
                                         mode_bit):
    """Writer -> parser identity across the arithmetic AND Huffman
    profiles for arbitrary symbol sets, placements, corners,
    transposition, strip counts, and DS offsets. mode_bit toggles
    MMR collectives (Huffman) / nothing (arithmetic)."""
    from docling_parse_spark.jbig2 import (encode_jbig2_symbol_text,
                                           encode_jbig2_symbol_text_huffman)

    syms, placements = corpus
    W, H = 45, 32
    if huffman:
        data = encode_jbig2_symbol_text_huffman(
            syms, placements, W, H, refcorner=refcorner,
            transposed=transposed, sbstrips=sbstrips, dsoffset=dsoffset,
            mmr_collective=mode_bit)
    else:
        data = encode_jbig2_symbol_text(
            syms, placements, W, H, refcorner=refcorner,
            transposed=transposed, sbstrips=sbstrips, dsoffset=dsoffset)
    page, _ = decode_jbig2(data)
    assert np.array_equal(page, _expected_page(syms, placements, W, H))


@settings(max_examples=40, deadline=None)
@given(seed=st.integers(0, 2**32 - 1),
       template=st.integers(0, 1),
       tpgron=st.booleans(),
       via_intermediate=st.booleans())
def test_property_refinement_round_trip(seed, template, tpgron,
                                        via_intermediate):
    from docling_parse_spark.jbig2 import encode_jbig2_refinement

    rng = np.random.default_rng(seed)
    h = int(rng.integers(1, 24))
    w = int(rng.integers(1, 30))
    base = (rng.random((h, w)) < rng.uniform(0.1, 0.9)).astype(np.uint8)
    target = (base ^ (rng.random((h, w)) < rng.uniform(0, 0.4))).astype(np.uint8)
    data = encode_jbig2_refinement(base, target, template=template,
                                   tpgron=tpgron,
                                   via_intermediate=via_intermediate)
    page, _ = decode_jbig2(data)
    assert np.array_equal(page, target)


@settings(max_examples=40, deadline=None)
@given(seed=st.integers(0, 2**32 - 1),
       n_pats=st.integers(1, 6),
       template=st.integers(0, 2),
       hd_template=st.integers(0, 1),
       mmr=st.booleans(),
       mmr_gray=st.booleans())
def test_property_halftone_round_trip(seed, n_pats, template, hd_template,
                                      mmr, mmr_gray):
    from docling_parse_spark.jbig2 import encode_jbig2_halftone

    rng = np.random.default_rng(seed)
    ph = int(rng.integers(1, 7))
    pw = int(rng.integers(1, 7))
    pats = [(rng.random((ph, pw)) < rng.uniform(0.1, 0.9)).astype(np.uint8)
            for _ in range(n_pats)]
    gray = rng.integers(0, n_pats, size=(int(rng.integers(1, 6)),
                                         int(rng.integers(1, 7))))
    data = encode_jbig2_halftone(pats, gray, template=template,
                                 hd_template=hd_template, mmr_patterns=mmr,
                                 mmr_gray=mmr_gray)
    page, _ = decode_jbig2(data)
    assert np.array_equal(
        page, _halftone_expected(pats, gray, page.shape[1], page.shape[0]))


@settings(max_examples=60, deadline=None)
@given(seed=st.integers(0, 2**32 - 1))
def test_property_custom_huffman_table_round_trip(seed):
    """Random §B.2 custom tables: segment-encode, parse back, and check
    value round trips across the whole representable range."""
    from docling_parse_spark.jbig2 import (_BitReader, _BitWriter,
                                           _decode_table_segment,
                                           _encode_table_segment)

    rng = np.random.default_rng(seed)
    htlow = int(rng.integers(-100, 50))
    n_lines = int(rng.integers(1, 5))
    rlens = [int(rng.integers(0, 6)) for _ in range(n_lines)]
    hthigh = htlow + sum(1 << r for r in rlens)
    # prefix lengths: give every line a distinct long length; always valid
    plens = list(range(2, 2 + n_lines + 2))
    spec = [(plens[i], rlens[i]) for i in range(n_lines)] + \
        [plens[n_lines], plens[n_lines + 1]]
    body, built = _encode_table_segment(spec, htlow, hthigh)
    parsed = _decode_table_segment(body)
    assert parsed.lines == built.lines
    values = sorted({htlow, hthigh - 1, htlow - 1, htlow - 50,
                     hthigh, hthigh + 77})
    bw = _BitWriter()
    for v in values:
        built.encode(bw, v)
    br = _BitReader(bw.getvalue())
    assert [parsed.decode(br) for _ in values] == values


def test_huffman_refagg_dictionary():
    """SDHUFF=1 | SDREFAGG=1: a second Huffman dictionary codes new
    symbols as raw-bit-ID BMSIZE-framed refinements of imported ones,
    or as embedded Huffman text regions aggregating >= 2 instances."""
    from docling_parse_spark.jbig2 import encode_jbig2_symbol_text_huffman

    rng = np.random.default_rng(113)
    a = (rng.random((5, 4)) < 0.5).astype(np.uint8)
    b = (rng.random((4, 6)) < 0.5).astype(np.uint8)
    ra = (a ^ (rng.random(a.shape) < 0.25)).astype(np.uint8)
    agg_pl = [(0, 0, 0), (1, 4, 1), (0, 9, 0)]
    agg_exp = np.zeros((6, 13), np.uint8)
    for si, x, y in agg_pl:
        bm = [a, b][si]
        agg_exp[y:y + bm.shape[0], x:x + bm.shape[1]] |= bm
    # ids 0,1 = dict-1; 2 = refined twin of a; 3 = aggregate
    placements = [(0, 1, 1), (1, 7, 1), (2, 15, 1), (3, 1, 8), (3, 16, 8)]
    data = encode_jbig2_symbol_text_huffman(
        [a, b], placements, 30, 16,
        refagg_symbols=[(0, ra), ("agg", agg_pl, (6, 13))])
    page, _ = decode_jbig2(data)
    exp = _expected_page([a, b, ra, agg_exp], placements, 30, 16)
    assert np.array_equal(page, exp)


def test_huffman_refagg_with_custom_dt_and_mmr():
    """The refagg dictionary composes with the other Huffman knobs
    (custom DT table segment, MMR collectives in dict 1)."""
    from docling_parse_spark.jbig2 import encode_jbig2_symbol_text_huffman

    rng = np.random.default_rng(127)
    a = (rng.random((6, 5)) < 0.45).astype(np.uint8)
    b = (rng.random((3, 3)) < 0.6).astype(np.uint8)
    rb = (b ^ (rng.random(b.shape) < 0.3)).astype(np.uint8)
    placements = [(0, 1, 1), (2, 8, 1), (1, 13, 2), (2, 1, 9)]
    data = encode_jbig2_symbol_text_huffman(
        [a, b], placements, 20, 14, custom_dt=True, mmr_collective=True,
        refagg_symbols=[(1, rb)])
    page, _ = decode_jbig2(data)
    exp = _expected_page([a, b, rb], placements, 20, 14)
    assert np.array_equal(page, exp)
