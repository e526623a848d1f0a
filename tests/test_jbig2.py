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


def test_unsupported_text_region_raises_not_implemented():
    import struct

    from docling_parse_spark.jbig2 import _seg_header

    stream = _seg_header(0, 0, 1, 4) + struct.pack(">I", 0)  # symbol dict
    with pytest.raises(NotImplementedError, match="symbol dictionary"):
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
