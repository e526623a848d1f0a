"""JPEG 2000 codec tests (docling_parse_spark.j2k + jpx integration).

Layered like the codec: DWT perfect reconstruction, tag-tree round
trips, Tier-1 block-coder round trips, full-codestream matrix, a frozen
known-answer stream pinning the byte format, hostile inputs, and the
multimodal _decode_payload integration. The MQ arithmetic coder itself
is externally anchored by tests/test_jbig2.py's frozen KAT (same Annex-E
coder, shared implementation)."""

import hashlib

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from docling_parse_spark.j2k import (
    TagTreeDecoder,
    TagTreeEncoder,
    _fresh_t1_contexts,
    _HdrBitReader,
    _HdrBitWriter,
    _tier1_block,
    decode_j2k,
    encode_j2k,
    fdwt53,
    idwt53,
)


@pytest.mark.parametrize("shape,levels", [
    ((1, 1), 1), ((1, 7), 2), ((5, 1), 2), ((7, 9), 3), ((8, 8), 3),
    ((13, 17), 4), ((31, 2), 3), ((64, 64), 5)])
def test_dwt53_perfect_reconstruction(shape, levels):
    """Reversible 5/3 lifting inverts exactly at every size parity and
    depth (Annex F, whole-sample symmetric extension)."""
    rng = np.random.default_rng(7)
    img = rng.integers(-300, 300, size=shape)
    assert np.array_equal(idwt53(fdwt53(img, levels)), img)


def test_tag_tree_round_trip():
    """B.10.2 quad-tree: full decode recovers every leaf value; shared
    ancestors code once."""
    rng = np.random.default_rng(11)
    for _ in range(25):
        w, h = int(rng.integers(1, 9)), int(rng.integers(1, 9))
        vals = rng.integers(0, 6, size=(h, w))
        enc = TagTreeEncoder(w, h)
        for j in range(h):
            for i in range(w):
                enc.set(i, j, int(vals[j, i]))
        enc.finalize()
        bw = _HdrBitWriter()
        for j in range(h):
            for i in range(w):
                enc.encode(bw, i, j, 1 << 30)
        br = _HdrBitReader(bw.flush())
        dec = TagTreeDecoder(w, h)
        for j in range(h):
            for i in range(w):
                assert dec.decode(br, i, j, 1 << 30) == vals[j, i]


def test_tag_tree_thresholded_queries():
    """Inclusion-style queries: each answer is min(value, threshold) and
    the decoder state carries across rising thresholds."""
    rng = np.random.default_rng(13)
    w, h = 5, 4
    vals = rng.integers(0, 4, size=(h, w))
    enc = TagTreeEncoder(w, h)
    for j in range(h):
        for i in range(w):
            enc.set(i, j, int(vals[j, i]))
    enc.finalize()
    bw = _HdrBitWriter()
    for t in range(1, 5):
        for j in range(h):
            for i in range(w):
                enc.encode(bw, i, j, t)
    br = _HdrBitReader(bw.flush())
    dec = TagTreeDecoder(w, h)
    for t in range(1, 5):
        for j in range(h):
            for i in range(w):
                assert dec.decode(br, i, j, t) == min(int(vals[j, i]), t)


def test_header_bit_stuffing():
    """B.10.1: after a 0xFF byte only 7 bits follow; a header may not
    end on 0xFF."""
    bw = _HdrBitWriter()
    for _ in range(30):
        bw.bit(1)
    data = bw.flush()
    assert data == bytes([0xFF, 0x7F, 0xFF, 0x7F])
    br = _HdrBitReader(data)
    assert all(br.bit() == 1 for _ in range(30))


@pytest.mark.parametrize("band", ["LL", "HL", "LH", "HH"])
def test_tier1_block_round_trip(band):
    """EBCOT three-pass coding round-trips magnitudes + signs in every
    band context family (Tables D.1-D.4)."""
    from docling_parse_spark.jbig2 import _MQDecoder, _MQEncoder

    rng = np.random.default_rng(17)
    for _ in range(6):
        w, h = int(rng.integers(1, 20)), int(rng.integers(1, 20))
        mag = (rng.integers(0, 50, size=(h, w))
               * (rng.random((h, w)) < 0.4)).astype(np.int64)
        sgn = ((rng.random((h, w)) < 0.5) & (mag > 0)).astype(np.uint8)
        mx = int(mag.max())
        if mx == 0:
            continue
        p_max = mx.bit_length() - 1
        n_passes = 1 + 3 * p_max
        enc = _MQEncoder()
        ci, cm = _fresh_t1_contexts()
        _tier1_block(enc, ci, cm, w, h, band, p_max, n_passes,
                     mag=mag, sgn=sgn)
        dec = _MQDecoder(enc.finish())
        ci2, cm2 = _fresh_t1_contexts()
        m2, s2 = _tier1_block(dec, ci2, cm2, w, h, band, p_max, n_passes)
        assert np.array_equal(m2, mag)
        assert np.array_equal(s2 * (m2 > 0), sgn)


@pytest.mark.parametrize("shape,levels,cb", [
    ((1, 1), 0, 4), ((8, 8), 1, 4), ((37, 29), 3, 64), ((65, 64), 2, 64),
    ((17, 130), 4, 32), ((5, 3), 2, 8)])
def test_codestream_round_trip_gray(shape, levels, cb):
    rng = np.random.default_rng(19)
    img = rng.integers(0, 256, size=shape, dtype=np.uint8)
    assert np.array_equal(decode_j2k(encode_j2k(img, levels=levels, cb=cb)),
                          img)


def test_codestream_round_trip_rgb_rct():
    """Three components ride the reversible colour transform (Annex G)."""
    rng = np.random.default_rng(23)
    img = rng.integers(0, 256, size=(23, 31, 3), dtype=np.uint8)
    assert np.array_equal(decode_j2k(encode_j2k(img, levels=3)), img)
    assert np.array_equal(decode_j2k(encode_j2k(img, levels=2, mct=False)),
                          img)


def test_codestream_round_trip_12bit():
    rng = np.random.default_rng(29)
    img = rng.integers(0, 4096, size=(19, 21), dtype=np.uint16)
    out = decode_j2k(encode_j2k(img, levels=2, bit_depth=12))
    assert out.dtype == np.uint16
    assert np.array_equal(out, img)


def test_smooth_image_compresses():
    """A gradient exercises the run-length mode and must compress far
    below 1 bit/px while staying lossless."""
    x = np.arange(64)
    y = np.arange(48)[:, None]
    img = ((x + y) % 256).astype(np.uint8)
    data = encode_j2k(img, levels=3)
    assert np.array_equal(decode_j2k(data), img)
    assert len(data) < img.size // 8


def test_frozen_known_answer():
    """Byte-level format pin: silent drift in EITHER side of the codec
    (DWT, Tier-1 contexts, packet headers, markers) breaks this hash.
    The decode-back check keeps the pair honest if the hash is ever
    deliberately refreshed."""
    x = np.arange(40)
    y = np.arange(24)[:, None]
    img = ((3 * x + 5 * y + (x * y) % 7) % 256).astype(np.uint8)
    data = encode_j2k(img, levels=2, cb=32)
    assert np.array_equal(decode_j2k(data), img)
    assert hashlib.sha256(data).hexdigest() == (
        "873cfbadc7a098284f68c4aa0df458773dad3ed4ca60befd79f06f9271d778cf")


@settings(max_examples=40, deadline=None)
@given(seed=st.integers(0, 2**32 - 1),
       levels=st.integers(0, 4),
       cb=st.sampled_from([8, 16, 32, 64]),
       nc=st.sampled_from([1, 3]))
def test_property_codestream_round_trip(seed, levels, cb, nc):
    rng = np.random.default_rng(seed)
    h = int(rng.integers(1, 40))
    w = int(rng.integers(1, 40))
    shape = (h, w) if nc == 1 else (h, w, nc)
    # mix of noise and structure so both sparse and dense paths run
    img = rng.integers(0, 256, size=shape, dtype=np.uint8)
    if rng.random() < 0.5:
        img[: h // 2] //= 16
    assert np.array_equal(decode_j2k(encode_j2k(img, levels=levels, cb=cb)),
                          img)


@pytest.mark.parametrize("shape,levels", [
    ((1, 1), 1), ((7, 9), 3), ((13, 17), 4), ((1, 8), 2)])
def test_dwt97_self_inversion(shape, levels):
    """The 9/7 float lifting chain inverts to machine precision."""
    from docling_parse_spark.j2k import fdwt97, idwt97

    rng = np.random.default_rng(43)
    img = rng.normal(0, 100, size=shape)
    assert np.abs(idwt97(fdwt97(img, levels)) - img).max() < 1e-9


def test_irreversible_round_trip_bounded():
    """9/7 + quarter-step scalar quantization reconstructs within one
    grey level (gray exactly; ICT floats may round off by one)."""
    rng = np.random.default_rng(47)
    img = rng.integers(0, 256, size=(37, 29), dtype=np.uint8)
    out = decode_j2k(encode_j2k(img, levels=3, irreversible=True))
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 1
    rgb = rng.integers(0, 256, size=(21, 17, 3), dtype=np.uint8)
    out = decode_j2k(encode_j2k(rgb, levels=2, irreversible=True))
    assert np.abs(out.astype(int) - rgb.astype(int)).max() <= 1


def test_irreversible_coarse_quantization_lossy_but_close():
    """Unit-step quantization (quant_extra_bits=0) is genuinely lossy
    yet bounded by the synthesis gain of the 9/7 filter bank."""
    rng = np.random.default_rng(53)
    img = rng.integers(0, 256, size=(32, 32), dtype=np.uint8)
    fine = encode_j2k(img, levels=3, irreversible=True)
    coarse = encode_j2k(img, levels=3, irreversible=True,
                        quant_extra_bits=0)
    assert len(coarse) < len(fine)
    out = decode_j2k(coarse)
    err = np.abs(out.astype(int) - img.astype(int))
    assert 0 < err.max() <= 8
    assert err.mean() < 2.0


def test_irreversible_frozen_known_answer():
    """Byte-format pin for the 9/7 lane (markers, QCD expounded entries,
    quantized Tier-1 payloads)."""
    x = np.arange(40)
    y = np.arange(24)[:, None]
    img = ((3 * x + 5 * y + (x * y) % 7) % 256).astype(np.uint8)
    data = encode_j2k(img, levels=2, cb=32, irreversible=True)
    out = decode_j2k(data)
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 1
    assert hashlib.sha256(data).hexdigest() == (
        "273cd9fa5dcd533f8e81a5f914e6ced7331dcd9329e78f3c4438361898b1c6b0")


def test_qcd_cod_mismatch_typed():
    """A 5/3 COD with an expounded QCD (or the reverse) is malformed."""
    rng = np.random.default_rng(59)
    img = rng.integers(0, 256, size=(16, 16), dtype=np.uint8)
    good = encode_j2k(img, levels=1, irreversible=True)
    bad = bytearray(good)
    cod_at = bad.find(b"\xff\x52")
    bad[cod_at + 13] = 1  # claim 5/3 against the expounded QCD
    with pytest.raises(ValueError, match="mismatch"):
        decode_j2k(bytes(bad))
    # scalar-derived QCD style: typed refusal
    bad = bytearray(good)
    qcd_at = bad.find(b"\xff\x5c")
    bad[qcd_at + 4] = (bad[qcd_at + 4] & 0xE0) | 1
    with pytest.raises(ValueError, match="QCD"):
        decode_j2k(bytes(bad))


def test_hostile_inputs_typed():
    """Truncation and unsupported profile features surface as ValueError
    (per-file accounted), never as raw struct/index errors or hangs."""
    rng = np.random.default_rng(31)
    img = rng.integers(0, 256, size=(16, 16), dtype=np.uint8)
    good = encode_j2k(img, levels=1)
    for cut in (1, 4, 40, len(good) // 2, len(good) - 3):
        with pytest.raises(ValueError):
            decode_j2k(bytes(good[:cut]))
    # flip the wavelet byte to 9/7 against the reversible QCD: typed
    bad = bytearray(good)
    cod_at = bad.find(b"\xff\x52")
    bad[cod_at + 13] = 0  # SPcod transform byte
    with pytest.raises(ValueError, match="mismatch"):
        decode_j2k(bytes(bad))
    # an unknown wavelet id is typed too
    bad[cod_at + 13] = 7
    with pytest.raises(ValueError, match="wavelet"):
        decode_j2k(bytes(bad))
    # multi-tile SIZ: typed refusal
    bad = bytearray(good)
    siz_at = bad.find(b"\xff\x51")
    bad[siz_at + 25] = 1  # XTsiz low byte -> tile smaller than image
    with pytest.raises(ValueError, match="tile"):
        decode_j2k(bytes(bad))
    with pytest.raises(ValueError):
        decode_j2k(b"\x00" * 16)
    # semantics-bearing markers (COC here) refuse typed instead of
    # silently mis-decoding
    import struct as _s

    bad = bytearray(good)
    siz_at = bad.find(b"\xff\x51")
    siz_ln = _s.unpack_from(">H", bad, siz_at + 2)[0]
    coc = _s.pack(">HH", 0xFF53, 4) + b"\x00\x00"
    bad[siz_at + 2 + siz_ln:siz_at + 2 + siz_ln] = coc
    with pytest.raises(ValueError, match="COC"):
        decode_j2k(bytes(bad))


def test_hostile_fuzz_valueerror_only():
    """Random bytes through decode_jpx_pixels (the ingest-facing entry)
    raise ValueError only — no struct/index errors, hangs, or huge
    allocations escape into Spark tasks."""
    from docling_parse_spark.jpx import JP2_SIGNATURE, decode_jpx_pixels

    rng = np.random.default_rng(61)
    good = encode_j2k(
        rng.integers(0, 256, size=(12, 12), dtype=np.uint8), levels=1)

    @settings(max_examples=120, deadline=None)
    @given(st.binary(max_size=150))
    def run(data):
        for payload in (data, b"\xff\x4f" + data, JP2_SIGNATURE + data,
                        good[:20] + data):
            try:
                decode_jpx_pixels(payload)
            except ValueError:
                pass

    run()


def test_encoder_input_validation():
    with pytest.raises(ValueError):
        encode_j2k(np.zeros((0, 4), dtype=np.uint8))
    with pytest.raises(ValueError):
        encode_j2k(np.full((4, 4), 300), bit_depth=8)
    with pytest.raises(ValueError):
        encode_j2k(np.zeros((4, 4), dtype=np.uint8), cb=7)


def test_jp2_container_round_trip():
    from docling_parse_spark.jpx import (
        decode_jpx_pixels,
        encode_jp2,
        parse_jpx_header,
    )

    rng = np.random.default_rng(37)
    img = rng.integers(0, 256, size=(21, 33), dtype=np.uint8)
    jp2 = encode_jp2(img, levels=2)
    assert np.array_equal(decode_jpx_pixels(jp2), img)
    m = parse_jpx_header(jp2)
    assert (m["width"], m["height"], m["components"]) == (33, 21, 1)
    rgb = rng.integers(0, 256, size=(12, 10, 3), dtype=np.uint8)
    assert np.array_equal(decode_jpx_pixels(encode_jp2(rgb)), rgb)


def test_multimodal_decode_payload_jpx():
    """_decode_payload now yields real pixels for the lossless profile
    and falls back to the header-only row otherwise."""
    from docling_parse_spark.jpx import encode_jp2, encode_jp2_header
    from docling_parse_spark.operators.multimodal import _decode_payload

    rng = np.random.default_rng(41)
    img = rng.integers(0, 256, size=(14, 18), dtype=np.uint8)
    m = _decode_payload(encode_jp2(img, levels=2))
    assert np.array_equal(m["pixels"], img)
    assert "header_only" not in m
    rgb = rng.integers(0, 256, size=(9, 8, 3), dtype=np.uint8)
    m = _decode_payload(encode_jp2(rgb))
    assert m["pixels"].shape == (9, 8)
    assert np.array_equal(
        m["pixels"], rgb.astype(np.int64).sum(axis=2) // 3)
    m2 = _decode_payload(encode_jp2_header(40, 30, 3))
    assert m2["header_only"] is True and "pixels" not in m2
