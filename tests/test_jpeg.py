"""Baseline JPEG codec: encode->decode round trips, hostile inputs, and
the multimodal dispatch (reference parity:
/root/reference/src/parse/utils/jpeg/jpeg_utils.h, decode-on-demand via
page_xobject_image.h)."""

import numpy as np
import pytest

from docling_parse_spark.jpeg import decode_jpeg, encode_jpeg


def test_flat_gray_roundtrip_exact():
    """A flat block has only DC energy — survives quantization exactly."""
    flat = np.full((17, 23), 200, dtype=np.uint8)
    arr, meta = decode_jpeg(encode_jpeg(flat, quality=95))
    assert (meta["height"], meta["width"], meta["channels"]) == (17, 23, 1)
    assert arr.shape == (17, 23)
    assert int(np.abs(arr.astype(int) - 200).max()) == 0


def test_gray_gradient_tight_error():
    y, x = np.mgrid[0:40, 0:56]
    grad = ((x * 3 + y * 2) % 256).astype(np.uint8)
    arr, _ = decode_jpeg(encode_jpeg(grad, quality=95))
    assert int(np.abs(arr.astype(int) - grad.astype(int)).max()) <= 2


def test_rgb_roundtrip_bounded_error():
    y, x = np.mgrid[0:33, 0:25]
    grad = ((x * 5 + y * 3) % 256).astype(np.uint8)
    rgb = np.stack([grad, np.flipud(grad), np.fliplr(grad)], axis=2)
    arr, meta = decode_jpeg(encode_jpeg(rgb, quality=95))
    assert meta["channels"] == 3 and arr.shape == (33, 25, 3)
    # chroma transform + quantization: small bounded error
    assert int(np.abs(arr.astype(int) - rgb.astype(int)).max()) <= 6


def test_non_multiple_of_8_dims():
    """Edge-padded partial blocks crop back to the exact source dims."""
    img = np.arange(5 * 13, dtype=np.uint8).reshape(5, 13) * 3
    arr, meta = decode_jpeg(encode_jpeg(img, quality=95))
    assert arr.shape == (5, 13)
    assert int(np.abs(arr.astype(int) - img.astype(int)).max()) <= 3


@pytest.mark.parametrize("bad", [
    b"",
    b"\x89PNG",
    b"\xff\xd8\xff\xd9",                  # SOI+EOI, no scan
    b"\xff\xd8\xff\xdb\x00\x05\x00\x01",  # truncated DQT
])
def test_malformed_jpegs_raise_valueerror(bad):
    with pytest.raises(ValueError):
        decode_jpeg(bad)


def test_truncated_scan_raises():
    full = encode_jpeg(np.full((16, 16), 77, dtype=np.uint8))
    with pytest.raises(ValueError):
        decode_jpeg(full[: len(full) // 2])


def test_progressive_rejected_with_reason():
    """SOF2 must be refused explicitly, not mis-decoded."""
    flat = encode_jpeg(np.full((8, 8), 10, dtype=np.uint8))
    hacked = flat.replace(b"\xff\xc0", b"\xff\xc2", 1)
    with pytest.raises(ValueError, match="baseline"):
        decode_jpeg(hacked)


def test_multimodal_dispatch_jpeg():
    """A real JPEG payload flows through the same media pipeline as PNG:
    decode metadata + luma pixels for feature extraction."""
    from docling_parse_spark.operators.multimodal import _decode_payload, _image_pixels

    y, x = np.mgrid[0:12, 0:20]
    img = ((x * 7 + y * 11) % 256).astype(np.uint8)
    m = _decode_payload(encode_jpeg(img, quality=95))
    assert m["media_type"] == "image" and (m["width"], m["height"]) == (20, 12)
    assert int(np.abs(_image_pixels(m).astype(int) - img.astype(int)).max()) <= 2


def test_multimodal_dispatch_jpeg_rgb_luma():
    from docling_parse_spark.operators.multimodal import _decode_payload, _image_pixels

    rgb = np.zeros((9, 9, 3), dtype=np.uint8)
    rgb[:, :, 0] = 120
    rgb[:, :, 1] = 60
    rgb[:, :, 2] = 240
    m = _decode_payload(encode_jpeg(rgb, quality=95))
    luma = _image_pixels(m)
    assert luma.shape == (9, 9)
    assert abs(int(luma.mean()) - 140) <= 4  # channel mean (120+60+240)/3


def test_restart_interval_roundtrip():
    """DRI + RSTn markers (the real-world error-resilience layout): the
    decoder resyncs at byte boundaries and resets DC prediction."""
    y, x = np.mgrid[0:40, 0:56]  # 5x7 = 35 MCUs
    grad = ((x * 3 + y * 2) % 256).astype(np.uint8)
    for ri in (1, 3, 8):
        enc = encode_jpeg(grad, quality=95, restart_interval=ri)
        assert b"\xff\xdd" in enc  # DRI present
        arr, _ = decode_jpeg(enc)
        assert int(np.abs(arr.astype(int) - grad.astype(int)).max()) <= 2
    rgb = np.stack([grad, np.flipud(grad), np.fliplr(grad)], axis=2)
    arr, _ = decode_jpeg(encode_jpeg(rgb, quality=95, restart_interval=4))
    assert int(np.abs(arr.astype(int) - rgb.astype(int)).max()) <= 6


def test_420_subsampling_roundtrip():
    """4:2:0 (the dominant real-world layout): smaller files, bounded
    error on smooth content, composes with restart intervals."""
    y, x = np.mgrid[0:41, 0:57]
    sm = np.clip(np.round(np.stack([
        100 + 60 * np.sin(x / 9.0) + 40 * np.cos(y / 7.0),
        120 + 50 * np.cos(x / 11.0),
        90 + 70 * np.sin((x + y) / 13.0)], axis=2)), 0, 255).astype(np.uint8)
    enc444 = encode_jpeg(sm, quality=95)
    enc420 = encode_jpeg(sm, quality=95, subsampling="420")
    assert len(enc420) < len(enc444)
    a420, meta = decode_jpeg(enc420)
    assert meta["channels"] == 3 and a420.shape == sm.shape
    assert int(np.abs(a420.astype(int) - sm.astype(int)).max()) <= 16
    assert float(np.abs(a420.astype(float) - sm.astype(float)).mean()) <= 4.0
    a, _ = decode_jpeg(encode_jpeg(sm, quality=95, subsampling="420", restart_interval=3))
    assert int(np.abs(a.astype(int) - sm.astype(int)).max()) <= 16


def test_420_flat_color_exact_chroma():
    """A flat color image survives 4:2:0 exactly (DC-only in all planes,
    constant chroma unaffected by downsampling)."""
    rgb = np.zeros((24, 40, 3), dtype=np.uint8)
    rgb[:, :, 0], rgb[:, :, 1], rgb[:, :, 2] = 200, 100, 50
    arr, _ = decode_jpeg(encode_jpeg(rgb, quality=95, subsampling="420"))
    assert int(np.abs(arr.astype(int) - rgb.astype(int)).max()) <= 2


def test_hostile_jpeg_bytes_raise_valueerror_only():
    """Arbitrary bytes (including SOI-prefixed garbage) either decode or
    raise ValueError — never another exception type (the per-row handlers
    in multimodal catch exactly ValueError/NotImplementedError)."""
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=150, deadline=None)
    @given(st.binary(max_size=120))
    def run(data):
        for payload in (data, b"\xff\xd8" + data):
            try:
                decode_jpeg(payload)
            except ValueError:
                pass

    run()


def test_hostile_truncations_of_valid_jpeg():
    """Every truncation point of a real JPEG raises ValueError cleanly."""
    enc = encode_jpeg(np.arange(64, dtype=np.uint8).reshape(8, 8))
    for cut in range(0, len(enc), 7):
        try:
            decode_jpeg(enc[:cut])
        except ValueError:
            pass


def test_advice_r03_short_segment_payloads_raise_valueerror():
    """ADVICE r03: short SOF/DRI/SOS segments reached struct.unpack /
    indexing and leaked struct.error or IndexError out of decode_jpeg,
    killing Spark tasks whose per-row handlers catch ValueError only.
    The exact reported repro plus the sibling short-segment shapes."""
    import pytest

    repros = [
        b"\xff\xd8\xff\xc0\x00\x04\x08\x00",          # SOF seglen=4 -> seg[:6] short
        b"\xff\xd8\xff\xdd\x00\x02",                  # DRI with empty seg
        b"\xff\xd8\xff\xdd\x00\x03\x01",              # DRI with 1-byte seg
        b"\xff\xd8\xff\xda\x00\x02",                  # SOS with empty seg
        b"\xff\xd8\xff\xc0\x00\x08\x08\x00\x01\x00\x01\x01\xff\xda\x00\x02",
    ]
    for payload in repros:
        with pytest.raises(ValueError):
            decode_jpeg(payload)
