"""Multimodal plumbing tests: schema, decode stub, features, resize, frames."""

import numpy as np
import pytest

from docling_parse_spark.operators.multimodal import (
    _pixels,
    decode_media,
    encode_fake,
    image_features,
    resize_images,
    sample_video_frames,
    synth_media_df,
)


@pytest.fixture(scope="module")
def media_df(spark):
    return synth_media_df(spark, 40, seed=42, num_partitions=4).cache()


def test_synth_deterministic(spark, media_df):
    again = synth_media_df(spark, 40, seed=42, num_partitions=2)
    a = {r["media_ref"]: bytes(r["payload"]) for r in media_df.collect()}
    b = {r["media_ref"]: bytes(r["payload"]) for r in again.collect()}
    assert a == b  # partitioning-independent generation


def test_decode_metadata_roundtrip(media_df):
    meta = {r["media_ref"]: r for r in decode_media(media_df).collect()}
    orig = {r["media_ref"]: r for r in media_df.collect()}
    assert all(m["ok"] for m in meta.values())
    for ref, o in orig.items():
        m = meta[ref]
        assert (m["media_type"], m["width"], m["height"], m["n_frames"]) == (
            o["media_type"], o["width"], o["height"], o["n_frames"],
        )


def test_real_codec_is_stubbed(spark):
    import pandas as pd

    from docling_parse_spark.operators.multimodal import MEDIA_SCHEMA

    gif_ish = b"GIF89a" + b"\x00" * 26
    df = spark.createDataFrame(
        [("m-real", "image", bytearray(gif_ish), 1, 1, 1)], schema=MEDIA_SCHEMA
    )
    out = decode_media(df).collect()[0]
    assert not out["ok"] and out["error"] == "NotImplementedError"


def test_image_features(media_df):
    feats = image_features(media_df).collect()
    n_images = media_df.filter("media_type = 'image'").count()
    assert len(feats) == n_images
    for r in feats:
        assert 0.0 <= r["mean"] <= 255.0
        assert r["p_low"] <= r["p_high"]


def test_resize_shapes_and_content(media_df):
    thumbs = {r["media_ref"]: r for r in resize_images(media_df, max_side=16).collect()}
    orig = {r["media_ref"]: r for r in media_df.filter("media_type='image'").collect()}
    assert set(thumbs) == set(orig)
    for ref, t in thumbs.items():
        assert max(t["width"], t["height"]) <= 16
        assert len(bytes(t["thumb"])) == t["width"] * t["height"]


def test_video_frame_sampling(media_df):
    frames = sample_video_frames(media_df, every_n=4).collect()
    vids = {r["media_ref"]: r["n_frames"] for r in media_df.filter("media_type='video'").collect()}
    got = {}
    for r in frames:
        got.setdefault(r["media_ref"], []).append(r["frame_idx"])
    assert set(got) == set(vids)
    for ref, idxs in got.items():
        assert idxs == list(range(0, vids[ref], 4))


def test_pixel_function_is_pure():
    a = _pixels(123, 8, 6, 2)
    b = _pixels(123, 8, 6, 2)
    assert np.array_equal(a, b)
    assert a.shape == (6, 8)


def test_encode_header_size():
    assert len(encode_fake("video", 64, 48, 10, 7)) == 15


def test_png_decode_roundtrip_gray():
    """render._png_encode -> render.png_decode round-trips exactly (filter 0,
    grayscale), and the multimodal branch treats the PNG as a real image."""
    import numpy as np

    from docling_parse_spark.operators.multimodal import _decode_payload, _image_pixels
    from docling_parse_spark.render import _png_encode, png_decode

    rng = np.random.RandomState(7)
    gray = rng.randint(0, 256, size=(23, 41), dtype=np.uint8)
    png = _png_encode(gray)
    arr, meta = png_decode(png)
    assert (meta["width"], meta["height"], meta["channels"]) == (41, 23, 1)
    assert np.array_equal(arr[:, :, 0], gray)
    m = _decode_payload(png)
    assert m["media_type"] == "image" and m["width"] == 41 and m["height"] == 23
    assert np.array_equal(_image_pixels(m), gray)


def test_png_decode_all_filters_rgb():
    """Hand-built RGB PNG exercising filters Sub/Up/Average/Paeth decodes to
    the original pixels (spec §9 reversal)."""
    import struct
    import zlib

    import numpy as np

    from docling_parse_spark.render import png_decode

    rng = np.random.RandomState(11)
    h, w, ch = 6, 9, 3
    img = rng.randint(0, 256, size=(h, w, ch), dtype=np.uint8)

    def filt(y, ftype):
        line = img[y].reshape(-1).astype(np.int64)
        prev = img[y - 1].reshape(-1).astype(np.int64) if y else np.zeros(w * ch, dtype=np.int64)
        out = np.zeros_like(line)
        for x in range(w * ch):
            a = line[x - ch] if x >= ch else 0
            b = prev[x]
            c = prev[x - ch] if x >= ch else 0
            if ftype == 0:
                pred = 0
            elif ftype == 1:
                pred = a
            elif ftype == 2:
                pred = b
            elif ftype == 3:
                pred = (a + b) // 2
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            out[x] = (line[x] - pred) & 0xFF
        return bytes([ftype]) + out.astype(np.uint8).tobytes()

    raw = b"".join(filt(y, [0, 1, 2, 3, 4, 4][y]) for y in range(h))

    def chunk(tag, body):
        return struct.pack(">I", len(body)) + tag + body + struct.pack(
            ">I", zlib.crc32(tag + body) & 0xFFFFFFFF)

    png = (b"\x89PNG\r\n\x1a\n"
           + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
           + chunk(b"IDAT", zlib.compress(raw))
           + chunk(b"IEND", b""))
    arr, meta = png_decode(png)
    assert meta["channels"] == 3
    assert np.array_equal(arr, img)


def test_non_png_real_format_still_raises():
    import pytest

    from docling_parse_spark.operators.multimodal import _decode_payload

    with pytest.raises(NotImplementedError):
        _decode_payload(b"GIF89a" + b"\x00" * 10)
    # WAV now decodes for real: a malformed one is error-accounted
    with pytest.raises(ValueError):
        _decode_payload(b"RIFF\x10\x00\x00\x00WAVE" + b"\x00" * 8)
    # JPEG now decodes for real: a malformed one is error-accounted
    with pytest.raises(ValueError):
        _decode_payload(b"\xff\xd8\xff\xe0" + b"\x00" * 16)


def test_malformed_png_is_error_accounted(spark):
    """Truncated IHDR / corrupt IDAT PNGs flow into ok=False rows, never a
    task-killing zlib/struct exception."""
    import pandas as pd

    from docling_parse_spark.operators.multimodal import MEDIA_SCHEMA, decode_media

    bad1 = b"\x89PNG\r\n\x1a\n" + b"\x00\x00\x00\x0dIHDR" + b"\x00" * 4  # truncated
    bad2 = (b"\x89PNG\r\n\x1a\n"
            + b"\x00\x00\x00\x0dIHDR" + b"\x00\x00\x00\x08\x00\x00\x00\x08\x08\x00\x00\x00\x00"
            + b"\x00\x00\x00\x04IDAT" + b"garb" + b"\x00\x00\x00\x00IEND")
    df = spark.createDataFrame(
        pd.DataFrame({
            "media_ref": ["m1", "m2"], "media_type": ["image", "image"],
            "payload": [bad1, bad2], "width": [0, 0], "height": [0, 0], "n_frames": [1, 1],
        }), schema=MEDIA_SCHEMA,
    )
    rows = {r["media_ref"]: (r["ok"], r["error"]) for r in decode_media(df).collect()}
    assert rows["m1"] == (False, "ValueError") and rows["m2"] == (False, "ValueError")


def test_jpeg_payload_through_media_operators(spark):
    """Real baseline-JPEG payloads flow through decode_media and
    image_features like PNG: flat images survive quantization exactly, so
    the feature means are exact."""
    import numpy as np

    from docling_parse_spark.jpeg import encode_jpeg
    from docling_parse_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        decode_media,
        image_features,
    )

    rows = []
    for i, v in enumerate([30, 128, 220]):
        img = np.full((16, 24), v, dtype=np.uint8)
        rows.append((f"m-jpg-{i}", "image", bytearray(encode_jpeg(img, quality=95)), 24, 16, 1))
    df = spark.createDataFrame(rows, schema=MEDIA_SCHEMA)
    dec = {r["media_ref"]: r for r in decode_media(df).collect()}
    assert all(d["ok"] for d in dec.values())
    assert dec["m-jpg-0"]["width"] == 24 and dec["m-jpg-0"]["height"] == 16
    feats = {r["media_ref"]: r["mean"] for r in image_features(df).collect()}
    assert feats == {"m-jpg-0": 30.0, "m-jpg-1": 128.0, "m-jpg-2": 220.0}


def test_resize_emits_real_jpeg_thumbnails(spark):
    """fmt='jpeg' thumbnails are decodable baseline JPEGs with the thumb's
    dims and (for flat sources) exact pixel values."""
    import numpy as np

    from docling_parse_spark.jpeg import decode_jpeg, encode_jpeg
    from docling_parse_spark.operators.multimodal import MEDIA_SCHEMA, resize_images

    img = np.full((64, 48), 99, dtype=np.uint8)
    df = spark.createDataFrame(
        [("m-big", "image", bytearray(encode_jpeg(img, quality=95)), 48, 64, 1)],
        schema=MEDIA_SCHEMA,
    )
    out = resize_images(df, max_side=16, fmt="jpeg").collect()[0]
    arr, meta = decode_jpeg(bytes(out["thumb"]))
    assert (meta["height"], meta["width"]) == (out["height"], out["width"]) == (16, 12)
    assert int(np.abs(arr.astype(int) - 99).max()) == 0


def test_wav_roundtrip_and_audio_features(spark):
    """Real PCM WAV flows through _decode_payload and audio_features;
    lossless, so statistics are exact."""
    import numpy as np

    from docling_parse_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        _decode_payload,
        audio_features,
        decode_media,
    )
    from docling_parse_spark.wav import decode_wav, encode_wav

    mono = (np.arange(100, dtype=np.int64) % 200 - 100).astype(np.int16)
    stereo = np.stack([mono, -mono], axis=1).astype(np.int16)
    arr, meta = decode_wav(encode_wav(stereo, rate=8000))
    assert meta == {"rate": 8000, "channels": 2, "n_samples": 100}
    assert np.array_equal(arr, stereo)

    m = _decode_payload(encode_wav(mono, rate=16000))
    assert m["media_type"] == "audio" and m["frames"] == 100

    df = spark.createDataFrame(
        [("a-0", "audio", bytearray(encode_wav(mono, rate=16000)), 16000, 1, 100)],
        schema=MEDIA_SCHEMA,
    )
    dec = decode_media(df).collect()[0]
    assert dec["ok"] and dec["media_type"] == "audio" and dec["n_frames"] == 100
    feat = audio_features(df).collect()[0]
    assert (feat["rate"], feat["channels"], feat["n_samples"]) == (16000, 1, 100)
    assert feat["duration_sec"] == round(100 / 16000, 6)
    s = mono.astype(np.float64)
    assert feat["rms"] == round(float(np.sqrt((s * s).mean())), 4)
    assert feat["peak"] == int(np.abs(mono.astype(np.int64)).max())


def test_malformed_wav_variants_raise():
    import numpy as np
    import pytest

    from docling_parse_spark.wav import decode_wav, encode_wav

    good = encode_wav(np.zeros(10, dtype=np.int16))
    for bad in (good[:20], good.replace(b"fmt ", b"fmtx"), b"RIFF1234WAVE"):
        with pytest.raises(ValueError):
            decode_wav(bad)


def test_hostile_wav_bytes_raise_valueerror_only():
    from hypothesis import given, settings, strategies as st

    from docling_parse_spark.wav import decode_wav

    @settings(max_examples=150, deadline=None)
    @given(st.binary(max_size=100))
    def run(data):
        for payload in (data, b"RIFF" + data, b"RIFF\x00\x00\x00\x00WAVE" + data):
            try:
                decode_wav(payload)
            except ValueError:
                pass

    run()


def test_advice_r03_empty_data_chunk_wav_is_skipped(spark):
    """ADVICE r03: a WAV whose data chunk is empty decodes to a (0, ch)
    sample array; np.abs(...).max() on it raised outside the per-row try
    in audio_features and killed the task. Such rows must be skipped
    (same posture as non-audio rows), and decode_media still reports the
    header metadata."""
    import struct

    from docling_parse_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        audio_features,
        decode_media,
    )

    fmt = struct.pack("<HHIIHH", 1, 1, 16000, 32000, 2, 16)
    wav = (b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8) + b"WAVE"
           + b"fmt " + struct.pack("<I", len(fmt)) + fmt
           + b"data" + struct.pack("<I", 0))
    df = spark.createDataFrame(
        [("a-empty", "audio", bytearray(wav), 16000, 1, 0)], schema=MEDIA_SCHEMA
    )
    dec = decode_media(df).collect()[0]
    assert dec["ok"] and dec["n_frames"] == 0
    assert audio_features(df).count() == 0  # skipped, not a task kill


def test_jpx_header_parse_and_media_dispatch(spark):
    """VERDICT r03 #6: /JPXDecode payloads (JP2 container or raw J2K
    codestream) yield ok=true metadata through media_decode_meta without
    a pixel decode; feature/resize stages skip header-only rows instead
    of dying."""
    import struct

    import pytest

    from docling_parse_spark.jpx import encode_jp2_header, parse_jpx_header
    from docling_parse_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        _decode_payload,
        decode_media,
        image_features,
        resize_images,
    )

    jp2 = encode_jp2_header(640, 480, components=3)
    m = parse_jpx_header(jp2)
    assert m == {"width": 640, "height": 480, "components": 3, "format": "jp2"}
    d = _decode_payload(jp2)
    assert d["media_type"] == "image" and (d["width"], d["height"]) == (640, 480)
    assert d["header_only"] and d["frames"] == 1

    # raw codestream: SOC + SIZ (Lsiz=41: 38 fixed + 3 per-component bytes)
    siz = struct.pack(">HHIIIIIIIIH", 41, 0, 100, 80, 0, 0, 100, 80, 0, 0, 1)
    j2k = b"\xff\x4f\xff\x51" + siz + bytes([7, 1, 1]) + b"\xff\x93"
    m2 = parse_jpx_header(j2k)
    assert (m2["width"], m2["height"], m2["components"]) == (100, 80, 1)

    df = spark.createDataFrame(
        [("jp2-0", "image", bytearray(jp2), 640, 480, 1),
         ("j2k-0", "image", bytearray(j2k), 100, 80, 1)],
        schema=MEDIA_SCHEMA,
    )
    dec = {r["media_ref"]: r for r in decode_media(df).collect()}
    assert dec["jp2-0"]["ok"] and dec["jp2-0"]["width"] == 640
    assert dec["j2k-0"]["ok"] and dec["j2k-0"]["height"] == 80
    # header-only rows are skipped by pixel stages, not task-killing
    assert image_features(df).count() == 0
    assert resize_images(df).count() == 0

    # hostile JPX bytes raise ValueError only
    for bad in (jp2[:15], jp2[:40], b"\xff\x4f\xff\x51\x00\x05abc",
                jp2.replace(b"ihdr", b"xxxx"),
                b"\x00\x00\x00\x0cjP  \r\n\x87\n" + b"\x00\x00\x00\x01jp2h"):
        with pytest.raises(ValueError):
            parse_jpx_header(bad)


def test_jpx_pixel_rows_flow_through_pixel_stages(spark):
    """With the r6 j2k codec, decodable /JPXDecode payloads carry real
    pixels through the Spark media pipeline: decode_media reports the
    codestream dims and image_features/resize_images no longer skip the
    rows (header-only containers still do)."""
    import numpy as np

    from docling_parse_spark.jpx import encode_jp2, encode_jp2_header
    from docling_parse_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        decode_media,
        image_features,
        resize_images,
    )

    rng = np.random.default_rng(67)
    img = rng.integers(0, 256, size=(40, 50), dtype=np.uint8)
    df = spark.createDataFrame(
        [("jpx-px", "image", bytearray(encode_jp2(img, levels=2)), 50, 40, 1),
         ("jpx-hdr", "image", bytearray(encode_jp2_header(8, 6)), 8, 6, 1)],
        schema=MEDIA_SCHEMA,
    )
    dec = {r["media_ref"]: r for r in decode_media(df).collect()}
    assert dec["jpx-px"]["ok"] and dec["jpx-px"]["width"] == 50
    feats = {r["media_ref"]: r for r in image_features(df).collect()}
    assert set(feats) == {"jpx-px"}  # the header-only row still skips
    assert abs(feats["jpx-px"]["mean"] - float(img.mean())) < 1e-6
    thumbs = {r["media_ref"]: r for r in resize_images(df, max_side=16).collect()}
    assert set(thumbs) == {"jpx-px"}
    assert max(thumbs["jpx-px"]["width"], thumbs["jpx-px"]["height"]) == 16


def test_hostile_jpx_bytes_raise_valueerror_only():
    from hypothesis import given, settings, strategies as st

    from docling_parse_spark.jpx import JP2_SIGNATURE, parse_jpx_header

    @settings(max_examples=150, deadline=None)
    @given(st.binary(max_size=120))
    def run(data):
        for payload in (data, JP2_SIGNATURE + data, b"\xff\x4f" + data):
            try:
                parse_jpx_header(payload)
            except ValueError:
                pass

    run()


def test_review_r4_hostile_fake_and_degenerate_dims(spark):
    """Round-4 review: truncated/corrupt FAKE headers and 0-px dimensions
    must be error-accounted ValueErrors, never task-killing raises from
    the pixel stages."""
    import pytest

    from docling_parse_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        _decode_payload,
        decode_media,
        encode_fake,
        image_features,
        resize_images,
    )

    for bad in (b"FAKE", b"FAKEI\x00", b"FAKEX" + b"\x00" * 10,
                encode_fake("image", 0, 0, 1, 7),
                encode_fake("video", 5, 0, 4, 7)):
        with pytest.raises(ValueError):
            _decode_payload(bad)

    rows = [("f-trunc", "image", bytearray(b"FAKEI\x00"), 0, 0, 1),
            ("f-zero", "image", bytearray(encode_fake("image", 0, 0, 1, 7)), 0, 0, 1),
            ("f-ok", "image", bytearray(encode_fake("image", 8, 8, 1, 7)), 8, 8, 1)]
    df = spark.createDataFrame(rows, schema=MEDIA_SCHEMA)
    dec = {r["media_ref"]: r for r in decode_media(df).collect()}
    assert not dec["f-trunc"]["ok"] and not dec["f-zero"]["ok"] and dec["f-ok"]["ok"]
    assert image_features(df).count() == 1  # hostile rows skipped, no crash
    assert resize_images(df).count() == 1


def test_review_r4_resize_never_upscales(spark):
    from docling_parse_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        encode_fake,
        resize_images,
    )

    df = spark.createDataFrame(
        [("small", "image", bytearray(encode_fake("image", 10, 6, 1, 3)), 10, 6, 1),
         ("big", "image", bytearray(encode_fake("image", 64, 32, 1, 3)), 64, 32, 1)],
        schema=MEDIA_SCHEMA,
    )
    out = {r["media_ref"]: (r["width"], r["height"]) for r in
           resize_images(df, max_side=32).collect()}
    assert out["small"] == (10, 6)   # already within max_side: untouched
    assert out["big"] == (32, 16)    # downscaled as before


def test_content_type_hint_routes_past_jbig2_sniff():
    """r6 review: a magic-less 'raw' payload whose decoded samples begin
    with zero bytes matched the JBIG2 segment-header sniff and surfaced a
    misleading JBIG2 error. With the ingest table's content_type hint the
    row reports the accurate no-codec error; without a hint the sniff
    still routes genuine JBIG2 streams."""
    import pytest

    from docling_parse_spark.operators.multimodal import _decode_payload

    # decoded grayscale samples, dark top-left corner: 00 00 00 00 00 30...
    raw = bytes(4) + b"\x30" + bytes(20)
    with pytest.raises(NotImplementedError, match="decodable formats"):
        _decode_payload(raw, hint="raw")
    # unhinted, the same bytes still sniff as JBIG2 (documented ambiguity)
    with pytest.raises((ValueError, NotImplementedError)):
        _decode_payload(raw)


def test_decode_media_uses_content_type_column(spark):
    """The Spark stage passes the hint through when the media table has a
    content_type column (ingest_pdf_media output)."""
    from docling_parse_spark.operators.multimodal import decode_media, encode_fake

    rows = [
        ("m/raw", "raw", bytes(4) + b"\x30" + bytes(20)),
        ("m/fake", None, encode_fake("image", 4, 3, 1, 7)),
    ]
    df = spark.createDataFrame(
        rows, "media_ref string, content_type string, payload binary")
    out = {r["media_ref"]: r for r in decode_media(df).collect()}
    assert out["m/raw"]["ok"] is False
    assert out["m/raw"]["error"] == "NotImplementedError"
    assert out["m/fake"]["ok"] is True and out["m/fake"]["width"] == 4


def test_jbig2_symbol_text_payload_through_decode_media():
    """A symbol/text-profile JBIG2 payload (the jbig2enc re-encode shape)
    decodes through the media lane like a generic-region one."""
    import numpy as np

    from docling_parse_spark.jbig2 import encode_jbig2_symbol_text
    from docling_parse_spark.operators.multimodal import _decode_payload

    glyph = np.zeros((5, 4), np.uint8)
    glyph[0, :] = 1
    glyph[:, 1] = 1
    payload = encode_jbig2_symbol_text(
        [glyph], [(0, 1, 1), (0, 8, 2)], 16, 9)
    m = _decode_payload(payload, hint="jbig2")
    assert m["media_type"] == "image" and (m["width"], m["height"]) == (16, 9)
    # ink -> luma 0, paper -> 255
    assert m["pixels"][1, 1] == 0 and m["pixels"][0, 0] == 255
