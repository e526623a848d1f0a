"""Naive page renderer: cells/shapes -> grayscale PNG bytes.

The reference ships two renderers (src/render/: Blend2D and a naive one)
used for golden-image regression; the north rule replaces pixel output with
``media_ref`` pointers, so this is a DEBUG/regression aid, not a fidelity
renderer: text cells rasterize as filled boxes shaded by render mode,
shapes as outlines. Pure numpy + a from-scratch PNG encoder (zlib is in the
stdlib; no image codecs exist in this environment).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np


def _png_encode(gray: "np.ndarray") -> bytes:
    """8-bit grayscale array (H, W) -> PNG bytes (no external codecs)."""
    h, w = gray.shape

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body)) + tag + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)  # 8-bit grayscale
    raw = b"".join(b"\x00" + gray[y].tobytes() for y in range(h))  # filter 0
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )


PNG_MAGIC = b"\x89PNG\r\n\x1a\n"

# channels per PNG color type (bit depth 8 only)
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def png_decode(data: bytes) -> tuple["np.ndarray", dict]:
    """PNG bytes -> (uint8 array (H, W, channels), meta) — the inverse of
    ``_png_encode``, pure stdlib (zlib inflate + per-scanline filter
    reversal, PNG spec §9: None/Sub/Up/Average/Paeth). Supports bit depth 8,
    color types 0/2/3/4/6 (palette resolved through PLTE), no interlacing.
    The reference decodes embedded images on demand the same way
    (src/parse/pdf_resources/page_xobject_image.h — its codecs are C++;
    PNG's DEFLATE layer is the one stdlib covers)."""
    if data[:8] != PNG_MAGIC:
        raise ValueError("not a PNG")
    pos = 8
    width = height = None
    bitdepth = color_type = interlace = None
    palette = None
    idat = bytearray()
    while pos + 8 <= len(data):
        (length,) = struct.unpack_from(">I", data, pos)
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            width, height, bitdepth, color_type, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
        elif tag == b"PLTE":
            palette = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3)
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
    if width is None:
        raise ValueError("PNG missing IHDR")
    if bitdepth != 8 or color_type not in _PNG_CHANNELS:
        raise NotImplementedError(f"PNG bitdepth={bitdepth} color_type={color_type}")
    if interlace:
        raise NotImplementedError("interlaced PNG")
    ch = _PNG_CHANNELS[color_type]
    stride = width * ch
    expected = height * (stride + 1)
    # bounded inflate: a hostile IDAT bomb must hit the length check, not
    # allocate its full multi-GB output first (round-4 review)
    d = zlib.decompressobj()
    raw = d.decompress(bytes(idat), expected + 1)
    if len(raw) != expected or not d.eof:
        raise ValueError("PNG data length mismatch")
    out = np.zeros((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int64)
    for y in range(height):
        ftype = raw[y * (stride + 1)]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=y * (stride + 1) + 1
        ).astype(np.int64)
        if ftype == 0:  # None
            recon = line
        elif ftype == 2:  # Up
            recon = (line + prev) & 0xFF
        elif ftype == 1:  # Sub: left-neighbor accumulation == per-channel
            # cumulative sum mod 256 along x (vectorized; the per-pixel
            # loop dominated decode wall time on large images — r4 review)
            recon = (line.reshape(width, ch).cumsum(axis=0) & 0xFF).reshape(stride)
        elif ftype == 3:  # Average
            recon = line.copy()
            for x in range(stride):
                left = recon[x - ch] if x >= ch else 0
                recon[x] = (recon[x] + (left + prev[x]) // 2) & 0xFF
        elif ftype == 4:  # Paeth
            recon = line.copy()
            for x in range(stride):
                a = recon[x - ch] if x >= ch else 0
                b = prev[x]
                c = prev[x - ch] if x >= ch else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                recon[x] = (recon[x] + pred) & 0xFF
        else:
            raise ValueError(f"PNG filter type {ftype}")
        out[y] = recon.astype(np.uint8)
        prev = recon
    arr = out.reshape(height, width, ch)
    if color_type == 3:
        if palette is None:
            raise ValueError("paletted PNG missing PLTE")
        arr = palette[arr[:, :, 0]]
    meta = {"width": width, "height": height, "color_type": color_type, "channels": arr.shape[2]}
    return arr, meta


def render_page_png(
    cells,
    shapes=(),
    page_width: float = 612.0,
    page_height: float = 792.0,
    scale: float = 0.5,
) -> bytes:
    """Rasterize a decoded page (PDF y-up -> image y-down). Cells paint as
    filled gray boxes (invisible render modes 3/7 lighter); shapes paint
    their bbox outline. Deterministic; for goldens and debugging."""
    w = max(1, int(page_width * scale))
    h = max(1, int(page_height * scale))
    img = np.full((h, w), 255, dtype=np.uint8)

    def to_px(x, y):
        col = int(max(0, min(w - 1, x * scale)))
        row = int(max(0, min(h - 1, (page_height - y) * scale)))
        return row, col

    for c in cells:
        xs = (c.r_x0, c.r_x1, c.r_x2, c.r_x3)
        ys = (c.r_y0, c.r_y1, c.r_y2, c.r_y3)
        r1, c0 = to_px(min(xs), max(ys))
        r0, c1 = to_px(max(xs), min(ys))
        # NOTE: to_px flips y, so min(y) -> bottom row
        top, bot = min(r0, r1), max(r0, r1)
        left, right = min(c0, c1), max(c0, c1)
        shade = 230 if getattr(c, "rendering_mode", 0) in (3, 7) else 120
        img[top : bot + 1, left : right + 1] = np.minimum(
            img[top : bot + 1, left : right + 1], shade
        )
    for s in shapes:
        if not s.points:
            continue
        xs = [p[0] for p in s.points]
        ys = [p[1] for p in s.points]
        r1, c0 = to_px(min(xs), max(ys))
        r0, c1 = to_px(max(xs), min(ys))
        top, bot = min(r0, r1), max(r0, r1)
        left, right = min(c0, c1), max(c0, c1)
        img[top, left : right + 1] = 0
        img[bot, left : right + 1] = 0
        img[top : bot + 1, left] = 0
        img[top : bot + 1, right] = 0
    return _png_encode(img)
