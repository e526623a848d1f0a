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
