"""JPEG 2000 (JPX/JP2/J2K) header parsing — metadata only, from spec.

PDFs embed JPEG 2000 via /JPXDecode; the reference decodes them through
an openjpeg wrapper (reference src/parse/utils/jpx/jpx_utils.h — like its
jpeg_utils.h, a library binding, not a from-scratch codec). This
container ships no openjpeg and a from-spec EBCOT entropy decoder is out
of scope, so this module mirrors the metadata-first posture: parse the
JP2 container boxes (ISO/IEC 15444-1 §I.4-I.5) or the raw codestream
SOC/SIZ markers (§A.5.1) to width/height/components, enough to populate
media decode metadata and failure accounting. Full pixel decode raises
NotImplementedError downstream like any other absent codec.

Raises ValueError for malformed input (the per-row handler contract).
"""

from __future__ import annotations

import struct

# 12-byte JP2 signature box: LBox=12, TBox='jP\x20\x20', DBox=0x0D0A870A
JP2_SIGNATURE = b"\x00\x00\x00\x0cjP  \r\n\x87\n"
# raw codestream: SOC marker, always immediately followed by SIZ
J2K_SOC = b"\xff\x4f"


def _parse_siz(data: bytes, pos: int) -> dict:
    """Parse the SIZ segment at ``pos`` (must point at the 0xFF51 marker)."""
    if data[pos : pos + 2] != b"\xff\x51":
        raise ValueError("expected SIZ marker after SOC")
    if pos + 4 > len(data):
        raise ValueError("truncated SIZ header")
    (lsiz,) = struct.unpack(">H", data[pos + 2 : pos + 4])
    seg = data[pos + 4 : pos + 2 + lsiz]
    if lsiz < 38 or len(seg) != lsiz - 2:
        raise ValueError("truncated SIZ segment")
    _rsiz, xsiz, ysiz, xosiz, yosiz = struct.unpack(">HIIII", seg[:18])
    (csiz,) = struct.unpack(">H", seg[34:36])
    width, height = xsiz - xosiz, ysiz - yosiz
    if width <= 0 or height <= 0 or csiz == 0:
        raise ValueError("degenerate SIZ dimensions")
    return {"width": width, "height": height, "components": csiz, "format": "j2k"}


def _iter_boxes(data: bytes, pos: int, end: int):
    """Yield (box_type, payload_start, payload_end) for boxes in [pos, end)."""
    while pos + 8 <= end:
        (lbox,) = struct.unpack(">I", data[pos : pos + 4])
        tbox = data[pos + 4 : pos + 8]
        payload = pos + 8
        if lbox == 1:  # XLBox: 64-bit extended length follows
            if pos + 16 > end:
                raise ValueError("truncated XLBox")
            (xlbox,) = struct.unpack(">Q", data[pos + 8 : pos + 16])
            if xlbox < 16:
                raise ValueError("bad XLBox length")
            payload, box_end = pos + 16, pos + xlbox
        elif lbox == 0:  # box extends to end of file
            box_end = end
        else:
            if lbox < 8:
                raise ValueError("bad box length")
            box_end = pos + lbox
        if box_end > end:
            raise ValueError("box overruns data")
        yield tbox, payload, int(box_end)
        pos = int(box_end)


def parse_jpx_header(data: bytes) -> dict:
    """Parse JP2/J2K header metadata -> {width, height, components, format}.

    JP2 container: walk top-level boxes to the jp2h superbox, read its
    ihdr (height, width, nc). Raw codestream: read SIZ after SOC. The
    codestream is NOT entropy-decoded."""
    try:
        if data[:2] == J2K_SOC:
            return _parse_siz(data, 2)
        if data[:12] != JP2_SIGNATURE:
            raise ValueError("not a JP2/J2K stream")
        for tbox, p0, p1 in _iter_boxes(data, 12, len(data)):
            if tbox == b"jp2h":
                for t2, q0, q1 in _iter_boxes(data, p0, p1):
                    if t2 == b"ihdr":
                        if q1 - q0 < 10:
                            raise ValueError("truncated ihdr")
                        height, width, nc = struct.unpack(">IIH", data[q0 : q0 + 10])
                        if width == 0 or height == 0 or nc == 0:
                            raise ValueError("degenerate ihdr dimensions")
                        return {
                            "width": width,
                            "height": height,
                            "components": nc,
                            "format": "jp2",
                        }
                raise ValueError("jp2h without ihdr")
            if tbox == b"jp2c":
                # contiguous codestream before jp2h: fall back to its SIZ
                if data[p0 : p0 + 2] != J2K_SOC:
                    raise ValueError("jp2c without SOC")
                return _parse_siz(data, p0 + 2)
        raise ValueError("no jp2h or jp2c box found")
    except ValueError:
        raise
    except Exception as e:  # struct.error / IndexError on hostile bytes
        raise ValueError(f"malformed JPX: {type(e).__name__}: {e}") from e


def encode_jp2_header(width: int, height: int, components: int = 1) -> bytes:
    """Minimal, spec-shaped JP2 container carrying ONLY header metadata
    (signature + ftyp + jp2h/ihdr; no codestream) — the deterministic
    test fixture for the header-parse path."""
    if width <= 0 or height <= 0 or components <= 0:
        raise ValueError("need positive dimensions")
    ftyp = b"jp2 " + struct.pack(">I", 0) + b"jp2 "
    ihdr = struct.pack(">IIH", height, width, components) + bytes([7, 7, 0, 0])
    box_ihdr = struct.pack(">I", 8 + len(ihdr)) + b"ihdr" + ihdr
    box_jp2h = struct.pack(">I", 8 + len(box_ihdr)) + b"jp2h" + box_ihdr
    box_ftyp = struct.pack(">I", 8 + len(ftyp)) + b"ftyp" + ftyp
    return JP2_SIGNATURE + box_ftyp + box_jp2h


def encode_jp2(img, levels: int = 3, cb: int = 64,
               bit_depth: int = 8, **j2k_kwargs) -> bytes:
    """(H, W[, C]) unsigned array -> full JP2 container (signature +
    ftyp + jp2h with ihdr/colr + jp2c codestream), lossless 5/3 via
    :mod:`docling_parse_spark.j2k`. Test/fixture infrastructure like
    :func:`encode_jp2_header`, now carrying real decodable pixels."""
    import numpy as np

    from docling_parse_spark.j2k import encode_j2k

    a = np.asarray(img)
    nc = 1 if a.ndim == 2 else a.shape[2]
    code = encode_j2k(a, levels=levels, cb=cb, bit_depth=bit_depth,
                      **j2k_kwargs)
    ihdr = struct.pack(">IIH", a.shape[0], a.shape[1], nc) + bytes(
        [bit_depth - 1, 7, 0, 0])
    box_ihdr = struct.pack(">I", 8 + len(ihdr)) + b"ihdr" + ihdr
    colr = bytes([1, 0, 0]) + struct.pack(">I", 16 if nc == 3 else 17)
    box_colr = struct.pack(">I", 8 + len(colr)) + b"colr" + colr
    jp2h = box_ihdr + box_colr
    box_jp2h = struct.pack(">I", 8 + len(jp2h)) + b"jp2h" + jp2h
    ftyp = b"jp2 " + struct.pack(">I", 0) + b"jp2 "
    box_ftyp = struct.pack(">I", 8 + len(ftyp)) + b"ftyp" + ftyp
    box_jp2c = struct.pack(">I", 8 + len(code)) + b"jp2c" + code
    return JP2_SIGNATURE + box_ftyp + box_jp2h + box_jp2c


def decode_jpx_pixels(data: bytes):
    """JP2 container or raw codestream -> pixel array ((H, W) or
    (H, W, C)). Raises ``ValueError`` for malformed input AND for
    codestream features outside the supported lossless profile (9/7
    wavelet, multiple tiles, ...) so callers can fall back to the
    header-only metadata path."""
    from docling_parse_spark.j2k import decode_j2k

    try:
        if data[:2] == J2K_SOC:
            return decode_j2k(data)
        if data[:12] != JP2_SIGNATURE:
            raise ValueError("not a JP2/J2K stream")
        for tbox, p0, p1 in _iter_boxes(data, 12, len(data)):
            if tbox == b"jp2c":
                return decode_j2k(data[p0:p1])
        raise ValueError("no jp2c codestream box found")
    except ValueError:
        raise
    except Exception as e:  # struct.error / IndexError on hostile bytes
        raise ValueError(f"malformed JPX: {type(e).__name__}: {e}") from e
