"""Minimal TrueType (sfnt) metrics reader: advance widths for fonts that
embed a font program but ship no /Widths array.

The reference extracts widths/encodings from embedded TrueType/CFF programs
(src/parse/pdf_resources/page_font/base_font.h, exercised by
tests/test_embedded_fonts.py:63-247). We implement the public sfnt layout
(OpenType spec): ``head`` (unitsPerEm), ``hhea`` (numberOfHMetrics),
``hmtx`` (advance widths), ``cmap`` (formats 0/4/6/12 — char -> glyph id).
Widths are returned in PDF text-space units (advance * 1000 / unitsPerEm).

``build_minimal_ttf`` constructs a tiny valid-enough font for tests and the
synthetic corpus (checksums unvalidated — we are a reader, not a renderer).
"""

from __future__ import annotations

import struct


def _u16(b: bytes, o: int) -> int:
    return struct.unpack_from(">H", b, o)[0]


def _u32(b: bytes, o: int) -> int:
    return struct.unpack_from(">I", b, o)[0]


def parse_truetype_metrics(data: bytes) -> dict | None:
    """-> {units_per_em, advances: list[int] (per gid), cmap: {codepoint: gid}}
    or None if the blob isn't a parseable sfnt."""
    try:
        if len(data) < 12:
            return None
        tag = data[:4]
        if tag not in (b"\x00\x01\x00\x00", b"true", b"OTTO", b"ttcf"):
            return None
        base = 0
        if tag == b"ttcf":  # font collection: first font's offset table.
            # TTC table-record offsets are measured from the start of the
            # WHOLE file, so only the directory is read at the font offset
            # — slicing the buffer there misread every table (r4 review).
            base = _u32(data, 12)
            if data[base : base + 4] not in (b"\x00\x01\x00\x00", b"true", b"OTTO"):
                return None
        num_tables = _u16(data, base + 4)
        tables = {}
        for i in range(num_tables):
            rec = base + 12 + 16 * i
            tables[data[rec : rec + 4]] = (_u32(data, rec + 8), _u32(data, rec + 12))
        if b"head" not in tables or b"hhea" not in tables or b"hmtx" not in tables:
            return None
        head_off = tables[b"head"][0]
        units_per_em = _u16(data, head_off + 18) or 1000
        hhea_off = tables[b"hhea"][0]
        num_hmetrics = _u16(data, hhea_off + 34)
        hmtx_off, hmtx_len = tables[b"hmtx"]
        advances = []
        for i in range(num_hmetrics):
            o = hmtx_off + 4 * i
            if o + 2 > hmtx_off + hmtx_len:
                break
            advances.append(_u16(data, o))
        cmap = {}
        if b"cmap" in tables:
            cmap = _parse_cmap(data, tables[b"cmap"][0])
        return {"units_per_em": units_per_em, "advances": advances, "cmap": cmap}
    except (struct.error, IndexError, ValueError):
        return None


def _parse_cmap(data: bytes, off: int) -> dict[int, int]:
    n = _u16(data, off + 2)
    best = None  # prefer (3,10) > (3,1) > (0,*) > (3,0)
    prefs = {(3, 10): 4, (3, 1): 3, (0, 3): 2, (0, 0): 2, (3, 0): 1}
    for i in range(n):
        rec = off + 4 + 8 * i
        pid, eid, sub_off = _u16(data, rec), _u16(data, rec + 2), _u32(data, rec + 4)
        score = prefs.get((pid, eid), 0)
        if best is None or score > best[0]:
            best = (score, off + sub_off)
    if best is None:
        return {}
    sub = best[1]
    fmt = _u16(data, sub)
    out: dict[int, int] = {}
    if fmt == 0:
        for c in range(256):
            gid = data[sub + 6 + c]
            if gid:
                out[c] = gid
    elif fmt == 4:
        seg_x2 = _u16(data, sub + 6)
        segs = seg_x2 // 2
        ends = [_u16(data, sub + 14 + 2 * i) for i in range(segs)]
        starts_off = sub + 16 + seg_x2
        starts = [_u16(data, starts_off + 2 * i) for i in range(segs)]
        deltas_off = starts_off + seg_x2
        deltas = [struct.unpack_from(">h", data, deltas_off + 2 * i)[0] for i in range(segs)]
        rangeoff_off = deltas_off + seg_x2
        for i in range(segs):
            ro = _u16(data, rangeoff_off + 2 * i)
            for c in range(starts[i], min(ends[i], 0xFFFE) + 1):
                if ro == 0:
                    gid = (c + deltas[i]) & 0xFFFF
                else:
                    gi = rangeoff_off + 2 * i + ro + 2 * (c - starts[i])
                    if gi + 2 > len(data):
                        continue
                    gid = _u16(data, gi)
                    if gid:
                        gid = (gid + deltas[i]) & 0xFFFF
                if gid:
                    out[c] = gid
    elif fmt == 6:
        first, count = _u16(data, sub + 6), _u16(data, sub + 8)
        for i in range(count):
            gid = _u16(data, sub + 10 + 2 * i)
            if gid:
                out[first + i] = gid
    elif fmt == 12:
        ngroups = _u32(data, sub + 12)
        for i in range(ngroups):
            g = sub + 16 + 12 * i
            start, end, gid0 = _u32(data, g), _u32(data, g + 4), _u32(data, g + 8)
            for c in range(start, min(end, start + 0x10000) + 1):
                out[c] = gid0 + (c - start)
    return out


def truetype_width(metrics: dict, codepoint: int) -> float | None:
    """Advance width for a Unicode codepoint in 1/1000 em, or None."""
    gid = metrics["cmap"].get(codepoint)
    if gid is None:
        return None
    adv = metrics["advances"]
    if not adv:
        return None
    a = adv[gid] if gid < len(adv) else adv[-1]  # trailing gids repeat last
    return a * 1000.0 / metrics["units_per_em"]


# --------------------------------------------------------------- test build

def build_minimal_ttf(char_widths: dict[str, int], units_per_em: int = 1000) -> bytes:
    """A tiny sfnt with head/hhea/maxp/hmtx + a format-4 cmap mapping each
    char to a fresh gid (gid 0 = notdef, advance 500)."""
    chars = sorted(char_widths, key=ord)
    gids = {c: i + 1 for i, c in enumerate(chars)}
    advances = [500] + [char_widths[c] for c in chars]

    head = bytearray(54)
    struct.pack_into(">HH", head, 18, units_per_em, 0)
    hhea = bytearray(36)
    struct.pack_into(">H", hhea, 34, len(advances))
    maxp = bytearray(6)
    struct.pack_into(">IH", maxp, 0, 0x00010000, len(advances))
    hmtx = b"".join(struct.pack(">Hh", a, 0) for a in advances)

    # format-4 cmap: one segment per char + the required 0xFFFF terminator
    segs = [(ord(c), ord(c), gids[c]) for c in chars] + [(0xFFFF, 0xFFFF, 0)]
    seg_count = len(segs)
    ends = b"".join(struct.pack(">H", e) for _s, e, _g in segs)
    starts = b"".join(struct.pack(">H", s) for s, _e, _g in segs)
    deltas = b"".join(
        struct.pack(">h", (g - s) if g else 1) for s, _e, g in segs
    )
    range_offs = b"\x00\x00" * seg_count
    sub = struct.pack(
        ">HHHHHHH", 4, 16 + 8 * seg_count, 0, seg_count * 2,
        1, 0, 0,
    ) + ends + b"\x00\x00" + starts + deltas + range_offs
    cmap = struct.pack(">HHHHI", 0, 1, 3, 1, 12) + sub

    tabs = [(b"cmap", bytes(cmap)), (b"head", bytes(head)),
            (b"hhea", bytes(hhea)), (b"hmtx", hmtx), (b"maxp", bytes(maxp))]
    n = len(tabs)
    out = bytearray(struct.pack(">IHHHH", 0x00010000, n, 0, 0, 0))
    off = 12 + 16 * n
    body = b""
    for tag, blob in tabs:
        out += tag + struct.pack(">III", 0, off, len(blob))
        pad = (-len(blob)) % 4
        body += blob + b"\x00" * pad
        off += len(blob) + pad
    return bytes(out) + body
