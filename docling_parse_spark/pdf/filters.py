"""PDF stream filters — from the PDF 32000-1:2008 spec, stdlib only.

The reference gets content/stream filter decoding from qpdf and treats
/FlateDecode as pure transport around image payloads (reference
src/parse/pdf_resources/page_xobject_image.h:1187-1215: "Image-format
filters take priority — /FlateDecode is just transport"). This engine
has no qpdf, so the transport layer is implemented here from the spec:

* ``/FlateDecode``   — zlib inflate + optional /Predictor (PNG 10-15,
                       TIFF 2) reversal (§7.4.4)
* ``/LZWDecode``     — PDF's LZW variant with /EarlyChange (§7.4.4.2)
* ``/ASCIIHexDecode``— §7.4.2 (whitespace-tolerant, ``>`` EOD, odd pad)
* ``/ASCII85Decode`` — §7.4.3 (``z`` shorthand, ``~>`` EOD, partial tail)
* ``/RunLengthDecode`` — §7.4.5 (length-prefixed literal/replicate runs)

All decoders raise ValueError for malformed input (the per-row failure
accounting contract shared by every codec in this repo) and enforce an
output-size cap so a hostile 100-byte bomb cannot allocate unbounded
memory inside an executor.
"""

from __future__ import annotations

import zlib

MAX_OUTPUT = 64 * 1024 * 1024  # decoded-stream cap per payload


def _check_size(n: int, cap: int) -> None:
    if n > cap:
        raise ValueError(f"decoded stream exceeds {cap} byte cap")


def asciihex_decode(data: bytes, cap: int = MAX_OUTPUT) -> bytes:
    """§7.4.2: hex pairs, whitespace ignored, '>' ends, odd digit padded 0."""
    out = bytearray()
    hi = None
    for b in data:
        c = chr(b)
        if c in " \t\r\n\f\x00":
            continue
        if c == ">":
            break
        v = int(c, 16) if c in "0123456789abcdefABCDEF" else None
        if v is None:
            raise ValueError(f"ASCIIHexDecode: invalid character {c!r}")
        if hi is None:
            hi = v
        else:
            out.append((hi << 4) | v)
            hi = None
        _check_size(len(out), cap)
    if hi is not None:
        out.append(hi << 4)
    return bytes(out)


def ascii85_decode(data: bytes, cap: int = MAX_OUTPUT) -> bytes:
    """§7.4.3: base-85 groups, 'z' = 4 zero bytes, '~>' EOD, partial tail."""
    if data[:2] == b"<~":  # optional Adobe leader
        data = data[2:]
    out = bytearray()
    group: list[int] = []
    i, n = 0, len(data)
    while i < n:
        b = data[i]
        c = chr(b)
        if c in " \t\r\n\f\x00":
            i += 1
            continue
        if c == "~":
            break
        if c == "z":
            if group:
                raise ValueError("ASCII85Decode: 'z' inside a group")
            out += b"\x00\x00\x00\x00"
            _check_size(len(out), cap)
            i += 1
            continue
        if not ("!" <= c <= "u"):
            raise ValueError(f"ASCII85Decode: invalid character {c!r}")
        group.append(b - 33)
        if len(group) == 5:
            v = 0
            for g in group:
                v = v * 85 + g
            if v > 0xFFFFFFFF:
                raise ValueError("ASCII85Decode: group overflow")
            out += v.to_bytes(4, "big")
            _check_size(len(out), cap)
            group = []
        i += 1
    if group:
        if len(group) == 1:
            raise ValueError("ASCII85Decode: lone trailing character")
        k = len(group)
        # pad with 'u' (84), decode, keep k-1 bytes (§7.4.3 final group)
        padded = group + [84] * (5 - k)
        v = 0
        for g in padded:
            v = v * 85 + g
        if v > 0xFFFFFFFF:
            raise ValueError("ASCII85Decode: group overflow")
        out += v.to_bytes(4, "big")[: k - 1]
    return bytes(out)


def runlength_decode(data: bytes, cap: int = MAX_OUTPUT) -> bytes:
    """§7.4.5: L<128 -> copy L+1 literal bytes; L>128 -> repeat next byte
    257-L times; 128 = EOD."""
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        length = data[i]
        if length == 128:
            return bytes(out)
        if length < 128:
            run = data[i + 1 : i + 2 + length]
            if len(run) != length + 1:
                raise ValueError("RunLengthDecode: truncated literal run")
            out += run
            i += 2 + length
        else:
            if i + 1 >= n:
                raise ValueError("RunLengthDecode: truncated replicate run")
            out += bytes([data[i + 1]]) * (257 - length)
            i += 2
        _check_size(len(out), cap)
    raise ValueError("RunLengthDecode: missing EOD")


def lzw_decode(data: bytes, early_change: int = 1, cap: int = MAX_OUTPUT) -> bytes:
    """§7.4.4.2: LZW with 256=clear, 257=EOD, code width 9->12 bits; with
    /EarlyChange 1 (default) the width bumps one code early."""
    out = bytearray()
    table: list[bytes] = [bytes([i]) for i in range(256)] + [b"", b""]
    width = 9
    prev: bytes | None = None
    acc = nbits = 0
    for byte in data:
        acc = (acc << 8) | byte
        nbits += 8
        while nbits >= width:
            code = (acc >> (nbits - width)) & ((1 << width) - 1)
            nbits -= width
            if code == 256:  # clear table
                table = table[:258]
                width = 9
                prev = None
                continue
            if code == 257:  # EOD
                return bytes(out)
            if prev is None:
                if code >= len(table):
                    raise ValueError("LZWDecode: first code out of range")
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                table.append(prev + entry[:1])
            elif code == len(table):  # KwKwK case
                entry = prev + prev[:1]
                table.append(entry)
            else:
                raise ValueError("LZWDecode: code out of range")
            out += entry
            _check_size(len(out), cap)
            prev = entry
            if len(table) + early_change >= (1 << width) and width < 12:
                width += 1
    raise ValueError("LZWDecode: missing EOD")


def _reverse_predictor(
    data: bytes, predictor: int, colors: int, bpc: int, columns: int
) -> bytes:
    """§7.4.4.4: TIFF predictor 2 or PNG predictors (10-15, per-row tag)."""
    if predictor <= 1:
        return data
    bpp = max(1, (colors * bpc + 7) // 8)  # bytes per pixel (>=1)
    rowlen = (colors * bpc * columns + 7) // 8
    if predictor == 2:  # TIFF horizontal differencing
        if bpc != 8:
            raise ValueError("TIFF predictor: only 8-bit components supported")
        if rowlen == 0 or len(data) % rowlen:
            raise ValueError("TIFF predictor: data not a whole number of rows")
        out = bytearray(data)
        for r0 in range(0, len(out), rowlen):
            for i in range(r0 + bpp, r0 + rowlen):
                out[i] = (out[i] + out[i - bpp]) & 0xFF
        return bytes(out)
    if 10 <= predictor <= 15:  # PNG: every row prefixed by a filter tag
        stride = rowlen + 1
        if stride == 1 or len(data) % stride:
            raise ValueError("PNG predictor: data not a whole number of rows")
        out = bytearray()
        prior = bytearray(rowlen)
        for r0 in range(0, len(data), stride):
            tag = data[r0]
            row = bytearray(data[r0 + 1 : r0 + stride])
            if tag == 0:
                pass
            elif tag == 1:  # Sub
                for i in range(bpp, rowlen):
                    row[i] = (row[i] + row[i - bpp]) & 0xFF
            elif tag == 2:  # Up
                for i in range(rowlen):
                    row[i] = (row[i] + prior[i]) & 0xFF
            elif tag == 3:  # Average
                for i in range(rowlen):
                    left = row[i - bpp] if i >= bpp else 0
                    row[i] = (row[i] + ((left + prior[i]) >> 1)) & 0xFF
            elif tag == 4:  # Paeth
                for i in range(rowlen):
                    a = row[i - bpp] if i >= bpp else 0
                    b = prior[i]
                    c = prior[i - bpp] if i >= bpp else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                    row[i] = (row[i] + pred) & 0xFF
            else:
                raise ValueError(f"PNG predictor: unknown row filter {tag}")
            out += row
            prior = row
        return bytes(out)
    raise ValueError(f"unsupported /Predictor {predictor}")


def _parms_dict(parms) -> dict:
    """/DecodeParms entries must be dicts (or None/absent); malformed
    descriptors surface as ValueError, not TypeError/AttributeError —
    the per-row handlers catch exactly ValueError. Values are validated
    int-able here so int(None)/int('x') cannot escape either."""
    if parms is None:
        return {}
    if not isinstance(parms, dict):
        raise ValueError(f"DecodeParms entry must be a dict, got {type(parms).__name__}")
    for k in ("Predictor", "Colors", "BitsPerComponent", "Columns", "EarlyChange"):
        if k in parms:
            try:
                int(parms[k])
            except (TypeError, ValueError) as e:
                raise ValueError(f"DecodeParms {k} not an integer: {parms[k]!r}") from e
    return parms


def flate_decode(data: bytes, parms: dict | None = None, cap: int = MAX_OUTPUT) -> bytes:
    """§7.4.4: zlib inflate with a bounded decompressor, then predictor
    reversal per /DecodeParms."""
    d = zlib.decompressobj()
    try:
        out = d.decompress(data, cap + 1)
    except zlib.error as e:
        raise ValueError(f"FlateDecode: {e}") from e
    _check_size(len(out), cap)
    if not d.eof:
        # a truncated deflate stream decompresses without error but never
        # reaches the end-of-stream marker — silently-partial content is
        # worse than a failure record (trailing bytes AFTER eof are fine;
        # PDF producers pad streams with EOLs)
        raise ValueError("FlateDecode: truncated stream (no end-of-stream marker)")
    p = _parms_dict(parms)
    return _reverse_predictor(
        out,
        int(p.get("Predictor", 1)),
        int(p.get("Colors", 1)),
        int(p.get("BitsPerComponent", 8)),
        int(p.get("Columns", 1)),
    )


def _lzw_with_parms(data: bytes, p: dict, cap: int) -> bytes:
    return _reverse_predictor(
        lzw_decode(data, int(p.get("EarlyChange", 1)), cap),
        int(p.get("Predictor", 1)),
        int(p.get("Colors", 1)),
        int(p.get("BitsPerComponent", 8)),
        int(p.get("Columns", 1)),
    )


_DECODERS = {
    "FlateDecode": lambda d, p, cap: flate_decode(d, p, cap),
    "Fl": lambda d, p, cap: flate_decode(d, p, cap),
    "LZWDecode": lambda d, p, cap: _lzw_with_parms(d, _parms_dict(p), cap),
    "LZW": lambda d, p, cap: _DECODERS["LZWDecode"](d, p, cap),
    "ASCIIHexDecode": lambda d, p, cap: asciihex_decode(d, cap),
    "AHx": lambda d, p, cap: asciihex_decode(d, cap),
    "ASCII85Decode": lambda d, p, cap: ascii85_decode(d, cap),
    "A85": lambda d, p, cap: ascii85_decode(d, cap),
    "RunLengthDecode": lambda d, p, cap: runlength_decode(d, cap),
    "RL": lambda d, p, cap: runlength_decode(d, cap),
}


def apply_filters(
    data: bytes,
    filters: list[str] | str | None,
    parms: list[dict | None] | dict | None = None,
    cap: int = MAX_OUTPUT,
) -> bytes:
    """Apply a /Filter chain in order (§7.4.1: first filter listed is the
    first DEcoding step). Leading slashes are tolerated. Image-format
    filters (DCTDecode/CCITTFaxDecode/JPXDecode) are NOT applied here —
    they terminate the chain and hand off to the image codecs, matching
    the reference's 'format filters take priority' routing."""
    if filters is None:
        return data
    if isinstance(filters, str):
        filters = [filters]
    if parms is None or isinstance(parms, dict):
        parms = [parms] * len(filters)
    if len(parms) != len(filters):
        raise ValueError("DecodeParms length does not match Filter length")
    for name, p in zip(filters, parms):
        if not isinstance(name, str):
            raise ValueError(f"filter name must be a string, got {type(name).__name__}")
        name = name.lstrip("/")
        if name in ("DCTDecode", "DCT", "CCITTFaxDecode", "CCF", "JPXDecode", "JBIG2Decode"):
            return data  # hand off to the image codec layer
        fn = _DECODERS.get(name)
        if fn is None:
            raise ValueError(f"unsupported stream filter /{name}")
        data = fn(data, p, cap)
    return data
