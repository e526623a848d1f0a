"""Type1 (PFA/PFB) font program width reader — the last embedded-program
family after TrueType (pdf/truetype.py) and CFF (pdf/cff.py).

Implements the public Adobe Type1 spec: PFB segment unwrapping, eexec
decryption (r=55665), /lenIV, the /CharStrings dictionary (``/name len RD
<bytes> ND``), per-charstring decryption (r=4330) and just enough charstring
interpretation to read the advance width (``sbx wx hsbw`` / ``sbx sby wx wy
sbw``). ``build_minimal_type1`` emits a valid-enough font for tests.
"""

from __future__ import annotations

import re
import struct

_C1, _C2 = 52845, 22719


def _decrypt(data: bytes, r: int, skip: int) -> bytes:
    out = bytearray()
    for c in data:
        out.append(c ^ (r >> 8))
        r = ((c + r) * _C1 + _C2) & 0xFFFF
    return bytes(out[skip:])


def _encrypt(data: bytes, r: int, lead: int) -> bytes:
    plain = bytes(lead) + data
    out = bytearray()
    for p in plain:
        c = p ^ (r >> 8)
        out.append(c)
        r = ((c + r) * _C1 + _C2) & 0xFFFF
    return bytes(out)


def _unwrap_pfb(data: bytes) -> bytes:
    """PFB 0x80-segmented -> concatenated ascii+binary stream; PFA/raw pass
    through."""
    if not data.startswith(b"\x80"):
        return data
    out = b""
    i = 0
    while i < len(data) and data[i] == 0x80:
        t = data[i + 1]
        if t == 3:  # EOF segment
            break
        ln = struct.unpack_from("<I", data, i + 2)[0]
        out += data[i + 6 : i + 6 + ln]
        i += 6 + ln
    return out


def _charstring_width(cs: bytes) -> float | None:
    """Operands before the first hsbw (13) / sbw (12 7): width = 2nd operand
    (hsbw) or 3rd (sbw)."""
    ops: list[int] = []
    i = 0
    while i < len(cs):
        b = cs[i]
        if b == 13:  # hsbw: sbx wx
            return float(ops[1]) if len(ops) >= 2 else None
        if b == 12:
            if i + 1 < len(cs) and cs[i + 1] == 7:  # sbw: sbx sby wx wy
                return float(ops[2]) if len(ops) >= 3 else None
            i += 2
            continue
        if b <= 31:  # any other operator first -> malformed for our purposes
            return None
        if 32 <= b <= 246:
            ops.append(b - 139)
            i += 1
        elif 247 <= b <= 250:
            ops.append((b - 247) * 256 + cs[i + 1] + 108)
            i += 2
        elif 251 <= b <= 254:
            ops.append(-(b - 251) * 256 - cs[i + 1] - 108)
            i += 2
        else:  # 255: 32-bit int
            ops.append(struct.unpack_from(">i", cs, i + 1)[0])
            i += 5
    return None


def parse_type1_widths(data: bytes) -> dict[str, float] | None:
    """-> {glyph_name: width} (charspace units, nominally 1/1000 em) or None
    when the blob isn't a Type1 program."""
    try:
        raw = _unwrap_pfb(data)
        if b"%!PS-AdobeFont" not in raw[:256] and b"%!FontType1" not in raw[:256]:
            return None
        ee = raw.find(b"eexec")
        if ee < 0:
            return None
        enc = raw[ee + 5 :].lstrip(b"\r\n\t ")
        # PFA hex form: first 4 bytes all hex digits -> de-hex
        if all(c in b"0123456789abcdefABCDEF" for c in enc[:4]):
            enc = bytes.fromhex(re.sub(rb"[^0-9a-fA-F]", b"", enc).decode())
        priv = _decrypt(enc, 55665, 4)
        m = re.search(rb"/lenIV\s+(\d+)", priv)
        len_iv = int(m.group(1)) if m else 4
        out: dict[str, float] = {}
        for m in re.finditer(rb"/([^\s/{}()<>\[\]]+)\s+(\d+)\s+(RD|-\|)[ ]", priv):
            name = m.group(1).decode("latin-1")
            ln = int(m.group(2))
            start = m.end()
            cs = _decrypt(priv[start : start + ln], 4330, len_iv)
            w = _charstring_width(cs)
            if w is not None:
                out[name] = w
        return out or None
    except (ValueError, IndexError, struct.error):
        return None


# --------------------------------------------------------------- test build

def _enc_num(v: int) -> bytes:
    if -107 <= v <= 107:
        return bytes([v + 139])
    return b"\xff" + struct.pack(">i", v)


def build_minimal_type1(name_widths: dict[str, int]) -> bytes:
    """Tiny PFB with a real eexec-encrypted /CharStrings section; each glyph
    charstring is ``0 <w> hsbw endchar``."""
    entries = b""
    for name, w in sorted(name_widths.items()):
        cs = _enc_num(0) + _enc_num(w) + b"\x0d" + b"\x0e"  # hsbw endchar
        enc = _encrypt(cs, 4330, 4)
        entries += b"/" + name.encode("latin-1") + b" " + str(len(enc)).encode() + b" RD " + enc + b" ND\n"
    private = (
        b"dup /Private 8 dict dup begin\n/lenIV 4 def\n"
        b"/CharStrings " + str(len(name_widths)).encode() + b" dict dup begin\n"
        + entries + b"end\nend\n"
    )
    enc_priv = _encrypt(private, 55665, 4)
    ascii_part = b"%!PS-AdobeFont-1.0: TestType1\n/FontName /TestType1 def\ncurrentfile eexec\n"
    trailer = b"\n" + b"0" * 512 + b"\ncleartomark\n"
    return (
        b"\x80\x01" + struct.pack("<I", len(ascii_part)) + ascii_part
        + b"\x80\x02" + struct.pack("<I", len(enc_priv)) + enc_priv
        + b"\x80\x01" + struct.pack("<I", len(trailer)) + trailer
        + b"\x80\x03"
    )
