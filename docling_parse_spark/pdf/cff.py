"""Minimal CFF (Compact Font Format) width reader for embedded Type1C font
programs with no /Widths array.

The reference extracts metrics from embedded CFF programs too
(src/parse/pdf_resources/page_font/base_font.h). We parse the public CFF
spec structures: header, INDEXes (Name/TopDict/String/GlobalSubr), the Top
DICT (charset + CharStrings + Private offsets), the Private DICT
(defaultWidthX / nominalWidthX), the charset (GID -> SID -> glyph name) and
just enough of each Type2 charstring to read its leading width operand
(width = nominalWidthX + w if the first stack-clearing operator carries an
odd extra argument, else defaultWidthX).

``build_minimal_cff`` emits a tiny CFF for tests (same role as
truetype.build_minimal_ttf).
"""

from __future__ import annotations

import struct

# CFF standard strings 0-390 (SIDs below 391 index this table); we only
# need the ones that are glyph names — include the full standard set.
STANDARD_STRINGS = (
    ".notdef space exclam quotedbl numbersign dollar percent ampersand quoteright "
    "parenleft parenright asterisk plus comma hyphen period slash zero one two "
    "three four five six seven eight nine colon semicolon less equal greater "
    "question at A B C D E F G H I J K L M N O P Q R S T U V W X Y Z bracketleft "
    "backslash bracketright asciicircum underscore quoteleft a b c d e f g h i j "
    "k l m n o p q r s t u v w x y z braceleft bar braceright asciitilde "
    "exclamdown cent sterling fraction yen florin section currency quotesingle "
    "quotedblleft guillemotleft guilsinglleft guilsinglright fi fl endash dagger "
    "daggerdbl periodcentered paragraph bullet quotesinglbase quotedblbase "
    "quotedblright guillemotright ellipsis perthousand questiondown grave acute "
    "circumflex tilde macron breve dotaccent dieresis ring cedilla hungarumlaut "
    "ogonek caron emdash AE ordfeminine Lslash Oslash OE ordmasculine ae "
    "dotlessi lslash oslash oe germandbls onesuperior logicalnot mu trademark "
    "Eth onehalf plusminus Thorn onequarter divide brokenbar degree thorn "
    "threequarters twosuperior registered minus eth multiply threesuperior "
    "copyright Aacute Acircumflex Adieresis Agrave Aring Atilde Ccedilla Eacute "
    "Ecircumflex Edieresis Egrave Iacute Icircumflex Idieresis Igrave Ntilde "
    "Oacute Ocircumflex Odieresis Ograve Otilde Scaron Uacute Ucircumflex "
    "Udieresis Ugrave Yacute Ydieresis Zcaron aacute acircumflex adieresis "
    "agrave aring atilde ccedilla eacute ecircumflex edieresis egrave iacute "
    "icircumflex idieresis igrave ntilde oacute ocircumflex odieresis ograve "
    "otilde scaron uacute ucircumflex udieresis ugrave yacute ydieresis zcaron"
).split()


def _read_index(data: bytes, pos: int) -> tuple[list[bytes], int]:
    """CFF INDEX at pos -> (items, next_pos)."""
    count = struct.unpack_from(">H", data, pos)[0]
    if count == 0:
        return [], pos + 2
    off_size = data[pos + 2]
    offs = []
    p = pos + 3
    for _ in range(count + 1):
        offs.append(int.from_bytes(data[p : p + off_size], "big"))
        p += off_size
    base = p - 1
    items = [data[base + offs[i] : base + offs[i + 1]] for i in range(count)]
    return items, base + offs[-1]


def _parse_dict(data: bytes) -> dict[int, list[float]]:
    """CFF DICT -> {op: operands}; two-byte ops keyed as 0x0c00|op2."""
    out: dict[int, list[float]] = {}
    operands: list[float] = []
    i = 0
    while i < len(data):
        b = data[i]
        if b <= 21:  # operator
            if b == 12:
                out[0x0C00 | data[i + 1]] = operands
                i += 2
            else:
                out[b] = operands
                i += 1
            operands = []
        elif b == 28:
            operands.append(struct.unpack_from(">h", data, i + 1)[0])
            i += 3
        elif b == 29:
            operands.append(struct.unpack_from(">i", data, i + 1)[0])
            i += 5
        elif b == 30:  # real number (BCD)
            i += 1
            s = ""
            done = False
            while i < len(data) and not done:
                for nib in (data[i] >> 4, data[i] & 0xF):
                    if nib <= 9:
                        s += str(nib)
                    elif nib == 0xA:
                        s += "."
                    elif nib == 0xB:
                        s += "E"
                    elif nib == 0xC:
                        s += "E-"
                    elif nib == 0xE:
                        s += "-"
                    elif nib == 0xF:
                        done = True
                        break
                i += 1
            try:
                operands.append(float(s or "0"))
            except ValueError:
                operands.append(0.0)
        elif 32 <= b <= 246:
            operands.append(b - 139)
            i += 1
        elif 247 <= b <= 250:
            operands.append((b - 247) * 256 + data[i + 1] + 108)
            i += 2
        elif 251 <= b <= 254:
            operands.append(-(b - 251) * 256 - data[i + 1] - 108)
            i += 2
        else:
            i += 1
    return out


def _charstring_width(cs: bytes, default_w: float, nominal_w: float) -> float:
    """Leading width operand of a Type2 charstring (CFF spec 3.1: present iff
    the first stack-clearing operator has one extra argument)."""
    operands: list[float] = []
    i = 0
    while i < len(cs):
        b = cs[i]
        if b in (1, 3, 18, 23):  # h/vstem(hm): even args
            return nominal_w + operands[0] if len(operands) % 2 else default_w
        if b in (19, 20):  # hintmask/cntrmask (stems may be implicit)
            return nominal_w + operands[0] if len(operands) % 2 else default_w
        if b == 21:  # rmoveto: 2 args
            return nominal_w + operands[0] if len(operands) > 2 else default_w
        if b in (4, 22):  # v/hmoveto: 1 arg
            return nominal_w + operands[0] if len(operands) > 1 else default_w
        if b == 14:  # endchar: 0 args (or 4 for seac)
            return nominal_w + operands[0] if len(operands) in (1, 5) else default_w
        if b in (10, 29):  # callsubr/callgsubr: the first stack-clearing
            # operator may hide inside the subroutine, so the width parity
            # cannot be decided statically (resolving subrs is out of
            # scope). Stop deterministically at the default — previously
            # callgsubr was skipped with the stack intact and the NEXT
            # operator's parity was misjudged (r4 review).
            return default_w
        if b <= 27 or b == 31:  # any other operator before a clear: no width
            return default_w
        if b == 28:
            operands.append(struct.unpack_from(">h", cs, i + 1)[0])
            i += 3
        elif 32 <= b <= 246:
            operands.append(b - 139)
            i += 1
        elif 247 <= b <= 250:
            operands.append((b - 247) * 256 + cs[i + 1] + 108)
            i += 2
        elif 251 <= b <= 254:
            operands.append(-(b - 251) * 256 - cs[i + 1] - 108)
            i += 2
        elif b == 255:
            operands.append(struct.unpack_from(">i", cs, i + 1)[0] / 65536.0)
            i += 5
        else:
            i += 1
    return default_w


def parse_cff_widths(data: bytes) -> dict[str, float] | None:
    """-> {glyph_name: width} (font design units, typically 1/1000 em) or
    None if the blob isn't CFF."""
    try:
        if len(data) < 4 or data[0] != 1:  # major version 1
            return None
        hdr_size = data[2]
        pos = hdr_size
        _names, pos = _read_index(data, pos)
        top_dicts, pos = _read_index(data, pos)
        strings, pos = _read_index(data, pos)
        if not top_dicts:
            return None
        top = _parse_dict(top_dicts[0])
        if 0x0C1E in top:
            # CIDFont CFF (Top DICT has ROS): its charset maps GIDs to CIDs,
            # not SIDs — fabricating names from standard strings would return
            # a silently bogus width map (ADVICE r02). CID-keyed widths come
            # from the PDF-level /W+/DW arrays instead.
            return None
        cs_off = int(top.get(17, [0])[0])
        if not cs_off:
            return None
        charstrings, _ = _read_index(data, cs_off)
        n_glyphs = len(charstrings)
        default_w, nominal_w = 0.0, 0.0
        if 18 in top and len(top[18]) == 2:
            priv_size, priv_off = int(top[18][0]), int(top[18][1])
            priv = _parse_dict(data[priv_off : priv_off + priv_size])
            default_w = float(priv.get(20, [0.0])[0])
            nominal_w = float(priv.get(21, [0.0])[0])

        def sid_name(sid: int) -> str:
            if sid < len(STANDARD_STRINGS):
                return STANDARD_STRINGS[sid]
            j = sid - len(STANDARD_STRINGS)
            return strings[j].decode("latin-1") if j < len(strings) else f"sid{sid}"

        # charset (GID -> SID); offset 0/1/2 = predefined (ISOAdobe order =
        # identity over standard strings)
        charset_off = int(top.get(15, [0])[0])
        gid_to_sid = list(range(n_glyphs))
        if charset_off > 2:
            fmt = data[charset_off]
            sids = [0]
            p = charset_off + 1
            if fmt == 0:
                for _ in range(n_glyphs - 1):
                    sids.append(struct.unpack_from(">H", data, p)[0])
                    p += 2
            elif fmt in (1, 2):
                step = 3 if fmt == 1 else 4
                while len(sids) < n_glyphs:
                    first = struct.unpack_from(">H", data, p)[0]
                    nleft = data[p + 2] if fmt == 1 else struct.unpack_from(">H", data, p + 2)[0]
                    for k in range(nleft + 1):
                        sids.append(first + k)
                    p += step
            gid_to_sid = sids[:n_glyphs]
        out = {}
        for gid, cs in enumerate(charstrings):
            name = sid_name(gid_to_sid[gid]) if gid < len(gid_to_sid) else f"gid{gid}"
            out[name] = _charstring_width(cs, default_w, nominal_w)
        return out
    except (struct.error, IndexError, ValueError):
        return None


# --------------------------------------------------------------- test build

def _enc_int(v: int) -> bytes:
    if -107 <= v <= 107:
        return bytes([v + 139])
    return b"\x1c" + struct.pack(">h", v)


def _mk_index(items: list[bytes]) -> bytes:
    if not items:
        return b"\x00\x00"
    offs = [1]
    for it in items:
        offs.append(offs[-1] + len(it))
    return (
        struct.pack(">HB", len(items), 4)
        + b"".join(struct.pack(">I", o) for o in offs)
        + b"".join(items)
    )


def build_minimal_cff(name_widths: dict[str, int],
                      default_w: int = 0, nominal_w: int = 0,
                      cid_ros: bool = False) -> bytes:
    """Tiny CFF: .notdef + one glyph per entry; each charstring is
    '[w] endchar' with w = width - nominal_w (omitted when width ==
    default_w). Glyph names beyond the standard set go in the string INDEX.
    ``cid_ros=True`` stamps a ROS entry into the Top DICT (a CIDFont CFF,
    for testing the parser's refusal path)."""
    names = sorted(name_widths)
    sids, strings = [], []
    for n in names:
        if n in STANDARD_STRINGS:
            sids.append(STANDARD_STRINGS.index(n))
        else:
            sids.append(len(STANDARD_STRINGS) + len(strings))
            strings.append(n.encode("latin-1"))
    charstrings = [b"\x0e"]  # .notdef: bare endchar -> default width
    for n in names:
        w = name_widths[n]
        if w == default_w:
            charstrings.append(b"\x0e")
        else:
            charstrings.append(_enc_int(w - nominal_w) + b"\x0e")
    charset = b"\x00" + b"".join(struct.pack(">H", s) for s in sids)
    private = _enc_int(default_w) + b"\x14" + _enc_int(nominal_w) + b"\x15"

    header = bytes([1, 0, 4, 4])
    name_idx = _mk_index([b"TestCFF"])
    string_idx = _mk_index(strings)
    gsubr_idx = _mk_index([])

    # iterate: top dict size depends on the offsets it encodes
    top = b""
    for _ in range(4):
        pre = len(header) + len(name_idx)
        top_idx = _mk_index([top or b"\x00"])
        base = pre + len(top_idx) + len(string_idx) + len(gsubr_idx)
        charset_off = base
        cs_off = charset_off + len(charset)
        priv_off = cs_off + len(_mk_index(charstrings))
        top = (
            (_enc_int(391) + _enc_int(392) + _enc_int(0) + b"\x0c\x1e" if cid_ros else b"")  # ROS
            + b"\x1d" + struct.pack(">i", charset_off) + b"\x0f"   # charset
            + b"\x1d" + struct.pack(">i", cs_off) + b"\x11"       # CharStrings
            + b"\x1d" + struct.pack(">i", len(private))
            + b"\x1d" + struct.pack(">i", priv_off) + b"\x12"     # Private
        )
    top_idx = _mk_index([top])
    return header + name_idx + top_idx + string_idx + gsubr_idx + charset + _mk_index(charstrings) + private
