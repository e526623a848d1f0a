"""Font and encoding resolution: char codes -> Unicode text + glyph widths.

Re-implements the reference's decode chain (reference:
src/parse/pdf_resources/page_font.h:461-661) from public PDF-spec semantics:

* ``analyse_string`` — segment raw string bytes into char codes
  (reference: src/parse/pdf_states/text.h:738-866): Identity-H/V -> 2-byte
  big-endian pairs; embedded-CMap fonts -> greedy 2-byte-if-in-cmap-else-1;
  simple encodings -> 1 byte per code.
* code -> Unicode precedence (reference: page_font.h:543-618):
  /Encoding /Differences glyph name -> /ToUnicode CMap -> base encoding
  table -> Standard fallback -> ``GLYPH<c>`` notdef marker.
* ``keep_glyphs=False`` squashes unresolved ``GLYPH<...>`` to a single space
  (reference: text.h:423-436, config.h:52).
* width resolution (reference: page_font.h:313-366,1784-1870): /Widths +
  /FirstChar for simple fonts; /W + /DW for CID fonts; space width defaults
  to 500/1000 em when unresolvable.

Font descriptors arrive as JSON blobs (one per font) on ``kind='pdf_font'``
spans; tables below are built once per executor and broadcast-equivalent
(module-level constants — the reference loads its resource dir once per
process, page_font.h:212-275).
"""

from __future__ import annotations

import json
import re
from dataclasses import dataclass, field

# --- encoding tables ------------------------------------------------------
# WinAnsiEncoding tracks Windows code page 1252 and MacRomanEncoding tracks
# Mac OS Roman (PDF 32000-1:2008 Annex D); Python ships both codecs.


def _table_from_codec(codec: str) -> dict[int, str]:
    table = {}
    for c in range(32, 256):
        try:
            ch = bytes([c]).decode(codec)
            if ch.isprintable() or ch == " ":
                table[c] = ch
        except UnicodeDecodeError:
            pass
    return table


WIN_ANSI = _table_from_codec("cp1252")
MAC_ROMAN = _table_from_codec("mac_roman")

# StandardEncoding (Annex D.2): ASCII-like with typographic substitutions in
# the printable range plus a sparse high range.
STANDARD = {c: chr(c) for c in range(32, 127)}
STANDARD[0x27] = "’"  # quoteright
STANDARD[0x60] = "‘"  # quoteleft
STANDARD.update(
    {
        0xA1: "¡", 0xA2: "¢", 0xA3: "£", 0xA4: "⁄",
        0xA5: "¥", 0xA7: "§", 0xA8: "¤", 0xA9: "'",
        0xAA: "“", 0xAB: "«", 0xB1: "–", 0xB2: "†",
        0xB3: "‡", 0xB4: "·", 0xB6: "¶", 0xB7: "•",
        0xB8: "‚", 0xB9: "„", 0xBA: "”", 0xBB: "»",
        0xBC: "…", 0xBD: "‰", 0xBF: "¿", 0xD0: "—",
        0xE1: "Æ", 0xF1: "æ", 0xF8: "ø", 0xE8: "Ł",
    }
)

# MacExpertEncoding: expert-set glyphs; we map the small-caps/figure subset to
# their nearest Unicode, enough for synthetic coverage.
MAC_EXPERT = {c: chr(c) for c in range(0x30, 0x3A)}  # figures
MAC_EXPERT[0x20] = " "

BASE_ENCODINGS: dict[str, dict[int, str]] = {
    "StandardEncoding": STANDARD,
    "WinAnsiEncoding": WIN_ANSI,
    "MacRomanEncoding": MAC_ROMAN,
    "MacExpertEncoding": MAC_EXPERT,
}

# --- glyph list (Adobe Glyph List subset + ligature names) ----------------
# Public AGL mappings for the names the corpus and common PDFs use.
GLYPH_LIST: dict[str, str] = {
    "space": " ", "exclam": "!", "quotedbl": '"', "numbersign": "#",
    "dollar": "$", "percent": "%", "ampersand": "&", "quotesingle": "'",
    "parenleft": "(", "parenright": ")", "asterisk": "*", "plus": "+",
    "comma": ",", "hyphen": "-", "period": ".", "slash": "/",
    "zero": "0", "one": "1", "two": "2", "three": "3", "four": "4",
    "five": "5", "six": "6", "seven": "7", "eight": "8", "nine": "9",
    "colon": ":", "semicolon": ";", "less": "<", "equal": "=",
    "greater": ">", "question": "?", "at": "@", "bracketleft": "[",
    "backslash": "\\", "bracketright": "]", "asciicircum": "^",
    "underscore": "_", "grave": "`", "braceleft": "{", "bar": "|",
    "braceright": "}", "asciitilde": "~",
    "quoteleft": "‘", "quoteright": "’",
    "quotedblleft": "“", "quotedblright": "”",
    "endash": "–", "emdash": "—", "bullet": "•",
    "ellipsis": "…", "dagger": "†", "daggerdbl": "‡",
    "fi": "ﬁ", "fl": "ﬂ", "ff": "ﬀ", "ffi": "ﬃ",
    "ffl": "ﬄ",
    "f_i": "ﬁ", "f_l": "ﬂ", "f_f": "ﬀ",
    "f_f_i": "ﬃ", "f_f_l": "ﬄ",
    "adieresis": "ä", "odieresis": "ö", "udieresis": "ü",
    "Adieresis": "Ä", "Odieresis": "Ö", "Udieresis": "Ü",
    "germandbls": "ß", "eacute": "é", "egrave": "è",
    "agrave": "à", "ccedilla": "ç", "ntilde": "ñ",
    "alpha": "α", "beta": "β", "gamma": "γ",
    "delta": "δ", "pi": "π", "sigma": "σ", "mu": "μ",
    "lambda": "λ", "theta": "θ", "omega": "ω",
    "Alpha": "Α", "Delta": "Δ", "Omega": "Ω",
    "Sigma": "Σ", "Pi": "Π",
    "minus": "−", "plusminus": "±", "multiply": "×",
    "divide": "÷", "degree": "°", "copyright": "©",
    "registered": "®", "trademark": "™", "Euro": "€",
    "sterling": "£", "yen": "¥", "cent": "¢",
    "afii57409": "ء", "afii57410": "آ", "afii57411": "أ",
}
for _c in range(26):
    GLYPH_LIST[chr(ord("A") + _c)] = chr(ord("A") + _c)
    GLYPH_LIST[chr(ord("a") + _c)] = chr(ord("a") + _c)

_UNI_NAME = re.compile(r"^uni([0-9A-Fa-f]{4,6})$")
_UXXXX = re.compile(r"^u([0-9A-Fa-f]{4,6})$")


def glyph_name_to_unicode(name: str) -> str | None:
    if name in GLYPH_LIST:
        return GLYPH_LIST[name]
    m = _UNI_NAME.match(name) or _UXXXX.match(name)
    if m:
        return chr(int(m.group(1), 16))
    # ligature underscore-composition /X_Y(_Z) (reference sanitizes these
    # names — cells.h:349-382): resolve each component.
    if "_" in name:
        parts = [glyph_name_to_unicode(p) for p in name.split("_")]
        if all(p is not None for p in parts):
            return "".join(parts)  # type: ignore[arg-type]
    return None


# --- ToUnicode CMap parser -------------------------------------------------

_HEX_TOKEN = re.compile(rb"<([0-9A-Fa-f\s]*)>")


def parse_cmap(text: str) -> tuple[dict[int, str], set[int]]:
    """Parse a ToUnicode CMap (begincodespacerange/beginbfchar/beginbfrange,
    incl. the array-form bfrange) into {code: unicode} plus the set of code
    byte-lengths seen in the codespace (reference:
    src/parse/pdf_resources/page_font/cmap.h:135-229,605-1000).
    """
    data = text.encode("utf-8", "surrogateescape") if isinstance(text, str) else text
    mapping: dict[int, str] = {}
    code_lengths: set[int] = set()

    def hexes(chunk: bytes) -> list[bytes]:
        return [bytes.fromhex(re.sub(rb"\s", rb"", m).decode()) for m in _HEX_TOKEN.findall(chunk)]

    def to_uni(b: bytes) -> str:
        return b.decode("utf-16-be", "replace") if b else ""

    for m in re.finditer(rb"begincodespacerange(.*?)endcodespacerange", data, re.S):
        for h in hexes(m.group(1)):
            code_lengths.add(len(h))

    for m in re.finditer(rb"beginbfchar(.*?)endbfchar", data, re.S):
        hs = hexes(m.group(1))
        for src, dst in zip(hs[0::2], hs[1::2]):
            mapping[int.from_bytes(src, "big")] = to_uni(dst)
            code_lengths.add(len(src))

    pair_re = re.compile(rb"<([0-9A-Fa-f\s]*)>\s*<([0-9A-Fa-f\s]*)>\s*")
    hex_re = re.compile(rb"<([0-9A-Fa-f\s]*)>")
    for m in re.finditer(rb"beginbfrange(.*?)endbfrange", data, re.S):
        body = m.group(1)
        pos = 0
        while True:
            mm = pair_re.search(body, pos)
            if not mm:
                break
            lo = int(re.sub(rb"\s", rb"", mm.group(1)), 16)
            hi = int(re.sub(rb"\s", rb"", mm.group(2)), 16)
            code_lengths.add(len(re.sub(rb"\s", rb"", mm.group(1))) // 2)
            pos = mm.end()
            if pos < len(body) and body[pos : pos + 1] == b"[":
                # array form: one dst string per code in [lo, hi]
                end = body.index(b"]", pos)
                for i, dst in enumerate(hexes(body[pos + 1 : end])):
                    if lo + i <= hi:
                        mapping[lo + i] = to_uni(dst)
                pos = end + 1
            else:
                mm2 = hex_re.match(body, pos)
                if not mm2:
                    break
                base_bytes = bytes.fromhex(re.sub(rb"\s", rb"", mm2.group(1)).decode())
                base = int.from_bytes(base_bytes, "big")
                for i in range(hi - lo + 1):
                    mapping[lo + i] = chr(base + i)
                pos = mm2.end()
    return mapping, code_lengths


# --- font model ------------------------------------------------------------

NOTDEF_FMT = "GLYPH<c={}>"
_GLYPH_MARK = re.compile(r"GLYPH<[^>]*>")


@dataclass
class Font:
    """One resolved font resource, built from a JSON descriptor span."""

    font_key: str = "F0"
    base_font: str = "Helvetica"
    subtype: str = "Type1"
    encoding: str = "StandardEncoding"
    differences: dict[int, str] = field(default_factory=dict)
    first_char: int = 0
    widths: list[float] = field(default_factory=list)
    cid_widths: dict[int, float] = field(default_factory=dict)
    default_width: float = 1000.0
    to_unicode: dict[int, str] = field(default_factory=dict)
    cmap_code_lengths: set[int] = field(default_factory=set)
    ascent: float = 750.0
    descent: float = -250.0
    capheight: float = 700.0

    # -- segmentation (reference: text.h:738-866) --
    def analyse_string(self, raw: bytes) -> list[int]:
        if self.encoding in ("Identity-H", "Identity-V"):
            if len(raw) % 2:
                raw = raw + b"\x00"
            return [int.from_bytes(raw[i : i + 2], "big") for i in range(0, len(raw), 2)]
        if self.cmap_code_lengths and 2 in self.cmap_code_lengths and self.subtype == "Type0":
            # greedy: 2-byte code if present in cmap else 1 byte
            codes, i = [], 0
            while i < len(raw):
                if i + 1 < len(raw):
                    two = int.from_bytes(raw[i : i + 2], "big")
                    if two in self.to_unicode:
                        codes.append(two)
                        i += 2
                        continue
                codes.append(raw[i])
                i += 1
            return codes
        return list(raw)

    # -- code -> unicode (reference: page_font.h:461-618) --
    def get_string(self, code: int, keep_glyphs: bool = False) -> str:
        s = self._resolve(code)
        if not keep_glyphs and _GLYPH_MARK.search(s):
            return " "  # production squash (text.h:423-436)
        return s

    def _resolve(self, code: int) -> str:
        if self.encoding in ("Identity-H", "Identity-V"):
            if code in self.to_unicode:
                return self.to_unicode[code]
            if code >= 32 and code < 0xD800:
                return chr(code)  # utf8::append fallback (page_font.h:482-488)
            return NOTDEF_FMT.format(code)
        if code in self.differences:
            u = glyph_name_to_unicode(self.differences[code])
            if u is not None:
                return u
            # a Differences name we can't resolve is a notdef, not a fallthrough
            return NOTDEF_FMT.format(code)
        if code in self.to_unicode:
            return self.to_unicode[code]
        base = BASE_ENCODINGS.get(self.encoding)
        if base and code in base:
            return base[code]
        if code in STANDARD:
            return STANDARD[code]
        return NOTDEF_FMT.format(code)

    # -- widths (reference: page_font.h:313-366) --
    def get_width(self, code: int) -> float:
        if self.subtype in ("Type0", "CIDFontType0", "CIDFontType2") or self.cid_widths:
            return self.cid_widths.get(code, self.default_width)
        idx = code - self.first_char
        if 0 <= idx < len(self.widths):
            return self.widths[idx]
        # base-14 AFM metrics fallback (page_font.h:313-366; AFM data in
        # docling_parse/pdf_resources/fonts/standard/)
        from docling_parse_spark.pdf.base14 import base14_width

        w = base14_width(self.base_font, code)
        if w is not None:
            return w
        return 500.0  # space/unknown default (page_font.h:313-381)

    @property
    def space_width(self) -> float:
        w = self.get_width(32)
        return w if w > 0 else 500.0


def font_from_json(blob: str) -> Font:
    """Build a Font from the corpus's ``pdf_font`` JSON descriptor
    (schema documented in FIXTURES.md §1)."""
    d = json.loads(blob)
    to_uni: dict[int, str] = {}
    lengths: set[int] = set()
    if d.get("to_unicode"):
        to_uni, lengths = parse_cmap(d["to_unicode"])
    cid_widths: dict[int, float] = {}
    if d.get("w"):
        # CID /W compact form: {"cid": width} JSON map (keys are strings)
        cid_widths = {int(k): float(v) for k, v in d["w"].items()}
    return Font(
        font_key=d.get("font_key", "F0"),
        base_font=d.get("base_font", "Helvetica"),
        subtype=d.get("subtype", "Type1"),
        encoding=d.get("encoding", "StandardEncoding"),
        differences={int(k): v for k, v in (d.get("differences") or {}).items()},
        first_char=int(d.get("first_char", 0)),
        widths=[float(w) for w in (d.get("widths") or [])],
        cid_widths=cid_widths,
        default_width=float(d.get("dw", 1000.0)),
        to_unicode=to_uni,
        cmap_code_lengths=lengths,
        ascent=float(d.get("ascent", 750.0)),
        descent=float(d.get("descent", -250.0)),
        capheight=float(d.get("capheight", 700.0)),
    )
