"""Compile the public Adobe font/encoding resource data into compact gz-JSON
data files under ``docling_parse_spark/pdf/data/`` so the engine is
standalone at runtime.

Sources (PUBLIC Adobe data, BSD/redistributable — the reference ships the
same files at docling_parse/pdf_resources/, loaded at
src/parse/pdf_resources/page_font.h:212-275,2056+):

* encodings/*.dat            -> encodings.json.gz   {enc_name: {code: glyphname}}
* glyphs/standard/*.dat      -> glyphlist.json.gz   {glyphname: unicode}
* fonts/standard/*.afm       -> afm.json.gz         {font: {metrics, by_code, by_name}}
* cmap-resources/<coll>/CMap -> cmaps/<name>.json.gz (code->CID ranges,
                                codespaces, usecmap chain, writing mode)
* cmap-resources/<coll>/cid2code.txt -> cid2uni/<coll>.json.gz (CID->Unicode,
                                from the collection's Uni*-UCS2/UTF16 column)

Usage: python tools/build_font_data.py [resource_dir]
"""

from __future__ import annotations

import gzip
import json
import os
import re
import sys

DEFAULT_SRC = "/root/reference/docling_parse/pdf_resources"
OUT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "docling_parse_spark", "pdf", "data",
)

# per collection: (registry name, CID->Unicode column preference order —
# later columns fill CIDs the UCS2 CMap doesn't encode, e.g. halfwidth forms)
COLLECTIONS = {
    "Adobe-Japan1-7": ("Adobe-Japan1", ["UniJIS-UCS2", "UniJIS-UCS2-HW", "UniJIS-UTF16", "UniJIS2004-UTF16"]),
    "Adobe-GB1-5": ("Adobe-GB1", ["UniGB-UCS2", "UniGB-UTF16"]),
    "Adobe-CNS1-7": ("Adobe-CNS1", ["UniCNS-UCS2", "UniCNS-UTF16"]),
    "Adobe-Korea1-2": ("Adobe-Korea1", ["UniKS-UCS2", "UniKS-UTF16"]),
    "Adobe-KR-9": ("Adobe-KR", ["UniAKR-UTF16"]),
}


def _pick_unicode(cell: str) -> str | None:
    """One Unicode scalar from a (possibly comma-delimited) code cell: prefer
    a non-radical/non-compatibility codepoint (CID-unified entries list the
    Kangxi radical first, e.g. '2f42,6587' for 文), strip the 'v' (vertical)
    marker, decode surrogate pairs."""
    best = None
    for raw in cell.split(","):
        val = raw.strip().rstrip("v")
        if not val or val == "*":
            continue
        try:
            if len(val) == 8:
                hi, lo = int(val[:4], 16), int(val[4:8], 16)
                if 0xD800 <= hi <= 0xDBFF and 0xDC00 <= lo <= 0xDFFF:
                    cp = ((hi - 0xD800) << 10) + (lo - 0xDC00) + 0x10000
                else:
                    cp = int(val, 16)
            else:
                cp = int(val, 16)
        except ValueError:
            continue
        if cp > 0x10FFFF:
            continue
        radicalish = 0x2E80 <= cp <= 0x2FDF or 0xF900 <= cp <= 0xFAFF
        if best is None or (not radicalish and best[1]):
            best = (cp, radicalish)
        if not radicalish:
            break
    return chr(best[0]) if best else None


def _dump(obj, *path_parts: str) -> None:
    path = os.path.join(OUT_DIR, *path_parts)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with gzip.open(path, "wt", encoding="utf-8") as f:
        json.dump(obj, f, separators=(",", ":"), ensure_ascii=False)
    print(f"wrote {path} ({os.path.getsize(path)} bytes)")


def build_encodings(src: str) -> None:
    names = {
        "std.dat": "StandardEncoding",
        "macroman.dat": "MacRomanEncoding",
        "macexpert.dat": "MacExpertEncoding",
        "winansi.dat": "WinAnsiEncoding",
    }
    out = {}
    for fn, enc in names.items():
        table = {}
        with open(os.path.join(src, "encodings", fn)) as f:
            for line in f:
                line = line.strip()
                if not line or line.startswith("#"):
                    continue
                code_hex, name = line.split(";", 1)
                table[int(code_hex, 16)] = name.strip()
        out[enc] = table
    _dump(out, "encodings.json.gz")


def build_glyphlist(src: str) -> None:
    out: dict[str, str] = {}
    # glyphlist format: name;XXXX[ YYYY...] (AGL); later files override
    for fn in ("glyphlist.dat", "additional.dat", "zapfdingbats.dat"):
        path = os.path.join(src, "glyphs", "standard", fn)
        with open(path, encoding="utf-8") as f:
            for line in f:
                line = line.strip()
                if not line or line.startswith("#"):
                    continue
                if ";" not in line:
                    continue
                name, codes = line.split(";", 1)
                try:
                    u = "".join(chr(int(c, 16)) for c in codes.split())
                except ValueError:
                    continue
                out.setdefault(name, u)
    _dump(out, "glyphlist.json.gz")


def build_afm(src: str) -> None:
    out = {}
    d = os.path.join(src, "fonts", "standard")
    for fn in sorted(os.listdir(d)):
        if not fn.endswith(".afm"):
            continue
        font = fn[:-4]
        by_code, by_name, meta = {}, {}, {}
        with open(os.path.join(d, fn), encoding="latin-1") as f:
            for line in f:
                m = re.match(r"^(Ascender|Descender|CapHeight|XHeight)\s+(-?\d+)", line)
                if m:
                    meta[m.group(1)] = int(m.group(2))
                    continue
                if line.startswith("C "):
                    cm = re.search(r"C\s+(-?\d+)", line)
                    wm = re.search(r"WX\s+(-?\d+)", line)
                    nm = re.search(r"N\s+(\S+)\s*;", line)
                    if not (wm and nm):
                        continue
                    w = int(wm.group(1))
                    by_name[nm.group(1)] = w
                    code = int(cm.group(1)) if cm else -1
                    if code >= 0:
                        by_code[code] = w
        out[font] = {"meta": meta, "by_code": by_code, "by_name": by_name}
    _dump(out, "afm.json.gz")


_CMAP_NAME_RE = re.compile(r"/CMapName\s*/(\S+)")
_USECMAP_RE = re.compile(r"/(\S+)\s+usecmap")
_WMODE_RE = re.compile(r"/WMode\s+(\d+)")


def parse_cmap_file(path: str) -> dict:
    with open(path, encoding="latin-1") as f:
        text = f.read()
    spaces, ranges, chars = [], [], []
    for m in re.finditer(r"begincodespacerange(.*?)endcodespacerange", text, re.S):
        for lo, hi in re.findall(r"<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>", m.group(1)):
            spaces.append([lo.lower(), hi.lower()])
    for m in re.finditer(r"begincidrange(.*?)endcidrange", text, re.S):
        for lo, hi, cid in re.findall(r"<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>\s*(\d+)", m.group(1)):
            ranges.append([int(lo, 16), int(hi, 16), len(lo) // 2, int(cid)])
    for m in re.finditer(r"begincidchar(.*?)endcidchar", text, re.S):
        for code, cid in re.findall(r"<([0-9A-Fa-f]+)>\s*(\d+)", m.group(1)):
            chars.append([int(code, 16), len(code) // 2, int(cid)])
    um = _USECMAP_RE.search(text)
    wm = _WMODE_RE.search(text)
    return {
        "codespaces": spaces,
        "ranges": sorted(ranges),
        "chars": chars,
        "usecmap": um.group(1) if um else None,
        "wmode": int(wm.group(1)) if wm else 0,
    }


def build_cmaps(src: str) -> None:
    index = {}
    for coll_dir, (registry, _) in COLLECTIONS.items():
        cmap_dir = os.path.join(src, "cmap-resources", coll_dir, "CMap")
        if not os.path.isdir(cmap_dir):
            continue
        for fn in sorted(os.listdir(cmap_dir)):
            path = os.path.join(cmap_dir, fn)
            if not os.path.isfile(path):
                continue
            parsed = parse_cmap_file(path)
            parsed["collection"] = registry
            _dump(parsed, "cmaps", f"{fn}.json.gz")
            index[fn] = registry
    # Identity CMaps are handled natively (code == CID), record for coverage
    index["Identity-H"] = "Adobe-Identity"
    index["Identity-V"] = "Adobe-Identity"
    _dump(index, "cmap_index.json.gz")


def build_cid2uni(src: str) -> None:
    for coll_dir, (registry, uni_cols) in COLLECTIONS.items():
        path = os.path.join(src, "cmap-resources", coll_dir, "cid2code.txt")
        if not os.path.exists(path):
            continue
        header = None
        mapping: dict[int, str] = {}
        with open(path, encoding="latin-1") as f:
            for line in f:
                if line.startswith("#"):
                    continue
                cols = line.rstrip("\n").split("\t")
                if header is None:
                    if cols and cols[0] == "CID":
                        header = cols
                    continue
                try:
                    cid = int(cols[0])
                except ValueError:
                    continue
                for uni_col in uni_cols:
                    if uni_col not in header:
                        continue
                    idx = header.index(uni_col)
                    if idx >= len(cols):
                        continue
                    u = _pick_unicode(cols[idx])
                    if u is not None:
                        mapping[cid] = u
                        break
        if mapping:
            _dump(mapping, "cid2uni", f"{registry}.json.gz")
            print(f"  {registry}: {len(mapping)} CID->Unicode entries")


if __name__ == "__main__":
    src = sys.argv[1] if len(sys.argv) > 1 else DEFAULT_SRC
    os.makedirs(OUT_DIR, exist_ok=True)
    build_encodings(src)
    build_glyphlist(src)
    build_afm(src)
    build_cid2uni(src)
    build_cmaps(src)
