"""Raw PDF FILE ingestion — from-spec (ISO 32000-1), stdlib only.

The reference loads real PDF files through qpdf (reference
src/parse/pdf_decoders/document.h:183-279 buffers the file and hands it
to QPDF; the object/xref machinery is qpdf's). This container has no
qpdf, so this module implements the file layer from the spec and emits
the north-rule span rows the rest of the engine consumes:

* object syntax: names/numbers/strings/arrays/dicts/streams/refs (§7.3)
* classic xref tables with /Prev chains (§7.5.4) and incremental updates
* cross-reference STREAMS (/Type /XRef, /W, /Index — §7.5.8), decoded
  through :mod:`docling_parse_spark.pdf.filters` (Flate + PNG predictors)
* object streams (/Type /ObjStm — §7.5.7): compressed objects
* page-tree traversal with attribute inheritance (MediaBox/Rotate/
  Resources — §7.7.3.4), /Contents concatenation (§7.8.2)
* font dictionaries -> this engine's ``pdf_font`` JSON descriptors
  (BaseFont/Subtype/Encoding//FirstChar//Widths//ToUnicode; CID /W)

``parse_pdf_spans(data)`` returns the ``(kind, text, media_ref,
offset)`` span list for one document — feed it to ``decode_document`` or
the distributed pipeline. ``ingest_pdf_files`` wraps it over
``spark.read.format("binaryFile")`` with per-file failure accounting.

Out of scope (per-row ValueError, accounted like any hostile input):
encryption (/Encrypt), linearization hints (ignored, harmless).
"""

from __future__ import annotations

import json
import re
import zlib
from dataclasses import dataclass

from docling_parse_spark.pdf.filters import apply_filters

_WS = b"\x00\t\n\x0c\r "
_DELIM = b"()<>[]{}/%"


@dataclass(frozen=True)
class Ref:
    num: int
    gen: int


class _Lexer:
    """Object-syntax scanner (§7.3) over the whole file buffer."""

    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.pos = pos

    def _skip_ws(self):
        d = self.data
        n = len(d)
        while self.pos < n:
            c = d[self.pos]
            if c in _WS:
                self.pos += 1
            elif c == 0x25:  # % comment to EOL
                while self.pos < n and d[self.pos] not in b"\r\n":
                    self.pos += 1
            else:
                return

    def parse_object(self):
        """One object at the cursor -> python value (Ref for 'n g R')."""
        self._skip_ws()
        d = self.data
        if self.pos >= len(d):
            raise ValueError("unexpected end of PDF data")
        c = d[self.pos]
        if c == 0x2F:  # /Name
            return self._name()
        if c == 0x28:  # (string)
            return self._literal_string()
        if c == 0x3C:
            if d[self.pos : self.pos + 2] == b"<<":
                return self._dict()
            return self._hex_string()
        if c == 0x5B:  # [
            self.pos += 1
            out = []
            while True:
                self._skip_ws()
                if self.pos < len(d) and d[self.pos] == 0x5D:
                    self.pos += 1
                    return out
                out.append(self.parse_object())
        if c in b"+-.0123456789":
            return self._number_or_ref()
        kw = self._keyword()
        if kw == b"true":
            return True
        if kw == b"false":
            return False
        if kw == b"null":
            return None
        raise ValueError(f"unexpected token {kw!r} at {self.pos}")

    def _keyword(self) -> bytes:
        d = self.data
        start = self.pos
        while self.pos < len(d) and d[self.pos] not in _WS and d[self.pos] not in _DELIM:
            self.pos += 1
        if self.pos == start:
            self.pos += 1  # lone delimiter: consume to make progress
        return d[start : self.pos]

    def _name(self) -> str:
        d = self.data
        self.pos += 1
        start = self.pos
        while self.pos < len(d) and d[self.pos] not in _WS and d[self.pos] not in _DELIM:
            self.pos += 1
        raw = d[start : self.pos]
        if b"#" in raw:
            out = bytearray()
            i = 0
            hexd = b"0123456789abcdefABCDEF"
            while i < len(raw):
                if raw[i] == 0x23 and i + 2 < len(raw) and raw[i + 1] in hexd and raw[i + 2] in hexd:
                    out.append(int(raw[i + 1 : i + 3], 16))
                    i += 3
                else:
                    out.append(raw[i])
                    i += 1
            raw = bytes(out)
        return raw.decode("utf-8", "replace")

    def _literal_string(self) -> bytes:
        d = self.data
        self.pos += 1
        out = bytearray()
        depth = 1
        esc = {0x6E: 10, 0x72: 13, 0x74: 9, 0x62: 8, 0x66: 12}
        while self.pos < len(d):
            c = d[self.pos]
            if c == 0x5C:  # backslash
                self.pos += 1
                if self.pos >= len(d):
                    break
                e = d[self.pos]
                if e in esc:
                    out.append(esc[e])
                    self.pos += 1
                elif 0x30 <= e <= 0x37:  # up to 3 octal digits
                    val = 0
                    k = 0
                    while k < 3 and self.pos < len(d) and 0x30 <= d[self.pos] <= 0x37:
                        val = val * 8 + (d[self.pos] - 0x30)
                        self.pos += 1
                        k += 1
                    out.append(val & 0xFF)
                elif e in b"\r\n":  # line continuation
                    self.pos += 1
                    if e == 0x0D and self.pos < len(d) and d[self.pos] == 0x0A:
                        self.pos += 1
                else:
                    out.append(e)
                    self.pos += 1
            elif c == 0x28:
                depth += 1
                out.append(c)
                self.pos += 1
            elif c == 0x29:
                depth -= 1
                self.pos += 1
                if depth == 0:
                    return bytes(out)
                out.append(c)
            else:
                out.append(c)
                self.pos += 1
        raise ValueError("unterminated literal string")

    def _hex_string(self) -> bytes:
        d = self.data
        self.pos += 1
        digits = bytearray()
        while self.pos < len(d) and d[self.pos] != 0x3E:
            if d[self.pos] in b"0123456789abcdefABCDEF":
                digits.append(d[self.pos])
            elif d[self.pos] not in _WS:
                # strict posture (ADVICE r4): silently skipping a corrupt
                # byte decodes to SHIFTED bytes; surface as a per-file
                # failure like every other malformed construct here
                raise ValueError(
                    f"invalid byte 0x{d[self.pos]:02x} in hex string at {self.pos}"
                )
            self.pos += 1
        self.pos += 1  # '>'
        if len(digits) % 2:
            digits.append(0x30)
        return bytes.fromhex(digits.decode())

    def _dict(self):
        d = self.data
        self.pos += 2
        out = {}
        while True:
            self._skip_ws()
            if d[self.pos : self.pos + 2] == b">>":
                self.pos += 2
                return out
            if self.pos >= len(d):
                raise ValueError("unterminated dictionary")
            key = self.parse_object()
            val = self.parse_object()
            if isinstance(key, str):
                out[key] = val

    def _number_or_ref(self):
        d = self.data
        start = self.pos
        while self.pos < len(d) and d[self.pos] in b"+-.0123456789":
            self.pos += 1
        tok = d[start : self.pos]
        try:
            num = float(tok) if b"." in tok else int(tok)
        except ValueError as e:
            raise ValueError(f"bad number {tok!r}") from e
        # lookahead for 'gen R' (indirect reference, §7.3.10)
        if isinstance(num, int) and num >= 0:
            save = self.pos
            self._skip_ws()
            start2 = self.pos
            while self.pos < len(d) and d[self.pos] in b"0123456789":
                self.pos += 1
            gen_tok = d[start2 : self.pos]
            if gen_tok:
                self._skip_ws()
                if d[self.pos : self.pos + 1] == b"R" and (
                    self.pos + 1 >= len(d)
                    or d[self.pos + 1] in _WS
                    or d[self.pos + 1] in _DELIM
                ):
                    self.pos += 1
                    return Ref(num, int(gen_tok))
            self.pos = save
        return num


class PdfFile:
    """Parsed PDF file: xref-resolved object access + page tree."""

    def __init__(self, data: bytes):
        if not data.startswith(b"%PDF-"):
            raise ValueError("not a PDF (missing %PDF- header)")
        self.data = data
        self.offsets: dict[int, tuple] = {}  # num -> ('file', off) | ('objstm', n, idx)
        self.trailer: dict = {}
        self._cache: dict[int, object] = {}
        self._objstm_cache: dict[int, list] = {}
        self._load_xref()
        if "Encrypt" in self.trailer:
            raise ValueError("encrypted PDF (no decryption support)")

    # ------------------------------------------------------------- xref
    def _load_xref(self):
        m = None
        for m in re.finditer(rb"startxref\s+(\d+)", self.data):
            pass  # last startxref wins (incremental updates)
        if m is None:
            raise ValueError("missing startxref")
        seen = set()
        pos = int(m.group(1))
        while pos not in seen:
            seen.add(pos)
            lx = _Lexer(self.data, pos)
            lx._skip_ws()
            if self.data[lx.pos : lx.pos + 4] == b"xref":
                trailer, entries = self._load_xref_table(lx)
                # hybrid files: /XRefStm points at an xref stream that takes
                # PRECEDENCE over this section's classic table (§7.5.8.4) —
                # load it first so setdefault resolves conflicts its way
                # (ADVICE r4: classic-first left stale offsets winning)
                if "XRefStm" in trailer:
                    try:
                        self._load_xref_stream(int(trailer["XRefStm"]))
                    except ValueError:
                        pass
                for objnum, loc in entries:
                    self.offsets.setdefault(objnum, loc)
            else:
                trailer = self._load_xref_stream(pos)
            for k, v in trailer.items():
                self.trailer.setdefault(k, v)
            nxt = trailer.get("Prev")
            if nxt is None:
                break
            pos = int(nxt)

    def _load_xref_table(self, lx: _Lexer):
        """Returns (trailer, entries) WITHOUT applying the entries — the
        caller loads a hybrid file's /XRefStm first (§7.5.8.4 precedence)."""
        lx.pos += 4
        entries: list[tuple[int, tuple]] = []
        while True:
            lx._skip_ws()
            if self.data[lx.pos : lx.pos + 7] == b"trailer":
                lx.pos += 7
                t = lx.parse_object()
                if not isinstance(t, dict):
                    raise ValueError("trailer is not a dictionary")
                return t, entries
            start = lx.parse_object()
            count = lx.parse_object()
            if not isinstance(start, int) or not isinstance(count, int):
                raise ValueError("malformed xref subsection header")
            lx._skip_ws()
            for i in range(count):
                entry = self.data[lx.pos : lx.pos + 20]
                if len(entry) < 18:
                    raise ValueError("truncated xref entry")
                off, _gen, kind = entry[:10], entry[11:16], entry[17:18]
                if kind == b"n":
                    entries.append((start + i, ("file", int(off))))
                # 'f' free entries: skip
                lx.pos += 20 if entry[18:20] in (b"\r\n", b" \r", b" \n") else 18
                lx._skip_ws()

    def _load_xref_stream(self, pos: int):
        num, sdict, raw = self._parse_indirect_at(pos)
        if sdict.get("Type") != "XRef":
            raise ValueError("expected /Type /XRef stream")
        data = self._decode_stream(sdict, raw)
        w = [int(x) for x in sdict.get("W", [])]
        if len(w) != 3 or any(x < 0 for x in w) or sum(w) == 0:
            # /W [0 0 0] with a huge /Index count would loop unboundedly
            # consuming no data (verified DoS — r4 review)
            raise ValueError("XRef stream /W invalid")
        size = int(self._resolve(sdict.get("Size", 0)))
        index = [int(x) for x in sdict.get("Index", [0, size])]
        if sum(index[1::2]) > 10_000_000:
            raise ValueError("XRef stream /Index entry count exceeds sanity cap")
        rowlen = sum(w)
        pos2 = 0
        for s in range(0, len(index), 2):
            start, count = index[s], index[s + 1]
            for i in range(count):
                row = data[pos2 : pos2 + rowlen]
                pos2 += rowlen
                if len(row) < rowlen:
                    raise ValueError("truncated XRef stream")
                f = []
                o = 0
                for width in w:
                    f.append(int.from_bytes(row[o : o + width], "big") if width else 1)
                    o += width
                objnum = start + i
                if f[0] == 1:
                    self.offsets.setdefault(objnum, ("file", f[1]))
                elif f[0] == 2:
                    self.offsets.setdefault(objnum, ("objstm", f[1], f[2]))
        return sdict

    # ---------------------------------------------------------- objects
    def _parse_indirect_at(self, pos: int):
        lx = _Lexer(self.data, pos)
        num = lx.parse_object()
        gen = lx.parse_object()
        lx._skip_ws()
        if not isinstance(num, int) or not isinstance(gen, int):
            raise ValueError(f"expected 'n g obj' at {pos}")
        if self.data[lx.pos : lx.pos + 3] != b"obj":
            raise ValueError(f"expected 'obj' keyword at {lx.pos}")
        lx.pos += 3
        val = lx.parse_object()
        raw = None
        lx._skip_ws()
        if self.data[lx.pos : lx.pos + 6] == b"stream":
            lx.pos += 6
            if self.data[lx.pos : lx.pos + 2] == b"\r\n":
                lx.pos += 2
            elif self.data[lx.pos : lx.pos + 1] in (b"\n", b"\r"):
                lx.pos += 1
            if not isinstance(val, dict):
                raise ValueError("stream without a dictionary")
            length = self._resolve(val.get("Length"))
            if isinstance(length, (int, float)) and length >= 0:
                raw = self.data[lx.pos : lx.pos + int(length)]
            else:  # /Length broken: scan (repair posture)
                end = self.data.find(b"endstream", lx.pos)
                if end < 0:
                    raise ValueError("unterminated stream")
                raw = self.data[lx.pos : end].rstrip(b"\r\n")
        return num, val, raw

    def get_object(self, ref):
        if not isinstance(ref, Ref):
            return ref
        if ref.num in self._cache:
            return self._cache[ref.num]
        loc = self.offsets.get(ref.num)
        if loc is None:
            return None  # dangling ref -> null (qpdf-compatible posture)
        if loc[0] == "file":
            num, val, raw = self._parse_indirect_at(loc[1])
            if num != ref.num:
                # corrupt xref offset pointing at a different object:
                # treat as missing, never silently substitute (qpdf
                # validates the number the same way — r4 review)
                self._cache[ref.num] = None
                return None
            obj = (val, raw) if raw is not None else val
        else:
            obj = self._objstm_object(loc[1], loc[2])
        self._cache[ref.num] = obj
        return obj

    def _objstm_object(self, stm_num: int, idx: int):
        if stm_num not in self._objstm_cache:
            loc = self.offsets.get(stm_num)
            if loc is None or loc[0] != "file":
                raise ValueError(f"object stream {stm_num} unresolvable")
            _num, sdict, raw = self._parse_indirect_at(loc[1])
            data = self._decode_stream(sdict, raw)
            n = int(self._resolve(sdict.get("N", 0)))
            first = int(self._resolve(sdict.get("First", 0)))
            hdr = _Lexer(data, 0)
            pairs = []
            for _ in range(n):
                onum = hdr.parse_object()
                ooff = hdr.parse_object()
                pairs.append((int(onum), int(ooff)))
            objs = []
            for onum, ooff in pairs:
                objs.append(_Lexer(data, first + ooff).parse_object())
            self._objstm_cache[stm_num] = objs
        objs = self._objstm_cache[stm_num]
        if idx >= len(objs):
            raise ValueError("object-stream index out of range")
        return objs[idx]

    def _resolve(self, v):
        seen: set[int] = set()
        while isinstance(v, Ref):
            if v.num in seen:
                # reference cycle (6 0 R -> 7 0 R -> 6 0 R): hostile or
                # corrupt files used to hang here forever (r4 review)
                raise ValueError(f"indirect-reference cycle at object {v.num}")
            seen.add(v.num)
            v = self.get_object(v)
            if isinstance(v, tuple):
                v = v[0]
        return v

    def _decode_stream(self, sdict: dict, raw: bytes) -> bytes:
        # only Ref resolution happens here; apply_filters owns all the
        # name/parms normalization and validation (r4 review: the two
        # normalization paths were drifting)
        filters = self._resolve(sdict.get("Filter"))
        if filters is None:
            return raw
        if isinstance(filters, str):
            filters = [filters]
        filters = [str(self._resolve(f)) for f in filters]
        parms = self._resolve(sdict.get("DecodeParms"))
        if isinstance(parms, list):
            parms = [
                ({k: self._resolve(v) for k, v in self._resolve(p).items()}
                 if isinstance(self._resolve(p), dict) else None)
                for p in parms
            ]
        elif isinstance(parms, dict):
            parms = {k: self._resolve(v) for k, v in parms.items()}
        return apply_filters(raw, filters, parms)

    # ------------------------------------------------------------ pages
    def pages(self) -> list[dict]:
        """Flattened page list with inherited attributes (§7.7.3.4)."""
        root = self._resolve(self.trailer.get("Root"))
        if not isinstance(root, dict):
            raise ValueError("missing /Root catalog")
        tree = self._resolve(root.get("Pages"))
        out: list[dict] = []
        seen: set[int] = set()

        def walk(node, inherited, depth=0):
            if not isinstance(node, dict) or depth > 64:
                return
            inh = dict(inherited)
            for k in ("MediaBox", "CropBox", "Rotate", "Resources"):
                if k in node:
                    inh[k] = node[k]
            if node.get("Type") == "Page" or ("Kids" not in node and "Contents" in node):
                out.append({**inh, **node})
                return
            for kid in self._resolve(node.get("Kids")) or []:
                if isinstance(kid, Ref):
                    if kid.num in seen:
                        continue
                    seen.add(kid.num)
                walk(self._resolve(kid), inh, depth + 1)

        walk(tree, {})
        return out

    def page_content(self, page: dict) -> bytes:
        # fetch via get_object, NOT _resolve: _resolve strips a stream
        # object down to its dictionary, losing the body
        contents = page.get("Contents")
        if isinstance(contents, Ref):
            contents = self.get_object(contents)
        items = contents if isinstance(contents, list) else [contents]
        parts = []
        for item in items:
            obj = self.get_object(item) if isinstance(item, Ref) else item
            if isinstance(obj, tuple):
                sdict, raw = obj
                parts.append(self._decode_stream(sdict, raw))
        # §7.8.2: multiple streams are concatenated with whitespace between
        return b"\n".join(parts)

    # ------------------------------------------------------------- fonts
    def font_descriptor(self, key: str, fdict: dict) -> str:
        """PDF font dictionary -> this engine's pdf_font JSON blob."""
        f = {k: self._resolve(v) for k, v in fdict.items()}
        d: dict = {"font_key": key}
        d["base_font"] = str(f.get("BaseFont", "")).lstrip("/")
        d["subtype"] = str(f.get("Subtype", "Type1")).lstrip("/")
        enc = f.get("Encoding")
        if isinstance(enc, dict):
            # /Differences (§9.6.6.1): [code name name ... code name ...] —
            # fonts.py fully supports the 'differences' map; dropping it
            # produced wrong text for remapped simple fonts (r4 review)
            diffs = self._resolve(enc.get("Differences"))
            if isinstance(diffs, list):
                dmap: dict[str, str] = {}
                code = 0
                for item in diffs:
                    item = self._resolve(item)
                    if isinstance(item, (int, float)):
                        code = int(item)
                    elif isinstance(item, str):
                        dmap[str(code)] = item.lstrip("/")
                        code += 1
                if dmap:
                    d["differences"] = dmap
            enc = str(self._resolve(enc.get("BaseEncoding", "")) or "")
        if enc:
            d["encoding"] = str(enc).lstrip("/")
        if "FirstChar" in f:
            d["first_char"] = int(f["FirstChar"])
        widths = self._resolve(f.get("Widths"))
        if isinstance(widths, list):
            d["widths"] = [float(self._resolve(w) or 0.0) for w in widths]
        # embedded font program (/FontDescriptor /FontFile{,2,3}): the
        # descriptor format's base64 'font_program' key drives width
        # extraction when /Widths is absent (r4 review)
        fdesc = f.get("FontDescriptor")
        if d["subtype"] == "Type0":
            desc0 = self._resolve(f.get("DescendantFonts"))
            if isinstance(desc0, list) and desc0:
                df0 = self._resolve(desc0[0])
                if isinstance(df0, dict):
                    fdesc = fdesc or df0.get("FontDescriptor")
        fdesc_dict = self._resolve(fdesc)
        if isinstance(fdesc_dict, dict):
            import base64

            for kk in ("FontFile2", "FontFile3", "FontFile"):
                ff = fdesc_dict.get(kk)
                ff_obj = self.get_object(ff) if isinstance(ff, Ref) else None
                if isinstance(ff_obj, tuple):
                    d["font_program"] = base64.b64encode(
                        self._decode_stream(*ff_obj)
                    ).decode("ascii")
                    break
            for src_k, dst_k in (("Ascent", "ascent"), ("Descent", "descent"),
                                 ("CapHeight", "capheight")):
                v = self._resolve(fdesc_dict.get(src_k))
                if isinstance(v, (int, float)) and v:
                    d[dst_k] = float(v)
        # from the UNRESOLVED dict: _resolve strips stream objects to
        # their dictionaries, which would lose the CMap body
        tu = fdict.get("ToUnicode")
        tu_obj = self.get_object(tu) if isinstance(tu, Ref) else None
        if isinstance(tu_obj, tuple):
            d["to_unicode"] = self._decode_stream(*tu_obj).decode("latin-1", "replace")
        if d["subtype"] == "Type0":
            desc = self._resolve(f.get("DescendantFonts"))
            if isinstance(desc, list) and desc:
                df = self._resolve(desc[0])
                if isinstance(df, dict):
                    if "DW" in df:
                        d["dw"] = float(self._resolve(df["DW"]))
                    w = self._resolve(df.get("W"))
                    if isinstance(w, list):
                        d["w"] = _cid_w_to_map(
                            [self._resolve(x) for x in w], self._resolve
                        )
        return json.dumps(d, sort_keys=True)


def _cid_w_to_map(w: list, resolve) -> dict[str, float]:
    """CID /W array (§9.7.4.3) -> {cid: width} compact map."""
    out: dict[str, float] = {}
    i = 0
    while i < len(w):
        c = w[i]
        if i + 1 < len(w) and isinstance(resolve(w[i + 1]), list):
            for j, width in enumerate(resolve(w[i + 1])):
                out[str(int(c) + j)] = float(resolve(width))
            i += 2
        elif i + 2 < len(w):
            c2, width = int(resolve(w[i + 1])), float(resolve(w[i + 2]))
            if not (0 <= int(c) <= c2) or c2 - int(c) >= 65536:
                # CIDs are 16-bit; a hostile range like [0 2e8 500] used to
                # materialize gigabytes of keys (verified DoS — r4 review)
                raise ValueError("CID /W range invalid or exceeds 65536 CIDs")
            for cid in range(int(c), c2 + 1):
                out[str(cid)] = width
            i += 3
        else:
            break
    return out


def parse_pdf_spans(data: bytes) -> list[dict]:
    """One PDF file -> north-rule span rows (kind, text, media_ref, offset).

    Emits doc-level pdf_font spans (deduped across pages), then per page
    a pdf_page descriptor + the pdf_ops content stream. Content bytes
    ride the text column via surrogateescape (lossless round trip into
    decode_unit's encode). ValueError-only contract, like every codec in
    this repo (hostile nesting/offsets wrapped below)."""
    try:
        return _parse_pdf_spans(data)
    except ValueError:
        raise
    except Exception as e:  # RecursionError, IndexError, struct.error, ...
        raise ValueError(f"malformed PDF: {type(e).__name__}: {e}") from e


def _parse_pdf_spans(data: bytes) -> list[dict]:
    pdf = PdfFile(data)
    spans: list[dict] = []
    off = 0

    def emit(kind, text):
        nonlocal off
        spans.append({"kind": kind, "text": text, "media_ref": None, "offset": off})
        off += 1

    pages = pdf.pages()
    if not pages:
        raise ValueError("PDF has no pages")
    # collect per-page font blobs FIRST: fonts whose resource key maps to
    # one blob doc-wide go to doc-level pdf_font spans (the common case);
    # a key reused for a DIFFERENT font on another page would silently
    # decode both pages with whichever blob came last (r4 review), so
    # conflicting keys ship page-scoped inside the pdf_page descriptor
    # (doc_to_units appends descriptor fonts AFTER doc fonts, so the
    # page-local blob wins for that unit only).
    page_fonts: list[dict[str, str]] = []
    key_blobs: dict[str, set[str]] = {}
    for page in pages:
        res = pdf._resolve(page.get("Resources")) or {}
        fonts = pdf._resolve(res.get("Font")) if isinstance(res, dict) else None
        blobs: dict[str, str] = {}
        if isinstance(fonts, dict):
            for key, fref in fonts.items():
                fd = pdf._resolve(fref)
                if isinstance(fd, dict):
                    blobs[key] = pdf.font_descriptor(key, fd)
                    key_blobs.setdefault(key, set()).add(blobs[key])
        page_fonts.append(blobs)
    doc_level = {k for k, bs in key_blobs.items() if len(bs) == 1}
    emitted: set[str] = set()
    for blobs in page_fonts:
        for key, blob in blobs.items():
            if key in doc_level and blob not in emitted:
                emitted.add(blob)
                emit("pdf_font", blob)

    page_payloads = []
    for pno, page in enumerate(pages):
        media_box = [float(pdf._resolve(v)) for v in (pdf._resolve(page.get("MediaBox")) or [0, 0, 612, 792])]
        desc: dict = {"page": pno, "media_box": media_box,
                      "rotate": int(pdf._resolve(page.get("Rotate")) or 0)}
        crop = pdf._resolve(page.get("CropBox"))
        if crop:
            desc["crop_box"] = [float(pdf._resolve(v)) for v in crop]
        local = [b for k, b in page_fonts[pno].items() if k not in doc_level]
        if local:
            desc["fonts"] = local
        content = pdf.page_content(page)
        try:
            payload = content.decode("utf-8")
        except UnicodeDecodeError:
            # binary content (inline images, binary string operands):
            # surrogateescape strings break Arrow serialization (r4
            # review: one such file killed the whole ingest task), so
            # wrap in ASCII85 and let decode_unit's declared transport
            # reverse it — the payload stays plain ASCII end to end
            import base64

            payload = (base64.a85encode(content) + b"~>").decode("ascii")
            desc["content_filters"] = ["ASCII85Decode"]
        page_payloads.append((json.dumps(desc, sort_keys=True), payload))
    for desc_json, _payload in page_payloads:
        emit("pdf_page", desc_json)
    for _desc_json, payload in page_payloads:
        emit("pdf_ops", payload)
    return spans


def ingest_pdf_files(spark, path: str, num_partitions: int | None = None):
    """Directory/glob of .pdf files -> north-rule docs table with per-file
    failure accounting (failed files surface with an empty spans array +
    error column). ``doc_id`` is the scheme-stripped file path — the bare
    basename collided for same-named files in different directories
    (r4 review).

    Output order is whatever the scan produced: no global sort here — a
    corpus-wide ``orderBy(doc_id)`` would range-shuffle every span payload
    in the default ingest path for nothing (r4 verdict; downstream
    ``extract_spans`` hash-repartitions immediately, and deterministic
    ordering belongs at the sink — sort there if you need it)."""
    files = spark.read.format("binaryFile").load(path).select("path", "content")
    if num_partitions:
        files = files.repartition(num_partitions)

    def run(batches):
        import pandas as pd

        for pdf_batch in batches:
            rows = []
            for p, content in zip(pdf_batch["path"], pdf_batch["content"]):
                doc_id = p.split("://", 1)[-1].removeprefix("file:")
                try:
                    rows.append((doc_id, parse_pdf_spans(bytes(content)), None))
                except Exception as e:
                    rows.append((doc_id, [], f"{type(e).__name__}: {e}"))
            yield pd.DataFrame(rows, columns=["doc_id", "spans", "error"])

    schema = ("doc_id string, spans array<struct<kind:string,text:string,"
              "media_ref:string,offset:int>>, error string")
    return files.mapInPandas(run, schema=schema).select("doc_id", "spans", "error")
