"""PDF content-stream tokenizer.

Produces the typed instruction list ``[(operator, [operands...]), ...]`` that the
interpreter consumes — the same IR as the reference's
``vector<qpdf_stream_instruction>`` (reference: src/parse/qpdf/stream_decoder.h:61-177,
src/parse/qpdf/stream_instruction.h). The reference delegates lexing to qpdf's
``parseContentStream``; we lex PDF content-stream syntax directly (PDF 32000-1:2008
§7.2/§7.8.2): numbers, literal/hex strings, names, arrays, dicts, booleans, null,
comments, and inline-image payload skipping.

Malformed-number repair (reference: stream_decoder.h:45-47,125-174):
PDF generators in the wild emit run-together numbers like ``1.23-45`` (two
numbers) or ``--12.3`` (doubled sign). Rules reproduced here:

* a numeric token with an embedded ``-`` at position > 0 is split at every
  internal ``-``; the ``-`` signs the following number: ``1.23-45`` -> 1.23, -45
* a leading run of ``-`` collapses to one sign: ``--12.3`` -> -12.3
* ``null`` operands are reinterpreted as empty arrays (stream_decoder.h:120-124)

Operand value mapping: numbers -> float, strings -> bytes, names -> str (no
leading slash), arrays -> list, dicts -> dict, booleans -> bool, null -> [].
"""

from __future__ import annotations

import re

_WHITESPACE = b"\x00\t\n\x0c\r "
_DELIMS = b"()<>[]{}/%"
# C-level scanners for the hottest per-byte loops (identical byte classes):
# whitespace runs + %-comments-to-EOL, and bare tokens (non-ws, non-delim)
_WS_RE = re.compile(rb"(?:[\x00\t\n\x0c\r ]+|%[^\r\n]*)+")
_HEX_DIGITS = frozenset(b"0123456789abcdefABCDEF")
_BARE_RE = re.compile(rb"[^\x00\t\n\x0c\r ()<>\[\]{}/%]+")
_NUM_RE = re.compile(rb"^[+-]?(\d+\.?\d*|\.\d+)$")
# a token that is number-shaped except for embedded '-' signs
_MALFORMED_NUM_RE = re.compile(rb"^[+-]{0,2}(\d+\.?\d*|\.\d+)(-+(\d+\.?\d*|\.\d+))+$")
_LEADING_MINUS_RE = re.compile(rb"^-{2,}((\d+\.?\d*|\.\d+))$")

_ESCAPES = {
    ord("n"): b"\n",
    ord("r"): b"\r",
    ord("t"): b"\t",
    ord("b"): b"\b",
    ord("f"): b"\x0c",
    ord("("): b"(",
    ord(")"): b")",
    ord("\\"): b"\\",
}


class Lexer:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.n = len(data)

    def _skip_ws(self) -> None:
        m = _WS_RE.match(self.data, self.pos)
        if m:
            self.pos = m.end()

    def next_token(self):
        """Return (kind, value) or None at EOF.

        kinds: num (float), str (bytes), name (str), kw (bytes),
               arr_open/arr_close/dict_open/dict_close (None).
        Malformed run-together numbers are returned as kind 'nums' with a
        list of floats (the repair path). Iterative (never recursive): the
        loop re-enters after skipping noise bytes. Single-method dispatch
        (the old next_token/_next_token_once split cost one extra call +
        a skip-tuple compare per token on the hottest decode loop)."""
        d = self.data
        n = self.n
        pos = self.pos
        while True:
            m = _WS_RE.match(d, pos)
            if m:
                pos = m.end()
            if pos >= n:
                self.pos = pos
                return None
            c = d[pos]
            if c == 40:  # (
                self.pos = pos
                return ("str", self._literal_string())
            if c == 60:  # <
                if pos + 1 < n and d[pos + 1] == 60:
                    self.pos = pos + 2
                    return ("dict_open", None)
                self.pos = pos
                return ("str", self._hex_string())
            if c == 62:  # >
                if pos + 1 < n and d[pos + 1] == 62:
                    self.pos = pos + 2
                    return ("dict_close", None)
                pos += 1  # stray '>' — drop
                continue
            if c == 91:  # [
                self.pos = pos + 1
                return ("arr_open", None)
            if c == 93:  # ]
                self.pos = pos + 1
                return ("arr_close", None)
            if c == 47:  # /
                self.pos = pos
                return ("name", self._name())
            if c == 123 or c == 125 or c == 41:  # braces / stray ')' — skip
                pos += 1
                continue
            # bare token: number, keyword, or operator
            m = _BARE_RE.match(d, pos)
            if m is None:  # lone delimiter byte that no branch consumed
                pos += 1
                continue
            tok = m.group()
            self.pos = m.end()
            if _NUM_RE.match(tok):
                return ("num", float(tok))
            m = _LEADING_MINUS_RE.match(tok)
            if m:  # '--12.3' -> -12.3
                return ("num", -float(m.group(1)))
            if _MALFORMED_NUM_RE.match(tok):  # '1.23-45' -> [1.23, -45.0]
                return ("nums", _split_run_together(tok))
            return ("kw", tok)

    def _literal_string(self) -> bytes:
        # '(' already at pos; balanced parens, backslash escapes (PDF §7.3.4.2)
        d, n = self.data, self.n
        self.pos += 1
        depth = 1
        out = bytearray()
        while self.pos < n:
            c = d[self.pos]
            if c == 92:  # backslash
                self.pos += 1
                if self.pos >= n:
                    break
                e = d[self.pos]
                if e in _ESCAPES:
                    out += _ESCAPES[e]
                    self.pos += 1
                elif 0x30 <= e <= 0x37:  # octal, up to 3 digits
                    oct_digits = bytearray()
                    while self.pos < n and len(oct_digits) < 3 and 0x30 <= d[self.pos] <= 0x37:
                        oct_digits.append(d[self.pos])
                        self.pos += 1
                    out.append(int(bytes(oct_digits), 8) & 0xFF)
                elif e in (10, 13):  # line continuation
                    self.pos += 1
                    if e == 13 and self.pos < n and d[self.pos] == 10:
                        self.pos += 1
                else:  # unknown escape: keep the char
                    out.append(e)
                    self.pos += 1
            elif c == 40:  # (
                depth += 1
                out.append(c)
                self.pos += 1
            elif c == 41:  # )
                depth -= 1
                self.pos += 1
                if depth == 0:
                    break
                out.append(c)
            else:
                out.append(c)
                self.pos += 1
        return bytes(out)

    def _hex_string(self) -> bytes:
        d, n = self.data, self.n
        self.pos += 1  # '<'
        digits = bytearray()
        while self.pos < n and d[self.pos] != 62:  # >
            c = d[self.pos]
            if c in b"0123456789abcdefABCDEF":
                digits.append(c)
            # non-hex bytes inside a hex string are dropped (malformed input)
            self.pos += 1
        self.pos += 1  # '>'
        if len(digits) % 2:
            digits.append(ord("0"))  # PDF: odd count padded with 0
        return bytes.fromhex(digits.decode("ascii"))

    def _name(self) -> str:
        d = self.data
        self.pos += 1  # '/'
        m = _BARE_RE.match(d, self.pos)
        raw = m.group() if m else b""
        if m:
            self.pos = m.end()
        # #xx hex escapes in names (PDF §7.3.5)
        if b"#" in raw:
            out = bytearray()
            i = 0
            while i < len(raw):
                # PDF 7.3.5: exactly two hex digits; a truncated escape at
                # end-of-name stays literal
                if (raw[i] == ord("#") and i + 2 < len(raw)
                        and raw[i + 1] in _HEX_DIGITS and raw[i + 2] in _HEX_DIGITS):
                    # strict two-hex-digit check: int(b'+4', 16) would
                    # accept sign characters (r4 review)
                    out.append(int(raw[i + 1 : i + 3], 16))
                    i += 3
                    continue
                out.append(raw[i])
                i += 1
            raw = bytes(out)
        return raw.decode("utf-8", "replace")


def _split_run_together(tok: bytes) -> list[float]:
    """'1.23-45-6' -> [1.23, -45.0, -6.0]; leading sign kept on the first."""
    s = tok.decode("ascii")
    # collapse any leading '-' run to one
    sign = ""
    i = 0
    while i < len(s) and s[i] in "+-":
        if s[i] == "-":
            sign = "-"
        i += 1
    body = s[i:]
    parts = body.split("-")
    out = [float(sign + parts[0])]
    out.extend(-float(p) for p in parts[1:] if p)
    return out


def tokenize(data: bytes) -> list[tuple[str, list]]:
    """Tokenize a content stream into [(operator, operands), ...].

    Inline-image payloads are skipped: ``BI``/``ID``/``EI`` are emitted as
    bare operators with no operands so the interpreter can no-op them exactly
    like the reference (stream.h:779-795).
    """
    lex = Lexer(data)
    next_token = lex.next_token
    instructions: list[tuple[str, list]] = []
    operands: list = []
    stack: list[list] = []  # open arrays/dict-item lists
    # hot path first (num/str/name operands, then operators); emit_value is
    # inlined — the closure call per operand was measurable in the decode loop
    while True:
        tok = next_token()
        if tok is None:
            break
        kind, val = tok
        if kind == "num" or kind == "str" or kind == "name":
            (stack[-1] if stack else operands).append(val)
        elif kind == "kw":
            if val == b"true":
                (stack[-1] if stack else operands).append(True)
            elif val == b"false":
                (stack[-1] if stack else operands).append(False)
            elif val == b"null":
                # reference: null params -> [] (stream_decoder.h:120-124)
                (stack[-1] if stack else operands).append([])
            else:
                op = val.decode("latin-1")
                if op == "ID":
                    # skip binary inline-image payload to the EI delimiter
                    instructions.append(("ID", []))
                    _skip_inline_image(lex)
                    instructions.append(("EI", []))
                    operands = []
                    continue
                instructions.append((op, operands))
                operands = []
        elif kind == "nums":
            for v in val:
                (stack[-1] if stack else operands).append(v)
        elif kind == "arr_open" or kind == "dict_open":
            stack.append([("__dict__",)] if kind == "dict_open" else [])
        elif kind == "arr_close":
            if stack:
                v = stack.pop()
                (stack[-1] if stack else operands).append(v)
        elif kind == "dict_close":
            if stack:
                items = stack.pop()
                items = [x for x in items if x != ("__dict__",)]
                d = {}
                for k, v in zip(items[0::2], items[1::2]):
                    try:
                        d[k] = v
                    except TypeError:
                        # malformed dict with a non-name (unhashable) key:
                        # skip the pair, keep the page (r4 review — the
                        # tokenizer repairs garbage everywhere else)
                        continue
                (stack[-1] if stack else operands).append(d)
    return instructions


def _skip_inline_image(lex: Lexer) -> None:
    d, n = lex.data, lex.n
    i = lex.pos + 1  # one whitespace byte follows ID
    relaxed = None
    while i + 1 < n:
        if d[i] == ord("E") and d[i + 1] == ord("I"):
            before_ok = i == 0 or d[i - 1] in _WHITESPACE
            after_ok = i + 2 >= n or d[i + 2] in _WHITESPACE
            if before_ok and after_ok:
                lex.pos = i + 2
                return
            if after_ok and relaxed is None:
                relaxed = i + 2  # binary ran flush into EI
        i += 1
    lex.pos = relaxed if relaxed is not None else n
