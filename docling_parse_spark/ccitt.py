"""CCITT Group 4 (ITU-T T.6, MMR) bilevel codec — pure Python.

The second real image codec (after ``jpeg.py``) closing the VERDICT r02
codec gap: PDFs embed fax-compressed bilevel scans via
``/CCITTFaxDecode`` with ``K < 0`` (pure 2-D MMR — the only mode the
reference's reader handles for scanned docs). Reference parity:
``src/parse/utils/ccitt/ccitt_utils.h`` (from-scratch T.6 reader).

API works on boolean numpy arrays (``True`` = black). PDF mapping: the
default ``BlackIs1 = false`` stream decodes 0-bits as black — callers
invert at the boundary if they carry raw PDF bit semantics.

Encode/decode implement the full T.6 vertical/horizontal/pass mode
machinery with the T.4 terminating + makeup + extended makeup run-length
tables (public spec constants). ``tests/test_ccitt.py`` verifies the
table sets are prefix-free and complete, and round-trips random images —
the codec is self-consistent AND structurally spec-conformant.
"""

from __future__ import annotations

import numpy as np

# ---------------------------------------------------- T.4 code tables
# run length -> bit string. Terminating codes 0..63 per color, makeup
# codes 64..1728 per color, extended makeup 1792..2560 shared.

WHITE_CODES = {
    0: "00110101", 1: "000111", 2: "0111", 3: "1000", 4: "1011", 5: "1100",
    6: "1110", 7: "1111", 8: "10011", 9: "10100", 10: "00111", 11: "01000",
    12: "001000", 13: "000011", 14: "110100", 15: "110101", 16: "101010",
    17: "101011", 18: "0100111", 19: "0001100", 20: "0001000", 21: "0010111",
    22: "0000011", 23: "0000100", 24: "0101000", 25: "0101011", 26: "0010011",
    27: "0100100", 28: "0011000", 29: "00000010", 30: "00000011",
    31: "00011010", 32: "00011011", 33: "00010010", 34: "00010011",
    35: "00010100", 36: "00010101", 37: "00010110", 38: "00010111",
    39: "00101000", 40: "00101001", 41: "00101010", 42: "00101011",
    43: "00101100", 44: "00101101", 45: "00000100", 46: "00000101",
    47: "00001010", 48: "00001011", 49: "01010010", 50: "01010011",
    51: "01010100", 52: "01010101", 53: "00100100", 54: "00100101",
    55: "01011000", 56: "01011001", 57: "01011010", 58: "01011011",
    59: "01001010", 60: "01001011", 61: "00110010", 62: "00110011",
    63: "00110100",
    64: "11011", 128: "10010", 192: "010111", 256: "0110111",
    320: "00110110", 384: "00110111", 448: "01100100", 512: "01100101",
    576: "01101000", 640: "01100111", 704: "011001100", 768: "011001101",
    832: "011010010", 896: "011010011", 960: "011010100", 1024: "011010101",
    1088: "011010110", 1152: "011010111", 1216: "011011000",
    1280: "011011001", 1344: "011011010", 1408: "011011011",
    1472: "010011000", 1536: "010011001", 1600: "010011010", 1664: "011000",
    1728: "010011011",
}

BLACK_CODES = {
    0: "0000110111", 1: "010", 2: "11", 3: "10", 4: "011", 5: "0011",
    6: "0010", 7: "00011", 8: "000101", 9: "000100", 10: "0000100",
    11: "0000101", 12: "0000111", 13: "00000100", 14: "00000111",
    15: "000011000", 16: "0000010111", 17: "0000011000", 18: "0000001000",
    19: "00001100111", 20: "00001101000", 21: "00001101100",
    22: "00000110111", 23: "00000101000", 24: "00000010111",
    25: "00000011000", 26: "000011001010", 27: "000011001011",
    28: "000011001100", 29: "000011001101", 30: "000001101000",
    31: "000001101001", 32: "000001101010", 33: "000001101011",
    34: "000011010010", 35: "000011010011", 36: "000011010100",
    37: "000011010101", 38: "000011010110", 39: "000011010111",
    40: "000001101100", 41: "000001101101", 42: "000011011010",
    43: "000011011011", 44: "000001010100", 45: "000001010101",
    46: "000001010110", 47: "000001010111", 48: "000001100100",
    49: "000001100101", 50: "000001010010", 51: "000001010011",
    52: "000000100100", 53: "000000110111", 54: "000000111000",
    55: "000000100111", 56: "000000101000", 57: "000001011000",
    58: "000001011001", 59: "000000101011", 60: "000000101100",
    61: "000001011010", 62: "000001100110", 63: "000001100111",
    64: "0000001111", 128: "000011001000", 192: "000011001001",
    256: "000001011011", 320: "000000110011", 384: "000000110100",
    448: "000000110101", 512: "0000001101100", 576: "0000001101101",
    640: "0000001001010", 704: "0000001001011", 768: "0000001001100",
    832: "0000001001101", 896: "0000001110010", 960: "0000001110011",
    1024: "0000001110100", 1088: "0000001110101", 1152: "0000001110110",
    1216: "0000001110111", 1280: "0000001010010", 1344: "0000001010011",
    1408: "0000001010100", 1472: "0000001010101", 1536: "0000001011010",
    1600: "0000001011011", 1664: "0000001100100", 1728: "0000001100101",
}

EXT_MAKEUP = {
    1792: "00000001000", 1856: "00000001100", 1920: "00000001101",
    1984: "000000010010", 2048: "000000010011", 2112: "000000010100",
    2176: "000000010101", 2240: "000000010110", 2304: "000000010111",
    2368: "000000011100", 2432: "000000011101", 2496: "000000011110",
    2560: "000000011111",
}

# mode codes (T.6 table 1)
_M_PASS = "0001"
_M_HORIZ = "001"
_M_VERT = {0: "1", 1: "011", -1: "010", 2: "000011", -2: "000010",
           3: "0000011", -3: "0000010"}
_EOFB = "000000000001" * 2


def _full_table(black: bool) -> dict[int, str]:
    t = dict(BLACK_CODES if black else WHITE_CODES)
    t.update(EXT_MAKEUP)
    return t


def _decode_table(black: bool) -> dict[str, int]:
    return {code: run for run, code in _full_table(black).items()}


_W_ENC, _B_ENC = _full_table(False), _full_table(True)
_W_DEC, _B_DEC = _decode_table(False), _decode_table(True)
_W_MAXLEN = max(len(c) for c in _W_DEC)
_B_MAXLEN = max(len(c) for c in _B_DEC)


def _emit_run(bits: list[str], run: int, black: bool) -> None:
    """Run length -> zero or more makeup codes + one terminating code."""
    table = _B_ENC if black else _W_ENC
    while run >= 64:
        mk = 2560 if run >= 2560 + 64 else (run // 64) * 64
        bits.append(table[mk])
        run -= mk
    bits.append(table[run])


def _changes(row: np.ndarray) -> list[int]:
    """Ascending positions of changing elements (pixel differs from its
    left neighbour; imaginary white pixel before position 0). Index parity
    encodes direction: even = white->black, odd = black->white."""
    w = len(row)
    prev = np.empty(w, dtype=bool)
    prev[0] = False
    prev[1:] = row[:-1]
    return np.nonzero(row != prev)[0].tolist()


def _next_change(changes: list[int], pos: int, parity: int, width: int) -> tuple[int, int]:
    """(value, index) of the first change > pos whose index has ``parity``
    (0 = white->black); (width, len) when none."""
    i = 0
    n = len(changes)
    while i < n and changes[i] <= pos:
        i += 1
    if (i & 1) != parity:
        i += 1
    if i >= n:
        return width, n
    return changes[i], i


def _after(changes: list[int], idx: int, width: int) -> int:
    return changes[idx + 1] if idx + 1 < len(changes) else width


def encode_g4(img: np.ndarray) -> bytes:
    """Encode a bool (H, W) array (True = black) as a T.6 MMR stream,
    EOFB-terminated, MSB-first bit packing."""
    return _pack_bits(_encode_plane_bits(img))


def encode_g4_planes(planes) -> bytes:
    """Encode several equal-width bilevel planes as ONE continuous T.6
    bit stream, each plane EOFB-terminated, with no byte alignment
    between planes (the T.88 Annex C.5 grayscale-bitplane layout; only
    the whole stream is padded to a byte)."""
    bits: list[str] = []
    for p in planes:
        bits.extend(_encode_plane_bits(p))
    return _pack_bits(bits)


def _pack_bits(bits: list[str]) -> bytes:
    stream = "".join(bits)
    stream += "0" * ((-len(stream)) % 8)
    return bytes(int(stream[i:i + 8], 2) for i in range(0, len(stream), 8))


def _encode_plane_bits(img: np.ndarray) -> list[str]:
    img = np.asarray(img, dtype=bool)
    if img.ndim != 2 or img.shape[0] == 0 or img.shape[1] == 0:
        raise ValueError("need a non-empty 2-D bilevel array")
    h, w = img.shape
    bits: list[str] = []
    ref: list[int] = []  # imaginary all-white reference line: no changes
    for y in range(h):
        cur = _changes(img[y])
        a0 = -1
        black = False
        while a0 < w:
            parity = 1 if black else 0
            a1, _ = _next_change(cur, a0, parity, w)
            b1, bi = _next_change(ref, a0, parity, w)
            b2 = _after(ref, bi, w)
            if b2 < a1:
                bits.append(_M_PASS)
                a0 = b2
            elif abs(a1 - b1) <= 3:
                bits.append(_M_VERT[a1 - b1])
                a0 = a1
                black = not black
            else:
                a2, _ = _next_change(cur, a1, 1 - parity, w)
                start = 0 if a0 < 0 else a0
                bits.append(_M_HORIZ)
                _emit_run(bits, a1 - start, black)
                _emit_run(bits, a2 - a1, not black)
                a0 = a2
        ref = cur
    bits.append(_EOFB)
    return bits


class _Bits:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.n = len(data) * 8

    def peek(self, k: int) -> str:
        out = []
        for i in range(self.pos, min(self.pos + k, self.n)):
            out.append("1" if (self.data[i >> 3] >> (7 - (i & 7))) & 1 else "0")
        return "".join(out)

    def take(self, k: int) -> None:
        self.pos += k


_MODES = (("1", "V0"), ("011", "VR1"), ("010", "VL1"), ("001", "H"),
          ("0001", "P"), ("000011", "VR2"), ("000010", "VL2"),
          ("0000011", "VR3"), ("0000010", "VL3"))


def _read_mode(b: _Bits) -> str:
    window = b.peek(7)
    for code, name in _MODES:
        if window.startswith(code):
            b.take(len(code))
            return name
    if window.startswith("0000000"):
        return "EOFB"
    raise ValueError("invalid T.6 mode code")


def _read_run(b: _Bits, black: bool) -> int:
    """One full run: makeup code(s) + terminating code of one colour."""
    dec = _B_DEC if black else _W_DEC
    maxlen = _B_MAXLEN if black else _W_MAXLEN
    total = 0
    while True:
        window = b.peek(maxlen)
        for ln in range(2, len(window) + 1):
            run = dec.get(window[:ln])
            if run is not None:
                b.take(ln)
                total += run
                break
        else:
            raise ValueError("invalid T.4 run-length code")
        if run < 64:
            return total


def decode_g4(data: bytes, width: int, height: int | None = None) -> np.ndarray:
    """Decode a T.6 MMR stream to a bool (H, width) array (True = black).
    With ``height`` None, decode rows until EOFB."""
    return _decode_rows(_Bits(data), width, height)


class MMRPlaneDecoder:
    """Stateful reader over ONE continuous T.6 stream holding several
    fixed-height planes, each terminated by EOFB with no byte alignment
    between them — the T.88 Annex C.5 grayscale-bitplane layout (the
    same convention pdf.js and jbig2dec implement)."""

    __slots__ = ("_bits",)

    def __init__(self, data: bytes):
        self._bits = _Bits(data)

    def decode_plane(self, width: int, height: int) -> np.ndarray:
        rows = _decode_rows(self._bits, width, height)
        if self._bits.peek(24) != _EOFB:
            raise ValueError("missing EOFB after MMR bitplane")
        self._bits.take(24)
        return rows


def _decode_rows(b: _Bits, width: int, height: int | None) -> np.ndarray:
    if width <= 0:
        raise ValueError("width must be positive")
    rows: list[np.ndarray] = []
    ref: list[int] = []
    while height is None or len(rows) < height:
        row = np.zeros(width, dtype=bool)
        a0 = -1
        black = False
        while a0 < width:
            prev_a0 = a0
            mode = _read_mode(b)
            if mode == "EOFB":
                if a0 != -1:
                    raise ValueError("EOFB inside a row")
                if height is not None:
                    raise ValueError("EOFB before expected height")
                return np.array(rows) if rows else np.zeros((0, width), bool)
            parity = 1 if black else 0
            b1, bi = _next_change(ref, a0, parity, width)
            b2 = _after(ref, bi, width)
            start = 0 if a0 < 0 else a0
            if mode == "P":
                row[start:b2] = black
                a0 = b2
            elif mode == "H":
                run1 = _read_run(b, black)
                run2 = _read_run(b, not black)
                a1 = start + run1
                a2 = a1 + run2
                if a2 > width:
                    raise ValueError("run past end of row")
                row[start:a1] = black
                row[a1:a2] = not black
                a0 = a2
            else:
                delta = {"V0": 0, "VR1": 1, "VR2": 2, "VR3": 3,
                         "VL1": -1, "VL2": -2, "VL3": -3}[mode]
                a1 = b1 + delta
                if a1 < 0 or a1 > width:
                    raise ValueError("vertical mode out of range")
                row[start:a1] = black
                a0 = a1
                black = not black
            # a conformant stream always advances a0 (runs of 0 only occur
            # where the opposite run is positive); a hostile stream must
            # not be able to spin forever
            if a0 <= prev_a0:
                raise ValueError("coder made no progress (malformed stream)")
        rows.append(row)
        ref = _changes(row)
    return np.array(rows)
