"""JPEG 2000 Part-1 codestream codec (ISO/IEC 15444-1 / ITU-T T.800) —
pure Python + numpy, from the public spec.

Closes the last media-codec gap (SURVEY §2: JPX pixels were previously
metadata-only; the reference wraps openjpeg — ``jpx_utils.h`` — so, as
with JBIG2/qpdf, there is no reference source to port: this is written
from the standard). Scope — the lossless profile PDF ``/JPXDecode``
scans actually use, structured per spec so each layer is testable:

* Tier-2: SOC/SIZ/COD/QCD/SOT/SOD/EOC markers, LRCP progression, one
  quality layer, default precincts (one per resolution), tag-tree-coded
  packet headers with FF-stuffing (B.10).
* Tier-1: the EBCOT context-modelling block coder (Annex D) — three
  coding passes per bitplane (significance propagation, magnitude
  refinement, cleanup with run-length mode), band-dependent context
  tables D.1-D.4 — over the SAME Annex-E MQ arithmetic coder as
  ``jbig2.py`` (T.88 Annex E == T.800 Annex C; the coder is shared and
  externally anchored by the JBIG2 known-answer stream).
* Wavelet: reversible 5/3 lifting AND the irreversible 9/7 float
  lifting (Annex F), whole-sample symmetric extension, arbitrary sizes,
  multi-level; scalar-expounded dequantization (Annex E) with midpoint
  reconstruction for the 9/7 path.
* Multi-component: reversible (RCT) and irreversible (ICT) colour
  transforms (Annex G) + DC level shift.

The encoder is test infrastructure in the repo's established pattern
(``ccitt.encode_g4``, ``encode_jbig2_*``): a deterministic writer used
by round-trip tests, fixtures, and the driver-oracled media lanes.

Performance posture: Tier-1 is a per-sample Python loop —
correctness-grade, like the JBIG2 arithmetic path. In the Spark media
lane whole images decode in parallel inside Arrow batches across
executors; the hot path for bulk raster stays PNG/JPEG/CCITT.

Out of scope (typed ``ValueError`` refusals, per-file accounted):
multiple tiles, user precincts, SOP/EPH markers, arithmetic-bypass /
termination code-block styles, scalar-derived QCD, and ROI shifts —
none of which our writer emits; callers fall back to the header-only
metadata row on refusal.
"""

from __future__ import annotations

import struct

import numpy as np

from docling_parse_spark.jbig2 import _MQDecoder, _MQEncoder

# ---------------------------------------------------------------- tag trees
# B.10.2: a quad-tree over the code-block grid; each node's value is the
# minimum of its children; bits answer "is the node's value > t?" as t
# counts up from the parent's (known) value.


class TagTreeEncoder:
    """Tag tree over a w x h leaf grid, values set before encoding."""

    def __init__(self, w: int, h: int):
        if w <= 0 or h <= 0:
            raise ValueError("tag tree needs a positive grid")
        self.dims = []
        while True:
            self.dims.append((w, h))
            if w == 1 and h == 1:
                break
            w, h = (w + 1) // 2, (h + 1) // 2
        self.values = [np.zeros((hh, ww), dtype=np.int64)
                       for ww, hh in self.dims]

    def set(self, i: int, j: int, v: int) -> None:
        self.values[0][j, i] = v

    def finalize(self) -> None:
        """Propagate minima up the tree; call once after all set()."""
        for lv in range(1, len(self.dims)):
            lo = self.values[lv - 1]
            w, h = self.dims[lv]
            for jj in range(h):
                for ii in range(w):
                    blk = lo[2 * jj:2 * jj + 2, 2 * ii:2 * ii + 2]
                    self.values[lv][jj, ii] = blk.min()
        # per-node emission threshold state (how far each node has been
        # coded), shared across leaves so common ancestors code once
        self._low = [np.zeros((hh, ww), dtype=np.int64)
                     for ww, hh in self.dims]
        self._known = [np.zeros((hh, ww), dtype=bool)
                       for ww, hh in self.dims]

    def encode(self, bw, i: int, j: int, threshold: int) -> None:
        """Emit bits so a decoder querying leaf (i, j) against
        ``threshold`` learns min(value, threshold)."""
        low = 0
        for lv in range(len(self.dims) - 1, -1, -1):
            ii, jj = i >> lv, j >> lv
            if self._low[lv][jj, ii] < low:
                self._low[lv][jj, ii] = low
            v = self.values[lv][jj, ii]
            while self._low[lv][jj, ii] < threshold:
                t = self._low[lv][jj, ii]
                if self._known[lv][jj, ii]:
                    break
                if v > t:
                    bw.bit(0)
                    self._low[lv][jj, ii] = t + 1
                else:
                    bw.bit(1)
                    self._known[lv][jj, ii] = True
            low = self._low[lv][jj, ii]


class TagTreeDecoder:
    """Decode-side mirror of :class:`TagTreeEncoder`."""

    def __init__(self, w: int, h: int):
        if w <= 0 or h <= 0:
            raise ValueError("tag tree needs a positive grid")
        self.dims = []
        while True:
            self.dims.append((w, h))
            if w == 1 and h == 1:
                break
            w, h = (w + 1) // 2, (h + 1) // 2
        self._low = [np.zeros((hh, ww), dtype=np.int64)
                     for ww, hh in self.dims]
        self._known = [np.zeros((hh, ww), dtype=bool)
                       for ww, hh in self.dims]

    def decode(self, br, i: int, j: int, threshold: int) -> int:
        """Return the leaf value if it is < ``threshold`` (node becomes
        known), else ``threshold`` (meaning: value >= threshold)."""
        low = 0
        for lv in range(len(self.dims) - 1, -1, -1):
            ii, jj = i >> lv, j >> lv
            if self._low[lv][jj, ii] < low:
                self._low[lv][jj, ii] = low
            while (not self._known[lv][jj, ii]
                   and self._low[lv][jj, ii] < threshold):
                if br.bit():
                    self._known[lv][jj, ii] = True
                else:
                    self._low[lv][jj, ii] += 1
            low = self._low[lv][jj, ii]
        return low


# ------------------------------------------------- packet-header bit I/O
# B.10.1: MSB-first; after any 0xFF byte only 7 bits follow (stuffed 0).


class _HdrBitWriter:
    def __init__(self):
        self.out = bytearray()
        self._acc = 0
        self._n = 0  # bits pending in _acc

    def _width(self) -> int:
        return 7 if self.out and self.out[-1] == 0xFF else 8

    def bit(self, b: int) -> None:
        self._acc = (self._acc << 1) | (b & 1)
        self._n += 1
        if self._n == self._width():
            self.out.append(self._acc)
            self._acc = 0
            self._n = 0

    def bits(self, v: int, n: int) -> None:
        for k in range(n - 1, -1, -1):
            self.bit((v >> k) & 1)

    def flush(self) -> bytes:
        if self._n:
            self.out.append(self._acc << (self._width() - self._n))
            self._acc = 0
            self._n = 0
        if self.out and self.out[-1] == 0xFF:
            self.out.append(0)  # header may not end on 0xFF
        return bytes(self.out)


class _HdrBitReader:
    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.pos = pos
        self._acc = 0
        self._n = 0
        self._prev_ff = False

    def bit(self) -> int:
        if self._n == 0:
            if self.pos >= len(self.data):
                raise ValueError("truncated packet header")
            byte = self.data[self.pos]
            self.pos += 1
            if self._prev_ff:
                self._acc = byte & 0x7F
                self._n = 7
                if byte & 0x80:
                    raise ValueError("invalid bit stuffing in packet header")
            else:
                self._acc = byte
                self._n = 8
            self._prev_ff = byte == 0xFF
        self._n -= 1
        return (self._acc >> self._n) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def align(self) -> None:
        if self._prev_ff and self._n == 0:
            # the stuffing byte after a trailing 0xFF belongs to the header
            if self.pos >= len(self.data):
                raise ValueError("truncated packet header")
            if self.data[self.pos] & 0x80:
                raise ValueError("invalid bit stuffing in packet header")
            self.pos += 1
        self._acc = 0
        self._n = 0
        self._prev_ff = False


# ------------------------------------------------------- 5/3 wavelet (F)


def _fwd53_1d(x: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """F.4.8.2.1 forward 5/3 lifting on one axis-0 signal (start index
    even); returns (low, high) subbands."""
    n = x.shape[0]
    if n == 1:
        return x.copy(), x[:0].copy()
    # whole-sample symmetric extension, one sample each side; X(k) sits
    # at xe[k + 1]
    xe = np.concatenate([x[1:2], x, x[-2:-1]])
    n_low = (n + 1) // 2
    n_high = n // 2
    high = np.empty((n_high,) + x.shape[1:], dtype=np.int64)
    for i in range(n_high):
        c = 1 + 2 * i + 1  # position of X(2i+1) in ext
        high[i] = xe[c] - ((xe[c - 1] + xe[c + 1]) >> 1)
    low = np.empty((n_low,) + x.shape[1:], dtype=np.int64)
    for i in range(n_low):
        hm1 = high[i - 1] if i - 1 >= 0 else (high[0] if n_high else 0)
        h0 = high[i] if i < n_high else high[n_high - 1]
        low[i] = x[2 * i] + ((hm1 + h0 + 2) >> 2)
    return low, high


def _inv53_1d(low: np.ndarray, high: np.ndarray) -> np.ndarray:
    """F.3.8.2 inverse 5/3 lifting; exact inverse of :func:`_fwd53_1d`."""
    n_low, n_high = low.shape[0], high.shape[0]
    n = n_low + n_high
    if n == 1:
        return low.copy() if n_low else high.copy()
    x = np.empty((n,) + low.shape[1:], dtype=np.int64)
    for i in range(n_low):
        hm1 = high[i - 1] if i - 1 >= 0 else (high[0] if n_high else 0)
        h0 = high[i] if i < n_high else high[n_high - 1]
        x[2 * i] = low[i] - ((hm1 + h0 + 2) >> 2)
    for i in range(n_high):
        e0 = x[2 * i]
        e2 = x[2 * i + 2] if 2 * i + 2 < n else x[2 * i]
        x[2 * i + 1] = high[i] + ((e0 + e2) >> 1)
    return x


def fdwt53(img: np.ndarray, levels: int) -> list[dict]:
    """Forward reversible DWT: returns [{'LL' (last level only), 'HL',
    'LH', 'HH'}, ...] from level 1 (finest) to ``levels``; the final
    entry carries the LL band."""
    a = np.asarray(img, dtype=np.int64)
    bands = []
    for _ in range(levels):
        lo_v, hi_v = _fwd53_1d(a)                      # columns (axis 0)
        ll, hl = (t.T for t in _fwd53_1d(lo_v.T))      # rows of the low
        lh, hh = (t.T for t in _fwd53_1d(hi_v.T))      # rows of the high
        bands.append({"HL": hl, "LH": lh, "HH": hh})
        a = ll
    bands[-1]["LL"] = a
    return bands


def idwt53(bands: list[dict]) -> np.ndarray:
    """Inverse of :func:`fdwt53`."""
    a = bands[-1]["LL"]
    for lv in range(len(bands) - 1, -1, -1):
        b = bands[lv]
        lo_v = _inv53_1d(a.T, b["HL"].T).T             # rows back
        hi_v = _inv53_1d(b["LH"].T, b["HH"].T).T
        a = _inv53_1d(lo_v, hi_v)                      # columns back
    return a


# ------------------------------------------------ Tier-1 block coder (D)
# 19 MQ contexts: 0-8 significance, 9-13 sign, 14-16 magnitude
# refinement, 17 run-length, 18 uniform. Initial states per Table D.7.

_CTX_RL = 17
_CTX_UNI = 18
_N_CTX = 19


def _fresh_t1_contexts() -> tuple[bytearray, bytearray]:
    ci = bytearray(_N_CTX)
    cm = bytearray(_N_CTX)
    ci[0] = 4        # all-zero-neighbours significance context
    ci[_CTX_RL] = 3
    ci[_CTX_UNI] = 46
    return ci, cm


def _sig_ctx_tables():
    """Significance context label per Table D.1, indexed
    [band_kind][h][v][d] with h,v in 0..2 and d in 0..4."""
    def label(kind, h, v, d):
        if kind == 2:  # HH: driven by (D, H+V)
            hv = h + v
            if d >= 3:
                return 8
            if d == 2:
                return 7 if hv >= 1 else 6
            if d == 1:
                return 5 if hv >= 2 else (4 if hv == 1 else 3)
            return 2 if hv >= 2 else (1 if hv == 1 else 0)
        if kind == 1:  # HL: H and V swap roles
            h, v = v, h
        if h == 2:
            return 8
        if h == 1:
            return 7 if v >= 1 else (6 if d >= 1 else 5)
        if v == 2:
            return 4
        if v == 1:
            return 3
        return 2 if d >= 2 else (1 if d == 1 else 0)

    return [[[[label(k, h, v, d) for d in range(5)] for v in range(3)]
             for h in range(3)] for k in range(3)]


_SIG_CTX = _sig_ctx_tables()
_BAND_KIND = {"LL": 0, "LH": 0, "HL": 1, "HH": 2}

# Table D.3: (h_contrib, v_contrib) -> (sign context, XOR bit)
_SIGN_CTX = {
    (1, 1): (13, 0), (1, 0): (12, 0), (1, -1): (11, 0),
    (0, 1): (10, 0), (0, 0): (9, 0), (0, -1): (10, 1),
    (-1, 1): (11, 1), (-1, 0): (12, 1), (-1, -1): (13, 1),
}


def _tier1_block(mq, ci: bytearray, cm: bytearray, w: int, h: int,
                 band: str, p_max: int, n_passes: int,
                 mag=None, sgn=None):
    """The EBCOT pass machinery (D.4), one codeword segment, default
    code-block style. ENCODES when ``mag``/``sgn`` are given (magnitude
    + sign planes of the coefficients), else DECODES ``n_passes`` passes
    starting at bitplane ``p_max`` and returns (mag, sgn). The single
    shared routine keeps both directions' context evolution identical
    by construction."""
    enc = mag is not None
    if not enc:
        mag = np.zeros((h, w), dtype=np.int64)
        sgn = np.zeros((h, w), dtype=np.uint8)
    sig = np.zeros((h, w), dtype=np.uint8)
    vis = np.zeros((h, w), dtype=np.uint8)   # coded in this bitplane (pi)
    eta = np.zeros((h, w), dtype=np.uint8)   # refined at least once

    def sig_at(i, j):
        if 0 <= i < w and 0 <= j < h:
            return sig[j, i]
        return 0

    def sig_ctx(i, j):
        hh = sig_at(i - 1, j) + sig_at(i + 1, j)
        vv = sig_at(i, j - 1) + sig_at(i, j + 1)
        dd = (sig_at(i - 1, j - 1) + sig_at(i + 1, j - 1)
              + sig_at(i - 1, j + 1) + sig_at(i + 1, j + 1))
        return _SIG_CTX[_BAND_KIND[band]][hh][vv][dd]

    def contrib(i, j):
        if not (0 <= i < w and 0 <= j < h) or not sig[j, i]:
            return 0
        return -1 if sgn[j, i] else 1

    def clamp(v):
        return -1 if v < -1 else (1 if v > 1 else v)

    def code_sign(i, j, p):
        hc = clamp(contrib(i - 1, j) + contrib(i + 1, j))
        vc = clamp(contrib(i, j - 1) + contrib(i, j + 1))
        cx, xor = _SIGN_CTX[(hc, vc)]
        if enc:
            mq.encode(ci, cm, cx, sgn[j, i] ^ xor)
        else:
            sgn[j, i] = mq.decode(ci, cm, cx) ^ xor
        sig[j, i] = 1
        if not enc:
            mag[j, i] |= 1 << p

    def scan():
        for s in range(0, h, 4):
            for i in range(w):
                for j in range(s, min(s + 4, h)):
                    yield i, j, s

    def spp(p):
        for i, j, _ in scan():
            if sig[j, i]:
                continue
            cx = sig_ctx(i, j)
            if cx == 0:
                continue
            if enc:
                bit = (mag[j, i] >> p) & 1
                mq.encode(ci, cm, cx, bit)
            else:
                bit = mq.decode(ci, cm, cx)
            vis[j, i] = 1
            if bit:
                code_sign(i, j, p)

    def mrp(p):
        for i, j, _ in scan():
            if not sig[j, i] or vis[j, i]:
                continue
            if eta[j, i]:
                cx = 16
            else:
                nb = (sig_at(i - 1, j) + sig_at(i + 1, j)
                      + sig_at(i, j - 1) + sig_at(i, j + 1)
                      + sig_at(i - 1, j - 1) + sig_at(i + 1, j - 1)
                      + sig_at(i - 1, j + 1) + sig_at(i + 1, j + 1))
                cx = 15 if nb else 14
            if enc:
                mq.encode(ci, cm, cx, (mag[j, i] >> p) & 1)
            else:
                mag[j, i] |= (mq.decode(ci, cm, cx) & 1) << p
            eta[j, i] = 1

    def cup(p):
        for s in range(0, h, 4):
            for i in range(w):
                j = s
                # run-length mode: a full 4-sample column, all
                # uncoded-insignificant with all-zero neighbourhoods
                if (s + 4 <= h
                        and all(not sig[jj, i] and not vis[jj, i]
                                and sig_ctx(i, jj) == 0
                                for jj in range(s, s + 4))):
                    if enc:
                        r = next((k for k in range(4)
                                  if (mag[s + k, i] >> p) & 1), 4)
                        mq.encode(ci, cm, _CTX_RL, 1 if r < 4 else 0)
                        if r == 4:
                            continue
                        mq.encode(ci, cm, _CTX_UNI, (r >> 1) & 1)
                        mq.encode(ci, cm, _CTX_UNI, r & 1)
                    else:
                        if not mq.decode(ci, cm, _CTX_RL):
                            continue
                        r = (mq.decode(ci, cm, _CTX_UNI) << 1
                             | mq.decode(ci, cm, _CTX_UNI))
                    code_sign(i, s + r, p)
                    j = s + r + 1
                for jj in range(j, min(s + 4, h)):
                    if sig[jj, i] or vis[jj, i]:
                        continue
                    cx = sig_ctx(i, jj)
                    if enc:
                        bit = (mag[jj, i] >> p) & 1
                        mq.encode(ci, cm, cx, bit)
                    else:
                        bit = mq.decode(ci, cm, cx)
                    if bit:
                        code_sign(i, jj, p)

    p = p_max
    pass_kind = 2  # the first pass of the top bitplane is a cleanup
    for _ in range(n_passes):
        if pass_kind == 0:
            spp(p)
        elif pass_kind == 1:
            mrp(p)
        else:
            cup(p)
            vis[:] = 0
            p -= 1
        pass_kind = 0 if pass_kind == 2 else pass_kind + 1
    if not enc:
        return mag, sgn
    return None


# --------------------------------------------------- Tier-2 / codestream

_SOC, _SIZ, _COD, _QCD, _SOT, _SOD, _EOC = (
    0xFF4F, 0xFF51, 0xFF52, 0xFF5C, 0xFF90, 0xFF93, 0xFFD9)
# markers that alter decode semantics: skipping them would silently
# produce wrong pixels, so they are typed refusals (COM/TLM/PLM/PLT/CRG
# are informational and skip freely)
_UNSUPPORTED_MARKERS = {
    0xFF53: "COC per-component coding style",
    0xFF5D: "QCC per-component quantization",
    0xFF5E: "RGN region of interest",
    0xFF5F: "POC progression order change",
    0xFF60: "PPM packed packet headers",
    0xFF61: "PPT packed packet headers",
}
_GUARD_BITS = 2
_BAND_GAIN = {"LL": 0, "HL": 1, "LH": 1, "HH": 2}
_MAX_PIXELS = 1 << 28


def _band_layout(w: int, h: int, levels: int) -> list[list[tuple[str, int, int]]]:
    """Per-resolution band list [(name, bw, bh), ...] for r = 0..levels
    (image origin 0: low half = ceil, high half = floor)."""
    dims = [(w, h)]
    for _ in range(levels):
        ww, hh = dims[-1]
        dims.append(((ww + 1) // 2, (hh + 1) // 2))
    out = [[("LL", dims[levels][0], dims[levels][1])]]
    for r in range(1, levels + 1):
        n = levels - r  # bands of decomposition level n+1 live here
        lw, lh = dims[n + 1]
        ww, hh = dims[n]
        hw, hy = ww - lw, hh - lh
        out.append([("HL", hw, lh), ("LH", lw, hy), ("HH", hw, hy)])
    return out


def _write_npasses(bw: _HdrBitWriter, n: int) -> None:
    """Table B.4 number-of-coding-passes code."""
    if n == 1:
        bw.bit(0)
    elif n == 2:
        bw.bits(0b10, 2)
    elif n <= 5:
        bw.bits(0b11, 2)
        bw.bits(n - 3, 2)
    elif n <= 36:
        bw.bits(0b1111, 4)
        bw.bits(n - 6, 5)
    elif n <= 164:
        bw.bits(0b111111111, 9)
        bw.bits(n - 37, 7)
    else:
        raise ValueError("too many coding passes")


def _read_npasses(br: _HdrBitReader) -> int:
    if not br.bit():
        return 1
    if not br.bit():
        return 2
    v = br.bits(2)
    if v != 3:
        return 3 + v
    v = br.bits(5)
    if v != 31:
        return 6 + v
    return 37 + br.bits(7)


def _cb_grid(bw_: int, bh_: int, cbw: int, cbh: int) -> tuple[int, int]:
    return (bw_ + cbw - 1) // cbw, (bh_ + cbh - 1) // cbh


def _encode_packet(bands: list, cbw: int, cbh: int) -> bytes:
    """One layer-0 packet for one (component, resolution): ``bands`` is
    [(name, band_w, band_h, Mb, coeff_array)], full-band precinct."""
    blocks = []  # (data, n_passes, zbp) per band, raster order
    incl_trees = []
    zbp_trees = []
    any_included = False
    for name, bw_, bh_, mb, coeff in bands:
        if bw_ == 0 or bh_ == 0:
            incl_trees.append(None)
            zbp_trees.append(None)
            blocks.append([])
            continue
        gx, gy = _cb_grid(bw_, bh_, cbw, cbh)
        it = TagTreeEncoder(gx, gy)
        zt = TagTreeEncoder(gx, gy)
        cbs = []
        for j in range(gy):
            for i in range(gx):
                sub = coeff[j * cbh:(j + 1) * cbh, i * cbw:(i + 1) * cbw]
                mag = np.abs(sub).astype(np.int64)
                mx = int(mag.max()) if mag.size else 0
                if mx == 0:
                    it.set(i, j, 1)  # never included (single layer)
                    zt.set(i, j, 0)
                    cbs.append(None)
                    continue
                nbits = mx.bit_length()
                if nbits > mb:
                    raise ValueError("coefficient exceeds Mb")
                zbp = mb - nbits
                n_passes = 1 + 3 * (nbits - 1)
                sgn = (sub < 0).astype(np.uint8)
                enc = _MQEncoder()
                ci, cm = _fresh_t1_contexts()
                _tier1_block(enc, ci, cm, sub.shape[1], sub.shape[0],
                             name, nbits - 1, n_passes, mag=mag, sgn=sgn)
                it.set(i, j, 0)
                zt.set(i, j, zbp)
                cbs.append((enc.finish(), n_passes, zbp))
                any_included = True
        it.finalize()
        zt.finalize()
        incl_trees.append(it)
        zbp_trees.append(zt)
        blocks.append(cbs)
    hdr = _HdrBitWriter()
    if not any_included:
        hdr.bit(0)
        return hdr.flush()
    hdr.bit(1)
    body = bytearray()
    for bi, (name, bw_, bh_, mb, coeff) in enumerate(bands):
        if bw_ == 0 or bh_ == 0:
            continue
        gx, gy = _cb_grid(bw_, bh_, cbw, cbh)
        it, zt, cbs = incl_trees[bi], zbp_trees[bi], blocks[bi]
        for j in range(gy):
            for i in range(gx):
                cb = cbs[j * gx + i]
                it.encode(hdr, i, j, 1)  # included iff value < 1
                if cb is None:
                    continue
                data, n_passes, zbp = cb
                zt.encode(hdr, i, j, 1 << 30)
                _write_npasses(hdr, n_passes)
                lblock = 3
                need = max(1, len(data).bit_length())
                avail = lblock + (n_passes.bit_length() - 1)
                add = max(0, need - avail)
                for _ in range(add):
                    hdr.bit(1)
                hdr.bit(0)
                lblock += add
                hdr.bits(len(data), lblock + (n_passes.bit_length() - 1))
                body += data
    return hdr.flush() + bytes(body)


def _decode_packet(data: bytes, pos: int, bands: list, cbw: int,
                   cbh: int) -> int:
    """Decode one layer-0 packet in place: ``bands`` is
    [(name, band_w, band_h, Mb, out_array)]. Returns the new pos."""
    br = _HdrBitReader(data, pos)
    if not br.bit():
        br.align()
        return br.pos
    todo = []  # (name, out, j0, i0, h, w, mb, zbp, n_passes, nbytes)
    for name, bw_, bh_, mb, out in bands:
        if bw_ == 0 or bh_ == 0:
            continue
        gx, gy = _cb_grid(bw_, bh_, cbw, cbh)
        it = TagTreeDecoder(gx, gy)
        zt = TagTreeDecoder(gx, gy)
        for j in range(gy):
            for i in range(gx):
                if it.decode(br, i, j, 1) >= 1:
                    continue  # not included in this (only) layer
                zbp = zt.decode(br, i, j, 1 << 30)
                n_passes = _read_npasses(br)
                lblock = 3
                while br.bit():
                    lblock += 1
                nbits = lblock + (n_passes.bit_length() - 1)
                nbytes = br.bits(nbits)
                todo.append((name, out, j, i, mb, zbp, n_passes, nbytes))
    br.align()
    pos = br.pos
    for name, out, j, i, mb, zbp, n_passes, nbytes in todo:
        seg = data[pos:pos + nbytes]
        if len(seg) != nbytes:
            raise ValueError("truncated code-block segment")
        pos += nbytes
        y0, x0 = j * cbh, i * cbw
        h = min(cbh, out.shape[0] - y0)
        w = min(cbw, out.shape[1] - x0)
        p_max = mb - 1 - zbp
        if p_max < 0 or p_max > 40:
            raise ValueError("invalid zero-bitplane count")
        dec = _MQDecoder(seg)
        ci, cm = _fresh_t1_contexts()
        mag, sgn = _tier1_block(dec, ci, cm, w, h, name, p_max, n_passes)
        vals = mag * (1 - 2 * sgn.astype(np.int64))
        out[y0:y0 + h, x0:x0 + w] = vals
    return pos


def encode_j2k(img: np.ndarray, levels: int = 3, cb: int = 64,
               bit_depth: int = 8, mct: bool | None = None,
               irreversible: bool = False,
               quant_extra_bits: int = 2) -> bytes:
    """(H, W) or (H, W, C) unsigned-int array -> raw JPEG 2000
    codestream (single tile, one layer, LRCP). With three components
    ``mct`` (default on) applies the colour transform (RCT, or ICT when
    irreversible). ``irreversible`` switches to the lossy 9/7 wavelet
    with scalar-expounded quantization; ``quant_extra_bits`` sets the
    step to 2**-quant_extra_bits (larger = finer = bigger stream)."""
    a = np.asarray(img)
    if a.ndim == 2:
        a = a[:, :, None]
    if a.ndim != 3 or a.size == 0:
        raise ValueError("need a non-empty 2-D or 3-D image array")
    h, w, nc = a.shape
    if h * w > _MAX_PIXELS:
        raise ValueError("image too large")
    if not 1 <= bit_depth <= 16:
        raise ValueError("bit depth out of range")
    if a.min() < 0 or a.max() >= (1 << bit_depth):
        raise ValueError("samples exceed the declared bit depth")
    if not 0 <= levels <= 32:
        raise ValueError("decomposition levels out of range")
    if cb not in (4, 8, 16, 32, 64) or cb * cb > 4096:
        raise ValueError("code-block size must be a power of two <= 64")
    use_mct = (nc == 3) if mct is None else (mct and nc == 3)
    if not 0 <= quant_extra_bits <= 8:
        raise ValueError("quant_extra_bits out of range")

    comps = [a[:, :, c].astype(np.int64) - (1 << (bit_depth - 1))
             for c in range(nc)]
    if use_mct:
        r, g, b = comps
        if irreversible:
            rf, gf, bf = (c.astype(np.float64) for c in (r, g, b))
            comps = [0.299 * rf + 0.587 * gf + 0.114 * bf,
                     -0.16875 * rf - 0.33126 * gf + 0.5 * bf,
                     0.5 * rf - 0.41869 * gf - 0.08131 * bf]
        else:
            y = (r + 2 * g + b) >> 2
            comps = [y, b - g, r - g]

    layout = _band_layout(w, h, levels)
    fdwt = fdwt97 if irreversible else fdwt53
    comp_bands = []
    for cdat in comps:
        bands_by_r = []
        if levels:
            dec = fdwt(cdat, levels)
            bands_by_r.append({"LL": dec[-1]["LL"]})
            for r in range(1, levels + 1):
                lv = levels - r  # dec index for this resolution
                bands_by_r.append({k: dec[lv][k] for k in ("HL", "LH", "HH")})
        else:
            bands_by_r.append({"LL": np.asarray(
                cdat, dtype=np.float64 if irreversible else np.int64)})
        comp_bands.append(bands_by_r)
    if irreversible:
        # E.4: scalar quantization; step 2**-quant_extra_bits via
        # eps_b = Rb + quant_extra_bits, mantissa 0
        for bands_by_r in comp_bands:
            for bdict in bands_by_r:
                for name, coeff in bdict.items():
                    q = np.floor(np.abs(coeff) * (1 << quant_extra_bits))
                    bdict[name] = (np.sign(coeff) * q).astype(np.int64)

    xcb = cb.bit_length() - 1
    out = bytearray()
    out += struct.pack(">H", _SOC)
    siz_body = struct.pack(">HIIIIIIIIH", 0, w, h, 0, 0, w, h, 0, 0, nc)
    siz_body += b"".join(bytes([bit_depth - 1, 1, 1]) for _ in range(nc))
    out += struct.pack(">HH", _SIZ, 2 + len(siz_body)) + siz_body
    cod_body = bytes([0, 0]) + struct.pack(">H", 1) + bytes([
        1 if use_mct else 0, levels, xcb - 2, xcb - 2, 0,
        0 if irreversible else 1])
    out += struct.pack(">HH", _COD, 2 + len(cod_body)) + cod_body
    exps = [bit_depth + _BAND_GAIN[name] + (quant_extra_bits
                                            if irreversible else 0)
            for bands in layout for (name, _, _) in bands]
    if irreversible:
        # scalar expounded (Sqcd style 2): 16-bit (exponent, mantissa=0)
        qcd_body = bytes([(_GUARD_BITS << 5) | 2]) + b"".join(
            struct.pack(">H", e << 11) for e in exps)
    else:
        qcd_body = bytes([_GUARD_BITS << 5]) + bytes(e << 3 for e in exps)
    out += struct.pack(">HH", _QCD, 2 + len(qcd_body)) + qcd_body

    tile = bytearray()
    for r in range(levels + 1):
        for c in range(nc):
            pk_bands = []
            for (name, bw_, bh_) in layout[r]:
                coeff = comp_bands[c][r].get(name)
                mb = _GUARD_BITS + (bit_depth + _BAND_GAIN[name]
                                    + (quant_extra_bits
                                       if irreversible else 0)) - 1
                pk_bands.append((name, bw_, bh_, mb, coeff))
            tile += _encode_packet(pk_bands, cb, cb)
    psot = 12 + 2 + len(tile)
    out += struct.pack(">HHHIBB", _SOT, 10, 0, psot, 0, 1)
    out += struct.pack(">H", _SOD)
    out += tile
    out += struct.pack(">H", _EOC)
    return bytes(out)


def decode_j2k(data: bytes) -> np.ndarray:
    """Raw JPEG 2000 codestream -> (H, W) or (H, W, C) uint16/uint8
    array. Lossless single-tile profile (see module docstring)."""
    if data[:2] != struct.pack(">H", _SOC):
        raise ValueError("not a JPEG 2000 codestream (no SOC)")
    pos = 2
    siz = cod = None
    qcd_exps = None
    qcd_mants = None
    qcd_steps = None
    guard = _GUARD_BITS
    tile_at = None
    while pos + 4 <= len(data):
        marker, ln = struct.unpack_from(">HH", data, pos)
        if marker == _SOD:
            tile_at = pos + 2
            break
        if marker == _EOC:
            break
        body = data[pos + 4:pos + 2 + ln]
        if len(body) != ln - 2:
            raise ValueError("truncated marker segment")
        if marker == _SIZ:
            (rsiz, xs, ys, xo, yo, xt, yt, xto, yto,
             nc) = struct.unpack_from(">HIIIIIIIIH", body, 0)
            if rsiz not in (0, 1, 2):
                raise ValueError("unsupported Rsiz capabilities")
            if xo or yo or xto or yto:
                raise ValueError("image/tile offsets not supported")
            if xt < xs or yt < ys:
                raise ValueError("multiple tiles not supported")
            if xs * ys > _MAX_PIXELS:
                raise ValueError("image too large")
            comps = []
            for c in range(nc):
                ssiz, xr, yr = struct.unpack_from("BBB", body, 36 + 3 * c)
                if ssiz & 0x80:
                    raise ValueError("signed components not supported")
                if xr != 1 or yr != 1:
                    raise ValueError("component subsampling not supported")
                comps.append(ssiz + 1)
            if len(set(comps)) != 1:
                raise ValueError("mixed component depths not supported")
            siz = {"w": xs, "h": ys, "nc": nc, "bd": comps[0]}
        elif marker == _COD:
            scod = body[0]
            if scod & 0x01:
                raise ValueError("user precincts not supported")
            if scod & 0x06:
                raise ValueError("SOP/EPH markers not supported")
            prog, layers = body[1], struct.unpack_from(">H", body, 2)[0]
            mct_f = body[4]
            levels, cbw_e, cbh_e, cbstyle, wav = body[5:10]
            if prog != 0:
                raise ValueError("only LRCP progression supported")
            if layers != 1:
                raise ValueError("only one quality layer supported")
            if cbstyle != 0:
                raise ValueError("code-block style flags not supported")
            if wav not in (0, 1):
                raise ValueError("unknown wavelet transform")
            if levels > 32:
                raise ValueError("too many decomposition levels")
            cod = {"levels": levels, "cbw": 1 << (cbw_e + 2),
                   "cbh": 1 << (cbh_e + 2), "mct": mct_f == 1,
                   "irreversible": wav == 0}
        elif marker == _QCD:
            sqcd = body[0]
            guard = sqcd >> 5
            style = sqcd & 0x1F
            if style == 0:  # no quantization (reversible)
                qcd_exps = [b >> 3 for b in body[1:]]
                qcd_steps = None
            elif style == 2:  # scalar expounded: (exp, mantissa) per band
                vals = [struct.unpack_from(">H", body, 1 + 2 * k)[0]
                        for k in range((len(body) - 1) // 2)]
                qcd_exps = [v >> 11 for v in vals]
                qcd_mants = [v & 0x7FF for v in vals]
                qcd_steps = "expounded"
            else:
                raise ValueError(
                    "only no-quantization or scalar-expounded QCD supported")
        elif marker == _SOT:
            isot, psot, tpsot, tnsot = struct.unpack_from(">HIBB", body, 0)
            if isot != 0 or tpsot != 0:
                raise ValueError("multiple tiles/tile-parts not supported")
        elif marker in _UNSUPPORTED_MARKERS:
            # skipping these would silently mis-decode; refuse typed so
            # callers fall back to the header-metadata row
            raise ValueError(
                f"unsupported marker 0x{marker:04X} "
                f"({_UNSUPPORTED_MARKERS[marker]})")
        pos += 2 + ln
    if siz is None or cod is None or qcd_exps is None or tile_at is None:
        raise ValueError("missing SIZ/COD/QCD/SOD")
    w, h, nc, bd = siz["w"], siz["h"], siz["nc"], siz["bd"]
    levels, cb_w, cb_h = cod["levels"], cod["cbw"], cod["cbh"]
    irrev = cod["irreversible"]
    if irrev != (qcd_steps == "expounded"):
        raise ValueError("COD wavelet / QCD quantization style mismatch")
    layout = _band_layout(w, h, levels)
    n_bands = sum(len(b) for b in layout)
    if len(qcd_exps) < n_bands:
        raise ValueError("QCD exponent list shorter than band count")

    comp_bands = [[{name: np.zeros((bh_, bw_), dtype=np.int64)
                    for (name, bw_, bh_) in layout[r]}
                   for r in range(levels + 1)] for _ in range(nc)]
    pos = tile_at
    exp_i = 0
    band_exp = {}
    band_mant = {}
    for r in range(levels + 1):
        for (name, _, _) in layout[r]:
            band_exp[(r, name)] = qcd_exps[exp_i]
            band_mant[(r, name)] = qcd_mants[exp_i] if qcd_mants else 0
            exp_i += 1
    for r in range(levels + 1):
        for c in range(nc):
            pk_bands = []
            for (name, bw_, bh_) in layout[r]:
                mb = guard + band_exp[(r, name)] - 1
                if not 1 <= mb <= 40:
                    raise ValueError("invalid Mb from QCD")
                pk_bands.append((name, bw_, bh_, mb,
                                 comp_bands[c][r][name]))
            pos = _decode_packet(data, pos, pk_bands, cb_w, cb_h)

    if irrev:
        # E.4: midpoint dequantization with per-band step
        # 2**(Rb - eps) * (1 + mu/2**11), Rb = bd + gain
        for c in range(nc):
            for r in range(levels + 1):
                for name in comp_bands[c][r]:
                    q = comp_bands[c][r][name]
                    rb = bd + _BAND_GAIN[name]
                    step = (2.0 ** (rb - band_exp[(r, name)])
                            * (1 + band_mant[(r, name)] / 2048.0))
                    comp_bands[c][r][name] = (
                        np.sign(q) * (np.abs(q) + 0.5) * step
                    ) * (q != 0)

    out = np.empty((h, w, nc), dtype=np.int64)
    idwt = idwt97 if irrev else idwt53
    planes = []
    for c in range(nc):
        if levels:
            dec = [{k: comp_bands[c][levels - lv][k]
                    for k in ("HL", "LH", "HH")} for lv in range(levels)]
            dec[-1]["LL"] = comp_bands[c][0]["LL"]
            planes.append(idwt(dec))
        else:
            planes.append(comp_bands[c][0]["LL"])
    if cod["mct"]:
        if nc != 3:
            raise ValueError("MCT flagged without three components")
        y, u, v = planes
        if irrev:
            planes = [y + 1.402 * v,
                      y - 0.344136 * u - 0.714136 * v,
                      y + 1.772 * u]
        else:
            g = y - ((u + v) >> 2)
            planes = [v + g, g, u + g]
    half = 1 << (bd - 1)
    for c in range(nc):
        p = planes[c]
        if irrev or p.dtype != np.int64:
            p = np.rint(p).astype(np.int64)
        out[:, :, c] = np.clip(p + half, 0, (1 << bd) - 1)
    dt = np.uint8 if bd <= 8 else np.uint16
    out = out.astype(dt)
    return out[:, :, 0] if nc == 1 else out


# ------------------------------------------- 9/7 irreversible path (F/E)
# Lifting constants, Table F.4. Anchor status: the codec pair is
# self-inverse by construction and pinned by a frozen KAT; unlike the MQ
# coder (externally anchored via JBIG2) there is no external 9/7 stream
# in this environment to cross-check against, so third-party lossy
# codestreams decode on a best-effort spec reading.
_A97 = -1.586134342059924
_B97 = -0.052980118572961
_G97 = 0.882911075530934
_D97 = 0.443506852043971
_K97 = 1.230174104914001


def _reflect(i: int, n: int) -> int:
    """Whole-sample symmetric index extension (period 2(n-1))."""
    if n == 1:
        return 0
    p = (2 * n - 2)
    i %= p
    return i if i < n else p - i


def _lift_1d(x: np.ndarray, inverse: bool) -> np.ndarray:
    """One 9/7 lifting chain over an interleaved even-start signal
    (float64, modified in place and returned)."""
    n = x.shape[0]
    if n == 1:
        return x
    evens = range(0, n, 2)
    odds = range(1, n, 2)

    def step(idx, coef):
        for i in idx:
            x[i] += coef * (x[_reflect(i - 1, n)] + x[_reflect(i + 1, n)])

    if not inverse:
        step(odds, _A97)
        step(evens, _B97)
        step(odds, _G97)
        step(evens, _D97)
        for i in evens:
            x[i] /= _K97
        for i in odds:
            x[i] *= _K97
    else:
        for i in evens:
            x[i] *= _K97
        for i in odds:
            x[i] /= _K97
        step(evens, -_D97)
        step(odds, -_G97)
        step(evens, -_B97)
        step(odds, -_A97)
    return x


def _fwd97_1d(x: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    y = _lift_1d(x.astype(np.float64).copy(), inverse=False)
    return y[0::2], y[1::2]


def _inv97_1d(low: np.ndarray, high: np.ndarray) -> np.ndarray:
    n = low.shape[0] + high.shape[0]
    y = np.empty((n,) + low.shape[1:], dtype=np.float64)
    y[0::2] = low
    y[1::2] = high
    return _lift_1d(y, inverse=True)


def fdwt97(img: np.ndarray, levels: int) -> list[dict]:
    """Forward irreversible DWT, same output layout as :func:`fdwt53`."""
    a = np.asarray(img, dtype=np.float64)
    bands = []
    for _ in range(levels):
        lo_v, hi_v = _fwd97_1d(a)
        ll, hl = (t.T for t in _fwd97_1d(lo_v.T))
        lh, hh = (t.T for t in _fwd97_1d(hi_v.T))
        bands.append({"HL": hl, "LH": lh, "HH": hh})
        a = ll
    bands[-1]["LL"] = a
    return bands


def idwt97(bands: list[dict]) -> np.ndarray:
    a = bands[-1]["LL"]
    for lv in range(len(bands) - 1, -1, -1):
        b = bands[lv]
        lo_v = _inv97_1d(a.T, b["HL"].T).T
        hi_v = _inv97_1d(b["LH"].T, b["HH"].T).T
        a = _inv97_1d(lo_v, hi_v)
    return a
