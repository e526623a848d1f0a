"""Standard security handler (ISO 32000-1/-2 §7.6) — empty-user-password
decryption, from spec, stdlib only.

The reference accepts passwords through qpdf (reference
src/parse/pdf_decoders/document.h:39-43,82 passes them to
QPDF::processMemoryFile); this container has no qpdf, so the common
real-world case — /Encrypt'd web PDFs whose USER password is empty — is
implemented here from the spec:

* RC4 (40-128 bit, /V 1/2, /R 2/3) and crypt filters /V2 + /AESV2
  (/V 4, /R 4) with the Algorithm-2 MD5 key derivation and the
  Algorithm-1 per-object key (num/gen salt, +sAlT for AES).
* AES-256 (/V 5, /R 5 revision and the ISO 32000-2 /R 6 revision with
  the Algorithm-2.B iterated SHA-256/384/512 hash), file key unwrapped
  from /UE via AES-CBC.
* AES itself is a from-spec (FIPS-197) table implementation — encrypt is
  needed too, because Algorithm 2.B's hash loop runs AES-128-CBC in the
  forward direction.

Files that need a NON-empty password, use a non-/Standard handler, or an
unsupported /V raise ValueError with a clear message and surface through
the ingest path's per-file failure accounting.
"""

from __future__ import annotations

import hashlib
import struct

# --------------------------------------------------------------------- RC4


def rc4(key: bytes, data: bytes) -> bytes:
    """RC4 stream cipher (symmetric: encrypt == decrypt)."""
    S = list(range(256))
    j = 0
    for i in range(256):
        j = (j + S[i] + key[i % len(key)]) & 0xFF
        S[i], S[j] = S[j], S[i]
    out = bytearray(len(data))
    i = j = 0
    for n, c in enumerate(data):
        i = (i + 1) & 0xFF
        j = (j + S[i]) & 0xFF
        S[i], S[j] = S[j], S[i]
        out[n] = c ^ S[(S[i] + S[j]) & 0xFF]
    return bytes(out)


# --------------------------------------------------------------- AES (FIPS-197)

_SBOX = bytes.fromhex(
    "637c777bf26b6fc53001672bfed7ab76ca82c97dfa5947f0add4a2af9ca472c0"
    "b7fd9326363ff7cc34a5e5f171d8311504c723c31896059a071280e2eb27b275"
    "09832c1a1b6e5aa0523bd6b329e32f8453d100ed20fcb15b6acbbe394a4c58cf"
    "d0efaafb434d338545f9027f503c9fa851a3408f929d38f5bcb6da2110fff3d2"
    "cd0c13ec5f974417c4a77e3d645d197360814fdc222a908846eeb814de5e0bdb"
    "e0323a0a4906245cc2d3ac629195e479e7c8376d8dd54ea96c56f4ea657aae08"
    "ba78252e1ca6b4c6e8dd741f4bbd8b8a703eb5664803f60e613557b986c11d9e"
    "e1f8981169d98e949b1e87e9ce5528df8ca1890dbfe6426841992d0fb054bb16"
)
_INV_SBOX = bytes(256)
_inv = bytearray(256)
for _i, _v in enumerate(_SBOX):
    _inv[_v] = _i
_INV_SBOX = bytes(_inv)
del _inv, _i, _v

_RCON = [0x01, 0x02, 0x04, 0x08, 0x10, 0x20, 0x40, 0x80, 0x1B, 0x36,
         0x6C, 0xD8, 0xAB, 0x4D]


def _xtime(a: int) -> int:
    a <<= 1
    return (a ^ 0x1B) & 0xFF if a & 0x100 else a


_MUL = [[0] * 256 for _ in range(16)]
for _c in range(256):
    x1 = _c
    x2 = _xtime(x1)
    x4 = _xtime(x2)
    x8 = _xtime(x4)
    _MUL[1][_c] = x1
    _MUL[2][_c] = x2
    _MUL[3][_c] = x2 ^ x1
    _MUL[9][_c] = x8 ^ x1
    _MUL[11][_c] = x8 ^ x2 ^ x1
    _MUL[13][_c] = x8 ^ x4 ^ x1
    _MUL[14][_c] = x8 ^ x4 ^ x2
del _c, x1, x2, x4, x8


def _expand_key(key: bytes) -> list[list[int]]:
    nk = len(key) // 4
    if nk not in (4, 6, 8):
        raise ValueError(f"AES key must be 16/24/32 bytes, got {len(key)}")
    nr = nk + 6
    w = [list(key[4 * i : 4 * i + 4]) for i in range(nk)]
    for i in range(nk, 4 * (nr + 1)):
        t = list(w[i - 1])
        if i % nk == 0:
            t = t[1:] + t[:1]
            t = [_SBOX[b] for b in t]
            t[0] ^= _RCON[i // nk - 1]
        elif nk > 6 and i % nk == 4:
            t = [_SBOX[b] for b in t]
        w.append([a ^ b for a, b in zip(w[i - nk], t)])
    # group into round keys of 16 bytes
    return [sum(w[4 * r : 4 * r + 4], []) for r in range(nr + 1)]


_SHIFT = [0, 5, 10, 15, 4, 9, 14, 3, 8, 13, 2, 7, 12, 1, 6, 11]
_INV_SHIFT = [0, 13, 10, 7, 4, 1, 14, 11, 8, 5, 2, 15, 12, 9, 6, 3]


def _encrypt_block(rk: list[list[int]], block: bytes) -> bytes:
    s = [b ^ k for b, k in zip(block, rk[0])]
    m2, m3 = _MUL[2], _MUL[3]
    for rnd in range(1, len(rk) - 1):
        # SubBytes + ShiftRows
        t = [_SBOX[s[_SHIFT[i]]] for i in range(16)]
        # MixColumns + AddRoundKey
        k = rk[rnd]
        s = [0] * 16
        for c in range(0, 16, 4):
            a0, a1, a2, a3 = t[c], t[c + 1], t[c + 2], t[c + 3]
            s[c] = m2[a0] ^ m3[a1] ^ a2 ^ a3 ^ k[c]
            s[c + 1] = a0 ^ m2[a1] ^ m3[a2] ^ a3 ^ k[c + 1]
            s[c + 2] = a0 ^ a1 ^ m2[a2] ^ m3[a3] ^ k[c + 2]
            s[c + 3] = m3[a0] ^ a1 ^ a2 ^ m2[a3] ^ k[c + 3]
    k = rk[-1]
    return bytes(_SBOX[s[_SHIFT[i]]] ^ k[i] for i in range(16))


def _decrypt_block(rk: list[list[int]], block: bytes) -> bytes:
    s = [b ^ k for b, k in zip(block, rk[-1])]
    m9, m11, m13, m14 = _MUL[9], _MUL[11], _MUL[13], _MUL[14]
    for rnd in range(len(rk) - 2, 0, -1):
        # InvShiftRows + InvSubBytes
        t = [_INV_SBOX[s[_INV_SHIFT[i]]] for i in range(16)]
        # AddRoundKey + InvMixColumns
        k = rk[rnd]
        t = [a ^ b for a, b in zip(t, k)]
        s = [0] * 16
        for c in range(0, 16, 4):
            a0, a1, a2, a3 = t[c], t[c + 1], t[c + 2], t[c + 3]
            s[c] = m14[a0] ^ m11[a1] ^ m13[a2] ^ m9[a3]
            s[c + 1] = m9[a0] ^ m14[a1] ^ m11[a2] ^ m13[a3]
            s[c + 2] = m13[a0] ^ m9[a1] ^ m14[a2] ^ m11[a3]
            s[c + 3] = m11[a0] ^ m13[a1] ^ m9[a2] ^ m14[a3]
    return bytes(_INV_SBOX[s[_INV_SHIFT[i]]] ^ k for i, k in zip(range(16), rk[0]))


# ------------------------------------------------- platform AES (OpenSSL)
# CPython's ssl module links the system libcrypto, so the EVP AES-CBC
# primitives are ALREADY on this machine — use them when loadable (native
# speed: ~1 GB/s vs ~1-20 MB/s for the pure-Python paths below) and fall
# back to the from-spec FIPS-197 implementation otherwise. The pure path
# stays the tested REFERENCE: tests/test_pdf_crypt.py pins both paths
# bit-identical, and SPARK_GRAFT_PURE_AES=1 forces the fallback.

_EVP = None  # (lib, cipher_by_keylen) or False once probing failed


def _load_evp():
    global _EVP
    if _EVP is not None:
        return _EVP or None
    import os

    if os.environ.get("SPARK_GRAFT_PURE_AES"):
        _EVP = False
        return None
    try:
        import ctypes
        import ctypes.util

        names = [ctypes.util.find_library("crypto"),
                 "libcrypto.so.3", "libcrypto.so.1.1", "libcrypto.so"]
        lib = None
        for name in names:
            if not name:
                continue
            try:
                cand = ctypes.CDLL(name)
                cand.EVP_CIPHER_CTX_new  # symbol probe
                cand.EVP_aes_128_cbc
                lib = cand
                break
            except (OSError, AttributeError):
                continue
        if lib is None:
            _EVP = False
            return None
        c_void_p, c_int, c_char_p = ctypes.c_void_p, ctypes.c_int, ctypes.c_char_p
        lib.EVP_CIPHER_CTX_new.restype = c_void_p
        lib.EVP_CIPHER_CTX_free.argtypes = [c_void_p]
        for f in ("EVP_aes_128_cbc", "EVP_aes_192_cbc", "EVP_aes_256_cbc"):
            getattr(lib, f).restype = c_void_p
        lib.EVP_CipherInit_ex.restype = c_int
        lib.EVP_CipherInit_ex.argtypes = [c_void_p, c_void_p, c_void_p,
                                          c_char_p, c_char_p, c_int]
        lib.EVP_CIPHER_CTX_set_padding.argtypes = [c_void_p, c_int]
        lib.EVP_CipherUpdate.restype = c_int
        lib.EVP_CipherUpdate.argtypes = [c_void_p, c_char_p,
                                         ctypes.POINTER(c_int), c_char_p, c_int]
        _EVP = (ctypes, lib)
    except Exception:
        _EVP = False
        return None
    return _EVP


def _evp_cbc(key: bytes, iv: bytes, data: bytes, encrypt: bool) -> bytes | None:
    """AES-CBC via the system libcrypto; None = unavailable (caller falls
    back to the pure path). No padding — callers align/unpad themselves."""
    evp = _load_evp()
    if evp is None:
        return None
    ctypes, lib = evp
    fn = {16: lib.EVP_aes_128_cbc, 24: lib.EVP_aes_192_cbc,
          32: lib.EVP_aes_256_cbc}.get(len(key))
    if fn is None:
        return None
    cipher = fn()
    ctx = lib.EVP_CIPHER_CTX_new()
    if not ctx:
        return None
    try:
        if lib.EVP_CipherInit_ex(ctx, cipher, None, key, iv,
                                 1 if encrypt else 0) != 1:
            return None
        lib.EVP_CIPHER_CTX_set_padding(ctx, 0)
        out = ctypes.create_string_buffer(len(data) + 16)
        outl = ctypes.c_int(0)
        if lib.EVP_CipherUpdate(ctx, out, ctypes.byref(outl), data,
                                len(data)) != 1:
            return None
        if outl.value != len(data):  # block-aligned, padding off -> exact
            return None
        return out.raw[: outl.value]
    finally:
        lib.EVP_CIPHER_CTX_free(ctx)


# Fused forward T-tables (FIPS-197 §5.1 as 32-bit words): Te0[x] is the
# column word (2·S[x], S[x], S[x], 3·S[x]) big-endian; Te1-3 its byte
# rotations. One AES round becomes 16 table lookups + xors instead of the
# byte-wise SubBytes/ShiftRows/MixColumns above — ~4x on the Algorithm 2.B
# hash loop, which runs AES-128-CBC forward over ~2 KB × ~70 rounds per
# encrypted-file open (the dominant cost of opening AES-256 PDFs; CBC
# ENCRYPTION is chain-serial, so the numpy block-parallel trick that
# vectorizes decryption below cannot apply here).
_TE0 = [0] * 256
_TE1 = [0] * 256
_TE2 = [0] * 256
_TE3 = [0] * 256
for _c in range(256):
    _s = _SBOX[_c]
    _t = (_MUL[2][_s] << 24) | (_s << 16) | (_s << 8) | _MUL[3][_s]
    _TE0[_c] = _t
    _TE1[_c] = ((_t >> 8) | (_t << 24)) & 0xFFFFFFFF
    _TE2[_c] = ((_t >> 16) | (_t << 16)) & 0xFFFFFFFF
    _TE3[_c] = ((_t >> 24) | (_t << 8)) & 0xFFFFFFFF
del _c, _s, _t


def _expand_key_words(key: bytes) -> list[tuple[int, int, int, int]]:
    return [
        tuple((k[4 * i] << 24) | (k[4 * i + 1] << 16) | (k[4 * i + 2] << 8)
              | k[4 * i + 3] for i in range(4))
        for k in _expand_key(key)
    ]


def _encrypt_block_words(mid_rounds, k0, klast, s0, s1, s2, s3):
    """One block as four 32-bit column words -> four words.
    ``mid_rounds`` = round-key tuples 1..Nr-1, ``k0``/``klast`` the first/
    last (hoisted by the CBC loop so per-block slicing isn't repaid)."""
    s0 ^= k0[0]
    s1 ^= k0[1]
    s2 ^= k0[2]
    s3 ^= k0[3]
    e0, e1, e2, e3 = _TE0, _TE1, _TE2, _TE3
    for k in mid_rounds:
        t0 = e0[s0 >> 24] ^ e1[(s1 >> 16) & 255] ^ e2[(s2 >> 8) & 255] ^ e3[s3 & 255] ^ k[0]
        t1 = e0[s1 >> 24] ^ e1[(s2 >> 16) & 255] ^ e2[(s3 >> 8) & 255] ^ e3[s0 & 255] ^ k[1]
        t2 = e0[s2 >> 24] ^ e1[(s3 >> 16) & 255] ^ e2[(s0 >> 8) & 255] ^ e3[s1 & 255] ^ k[2]
        t3 = e0[s3 >> 24] ^ e1[(s0 >> 16) & 255] ^ e2[(s1 >> 8) & 255] ^ e3[s2 & 255] ^ k[3]
        s0, s1, s2, s3 = t0, t1, t2, t3
    b = _SBOX
    return (
        ((b[s0 >> 24] << 24) | (b[(s1 >> 16) & 255] << 16)
         | (b[(s2 >> 8) & 255] << 8) | b[s3 & 255]) ^ klast[0],
        ((b[s1 >> 24] << 24) | (b[(s2 >> 16) & 255] << 16)
         | (b[(s3 >> 8) & 255] << 8) | b[s0 & 255]) ^ klast[1],
        ((b[s2 >> 24] << 24) | (b[(s3 >> 16) & 255] << 16)
         | (b[(s0 >> 8) & 255] << 8) | b[s1 & 255]) ^ klast[2],
        ((b[s3 >> 24] << 24) | (b[(s0 >> 16) & 255] << 16)
         | (b[(s1 >> 8) & 255] << 8) | b[s2 & 255]) ^ klast[3],
    )


def aes_cbc_encrypt(key: bytes, iv: bytes, data: bytes) -> bytes:
    """AES-CBC, NO padding (caller aligns) — Algorithm 2.B runs this.
    T-table word path (bit-identical to the byte-wise reference blocks
    above, property-tested in tests/test_pdf_crypt.py)."""
    if len(data) % 16:
        raise ValueError("aes_cbc_encrypt: data not block-aligned")
    if data:
        evp = _evp_cbc(key, iv, data, encrypt=True)
        if evp is not None:
            return evp
    rkw = _expand_key_words(key)
    mid, k0, klast = rkw[1:-1], rkw[0], rkw[-1]
    n = len(data) // 4
    words = struct.unpack(f">{n}I", data)
    out = []
    p0, p1, p2, p3 = struct.unpack(">4I", iv)
    enc = _encrypt_block_words
    for i in range(0, n, 4):
        p0, p1, p2, p3 = enc(
            mid, k0, klast,
            words[i] ^ p0, words[i + 1] ^ p1,
            words[i + 2] ^ p2, words[i + 3] ^ p3,
        )
        out += (p0, p1, p2, p3)
    return struct.pack(f">{n}I", *out)


def aes_cbc_decrypt(key: bytes, iv: bytes, data: bytes, unpad: bool = True) -> bytes:
    """AES-CBC decrypt; strips the RFC 2898 padding PDF uses unless the
    caller (the /UE /OE key unwrap) asks for raw blocks.

    CBC DECRYPTION is parallel across blocks (plain[i] = ECB_dec(c[i]) ^
    c[i-1]), so payloads >= 1 KiB go through a numpy-vectorized ECB pass
    with fused uint32 T-tables — measured ~19 MB/s/core vs ~0.44 for the
    scalar path (~44x), which matters when ingesting encrypted corpora
    at scale (a multi-MB stream per page otherwise costs seconds of
    CPU). Small inputs (object keys, short strings) stay scalar. Both
    paths are bit-identical (tested against each other and FIPS-197)."""
    if len(data) % 16 or not data:
        raise ValueError("aes_cbc_decrypt: ciphertext not block-aligned")
    evp = _evp_cbc(key, iv, data, encrypt=False)
    if evp is not None:
        out = bytearray(evp)
        if unpad:
            n = out[-1]
            if not 1 <= n <= 16:
                raise ValueError("aes_cbc_decrypt: invalid padding")
            del out[-n:]
        return bytes(out)
    rk = _expand_key(key)
    # the T-tables pack output bytes little-endian; big-endian hosts
    # (none in practice) take the scalar path rather than a byteswap
    # dance that would never be exercised
    import sys

    if len(data) >= 1024 and sys.byteorder == "little":
        import numpy as np

        # XOR the ECB output with the shifted ciphertext (iv + c[:-16]);
        # one pass, no intermediate bytearray round trips (r5 review)
        ecb = np.frombuffer(_ecb_decrypt_np(rk, data), dtype=np.uint8)
        prev = np.frombuffer(iv + data[:-16], dtype=np.uint8)
        out = bytearray((ecb ^ prev).tobytes())
    else:
        out = bytearray()
        prev = iv
        for i in range(0, len(data), 16):
            blk = data[i : i + 16]
            out += bytes(a ^ b for a, b in zip(_decrypt_block(rk, blk), prev))
            prev = blk
    if unpad:
        n = out[-1]
        if not 1 <= n <= 16:
            raise ValueError("aes_cbc_decrypt: invalid padding")
        del out[-n:]
    return bytes(out)


_NP_TABLES = None


def _np_tables():
    """Fused uint32 T-tables for the equivalent inverse cipher
    (FIPS-197 §5.3.5): InvMixColumns is LINEAR, so
    InvMix(InvSbox(shift(s)) ^ k) == Td-lookups ^ InvMix(k) — one uint32
    gather per state byte per round instead of one sbox + four
    mul-table byte gathers."""
    global _NP_TABLES
    if _NP_TABLES is None:
        import numpy as np

        m9, m11, m13, m14 = _MUL[9], _MUL[11], _MUL[13], _MUL[14]

        def pack(b0, b1, b2, b3):
            return np.array(
                [b0[_INV_SBOX[x]] | (b1[_INV_SBOX[x]] << 8)
                 | (b2[_INV_SBOX[x]] << 16) | (b3[_INV_SBOX[x]] << 24)
                 for x in range(256)],
                dtype=np.uint32,
            )

        _NP_TABLES = {
            "inv_sbox": np.frombuffer(_INV_SBOX, dtype=np.uint8),
            "inv_shift": np.array(_INV_SHIFT, dtype=np.intp),
            "td": (pack(m14, m9, m13, m11), pack(m11, m14, m9, m13),
                   pack(m13, m11, m14, m9), pack(m9, m13, m11, m14)),
        }
    return _NP_TABLES


def _inv_mix_key(k: list[int]) -> list[int]:
    m9, m11, m13, m14 = _MUL[9], _MUL[11], _MUL[13], _MUL[14]
    out = [0] * 16
    for c in range(0, 16, 4):
        a0, a1, a2, a3 = k[c], k[c + 1], k[c + 2], k[c + 3]
        out[c] = m14[a0] ^ m11[a1] ^ m13[a2] ^ m9[a3]
        out[c + 1] = m9[a0] ^ m14[a1] ^ m11[a2] ^ m13[a3]
        out[c + 2] = m13[a0] ^ m9[a1] ^ m14[a2] ^ m11[a3]
        out[c + 3] = m11[a0] ^ m13[a1] ^ m9[a2] ^ m14[a3]
    return out


def _ecb_decrypt_np(rk: list[list[int]], data: bytes) -> bytes:
    """Vectorized AES-ECB decrypt over all blocks at once (equivalent
    inverse cipher with fused T-tables; bit-identical to _decrypt_block,
    asserted by tests)."""
    import numpy as np

    t = _np_tables()
    inv_sbox, inv_shift = t["inv_sbox"], t["inv_shift"]
    td0, td1, td2, td3 = t["td"]
    s = np.frombuffer(data, dtype=np.uint8).reshape(-1, 16).copy()
    s ^= np.array(rk[-1], dtype=np.uint8)
    dw = [np.array(_inv_mix_key(k), dtype=np.uint8).view(np.uint32)
          for k in rk]
    for rnd in range(len(rk) - 2, 0, -1):
        u32 = np.empty((s.shape[0], 4), dtype=np.uint32)
        for c in range(4):
            u32[:, c] = (
                td0[s[:, inv_shift[4 * c]]]
                ^ td1[s[:, inv_shift[4 * c + 1]]]
                ^ td2[s[:, inv_shift[4 * c + 2]]]
                ^ td3[s[:, inv_shift[4 * c + 3]]]
            )
        u32 ^= dw[rnd]
        s = u32.view(np.uint8).reshape(-1, 16)
    out = inv_sbox[s[:, inv_shift]] ^ np.array(rk[0], dtype=np.uint8)
    return out.tobytes()


# ------------------------------------------------- standard security handler

_PAD = bytes.fromhex(
    "28bf4e5e4e758a4164004e56fffa01082e2e00b6d0683e802f0ca9fe6453697a"
)


def _as_bytes(v) -> bytes:
    if isinstance(v, bytes):
        return v
    if isinstance(v, str):
        return v.encode("latin-1", "replace")
    raise ValueError("expected a string value in /Encrypt")


def _hash_2b(password: bytes, salt: bytes, udata: bytes) -> bytes:
    """Algorithm 2.B (ISO 32000-2 §7.6.4.3.4): iterated SHA-256/384/512
    with an AES-128-CBC feedback — used by the /R 6 revision."""
    k = hashlib.sha256(password + salt + udata).digest()
    i = 0
    while True:
        k1 = (password + k + udata) * 64
        e = aes_cbc_encrypt(k[:16], k[16:32], k1)
        mod = sum(e[:16]) % 3
        k = (hashlib.sha256, hashlib.sha384, hashlib.sha512)[mod](e).digest()
        i += 1
        if i >= 64 and e[-1] <= i - 32:
            return k[:32]


def _prep_password(password) -> bytes:
    """Password argument -> bytes. ISO 32000-2 §7.6.4.3.3 prescribes
    SASLprep + UTF-8 truncated to 127 bytes for R6; the common cases
    (ASCII, already-normalized Unicode) need only the encode + truncate.
    Callers with exotic legacy encodings can pass bytes directly."""
    if password is None:
        return b""
    if isinstance(password, str):
        return password.encode("utf-8")[:127]
    return bytes(password)[:127]


def _password_candidates(password, legacy: bool) -> list[bytes]:
    """Byte encodings to try for a supplied password. R2-4 key derivation
    uses raw byte strings that pre-Unicode writers encoded as
    PDFDocEncoding/cp1252/Latin-1, so for those revisions a ``str``
    password is tried in each byte encoding as well as UTF-8 (qpdf, the
    reference's delegate, does the same dance; r6 review — a correct
    non-ASCII legacy password was otherwise rejected). R5/6 prescribe
    UTF-8, so only that encoding is tried. ``bytes`` pass through
    untouched for callers who know their exact legacy encoding."""
    if password is None:
        return [b""]
    if not isinstance(password, str):
        return [bytes(password)[:127]]
    out = [password.encode("utf-8")[:127]]
    if legacy:
        for enc in ("cp1252", "latin-1"):
            try:
                b = password.encode(enc)[:127]
            except UnicodeEncodeError:
                continue
            if b not in out:
                out.append(b)
    return out


class StandardSecurityHandler:
    """Decryptor for one file, authenticated with the supplied password
    (default: the EMPTY user password, the common web-PDF case). The
    password is tried as the USER password first, then as the OWNER
    password (Algorithm 7 recovery for R2-4, the /O validation salts for
    R5/6) — same acceptance order as qpdf, which the reference delegates
    to (document.h:39-43, docling_parse/pdf_parser.py:988,1042-1050).

    ``decrypt(data, num, gen)`` handles streams, ``decrypt_string`` strings;
    both are identity when the relevant crypt filter is /Identity."""

    def __init__(self, enc: dict, id0: bytes, password=b""):
        if str(enc.get("Filter") or "") not in ("Standard",):
            raise ValueError(
                f"unsupported security handler {enc.get('Filter')!r} "
                "(only /Standard)"
            )
        v = int(enc.get("V") or 0)
        r = int(enc.get("R") or 0)
        self.v, self.r = v, r
        # /EncryptMetadata false => the /Metadata stream is PLAINTEXT and
        # the loader must not decrypt it (§7.6.3.2; also feeds the R4 key
        # derivation below)
        self.encrypt_metadata = enc.get("EncryptMetadata") is not False
        o = _as_bytes(enc.get("O"))
        u = _as_bytes(enc.get("U"))
        p = int(enc.get("P", -1)) & 0xFFFFFFFF
        length = int(enc.get("Length") or 40)
        self.stm_cfm = self.str_cfm = {1: "V2", 2: "V2"}.get(v)
        if v in (4, 5):
            cf = enc.get("CF") if isinstance(enc.get("CF"), dict) else {}

            def cf_entry(name):
                name = str(name or "Identity")
                if name == "Identity":
                    return "Identity", None
                f = cf.get(name)
                if not isinstance(f, dict):
                    return "None", None
                return str(f.get("CFM") or "None"), f.get("Length")

            self.stm_cfm, cf_len = cf_entry(enc.get("StmF"))
            self.str_cfm, _ = cf_entry(enc.get("StrF"))
            # /V 4: the key length comes from the CRYPT FILTER's /Length
            # (ISO 32000-1 Table 25 — bytes; some writers put bits), not
            # the top-level /Length, which only applies to V 2/3 (r5
            # review: a valid AES file without top-level /Length derived
            # a 5-byte key and was rejected as password-protected).
            # AESV2 keys are 16 bytes by definition.
            if self.stm_cfm == "AESV2":
                length = 128
            elif isinstance(cf_len, (int, float)) and cf_len:
                length = int(cf_len) * 8 if cf_len <= 40 else int(cf_len)
        elif v not in (1, 2):
            raise ValueError(f"unsupported /Encrypt /V {v}")
        for cfm in (self.stm_cfm, self.str_cfm):
            if cfm not in ("V2", "AESV2", "AESV3", "Identity"):
                raise ValueError(f"unsupported crypt filter method {cfm!r}")

        pw = _prep_password(password)
        if r in (2, 3, 4):
            n = 5 if r == 2 else max(5, min(16, length // 8))

            def derive_key(padded_user_pw: bytes) -> bytes:
                # Algorithm 2 (§7.6.3.3): file key from the PADDED user pw
                md = hashlib.md5(padded_user_pw + o + struct.pack("<I", p) + id0)
                if r == 4 and not self.encrypt_metadata:
                    md.update(b"\xff\xff\xff\xff")
                key = md.digest()
                if r >= 3:
                    for _ in range(50):
                        key = hashlib.md5(key[:n]).digest()
                return key[:n]

            def user_ok(key: bytes) -> bool:
                # Algorithms 4 (R2) / 5 (R3+): recompute /U and compare
                if r == 2:
                    return rc4(key, _PAD) == u[:32]
                h = hashlib.md5(_PAD + id0).digest()
                x = rc4(key, h)
                for i in range(1, 20):
                    x = rc4(bytes(b ^ i for b in key), x)
                return x == u[:16]

            def pad32(s: bytes) -> bytes:
                return (s + _PAD)[:32]

            # Algorithm 7: the OWNER password's RC4 key decrypts /O back
            # into the padded user password, from which the file key
            # follows as usual
            def recover_user_from_owner(owner_pw: bytes) -> bytes:
                h = hashlib.md5(pad32(owner_pw)).digest()
                if r >= 3:
                    for _ in range(50):
                        h = hashlib.md5(h[:n]).digest()
                okey = h[:n]
                if r == 2:
                    return rc4(okey, o[:32])
                x = o[:32]
                for i in range(19, -1, -1):
                    x = rc4(bytes(b ^ i for b in okey), x)
                return x

            self.key = None
            for cand in _password_candidates(password, legacy=True):
                for padded in (pad32(cand), recover_user_from_owner(cand)):
                    key = derive_key(padded)
                    if user_ok(key):
                        self.key = key
                        break
                if self.key is not None:
                    break
            if self.key is None:
                raise ValueError(
                    "password-protected PDF (supplied password rejected)"
                    if pw else
                    "password-protected PDF (empty user password rejected)"
                )
        elif r in (5, 6):
            vsalt, ksalt = u[32:40], u[40:48]
            o_vsalt, o_ksalt = o[32:40], o[40:48]
            if r == 5:  # the pre-ISO Adobe revision: single SHA-256
                hash_fn = lambda p_, salt, ud: hashlib.sha256(p_ + salt + ud).digest()  # noqa: E731
            else:
                hash_fn = _hash_2b
            ikey = ek = None
            if hash_fn(pw, vsalt, b"") == u[:32]:  # user (Algorithm 2.A)
                ikey = hash_fn(pw, ksalt, b"")
                ek = _as_bytes(enc.get("UE"))
            elif hash_fn(pw, o_vsalt, u[:48]) == o[:32]:  # owner
                ikey = hash_fn(pw, o_ksalt, u[:48])
                ek = _as_bytes(enc.get("OE"))
            if ikey is None:
                raise ValueError(
                    "password-protected PDF (supplied password rejected)"
                    if pw else
                    "password-protected PDF (empty user password rejected)"
                )
            self.key = aes_cbc_decrypt(ikey, bytes(16), ek[:32], unpad=False)
        else:
            raise ValueError(f"unsupported /Encrypt /R {r}")

    def _object_key(self, num: int, gen: int, aes: bool) -> bytes:
        if self.v == 5:
            return self.key  # AES-256: the file key is used directly
        md = hashlib.md5(
            self.key
            + struct.pack("<I", num)[:3]
            + struct.pack("<I", gen)[:2]
            + (b"sAlT" if aes else b"")
        )
        return md.digest()[: min(len(self.key) + 5, 16)]

    def _apply(self, cfm: str, data: bytes, num: int, gen: int) -> bytes:
        if cfm == "Identity" or not data:
            return data
        if cfm == "V2":
            return rc4(self._object_key(num, gen, aes=False), data)
        # AESV2/AESV3: 16-byte IV prefix + CBC + RFC 2898 padding
        if len(data) < 32 or len(data) % 16:
            raise ValueError("AES-encrypted data malformed (IV + blocks)")
        key = self._object_key(num, gen, aes=True)
        return aes_cbc_decrypt(key, data[:16], data[16:])

    def decrypt(self, data: bytes, num: int, gen: int) -> bytes:
        """Decrypt a stream body (NOT XRef/ObjStm-contained — callers skip
        those per §7.5.8.2 / §7.5.7)."""
        return self._apply(self.stm_cfm, data, num, gen)

    def decrypt_string(self, data: bytes, num: int, gen: int) -> bytes:
        return self._apply(self.str_cfm, data, num, gen)
