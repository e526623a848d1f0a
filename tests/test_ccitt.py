"""CCITT Group 4 (T.6 MMR) codec: table conformance, lossless round
trips, hostile inputs (reference parity:
/root/reference/src/parse/utils/ccitt/ccitt_utils.h)."""

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from docling_parse_spark.ccitt import (
    BLACK_CODES,
    EXT_MAKEUP,
    WHITE_CODES,
    decode_g4,
    encode_g4,
)


def _prefix_free(codes):
    codes = sorted(codes, key=len)
    for i, a in enumerate(codes):
        for b in codes[i + 1:]:
            if b.startswith(a):
                return False, (a, b)
    return True, None


def test_tables_structurally_conformant():
    """The T.4 tables must be prefix-free per colour (incl. the shared
    extended makeups), cover terminating runs 0..63 and makeups 64..2560
    in steps of 64, with spec code lengths (<= 13 bits, white term <= 8)."""
    for table in (WHITE_CODES, BLACK_CODES):
        runs = sorted(table)
        assert runs[:64] == list(range(64))
        assert runs[64:] == [64 * k for k in range(1, 28)]
    assert sorted(EXT_MAKEUP) == [1792 + 64 * k for k in range(13)]
    for base in (WHITE_CODES, BLACK_CODES):
        all_codes = list(base.values()) + list(EXT_MAKEUP.values())
        ok, pair = _prefix_free(all_codes)
        assert ok, f"prefix collision {pair}"
        assert len(set(all_codes)) == len(all_codes)
        assert max(len(c) for c in all_codes) <= 13
    assert max(len(WHITE_CODES[r]) for r in range(64)) <= 8


def test_roundtrip_edges():
    for img in (
        np.zeros((3, 5), bool),
        np.ones((3, 5), bool),
        np.eye(8, dtype=bool),
        np.ones((1, 1), bool),
        np.zeros((1, 2700), bool) | (np.arange(2700) % 97 == 0),  # >2560 runs
    ):
        img = np.atleast_2d(img)
        assert np.array_equal(decode_g4(encode_g4(img), img.shape[1], img.shape[0]), img)


def test_roundtrip_long_runs_use_makeups():
    """A 3000-wide line exercises extended makeup chaining (2560 + rest)."""
    img = np.zeros((2, 3000), dtype=bool)
    img[1, 100:2900] = True
    assert np.array_equal(decode_g4(encode_g4(img), 3000, 2), img)


@settings(max_examples=60, deadline=None)
@given(st.integers(1, 8), st.integers(1, 40), st.integers(0, 2**31 - 1))
def test_roundtrip_random_images(h, w, seed):
    rng = np.random.RandomState(seed)
    img = np.zeros((h, w), dtype=bool)
    for y in range(h):
        x, c = 0, bool(rng.randint(2))
        while x < w:
            r = rng.randint(1, 12)
            img[y, x:x + r] = c
            x += r
            c = not c
    assert np.array_equal(decode_g4(encode_g4(img), w, h), img)


def test_height_none_decodes_until_eofb():
    img = np.eye(5, dtype=bool)
    out = decode_g4(encode_g4(img), 5, None)
    assert np.array_equal(out, img)


@settings(max_examples=120, deadline=None)
@given(st.binary(max_size=80))
def test_hostile_streams_never_hang_or_crash(data):
    """Arbitrary bytes either decode to some array or raise ValueError —
    never loop forever, never raise anything else (load-failure posture)."""
    try:
        out = decode_g4(data, 24, 8)
        assert out.shape[1] == 24
    except ValueError:
        pass


def test_truncated_stream_raises():
    img = np.eye(16, dtype=bool)
    enc = encode_g4(img)
    with pytest.raises(ValueError):
        decode_g4(enc[: len(enc) // 3], 16, 16)
