"""Runtime loaders for the compiled font/encoding resource data
(``pdf/data/*.json.gz``, built by tools/build_font_data.py from public Adobe
data — the same resources the reference loads once per process at
src/parse/pdf_resources/page_font.h:212-275,2056+).

Everything is lazily loaded and process-cached, so executors pay the gunzip
cost once per worker (the broadcast-equivalent pattern from SURVEY.md §1.2).
"""

from __future__ import annotations

import functools
import gzip
import json
import os

DATA_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "data")


@functools.lru_cache(maxsize=None)
def _load(*parts: str):
    path = os.path.join(DATA_DIR, *parts)
    if os.path.exists(path):
        with gzip.open(path, "rt", encoding="utf-8") as f:
            return json.load(f)
    # zipimport deployment (spark-submit --py-files dist/*.zip): read the
    # data files through importlib.resources instead of the filesystem
    try:
        from importlib import resources

        ref = resources.files("docling_parse_spark.pdf").joinpath("data", *parts)
        with ref.open("rb") as f:
            return json.loads(gzip.decompress(f.read()).decode("utf-8"))
    except (FileNotFoundError, ModuleNotFoundError, OSError):
        return None


@functools.lru_cache(maxsize=None)
def base_encodings() -> dict[str, dict[int, str]]:
    """{encoding_name: {code: glyph_name}} for the four simple encodings."""
    raw = _load("encodings.json.gz") or {}
    return {enc: {int(c): n for c, n in table.items()} for enc, table in raw.items()}


@functools.lru_cache(maxsize=None)
def glyph_list() -> dict[str, str]:
    """Full Adobe Glyph List (+ additional + ZapfDingbats names)."""
    return _load("glyphlist.json.gz") or {}


@functools.lru_cache(maxsize=None)
def afm_metrics() -> dict:
    """{afm_font_name: {meta: {...}, by_code: {code: w}, by_name: {name: w}}}."""
    raw = _load("afm.json.gz") or {}
    return {
        font: {
            "meta": d.get("meta", {}),
            "by_code": {int(c): w for c, w in d.get("by_code", {}).items()},
            "by_name": d.get("by_name", {}),
        }
        for font, d in raw.items()
    }


@functools.lru_cache(maxsize=None)
def cid_to_unicode(collection: str) -> dict[int, str]:
    """{CID: unicode} for a character collection (e.g. 'Adobe-Japan1')."""
    raw = _load("cid2uni", f"{collection}.json.gz") or {}
    return {int(k): v for k, v in raw.items()}


@functools.lru_cache(maxsize=None)
def cmap_names() -> frozenset[str]:
    return frozenset((_load("cmap_index.json.gz") or {}).keys())


@functools.lru_cache(maxsize=None)
def predefined_cmap(name: str) -> dict | None:
    """Load a predefined CMap with its usecmap chain merged (child wins).

    Returns {codespaces: [(lo bytes, hi bytes)], ranges: [[lo, hi, nbytes,
    cid0], ...] sorted, chars: {(code, nbytes): cid}, collection, wmode} or
    None.
    """
    if name not in cmap_names():
        # unknown names never touch the filesystem: a hostile /Encoding name
        # (e.g. embedded NUL, path separators) must fall through to the
        # simple-encoding path, not raise out of the path layer
        return None
    raw = _load("cmaps", f"{name}.json.gz")
    if raw is None:
        return None
    merged = {"codespaces": [], "ranges": [], "chars": {}, "wmode": raw.get("wmode", 0),
              "collection": raw.get("collection")}
    chain = []
    cur = raw
    seen = {name}
    while cur is not None:
        chain.append(cur)
        parent = cur.get("usecmap")
        if not parent or parent in seen or parent.startswith("Identity"):
            break
        seen.add(parent)
        cur = _load("cmaps", f"{parent}.json.gz")
    for layer in reversed(chain):  # parents first, child overrides
        merged["codespaces"].extend(
            (bytes.fromhex(lo), bytes.fromhex(hi)) for lo, hi in layer.get("codespaces", [])
        )
        merged["ranges"].extend(layer.get("ranges", []))
        # key by (code, nbytes): a 1-byte code and a multi-byte code with the
        # same integer value must not shadow each other in mixed-width CMaps
        # (ADVICE r02) — mirrors how rindex is partitioned by nbytes below
        for code, nb, cid in layer.get("chars", []):
            merged["chars"][(code, nb)] = cid
    # bisect index per code byte-length: {nbytes: (los, his, cid0s)}
    rindex: dict[int, tuple[list[int], list[int], list[int]]] = {}
    for lo, hi, nb, cid0 in sorted(merged["ranges"]):
        los, his, cids = rindex.setdefault(nb, ([], [], []))
        los.append(lo)
        his.append(hi)
        cids.append(cid0)
    merged["rindex"] = rindex
    return merged


def cmap_segment(raw: bytes, codespaces: list[tuple[bytes, bytes]]) -> list[tuple[int, int]]:
    """Split a raw string into (code, nbytes) per the CMap's codespace ranges
    (PDF 9.7.6.2: bytewise range match; unmatched bytes consume the shortest
    range width starting with that byte, else 1)."""
    by_len: dict[int, list[tuple[bytes, bytes]]] = {}
    for lo, hi in codespaces:
        by_len.setdefault(len(lo), []).append((lo, hi))
    lengths = sorted(by_len)
    out: list[tuple[int, int]] = []
    i, n = 0, len(raw)
    while i < n:
        matched = False
        for ln in lengths:
            if i + ln > n:
                continue
            chunk = raw[i : i + ln]
            for lo, hi in by_len[ln]:
                if all(lo[k] <= chunk[k] <= hi[k] for k in range(ln)):
                    out.append((int.from_bytes(chunk, "big"), ln))
                    i += ln
                    matched = True
                    break
            if matched:
                break
        if not matched:
            # partial first-byte match -> consume that range's width, else 1
            width = 1
            for ln in lengths:
                if any(lo[0] <= raw[i] <= hi[0] for lo, hi in by_len[ln]):
                    width = min(ln, n - i)
                    break
            out.append((int.from_bytes(raw[i : i + width], "big"), width))
            i += width
    return out


def cmap_code_to_cid(code: int, nbytes: int, cmap: dict) -> int | None:
    """code -> CID via the merged chars dict + bisected range index."""
    if (code, nbytes) in cmap["chars"]:
        return cmap["chars"][(code, nbytes)]
    import bisect

    entry = cmap["rindex"].get(nbytes)
    if entry is None:
        return None
    los, his, cids = entry
    i = bisect.bisect_right(los, code) - 1
    if i >= 0 and code <= his[i]:
        return cids[i] + (code - los[i])
    return None
