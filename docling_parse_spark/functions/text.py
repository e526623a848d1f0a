"""Text-analysis column functions: tokenization, quality, language-ID,
fingerprinting.

Everything here is built from ``pyspark.sql.functions`` (JVM-side,
whole-stage-codegen'd, no Python in the hot path) so filters/projections
using these columns stay pushdown- and codegen-friendly at 100 TB. Each has
an exact ANSI-SQL twin used as the DuckDB oracle in ``__spark_entry__``.

The winnowing fingerprint (Schleimer et al., SIGMOD 2003) is the one
Arrow-batched pandas UDF — rolling hashes are inherently sequential per doc.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, functions as F
from pyspark.sql.types import ArrayType, LongType

# Tiny public stopword lists (most-frequent function words per language).
STOPWORDS = {
    "en": ["the", "a", "and", "of", "to", "in", "is", "it", "that", "for"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "für", "von"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "pour", "dans", "que"],
    "es": ["el", "la", "los", "y", "es", "un", "una", "para", "en", "que"],
    "zh": ["的", "是", "在", "了", "和", "有", "我", "不", "这", "他"],
}
LANG_PRIORITY = ["en", "de", "fr", "es", "zh"]  # deterministic tie-break

_PUNCT_CLASS = "[.,;:!?'\"()\\[\\]-]"
_BPE_TOKEN_RE = r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]"


def tokens(c: Column) -> Column:
    """Lowercased whitespace tokens; empty text -> empty array."""
    return F.when(F.length(F.trim(c)) == 0, F.array().cast("array<string>")).otherwise(
        F.split(F.lower(F.trim(c)), r"\s+")
    )


def token_count(c: Column) -> Column:
    """Whitespace token count — same count as ``size(tokens(c))``, computed
    as separator-run count + 1 on the trimmed text: no ``lower()`` pass
    (case cannot change where whitespace splits) and no token-array
    materialization just to take its size. Trimming guarantees no leading/
    trailing separator run, so runs + 1 == split segments exactly."""
    t = F.trim(c)
    return F.when(F.length(t) == 0, F.lit(0)).otherwise(
        F.regexp_count(t, F.lit(r"\s+")) + 1
    )


def bpe_token_count(c: Column) -> Column:
    """BPE-ish pre-tokenizer count: letter runs | single digits | punctuation."""
    return F.size(F.regexp_extract_all(c, F.lit(_BPE_TOKEN_RE), 0))


def stopword_hits(c: Column, lang: str) -> Column:
    words = STOPWORDS[lang]
    return F.size(F.filter(tokens(c), lambda t: t.isin(*words)))


def langid(c: Column) -> Column:
    """N-gram-free heuristic language ID: argmax of stopword hit counts with a
    fixed priority tie-break. Matches the SQL oracle CASE chain exactly."""
    hits = {lang: stopword_hits(c, lang) for lang in LANG_PRIORITY}
    expr = F.lit("und")
    # build the CASE from lowest priority upward so 'en' wins ties
    total = None
    for lang in LANG_PRIORITY:
        total = hits[lang] if total is None else total + hits[lang]
    for lang in reversed(LANG_PRIORITY):
        cond = None
        for other in LANG_PRIORITY:
            if other == lang:
                continue
            better = hits[lang] >= hits[other] if LANG_PRIORITY.index(lang) < LANG_PRIORITY.index(other) else hits[lang] > hits[other]
            cond = better if cond is None else cond & better
        expr = F.when((total > 0) & cond, F.lit(lang)).otherwise(expr)
    return expr


def langid_sql(col: str = "text") -> str:
    """The DuckDB/ANSI twin of :func:`langid` (same semantics, same ties)."""

    def hits(lang):
        ws = ", ".join(f"'{w}'" for w in STOPWORDS[lang])
        return (
            f"len(list_filter(regexp_split_to_array(lower(trim({col})), '\\s+'),"
            f" t -> t IN ({ws})))"
        )

    h = {lang: hits(lang) for lang in LANG_PRIORITY}
    total = " + ".join(h.values())
    whens = []
    for lang in LANG_PRIORITY:
        conds = []
        for other in LANG_PRIORITY:
            if other == lang:
                continue
            op = ">=" if LANG_PRIORITY.index(lang) < LANG_PRIORITY.index(other) else ">"
            conds.append(f"{h[lang]} {op} {h[other]}")
        whens.append(f"WHEN ({total}) > 0 AND {' AND '.join(conds)} THEN '{lang}'")
    return "CASE " + " ".join(whens) + " ELSE 'und' END"


def punct_ratio(c: Column) -> Column:
    # _PUNCT_CLASS is a literal character set, so translate() (a char-table
    # pass, no regex engine) removes exactly the same characters as the old
    # regexp_replace(_PUNCT_CLASS, "") — identical ratio, ~10x cheaper on
    # the per-row curation path
    n = F.length(c)
    stripped = F.length(F.translate(c, ".,;:!?'\"()[]-", ""))
    return F.when(n == 0, F.lit(0.0)).otherwise((n - stripped) / n)


def quality_score(c: Column) -> Column:
    """Composite quality: word count in a sane band, low punctuation noise,
    reasonable mean word length — the usual pretraining heuristics."""
    n_tok = token_count(c)
    # Java \s is exactly [ \t\n\x0B\f\r]: translate() with that literal
    # set removes the same characters as regexp_replace(r"\s+", "") —
    # identical length, no regex engine on the hot path
    mean_len = F.when(n_tok == 0, F.lit(0.0)).otherwise(
        F.length(F.translate(c, " \t\n\x0b\x0c\r", "")) / n_tok
    )
    return (
        F.when((n_tok >= 10) & (n_tok <= 100000), F.lit(0.4)).otherwise(F.lit(0.0))
        + F.when(punct_ratio(c) <= 0.2, F.lit(0.3)).otherwise(F.lit(0.0))
        + F.when((mean_len >= 2.0) & (mean_len <= 12.0), F.lit(0.3)).otherwise(F.lit(0.0))
    )


def dup_line_fraction(c: Column) -> Column:
    """Fraction of non-empty (trimmed) lines that are duplicates of an
    earlier line — the Gopher-style repetition signal (Rae et al. 2021,
    'repetitious lines'): 1 - distinct/total; 0 for line-less text. Pure
    JVM array expressions."""
    lines = F.filter(
        F.transform(F.split(c, "\n"), lambda l: F.trim(l)), lambda l: l != ""
    )
    n = F.size(lines)
    return F.when(n <= 0, F.lit(0.0)).otherwise(
        1.0 - F.size(F.array_distinct(lines)) / n
    )


def repetition_stats(docs, id_col: str = "doc_id", text_col: str = "text"):
    """Per-doc repetition signals: ``dup_line_frac`` (JVM expression) and
    ``top_word_frac`` (share of tokens taken by the most frequent token —
    computed relationally: explode -> per-(doc, token) counts -> max/sum,
    map-side combined; a per-row HOF would be O(tokens²) interpreted).
    Docs with no tokens get top_word_frac = 0."""
    c = F.col(text_col)
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        F.round(dup_line_fraction(c), 6).alias("dup_line_frac"),
    )
    toks = docs.select(
        F.col(id_col).alias("doc_id"), F.explode(tokens(c)).alias("t")
    )
    counts = toks.groupBy("doc_id", "t").agg(F.count("*").alias("n"))
    agg = counts.groupBy("doc_id").agg(
        F.round(F.max("n") / F.sum("n"), 6).alias("top_word_frac")
    )
    return base.join(agg, "doc_id", "left").select(
        "doc_id", "dup_line_frac",
        F.coalesce("top_word_frac", F.lit(0.0)).alias("top_word_frac"),
    )


# the 27 cp1252-only symbol positions (0x80-0x9F minus the 5 undefined)
_CP1252_BYTES = [b for b in range(0x80, 0xA0) if b not in (0x81, 0x8D, 0x8F, 0x90, 0x9D)]
_CP1252_EXTRA = "".join(bytes([b]).decode("cp1252") for b in _CP1252_BYTES)
_CP1252_AS_LATIN1 = "".join(chr(b) for b in _CP1252_BYTES)


def fix_mojibake(c: Column) -> Column:
    """Repair UTF-8-read-as-cp1252/latin-1 mojibake ("cafÃ©" -> "café",
    "donâ€™t" -> "don’t"), ftfy's core heuristic as pure JVM expressions:
    when the text contains mojibake markers (Ã/Â/â), consists only of
    characters windows-1252 can encode (latin-1 printables + the 27
    cp1252-specific symbols — the €/™/’ class the latin-1-only guard
    would miss), AND its cp1252 byte image is valid UTF-8, re-decode it;
    otherwise pass through unchanged. ``try_validate_utf8`` supplies the
    NULL-on-invalid step, so the strict ANSI ``decode`` never raises; the
    charset guard keeps the strict ``encode`` from ever seeing an
    unmappable char. Spark's ``encode`` supports no cp1252 charset, so the
    27 cp1252-only symbols are first ``translate``d to their
    byte-equivalent U+0080-U+009F codepoints (the inverse cp1252 decode),
    after which the latin-1 encode reproduces the original byte image
    exactly. Known limits, like ftfy's own trade-offs: marker-less CJK
    mojibake (all lead bytes land on ä-ï) is left alone to avoid mangling
    legitimate western text, and a rare legitimate text that IS a valid
    double-encoding gets repaired anyway."""
    allowed = "^[\\x00-\\x7f\\xa0-\\xff" + _CP1252_EXTRA + "]*$"
    cond = c.rlike("[ÃÂâ]") & c.rlike(allowed)
    as_bytes = F.encode(F.translate(c, _CP1252_EXTRA, _CP1252_AS_LATIN1), "ISO-8859-1")
    repaired = F.when(cond, F.try_validate_utf8(as_bytes))
    return F.coalesce(repaired, c)


def normalize_ws(c: Column) -> Column:
    """Lowercase, trim, collapse whitespace — the ONE normalization shared
    by fingerprint_md5 and the LM trigrams (functions/lm.py); its SQL twin
    is :func:`fingerprint_md5_sql`'s inner expression."""
    return F.regexp_replace(F.lower(F.trim(c)), r"\s+", " ")


def fingerprint_md5(c: Column) -> Column:
    """Exact-dup fingerprint: md5 of whitespace-normalized lowercase text."""
    return F.md5(normalize_ws(c))


def fingerprint_md5_sql(col: str = "text") -> str:
    """DuckDB twin of :func:`fingerprint_md5`."""
    return f"md5(regexp_replace(lower(trim({col})), '\\s+', ' ', 'g'))"


FINGERPRINT_MD5_SQL = fingerprint_md5_sql()


def token_count_sql(col: str = "text") -> str:
    """DuckDB twin of :func:`token_count`."""
    return (
        f"CASE WHEN length(trim({col})) = 0 THEN 0 "
        f"ELSE len(regexp_split_to_array(lower(trim({col})), '\\s+')) END"
    )


def punct_ratio_sql(col: str = "text") -> str:
    """DuckDB twin of :func:`punct_ratio`."""
    return (
        f"CASE WHEN length({col}) = 0 THEN 0.0 "
        f"ELSE (length({col}) - length(regexp_replace({col}, '[.,;:!?''\"()\\[\\]-]', '', 'g')))"
        f" / CAST(length({col}) AS DOUBLE) END"
    )


def quality_score_sql(col: str = "text") -> str:
    """DuckDB twin of :func:`quality_score` (same bands, same weights)."""
    tc = token_count_sql(col)
    pr = punct_ratio_sql(col)
    mean_len = (
        f"CASE WHEN ({tc}) = 0 THEN 0.0 "
        f"ELSE length(regexp_replace({col}, '\\s+', '', 'g')) / CAST(({tc}) AS DOUBLE) END"
    )
    return (
        f"(CASE WHEN ({tc}) BETWEEN 10 AND 100000 THEN 0.4 ELSE 0.0 END)"
        f" + (CASE WHEN ({pr}) <= 0.2 THEN 0.3 ELSE 0.0 END)"
        f" + (CASE WHEN ({mean_len}) BETWEEN 2.0 AND 12.0 THEN 0.3 ELSE 0.0 END)"
    )


# ------------------------------------------------------- winnowing (UDF)

_WINNOW_WINDOW = 4
_SHINGLE_K = 5
_MOD = (1 << 61) - 1
_BASE = 1_000_003


def winnow(text: str) -> list[int]:
    """Pure winnowing kernel (shared by the pandas UDF and the sequential
    fixture oracle): k-gram rolling hashes, min per sliding window
    (rightmost min), consecutive-dedup then global-dedup."""
    if not text:
        return []
    toks = text.lower().split()
    if len(toks) < _SHINGLE_K:
        toks = toks + [""] * (_SHINGLE_K - len(toks))
    hashes = []
    for i in range(len(toks) - _SHINGLE_K + 1):
        h = 0
        for t in toks[i : i + _SHINGLE_K]:
            for ch in t:
                h = (h * _BASE + ord(ch)) % _MOD
            h = (h * _BASE + 0x1F) % _MOD
        hashes.append(h)
    picked = []
    for i in range(max(1, len(hashes) - _WINNOW_WINDOW + 1)):
        window = hashes[i : i + _WINNOW_WINDOW]
        m = min(window)
        idx = i + max(j for j, v in enumerate(window) if v == m)
        if not picked or picked[-1][0] != idx:
            picked.append((idx, m))
    # order-preserving dedup via a set: the list-membership scan was
    # quadratic in fingerprint count (~1.3e8 comparisons for a 65k-token
    # doc inside the UDF hot path); output identical
    seen: set[int] = set()
    out = []
    for _, v in picked:
        if v not in seen:
            seen.add(v)
            out.append(v)
    return out


@F.pandas_udf(ArrayType(LongType()))
def winnowing_fingerprint(texts: pd.Series) -> pd.Series:
    """Winnowing document fingerprint over Arrow batches; the per-doc loop is
    unavoidable (sequential rolling state) — see :func:`winnow`."""
    return texts.map(winnow)
