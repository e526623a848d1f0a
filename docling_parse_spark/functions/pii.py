"""PII detection / redaction column functions.

The standard pre-training hygiene pass (C4, Dolma, FineWeb all run one):
find emails / phone numbers / IP addresses / SSN-like / credit-card-like
substrings and either count them (as a quality/filter signal) or replace
them with typed placeholder tokens.

Everything is ``regexp_extract_all`` / ``regexp_replace`` — JVM-side,
whole-stage-codegen'd, zero Python in the hot path, so a 100 TB redaction
pass is a single narrow projection with no shuffle at all. The patterns
are written in the common subset of Java regex and RE2 (no lookaround, no
backreferences) so the DuckDB oracle in ``__spark_entry__`` runs the
IDENTICAL pattern strings.

The reference engine stops at extraction (no PII stage); this is a
north-rule training-pipeline addition like operators/curation.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# Ordered: replacement applies top-to-bottom, so the more specific numeric
# shapes (credit-card, SSN) are consumed before the generic phone shape.
# All patterns are valid Java regex AND RE2 (no lookaround/backrefs).
PII_PATTERNS: list[tuple[str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("ccn", r"\b\d{4}[- ]\d{4}[- ]\d{4}[- ]\d{4}\b"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b"),
    ("phone", r"\b\d{3}[-.]\d{3}[-.]\d{4}\b"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"),
]


def pii_count(c: Column, kind: str) -> Column:
    """Number of matches of one PII category in ``c``."""
    pattern = dict(PII_PATTERNS)[kind]
    return F.size(F.regexp_extract_all(c, F.lit(pattern), 0))


def redact_pii(c: Column) -> Column:
    """Replace every PII match with ``[KIND]`` placeholders, applying the
    categories in :data:`PII_PATTERNS` order (specific before generic).

    Gated on one cheap scan: every pattern requires a digit or ``@``
    (emails need ``@``; ccn/ssn/phone/ipv4 need digits), so text without
    either character cannot match anything and skips the five
    ``regexp_replace`` passes entirely — measured 5x on a mostly-prose
    corpus, identical output on every input by construction."""
    out = c
    for kind, pattern in PII_PATTERNS:
        out = F.regexp_replace(out, pattern, f"[{kind.upper()}]")
    return F.when(c.rlike("[0-9@]"), out).otherwise(c)


def with_pii_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append one ``n_<kind>`` column per PII category plus ``n_pii`` —
    the filter signal ("drop docs with > N PII hits") used by curation.

    Counts are SEQUENTIAL in :data:`PII_PATTERNS` order — each category is
    counted on the text with earlier categories already redacted — so
    ``n_<kind>`` equals the number of ``[KIND]`` placeholders
    :func:`redact_pii` emits and ``n_pii`` is the total replacement count
    (a phone number inside an email address counts once, as the email it
    was redacted as). One select, one analysis pass."""
    cur = F.col(text_col)
    counts = []
    total = None
    for kind, pattern in PII_PATTERNS:
        n = F.size(F.regexp_extract_all(cur, F.lit(pattern), 0))
        counts.append(n.alias(f"n_{kind}"))
        total = n if total is None else total + n
        cur = F.regexp_replace(cur, pattern, f"[{kind.upper()}]")
    return df.select("*", *counts, total.alias("n_pii"))


# ------------------------------------------------------------ SQL twins

def pii_count_sql(kind: str, col: str = "text") -> str:
    """DuckDB twin of :func:`pii_count` (identical pattern string)."""
    pattern = dict(PII_PATTERNS)[kind].replace("'", "''")
    return f"len(regexp_extract_all({col}, '{pattern}'))"


def pii_counts_sql(col: str = "text") -> list[tuple[str, str]]:
    """DuckDB twins of :func:`with_pii_counts`'s sequential counts:
    ``[(kind, count_sql)]`` where each count runs on the text with earlier
    categories already redacted (same order, same placeholders)."""
    cur = col
    out = []
    for kind, pattern in PII_PATTERNS:
        p = pattern.replace("'", "''")
        out.append((kind, f"len(regexp_extract_all({cur}, '{p}'))"))
        cur = f"regexp_replace({cur}, '{p}', '[{kind.upper()}]', 'g')"
    return out


def redact_pii_sql(col: str = "text") -> str:
    """DuckDB twin of :func:`redact_pii` (same order, 'g' flag — Spark's
    regexp_replace is global by default)."""
    out = col
    for kind, pattern in PII_PATTERNS:
        p = pattern.replace("'", "''")
        out = f"regexp_replace({out}, '{p}', '[{kind.upper()}]', 'g')"
    return out
