"""Character n-gram language-model perplexity scoring.

The CCNet-style quality signal (Wenzek et al. 2020): score each document
by its perplexity under a small language model trained on a reference
corpus — low-quality/ gibberish text scores high. Real CCNet uses a
KenLM 5-gram word model; the relational re-expression here is a
char-trigram model with add-alpha smoothing, which keeps the WHOLE
operator inside DataFrame algebra:

    LM build:  explode trigrams -> count per trigram -> roll up to
               bigram-context counts (two map-side-combined shuffles over
               a vocabulary-bounded key space)
    scoring:   per-(doc, trigram) counts -> broadcast-join the LM tables
               -> one aggregate per doc

The LM tables are vocabulary-bounded (|charset|^3 worst case, tens of
thousands in practice), so they broadcast; nothing about the corpus size
reaches the driver. p(c3|c1c2) = (cnt(tri)+a) / (cnt(ctx)+a*V) with V =
distinct trigram-final characters in the LM (the smoothing vocabulary),
perplexity = exp(-mean log p). Exact DuckDB twin in ``__spark_entry__``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _trigrams(df: DataFrame, text_col: str, keep: list[str]) -> DataFrame:
    from docling_parse_spark.functions.text import normalize_ws

    # materialize the normalized text as its OWN projection first: building
    # the trigram transform directly on normalize_ws(text) would inline the
    # whole regex chain into the per-element lambda (O(len^2) per doc —
    # the expression-inlining pitfall documented in BENCH.md). With an
    # intermediate attribute referenced more than once, CollapseProject's
    # non-cheap-expression guard keeps the chain evaluated once per row.
    base = df.select(*keep, normalize_ws(F.col(text_col)).alias("__t"))
    t = F.col("__t")
    arr = F.when(
        F.length(t) >= 3,
        F.transform(F.sequence(F.lit(1), F.length(t) - 2), lambda i: t.substr(i, F.lit(3))),
    ).otherwise(F.array().cast("array<string>"))
    return base.select(*keep, F.explode(arr).alias("g"))


def charlm_perplexity(
    docs: DataFrame,
    lm_docs: DataFrame | None = None,
    alpha: float = 1.0,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-doc char-trigram perplexity under an LM built from ``lm_docs``
    (default: the corpus itself — self-perplexity flags outliers). Docs
    with fewer than 3 normalized chars get NULL perplexity. Returns
    (doc_id, n_grams, ppl)."""
    lm = lm_docs if lm_docs is not None else docs
    tri = _trigrams(lm, text_col, []).groupBy("g").agg(F.count("*").alias("cnt_tri"))
    ctx = (
        tri.select(F.substring("g", 1, 2).alias("b"), "cnt_tri")
        .groupBy("b").agg(F.sum("cnt_tri").alias("cnt_ctx"))
    )
    vocab = tri.select(F.substring("g", 3, 1).alias("c")).distinct().agg(
        F.count("*").cast("double").alias("__v")
    )
    doc_grams = (
        _trigrams(docs.select(F.col(id_col).alias("doc_id"), text_col), text_col, ["doc_id"])
        .groupBy("doc_id", "g").agg(F.count("*").alias("m"))
    )
    joined = (
        doc_grams.join(F.broadcast(tri), "g", "left")
        .withColumn("b", F.substring("g", 1, 2))
        .join(F.broadcast(ctx), "b", "left")
        .crossJoin(F.broadcast(vocab))
    )
    logp = F.log(
        (F.coalesce(F.col("cnt_tri"), F.lit(0)) + alpha)
        / (F.coalesce(F.col("cnt_ctx"), F.lit(0)) + alpha * F.col("__v"))
    )
    scored = joined.groupBy("doc_id").agg(
        F.sum("m").alias("n_grams"),
        F.round(F.exp(-F.sum(F.col("m") * logp) / F.sum("m")), 4).alias("ppl"),
    )
    # keep gram-less docs with NULL ppl (the left join would drop them)
    base = docs.select(F.col(id_col).alias("doc_id"))
    return base.join(scored, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_grams", F.lit(0)).alias("n_grams"),
        "ppl",
    )
