"""Corpus reporting operators: per-group summary statistics and TF-IDF
top terms.

The observability layer of a curation pipeline — before deciding caps /
sampling fractions / quality thresholds you profile the corpus. Both
operators are pure DataFrame compositions with exact DuckDB twins:

* ``corpus_stats`` — count / mean / min / max / exact interpolated
  percentiles per group. Uses ``F.percentile`` (exact, matches DuckDB's
  ``quantile_cont`` interpolation bit-for-bit on this data); at 100 TB
  swap in ``percentile_approx`` — the call site is one word, and the
  groupBy is a single map-side-combined shuffle either way.
* ``tfidf_top_terms`` — classic tf·idf with document frequency over DOCS
  and term frequency per GROUP (source/domain): explode tokens ->
  per-(group, term) counts -> doc-frequency table (small: the vocab)
  broadcast-joined back -> row_number top-k per group. Scores are rounded
  before ranking so the ordering is engine-stable; ties break on term.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from docling_parse_spark.functions.text import tokens


def corpus_stats(
    df: DataFrame,
    by: str = "source",
    value_col: str = "n_chars",
    percentiles: tuple[float, ...] = (0.5, 0.9),
) -> DataFrame:
    """Per-group profile of a numeric column: n, mean, min, max, p<q>."""
    aggs = [
        F.count("*").alias("n"),
        F.round(F.avg(value_col), 6).alias("mean"),
        F.min(value_col).alias("min"),
        F.max(value_col).alias("max"),
    ] + [
        # exact-value alias ('g' format, '.'->'_'): round(q*100) mapped
        # distinct quantiles like 0.995 and 1.0 to the same column name
        # (r4 review); defaults still yield p50/p90
        F.round(F.percentile(value_col, q), 6).alias(
            "p" + format(q * 100, "g").replace(".", "_").replace("-", "m")
        )
        for q in percentiles
    ]
    return df.groupBy(by).agg(*aggs)


def tfidf_top_terms(
    docs: DataFrame,
    by: str = "source",
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-``k`` terms per group by tf·idf: tf = term occurrences within
    the group, idf = ln(N_docs / doc-frequency). The df table is
    vocabulary-sized, so it broadcasts; the only big-data shuffles are the
    two token-key aggregations (map-side combined)."""
    toks = docs.select(
        F.col(id_col).alias("__did"), F.col(by).alias("grp"),
        F.explode(tokens(F.col(text_col))).alias("t"),
    )
    # N as a broadcast 1-row aggregate, not a driver .count() — the whole
    # operator stays one lazy plan with no driver actions
    n_docs = docs.agg(F.count("*").cast("double").alias("__n"))
    tf = toks.groupBy("grp", "t").agg(F.count("*").alias("tf"))
    df_tbl = (
        toks.select("__did", "t").distinct()
        .groupBy("t").agg(F.count("*").alias("df"))
    )
    scored = (
        tf.join(F.broadcast(df_tbl), "t")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "grp", "t",
            F.round(F.col("tf") * F.log(F.col("__n") / F.col("df")), 6).alias("score"),
        )
    )
    w = Window.partitionBy("grp").orderBy(F.col("score").desc(), F.col("t").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(F.col("grp").alias(by), F.col("t").alias("term"), "score", "rank")
    )
