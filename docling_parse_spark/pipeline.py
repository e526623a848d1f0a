"""The composed training-data pipeline: the end-to-end flow the engine is
built for, as one function:

    interleaved docs table
      -> span extraction (PDF interpret + HTML boilerplate strip)
      -> text assembly per doc
      -> quality filtering (token count / punctuation / langid)
      -> near-dup removal (MinHash-LSH clusters, min-id survivor)
      -> training-ready (doc_id, text, lang, n_tokens, quality) table

Every stage is relational or Arrow-batched; no driver-side loops; each stage
is the operator documented in its own module.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from docling_parse_spark.extract import extract_spans
from docling_parse_spark.functions.text import langid, quality_score, token_count
from docling_parse_spark.operators.dedup import dedup_survivors, minhash_lsh_pairs
from docling_parse_spark.pdf.page import DecodeConfig


def assemble_text(spans_df: DataFrame) -> DataFrame:
    """spans table -> (doc_id, text): text spans joined in offset order."""
    texts = F.transform(
        F.filter(F.col("spans"), lambda s: s["kind"] == "text"),
        lambda s: s["text"],
    )
    return spans_df.select("doc_id", F.array_join(texts, " ").alias("text"))


def training_data_pipeline(
    docs_df: DataFrame,
    config: DecodeConfig | None = None,
    num_partitions: int | None = None,
    min_tokens: int = 5,
    min_quality: float = 0.6,
    near_dup_threshold: float = 0.5,
) -> DataFrame:
    """Docs in north-rule shape -> deduplicated quality-filtered text table."""
    spans = extract_spans(docs_df, config=config, num_partitions=num_partitions)
    texts = assemble_text(spans)
    scored = texts.select(
        "doc_id",
        "text",
        token_count(F.col("text")).alias("n_tokens"),
        F.round(quality_score(F.col("text")), 4).alias("quality"),
        langid(F.col("text")).alias("lang"),
    )
    kept = scored.filter(
        (F.col("n_tokens") >= min_tokens) & (F.col("quality") >= min_quality)
    )
    # NOTE deliberately NOT persist()ed: kept feeds both pair generation and
    # the survivor anti-join, but caching it blocks AQE partition coalescing
    # below the cache boundary (canChangeCachedPlanOutputPartitioning=false)
    # — measured 7.2 s -> 17.6 s WORSE on the e2e gate. The pair side is
    # truncated by dedup_clusters' edge checkpoint instead.
    pairs = minhash_lsh_pairs(kept, k=9, threshold=near_dup_threshold)
    return dedup_survivors(kept, pairs)
