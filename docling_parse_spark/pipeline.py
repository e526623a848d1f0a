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
    # inline() generator barrier: see redact_score_filter — keeps the
    # downstream filter from re-evaluating the scoring chain below the
    # projection (pushdown cannot cross a Generate's produced attributes).
    # langid deliberately stays OUT of the generator and lands after the
    # filter: generator fields are not column-pruned per consumer, and the
    # minhash pair branch (which only needs doc_id/text) would otherwise
    # pay the 5-language stopword scan for every doc
    scored = texts.select(
        "doc_id",
        "text",
        F.inline(
            F.array(
                F.struct(
                    token_count(F.col("text")).alias("n_tokens"),
                    F.round(quality_score(F.col("text")), 4).alias("quality"),
                )
            )
        ),
    )
    kept = scored.filter(
        (F.col("n_tokens") >= min_tokens) & (F.col("quality") >= min_quality)
    ).withColumn("lang", langid(F.col("text")))
    # NOTE deliberately NOT persist()ed: kept feeds both pair generation and
    # the survivor anti-join, but caching it blocks AQE partition coalescing
    # below the cache boundary (canChangeCachedPlanOutputPartitioning=false)
    # — measured 7.2 s -> 17.6 s WORSE on the e2e gate. The pair side is
    # truncated by dedup_clusters' edge checkpoint instead.
    pairs = minhash_lsh_pairs(kept, k=9, threshold=near_dup_threshold)
    return dedup_survivors(kept, pairs)


def redact_score_filter(
    docs: DataFrame, min_tokens: int = 5, min_quality: float = 0.6, text_col: str = "text"
) -> DataFrame:
    """The stateless curation prefix shared by batch
    (:func:`curation_pipeline`) and streaming
    (``streaming.pipeline.curate_stream``): score + filter on the ORIGINAL
    text, then PII-redact ``text_col`` once for the survivors. Narrow ops
    only, so it is valid on a streaming frame — and keeping it shared
    means the two paths cannot drift.

    Ordering matters for the PLAN, not just taste: scoring/filtering a
    redacted column makes Catalyst inline the 5-regex redaction chain
    into every expression that references it (measured: 109
    regexp_replace nodes in the plan and ~7x the wall time at sf0.1);
    the filter decision therefore uses the RAW text's score/length, and
    redaction applies once to the survivors. The EMITTED ``n_tokens`` is
    then recomputed over the redacted text in a separate projection (the
    intermediate attribute keeps CollapseProject from re-inlining the
    chain), so downstream consumers — shard packing above all — budget
    the tokens of the text that actually ships (a space-separated card
    number is 4 raw tokens but one ``[CCN]`` placeholder). ``quality``
    stays the raw-text score: it describes the document, not the
    transform."""
    from docling_parse_spark.functions.pii import redact_pii

    # the scored columns are built through an inline() generator rather
    # than withColumn: predicate pushdown rewrites a filter on projected
    # aliases to re-evaluate their defining expressions below the project,
    # which ran the whole token/quality regex chain TWICE per row (measured
    # 2x wall on the sf1.0 curation gate); filters on generator-produced
    # attributes cannot be pushed through the Generate, so the chain runs
    # once and the filter reads the attribute
    scored = docs.drop("n_tokens", "quality").select(
        "*",
        F.inline(
            F.array(
                F.struct(
                    token_count(F.col(text_col)).cast("long").alias("n_tokens"),
                    F.round(quality_score(F.col(text_col)), 4).alias("quality"),
                )
            )
        ),
    )
    kept = scored.filter(
        (F.col("n_tokens") >= min_tokens) & (F.col("quality") >= min_quality)
    )
    red = kept.withColumn(text_col, redact_pii(F.col(text_col)))
    return red.withColumn("n_tokens", token_count(F.col(text_col)).cast("long"))


def curation_pipeline(
    docs: DataFrame,
    min_tokens: int = 5,
    min_quality: float = 0.6,
    max_per_source: int = 15,
    budget: int = 4096,
    id_col: str = "doc_id",
    source_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """The post-extraction corpus-curation flow as one lazy plan:

        documents (doc_id, source, text)
          -> PII redaction (typed placeholders, pure JVM regex)
          -> quality + length filter
          -> exact-dedup survivors (min doc_id per normalized fingerprint)
          -> per-source heavy-hitter cap (WindowGroupLimit)
          -> token-budget shard packing
          -> (doc_id, source, n_tokens, shard_id)

    Every stage is the operator documented in its own module; the whole
    composition is windows + filters + one narrow projection plus the
    packing stage's broadcast offset join — no driver actions. Shard
    packing uses the distributed two-pass prefix sum (global semantics,
    per-partition window state), so this default composition is the 100 TB
    shape; ``pack_training_shards(by=<bucket>)`` remains available for
    pre-bucketed corpora."""
    from docling_parse_spark.functions.text import fingerprint_md5
    from docling_parse_spark.operators.curation import cap_per_group, pack_training_shards
    from pyspark.sql import Window

    base = docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(source_col).alias("source"),
        F.col(text_col).alias("text"),
    )
    kept = redact_score_filter(base, min_tokens, min_quality)
    w = Window.partitionBy(fingerprint_md5(F.col("text"))).orderBy("doc_id")
    survivors = (
        kept.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "text", "quality")
    )
    # NOTE: no lineage cut before the packing range-partition — its
    # sampling job reuses the capped window's materialized exchange
    # (AQE shuffle-stage reuse), so the scoring prefix is NOT re-executed;
    # an explicit localCheckpoint was A/B-measured a wash at sf1.0 and
    # only pins executor memory.
    capped = cap_per_group(survivors, "source", max_per_source)
    return pack_training_shards(capped, budget=budget).select(
        "doc_id", "source", "n_tokens", "shard_id"
    )
