"""Sinks: spans table -> parquet / JSON / Iceberg / textlines goldens.

Analogs of the reference's outputs (SURVEY.md §2.D): the nested JSON document
sink (parser.h:249-279), the textlines golden export
(tests/test_parse.py:504-513), and the production table sink. Iceberg is the
north-rule target catalog; this container has no Iceberg runtime jars, so
``write_table`` uses the Iceberg writer when the session has an Iceberg
catalog configured and falls back to plain parquet otherwise — the DataFrame
API is identical either way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

TEXTLINE_SEPARATOR = "\t<|span|>\n"


def write_table(
    spans_df: DataFrame, target: str, mode: str = "overwrite", fmt: str | None = None
) -> str:
    """Write the spans table. ``fmt`` makes the sink explicit: ``"iceberg"``
    (``writeTo`` a table name) or ``"parquet"`` (a path). With ``fmt=None``
    the legacy heuristic applies — Iceberg when the session has an Iceberg
    catalog configured AND the target has no '/' — checking RUNTIME conf
    first (``spark.conf``), since catalogs set after session build are
    invisible to ``sparkContext.getConf()`` (round-4 review). Returns the
    format used."""
    spark = spans_df.sparkSession
    if fmt is None:
        conf_pairs = dict(spark.sparkContext.getConf().getAll())
        # runtime-set catalog entries (spark.conf.set after build) don't
        # appear in the static conf, and PySpark cannot ENUMERATE
        # runtime-only keys — so re-read the static keys through the
        # runtime conf AND probe the well-known catalog keys directly
        # (ADVICE r4: a catalog configured purely via spark.conf.set was
        # otherwise invisible). Callers wanting certainty pass fmt.
        probe_keys = list(conf_pairs) + [
            "spark.sql.catalog.spark_catalog",
            "spark.sql.defaultCatalog",
        ]
        for k in probe_keys:
            try:
                v = spark.conf.get(k, conf_pairs.get(k))
            except Exception:
                continue
            if v is not None:
                conf_pairs[k] = v
        # a runtime defaultCatalog under any NAME: probe its catalog key
        # too, or the has_iceberg scan below never sees it (r5 review)
        default_cat = conf_pairs.get("spark.sql.defaultCatalog")
        if default_cat:
            k = f"spark.sql.catalog.{default_cat}"
            try:
                v = spark.conf.get(k, None)
                if v is not None:
                    conf_pairs[k] = v
            except Exception:
                pass
        has_iceberg = any(
            k.startswith("spark.sql.catalog.") and "iceberg" in str(v).lower()
            for k, v in conf_pairs.items()
        ) or "iceberg" in str(
            spark.conf.get("spark.sql.extensions", "") or ""
        ).lower()
        fmt = "iceberg" if has_iceberg and "/" not in target else "parquet"
    if fmt == "iceberg":
        writer = spans_df.writeTo(target)
        (writer.createOrReplace() if mode == "overwrite" else writer.append())
        return "iceberg"
    if fmt != "parquet":
        raise ValueError(f"write_table: unknown fmt {fmt!r}")
    spans_df.write.mode(mode).parquet(target)
    return "parquet"


def write_spans_json(spans_df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Nested JSON document sink: one JSON object per doc with its span
    array — the shape of the reference's JSON output."""
    spans_df.write.mode(mode).json(path)


def export_textlines(spans_df: DataFrame, kinds: tuple = ("text",)) -> DataFrame:
    """(doc_id, textlines) — the golden-file projection: each span's text
    joined by a sentinel separator, in offset order. Mirrors the reference's
    ``export_to_textlines`` goldens."""
    texts = F.transform(
        F.filter(F.col("spans"), lambda s: s["kind"].isin(*kinds)),
        lambda s: s["text"],
    )
    return spans_df.select(
        "doc_id", F.array_join(texts, TEXTLINE_SEPARATOR).alias("textlines")
    )


def write_document_sink(docs_df: DataFrame, spans_df: DataFrame, path: str,
                        mode: str = "overwrite") -> None:
    """Full document sink: output spans joined with the doc-level metadata
    columns (title/author/..., outline TOC, AcroForm summary — reference
    document.h:140-181). One row per doc; schema =
    (doc_id, spans, title..modified, outline, n_fields, field_names)."""
    from docling_parse_spark.extract import extract_doc_meta

    meta = extract_doc_meta(docs_df)
    spans_df.join(meta, "doc_id", "left").write.mode(mode).parquet(path)


def spans_histogram(spans_df: DataFrame) -> DataFrame:
    """(kind, n_spans, n_docs) — quick corpus census used by bench/reports."""
    return (
        spans_df.select("doc_id", F.explode("spans").alias("s"))
        .groupBy(F.col("s.kind").alias("kind"))
        .agg(F.count("*").alias("n_spans"), F.count_distinct("doc_id").alias("n_docs"))
        .orderBy("kind")
    )
