"""The distributed extraction pipeline: docs table -> spans table + metrics.

Plan shape (SURVEY.md §7, Catalyst-friendly — scan → narrow UDF → shuffle →
UDF → groupBy/sort_array → sink):

1. ``explode_units``: ``mapInPandas`` splits each doc into self-contained
   work units at PDF-page granularity — the skew/salting step. A 6400-page
   doc becomes 6400 independent units instead of one straggler task
   (reference analog: the page-level task queue,
   src/pybind/docling_threaded_base.h:104-105).
2. ``repartition(n, doc_id, page)``: hash shuffle spreads units uniformly
   across executors regardless of document skew.
3. ``decode_units``: ``mapInPandas`` runs the pure-Python kernels per unit,
   emitting flat span rows keyed ``(doc_id, page, seq)`` — deterministic
   content-stream order, never partition arrival order.
4. ``reassemble``: ``groupBy(doc_id).agg(sort_array(collect_list(struct)))``
   + an index-stamping ``transform`` assigns dense offsets. Spark's partial
   (map-side) aggregation applies to collect_list; the only full shuffle is
   the one reassembly fundamentally requires.

Metrics (pages_parsed / cells_emitted / decode_failures per partition) are
derived relationally from the decoded rows; failures are carried as
``kind='_fail'`` rows so one pass produces both outputs.
"""

from __future__ import annotations

import json
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F

from docling_parse_spark.document import decode_unit, doc_to_units
from docling_parse_spark.pdf.page import DecodeConfig
from docling_parse_spark.schemas import FLAT_SPAN_DDL, WORK_UNIT_DDL

DECODED_DDL = FLAT_SPAN_DDL + ", cells int"


def explode_units(docs_df: DataFrame) -> DataFrame:
    """Split docs into per-page work units (cheap string routing, no decode)."""

    def split_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, spans in zip(pdf["doc_id"], pdf["spans"]):
                span_dicts = [
                    {
                        "kind": s["kind"],
                        "text": s["text"],
                        "media_ref": s["media_ref"],
                        "offset": s["offset"],
                    }
                    for s in spans
                ]
                rows.extend(doc_to_units(doc_id, span_dicts))
            yield pd.DataFrame(
                rows, columns=["doc_id", "page", "unit_kind", "payload", "resources"]
            )

    return docs_df.mapInPandas(split_batches, schema=WORK_UNIT_DDL)


def decode_units(units_df: DataFrame, config: DecodeConfig | None = None) -> DataFrame:
    """Run the decode kernels over work units. Emits flat span rows plus
    ``kind='_fail'`` rows for failed units and a per-page ``cells`` count on
    the first row of each unit (for metrics)."""
    cfg = config or DecodeConfig()
    cfg_dict = cfg.__dict__.copy()

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        config_local = DecodeConfig(**cfg_dict)
        fonts_cache: dict = {}
        for pdf in batches:
            out_rows = []
            for doc_id, page, unit_kind, payload, resources in zip(
                pdf["doc_id"], pdf["page"], pdf["unit_kind"], pdf["payload"], pdf["resources"]
            ):
                ur = decode_unit(
                    unit_kind, payload, int(page), resources, config_local, fonts_cache
                )
                if ur.failed:
                    out_rows.append((doc_id, int(page), -1, "_fail", ur.error, None, 0))
                    continue
                for seq, kind, text, ref in ur.spans:
                    out_rows.append(
                        (doc_id, int(page), seq, kind, text, ref,
                         ur.cells_emitted if seq == 0 else 0)
                    )
                if not ur.spans:  # empty page still counts as parsed
                    out_rows.append((doc_id, int(page), -1, "_empty", None, None, ur.cells_emitted))
            yield pd.DataFrame(
                out_rows,
                columns=["doc_id", "page", "seq", "kind", "text", "media_ref", "cells"],
            )

    return units_df.mapInPandas(decode_batches, schema=DECODED_DDL)


def reassemble(decoded_df: DataFrame) -> DataFrame:
    """Flat (doc_id, page, seq, ...) rows -> north-rule spans table with dense
    per-doc offsets from deterministic content order."""
    # collect_list skips NULLs: marker rows (_fail/_empty) keep the doc in the
    # group (docs in == docs out, empty docs get an empty spans array) without
    # contributing spans.
    spans_struct = F.sort_array(
        F.collect_list(
            F.when(
                ~F.col("kind").isin("_fail", "_empty"),
                F.struct("page", "seq", "kind", "text", "media_ref"),
            )
        )
    )
    grouped = decoded_df.groupBy("doc_id").agg(spans_struct.alias("arr"))
    return grouped.select(
        "doc_id",
        F.transform(
            F.col("arr"),
            lambda x, i: F.struct(
                x["kind"].alias("kind"),
                x["text"].alias("text"),
                x["media_ref"].alias("media_ref"),
                i.cast("int").alias("offset"),
            ),
        ).alias("spans"),
    )


def metrics_table(decoded_df: DataFrame, lineage: str = "") -> DataFrame:
    """Per-partition extraction metrics (FIXTURES.md §3) — the analog of the
    reference's per-page timings/metrics maps (utils/pdf_timings.h:32-99)."""
    with_pid = decoded_df.withColumn("partition_id", F.spark_partition_id())
    return (
        with_pid.groupBy("partition_id")
        .agg(
            F.min("doc_id").alias("doc_id_min"),
            F.max("doc_id").alias("doc_id_max"),
            F.count_distinct("doc_id", "page").alias("pages_parsed"),
            F.sum("cells").cast("long").alias("cells_emitted"),
            F.sum(F.when(F.col("kind") == "_fail", 1).otherwise(0)).cast("long").alias("decode_failures"),
        )
        .withColumn("lineage", F.lit(lineage))
    )


def extract_spans(
    docs_df: DataFrame,
    config: DecodeConfig | None = None,
    num_partitions: int | None = None,
    with_metrics: bool = False,
    lineage: str = "",
):
    """End-to-end: docs table -> (spans table[, metrics table]).

    ``num_partitions`` sizes the salting shuffle; default = session
    ``spark.sql.shuffle.partitions``."""
    spark = docs_df.sparkSession
    n = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    units = explode_units(docs_df).repartition(n, "doc_id", "page")
    decoded = decode_units(units, config)
    if not with_metrics:
        return reassemble(decoded)
    decoded = decoded.persist()
    spans = reassemble(decoded)
    metrics = metrics_table(decoded, lineage)
    return spans, metrics
