"""Spark schemas for the engine's tables.

The span shape is fixed by the north rule (BASELINE.json ``input_hint``):
``doc_id:string, spans:array<struct<kind:string,text:string,media_ref:string,offset:int>>``.

The internal cell schema is a subset of the reference's 25-field cell struct
(reference: src/parse/page_items/page_cell.h:43-99) — the fields that drive
text output, geometry, merging and dedup.
"""

from __future__ import annotations

from pyspark.sql import types as T

SPAN_SCHEMA = T.StructType(
    [
        T.StructField("kind", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("media_ref", T.StringType(), True),
        T.StructField("offset", T.IntegerType(), True),
    ]
)

SPANS_TABLE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("spans", T.ArrayType(SPAN_SCHEMA), True),
    ]
)

# Exploded per-span work/result rows used between pipeline stages.
# (doc_id, page, seq) is the deterministic content-stream order key —
# never partition arrival order (reference re-sorts threaded completion-order
# results the same way: docling_parse/pdf_parser.py:1583-1602).
FLAT_SPAN_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("page", T.IntegerType(), False),
        T.StructField("seq", T.IntegerType(), False),
        T.StructField("kind", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("media_ref", T.StringType(), True),
    ]
)

FLAT_SPAN_DDL = "doc_id string, page int, seq int, kind string, text string, media_ref string"

# Work-unit rows fed to the decode UDF: one row per (doc, page) for PDF docs
# (page-granularity salting — mirrors the reference's page-level task queue,
# src/pybind/docling_threaded_base.h:104-105), one row per doc for HTML.
WORK_UNIT_DDL = (
    "doc_id string, page int, unit_kind string, payload string, resources string"
)

METRICS_SCHEMA = T.StructType(
    [
        T.StructField("partition_id", T.IntegerType(), False),
        T.StructField("doc_id_min", T.StringType(), True),
        T.StructField("doc_id_max", T.StringType(), True),
        T.StructField("pages_parsed", T.LongType(), False),
        T.StructField("cells_emitted", T.LongType(), False),
        T.StructField("decode_failures", T.LongType(), False),
        T.StructField("lineage", T.StringType(), True),
    ]
)
