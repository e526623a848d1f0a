"""Composed training-data pipeline + dedup-cluster connected components."""

import pytest
from pyspark.sql import functions as F


def test_dedup_clusters_and_survivors(spark):
    from docling_parse_spark.operators.dedup import dedup_clusters, dedup_survivors

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (7, 8), (10, 11), (11, 12), (12, 13)],
        "id_a int, id_b int",
    )
    clusters = {r["doc_id"]: r["cluster_id"] for r in dedup_clusters(pairs).collect()}
    assert clusters[1] == clusters[2] == clusters[3] == 1
    assert clusters[7] == clusters[8] == 7
    assert clusters[10] == clusters[11] == clusters[12] == clusters[13] == 10

    docs = spark.createDataFrame([(i, f"t{i}") for i in range(1, 15)], "doc_id int, text string")
    kept = sorted(r["doc_id"] for r in dedup_survivors(docs, pairs).collect())
    assert kept == [1, 4, 5, 6, 7, 9, 10, 14]


def test_training_data_pipeline(spark):
    from docling_parse_spark.corpus import corpus_to_spark_rows, generate_corpus
    from docling_parse_spark.pipeline import assemble_text, training_data_pipeline
    from docling_parse_spark.schemas import SPANS_TABLE_SCHEMA

    corpus = generate_corpus(40, seed=21)
    # plant an exact near-dup pair: two docs with identical single html span
    html = "<p>" + "meaningful training words appear here repeatedly " * 8 + "</p>"
    for i, fake_id in enumerate(["doc-dup-a", "doc-dup-b"]):
        corpus.append({"doc_id": fake_id, "spans": [
            {"kind": "html", "text": html, "media_ref": None, "offset": 0}]})
    docs = spark.createDataFrame(corpus_to_spark_rows(corpus), schema=SPANS_TABLE_SCHEMA)

    out = training_data_pipeline(docs, num_partitions=4, min_tokens=5, min_quality=0.6)
    rows = {r["doc_id"]: r for r in out.collect()}
    # dup pair collapsed to the min doc_id
    assert "doc-dup-a" in rows and "doc-dup-b" not in rows
    # every surviving row satisfies the filters
    assert all(r["n_tokens"] >= 5 and r["quality"] >= 0.6 for r in rows.values())
    assert len(rows) > 10
    assert set(out.columns) == {"doc_id", "text", "n_tokens", "quality", "lang"}


def test_assemble_text_order(spark):
    from docling_parse_spark.pipeline import assemble_text

    spans = spark.createDataFrame(
        [("d1", [{"kind": "text", "text": "a", "media_ref": None, "offset": 0},
                 {"kind": "media", "text": None, "media_ref": "m", "offset": 1},
                 {"kind": "text", "text": "b", "media_ref": None, "offset": 2}])],
        "doc_id string, spans array<struct<kind:string,text:string,media_ref:string,offset:int>>",
    )
    assert assemble_text(spans).collect()[0]["text"] == "a b"


def test_curation_pipeline(spark):
    """Hand-checked composed curation: redact -> filter -> dedup survivors
    -> per-source cap -> shard packing."""
    from docling_parse_spark.pipeline import curation_pipeline

    good = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    docs = spark.createDataFrame(
        [(1, "a", good),
         (2, "a", good),                        # exact dup of 1 -> dropped
         (3, "a", good + " lambda mu"),         # kept
         (4, "a", "too short"),                 # < 5 tokens -> dropped
         (5, "a", good + " nu xi"),             # survivor, but cap=2 drops it
         (6, "b", "mail bob@x.io " + good)],    # redacted, then kept
        "doc_id long, source string, text string",
    )
    out = {r["doc_id"]: (r["source"], r["n_tokens"], r["shard_id"])
           for r in curation_pipeline(docs, max_per_source=2, budget=12).collect()}
    # packing in doc_id order: 10, 12, 12 tokens -> cumsum-before 0/10/22
    assert out == {1: ("a", 10, 0), 3: ("a", 12, 0), 6: ("b", 12, 1)}
