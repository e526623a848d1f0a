"""spark-submit entry point: corpus/docs-table in, spans+metrics out.

Run (ships with ``--py-files`` like the reference's batch CLI, parser.h:109-207):

    spark-submit --py-files dist/docling_parse_spark.zip scripts/run_extract.py ...
    # or locally:
    python -m docling_parse_spark.job --n-docs 2000 --master 'local[8]' \
        --out /tmp/extract_out [--resume] [--buckets 8]

Input: ``--input <parquet dir>`` of a north-rule docs table, or ``--n-docs N``
to generate the deterministic synthetic corpus distributedly (seed-fixed).
Prints one JSON summary line: docs/sec, spans, failures, scaling inputs.
"""

from __future__ import annotations

import argparse
import json
import shutil
import sys
import time

from pyspark.sql import functions as F


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input", help="parquet dir of (doc_id, spans) docs table")
    p.add_argument("--input-pdf-dir", help="directory of raw .pdf FILES: "
                   "ingested through the from-spec file layer (xref/ObjStm/"
                   "filters/decryption) before extraction")
    p.add_argument("--password", default=None, help="decryption password for "
                   "--input-pdf-dir files (tried as user then owner; default "
                   "empty)")
    p.add_argument("--n-docs", type=int, default=0, help="generate synthetic corpus of N docs")
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--master", default=None, help="e.g. local[8]; default local[$SPARK_GRAFT_CPUS]")
    p.add_argument("--out", required=True)
    p.add_argument("--buckets", type=int, default=8)
    p.add_argument("--partitions", type=int, default=None)
    p.add_argument("--resume", action="store_true", help="keep existing commit log (skip committed buckets)")
    p.add_argument("--output-unit", default="word", choices=["char", "word", "line"])
    p.add_argument("--run-id", default="job")
    args = p.parse_args(argv)

    from docling_parse_spark.checkpoint import run_with_checkpoint
    from docling_parse_spark.corpus import corpus_df
    from docling_parse_spark.pdf.page import DecodeConfig
    from docling_parse_spark.session import get_spark

    if not args.resume:
        shutil.rmtree(args.out, ignore_errors=True)

    spark = get_spark(app_name=f"docling_parse_spark.job.{args.run_id}", master=args.master)
    t0 = time.time()
    n_ingest_failures = 0
    input_signature = None
    if args.input:
        docs = spark.read.parquet(args.input)
    elif args.input_pdf_dir:
        import os

        from docling_parse_spark.pdf.file import ingest_pdf_files

        # The checkpoint input signature must come from the STABLE source
        # .pdf list, not the staged parquet below (whose part-file names
        # change on every rewrite, which would make --resume trip the
        # signature-mismatch guard in run_with_checkpoint).
        src_files = sorted(
            os.path.join(r, f)
            for r, _dirs, fs in os.walk(args.input_pdf_dir)
            for f in fs if f.endswith(".pdf")
        )
        import hashlib

        sig_body = "\n".join(
            f"{p}\t{os.path.getsize(p)}" for p in src_files)
        input_signature = (
            f"pdfdir:{len(src_files)}:"
            f"{hashlib.md5(sig_body.encode()).hexdigest()}")

        # Stage the ingest output once: the checkpointed job reads docs per
        # bucket, and staging means each raw PDF is parsed exactly once
        # instead of once per bucket. It also keeps the per-file failure
        # accounting ON the job record instead of silently dropping it.
        # On --resume an already-staged ingest is reused so the commit log
        # (and half-finished buckets) stay valid.
        if not (args.resume and os.path.exists(f"{args.out}/ingest/_SUCCESS")):
            ingest_pdf_files(
                spark, args.input_pdf_dir, num_partitions=args.partitions,
                glob="*.pdf", recursive=True, password=args.password,
            ).write.mode("overwrite").parquet(f"{args.out}/ingest")
        staged = spark.read.parquet(f"{args.out}/ingest")
        errors = staged.filter(F.col("error").isNotNull()).select("doc_id", "error")
        errors.write.mode("overwrite").parquet(f"{args.out}/ingest_errors")
        n_ingest_failures = spark.read.parquet(f"{args.out}/ingest_errors").count()
        if n_ingest_failures:
            for row in errors.limit(20).collect():
                print(f"ingest failure: {row['doc_id']}: {row['error']}", file=sys.stderr)
        docs = staged.filter(F.col("error").isNull()).drop("error")
    elif args.n_docs:
        docs = corpus_df(spark, args.n_docs, seed=args.seed)
    else:
        # raises SystemExit
        p.error("one of --input / --input-pdf-dir / --n-docs is required")

    summary = run_with_checkpoint(
        docs,
        args.out,
        buckets=args.buckets,
        config=DecodeConfig(output_unit=args.output_unit),
        run_id=args.run_id,
        num_partitions=args.partitions,
        input_signature=input_signature,
    )
    wall = time.time() - t0

    out_spans = spark.read.parquet(f"{args.out}/spans")
    out_metrics = spark.read.parquet(f"{args.out}/metrics")
    n_docs = out_spans.count()
    agg = out_metrics.agg(
        F.sum("pages_parsed").alias("pages"),
        F.sum("cells_emitted").alias("cells"),
        F.sum("decode_failures").alias("failures"),
    ).collect()[0]
    n_spans = out_spans.select(F.sum(F.size("spans"))).collect()[0][0]

    print(
        json.dumps(
            {
                "job": "span_extraction",
                "master": spark.sparkContext.master,
                "docs": n_docs,
                "pages": int(agg["pages"] or 0),
                "cells": int(agg["cells"] or 0),
                "decode_failures": int(agg["failures"] or 0),
                "ingest_failures": n_ingest_failures,
                "spans": int(n_spans or 0),
                "wall_sec": round(wall, 3),
                "docs_per_sec": round(n_docs / wall, 3) if wall > 0 else None,
                "buckets_run": summary["buckets_run"],
                "buckets_skipped": summary["buckets_skipped"],
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
