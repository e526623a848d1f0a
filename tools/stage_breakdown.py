"""Per-stage decode-time attribution over the bench corpus — the VERDICT r02
#1 protocol (reference timing-keys parity: src/parse/utils/pdf_timings.h:32-99,
aggregation page.h:1076-1111).

Runs the routed extract pipeline once at the bench setup and prints, per
unit kind (keys present in stage_ms identify the branch), the total wall ms
per stage plus page counts — the table that attributes end-to-end docs/s
deltas to specific kernels (tokenize / interpret / fonts / merge / annots /
html).

Usage: python tools/stage_breakdown.py [n_docs] [cpus]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 20000
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32

    from pyspark.sql import functions as F

    from docling_parse_spark.corpus import CORPUS_VERSION, corpus_df
    from docling_parse_spark.extract import STAGE_KEYS, decode_routed, route_units
    from docling_parse_spark.session import get_spark

    spark = get_spark(
        app_name="stage_breakdown",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus * 2,
        extra_conf={"spark.sql.files.maxPartitionBytes": str(2 * 1024 * 1024)},
    )
    corpus_path = f"/tmp/bench_corpus_v{CORPUS_VERSION}_{n_docs}"
    if not os.path.exists(os.path.join(corpus_path, "_SUCCESS")):
        corpus_df(spark, n_docs, seed=42, num_partitions=cpus * 4).write.mode(
            "overwrite"
        ).parquet(corpus_path)
    docs = spark.read.parquet(corpus_path)

    t0 = time.time()
    routed = route_units(docs, heavy_span_threshold=24).repartition(
        cpus * 4, "doc_id", "page"
    )
    decoded = decode_routed(routed)
    kind = F.when(
        F.element_at("stage_ms", F.lit("html")).isNotNull(), F.lit("html")
    ).otherwise(F.when(F.size(F.map_keys("stage_ms")) == 0, "empty").otherwise("pdf"))
    agg = (
        decoded.groupBy(kind.alias("kind"))
        .agg(
            F.count("*").alias("units"),
            F.round(F.sum("decode_ms") / 1000.0, 2).alias("decode_s"),
            *[
                F.round(
                    F.sum(F.coalesce(F.element_at("stage_ms", F.lit(k)), F.lit(0.0)))
                    / 1000.0,
                    2,
                ).alias(f"{k}_s")
                for k in STAGE_KEYS
            ],
        )
        .orderBy("kind")
    )
    rows = agg.collect()
    wall = time.time() - t0
    print(f"\nn_docs={n_docs} cpus={cpus} wall={wall:.1f}s "
          f"({n_docs / wall:.0f} docs/s incl. breakdown agg)")
    hdr = ["kind", "units", "decode_s"] + [f"{k}_s" for k in STAGE_KEYS]
    print(" | ".join(f"{h:>12}" for h in hdr))
    for r in rows:
        print(" | ".join(f"{str(r[h]):>12}" for h in hdr))
    # unattributed = decode_ms - sum(stages): python overhead, row assembly
    for r in rows:
        attributed = sum(r[f"{k}_s"] for k in STAGE_KEYS)
        print(f"{r['kind']}: attributed {attributed:.2f}s / {r['decode_s']}s "
              f"({100 * attributed / max(r['decode_s'], 1e-9):.0f}%)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
