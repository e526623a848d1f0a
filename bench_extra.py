"""Supplementary noop-sink stage breakdown for extract_spans (guide §1.4) —
NOT part of the frozen bench.py contract. Times each pipeline stage of the
flagship extract in isolation so optimization work targets the real cost:

  route      — route_units mapInPandas alone (Arrow round trip + routing)
  route+dec  — routing, hash repartition, decode_routed (no reassembly)
  full       — extract_spans end to end (what bench.py times)
  kernel     — the pure-Python decode kernel, sequential, one core
               (docs/s/core; the irreducible per-doc compute)

Usage: python bench_extra.py [n_docs] [cpus] [reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def noop(df) -> float:
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    return time.time() - t0


def main() -> int:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 20000
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 2

    from docling_parse_spark.corpus import CORPUS_VERSION, corpus_df
    from docling_parse_spark.extract import decode_routed, extract_spans, route_units
    from docling_parse_spark.session import get_spark

    spark = get_spark(
        app_name="bench_extra",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus * 2,
        extra_conf={
            "spark.sql.files.maxPartitionBytes": str(2 * 1024 * 1024),
            "spark.ui.showConsoleProgress": "false",
        },
    )
    corpus_path = f"/tmp/bench_corpus_v{CORPUS_VERSION}_{n_docs}"
    if not os.path.exists(os.path.join(corpus_path, "_SUCCESS")):
        corpus_df(spark, n_docs, seed=42, num_partitions=cpus * 4).write.mode(
            "overwrite"
        ).parquet(corpus_path)
    docs = spark.read.parquet(corpus_path)

    stages: dict[str, float] = {}
    sc = spark.sparkContext
    for _ in range(reps):
        sc.setJobDescription("extract: route only")
        t = noop(route_units(docs, heavy_span_threshold=24))
        stages["route"] = min(stages.get("route", 1e9), t)

        sc.setJobDescription("extract: route+repartition+decode")
        routed = route_units(docs, heavy_span_threshold=24).repartition(
            cpus * 4, "doc_id", "page"
        )
        t = noop(decode_routed(routed))
        stages["route_decode"] = min(stages.get("route_decode", 1e9), t)

        sc.setJobDescription("extract: full")
        t = noop(extract_spans(docs, num_partitions=cpus * 4))
        stages["full"] = min(stages.get("full", 1e9), t)
        sc.setJobDescription(None)

    # sequential kernel rate, one core (no Spark, no Arrow)
    from docling_parse_spark.corpus import generate_corpus
    from docling_parse_spark.document import decode_unit, doc_to_units

    kd = generate_corpus(400, seed=42)
    fonts_cache: dict = {}
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        for d in kd:
            for u in doc_to_units(d["doc_id"], d["spans"], serialize=False):
                decode_unit(u["unit_kind"], u["payload"], u["page"], u["resources"],
                            None, fonts_cache)
        best = min(best, time.perf_counter() - t0)
    stages["kernel_docs_per_sec_core"] = round(400 / best, 1)

    stages = {k: round(v, 3) for k, v in stages.items()}
    stages["n_docs"] = n_docs
    stages["cpus"] = cpus
    import json

    print(json.dumps(stages))
    return 0


if __name__ == "__main__":
    sys.exit(main())
