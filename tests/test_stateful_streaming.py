"""applyInPandasWithState sessionizer: state persists across micro-batches."""

import pytest
from pyspark.sql import functions as F


def _write_events(spark, path, rows):
    df = spark.createDataFrame(rows, "user_id bigint, epoch double")
    df.coalesce(1).write.mode("append").parquet(path)


def test_stateful_sessionize_across_batches(spark, tmp_path):
    from docling_parse_spark.streaming.stateful import sessionize_stream

    in_dir = str(tmp_path / "events_in")
    out_dir = str(tmp_path / "sessions_out")
    ckpt = str(tmp_path / "ckpt")

    def run_once():
        stream = (
            spark.readStream.schema("user_id bigint, epoch double")
            .option("maxFilesPerTrigger", 1)
            .parquet(in_dir)
        )
        q = (
            sessionize_stream(stream, gap_sec=60.0)
            .writeStream.foreachBatch(
                lambda df, _id: df.write.mode("append").parquet(out_dir)
            )
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return sorted(
            tuple(r) for r in spark.read.parquet(out_dir).collect()
        ) if _exists(out_dir) else []

    def _exists(p):
        import os

        return os.path.exists(p) and any(f.endswith(".parquet") for f in os.listdir(p))

    # batch 1: user 1 has two sessions (gap > 60), user 2 one open session
    _write_events(spark, in_dir, [(1, 0.0), (1, 10.0), (1, 100.0), (2, 5.0)])
    got = run_once()
    # only user 1's FIRST session is closed; the rest are open state
    assert got == [(1, 0.0, 10.0, 2)]

    # batch 2 (stream restart from checkpoint): the 300 event closes user 1's
    # open session (100..100); the 500 event closes user 2's (5..5)
    _write_events(spark, in_dir, [(1, 300.0), (2, 500.0)])
    got2 = run_once()
    assert got2 == [(1, 0.0, 10.0, 2), (1, 100.0, 100.0, 1), (2, 5.0, 5.0, 1)]


def test_sessionizer_kernel_pure():
    """The state-machine kernel, driven directly (no Spark)."""
    import pandas as pd

    from docling_parse_spark.streaming.stateful import make_sessionizer

    class FakeState:
        def __init__(self):
            self.exists = False
            self._v = None

        @property
        def get(self):
            return self._v

        def update(self, v):
            self._v = v
            self.exists = True

    fn = make_sessionizer(gap_sec=60.0)
    st = FakeState()
    out = list(fn((7,), iter([pd.DataFrame({"epoch": [0.0, 10.0, 200.0, 210.0, 400.0]})]), st))
    rows = [tuple(r) for r in out[0].itertuples(index=False)]
    assert rows == [(7, 0.0, 10.0, 2), (7, 200.0, 210.0, 2)]
    assert st.get == (400.0, 400.0, 1)


def test_stateful_dedup_across_batches(spark, tmp_path):
    """Streaming exact dedup: first arrival wins; duplicates are dropped
    across micro-batches AND across stream restarts (state checkpointed)."""
    from docling_parse_spark.streaming.stateful import dedup_stream

    in_dir = str(tmp_path / "docs_in")
    out_dir = str(tmp_path / "docs_out")
    ckpt = str(tmp_path / "ckpt2")

    def write_docs(rows):
        spark.createDataFrame(rows, "doc_id string, text string").coalesce(1).write.mode(
            "append"
        ).parquet(in_dir)

    def run_once():
        stream = (
            spark.readStream.schema("doc_id string, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(in_dir)
        )
        q = (
            dedup_stream(stream)
            .writeStream.foreachBatch(
                lambda df, _id: df.write.mode("append").parquet(out_dir)
            )
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        import os

        if not (os.path.exists(out_dir) and any(f.endswith(".parquet") for f in os.listdir(out_dir))):
            return []
        return sorted((r["doc_id"], r["text"]) for r in spark.read.parquet(out_dir).collect())

    write_docs([("a", "the same text"), ("b", "THE  SAME text"), ("c", "unique one")])
    got = run_once()
    # b normalizes to a's fingerprint -> dropped
    assert got == [("a", "the same text"), ("c", "unique one")]

    write_docs([("d", "the same text"), ("e", "brand new")])
    got2 = run_once()
    assert got2 == [("a", "the same text"), ("c", "unique one"), ("e", "brand new")]


def test_dedup_kernel_deterministic_survivor():
    """make_dedup picks min(doc_id) within a batch (not arrival order) and
    preserves NULLs instead of stringifying them (ADVICE r02)."""
    import pandas as pd

    from docling_parse_spark.streaming.stateful import make_dedup

    class FakeState:
        exists = False

        def update(self, v):
            self.exists = True

    fn = make_dedup()
    batches = [
        pd.DataFrame({"doc_id": ["d9", "d2"], "text": ["t9", "t2"]}),
        pd.DataFrame({"doc_id": ["d1", None], "text": [None, "tn"]}),
    ]
    out = list(fn(("fp1",), iter(batches), FakeState()))
    assert len(out) == 1
    row = out[0].iloc[0]
    assert row["doc_id"] == "d1" and row["text"] is None
    # NULL ids rank last but still survive when alone
    out2 = list(fn(("fp2",), iter([pd.DataFrame({"doc_id": [None], "text": ["x"]})]), FakeState()))
    assert out2[0].iloc[0]["doc_id"] is None and out2[0].iloc[0]["text"] == "x"


def test_streaming_curate_then_dedup_chain(spark, tmp_path):
    """The realistic streaming ingest path composes: curate_stream
    (stateless redact/score/filter) -> dedup_stream (keyed state) in ONE
    streaming query — duplicates collapse, junk is dropped, PII is
    redacted before fingerprinting (so PII-only variants dedup together)."""
    from pyspark.sql import functions as F

    from docling_parse_spark.streaming.pipeline import curate_stream
    from docling_parse_spark.streaming.stateful import dedup_stream

    good = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [
        ("d1", good),
        ("d2", good),                             # exact dup of d1
        ("d3", "mail a@x.io " + good),            # PII variant...
        ("d4", "mail b@y.io " + good),            # ...same after redaction
        ("d5", "too short"),                      # filtered out
        ("d6", good + " unique tail words here"),
    ]
    schema = "doc_id string, text string"
    in_dir = str(tmp_path / "in")
    spark.createDataFrame(rows, schema).coalesce(1).write.parquet(in_dir)

    stream = spark.readStream.schema(schema).parquet(in_dir)
    curated = curate_stream(stream).select("doc_id", "text")
    q = (
        dedup_stream(curated)
        .writeStream.format("memory").queryName("chain_t")
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    out = {r["doc_id"]: r["text"] for r in spark.sql("SELECT * FROM chain_t").collect()}
    survivors = set(out)
    assert "d5" not in survivors and len(survivors) == 3
    assert ("d1" in survivors) != ("d2" in survivors)       # one of the exact dups
    assert ("d3" in survivors) != ("d4" in survivors)       # one of the PII variants
    pii_survivor = out.get("d3", out.get("d4"))
    assert "[EMAIL]" in pii_survivor and "@" not in pii_survivor
