"""Custom stateful streaming operator: gap-based sessionization with
``applyInPandasWithState`` — the pattern for stateful extraction rollups the
built-in windowed aggregations can't express (arbitrary per-key state machines).

Semantics: events per ``user_id`` are folded into sessions; a gap larger than
``gap_sec`` CLOSES the current session (emitted downstream in append mode)
and opens a new one. The open tail session lives in the state store across
micro-batches until a later event (or nothing) closes it — i.e. exactly the
reference's "decode once, emit when complete" bounded-state discipline, per
key instead of per page.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

OUTPUT_SCHEMA = "user_id bigint, session_start double, session_end double, n_events bigint"
STATE_SCHEMA = "start_ts double, last_ts double, n bigint"


def make_sessionizer(gap_sec: float = 1800.0):
    """Returns the (key, batches, state) -> iterator function for
    ``applyInPandasWithState``."""

    def sessionize(key, pdfs: Iterator[pd.DataFrame], state) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.exists:
            start_ts, last_ts, n = state.get
        else:
            start_ts = last_ts = None
            n = 0
        closed = []
        ts_values = []
        for pdf in pdfs:
            ts_values.extend(float(t) for t in pdf["epoch"])
        for e in sorted(ts_values):
            if last_ts is None:
                start_ts, last_ts, n = e, e, 1
            elif e - last_ts > gap_sec:
                closed.append((user_id, start_ts, last_ts, n))
                start_ts, last_ts, n = e, e, 1
            else:
                # out-of-order events can arrive in a LATER micro-batch
                # (sorted within a batch, unordered across batches): never
                # move the session clock backwards, or a following on-time
                # event sees a phantom gap and the closed session gets
                # session_end < session_start (round-4 review). A late
                # event inside the gap extends the session backwards.
                start_ts = min(start_ts, e)
                last_ts = max(last_ts, e)
                n += 1
        if last_ts is not None:
            state.update((float(start_ts), float(last_ts), int(n)))
        if closed:
            yield pd.DataFrame(closed, columns=["user_id", "session_start", "session_end", "n_events"])

    return sessionize


def sessionize_stream(events_df, gap_sec: float = 1800.0):
    """events (user_id, ts) streaming frame -> closed sessions (append mode).

    Input needs an ``epoch`` double column (``F.col('ts').cast('double')``) —
    epoch seconds keep the state schema flat."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    return events_df.groupBy("user_id").applyInPandasWithState(
        make_sessionizer(gap_sec),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


DEDUP_OUT_SCHEMA = "fp string, doc_id string, text string"
DEDUP_STATE_SCHEMA = "seen boolean"


def make_dedup():
    """(key, batches, state) -> iterator for streaming exact dedup: one doc
    per fingerprint passes, every later arrival (any micro-batch, any
    restart — state survives the checkpoint) is dropped. Within a single
    micro-batch the survivor is deterministic: min(doc_id), NULL ids last
    (partition arrival order never decides — ADVICE r02). NULL values are
    emitted as NULLs, not stringified."""

    def dedup(key, pdfs: Iterator[pd.DataFrame], state) -> Iterator[pd.DataFrame]:
        (fp,) = key
        if state.exists:
            return
        best = None
        for pdf in pdfs:
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                # numeric id columns surface nulls as NaN in pandas, and NaN
                # never compares — treat it like None so nulls rank last
                null = doc_id is None or (isinstance(doc_id, float) and doc_id != doc_id)
                rank = (null, "" if null else doc_id)
                if best is None or rank < best[0]:
                    best = (rank, None if null else doc_id, text)
        if best is not None:
            state.update((True,))
            yield pd.DataFrame(
                [(fp, best[1], best[2])], columns=["fp", "doc_id", "text"]
            )

    return dedup


def dedup_stream(docs_df):
    """Streaming exact dedup over (doc_id, text): emit each normalized-text
    fingerprint's FIRST document only — the streaming twin of
    operators.dedup.exact_duplicates, keyed state instead of a groupBy.
    One shuffle on the fingerprint; state is one boolean per distinct doc."""
    from pyspark.sql import functions as F
    from pyspark.sql.streaming.state import GroupStateTimeout

    from docling_parse_spark.functions.text import fingerprint_md5

    keyed = docs_df.withColumn("fp", fingerprint_md5(F.col("text")))
    return keyed.groupBy("fp").applyInPandasWithState(
        make_dedup(),
        outputStructType=DEDUP_OUT_SCHEMA,
        stateStructType=DEDUP_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
