"""As-of (backward temporal) join — a training-data staple Spark lacks
natively: for every left row at time t, attach the latest right row at
time t' <= t within the same key.

Scalable construction (no range-join explosion): tag and UNION both sides,
one window per key ordered by (ts, side) carrying the last right value
forward (``last(..., ignorenulls=True)``), then keep the left rows. Exactly
ONE shuffle on the key — at 100 TB this beats a range join by orders of
magnitude because no (left x right-candidates) pairs ever materialize.

DuckDB's native ASOF JOIN is the oracle twin (see __spark_entry__).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str,
    value_cols: list[str],
    tolerance_sec: int | None = None,
) -> DataFrame:
    """Left rows + the most recent ``value_cols`` from ``right`` per ``by``
    key at or before the left row's ``on`` timestamp (NULLs when no earlier
    right row, or when it is older than ``tolerance_sec``)."""
    clashes = [c for c in value_cols + ["_side", "_asof"] if c in left.columns]
    if clashes:
        raise ValueError(
            f"asof_join: left already has column(s) {clashes} — rename them; "
            "value_cols and the internal _side/_asof names must be absent "
            "from the left side or its own rows would feed the carry"
        )
    bad_values = [c for c in value_cols if c in ("_ts", on, by, "_side", "_asof")]
    if bad_values:
        raise ValueError(
            f"asof_join: value_cols {bad_values} collide with the join keys "
            "or the internal _ts/_side/_asof names — rename them"
        )
    lt = left.withColumn("_side", F.lit(1))
    # ASOF semantics (and DuckDB's native ASOF JOIN, the oracle twin):
    # a right row with a NULL timestamp or NULL key can never be "the
    # latest at-or-before" anything — but Spark windows sort NULL
    # timestamps FIRST and group NULL keys together, which would carry
    # such rows into every left row (round-4 review). Drop them up front;
    # left rows with NULL ts/key then naturally get NULL (nothing
    # precedes them in their window).
    rt = (
        right.select(by, on, *value_cols)
        .where(F.col(on).isNotNull() & F.col(by).isNotNull())
        .withColumn("_side", F.lit(0))
    )
    for c in lt.columns:
        if c not in rt.columns:
            rt = rt.withColumn(c, F.lit(None))
    for c in rt.columns:
        if c not in lt.columns:
            lt = lt.withColumn(c, F.lit(None))
    unioned = lt.select(rt.columns).unionByName(rt.select(rt.columns))
    # right rows sort before left rows at equal timestamps -> "at or before"
    w = (
        Window.partitionBy(by)
        .orderBy(F.col(on).asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # carry the ENTIRE latest right row as one struct keyed on _side==0: the
    # carried values and their timestamp always come from the same (latest)
    # right row, so a legitimately-NULL right value is preserved rather than
    # skipped for an older non-null one, and the tolerance check gates the
    # exact row the values came from (ADVICE r02).
    rrow = F.when(
        F.col("_side") == 0,
        F.struct(F.col(on).alias("_ts"), *[F.col(c).alias(c) for c in value_cols]),
    )
    carried = unioned.withColumn("_asof", F.last(rrow, ignorenulls=True).over(w))
    out = carried.filter(F.col("_side") == 1)
    in_tol = F.lit(True)
    if tolerance_sec is not None:
        in_tol = (
            F.col(on).cast("long") - F.col("_asof")["_ts"].cast("long")
        ) <= tolerance_sec
    keep = [F.col(c) for c in left.columns] + [
        F.when(in_tol, F.col("_asof")[c]).alias(f"asof_{c}") for c in value_cols
    ]
    return out.select(*keep)
