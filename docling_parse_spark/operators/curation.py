"""Training-data curation operators: deterministic sampling, shard packing,
test-set decontamination.

These are the corpus-curation steps a 100 TB training-data pipeline runs
after extraction + dedup (the reference stops at extraction; these are
north-rule additions like operators/dedup.py). All three are pure
DataFrame compositions — no UDFs, no driver loops — and deterministic, so
each has an exact DuckDB oracle twin in ``__spark_entry__``.

* ``sample_stratified`` — per-stratum deterministic downsampling by hash
  threshold: keep a row iff the first two hex chars of ``md5(id)`` fall
  under the stratum's fraction (quantized to 256ths). Unlike
  ``DataFrame.sampleBy`` this is reproducible across runs, partitionings
  AND engines (md5 is universal; Spark's xxhash64 is not), which is what a
  lineage-tracked pipeline needs; it is also a single narrow filter — no
  shuffle at all.
* ``pack_training_shards`` — assign docs to contiguous token-budget shards:
  order by a deterministic key, running token cumsum, shard = how many
  FULL budgets precede the doc's start (first-fit-in-order: a doc starts in
  the shard its predecessor's running total landed in, and an over-budget
  doc makes the following shard ids skip forward). One global sort — the
  standard way to build size-bounded training files; at 100 TB you'd
  pre-bucket by key range and pack within buckets (the per-bucket call
  composes).
* ``decontaminate`` — drop training docs sharing any k-char shingle with a
  held-out eval set: shingle-explode both sides, LEFT ANTI join on the
  shingle (broadcast when the eval side is small — it always is). The
  standard n-gram-overlap decontamination used for eval-set hygiene.
* ``cap_per_group`` — keep at most ``n`` rows per group (the "cap docs per
  domain" heavy-hitter control every web-scale corpus applies). A
  row_number window with a ``<= n`` filter: Spark pushes the limit below
  the exchange as WindowGroupLimit partial+final, so a domain with 10^9
  pages ships at most ``n`` rows per map partition into the shuffle —
  the skewed-key case this op exists for is exactly the one the plan
  handles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from docling_parse_spark.operators.dedup import char_shingles


def sample_stratified(
    docs: DataFrame,
    strata_col: str,
    fractions: dict[str, float],
    id_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """Deterministic per-stratum sample. ``fractions`` maps stratum value ->
    keep fraction, quantized to 256ths: keep iff the first md5 byte of
    ``salt || id`` is < round(fraction * 256). Strata not listed are kept
    whole. Exactly reproducible across engines (md5 on the decimal string
    form of the id), independent of partitioning. ``salt`` varies the
    sample (a seed that survives engine changes)."""
    hex2 = F.substring(F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string"))), 1, 2)
    keep = None
    listed = None
    for value, fraction in fractions.items():
        threshold = max(0, min(256, round(fraction * 256)))
        # threshold 256 = keep the whole stratum ("ff" < "100" is false as
        # strings, so the comparison form only covers 0..255)
        under = F.lit(True) if threshold >= 256 else hex2 < F.lit(format(threshold, "02x"))
        # eqNullSafe: a NULL stratum is "not listed" (False, not NULL), so
        # NULL-stratum rows are kept whole like any other unlisted stratum
        cond = F.col(strata_col).eqNullSafe(F.lit(value)) & under
        keep = cond if keep is None else keep | cond
        in_stratum = F.col(strata_col).eqNullSafe(F.lit(value))
        listed = in_stratum if listed is None else listed | in_stratum
    if keep is None:
        return docs
    return docs.filter(keep | ~listed)


def pack_training_shards(
    docs: DataFrame,
    token_col: str = "n_tokens",
    budget: int = 4096,
    order_col: str = "doc_id",
    by: str | None = None,
) -> DataFrame:
    """Assign each doc a ``shard_id`` so consecutive docs (in ``order_col``
    order) fill ``budget`` tokens per shard: shard = floor((cumsum_before)
    / budget) where cumsum_before excludes the current doc — i.e. a doc
    starts in the shard its predecessor's total landed in (simple
    first-fit-in-order packing; a doc bigger than the budget spills into as
    many following shard ids as it needs). Deterministic.

    Without ``by`` the window is global (one sort, single-partition state —
    fine up to millions of rows). At 100 TB pass ``by`` = a bucket column
    (e.g. ``pmod(xxhash64(doc_id), B)``): packing runs per bucket in
    parallel and ``shard_id`` is unique per (bucket, shard)."""
    base = Window.partitionBy(by) if by is not None else Window.partitionBy()
    w = base.orderBy(order_col).rowsBetween(Window.unboundedPreceding, -1)
    before = F.coalesce(F.sum(token_col).over(w), F.lit(0).cast("long"))
    return docs.withColumn(
        "shard_id", F.floor(before / F.lit(budget)).cast("int")
    )


def cap_per_group(
    df: DataFrame,
    by: str,
    n: int,
    order_col: str = "doc_id",
) -> DataFrame:
    """Keep the first ``n`` rows of each ``by`` group in ``order_col``
    order (deterministic — ties impossible when ``order_col`` is a key).
    The physical plan is WindowGroupLimit(partial) -> exchange ->
    WindowGroupLimit(final), i.e. each map partition pre-truncates its
    local run to ``n`` before shuffling, so hot groups never flood the
    exchange."""
    if "__rn" in df.columns:  # would be silently consumed by the filter
        raise ValueError("cap_per_group: input must not carry a __rn column")
    w = Window.partitionBy(by).orderBy(order_col)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= n)
        .drop("__rn")
    )


def decontaminate(
    train: DataFrame,
    eval_docs: DataFrame,
    k: int = 24,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Remove training docs that share ANY ``k``-char shingle with the eval
    set (n-gram-overlap decontamination). The eval side explodes to its
    shingle set and broadcasts (eval sets are small by definition); the
    train side explodes and LEFT ANTI semi-joins — contaminated doc_ids are
    collected distinct, then anti-joined so each surviving doc keeps all its
    columns. Two shuffles on the train side (shingle join + distinct), zero
    on eval."""
    tr = train.select(
        F.col(id_col).alias("__did"),
        F.explode(char_shingles(F.col(text_col), k)).alias("g"),
    )
    ev = eval_docs.select(F.explode(char_shingles(F.col(text_col), k)).alias("g")).distinct()
    contaminated = (
        tr.join(F.broadcast(ev), "g")
        .select("__did")
        .distinct()
    )
    return train.join(
        contaminated.withColumnRenamed("__did", id_col), id_col, "left_anti"
    )
