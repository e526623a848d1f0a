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
  doc makes the following shard ids skip forward). The global cumsum is a
  distributed two-pass prefix sum (range partition -> local cumsum ->
  broadcast partition offsets), so the default path carries no
  single-partition window state; explicit per-bucket packing composes for
  pipelines that already bucket.
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
    num_range_partitions: int | None = None,
) -> DataFrame:
    """Assign each doc a ``shard_id`` so consecutive docs (in ``order_col``
    order) fill ``budget`` tokens per shard: shard = floor((cumsum_before)
    / budget) where cumsum_before excludes the current doc — i.e. a doc
    starts in the shard its predecessor's total landed in (simple
    first-fit-in-order packing; a doc bigger than the budget spills into as
    many following shard ids as it needs). Deterministic when ``order_col``
    is a key.

    The default (``by=None``) computes the GLOBAL cumulative sum with a
    distributed two-pass prefix sum (VERDICT r03 #3 — it used to be a
    single-partition global window): range-partition on ``order_col``,
    local per-partition prefix sums, then add each partition's broadcast
    offset (the sum of all earlier partitions' totals). Same output as the
    global sort for any partition count — window state is bounded per
    partition, so the default path survives 100 TB.

    ``by`` = a precomputed bucket column packs per bucket instead (shard_id
    unique per (bucket, shard)) — one shuffle, no offset pass — for
    pipelines that already bucket their corpus."""
    if by is not None:
        w = Window.partitionBy(by).orderBy(order_col).rowsBetween(
            Window.unboundedPreceding, -1
        )
        before = F.coalesce(F.sum(token_col).over(w), F.lit(0).cast("long"))
        return docs.withColumn("shard_id", F.floor(before / F.lit(budget)).cast("int"))

    spark = docs.sparkSession
    p = num_range_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    ranged = docs.repartitionByRange(p, F.col(order_col)).withColumn(
        "__pid", F.spark_partition_id()
    )
    w_local = Window.partitionBy("__pid").orderBy(order_col).rowsBetween(
        Window.unboundedPreceding, -1
    )
    local_before = F.coalesce(F.sum(token_col).over(w_local), F.lit(0).cast("long"))
    # per-partition totals: a tiny (<= p rows) table; the offsets window is
    # global but over p rows, not the corpus. Ordered by each partition's
    # min key (not __pid) so correctness never leans on partition-id order.
    totals = ranged.groupBy("__pid").agg(
        F.sum(token_col).alias("__tot"), F.min(order_col).alias("__k0")
    )
    w_off = Window.orderBy("__k0").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.withColumn(
        "__off", F.coalesce(F.sum("__tot").over(w_off), F.lit(0).cast("long"))
    ).select("__pid", "__off")
    return (
        ranged.join(F.broadcast(offsets), "__pid")
        .withColumn(
            "shard_id",
            F.floor((F.col("__off") + local_before) / F.lit(budget)).cast("int"),
        )
        .drop("__pid", "__off")
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
