"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship span-extraction pipeline over the sf0.001
documents table (wrapped into the north-rule interleaved shape).
``queries``/``oracle_sql`` cover the engine's relational operator surface:
TPC-H-style joins/aggregations/windows, text analysis, dedup families,
similarity search. Non-SQL-expressible ops (minhash/simhash/winnowing/the
extraction pipeline itself) have no oracle entry -> rows-only check; their
exactness is covered by tests/ (span-sequence equality vs the sequential
oracle).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window, functions as F


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _docs_as_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wrap the plain documents table into the north-rule interleaved shape
    (one html span per doc)."""
    docs = _t(spark, sf_dir, "documents")
    html = F.concat(F.lit("<html><body><p>"), F.col("text"), F.lit("</p></body></html>"))
    span = F.struct(
        F.lit("html").alias("kind"),
        html.alias("text"),
        F.lit(None).cast("string").alias("media_ref"),
        F.lit(0).alias("offset"),
    )
    return docs.select(
        F.format_string("doc-%07d", F.col("doc_id")).alias("doc_id"),
        F.array(span).alias("spans"),
    )


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: end-to-end span extraction over sf0.001, exploded to rows."""
    from docling_parse_spark.extract import extract_spans

    corpus = _docs_as_corpus(spark, "/root/testdata/sf0.001")
    spans = extract_spans(corpus, num_partitions=8)
    return spans.select("doc_id", F.explode("spans").alias("s")).select(
        "doc_id",
        F.col("s.offset").alias("offset"),
        F.col("s.kind").alias("kind"),
        F.col("s.text").alias("text"),
    )


# --------------------------------------------------------------- queries

def q1_pricing_summary(spark, sf):
    li = _t(spark, sf, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 4).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def q3_shipping_priority(spark, sf):
    cust = _t(spark, sf, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf, "orders")
    li = _t(spark, sf, "lineitem")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("o_orderkey")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey").asc())
        .limit(10)
    )


def q5_regional_revenue(spark, sf):
    region = _t(spark, sf, "region")
    nation = _t(spark, sf, "nation")
    cust = _t(spark, sf, "customer")
    orders = _t(spark, sf, "orders")
    li = _t(spark, sf, "lineitem")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias("revenue"))
        .orderBy("r_name")
    )


def q6_revenue_forecast(spark, sf):
    li = _t(spark, sf, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1997-01-01")
        & (F.col("l_discount") >= 0.02)
        & (F.col("l_discount") <= 0.06)
        & (F.col("l_quantity") < 24)
    ).agg(F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 4).alias("revenue"))


def top_customer_orders(spark, sf):
    orders = _t(spark, sf, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", F.round("o_totalprice", 4).alias("totalprice"), "rn")
    )


def events_daily(spark, sf):
    ev = _t(spark, sf, "events")
    return (
        ev.groupBy(F.to_date("ts").alias("day"), "event_type")
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 4).alias("sum_value"))
        .orderBy("day", "event_type")
    )


def events_sessionize(spark, sf):
    ev = _t(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    epoch = F.col("ts").cast("timestamp").cast("long")
    gap = epoch - F.lag(epoch).over(w)
    marked = ev.withColumn("new_session", F.when(gap.isNull() | (gap > 1800), 1).otherwise(0))
    sess = marked.withColumn("session_id", F.sum("new_session").over(
        w.rowsBetween(Window.unboundedPreceding, 0)
    ))
    return (
        sess.groupBy("user_id", "session_id")
        .agg(F.count("*").alias("n_events"), F.min(epoch).alias("session_start"))
        .orderBy("user_id", "session_id")
    )


def doc_token_stats(spark, sf):
    from docling_parse_spark.functions.text import (
        bpe_token_count,
        punct_ratio,
        quality_score,
        token_count,
    )

    docs = _t(spark, sf, "documents")
    return docs.select(
        "doc_id",
        token_count(F.col("text")).alias("n_tokens"),
        bpe_token_count(F.col("text")).alias("n_bpe_tokens"),
        F.round(punct_ratio(F.col("text")), 6).alias("punct_ratio"),
        F.round(quality_score(F.col("text")), 4).alias("quality"),
    )


def doc_langid(spark, sf):
    from docling_parse_spark.functions.text import langid

    docs = _t(spark, sf, "documents")
    return docs.select("doc_id", "lang", langid(F.col("text")).alias("lang_pred"))


def dedup_exact(spark, sf):
    from docling_parse_spark.operators.dedup import exact_duplicates

    return exact_duplicates(_t(spark, sf, "documents")).orderBy("fp")


def dedup_ngram_jaccard(spark, sf):
    from docling_parse_spark.operators.dedup import ngram_jaccard_pairs

    docs = _t(spark, sf, "documents").filter(F.col("doc_id") < 200)
    return ngram_jaccard_pairs(docs, k=8, threshold=0.12).orderBy("id_a", "id_b")


def ann_cosine_topk(spark, sf):
    from docling_parse_spark.operators.similarity import brute_force_topk

    emb = _t(spark, sf, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    return brute_force_topk(emb, queries, k=5).orderBy("query_id", "rank")


def embedding_dups(spark, sf):
    from docling_parse_spark.operators.dedup import embedding_dup_pairs

    emb = _t(spark, sf, "embeddings").filter(F.col("vec_id") < 300)
    return embedding_dup_pairs(emb, threshold=0.4).orderBy("id_a", "id_b")


def dedup_minhash_lsh(spark, sf):
    """Recall-gated: exact n-gram Jaccard pairs (SQL-oracle-able) that the
    minhash-LSH candidate set must also contain. A banding/signature bug
    drops rows -> hash mismatch; verified recall==1.0 at sf0.001/sf0.01."""
    from docling_parse_spark.operators.dedup import minhash_lsh_pairs, ngram_jaccard_pairs

    docs = _t(spark, sf, "documents").filter(F.col("doc_id") < 300)
    exact = ngram_jaccard_pairs(docs, k=9, threshold=0.5)
    cands = minhash_lsh_pairs(docs, k=9, threshold=0.3).select("id_a", "id_b")
    return exact.join(cands, ["id_a", "id_b"], "left_semi").orderBy("id_a", "id_b")


def dedup_simhash(spark, sf):
    """Recall-gated: identical-text clones (doc_id+1000) MUST collide in every
    simhash band with Hamming distance 0 — deterministic by construction, so
    the banded join + signature UDF are SQL-oracle-checkable."""
    from docling_parse_spark.operators.dedup import simhash_pairs

    docs = _t(spark, sf, "documents").filter(F.col("doc_id") < 300).select("doc_id", "text")
    clones = docs.select((F.col("doc_id") + 1000).alias("doc_id"), "text")
    pairs = simhash_pairs(docs.unionByName(clones))
    return (
        pairs.filter((F.col("hamming") == 0) & (F.col("id_b") == F.col("id_a") + 1000))
        .select("id_a", "id_b", "hamming")
        .orderBy("id_a")
    )


def ann_lsh_topk(spark, sf):
    """LSH ANN under the gate: planes=32/bands=16 gives verified recall@5 ==
    1.0 on this corpus, so the approximate result must equal the brute-force
    oracle exactly. dim is passed explicitly (no driver-side inference)."""
    from docling_parse_spark.operators.similarity import lsh_topk

    emb = _t(spark, sf, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    return lsh_topk(emb, queries, k=5, n_planes=32, bands=16, dim=64).orderBy("query_id", "rank")


def winnowing_fingerprints(spark, sf):
    from docling_parse_spark.functions.text import winnowing_fingerprint

    docs = _t(spark, sf, "documents").filter(F.col("doc_id") < 100)
    return docs.select(
        "doc_id", F.size(winnowing_fingerprint(F.col("text"))).alias("fp_size")
    ).orderBy("doc_id")


def extract_pipeline_spans(spark, sf):
    from docling_parse_spark.extract import extract_spans

    corpus = _docs_as_corpus(spark, sf)
    spans = extract_spans(corpus, num_partitions=8)
    return spans.select("doc_id", F.size("spans").alias("n_spans")).orderBy("doc_id")


def customers_without_orders(spark, sf):
    cust = _t(spark, sf, "customer")
    orders = _t(spark, sf, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


def customers_with_orders(spark, sf):
    cust = _t(spark, sf, "customer")
    orders = _t(spark, sf, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_semi")
        .select("c_custkey", "c_mktsegment")
        .orderBy("c_custkey")
    )


def part_type_rollup(spark, sf):
    part = _t(spark, sf, "part")
    return (
        part.rollup("p_type", "p_brand")
        .agg(F.count("*").alias("n"), F.round(F.avg("p_retailprice"), 4).alias("avg_price"))
        .orderBy("p_type", "p_brand")
    )


def order_status_pivot(spark, sf):
    orders = _t(spark, sf, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .agg(
            F.sum(F.when(F.col("o_orderstatus") == "O", 1).otherwise(0)).alias("n_open"),
            F.sum(F.when(F.col("o_orderstatus") == "F", 1).otherwise(0)).alias("n_filled"),
            F.sum(F.when(F.col("o_orderstatus") == "P", 1).otherwise(0)).alias("n_partial"),
        )
        .orderBy("o_orderpriority")
    )


def distinct_event_types(spark, sf):
    ev = _t(spark, sf, "events")
    return ev.select("event_type").distinct().orderBy("event_type")


def supplier_nation_broadcast(spark, sf):
    sup = _t(spark, sf, "supplier")
    nation = _t(spark, sf, "nation")
    return (
        sup.join(F.broadcast(nation), sup.s_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(F.count("*").alias("n_suppliers"), F.round(F.sum("s_acctbal"), 4).alias("total_acctbal"))
        .orderBy("n_name")
    )


def _mini_pdf_corpus(spark, n=60):
    from docling_parse_spark.corpus import corpus_to_spark_rows, generate_corpus
    from docling_parse_spark.schemas import SPANS_TABLE_SCHEMA

    return spark.createDataFrame(
        corpus_to_spark_rows(generate_corpus(n, seed=42)), schema=SPANS_TABLE_SCHEMA
    )


def extract_cells_table(spark, sf):
    from docling_parse_spark.extract import extract_cells

    cells = extract_cells(_mini_pdf_corpus(spark), num_partitions=8)
    return (
        cells.groupBy("doc_id", "page")
        .agg(F.count("*").alias("n_cells"))
        .orderBy("doc_id", "page")
    )


def xycut_reading_order(spark, sf):
    from docling_parse_spark.extract import extract_spans
    from docling_parse_spark.pdf.page import DecodeConfig

    spans = extract_spans(
        _mini_pdf_corpus(spark), config=DecodeConfig(reading_order="xycut"), num_partitions=8
    )
    content = F.concat_ws("\x1f", F.transform("spans", lambda s: s["text"]))
    return spans.select(
        "doc_id",
        F.size("spans").alias("n_spans"),
        F.md5(content).alias("content_md5"),
    ).orderBy("doc_id")


def connected_components_page(spark, sf):
    from docling_parse_spark.extract import extract_cells
    from docling_parse_spark.operators.geometry import connected_bbox_components

    cells = extract_cells(_mini_pdf_corpus(spark), num_partitions=8)
    return (
        connected_bbox_components(cells, tol=2.0)
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_components"))
        .orderBy("doc_id")
    )


def media_decode_meta(spark, sf):
    from docling_parse_spark.operators.multimodal import decode_media, synth_media_df

    return decode_media(synth_media_df(spark, 200, num_partitions=8)).orderBy("media_ref")


def media_image_features(spark, sf):
    from docling_parse_spark.operators.multimodal import image_features, synth_media_df

    return image_features(synth_media_df(spark, 200, num_partitions=8)).orderBy("media_ref")


def media_frame_sample(spark, sf):
    from docling_parse_spark.operators.multimodal import sample_video_frames, synth_media_df

    return sample_video_frames(synth_media_df(spark, 200, num_partitions=8)).orderBy(
        "media_ref", "frame_idx"
    )


def doc_meta_table(spark, sf):
    """Doc-level metadata columns (XMP info + outline/TOC + AcroForm summary
    — reference document.h:140-181, pdf_parser.py:796-899)."""
    from docling_parse_spark.extract import extract_doc_meta

    meta = extract_doc_meta(_mini_pdf_corpus(spark))
    return meta.select(
        "doc_id", "title", "author", F.size("outline").alias("n_outline"), "n_fields"
    ).orderBy("doc_id")


def training_pipeline_e2e(spark, sf):
    """Corpus with exact-clone docs so the near-dup stage has deterministic,
    SQL-derivable survivors (tools/make_fixtures.py writes the sequential
    extraction texts the oracle recomputes scoring + survivors from)."""
    from docling_parse_spark.corpus import corpus_to_spark_rows, generate_corpus_with_dups
    from docling_parse_spark.pipeline import training_data_pipeline
    from docling_parse_spark.schemas import SPANS_TABLE_SCHEMA

    docs = spark.createDataFrame(
        corpus_to_spark_rows(generate_corpus_with_dups(60, seed=42, n_dups=5)),
        schema=SPANS_TABLE_SCHEMA,
    )
    out = training_data_pipeline(docs, num_partitions=8)
    return out.select("doc_id", "n_tokens", "quality", "lang").orderBy("doc_id")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "q1_pricing_summary": q1_pricing_summary,
        "q3_shipping_priority": q3_shipping_priority,
        "q5_regional_revenue": q5_regional_revenue,
        "q6_revenue_forecast": q6_revenue_forecast,
        "top_customer_orders": top_customer_orders,
        "events_daily": events_daily,
        "events_sessionize": events_sessionize,
        "doc_token_stats": doc_token_stats,
        "doc_langid": doc_langid,
        "dedup_exact": dedup_exact,
        "dedup_ngram_jaccard": dedup_ngram_jaccard,
        "ann_cosine_topk": ann_cosine_topk,
        "ann_lsh_topk": ann_lsh_topk,
        "embedding_dups": embedding_dups,
        "dedup_minhash_lsh": dedup_minhash_lsh,
        "dedup_simhash": dedup_simhash,
        "winnowing_fingerprints": winnowing_fingerprints,
        "extract_pipeline_spans": extract_pipeline_spans,
        "customers_without_orders": customers_without_orders,
        "customers_with_orders": customers_with_orders,
        "part_type_rollup": part_type_rollup,
        "order_status_pivot": order_status_pivot,
        "distinct_event_types": distinct_event_types,
        "supplier_nation_broadcast": supplier_nation_broadcast,
        "extract_cells_table": extract_cells_table,
        "xycut_reading_order": xycut_reading_order,
        "connected_components_page": connected_components_page,
        "doc_meta_table": doc_meta_table,
        "media_decode_meta": media_decode_meta,
        "media_image_features": media_image_features,
        "media_frame_sample": media_frame_sample,
        "training_pipeline_e2e": training_pipeline_e2e,
    }


_FIXTURES = "/root/repo/fixtures"

_ANN_TOPK_SQL = """
    WITH e AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ), scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             round(list_dot_product(q.v, c.v)
                   / (sqrt(list_dot_product(q.v, q.v))
                      * sqrt(list_dot_product(c.v, c.v))), 6) AS cos
      FROM e q JOIN e c ON q.vec_id != c.vec_id
      WHERE q.vec_id < 10
    )
    SELECT query_id, neighbor_id, cos,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY cos DESC, neighbor_id ASC) AS rank
    FROM scored
    QUALIFY rank <= 5
    ORDER BY query_id, rank
"""


def oracle_sql() -> dict[str, str]:
    from docling_parse_spark.functions.text import (
        FINGERPRINT_MD5_SQL,
        langid_sql,
        quality_score_sql,
        token_count_sql,
    )

    return {
        "q1_pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   round(sum(l_quantity), 4) AS sum_qty,
                   round(sum(l_extendedprice), 4) AS sum_base_price,
                   round(sum(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price,
                   round(avg(l_quantity), 4) AS avg_qty,
                   round(avg(l_discount), 4) AS avg_disc,
                   count(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
            GROUP BY l_returnflag, l_linestatus
            ORDER BY l_returnflag, l_linestatus
        """,
        "q3_shipping_priority": """
            SELECT o_orderkey,
                   round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            WHERE c_mktsegment = 'BUILDING'
            GROUP BY o_orderkey
            ORDER BY revenue DESC, o_orderkey ASC
            LIMIT 10
        """,
        "q5_regional_revenue": """
            SELECT r_name,
                   round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            GROUP BY r_name ORDER BY r_name
        """,
        "q6_revenue_forecast": """
            SELECT round(sum(l_extendedprice * l_discount), 4) AS revenue
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
              AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
              AND l_discount BETWEEN 0.02 AND 0.06
              AND l_quantity < 24
        """,
        "top_customer_orders": """
            SELECT o_custkey, o_orderkey, round(o_totalprice, 4) AS totalprice, rn
            FROM (
              SELECT o_custkey, o_orderkey, o_totalprice,
                     row_number() OVER (PARTITION BY o_custkey
                                        ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
              FROM orders
            ) WHERE rn <= 3
        """,
        "events_daily": """
            SELECT CAST(ts AS DATE) AS day, event_type,
                   count(*) AS n_events, round(sum(value), 4) AS sum_value
            FROM events GROUP BY 1, 2 ORDER BY 1, 2
        """,
        "events_sessionize": """
            WITH marked AS (
              SELECT user_id, ts, event_id,
                     CASE WHEN floor(epoch(ts)) - floor(epoch(lag(ts) OVER w)) > 1800
                          OR lag(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_session
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            ), sess AS (
              SELECT user_id, ts,
                     CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
              FROM marked
            )
            SELECT user_id, session_id, count(*) AS n_events,
                   CAST(floor(epoch(min(ts))) AS BIGINT) AS session_start
            FROM sess GROUP BY user_id, session_id ORDER BY user_id, session_id
        """,
        "doc_token_stats": """
            SELECT doc_id,
                   CASE WHEN length(trim(text)) = 0 THEN 0
                        ELSE len(regexp_split_to_array(lower(trim(text)), '\\s+')) END AS n_tokens,
                   len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]')) AS n_bpe_tokens,
                   round(CASE WHEN length(text) = 0 THEN 0.0
                        ELSE (length(text) - length(regexp_replace(text, '[.,;:!?''"()\\[\\]-]', '', 'g')))
                             / CAST(length(text) AS DOUBLE) END, 6) AS punct_ratio,
                   round(
                     (CASE WHEN (CASE WHEN length(trim(text)) = 0 THEN 0
                            ELSE len(regexp_split_to_array(lower(trim(text)), '\\s+')) END) BETWEEN 10 AND 100000
                           THEN 0.4 ELSE 0.0 END)
                   + (CASE WHEN (CASE WHEN length(text) = 0 THEN 0.0
                            ELSE (length(text) - length(regexp_replace(text, '[.,;:!?''"()\\[\\]-]', '', 'g')))
                                 / CAST(length(text) AS DOUBLE) END) <= 0.2 THEN 0.3 ELSE 0.0 END)
                   + (CASE WHEN (CASE WHEN (CASE WHEN length(trim(text)) = 0 THEN 0
                              ELSE len(regexp_split_to_array(lower(trim(text)), '\\s+')) END) = 0 THEN 0.0
                              ELSE length(regexp_replace(text, '\\s+', '', 'g'))
                                   / CAST((CASE WHEN length(trim(text)) = 0 THEN 0
                                     ELSE len(regexp_split_to_array(lower(trim(text)), '\\s+')) END) AS DOUBLE) END)
                              BETWEEN 2.0 AND 12.0 THEN 0.3 ELSE 0.0 END), 4) AS quality
            FROM documents
        """,
        "doc_langid": f"SELECT doc_id, lang, {langid_sql('text')} AS lang_pred FROM documents",
        "dedup_exact": f"""
            SELECT {FINGERPRINT_MD5_SQL} AS fp,
                   min(doc_id) AS keep_id, count(*) AS n_copies
            FROM documents GROUP BY 1 ORDER BY fp
        """,
        "customers_without_orders": """
            SELECT c_custkey, c_name FROM customer
            WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
            ORDER BY c_custkey
        """,
        "customers_with_orders": """
            SELECT c_custkey, c_mktsegment FROM customer
            WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
            ORDER BY c_custkey
        """,
        "part_type_rollup": """
            SELECT p_type, p_brand, count(*) AS n,
                   round(avg(p_retailprice), 4) AS avg_price
            FROM part GROUP BY ROLLUP (p_type, p_brand)
            ORDER BY p_type, p_brand
        """,
        "order_status_pivot": """
            SELECT o_orderpriority,
                   CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_open,
                   CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_filled,
                   CAST(sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_partial
            FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
        """,
        "distinct_event_types": "SELECT DISTINCT event_type FROM events ORDER BY event_type",
        # flagship extraction over html-wrapped docs: one <p> block per doc,
        # kept iff >= 5 words and zero link density (web/boilerplate.py)
        "extract_pipeline_spans": """
            SELECT printf('doc-%07d', doc_id) AS doc_id,
                   CASE WHEN length(trim(text)) > 0
                             AND len(regexp_split_to_array(trim(text), '\\s+')) >= 5
                        THEN 1 ELSE 0 END AS n_spans
            FROM documents ORDER BY doc_id
        """,
        "supplier_nation_broadcast": """
            SELECT n_name, count(*) AS n_suppliers,
                   round(sum(s_acctbal), 4) AS total_acctbal
            FROM supplier JOIN nation ON s_nationkey = n_nationkey
            GROUP BY n_name ORDER BY n_name
        """,
        "dedup_ngram_jaccard": """
            WITH sh AS (
              SELECT doc_id,
                     unnest(list_distinct(list_transform(
                       range(1, greatest(2, length(text) - 6)),
                       i -> substr(text, i, 8)))) AS g
              FROM documents WHERE doc_id < 200
            ), sizes AS (
              SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id
            ), inter AS (
              SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
              FROM sh a JOIN sh b ON a.g = b.g AND a.doc_id < b.doc_id
              GROUP BY 1, 2
            )
            SELECT id_a, id_b,
                   round(inter / CAST(sa.n + sb.n - inter AS DOUBLE), 6) AS jaccard
            FROM inter
            JOIN sizes sa ON sa.doc_id = id_a
            JOIN sizes sb ON sb.doc_id = id_b
            WHERE round(inter / CAST(sa.n + sb.n - inter AS DOUBLE), 6) >= 0.12
            ORDER BY id_a, id_b
        """,
        "ann_cosine_topk": _ANN_TOPK_SQL,
        # recall@5 == 1.0 verified for planes=32/bands=16 on this corpus, so
        # the LSH result must equal the exact top-k (see ann_lsh_topk)
        "ann_lsh_topk": _ANN_TOPK_SQL,
        "embedding_dups": """
            WITH e AS (
              SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
              FROM embeddings WHERE vec_id < 300
            )
            SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                   round(list_dot_product(a.v, b.v)
                         / (sqrt(list_dot_product(a.v, a.v))
                            * sqrt(list_dot_product(b.v, b.v))), 6) AS cos
            FROM e a JOIN e b ON a.vec_id < b.vec_id
            WHERE round(list_dot_product(a.v, b.v)
                    / (sqrt(list_dot_product(a.v, a.v))
                       * sqrt(list_dot_product(b.v, b.v))), 6) >= 0.4
            ORDER BY id_a, id_b
        """,
        # minhash recall gate: the exact-Jaccard pair set (k=9, t>=0.5) must
        # survive the semi-join against LSH candidates -> equals this SQL
        "dedup_minhash_lsh": """
            WITH sh AS (
              SELECT doc_id,
                     unnest(list_distinct(list_transform(
                       range(1, greatest(2, length(text) - 7)),
                       i -> substr(text, i, 9)))) AS g
              FROM documents WHERE doc_id < 300
            ), sizes AS (
              SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id
            ), inter AS (
              SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
              FROM sh a JOIN sh b ON a.g = b.g AND a.doc_id < b.doc_id
              GROUP BY 1, 2
            )
            SELECT id_a, id_b,
                   round(inter / CAST(sa.n + sb.n - inter AS DOUBLE), 6) AS jaccard
            FROM inter
            JOIN sizes sa ON sa.doc_id = id_a
            JOIN sizes sb ON sb.doc_id = id_b
            WHERE round(inter / CAST(sa.n + sb.n - inter AS DOUBLE), 6) >= 0.5
            ORDER BY id_a, id_b
        """,
        # simhash recall gate: identical-text clones are caught with Hamming 0
        "dedup_simhash": """
            SELECT doc_id AS id_a, doc_id + 1000 AS id_b, CAST(0 AS INTEGER) AS hamming
            FROM documents WHERE doc_id < 300 ORDER BY id_a
        """,
        "extract_cells_table": f"""
            SELECT doc_id, page, count(*) AS n_cells
            FROM '{_FIXTURES}/mini_cells.parquet'
            GROUP BY doc_id, page ORDER BY doc_id, page
        """,
        "xycut_reading_order": f"""
            SELECT doc_id, n_spans, content_md5
            FROM '{_FIXTURES}/mini_spans_xycut.parquet' ORDER BY doc_id
        """,
        "connected_components_page": f"""
            SELECT doc_id, count(*) AS n_components
            FROM '{_FIXTURES}/mini_components.parquet'
            GROUP BY doc_id ORDER BY doc_id
        """,
        "doc_meta_table": f"""
            SELECT doc_id, title, author, n_outline, n_fields
            FROM '{_FIXTURES}/mini_doc_meta.parquet' ORDER BY doc_id
        """,
        # media oracles re-derive decode output + pixel statistics from the
        # pre-encode metadata (the pixel is (seed + 31x + 17y + 101f) % 256)
        "media_decode_meta": f"""
            SELECT media_ref, media_type, width, height, n_frames,
                   TRUE AS ok, CAST(NULL AS VARCHAR) AS error
            FROM '{_FIXTURES}/media_meta.parquet' ORDER BY media_ref
        """,
        "media_image_features": f"""
            WITH xs AS (
              SELECT media_ref, seed, height, unnest(range(0, width)) AS x
              FROM '{_FIXTURES}/media_meta.parquet' WHERE media_type = 'image'
            ), px AS (
              SELECT media_ref,
                     CAST((seed + 31 * x + 17 * unnest(range(0, height))) % 256 AS DOUBLE) AS v
              FROM xs
            )
            SELECT media_ref, round(avg(v), 6) AS mean,
                   round(stddev_pop(v), 6) AS std,
                   round(quantile_cont(v, 0.05), 6) AS p_low,
                   round(quantile_cont(v, 0.95), 6) AS p_high
            FROM px GROUP BY media_ref ORDER BY media_ref
        """,
        "media_frame_sample": f"""
            WITH vids AS (
              SELECT media_ref, seed, width, height,
                     CAST(unnest(range(0, n_frames, 4)) AS INTEGER) AS frame_idx
              FROM '{_FIXTURES}/media_meta.parquet' WHERE media_type = 'video'
            ), xs AS (
              SELECT media_ref, seed, height, frame_idx, unnest(range(0, width)) AS x
              FROM vids
            ), px AS (
              SELECT media_ref, frame_idx,
                     CAST((seed + 31 * x + 17 * unnest(range(0, height))
                           + 101 * frame_idx) % 256 AS DOUBLE) AS v
              FROM xs
            )
            SELECT media_ref, frame_idx, round(avg(v), 6) AS mean
            FROM px GROUP BY media_ref, frame_idx ORDER BY media_ref, frame_idx
        """,
        "training_pipeline_e2e": f"""
            WITH scored AS (
              SELECT doc_id, text,
                     {token_count_sql('text')} AS n_tokens,
                     round({quality_score_sql('text')}, 4) AS quality,
                     {langid_sql('text')} AS lang
              FROM '{_FIXTURES}/training_texts.parquet'
            ), kept AS (
              SELECT * FROM scored WHERE n_tokens >= 5 AND quality >= 0.6
            )
            SELECT doc_id, n_tokens, quality, lang
            FROM kept k
            WHERE NOT EXISTS (
              SELECT 1 FROM kept k2
              WHERE k2.text = k.text AND k2.doc_id < k.doc_id
            )
            ORDER BY doc_id
        """,
    }
