"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship word-count query on sf0.001.
``queries()`` — every implemented operator from SURVEY.md §2.3 plus
the training-data-pipeline extensions (dedup / similarity / text
analysis / multimodal metadata), each as (spark, sf_dir) -> DataFrame.
``oracle_sql()`` — the DuckDB-equivalent ANSI SQL for each query.

Column-name + type parity rules used throughout: every computed
column is aliased identically on both sides; integer outputs are cast
to BIGINT on both sides (DuckDB promotes integer SUMs to HUGEINT and
list lengths to BIGINT, Spark's size() is INT — casting both avoids
spurious schema mismatches); float divisions are rounded to 6 dp *in
the query* on both sides so threshold filters agree bit-for-bit.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from mapreduce_faultolerrant_localityaware_spark.operators import (
    corpus,
    dedup,
    events as events_ops,
    multimodal,
    relational,
    similarity,
    temporal,
    textstats,
)
from mapreduce_faultolerrant_localityaware_spark.operators.wordcount import wordcount_from_text
from mapreduce_faultolerrant_localityaware_spark.sources.scans import scan
from mapreduce_faultolerrant_localityaware_spark import streaming as streaming_ops


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the reference's end-to-end query (tokenize → count →
    sort desc, SURVEY §3.1) over the sf0.001 documents corpus."""
    docs = scan(spark, "/root/testdata/sf0.001", "documents")
    return wordcount_from_text(docs, "text").withColumnRenamed("count", "cnt")


# ---------------------------------------------------------------- queries

def _q_wordcount(spark, sf):
    docs = scan(spark, sf, "documents")
    wc = wordcount_from_text(docs, "text", sort=False)
    return wc.select("word", F.col("count").cast("long").alias("cnt"))


def _q_filter_project(spark, sf):
    li = scan(spark, sf, "lineitem")
    filtered = relational.filter_(
        li,
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1997-01-01")
        & (F.col("l_quantity") > 10),
    )
    return relational.project(
        filtered,
        {
            "l_orderkey": "l_orderkey",
            "l_linenumber": F.col("l_linenumber").cast("long"),
            "revenue": F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")), 6),
            "l_returnflag": "l_returnflag",
        },
    )


def _q_group_agg(spark, sf):
    li = scan(spark, sf, "lineitem").filter(F.col("l_shipdate") <= "1998-09-02")
    return relational.group_agg(
        li,
        ["l_returnflag", "l_linestatus"],
        {
            "sum_qty": ("sum", "l_quantity"),
            "sum_base_price": ("sum", "l_extendedprice"),
            "sum_disc_price": ("sum", F.col("l_extendedprice") * (1 - F.col("l_discount"))),
            "avg_qty": ("avg", "l_quantity"),
            "avg_price": ("avg", "l_extendedprice"),
            "min_qty": ("min", "l_quantity"),
            "max_qty": ("max", "l_quantity"),
            "count_order": ("count_star", None),
        },
    )


def _q_group_agg_distinct(spark, sf):
    orders = scan(spark, sf, "orders")
    return relational.group_agg(
        orders,
        ["o_orderpriority"],
        {"n_cust": ("count_distinct", "o_custkey"), "n_orders": ("count_star", None)},
    )


def _q_sort_limit(spark, sf):
    orders = scan(spark, sf, "orders")
    top = relational.top_k(orders, 100, F.desc("o_totalprice"), F.asc("o_orderkey"))
    return top.select("o_orderkey", "o_totalprice")


def _q_distinct(spark, sf):
    return relational.distinct(scan(spark, sf, "lineitem"), ["l_returnflag", "l_linestatus"])


def _q_union(spark, sf):
    cust = relational.project(
        scan(spark, sf, "customer"),
        {"src": F.lit("customer"), "name": "c_name", "acctbal": "c_acctbal", "nationkey": F.col("c_nationkey").cast("long")},
    )
    supp = relational.project(
        scan(spark, sf, "supplier"),
        {"src": F.lit("supplier"), "name": "s_name", "acctbal": "s_acctbal", "nationkey": F.col("s_nationkey").cast("long")},
    )
    return relational.union(cust, supp)


def _q_join_broadcast(spark, sf):
    cust = scan(spark, sf, "customer")
    nation = scan(spark, sf, "nation")
    region = scan(spark, sf, "region")
    j = relational.join(
        cust, nation, cust.c_nationkey == nation.n_nationkey, broadcast_right=True
    )
    j = relational.join(j, region, j.n_regionkey == region.r_regionkey, broadcast_right=True)
    return relational.group_agg(
        j, ["r_name"], {"n_cust": ("count_star", None), "avg_bal": ("avg", "c_acctbal")}
    )


def _q_join_large(spark, sf):
    orders = scan(spark, sf, "orders")
    li = scan(spark, sf, "lineitem")
    j = relational.join(li, orders, li.l_orderkey == orders.o_orderkey)
    return relational.group_agg(
        j,
        ["o_orderpriority"],
        {
            "revenue": ("sum", F.col("l_extendedprice") * (1 - F.col("l_discount"))),
            "n_items": ("count_star", None),
        },
    )


def _q_join_semi(spark, sf):
    cust = scan(spark, sf, "customer")
    orders = scan(spark, sf, "orders")
    j = relational.join(cust, orders, cust.c_custkey == orders.o_custkey, how="left_semi")
    return relational.group_agg(j, ["c_mktsegment"], {"n_cust": ("count_star", None)})


def _q_join_anti(spark, sf):
    cust = scan(spark, sf, "customer")
    orders = scan(spark, sf, "orders")
    j = relational.join(cust, orders, cust.c_custkey == orders.o_custkey, how="left_anti")
    return j.select("c_custkey", "c_name")


def _q_window_rank(spark, sf):
    from pyspark.sql import Window

    orders = scan(spark, sf, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        orders.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rk")
    )


def _q_window_running(spark, sf):
    from pyspark.sql import Window

    ev = scan(spark, sf, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.select(
        "event_id", "user_id", F.round(F.sum("value").over(w), 6).alias("run_sum")
    )


def _q_rollup(spark, sf):
    li = scan(spark, sf, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(F.sum("l_quantity").alias("sum_qty"), F.count(F.lit(1)).alias("n_rows"))
        .select(
            F.coalesce(F.col("l_returnflag"), F.lit("ALL")).alias("returnflag"),
            F.coalesce(F.col("l_linestatus"), F.lit("ALL")).alias("linestatus"),
            "sum_qty",
            "n_rows",
        )
    )


def _q_events_tumbling(spark, sf):
    ev = scan(spark, sf, "events")
    return (
        ev.groupBy(
            F.date_format(F.date_trunc("hour", F.col("ts")), "yyyy-MM-dd HH:mm:ss").alias("hour"),
            "event_type",
        )
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 6).alias("sum_value"))
    )


def _q_repartition_agg(spark, sf):
    li = relational.repartition(scan(spark, sf, "lineitem"), 8, "l_returnflag")
    return relational.group_agg(li, ["l_returnflag"], {"sum_qty": ("sum", "l_quantity")})


def _q_pivot(spark, sf):
    li = scan(spark, sf, "lineitem")
    out = relational.pivot(li, "l_returnflag", "l_linestatus", ["F", "O"], "sum_qty", "sum", "l_quantity")
    # single-agg pivot names columns by pivot value alone ("F", "O")
    return out.select(
        "l_returnflag",
        F.col("F").alias("f_sum_qty"),
        F.col("O").alias("o_sum_qty"),
    )


def _q_cube(spark, sf):
    li = scan(spark, sf, "lineitem")
    out = relational.cube_agg(
        li, ["l_returnflag", "l_linestatus"], {"sum_qty": ("sum", "l_quantity"), "n_rows": ("count_star", None)}
    )
    return out.select(
        F.coalesce(F.col("l_returnflag"), F.lit("ALL")).alias("returnflag"),
        F.coalesce(F.col("l_linestatus"), F.lit("ALL")).alias("linestatus"),
        "sum_qty",
        "n_rows",
    )


def _q_intersect(spark, sf):
    orders = scan(spark, sf, "orders")
    f = orders.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    o = orders.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    return relational.intersect(f, o)


def _q_except(spark, sf):
    cust = scan(spark, sf, "customer").select(F.col("c_custkey").alias("custkey"))
    with_orders = scan(spark, sf, "orders").select(F.col("o_custkey").alias("custkey")).distinct()
    return relational.except_(cust, with_orders)


def _q_join_part(spark, sf):
    li = scan(spark, sf, "lineitem")
    part = scan(spark, sf, "part").filter(F.col("p_size") < 20)
    j = relational.join(li, part, li.l_partkey == part.p_partkey, broadcast_right=True)
    return relational.group_agg(
        j,
        ["p_brand"],
        {"revenue": ("sum", F.col("l_extendedprice") * (1 - F.col("l_discount"))), "n_items": ("count_star", None)},
    )


def _q_subquery_above_avg(spark, sf):
    orders = scan(spark, sf, "orders")
    cust_avg = orders.groupBy("o_custkey").agg(F.avg("o_totalprice").alias("cust_avg"))
    j = orders.join(cust_avg, "o_custkey").filter(F.col("o_totalprice") > F.col("cust_avg"))
    return relational.group_agg(j, ["o_orderpriority"], {"n_above": ("count_star", None)})


def _q_events_json(spark, sf):
    ev = events_ops.extract_json_prop(scan(spark, sf, "events"))
    return relational.group_agg(
        ev, ["event_type"], {"sum_k": ("sum", "k"), "n_k": ("count", "k")}
    )


def _q_window_lag(spark, sf):
    ev = events_ops.with_lag(scan(spark, sf, "events"))
    return ev.select("event_id", "user_id", F.round(F.col("prev_value"), 6).alias("prev_value"))


def _q_sessionize(spark, sf):
    ev = events_ops.sessionize(scan(spark, sf, "events"), gap_minutes=30)
    return ev.select("event_id", "user_id", "session_id")


def _q_minhash_signatures(spark, sf):
    return dedup.minhash_signatures(scan(spark, sf, "documents"))


# ---- text analysis ----

def _q_text_tokens(spark, sf):
    out = textstats.token_stats(scan(spark, sf, "documents"))
    return out.select(
        "doc_id",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.col("n_ws_tokens").cast("long").alias("n_ws_tokens"),
        F.col("n_chars_m").cast("long").alias("n_chars_m"),
    )


def _q_token_bpe(spark, sf):
    return textstats.bpe_token_stats(scan(spark, sf, "documents"))


def _q_text_quality(spark, sf):
    out = textstats.quality_score(scan(spark, sf, "documents"))
    return out.withColumn("n_tokens", F.col("n_tokens").cast("long"))


def _q_lang_id(spark, sf):
    out = textstats.lang_id(scan(spark, sf, "documents"))
    return out.withColumn("marker_hits", F.col("marker_hits").cast("long"))


def _q_fingerprint(spark, sf):
    return textstats.fingerprint(scan(spark, sf, "documents"))


def _q_scrub_text(spark, sf):
    return textstats.scrub_text(scan(spark, sf, "documents"))


def _q_sample_stratified(spark, sf):
    return relational.sample_stratified(
        scan(spark, sf, "orders"),
        "o_orderpriority",
        {"1-URGENT": 0.5, "5-LOW": 0.05},
        key_col="o_orderkey",
        default_rate=0.1,
    ).select("o_orderkey", "o_orderpriority", "o_totalprice")


def _q_vocab_top_tokens(spark, sf):
    """Per-language vocabulary heavy hitters: lang-ID → token counts →
    top-5 per language (window top-k, total tiebreak)."""
    from pyspark.sql import Window

    from mapreduce_faultolerrant_localityaware_spark.functions.text import tokens as tokens_fn

    docs = scan(spark, sf, "documents")
    lang = textstats.lang_id(docs).select("doc_id", "lang_pred")
    toks = docs.select(
        "doc_id", F.explode(tokens_fn("text", lowercase=True)).alias("token")
    )
    counts = (
        toks.join(lang, "doc_id")
        .groupBy("lang_pred", "token")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.partitionBy("lang_pred").orderBy(F.desc("n"), F.asc("token"))
    return (
        counts.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= 5)
    )


def _q_repetition_ratio(spark, sf):
    return textstats.repetition_ratio(scan(spark, sf, "documents"))


def _q_embedding_norms(spark, sf):
    return similarity.embedding_norms(scan(spark, sf, "embeddings"))


def _q_tfidf_top_terms(spark, sf):
    return corpus.tfidf_top_terms(scan(spark, sf, "documents"), k=3)


def _q_bigram_counts(spark, sf):
    return corpus.bigram_counts(scan(spark, sf, "documents"), k=100)


def _q_contamination(spark, sf):
    return corpus.contamination_check(scan(spark, sf, "documents"))


def _q_pack_sequences(spark, sf):
    return corpus.pack_sequences(scan(spark, sf, "documents"), budget=512, n_streams=8)


def _q_mixture_report(spark, sf):
    return corpus.mixture_report(scan(spark, sf, "documents"))


def _q_lang_confusion(spark, sf):
    """Lang-ID evaluation against the corpus' ground-truth lang column:
    the (truth, predicted) confusion counts an eval harness reports."""
    docs = scan(spark, sf, "documents")
    pred = textstats.lang_id(docs).select("doc_id", "lang_pred")
    return (
        docs.select("doc_id", "lang")
        .join(pred, "doc_id")
        .groupBy("lang", "lang_pred")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("lang", "lang_pred")
    )


# ---- dedup ----

def _q_dedup_exact(spark, sf):
    out = dedup.dedup_exact(scan(spark, sf, "documents"))
    return out.withColumn("n_dups", F.col("n_dups").cast("long"))


def _q_dedup_minhash(spark, sf):
    return dedup.dedup_minhash_candidates(scan(spark, sf, "documents"))


def _q_dedup_simhash(spark, sf):
    return dedup.simhash(scan(spark, sf, "documents"))


def _q_dedup_simhash_pairs(spark, sf):
    return dedup.dedup_simhash_pairs(scan(spark, sf, "documents"), max_hamming=3)


def _q_dedup_ngram_jaccard(spark, sf):
    return dedup.dedup_ngram_jaccard(scan(spark, sf, "documents"), threshold=0.8)


def _q_dedup_embedding(spark, sf):
    return dedup.dedup_embedding_cosine(scan(spark, sf, "embeddings"), threshold=0.3)


def _q_lsh_bucket_stats(spark, sf):
    out = dedup.lsh_bucket_stats(scan(spark, sf, "documents"))
    return out.select(
        "band",
        F.col("n_buckets").cast("long").alias("n_buckets"),
        F.col("max_bucket").cast("long").alias("max_bucket"),
        F.col("docs_in_buckets").cast("long").alias("docs_in_buckets"),
        F.col("n_overflow").cast("long").alias("n_overflow"),
    )


# ---- similarity search ----

def _q_ann_bruteforce(spark, sf):
    emb = scan(spark, sf, "embeddings")
    queries_df = emb.filter(F.col("vec_id") < 8)
    return similarity.ann_bruteforce(emb, queries_df, k=5)


def _q_ann_ivf(spark, sf):
    emb = scan(spark, sf, "embeddings")
    queries_df = emb.filter(F.col("vec_id") < 8)
    return similarity.ann_ivf(emb, queries_df, k=5)


def _q_ann_ivf_kmeans(spark, sf):
    # real fitted quantizer — no precomputed label column used.  No
    # SQL oracle (iterative k-means isn't SQL-expressible); the driver
    # records a rows-only check and tests/test_ann_kmeans.py holds the
    # recall>=0.9-vs-bruteforce bar.
    emb = scan(spark, sf, "embeddings")
    queries_df = emb.filter(F.col("vec_id") < 8)
    return similarity.ann_ivf_kmeans(emb, queries_df, k=5, n_cells=10, nprobe=2)


# ---- multimodal (binary-column plumbing; blob = utf8 bytes of text) ----

def _q_multimodal_meta(spark, sf):
    docs = scan(spark, sf, "documents").select(
        F.col("doc_id").alias("media_id"), F.encode(F.col("text"), "UTF-8").alias("blob")
    )
    return multimodal.attach_media_meta(docs).select("media_id", "byte_len", "sha256")


# ---- streaming (bounded replay under the batch correctness gate) ----

def _q_streaming_wordcount(spark, sf):
    # full Structured Streaming run (file source → stateful agg →
    # foreachBatch sink), then the materialized final state is what
    # the batch oracle must equal.
    stream = streaming_ops.stream_table(spark, sf, "documents")
    counts = streaming_ops.streaming_wordcount(stream, text_col="text")
    return streaming_ops.run_to_batch(counts, spark)


def _q_streaming_tumbling(spark, sf):
    stream = streaming_ops.stream_table(spark, sf, "events")
    win = streaming_ops.windowed_event_counts(stream)  # 1h tumbling + watermark
    out = streaming_ops.run_to_batch(win, spark)
    return out.select(
        F.date_format("window_start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
        F.date_format("window_end", "yyyy-MM-dd HH:mm:ss").alias("window_end"),
        "event_type",
        "n_events",
        F.round("sum_value", 6).alias("sum_value"),
    )


def _q_streaming_sliding(spark, sf):
    """Sliding-window streaming counts under the batch oracle gate:
    every event lands in window/slide = 2 overlapping windows; the
    oracle reproduces the epoch-aligned window grid with an unnested
    offset join."""
    stream = streaming_ops.stream_table(spark, sf, "events")
    win = streaming_ops.sliding_event_counts(
        stream, window_len="30 minutes", slide="15 minutes", watermark="1 hour"
    )
    out = streaming_ops.run_to_batch(win, spark)
    return out.select(
        F.date_format("window_start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
        F.date_format("window_end", "yyyy-MM-dd HH:mm:ss").alias("window_end"),
        "event_type",
        "n_events",
    )


def _q_streaming_dedup_keys(spark, sf):
    """Watermarked streaming dedup under the oracle gate: output only
    the dedup KEY columns so the result (the distinct key set) is
    deterministic regardless of which arrival survives."""
    stream = streaming_ops.stream_table(spark, sf, "events")
    deduped = stream.withWatermark("ts", "1 hour").dropDuplicatesWithinWatermark(
        ["user_id", "event_type"]
    )
    out = streaming_ops.run_to_batch(
        deduped.select("user_id", "event_type"), spark, output_mode="append"
    )
    return out.distinct()  # batches may re-see keys across watermark expiry


def _q_streaming_enrich(spark, sf):
    """Stream-static broadcast join under the batch oracle gate:
    append-mode (stateless) — each micro-batch's joined rows
    accumulate; the union over batches must equal the batch join."""
    stream = streaming_ops.stream_table(spark, sf, "events")
    cust = scan(spark, sf, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_name", "c_mktsegment"
    )
    joined = streaming_ops.enrich_stream(stream, cust, "user_id", how="inner").select(
        "event_id", "user_id", "event_type", "c_name", "c_mktsegment"
    )
    return streaming_ops.run_to_batch(joined, spark, output_mode="append")


def _q_pipeline_clean(spark, sf):
    """Composite training-data cleaning pipeline — the operators a
    100 TB corpus pass actually chains: quality-filter → exact-dedup
    (keep one representative) → language-ID, one row per surviving
    doc.  Every stage is the already-oracle-checked operator; this
    entry checks their COMPOSITION."""
    docs = scan(spark, sf, "documents")
    quality = textstats.quality_score(docs).filter(F.col("quality") >= 0.5)
    keep = dedup.dedup_exact(docs).select(F.col("keep_id").alias("doc_id"))
    lang = textstats.lang_id(docs)
    return (
        quality.join(keep, "doc_id")
        .join(lang, "doc_id")
        .select(
            "doc_id",
            F.col("n_tokens").cast("long").alias("n_tokens"),
            "quality",
            "lang_pred",
        )
    )


# ---- temporal joins ----

def _q_resample_ffill(spark, sf):
    return temporal.resample_ffill(scan(spark, sf, "events"))


def _q_asof_join(spark, sf):
    ev = scan(spark, sf, "events")
    clicks = ev.filter(F.col("event_type") == "click").select("event_id", "user_id", "ts")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        F.col("event_id").alias("prev_purchase_id"),
        F.col("value").alias("prev_value"),
    )
    j = temporal.asof_join(
        clicks, purchases, on=["user_id"], payload=["prev_purchase_id", "prev_value"]
    )
    return j.select(
        "event_id", "user_id", "prev_purchase_id", F.round("prev_value", 6).alias("prev_value")
    )


def _q_range_join(spark, sf):
    orders = scan(spark, sf, "orders")
    bands = spark.createDataFrame(
        [("low", 0.0, 100000.0), ("mid", 100000.0, 300000.0), ("high", 300000.0, 1000000.0)],
        ["band", "lo", "hi"],
    )
    j = temporal.range_join(orders, bands, "o_totalprice", "lo", "hi")
    return relational.group_agg(
        j,
        ["band"],
        {"n_orders": ("count_star", None), "sum_price": ("sum", "o_totalprice")},
    ).withColumn("sum_price", F.round("sum_price", 2))


# ---- grouping sets / percentiles / arg-extremes / analytic windows ----

def _q_grouping_sets(spark, sf):
    scan(spark, sf, "lineitem").createOrReplaceTempView("li_gsets")
    return spark.sql(
        """
        SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
               coalesce(l_linestatus, 'ALL') AS linestatus,
               sum(l_quantity) AS sum_qty, count(*) AS n_rows
        FROM li_gsets GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        """
    )


def _q_percentiles(spark, sf):
    li = scan(spark, sf, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.percentile("l_quantity", 0.25), 6).alias("p25"),
        F.round(F.percentile("l_quantity", 0.5), 6).alias("p50"),
        F.round(F.percentile("l_quantity", 0.75), 6).alias("p75"),
        F.round(F.percentile("l_extendedprice", 0.9), 6).alias("price_p90"),
    )


def _q_minmax_by(spark, sf):
    orders = scan(spark, sf, "orders")
    tiebreak = F.struct(F.col("o_totalprice"), F.col("o_orderkey"))
    return orders.groupBy("o_orderpriority").agg(
        F.max_by("o_orderkey", tiebreak).alias("top_orderkey"),
        F.min_by("o_orderkey", tiebreak).alias("bottom_orderkey"),
    )


def _q_window_ntile(spark, sf):
    from pyspark.sql import Window

    orders = scan(spark, sf, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return orders.select(
        "o_orderkey",
        "o_orderpriority",
        F.ntile(4).over(w).cast("long").alias("quartile"),
        F.dense_rank().over(w).cast("long").alias("drank"),
        F.round(F.percent_rank().over(w), 6).alias("prank"),
        F.round(F.cume_dist().over(w), 6).alias("cdist"),
    )


# ---- scalar function packs (string / date / math / array) ----

def _q_string_funcs(spark, sf):
    cust = scan(spark, sf, "customer")
    return cust.select(
        "c_custkey",
        F.upper("c_name").alias("uname"),
        F.length("c_name").cast("long").alias("name_len"),
        F.substring("c_name", 1, 5).alias("prefix"),
        F.concat_ws("|", "c_mktsegment", "c_name").alias("seg_name"),
        F.replace(F.col("c_name"), F.lit("Customer"), F.lit("C")).alias("short_name"),
        F.lpad(F.col("c_custkey").cast("string"), 8, "0").alias("padded_key"),
        F.regexp_extract("c_name", r"([0-9]+)", 1).alias("digits"),
        F.col("c_name").like("%1%").alias("has_one"),
    )


def _q_date_funcs(spark, sf):
    orders = scan(spark, sf, "orders")
    return orders.select(
        "o_orderkey",
        F.year("o_orderdate").cast("long").alias("yr"),
        F.month("o_orderdate").cast("long").alias("mo"),
        F.dayofmonth("o_orderdate").cast("long").alias("dom"),
        F.quarter("o_orderdate").cast("long").alias("qtr"),
        (F.dayofweek("o_orderdate") - 1).cast("long").alias("dow"),
        F.date_trunc("month", "o_orderdate").cast("date").alias("month_start"),
        F.last_day("o_orderdate").alias("month_end"),
        F.datediff(F.lit("2002-01-01").cast("date"), F.col("o_orderdate")).cast("long").alias("days_to_2002"),
    )


def _q_math_funcs(spark, sf):
    li = scan(spark, sf, "lineitem")
    return li.select(
        "l_orderkey",
        F.col("l_linenumber").cast("long").alias("l_linenumber"),
        F.round(F.abs(F.col("l_discount") - 0.05), 6).alias("disc_dev"),
        F.floor("l_extendedprice").cast("long").alias("price_floor"),
        F.ceil("l_quantity").cast("long").alias("qty_ceil"),
        F.round(F.sqrt("l_extendedprice"), 6).alias("price_sqrt"),
        F.round(F.log("l_extendedprice"), 6).alias("price_ln"),
        F.round(F.pow("l_quantity", F.lit(2.0)), 6).alias("qty_sq"),
    )


def _q_array_funcs(spark, sf):
    from mapreduce_faultolerrant_localityaware_spark.functions import vectors

    emb = scan(spark, sf, "embeddings")
    v = F.col("embedding").cast("array<double>")
    return emb.select(
        "vec_id",
        F.size("embedding").cast("long").alias("dims"),
        F.round(vectors.l2_norm(F.col("embedding")), 6).alias("norm"),
        F.round(F.aggregate(F.slice(v, 1, 3), F.lit(0.0), lambda a, x: a + x), 6).alias("head3_sum"),
        F.round(F.array_max(v), 6).alias("max_elem"),
        F.round(F.array_min(v), 6).alias("min_elem"),
    )


def _q_posexplode_tokens(spark, sf):
    from mapreduce_faultolerrant_localityaware_spark.functions.text import tokens as tok_expr

    docs = scan(spark, sf, "documents")
    return docs.select(
        "doc_id", F.posexplode(tok_expr(F.col("text"))).alias("pos", "word")
    ).withColumn("pos", F.col("pos").cast("long"))


def _q_conditional_agg(spark, sf):
    li = scan(spark, sf, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count(F.when(F.col("l_quantity") > 25, 1)).alias("n_highqty"),
        F.round(
            F.sum(
                F.when(
                    F.col("l_discount") > 0.05,
                    F.col("l_extendedprice") * (1 - F.col("l_discount")),
                ).otherwise(0.0)
            ),
            6,
        ).alias("disc_rev"),
        F.round(F.avg(F.when(F.col("l_quantity") > 25, 1.0).otherwise(0.0)), 6).alias("highqty_frac"),
    )


def _q_corr_subquery(spark, sf):
    li = scan(spark, sf, "lineitem")
    part = scan(spark, sf, "part").filter(F.col("p_size") < 10)
    lim = li.groupBy("l_partkey").agg((F.avg("l_quantity") * 0.2).alias("qty_lim"))
    j = li.join(part, li.l_partkey == part.p_partkey).join(lim, "l_partkey")
    out = j.filter(F.col("l_quantity") < F.col("qty_lim"))
    return out.agg(F.round(F.sum("l_extendedprice") / 7.0, 6).alias("avg_yearly"))


def _q_scalar_subquery(spark, sf):
    """Scalar subquery in a projection — planned as a one-row broadcast
    (Subquery scalar-subquery node), not a join or a driver collect."""
    scan(spark, sf, "orders").createOrReplaceTempView("orders_ssq")
    return spark.sql(
        """
        SELECT o_orderkey,
               round(o_totalprice / (SELECT max(o_totalprice) FROM orders_ssq), 6) AS price_frac
        FROM orders_ssq
        """
    )


def _q_null_funcs(spark, sf):
    """Null-handling scalar pack: nullif / coalesce / nvl2-style CASE,
    and null-aware aggregation (count skips nulls, count(*) doesn't)."""
    li = scan(spark, sf, "lineitem")
    with_nulls = li.select(
        "l_orderkey",
        F.col("l_linenumber").cast("long").alias("l_linenumber"),
        F.nullif(F.col("l_discount"), F.lit(0.0)).alias("disc_or_null"),
    )
    return with_nulls.groupBy("l_orderkey").agg(
        F.count("disc_or_null").alias("n_discounted"),
        F.count(F.lit(1)).alias("n_lines"),
        F.round(F.sum(F.coalesce(F.col("disc_or_null"), F.lit(0.0))), 6).alias("sum_disc"),
    )


def _q_array_agg(spark, sf):
    """Deterministic array aggregation: sort_array(collect_set(...)) —
    collect_list/collect_set alone are order-nondeterministic across
    partitions; the sort makes the result engine-portable."""
    orders = scan(spark, sf, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.sort_array(F.collect_set("o_orderstatus")).alias("statuses"),
        F.count(F.lit(1)).alias("n_orders"),
    )


def _q_unpivot(spark, sf):
    """Wide → long melt (DataFrame.unpivot / SQL stack)."""
    li = scan(spark, sf, "lineitem").filter(F.col("l_linenumber") == 1)
    out = li.unpivot(
        ["l_orderkey"],
        ["l_quantity", "l_extendedprice", "l_discount"],
        "metric",
        "val",
    )
    return out.select("l_orderkey", "metric", F.round("val", 6).alias("val"))


def _q_sample_hash(spark, sf):
    """Deterministic ~10% sample: md5-bucket filter on the key — the
    scale-safe sampling pattern (engine-portable, reproducible, no RNG
    state; plain .sample() is neither cross-engine nor stable)."""
    orders = scan(spark, sf, "orders")
    bucket = F.conv(F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 8), 16, 10) % 100
    return orders.filter(bucket < 10).select("o_orderkey", "o_custkey", "o_totalprice")


def _q_window_first_last(spark, sf):
    from pyspark.sql import Window

    ev = scan(spark, sf, "events")
    order = [F.asc("ts"), F.asc("event_id")]
    w_full = (
        Window.partitionBy("user_id")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    w_seq = Window.partitionBy("user_id").orderBy(*order)
    return ev.select(
        "event_id",
        "user_id",
        F.round(F.first("value").over(w_full), 6).alias("first_val"),
        F.round(F.last("value").over(w_full), 6).alias("last_val"),
        F.round(F.lead("value").over(w_seq), 6).alias("next_val"),
    )


def _q_window_range_frame(spark, sf):
    """Rolling 10-minute sum per user — a RANGE frame over event-time
    epoch seconds (value-based frame, deterministic under ts ties)."""
    from pyspark.sql import Window

    ev = scan(spark, sf, "events").withColumn(
        "epoch_us", F.unix_micros(F.col("ts").cast("timestamp"))
    )
    w = Window.partitionBy("user_id").orderBy("epoch_us").rangeBetween(-600_000_000, 0)
    return ev.select(
        "event_id", "user_id", F.round(F.sum("value").over(w), 6).alias("rolling_10m")
    )


def _q_window_rows_frame(spark, sf):
    """Moving average over a 3-row frame per user — the ROWS-frame
    companion to the RANGE frame query (deterministic under the total
    (ts, event_id) order)."""
    from pyspark.sql import Window

    ev = scan(spark, sf, "events").withColumn(
        "epoch_us", F.unix_micros(F.col("ts").cast("timestamp"))
    )
    w = Window.partitionBy("user_id").orderBy("epoch_us", "event_id").rowsBetween(-2, 0)
    return ev.select(
        "event_id", "user_id", F.round(F.avg("value").over(w), 6).alias("mov_avg3")
    )


def _q_struct_funcs(spark, sf):
    """Nested-struct pack: per-customer sorted array of (price, key)
    structs — array_sort over structs is lexicographic, so the head of
    the sorted array is the (min price, tiebreak min key) order.
    Output stays flat for the oracle; the nesting is the point."""
    orders = scan(spark, sf, "orders")
    arr = F.array_sort(F.collect_list(F.struct("o_totalprice", "o_orderkey")))
    return (
        orders.groupBy("o_custkey")
        .agg(arr.alias("arr"))
        .select(
            "o_custkey",
            F.size("arr").cast("long").alias("n_orders"),
            F.round(F.col("arr")[0]["o_totalprice"], 6).alias("min_price"),
            F.col("arr")[0]["o_orderkey"].alias("min_price_key"),
            F.round(F.element_at("arr", -1)["o_totalprice"], 6).alias("max_price"),
        )
    )


def _q_map_funcs(spark, sf):
    """Map-typed per-user event profile: map_from_entries over sorted
    (event_type, n) structs, probed with element_at — the nested
    map-column surface; outputs flattened for the oracle."""
    ev = scan(spark, sf, "events")
    per = ev.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("n"))
    m = per.groupBy("user_id").agg(
        F.map_from_entries(
            F.array_sort(F.collect_list(F.struct("event_type", "n")))
        ).alias("profile")
    )
    return m.select(
        "user_id",
        F.size("profile").cast("long").alias("n_types"),
        F.coalesce(F.element_at("profile", "click"), F.lit(0)).alias("n_click"),
        F.coalesce(F.element_at("profile", "purchase"), F.lit(0)).alias("n_purchase"),
        F.coalesce(F.element_at("profile", "error"), F.lit(0)).alias("n_error"),
    )


def _q_tpch_q18(spark, sf):
    """TPC-H Q18 shape (large-volume customers): agg + HAVING + join
    back + top-k."""
    li = scan(spark, sf, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .filter(F.col("sum_qty") > 250)
    )
    orders = scan(spark, sf, "orders")
    cust = scan(spark, sf, "customer")
    j = big.join(orders, big.l_orderkey == orders.o_orderkey).join(
        cust, orders.o_custkey == cust.c_custkey
    )
    out = j.select("c_name", "o_orderkey", "o_totalprice", "sum_qty")
    return relational.top_k(out, 100, F.desc("o_totalprice"), F.asc("o_orderkey"))


def _q_multimodal_decode(spark, sf):
    """Arrow-batched decode over binary media columns (mapInPandas).
    The stub decode is sha256-derived, hence exactly reproducible by
    the SQL oracle — full value parity for the Python-UDF path."""
    docs = scan(spark, sf, "documents").select(
        F.col("doc_id").alias("media_id"), F.encode(F.col("text"), "UTF-8").alias("blob")
    )
    out = multimodal.decode_media(docs)
    return out.select(
        "media_id",
        F.col("width").cast("long").alias("width"),
        F.col("height").cast("long").alias("height"),
        F.round(F.col("features")[0], 6).alias("f0"),
        F.round(F.col("features")[1], 6).alias("f1"),
    )


def _q_tpch_q5(spark, sf):
    """TPC-H Q5 shape (local supplier volume): 6-table join with an
    extra non-key equality (customer and supplier in the same nation)."""
    cust = scan(spark, sf, "customer")
    orders = scan(spark, sf, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1997-01-01")
    )
    li = scan(spark, sf, "lineitem")
    supp = scan(spark, sf, "supplier")
    nation = scan(spark, sf, "nation")
    region = scan(spark, sf, "region").filter(F.col("r_name") == "ASIA")
    j = (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, orders.o_orderkey == li.l_orderkey)
        .join(supp, (li.l_suppkey == supp.s_suppkey) & (cust.c_nationkey == supp.s_nationkey))
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    )
    return j.groupBy("n_name").agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 6).alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


def _q_tpch_q6(spark, sf):
    """TPC-H Q6 (forecast revenue): pure scan-side filters + one global
    sum — the predicate-pushdown showcase (every filter reaches the
    parquet scan; no shuffle beyond the final 1-row agg)."""
    li = scan(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1997-01-01")
        & (F.col("l_discount") >= 0.04)
        & (F.col("l_discount") <= 0.06)
        & (F.col("l_quantity") < 24)
    )
    return li.agg(
        F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


def _q_tpch_q4(spark, sf):
    """TPC-H Q4 shape (order priority checking): EXISTS → left-semi
    join, then count by priority.  (The reference schema has no
    l_commitdate/l_receiptdate; the existence predicate here is
    'some lineitem shipped after the order date'.)"""
    orders = scan(spark, sf, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1996-07-01")
    )
    li = scan(spark, sf, "lineitem")
    late = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey) & (li.l_shipdate > orders.o_orderdate),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


def _q_tpch_q7(spark, sf):
    """TPC-H Q7 shape (volume shipping between two nations): double
    nation join (supplier side + customer side), year rollup."""
    li = scan(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    orders = scan(spark, sf, "orders")
    cust = scan(spark, sf, "customer")
    supp = scan(spark, sf, "supplier")
    n1 = scan(spark, sf, "nation").select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    n2 = scan(spark, sf, "nation").select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_name").alias("cust_nation")
    )
    pair = (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2") | (
        F.col("supp_nation") == "NATION_2"
    ) & (F.col("cust_nation") == "NATION_1")
    j = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(n1), supp.s_nationkey == F.col("s_nkey"))
        .join(F.broadcast(n2), cust.c_nationkey == F.col("c_nkey"))
        .filter(pair)
    )
    return (
        j.groupBy("supp_nation", "cust_nation", F.year("l_shipdate").cast("long").alias("l_year"))
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


def _q_tpch_q10(spark, sf):
    """TPC-H Q10 (returned-item reporting): 4-table join, revenue per
    customer, top 20."""
    orders = scan(spark, sf, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1996-04-01")
    )
    li = scan(spark, sf, "lineitem").filter(F.col("l_returnflag") == "R")
    cust = scan(spark, sf, "customer")
    nation = scan(spark, sf, "nation")
    j = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
    )
    agg = j.groupBy("c_custkey", "c_name", "c_acctbal", "n_name").agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias("revenue")
    )
    return relational.top_k(agg, 20, F.desc("revenue"), F.asc("c_custkey"))


def _q_tpch_q14(spark, sf):
    """TPC-H Q14 (promo revenue ratio): join + conditional-sum ratio,
    one output row."""
    li = scan(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-03-01") & (F.col("l_shipdate") < "1996-04-01")
    )
    part = scan(spark, sf, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    j = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    return j.agg(
        F.round(
            F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0)) * 100.0 / F.sum(rev), 6
        ).alias("promo_revenue_pct")
    )


def _q_tpch_q19(spark, sf):
    """TPC-H Q19 shape (discounted revenue, OR'd bracket predicates):
    equi-join on partkey with disjunctive residual filters — the
    OR-predicate-pushdown exercise."""
    li = scan(spark, sf, "lineitem")
    part = scan(spark, sf, "part")
    j = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    brackets = (
        ((F.col("p_brand") == "Brand#11") & F.col("l_quantity").between(1, 11))
        | ((F.col("p_brand") == "Brand#22") & F.col("l_quantity").between(10, 20))
        | ((F.col("p_brand") == "Brand#33") & F.col("l_quantity").between(20, 30))
    )
    return j.filter(brackets).agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


def _q_tpch_q3(spark, sf):
    """TPC-H Q3 shape (shipping priority): 3-way join + agg + top-k."""
    cust = scan(spark, sf, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = scan(spark, sf, "orders").filter(F.col("o_orderdate") < "1998-01-01")
    li = scan(spark, sf, "lineitem").filter(F.col("l_shipdate") > "1998-01-01")
    j = li.join(orders, li.l_orderkey == orders.o_orderkey).join(
        cust, orders.o_custkey == cust.c_custkey
    )
    agg = j.groupBy("l_orderkey", "o_orderdate", "o_orderpriority").agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 6).alias("revenue")
    )
    return relational.top_k(agg, 10, F.desc("revenue"), F.asc("l_orderkey"))


def _q_tpch_q1(spark, sf):
    """TPC-H Q1 (pricing summary report): the canonical wide-agg scan —
    8 aggregates over 2 grouping keys, one pass, partial-agg map side.
    Large double sums rounded to 2 dp (summation-order noise at ~1e9)."""
    li = scan(spark, sf, "lineitem").filter(F.col("l_shipdate") <= "2001-06-01")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(charge), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def _q_tpch_q2(spark, sf):
    """TPC-H Q2 shape (min-cost supplier): the schema has no partsupp
    table (reference generates none), so lineitem is the part-supplier
    link — unit cost = min(l_extendedprice/l_quantity) per (part,
    supplier).  Correlated-min decorrelated into a per-part min join;
    min is order-independent so the double equality is exact on both
    engines."""
    li = scan(spark, sf, "lineitem")
    ps = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost")
    )
    nation = scan(spark, sf, "nation")
    region = scan(spark, sf, "region").filter(F.col("r_name") == "EUROPE")
    esupp = (
        scan(spark, sf, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    eps = ps.join(F.broadcast(esupp), ps.l_suppkey == F.col("s_suppkey"))
    minc = eps.groupBy(F.col("l_partkey").alias("mc_partkey")).agg(
        F.min("unit_cost").alias("min_cost")
    )
    best = eps.join(
        minc,
        (eps.l_partkey == F.col("mc_partkey")) & (eps.unit_cost == F.col("min_cost")),
    )
    part = scan(spark, sf, "part").filter(F.col("p_size") < 20)
    out = best.join(F.broadcast(part), best.l_partkey == part.p_partkey).select(
        "s_acctbal", "s_name", "n_name", "p_partkey", "p_name",
        F.round("unit_cost", 6).alias("unit_cost"),
    )
    return relational.top_k(
        out, 100, F.desc("s_acctbal"), F.asc("n_name"), F.asc("s_name"), F.asc("p_partkey")
    )


def _q_tpch_q8(spark, sf):
    """TPC-H Q8 (national market share): 7-table join, share-of-sum
    ratio per order year."""
    part = scan(spark, sf, "part").filter(F.col("p_type") == "STANDARD")
    orders = scan(spark, sf, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") <= "1997-12-31")
    )
    li = scan(spark, sf, "lineitem")
    cust = scan(spark, sf, "customer")
    supp = scan(spark, sf, "supplier")
    n1 = scan(spark, sf, "nation").select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_regionkey").alias("c_rkey")
    )
    n2 = scan(spark, sf, "nation").select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    region = scan(spark, sf, "region").filter(F.col("r_name") == "EUROPE")
    j = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), cust.c_nationkey == F.col("c_nkey"))
        .join(F.broadcast(region), F.col("c_rkey") == region.r_regionkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(n2), supp.s_nationkey == F.col("s_nkey"))
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        j.select(F.year("o_orderdate").cast("long").alias("o_year"),
                 vol.alias("volume"), F.col("supp_nation"))
        .groupBy("o_year")
        .agg(
            F.round(
                F.sum(F.when(F.col("supp_nation") == "NATION_1", F.col("volume")).otherwise(0.0))
                / F.sum("volume"),
                6,
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


def _q_tpch_q9(spark, sf):
    """TPC-H Q9 shape (product-type profit): no ps_supplycost in the
    schema — supply cost modeled as 0.6 * p_retailprice, keeping the
    profit-expression + nation/year rollup shape."""
    part = scan(spark, sf, "part").filter(F.col("p_name").like("%widget%"))
    li = scan(spark, sf, "lineitem")
    supp = scan(spark, sf, "supplier")
    orders = scan(spark, sf, "orders")
    nation = scan(spark, sf, "nation")
    amount = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - 0.6 * F.col("p_retailprice") * F.col("l_quantity")
    )
    j = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
    )
    return (
        j.select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
            amount.alias("amount"),
        )
        .groupBy("nation", "o_year")
        .agg(F.round(F.sum("amount"), 2).alias("sum_profit"))
        .orderBy("nation", "o_year")
    )


def _q_tpch_q11(spark, sf):
    """TPC-H Q11 shape (important stock): per-part value with a
    HAVING-vs-global-scalar threshold (parts worth > 2x the mean part value - scale-invariant) —
    the scalar rides a 1-row broadcast cross join, never a driver
    collect."""
    nation = scan(spark, sf, "nation").filter(F.col("n_name") == "NATION_1")
    supp = scan(spark, sf, "supplier").join(
        F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")
    )
    li = scan(spark, sf, "lineitem")
    val = li.join(F.broadcast(supp), li.l_suppkey == F.col("s_suppkey")).select(
        "l_partkey", (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("v")
    )
    val.createOrReplaceTempView("q11_val")
    return spark.sql(
        """
        SELECT l_partkey AS p_key, round(sum(v), 2) AS value
        FROM q11_val GROUP BY 1
        HAVING sum(v) > (SELECT 2.0 * sum(v) / count(DISTINCT l_partkey) FROM q11_val)
        ORDER BY value DESC, p_key ASC
        """
    )


def _q_tpch_q12(spark, sf):
    """TPC-H Q12 shape (shipping-priority lateness): no l_shipmode /
    l_receiptdate in the schema — late = shipped >30 days after the
    order date; counts split by order priority class."""
    li = scan(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1997-01-01")
    )
    orders = scan(spark, sf, "orders")
    j = li.join(orders, li.l_orderkey == orders.o_orderkey)
    bucket = F.when(
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS"), "LATE"
    ).otherwise("ONTIME")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        j.select(bucket.alias("ship_bucket"), high.alias("is_high"))
        .groupBy("ship_bucket")
        .agg(
            F.count(F.when(F.col("is_high"), 1)).alias("high_line_count"),
            F.count(F.when(~F.col("is_high"), 1)).alias("low_line_count"),
        )
        .orderBy("ship_bucket")
    )


def _q_tpch_q13(spark, sf):
    """TPC-H Q13 (customer order-count distribution): left outer join
    with an extra join-side predicate, then a histogram of counts —
    the double-aggregation shape."""
    cust = scan(spark, sf, "customer")
    orders = scan(spark, sf, "orders").filter(F.col("o_orderpriority") != "1-URGENT")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


def _q_tpch_q15(spark, sf):
    """TPC-H Q15 (top supplier): quarterly revenue per supplier,
    select the max via a scalar subquery (revenue rounded identically
    on both engines before the equality)."""
    li = scan(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1996-04-01")
    )
    rev = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias(
            "total_revenue"
        )
    )
    rev.createOrReplaceTempView("q15_revenue")
    scan(spark, sf, "supplier").createOrReplaceTempView("q15_supplier")
    return spark.sql(
        """
        SELECT s_suppkey, s_name, total_revenue
        FROM q15_supplier JOIN q15_revenue ON s_suppkey = supplier_no
        WHERE total_revenue = (SELECT max(total_revenue) FROM q15_revenue)
        ORDER BY s_suppkey
        """
    )


def _q_tpch_q16(spark, sf):
    """TPC-H Q16 shape (supplier count by part attrs): lineitem as the
    part-supplier link, NOT-IN excluded suppliers as a broadcast anti
    join, count-distinct per attribute triple."""
    part = scan(spark, sf, "part").filter(
        (F.col("p_brand") != "Brand#11") & (F.col("p_size") < 25)
    )
    bad = scan(spark, sf, "supplier").filter(F.col("s_acctbal") < 0).select("s_suppkey")
    li = scan(spark, sf, "lineitem")
    j = li.join(F.broadcast(part), li.l_partkey == part.p_partkey).join(
        F.broadcast(bad), li.l_suppkey == bad.s_suppkey, "left_anti"
    )
    return (
        j.groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), F.asc("p_brand"), F.asc("p_type"), F.asc("p_size"))
    )


def _q_tpch_q17(spark, sf):
    """TPC-H Q17 (small-quantity-order revenue): correlated per-part
    avg decorrelated into a grouped join (quantities are integral so
    the avg is exact on both engines; threshold 0.5 fits the uniform
    synthetic quantities)."""
    li = scan(spark, sf, "lineitem")
    pa = li.groupBy(F.col("l_partkey").alias("pa_partkey")).agg(
        F.avg("l_quantity").alias("avg_qty")
    )
    part = scan(spark, sf, "part").filter(F.col("p_brand") == "Brand#11")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(pa, li.l_partkey == pa.pa_partkey)
        .filter(F.col("l_quantity") < 0.5 * F.col("avg_qty"))
        .agg(
            F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


def _q_tpch_q20(spark, sf):
    """TPC-H Q20 shape (excess-supply promotion): nested IN →
    left-semi join onto an aggregated subquery (suppliers who moved
    >300 units of widget parts in 1996, in EUROPE)."""
    part = scan(spark, sf, "part").filter(F.col("p_name").like("%widget%"))
    li = scan(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1997-01-01")
    )
    qual = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 300)
    )
    nation = scan(spark, sf, "nation")
    region = scan(spark, sf, "region").filter(F.col("r_name") == "EUROPE")
    supp = (
        scan(spark, sf, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
    )
    return (
        supp.join(qual, supp.s_suppkey == qual.l_suppkey, "left_semi")
        .select("s_name", "s_acctbal")
        .orderBy("s_name")
    )


def _q_tpch_q21(spark, sf):
    """TPC-H Q21 shape (suppliers who kept orders waiting): no
    l_receiptdate/l_commitdate — late = shipped >60 days after order
    date.  EXISTS/NOT-EXISTS pair expressed as per-order distinct
    counts: the sole late supplier in a multi-supplier finished
    order."""
    orders_f = scan(spark, sf, "orders").filter(F.col("o_orderstatus") == "F").select(
        "o_orderkey", "o_orderdate"
    )
    li = scan(spark, sf, "lineitem")
    j = li.join(orders_f, li.l_orderkey == orders_f.o_orderkey)
    late = j.filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
    n_late = late.groupBy(F.col("l_orderkey").alias("nl_key")).agg(
        F.countDistinct("l_suppkey").alias("n_late_supp")
    )
    n_all = j.groupBy(F.col("l_orderkey").alias("na_key")).agg(
        F.countDistinct("l_suppkey").alias("n_supp")
    )
    sole = (
        late.join(n_late.filter(F.col("n_late_supp") == 1), late.l_orderkey == F.col("nl_key"))
        .join(n_all.filter(F.col("n_supp") >= 2), late.l_orderkey == F.col("na_key"))
    )
    supp = scan(spark, sf, "supplier")
    out = (
        sole.join(F.broadcast(supp), sole.l_suppkey == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )
    return relational.top_k(out, 100, F.desc("numwait"), F.asc("s_name"))


def _q_tpch_q22(spark, sf):
    """TPC-H Q22 shape (global sales opportunity): no c_phone — country
    code = c_nationkey % 10; rich-but-quiet customers = above-average
    balance with no URGENT orders (anti join keeps the NOT-EXISTS
    shape against a filtered build side)."""
    cust = scan(spark, sf, "customer")
    urgent = scan(spark, sf, "orders").filter(F.col("o_orderpriority") == "1-URGENT").select(
        "o_custkey"
    )
    cust.createOrReplaceTempView("q22_customer")
    sel = (
        cust.withColumn("cntrycode", (F.col("c_nationkey") % 10).cast("long"))
        .filter(F.col("cntrycode").isin(1, 2, 3, 4, 5))
        .filter(
            F.col("c_acctbal")
            > F.expr("(SELECT avg(c_acctbal) FROM q22_customer WHERE c_acctbal > 0)")
        )
        .join(urgent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
    )
    return (
        sel.groupBy("cntrycode")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
        .orderBy("cntrycode")
    )


def _q_join_full_outer(spark, sf):
    """Full-outer join with guaranteed null sides (disjoint filters):
    per-nation customer counts vs supplier counts."""
    cust = (
        scan(spark, sf, "customer")
        .filter(F.col("c_nationkey") < 10)
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(F.count(F.lit(1)).alias("n_cust"))
    )
    supp = (
        scan(spark, sf, "supplier")
        .filter(F.col("s_nationkey") >= 5)
        .groupBy(F.col("s_nationkey").alias("nationkey"))
        .agg(F.count(F.lit(1)).alias("n_supp"))
    )
    return cust.join(supp, "nationkey", "full_outer").select(
        "nationkey",
        F.coalesce("n_cust", F.lit(0)).alias("n_cust"),
        F.coalesce("n_supp", F.lit(0)).alias("n_supp"),
    )


def _q_histogram_bins(spark, sf):
    """Equi-width histogram via arithmetic binning (floor division —
    engine-portable, no width_bucket dependency)."""
    li = scan(spark, sf, "lineitem")
    return (
        li.groupBy(F.floor(F.col("l_extendedprice") / 10000).cast("long").alias("bin"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
        )
        .orderBy("bin")
    )


def _q_join_skew_salted(spark, sf):
    """Salted skew join — results provably identical to the plain join
    (the oracle IS the plain join)."""
    li = scan(spark, sf, "lineitem")
    supp = scan(spark, sf, "supplier").withColumnRenamed("s_suppkey", "l_suppkey")
    j = relational.join_salted(li, supp, "l_suppkey", salt_buckets=4)
    return relational.group_agg(
        j, ["s_name"], {"n_items": ("count_star", None), "sum_qty": ("sum", "l_quantity")}
    )


def _q_dedup_clusters(spark, sf):
    """Near-dup clusters: MinHash-LSH candidate pairs → connected
    components (iterative min-label propagation)."""
    from mapreduce_faultolerrant_localityaware_spark.operators.graph import connected_components

    pairs = dedup.dedup_minhash_candidates(scan(spark, sf, "documents"))
    return connected_components(pairs)


def _q_triangle_count(spark, sf):
    """Cluster-density diagnostic: triangle count over the SimHash
    near-dup pair graph (degree-oriented wedge enumeration)."""
    from mapreduce_faultolerrant_localityaware_spark.operators.graph import triangle_count

    pairs = dedup.dedup_simhash_pairs(scan(spark, sf, "documents"), max_hamming=3)
    return triangle_count(pairs)


def _q_approx_distinct(spark, sf):
    """HyperLogLog++ distinct estimation — approximate by design, so no
    value-exact SQL oracle (driver records the weaker rows-only check);
    tests/test_operators.py asserts the estimate within rsd of exact."""
    orders = scan(spark, sf, "orders")
    return relational.group_agg(
        orders,
        ["o_orderpriority"],
        {"n_cust_approx": ("approx_count_distinct", "o_custkey"), "n_orders": ("count_star", None)},
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "wordcount": _q_wordcount,
        "filter_project": _q_filter_project,
        "group_agg": _q_group_agg,
        "group_agg_distinct": _q_group_agg_distinct,
        "sort_limit": _q_sort_limit,
        "distinct": _q_distinct,
        "union": _q_union,
        "join_broadcast": _q_join_broadcast,
        "join_large": _q_join_large,
        "join_semi": _q_join_semi,
        "join_anti": _q_join_anti,
        "window_rank": _q_window_rank,
        "window_running": _q_window_running,
        "rollup": _q_rollup,
        "events_tumbling": _q_events_tumbling,
        "repartition_agg": _q_repartition_agg,
        "pivot": _q_pivot,
        "cube": _q_cube,
        "intersect": _q_intersect,
        "except": _q_except,
        "join_part": _q_join_part,
        "subquery_above_avg": _q_subquery_above_avg,
        "events_json": _q_events_json,
        "window_lag": _q_window_lag,
        "sessionize": _q_sessionize,
        "minhash_signatures": _q_minhash_signatures,
        "text_tokens": _q_text_tokens,
        "token_bpe": _q_token_bpe,
        "text_quality": _q_text_quality,
        "lang_id": _q_lang_id,
        "fingerprint": _q_fingerprint,
        "scrub_text": _q_scrub_text,
        "sample_stratified": _q_sample_stratified,
        "vocab_top_tokens": _q_vocab_top_tokens,
        "repetition_ratio": _q_repetition_ratio,
        "embedding_norms": _q_embedding_norms,
        "tfidf_top_terms": _q_tfidf_top_terms,
        "bigram_counts": _q_bigram_counts,
        "contamination": _q_contamination,
        "pack_sequences": _q_pack_sequences,
        "mixture_report": _q_mixture_report,
        "lang_confusion": _q_lang_confusion,
        "dedup_exact": _q_dedup_exact,
        "dedup_minhash": _q_dedup_minhash,
        "dedup_simhash": _q_dedup_simhash,
        "dedup_simhash_pairs": _q_dedup_simhash_pairs,
        "dedup_ngram_jaccard": _q_dedup_ngram_jaccard,
        "dedup_embedding": _q_dedup_embedding,
        "lsh_bucket_stats": _q_lsh_bucket_stats,
        "ann_bruteforce": _q_ann_bruteforce,
        "ann_ivf": _q_ann_ivf,
        "ann_ivf_kmeans": _q_ann_ivf_kmeans,
        "multimodal_meta": _q_multimodal_meta,
        "streaming_wordcount": _q_streaming_wordcount,
        "streaming_tumbling": _q_streaming_tumbling,
        "streaming_enrich": _q_streaming_enrich,
        "streaming_sliding": _q_streaming_sliding,
        "streaming_dedup_keys": _q_streaming_dedup_keys,
        "pipeline_clean": _q_pipeline_clean,
        "resample_ffill": _q_resample_ffill,
        "asof_join": _q_asof_join,
        "range_join": _q_range_join,
        "grouping_sets": _q_grouping_sets,
        "percentiles": _q_percentiles,
        "minmax_by": _q_minmax_by,
        "window_ntile": _q_window_ntile,
        "string_funcs": _q_string_funcs,
        "date_funcs": _q_date_funcs,
        "math_funcs": _q_math_funcs,
        "array_funcs": _q_array_funcs,
        "posexplode_tokens": _q_posexplode_tokens,
        "conditional_agg": _q_conditional_agg,
        "corr_subquery": _q_corr_subquery,
        "scalar_subquery": _q_scalar_subquery,
        "null_funcs": _q_null_funcs,
        "array_agg": _q_array_agg,
        "unpivot": _q_unpivot,
        "sample_hash": _q_sample_hash,
        "window_first_last": _q_window_first_last,
        "window_range_frame": _q_window_range_frame,
        "window_rows_frame": _q_window_rows_frame,
        "struct_funcs": _q_struct_funcs,
        "map_funcs": _q_map_funcs,
        "tpch_q1": _q_tpch_q1,
        "tpch_q2": _q_tpch_q2,
        "tpch_q8": _q_tpch_q8,
        "tpch_q9": _q_tpch_q9,
        "tpch_q11": _q_tpch_q11,
        "tpch_q12": _q_tpch_q12,
        "tpch_q13": _q_tpch_q13,
        "tpch_q15": _q_tpch_q15,
        "tpch_q16": _q_tpch_q16,
        "tpch_q17": _q_tpch_q17,
        "tpch_q20": _q_tpch_q20,
        "tpch_q21": _q_tpch_q21,
        "tpch_q22": _q_tpch_q22,
        "tpch_q18": _q_tpch_q18,
        "multimodal_decode": _q_multimodal_decode,
        "tpch_q5": _q_tpch_q5,
        "tpch_q3": _q_tpch_q3,
        "tpch_q4": _q_tpch_q4,
        "tpch_q6": _q_tpch_q6,
        "tpch_q7": _q_tpch_q7,
        "tpch_q10": _q_tpch_q10,
        "tpch_q14": _q_tpch_q14,
        "tpch_q19": _q_tpch_q19,
        "join_full_outer": _q_join_full_outer,
        "histogram_bins": _q_histogram_bins,
        "join_skew_salted": _q_join_skew_salted,
        "dedup_clusters": _q_dedup_clusters,
        "triangle_count": _q_triangle_count,
        "approx_distinct": _q_approx_distinct,
    }


# ---------------------------------------------------------------- oracles

# Shared DuckDB fragments.  Tokenizer parity with SURVEY Q2:
# regexp_split_to_array on the same RE2/Java-compatible class.
_TOK = r"list_filter(regexp_split_to_array(text, '[^\p{L}]+'), t -> t <> '')"
_TOK_LOWER = r"list_filter(regexp_split_to_array(lower(text), '[^\p{L}]+'), t -> t <> '')"
_NORM = r"trim(regexp_replace(lower(text), '\s+', ' ', 'g'))"

_SHINGLES_LOWER = f"""
  WITH toks AS (SELECT doc_id, {_TOK_LOWER} AS tk FROM documents),
  sh AS (
    SELECT DISTINCT doc_id, tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2] AS shingle
    FROM (SELECT doc_id, tk, unnest(generate_series(1, greatest(len(tk)-2, 0))) AS i FROM toks)
  )
"""

# Kirsch-Mitzenmacher minhash (mirrors dedup.minhash_signatures):
# one md5 per shingle → h1,h2 → g_i = (h1 + i·h2) mod M
_M = dedup.MINHASH_MOD
_MINHASH_HASHES = f"""
    CAST(('0x' || substring(md5(shingle), 1, 15)) AS BIGINT) % {_M} AS h1,
    CAST(('0x' || substring(md5(shingle), 16, 15)) AS BIGINT) % {_M} AS h2
"""
_MINHASH_AGGS = ", ".join(
    f"min((h1 + {i + 1} * h2) % {_M}) AS mh{i}" for i in range(dedup.NUM_HASHES)
)
_BAND_SELECTS = " UNION ALL ".join(
    "SELECT doc_id, {b} AS band, md5({expr}) AS band_sig FROM sig".format(
        b=b,
        expr=" || '|' || ".join(
            f"CAST(mh{b * dedup.ROWS_PER_BAND + r} AS VARCHAR)"
            for r in range(dedup.ROWS_PER_BAND)
        ),
    )
    for b in range(dedup.BANDS)
)

_COS = (
    "round(list_dot_product({a}, {b}) / "
    "(sqrt(list_dot_product({a}, {a})) * sqrt(list_dot_product({b}, {b}))), 6)"
)

_LANGS = list(textstats.LANG_MARKERS)


def _lang_hits_sql(lang: str) -> str:
    words = ", ".join(f"'{w}'" for w in textstats.LANG_MARKERS[lang])
    return f"len(list_filter(tk, t -> list_contains([{words}], t)))"


def oracle_sql() -> dict[str, str]:
    lang_hit_cols = ", ".join(f"{_lang_hits_sql(lg)} AS hits_{lg}" for lg in _LANGS)
    lang_best = "greatest(" + ", ".join(f"hits_{lg}" for lg in _LANGS) + ")"
    lang_case = (
        "CASE "
        + " ".join(f"WHEN hits_{lg} = best AND best > 0 THEN '{lg}'" for lg in _LANGS)
        + " ELSE 'und' END"
    )
    return {
        "wordcount": f"""
            SELECT w AS word, count(*) AS cnt
            FROM (SELECT unnest({_TOK}) AS w FROM documents)
            GROUP BY w
        """,
        "filter_project": """
            SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
                   round(l_extendedprice * (1 - l_discount), 6) AS revenue, l_returnflag
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate < TIMESTAMP '1997-01-01' AND l_quantity > 10
        """,
        "group_agg": """
            SELECT l_returnflag, l_linestatus,
                   sum(l_quantity) AS sum_qty,
                   sum(l_extendedprice) AS sum_base_price,
                   sum(l_extendedprice * (1 - l_discount)) AS sum_disc_price,
                   avg(l_quantity) AS avg_qty,
                   avg(l_extendedprice) AS avg_price,
                   min(l_quantity) AS min_qty,
                   max(l_quantity) AS max_qty,
                   count(*) AS count_order
            FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
            GROUP BY l_returnflag, l_linestatus
        """,
        "group_agg_distinct": """
            SELECT o_orderpriority, count(DISTINCT o_custkey) AS n_cust, count(*) AS n_orders
            FROM orders GROUP BY o_orderpriority
        """,
        "sort_limit": """
            SELECT o_orderkey, o_totalprice FROM orders
            ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 100
        """,
        "distinct": "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
        "union": """
            SELECT 'customer' AS src, c_name AS name, c_acctbal AS acctbal,
                   CAST(c_nationkey AS BIGINT) AS nationkey FROM customer
            UNION ALL
            SELECT 'supplier' AS src, s_name AS name, s_acctbal AS acctbal,
                   CAST(s_nationkey AS BIGINT) AS nationkey FROM supplier
        """,
        "join_broadcast": """
            SELECT r_name, count(*) AS n_cust, avg(c_acctbal) AS avg_bal
            FROM customer
            JOIN nation ON c_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            GROUP BY r_name
        """,
        "join_large": """
            SELECT o_orderpriority,
                   sum(l_extendedprice * (1 - l_discount)) AS revenue,
                   count(*) AS n_items
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            GROUP BY o_orderpriority
        """,
        "join_semi": """
            SELECT c_mktsegment, count(*) AS n_cust FROM customer
            WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
            GROUP BY c_mktsegment
        """,
        "join_anti": """
            SELECT c_custkey, c_name FROM customer
            WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        """,
        "window_rank": """
            SELECT o_custkey, o_orderkey, o_totalprice, rk FROM (
              SELECT o_custkey, o_orderkey, o_totalprice,
                     CAST(row_number() OVER (PARTITION BY o_custkey
                          ORDER BY o_totalprice DESC, o_orderkey ASC) AS BIGINT) AS rk
              FROM orders)
            WHERE rk <= 3
        """,
        "window_running": """
            SELECT event_id, user_id,
                   round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6) AS run_sum
            FROM events
        """,
        "rollup": """
            SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
                   coalesce(l_linestatus, 'ALL') AS linestatus,
                   sum(l_quantity) AS sum_qty, count(*) AS n_rows
            FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        """,
        "events_tumbling": """
            SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
                   event_type, count(*) AS n_events, round(sum(value), 6) AS sum_value
            FROM events GROUP BY 1, 2
        """,
        "repartition_agg": """
            SELECT l_returnflag, sum(l_quantity) AS sum_qty FROM lineitem GROUP BY l_returnflag
        """,
        "pivot": """
            SELECT l_returnflag,
                   sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END) AS f_sum_qty,
                   sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END) AS o_sum_qty
            FROM lineitem GROUP BY l_returnflag
        """,
        "cube": """
            SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
                   coalesce(l_linestatus, 'ALL') AS linestatus,
                   sum(l_quantity) AS sum_qty, count(*) AS n_rows
            FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
        """,
        "intersect": """
            SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
            INTERSECT
            SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
        """,
        "except": """
            SELECT c_custkey AS custkey FROM customer
            EXCEPT ALL
            SELECT DISTINCT o_custkey AS custkey FROM orders
        """,
        "join_part": """
            SELECT p_brand, sum(l_extendedprice * (1 - l_discount)) AS revenue,
                   count(*) AS n_items
            FROM lineitem JOIN part ON l_partkey = p_partkey
            WHERE p_size < 20 GROUP BY p_brand
        """,
        "subquery_above_avg": """
            SELECT o_orderpriority, count(*) AS n_above
            FROM orders o
            JOIN (SELECT o_custkey, avg(o_totalprice) AS cust_avg
                  FROM orders GROUP BY o_custkey) c USING (o_custkey)
            WHERE o.o_totalprice > c.cust_avg
            GROUP BY o_orderpriority
        """,
        "events_json": """
            SELECT event_type,
                   CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
                   count(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS n_k
            FROM events GROUP BY event_type
        """,
        "window_lag": """
            SELECT event_id, user_id,
                   round(lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id), 6) AS prev_value
            FROM events
        """,
        "sessionize": """
            WITH gaps AS (
              SELECT event_id, user_id, ts,
                     CASE WHEN lag(ts) OVER w IS NULL
                            OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
                          THEN 1 ELSE 0 END AS new_session
              FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            )
            SELECT event_id, user_id,
                   CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
            FROM gaps
        """,
        "streaming_wordcount": f"""
            SELECT t AS word, count(*) AS count
            FROM (SELECT unnest({_TOK}) AS t FROM documents)
            GROUP BY t
        """,
        "streaming_tumbling": """
            SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
                   strftime(date_trunc('hour', ts) + INTERVAL 1 HOUR, '%Y-%m-%d %H:%M:%S') AS window_end,
                   event_type, count(*) AS n_events, round(sum(value), 6) AS sum_value
            FROM events GROUP BY 1, 2, 3
        """,
        "resample_ffill": """
            WITH per AS (SELECT user_id, date_trunc('hour', ts) AS bucket,
                                count(*) AS n, sum(value) AS v
                         FROM events GROUP BY 1, 2),
            bounds AS (SELECT user_id, min(bucket) AS mn, max(bucket) AS mx
                       FROM per GROUP BY 1),
            grid AS (SELECT user_id, unnest(generate_series(mn, mx, INTERVAL 1 HOUR)) AS bucket
                     FROM bounds),
            j AS (SELECT g.user_id, g.bucket, per.n, per.v
                  FROM grid g LEFT JOIN per ON per.user_id = g.user_id AND per.bucket = g.bucket)
            SELECT user_id, strftime(bucket, '%Y-%m-%d %H:%M:%S') AS bucket,
                   coalesce(n, 0) AS n_events,
                   round(last_value(v IGNORE NULLS) OVER (
                         PARTITION BY user_id ORDER BY bucket
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6) AS v_filled
            FROM j
        """,
        "streaming_sliding": """
            WITH g AS (
              SELECT event_type,
                     to_timestamp(floor(epoch(ts) / 900) * 900) AS g0
              FROM events),
            e AS (SELECT event_type, g0 - (o * INTERVAL 15 MINUTE) AS ws
                  FROM g, (SELECT unnest([0, 1]) AS o))
            SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS window_start,
                   strftime(ws + INTERVAL 30 MINUTE, '%Y-%m-%d %H:%M:%S') AS window_end,
                   event_type, count(*) AS n_events
            FROM e GROUP BY 1, 2, 3
        """,
        "scrub_text": """
            SELECT doc_id,
                   CAST(len(regexp_extract_all(text, '{EMAIL}')) AS BIGINT) AS n_emails,
                   CAST(len(regexp_extract_all(text, '{URL}')) AS BIGINT) AS n_urls,
                   md5(regexp_replace(regexp_replace(text, '{URL}', '<URL>', 'g'), '{EMAIL}', '<EMAIL>', 'g')) AS clean_md5,
                   CAST(length(regexp_replace(regexp_replace(text, '{URL}', '<URL>', 'g'), '{EMAIL}', '<EMAIL>', 'g')) AS BIGINT) AS clean_len
            FROM documents
        """.replace("{EMAIL}", textstats.EMAIL_RE).replace("{URL}", textstats.URL_RE),
        "sample_stratified": """
            SELECT o_orderkey, o_orderpriority, o_totalprice FROM orders
            WHERE CAST(('0x' || substring(md5(CAST(o_orderkey AS VARCHAR)), 1, 8)) AS BIGINT) % 10000
                  < CAST((CASE o_orderpriority WHEN '1-URGENT' THEN 0.5
                                               WHEN '5-LOW' THEN 0.05
                                               ELSE 0.1 END) * 10000 AS BIGINT)
        """,
        "vocab_top_tokens": f"""
            WITH base AS (SELECT doc_id, {_TOK_LOWER} AS tk FROM documents),
            hits AS (SELECT doc_id, {{lang_hit_cols}} FROM base),
            best AS (SELECT doc_id, *, {{lang_best}} AS best FROM hits),
            lang AS (SELECT doc_id, {{lang_case}} AS lang_pred FROM best),
            toks AS (SELECT doc_id, unnest({_TOK_LOWER}) AS token FROM documents),
            counts AS (SELECT lang_pred, token, count(*) AS n
                       FROM toks JOIN lang USING (doc_id) GROUP BY 1, 2)
            SELECT lang_pred, token, n,
                   CAST(row_number() OVER (PARTITION BY lang_pred
                        ORDER BY n DESC, token ASC) AS BIGINT) AS rk
            FROM counts QUALIFY rk <= 5
        """.replace("{lang_hit_cols}", lang_hit_cols).replace("{lang_best}", lang_best).replace("{lang_case}", lang_case),
        "streaming_dedup_keys": """
            SELECT DISTINCT user_id, event_type FROM events
        """,
        "repetition_ratio": f"""
            WITH t AS (SELECT doc_id, {_TOK_LOWER} AS tk FROM documents),
            s AS (SELECT doc_id,
                         list_transform(generate_series(1, greatest(len(tk)-2, 0)),
                                        i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]) AS sh
                  FROM t)
            SELECT doc_id,
                   CAST(len(sh) AS BIGINT) AS n_shingles,
                   CAST(len(list_distinct(sh)) AS BIGINT) AS n_distinct,
                   CASE WHEN len(sh) > 0
                        THEN round(1 - len(list_distinct(sh)) / CAST(len(sh) AS DOUBLE), 6)
                   END AS rep_ratio
            FROM s
        """,
        "embedding_norms": """
            SELECT vec_id,
                   CAST(len(embedding) AS BIGINT) AS dim,
                   round(sqrt(list_sum(list_transform(embedding,
                         x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 6) AS l2_norm,
                   round(list_max(list_transform(embedding,
                         x -> abs(CAST(x AS DOUBLE)))), 6) AS max_abs,
                   CAST(len(list_filter(embedding, x -> CAST(x AS DOUBLE) > 0)) AS BIGINT) AS n_pos
            FROM embeddings
        """,
        "mixture_report": f"""
            WITH agg AS (
              SELECT source, lang, count(*) AS n_docs,
                     CAST(sum(len({_TOK_LOWER})) AS BIGINT) AS n_tokens
              FROM documents GROUP BY 1, 2)
            SELECT source, lang, n_docs, n_tokens,
                   round(n_docs / CAST(sum(n_docs) OVER () AS DOUBLE), 6) AS doc_share,
                   round(n_tokens / CAST(sum(n_tokens) OVER () AS DOUBLE), 6) AS token_share
            FROM agg
        """,
        "lang_confusion": """
            WITH base AS (SELECT doc_id, {TOKL} AS tk FROM documents),
            hits AS (SELECT doc_id, {lang_hit_cols} FROM base),
            best AS (SELECT doc_id, *, {lang_best} AS best FROM hits),
            pred AS (SELECT doc_id, {lang_case} AS lang_pred FROM best)
            SELECT lang, lang_pred, count(*) AS n
            FROM documents JOIN pred USING (doc_id)
            GROUP BY 1, 2 ORDER BY 1, 2
        """.replace("{TOKL}", _TOK_LOWER)
          .replace("{lang_hit_cols}", lang_hit_cols)
          .replace("{lang_best}", lang_best)
          .replace("{lang_case}", lang_case),
        "pack_sequences": f"""
            WITH base AS (
              SELECT doc_id,
                     CAST(len({_TOK_LOWER}) AS BIGINT) AS n_tokens,
                     CAST(doc_id % 8 AS BIGINT) AS stream
              FROM documents)
            SELECT doc_id, n_tokens, stream,
                   CAST(stream * 4294967296
                        + floor((sum(n_tokens) OVER (PARTITION BY stream ORDER BY doc_id)
                                 - n_tokens) / 512.0) AS BIGINT) AS pack_id
            FROM base
        """,
        "tfidf_top_terms": f"""
            WITH toks AS (SELECT doc_id, unnest({_TOK_LOWER}) AS token FROM documents),
            counts AS (SELECT doc_id, token, count(*) AS tf FROM toks GROUP BY 1, 2),
            dl AS (SELECT doc_id, sum(tf) AS dl FROM counts GROUP BY 1),
            dfreq AS (SELECT token, count(*) AS df FROM counts GROUP BY 1),
            n AS (SELECT count(*) AS n_docs FROM documents)
            SELECT doc_id, token, tf, df, round(tfidf_raw, 6) AS tfidf, rk
            FROM (
              SELECT c.doc_id, c.token, c.tf, f.df,
                     (CAST(c.tf AS DOUBLE) / d.dl)
                       * (ln((n.n_docs + 1.0) / (f.df + 1.0)) + 1.0) AS tfidf_raw,
                     CAST(row_number() OVER (
                       PARTITION BY c.doc_id
                       ORDER BY (CAST(c.tf AS DOUBLE) / d.dl)
                                  * (ln((n.n_docs + 1.0) / (f.df + 1.0)) + 1.0) DESC,
                                c.token ASC) AS BIGINT) AS rk
              FROM counts c
              JOIN dl d ON c.doc_id = d.doc_id
              JOIN dfreq f ON c.token = f.token, n
            ) WHERE rk <= 3
        """,
        "bigram_counts": f"""
            WITH toks AS (SELECT doc_id, {_TOK_LOWER} AS tk FROM documents),
            grams AS (SELECT tk[i] || ' ' || tk[i+1] AS bigram
                      FROM (SELECT tk, unnest(generate_series(1, greatest(len(tk)-1, 0))) AS i
                            FROM toks))
            SELECT bigram, count(*) AS n FROM grams
            GROUP BY 1 ORDER BY n DESC, bigram ASC LIMIT 100
        """,
        "contamination": f"""
            {_SHINGLES_LOWER},
            bench AS (SELECT * FROM sh WHERE doc_id % 50 = 0),
            train AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 50 <> 0),
            tot AS (SELECT doc_id, count(*) AS n_shingles FROM bench GROUP BY 1),
            hit AS (SELECT doc_id, count(*) AS n_hit FROM bench
                    WHERE shingle IN (SELECT shingle FROM train) GROUP BY 1)
            SELECT tot.doc_id, n_shingles, coalesce(n_hit, 0) AS n_hit,
                   round(coalesce(n_hit, 0) / CAST(n_shingles AS DOUBLE), 6) AS containment
            FROM tot LEFT JOIN hit ON tot.doc_id = hit.doc_id
        """,
        "streaming_enrich": """
            SELECT event_id, user_id, event_type, c_name, c_mktsegment
            FROM events JOIN customer ON user_id = c_custkey
        """,
        "pipeline_clean": f"""
            WITH base AS (
              SELECT doc_id, {_TOK_LOWER} AS tk,
                     length(regexp_replace(text, '[^\\p{{L}}]', '', 'g')) AS letters,
                     length(text) AS chars
              FROM documents
            ),
            q AS (
              SELECT doc_id, CAST(len(tk) AS BIGINT) AS n_tokens,
                     round(least(1.0,
                           len(list_filter(tk, t -> list_contains(['the','and','of','to','in','is','that','with','for','was'], t))) * 1.0 / len(tk) * 2
                           + (1.0 - (chars - letters) * 1.0 / chars) * 0.5), 6) AS quality
              FROM base WHERE len(tk) > 0
            ),
            keep AS (SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5({_NORM})),
            hits AS (SELECT doc_id, {{lang_hit_cols}} FROM (SELECT doc_id, {_TOK_LOWER} AS tk FROM documents)),
            best AS (SELECT doc_id, *, {{lang_best}} AS best FROM hits),
            lang AS (SELECT doc_id, {{lang_case}} AS lang_pred FROM best)
            SELECT q.doc_id AS doc_id, n_tokens, quality, lang_pred
            FROM q JOIN keep USING (doc_id) JOIN lang USING (doc_id)
            WHERE quality >= 0.5
        """.replace("{lang_hit_cols}", lang_hit_cols).replace("{lang_best}", lang_best).replace("{lang_case}", lang_case),
        "minhash_signatures": f"""
            {_SHINGLES_LOWER},
            hashed AS (SELECT doc_id, {_MINHASH_HASHES} FROM sh)
            SELECT doc_id, {_MINHASH_AGGS} FROM hashed GROUP BY doc_id
        """,
        "text_tokens": f"""
            SELECT doc_id,
                   CAST(len({_TOK}) AS BIGINT) AS n_tokens,
                   CAST(len(list_filter(regexp_split_to_array(text, '\\s+'), t -> t <> '')) AS BIGINT) AS n_ws_tokens,
                   CAST(length(text) AS BIGINT) AS n_chars_m
            FROM documents
        """,
        "token_bpe": f"""
            WITH p AS (
              SELECT doc_id,
                     regexp_extract_all(text, '{textstats.BPE_ISH_RE.replace("'", "''")}') AS pieces,
                     length(text) AS chars
              FROM documents
            ),
            np AS (
              SELECT doc_id, pieces, chars,
                     len(list_filter(pieces, x -> trim(x) <> '')) AS n_nonws
              FROM p
            )
            SELECT doc_id,
                   CAST(len(pieces) AS BIGINT) AS n_pieces,
                   CAST(n_nonws AS BIGINT) AS n_nonws_pieces,
                   CASE WHEN n_nonws > 0 THEN round(chars * 1.0 / n_nonws, 6) END AS chars_per_piece
            FROM np
        """,
        "text_quality": f"""
            WITH base AS (
              SELECT doc_id, {_TOK_LOWER} AS tk,
                     length(regexp_replace(text, '[^\\p{{L}}]', '', 'g')) AS letters,
                     length(text) AS chars
              FROM documents
            )
            SELECT doc_id, CAST(len(tk) AS BIGINT) AS n_tokens,
                   round(letters * 1.0 / len(tk), 6) AS mean_token_len,
                   round(len(list_filter(tk, t -> list_contains(['the','and','of','to','in','is','that','with','for','was'], t))) * 1.0 / len(tk), 6) AS stopword_ratio,
                   round((chars - letters) * 1.0 / chars, 6) AS nonletter_ratio,
                   round(least(1.0,
                         len(list_filter(tk, t -> list_contains(['the','and','of','to','in','is','that','with','for','was'], t))) * 1.0 / len(tk) * 2
                         + (1.0 - (chars - letters) * 1.0 / chars) * 0.5), 6) AS quality
            FROM base WHERE len(tk) > 0
        """,
        "lang_id": f"""
            WITH base AS (SELECT doc_id, {_TOK_LOWER} AS tk FROM documents),
            hits AS (SELECT doc_id, {lang_hit_cols} FROM base),
            best AS (SELECT doc_id, *, {lang_best} AS best FROM hits)
            SELECT doc_id, {lang_case} AS lang_pred, CAST(best AS BIGINT) AS marker_hits
            FROM best
        """,
        "fingerprint": f"""
            SELECT doc_id, md5({_NORM}) AS content_md5,
                   list_aggregate(list_transform({_TOK_LOWER}, t -> md5(t)), 'min') AS min_token_hash,
                   list_aggregate(list_transform({_TOK_LOWER}, t -> md5(t)), 'max') AS max_token_hash
            FROM documents
        """,
        "dedup_exact": f"""
            SELECT md5({_NORM}) AS content_hash, min(doc_id) AS keep_id,
                   CAST(count(*) AS BIGINT) AS n_dups
            FROM documents GROUP BY 1
        """,
        "dedup_minhash": f"""
            {_SHINGLES_LOWER},
            hashed AS (SELECT doc_id, {_MINHASH_HASHES} FROM sh),
            sig AS (SELECT doc_id, {_MINHASH_AGGS} FROM hashed GROUP BY doc_id),
            bands AS ({_BAND_SELECTS})
            SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
            FROM bands a JOIN bands b
              ON a.band = b.band AND a.band_sig = b.band_sig AND a.doc_id < b.doc_id
        """,
        "lsh_bucket_stats": f"""
            {_SHINGLES_LOWER},
            hashed AS (SELECT doc_id, {_MINHASH_HASHES} FROM sh),
            sig AS (SELECT doc_id, {_MINHASH_AGGS} FROM hashed GROUP BY doc_id),
            bands AS ({_BAND_SELECTS}),
            sizes AS (SELECT band, band_sig, count(*) AS n FROM bands GROUP BY band, band_sig)
            SELECT band, CAST(count(*) AS BIGINT) AS n_buckets,
                   CAST(max(n) AS BIGINT) AS max_bucket,
                   CAST(sum(n) AS BIGINT) AS docs_in_buckets,
                   CAST(sum(CASE WHEN n > {dedup.MAX_BUCKET_ALLPAIRS} THEN 1 ELSE 0 END) AS BIGINT) AS n_overflow
            FROM sizes WHERE n > 1 GROUP BY band ORDER BY band
        """,
        "dedup_simhash": f"""
            WITH tc AS (
              SELECT doc_id, t AS token, count(*) AS cnt
              FROM (SELECT doc_id, unnest({_TOK_LOWER}) AS t FROM documents)
              GROUP BY doc_id, t
            ),
            v AS (
              SELECT doc_id, b,
                     sum(CASE WHEN substring(md5(token), b + 1, 1) IN
                              ('8','9','a','b','c','d','e','f') THEN cnt ELSE -cnt END) AS v
              FROM tc, (SELECT unnest(generate_series(0, {dedup.SIMHASH_BITS - 1})) AS b)
              GROUP BY doc_id, b
            )
            SELECT doc_id,
                   CAST(sum(CASE WHEN v > 0 THEN (CAST(1 AS BIGINT) << b) ELSE 0 END) AS BIGINT) AS simhash
            FROM v GROUP BY doc_id
        """,
        "dedup_simhash_pairs": f"""
            WITH tc AS (
              SELECT doc_id, t AS token, count(*) AS cnt
              FROM (SELECT doc_id, unnest({_TOK_LOWER}) AS t FROM documents)
              GROUP BY doc_id, t
            ),
            v AS (
              SELECT doc_id, b,
                     sum(CASE WHEN substring(md5(token), b + 1, 1) IN
                              ('8','9','a','b','c','d','e','f') THEN cnt ELSE -cnt END) AS v
              FROM tc, (SELECT unnest(generate_series(0, {dedup.SIMHASH_BITS - 1})) AS b)
              GROUP BY doc_id, b
            ),
            sig AS (
              SELECT doc_id,
                     CAST(sum(CASE WHEN v > 0 THEN (CAST(1 AS BIGINT) << b) ELSE 0 END) AS BIGINT) AS simhash
              FROM v GROUP BY doc_id
            ),
            bands AS (
              SELECT doc_id, simhash, i AS band, (simhash >> (8 * i)) & 255 AS bv
              FROM sig, (SELECT unnest(generate_series(0, {dedup.SIMHASH_BANDS - 1})) AS i)
            ),
            ok AS (SELECT band, bv FROM bands GROUP BY 1, 2
                   HAVING count(*) <= {dedup.MAX_BUCKET_ALLPAIRS}),
            cand AS (
              SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
                              a.simhash AS sim_a, b.simhash AS sim_b
              FROM bands a
              JOIN ok USING (band, bv)
              JOIN bands b ON a.band = b.band AND a.bv = b.bv AND a.doc_id < b.doc_id
            )
            SELECT doc_a, doc_b,
                   CAST(bit_count(xor(sim_a, sim_b)) AS BIGINT) AS hamming
            FROM cand WHERE bit_count(xor(sim_a, sim_b)) <= 3
        """,
        "triangle_count": f"""
            WITH tc AS (
              SELECT doc_id, t AS token, count(*) AS cnt
              FROM (SELECT doc_id, unnest({_TOK_LOWER}) AS t FROM documents)
              GROUP BY doc_id, t
            ),
            v AS (
              SELECT doc_id, b,
                     sum(CASE WHEN substring(md5(token), b + 1, 1) IN
                              ('8','9','a','b','c','d','e','f') THEN cnt ELSE -cnt END) AS v
              FROM tc, (SELECT unnest(generate_series(0, {dedup.SIMHASH_BITS - 1})) AS b)
              GROUP BY doc_id, b
            ),
            sig AS (
              SELECT doc_id,
                     CAST(sum(CASE WHEN v > 0 THEN (CAST(1 AS BIGINT) << b) ELSE 0 END) AS BIGINT) AS simhash
              FROM v GROUP BY doc_id
            ),
            bands AS (
              SELECT doc_id, simhash, i AS band, (simhash >> (8 * i)) & 255 AS bv
              FROM sig, (SELECT unnest(generate_series(0, {dedup.SIMHASH_BANDS - 1})) AS i)
            ),
            ok AS (SELECT band, bv FROM bands GROUP BY 1, 2
                   HAVING count(*) <= {dedup.MAX_BUCKET_ALLPAIRS}),
            cand AS (
              SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
                              a.simhash AS sim_a, b.simhash AS sim_b
              FROM bands a
              JOIN ok USING (band, bv)
              JOIN bands b ON a.band = b.band AND a.bv = b.bv AND a.doc_id < b.doc_id
            ),
            edges AS (
              SELECT DISTINCT doc_a AS u, doc_b AS v FROM cand
              WHERE bit_count(xor(sim_a, sim_b)) <= 3
            ),
            nodes AS (SELECT u AS node FROM edges UNION SELECT v FROM edges),
            tri AS (SELECT count(*) AS n_triangles FROM edges e1
                    JOIN edges e2 ON e2.u = e1.u AND e2.v > e1.v
                    JOIN edges e3 ON e3.u = e1.v AND e3.v = e2.v)
            SELECT (SELECT count(*) FROM nodes) AS n_nodes,
                   (SELECT count(*) FROM edges) AS n_edges,
                   (SELECT n_triangles FROM tri) AS n_triangles
        """,
        "dedup_ngram_jaccard": f"""
            {_SHINGLES_LOWER},
            sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
            common AS (
              SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS common
              FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
              GROUP BY 1, 2
            )
            SELECT doc_a, doc_b,
                   round(common * 1.0 / (sa.n_sh + sb.n_sh - common), 6) AS jaccard
            FROM common
            JOIN sizes sa ON sa.doc_id = doc_a
            JOIN sizes sb ON sb.doc_id = doc_b
            WHERE round(common * 1.0 / (sa.n_sh + sb.n_sh - common), 6) >= 0.8
        """,
        "dedup_embedding": f"""
            WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
            SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
                   {_COS.format(a='a.v', b='b.v')} AS cos_sim
            FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
            WHERE {_COS.format(a='a.v', b='b.v')} >= 0.3
        """,
        "ann_bruteforce": f"""
            WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
            q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 8),
            scored AS (
              SELECT query_id, e.vec_id AS neighbor_id,
                     {_COS.format(a='qv', b='e.v')} AS cos_sim
              FROM e CROSS JOIN q WHERE e.vec_id <> query_id
            )
            SELECT query_id, neighbor_id, cos_sim FROM scored
            QUALIFY row_number() OVER (PARTITION BY query_id
                    ORDER BY cos_sim DESC, neighbor_id ASC) <= 5
        """,
        "ann_ivf": f"""
            WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
            q AS (SELECT vec_id AS query_id, label, v AS qv FROM e WHERE vec_id < 8),
            scored AS (
              SELECT query_id, e.vec_id AS neighbor_id,
                     {_COS.format(a='qv', b='e.v')} AS cos_sim
              FROM e JOIN q USING (label) WHERE e.vec_id <> query_id
            )
            SELECT query_id, neighbor_id, cos_sim FROM scored
            QUALIFY row_number() OVER (PARTITION BY query_id
                    ORDER BY cos_sim DESC, neighbor_id ASC) <= 5
        """,
        "multimodal_meta": """
            SELECT doc_id AS media_id,
                   CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
                   sha256(text) AS sha256
            FROM documents
        """,
        "asof_join": """
            WITH l AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
            r AS (SELECT user_id, ts, event_id AS prev_purchase_id, value AS prev_value
                  FROM events WHERE event_type = 'purchase')
            SELECT l.event_id, l.user_id, r.prev_purchase_id,
                   round(r.prev_value, 6) AS prev_value
            FROM l ASOF JOIN r ON l.user_id = r.user_id AND l.ts >= r.ts
        """,
        "range_join": """
            WITH bands(band, lo, hi) AS (VALUES
              ('low', 0.0, 100000.0), ('mid', 100000.0, 300000.0), ('high', 300000.0, 1000000.0))
            SELECT band, count(*) AS n_orders,
                   round(sum(o_totalprice), 2) AS sum_price
            FROM orders JOIN bands ON o_totalprice >= lo AND o_totalprice < hi
            GROUP BY band
        """,
        "grouping_sets": """
            SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
                   coalesce(l_linestatus, 'ALL') AS linestatus,
                   sum(l_quantity) AS sum_qty, count(*) AS n_rows
            FROM lineitem GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        """,
        "percentiles": """
            SELECT l_returnflag,
                   round(quantile_cont(l_quantity, 0.25), 6) AS p25,
                   round(quantile_cont(l_quantity, 0.5), 6) AS p50,
                   round(quantile_cont(l_quantity, 0.75), 6) AS p75,
                   round(quantile_cont(l_extendedprice, 0.9), 6) AS price_p90
            FROM lineitem GROUP BY l_returnflag
        """,
        "minmax_by": """
            WITH ranked AS (
              SELECT o_orderpriority, o_orderkey,
                     row_number() OVER (PARTITION BY o_orderpriority
                          ORDER BY o_totalprice DESC, o_orderkey DESC) AS rmax,
                     row_number() OVER (PARTITION BY o_orderpriority
                          ORDER BY o_totalprice ASC, o_orderkey ASC) AS rmin
              FROM orders)
            SELECT o_orderpriority,
                   max(CASE WHEN rmax = 1 THEN o_orderkey END) AS top_orderkey,
                   max(CASE WHEN rmin = 1 THEN o_orderkey END) AS bottom_orderkey
            FROM ranked GROUP BY o_orderpriority
        """,
        "window_ntile": """
            SELECT o_orderkey, o_orderpriority,
                   CAST(ntile(4) OVER w AS BIGINT) AS quartile,
                   CAST(dense_rank() OVER w AS BIGINT) AS drank,
                   round(percent_rank() OVER w, 6) AS prank,
                   round(cume_dist() OVER w, 6) AS cdist
            FROM orders
            WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey ASC)
        """,
        "string_funcs": """
            SELECT c_custkey, upper(c_name) AS uname,
                   CAST(length(c_name) AS BIGINT) AS name_len,
                   substring(c_name, 1, 5) AS prefix,
                   concat_ws('|', c_mktsegment, c_name) AS seg_name,
                   replace(c_name, 'Customer', 'C') AS short_name,
                   lpad(CAST(c_custkey AS VARCHAR), 8, '0') AS padded_key,
                   regexp_extract(c_name, '([0-9]+)', 1) AS digits,
                   c_name LIKE '%1%' AS has_one
            FROM customer
        """,
        "date_funcs": """
            SELECT o_orderkey,
                   CAST(year(o_orderdate) AS BIGINT) AS yr,
                   CAST(month(o_orderdate) AS BIGINT) AS mo,
                   CAST(day(o_orderdate) AS BIGINT) AS dom,
                   CAST(quarter(o_orderdate) AS BIGINT) AS qtr,
                   CAST(dayofweek(o_orderdate) AS BIGINT) AS dow,
                   date_trunc('month', o_orderdate) AS month_start,
                   last_day(o_orderdate) AS month_end,
                   CAST(datediff('day', o_orderdate, TIMESTAMP '2002-01-01') AS BIGINT) AS days_to_2002
            FROM orders
        """,
        "math_funcs": """
            SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
                   round(abs(l_discount - 0.05), 6) AS disc_dev,
                   CAST(floor(l_extendedprice) AS BIGINT) AS price_floor,
                   CAST(ceil(l_quantity) AS BIGINT) AS qty_ceil,
                   round(sqrt(l_extendedprice), 6) AS price_sqrt,
                   round(ln(l_extendedprice), 6) AS price_ln,
                   round(pow(l_quantity, 2.0), 6) AS qty_sq
            FROM lineitem
        """,
        "array_funcs": """
            WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
            SELECT vec_id, CAST(len(v) AS BIGINT) AS dims,
                   round(sqrt(list_dot_product(v, v)), 6) AS norm,
                   round(list_sum(v[1:3]), 6) AS head3_sum,
                   round(list_aggregate(v, 'max'), 6) AS max_elem,
                   round(list_aggregate(v, 'min'), 6) AS min_elem
            FROM e
        """,
        "posexplode_tokens": f"""
            WITH toks AS (SELECT doc_id, {_TOK} AS tk FROM documents)
            SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos, tk[i] AS word
            FROM (SELECT doc_id, tk, unnest(generate_series(1, len(tk))) AS i FROM toks)
        """,
        "conditional_agg": """
            SELECT l_returnflag,
                   count(CASE WHEN l_quantity > 25 THEN 1 END) AS n_highqty,
                   round(sum(CASE WHEN l_discount > 0.05
                                  THEN l_extendedprice * (1 - l_discount)
                                  ELSE 0.0 END), 6) AS disc_rev,
                   round(avg(CASE WHEN l_quantity > 25 THEN 1.0 ELSE 0.0 END), 6) AS highqty_frac
            FROM lineitem GROUP BY l_returnflag
        """,
        "corr_subquery": """
            SELECT round(sum(l_extendedprice) / 7.0, 6) AS avg_yearly
            FROM lineitem l
            JOIN part p ON p.p_partkey = l.l_partkey
            JOIN (SELECT l_partkey, 0.2 * avg(l_quantity) AS qty_lim
                  FROM lineitem GROUP BY l_partkey) a ON a.l_partkey = l.l_partkey
            WHERE p.p_size < 10 AND l.l_quantity < a.qty_lim
        """,
        "scalar_subquery": """
            SELECT o_orderkey,
                   round(o_totalprice / (SELECT max(o_totalprice) FROM orders), 6) AS price_frac
            FROM orders
        """,
        "null_funcs": """
            SELECT l_orderkey,
                   count(nullif(l_discount, 0.0)) AS n_discounted,
                   count(*) AS n_lines,
                   round(sum(coalesce(nullif(l_discount, 0.0), 0.0)), 6) AS sum_disc
            FROM lineitem GROUP BY l_orderkey
        """,
        "array_agg": """
            SELECT o_orderpriority,
                   list_sort(list(DISTINCT o_orderstatus)) AS statuses,
                   count(*) AS n_orders
            FROM orders GROUP BY o_orderpriority
        """,
        "unpivot": """
            SELECT l_orderkey, 'l_quantity' AS metric, round(l_quantity, 6) AS val
            FROM lineitem WHERE l_linenumber = 1
            UNION ALL
            SELECT l_orderkey, 'l_extendedprice', round(l_extendedprice, 6)
            FROM lineitem WHERE l_linenumber = 1
            UNION ALL
            SELECT l_orderkey, 'l_discount', round(l_discount, 6)
            FROM lineitem WHERE l_linenumber = 1
        """,
        "sample_hash": """
            SELECT o_orderkey, o_custkey, o_totalprice FROM orders
            WHERE CAST(('0x' || substring(md5(CAST(o_orderkey AS VARCHAR)), 1, 8)) AS BIGINT) % 100 < 10
        """,
        "window_first_last": """
            SELECT event_id, user_id,
                   round(first_value(value) OVER w_full, 6) AS first_val,
                   round(last_value(value) OVER w_full, 6) AS last_val,
                   round(lead(value) OVER w_seq, 6) AS next_val
            FROM events
            WINDOW w_full AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING),
                   w_seq AS (PARTITION BY user_id ORDER BY ts, event_id)
        """,
        "window_range_frame": """
            SELECT event_id, user_id,
                   round(sum(value) OVER (PARTITION BY user_id ORDER BY epoch_us(ts)
                         RANGE BETWEEN 600000000 PRECEDING AND CURRENT ROW), 6) AS rolling_10m
            FROM events
        """,
        "window_rows_frame": """
            SELECT event_id, user_id,
                   round(avg(value) OVER (PARTITION BY user_id
                         ORDER BY epoch_us(ts), event_id
                         ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 6) AS mov_avg3
            FROM events
        """,
        "struct_funcs": """
            SELECT o_custkey, count(*) AS n_orders,
                   round(min(o_totalprice), 6) AS min_price,
                   (array_agg(o_orderkey ORDER BY o_totalprice, o_orderkey))[1]
                     AS min_price_key,
                   round(max(o_totalprice), 6) AS max_price
            FROM orders GROUP BY 1
        """,
        "map_funcs": """
            WITH per AS (SELECT user_id, event_type, count(*) AS n
                         FROM events GROUP BY 1, 2)
            SELECT user_id, count(*) AS n_types,
                   coalesce(max(CASE WHEN event_type = 'click' THEN n END), 0) AS n_click,
                   coalesce(max(CASE WHEN event_type = 'purchase' THEN n END), 0) AS n_purchase,
                   coalesce(max(CASE WHEN event_type = 'error' THEN n END), 0) AS n_error
            FROM per GROUP BY 1
        """,
        "tpch_q1": """
            SELECT l_returnflag, l_linestatus,
                   round(sum(l_quantity), 2) AS sum_qty,
                   round(sum(l_extendedprice), 2) AS sum_base_price,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
                   round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
                   round(avg(l_quantity), 6) AS avg_qty,
                   round(avg(l_extendedprice), 6) AS avg_price,
                   round(avg(l_discount), 6) AS avg_disc,
                   count(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '2001-06-01'
            GROUP BY 1, 2 ORDER BY 1, 2
        """,
        "tpch_q2": """
            WITH ps AS (SELECT l_partkey, l_suppkey,
                               min(l_extendedprice / l_quantity) AS unit_cost
                        FROM lineitem GROUP BY 1, 2),
            eps AS (SELECT ps.*, s_acctbal, s_name, n_name
                    FROM ps JOIN supplier ON l_suppkey = s_suppkey
                    JOIN nation ON s_nationkey = n_nationkey
                    JOIN region ON n_regionkey = r_regionkey
                    WHERE r_name = 'EUROPE')
            SELECT s_acctbal, s_name, n_name, p_partkey, p_name,
                   round(unit_cost, 6) AS unit_cost
            FROM eps JOIN part ON l_partkey = p_partkey
            WHERE p_size < 20
              AND unit_cost = (SELECT min(unit_cost) FROM eps e2
                               WHERE e2.l_partkey = eps.l_partkey)
            ORDER BY s_acctbal DESC, n_name, s_name, p_partkey LIMIT 100
        """,
        "tpch_q8": """
            SELECT o_year,
                   round(sum(CASE WHEN supp_nation = 'NATION_1' THEN volume ELSE 0.0 END)
                         / sum(volume), 6) AS mkt_share
            FROM (
              SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
                     l_extendedprice * (1 - l_discount) AS volume,
                     n2.n_name AS supp_nation
              FROM lineitem
              JOIN part ON l_partkey = p_partkey
              JOIN orders ON l_orderkey = o_orderkey
              JOIN customer ON o_custkey = c_custkey
              JOIN nation n1 ON c_nationkey = n1.n_nationkey
              JOIN region ON n1.n_regionkey = r_regionkey
              JOIN supplier ON l_suppkey = s_suppkey
              JOIN nation n2 ON s_nationkey = n2.n_nationkey
              WHERE r_name = 'EUROPE' AND p_type = 'STANDARD'
                AND o_orderdate >= TIMESTAMP '1996-01-01'
                AND o_orderdate <= TIMESTAMP '1997-12-31'
            )
            GROUP BY o_year ORDER BY o_year
        """,
        "tpch_q9": """
            SELECT nation, o_year, round(sum(amount), 2) AS sum_profit
            FROM (
              SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
                     l_extendedprice * (1 - l_discount)
                       - 0.6 * p_retailprice * l_quantity AS amount
              FROM lineitem
              JOIN part ON l_partkey = p_partkey
              JOIN supplier ON l_suppkey = s_suppkey
              JOIN orders ON l_orderkey = o_orderkey
              JOIN nation ON s_nationkey = n_nationkey
              WHERE p_name LIKE '%widget%'
            )
            GROUP BY 1, 2 ORDER BY 1, 2
        """,
        "tpch_q11": """
            WITH val AS (SELECT l_partkey, l_extendedprice * (1 - l_discount) AS v
                         FROM lineitem
                         JOIN supplier ON l_suppkey = s_suppkey
                         JOIN nation ON s_nationkey = n_nationkey
                         WHERE n_name = 'NATION_1')
            SELECT l_partkey AS p_key, round(sum(v), 2) AS value
            FROM val GROUP BY 1
            HAVING sum(v) > (SELECT 2.0 * sum(v) / count(DISTINCT l_partkey) FROM val)
            ORDER BY value DESC, p_key ASC
        """,
        "tpch_q12": """
            SELECT CASE WHEN l_shipdate > o_orderdate + INTERVAL 30 DAY
                        THEN 'LATE' ELSE 'ONTIME' END AS ship_bucket,
                   count(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                              THEN 1 END) AS high_line_count,
                   count(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                              THEN 1 END) AS low_line_count
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            WHERE l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate < TIMESTAMP '1997-01-01'
            GROUP BY 1 ORDER BY 1
        """,
        "tpch_q13": """
            SELECT c_count, count(*) AS custdist
            FROM (SELECT c_custkey, count(o_orderkey) AS c_count
                  FROM customer LEFT JOIN orders
                    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
                  GROUP BY c_custkey)
            GROUP BY c_count ORDER BY custdist DESC, c_count DESC
        """,
        "tpch_q15": """
            WITH revenue AS (
              SELECT l_suppkey AS supplier_no,
                     round(sum(l_extendedprice * (1 - l_discount)), 4) AS total_revenue
              FROM lineitem
              WHERE l_shipdate >= TIMESTAMP '1996-01-01'
                AND l_shipdate < TIMESTAMP '1996-04-01'
              GROUP BY 1)
            SELECT s_suppkey, s_name, total_revenue
            FROM supplier JOIN revenue ON s_suppkey = supplier_no
            WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
            ORDER BY s_suppkey
        """,
        "tpch_q16": """
            SELECT p_brand, p_type, p_size,
                   count(DISTINCT l_suppkey) AS supplier_cnt
            FROM lineitem JOIN part ON l_partkey = p_partkey
            WHERE p_brand <> 'Brand#11' AND p_size < 25
              AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
            GROUP BY 1, 2, 3
            ORDER BY supplier_cnt DESC, p_brand ASC, p_type ASC, p_size ASC
        """,
        "tpch_q17": """
            SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly,
                   count(*) AS n_items
            FROM lineitem JOIN part ON l_partkey = p_partkey
            WHERE p_brand = 'Brand#11'
              AND l_quantity < (SELECT 0.5 * avg(l_quantity) FROM lineitem l2
                                WHERE l2.l_partkey = part.p_partkey)
        """,
        "tpch_q20": """
            SELECT s_name, s_acctbal
            FROM supplier
            JOIN nation ON s_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            WHERE r_name = 'EUROPE'
              AND s_suppkey IN (
                SELECT l_suppkey FROM lineitem JOIN part ON l_partkey = p_partkey
                WHERE p_name LIKE '%widget%'
                  AND l_shipdate >= TIMESTAMP '1996-01-01'
                  AND l_shipdate < TIMESTAMP '1997-01-01'
                GROUP BY 1 HAVING sum(l_quantity) > 300)
            ORDER BY s_name
        """,
        "tpch_q21": """
            SELECT s_name, count(*) AS numwait
            FROM lineitem l1
            JOIN orders ON o_orderkey = l1.l_orderkey
            JOIN supplier ON s_suppkey = l1.l_suppkey
            WHERE o_orderstatus = 'F'
              AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
              AND EXISTS (SELECT 1 FROM lineitem l2
                          WHERE l2.l_orderkey = l1.l_orderkey
                            AND l2.l_suppkey <> l1.l_suppkey)
              AND NOT EXISTS (SELECT 1 FROM lineitem l3
                              WHERE l3.l_orderkey = l1.l_orderkey
                                AND l3.l_suppkey <> l1.l_suppkey
                                AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY)
            GROUP BY s_name
            ORDER BY numwait DESC, s_name ASC LIMIT 100
        """,
        "tpch_q22": """
            SELECT cntrycode, count(*) AS numcust, round(sum(c_acctbal), 2) AS totacctbal
            FROM (
              SELECT CAST(c_nationkey % 10 AS BIGINT) AS cntrycode, c_acctbal, c_custkey
              FROM customer
              WHERE c_nationkey % 10 IN (1, 2, 3, 4, 5)
                AND c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0)
                AND NOT EXISTS (SELECT 1 FROM orders
                                WHERE o_custkey = c_custkey
                                  AND o_orderpriority = '1-URGENT')
            )
            GROUP BY 1 ORDER BY 1
        """,
        "tpch_q18": """
            SELECT c_name, o_orderkey, o_totalprice, sum_qty
            FROM (SELECT l_orderkey, sum(l_quantity) AS sum_qty
                  FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 250) big
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 100
        """,
        "multimodal_decode": """
            WITH h AS (SELECT doc_id AS media_id, sha256(text) AS hx FROM documents)
            SELECT media_id,
                   CAST(64 + CAST(('0x' || substring(hx, 1, 2)) AS BIGINT) % 192 AS BIGINT) AS width,
                   CAST(64 + CAST(('0x' || substring(hx, 3, 2)) AS BIGINT) % 192 AS BIGINT) AS height,
                   round(round(CAST(('0x' || substring(hx, 5, 4)) AS BIGINT) / 65536.0, 6), 6) AS f0,
                   round(round(CAST(('0x' || substring(hx, 9, 4)) AS BIGINT) / 65536.0, 6), 6) AS f1
            FROM h
        """,
        "tpch_q5": """
            SELECT n_name,
                   round(sum(l_extendedprice * (1 - l_discount)), 6) AS revenue,
                   count(*) AS n_items
            FROM customer
            JOIN orders ON c_custkey = o_custkey
            JOIN lineitem ON o_orderkey = l_orderkey
            JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
            JOIN nation ON s_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            WHERE r_name = 'ASIA'
              AND o_orderdate >= TIMESTAMP '1996-01-01'
              AND o_orderdate < TIMESTAMP '1997-01-01'
            GROUP BY n_name
        """,
        "tpch_q3": """
            SELECT l_orderkey, o_orderdate, o_orderpriority,
                   round(sum(l_extendedprice * (1 - l_discount)), 6) AS revenue
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            WHERE c_mktsegment = 'BUILDING'
              AND o_orderdate < TIMESTAMP '1998-01-01'
              AND l_shipdate > TIMESTAMP '1998-01-01'
            GROUP BY l_orderkey, o_orderdate, o_orderpriority
            ORDER BY revenue DESC, l_orderkey ASC LIMIT 10
        """,
        "tpch_q4": """
            SELECT o_orderpriority, count(*) AS order_count
            FROM orders o
            WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
              AND o.o_orderdate < TIMESTAMP '1996-07-01'
              AND EXISTS (SELECT 1 FROM lineitem l
                          WHERE l.l_orderkey = o.o_orderkey
                            AND l.l_shipdate > o.o_orderdate)
            GROUP BY o_orderpriority ORDER BY o_orderpriority
        """,
        "tpch_q6": """
            SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
                   count(*) AS n_items
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate < TIMESTAMP '1997-01-01'
              AND l_discount >= 0.04 AND l_discount <= 0.06
              AND l_quantity < 24
        """,
        "tpch_q7": """
            SELECT supp_nation, cust_nation, l_year,
                   round(sum(volume), 4) AS revenue
            FROM (
              SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                     CAST(year(l_shipdate) AS BIGINT) AS l_year,
                     l_extendedprice * (1 - l_discount) AS volume
              FROM lineitem
              JOIN orders ON l_orderkey = o_orderkey
              JOIN customer ON o_custkey = c_custkey
              JOIN supplier ON l_suppkey = s_suppkey
              JOIN nation n1 ON s_nationkey = n1.n_nationkey
              JOIN nation n2 ON c_nationkey = n2.n_nationkey
              WHERE l_shipdate >= TIMESTAMP '1996-01-01'
                AND l_shipdate < TIMESTAMP '1998-01-01'
                AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
                  OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
            )
            GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
        """,
        "tpch_q10": """
            SELECT c_custkey, c_name, c_acctbal, n_name,
                   round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            WHERE l_returnflag = 'R'
              AND o_orderdate >= TIMESTAMP '1996-01-01'
              AND o_orderdate < TIMESTAMP '1996-04-01'
            GROUP BY 1, 2, 3, 4
            ORDER BY revenue DESC, c_custkey ASC LIMIT 20
        """,
        "tpch_q14": """
            SELECT round(sum(CASE WHEN p_type = 'PROMO'
                                  THEN l_extendedprice * (1 - l_discount)
                                  ELSE 0.0 END) * 100.0
                         / sum(l_extendedprice * (1 - l_discount)), 6) AS promo_revenue_pct
            FROM lineitem JOIN part ON l_partkey = p_partkey
            WHERE l_shipdate >= TIMESTAMP '1996-03-01'
              AND l_shipdate < TIMESTAMP '1996-04-01'
        """,
        "tpch_q19": """
            SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
                   count(*) AS n_items
            FROM lineitem JOIN part ON l_partkey = p_partkey
            WHERE (p_brand = 'Brand#11' AND l_quantity BETWEEN 1 AND 11)
               OR (p_brand = 'Brand#22' AND l_quantity BETWEEN 10 AND 20)
               OR (p_brand = 'Brand#33' AND l_quantity BETWEEN 20 AND 30)
        """,
        "join_full_outer": """
            WITH c AS (SELECT c_nationkey AS nationkey, count(*) AS n_cust
                       FROM customer WHERE c_nationkey < 10 GROUP BY 1),
                 s AS (SELECT s_nationkey AS nationkey, count(*) AS n_supp
                       FROM supplier WHERE s_nationkey >= 5 GROUP BY 1)
            SELECT coalesce(c.nationkey, s.nationkey) AS nationkey,
                   coalesce(n_cust, 0) AS n_cust,
                   coalesce(n_supp, 0) AS n_supp
            FROM c FULL OUTER JOIN s ON c.nationkey = s.nationkey
        """,
        "histogram_bins": """
            SELECT CAST(floor(l_extendedprice / 10000) AS BIGINT) AS bin,
                   count(*) AS n, round(avg(l_discount), 6) AS avg_disc
            FROM lineitem GROUP BY 1 ORDER BY 1
        """,
        "join_skew_salted": """
            SELECT s_name, count(*) AS n_items, sum(l_quantity) AS sum_qty
            FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
            GROUP BY s_name
        """,
        "dedup_clusters": "WITH RECURSIVE " + _SHINGLES_LOWER.replace("WITH ", "", 1) + f""",
            hashed AS (SELECT doc_id, {_MINHASH_HASHES} FROM sh),
            sig AS (SELECT doc_id, {_MINHASH_AGGS} FROM hashed GROUP BY doc_id),
            bands AS ({_BAND_SELECTS}),
            pairs AS (
              SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
              FROM bands a JOIN bands b
                ON a.band = b.band AND a.band_sig = b.band_sig AND a.doc_id < b.doc_id
            ),
            edges AS (
              SELECT doc_a AS a, doc_b AS b FROM pairs
              UNION SELECT doc_b, doc_a FROM pairs
            ),
            reach(id, r) AS (
              SELECT a, a FROM edges
              UNION
              SELECT e.b, reach.r FROM reach JOIN edges e ON e.a = reach.id
            )
            SELECT id AS doc_id, min(r) AS cluster_id FROM reach GROUP BY id
        """,
    }
