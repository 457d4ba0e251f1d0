"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)      — flagship: full entity-resolution pipeline (synthetic
                    Common-Crawl-style pages, BASELINE.json input_hint shape)
                    at t1 scale -> entity clusters.
queries()         — one entry per implemented operator (SURVEY.md §2), each
                    (spark, sf_dir) -> DataFrame over the driver testdata.
oracle_sql()      — DuckDB-equivalent ANSI SQL per query (omitted only for
                    genuinely non-SQL-expressible ops -> rows-only check).

Column aliases match between Spark and SQL; outputs avoid order-dependent
float accumulation (sums restricted to integer-valued or exactly-joined
data) so the order-insensitive value hash is bit-stable across engines.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _prep(spark: SparkSession) -> None:
    """Runtime confs every query needs regardless of who built the session."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", "true")


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


# ---------------------------------------------------------------------------
# flagship
# ---------------------------------------------------------------------------


def entry(spark: SparkSession) -> DataFrame:
    """Full ER pipeline at t1 scale: synthetic pages -> records -> blocking
    (minhash-LSH + sorted-neighborhood, salted) -> JVM features -> fused
    pandas-UDF scoring -> connected components -> clusters."""
    _prep(spark)
    from nlp_entity_linking_spark.plans.pipeline import PipelineConfig, run_pipeline
    from nlp_entity_linking_spark.sources.synthetic import gen_pages

    pages, _gold = gen_pages(spark, 1000)
    out = run_pipeline(spark, pages, PipelineConfig())
    clusters = out["clusters"]
    records = out["records"].select("record_id", "url", "norm")
    return clusters.join(records, "record_id").select(
        "record_id", "url", "norm", "cluster_id"
    )


# ---------------------------------------------------------------------------
# queries — each pairs with oracle_sql()[name]
# ---------------------------------------------------------------------------


def q_agg_groupby(spark, sf_dir):
    """F1/F7: hash aggregate with partial (map-side) combine; sums restricted
    to integer-valued doubles so cross-engine hashes are exact."""
    _prep(spark)
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").cast("long").alias("sum_qty"),
            F.count("*").alias("n_rows"),
            F.countDistinct("l_orderkey").alias("n_orders"),
            F.min("l_extendedprice").alias("min_price"),
            F.max("l_extendedprice").alias("max_price"),
        )
    )


def q_filter_pushdown(spark, sf_dir):
    """B2/B3: predicates pushed into the parquet scan (PushedFilters)."""
    _prep(spark)
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= "1995-06-01") & (F.col("l_discount") > 0.05)
        )
        .groupBy("l_returnflag")
        .agg(F.count("*").alias("n"))
    )


def q_join_agg(spark, sf_dir):
    """E1/E2: broadcast-able dim join + aggregate."""
    _prep(spark)
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_orders"),
            F.countDistinct("o_custkey").alias("n_customers"),
            F.max("o_totalprice").alias("max_total"),
        )
    )


def q_window_topk(spark, sf_dir):
    """G2/H3: top-k per group via ranking window (never orderBy+limit)."""
    _prep(spark)
    from pyspark.sql import Window as W

    o = _t(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "rn")
    )


def q_asof_latest(spark, sf_dir):
    """B4/E6: latest row per key (as-of dedup — same shape as
    latest-per-url in the ER pipeline)."""
    _prep(spark)
    from pyspark.sql import Window as W

    e = _t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_id", "event_type")
    )


def q_rollup_docs(spark, sf_dir):
    """F6: rollup grouping sets."""
    _prep(spark)
    d = _t(spark, sf_dir, "documents")
    return d.rollup("lang", "source").agg(F.count("*").alias("n"))


def q_anti_join(spark, sf_dir):
    """E4/H6: NOT EXISTS as left anti join (lineitems of non-urgent orders)."""
    _prep(spark)
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey, "left_anti")
        .groupBy("l_returnflag")
        .agg(F.count("*").alias("n_lines"))
    )


def q_semi_join(spark, sf_dir):
    """E3: EXISTS as left semi join."""
    _prep(spark)
    p = _t(spark, sf_dir, "part")
    li = _t(spark, sf_dir, "lineitem")
    return (
        p.join(li, p.p_partkey == li.l_partkey, "left_semi")
        .groupBy("p_brand")
        .agg(F.count("*").alias("n_parts"))
    )


def q_json_extract(spark, sf_dir):
    """C6/misc: JSON prop parsing (events.props -> struct)."""
    _prep(spark)
    e = _t(spark, sf_dir, "events")
    k = F.from_json("props", "k INT")["k"]
    return (
        e.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(F.sum("k").cast("long").alias("sum_k"), F.count("*").alias("n"))
    )


def q_sessionize(spark, sf_dir):
    """G4/G5: sessionization via lag + gap counting (30-min gap)."""
    _prep(spark)
    from pyspark.sql import Window as W

    e = _t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    # parquet ts is TIMESTAMP_NTZ in Spark 4: NTZ -> LTZ (session=UTC) ->
    # epoch seconds, matching DuckDB's epoch() on naive timestamps.
    epoch = F.col("ts").cast("timestamp_ltz").cast("long")
    gap = epoch - F.lag(epoch).over(w)
    return (
        e.withColumn("new_sess", (gap > 1800).cast("int"))
        .groupBy("user_id")
        .agg((F.sum(F.coalesce("new_sess", F.lit(0))) + 1).alias("n_sessions"))
    )


def q_snb_pairs_docs(spark, sf_dir):
    """D3/E5: sorted-neighborhood pairing over documents (w=2) using the
    scalable rank path (range partition + offsets), oracle'd by a plain
    window self-join."""
    _prep(spark)
    from nlp_entity_linking_spark.operators.blocking import snb_pairs

    d = _t(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("record_id"),
        F.substring("text", 1, 20).alias("norm"),
    )
    return snb_pairs(d, "norm", window=2).select("id_a", "id_b")


def q_levenshtein_parts(spark, sf_dir):
    """C6/G4: built-in levenshtein over lead() neighbor."""
    _prep(spark)
    from pyspark.sql import Window as W

    p = _t(spark, sf_dir, "part")
    w = W.orderBy("p_partkey")
    nxt = F.lead("p_name").over(w)
    return (
        p.withColumn("next_name", nxt)
        .filter(F.col("next_name").isNotNull())
        .select(
            "p_partkey",
            F.levenshtein("p_name", "next_name").alias("dist"),
        )
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "agg_groupby": q_agg_groupby,
        "filter_pushdown": q_filter_pushdown,
        "join_agg": q_join_agg,
        "window_topk": q_window_topk,
        "asof_latest": q_asof_latest,
        "rollup_docs": q_rollup_docs,
        "anti_join": q_anti_join,
        "semi_join": q_semi_join,
        "json_extract": q_json_extract,
        "sessionize": q_sessionize,
        "snb_pairs_docs": q_snb_pairs_docs,
        "levenshtein_parts": q_levenshtein_parts,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "agg_groupby": """
            SELECT l_returnflag, l_linestatus,
                   CAST(sum(l_quantity) AS BIGINT) AS sum_qty,
                   count(*) AS n_rows,
                   count(DISTINCT l_orderkey) AS n_orders,
                   min(l_extendedprice) AS min_price,
                   max(l_extendedprice) AS max_price
            FROM lineitem GROUP BY l_returnflag, l_linestatus
        """,
        "filter_pushdown": """
            SELECT l_returnflag, count(*) AS n
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1995-06-01' AND l_discount > 0.05
            GROUP BY l_returnflag
        """,
        "join_agg": """
            SELECT c_mktsegment,
                   count(*) AS n_orders,
                   count(DISTINCT o_custkey) AS n_customers,
                   max(o_totalprice) AS max_total
            FROM orders JOIN customer ON o_custkey = c_custkey
            GROUP BY c_mktsegment
        """,
        "window_topk": """
            SELECT o_custkey, o_orderkey, rn FROM (
              SELECT o_custkey, o_orderkey,
                     row_number() OVER (PARTITION BY o_custkey
                                        ORDER BY o_totalprice DESC, o_orderkey) AS rn
              FROM orders) WHERE rn <= 3
        """,
        "asof_latest": """
            SELECT user_id, event_id, event_type FROM (
              SELECT user_id, event_id, event_type,
                     row_number() OVER (PARTITION BY user_id
                                        ORDER BY ts DESC, event_id DESC) AS rn
              FROM events) WHERE rn = 1
        """,
        "rollup_docs": """
            SELECT lang, source, count(*) AS n
            FROM documents GROUP BY ROLLUP (lang, source)
        """,
        "anti_join": """
            SELECT l_returnflag, count(*) AS n_lines
            FROM lineitem
            WHERE NOT EXISTS (SELECT 1 FROM orders
                              WHERE o_orderkey = l_orderkey
                                AND o_orderpriority = '1-URGENT')
            GROUP BY l_returnflag
        """,
        "semi_join": """
            SELECT p_brand, count(*) AS n_parts
            FROM part
            WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_partkey = p_partkey)
            GROUP BY p_brand
        """,
        "json_extract": """
            SELECT event_type,
                   CAST(sum(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
                   count(*) AS n
            FROM events GROUP BY event_type
        """,
        "sessionize": """
            SELECT user_id, CAST(sum(new_sess) + 1 AS BIGINT) AS n_sessions FROM (
              SELECT user_id,
                     CASE WHEN epoch(ts) - lag(epoch(ts)) OVER
                          (PARTITION BY user_id ORDER BY ts, event_id) > 1800
                          THEN 1 ELSE 0 END AS new_sess
              FROM events) GROUP BY user_id
        """,
        "snb_pairs_docs": """
            WITH r AS (
              SELECT doc_id, row_number() OVER
                     (ORDER BY substr(text, 1, 20), doc_id) AS rn
              FROM documents)
            SELECT least(a.doc_id, b.doc_id) AS id_a,
                   greatest(a.doc_id, b.doc_id) AS id_b
            FROM r a JOIN r b ON b.rn > a.rn AND b.rn - a.rn <= 2
        """,
        "levenshtein_parts": """
            SELECT p_partkey, levenshtein(p_name, next_name) AS dist FROM (
              SELECT p_partkey, p_name,
                     lead(p_name) OVER (ORDER BY p_partkey) AS next_name
              FROM part) WHERE next_name IS NOT NULL
        """,
    }
