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


def q_url_canon_docs(spark, sf_dir):
    """Webtext staple: URL canonicalization, component-anchored (scheme/
    authority lowercase, scheme-conditional default-port strip on the
    authority only, tracking params dropped from the query only, fragment
    drop, trailing path slash). Messy urls are synthesized deterministically
    from doc_id so every rule fires AND every mangle-trap appears (port
    lookalikes in paths, literal '&' in paths, '/' in query values, wrong
    default port for the scheme, '&' runs and leading/dangling query
    separators); the oracle builds the identical strings
    and applies the identical RE2-safe component logic (replacement dialect
    mapped, global flag explicit)."""
    _prep(spark)
    from nlp_entity_linking_spark.functions.urls import canonical_url

    d = _t(spark, sf_dir, "documents")
    i = F.col("doc_id")
    sch = F.when(i % 2 == 0, F.lit("HTTP")).otherwise(F.lit("HTTPS"))
    # i%3==0: the scheme's own default port (must strip); i%3==1: the OTHER
    # scheme's default port (must keep); else no port.
    port = (
        F.when(i % 3 == 0, F.when(i % 2 == 0, F.lit(":80")).otherwise(F.lit(":443")))
        .when(i % 3 == 1, F.when(i % 2 == 0, F.lit(":443")).otherwise(F.lit(":80")))
        .otherwise(F.lit(""))
    )
    url = F.concat(
        sch, F.lit("://Site"), (i % 20).cast("string"), F.lit(".Example.COM"),
        port,
        F.lit("/Path"), (i % 5).cast("string"),
        F.when(i % 7 == 0, F.lit("/a:443/b&c")).otherwise(F.lit("")),
        F.when(i % 4 == 0, F.lit("/")).otherwise(F.lit("")),
        F.when(
            i % 2 == 0,
            F.concat(
                F.lit("?utm_source=a&id="), i.cast("string"),
                F.lit("&gclid=zz&next=/"),
            ),
        ).otherwise(F.lit("?&utm_campaign=c")),
        # separator mess: '&' run + dangling '&' (must collapse/strip)
        F.when(i % 5 == 0, F.lit("&&dup=1&")).otherwise(F.lit("")),
        F.lit("#sec"), (i % 3).cast("string"),
    )
    return d.select(
        "doc_id", url.alias("url"), canonical_url(url).alias("canon")
    )


def q_variant_events(spark, sf_dir):
    """Spark 4 VARIANT path for semi-structured props: parse_json -> open
    VariantType column -> typed variant_get extraction (vs q_json_extract's
    schema-ful from_json). Same ANSI-SQL-mirrorable output: per-type counts
    of events whose props.k clears a threshold, plus min/max of k."""
    _prep(spark)
    e = _t(spark, sf_dir, "events")
    k = F.try_variant_get(F.parse_json("props"), "$.k", "int")
    return (
        e.select("event_type", k.alias("k"))
        .filter(F.col("k") >= 50)
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
    )


def q_percent_rank_orders(spark, sf_dir):
    """G2 breadth: percent_rank + cume_dist windows (deciles of order value
    within market segment; int outputs for cross-engine hashing)."""
    _prep(spark)
    from pyspark.sql import Window as W

    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    j = o.join(c, o.o_custkey == c.c_custkey).select(
        "c_mktsegment", "o_orderkey", "o_totalprice"
    )
    w = W.partitionBy("c_mktsegment").orderBy("o_totalprice", "o_orderkey")
    return (
        j.select(
            "c_mktsegment",
            F.floor(F.percent_rank().over(w) * 10).cast("long").alias("pr_decile"),
            F.floor(F.cume_dist().over(w) * 10).cast("long").alias("cd_decile"),
        )
        .groupBy("c_mktsegment", "pr_decile", "cd_decile")
        .agg(F.count("*").alias("n"))
    )


def q_lateral_orders(spark, sf_dir):
    """E breadth: LATERAL correlated subquery — each customer's max order
    price and count via a lateral per-row subquery (Catalyst rewrites to a
    join; DuckDB runs the same ANSI LATERAL)."""
    _prep(spark)
    _t(spark, sf_dir, "customer").createOrReplaceTempView("_cust_l")
    _t(spark, sf_dir, "orders").createOrReplaceTempView("_ord_l")
    return spark.sql(
        """
        SELECT c.c_custkey, l.max_price, l.n_orders
        FROM _cust_l c,
        LATERAL (
          SELECT max(o_totalprice) AS max_price, count(*) AS n_orders
          FROM _ord_l o WHERE o.o_custkey = c.c_custkey
        ) l
        WHERE l.n_orders > 0
        """
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


# --- batch 2: training-data-pipeline operators (dedup / text / ANN) --------

_NORM_SQL = (
    "trim(regexp_replace(regexp_replace(lower({c}), '[^a-z0-9 ]', ' ', 'g'),"
    " ' +', ' ', 'g'))"
)
_TOKS_SQL = (
    "list_filter(string_split(" + _NORM_SQL + ", ' '), x -> x <> '')"
)
# DuckDB mirror of functions.normalize.word_ngrams(toks, 3) incl. the
# empty -> [] and 0<len<3 -> [whole string] fallbacks (`{t}` = token list).
_GRAMS3_SQL = (
    "CASE WHEN len({t}) = 0 THEN []::VARCHAR[] "
    "WHEN len({t}) < 3 THEN [array_to_string({t}, ' ')] "
    "ELSE list_transform(range(1, len({t}) - 1), "
    "i -> array_to_string({t}[i:i+2], ' ')) END"
)
# DuckDB mirror of word_ngrams(toks, 2), same fallbacks as _GRAMS3_SQL.
_GRAMS2_SQL = (
    "CASE WHEN len({t}) = 0 THEN []::VARCHAR[] "
    "WHEN len({t}) < 2 THEN [array_to_string({t}, ' ')] "
    "ELSE list_transform(range(1, len({t})), "
    "i -> array_to_string({t}[i:i+1], ' ')) END"
)
# DuckDB mirror of functions.textstats.md5_long: first 60 md5 bits as BIGINT.
_MD5LONG_SQL = "CAST('0x' || substr(md5({c}), 1, 15) AS BIGINT)"


def _minhash_md5_sql(k: int = 16, bands: int = 4) -> str:
    """DuckDB mirror of q_minhash_md5_pipeline: full minhash-LSH on
    md5-derived 60-bit hashes (signatures, band keys, pairs, Jaccard)."""
    r = k // bands

    def md5l(x: str) -> str:
        return f"CAST('0x' || substr(md5({x}), 1, 15) AS BIGINT)"

    sig_exprs = ",\n                 ".join(
        f"list_min(list_transform(sh, s -> {md5l(f'concat({i}, chr(58), s)')}))"
        f" AS s{i}"
        for i in range(k)
    )
    band_exprs = ", ".join(
        md5l("concat_ws(',', " + ", ".join(f"s{b * r + j}" for j in range(r)) + ")")
        for b in range(bands)
    )
    toks = _TOKS_SQL.format(c="text")
    grams = _GRAMS3_SQL.format(t="toks")
    return f"""
        WITH t AS (SELECT doc_id, {toks} AS toks FROM documents),
             g AS (SELECT doc_id, list_distinct({grams}) AS sh FROM t
                   WHERE len(list_distinct({grams})) > 0),
             s AS (SELECT doc_id, sh,
                 {sig_exprs}
                   FROM g),
             bl AS (SELECT doc_id, sh, unnest([{band_exprs}]) AS bkey FROM s),
             p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                          len(list_filter(a.sh, x -> list_contains(b.sh, x)))
                            AS inter,
                          len(a.sh) + len(b.sh)
                          - len(list_filter(a.sh, x -> list_contains(b.sh, x)))
                            AS un
                   FROM bl a JOIN bl b
                     ON a.bkey = b.bkey AND a.doc_id < b.doc_id),
             q AS (SELECT DISTINCT id_a, id_b, inter / un AS jaccard FROM p)
        SELECT id_a, id_b, jaccard, jaccard >= 0.5 AS is_dup FROM q
    """


def _rp_bucket_sql(n_planes: int = 8) -> str:
    """DuckDB mirror of operators.ann.quantized_rp_bucket over a quantized
    BIGINT vector column `qv`: same LCG-derived Rademacher signs, same exact
    integer projection sign, same bit packing."""
    parts = []
    for p in range(n_planes):
        sign = (
            f"(1 - 2 * ((((1103515245*(d + {64 * p}) + 12345) % 2147483648)"
            " >> 16) & 1))"
        )
        proj = f"list_sum(list_transform(range(1, len(qv)+1), d -> qv[d] * {sign}))"
        parts.append(f"(CASE WHEN {proj} > 0 THEN {1 << p} ELSE 0 END)")
    return " + ".join(parts)


def q_exact_dedup_docs(spark, sf_dir):
    """Dedup family #1: exact (hash-groupBy on normalized-text digest)."""
    _prep(spark)
    from nlp_entity_linking_spark.operators.dedup import exact_dedup

    return exact_dedup(_t(spark, sf_dir, "documents"))


def q_token_jaccard_docs(spark, sf_dir):
    """Dedup family #4 metric: token-set Jaccard on consecutive doc pairs."""
    _prep(spark)
    from nlp_entity_linking_spark.operators.dedup import ngram_jaccard_pairs

    d = _t(spark, sf_dir, "documents")
    pairs = d.select(F.col("doc_id").alias("id_a")).withColumn(
        "id_b", F.col("id_a") + 1
    ).join(
        d.select(F.col("doc_id").alias("id_b")), "id_b", "left_semi"
    )
    return ngram_jaccard_pairs(d, pairs, n=1)


def q_containment_docs(spark, sf_dir):
    """Dedup family #4b: Broder CONTAINMENT (|A∩B|/|A|, both directions) on
    deterministic consecutive pairs — the asymmetric excerpt/quote detector
    Jaccard dilutes. int/int divisions -> cross-engine exact."""
    _prep(spark)
    from nlp_entity_linking_spark.operators.dedup import ngram_containment_pairs

    d = _t(spark, sf_dir, "documents")
    return ngram_containment_pairs(d, _consecutive_doc_pairs(d), n=1)


def q_minhash_dedup_docs(spark, sf_dir):
    """Dedup family #2: MinHash+LSH near-dup groups (xxhash64-based — no SQL
    oracle; driver records rows-only, pytest covers semantics)."""
    _prep(spark)
    from nlp_entity_linking_spark.operators.dedup import minhash_dedup

    return minhash_dedup(_t(spark, sf_dir, "documents"))


def q_kmv_rollup_events(spark, sf_dir):
    """Mergeable-sketch rollup, hash-checked end to end: KMV (bottom-k)
    distinct sketches of user_id built per (event_type, day), then MERGED
    to per-event_type totals without re-reading raw data — the exact
    deterministic twin of the HLL sketch path (functions/sketches.py),
    md5-60bit hashes reproduced bit-for-bit by DuckDB. Output: retained
    summary size, the KMV estimate, and the exact distinct for context —
    all BIGINT."""
    _prep(spark)
    from nlp_entity_linking_spark.functions.sketches import (
        kmv_merge,
        kmv_sketch_per_group,
    )

    e = _t(spark, sf_dir, "events").select(
        "event_type",
        F.to_date("ts").alias("day"),
        F.col("user_id").cast("string").alias("uid"),
    )
    fine = kmv_sketch_per_group(e, ["event_type", "day"], "uid", k=64)
    merged = kmv_merge(fine, ["event_type"], k=64)
    exact = (
        _t(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("exact_distinct"))
    )
    return merged.join(exact, "event_type").select(
        "event_type", "n_retained", "est_distinct", "exact_distinct"
    )


def q_simhash_docs(spark, sf_dir):
    """Dedup family #3: 64-bit SimHash signatures via the codegen scale form
    (explode + 64 JVM sum aggregates; rows-only check — xxhash64 has no
    DuckDB mirror; pytest proves equality with the row-local column form)."""
    _prep(spark)
    from nlp_entity_linking_spark.functions.normalize import normalize, tokenize
    from nlp_entity_linking_spark.operators.dedup import simhash_signatures_df

    d = _t(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("record_id"), tokenize(normalize("text")).alias("toks")
    )
    return simhash_signatures_df(d, tokens_col="toks").select(
        F.col("record_id").alias("doc_id"), F.col("sig").alias("simhash")
    )


def _consecutive_doc_pairs(d):
    """Deterministic candidate pairs (doc_id, doc_id+1) — the fixed pair set
    the verify-stage oracles run the match math on."""
    return (
        d.select(F.col("doc_id").alias("id_a"))
        .withColumn("id_b", F.col("id_a") + 1)
        .join(d.select(F.col("doc_id").alias("id_b")), "id_b", "left_semi")
    )


def q_minhash_verify_docs(spark, sf_dir):
    """VERIFY stage of the minhash-LSH family, hash-checked: exact distinct
    word-3-gram Jaccard + the 0.7 duplicate decision on deterministic
    candidate pairs — the same math minhash_dedup applies to LSH survivors.
    (Only the xxhash64 banding step remains rows-only, in
    q_minhash_dedup_docs.)"""
    _prep(spark)
    from nlp_entity_linking_spark.functions.normalize import (
        normalize,
        tokenize,
        word_ngrams,
    )

    d = _t(spark, sf_dir, "documents")
    g = d.select(
        "doc_id",
        F.array_distinct(word_ngrams(tokenize(normalize("text")), 3)).alias("_g"),
    )
    a = g.select(F.col("doc_id").alias("id_a"), F.col("_g").alias("ga"))
    b = g.select(F.col("doc_id").alias("id_b"), F.col("_g").alias("gb"))
    inter = F.size(F.array_intersect("ga", "gb"))
    union = F.size(F.array_union("ga", "gb"))
    jac = F.when(union > 0, inter / union)
    return (
        _consecutive_doc_pairs(d)
        .join(a, "id_a")
        .join(b, "id_b")
        .select(
            "id_a",
            "id_b",
            jac.alias("jaccard"),
            (jac >= 0.7).alias("is_dup"),
        )
    )


def q_minhash_md5_pipeline(spark, sf_dir):
    """The ENTIRE minhash-LSH near-dup pipeline hash-checked cross-engine:
    k=16 minhash signatures over distinct word-3-gram shingles, 4-band LSH
    keys, within-band candidate pairs, exact-Jaccard verify — all on
    md5-derived 60-bit hashes DuckDB computes bit-identically. The xxhash64
    production variant (operators/dedup.minhash_dedup) keeps its rows-only
    row; this twin proves the MACHINERY end to end."""
    _prep(spark)
    from nlp_entity_linking_spark.functions.normalize import (
        normalize,
        tokenize,
        word_ngrams,
    )
    from nlp_entity_linking_spark.functions.textstats import md5_long

    k, bands = 16, 4
    r = k // bands
    d = _t(spark, sf_dir, "documents")
    g = d.select(
        "doc_id",
        F.array_distinct(word_ngrams(tokenize(normalize("text")), 3)).alias("sh"),
    ).filter(F.size("sh") > 0)
    sig_cols = [
        F.array_min(
            F.transform(F.col("sh"), lambda s, i=i: md5_long(F.concat(F.lit(f"{i}:"), s)))
        ).alias(f"_s{i}")
        for i in range(k)
    ]
    s = g.select("doc_id", "sh", *sig_cols)
    band_cols = [
        md5_long(
            F.concat_ws(
                ",", *[F.col(f"_s{b * r + j}").cast("string") for j in range(r)]
            )
        )
        for b in range(bands)
    ]
    blocks = s.select(
        "doc_id", "sh", F.explode(F.array(*band_cols)).alias("bkey")
    )
    a = blocks.select(
        F.col("doc_id").alias("id_a"), F.col("sh").alias("sha"), "bkey"
    )
    b = blocks.select(
        F.col("doc_id").alias("id_b"), F.col("sh").alias("shb"), "bkey"
    )
    inter = F.size(F.array_intersect("sha", "shb"))
    union = F.size(F.array_union("sha", "shb"))
    return (
        a.join(b, "bkey")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", (inter / union).alias("jaccard"))
        .dropDuplicates(["id_a", "id_b"])
        .withColumn("is_dup", F.col("jaccard") >= 0.5)
    )


def q_simhash_verify_docs(spark, sf_dir):
    """VERIFY stage of the simhash family, hash-checked: Hamming distance
    via bit_count(xor) + the <=3 duplicate decision on 60-bit md5-derived
    signatures both engines compute identically. (The xxhash64 signature
    itself stays rows-only in q_simhash_docs with a pytest equality proof.)"""
    _prep(spark)
    from nlp_entity_linking_spark.functions.normalize import normalize
    from nlp_entity_linking_spark.functions.textstats import md5_long

    d = _t(spark, sf_dir, "documents")
    s = d.select("doc_id", md5_long(normalize("text")).alias("_sig"))
    a = s.select(F.col("doc_id").alias("id_a"), F.col("_sig").alias("sa"))
    b = s.select(F.col("doc_id").alias("id_b"), F.col("_sig").alias("sb"))
    ham = F.bit_count(F.col("sa").bitwiseXOR(F.col("sb")))
    return (
        _consecutive_doc_pairs(d)
        .join(a, "id_a")
        .join(b, "id_b")
        .select(
            "id_a",
            "id_b",
            ham.cast("int").alias("hamming"),
            (ham <= 3).alias("is_dup"),
        )
    )


def q_rolling_fp_verify_docs(spark, sf_dir):
    """Winnowing fingerprint selection math, hash-checked end-to-end on the
    md5-twin (rolling_fingerprints_md5): same sliding windows, same
    keep-if-hash%16==0 rule as the xxhash64 production sketch."""
    _prep(spark)
    from nlp_entity_linking_spark.functions.textstats import rolling_fingerprints_md5

    d = _t(spark, sf_dir, "documents")
    kept = rolling_fingerprints_md5("text")
    return d.select(
        "doc_id",
        F.size(kept).alias("n_fps"),
        F.array_min(kept).alias("min_fp"),
        F.array_max(kept).alias("max_fp"),
    )


def _planted_caps():
    """The synthetic docs are all-lowercase; capitalize tokens starting a-f
    deterministically (same rule mirrored in the oracles) so the engine's
    capitalized-run mention extraction finds realistic surface runs."""
    return F.array_join(
        F.transform(
            F.split(F.col("text"), " "),
            lambda t: F.when(
                t.substr(1, 1).rlike("^[a-f]"),
                F.concat(F.upper(t.substr(1, 1)), t.substr(F.lit(2), F.length(t))),
            ).otherwise(t),
        ),
        " ",
    )


def q_mentions_regex_docs(spark, sf_dir):
    """C5 plain-text mention path: capitalized-run mentions via JVM
    regexp_extract_all + explode (one row per mention)."""
    _prep(spark)
    from nlp_entity_linking_spark.functions.extract import extract_mentions_text

    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id", F.explode(extract_mentions_text(_planted_caps())).alias("mention")
    )


def q_linking_docs(spark, sf_dir):
    """The namesake capability on the driver scoreboard: dictionary KB
    entity linking with the collective one-entity-per-discourse pass
    (operators/linking.py — alias cap, candidate equi-join, integer
    context-overlap x 2^40 + prior scores, decimal vote sum, deterministic
    argmax).

    Mentions come from the engine's capitalized-run extraction over the
    documents table (same planted-capitalization rule as
    mentions_regex_docs). The KB derives deterministically from the
    distinct mention surfaces: two candidate entities per alias whose
    ids/priors are md5-60bit integers (the proven cross-engine trick) and
    whose descriptions differ by one corpus token ('spark' vs 'vector' —
    neither can appear inside an alias, which holds only a-f-initial
    words), so context overlap picks a per-document winner and the prior
    breaks overlap ties, entity_id makes the order total. Output: the
    collectively chosen entity per (doc, alias) + mention multiplicity —
    all ints/strings, hash-stable."""
    _prep(spark)
    from nlp_entity_linking_spark.functions.normalize import normalize
    from nlp_entity_linking_spark.operators import linking as L

    d = _t(spark, sf_dir, "documents")
    mentions = L.mentions_from_documents(
        d.select("doc_id", _planted_caps().alias("text"))
    )

    def md5long(c):
        return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")

    al = mentions.select(normalize("surface").alias("alias")).distinct()
    kb = None
    for k, extra in ((1, "spark"), (2, "vector")):
        part = al.select(
            "alias",
            md5long(F.concat(F.col("alias"), F.lit(f"#{k}"))).alias("entity_id"),
            (md5long(F.concat(F.col("alias"), F.lit(f"p{k}"))) % 900 + 100).alias(
                "prior"
            ),
            F.concat(F.split("alias", " "), F.array(F.lit(extra))).alias(
                "desc_tokens"
            ),
        )
        kb = part if kb is None else kb.unionByName(part)
    linked = L.link_pipeline(mentions, kb, n_cand=16, collective=True)
    return linked.groupBy("doc_id", "alias_norm", "entity_id").agg(
        F.count("*").alias("n_mentions")
    )


def q_grouping_sets_sql(spark, sf_dir):
    """F6 proper GROUPING SETS via the SQL API (rollup/cube are the sugared
    forms, oracle-green elsewhere)."""
    _prep(spark)
    _t(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem_v")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               count(*) AS n,
               CAST(sum(l_quantity) AS BIGINT) AS sum_qty
        FROM lineitem_v
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        """
    )


def q_neardup_rp_verify(spark, sf_dir):
    """The FULL embedding near-dup pipeline (bucket -> pair -> exact-cosine
    verify), hash-checked: random-hyperplane buckets in exact integer
    arithmetic (quantized_rp_bucket — deterministic Rademacher planes, no
    float sign hazard), so DuckDB reproduces block AND verify bit-for-bit.
    The production path (numpy planes, q_neardup_embeddings_lsh) stays
    rows-only; this proves the blocking/verify MACHINERY cross-engine."""
    _prep(spark)
    from nlp_entity_linking_spark.operators.ann import cosine, quantized_rp_bucket

    e = _t(spark, sf_dir, "embeddings")
    b = e.select(
        "vec_id",
        F.col("embedding").alias("_v"),
        quantized_rp_bucket("embedding", n_planes=8).alias("_bkt"),
    )
    a = b.select(
        F.col("vec_id").alias("id_a"), F.col("_v").alias("va"), "_bkt"
    )
    c = b.select(
        F.col("vec_id").alias("id_b"), F.col("_v").alias("vb"), "_bkt"
    )
    cos6 = F.round(cosine(F.col("va"), F.col("vb")), 6)
    return (
        a.join(c, "_bkt")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", cos6.alias("cos6"))
        .filter(F.col("cos6") >= 0.35)
        .dropDuplicates(["id_a", "id_b"])
    )


def q_ivf_verify(spark, sf_dir):
    """The FULL IVF-Flat pipeline (cell-assign -> n_probe probe -> equi-join
    -> exact-cosine verify -> top-k), hash-checked: cell assignment via
    quantized_ivf_cells (integer Rademacher 'centroids', exact argmax), so
    DuckDB reproduces assignment, probe AND verify bit-for-bit. The
    production path (KMeans centroids on a bounded sample, ivf_topk) stays
    pytest-verified; this proves the probe/verify MACHINERY cross-engine."""
    _prep(spark)
    from pyspark.sql import Window as W

    from nlp_entity_linking_spark.operators.ann import (
        cosine,
        quantized_ivf_cells,
    )

    e = _t(spark, sf_dir, "embeddings")
    corpus_cells = quantized_ivf_cells(
        e, "vec_id", "embedding", n_cells=8, n_probe=1
    ).select("vec_id", "cell")
    q = e.filter(F.col("vec_id") % 53 == 0)
    probes = quantized_ivf_cells(
        q, "vec_id", "embedding", n_cells=8, n_probe=2
    ).select(F.col("vec_id").alias("query_id"), "cell")
    # corpus rows sit in exactly 1 cell and a query's probe cells are
    # distinct, so (query_id, vec_id) is already unique — no dedup exchange
    cand = corpus_cells.join(F.broadcast(probes), "cell").select(
        "query_id", "vec_id"
    )
    cv = e.select("vec_id", F.col("embedding").alias("_cv"))
    qv = q.select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("_qv"))
    sims = (
        cand.join(cv, "vec_id")
        .join(F.broadcast(qv), "query_id")
        .select(
            "query_id",
            "vec_id",
            F.round(cosine(F.col("_qv"), F.col("_cv")), 6).alias("_c"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.desc("_c"), F.asc("vec_id"))
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 10)
        .select("query_id", "vec_id", "rank")
    )


def q_string_funcs_parts(spark, sf_dir):
    """C6 breadth: the string built-in surface (upper/lower/substring/
    replace/lpad/concat_ws/length/reverse) — all JVM codegen, all
    DuckDB-mirrorable."""
    _prep(spark)
    p = _t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("u"),
        F.substring("p_name", 3, 8).alias("sub"),
        F.replace(F.col("p_name"), F.lit(" "), F.lit("_")).alias("repl"),
        F.lpad(F.col("p_brand"), 12, "#").alias("pad"),
        F.concat_ws("|", "p_brand", "p_type").alias("cat"),
        F.length("p_name").alias("len"),
        F.reverse(F.col("p_brand")).alias("rev"),
    )


def q_union_docs(spark, sf_dir):
    """H4 breadth: UNION ALL + distinct over two overlapping doc slices."""
    _prep(spark)
    d = _t(spark, sf_dir, "documents")
    a = d.filter(F.col("doc_id") < 300).select("doc_id", "lang")
    b = d.filter((F.col("doc_id") >= 200) & (F.col("doc_id") < 400)).select(
        "doc_id", "lang"
    )
    return (
        a.unionByName(b)
        .distinct()
        .groupBy("lang")
        .agg(F.count("*").alias("n"))
    )


def q_ntile_orders(spark, sf_dir):
    """G2 breadth: ntile quartiles by order value within market segment —
    exact (integer) window output both engines compute identically."""
    _prep(spark)
    from pyspark.sql import Window as W

    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    j = o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
    w = W.partitionBy("c_mktsegment").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        j.withColumn("q", F.ntile(4).over(w))
        .groupBy("c_mktsegment", "q")
        .agg(F.count("*").alias("n"), F.min("o_orderkey").alias("min_order"))
    )


def q_unpivot_lineitem(spark, sf_dir):
    """Pivot's inverse: wide per-returnflag quantity/price sums -> long
    (metric, val) rows via DataFrame unpivot (SQL UNPIVOT in the oracle)."""
    _prep(spark)
    li = _t(spark, sf_dir, "lineitem")
    wide = li.groupBy("l_returnflag").agg(
        F.sum("l_quantity").cast("long").alias("qty"),
        F.count("*").alias("rows"),
        F.countDistinct("l_orderkey").alias("orders"),
    )
    return wide.unpivot("l_returnflag", ["qty", "rows", "orders"], "metric", "val")


def q_median_qty(spark, sf_dir):
    """F7 breadth: exact median + interpolated percentile — integer-valued
    inputs make the type-7 linear interpolation bit-exact cross-engine."""
    _prep(spark)
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.median("l_quantity").alias("med_qty"),
        F.percentile("l_quantity", F.lit(0.25)).alias("p25_qty"),
        F.count("*").alias("n"),
    )


def q_datetime_parts(spark, sf_dir):
    """C6/G breadth: calendar extraction (year/dow/hour/dayofyear). Spark
    dayofweek is 1=Sunday; the DuckDB oracle shifts its 0=Sunday by +1."""
    _prep(spark)
    e = _t(spark, sf_dir, "events")
    return (
        e.select(
            F.dayofweek("ts").alias("dow"),
            F.hour("ts").alias("hr"),
            F.dayofyear("ts").alias("doy"),
        )
        .groupBy("dow", "hr")
        .agg(F.count("*").alias("n"), F.max("doy").alias("max_doy"))
    )


def q_quality_docs(spark, sf_dir):
    """Text analysis: quality features (int counts + exact int-ratio doubles)."""
    _prep(spark)
    from nlp_entity_linking_spark.functions.textstats import quality_features

    d = _t(spark, sf_dir, "documents")
    f = quality_features(F.col("text"))
    return d.select(
        "doc_id",
        f["n_tokens"].alias("n_tokens"),
        f["distinct_ratio"].alias("distinct_ratio"),
        f["stopword_ratio"].alias("stopword_ratio"),
    )


def q_langid_docs(spark, sf_dir):
    """Text analysis: heuristic language-ID distribution."""
    _prep(spark)
    from nlp_entity_linking_spark.functions.textstats import lang_id

    d = _t(spark, sf_dir, "documents")
    return d.select(lang_id("text").alias("lang_guess")).groupBy("lang_guess").agg(
        F.count("*").alias("n")
    )


def q_token_counts_docs(spark, sf_dir):
    """Text analysis: whitespace + BPE-ish token counts."""
    _prep(spark)
    from nlp_entity_linking_spark.functions.textstats import (
        token_count_bpe,
        token_count_ws,
    )

    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        token_count_ws("text").cast("long").alias("n_ws"),
        token_count_bpe("text").cast("long").alias("n_bpe"),
    )


def q_fingerprint_docs(spark, sf_dir):
    """Text analysis: md5 document fingerprint (canonical, oracle-exact)."""
    _prep(spark)
    from nlp_entity_linking_spark.functions.textstats import fingerprint_md5

    d = _t(spark, sf_dir, "documents")
    return d.select("doc_id", fingerprint_md5("text").alias("fp"))


def q_repetition_docs(spark, sf_dir):
    """Gopher/C4 repetition quality filters per document: duplicate-line
    fraction (row-local line arrays) + top word-2-gram fraction (explode ->
    codegen counts -> per-doc max/sum). Int/int ratios -> hash-exact."""
    _prep(spark)
    from nlp_entity_linking_spark.functions.textstats import repetition_stats

    return repetition_stats(_t(spark, sf_dir, "documents"))


def q_rolling_fp_docs(spark, sf_dir):
    """Text analysis: winnowing-style rolling fingerprints (rows-only)."""
    _prep(spark)
    from nlp_entity_linking_spark.functions.textstats import rolling_fingerprints

    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id", F.size(rolling_fingerprints("text")).alias("n_fps")
    )


def q_ann_topk(spark, sf_dir):
    """Similarity search: brute-force cosine top-k (rank by rounded cosine,
    ties by id — cross-engine deterministic ints out)."""
    _prep(spark)
    from pyspark.sql import Window as W

    from nlp_entity_linking_spark.operators.ann import cosine

    e = _t(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("_qv")
    )
    sims = e.join(F.broadcast(q)).select(
        "query_id",
        "vec_id",
        F.round(cosine(F.col("_qv"), F.col("embedding")), 6).alias("_c"),
    )
    w = W.partitionBy("query_id").orderBy(F.desc("_c"), F.asc("vec_id"))
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 10)
        .select("query_id", "vec_id", "rank")
    )


def q_embed_cos_pairs(spark, sf_dir):
    """Embedding cosine pairs above threshold (exact, bounded id range so
    the O(n^2) oracle stays cheap)."""
    _prep(spark)
    from nlp_entity_linking_spark.operators.ann import cosine

    e = _t(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 300)
    a = e.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("va"))
    b = e.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("vb"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", F.round(cosine(F.col("va"), F.col("vb")), 6).alias("cos6"))
        .filter(F.col("cos6") >= 0.35)
    )


def q_neardup_embeddings_lsh(spark, sf_dir):
    """Dedup family #5: embedding-cosine near-dup via random-hyperplane LSH
    (approximate -> rows-only check; exact-path oracle is q_embed_cos_pairs)."""
    _prep(spark)
    from nlp_entity_linking_spark.operators.ann import cosine_neardup_pairs

    e = _t(spark, sf_dir, "embeddings")
    return cosine_neardup_pairs(e, threshold=0.35, n_planes=6, n_tables=8)


def q_ivf_topk_embeddings(spark, sf_dir):
    """Production IVF-Flat path: KMeans coarse quantizer trained on a
    bounded deterministic sample, inverted-list probe, exact-cosine verify.
    Approximate (data-dependent centroids) -> rows-only driver check; the
    probe/verify machinery has its own oracle row (q:ivf_verify) and recall
    is pytest-gated vs brute force (test_ann)."""
    _prep(spark)
    from nlp_entity_linking_spark.operators.ann import ivf_topk

    e = _t(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") % 53 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return ivf_topk(e, q, k=10, n_cells=8, n_probe=3, seed=7)


def q_window_tumbling(spark, sf_dir):
    """ST4 batch analog: tumbling 1-hour event windows."""
    _prep(spark)
    e = _t(spark, sf_dir, "events")
    win = F.window(F.col("ts"), "1 hour")
    return (
        e.groupBy(win.alias("w"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(
            F.col("w.start").cast("timestamp_ltz").cast("long").alias("win_start"),
            "event_type",
            "n",
        )
    )


def q_cube_agg(spark, sf_dir):
    """F6: CUBE grouping sets."""
    _prep(spark)
    li = _t(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("n"), F.sum("l_quantity").cast("long").alias("sum_qty")
    )


def q_intersect_customers(spark, sf_dir):
    """H5: INTERSECT — customers ordering in both 1994 and 1995."""
    _prep(spark)
    o = _t(spark, sf_dir, "orders")
    y94 = o.filter(F.year(F.col("o_orderdate")) == 1994).select("o_custkey")
    y95 = o.filter(F.year(F.col("o_orderdate")) == 1995).select("o_custkey")
    return y94.intersect(y95).agg(F.count("*").alias("n_both"))


def q_pivot_lineitem(spark, sf_dir):
    """Pivot: per returnflag, quantity by linestatus as columns."""
    _prep(spark)
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.sum("l_quantity").cast("long"))
        .withColumnRenamed("O", "qty_o")
        .withColumnRenamed("F", "qty_f")
    )


# --- batch 3: as-of join, grouped-map pandas, frame windows ----------------


def q_asof_events(spark, sf_dir):
    """E6: as-of join — for each 'error' event, the most recent 'purchase'
    by the same user at or before it (union + last-ignorenulls window; the
    oracle uses DuckDB's native ASOF JOIN)."""
    _prep(spark)
    from nlp_entity_linking_spark.operators.joins import asof_join

    e = _t(spark, sf_dir, "events")
    errors = e.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts"
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_event_id"), "user_id", "ts"
    )
    out = asof_join(
        errors, purchases, key="user_id", left_ts="ts", right_ts="ts",
        right_cols=["p_event_id"],
    )
    return out.select(
        "event_id", "user_id", F.col("p_event_id_asof").alias("prev_purchase_id")
    )


def q_grouped_stats_docs(spark, sf_dir):
    """F5/U: grouped-map pandas UDAF (applyInPandas) per-source stats."""
    _prep(spark)
    from nlp_entity_linking_spark.operators.diagnostics import grouped_doc_stats

    return grouped_doc_stats(_t(spark, sf_dir, "documents"))


def q_moving_window(spark, sf_dir):
    """G3/G5: frame-spec sliding aggregate (3-row moving count of 'click'
    events per user)."""
    _prep(spark)
    from pyspark.sql import Window as W

    e = _t(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-2, 0)
    )
    return e.select(
        "event_id",
        "user_id",
        F.sum((F.col("event_type") == "click").cast("long")).over(w).alias(
            "clicks_in_window"
        ),
    )


def q_cc_docs(spark, sf_dir):
    """J1-J7: large-star/small-star connected components, oracle-checked
    against a DuckDB recursive-CTE transitive closure. Edges: consecutive
    doc_ids sharing a language (deterministic chain components); singleton
    docs keep their own id."""
    _prep(spark)
    from nlp_entity_linking_spark.operators.cc import (
        attach_singletons,
        connected_components,
    )

    d = _t(spark, sf_dir, "documents").select("doc_id", "lang")
    b = d.select(
        (F.col("doc_id") - 1).alias("doc_id"),
        F.col("doc_id").alias("v"),
        F.col("lang").alias("_lb"),
    )
    edges = d.join(b, "doc_id").filter(F.col("lang") == F.col("_lb")).select(
        F.col("doc_id").alias("u"), "v"
    )
    labels = connected_components(edges)
    return attach_singletons(
        labels, d.select(F.col("doc_id").alias("record_id"))
    ).select(F.col("record_id").alias("doc_id"), "cluster_id")


def q_sql_api(spark, sf_dir):
    """SQL-API surface: the same Catalyst plans via spark.sql over temp
    views (SURVEY.md §3 — DataFrame and SQL are one engine)."""
    _prep(spark)
    _t(spark, sf_dir, "orders").createOrReplaceTempView("orders_v")
    _t(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem_v")
    return spark.sql(
        """
        SELECT o_orderpriority,
               count(*) AS n_lines,
               CAST(sum(l_quantity) AS BIGINT) AS sum_qty
        FROM orders_v JOIN lineitem_v ON l_orderkey = o_orderkey
        WHERE o_orderdate >= TIMESTAMP '1995-01-01'
        GROUP BY o_orderpriority
        """
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # PINNED at exactly 50 entries: the driver verifies at most 50, and a
    # 53-entry registry silently dropped the last three (moving_window,
    # cc_docs, sql_api) off the round-3 scoreboard. Five near-duplicates
    # are retired to pytest (tests/test_entry.py::test_retired_queries):
    #   sql_api            -> spark.sql surface already driver-verified by
    #                         grouping_sets_sql (same temp-view path)
    #   minhash_dedup_docs -> rows-only; family driver-verified by
    #                         minhash_verify_docs + minhash_md5_pipeline
    #   rolling_fp_docs    -> rows-only; family driver-verified by
    #                         rolling_fp_verify_docs + fingerprint_docs
    #   simhash_docs       -> rows-only; family driver-verified by
    #                         simhash_verify_docs, signature equality pytest
    #   fingerprint_docs   -> family driver-verified by
    #                         rolling_fp_verify_docs (md5 winnowing twin)
    #   ntile_orders       -> G2 window family driver-verified by
    #                         window_topk + percent_rank_orders; made room
    #                         for linking_docs (the namesake capability)
    # (simhash_docs / fingerprint_docs made room for kmv_rollup_events and
    # repetition_docs, both hash-green.)
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
        "exact_dedup_docs": q_exact_dedup_docs,
        "token_jaccard_docs": q_token_jaccard_docs,
        "minhash_verify_docs": q_minhash_verify_docs,
        "minhash_md5_pipeline": q_minhash_md5_pipeline,
        "kmv_rollup_events": q_kmv_rollup_events,
        "simhash_verify_docs": q_simhash_verify_docs,
        "rolling_fp_verify_docs": q_rolling_fp_verify_docs,
        "mentions_regex_docs": q_mentions_regex_docs,
        "grouping_sets_sql": q_grouping_sets_sql,
        "neardup_rp_verify": q_neardup_rp_verify,
        "ivf_verify": q_ivf_verify,
        "ivf_topk_embeddings": q_ivf_topk_embeddings,
        "url_canon_docs": q_url_canon_docs,
        "containment_docs": q_containment_docs,
        "variant_events": q_variant_events,
        "percent_rank_orders": q_percent_rank_orders,
        "lateral_orders": q_lateral_orders,
        "string_funcs_parts": q_string_funcs_parts,
        "union_docs": q_union_docs,
        "linking_docs": q_linking_docs,
        "median_qty": q_median_qty,
        "datetime_parts": q_datetime_parts,
        "unpivot_lineitem": q_unpivot_lineitem,
        "quality_docs": q_quality_docs,
        "langid_docs": q_langid_docs,
        "token_counts_docs": q_token_counts_docs,
        "repetition_docs": q_repetition_docs,
        "ann_topk": q_ann_topk,
        "embed_cos_pairs": q_embed_cos_pairs,
        "neardup_embeddings_lsh": q_neardup_embeddings_lsh,
        "window_tumbling": q_window_tumbling,
        "cube_agg": q_cube_agg,
        "intersect_customers": q_intersect_customers,
        "pivot_lineitem": q_pivot_lineitem,
        "asof_events": q_asof_events,
        "grouped_stats_docs": q_grouped_stats_docs,
        "moving_window": q_moving_window,
        "cc_docs": q_cc_docs,
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
        "exact_dedup_docs": f"""
            WITH d AS (SELECT doc_id, md5({_NORM_SQL.format(c='text')}) AS dig
                       FROM documents),
                 g AS (SELECT dig, min(doc_id) AS dup_group FROM d GROUP BY dig)
            SELECT d.doc_id, g.dup_group,
                   d.doc_id = g.dup_group AS is_canonical
            FROM d JOIN g USING (dig)
        """,
        "containment_docs": f"""
            WITH t AS (SELECT doc_id,
                              list_distinct({_TOKS_SQL.format(c='text')}) AS s
                       FROM documents),
                 j AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                              len(list_filter(a.s, x -> list_contains(b.s, x)))
                                AS inter,
                              len(a.s) AS na, len(b.s) AS nb
                       FROM t a JOIN t b ON b.doc_id = a.doc_id + 1)
            SELECT id_a, id_b,
                   CASE WHEN na > 0 THEN inter / na END AS cont_a,
                   CASE WHEN nb > 0 THEN inter / nb END AS cont_b
            FROM j
        """,
        "token_jaccard_docs": f"""
            WITH t AS (SELECT doc_id,
                              list_distinct({_TOKS_SQL.format(c='text')}) AS s
                       FROM documents)
            SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                   len(list_filter(a.s, x -> list_contains(b.s, x)))
                   / (len(a.s) + len(b.s)
                      - len(list_filter(a.s, x -> list_contains(b.s, x))))
                   AS jaccard
            FROM t a JOIN t b ON b.doc_id = a.doc_id + 1
        """,
        "quality_docs": f"""
            WITH t AS (SELECT doc_id, text, {_TOKS_SQL.format(c='text')} AS toks
                       FROM documents)
            SELECT doc_id,
                   CAST(len(toks) AS BIGINT) AS n_tokens,
                   len(list_distinct(toks)) / greatest(len(toks), 1)
                     AS distinct_ratio,
                   len(list_filter(toks, x -> list_contains(
                     ['the','of','and','to','in','a','is','that','for','it',
                      'as','was','with','be','by','on','not','he','i','this',
                      'are','or','his','from','at','which','but','have','an'],
                     x))) / greatest(len(toks), 1) AS stopword_ratio
            FROM t
        """,
        "token_counts_docs": """
            SELECT doc_id,
                   CAST(len(list_filter(string_split(text, ' '), x -> x <> ''))
                        AS BIGINT) AS n_ws,
                   CAST(len(regexp_extract_all(text,
                        '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]')) AS BIGINT) AS n_bpe
            FROM documents
        """,
        "repetition_docs": f"""
            WITH l AS (
              SELECT doc_id,
                     CAST(len(list_filter(list_transform(
                          string_split(text, chr(10)), x -> trim(x)),
                          x -> x <> '')) AS BIGINT) AS n_lines,
                     CAST(len(list_distinct(list_filter(list_transform(
                          string_split(text, chr(10)), x -> trim(x)),
                          x -> x <> ''))) AS BIGINT) AS n_distinct_lines
              FROM documents),
            t AS (SELECT doc_id, {_TOKS_SQL.format(c='text')} AS toks
                  FROM documents),
            g AS (SELECT doc_id,
                         unnest({_GRAMS2_SQL.format(t='toks')}) AS gr
                  FROM t),
            pc AS (SELECT doc_id, gr, count(*) AS n
                   FROM g GROUP BY doc_id, gr),
            p AS (SELECT doc_id, CAST(max(n) AS BIGINT) AS top_gram_n,
                         CAST(sum(n) AS BIGINT) AS total_grams
                  FROM pc GROUP BY doc_id)
            SELECT l.doc_id, l.n_lines, l.n_distinct_lines,
                   CASE WHEN l.n_lines > 0
                        THEN (l.n_lines - l.n_distinct_lines) / l.n_lines
                   END AS dup_line_frac,
                   p.top_gram_n, p.total_grams,
                   p.top_gram_n / p.total_grams AS top_gram_frac
            FROM l LEFT JOIN p USING (doc_id)
        """,
        "ann_topk": """
            WITH q AS (SELECT vec_id AS query_id,
                              CAST(embedding AS DOUBLE[]) AS qv
                       FROM embeddings WHERE vec_id < 5),
                 s AS (SELECT q.query_id, e.vec_id,
                              round(list_cosine_similarity(
                                q.qv, CAST(e.embedding AS DOUBLE[])), 6) AS c
                       FROM embeddings e CROSS JOIN q)
            SELECT query_id, vec_id, rank FROM (
              SELECT query_id, vec_id,
                     row_number() OVER (PARTITION BY query_id
                                        ORDER BY c DESC, vec_id) AS rank
              FROM s) WHERE rank <= 10
        """,
        "embed_cos_pairs": """
            WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                       FROM embeddings WHERE vec_id < 300)
            SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                   round(list_cosine_similarity(a.v, b.v), 6) AS cos6
            FROM e a JOIN e b ON a.vec_id < b.vec_id
            WHERE round(list_cosine_similarity(a.v, b.v), 6) >= 0.35
        """,
        "window_tumbling": """
            SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS win_start,
                   event_type, count(*) AS n
            FROM events GROUP BY 1, 2
        """,
        "cube_agg": """
            SELECT l_returnflag, l_linestatus, count(*) AS n,
                   CAST(sum(l_quantity) AS BIGINT) AS sum_qty
            FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
        """,
        "intersect_customers": """
            SELECT count(*) AS n_both FROM (
              SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1994
              INTERSECT
              SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995)
        """,
        "pivot_lineitem": """
            SELECT l_returnflag,
                   CAST(sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END)
                        AS BIGINT) AS qty_o,
                   CAST(sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END)
                        AS BIGINT) AS qty_f
            FROM lineitem GROUP BY l_returnflag
        """,
        "minhash_verify_docs": f"""
            WITH t AS (SELECT doc_id, {_TOKS_SQL.format(c='text')} AS toks
                       FROM documents),
                 g AS (SELECT doc_id,
                              list_distinct({_GRAMS3_SQL.format(t='toks')}) AS gr
                       FROM t),
                 p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                              len(list_filter(a.gr, x -> list_contains(b.gr, x)))
                                AS inter,
                              len(a.gr) + len(b.gr)
                              - len(list_filter(a.gr, x -> list_contains(b.gr, x)))
                                AS un
                       FROM g a JOIN g b ON b.doc_id = a.doc_id + 1)
            SELECT id_a, id_b,
                   CASE WHEN un > 0 THEN inter / un END AS jaccard,
                   CASE WHEN un > 0 THEN (inter / un) >= 0.7 END AS is_dup
            FROM p
        """,
        "minhash_md5_pipeline": _minhash_md5_sql(16, 4),
        "simhash_verify_docs": f"""
            WITH s AS (SELECT doc_id,
                              {_MD5LONG_SQL.format(c=_NORM_SQL.format(c='text'))}
                                AS sig
                       FROM documents),
                 p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                              CAST(bit_count(xor(a.sig, b.sig)) AS INTEGER)
                                AS hamming
                       FROM s a JOIN s b ON b.doc_id = a.doc_id + 1)
            SELECT id_a, id_b, hamming, hamming <= 3 AS is_dup FROM p
        """,
        "rolling_fp_verify_docs": f"""
            WITH t AS (SELECT doc_id, {_TOKS_SQL.format(c='text')} AS toks
                       FROM documents),
                 h AS (SELECT doc_id,
                              list_filter(
                                list_transform(
                                  range(1, greatest(len(toks) - 7, 1) + 1),
                                  i -> {_MD5LONG_SQL.format(
                                      c="array_to_string(toks[i:i+7], ' ')")}),
                                x -> x % 16 = 0) AS kept
                       FROM t)
            SELECT doc_id, CAST(len(kept) AS INTEGER) AS n_fps,
                   list_min(kept) AS min_fp, list_max(kept) AS max_fp
            FROM h
        """,
        "mentions_regex_docs": """
            WITH c AS (SELECT doc_id,
                              array_to_string(list_transform(
                                string_split(text, ' '),
                                t -> CASE WHEN regexp_matches(t, '^[a-f]')
                                          THEN upper(t[1:1]) || t[2:]
                                          ELSE t END), ' ') AS cap
                       FROM documents)
            SELECT doc_id,
                   unnest(regexp_extract_all(cap,
                          '[A-Z][a-z]+(?: [A-Z][a-z]+)+')) AS mention
            FROM c
        """,
        "grouping_sets_sql": """
            SELECT l_returnflag, l_linestatus,
                   count(*) AS n,
                   CAST(sum(l_quantity) AS BIGINT) AS sum_qty
            FROM lineitem
            GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
                                    (l_returnflag), ())
        """,
        "neardup_rp_verify": f"""
            WITH q AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
                              list_transform(CAST(embedding AS DOUBLE[]),
                                x -> CAST(round(x*1000, 0) AS BIGINT)) AS qv
                       FROM embeddings),
                 b AS (SELECT vec_id, v, {_rp_bucket_sql(8)} AS bkt FROM q)
            SELECT a.vec_id AS id_a, c.vec_id AS id_b,
                   round(list_cosine_similarity(a.v, c.v), 6) AS cos6
            FROM b a JOIN b c ON a.bkt = c.bkt AND a.vec_id < c.vec_id
            WHERE round(list_cosine_similarity(a.v, c.v), 6) >= 0.35
        """,
        "url_canon_docs": r"""
            WITH u AS (
              SELECT doc_id,
                     CASE WHEN doc_id % 2 = 0 THEN 'HTTP' ELSE 'HTTPS' END
                     || '://Site' || CAST(doc_id % 20 AS VARCHAR)
                     || '.Example.COM'
                     || CASE WHEN doc_id % 3 = 0 THEN
                              CASE WHEN doc_id % 2 = 0 THEN ':80'
                                   ELSE ':443' END
                             WHEN doc_id % 3 = 1 THEN
                              CASE WHEN doc_id % 2 = 0 THEN ':443'
                                   ELSE ':80' END
                             ELSE '' END
                     || '/Path' || CAST(doc_id % 5 AS VARCHAR)
                     || CASE WHEN doc_id % 7 = 0 THEN '/a:443/b&c'
                             ELSE '' END
                     || CASE WHEN doc_id % 4 = 0 THEN '/' ELSE '' END
                     || CASE WHEN doc_id % 2 = 0
                             THEN '?utm_source=a&id=' || CAST(doc_id AS VARCHAR)
                                  || '&gclid=zz&next=/'
                             ELSE '?&utm_campaign=c' END
                     || CASE WHEN doc_id % 5 = 0 THEN '&&dup=1&'
                             ELSE '' END
                     || '#sec' || CAST(doc_id % 3 AS VARCHAR) AS url
              FROM documents),
            c1 AS (
              SELECT doc_id, url,
                     regexp_extract(url,
                       '^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)', 1) AS head,
                     lower(regexp_extract(url,
                       '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme
              FROM u),
            c2 AS (
              SELECT *,
                     lower(substr(head, length(scheme) + 4)) AS auth0,
                     regexp_replace(substr(url, length(head) + 1),
                                    '#.*$', '', 'g') AS tail
              FROM c1),
            c3 AS (
              SELECT *,
                     CASE WHEN scheme = 'http'
                            THEN regexp_replace(auth0, ':80$', '')
                          WHEN scheme = 'https'
                            THEN regexp_replace(auth0, ':443$', '')
                          ELSE auth0 END AS auth,
                     regexp_replace(regexp_extract(tail, '^([^?]*)', 1),
                                    '/$', '') AS path,
                     regexp_replace(
                       regexp_replace(
                         regexp_replace('&' || regexp_extract(tail,
                                                              '\?(.*)$', 1),
                           '&(utm_[A-Za-z0-9_]*|fbclid|gclid)=[^&]*', '',
                           'g'),
                         '&&+', '&', 'g'),
                       '^&+|&+$', '', 'g') AS q
              FROM c2)
            SELECT doc_id, url,
              CASE WHEN head = '' THEN url
                   ELSE scheme || '://' || auth || path
                        || CASE WHEN q = '' THEN '' ELSE '?' || q END
              END AS canon
            FROM c3
        """,
        "variant_events": """
            SELECT event_type, count(*) AS n,
                   min(k) AS min_k, max(k) AS max_k
            FROM (SELECT event_type,
                         CAST(json_extract(props, '$.k') AS INTEGER) AS k
                  FROM events)
            WHERE k >= 50
            GROUP BY event_type
        """,
        "percent_rank_orders": """
            SELECT c_mktsegment, pr_decile, cd_decile, count(*) AS n
            FROM (
              SELECT c_mktsegment,
                     CAST(floor(percent_rank() OVER w * 10) AS BIGINT)
                       AS pr_decile,
                     CAST(floor(cume_dist() OVER w * 10) AS BIGINT)
                       AS cd_decile
              FROM orders JOIN customer ON o_custkey = c_custkey
              WINDOW w AS (PARTITION BY c_mktsegment
                           ORDER BY o_totalprice, o_orderkey))
            GROUP BY c_mktsegment, pr_decile, cd_decile
        """,
        "lateral_orders": """
            SELECT c.c_custkey, l.max_price, l.n_orders
            FROM customer c,
            LATERAL (
              SELECT max(o_totalprice) AS max_price, count(*) AS n_orders
              FROM orders o WHERE o.o_custkey = c.c_custkey
            ) l
            WHERE l.n_orders > 0
        """,
        "ivf_verify": """
            WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
                              list_transform(CAST(embedding AS DOUBLE[]),
                                x -> CAST(round(x*1000, 0) AS BIGINT)) AS qv
                       FROM embeddings),
                 cells AS (
                   SELECT e.vec_id, e.v, cl.cell,
                          list_sum(list_transform(range(1, len(qv)+1),
                            d -> qv[d] * (1 - 2*((((1103515245*(d + 64*cl.cell + 4096)
                                 + 12345) % 2147483648) >> 16) & 1)))) AS proj
                   FROM e CROSS JOIN (SELECT unnest(range(0, 8)) AS cell) cl),
                 ranked AS (
                   SELECT vec_id, v, cell,
                          row_number() OVER (PARTITION BY vec_id
                                             ORDER BY proj DESC, cell) AS rk
                   FROM cells),
                 corpus AS (SELECT vec_id, v, cell FROM ranked WHERE rk = 1),
                 probes AS (SELECT vec_id AS query_id, v AS qvec, cell
                            FROM ranked WHERE rk <= 2 AND vec_id % 53 = 0),
                 sims AS (
                   SELECT p.query_id, c.vec_id,
                          round(list_cosine_similarity(p.qvec, c.v), 6) AS c6
                   FROM probes p JOIN corpus c ON p.cell = c.cell)
            SELECT query_id, vec_id, rank FROM (
              SELECT query_id, vec_id,
                     row_number() OVER (PARTITION BY query_id
                                        ORDER BY c6 DESC, vec_id) AS rank
              FROM sims)
            WHERE rank <= 10
        """,
        "string_funcs_parts": """
            SELECT p_partkey,
                   upper(p_name) AS u,
                   substr(p_name, 3, 8) AS sub,
                   replace(p_name, ' ', '_') AS repl,
                   lpad(p_brand, 12, '#') AS pad,
                   concat_ws('|', p_brand, p_type) AS cat,
                   CAST(length(p_name) AS INTEGER) AS len,
                   reverse(p_brand) AS rev
            FROM part
        """,
        "union_docs": """
            SELECT lang, count(*) AS n FROM (
              SELECT DISTINCT doc_id, lang FROM (
                SELECT doc_id, lang FROM documents WHERE doc_id < 300
                UNION ALL
                SELECT doc_id, lang FROM documents
                WHERE doc_id >= 200 AND doc_id < 400))
            GROUP BY lang
        """,
        "linking_docs": f"""
            WITH c AS (SELECT doc_id,
                              array_to_string(list_transform(
                                string_split(text, ' '),
                                t -> CASE WHEN regexp_matches(t, '^[a-f]')
                                          THEN upper(t[1:1]) || t[2:]
                                          ELSE t END), ' ') AS cap,
                              list_sort(list_distinct(list_filter(
                                string_split(text, ' '),
                                x -> x <> ''))) AS cset
                       FROM documents),
                 m0 AS (SELECT doc_id,
                               unnest(regexp_extract_all(cap,
                                 '[A-Z][a-z]+(?: [A-Z][a-z]+)+')) AS mention
                        FROM c),
                 m AS (SELECT doc_id, lower(mention) AS alias_norm,
                              count(*) AS n_m
                       FROM m0 GROUP BY doc_id, lower(mention)),
                 al AS (SELECT DISTINCT alias_norm FROM m),
                 kb AS (
                   SELECT alias_norm,
                          {_MD5LONG_SQL.format(c="alias_norm || '#1'")}
                            AS entity_id,
                          {_MD5LONG_SQL.format(c="alias_norm || 'p1'")}
                            % 900 + 100 AS prior,
                          list_sort(list_distinct(
                            string_split(alias_norm, ' ') || ['spark']))
                            AS dset
                   FROM al
                   UNION ALL
                   SELECT alias_norm,
                          {_MD5LONG_SQL.format(c="alias_norm || '#2'")},
                          {_MD5LONG_SQL.format(c="alias_norm || 'p2'")}
                            % 900 + 100,
                          list_sort(list_distinct(
                            string_split(alias_norm, ' ') || ['vector']))
                   FROM al),
                 cands AS (
                   SELECT m.doc_id, m.alias_norm, m.n_m, k.entity_id,
                          CAST(len(list_intersect(c.cset, k.dset)) AS BIGINT)
                            * 1099511627776 + k.prior AS score
                   FROM m JOIN kb k USING (alias_norm)
                          JOIN c USING (doc_id))
            SELECT doc_id, alias_norm, entity_id, n_m AS n_mentions FROM (
              SELECT *, row_number() OVER (
                       PARTITION BY doc_id, alias_norm
                       ORDER BY score * n_m DESC, entity_id ASC) AS rn
              FROM cands) WHERE rn = 1
        """,
        "unpivot_lineitem": """
            SELECT l_returnflag, metric, val FROM (
              SELECT l_returnflag,
                     CAST(sum(l_quantity) AS BIGINT) AS qty,
                     count(*) AS rows,
                     count(DISTINCT l_orderkey) AS orders
              FROM lineitem GROUP BY l_returnflag)
            UNPIVOT (val FOR metric IN (qty, rows, orders))
        """,
        "median_qty": """
            SELECT l_returnflag,
                   median(l_quantity) AS med_qty,
                   quantile_cont(l_quantity, 0.25) AS p25_qty,
                   count(*) AS n
            FROM lineitem GROUP BY l_returnflag
        """,
        "datetime_parts": """
            SELECT dayofweek(ts) + 1 AS dow, hour(ts) AS hr,
                   count(*) AS n,
                   CAST(max(dayofyear(ts)) AS INTEGER) AS max_doy
            FROM events GROUP BY 1, 2
        """,
        "langid_docs": """
            WITH t AS (SELECT list_filter(string_split(trim(regexp_replace(
                         regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
                         ' +', ' ', 'g')), ' '), x -> x <> '') AS toks
                       FROM documents),
                 h AS (SELECT
                   len(list_filter(toks, x -> list_contains(
                     ['the','of','and','to','in','a','is','that','for','it',
                      'as','was','with','be','by','on','not','he','i','this',
                      'are','or','his','from','at','which','but','have','an'], x))) AS h_en,
                   len(list_filter(toks, x -> list_contains(
                     ['le','la','de','et','les','des','en','un','une','du',
                      'que','est','pour','qui','dans','a','par','plus','pas',
                      'au','sur','ne','se','ce','il','sont'], x))) AS h_fr,
                   len(list_filter(toks, x -> list_contains(
                     ['de','la','que','el','en','y','a','los','se','del','las',
                      'un','por','con','no','una','su','para','es','al','lo',
                      'como','mas','pero','sus','le'], x))) AS h_es,
                   len(list_filter(toks, x -> list_contains(
                     ['der','die','und','in','den','von','zu','das','mit',
                      'sich','des','auf','fur','ist','im','dem','nicht','ein',
                      'eine','als','auch','es','an','werden'], x))) AS h_de
                   FROM t),
                 g AS (SELECT CASE
                   WHEN h_en = 0 AND h_fr = 0 AND h_es = 0 AND h_de = 0 THEN 'und'
                   WHEN h_fr >= h_en AND h_fr >= h_es AND h_fr >= h_de THEN 'fr'
                   WHEN h_es >= h_en AND h_es >= h_de THEN 'es'
                   WHEN h_en >= h_de THEN 'en'
                   ELSE 'de' END AS lang_guess FROM h)
            SELECT lang_guess, count(*) AS n FROM g GROUP BY lang_guess
        """,
        "asof_events": """
            WITH e AS (SELECT event_id, user_id, ts FROM events
                       WHERE event_type = 'error'),
                 p AS (SELECT event_id AS prev_purchase_id, user_id, ts
                       FROM events WHERE event_type = 'purchase')
            SELECT e.event_id, e.user_id, p.prev_purchase_id
            FROM e ASOF LEFT JOIN p
              ON e.user_id = p.user_id AND e.ts >= p.ts
        """,
        "grouped_stats_docs": """
            SELECT source,
                   count(*) AS n_docs,
                   CAST(sum(n_chars) AS BIGINT) AS sum_chars,
                   CAST(sum(n_chars) AS BIGINT) / count(*) AS mean_chars,
                   max(n_chars) AS max_chars,
                   (SELECT d2.lang FROM documents d2 WHERE d2.source = d.source
                    GROUP BY d2.lang ORDER BY count(*) DESC, d2.lang LIMIT 1)
                     AS top_lang
            FROM documents d GROUP BY source
        """,
        "kmv_rollup_events": """
            WITH dis AS (
              SELECT DISTINCT event_type, CAST(ts AS DATE) AS day,
                     CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15)
                          AS BIGINT) AS h
              FROM events),
            fine AS (
              SELECT event_type, day, h,
                     row_number() OVER (PARTITION BY event_type, day
                                        ORDER BY h) AS rn
              FROM dis),
            mu AS (
              SELECT DISTINCT event_type, h FROM fine WHERE rn <= 64),
            mr AS (
              SELECT event_type, h,
                     row_number() OVER (PARTITION BY event_type
                                        ORDER BY h) AS rn
              FROM mu),
            mk AS (
              SELECT event_type, CAST(count(*) AS BIGINT) AS n_retained,
                     max(h) AS kth
              FROM mr WHERE rn <= 64 GROUP BY event_type),
            ex AS (
              SELECT event_type,
                     CAST(count(DISTINCT user_id) AS BIGINT) AS exact_distinct
              FROM events GROUP BY event_type)
            SELECT m.event_type, m.n_retained,
                   CAST(floor(CASE WHEN m.n_retained < 64
                                   THEN CAST(m.n_retained AS DOUBLE)
                                   ELSE 63.0 * 1152921504606846976.0
                                        / CAST(m.kth AS DOUBLE) END)
                        AS BIGINT) AS est_distinct,
                   ex.exact_distinct
            FROM mk m JOIN ex USING (event_type)
        """,
        "moving_window": """
            SELECT event_id, user_id,
                   CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                        OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
                        AS BIGINT) AS clicks_in_window
            FROM events
        """,
        "cc_docs": """
            WITH RECURSIVE
            e AS (SELECT a.doc_id AS u, b.doc_id AS v FROM documents a
                  JOIN documents b ON b.doc_id = a.doc_id + 1
                                  AND a.lang = b.lang),
            sym AS (SELECT u, v FROM e UNION SELECT v AS u, u AS v FROM e),
            nodes AS (SELECT DISTINCT u AS n FROM sym),
            reach AS (SELECT n, n AS m FROM nodes
                      UNION
                      SELECT s.u AS n, r.m FROM sym s JOIN reach r ON s.v = r.n),
            comp AS (SELECT n, min(m) AS cluster_id FROM reach GROUP BY n)
            SELECT d.doc_id, coalesce(c.cluster_id, d.doc_id) AS cluster_id
            FROM documents d LEFT JOIN comp c ON c.n = d.doc_id
        """,
    }
