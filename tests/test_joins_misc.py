"""E6 as-of join, F5 grouped-map diagnostics, U Python UDTF."""

from __future__ import annotations

from pyspark.sql import functions as F

from nlp_entity_linking_spark.operators.diagnostics import (
    block_diagnostics_grouped,
    grouped_doc_stats,
)
from nlp_entity_linking_spark.operators.joins import asof_join


def test_asof_join_basic(spark):
    quotes = spark.createDataFrame(
        [("a", 1, 100.0), ("a", 5, 105.0), ("a", 9, 109.0), ("b", 4, 200.0)],
        "sym string, t long, px double",
    )
    trades = spark.createDataFrame(
        [("a", 0), ("a", 1), ("a", 6), ("a", 20), ("b", 3), ("b", 4)],
        "sym string, t long",
    )
    out = asof_join(trades, quotes, key="sym", left_ts="t", right_ts="t",
                    right_cols=["px"])
    got = {(r.sym, r.t): r.px_asof for r in out.collect()}
    assert got == {
        ("a", 0): None,      # nothing at or before
        ("a", 1): 100.0,     # exact-timestamp match counts
        ("a", 6): 105.0,
        ("a", 20): 109.0,
        ("b", 3): None,
        ("b", 4): 200.0,
    }
    assert out.count() == trades.count()  # left join semantics


def test_grouped_doc_stats(spark):
    docs = spark.createDataFrame(
        [
            (1, "s1", "en", 10),
            (2, "s1", "en", 20),
            (3, "s1", "fr", 60),
            (4, "s2", "de", 5),
        ],
        "doc_id long, source string, lang string, n_chars long",
    )
    got = {r.source: r for r in grouped_doc_stats(docs).collect()}
    assert got["s1"].n_docs == 3 and got["s1"].sum_chars == 90
    assert got["s1"].mean_chars == 30.0 and got["s1"].max_chars == 60
    assert got["s1"].top_lang == "en"  # count tie-break by lang asc is moot here
    assert got["s2"].n_docs == 1 and got["s2"].top_lang == "de"


def test_block_diagnostics(spark):
    rows = [("k1", "aa"), ("k1", "bbbb"), ("k1", "aa"), ("k2", "c")]
    df = spark.createDataFrame(rows, "block_key string, norm string")
    got = {r.block_key: r for r in block_diagnostics_grouped(df).collect()}
    assert got["k1"].n_records == 3
    assert got["k1"].n_distinct_surfaces == 2
    assert got["k1"].len_spread == 2.0
    assert got["k2"].len_spread == 0.0


def test_tokenize_udtf(spark):
    from nlp_entity_linking_spark.functions.udtf_ops import tokenize_udtf

    spark.udtf.register("tokenize_udtf", tokenize_udtf)
    rows = spark.sql(
        "SELECT * FROM tokenize_udtf('The quick fox')"
    ).collect()
    assert [(r.pos, r.token, r.is_stopword) for r in rows] == [
        (0, "The", True),
        (1, "quick", False),
        (2, "fox", False),
    ]
