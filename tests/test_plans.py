"""Physical-plan assertions (SURVEY.md §4): pushdown, pruning, broadcast,
whole-stage codegen — the plans we *want*, not just ones that pass."""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _fmt(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_filter_pushdown_reaches_parquet(spark):
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    q = li.filter(F.col("l_discount") > 0.05).select("l_orderkey", "l_discount")
    plan = _fmt(q)
    pushed = [l for l in plan.splitlines() if "PushedFilters" in l]
    assert pushed and "GreaterThan(l_discount,0.05)" in pushed[0], plan
    # column pruning: scan schema holds only the two referenced columns
    schema_line = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "l_discount" in schema_line and "l_extendedprice" not in schema_line


def test_broadcast_join_chosen_for_dim(spark):
    o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    c = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
    j = o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
    assert "BroadcastHashJoin" in _plan(j)


def test_semi_anti_plans(spark):
    o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    c = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
    semi = c.join(o, c.c_custkey == o.o_custkey, "left_semi")
    anti = c.join(o, c.c_custkey == o.o_custkey, "left_anti")
    assert "LeftSemi" in _plan(semi)
    assert "LeftAnti" in _plan(anti)


def test_whole_stage_codegen_covers_normalize(spark):
    from nlp_entity_linking_spark.functions.normalize import normalize, tokenize

    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    q = d.select(tokenize(normalize("text")).alias("t")).filter(F.size("t") > 0)
    # '*(n)' node prefixes mark whole-stage-codegen spans in the plan tree
    plan = _plan(q)
    assert "*(1)" in plan or "WholeStageCodegen" in plan, plan


def test_html_binary_pruned_after_extraction(spark):
    """The binary html column must not survive past the extraction project
    (SURVEY.md §4.1 column pruning — never shuffle the blobs)."""
    from nlp_entity_linking_spark.operators.records import extract_records
    from nlp_entity_linking_spark.plans.pipeline import PipelineConfig
    from nlp_entity_linking_spark.sources.synthetic import gen_pages

    pages, _ = gen_pages(spark, 50)
    recs = extract_records(pages, shingle_n=3)
    plan = _plan(recs)
    # html may ride at most ONE exchange (the latest-per-url window dedup
    # must move the raw row once); past extraction it must be pruned.
    segs = plan.split("Exchange")[1:]
    assert sum("html" in seg for seg in segs) <= 1, plan
