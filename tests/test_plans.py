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


def test_bucketed_join_is_colocated_no_exchange(spark, tmp_path):
    """North-rule bucketing claim made concrete: two tables bucketed on the
    same key and bucket count join WITHOUT a shuffle — the plan has no
    Exchange above either scan. This is the co-located-join layout the
    catalog tables would use at the 10^12 tier (Iceberg bucket transform)."""
    wh = str(tmp_path / "wh")  # external-table paths; warehouse conf is static
    o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    c = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
    o.write.mode("overwrite").bucketBy(8, "o_custkey").sortBy("o_custkey").option(
        "path", f"{wh}/orders_b"
    ).saveAsTable("orders_b")
    c.write.mode("overwrite").bucketBy(8, "c_custkey").sortBy("c_custkey").option(
        "path", f"{wh}/customer_b"
    ).saveAsTable("customer_b")
    try:
        ob, cb = spark.table("orders_b"), spark.table("customer_b")
        j = ob.join(cb, ob.o_custkey == cb.c_custkey).groupBy("c_mktsegment").count()
        # disable broadcast so the join strategy decision is about
        # co-location, not table size
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        plan = _plan(j)
        join_part = plan.split("SortMergeJoin")[1] if "SortMergeJoin" in plan else plan
        assert "SortMergeJoin" in plan, plan
        assert "Exchange hashpartitioning" not in join_part, plan
        # the equivalent non-bucketed join DOES shuffle both sides
        j2 = o.join(c, o.o_custkey == c.c_custkey).groupBy("c_mktsegment").count()
        assert "Exchange hashpartitioning" in _plan(j2)
        # and the answers agree
        a = {r.c_mktsegment: r["count"] for r in j.collect()}
        b = {r.c_mktsegment: r["count"] for r in j2.collect()}
        assert a == b
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
        )
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS customer_b")


def test_pipeline_plans_have_no_scale_killers(spark):
    """Every ER stage plan must be free of the two patterns that cannot
    survive a 100x scale-up: CartesianProduct (unbounded pair blowup) and
    Exchange SinglePartition (a global funnel through one task). Guards the
    D3 rank path especially — a naive global window would show up here."""
    from nlp_entity_linking_spark.functions import similarity as S
    from nlp_entity_linking_spark.plans import pipeline as P
    from nlp_entity_linking_spark.sources.synthetic import gen_pages

    pages, _ = gen_pages(spark, 150)
    cfg = P.PipelineConfig()
    records = P.build_records(pages, cfg).persist()
    records.count()
    pairs = P.build_candidate_pairs(records, cfg)
    feats = P.build_features(records, pairs, cfg)
    scored = S.score_pairs(feats, cfg.model)
    for name, df in (("records", records), ("pairs", pairs),
                     ("features", feats), ("scored", scored)):
        plan = _plan(df)
        assert "CartesianProduct" not in plan, (name, plan)
        assert "Exchange SinglePartition" not in plan, (name, plan)


def test_ann_dedup_plans_have_no_scale_killers(spark):
    """The ANN/dedup candidate-generation plans must stay free of
    CartesianProduct and Exchange SinglePartition (brute_force_topk is the
    deliberate exception: its broadcast nested-loop is the O(n*q) baseline
    by contract). Guards the bucket-join shape of every approximate
    family."""
    import numpy as np

    from nlp_entity_linking_spark.operators import ann, dedup

    rng = np.random.RandomState(0)
    rows = [(i, rng.randn(8).astype(np.float32).tolist()) for i in range(50)]
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    queries = spark.createDataFrame(
        rows[:3], "query_id long, embedding array<float>"
    )
    docs = spark.createDataFrame(
        [(i, f"some text body number {i} with words") for i in range(40)],
        "doc_id long, text string",
    )
    plans = {
        "lsh_topk": ann.lsh_topk(corpus, queries, k=3, n_probe=2),
        "cosine_neardup": ann.cosine_neardup_pairs(corpus, threshold=0.9),
        "minhash_dedup": dedup.minhash_dedup(docs),
        "exact_dedup": dedup.exact_dedup(docs),
        "jaccard": dedup.ngram_jaccard_pairs(
            docs,
            docs.select(F.col("doc_id").alias("id_a")).withColumn(
                "id_b", F.col("id_a") + 1
            ),
            n=1,
        ),
    }
    for name, df in plans.items():
        plan = _plan(df)
        assert "CartesianProduct" not in plan, (name, plan)
        assert "Exchange SinglePartition" not in plan, (name, plan)


def test_build_features_fires_exactly_one_job(spark):
    """Plan-construction cost audit: building the features stage must fire
    exactly ONE Spark job — the records count that powers tfidf's n_docs
    AND the explicit broadcast decision. Regression guards two retired
    anti-patterns: pair_cosine's implicit weights.count() and score_pairs'
    df.rdd.getNumPartitions() plan conversion."""
    from nlp_entity_linking_spark.functions import similarity as S
    from nlp_entity_linking_spark.plans import pipeline as P
    from nlp_entity_linking_spark.sources.synthetic import gen_pages

    pages, _ = gen_pages(spark, 120)
    cfg = P.PipelineConfig()
    records = P.build_records(pages, cfg).persist()
    records.count()
    pairs = P.build_candidate_pairs(records, cfg)
    sc = spark.sparkContext
    # baseline: the one action build_features is ALLOWED (records.count();
    # AQE materializes a cached count as >1 sub-job, so measure, don't
    # hard-code)
    sc.setJobGroup("bf_baseline", "bare records count")
    records.count()
    sc.setJobGroup("bf_job_audit", "features stage construction")
    try:
        feats = P.build_features(records, pairs, cfg)
        S.score_pairs(feats, cfg.model)  # construction only — no action
    finally:
        sc.setJobGroup(None, None)
    tracker = sc.statusTracker()
    base = len(tracker.getJobIdsForGroup("bf_baseline"))
    jobs = tracker.getJobIdsForGroup("bf_job_audit")
    assert base >= 1
    assert len(jobs) == base, (
        f"features-stage construction fired {len(jobs)} jobs vs {base} for "
        "its single allowed count — an implicit count/plan-conversion is back"
    )
    # the RDD-conversion pattern must stay out of the scoring hot path
    import inspect

    src = inspect.getsource(S)
    assert ".rdd" not in src, "similarity.py regained an RDD conversion"


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
