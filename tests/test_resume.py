"""A5/E4/J5: catalog atomic commits + resume-from-last-committed-checkpoint
(SURVEY.md §3.3, §5.5)."""

from __future__ import annotations

import os
import shutil

from nlp_entity_linking_spark.plans.run import run_with_catalog
from nlp_entity_linking_spark.sources.catalog import Catalog
from nlp_entity_linking_spark.sources.synthetic import gen_pages


def _clusters_set(spark, cat):
    return {
        (r.record_id, r.cluster_id)
        for r in cat.read(spark, "clusters").collect()
    }


def test_resume_skips_committed_and_matches_full_run(spark, tmp_path):
    out = str(tmp_path / "cat")
    pages, gold = gen_pages(spark, 300)
    s1 = run_with_catalog(spark, pages, out, "r1", resume=False, gold=gold)
    cat = Catalog(out, "r1")
    full = _clusters_set(spark, cat)
    assert s1["eval"]["f1"] > 0.9

    # simulate a crash after scoring: drop the cluster-side commits
    for name in os.listdir(os.path.join(cat.base, "_commits")):
        if name.startswith(("clusters", "cc_iter", "run_summary")):
            os.remove(os.path.join(cat.base, "_commits", name))
    shutil.rmtree(cat.table_path("clusters"), ignore_errors=True)

    s2 = run_with_catalog(spark, pages, out, "r1", resume=True, gold=gold)
    assert _clusters_set(spark, cat) == full
    assert s2["eval"] == s1["eval"]
    # calibration was restored from the committed marker, not re-fit
    assert s2["model"] == s1["model"] and s2["threshold"] == s1["threshold"]


def test_catalog_commit_is_atomic(spark, tmp_path):
    cat = Catalog(str(tmp_path / "cat2"), "r")
    df = spark.range(10)
    # data written but no marker -> not visible as committed
    df.write.mode("overwrite").parquet(cat.table_path("t"))
    assert not cat.is_committed("t")
    cat.commit("t", {"rows": 10})
    assert cat.is_committed("t")
    assert cat.read(spark, "t").count() == 10


def test_lineage_rows_written(spark, tmp_path):
    out = str(tmp_path / "cat3")
    pages, gold = gen_pages(spark, 200)
    run_with_catalog(spark, pages, out, "r2", resume=False, gold=None)
    cat = Catalog(out, "r2")
    lin = cat.read_lineage(spark)
    stages = {r.stage for r in lin.select("stage").distinct().collect()}
    assert {"records", "candidate_pairs", "scored_pairs", "clusters"} <= stages
    # per-partition rows sum to table rows
    import pyspark.sql.functions as F

    rec_rows = (
        lin.filter("stage = 'records'").agg(F.sum("rows_out").alias("s")).collect()[0].s
    )
    assert rec_rows == cat.read(spark, "records").count()
