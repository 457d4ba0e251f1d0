"""Custom Python data source (`synthpages`): schema contract, determinism
across partition layouts, and end-to-end pipeline compatibility."""

from __future__ import annotations

from pyspark.sql import functions as F

from nlp_entity_linking_spark.sources.pages_datasource import PagesDataSource


def _read(spark, **opts):
    spark.dataSource.register(PagesDataSource)
    r = spark.read.format("synthpages")
    for k, v in opts.items():
        r = r.option(k, v)
    return r.load()


def test_schema_matches_input_hint(spark):
    df = _read(spark, n_pages=50)
    kinds = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    assert list(kinds) == ["url", "warc_ts", "html", "text", "lang"]
    assert kinds["html"] == "binary" and kinds["warc_ts"] == "timestamp"
    assert df.count() == 50


def test_deterministic_and_partition_invariant(spark):
    """Same (n_pages, seed) must produce byte-identical rows at any
    partition count — the same contract as the expression-based generator."""
    a = _read(spark, n_pages=200, n_partitions=2)
    b = _read(spark, n_pages=200, n_partitions=13)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    assert a.select("url").distinct().count() == 200
    # a task per declared partition: the split layout is respected
    assert b.rdd.getNumPartitions() == 13


def test_pipeline_runs_on_custom_source(spark):
    """The ER pipeline consumes the custom source like any pages input:
    records extract byte-identically (generator writes text = extraction
    target) and planted entity variants cluster."""
    from nlp_entity_linking_spark.plans import pipeline as P

    pages = _read(spark, n_pages=150)
    cfg = P.PipelineConfig()
    records = P.build_records(pages, cfg).persist()
    assert records.count() == 150
    pairs = P.build_candidate_pairs(records, cfg)
    # the 3-variant entities (name / NAME / name inc) must co-block
    assert pairs.count() > 0
    clusters = P.cluster(records, pairs.limit(0), cfg)
    assert clusters.count() == 150  # singleton fallback stays total
