"""ST1-ST6: Structured Streaming slice — parquet-source micro-batches driven
synchronously (availableNow / processAllAvailable) with memory sinks."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from nlp_entity_linking_spark.sources.catalog import Catalog
from nlp_entity_linking_spark.sources.synthetic import gen_pages
from nlp_entity_linking_spark.streaming import stream_ops as ST


def _write_pages(spark, tmp_path, n=200):
    pages, gold = gen_pages(spark, n)
    path = str(tmp_path / "pages_in")
    pages.write.mode("overwrite").parquet(path)
    return path, pages


def test_windowed_event_counts_stream(spark, tmp_path):
    src = str(tmp_path / "events_in")
    spark.read.parquet("/root/testdata/sf0.001/events.parquet").withColumn(
        "ts", F.col("ts").cast("timestamp")
    ).write.mode("overwrite").parquet(src)
    events = ST.read_events_stream(spark, src).withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    agg = ST.windowed_event_counts(events, "1 hour")
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName("wincounts")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT sum(n) AS s FROM wincounts").collect()[0].s
    # append mode emits only watermark-closed windows; the tail stays open
    batch = spark.read.parquet(src)
    total = batch.count()
    assert got is not None and 0 < got <= total
    # cross-check closed windows against the batch oracle
    batch_win = (
        batch.groupBy(F.window(F.col("ts").cast("timestamp"), "1 hour"), "event_type")
        .count()
        .count()
    )
    n_windows = spark.sql("SELECT count(*) AS c FROM wincounts").collect()[0].c
    assert 0 < n_windows <= batch_win


def test_streaming_dedup_pages(spark, tmp_path):
    path, pages = _write_pages(spark, tmp_path, 150)
    stream = ST.read_pages_stream(spark, path)
    dedup = ST.dedup_pages_stream(stream)
    q = (
        dedup.writeStream.outputMode("append")
        .format("memory")
        .queryName("dedup_pages")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    urls = spark.sql("SELECT url FROM dedup_pages").collect()
    assert len(urls) == len({r.url for r in urls})  # one row per url


def test_session_windows_stream(spark, tmp_path):
    src = str(tmp_path / "events_in2")
    spark.read.parquet("/root/testdata/sf0.001/events.parquet").withColumn(
        "ts", F.col("ts").cast("timestamp")
    ).write.mode("overwrite").parquet(src)
    events = ST.read_events_stream(spark, src).withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    q = (
        ST.session_windows(events)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("sessions")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM sessions").collect()
    assert rows and all(r.n_events >= 1 for r in rows)


def test_incremental_er_foreach_batch(spark, tmp_path):
    path, _ = _write_pages(spark, tmp_path, 200)
    out = str(tmp_path / "cat")
    q = ST.incremental_er(spark, ST.read_pages_stream(spark, path), out, "s1")
    q.awaitTermination(300)
    cat = Catalog(out, "s1")
    assert cat.is_committed("records") and cat.is_committed("clusters")
    clusters = cat.read(spark, "clusters")
    records = cat.read(spark, "records")
    assert clusters.count() == records.count() == 200
