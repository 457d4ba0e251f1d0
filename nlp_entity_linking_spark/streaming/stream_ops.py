"""Structured Streaming slice (SURVEY.md §2 ST1-ST6): incremental page
ingest, watermarked windows, streaming dedup, sessionization, and
exactly-once incremental entity resolution via foreachBatch + the catalog.

Batch-first engine; streams reuse the same operators. For local smoke tests
a parquet-directory source + `processAllAvailable()` drives queries to
completion synchronously (memory sink).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

PAGES_SCHEMA = (
    "url string, warc_ts timestamp, html binary, text string, lang string"
)
EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def read_pages_stream(spark: SparkSession, path: str) -> DataFrame:
    """ST1: incremental crawl ingest — new parquet files under `path` are
    new micro-batches (prod: Kafka/Kinesis source, same downstream plan)."""
    return (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", 8)
        .parquet(path)
    )


def read_events_stream(spark: SparkSession, path: str) -> DataFrame:
    return spark.readStream.schema(EVENTS_SCHEMA).parquet(path)


def dedup_pages_stream(pages: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """ST2+ST3: watermark late crawl records, drop duplicate urls within
    the watermark (streaming analog of latest-per-url)."""
    return pages.withWatermark("warc_ts", watermark).dropDuplicatesWithinWatermark(
        ["url"]
    )


def windowed_event_counts(
    events: DataFrame,
    window: str = "10 minutes",
    slide: str | None = None,
    watermark: str = "30 minutes",
) -> DataFrame:
    """ST4: tumbling/sliding event-rate aggregation with late-data bound."""
    win = (
        F.window("ts", window, slide) if slide else F.window("ts", window)
    )
    return (
        events.withWatermark("ts", watermark)
        .groupBy(win.alias("win"), "event_type")
        .agg(F.count("*").alias("n"), F.sum("value").alias("total_value"))
        .select(
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            "event_type",
            "n",
            "total_value",
        )
    )


def session_windows(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "1 hour"
) -> DataFrame:
    """ST5: native session windows keyed by user."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("sess"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("sess.start").alias("sess_start"),
            F.col("sess.end").alias("sess_end"),
            "user_id",
            "n_events",
        )
    )


def incremental_er(
    spark: SparkSession,
    pages_stream: DataFrame,
    out_dir: str,
    run_id: str = "stream",
    checkpoint_dir: str | None = None,
):
    """ST1+ST6: incremental entity resolution — each micro-batch of pages is
    resolved against accumulated state through the catalog.

    foreachBatch + anti-join vs the committed records table gives
    exactly-once *table* state from at-least-once batch delivery (the same
    E4 resume idiom as the batch pipeline, SURVEY.md ST6): re-delivered
    urls are dropped before appending, and clusters are recomputed from the
    full committed edge state (cheap: CC input is match edges, not pages).
    """
    from ..operators.records import extract_records
    from ..plans import pipeline as P
    from ..sources.catalog import Catalog

    cfg = P.PipelineConfig()
    cat = Catalog(out_dir, run_id)

    def process_batch(batch_df: DataFrame, epoch_id: int) -> None:
        new_records = P.build_records(batch_df, cfg)
        if cat.is_committed("records"):
            prev = cat.read(spark, "records")
            new_records = new_records.join(
                prev.select("record_id"), "record_id", "left_anti"
            )
            merged = prev.unionByName(new_records)
        else:
            merged = new_records
        # epoch-versioned physical table + alias flip: never overwrite the
        # path a live plan reads (self-overwrite hazard across micro-batches)
        cat.write(merged, f"records_epoch_{epoch_id}")
        merged = cat.read(spark, f"records_epoch_{epoch_id}")
        # full re-block over merged state: correct and simple; incremental
        # blocking (new x all) is the optimization documented in README.
        pairs = P.build_candidate_pairs(merged, cfg)
        feats = P.build_features(merged, pairs, cfg)
        from ..functions import similarity as S

        edges = S.score_pairs(feats, cfg.model).filter(
            F.col("score") >= cfg.score_threshold
        )
        clusters = P.cluster(merged, edges.select("id_a", "id_b"), cfg)
        cat.write(clusters, f"clusters_epoch_{epoch_id}")
        cat.write_alias("records", f"records_epoch_{epoch_id}")
        cat.write_alias("clusters", f"clusters_epoch_{epoch_id}")

    q = (
        pages_stream.writeStream.foreachBatch(process_batch)
        .option(
            "checkpointLocation",
            checkpoint_dir or f"{out_dir}/{run_id}/_stream_ckpt",
        )
        .trigger(availableNow=True)
        .start()
    )
    return q
