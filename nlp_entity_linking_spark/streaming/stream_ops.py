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


def read_events_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    r = spark.readStream.schema(EVENTS_SCHEMA)
    if max_files_per_trigger:
        r = r.option("maxFilesPerTrigger", max_files_per_trigger)
    return r.parquet(path)


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


def join_event_streams(
    purchases: DataFrame,
    errors: DataFrame,
    watermark: str = "1 hour",
    bound: str = "30 minutes",
) -> DataFrame:
    """ST breadth: STREAM-STREAM inner join with an event-time range
    condition — each error event joins same-user purchases within
    [error_ts - bound, error_ts]. Both sides carry watermarks, so Spark can
    bound the join state it buffers (late rows beyond the watermark are
    dropped, matched state older than watermark + bound is evicted) — the
    state-size contract that makes the join viable on unbounded streams."""
    p = purchases.select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("p_ts"),
    ).withWatermark("p_ts", watermark)
    e = errors.select(
        "user_id", F.col("event_id").alias("error_id"), F.col("ts").alias("e_ts")
    ).withWatermark("e_ts", watermark)
    cond = F.expr(
        f"p_user = user_id AND p_ts BETWEEN e_ts - INTERVAL {bound} AND e_ts"
    )
    return e.join(p, cond, "inner").select(
        "error_id", "purchase_id", "user_id", "e_ts", "p_ts"
    )


def stateful_running_totals(events: DataFrame, key_col: str = "user_id") -> DataFrame:
    """ST6 variant — CUSTOM stateful streaming operator via
    applyInPandasWithState (the arbitrary-state API, vs the declarative
    dropDuplicates/window state elsewhere): per-key running event count and
    value total carried across micro-batches in explicit GroupState; each
    batch a key appears in emits one updated row stamped with `update_idx`
    (how many batches have touched the key — the cross-batch state proof).

    Scale shape: state is per-key O(1) (three scalars), partitioned by the
    grouping key exactly like any streaming aggregate; Arrow-batched pandas
    on both sides of the state boundary.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql import types as T

    out_schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("n_events", T.LongType()),
            T.StructField("total_value", T.DoubleType()),
            T.StructField("update_idx", T.IntegerType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("n", T.LongType()),
            T.StructField("total", T.DoubleType()),
            T.StructField("upd", T.IntegerType()),
        ]
    )

    def fn(key: tuple, pdfs, state: GroupState):
        n, total, upd = state.get if state.exists else (0, 0.0, 0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].fillna(0.0).sum())
        upd += 1
        state.update((n, total, upd))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "total_value": [total],
                "update_idx": [upd],
            }
        )

    return events.groupBy(key_col).applyInPandasWithState(
        fn, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
    )


def incremental_er(
    spark: SparkSession,
    pages_stream: DataFrame,
    out_dir: str,
    run_id: str = "stream",
    checkpoint_dir: str | None = None,
    cfg=None,
):
    """ST1+ST6: incremental entity resolution with INCREMENTAL BLOCKING —
    each micro-batch blocks only its NEW records against the committed
    block table (new x old, bounded) plus itself (new x new, salted), scores
    only pairs that touch a new record, appends the resulting match edges to
    committed state, and recomputes clusters from the (sparse) edge set.

    Scale shape: per-batch QUADRATIC work is bounded by the batch size — the
    previous full-re-block form rescored the whole merged corpus every
    micro-batch, degrading quadratically with stream length. Residual
    per-batch LINEAR costs (committed-blocks key join, TF-IDF corpus
    weights, cluster rewrite) map onto bucketed catalog tables and
    incrementally maintained stats in a production deployment. Hot keys
    (committed block size > salt_cap) are excluded from new x old expansion
    — the same documented recall bound as salting in the batch path.
    Sorted-neighborhood is global-order by construction and is not run
    incrementally (production pairs this with periodic full-re-block
    compaction). With pair-local scoring features the final clusters equal
    the batch pipeline at use_snb=False exactly; the corpus-dependent TF-IDF
    cosine is computed over the epoch-visible corpus, so early-epoch scores
    carry bounded-staleness IDF — the standard incremental-ER tradeoff,
    refreshed by the same periodic compaction.

    State layout: records/blocks/edges are APPEND-ONLY epoch tables (each
    epoch writes only its new rows; per-batch write work is O(batch), not
    O(corpus)); clusters are rewritten per epoch (CC output is global).
    A single 'epoch' marker commit atomically advances which epochs are
    visible — a crash mid-batch leaves the previous state intact, and the
    re-delivered batch anti-joins its records away (exactly-once table
    state from at-least-once delivery). Every frame persisted during a
    batch is unpersisted in a finally block: long-running streams must not
    accumulate cached blocks/weights across epochs.
    """
    from ..functions import similarity as S
    from ..operators import blocking as B
    from ..plans import pipeline as P
    from ..sources.catalog import Catalog

    cfg = cfg or P.PipelineConfig()
    cat = Catalog(out_dir, run_id)

    def _visible_epochs() -> list[int]:
        meta = cat.committed_meta("epoch")
        return list(meta["epochs"]) if meta else []

    def _state(name: str, epochs: list[int]) -> DataFrame | None:
        dfs = [
            cat.read(spark, f"{name}_epoch_{e}")
            for e in epochs
            if cat.is_committed(f"{name}_epoch_{e}")
        ]
        if not dfs:
            return None
        out = dfs[0]
        for d in dfs[1:]:
            out = out.unionByName(d)
        return out

    def process_batch(batch_df: DataFrame, epoch_id: int) -> None:
        cached: list[DataFrame] = []
        try:
            epochs = _visible_epochs()
            prev_records = _state("records", epochs)
            new_records = P.build_records(batch_df, cfg)
            if prev_records is not None:
                new_records = new_records.join(
                    prev_records.select("record_id"), "record_id", "left_anti"
                )
            new_records = new_records.persist()
            cached.append(new_records)
            if new_records.count() == 0:
                return

            new_blocks = B.lsh_blocks(
                new_records, "shingles", k=cfg.minhash_k, bands=cfg.bands
            ).persist()
            cached.append(new_blocks)
            # new x new within the batch (salted, like the batch pipeline)
            nn = B.pairs_from_blocks(
                B.salt_blocks(new_blocks, cap=cfg.salt_cap), dedup=False
            )
            old_blocks = _state("blocks", epochs)
            if old_blocks is not None:
                sizes = old_blocks.groupBy("block_key").agg(F.count("*").alias("_n"))
                hot = sizes.filter(F.col("_n") > cfg.salt_cap).select("block_key")
                no = (
                    new_blocks.join(F.broadcast(hot), "block_key", "left_anti")
                    .withColumnRenamed("record_id", "_rid_new")
                    .join(old_blocks, "block_key")
                    .select(
                        F.least("_rid_new", "record_id").alias("id_a"),
                        F.greatest("_rid_new", "record_id").alias("id_b"),
                        "block_key",
                    )
                )
                pairs = B.merge_pairs(nn, no)
                merged_records = prev_records.unionByName(new_records)
            else:
                pairs = nn.groupBy("id_a", "id_b").agg(
                    F.min("block_key").alias("block_key")
                )
                merged_records = new_records
            pairs = pairs.persist()
            cached.append(pairs)

            feats = P.build_features(merged_records, pairs, cfg, cache_registry=cached)
            edges_new = (
                S.score_pairs(feats, cfg.model)
                .filter(F.col("score") >= cfg.score_threshold)
                .select("id_a", "id_b")
            )

            # append-only epoch tables: ONLY this batch's rows are written
            cat.write(new_records, f"records_epoch_{epoch_id}")
            cat.write(new_blocks, f"blocks_epoch_{epoch_id}")
            cat.write(edges_new, f"edges_epoch_{epoch_id}")
            n_pairs = pairs.count()

            all_epochs = epochs + [epoch_id]
            all_edges = _state("edges", all_epochs)
            all_records = _state("records", all_epochs)
            clusters = P.cluster(all_records, all_edges, cfg)
            cat.write(clusters, f"clusters_epoch_{epoch_id}")

            # SINGLE atomic commit point: advance the visible-epoch set
            cat.commit("epoch", {"epochs": all_epochs})
            cat.commit(
                f"epoch_stats_{epoch_id}",
                {
                    "n_new_records": new_records.count(),
                    "n_pairs_scored": n_pairs,
                },
            )
            # external-reader alias (flipped after the epoch commit;
            # staleness on crash is consistent-previous-state, never torn)
            cat.write_alias("clusters", f"clusters_epoch_{epoch_id}")
        finally:
            for df in cached:
                df.unpersist()

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


def read_er_records(spark: SparkSession, out_dir: str, run_id: str) -> DataFrame:
    """Union of all committed per-epoch record tables (the logical
    'records' table of an incremental_er run)."""
    from ..sources.catalog import Catalog

    cat = Catalog(out_dir, run_id)
    meta = cat.committed_meta("epoch") or {"epochs": []}
    dfs = [
        cat.read(spark, f"records_epoch_{e}")
        for e in meta["epochs"]
        if cat.is_committed(f"records_epoch_{e}")
    ]
    out = dfs[0]
    for d in dfs[1:]:
        out = out.unionByName(d)
    return out
