"""Benchmark harness (driver contract): runs the headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {name: sec}, "sf": ..., ...extras}

Headline = the ER pipeline stages (records, blocking+pairs, feature+score,
connected components) over deterministic synthetic pages scaled to the sf,
plus representative operator queries over the driver testdata. The scoring
stage also reports pairs/sec — the BASELINE.json throughput metric.

Noise protocol (round 5): every timed stage runs k>=3 times and reports the
MIN wall. This host shares hardware with other tenants: identical code
measured 6.0-88.7s fresh-JVM spreads on a ~10s stage (tools/bench_blocking.py,
round 4), and the r4 one-shot artifact recorded a physically impossible
er_edges_gated > er_score. Interference only ever ADDS time, so the min is
the engine's capacity; one-shot walls are coin flips. To make repeats honest:

* Each stage's INPUT is materialized to local parquet once (untimed), so a
  repeat re-reads a stable input instead of a warm cache. This also matches
  production shape (stages read committed Iceberg snapshots, not hot RDDs).
* `spark.catalog.clearCache()` runs before every repeat of a stage with
  internal persists (blocking's `blocks`, features' TF-IDF weights):
  Spark's CacheManager matches identical ANALYZED plans across separate
  queries, so without the clear, repeats 2..k would silently reuse repeat
  1's internal caches and under-measure the stage.
* persist+count inside the timer (as in prior rounds) so column pruning
  can't skip the stage's real work under a bare count().
All repeat walls are recorded in extras["stage_runs"] for transparency.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F


def sf_of(sf_dir: str) -> float:
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return 0.1


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
    k_runs = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_K", "3")))
    sf = sf_of(sf_dir)
    n_pages = max(1000, int(1_000_000 * sf))  # sf0.1 -> 100k pages

    from nlp_entity_linking_spark.conf import get_spark
    from nlp_entity_linking_spark.functions import similarity as S
    from nlp_entity_linking_spark.plans import pipeline as P
    from nlp_entity_linking_spark.sources.synthetic import gen_pages
    import __spark_entry__ as entry_mod

    spark = get_spark(app_name="bench", master=f"local[{cpus}]")

    timings: dict[str, float] = {}
    stage_runs: dict[str, list[float]] = {}
    extras: dict = {}
    tmp = tempfile.mkdtemp(prefix="spark_bench_")

    def pq(name: str) -> str:
        return os.path.join(tmp, name)

    def timed_stage(name, build_fn, clear_cache=True, persist=True):
        """Run build_fn k times; record min wall; return the LAST run's
        (still-persisted) DataFrame and its count.

        clear_cache drops every cached frame before each repeat — required
        when the stage persists internal frames (CacheManager analyzed-plan
        matching would serve them to the next repeat). Callers whose input
        IS a cached frame (er_score over feats) pass clear_cache=False and
        rely on the stage having no internal persists.
        """
        walls: list[float] = []
        df = None
        n = None
        for _ in range(k_runs):
            if df is not None and persist:
                df.unpersist(blocking=True)
            if clear_cache:
                spark.catalog.clearCache()
            df = build_fn()
            if persist:
                df = df.persist()
            t0 = time.perf_counter()
            n = df.count()
            walls.append(round(time.perf_counter() - t0, 3))
        timings[name] = min(walls)
        stage_runs[name] = walls
        return df, n

    cfg = P.PipelineConfig()

    # Warm the Python worker pool before anything is timed: daemon workers
    # pay imports + numpy JIT on their first Arrow batch (memory: first
    # passes run 2-4x slow), and prod executors are warm. One tiny
    # mapInPandas pass touches every core's worker.
    warm = spark.range(0, 4 * int(cpus)).select(
        F.lit("warm up the workers").alias("norm_a"),
        F.lit("warm up the worker pool").alias("norm_b"),
        F.lit(0.5).alias("tsl"),
        F.lit(0.5).alias("cos"),
    ).repartition(2 * int(cpus))
    S.score_pairs(warm, cfg.model, n_partitions=2 * int(cpus)).count()
    # ...and the JVM codegen/JIT for every pipeline stage with one tiny
    # untimed end-to-end pass (~2k pages): the FIRST execution of a plan
    # shape can cost several times its warm cost (codegen compile + JIT +
    # page-cache faults). With min-of-k this mostly self-corrects (repeat 1
    # absorbs compile, repeats 2..k are warm), but the warm pass keeps
    # repeat 1 honest too.
    warm_pages, _ = gen_pages(spark, 2000)
    wr = P.build_records(warm_pages, cfg)
    wp = P.build_candidate_pairs(wr, cfg)
    wf = P.build_features(wr, wp, cfg)
    we = P.score_edges(wf, cfg)
    P.cluster(wr, we, cfg).count()
    spark.catalog.clearCache()

    # ---- materialize the page corpus once (untimed) -----------------------
    pages, _gold = gen_pages(spark, n_pages)
    pages.write.mode("overwrite").parquet(pq("pages"))

    # ---- stage: records ---------------------------------------------------
    records, n_records = timed_stage(
        "er_records",
        lambda: P.build_records(spark.read.parquet(pq("pages")), cfg),
    )
    extras["n_records"] = n_records
    records.write.mode("overwrite").parquet(pq("records"))

    # ---- stage: blocking + candidate pairs --------------------------------
    pairs, n_pairs = timed_stage(
        "er_blocking_pairs",
        lambda: P.build_candidate_pairs(spark.read.parquet(pq("records")), cfg),
    )
    extras["n_candidate_pairs"] = n_pairs
    pairs.write.mode("overwrite").parquet(pq("pairs"))

    # ---- stage: features --------------------------------------------------
    feats_df, _ = timed_stage(
        "er_features",
        lambda: P.build_features(
            spark.read.parquet(pq("records")), spark.read.parquet(pq("pairs")), cfg
        ),
    )
    # pin the scoring input's partitioning to the Python-worker pool width
    # (AQE coalescing targets 64MB JVM partitions — far too coarse for a
    # CPU-bound pandas-UDF stage) and cache it OUTSIDE the score timers so
    # er_score measures scoring, not input shuffle.
    feats_df.write.mode("overwrite").parquet(pq("feats"))  # from cache, cheap
    spark.catalog.clearCache()
    feats = (
        spark.read.parquet(pq("feats")).repartition(2 * int(cpus)).persist()
    )
    feats.count()

    # ---- stage: full scoring (the BASELINE throughput metric) -------------
    scored, n_scored = timed_stage(
        "er_score",
        lambda: S.score_pairs(feats, cfg.model),
        clear_cache=False,  # feats cache IS the input; score has no persists
    )
    extras["pairs_scored"] = n_scored
    extras["pairs_per_sec"] = round(n_scored / timings["er_score"], 1)

    # ---- stage: gated edge pass (what a deployment pays per edge pass) ----
    _, n_edges = timed_stage(
        "er_edges_gated",
        lambda: P.score_edges(feats, cfg),
        clear_cache=False,
        persist=False,  # mapInPandas can't be pruned; bare count runs it all
    )
    extras["n_edges"] = n_edges
    extras["gate_kept_pairs"] = feats.filter(
        S.may_reach_threshold(cfg.model, cfg.score_threshold)
    ).count()

    # ---- stage: connected components --------------------------------------
    edges = scored.filter(F.col("score") >= cfg.score_threshold)
    rec_pq = spark.read.parquet(pq("records"))
    clusters, _ = timed_stage(
        "er_connected_components",
        lambda: P.cluster(rec_pq, edges, cfg),
        clear_cache=False,  # edges ride the persisted `scored`
    )
    extras["n_clusters"] = clusters.select("cluster_id").distinct().count()

    # ---- representative operator queries over the driver testdata ---------
    spark.catalog.clearCache()
    qs = entry_mod.queries()
    for name in ("agg_groupby", "join_agg", "window_topk", "snb_pairs_docs"):
        timed_stage(
            f"td_{name}",
            lambda n=name: qs[n](spark, sf_dir),
            clear_cache=True,
            persist=False,
        )

    total = round(sum(timings.values()), 3)
    shutil.rmtree(tmp, ignore_errors=True)
    print(
        json.dumps(
            {
                "metric": "er_pipeline_and_operators_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "n_pages": n_pages,
                "master": f"local[{cpus}]",
                "protocol": f"min-of-{k_runs} per stage, parquet-staged inputs",
                "stage_runs": stage_runs,
                **extras,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
