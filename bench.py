"""Benchmark harness (driver contract): runs the headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {name: sec}, "sf": ..., ...extras}

Headline = the ER pipeline stages (records, blocking+pairs, feature+score,
connected components) over deterministic synthetic pages scaled to the sf,
plus representative operator queries over the driver testdata. The scoring
stage also reports pairs/sec — the BASELINE.json throughput metric.
"""

from __future__ import annotations

import json
import os
import sys
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
    sf = sf_of(sf_dir)
    n_pages = max(1000, int(1_000_000 * sf))  # sf0.1 -> 100k pages

    from nlp_entity_linking_spark.conf import get_spark
    from nlp_entity_linking_spark.functions import similarity as S
    from nlp_entity_linking_spark.plans import pipeline as P
    from nlp_entity_linking_spark.sources.synthetic import gen_pages
    import __spark_entry__ as entry_mod

    spark = get_spark(app_name="bench", master=f"local[{cpus}]")

    timings: dict[str, float] = {}
    extras: dict[str, float] = {}

    def timed(name, fn):
        t0 = time.perf_counter()
        out = fn()
        timings[name] = round(time.perf_counter() - t0, 3)
        return out

    cfg = P.PipelineConfig()
    pages, _gold = gen_pages(spark, n_pages)

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
    # untimed end-to-end pass (~2k pages): isolation runs showed the FIRST
    # execution of the blocking plan can cost several times its warm cost
    # (codegen compile + JIT + page-cache faults), which a one-shot timer
    # then misattributes to the stage (the r3 er_blocking_pairs mirage).
    warm_pages, _ = gen_pages(spark, 2000)
    wr = P.build_records(warm_pages, cfg)
    wp = P.build_candidate_pairs(wr, cfg)
    wf = P.build_features(wr, wp, cfg)
    we = P.score_edges(wf, cfg)
    P.cluster(wr, we, cfg).count()
    # drop the warm pass's internal persists (blocks in
    # build_candidate_pairs, tf-idf weights in build_features): nothing
    # else is cached yet, and leaving them resident would (a) occupy
    # executor storage during the timed stages and (b) let the
    # CacheManager's analyzed-plan matching silently serve warm-pass
    # frames to the timed run
    spark.catalog.clearCache()

    # each stage persisted + counted INSIDE its timer so the per-stage
    # numbers attribute real work, not lazy plan construction
    records = P.build_records(pages, cfg).persist()
    extras["n_records"] = timed("er_records", records.count)

    pairs = P.build_candidate_pairs(records, cfg).persist()
    extras["n_candidate_pairs"] = timed("er_blocking_pairs", pairs.count)

    # pin the cached partitioning to the Python-worker pool width: AQE can
    # coalesce feats to a handful of partitions, which would force
    # score_pairs to re-shuffle the whole table inside ITS timer (observed
    # as 7.8s-vs-45s er_score swings across otherwise identical runs)
    feats = P.build_features(records, pairs, cfg).repartition(2 * int(cpus)).persist()
    timed("er_features", feats.count)

    scored = S.score_pairs(feats, cfg.model).persist()
    n_scored = timed("er_score", scored.count)
    extras["pairs_scored"] = n_scored
    extras["pairs_per_sec"] = round(n_scored / timings["er_score"], 1)

    # the production edge path: JVM cheap-reject gate drops certain
    # non-edges before the Python JW pass (byte-identical edges, pytest
    # test_score_edges_gate_byte_equal). er_score above stays FULL scoring
    # — that is the BASELINE.json throughput metric over every candidate —
    # while this stage times what a deployment actually pays per edge pass.
    extras["n_edges"] = timed(
        "er_edges_gated", lambda: P.score_edges(feats, cfg).count()
    )
    extras["gate_kept_pairs"] = feats.filter(
        S.may_reach_threshold(cfg.model, cfg.score_threshold)
    ).count()

    edges = scored.filter(F.col("score") >= cfg.score_threshold)
    clusters = P.cluster(records, edges, cfg).persist()
    timed("er_connected_components", clusters.count)
    extras["n_clusters"] = clusters.select("cluster_id").distinct().count()

    # representative operator queries over the driver testdata
    qs = entry_mod.queries()
    for name in ("agg_groupby", "join_agg", "window_topk", "snb_pairs_docs"):
        timed(f"td_{name}", lambda n=name: qs[n](spark, sf_dir).count())

    total = round(sum(timings.values()), 3)
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
                **extras,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
