"""Single-parallelism bench worker: builds the ER input, times the
candidate-pair scoring stage (the BASELINE.json throughput metric) and the
clustering stage, prints one JSON line.

Two-phase for a clean stage measurement: phase A builds records/pairs/
features and writes features to parquet; phase B times scoring in a FRESH
JVM of the same parallelism (no upstream caches inflating GC), per the
BASELINE.md protocol (warm runs discarded, median of 3).

Invoked by tools/bench_scaling.py once per parallelism level.
"""

from __future__ import annotations

import argparse
import json
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--master", required=True)
    ap.add_argument("--n-pages", type=int, default=100_000)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from nlp_entity_linking_spark.conf import get_spark
    from nlp_entity_linking_spark.functions import similarity as S
    from nlp_entity_linking_spark.plans import pipeline as P

    cfg = P.PipelineConfig()
    tmp = tempfile.mkdtemp(prefix="bench_feat_")
    feat_path = f"{tmp}/features.parquet"
    rec_path = f"{tmp}/records.parquet"

    # ---- phase A: build (own JVM; wall time reported as build_wall) ----
    t_all = time.perf_counter()
    spark = get_spark(app_name="bench_build", master=args.master)
    from nlp_entity_linking_spark.sources.synthetic import gen_pages

    pages, _ = gen_pages(spark, args.n_pages)
    records = P.build_records(pages, cfg).persist()
    n_records = records.count()
    pairs = P.build_candidate_pairs(records, cfg).persist()
    n_pairs = pairs.count()
    # 64 partitions divides both protocol levels; the timed stage then
    # reads pre-partitioned input with no shuffle inside the measurement.
    P.build_features(records, pairs, cfg).repartition(64).write.mode(
        "overwrite"
    ).parquet(feat_path)
    records.write.mode("overwrite").parquet(rec_path)
    spark.stop()
    build_wall = time.perf_counter() - t_all

    # ---- phase B: fresh JVM, isolated stage timings ----
    spark = get_spark(app_name="bench_score", master=args.master)
    features = spark.read.parquet(feat_path).persist()
    features.count()
    # two warm runs, discarded: full Python worker pool + imports + JIT
    S.score_pairs(features, cfg.model).count()
    S.score_pairs(features, cfg.model).count()
    walls = []
    n_scored = 0
    for _ in range(3):
        t0 = time.perf_counter()
        n_scored = S.score_pairs(features, cfg.model).count()
        walls.append(time.perf_counter() - t0)
    score_wall = sorted(walls)[1]  # median
    best_wall = min(walls)  # capacity estimate: interference only subtracts

    records = spark.read.parquet(rec_path)
    t1 = time.perf_counter()
    edges = S.score_pairs(features, cfg.model).filter(
        F.col("score") >= cfg.score_threshold
    )
    clusters = P.cluster(records, edges.select("id_a", "id_b"), cfg)
    n_clusters = clusters.select("cluster_id").distinct().count()
    cluster_wall = time.perf_counter() - t1
    spark.stop()
    shutil.rmtree(tmp, ignore_errors=True)

    print(
        json.dumps(
            {
                "master": args.master,
                "n_pages": args.n_pages,
                "n_records": n_records,
                "n_pairs": n_pairs,
                "pairs_scored": n_scored,
                "score_wall_sec": round(score_wall, 3),
                "best_wall_sec": round(best_wall, 3),
                "score_walls_all": [round(w, 3) for w in walls],
                "pairs_per_sec": round(n_scored / score_wall, 1),
                "pairs_per_sec_best": round(n_scored / best_wall, 1),
                "cluster_wall_sec": round(cluster_wall, 3),
                "n_clusters": n_clusters,
                "build_wall_sec": round(build_wall, 3),
                "total_wall_sec": round(time.perf_counter() - t_all, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
