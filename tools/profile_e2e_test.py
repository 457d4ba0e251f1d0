"""Stage-level timing of the test_end_to_end_f1 path — identifies where the
suite's two slowest tests spend their wall so the trim targets the right
stage. Mirrors the test body exactly (700 pages, default config).

Usage: python tools/profile_e2e_test.py [n_pages] [master]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F


def main() -> None:
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 700
    master = sys.argv[2] if len(sys.argv) > 2 else "local[4]"

    from nlp_entity_linking_spark.conf import get_spark
    from nlp_entity_linking_spark.functions import similarity as S
    from nlp_entity_linking_spark.operators.evaluate import gen_labeled_pairs
    from nlp_entity_linking_spark.plans import pipeline as P
    from nlp_entity_linking_spark.sources.synthetic import gen_pages

    spark = get_spark(
        app_name="profile_e2e",
        master=master,
        extra_conf={"spark.sql.shuffle.partitions": "8"},
    )

    t = {}

    def mark(name, t0):
        t[name] = round(time.perf_counter() - t0, 1)
        print(f"{name}: {t[name]}s", flush=True)

    t0 = time.perf_counter()
    pages, gold = gen_pages(spark, n_pages)
    cfg = P.PipelineConfig()
    records = P.build_records(pages, cfg).persist()
    records.count()
    mark("build_records", t0)

    t0 = time.perf_counter()
    pairs = P.build_candidate_pairs(records, cfg).persist()
    pairs.count()
    mark("build_candidate_pairs", t0)

    t0 = time.perf_counter()
    features = P.build_features(records, pairs, cfg).persist()
    features.count()
    mark("build_features", t0)

    t0 = time.perf_counter()
    rg = records.join(gold, "url").select("record_id", "entity_id")
    labeled = gen_labeled_pairs(pairs, rg).persist()
    labeled.count()
    mark("labeled", t0)

    t0 = time.perf_counter()
    cfg = P.calibrate(features, labeled, cfg)
    mark("calibrate", t0)

    t0 = time.perf_counter()
    scored = S.score_pairs(features, cfg.model).persist()
    scored.count()
    mark("score", t0)

    t0 = time.perf_counter()
    thr, metrics = P.select_threshold(scored, records, labeled, cfg)
    mark("select_threshold", t0)
    print("f1:", metrics["f1"])

    t0 = time.perf_counter()
    edges = scored.filter(F.col("score") >= thr)
    clusters = P.cluster(records, edges, cfg).persist()
    clusters.count()
    mark("cluster", t0)

    print("total:", round(sum(t.values()), 1), "s", t)
    spark.stop()


if __name__ == "__main__":
    main()
