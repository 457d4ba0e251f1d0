"""Focused features-stage A/B at 1M pages: stages records+pairs parquet ONCE
in a reuse dir, then times build_features variants with the noop sink.

Usage:
  python tools/bench_features_ab.py --reuse-dir /tmp/featab --n-pages 1000000 \
      --runs 3 [--explain plans/r08/features_afterX.txt]
Environment toggles (read by the pipeline itself):
  SPARK_GRAFT_WEIGHTS_BROADCAST_MAX, SPARK_GRAFT_ATTACH_BROADCAST_MAX
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reuse-dir", required=True)
    ap.add_argument("--n-pages", type=int, default=1_000_000)
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--explain", default="")
    args = ap.parse_args()

    from nlp_entity_linking_spark.conf import get_spark
    from nlp_entity_linking_spark.plans import pipeline as P
    from nlp_entity_linking_spark.sources.synthetic import gen_pages

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(app_name="features_ab", master=f"local[{cpus}]")
    cfg = P.PipelineConfig()
    rec = os.path.join(args.reuse_dir, "records")
    prs = os.path.join(args.reuse_dir, "pairs")
    if not os.path.exists(os.path.join(rec, "_SUCCESS")):
        pages, _ = gen_pages(spark, args.n_pages)
        records = P.build_records(pages, cfg)
        records.write.mode("overwrite").parquet(rec)
        P.build_candidate_pairs(spark.read.parquet(rec), cfg).write.mode(
            "overwrite"
        ).parquet(prs)
        spark.catalog.clearCache()

    def build():
        return P.build_features(
            spark.read.parquet(rec), spark.read.parquet(prs), cfg
        )

    walls = []
    for r in range(args.runs):
        spark.catalog.clearCache()
        spark.sparkContext.setJobDescription(f"features_ab run{r}")
        t0 = time.perf_counter()
        build().write.format("noop").mode("overwrite").save()
        walls.append(round(time.perf_counter() - t0, 3))
        print(f"  run{r}: {walls[-1]}", file=sys.stderr)
    if args.explain:
        with open(args.explain, "w") as fh:
            df = build()
            fh.write(
                df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"
                )
            )
    print(json.dumps({"walls": walls, "min": min(walls),
                      "wbmax": os.environ.get("SPARK_GRAFT_WEIGHTS_BROADCAST_MAX", "default")}))
    spark.stop()


if __name__ == "__main__":
    main()
