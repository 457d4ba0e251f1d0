"""spark-submit entry point (north rule: "packaged for spark-submit
--py-files ... run via spark-submit on a multi-executor cluster").

  spark-submit --py-files dist/nlp_entity_linking_spark.zip main.py \
      --n-pages 100000 --run-id myrun [--resume] [--out /path]

Builds the synthetic pages input (or reads --pages-path parquet with the
BASELINE.json input_hint schema), runs the staged pipeline with catalog
commits + lineage, and writes clusters + metrics.
"""

from __future__ import annotations

import argparse
import json
import sys


def parse_args(argv):
    p = argparse.ArgumentParser()
    p.add_argument("--n-pages", type=int, default=10_000)
    p.add_argument("--pages-path", default=None, help="parquet with input_hint schema")
    p.add_argument("--run-id", default="run0")
    p.add_argument("--out", default="/tmp/erlink_out")
    p.add_argument("--resume", action="store_true")
    p.add_argument("--master", default=None)
    p.add_argument(
        "--use-phonetic",
        action="store_true",
        help="enable the Soundex blocker alongside LSH + sorted-neighborhood "
        "(recall on spelling variants at the cost of extra candidate pairs)",
    )
    return p.parse_args(argv)


def main(argv=None) -> int:
    args = parse_args(argv or sys.argv[1:])
    from nlp_entity_linking_spark.conf import get_spark
    from nlp_entity_linking_spark.plans.run import run_with_catalog

    spark = get_spark(app_name=f"erlink-{args.run_id}", master=args.master)
    if args.pages_path:
        pages = spark.read.parquet(args.pages_path)
        gold = None
    else:
        from nlp_entity_linking_spark.sources.synthetic import gen_pages

        pages, gold = gen_pages(spark, args.n_pages)
    cfg = None
    if args.use_phonetic:
        from nlp_entity_linking_spark.plans.pipeline import PipelineConfig

        cfg = PipelineConfig(use_phonetic=True)
    summary = run_with_catalog(
        spark,
        pages,
        out_dir=args.out,
        run_id=args.run_id,
        resume=args.resume,
        gold=gold,
        cfg=cfg,
    )
    print(json.dumps(summary, default=str))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
