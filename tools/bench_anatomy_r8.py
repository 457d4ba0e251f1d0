"""Round-8 optimization anatomy: isolate each ER bench stage at an arbitrary
scale with the noop sink (guide §1.4) and dump .explain("formatted") per
stage for plans/r08/.

Mirrors bench.py's stage structure (parquet-staged inputs, same
PipelineConfig) but times with noop writes instead of persist+count so the
numbers are the computation, not the sink, and labels every job
(guide §1.5). NOT the official bench — bench.py stays the driver contract.

Usage:
  python tools/bench_anatomy_r8.py --n-pages 1000000 --runs 2 \
      [--stages records,blocking,features,score,edges,cc] [--explain-dir plans/r08] [--tag before]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402


def noop(df) -> float:
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return round(time.perf_counter() - t0, 3)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-pages", type=int, default=1_000_000)
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--stages", default="records,blocking,features,score,edges,cc")
    ap.add_argument("--explain-dir", default="")
    ap.add_argument("--tag", default="now")
    args = ap.parse_args()
    stages = set(args.stages.split(","))

    from nlp_entity_linking_spark.conf import get_spark
    from nlp_entity_linking_spark.functions import similarity as S
    from nlp_entity_linking_spark.plans import pipeline as P
    from nlp_entity_linking_spark.sources.synthetic import gen_pages

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(app_name="anatomy_r8", master=f"local[{cpus}]")
    sc = spark.sparkContext
    cfg = P.PipelineConfig()
    tmp = tempfile.mkdtemp(prefix="anatomy_r8_")
    out: dict = {"n_pages": args.n_pages, "tag": args.tag}

    def pq(name: str) -> str:
        return os.path.join(tmp, name)

    def explain_of(df) -> str:
        return df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )

    def save_explain(name: str, df) -> None:
        if not args.explain_dir:
            return
        os.makedirs(args.explain_dir, exist_ok=True)
        path = os.path.join(args.explain_dir, f"{name}_{args.tag}.txt")
        with open(path, "w") as fh:
            fh.write(explain_of(df))

    def timed(name: str, build):
        walls = []
        for r in range(args.runs):
            spark.catalog.clearCache()
            sc.setJobDescription(f"anatomy:{name}:run{r}")
            walls.append(noop(build()))
        out[name] = {"walls": walls, "min": min(walls)}
        save_explain(name, build())
        print(f"  {name}: {walls}", file=sys.stderr)

    # warm workers + codegen exactly like bench.py
    warm = spark.range(0, 4 * int(cpus)).select(
        F.lit("warm up the workers").alias("norm_a"),
        F.lit("warm up the worker pool").alias("norm_b"),
        F.lit(0.5).alias("tsl"),
        F.lit(0.5).alias("cos"),
    ).repartition(2 * int(cpus))
    S.score_pairs(warm, cfg.model, n_partitions=2 * int(cpus)).count()
    wp_pages, _ = gen_pages(spark, 2000)
    wr = P.build_records(wp_pages, cfg)
    wpp = P.build_candidate_pairs(wr, cfg)
    wf = P.build_features(wr, wpp, cfg)
    P.cluster(wr, P.score_edges(wf, cfg), cfg).count()
    spark.catalog.clearCache()

    pages, _ = gen_pages(spark, args.n_pages)
    sc.setJobDescription("anatomy:stage pages")
    pages.write.mode("overwrite").parquet(pq("pages"))

    if "records" in stages:
        timed(
            "records",
            lambda: P.build_records(spark.read.parquet(pq("pages")), cfg),
        )
    sc.setJobDescription("anatomy:stage records parquet")
    P.build_records(spark.read.parquet(pq("pages")), cfg).write.mode(
        "overwrite"
    ).parquet(pq("records"))

    if "blocking" in stages:
        timed(
            "blocking",
            lambda: P.build_candidate_pairs(
                spark.read.parquet(pq("records")), cfg
            ),
        )
    sc.setJobDescription("anatomy:stage pairs parquet")
    P.build_candidate_pairs(spark.read.parquet(pq("records")), cfg).write.mode(
        "overwrite"
    ).parquet(pq("pairs"))

    if "features" in stages:
        timed(
            "features",
            lambda: P.build_features(
                spark.read.parquet(pq("records")),
                spark.read.parquet(pq("pairs")),
                cfg,
            ),
        )
    sc.setJobDescription("anatomy:stage feats parquet")
    P.build_features(
        spark.read.parquet(pq("records")), spark.read.parquet(pq("pairs")), cfg
    ).write.mode("overwrite").parquet(pq("feats"))
    spark.catalog.clearCache()
    feats = spark.read.parquet(pq("feats")).repartition(2 * int(cpus)).persist()
    out["n_pairs"] = feats.count()

    if "score" in stages:
        timed("score", lambda: S.score_pairs(feats, cfg.model))
    if "edges" in stages:
        timed("edges", lambda: P.score_edges(feats, cfg))
    if "cc" in stages:
        sc.setJobDescription("anatomy:stage edges parquet")
        P.score_edges(feats, cfg).select("id_a", "id_b").write.mode(
            "overwrite"
        ).parquet(pq("edges"))
        rec_pq = spark.read.parquet(pq("records"))
        edges_pq = spark.read.parquet(pq("edges"))
        timed("cc", lambda: P.cluster(rec_pq, edges_pq, cfg))

    shutil.rmtree(tmp, ignore_errors=True)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
