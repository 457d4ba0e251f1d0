"""IVF probe anatomy + tuning sweep at 1M x 768 (VERDICT r6 task 4).

r6 measured the IVF probe at 24.7s vs LSH probe-4 at 6.4s for the same
recall 1.0 — a 3.9x gap that left the engine's recommended ANN path at
scale ambiguous. This tool splits the probe wall into its three stages

  q_cells    — query-side quantizer assignment (tiny Arrow UDF batch)
  cand_join  — staged inverted-list equi-join + per-query dedup; candidate
               volume ~ (n_probe / n_cells) x |corpus| x |queries| — THE
               knob-driven term
  verify     — re-attach corpus vectors to the deduped candidates + exact
               cosine + top-k window

and sweeps (n_cells, n_probe) to find whether a finer quantizer closes the
gap (more cells -> fewer candidates per probe at equal probe fraction) or
whether the verify join's corpus-vector re-attach dominates regardless —
the decision table for README goes from these numbers.

Corpus/query/ground-truth generation identical to bench_ann_recall.py
(deterministic per-id numpy streams; numpy oracle over the same vectors).

Usage: python tools/bench_ivf_anatomy.py [n_vecs] [dim] [n_queries] [runs]
Artifact: $IVF_BENCH_OUT or BENCH/ivf_anatomy_r7.json
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time
from collections.abc import Iterator

import numpy as np
import pandas as pd

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from tools.bench_ann_recall import member_vec, query_vec

K = 10
CONFIGS = [  # (n_cells, n_probe) — r6 shipped 256/8
    (256, 4),
    (256, 8),
    (1024, 8),
    (1024, 16),
    # (4096, 16) deliberately EXCLUDED: ivf_train's 256*n_cells sample
    # bound reaches the full 1M corpus at 4096 cells, degrading the driver
    # fit to full-corpus k-means — the r7 run aborted it at 30 minutes of
    # index build (BENCH/ivf_anatomy_r7.json "aborted_config"). Re-add only
    # with an explicit train_cap.
]


def main() -> None:
    n_vecs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    dim = int(sys.argv[2]) if len(sys.argv) > 2 else 768
    n_queries = int(sys.argv[3]) if len(sys.argv) > 3 else 100
    runs = int(sys.argv[4]) if len(sys.argv) > 4 else 2

    from nlp_entity_linking_spark.conf import get_spark
    from nlp_entity_linking_spark.operators import ann

    spark = get_spark(app_name="bench_ivf_anatomy")

    @F.pandas_udf("array<float>")
    def gen_member(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for ids in batches:
            yield pd.Series([member_vec(int(i), dim) for i in ids])

    corpus = (
        spark.range(n_vecs)
        .select(F.col("id").alias("vec_id"), gen_member("id").alias("embedding"))
        .persist()
    )
    corpus.count()
    q_np = np.stack([query_vec(j, n_vecs, n_queries, dim) for j in range(n_queries)])
    queries = spark.createDataFrame(
        [(j, q_np[j].tolist()) for j in range(n_queries)],
        "query_id long, embedding array<float>",
    ).persist()
    queries.count()

    # numpy exact ground truth (the same deterministic vectors)
    c_np = np.stack([member_vec(i, dim) for i in range(n_vecs)]).astype(np.float64)
    c_np /= np.maximum(np.linalg.norm(c_np, axis=1, keepdims=True), 1e-12)
    qn = q_np.astype(np.float64)
    qn /= np.maximum(np.linalg.norm(qn, axis=1, keepdims=True), 1e-12)
    np_topk = np.argsort(-(c_np @ qn.T), axis=0)[:K, :]
    exact = {j: set(int(v) for v in np_topk[:, j]) for j in range(n_queries)}
    del c_np

    stage_dir = tempfile.mkdtemp(prefix="ivf_anatomy_")
    results = {"n_vecs": n_vecs, "dim": dim, "n_queries": n_queries, "k": K,
               "runs": runs, "configs": []}

    def min_of(fn):
        walls = []
        for _ in range(runs):
            t0 = time.perf_counter()
            fn()
            walls.append(round(time.perf_counter() - t0, 2))
        return min(walls), walls

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    trained: dict[int, tuple] = {}
    for n_cells, n_probe in CONFIGS:
        row: dict = {"n_cells": n_cells, "n_probe": n_probe,
                     "probe_fraction": round(n_probe / n_cells, 5)}
        if n_cells not in trained:
            t0 = time.perf_counter()
            centers = ann.ivf_train(corpus, n_cells=n_cells)
            train_sec = round(time.perf_counter() - t0, 1)
            t0 = time.perf_counter()
            ann.ivf_assign_cells(corpus, centers).write.mode(
                "overwrite"
            ).parquet(f"{stage_dir}/cells_{n_cells}")
            index_sec = round(time.perf_counter() - t0, 1)
            cells = spark.read.parquet(f"{stage_dir}/cells_{n_cells}")
            trained[n_cells] = (centers, cells, train_sec, index_sec)
        centers, cells, train_sec, index_sec = trained[n_cells]
        row["train_sec_onetime"] = train_sec
        row["index_assign_sec_onetime"] = index_sec

        centers_n = np.asarray(centers, dtype=np.float64)
        q_cells = queries.select(
            "query_id",
            F.explode(
                ann._cell_assign_udf(centers_n, n_probe)(F.col("embedding"))
            ).alias("cell"),
        )
        row["sub.q_cells_sec"], _ = min_of(lambda: noop(q_cells))

        cand = (
            cells.join(F.broadcast(q_cells), "cell")
            .select("query_id", "vec_id")
            .dropDuplicates(["query_id", "vec_id"])
        )
        row["sub.cand_join_sec"], _ = min_of(lambda: noop(cand))
        row["n_candidates"] = cand.count()

        # verify isolated from the candidate join by staging candidates
        cand.write.mode("overwrite").parquet(f"{stage_dir}/cand")
        cand_staged = spark.read.parquet(f"{stage_dir}/cand")
        sims = ann._verify_cosine(
            cand_staged, corpus, queries, "vec_id", "embedding", "query_id"
        )
        from pyspark.sql import Window

        w = Window.partitionBy("query_id").orderBy(
            F.desc("cos_sim"), F.asc("vec_id")
        )
        topk = (
            sims.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= K)
            .select("query_id", "vec_id", "cos_sim", "rank")
        )
        row["sub.verify_topk_sec"], _ = min_of(lambda: noop(topk))

        # full probe (what a user calls), incl. driver collect like the
        # r6 recall bench measured
        def full():
            return ann.ivf_topk(
                corpus, queries, k=K, n_cells=n_cells, n_probe=n_probe,
                centers=centers, corpus_cells=cells,
            ).collect()

        walls = []
        rows_out = None
        for _ in range(runs):
            t0 = time.perf_counter()
            rows_out = full()
            walls.append(round(time.perf_counter() - t0, 2))
        row["probe_full_sec"] = min(walls)
        row["probe_full_runs"] = walls
        got: dict[int, set] = {}
        for r in rows_out:
            got.setdefault(r["query_id"], set()).add(r["vec_id"])
        row["recall_at_10"] = round(
            sum(len(got.get(j, set()) & exact[j]) / K for j in range(n_queries))
            / n_queries, 4,
        )
        results["configs"].append(row)
        print(json.dumps(row), flush=True)

    print(json.dumps(results))
    out = os.environ.get("IVF_BENCH_OUT") or os.path.join(
        "/root/repo", "BENCH", "ivf_anatomy_r7.json"
    )
    with open(out, "w") as fh:
        json.dump(results, fh, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
