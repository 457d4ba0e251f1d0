"""Measure the ANN verify-stage cosine forms at real embedding dims.

Three variants over the SAME candidate pair set (identical join shape; only
the verify math differs):

* hof3   — the retired form: cosine(a, b) = dot/(l2norm(a)*l2norm(b)) per
           pair = THREE interpreted O(dim) aggregate lambdas per pair, the
           two norms recomputed for every pair a record appears in.
* hof1   — the shipped form (ann.cosine_with_norms): per-record norms
           materialize once in the vector re-attach projection; verify is
           ONE dot per pair. Bit-identical values to hof3.
* arrow  — mapInPandas numpy dot over Arrow batches: the ceiling when a
           candidate set is big enough to amortize the Python crossing
           (float accumulation order differs, so it is NOT the oracle
           path; equality checked to 1e-6).

Broadcast joins are DISABLED for all variants: at production scale the
candidate-to-corpus vector re-attach is a shuffle equi-join (the corpus
never fits an executor), and at this harness's toy scale the extra norm
column flips a borderline broadcast estimate and would measure join
planning, not verify math.

Usage: python tools/bench_ann_verify.py [n_vecs] [n_pairs] [dim] [runs]
"""

from __future__ import annotations

import json
import sys
import time
from collections.abc import Iterator

import numpy as np
import pandas as pd

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F


def main() -> None:
    n_vecs = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    n_pairs = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000
    dim = int(sys.argv[3]) if len(sys.argv) > 3 else 768
    runs = int(sys.argv[4]) if len(sys.argv) > 4 else 3

    from nlp_entity_linking_spark.conf import get_spark
    from nlp_entity_linking_spark.operators.ann import (
        cosine,
        cosine_with_norms,
        l2norm,
    )

    spark = get_spark(
        app_name="bench_ann_verify",
        extra_conf={"spark.sql.autoBroadcastJoinThreshold": "-1"},
    )

    # deterministic synthetic embeddings: seeded per-row numpy, worker-side
    @F.pandas_udf("array<float>")
    def gen_vec(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for ids in batches:
            out = [
                np.random.RandomState(int(i) & 0x7FFFFFFF)
                .randn(dim)
                .astype(np.float32)
                for i in ids
            ]
            yield pd.Series(out)

    vecs = (
        spark.range(n_vecs)
        .select(F.col("id").alias("vec_id"), gen_vec("id").alias("v"))
        .persist()
    )
    vecs.count()
    pairs = (
        spark.range(n_pairs)
        .select(
            F.pmod(F.col("id") * 7919, F.lit(n_vecs)).alias("id_a"),
            F.pmod(F.col("id") * 104729 + 1, F.lit(n_vecs)).alias("id_b"),
        )
        .persist()
    )
    pairs.count()

    def joined(with_norms: bool):
        cols_a = [F.col("vec_id").alias("id_a"), F.col("v").alias("va")]
        cols_b = [F.col("vec_id").alias("id_b"), F.col("v").alias("vb")]
        if with_norms:
            cols_a.append(l2norm(F.col("v")).alias("na"))
            cols_b.append(l2norm(F.col("v")).alias("nb"))
        return pairs.join(vecs.select(*cols_a), "id_a").join(
            vecs.select(*cols_b), "id_b"
        )

    def run_hof3() -> float:
        return (
            joined(False)
            .select(cosine(F.col("va"), F.col("vb")).alias("c"))
            .agg(F.sum("c"))
            .collect()[0][0]
        )

    def run_hof1() -> float:
        return (
            joined(True)
            .select(
                cosine_with_norms(
                    F.col("va"), F.col("vb"), F.col("na"), F.col("nb")
                ).alias("c")
            )
            .agg(F.sum("c"))
            .collect()[0][0]
        )

    def run_arrow() -> float:
        def scorer(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                a = np.stack(pdf["va"].to_numpy()).astype(np.float64)
                b = np.stack(pdf["vb"].to_numpy()).astype(np.float64)
                c = (a * b).sum(1) / (
                    np.linalg.norm(a, axis=1) * np.linalg.norm(b, axis=1)
                )
                yield pd.DataFrame({"c": c})

        return (
            joined(False)
            .mapInPandas(scorer, "c double")
            .agg(F.sum("c"))
            .collect()[0][0]
        )

    variants = (("hof3", run_hof3), ("hof1", run_hof1), ("arrow", run_arrow))
    results: dict[str, list[float]] = {k: [] for k, _ in variants}
    sums: dict[str, float] = {}
    for r in range(runs + 1):  # first pass = warm-up, discarded
        for key, fn in variants:
            t0 = time.perf_counter()
            sums[key] = fn()
            dt = time.perf_counter() - t0
            if r > 0:
                results[key].append(dt)
            print(
                json.dumps(
                    {"variant": key, "run": r, "sec": round(dt, 2), "warmup": r == 0}
                )
            )
    assert sums["hof3"] == sums["hof1"], "hof forms must be bit-identical"
    assert abs(sums["arrow"] - sums["hof1"]) < 1e-6 * n_pairs
    med = {k: sorted(v)[len(v) // 2] for k, v in results.items()}
    print(
        json.dumps(
            {
                "n_vecs": n_vecs,
                "n_pairs": n_pairs,
                "dim": dim,
                "median_sec": {k: round(v, 2) for k, v in med.items()},
                "speedup_hof1_vs_hof3": round(med["hof3"] / med["hof1"], 2),
                "speedup_arrow_vs_hof3": round(med["hof3"] / med["arrow"], 2),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
