"""Measure the simhash scale form (explode + 64 codegen sum aggregates,
operators/dedup.simhash_signatures_df) against the row-local HOF column form
(simhash64) — the two are signature-identical
(tests/test_dedup.py::test_simhash_df_equals_column_form); this quantifies
the interpreted-HOF penalty the rewrite removes.

Corpus: sf0.1 documents replicated to ~100k rows (deterministic ids).

Usage: python tools/bench_simhash.py [replicas] [runs]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> None:
    replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    from pyspark.sql import functions as F

    from nlp_entity_linking_spark.conf import get_spark
    from nlp_entity_linking_spark.functions.normalize import normalize, tokenize
    from nlp_entity_linking_spark.operators.dedup import (
        simhash64,
        simhash_signatures_df,
    )

    spark = get_spark(app_name="bench_simhash")
    docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    n_base = docs.count()
    corpus = (
        docs.select("doc_id", "text")
        .crossJoin(spark.range(replicas).select(F.col("id").alias("_rep")))
        .select(
            (F.col("doc_id") + F.col("_rep") * n_base).alias("record_id"),
            tokenize(normalize("text")).alias("toks"),
        )
        .persist()
    )
    n = corpus.count()

    def run_fast() -> int:
        return (
            simhash_signatures_df(corpus, tokens_col="toks")
            .agg(F.bit_xor("sig"))
            .collect()[0][0]
        )

    def run_slow() -> int:
        return (
            corpus.select(simhash64("toks").alias("sig"))
            .agg(F.bit_xor("sig"))
            .collect()[0][0]
        )

    results: dict[str, list[float]] = {"codegen_agg": [], "hof_column": []}
    checks = set()
    for r in range(runs + 1):  # first pass = warm-up, discarded
        for key, fn in (("codegen_agg", run_fast), ("hof_column", run_slow)):
            t0 = time.perf_counter()
            checks.add(fn())
            dt = time.perf_counter() - t0
            if r > 0:
                results[key].append(dt)
            print(
                json.dumps(
                    {"variant": key, "run": r, "sec": round(dt, 2), "warmup": r == 0}
                )
            )
    assert len(checks) == 1, "signature xor mismatch between forms"
    med = {k: sorted(v)[len(v) // 2] for k, v in results.items()}
    print(
        json.dumps(
            {
                "n_docs": n,
                "median_sec": {k: round(v, 2) for k, v in med.items()},
                "speedup": round(med["hof_column"] / med["codegen_agg"], 1),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
