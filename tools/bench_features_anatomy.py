"""Sub-stage anatomy of the two dominant e2e walls: features (303s of the
833s 1M-page certification) and candidate_pairs (158s).

Round 6 proved twice (linking's kb_prep, ANN's index-scan-in-probe) that
UNSPLIT walls misattribute cost; this tool splits the engine's two biggest
stages so the exchange that matters at 100x is tuned on evidence, not
guesses.

Method: every sub-stage reads its inputs from STAGED PARQUET (so the wall
contains only that sub-stage's work) and materializes through the `noop`
sink (all columns computed, nothing written — parquet-write cost is
reported as its own line). min-of-k per sub-stage. Full-stage runs from the
same staged inputs cross-check that the parts sum to the whole (plus or
minus plan-fusion savings, which are reported, not hidden).

Sub-stages
  blocking: sig_agg (explode shingles -> 64 min-hash aggs)
            blocks_full (sig_agg + band-key projection + explode)
            hot_salt (hot-key sizes + salt join, from staged blocks)
            pair_join (size-pruned in-block expansion, from staged blocks)
            snb (sorted-neighborhood pairs, from staged records)
            stage_full (build_candidate_pairs = all of the above + one
                        merged (id_a,id_b) dedup exchange)
  features: stats_job (one count+sum agg driving n_docs + broadcast choice)
            weights_build (TF-IDF: tf groupBy, df agg, idf join, norm)
            cosine_exchange (the (id,token) sparse-dot joins over staged
                             pairs x staged weights — THE candidate
                             bottleneck at 100x)
            attach_tsl (two id-joins re-attaching norms/tokens + token-set
                        Levenshtein)
            stage_full (build_features from staged records+pairs)
            stage_write (stage_full + parquet write — what the e2e lineage
                         wall actually times)

Plus a shuffle-width sweep over the cosine exchange (the documented no-
lever/lever verdict for VERDICT r6 #2).

Usage: python tools/bench_features_anatomy.py [n_pages] [k] [workdir] [artifact]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

REPO = "/root/repo"
sys.path.insert(0, REPO)


def _noop(df) -> float:
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return round(time.perf_counter() - t0, 3)


def _min_of_k(k: int, fn) -> tuple[float, list[float]]:
    runs = [fn() for _ in range(k)]
    return min(runs), runs


def main() -> None:
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    work = sys.argv[3] if len(sys.argv) > 3 else "/tmp/erlink_anatomy"
    artifact = (
        sys.argv[4]
        if len(sys.argv) > 4
        else os.path.join(REPO, "BENCH", "features_anatomy_r7.json")
    )
    from pyspark.sql import functions as F

    from nlp_entity_linking_spark.conf import get_spark
    from nlp_entity_linking_spark.functions import similarity as S
    from nlp_entity_linking_spark.operators import blocking as B
    from nlp_entity_linking_spark.plans import pipeline as P
    from nlp_entity_linking_spark.sources.synthetic import gen_pages

    shutil.rmtree(work, ignore_errors=True)
    os.makedirs(work)
    spark = get_spark(app_name="features-anatomy", master="local[32]")
    cfg = P.PipelineConfig()
    out: dict = {"n_pages": n_pages, "k": k, "master": "local[32]",
                 "protocol": "staged-parquet inputs, noop materialization, "
                             "min-of-k", "sub_walls_sec": {}}
    sw = out["sub_walls_sec"]

    def staged(name: str, df):
        p = os.path.join(work, name)
        t0 = time.perf_counter()
        df.write.mode("overwrite").parquet(p)
        wall = round(time.perf_counter() - t0, 3)
        return spark.read.parquet(p), wall

    # ---- setup: records staged once (not part of the anatomy) ----------
    pages, _ = gen_pages(spark, n_pages)
    records, w = staged("records", P.build_records(pages, cfg))
    out["setup_records_build_and_write_sec"] = w
    out["n_records"] = records.count()

    # ================= blocking anatomy ==================================
    ex = records.select("record_id", F.explode("shingles").alias("_sh"))
    aggs = [
        F.min(F.xxhash64(F.lit(i), F.col("_sh"), F.lit(42))).alias(f"_h{i}")
        for i in range(cfg.minhash_k)
    ]
    sw["blocking.sig_agg"], runs_sig = _min_of_k(
        k, lambda: _noop(ex.groupBy("record_id").agg(*aggs))
    )
    sw["blocking.blocks_full"], _ = _min_of_k(
        k, lambda: _noop(B.lsh_blocks(records, "shingles",
                                      k=cfg.minhash_k, bands=cfg.bands))
    )
    blocks, w = staged(
        "blocks", B.lsh_blocks(records, "shingles", k=cfg.minhash_k,
                               bands=cfg.bands)
    )
    out["blocks_write_sec"] = w
    out["n_blocks"] = blocks.count()
    hot = B.hot_keys(blocks, cfg.salt_cap)
    sw["blocking.hot_salt"], _ = _min_of_k(
        k, lambda: _noop(B.apply_salt(blocks, hot))
    )
    sw["blocking.pair_join"], _ = _min_of_k(
        k, lambda: _noop(
            B.pairs_from_blocks(B.apply_salt(blocks, hot), dedup=False)
        )
    )
    sw["blocking.snb"], _ = _min_of_k(
        k, lambda: _noop(B.snb_pairs(records, "norm", window=cfg.snb_window))
    )
    sw["blocking.stage_full"], _ = _min_of_k(
        k, lambda: _noop(P.build_candidate_pairs(records, cfg))
    )
    pairs, w = staged("pairs", P.build_candidate_pairs(records, cfg))
    out["pairs_write_sec"] = w
    out["n_pairs"] = pairs.count()

    # ================= features anatomy ==================================
    def _stats():
        t0 = time.perf_counter()
        records.agg(F.count("*").alias("n"),
                    F.sum(F.size("ctx_tokens")).alias("tok")).collect()
        return round(time.perf_counter() - t0, 3)

    sw["features.stats_job"], _ = _min_of_k(k, _stats)
    n_docs = out["n_records"]
    sw["features.weights_build"], _ = _min_of_k(
        k, lambda: _noop(S.tfidf_weights(records, "ctx_tokens", n_docs=n_docs))
    )
    weights, w = staged(
        "weights", S.tfidf_weights(records, "ctx_tokens", n_docs=n_docs)
    )
    out["weights_write_sec"] = w
    out["n_weight_rows"] = weights.count()
    broadcast = out["n_weight_rows"] < 1_500_000
    out["cosine_broadcast_weights"] = broadcast
    thin = pairs.select("id_a", "id_b", "block_key")
    sw["features.cosine_exchange"], _ = _min_of_k(
        k, lambda: _noop(S.pair_cosine(thin, weights,
                                       broadcast_weights=broadcast))
    )
    a = records.select(F.col("record_id").alias("id_a"),
                       F.col("norm").alias("norm_a"),
                       F.col("tokens").alias("tokens_a"))
    b = records.select(F.col("record_id").alias("id_b"),
                       F.col("norm").alias("norm_b"),
                       F.col("tokens").alias("tokens_b"))
    sw["features.attach_tsl"], _ = _min_of_k(
        k, lambda: _noop(
            thin.join(a, "id_a").join(b, "id_b")
            .withColumn("tsl", S.token_set_lev("tokens_a", "tokens_b"))
            .select("id_a", "id_b", "block_key", "norm_a", "norm_b", "tsl")
        )
    )
    sw["features.stage_full"], _ = _min_of_k(
        k, lambda: _noop(P.build_features(records, pairs, cfg))
    )

    def _stage_write():
        t0 = time.perf_counter()
        P.build_features(records, pairs, cfg).write.mode("overwrite").parquet(
            os.path.join(work, "feat_out")
        )
        return round(time.perf_counter() - t0, 3)

    sw["features.stage_write"], _ = _min_of_k(k, _stage_write)

    # ---- shuffle-width sweep over the dominant exchange -----------------
    base_parts = spark.conf.get("spark.sql.shuffle.partitions")
    sweep = {}
    for parts in (32, 64, 128, 256):
        spark.conf.set("spark.sql.shuffle.partitions", str(parts))
        wall, runs = _min_of_k(
            k, lambda: _noop(S.pair_cosine(thin, weights,
                                           broadcast_weights=broadcast))
        )
        sweep[str(parts)] = {"min_sec": wall, "runs": runs}
    spark.conf.set("spark.sql.shuffle.partitions", base_parts)
    out["cosine_shuffle_partition_sweep"] = sweep

    # parts-vs-whole cross-check (fusion savings are visible, not hidden)
    out["crosscheck"] = {
        "blocking_parts_sum_sec": round(
            sw["blocking.blocks_full"] + sw["blocking.hot_salt"]
            + sw["blocking.pair_join"] + sw["blocking.snb"], 3
        ),
        "blocking_stage_full_sec": sw["blocking.stage_full"],
        "features_parts_sum_sec": round(
            sw["features.stats_job"] + sw["features.weights_build"]
            + sw["features.cosine_exchange"] + sw["features.attach_tsl"], 3
        ),
        "features_stage_full_sec": sw["features.stage_full"],
        "features_parquet_write_delta_sec": round(
            sw["features.stage_write"] - sw["features.stage_full"], 3
        ),
    }
    print(json.dumps(out))
    with open(artifact, "w") as fh:
        json.dump(out, fh, indent=1)
    spark.stop()
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
