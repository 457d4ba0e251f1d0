"""Blocking-stage isolation bench: answers "what does candidate-pair
generation REALLY cost" independent of the full-bench timer boundaries
(BENCH_r03 showed er_blocking_pairs 27.7s -> 39.0s round-over-round with
no blocking-code change — this tool attributes such deltas to real cost
vs shared-host noise / timer attribution).

Two-phase like tools/bench_stage.py: phase A builds records once and
parquets them; phase B times ONLY build_candidate_pairs().count() in a
fresh JVM (one discarded warm pass, then median of 3) so upstream caches,
Python-worker warmup, and extraction cost can't leak into the number.
Blocking is pure JVM (codegen hashes + shuffles) — no pandas workers.

Usage: python tools/bench_blocking.py [--master local[32]] [--n-pages 100000]
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


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--master", default="local[32]")
    ap.add_argument("--n-pages", type=int, default=100_000)
    ap.add_argument("--runs", type=int, default=3)
    args = ap.parse_args()

    from nlp_entity_linking_spark.conf import get_spark
    from nlp_entity_linking_spark.plans import pipeline as P

    cfg = P.PipelineConfig()
    tmp = tempfile.mkdtemp(prefix="bench_blk_")
    rec_path = f"{tmp}/records.parquet"

    # ---- phase A: build records in their own JVM ----
    spark = get_spark(app_name="blk_build", master=args.master)
    from nlp_entity_linking_spark.sources.synthetic import gen_pages

    pages, _ = gen_pages(spark, args.n_pages)
    records = P.build_records(pages, cfg)
    records.write.mode("overwrite").parquet(rec_path)
    spark.stop()

    # ---- phase B: fresh JVM, isolated blocking timing ----
    # pin spark.local.dir to a private dir so the shuffle bytes this stage
    # writes can be measured directly from disk — walls on this shared host
    # swing 6s-88s across identical code (see README), but shuffle volume
    # is DETERMINISTIC and is the thing key-width changes actually move.
    local_dir = f"{tmp}/spark_local"
    spark = get_spark(
        app_name="blk_time",
        master=args.master,
        extra_conf={"spark.local.dir": local_dir},
    )

    def _files(root: str) -> dict:
        """path -> size snapshot. Shuffle volume is measured as the sum of
        files CREATED during the run (path-set difference), NOT a total-
        size delta: clearCache() releases earlier runs' shuffle
        dependencies and the ContextCleaner deletes their files
        asynchronously — possibly inside the next timed window — which
        would erode (even negate) a size delta while the new-files sum
        stays exact (the measured job's shuffle files live until its RDDs
        are GC'd, i.e. past the scan)."""
        out = {}
        for dirpath, _dirnames, filenames in os.walk(root):
            for f in filenames:
                p = os.path.join(dirpath, f)
                try:
                    out[p] = os.path.getsize(p)
                except OSError:
                    pass
        return out

    walls = []
    shuffle_bytes = 0
    n_pairs = 0
    for i in range(args.runs + 1):  # first pass discarded (JIT/page cache)
        # build_candidate_pairs persists `blocks` internally and Spark's
        # CacheManager matches identical analyzed plans ACROSS runs — clear
        # everything and re-warm only the records cache outside the timer,
        # or later runs silently skip the minhash build.
        spark.catalog.clearCache()
        records = spark.read.parquet(rec_path).persist()
        n_records = records.count()
        before = _files(local_dir)
        t0 = time.perf_counter()
        n_pairs = P.build_candidate_pairs(records, cfg).count()
        w = time.perf_counter() - t0
        if i > 0:
            walls.append(w)
        after = _files(local_dir)
        shuffle_bytes = sum(s for p, s in after.items() if p not in before)
    spark.stop()
    shutil.rmtree(tmp, ignore_errors=True)

    med = sorted(walls)[len(walls) // 2]
    print(
        json.dumps(
            {
                "master": args.master,
                "n_records": n_records,
                "n_candidate_pairs": n_pairs,
                "blocking_wall_sec": round(med, 3),
                "walls_all": [round(w, 3) for w in walls],
                "best_wall_sec": round(min(walls), 3),
                "shuffle_mb_last_run": round(shuffle_bytes / 1e6, 1),
                "pairs_per_sec": round(n_pairs / med, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
