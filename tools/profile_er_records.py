"""Profile er_records — the pipeline's largest stage post-r5 (3.8s of
15.3s at sf0.1) — across the one knob never swept: the Arrow batch size
(spark.sql.execution.arrow.maxRecordsPerBatch, pinned at 10000 since r1)
x input-partition width (how many Python workers run concurrently and how
much each iterator-UDF invocation amortizes its regex state).

Protocol mirrors bench.py: pages staged to parquet once per width (so the
scan shape is fixed and no repartition shuffle rides inside the timing),
min-of-`runs` walls, count() on the records output (the UDF column feeds
the projected schema, so count computes the full extraction). Batch size
is a runtime SQL conf — swept inside one JVM; widths get their own staged
input directory.

Usage: python tools/profile_er_records.py [n_pages] [runs]
Writes BENCH/er_records_profile_r6.json when PROFILE_OUT is set.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

BATCH_SIZES = (2500, 5000, 10000, 20000, 40000)
WIDTHS = (32, 64)


def main() -> None:
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    from nlp_entity_linking_spark.conf import get_spark
    from nlp_entity_linking_spark.plans import pipeline as P
    from nlp_entity_linking_spark.sources.synthetic import gen_pages

    spark = get_spark(app_name="profile-er-records", master="local[32]")
    cfg = P.PipelineConfig()
    base = "/tmp/profile_er_records_stage"

    staged = {}
    for w in WIDTHS:
        path = os.path.join(base, f"pages_{w}")
        gen_pages(spark, n_pages)[0].repartition(w).write.mode(
            "overwrite"
        ).parquet(path)
        staged[w] = path

    # warm the Python worker pool (first Arrow batch pays imports)
    P.build_records(spark.read.parquet(staged[WIDTHS[0]]).limit(512), cfg).count()

    grid = {}
    n_records = None
    for w in WIDTHS:
        pages = spark.read.parquet(staged[w])
        for b in BATCH_SIZES:
            spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", str(b))
            walls = []
            for _ in range(runs):
                t0 = time.perf_counter()
                n_records = P.build_records(pages, cfg).count()
                walls.append(round(time.perf_counter() - t0, 3))
            grid[f"w{w}_b{b}"] = {"min_wall_sec": min(walls), "walls": walls}
            print(json.dumps({"width": w, "batch": b, "walls": walls}), flush=True)
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")

    best = min(grid.items(), key=lambda kv: kv[1]["min_wall_sec"])
    current = grid.get("w32_b10000")
    result = {
        "n_pages": n_pages,
        "n_records": n_records,
        "master": "local[32]",
        "protocol": f"min-of-{runs}, parquet-staged per width, warm workers",
        "grid": grid,
        "best": {"config": best[0], "min_wall_sec": best[1]["min_wall_sec"]},
        "current_default": {
            "config": "w32_b10000",
            "min_wall_sec": current["min_wall_sec"] if current else None,
        },
    }
    print(json.dumps(result))
    out = os.environ.get("PROFILE_OUT")
    if out:
        with open(out, "w") as fh:
            json.dump(result, fh, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
