"""Measure incremental-ER per-batch cost over a long stream, with and
without auto-compaction.

The failure mode this guards: every micro-batch reads committed state as a
union of one table per prior epoch, so without compaction the per-batch
plan width, file-listing and job count grow linearly with stream length —
at thousands of batches the stream chokes on its own history even though
per-batch data work is bounded. compact_every=K folds the history, keeping
the union width < K.

Reports per-batch wall_ms series (from the epoch_stats commit markers) for
both runs plus a tail/head growth ratio; the compacted run's ratio should
stay near 1 while the uncompacted run's climbs.

Usage: python tools/bench_streaming.py [n_pages] [n_batches] [compact_every]
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile

sys.path.insert(0, "/root/repo")


def main() -> None:
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 4000
    n_batches = int(sys.argv[2]) if len(sys.argv) > 2 else 24
    compact_every = int(sys.argv[3]) if len(sys.argv) > 3 else 5

    from pyspark.sql import functions as F

    from nlp_entity_linking_spark.conf import get_spark
    from nlp_entity_linking_spark.functions.similarity import ScoreModel
    from nlp_entity_linking_spark.plans import pipeline as P
    from nlp_entity_linking_spark.sources.catalog import Catalog
    from nlp_entity_linking_spark.sources.synthetic import gen_pages
    from nlp_entity_linking_spark.streaming import stream_ops as ST

    spark = get_spark(app_name="bench_streaming")
    cfg = P.PipelineConfig(
        use_snb=False, model=ScoreModel(weights=(2.0, 8.0, 0.0), bias=-6.0)
    )
    work = tempfile.mkdtemp(prefix="bench_streaming_")
    pages, _ = gen_pages(spark, n_pages)
    src = f"{work}/pages_in"
    # maxFilesPerTrigger=8 in read_pages_stream -> 8 files per batch
    pages.repartition(8 * n_batches).write.mode("overwrite").parquet(src)

    def run(tag: str, every: int | None) -> list[dict]:
        out = f"{work}/cat_{tag}"
        q = ST.incremental_er(
            spark, ST.read_pages_stream(spark, src), out, tag,
            cfg=cfg, compact_every=every,
        )
        q.awaitTermination(3600)
        cat = Catalog(out, tag)
        stats = []
        e = 0
        while True:
            m = cat.committed_meta(f"epoch_stats_{e}")
            if m is None:
                break
            stats.append(m)
            e += 1
        return stats

    out = {"n_pages": n_pages, "n_batches_requested": n_batches,
           "compact_every": compact_every}
    for tag, every in (("nocompact", None), ("compact", compact_every)):
        stats = run(tag, every)
        walls = [s["wall_ms"] for s in stats]
        vis = [s["n_visible_epochs"] for s in stats]
        k = max(3, len(walls) // 4)
        head = sorted(walls[:k])[k // 2]
        tail = sorted(walls[-k:])[k // 2]
        out[tag] = {
            "n_batches": len(walls),
            "wall_ms": walls,
            "visible_epochs_at_batch": vis,
            "median_head_ms": head,
            "median_tail_ms": tail,
            "tail_over_head": round(tail / head, 2),
        }
    out["growth_ratio_nocompact_vs_compact"] = round(
        out["nocompact"]["tail_over_head"] / out["compact"]["tail_over_head"], 2
    )
    print(json.dumps(out))
    shutil.rmtree(work, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
