"""Measure extract-before-dedup vs dedup-before-extract for the records
stage (SURVEY.md §4.1; the two orders are output-identical — see
tests/test_pipeline.py::test_extract_order_equivalence).

The trade: extract-first runs the Arrow UDF over every snapshot (~1.1x rows
at the fixture's ~10% re-crawl ratio) but the latest-per-url window then
shuffles thin extracted text; dedup-first shuffles the html binary payload
through the window and extracts only the survivors.

Usage: python tools/bench_extract_order.py [n_pages] [runs]
Prints one JSON line per timed run plus a winner summary.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> None:
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    from nlp_entity_linking_spark.conf import get_spark
    from nlp_entity_linking_spark.operators.records import extract_records
    from nlp_entity_linking_spark.sources.synthetic import gen_pages

    spark = get_spark(app_name="bench_extract_order")
    pages, _ = gen_pages(spark, n_pages)
    pages = pages.persist()
    pages.count()  # materialize the generator out of the timed region

    import tempfile

    out = tempfile.mkdtemp(prefix="bench_extract_")
    results: dict[str, list[float]] = {"extract_first": [], "dedup_first": []}
    # interleave variants; first pass per variant is the Python-worker
    # warm-up (discarded)
    for r in range(runs + 1):
        for key, flag in (("extract_first", True), ("dedup_first", False)):
            t0 = time.perf_counter()
            extract_records(pages, extract_first=flag).write.mode(
                "overwrite"
            ).parquet(f"{out}/{key}")
            dt = time.perf_counter() - t0
            if r > 0:
                results[key].append(dt)
            print(
                json.dumps(
                    {"variant": key, "run": r, "sec": round(dt, 2), "warmup": r == 0}
                )
            )
    med = {k: sorted(v)[len(v) // 2] for k, v in results.items()}
    print(
        json.dumps(
            {
                "n_pages": n_pages,
                "median_sec": {k: round(v, 2) for k, v in med.items()},
                "winner": min(med, key=med.get),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
