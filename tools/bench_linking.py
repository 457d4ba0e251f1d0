"""Entity-linking throughput at bench scale (the namesake capability).

q:linking_docs is hash-green at sf0.01 (1,372 rows) and test_linking runs
the full DuckDB twin, but the collective pass has a two-consumer persisted
plan whose behavior at bench scale — 100k docs x real alias fan-out, with
the template-heavy hot-entity skew the synthetic corpus plants — was never
measured. This tool records docs/s plus the per-stage anatomy:

* mentions    — capitalized-run extraction over the corpus (staged to
                parquet once; the timed stages read the staged tables so
                each wall isolates ONE stage, same protocol as bench.py)
* kb_prep     — alias-cap window + desc token-set precompute
                (L.prepare_aliases). Separated out because it is a
                ONE-TIME KB preparation, amortized over every corpus the
                dictionary ever links — folding it into the candidates
                wall (as the first cut of this tool did) misattributed
                ~80% of the stage to a cost production pays once.
* candidates  — normalized-surface equi-join + integer context-overlap
                scores (L.candidate_entities) over the STAGED capped KB
* local       — per-mention argmax (L.link_mentions) over staged candidates
* collective  — one-entity-per-discourse vote + relabel (L.link_collective)
                over the same staged candidates
* e2e         — L.link_pipeline end-to-end from staged mentions+KB
                (candidates recomputed inside, cands persisted once via
                cache_registry — the production call shape)

KB shape: every distinct mention surface is an alias with `fanout`
candidate entities (ids/priors md5-60bit, descriptions differing by one
corpus token), so candidate expansion is fanout x mentions before the
n_cand cap — alias skew follows the corpus' hot-entity skew (hot surfaces
appear in ~0.5% of pages each, i.e. thousands of mentions pooling votes
in the collective pass).

Walls are min-of-`runs` per stage (interference only ever adds time).

Usage: python tools/bench_linking.py [n_pages] [fanout] [runs]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F


def timed(fn, runs: int):
    best = None
    for _ in range(runs):
        t0 = time.perf_counter()
        n = fn()
        w = time.perf_counter() - t0
        best = w if best is None or w < best else best
    return n, best


def main() -> None:
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    fanout = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    runs = int(sys.argv[3]) if len(sys.argv) > 3 else 3

    from nlp_entity_linking_spark.conf import get_spark
    from nlp_entity_linking_spark.operators import linking as L
    from nlp_entity_linking_spark.functions.normalize import normalize
    from nlp_entity_linking_spark.sources.synthetic import gen_pages

    spark = get_spark(app_name="bench-linking", master="local[32]")
    base = "/tmp/bench_linking_stage"
    pages, _ = gen_pages(spark, n_pages)
    docs = pages.select(
        F.xxhash64("url", "warc_ts").alias("doc_id"), "text"
    )

    # ---- stage inputs once (not timed) -----------------------------------
    mentions_path = os.path.join(base, "mentions")
    L.mentions_from_documents(docs).write.mode("overwrite").parquet(mentions_path)
    mentions = spark.read.parquet(mentions_path)
    n_mentions = mentions.count()

    def md5long(c):
        return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")

    al = mentions.select(normalize("surface").alias("alias")).distinct()
    kb = None
    extras = ["spark", "vector", "engine", "corpus", "signal", "module",
              "tensor", "stream", "kernel", "lattice", "cipher", "matrix"]
    for k in range(fanout):
        part = al.select(
            "alias",
            md5long(F.concat(F.col("alias"), F.lit(f"#{k}"))).alias("entity_id"),
            (md5long(F.concat(F.col("alias"), F.lit(f"p{k}"))) % 900 + 100)
            .alias("prior"),
            F.concat(
                F.split("alias", " "), F.array(F.lit(extras[k % len(extras)]))
            ).alias("desc_tokens"),
        )
        kb = part if kb is None else kb.unionByName(part)
    kb_path = os.path.join(base, "kb")
    kb.write.mode("overwrite").parquet(kb_path)
    kb = spark.read.parquet(kb_path)
    n_aliases = kb.select("alias").distinct().count()

    # ---- kb prep (one-time, amortized in production) ----------------------
    n_capped, w_prep = timed(
        lambda: L.prepare_aliases(kb, n_cand=16).count(), runs
    )
    capped_path = os.path.join(base, "capped")
    L.prepare_aliases(kb, n_cand=16).write.mode("overwrite").parquet(capped_path)
    capped = spark.read.parquet(capped_path)

    # ---- candidates -------------------------------------------------------
    n_cands, w_cand = timed(
        lambda: L.candidate_entities(mentions, capped).count(), runs
    )
    # stage candidates so local/collective walls isolate their own stage
    cands_path = os.path.join(base, "cands")
    L.candidate_entities(mentions, capped).write.mode("overwrite").parquet(
        cands_path
    )
    cands = spark.read.parquet(cands_path)

    n_local, w_local = timed(lambda: L.link_mentions(cands).count(), runs)
    n_coll, w_coll = timed(lambda: L.link_collective(cands).count(), runs)

    def e2e():
        reg: list = []
        n = L.link_pipeline(
            mentions, kb, n_cand=16, collective=True, cache_registry=reg
        ).count()
        for df in reg:
            df.unpersist()
        return n

    n_e2e, w_e2e = timed(e2e, runs)

    result = {
        "n_pages": n_pages,
        "n_docs": docs.count(),
        "n_mentions": n_mentions,
        "n_aliases": n_aliases,
        "kb_fanout": fanout,
        "n_cand_cap": 16,
        "n_capped_kb_rows": n_capped,
        "n_candidate_rows": n_cands,
        "n_linked_local": n_local,
        "n_linked_collective": n_coll,
        "n_linked_e2e": n_e2e,
        "master": "local[32]",
        "protocol": f"min-of-{runs} per stage, parquet-staged inputs",
        "stage_wall_sec": {
            "kb_prep_one_time": round(w_prep, 2),
            "candidates": round(w_cand, 2),
            "local_argmax": round(w_local, 2),
            "collective": round(w_coll, 2),
            "e2e_pipeline": round(w_e2e, 2),
        },
        "docs_per_sec_e2e": round(docs.count() / w_e2e, 1),
        "mentions_per_sec_e2e": round(n_mentions / w_e2e, 1),
    }
    print(json.dumps(result))
    out = os.environ.get("LINKING_BENCH_OUT")
    if out:
        with open(out, "w") as fh:
            json.dump(result, fh, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
