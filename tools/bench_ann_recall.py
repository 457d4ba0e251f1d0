"""ANN recall/latency at bench scale: the 100-TB claim's measured point.

test_ann proves recall >= 0.9 at test scale (hundreds of vectors); this tool
records one bench-scale point — default 100k x dim-768 corpus, 100 queries —
for every shipped ANN path against exact brute force:

* brute   — ann.brute_force_topk (exact; the ground truth AND the latency
            baseline). Its top-k sets are independently cross-checked against
            a driver-side numpy scan of the same deterministic corpus, so the
            ground truth does not assume the JVM path is correct.
* lsh p1  — ann.lsh_topk, single-probe (n_planes=12, n_tables=4).
* lsh p4  — same tables, multi-probe n_probe=4 (Lv et al. VLDB'07): recall
            bought WITHOUT growing the corpus bucket table.
* ivf     — ann.ivf_topk (n_cells=256, n_probe=8, bounded training sample).
            The coarse quantizer trains ONCE via ann.ivf_train (a fixed,
            corpus-size-independent cost — the sample is capped at
            256*n_cells vectors) and is reused across the timed probe runs,
            matching production use (FAISS-style train once / search many);
            ivf_train_sec is reported alongside the probe wall.

Corpus shape is the regime ANN targets (clustered, like real text
embeddings): n_clusters centers, members = center + noise*randn, both from
per-id seeded RandomState streams so workers and the driver-side numpy
oracle generate byte-identical vectors with no data movement.

r6: LSH buckets and IVF cells are built ONCE, staged to parquet (the
production shape: buckets/cells stored beside the vector at ingest), and
the timed probes run against the staged index — lsh_index_sec /
ivf_index_sec report the one-time O(corpus) index-build terms separately
from the recurring per-query-batch walls. The first 1M-vector run folded
the index scan into every probe wall and made the scale paths look like
they scaled WORSE than brute force.

Recall@k = |approx top-k ∩ exact top-k| / k, averaged over queries.
Walls are min-of-`runs` per variant (interference only ever adds time).

Usage: python tools/bench_ann_recall.py [n_vecs] [dim] [n_queries] [runs]
"""

from __future__ import annotations

import json
import os
import sys
import time
from collections.abc import Iterator

import numpy as np
import pandas as pd

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

N_CLUSTERS = 2000
NOISE = 0.15
K = 10
CENTER_SEED = 900_000_000  # keeps center streams disjoint from member ids


def member_vec(i: int, dim: int) -> np.ndarray:
    """Deterministic corpus vector i — identical formula on workers/driver."""
    center = np.random.RandomState(CENTER_SEED + i % N_CLUSTERS).randn(dim)
    noise = np.random.RandomState(i & 0x7FFFFFFF).randn(dim)
    return (center + NOISE * noise).astype(np.float32)


def query_vec(j: int, n_vecs: int, n_queries: int, dim: int) -> np.ndarray:
    """Query j: a fresh perturbation of an existing cluster (stride-spread
    over the corpus so queries hit n_queries distinct clusters)."""
    anchor = (j * (n_vecs // n_queries)) % n_vecs
    center = np.random.RandomState(CENTER_SEED + anchor % N_CLUSTERS).randn(dim)
    noise = np.random.RandomState((anchor + 1_000_003 * (j + 1)) & 0x7FFFFFFF).randn(dim)
    return (center + NOISE * noise).astype(np.float32)


def main() -> None:
    n_vecs = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    dim = int(sys.argv[2]) if len(sys.argv) > 2 else 768
    n_queries = int(sys.argv[3]) if len(sys.argv) > 3 else 100
    runs = int(sys.argv[4]) if len(sys.argv) > 4 else 2

    from nlp_entity_linking_spark.conf import get_spark
    from nlp_entity_linking_spark.operators.ann import (
        brute_force_topk,
        ivf_assign_cells,
        ivf_topk,
        ivf_train,
        lsh_topk,
        rp_buckets,
    )

    spark = get_spark(app_name="bench_ann_recall")

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

    def collect_topk(df) -> dict[int, list[int]]:
        rows = df.orderBy("query_id", "rank").collect()
        out: dict[int, list[int]] = {}
        for r in rows:
            out.setdefault(r["query_id"], []).append(r["vec_id"])
        return out

    def timed(fn, label: str):
        best_wall, result = None, None
        for r in range(runs):
            t0 = time.perf_counter()
            res = collect_topk(fn())
            dt = time.perf_counter() - t0
            print(json.dumps({"variant": label, "run": r, "sec": round(dt, 1)}))
            if best_wall is None or dt < best_wall:
                best_wall, result = dt, res
        return result, best_wall

    exact, brute_wall = timed(
        lambda: brute_force_topk(corpus, queries, k=K), "brute"
    )

    # independent numpy ground truth over the SAME deterministic corpus:
    # brute_force_topk must agree or the baseline itself is broken.
    c_np = np.stack([member_vec(i, dim) for i in range(n_vecs)]).astype(np.float64)
    c_np /= np.maximum(np.linalg.norm(c_np, axis=1, keepdims=True), 1e-12)
    qn = q_np.astype(np.float64)
    qn /= np.maximum(np.linalg.norm(qn, axis=1, keepdims=True), 1e-12)
    np_topk = np.argsort(-(c_np @ qn.T), axis=0)[:K, :]  # (K, n_queries)
    mismatched = sum(
        1
        for j in range(n_queries)
        if set(exact[j]) != set(int(v) for v in np_topk[:, j])
    )
    assert mismatched == 0, f"brute_force_topk disagrees with numpy on {mismatched} queries"

    def recall(approx: dict[int, list[int]]) -> float:
        return sum(
            len(set(approx.get(j, [])) & set(exact[j])) / K for j in range(n_queries)
        ) / n_queries

    # ---- INDEX BUILD (one-time per corpus snapshot, staged to parquet
    # like production stores buckets/cells at ingest) vs QUERY (recurring
    # per batch). Folding the O(corpus) index scan into the probe wall
    # misattributes the dominant one-time term to every query batch —
    # the first 1M-vector run did exactly that (ivf read 101.7s of which
    # ~only the bounded cell-join was query work).
    import tempfile

    stage_dir = tempfile.mkdtemp(prefix="ann_recall_stage_")

    t0 = time.perf_counter()
    rp_buckets(corpus, "vec_id", "embedding", 12, 4, 42).write.mode(
        "overwrite"
    ).parquet(f"{stage_dir}/lsh_buckets")
    lsh_index_sec = time.perf_counter() - t0
    cb = spark.read.parquet(f"{stage_dir}/lsh_buckets")
    print(json.dumps({"variant": "lsh_index", "sec": round(lsh_index_sec, 1)}))

    lsh1, lsh1_wall = timed(
        lambda: lsh_topk(corpus, queries, k=K, n_probe=1, corpus_buckets=cb),
        "lsh_p1",
    )
    lsh4, lsh4_wall = timed(
        lambda: lsh_topk(corpus, queries, k=K, n_probe=4, corpus_buckets=cb),
        "lsh_p4",
    )
    t0 = time.perf_counter()
    centers = ivf_train(corpus, n_cells=256)
    ivf_train_sec = time.perf_counter() - t0
    print(json.dumps({"variant": "ivf_train", "sec": round(ivf_train_sec, 1)}))
    t0 = time.perf_counter()
    ivf_assign_cells(corpus, centers).write.mode("overwrite").parquet(
        f"{stage_dir}/ivf_cells"
    )
    ivf_index_sec = time.perf_counter() - t0
    cells = spark.read.parquet(f"{stage_dir}/ivf_cells")
    print(json.dumps({"variant": "ivf_index", "sec": round(ivf_index_sec, 1)}))
    ivf, ivf_wall = timed(
        lambda: ivf_topk(
            corpus,
            queries,
            k=K,
            n_cells=256,
            n_probe=8,
            centers=centers,
            corpus_cells=cells,
        ),
        "ivf",
    )

    result = {
        "n_vecs": n_vecs,
        "dim": dim,
        "n_queries": n_queries,
        "k": K,
        "n_clusters": N_CLUSTERS,
        "noise": NOISE,
        "runs_per_variant": runs,
        "numpy_oracle_mismatches": mismatched,
        "recall_at_10": {
            "brute": 1.0,
            "lsh_probe1": round(recall(lsh1), 4),
            "lsh_probe4": round(recall(lsh4), 4),
            "ivf": round(recall(ivf), 4),
        },
        "wall_sec": {
            "brute": round(brute_wall, 1),
            "lsh_probe1": round(lsh1_wall, 1),
            "lsh_probe4": round(lsh4_wall, 1),
            "ivf": round(ivf_wall, 1),
        },
        # one-time index-build terms, amortized across every query batch
        # the index ever serves — reported apart from the recurring probe
        # walls (which run against the STAGED index, production shape)
        "ivf_train_sec": round(ivf_train_sec, 1),
        "ivf_index_sec": round(ivf_index_sec, 1),
        "lsh_index_sec": round(lsh_index_sec, 1),
    }
    print(json.dumps(result))
    out = os.environ.get("ANN_BENCH_OUT")
    if out:
        with open(out, "w") as fh:
            json.dump(result, fh, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
