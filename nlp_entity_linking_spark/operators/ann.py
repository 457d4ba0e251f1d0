"""Similarity search over embedding columns (driver brief: brute-force
cosine top-k baseline + an LSH-bucketed variant as the scale path).

Representations: embeddings as array<float>; all math is promoted to double
explicitly. Two paths:

* brute_force_topk — exact: broadcast the (small) query set, JVM-side
  sequential dot product via zip_with/aggregate (no Python), ranking window
  for top-k. O(|corpus| x |queries|) — the baseline and the verifier.
* lsh_topk — scale path: random-hyperplane (SimHash-for-vectors, Charikar
  '02) signatures bucket the corpus; only same-bucket candidates get exact
  cosine. Multiple hash tables raise recall; hyperplanes are seeded numpy
  literals so the operator stays deterministic and cluster-layout-free.
* cosine_neardup_pairs — embedding near-duplicate detection (the 5th dedup
  family): LSH-bucketed self-join + exact cosine >= threshold.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot(a, b) -> Column:
    """Sequential double-precision dot product of two array columns —
    deterministic element order (matches DuckDB's list_dot_product)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2norm(a) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a, b) -> Column:
    return dot(a, b) / (l2norm(a) * l2norm(b))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact cosine top-k: (query_id, vec_id, cos_sim, rank).

    queries must be small (it is broadcast); the corpus is scanned once.
    Ties broken by corpus id for full determinism.
    """
    q = queries.select(
        F.col(query_id_col), F.col(vec_col).alias("_qv")
    )
    c = corpus.select(F.col(id_col), F.col(vec_col).alias("_cv"))
    sims = c.join(F.broadcast(q)).select(
        query_id_col,
        id_col,
        cosine(F.col("_qv"), F.col("_cv")).alias("cos_sim"),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.desc("cos_sim"), F.asc(id_col)
    )
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "cos_sim", "rank")
    )


def _hyperplanes(dim: int, n_planes: int, seed: int) -> list[list[float]]:
    rng = np.random.RandomState(seed)
    return rng.randn(n_planes, dim).tolist()


def rp_signature(vec_col, planes: list[list[float]]) -> Column:
    """Random-hyperplane signature: one bit per plane (sign of projection),
    packed into a long. Pure column expressions over literal planes."""
    v = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    sig = F.lit(0).cast("long")
    for i, p in enumerate(planes):
        plane = F.array(*[F.lit(float(x)) for x in p])
        bit = F.when(dot(v, plane) > 0, F.shiftleft(F.lit(1).cast("long"), i)).otherwise(
            F.lit(0).cast("long")
        )
        sig = sig.bitwiseOR(bit)
    return sig


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    n_planes: int = 12,
    n_tables: int = 4,
    seed: int = 42,
    dim: int | None = None,
) -> DataFrame:
    """Approximate top-k: candidates = same random-hyperplane bucket in any
    of n_tables tables, exact cosine only on candidates.

    Recall/cost dial: more tables or fewer planes -> more candidates.
    """
    if dim is None:
        dim = len(corpus.select(vec_col).first()[0])
    c = corpus.select(F.col(id_col), F.col(vec_col).alias("_cv"))
    q = queries.select(F.col(query_id_col), F.col(vec_col).alias("_qv"))
    c_buckets = []
    q_buckets = []
    for t in range(n_tables):
        planes = _hyperplanes(dim, n_planes, seed + 1000 * t)
        c_buckets.append(
            c.select(
                id_col,
                "_cv",
                F.format_string("t%d:%d", F.lit(t), rp_signature("_cv", planes)).alias(
                    "bucket"
                ),
            )
        )
        q_buckets.append(
            q.select(
                query_id_col,
                "_qv",
                F.format_string("t%d:%d", F.lit(t), rp_signature("_qv", planes)).alias(
                    "bucket"
                ),
            )
        )
    cb = c_buckets[0]
    for x in c_buckets[1:]:
        cb = cb.unionByName(x)
    qb = q_buckets[0]
    for x in q_buckets[1:]:
        qb = qb.unionByName(x)
    cand = (
        cb.join(F.broadcast(qb), "bucket")
        .select(query_id_col, id_col, "_qv", "_cv")
        .dropDuplicates([query_id_col, id_col])
    )
    sims = cand.select(
        query_id_col, id_col, cosine(F.col("_qv"), F.col("_cv")).alias("cos_sim")
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cos_sim"), F.asc(id_col))
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "cos_sim", "rank")
    )


def cosine_neardup_pairs(
    corpus: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 10,
    n_tables: int = 6,
    seed: int = 42,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id_a < id_b, cos_sim >= t):
    LSH self-join bounds the quadratic surface; exact cosine verifies."""
    dim = len(corpus.select(vec_col).first()[0])
    c = corpus.select(F.col(id_col).alias("record_id"), F.col(vec_col).alias("_v"))
    buckets = None
    for t in range(n_tables):
        planes = _hyperplanes(dim, n_planes, seed + 1000 * t)
        b = c.select(
            "record_id",
            F.format_string("t%d:%d", F.lit(t), rp_signature("_v", planes)).alias(
                "block_key"
            ),
        )
        buckets = b if buckets is None else buckets.unionByName(b)
    from .blocking import pairs_from_blocks, salt_blocks

    cand = pairs_from_blocks(salt_blocks(buckets, cap=512))
    a = c.select(F.col("record_id").alias("id_a"), F.col("_v").alias("va"))
    b = c.select(F.col("record_id").alias("id_b"), F.col("_v").alias("vb"))
    return (
        cand.join(a, "id_a")
        .join(b, "id_b")
        .select("id_a", "id_b", cosine(F.col("va"), F.col("vb")).alias("cos_sim"))
        .filter(F.col("cos_sim") >= threshold)
    )
