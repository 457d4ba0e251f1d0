"""Similarity search over embedding columns (driver brief: brute-force
cosine top-k baseline + an LSH-bucketed variant as the scale path).

Representations: embeddings as array<float>; all math is promoted to double
explicitly. Two paths:

* brute_force_topk — exact: broadcast the (small) query set, JVM-side
  sequential dot product via zip_with/aggregate (no Python), ranking window
  for top-k. O(|corpus| x |queries|) — the baseline and the verifier.
* lsh_topk — scale path: random-hyperplane (SimHash-for-vectors, Charikar
  '02) signatures bucket the corpus; only same-bucket candidates get exact
  cosine. Multiple hash tables raise recall. ALL tables' signatures come
  from ONE Arrow-batched pandas UDF pass whose hyperplanes are a seeded
  numpy matrix built worker-side — zero plan literals (a literal-plane plan
  at real embedding dims (768-3072) x 6-8 tables is 10^5-10^6 literal
  doubles: plan explosion, codegen fallback, driver OOM on explain), zero
  driver-side dim probes, and the corpus is scanned once (posexplode over
  tables, not one union branch per table).
* cosine_neardup_pairs — embedding near-duplicate detection (the 5th dedup
  family): LSH-bucketed self-join + exact cosine >= threshold.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
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


def rp_signatures(n_planes: int, n_tables: int, seed: int):
    """Pandas-UDF factory: array<float> embedding -> array<long> of
    `n_tables` random-hyperplane signatures (one bit per plane = sign of the
    projection, packed little-endian).

    The hyperplane matrix is seeded numpy built LAZILY inside the UDF from
    (seed, table, batch width): deterministic across runs and partitionings,
    independent of cluster layout, with zero literals in the logical plan
    and no driver-side `.first()` dim probe. One matmul per Arrow batch
    covers every table ((n, dim) @ (dim, tables*planes))."""
    if not 0 < n_planes <= 63:
        raise ValueError("n_planes must be in 1..63 (packed into a signed long)")

    @F.pandas_udf("array<long>")
    def sigs(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        planes_t = None  # (dim, n_tables * n_planes); built on first batch
        weights = 1 << np.arange(n_planes, dtype=np.int64)
        for vecs in batches:
            if len(vecs) == 0:
                yield pd.Series([], dtype=object)
                continue
            v = np.stack(vecs.to_numpy()).astype(np.float64)
            if planes_t is None:
                dim = v.shape[1]
                planes_t = np.concatenate(
                    [
                        np.random.RandomState(seed + 1000 * t).randn(n_planes, dim)
                        for t in range(n_tables)
                    ]
                ).T
            bits = (v @ planes_t) > 0  # (n, tables*planes)
            packed = (
                bits.reshape(len(v), n_tables, n_planes) * weights
            ).sum(axis=2)  # (n, tables) int64
            yield pd.Series(list(packed))

    return sigs


def rp_buckets(
    df: DataFrame, id_col: str, vec_col: str, n_planes: int, n_tables: int, seed: int
) -> DataFrame:
    """(id, bucket) — one row per (row, table), bucket = 't<table>:<sig>'.
    THIN by design: the embedding never rides the explode or the bucket
    shuffle; callers re-attach vectors to the (much smaller) candidate set."""
    sig_udf = rp_signatures(n_planes, n_tables, seed)
    return df.select(
        F.col(id_col), F.posexplode(sig_udf(F.col(vec_col))).alias("_tbl", "_sig")
    ).select(
        id_col,
        F.format_string("t%d:%d", F.col("_tbl"), F.col("_sig")).alias("bucket"),
    )


def quantized_rp_bucket(vec_col, n_planes: int = 8) -> Column:
    """Oracle-checkable twin of `rp_signatures`: random-hyperplane bucketing
    in EXACT INTEGER arithmetic, cross-engine reproducible bit-for-bit.

    Vectors are quantized to round(x*1000) longs; plane components are
    Rademacher signs from a fixed LCG of (plane, dim) — so the projection is
    a pure int sum whose sign DuckDB computes identically (no float
    accumulation-order hazard at the sign boundary). HOF-interpreted, meant
    for oracle/verification use; the production scale path is the
    numpy-backed `rp_signatures`."""
    v = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    qv = F.transform(v, lambda x: F.round(x.cast("double") * 1000, 0).cast("long"))
    bucket = F.lit(0).cast("long")
    for p in range(n_planes):
        # sign(p, d) = 1 - 2 * bit16(LCG(d + 64p)) — deterministic +-1
        signs = F.transform(
            F.sequence(F.lit(1), F.size(qv)),
            lambda d: (
                F.lit(1).cast("long")
                - F.lit(2).cast("long")
                * F.shiftright(
                    F.pmod(
                        F.lit(1103515245).cast("long")
                        * (d.cast("long") + F.lit(64 * p).cast("long"))
                        + F.lit(12345).cast("long"),
                        F.lit(2147483648).cast("long"),
                    ),
                    16,
                ).bitwiseAND(F.lit(1).cast("long"))
            ),
        )
        proj = F.aggregate(
            F.zip_with(qv, signs, lambda x, s: x * s),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )
        bucket = bucket.bitwiseOR(
            F.when(proj > 0, F.lit(1 << p).cast("long")).otherwise(
                F.lit(0).cast("long")
            )
        )
    return bucket


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

    Shuffle anatomy: corpus scanned once for thin buckets (id + bucket
    string — vectors do NOT ride the explode), broadcast bucket join against
    the (small) query buckets, candidate dedup, then ONE corpus join
    re-attaches vectors to the deduped candidate set for exact verification.
    `dim` is accepted for API compatibility; the hyperplanes self-size from
    the data worker-side, so no driver scan happens either way."""
    cb = rp_buckets(corpus, id_col, vec_col, n_planes, n_tables, seed)
    qb = rp_buckets(queries, query_id_col, vec_col, n_planes, n_tables, seed)
    cand = (
        cb.join(F.broadcast(qb), "bucket")
        .select(query_id_col, id_col)
        .dropDuplicates([query_id_col, id_col])
    )
    c = corpus.select(F.col(id_col), F.col(vec_col).alias("_cv"))
    q = queries.select(F.col(query_id_col), F.col(vec_col).alias("_qv"))
    sims = (
        cand.join(c, id_col)
        .join(F.broadcast(q), query_id_col)
        .select(
            query_id_col, id_col, cosine(F.col("_qv"), F.col("_cv")).alias("cos_sim")
        )
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cos_sim"), F.asc(id_col))
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "cos_sim", "rank")
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    n_cells: int = 16,
    n_probe: int = 4,
    seed: int = 42,
    max_iter: int = 10,
) -> DataFrame:
    """IVF-Flat approximate top-k (the coarse-quantizer inverted-list
    design, Jegou et al. '11 — public knowledge): a seeded pyspark.ml
    KMeans over L2-normalized vectors partitions the corpus into n_cells
    inverted lists; each query probes its n_probe nearest centroids and
    exact cosine runs only over those cells' members.

    Scale shape: centroids are tiny (n_cells x dim) and ride to workers as
    a numpy closure in ONE Arrow UDF pass per side; corpus scanned once for
    assignment; the probe is an equi-join on cell id, so candidates per
    query ~ (n_probe/n_cells) x |corpus|. Recall dial: n_probe. The
    LSH-bucketed path (lsh_topk) is the hash-based alternative; IVF adapts
    to the data distribution where LSH is oblivious."""
    import numpy as np
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    # spherical-ish k-means: normalize so L2 centroids track cosine cells
    def _norm_expr(c):
        n = F.sqrt(dot(c, c))
        return F.transform(c, lambda x: x.cast("double") / n)

    train = corpus.select(
        array_to_vector(_norm_expr(F.col(vec_col))).alias("features")
    )
    model = KMeans(k=n_cells, seed=seed, maxIter=max_iter).fit(train)
    centers = np.stack([np.asarray(c) for c in model.clusterCenters()])
    centers = centers / np.maximum(
        np.linalg.norm(centers, axis=1, keepdims=True), 1e-12
    )

    def cell_udf(top: int):
        @F.pandas_udf("array<int>")
        def cells(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
            for vecs in batches:
                if len(vecs) == 0:
                    yield pd.Series([], dtype=object)
                    continue
                v = np.stack(vecs.to_numpy()).astype(np.float64)
                v = v / np.maximum(np.linalg.norm(v, axis=1, keepdims=True), 1e-12)
                sims = v @ centers.T  # (n, n_cells)
                idx = np.argsort(-sims, axis=1)[:, :top].astype(np.int32)
                yield pd.Series(list(idx))

        return cells

    c_cells = corpus.select(
        F.col(id_col),
        F.element_at(cell_udf(1)(F.col(vec_col)), 1).alias("cell"),
    )
    q_cells = queries.select(
        F.col(query_id_col),
        F.explode(cell_udf(n_probe)(F.col(vec_col))).alias("cell"),
    )
    cand = (
        c_cells.join(F.broadcast(q_cells), "cell")
        .select(query_id_col, id_col)
        .dropDuplicates([query_id_col, id_col])
    )
    c = corpus.select(F.col(id_col), F.col(vec_col).alias("_cv"))
    q = queries.select(F.col(query_id_col), F.col(vec_col).alias("_qv"))
    sims = (
        cand.join(c, id_col)
        .join(F.broadcast(q), query_id_col)
        .select(
            query_id_col, id_col, cosine(F.col("_qv"), F.col("_cv")).alias("cos_sim")
        )
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
    LSH self-join (thin buckets, salted) bounds the quadratic surface; exact
    cosine verifies on the candidates only."""
    from .blocking import pairs_from_blocks, salt_blocks

    buckets = rp_buckets(corpus, id_col, vec_col, n_planes, n_tables, seed).select(
        F.col(id_col).alias("record_id"), F.col("bucket").alias("block_key")
    )
    cand = pairs_from_blocks(salt_blocks(buckets, cap=512))
    c = corpus.select(F.col(id_col).alias("record_id"), F.col(vec_col).alias("_v"))
    a = c.select(F.col("record_id").alias("id_a"), F.col("_v").alias("va"))
    b = c.select(F.col("record_id").alias("id_b"), F.col("_v").alias("vb"))
    return (
        cand.join(a, "id_a")
        .join(b, "id_b")
        .select("id_a", "id_b", cosine(F.col("va"), F.col("vb")).alias("cos_sim"))
        .filter(F.col("cos_sim") >= threshold)
    )
