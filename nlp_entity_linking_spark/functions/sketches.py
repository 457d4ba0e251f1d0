"""Mergeable sketch operators (beyond SURVEY.md §2 — the "novel sketch"
slot of the driver brief's training-data-pipeline additions).

Why sketches at 100 TB: exact distinct counts need a full shuffle of every
distinct value; a DataSketches HLL sketch is a FIXED-SIZE (2^lgk registers)
mergeable summary, so per-partition/per-shard sketches combine map-side and
across tables/days without re-reading data — the canonical pattern for
corpus vocabulary tracking, dedup-rate monitoring, and per-language token
accounting over a crawl. All functions here are thin declarative wrappers
over Spark's built-in DataSketches HLL / quantile-digest aggregates (JVM
side, no UDFs); the VALUE they add is the documented merge discipline:

* build once per shard  -> `distinct_sketch_per_group`
* store the binary      -> sketch column survives in parquet/catalog tables
* merge, never rebuild  -> `merge_sketches` (hll_union_agg)

Estimates are approximate (~1.6% relative standard error at the default
lgk=12) and therefore deliberately NOT in the DuckDB oracle set (different
HLL implementations disagree legitimately, and DataSketches' HIP estimator
is even build-order dependent); correctness is pytest-gated against exact
counts (tests/test_sketches.py), including merge-tracks-direct and the
cross-partition-layout error bound.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_LGK = 12  # 4 KiB registers -> ~1.6% relative standard error


def distinct_sketch_per_group(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    lgk: int = DEFAULT_LGK,
) -> DataFrame:
    """One HLL sketch (binary) + its estimate per group. The sketch column
    is the mergeable artifact — persist it; downstream readers union
    sketches instead of recounting raw values. (Estimate derives from the
    aggregated sketch in a post-projection — one sketch build, not two.)"""
    out = df.groupBy(*group_cols).agg(
        F.hll_sketch_agg(value_col, F.lit(lgk)).alias("sketch")
    )
    return out.select(
        *group_cols,
        "sketch",
        F.hll_sketch_estimate("sketch").alias("approx_distinct"),
    )


def merge_sketches(
    sketches: DataFrame,
    group_cols: list[str] | None = None,
    sketch_col: str = "sketch",
) -> DataFrame:
    """Union sketches (optionally regrouped coarser) WITHOUT touching raw
    data — the operation that makes per-day / per-shard summaries roll up
    to corpus totals for free. group_cols=None -> one global row."""
    agg = [
        F.hll_sketch_estimate(F.hll_union_agg(sketch_col)).alias(
            "approx_distinct"
        )
    ]
    if group_cols:
        return sketches.groupBy(*group_cols).agg(*agg)
    return sketches.agg(*agg)


def token_vocabulary_sketch(
    docs: DataFrame,
    tokens_col: str,
    group_col: str = "lang",
    lgk: int = DEFAULT_LGK,
) -> DataFrame:
    """Per-language vocabulary-size tracking for a document corpus: explode
    tokens once, sketch per language. The explode is the only data-sized
    cost; the shuffle moves fixed-size sketches, not token sets."""
    ex = docs.select(group_col, F.explode(tokens_col).alias("_tok"))
    return distinct_sketch_per_group(ex, [group_col], "_tok", lgk)


def _bottom_k(dis: DataFrame, group_cols: list[str], k: int,
              n_shards: int = 64) -> DataFrame:
    """Two-level distributed bottom-k over a `_h` hash column.

    Level 1 ranks within (group, pmod(_h, n_shards)) — every sort task
    handles ~distinct/n_shards rows and keeps <= k; level 2 ranks the
    <= n_shards*k survivors per group. A single per-group window would
    funnel ALL distinct hashes of a group into one task's sort (a
    10^9-distinct group = a one-task straggler even though only k rows
    survive). Bit-identical to the single-window form: the k smallest of
    the union of per-shard k-smallest ARE the global k smallest — the same
    algebraic law kmv_merge's pytest proves. group_cols=[] -> one global
    group (level-2 window partitions on a constant, input already bounded
    at n_shards*k rows)."""
    from pyspark.sql import Window

    dis = dis.withColumn("_shard", F.pmod(F.col("_h"), F.lit(int(n_shards))))
    w1 = Window.partitionBy(*group_cols, "_shard").orderBy("_h")
    local = (
        dis.withColumn("_rn", F.row_number().over(w1))
        .filter(F.col("_rn") <= k)
        .drop("_rn", "_shard")
    )
    w2 = (
        Window.partitionBy(*group_cols) if group_cols
        else Window.partitionBy(F.lit(1))
    ).orderBy("_h")
    return local.withColumn("_rn", F.row_number().over(w2)).filter(
        F.col("_rn") <= k
    ).drop("_rn")


def kmv_sketch_per_group(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    k: int = 64,
) -> DataFrame:
    """DETERMINISTIC mergeable distinct sketch: the k minimum md5-derived
    60-bit hash values of the group's distinct values (KMV / bottom-k,
    Bar-Yossef et al. '02). The oracle-checkable twin of the HLL path:
    same build-once / merge-don't-rebuild dataflow, but every output bit is
    reproducible cross-engine (DuckDB computes the identical hashes), so
    the driver hash-checks the WHOLE rollup (q:kmv_rollup_events) — the one
    thing a DataSketches HLL binary can never offer (HIP estimates are
    build-order dependent).

    Fully distributed build: distinct (group, hash) -> two-level bottom-k
    (`_bottom_k`: per-(group, hash-shard) local rank, then a rank over the
    bounded survivors) -> keep rank <= k. No task ever sorts a whole
    group's distinct set, and the summary is a bounded array<long> of
    <= k elements; no unbounded collect anywhere.

    The build k rides along as a `kmv_k` column: the merge law only holds
    for merge-k <= build-k (a sketch built at k=32 DISCARDED its 33rd..
    smallest hashes — no later merge can resurrect them), so kmv_merge
    checks this contract against `kmv_k` and fails loudly instead of
    silently under-estimating.
    """
    from .textstats import md5_long

    h = md5_long(F.col(value_col))
    dis = df.select(*group_cols, h.alias("_h")).distinct()
    kept = _bottom_k(dis, group_cols, k)
    return kept.groupBy(*group_cols).agg(
        F.sort_array(F.collect_list("_h")).alias("kmv"),
        F.count("*").alias("n_retained"),
    ).withColumn("kmv_k", F.lit(k))


def kmv_merge(
    sketches: DataFrame,
    group_cols: list[str] | None,
    k: int = 64,
    kmv_col: str = "kmv",
) -> DataFrame:
    """Union KMV summaries to coarser groups WITHOUT touching raw data:
    k smallest of the union of bottom-k sets == bottom-k of the full union
    (an exact algebraic law — pytest proves merge == direct build, bitwise)
    — but ONLY for merge-k <= build-k: a sketch built at k'=32 discarded
    its 33rd.. smallest hashes, so a k=64 merge over it would present a
    hole-riddled "bottom-64" and silently under-estimate. Inputs carrying
    the `kmv_k` build column (kmv_sketch_per_group emits it) are checked
    in-plan and the job fails loudly on violation; inputs without the
    column (pre-contract persisted sketches) are trusted to satisfy it.
    Adds the standard KMV estimate (k-1) * 2^60 / kth_min as est_distinct:
    double arithmetic on exactly-representable ints — one IEEE rounding per
    op, bit-identical cross-engine — floored to a BIGINT for hashing."""
    if "kmv_k" in sketches.columns:
        # in-plan guard folded into the exploded hash column so column
        # pruning can't drop it: any sketch built narrower than the merge
        # k poisons the bottom-k law -> fail the job, don't under-count
        guard = F.when(
            F.col("kmv_k") < F.lit(k),
            F.raise_error(F.concat(
                F.lit(f"kmv_merge(k={k}) over a sketch built with k="),
                F.col("kmv_k").cast("string"),
                F.lit(" — merge k must be <= build k"),
            )),
        )
        sketches = sketches.withColumn(
            kmv_col, F.coalesce(guard, F.col(kmv_col))
        )
    ex = sketches.select(
        *(group_cols or []), F.explode(kmv_col).alias("_h")
    ).distinct()
    # two-level bottom-k here too: a rollup over 10^6 shard sketches puts
    # n_sketches x k hashes into one group — the same one-task straggler
    # sort the build path avoids (see _bottom_k)
    kept = _bottom_k(ex, group_cols or [], k)
    agg = kept.groupBy(*(group_cols or [])).agg(
        F.sort_array(F.collect_list("_h")).alias("kmv"),
        F.count("*").alias("n_retained"),
        F.max("_h").alias("_kth"),
    )
    # n_retained < k -> the group's true distinct count IS n_retained
    est = F.when(
        F.col("n_retained") < k, F.col("n_retained").cast("double")
    ).otherwise(
        F.lit(float(k - 1)) * F.lit(float(1 << 60)) / F.col("_kth").cast("double")
    )
    return agg.select(
        *(group_cols or []),
        "kmv",
        "n_retained",
        F.floor(est).cast("long").alias("est_distinct"),
        # re-emit the contract column: a merge output is itself a bottom-k
        # sketch at THIS k, so a second-level rollup at a wider k must trip
        # the same guard instead of silently bypassing it
        F.lit(k).alias("kmv_k"),
    )


def approx_quantiles(
    df: DataFrame,
    value_col: str,
    probabilities: tuple[float, ...] = (0.25, 0.5, 0.75, 0.95),
    accuracy: int = 10_000,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Mergeable approximate quantiles (Spark's built-in percentile digest;
    error <= 1/accuracy of rank). The scale counterpart to the exact-median
    oracle query (q:median_qty): exact percentiles need a global sort,
    digests combine map-side."""
    agg = [
        F.percentile_approx(
            value_col, F.array(*[F.lit(p) for p in probabilities]), accuracy
        ).alias("quantiles")
    ]
    if group_cols:
        return df.groupBy(*group_cols).agg(*agg)
    return df.agg(*agg)
