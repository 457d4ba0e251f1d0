"""Mergeable sketch operators: HLL distinct estimates vs exact counts,
the merge-equals-direct property, partition-layout invariance, and
approximate quantiles vs exact."""

from __future__ import annotations

from pyspark.sql import functions as F

from nlp_entity_linking_spark.functions import sketches as SK


def _vals(spark, n=50_000, groups=4):
    # v collides across rows (distinct ~ n/3 per construction) so the
    # estimate has something nontrivial to approximate
    return spark.range(n).select(
        (F.col("id") % groups).alias("g"),
        (F.xxhash64("id") % (n // 3)).alias("v"),
    )


def test_hll_estimate_close_to_exact(spark):
    df = _vals(spark).persist()
    got = {
        r.g: r.approx_distinct
        for r in SK.distinct_sketch_per_group(df, ["g"], "v").collect()
    }
    want = {
        r.g: r.n
        for r in df.groupBy("g").agg(F.countDistinct("v").alias("n")).collect()
    }
    assert set(got) == set(want)
    for g in want:
        rel = abs(got[g] - want[g]) / want[g]
        assert rel < 0.05, (g, got[g], want[g], rel)


def test_hll_merge_tracks_direct_sketch(spark):
    """The 100 TB property: union of per-shard sketches estimates the same
    count as sketching the whole column directly. NOT asserted equal:
    DataSketches HLL uses the HIP estimator, which is merge-path dependent
    by design — the registers agree, the estimator's correction term
    differs slightly between streamed and merged builds."""
    df = _vals(spark).persist()
    per_group = SK.distinct_sketch_per_group(df, ["g"], "v")
    merged = SK.merge_sketches(per_group).collect()[0].approx_distinct
    direct = (
        df.agg(
            F.hll_sketch_estimate(
                F.hll_sketch_agg("v", F.lit(SK.DEFAULT_LGK))
            ).alias("e")
        ).collect()[0].e
    )
    exact = df.select("v").distinct().count()
    assert abs(merged - direct) / exact < 0.02
    assert abs(merged - exact) / exact < 0.05


def test_hll_estimate_partition_tolerant(spark):
    """Estimates across different partition layouts stay within the
    configured error bound of each other (exact invariance does not hold:
    the HIP estimator is build-order dependent; what scale deployments rely
    on is the BOUND, asserted here at 2%)."""
    df = _vals(spark, n=20_000)
    a = SK.distinct_sketch_per_group(df.coalesce(1), ["g"], "v")
    b = SK.distinct_sketch_per_group(df.repartition(13), ["g"], "v")
    ga = {r.g: r.approx_distinct for r in a.collect()}
    gb = {r.g: r.approx_distinct for r in b.collect()}
    assert set(ga) == set(gb)
    for g in ga:
        assert abs(ga[g] - gb[g]) / max(ga[g], 1) < 0.02, (g, ga[g], gb[g])


def test_token_vocabulary_sketch(spark):
    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet").select(
        "lang", F.split(F.lower("text"), " ").alias("toks")
    ).persist()
    got = {
        r.lang: r.approx_distinct
        for r in SK.token_vocabulary_sketch(docs, "toks").collect()
    }
    want = {
        r.lang: r.n
        for r in docs.select("lang", F.explode("toks").alias("t"))
        .groupBy("lang")
        .agg(F.countDistinct("t").alias("n"))
        .collect()
    }
    assert set(got) == set(want)
    for lang in want:
        assert abs(got[lang] - want[lang]) / max(want[lang], 1) < 0.05


def test_approx_quantiles_vs_exact(spark):
    li = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet").select(
        F.col("l_extendedprice").alias("p")
    ).persist()
    qs = SK.approx_quantiles(li, "p", (0.5,), accuracy=10_000).collect()[0].quantiles
    exact = li.agg(F.expr("percentile(p, 0.5)").alias("m")).collect()[0].m
    lo, hi = (
        li.agg(F.min("p")).collect()[0][0],
        li.agg(F.max("p")).collect()[0][0],
    )
    assert abs(qs[0] - exact) / (hi - lo) < 0.01


def test_kmv_merge_equals_direct_build(spark):
    """The KMV mergeable law, EXACTLY: bottom-k of a union == bottom-k of
    the union of per-part bottom-k summaries. Unlike the HLL binary this
    twin is deterministic, so the assertion is bitwise equality."""
    rows = [(f"g{i % 3}", f"d{i % 7}", f"v{i % 151}") for i in range(2000)]
    df = spark.createDataFrame(rows, "g string, part string, v string")
    fine = SK.kmv_sketch_per_group(df, ["g", "part"], "v", k=32)
    merged = SK.kmv_merge(fine, ["g"], k=32)
    direct = SK.kmv_sketch_per_group(df.select("g", "v"), ["g"], "v", k=32)
    m = {r.g: (tuple(r.kmv), r.n_retained) for r in merged.collect()}
    d = {r.g: (tuple(r.kmv), r.n_retained) for r in direct.collect()}
    assert m == d and len(m) == 3


def test_kmv_estimate_accuracy_and_exact_small_groups(spark):
    """est_distinct is exact (== n_retained) below k, and within 25% of
    truth above k at k=64 (KMV RSE ~ 1/sqrt(k-2) ~ 12.7%)."""
    rows = [("big", f"v{i}") for i in range(3000)] + [
        ("small", f"v{i}") for i in range(20)
    ]
    df = spark.createDataFrame(rows, "g string, v string")
    fine = SK.kmv_sketch_per_group(df, ["g"], "v", k=64)
    got = {r.g: r for r in SK.kmv_merge(fine, ["g"], k=64).collect()}
    assert got["small"].est_distinct == 20 and got["small"].n_retained == 20
    assert got["big"].n_retained == 64
    assert abs(got["big"].est_distinct - 3000) / 3000 < 0.25


def test_kmv_merge_k_contract(spark):
    """Merging at a k wider than the build k would present a hole-riddled
    bottom-k set and silently under-estimate — the in-plan guard must fail
    the job instead. A merge at the build k (or narrower) stays legal."""
    import pytest

    rows = [("g", f"v{i}") for i in range(500)]
    df = spark.createDataFrame(rows, "g string, v string")
    fine = SK.kmv_sketch_per_group(df, ["g"], "v", k=16)
    with pytest.raises(Exception, match="merge k must be <= build k"):
        SK.kmv_merge(fine, ["g"], k=32).collect()
    assert SK.kmv_merge(fine, ["g"], k=8).collect()[0].n_retained == 8


def test_kmv_partition_layout_invariant(spark):
    """Summaries are a pure function of the value SET — any partitioning
    of the input produces identical sketches."""
    rows = [("g", f"v{i % 400}") for i in range(5000)]
    df = spark.createDataFrame(rows, "g string, v string")
    a = SK.kmv_sketch_per_group(df.repartition(1), ["g"], "v", k=48).collect()
    b = SK.kmv_sketch_per_group(df.repartition(17, "v"), ["g"], "v", k=48).collect()
    assert [tuple(r.kmv) for r in a] == [tuple(r.kmv) for r in b]
