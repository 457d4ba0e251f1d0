"""ANN similarity search: brute-force exact top-k, LSH recall, near-dup."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from nlp_entity_linking_spark.operators import ann


def _corpus(spark, n=300, dim=16, seed=0):
    rng = np.random.RandomState(seed)
    vecs = rng.randn(n, dim).astype(np.float32)
    rows = [(i, vecs[i].tolist()) for i in range(n)]
    return (
        spark.createDataFrame(rows, "vec_id long, embedding array<float>"),
        vecs,
    )


def test_brute_force_topk_matches_numpy(spark):
    corpus, vecs = _corpus(spark)
    qn = 5
    queries = spark.createDataFrame(
        [(i, vecs[i].tolist()) for i in range(qn)],
        "query_id long, embedding array<float>",
    )
    got = ann.brute_force_topk(corpus, queries, k=4).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r.query_id, []).append((r.rank, r.vec_id, r.cos_sim))
    x = vecs.astype(np.float64)
    xn = x / np.linalg.norm(x, axis=1, keepdims=True)
    sims = xn @ xn.T
    for q in range(qn):
        order = sorted(range(len(vecs)), key=lambda i: (-sims[q, i], i))[:4]
        ours = [v for _, v, _ in sorted(by_q[q])]
        assert ours == order, (q, ours, order)
        assert ours[0] == q  # self is its own nearest neighbor


def test_lsh_topk_recall(spark):
    # clustered corpus (the regime LSH targets): 40 centers x 10 members,
    # members are small perturbations — a query's true top-k are its
    # cluster-mates at cosine ~0.98.
    rng = np.random.RandomState(3)
    centers = rng.randn(40, 16)
    rows = []
    for i in range(400):
        v = centers[i % 40] + 0.05 * rng.randn(16)
        rows.append((i, v.astype(np.float32).tolist()))
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    queries = spark.createDataFrame(
        [(i, rows[i][1]) for i in range(8)], "query_id long, embedding array<float>"
    )
    exact = ann.brute_force_topk(corpus, queries, k=5).collect()
    approx = ann.lsh_topk(corpus, queries, k=5, n_planes=12, n_tables=6).collect()
    exact_set = {(r.query_id, r.vec_id) for r in exact}
    approx_set = {(r.query_id, r.vec_id) for r in approx}
    recall = len(exact_set & approx_set) / len(exact_set)
    assert recall >= 0.8, recall
    assert {(i, i) for i in range(8)} <= approx_set  # self always found


def test_lsh_topk_dim768_recall_and_bounded_plan(spark):
    """Real-embedding-dim regression: at dim=768 the hyperplanes must NOT be
    plan literals (literal planes at 768 x 12 x 6 would be ~55k doubles in
    the plan -> codegen fallback / driver OOM at explain). Recall holds and
    the explain string stays small."""
    import contextlib
    import io

    rng = np.random.RandomState(7)
    centers = rng.randn(30, 768)
    rows = []
    for i in range(240):
        v = centers[i % 30] + 0.05 * rng.randn(768)
        rows.append((i, v.astype(np.float32).tolist()))
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    queries = spark.createDataFrame(
        [(i, rows[i][1]) for i in range(6)], "query_id long, embedding array<float>"
    )
    approx = ann.lsh_topk(corpus, queries, k=5, n_planes=12, n_tables=6)
    with contextlib.redirect_stdout(io.StringIO()) as buf:
        approx.explain("extended")
    plan = buf.getvalue()
    assert len(plan) < 100_000, f"plan blew up to {len(plan)} chars"
    exact = ann.brute_force_topk(corpus, queries, k=5).collect()
    got = approx.collect()
    exact_set = {(r.query_id, r.vec_id) for r in exact}
    approx_set = {(r.query_id, r.vec_id) for r in got}
    assert len(exact_set & approx_set) / len(exact_set) >= 0.8


def test_multiprobe_lsh_recall(spark):
    """Multi-probe LSH: probing each table's nearest bit-flip buckets
    recovers recall that plain LSH at the same (few) tables misses, without
    growing the corpus bucket table — the cheap-recall dial for the scale
    path. Base probe of the probe UDF must be bit-identical to
    rp_signatures (corpus/query bucket compatibility)."""
    rng = np.random.RandomState(13)
    centers = rng.randn(40, 32)
    rows = []
    for i in range(400):
        v = centers[i % 40] + 0.12 * rng.randn(32)
        rows.append((i, v.astype(np.float32).tolist()))
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    queries = spark.createDataFrame(
        [(i, rows[i][1]) for i in range(12)], "query_id long, embedding array<float>"
    )
    exact = {
        (r.query_id, r.vec_id)
        for r in ann.brute_force_topk(corpus, queries, k=5).collect()
    }

    def recall(n_probe):
        got = {
            (r.query_id, r.vec_id)
            for r in ann.lsh_topk(
                corpus, queries, k=5, n_planes=14, n_tables=2,
                seed=3, n_probe=n_probe,
            ).collect()
        }
        return len(exact & got) / len(exact)

    r1, r4 = recall(1), recall(4)
    assert r4 > r1, (r1, r4)  # probes must buy recall on this fixture
    assert r4 >= 0.8, (r1, r4)
    # base-probe bit-compatibility: probe udf slot 0 == rp_signatures output
    base = {
        r.vec_id: r.s
        for r in corpus.select(
            "vec_id",
            ann.rp_signatures(14, 2, 3)("embedding").alias("s"),
        ).collect()
    }
    probed = {
        r.vec_id: r.s
        for r in corpus.select(
            "vec_id",
            ann.rp_probe_signatures(14, 2, 3, 3)("embedding").alias("s"),
        ).collect()
    }
    for vid, sigs in base.items():
        assert probed[vid][0] == sigs[0] and probed[vid][3] == sigs[1]


def test_probe_signature_validation(spark):
    """n_probe bounds checked up front — a too-large n_probe would die
    with an opaque IndexError inside the executor UDF otherwise."""
    import pytest

    with pytest.raises(ValueError, match="n_probe"):
        ann.rp_probe_signatures(14, 2, 3, n_probe=0)
    with pytest.raises(ValueError, match="n_planes \\+ 1"):
        ann.rp_probe_signatures(14, 2, 3, n_probe=16)
    ann.rp_probe_signatures(14, 2, 3, n_probe=15)  # boundary ok


def test_rp_signatures_deterministic_across_partitionings(spark):
    """Worker-side seeded planes: same vectors -> same signatures regardless
    of partition count / batch boundaries."""
    rng = np.random.RandomState(11)
    rows = [(i, rng.randn(32).astype(np.float32).tolist()) for i in range(100)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    udf = ann.rp_signatures(n_planes=16, n_tables=3, seed=5)
    one = {
        r.vec_id: r.s
        for r in df.coalesce(1).select("vec_id", udf("embedding").alias("s")).collect()
    }
    many = {
        r.vec_id: r.s
        for r in df.repartition(13)
        .select("vec_id", udf("embedding").alias("s"))
        .collect()
    }
    assert one == many and len(one) == 100


def test_ivf_topk_recall_and_bounded_candidates(spark):
    """IVF-Flat: recall vs brute force on a clustered corpus, with the
    probe bounding candidates to ~n_probe/n_cells of the corpus."""
    rng = np.random.RandomState(5)
    centers = rng.randn(40, 16)
    rows = []
    for i in range(400):
        v = centers[i % 40] + 0.05 * rng.randn(16)
        rows.append((i, v.astype(np.float32).tolist()))
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    queries = spark.createDataFrame(
        [(i, rows[i][1]) for i in range(8)], "query_id long, embedding array<float>"
    )
    exact = ann.brute_force_topk(corpus, queries, k=5).collect()
    approx = ann.ivf_topk(
        corpus, queries, k=5, n_cells=16, n_probe=6, seed=7
    ).collect()
    exact_set = {(r.query_id, r.vec_id) for r in exact}
    approx_set = {(r.query_id, r.vec_id) for r in approx}
    recall = len(exact_set & approx_set) / len(exact_set)
    assert recall >= 0.9, recall
    assert {(i, i) for i in range(8)} <= approx_set  # self found


def test_ivf_training_sample_is_bounded(spark):
    """The coarse-quantizer fit must NOT scale with corpus size: for a
    corpus 10x over the cap, the training input stays ~cap (xxhash residue
    sampling has a few percent variance, never O(n) blowup) and is
    deterministic across partitionings."""
    corpus, _ = _corpus(spark, n=5000, dim=8)
    cap = 500
    sample = ann.ivf_training_sample(corpus, "embedding", "vec_id", 16, cap)
    n = sample.count()
    assert n <= 1.25 * cap, n
    assert n >= 0.75 * cap, n
    n2 = ann.ivf_training_sample(
        corpus.repartition(13), "embedding", "vec_id", 16, cap
    ).count()
    assert n == n2
    # under the cap -> no-op (every row trains)
    small, _ = _corpus(spark, n=100, dim=8)
    assert ann.ivf_training_sample(small, "embedding", "vec_id", 16, cap).count() == 100


def test_ivf_topk_recall_unchanged_with_bounded_training(spark):
    """Recall on the clustered fixture holds when the quantizer trains on a
    bounded sample strictly smaller than the corpus."""
    rng = np.random.RandomState(5)
    centers = rng.randn(40, 16)
    rows = []
    for i in range(400):
        v = centers[i % 40] + 0.05 * rng.randn(16)
        rows.append((i, v.astype(np.float32).tolist()))
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    queries = spark.createDataFrame(
        [(i, rows[i][1]) for i in range(8)], "query_id long, embedding array<float>"
    )
    exact = ann.brute_force_topk(corpus, queries, k=5).collect()
    approx = ann.ivf_topk(
        corpus, queries, k=5, n_cells=16, n_probe=6, seed=7, train_cap=200
    ).collect()
    exact_set = {(r.query_id, r.vec_id) for r in exact}
    approx_set = {(r.query_id, r.vec_id) for r in approx}
    assert len(exact_set & approx_set) / len(exact_set) >= 0.9


def test_ivf_train_reuse_is_identical(spark):
    """ivf_topk(centers=ivf_train(...)) must be bit-identical to the
    one-shot path: the split exists so a production index trains the
    quantizer once and serves many query batches, and that refactor must
    not change a single result row."""
    rng = np.random.RandomState(5)
    centers = rng.randn(40, 16)
    rows = []
    for i in range(400):
        v = centers[i % 40] + 0.05 * rng.randn(16)
        rows.append((i, v.astype(np.float32).tolist()))
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    queries = spark.createDataFrame(
        [(i, rows[i][1]) for i in range(8)], "query_id long, embedding array<float>"
    )
    one_shot = ann.ivf_topk(
        corpus, queries, k=5, n_cells=16, n_probe=6, seed=7
    ).collect()
    trained = ann.ivf_train(corpus, n_cells=16, seed=7)
    assert trained.shape == (16, 16)
    reused = ann.ivf_topk(
        corpus, queries, k=5, n_cells=16, n_probe=6, seed=7, centers=trained
    ).collect()
    assert sorted(map(tuple, one_shot)) == sorted(map(tuple, reused))


def test_ivf_staged_cells_identical_and_require_centers(spark):
    """ivf_topk(corpus_cells=ivf_assign_cells(...)) — the INDEX-BUILD /
    query split — must be bit-identical to the one-shot path (production
    stores the cell beside the vector at ingest and probes many query
    batches against it), and corpus_cells without centers must fail
    loudly: cells are only meaningful under the quantizer that assigned
    them."""
    import pytest

    rng = np.random.RandomState(11)
    centers = rng.randn(40, 16)
    rows = []
    for i in range(400):
        v = centers[i % 40] + 0.05 * rng.randn(16)
        rows.append((i, v.astype(np.float32).tolist()))
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    queries = spark.createDataFrame(
        [(i, rows[i][1]) for i in range(8)], "query_id long, embedding array<float>"
    )
    trained = ann.ivf_train(corpus, n_cells=16, seed=7)
    one_shot = ann.ivf_topk(
        corpus, queries, k=5, n_cells=16, n_probe=6, seed=7, centers=trained
    ).collect()
    cells = ann.ivf_assign_cells(corpus, trained)
    assert cells.columns == ["vec_id", "cell"]
    staged = ann.ivf_topk(
        corpus,
        queries,
        k=5,
        n_cells=16,
        n_probe=6,
        seed=7,
        centers=trained,
        corpus_cells=cells,
    ).collect()
    assert sorted(map(tuple, one_shot)) == sorted(map(tuple, staged))
    with pytest.raises(ValueError, match="corpus_cells requires"):
        ann.ivf_topk(corpus, queries, corpus_cells=cells)


def test_lsh_staged_buckets_identical(spark):
    """lsh_topk(corpus_buckets=rp_buckets(...)) — same index/query split
    for the hash-based path — bit-identical to the one-shot path, for
    both single- and multi-probe queries."""
    corpus, vecs = _corpus(spark, n=400, dim=16, seed=9)
    queries = spark.createDataFrame(
        [(i, vecs[i].tolist()) for i in range(6)],
        "query_id long, embedding array<float>",
    )
    staged_cb = ann.rp_buckets(corpus, "vec_id", "embedding", 8, 3, 42)
    for n_probe in (1, 3):
        one_shot = ann.lsh_topk(
            corpus, queries, k=5, n_planes=8, n_tables=3, seed=42, n_probe=n_probe
        ).collect()
        staged = ann.lsh_topk(
            corpus,
            queries,
            k=5,
            n_planes=8,
            n_tables=3,
            seed=42,
            n_probe=n_probe,
            corpus_buckets=staged_cb,
        ).collect()
        assert sorted(map(tuple, one_shot)) == sorted(map(tuple, staged))


def test_lsh_staged_buckets_param_mismatch_rejected(spark, tmp_path):
    """A staged bucket table built with different n_planes/n_tables/seed
    must be REJECTED loudly — mismatched params mean query buckets never
    match corpus buckets and recall silently collapses to ~0. The param
    tag rides column metadata, which Spark persists through parquet, so
    the guard also holds for an index staged at ingest and read back."""
    import pytest

    corpus, vecs = _corpus(spark, n=50, dim=8, seed=9)
    queries = spark.createDataFrame(
        [(0, vecs[0].tolist())], "query_id long, embedding array<float>"
    )
    cb = ann.rp_buckets(corpus, "vec_id", "embedding", 8, 3, 42)
    # metadata survives the parquet round-trip (the at-ingest staging path)
    path = str(tmp_path / "cb")
    cb.write.parquet(path)
    cb_disk = spark.read.parquet(path)
    assert cb_disk.schema["bucket"].metadata["rp_params"] == "p8t3s42"
    for bad_kwargs in (
        dict(n_planes=9, n_tables=3, seed=42),
        dict(n_planes=8, n_tables=4, seed=42),
        dict(n_planes=8, n_tables=3, seed=43),
    ):
        with pytest.raises(ValueError, match="rp_params"):
            ann.lsh_topk(
                corpus, queries, k=3, corpus_buckets=cb_disk, **bad_kwargs
            )
    # wrong shape rejected outright
    with pytest.raises(ValueError, match="must have columns"):
        ann.lsh_topk(corpus, queries, k=3, corpus_buckets=corpus,
                     n_planes=8, n_tables=3, seed=42)
    # an untagged frame (foreign builder) warns but still runs
    import warnings as _w

    # alias with explicit empty metadata strips the tag (a bare alias
    # would propagate the child attribute's metadata)
    untagged = cb_disk.select(
        "vec_id", F.col("bucket").alias("bucket", metadata={})
    )
    with _w.catch_warnings(record=True) as rec:
        _w.simplefilter("always")
        got = ann.lsh_topk(
            corpus, queries, k=3, corpus_buckets=untagged,
            n_planes=8, n_tables=3, seed=42,
        ).collect()
    assert any("rp_params" in str(x.message) for x in rec)
    assert len(got) > 0


def test_ivf_train_deterministic_across_partitionings(spark):
    """The driver-side Lloyd's fit must be a pure function of (corpus
    contents, seed): the collected sample is sorted by id before the fit,
    so partition layout cannot change a single centroid bit."""
    corpus, _ = _corpus(spark, n=400, dim=16, seed=5)
    a = ann.ivf_train(corpus, n_cells=8, seed=3)
    b = ann.ivf_train(corpus.repartition(13), n_cells=8, seed=3)
    assert a.shape == (8, 16)
    assert (a == b).all()
    # unit-norm contract
    assert np.allclose(np.linalg.norm(a, axis=1), 1.0)


def test_ivf_train_matches_ml_cross_check(spark):
    """Cross-check the numpy Lloyd's quantizer against the distributed
    pyspark.ml.KMeans path on a cleanly separable fixture: both must
    recover the same 8 cluster directions (numpy centers and ML centers
    match 1:1 under cosine, and both induce the same corpus cells)."""
    rng = np.random.RandomState(17)
    axes = rng.randn(8, 16)
    axes /= np.linalg.norm(axes, axis=1, keepdims=True)
    rows = []
    for i in range(320):
        v = axes[i % 8] + 0.02 * rng.randn(16)
        rows.append((i, v.astype(np.float32).tolist()))
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    c_np = ann.ivf_train(corpus, n_cells=8, seed=7)
    c_ml = ann.ivf_train_ml(corpus, n_cells=8, seed=7)
    sims = c_np @ c_ml.T  # (8, 8) cosine, both unit-norm
    match = sims.argmax(axis=1)
    assert sorted(match.tolist()) == list(range(8))  # a permutation
    assert (sims.max(axis=1) >= 0.999).all(), sims.max(axis=1)


def test_quantized_ivf_cells_deterministic_and_partitioning(spark):
    """The integer IVF twin: one cell per vector at n_probe=1, the probe set
    at n_probe=3 is a superset containing the assignment, every cell id in
    range, all independent of partition layout."""
    corpus, _ = _corpus(spark, n=200, dim=12, seed=9)
    one = {
        (r.vec_id, r.cell)
        for r in ann.quantized_ivf_cells(corpus, n_cells=8, n_probe=1).collect()
    }
    assert len(one) == 200  # exactly one cell per vector
    assert all(0 <= c < 8 for _, c in one)
    probes = ann.quantized_ivf_cells(corpus, n_cells=8, n_probe=3).collect()
    assert len(probes) == 600
    top1 = {(r.vec_id, r.cell) for r in probes if r.rk == 1}
    assert top1 == one
    again = {
        (r.vec_id, r.cell)
        for r in ann.quantized_ivf_cells(
            corpus.repartition(7), n_cells=8, n_probe=1
        ).collect()
    }
    assert again == one


def test_ivf_topk_tolerates_zero_vector(spark):
    """An all-zero embedding must not poison the KMeans fit with NaNs (the
    plan-side normalization guards the norm like the UDF side does)."""
    corpus, _ = _corpus(spark, n=60, dim=8)
    zero = spark.createDataFrame(
        [(999, [0.0] * 8)], "vec_id long, embedding array<float>"
    )
    corpus = corpus.unionByName(zero)
    queries = corpus.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got = ann.ivf_topk(corpus, queries, k=3, n_cells=4, n_probe=2, seed=1).collect()
    assert len(got) > 0
    assert all(r.cos_sim == r.cos_sim for r in got)  # no NaN in results


def test_cosine_neardup_pairs(spark):
    rng = np.random.RandomState(1)
    base = rng.randn(40, 16).astype(np.float32)
    rows = [(i, base[i].tolist()) for i in range(40)]
    # plant near-dups: 100..103 are tiny perturbations of 0..3
    for i in range(4):
        rows.append((100 + i, (base[i] + 0.01 * rng.randn(16).astype(np.float32)).tolist()))
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {
        (r.id_a, r.id_b)
        for r in ann.cosine_neardup_pairs(corpus, threshold=0.98).collect()
    }
    assert {(i, 100 + i) for i in range(4)} <= got
    assert all(b - a == 100 for a, b in got)  # no false pairs among random vecs
