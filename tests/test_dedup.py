"""Dedup operator family: exact, minhash-LSH, simhash, n-gram Jaccard."""

from __future__ import annotations

from pyspark.sql import functions as F

from nlp_entity_linking_spark.functions.normalize import tokenize, normalize
from nlp_entity_linking_spark.operators import dedup as D

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog and runs far away"),
    (1, "The quick brown fox jumps over the lazy dog and runs far away!"),  # exact dup of 0 (normalized)
    (2, "the quick brown fox jumps over the lazy cat and runs far away"),  # near-dup of 0
    (3, "completely unrelated text about database engines and query plans"),
    (4, "completely unrelated text about database engines and query planning"),  # near-dup of 3
    (5, "nothing in common with anything else here whatsoever zebra piano"),
]


def _docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_exact_dedup(spark):
    got = {r.doc_id: r.dup_group for r in D.exact_dedup(_docs(spark)).collect()}
    assert got[0] == got[1] == 0
    assert len({got[2], got[3], got[4], got[5]}) == 4  # all singletons
    canon = {r.doc_id: r.is_canonical for r in D.exact_dedup(_docs(spark)).collect()}
    assert canon[0] and not canon[1]


def test_minhash_dedup_groups_near_dups(spark):
    got = {
        r.doc_id: r.dup_group
        for r in D.minhash_dedup(
            _docs(spark), ngram=2, bands=16, k=64, jaccard_threshold=0.5
        ).collect()
    }
    assert got[0] == got[1] == got[2]
    assert got[3] == got[4]
    assert got[5] not in (got[0], got[3])
    assert len(got) == 6


def test_simhash64_properties(spark):
    df = _docs(spark).select(
        "doc_id", D.simhash64(tokenize(normalize("text"))).alias("sig")
    )
    sigs = {r.doc_id: r.sig for r in df.collect()}
    assert sigs[0] == sigs[1]  # same normalized tokens -> same signature
    ham = lambda a, b: bin((a ^ b) & (2**64 - 1)).count("1")  # noqa: E731
    assert ham(sigs[0], sigs[2]) < ham(sigs[0], sigs[3])


def test_simhash_df_equals_column_form(spark):
    """The codegen scale form (explode + 64 sum aggs) must be
    signature-identical to the row-local HOF form — including empty docs
    (sig 0) and duplicate-token voting."""
    docs = DOCS + [(6, ""), (7, "...!!!"), (8, "dup dup dup word")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    base = df.select(
        F.col("doc_id").alias("record_id"),
        tokenize(normalize("text")).alias("toks"),
    )
    fast = {
        r.record_id: r.sig
        for r in D.simhash_signatures_df(base, tokens_col="toks").collect()
    }
    slow = {
        r.record_id: r.sig
        for r in base.select("record_id", D.simhash64("toks").alias("sig")).collect()
    }
    assert fast == slow
    assert fast[6] == 0 and fast[7] == 0


def test_simhash_dedup(spark):
    got = {
        r.doc_id: r.dup_group
        for r in D.simhash_dedup(_docs(spark), max_hamming=8).collect()
    }
    assert got[0] == got[1] == got[2]
    assert got[5] != got[0]
    assert len(got) == 6


def test_ngram_jaccard_pairs(spark):
    pairs = spark.createDataFrame([(0, 1), (0, 2), (0, 3)], "id_a long, id_b long")
    got = {
        (r.id_a, r.id_b): r.jaccard
        for r in D.ngram_jaccard_pairs(_docs(spark), pairs, n=2).collect()
    }
    assert got[(0, 1)] == 1.0
    assert 0.3 < got[(0, 2)] < 1.0
    assert got[(0, 3)] < 0.05


def test_ngram_containment_asymmetry(spark):
    """Containment detects an excerpt inside a larger doc (cont_a ~ 1)
    where symmetric Jaccard is diluted by the size difference."""
    from nlp_entity_linking_spark.operators.dedup import (
        ngram_containment_pairs,
        ngram_jaccard_pairs,
    )

    big = " ".join(f"word{i}" for i in range(100))
    excerpt = " ".join(f"word{i}" for i in range(10, 20))
    docs = spark.createDataFrame(
        [(1, excerpt), (2, big), (3, "")], "doc_id long, text string"
    )
    pairs = spark.createDataFrame([(1, 2), (3, 2)], "id_a long, id_b long")
    got = {
        (r.id_a, r.id_b): (r.cont_a, r.cont_b)
        for r in ngram_containment_pairs(docs, pairs, n=1).collect()
    }
    ca, cb = got[(1, 2)]
    assert ca == 1.0  # excerpt fully contained in source
    assert cb == 0.1  # source only 10% covered by the excerpt
    jac = {
        (r.id_a, r.id_b): r.jaccard
        for r in ngram_jaccard_pairs(docs, pairs, n=1).collect()
    }
    assert jac[(1, 2)] == 0.1  # symmetric jaccard dilutes the signal
    assert got[(3, 2)][0] is None and got[(3, 2)][1] == 0.0  # empty side NULL
