"""Cross-check the from-scratch minhash-LSH blocker against pyspark.ml's
MinHashLSH (SURVEY.md D1: "(a) pyspark.ml MinHashLSH ... (b) from-scratch
... prefer (b), (a) as cross-check"): both must retrieve the same planted
near-duplicate pairs on a small corpus."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nlp_entity_linking_spark.functions.normalize import char_shingles, normalize
from nlp_entity_linking_spark.operators import blocking as B

DOCS = [
    (0, "international shipping and logistics company of norway"),
    (1, "international shipping and logistics company of norway!"),
    (2, "international shipping & logistics company, norway"),
    (3, "quarterly earnings report for the fiscal year twenty four"),
    (4, "quarterly earnings report for the fiscal year twenty five"),
    (5, "completely different zebra piano umbrella text"),
]


def _true_pairs_ml(spark):
    from pyspark.ml.feature import CountVectorizer, MinHashLSH

    df = spark.createDataFrame(DOCS, "record_id long, surface string")
    df = df.withColumn("norm", normalize("surface")).withColumn(
        "shingles", char_shingles("norm")
    )
    cv = CountVectorizer(inputCol="shingles", outputCol="vec", binary=True)
    model = cv.fit(df)
    v = model.transform(df)
    lsh = MinHashLSH(inputCol="vec", outputCol="hashes", numHashTables=16, seed=42)
    lm = lsh.fit(v)
    joined = lm.approxSimilarityJoin(v, v, 0.45, distCol="jaccard_dist")
    pairs = joined.select(
        F.col("datasetA.record_id").alias("a"),
        F.col("datasetB.record_id").alias("b"),
    ).filter(F.col("a") < F.col("b"))
    return {(r.a, r.b) for r in pairs.collect()}


def _our_pairs(spark):
    df = spark.createDataFrame(DOCS, "record_id long, surface string")
    df = df.withColumn("norm", normalize("surface")).withColumn(
        "shingles", char_shingles("norm")
    )
    blocks = B.lsh_blocks(df, bands=16)
    return {(r.id_a, r.id_b) for r in B.pairs_from_blocks(blocks).collect()}


def test_from_scratch_lsh_agrees_with_sparkml(spark):
    expected = {(0, 1), (0, 2), (1, 2), (3, 4)}
    ours = _our_pairs(spark)
    ml = _true_pairs_ml(spark)
    assert expected <= ours
    assert expected <= ml
    # neither blocker pairs the unrelated doc
    assert all(5 not in p for p in ours | ml)
