"""C2-C4: normalization, tokenization, shingles, word n-grams."""

from __future__ import annotations

from pyspark.sql import functions as F

from nlp_entity_linking_spark.functions.normalize import (
    char_shingles,
    normalize,
    token_set,
    tokenize,
    word_ngrams,
)


def _one(spark, col, value: str):
    df = spark.createDataFrame([(value,)], "s string")
    return df.select(col.alias("out")).collect()[0].out


def test_normalize(spark):
    assert _one(spark, normalize("s"), "  Héllo,  Wörld!! 42 ") == "hello world 42"
    assert _one(spark, normalize("s"), "ACME-CORP (Ltd.)") == "acme corp ltd"
    assert _one(spark, normalize("s"), "")  == ""
    assert _one(spark, normalize("s"), "ñÑ çÇ šŠ") == "nn cc ss"


def test_tokenize_and_token_set(spark):
    assert _one(spark, tokenize(normalize("s")), "B a  b A") == ["b", "a", "b", "a"]
    assert _one(spark, token_set(tokenize(normalize("s"))), "b a b a") == ["a", "b"]


def test_char_shingles(spark):
    assert sorted(_one(spark, char_shingles("s", 3), "abcd")) == ["abc", "bcd"]
    # shorter than n -> the string itself
    assert _one(spark, char_shingles("s", 3), "ab") == ["ab"]
    # distinct
    assert sorted(_one(spark, char_shingles("s", 2), "aaa")) == ["aa"]


def test_word_ngrams(spark):
    df = spark.createDataFrame([(["a", "b", "c"],)], "t array<string>")
    got = df.select(word_ngrams("t", 2).alias("g")).collect()[0].g
    assert got == ["a b", "b c"]
    df1 = spark.createDataFrame([(["a"],)], "t array<string>")
    assert df1.select(word_ngrams("t", 2).alias("g")).collect()[0].g == ["a"]
