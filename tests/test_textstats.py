"""Text analysis: language-ID, quality scoring, token counting, fingerprints."""

from __future__ import annotations

from pyspark.sql import functions as F

from nlp_entity_linking_spark.functions import textstats as T


def _one(spark, col, text):
    return (
        spark.createDataFrame([(text,)], "text string")
        .select(col.alias("out"))
        .collect()[0]
        .out
    )


def test_lang_id(spark):
    assert _one(spark, T.lang_id("text"), "the cat is on the mat and it is happy") == "en"
    assert _one(spark, T.lang_id("text"), "le chat est sur le tapis et il est content") == "fr"
    assert _one(spark, T.lang_id("text"), "el gato esta en la alfombra y es feliz") == "es"
    assert _one(spark, T.lang_id("text"), "die katze ist auf der matte und sie ist froh") == "de"
    assert _one(spark, T.lang_id("text"), "zzz qqq xxx") == "und"


def test_token_counts(spark):
    assert _one(spark, T.token_count_ws("text"), "a b  c") == 3
    # [hello][,][world][42][!] — letters|digits|single non-space symbol
    assert _one(spark, T.token_count_bpe("text"), "hello, world42!") == 5


def test_quality_score_orders_sensibly(spark):
    good = "the report shows that the market for the product is strong and it has grown"
    bad = "$$$ ### !!! 12345 67890 @@@ %%% ^^^ &&& *** ((( )))"
    qg = _one(spark, T.quality_score("text"), good)
    qb = _one(spark, T.quality_score("text"), bad)
    assert 0.0 <= qb < qg <= 1.0


def test_fingerprints(spark):
    a = _one(spark, T.fingerprint_md5("text"), "Hello,  WORLD!")
    b = _one(spark, T.fingerprint_md5("text"), "hello world")
    assert a == b  # normalization-canonical
    fp1 = _one(spark, T.rolling_fingerprints("text", 3, 4), " ".join(f"w{i}" for i in range(50)))
    fp2 = _one(spark, T.rolling_fingerprints("text", 3, 4), " ".join(f"w{i}" for i in range(50)))
    assert fp1 == fp2 and len(fp1) > 0
    # shared half the content -> shared fingerprints
    fp3 = _one(spark, T.rolling_fingerprints("text", 3, 4),
               " ".join(f"w{i}" for i in range(25)) + " " + " ".join(f"z{i}" for i in range(25)))
    assert set(fp1) & set(fp3)


def test_repetition_stats_planted(spark):
    from nlp_entity_linking_spark.functions.textstats import repetition_stats

    docs = spark.createDataFrame(
        [
            # 5 non-empty lines (the blank line is dropped, the padded
            # "  limited offer  " trims to a dup), 2 distinct ->
            # dup_line_frac = 3/5; "buy now" bigram dominates
            (1, "buy now\nbuy now\n\n  limited offer  \nbuy now\nlimited offer"),
            (2, "a perfectly normal sentence with varied words here"),
            (3, ""),  # no lines, no grams -> NULLs
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in repetition_stats(docs).collect()}
    r1 = got[1]
    assert r1.n_lines == 5 and r1.n_distinct_lines == 2
    assert abs(r1.dup_line_frac - 3 / 5) < 1e-12
    # grams: 'buy now' appears 3x of 9 total 2-grams in doc 1's token stream
    assert r1.top_gram_n >= 3 and r1.top_gram_frac > 0.3
    r2 = got[2]
    assert r2.dup_line_frac == 0.0 and r2.top_gram_n == 1
    r3 = got[3]
    assert r3.n_lines == 0 and r3.dup_line_frac is None
    assert r3.top_gram_n is None and r3.top_gram_frac is None
