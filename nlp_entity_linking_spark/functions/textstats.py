"""Text-analysis functions for training-data pipelines (driver brief:
language-ID, quality scoring, token counting, document fingerprinting).

Everything is built-in column expressions (JVM codegen, SQL-mirrorable for
the DuckDB oracles) except nothing — no UDFs here.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from .normalize import normalize, tokenize

# Tiny high-frequency stopword lists per language (public knowledge).
STOPWORDS: dict[str, list[str]] = {
    "en": "the of and to in a is that for it as was with be by on not he i this are or his from at which but have an".split(),
    "fr": "le la de et les des en un une du que est pour qui dans a par plus pas au sur ne se ce il sont".split(),
    "es": "de la que el en y a los se del las un por con no una su para es al lo como mas pero sus le".split(),
    "de": "der die und in den von zu das mit sich des auf fur ist im dem nicht ein eine als auch es an werden".split(),
}

# BPE-ish word-piece pattern: letter runs, digit runs, single symbols —
# identical semantics in Java regex (Spark) and RE2 (DuckDB).
TOKEN_PATTERN = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]"


def stopword_hits(tokens_col, lang: str) -> Column:
    toks = F.col(tokens_col) if isinstance(tokens_col, str) else tokens_col
    stops = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    return F.size(F.filter(toks, lambda t: F.array_contains(stops, t)))


def lang_id(text_col) -> Column:
    """Heuristic language ID: argmax stopword-hit ratio across languages;
    'und' when nothing matches. Deterministic tie-break by language code."""
    toks = tokenize(normalize(text_col))
    best = F.greatest(
        *[
            F.struct(
                stopword_hits(toks, lang).alias("hits"),
                F.lit(lang).alias("lang"),
            )
            for lang in sorted(STOPWORDS, reverse=True)
        ]
    )
    return F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("und"))


def token_count_ws(text_col) -> Column:
    """Whitespace token count."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.size(F.array_remove(F.split(c, " +"), ""))


def token_count_bpe(text_col) -> Column:
    """BPE-ish word-piece count via TOKEN_PATTERN (regexp_count)."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.regexp_count(c, F.lit(TOKEN_PATTERN))


def quality_features(text_col) -> dict[str, Column]:
    """Quality-scoring features: all exact int counts / int-ratio doubles
    (cross-engine hash-stable)."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    toks = tokenize(normalize(c))
    n_chars = F.length(c)
    n_tokens = F.size(toks)
    n_distinct = F.size(F.array_distinct(toks))
    n_punct = F.regexp_count(c, F.lit(r"[^a-zA-Z0-9\s]"))
    n_digits = F.regexp_count(c, F.lit("[0-9]"))
    n_stop = stopword_hits(toks, "en")
    return {
        "n_chars": n_chars.cast("long"),
        "n_tokens": n_tokens.cast("long"),
        "distinct_ratio": n_distinct / F.greatest(n_tokens, F.lit(1)),
        "punct_ratio": n_punct / F.greatest(n_chars, F.lit(1)),
        "digit_ratio": n_digits / F.greatest(n_chars, F.lit(1)),
        "stopword_ratio": n_stop / F.greatest(n_tokens, F.lit(1)),
    }


def quality_score(text_col) -> Column:
    """Scalar quality score in [0,1]: stopword presence up, symbol soup and
    degenerate repetition down (C4/Gopher-style heuristics, public
    knowledge). Int-ratio arithmetic only -> cross-engine deterministic."""
    f = quality_features(text_col)
    score = (
        F.lit(0.3)
        + 0.4 * F.least(f["stopword_ratio"] * 4, F.lit(1.0))
        + 0.3 * f["distinct_ratio"]
        - 0.5 * F.least(f["punct_ratio"] * 5, F.lit(1.0))
        - 0.3 * F.least(f["digit_ratio"] * 5, F.lit(1.0))
    )
    return F.greatest(F.lit(0.0), F.least(F.lit(1.0), score))


def fingerprint_md5(text_col) -> Column:
    """Canonical document fingerprint: md5 of the normalized text."""
    return F.md5(normalize(text_col))


def md5_long(col) -> Column:
    """First 60 bits of md5 as a non-negative BIGINT. The cross-engine-exact
    hash used by the oracle-checkable twins of the xxhash64 sketches —
    DuckDB mirror: CAST('0x' || substr(md5(x), 1, 15) AS BIGINT)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def rolling_fingerprints_md5(
    text_col, window: int = 8, keep_every: int = 16
) -> Column:
    """Oracle-checkable twin of `rolling_fingerprints`: identical winnowing
    selection math (sliding token windows, keep hash % keep_every == 0) over
    md5-derived 60-bit hashes instead of xxhash64 — md5 has an exact DuckDB
    mirror, so the whole sketch is value-hash-checkable cross-engine.
    Production uses the (faster, JVM-native) xxhash64 form."""
    toks = tokenize(normalize(text_col))
    hashes = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(toks) - (window - 1), F.lit(1))),
        lambda i: md5_long(F.concat_ws(" ", F.slice(toks, i, window))),
    )
    return F.filter(hashes, lambda h: F.pmod(h, F.lit(keep_every)) == 0)


def rolling_fingerprints(text_col, window: int = 8, keep_every: int = 16) -> Column:
    """Winnowing-style rolling fingerprints (Schleimer et al. '03 shape):
    xxhash64 over sliding token windows, kept when hash % keep_every == 0 —
    the sketch used for copy-detection joins. Row-local, built-ins only."""
    toks = tokenize(normalize(text_col))
    hashes = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(toks) - (window - 1), F.lit(1))),
        lambda i: F.xxhash64(F.concat_ws(" ", F.slice(toks, i, window))),
    )
    return F.filter(hashes, lambda h: F.pmod(h, F.lit(keep_every)) == 0)


def repetition_stats(
    docs,
    id_col: str = "doc_id",
    text_col: str = "text",
    ngram: int = 2,
):
    """Gopher/C4-style repetition quality filters per document (Rae et al.
    '21 §A1.1; Raffel et al. '20 — public-knowledge heuristics): the two
    classic signals that catch boilerplate/spam pages whose token counts
    and stopword ratios look normal.

    * dup_line_frac — fraction of (trimmed, non-empty) lines that are
      repeats of an earlier line: (n_lines - n_distinct_lines) / n_lines.
      Row-local array ops (the line list of ONE document is small).
    * top_gram_frac — occurrences of the most frequent word n-gram over
      total n-grams: the SCALE form, explode -> (doc, gram) codegen count
      -> per-doc max/sum with map-side partial aggregation. No per-row
      Python, no collect.

    All ratios are int/int divisions (bit-identical cross-engine — oracle
    q:repetition_docs). Docs with zero grams report NULL gram stats; docs
    with zero non-empty lines report NULL line stats.
    """
    from .normalize import word_ngrams

    c = F.col(text_col)
    lines = F.filter(
        F.transform(F.split(c, "\n"), lambda x: F.trim(x)), lambda x: x != ""
    )
    n_lines = F.size(lines).cast("long")
    n_distinct = F.size(F.array_distinct(lines)).cast("long")
    base = docs.select(
        F.col(id_col),
        n_lines.alias("n_lines"),
        n_distinct.alias("n_distinct_lines"),
        F.when(n_lines > 0, (n_lines - n_distinct) / n_lines).alias(
            "dup_line_frac"
        ),
        word_ngrams(tokenize(normalize(c)), ngram).alias("_grams"),
    )
    ex = base.select(id_col, F.explode("_grams").alias("_g"))
    per = (
        ex.groupBy(id_col, "_g")
        .agg(F.count("*").alias("_n"))
        .groupBy(id_col)
        .agg(
            F.max("_n").alias("top_gram_n"),
            F.sum("_n").alias("total_grams"),
        )
    )
    return (
        base.drop("_grams")
        .join(per, id_col, "left")
        .select(
            id_col,
            "n_lines",
            "n_distinct_lines",
            "dup_line_frac",
            F.col("top_gram_n").cast("long").alias("top_gram_n"),
            F.col("total_grams").cast("long").alias("total_grams"),
            (F.col("top_gram_n") / F.col("total_grams")).alias("top_gram_frac"),
        )
    )
