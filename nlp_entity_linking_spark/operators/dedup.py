"""Deduplication operator family for large-scale training-data pipelines
(driver brief: exact, MinHash+LSH, SimHash, n-gram Jaccard, embedding-cosine
near-dup — each a first-class operator over a text/document table).

All families share the shape: candidates -> verify -> connected components
-> (doc_id, dup_group_id) with dup_group_id = min doc_id in the duplicate
class. Everything JVM-side except nothing — no UDFs at all in this module:
simhash included, built from higher-order functions + xxhash64 bit ops.

Scale notes:
* exact: one shuffle (hash groupBy on a 128-bit digest of the normalized
  text) — the digest, not the text, rides the exchange.
* minhash-LSH: row-local signatures (operators/blocking.py), banded keys,
  bounded within-block expansion, exact Jaccard verification on survivors.
* simhash: row-local 64-bit signature; candidates blocked on 4x16-bit
  chunks (two near-dups within Hamming distance 3 must share >=1 chunk by
  pigeonhole); verified with bit_count(xor) <= k.
* ngram-jaccard: verification metric on blocked candidates (word shingles).
* embedding cosine: see operators/ann.py (cosine_neardup_pairs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.normalize import normalize, tokenize, word_ngrams
from . import blocking as B
from .cc import attach_singletons, connected_components


def _groups_from_pairs(pairs: DataFrame, docs: DataFrame, id_col: str) -> DataFrame:
    """(id_a, id_b) duplicate pairs -> (id, dup_group) covering every doc."""
    labels = connected_components(
        pairs.select(F.col("id_a").alias("u"), F.col("id_b").alias("v"))
    )
    return (
        attach_singletons(labels, docs.select(F.col(id_col).alias("record_id")))
        .select(F.col("record_id").alias(id_col), F.col("cluster_id").alias("dup_group"))
    )


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def exact_dedup(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """-> (id, dup_group, is_canonical): docs with byte-equal normalized text
    share a group; canonical = min id. Single hash-aggregate shuffle on the
    md5 digest (map-side combined)."""
    digest = F.md5(normalize(text_col))
    grouped = (
        docs.select(F.col(id_col), digest.alias("_dig"))
        .groupBy("_dig")
        .agg(F.min(id_col).alias("dup_group"))
    )
    return (
        docs.select(id_col, digest.alias("_dig"))
        .join(grouped, "_dig")
        .select(
            id_col,
            "dup_group",
            (F.col(id_col) == F.col("dup_group")).alias("is_canonical"),
        )
    )


# ---------------------------------------------------------------------------
# minhash-LSH near-dup
# ---------------------------------------------------------------------------


def minhash_dedup(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    ngram: int = 3,
    k: int = 64,
    bands: int = 8,
    jaccard_threshold: float = 0.7,
    salt_cap: int = 256,
) -> DataFrame:
    """Word-shingle MinHash + LSH banding + exact-Jaccard verify -> groups.

    shingle -> minhash -> band -> bucket-join -> verify, per the standard
    near-dup pipeline (Broder '97 / MMDS ch.3 — public knowledge)."""
    base = docs.select(
        F.col(id_col).alias("record_id"),
        word_ngrams(tokenize(normalize(text_col)), ngram).alias("shingles"),
    )
    blocks = B.salt_blocks(
        B.lsh_blocks(base, "shingles", k=k, bands=bands), cap=salt_cap
    )
    cand = B.pairs_from_blocks(blocks)
    a = base.select(F.col("record_id").alias("id_a"), F.col("shingles").alias("sh_a"))
    b = base.select(F.col("record_id").alias("id_b"), F.col("shingles").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    # NULL (not 0/0) when both gram sets are empty — matches the SQL-oracle
    # semantics and never divides by zero under ANSI mode.
    jac = F.when(union > 0, inter / union)
    verified = (
        cand.join(a, "id_a")
        .join(b, "id_b")
        .withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= jaccard_threshold)
        .select("id_a", "id_b", "jaccard")
    )
    return _groups_from_pairs(verified, docs, id_col)


# ---------------------------------------------------------------------------
# simhash near-dup (UDF-free 64-bit signature)
# ---------------------------------------------------------------------------


def _assemble_sig(vote_col_of) -> F.Column:
    """64 vote columns/exprs -> packed signed-64 signature: bit b set iff
    vote_b > 0. Shift amounts unrolled in Python (must be literals)."""
    sig = F.lit(0).cast("long")
    for b in range(64):
        bit_val = F.lit((1 << b) if b < 63 else -(1 << 63)).cast("long")
        sig = sig.bitwiseOR(
            F.when(vote_col_of(b) > 0, bit_val).otherwise(F.lit(0).cast("long"))
        )
    return sig


def simhash_signatures_df(
    records: DataFrame, tokens_col: str = "tokens", id_col: str = "record_id"
) -> DataFrame:
    """records(id, <tokens>) -> (id, sig: long). The SCALE form of SimHash.

    explode tokens once -> hash each token ONCE in codegen -> 64 JVM sum
    aggregates (one +1/-1 vote column per bit, map-side combined) ->
    assemble the packed signature. Shuffle = |records| x 64 longs,
    independent of token count, all whole-stage-codegen.

    The HOF column form (`simhash64`) runs interpreted and re-evaluates its
    lambda per token element — measured ~an order of magnitude slower at
    100k docs (same pathology the LSH banding fix removed, blocking.py).
    Signature-equal to `simhash64` including empty-token docs (sig 0):
    explode_outer keeps them as a NULL token voting 0 on every bit.
    """
    ex = records.select(id_col, F.explode_outer(tokens_col).alias("_t"))
    ex = ex.select(
        id_col, F.xxhash64("_t").alias("_h"), F.col("_t").isNull().alias("_pad")
    )
    aggs = [
        F.sum(
            F.when(F.col("_pad"), F.lit(0))
            .when(F.shiftright(F.col("_h"), b).bitwiseAND(1) == 1, F.lit(1))
            .otherwise(F.lit(-1))
            .cast("long")
        ).alias(f"_v{b}")
        for b in range(64)
    ]
    per = ex.groupBy(id_col).agg(*aggs)
    return per.select(
        F.col(id_col), _assemble_sig(lambda b: F.col(f"_v{b}")).alias("sig")
    )


def simhash64(tokens_col) -> F.Column:
    """64-bit SimHash of a token array (Charikar '02) — pure column
    expressions: per-token xxhash64 bits vote +1/-1 per position, sign of
    the vote becomes the signature bit. Row-local; bit positions unrolled in
    Python (shift amounts must be literals in the DataFrame API).

    NOTE: higher-order-function lambdas run interpreted (no codegen) — this
    is the small-data/unit-test form; pipelines use `simhash_signatures_df`
    (explode + 64 codegen aggregates, ~10x faster, signature-identical)."""
    toks = F.col(tokens_col) if isinstance(tokens_col, str) else tokens_col
    one = F.lit(1).cast("long")
    neg = F.lit(-1).cast("long")
    votes = F.aggregate(
        toks,
        F.array_repeat(F.lit(0).cast("long"), 64),
        lambda acc, t: F.zip_with(
            acc,
            F.array(
                *[
                    F.when(
                        F.shiftright(F.xxhash64(t), b).bitwiseAND(1) == 1, one
                    ).otherwise(neg)
                    for b in range(64)
                ]
            ),
            lambda x, y: x + y,
        ),
    )
    return _assemble_sig(lambda b: F.element_at(votes, b + 1))


def simhash_dedup(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
) -> DataFrame:
    """SimHash near-dup: block on 4x16-bit signature chunks (pigeonhole: two
    signatures within Hamming distance 3 share at least one of 4 chunks),
    verify with bit_count(xor) <= max_hamming, cluster."""
    base = simhash_signatures_df(
        docs.select(
            F.col(id_col).alias("record_id"),
            tokenize(normalize(text_col)).alias("_toks"),
        ),
        tokens_col="_toks",
    ).persist()
    # chunk keys as plain longs (chunk index in bits 16+): these keys only
    # ever meet other simhash chunk keys, and salt_blocks hashes them to
    # tagged 8-byte keys anyway — no string formatting on the hot path
    chunks = base.select(
        "record_id",
        "sig",
        F.explode(
            F.array(
                *[
                    (
                        F.shiftright(F.col("sig"), c * 16).bitwiseAND(0xFFFF)
                        + F.lit(c * 65536)
                    ).cast("long")
                    for c in range(4)
                ]
            )
        ).alias("block_key"),
    )
    # salt before pair expansion: a hot 16-bit chunk (template/boilerplate
    # corpora hash many near-identical docs into one chunk value) would
    # otherwise collect_list an unbounded array and explode C(n,2) pairs on
    # a single row — same bound as the minhash (256) / embedding (512) paths.
    cand = B.pairs_from_blocks(
        B.salt_blocks(chunks.select("record_id", "block_key"), cap=256)
    )
    a = base.select(F.col("record_id").alias("id_a"), F.col("sig").alias("sig_a"))
    b = base.select(F.col("record_id").alias("id_b"), F.col("sig").alias("sig_b"))
    verified = (
        cand.join(a, "id_a")
        .join(b, "id_b")
        .withColumn("hamming", F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b"))))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )
    return _groups_from_pairs(verified, docs, id_col)


# ---------------------------------------------------------------------------
# n-gram Jaccard similarity (verification metric / standalone pairs op)
# ---------------------------------------------------------------------------


def ngram_containment_pairs(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 2,
) -> DataFrame:
    """pairs + Broder containment both ways: cont_a = |A∩B|/|A| (how much
    of A lives inside B), cont_b likewise. The asymmetric complement to
    Jaccard for crawl dedup: an excerpt/quotation page scores cont≈1
    against its source while symmetric Jaccard is diluted by the larger
    doc's size (Broder '97, resemblance vs containment). NULL when the
    respective side has zero grams."""
    g = docs.select(
        F.col(id_col),
        F.array_distinct(word_ngrams(tokenize(normalize(text_col)), n)).alias("_g"),
    )
    a = g.select(F.col(id_col).alias("id_a"), F.col("_g").alias("ga"))
    b = g.select(F.col(id_col).alias("id_b"), F.col("_g").alias("gb"))
    inter = F.size(F.array_intersect("ga", "gb"))
    return (
        pairs.join(a, "id_a")
        .join(b, "id_b")
        .select(
            "id_a",
            "id_b",
            F.when(F.size("ga") > 0, inter / F.size("ga")).alias("cont_a"),
            F.when(F.size("gb") > 0, inter / F.size("gb")).alias("cont_b"),
        )
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 2,
) -> DataFrame:
    """pairs(id_a, id_b) + exact word-n-gram Jaccard similarity column."""
    g = docs.select(
        F.col(id_col),
        F.array_distinct(word_ngrams(tokenize(normalize(text_col)), n)).alias("_g"),
    )
    a = g.select(F.col(id_col).alias("id_a"), F.col("_g").alias("ga"))
    b = g.select(F.col(id_col).alias("id_b"), F.col("_g").alias("gb"))
    inter = F.size(F.array_intersect("ga", "gb"))
    union = F.size(F.array_union("ga", "gb"))
    return (
        pairs.join(a, "id_a")
        .join(b, "id_b")
        .select(
            "id_a",
            "id_b",
            # NULL when both docs have zero grams (empty/punct-only text) —
            # the oracle's 0/0 degenerates to NULL the same way.
            F.when(union > 0, inter / union).alias("jaccard"),
        )
    )
