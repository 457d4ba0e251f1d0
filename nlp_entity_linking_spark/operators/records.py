"""pages -> records: the D1 -> D2 stage (SURVEY.md §1.1, §2 B/C).

latest-per-url dedup (as-of semantics on warc_ts) -> byte-identical text
extraction -> mention extraction (title mention is the record surface) ->
normalization / tokens / shingles.

record_id is xxhash64(url): deterministic, partition-layout-independent —
never monotonically_increasing_id (SURVEY.md §4.2). 64-bit collisions are
negligible at test scale; the README's deployment notes cover the
collision-audited id assignment (group-by check) for the 10^12-row tier.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.extract import extract_page_expr, extract_page_nd
from ..functions.normalize import char_shingles, normalize, tokenize

RECORD_COLS = (
    "record_id",
    "url",
    "surface",
    "norm",
    "tokens",
    "ctx_tokens",
    "shingles",
    "lang",
)


def audit_record_ids(records: DataFrame) -> int:
    """Collision audit for the xxhash64(url) record-id assignment: number of
    record_ids carrying more than one distinct url (README deployment notes;
    must be 0). One cheap hash aggregate over (record_id, url)."""
    return (
        records.groupBy("record_id")
        .agg(F.countDistinct("url").alias("_n_urls"))
        .filter(F.col("_n_urls") > 1)
        .count()
    )


def latest_per_url(pages: DataFrame) -> DataFrame:
    """One row per url — the newest warc_ts snapshot (SURVEY.md B4/E6).

    Window dedup; ties broken by html bytes for full determinism.
    """
    w = Window.partitionBy("url").orderBy(
        F.desc("warc_ts"), F.desc(F.xxhash64("html"))
    )
    return (
        pages.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def extract_records(
    pages: DataFrame,
    langs: tuple[str, ...] | None = None,
    shingle_n: int = 3,
    extract_first: bool = False,
    engine: str = "python",
) -> DataFrame:
    """pages(url, warc_ts, html, text, lang) -> records (RECORD_COLS).

    The title mention is the record surface (one record per page); html is
    projected away immediately after extraction so the binary column never
    rides a shuffle (SURVEY.md §4.1 column pruning).

    extract_first: order of extraction vs latest-per-url dedup — measured at
    sf0.1, both orders produce IDENTICAL records (same window ordering incl.
    the xxhash64(html) tie-break, null-html/lang filters applied after the
    window either way):
      * True  — extract every snapshot (~1.1x UDF rows on the ~10% stale
        ratio), then dedup: the window shuffles thin extracted text, the
        html binary NEVER rides an exchange.
      * False — dedup first (window shuffles the html payload), extract
        only surviving snapshots.
    The shuffle-html cost grows with payload size; the extra-extraction
    cost grows with the re-crawl ratio. Measured (tools/bench_extract_order,
    100k pages, quiet-host medians of 6): dedup-first 5.9s vs extract-first
    7.0s at the fixture's ~1 KB html bodies and ~10% re-crawl — so
    dedup-first is the default; at real crawl html sizes (~100 KB bodies)
    the balance flips to extract-first, which is why the order is a flag.

    engine: "python" (default) extracts via the Arrow/pandas UDF; "jvm"
    runs byte-identical codegen string expressions instead (test-enforced
    equality on valid UTF-8). MEASURED, against the intuition that
    avoiding the Arrow crossing must win: python is faster at BOTH ~1 KB
    html (2.7s vs 3.9s warm per 100k pages) and ~40 KB html (79s vs 107s
    per 10k) — the regex CPU dominates the transfer, and Java's
    backtracking engine is slower than CPython's sre on the
    reluctant-dotall html patterns. "jvm" remains the right choice when
    executors must run with NO Python workers at all (pure-JVM clusters),
    or for plans that want extraction fused into codegen with other
    column work."""
    if engine not in ("jvm", "python"):
        raise ValueError(f"unknown extraction engine: {engine!r}")
    # extract_page_nd: the non-deterministic-MARKED (but pure) Python UDF —
    # keeps the optimizer from duplicating the extraction under the surface
    # filters below (one ArrowEvalPython node, not two; guide §4.4)
    page_fn = extract_page_expr if engine == "jvm" else extract_page_nd
    if extract_first:
        df = pages.select(
            "url",
            "lang",
            "warc_ts",
            F.col("html").isNotNull().alias("_has_html"),
            F.xxhash64("html").alias("_hh"),
            page_fn("html").alias("_page"),
        ).select(
            "url",
            "lang",
            "warc_ts",
            "_has_html",
            "_hh",
            F.col("_page.text").alias("text"),
            F.col("_page.mentions").alias("mentions"),
        )
        w = Window.partitionBy("url").orderBy(F.desc("warc_ts"), F.desc("_hh"))
        df = (
            df.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .filter(F.col("_has_html"))
            .drop("_rn", "_has_html", "_hh", "warc_ts")
        )
        if langs:
            df = df.filter(F.col("lang").isin(*langs))
    else:
        df = latest_per_url(pages)
        if langs:
            df = df.filter(F.col("lang").isin(*langs))
        df = df.filter(F.col("html").isNotNull())
        df = df.select(
            "url",
            "lang",
            page_fn("html").alias("_page"),
        ).select(
            "url",
            "lang",
            F.col("_page.text").alias("text"),
            F.col("_page.mentions").alias("mentions"),
        )
    title = F.filter(F.col("mentions"), lambda m: m["kind"] == F.lit("title"))
    df = (
        df.withColumn("surface", F.element_at(title, 1)["surface"])
        .filter(F.col("surface").isNotNull() & (F.length("surface") > 0))
        .select("url", "lang", "surface", "text")
    )
    df = df.withColumn("norm", normalize("surface")).filter(F.length("norm") > 0)
    return df.select(
        F.xxhash64("url").alias("record_id"),
        "url",
        "surface",
        "norm",
        tokenize("norm").alias("tokens"),
        # context tokens = extracted text MINUS the surface tokens: the
        # TF-IDF cosine must measure *context* similarity — leaving title
        # tokens in lets near-identical names fake a high cosine
        # (SURVEY.md I3: "context similarity TF-IDF cosine").
        F.array_except(
            tokenize(normalize("text")), tokenize(normalize("surface"))
        ).alias("ctx_tokens"),
        char_shingles("norm", shingle_n).alias("shingles"),
        "lang",
    )
