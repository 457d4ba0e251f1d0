"""Deterministic synthetic Common-Crawl-style `pages` fixture (SURVEY.md A4).

Replaces external Common Crawl per the driver brief ("synthesise it
deterministically at small scale"; no external data). Fully distributed and
partition-layout-independent: every column is a pure function of the row id
through seeded ``xxhash64`` streams — no ``rand()``, no
``monotonically_increasing_id`` — so the same (n_pages, seed) produces
byte-identical tables at local[1], local[32], or a 1000-executor cluster.

Planted ground truth (FIXTURES.md §B): each page carries one entity name
variant in its <title>; variants of the same entity differ by controlled
perturbations (case, diacritics, <=2-char typos, token reorder/drop, suffix
noise). A few *hot* entities get Zipf-ish page counts to exercise hot-key
salting. ``entity_id`` lives only in the side table ``gold``.

Schema (binding, BASELINE.json input_hint):
    url:string, warc_ts:timestamp, html:binary, text:string, lang:string
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

# Seeded vocabularies. FIRST x LAST x ORG = 40*40*30 = 48,000 unique token
# triples -> distinct entities differ in at least one whole token, keeping
# planted clusters separable by token-set / cosine features.
FIRST = """Maria John Wei Fatima Ivan Aiko Carlos Nadia Pierre Ingrid
Omar Lucia Hans Yuki Priya Sergei Amara Diego Elena Kwame Sofia Anders
Leila Marco Chen Astrid Rafael Zara Viktor Amina Paulo Greta Hiro Dalia
Stefan Rosa Tariq Helga Mateo Suki""".split()
LAST = """Lopez Smith Zhang Haddad Petrov Tanaka Garcia Okafor Dubois
Larsen Rahman Moretti Schmidt Kobayashi Sharma Volkov Diallo Ramirez
Papadopoulos Mensah Costa Lindqvist Nasser Ricci Wang Berg Souza Khan
Novak Abebe Ferreira Johansson Mori Saleh Weber Delgado Farouk Nilsson
Vargas Ito""".split()
ORG = """Consulting Logistics Analytics Holdings Robotics Foods Textiles
Energy Marine Aviation Software Mining Pharma Media Travel Finance
Forestry Ceramics Optics Brewing Motors Realty Biotech Farms Shipping
Studios Telecom Gaming Labs Security""".split()
DOMAINS = [f"site{i:02d}.example.com" for i in range(20)]
CTX = """market quarterly report supply contract partner regional export
warehouse retail product customer service network platform license
factory harvest fleet broadcast merger audit payroll invoice tender
freight courier depot refinery turbine orchard vineyard quarry foundry
atelier studio gallery auction charter franchise subsidiary dividend
forecast inventory logistics procurement wholesale distributor assembly
prototype patent trademark compliance subsidy grant endowment summit
keynote webinar roadshow expo symposium""".split()
LANGS = ["en", "en", "en", "en", "en", "fr", "es", "de", "zh", "en"]

_EPOCH_2024 = 1704067200  # 2024-01-01T00:00:00Z

N_HOT_ENTITIES = 3
HOT_PERMILLE = 8  # ~0.8% of pages land on a hot entity -> hot blocking keys
MAX_COLD_ENTITIES = 47_000  # keep token triples unique (48k combos)


def _ws(c: Column) -> Column:
    """Collapse whitespace — the expected `text` must match the extractor's
    whitespace-collapsed output even when a typo perturbation leaves a
    double space inside the title."""
    return F.trim(F.regexp_replace(c, " +", " "))


def _h(tag: str, col: Column, seed: int) -> Column:
    """Deterministic 64-bit hash stream keyed by (tag, row, seed)."""
    return F.xxhash64(F.lit(tag), col, F.lit(seed))


def _pick(arr: list[str], idx: Column) -> Column:
    return F.element_at(F.array(*[F.lit(x) for x in arr]), (idx + 1).cast("int"))


STYLE = ["Group", "Global", "Partners", "International"]

# Bijective scramble of the entity index over [0, 48000) before mixed-radix
# decomposition into (first, last, org): 7919 is coprime to 48000 = 2^7*3*5^3,
# so the map e -> e*7919 mod 48000 is a permutation — triple uniqueness is
# preserved while consecutive entity ids get well-scattered names (without
# this, small entity populations all share ORG[0] and differ in one token).
_SCRAMBLE = 7919
_NAME_SPACE = len(FIRST) * len(LAST) * len(ORG)


def _entity_name(entity: Column) -> Column:
    """4-token name FIRST LAST ORG STYLE with a unique (first, last, org)
    triple per entity < 48,000 — every perturbation that keeps those three
    tokens (including dropping the STYLE token, variant 4) stays unique
    across entities: no cross-entity title collisions to poison clusters."""
    e = (entity * _SCRAMBLE) % _NAME_SPACE
    first = _pick(FIRST, e % len(FIRST))
    last = _pick(LAST, (e / len(FIRST)).cast("long") % len(LAST))
    org = _pick(ORG, (e / (len(FIRST) * len(LAST))).cast("long") % len(ORG))
    style = _pick(STYLE, (entity * 13) % len(STYLE))
    return F.concat_ws(" ", first, last, org, style)


def _perturb(name: Column, variant: Column, h: Column) -> Column:
    """Controlled perturbations, all built-in string expressions."""
    ln = F.length(name)
    # typo position in [2, len-1] so first char survives (JW prefix boost)
    p = (F.pmod(h, F.greatest(ln - F.lit(2), F.lit(1))) + 2).cast("int")
    delete = F.concat(name.substr(F.lit(1), p - 1), name.substr(p + 1, ln))
    double = F.concat(name.substr(F.lit(1), p), name.substr(p, ln))
    toks = F.split(name, " ")
    return (
        F.when(variant == 0, name)
        .when(variant == 1, F.upper(name))
        .when(variant == 2, F.lower(name))
        .when(variant == 3, F.concat_ws(" ", F.reverse(toks)))
        .when(variant == 4, F.concat_ws(" ", F.slice(toks, 1, 3)))
        .when(variant == 5, delete)
        .when(variant == 6, double)
        .otherwise(F.concat(name, F.lit(" Inc")))
    )


def gen_pages(
    spark: SparkSession,
    n_pages: int,
    seed: int = 42,
    n_partitions: int | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Return (pages, gold).

    pages: url, warc_ts, html(binary), text, lang — text is the exact
    byte-identical extraction target for the html (the generator writes
    both, FIXTURES.md §B), including a ~10% stale-snapshot second row per
    url at an earlier warc_ts (exercises latest-per-url dedup).
    gold: url, entity_id (planted cluster ground truth; one row per url).
    """
    if n_partitions is None:
        n_partitions = max(8, spark.sparkContext.defaultParallelism)
    base = spark.range(0, n_pages, 1, n_partitions).withColumnRenamed("id", "pid")
    pid = F.col("pid")

    n_cold = min(max(4, n_pages // 3), MAX_COLD_ENTITIES)
    is_hot = F.pmod(_h("hot?", pid, seed), 1000) < HOT_PERMILLE
    entity = F.when(
        is_hot, F.pmod(_h("hotid", pid, seed), N_HOT_ENTITIES)
    ).otherwise(N_HOT_ENTITIES + F.pmod(_h("coldid", pid, seed), n_cold))

    df = base.withColumn("entity_id", entity)
    name = _entity_name(F.col("entity_id"))
    variant = F.pmod(_h("var", pid, seed), 8)
    title = _perturb(name, variant, _h("typo", pid, seed))
    # diacritic sprinkle on ~20% of pages (normalize() folds it back)
    title = F.when(
        F.pmod(_h("diac", pid, seed), 5) == 0,
        F.translate(title, "aeo", "áéö"),
    ).otherwise(title)
    df = df.withColumn("title", title)

    # entity-correlated context words (TF-IDF cosine signal) + page noise:
    # pages about one entity share a substantial vocabulary, pages about
    # different entities mostly don't — the Common-Crawl-style context
    # signal the north star's TF-IDF cosine feature keys on.
    ent = F.col("entity_id")
    ctx = F.concat_ws(
        " ",
        *[_pick(CTX, F.pmod(_h(f"c{i}", ent, seed), len(CTX))) for i in range(6)],
        *[_pick(CTX, F.pmod(_h(f"n{i}", pid, seed), len(CTX))) for i in range(3)],
    )
    df = df.withColumn("body", ctx)

    url = F.format_string(
        "https://%s/page-%d",
        _pick(DOMAINS, F.pmod(_h("dom", pid, seed), len(DOMAINS))),
        pid,
    )
    ts = F.timestamp_seconds(
        F.lit(_EPOCH_2024) + F.pmod(_h("ts", pid, seed), 90 * 86400)
    )
    lang = _pick(LANGS, F.pmod(_h("lang", pid, seed), len(LANGS)))

    html_fmt = (
        "<html><head><title>%s</title></head><body><h1>%s</h1>"
        "<p><b>About</b> %s</p><!-- crawl --><script>var x=1;</script>"
        "</body></html>"
    )
    text_fmt = "%s %s About %s"
    t, b = F.col("title"), F.col("body")
    cur = df.select(
        url.alias("url"),
        ts.alias("warc_ts"),
        F.encode(F.format_string(html_fmt, t, t, b), "utf-8").alias("html"),
        _ws(F.format_string(text_fmt, t, t, b)).alias("text"),
        lang.alias("lang"),
        F.col("entity_id"),
        pid,
    )

    # stale snapshots: ~10% of urls get a second, EARLIER row whose body has
    # an extra token; latest-per-url must select the current row.
    sb = F.concat(b, F.lit(" archived"))
    stale = df.filter(F.pmod(_h("dup", pid, seed), 10) == 0).select(
        url.alias("url"),
        F.timestamp_seconds(
            F.unix_timestamp(ts) - (F.pmod(_h("age", pid, seed), 30) + 1) * 86400
        ).alias("warc_ts"),
        F.encode(F.format_string(html_fmt, t, t, sb), "utf-8").alias("html"),
        _ws(F.format_string(text_fmt, t, t, sb)).alias("text"),
        lang.alias("lang"),
        F.col("entity_id"),
        pid,
    )

    pages = cur.unionByName(stale).select("url", "warc_ts", "html", "text", "lang")
    gold = cur.select("url", "entity_id")
    return pages, gold
