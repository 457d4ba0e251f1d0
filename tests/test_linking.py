"""Entity linking: dictionary candidates + prior/context disambiguation +
one-entity-per-discourse collective pass (operators/linking.py).

The scoring stack is all-integer with a total deterministic order, so the
twin test runs the IDENTICAL pipeline in DuckDB SQL and asserts row-set
equality — driver-oracle rigor without a registry slot.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from nlp_entity_linking_spark.operators import linking as L

# (alias, entity_id, prior, desc) — two ambiguous surfaces with opposed
# priors/contexts, plus unambiguous fillers
KB = [
    ("Jaguar", 1, 900, "british car maker engine vehicle"),
    ("Jaguar", 2, 400, "big cat feline jungle predator"),
    ("Python", 3, 700, "programming language code software"),
    ("Python", 4, 650, "snake reptile constrictor jungle"),
    ("Paris", 5, 990, "capital city france europe"),
    ("Paris", 6, 10, "texas town usa"),
] + [(f"Filler{i}", 100 + i, 50 + i, f"filler topic {i}") for i in range(12)]


def _mention_rows():
    """Deterministic mention set covering: context wins over prior, prior
    breaks no-context ties, collective flips a lone ambiguous mention."""
    rows = []
    mid = 0

    def add(doc, surface, ctx):
        nonlocal mid
        rows.append((doc, mid, surface, ctx))
        mid += 1

    # doc 0: 'jaguar' 3x with car context + 1x bare -> collective links
    # all four to entity 1 (local linking would also pick 1 for the bare
    # one via prior; the flip case is doc 1)
    for _ in range(3):
        add(0, "Jaguar", "the engine of the new vehicle")
    add(0, "Jaguar", "spotted yesterday")
    # doc 1: 'jaguar' 2x jungle-cat context + 1x bare -> locally the bare
    # mention goes to entity 1 (prior 900), but the doc's pooled vote is
    # entity 2 -> collective FLIPS the bare mention
    for _ in range(2):
        add(1, "Jaguar", "a predator stalking the jungle")
    add(1, "Jaguar", "seen at dawn")
    # doc 2: python with code context; doc 3: python bare (prior wins -> 3)
    add(2, "Python", "wrote some code in the language")
    add(3, "Python", "no relevant words here")
    # paris everywhere: heavy prior
    for d in range(4, 8):
        add(d, "Paris", "went to the city")
    # fillers + an unlinkable surface
    for i in range(8):
        add(8 + i, f"Filler{i}", f"about filler topic {i}")
    add(20, "Nosuchthing", "matches no alias")
    return rows


def _frames(spark):
    kb = spark.createDataFrame(
        KB, "alias string, entity_id long, prior long, desc string"
    ).withColumn(
        "desc_tokens",
        F.split(F.lower(F.col("desc")), " "),
    ).drop("desc")
    men = spark.createDataFrame(
        _mention_rows(), "doc_id long, mention_id long, surface string, ctx string"
    ).withColumn(
        "ctx_tokens", F.split(F.lower(F.col("ctx")), " ")
    ).drop("ctx")
    return kb, men


def test_local_and_collective_linking(spark):
    kb, men = _frames(spark)
    local = {
        r.mention_id: r.entity_id
        for r in L.link_pipeline(men, kb, collective=False).collect()
    }
    joint = {
        r.mention_id: r.entity_id
        for r in L.link_pipeline(men, kb, collective=True).collect()
    }
    # context beats prior locally (doc 1's two jungle mentions -> cat)
    assert local[4] == 2 and local[5] == 2
    # bare mention falls back to prior locally (entity 1)...
    assert local[6] == 1
    # ...and is FLIPPED by the discourse vote collectively
    assert joint[6] == 2
    # doc 0: all four jaguar mentions -> carmaker under both modes
    for m in (0, 1, 2, 3):
        assert local[m] == 1 and joint[m] == 1
    # code context -> language; bare -> higher prior
    assert local[7] == 3 and local[8] == 3
    # unlinkable surface (mid 21, the last row) yields no row either mode
    assert 21 not in local and 21 not in joint
    # every linkable mention got exactly one assignment
    assert len(local) == len(_mention_rows()) - 1 == len(joint)


def test_with_nil_mentions(spark):
    """The NIL contract: every input mention appears exactly once; the
    unlinkable one carries entity_id NULL."""
    kb, men = _frames(spark)
    linked = L.link_pipeline(men, kb, collective=True)
    full = L.with_nil_mentions(linked, men).collect()
    assert len(full) == len(_mention_rows())
    by_id = {r.mention_id: r for r in full}
    assert by_id[21].entity_id is None
    assert by_id[21].alias_norm == "nosuchthing"
    assert by_id[0].entity_id == 1


def test_prepare_aliases_cap(spark):
    rows = [("Crowded", i, 1000 - i, f"desc {i}") for i in range(30)]
    kb = spark.createDataFrame(
        rows, "alias string, entity_id long, prior long, desc string"
    ).withColumn("desc_tokens", F.split("desc", " ")).drop("desc")
    capped = L.prepare_aliases(kb, n_cand=5).collect()
    assert len(capped) == 5
    # top-5 by (prior desc, entity_id asc): entities 0..4
    assert sorted(r.entity_id for r in capped) == [0, 1, 2, 3, 4]


def test_mentions_from_documents_adapter(spark):
    docs = spark.createDataFrame(
        [(7, "I saw Big Cat fight Mean Dog at the zoo")],
        "doc_id long, text string",
    )
    got = L.mentions_from_documents(docs).collect()
    assert {r.surface for r in got} == {"Big Cat", "Mean Dog"}
    # ids: distinct per mention, deterministic across recomputation
    ids = sorted(r.mention_id for r in got)
    assert len(set(ids)) == 2
    again = sorted(r.mention_id for r in L.mentions_from_documents(docs).collect())
    assert ids == again
    assert all("zoo" in r.ctx_tokens for r in got)


def test_linking_duckdb_twin(spark):
    """Row-set equality of the FULL collective pipeline vs an independent
    DuckDB implementation over the same (bigger, generated) input —
    integer scores + total ordering make the match exact."""
    import duckdb

    # generated corpus: 120 docs x 3 mentions, cycling ambiguous aliases
    kb_rows = list(KB)
    men_rows = []
    mid = 0
    ctxs = [
        "the engine of the vehicle",
        "predator in the jungle",
        "code in the language",
        "reptile in the jungle",
        "went to the city",
        "no relevant words",
    ]
    surfaces = ["Jaguar", "Python", "Paris", "Filler3", "Filler7"]
    for d in range(120):
        for j in range(3):
            men_rows.append(
                (d, mid, surfaces[(d + j) % 5], ctxs[(d * 3 + j) % 6])
            )
            mid += 1

    kb = spark.createDataFrame(
        kb_rows, "alias string, entity_id long, prior long, desc string"
    ).withColumn("desc_tokens", F.split(F.lower("desc"), " ")).drop("desc")
    men = spark.createDataFrame(
        men_rows, "doc_id long, mention_id long, surface string, ctx string"
    ).withColumn("ctx_tokens", F.split(F.lower("ctx"), " ")).drop("ctx")

    got = {
        (r.doc_id, r.mention_id, r.alias_norm, r.entity_id)
        for r in L.link_pipeline(men, kb, n_cand=16, collective=True).collect()
    }

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE kb(alias VARCHAR, entity_id BIGINT, prior BIGINT, descr VARCHAR)"
    )
    con.executemany("INSERT INTO kb VALUES (?, ?, ?, ?)", kb_rows)
    con.execute(
        "CREATE TABLE men(doc_id BIGINT, mention_id BIGINT, surface VARCHAR, ctx VARCHAR)"
    )
    con.executemany("INSERT INTO men VALUES (?, ?, ?, ?)", men_rows)
    norm = (
        "trim(regexp_replace(regexp_replace(lower({c}), '[^a-z0-9 ]', ' ', 'g'),"
        " ' +', ' ', 'g'))"
    )
    tset = "list_sort(list_distinct(list_filter(string_split({c}, ' '), x -> x <> '')))"
    twin = con.execute(
        f"""
        WITH ac AS (
          SELECT alias_norm, entity_id, prior, dset FROM (
            SELECT {norm.format(c='alias')} AS alias_norm, entity_id, prior,
                   {tset.format(c='lower(descr)')} AS dset,
                   row_number() OVER (
                     PARTITION BY {norm.format(c='alias')}
                     ORDER BY prior DESC, entity_id ASC) AS rn
            FROM kb) WHERE rn <= 16),
        mm AS (
          SELECT doc_id, mention_id,
                 {norm.format(c='surface')} AS alias_norm,
                 {tset.format(c='lower(ctx)')} AS cset
          FROM men),
        cands AS (
          SELECT m.doc_id, m.mention_id, m.alias_norm, a.entity_id,
                 CAST(len(list_intersect(m.cset, a.dset)) AS BIGINT)
                   * {1 << 40} + a.prior AS score
          FROM mm m JOIN ac a USING (alias_norm)),
        votes AS (
          SELECT doc_id, alias_norm, entity_id, SUM(score) AS vote
          FROM cands GROUP BY ALL),
        winner AS (
          SELECT doc_id, alias_norm, entity_id FROM (
            SELECT *, row_number() OVER (
              PARTITION BY doc_id, alias_norm
              ORDER BY vote DESC, entity_id ASC) AS rn
            FROM votes) WHERE rn = 1)
        SELECT DISTINCT c.doc_id, c.mention_id, c.alias_norm, w.entity_id
        FROM cands c JOIN winner w USING (doc_id, alias_norm)
        """
    ).fetchall()
    assert got == set(map(tuple, twin))
    assert len(got) == len(men_rows)  # every surface here is linkable
