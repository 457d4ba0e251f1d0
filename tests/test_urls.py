"""URL canonicalization: handcrafted expected outputs per rule."""

from __future__ import annotations

from pyspark.sql import functions as F

from nlp_entity_linking_spark.functions.urls import canonical_url, url_parts

CASES = [
    # (raw, canonical)
    ("HTTP://WWW.Example.COM/Path", "http://www.example.com/Path"),
    ("https://a.com:443/x", "https://a.com/x"),
    ("http://a.com:80", "http://a.com"),
    ("http://a.com:8080/x", "http://a.com:8080/x"),  # non-default kept
    ("http://a.com/x#frag", "http://a.com/x"),
    ("http://a.com/x?utm_source=t&id=3", "http://a.com/x?id=3"),
    ("http://a.com/x?id=3&utm_medium=m&y=2", "http://a.com/x?id=3&y=2"),
    ("http://a.com/x?utm_campaign=c", "http://a.com/x"),
    ("http://a.com/x?fbclid=abc&gclid=def", "http://a.com/x"),
    ("http://a.com/path/", "http://a.com/path"),
    ("http://a.com/Path?Q=CaseKept", "http://a.com/Path?Q=CaseKept"),
    ("not a url at all", "not a url at all"),
    # component anchoring — none of these may be mangled:
    ("http://h/a:443/b", "http://h/a:443/b"),  # port-lookalike in path
    ("http://h/a:80/", "http://h/a:80"),  # ditto, plus trailing slash
    ("http://h:443/x", "http://h:443/x"),  # https port on http kept
    ("https://h:80/x", "https://h:80/x"),  # http port on https kept
    ("ftp://h:80/x", "ftp://h:80/x"),  # unknown scheme: port kept
    ("http://a.com/a&b?id=1", "http://a.com/a&b?id=1"),  # '&' in path
    ("http://a.com/x?next=/", "http://a.com/x?next=/"),  # '/' in query val
    ("http://a.com/x?xutm_source=1", "http://a.com/x?xutm_source=1"),
    ("http://a.com/path/?id=1", "http://a.com/path?id=1"),
    ("http://a.com/x?utm_a=1&utm_b=2&utm_c=3", "http://a.com/x"),
    # separator hygiene — messy-but-equivalent queries canonicalize
    # together (dangling/leading '&', '&' runs):
    ("http://a.com/x?a=1&", "http://a.com/x?a=1"),
    ("http://a.com/x?&a=1", "http://a.com/x?a=1"),
    ("http://a.com/x?a=1&&b=2", "http://a.com/x?a=1&b=2"),
    ("http://a.com/x?&&a=1&&", "http://a.com/x?a=1"),
    ("http://a.com/x?&", "http://a.com/x"),
    ("http://a.com/x?utm_source=t&", "http://a.com/x"),
]


def test_canonical_url_rules(spark):
    df = spark.createDataFrame(CASES, "raw string, want string")
    got = df.select("raw", "want", canonical_url("raw").alias("canon")).collect()
    for r in got:
        assert r.canon == r.want, (r.raw, r.canon, r.want)


def test_url_parts(spark):
    df = spark.createDataFrame(
        [("https://Host.com:81/a/b?x=1&y=2#z",)], "u string"
    )
    row = df.select(*url_parts("u")).collect()[0]
    assert row.host == "Host.com"
    assert row.path == "/a/b"
    assert row.query == "x=1&y=2"


def test_canonical_url_idempotent(spark):
    """Canonicalizing a canonical url is a no-op (fixed point) — required
    for repeated pipeline application over already-clean catalogs."""
    df = spark.createDataFrame(CASES, "raw string, want string")
    got = df.select(
        canonical_url("raw").alias("c1"),
        canonical_url(canonical_url("raw")).alias("c2"),
    ).collect()
    for r in got:
        assert r.c1 == r.c2
