"""Custom Python data source (Spark 4 DataSource API): `synthpages`.

Demonstrates the engine's source seam beyond file formats: a crawl-shaped
source registered as a first-class format —

    spark.dataSource.register(PagesDataSource)
    spark.read.format("synthpages").option("n_pages", 1000).load()

yielding the binding input_hint schema (url, warc_ts, html binary, text,
lang). In production this adapter pattern is how a WARC fetcher, an HTTP
archive API, or a proprietary crawl store plugs in WITHOUT a JVM connector:
`partitions()` declares the split layout (so Spark schedules one task per
shard, exactly like parquet row groups), `read(partition)` streams rows for
one shard only — no driver materialization, no cross-partition state.

Rows are a pure function of (row id, seed) via md5 streams — deterministic
across partition counts and runs (same discipline as sources/synthetic.py;
content differs, the CONTRACT — deterministic, partition-invariant,
entity-clustered pages — is the same). Not wired into the default pipeline
(parquet + the expression-based generator stay the fast paths); it exists
as the documented, tested extension seam.
"""

from __future__ import annotations

import hashlib
from datetime import datetime, timedelta, timezone

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

PAGES_SCHEMA = (
    "url string, warc_ts timestamp, html binary, text string, lang string"
)

_FIRST = ["maria", "john", "wei", "fatima", "ivan", "aiko", "carlos", "nadia"]
_LAST = ["lopez", "smith", "zhang", "haddad", "petrov", "tanaka", "garcia"]
_ORG = ["consulting", "logistics", "analytics", "holdings", "robotics"]
_LANGS = ["en", "en", "en", "fr", "es", "de"]
_EPOCH = datetime(2024, 1, 1, tzinfo=timezone.utc)


def _h(tag: str, i: int, seed: int) -> int:
    """Deterministic 64-bit stream keyed by (tag, row, seed) — md5-based so
    plain Python reproduces it anywhere (no Spark expressions needed)."""
    d = hashlib.md5(f"{tag}:{i}:{seed}".encode()).digest()
    return int.from_bytes(d[:8], "big")


def _page_row(i: int, seed: int) -> tuple:
    ent = _h("ent", i, seed) % max(4, 1 + i // 3)  # ~3 pages per entity
    name = " ".join(
        (
            _FIRST[_h("f", ent, seed) % len(_FIRST)],
            _LAST[_h("l", ent, seed) % len(_LAST)],
            _ORG[_h("o", ent, seed) % len(_ORG)],
        )
    )
    variant = _h("var", i, seed) % 3
    title = {0: name, 1: name.upper(), 2: name + " inc"}[variant]
    body = f"report {ent % 97} market {ent % 53} contract {i % 7}"
    text = f"{title} {title} About {body}"
    html = (
        f"<html><head><title>{title}</title></head>"
        f"<body><h1>{title}</h1><p><b>About</b> {body}</p></body></html>"
    ).encode("utf-8")
    ts = _EPOCH + timedelta(seconds=_h("ts", i, seed) % (90 * 86400))
    lang = _LANGS[_h("lang", i, seed) % len(_LANGS)]
    return (f"https://site{i % 20:02d}.example.com/page-{i}", ts, html, text, lang)


class PagesReader(DataSourceReader):
    def __init__(self, options: dict):
        self.n_pages = int(options.get("n_pages", 1000))
        self.seed = int(options.get("seed", 42))
        self.n_partitions = int(options.get("n_partitions", 8))

    def partitions(self):
        # contiguous row-id ranges; the split layout IS the parallelism
        # contract (one Spark task per InputPartition)
        per = -(-self.n_pages // self.n_partitions)
        return [
            InputPartition((p * per, min((p + 1) * per, self.n_pages)))
            for p in range(self.n_partitions)
            if p * per < self.n_pages
        ]

    def read(self, partition: InputPartition):
        lo, hi = partition.value
        for i in range(lo, hi):
            yield _page_row(i, self.seed)


class PagesDataSource(DataSource):
    """spark.read.format("synthpages").option("n_pages", N).load()"""

    @classmethod
    def name(cls) -> str:
        return "synthpages"

    def schema(self) -> str:
        return PAGES_SCHEMA

    def reader(self, schema) -> PagesReader:
        return PagesReader(self.options)
