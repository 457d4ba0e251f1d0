"""URL canonicalization (crawl-pipeline staple: dedup/grouping by
canonical url instead of raw crawl string).

Row-local built-ins only — every transform is a whole-stage-codegen string
expression, and every regex is RE2-safe (no backrefs/lookaround) so the
DuckDB oracle runs the IDENTICAL patterns (q:url_canon_docs).

Canonical form (the common normalizations that preserve fetch semantics):
  * scheme + host lowercased (path/query case preserved)
  * fragment dropped (#... never reaches the server)
  * default ports stripped (:80 http, :443 https)
  * tracking params dropped (utm_*, fbclid, gclid) wherever they sit in
    the query string, collapsing the separators they leave behind
  * trailing '?' (emptied query) and trailing '/' on a path dropped
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# (pattern, replacement) applied in order; mirrored verbatim in the oracle
URL_CANON_RULES: tuple[tuple[str, str], ...] = (
    (r"#.*$", ""),  # fragment
    (r":80(/|$)", r"$1"),  # default http port (before any path)
    (r":443(/|$)", r"$1"),  # default https port
    (r"([?&])(utm_[A-Za-z0-9_]*|fbclid|gclid)=[^&#]*", r"$1"),  # tracking
    (r"\?&+", "?"),  # separators left by dropped first param
    (r"&&+", "&"),  # separators left by dropped middle params
    (r"[?&]+$", ""),  # emptied query
    (r"/$", ""),  # trailing slash
)


def _lower_scheme_host(url: Column) -> Column:
    # scheme://host[:port] is case-insensitive; path/query are not
    head = F.regexp_extract(url, r"^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)", 1)
    tail = F.substring(url, F.length(head) + 1, F.lit(1 << 30))
    return F.when(head == "", url).otherwise(F.concat(F.lower(head), tail))


def canonical_url(url_col) -> Column:
    """Canonical url as a Column expression (see module docstring)."""
    c = F.col(url_col) if isinstance(url_col, str) else url_col
    c = _lower_scheme_host(c)
    for pat, rep in URL_CANON_RULES:
        c = F.regexp_replace(c, pat, rep)
    return c


def url_parts(url_col) -> list[Column]:
    """host / path / query extraction — RE2-safe regexp_extract, shared
    with the oracle."""
    c = F.col(url_col) if isinstance(url_col, str) else url_col
    return [
        F.regexp_extract(c, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#:]*)", 1).alias(
            "host"
        ),
        F.regexp_extract(c, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*(/[^?#]*)", 1).alias(
            "path"
        ),
        F.regexp_extract(c, r"\?([^#]*)", 1).alias("query"),
    ]
