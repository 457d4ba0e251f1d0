"""URL canonicalization (crawl-pipeline staple: dedup/grouping by
canonical url instead of raw crawl string).

Row-local built-ins only — every transform is a whole-stage-codegen string
expression, and every regex is RE2-safe (no backrefs/lookaround) so the
DuckDB oracle runs the IDENTICAL patterns (q:url_canon_docs).

Component-anchored (NOT whole-string regex): the url is split into
scheme / authority / path / query / fragment first, each rule is applied
only to the component it belongs to, then the pieces are reassembled.
This is what makes the rules safe — a ':443' inside a path, a literal
'&' inside a path segment, or a trailing '/' inside a query value are
never touched (the old whole-string rules mangled all three).

Canonical form (the common normalizations that preserve fetch semantics):
  * scheme + authority lowercased (path/query case preserved)
  * fragment dropped (#... never reaches the server)
  * default port stripped from the AUTHORITY only, conditional on the
    scheme (:80 for http, :443 for https — an https://h:80 is kept, it
    really is a non-default port)
  * tracking params (utm_*, fbclid, gclid) dropped from the QUERY only,
    via a '&'-sentinel so first/middle/last params all drop cleanly with
    no leftover separators
  * query separator hygiene: '&' runs collapse ('?a=1&&b=2'), leading and
    dangling separators drop ('?&a=1', '?a=1&') — messy-but-equivalent
    query strings canonicalize together
  * emptied query ('?') dropped; trailing '/' dropped from the PATH
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Component-extraction + per-component patterns; mirrored verbatim in the
# oracle (replacement dialect mapped $1 -> \1, global flag explicit).
HEAD_RE = r"^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)"  # scheme://authority
SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.-]*)://"
PATH_RE = r"^([^?]*)"  # of the fragment-stripped tail
QUERY_RE = r"\?(.*)$"
TRACKING_RE = r"&(utm_[A-Za-z0-9_]*|fbclid|gclid)=[^&]*"


def canonical_url(url_col) -> Column:
    """Canonical url as a Column expression (see module docstring).

    Pure codegen string built-ins; urls with no scheme://authority head
    pass through unchanged.
    """
    url = F.col(url_col) if isinstance(url_col, str) else url_col
    head = F.regexp_extract(url, HEAD_RE, 1)
    scheme = F.lower(F.regexp_extract(url, SCHEME_RE, 1))
    # authority = head minus 'scheme://'
    auth = F.lower(F.substring(head, F.length(scheme) + 4, F.lit(1 << 30)))
    auth = (
        F.when(scheme == "http", F.regexp_replace(auth, r":80$", ""))
        .when(scheme == "https", F.regexp_replace(auth, r":443$", ""))
        .otherwise(auth)
    )
    tail = F.substring(url, F.length(head) + 1, F.lit(1 << 30))
    tail = F.regexp_replace(tail, r"#.*$", "")  # fragment
    path = F.regexp_extract(tail, PATH_RE, 1)
    path = F.regexp_replace(path, r"/$", "")
    query = F.regexp_extract(tail, QUERY_RE, 1)
    # '&'-sentinel: every param (first included) is preceded by '&', so one
    # anchored pattern drops any tracking param with its own separator.
    query = F.regexp_replace(F.concat(F.lit("&"), query), TRACKING_RE, "")
    # separator hygiene: collapse '&' runs from the source ('a=1&&b=2'),
    # then strip the sentinel plus any leading/dangling separators
    query = F.regexp_replace(query, r"&&+", "&")
    query = F.regexp_replace(query, r"^&+|&+$", "")
    qpart = F.when(query == "", F.lit("")).otherwise(F.concat(F.lit("?"), query))
    rebuilt = F.concat(scheme, F.lit("://"), auth, path, qpart)
    return F.when(head == "", url).otherwise(rebuilt)


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
