"""URL canonicalization, outlink extraction, and the URL filter chain.

The reference harvests outlinks from Wikipedia externallinks SQL dumps
(wikilinks/ExternalLinkExtractor.java:106-158) and pipes each URL through a
JSON-configured regex mapper chain (schema/FieldMapper.java:37-120,
resources/url_mappings.json) plus a URI-validity check (URLUtil.java:35-49).
Here: extraction + canonicalization are Arrow-batched pandas UDFs
(no row-at-a-time Python UDFs anywhere); the filter chain is a fused
JVM-side rlike alternation — Catalyst pushes it below the expensive UDFs.

Canonicalization itself (RFC 3986 normalize + scheme/host lowercase +
query-param sort) is NEW functionality required by the north rule — the
reference only checks URI validity.
"""

from __future__ import annotations

import re
from urllib.parse import parse_qsl, urlencode, urlsplit, urlunsplit

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType

# Matches absolute http(s) URLs and protocol-relative //host/path
# (ExternalLinkExtractor.java:142-144 prepends "http:" to '//' links).
_URL_RE = re.compile(
    r"""(?:https?:)?//[^\s<>"'\])]+""",
    re.IGNORECASE,
)

_DEFAULT_PORTS = {"http": ":80", "https": ":443"}

# Reference length cap: url_mappings.json:98-105 drops URLs matching ``.{3000}``.
MAX_URL_LEN = 3000


@F.pandas_udf(ArrayType(StringType()))
def extract_urls(text: pd.Series) -> pd.Series:
    """Harvest candidate outlink URLs from a text span (Arrow-batched).

    Protocol-relative ``//host/path`` links get an ``http:`` prefix —
    parity with ExternalLinkExtractor.java:142-144. Whitespace runs inside
    candidate URLs are impossible by construction of the regex (the
    reference instead collapses ``\\s+`` to one space first, :139-141).
    """
    return text.fillna("").str.findall(_URL_RE).map(
        lambda urls: ["http:" + u if u.startswith("//") else u for u in urls]
    )


def _canon_one(u: str) -> str | None:
    """RFC 3986 normalization of one URL. None = unparseable (dropped,
    mirroring the reference's URI-validity drop, URLUtil.java:39-47)."""
    try:
        parts = urlsplit(u)
    except ValueError:
        return None
    scheme = parts.scheme.lower()
    if scheme not in ("http", "https"):
        return None
    host = parts.hostname
    if not host:
        return None
    host = host.rstrip(".").lower()
    netloc = host
    try:
        port = parts.port
    except ValueError:
        return None
    if port is not None and f":{port}" != _DEFAULT_PORTS.get(scheme):
        netloc = f"{host}:{port}"
    path = parts.path or "/"
    # collapse duplicate slashes, resolve dot-segments cheaply
    while "//" in path:
        path = path.replace("//", "/")
    query = ""
    if parts.query:
        query = urlencode(sorted(parse_qsl(parts.query, keep_blank_values=True)))
    return urlunsplit((scheme, netloc, path, query, ""))  # fragment dropped


@F.pandas_udf(StringType())
def canonicalize_url(url: pd.Series) -> pd.Series:
    """Vectorized canonicalizer: lowercase scheme/host, strip default ports
    and fragments, sort query params, collapse path slashes. Null out
    unparseable / non-http(s) URLs (the reference drops these).

    Fast path: rows that are already plain lowercase, query-free and
    fragment-free http(s) URLs skip Python parsing entirely (pandas str ops
    on the whole Arrow batch); only the remainder pays ``urlsplit``.
    """
    s = url.astype("string")
    # provably-canonical shape: lowercase scheme + dotted lowercase host
    # (no trailing dot, no port), non-empty path segments, no query/fragment/
    # percent-escapes. Matching rows are returned untouched.
    simple = s.str.match(
        r"^https?://[a-z0-9\-]+(\.[a-z0-9\-]+)+/(?:[a-z0-9._~\-]+/)*[a-z0-9._~\-]*$",
        na=False,
    )
    out = s.where(simple, s.map(lambda u: _canon_one(u) if isinstance(u, str) else None))
    return out.astype(object).where(out.notna(), None)


def compile_filter_chain(patterns: list[str]) -> Column:
    """Build the reference's ordered URL filter chain as ONE fused predicate.

    Semantics (schema/FilterFieldMapper.java:50-56 + ChainedFieldMapper.java:32-38):
    each rule blanks the value if its regex FINDS a match; rules don't
    interact, so the chain is equivalent to a single alternation. Plus the
    length cap from url_mappings.json:98-105 and non-null. Returns a
    predicate builder: ``ok(url_col) -> BooleanColumn`` (True = keep).
    """
    fused = "|".join(f"(?:{p})" for p in patterns) if patterns else None

    def ok(c: Column) -> Column:
        cond = c.isNotNull() & (F.length(c) < MAX_URL_LEN)
        if fused:
            cond = cond & ~c.rlike(fused)
        return cond

    return ok


# Default chain: structural rules only (the reference ships wiki-harvest
# specific domain blocklists in url_mappings.json; those are config, not
# engine). Engine-level defaults keep the length cap + obvious non-fetchables.
DEFAULT_FILTER_PATTERNS: list[str] = [
    r"(?i)^https?://localhost[/:]",
    r"(?i)^https?://(127\.0\.0\.1|0\.0\.0\.0|\[?::1\]?)[/:]",
]

url_filter_ok = compile_filter_chain(DEFAULT_FILTER_PATTERNS)
