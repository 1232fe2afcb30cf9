"""S9: Wikipedia ``externallinks`` SQL-dump outlink scan.

The reference streams a gzipped mysqldump byte-by-byte
(wikilinks/ExternalLinkExtractor.java:50-183): skip to the first
``VALUES``, then for each parenthesized tuple capture column 3 (the
``el_to`` URL) — single-quoted cells honor backslash escapes (the byte
AFTER a backslash is emitted verbatim, so ``\\'`` → ``'`` and ``\\n`` →
literal ``n``), commas/parens inside quotes don't terminate, and every
other column's bytes are discarded. Captured URLs get ``http:`` prepended
when protocol-relative, whitespace runs collapsed to one space
(:142-145), the ``url_mappings.json`` input_url mapper chain + URI gate
(URLUtil.clean), and emit as (host, url) where host comes from
``new URI(...).getHost()`` or '' (:146-157).

Spark-first: ``spark.read.text`` splits the dump into lines (mysqldump
emits one self-contained INSERT statement per line, so tuples never span
Spark rows — the one structural difference from the byte stream, which
would tolerate a mid-tuple newline); the scanner runs per line as an
Arrow-batched pandas UDF operating on characters (equivalent to the
reference's byte machine for the ASCII metacharacters it switches on).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType

from ..functions.mappers import url_util_clean

URL_COLUMN = 3  # el_to in the externallinks schema (ExternalLinkExtractor.java:127)


def _lex_values_line(s: str, url_col: int = URL_COLUMN) -> list[str]:
    """One INSERT line → the captured url-column value of every tuple.
    Mirrors readToVALUES/readRecord/readToSquote exactly: only the capture
    column's characters are buffered; a backslash escape emits the NEXT
    character verbatim; a close paren or top-level comma ends the cell."""
    out: list[str] = []
    start = s.find("VALUES")
    if start < 0:
        return out
    i = start + 6
    n = len(s)
    while i < n:
        if s[i] != "(":
            i += 1
            continue
        i += 1
        col = 0
        buf: list[str] = []
        while i < n:
            ch = s[i]
            if ch == "'":
                i += 1
                while i < n:
                    q = s[i]
                    if q == "\\":
                        if i + 1 < n and col == url_col:
                            buf.append(s[i + 1])
                        i += 2
                    elif q == "'":
                        i += 1
                        break
                    else:
                        if col == url_col:
                            buf.append(q)
                        i += 1
            elif ch == ")":
                if col == url_col:
                    out.append("".join(buf))
                i += 1
                break
            elif ch == ",":
                if col == url_col:
                    out.append("".join(buf))
                buf = []
                col += 1
                i += 1
            else:
                if col == url_col:
                    buf.append(ch)
                i += 1
    return out


@F.pandas_udf(ArrayType(StringType()))
def lex_externallinks(lines: pd.Series) -> pd.Series:
    return lines.map(lambda s: _lex_values_line(s) if isinstance(s, str) else [])


def parse_externallinks_dump(lines: DataFrame, value_col: str = "value") -> DataFrame:
    """text lines → one row per tuple's raw captured URL."""
    return lines.select(
        F.explode(lex_externallinks(F.col(value_col))).alias("raw_url")
    )


def wiki_external_links(
    lines: DataFrame,
    mapper_rules: list[dict] | None = None,
    value_col: str = "value",
) -> DataFrame:
    """The full S9 stage: lex → http:-prefix protocol-relative → collapse
    whitespace → URLUtil.clean (mapper chain + URI gate) → non-blank →
    (host, url). Host parses as Java URI.getHost does for the common case:
    authority up to the first '/', ':' or end; '' when unparseable."""
    raw = parse_externallinks_dump(lines, value_col)
    url = F.when(
        F.col("raw_url").startswith("//"),
        F.concat(F.lit("http:"), F.col("raw_url")),
    ).otherwise(F.col("raw_url"))
    url = F.regexp_replace(url, r"\s+", " ")
    cleaned = url_util_clean(url, mapper_rules or [])
    kept = raw.select(cleaned.alias("url")).filter(
        F.col("url").isNotNull() & (F.trim(F.col("url")) != "")
    )
    # Java URI.getHost() drops the userinfo@ part of the authority and the
    # :port (ExternalLinkExtractor.java:148-151) — the optional [^@/]*@
    # group mirrors that for the common cases (userinfo may carry ':pw';
    # a '/' before the '@' means the '@' belongs to the path, not
    # userinfo, and must not be stripped)
    host = F.regexp_extract(
        F.col("url"), r"^[A-Za-z][A-Za-z0-9+.\-]*://(?:[^@/]*@)?([^/:?#]+)", 1
    )
    return kept.select(host.alias("host"), F.col("url"))
