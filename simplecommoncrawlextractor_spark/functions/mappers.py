"""The JSON-configured field-mapper chain (schema/FieldMapper.java:37-120,
ChainedFieldMapper, FilterFieldMapper, CaptureFieldMapper,
IdentityFieldMapper) as Column-expression builders.

The reference applies an ordered list of mappers to each value; a filter
mapper blanks the value on regex FIND, a capture mapper rebuilds the value
from a ``$N`` template over the FIRST match (CaptureFieldMapper.java:62-76
— note: the output is the substituted template, not a within-string
replacement), and the identity mapper trims + compresses blank-line runs
(IdentityFieldMapper.java:49-77).
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

# Java's MULTI_NEW_LINES (IdentityFieldMapper.java:31) — Spark compiles
# Java regex, so the pattern ports verbatim.
MULTI_NEW_LINES = r"(\r\n|[\n\r]+)(?: *)(?:(?:\r\n|[\n\r])+\s*)+"

_GROUP_RE = re.compile(r"\$(\d+)")


def identity_field_mapper(
    c: Column | str,
    trim: bool = True,
    compress_newlines: bool = True,
) -> Column:
    """Parity: IdentityFieldMapper.map (:49-71). null filtering
    (filterNull) is the caller's ``.filter(col.isNotNull())``."""
    c = F.col(c) if isinstance(c, str) else c
    if trim:
        c = F.regexp_replace(c, r"^[\x00-\x20]+|[\x00-\x20]+$", "")  # Java trim
    if compress_newlines:
        c = F.regexp_replace(c, MULTI_NEW_LINES, "\n\n")
    return c


def capture_field_mapper(
    c: Column | str,
    find: str,
    replace: str,
    fail_policy: str = "SKIP_FIELD",
) -> Column:
    """Parity: CaptureFieldMapper.map (:62-83).

    On regex FIND: the result is the ``replace`` template with each ``$N``
    substituted by group N of the first match. On miss: SKIP_FIELD → null,
    STORE_AS_IS → original (EXCEPTION is a config-validation policy — it
    has no relational meaning, callers should pre-validate; we map it to
    null + a comment in the plan rather than a per-row throw)."""
    c = F.col(c) if isinstance(c, str) else c
    parts: list[Column] = []
    last = 0
    for m in _GROUP_RE.finditer(replace):
        if m.start() > last:
            parts.append(F.lit(replace[last : m.start()]))
        parts.append(F.regexp_extract(c, find, int(m.group(1))))
        last = m.end()
    if last < len(replace):
        parts.append(F.lit(replace[last:]))
    built = F.concat(*parts) if parts else F.lit("")
    hit = c.isNotNull() & c.rlike(find)
    if fail_policy == "STORE_AS_IS":
        return F.when(hit, built).otherwise(c)
    return F.when(hit, built).otherwise(F.lit(None).cast("string"))


def filter_field_mapper(c: Column | str, find: str) -> Column:
    """Parity: FilterFieldMapper (:50-56) — regex FIND blanks the value."""
    c = F.col(c) if isinstance(c, str) else c
    return F.when(c.rlike(find), F.lit(None).cast("string")).otherwise(c)
