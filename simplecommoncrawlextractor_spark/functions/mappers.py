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


# --- JSON config loader (schema/FieldMapper.java:37-120) ---------------------

def load_field_mapper_config(config: dict) -> dict[str, list[dict]]:
    """Parse the reference's ``url_mappings.json`` shape into per-field
    ordered rule lists (FieldMapper.load parity: a mapping with a
    ``capture`` object builds a capture mapper, else ``filter`` builds a
    filter mapper, else identity; rules apply in file order under the
    field named by ``f``). fail_policy strings map as the reference does:
    'skip'→SKIP_FIELD, 'store_as_is'→STORE_AS_IS.

    ``ignore_case`` is validated exactly as the reference validates it
    (FieldMapper.java:85-101 throws unless it is the string 'true' or
    'false') and then, exactly like the reference, NOT applied to pattern
    matching — FieldMapper stores the flag but compiles every Pattern
    case-sensitively and getIgnoreCase has no matcher callers; configs
    wanting case-insensitivity embed ``(?i)`` in the pattern, as
    url_mappings.json's first rule does."""
    root = config.get("field_mapper", config)
    if "ignore_case" in root or "field_mapper" in config:
        ic = str(root.get("ignore_case", "")).lower()
        if ic not in ("true", "false"):
            raise ValueError(
                "ignore_case must have a value of 'true' or 'false'"
            )
    fields: dict[str, list[dict]] = {}
    for m in root.get("mappings", []):
        frm = m["f"]
        if "capture" in m:
            cap = m["capture"]
            policy = cap.get("fail_policy", "skip").lower()
            rule = {
                "kind": "capture",
                "find": cap["find"],
                "replace": cap["replace"],
                "fail_policy": "STORE_AS_IS" if policy == "store_as_is" else "SKIP_FIELD",
            }
        elif "filter" in m:
            rule = {"kind": "filter", "find": m["filter"]["find"]}
        else:
            rule = {"kind": "identity"}
        fields.setdefault(frm, []).append(rule)
    return fields


def load_field_mapper_json(path: str) -> dict[str, list[dict]]:
    import json

    with open(path, encoding="utf-8") as f:
        return load_field_mapper_config(json.load(f))


def apply_mapper_chain(c: Column | str, rules: list[dict]) -> Column:
    """Apply an ordered rule list (from load_field_mapper_config) to a
    column — the relational ChainedFieldMapper. A filter rule that fires
    nulls the value; later rules keep it null (the reference's mapper
    array collapses to empty)."""
    c = F.col(c) if isinstance(c, str) else c
    for r in rules:
        c = _rule_expr(c, r)
    return c


# Java's `new URI(s)` syntax gate, approximated: no whitespace or the RFC
# 3986-excluded delimiters, and every % begins a two-hex-digit escape
# (URLUtil.java:42-47 returns "" on URISyntaxException).
_URI_VALID_RE = r'^(?:%[0-9A-Fa-f]{2}|[^%\s<>"{}|\\^`])+$'


def uri_valid(c: Column | str) -> Column:
    c = F.col(c) if isinstance(c, str) else c
    return c.isNotNull() & c.rlike(_URI_VALID_RE)


def url_util_clean(c: Column | str, rules: list[dict]) -> Column:
    """URLUtil.clean (URLUtil.java:35-49): apply the ``input_url`` mapper
    chain, then blank anything that fails the URI syntax gate.

    NOTE: as a single Column expression, every rule that references its
    input twice (all of them) DOUBLES the expression tree, and predicate
    pushdown re-inlines the whole thing — exponential in rule count. For
    chains longer than a rule or two, use apply_mapper_chain_staged on a
    DataFrame column instead; this form exists for expression-context
    callers (tests, single-rule mappers)."""
    c = apply_mapper_chain(c, rules)
    return F.when(uri_valid(c), c).otherwise(F.lit(None).cast("string"))


def _rule_expr(c: Column, r: dict) -> Column:
    if r["kind"] == "filter":
        return filter_field_mapper(c, r["find"])
    if r["kind"] == "capture":
        return F.when(c.isNull(), F.lit(None).cast("string")).otherwise(
            capture_field_mapper(c, r["find"], r["replace"], r["fail_policy"])
        )
    return identity_field_mapper(c)


def apply_mapper_chain_staged(df, col: str, rules: list[dict]):
    """The scale-safe ChainedFieldMapper: one PROJECTION per rule over the
    named column. Each stage's input is a plain attribute, so the rule
    expression references cheap attrs only; CollapseProject keeps stages
    separate (a non-cheap alias referenced more than once is never
    re-inlined), which makes the chain's work LINEAR in rule count — the
    single-expression form doubles per rule (url_mappings.json has 14:
    2^14 regex evaluations per row vs 14). Same semantics as
    apply_mapper_chain, golden-tested against it."""
    for r in rules:
        df = df.withColumn(col, _rule_expr(F.col(col), r))
    return df
