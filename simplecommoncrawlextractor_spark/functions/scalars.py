"""Scalar functions with exact reference parity, as JVM-side Column expressions.

Every function cites the reference implementation it matches
(paths relative to /root/reference/cc-extractor/src/main/java/org/tallison/).
These stay inside whole-stage codegen — no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def normalize_mime(c: Column | str) -> Column:
    """Parity: cc/index/CCIndexRecord.java:98-106 (normalizeMime).

    lowercase (EN) → strip one leading and one trailing double-quote →
    collapse whitespace runs to a single space → trim. null → null
    (callers map null → "NULL" at the aggregation site).
    """
    c = _col(c)
    out = F.lower(c)
    out = F.regexp_replace(out, '^"|"$', "")
    out = F.regexp_replace(out, r"\s+", " ")
    return F.trim(out)


def get_tld(c: Column | str) -> Column:
    """Parity: cc/index/CCIndexRecord.java:118-147 (getTLD).

    URI host → substring after last '.'; '' when: url null, no host,
    host has no '.', trailing dot, all-digit tld, or unparseable URI.
    """
    c = _col(c)
    host = F.parse_url(c, F.lit("HOST"))
    last = F.substring_index(host, ".", -1)
    return (
        F.when(c.isNull() | host.isNull() | (host == ""), F.lit(""))
        .when(~host.contains("."), F.lit(""))
        .when(host.endswith("."), F.lit(""))
        .when(last.rlike(r"^\d+$"), F.lit(""))
        .otherwise(last)
    )


def url_ext_index(c: Column | str) -> Column:
    """Parity: cc/index/mappers/AbstractRecordProcessor.java:38-55 (getExtension).

    Substring after the LAST '.'; null when: url null/empty, no '.',
    more than 5 chars after the dot (``i+6 < len``), or the trimmed
    candidate is all digits (checked BEFORE the trailing-'/' strip, so
    '123/' survives as '123' while '123' is dropped — reference quirk kept).
    Then trim → lowercase → strip one trailing '/'.
    """
    c = _col(c)
    raw = F.regexp_extract(c, r"\.([^.]*)$", 1)
    t = F.regexp_replace(raw, r"^[\x00-\x20]+|[\x00-\x20]+$", "")  # Java trim
    bad = (
        c.isNull()
        | (F.length(c) == 0)
        | ~c.contains(".")
        | (F.length(raw) > 5)
        | t.rlike(r"^\d+$")
    )
    ext = F.regexp_replace(F.lower(t), "/$", "")
    return F.when(bad, F.lit(None).cast("string")).otherwise(ext)


def url_ext_warc(c: Column | str) -> Column:
    """Intended semantics of cc/warc/AbstractExtractor.java:167-195 (getExtension).

    Reference quirk (documented, NOT replicated): the Java method computes the
    last ``(?i)\\.([a-z0-9]{1,8})(\\Z|[ ?])`` match on the URL file part but
    then returns the literal string ".ext" for everything except "htm"
    (AbstractExtractor.java:193-195 discards ``ext``). We return the matched
    extension ('.pdf'), '.html' for 'htm', and null when nothing matches —
    the behavior the surrounding cascade (pickExtension :129-154) expects.
    Query strings are cut before matching (:181-184).
    """
    c = _col(c)
    path = F.coalesce(F.parse_url(c, F.lit("PATH")), c)
    no_q = F.substring_index(path, "?", 1)
    # last match wins: anchor the pattern to the end after stripping queries
    ext = F.lower(F.regexp_extract(no_q, r"(?i)\.([a-z0-9]{1,8})$", 1))
    ext = F.when(ext == "htm", F.lit("html")).otherwise(ext)
    return F.when(ext == "", F.lit(None).cast("string")).otherwise(
        F.concat(F.lit("."), ext)
    )


def clean_tsv(c: Column | str) -> Column:
    """Parity: cc/index/mappers/AbstractRecordProcessor.java:58-63 (clean).

    null → '' ; trim ; every remaining ``[\\r\\n\\t]`` → one space.
    Java's ``String.trim`` strips all chars ≤ 0x20 (not just spaces), so we
    trim with a regex rather than Spark's space-only ``F.trim``.
    """
    c = _col(c)
    trimmed = F.regexp_replace(c, r"^[\x00-\x20]+|[\x00-\x20]+$", "")
    return F.coalesce(F.regexp_replace(trimmed, "[\r\n\t]", " "), F.lit(""))


def clean_csv(c: Column | str) -> Column:
    """Parity: cc/CCGetter.java:316-332 (clean) — the reference's only
    unit-tested function (test/org/tallison/cc/TestCCGetter.java:11-15).

    null → '' ; strip ONE leading and ONE trailing '"' ; if any '"' remains,
    double them and wrap the whole value in quotes ; all whitespace → ' '.
    """
    c = _col(c)
    s = F.regexp_replace(_col(c), '^"', "")
    s = F.regexp_replace(s, '"$', "")
    s = F.when(
        s.contains('"'),
        F.concat(F.lit('"'), F.regexp_replace(s, '"', '""'), F.lit('"')),
    ).otherwise(s)
    return F.coalesce(F.regexp_replace(s, r"\s", " "), F.lit(""))


def first_lang(c: Column | str) -> Column:
    """Parity: cc/index/mappers/CountCharsetAndLangByTopLevelDomains.java:87-96.

    First element of the comma-joined languages string; null/blank → 'NULL'.
    """
    c = _col(c)
    head = F.split(c, ",").getItem(0)
    return F.when(c.isNull() | (F.trim(c) == ""), F.lit("NULL")).otherwise(head)


def offset_header(offset: Column | str, length: Column | str) -> Column:
    """Parity: cc/index/CCIndexRecord.java:109-111 (getOffsetHeader) —
    the HTTP Range header for the ranged S3 fetch (cc/CCGetter.java:171)."""
    o, ln = _col(offset), _col(length)
    return F.concat(F.lit("bytes="), o.cast("string"), F.lit("-"), (o + ln - 1).cast("string"))


def pick_extension(
    url_ext: Column | str,
    header_mime_ext: Column | str,
    detected_mime_ext: Column | str,
) -> Column:
    """Parity (intended): cc/warc/AbstractExtractor.java:129-154 (pickExtension).

    detected-mime ext ▸ header-mime ext ▸ url ext ▸ '.unk'. The reference
    has an NPE-prone null check at :133 (tests detectedMediaType instead of
    httpMediaType); we implement the evident intent as a coalesce cascade.
    """
    return F.coalesce(
        _col(detected_mime_ext), _col(header_mime_ext), _col(url_ext), F.lit(".unk")
    )
