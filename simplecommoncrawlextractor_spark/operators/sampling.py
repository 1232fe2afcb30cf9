"""Stratified down-sampling (F10/F11, SURVEY §2.3).

Reference: cc/index/mappers/DownSample.java:175-290 — per-mime or
per-(tld,mime) Bernoulli rates from a TSV table; exact keys first, then
``/regex/`` keys; tld falls back to ANY_TLD; rate >= 1.0 always keeps;
selection uses an UNSEEDED java.util.Random (:67) — irreproducible. We pin
seeds (F.rand(seed)) and additionally provide a fully deterministic
key-derived variant (keyed on a stable id column) that the DuckDB oracle
can replay exactly.

The lang/charset variant (DownSampleLangCharset.java:129-168) keys on
(firstLang, charset) and only considers html/text mimes.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ANY_TLD = "ANY_TLD"


def resolve_rate(
    key_col: Column,
    rates: dict[str, float],
    default: float | None = 0.0,
) -> Column:
    """Per-row sampling rate: exact keys via a literal map lookup, then
    ``/regex/`` keys in insertion order (DownSample.java:236-240), then
    ``default``. All JVM-side (create_map + rlike chain) — the reference's
    memoized miss-set (:263-287) is unnecessary at vector granularity."""
    exact = {k: v for k, v in rates.items() if not (k.startswith("/") and k.endswith("/"))}
    regexes = [
        (k[1:-1], v) for k, v in rates.items() if k.startswith("/") and k.endswith("/")
    ]
    expr = None
    if exact:
        pairs = []
        for k, v in exact.items():
            pairs.extend([F.lit(k), F.lit(float(v))])
        expr = F.create_map(*pairs)[key_col]
    out = expr if expr is not None else F.lit(None).cast("double")
    for pat, v in regexes:
        re.compile(pat)  # fail fast on bad config
        out = F.coalesce(out, F.when(key_col.rlike(pat), F.lit(float(v))))
    if default is None:
        return out  # nullable: caller chains its own fallback (ANY_TLD)
    return F.coalesce(out, F.lit(float(default)))


def stratified_sample(
    df: DataFrame,
    rates: dict[str, float],
    key_col: Column | str,
    seed: int = 42,
    default: float = 0.0,
) -> DataFrame:
    """Seeded Bernoulli stratified sample: keep row iff rand(seed) < rate.
    rate >= 1.0 always keeps (DownSample.java:224-232 semantics)."""
    key = F.col(key_col) if isinstance(key_col, str) else key_col
    rate = resolve_rate(key, rates, default)
    return df.filter((rate >= 1.0) | (F.rand(seed) < rate))


def deterministic_sample(
    df: DataFrame,
    rates: dict[str, float],
    key_col: Column | str,
    id_col: Column | str,
    default: float = 0.0,
) -> DataFrame:
    """Oracle-replayable variant: keep iff pmod(id, 1000) < rate*1000.
    Same selectivity, zero randomness — used by the correctness gate; the
    seeded variant is the production path."""
    key = F.col(key_col) if isinstance(key_col, str) else key_col
    idc = F.col(id_col) if isinstance(id_col, str) else id_col
    rate = resolve_rate(key, rates, default)
    return df.filter((rate >= 1.0) | (F.pmod(idc, F.lit(1000)) < rate * 1000))


def tld_mime_rate(
    tld_col: Column,
    mime_col: Column,
    table: dict[str, dict[str, float]],
    default: float = 0.0,
) -> Column:
    """3-col variant (tld → mime → rate) with ANY_TLD fallback
    (DownSample.java:203-219). Exact TLD entries are always consulted
    BEFORE the ANY_TLD entry regardless of dict insertion order — the
    reference checks the exact TLD first and falls back only on miss."""
    out = F.lit(None).cast("double")
    specific = [(t, m) for t, m in table.items() if t != ANY_TLD]
    ordered = specific + [(ANY_TLD, table[ANY_TLD])] if ANY_TLD in table else specific
    for tld, mimes in ordered:
        rate = resolve_rate(mime_col, mimes, default=None)  # type: ignore[arg-type]
        cond = F.lit(True) if tld == ANY_TLD else (tld_col == tld)
        out = F.coalesce(out, F.when(cond, rate))
    return F.coalesce(out, F.lit(float(default)))


def sample_tally(df: DataFrame, selected: Column) -> DataFrame:
    """A12: (selected, total) tally printed at mapper close
    (DownSample.java:70-71,193-199)."""
    return df.agg(
        F.sum(selected.cast("long")).alias("selected"),
        F.count("*").alias("total"),
    )
