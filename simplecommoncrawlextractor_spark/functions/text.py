"""Text-analysis functions for the training-data pipeline surface:
language-ID, quality scoring, token counting, document fingerprinting.

These are additions beyond the reference (it treats payloads as opaque
bytes); they run over the ``documents`` table. Everything here is either a
JVM-side Column expression or an Arrow-batched pandas UDF.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

_BPE_ISH_TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

# tiny per-language stopword profiles for the n-gram/stopword heuristic
_LANG_PROFILES: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "to", "is"],
    "de": ["der", "die", "und", "das", "ist", "ein"],
    "fr": ["le", "la", "et", "les", "des", "est"],
    "es": ["el", "la", "los", "que", "es", "una"],
}


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def token_count(c: Column | str, mode: str = "whitespace") -> Column:
    """Token count: 'whitespace' split or 'bpe' (letter-runs / digit-runs /
    single punctuation — a BPE-ish pre-tokenizer regex)."""
    c = _col(c)
    if mode == "whitespace":
        trimmed = F.trim(c)
        return F.when(trimmed == "", F.lit(0)).otherwise(
            F.size(F.split(trimmed, r"\s+"))
        ).cast("bigint")
    return F.regexp_count(c, F.lit(_BPE_ISH_TOKEN_RE)).cast("bigint")


def quality_stats(c: Column | str, stopwords: list[str] | None = None) -> dict[str, Column]:
    """Quality-score component columns: char length, token count, mean token
    length ×1000 (int, to stay hash-stable), punctuation count, stopword count.
    Compose a score downstream; components stay integer/deterministic."""
    c = _col(c)
    toks = token_count(c)
    sw = stopwords or _LANG_PROFILES["en"]
    sw_re = r"(?i)\b(?:" + "|".join(sw) + r")\b"
    n_chars = F.length(c).cast("bigint")
    return {
        "n_chars": n_chars,
        "n_tokens": toks,
        "mean_tok_len_x1000": F.when(toks > 0, (n_chars * 1000 / toks).cast("bigint")).otherwise(F.lit(0)),
        "n_punct": F.regexp_count(c, F.lit(r"[^\w\s]")).cast("bigint"),
        "n_stopwords": F.regexp_count(c, F.lit(sw_re)).cast("bigint"),
    }


def lang_id(c: Column | str) -> Column:
    """Stopword-profile language-ID heuristic (column-expression only):
    score each profile by stopword hits, take the argmax, 'und' when no
    profile scores > 0. Deterministic, JVM-side."""
    c = _col(c)
    scores = []
    for lang, words in _LANG_PROFILES.items():
        pat = r"(?i)\b(?:" + "|".join(words) + r")\b"
        scores.append(
            F.struct(
                F.regexp_count(c, F.lit(pat)).alias("score"),
                F.lit(lang).alias("lang"),
            )
        )
    # array_max on struct orders by (score, lang) — ties break to the
    # lexicographically largest lang; deterministic either way.
    best = F.array_max(F.array(*scores))
    return F.when(best["score"] > 0, best["lang"]).otherwise(F.lit("und"))


def doc_fingerprint(c: Column | str) -> Column:
    """Content fingerprint: md5 of the whitespace-normalized, lowercased
    text — the exact-dedup key (cheap, portable, dictionary-friendly)."""
    c = _col(c)
    return F.md5(F.trim(F.regexp_replace(F.lower(c), r"\s+", " ")))


@F.pandas_udf(LongType())
def rolling_fingerprint(text: pd.Series) -> pd.Series:
    """64-bit Karp-Rabin rolling-hash fingerprint: XOR of polynomial hashes
    of all 8-token windows — robust to token reordering outside windows.
    Arrow-batched; numpy-free simple loop per doc over pre-split tokens."""
    B, MASK, W = 1000003, (1 << 63) - 1, 8

    def one(t):
        if not isinstance(t, str) or not t:
            return 0
        toks = t.lower().split()
        if len(toks) < W:
            toks = toks + [""] * (W - len(toks))
        out = 0
        for i in range(len(toks) - W + 1):
            h = 0
            for tok in toks[i : i + W]:
                h = (h * B + hash_str(tok)) & MASK
            out ^= h
        return out

    def hash_str(s: str) -> int:
        h = 1469598103934665603
        for ch in s.encode("utf-8"):
            h = ((h ^ ch) * 1099511628211) & ((1 << 64) - 1)
        return h & ((1 << 62) - 1)

    return text.map(one).astype("int64")
