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

    Vectorized: each distinct token is FNV-hashed ONCE per Arrow batch
    (memoized), window hashes are a sliding-window × powers-of-B dot
    product in uint64. Natural uint64 wraparound is congruent mod 2^63 to
    the reference per-step (h*B + t) & MASK loop — masking between steps
    only perturbs bits ≥ 63, and the final & MASK projects both to the
    same value — so outputs are bit-identical to the scalar definition
    (pinned by goldens in tests/test_textstats.py)."""
    import numpy as np

    B, MASK, W = 1000003, (1 << 63) - 1, 8
    powers = np.array(
        [pow(B, W - 1 - k, 1 << 64) for k in range(W)], dtype=np.uint64
    )

    def hash_str(s: str) -> int:
        h = 1469598103934665603
        for ch in s.encode("utf-8"):
            h = ((h ^ ch) * 1099511628211) & ((1 << 64) - 1)
        return h & ((1 << 62) - 1)

    # whole-batch vectorization: tokenize with pandas, factorize ALL batch
    # tokens at once (each distinct token FNV-hashed exactly once), build
    # one concatenated uint64 hash array with short docs padded to W, run a
    # single strided sliding-window × powers pass over it, and XOR-reduce
    # per doc with reduceat. Per-doc python is gone entirely.
    s = text.fillna("")
    tok_lists = s.str.lower().str.split()
    lens = tok_lists.map(len).to_numpy(dtype=np.int64)
    pad_lens = np.maximum(lens, W)
    # ONLY empty/null docs emit nothing (the scalar guard is `not t`);
    # whitespace-only docs tokenize to zero tokens but still pad to W
    # empty tokens and hash — zeroing on lens==0 would merge them with
    # empty docs and diverge from the scalar definition
    pad_lens[(s == "").to_numpy()] = 0
    flat: list[str] = []
    for toks, ln, pln in zip(tok_lists, lens, pad_lens):
        if pln == 0:
            continue
        flat.extend(toks)
        if pln > ln:
            flat.extend([""] * (pln - ln))
    if not flat:
        return pd.Series(np.zeros(len(s), dtype=np.int64), index=s.index)
    codes, uniques = pd.factorize(np.asarray(flat, dtype=object))
    uniq_h = np.fromiter(
        (hash_str(u) for u in uniques), dtype=np.uint64, count=len(uniques)
    )
    th = uniq_h[codes]
    # all window polynomial sums in one shot (wraparound uint64 ≡ mod 2^63
    # after the final mask): W shifted contiguous multiply-adds — NOT a
    # sliding_window_view reduce, whose non-contiguous uint64 sum falls off
    # numpy's fast path (~100× slower)
    m = len(th) - W + 1
    allh = np.zeros(m, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for k in range(W):
            allh += powers[k] * th[k : k + m]
    # windows crossing doc boundaries are discarded via per-doc offsets
    starts = np.concatenate(([0], np.cumsum(pad_lens)[:-1]))
    n_wins = np.where(pad_lens > 0, pad_lens - W + 1, 0)
    out = np.zeros(len(s), dtype=np.uint64)
    nz = np.nonzero(n_wins > 0)[0]
    # per-doc XOR over its window slice (windows are indexed by start
    # position, so doc i's valid windows are allh[starts[i] : starts[i] +
    # n_wins[i]] — the W-1 cross-boundary windows after them are skipped);
    # one C-level reduce per doc, negligible next to the strided pass
    for i in nz:
        st = starts[i]
        out[i] = np.bitwise_xor.reduce(allh[st : st + n_wins[i]])
    return pd.Series((out & np.uint64(MASK)).astype(np.int64), index=s.index)
