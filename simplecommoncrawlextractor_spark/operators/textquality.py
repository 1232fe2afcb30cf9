"""Repetition / boilerplate quality signals and sub-document dedup.

Training-data additions beyond the reference (it treats payloads as opaque
bytes — cc/warc/Extractor.java:110-139 only sniffs them): the
repetition-fraction family of quality filters (the Gopher/MassiveText
heuristics: duplicate-token fraction, top n-gram fraction) and
paragraph/segment-level exact dedup, the sub-document sibling of
``dedup.exact_duplicate_groups``.

Scale notes: every statistic is computed by explode → hash-partitioned
groupBy with map-side partial aggregation — never a per-document O(L²)
array scan, so a pathological 10^6-token document costs O(L) work spread
across tasks, and a boilerplate segment duplicated across 10^8 documents
collapses to one row per partition in the partial agg before it shuffles.
All ratios are emitted as exact integer basis points ((10000*x) div y) so
results are hash-stable and bit-replayable in any ANSI engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_WS = r"\s+"


def repetition_report(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document repetition statistics (word level):

    - n_tokens, n_distinct
    - dup_token_bp:   10000·(n_tokens − n_distinct) div n_tokens
    - top_unigram_bp: 10000·(count of the most frequent token) div n_tokens
    - top_bigram_bp:  10000·(count of the most frequent adjacent pair)
                      div (n_tokens − 1); 0 when the doc has < 2 tokens
    - dup_bigram_bp:  10000·(bigram occurrences whose pair occurs more
                      than once) div (n_tokens − 1)

    A high dup/top fraction marks boilerplate and degenerate generations —
    the MassiveText repetition gates. Integer basis points, ties need no
    break (counts only). Documents with zero tokens have no statistics and
    are absent from the report (filter them with the length gates first).
    """
    # tokenize ONCE: unigrams and adjacent pairs (zip_with over the same
    # split array — no window/lead shuffle) are tagged and exploded as one
    # gram stream, so the text is scanned/split a single time and both
    # count families share one (id, kind, gram) shuffle with map-side
    # partial aggregation
    words = F.filter(F.split(F.col(text_col), _WS), lambda x: x != "")
    n = F.size(words)
    bigrams = F.when(
        n >= 2,
        F.zip_with(
            F.slice(words, F.lit(1), (n - 1)),
            F.slice(words, F.lit(2), (n - 1)),
            lambda a, b: F.concat_ws(" ", a, b),
        ),
    ).otherwise(F.array().cast("array<string>"))
    tag = lambda k: lambda g: F.struct(F.lit(k).alias("k"), g.alias("g"))  # noqa: E731
    grams = F.concat(F.transform(words, tag("u")), F.transform(bigrams, tag("b")))
    cnt = (
        docs.select(id_col, F.explode(grams).alias("x"))
        .groupBy(id_col, F.col("x.k").alias("k"), F.col("x.g").alias("g"))
        .agg(F.count("*").alias("c"))
    )
    is_u, is_b = F.col("k") == "u", F.col("k") == "b"
    out = cnt.groupBy(id_col).agg(
        F.sum(F.when(is_u, F.col("c")).otherwise(F.lit(0))).alias("n_tokens"),
        F.sum(F.when(is_u, F.lit(1)).otherwise(F.lit(0))).alias("n_distinct"),
        F.max(F.when(is_u, F.col("c"))).alias("top_uni"),
        F.max(F.when(is_b, F.col("c"))).alias("top_bi"),
        F.sum(
            F.when(is_b & (F.col("c") > 1), F.col("c")).otherwise(F.lit(0))
        ).alias("dup_bi"),
    )
    bp = lambda num, den: F.expr(f"(10000 * {num}) div {den}")  # noqa: E731
    return out.select(
        id_col,
        F.col("n_tokens"),
        F.col("n_distinct"),
        bp("(n_tokens - n_distinct)", "n_tokens").alias("dup_token_bp"),
        bp("top_uni", "n_tokens").alias("top_unigram_bp"),
        # single-token docs have no bigrams: guard the n_tokens-1 divisor
        # (ANSI mode turns div-by-zero into an error, not NULL)
        F.coalesce(
            F.when(F.col("n_tokens") > 1, bp("top_bi", "(n_tokens - 1)")), F.lit(0)
        ).alias("top_bigram_bp"),
        F.coalesce(
            F.when(F.col("n_tokens") > 1, bp("dup_bi", "(n_tokens - 1)")), F.lit(0)
        ).alias("dup_bigram_bp"),
    )


def _segments(
    docs: DataFrame, sep: str, text_col: str, id_col: str
) -> DataFrame:
    """(id, seg_pos, segment) rows; blank/whitespace-only segments dropped
    (they are formatting, not content — and a corpus-wide '' group would
    be the degenerate hot key)."""
    return (
        docs.select(
            id_col,
            F.posexplode(F.split(F.col(text_col), sep)).alias("seg_pos", "segment"),
        )
        .filter(F.trim(F.col("segment")) != "")
    )


def segment_duplicate_groups(
    docs: DataFrame,
    sep: str = r"\n\n",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact-duplicate groups at segment (paragraph) granularity: for every
    segment text occurring more than once corpus-wide, its occurrence count
    and the number of distinct documents carrying it. The segment itself is
    the group key (hash-partitioned groupBy; at 10^10 scale swap the key for
    xxhash64(segment) and keep one exemplar via min_by, same plan shape)."""
    segs = _segments(docs, sep, text_col, id_col)
    return (
        segs.groupBy("segment")
        .agg(
            F.count("*").alias("n_occurrences"),
            F.count_distinct(F.col(id_col)).alias("n_docs"),
        )
        .filter(F.col("n_occurrences") > 1)
    )


def remove_duplicate_segments(
    docs: DataFrame,
    sep: str = r"\n\n",
    join_sep: str = "\n\n",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Corpus-global segment dedup: every repeated segment keeps exactly ONE
    occurrence — the (min id, min position) one, a data-derived winner so
    any partitioning yields the same corpus — and documents are reassembled
    in original segment order (id, text); docs left with no segments keep
    an empty text.

    Plan: explode → min_by partial agg per segment (O(distinct) shuffle
    rows, so a 10^8-fold boilerplate segment is ONE row after the map-side
    combine) → semi-join winners back → collect_list over sorted structs.
    """
    segs = _segments(docs, sep, text_col, id_col)
    winner = F.struct(F.col(id_col).alias("i"), F.col("seg_pos").alias("p"))
    keep = (
        segs.groupBy("segment")
        .agg(F.min(winner).alias("w"))
        .select(
            F.col("w.i").alias(id_col), F.col("w.p").alias("seg_pos"), "segment"
        )
    )
    kept = segs.join(keep, [id_col, "seg_pos", "segment"], "left_semi")
    rebuilt = kept.groupBy(id_col).agg(
        F.concat_ws(
            join_sep,
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("seg_pos"), F.col("segment")))
                ),
                lambda s: s["segment"],
            ),
        ).alias(text_col)
    )
    return (
        docs.select(id_col)
        .join(rebuilt, id_col, "left")
        .select(id_col, F.coalesce(text_col, F.lit("")).alias(text_col))
    )


def duplicate_substring_spans(
    docs: DataFrame,
    n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact substring-duplication spans (the detection half of Lee et
    al. 2022, "Deduplicating Training Data Makes Language Models
    Better"): every maximal token range covered by ``n``-token windows
    whose exact text occurs more than once corpus-wide.

    Returns (id, span_start, span_end, n_windows) with token-index
    bounds inclusive; overlapping duplicated windows are merged into
    maximal spans (gaps-and-islands over window positions: a new island
    starts when the next duplicated window no longer overlaps the
    running one, i.e. position gap > n-1).

    Scale shape: tokenize once, one window-gram explode (O(tokens)
    rows), hash-partitioned groupBy on the gram with map-side combine —
    a 10^8-fold boilerplate gram is one row per partition before the
    shuffle — then a per-document window pass over only the duplicated
    positions. The gram TEXT is the key here (oracle-replayable); at
    10^10 docs swap the key for xxhash64(gram) exactly as
    ``segment_duplicate_groups`` prescribes, same plan."""
    from pyspark.sql.window import Window

    toks = F.filter(F.split(F.col(text_col), _WS), lambda x: x != "")
    nw = F.size(toks) - F.lit(n - 1)
    grams = F.transform(
        F.sequence(F.lit(1), nw),
        lambda i: F.struct(
            (i - 1).alias("pos"),
            F.concat_ws(" ", F.slice(toks, i, n)).alias("gram"),
        ),
    )
    g = (
        docs.select(id_col, F.explode(F.when(nw >= 1, grams)).alias("x"))
        .select(id_col, F.col("x.pos").alias("pos"), F.col("x.gram").alias("gram"))
    )
    dup = (
        g.groupBy("gram").agg(F.count("*").alias("__c"))
        .filter(F.col("__c") > 1)
        .select("gram")
    )
    hits = g.join(dup, "gram", "left_semi")
    w = Window.partitionBy(id_col).orderBy("pos")
    gap = F.col("pos") - F.lag("pos").over(w)
    island = F.sum(
        F.when(gap.isNull() | (gap > n - 1), F.lit(1)).otherwise(F.lit(0))
    ).over(w.rowsBetween(Window.unboundedPreceding, 0))
    spans = (
        hits.withColumn("__isl", island)
        .groupBy(id_col, "__isl")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + F.lit(n - 1)).alias("span_end"),
            F.count("*").alias("n_windows"),
        )
        .drop("__isl")
    )
    return spans.select(id_col, "span_start", "span_end", "n_windows")


def substring_dup_report(
    docs: DataFrame,
    n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document duplicated-substring coverage — the filterable gate
    signal built on ``duplicate_substring_spans``: (id, n_tokens,
    dup_tokens, dup_cov_bp) where dup_cov_bp = 10000·dup_tokens div
    n_tokens. Docs with no duplicated span report 0 (still present)."""
    toks = F.filter(F.split(F.col(text_col), _WS), lambda x: x != "")
    base = docs.select(id_col, F.size(toks).cast("long").alias("n_tokens"))
    spans = duplicate_substring_spans(docs, n, text_col, id_col)
    cov = spans.groupBy(id_col).agg(
        F.sum(F.col("span_end") - F.col("span_start") + 1).alias("dup_tokens")
    )
    return base.join(cov, id_col, "left").select(
        id_col,
        "n_tokens",
        F.coalesce("dup_tokens", F.lit(0)).alias("dup_tokens"),
        F.when(
            F.col("n_tokens") > 0,
            F.expr("(10000 * coalesce(dup_tokens, 0)) div n_tokens"),
        )
        .otherwise(F.lit(0))
        .alias("dup_cov_bp"),
    )


def remove_duplicate_substrings(
    docs: DataFrame,
    n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """The removal half of Lee et al. 2022: every duplicated ``n``-token
    window keeps its corpus-FIRST occurrence (min (doc, pos) — a
    data-derived winner, so any partitioning yields the same corpus) and
    is cut everywhere else. A token is removed iff some losing duplicated
    window covers it and no winning one does; non-duplicated text is
    untouched. Returns (id, text) for every input document, rebuilt in
    original token order.

    Plan: one window-gram explode (shared shape with
    ``duplicate_substring_spans``), min_by winner per gram (map-side
    combine, one row per distinct gram crosses the shuffle), token-range
    explode of only the DUPLICATED windows (O(n · dup_windows), not
    O(n · all windows)), per-(doc, token) keep/cut resolution, and a
    collect_list reassembly identical to ``remove_duplicate_segments``'s."""
    from pyspark.sql.window import Window  # noqa: F401  (parity with spans)

    toks = F.filter(F.split(F.col(text_col), _WS), lambda x: x != "")
    base = docs.select(id_col, toks.alias("__toks"))
    nw = F.size(F.col("__toks")) - F.lit(n - 1)
    grams = F.transform(
        F.sequence(F.lit(1), nw),
        lambda i: F.struct(
            (i - 1).alias("pos"),
            F.concat_ws(" ", F.slice(F.col("__toks"), i, n)).alias("gram"),
        ),
    )
    g = base.select(
        id_col, F.explode(F.when(nw >= 1, grams)).alias("x")
    ).select(id_col, F.col("x.pos").alias("pos"), F.col("x.gram").alias("gram"))
    # winner per duplicated gram: min (doc, pos) — with its count so
    # singleton grams drop out in the same aggregation
    per_gram = g.groupBy("gram").agg(
        F.min(F.struct(F.col(id_col).alias("d"), F.col("pos").alias("p"))).alias("w"),
        F.count("*").alias("c"),
    )
    dup = per_gram.filter(F.col("c") > 1).select(
        "gram", F.col("w.d").alias("win_doc"), F.col("w.p").alias("win_pos")
    )
    hits = g.join(dup, "gram").select(
        id_col,
        "pos",
        (
            (F.col(id_col) == F.col("win_doc")) & (F.col("pos") == F.col("win_pos"))
        ).alias("is_winner"),
    )
    # expand each duplicated window to its covered token indexes and
    # resolve per token: cut iff covered by a loser and by no winner
    covered = hits.select(
        id_col,
        F.explode(F.sequence(F.col("pos"), F.col("pos") + F.lit(n - 1))).alias("ti"),
        "is_winner",
    )
    cut = covered.groupBy(id_col, "ti").agg(
        (~F.max("is_winner")).alias("__cut")
    ).filter(F.col("__cut"))
    # reassemble ONLY documents that actually lose tokens — everyone
    # else keeps their original text untouched (whitespace included)
    touched = cut.select(id_col).distinct()
    stream = base.join(touched, id_col, "left_semi").select(
        id_col, F.posexplode("__toks").alias("ti", "tok")
    )
    kept = stream.join(cut, [id_col, "ti"], "left_anti")
    rebuilt = kept.groupBy(id_col).agg(
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(F.collect_list(F.struct("ti", "tok"))),
                lambda s: s["tok"],
            ),
        ).alias("__rebuilt")
    )
    return (
        docs.select(id_col, F.col(text_col).alias("__orig"))
        .join(touched.withColumn("__touched", F.lit(True)), id_col, "left")
        .join(rebuilt, id_col, "left")
        .select(
            id_col,
            F.when(
                F.col("__touched").isNull(), F.col("__orig")
            ).otherwise(F.coalesce("__rebuilt", F.lit(""))).alias(text_col),
        )
    )
