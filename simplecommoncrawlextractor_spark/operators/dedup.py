"""Deduplication family over the ``documents`` table — the training-data
pipeline surface (exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup).

Design notes for 100 TB:
- exact dedup is a hash-groupBy on a fingerprint column — partial aggregation
  + AQE handle skew; the fingerprint (md5 of normalized text) is computed
  scan-side so only 16 bytes shuffle per row, never the text.
- MinHash signatures use portable primitives (min over md5(salt||shingle))
  so the DuckDB oracle can replay them bit-for-bit; at scale you'd swap the
  md5 for xxhash64 (same plan shape, cheaper hash) — the banding/join
  topology is the part that matters: candidates come from an equi-join on
  (band_id, band_signature), which Spark executes as a shuffle join on a
  uniformly-distributed key — no N² comparison anywhere.
- n-gram Jaccard is bounded the same way: the self-join is on shingle
  values, and pair aggregation happens before the similarity filter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import doc_fingerprint


def exact_dedup_groups(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact-duplicate groups: one row per distinct normalized-text
    fingerprint with the group size and the representative (min id) —
    the content-addressed 'skip if digest exists' semantics of
    cc/warc/Extractor.java:104-108,159-162 as a relational op."""
    return (
        docs.select(doc_fingerprint(text_col).alias("fp"), F.col(id_col))
        .groupBy("fp")
        .agg(F.count("*").alias("n_docs"), F.min(id_col).alias("rep_id"))
        .orderBy("fp")
    )


def shingles(docs: DataFrame, n: int = 3, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Distinct n-token shingles per document (lowercased, whitespace
    tokens). transform over a token array — no Python."""
    toks = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    sh = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0))),
        lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
    )
    # docs shorter than n tokens must emit NO shingles (a partial shingle
    # would both diverge from the DuckDB oracle and make 2-token docs
    # Jaccard-comparable via malformed grams) — keep only full n-grams
    full = F.filter(
        F.array_distinct(sh), lambda s: F.size(F.split(s, " ")) == n
    )
    return docs.select(F.col(id_col), F.explode(full).alias("shingle"))


def minhash_signatures(
    sh: DataFrame, n_hashes: int = 8, id_col: str = "doc_id"
) -> DataFrame:
    """MinHash signature per doc: base = md5(shingle) computed ONCE per
    shingle, then sig_s = min(md5(s || base)) for salt s in 0..n-1 — the
    variable-length shingle is hashed a single time and the salt
    permutations re-hash only the fixed 32-char digest (≈n× cheaper on
    long shingles, same LSH guarantees: each salt is an independent
    uniform permutation of shingle space). Portable — DuckDB md5 is
    byte-identical. Output: (doc_id, salt, sig)."""
    base = sh.select(F.col(id_col), F.md5("shingle").alias("h0"))
    # all n salted hashes as COLUMNS of one row (not an n-way explode):
    # the groupBy then shuffles one partially-min'd row per (doc,partition)
    # instead of n_hashes × shingles rows — 8× fewer shuffle rows here
    hashed = base.select(
        F.col(id_col),
        *[
            F.md5(F.concat(F.lit(str(s)), F.col("h0"))).alias(f"h{s}")
            for s in range(n_hashes)
        ],
    )
    mins = hashed.groupBy(id_col).agg(
        *[F.min(f"h{s}").alias(f"m{s}") for s in range(n_hashes)]
    )
    sig_structs = F.array(
        *[
            F.struct(F.lit(s).alias("salt"), F.col(f"m{s}").alias("sig"))
            for s in range(n_hashes)
        ]
    )
    return mins.select(
        F.col(id_col), F.explode(sig_structs).alias("x")
    ).select(id_col, F.col("x.salt").alias("salt"), F.col("x.sig").alias("sig"))


def minhash_lsh_candidates(
    docs: DataFrame,
    n_hashes: int = 8,
    bands: int = 4,
    shingle_n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """LSH candidate pairs: band the signature (rows_per_band = n/bands),
    concat each band's sigs into one key, equi-join docs sharing a
    (band_id, band_key). Returns distinct (id_a, id_b) with id_a < id_b."""
    rows_per_band = n_hashes // bands
    sig = minhash_signatures(
        shingles(docs, shingle_n, text_col, id_col), n_hashes, id_col
    )
    banded = (
        sig.withColumn("band", (F.col("salt") / rows_per_band).cast("int"))
        .groupBy(id_col, "band")
        .agg(F.concat_ws(",", F.array_sort(F.collect_list("sig"))).alias("band_key"))
    )
    a = banded.select(F.col(id_col).alias("id_a"), "band", "band_key")
    b = banded.select(F.col(id_col).alias("id_b"), "band", "band_key")
    return (
        a.join(b, ["band", "band_key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
        .orderBy("id_a", "id_b")
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    threshold: float = 0.5,
    shingle_n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """n-gram Jaccard near-dup pairs: self-join on shingle → |A∩B| per pair,
    |A|,|B| from per-doc shingle counts, keep J = inter/(|A|+|B|-inter) ≥ t.
    The join key is the shingle value (uniform), intersection counts
    aggregate map-side — no pairwise N² stage."""
    sh = shingles(docs, shingle_n, text_col, id_col)
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("sz"))
    a = sh.select(F.col(id_col).alias("id_a"), "shingle")
    b = sh.select(F.col(id_col).alias("id_b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("inter"))
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("sz").alias("sz_b"))
    j = (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "jaccard",
            F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    return j.select("id_a", "id_b", "inter", "sz_a", "sz_b").orderBy("id_a", "id_b")


def simhash64(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """64-bit SimHash per doc: per-token xxhash64 → per-bit ±1 votes →
    sign. All JVM-side: explode tokens, unpack bits with shiftright/&1,
    sum votes per (doc, bit), reassemble with bit shifts."""
    toks = docs.select(
        F.col(id_col),
        F.explode(F.split(F.lower(F.trim(F.col(text_col))), r"\s+")).alias("tok"),
    )
    h = toks.select(F.col(id_col), F.xxhash64("tok").alias("h"))
    bits = h.select(
        F.col(id_col),
        F.explode(F.sequence(F.lit(0), F.lit(63))).alias("bit"),
        F.col("h"),
    ).select(
        F.col(id_col),
        "bit",
        # shiftright's Python API needs a literal shift — use the SQL form,
        # which accepts a column shift amount
        (F.expr("shiftright(h, bit) & 1") * 2 - 1).alias("vote"),
    )
    votes = bits.groupBy(id_col, "bit").agg(F.sum("vote").alias("v"))
    return (
        votes.withColumn(
            "bitval",
            F.when(F.col("v") > 0, F.expr("shiftleft(cast(1 as bigint), bit)")).otherwise(
                F.lit(0).cast("long")
            ),
        )
        .groupBy(id_col)
        .agg(F.sum("bitval").alias("simhash"))
    )


def simhash_near_dups(docs: DataFrame, max_hamming: int = 3, **kw) -> DataFrame:
    """SimHash near-dup pairs via 4-segment pigeonhole: split the 64-bit
    hash into 4×16-bit segments; any pair within hamming distance 3 shares
    at least one exact segment → equi-join on (segment_id, segment_value),
    verify hamming on candidates with bit_count. No N² stage."""
    id_col = kw.get("id_col", "doc_id")
    sh = simhash64(docs, **kw)
    seg = sh.select(
        F.col(id_col),
        F.col("simhash"),
        F.explode(F.sequence(F.lit(0), F.lit(3))).alias("seg"),
    ).withColumn(
        "seg_val", F.expr("shiftright(simhash, seg * 16) & 65535")
    )
    a = seg.select(F.col(id_col).alias("id_a"), F.col("simhash").alias("h_a"), "seg", "seg_val")
    b = seg.select(F.col(id_col).alias("id_b"), F.col("simhash").alias("h_b"), "seg", "seg_val")
    cand = (
        a.join(b, ["seg", "seg_val"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "h_a", "h_b")
        .distinct()
    )
    ham = cand.withColumn("hamming", F.bit_count(F.col("h_a").bitwiseXOR(F.col("h_b"))))
    return ham.filter(F.col("hamming") <= max_hamming).select(
        "id_a", "id_b", "hamming"
    ).orderBy("id_a", "id_b")
