"""The WARC-extraction pipeline (reference entry point #1, SURVEY §3.1):
ExtractorCLI → filter chain → two-phase MIME sniff → include/exclude
selection → digest-addressed sink, re-expressed as one declarative plan.

Reference flow (cc/warc/Extractor.java:46-169):
  record-type filter (F3) → truncated filter (F4) → length gates (F5) →
  seen-check (F9) → earlySelectExclude (F6-early) → sniff 1000 B, full
  re-sniff iff octet-stream → select (F6) → write payload to
  out/<digest[0:2]>/<digest><ext> (K1).

Spark shape: cheap predicates are plain filters (Catalyst orders them below
the expensive sniff UDF automatically — the reference's hand-rolled
"early vs late" predicate split disappears); the two-phase sniff is a
``when``-split so only octet-stream rows pay the full-body pass; the sink
is a bucketed parquet write keyed by digest prefix with a left-anti join
standing in for "skip if exists".

Include/exclude semantics (ExtractorConfig.java:142-206): any EXCLUDE match
(detected-mime, header-mime, url-extension) rejects; then any INCLUDE match
accepts; if include patterns exist but none hit → reject; else
``default_include``. NB reference bug FIXED here (documented, not
replicated): ExtractorConfig.java:200-201 tests includeExtensionPattern
twice and never includeDetectedMimePattern — we test the detected-mime
include as evidently intended (pinned in tests/test_extraction.py).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import b32_sha1, digest_shard
from ..functions.scalars import pick_extension, url_ext_warc
from ..functions.sniff import with_detected_mime

# mime → file extension for the pickExtension cascade (the reference asks
# Tika's mime registry, AbstractExtractor.java:141-154; this literal map
# covers the sniffer's output vocabulary and compiles into the plan)
MIME_EXT: dict[str, str] = {
    "application/pdf": ".pdf",
    "application/zip": ".zip",
    "application/gzip": ".gz",
    "application/rtf": ".rtf",
    "text/html": ".html",
    "text/plain": ".txt",
    "image/png": ".png",
    "image/gif": ".gif",
    "image/jpeg": ".jpg",
    "image/webp": ".webp",
    "image/jp2": ".jp2",
    "audio/ogg": ".ogg",
    "audio/mpeg": ".mp3",
    "audio/x-wav": ".wav",
    "video/mp4": ".mp4",
    "video/x-msvideo": ".avi",
}


def _mime_ext(c: Column) -> Column:
    pairs: list[Column] = []
    for k, v in MIME_EXT.items():
        pairs.extend([F.lit(k), F.lit(v)])
    # strip parameters ('text/html; charset=...') before the lookup
    return F.create_map(*pairs)[F.trim(F.substring_index(c, ";", 1))]


@dataclass
class ExtractorConfig:
    """Compiled predicate bag — the reference's entire 'query plan'
    (ExtractorConfig.java:30-40)."""

    include_detected_mimes: str | None = None   # regex
    include_header_mimes: str | None = None
    include_extensions: str | None = None
    exclude_detected_mimes: str | None = None
    exclude_header_mimes: str | None = None
    exclude_extensions: str | None = None
    include_truncated: bool = False             # ExtractorCLI -t :50-51
    min_payload_bytes: int = 1                  # skip len==0 (Extractor :70-73)
    max_payload_bytes: int = -1                 # -1 = unlimited (ExtractorConfig :29)
    default_include: bool = False               # :33
    extra: dict = field(default_factory=dict)


def select_predicate(
    cfg: ExtractorConfig,
    detected_mime: Column,
    header_mime: Column,
    url_ext: Column,
) -> Column:
    """F6 as ONE boolean column (ExtractorConfig.select :158-206, bug
    fixed)."""
    def hit(col: Column, pat: str | None) -> Column:
        return col.isNotNull() & col.rlike(pat) if pat else F.lit(False)

    excl = (
        hit(detected_mime, cfg.exclude_detected_mimes)
        | hit(header_mime, cfg.exclude_header_mimes)
        | hit(url_ext, cfg.exclude_extensions)
    )
    incl = (
        hit(detected_mime, cfg.include_detected_mimes)
        | hit(header_mime, cfg.include_header_mimes)
        | hit(url_ext, cfg.include_extensions)
    )
    has_includes = any(
        (cfg.include_detected_mimes, cfg.include_header_mimes, cfg.include_extensions)
    )
    base = incl if has_includes else F.lit(cfg.default_include)
    return F.when(excl, F.lit(False)).otherwise(base)


def extract(
    records: DataFrame,
    cfg: ExtractorConfig,
    seen_digests: DataFrame | None = None,
    presniffed: bool = False,
) -> DataFrame:
    """Run the full extraction plan over records with columns
    (url, header_mime, payload binary, truncated string|null, length long).

    ``presniffed=True`` means records already carry a ``detected_mime``
    column (the CDX-index scenario — cc/index/IndexRecordProcessor's rows
    have mime_detected precomputed) and the sniff phase is skipped; the
    rest of the plan (F4/F5 gates, F6 selection, digest addressing, ext
    cascade) is identical. This is also what makes the selection logic
    oracle-checkable: the sniff UDF is the only non-SQL stage.

    Returns selected rows with (digest, shard, ext, detected_mime, payload)
    — the rows K1 would write to ``out/<digest[0:2]>/<digest><ext>``."""
    df = records
    # F4 truncated; F5 length gates — cheap, pushed to the scan
    if not cfg.include_truncated:
        df = df.filter(F.col("truncated").isNull())
    df = df.filter(F.col("length") >= cfg.min_payload_bytes)
    if cfg.max_payload_bytes >= 0:
        df = df.filter(F.col("length") <= cfg.max_payload_bytes)

    if not presniffed:
        # two-phase sniff: prefix pass for everyone, full pass ONLY for rows
        # the prefix pass called octet-stream (Extractor.java:116-139).
        # One mapInPandas barrier (round 6): the previous F.when operator
        # split was defeated by ExtractPythonUDFs, which hoisted the
        # full-payload sniff out of the branch (every row paid it) and
        # duplicated both sniffs below the pushed-down F6 filter — see
        # with_detected_mime's docstring for the captured plan shape.
        df = with_detected_mime(df, "payload")

    # F6 selection on (detected, header, url-ext)
    df = df.withColumn("url_ext", url_ext_warc(F.col("url")))
    df = df.filter(
        select_predicate(
            cfg, F.col("detected_mime"), F.col("header_mime"), F.col("url_ext")
        )
    )

    # digest + shard (K1 addressing), then the F9 seen anti-join
    df = df.withColumn("digest", b32_sha1(F.col("payload")))
    df = df.withColumn("shard", digest_shard(F.col("digest")))
    if seen_digests is not None:
        df = df.join(F.broadcast(seen_digests), "digest", "left_anti")
    # one payload per digest — the repo never overwrites (Extractor :159-162)
    df = df.dropDuplicates(["digest"])
    # the full pickExtension cascade: detected-mime ▸ header-mime ▸ url ▸ .unk
    # (octet-stream carries no extension information — fall through, as the
    # reference's MediaType.OCTET_STREAM guards do)
    detected_ext = F.when(
        F.col("detected_mime") != "application/octet-stream",
        _mime_ext(F.col("detected_mime")),
    )
    header_ext = _mime_ext(F.col("header_mime"))
    ext = pick_extension(F.col("url_ext"), header_ext, detected_ext)
    return df.select(
        "digest", "shard", ext.alias("ext"), "detected_mime", "url", "payload"
    )


def write_repository(extracted: DataFrame, out_dir: str) -> None:
    """K1 sink: digest-addressed repository as shard-partitioned parquet —
    digest[0:2] directory sharding ↔ partitionBy('shard'); at scale this is
    also the bucketing key, so repeated runs prune to touched shards."""
    extracted.write.mode("append").partitionBy("shard").parquet(out_dir)
