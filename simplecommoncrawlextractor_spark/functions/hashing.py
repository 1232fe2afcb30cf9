"""Hashing: frontier url_hash (xxhash64, JVM-side), content digests
(SHA-1/base32 parity), and bucket assignment for the URL-seen state.

The reference content-addresses payloads with base32(sha1(bytes))
(cc/warc/AbstractExtractor.java:125-127) and uses digest[0:2] as the
directory shard (cc/warc/Extractor.java:104-108). The frontier uses
xxhash64 per the north rule — built-in, 64-bit, cheap, JVM-side.
"""

from __future__ import annotations

import base64
import hashlib

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import StringType


def url_hash64(c: Column | str) -> Column:
    """64-bit frontier hash of a canonical URL (north_rule: xxhash64)."""
    c = F.col(c) if isinstance(c, str) else c
    return F.xxhash64(c)


def bucket_of(hash_col: Column | str, n_buckets: int) -> Column:
    """Stable non-negative bucket id for state-table partitioning —
    the Spark analog of the reference's digest[0:2] directory shard."""
    c = F.col(hash_col) if isinstance(hash_col, str) else hash_col
    return F.pmod(c, F.lit(n_buckets)).cast("int")


@F.pandas_udf(StringType())
def b32_sha1(payload: pd.Series) -> pd.Series:
    """base32(sha1(bytes)) — parity with AbstractExtractor.digest (:125-127).

    Accepts binary or string input; Arrow-batched. Commons-codec Base32
    pads with '='; so does Python's b32encode — byte-identical output.
    """
    def one(v):
        if v is None:
            return None
        if isinstance(v, str):
            v = v.encode("utf-8")
        return base64.b32encode(hashlib.sha1(v).digest()).decode("ascii")

    return payload.map(one)


def digest_shard(digest: Column | str) -> Column:
    """digest[0:2] directory shard (Extractor.java:104-108) as a column."""
    c = F.col(digest) if isinstance(digest, str) else digest
    return F.substring(c, 1, 2)
