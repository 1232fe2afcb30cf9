"""Scalar parity layer + vectorized UDF surface.

Column-expression functions live in ``scalars`` (JVM-side, whole-stage
codegen); Python stages (canonicalization, outlink extraction, sniffing,
base32-sha1) live in ``urls`` / ``sniff`` / ``hashing`` as Arrow-batched
pandas UDFs — never row-at-a-time Python.
"""

from .scalars import (  # noqa: F401
    clean_csv,
    clean_tsv,
    first_lang,
    get_tld,
    normalize_mime,
    offset_header,
    pick_extension,
    url_ext_index,
    url_ext_warc,
)
from .urls import canonicalize_url, extract_urls, url_filter_ok  # noqa: F401
from .mappers import (  # noqa: F401
    capture_field_mapper,
    filter_field_mapper,
    identity_field_mapper,
)
from .hashing import b32_sha1, url_hash64  # noqa: F401
from .sniff import sniff_mime  # noqa: F401
from .text import (  # noqa: F401
    doc_fingerprint,
    lang_id,
    quality_stats,
    token_count,
)
