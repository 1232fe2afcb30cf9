"""Sources: testdata parquet loaders, CDX gz-line scan + parse, and the
deterministic synthetic generators (interleaved documents, seed frontier,
simulated payloads) — all pure Column expressions, seed-free and
reproducible (every value derives from stable keys)."""

from .tables import load_table, register_views  # noqa: F401
from .cdx import CDX_SCHEMA, parse_cdx_lines, read_cdx  # noqa: F401
from .warc import read_warc, warc_response_records  # noqa: F401
from .synth import (  # noqa: F401
    interleaved_documents,
    seed_frontier,
    simulated_payload_columns,
)
