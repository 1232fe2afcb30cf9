"""Operators: the reference's analytics mapper/reducer surface (SURVEY §2)
re-expressed as DataFrame transformations, plus the training-data-pipeline
additions (dedup family, similarity search, text analysis, multimodal
plumbing)."""

from .cdxview import CDX_SQL, cdx_view  # noqa: F401
