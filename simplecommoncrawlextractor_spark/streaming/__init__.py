"""Structured Streaming surface.

The reference has no streaming (SURVEY §2.8): restartability comes from the
filesystem seen-set. Our batch scheduler already reproduces that semantics;
this module wraps the same batch core in a ``foreachBatch`` drain so a
frontier fed by a streaming source (file drop-folder, Kafka-shaped rate
source) schedules continuously with identical per-batch semantics."""

from .drain import stream_documents_to_frontier  # noqa: F401
