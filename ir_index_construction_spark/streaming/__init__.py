"""Structured-Streaming extensions.

The reference pipeline is strictly batch (SURVEY.md §2.1 — no streams,
watermarks or state anywhere in /root/reference), so streaming is an
ENGINE EXTENSION, not a parity feature: `incremental` maintains the
postings/docs tables from a stream of newly crawled pages via
foreachBatch micro-batches into the snapshot catalog.
"""

from .incremental import incremental_index_update  # noqa: F401
