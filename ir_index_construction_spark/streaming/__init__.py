"""Structured-Streaming extensions.

The reference pipeline is strictly batch (SURVEY.md §2.1 — no streams,
watermarks or state anywhere in /root/reference), so streaming is an
ENGINE EXTENSION, not a parity feature: `incremental` maintains the
postings/docs tables from a stream of newly crawled pages via
atomically-committed foreachBatch micro-batches into the snapshot
catalog; `windows` runs the watermarked tumbling-window event rollup
(append mode — each window emitted exactly once when the watermark
passes its end); `sessions` is the custom stateful operator —
applyInPandasWithState gap sessionization with event-time timeouts.
"""

from .incremental import incremental_index_update  # noqa: F401
from .sessions import streaming_sessionize  # noqa: F401
from .windows import streaming_windowed_counts  # noqa: F401
