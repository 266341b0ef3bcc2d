"""Structured Streaming formalization of the reference's batch-incremental
windows (SURVEY §2.8): tumbling/session windows, the foreachBatch
incremental upsert, and a custom stateful operator."""
from .stateful import running_user_totals
from .windows import session_windows, stream_tumbling_6h, stream_upsert_6h

__all__ = [
    "running_user_totals",
    "session_windows",
    "stream_tumbling_6h",
    "stream_upsert_6h",
]
