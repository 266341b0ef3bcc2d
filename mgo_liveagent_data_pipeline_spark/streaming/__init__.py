"""Structured Streaming formalization of the reference's batch-incremental
windows (SURVEY §2.8)."""
from .windows import session_windows, stream_tumbling_6h

__all__ = ["session_windows", "stream_tumbling_6h"]
