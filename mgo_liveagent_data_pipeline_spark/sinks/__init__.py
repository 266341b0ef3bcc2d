"""Sink operators (reference §2.1 K1-K6)."""
from .writers import (
    append,
    ensure_table,
    history_append,
    overwrite,
    prepare_and_load,
    upsert,
)

__all__ = [
    "append",
    "ensure_table",
    "history_append",
    "overwrite",
    "prepare_and_load",
    "upsert",
]
