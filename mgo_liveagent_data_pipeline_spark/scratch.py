"""Process-scoped scratch directories with guaranteed cleanup.

The persistence/pipeline plan queries materialize lakehouse tables under
temp dirs to demonstrate write-path semantics (MERGE, SCD2, compaction,
point/range reads). Each invocation allocates a fresh dir; a long-lived
process (bench with up to 5 passes, a 139-member oracle replay) would
otherwise accumulate orders-sized parquet on disk — on a host that has
already filled its ~80 GB disk once during a scale smoke. Every plan-level
mkdtemp therefore routes through :func:`scratch_dir`, and the registry is
purged at process exit (atexit) plus explicitly by bench/verify teardown.

Purging is safe at those points because every returned DataFrame has been
fully consumed (collected/counted) before the next query runs; a lazy
read-back DataFrame must not be held across :func:`purge_scratch`.
"""
from __future__ import annotations

import atexit
import shutil
import tempfile

_SCRATCH_DIRS: list[str] = []


def scratch_dir(prefix: str, dir: str | None = None) -> str:
    """mkdtemp that is registered for end-of-process removal."""
    d = tempfile.mkdtemp(prefix=prefix, dir=dir)
    _SCRATCH_DIRS.append(d)
    return d


def purge_scratch() -> int:
    """Remove every registered scratch dir; returns how many were purged.
    Idempotent — call freely from bench/verify teardown."""
    n = 0
    while _SCRATCH_DIRS:
        shutil.rmtree(_SCRATCH_DIRS.pop(), ignore_errors=True)
        n += 1
    return n


atexit.register(purge_scratch)
