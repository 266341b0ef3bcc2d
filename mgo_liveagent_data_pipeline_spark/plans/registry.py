"""Unified query/oracle registry — the driver contract surface.

``QUERIES[name](spark, sf_dir) -> DataFrame`` and ``ORACLES[name]`` is the
DuckDB-SQL twin (omitted for rows-only checks: non-SQL-expressible ops).
Merged from the per-domain plan modules; duplicate names are a bug.
"""
from __future__ import annotations

from . import connector, enrichment, persistence, pipeline, relational

QUERIES = {}
ORACLES: dict[str, str] = {}

for _mod in (relational, pipeline, enrichment, persistence, connector):
    for _k in _mod.QUERIES:
        if _k in QUERIES:
            raise ValueError(f"duplicate query name: {_k}")
    QUERIES.update(_mod.QUERIES)
    ORACLES.update(_mod.ORACLES)
