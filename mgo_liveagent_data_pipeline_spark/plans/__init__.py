from .registry import ALL_ORACLES, ALL_QUERIES, ORACLES, QUERIES

__all__ = ["QUERIES", "ORACLES"]
