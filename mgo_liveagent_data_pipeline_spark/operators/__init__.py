from . import aggregations, annsearch, dedup, joins, multimodal, setops, textops, windows

__all__ = [
    "joins",
    "aggregations",
    "windows",
    "setops",
    "dedup",
    "annsearch",
    "textops",
    "multimodal",
]
