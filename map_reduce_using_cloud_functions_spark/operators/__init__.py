from .index import (
    tokenize,
    build_index,
    lookup,
    lookup_persisted,
    merge_index,
    distinct_words,
)

__all__ = [
    "tokenize",
    "build_index",
    "lookup",
    "lookup_persisted",
    "merge_index",
    "distinct_words",
]
