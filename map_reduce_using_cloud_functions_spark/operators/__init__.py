from .index import (
    tokenize,
    build_index,
    lookup,
    merge_index,
    distinct_words,
)

__all__ = [
    "tokenize",
    "build_index",
    "lookup",
    "merge_index",
    "distinct_words",
]
