from .text import normalize_text, tokens_array, normalize_query_word, TOKEN_SQL
from .hashing import hex64, portable_hash64, HEX64_SQL
from .vectors import dot, l2_norm, cosine, COSINE_SQL

__all__ = [
    "normalize_text",
    "tokens_array",
    "normalize_query_word",
    "TOKEN_SQL",
    "hex64",
    "portable_hash64",
    "HEX64_SQL",
    "dot",
    "l2_norm",
    "cosine",
    "COSINE_SQL",
]
