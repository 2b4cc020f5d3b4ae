from .tables import load_table, load_tables, register_views
from .text_corpus import read_text_corpus, documents_as_corpus
from .bucketed import read_bucketed, write_bucketed

__all__ = [
    "load_table",
    "load_tables",
    "register_views",
    "read_text_corpus",
    "documents_as_corpus",
    "read_bucketed",
    "write_bucketed",
]
