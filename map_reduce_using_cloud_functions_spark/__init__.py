"""PySpark-native analytics engine with the capabilities of the reference
serverless MapReduce system (piyush26c/Map-Reduce-Using-Cloud-Functions).

The reference is a hand-rolled FaaS MapReduce whose single job builds an
inverted index ``{word: {document: count}}`` over a text corpus, supports
incremental re-indexing on file arrival, and serves exact-word lookups
(see SURVEY.md). This package re-expresses that surface — and the
LLM-data-pipeline extensions (dedup, similarity search, text analysis,
multimodal columns, relational core, streaming windows) — as idiomatic
Spark DataFrame programs: declarative plans, Catalyst optimization,
shuffle-based exchange instead of GCS-bucket stage boundaries.

Layout:
    session       SparkSession factory tuned for large-scale execution
    schemas       canonical StructTypes for every table the engine reads
    sources       table/corpus readers (parquet fixtures, text dirs, CSV/JSON interchange)
    functions     reusable Column expression builders (tokenize, vector math, hashing)
    operators     inverted index, dedup family, similarity, text analysis, multimodal
    plans         relational query catalog (joins/windows/set-ops/agg over TPC-H-ish tables)
    streaming     Structured Streaming entry points (file-trigger indexing, event windows)
"""

__version__ = "0.1.0"
