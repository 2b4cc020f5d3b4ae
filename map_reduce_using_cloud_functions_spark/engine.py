"""User-facing engine facade — the reference's whole product surface
(upload corpus → build/extend index → query a word) as one class.

Reference UX being replaced (``main/app.py``):
- upload ``.txt`` files to a bucket → trigger re-index
  (``main/app.py:81-102``, ``filladdtrigger/main.py``)
- query a word → per-document counts, most-frequent first
  (``main/app.py:104-124``)
- input validation: reject whitespace in the probe (``main/app.py:43-44``)

A user of the reference switches by pointing this at a directory of
text files instead of a GCS bucket; every behavior (tokenization,
normalization, sort order, incremental semantics) is preserved, with
``additive=True`` available for bug-level parity of the double-count
merge (SURVEY.md §2 quirk 2).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

from .operators.index import (
    build_index,
    lookup_persisted,
    read_index,
    upsert_index,
    write_index,
)
from .sources.text_corpus import read_text_corpus

# Reference main/app.py:43-44 — a valid probe has no whitespace/newlines.
# fullmatch, not match with '$': '$' matches BEFORE a trailing newline,
# so 'abc\n' would pass the exact gate that names newlines.
_VALID_QUERY = re.compile(r"[^\s\n]+")


class InvertedIndexEngine:
    """Index lifecycle + query API over a persisted, partition-pruned
    parquet index table."""

    def __init__(
        self,
        spark: SparkSession,
        index_path: str,
        additive: bool = False,
        mappers: int | None = None,
        reducers: int | None = None,
    ):
        """``mappers``/``reducers`` mirror the reference API's
        caller-chosen parallelism (``master/main.py:141-142``; the
        trigger path hard-codes 8/4, ``filladdtrigger/main.py:21``).
        Their honest Spark mapping: mappers → input repartitioning,
        reducers → shuffle partition count. Leave None to let the file
        scanner and AQE choose — the recommended default (SURVEY §4)."""
        self.spark = spark
        self.index_path = index_path
        self.additive = additive
        self.mappers = mappers
        self.reducers = reducers

    # ---- build / maintain -------------------------------------------

    def _apply_parallelism(self, corpus):
        if self.mappers is not None:
            corpus = corpus.repartition(self.mappers)
        return corpus

    class _shuffle_partitions:
        """Scoped shuffle-partition override (restores the session conf
        so one engine's reducer setting can't leak into other work)."""

        def __init__(self, spark, n: int | None):
            self.spark, self.n = spark, n

        def __enter__(self):
            if self.n is not None:
                self.prev = self.spark.conf.get("spark.sql.shuffle.partitions")
                self.spark.conf.set("spark.sql.shuffle.partitions", str(self.n))

        def __exit__(self, *exc):
            if self.n is not None:
                self.spark.conf.set("spark.sql.shuffle.partitions", self.prev)

    def build(self, corpus_path: str, versioned: bool = False) -> None:
        """One-shot index build from a directory/glob of text files.
        ``versioned=True`` opts the table into crash-atomic rebuilds
        (``write_index``'s versioned commit protocol); an already-
        versioned table continues the protocol either way. Unlike the
        streaming writer (versioned by default since r7 — nobody can
        re-run a dead stream's history), a one-shot build keeps the
        reference-parity in-place default: its recovery story is
        simply re-running the build."""
        corpus = self._apply_parallelism(read_text_corpus(self.spark, corpus_path))
        with self._shuffle_partitions(self.spark, self.reducers):
            write_index(build_index(corpus), self.index_path, versioned=versioned)

    def build_from_dataframe(self, corpus: DataFrame, versioned: bool = False) -> None:
        """Build from any corpus(document, text) DataFrame."""
        corpus = self._apply_parallelism(corpus)
        with self._shuffle_partitions(self.spark, self.reducers):
            write_index(build_index(corpus), self.index_path, versioned=versioned)

    def add(self, corpus_path: str) -> None:
        """Incremental update (reference trigger path, O15/O19): index
        the new files and merge into the stored index at partition
        granularity — only first-letter partitions the delta touches are
        rewritten (``upsert_index``); a delta can never clobber the rest
        of the index. Existence is gated explicitly (not by catching
        read errors): a transient/corrupt read raises instead of being
        silently treated as 'no index yet'. Default replace-per-document;
        additive=True for reference parity."""
        corpus = self._apply_parallelism(read_text_corpus(self.spark, corpus_path))
        with self._shuffle_partitions(self.spark, self.reducers):
            delta = build_index(corpus)
            # The corpus's documents are the EXPLICIT replace-set: a file
            # re-indexed to token-free content has corpus rows but no
            # delta postings, and its stale postings must still go.
            # (A fully EMPTY file emits no corpus rows at all — the text
            # source has nothing to attribute a filename to — so
            # emptying a file entirely still leaves its old postings;
            # delete-then-nothing is outside the upload contract.)
            upsert_index(
                self.spark,
                delta,
                self.index_path,
                additive=self.additive,
                documents=corpus.select("document"),
            )

    # ---- query -------------------------------------------------------

    def is_valid_query(self, word: str) -> bool:
        """O18 predicate validation (reference main/app.py:43-44)."""
        return bool(_VALID_QUERY.fullmatch(word))

    def find_occurrences(self, word: str) -> DataFrame:
        """The reference's 'Find Occurances' (sic) query: documents
        containing the normalized word, count-descending
        (main/app.py:104-124). Raises on invalid input rather than
        silently returning nothing."""
        if not self.is_valid_query(word):
            raise ValueError(
                "query must be a single word without whitespace "
                "(reference main/app.py:43-44 semantics)"
            )
        # Pruned to the probe's first-letter partitions AND folds any
        # pending streaming additive deltas — a bare base-table read
        # would serve stale counts between delta write and compaction.
        return lookup_persisted(self.spark, self.index_path, word)

    def vocabulary_size(self) -> int:
        index = read_index(self.spark, self.index_path)
        return index.select("word").distinct().count()
