"""Text-corpus sources.

The reference's input is a bucket of named ``.txt`` objects, downloaded
whole-file per mapper (reference ``master/main.py:12-15``,
``mapper/main.py:45-52``) with hand-rolled line-range splitting and
greedy LPT file→mapper packing (``master/main.py:21-47``). In Spark both
collapse into the splittable text source: files split on line boundaries
at ``spark.sql.files.maxPartitionBytes`` granularity and small files are
bin-packed per ``spark.sql.files.openCostInBytes`` — no custom planner.

Document identity is the file *basename*, matching the reference
(``mapper/main.py:63``; same-named files in different folders collide —
SURVEY.md §2 quirk 3).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession


def read_text_corpus(spark: SparkSession, path: str, wholetext: bool = False) -> DataFrame:
    """Read a directory (or glob) of text files as ``corpus(document, text)``.

    ``wholetext=False`` (default) yields one row per line — the scalable
    path: a single 1 TB file still splits across executors, which is what
    the reference's line-range splitter (``master/main.py:21-31``)
    hand-implements. Because the tokenizer collapses ``\\s+`` anyway,
    line-level rows produce identical postings to whole-file strings
    (SURVEY.md §2 quirk 6).
    """
    df = spark.read.text(path, wholetext=wholetext)
    return df.select(
        document_from_file_name().alias("document"),
        F.col("value").alias("text"),
    )


def document_from_file_name():
    """Document identity = decoded file basename, from
    ``input_file_name()`` — shared by the batch and streaming text
    readers so both agree with the reference's object-name identity.

    ``input_file_name()`` returns a URL-encoded URI: 'my file.txt'
    arrives as 'my%20file.txt', silently breaking the file-basename
    contract (and colliding 'a b.txt' with 'a%20b.txt'). Decode
    percent-escapes; literal '+' is pre-protected because url_decode is
    form-decoding ('+' → space), and a malformed escape in an exotic
    filename falls back to the raw basename (try_url_decode → NULL →
    coalesce) rather than failing the scan."""
    base = F.element_at(F.split(F.input_file_name(), "/"), -1)
    return F.coalesce(
        F.try_url_decode(F.replace(base, F.lit("+"), F.lit("%2B"))), base
    )


def documents_as_corpus(documents: DataFrame) -> DataFrame:
    """Adapt the fixture ``documents`` table to ``corpus(document, text)``.

    ``doc_id`` plays the file-basename role (FIXTURES.md §1).
    """
    return documents.select(
        F.col("doc_id").cast("string").alias("document"),
        F.col("text"),
    )
