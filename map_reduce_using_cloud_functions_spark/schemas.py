"""Canonical schemas.

The reference has *no declared schema anywhere* — its schema is implicit
in CSV headers and nested JSON shapes (SURVEY.md §1.1). Here every
relation the engine touches is a typed StructType, so scans prune
columns, Parquet predicate pushdown works, and mistakes fail at analysis
time instead of at 100 TB runtime.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# The one logical relation behind the reference's whole pipeline
# (reference mapper/main.py:63, reducer/main.py:37-41): flat postings,
# not the nested {word:{doc:n}} JSON — flat is the idiomatic Spark shape;
# the nested shape exists only at the import/export boundary (io.py).
POSTINGS = StructType(
    [
        StructField("word", StringType(), False),
        StructField("document", StringType(), False),
        StructField("count", LongType(), False),
    ]
)

# Text corpus as a table (reference: named .txt objects in a GCS bucket).
CORPUS = StructType(
    [
        StructField("document", StringType(), False),
        StructField("text", StringType(), True),
    ]
)

# ---- driver fixture tables (/root/testdata/sf*/; FIXTURES.md §1) ----

DOCUMENTS = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("text", StringType(), True),
        StructField("lang", StringType(), True),
        StructField("source", StringType(), True),
        StructField("n_chars", LongType(), True),
    ]
)

EMBEDDINGS = StructType(
    [
        StructField("vec_id", LongType(), False),
        StructField("embedding", ArrayType(FloatType()), True),
        StructField("label", IntegerType(), True),
    ]
)

EVENTS = StructType(
    [
        StructField("event_id", LongType(), False),
        StructField("ts", TimestampType(), True),
        StructField("user_id", LongType(), True),
        StructField("event_type", StringType(), True),
        StructField("value", DoubleType(), True),
        StructField("props", StringType(), True),
    ]
)

# Multimodal asset table (FIXTURES.md §3): opaque binary payload + typed
# metadata struct — the BinaryType-column pattern for image/audio/video.
ASSETS = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("kind", StringType(), False),
        StructField("payload", BinaryType(), True),
        StructField(
            "meta",
            StructType(
                [
                    StructField("width", IntegerType(), True),
                    StructField("height", IntegerType(), True),
                    StructField("mime", StringType(), True),
                ]
            ),
            True,
        ),
        StructField("caption", StringType(), True),
    ]
)

TPCH_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
)

ALL_FIXTURE_TABLES = TPCH_TABLES + ("events", "documents", "embeddings")
