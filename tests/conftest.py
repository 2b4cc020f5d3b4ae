from __future__ import annotations

import pytest

from map_reduce_using_cloud_functions_spark.session import get_spark

SF_SMALL = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("engine-tests", shuffle_partitions=8)
    yield s
    s.stop()


# FIXTURES.md §2 — golden 5-doc corpus exercising every tokenizer quirk.
GOLDEN_CORPUS = [
    ("doc1.txt", "The quick brown fox jumps over the lazy dog. The END."),
    ("doc2.txt", "State-of-the-art systems don't fail; they degrade—gracefully."),
    ("doc3.txt", "electronic Electronic ELECTRONIC 123 abc123 123abc"),
    ("doc4.txt", "Multi\nline\n\n  spaced\ttabbed   text with the fox"),
    ("doc5.txt", "naïve café résumé — über cool ©2023"),
]


@pytest.fixture(scope="session")
def golden_corpus(spark):
    return spark.createDataFrame(GOLDEN_CORPUS, "document string, text string")
