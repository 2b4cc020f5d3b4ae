from __future__ import annotations

import os

import pytest

from map_reduce_using_cloud_functions_spark.session import get_spark

SF_SMALL = "/root/testdata/sf0.001"


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "soak: multi-minute soak/fuzz/scale tests, excluded from the "
        "default run so `pytest tests/` finishes inside the driver's "
        "verify window (r12 verdict task 1); opt in with `-m soak`, "
        "`-m 'soak or not soak'` for everything, or "
        "SPARK_GRAFT_RUN_SOAKS=1.",
    )


def pytest_collection_modifyitems(config, items):
    # An explicit -m expression (or the env opt-in) takes full control;
    # otherwise soak-marked tests are skipped so the DEFAULT run stays
    # fast — the skip is visible in the summary (s), never silent.
    if config.option.markexpr or os.environ.get("SPARK_GRAFT_RUN_SOAKS"):
        return
    skip = pytest.mark.skip(
        reason="soak test — opt in with -m soak or SPARK_GRAFT_RUN_SOAKS=1"
    )
    for item in items:
        if "soak" in item.keywords:
            item.add_marker(skip)


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
