"""Tokenizer parity tests (SURVEY.md §2 O7, quirks 1).

The executable spec: the reference's exact regex pipeline re-implemented
in pure Python (from mapper/main.py:56-60), compared against the Spark
expression on golden and property-generated inputs.
"""

from __future__ import annotations

import re

import pyspark.sql.functions as F
import pytest
from hypothesis import given, settings, strategies as st

from map_reduce_using_cloud_functions_spark.functions.text import (
    tokens_array,
    normalize_query_word,
)


def reference_tokenize(content: str) -> list[str]:
    """Pure-Python executable spec of reference mapper/main.py:56-60."""
    processed = re.sub(r"\s+", " ", content).lower()
    processed = re.sub(r"[^a-zA-Z0-9\s]", "", processed)
    return processed.split()


def spark_tokenize(spark, texts: list[str]) -> list[list[str]]:
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    rows = df.select(tokens_array(F.col("text")).alias("toks")).collect()
    return [r["toks"] for r in rows]


GOLDEN_CASES = {
    # punctuation deleted WITHOUT space insertion
    "State-of-the-art systems don't fail": ["stateoftheart", "systems", "dont", "fail"],
    # case folding + digits kept
    "electronic Electronic ELECTRONIC 123 abc123 123abc": [
        "electronic", "electronic", "electronic", "123", "abc123", "123abc",
    ],
    # whitespace collapse across newlines/tabs
    "Multi\nline\n\n  spaced\ttabbed   text": ["multi", "line", "spaced", "tabbed", "text"],
    # non-ASCII stripped entirely (no transliteration)
    "naïve café résumé — über cool ©2023": ["nave", "caf", "rsum", "ber", "cool", "2023"],
    "": [],
    "!!! ---": [],
}


def test_golden_tokenization(spark):
    texts = list(GOLDEN_CASES)
    got = spark_tokenize(spark, texts)
    for text, toks in zip(texts, got):
        assert toks == GOLDEN_CASES[text], text
        assert toks == reference_tokenize(text), text


@settings(max_examples=30, deadline=None)
@given(
    st.lists(
        st.text(
            alphabet=st.characters(codec="utf-8", exclude_characters="\x00"),
            max_size=80,
        ),
        min_size=1,
        max_size=8,
    )
)
def test_property_matches_reference_spec(spark, texts):
    got = spark_tokenize(spark, texts)
    for text, toks in zip(texts, got):
        assert toks == reference_tokenize(text)


@pytest.mark.parametrize(
    "raw,expected",
    [
        ("  The!  ", "the"),
        ("don't", "dont"),
        ("ELECTRONIC", "electronic"),
        ("abc123", "abc123"),
    ],
)
def test_query_word_normalization(spark, raw, expected):
    # main/app.py:67-68 — probe word normalized like the corpus.
    row = spark.range(1).select(normalize_query_word(F.lit(raw)).alias("w")).first()
    assert row["w"] == expected


def test_registered_sql_udfs_match_expression_path(spark):
    """The SQL extension surface (register_sql_functions) must agree
    with the codegen expression path on golden cases, weird whitespace,
    and nulls — both implement the same executable spec."""
    from map_reduce_using_cloud_functions_spark.functions.text import (
        register_sql_functions,
    )

    register_sql_functions(spark)
    texts = [
        "State-of-the-art systems don't fail",
        "a\x1fb c　d",
        "  MiXeD   CaSe 123  ",
        "",
        None,
    ]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    df.createOrReplaceTempView("_udf_probe")
    sql_rows = spark.sql("SELECT tokenize(text) AS toks FROM _udf_probe").collect()
    expr_rows = df.select(tokens_array(F.col("text")).alias("toks")).collect()
    for s, e, t in zip(sql_rows, expr_rows, texts):
        if t is None:
            assert s["toks"] is None
        else:
            assert s["toks"] == e["toks"] == reference_tokenize(t)
    w = spark.sql("SELECT normalize_query('  The!  ') AS w").first()["w"]
    assert w == "the"
    # UDTF surface: lateral table function ≡ posexplode of the
    # expression path
    got = spark.sql(
        "SELECT p.text, t.pos, t.token FROM _udf_probe p, "
        "LATERAL explode_tokens(p.text) t ORDER BY p.text, t.pos"
    ).collect()
    want = []
    for t in sorted(x for x in texts if x is not None):
        for pos, tok in enumerate(reference_tokenize(t)):
            want.append((t, pos, tok))
    assert [(r["text"], r["pos"], r["token"]) for r in got] == want


def test_normalize_query_word_column_matches_py_twin(spark):
    """The Column variant and the executable-spec py twin must agree on
    whitespace-bearing probes (review r4: F.trim strips spaces only and
    the old deletion class ate tabs the py spec keeps)."""
    import pyspark.sql.functions as F

    from map_reduce_using_cloud_functions_spark.functions.text import (
        normalize_query_word,
        normalize_query_word_py,
    )

    probes = ["  word  ", "a\tb", "\tx\n", "Hello!", "naïve", "a b", "\x1fz\x1f"]
    df = spark.createDataFrame([(p,) for p in probes], "w string")
    got = [
        r["n"] for r in df.select(normalize_query_word(F.col("w")).alias("n")).collect()
    ]
    assert got == [normalize_query_word_py(p) for p in probes]


def test_read_text_corpus_decodes_spacey_filenames(spark, tmp_path):
    """input_file_name() URL-encodes paths: 'my file.txt' must come back
    as 'my file.txt', not 'my%20file.txt' (review r4, confirmed live);
    '+' and '%' literals must survive the decode."""
    from map_reduce_using_cloud_functions_spark.sources import read_text_corpus

    (tmp_path / "my file.txt").write_text("alpha")
    (tmp_path / "a+b.txt").write_text("beta")
    (tmp_path / "100%.txt").write_text("gamma")
    docs = {
        r["document"]
        for r in read_text_corpus(spark, str(tmp_path)).select("document").collect()
    }
    assert docs == {"my file.txt", "a+b.txt", "100%.txt"}


def test_duckdb_token_sql_matches_spark_on_ws_edge_cases(spark):
    """Cross-engine tokenizer parity on the whitespace set edge cases —
    including \\x0b, which RE2's \\s EXCLUDES but Python/Java \\s
    include (review r4: '0\\x0b0' tokenized ['0','0'] vs ['00'])."""
    import duckdb
    import pyspark.sql.functions as F

    from map_reduce_using_cloud_functions_spark.functions.text import (
        TOKEN_SQL,
        tokens_array,
    )

    texts = ["0\x0b0", "a\x1cb", "x y", "n\xa0m", "p\tq", "plain text"]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    spark_toks = [
        r["t"] for r in df.select(tokens_array(F.col("text")).alias("t")).collect()
    ]
    con = duckdb.connect()
    duck_toks = []
    for t in texts:
        expr = TOKEN_SQL.format(col="?")
        rows = con.execute(
            f"SELECT {expr} AS w FROM (SELECT 1)", [t]
        ).fetchall()
        duck_toks.append([r[0] for r in rows])
    assert spark_toks == duck_toks
