"""Interchange round-trips (O2–O4) and the engine facade (the
reference's end-user surface)."""

from __future__ import annotations

import json

import pytest

from map_reduce_using_cloud_functions_spark.engine import InvertedIndexEngine
from map_reduce_using_cloud_functions_spark.operators.index import build_index
from map_reduce_using_cloud_functions_spark.sources.interchange import (
    postings_from_nested_dict,
    read_index_json,
    read_postings_csv,
    write_index_json,
    write_postings_csv,
)


def _postings(df):
    return sorted(map(tuple, df.select("word", "document", "count").collect()))


def test_csv_roundtrip(golden_corpus, tmp_path):
    idx = build_index(golden_corpus)
    path = str(tmp_path / "postings_csv")
    write_postings_csv(idx, path)
    back = read_postings_csv(idx.sparkSession, path)
    assert _postings(back) == _postings(idx)


def test_csv_import_reaggregates_mapper_rows(spark, tmp_path):
    """A raw reference mapper file (one row per occurrence, Count=1,
    mapper/main.py:63) imports to summed postings."""
    p = tmp_path / "mapper0.csv"
    p.write_text("Word,Document,Count\nthe,doc1.txt,1\nthe,doc1.txt,1\nfox,doc1.txt,1\n")
    back = read_postings_csv(spark, str(p))
    assert _postings(back) == [("fox", "doc1.txt", 1), ("the", "doc1.txt", 2)]


def test_json_roundtrip_and_shape(golden_corpus, tmp_path):
    idx = build_index(golden_corpus)
    path = str(tmp_path / "index_json")
    write_index_json(idx, path)
    back = read_index_json(idx.sparkSession, path)
    assert _postings(back) == _postings(idx)
    # per-line shape is the reference's nested dict, keyed by word
    line = json.loads(
        next(
            l
            for f in (tmp_path / "index_json").glob("part-*.json")
            for l in f.read_text().splitlines()
            if '"the"' in l
        )
    )
    assert line["word"] == "the"
    assert line["postings"] == {"doc1.txt": 3, "doc4.txt": 1}


def test_legacy_dict_import(spark):
    nested = {"electronic": {"doc3.txt": 3}, "fox": {"doc1.txt": 1, "doc4.txt": 1}}
    df = postings_from_nested_dict(spark, nested)
    assert _postings(df) == [
        ("electronic", "doc3.txt", 3),
        ("fox", "doc1.txt", 1),
        ("fox", "doc4.txt", 1),
    ]


# ---------------------------------------------------------------- facade


def test_engine_facade_end_to_end(spark, tmp_path):
    corpus = tmp_path / "corpus"
    corpus.mkdir()
    (corpus / "a.txt").write_text("the quick fox and the dog")
    (corpus / "b.txt").write_text("fox fox fox")

    eng = InvertedIndexEngine(spark, str(tmp_path / "index"))
    eng.build(str(corpus))

    rows = [(r["document"], r["count"]) for r in eng.find_occurrences("Fox!").collect()]
    assert rows == [("b.txt", 3), ("a.txt", 1)]  # count desc, doc tiebreak

    # incremental add of a new file
    more = tmp_path / "more"
    more.mkdir()
    (more / "c.txt").write_text("fox again")
    eng.add(str(more))
    rows = [(r["document"], r["count"]) for r in eng.find_occurrences("fox").collect()]
    assert rows == [("b.txt", 3), ("a.txt", 1), ("c.txt", 1)]

    assert eng.vocabulary_size() > 0


def test_engine_rejects_invalid_query(spark, tmp_path):
    eng = InvertedIndexEngine(spark, str(tmp_path / "i"))
    assert not eng.is_valid_query("two words")
    assert not eng.is_valid_query("line\nbreak")
    assert eng.is_valid_query("word")
    with pytest.raises(ValueError):
        eng.find_occurrences("two words")


def test_engine_additive_parity(spark, tmp_path):
    """additive=True reproduces the reference's double-count merge."""
    corpus = tmp_path / "c1"
    corpus.mkdir()
    (corpus / "a.txt").write_text("hello hello world")
    eng = InvertedIndexEngine(spark, str(tmp_path / "index2"), additive=True)
    eng.build(str(corpus))
    eng.add(str(corpus))  # re-add same file → counts double (quirk 2)
    rows = {r["document"]: r["count"] for r in eng.find_occurrences("hello").collect()}
    assert rows == {"a.txt": 4}


def test_engine_explicit_parallelism_parity(spark, tmp_path):
    """Reference-API M/R parity (filladdtrigger M=8 R=4): explicit
    mapper/reducer counts change partitioning, never results."""
    corpus = tmp_path / "par_corpus"
    corpus.mkdir()
    (corpus / "a.txt").write_text("one two two three three three")
    (corpus / "b.txt").write_text("three four four one")

    default = InvertedIndexEngine(spark, str(tmp_path / "idx_default"))
    default.build(str(corpus))
    tuned = InvertedIndexEngine(spark, str(tmp_path / "idx_mr"), mappers=8, reducers=4)
    tuned.build(str(corpus))

    a = sorted(map(tuple, spark.read.parquet(str(tmp_path / "idx_default")).drop("first").collect()))
    b = sorted(map(tuple, spark.read.parquet(str(tmp_path / "idx_mr")).drop("first").collect()))
    assert a == b


def test_fold_index_json_reference_shape(spark, tmp_path):
    """fold_index_json reproduces the reference's single-dict
    final_results.json artifact (master/main.py:124-126) from the
    distributed line-per-word export; write_reference_json round-trips
    through json.load to the same nested dict."""
    import json

    from map_reduce_using_cloud_functions_spark.operators.index import build_index
    from map_reduce_using_cloud_functions_spark.sources.interchange import (
        fold_index_json,
        write_index_json,
        write_reference_json,
    )

    corpus = spark.createDataFrame(
        [("a.txt", "hello world hello"), ("b.txt", "world peace")],
        "document string, text string",
    )
    idx = build_index(corpus)
    expected = {
        "hello": {"a.txt": 2},
        "world": {"a.txt": 1, "b.txt": 1},
        "peace": {"b.txt": 1},
    }
    out = str(tmp_path / "ix_json")
    write_index_json(idx, out)
    assert fold_index_json(spark, out) == expected
    ref_file = str(tmp_path / "final_results.json")
    write_reference_json(idx, ref_file)
    with open(ref_file) as f:
        assert json.load(f) == expected


def test_orc_roundtrip_and_pushdown(spark, tmp_path):
    """ORC interchange: lossless round-trip of the postings relation,
    and the word filter reaches the ORC reader (same pushdown contract
    as parquet)."""
    from map_reduce_using_cloud_functions_spark.operators.index import build_index
    from map_reduce_using_cloud_functions_spark.sources.interchange import (
        read_postings_orc,
        write_postings_orc,
    )
    import pyspark.sql.functions as F

    corpus = spark.createDataFrame(
        [("a.txt", "hello world hello"), ("b.txt", "world peace")],
        "document string, text string",
    )
    idx = build_index(corpus)
    out = str(tmp_path / "postings_orc")
    write_postings_orc(idx, out)
    back = read_postings_orc(spark, out)
    assert sorted(map(tuple, idx.collect())) == sorted(map(tuple, back.collect()))
    plan = (
        back.where(F.col("word") == "hello")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters: [IsNotNull(word), EqualTo(word,hello)]" in plan


def test_write_dataset_layout_and_pruning(spark, tmp_path):
    from map_reduce_using_cloud_functions_spark.sources import load_table
    from map_reduce_using_cloud_functions_spark.sources.interchange import (
        read_dataset,
        write_dataset,
    )
    import os

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    out = str(tmp_path / "ds")
    write_dataset(
        docs, out, partition_by=("lang",), sort_by=("doc_id",),
        max_records_per_file=200,
    )
    # Hive-style partition directories exist
    langs = {d for d in os.listdir(out) if d.startswith("lang=")}
    assert len(langs) >= 2
    back = read_dataset(spark, out)
    assert back.count() == docs.count()
    # Partition pruning: a lang filter must reach PartitionFilters, and
    # the scan must list only that partition's files.
    import pyspark.sql.functions as F

    one = back.where(F.col("lang") == "en")
    plan = one._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(lang" in plan
    # Round-trip values survive (modulo partition-column position)
    a = sorted((r["doc_id"], r["text"]) for r in docs.collect())
    b = sorted((r["doc_id"], r["text"]) for r in back.collect())
    assert a == b


def test_compact_dataset_shrinks_files_preserves_values(spark, tmp_path):
    import os

    import pyspark.sql.functions as F

    from map_reduce_using_cloud_functions_spark.sources import load_table
    from map_reduce_using_cloud_functions_spark.sources.interchange import (
        compact_dataset,
        infer_partitioning,
        read_dataset,
        write_dataset,
    )

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    out = str(tmp_path / "ds")
    # Simulate an accreted sink: 16 writer tasks per hive partition
    write_dataset(docs.repartition(16), out, partition_by=("lang",))
    before = sorted((r["doc_id"], r["text"], r["lang"]) for r in read_dataset(spark, out).collect())

    assert infer_partitioning(out) == ("lang",)
    stats = compact_dataset(spark, out)  # partition_by inferred
    assert stats["rows"] == len(before)
    assert stats["files_after"] < stats["files_before"]
    # this tiny dataset fits one file per hive partition
    langs = [d for d in os.listdir(out) if d.startswith("lang=")]
    for d in langs:
        files = [f for f in os.listdir(os.path.join(out, d)) if f.endswith(".parquet")]
        assert len(files) == 1, (d, files)
    after_df = read_dataset(spark, out)
    after = sorted((r["doc_id"], r["text"], r["lang"]) for r in after_df.collect())
    assert after == before
    # pruning still works on the compacted layout
    plan = after_df.where(F.col("lang") == "en")._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(lang" in plan


def test_compact_dataset_unpartitioned(spark, tmp_path):
    from map_reduce_using_cloud_functions_spark.sources import load_table
    from map_reduce_using_cloud_functions_spark.sources.interchange import (
        compact_dataset,
        infer_partitioning,
        read_dataset,
        write_dataset,
    )

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    out = str(tmp_path / "flat")
    write_dataset(emb.repartition(24), out)
    assert infer_partitioning(out) == ()
    stats = compact_dataset(spark, out)
    assert stats["files_after"] < stats["files_before"]
    assert read_dataset(spark, out).count() == stats["rows"] == emb.count()


def test_zorder_layout_clusters_both_dimensions(spark, tmp_path):
    """Per-file min-max spans must be narrow on BOTH z-order columns —
    the property that makes multi-dimensional skipping work — while a
    linear sort leaves its non-leading column spanning ~the full range
    in every file."""
    import glob
    import os

    import pyarrow.parquet as pq
    import pyspark.sql.functions as F

    from map_reduce_using_cloud_functions_spark.sources import load_table
    from map_reduce_using_cloud_functions_spark.sources.interchange import (
        read_dataset,
        write_dataset,
    )

    orders = load_table(spark, "/root/testdata/sf0.001", "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )

    def avg_span(path, col):
        lo = hi = None
        spans = []
        per_file = []
        for f in glob.glob(os.path.join(path, "*.parquet")):
            meta = pq.read_metadata(f)
            names = meta.schema.names
            ci = names.index(col)
            fmn = min(meta.row_group(g).column(ci).statistics.min for g in range(meta.num_row_groups))
            fmx = max(meta.row_group(g).column(ci).statistics.max for g in range(meta.num_row_groups))
            per_file.append((fmn, fmx))
            lo = fmn if lo is None else min(lo, fmn)
            hi = fmx if hi is None else max(hi, fmx)
        rng = hi - lo
        return sum((mx - mn) / rng for mn, mx in per_file) / len(per_file)

    zpath = str(tmp_path / "z")
    lpath = str(tmp_path / "lin")
    # max_records_per_file splits the z-sorted stream into z-contiguous
    # files even when AQE coalesces the tiny shuffle to one partition
    # (at real scale AQE's advisory sizing does the file splitting).
    write_dataset(
        orders, zpath, zorder_by=("o_custkey", "o_totalprice"),
        max_records_per_file=50,
    )
    write_dataset(
        orders.repartitionByRange(F.col("o_custkey")), lpath,
        sort_by=("o_custkey",), max_records_per_file=50,
    )

    # z-order: BOTH dimensions clustered
    assert avg_span(zpath, "o_custkey") < 0.7
    assert avg_span(zpath, "o_totalprice") < 0.7
    # linear sort: non-leading column unclustered, and worse than z-order
    assert avg_span(lpath, "o_totalprice") > avg_span(zpath, "o_totalprice")
    # values survive the layout
    assert read_dataset(spark, zpath).count() == orders.count()
    a = sorted(map(tuple, read_dataset(spark, zpath).collect()))
    b = sorted(map(tuple, orders.collect()))
    assert a == b


def test_zorder_rejects_strings_and_too_many_bits(spark):
    import pytest

    from map_reduce_using_cloud_functions_spark.sources import load_table
    from map_reduce_using_cloud_functions_spark.sources.interchange import zorder_key

    orders = load_table(spark, "/root/testdata/sf0.001", "orders")
    with pytest.raises(ValueError, match="unsupported type"):
        zorder_key(orders, ("o_orderstatus",))
    with pytest.raises(ValueError, match="exceeds"):
        zorder_key(orders, ("o_orderkey", "o_custkey"), bits=32)


# --------------------------------------------------------------- JSONL corpus


def test_corpus_jsonl_roundtrip_and_corrupt_lines(spark, tmp_path):
    """JSONL corpus: round-trip preserves values (incl. map metadata),
    the read is schema-first (no inference), and hand-broken lines land
    in _corrupt_record instead of failing the scan."""
    import gzip
    import os

    from map_reduce_using_cloud_functions_spark.sources.interchange import (
        corrupt_record_stats,
        read_corpus_jsonl,
        write_corpus_jsonl,
    )

    docs = spark.createDataFrame(
        [
            (1, "hello world", "web", "en", {"url": "http://x"}),
            (2, "zweiter text", "books", "de", None),
        ],
        "doc_id bigint, text string, source string, lang string, meta map<string,string>",
    )
    path = str(tmp_path / "corpus_jsonl")
    write_corpus_jsonl(docs, path)
    back = read_corpus_jsonl(spark, path)
    got = {r["doc_id"]: r for r in back.collect()}
    assert set(got) == {1, 2}
    assert got[1]["meta"]["url"] == "http://x"
    assert got[2]["lang"] == "de"
    assert all(r["_corrupt_record"] is None for r in got.values())

    # minimal documents relation (only doc_id/text) still exports
    write_corpus_jsonl(docs.select("doc_id", "text"), path)
    assert read_corpus_jsonl(spark, path).where("source is null").count() == 2

    # plant a truncated line: scan survives, audit counts it
    broken = str(tmp_path / "broken.json")
    with open(broken, "w") as f:
        f.write('{"doc_id": 7, "text": "fine"}\n')
        f.write('{"doc_id": 8, "text": "trunc\n')
    scan = read_corpus_jsonl(spark, broken)
    stats = corrupt_record_stats(scan).first()
    assert stats["n_lines"] == 2 and stats["n_corrupt"] == 1
    assert scan.where("doc_id = 7").count() == 1


def test_zorder_supports_date_and_timestamp(spark):
    """The advertised temporal z-order support must not crash: DATE and
    TIMESTAMP_NTZ reject a direct double cast (review r4, confirmed
    live) — they route through TIMESTAMP now."""
    import datetime

    from map_reduce_using_cloud_functions_spark.sources.interchange import zorder_key

    df = spark.createDataFrame(
        [
            (datetime.date(2024, 1, 1), datetime.datetime(2024, 1, 1, 5), 1.0),
            (datetime.date(2024, 6, 1), datetime.datetime(2024, 6, 1, 5), 2.0),
        ],
        "d date, t timestamp_ntz, v double",
    )
    keys = df.select(zorder_key(df, ("d", "v")).alias("z")).collect()
    assert len({r["z"] for r in keys}) == 2
    keys = df.select(zorder_key(df, ("t", "v")).alias("z")).collect()
    assert len({r["z"] for r in keys}) == 2


def test_reference_json_exporters_guard_driver_memory(spark, tmp_path):
    """r5: the driver-bound reference exporters refuse oversized inputs
    (count-first guard) instead of OOMing the driver; the guidance names
    the distributed alternative. Round-trip behavior under the guard is
    unchanged (covered above)."""
    import pytest as _pytest

    from map_reduce_using_cloud_functions_spark.sources.interchange import (
        fold_index_json,
        write_index_json,
        write_reference_json,
    )

    idx = spark.createDataFrame(
        [("w%d" % i, "d.txt", 1) for i in range(10)],
        "word string, document string, count long",
    )
    with _pytest.raises(ValueError, match="write_index_json"):
        write_reference_json(idx, str(tmp_path / "ref.json"), max_rows=5)
    out = str(tmp_path / "lines")
    write_index_json(idx, out)
    with _pytest.raises(ValueError, match="driver-bound"):
        fold_index_json(spark, out, max_rows=5)
    # at/below the cap both still work
    write_reference_json(idx, str(tmp_path / "ref.json"), max_rows=10)
    assert len(fold_index_json(spark, out, max_rows=10)) == 10
