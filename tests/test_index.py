"""Inverted-index golden + incremental tests (SURVEY.md §5 items 3/4)."""

from __future__ import annotations

import pyspark.sql.functions as F

from map_reduce_using_cloud_functions_spark.operators.index import (
    build_index,
    distinct_words,
    lookup,
    merge_index,
    tokenize,
)


def as_nested(index_df) -> dict:
    """Export shape parity: {word: {document: count}} (reference
    final_results.json, master/main.py:82-126)."""
    out: dict = {}
    for row in index_df.collect():
        out.setdefault(row["word"], {})[row["document"]] = row["count"]
    return out


def test_golden_index(golden_corpus):
    idx = as_nested(build_index(golden_corpus))
    assert idx["the"] == {"doc1.txt": 3, "doc4.txt": 1}
    assert idx["electronic"] == {"doc3.txt": 3}
    assert idx["stateoftheart"] == {"doc2.txt": 1}
    assert idx["dont"] == {"doc2.txt": 1}
    assert idx["degradegracefully"] == {"doc2.txt": 1}
    assert idx["2023"] == {"doc5.txt": 1}
    assert idx["fox"] == {"doc1.txt": 1, "doc4.txt": 1}
    assert "naïve" not in idx and "nave" in idx


def test_lookup_order_and_normalization(golden_corpus):
    idx = build_index(golden_corpus)
    rows = lookup(idx, "  The!  ").collect()  # normalizes to 'the'
    assert [(r["document"], r["count"]) for r in rows] == [
        ("doc1.txt", 3),
        ("doc4.txt", 1),
    ]
    assert lookup(idx, "missingword").count() == 0


def test_incremental_equals_batch(golden_corpus):
    """index(docs 1–3) + add(docs 4–5) == one-shot index(docs 1–5)."""
    first = golden_corpus.where(F.col("document") <= "doc3.txt")
    rest = golden_corpus.where(F.col("document") > "doc3.txt")
    merged = merge_index(build_index(first), build_index(rest), additive=True)
    batch = build_index(golden_corpus)
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, batch.collect()))


def test_additive_double_counts_like_reference(golden_corpus):
    """Reference parity (master/main.py:112-121): re-adding doc1 doubles it."""
    idx = build_index(golden_corpus)
    doc1 = build_index(golden_corpus.where(F.col("document") == "doc1.txt"))
    merged = as_nested(merge_index(idx, doc1, additive=True))
    assert merged["the"]["doc1.txt"] == 6  # was 3
    assert merged["the"]["doc4.txt"] == 1  # untouched


def test_upsert_replaces_document(golden_corpus, spark):
    """Default semantics: re-indexing a changed doc replaces its postings."""
    idx = build_index(golden_corpus)
    changed = spark.createDataFrame(
        [("doc1.txt", "completely new words")], "document string, text string"
    )
    merged = as_nested(merge_index(idx, build_index(changed), additive=False))
    assert merged["completely"] == {"doc1.txt": 1}
    assert "doc1.txt" not in merged.get("the", {})  # old postings gone
    assert merged["the"]["doc4.txt"] == 1  # other docs untouched


def test_partition_invariance(golden_corpus):
    """O5/O6/O11: identical results under any input partitioning."""
    base = sorted(map(tuple, build_index(golden_corpus).collect()))
    for n in (1, 4, 16):
        got = sorted(map(tuple, build_index(golden_corpus.repartition(n)).collect()))
        assert got == base


def test_distinct_words(golden_corpus):
    n = distinct_words(build_index(golden_corpus)).count()
    toks = tokenize(golden_corpus).select("word").distinct().count()
    assert n == toks > 0


def test_index_roundtrip_parquet(golden_corpus, tmp_path):
    """O2 sink + O1 re-scan: write/read round-trip preserves postings."""
    from map_reduce_using_cloud_functions_spark.operators.index import (
        read_index,
        write_index,
    )

    idx = build_index(golden_corpus)
    path = str(tmp_path / "index")
    write_index(idx, path)
    back = read_index(idx.sparkSession, path)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, idx.collect()))


def test_upsert_removes_stale_postings_across_partitions(spark, tmp_path):
    """Replace-semantics regression: re-indexing a document whose new
    text DROPS a word must remove the stale posting even when the delta
    itself never writes that word's partition — including when that
    leaves the partition empty (directory must disappear)."""
    import os

    from map_reduce_using_cloud_functions_spark.operators.index import (
        build_index,
        read_index,
        upsert_index,
        write_index,
    )

    v1 = spark.createDataFrame(
        [("d1", "apple zebra"), ("d2", "banana")], "document string, text string"
    )
    path = str(tmp_path / "idx")
    write_index(build_index(v1), path)
    assert os.path.exists(os.path.join(path, "first=z"))

    # d1 v2 drops 'zebra' (only z-word in the index) and keeps 'apple'
    v2 = spark.createDataFrame([("d1", "apple apple")], "document string, text string")
    upsert_index(spark, build_index(v2), path, additive=False)

    got = sorted(map(tuple, read_index(spark, path).collect()))
    assert got == [("apple", "d1", 2), ("banana", "d2", 1)]
    assert not os.path.exists(os.path.join(path, "first=z"))

    # untouched partition (b) must survive: d2 was not re-indexed
    assert os.path.exists(os.path.join(path, "first=b"))


def test_docmap_sidecar_stays_consistent_and_hidden(spark, tmp_path):
    """The doc→letters sidecar must (a) stay exactly equal to the map
    recomputed from the full index after any sequence of upserts,
    (b) never be visible through read_index, and (c) be backfilled for
    a legacy index written without one."""
    import os

    from map_reduce_using_cloud_functions_spark.operators.index import (
        _doc_letters,
        build_index,
        read_index,
        upsert_index,
        write_index,
    )

    def corpus(rows):
        return spark.createDataFrame(rows, "document string, text string")

    path = str(tmp_path / "idx")
    write_index(build_index(corpus([("1", "apple zebra"), ("2", "apple mango")])), path)
    assert os.path.isdir(os.path.join(path, "_docmap"))

    # replace doc 1 so its postings move letters (zebra → quince drops z)
    upsert_index(spark, build_index(corpus([("1", "quince")])), path)
    # additive batch for a new doc
    upsert_index(spark, build_index(corpus([("3", "banana")])), path, additive=True)

    idx = read_index(spark, path)
    assert "bucket" not in idx.columns  # sidecar invisible to readers
    want = sorted(map(tuple, _doc_letters(idx).collect()))
    got = sorted(
        map(
            tuple,
            spark.read.parquet(os.path.join(path, "_docmap"))
            .select("document", "first")
            .collect(),
        )
    )
    assert got == want
    # stale 'z' partition is gone and the replaced content is correct
    assert not os.path.isdir(os.path.join(path, "first=z"))
    rows = {(r["word"], r["document"]) for r in idx.collect()}
    assert ("quince", "1") in rows and ("zebra", "1") not in rows

    # legacy index: remove the sidecar, upsert must still work and backfill
    import shutil

    shutil.rmtree(os.path.join(path, "_docmap"))
    upsert_index(spark, build_index(corpus([("2", "cherry")])), path)
    assert os.path.isdir(os.path.join(path, "_docmap"))
    idx2 = read_index(spark, path)
    want2 = sorted(map(tuple, _doc_letters(idx2).collect()))
    got2 = sorted(
        map(
            tuple,
            spark.read.parquet(os.path.join(path, "_docmap"))
            .select("document", "first")
            .collect(),
        )
    )
    assert got2 == want2
    rows2 = {(r["word"], r["document"]) for r in idx2.collect()}
    assert ("cherry", "2") in rows2 and ("apple", "2") not in rows2


def test_cli_build_add_query(spark, tmp_path, capsys):
    """The __main__ CLI drives the reference flow end to end: build a
    corpus dir, query a word (most-frequent-first), add a new file,
    query again, reject an invalid probe."""
    from map_reduce_using_cloud_functions_spark.__main__ import main

    corpus = tmp_path / "corpus"
    corpus.mkdir()
    (corpus / "a.txt").write_text("apple apple banana")
    (corpus / "b.txt").write_text("apple cherry")
    idx = str(tmp_path / "idx")

    assert main(["build", str(corpus), idx], spark=spark) == 0
    capsys.readouterr()
    assert main(["query", idx, "Apple", "--top", "5"], spark=spark) == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert out == ["a.txt\t2", "b.txt\t1"]  # count desc, doc asc

    more = tmp_path / "more"
    more.mkdir()
    (more / "c.txt").write_text("apple apple apple")
    assert main(["add", str(more), idx], spark=spark) == 0
    capsys.readouterr()
    assert main(["query", idx, "apple"], spark=spark) == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert out == ["c.txt\t3", "a.txt\t2", "b.txt\t1"]

    assert main(["query", idx, "two words"], spark=spark) == 2


def test_full_rebuild_clears_stale_partitions(spark, tmp_path):
    """InvertedIndexEngine.build over an EXISTING index must not leave
    first-letter partitions from the prior build behind (write_index
    forces static overwrite; the session default is dynamic for
    upserts) — and the doc-map sidecar must be rebuilt to match."""
    import os

    from map_reduce_using_cloud_functions_spark.engine import InvertedIndexEngine
    from map_reduce_using_cloud_functions_spark.operators.index import _doc_letters

    c1 = tmp_path / "c1"
    c1.mkdir()
    (c1 / "a.txt").write_text("zebra apple")
    c2 = tmp_path / "c2"
    c2.mkdir()
    (c2 / "b.txt").write_text("mango apple")
    idx = str(tmp_path / "idx")

    eng = InvertedIndexEngine(spark, idx)
    eng.build(str(c1))
    assert os.path.isdir(os.path.join(idx, "first=z"))
    eng.build(str(c2))  # full rebuild from a corpus with no z-words
    assert not os.path.isdir(os.path.join(idx, "first=z"))
    assert eng.find_occurrences("zebra").count() == 0
    assert eng.find_occurrences("mango").count() == 1
    # sidecar rebuilt alongside: exactly the new corpus' doc→letters
    got = sorted(
        map(
            tuple,
            spark.read.parquet(os.path.join(idx, "_docmap"))
            .select("document", "first")
            .collect(),
        )
    )
    from map_reduce_using_cloud_functions_spark.operators.index import read_index

    want = sorted(map(tuple, _doc_letters(read_index(spark, idx)).collect()))
    assert got == want


def test_cli_query_missing_index_is_a_clean_error(spark, tmp_path, capsys):
    from map_reduce_using_cloud_functions_spark.__main__ import main

    rc = main(["query", str(tmp_path / "nope"), "apple"], spark=spark)
    assert rc == 2
    assert "no index at" in capsys.readouterr().err


def test_upsert_scrubs_document_reindexed_to_token_free(spark, tmp_path):
    """A document re-indexed to content with NO tokens (e.g. only
    punctuation) produces an empty delta — with the explicit
    ``documents`` replace-set its old postings must still be removed
    (review r4: the delta-derived set misses exactly this case)."""
    import os

    from map_reduce_using_cloud_functions_spark.operators.index import (
        build_index,
        read_index,
        upsert_index,
        write_index,
    )

    v1 = spark.createDataFrame(
        [("d1", "zebra quill"), ("d2", "banana")], "document string, text string"
    )
    path = str(tmp_path / "idx")
    write_index(build_index(v1), path)

    # d1 v2 tokenizes to nothing (punctuation-only)
    v2 = spark.createDataFrame([("d1", "?!... ---")], "document string, text string")
    upsert_index(
        spark,
        build_index(v2),
        path,
        additive=False,
        documents=v2.select("document"),
    )

    got = sorted(map(tuple, read_index(spark, path).collect()))
    assert got == [("banana", "d2", 1)]
    assert not os.path.exists(os.path.join(path, "first=z"))
    assert not os.path.exists(os.path.join(path, "first=q"))
    assert os.path.exists(os.path.join(path, "first=b"))

    # and the sidecar forgot d1: re-adding text for d1 later must not
    # consider any stale letters
    v3 = spark.createDataFrame([("d1", "apple")], "document string, text string")
    upsert_index(
        spark, build_index(v3), path, additive=False, documents=v3.select("document")
    )
    got = sorted(map(tuple, read_index(spark, path).collect()))
    assert got == [("apple", "d1", 1), ("banana", "d2", 1)]


def test_engine_add_scrubs_token_free_reindex(spark, tmp_path):
    """End-to-end through the engine: overwriting an uploaded file with
    punctuation-only content removes its postings from the index."""
    from map_reduce_using_cloud_functions_spark.engine import InvertedIndexEngine

    docs = tmp_path / "docs"
    docs.mkdir()
    (docs / "a.txt").write_text("hello world")
    (docs / "b.txt").write_text("keep this")
    idx = str(tmp_path / "idx")
    eng = InvertedIndexEngine(spark, idx)
    eng.build(str(docs))
    assert [r["document"] for r in eng.find_occurrences("hello").collect()] == ["a.txt"]

    (docs / "a.txt").write_text("?!?! ...")
    eng.add(str(docs / "a.txt"))
    assert eng.find_occurrences("hello").collect() == []
    assert eng.find_occurrences("world").collect() == []
    assert [r["document"] for r in eng.find_occurrences("keep").collect()] == ["b.txt"]


def test_hot_letter_write_skew_is_split_by_rebalance(spark, tmp_path):
    """r4 verdict task 7: a pathological hot letter (>=50% of all index
    rows — the natural-corpus stopword family) must not serialize the
    index write into one task. write_index uses REBALANCE(first) so
    AQE's OptimizeSkewInRebalancePartitions splits the oversized letter
    across tasks (multiple files in its directory) while cold letters
    stay compact — and the table reads back identical either way.

    The aggregation itself is structurally skew-proof: the shuffle key
    is (word, document), so even a word in EVERY document never
    concentrates on one reducer — only the letter-directory write can
    skew, which is exactly what this pins."""
    import glob
    import random as _random

    from map_reduce_using_cloud_functions_spark.operators.index import (
        build_index,
        lookup,
        read_index,
        write_index,
    )

    rng = _random.Random(7)
    tvocab = [f"t{rng.randrange(10**10):011d}" for _ in range(4000)]
    cvocab = [f"m{rng.randrange(10**10):011d}" for _ in range(4000)]
    docs = [
        (
            f"d{i}.txt",
            " ".join(
                [rng.choice(tvocab) for _ in range(60)]
                + [rng.choice(cvocab) for _ in range(20)]
            ),
        )
        for i in range(1500)
    ]
    corpus = spark.createDataFrame(docs, "document string, text string")
    # repartition(16): the skew split divides a reduce partition at MAP
    # boundaries, so the rebalance shuffle needs >1 mapper to have any
    # split points — AQE coalesces the tiny test aggregation to one
    # partition otherwise (production inputs have thousands of mappers)
    idx = build_index(corpus).repartition(16).localCheckpoint()
    t_rows = idx.where(F.col("word").startswith("t")).count()
    assert t_rows / idx.count() >= 0.5  # the skew premise holds

    path = str(tmp_path / "skew_index")
    # shrink AQE's target + floor so fixture-scale bytes behave like
    # multi-GB partitions do under the 64 MB production defaults
    knobs = {
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "65536",
        "spark.sql.adaptive.coalescePartitions.minPartitionSize": "65536",
    }
    saved = {}
    for k, v in knobs.items():
        try:
            saved[k] = spark.conf.get(k)
        except Exception:
            saved[k] = None
        spark.conf.set(k, v)
    try:
        write_index(idx, path)
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    t_files = glob.glob(f"{path}/first=t/*.parquet")
    m_files = glob.glob(f"{path}/first=m/*.parquet")
    assert len(t_files) >= 2, (
        f"hot letter written by a single task ({len(t_files)} file) — "
        "rebalance skew split did not engage"
    )
    # the split is bounded, not shattered: tasks ~ partition/advisory
    assert len(t_files) <= 64
    assert len(m_files) < len(t_files)  # hot letter got MORE tasks
    # correctness unchanged by the multi-file layout
    assert sorted(map(tuple, read_index(spark, path).collect())) == sorted(
        map(tuple, idx.collect())
    )
    hot = rng.choice(tvocab)
    expected = sorted(
        map(tuple, idx.where(F.col("word") == hot).select("document", "count").collect()),
        key=lambda r: (-r[1], r[0]),
    )
    assert list(map(tuple, lookup(read_index(spark, path), hot).collect())) == expected


def test_additive_delta_write_fold_and_compact(spark, tmp_path):
    """The exactly-once additive building blocks at batch level:
    write_additive_delta is idempotent per batch id (re-applying batch N
    overwrites its own partitions, counts unchanged), read_index folds
    pending deltas, replace-mode upserts refuse an uncompacted index,
    and compact_index folds the tail back into a bare base table."""
    import os

    import pytest

    from map_reduce_using_cloud_functions_spark.operators.index import (
        build_index,
        compact_index,
        read_index,
        upsert_index,
        write_additive_delta,
        write_index,
    )

    path = str(tmp_path / "idx")
    base = build_index(
        spark.createDataFrame([("a.txt", "hello world hello")], "document string, text string")
    )
    write_index(base, path)

    delta = build_index(
        spark.createDataFrame([("b.txt", "hello spark")], "document string, text string")
    )
    write_additive_delta(spark, delta, path, batch_id=1)
    expected = [
        ("hello", "a.txt", 2),
        ("hello", "b.txt", 1),
        ("spark", "b.txt", 1),
        ("world", "a.txt", 1),
    ]
    assert sorted(map(tuple, read_index(spark, path).collect())) == expected

    # replaying the SAME batch id is a no-op on the logical table
    write_additive_delta(spark, delta, path, batch_id=1)
    assert sorted(map(tuple, read_index(spark, path).collect())) == expected

    # a DIFFERENT batch id adds (additive semantics between batches)
    write_additive_delta(spark, delta, path, batch_id=2)
    doubled = sorted(
        map(tuple, read_index(spark, path).where("document = 'b.txt'").collect())
    )
    assert doubled == [("hello", "b.txt", 2), ("spark", "b.txt", 2)]

    # replace-mode upsert must refuse while deltas are pending
    with pytest.raises(ValueError, match="uncompacted additive deltas"):
        upsert_index(spark, delta, path, additive=False)

    before = sorted(map(tuple, read_index(spark, path).collect()))
    compact_index(spark, path)
    assert not os.path.exists(os.path.join(path, "_additive"))
    assert sorted(map(tuple, read_index(spark, path).collect())) == before
    # and replace-mode upserts work again after compaction
    upsert_index(
        spark,
        build_index(
            spark.createDataFrame([("b.txt", "goodbye")], "document string, text string")
        ),
        path,
        additive=False,
    )
    assert sorted(
        map(tuple, read_index(spark, path).where("document = 'b.txt'").collect())
    ) == [("goodbye", "b.txt", 1)]


def test_lookup_persisted_prunes_and_folds_pending_deltas(spark, tmp_path):
    """r6: the serving path must be BOTH pruned and delta-correct.
    Before it, engine.find_occurrences read the bare base (pruned but
    blind to pending streaming deltas) while read_index+lookup folded
    deltas but projected away the partition column before the filter —
    a full-table scan per point query at real file counts."""
    from map_reduce_using_cloud_functions_spark.operators.index import (
        build_index,
        lookup_persisted,
        read_index,
        write_additive_delta,
        write_index,
    )

    path = str(tmp_path / "idx")
    write_index(
        build_index(
            spark.createDataFrame(
                [("a.txt", "hello world hello"), ("c.txt", "zebra hello")],
                "document string, text string",
            )
        ),
        path,
    )

    # pruned base-only lookup: plan carries a first-letter PartitionFilter
    got = lookup_persisted(spark, path, "Hello!")
    plan = got._jdf.queryExecution().executedPlan().toString()
    import re

    pf = re.findall(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert pf and any("first" in f and "= h" in f for f in pf), plan[:500]
    assert [tuple(r) for r in got.collect()] == [("a.txt", 2), ("c.txt", 1)]

    # a pending streaming additive delta must be visible immediately
    delta = build_index(
        spark.createDataFrame([("b.txt", "hello hello")], "document string, text string")
    )
    write_additive_delta(spark, delta, path, batch_id=7)
    got2 = lookup_persisted(spark, path, "hello")
    # BOTH sides of the fold stay pruned (base + delta scans); read the
    # plan BEFORE executing — the post-AQE final plan prints shuffle
    # stages as references and hides the FileScan lines
    plan2 = got2._jdf.queryExecution().executedPlan().toString()
    pf2 = re.findall(r"PartitionFilters: \[([^\]]*)\]", plan2)
    assert len([f for f in pf2 if "first" in f and "= h" in f]) == 2, plan2[:800]
    assert [tuple(r) for r in got2.collect()] == [
        ("a.txt", 2),
        ("b.txt", 2),
        ("c.txt", 1),
    ]

    # unpruned read_index stays the unchanged full logical view
    assert ("hello", "b.txt", 2) in set(map(tuple, read_index(spark, path).collect()))


def test_engine_find_occurrences_sees_pending_delta(spark, tmp_path):
    """The UI/engine query path serves through lookup_persisted: counts
    written by an uncompacted streaming batch appear in query results."""
    from map_reduce_using_cloud_functions_spark.engine import InvertedIndexEngine
    from map_reduce_using_cloud_functions_spark.operators.index import (
        build_index,
        write_additive_delta,
        write_index,
    )

    path = str(tmp_path / "idx")
    write_index(
        build_index(
            spark.createDataFrame([("a.txt", "alpha beta")], "document string, text string")
        ),
        path,
    )
    write_additive_delta(
        spark,
        build_index(
            spark.createDataFrame([("b.txt", "alpha alpha")], "document string, text string")
        ),
        path,
        batch_id=1,
    )
    eng = InvertedIndexEngine(spark, index_path=path)
    assert [tuple(r) for r in eng.find_occurrences("alpha").collect()] == [
        ("b.txt", 2),
        ("a.txt", 1),
    ]


# --- versioned commits (r6: crash-atomic full rewrites) -------------------


def _mk_idx(spark, rows):
    return build_index(
        spark.createDataFrame(rows, "document string, text string")
    )


def test_versioned_write_roundtrip_and_rebuild(spark, tmp_path):
    """Opt-in versioned layout: answers identical to in-place, version
    advances per full rebuild, lookups stay partition-pruned inside the
    current version directory."""
    from map_reduce_using_cloud_functions_spark.operators.index import (
        index_version,
        lookup_persisted,
        read_index,
        write_index,
    )

    path = str(tmp_path / "idx")
    write_index(_mk_idx(spark, [("a.txt", "hello world hello")]), path, versioned=True)
    assert index_version(spark, path) == 0
    assert sorted(map(tuple, read_index(spark, path).collect())) == [
        ("hello", "a.txt", 2),
        ("world", "a.txt", 1),
    ]

    # full rebuild — flag no longer needed, the layout continues itself
    write_index(_mk_idx(spark, [("a.txt", "bye world")]), path)
    assert index_version(spark, path) == 1
    assert sorted(map(tuple, read_index(spark, path).collect())) == [
        ("bye", "a.txt", 1),
        ("world", "a.txt", 1),
    ]

    got = lookup_persisted(spark, path, "world")
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "= w" in plan
    assert [tuple(r) for r in got.collect()] == [("a.txt", 1)]


def test_versioned_crash_before_commit_serves_previous_version(spark, tmp_path):
    """Failure injection: a rebuild that wrote its v=1 directory but
    died before the commit file landed is INVISIBLE — readers serve
    v=0 exactly; the next rebuild self-heals by overwriting the orphan
    and committing v=1."""
    from map_reduce_using_cloud_functions_spark.operators.index import (
        _version_dir,
        _write_base,
        _write_docmap_full,
        index_version,
        read_index,
        write_index,
    )

    path = str(tmp_path / "idx")
    write_index(_mk_idx(spark, [("a.txt", "old old")]), path, versioned=True)

    # crash: v=1 fully written, no commit
    orphan = _mk_idx(spark, [("a.txt", "newer")])
    _write_base(orphan, _version_dir(path, 1))
    _write_docmap_full(orphan, _version_dir(path, 1))

    assert index_version(spark, path) == 0
    assert sorted(map(tuple, read_index(spark, path).collect())) == [
        ("old", "a.txt", 2)
    ]

    # recovery: the next rebuild takes v=1 for itself and commits it
    write_index(_mk_idx(spark, [("a.txt", "recovered")]), path)
    assert index_version(spark, path) == 1
    assert sorted(map(tuple, read_index(spark, path).collect())) == [
        ("recovered", "a.txt", 1)
    ]


def test_versioned_compaction_exactly_once_with_lagging_gc(spark, tmp_path, monkeypatch):
    """The watermark closes compaction's double-count window: with GC
    disabled (simulating a crash between commit and cleanup), the
    folded delta partitions still sit on disk but count exactly once;
    replace-mode upserts are allowed (the base already holds them); a
    later GC changes nothing logically and reclaims the files."""
    import os

    from map_reduce_using_cloud_functions_spark.operators import index as ix

    path = str(tmp_path / "idx")
    ix.write_index(_mk_idx(spark, [("a.txt", "hello world")]), path, versioned=True)
    ix.write_additive_delta(spark, _mk_idx(spark, [("b.txt", "hello")]), path, 1)
    ix.write_additive_delta(spark, _mk_idx(spark, [("b.txt", "hello")]), path, 2)
    expected = [
        ("hello", "a.txt", 1),
        ("hello", "b.txt", 2),
        ("world", "a.txt", 1),
    ]
    assert sorted(map(tuple, ix.read_index(spark, path).collect())) == expected

    monkeypatch.setattr(ix, "gc_index_versions", lambda *a, **k: None)
    ix.compact_index(spark, path)
    monkeypatch.undo()

    # deltas physically present, logically folded — exactly once
    assert os.path.exists(os.path.join(path, "_additive", "abatch=1"))
    assert ix.pending_additive_batches(spark, path) == []
    assert sorted(map(tuple, ix.read_index(spark, path).collect())) == expected
    assert ix.index_version(spark, path) == 1

    # replace-mode upsert is legal now (superseded deltas don't block)
    ix.upsert_index(
        spark, _mk_idx(spark, [("b.txt", "goodbye")]), path, additive=False
    )
    after_upsert = sorted(
        map(tuple, ix.read_index(spark, path).collect())
    )
    assert after_upsert == [
        ("goodbye", "b.txt", 1),
        ("hello", "a.txt", 1),
        ("world", "a.txt", 1),
    ]

    ix.gc_index_versions(spark, path)
    assert not os.path.exists(os.path.join(path, "_additive", "abatch=1"))
    assert sorted(map(tuple, ix.read_index(spark, path).collect())) == after_upsert


def test_versioned_upsert_in_place_keeps_version(spark, tmp_path):
    """Partition-granular upserts stay in place inside the current
    version dir — version unchanged, untouched partitions' files
    byte-identical."""
    import glob
    import os

    from map_reduce_using_cloud_functions_spark.operators.index import (
        _version_dir,
        index_version,
        read_index,
        upsert_index,
        write_index,
    )

    path = str(tmp_path / "idx")
    write_index(
        _mk_idx(spark, [("a.txt", "hello world"), ("b.txt", "zebra")]),
        path,
        versioned=True,
    )
    vdir = _version_dir(path, 0)
    before = {
        p: os.path.getmtime(p)
        for p in glob.glob(os.path.join(vdir, "first=z", "*.parquet"))
    }
    assert before

    upsert_index(spark, _mk_idx(spark, [("c.txt", "hello")]), path)
    assert index_version(spark, path) == 0
    after = {
        p: os.path.getmtime(p)
        for p in glob.glob(os.path.join(vdir, "first=z", "*.parquet"))
    }
    assert after == before
    assert ("hello", "c.txt", 1) in set(map(tuple, read_index(spark, path).collect()))


def test_versioned_streaming_additive_with_compaction(spark, tmp_path):
    """A stream pointed at a pre-built versioned table continues the
    protocol: deltas fold through versioned compactions, end state
    equals the batch build, version advanced, tail bounded."""
    from map_reduce_using_cloud_functions_spark.operators.index import (
        index_version,
        pending_additive_batches,
        read_index,
        write_index,
    )
    from map_reduce_using_cloud_functions_spark.sources import read_text_corpus
    from map_reduce_using_cloud_functions_spark.streaming.file_index import (
        start_file_index_stream,
    )

    watch = tmp_path / "watch"
    seed = tmp_path / "seed"
    watch.mkdir()
    seed.mkdir()
    path = str(tmp_path / "idx")
    ckpt = str(tmp_path / "ckpt")

    # base built from a dir the stream does NOT watch (watched files
    # would be ingested as deltas on top of themselves)
    with open(seed / "s0.txt", "w") as f:
        f.write("seed words here")
    write_index(
        build_index(read_text_corpus(spark, str(seed))), path, versioned=True
    )
    for i in range(1, 6):
        with open(watch / f"f{i}.txt", "w") as f:
            f.write(f"alpha w{i} w{i}")

    start_file_index_stream(
        spark,
        str(watch),
        path,
        ckpt,
        additive=True,
        max_files_per_trigger=1,
        compact_every=2,
    ).awaitTermination(300)

    assert len(pending_additive_batches(spark, path)) < 2
    assert index_version(spark, path) >= 1
    batch = build_index(
        read_text_corpus(spark, str(seed)).unionByName(
            read_text_corpus(spark, str(watch))
        )
    )
    assert sorted(map(tuple, read_index(spark, path).collect())) == sorted(
        map(tuple, batch.collect())
    )


import pytest as _pytest


@_pytest.mark.parametrize("seed,versioned", [(7, True), (23, True), (7, False)])
def test_index_lifecycle_random_walk_matches_model(spark, tmp_path, seed, versioned):
    """Seeded random walk over the full index lifecycle — full rebuild,
    replace/additive upserts, streaming-style additive deltas (with
    replayed batch ids), compaction, GC — checked after every step
    against a plain dict model. Runs the same walk on the versioned and
    in-place layouts: the logical table must never depend on layout."""
    import random

    from map_reduce_using_cloud_functions_spark.operators import index as ix

    rng = random.Random(seed)
    words = ["ant", "bee", "cat", "dog", "elk", "ant1", "b2"]
    docs = [f"d{i}" for i in range(5)]
    path = str(tmp_path / "idx")

    def rand_corpus(n_docs):
        rows = []
        for d in rng.sample(docs, n_docs):
            text = " ".join(rng.choice(words) for _ in range(rng.randrange(1, 6)))
            rows.append((d, text))
        return rows

    def model_index(rows):
        out = {}
        for d, text in rows:
            for w in text.split():
                out[(w, d)] = out.get((w, d), 0) + 1
        return out

    def df_of(rows):
        return build_index(
            spark.createDataFrame(rows, "document string, text string")
        )

    # initial full build
    rows0 = rand_corpus(3)
    ix.write_index(df_of(rows0), path, versioned=versioned)
    model = model_index(rows0)
    applied_batches: set[int] = set()
    applied_rows: dict[int, list] = {}

    def check(step):
        got = sorted(map(tuple, ix.read_index(spark, path).collect()))
        want = sorted((w, d, c) for (w, d), c in model.items() if c > 0)
        assert got == want, f"step {step}: {got} != {want}"

    check("init")
    for step in range(14):
        op = rng.choice(
            ["rebuild", "upsert_replace", "upsert_additive", "delta", "compact", "gc",
             "rebuild_docmap"]
        )
        if op == "rebuild":
            rows = rand_corpus(rng.randrange(1, 4))
            ix.write_index(df_of(rows), path)
            model = model_index(rows)
            # a full rebuild supersedes delta CONTENT on both layouts.
            # Batch-id semantics differ by contract: in-place wipes
            # _additive so ids are free again; versioned keeps the
            # folded_through watermark monotonic, so reusing an old id
            # is a no-op only under allow_replayed_ids (else it raises)
            # — new streams need fresh ids.
            if not versioned:
                applied_batches.clear()
                applied_rows.clear()
        elif op == "upsert_replace":
            rows = rand_corpus(rng.randrange(1, 3))
            if ix.pending_additive_batches(spark, path):
                with _pytest.raises(ValueError, match="uncompacted"):
                    ix.upsert_index(
                        spark,
                        df_of(rows),
                        path,
                        additive=False,
                        documents=spark.createDataFrame(
                            [(d,) for d, _ in rows], "document string"
                        ),
                    )
            else:
                ix.upsert_index(
                    spark,
                    df_of(rows),
                    path,
                    additive=False,
                    documents=spark.createDataFrame(
                        [(d,) for d, _ in rows], "document string"
                    ),
                )
                replaced = {d for d, _ in rows}
                model = {
                    k: c for k, c in model.items() if k[1] not in replaced
                }
                model.update(model_index(rows))
        elif op == "upsert_additive":
            rows = rand_corpus(rng.randrange(1, 3))
            ix.upsert_index(spark, df_of(rows), path, additive=True)
            for k, c in model_index(rows).items():
                model[k] = model.get(k, 0) + c
        elif op == "delta":
            rows = rand_corpus(rng.randrange(1, 3))
            # replay an old id half the time: must be a logical no-op
            if applied_batches and rng.random() < 0.5:
                bid = rng.choice(sorted(applied_batches))
                # a REPLAY carries the same content by contract (the
                # streaming checkpoint pins batch content); reuse rows
                # only if we recorded them — instead, replay is modeled
                # by rewriting the batch's exact partitions, so skip
                # model update and rewrite nothing new: use stored rows
                rows = applied_rows[bid]
                # the streaming checkpoint path's assertion — without it
                # a folded id raises (pinned separately)
                ix.write_additive_delta(
                    spark, df_of(rows), path, bid, allow_replayed_ids=True
                )
            else:
                bid = max(applied_batches, default=-1) + 1
                ix.write_additive_delta(spark, df_of(rows), path, bid)
                applied_batches.add(bid)
                applied_rows[bid] = rows
                for k, c in model_index(rows).items():
                    model[k] = model.get(k, 0) + c
        elif op == "compact":
            ix.compact_index(spark, path)
        elif op == "gc":
            ix.gc_index_versions(spark, path)
        elif op == "rebuild_docmap":
            # maintenance no-op on the logical table at any point in
            # the lifecycle (r7): the sidecar rebuild must never change
            # what readers see
            ix.rebuild_docmap(spark, path)
        check(f"{step}:{op}")

    # final sanity: lookups agree with the model for a sampled word
    w = rng.choice(words)
    got = [tuple(r) for r in ix.lookup_persisted(spark, path, w).collect()]
    want = sorted(
        ((d, c) for (ww, d), c in model.items() if ww == w and c > 0),
        key=lambda t: (-t[1], t[0]),
    )
    assert got == want


# --- r7: raise-on-folded-id, migration cleanup, docmap backfill, size policy


def test_additive_folded_id_raises_without_replay_flag(spark, tmp_path):
    """r6 verdict task 2: a batch id at/below the folded_through
    watermark outside a declared replay is an ERROR (silent data drop
    otherwise); with allow_replayed_ids=True it is the exactly-once
    no-op."""
    import pytest

    from map_reduce_using_cloud_functions_spark.operators import index as ix

    path = str(tmp_path / "idx")
    mk = lambda doc, text: build_index(
        spark.createDataFrame([(doc, text)], "document string, text string")
    )
    ix.write_index(mk("a.txt", "one two"), path, versioned=True)
    ix.write_additive_delta(spark, mk("b.txt", "one"), path, 1)
    ix.compact_index(spark, path)  # folded_through -> 1
    before = sorted(map(tuple, ix.read_index(spark, path).collect()))

    with pytest.raises(ValueError, match="allow_replayed_ids"):
        ix.write_additive_delta(spark, mk("c.txt", "three"), path, 0)
    with pytest.raises(ValueError, match="folded_through watermark"):
        ix.write_additive_delta(spark, mk("c.txt", "three"), path, 1)
    # the declared-replay path: no-op, table unchanged
    ix.write_additive_delta(spark, mk("b.txt", "one"), path, 1, allow_replayed_ids=True)
    assert sorted(map(tuple, ix.read_index(spark, path).collect())) == before


def test_first_build_watermark_makes_batch0_replay_noop(spark, tmp_path):
    """The write_index(folded_through=0) stamp (streaming first batch):
    a replayed batch 0 hits the watermark no-op on BOTH layouts."""
    from map_reduce_using_cloud_functions_spark.operators import index as ix

    mk = lambda doc, text: build_index(
        spark.createDataFrame([(doc, text)], "document string, text string")
    )
    for versioned in (True, False):
        path = str(tmp_path / f"idx_{versioned}")
        ix.write_index(mk("a.txt", "hello hello"), path, versioned=versioned, folded_through=0)
        before = sorted(map(tuple, ix.read_index(spark, path).collect()))
        ix.write_additive_delta(spark, mk("a.txt", "hello hello"), path, 0, allow_replayed_ids=True)
        assert sorted(map(tuple, ix.read_index(spark, path).collect())) == before, versioned
        # and batch 1 still applies normally
        ix.write_additive_delta(spark, mk("b.txt", "hello"), path, 1)
        assert ("hello", "b.txt", 1) in set(map(tuple, ix.read_index(spark, path).collect()))


def test_versioned_migration_reclaims_legacy_inplace_layout(spark, tmp_path):
    """r6 ADVICE (low): migrating an in-place table with
    write_index(versioned=True) must delete the dead top-level base
    (first=* dirs, _docmap, _folded_through, _SUCCESS) once v=0
    commits — otherwise a stray bare spark.read.parquet(path) serves
    stale merged data forever."""
    import os as _os

    from map_reduce_using_cloud_functions_spark.operators import index as ix

    path = str(tmp_path / "idx")
    mk = lambda rows: build_index(
        spark.createDataFrame(rows, "document string, text string")
    )
    ix.write_index(mk([("a.txt", "old words here")]), path)
    # leave a folded marker behind too (in-place compaction artifact)
    ix.write_additive_delta(spark, mk([("b.txt", "tail")]), path, 1)
    ix.compact_index(spark, path)
    assert _os.path.exists(_os.path.join(path, "_folded_through"))

    # migrate: rebuild versioned from the current logical table
    ix.write_index(ix.read_index(spark, path).localCheckpoint(), path, versioned=True)

    top = set(_os.listdir(path))
    assert not any(d.startswith("first=") for d in top), top
    assert "_docmap" not in top and "_folded_through" not in top and "_SUCCESS" not in top
    assert any(d.startswith("v=") for d in top) and "_versions" in top
    got = sorted(map(tuple, ix.read_index(spark, path).collect()))
    assert got == sorted(
        [("old", "a.txt", 1), ("tail", "b.txt", 1), ("words", "a.txt", 1), ("here", "a.txt", 1)]
    )


def test_additive_delta_skips_docmap_rebuild_on_legacy_table(spark, tmp_path):
    """r6 verdict task 6: a table with no _docmap sidecar must NOT
    trigger a full-index docmap rebuild inside the micro-batch path —
    the backfill happens at compaction (write_index) or via the
    explicit rebuild_docmap()."""
    import os as _os
    import shutil

    from map_reduce_using_cloud_functions_spark.operators import index as ix

    path = str(tmp_path / "idx")
    mk = lambda doc, text: build_index(
        spark.createDataFrame([(doc, text)], "document string, text string")
    )
    ix.write_index(mk("a.txt", "alpha beta"), path)
    shutil.rmtree(_os.path.join(path, "_docmap"))  # simulate a pre-sidecar table

    ix.write_additive_delta(spark, mk("b.txt", "beta gamma"), path, 1)
    assert not _os.path.exists(
        _os.path.join(path, "_docmap")
    ), "micro-batch path rebuilt the sidecar (full scan in-stream)"
    # logical view unaffected
    assert ("beta", "b.txt", 1) in set(map(tuple, ix.read_index(spark, path).collect()))

    # explicit out-of-band backfill restores it, covering base + deltas
    ix.rebuild_docmap(spark, path)
    assert _os.path.exists(_os.path.join(path, "_docmap"))
    got = sorted(
        map(
            tuple,
            spark.read.parquet(_os.path.join(path, "_docmap"))
            .select("document", "first")
            .collect(),
        )
    )
    want = sorted(map(tuple, ix._doc_letters(ix.read_index(spark, path)).collect()))
    assert got == want


def test_should_compact_size_and_count_triggers(spark, tmp_path):
    """r6 verdict task 5: the bytes-ratio trigger fires on tail growth
    relative to the base, not on batch count — a big base with a tiny
    tail stays un-compacted where the count trigger would have paid a
    full O(base) rewrite."""
    from map_reduce_using_cloud_functions_spark.operators import index as ix

    path = str(tmp_path / "idx")
    big_text = " ".join(f"w{i % 997} common" for i in range(20000))
    mk = lambda doc, text: build_index(
        spark.createDataFrame([(doc, text)], "document string, text string")
    )
    ix.write_index(mk("big.txt", big_text), path, versioned=True)
    assert ix.should_compact(spark, path, max_pending=1, max_tail_ratio=0.5) is False

    # tiny delta: count trigger would fire, the ratio trigger must not
    ix.write_additive_delta(spark, mk("tiny.txt", "one two"), path, 1)
    assert ix.should_compact(spark, path, max_pending=1) is True
    assert ix.should_compact(spark, path, max_tail_ratio=0.5) is False

    info = ix.index_size_info(spark, path)
    assert info["pending_batches"] == [1]
    assert 0 < info["tail_bytes"] < 0.5 * info["base_bytes"]

    # grow the tail past the ratio: comparable-sized delta
    ix.write_additive_delta(spark, mk("big2.txt", big_text), path, 2)
    assert ix.should_compact(spark, path, max_tail_ratio=0.5) is True
    ix.compact_index(spark, path)
    assert ix.should_compact(spark, path, max_pending=1, max_tail_ratio=0.5) is False


def test_index_exists_ignores_uncommitted_carcass(spark, tmp_path):
    """index_exists: a versioned build that died before its commit file
    (v-dir present, no commit) and a bare directory are NOT an index;
    committed in-place (_SUCCESS) and versioned (commit file) are."""
    import os as _os

    from map_reduce_using_cloud_functions_spark.operators import index as ix

    mk = lambda doc, text: build_index(
        spark.createDataFrame([(doc, text)], "document string, text string")
    )
    assert ix.index_exists(spark, str(tmp_path / "nope")) is False

    carcass = str(tmp_path / "carcass")
    _os.makedirs(_os.path.join(carcass, "v=0"))
    with open(_os.path.join(carcass, "v=0", "junk"), "w") as f:
        f.write("partial")
    assert ix.index_exists(spark, carcass) is False

    inplace = str(tmp_path / "inplace")
    ix.write_index(mk("a.txt", "x"), inplace)
    assert ix.index_exists(spark, inplace) is True

    versioned = str(tmp_path / "versioned")
    ix.write_index(mk("a.txt", "x"), versioned, versioned=True)
    assert ix.index_exists(spark, versioned) is True


def test_cli_info_compact_gc(spark, tmp_path, capsys):
    """The r7 maintenance trio: info reports layout/watermark/tail,
    compact honors the size policy gate, gc reclaims folded deltas on
    the versioned layout."""
    from map_reduce_using_cloud_functions_spark.__main__ import main
    from map_reduce_using_cloud_functions_spark.operators import index as ix

    corpus = tmp_path / "corpus"
    corpus.mkdir()
    (corpus / "a.txt").write_text("apple banana " * 200)
    idx = str(tmp_path / "idx")
    assert main(["build", str(corpus), idx, "--versioned"], spark=spark) == 0
    mk = lambda doc, text: ix.build_index(
        spark.createDataFrame([(doc, text)], "document string, text string")
    )
    ix.write_additive_delta(spark, mk("b.txt", "cherry"), idx, 1)
    capsys.readouterr()

    assert main(["info", idx], spark=spark) == 0
    out = dict(
        line.split("\t", 1) for line in capsys.readouterr().out.strip().splitlines()
    )
    assert out["layout"].startswith("versioned") and out["folded_through"] == "-1"
    assert out["pending_batches"] == "[1]"
    assert int(out["tail_bytes"]) > 0

    # size-gated compact: tiny tail under a huge ratio -> refused
    assert main(["compact", idx, "--if-tail-ratio", "0.99"], spark=spark) == 0
    assert capsys.readouterr().out.startswith("not compacting")
    assert ix.pending_additive_batches(spark, idx) == [1]

    # unconditional compact folds, gc reclaims the superseded partition
    assert main(["compact", idx], spark=spark) == 0
    assert "compacted 1 pending" in capsys.readouterr().out
    assert ix.pending_additive_batches(spark, idx) == []
    assert main(["gc", idx, "--keep", "1"], spark=spark) == 0
    capsys.readouterr()
    import os as _os

    add_dir = _os.path.join(idx, "_additive")
    assert not _os.path.exists(add_dir) or not [
        d for d in _os.listdir(add_dir) if d.startswith("abatch=")
    ]
    # the logical table survived the whole lifecycle
    rows = {(r["word"], r["document"]) for r in ix.read_index(spark, idx).collect()}
    assert ("cherry", "b.txt") in rows and ("apple", "a.txt") in rows

    assert main(["info", str(tmp_path / "nope")], spark=spark) == 2


def test_inplace_compaction_preserves_stream_binding(spark, tmp_path):
    """The in-place fold's static overwrite wipes every top-level file;
    compact_index must restore the stream-checkpoint binding so an
    explicit-ratio in-place stream keeps its replay/fresh-checkpoint
    discrimination across folds."""
    import os as _os

    from map_reduce_using_cloud_functions_spark.operators import index as ix
    from map_reduce_using_cloud_functions_spark.streaming.file_index import (
        _bind_checkpoint,
    )

    path = str(tmp_path / "idx")
    mk = lambda doc, text: build_index(
        spark.createDataFrame([(doc, text)], "document string, text string")
    )
    ix.write_index(mk("a.txt", "one two"), path)  # in-place
    _bind_checkpoint(spark, path, str(tmp_path / "ckpt"))
    marker = _os.path.join(path, ix.STREAM_BINDING)
    before = open(marker, "rb").read()

    ix.write_additive_delta(spark, mk("b.txt", "three"), path, 1)
    ix.compact_index(spark, path)

    assert ix.index_version(spark, path) is None  # still in-place
    assert _os.path.exists(marker), "in-place fold lost the binding"
    assert open(marker, "rb").read() == before


def test_additive_delta_requires_committed_base(spark, tmp_path):
    """write_additive_delta enforces its precondition: a delta against
    a missing/uncommitted base is refused (it would create an
    unreadable delta-only table), with the remedy in the message."""
    import pytest

    from map_reduce_using_cloud_functions_spark.operators import index as ix

    delta = build_index(
        spark.createDataFrame([("a.txt", "word")], "document string, text string")
    )
    with pytest.raises(ValueError, match="no committed index"):
        ix.write_additive_delta(spark, delta, str(tmp_path / "nope"), 0)


# --- time travel (r7: snapshot reads + changelog over the commit log) ------


def test_time_travel_history_and_snapshot_reads(spark, tmp_path):
    """Every committed version stays readable exactly as committed:
    history lists the commit log, read_index_at(v) serves the immutable
    v=N base, and pending deltas move the HEAD view only — a snapshot
    must reproduce identically while the live table keeps ingesting."""
    from map_reduce_using_cloud_functions_spark.operators import index as ix

    path = str(tmp_path / "idx")
    ix.write_index(_mk_idx(spark, [("a.txt", "hello world hello")]), path, versioned=True)
    ix.write_index(
        _mk_idx(spark, [("a.txt", "bye world"), ("b.txt", "world")]), path
    )

    assert ix.index_history(spark, path) == [
        {"v": 0, "folded_through": -1},
        {"v": 1, "folded_through": -1},
    ]
    v0 = sorted(map(tuple, ix.read_index_at(spark, path, 0).collect()))
    assert v0 == [("hello", "a.txt", 2), ("world", "a.txt", 1)]
    v1 = sorted(map(tuple, ix.read_index_at(spark, path, 1).collect()))
    assert v1 == [("bye", "a.txt", 1), ("world", "a.txt", 1), ("world", "b.txt", 1)]

    # a pending additive delta is visible at head, not in any snapshot
    ix.write_additive_delta(
        spark, _mk_idx(spark, [("c.txt", "world")]), path, batch_id=0
    )
    head = sorted(map(tuple, ix.read_index(spark, path).collect()))
    assert ("world", "c.txt", 1) in head
    assert sorted(map(tuple, ix.read_index_at(spark, path, 1).collect())) == v1

    # snapshot reads prune like the head read: letter predicate reaches
    # the v=N scan as a partition filter
    pruned = ix.read_index_at(spark, path, 1, first_letter="w")
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "= w" in plan


def test_index_diff_between_versions(spark, tmp_path):
    """The changelog: inserts carry count_from=0, deletes count_to=0,
    count changes carry both, unchanged postings are absent, and the
    diff is symmetric under swapping endpoints (delta negates)."""
    from map_reduce_using_cloud_functions_spark.operators import index as ix

    path = str(tmp_path / "idx")
    ix.write_index(
        _mk_idx(spark, [("a.txt", "hello world hello"), ("b.txt", "stale")]),
        path,
        versioned=True,
    )
    ix.write_index(
        _mk_idx(spark, [("a.txt", "hello world world"), ("c.txt", "fresh")]), path
    )

    got = {
        (r["word"], r["document"]): (r["count_from"], r["count_to"], r["delta"])
        for r in ix.index_diff(spark, path, 0, 1).collect()
    }
    assert got == {
        ("hello", "a.txt"): (2, 1, -1),
        ("world", "a.txt"): (1, 2, 1),
        ("stale", "b.txt"): (1, 0, -1),
        ("fresh", "c.txt"): (0, 1, 1),
    }
    swapped = {
        (r["word"], r["document"]): r["delta"]
        for r in ix.index_diff(spark, path, 1, 0).collect()
    }
    assert swapped == {k: -v[2] for k, v in got.items()}


def test_time_travel_horizon_is_gc_policy(spark, tmp_path):
    """GC bounds the time-travel horizon deliberately: a reclaimed
    version raises naming the surviving commits (never silently serves
    stale files), and an in-place table has no history at all."""
    import pytest

    from map_reduce_using_cloud_functions_spark.operators import index as ix

    path = str(tmp_path / "idx")
    ix.write_index(_mk_idx(spark, [("a.txt", "one")]), path, versioned=True)
    ix.write_index(_mk_idx(spark, [("a.txt", "two")]), path)
    ix.write_index(_mk_idx(spark, [("a.txt", "three")]), path)
    ix.gc_index_versions(spark, path, keep=2)
    assert [h["v"] for h in ix.index_history(spark, path)] == [1, 2]
    with pytest.raises(ValueError, match=r"no committed version 0.*keep"):
        ix.read_index_at(spark, path, 0)

    flat = str(tmp_path / "flat")
    ix.write_index(_mk_idx(spark, [("a.txt", "one")]), flat, versioned=False)
    assert ix.index_history(spark, flat) == []
    with pytest.raises(ValueError, match="in-place"):
        ix.read_index_at(spark, flat, 0)


def test_cli_history_and_diff(spark, tmp_path, capsys):
    """history prints the commit log; diff prints the posting-level
    changelog with signed deltas; an in-place table reports no
    history instead of inventing one."""
    from map_reduce_using_cloud_functions_spark.__main__ import main
    from map_reduce_using_cloud_functions_spark.operators import index as ix

    idx = str(tmp_path / "idx")
    ix.write_index(_mk_idx(spark, [("a.txt", "apple apple")]), idx, versioned=True)
    ix.write_index(_mk_idx(spark, [("a.txt", "apple pear")]), idx)
    capsys.readouterr()

    assert main(["history", idx], spark=spark) == 0
    lines = capsys.readouterr().out.strip().splitlines()
    assert lines == ["v=0\tfolded_through=-1", "v=1\tfolded_through=-1"]

    assert main(["diff", idx, "0", "1"], spark=spark) == 0
    out = capsys.readouterr().out
    assert "apple\ta.txt\t2->1\t-1" in out
    assert "pear\ta.txt\t0->1\t+1" in out

    flat = str(tmp_path / "flat")
    ix.write_index(_mk_idx(spark, [("a.txt", "x")]), flat, versioned=False)
    assert main(["history", flat], spark=spark) == 0
    assert "no history" in capsys.readouterr().out


def test_rollback_restores_snapshot_as_new_commit(spark, tmp_path, capsys):
    """Rollback is append-only history: the restored content lands as a
    NEW commit, pending deltas of the abandoned head are superseded by
    its watermark, and a stream-bound table refuses with the remedy."""
    from map_reduce_using_cloud_functions_spark.__main__ import main
    from map_reduce_using_cloud_functions_spark.operators import index as ix

    path = str(tmp_path / "idx")
    ix.write_index(_mk_idx(spark, [("a.txt", "good good")]), path, versioned=True)
    ix.write_index(_mk_idx(spark, [("a.txt", "corrupted")]), path)
    ix.write_additive_delta(
        spark, _mk_idx(spark, [("b.txt", "noise")]), path, batch_id=7
    )

    v = ix.rollback_index(spark, path, 0)
    assert v == 2
    # head == the v0 snapshot; the abandoned head's delta is superseded
    assert sorted(map(tuple, ix.read_index(spark, path).collect())) == [
        ("good", "a.txt", 2)
    ]
    assert ix.pending_additive_batches(spark, path) == []
    # the keep=2 GC window holds the new head + the abandoned head
    assert [h["v"] for h in ix.index_history(spark, path)] == [1, 2]

    # CLI twin
    capsys.readouterr()
    assert main(["rollback", path, "1"], spark=spark) == 0
    assert "new v=3" in capsys.readouterr().out
    assert sorted(map(tuple, ix.read_index(spark, path).collect())) == [
        ("corrupted", "a.txt", 1)
    ]

    # stream-bound tables refuse
    from map_reduce_using_cloud_functions_spark.streaming.file_index import (
        _bind_checkpoint,
    )

    _bind_checkpoint(spark, path, str(tmp_path / "ck"))
    import pytest as _pytest

    with _pytest.raises(ValueError, match="owned by streaming checkpoint"):
        ix.rollback_index(spark, path, 2)


# --- letter-scoped (layered) compaction (r8) -------------------------------


def test_scoped_compaction_folds_only_touched_letters(spark, tmp_path):
    """A scoped fold rewrites ONLY the letters the delta tail touches
    into the new version dir; untouched letters stay owned by (and
    physically in) the old dir via the commit's letter_map. Answers
    identical to a full fold; point lookups on untouched letters read
    the OLD dir; deltas are logically folded (watermark)."""
    import os

    from map_reduce_using_cloud_functions_spark.operators import index as ix

    path = str(tmp_path / "idx")
    ix.write_index(
        _mk_idx(spark, [("a.txt", "hello world zebra"), ("b.txt", "apple")]),
        path,
        versioned=True,
    )
    # tail touches only 'h' and 'a'
    ix.write_additive_delta(spark, _mk_idx(spark, [("c.txt", "hello apple")]), path, 1)
    expected = sorted(
        map(tuple, ix.read_index(spark, path).collect())
    )
    ix.compact_index(spark, path, scoped="auto")
    assert ix.index_version(spark, path) == 1
    assert ix.pending_additive_batches(spark, path) == []
    assert sorted(map(tuple, ix.read_index(spark, path).collect())) == expected

    # v=1 holds ONLY the touched letters; w/z live solely in v=0
    v1 = os.path.join(path, "v=1")
    assert sorted(os.listdir(v1)) != []
    assert {d for d in os.listdir(v1) if d.startswith("first=")} == {
        "first=a",
        "first=h",
    }
    lm = ix._commit_letter_map(spark, path, 1)
    assert lm == {"a": 1, "h": 1, "w": 0, "z": 0}

    # point lookups resolve through the map on both sides
    assert [tuple(r) for r in ix.lookup_persisted(spark, path, "hello").collect()] == [
        ("a.txt", 1),
        ("c.txt", 1),
    ]
    assert [tuple(r) for r in ix.lookup_persisted(spark, path, "zebra").collect()] == [
        ("a.txt", 1)
    ]

    # snapshot + diff resolve layered commits too
    assert sorted(
        map(tuple, ix.read_index_at(spark, path, 0).collect())
    ) != expected
    diff = {
        (r["word"], r["document"]): r["delta"]
        for r in ix.index_diff(spark, path, 0, 1).collect()
    }
    assert diff == {("hello", "c.txt"): 1, ("apple", "c.txt"): 1}


def test_scoped_compaction_crash_before_commit_is_invisible(spark, tmp_path, monkeypatch):
    """Failure injection: a scoped fold that wrote its v=1 letter dirs
    but died before the commit file landed leaves the old commit
    serving exact counts (deltas still pending); the replayed fold
    overwrites the orphan and converges."""
    from map_reduce_using_cloud_functions_spark.operators import index as ix

    path = str(tmp_path / "idx")
    ix.write_index(_mk_idx(spark, [("a.txt", "hello world")]), path, versioned=True)
    ix.write_additive_delta(spark, _mk_idx(spark, [("b.txt", "hello")]), path, 1)
    expected = sorted(map(tuple, ix.read_index(spark, path).collect()))

    real = ix._write_commit

    def boom(*a, **k):
        raise IOError("injected crash before commit")

    monkeypatch.setattr(ix, "_write_commit", boom)
    with _pytest.raises(IOError, match="injected"):
        ix.compact_index(spark, path, scoped=True)
    monkeypatch.setattr(ix, "_write_commit", real)

    # old commit still serves; batch still pending (fold invisible)
    assert ix.index_version(spark, path) == 0
    assert ix.pending_additive_batches(spark, path) == [1]
    assert sorted(map(tuple, ix.read_index(spark, path).collect())) == expected

    # replay converges: same fold lands as v=1, counts exact once
    ix.compact_index(spark, path, scoped=True)
    assert ix.index_version(spark, path) == 1
    assert ix.pending_additive_batches(spark, path) == []
    assert sorted(map(tuple, ix.read_index(spark, path).collect())) == expected


def test_scoped_compaction_layer_cap_flattens(spark, tmp_path):
    """scoped='auto' folds scoped until the commit would reference more
    than max_layers dirs, then flattens with a full fold — the commit
    comes back self-contained and upserts are legal again."""
    from map_reduce_using_cloud_functions_spark.operators import index as ix

    path = str(tmp_path / "idx")
    ix.write_index(_mk_idx(spark, [("a.txt", "alpha bravo charlie")]), path, versioned=True)
    # each batch touches a fresh letter -> owner count grows per fold
    words = ["delta", "echo", "foxtrot", "golf"]
    for i, w in enumerate(words, start=1):
        ix.write_additive_delta(spark, _mk_idx(spark, [(f"d{i}.txt", w)]), path, i)
        ix.compact_index(spark, path, scoped="auto", max_layers=3)
    # by the last fold the cap must have forced at least one flatten
    lm = ix._commit_letter_map(spark, path, ix.index_version(spark, path))
    assert lm is None or len(set(lm.values())) <= 3
    expected_words = {"alpha", "bravo", "charlie", *words}
    got = {r["word"] for r in ix.read_index(spark, path).collect()}
    assert got == expected_words

    # explicit flatten with empty tail re-enables upserts
    ix.compact_index(spark, path, scoped=False)
    assert ix._commit_letter_map(spark, path, ix.index_version(spark, path)) is None
    ix.upsert_index(spark, _mk_idx(spark, [("a.txt", "alpha")]), path)
    assert ("alpha", "a.txt", 1) in set(
        map(tuple, ix.read_index(spark, path).collect())
    )


def test_scoped_compaction_gc_keeps_referenced_dirs(spark, tmp_path):
    """GC must retain any version dir a kept commit's letter_map still
    references, even past the keep horizon — and still reclaim folded
    delta partitions and unreferenced dirs."""
    import os

    from map_reduce_using_cloud_functions_spark.operators import index as ix

    path = str(tmp_path / "idx")
    ix.write_index(_mk_idx(spark, [("a.txt", "alpha zulu")]), path, versioned=True)
    for i in range(1, 4):  # three scoped folds all touching 'b'
        ix.write_additive_delta(spark, _mk_idx(spark, [(f"d{i}.txt", "bravo")]), path, i)
        ix.compact_index(spark, path, scoped=True)
    assert ix.index_version(spark, path) == 3
    ix.gc_index_versions(spark, path, keep=1)
    # v=0 still owns 'a' and 'z' for the kept head -> dir retained,
    # commit file expired; v=1/v=2 are unreferenced -> reclaimed
    assert os.path.exists(os.path.join(path, "v=0", "first=a"))
    assert not os.path.exists(os.path.join(path, "v=1"))
    assert not os.path.exists(os.path.join(path, "v=2"))
    assert ix._list_commits(spark, path) == [3]
    got = sorted(map(tuple, ix.read_index(spark, path).collect()))
    assert got == [
        ("alpha", "a.txt", 1),
        ("bravo", "d1.txt", 1),
        ("bravo", "d2.txt", 1),
        ("bravo", "d3.txt", 1),
        ("zulu", "a.txt", 1),
    ]


def test_layered_head_refuses_replace_upsert(spark, tmp_path):
    """A layered commit cannot serve in-place partition upserts —
    refuse loudly and name the flatten path."""
    from map_reduce_using_cloud_functions_spark.operators import index as ix

    path = str(tmp_path / "idx")
    ix.write_index(_mk_idx(spark, [("a.txt", "hello world")]), path, versioned=True)
    ix.write_additive_delta(spark, _mk_idx(spark, [("b.txt", "hello")]), path, 1)
    ix.compact_index(spark, path, scoped=True)
    with _pytest.raises(ValueError, match="layered"):
        ix.upsert_index(spark, _mk_idx(spark, [("b.txt", "bye")]), path)


# --- concurrent-writer fence (r8) -----------------------------------------


def test_stale_commit_cas_is_refused(spark, tmp_path):
    """A writer that observed an old head and tries to commit after
    another writer advanced the table is refused at the commit CAS —
    loudly, with the winner's work preserved."""
    from map_reduce_using_cloud_functions_spark.operators import index as ix

    path = str(tmp_path / "idx")
    ix.write_index(_mk_idx(spark, [("a.txt", "one")]), path, versioned=True)
    ix.write_index(_mk_idx(spark, [("a.txt", "two")]), path)  # head -> 1
    # stale writer still believes head is 0 and targets v=1
    with _pytest.raises(ix.ConcurrentWriteError, match="CAS failed"):
        ix._write_commit(spark, path, 1, folded_through=-1)
    assert ix.index_version(spark, path) == 1
    assert sorted(map(tuple, ix.read_index(spark, path).collect())) == [
        ("two", "a.txt", 1)
    ]


def test_interleaved_full_rebuilds_one_loudly_refused(spark, tmp_path, monkeypatch):
    """Two interleaved write_index rebuilds on one table: writer B
    starts its fold at head 0; writer A completes a full rebuild while
    B's data job runs; B's claim of the now-taken slot must raise
    ConcurrentWriteError WITHOUT touching A's committed data (the
    pre-fence flow wrote straight into v=1 and clobbered A)."""
    from map_reduce_using_cloud_functions_spark.operators import index as ix

    path = str(tmp_path / "idx")
    ix.write_index(_mk_idx(spark, [("a.txt", "base")]), path, versioned=True)

    real_write_base = ix._write_base
    state = {"fired": False}

    def interleave(index_df, target):
        real_write_base(index_df, target)
        if not state["fired"]:
            state["fired"] = True
            # writer A completes its whole rebuild while B is staged
            ix.write_index(_mk_idx(spark, [("a.txt", "winner")]), path)

    monkeypatch.setattr(ix, "_write_base", interleave)
    with _pytest.raises(ix.ConcurrentWriteError, match="claimed"):
        ix.write_index(_mk_idx(spark, [("a.txt", "loser")]), path)
    monkeypatch.undo()

    assert ix.index_version(spark, path) == 1
    assert sorted(map(tuple, ix.read_index(spark, path).collect())) == [
        ("winner", "a.txt", 1)
    ]
    # loser's staging was discarded; gc cleans any leftovers
    ix.gc_index_versions(spark, path)
    import os

    assert not [d for d in os.listdir(path) if d.startswith(".staging-")]


# --- r9 ADVICE regressions -------------------------------------------------


def test_gc_reclaims_dir_after_referencing_commit_expires(spark, tmp_path):
    """The r8 leak: a version dir retained only because a kept commit's
    letter_map referenced it lost its .commit file in the same GC pass,
    so once the referencing commit itself expired, a commit-file walk
    never revisited the dir — it leaked forever. The sweep now lists
    v=* dirs on disk: after a flatten drops the reference, the next GC
    must reclaim the orphan."""
    import os

    from map_reduce_using_cloud_functions_spark.operators import index as ix

    path = str(tmp_path / "idx")
    ix.write_index(_mk_idx(spark, [("a.txt", "alpha zulu")]), path, versioned=True)
    for i in range(1, 3):  # scoped folds keep v=0 referenced for 'a'/'z'
        ix.write_additive_delta(spark, _mk_idx(spark, [(f"d{i}.txt", "bravo")]), path, i)
        ix.compact_index(spark, path, scoped=True)
    ix.gc_index_versions(spark, path, keep=1)
    assert os.path.exists(os.path.join(path, "v=0"))  # referenced, kept
    assert ix._list_commits(spark, path) == [2]
    # flatten: the new head is self-contained, v=0 loses its last ref
    ix.compact_index(spark, path, scoped=False)
    ix.gc_index_versions(spark, path, keep=1)
    assert not os.path.exists(os.path.join(path, "v=0"))
    assert not os.path.exists(os.path.join(path, "v=2"))
    got = sorted(map(tuple, ix.read_index(spark, path).collect()))
    assert got == [
        ("alpha", "a.txt", 1),
        ("bravo", "d1.txt", 1),
        ("bravo", "d2.txt", 1),
        ("zulu", "a.txt", 1),
    ]


def test_claim_stomp_refused_at_commit_token(spark, tmp_path):
    """The residual claim-stomp race (self-heal deleting a LIVE writer's
    claimed dir) must surface as a loud ConcurrentWriteError at the
    loser's commit, never a silent commit over replaced data: each
    claim carries a token and _write_commit verifies its own."""
    import pytest

    from map_reduce_using_cloud_functions_spark.operators import index as ix

    path = str(tmp_path / "idx")
    ix.write_index(_mk_idx(spark, [("a.txt", "base")]), path, versioned=True)

    staging_a = ix._staging_dir(path)
    ix._write_base(_mk_idx(spark, [("a.txt", "loser")]), staging_a)
    token_a = ix._claim_version_dir(spark, path, staging_a, 1)

    # concurrent writer's self-heal: treats the in-flight claim as a
    # crashed one, deletes it, and re-claims the slot with its own data
    ix._hadoop_delete(spark, ix._version_dir(path, 1))
    staging_b = ix._staging_dir(path)
    ix._write_base(_mk_idx(spark, [("a.txt", "winner")]), staging_b)
    token_b = ix._claim_version_dir(spark, path, staging_b, 1)

    with pytest.raises(ix.ConcurrentWriteError, match="token"):
        ix._write_commit(spark, path, 1, folded_through=-1, claim_token=token_a)
    # the slot's actual owner commits fine
    ix._write_commit(spark, path, 1, folded_through=-1, claim_token=token_b)
    assert sorted(map(tuple, ix.read_index(spark, path).collect())) == [
        ("winner", "a.txt", 1)
    ]


def test_scoped_true_on_unversioned_table_raises(spark, tmp_path):
    """compact_index(scoped=True) is a versioned-tables-only contract —
    forcing it on an in-place table must refuse loudly instead of
    silently running a full O(base) in-place fold."""
    import pytest

    from map_reduce_using_cloud_functions_spark.operators import index as ix

    path = str(tmp_path / "idx")
    ix.write_index(_mk_idx(spark, [("a.txt", "hello")]), path)  # in-place
    ix.write_additive_delta(spark, _mk_idx(spark, [("b.txt", "world")]), path, 1)
    with pytest.raises(ValueError, match="versioned"):
        ix.compact_index(spark, path, scoped=True)
    # 'auto' still falls back to the full fold on this layout
    ix.compact_index(spark, path, scoped="auto")
    got = sorted(map(tuple, ix.read_index(spark, path).collect()))
    assert got == [("hello", "a.txt", 1), ("world", "b.txt", 1)]


# --- r9: deletion / takedown -------------------------------------------------


def test_delete_documents_versioned_scoped(spark, tmp_path):
    """delete_documents on a versioned table: a letter-scoped tombstone
    fold purges the documents from the base AND the pending delta tail
    (a tail row left pending would resurrect them at the next fold),
    rewriting only the touched letters under one layered commit."""
    import os

    from map_reduce_using_cloud_functions_spark.operators import index as ix

    path = str(tmp_path / "idx")
    ix.write_index(
        _mk_idx(
            spark,
            [("a.txt", "alpha zulu"), ("b.txt", "alpha bravo"), ("c.txt", "zulu")],
        ),
        path,
        versioned=True,
    )
    # pending tail: doomed doc appears in the tail too
    ix.write_additive_delta(
        spark, _mk_idx(spark, [("b.txt", "delta"), ("d.txt", "echo")]), path, 1
    )
    ix.delete_documents(spark, path, ["b.txt"])
    got = sorted(map(tuple, ix.read_index(spark, path).collect()))
    assert got == [
        ("alpha", "a.txt", 1),
        ("echo", "d.txt", 1),
        ("zulu", "a.txt", 1),
        ("zulu", "c.txt", 1),
    ]
    # the tail folded with the delete: nothing pending, watermark covers it
    assert ix.pending_additive_batches(spark, path) == []
    # scoped: the commit is layered; untouched letter dirs were NOT rewritten
    v = ix.index_version(spark, path)
    lm = ix._commit_letter_map(spark, path, v)
    assert lm is not None and lm["z"] < v  # 'z' untouched by b.txt or tail
    # a compaction later must not resurrect; lookups prune as usual
    ix.compact_index(spark, path, scoped=False)
    assert sorted(
        (r["document"], r["count"])
        for r in ix.lookup_persisted(spark, path, "alpha").collect()
    ) == [("a.txt", 1)]


def test_delete_documents_crash_leaves_old_commit(spark, tmp_path, monkeypatch):
    """A kill between the staged tombstone fold and its commit leaves
    the previous commit serving (documents still present — deletion is
    durable only at the commit); the replay converges."""
    import pytest

    from map_reduce_using_cloud_functions_spark.operators import index as ix

    path = str(tmp_path / "idx")
    ix.write_index(
        _mk_idx(spark, [("a.txt", "alpha"), ("b.txt", "alpha bravo")]),
        path,
        versioned=True,
    )

    def boom(*a, **k):
        raise RuntimeError("injected crash before commit")

    monkeypatch.setattr(ix, "_write_commit", boom)
    with pytest.raises(RuntimeError, match="injected"):
        ix.delete_documents(spark, path, ["b.txt"])
    monkeypatch.undo()
    got = sorted(map(tuple, ix.read_index(spark, path).collect()))
    assert ("bravo", "b.txt", 1) in got  # old commit intact
    ix.delete_documents(spark, path, ["b.txt"])  # replay converges
    got = sorted(map(tuple, ix.read_index(spark, path).collect()))
    assert got == [("alpha", "a.txt", 1)]


def test_delete_documents_in_place_table(spark, tmp_path):
    """In-place layout: one full filtered rewrite, tail folded, stream
    binding preserved, watermark advanced."""
    from map_reduce_using_cloud_functions_spark.operators import index as ix

    path = str(tmp_path / "idx")
    ix.write_index(_mk_idx(spark, [("a.txt", "alpha"), ("b.txt", "bravo")]), path)
    ix.write_additive_delta(spark, _mk_idx(spark, [("b.txt", "bravo")]), path, 1)
    ix._write_small_file(spark, f"{path}/{ix.STREAM_BINDING}", b"/ck/1")
    ix.delete_documents(spark, path, ["b.txt"])
    got = sorted(map(tuple, ix.read_index(spark, path).collect()))
    assert got == [("alpha", "a.txt", 1)]
    assert ix._read_small_file(spark, f"{path}/{ix.STREAM_BINDING}") == b"/ck/1"
    # the folded batch must not replay (watermark covers it)
    ix.write_additive_delta(
        spark, _mk_idx(spark, [("b.txt", "bravo")]), path, 1, allow_replayed_ids=True
    )
    assert sorted(map(tuple, ix.read_index(spark, path).collect())) == got


def test_delete_unknown_document_is_noop(spark, tmp_path):
    from map_reduce_using_cloud_functions_spark.operators import index as ix

    path = str(tmp_path / "idx")
    ix.write_index(_mk_idx(spark, [("a.txt", "alpha")]), path, versioned=True)
    v = ix.index_version(spark, path)
    ix.delete_documents(spark, path, ["nope.txt"])
    assert ix.index_version(spark, path) == v  # no rewrite, no commit
    assert sorted(map(tuple, ix.read_index(spark, path).collect())) == [
        ("alpha", "a.txt", 1)
    ]


def test_small_file_replace_never_deletes_target(spark, tmp_path):
    """ADVICE r9: the marker replace must be a single atomic swap —
    the old delete-then-rename pair had a crash window with NO file on
    disk, exactly what the _foreign_releases call sites promise cannot
    happen. Locally the swap is rename(2)-over-existing; assert the
    overwrite works repeatedly, leaves no temp litter, and that the
    implementation no longer pre-deletes the target (a delete would
    show up as a rename onto a nonexistent path, which the strict-FS
    fallback branch would then skip)."""
    import os

    from map_reduce_using_cloud_functions_spark.operators import index as ix

    d = tmp_path / "markers"
    d.mkdir()
    path = str(d / "_marker")
    for i in range(5):
        ix._write_small_file(spark, path, f"content-{i}".encode("ascii"))
        assert ix._read_small_file(spark, path) == f"content-{i}".encode("ascii")
        # the target exists at every step (no observable missing window)
        assert os.path.exists(path)
    leftovers = [f for f in os.listdir(d) if f.endswith(".tmp")]
    assert leftovers == []
    # Hadoop's checksum shadow files are allowed; nothing else is
    names = {f for f in os.listdir(d) if not f.startswith(".")}
    assert names == {"_marker"}
