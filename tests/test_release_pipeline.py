"""End-to-end release pipeline (the README §End-to-end example, pinned
as a test): JSONL ingest with corrupt-line routing → cross-release
ledger dedup → MinHash near-dedup → learned quality gate →
decontamination → deterministic splits → JSONL export. Every stage's
row accounting is asserted exactly, so the README's promised flow
cannot drift from the operators."""

from __future__ import annotations

import json
import os
import random

import pyspark.sql.functions as F
import pytest

from map_reduce_using_cloud_functions_spark.operators.dedup import (
    dedup_against_reference,
    exact_dedup_groups,
    near_dedup,
)
from map_reduce_using_cloud_functions_spark.operators.pipelines import (
    quality_model_pipeline,
)
from map_reduce_using_cloud_functions_spark.operators.prep import (
    assign_splits,
    decontaminate_clean,
)
from map_reduce_using_cloud_functions_spark.sources.interchange import (
    read_corpus_jsonl,
    write_corpus_jsonl,
)

STOP = ["the", "and", "of", "to", "in", "is", "that", "with"]


def _text(rng: random.Random, n: int = 40) -> str:
    words = []
    for _ in range(n):
        if rng.random() < 0.3:
            words.append(rng.choice(STOP))
        else:
            words.append(f"w{rng.randrange(500)}")
    return " ".join(words)


@pytest.fixture(scope="module")
def raw_dir(tmp_path_factory):
    """30 docs + 1 corrupt line. Plants: doc 10 = already-released text;
    doc 21 = near-dup of doc 20 (one word changed); doc 7 contains an
    8-gram from the eval benchmark."""
    rng = random.Random(42)
    docs = {i: _text(rng) for i in range(30)}
    released = "previously shipped content " + _text(rng, 20)
    docs[10] = released
    docs[21] = docs[20] + " appended"  # near-dup: one extra word
    bench_gram = "evalset token alpha beta gamma delta epsilon zeta"
    docs[7] = docs[7] + " " + bench_gram + " trailing words here"

    d = tmp_path_factory.mktemp("raw")
    with open(os.path.join(d, "part0.json"), "w") as f:
        for i in range(30):
            f.write(
                json.dumps(
                    {"doc_id": i, "text": docs[i], "source": "web", "lang": "en"}
                )
                + "\n"
            )
        f.write('{"doc_id": 999, "text": "truncat\n')  # corrupt line
    meta = {
        "released_text": released,
        "bench_gram": bench_gram,
        "texts": docs,
    }
    return str(d), meta


def test_release_pipeline_end_to_end(spark, raw_dir, tmp_path):
    d, meta = raw_dir
    # 1. ingest: corrupt line routed, not fatal (cache first — Spark
    # disallows corrupt-column-only queries on a raw JSON scan)
    raw = read_corpus_jsonl(spark, os.path.join(d, "part0.json")).cache()
    assert raw.where(F.col("_corrupt_record").isNotNull()).count() == 1
    docs = raw.where("_corrupt_record IS NULL").drop("_corrupt_record")
    assert docs.count() == 30

    # 2. cross-release ledger dedup: the already-shipped text drops
    prior = spark.createDataFrame(
        [(0, meta["released_text"])], "doc_id bigint, text string"
    )
    ledger = exact_dedup_groups(prior).select("text_hash")
    docs = dedup_against_reference(docs, ledger)
    ids = {r["doc_id"] for r in docs.select("doc_id").collect()}
    assert 10 not in ids and len(ids) == 29

    # 3. near-dedup: doc 21 (one word off doc 20) collapses, 20 survives
    docs = near_dedup(docs, threshold=0.4)
    ids = {r["doc_id"] for r in docs.select("doc_id").collect()}
    assert 20 in ids and 21 not in ids and len(ids) == 28

    # 4. learned quality gate: score every doc, keep above threshold
    scored, w = quality_model_pipeline(docs)
    assert scored.count() == 28 and len(w) == 10  # 9 feats + intercept
    kept_ids = {
        r["doc_id"]
        for r in scored.where(F.col("model_score") >= 0.2).collect()
    }
    assert kept_ids  # the synthetic corpus is not all filtered away
    docs = docs.join(
        scored.where(F.col("model_score") >= 0.2), "doc_id", "left_semi"
    )

    # 5. decontamination: the doc embedding a benchmark 8-gram drops
    bench = spark.createDataFrame(
        [(0, meta["bench_gram"])], "doc_id bigint, text string"
    )
    before = {r["doc_id"] for r in docs.select("doc_id").collect()}
    docs = decontaminate_clean(docs, bench)
    after = {r["doc_id"] for r in docs.select("doc_id").collect()}
    assert before - after == ({7} if 7 in before else set())

    # 6. deterministic splits: disjoint, exhaustive, stable
    split1 = assign_splits(docs)
    split2 = assign_splits(docs)
    assert sorted(map(tuple, split1.select("doc_id", "split").collect())) == sorted(
        map(tuple, split2.select("doc_id", "split").collect())
    )
    counts = dict(
        split1.groupBy("split").count().collect()
    )
    assert sum(counts.values()) == len(after)

    # 7. export the train split and re-read it losslessly
    out = str(tmp_path / "release")
    train = split1.where("split = 'train'")
    write_corpus_jsonl(train.select("doc_id", "text", "source", "lang"), out)
    back = read_corpus_jsonl(spark, out).cache()
    assert back.where(F.col("_corrupt_record").isNotNull()).count() == 0
    assert back.count() == train.count()
    assert {r["doc_id"] for r in back.select("doc_id").collect()} == {
        r["doc_id"] for r in train.select("doc_id").collect()
    }
