"""Distributed BPE trainer vs an independent pure-Python classic BPE
(Sennrich get_stats/merge_vocab walk): identical merge sequences,
identical encodings, deterministic under repartitioning."""

from __future__ import annotations

from collections import Counter

import pytest

from map_reduce_using_cloud_functions_spark.operators.bpe import (
    bpe_token_counts,
    train_bpe,
)

# the Sennrich paper's running example vocabulary, as documents
CORPUS = [
    (1, "low low low low low"),
    (2, "lower lower widest widest widest"),
    (3, "newest newest newest newest newest newest"),
]
END = "·"


def _py_words(docs):
    counts = Counter()
    for _, text in docs:
        for w in text.split():
            counts[w] += 1
    return {w: (list(w) + [END], n) for w, n in counts.items()}


def _py_stats(vocab):
    stats = Counter()
    for syms, n in vocab.values():
        for i in range(len(syms) - 1):
            stats[(syms[i], syms[i + 1])] += n
    return stats


def _py_merge(syms, a, b):
    out = []
    for s in syms:
        if out and out[-1] == a and s == b:
            out[-1] = a + b
        else:
            out.append(s)
    return out


def _py_train(docs, n_merges, min_count=2):
    vocab = _py_words(docs)
    merges = []
    for _ in range(n_merges):
        stats = _py_stats(vocab)
        if not stats:
            break
        # same tie-break as the Spark argmax: cnt desc, a asc, b asc
        (a, b), cnt = min(
            stats.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        if cnt < min_count:
            break
        merges.append((a, b, cnt))
        vocab = {w: (_py_merge(s, a, b), n) for w, (s, n) in vocab.items()}
    return merges, vocab


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(CORPUS, "doc_id bigint, text string")


def test_merge_sequence_matches_python_reference(spark, docs_df):
    want, _ = _py_train(CORPUS, 15)
    got = train_bpe(docs_df, 15)
    assert got == want
    # the example's signature first merges appear: 'es'/'est' family
    merged_tokens = [a + b for a, b, _ in got]
    assert "es" in merged_tokens and "est" in merged_tokens


def test_token_counts_match_python_encoding(spark, docs_df):
    merges, vocab = _py_train(CORPUS, 10)
    want = Counter()
    for syms, n in vocab.values():
        for s in syms:
            want[s] += n
    got = {
        r["token"]: r["cnt"]
        for r in bpe_token_counts(docs_df, merges).collect()
    }
    assert got == dict(want)


def test_early_stop_when_no_pair_reaches_min_count(spark):
    docs = spark.createDataFrame(
        [(1, "ab cd ef")], "doc_id bigint, text string"
    )
    merges = train_bpe(docs, 10, min_count=2)
    assert merges == []  # every pair occurs once


def test_partition_invariance(spark, docs_df):
    m1 = train_bpe(docs_df.repartition(1), 8)
    m16 = train_bpe(docs_df.repartition(16), 8)
    assert m1 == m16


def test_batched_merges_match_sequential(spark, docs_df):
    """batch_merges > 1 must reproduce the sequential trainer's merge
    list exactly on the Sennrich example (same rules, same order, same
    counts) for several batch sizes."""
    want = train_bpe(docs_df, 15)
    for bs in (2, 4, 8):
        got = train_bpe(docs_df, 15, batch_merges=bs)
        assert got == want, f"batch_merges={bs}: {got} != {want}"


def test_batched_merges_match_sequential_random(spark):
    """Batched ≡ sequential on seeded random small-alphabet corpora —
    the high-collision case where disjoint batches are hardest to form
    (stop-at-first-conflict must degrade gracefully toward batch=1)."""
    import random

    for seed in (3, 17):
        rng = random.Random(seed)
        docs = [
            (
                i,
                " ".join(
                    "".join(
                        rng.choice("abc") for _ in range(rng.randint(1, 6))
                    )
                    for _ in range(rng.randint(3, 12))
                ),
            )
            for i in range(8)
        ]
        df = spark.createDataFrame(docs, "doc_id bigint, text string")
        want, _ = _py_train(docs, 12)
        got = train_bpe(df, 12, batch_merges=4)
        assert got == want, f"seed {seed}: {got} != {want}"


def test_batched_token_counts_consistent(spark, docs_df):
    """Encoding under a batched-trained merge list equals encoding
    under the sequential list (they are the same list)."""
    seq = train_bpe(docs_df, 10)
    bat = train_bpe(docs_df, 10, batch_merges=8)
    assert bat == seq
    a = {r["token"]: r["cnt"] for r in bpe_token_counts(docs_df, seq).collect()}
    b = {r["token"]: r["cnt"] for r in bpe_token_counts(docs_df, bat).collect()}
    assert a == b


def test_random_corpora_match_python_reference(spark):
    """Three seeded random corpora over a small alphabet (high pair
    collision rate — the stress case for merge ordering and overlap
    handling) must reproduce the reference walk exactly."""
    import random

    for seed in (3, 17, 99):
        rng = random.Random(seed)
        docs = [
            (
                i,
                " ".join(
                    "".join(
                        rng.choice("abc") for _ in range(rng.randint(1, 6))
                    )
                    for _ in range(rng.randint(3, 12))
                ),
            )
            for i in range(8)
        ]
        df = spark.createDataFrame(docs, "doc_id bigint, text string")
        want, _ = _py_train(docs, 12)
        got = train_bpe(df, 12)
        assert got == want, f"seed {seed}: {got} != {want}"


def test_batched_parity_on_tie_heavy_sf01_vocabulary(spark):
    """r5 regression: on the sf0.1 fixture vocabulary (31 distinct
    words — tie counts everywhere) the unguarded batch selector
    diverged from sequential at merge 32: the product of ('c','o')
    formed ('co','lu') which TIED the already-selected ('lu','m') at
    9127 and wins the (a asc) tie-break sequentially. The created-pair
    bound guard must stop the batch there; batched ≡ sequential."""
    from map_reduce_using_cloud_functions_spark.sources import load_table

    docs = load_table(spark, "/root/testdata/sf0.1", "documents")
    seq = train_bpe(docs, 40, batch_merges=1)
    st: dict = {}
    bat = train_bpe(docs, 40, batch_merges=8, stats=st)
    assert bat == seq
    assert st["rounds"] < 40  # batching still amortizes rounds


def test_batched_parity_on_zipf_vocabulary(spark):
    """Natural-shape vocabulary (seeded Zipf over generated words):
    the regime batching exists for — wide batches, few conflicts —
    must still match sequential exactly under the guard."""
    import random

    rng = random.Random(5)
    vocab = [
        "".join(
            rng.choice("etaoinshrdlucmfwypvbgk")
            for _ in range(rng.randint(2, 9))
        )
        for _ in range(300)
    ]
    docs = [
        (
            i,
            " ".join(
                vocab[min(int(rng.paretovariate(1.1)) % 300, 299)]
                for _ in range(40)
            ),
        )
        for i in range(60)
    ]
    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    want, _ = _py_train(docs, 25)
    st: dict = {}
    got = train_bpe(df, 25, batch_merges=8, stats=st)
    assert got == want
    assert st["rounds"] <= 25
