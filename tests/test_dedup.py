"""Dedup-family property tests (SURVEY.md §5 items 1/4): planted
duplicates must be found; clean corpora must not produce false exact
groups; sketches must behave like the similarity they approximate."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from map_reduce_using_cloud_functions_spark.operators.dedup import (
    exact_dedup,
    exact_dedup_groups,
    jaccard_token_pairs,
    minhash_dedup_pairs,
    minhash_signatures,
    simhash_fingerprints,
)


@pytest.fixture(scope="module")
def corpus_with_dups(spark):
    base = "the quick brown fox jumps over the lazy dog again and again today"
    near = base.replace("today", "tomorrow")  # one-token edit → high Jaccard
    far = "completely different content about spark query engines and shuffles"
    rows = [
        (0, base),
        (1, base),          # exact dup of 0
        (2, near),          # near dup of 0
        (3, far),
        (4, base.upper()),  # exact dup after normalization? NO — dedup is on raw text
    ]
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_exact_dedup_groups(corpus_with_dups):
    groups = {r["keep_id"]: r["n_copies"] for r in exact_dedup_groups(corpus_with_dups).collect()}
    assert groups[0] == 2          # docs 0,1 identical
    assert groups[2] == 1 and groups[3] == 1 and groups[4] == 1
    kept = sorted(r["doc_id"] for r in exact_dedup(corpus_with_dups).collect())
    assert kept == [0, 2, 3, 4]    # min doc_id survives


def test_minhash_finds_planted_near_dup(corpus_with_dups):
    pairs = {
        (r["doc_a"], r["doc_b"]): r["est_jaccard"]
        for r in minhash_dedup_pairs(corpus_with_dups, threshold=0.5).collect()
    }
    assert (0, 1) in pairs and pairs[(0, 1)] == 1.0   # identical text → identical sigs
    assert (0, 2) in pairs and pairs[(0, 2)] >= 0.5   # near dup caught by LSH
    assert not any(3 in p for p in pairs)             # unrelated doc never pairs


def test_minhash_signature_shape(corpus_with_dups):
    sigs = minhash_signatures(corpus_with_dups)
    assert sigs.groupBy("doc_id").count().select(F.min("count")).first()[0] == 16
    # deterministic across runs
    a = sorted(map(tuple, sigs.collect()))
    b = sorted(map(tuple, minhash_signatures(corpus_with_dups).collect()))
    assert a == b


def test_simhash_distance_tracks_similarity(spark, corpus_with_dups):
    fp = {r["doc_id"]: r["simhash"] for r in simhash_fingerprints(corpus_with_dups).collect()}
    ham = lambda a, b: bin(a ^ b).count("1")
    assert fp[0] == fp[1]                      # identical docs → identical fingerprint
    assert ham(fp[0], fp[2]) < ham(fp[0], fp[3])  # near dup closer than unrelated


def test_jaccard_pairs_exact_values(corpus_with_dups):
    pairs = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in jaccard_token_pairs(corpus_with_dups, threshold=0.5).collect()
    }
    assert pairs[(0, 1)] == 1.0
    # base has tokens {the,quick,brown,fox,jumps,over,lazy,dog,again,and,today} (11 distinct)
    # near swaps today→tomorrow: |∩|=10, |∪|=12
    assert pairs[(0, 2)] == round(10 / 12, 6)
    assert (0, 3) not in pairs


def test_sketches_partition_invariant(spark):
    """MinHash signatures and SimHash fingerprints are invariant to the
    input partitioning (the O5/O6/O11 property extended to the sketch
    operators — a shuffled corpus must produce identical sketches)."""
    from map_reduce_using_cloud_functions_spark.sources import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").limit(100)
    base_sig = sorted(map(tuple, minhash_signatures(docs).collect()))
    base_fp = sorted(map(tuple, simhash_fingerprints(docs).collect()))
    for n in (1, 7):
        shuffled = docs.repartition(n)
        assert sorted(map(tuple, minhash_signatures(shuffled).collect())) == base_sig
        assert sorted(map(tuple, simhash_fingerprints(shuffled).collect())) == base_fp


def test_pipeline_composition(spark):
    """prepare_training_corpus = quality gate ∘ dedup ∘ lang tag: planted
    low-quality and duplicate docs are dropped; survivors tagged."""
    from map_reduce_using_cloud_functions_spark.operators.pipelines import (
        prepare_training_corpus,
    )

    good = (
        "the quick brown fox jumps over the lazy dog and then it runs "
        "through the green field with many other animals in the warm sun "
    ) * 3
    docs = spark.createDataFrame(
        [
            (0, good),
            (1, good),        # exact dup of 0 → dropped
            (2, "tiny tiny tiny tiny tiny"),  # low quality (no diversity) → dropped
            (3, good + " unique tail that keeps this one distinct"),
        ],
        "doc_id bigint, text string",
    )
    out = {r["doc_id"]: r for r in prepare_training_corpus(docs, 0.3).collect()}
    assert set(out) == {0, 3}
    assert out[0]["lang_guess"] == "en"
    assert out[0]["n_tokens"] > 50


def test_shingle_jaccard_finds_planted_near_dup(corpus_with_dups):
    """3-gram Jaccard: exact dup pair scores 1.0; one-token-edit pair
    scores high; unrelated docs never pair."""
    from map_reduce_using_cloud_functions_spark.operators.dedup import (
        jaccard_shingle_pairs,
    )

    pairs = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in jaccard_shingle_pairs(corpus_with_dups, threshold=0.2).collect()
    }
    assert pairs[(0, 1)] == 1.0
    # 13 tokens -> 11 shingles; editing the LAST token changes only the
    # final shingle (position 13 appears in exactly one 3-gram):
    # |∩|=10, |∪|=12
    assert pairs[(0, 2)] == round(10 / 12, 6)
    assert not any(3 in p for p in pairs)


def test_dedup_clusters_min_label(spark):
    """Connected components: a chain a-b, b-c plus an isolated pair d-e
    resolve to two clusters labeled by their min member."""
    from map_reduce_using_cloud_functions_spark.operators.dedup import dedup_clusters

    pairs = spark.createDataFrame(
        [(20, 30), (30, 10), (40, 50)], "doc_a bigint, doc_b bigint"
    )
    got = {r["doc_id"]: r["cluster_rep"] for r in dedup_clusters(pairs).collect()}
    assert got == {10: 10, 20: 10, 30: 10, 40: 40, 50: 40}


def test_dedup_clusters_raises_on_non_convergence(spark, monkeypatch):
    """A 6-node chain has diameter 5: min-label needs ~5 rounds, so on
    the ITERATIVE path max_iter=2 must fail loudly instead of returning
    a split component. The r12 driver union-find fast path resolves any
    bounded edge set in one shot regardless of max_iter, so the cap is
    patched to 0 to force the iterative path."""
    import pytest

    from map_reduce_using_cloud_functions_spark.operators import dedup as dd

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(5, 0, -1)], "doc_a bigint, doc_b bigint"
    )
    monkeypatch.setattr(dd, "DRIVER_CC_MAX_EDGES", 0)
    with pytest.raises(RuntimeError, match="did not converge"):
        dd.dedup_clusters(chain, max_iter=2)
    # and with enough rounds the same chain is one component
    got = {
        r["doc_id"]: r["cluster_rep"]
        for r in dd.dedup_clusters(chain, max_iter=25).collect()
    }
    assert set(got.values()) == {1}
    # the fast path (default cap) agrees on the same chain even at
    # max_iter=2 — the bounded union-find needs no rounds
    monkeypatch.setattr(dd, "DRIVER_CC_MAX_EDGES", 200_000)
    fast = {
        r["doc_id"]: r["cluster_rep"]
        for r in dd.dedup_clusters(chain, max_iter=2).collect()
    }
    assert fast == got


def test_near_dedup_keeps_min_id_survivor(corpus_with_dups):
    """MinHash pairs → clusters → survivors: docs 0,1,2,4 cluster (exact
    dup, near dup, and case-variant — the tokenizer lowercases, so doc
    4's shingles equal doc 0's), min id 0 survives; 3 is untouched."""
    from map_reduce_using_cloud_functions_spark.operators.dedup import near_dedup

    kept = sorted(r["doc_id"] for r in near_dedup(corpus_with_dups, threshold=0.5).collect())
    assert kept == [0, 3]


def test_jaccard_max_df_guard_result_invariant(corpus_with_dups):
    """With max_df ≥ the corpus df-max the guard is a no-op (identical
    results); with max_df=1 every shared token is dropped from the join
    side, so no pair can form."""
    base = sorted(
        map(tuple, jaccard_token_pairs(corpus_with_dups, threshold=0.5).collect())
    )
    guarded = sorted(
        map(
            tuple,
            jaccard_token_pairs(corpus_with_dups, threshold=0.5, max_df=10_000).collect(),
        )
    )
    assert base == guarded and base
    none = jaccard_token_pairs(corpus_with_dups, threshold=0.5, max_df=1).collect()
    assert none == []


def test_jaccard_max_df_frac_matches_absolute(corpus_with_dups):
    """max_df_frac is just max_df = floor(frac * n_docs): the fraction
    form must agree with the equivalent absolute cap, and passing both
    is an error."""
    import pytest

    n = corpus_with_dups.count()
    frac = sorted(
        map(
            tuple,
            jaccard_token_pairs(
                corpus_with_dups, threshold=0.5, max_df_frac=0.5
            ).collect(),
        )
    )
    absolute = sorted(
        map(
            tuple,
            jaccard_token_pairs(
                corpus_with_dups, threshold=0.5, max_df=int(0.5 * n)
            ).collect(),
        )
    )
    assert frac == absolute
    with pytest.raises(ValueError):
        jaccard_token_pairs(corpus_with_dups, max_df=2, max_df_frac=0.5)


def test_duplicate_spans_planted_blocks(spark):
    """ExactSubstr-style span detection: a 12-token block shared by two
    docs is recovered as ONE maximal span at the exact positions in
    each doc; unique-text docs produce no spans; a doc repeating its
    own block flags both occurrences."""
    from map_reduce_using_cloud_functions_spark.operators.dedup import (
        duplicate_span_stats,
        duplicate_spans,
    )

    block = " ".join(f"blk{i}" for i in range(12))
    docs = spark.createDataFrame(
        [
            # block at token positions 4..15 (1-based)
            (0, "u0a u0b u0c " + block + " t0x t0y"),
            # block at positions 1..12
            (1, block + " z1a z1b z1c z1d"),
            # all-unique doc
            (2, " ".join(f"only{i}" for i in range(20))),
            # self-repeat: block at 1..12 and again at 16..27
            (3, block + " mid3a mid3b mid3c " + block),
        ],
        "doc_id bigint, text string",
    )
    spans = {
        (r["doc_id"], r["span_start"], r["span_end"]): r["span_tokens"]
        for r in duplicate_spans(docs, n=8).collect()
    }
    assert (0, 4, 15) in spans and spans[(0, 4, 15)] == 12
    assert (1, 1, 12) in spans and spans[(1, 1, 12)] == 12
    assert not any(d == 2 for d, _, _ in spans)
    assert (3, 1, 12) in spans and (3, 16, 27) in spans
    assert len(spans) == 4

    stats = {r["doc_id"]: r for r in duplicate_span_stats(docs, n=8).collect()}
    assert len(stats) == 4  # zero-span docs included
    assert stats[2]["n_spans"] == 0 and stats[2]["dup_token_frac"] == 0.0
    assert stats[0]["dup_tokens"] == 12 and stats[0]["n_tokens"] == 17
    assert stats[3]["n_spans"] == 2 and stats[3]["dup_tokens"] == 24


def test_duplicate_spans_adjacent_hits_merge(spark):
    """Overlapping/adjacent gram hits coalesce: a 20-token repeated
    region yields ONE span, not 13 gram-sized ones; and two repeated
    regions separated by >n unique tokens stay separate spans."""
    from map_reduce_using_cloud_functions_spark.operators.dedup import (
        duplicate_spans,
    )

    big = " ".join(f"rep{i}" for i in range(20))
    other = " ".join(f"oth{i}" for i in range(10))
    gap = " ".join(f"gap{i}" for i in range(9))
    docs = spark.createDataFrame(
        [
            (0, big),
            (1, big + " " + gap + " " + other),
            (2, other),
        ],
        "doc_id bigint, text string",
    )
    spans = sorted(
        (r["doc_id"], r["span_start"], r["span_end"])
        for r in duplicate_spans(docs, n=8).collect()
    )
    assert spans == [(0, 1, 20), (1, 1, 20), (1, 30, 39), (2, 1, 10)]


def test_scrub_duplicate_spans_removes_exactly_the_spans(spark):
    """The scrub drops precisely the flagged positions and keeps
    original token order for the rest; clean docs pass through
    untouched (modulo tokenizer normalization)."""
    from map_reduce_using_cloud_functions_spark.operators.dedup import (
        scrub_duplicate_spans,
    )

    block = " ".join(f"blk{i}" for i in range(12))
    docs = spark.createDataFrame(
        [
            (0, "u0a u0b u0c " + block + " t0x t0y"),
            (1, block + " z1a z1b z1c z1d"),
            (2, " ".join(f"only{i}" for i in range(20))),
        ],
        "doc_id bigint, text string",
    )
    out = {r["doc_id"]: r for r in scrub_duplicate_spans(docs, n=8).collect()}
    assert out[0]["clean_text"] == "u0a u0b u0c t0x t0y"
    assert out[0]["n_removed"] == 12
    assert out[1]["clean_text"] == "z1a z1b z1c z1d"
    assert out[2]["clean_text"] == " ".join(f"only{i}" for i in range(20))
    assert out[2]["n_removed"] == 0


def test_simhash_pairs_equal_exact_hamming_filter(spark):
    """Pigeonhole banding is COMPLETE for d <= max_hamming: the banded
    pairs over a real corpus slice must equal the exact all-pairs
    popcount filter (no false negatives; the verify step removes all
    false positives)."""
    from map_reduce_using_cloud_functions_spark.operators.dedup import (
        simhash_fingerprints,
        simhash_pairs,
    )
    from map_reduce_using_cloud_functions_spark.sources import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").limit(150)
    max_h = 6  # loose enough to produce real pairs on random docs
    fp = {r["doc_id"]: r["simhash"] for r in simhash_fingerprints(docs).collect()}
    ids = sorted(fp)
    want = {
        (a, b): bin(fp[a] ^ fp[b]).count("1")
        for i, a in enumerate(ids)
        for b in ids[i + 1 :]
        if bin(fp[a] ^ fp[b]).count("1") <= max_h
    }
    got = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in simhash_pairs(docs, max_hamming=max_h).collect()
    }
    assert got == want and len(got) > 0


def test_simhash_pairs_planted(corpus_with_dups):
    from map_reduce_using_cloud_functions_spark.operators.dedup import simhash_pairs

    pairs = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in simhash_pairs(corpus_with_dups, max_hamming=8).collect()
    }
    assert pairs[(0, 1)] == 0          # identical docs: distance 0
    assert (0, 2) in pairs             # one-token edit: small distance
    assert (0, 3) not in pairs         # unrelated doc stays out


def test_simhash_near_dedup_removes_cluster_losers(corpus_with_dups):
    from map_reduce_using_cloud_functions_spark.operators.dedup import (
        simhash_near_dedup,
    )

    kept = sorted(
        r["doc_id"] for r in simhash_near_dedup(corpus_with_dups, max_hamming=8).collect()
    )
    # SimHash works over NORMALIZED tokens, so doc 4 (the uppercased
    # copy exact_dedup keeps) clusters with 0 here: docs 0,1,2,4 → one
    # survivor (min id 0); only unrelated doc 3 also survives.
    assert kept == [0, 3]


def test_simhash_pairs_rejects_impossible_band_layout(spark):
    import pytest

    from map_reduce_using_cloud_functions_spark.operators.dedup import simhash_pairs

    docs = spark.createDataFrame([(0, "a b c")], "doc_id bigint, text string")
    with pytest.raises(ValueError):
        simhash_pairs(docs, max_hamming=32)  # 33 bands from 32 bits


def test_simhash_pairs_high_budget_band_layout_not_degenerate(spark):
    """max_hamming=8 over 32 bits: the band layout must partition the
    fingerprint (no band past bit 31, no always-zero band) — a fixed
    ceil-width layout silently degenerates to an all-pairs join here."""
    from map_reduce_using_cloud_functions_spark.operators.dedup import (
        simhash_fingerprints,
        simhash_pairs,
    )
    from map_reduce_using_cloud_functions_spark.sources import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").limit(120)
    max_h = 8
    fp = {r["doc_id"]: r["simhash"] for r in simhash_fingerprints(docs).collect()}
    ids = sorted(fp)
    want = {
        (a, b): bin(fp[a] ^ fp[b]).count("1")
        for i, a in enumerate(ids)
        for b in ids[i + 1 :]
        if bin(fp[a] ^ fp[b]).count("1") <= max_h
    }
    got = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in simhash_pairs(docs, max_hamming=max_h).collect()
    }
    assert got == want  # complete AND exact at the high budget too


# ------------------------------------------- incremental ledger dedup


def test_dedup_against_reference_both_paths(spark):
    """Cross-release dedup: docs whose hash is in the ledger drop, new
    docs survive with all columns; the bloom path is value-identical
    to the anti-join path (exactness despite bloom false positives)."""
    from map_reduce_using_cloud_functions_spark.operators.dedup import (
        dedup_against_reference,
        exact_dedup_groups,
    )

    release1 = spark.createDataFrame(
        [(i, f"shipped text {i % 50}", "r1") for i in range(100)],
        "doc_id bigint, text string, tag string",
    )
    ledger = exact_dedup_groups(release1).select("text_hash")
    new_shard = spark.createDataFrame(
        # 30 docs repeating shipped content, 70 genuinely new
        [(1000 + i, f"shipped text {i}", "r2") for i in range(30)]
        + [(2000 + i, f"fresh text {i}", "r2") for i in range(70)],
        "doc_id bigint, text string, tag string",
    )
    plain = dedup_against_reference(new_shard, ledger)
    assert set(plain.columns) == {"doc_id", "text", "tag"}
    ids = sorted(r["doc_id"] for r in plain.select("doc_id").collect())
    assert ids == [2000 + i for i in range(70)]

    bloomed = dedup_against_reference(new_shard, ledger, use_bloom=True)
    assert sorted(
        map(tuple, bloomed.select("doc_id", "text", "tag").collect())
    ) == sorted(map(tuple, plain.select("doc_id", "text", "tag").collect()))


def test_dedup_against_reference_ledger_append_flow(spark):
    """The release cycle: ledger(r1) ∪ hashes(r2 survivors) dedups r3
    against both earlier releases without touching their text."""
    import pyspark.sql.functions as F

    from map_reduce_using_cloud_functions_spark.operators.dedup import (
        dedup_against_reference,
        exact_dedup_groups,
    )
    from map_reduce_using_cloud_functions_spark.functions.hashing import hex64

    r1 = spark.createDataFrame(
        [(1, "alpha"), (2, "beta")], "doc_id bigint, text string"
    )
    ledger = exact_dedup_groups(r1).select("text_hash")
    r2 = spark.createDataFrame(
        [(10, "beta"), (11, "gamma")], "doc_id bigint, text string"
    )
    r2_kept = dedup_against_reference(r2, ledger)
    assert [r["doc_id"] for r in r2_kept.collect()] == [11]
    ledger = ledger.unionByName(
        r2_kept.select(hex64(F.col("text")).alias("text_hash"))
    ).distinct()
    r3 = spark.createDataFrame(
        [(20, "alpha"), (21, "gamma"), (22, "delta")],
        "doc_id bigint, text string",
    )
    kept = dedup_against_reference(r3, ledger)
    assert [r["doc_id"] for r in kept.collect()] == [22]


def test_minhash_ledger_probe_matches_joint_sketch(spark):
    """r7: the near-dup ledger's cross-release pairs must equal the
    joint-corpus minhash_dedup_pairs restricted to cross-split pairs —
    the sketch parameters are functions of the portable hash, so
    'sketch prior releases once, probe with the batch' is exactly the
    joint sketch, never an approximation of it."""
    import pyspark.sql.functions as F

    from map_reduce_using_cloud_functions_spark.operators.dedup import (
        build_minhash_ledger,
        ledger_near_dup_pairs,
        minhash_dedup_pairs,
    )
    from map_reduce_using_cloud_functions_spark.sources import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    prior = docs.where(F.col("doc_id") % 2 == 0)
    batch = docs.where(F.col("doc_id") % 2 == 1)
    path = "file:///tmp/mhled_joint/led"
    import shutil

    shutil.rmtree("/tmp/mhled_joint", ignore_errors=True)
    build_minhash_ledger(prior, path)
    got = sorted(
        (r["doc_id"], r["ledger_doc"], round(r["est_jaccard"], 9))
        for r in ledger_near_dup_pairs(spark, batch, path, threshold=0.25).collect()
    )
    joint = minhash_dedup_pairs(docs, threshold=0.25).collect()
    expected = sorted(
        (
            (r["doc_a"], r["doc_b"])
            if r["doc_a"] % 2 == 1
            else (r["doc_b"], r["doc_a"])
        )
        + (round(r["est_jaccard"], 9),)
        for r in joint
        if (r["doc_a"] % 2) != (r["doc_b"] % 2)
    )
    assert got == expected and len(got) > 0


def test_minhash_ledger_append_replay_idempotent(spark, tmp_path):
    """Re-shipping a release must REPLACE its partitions, not
    double-insert (dynamic partition overwrite is the ledger's
    replay-idempotence), and a multi-release ledger catches near-dups
    of every release it holds."""
    from map_reduce_using_cloud_functions_spark.operators.dedup import (
        append_minhash_ledger,
        build_minhash_ledger,
        ledger_near_dup_pairs,
    )

    base = "one two three four five six seven eight nine ten"
    r0 = spark.createDataFrame(
        [(1, base), (2, "totally different words entirely here now")],
        "doc_id bigint, text string",
    )
    r1 = spark.createDataFrame(
        [(10, base + " eleven")], "doc_id bigint, text string"
    )
    path = str(tmp_path / "led")
    build_minhash_ledger(r0, path)
    append_minhash_ledger(r1, path, release=1)
    n_sigs = spark.read.parquet(f"{path}/sigs").count()
    n_bands = spark.read.parquet(f"{path}/bands").count()
    # replay the same release: counts must not change
    append_minhash_ledger(r1, path, release=1)
    assert spark.read.parquet(f"{path}/sigs").count() == n_sigs == 3
    assert spark.read.parquet(f"{path}/bands").count() == n_bands == 12

    probe = spark.createDataFrame(
        [(100, base + " twelve")], "doc_id bigint, text string"
    )
    hits = ledger_near_dup_pairs(spark, probe, path, threshold=0.3).collect()
    assert {r["ledger_doc"] for r in hits} == {1, 10}, (
        "a multi-release ledger must surface near-dups from every release"
    )


def test_near_dedup_against_ledger_survivors(spark, tmp_path):
    """Survivor contract (dedup_against_reference at near-dup
    strength): matched batch docs drop, the rest pass with ALL columns
    intact; sub-shingle docs are invisible to MinHash by design and
    always survive."""
    from map_reduce_using_cloud_functions_spark.operators.dedup import (
        build_minhash_ledger,
        near_dedup_against_ledger,
    )

    shared = " ".join(f"tok{i}" for i in range(30))
    prior = spark.createDataFrame(
        [(1, shared + " theta", "r0")],
        "doc_id bigint, text string, tag string",
    )
    batch = spark.createDataFrame(
        [
            (10, shared + " iota", "r1"),
            (11, "unrelated corpus content with fresh vocabulary", "r1"),
            (12, "tiny", "r1"),
        ],
        "doc_id bigint, text string, tag string",
    )
    path = str(tmp_path / "led")
    build_minhash_ledger(prior, path)
    kept = near_dedup_against_ledger(spark, batch, path, threshold=0.5)
    assert set(kept.columns) == {"doc_id", "text", "tag"}
    assert sorted(r["doc_id"] for r in kept.collect()) == [11, 12]


def test_minhash_ledger_param_validation(spark, tmp_path):
    """Band layouts that would silently drop signature positions are
    refused at build time (same contract as _band_hashes)."""
    import pytest as _pytest

    from map_reduce_using_cloud_functions_spark.operators.dedup import (
        build_minhash_ledger,
    )

    docs = spark.createDataFrame([(1, "a b c d e")], "doc_id bigint, text string")
    with _pytest.raises(ValueError, match="divide evenly"):
        build_minhash_ledger(docs, str(tmp_path / "led"), k=16, bands=5)


# ------------------------------------------- ledger major compaction


def _mk_release(spark, ids_texts):
    return spark.createDataFrame(ids_texts, "doc_id bigint, text string")


def _probe_pairs(spark, path, probe, **kw):
    from map_reduce_using_cloud_functions_spark.operators.dedup import (
        ledger_near_dup_pairs,
    )

    return {
        (r["doc_id"], r["ledger_doc"], round(r["est_jaccard"], 9))
        for r in ledger_near_dup_pairs(spark, probe, path, threshold=0.3, **kw).collect()
    }


def test_ledger_compaction_folds_releases_probe_unchanged(spark, tmp_path):
    """compact_minhash_ledger folds everything but the newest release
    into release=-1: the probe answers are IDENTICAL (folded docs keep
    gating), the directory fan-out drops to keep_last+1 releases, the
    kept release still honors exclude_release (the streaming replay
    contract), a re-run no-ops, and keep_last=0 folds the rest."""
    from map_reduce_using_cloud_functions_spark.operators.dedup import (
        append_minhash_ledger,
        build_minhash_ledger,
        compact_minhash_ledger,
        ledger_info,
        ledger_releases,
    )

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    path = str(tmp_path / "led")
    build_minhash_ledger(
        _mk_release(spark, [(1, base), (2, "unrelated content words here truly")]),
        path,
        release=0,
    )
    for rel in (1, 2, 3):
        append_minhash_ledger(
            _mk_release(spark, [(10 * rel, f"{base} extra{rel}")]), path, release=rel
        )
    probe = _mk_release(spark, [(100, base + " omega")])
    before = _probe_pairs(spark, path, probe)
    assert {d for _, d, _ in before} == {1, 10, 20, 30}

    folded = compact_minhash_ledger(spark, path, keep_last=1)
    assert folded == [0, 1, 2]
    assert ledger_releases(spark, path) == [-1, 3]
    assert _probe_pairs(spark, path, probe) == before

    # the kept release still hides ITS OWN rows under exclude_release
    # (replay shape) while folded history keeps gating
    replay = _probe_pairs(spark, path, probe, exclude_release=3)
    assert {d for _, d, _ in replay} == {1, 10, 20}

    # idempotent no-op: nothing un-folded below the kept release
    assert compact_minhash_ledger(spark, path, keep_last=1) == []
    # fold-all for a quiesced producer
    assert compact_minhash_ledger(spark, path, keep_last=0) == [3]
    assert ledger_releases(spark, path) == [-1]
    assert _probe_pairs(spark, path, probe) == before
    info = ledger_info(spark, path)
    assert info["releases"] == [-1] and info["n_docs"] == 5


def test_ledger_compaction_crash_points_overgate_then_converge(spark, tmp_path):
    """Kill the fold at both crash points: after the sigs/-1 rewrite
    (bands not yet rewritten) and after both rewrites (old release dirs
    not yet deleted). Every intermediate state must gate AT LEAST the
    original pairs — never less — and a replayed compaction converges
    to the clean layout with identical probe answers."""
    import pytest

    from map_reduce_using_cloud_functions_spark.operators import dedup as dd
    from map_reduce_using_cloud_functions_spark.operators import index as ix

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    path = str(tmp_path / "led")
    dd.build_minhash_ledger(
        _mk_release(spark, [(1, base), (2, "unrelated content words here truly")]),
        path,
        release=0,
    )
    for rel in (1, 2):
        dd.append_minhash_ledger(
            _mk_release(spark, [(10 * rel, f"{base} extra{rel}")]), path, release=rel
        )
    probe = _mk_release(spark, [(100, base + " omega")])
    before = _probe_pairs(spark, path, probe)

    # crash 1: sigs folded, bands not — old dirs intact, so old bands
    # still produce every candidate; duplicate sig rows only over-gate
    real_bands = dd._band_hashes

    def boom(*a, **k):
        raise RuntimeError("injected crash before the bands rewrite")

    try:
        dd._band_hashes = boom
        with pytest.raises(RuntimeError, match="injected"):
            dd.compact_minhash_ledger(spark, path, keep_last=1)
    finally:
        dd._band_hashes = real_bands
    assert _probe_pairs(spark, path, probe) >= before

    # crash 2: both rewrites done, first old-dir delete dies
    real_delete = ix._hadoop_delete
    state = {"n": 0}

    def delete_once(spark_, p):
        state["n"] += 1
        if state["n"] == 1:
            raise RuntimeError("injected crash before the old-dir sweep")
        return real_delete(spark_, p)

    try:
        ix._hadoop_delete = delete_once
        with pytest.raises(RuntimeError, match="injected"):
            dd.compact_minhash_ledger(spark, path, keep_last=1)
    finally:
        ix._hadoop_delete = real_delete
    assert _probe_pairs(spark, path, probe) >= before

    # replay converges: clean layout, exact answers
    dd.compact_minhash_ledger(spark, path, keep_last=1)
    assert dd.ledger_releases(spark, path) == [-1, 2]
    assert _probe_pairs(spark, path, probe) == before


def test_ledger_compaction_refreshes_foreign_marker_and_takedown(spark, tmp_path):
    """A folded foreign release's partition no longer exists, so its id
    must leave the adoption sidecar (a future batch with that id writes
    a FRESH partition and the folded docs keep gating from -1); a
    foreign release ABOVE the fold line stays refused. Takedown keeps
    working on the folded partition."""
    from map_reduce_using_cloud_functions_spark.operators.dedup import (
        append_minhash_ledger,
        build_minhash_ledger,
        compact_minhash_ledger,
        delete_from_ledger,
    )
    from map_reduce_using_cloud_functions_spark.streaming.near_dedup import (
        _foreign_releases,
        _record_foreign_releases,
    )

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    path = str(tmp_path / "led")
    build_minhash_ledger(_mk_release(spark, [(1, base)]), path, release=0)
    for rel in (5, 7):
        append_minhash_ledger(
            _mk_release(spark, [(10 * rel, f"{base} extra{rel}")]), path, release=rel
        )
    _record_foreign_releases(spark, path, [0, 5, 7])

    assert compact_minhash_ledger(spark, path, keep_last=1) == [0, 5]
    assert _foreign_releases(spark, path) == {7}

    # takedown rewrites release=-1 like any touched partition
    probe = _mk_release(spark, [(100, base + " omega")])
    delete_from_ledger(spark, path, [1])
    assert {d for _, d, _ in _probe_pairs(spark, path, probe)} == {50, 70}


# --------------------------------------- embedding (semantic) ledger


def test_embedding_ledger_probe_matches_joint_sketch(spark, tmp_path):
    """The semantic ledger's cross-release pairs must equal the joint
    pairwise_near_dup restricted to cross-split pairs — the hyperplanes
    are corpus-independent, so 'sketch prior releases once, probe with
    the batch' IS the joint sketch (the MinHash ledger property at
    embedding strength)."""
    import pyspark.sql.functions as F

    from map_reduce_using_cloud_functions_spark.operators.dedup import (
        build_embedding_ledger,
        ledger_embedding_pairs,
    )
    from map_reduce_using_cloud_functions_spark.operators.similarity import (
        pairwise_near_dup,
    )
    from map_reduce_using_cloud_functions_spark.sources import load_table

    emb = load_table(spark, "/root/testdata/sf0.01", "embeddings")
    prior = emb.where(F.col("vec_id") % 2 == 0)
    batch = emb.where(F.col("vec_id") % 2 == 1)
    path = str(tmp_path / "eled")
    build_embedding_ledger(prior, path, planes_per_band=4, bands=4)
    got = sorted(
        (r["vec_id"], r["ledger_vec"], r["score"])
        for r in ledger_embedding_pairs(
            spark, batch, path, threshold=0.45
        ).collect()
    )
    joint = pairwise_near_dup(
        emb, threshold=0.45, planes_per_band=4, bands=4, scale_guard="off"
    ).collect()
    expected = sorted(
        (
            (r["vec_a"], r["vec_b"])
            if r["vec_a"] % 2 == 1
            else (r["vec_b"], r["vec_a"])
        )
        + (r["score"],)
        for r in joint
        if (r["vec_a"] % 2) != (r["vec_b"] % 2)
    )
    assert got == expected and len(got) > 0


def test_embedding_ledger_lifecycle(spark, tmp_path):
    """Append replay-idempotence, survivor contract (all columns
    intact), takedown (deleted vectors stop gating), and compaction
    (probe answers unchanged, releases fold to [-1, kept])."""
    import pyspark.sql.functions as F

    from map_reduce_using_cloud_functions_spark.operators import dedup as dd
    from map_reduce_using_cloud_functions_spark.sources import load_table

    emb = load_table(spark, "/root/testdata/sf0.01", "embeddings")
    r0 = emb.where(F.col("vec_id") % 3 == 0)
    r1 = emb.where(F.col("vec_id") % 3 == 1)
    batch = emb.where(F.col("vec_id") % 3 == 2).withColumn(
        "payload", F.lit("x")
    )
    path = str(tmp_path / "eled")
    dd.build_embedding_ledger(r0, path, planes_per_band=4, bands=4, release=0)
    dd.append_embedding_ledger(r1, path, release=1)
    n_vecs = spark.read.parquet(f"{path}/vecs").count()
    n_bands = spark.read.parquet(f"{path}/bands").count()
    dd.append_embedding_ledger(r1, path, release=1)  # replay
    assert spark.read.parquet(f"{path}/vecs").count() == n_vecs
    assert spark.read.parquet(f"{path}/bands").count() == n_bands
    assert dd.ledger_releases(spark, path) == [0, 1]

    pairs = dd.ledger_embedding_pairs(spark, batch, path, threshold=0.45)
    matched = {r["vec_id"] for r in pairs.collect()}
    assert matched, "fixture must produce semantic cross-release matches"
    surv = dd.near_dedup_against_embedding_ledger(
        spark, batch, path, threshold=0.45
    )
    assert set(surv.columns) == set(batch.columns)
    surv_ids = {r["vec_id"] for r in surv.collect()}
    assert surv_ids == {
        r["vec_id"] for r in batch.collect()
    } - matched

    # takedown: delete every gater of one matched batch vector
    victim = sorted(matched)[0]
    gaters = {
        r["ledger_vec"] for r in pairs.collect() if r["vec_id"] == victim
    }
    dd.delete_from_embedding_ledger(spark, path, sorted(gaters))
    still = {
        r["vec_id"]
        for r in dd.ledger_embedding_pairs(
            spark, batch, path, threshold=0.45
        ).collect()
    }
    assert victim not in still
    ledger_ids = {
        r["vec_id"] for r in spark.read.parquet(f"{path}/vecs").collect()
    }
    assert not ledger_ids & gaters

    # compaction: answers identical, fan-in reset
    before = sorted(
        map(
            tuple,
            dd.ledger_embedding_pairs(spark, batch, path, threshold=0.45).collect(),
        )
    )
    assert dd.compact_embedding_ledger(spark, path, keep_last=1) == [0]
    assert dd.ledger_releases(spark, path) == [-1, 1]
    after = sorted(
        map(
            tuple,
            dd.ledger_embedding_pairs(spark, batch, path, threshold=0.45).collect(),
        )
    )
    assert after == before


def test_embedding_ledger_guards(spark, tmp_path):
    """Dimension mismatches and over-budget bandings refuse loudly."""
    import pyspark.sql.functions as F
    import pytest

    from map_reduce_using_cloud_functions_spark.operators import dedup as dd
    from map_reduce_using_cloud_functions_spark.operators import similarity as sim
    from map_reduce_using_cloud_functions_spark.sources import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    path = str(tmp_path / "eled")
    dd.build_embedding_ledger(emb, path, planes_per_band=4, bands=4)
    short = emb.select(
        "vec_id", F.slice("embedding", 1, 32).alias("embedding")
    )
    with pytest.raises(ValueError, match="dim"):
        dd.append_embedding_ledger(short, path, release=1)
    with pytest.raises(ValueError, match="dim"):
        dd.ledger_embedding_pairs(spark, short, path)
    # a MIXED-dimension batch must refuse too — a first-row-only check
    # would pass it, and the short rows would then silently never match
    # (zip_with null-pads -> null score -> filtered), under-gating
    mixed = emb.select("vec_id", "embedding").limit(2).union(short.limit(2))
    with pytest.raises(ValueError, match="mixed dims"):
        dd.append_embedding_ledger(mixed, path, release=1)
    with pytest.raises(ValueError, match="mixed dims"):
        dd.ledger_embedding_pairs(spark, mixed, path)
    old = sim.LSH_CANDIDATE_BUDGET
    try:
        sim.LSH_CANDIDATE_BUDGET = 1
        with pytest.raises(ValueError, match="rebuild the ledger"):
            dd.ledger_embedding_pairs(spark, emb, path, threshold=0.45)
        # the documented escape hatch still works
        dd.ledger_embedding_pairs(
            spark, emb, path, threshold=0.45, scale_guard="off"
        ).collect()
    finally:
        sim.LSH_CANDIDATE_BUDGET = old


def test_ledger_kind_dispatch_and_wrong_flavor_refusal(spark, tmp_path):
    """The two ledger flavors share a layout but not a sketch schema —
    kind is sniffed from the meta row, info works for both, and each
    compactor refuses the other's ledger loudly (folding with the
    wrong parameters would corrupt the band relation)."""
    import pytest

    from map_reduce_using_cloud_functions_spark.operators import dedup as dd
    from map_reduce_using_cloud_functions_spark.sources import load_table

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    mh = str(tmp_path / "mh")
    dd.build_minhash_ledger(_mk_release(spark, [(1, base)]), mh, release=0)
    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    el = str(tmp_path / "el")
    dd.build_embedding_ledger(emb, el, planes_per_band=4, bands=4)

    assert dd.ledger_kind(spark, mh) == "minhash"
    assert dd.ledger_kind(spark, el) == "embedding"
    assert dd.ledger_info(spark, mh)["kind"] == "minhash"
    info = dd.ledger_info(spark, el)
    assert info["kind"] == "embedding" and info["n_docs"] == emb.count()
    with pytest.raises(ValueError, match="use compact_minhash_ledger"):
        dd.compact_embedding_ledger(spark, mh)
    with pytest.raises(ValueError, match="use compact_embedding_ledger"):
        dd.compact_minhash_ledger(spark, el)
    # the takedowns refuse the wrong flavor with the same actionable
    # message the compactors give, not a raw missing-path error
    with pytest.raises(ValueError, match="use delete_from_embedding_ledger"):
        dd.delete_from_ledger(spark, el, [1])
    with pytest.raises(ValueError, match="use delete_from_ledger"):
        dd.delete_from_embedding_ledger(spark, mh, [1])
    with pytest.raises(ValueError, match="not a ledger"):
        dd.ledger_kind(spark, str(tmp_path / "nope"))


@pytest.mark.parametrize("seed", [7, 19])
def test_ledger_compaction_random_corpora_probe_invariant(spark, tmp_path, seed):
    """Property fuzz over both ledger flavors: random documents (with
    planted near-dup chains) sliced into a random number of releases,
    probed by a random held-out batch — folding history into
    release=-1 must leave the probe answers IDENTICAL at every
    keep_last, and fold-all equals the original too."""
    import random

    import pyspark.sql.functions as F

    from map_reduce_using_cloud_functions_spark.operators import dedup as dd
    from map_reduce_using_cloud_functions_spark.sources import load_table

    rng = random.Random(seed)
    words = "alpha beta gamma delta epsilon zeta eta theta iota kappa lam mu".split()

    def text(i):
        base = [words[(i + j) % len(words)] for j in range(rng.randrange(8, 14))]
        return " ".join(base)

    rows = [(i, text(i)) for i in range(60)]
    # planted near-dups of prior rows so the probe has real hits
    rows += [(100 + i, rows[i][1] + " omega") for i in range(0, 20, 3)]
    rng.shuffle(rows)
    cut = len(rows) // 4
    probe_rows, ledger_rows = rows[:cut], rows[cut:]
    docs = spark.createDataFrame(ledger_rows, "doc_id bigint, text string")
    probe = spark.createDataFrame(probe_rows, "doc_id bigint, text string")

    n_rel = rng.randrange(2, 6)
    path = str(tmp_path / "led")
    dd.init_minhash_ledger(spark, path)
    for rel in range(n_rel):
        dd.append_minhash_ledger(
            docs.where(F.col("doc_id") % n_rel == rel), path, release=rel
        )
    before = _probe_pairs(spark, path, probe)
    assert before, "fuzz fixture must produce probe hits"
    keep = rng.randrange(0, n_rel)
    dd.compact_minhash_ledger(spark, path, keep_last=keep)
    assert _probe_pairs(spark, path, probe) == before
    dd.compact_minhash_ledger(spark, path, keep_last=0)
    assert _probe_pairs(spark, path, probe) == before

    # embedding flavor on the same discipline (fixture embeddings)
    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    eprobe = emb.where(F.col("vec_id") % 5 == 0)
    estand = emb.where(F.col("vec_id") % 5 != 0)
    epath = str(tmp_path / "eled")
    dd.init_embedding_ledger(spark, epath, dim=64, planes_per_band=4, bands=4)
    for rel in range(n_rel):
        dd.append_embedding_ledger(
            estand.where(F.col("vec_id") % n_rel == rel), epath, release=rel
        )
    ebefore = sorted(
        map(
            tuple,
            dd.ledger_embedding_pairs(spark, eprobe, epath, threshold=0.4).collect(),
        )
    )
    assert ebefore
    dd.compact_embedding_ledger(spark, epath, keep_last=keep)
    eafter = sorted(
        map(
            tuple,
            dd.ledger_embedding_pairs(spark, eprobe, epath, threshold=0.4).collect(),
        )
    )
    assert eafter == ebefore


def test_phash_ledger_lifecycle(spark, tmp_path):
    """The third ledger flavor (perceptual-hash, r10): probe EXACT vs
    the joint hamming relation (pigeonhole guarantee, not a sketch
    approximation), replay-idempotent appends, threshold contract
    (probe at ≤ stored is exact, > stored refuses), survivors,
    takedown, compaction invariance, kind dispatch + wrong-flavor
    refusals across all three flavors."""
    import pyspark.sql.functions as F
    import pytest

    from map_reduce_using_cloud_functions_spark.operators import dedup as dd
    from map_reduce_using_cloud_functions_spark.operators import multimodal as mm
    from map_reduce_using_cloud_functions_spark.sources import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    hashes = mm.phash_assets(mm.build_png_assets(docs)).localCheckpoint()
    r0 = hashes.where("asset_id % 3 = 0")
    r1 = hashes.where("asset_id % 3 = 1")
    batch = hashes.where("asset_id % 3 = 2")
    path = str(tmp_path / "phled")
    dd.build_phash_ledger(r0, path, release=0)
    dd.append_phash_ledger(r1, path, release=1)
    n_p = spark.read.parquet(f"{path}/prints").count()
    n_b = spark.read.parquet(f"{path}/bands").count()
    dd.append_phash_ledger(r1, path, release=1)  # replay
    assert spark.read.parquet(f"{path}/prints").count() == n_p
    assert spark.read.parquet(f"{path}/bands").count() == n_b
    assert dd.ledger_releases(spark, path) == [0, 1]
    info = dd.ledger_info(spark, path)
    assert info["kind"] == "phash" and info["grid"] == 8
    assert dd.ledger_kind(spark, path) == "phash"

    # probe ≡ joint hamming relation restricted to cross-release
    got = {
        (r["asset_id"], r["ledger_asset"]): r["hamming"]
        for r in dd.ledger_phash_pairs(spark, batch, path).collect()
    }
    fp = {r["asset_id"]: r["phash"] for r in hashes.where("ok").collect()}
    want = {}
    for a in fp:
        if a % 3 != 2:
            continue
        for b in fp:
            if b % 3 == 2:
                continue
            d = bin((fp[a] ^ fp[b]) & ((1 << 64) - 1)).count("1")
            if d <= 6:
                want[(a, b)] = d
    assert got == want and want, "probe != joint hamming relation"

    # smaller probe threshold stays exact; larger refuses
    got2 = {
        (r["asset_id"], r["ledger_asset"])
        for r in dd.ledger_phash_pairs(spark, batch, path, max_hamming=2).collect()
    }
    assert got2 == {k for k, v in want.items() if v <= 2}
    with pytest.raises(ValueError, match="exceeds the"):
        dd.ledger_phash_pairs(spark, batch, path, max_hamming=7)

    # survivors = batch minus matched (all columns intact)
    surv = dd.near_dedup_against_phash_ledger(spark, batch, path)
    assert set(surv.columns) == set(batch.columns)
    assert {r["asset_id"] for r in surv.collect()} == {
        r["asset_id"] for r in batch.collect()
    } - {a for a, _ in want}

    # takedown: delete every gater of one matched batch asset
    victim = sorted({a for a, _ in want})[0]
    gaters = sorted({b for (a, b) in want if a == victim})
    dd.delete_from_phash_ledger(spark, path, gaters)
    still = {
        r["asset_id"]
        for r in dd.ledger_phash_pairs(spark, batch, path).collect()
    }
    assert victim not in still

    # compaction: probe answers invariant, releases fold to [-1, kept]
    before = sorted(
        map(tuple, dd.ledger_phash_pairs(spark, batch, path).collect())
    )
    folded = dd.compact_phash_ledger(spark, path, keep_last=1)
    assert folded == [0]
    assert dd.ledger_releases(spark, path) == [-1, 1]
    after = sorted(
        map(tuple, dd.ledger_phash_pairs(spark, batch, path).collect())
    )
    assert after == before

    # CLI takedown drives the same delete — on the FOLDED partition,
    # the post-compaction case the fold contract promises keeps working
    from map_reduce_using_cloud_functions_spark.__main__ import main

    remaining = sorted({b for (_, b) in want if b not in set(gaters)})
    if remaining:
        rc = main(
            ["takedown", str(remaining[0]), "--phash-ledger", path],
            spark=spark,
        )
        assert rc in (0, None)
        assert (
            spark.read.parquet(f"{path}/prints")
            .where(F.col("asset_id") == remaining[0])
            .count()
            == 0
        )

    # wrong-flavor refusals name the right op across all three flavors
    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    el = str(tmp_path / "el")
    dd.build_embedding_ledger(emb, el, planes_per_band=4, bands=4)
    with pytest.raises(ValueError, match="use compact_phash_ledger"):
        dd.compact_embedding_ledger(spark, path)
    with pytest.raises(ValueError, match="use delete_from_phash_ledger"):
        dd.delete_from_ledger(spark, path, [1])
    with pytest.raises(ValueError, match="use delete_from_embedding_ledger"):
        dd.delete_from_phash_ledger(spark, el, [1])
    # a non-fingerprint batch refuses with the expected-columns message
    with pytest.raises(ValueError, match="expected \\(asset_id, phash"):
        dd.ledger_phash_pairs(spark, docs, path)


def test_ledger_probe_broadcast_guard(spark, monkeypatch, tmp_path):
    """r13 (r12 ADVICE): the ledger probes pin the batch side as the
    broadcast build side only for a BOUNDED batch. With the row cap
    patched to 0 every batch counts as unbounded, the pins drop, and
    the planner falls back to a shuffle join (no driver-OOM path) —
    with identical pairs. The doors' bounded_batch=True assertion keeps
    the pinned plan without a probe job."""
    import pyspark.sql.functions as F

    from map_reduce_using_cloud_functions_spark.operators import dedup as dd
    from map_reduce_using_cloud_functions_spark.sources import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    prior = docs.where(F.col("doc_id") % 2 == 0)
    batch = docs.where(F.col("doc_id") % 2 == 1)
    path = f"file://{tmp_path}/led"
    dd.build_minhash_ledger(prior, path)

    def rows(df):
        return sorted(
            (r["doc_id"], r["ledger_doc"], round(r["est_jaccard"], 9))
            for r in df.collect()
        )

    def plan(df):
        return df._jdf.queryExecution().executedPlan().toString()

    old_thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    # disable auto-broadcast so the join strategy reflects ONLY the pin
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        pinned = dd.ledger_near_dup_pairs(spark, batch, path, threshold=0.25)
        assert "BroadcastHashJoin" in plan(pinned)
        monkeypatch.setattr(dd, "LEDGER_BROADCAST_MAX_ROWS", 0)
        unpinned = dd.ledger_near_dup_pairs(spark, batch, path, threshold=0.25)
        assert "BroadcastHashJoin" not in plan(unpinned)
        assert rows(unpinned) == rows(pinned) and len(rows(pinned)) > 0
        # the doors' explicit contract assertion overrides the cap
        asserted = dd.ledger_near_dup_pairs(
            spark, batch, path, threshold=0.25, bounded_batch=True
        )
        assert "BroadcastHashJoin" in plan(asserted)
        # the anti-join wrapper follows the same decision
        kept = dd.near_dedup_against_ledger(spark, batch, path, threshold=0.25)
        assert "BroadcastHashJoin" not in plan(kept.select("doc_id"))
        survivors = sorted(r["doc_id"] for r in kept.collect())
        matched = {d for (d, _l, _j) in rows(pinned)}
        assert survivors == sorted(
            r["doc_id"] for r in batch.collect() if r["doc_id"] not in matched
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thr)


def test_dedup_clusters_producer_evaluated_once(spark, monkeypatch):
    """r13 (r12 ADVICE): dedup_clusters materializes the distinct edge
    set ONCE and probes the checkpointed blocks — the expensive pair
    producer must not re-run on the iterative fall-through (the r12
    shape probed the raw relation first and re-evaluated the producer
    from scratch when the cap tripped). The accumulator counts producer
    evaluations: the symmetrizing union holds two branches of the
    producer subtree, so one full evaluation of 5 pairs = 10 calls, on
    BOTH paths."""
    import pyspark.sql.functions as F

    from map_reduce_using_cloud_functions_spark.operators import dedup as dd

    acc = spark.sparkContext.accumulator(0)

    @F.udf("bigint")
    def counted(x):
        acc.add(1)
        return x

    counted = counted.asNondeterministic()  # forbid optimizer duplication
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(5)], "a bigint, doc_b bigint"
    ).select(counted("a").alias("doc_a"), "doc_b")

    # iterative fall-through (cap 0): one evaluation, not two
    monkeypatch.setattr(dd, "DRIVER_CC_MAX_EDGES", 0)
    got = {r["doc_id"]: r["cluster_rep"] for r in dd.dedup_clusters(pairs).collect()}
    assert set(got.values()) == {0} and len(got) == 6
    assert acc.value == 10

    # fast path (default cap): same single evaluation, same labels
    monkeypatch.setattr(dd, "DRIVER_CC_MAX_EDGES", 200_000)
    acc2 = spark.sparkContext.accumulator(0)

    @F.udf("bigint")
    def counted2(x):
        acc2.add(1)
        return x

    counted2 = counted2.asNondeterministic()
    pairs2 = spark.createDataFrame(
        [(i, i + 1) for i in range(5)], "a bigint, doc_b bigint"
    ).select(counted2("a").alias("doc_a"), "doc_b")
    fast = {r["doc_id"]: r["cluster_rep"] for r in dd.dedup_clusters(pairs2).collect()}
    assert fast == got
    assert acc2.value == 10


def test_dedup_clusters_cap_bounds_unique_edges(spark, monkeypatch):
    """r13 (r12 ADVICE): the fast-path cap bounds DISTINCT edges — a
    duplicate-heavy pair set with few unique edges stays on the one-
    collect union-find path instead of spuriously falling through (the
    r12 probe capped the raw symmetrized relation). cap=4 here: 10 raw
    pairs symmetrize to 20 rows but only 4 distinct directed edges."""
    from map_reduce_using_cloud_functions_spark.operators import dedup as dd

    dup_pairs = spark.createDataFrame(
        [(1, 2)] * 5 + [(3, 4)] * 5, "doc_a bigint, doc_b bigint"
    )
    monkeypatch.setattr(dd, "DRIVER_CC_MAX_EDGES", 4)
    got = {
        r["doc_id"]: r["cluster_rep"]
        # max_iter=0 would make the ITERATIVE path raise before its
        # first convergence check can run — proving via values alone
        # that the duplicate-heavy set resolved on the fast path
        for r in dd.dedup_clusters(dup_pairs, max_iter=0).collect()
    }
    assert got == {1: 1, 2: 1, 3: 3, 4: 3}
