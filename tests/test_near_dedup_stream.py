"""Streaming near-dup admission (streaming/near_dedup.py): continuous
corpus intake through the cross-release MinHash ledger — within-batch
dedup, cross-batch ledger probe, release-partitioned survivors, and
the replay/fresh-checkpoint contracts."""

from __future__ import annotations

import json
import os

import pytest

from map_reduce_using_cloud_functions_spark.operators import dedup as dd
from map_reduce_using_cloud_functions_spark.streaming.near_dedup import (
    admit_batch,
    start_near_dedup_stream,
)
from map_reduce_using_cloud_functions_spark.streaming.prep import (
    streaming_corpus_from_jsonl,
)

TEXT_A = (
    "the quick brown fox jumps over the lazy dog while the rain "
    "falls softly on the quiet village roofs tonight"
)
TEXT_A_NEAR = TEXT_A.replace("tonight", "today")  # ~90% shared shingles
TEXT_B = (
    "completely different content about distributed query engines "
    "folding partial aggregates before the exchange boundary runs"
)
TEXT_C = (
    "a third unrelated story where a sailor counts gulls above the "
    "harbor and writes their numbers into a weathered logbook daily"
)


def _write_jsonl(directory, name, rows):
    os.makedirs(directory, exist_ok=True)
    with open(os.path.join(directory, name), "w") as f:
        for doc_id, text in rows:
            f.write(json.dumps({"doc_id": doc_id, "text": text}) + "\n")


def _run_stream(spark, watch, ledger, survivors, ckpt):
    q = start_near_dedup_stream(
        spark,
        streaming_corpus_from_jsonl(spark, watch),
        ledger,
        survivors,
        ckpt,
    )
    q.awaitTermination(180)


def _survivor_ids(spark, survivors_path):
    out = {}
    for r in spark.read.parquet(survivors_path).select("release", "doc_id").collect():
        out.setdefault(r["release"], set()).add(r["doc_id"])
    return out


def test_stream_admits_only_novel_documents(spark, tmp_path):
    """Batch 0: exact within-batch duplicate collapses to the min id.
    Batch 1: a near-copy of an admitted doc is refused by the ledger,
    a fresh doc is admitted — and the ledger now holds both releases."""
    watch = str(tmp_path / "in")
    ledger = str(tmp_path / "ledger")
    survivors = str(tmp_path / "out")
    ckpt = str(tmp_path / "ck")

    _write_jsonl(watch, "b0.jsonl", [(1, TEXT_A), (2, TEXT_A), (3, TEXT_B)])
    _run_stream(spark, watch, ledger, survivors, ckpt)
    assert _survivor_ids(spark, survivors) == {0: {1, 3}}
    assert dd.ledger_releases(spark, ledger) == [0]

    _write_jsonl(watch, "b1.jsonl", [(10, TEXT_A_NEAR), (11, TEXT_C)])
    _run_stream(spark, watch, ledger, survivors, ckpt)
    assert _survivor_ids(spark, survivors) == {0: {1, 3}, 1: {11}}
    assert dd.ledger_releases(spark, ledger) == [0, 1]

    # the stream's ledger serves the batch pipeline identically: a
    # later batch release probing it refuses the same near-copy
    probe = spark.createDataFrame(
        [(99, TEXT_A_NEAR), (100, TEXT_C + " extended with new words")],
        "doc_id bigint, text string",
    )
    kept = {
        r["doc_id"]
        for r in dd.near_dedup_against_ledger(spark, probe, ledger).collect()
    }
    assert kept == set()  # 100 is a near-dup of admitted 11


def test_before_release_scopes_the_probe(spark, tmp_path):
    """before_release prunes the ledger probe to earlier releases —
    the replay contract's mechanism, verified directly."""
    ledger = str(tmp_path / "ledger")
    b0 = spark.createDataFrame([(1, TEXT_A)], "doc_id bigint, text string")
    b1 = spark.createDataFrame([(2, TEXT_B)], "doc_id bigint, text string")
    dd.build_minhash_ledger(b0, ledger, release=0)
    dd.append_minhash_ledger(b1, ledger, release=1)

    probe = spark.createDataFrame(
        [(10, TEXT_A_NEAR), (11, TEXT_B)], "doc_id bigint, text string"
    )
    all_pairs = {
        (r["doc_id"], r["ledger_doc"])
        for r in dd.ledger_near_dup_pairs(spark, probe, ledger).collect()
    }
    assert all_pairs == {(10, 1), (11, 2)}
    scoped = {
        (r["doc_id"], r["ledger_doc"])
        for r in dd.ledger_near_dup_pairs(
            spark, probe, ledger, before_release=1
        ).collect()
    }
    assert scoped == {(10, 1)}  # release 1 is invisible


def test_replayed_batch_does_not_self_match(spark, tmp_path, monkeypatch):
    """Crash AFTER the ledger append but before the checkpoint commit:
    the replayed batch finds its own release already in the ledger. The
    probe must exclude it (before_release) or the replay would drop
    every document as a duplicate of itself and commit an empty
    release — the silent-loss shape this test pins."""
    from map_reduce_using_cloud_functions_spark.streaming import near_dedup as nd

    watch = str(tmp_path / "in")
    ledger = str(tmp_path / "ledger")
    survivors = str(tmp_path / "out")
    ckpt = str(tmp_path / "ck")
    _write_jsonl(watch, "b0.jsonl", [(1, TEXT_A), (3, TEXT_B)])

    real_append = nd.append_minhash_ledger
    calls = []

    def crashy(documents, path, release):
        real_append(documents, path, release)
        calls.append(release)
        if len(calls) == 1:
            raise RuntimeError("injected crash AFTER ledger append")

    monkeypatch.setattr(nd, "append_minhash_ledger", crashy)
    with pytest.raises(Exception, match="injected crash"):
        _run_stream(spark, watch, ledger, survivors, ckpt)
    assert dd.ledger_releases(spark, ledger) == [0], "append did not land"

    # restart from the same checkpoint: batch 0 replays
    _run_stream(spark, watch, ledger, survivors, ckpt)
    assert calls == [0, 0], "batch 0 was not replayed"
    assert _survivor_ids(spark, survivors) == {0: {1, 3}}
    assert dd.ledger_releases(spark, ledger) == [0]


def test_fresh_checkpoint_against_owned_ledger_is_refused(spark, tmp_path):
    """A new checkpoint restarts batch ids at 0; its release overwrites
    would silently replace admitted documents — the binding refuses it
    with the remedy in the message."""
    watch = str(tmp_path / "in")
    ledger = str(tmp_path / "ledger")
    survivors = str(tmp_path / "out")
    _write_jsonl(watch, "b0.jsonl", [(1, TEXT_A)])
    _run_stream(spark, watch, ledger, survivors, str(tmp_path / "ck1"))
    assert _survivor_ids(spark, survivors) == {0: {1}}

    with pytest.raises(Exception, match="bound to streaming checkpoint"):
        _run_stream(spark, watch, ledger, survivors, str(tmp_path / "ck2"))
    # nothing was replaced
    assert _survivor_ids(spark, survivors) == {0: {1}}


def test_admit_batch_is_the_batch_twin(spark, tmp_path):
    """admit_batch drives the identical semantics from a batch caller:
    sequential releases over static frames equal the stream's output
    shape (stream ≡ batch, the house equivalence rule)."""
    ledger = str(tmp_path / "ledger")
    survivors = str(tmp_path / "out")
    b0 = spark.createDataFrame(
        [(1, TEXT_A), (2, TEXT_A), (3, TEXT_B)], "doc_id bigint, text string"
    )
    b1 = spark.createDataFrame(
        [(10, TEXT_A_NEAR), (11, TEXT_C)], "doc_id bigint, text string"
    )
    admit_batch(spark, b0, ledger, survivors, batch_id=0)
    admit_batch(spark, b1, ledger, survivors, batch_id=1)
    assert _survivor_ids(spark, survivors) == {0: {1, 3}, 1: {11}}


def test_cli_admit_once(spark, tmp_path, capsys):
    """The admit subcommand drains landed JSONL through the admission
    stream: duplicates refused, survivors release-partitioned."""
    from map_reduce_using_cloud_functions_spark.__main__ import main

    watch = str(tmp_path / "in")
    _write_jsonl(watch, "b0.jsonl", [(1, TEXT_A), (2, TEXT_A), (3, TEXT_B)])
    rc = main(
        [
            "admit",
            watch,
            str(tmp_path / "ledger"),
            str(tmp_path / "out"),
            str(tmp_path / "ck"),
            "--once",
        ],
        spark=spark,
    )
    assert rc == 0
    assert _survivor_ids(spark, str(tmp_path / "out")) == {0: {1, 3}}


@pytest.mark.parametrize("seed", [11, 29])
def test_admission_random_walk_matches_model(spark, tmp_path, seed):
    """Seeded random walk over the admission lifecycle — fresh batches,
    replays of old releases (crash recovery), re-ships of already
    admitted content under new ids — checked after every step against
    a dict model. Texts are built with DISJOINT vocabularies per
    identity so the MinHash estimate is exactly 1.0 (exact re-ship) or
    0.0 (fresh) and the model is deterministic."""
    import random

    rng = random.Random(seed)
    ledger = str(tmp_path / "ledger")
    survivors = str(tmp_path / "out")

    def text_of(identity):
        return " ".join(f"tok{identity}w{i}" for i in range(10))

    next_doc = [0]
    admitted = {}  # identity -> release it landed in
    releases = {}  # release -> set of surviving doc_ids
    batches = {}  # release -> rows (for replays)

    def make_batch(n_fresh, n_dup_ledger, n_dup_within):
        rows = []
        fresh_ids = []
        for _ in range(n_fresh):
            ident = f"f{next_doc[0]}"
            rows.append((next_doc[0], ident))
            fresh_ids.append((next_doc[0], ident))
            next_doc[0] += 1
        for _ in range(n_dup_ledger):
            if admitted:
                ident = rng.choice(sorted(admitted))
                rows.append((next_doc[0], ident))
                next_doc[0] += 1
        for _ in range(n_dup_within):
            if fresh_ids:
                _, ident = rng.choice(fresh_ids)
                rows.append((next_doc[0], ident))
                next_doc[0] += 1
        rng.shuffle(rows)
        return rows

    def run(release, rows):
        df = spark.createDataFrame(
            [(i, text_of(ident)) for i, ident in rows],
            "doc_id bigint, text string",
        )
        admit_batch(spark, df, ledger, survivors, batch_id=release)

    def model(release, rows):
        # within-batch: min doc_id per identity; ledger: identity new?
        by_ident = {}
        for i, ident in rows:
            by_ident.setdefault(ident, []).append(i)
        kept = set()
        for ident, ids in by_ident.items():
            if ident in admitted and admitted[ident] < release:
                continue
            kept.add(min(ids))
            if ident not in admitted:
                admitted[ident] = release
        releases[release] = kept

    def check(step):
        got = {}
        for r in (
            spark.read.parquet(survivors).select("release", "doc_id").collect()
        ):
            got.setdefault(r["release"], set()).add(r["doc_id"])
        # an all-duplicates batch admits nothing: dynamic overwrite
        # writes no partition for an empty survivor set, so empty
        # releases simply don't exist on disk (in survivors OR ledger)
        want = {r: s for r, s in releases.items() if s}
        assert got == want, f"step {step}: {got} != {want}"
        assert dd.ledger_releases(spark, ledger) == sorted(want)

    release = 0
    rows = make_batch(2, 0, 1)
    run(release, rows)
    model(release, rows)
    check("init")

    for step in range(6):
        op = rng.choice(["fresh", "mixed", "replay", "reship"])
        if op in ("fresh", "mixed"):
            release += 1
            rows = make_batch(
                rng.randrange(1, 3),
                rng.randrange(0, 2) if op == "mixed" else 0,
                rng.randrange(0, 2),
            )
            batches[release] = rows
            run(release, rows)
            model(release, rows)
        elif op == "replay" and batches:
            # crash recovery: same content, same id — must converge to
            # the same state (probe excludes the replayed release)
            r = max(batches)
            run(r, batches[r])
        else:  # reship: admitted content under a NEW release — all dropped
            release += 1
            rows = make_batch(0, 2, 0)
            if not rows:
                continue
            batches[release] = rows
            run(release, rows)
            model(release, rows)
        check(f"step{step}:{op}")


def test_adopted_ledger_higher_releases_still_gate(spark, tmp_path):
    """An adopting stream whose fresh batch ids start BELOW the
    ledger's existing release ids must still probe those releases:
    the probe excludes only release == batch_id, not release >=
    batch_id (the old `<` filter silently skipped every existing
    release and admitted duplicates of admitted content)."""
    ledger = str(tmp_path / "ledger")
    surv = str(tmp_path / "surv")
    base = spark.createDataFrame([(100, TEXT_A)], "doc_id bigint, text string")
    dd.build_minhash_ledger(base, ledger, release=5)  # caller-chosen high id
    batch = spark.createDataFrame(
        [(200, TEXT_A_NEAR), (201, TEXT_B)], "doc_id bigint, text string"
    )
    admit_batch(spark, batch, ledger, surv, batch_id=0)
    got = _survivor_ids(spark, surv)
    assert got == {0: {201}}  # 200 gated by release 5; old filter admitted it


def test_admit_batch_rejects_mismatched_sketch_params(spark, tmp_path):
    """Sketch parameters are the ledger's identity: an admission that
    passes k/bands/shingle_n different from the stored meta must raise
    instead of silently comparing incomparable sketches."""
    ledger = str(tmp_path / "ledger")
    surv = str(tmp_path / "surv")
    base = spark.createDataFrame([(1, TEXT_A)], "doc_id bigint, text string")
    dd.build_minhash_ledger(base, ledger, release=0, bands=8, shingle_n=2)
    batch = spark.createDataFrame([(2, TEXT_B)], "doc_id bigint, text string")
    with pytest.raises(ValueError, match="sketch parameters"):
        admit_batch(spark, batch, ledger, surv, batch_id=1)  # default bands=4
    # matching params pass, and the within-batch dedup runs on the SAME
    # non-default sketch (stream ≡ batch for non-default geometries)
    batch2 = spark.createDataFrame(
        [(3, TEXT_B), (4, TEXT_B + " extra"), (5, TEXT_A_NEAR)],
        "doc_id bigint, text string",
    )
    admit_batch(spark, batch2, ledger, surv, batch_id=1, bands=8, shingle_n=2)
    got = _survivor_ids(spark, surv)
    assert 1 in got and 3 in got[1] and 5 not in got[1]  # 5 gated by release 0


# --- composed front door (r8): admit + index in one batch -----------------


def _run_front_door(spark, watch, ledger, survivors, index, ckpt):
    from map_reduce_using_cloud_functions_spark.streaming.near_dedup import (
        start_front_door_stream,
    )

    q = start_front_door_stream(
        spark,
        streaming_corpus_from_jsonl(spark, watch),
        ledger,
        survivors,
        index,
        ckpt,
    )
    q.awaitTermination(180)


def test_front_door_stream_admits_and_indexes(spark, tmp_path):
    """One stream, two sinks: admitted survivors land release-
    partitioned AND their postings are servable from the versioned
    word index; rejected near-dups reach neither sink. The index must
    equal a batch build over exactly the admitted corpus."""
    from map_reduce_using_cloud_functions_spark.operators import index as ix

    watch = str(tmp_path / "in")
    ledger = str(tmp_path / "ledger")
    survivors = str(tmp_path / "out")
    index = str(tmp_path / "idx")
    ckpt = str(tmp_path / "ck")

    _write_jsonl(watch, "b0.jsonl", [(1, TEXT_A), (2, TEXT_A), (3, TEXT_B)])
    _run_front_door(spark, watch, ledger, survivors, index, ckpt)
    assert _survivor_ids(spark, survivors) == {0: {1, 3}}
    assert ix.index_version(spark, index) is not None  # versioned layout

    _write_jsonl(watch, "b1.jsonl", [(10, TEXT_A_NEAR), (11, TEXT_C)])
    _run_front_door(spark, watch, ledger, survivors, index, ckpt)
    assert _survivor_ids(spark, survivors) == {0: {1, 3}, 1: {11}}

    # index == batch build over the admitted corpus (stream ≡ batch)
    import pyspark.sql.functions as F

    admitted = spark.read.parquet(survivors).select(
        F.col("doc_id").cast("string").alias("document"), "text"
    )
    want = sorted(map(tuple, ix.build_index(admitted).collect()))
    got = sorted(map(tuple, ix.read_index(spark, index).collect()))
    assert got == want

    # point lookups serve admitted content; the rejected near-copy's
    # marker word ("today", only in TEXT_A_NEAR) is absent
    docs = {r["document"] for r in ix.lookup_persisted(spark, index, "quick").collect()}
    assert docs == {"1"}
    assert ix.lookup_persisted(spark, index, "today").count() == 0


def test_front_door_replay_converges_both_sinks(spark, tmp_path, monkeypatch):
    """Crash injection at the nastiest point — AFTER the admission
    sink committed, BEFORE the index sink ran — then replay: both
    sinks converge to exactly-once (no double counts, single survivor
    copy). A second full replay of a completed batch is a no-op."""
    import pyspark.sql.functions as F

    from map_reduce_using_cloud_functions_spark.operators import index as ix
    from map_reduce_using_cloud_functions_spark.streaming.near_dedup import (
        admit_and_index_batch,
    )

    ledger = str(tmp_path / "ledger")
    surv = str(tmp_path / "out")
    index = str(tmp_path / "idx")
    ckpt = str(tmp_path / "ck")

    b0 = spark.createDataFrame(
        [(1, TEXT_A), (3, TEXT_B)], "doc_id bigint, text string"
    )
    # crash before the first full index build
    real_write_index = ix.write_index

    def boom(*a, **k):
        raise IOError("injected crash before index build")

    monkeypatch.setattr(ix, "write_index", boom)
    with pytest.raises(IOError, match="injected"):
        admit_and_index_batch(spark, b0, ledger, surv, index, ckpt, 0)
    monkeypatch.setattr(ix, "write_index", real_write_index)
    assert _survivor_ids(spark, surv) == {0: {1, 3}}  # admission landed
    assert not ix.index_exists(spark, index)

    # replay converges: admission overwrites its release, index builds
    admit_and_index_batch(spark, b0, ledger, surv, index, ckpt, 0)
    assert _survivor_ids(spark, surv) == {0: {1, 3}}
    base = sorted(map(tuple, ix.read_index(spark, index).collect()))

    # batch 1: crash between admission and the delta write
    b1 = spark.createDataFrame(
        [(10, TEXT_A_NEAR), (11, TEXT_C)], "doc_id bigint, text string"
    )
    real_delta = ix.write_additive_delta
    monkeypatch.setattr(ix, "write_additive_delta", boom)
    with pytest.raises(IOError, match="injected"):
        admit_and_index_batch(spark, b1, ledger, surv, index, ckpt, 1)
    monkeypatch.setattr(ix, "write_additive_delta", real_delta)
    assert _survivor_ids(spark, surv) == {0: {1, 3}, 1: {11}}
    assert sorted(map(tuple, ix.read_index(spark, index).collect())) == base

    # replay lands the delta exactly once; a FULL second replay of the
    # completed batch changes nothing on either sink
    admit_and_index_batch(spark, b1, ledger, surv, index, ckpt, 1)
    after = sorted(map(tuple, ix.read_index(spark, index).collect()))
    admitted = spark.read.parquet(surv).select(
        F.col("doc_id").cast("string").alias("document"), "text"
    )
    assert after == sorted(map(tuple, ix.build_index(admitted).collect()))
    admit_and_index_batch(spark, b1, ledger, surv, index, ckpt, 1)
    assert _survivor_ids(spark, surv) == {0: {1, 3}, 1: {11}}
    assert sorted(map(tuple, ix.read_index(spark, index).collect())) == after


def test_cli_admit_with_index_path_runs_front_door(spark, tmp_path):
    """admit --index-path drives the composed front door: survivors
    land AND their postings are queryable from the versioned index."""
    from map_reduce_using_cloud_functions_spark.__main__ import main
    from map_reduce_using_cloud_functions_spark.operators import index as ix

    watch = str(tmp_path / "in")
    _write_jsonl(watch, "b0.jsonl", [(1, TEXT_A), (2, TEXT_A), (3, TEXT_B)])
    idx = str(tmp_path / "idx")
    rc = main(
        [
            "admit",
            watch,
            str(tmp_path / "ledger"),
            str(tmp_path / "out"),
            str(tmp_path / "ck"),
            "--index-path",
            idx,
            "--once",
        ],
        spark=spark,
    )
    assert rc == 0
    assert _survivor_ids(spark, str(tmp_path / "out")) == {0: {1, 3}}
    assert ix.index_version(spark, idx) is not None
    docs = {r["document"] for r in ix.lookup_persisted(spark, idx, "quick").collect()}
    assert docs == {"1"}


def test_post_binding_foreign_release_collision_is_refused(spark, tmp_path):
    """An adopting stream records the ledger's pre-existing (foreign)
    release ids; after binding, a later batch whose id EQUALS one of
    them must refuse instead of passing as a crash replay — the
    dynamic release-partition overwrite would erase that release's
    admitted documents and re-admit their future near-duplicates."""
    watch = str(tmp_path / "in")
    ledger = str(tmp_path / "ledger")
    survivors = str(tmp_path / "out")
    ckpt = str(tmp_path / "ck")
    # batch pipeline pre-built the ledger with a LOW caller-chosen id
    base = spark.createDataFrame([(100, TEXT_C)], "doc_id bigint, text string")
    dd.build_minhash_ledger(base, ledger, release=2)

    _write_jsonl(watch, "b0.jsonl", [(1, TEXT_A)])
    _run_stream(spark, watch, ledger, survivors, ckpt)  # adopts at batch 0
    _write_jsonl(watch, "b1.jsonl", [(2, TEXT_B)])
    _run_stream(spark, watch, ledger, survivors, ckpt)  # batch 1 — bound now
    assert _survivor_ids(spark, survivors) == {0: {1}, 1: {2}}

    _write_jsonl(watch, "b2.jsonl", [(3, TEXT_A + " brand new tail words")])
    with pytest.raises(Exception, match="collides with a release"):
        _run_stream(spark, watch, ledger, survivors, ckpt)  # batch 2 = foreign
    # release 2's admitted document still gates: nothing was replaced
    assert 100 in {
        r["doc_id"]
        for r in spark.read.parquet(f"{ledger}/sigs").where("release = 2").collect()
    }


# --- r9: takedown on the admission side --------------------------------------


def test_delete_from_ledger_stops_gating(spark, tmp_path):
    """A retracted document's sketches leave the ledger: its future
    near-duplicates become admissible again, everything else still
    gates, and a release left empty loses its partition directories
    (the dynamic-overwrite no-rows gap)."""
    ledger = str(tmp_path / "ledger")
    surv = str(tmp_path / "surv")
    b0 = spark.createDataFrame([(1, TEXT_A), (2, TEXT_B)], "doc_id bigint, text string")
    b1 = spark.createDataFrame([(3, TEXT_C)], "doc_id bigint, text string")
    admit_batch(spark, b0, ledger, surv, batch_id=0)
    admit_batch(spark, b1, ledger, surv, batch_id=1)

    probe = spark.createDataFrame(
        [(10, TEXT_A_NEAR), (11, TEXT_C + " extra tail")], "doc_id bigint, text string"
    )
    gated = admit_batch(spark, probe, ledger, surv, batch_id=2)
    assert {r["doc_id"] for r in gated.collect()} == set()  # both gate

    dd.delete_from_ledger(spark, ledger, [1])  # retract TEXT_A's doc
    probe2 = spark.createDataFrame(
        [(20, TEXT_A_NEAR), (21, TEXT_C + " extra tail")], "doc_id bigint, text string"
    )
    admitted = admit_batch(spark, probe2, ledger, surv, batch_id=3)
    got = {r["doc_id"] for r in admitted.collect()}
    assert 20 in got      # near-dup of the retracted doc admits now
    assert 21 not in got  # TEXT_C still gates

    # empty a whole release: doc 3 was release 1's only member
    dd.delete_from_ledger(spark, ledger, [3])
    import os

    assert not os.path.exists(f"{ledger}/sigs/release=1")
    assert not os.path.exists(f"{ledger}/bands/release=1")


def test_delete_from_survivors_rewrites_touched_releases(spark, tmp_path):
    ledger = str(tmp_path / "ledger")
    surv = str(tmp_path / "surv")
    b0 = spark.createDataFrame([(1, TEXT_A), (2, TEXT_B)], "doc_id bigint, text string")
    b1 = spark.createDataFrame([(3, TEXT_C)], "doc_id bigint, text string")
    admit_batch(spark, b0, ledger, surv, batch_id=0)
    admit_batch(spark, b1, ledger, surv, batch_id=1)
    dd.delete_from_survivors(spark, surv, [2, 3])
    assert _survivor_ids(spark, surv) == {0: {1}}
    import os

    assert not os.path.exists(f"{surv}/release=1")  # emptied release swept


# --- r9: front-door quality gating -------------------------------------------

JUNK = "aaa aaa aaa aaa aaa aaa aaa 111 222 333 444 555 666 777 888 999 000"


def test_front_door_quality_gate_stream_equals_batch(spark, tmp_path):
    """min_quality drops low-quality documents BEFORE admission (they
    never sketch, never gate anyone later), the stream and the batch
    twin agree with the gate on, and rejected docs do NOT enter the
    ledger — a later clean near-duplicate of a rejected doc admits."""
    from map_reduce_using_cloud_functions_spark.operators import index as ix
    from map_reduce_using_cloud_functions_spark.operators.text_analysis import (
        text_features,
    )
    from map_reduce_using_cloud_functions_spark.streaming.near_dedup import (
        admit_and_index_batch,
    )
    from map_reduce_using_cloud_functions_spark.streaming.prep import (
        streaming_corpus_from_jsonl,
    )
    from map_reduce_using_cloud_functions_spark.streaming.near_dedup import (
        start_front_door_stream,
    )

    # pick a threshold that separates the fixture texts from JUNK
    probe = spark.createDataFrame(
        [(1, TEXT_A), (2, TEXT_B), (9, JUNK)], "doc_id bigint, text string"
    )
    q = {r["doc_id"]: r["quality"] for r in text_features(probe).collect()}
    assert q[9] < min(q[1], q[2]), "JUNK must score below the real texts"
    cut = (q[9] + min(q[1], q[2])) / 2

    # batch twin
    b_ledger, b_surv, b_idx = (
        str(tmp_path / "bl"), str(tmp_path / "bs"), str(tmp_path / "bi")
    )
    admit_and_index_batch(
        spark,
        spark.createDataFrame(
            [(1, TEXT_A), (9, JUNK), (3, TEXT_B)], "doc_id bigint, text string"
        ),
        b_ledger, b_surv, b_idx, str(tmp_path / "bck"), 0, min_quality=cut,
    )
    assert _survivor_ids(spark, b_surv) == {0: {1, 3}}  # 9 gated on quality

    # stream form over the same content
    watch = str(tmp_path / "in")
    _write_jsonl(watch, "b0.jsonl", [(1, TEXT_A), (9, JUNK), (3, TEXT_B)])
    s_ledger, s_surv, s_idx = (
        str(tmp_path / "sl"), str(tmp_path / "ss"), str(tmp_path / "si")
    )
    start_front_door_stream(
        spark,
        streaming_corpus_from_jsonl(spark, watch),
        s_ledger, s_surv, s_idx, str(tmp_path / "sck"),
        min_quality=cut,
    ).awaitTermination(180)
    assert _survivor_ids(spark, s_surv) == _survivor_ids(spark, b_surv)
    a = sorted(map(tuple, ix.read_index(spark, b_idx).collect()))
    b = sorted(map(tuple, ix.read_index(spark, s_idx).collect()))
    assert a == b  # stream ≡ batch with the gate on

    # rejected docs never entered the ledger: a clean near-dup of JUNK
    # (quality lifted above the cut) is admissible later
    lifted = JUNK + " " + TEXT_C  # same junk prefix, now above the cut
    b1 = spark.createDataFrame([(30, lifted)], "doc_id bigint, text string")
    admit_and_index_batch(
        spark, b1, b_ledger, b_surv, b_idx, str(tmp_path / "bck"), 1,
        min_quality=cut,
    )
    assert 30 in _survivor_ids(spark, b_surv).get(1, set())


def test_front_door_quality_gate_replay_converges(spark, tmp_path, monkeypatch):
    """Crash between the sinks WITH the gate on: the replay recomputes
    the identical (deterministic) gate verdicts and both sinks
    converge exactly-once."""
    from map_reduce_using_cloud_functions_spark.operators import index as ix
    from map_reduce_using_cloud_functions_spark.streaming.near_dedup import (
        admit_and_index_batch,
    )

    ledger, surv, idx = (
        str(tmp_path / "l"), str(tmp_path / "s"), str(tmp_path / "i")
    )
    ckpt = str(tmp_path / "ck")
    b0 = spark.createDataFrame(
        [(1, TEXT_A), (9, JUNK)], "doc_id bigint, text string"
    )

    def boom(*a, **k):
        raise IOError("injected crash before index build")

    monkeypatch.setattr(ix, "write_index", boom)
    with pytest.raises(IOError, match="injected"):
        admit_and_index_batch(
            spark, b0, ledger, surv, idx, ckpt, 0, min_quality=0.3
        )
    monkeypatch.undo()
    assert _survivor_ids(spark, surv) == {0: {1}}
    admit_and_index_batch(spark, b0, ledger, surv, idx, ckpt, 0, min_quality=0.3)
    assert _survivor_ids(spark, surv) == {0: {1}}
    got = sorted(map(tuple, ix.read_index(spark, idx).collect()))
    expect = sorted(
        map(
            tuple,
            ix.build_index(
                spark.createDataFrame([("1", TEXT_A)], "document string, text string")
            ).collect(),
        )
    )
    assert got == expect  # JUNK postings never reach the index


def test_front_door_quality_filter_callable(spark, tmp_path):
    """The general hook: any deterministic DataFrame -> DataFrame
    filter (e.g. a frozen learned scorer) gates admission."""
    from map_reduce_using_cloud_functions_spark.streaming.near_dedup import (
        admit_and_index_batch,
    )

    ledger, surv, idx = (
        str(tmp_path / "l"), str(tmp_path / "s"), str(tmp_path / "i")
    )
    b0 = spark.createDataFrame(
        [(1, TEXT_A), (2, TEXT_B), (3, TEXT_C)], "doc_id bigint, text string"
    )
    admit_and_index_batch(
        spark, b0, ledger, surv, idx, str(tmp_path / "ck"), 0,
        quality_filter=lambda df: df.where("doc_id % 2 = 1"),
    )
    assert _survivor_ids(spark, surv) == {0: {1, 3}}


def test_cli_takedown_purges_all_surfaces(spark, tmp_path, capsys):
    """One takedown command retracts a document from the word index
    (postings gone), the admission ledger (near-dups admit again), and
    the shipped survivors."""
    from map_reduce_using_cloud_functions_spark.__main__ import main
    from map_reduce_using_cloud_functions_spark.operators import index as ix
    from map_reduce_using_cloud_functions_spark.streaming.near_dedup import (
        admit_and_index_batch,
    )

    ledger = str(tmp_path / "ledger")
    surv = str(tmp_path / "surv")
    idx = str(tmp_path / "idx")
    b0 = spark.createDataFrame([(1, TEXT_A), (2, TEXT_B)], "doc_id bigint, text string")
    admit_and_index_batch(spark, b0, ledger, surv, idx, str(tmp_path / "ck"), 0)
    assert _survivor_ids(spark, surv) == {0: {1, 2}}

    rc = main(
        ["takedown", "1", "--index", idx, "--ledger", ledger, "--survivors", surv],
        spark=spark,
    )
    assert rc in (0, None)
    # index: doc 1's postings purged
    docs = {r["document"] for r in ix.read_index(spark, idx).collect()}
    assert docs == {"2"}
    # survivors: gone
    assert _survivor_ids(spark, surv) == {0: {2}}
    # ledger: TEXT_A near-dups admit again
    b1 = spark.createDataFrame([(30, TEXT_A_NEAR)], "doc_id bigint, text string")
    admitted = admit_batch(spark, b1, ledger, surv, batch_id=1)
    assert {r["doc_id"] for r in admitted.collect()} == {30}

    # no targets → usage error
    assert main(["takedown", "1"], spark=spark) == 2


def test_stream_continues_after_ledger_compaction(spark, tmp_path):
    """Ledger major compaction between micro-batches (the quiesced-
    producer discipline): folded releases keep gating from release=-1,
    the restarted stream's next batch id never collides with the
    folded partition (it is negative by contract), and survivors
    partitions — a separate table — are untouched."""
    from map_reduce_using_cloud_functions_spark.operators.dedup import (
        compact_minhash_ledger,
    )

    watch = str(tmp_path / "in")
    ledger = str(tmp_path / "ledger")
    survivors = str(tmp_path / "out")
    ckpt = str(tmp_path / "ck")

    _write_jsonl(watch, "b0.jsonl", [(1, TEXT_A), (2, TEXT_B)])
    _run_stream(spark, watch, ledger, survivors, ckpt)
    _write_jsonl(watch, "b1.jsonl", [(10, TEXT_C)])
    _run_stream(spark, watch, ledger, survivors, ckpt)
    assert dd.ledger_releases(spark, ledger) == [0, 1]

    assert compact_minhash_ledger(spark, ledger, keep_last=1) == [0]
    assert dd.ledger_releases(spark, ledger) == [-1, 1]
    assert _survivor_ids(spark, survivors) == {0: {1, 2}, 1: {10}}

    # batch 2: a near-copy of folded-release content must still be
    # refused (it gates from -1); fresh content admits as release 2
    fresh = (
        "an entirely new report where meteor showers streak across "
        "mountain observatories and astronomers chart every arc by hand"
    )
    _write_jsonl(watch, "b2.jsonl", [(20, TEXT_A_NEAR), (21, fresh)])
    _run_stream(spark, watch, ledger, survivors, ckpt)
    assert _survivor_ids(spark, survivors)[2] == {21}
    assert dd.ledger_releases(spark, ledger) == [-1, 1, 2]


# ------------------------------------------------ semantic admission


TEXT_A_SCRAMBLED = " ".join(reversed(TEXT_A.split()))  # same tokens, no shingles


def test_semantic_gate_refuses_paraphrases(spark, tmp_path):
    """The third gating strength: a word-scrambled paraphrase shares
    ZERO trigram shingles (the MinHash gate admits it) but an identical
    token multiset (cosine 1.0 under the hashing-trick embedder) — only
    the semantic ledger refuses it. Within-batch semantic dups keep the
    min doc_id; replays converge."""
    from map_reduce_using_cloud_functions_spark.streaming.near_dedup import (
        admit_batch,
    )

    led = str(tmp_path / "led")
    sled = str(tmp_path / "sled")
    out = str(tmp_path / "out")

    b0 = spark.createDataFrame(
        [(1, TEXT_A), (2, TEXT_B)], "doc_id bigint, text string"
    )
    admit_batch(
        spark, b0, led, out, 0, semantic_ledger_path=sled
    )
    assert _survivor_ids(spark, out) == {0: {1, 2}}

    # sanity: WITHOUT the semantic gate the scramble is admitted
    led2, out2 = str(tmp_path / "led2"), str(tmp_path / "out2")
    admit_batch(spark, b0, led2, out2, 0)
    b1 = spark.createDataFrame(
        [(10, TEXT_A_SCRAMBLED), (11, TEXT_C)], "doc_id bigint, text string"
    )
    admit_batch(spark, b1, led2, out2, 1)
    assert _survivor_ids(spark, out2)[1] == {10, 11}

    # WITH the semantic gate: scramble refused, fresh doc admitted;
    # a within-batch scramble of 11 is also dropped (min-id survivor)
    b1s = spark.createDataFrame(
        [
            (10, TEXT_A_SCRAMBLED),
            (11, TEXT_C),
            (12, " ".join(reversed(TEXT_C.split()))),
        ],
        "doc_id bigint, text string",
    )
    survivors = admit_batch(
        spark, b1s, led, out, 1, semantic_ledger_path=sled
    )
    assert {r["doc_id"] for r in survivors.collect()} == {11}
    assert _survivor_ids(spark, out)[1] == {11}
    assert dd.ledger_releases(spark, sled) == [0, 1]

    # replay: identical survivors, both ledgers unchanged
    n_vecs = spark.read.parquet(f"{sled}/vecs").count()
    replay = admit_batch(
        spark, b1s, led, out, 1, semantic_ledger_path=sled
    )
    assert {r["doc_id"] for r in replay.collect()} == {11}
    assert spark.read.parquet(f"{sled}/vecs").count() == n_vecs


def test_semantic_stream_equals_batch_and_crash_replay(spark, tmp_path):
    """Stream ≡ batch with the semantic gate on, and a crash between
    the MinHash append and the embedding append converges on replay."""
    import pytest

    from map_reduce_using_cloud_functions_spark.streaming import near_dedup as nd

    watch = str(tmp_path / "in")
    led, sled = str(tmp_path / "led"), str(tmp_path / "sled")
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ck")

    _write_jsonl(watch, "b0.jsonl", [(1, TEXT_A), (2, TEXT_B)])
    q = nd.start_near_dedup_stream(
        spark,
        streaming_corpus_from_jsonl(spark, watch),
        led,
        out,
        ckpt,
        semantic_ledger_path=sled,
    )
    q.awaitTermination(180)
    _write_jsonl(watch, "b1.jsonl", [(10, TEXT_A_SCRAMBLED), (11, TEXT_C)])
    q = nd.start_near_dedup_stream(
        spark,
        streaming_corpus_from_jsonl(spark, watch),
        led,
        out,
        ckpt,
        semantic_ledger_path=sled,
    )
    q.awaitTermination(180)
    assert _survivor_ids(spark, out) == {0: {1, 2}, 1: {11}}
    assert dd.ledger_releases(spark, sled) == [0, 1]

    # batch twin on fresh paths: identical survivor sets per release
    led_b, sled_b, out_b = (
        str(tmp_path / "ledb"),
        str(tmp_path / "sledb"),
        str(tmp_path / "outb"),
    )
    b0 = spark.createDataFrame([(1, TEXT_A), (2, TEXT_B)], "doc_id bigint, text string")
    b1 = spark.createDataFrame(
        [(10, TEXT_A_SCRAMBLED), (11, TEXT_C)], "doc_id bigint, text string"
    )
    nd.admit_batch(spark, b0, led_b, out_b, 0, semantic_ledger_path=sled_b)
    nd.admit_batch(spark, b1, led_b, out_b, 1, semantic_ledger_path=sled_b)
    assert _survivor_ids(spark, out_b) == _survivor_ids(spark, out)

    # crash between the two ledger appends, then replay converges
    from map_reduce_using_cloud_functions_spark.operators import dedup as ddm

    b2 = spark.createDataFrame(
        [(20, TEXT_B + " with a few extra closing words appended here")],
        "doc_id bigint, text string",
    )
    real = ddm.append_embedding_ledger

    def boom(*a, **k):
        raise RuntimeError("injected crash before the embedding append")

    ddm.append_embedding_ledger = boom
    try:
        with pytest.raises(RuntimeError, match="injected"):
            nd.admit_batch(spark, b2, led_b, out_b, 2, semantic_ledger_path=sled_b)
    finally:
        ddm.append_embedding_ledger = real
    # minhash append landed, embedding append did not — replay heals
    assert dd.ledger_releases(spark, led_b) == [0, 1, 2]
    assert dd.ledger_releases(spark, sled_b) == [0, 1]
    nd.admit_batch(spark, b2, led_b, out_b, 2, semantic_ledger_path=sled_b)
    assert dd.ledger_releases(spark, sled_b) == [0, 1, 2]
    assert _survivor_ids(spark, out_b)[2] == {20}


def test_semantic_param_mismatch_refuses(spark, tmp_path):
    """Sketch geometry is the semantic ledger's identity — a later
    admission with different banding refuses loudly."""
    import pytest

    from map_reduce_using_cloud_functions_spark.streaming.near_dedup import (
        admit_batch,
    )

    led, sled, out = (
        str(tmp_path / "led"),
        str(tmp_path / "sled"),
        str(tmp_path / "out"),
    )
    b0 = spark.createDataFrame([(1, TEXT_A)], "doc_id bigint, text string")
    admit_batch(spark, b0, led, out, 0, semantic_ledger_path=sled)
    b1 = spark.createDataFrame([(2, TEXT_B)], "doc_id bigint, text string")
    with pytest.raises(ValueError, match="geometry is the ledger's identity"):
        admit_batch(
            spark,
            b1,
            led,
            out,
            1,
            semantic_ledger_path=sled,
            semantic_planes_per_band=4,
        )


def test_front_door_all_gates_composed(spark, tmp_path):
    """The full front door with EVERY stage on — quality gate, lexical
    (MinHash) gate, semantic (embedding) gate, index sink — in one
    exactly-once stream: each rejection reason drops its document from
    BOTH sinks, and the admitted corpus serves from the index."""
    from map_reduce_using_cloud_functions_spark.operators import index as ix
    from map_reduce_using_cloud_functions_spark.streaming.near_dedup import (
        start_front_door_stream,
    )

    watch = str(tmp_path / "in")
    led, sled = str(tmp_path / "led"), str(tmp_path / "sled")
    out, idx, ckpt = (
        str(tmp_path / "out"),
        str(tmp_path / "idx"),
        str(tmp_path / "ck"),
    )
    junk = "zz zz zz zz zz zz zz zz zz zz zz zz"  # quality-floor casualty
    _write_jsonl(watch, "b0.jsonl", [(1, TEXT_A), (2, TEXT_B), (3, junk)])
    q = start_front_door_stream(
        spark,
        streaming_corpus_from_jsonl(spark, watch),
        led,
        out,
        idx,
        ckpt,
        min_quality=0.3,
        semantic_ledger_path=sled,
    )
    q.awaitTermination(180)
    assert _survivor_ids(spark, out) == {0: {1, 2}}

    # batch 1: one doc per rejection reason + one genuinely new doc
    _write_jsonl(
        watch,
        "b1.jsonl",
        [
            (10, TEXT_A_NEAR),  # lexical near-dup -> MinHash gate
            (11, TEXT_A_SCRAMBLED),  # paraphrase -> semantic gate
            (12, junk + " zz"),  # low quality -> quality gate
            (13, TEXT_C),  # novel -> admitted
        ],
    )
    q = start_front_door_stream(
        spark,
        streaming_corpus_from_jsonl(spark, watch),
        led,
        out,
        idx,
        ckpt,
        min_quality=0.3,
        semantic_ledger_path=sled,
    )
    q.awaitTermination(180)
    assert _survivor_ids(spark, out) == {0: {1, 2}, 1: {13}}
    assert dd.ledger_releases(spark, led) == [0, 1]
    assert dd.ledger_releases(spark, sled) == [0, 1]

    # the index serves exactly the admitted corpus: TEXT_C's marker
    # word is servable, every rejected doc's marker is absent
    assert {
        r["document"]
        for r in ix.lookup_persisted(spark, idx, "sailor").collect()
    } == {"13"}
    assert ix.lookup_persisted(spark, idx, "today").count() == 0  # lexical reject
    assert ix.lookup_persisted(spark, idx, "zz").count() == 0  # quality reject


def test_front_door_report_accounts_for_all_artifacts(spark, tmp_path, capsys):
    """r11 observability: one report over the committed artifacts —
    per-release admitted counts equal to the survivors partitions,
    per-strength ledger state, index watermark — plus refusal math when
    the caller supplies landing batch sizes; the CLI verb prints the
    same as JSON."""
    import json as _json

    from map_reduce_using_cloud_functions_spark.__main__ import main
    from map_reduce_using_cloud_functions_spark.streaming.report import (
        front_door_report,
    )

    watch = str(tmp_path / "in")
    ledger = str(tmp_path / "ledger")
    survivors = str(tmp_path / "out")
    index = str(tmp_path / "idx")
    sled = str(tmp_path / "sled")
    ckpt = str(tmp_path / "ck")

    batches = [
        [(1, TEXT_A), (2, TEXT_A), (3, TEXT_B)],  # 2 admitted
        [(10, TEXT_A_NEAR), (11, TEXT_C)],  # 1 admitted
        [(20, TEXT_B), (21, TEXT_C + " with a fresh unique tail")],  # 0
    ]
    from map_reduce_using_cloud_functions_spark.streaming.near_dedup import (
        start_front_door_stream,
    )

    for i, rows in enumerate(batches):
        _write_jsonl(watch, f"b{i}.jsonl", rows)
        q = start_front_door_stream(
            spark,
            streaming_corpus_from_jsonl(spark, watch),
            ledger,
            survivors,
            index,
            ckpt,
            semantic_ledger_path=sled,
        )
        q.awaitTermination(180)

    report = front_door_report(
        spark,
        survivors_path=survivors,
        ledger_path=ledger,
        semantic_ledger_path=sled,
        index_path=index,
        batch_sizes={0: 3, 1: 2, 2: 2},
    )
    assert report["admitted_per_release"] == {0: 2, 1: 1}
    assert report["admitted_total"] == 3
    assert report["refused_per_release"] == {0: 1, 1: 1, 2: 2}
    assert report["minhash_ledger"]["kind"] == "minhash"
    # an all-refused batch ships no rows, so no release partition
    # exists for it — absence IS the record (dynamic overwrite layout)
    assert report["minhash_ledger"]["releases"] == [0, 1]
    assert report["minhash_ledger"]["per_release"] == {0: 2, 1: 1}
    assert report["semantic_ledger"]["kind"] == "embedding"
    assert report["index"]["folded_through"] is not None
    assert report["index"]["base_bytes"] > 0

    rc = main(
        [
            "front-door-report",
            "--survivors",
            survivors,
            "--ledger",
            ledger,
            "--semantic-ledger",
            sled,
            "--index",
            index,
        ],
        spark=spark,
    )
    assert rc == 0
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    # JSON round-trip stringifies int keys — compare on values
    assert out["admitted_total"] == 3
    assert out["admitted_per_release"] == {"0": 2, "1": 1}
    assert out["minhash_ledger"]["releases"] == [0, 1]
    assert "refused_per_release" not in out  # no batch sizes given

    # the phash strength reports through the same door
    from map_reduce_using_cloud_functions_spark.operators import (
        multimodal as mm,
    )
    from map_reduce_using_cloud_functions_spark.streaming.near_dedup import (
        admit_assets_batch,
    )
    import numpy as np

    pled = str(tmp_path / "pled")
    psur = str(tmp_path / "pout")
    png = mm.encode_png(
        np.random.default_rng(5).integers(0, 256, (16, 16), dtype=np.uint8)
    )
    admit_assets_batch(
        spark,
        spark.createDataFrame(
            [(1, bytearray(png))], "asset_id bigint, payload binary"
        ),
        pled,
        psur,
        batch_id=0,
    )
    rep2 = front_door_report(
        spark, survivors_path=psur, phash_ledger_path=pled
    )
    assert rep2["admitted_per_release"] == {0: 1}
    assert rep2["phash_ledger"]["kind"] == "phash"
    assert rep2["phash_ledger"]["signal"] == "image"
    assert rep2["phash_ledger"]["per_release"] == {0: 1}


def test_text_door_auto_compaction(spark, tmp_path):
    """compact_after_releases on the TEXT door: the MinHash ledger
    folds into release=-1 once the probe fan-out crosses the
    threshold, inside the admission round, and folded history still
    refuses a near-duplicate of the first (long-folded) document."""
    ledger = str(tmp_path / "led")
    survivors = str(tmp_path / "out")
    texts = [TEXT_A, TEXT_B, TEXT_C]
    for bid in range(3):
        df = spark.createDataFrame(
            [(bid * 10, texts[bid])], "doc_id bigint, text string"
        )
        admit_batch(
            spark, df, ledger, survivors, batch_id=bid,
            compact_after_releases=2,
        )
    assert dd.ledger_releases(spark, ledger) == [-1, 1, 2]
    b3 = spark.createDataFrame(
        [(30, TEXT_A_NEAR)], "doc_id bigint, text string"
    )
    admit_batch(
        spark, b3, ledger, survivors, batch_id=3, compact_after_releases=2
    )
    # batch 3 compacted (1 folded, 2 kept) and was then fully refused —
    # an all-refused batch records NO release (absence is the record)
    assert dd.ledger_releases(spark, ledger) == [-1, 2]
    assert 3 not in _survivor_ids(spark, survivors)  # folded TEXT_A gates
