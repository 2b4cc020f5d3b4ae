"""SemDeDup tests (arXiv:2303.09540): a pure-python replay of the whole
method — seeded centroids, argmax assignment, within-cluster cosine,
keep-lowest-centroid-sim pruning — is the oracle; Spark must match it
row-for-row. Plus the tie rule on exact-duplicate vectors, partition
invariance, the measured-volume guard, and the trained-centroid path's
structural properties."""

from __future__ import annotations

import math

import pytest

from map_reduce_using_cloud_functions_spark.operators import semdedup as sd
from map_reduce_using_cloud_functions_spark.sources import load_table

SF = "/root/testdata/sf0.001"
TAU = 0.4
K = 8


@pytest.fixture(scope="module")
def embeddings(spark):
    return load_table(spark, SF, "embeddings")


@pytest.fixture(scope="module")
def vecs(embeddings):
    return {r["vec_id"]: list(r["embedding"]) for r in embeddings.collect()}


def py_cos(a, b):
    dot = sum(x * y for x, y in zip(a, b))
    na = math.sqrt(sum(x * x for x in a))
    nb = math.sqrt(sum(y * y for y in b))
    return dot / (na * nb)


def py_model(vecs, k=K, tau=TAU):
    """The paper's method, sequentially: hash-slot seed centroids,
    nearest-centroid assignment (tie toward smaller centroid_id),
    within-cluster pairs >= tau, drop the higher-(c_score, vec_id)
    member of each pair."""
    slots = {}
    for vid in sorted(vecs):
        slot = vid % 97
        if slot < k and slot not in slots:
            slots[slot] = vecs[vid]
    assign = {}
    for vid, v in vecs.items():
        best = max(slots.items(), key=lambda cv: (py_cos(v, cv[1]), -cv[0]))
        assign[vid] = (best[0], py_cos(v, best[1]))
    pairs, dropped = [], set()
    ids = sorted(vecs)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            if assign[a][0] != assign[b][0]:
                continue
            s = py_cos(vecs[a], vecs[b])
            if s >= tau:
                pairs.append((assign[a][0], a, b, round(s, 6)))
                ca, cb = assign[a][1], assign[b][1]
                dropped.add(a if (ca, a) > (cb, b) else b)
    survivors = {
        vid: (assign[vid][0], round(assign[vid][1], 6))
        for vid in vecs
        if vid not in dropped
    }
    return pairs, survivors


def test_pairs_match_python_model(embeddings, vecs):
    got = sorted(
        (r["list_id"], r["vec_a"], r["vec_b"], r["score"])
        for r in sd.semdedup_pairs(embeddings, n_clusters=K, threshold=TAU).collect()
    )
    expected, _ = py_model(vecs)
    assert len(got) == len(expected)
    for g, e in zip(got, sorted(expected)):
        assert g[:3] == e[:3]
        assert abs(g[3] - e[3]) < 2e-6


def test_survivors_match_python_model(embeddings, vecs):
    got = {
        r["vec_id"]: (r["list_id"], r["c_score"])
        for r in sd.semdedup_survivors(
            embeddings, n_clusters=K, threshold=TAU
        ).collect()
    }
    _, expected = py_model(vecs)
    assert set(got) == set(expected)
    for vid, (lid, cs) in expected.items():
        assert got[vid][0] == lid
        assert abs(got[vid][1] - cs) < 2e-6


def test_partition_invariance(embeddings):
    base = sorted(
        tuple(r)
        for r in sd.semdedup_pairs(embeddings, threshold=TAU)
        .select("list_id", "vec_a", "vec_b", "score")
        .collect()
    )
    shuffled = sorted(
        tuple(r)
        for r in sd.semdedup_pairs(embeddings.repartition(13), threshold=TAU)
        .select("list_id", "vec_a", "vec_b", "score")
        .collect()
    )
    assert base == shuffled


def test_exact_duplicate_tie_keeps_smaller_id(spark):
    # two identical vectors tie exactly on centroid cosine; the rule
    # must keep the smaller vec_id deterministically
    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.0, 1.0, 0.0]),
        (10, [0.6, 0.8, 0.0]),
        (11, [0.6, 0.8, 0.0]),
    ]
    emb = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    surv = {
        r["vec_id"]
        for r in sd.semdedup_survivors(emb, n_clusters=2, threshold=0.99).collect()
    }
    assert 10 in surv and 11 not in surv
    assert {0, 1} <= surv  # non-duplicates untouched


def test_dominance_rule_drops_higher_centroid_sim(spark):
    # c is closest to the centroid direction; (b,c) duplicates -> c
    # (higher centroid cosine) is dropped, b (the "edge" example) kept
    rows = [
        (0, [1.0, 0.0]),  # seeds slot 0 -> centroid [1, 0]
        (5, [0.92, 0.392]),  # b: cos to centroid ~.920
        (6, [0.98, 0.199]),  # c: cos to centroid ~.980; cos(b,c) ~.979
    ]
    emb = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    surv = {
        r["vec_id"]
        for r in sd.semdedup_survivors(emb, n_clusters=1, threshold=0.97).collect()
    }
    assert 5 in surv and 6 not in surv


def test_volume_guard_refuses_oversized_clusters(embeddings, monkeypatch):
    monkeypatch.setattr(sd, "SEMDEDUP_PAIR_BUDGET", 100)
    with pytest.raises(ValueError, match="Raise n_clusters"):
        sd.semdedup_pairs(embeddings, n_clusters=2, threshold=TAU)
    # the explicit opt-out skips the measurement entirely
    assert (
        sd.semdedup_pairs(
            embeddings, n_clusters=2, threshold=TAU, scale_guard="off"
        ).count()
        > 0
    )


def test_trained_centroids_path(embeddings, vecs):
    # not SQL-twinned (Lloyd fit), so assert the structural contract:
    # survivors tile the corpus minus dropped, and every dropped vector
    # has a same-cluster surviving duplicate that dominates it
    surv = sd.semdedup_survivors(
        embeddings, n_clusters=K, threshold=TAU, train=True
    ).collect()
    surv_ids = {r["vec_id"] for r in surv}
    assert surv_ids <= set(vecs)
    dropped = set(vecs) - surv_ids
    pairs = sd.semdedup_pairs(
        embeddings, n_clusters=K, threshold=TAU, train=True
    ).collect()
    losers = set()
    for r in pairs:
        ca, cb = r["c_score_a"], r["c_score_b"]
        losers.add(r["vec_a"] if (ca, r["vec_a"]) > (cb, r["vec_b"]) else r["vec_b"])
    assert dropped == losers


def test_kmeans_init_lifts_the_seed_slot_ceiling(spark, embeddings):
    """The hash-slot seeds cap at 97 clusters (vec_id % 97); the
    method's k ∝ n contract needs more at scale — the k-means|| init
    path must actually deliver k > 97 distinct, dense-id clusters."""
    surv = sd.semdedup_survivors(
        embeddings, n_clusters=120, threshold=0.4, train=True, train_init="kmeans||"
    ).collect()
    lists = {r["list_id"] for r in surv}
    assert len(lists) == 120
    assert max(lists) == 119 and min(lists) == 0  # dense 0..k-1


def test_indexed_assignment_matches_in_plan(spark, embeddings, tmp_path):
    """build_semdedup_index + indexed pairs/survivors must equal the
    in-plan seeded path, and a second threshold served from the same
    build must equal an in-plan run at that threshold (the sweep
    contract: one argmax, many epsilons)."""
    path = str(tmp_path / "sdd")
    sd.build_semdedup_index(embeddings, path, n_clusters=8)
    meta = sd.load_semdedup_meta(spark, path)
    assert meta["n_clusters"] == 8 and meta["n"] == embeddings.count()

    def norm_pairs(df):
        return sorted(
            (r["list_id"], r["vec_a"], r["vec_b"], r["score"])
            for r in df.collect()
        )

    want = norm_pairs(sd.semdedup_pairs(embeddings, n_clusters=8))
    got = norm_pairs(sd.semdedup_pairs_indexed(spark, path))
    assert got == want

    want_s = sorted(map(tuple, sd.semdedup_survivors(embeddings, n_clusters=8).collect()))
    got_s = sorted(map(tuple, sd.semdedup_survivors_indexed(spark, path).collect()))
    assert got_s == want_s

    # threshold re-run from the SAME build
    want_hi = sorted(
        map(tuple, sd.semdedup_survivors(embeddings, n_clusters=8, threshold=0.8).collect())
    )
    got_hi = sorted(
        map(tuple, sd.semdedup_survivors_indexed(spark, path, threshold=0.8).collect())
    )
    assert got_hi == want_hi


def test_indexed_build_enforces_volume_guard(spark, embeddings, monkeypatch):
    """The guard must refuse to PERSIST an under-clustered assignment —
    a baked-in quadratic join is worse than an in-plan one."""
    monkeypatch.setattr(sd, "SEMDEDUP_PAIR_BUDGET", 10)
    import tempfile

    with pytest.raises(ValueError, match="pair volume"):
        sd.build_semdedup_index(
            embeddings, tempfile.mkdtemp(prefix="sdd_guard_") + "/sdd", n_clusters=2
        )


def test_rebuild_leaves_no_stale_partitions(spark, embeddings, tmp_path):
    """A rebuild at the same path with fewer clusters AND a shrunk
    corpus must fully replace assign/ — under the session's dynamic
    partition-overwrite default, unmatched list_id partitions from the
    first build would otherwise survive and serve phantom/duplicate
    vec_ids to every indexed re-run."""
    path = str(tmp_path / "sdidx")
    sd.build_semdedup_index(embeddings, path, n_clusters=8)
    shrunk = embeddings.where("vec_id % 2 = 0")
    sd.build_semdedup_index(shrunk, path, n_clusters=2)
    got = sorted(
        r["vec_id"] for r in sd._load_assignment(spark, path).collect()
    )
    want = sorted(r["vec_id"] for r in shrunk.select("vec_id").collect())
    assert got == want  # no phantoms, no duplicates
    assert sd.load_semdedup_meta(spark, path)["n_clusters"] == 2


def test_append_semdedup_index_matches_joint_and_is_atomic(
    spark, embeddings, tmp_path, monkeypatch
):
    """Appends assign against the FROZEN centroids: build-on-evens +
    append-odds serves the same pairs/survivors as the joint in-plan
    run with build-half centroids; a crash before the commit leaves the
    old head (old meta.n, old assignment); a dimension-mismatched batch
    refuses."""
    import pyspark.sql.functions as F
    import pytest

    from map_reduce_using_cloud_functions_spark.operators import ann_commit as ac
    from map_reduce_using_cloud_functions_spark.operators.similarity import (
        load_ivf_centroids,
    )

    path = str(tmp_path / "sdd")
    evens = embeddings.where(F.col("vec_id") % 2 == 0)
    odds = embeddings.where(F.col("vec_id") % 2 == 1)
    sd.build_semdedup_index(evens, path, n_clusters=8)
    n_evens = evens.count()

    # crash injection: append dies before its commit → old head serves
    def boom(*a, **k):
        raise RuntimeError("injected crash before commit")

    monkeypatch.setattr(ac, "ann_commit", boom)
    with pytest.raises(RuntimeError, match="injected"):
        sd.append_semdedup_index(odds, path)
    monkeypatch.undo()
    assert sd.load_semdedup_meta(spark, path)["n"] == n_evens

    sd.append_semdedup_index(odds, path)
    assert sd.load_semdedup_meta(spark, path)["n"] == embeddings.count()
    got = sorted(
        map(tuple, sd.semdedup_survivors_indexed(spark, path).collect())
    )
    want = sorted(
        map(
            tuple,
            sd.semdedup_survivors(
                embeddings, centroids=load_ivf_centroids(spark, path)
            ).collect(),
        )
    )
    assert got == want

    bad = odds.select("vec_id", F.slice("embedding", 1, 32).alias("embedding"))
    with pytest.raises(ValueError, match="dimension"):
        sd.append_semdedup_index(bad, path)


def test_delete_vectors_stops_gating_and_compaction_purges(
    spark, embeddings, tmp_path
):
    """Takedown on the persisted assignment (r9): after delete_vectors
    the deleted ids stop appearing as survivors AND stop gating pair
    generation — served answers equal the in-plan run over the live
    corpus with the SAME frozen centroids (non-circular: the in-plan
    path re-runs the argmax + join itself). compact_ann_index then
    purges the tombstoned rows physically, refreshes meta.n to the live
    count, and leaves answers unchanged."""
    import pyspark.sql.functions as F

    from map_reduce_using_cloud_functions_spark.operators import ann_commit as ac
    from map_reduce_using_cloud_functions_spark.operators.similarity import (
        load_ivf_centroids,
    )

    path = str(tmp_path / "sdd")
    sd.build_semdedup_index(embeddings, path, n_clusters=8)
    n_all = embeddings.count()

    # delete every vector that GATES another (a pair loser's partner),
    # for at least one pair where the loser survives only because of it
    pairs = sd.semdedup_pairs_indexed(spark, path).collect()
    assert pairs, "fixture must produce at least one duplicate pair"
    r = pairs[0]
    loser = (
        r["vec_a"]
        if (r["c_score_a"], r["vec_a"]) > (r["c_score_b"], r["vec_b"])
        else r["vec_b"]
    )
    winners = {
        (p["vec_a"] if p["vec_b"] == loser else p["vec_b"])
        for p in pairs
        if loser in (p["vec_a"], p["vec_b"])
    }
    victims = sorted(winners)
    ac.delete_vectors(spark, path, victims)

    live = embeddings.where(~F.col("vec_id").isin(victims))
    frozen = load_ivf_centroids(spark, path)
    got = sorted(map(tuple, sd.semdedup_survivors_indexed(spark, path).collect()))
    want = sorted(
        map(tuple, sd.semdedup_survivors(live, centroids=frozen).collect())
    )
    assert got == want
    surv_ids = {v for v, _, _ in got}
    assert not surv_ids & set(victims)
    assert loser in surv_ids  # its only droppers were taken down
    for p in sd.semdedup_pairs_indexed(spark, path).collect():
        assert p["vec_a"] not in victims and p["vec_b"] not in victims

    # physical purge: compaction drops the rows from assign/, clears the
    # tombstone artifact, refreshes meta.n — and answers don't move
    ac.compact_ann_index(spark, path)
    assert not ac.resolve_artifact(spark, path, "tombstones")
    raw_ids = {
        r["vec_id"]
        for r in ac.read_artifact(spark, path, "assign").select("vec_id").collect()
    }
    assert not raw_ids & set(victims)
    assert sd.load_semdedup_meta(spark, path)["n"] == n_all - len(victims)
    after = sorted(map(tuple, sd.semdedup_survivors_indexed(spark, path).collect()))
    assert after == got
