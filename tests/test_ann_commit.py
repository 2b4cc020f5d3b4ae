"""Crash protocol for persisted ANN indexes (operators/ann_commit.py):
builds/appends write invisible generations and publish via one CAS
commit — kill points before the commit leave the previous index
serving a CONSISTENT artifact set, concurrent appenders are fenced
loudly, GC reclaims superseded generations, legacy (pre-protocol)
indexes adopt in place."""

from __future__ import annotations

import glob
import json
import os
import shutil

import pyspark.sql.functions as F
import pytest

from map_reduce_using_cloud_functions_spark.operators import ann_commit as ac
from map_reduce_using_cloud_functions_spark.operators import pq
from map_reduce_using_cloud_functions_spark.operators import similarity as sim
from map_reduce_using_cloud_functions_spark.sources import load_table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def embeddings(spark):
    return load_table(spark, SF, "embeddings")


@pytest.fixture(scope="module")
def queries(embeddings):
    return sim.queries_from_ids(embeddings, 8)


class _Boom(RuntimeError):
    pass


def _crash_before_commit(monkeypatch):
    """Kill the writer at the strongest point: every generation
    artifact fully written, visibility switch about to flip. Any
    earlier kill leaves strictly less on disk."""

    def boom(*a, **k):
        raise _Boom("injected crash before commit")

    monkeypatch.setattr(ac, "ann_commit", boom)


def _strip_protocol(path: str) -> None:
    """Rewrite a protocol index into the pre-r9 fixed-subdir layout (the
    shape existing user indexes are in)."""
    head = json.load(open(sorted(glob.glob(f"{path}/_versions/*.commit"))[-1]))
    for artifact, val in head["dirs"].items():
        rels = val if isinstance(val, list) else [val]
        assert len(rels) == 1, "strip only supports single-gen indexes"
        shutil.move(f"{path}/{rels[0]}", f"{path}/{artifact}")
    shutil.rmtree(f"{path}/_versions")
    for g in glob.glob(f"{path}/g-*"):
        shutil.rmtree(g)


# --- torn-build protection, one test per family ----------------------------


def test_ivf_rebuild_crash_leaves_old_index_serving(
    spark, embeddings, queries, tmp_path, monkeypatch
):
    path = str(tmp_path / "ivf")
    sim.build_ivf_index(embeddings, path, n_centroids=8)
    before = sorted(map(tuple, sim.ivf_topk_indexed(spark, path, queries).collect()))
    _crash_before_commit(monkeypatch)
    with pytest.raises(_Boom):
        sim.build_ivf_index(embeddings.where("vec_id % 3 = 0"), path, n_centroids=4)
    monkeypatch.undo()
    after = sorted(map(tuple, sim.ivf_topk_indexed(spark, path, queries).collect()))
    assert after == before  # old centroids AND old lists — never torn


def test_lsh_rebuild_crash_leaves_old_index_serving(
    spark, embeddings, queries, tmp_path, monkeypatch
):
    path = str(tmp_path / "lsh")
    sim.build_lsh_index(embeddings, path)
    before = sorted(
        map(tuple, sim.lsh_banded_topk_indexed(spark, path, queries).collect())
    )
    n_before = sim.load_lsh_meta(spark, path)["n"]
    _crash_before_commit(monkeypatch)
    with pytest.raises(_Boom):
        sim.build_lsh_index(embeddings.where("vec_id % 3 = 0"), path, bands=4)
    monkeypatch.undo()
    assert sim.load_lsh_meta(spark, path)["n"] == n_before  # meta not torn
    after = sorted(
        map(tuple, sim.lsh_banded_topk_indexed(spark, path, queries).collect())
    )
    assert after == before


def test_pq_append_crash_is_atomic(
    spark, embeddings, queries, tmp_path, monkeypatch
):
    """The pre-r9 window this closes: meta was rewritten FIRST, so a
    crash between meta and codes left the count overestimating. Now
    count update and codes land in ONE commit — a crash leaves both at
    the previous state."""
    path = str(tmp_path / "pq")
    evens = embeddings.where(F.col("vec_id") % 2 == 0)
    pq.build_pq_index(evens, path, m=8, k=16)
    before_meta = pq.load_pq_meta(spark, path)
    before = sorted(map(tuple, pq.pq_topk_indexed(spark, path, queries).collect()))
    _crash_before_commit(monkeypatch)
    with pytest.raises(_Boom):
        pq.append_pq_index(embeddings.where(F.col("vec_id") % 2 == 1), path)
    monkeypatch.undo()
    assert pq.load_pq_meta(spark, path) == before_meta
    after = sorted(map(tuple, pq.pq_topk_indexed(spark, path, queries).collect()))
    assert after == before
    # the replay (no crash) lands exactly the batch
    pq.append_pq_index(embeddings.where(F.col("vec_id") % 2 == 1), path)
    assert pq.load_pq_meta(spark, path)["n"] == embeddings.count()


def test_ivf_pq_build_crash_never_tears_artifacts(
    spark, embeddings, queries, tmp_path, monkeypatch
):
    path = str(tmp_path / "ivfpq")
    pq.build_ivf_pq_index(embeddings, path, n_centroids=8, m=8, k=16)
    before = sorted(
        map(tuple, pq.ivf_pq_topk_indexed(spark, path, queries).collect())
    )
    _crash_before_commit(monkeypatch)
    with pytest.raises(_Boom):
        pq.build_ivf_pq_index(
            embeddings, path, n_centroids=4, m=8, k=16, residual=True
        )
    monkeypatch.undo()
    assert pq.load_ivf_pq_meta(spark, path)["residual"] is False
    after = sorted(
        map(tuple, pq.ivf_pq_topk_indexed(spark, path, queries).collect())
    )
    assert after == before


# --- concurrent-appender fence ---------------------------------------------


def test_concurrent_appenders_are_fenced(spark, embeddings, tmp_path, monkeypatch):
    """Two appenders resolving the same parent: the one that commits
    second must raise ConcurrentWriteError (never silently drop the
    winner's generation from the manifest). Interleave for real: the
    loser's commit call first lets a full competing append win."""
    path = str(tmp_path / "ivf")
    sim.build_ivf_index(embeddings.where("vec_id % 3 = 0"), path, n_centroids=8)
    b1 = embeddings.where("vec_id % 3 = 1")
    b2 = embeddings.where("vec_id % 3 = 2")

    real_commit = ac.ann_commit
    state = {"fired": False}

    def interleave(spark_, path_, family, dirs, parent):
        if not state["fired"]:
            state["fired"] = True
            sim.append_ivf_index(b2, path_)  # competing append wins
        return real_commit(spark_, path_, family, dirs, parent)

    monkeypatch.setattr(ac, "ann_commit", interleave)
    with pytest.raises(ac.ConcurrentWriteError, match="CAS failed"):
        sim.append_ivf_index(b1, path)
    monkeypatch.undo()

    got = {
        r["vec_id"]
        for r in ac.read_artifact(spark, path, "lists").select("vec_id").collect()
    }
    want = {r["vec_id"] for r in embeddings.where("vec_id % 3 != 1").collect()}
    assert got == want  # winner's batch present, loser's invisible
    # loser re-runs against the new head and lands cleanly
    sim.append_ivf_index(b1, path)
    got2 = ac.read_artifact(spark, path, "lists").select("vec_id").distinct().count()
    assert got2 == embeddings.count()


# --- GC + legacy adoption ---------------------------------------------------


def test_gc_reclaims_superseded_generations_and_orphans(
    spark, embeddings, tmp_path, monkeypatch
):
    path = str(tmp_path / "pq")
    pq.build_pq_index(embeddings.where("vec_id % 2 = 0"), path, m=8, k=16)
    pq.append_pq_index(embeddings.where("vec_id % 2 = 1"), path)
    gens = {g.split("/")[-1] for g in glob.glob(f"{path}/g-*")}
    assert len(gens) == 2  # build + append (appends auto-gc keep=1)
    # a rebuild supersedes everything; its auto-GC sweeps both old gens
    pq.build_pq_index(embeddings, path, m=8, k=16)
    left = {g.split("/")[-1] for g in glob.glob(f"{path}/g-*")}
    assert len(left) == 1 and not (left & gens)
    assert pq.load_pq_meta(spark, path)["n"] == embeddings.count()
    # crashed-build garbage: invisible, survives default GC, orphans=True reclaims
    _crash_before_commit(monkeypatch)
    with pytest.raises(_Boom):
        pq.build_pq_index(embeddings, path, m=8, k=16)
    monkeypatch.undo()
    assert len(glob.glob(f"{path}/g-*")) == 2
    ac.gc_ann_index(spark, path)
    assert len(glob.glob(f"{path}/g-*")) == 2  # default GC never touches orphans
    ac.gc_ann_index(spark, path, orphans=True)
    assert {g.split("/")[-1] for g in glob.glob(f"{path}/g-*")} == left


def test_legacy_index_serves_and_appends_adopt_in_place(
    spark, embeddings, queries, tmp_path
):
    """A pre-protocol fixed-subdir index keeps serving unchanged; its
    first append commits an adoption manifest over the dirs IN PLACE
    (no data moved) and lands the batch as a new generation."""
    path = str(tmp_path / "lsh")
    evens = embeddings.where(F.col("vec_id") % 2 == 0)
    sim.build_lsh_index(evens, path)
    built = sorted(
        map(tuple, sim.lsh_banded_topk_indexed(spark, path, queries).collect())
    )
    _strip_protocol(path)
    assert sorted(os.listdir(path)) == ["buckets", "meta", "vectors"]
    legacy = sorted(
        map(tuple, sim.lsh_banded_topk_indexed(spark, path, queries).collect())
    )
    assert legacy == built
    sim.append_lsh_index(embeddings.where(F.col("vec_id") % 2 == 1), path)
    assert sim.load_lsh_meta(spark, path)["n"] == embeddings.count()
    joint = str(tmp_path / "joint")
    sim.build_lsh_index(embeddings, joint)
    a = sorted(map(tuple, sim.lsh_banded_topk_indexed(spark, path, queries).collect()))
    b = sorted(map(tuple, sim.lsh_banded_topk_indexed(spark, joint, queries).collect()))
    assert a == b  # LSH appends are exact: adopted+appended ≡ joint build


# --- unified serving door (ann.py) ------------------------------------------


def test_ann_search_dispatch_matrix(spark, embeddings, queries, tmp_path):
    """ann_search over all four layouts equals each family's own
    prober; family detection works for protocol AND legacy layouts;
    options that don't apply to the detected family refuse loudly."""
    from map_reduce_using_cloud_functions_spark.operators.ann import (
        ann_index_family,
        ann_search,
    )

    paths = {
        "ivf": str(tmp_path / "ivf"),
        "lsh": str(tmp_path / "lsh"),
        "pq": str(tmp_path / "pq"),
        "ivf_pq": str(tmp_path / "ivfpq"),
    }
    sim.build_ivf_index(embeddings, paths["ivf"], n_centroids=8)
    sim.build_lsh_index(embeddings, paths["lsh"])
    pq.build_pq_index(embeddings, paths["pq"], m=8, k=16)
    pq.build_ivf_pq_index(embeddings, paths["ivf_pq"], n_centroids=8, m=8, k=16)

    direct = {
        "ivf": sim.ivf_topk_indexed(spark, paths["ivf"], queries),
        "lsh": sim.lsh_banded_topk_indexed(spark, paths["lsh"], queries),
        "pq": pq.pq_topk_indexed(spark, paths["pq"], queries),
        "ivf_pq": pq.ivf_pq_topk_indexed(spark, paths["ivf_pq"], queries),
    }
    for family, path in paths.items():
        assert ann_index_family(spark, path) == family
        got = sorted(map(tuple, ann_search(spark, path, queries).collect()))
        want = sorted(map(tuple, direct[family].collect()))
        assert got == want, family

    # legacy sniffing: strip the protocol off two distinguishable layouts
    _strip_protocol(paths["pq"])
    _strip_protocol(paths["ivf_pq"])
    assert ann_index_family(spark, paths["pq"]) == "pq"
    assert ann_index_family(spark, paths["ivf_pq"]) == "ivf_pq"

    # mismatched options refuse with the family named
    with pytest.raises(ValueError, match="do not apply to the 'pq'"):
        ann_search(spark, paths["pq"], queries, n_probe=2)
    with pytest.raises(ValueError, match="unknown option"):
        ann_search(spark, paths["ivf"], queries, nprobe=2)
    with pytest.raises(ValueError, match="not a persisted ANN index"):
        ann_search(spark, str(tmp_path / "nothing"), queries)


# --- tombstones (delete_vectors) ---------------------------------------------


def test_delete_vectors_tombstones_all_families(
    spark, embeddings, queries, tmp_path
):
    """Tombstoned vectors stop serving from every family's probe —
    O(|ids|) written, zero corpus rewritten — and a rebuild purges the
    tombstones physically (fresh manifest carries none)."""
    builds = {
        "ivf": (sim.build_ivf_index, lambda p: sim.ivf_topk_indexed(spark, p, queries)),
        "lsh": (
            sim.build_lsh_index,
            lambda p: sim.lsh_banded_topk_indexed(spark, p, queries),
        ),
        "pq": (
            lambda e, p: pq.build_pq_index(e, p, m=8, k=16),
            lambda p: pq.pq_topk_indexed(spark, p, queries),
        ),
        "ivf_pq": (
            lambda e, p: pq.build_ivf_pq_index(e, p, n_centroids=8, m=8, k=16),
            lambda p: pq.ivf_pq_topk_indexed(spark, p, queries),
        ),
    }
    for family, (build, probe) in builds.items():
        path = str(tmp_path / family)
        build(embeddings, path)
        victims = {
            r["neighbor_id"]
            for r in probe(path).where("rank <= 2").collect()
        }
        assert victims
        ac.delete_vectors(spark, path, sorted(victims))
        left = {r["neighbor_id"] for r in probe(path).collect()}
        assert not (left & victims), family
        # rebuild = physical purge: no tombstones in the fresh manifest
        build(embeddings, path)
        assert not ac.resolve_artifact(spark, path, "tombstones"), family
        back = {r["neighbor_id"] for r in probe(path).collect()}
        assert back & victims, family  # rebuild serves them again


def test_delete_vectors_adopts_legacy_and_accumulates(
    spark, embeddings, queries, tmp_path
):
    path = str(tmp_path / "ivf")
    sim.build_ivf_index(embeddings, path, n_centroids=8)
    _strip_protocol(path)
    first = sim.ivf_topk_indexed(spark, path, queries).where("rank = 1").collect()
    v1 = first[0]["neighbor_id"]
    ac.delete_vectors(spark, path, [v1])  # adopts the legacy layout in place
    second = sim.ivf_topk_indexed(spark, path, queries).collect()
    assert v1 not in {r["neighbor_id"] for r in second}
    v2 = second[0]["neighbor_id"]
    ac.delete_vectors(spark, path, [v2])  # tombstones accumulate across commits
    third = {r["neighbor_id"] for r in sim.ivf_topk_indexed(spark, path, queries).collect()}
    assert not ({v1, v2} & third)


def test_semdedup_build_crash_leaves_old_index_serving(
    spark, embeddings, tmp_path, monkeypatch
):
    """The SemDeDup assignment index shares the protocol: a crashed
    rebuild (different n_clusters, shrunk corpus) leaves the previous
    commit's (meta, centroids, assign) serving consistently."""
    from map_reduce_using_cloud_functions_spark.operators import semdedup as sd

    path = str(tmp_path / "sdd")
    sd.build_semdedup_index(embeddings, path, n_clusters=8)
    before = sorted(map(tuple, sd.semdedup_survivors_indexed(spark, path).collect()))
    _crash_before_commit(monkeypatch)
    with pytest.raises(_Boom):
        sd.build_semdedup_index(embeddings.where("vec_id % 2 = 0"), path, n_clusters=2)
    monkeypatch.undo()
    assert sd.load_semdedup_meta(spark, path)["n_clusters"] == 8
    after = sorted(map(tuple, sd.semdedup_survivors_indexed(spark, path).collect()))
    assert after == before
    # the assignment is tombstone-serving (r9): a delete commits and the
    # deleted id stops appearing in every serving read
    ac.delete_vectors(spark, path, [1])
    assert 1 not in {
        r["vec_id"] for r in sd.semdedup_survivors_indexed(spark, path).collect()
    }


# --- major compaction ---------------------------------------------------------


def test_compact_ann_index_folds_generations_and_purges_tombstones(
    spark, embeddings, queries, tmp_path
):
    """After appends + deletes: compaction folds the codes generations
    into one, purges tombstoned rows from DISK (the durable takedown),
    refreshes meta.n to the live count, answers are unchanged, and GC
    reclaims every superseded generation."""
    path = str(tmp_path / "ivfpq")
    pq.build_ivf_pq_index(
        embeddings.where("vec_id % 3 = 0"), path, n_centroids=8, m=8, k=16
    )
    pq.append_ivf_pq_index(embeddings.where("vec_id % 3 = 1"), path)
    pq.append_ivf_pq_index(embeddings.where("vec_id % 3 = 2"), path)
    victims = sorted(
        r["neighbor_id"]
        for r in pq.ivf_pq_topk_indexed(spark, path, queries).where("rank = 1").collect()
    )
    ac.delete_vectors(spark, path, victims)
    before = sorted(map(tuple, pq.ivf_pq_topk_indexed(spark, path, queries).collect()))
    assert len(ac.resolve_artifact(spark, path, "codes")) == 3

    ac.compact_ann_index(spark, path)
    assert len(ac.resolve_artifact(spark, path, "codes")) == 1
    assert not ac.resolve_artifact(spark, path, "tombstones")
    after = sorted(map(tuple, pq.ivf_pq_topk_indexed(spark, path, queries).collect()))
    assert after == before  # served answers identical, anti-join gone
    # physical purge: the victims' rows are gone from the files
    on_disk = {
        r["vec_id"]
        for r in ac.read_artifact(spark, path, "codes").select("vec_id").collect()
    }
    assert not (on_disk & set(victims))
    assert pq.load_ivf_pq_meta(spark, path)["n"] == len(on_disk)
    # one generation on disk (frozen artifacts copied, old gens GC'd)
    gens = {d.split("/")[-1] for d in glob.glob(f"{path}/g-*")}
    assert len(gens) == 1
    # appends keep working against the compacted head
    batch = embeddings.where("vec_id = 0").select(
        (F.col("vec_id") + 10_000_000).alias("vec_id"), "embedding"
    )
    pq.append_ivf_pq_index(batch, path)
    assert len(ac.resolve_artifact(spark, path, "codes")) == 2


def test_compact_ann_index_crash_leaves_old_head(
    spark, embeddings, queries, tmp_path, monkeypatch
):
    path = str(tmp_path / "lsh")
    sim.build_lsh_index(embeddings.where("vec_id % 2 = 0"), path)
    sim.append_lsh_index(embeddings.where("vec_id % 2 = 1"), path)
    before = sorted(
        map(tuple, sim.lsh_banded_topk_indexed(spark, path, queries).collect())
    )
    _crash_before_commit(monkeypatch)
    with pytest.raises(_Boom):
        ac.compact_ann_index(spark, path)
    monkeypatch.undo()
    after = sorted(
        map(tuple, sim.lsh_banded_topk_indexed(spark, path, queries).collect())
    )
    assert after == before
    # replay converges; the bucket relation keeps its layout contract
    ac.compact_ann_index(spark, path)
    assert len(ac.resolve_artifact(spark, path, "buckets")) == 1
    final = sorted(
        map(tuple, sim.lsh_banded_topk_indexed(spark, path, queries).collect())
    )
    assert final == before
    joint = str(tmp_path / "joint")
    sim.build_lsh_index(embeddings, joint)
    want = sorted(
        map(tuple, sim.lsh_banded_topk_indexed(spark, joint, queries).collect())
    )
    assert final == want  # compacted ≡ joint build (LSH appends exact)


def test_cli_ann_info_and_compact(spark, embeddings, tmp_path, capsys):
    from map_reduce_using_cloud_functions_spark.__main__ import main

    path = str(tmp_path / "ivf")
    sim.build_ivf_index(embeddings.where("vec_id % 2 = 0"), path, n_centroids=8)
    sim.append_ivf_index(embeddings.where("vec_id % 2 = 1"), path)
    ac.delete_vectors(spark, path, [0, 2])
    rc = main(["ann-info", path], spark=spark)
    assert rc in (0, None)
    import json as _json

    info = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert info["family"] == "ivf"
    assert info["generations"]["lists"] == 2
    assert info["tombstones"] == 2
    rc = main(["ann-compact", path], spark=spark)
    assert rc in (0, None)
    info2 = ac.ann_index_info(spark, path)
    assert info2["generations"]["lists"] == 1
    assert info2["tombstones"] == 0
    got = {
        r["vec_id"]
        for r in ac.read_artifact(spark, path, "lists").select("vec_id").collect()
    }
    assert got == {r["vec_id"] for r in embeddings.collect()} - {0, 2}


def test_cli_ann_query_all_families_and_refusals(
    spark, embeddings, queries, tmp_path, capsys
):
    """The ann-query verb serves every persisted family through the
    README front door (r9 verdict task: ann_search was API-reachable
    but had no CLI), accepts parquet and JSONL query files in either
    column spelling, and surfaces the dispatcher's refusals (wrong
    option for the family; a SemDeDup assignment is not a top-k
    index)."""
    from map_reduce_using_cloud_functions_spark.__main__ import main
    from map_reduce_using_cloud_functions_spark.operators import semdedup as sd
    from map_reduce_using_cloud_functions_spark.operators.ann import ann_search

    paths = {
        "ivf": str(tmp_path / "ivf"),
        "lsh": str(tmp_path / "lsh"),
        "pq": str(tmp_path / "pq"),
        "ivf_pq": str(tmp_path / "ivfpq"),
    }
    sim.build_ivf_index(embeddings, paths["ivf"], n_centroids=8)
    sim.build_lsh_index(embeddings, paths["lsh"])
    pq.build_pq_index(embeddings, paths["pq"], m=8, k=16)
    pq.build_ivf_pq_index(embeddings, paths["ivf_pq"], n_centroids=8, m=8, k=16)

    qparquet = str(tmp_path / "queries.parquet")
    queries.write.parquet(qparquet)

    def parse(out: str) -> list[tuple]:
        rows = []
        for line in out.strip().splitlines():
            qid, nid, rank, score = line.split("\t")
            rows.append((int(qid), int(nid), int(rank), round(float(score), 5)))
        return rows

    for family, path in paths.items():
        rc = main(["ann-query", path, qparquet, "--k", "3"], spark=spark)
        assert rc in (0, None), family
        got = parse(capsys.readouterr().out)
        want = [
            (r["query_id"], r["neighbor_id"], r["rank"], round(r["score"], 5))
            for r in ann_search(spark, path, queries, k=3)
            .orderBy("query_id", "rank")
            .collect()
        ]
        assert got == want, family

    # JSONL input + the fixtures' (vec_id, embedding) spelling
    qjsonl = str(tmp_path / "queries_jsonl")
    queries.selectExpr(
        "query_id as vec_id", "q_embedding as embedding"
    ).coalesce(1).write.json(qjsonl)
    import glob as _glob
    import shutil as _shutil

    part = _glob.glob(f"{qjsonl}/part-*")[0]
    jl = str(tmp_path / "queries.jsonl")
    _shutil.copy(part, jl)
    rc = main(["ann-query", paths["ivf"], jl, "--k", "3"], spark=spark)
    assert rc in (0, None)
    got = parse(capsys.readouterr().out)
    want = [
        (r["query_id"], r["neighbor_id"], r["rank"], round(r["score"], 5))
        for r in ann_search(spark, paths["ivf"], queries, k=3)
        .orderBy("query_id", "rank")
        .collect()
    ]
    assert got == want

    # family-mismatched option refuses through the CLI too
    with pytest.raises(ValueError, match="do not apply to the 'pq'"):
        main(
            ["ann-query", paths["pq"], qparquet, "--n-probe", "2"],
            spark=spark,
        )

    # a SemDeDup assignment is served by its own probers, never ann-query
    sdp = str(tmp_path / "semdedup")
    sd.build_semdedup_index(embeddings, sdp, n_clusters=8)
    with pytest.raises(ValueError, match="SemDeDup"):
        main(["ann-query", sdp, qparquet], spark=spark)

    # a queries file without recognizable columns is a usage error
    bad = str(tmp_path / "bad.parquet")
    embeddings.selectExpr("vec_id as id", "embedding as emb").write.parquet(bad)
    rc = main(["ann-query", paths["ivf"], bad], spark=spark)
    assert rc == 2
    assert "accepted" in capsys.readouterr().err
