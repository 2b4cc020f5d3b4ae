"""Crash-atomic commit protocol for persisted ANN indexes (X3).

The word index's versioned-commit + CAS-fence protocol
(``operators/index.py``: ``_claim_version_dir``/``_write_commit``)
applied to the multi-artifact ANN layouts. An IVF/LSH/PQ/IVF-PQ index
is 2–5 parquet directories (tiny routers — meta/centroids/books — plus
the corpus-sized codes/lists/buckets), and before r9 every build or
append overwrote those subdirs in place as independent jobs: a crash
between subdir writes left a TORN index (new centroids serving old
codes), and two concurrent appenders interleaved silently. The
reference's closest artifact is its single uploaded index blob
(re-uploaded whole); this is that idea with lake-table durability.

Protocol — the Iceberg/Delta manifest idea in miniature, deliberately
the same shape as the word index's so one mental model covers both:

- every build/append writes its artifacts under a fresh immutable
  GENERATION directory ``{path}/g-<hex>/<artifact>`` (no ``=`` in the
  name — it must never parse as a partition column);
- one small JSON commit file ``{path}/_versions/N.commit`` names the
  generation-relative directory of EVERY artifact the index serves.
  Corpus-sized artifacts are directory LISTS: an append adds ONE new
  generation dir to the list — O(batch) data written, O(1) metadata —
  while the tiny frozen artifacts keep pointing at the build's
  generation;
- the commit lands via the same tmp-write + atomic-rename CAS as the
  word index (expected head = N−1; rename-to-existing refuses), so at
  most one commit per slot ever exists and a concurrent appender is
  fenced with a loud ``ConcurrentWriteError`` instead of interleaving;
- readers resolve the committed head FIRST and read only named dirs:
  a crash at any kill point leaves either the old commit serving a
  complete artifact set, or invisible garbage generations that
  ``gc_ann_index`` reclaims. There is no torn state. One stated
  window: a reader that resolved head v=N while a writer commits
  v=N+1 and GCs (keep=1) can find a superseded generation deleted
  mid-read — a LOUD missing-file failure, never silent wrong data;
  retry re-resolves the new head (pass ``keep≥2`` to gc for a grace
  horizon, the word index's default trade).

Legacy indexes (pre-r9 fixed-subdir layout) resolve unchanged: no
``_versions/`` ⇒ the fixed ``{path}/<artifact>`` paths — old indexes
keep serving, and their first append migrates them (the fixed dirs
become generation 'g-legacy' in the first commit, data unmoved).
"""

from __future__ import annotations

import json
import uuid
from functools import reduce

from pyspark.sql import DataFrame

from .index import (
    ConcurrentWriteError,
    _hadoop_delete,
    _hadoop_exists,
    _hadoop_fs,
    _hadoop_path,
    _list_commits,
    _read_small_file,
)

LEGACY_GEN = "g-legacy"

# artifact name -> is it corpus-sized (a dir LIST that appends extend)?
# every family also carries an optional "tombstones" list artifact —
# the delete_vectors ledger probes anti-join (see apply_tombstones).
_FAMILIES = {
    "ivf": {"centroids": False, "lists": True, "tombstones": True},
    "lsh": {"meta": False, "vectors": True, "buckets": True, "tombstones": True},
    "pq": {
        "meta": False,
        "books": False,
        "codes": True,
        "vectors": True,
        "tombstones": True,
    },
    "ivf_pq": {
        "meta": False,
        "centroids": False,
        "books": False,
        "codes": True,
        "vectors": True,
        "tombstones": True,
    },
    # SemDeDup persisted assignment (semdedup.build_semdedup_index) —
    # same torn-artifact risk as the ANN families (meta/centroids/
    # assign written as independent jobs before r9); tombstones let a
    # takedown stop a vector from GATING (pair generation) as well as
    # appearing as a survivor, without the full-corpus rebuild
    "semdedup": {"meta": False, "centroids": False, "assign": True, "tombstones": True},
}


def new_generation(path: str) -> tuple[str, str]:
    """A fresh immutable generation dir: (gen name, absolute dir)."""
    gen = f"g-{uuid.uuid4().hex[:12]}"
    return gen, f"{path}/{gen}"


def _versions_dir(path: str) -> str:
    return f"{path}/_versions"


def ann_head(spark, path: str) -> dict | None:
    """The committed head's manifest, or None for a legacy/absent
    layout. ``{"v": N, "family": ..., "dirs": {artifact: str|list}}``;
    dir values are path-relative (indexes are relocatable)."""
    commits = _list_commits(spark, path)
    if not commits:
        return None
    data = _read_small_file(spark, f"{_versions_dir(path)}/{commits[-1]}.commit")
    return json.loads(data.decode("utf-8"))


def ann_commit(
    spark, path: str, family: str, dirs: dict, parent: int | None
) -> int:
    """CAS-publish the next version's manifest. ``dirs`` values are
    path-relative artifact dirs (str for frozen artifacts, list for
    corpus-sized ones). ``parent`` is the head version the writer
    RESOLVED its manifest from (None for a fresh/legacy index): the
    commit lands only if the head is still ``parent`` — a stale writer
    whose manifest would drop a concurrent append's generation is
    refused HERE, loudly, never re-slotted above the winner. Returns
    the committed version."""
    if family not in _FAMILIES:
        raise ValueError(f"unknown ANN index family {family!r}")
    vp = _versions_dir(path)
    fs = _hadoop_fs(spark, path)
    fs.mkdirs(_hadoop_path(spark, vp))
    commits = _list_commits(spark, path)
    head = commits[-1] if commits else None
    if head != parent:
        raise ConcurrentWriteError(
            f"ANN index at {path}: commit CAS failed — this operation "
            f"resolved head {parent}, but the index is now at {head}: "
            "another writer (build or append) advanced it. Its work is "
            "preserved; re-run this operation against the new head."
        )
    v = (parent + 1) if parent is not None else 0
    doc = {"v": v, "family": family, "dirs": dirs}
    payload = json.dumps(doc).encode("utf-8")
    tmp = _hadoop_path(spark, f"{vp}/.{uuid.uuid4().hex}.tmp")
    out = fs.create(tmp, True)
    out.write(bytearray(payload))
    out.close()
    if not fs.rename(tmp, _hadoop_path(spark, f"{vp}/{v}.commit")):
        fs.delete(tmp, False)
        raise ConcurrentWriteError(
            f"ANN index at {path}: commit slot v={v} was taken during the "
            "CAS window — another writer (build or append) advanced the "
            "index since this operation resolved its parent. Its work is "
            "preserved; re-run this operation against the new head."
        )
    return v


def resolve_artifact(spark, path: str, artifact: str) -> list[str]:
    """Absolute dirs serving ``artifact`` at the committed head —
    ``[]`` when the head doesn't carry it (e.g. vectors without
    keep_vectors). Legacy layout (no commits): the fixed subdir if it
    exists on disk."""
    head = ann_head(spark, path)
    if head is None:
        legacy = f"{path}/{artifact}"
        return [legacy] if _hadoop_exists(spark, legacy) else []
    val = head["dirs"].get(artifact)
    if val is None:
        return []
    rels = val if isinstance(val, list) else [val]
    return [f"{path}/{rel}" for rel in rels]


def read_artifact(
    spark, path: str, artifact: str, schema: str | None = None
) -> DataFrame:
    """Read an artifact across all of its committed generation dirs.
    Multi-dir artifacts are unioned per root (Spark refuses multi-root
    partition discovery in one scan); each scan keeps its own partition
    pruning, so a probe's ``IN`` predicate still skips unprobed
    ``list_id=``/``band=`` dirs in every generation."""
    dirs = resolve_artifact(spark, path, artifact)
    if not dirs:
        raise ValueError(
            f"ANN index at {path} has no {artifact!r} artifact — built "
            "without it (e.g. keep_vectors=False) or not an index path."
        )
    reader = spark.read.schema(schema) if schema else spark.read
    parts = [reader.parquet(d) for d in dirs]
    return reduce(lambda a, b: a.unionByName(b), parts)


def adopt_legacy(spark, path: str, family: str) -> dict:
    """First protocol write against a pre-r9 fixed-subdir index: commit
    v=0 pointing at the existing subdirs IN PLACE — no data moves, so a
    crash at any point leaves either the still-readable legacy layout
    (no commit yet) or a committed manifest over unchanged dirs. The
    adopted dirs are immutable from here on: appends extend the lists
    with fresh generations, and a later rebuild's GC sweeps the fixed
    roots once nothing references them."""
    dirs: dict = {}
    for artifact, is_list in _FAMILIES[family].items():
        if _hadoop_exists(spark, f"{path}/{artifact}"):
            dirs[artifact] = [artifact] if is_list else artifact
    ann_commit(spark, path, family, dirs, None)
    return dirs


def sweep_superseded_fixed(spark, path: str, family: str) -> None:
    """After a full rebuild's commit at a pre-protocol path: remove the
    fixed-layout subdirs no surviving commit references — the rebuild
    replaced them and resolvers go through the manifest, so they are
    dead weight (the write_index migration-cleanup rule)."""
    referenced: set[str] = set()
    for v in _list_commits(spark, path):
        data = _read_small_file(spark, f"{_versions_dir(path)}/{v}.commit")
        doc = json.loads(data.decode("utf-8"))
        for val in doc["dirs"].values():
            for rel in val if isinstance(val, list) else [val]:
                referenced.add(rel.split("/", 1)[0])
    for artifact in _FAMILIES[family]:
        if artifact not in referenced and _hadoop_exists(spark, f"{path}/{artifact}"):
            _hadoop_delete(spark, f"{path}/{artifact}")


def gc_ann_index(spark, path: str, keep: int = 1, orphans: bool = False) -> None:
    """Reclaim generations no kept commit references. Default scope:
    only dirs an EXPIRED commit referenced (superseded data) — a
    ``g-*`` dir referenced by NO commit is an in-flight writer's or a
    crashed build's; deleting those (``orphans=True``) requires writers
    quiesced, the same contract as the word index's staging sweep.
    Legacy fixed roots (committed by ``adopt_legacy``) sweep under the
    same reference rule once a rebuild supersedes them."""
    commits = _list_commits(spark, path)
    if not commits:
        return
    kept = commits[-keep:] if keep > 0 else commits[-1:]

    def _roots(doc) -> set[str]:
        out: set[str] = set()
        for val in doc["dirs"].values():
            for rel in val if isinstance(val, list) else [val]:
                out.add(rel.split("/", 1)[0])
        return out

    keep_roots: set[str] = set()
    expired_roots: set[str] = set()
    families: set[str] = set()
    for v in commits:
        data = _read_small_file(spark, f"{_versions_dir(path)}/{v}.commit")
        doc = json.loads(data.decode("utf-8"))
        families.add(doc["family"])
        if v in kept:
            keep_roots |= _roots(doc)
        else:
            expired_roots |= _roots(doc)
    for v in commits:
        if v not in kept:
            _hadoop_delete(spark, f"{_versions_dir(path)}/{v}.commit")
    legacy_names = set().union(*(_FAMILIES[f] for f in families))
    fs = _hadoop_fs(spark, path)
    for st in fs.listStatus(_hadoop_path(spark, path)):
        name = st.getPath().getName()
        if name in keep_roots:
            continue
        is_gen = name.startswith("g-")
        if not is_gen and name not in legacy_names:
            continue
        if name in expired_roots or (is_gen and orphans):
            _hadoop_delete(spark, str(st.getPath()))


# --- tombstones (r9: ANN-side takedown) -------------------------------------


def delete_vectors(spark, path: str, vec_ids: list[int]) -> int:
    """Takedown for a persisted ANN index, ANY family: record the ids
    as a tombstone generation and CAS-commit — O(|ids|) written, zero
    corpus rewritten. Every probe anti-joins the (tiny) tombstone
    relation (``apply_tombstones``), so deleted vectors stop SERVING
    at the next committed read, atomically with the commit. Physical
    reclamation is deferred to the next full rebuild (a fresh build's
    manifest simply carries no tombstones — the codes/lists rewrite IS
    the purge), the same defer-the-rewrite economics as the word
    index's GC. Returns the committed version."""
    ids = sorted(set(int(v) for v in vec_ids))
    head = ann_head(spark, path)
    if head is not None and "tombstones" not in _FAMILIES[head["family"]]:
        raise ValueError(
            f"delete_vectors: the {head['family']!r} index at {path} has "
            "no tombstone-serving read path — rebuild it from the "
            "filtered corpus instead."
        )
    if not ids:
        return head["v"] if head else -1
    if head is None:
        # legacy index: adopt in place first (commit v=0 over the
        # fixed dirs), then tombstone on top
        from .ann import ann_index_family

        adopt_legacy(spark, path, ann_index_family(spark, path))
        head = ann_head(spark, path)
    gen, gdir = new_generation(path)
    spark.createDataFrame([(i,) for i in ids], "vec_id bigint").coalesce(
        1
    ).write.mode("overwrite").parquet(f"{gdir}/tombstones")
    dirs = {
        **head["dirs"],
        "tombstones": head["dirs"].get("tombstones", []) + [f"{gen}/tombstones"],
    }
    v = ann_commit(spark, path, head["family"], dirs, head["v"])
    gc_ann_index(spark, path)
    return v


def apply_tombstones(spark, path: str, df: DataFrame) -> DataFrame:
    """Drop tombstoned vec_ids from a probe-side relation. No-op (the
    unchanged plan) when the index carries no tombstones; otherwise one
    anti-join against the tiny tombstone relation (Catalyst broadcasts
    it under AQE — the candidate side never shuffles for this)."""
    if not resolve_artifact(spark, path, "tombstones"):
        return df
    return df.join(
        read_artifact(spark, path, "tombstones", "vec_id bigint"),
        "vec_id",
        "left_anti",
    )


# --- major compaction (r9) ---------------------------------------------------

# Physical layout each corpus-sized artifact must keep through a
# compaction rewrite — the property every probe's pruning relies on.
# (family, artifact) -> partition column, or None for a plain table.
_COMPACT_LAYOUT = {
    ("ivf", "lists"): "list_id",
    ("lsh", "buckets"): "band",
    ("lsh", "vectors"): None,
    ("pq", "codes"): None,
    ("pq", "vectors"): None,
    ("ivf_pq", "codes"): "list_id",
    ("ivf_pq", "vectors"): None,
    ("semdedup", "assign"): "list_id",
}


def compact_ann_index(spark, path: str) -> int:
    """Major compaction for a persisted ANN index: fold every
    multi-generation artifact into ONE fresh generation and apply
    tombstones PHYSICALLY — the LSM major compaction, and the ANN twin
    of the word index's flattening ``compact_index``.

    Why it exists: every append adds a generation, and a probe unions
    one (pruned) scan per generation; tombstones from ``delete_vectors``
    cost every probe an anti-join. Both are the right per-operation
    trades (O(batch) appends, O(ids) deletes) — and both accumulate.
    One compaction pays one read+rewrite of the corpus-sized artifacts
    to reset probe fan-out to a single scan, purge deleted rows from
    disk (the durable takedown), refresh ``meta.n`` to the live count,
    and let GC reclaim every superseded generation.

    Frozen artifacts (centroids/books) are COPIED into the new
    generation (they are tiny) so the old generations become fully
    unreferenced and reclaimable. Crash-atomic like every protocol
    write: all rewriting happens in the invisible new generation; the
    CAS commit is the only visibility switch, and a concurrent
    append/build is fenced by it. Returns the committed version."""
    head = ann_head(spark, path)
    if head is None:
        from .ann import ann_index_family

        adopt_legacy(spark, path, ann_index_family(spark, path))
        head = ann_head(spark, path)
    family = head["family"]
    tombs = (
        read_artifact(spark, path, "tombstones", "vec_id bigint")
        if resolve_artifact(spark, path, "tombstones")
        else None
    )
    gen, gdir = new_generation(path)
    dirs: dict = {}
    live_n: int | None = None
    for artifact, is_list in _FAMILIES[family].items():
        if artifact == "tombstones":
            continue  # applied below, then dropped from the manifest
        if not resolve_artifact(spark, path, artifact):
            continue
        df = read_artifact(spark, path, artifact)
        if is_list:
            if tombs is not None and "vec_id" in df.columns:
                df = df.join(tombs, "vec_id", "left_anti")
            part = _COMPACT_LAYOUT.get((family, artifact))
            writer = df
            if part == "band":
                # the bucket relation's row-group pruning needs the
                # within-file bucket sort build_lsh_index guarantees
                writer = df.repartition("band").sortWithinPartitions("band_bucket")
            elif part is not None:
                writer = df.hint("rebalance", part)
            w = writer.write.mode("overwrite")
            if part is not None:
                w = w.partitionBy(part)
            w.parquet(f"{gdir}/{artifact}")
            dirs[artifact] = [f"{gen}/{artifact}"]
            if live_n is None and "vec_id" in df.columns:
                live_n = (
                    spark.read.parquet(f"{gdir}/{artifact}")
                    .select("vec_id")
                    .distinct()
                    .count()
                )
        else:
            # tiny frozen artifacts (meta/centroids/books): copy into
            # the new generation so old generations fully retire
            df.coalesce(1).write.mode("overwrite").parquet(f"{gdir}/{artifact}")
            dirs[artifact] = f"{gen}/{artifact}"
    if tombs is not None and "meta" in dirs and live_n is not None:
        # meta carries the corpus count (the LSH candidate guard reads
        # it); after a physical purge the stored n must drop to the
        # live count — rewrite the one-row table with n replaced
        meta_df = spark.read.parquet(f"{gdir}/meta")
        if "n" in meta_df.columns:
            from pyspark.sql import functions as F

            meta_df.withColumn("n", F.lit(live_n).cast("bigint")).coalesce(
                1
            ).write.mode("overwrite").parquet(f"{gdir}/meta.tmp")
            _hadoop_delete(spark, f"{gdir}/meta")
            fs = _hadoop_fs(spark, gdir)
            fs.rename(
                _hadoop_path(spark, f"{gdir}/meta.tmp"),
                _hadoop_path(spark, f"{gdir}/meta"),
            )
    v = ann_commit(spark, path, family, dirs, head["v"])
    gc_ann_index(spark, path)
    sweep_superseded_fixed(spark, path, family)
    return v


def ann_index_info(spark, path: str) -> dict:
    """Operational snapshot of a persisted ANN index: committed version,
    family, per-artifact generation counts (the probe's union fan-out —
    the compaction signal), and the live tombstone count. Directory
    listings + one tiny scan; no corpus read."""
    head = ann_head(spark, path)
    if head is None:
        from .ann import ann_index_family

        family = ann_index_family(spark, path)
        return {"family": family, "v": None, "layout": "legacy", "generations": {}}
    gens = {
        artifact: len(val) if isinstance(val, list) else 1
        for artifact, val in head["dirs"].items()
    }
    n_tombs = 0
    if resolve_artifact(spark, path, "tombstones"):
        n_tombs = read_artifact(spark, path, "tombstones", "vec_id bigint").count()
    return {
        "family": head["family"],
        "v": head["v"],
        "layout": "versioned",
        "generations": gens,
        "tombstones": n_tombs,
    }
