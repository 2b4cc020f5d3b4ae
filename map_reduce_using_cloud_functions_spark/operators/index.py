"""Inverted index with per-document term frequencies — the reference's
entire job (SURVEY.md §2 O7–O17), as one declarative DataFrame program.

Reference pipeline (6 GCS buckets, 4 FaaS stages, ~780 LoC):

    split files → mappers emit (word, doc, 1) CSV      mapper/main.py:54-74
    → combiners group to {word:{doc:[1,1,..]}}         create_json_file/main.py:44-53
    → global single-process merge                      groupby/main.py:70-105
    → SHA-256 routing table → reducers sum             groupby/main.py:16-21, reducer/main.py:37-41
    → master merges reducer outputs (+ old index)      master/main.py:82-126

Spark restatement: the whole thing is

    tokenize → groupBy(word, document).count()

Catalyst plans it as HashAggregate(partial) → Exchange
hashpartitioning(word, document) → HashAggregate(final): the combiner is
the partial aggregate (and *pre-sums*, unlike the reference, which ships
``[1,1,...]`` lists), the routing table is the shuffle hash partitioner,
the reducer-output merge disappears because one job owns the lineage.
At 100 TB: one wide shuffle whose payload is already-summed (word, doc)
pairs — strictly smaller than the corpus — and no single-process merge
bottleneck (the reference's groupby stage holds the whole index in one
function's memory; here the final aggregate is partitioned).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from ..functions.text import tokens_array, normalize_query_word_py


def tokenize(corpus: DataFrame, text_col: str = "text", doc_col: str = "document") -> DataFrame:
    """corpus(document, text) → one row per token occurrence.

    The map phase (reference ``mapper/main.py:54-63``) as a generator
    expression: ``explode`` is the flatMap, ``lit(1)`` is implicit (a
    token row *is* the 1). Stays entirely in whole-stage codegen.
    """
    return corpus.select(
        F.col(doc_col).alias("document"),
        F.explode(tokens_array(F.col(text_col))).alias("word"),
    )


def build_index(corpus: DataFrame, text_col: str = "text", doc_col: str = "document") -> DataFrame:
    """corpus → postings(word, document, count).

    Replaces reference stages O9–O14 (combiner, global merge, hash
    routing, reducer sum, master merge) with one ``groupBy``; Spark's
    partial aggregation *is* the combiner, the shuffle *is* the routing.
    """
    return (
        tokenize(corpus, text_col, doc_col)
        .groupBy("word", "document")
        .agg(F.count(F.lit(1)).alias("count"))
    )


def merge_index(
    old: DataFrame,
    delta: DataFrame,
    additive: bool = False,
    replace_docs: DataFrame | None = None,
) -> DataFrame:
    """Incremental index maintenance (reference ``master/main.py:106-126``).

    additive=True  — reference bit-parity: counts *add* per (word, doc),
        so re-indexing the same document double-counts (SURVEY.md §2
        quirk 2, bug-as-behavior).
    additive=False (default) — replace-document semantics: a document's
        new postings supersede its old ones (anti-join old against
        delta's documents, then union). The sane upsert.

    Both are shuffle-on-key plans; at scale the anti join broadcasts the
    delta's (small) distinct-document set.

    ``replace_docs`` (replace mode only): the EXPLICIT set of documents
    being re-indexed. Defaults to the delta's own documents — which is
    wrong exactly when a re-indexed document's new content produces NO
    postings (emptied/token-free file): the delta then carries no row
    for it, so its old postings would survive. Callers that know the
    re-indexed set (the engine knows the corpus it read) pass it here.
    """
    if additive:
        return (
            old.unionByName(delta)
            .groupBy("word", "document")
            .agg(F.sum("count").alias("count"))
        )
    delta_docs = (
        replace_docs.select("document").distinct()
        if replace_docs is not None
        else delta.select("document").distinct()
    )
    # Re-select old's column order: a USING join promotes the join key
    # to the first column, which would make the merged schema unstable.
    kept = old.join(F.broadcast(delta_docs), "document", "left_anti").select(*old.columns)
    return kept.unionByName(delta.select(*old.columns))


def lookup(index: DataFrame, word: str) -> DataFrame:
    """Exact-word query (reference ``main/app.py:67-77``): normalize the
    probe exactly like the corpus, equality filter, sort count-desc.

    The reference downloads the whole index per query; here the filter
    is pushed into the scan (word-partitioned/bucketed storage prunes
    files). ``document`` added as explicit tiebreak — the reference
    leaves ties unspecified (SURVEY.md §2 quirk 4).
    """
    w = normalize_query_word_py(word)
    filtered = index.where(F.col("word") == F.lit(w))
    # Persisted index (write_index) carries a 'first' partition column:
    # add the partition predicate so the scan prunes to one directory.
    if "first" in index.columns:
        filtered = filtered.where(F.col("first") == F.lit(w[:1]))
    return filtered.select("document", "count").orderBy(
        F.desc("count"), F.asc("document")
    )


def distinct_words(index: DataFrame) -> DataFrame:
    """Vocabulary (reference iterates dict keys, ``groupby/main.py:116-119``)."""
    return index.select("word").distinct()


def write_index(
    index: DataFrame,
    path: str,
    buckets: int = 64,
    versioned: bool = False,
    folded_through: int | None = None,
) -> None:
    """Persist the index for point lookups: partitioned by first letter
    (coarse pruning) — a lookup touches one directory, not the table.

    Full-build semantics: ``partitionOverwriteMode=static`` is forced on
    this writer so a rebuild replaces the WHOLE table — the session
    default is dynamic (for ``upsert_index``), which would leave stale
    first-letter partitions from a prior build behind.

    (Bucketing by word would be tighter but needs a metastore table;
    first-letter partitioning works on bare parquet paths.)

    REBALANCE(first), not repartition("first"): a hash repartition pins
    each letter to exactly ONE task, so a hot word (natural corpora: a
    stopword can be >50% of all postings) serializes half the write
    into a single task. The rebalance hint keeps the same directory
    layout but lets AQE's OptimizeSkewInRebalancePartitions split an
    oversized letter across tasks (multiple files per dir — readers
    don't care; lookup prunes by directory). Measured in the r5 skew
    test: the hot letter splits, untouched letters stay single-file.

    ``versioned=True`` opts into crash-atomic rebuilds: the table is
    written to an immutable ``v=N`` directory and becomes visible only
    when its commit file lands (see the versioned-commits section
    above). Once a table is versioned, every later full rewrite
    continues the protocol regardless of the flag — forking a
    versioned table back to in-place would reintroduce the window the
    caller opted out of. A versioned rebuild also supersedes any
    pending additive deltas via the ``folded_through`` watermark (the
    in-place rewrite's directory wipe does the same thing physically).

    ``folded_through``: optional FLOOR for the watermark this build
    records (versioned: in the commit; in-place: the ``_folded_through``
    marker). A streaming first-batch full build passes its own batch id
    here so a crash between this write and the checkpoint commit makes
    the replayed batch a watermark no-op instead of a double count —
    without it the replay finds the index existing and re-applies the
    same postings as an additive delta (the r6-ADVICE batch-0 window).
    """
    spark = index.sparkSession
    commits = _list_commits(spark, path)
    floor = [folded_through] if folded_through is not None else []
    if versioned or commits:
        # Migration detection BEFORE writing: an in-place table being
        # re-written versioned leaves its legacy top-level base behind
        # (dead first=* dirs + sidecars a stray bare
        # spark.read.parquet(path) would still see) — cleaned up after
        # the commit lands, below.
        migrating = not commits and _hadoop_exists(spark, f"{path}/_SUCCESS")
        _, prev_folded, _ = _resolve_version(spark, path)
        v = (commits[-1] + 1) if commits else 0
        staging = _staging_dir(path)
        _write_base(index, staging)
        _write_docmap_full(index, staging)
        token = _claim_version_dir(spark, path, staging, v)
        raw = _list_additive_batches(spark, path)
        _write_commit(
            spark,
            path,
            v,
            folded_through=max([prev_folded] + raw + floor),
            claim_token=token,
        )
        gc_index_versions(spark, path)
        if migrating:
            # The caller's ``index`` lineage (often read_index over the
            # legacy base) has fully materialized into v=0 by now, so
            # the old top-level layout is safe to reclaim. The stream-
            # checkpoint binding is NOT legacy state — it survives.
            for name in ("_docmap", FOLDED_MARKER, "_SUCCESS"):
                _hadoop_delete(spark, f"{path}/{name}")
            fs = _hadoop_fs(spark, path)
            for st in fs.listStatus(_hadoop_path(spark, path)):
                if st.getPath().getName().startswith("first="):
                    _hadoop_delete(spark, str(st.getPath()))
        return
    _write_base(index, path)
    _write_docmap_full(index, path)
    if folded_through is not None:
        _write_small_file(
            spark, f"{path}/{FOLDED_MARKER}", str(folded_through).encode("ascii")
        )


def _write_base(index: DataFrame, target: str) -> None:
    (
        index.withColumn("first", F.substring("word", 1, 1))
        .hint("rebalance", "first")
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "static")
        .partitionBy("first")
        .parquet(target)
    )


# --- doc→letters sidecar -------------------------------------------------
#
# upsert_index's replace semantics must find the OLD first-letter
# partitions of re-indexed documents (a stale posting may live in a
# partition the delta never writes). Without help that is a scan of the
# whole index per upsert — O(table) per one-file micro-batch. The
# sidecar holds the distinct (document, first) pairs, partitioned by a
# hash bucket of the document id, so an upsert reads and rewrites only
# the buckets its delta documents live in. It sits at
# ``{path}/_docmap``: the underscore prefix makes it invisible to
# ``spark.read.parquet(path)``, so readers of the index never see it.

_DOCMAP_BUCKETS = 64

# Row cap for upsert_index's driver-resolved replace-set (r13): a
# re-indexed document set that collects over this bound falls back to
# the lazy relation (tests patch it to 0 to drive the fallback).
UPSERT_DOCS_CAP = 1_000_000


def _docmap_path(path: str) -> str:
    return f"{path}/_docmap"


def _with_bucket(df: DataFrame) -> DataFrame:
    return df.withColumn(
        "bucket",
        F.pmod(F.crc32(F.col("document")), F.lit(_DOCMAP_BUCKETS)).cast("int"),
    )


def _doc_letters(postings: DataFrame) -> DataFrame:
    return postings.select(
        "document", F.substring("word", 1, 1).alias("first")
    ).distinct()


def _write_docmap_full(index: DataFrame, path: str) -> None:
    (
        _with_bucket(_doc_letters(index))
        .repartition("bucket")
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "static")
        .partitionBy("bucket")
        .parquet(_docmap_path(path))
    )


def index_exists(spark, path: str) -> bool:
    """True iff a COMMITTED index base exists at ``path`` — versioned
    layout: a commit file; in-place layout: the job committer's
    ``_SUCCESS`` marker. A bare directory-exists check (the pre-r7
    behavior) misreads a crashed pre-commit build as a live table: a
    versioned build killed before its commit file, or an in-place
    overwrite killed mid-job, leaves the path existing but unreadable —
    a streaming first batch must REBUILD over such a carcass, not start
    appending deltas to it."""
    if not _hadoop_exists(spark, path):
        return False
    if _list_commits(spark, path):
        return True
    return _hadoop_exists(spark, f"{path}/_SUCCESS")


def upsert_index(
    spark,
    delta: DataFrame,
    path: str,
    additive: bool = False,
    documents: DataFrame | None = None,
    versioned: bool = False,
) -> None:
    """Incremental index maintenance at partition granularity (O15/O19).

    Merges ``delta`` postings into the persisted index at ``path``,
    rewriting ONLY the first-letter partitions the delta touches
    (``partitionOverwriteMode=dynamic``): old rows are read from just
    those partitions (partition-pruned scan), merged with the delta
    (replace-document or additive — ``merge_index``), and written back;
    every untouched partition's files are left byte-identical on disk.
    At 100 TB a one-document delta rewrites a handful of directories,
    not the table — the fix for the naive full-rewrite upsert.

    Touched partitions are the union of (a) the delta's own first
    letters and (b) — under replace semantics — the first letters of the
    delta documents' OLD postings: a re-indexed document whose new text
    drops a word must have that stale posting removed from a partition
    the delta itself never writes. (b) is answered by the doc→letters
    sidecar (``{path}/_docmap``, bucket-partitioned by document hash):
    the read prunes to the delta documents' buckets, so per-upsert cost
    scales with the delta, not the index. An index written before the
    sidecar existed falls back to one full column-pruned scan and
    backfills the sidecar afterward, making every later upsert pruned.
    Additive mode never removes, so it skips (b); both modes keep the
    sidecar current for the documents they touch.

    The merged delta is ``localCheckpoint``ed before the write: it reads
    the same files the write overwrites, and materializing it (only the
    touched partitions' worth of data) both breaks that read-your-writes
    hazard and is the local equivalent of staging delta partitions
    before a commit. First build (no index yet) degrades to
    ``write_index`` — that is the only place ``versioned`` applies;
    an existing table keeps its layout.

    Consistency contract: per-partition replacement commits through
    Spark's Hadoop output committer — a crash mid-commit can leave a
    *touched* partition half-replaced (untouched partitions are never
    at risk), and a concurrent reader can observe a touched partition
    mid-swap. That is the inherent limit of dynamic partition overwrite
    on bare parquet; deployments needing crash atomicity or snapshot
    isolation across partitions put a transactional table format
    (Delta/Iceberg) under this same plan — the merge logic is
    format-agnostic. Filesystem checks go through Spark's Hadoop
    filesystem layer, so ``path`` may live on any supported scheme
    (local, HDFS, s3a, ...), not just the driver's local disk.
    """
    if not index_exists(spark, path):
        # ``versioned`` applies only to this first full build — an
        # existing table keeps whatever layout it has (the protocol
        # continues itself; see write_index).
        write_index(delta, path, versioned=versioned)
        return
    # Versioned tables: partition-granular upserts operate IN PLACE on
    # the current version directory (the full-rewrite protocol is for
    # full rewrites; per-partition dynamic overwrite keeps its own
    # documented mid-swap window either way).
    base_dir, _folded, _ver = _resolve_version(spark, path)
    if _ver is not None and _commit_letter_map(spark, path, _ver) is not None:
        # A letter-scoped fold left the head LAYERED: letters live in
        # several immutable version dirs, and an in-place dynamic
        # overwrite of the head dir would both miss layered letters and
        # mutate an immutable snapshot. (The additive streaming path —
        # the only producer of scoped folds — never calls upsert, so
        # this only trips a mixed batch workflow.)
        raise ValueError(
            f"index at {path} is at a letter-scoped (layered) commit: "
            "partition-granular upserts need a self-contained base. "
            "Flatten first with compact_index(spark, path, scoped=False) "
            "or a full write_index rebuild."
        )
    if not additive and pending_additive_batches(spark, path):
        # Replace semantics must see the document's FULL current postings
        # to scrub stale rows; pending deltas live outside the base scan,
        # so merging over the base alone would silently resurrect or
        # miscount. Additive upserts compose fine (read_index sums).
        # (Superseded-but-not-yet-GC'd deltas under a versioned commit
        # watermark don't count — the base already holds them.)
        raise ValueError(
            f"index at {path} has uncompacted additive deltas "
            f"({ADDITIVE_DELTA_DIR}/): run compact_index() before "
            "replace-mode upserts"
        )
    # One materialization of the delta — the letter collect, stale-scan
    # semi-join, merge, and final write otherwise re-run the caller's
    # whole delta lineage (tokenize/aggregate of the new corpus) per
    # action, 4x.
    delta = delta.localCheckpoint()
    docmap = _docmap_path(base_dir)
    have_docmap = _hadoop_exists(spark, docmap)
    # ``documents``: the explicit re-indexed set (see merge_index's
    # replace_docs). Without it, a document re-indexed to token-free
    # content is invisible here (no delta row) and its stale postings
    # would survive the replace.
    delta_docs = (
        documents.select("document").distinct()
        if documents is not None
        else delta.select("document").distinct()
    )
    # r13 job-count trim, action 1 of 2: ONE bounded collect resolves
    # the replace-set AND its sidecar buckets driver-side. The
    # re-indexed document set is batch-sized by contract (the streaming
    # door's trigger bounds it; batch callers re-index a shipment), so
    # it re-enters the plan as a LocalRelation — the stale semi-join,
    # merge anti-join, and docmap anti-join stop re-evaluating the
    # caller's batch source per consumer and their broadcasts carry an
    # exact size estimate. A replace-set over UPSERT_DOCS_CAP falls
    # back to the r12 lazy shape (bounded probe first — never an
    # unbounded driver fetch).
    head = _with_bucket(delta_docs).limit(UPSERT_DOCS_CAP + 1).collect()
    if len(head) <= UPSERT_DOCS_CAP:
        buckets = sorted({r["bucket"] for r in head})
        from pyspark.sql.types import StructField, StructType

        delta_docs = spark.createDataFrame(
            [(r["document"],) for r in head],
            StructType(
                [StructField("document", delta.schema["document"].dataType, False)]
            ),
        )
    else:
        buckets = sorted(
            r["bucket"]
            for r in _with_bucket(delta_docs).select("bucket").distinct().collect()
        )
    # r13 job-count trim, action 2 of 2: the delta's own first letters
    # and — under replace semantics — the delta documents' STALE first
    # letters ride ONE tagged collect instead of two (the early-return
    # conditions still distinguish the delta's letters from the stale
    # set via the tag).
    tagged_letters = delta.select(
        F.lit(0).alias("src"), F.substring("word", 1, 1).alias("first")
    ).distinct()
    if not additive:
        if have_docmap:
            # Pruned: only the delta documents' sidecar buckets are read.
            stale = (
                spark.read.parquet(docmap)
                .where(F.col("bucket").isin(buckets))
                .join(F.broadcast(delta_docs), "document", "left_semi")
                .select("first")
                .distinct()
            )
        else:
            # Legacy index (no sidecar yet): one full column-pruned scan.
            stale = (
                spark.read.parquet(base_dir)
                .join(F.broadcast(delta_docs), "document", "left_semi")
                .select(F.substring("word", 1, 1).alias("first"))
                .distinct()
            )
        tagged_letters = tagged_letters.unionByName(
            stale.select(F.lit(1).alias("src"), F.col("first"))
        )
    letter_rows = tagged_letters.collect()
    delta_letters = {r["first"] for r in letter_rows if r["src"] == 0}
    letters = {r["first"] for r in letter_rows}
    if not delta_letters and (additive or documents is None):
        # nothing to add, and no explicit replace-set to scrub
        return
    if not letters:
        return
    letters = sorted(letters)
    old = (
        spark.read.parquet(base_dir)
        .where(F.col("first").isin(letters))
        .select("word", "document", "count")
    )
    merged = merge_index(old, delta, additive=additive, replace_docs=delta_docs)
    out = (
        merged.withColumn("first", F.substring("word", 1, 1))
        # same skew-splitting rationale as write_index's REBALANCE
        .hint("rebalance", "first")
    )
    # The merged-docmap plan (sidecar case) reads only the sidecar and
    # the checkpointed delta — independent of the postings merge — so
    # the two materializations run CONCURRENTLY from a driver thread
    # pool (r13, guide §2.6): one signal's shuffle back-fills the cores
    # the other's barrier leaves idle. The WRITES stay sequential,
    # postings first: a crash can then only leave the docmap LAGGING
    # the postings, and a lagging docmap over-reports stale letters
    # (extra partitions read and rewritten — safe) where a LEADING one
    # would under-report them (stale postings surviving a later
    # replace — wrong).
    staged = None
    if have_docmap:
        old_map = (
            spark.read.parquet(docmap)
            .where(F.col("bucket").isin(buckets))
            .select("document", "first")
        )
        new_pairs = _doc_letters(delta)
        if additive:
            merged_map = old_map.unionByName(new_pairs).distinct()
        else:
            merged_map = old_map.join(
                F.broadcast(delta_docs), "document", "left_anti"
            ).unionByName(new_pairs)
        staged = _with_bucket(merged_map).repartition("bucket")
    if staged is not None:
        from concurrent.futures import ThreadPoolExecutor

        from pyspark import inheritable_thread_target

        with ThreadPoolExecutor(max_workers=2) as pool:
            out, staged = pool.map(
                inheritable_thread_target(lambda df: df.localCheckpoint()),
                [out, staged],
            )
    else:
        out = out.localCheckpoint()
    (
        out.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("first")
        .parquet(base_dir)
    )
    # A touched partition whose merged content is EMPTY is not written at
    # all (dynamic overwrite only replaces partitions present in the
    # data), so its stale directory must go explicitly.
    nonempty = {r["first"] for r in out.select("first").distinct().collect()}
    for letter in letters:
        if letter not in nonempty:
            _hadoop_delete(spark, f"{base_dir}/first={letter}")
    # Keep the sidecar current. With a sidecar: rewrite only the delta
    # documents' buckets (old rows for OTHER documents in those buckets
    # survive; replace mode drops the delta docs' old rows, additive
    # keeps them). Without one: backfill from the now-merged index —
    # one full scan, once, after which every upsert is pruned.
    if staged is not None:
        (
            staged.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("bucket")
            .parquet(docmap)
        )
    else:
        _write_docmap_full(spark.read.parquet(base_dir), base_dir)


def _hadoop_path(spark, path: str):
    return spark._jvm.org.apache.hadoop.fs.Path(path)


def _hadoop_fs(spark, path: str):
    """The Hadoop FileSystem owning ``path`` — resolves the scheme
    (file://, hdfs://, s3a://, ...) so existence/delete checks work on
    whatever storage the session is configured for, unlike
    ``os.path``/``shutil`` which silently see only the driver's disk."""
    conf = spark._jsc.hadoopConfiguration()
    return _hadoop_path(spark, path).getFileSystem(conf)


def _hadoop_exists(spark, path: str) -> bool:
    return _hadoop_fs(spark, path).exists(_hadoop_path(spark, path))


def _hadoop_delete(spark, path: str) -> None:
    fs = _hadoop_fs(spark, path)
    p = _hadoop_path(spark, path)
    if fs.exists(p):
        fs.delete(p, True)


# --- versioned commits (opt-in crash-atomic full rewrites) ----------------
#
# The one crash window the partition-granular machinery can't close is
# the FULL rewrite: write_index/compact_index statically overwrite the
# table in place, so a crash mid-job loses it. This is the micro-subset
# of a transactional format the workload actually needs, on bare
# parquet: base versions are IMMUTABLE directories ``{path}/v=N``, and
# the current version is named by the highest ``{path}/_versions/
# N.commit`` file — written whole to a temp name and renamed into place
# (rename-to-fresh-name: atomic on local/HDFS; a single small-object
# PUT elsewhere). A crash at ANY point of a rebuild/compaction leaves
# the previous commit untouched and readers never see a partial table;
# the orphaned v-dir is silently overwritten by the next attempt.
#
# The commit also records ``folded_through``: the highest additive
# batch id folded into (or superseded by) that base. Readers ignore
# delta partitions ≤ the watermark, which closes compaction's other
# window — there is no state where a fold is visible AND its source
# deltas still count (delta deletion becomes lazy GC, not a
# correctness step). Partition-granular upserts keep operating in
# place on the current version dir with their own (smaller, documented)
# mid-swap window — versioning full rewrites only is the deliberate
# scope.
#
# Opt in with ``write_index(..., versioned=True)`` — and since r7 the
# streaming writer (``start_file_index_stream``) creates its tables on
# this layout BY DEFAULT (streams are exactly the workload that must
# survive arbitrary kill points); every other operation
# (read/lookup/upsert/stream/compact) detects the layout and continues
# it. Reading a versioned table with a bare ``spark.read.parquet(path)``
# is a user error — go through ``read_index``/``lookup_persisted``.

VERSIONS_DIR = "_versions"


def _versions_path(path: str) -> str:
    return f"{path}/{VERSIONS_DIR}"


def _version_dir(path: str, v: int) -> str:
    return f"{path}/v={v}"


def _list_commits(spark, path: str) -> list[int]:
    vp = _versions_path(path)
    if not _hadoop_exists(spark, vp):
        return []
    fs = _hadoop_fs(spark, vp)
    out = []
    for st in fs.listStatus(_hadoop_path(spark, vp)):
        name = st.getPath().getName()
        if name.endswith(".commit"):
            try:
                out.append(int(name[: -len(".commit")]))
            except ValueError:
                continue
    return sorted(out)


def _read_commit(spark, path: str, v: int) -> dict:
    import json

    data = _read_small_file(spark, f"{_versions_path(path)}/{v}.commit")
    return json.loads(data.decode("utf-8"))


class ConcurrentWriteError(RuntimeError):
    """Two writers raced on one versioned table. The protocol is
    single-writer by contract (streams bind their checkpoint; batch
    jobs coordinate externally) — this error makes a violation LOUD
    instead of letting the loser's fold silently vanish under a
    last-commit-wins overwrite. The table is left at the winner's
    commit; re-read and re-run the losing operation."""


def _staging_dir(path: str) -> str:
    import uuid

    return f"{path}/.staging-{uuid.uuid4().hex}"


CLAIM_TOKEN_FILE = "_claim"


def _claim_version_dir(spark, path: str, staging: str, v: int) -> str:
    """Claim version slot ``v`` by atomically renaming the fully
    written staging directory to ``v=N``. Rename-to-existing fails, so
    at most one writer owns a slot: a second writer targeting the same
    v is refused here — BEFORE any commit — with its staged data
    deleted, never clobbering the winner's directory (the pre-r8 flow
    wrote straight into ``v=N`` and a stale loser could overwrite a
    committed winner's data files in place).

    Self-heal: a slot holding an UNCOMMITTED directory (v above the
    committed head — a claim that crashed before its commit) is
    deleted and the claim retried once. That self-heal can, in a
    millisecond window, delete a LIVE concurrent writer's claim — so
    every claim carries a unique token file (written into the staging
    dir BEFORE the rename, so it rides the atomic rename; the leading
    underscore keeps parquet readers ignoring it). Returns the token:
    ``_write_commit`` re-verifies that the directory in the slot still
    holds THIS writer's token before publishing, turning the residual
    claim-stomp race into a loud ``ConcurrentWriteError`` instead of a
    silent commit/data mismatch."""
    import uuid

    token = uuid.uuid4().hex
    _write_small_file(spark, f"{staging}/{CLAIM_TOKEN_FILE}", token.encode("ascii"))
    fs = _hadoop_fs(spark, path)
    src = _hadoop_path(spark, staging)
    vdir = _version_dir(path, v)
    dst = _hadoop_path(spark, vdir)
    name = staging.rsplit("/", 1)[1]
    for attempt in (0, 1):
        if not fs.exists(dst) and fs.rename(src, dst):
            # POSIX/local-FS rename(src, existingDir) NESTS src inside
            # dst instead of failing — detect a lost race and undo
            nested = _hadoop_path(spark, f"{vdir}/{name}")
            if not fs.exists(nested):
                return token
            fs.rename(nested, src)
        commits = _list_commits(spark, path)
        head = commits[-1] if commits else -1
        if attempt == 0 and fs.exists(dst) and v > head:
            # crashed claim (written dir, no commit): reclaim the slot
            fs.delete(dst, True)
            continue
        break
    fs.delete(src, True)
    raise ConcurrentWriteError(
        f"version slot v={v} at {path} is already claimed — another "
        "writer advanced the table since this operation started. Its "
        "staged data was discarded; re-run against the new head."
    )


def _write_commit(
    spark,
    path: str,
    v: int,
    folded_through: int,
    letter_map: dict[str, int] | None = None,
    claim_token: str | None = None,
) -> None:
    """Publish version ``v`` — with a compare-and-swap: the commit
    lands only if the committed head is still ``v - 1`` (the parent
    every writer computes its slot from). A stale writer that did its
    fold against an old head is refused HERE, loudly, instead of
    overwriting the winner's commit (last-commit-wins silently
    discarded the loser's fold before r8). The rename itself refuses
    an existing target, closing the both-pass-the-check race: at most
    one commit per slot, ever.

    ``claim_token``: the token ``_claim_version_dir`` returned. The
    slot's directory is re-checked to hold THIS token before the
    commit publishes — a concurrent writer whose self-heal stomped the
    claim and re-claimed the slot left a DIFFERENT token, and without
    this check the loser could still commit metadata computed for data
    files that were replaced (silent commit/data mismatch)."""
    import json
    import uuid

    vp = _versions_path(path)
    fs = _hadoop_fs(spark, vp)
    fs.mkdirs(_hadoop_path(spark, vp))
    if claim_token is not None:
        tok_path = f"{_version_dir(path, v)}/{CLAIM_TOKEN_FILE}"
        found = (
            _read_small_file(spark, tok_path).decode("ascii")
            if _hadoop_exists(spark, tok_path)
            else None
        )
        if found != claim_token:
            raise ConcurrentWriteError(
                f"claim token mismatch for v={v} at {path}: this writer's "
                f"claimed directory was replaced by a concurrent writer "
                "(its self-heal treated the in-flight claim as crashed). "
                "The slot now holds the other writer's data; re-run this "
                "operation against the new head."
            )
    commits = _list_commits(spark, path)
    head = commits[-1] if commits else None
    expected = v - 1 if v > 0 else None
    if head != expected:
        raise ConcurrentWriteError(
            f"commit CAS failed for v={v} at {path}: expected head "
            f"{expected}, found {head} — another writer committed since "
            "this operation observed the table. Its work is preserved; "
            "re-run this operation against the new head."
        )
    doc = {"v": v, "folded_through": folded_through}
    if letter_map is not None:
        doc["letter_map"] = letter_map
    payload = json.dumps(doc).encode()
    tmp = _hadoop_path(spark, f"{vp}/.{uuid.uuid4().hex}.tmp")
    out = fs.create(tmp, True)
    out.write(bytearray(payload))
    out.close()
    if not fs.rename(tmp, _hadoop_path(spark, f"{vp}/{v}.commit")):
        fs.delete(tmp, False)
        if _hadoop_exists(spark, f"{vp}/{v}.commit"):
            raise ConcurrentWriteError(
                f"commit file for v={v} at {path} appeared during the "
                "CAS window — another writer won the slot; re-run "
                "against the new head."
            )
        raise IOError(f"version commit rename failed for v={v} at {path}")


FOLDED_MARKER = "_folded_through"

# Stream-checkpoint binding: the additive streaming writer records WHICH
# checkpoint built/owns the table (start_file_index_stream). Lets the
# fresh-checkpoint id-collision case (silent data drop) be detected and
# refused instead of masquerading as a crash replay. Top-level small
# file; survives versioned rewrites by construction and is explicitly
# preserved across in-place compaction folds.
STREAM_BINDING = "_stream_checkpoint"


def _read_small_file(spark, path: str) -> bytes:
    stream = _hadoop_fs(spark, path).open(_hadoop_path(spark, path))
    try:
        return bytes(
            spark._jvm.org.apache.commons.io.IOUtils.toByteArray(stream)
        )
    finally:
        stream.close()


def _write_small_file(spark, path: str, payload: bytes) -> None:
    """Whole-file write via temp name + atomic replace: an existing
    target is swapped out in ONE metadata operation (POSIX rename(2)
    through ``FileSystem.rename`` locally; ``FileContext.rename``
    with ``Options.Rename.OVERWRITE`` on contract-strict filesystems
    like HDFS), so a crash at any point leaves either the old bytes or
    the new bytes — never a missing file. (The previous
    delete-then-rename pair had a crash window with NO file on disk —
    exactly the state the ``_foreign_releases`` call sites promise
    cannot happen, since a vanished marker silently strips
    foreign-release collision protection until the next adoption.)"""
    import uuid

    fs = _hadoop_fs(spark, path)
    parent = path.rsplit("/", 1)[0]
    tmp = _hadoop_path(spark, f"{parent}/.{uuid.uuid4().hex}.tmp")
    out = fs.create(tmp, True)
    out.write(bytearray(payload))
    out.close()
    target = _hadoop_path(spark, path)
    try:
        # Plain rename first: on a POSIX local FS this reaches
        # File.renameTo -> rename(2), which atomically replaces an
        # existing target (and it trivially succeeds when no target
        # exists, on any FS). Filesystems honoring the strict
        # FileSystem.rename contract (HDFS) instead return false when
        # the target exists -- for those, FileContext.rename(OVERWRITE)
        # is the namenode-atomic replace. Neither path ever deletes the
        # target first, so no crash point leaves the file missing.
        if not fs.rename(tmp, target):
            jvm = spark._jvm
            fc = jvm.org.apache.hadoop.fs.FileContext.getFileContext(
                target.toUri(), spark._jsc.hadoopConfiguration()
            )
            opts = spark.sparkContext._gateway.new_array(
                jvm.org.apache.hadoop.fs.Options.Rename, 1
            )
            opts[0] = jvm.org.apache.hadoop.fs.Options.Rename.OVERWRITE
            fc.rename(tmp, target, opts)
    except Exception:
        fs.delete(tmp, False)
        raise


def _resolve_version(spark, path: str) -> tuple[str, int, int | None]:
    """(base_dir, folded_through, version). In-place layout (no
    commits): the base IS the path, and ``folded_through`` comes from
    the ``_folded_through`` marker an in-place compaction leaves behind
    (-1 when absent) — the minimal watermark that keeps a crashed
    stream's replay of an already-compacted batch from double-counting
    (found by the lifecycle random-walk test; the versioned layout
    carries the same watermark inside its commit files)."""
    commits = _list_commits(spark, path)
    if not commits:
        marker = f"{path}/{FOLDED_MARKER}"
        folded = -1
        if _hadoop_exists(spark, marker):
            folded = int(_read_small_file(spark, marker).decode("ascii"))
        return path, folded, None
    v = commits[-1]
    meta = _read_commit(spark, path, v)
    return _version_dir(path, v), int(meta.get("folded_through", -1)), v


def index_version(spark, path: str) -> int | None:
    """Current committed version of the index at ``path`` (None for a
    legacy in-place table)."""
    return _resolve_version(spark, path)[2]


# --- letter-scoped (layered) commits --------------------------------------
#
# A full compaction fold rewrites the WHOLE base per fold — O(base) no
# matter how small the delta tail, which is exactly backwards at 100 TB
# where a micro-batch touches a handful of first-letter partitions. A
# letter-scoped fold rewrites ONLY the touched letters into the fresh
# ``v=N+1`` directory and records, in the commit itself, which version
# directory OWNS each letter (``letter_map``): untouched letters keep
# pointing at the directory that already holds them. The commit file
# stays the single atomicity point — the new letter directories are
# invisible until the commit renames in, so a crash at ANY point leaves
# the previous commit (and its letter resolution) serving exact counts,
# and a replayed fold overwrites the orphaned dir (same self-heal as
# full rewrites). This is the manifest idea from transactional table
# formats (Iceberg/Delta) reduced to the one axis this table needs:
# letters are the partition unit, the commit is the manifest.
#
# Contract notes, stated exactly:
# - Self-contained commits (full ``write_index`` rebuilds) carry no
#   ``letter_map`` — their directory holds every letter.
# - GC must keep every version directory a KEPT commit's letter_map
#   references (reference-counted reclamation, below).
# - Partition-granular ``upsert_index`` operates in place on ONE version
#   directory and cannot see layered letters — it refuses a layered
#   head (flatten first with ``compact_index(..., scoped=False)``).
#   The additive streaming path never calls it, so scoped folds are the
#   stream default at zero risk.
# - Layered commits carry no ``_docmap`` sidecar (only upserts read it;
#   the flatten that re-enables upserts rebuilds it).


def _list_letters(spark, dir_path: str) -> list[str]:
    """``first=*`` partition names under a base directory — one
    filesystem listing, no data read."""
    if not _hadoop_exists(spark, dir_path):
        return []
    fs = _hadoop_fs(spark, dir_path)
    out = []
    for st in fs.listStatus(_hadoop_path(spark, dir_path)):
        name = st.getPath().getName()
        if name.startswith("first="):
            out.append(name.split("=", 1)[1])
    return sorted(out)


def _commit_letter_map(spark, path: str, v: int) -> dict[str, int] | None:
    """The commit's letter→owning-version map, or None for a
    self-contained commit (its own directory holds every letter)."""
    meta = _read_commit(spark, path, v)
    lm = meta.get("letter_map")
    if lm is None:
        return None
    return {letter: int(ver) for letter, ver in lm.items()}


def _versioned_base(spark, path: str, v: int, letters=None) -> DataFrame:
    """(word, document, count) scan of commit ``v``'s base table.
    Self-contained commit: one partition-pruned read of its own
    directory. Layered commit: resolve each letter to its owning
    version directory and union one pruned scan per owner — the number
    of owners is bounded by the fold policy's layer cap, and a point
    lookup still reads exactly one letter directory. ``letters``
    restricts the scan (partition pruning on every branch)."""
    lm = _commit_letter_map(spark, path, v)
    if lm is None:
        base = spark.read.parquet(_version_dir(path, v))
        if letters is not None:
            base = base.where(F.col("first").isin(sorted(letters)))
        return base.select("word", "document", "count")
    if letters is not None:
        lm = {l: ver for l, ver in lm.items() if l in set(letters)}
    if not lm:
        return spark.createDataFrame([], _ADDITIVE_SCHEMA)
    by_ver: dict[int, list[str]] = {}
    for letter, ver in lm.items():
        by_ver.setdefault(ver, []).append(letter)
    parts = []
    for ver in sorted(by_ver):
        scan = spark.read.parquet(_version_dir(path, ver)).where(
            F.col("first").isin(sorted(by_ver[ver]))
        )
        parts.append(scan.select("word", "document", "count"))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def _list_additive_batches(spark, path: str) -> list[int]:
    """Raw (abatch=) partition listing — includes batches a versioned
    commit has already superseded; use ``pending_additive_batches`` for
    the logical tail."""
    add = _additive_path(path)
    if not _hadoop_exists(spark, add):
        return []
    fs = _hadoop_fs(spark, add)
    out = []
    for st in fs.listStatus(_hadoop_path(spark, add)):
        name = st.getPath().getName()
        if name.startswith("abatch="):
            out.append(int(name.split("=", 1)[1]))
    return sorted(out)


def gc_index_versions(spark, path: str, keep: int = 2) -> None:
    """Lazy cleanup for a versioned index: drop base versions older than
    the newest ``keep`` and every additive delta partition at or below
    the current ``folded_through`` watermark. Pure space reclamation —
    readers resolve through the commit files and never reference what
    this deletes, so it is safe at any time (and a crash mid-GC just
    leaves garbage for the next GC).

    Reference counting for layered commits: a KEPT commit's
    ``letter_map`` may point letters at an older version's directory —
    those directories are retained even when their own commit file
    expires (the time-travel horizon is the kept commits; the data
    files live as long as anything kept references them, the
    manifest-GC rule). The data sweep lists ``v=*`` directories ON
    DISK rather than walking surviving commit files: a dir retained
    only for a layered reference outlives its own commit, and once the
    referencing commit later expires a commit-file walk would never
    revisit it — the directory would leak forever (every streaming
    auto-compaction batch is a scoped fold, so the leak compounds
    between flattens). Dirs ABOVE the committed head are left alone —
    that slot is an in-flight or crashed claim, which
    ``_claim_version_dir`` owns."""
    commits = _list_commits(spark, path)
    if not commits:
        return
    _, folded, _ = _resolve_version(spark, path)
    kept = commits[-keep:] if keep > 0 else commits[-1:]
    referenced: set[int] = set()
    for v in kept:
        referenced.add(v)
        lm = _commit_letter_map(spark, path, v)
        if lm:
            referenced.update(lm.values())
    for old in commits:
        if old in kept:
            continue
        _hadoop_delete(spark, f"{_versions_path(path)}/{old}.commit")
    head = commits[-1]
    fs = _hadoop_fs(spark, path)
    for st in fs.listStatus(_hadoop_path(spark, path)):
        name = st.getPath().getName()
        if not name.startswith("v="):
            continue
        try:
            v = int(name.split("=", 1)[1])
        except ValueError:
            continue
        if v <= head and v not in referenced:
            _hadoop_delete(spark, _version_dir(path, v))
    for b in _list_additive_batches(spark, path):
        if b <= folded:
            _hadoop_delete(spark, f"{_additive_path(path)}/abatch={b}")
    # crashed-before-claim staging leftovers (run GC with writers
    # quiesced — the single-writer discipline GC already assumes)
    for st in fs.listStatus(_hadoop_path(spark, path)):
        if st.getPath().getName().startswith(".staging-"):
            _hadoop_delete(spark, str(st.getPath()))


def index_history(spark, path: str) -> list[dict]:
    """The commit log of a versioned index, oldest first:
    ``[{"v": N, "folded_through": M}, ...]`` (``[]`` for an in-place
    table — that layout keeps no history by construction). Each entry
    is a snapshot ``read_index_at`` can serve until
    ``gc_index_versions`` reclaims it (``keep`` bounds the time-travel
    horizon — history depth is a retention POLICY, not an accident of
    what GC hasn't gotten to)."""
    return [_read_commit(spark, path, v) for v in _list_commits(spark, path)]


def read_index_at(
    spark, path: str, version: int, first_letter: str | None = None
) -> DataFrame:
    """Snapshot read: the index exactly as committed at ``version`` —
    the immutable ``v=N`` base alone, NO pending-delta fold. Deltas are
    not part of any snapshot (a snapshot must reproduce byte-identically
    for as long as its commit exists, but the delta tail keeps moving
    under the live table); the head read that folds them is
    ``read_index``. Raises — naming the surviving commits — for a
    version GC has reclaimed or that never existed, instead of silently
    serving the wrong counts from a stale directory listing."""
    commits = _list_commits(spark, path)
    if version not in commits:
        raise ValueError(
            f"index at {path} has no committed version {version} "
            f"(available: {commits or 'none — in-place layout?'}). "
            "Old versions are reclaimed by gc_index_versions(keep=N); "
            "raise `keep` to retain a longer time-travel horizon."
        )
    return _versioned_base(
        spark, path, version, letters=None if first_letter is None else {first_letter}
    )


def index_diff(spark, path: str, v_from: int, v_to: int) -> DataFrame:
    """Changelog between two committed snapshots:
    (word, document, count_from, count_to, delta) for every posting
    whose count changed — inserts carry ``count_from = 0``, deletes
    ``count_to = 0`` (upsert streams can scrub a document's postings).
    One full-outer hash join on the posting key; both sides are bare
    immutable-snapshot scans, so the diff of a 100 TB table is one
    shuffle of exactly the two snapshots, never a log replay."""
    a = read_index_at(spark, path, v_from).withColumnsRenamed(
        {"count": "count_from"}
    )
    b = read_index_at(spark, path, v_to).withColumnsRenamed({"count": "count_to"})
    return (
        a.join(b, ["word", "document"], "full_outer")
        .select(
            "word",
            "document",
            F.coalesce(F.col("count_from"), F.lit(0).cast("bigint")).alias(
                "count_from"
            ),
            F.coalesce(F.col("count_to"), F.lit(0).cast("bigint")).alias(
                "count_to"
            ),
        )
        .withColumn("delta", F.col("count_to") - F.col("count_from"))
        .where(F.col("delta") != 0)
    )


def rollback_index(spark, path: str, version: int) -> int:
    """Restore the table's HEAD to an earlier committed snapshot — as a
    NEW commit (history is append-only: the abandoned head stays
    readable until GC reclaims it, and a rollback of a rollback is just
    another commit). Pending additive deltas are superseded by the new
    commit's watermark — they describe the abandoned timeline, exactly
    like the ones a versioned full rebuild swallows.

    Refuses a stream-bound table: the owning checkpoint has committed
    batch ids whose data the rollback would discard, and letting the
    stream continue would silently leave those batches half-missing.
    Stop the stream and delete the ``_stream_checkpoint`` binding (and
    its checkpoint) to make that decision explicit. Returns the new
    version id."""
    if _hadoop_exists(spark, f"{path}/{STREAM_BINDING}"):
        bound = _read_small_file(spark, f"{path}/{STREAM_BINDING}").decode("utf-8")
        raise ValueError(
            f"index at {path} is owned by streaming checkpoint {bound!r}: "
            "rolling back under a live stream would discard batches its "
            "checkpoint has committed. Stop the stream, then delete the "
            f"{STREAM_BINDING} marker (and the checkpoint) to roll back "
            "deliberately."
        )
    # materialize BEFORE the new commit: write_index's GC may reclaim
    # the very version being restored from (keep policy counts from
    # the new head)
    snap = read_index_at(spark, path, version).localCheckpoint()
    write_index(snap, path)
    return _resolve_version(spark, path)[2]


def read_index(spark, path: str, first_letter: str | None = None) -> DataFrame:
    """Logical view of the persisted index: the folded base table plus
    any pending exactly-once additive deltas (``{path}/_additive``, see
    ``write_additive_delta``) summed in. With no pending deltas this is
    the bare base scan — zero overhead for the common case.

    ``first_letter``: optional partition predicate applied to BOTH
    sides (base is first-partitioned, deltas (abatch, first)-
    partitioned) BEFORE the 3-column projection drops the partition
    column — so a point lookup lists one directory per side instead of
    the table. Without it, a ``word =`` filter over this view cannot
    prune (the projection has already removed ``first`` from the plan);
    at real file counts that's a full-table scan per query (measured in
    BASELINE.md's r6 100× soak). Point lookups should go through
    ``lookup_persisted``, which derives the letter from the probe.

    Versioned tables resolve through the commit files: the base scan
    reads the current ``v=N`` directory, and delta partitions at or
    below the commit's ``folded_through`` watermark are excluded (they
    are already inside the base — GC merely hasn't reclaimed them)."""
    base_dir, folded, _v = _resolve_version(spark, path)
    if _v is not None:
        base = _versioned_base(
            spark, path, _v, letters=None if first_letter is None else {first_letter}
        )
    else:
        base = spark.read.parquet(base_dir)
        if first_letter is not None:
            base = base.where(F.col("first") == F.lit(first_letter))
        base = base.select("word", "document", "count")
    add = _additive_path(path)
    if _hadoop_exists(spark, add) and any(
        b > folded for b in _list_additive_batches(spark, path)
    ):
        deltas = spark.read.schema(_ADDITIVE_SCHEMA).parquet(add)
        if folded >= 0:
            deltas = deltas.where(F.col("abatch") > folded)
        if first_letter is not None:
            deltas = deltas.where(F.col("first") == F.lit(first_letter))
        return (
            base.unionByName(deltas.select("word", "document", "count"))
            .groupBy("word", "document")
            .agg(F.sum("count").alias("count"))
        )
    return base


def lookup_persisted(spark, path: str, word: str) -> DataFrame:
    """Point lookup against a persisted index that is BOTH pruned and
    delta-correct: prunes base and pending-additive scans to the
    probe's first-letter partitions, folds any pending streaming
    deltas, then applies ``lookup``'s exact filter/sort contract.

    This is the serving path (engine/web UI): reading the base alone
    misses pending additive deltas; reading through the unpruned
    ``read_index`` view scans the whole table per query."""
    w = normalize_query_word_py(word)
    return lookup(read_index(spark, path, first_letter=w[:1]), w)


# --- exactly-once additive deltas ---------------------------------------
#
# The streaming additive path's idempotence ledger, done the Spark-native
# way: instead of "merge into the base, then remember the batch id"
# (which leaves a crash window between the data write and the ledger
# append — exactly the kill-after-write-before-commit failure the replay
# tests inject), each additive micro-batch writes its postings to its OWN
# batch-keyed partition ``{path}/_additive/abatch=N/first=x``. A replayed
# batch dynamically overwrites the SAME partitions (batch content is
# pinned by the streaming file-source checkpoint, tokenization is
# deterministic), so the write itself is the ledger: any crash point —
# before, during, or after the write — converges to exactly one copy of
# batch N after replay. This is the bare-parquet analogue of a
# transactional format's versioned commit files.

ADDITIVE_DELTA_DIR = "_additive"
_ADDITIVE_SCHEMA = "word string, document string, count bigint"


def _additive_path(path: str) -> str:
    # underscore prefix: invisible to spark.read.parquet(path), like the
    # _docmap sidecar, so base-table readers never double-see deltas
    return f"{path}/{ADDITIVE_DELTA_DIR}"


def write_additive_delta(
    spark,
    delta: DataFrame,
    path: str,
    batch_id: int,
    allow_replayed_ids: bool = False,
) -> None:
    """Idempotently apply one additive micro-batch to the index at
    ``path`` (which must exist — the stream's first batch full-builds
    via ``write_index``, itself an idempotent static overwrite).

    Scale shape: one dynamic partition overwrite of the batch's own
    ``(abatch, first)`` directories — cost scales with the delta, the
    base table is never read or touched. Readers fold pending deltas
    through ``read_index``; ``compact_index`` folds them into the base
    when the tail grows. The docmap sidecar update is a distinct-union
    (idempotent under replay by construction).

    A ``batch_id`` at or below the table's ``folded_through`` watermark
    means one of two things, and they must not share a code path:

    - a CRASH REPLAY of a batch the base already absorbed (a stream's
      checkpoint re-delivering the batch compaction or the first full
      build beat it to) — the no-op IS the exactly-once semantics.
      Only a caller that KNOWS it is replaying (the streaming
      checkpoint path, which binds its checkpoint to the table) may
      assert that, via ``allow_replayed_ids=True``;
    - a NEW stream with a FRESH checkpoint whose restarted ids collide
      with folded ones — its data would be silently and permanently
      DROPPED. The pre-r7 code warned here; a warning on a headless
      production stream is unread, so the default is now an error
      (r6 verdict task 2 / ADVICE)."""
    if not index_exists(spark, path):
        # enforce the documented precondition: a delta with no
        # committed base would create an unreadable delta-only table
        # (read_index's base scan has nothing to fold into)
        raise ValueError(
            f"no committed index at {path} — the first batch must "
            "full-build via write_index (the streaming writer does "
            "this automatically)"
        )
    base_dir, folded, _ver = _resolve_version(spark, path)
    if batch_id <= folded:
        if allow_replayed_ids:
            # checkpoint-verified crash replay of an already-folded
            # batch: the no-op is exactly-once, either layout
            return
        raise ValueError(
            f"additive batch {batch_id} is at or below the index's "
            f"folded_through watermark ({folded}) at {path}. If this "
            "is a crash replay of an already-folded batch (the same "
            "streaming checkpoint re-delivering it), pass "
            "allow_replayed_ids=True — skipping it is the exactly-once "
            "semantics. If this is a NEW stream with a fresh "
            "checkpoint, its restarted batch ids collide with folded "
            "ones and this write would be silently DROPPED: keep the "
            "original checkpoint, or rebuild the index at a fresh path."
        )
    delta = delta.localCheckpoint()
    (
        delta.withColumn("abatch", F.lit(batch_id).cast("bigint"))
        .withColumn("first", F.substring("word", 1, 1))
        # same skew rationale as write_index's REBALANCE
        .hint("rebalance", "first")
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("abatch", "first")
        .parquet(_additive_path(path))
    )
    # Keep the doc→letters sidecar current so later replace-mode
    # upserts (after compaction) can prune. Union-distinct per touched
    # bucket: replaying the same pairs is a no-op. (Versioned tables:
    # the sidecar lives inside the current version dir, resolved above.)
    docmap = _docmap_path(base_dir)
    new_pairs = _doc_letters(delta)
    if _hadoop_exists(spark, docmap):
        # r13 job-count trim: ONE bounded collect resolves the batch's
        # (document, first) pairs AND their sidecar buckets driver-side
        # (the relation is batch-bounded: distinct docs × first
        # letters); an oversized batch falls back to the lazy shape
        pair_head = _with_bucket(new_pairs).limit(UPSERT_DOCS_CAP + 1).collect()
        if len(pair_head) <= UPSERT_DOCS_CAP:
            buckets = sorted({r["bucket"] for r in pair_head})
            from pyspark.sql.types import StructField, StructType

            new_pairs = spark.createDataFrame(
                [(r["document"], r["first"]) for r in pair_head],
                StructType(
                    [
                        StructField(
                            "document", delta.schema["document"].dataType, False
                        ),
                        StructField("first", delta.schema["word"].dataType, False),
                    ]
                ),
            )
        else:
            buckets = sorted(
                r["bucket"]
                for r in _with_bucket(new_pairs.select("document").distinct())
                .select("bucket")
                .distinct()
                .collect()
            )
        old_map = (
            spark.read.parquet(docmap)
            .where(F.col("bucket").isin(buckets))
            .select("document", "first")
        )
        staged = (
            _with_bucket(old_map.unionByName(new_pairs).distinct())
            .repartition("bucket")
            .localCheckpoint()
        )
        (
            staged.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("bucket")
            .parquet(docmap)
        )
    # No sidecar (a table written before the sidecar existed): do NOT
    # rebuild it here — that is a full index scan inside a streaming
    # micro-batch, stalling the stream (r6 verdict). Nothing needs it
    # while deltas are pending (replace-mode upserts are refused until
    # compaction, and compaction's write_index rebuilds it in full);
    # to backfill eagerly, call ``rebuild_docmap`` out-of-band.


def rebuild_docmap(spark, path: str) -> None:
    """Out-of-band backfill of the doc→letters sidecar for a table
    written before the sidecar existed: one full column-pruned scan of
    the logical index (base + pending deltas), after which every
    replace-mode upsert prunes. Run it from maintenance, never from
    inside a micro-batch — that's the point (r6 verdict task 6)."""
    base_dir, _folded, _ver = _resolve_version(spark, path)
    _write_docmap_full(read_index(spark, path), base_dir)


def pending_additive_batches(spark, path: str) -> list[int]:
    """Sorted batch ids of additive deltas the current base does NOT
    yet contain — one directory listing, no data read. The stream's
    auto-compaction trigger and operational monitoring ("how long is
    the delta tail?") both key off this. On a versioned table, batches
    at or below the commit's ``folded_through`` watermark are excluded
    (already folded; awaiting GC)."""
    raw = _list_additive_batches(spark, path)
    if not raw:
        return []
    _, folded, _ = _resolve_version(spark, path)
    return [b for b in raw if b > folded]


def _dir_bytes(spark, path: str) -> int:
    fs = _hadoop_fs(spark, path)
    p = _hadoop_path(spark, path)
    if not fs.exists(p):
        return 0
    return int(fs.getContentSummary(p).getLength())


def index_size_info(spark, path: str) -> dict:
    """Base vs pending-delta-tail sizes from filesystem metadata alone
    (no data read): ``{"base_bytes", "tail_bytes", "pending_batches",
    "version"}``. ``base_bytes`` is the current base directory
    including its sidecars — fine for a ratio policy, which only needs
    the order of magnitude. This is the measurement behind
    ``should_compact``'s size trigger and the operational "how big is
    the tail?" dashboard number."""
    base_dir, _folded, v = _resolve_version(spark, path)
    pending = pending_additive_batches(spark, path)
    tail = sum(
        _dir_bytes(spark, f"{_additive_path(path)}/abatch={b}") for b in pending
    )
    lm = _commit_letter_map(spark, path, v) if v is not None else None
    if lm is not None:
        # layered head: the logical base spans letter dirs across
        # several versions — sum exactly the referenced letter dirs
        # (a head-dir-only number would undercount and over-trigger
        # the ratio policy)
        base_bytes = sum(
            _dir_bytes(spark, f"{_version_dir(path, ver)}/first={letter}")
            for letter, ver in lm.items()
        )
    else:
        base_bytes = _dir_bytes(spark, base_dir)
    return {
        "base_bytes": base_bytes,
        "tail_bytes": tail,
        "pending_batches": pending,
        "version": v,
    }


def should_compact(
    spark,
    path: str,
    max_pending: int | None = None,
    max_tail_ratio: float | None = None,
) -> bool:
    """Compaction trigger policy. ``max_pending`` is the legacy
    count trigger; ``max_tail_ratio`` is the one that AMORTIZES: each
    compaction is a full base rewrite (O(base) — 100.6 s at the 100×
    soak base, BASELINE.md r6), so folding every K batches costs
    O(base) per K batches no matter how small the tail is and gets
    quadratically worse as the base grows. Triggering at
    ``tail_bytes ≥ ratio · base_bytes`` instead makes each fold grow
    the base by ≥ ratio, so total compaction work over a table's life
    is O(total bytes ingested / ratio) — amortized constant per byte
    at ANY base size (the classic LSM/log-compaction bound). Both
    triggers consult filesystem metadata only; no data is read."""
    pending = pending_additive_batches(spark, path)
    if not pending:
        return False
    if max_pending is not None and len(pending) >= max_pending:
        return True
    if max_tail_ratio is not None:
        info = index_size_info(spark, path)
        if info["tail_bytes"] >= max_tail_ratio * max(info["base_bytes"], 1):
            return True
    return False


def _delta_letters(spark, path: str, batches: list[int]) -> list[str]:
    """Distinct ``first=`` letters across the given additive batch
    partitions — pure directory listing (the delta layout is
    ``_additive/abatch=N/first=x``), no data read."""
    out: set[str] = set()
    for b in batches:
        out.update(_list_letters(spark, f"{_additive_path(path)}/abatch={b}"))
    return sorted(out)


def compact_index(
    spark, path: str, scoped: bool | str = False, max_layers: int = 8
) -> None:
    """Fold pending additive deltas into the base table and drop them —
    the maintenance companion of ``write_additive_delta``, bounding the
    delta tail that reads fold.

    ``scoped`` (versioned tables only): a letter-scoped fold rewrites
    ONLY the ``first=`` letter partitions the delta tail touches into
    the fresh ``v=N+1`` directory and records letter ownership in the
    commit (``letter_map`` — see the layered-commits section). Fold
    cost becomes O(touched letters' data + tail), not O(base): a
    micro-batch tail touching 3 of 30 letters folds at ~1/10 the IO,
    which is the difference between "compaction is the pipeline" and
    "compaction is background noise" at a 100 TB base. Crash-atomic at
    every kill point for free — the commit file is still the only
    visibility switch. ``"auto"``: scoped when the table is versioned
    AND the resulting commit would reference at most ``max_layers``
    version directories; beyond that it FLATTENS with a full fold
    (bounding read fan-out and GC-retained stale copies — the same
    reason LSM trees have major compactions). The STREAMING
    auto-compaction passes ``"auto"`` (per-batch folds over a growing
    base are exactly the O(base)-per-fold trap, and the additive
    stream never upserts). ``scoped=False`` (default for direct/batch
    callers — a layered head refuses replace-mode upserts, so batch
    workflows that mix compaction with upserts keep self-contained
    commits): always the full fold, and — on a layered head —
    flattens even with an empty tail (the re-enable path for
    replace-mode upserts). ``scoped=True``: force a scoped fold
    regardless of the layer cap.

    Run with the stream paused (or from inside its own ``foreachBatch``
    via ``compact_every`` — single writer either way). Crash semantics
    on bare parquet, stated exactly, per layout:

    - In-place (legacy) table: the fold is ONE static overwrite of
      ``path``, and that overwrite clears ``_additive`` together with
      the old base (verified live — the job rewrites the whole
      directory); a ``_folded_through`` marker written AFTER the fold
      makes a crashed stream's replay of a folded batch a no-op. Two
      windows remain, stated exactly: a crash mid-overwrite can lose
      the table, and a crash between the overwrite and the marker
      write leaves one replay able to double-count (the marker is a
      separate step on this layout).
    - Versioned table (``write_index(versioned=True)``): the fold goes
      through the version protocol — written to a fresh ``v=N+1`` dir,
      visible only once its commit (carrying the new ``folded_through``
      watermark) lands, superseded deltas reclaimed by GC. The fold
      and the watermark commit are ONE atomic commit-file write, so a
      crash at ANY point leaves the previous commit serving exact
      counts and no replay can double-count — all three windows
      closed. Streams that must survive arbitrary kill points belong
      on this layout — which is why ``start_file_index_stream``
      creates its tables versioned BY DEFAULT since r7.

    The merged relation is materialized via ``localCheckpoint`` before
    any files it read are replaced (full folds; scoped folds write only
    to a fresh invisible directory, so there is no read-your-writes
    hazard to break)."""
    pending = pending_additive_batches(spark, path)
    _, prev_folded, cur_v = _resolve_version(spark, path)
    if scoped is True and cur_v is None:
        # the docstring's contract is "versioned tables only" — a caller
        # FORCING a scoped fold on an in-place table would silently get
        # a different operation (a full O(base) rewrite that wipes
        # top-level files); only scoped='auto' may fall through.
        raise ValueError(
            f"compact_index(scoped=True) requires a versioned table, but "
            f"{path} uses the in-place layout (no version commits). Use "
            "scoped='auto' to fall back to a full fold, or rebuild with "
            "write_index(versioned=True)."
        )
    layered = cur_v is not None and _commit_letter_map(spark, path, cur_v) is not None
    if not pending:
        if layered and scoped is False:
            # explicit flatten request: fold the layered letters back
            # into one self-contained commit (re-enables upserts)
            merged = read_index(spark, path).localCheckpoint()
            write_index(merged, path)
        return
    if cur_v is not None and scoped in ("auto", True):
        cur_map = _commit_letter_map(spark, path, cur_v) or {
            letter: cur_v for letter in _list_letters(spark, _version_dir(path, cur_v))
        }
        touched = _delta_letters(spark, path, pending)
        new_v = cur_v + 1
        new_map = {**cur_map, **{letter: new_v for letter in touched}}
        n_owners = len(set(new_map.values()))
        if scoped is True or n_owners <= max_layers:
            base = _versioned_base(spark, path, cur_v, letters=set(touched))
            deltas = (
                spark.read.schema(_ADDITIVE_SCHEMA)
                .parquet(_additive_path(path))
                .where(
                    F.col("abatch").isin(pending) & F.col("first").isin(touched)
                )
                .select("word", "document", "count")
            )
            merged = (
                base.unionByName(deltas)
                .groupBy("word", "document")
                .agg(F.sum("count").alias("count"))
                .withColumn("first", F.substring("word", 1, 1))
            )
            staging = _staging_dir(path)
            (
                merged.hint("rebalance", "first")
                .write.mode("overwrite")
                .option("partitionOverwriteMode", "static")
                .partitionBy("first")
                .parquet(staging)
            )
            token = _claim_version_dir(spark, path, staging, new_v)
            raw = _list_additive_batches(spark, path)
            _write_commit(
                spark,
                path,
                new_v,
                folded_through=max([prev_folded] + raw),
                letter_map=new_map,
                claim_token=token,
            )
            gc_index_versions(spark, path)
            return
    # The in-place fold's static overwrite wipes every top-level file,
    # including the stream-checkpoint binding a streaming writer left —
    # preserve it across the rewrite (versioned folds never touch it).
    binding_path = f"{path}/{STREAM_BINDING}"
    binding = (
        _read_small_file(spark, binding_path)
        if _hadoop_exists(spark, binding_path)
        else None
    )
    merged = read_index(spark, path).localCheckpoint()
    write_index(merged, path)
    if _resolve_version(spark, path)[2] is None:
        # in-place layout: the overwrite above already wiped _additive
        # (and any previous marker); the delete covers filesystems
        # where that cleanup semantics differs, and the marker records
        # the watermark so a crashed stream's replay of a batch this
        # fold just absorbed stays a no-op instead of double-counting.
        _hadoop_delete(spark, _additive_path(path))
        _write_small_file(
            spark,
            f"{path}/{FOLDED_MARKER}",
            str(max([prev_folded] + pending)).encode("ascii"),
        )
        if binding is not None:
            _write_small_file(spark, binding_path, binding)


# --- deletion / takedown (r9) ----------------------------------------------


def _letters_for_docs(spark, path: str, cur_v: int, ids: list[str]) -> list[str]:
    """The ``first=`` letters whose base partitions hold postings for
    any of ``ids``. Docmap-pruned when the head is self-contained and
    carries the sidecar (read ≤ |ids| of the 64 hash buckets — no data
    scan); layered or docmap-less heads fall back to one filtered scan
    of the base (document is a plain column, so parquet row-group
    min/max stats still skim it)."""
    vdir = _version_dir(path, cur_v)
    dm = f"{vdir}/_docmap"
    if _commit_letter_map(spark, path, cur_v) is None and _hadoop_exists(spark, dm):
        import zlib

        buckets = sorted(
            {zlib.crc32(d.encode("utf-8")) % _DOCMAP_BUCKETS for d in ids}
        )
        rows = (
            spark.read.parquet(dm)
            .where(F.col("bucket").isin(buckets) & F.col("document").isin(ids))
            .select("first")
            .distinct()
            .collect()
        )
        return sorted(r["first"] for r in rows)
    rows = (
        _versioned_base(spark, path, cur_v)
        .where(F.col("document").isin(ids))
        .select(F.substring("word", 1, 1).alias("first"))
        .distinct()
        .collect()
    )
    return sorted(r["first"] for r in rows)


def delete_documents(spark, path: str, doc_ids: list[str]) -> None:
    """Takedown (right-to-be-forgotten / licensing retraction): remove
    EVERY posting of the given documents from the persisted index.

    Versioned tables: a letter-scoped fold — the same rewrite primitive
    as ``compact_index(scoped=True)`` — over exactly the letters the
    documents touch (docmap-pruned, see ``_letters_for_docs``) plus the
    pending delta tail (which must fold in the same pass: a tail row
    for a deleted document left pending would resurrect it at the next
    compaction). Cost ∝ touched letters' data + tail, not O(base); the
    result is ONE crash-atomic layered commit — a kill at any point
    leaves the previous commit serving (with the documents still
    present — deletion is not durable until the commit lands), and a
    replay converges. Like any scoped fold, the head comes back layered
    (replace-mode upserts refuse until a flattening ``compact_index``).

    In-place tables: one full filtered rewrite (the layout has no
    partial-rewrite primitive), with the stream binding preserved and
    the folded-through marker advanced, mirroring ``compact_index``.

    Deleting a document does NOT block its re-insertion: a later batch
    or replayed stream id containing the document re-adds it (the index
    is not an admission ledger — pair with ``delete_from_ledger`` on
    the admission side to stop re-admission)."""
    ids = sorted({str(d) for d in doc_ids})
    if not ids:
        return
    pending = pending_additive_batches(spark, path)
    _, prev_folded, cur_v = _resolve_version(spark, path)
    if cur_v is None:
        binding_path = f"{path}/{STREAM_BINDING}"
        binding = (
            _read_small_file(spark, binding_path)
            if _hadoop_exists(spark, binding_path)
            else None
        )
        merged = (
            read_index(spark, path)
            .where(~F.col("document").isin(ids))
            .localCheckpoint()
        )
        write_index(merged, path)
        _hadoop_delete(spark, _additive_path(path))
        _write_small_file(
            spark,
            f"{path}/{FOLDED_MARKER}",
            str(max([prev_folded] + pending)).encode("ascii"),
        )
        if binding is not None:
            _write_small_file(spark, binding_path, binding)
        return
    doc_letters = _letters_for_docs(spark, path, cur_v, ids)
    touched = sorted(set(doc_letters) | set(_delta_letters(spark, path, pending)))
    if not touched:
        return  # documents unknown and no tail — nothing to rewrite
    cur_map = _commit_letter_map(spark, path, cur_v) or {
        letter: cur_v for letter in _list_letters(spark, _version_dir(path, cur_v))
    }
    new_v = cur_v + 1
    new_map = {**cur_map, **{letter: new_v for letter in touched}}
    base = _versioned_base(spark, path, cur_v, letters=set(touched))
    deltas = (
        spark.read.schema(_ADDITIVE_SCHEMA)
        .parquet(_additive_path(path))
        .where(F.col("abatch").isin(pending) & F.col("first").isin(touched))
        .select("word", "document", "count")
        if pending
        else spark.createDataFrame([], _ADDITIVE_SCHEMA)
    )
    merged = (
        base.unionByName(deltas)
        .where(~F.col("document").isin(ids))
        .groupBy("word", "document")
        .agg(F.sum("count").alias("count"))
        .withColumn("first", F.substring("word", 1, 1))
    )
    staging = _staging_dir(path)
    (
        merged.hint("rebalance", "first")
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "static")
        .partitionBy("first")
        .parquet(staging)
    )
    token = _claim_version_dir(spark, path, staging, new_v)
    raw = _list_additive_batches(spark, path)
    _write_commit(
        spark,
        path,
        new_v,
        folded_through=max([prev_folded] + raw),
        letter_map=new_map,
        claim_token=token,
    )
    gc_index_versions(spark, path)
