"""Interchange formats (SURVEY.md §2 O2–O4): the reference's on-the-wire
shapes, re-expressed as Spark read/write round-trips.

The reference moves data between stages as:
- CSV with header ``Word,Document,Count`` (mapper output,
  ``mapper/main.py:63-70``)
- nested JSON ``{word: {document: count}}`` (grouped/final index,
  ``reducer/main.py:37-49``, ``master/main.py:82-126``)

Internally this engine keeps postings flat (the idiomatic Spark shape);
these functions exist at the boundary so any artifact the reference
produced can be imported, and any index this engine builds can be
exported byte-compatible for the reference's consumers (e.g. its
Streamlit UI reading ``final_results.json``).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..schemas import POSTINGS


def write_postings_csv(postings: DataFrame, path: str) -> None:
    """Reference mapper CSV shape: header ``Word,Document,Count``."""
    (
        postings.select(
            F.col("word").alias("Word"),
            F.col("document").alias("Document"),
            F.col("count").alias("Count"),
        )
        .write.mode("overwrite")
        .option("header", True)
        .csv(path)
    )


def read_postings_csv(spark: SparkSession, path: str) -> DataFrame:
    """Parse reference-shaped CSV back to flat postings. Rows for the
    same (word, document) are re-aggregated — the mapper emits one row
    per occurrence with Count=1 (``mapper/main.py:63``), so a raw
    mapper file and an aggregated export both import correctly."""
    df = spark.read.option("header", True).csv(
        path, schema="Word string, Document string, Count long"
    )
    return (
        df.select(
            F.col("Word").alias("word"),
            F.col("Document").alias("document"),
            F.col("Count").alias("count"),
        )
        .groupBy("word", "document")
        .agg(F.sum("count").alias("count"))
    )


def write_index_json(index: DataFrame, path: str) -> None:
    """Export the nested ``{word: {document: count}}`` shape
    (reference ``final_results.json``), one JSON object per line keyed
    by word: ``{"word": w, "postings": {doc: count}}``.

    A single giant dict (the reference's literal shape) cannot scale —
    it must fit one process's memory, which is exactly the reference's
    groupby bottleneck (``groupby/main.py:70-98``). One-object-per-word
    lines keep the export distributed and streamable; a consumer wanting
    the exact reference bytes folds the lines client-side.
    """
    (
        index.groupBy("word")
        .agg(
            F.map_from_entries(
                F.sort_array(F.collect_list(F.struct("document", "count")))
            ).alias("postings")
        )
        .write.mode("overwrite")
        .json(path)
    )


REFERENCE_JSON_MAX_ROWS = 1_000_000


def _guarded_collect(src: DataFrame, max_rows: int, what: str) -> list:
    """The reference-artifact exporters are the package's only
    deliberately driver-bound APIs; a user pointing one at a real index
    would OOM the driver. ONE job: collect ``limit(max_rows + 1)`` and
    refuse if the sentinel row materialized — atomic (no count-then-
    collect race against a source growing between two jobs) and half the
    scans of the count-first variant."""
    rows = src.limit(max_rows + 1).collect()
    if len(rows) > max_rows:
        raise ValueError(
            f"{what}: more than max_rows={max_rows:,} rows. "
            "The single-object reference artifact is driver-bound by "
            "design (it exists for bit-parity export of SMALL legacy "
            "indexes); for a real index use the distributed "
            "line-per-word export (write_index_json) or parquet/ORC. "
            "Pass a larger max_rows only if the driver demonstrably "
            "has the memory."
        )
    return rows


def fold_index_json(
    spark: SparkSession, path: str, max_rows: int = REFERENCE_JSON_MAX_ROWS
) -> dict:
    """Fold a ``write_index_json`` export into the reference's literal
    ``final_results.json`` shape: ONE nested dict ``{word: {doc: count}}``
    (``master/main.py:124-126``, read back at ``main/app.py:62-64``).

    Driver-side by nature — the reference artifact must fit one process's
    memory (exactly its groupby bottleneck), so this exists only for
    bit-parity export of small indexes to the reference's consumers; the
    distributed interchange path is the line-per-word export itself.
    ``max_rows`` guards the collect (single-job limit probe, raise with
    guidance).
    """
    src = spark.read.json(path, schema="word string, postings map<string, long>")
    rows = _guarded_collect(src, max_rows, "fold_index_json")
    return {r["word"]: dict(r["postings"]) for r in rows}


def write_reference_json(
    index: DataFrame, file_path: str, max_rows: int = REFERENCE_JSON_MAX_ROWS
) -> None:
    """Export a (small) postings index as the reference's exact
    single-object ``final_results.json`` artifact (nested dict, sorted
    keys for deterministic bytes). See ``fold_index_json`` for the
    scale caveat; ``max_rows`` guards the collect the same way."""
    import json

    sel = index.select("word", "document", "count")
    nested: dict = {}
    for r in _guarded_collect(sel, max_rows, "write_reference_json"):
        nested.setdefault(r["word"], {})[r["document"]] = int(r["count"])
    with open(file_path, "w") as f:
        json.dump(nested, f, sort_keys=True)


def read_index_json(spark: SparkSession, path: str) -> DataFrame:
    """Import the nested export back to flat postings."""
    df = spark.read.json(
        path, schema="word string, postings map<string, long>"
    )
    return df.select(
        "word", F.explode("postings").alias("document", "count")
    )


def write_postings_orc(postings: DataFrame, path: str) -> None:
    """Columnar interchange beyond parquet: ORC is the other
    splittable, predicate-pushdown-capable format Spark supports
    natively — the right wire shape when the downstream consumer is a
    Hive/Trino stack rather than this engine. Same flat postings
    relation, zero extra dependencies."""
    postings.select("word", "document", "count").write.mode("overwrite").orc(path)


def read_postings_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC import with the engine's postings schema enforced; ORC scans
    get the same pushdown/pruning treatment as parquet (filters reach
    the reader, untouched columns are never decoded)."""
    return spark.read.schema(POSTINGS).orc(path)


def postings_from_nested_dict(spark: SparkSession, nested: dict) -> DataFrame:
    """Adapt an in-memory reference index dict ({word:{doc:n}}, e.g.
    a parsed legacy ``final_results.json``) to a postings DataFrame.
    Driver-side by nature — only for migrating small legacy artifacts."""
    rows = [
        (word, doc, int(count))
        for word, docs in nested.items()
        for doc, count in docs.items()
    ]
    return spark.createDataFrame(rows, POSTINGS)


ZORDER_BITS = 16


def zorder_key(df: DataFrame, cols: tuple[str, ...], bits: int = ZORDER_BITS):
    """Z-order (Morton) key expression over numeric/timestamp columns:
    each column is min-max-scaled to an unsigned ``bits``-bit integer
    (one tiny driver-side agg for the bounds), then the bits are
    interleaved — points close in EVERY dimension get close keys, so a
    range-sort by the key clusters all dimensions at once. Pure
    built-in expressions (shift/and/or), whole-stage codegen; with the
    default 16 bits and ≤4 columns the key fits a bigint.

    Returns the key Column. Raises on non-numeric/temporal columns
    (strings have no meaningful linear scaling; hash them into a
    bucketed layout instead, ``sources/bucketed``).
    """
    from functools import reduce

    if not cols:
        raise ValueError("zorder_key needs at least one column")
    if len(cols) * bits > 63:
        raise ValueError(f"{len(cols)} cols x {bits} bits exceeds a signed bigint")
    kinds = dict(df.dtypes)

    def as_double(c: str):
        # DATE/TIMESTAMP_NTZ reject a direct double cast (DATATYPE_
        # MISMATCH); route temporals through TIMESTAMP → epoch seconds.
        if kinds[c] == "date" or kinds[c].startswith("timestamp"):
            return F.col(c).cast("timestamp").cast("double")
        return F.col(c).cast("double")

    for c in cols:
        kind = kinds.get(c, "")
        if not (
            kind in ("int", "bigint", "smallint", "tinyint", "float", "double")
            or kind.startswith("decimal")
            or kind in ("date", "timestamp", "timestamp_ntz")
        ):
            raise ValueError(f"zorder_by column {c!r} has unsupported type {kind!r}")
    bounds = df.agg(
        *[F.min(as_double(c)).alias(f"mn_{c}") for c in cols],
        *[F.max(as_double(c)).alias(f"mx_{c}") for c in cols],
    ).first()
    top = (1 << bits) - 1
    scaled = []
    for c in cols:
        mn, mx = bounds[f"mn_{c}"], bounds[f"mx_{c}"]
        if mn is None or mx is None or mx == mn:
            scaled.append(F.lit(0).cast("bigint"))
        else:
            x = (as_double(c) - F.lit(mn)) / F.lit(mx - mn)
            scaled.append(
                F.least(F.floor(x * (top + 1)), F.lit(top)).cast("bigint")
            )
    n = len(cols)
    terms = [
        F.shiftleft(F.shiftright(s, i).bitwiseAND(F.lit(1)), i * n + j)
        for j, s in enumerate(scaled)
        for i in range(bits)
    ]
    return reduce(lambda a, b: a.bitwiseOR(b), terms)


def write_dataset(
    df: DataFrame,
    path: str,
    partition_by: tuple[str, ...] = (),
    sort_by: tuple[str, ...] = (),
    zorder_by: tuple[str, ...] = (),
    compression: str = "zstd",
    max_records_per_file: int = 0,
    mode: str = "overwrite",
) -> None:
    """General parquet dataset writer with the layout controls that
    matter at 100 TB:

    - ``partition_by``: hive-style directory partitioning on LOW-
      cardinality columns (lang, date, source) — partition pruning
      turns a full scan into a directory listing. High-cardinality
      keys belong in bucketing (``sources/bucketed``), not here: one
      directory per value kills the file system.
    - ``sort_by``: ``sortWithinPartitions`` before the write — no extra
      shuffle, but parquet gets runs of equal/adjacent values, so
      dictionary/RLE encoding shrinks and min-max row-group statistics
      actually prune (a random layout makes every row group span the
      whole key range).
    - ``zstd`` default: ~30% smaller than snappy at similar scan CPU —
      at 100 TB the scan is bandwidth-bound, so smaller wins.
    - ``max_records_per_file``: bounds worst-case file size so one
      skewed partition can't produce a multi-GB file that a single
      task must read end-to-end.
    - ``zorder_by``: multi-dimensional clustering — range-partition +
      sort by the interleaved-bit ``zorder_key`` so min-max file/row-
      group statistics prune on EVERY listed column at once (a linear
      ``sort_by`` clusters only its leading column; the others span
      the full range in every file). The layout choice for fact tables
      filtered on several independent dimensions. Mutually exclusive
      with ``sort_by``; the key is an expression, never a written
      column. Range boundaries come from Spark's sampling, so the
      file split (not the values) can vary run to run — the same
      physical-layout caveat as AQE.
    """
    if sort_by and zorder_by:
        raise ValueError("sort_by and zorder_by are mutually exclusive")
    if zorder_by:
        z = zorder_key(df, zorder_by)
        df = df.repartitionByRange(z).sortWithinPartitions(z)
    if sort_by:
        df = df.sortWithinPartitions(*sort_by)
    w = df.write.mode(mode).format("parquet").option("compression", compression)
    if max_records_per_file:
        w = w.option("maxRecordsPerFile", str(max_records_per_file))
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.save(path)


def read_dataset(spark: SparkSession, path: str) -> DataFrame:
    """Read a ``write_dataset`` layout back (partition columns are
    recovered from the directory structure)."""
    return spark.read.parquet(path)


def infer_partitioning(path: str) -> tuple[str, ...]:
    """Partition columns of a hive-layout dataset, inferred from its
    ``key=value`` directory names (outermost first) — so maintenance
    operations like ``compact_dataset`` don't need the writer's
    ``partition_by`` re-supplied."""
    import os

    cols: list[str] = []
    cur = path
    while True:
        try:
            subdirs = [
                d
                for d in os.listdir(cur)
                if "=" in d and os.path.isdir(os.path.join(cur, d))
            ]
        except (FileNotFoundError, NotADirectoryError):
            break
        if not subdirs:
            break
        key = subdirs[0].split("=", 1)[0]
        if not all(d.split("=", 1)[0] == key for d in subdirs) or key in cols:
            break
        cols.append(key)
        cur = os.path.join(cur, subdirs[0])
    return tuple(cols)


def compact_dataset(
    spark: SparkSession,
    path: str,
    partition_by: tuple[str, ...] | None = None,
    sort_by: tuple[str, ...] = (),
    compression: str = "zstd",
    max_records_per_file: int = 0,
) -> dict:
    """Small-file compaction: rewrite a parquet dataset in place with
    healthy file sizes, preserving values, hive partition layout, and
    (optionally re-establishing) within-file sort order.

    Why it exists: every incremental sink accretes files — a streaming
    ``foreachBatch`` upsert writes a few rows per trigger, a 1000-
    executor append writes one file per task — and at 100 TB the
    resulting millions of KB-sized files make listing, planning, and
    scan startup (one open per file) the dominant cost. Compaction is
    the maintenance half of the sink contract: run it periodically (or
    when files-per-partition crosses a threshold) and scans return to
    bandwidth-bound.

    How (all stock Spark): read the layout back, ``REBALANCE``-hint the
    relation — AQE packs output partitions to its advisory size and
    SPLITS skewed ones (a hot hive partition does not become one giant
    task, the failure mode of the naive ``repartition(partition_by)``)
    — clustered by the partition columns so each output file holds one
    hive partition, then rewrite via ``write_dataset`` into a temp dir
    and swap. ``partition_by=None`` infers the layout from the
    directory names (``infer_partitioning``).

    The swap (rm + rename) is local-filesystem-appropriate; concurrent
    readers mid-swap see the old or the new listing, not a mix, only on
    stores with atomic rename — on object stores run compaction behind
    the same single-writer discipline as the incremental upsert (or use
    a table format with snapshot commits; out of scope here).

    Returns {"rows", "files_before", "files_after"} so callers/tests
    can assert the rewrite preserved cardinality and actually shrank
    the file count.
    """
    import os
    import shutil

    def _count_files(p: str) -> int:
        return sum(
            1
            for root, _dirs, files in os.walk(p)
            for f in files
            if f.endswith(".parquet")
        )

    if partition_by is None:
        partition_by = infer_partitioning(path)
    files_before = _count_files(path)
    df = read_dataset(spark, path)
    rebalanced = df.hint("rebalance", *partition_by) if partition_by else df.hint(
        "rebalance"
    )
    tmp = path.rstrip("/") + ".compact.tmp"
    old = path.rstrip("/") + ".compact.old"
    shutil.rmtree(tmp, ignore_errors=True)
    shutil.rmtree(old, ignore_errors=True)
    swap_started = False
    try:
        write_dataset(
            rebalanced,
            tmp,
            partition_by=partition_by,
            sort_by=sort_by,
            compression=compression,
            max_records_per_file=max_records_per_file,
        )
        rows = spark.read.parquet(tmp).count()
        # Two renames, never an early delete: the original survives (as
        # `.compact.old`) until the compacted copy is IN PLACE. A crash
        # at any point leaves at least one complete copy on disk — the
        # failure mode of delete-then-rename (original gone, tmp
        # cleaned by the error path) was the one way to lose data.
        swap_started = True
        os.rename(path, old)
        os.rename(tmp, path)
        shutil.rmtree(old)
    finally:
        if not swap_started:
            shutil.rmtree(tmp, ignore_errors=True)
    return {
        "rows": rows,
        "files_before": files_before,
        "files_after": _count_files(path),
    }


# ------------------------------------------------------------- JSONL corpus

# The de-facto LLM corpus interchange format: one JSON object per line
# with text + metadata (what Common-Crawl-derived corpora, RedPajama,
# Dolma etc. publish). Schema is EXPLICIT on read — schema inference
# would scan 100 TB twice and silently widen types per file.
CORPUS_JSONL_SCHEMA = (
    "doc_id bigint, text string, source string, lang string, "
    "meta map<string,string>"
)


def write_corpus_jsonl(
    documents: DataFrame, path: str, compression: str = "gzip"
) -> None:
    """Export a documents relation as compressed JSON-lines. Columns
    beyond the standard five ride along untouched; missing standard
    columns are emitted as nulls so every line has the full shape."""
    cols = documents.columns
    out = documents
    for name, typ in (
        ("source", "string"),
        ("lang", "string"),
        ("meta", "map<string,string>"),
    ):
        if name not in cols:
            out = out.withColumn(name, F.lit(None).cast(typ))
    out.write.mode("overwrite").option("compression", compression).json(path)


def read_corpus_jsonl(
    spark: SparkSession, path: str, schema: str = CORPUS_JSONL_SCHEMA
) -> DataFrame:
    """Scan a JSONL corpus with the explicit schema (single pass, no
    inference). Lines that fail to parse surface in ``_corrupt_record``
    instead of killing the scan — corpus files in the wild carry the
    occasional truncated line, and at 100 TB a scan abort on line
    3 billion is not an acceptable failure mode."""
    full = schema + ", _corrupt_record string"
    return (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
    )


def corrupt_record_stats(corpus: DataFrame) -> DataFrame:
    """One-row corrupt-line accounting for a ``read_corpus_jsonl`` scan —
    the audit step a production ingest runs before trusting the data.
    (Counts a data column too: Spark refuses scans that reference ONLY
    the internal corrupt-record column, QUERY_ONLY_CORRUPT_RECORD_COLUMN.)"""
    return corpus.agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.count(F.col("doc_id")).alias("n_parsed_ids"),
        F.sum(F.col("_corrupt_record").isNotNull().cast("long")).alias("n_corrupt"),
    )
