"""Streaming training-corpus prep (SURVEY.md §2.b X4+X7 composed).

The streaming twin of ``operators/pipelines.prepare_training_corpus``:
documents arrive as a stream (files landing in a bucket, a Kafka topic)
and flow through the same prep semantics — exact dedup, quality gate,
language tag — continuously instead of as a batch rebuild. The
reference's closest analogue is its upload trigger (O19,
``filladdtrigger/main.py``), which re-runs the whole batch job per
file; this is the principled incremental version.

Streaming re-shapes two stages:

- exact dedup becomes **keyed state**: ``dropDuplicates`` on the
  portable content hash. First arrival survives (a stream has no
  global min-doc_id ordering); batch and stream agree on WHICH
  contents survive, which is what dedup means. State is the hash set —
  16 B/key; bound it with a watermark via
  ``dropDuplicatesWithinWatermark`` when the source has event time.
- featurization uses the map-only ``text_features`` (array
  expressions, no groupBy) — identical values to the batch
  explode+groupBy operators (pinned by pytest), but legal in append
  mode and shuffle-free.

So the whole pipeline is one stateful dedup + pure projections: it
runs in append mode with no aggregation state at all beyond the hash
set, and every micro-batch costs one scan of itself.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from ..functions.hashing import hex64
from ..operators.dedup import _shingles
from ..operators.prep import DECONTAM_NGRAM, bench_gram_set
from ..operators.text_analysis import text_features


def streaming_corpus_prep(
    documents: DataFrame, min_quality: float = 0.5
) -> DataFrame:
    """Dedup → featurize → quality-gate a (possibly streaming)
    documents relation. Returns (doc_id, text_hash, n_tokens,
    n_distinct, lang_guess, quality) for surviving documents. Works
    identically on a batch DataFrame (used by the stream ≡ batch
    equivalence test)."""
    hashed = documents.select(
        "doc_id", "text", hex64(F.col("text")).alias("text_hash")
    )
    deduped = hashed.dropDuplicates(["text_hash"])
    feats = text_features(deduped, keep=("text_hash",))
    return feats.where(F.col("quality") >= F.lit(min_quality)).select(
        "doc_id", "text_hash", "n_tokens", "n_distinct", "lang_guess", "quality"
    )


def streaming_decontaminate(
    documents: DataFrame,
    benchmark: DataFrame,
    n: int = DECONTAM_NGRAM,
    ts_col: str | None = None,
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming eval-set hygiene: emit the (doc_id, text_hash) of every
    arriving document that shares an ``n``-gram with the STATIC
    benchmark relation — the continuous form of
    ``operators/prep.decontaminate`` (which also counts hits; counting
    is an aggregation and so belongs to the batch pass). Same default
    gram size (``DECONTAM_NGRAM``) so batch and stream flag the same
    documents.

    Append-mode legal end to end: gram explosion is per-row, the
    benchmark probe is a stream-static LEFT SEMI join (broadcast the
    tiny gram set), and the one-row-per-doc fold is keyed dedup state,
    not an aggregation. Consumers quarantine the emitted ids (anti-join
    downstream); the matched documents themselves flow through
    unchanged — flagging must not block the pipe.

    State bound: with ``ts_col`` set, the per-doc dedup state expires
    past the ``watermark`` horizon (``dropDuplicatesWithinWatermark``)
    — the production configuration. Without an event-time column the
    state is one entry per contaminated doc forever: fine for bounded
    replays (availableNow), unbounded on a perpetual stream.
    """
    bench_grams = bench_gram_set(benchmark, n)
    hashed = documents.select(
        "doc_id",
        "text",
        *((ts_col,) if ts_col else ()),
        hex64(F.col("text")).alias("text_hash"),
    )
    keep = ("text_hash",) + ((ts_col,) if ts_col else ())
    # text_hash rides THROUGH the gram stream (no join back — that
    # would be a stream-stream join); the semi-join side is static.
    hits = (
        _shingles(hashed, n, distinct=False, keep=keep)
        .join(F.broadcast(bench_grams), "shingle", "left_semi")
        .select("doc_id", "text_hash", *((ts_col,) if ts_col else ()))
    )
    if ts_col is not None:
        return hits.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
            ["doc_id"]
        )
    return hits.dropDuplicates(["doc_id"])


def streaming_corpus_from_jsonl(spark, path: str, max_files_per_trigger: int | None = None):
    """File-source ingest for the JSONL corpus format: watch ``path``
    for landing ``.json``/``.jsonl`` files (the shape corpus dumps
    actually arrive in) and emit the standard documents stream —
    corrupt lines dropped (they carry no usable text; batch audits run
    ``interchange.corrupt_record_stats`` on the same files).

    The explicit schema is load-bearing twice over: streaming JSON
    sources REQUIRE one (no inference), and it pins the contract so a
    malformed producer degrades to counted corrupt lines instead of a
    schema drift. Compose with ``streaming_corpus_prep`` /
    ``streaming_decontaminate`` for the full continuous pipeline."""
    from ..sources.interchange import CORPUS_JSONL_SCHEMA

    reader = spark.readStream.schema(
        CORPUS_JSONL_SCHEMA + ", _corrupt_record string"
    ).option("mode", "PERMISSIVE").option(
        "columnNameOfCorruptRecord", "_corrupt_record"
    )
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.json(path)
    return stream.where(
        F.col("_corrupt_record").isNull() & F.col("doc_id").isNotNull()
    ).drop("_corrupt_record")


def streaming_assets_from_dir(
    spark,
    path: str,
    pattern: str = "*.png",
    max_files_per_trigger: int | None = None,
):
    """File-source ingest for binary media assets: watch ``path`` for
    landing files matching ``pattern`` (Spark's ``binaryFile`` format —
    a streaming source since 3.x) and emit the standard assets stream
    ``(asset_id, payload, source_path)``.

    ``asset_id`` is the numeric file stem when the producer names
    files ``<id>.png`` (the deterministic spelling the tests and the
    survivors' replay discipline prefer), else a stable 64-bit hash of
    the basename — either way a pure function of the file name, so a
    replayed batch re-derives identical ids. Stems longer than 18
    digits (past bigint range) take the hash path — a bare ``cast``
    would yield NULL there, and a NULL id silently falls out of the
    admitted semi-join while its fingerprint still gates (found in the
    r11 review). Producers relying on numeric stems own their
    uniqueness (``007.png`` and ``7.png`` are the same id)."""

    # binaryFile's schema is FIXED by the format, but streaming file
    # sources require it stated explicitly (no inference on streams)
    reader = (
        spark.readStream.format("binaryFile")
        .schema(
            "path string, modificationTime timestamp, "
            "length long, content binary"
        )
        .option("pathGlobFilter", pattern)
    )
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.load(path)
    return stream.select(
        _asset_id_expr(F.col("path")).alias("asset_id"),
        F.col("content").alias("payload"),
        F.col("path").alias("source_path"),
    )


def _asset_id_expr(path_col):
    """Deterministic asset id from a file path: numeric stem when it
    fits a bigint (≤ 18 digits — past that a cast returns NULL, and a
    NULL id would silently drop the asset from the admitted semi-join
    while its fingerprint still gates), else a stable 64-bit hash of
    the basename. Coalesce is belt-and-braces under ANSI mode."""
    from ..functions.hashing import hex64

    base = F.element_at(F.split(path_col, "/"), -1)
    stem = F.regexp_extract(base, r"^(\d{1,18})\.[^.]+$", 1)
    return F.coalesce(
        F.when(stem != F.lit(""), stem.cast("long")), hex64(base)
    )
