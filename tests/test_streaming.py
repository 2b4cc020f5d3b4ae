"""Streaming tests (SURVEY.md §5 item 5): the O19 file-trigger path and
the X7 windowed aggregations, checked against their batch twins."""

from __future__ import annotations

import os

import pyspark.sql.functions as F

from map_reduce_using_cloud_functions_spark.operators.index import build_index, read_index
from map_reduce_using_cloud_functions_spark.plans.events import tumbling_hourly
from map_reduce_using_cloud_functions_spark.sources import load_table, read_text_corpus
from map_reduce_using_cloud_functions_spark.streaming.file_index import (
    start_file_index_stream,
)
from map_reduce_using_cloud_functions_spark.streaming.windows import (
    streaming_session_values,
    streaming_tumbling_counts,
)

SF = "/root/testdata/sf0.001"


def _write(path: str, text: str) -> None:
    with open(path, "w") as f:
        f.write(text)


def test_file_drop_builds_and_extends_index(spark, tmp_path):
    """t1-style smoke mirroring filladdtrigger: drop file → index updated."""
    watch = tmp_path / "watch"
    watch.mkdir()
    index_path = str(tmp_path / "index")
    ckpt = str(tmp_path / "ckpt")

    _write(str(watch / "a.txt"), "hello world hello")
    _write(str(watch / "b.txt"), "world of spark")
    start_file_index_stream(spark, str(watch), index_path, ckpt).awaitTermination(120)
    got = sorted(map(tuple, read_index(spark, index_path).collect()))
    assert got == [
        ("hello", "a.txt", 2),
        ("of", "b.txt", 1),
        ("spark", "b.txt", 1),
        ("world", "a.txt", 1),
        ("world", "b.txt", 1),
    ]

    # Untouched-partition evidence: snapshot the data files of partitions
    # the incoming delta ("hello again" → h/, a/) does NOT touch.
    # (r7: streams default to the versioned layout — letter partitions
    # live under the current v=N dir; upserts operate in place there.)
    import glob

    from map_reduce_using_cloud_functions_spark.operators.index import (
        _resolve_version,
    )

    base_dir = _resolve_version(spark, index_path)[0]

    def part_files(letter):
        return {
            p: os.path.getmtime(p)
            for p in glob.glob(os.path.join(base_dir, f"first={letter}", "*.parquet"))
        }

    before = {letter: part_files(letter) for letter in ("o", "s", "w")}
    assert all(before.values())  # partitions exist

    # new file arrives → incremental update touches only the new doc
    _write(str(watch / "c.txt"), "hello again")
    start_file_index_stream(spark, str(watch), index_path, ckpt).awaitTermination(120)
    df = read_index(spark, index_path)
    assert df.schema.simpleString() == "struct<word:string,document:string,count:bigint>"
    assert sorted(map(tuple, df.where(F.col("document") == "c.txt").collect())) == [
        ("again", "c.txt", 1),
        ("hello", "c.txt", 1),
    ]
    # pre-existing postings untouched
    assert df.where((F.col("word") == "hello") & (F.col("document") == "a.txt")).first()[
        "count"
    ] == 2
    # partition-level upsert: untouched first-letter partitions' files
    # survive byte-identical (same paths, same mtimes)
    assert {letter: part_files(letter) for letter in ("o", "s", "w")} == before


def test_streaming_index_equals_batch(spark, tmp_path):
    """Stream-built index over a dir == batch build over the same dir."""
    watch = tmp_path / "corpus"
    watch.mkdir()
    for i, text in enumerate(["alpha beta", "beta gamma gamma", "alpha alpha delta"]):
        _write(str(watch / f"d{i}.txt"), text)
    index_path = str(tmp_path / "index")
    start_file_index_stream(
        spark, str(watch), index_path, str(tmp_path / "ck")
    ).awaitTermination(120)
    streamed = sorted(map(tuple, read_index(spark, index_path).collect()))
    batch = sorted(
        map(tuple, build_index(read_text_corpus(spark, str(watch))).collect())
    )
    assert streamed == batch


def test_streaming_tumbling_equals_batch(spark, tmp_path):
    """Windowed streaming agg (availableNow over the events fixture as a
    file stream) == the batch date_trunc aggregation."""
    events = load_table(spark, SF, "events")
    src = str(tmp_path / "events_json")
    events.select(
        "event_id", F.col("ts").cast("string").alias("ts"), "user_id", "event_type", "value"
    ).coalesce(2).write.json(src)

    stream = (
        spark.readStream.schema(
            "event_id bigint, ts string, user_id bigint, event_type string, value double"
        )
        .json(src)
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    out = streaming_tumbling_counts(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("tumbling_test")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    streamed = sorted(map(tuple, spark.sql("SELECT * FROM tumbling_test").collect()))
    batch = sorted(map(tuple, tumbling_hourly(events).collect()))
    assert streamed == batch


def test_streaming_session_window_runs(spark, tmp_path):
    """session_window streaming plan executes and produces sane sessions
    (exact parity with the gaps-and-islands batch twin is not required —
    session_window merges on event-time identically here, so check
    invariants: per-user coverage and total event conservation)."""
    events = load_table(spark, SF, "events")
    src = str(tmp_path / "events_json2")
    events.select(
        "event_id", F.col("ts").cast("string").alias("ts"), "user_id", "event_type", "value"
    ).coalesce(2).write.json(src)
    stream = (
        spark.readStream.schema(
            "event_id bigint, ts string, user_id bigint, event_type string, value double"
        )
        .json(src)
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    q = (
        streaming_session_values(stream)
        .writeStream.format("memory")
        .queryName("session_test")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = spark.sql("SELECT * FROM session_test")
    assert got.agg(F.sum("n_events")).first()[0] == events.count()
    assert got.select("user_id").distinct().count() == events.select(
        "user_id"
    ).distinct().count()
    # Exact stream ≡ batch: session_window and the gaps-and-islands
    # batch plan agree on every boundary except a gap of EXACTLY the
    # 30-min threshold (batch keeps, session_window splits). The
    # fixture has no exact-threshold gap (precondition asserted), so
    # per-session aggregates must match one-for-one.
    from pyspark.sql import Window as W

    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    exact_gaps = (
        events.select(
            (
                F.col("ts").cast("double")
                - F.lag(F.col("ts").cast("double")).over(w)
            ).alias("gap")
        )
        .where(F.col("gap") == 1800.0)
        .count()
    )
    assert exact_gaps == 0, "fixture gained an exact-threshold gap"
    from map_reduce_using_cloud_functions_spark.plans.events import sessionize

    batch = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"],
         r["total_value"])
        for r in sessionize(events).collect()
    }
    # session_window's end is (last event + gap); the batch twin's is
    # the last event itself — subtract the gap before comparing
    streamed = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"],
         r["total_value"])
        for r in got.select(
            "user_id",
            "session_start",
            (F.col("session_end") - F.expr("INTERVAL 30 MINUTES")).alias(
                "session_end"
            ),
            "n_events",
            "total_value",
        ).collect()
    }
    assert streamed == batch


def test_stateful_running_totals_across_batches(spark, tmp_path):
    """applyInPandasWithState carries per-user state across micro-batches:
    two file drops = two batches; totals accumulate, anomaly flags fire."""
    import json as _json

    from map_reduce_using_cloud_functions_spark.streaming.stateful import (
        running_user_totals,
    )

    src = tmp_path / "stream_src"
    src.mkdir()

    def drop(name, rows):
        (src / name).write_text("\n".join(_json.dumps(r) for r in rows))

    schema = "user_id bigint, value double"
    stream = spark.readStream.schema(schema).json(str(src))
    out = running_user_totals(stream)

    collected: list[dict] = []

    def run_once():
        # foreachBatch sink supports checkpoint recovery (memory sink
        # does not), so state carries across these restarts.
        q = (
            out.writeStream.foreachBatch(
                lambda df, bid: collected.extend(r.asDict() for r in df.collect())
            )
            .outputMode("update")
            .option("checkpointLocation", str(tmp_path / "ck"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    drop("b1.json", [
        {"user_id": 1, "value": 10.0},
        {"user_id": 1, "value": 10.0},
        {"user_id": 2, "value": 5.0},
    ])
    run_once()
    first = {r["user_id"]: r for r in collected}
    assert first[1]["total_events"] == 2 and first[1]["total_value"] == 20.0
    assert not first[1]["anomaly"]  # no prior history yet

    # batch 2: user 1 value spikes to >3x the historical mean of 10
    collected.clear()
    drop("b2.json", [{"user_id": 1, "value": 100.0}, {"user_id": 2, "value": 5.0}])
    run_once()
    second = {r["user_id"]: r for r in collected}
    assert second[1]["total_events"] == 3 and second[1]["total_value"] == 120.0
    assert second[1]["anomaly"]          # 100 > 3 * 10
    assert second[2]["total_events"] == 2 and not second[2]["anomaly"]


def test_streaming_corpus_prep_equals_batch(spark, tmp_path):
    """The composed prep pipeline (dedup → featurize → quality gate)
    over a file stream == the same pipeline run as one batch. Survivor
    doc_ids may differ (stream keeps first arrival, batch an arbitrary
    row), so equality is on the content level: (text_hash → features),
    which dedup semantics actually promise."""
    from map_reduce_using_cloud_functions_spark.streaming.prep import (
        streaming_corpus_prep,
    )

    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    src = str(tmp_path / "docs_json")
    docs.coalesce(3).write.json(src)  # 3 files → several micro-batch splits

    stream = spark.readStream.schema("doc_id bigint, text string").json(src)
    q = (
        streaming_corpus_prep(stream, min_quality=0.35)
        .writeStream.format("memory")
        .queryName("prep_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    streamed = {
        r["text_hash"]: (r["n_tokens"], r["n_distinct"], r["lang_guess"], r["quality"])
        for r in spark.sql("SELECT * FROM prep_test").collect()
    }
    batch = {
        r["text_hash"]: (r["n_tokens"], r["n_distinct"], r["lang_guess"], r["quality"])
        for r in streaming_corpus_prep(docs, min_quality=0.35).collect()
    }
    assert streamed == batch
    assert len(streamed) > 0


def test_streaming_decontaminate_equals_batch(spark, tmp_path):
    """Streaming contaminated-id emission over a file stream == the
    batch decontaminate flags over the same documents."""
    from map_reduce_using_cloud_functions_spark.operators.prep import decontaminate
    from map_reduce_using_cloud_functions_spark.streaming.prep import (
        streaming_decontaminate,
    )

    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    bench = docs.where(F.col("doc_id") % 20 == 0)
    train = docs.where(F.col("doc_id") % 20 != 0)

    src = str(tmp_path / "train_json")
    train.coalesce(3).write.json(src)
    stream = spark.readStream.schema("doc_id bigint, text string").json(src)
    q = (
        streaming_decontaminate(stream, bench, n=8)
        .writeStream.format("memory")
        .queryName("decon_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    streamed = {
        r["doc_id"] for r in spark.sql("SELECT doc_id FROM decon_test").collect()
    }
    batch = {
        r["doc_id"]
        for r in decontaminate(train, bench, n=8).where(F.col("contaminated")).collect()
    }
    assert streamed == batch and len(batch) > 0


def test_max_files_per_trigger_bounds_batches(spark, tmp_path):
    """Backpressure: with maxFilesPerTrigger=1 a 3-file backlog drains
    as (at least) 3 micro-batches, and the final index still equals the
    batch build — pins both the option spelling and the multi-batch
    upsert path."""
    watch = tmp_path / "corpus"
    watch.mkdir()
    for i, text in enumerate(["alpha beta", "beta gamma", "delta alpha"]):
        _write(str(watch / f"d{i}.txt"), text)
    index_path = str(tmp_path / "index")
    q = start_file_index_stream(
        spark,
        str(watch),
        index_path,
        str(tmp_path / "ck"),
        max_files_per_trigger=1,
    )
    q.awaitTermination(180)
    batches = [p for p in q.recentProgress if p["numInputRows"] > 0]
    assert len(batches) >= 3  # a silently-ignored option would give 1
    streamed = sorted(map(tuple, read_index(spark, index_path).collect()))
    batch = sorted(
        map(tuple, build_index(read_text_corpus(spark, str(watch))).collect())
    )
    assert streamed == batch


def test_streaming_decontaminate_watermark_path(spark, tmp_path):
    """The bounded-state configuration (ts_col + watermark →
    dropDuplicatesWithinWatermark) must flag the same docs as the
    unbounded path on a bounded replay."""
    from map_reduce_using_cloud_functions_spark.streaming.prep import (
        streaming_decontaminate,
    )

    docs = load_table(spark, SF, "documents").select(
        "doc_id", "text", F.lit("2024-01-01 00:00:00").cast("timestamp").alias("ts")
    )
    bench = docs.where(F.col("doc_id") % 20 == 0).select("doc_id", "text")
    train = docs.where(F.col("doc_id") % 20 != 0)

    src = str(tmp_path / "train_wm_json")
    train.select("doc_id", "text", F.col("ts").cast("string").alias("ts")).coalesce(
        2
    ).write.json(src)
    stream = (
        spark.readStream.schema("doc_id bigint, text string, ts string")
        .json(src)
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    q = (
        streaming_decontaminate(stream, bench, n=8, ts_col="ts")
        .writeStream.format("memory")
        .queryName("decon_wm_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    streamed = {
        r["doc_id"] for r in spark.sql("SELECT doc_id FROM decon_wm_test").collect()
    }
    from map_reduce_using_cloud_functions_spark.operators.prep import decontaminate

    batch = {
        r["doc_id"]
        for r in decontaminate(
            train.select("doc_id", "text"), bench, n=8
        ).where(F.col("contaminated")).collect()
    }
    assert streamed == batch and len(batch) > 0


def test_streaming_interval_join_equals_batch(spark, tmp_path):
    """Stream-stream interval join (clicks x purchases within horizon,
    watermarked both sides) over the events fixture as a file stream
    == the same function applied to the batch frame (watermark nodes
    eliminate on batch, leaving the range-condition equi-join)."""
    from map_reduce_using_cloud_functions_spark.streaming.joins import click_attribution

    events = load_table(spark, SF, "events")
    src = str(tmp_path / "events_json3")
    events.select(
        "event_id", F.col("ts").cast("string").alias("ts"), "user_id", "event_type", "value"
    ).coalesce(2).write.json(src)
    stream = (
        spark.readStream.schema(
            "event_id bigint, ts string, user_id bigint, event_type string, value double"
        )
        .json(src)
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    q = (
        click_attribution(stream, horizon="6 hours")
        .writeStream.format("memory")
        .queryName("attrib_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    streamed = sorted(map(tuple, spark.sql("SELECT * FROM attrib_test").collect()))
    batch = sorted(map(tuple, click_attribution(events, horizon="6 hours").collect()))
    assert streamed == batch
    assert len(batch) == 25  # fixture ground truth (duckdb interval join)
    # every pair respects the horizon
    got = spark.sql("SELECT * FROM attrib_test")
    bad = got.where(
        (F.col("purchase_ts") < F.col("click_ts"))
        | (F.col("purchase_ts") >= F.col("click_ts") + F.expr("INTERVAL 6 hours"))
    ).count()
    assert bad == 0


def test_streaming_jsonl_ingest_prep_equals_batch(spark, tmp_path):
    """JSONL files landing in a directory → streaming ingest →
    streaming prep == the batch pipeline over the same documents;
    a planted corrupt line is dropped, not fatal."""
    from map_reduce_using_cloud_functions_spark.sources.interchange import (
        write_corpus_jsonl,
    )
    from map_reduce_using_cloud_functions_spark.streaming.prep import (
        streaming_corpus_from_jsonl,
        streaming_corpus_prep,
    )

    docs = load_table(spark, SF, "documents").select("doc_id", "text").limit(200)
    src = str(tmp_path / "landing")
    write_corpus_jsonl(docs, src, compression="none")
    # plant a truncated line in its own file
    with open(src + "/zz_broken.json", "w") as f:
        f.write('{"doc_id": 999999, "text": "trunc\n')

    stream = streaming_corpus_from_jsonl(spark, src)
    out = streaming_corpus_prep(stream.select("doc_id", "text"), min_quality=0.2)
    q = (
        out.writeStream.format("memory")
        .queryName("jsonl_prep_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    streamed = spark.sql("SELECT * FROM jsonl_prep_test")
    batch = streaming_corpus_prep(docs, min_quality=0.2)
    # stream dedup keeps first-arrival, batch keeps dropDuplicates'
    # pick — compare on the content level: same surviving hashes and
    # same per-hash features
    s = {
        r["text_hash"]: (r["n_tokens"], r["lang_guess"], r["quality"])
        for r in streamed.collect()
    }
    b = {
        r["text_hash"]: (r["n_tokens"], r["lang_guess"], r["quality"])
        for r in batch.collect()
    }
    assert s == b and len(s) > 0
    assert streamed.where("doc_id = 999999").count() == 0


# --- crash recovery (r5): the exactly-once claim under failure injection ---
#
# start_file_index_stream claims effectively-once for the default
# replace path: foreachBatch is at-least-once, the per-document replace
# is idempotent under batch replay. These tests PROVE it by killing the
# query at the worst possible moments and restarting from the same
# checkpoint:
#   * after the index write but BEFORE the checkpoint commit (driver
#     dies between the sink write and commit log append — the batch is
#     fully applied on disk yet will be replayed on restart), and
#   * before any write (the batch is lost entirely and must be retried).
# The legacy additive merge's documented at-least-once double-count is
# pinned too, so the legacy_additive_merge docstring's replay warning
# stays honest; the DEFAULT additive path is held to exactly-once.


class _CrashAfterWrite(RuntimeError):
    pass


def _crashy_upsert(monkeypatch, crash_on_call: int, before_write: bool):
    """Patch file_index.upsert_index to raise on call #crash_on_call
    (1-based), either before or after performing the real upsert.
    Returns the call-log list."""
    from map_reduce_using_cloud_functions_spark.streaming import file_index as fi

    real = fi.upsert_index
    calls: list[int] = []

    def wrapper(spark, delta, path, *args, **kwargs):
        calls.append(len(calls) + 1)
        if before_write and len(calls) == crash_on_call:
            raise _CrashAfterWrite("injected crash BEFORE index write")
        real(spark, delta, path, *args, **kwargs)
        if not before_write and len(calls) == crash_on_call:
            raise _CrashAfterWrite("injected crash AFTER write, before commit")

    monkeypatch.setattr(fi, "upsert_index", wrapper)
    return calls


def test_crash_after_write_replays_idempotently(spark, tmp_path, monkeypatch):
    """Worst case: batch 0's index write fully lands, the driver dies
    before the checkpoint commit. Restart must replay batch 0; the
    replace-path upsert must absorb the double application — final
    index == batch build, exact counts, no lost file."""
    import pyspark.errors

    watch = tmp_path / "watch"
    watch.mkdir()
    _write(str(watch / "a.txt"), "hello world hello")
    _write(str(watch / "b.txt"), "world of spark")
    index_path = str(tmp_path / "index")
    ckpt = str(tmp_path / "ckpt")

    calls = _crashy_upsert(monkeypatch, crash_on_call=1, before_write=False)
    q = start_file_index_stream(
        spark, str(watch), index_path, ckpt, max_files_per_trigger=1
    )
    try:
        q.awaitTermination(180)
        raised = False
    except pyspark.errors.exceptions.base.PySparkException:
        raised = True
    assert raised and calls == [1], "injection did not fire on batch 0"

    # restart from the same checkpoint — batch 0 must REPLAY, then
    # batch 1 runs: 2 upserts on restart = proof the double-application
    # genuinely happened (not a silent skip of the uncommitted batch)
    monkeypatch.undo()
    from map_reduce_using_cloud_functions_spark.streaming import file_index as fi

    real = fi.upsert_index
    restart_calls: list[int] = []

    def counting(spark_, delta, path, *args, **kwargs):
        restart_calls.append(1)
        real(spark_, delta, path, *args, **kwargs)

    monkeypatch.setattr(fi, "upsert_index", counting)
    start_file_index_stream(
        spark, str(watch), index_path, ckpt, max_files_per_trigger=1
    ).awaitTermination(180)
    monkeypatch.undo()
    assert len(restart_calls) == 2, "uncommitted batch was not replayed"

    streamed = sorted(map(tuple, read_index(spark, index_path).collect()))
    batch = sorted(
        map(tuple, build_index(read_text_corpus(spark, str(watch))).collect())
    )
    assert streamed == batch, "replayed batch double-applied or lost"

    # and the stream keeps working: a later file merges incrementally
    _write(str(watch / "c.txt"), "hello again")
    start_file_index_stream(
        spark, str(watch), index_path, ckpt, max_files_per_trigger=1
    ).awaitTermination(180)
    streamed = sorted(map(tuple, read_index(spark, index_path).collect()))
    batch = sorted(
        map(tuple, build_index(read_text_corpus(spark, str(watch))).collect())
    )
    assert streamed == batch


def test_crash_before_write_loses_nothing(spark, tmp_path, monkeypatch):
    """Driver dies before the batch's write starts: the batch must be
    retried on restart — no lost file."""
    import pyspark.errors

    watch = tmp_path / "watch"
    watch.mkdir()
    _write(str(watch / "a.txt"), "alpha beta")
    _write(str(watch / "b.txt"), "beta gamma")
    index_path = str(tmp_path / "index")
    ckpt = str(tmp_path / "ckpt")

    calls = _crashy_upsert(monkeypatch, crash_on_call=1, before_write=True)
    q = start_file_index_stream(
        spark, str(watch), index_path, ckpt, max_files_per_trigger=1
    )
    try:
        q.awaitTermination(180)
        raised = False
    except pyspark.errors.exceptions.base.PySparkException:
        raised = True
    assert raised and calls == [1]
    assert not os.path.exists(index_path), "crash-before-write wrote anyway"

    monkeypatch.undo()
    start_file_index_stream(
        spark, str(watch), index_path, ckpt, max_files_per_trigger=1
    ).awaitTermination(180)
    streamed = sorted(map(tuple, read_index(spark, index_path).collect()))
    batch = sorted(
        map(tuple, build_index(read_text_corpus(spark, str(watch))).collect())
    )
    assert streamed == batch


def _crashy_additive_delta(monkeypatch, crash_on_call: int, before_write: bool):
    """Patch file_index.write_additive_delta to raise on call
    #crash_on_call (1-based), before or after the real write."""
    from map_reduce_using_cloud_functions_spark.streaming import file_index as fi

    real = fi.write_additive_delta
    calls: list[int] = []

    def wrapper(spark, delta, path, batch_id, **kwargs):
        calls.append(batch_id)
        if before_write and len(calls) == crash_on_call:
            raise _CrashAfterWrite("injected crash BEFORE delta write")
        real(spark, delta, path, batch_id, **kwargs)
        if not before_write and len(calls) == crash_on_call:
            raise _CrashAfterWrite("injected crash AFTER delta write, before commit")

    monkeypatch.setattr(fi, "write_additive_delta", wrapper)
    return calls


def test_additive_replay_is_exactly_once(spark, tmp_path, monkeypatch):
    """r5 verdict task 3: the DEFAULT additive path must survive the
    same kill-after-write-before-commit injection the replace path
    does. Batch 1's delta write fully lands, the driver dies before the
    checkpoint commit; restart replays batch 1, which overwrites its
    own (abatch=1, first=x) partitions — final counts equal ONE
    application, not two."""
    import pyspark.errors

    watch = tmp_path / "watch"
    watch.mkdir()
    _write(str(watch / "a.txt"), "hello hello")
    _write(str(watch / "b.txt"), "hello world")
    index_path = str(tmp_path / "index")
    ckpt = str(tmp_path / "ckpt")

    # batch 0 full-builds the base; the injected crash fires on the
    # FIRST delta write (batch 1), after the data landed
    calls = _crashy_additive_delta(monkeypatch, crash_on_call=1, before_write=False)
    q = start_file_index_stream(
        spark, str(watch), index_path, ckpt, additive=True, max_files_per_trigger=1
    )
    try:
        q.awaitTermination(180)
        raised = False
    except pyspark.errors.exceptions.base.PySparkException:
        raised = True
    assert raised and calls == [1], "injection did not fire on the delta batch"

    monkeypatch.undo()
    from map_reduce_using_cloud_functions_spark.streaming import file_index as fi

    replays: list[int] = []
    real = fi.write_additive_delta

    def counting(spark_, delta, path, batch_id, **kwargs):
        replays.append(batch_id)
        real(spark_, delta, path, batch_id, **kwargs)

    monkeypatch.setattr(fi, "write_additive_delta", counting)
    start_file_index_stream(
        spark, str(watch), index_path, ckpt, additive=True, max_files_per_trigger=1
    ).awaitTermination(180)
    monkeypatch.undo()
    assert replays == [1], "uncommitted delta batch was not replayed"

    got = sorted(
        (r["word"], r["document"], r["count"])
        for r in read_index(spark, index_path).collect()
    )
    assert got == [
        ("hello", "a.txt", 2),
        ("hello", "b.txt", 1),
        ("world", "b.txt", 1),
    ], "replayed additive delta double-applied or lost"

    # the stream keeps working, and compaction folds the delta tail
    # into the base without changing the logical table
    _write(str(watch / "c.txt"), "hello again")
    start_file_index_stream(
        spark, str(watch), index_path, ckpt, additive=True, max_files_per_trigger=1
    ).awaitTermination(180)
    from map_reduce_using_cloud_functions_spark.operators.index import (
        compact_index,
        gc_index_versions,
        pending_additive_batches,
    )

    before = sorted(map(tuple, read_index(spark, index_path).collect()))
    compact_index(spark, index_path)
    # versioned layout (the r7 stream default): the fold supersedes the
    # deltas via the commit watermark; the physical partitions await
    # lazy GC, which must reclaim every folded abatch dir
    assert pending_additive_batches(spark, index_path) == []
    gc_index_versions(spark, index_path)
    add_dir = os.path.join(index_path, "_additive")
    assert not os.path.exists(add_dir) or not [
        d for d in os.listdir(add_dir) if d.startswith("abatch=")
    ]
    assert sorted(map(tuple, read_index(spark, index_path).collect())) == before


def test_legacy_additive_merge_double_counts_as_documented(spark, tmp_path, monkeypatch):
    """The LEGACY additive merge (reference bug-parity,
    ``legacy_additive_merge=True``) is documented NOT exactly-once
    under replay — pin that: a replayed legacy batch doubles its
    counts, bit-matching the reference's own double-count semantics
    (master/main.py:112-121). If this test ever fails, the
    legacy_additive_merge docstring must be updated."""
    import pyspark.errors

    watch = tmp_path / "watch"
    watch.mkdir()
    _write(str(watch / "a.txt"), "hello hello")
    index_path = str(tmp_path / "index")
    ckpt = str(tmp_path / "ckpt")

    _crashy_upsert(monkeypatch, crash_on_call=1, before_write=False)
    q = start_file_index_stream(
        spark,
        str(watch),
        index_path,
        ckpt,
        additive=True,
        max_files_per_trigger=1,
        legacy_additive_merge=True,
    )
    try:
        q.awaitTermination(180)
    except pyspark.errors.exceptions.base.PySparkException:
        pass
    monkeypatch.undo()
    start_file_index_stream(
        spark,
        str(watch),
        index_path,
        ckpt,
        additive=True,
        max_files_per_trigger=1,
        legacy_additive_merge=True,
    ).awaitTermination(180)
    got = read_index(spark, index_path).collect()
    assert [(r["word"], r["document"], r["count"]) for r in got] == [
        ("hello", "a.txt", 4)  # 2 real + 2 replayed — the documented hazard
    ]


def test_additive_stream_auto_compacts_delta_tail(spark, tmp_path):
    """r6: compact_every folds the pending additive tail inside the
    stream's own foreachBatch — the tail stays bounded, the logical
    table is unchanged by compaction, and replace-mode upserts work
    immediately when the tail happens to be empty at shutdown."""
    from map_reduce_using_cloud_functions_spark.operators.index import (
        pending_additive_batches,
    )

    watch = tmp_path / "watch"
    watch.mkdir()
    index_path = str(tmp_path / "index")
    ckpt = str(tmp_path / "ckpt")
    for i in range(7):
        _write(str(watch / f"d{i}.txt"), f"alpha w{i} w{i} shared")

    start_file_index_stream(
        spark,
        str(watch),
        index_path,
        ckpt,
        additive=True,
        max_files_per_trigger=1,
        compact_every=2,
    ).awaitTermination(300)

    # batch 0 full-builds; batches 1..6 write deltas with compaction at
    # tail length 2 — the tail can never exceed compact_every at rest
    pending = pending_additive_batches(spark, index_path)
    assert len(pending) < 2, pending

    batch = build_index(
        read_text_corpus(spark, str(watch))
    )
    assert sorted(map(tuple, read_index(spark, index_path).collect())) == sorted(
        map(tuple, batch.collect())
    )


def test_pending_additive_batches_listing(spark, tmp_path):
    from map_reduce_using_cloud_functions_spark.operators.index import (
        compact_index,
        pending_additive_batches,
        write_additive_delta,
        write_index,
    )

    path = str(tmp_path / "idx")
    mk = lambda doc, text: build_index(
        spark.createDataFrame([(doc, text)], "document string, text string")
    )
    write_index(mk("a.txt", "one two"), path)
    assert pending_additive_batches(spark, path) == []
    write_additive_delta(spark, mk("b.txt", "one"), path, 3)
    write_additive_delta(spark, mk("c.txt", "two"), path, 11)
    assert pending_additive_batches(spark, path) == [3, 11]
    compact_index(spark, path)
    assert pending_additive_batches(spark, path) == []


def test_compact_every_rejected_outside_default_additive(spark, tmp_path):
    import pytest

    with pytest.raises(ValueError, match="compact_every/compact_tail_ratio apply only"):
        start_file_index_stream(
            spark,
            str(tmp_path),
            str(tmp_path / "i"),
            str(tmp_path / "c"),
            additive=False,
            compact_every=3,
        )


# --- r7: batch-0 replay window, checkpoint binding, size-based compaction ---


def test_crash_on_batch0_full_build_replays_as_noop(spark, tmp_path, monkeypatch):
    """r6 ADVICE (high): the FIRST batch's full build lands, the driver
    dies before the checkpoint commit. The replayed batch 0 finds the
    index existing and takes the additive-delta branch — pre-r7 that
    re-applied batch 0's counts (double count). The full build now
    stamps batch 0 as the folded_through watermark in the same write,
    so the replay is a watermark no-op: final counts == ONE
    application."""
    import pyspark.errors

    from map_reduce_using_cloud_functions_spark.streaming import file_index as fi

    watch = tmp_path / "watch"
    watch.mkdir()
    _write(str(watch / "a.txt"), "hello hello world")
    _write(str(watch / "b.txt"), "world again")
    index_path = str(tmp_path / "index")
    ckpt = str(tmp_path / "ckpt")

    real_write = fi.write_index
    calls: list[int] = []

    def crashy_write(index, path, *args, **kwargs):
        calls.append(1)
        real_write(index, path, *args, **kwargs)
        raise _CrashAfterWrite("injected crash AFTER first full build, before commit")

    monkeypatch.setattr(fi, "write_index", crashy_write)
    q = start_file_index_stream(
        spark, str(watch), index_path, ckpt, additive=True, max_files_per_trigger=1
    )
    try:
        q.awaitTermination(180)
        raised = False
    except pyspark.errors.exceptions.base.PySparkException:
        raised = True
    assert raised and calls == [1], "injection did not fire on batch 0's full build"
    monkeypatch.undo()

    # restart: batch 0 REPLAYS down the additive-delta branch and must
    # hit the watermark no-op; batch 1 then applies normally
    replayed: list[int] = []
    real_delta = fi.write_additive_delta

    def counting(spark_, delta, path, batch_id, **kwargs):
        replayed.append(batch_id)
        real_delta(spark_, delta, path, batch_id, **kwargs)

    monkeypatch.setattr(fi, "write_additive_delta", counting)
    start_file_index_stream(
        spark, str(watch), index_path, ckpt, additive=True, max_files_per_trigger=1
    ).awaitTermination(180)
    monkeypatch.undo()
    assert 0 in replayed, "batch 0 was not replayed through the delta branch"

    got = sorted(map(tuple, read_index(spark, index_path).collect()))
    batch = sorted(
        map(tuple, build_index(read_text_corpus(spark, str(watch))).collect())
    )
    assert got == batch, "replayed first batch double-applied or lost"


def test_fresh_checkpoint_against_existing_table_raises(spark, tmp_path):
    """r6 verdict task 2 + ADVICE: a NEW stream (fresh checkpoint, batch
    ids restarting at 0) pointed at a table another checkpoint built
    must be REFUSED — pre-r7 its colliding ids were silently dropped
    behind a warning."""
    import pyspark.errors
    import pytest

    watch = tmp_path / "watch"
    watch.mkdir()
    _write(str(watch / "a.txt"), "alpha beta")
    _write(str(watch / "b.txt"), "beta gamma")
    index_path = str(tmp_path / "index")

    start_file_index_stream(
        spark,
        str(watch),
        index_path,
        str(tmp_path / "ckpt1"),
        additive=True,
        max_files_per_trigger=1,
    ).awaitTermination(180)
    before = sorted(map(tuple, read_index(spark, index_path).collect()))

    _write(str(watch / "c.txt"), "gamma delta")
    q = start_file_index_stream(
        spark,
        str(watch),
        index_path,
        str(tmp_path / "ckpt2"),  # fresh checkpoint: ids restart at 0
        additive=True,
        max_files_per_trigger=1,
    )
    with pytest.raises(
        pyspark.errors.exceptions.base.PySparkException,
        match="bound to streaming checkpoint",
    ):
        q.awaitTermination(180)
    # and nothing was silently dropped OR applied by the refused stream
    assert sorted(map(tuple, read_index(spark, index_path).collect())) == before

    # the ORIGINAL checkpoint still works and picks up the new file
    start_file_index_stream(
        spark,
        str(watch),
        index_path,
        str(tmp_path / "ckpt1"),
        additive=True,
        max_files_per_trigger=1,
    ).awaitTermination(180)
    got = sorted(map(tuple, read_index(spark, index_path).collect()))
    batch = sorted(
        map(tuple, build_index(read_text_corpus(spark, str(watch))).collect())
    )
    assert got == batch


def test_additive_stream_size_based_compaction(spark, tmp_path):
    """r6 verdict task 5: compact_tail_ratio folds when the delta tail's
    BYTES reach the configured fraction of the base — with same-sized
    files the ratio-0.9 trigger fires repeatedly (each batch's delta is
    comparable to the base), keeping the tail short, and the logical
    table stays equal to the batch build."""
    from map_reduce_using_cloud_functions_spark.operators.index import (
        pending_additive_batches,
    )

    watch = tmp_path / "watch"
    watch.mkdir()
    index_path = str(tmp_path / "index")
    ckpt = str(tmp_path / "ckpt")
    for i in range(5):
        _write(str(watch / f"d{i}.txt"), f"alpha w{i} w{i} shared " * 20)

    start_file_index_stream(
        spark,
        str(watch),
        index_path,
        ckpt,
        additive=True,
        max_files_per_trigger=1,
        compact_tail_ratio=0.9,
    ).awaitTermination(300)

    # every delta is ~the base's size, so each batch trips the ratio:
    # at rest the pending tail must be compacted away
    assert pending_additive_batches(spark, index_path) == []
    batch = build_index(read_text_corpus(spark, str(watch)))
    assert sorted(map(tuple, read_index(spark, index_path).collect())) == sorted(
        map(tuple, batch.collect())
    )


def test_unbound_table_with_passed_watermark_refuses_fresh_ids(spark, tmp_path):
    """Adoption hardening: a table with NO checkpoint binding (pre-r7,
    or binding lost) whose folded_through watermark has passed the
    incoming ids must REFUSE the colliding batch — an adopting stream
    has not proven the id is a replay, so it must not get the silent
    no-op. (A matched binding is what buys allow_replayed_ids.)"""
    import pyspark.errors
    import pytest

    from map_reduce_using_cloud_functions_spark.operators import index as ix

    watch = tmp_path / "watch"
    watch.mkdir()
    _write(str(watch / "a.txt"), "alpha beta")
    index_path = str(tmp_path / "index")

    # pre-built, UNBOUND table whose watermark is already past id 0
    ix.write_index(
        build_index(
            spark.createDataFrame(
                [("old.txt", "old words")], "document string, text string"
            )
        ),
        index_path,
        versioned=True,
        folded_through=5,
    )
    before = sorted(map(tuple, ix.read_index(spark, index_path).collect()))

    q = start_file_index_stream(
        spark,
        str(watch),
        index_path,
        str(tmp_path / "fresh_ckpt"),
        additive=True,
        max_files_per_trigger=1,
    )
    with pytest.raises(
        pyspark.errors.exceptions.base.PySparkException,
        match="folded_through watermark",
    ):
        q.awaitTermination(180)
    # refused loudly; nothing dropped, nothing applied, still unbound
    assert sorted(map(tuple, ix.read_index(spark, index_path).collect())) == before
    assert not os.path.exists(os.path.join(index_path, "_stream_checkpoint"))


def test_auto_compaction_default_follows_table_layout(spark, tmp_path):
    """compact_tail_ratio='auto' (the default): on the VERSIONED layout
    (where folds are crash-atomic) the tail is auto-bounded at
    tail>=base without any opt-in; on the in-place opt-out (where
    in-stream folds carry crash windows) nothing auto-compacts — the
    safety default keys off the table's ACTUAL layout."""
    from map_reduce_using_cloud_functions_spark.operators.index import (
        index_version,
        pending_additive_batches,
    )

    for versioned, expect_bounded in ((True, True), (False, False)):
        watch = tmp_path / f"watch_{versioned}"
        watch.mkdir()
        index_path = str(tmp_path / f"index_{versioned}")
        for i in range(5):
            _write(str(watch / f"d{i}.txt"), f"alpha w{i} w{i} shared " * 20)
        start_file_index_stream(
            spark,
            str(watch),
            index_path,
            str(tmp_path / f"ckpt_{versioned}"),
            additive=True,
            max_files_per_trigger=1,
            versioned=versioned,
        ).awaitTermination(300)
        pending = pending_additive_batches(spark, index_path)
        if expect_bounded:
            from map_reduce_using_cloud_functions_spark.operators.index import (
                index_version as iv,
                should_compact,
            )

            assert index_version(spark, index_path) is not None
            # the amortizing invariant at rest: at least one fold
            # happened (not all 4 deltas pending) and the residual
            # tail sits BELOW the ratio (tail < base) — the policy
            # folds exactly when the tail catches the base, never
            # leaves it unbounded
            assert len(pending) < 4, pending
            assert should_compact(spark, index_path, max_tail_ratio=1.0) is False
        else:
            assert index_version(spark, index_path) is None
            # in-place: all 4 delta batches still pending — nothing
            # auto-compacted a layout whose folds aren't crash-atomic
            assert pending == [1, 2, 3, 4], pending
        # either way the logical table equals the batch build
        batch = build_index(read_text_corpus(spark, str(watch)))
        assert sorted(map(tuple, read_index(spark, index_path).collect())) == sorted(
            map(tuple, batch.collect())
        )
