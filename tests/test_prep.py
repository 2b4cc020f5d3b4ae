"""Training-data prep operators (operators/prep.py): chunking, PII
redaction, corpus mixing — edge cases + determinism properties the
driver's fixture-level oracle can't see."""

from __future__ import annotations

import pyspark.sql.functions as F

from map_reduce_using_cloud_functions_spark.operators.prep import (
    chunk_documents,
    decontaminate,
    pack_sequences,
    redact_pii,
    sample_corpus_mix,
    upsample_strata,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


# ---------------------------------------------------------------- chunking


def test_chunking_edges(spark):
    docs = _docs(
        spark,
        [
            (0, ""),  # empty → no chunks
            (1, "one"),  # 1 token → one short chunk
            (2, " ".join(f"t{i}" for i in range(64))),  # exactly one window
            (3, " ".join(f"t{i}" for i in range(65))),  # window + 1 → 2 chunks
            (4, " ".join(f"t{i}" for i in range(200))),  # several strides
        ],
    )
    out = chunk_documents(docs, window=64, stride=48)
    got = {
        (r["doc_id"], r["chunk_id"]): r["n_tokens"] for r in out.collect()
    }
    assert not any(d == 0 for d, _ in got)  # empty doc: zero chunks
    assert got[(1, 0)] == 1
    # 64 tokens: starts at 1 and 49 → chunks of 64 and 16
    assert got[(2, 0)] == 64 and got[(2, 1)] == 16
    assert got[(3, 0)] == 64 and got[(3, 1)] == 17
    # 200 tokens: starts 1,49,97,145,193 → sizes 64,64,64,56,8
    assert [got[(4, i)] for i in range(5)] == [64, 64, 64, 56, 8]
    assert (4, 5) not in got


def test_chunking_covers_every_token_and_overlap_is_exact(spark):
    """Reconstruction property: with stride < window every token index
    is covered, and consecutive chunks overlap by exactly
    window - stride tokens (except the short tail)."""
    n = 150
    docs = _docs(spark, [(0, " ".join(f"w{i}" for i in range(n)))])
    rows = sorted(
        chunk_documents(docs, window=64, stride=48).collect(),
        key=lambda r: r["chunk_id"],
    )
    for i, r in enumerate(rows):
        start = i * 48
        assert r["n_tokens"] == min(64, n - start)
    assert rows[-1]["chunk_id"] == (n - 1) // 48


def test_chunk_hash_keys_exact_chunk_dedup(spark):
    """Identical chunk text ⇒ identical chunk_hash (cross-document):
    the property a downstream chunk-level exact dedup relies on."""
    text = " ".join(f"t{i}" for i in range(40))
    docs = _docs(spark, [(0, text), (1, text), (2, text + " extra")])
    out = chunk_documents(docs, window=64, stride=48).collect()
    by_doc = {r["doc_id"]: r["chunk_hash"] for r in out}
    assert by_doc[0] == by_doc[1]
    assert by_doc[0] != by_doc[2]


def test_chunking_property_vs_python_reference(spark):
    """Hypothesis: for arbitrary token counts, chunk boundaries, sizes,
    and ids match the sequential Python reference implementation."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    window, stride = 16, 12

    def py_chunks(n_tokens: int) -> list[tuple[int, int]]:
        out = []
        for cid, start in enumerate(range(0, n_tokens, stride)):
            out.append((cid, min(window, n_tokens - start)))
        return out

    @settings(max_examples=12, deadline=None)
    @given(st.lists(st.integers(min_value=0, max_value=40), min_size=1, max_size=6))
    def check(sizes):
        docs = _docs(
            spark,
            [
                (i, " ".join(f"w{j}" for j in range(n)))
                for i, n in enumerate(sizes)
            ],
        )
        got = sorted(
            (r["doc_id"], r["chunk_id"], r["n_tokens"])
            for r in chunk_documents(docs, window=window, stride=stride).collect()
        )
        want = sorted(
            (i, cid, sz)
            for i, n in enumerate(sizes)
            for cid, sz in py_chunks(n)
        )
        assert got == want

    check()


# ---------------------------------------------------------------- PII


def test_pii_redaction_counts_and_text(spark):
    docs = _docs(
        spark,
        [
            (0, "mail alice@example.com and bob@corp.co.uk today"),
            (1, "call 555-867-5309 or 555.867.5309 now"),
            (2, "server at 10.0.0.1 and 192.168.1.255"),
            (3, "clean text with no pii at all"),
            (4, "mixed: x@y.io via 10.0.0.2 call 123-456-7890"),
        ],
    )
    got = {r["doc_id"]: r for r in redact_pii(docs).collect()}
    assert (got[0]["n_emails"], got[0]["n_phones"], got[0]["n_ips"]) == (2, 0, 0)
    assert (got[1]["n_emails"], got[1]["n_phones"], got[1]["n_ips"]) == (0, 2, 0)
    assert (got[2]["n_emails"], got[2]["n_phones"], got[2]["n_ips"]) == (0, 0, 2)
    assert (got[3]["n_emails"], got[3]["n_phones"], got[3]["n_ips"]) == (0, 0, 0)
    assert (got[4]["n_emails"], got[4]["n_phones"], got[4]["n_ips"]) == (1, 1, 1)
    # a no-PII doc's redacted hash equals the hash of the original text
    from map_reduce_using_cloud_functions_spark.functions.hashing import hex64

    plain = docs.where(F.col("doc_id") == 3).select(
        hex64(F.col("text")).alias("h")
    ).first()["h"]
    assert got[3]["redacted_hash"] == plain
    # a redacted doc's hash differs from the original
    dirty = docs.where(F.col("doc_id") == 0).select(
        hex64(F.col("text")).alias("h")
    ).first()["h"]
    assert got[0]["redacted_hash"] != dirty


def test_pii_redacted_text_shape(spark):
    """Redaction replaces, never deletes context: tags land where the
    match was (checked via the raw redacted string, not the hash)."""
    from map_reduce_using_cloud_functions_spark.operators.prep import (
        EMAIL_RE,
        IPV4_RE,
        PHONE_RE,
    )

    docs = _docs(spark, [(0, "from a@b.io at 10.0.0.1 dial 555-123-4567 end")])
    red = docs.select(
        F.regexp_replace(
            F.regexp_replace(
                F.regexp_replace(F.col("text"), EMAIL_RE, "<EMAIL>"),
                IPV4_RE,
                "<IP>",
            ),
            PHONE_RE,
            "<PHONE>",
        ).alias("r")
    ).first()["r"]
    assert red == "from <EMAIL> at <IP> dial <PHONE> end"


# ---------------------------------------------------------------- mixing


def _mix_docs(spark):
    rows = []
    for i in range(400):
        lang = ["en", "en", "en", "de", "es", "fr", "zh", "zh"][i % 8]
        rows.append((i, f"text {i}", lang, f"src{i % 3}"))
    return spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string"
    )


def test_corpus_mix_is_deterministic_and_rate_capped(spark):
    docs = _mix_docs(spark)
    a = sorted(r["doc_id"] for r in sample_corpus_mix(docs).collect())
    b = sorted(r["doc_id"] for r in sample_corpus_mix(docs).collect())
    assert a == b  # pure function of doc_id — idempotent across runs
    # every kept doc is a real doc, kept at most once
    assert len(a) == len(set(a))


def test_corpus_mix_hits_target_proportions(spark):
    """Strata larger than their target get down-sampled toward the
    weight; strata at-or-under target are kept whole (rate capped 1)."""
    docs = _mix_docs(spark)
    kept = sample_corpus_mix(
        docs,
        weights={"en": 0.5, "de": 0.125, "es": 0.125, "fr": 0.125, "zh": 0.125},
        budget_frac=0.5,
    )
    counts = {
        r["stratum"]: r["n"]
        for r in kept.groupBy("stratum").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    # en: 150 docs, target 0.5*200=100 → downsampled to ~100 (hash noise)
    assert 80 <= counts["en"] <= 120
    # de: 50 docs, target 25 → ~25
    assert 15 <= counts["de"] <= 35
    # zh: 100 docs, target 25 → ~25
    assert 15 <= counts["zh"] <= 35


def test_corpus_mix_unknown_stratum_dropped(spark):
    docs = spark.createDataFrame(
        [(1, "t", "xx", "s0"), (2, "t", "en", "s0")],
        "doc_id bigint, text string, lang string, source string",
    )
    kept = sample_corpus_mix(docs, weights={"en": 1.0}, budget_frac=1.0)
    assert [r["doc_id"] for r in kept.collect()] == [2]


# ---------------------------------------------------------- decontamination


def test_decontaminate_flags_shared_ngrams(spark):
    eval_text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    bench = _docs(spark, [(100, eval_text)])
    train = _docs(
        spark,
        [
            # Leading 8-gram of the eval doc embedded mid-document.
            (1, "intro words alpha beta gamma delta epsilon zeta eta theta tail"),
            (2, "totally unrelated text with plenty of words to go around here"),
            # Shares only a 7-token window (gamma..iota broken by X) → clean.
            (3, "alpha beta gamma delta epsilon zeta eta X iota kappa"),
            (4, "short doc"),  # shorter than n → clean by construction
        ],
    )
    out = {r["doc_id"]: r for r in decontaminate(train, bench, n=8).collect()}
    assert set(out) == {1, 2, 3, 4}
    assert out[1]["contaminated"] and out[1]["n_hit_grams"] == 1
    assert not out[2]["contaminated"] and out[2]["n_hit_grams"] == 0
    assert not out[3]["contaminated"]
    assert not out[4]["contaminated"]


def test_decontaminate_counts_distinct_grams_and_broadcasts(spark):
    # A doc repeating the same contaminated 8-gram counts it ONCE.
    gram = "a b c d e f g h"
    bench = _docs(spark, [(9, gram)])
    train = _docs(spark, [(1, f"{gram} zz {gram}")])
    res = decontaminate(train, bench, n=8)
    assert res.collect()[0]["n_hit_grams"] == 1
    # The benchmark gram set must probe map-side (broadcast), never
    # shuffling the corpus gram stream.
    assert "BroadcastHashJoin" in res._jdf.queryExecution().executedPlan().toString()


# ---------------------------------------------------------------- shuffle


def test_deterministic_shuffle_is_a_stable_permutation(spark):
    from map_reduce_using_cloud_functions_spark.operators.prep import (
        deterministic_shuffle,
    )

    docs = _docs(spark, [(i, f"text {i}") for i in range(100)])
    a = [r["doc_id"] for r in deterministic_shuffle(docs).collect()]
    b = [r["doc_id"] for r in deterministic_shuffle(docs.repartition(13)).collect()]
    assert a == b  # same permutation regardless of partitioning
    assert sorted(a) == list(range(100))  # it IS a permutation
    assert a != list(range(100))  # and not the identity
    # a different salt gives a different permutation
    c = [r["doc_id"] for r in deterministic_shuffle(docs, salt="|run2").collect()]
    assert c != a and sorted(c) == list(range(100))


# ---------------------------------------------------------------- upsample


def test_upsample_integer_epochs_exact(spark):
    docs = _mix_docs(spark)
    out = upsample_strata(docs, {"en": 3.0, "zh": 0.0})
    counts = {
        r["stratum"]: r["n"]
        for r in out.groupBy("stratum").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    n_en = docs.where(F.col("lang") == "en").count()
    n_de = docs.where(F.col("lang") == "de").count()
    assert counts["en"] == 3 * n_en  # exact integer repetition
    assert counts["de"] == n_de  # unlisted stratum kept once
    assert "zh" not in counts  # weight 0 drops the stratum
    # epochs are dense 0..2 for en, 0 for de
    en_epochs = sorted(
        r["epoch"]
        for r in out.where(F.col("stratum") == "en")
        .select("epoch")
        .distinct()
        .collect()
    )
    assert en_epochs == [0, 1, 2]


def test_upsample_fractional_epoch_rate_and_determinism(spark):
    docs = _mix_docs(spark)
    out = upsample_strata(docs, {"en": 1.4})
    n_en = docs.where(F.col("lang") == "en").count()
    extra = out.where((F.col("stratum") == "en") & (F.col("epoch") == 1)).count()
    # ~40% of en docs get a second epoch (hash noise at n=150)
    assert 0.25 * n_en <= extra <= 0.55 * n_en
    a = sorted(map(tuple, out.collect()))
    b = sorted(map(tuple, upsample_strata(docs, {"en": 1.4}).collect()))
    assert a == b  # deterministic replica set across runs


def test_upsample_composes_with_packing(spark):
    """The mixing story end-to-end: upsample replicates rows with
    distinct epochs, so a downstream consumer (e.g. packing keyed by
    (doc_id, epoch)) sees every replica."""
    docs = _mix_docs(spark)
    out = upsample_strata(docs, {"de": 2.0})
    per_doc = (
        out.where(F.col("stratum") == "de")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n"), F.countDistinct("epoch").alias("e"))
        .collect()
    )
    assert all(r["n"] == 2 and r["e"] == 2 for r in per_doc)


# ---------------------------------------------------------------- packing


def test_pack_sequences_matches_python_prefix_sum(spark):
    """The two-phase distributed prefix sum must equal the sequential
    concat-and-split: offsets are the running sum of token counts in
    doc_id order, bins are offset // seq_len."""
    sizes = [5, 0, 17, 3, 2048, 1, 100, 0, 7]  # incl. empty docs
    docs = _docs(
        spark,
        [(i, " ".join(f"w{j}" for j in range(n))) for i, n in enumerate(sizes)],
    )
    got = {
        r["doc_id"]: (r["n_tokens"], r["global_offset"], r["first_bin"], r["last_bin"])
        for r in pack_sequences(docs, seq_len=16, n_blocks=4).collect()
    }
    off = 0
    for i, n in enumerate(sizes):
        if n == 0:
            assert i not in got  # empty docs never enter the stream
            continue
        assert got[i] == (n, off, off // 16, (off + n - 1) // 16), f"doc {i}"
        off += n


def test_pack_sequences_block_count_invariance(spark):
    """The prefix telescopes: any block count gives the same offsets —
    the property that lets a cluster pick n_blocks by hardware."""
    docs = _docs(
        spark,
        [(i * 7, " ".join(f"w{j}" for j in range(1 + i % 13))) for i in range(60)],
    )
    base = sorted(map(tuple, pack_sequences(docs, seq_len=32, n_blocks=1).collect()))
    for nb in (3, 8, 64):
        assert base == sorted(
            map(tuple, pack_sequences(docs, seq_len=32, n_blocks=nb).collect())
        )


def test_pack_sequences_empty_corpus(spark):
    docs = _docs(spark, [(0, ""), (1, "")])
    out = pack_sequences(docs)
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == [
        "doc_id", "n_tokens", "global_offset", "first_bin", "last_bin",
    ]


def test_corpus_mix_partition_invariance(spark):
    """Same sample regardless of input partitioning — the determinism
    that makes retries/stragglers safe on a real cluster."""
    docs = _mix_docs(spark)
    base = sorted(r["doc_id"] for r in sample_corpus_mix(docs).collect())
    shuffled = sorted(
        r["doc_id"] for r in sample_corpus_mix(docs.repartition(17)).collect()
    )
    assert base == shuffled


# ------------------------------------------------- map-only featurizer


def test_text_features_matches_groupby_twins(spark):
    from map_reduce_using_cloud_functions_spark.operators.text_analysis import (
        language_guess,
        quality_score,
        text_features,
        text_stats,
    )
    from map_reduce_using_cloud_functions_spark.sources import load_table

    d = load_table(spark, "/root/testdata/sf0.001", "documents")
    f = {r["doc_id"]: r for r in text_features(d).collect()}
    s = {r["doc_id"]: r for r in text_stats(d).collect()}
    q = {r["doc_id"]: r["quality"] for r in quality_score(d).collect()}
    l = {r["doc_id"]: r["lang_guess"] for r in language_guess(d).collect()}
    assert set(f) == set(s)
    for k, row in f.items():
        for c in ("n_tokens", "n_distinct", "avg_token_len", "stopword_ratio", "digit_ratio"):
            assert row[c] == s[k][c], (k, c)
        assert row["quality"] == q[k]
        assert row["lang_guess"] == l[k]


def test_text_features_is_shuffle_free(spark):
    from map_reduce_using_cloud_functions_spark.operators.text_analysis import (
        text_features,
    )
    from map_reduce_using_cloud_functions_spark.sources import load_table

    d = load_table(spark, "/root/testdata/sf0.001", "documents")
    plan = text_features(d)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # map-only: one scan, zero shuffles


def test_decontaminate_property_vs_python_reference(spark):
    """Hypothesis: for arbitrary small corpora, flags and hit counts
    match a sequential Python n-gram-overlap reference built on the
    same tokenizer."""
    import re

    from hypothesis import given, settings
    from hypothesis import strategies as st

    n = 3

    def py_tokens(text: str) -> list[str]:
        processed = re.sub(r"\s+", " ", text).lower()
        processed = re.sub(r"[^a-z0-9\s]", "", processed)
        return processed.split()

    def py_grams(text: str) -> set[str]:
        t = py_tokens(text)
        return {" ".join(t[i : i + n]) for i in range(len(t) - n + 1)}

    word = st.sampled_from(["alpha", "beta", "gamma", "delta", "x9", "zz"])
    doc = st.lists(word, min_size=0, max_size=7).map(" ".join)

    @settings(max_examples=10, deadline=None)
    @given(st.lists(doc, min_size=1, max_size=4), st.lists(doc, min_size=1, max_size=3))
    def check(train_texts, bench_texts):
        train = _docs(spark, list(enumerate(train_texts)))
        bench = _docs(spark, [(100 + i, t) for i, t in enumerate(bench_texts)])
        got = {
            r["doc_id"]: (r["n_hit_grams"], r["contaminated"])
            for r in decontaminate(train, bench, n=n).collect()
        }
        bench_set = set().union(*(py_grams(t) for t in bench_texts))
        want = {
            i: (len(py_grams(t) & bench_set), len(py_grams(t) & bench_set) > 0)
            for i, t in enumerate(train_texts)
        }
        assert got == want

    check()


def test_pack_sequences_in_shuffled_order(spark):
    """shuffle → pack composition: packing keyed on shuffle_key must
    equal the sequential prefix sum over docs sorted by that key."""
    from map_reduce_using_cloud_functions_spark.operators.prep import (
        deterministic_shuffle,
        pack_sequences,
    )

    docs = _docs(spark, [(i, " ".join(f"w{j}" for j in range(i % 7 + 1))) for i in range(50)])
    shuffled = deterministic_shuffle(docs)
    got = {
        r["doc_id"]: (r["global_offset"], r["n_tokens"])
        for r in pack_sequences(shuffled, seq_len=8, order_col="shuffle_key").collect()
    }
    order = [
        (r["doc_id"], r["shuffle_key"]) for r in shuffled.collect()
    ]  # collect preserves the sort
    running = 0
    for doc_id, _ in order:
        n = doc_id % 7 + 1
        assert got[doc_id] == (running, n), doc_id
        running += n
    # and the default doc_id packing is unchanged by the new param
    plain = {
        r["doc_id"]: r["global_offset"]
        for r in pack_sequences(docs, seq_len=8).collect()
    }
    running = 0
    for i in range(50):
        assert plain[i] == running
        running += i % 7 + 1


# ------------------------------------------------- perplexity filter


def test_unigram_logprob_matches_duckdb_and_flags_gibberish(spark):
    import duckdb

    from map_reduce_using_cloud_functions_spark.operators.text_analysis import (
        unigram_logprob,
    )
    from map_reduce_using_cloud_functions_spark.sources import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    got = {
        r["doc_id"]: (r["n_tokens"], r["avg_logprob"])
        for r in unigram_logprob(docs).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM '/root/testdata/sf0.001/documents.parquet'"
    )
    want = {
        r[0]: (r[1], r[2])
        for r in con.sql(
            """
            WITH tok AS (
              SELECT doc_id, unnest(list_filter(string_split(
                regexp_replace(lower(regexp_replace(text, '\\s+', ' ', 'g')),
                               '[^a-z0-9 ]', '', 'g'), ' '), w -> w <> '')) AS word
              FROM documents
            ),
            vocab AS (SELECT word, count(*) AS wc FROM tok GROUP BY 1),
            tot AS (SELECT sum(wc) AS n_ref, count(*) AS v_ref FROM vocab),
            postings AS (SELECT doc_id, word, count(*) AS cnt FROM tok GROUP BY 1, 2)
            SELECT doc_id, sum(cnt)::BIGINT,
                   round(sum(ln((wc + 1) / (n_ref + v_ref)) * cnt) / sum(cnt), 6)
            FROM postings JOIN vocab USING (word) CROSS JOIN tot
            GROUP BY doc_id
            """
        ).fetchall()
    }
    assert got == want
    # gibberish scores lower than a doc built from corpus-common words
    from map_reduce_using_cloud_functions_spark.operators.text_analysis import (
        unigram_logprob as ul,
    )

    probe = spark.createDataFrame(
        [(900001, "the the and of to in is that with the"),
         (900002, "zxqv wkjx qpzm vvtt hjkq zzzz xqxq mmnn ppqq rrss")],
        "doc_id bigint, text string",
    )
    scored = {
        r["doc_id"]: r["avg_logprob"]
        for r in ul(probe, reference=docs).collect()
    }
    assert scored[900001] > scored[900002]


def test_training_corpus_lm_gate(spark):
    """The optional perplexity gate only removes rows (monotone) and
    with a permissive threshold changes nothing."""
    from map_reduce_using_cloud_functions_spark.operators.pipelines import (
        prepare_training_corpus,
    )
    from map_reduce_using_cloud_functions_spark.sources import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    base = {r["doc_id"] for r in prepare_training_corpus(docs, 0.35).collect()}
    loose = {
        r["doc_id"]
        for r in prepare_training_corpus(docs, 0.35, min_avg_logprob=-1e9).collect()
    }
    assert loose == base
    tight = {
        r["doc_id"]
        for r in prepare_training_corpus(docs, 0.35, min_avg_logprob=-3.41).collect()
    }
    assert tight <= base and len(tight) < len(base)


# ---------------------------------------------------------- winnowing


def test_winnow_matches_python_reference_and_guarantee(spark):
    import hashlib
    import re as _re

    from map_reduce_using_cloud_functions_spark.operators.text_analysis import (
        winnow_fingerprints,
        winnow_pairs,
    )

    gram, window = 8, 4

    def py_norm(t: str) -> str:
        return _re.sub(r"[^a-z0-9 ]", "", _re.sub(r"\s+", " ", t).lower())

    def py_hex64(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    def py_winnow(t: str) -> list[int]:
        n = py_norm(t)
        gs = [n[i : i + gram] for i in range(max(len(n) - gram + 1, 1))]
        hs = [py_hex64(g) for g in gs]
        mins = [min(hs[i : i + window]) for i in range(max(len(hs) - window + 1, 1))]
        return sorted(set(mins))

    shared = "a very distinctive shared sentence fragment here"
    rows = [
        (0, f"prefix one {shared} suffix alpha"),
        (1, f"other beginning {shared} different tail"),
        (2, "entirely unrelated content with nothing in common at all zz"),
    ]
    docs = _docs(spark, rows)
    got = {r["doc_id"]: list(r["fps"]) for r in winnow_fingerprints(docs, gram, window).collect()}
    for i, t in rows:
        assert got[i] == py_winnow(t), i
    # the winnowing guarantee: docs 0 and 1 share the long substring →
    # at least one common fingerprint → they pair; doc 2 pairs with no one
    pairs = {
        (r["doc_a"], r["doc_b"]): r["shared_fps"]
        for r in winnow_pairs(docs, gram, window).collect()
    }
    assert (0, 1) in pairs and pairs[(0, 1)] >= 1
    assert not any(2 in p for p in pairs)


# ------------------------------------------------- hashed doc vectors


def test_hashed_doc_vectors_track_token_overlap(spark):
    from map_reduce_using_cloud_functions_spark.functions.vectors import cosine
    from map_reduce_using_cloud_functions_spark.operators.text_analysis import (
        hashed_doc_vectors,
    )

    docs = _docs(
        spark,
        [
            (0, "the quick brown fox jumps over the lazy dog"),
            (1, "the quick brown wolf jumps over the lazy cat"),
            (2, "numerical linear algebra kernels saturate memory bandwidth"),
        ],
    )
    v = hashed_doc_vectors(docs, dim=32)
    a = v.where(F.col("doc_id") == 0).select(F.col("embedding").alias("ea"))
    pairs = (
        a.crossJoin(v.where(F.col("doc_id") != 0))
        .select("doc_id", cosine(F.col("ea"), F.col("embedding")).alias("c"))
    )
    got = {r["doc_id"]: r["c"] for r in pairs.collect()}
    assert got[1] > got[2]  # 7/9 shared tokens beats 0 shared
    # deterministic + partition-invariant
    base = sorted(map(tuple, v.collect()))
    again = sorted(map(tuple, hashed_doc_vectors(docs.repartition(5), dim=32).collect()))
    assert base == again


def test_hashed_doc_vectors_feed_the_ann_toolbox(spark):
    """Composition: text → hashed vectors → quantize + brute-force ANN
    runs end-to-end (the no-external-model embedding path)."""
    from map_reduce_using_cloud_functions_spark.operators.similarity import (
        brute_force_topk,
        quantize_embeddings,
    )
    from map_reduce_using_cloud_functions_spark.operators.text_analysis import (
        hashed_doc_vectors,
    )

    docs = _docs(spark, [(i, f"token{i} token{i+1} token{i+2} shared common words") for i in range(20)])
    vecs = hashed_doc_vectors(docs, dim=32).withColumnRenamed("doc_id", "vec_id")
    q = vecs.where(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_embedding")
    )
    top = brute_force_topk(vecs, q, k=3).collect()
    assert len(top) == 6  # 2 queries x 3 neighbors
    assert quantize_embeddings(vecs).count() == 20


def test_dedup_chunks_keeps_one_copy_of_boilerplate(spark):
    from map_reduce_using_cloud_functions_spark.operators.prep import dedup_chunks

    boiler = " ".join(f"b{i}" for i in range(64))  # exactly one window
    docs = _docs(
        spark,
        [
            (0, boiler),                       # chunk == boilerplate
            (1, boiler),                       # exact repeat across docs
            (2, " ".join(f"u{i}" for i in range(30))),  # unique short doc
        ],
    )
    out = [(r["doc_id"], r["chunk_id"]) for r in dedup_chunks(docs).collect()]
    # expected: the (doc_id, chunk_id)-min survivor per distinct chunk text
    from map_reduce_using_cloud_functions_spark.operators.prep import chunk_documents

    chunks = chunk_documents(docs).collect()
    by_hash = {}
    for r in sorted(chunks, key=lambda r: (r["doc_id"], r["chunk_id"])):
        by_hash.setdefault(r["chunk_hash"], (r["doc_id"], r["chunk_id"]))
    want = sorted(by_hash.values())
    assert sorted(out) == want


def test_full_schedule_composition_is_deterministic(spark):
    """The whole README pipeline chained end-to-end — quality+dedup
    gate → mixture sample → fractional epochs → deterministic shuffle →
    pack in shuffled order — must produce identical output regardless
    of input partitioning (the retry/idempotency property, composed)."""
    from map_reduce_using_cloud_functions_spark.operators.pipelines import (
        prepare_training_corpus,
    )
    from map_reduce_using_cloud_functions_spark.operators.prep import (
        deterministic_shuffle,
        pack_sequences,
        sample_corpus_mix,
        upsample_strata,
    )
    from map_reduce_using_cloud_functions_spark.sources import load_table

    def run(docs):
        gate = prepare_training_corpus(docs, min_quality=0.35).select("doc_id")
        survivors = docs.join(gate, "doc_id", "left_semi")
        mixed = sample_corpus_mix(survivors, budget_frac=0.8).select("doc_id")
        kept = survivors.join(mixed, "doc_id", "left_semi")
        ups = upsample_strata(kept, {"en": 1.5})
        replicas = ups.join(docs.select("doc_id", "text"), "doc_id").withColumn(
            "replica_id",
            F.concat(F.col("doc_id").cast("string"), F.lit("#"), F.col("epoch")),
        )
        shuffled = deterministic_shuffle(replicas, key_col="replica_id")
        packed = pack_sequences(shuffled, seq_len=256, order_col="shuffle_key")
        return sorted(map(tuple, packed.collect()))

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    a = run(docs)
    b = run(docs.repartition(17))
    assert a == b and len(a) > 0


def test_decontaminate_clean_removes_flagged_docs(spark):
    from map_reduce_using_cloud_functions_spark.operators.prep import (
        decontaminate,
        decontaminate_clean,
    )

    bench = _docs(spark, [(100, "alpha beta gamma delta epsilon zeta eta theta")])
    train = _docs(
        spark,
        [
            (1, "x alpha beta gamma delta epsilon zeta eta theta y"),
            (2, "completely clean other text with enough words here"),
        ],
    )
    clean = sorted(r["doc_id"] for r in decontaminate_clean(train, bench).collect())
    assert clean == [2]
    flags = {r["doc_id"]: r["contaminated"] for r in decontaminate(train, bench).collect()}
    assert flags == {1: True, 2: False}


# ------------------------------------------------- duplicated spans


def test_duplicate_spans_planted_boilerplate(spark):
    from map_reduce_using_cloud_functions_spark.operators.prep import (
        duplicate_spans,
        strike_duplicate_spans,
    )

    boiler = "this license text is repeated verbatim in many documents here"
    uniq1 = "alpha bravo charlie delta echo foxtrot golf hotel india juliett"
    uniq2 = "kilo lima mike november oscar papa quebec romeo sierra tango"
    docs = _docs(
        spark,
        [
            (1, f"{uniq1} {boiler} {uniq2}"),
            (2, "unrelated opening words one two three four five " + boiler),
            (3, "totally unique zebra whiskey xray yankee vector matrix"),
            # the same boilerplate twice WITHIN one doc: within-doc
            # repetition must count toward min_count
            (4, f"intro words here {boiler} middle filler words {boiler} end"),
        ],
    )
    spans = {
        (r["doc_id"], r["span_start"], r["span_end"]): r["n_grams"]
        for r in duplicate_spans(docs, n=8, min_count=2).collect()
    }
    # boiler is 10 tokens → 3 grams of 8 → exactly [start, start+10)
    assert spans[(1, 10, 20)] == 3
    assert spans[(2, 8, 18)] == 3
    assert spans[(4, 3, 13)] == 3 and spans[(4, 16, 26)] == 3
    assert not any(d == 3 for d, _, _ in spans)

    out = {r["doc_id"]: r for r in strike_duplicate_spans(docs, n=8, min_count=2).collect()}
    # canonical copy = (doc_id, span_start)-minimal = doc 1: untouched
    assert out[1]["n_tokens_struck"] == 0
    assert "license" in out[1]["clean_text"]
    # every other occurrence struck, surrounding text intact
    assert out[2]["n_tokens_struck"] == 10
    assert "license" not in out[2]["clean_text"]
    assert out[2]["clean_text"].startswith("unrelated opening words")
    assert out[4]["n_tokens_struck"] == 20
    assert out[4]["clean_text"] == "intro words here middle filler words end"
    assert out[3]["n_tokens_struck"] == 0


def test_duplicate_spans_long_region_merges_to_one_span(spark):
    from map_reduce_using_cloud_functions_spark.operators.prep import (
        duplicate_spans,
    )

    region = " ".join(f"w{i}" for i in range(40))
    docs = _docs(
        spark,
        [
            (1, "prefix one two three " + region),
            (2, region + " suffix four five six"),
        ],
    )
    spans = sorted(
        map(tuple, duplicate_spans(docs, n=8, min_count=2).collect())
    )
    # every gram inside the 40-token region is duplicated → ONE maximal
    # span per doc covering exactly the region (33 grams each)
    assert spans == [(1, 4, 44, 33), (2, 0, 40, 33)]


def test_duplicate_spans_short_and_empty_docs(spark):
    from map_reduce_using_cloud_functions_spark.operators.prep import (
        duplicate_spans,
        strike_duplicate_spans,
    )

    docs = _docs(spark, [(1, ""), (2, "seven words is less than eight ok"), (3, "seven words is less than eight ok")])
    assert duplicate_spans(docs, n=8).count() == 0  # no gram fits
    out = {r["doc_id"]: r for r in strike_duplicate_spans(docs, n=8).collect()}
    assert out[1]["clean_text"] == "" and out[1]["n_tokens"] == 0
    assert out[2]["n_tokens_struck"] == 0 and out[3]["n_tokens_struck"] == 0


def test_strike_then_rescan_finds_nothing(spark):
    """Fixpoint property: after keep-one striking, no duplicated span
    remains (each span text survives exactly once)."""
    import pyspark.sql.functions as F

    from map_reduce_using_cloud_functions_spark.operators.prep import (
        duplicate_spans,
        strike_duplicate_spans,
    )

    boiler = "shared boilerplate sentence appearing in every single document today"
    docs = _docs(
        spark,
        [(i, f"doc {i} distinct preamble words {boiler} tail w{i} x{i} y{i} z{i}") for i in range(6)],
    )
    cleaned = strike_duplicate_spans(docs, n=8, min_count=2).select(
        "doc_id", F.col("clean_text").alias("text")
    )
    assert duplicate_spans(cleaned, n=8, min_count=2).count() == 0


def test_duplicate_spans_matches_duckdb(spark):
    import duckdb

    from map_reduce_using_cloud_functions_spark.operators.prep import (
        duplicate_spans,
    )
    from map_reduce_using_cloud_functions_spark.sources import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    got = sorted(map(tuple, duplicate_spans(docs, n=8, min_count=2).collect()))
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM '/root/testdata/sf0.001/documents.parquet'"
    )
    want = sorted(
        map(
            tuple,
            con.sql(
                r"""
        WITH toks AS (
          SELECT doc_id, list_filter(string_split(
            regexp_replace(lower(regexp_replace(text, '\s+', ' ', 'g')),
                           '[^a-z0-9 ]', '', 'g'), ' '), w -> w <> '') AS t
          FROM documents
        ),
        grams AS (
          SELECT doc_id, CAST(i - 1 AS INT) AS pos,
                 ('0x' || substr(md5(array_to_string(t[i:i+7], ' ')), 1, 15))::BIGINT AS gh
          FROM toks, UNNEST(range(1, len(t) - 6)) AS u(i)
        ),
        flagged AS (
          SELECT doc_id, pos FROM grams
          WHERE gh IN (SELECT gh FROM grams GROUP BY gh HAVING count(*) >= 2)
        ),
        isl AS (
          SELECT doc_id, pos,
            CASE WHEN max(pos + 8) OVER w_prev IS NULL
                   OR pos > max(pos + 8) OVER w_prev THEN 1 ELSE 0 END AS ni
          FROM flagged
          WINDOW w_prev AS (PARTITION BY doc_id ORDER BY pos
                            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        ),
        isl2 AS (
          SELECT doc_id, pos,
                 sum(ni) OVER (PARTITION BY doc_id ORDER BY pos) AS island
          FROM isl
        )
        SELECT doc_id, min(pos) AS span_start, max(pos) + 8 AS span_end,
               count(*) AS n_grams
        FROM isl2 GROUP BY doc_id, island
        """
            ).fetchall(),
        )
    )
    assert got == want and len(got) > 0


# ------------------------------------------------- repetition flags


def test_repetition_flags_planted_cases(spark):
    """Gopher-style repetition signals against hand-computed values:
    duplicated lines, a dominating 2-gram, uncapped dup-3-gram fraction,
    and degenerate (empty / single-token) docs keeping zero rows."""
    from map_reduce_using_cloud_functions_spark.operators.text_analysis import (
        repetition_flags,
    )

    docs = spark.createDataFrame(
        [
            (1, "hello world\nhello world\nunique line"),
            (2, "a b a b a b"),
            (3, ""),
            (4, "hello"),
        ],
        "doc_id bigint, text string",
    )
    rows = {r["doc_id"]: r for r in repetition_flags(docs).collect()}
    assert set(rows) == {1, 2, 3, 4}

    r1 = rows[1]
    assert r1["n_lines"] == 3
    assert r1["dup_line_frac"] == round(1 - 2 / 3, 6)
    assert r1["dup_line_char_frac"] == round(22 / 33, 6)

    r2 = rows[2]
    # toks = [a b a b a b]; norm text "a b a b a b" = 11 chars
    # 2-grams: "a b"x3 "b a"x2 -> top gram "a b", 3*3/11
    # 3-grams: "a b a"x2 "b a b"x2 -> (2*5+2*5)/11 > 1 (uncapped)
    assert r2["top_gram"] == "a b"
    assert r2["top_gram_char_frac"] == round(9 / 11, 6)
    assert r2["dup_gram_char_frac"] == round(20 / 11, 6)
    assert r2["n_lines"] == 1 and r2["dup_line_frac"] == 0.0

    for d in (3, 4):
        r = rows[d]
        assert r["dup_line_frac"] == 0.0
        assert r["dup_gram_char_frac"] == 0.0
        assert r["top_gram"] is None
        assert r["top_gram_char_frac"] == 0.0
    assert rows[3]["n_lines"] == 0
    assert rows[4]["n_lines"] == 1


def test_corpus_report_planted_strata(spark):
    """Release accounting: counts, token sums, exact percentiles, and
    the within-stratum duplicate fraction on a hand-built corpus."""
    from map_reduce_using_cloud_functions_spark.operators.text_analysis import (
        corpus_report,
    )

    docs = spark.createDataFrame(
        [
            (1, "one two three", "en", "web", 13),
            (2, "one two three", "en", "web", 13),   # exact dup of 1
            (3, "a b c d e f", "en", "web", 11),
            (4, "x y", "de", "web", 3),
        ],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    rows = {(r["source"], r["lang"]): r for r in corpus_report(docs).collect()}
    en = rows[("web", "en")]
    assert en["n_docs"] == 3
    assert en["total_tokens"] == 3 + 3 + 6
    assert en["total_chars"] == 13 + 13 + 11
    # tokens per doc: [3, 3, 6] -> exact interpolated p50 = 3.0
    assert en["p50_tokens"] == 3.0
    assert en["dup_frac"] == round(1 - 2 / 3, 6)
    de = rows[("web", "de")]
    assert de["n_docs"] == 1 and de["dup_frac"] == 0.0


def test_bigram_logprob_matches_duckdb_and_detects_word_order(spark):
    """Bigram LM: DuckDB twin agreement on the fixture, and the selling
    point over unigram — same words, scrambled order, lower score."""
    import duckdb

    from map_reduce_using_cloud_functions_spark.operators.text_analysis import (
        bigram_logprob,
    )
    from map_reduce_using_cloud_functions_spark.sources import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    got = {
        r["doc_id"]: (r["n_bigrams"], r["avg_logprob2"])
        for r in bigram_logprob(docs).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM '/root/testdata/sf0.001/documents.parquet'"
    )
    want = {
        r[0]: (r[1], r[2])
        for r in con.sql(
            """
            WITH doctoks AS (
              SELECT doc_id, list_filter(string_split(
                regexp_replace(lower(regexp_replace(text, '\\s+', ' ', 'g')),
                               '[^a-z0-9 ]', '', 'g'), ' '), w -> w <> '') AS l
              FROM documents
            ),
            bg AS (
              SELECT doc_id, (l[i] || ' ' || l[i+1]) AS b
              FROM (SELECT doc_id, l, unnest(range(1, greatest(len(l)-1,0)+1)) AS i
                    FROM doctoks WHERE len(l) >= 2)
            ),
            refb AS (SELECT b, count(*) AS bc FROM bg GROUP BY 1),
            ctx AS (SELECT string_split(b, ' ')[1] AS w1, sum(bc) AS cc
                    FROM refb GROUP BY 1),
            v AS (SELECT count(*) + 1 AS v_ctx FROM ctx),
            docb AS (SELECT doc_id, b, count(*) AS cnt FROM bg GROUP BY 1, 2)
            SELECT doc_id, sum(cnt)::BIGINT,
                   round(sum(ln((bc + 1) / (cc + v_ctx)) * cnt) / sum(cnt), 6)
            FROM docb
            JOIN refb USING (b)
            JOIN ctx ON string_split(b, ' ')[1] = w1
            CROSS JOIN v
            GROUP BY doc_id
            """
        ).fetchall()
    }
    assert got == want

    # word-order sensitivity: identical unigram distribution, different
    # order — the natural phrasing scores higher against a reference
    # built from natural phrasing
    ref = spark.createDataFrame(
        [(i, "the cat sat on the mat and the dog ran to the park")
         for i in range(50)],
        "doc_id bigint, text string",
    )
    probe = spark.createDataFrame(
        [
            (1, "the cat sat on the mat and the dog ran to the park"),
            (2, "park the to ran dog the and mat the on sat cat the"),
        ],
        "doc_id bigint, text string",
    )
    scored = {
        r["doc_id"]: r["avg_logprob2"]
        for r in bigram_logprob(probe, reference=ref).collect()
    }
    assert scored[1] > scored[2] + 1.0  # decisive margin, not noise

    # sub-2-token docs drop (no bigram evidence)
    tiny = spark.createDataFrame(
        [(1, "word"), (2, "")], "doc_id bigint, text string"
    )
    assert bigram_logprob(tiny, reference=ref).count() == 0


def test_assign_splits_properties(spark):
    """Hash splitting: exhaustive + disjoint, ratio-accurate at corpus
    scale, stable under corpus growth, validated fractions."""
    import pytest as _pytest

    from map_reduce_using_cloud_functions_spark.operators.prep import assign_splits
    from map_reduce_using_cloud_functions_spark.sources import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    n = docs.count()
    out = assign_splits(docs, {"train": 0.8, "val": 0.1, "test": 0.1})
    counts = {r["split"]: r["n"] for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert sum(counts.values()) == n  # exhaustive, one split per doc
    assert abs(counts["train"] / n - 0.8) < 0.06
    assert counts["val"] > 0 and counts["test"] > 0

    # growth stability: assignments of existing ids never move
    first = {r["doc_id"]: r["split"] for r in out.select("doc_id", "split").collect()}
    grown = docs.unionByName(
        docs.select((F.col("doc_id") + 1_000_000).alias("doc_id"), "text", "lang", "source", "n_chars")
    )
    second = {
        r["doc_id"]: r["split"]
        for r in assign_splits(grown, {"train": 0.8, "val": 0.1, "test": 0.1})
        .select("doc_id", "split")
        .collect()
    }
    assert all(second[k] == v for k, v in first.items())

    with _pytest.raises(ValueError, match="sum to 1"):
        assign_splits(docs, {"train": 0.5, "val": 0.1})


def test_fingerprints_empty_docs_dont_alias(spark):
    """Empty/punctuation-only docs fingerprint as (NULL, NULL, 0) — the
    old ''-gram gave every such doc IDENTICAL fingerprints, flooding a
    (min_fp, max_fp) bucketed dedup with false candidates."""
    from map_reduce_using_cloud_functions_spark.operators.text_analysis import (
        fingerprints,
    )

    docs = spark.createDataFrame(
        [(1, ""), (2, "!!!"), (3, "real text content here")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in fingerprints(docs).collect()}
    assert got[1]["min_fp"] is None and got[1]["max_fp"] is None
    assert got[1]["n_grams"] == 0
    assert got[2]["min_fp"] is None  # punctuation-only normalizes empty
    assert got[3]["min_fp"] is not None


def test_strip_boilerplate_lines(spark):
    """Cross-corpus line removal: a line shared by >= min_df docs is
    struck everywhere, whitespace-only lines are never counted or
    removed, untouched docs round-trip byte-identically, and the
    df count is per DISTINCT doc (a doc repeating the banner twice
    counts once toward df but loses both copies)."""
    from map_reduce_using_cloud_functions_spark.operators.prep import (
        strip_boilerplate_lines,
    )

    rows = [
        (1, "real one\nCOOKIE BANNER\nmore"),
        (2, "other\nCOOKIE BANNER\n\nfooter"),
        (3, "COOKIE BANNER\nCOOKIE BANNER\nunique"),  # repeats: df +1, removes 2
        (4, "untouched doc\n\nwith structure\n"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {
        r["doc_id"]: (r["text"], r["n_removed"])
        for r in strip_boilerplate_lines(df, min_df=3).collect()
    }
    assert got[1] == ("real one\nmore", 1)
    assert got[2] == ("other\n\nfooter", 1)
    assert got[3] == ("unique", 2)
    assert got[4] == ("untouched doc\n\nwith structure\n", 0)  # byte round-trip

    # df below threshold: nothing removed anywhere
    got4 = {
        r["doc_id"]: r["n_removed"]
        for r in strip_boilerplate_lines(df, min_df=4).collect()
    }
    assert set(got4.values()) == {0}

    # frac threshold resolves against the corpus count (4 docs * 0.75 -> 3)
    gotf = {
        r["doc_id"]: r["n_removed"]
        for r in strip_boilerplate_lines(df, max_df_frac=0.75).collect()
    }
    assert gotf == {1: 1, 2: 1, 3: 2, 4: 0}

    # payload columns ride through
    df2 = df.withColumn("lang", F.lit("en"))
    out2 = strip_boilerplate_lines(df2, min_df=3).collect()
    assert all(r["lang"] == "en" for r in out2)


def test_strip_boilerplate_all_removed_doc_yields_empty_text(spark):
    from map_reduce_using_cloud_functions_spark.operators.prep import (
        strip_boilerplate_lines,
    )

    rows = [(i, "SAME LINE") for i in range(3)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = strip_boilerplate_lines(df, min_df=3).collect()
    assert all(r["text"] == "" and r["n_removed"] == 1 for r in got)


def test_strip_boilerplate_hash_collision_keeps_rare_line(spark, monkeypatch):
    """Removal must never ride on hash equality alone: force a hash
    collision between a rare line and a true boilerplate line (by
    monkeypatching the segment hash to a constant) and check the rare
    line survives — the exact-text re-count gates removal."""
    from map_reduce_using_cloud_functions_spark.operators import prep as prep_mod

    monkeypatch.setattr(
        prep_mod, "hex64", lambda col: F.lit(7).cast("bigint")
    )  # every segment collides into one bucket
    rows = [
        (1, "BANNER\nrare gem"),
        (2, "BANNER\nalpha"),
        (3, "BANNER\nbeta"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {
        r["doc_id"]: (r["text"], r["n_removed"])
        for r in prep_mod.strip_boilerplate_lines(df, min_df=3).collect()
    }
    # only BANNER's exact df is 3; the colliding rare lines stay
    assert got[1] == ("rare gem", 1)
    assert got[2] == ("alpha", 1)
    assert got[3] == ("beta", 1)


def test_strip_boilerplate_construction_runs_one_bounded_job(spark):
    """r13 contract: constructing the operator runs ONE bounded action
    — the verified-set resolve (stats ∘ limit ∘ collect; CollectLimit's
    incremental scale-up may split it into a handful of partial jobs,
    so the pin is a small bound, not an exact count) — which also
    evaluates the default min_df (ceil of max_df_frac · n_docs) INSIDE
    that plan as a one-row aggregate (never a separate eager
    documents.count(), the pre-r7 bug)."""
    from map_reduce_using_cloud_functions_spark.operators.prep import (
        strip_boilerplate_lines,
    )

    rows = [(i, f"line {i}\nshared") for i in range(6)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    sc = spark.sparkContext
    sc.setJobGroup("bp_build", "construction = one bounded resolve action")
    try:
        out = strip_boilerplate_lines(df)  # default threshold path
    finally:
        sc.setJobGroup(None, None)
    assert 1 <= len(sc.statusTracker().getJobIdsForGroup("bp_build")) <= 8
    # the in-plan count resolved correctly:
    # ceil(0.02 * 6) = 1, floored at 2 -> "shared" (df 6) is struck
    got = {r["doc_id"]: r["n_removed"] for r in out.collect()}
    assert set(got.values()) == {1}


def test_strip_boilerplate_fallback_parity(spark, monkeypatch):
    """r13: an oversized verified set falls back to the fully lazy
    distributed plan — cap patched to 0 must produce byte-identical
    results to the bounded fast path, including the n_removed counts
    and the untouched-document round-trip."""
    from map_reduce_using_cloud_functions_spark.operators import prep as pp

    rows = [
        (i, f"unique line {i}\nshared banner\nanother {i % 3}") for i in range(9)
    ] + [(99, "no repeats here at all")]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")

    def result():
        return sorted(
            (r["doc_id"], r["text"], r["n_removed"])
            for r in pp.strip_boilerplate_lines(df, min_df=3).collect()
        )

    fast = result()
    monkeypatch.setattr(pp, "BOILERPLATE_VERIFIED_CAP", 0)
    assert result() == fast
    assert any(n > 0 for (_d, _t, n) in fast)  # something was struck
    assert (99, "no repeats here at all", 0) in fast  # round-trip
