"""Cross-engine parity fuzzer (r4 verdict task 2).

The \\x0b-whitespace and fractional-epoch divergences were each found
REACTIVELY by a hand-written probe after a red gate row. This module
finds the next class proactively: seeded-random corpora stressing the
known divergence axes —

  * Unicode whitespace and control characters (the \\s-set divergence
    family: \\x0b \\x0c \\x1c-\\x1f, NBSP, ogham/en/em spaces, LINE/PARA
    SEPARATOR, narrow NBSP, ideographic space) plus non-whitespace
    exotics (zero-width space, BOM, soft hyphen),
  * NULL / empty / separator-only text, combining diacritics, full-width
    forms, CJK/Cyrillic, embedded quotes and JSON-ish braces,
  * sub-second timestamps (incl. exact .5 rounding edges), pre-1970
    epochs, NULL timestamps,
  * JSON props with unicode keys/values, escapes, and NULLs —

written as parquet and replayed through a fast subset of the judged
Spark/DuckDB twins with the SAME canonicalization the driver's gate
uses (``tools.check_oracle.canon_rows``). Seeds are FIXED: a failure
here is a reproducible divergence, never a flake. Axes deliberately
left out (documented, not forgotten): NaN/Inf in aggregated doubles
(engines genuinely order NaN differently — a semantics choice, not a
bug) and invalid JSON fragments (get_json_object vs json_extract error
behavior is a contract decision tracked in plans/events.py).
"""

from __future__ import annotations

import json
import random

import pytest

from tools.check_oracle import canon_rows

# --- generator vocabulary: every known divergence axis --------------------

WHITESPACE = [
    " ", "\t", "\n", "\r", "\r\n", "\x0b", "\x0c", "\x1c", "\x1d",
    "\x1e", "\x1f", "\x85", "\u00a0", "\u1680", "\u2000", "\u2003",
    "\u2009", "\u200a", "\u2028", "\u2029", "\u202f", "\u205f",
    "\u3000",
]
EXOTIC_NONSPACE = ["\u200b", "\ufeff", "\u00ad"]  # NOT \s in either engine
WORDS = [
    "the", "fox", "Fox", "FOX", "don't", "state-of-the-art", "naïve",
    "café", "über", "123", "abc123", "123abc", "ＡＢＣｄｅｆ", "日本語テキスト",
    "кириллица", "mix😀emoji", "étude", "Î", "ǅungla", "ﬁnance",
    "x" * 257, "äb̈", "word​break", "quote\"inner'",
    "{brace}", "tab\\there",
]
PUNCT = ["", ".", ",", ";", "—", "…", "!!", "?!", "(", ")", '"', "'", "«»"]
LANGS = ["en", "fr", "de", "ja", None]
SOURCES = ["web", "books", "wiki", None]
EVENT_TYPES = ["click", "view", "purchase", "scroll"]
# microsecond parts hitting the rounding/truncation edges both engines
# must agree on (the r4 fractional-epoch bug lived here)
MICRO_EDGES = [0, 1, 499_999, 500_000, 500_001, 999_999]

FUZZ_DOC_QUERIES = [
    "index_build",          # the tokenizer twin — where \x0b was found
    # r9: distinct-count sketch over the tokenizer's universe — the
    # md5-hex60 hash on exotic unicode tokens, the exact decimal sum,
    # and BOTH estimator branches (tiny corpora hit linear counting,
    # whose ln is the one libm step the twins share)
    "corpus_vocab_sketch",
    "text_stats",
    "text_token_counts",
    "text_fingerprints",
    "text_quality",
    "text_language_guess",
    "dedup_exact_groups",
    # r5 widening: the hashing/banding and prep twins hold on the same
    # corpora (probed over 4 seeds before admission)
    "dedup_simhash",
    "dedup_minhash_pairs",
    "dedup_shingle_jaccard",
    "dedup_jaccard_pairs",
    "text_tfidf",
    "text_chunks",
    "text_pii_redaction",
    "sample_corpus_mix",
    # r7: cross-corpus boilerplate strip — split/trim/df/rejoin parity
    # on texts carrying unicode whitespace, NULLs, and planted dups
    "corpus_boilerplate_strip",
]
FUZZ_EVENT_QUERIES = [
    "events_tumbling_hourly",
    "events_sessionize",
    "events_pivot",
    "events_json_rollup",
    "events_asof_join",
]


def _gen_text(rng: random.Random) -> str | None:
    roll = rng.random()
    if roll < 0.04:
        return None
    if roll < 0.08:
        return ""
    if roll < 0.12:  # separator-only document
        return "".join(rng.choice(WHITESPACE) for _ in range(rng.randrange(1, 6)))
    n = rng.randrange(1, 26)
    parts = []
    for _ in range(n):
        w = rng.choice(WORDS)
        if rng.random() < 0.25:
            w = rng.choice(PUNCT) + w + rng.choice(PUNCT)
        if rng.random() < 0.08:
            w += rng.choice(EXOTIC_NONSPACE) + rng.choice(WORDS)
        parts.append(w)
        parts.append(
            "".join(rng.choice(WHITESPACE) for _ in range(rng.randrange(1, 3)))
        )
    return "".join(parts[:-1])


def _write_documents(rng: random.Random, path: str, n: int) -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    texts = [_gen_text(rng) for _ in range(n)]
    if rng.random() < 0.5:  # guarantee at least one exact-dup group
        texts[1] = texts[0]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(n), pa.int64()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array([rng.choice(LANGS) for _ in range(n)], pa.string()),
                "source": pa.array(
                    [rng.choice(SOURCES) for _ in range(n)], pa.string()
                ),
                "n_chars": pa.array(
                    [len(t) if t is not None else None for t in texts], pa.int64()
                ),
            }
        ),
        path,
    )


def _gen_props(rng: random.Random) -> str | None:
    if rng.random() < 0.12:
        return None
    d = {
        "page": rng.choice(["/home", "/naïve/路径", "/a b", "/x\"y"]),
        "n": rng.randrange(0, 1000),
    }
    if rng.random() < 0.4:
        d["ref"] = rng.choice(["ads", "organic", None])
    if rng.random() < 0.2:
        d["meta"] = {"kéy": "v l"}
    return json.dumps(d, ensure_ascii=(rng.random() < 0.5))


def _write_events(rng: random.Random, path: str, n: int) -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    base = rng.randrange(-1_000_000_000, 2_000_000_000)  # pre-1970 included
    ts, users, types, values, props = [], [], [], [], []
    for i in range(n):
        if rng.random() < 0.03:
            ts.append(None)
        else:
            if rng.random() < 0.7:  # clustered → real sessions
                sec = base + rng.randrange(0, 6 * 3600)
            else:
                sec = rng.randrange(-2_000_000_000, 2_500_000_000)
            micro = (
                rng.choice(MICRO_EDGES)
                if rng.random() < 0.5
                else rng.randrange(0, 1_000_000)
            )
            ts.append(sec * 1_000_000 + micro)
        users.append(rng.randrange(1, 12))
        types.append(rng.choice(EVENT_TYPES))
        values.append(round(rng.uniform(0, 1000), 3))
        props.append(_gen_props(rng))
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(range(n), pa.int64()),
                "ts": pa.array(ts, pa.timestamp("us")),
                "user_id": pa.array(users, pa.int64()),
                "event_type": pa.array(types, pa.string()),
                "value": pa.array(values, pa.float64()),
                "props": pa.array(props, pa.string()),
            }
        ),
        path,
    )


def _run_twins(spark, sf_dir: str, names: list[str], tables: list[str]) -> None:
    import duckdb

    import __spark_entry__ as entrymod
    from tools.extra_queries import extra_oracle_sql, extra_queries

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    qs.update(extra_queries())
    oracles.update(extra_oracle_sql())
    con = duckdb.connect()
    for t in tables:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    failures = []
    for name in names:
        sdf = qs[name](spark, sf_dir)
        sc, sr = canon_rows(sdf.columns, [tuple(r) for r in sdf.collect()])
        res = con.sql(oracles[name])
        dc, dr = canon_rows([d[0] for d in res.description], res.fetchall())
        if sc != dc:
            failures.append(f"{name}: columns spark={sc} duck={dc}")
        elif sr != dr:
            sset, dset = set(sr), set(dr)
            failures.append(
                f"{name}: {len(sr)} spark vs {len(dr)} duck rows; "
                f"spark-only={sorted(sset - dset)[:2]} "
                f"duck-only={sorted(dset - sset)[:2]}"
            )
    assert not failures, "cross-engine divergence(s):\n" + "\n".join(failures)


@pytest.mark.parametrize("seed", [11, 29, 47])
def test_fuzz_documents_parity(spark, tmp_path, seed):
    rng = random.Random(seed)
    _write_documents(rng, str(tmp_path / "documents.parquet"), 120)
    _run_twins(spark, str(tmp_path), FUZZ_DOC_QUERIES, ["documents"])


@pytest.mark.parametrize("seed", [13, 31])
def test_fuzz_events_parity(spark, tmp_path, seed):
    rng = random.Random(seed)
    _write_events(rng, str(tmp_path / "events.parquet"), 300)
    _run_twins(spark, str(tmp_path), FUZZ_EVENT_QUERIES, ["events"])


def test_tz_aware_nanos_fixture_loads(spark, tmp_path):
    """ADVICE r4 regression: a tz-aware timestamp[ns] events fixture must
    be detected by _has_nanos_column (type API, not str match) and load
    through the nanosAsLong path without failing."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from map_reduce_using_cloud_functions_spark.sources import load_table

    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([1, 2], pa.int64()),
                "ts": pa.array(
                    [1_700_000_000_000_000_000, 1_700_000_123_456_789_000],
                    pa.timestamp("ns", tz="UTC"),
                ),
                "user_id": pa.array([1, 2], pa.int64()),
                "event_type": pa.array(["click", "view"], pa.string()),
                "value": pa.array([1.0, 2.0], pa.float64()),
                "props": pa.array([None, None], pa.string()),
            }
        ),
        str(tmp_path / "events.parquet"),
    )
    df = load_table(spark, str(tmp_path), "events")
    assert dict(df.dtypes)["ts"] == "timestamp"
    got = sorted(r["ts"].isoformat() for r in df.select("ts").collect())
    assert got[0].startswith("2023-11-14")
    assert df.count() == 2


FUZZ_EMBED_QUERIES = [
    "ann_topk_bruteforce",
    "dedup_embedding_pairs",
    # r9: the semantic admission ledger probe vs the joint-sketch twin
    # on sign-boundary-hostile vectors — a fold-order divergence in
    # either the batch-side or the persisted band relation shows here
    "embedding_ledger_pairs",
    "embedding_ledger_survivors",
    "embedding_array_features",
    # r7: the banded multi-probe twins — in-plan and persisted-index —
    # on sign-boundary-hostile vectors (a fold-order divergence between
    # the engines' dot products flips band buckets and shows up here)
    "ann_topk_lsh_banded",
    "ann_topk_lsh_indexed",
    # r7: SemDeDup — planted exact dups force centroid-cosine TIES in
    # the keep rule (the vec_id tiebreak must agree across engines) and
    # mixed magnitudes stress the argmax assignment's float parity
    "semdedup_pairs",
    "semdedup_survivors",
    # r7: PQ — per-subspace argmin ties on planted exact dups and the
    # subspace-ordered double folds (recon norm, ADC) across engines
    "ann_topk_pq",
    # r8: the composed IVF-PQ — routing argmax + ADC fold parity in one
    # twin (a divergence in EITHER flips the candidate set or a rank)
    "ann_topk_ivfpq",
    # r8: the persisted SemDeDup assignment must replay the in-plan
    # argmax exactly on hostile vectors (ties + mixed magnitudes)
    "semdedup_survivors_indexed",
    # r9: residual IVF-PQ — the residual relation (element-wise v − c),
    # residual-seeded books, and the element-wise recon-norm fold add
    # three more float paths that must agree across engines; planted
    # dups force residual-argmin ties too
    "ann_topk_ivfpq_residual",
]


def _write_embeddings(rng: random.Random, path: str, n: int, dim: int = 16) -> None:
    """Random embeddings stressing float parity: mixed magnitudes
    (1e-6..1e3), negative-heavy vectors, planted near-duplicate pairs,
    exact duplicates, and sign-boundary components (values near 0 flip
    LSH sign bits between engines if the dot-product fold order ever
    diverges). Zero vectors are excluded BY CONTRACT — cosine is
    undefined on them and the engines' conventions genuinely differ
    (Spark try_divide NULL-drop vs DuckDB list_cosine_similarity -1.0;
    documented in functions/vectors.py)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    vecs: list[list[float]] = []
    for i in range(n):
        mag = rng.choice([1e-6, 1e-2, 1.0, 37.5, 1e3])
        v = [rng.uniform(-mag, mag) for _ in range(dim)]
        if all(abs(x) < 1e-12 for x in v):
            v[0] = mag  # contract: no zero vectors
        if rng.random() < 0.1 and vecs:  # planted near-dup
            src = list(vecs[rng.randrange(len(vecs))])
            v = [x + rng.uniform(-1e-5, 1e-5) for x in src]
        if rng.random() < 0.05 and vecs:  # exact dup
            v = list(vecs[rng.randrange(len(vecs))])
        vecs.append(v)
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(range(n), pa.int64()),
                "embedding": pa.array(vecs, pa.list_(pa.float32())),
                "label": pa.array([rng.randrange(0, 8) for _ in range(n)], pa.int32()),
            }
        ),
        path,
    )


@pytest.mark.parametrize("seed", [19, 37])
def test_fuzz_embeddings_parity(spark, tmp_path, seed):
    rng = random.Random(seed)
    _write_embeddings(rng, str(tmp_path / "embeddings.parquet"), 200)
    _run_twins(spark, str(tmp_path), FUZZ_EMBED_QUERIES, ["embeddings"])


FUZZ_ORDER_QUERIES = [
    "price_percentiles",
    # r9: the sketch twins on hostile orders — NULL group keys and
    # prices through the hash sample + quantile_cont/percentile
    # alignment, and the bucket-minima estimator over a distinct set
    # far below k (the linear-counting branch, fuzzed)
    "sampled_price_percentiles",
    "distinct_custkeys_sketch",
]


def _write_orders(rng: random.Random, path: str, n: int) -> None:
    """Random orders stressing percentile interpolation — the classic
    cross-engine axis (Spark percentile vs DuckDB quantile_cont):
    exact-tie clusters, strata with 1 and 2 rows (interpolation
    endpoints), mixed magnitudes, negatives, and sub-cent values."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    statuses = ["O", "F", "P", "X1", "X2"]  # X strata stay tiny
    rows_status, rows_price = [], []
    for i in range(n):
        # NULL group keys (an engine-parity axis of its own) and NULL
        # prices (skipped by percentile/sum in BOTH engines; desc window
        # ordering puts them last in both — pinned by the window fuzz)
        st = None if rng.random() < 0.04 else statuses[rng.randrange(0, 3)]
        if rng.random() < 0.05:
            price = None
        else:
            price = float(
                rng.choice(
                    [
                        round(rng.uniform(1, 1e5), 2),
                        round(rng.uniform(1, 1e5), 2),
                        12345.67,              # tie cluster
                        -round(rng.uniform(0, 100), 2),
                        rng.uniform(1e-4, 1e-2),
                        1e12,
                    ]
                )
            )
        rows_status.append(st)
        rows_price.append(price)
    rows_status += ["X1", "X2", "X2"]  # 1-row and 2-row strata
    rows_price += [42.0, 1.0, 2.0]
    m = len(rows_status)
    # midnight-aligned: o_orderdate is semantically a DATE (TPC-H), and
    # the months_between oracle bridge assumes zero time-of-day — a
    # time component is out of the column's contract, not a fuzz axis
    dates = [
        rng.choice(DATE_EDGES_US)
        if rng.random() < 0.4
        else rng.randrange(0, 11_574) * 86_400_000_000
        for _ in range(m)
    ]
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array(range(m), pa.int64()),
                "o_custkey": pa.array([rng.randrange(1, 50) for _ in range(m)], pa.int64()),
                "o_orderstatus": pa.array(rows_status, pa.string()),
                "o_totalprice": pa.array(rows_price, pa.float64()),
                "o_orderdate": pa.array(dates, pa.timestamp("us")),
                "o_orderpriority": pa.array(["1-URGENT"] * m, pa.string()),
            }
        ),
        path,
    )


@pytest.mark.parametrize("seed", [23, 41])
def test_fuzz_orders_percentile_parity(spark, tmp_path, seed):
    rng = random.Random(seed)
    _write_orders(rng, str(tmp_path / "orders.parquet"), 400)
    _run_twins(spark, str(tmp_path), FUZZ_ORDER_QUERIES, ["orders"])


FUZZ_LINEITEM_QUERIES = ["q1_pricing_summary", "order_value_statistics"]


def _write_lineitem(rng: random.Random, path: str, n: int) -> None:
    """Random lineitem stressing float-aggregation parity (sum/avg/
    stddev/corr/covar under mixed magnitudes incl. 1e9 outliers and
    sub-cent prices — fold-order sensitivity is the axis; the 4-decimal
    result rounding is the contract that absorbs it)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    rows = {
        "l_orderkey": [], "l_partkey": [], "l_suppkey": [], "l_linenumber": [],
        "l_quantity": [], "l_extendedprice": [], "l_discount": [], "l_tax": [],
        "l_returnflag": [], "l_linestatus": [], "l_shipdate": [],
    }
    for i in range(n):
        rows["l_orderkey"].append(i // 3)
        rows["l_partkey"].append(rng.randrange(1, 200))
        rows["l_suppkey"].append(rng.randrange(1, 50))
        rows["l_linenumber"].append(i % 7)
        rows["l_quantity"].append(
            float(rng.choice([1, 50, rng.randrange(1, 51), rng.randrange(1, 51)]))
        )
        rows["l_extendedprice"].append(
            rng.choice([round(rng.uniform(1, 1e5), 2), 0.01, 1e9])
        )
        rows["l_discount"].append(round(rng.uniform(0, 0.1), 2))
        rows["l_tax"].append(round(rng.uniform(0, 0.08), 2))
        rows["l_returnflag"].append(rng.choice(["A", "N", "R"]))
        rows["l_linestatus"].append(rng.choice(["O", "F"]))
        rows["l_shipdate"].append(rng.randrange(600_000_000, 1_000_000_000) * 1_000_000)
    pq.write_table(
        pa.table(
            {
                k: pa.array(v, pa.timestamp("us") if k == "l_shipdate" else None)
                for k, v in rows.items()
            }
        ),
        path,
    )


@pytest.mark.parametrize("seed", [7, 55])
def test_fuzz_lineitem_float_agg_parity(spark, tmp_path, seed):
    rng = random.Random(seed)
    _write_lineitem(rng, str(tmp_path / "lineitem.parquet"), 500)
    _run_twins(spark, str(tmp_path), FUZZ_LINEITEM_QUERIES, ["lineitem"])


@pytest.mark.parametrize("seed", [17])
def test_fuzz_streaming_prep_equals_batch(spark, tmp_path, seed):
    """Stream ≡ batch on a FUZZED corpus (the fixture-only equality in
    test_streaming can miss divergences that need hostile text):
    the composed prep pipeline over a JSON file stream must match the
    batch run on the same random documents, compared at the content
    level (dedup survivor ids are arrival-order-dependent)."""
    import pyspark.sql.functions as F

    from map_reduce_using_cloud_functions_spark.streaming.prep import (
        streaming_corpus_prep,
    )

    rng = random.Random(seed)
    texts = [_gen_text(rng) for _ in range(150)]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string"
    )
    src = str(tmp_path / "docs_json")
    docs.coalesce(3).write.json(src)
    stream = spark.readStream.schema("doc_id bigint, text string").json(src)
    q = (
        streaming_corpus_prep(stream, min_quality=0.2)
        .writeStream.format("memory")
        .queryName(f"fuzz_prep_{seed}")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    streamed = {
        r["text_hash"]: (r["n_tokens"], r["n_distinct"], r["lang_guess"], r["quality"])
        for r in spark.sql(f"SELECT * FROM fuzz_prep_{seed}").collect()
    }
    batch = {
        r["text_hash"]: (r["n_tokens"], r["n_distinct"], r["lang_guess"], r["quality"])
        for r in streaming_corpus_prep(
            docs.where(F.col("text").isNotNull()), min_quality=0.2
        ).collect()
    }
    assert streamed == batch and len(streamed) > 0


# --- TPC-H-ish relational/window axis (r5 verdict task 5) -----------------

FUZZ_DIM_QUERIES = [
    "rollup_acctbal",            # ROLLUP subtotal rows alongside data NULLs
    "nation_set_ops",            # INTERSECT / EXCEPT over overlapping keys
    "customer_order_left_join",  # left join + conditional agg over NULLs
    "customers_without_orders",  # NOT EXISTS anti-join
    "revenue_by_region",         # 4-way join chain with orphan keys
]
# window ties, percentile interpolation over NULL groups, and the
# scalar date-function battery all ride the fuzzed orders table
FUZZ_ORDER_QUERIES_WIDE = [
    "price_percentiles",
    "top_orders_per_customer",
    "scalar_function_sampler",
]

REGION_NAMES = ["AMERICA", "ASIA", "EUROPE", "AFRICA", "AMERICA"]  # dup name
NATION_NAMES = [
    "FRANCE", "GERMANY", "JAPAN", "PERÚ", "日本", "", "FRANCE",  # dup + empty
    "BRAZIL", "CANADA", "INDIA", "KENYA", "EGYPT",
]
# epoch-micro edges: pre-1970, epoch, leap days, month ends, far future
DATE_EDGES_US = [
    -86_400_000_000,              # 1969-12-31
    0,                            # 1970-01-01
    825_552_000_000_000,          # 1996-02-29 (leap)
    951_782_400_000_000,          # 2000-02-29 (century leap)
    933_379_200_000_000,          # 1999-07-31 (31-day month end)
    886_032_000_000_000,          # 1998-01-29
]


def _write_tpch_dims(rng: random.Random, dirpath: str) -> None:
    """Hostile dimension tables: duplicate group names (groups merge),
    orphan foreign keys (inner joins drop, left joins keep), NULL keys
    and NULL measures, unicode/empty names, sub-cent and 1e9 balances,
    exact-tie balances, and partial customer/supplier nation overlap so
    both INTERSECT and EXCEPT branches are non-empty."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(
        pa.table(
            {
                "r_regionkey": pa.array(range(5), pa.int32()),
                "r_name": pa.array(REGION_NAMES, pa.string()),
            }
        ),
        f"{dirpath}/region.parquet",
    )
    n_nat = len(NATION_NAMES)
    pq.write_table(
        pa.table(
            {
                "n_nationkey": pa.array(range(n_nat), pa.int32()),
                "n_name": pa.array(NATION_NAMES, pa.string()),
                # regionkey 5 exists nowhere -> orphan nations drop on join
                "n_regionkey": pa.array(
                    [rng.randrange(0, 6) for _ in range(n_nat)], pa.int32()
                ),
            }
        ),
        f"{dirpath}/nation.parquet",
    )
    n_cust = 150
    balances = [
        rng.choice(
            [
                None,
                0.0,
                -0.0,
                123.456789,        # exact tie cluster
                123.456789,
                round(rng.uniform(-1000, 10000), 2),
                1e9,
                rng.uniform(1e-4, 1e-2),
            ]
        )
        for _ in range(n_cust)
    ]
    pq.write_table(
        pa.table(
            {
                "c_custkey": pa.array(range(n_cust), pa.int64()),
                "c_name": pa.array(
                    [rng.choice(["Ann", "Ann", "Bö", "θ-cust", ""]) for _ in range(n_cust)],
                    pa.string(),
                ),
                # NULL keys and orphan key 99: dropped by the inner joins,
                # kept (as no-nation) nowhere — both engines must agree
                "c_nationkey": pa.array(
                    [
                        rng.choice([None, 99, rng.randrange(0, n_nat)])
                        if rng.random() < 0.2
                        else rng.randrange(0, n_nat // 2)  # cust-heavy half
                        for _ in range(n_cust)
                    ],
                    pa.int32(),
                ),
                "c_acctbal": pa.array(balances, pa.float64()),
                "c_mktsegment": pa.array(
                    [rng.choice(["BUILDING", "AUTO", None]) for _ in range(n_cust)],
                    pa.string(),
                ),
            }
        ),
        f"{dirpath}/customer.parquet",
    )
    n_supp = 40
    pq.write_table(
        pa.table(
            {
                "s_suppkey": pa.array(range(1, n_supp + 1), pa.int64()),
                "s_name": pa.array([f"s{i}" for i in range(n_supp)], pa.string()),
                # supplier-heavy half barely overlaps the customer-heavy
                # half -> INTERSECT and both EXCEPT directions non-empty
                "s_nationkey": pa.array(
                    [rng.randrange(n_nat // 2 - 1, n_nat) for _ in range(n_supp)],
                    pa.int32(),
                ),
                "s_acctbal": pa.array(
                    [round(rng.uniform(-100, 1000), 2) for _ in range(n_supp)],
                    pa.float64(),
                ),
            }
        ),
        f"{dirpath}/supplier.parquet",
    )


@pytest.mark.parametrize("seed", [3, 59, 71])
def test_fuzz_relational_dims_parity(spark, tmp_path, seed):
    """Grouping sets / set ops / outer joins / anti joins / join chains
    over hostile dims: subtotal NULLs vs data NULLs, duplicate group
    names, orphan and NULL foreign keys, tie/NULL/-0.0 measures."""
    rng = random.Random(seed)
    _write_tpch_dims(rng, str(tmp_path))
    _write_orders(rng, str(tmp_path / "orders.parquet"), 300)
    _write_lineitem(rng, str(tmp_path / "lineitem.parquet"), 400)
    _run_twins(
        spark,
        str(tmp_path),
        FUZZ_DIM_QUERIES,
        ["region", "nation", "customer", "supplier", "orders", "lineitem"],
    )


@pytest.mark.parametrize("seed", [61, 83])
def test_fuzz_orders_window_scalar_parity(spark, tmp_path, seed):
    """Window ranking with exact ties + NULL measures (desc is
    NULLS LAST in BOTH engines — pinned here), percentile interpolation
    over NULL groups/prices, and the scalar date battery over leap days,
    month ends, and pre-1970 dates."""
    rng = random.Random(seed)
    _write_orders(rng, str(tmp_path / "orders.parquet"), 400)
    _run_twins(spark, str(tmp_path), FUZZ_ORDER_QUERIES_WIDE, ["orders"])


# --- declared-out contracts, pinned (r5 verdict task 5) --------------------


def test_nan_inf_aggregation_contract(spark):
    """The fuzzer excludes NaN/Inf from aggregated doubles because the
    engines genuinely order them differently. That exclusion is only
    honest if THIS engine's behavior is pinned somewhere — here:

    - NaN equals itself in grouping (ONE NaN group, not one per row),
    - ordering: NaN sorts GREATER than +Infinity,
    - sum/avg propagate NaN; +Inf + -Inf sums to NaN,
    - same-signed Inf stays Inf through sum.

    These are Spark SQL's documented NaN semantics; if an upgrade ever
    changes them, this test fails before a user's pipeline does."""
    import math

    import pyspark.sql.functions as F

    nan, inf = float("nan"), float("inf")

    df = spark.createDataFrame(
        [(1, nan), (2, nan), (3, inf), (4, -inf), (5, 1.5)], "id int, v double"
    )
    groups = df.groupBy("v").count().collect()
    nan_groups = [r for r in groups if r["v"] is not None and math.isnan(r["v"])]
    assert len(nan_groups) == 1 and nan_groups[0]["count"] == 2

    ordered = [r["id"] for r in df.orderBy(F.desc("v")).collect()]
    assert ordered[:2] in ([1, 2], [2, 1]), "NaN must sort above +Inf"
    assert ordered[2] == 3, "+Inf next after NaN"

    assert math.isnan(df.agg(F.sum("v")).first()[0])  # NaN propagates
    inf_sum = (
        df.where(F.col("id").isin(3, 4)).agg(F.sum("v")).first()[0]
    )
    assert math.isnan(inf_sum), "+Inf + -Inf must aggregate to NaN"
    same_signed = (
        df.where(F.col("id").isin(3, 5)).agg(F.sum("v")).first()[0]
    )
    assert same_signed == inf, "+Inf + finite stays +Inf"


def test_invalid_json_extraction_contract(spark):
    """The fuzzer's props generator emits only VALID JSON because the
    engines' malformed-JSON contracts genuinely differ — pinned here:
    Spark's get_json_object returns NULL for every malformed fragment
    (never raises), so json_props_rollup counts such rows in ``n`` but
    excludes them from sum_k/avg_k; DuckDB's json_extract_string RAISES
    on the same input (verified InvalidInputException), which is why
    malformed fragments cannot appear in an oracle-twinned corpus."""
    import pyspark.sql.functions as F

    from map_reduce_using_cloud_functions_spark.plans.events import json_props_rollup

    frags = ["not json", "{", '{"k":}', "[1,", "", '{"k": 7}', None]
    df = spark.createDataFrame(
        [(i, "t", f) for i, f in enumerate(frags)],
        "event_id int, event_type string, props string",
    )
    got = [
        r["v"]
        for r in df.select(
            F.get_json_object("props", "$.k").alias("v")
        ).collect()
    ]
    assert got == [None, None, None, None, None, "7", None]

    roll = json_props_rollup(df).collect()
    assert len(roll) == 1
    r = roll[0]
    # all 7 rows counted; only the single valid fragment aggregates
    assert (r["n"], r["sum_k"], r["avg_k"]) == (7, 7, 7.0)


# --- r11: fingerprint twins (image dHash / audio energy-sign hash) ---------
#
# The phash/audiohash oracle twins replay the hash from the fixture
# text bytes (PNG/PCM losslessness), so their divergence axes are byte
# patterns, eligibility-length boundaries (72 pixels / 130 samples),
# near-identical edits (boundary hamming distances around the
# max_hamming=6 threshold), and exact duplicates (hamming 0). ASCII
# only BY CONTRACT: the fixture builders slice text BYTES while the
# SQL twins index CHARACTERS (ord(substr)) — identical exactly on
# ASCII, which the shipped fixtures are; multibyte inputs are the
# documented boundary of the twin, not an engine divergence.

FUZZ_FINGERPRINT_QUERIES = [
    "multimodal_phash_pairs",
    "multimodal_phash_ledger_pairs",
    "multimodal_audiohash_pairs",
    "multimodal_audiohash_ledger_pairs",
    "multimodal_videohash_pairs",
    "multimodal_videohash_ledger_pairs",
]

_ASCII = [chr(c) for c in range(32, 127)] + ["\x01", "\x1b", "\x7f"]


def _write_ascii_documents(rng: random.Random, path: str, n: int) -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    texts: list[str | None] = []
    for _ in range(n):
        roll = rng.random()
        if roll < 0.05:
            texts.append(None)
            continue
        # lengths straddling ALL THREE eligibility boundaries (the 9x8
        # image needs 72 bytes, the 65-block audio clip 130, the
        # 65-frame 2x2 video clip 260)
        length = rng.choice(
            [0, 5, 71, 72, 73, 100, 129, 130, 131, 200, 259, 260, 261, 320]
        )
        texts.append("".join(rng.choice(_ASCII) for _ in range(length)))
    # planted near-identical pairs: 1-3 byte edits of an eligible text —
    # across seeds the resulting hamming distances bracket the
    # admission threshold from both sides
    for _ in range(max(3, n // 8)):
        i, j = rng.randrange(n), rng.randrange(n)
        if i != j and texts[i] and len(texts[i]) >= 72:
            t = list(texts[i])
            for _ in range(rng.randrange(1, 4)):
                t[rng.randrange(len(t))] = rng.choice(_ASCII)
            texts[j] = "".join(t)
    if n >= 2 and texts[0]:
        texts[1] = texts[0]  # at least one exact duplicate (hamming 0)
    # planted bit-63 flip (r11 ADVICE): an edit confined to samples
    # 126-129 flips the energy-sign comparison feeding ahash bit 63
    # (block 63 = samples 126,127 vs block 64 = samples 128,129) with
    # hamming <= 2 — exactly the case where a HUGEINT sign-extension in
    # the twin's sum() would inflate bit_count(xor(..)) by +64 and drop
    # the pair. '~' centers to -2 (block energy 8), ' ' to -96 (18432).
    base = next((t for t in texts if t and len(t) >= 130), None)
    if base is not None and n >= 4:
        flip_a, flip_b = list(base), list(base)
        flip_a[126:130] = ["~", "~", " ", " "]  # en63=8  < en64=18432: bit63=0
        flip_b[126:130] = [" ", " ", "~", "~"]  # en63=18432 > en64=8: bit63=1
        texts[2], texts[3] = "".join(flip_a), "".join(flip_b)
    # same plant for the VIDEO hash: its bit 63 compares frame 63
    # (bytes 252-255) against frame 64 (bytes 256-259)
    vbase = next((t for t in texts if t and len(t) >= 260), None)
    if vbase is not None and n >= 6:
        flip_a, flip_b = list(vbase), list(vbase)
        flip_a[252:260] = ["~"] * 4 + [" "] * 4  # en63 < en64: bit63=0
        flip_b[252:260] = [" "] * 4 + ["~"] * 4  # en63 > en64: bit63=1
        texts[4], texts[5] = "".join(flip_a), "".join(flip_b)
    # the twins index CHARACTERS (ord(substr)) while the fixture
    # builders slice BYTES — identical only on ASCII, so machine-check
    # the contract at the boundary it protects (r11 ADVICE)
    assert all(t is None or t.isascii() for t in texts)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(n), pa.int64()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(
                    [rng.choice(LANGS) for _ in range(n)], pa.string()
                ),
                "source": pa.array(
                    [rng.choice(SOURCES) for _ in range(n)], pa.string()
                ),
                "n_chars": pa.array(
                    [len(t) if t is not None else None for t in texts],
                    pa.int64(),
                ),
            }
        ),
        path,
    )


@pytest.mark.parametrize("seed", [101, 211, 307, 401])
def test_fuzz_fingerprint_twin_parity(spark, tmp_path, seed):
    rng = random.Random(seed)
    _write_ascii_documents(rng, str(tmp_path / "documents.parquet"), 90)
    _run_twins(spark, str(tmp_path), FUZZ_FINGERPRINT_QUERIES, ["documents"])


@pytest.mark.parametrize("seed", [113, 223, 331])
def test_fuzz_corrupt_media_payloads_never_diverge(spark, tmp_path, seed):
    """Truncated / bit-flipped / junk-trailed PNG and WAV payloads
    through the fingerprint operators: every row must either hash
    ok=true EQUAL to a driver-side recompute (same pinned decoder) or
    surface ok=false — and the stage must never fail. Undersized media
    (below the 9x8 pixel grid / 65-sample block partition) must land
    ok=false, not crash."""
    import numpy as np

    from map_reduce_using_cloud_functions_spark.operators import (
        multimodal as mm,
    )

    rng = random.Random(seed)
    pngs, wavs = [], []
    for i in range(50):
        nprng = np.random.default_rng(seed * 1000 + i)
        h, w = int(nprng.integers(2, 24)), int(nprng.integers(2, 24))
        shape = (h, w) if nprng.integers(0, 2) else (h, w, 3)
        png = mm.encode_png(nprng.integers(0, 256, shape, dtype=np.uint8))
        wav = mm.encode_wav(
            nprng.integers(0, 256, int(nprng.integers(2, 300)), dtype=np.uint8)
        )
        for payloads, payload in ((pngs, png), (wavs, wav)):
            roll = rng.random()
            if roll < 0.3:
                payload = payload[: rng.randrange(1, len(payload))]
            elif roll < 0.5:
                b = bytearray(payload)
                b[rng.randrange(len(b))] ^= 0xFF
                payload = bytes(b)
            elif roll < 0.6:
                payload += bytes([rng.randrange(256)]) * rng.randrange(1, 12)
            payloads.append((i, payload))

    use_pil = mm._pil_available()
    df = spark.createDataFrame(
        [(i, bytearray(p)) for i, p in pngs], "asset_id bigint, payload binary"
    )
    got = {r["asset_id"]: r for r in mm.phash_assets(df).collect()}
    for i, p in pngs:
        try:
            want = mm.dhash64(mm.decode_png_pixels(p, use_pil=use_pil))
        except Exception:
            want = None
        row = got[i]
        if want is None:
            assert not row["ok"] and row["phash"] is None, (i, row)
        else:
            assert row["ok"] and row["phash"] == want, (i, row)

    dfw = spark.createDataFrame(
        [(i, bytearray(p)) for i, p in wavs], "asset_id bigint, payload binary"
    )
    gotw = {r["asset_id"]: r for r in mm.audiohash_assets(dfw).collect()}
    for i, p in wavs:
        try:
            want = mm.audiohash64(mm.decode_wav_samples(p))
        except Exception:
            want = None
        row = gotw[i]
        if want is None:
            assert not row["ok"] and row["ahash"] is None, (i, row)
        else:
            assert row["ok"] and row["ahash"] == want, (i, row)
