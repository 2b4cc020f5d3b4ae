"""Product-quantization tests (operators/pq.py): a NumPy replay of the
whole pipeline — seed codebooks, L2-argmin encode, reconstruction norm,
ADC scoring — is the oracle; plus the reconstruction-exactness property
on seed vectors, the rerank recall lift, IVF-PQ candidate-restriction
equivalence, partition invariance, and the Lloyd path's error
monotonicity."""

from __future__ import annotations

import math

import numpy as np
import pytest

from map_reduce_using_cloud_functions_spark.operators import pq
from map_reduce_using_cloud_functions_spark.operators.similarity import (
    brute_force_topk,
    queries_from_ids,
)
from map_reduce_using_cloud_functions_spark.sources import load_table

SF = "/root/testdata/sf0.001"
M, K = 8, 16


@pytest.fixture(scope="module")
def embeddings(spark):
    return load_table(spark, SF, "embeddings")


@pytest.fixture(scope="module")
def vecs(embeddings):
    return {
        r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
        for r in embeddings.collect()
    }


@pytest.fixture(scope="module")
def books(embeddings):
    return pq.train_pq_codebooks(embeddings, m=M, k=K)


@pytest.fixture(scope="module")
def codes(embeddings, books):
    return pq.pq_encode(embeddings, books)


def np_books(vecs, m=M, k=K):
    slots = {}
    for vid in sorted(vecs):
        slot = vid % 97
        if slot < k and slot not in slots:
            slots[slot] = vecs[vid]
    sub = len(next(iter(vecs.values()))) // m
    return {
        (s, j): v[s * sub : (s + 1) * sub] for j, v in slots.items() for s in range(m)
    }


def np_encode(vecs, bks, m=M, k=K):
    sub = len(next(iter(vecs.values()))) // m
    out = {}
    for vid, v in vecs.items():
        cs, nrm2 = [], 0.0
        for s in range(m):
            x = v[s * sub : (s + 1) * sub]
            # argmax of <x,c> - |c|^2/2, tie toward smaller code
            best = max(
                (float(x @ bks[(s, j)]) - float(bks[(s, j)] @ bks[(s, j)]) / 2, -j)
                for j in range(k)
                if (s, j) in bks
            )
            j = -best[1]
            cs.append(j)
            nrm2 += float(bks[(s, j)] @ bks[(s, j)])
        out[vid] = (cs, math.sqrt(nrm2))
    return out


def test_encode_matches_numpy_model(codes, vecs):
    model = np_encode(vecs, np_books(vecs))
    got = {r["vec_id"]: (list(r["codes"]), r["recon_norm"]) for r in codes.collect()}
    assert set(got) == set(model)
    for vid, (cs, rn) in model.items():
        assert got[vid][0] == cs, f"codes diverge for {vid}"
        assert abs(got[vid][1] - rn) < 1e-9


def test_adc_scores_match_numpy_model(embeddings, books, codes, vecs):
    model_codes = np_encode(vecs, np_books(vecs))
    bks = np_books(vecs)
    sub = len(next(iter(vecs.values()))) // M
    got = pq.pq_topk(codes, books, queries_from_ids(embeddings, 2), k=5).collect()
    for r in got:
        q = vecs[r["query_id"]]
        cs, rn = model_codes[r["neighbor_id"]]
        adc = sum(
            float(q[s * sub : (s + 1) * sub] @ bks[(s, cs[s])]) for s in range(M)
        )
        expect = adc / (np.linalg.norm(q) * rn)
        assert abs(r["score"] - round(expect, 6)) < 2e-6


def test_seed_vectors_reconstruct_exactly(embeddings, books, codes, vecs):
    """A seed vector IS its own codeword in every subspace: codes =
    its slot, reconstruction norm = its true norm — quantization error
    exactly zero for the codebook's sources."""
    rows = {r["vec_id"]: r for r in codes.collect()}
    slots = {}
    for vid in sorted(vecs):
        slot = vid % 97
        if slot < K and slot not in slots:
            slots[slot] = vid
    for slot, vid in slots.items():
        assert list(rows[vid]["codes"]) == [slot] * M
        assert abs(rows[vid]["recon_norm"] - np.linalg.norm(vecs[vid])) < 1e-9


def test_compression_shape(codes):
    for r in codes.collect():
        assert len(r["codes"]) == M
        assert all(0 <= c < K for c in r["codes"])


def test_rerank_lifts_recall(spark, embeddings, books, codes):
    q = queries_from_ids(embeddings, 8)
    bf = {
        (r["query_id"], r["neighbor_id"])
        for r in brute_force_topk(embeddings, q, k=5).collect()
    }
    raw = {
        (r["query_id"], r["neighbor_id"])
        for r in pq.pq_topk(codes, books, q, k=5).collect()
    }
    rr = {
        (r["query_id"], r["neighbor_id"])
        for r in pq.pq_topk_rerank(
            embeddings, codes, books, q, k=5, shortlist=100
        ).collect()
    }
    assert len(rr & bf) > len(raw & bf)
    assert len(rr & bf) >= 0.8 * len(bf)  # measured 38/40 on this fixture
    # rerank scores are exact cosines: every (q, n) it shares with brute
    # force carries the identical score
    bf_scores = {
        (r["query_id"], r["neighbor_id"]): r["score"]
        for r in brute_force_topk(embeddings, q, k=5).collect()
    }
    for r in pq.pq_topk_rerank(
        embeddings, codes, books, q, k=5, shortlist=100
    ).collect():
        key = (r["query_id"], r["neighbor_id"])
        if key in bf_scores:
            assert abs(r["score"] - bf_scores[key]) < 2e-6


def test_ivf_pq_is_pq_restricted_to_probed_lists(spark, embeddings, books):
    """IVF-PQ ≡ the full ADC ranking restricted to candidates in the
    query's probed lists — routing changes WHICH rows are scored,
    never their scores."""
    from map_reduce_using_cloud_functions_spark.operators.similarity import (
        _assign_nearest_list,
        _probe_query_lists,
        _seed_centroids,
    )
    import pyspark.sql.functions as F

    q = queries_from_ids(embeddings, 4)
    got = {
        (r["query_id"], r["neighbor_id"], r["rank"], r["score"])
        for r in pq.ivf_pq_topk(embeddings, q, k=3, m=M, pq_k=K).collect()
    }
    cents = _seed_centroids(embeddings, 8)
    allowed = (
        _assign_nearest_list(embeddings, cents)
        .select("vec_id", "list_id")
        .join(
            _probe_query_lists(q, cents, 2).select("query_id", "list_id"),
            "list_id",
        )
        .select("query_id", "vec_id")
    )
    codes = pq.pq_encode(embeddings, books)
    full = pq.pq_topk(codes, books, q, k=10**6)  # unranked-by-k full scoring
    restricted = (
        full.join(
            allowed.withColumnRenamed("vec_id", "neighbor_id"),
            ["query_id", "neighbor_id"],
        )
    )
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    wn = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("neighbor_id")
    )
    expect = {
        (r["query_id"], r["neighbor_id"], r["rank"], r["score"])
        for r in restricted.withColumn("rank", F.row_number().over(wn))
        .where(F.col("rank") <= 3)
        .select("query_id", "neighbor_id", "rank", "score")
        .collect()
    }
    assert got == expect


def test_partition_invariance(embeddings, books):
    base = sorted(map(tuple, pq.pq_encode(embeddings, books).collect()))
    shuffled = sorted(
        map(tuple, pq.pq_encode(embeddings.repartition(13), books).collect())
    )
    assert base == shuffled


def test_dim_must_split(embeddings):
    with pytest.raises(ValueError, match="split evenly"):
        pq.train_pq_codebooks(embeddings, m=7)


def test_lloyd_training_reduces_reconstruction_error(spark, embeddings, vecs, books):
    """Per-subspace Lloyd iterations must not worsen mean squared
    reconstruction error on the training corpus (k-means monotonicity;
    seeds are the iteration-0 state)."""
    import pyspark.sql.functions as F

    def mse(bks_df):
        bks = {
            (r["subspace"], r["centroid_id"]): np.array(r["c_subvec"], np.float64)
            for r in bks_df.collect()
        }
        enc = np_encode(vecs, bks, k=1 + max(j for _, j in bks))
        sub = len(next(iter(vecs.values()))) // M
        tot = 0.0
        for vid, (cs, _) in enc.items():
            rec = np.concatenate([bks[(s, cs[s])] for s in range(M)])
            tot += float(np.sum((vecs[vid] - rec) ** 2))
        return tot / len(vecs)

    trained = pq.train_pq_codebooks(embeddings, m=M, k=K, train=True, train_iters=2)
    assert mse(trained) <= mse(books) + 1e-9


def test_persisted_index_roundtrip_and_append(spark, embeddings, books, tmp_path):
    """build → indexed query ≡ in-plan; append grows by O(batch) and is
    exact by construction (codes(build ∪ batch) ≡ codes(build) ∪
    codes(batch) — codewords are stored parameters)."""
    import pyspark.sql.functions as F

    q = queries_from_ids(embeddings, 4)
    path = str(tmp_path / "pqidx")
    pq.build_pq_index(embeddings, path, m=M, k=K)
    in_plan = sorted(
        map(tuple, pq.pq_topk(pq.pq_encode(embeddings, books), books, q, k=5).collect())
    )
    indexed = sorted(map(tuple, pq.pq_topk_indexed(spark, path, q, k=5).collect()))
    assert indexed == in_plan

    # half-build + append ≡ full build
    half = str(tmp_path / "pqhalf")
    evens = embeddings.where(F.col("vec_id") % 2 == 0)
    odds = embeddings.where(F.col("vec_id") % 2 == 1)
    pq.build_pq_index(evens, half, m=M, k=K)
    pq.append_pq_index(odds, half)
    appended = sorted(map(tuple, pq.pq_topk_indexed(spark, half, q, k=5).collect()))
    # seeds come from the even half only — rebuild the twin the same way
    books_half = pq.train_pq_codebooks(evens, m=M, k=K)
    twin = sorted(
        map(
            tuple,
            pq.pq_topk(pq.pq_encode(embeddings, books_half), books_half, q, k=5).collect(),
        )
    )
    assert appended == twin
    assert pq.load_pq_meta(spark, half)["n"] == embeddings.count()

    # dimension guard
    import pytest as _pytest

    bad = odds.select("vec_id", F.slice("embedding", 1, 16).alias("embedding"))
    with _pytest.raises(ValueError, match="dimension"):
        pq.append_pq_index(bad, half)


def test_indexed_rerank_requires_float_source(spark, embeddings, tmp_path):
    import pytest as _pytest

    q = queries_from_ids(embeddings, 2)
    path = str(tmp_path / "pq_nofloats")
    pq.build_pq_index(embeddings, path, m=M, k=K)  # keep_vectors=False
    with _pytest.raises(ValueError, match="keep_vectors"):
        pq.pq_topk_indexed(spark, path, q, k=5, shortlist=50)
    # caller-supplied float relation works
    got = pq.pq_topk_indexed(spark, path, q, k=5, shortlist=50, embeddings=embeddings)
    assert got.count() == 10
    # and a keep_vectors build serves the re-rank from its own vectors/
    path2 = str(tmp_path / "pq_floats")
    pq.build_pq_index(embeddings, path2, m=M, k=K, keep_vectors=True)
    own = pq.pq_topk_indexed(spark, path2, q, k=5, shortlist=50)
    assert sorted(map(tuple, own.collect())) == sorted(map(tuple, got.collect()))


def test_packed_codes_are_bit_identical(spark, embeddings, books, codes, tmp_path):
    """The packed-BIGINT layout must return byte-identical answers to
    the array layout — same codes (unpack check), same recon norms,
    same ADC ranking (same add order) — through both the in-plan and
    persisted paths, and appends keep the layout."""
    import pyspark.sql.functions as F

    q = queries_from_ids(embeddings, 4)
    packed = pq.pq_encode(embeddings, books, packed=True)
    prow = {r["vec_id"]: (r["codes"], r["recon_norm"]) for r in packed.collect()}
    for r in codes.collect():
        pc, pn = prow[r["vec_id"]]
        unpacked = [(pc >> (8 * s)) & 255 for s in range(M)]
        assert unpacked == list(r["codes"])
        assert pn == r["recon_norm"]  # exact: same fold

    a = sorted(map(tuple, pq.pq_topk(codes, books, q, k=5).collect()))
    b = sorted(map(tuple, pq.pq_topk(packed, books, q, k=5).collect()))
    assert a == b

    path = str(tmp_path / "pq_packed")
    pq.build_pq_index(embeddings, path, m=M, k=K, packed=True)
    assert pq.load_pq_meta(spark, path)["packed"] is True
    c = sorted(map(tuple, pq.pq_topk_indexed(spark, path, q, k=5).collect()))
    assert c == a

    # appends re-encode with the stored layout
    half = str(tmp_path / "pq_packed_half")
    evens = embeddings.where(F.col("vec_id") % 2 == 0)
    odds = embeddings.where(F.col("vec_id") % 2 == 1)
    pq.build_pq_index(evens, half, m=M, k=K, packed=True)
    pq.append_pq_index(odds, half)
    from map_reduce_using_cloud_functions_spark.operators.ann_commit import (
        read_artifact,
    )

    got = read_artifact(spark, half, "codes")
    assert dict(got.dtypes)["codes"] == "bigint"
    assert got.count() == embeddings.count()

    # geometry guard: 9 subspaces don't fit one bigint... (dim 64 % 9
    # != 0 trips first, so check the k bound instead via a fake book)
    big_books = books.withColumn(
        "centroid_id", F.col("centroid_id") + F.lit(300)
    )
    import pytest as _pytest

    with _pytest.raises(ValueError, match="packed codes"):
        pq.pq_encode(embeddings, big_books, packed=True)


def test_packed_high_code_in_top_byte(spark):
    """m=8 with subspace-7's chosen code ≥ 128 — inside the documented
    m≤8/k≤256 envelope — must pack without ANSI overflow (the old
    Horner fold acc·256+code tripped ARITHMETIC_OVERFLOW on the final
    multiply) and score identically to the array layout. The packed
    BIGINT is negative (byte 7 ≥ 128 sets the sign bit); the masked
    unpack must still recover every byte."""
    import pyspark.sql.functions as F

    # dim=8, m=8 → one coordinate per subspace; per subspace two
    # codewords: id 0 at 0.0 and id 200 at 1.0. A vector of ones
    # chooses code 200 in EVERY subspace, including byte 7.
    books = spark.createDataFrame(
        [(s, c, [float(c == 200)]) for s in range(8) for c in (0, 200)],
        "subspace int, centroid_id int, c_subvec array<double>",
    )
    emb = spark.createDataFrame(
        [(1, [1.0] * 8), (2, [0.0] * 8)],
        "vec_id bigint, embedding array<float>",
    )
    packed = pq.pq_encode(emb, books, packed=True)
    rows = {r["vec_id"]: r["codes"] for r in packed.collect()}
    assert [(rows[1] >> (8 * s)) & 255 for s in range(8)] == [200] * 8
    assert rows[1] < 0  # sign bit set — the case the fold could not pack
    assert rows[2] == 0

    q = spark.createDataFrame(
        [(1, [1.0] * 8)], "query_id bigint, q_embedding array<float>"
    )
    arr = pq.pq_encode(emb, books)
    a = sorted(map(tuple, pq.pq_topk(arr, books, q, k=2).collect()))
    b = sorted(map(tuple, pq.pq_topk(packed, books, q, k=2).collect()))
    assert a == b
    _ = F


def test_encode_rejects_geometry_mismatch(spark, books):
    """Caller-supplied books whose geometry doesn't match the corpus
    dim must raise at plan build, not null-pad the slices into garbage
    codes (dim % m trips for non-divisible dims; the subvector-length
    check catches divisible-but-wrong dims)."""
    bad_dim = spark.createDataFrame(
        [(i, [float(i)] * 16) for i in range(4)],
        "vec_id bigint, embedding array<float>",
    )
    # 16 % 8 == 0 but 16 // 8 = 2 != the books' 8-dim codewords
    with pytest.raises(ValueError, match="codebook geometry"):
        pq.pq_encode(bad_dim, books)
    odd = spark.createDataFrame(
        [(i, [float(i)] * 9) for i in range(4)],
        "vec_id bigint, embedding array<float>",
    )
    with pytest.raises(ValueError, match="codebook geometry"):
        pq.pq_encode(odd, books)


def test_ivf_pq_indexed_matches_in_plan(spark, embeddings, tmp_path):
    """The persisted IVF-PQ index must serve the SAME answers as the
    in-plan ivf_pq_topk at identical parameters (seeded centroids and
    codebooks), prune to the probed list partitions, and keep answers
    stable across an append (frozen-artifact contract: the appended
    index equals a full build whose seeds come from the build half)."""
    import pyspark.sql.functions as F

    q = queries_from_ids(embeddings, 8)
    want = sorted(
        map(tuple, pq.ivf_pq_topk(embeddings, q, k=5, m=M, pq_k=K).collect())
    )
    path = str(tmp_path / "ivfpq")
    pq.build_ivf_pq_index(embeddings, path, n_centroids=8, m=M, k=K)
    got = sorted(
        map(tuple, pq.ivf_pq_topk_indexed(spark, path, q, k=5).collect())
    )
    assert got == want

    # the scan must plant the probed list ids as a partition predicate
    plan = pq.ivf_pq_topk_indexed(spark, path, q, k=5)._jdf.queryExecution().executedPlan().toString()
    assert "list_id" in plan

    # meta roundtrip
    meta = pq.load_ivf_pq_meta(spark, path)
    assert (meta["n_centroids"], meta["m"], meta["k"]) == (8, M, K)
    assert meta["n"] == embeddings.count() and meta["packed"] is False

    # append: build on evens, append odds, compare to a full build with
    # build-half (even) seeds — the composed frozen-artifact contract
    half = str(tmp_path / "ivfpq_half")
    evens = embeddings.where(F.col("vec_id") % 2 == 0)
    odds = embeddings.where(F.col("vec_id") % 2 == 1)
    pq.build_ivf_pq_index(evens, half, n_centroids=8, m=M, k=K)
    pq.append_ivf_pq_index(odds, half)
    assert pq.load_ivf_pq_meta(spark, half)["n"] == embeddings.count()
    from map_reduce_using_cloud_functions_spark.operators.similarity import (
        _seed_centroids,
    )

    even_cents = _seed_centroids(evens, 8)
    even_books = pq.train_pq_codebooks(evens, m=M, k=K)
    want_half = sorted(
        map(
            tuple,
            pq.ivf_pq_topk(
                embeddings, q, k=5, books=even_books, centroids=even_cents
            ).collect(),
        )
    )
    got_half = sorted(
        map(tuple, pq.ivf_pq_topk_indexed(spark, half, q, k=5).collect())
    )
    assert got_half == want_half

    # dim guard on append
    bad = spark.createDataFrame(
        [(10**6, [1.0] * 16)], "vec_id bigint, embedding array<float>"
    )
    with pytest.raises(ValueError, match="dimension"):
        pq.append_ivf_pq_index(bad, half)


def test_ivf_pq_indexed_packed_and_rerank(spark, embeddings, tmp_path):
    """packed=True codes serve bit-identical rankings through the
    indexed probe; shortlist= runs the exact re-rank from the index's
    own vectors/ (keep_vectors) or a caller relation, and refuses when
    neither exists."""
    q = queries_from_ids(embeddings, 4)
    plain = str(tmp_path / "ivfpq_plain")
    packed = str(tmp_path / "ivfpq_packed")
    pq.build_ivf_pq_index(embeddings, plain, n_centroids=8, m=M, k=K)
    pq.build_ivf_pq_index(
        embeddings, packed, n_centroids=8, m=M, k=K, packed=True
    )
    assert pq.load_ivf_pq_meta(spark, packed)["packed"] is True
    a = sorted(map(tuple, pq.ivf_pq_topk_indexed(spark, plain, q, k=5).collect()))
    b = sorted(map(tuple, pq.ivf_pq_topk_indexed(spark, packed, q, k=5).collect()))
    assert a == b

    # rerank path: exact scores, rank 1..k, nominated from the probed
    # ADC shortlist — external floats and keep_vectors floats agree
    ext = sorted(
        map(
            tuple,
            pq.ivf_pq_topk_indexed(
                spark, plain, q, k=3, shortlist=20, embeddings=embeddings
            ).collect(),
        )
    )
    kept = str(tmp_path / "ivfpq_kept")
    pq.build_ivf_pq_index(
        embeddings, kept, n_centroids=8, m=M, k=K, keep_vectors=True
    )
    own = sorted(
        map(
            tuple,
            pq.ivf_pq_topk_indexed(spark, kept, q, k=3, shortlist=20).collect(),
        )
    )
    assert ext == own
    for row in ext:
        assert 1 <= row[2] <= 3

    with pytest.raises(ValueError, match="keep_vectors"):
        pq.ivf_pq_topk_indexed(spark, plain, q, k=3, shortlist=20)


def test_k256_trained_codebooks_recall_pin(spark, embeddings):
    """The production codebook size (m=8, k=256, trained): codes use
    the full byte range legally (packed works — bytes 0..255), recall
    vs brute force at shortlist-free ADC stays above the k=16 seeded
    configuration's, and encode/pack round-trips. Pinned here because
    k>97 leaves the %97 oracle-seed envelope (train=True territory)."""
    import pyspark.sql.functions as F

    from map_reduce_using_cloud_functions_spark.operators.similarity import (
        brute_force_topk,
    )

    books = pq.train_pq_codebooks(embeddings, m=M, k=256, train=True, train_iters=1)
    # full codebook: every subspace has >97 codewords available
    per_sub = books.groupBy("subspace").count().agg(F.min("count")).first()[0]
    assert per_sub > 97

    codes = pq.pq_encode(embeddings, books)
    rng = codes.select(
        F.min(F.array_min("codes")).alias("lo"),
        F.max(F.array_max("codes")).alias("hi"),
    ).first()
    assert rng["lo"] >= 0 and rng["hi"] <= 255

    q = queries_from_ids(embeddings, 8)
    truth = {
        (r["query_id"], r["neighbor_id"])
        for r in brute_force_topk(embeddings, q, k=5).collect()
    }
    got256 = {
        (r["query_id"], r["neighbor_id"])
        for r in pq.pq_topk(codes, books, q, k=5).collect()
    }
    books16 = pq.train_pq_codebooks(embeddings, m=M, k=K)
    got16 = {
        (r["query_id"], r["neighbor_id"])
        for r in pq.pq_topk(pq.pq_encode(embeddings, books16), books16, q, k=5).collect()
    }
    r256 = len(got256 & truth) / len(truth)
    r16 = len(got16 & truth) / len(truth)
    assert r256 >= r16  # finer codebooks cannot lose recall here
    assert r256 >= 0.6  # and the production size is genuinely usable

    # packed layout handles the full byte range bit-identically
    packed = pq.pq_encode(embeddings, books, packed=True)
    a = sorted(map(tuple, pq.pq_topk(codes, books, q, k=5).collect()))
    b = sorted(map(tuple, pq.pq_topk(packed, books, q, k=5).collect()))
    assert a == b


def test_ivf_pq_rebuild_leaves_no_stale_partitions(spark, embeddings, tmp_path):
    """Rebuilding an IVF-PQ index at the same path with fewer centroids
    and a shrunk corpus must fully replace codes/ — the dynamic
    overwrite default would keep the first build's unmatched list_id
    partitions, and probes whose IN-predicate touches a leftover list
    would score stale codes."""
    import pyspark.sql.functions as F

    from map_reduce_using_cloud_functions_spark.operators import pq

    path = str(tmp_path / "ivfpq")
    pq.build_ivf_pq_index(embeddings, path, n_centroids=8, m=8, k=16)
    shrunk = embeddings.where("vec_id % 2 = 0")
    pq.build_ivf_pq_index(shrunk, path, n_centroids=2, m=8, k=16)
    from map_reduce_using_cloud_functions_spark.operators.ann_commit import (
        read_artifact,
    )

    codes = read_artifact(
        spark, path, "codes",
        "vec_id bigint, codes array<int>, recon_norm double, list_id int",
    )
    got = sorted(r["vec_id"] for r in codes.collect())
    want = sorted(r["vec_id"] for r in shrunk.select("vec_id").collect())
    assert got == want
    assert {r["list_id"] for r in codes.select("list_id").distinct().collect()} <= {0, 1}


def test_pq_train_sample_recall_parity(spark, embeddings):
    """Codebooks fitted on the bounded deterministic sample must hold
    recall within noise of full-corpus Lloyd (the r9 flat-training
    contract); train=False paths never sample."""
    from map_reduce_using_cloud_functions_spark.operators import pq
    from map_reduce_using_cloud_functions_spark.operators.similarity import (
        brute_force_topk,
        queries_from_ids,
    )

    q = queries_from_ids(embeddings, 8)
    bf_top = {
        (r["query_id"], r["neighbor_id"])
        for r in brute_force_topk(embeddings, q, k=5).collect()
    }

    def recall(rows):
        return sum(
            1 for r in rows if (r["query_id"], r["neighbor_id"]) in bf_top
        ) / len(bf_top)

    def topk(books):
        return pq.pq_topk(pq.pq_encode(embeddings, books), books, q, k=5).collect()

    full = topk(pq.train_pq_codebooks(embeddings, m=8, k=16, train=True))
    samp_books = pq.train_pq_codebooks(
        embeddings, m=8, k=16, train=True, train_sample_size=200
    )
    samp = topk(samp_books)
    assert recall(samp) >= recall(full) - 0.15
    samp2 = topk(
        pq.train_pq_codebooks(embeddings, m=8, k=16, train=True, train_sample_size=200)
    )
    assert sorted(map(tuple, samp)) == sorted(map(tuple, samp2))


# --- r9: IVF-PQ residual encoding (Jégou et al. §IV) -----------------------


@pytest.fixture(scope="module")
def clustered(spark):
    """Deterministic clustered corpus — the data shape residual
    encoding exists for: cos(v, centroid) is high, so |v − c| ≪ |v| and
    the codebook budget spends on the informative displacement. (On the
    near-random parquet fixture cos(v, c) ≈ 0 ⇒ |v − c| ≈ √2·|v| —
    residuals are HARDER to quantize there, so the lift pin lives on
    clustered data, like every real embedding corpus.)"""
    rng = np.random.default_rng(7)
    n, n_true, dim, noise = 1600, 16, 32, 0.5
    centers = rng.normal(size=(n_true, dim))
    pts = centers[np.arange(n) % n_true] + noise * rng.normal(size=(n, dim))
    return spark.createDataFrame(
        [(int(i), [float(v) for v in pts[i]]) for i in range(n)],
        "vec_id bigint, embedding array<float>",
    ).localCheckpoint()


def _recall_at5(emb, rows):
    from map_reduce_using_cloud_functions_spark.operators.similarity import (
        brute_force_topk,
    )

    q = emb.where("vec_id < 8").select("vec_id", "embedding").toDF(
        "query_id", "q_embedding"
    )
    truth = {
        (r["query_id"], r["neighbor_id"])
        for r in brute_force_topk(emb, q, k=5).collect()
    }
    return sum(1 for r in rows if (r["query_id"], r["neighbor_id"]) in truth) / len(
        truth
    )


def test_residual_recall_lift_k16_and_k256(spark, clustered, tmp_path):
    """The residual pin: end-to-end built residual indexes (trained
    coarse centroids + residual-trained codebooks — the FAISS IVFPQ
    default configuration) must beat the raw-ADC build at BOTH k=16 and
    k=256 on the clustered fixture."""
    q = clustered.where("vec_id < 8").select("vec_id", "embedding").toDF(
        "query_id", "q_embedding"
    )
    for pk in (16, 256):
        raw_p = str(tmp_path / f"raw{pk}")
        res_p = str(tmp_path / f"res{pk}")
        kw = dict(n_centroids=16, m=8, k=pk, train=True, train_iters=2)
        pq.build_ivf_pq_index(clustered, raw_p, **kw)
        pq.build_ivf_pq_index(clustered, res_p, residual=True, **kw)
        raw = _recall_at5(
            clustered, pq.ivf_pq_topk_indexed(spark, raw_p, q).collect()
        )
        res = _recall_at5(
            clustered, pq.ivf_pq_topk_indexed(spark, res_p, q).collect()
        )
        assert res > raw, f"k={pk}: residual {res} must beat raw {raw}"


def test_residual_indexed_matches_in_plan(spark, embeddings, tmp_path):
    """The persisted residual index serves the exact answers of the
    in-plan residual composition for identical (seeded) artifacts —
    the same twin contract the raw oracle row pins."""
    from map_reduce_using_cloud_functions_spark.operators.similarity import (
        queries_from_ids,
    )

    q = queries_from_ids(embeddings, 8)
    path = str(tmp_path / "resivfpq")
    pq.build_ivf_pq_index(embeddings, path, n_centroids=8, m=8, k=16, residual=True)
    assert pq.load_ivf_pq_meta(spark, path)["residual"] is True
    idx = sorted(map(tuple, pq.ivf_pq_topk_indexed(spark, path, q).collect()))
    inplan = sorted(
        map(tuple, pq.ivf_pq_topk(embeddings, q, residual=True).collect())
    )
    assert idx == inplan


def test_residual_scores_match_numpy_model(spark, embeddings, vecs):
    """Replay the whole residual pipeline in NumPy — seeded coarse
    centroids, argmax assignment, residual seeds, per-subspace L2
    argmin with the house tie rule, recon = centroid + codeword
    concat — and require score-for-score agreement."""
    from map_reduce_using_cloud_functions_spark.operators.similarity import (
        queries_from_ids,
    )

    cents = {}
    for vid in sorted(vecs):
        s = vid % 97
        if s < 8 and s not in cents:
            cents[s] = vecs[vid]

    def cos(a, b):
        return a @ b / (np.linalg.norm(a) * np.linalg.norm(b))

    assign = {
        vid: max(cents, key=lambda c: (cos(v, cents[c]), -c))
        for vid, v in vecs.items()
    }
    resid = {vid: vecs[vid] - cents[assign[vid]] for vid in vecs}
    books = {}
    for vid in sorted(resid):
        s = vid % 97
        if s < K and s not in books:
            books[s] = resid[vid]
    sub = 64 // M
    recon = {}
    for vid, r in resid.items():
        rr = np.zeros(64)
        for s in range(M):
            xs = r[s * sub:(s + 1) * sub]
            best = max(
                sorted(books),
                key=lambda cid: (
                    xs @ books[cid][s * sub:(s + 1) * sub]
                    - books[cid][s * sub:(s + 1) * sub]
                    @ books[cid][s * sub:(s + 1) * sub]
                    / 2,
                    -cid,
                ),
            )
            rr[s * sub:(s + 1) * sub] = books[best][s * sub:(s + 1) * sub]
        recon[vid] = cents[assign[vid]] + rr

    q = queries_from_ids(embeddings, 8)
    got = pq.ivf_pq_topk(embeddings, q, k=5, residual=True).collect()
    assert got
    for row in got:
        qv = vecs[row["query_id"]]
        expected = round(cos(qv, recon[row["neighbor_id"]]), 6)
        assert abs(expected - row["score"]) < 2e-6


def test_residual_append_matches_frozen_artifacts(spark, embeddings, tmp_path):
    """Appending to a residual index encodes the batch against the SAME
    frozen geometry: build-on-evens + append-odds must equal the
    in-plan residual composition over the full corpus with the index's
    own saved artifacts."""
    import pyspark.sql.functions as F

    from map_reduce_using_cloud_functions_spark.operators.similarity import (
        load_ivf_centroids,
        queries_from_ids,
    )

    path = str(tmp_path / "resapp")
    pq.build_ivf_pq_index(
        embeddings.where(F.col("vec_id") % 2 == 0), path,
        n_centroids=8, m=8, k=16, residual=True,
    )
    pq.append_ivf_pq_index(embeddings.where(F.col("vec_id") % 2 == 1), path)
    assert pq.load_ivf_pq_meta(spark, path)["n"] == embeddings.count()
    q = queries_from_ids(embeddings, 8)
    got = sorted(map(tuple, pq.ivf_pq_topk_indexed(spark, path, q).collect()))
    want = sorted(
        map(
            tuple,
            pq.ivf_pq_topk(
                embeddings,
                q,
                residual=True,
                centroids=load_ivf_centroids(spark, path),
                books=pq.load_pq_books(spark, path),
            ).collect(),
        )
    )
    assert got == want


def test_residual_packed_is_bit_identical(spark, embeddings, tmp_path):
    """packed=True on a residual index: same answers as the array
    layout (same add order in the ADC fold + identical qc term)."""
    from map_reduce_using_cloud_functions_spark.operators.similarity import (
        queries_from_ids,
    )

    q = queries_from_ids(embeddings, 8)
    a_path = str(tmp_path / "arr")
    p_path = str(tmp_path / "pkd")
    pq.build_ivf_pq_index(embeddings, a_path, n_centroids=8, m=8, k=16, residual=True)
    pq.build_ivf_pq_index(
        embeddings, p_path, n_centroids=8, m=8, k=16, residual=True, packed=True
    )
    a = sorted(map(tuple, pq.ivf_pq_topk_indexed(spark, a_path, q).collect()))
    b = sorted(map(tuple, pq.ivf_pq_topk_indexed(spark, p_path, q).collect()))
    assert a == b
