"""Product quantization (PQ) for embedding search (X3 scale path).

Jégou et al., *Product Quantization for Nearest Neighbor Search*
(TPAMI 2011) — the memory-bound answer the IVF family still lacks:
split each d-dim vector into ``m`` disjoint subvectors, learn a tiny
``k``-codeword codebook per subspace, and store each vector as ``m``
small codes (m bytes at k ≤ 256) instead of d floats. Query scoring is
ADC (asymmetric distance computation): the query precomputes one
m×k lookup table of subspace dots, then every corpus vector scores as
``m`` table lookups — no float vector is ever read at query time. At
100 TB this is what makes exhaustive candidate scans feasible: a
64-dim float corpus shrinks 32× (8 codes + a stored norm vs 256
bytes), and the scan is lookup-bound rather than multiply-bound.

Spark-first shape — every stage is Column expressions:

- codebooks: the hash-slot seed vectors (shared determinism with the
  IVF family; the oracle-replayable configuration) sliced per
  subspace; ``train=True`` runs per-subspace Lloyd (L2) iterations;
- encode: one subspace explode + broadcast-argmin (the L2 argmin is
  ranked by ``<x,c> − |c|²/2`` so the per-pair work is one dot — the
  |x|² term is constant within a vector's argmin), folded back to ONE
  row per vector: (vec_id, codes array<int>, recon_norm);
- ADC top-k: queries build their lookup tables against the broadcast
  codebooks; the corpus side is a map-only scan of the codes relation
  (broadcast LUTs, zero shuffle before the top-k window). Scores are
  the cosine of the query with the RECONSTRUCTION: subspaces are
  disjoint coordinates, so the reconstruction's norm is exactly
  ``sqrt(Σ_m |c_chosen|²)`` — precomputed at encode time, no cross
  terms.

Approximation contract: scores are reconstruction cosines, not true
cosines — error is bounded by the per-subspace quantization error
(pytest pins parity with a NumPy model and recall vs brute force).
``ivf_pq_topk`` composes coarse IVF routing with ADC scoring (the
FAISS IVFPQ shape): candidates come from the probed inverted lists
only, then score as lookups.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from ..functions.vectors import dot, l2_norm
from .similarity import (
    _assign_nearest_list,
    _probe_query_lists,
    _rank_topk,
    _seed_centroids,
    _vec_dim,
)


def _subspace_slices(df: DataFrame, vec_col: str, m: int, sub: int) -> DataFrame:
    """Explode (…, vec) → (…, subspace, subvec): m rows per vector,
    each carrying one disjoint coordinate slice (plan-literal slice
    bounds — no per-row arithmetic on offsets)."""
    parts = F.array(
        *[
            F.struct(
                F.lit(s).cast("int").alias("subspace"),
                F.slice(F.col(vec_col), s * sub + 1, sub).alias("subvec"),
            )
            for s in range(m)
        ]
    )
    return df.select("*", F.explode(parts).alias("_p")).select(
        *[c for c in df.columns if c != vec_col],
        F.col("_p.subspace").alias("subspace"),
        F.col("_p.subvec").alias("subvec"),
    )


def train_pq_codebooks(
    embeddings: DataFrame,
    m: int = 8,
    k: int = 16,
    train: bool = False,
    train_iters: int = 2,
    train_sample_size: int | None = None,
) -> DataFrame:
    """Per-subspace codebooks: (subspace, centroid_id, c_subvec).

    Seeds are the IVF family's hash-slot seed vectors sliced per
    subspace — deterministic, oracle-replayable. ``train=True`` runs
    ``train_iters`` Lloyd (L2) rounds per subspace over the exploded
    subvector relation: assignment is a broadcast argmin, recompute is
    a per-(subspace, centroid, dim) mean — one shuffle of
    |corpus|·m·sub partial sums per round, no all-pairs anything.

    ``train_sample_size`` (train=True only): fit seeds AND Lloyd rounds
    on a bounded deterministic hash-sample instead of the full corpus —
    the FAISS training discipline (``_train_sample``). The r8
    measurement showed codebook fitting at 49 s of a 68 s k=256 build;
    with the sample, training cost is flat in corpus size at fixed
    (m, k) while the one unavoidable O(corpus) pass stays where it
    belongs: the encode. ``train=False`` paths are untouched (the
    oracle-replayable configuration seeds from the full corpus)."""
    dim = _vec_dim(embeddings, "embedding")
    if dim % m:
        raise ValueError(
            f"embedding dim {dim} must split evenly into m={m} subspaces "
            f"(got remainder {dim % m})"
        )
    sub = dim // m
    if train and train_sample_size is not None:
        from .similarity import _train_sample

        embeddings = _train_sample(
            embeddings.select("vec_id", "embedding"), train_sample_size
        )
    # Seeds: the engine-wide hash-slot rule (min vec_id per vec_id%97
    # slot — the oracle-replayable configuration) caps at 97 distinct
    # slots; the production codebook size k=256 seeds from vec_id%k
    # slots instead (still deterministic, min vec_id per slot — just
    # not the %97 twin the small-k oracle rows replay; large-k
    # configurations are train=True territory anyway, pinned by the
    # recall pytest rather than a SQL twin).
    if k <= 97:
        seeds = _seed_centroids(embeddings, k)  # (centroid_id, c_embedding)
    else:
        seeds = (
            embeddings.groupBy(
                (F.col("vec_id") % k).cast("int").alias("centroid_id")
            ).agg(F.min_by("embedding", "vec_id").alias("c_embedding"))
        )
    books = _subspace_slices(
        seeds.select("centroid_id", F.col("c_embedding").alias("embedding")),
        "embedding",
        m,
        sub,
    ).select("subspace", "centroid_id", F.col("subvec").alias("c_subvec"))
    if not train:
        # r12: materialize the m·k-row codebook — every consumer
        # (encode argmin, LUT build, the geometry .first() peeks)
        # otherwise re-inlines the corpus-wide seeding aggregation; the
        # committed ivfpq_residual before-plan carried 10+ copies of
        # this subtree (guide §3.3: truncate enormous plans by
        # materializing tiny intermediates). Values unchanged.
        return books.localCheckpoint()
    subs = _subspace_slices(
        embeddings.select("vec_id", "embedding"), "embedding", m, sub
    )
    for _ in range(train_iters):
        assigned = _encode_assign(subs, books).select(
            "vec_id", "subspace", F.col("code").alias("centroid_id")
        )
        recomputed = (
            subs.join(assigned, ["vec_id", "subspace"])
            .select("subspace", "centroid_id", F.posexplode("subvec").alias("d", "x"))
            .groupBy("subspace", "centroid_id", "d")
            .agg(F.avg("x").alias("mu"))
            .groupBy("subspace", "centroid_id")
            .agg(F.array_sort(F.collect_list(F.struct("d", "mu"))).alias("dm"))
            .select(
                "subspace",
                "centroid_id",
                F.transform("dm", lambda s: s["mu"]).alias("c_subvec"),
            )
        )
        # an emptied codeword keeps its previous position (standard
        # Lloyd practice — same rule as train_ivf_centroids)
        books = (
            books.select(
                "subspace", "centroid_id", F.col("c_subvec").alias("_prev")
            )
            .join(recomputed, ["subspace", "centroid_id"], "left")
            .select(
                "subspace",
                "centroid_id",
                F.coalesce("c_subvec", "_prev").alias("c_subvec"),
            )
            .localCheckpoint()
        )
    return books


def _books_scored(books: DataFrame) -> DataFrame:
    # |c|² folded once per codeword (tiny relation, broadcast)
    return books.withColumn(
        "c_nrm2",
        F.aggregate(
            F.col("c_subvec"),
            F.lit(0.0),
            lambda acc, v: acc + v.cast("double") * v.cast("double"),
        ),
    )


def _encode_assign(subs: DataFrame, books: DataFrame) -> DataFrame:
    """(vec_id, subspace, subvec) × codebooks → (vec_id, subspace,
    code, c_nrm2): per-subspace L2 argmin via the monotone objective
    ``<x,c> − |c|²/2`` (|x|² is constant within the argmin — one dot
    per codeword instead of a squared-difference fold). Ties toward the
    smaller centroid_id, the engine-wide rule."""
    scored = subs.join(F.broadcast(_books_scored(books)), "subspace").select(
        "vec_id",
        "subspace",
        "centroid_id",
        "c_nrm2",
        (
            dot(F.col("subvec"), F.col("c_subvec")) - F.col("c_nrm2") / F.lit(2.0)
        ).alias("obj"),
    )
    return scored.groupBy("vec_id", "subspace").agg(
        F.max_by(
            F.struct(F.col("centroid_id").alias("code"), F.col("c_nrm2")),
            F.struct(F.col("obj"), (-F.col("centroid_id")).alias("nc")),
        ).alias("best")
    ).select(
        "vec_id",
        "subspace",
        F.col("best.code").alias("code"),
        F.col("best.c_nrm2").alias("c_nrm2"),
    )


def pq_encode(
    embeddings: DataFrame, books: DataFrame, packed: bool = False
) -> DataFrame:
    """Corpus → (vec_id, codes, recon_norm): the compressed
    representation — m small codes plus the reconstruction's exact norm
    (disjoint subspaces ⇒ ``|x̂|² = Σ_m |c_chosen|²``, folded in
    subspace order so the double is reproducible).

    ``packed=True`` stores the codes as ONE BIGINT (code s in byte s)
    instead of ``array<int>`` — the whole compressed row is then
    (8B id, 8B codes, 8B norm): no parquet list overhead, and the ADC
    unpack is a shift-and-mask, not an array traversal. Requires
    m ≤ 8 and k ≤ 256 (one byte per code); larger geometries keep the
    array layout."""
    row = books.agg(
        F.max("subspace").alias("ms"),
        F.max("centroid_id").alias("mc"),
        F.max(F.size("c_subvec")).alias("sublen"),
    ).first()
    m = row["ms"] + 1
    if packed and (m > 8 or row["mc"] > 255):
        raise ValueError(
            f"packed codes hold one byte per subspace in a single BIGINT "
            f"— m={m} subspaces / max code {row['mc']} needs the "
            "array<int> layout (packed=False)"
        )
    dim = _vec_dim(embeddings, "embedding")
    # Same geometry guard as train_pq_codebooks, re-checked here because
    # caller-supplied books (or a different-dim corpus) would otherwise
    # mis-slice silently: F.slice past the end null-pads the dot and the
    # codes come out NULL/garbage with no error.
    if dim % m or dim // m != row["sublen"]:
        raise ValueError(
            f"embedding dim {dim} does not match the codebook geometry "
            f"(m={m} subspaces × {row['sublen']}-dim codewords requires "
            f"dim {m * row['sublen']})"
        )
    subs = _subspace_slices(
        embeddings.select("vec_id", "embedding"), "embedding", m, dim // m
    )
    assigned = _encode_assign(subs, books)
    grouped = assigned.groupBy("vec_id").agg(
        F.array_sort(
            F.collect_list(F.struct("subspace", "code", "c_nrm2"))
        ).alias("sc")
    )
    # packed: unrolled literal shifts OR-ed together — code s lands in
    # byte s. Shifts/OR are pure bit ops (never ANSI-overflow-checked),
    # unlike the previous Horner fold (acc·256 + code), whose final
    # multiply tripped ARITHMETIC_OVERFLOW whenever subspace 7's code
    # was ≥ 128 at m=8 — inside the documented m≤8/k≤256 envelope. The
    # resulting BIGINT may be negative when byte 7 ≥ 128 (two's
    # complement); _adc_score_packed masks every extracted byte with
    # 255, so sign extension never reaches a lookup.
    if packed:
        arr = F.transform("sc", lambda s: s["code"].cast("bigint"))
        codes_col = None
        for s in range(m):
            term = F.shiftleft(F.element_at(arr, s + 1), 8 * s)
            codes_col = term if codes_col is None else codes_col.bitwiseOR(term)
    else:
        codes_col = F.transform("sc", lambda s: s["code"])
    return grouped.select(
        "vec_id",
        codes_col.alias("codes"),
        F.sqrt(
            F.aggregate(
                F.transform("sc", lambda s: s["c_nrm2"]),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
        ).alias("recon_norm"),
    )


def _residuals(
    base: DataFrame, assigned: DataFrame, cents: DataFrame
) -> DataFrame:
    """(vec_id, list_id, embedding = v − centroid(list)) — the IVF-PQ
    residual relation (Jégou et al. §IV: quantize the displacement from
    the coarse centroid, not the raw vector; residual magnitudes are a
    fraction of vector magnitudes, so the same codebook budget buys
    proportionally finer cells). Broadcast join against the tiny
    centroid table; map-only."""
    return (
        base.join(assigned, "vec_id")
        .join(
            F.broadcast(cents.select(F.col("centroid_id").alias("list_id"), "c_embedding")),
            "list_id",
        )
        .select(
            "vec_id",
            "list_id",
            F.zip_with(
                F.col("embedding").cast("array<double>"),
                F.col("c_embedding"),
                lambda x, c: x - c,
            ).alias("embedding"),
        )
    )


def pq_encode_residual(
    base: DataFrame,
    assigned: DataFrame,
    cents: DataFrame,
    books: DataFrame,
    packed: bool = False,
) -> DataFrame:
    """Residual encode: codes quantize (v − centroid(list)); the stored
    ``recon_norm`` is the norm of the FULL reconstruction
    ``centroid + recon(residual)`` — exact at encode time (the chosen
    codewords are flattened in subspace order, added to the centroid
    element-wise, and normed once), so query-time cosine denominators
    need no cross-term algebra. Returns (vec_id, codes, recon_norm,
    list_id) — the same relation shape as ``pq_encode ⋈ assigned``, so
    the two layouts share every downstream path."""
    row = books.agg(
        F.max("subspace").alias("ms"), F.max("centroid_id").alias("mc")
    ).first()
    m = row["ms"] + 1
    if packed and (m > 8 or row["mc"] > 255):
        raise ValueError(
            f"packed codes hold one byte per subspace in a single BIGINT "
            f"— m={m} subspaces / max code {row['mc']} needs the "
            "array<int> layout (packed=False)"
        )
    resid = _residuals(base, assigned, cents)
    dim = _vec_dim(resid, "embedding")
    subs = _subspace_slices(
        resid.select("vec_id", "embedding"), "embedding", m, dim // m
    )
    # carry the winning codeword itself (not just its norm) so the full
    # reconstruction assembles without a second books join
    scored = subs.join(F.broadcast(_books_scored(books)), "subspace").select(
        "vec_id",
        "subspace",
        "centroid_id",
        "c_subvec",
        (
            dot(F.col("subvec"), F.col("c_subvec")) - F.col("c_nrm2") / F.lit(2.0)
        ).alias("obj"),
    )
    best = scored.groupBy("vec_id", "subspace").agg(
        F.max_by(
            F.struct(F.col("centroid_id").alias("code"), F.col("c_subvec")),
            F.struct(F.col("obj"), (-F.col("centroid_id")).alias("nc")),
        ).alias("best")
    )
    grouped = best.groupBy("vec_id").agg(
        F.array_sort(
            F.collect_list(F.struct("subspace", F.col("best").alias("b")))
        ).alias("sc")
    )
    if packed:
        arr = F.transform("sc", lambda s: s["b"]["code"].cast("bigint"))
        codes_col = None
        for s in range(m):
            term = F.shiftleft(F.element_at(arr, s + 1), 8 * s)
            codes_col = term if codes_col is None else codes_col.bitwiseOR(term)
    else:
        codes_col = F.transform("sc", lambda s: s["b"]["code"])
    recon_r = F.flatten(F.transform("sc", lambda s: s["b"]["c_subvec"]))
    coded = grouped.select("vec_id", codes_col.alias("codes"), recon_r.alias("_rr"))
    return (
        coded.join(assigned, "vec_id")
        .join(
            F.broadcast(cents.select(F.col("centroid_id").alias("list_id"), "c_embedding")),
            "list_id",
        )
        .select(
            "vec_id",
            "codes",
            l2_norm(
                F.zip_with(F.col("c_embedding"), F.col("_rr"), lambda c, r: c + r)
            ).alias("recon_norm"),
            "list_id",
        )
    )


def _query_list_cosims(query_lists: DataFrame, cents: DataFrame) -> DataFrame:
    """(query_id, list_id, qc = <q, centroid(list)>) for the probed
    pairs — the first-order term of the residual ADC score
    (<q, c + r̂> = <q, c> + Σ_s LUT[s][code_s]). |Q|·n_probe rows
    against a broadcast centroid table."""
    return query_lists.join(
        F.broadcast(cents.select(F.col("centroid_id").alias("list_id"), "c_embedding")),
        "list_id",
    ).select(
        "query_id",
        "list_id",
        dot(F.col("q_embedding"), F.col("c_embedding")).alias("qc"),
    )


def _query_luts(queries: DataFrame, books: DataFrame, m: int) -> DataFrame:
    """Queries → (query_id, lut array<array<double>>, q_norm): LUT[s][j]
    is ``<q_s, c_{s,j}>`` — the whole ADC table per query, built
    against the broadcast codebooks and sorted (subspace, centroid) so
    corpus-side lookups are positional."""
    dim = _vec_dim(queries, "q_embedding")
    qsubs = _subspace_slices(
        queries.select(
            "query_id",
            "q_embedding",
            l2_norm(F.col("q_embedding")).alias("q_norm"),
        ),
        "q_embedding",
        m,
        dim // m,
    )
    cell = qsubs.join(F.broadcast(books), "subspace").select(
        "query_id",
        "q_norm",
        "subspace",
        "centroid_id",
        dot(F.col("subvec"), F.col("c_subvec")).alias("d"),
    )
    return (
        cell.groupBy("query_id", "q_norm", "subspace")
        .agg(F.array_sort(F.collect_list(F.struct("centroid_id", "d"))).alias("cd"))
        .select(
            "query_id",
            "q_norm",
            "subspace",
            F.transform("cd", lambda s: s["d"]).alias("row"),
        )
        .groupBy("query_id", "q_norm")
        .agg(F.array_sort(F.collect_list(F.struct("subspace", "row"))).alias("sr"))
        .select(
            "query_id",
            "q_norm",
            F.transform("sr", lambda s: s["row"]).alias("lut"),
        )
    )


def _rank_topk_stable(scored: DataFrame, k: int) -> DataFrame:
    """PQ's top-k postlude: same contract as ``similarity._rank_topk``
    (desc score, neighbor-id tiebreak, NULL drop, 6-dp output) but
    ranked on the 6-dp ROUNDED score — the output's own precision.
    Quantization makes reconstruction cosines COLLIDE by construction
    (near-dup vectors encode to the same codes), so raw-double rank
    boundaries sit on fold-order noise: two engines agreeing to 1e-6
    can still order 1.0 vs 1-2ulp differently (caught by the
    embeddings fuzzer on planted dups). Exact-cosine paths keep the
    raw ranking — their scores are separated by data, not by a
    discretized codebook."""
    w = Window.partitionBy("query_id").orderBy(
        F.desc("r_score"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("r_score", F.round("score", 6))
        .withColumn("rank", F.row_number().over(w))
        .where((F.col("rank") <= k) & F.col("score").isNotNull())
        .select("query_id", "neighbor_id", "rank", F.col("r_score").alias("score"))
    )


def _adc_score(codes_col, lut_col) -> F.Column:
    """Σ_s LUT[s][codes[s]] — the ADC dot of the query with the
    reconstruction, folded in subspace order (reproducible doubles).
    ``zip_with`` pairs each code with its subspace's LUT row."""
    return F.aggregate(
        F.zip_with(codes_col, lut_col, lambda c, row: F.element_at(row, c + 1)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _adc_score_packed(codes_col, lut_col, m: int) -> F.Column:
    """The packed-BIGINT twin of ``_adc_score``: code s is byte s, so
    each lookup is a shift-and-mask — the whole sum unrolls into m
    plan-literal adds (same left-to-right order as the array fold, so
    the double is identical to the unpacked layout's)."""
    expr = None
    for s in range(m):
        term = F.element_at(
            F.element_at(lut_col, s + 1),
            (F.shiftright(codes_col, 8 * s).bitwiseAND(F.lit(255)) + 1).cast(
                "int"
            ),
        )
        expr = term if expr is None else expr + term
    return expr


def pq_topk(
    codes: DataFrame,
    books: DataFrame,
    queries: DataFrame,
    k: int = 5,
) -> DataFrame:
    """Exhaustive ADC top-k over the compressed corpus: every corpus
    row costs m table lookups + one add chain — a map-only scan of the
    codes relation against broadcast LUTs, no shuffle before the
    ranking window. Scores are reconstruction cosines
    (``ADC_dot / (|q|·|x̂|)``), rounded per the oracle contract.
    Returns (query_id, neighbor_id, rank, score). Accepts either codes
    layout — ``array<int>`` or the packed BIGINT (``pq_encode(packed=
    True)``); scores are bit-identical across layouts (same add
    order)."""
    m = books.agg(F.max("subspace")).first()[0] + 1
    luts = _query_luts(queries, books, m)
    packed = dict(codes.dtypes)["codes"] == "bigint"
    adc = (
        _adc_score_packed(F.col("codes"), F.col("lut"), m)
        if packed
        else _adc_score(F.col("codes"), F.col("lut"))
    )
    scored = (
        codes.crossJoin(F.broadcast(luts))
        .where(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.try_divide(
                adc, F.col("q_norm") * F.col("recon_norm")
            ).alias("score"),
        )
    )
    return _rank_topk_stable(scored, k)


def pq_topk_rerank(
    embeddings: DataFrame,
    codes: DataFrame,
    books: DataFrame,
    queries: DataFrame,
    k: int = 5,
    shortlist: int = 50,
) -> DataFrame:
    """The production PQ shape (Jégou et al. §V: ADC + re-ranking):
    the compressed scan nominates a ``shortlist`` per query, then ONLY
    those rows fetch their float vectors for an exact cosine re-rank.
    Cost: the full scan stays lookup-bound; the exact work is
    |Q|·shortlist vector fetches — independent of corpus size. Recall
    is the probability the true neighbor makes the shortlist, which
    converges to 1 quickly in ``shortlist/k`` (pytest pins the lift
    vs the raw ADC ranking). Returns (query_id, neighbor_id, rank,
    score) with EXACT scores — rank 1..k per query."""
    nominated = pq_topk(codes, books, queries, k=shortlist).select(
        "query_id", F.col("neighbor_id").alias("vec_id")
    )
    emb_n = embeddings.select(
        "vec_id", "embedding", l2_norm(F.col("embedding")).alias("_nrm")
    )
    q_n = queries.select(
        "query_id", "q_embedding", l2_norm(F.col("q_embedding")).alias("_qnrm")
    )
    scored = (
        nominated.join(emb_n, "vec_id")
        .join(F.broadcast(q_n), "query_id")
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.try_divide(
                dot(F.col("q_embedding"), F.col("embedding")),
                F.col("_qnrm") * F.col("_nrm"),
            ).alias("score"),
        )
    )
    return _rank_topk(scored, k)


def ivf_pq_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_centroids: int = 8,
    n_probe: int = 2,
    m: int = 8,
    pq_k: int = 16,
    books: DataFrame | None = None,
    centroids: DataFrame | None = None,
    residual: bool = False,
) -> DataFrame:
    """The FAISS-IVFPQ composition: coarse IVF routing (probe the
    query's ``n_probe`` nearest lists) + ADC scoring of ONLY the probed
    candidates. The corpus is touched twice at build (assignment +
    encode) and never at query time — candidates are code lookups.
    Seeded centroids/codebooks by default (the deterministic,
    oracle-replayable configuration).

    ``residual=True`` (Jégou et al. §IV — the FAISS IVFPQ default):
    codes quantize ``v − centroid(list)`` instead of ``v``, so the m×k
    codebook budget spends on the within-list displacement (a fraction
    of the vector's magnitude) rather than re-describing the coarse
    position the routing already knows. Scores become
    ``(<q, c_list> + ADC) / (|q|·|c_list + r̂|)`` — one extra
    |Q|·n_probe-row term, zero extra corpus-side work. Default-off so
    raw-ADC answers (the r8 oracle rows) replay unchanged; books, when
    caller-supplied, must have been trained on the SAME residual
    geometry."""
    # r12: materialize the tiny centroid table once — it is referenced
    # by the assignment, the residual relation, the recon-norm join,
    # the query probe and the qc term; uncached, each reference
    # re-inlined the whole corpus-scanning seeding subtree (the
    # committed before-plan ran 269 operators with 14 parquet scans of
    # the embeddings table). Values unchanged (guide §3.3).
    cents = centroids if centroids is not None else _seed_centroids(
        embeddings, n_centroids
    ).localCheckpoint()
    corpus_lists = _assign_nearest_list(embeddings, cents).select(
        "vec_id", "list_id"
    )
    if residual:
        base = embeddings.select("vec_id", "embedding")
        resid = _residuals(base, corpus_lists, cents)
        bks = (
            books
            if books is not None
            else train_pq_codebooks(resid.select("vec_id", "embedding"), m=m, k=pq_k)
        )
        codes = pq_encode_residual(base, corpus_lists, cents, bks)
    else:
        bks = books if books is not None else train_pq_codebooks(
            embeddings, m=m, k=pq_k
        )
        codes = pq_encode(embeddings, bks).join(corpus_lists, "vec_id")
    query_lists_full = _probe_query_lists(queries, cents, n_probe)
    query_lists = query_lists_full.select("query_id", "list_id")
    luts = _query_luts(queries, bks, m)
    adc = _adc_score(F.col("codes"), F.col("lut"))
    joined = codes.join(query_lists, "list_id").join(F.broadcast(luts), "query_id")
    if residual:
        qc = _query_list_cosims(query_lists_full, cents)
        joined = joined.join(
            F.broadcast(qc), ["query_id", "list_id"]
        )
        num = F.col("qc") + adc
    else:
        num = adc
    scored = joined.where(F.col("vec_id") != F.col("query_id")).select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        F.try_divide(num, F.col("q_norm") * F.col("recon_norm")).alias("score"),
    )
    return _rank_topk_stable(scored, k)


# --- persisted PQ index (the build/load/query/append treatment the
# --- LSH/IVF families got in r6/r7) ------------------------------------


def build_pq_index(
    embeddings: DataFrame,
    path: str,
    m: int = 8,
    k: int = 16,
    train: bool = False,
    train_iters: int = 2,
    train_sample_size: int | None = None,
    keep_vectors: bool = False,
    packed: bool = False,
) -> None:
    """Persist the compressed corpus so encoding amortizes across query
    batches. Layout under ``path``:

    - ``meta/`` — one row (m, k, dim, n): the codebook geometry every
      probe/append must replay;
    - ``books/`` — the m×k codewords (tiny, one file, broadcast by
      readers);
    - ``codes/`` — (vec_id, codes, recon_norm): the 32×-compressed
      corpus — the ONLY per-vector state a query touches;
    - ``vectors/`` — the float corpus, written only with
      ``keep_vectors=True``: the exact re-rank's refinement source.
      Off by default because not storing floats IS the compression
      contract; rerank can also take any external float relation.

    ``packed=True`` (m ≤ 8, k ≤ 256) stores codes as one BIGINT per
    vector — a 24-byte logical row with zero parquet list overhead;
    answers are bit-identical to the array layout (same add order in
    the ADC fold), pinned by pytest and the shared oracle row.
    """
    from .ann_commit import ann_commit, ann_head, gc_ann_index, new_generation, sweep_superseded_fixed

    spark = embeddings.sparkSession
    head = ann_head(spark, path)
    parent = head["v"] if head else None
    gen, gdir = new_generation(path)
    base = embeddings.select("vec_id", "embedding")
    dim = _vec_dim(base, "embedding")
    n = base.count()
    books = train_pq_codebooks(
        base, m=m, k=k, train=train, train_iters=train_iters,
        train_sample_size=train_sample_size,
    )
    (
        spark.createDataFrame(
            [(m, k, dim, n, packed)],
            "m int, k int, dim int, n bigint, packed boolean",
        )
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(f"{gdir}/meta")
    )
    books.coalesce(1).write.mode("overwrite").parquet(f"{gdir}/books")
    saved_books = spark.read.schema(
        "subspace int, centroid_id int, c_subvec array<double>"
    ).parquet(f"{gdir}/books")
    pq_encode(base, saved_books, packed=packed).write.mode("overwrite").parquet(
        f"{gdir}/codes"
    )
    dirs = {
        "meta": f"{gen}/meta",
        "books": f"{gen}/books",
        "codes": [f"{gen}/codes"],
    }
    if keep_vectors:
        base.write.mode("overwrite").parquet(f"{gdir}/vectors")
        dirs["vectors"] = [f"{gen}/vectors"]
    # one atomic visibility switch for the whole artifact set: a crash
    # anywhere above leaves the previous commit serving consistent
    # (meta, books, codes) — never new-books/old-codes.
    ann_commit(spark, path, "pq", dirs, parent)
    gc_ann_index(spark, path)
    sweep_superseded_fixed(spark, path, "pq")


def load_pq_meta(spark, path: str) -> dict:
    from .ann_commit import read_artifact

    row = read_artifact(
        spark, path, "meta", "m int, k int, dim int, n bigint, packed boolean"
    ).first()
    out = row.asDict()
    out["packed"] = bool(out["packed"])  # pre-packed-era meta reads NULL
    return out


def load_pq_books(spark, path: str) -> DataFrame:
    from .ann_commit import read_artifact

    return read_artifact(
        spark, path, "books", "subspace int, centroid_id int, c_subvec array<double>"
    )


def pq_topk_indexed(
    spark,
    path: str,
    queries: DataFrame,
    k: int = 5,
    shortlist: int | None = None,
    embeddings: DataFrame | None = None,
) -> DataFrame:
    """Serve ADC top-k from a persisted index: the corpus contributes
    only its ``codes/`` scan — no float vector is read unless
    ``shortlist`` asks for the exact re-rank, which fetches the
    nominated rows from the index's ``vectors/`` (if kept at build) or
    a caller-supplied ``embeddings`` relation."""
    books = load_pq_books(spark, path)
    meta = load_pq_meta(spark, path)
    from .ann_commit import apply_tombstones, read_artifact, resolve_artifact

    codes_type = "bigint" if meta["packed"] else "array<int>"
    codes = apply_tombstones(
        spark,
        path,
        read_artifact(
            spark,
            path,
            "codes",
            f"vec_id bigint, codes {codes_type}, recon_norm double",
        ),
    )
    if shortlist is None:
        return pq_topk(codes, books, queries, k=k)
    if embeddings is None:
        if not resolve_artifact(spark, path, "vectors"):
            raise ValueError(
                f"PQ index at {path} was built without keep_vectors and "
                "no `embeddings` relation was passed — the exact re-rank "
                "needs a float source. Rebuild with keep_vectors=True or "
                "pass the original embeddings."
            )
        embeddings = read_artifact(
            spark, path, "vectors", "vec_id bigint, embedding array<float>"
        )
    _ = meta  # geometry is implicit in books/codes; meta guards appends
    return pq_topk_rerank(embeddings, codes, books, queries, k=k, shortlist=shortlist)


def append_pq_index(embeddings: DataFrame, path: str) -> None:
    """Grow a persisted PQ index by O(new batch): encode ONLY the batch
    against the STORED codebooks and append its codes. Exact by
    construction, same argument as LSH appends: codewords are stored
    parameters, so codes(build ∪ batch) ≡ codes(build) ∪ codes(batch)
    — there is no drift caveat (unlike IVF appends, whose frozen
    coarse centroids stop tracking the distribution). The r9 commit
    protocol makes the append atomic: the count update and the batch's
    codes land in ONE CAS-fenced commit, and concurrent appenders are
    refused loudly. ``vec_id`` uniqueness and replay discipline are
    the caller's contract, as with the other appends."""
    from .ann_commit import adopt_legacy, ann_commit, ann_head, gc_ann_index, new_generation, resolve_artifact

    spark = embeddings.sparkSession
    meta = load_pq_meta(spark, path)
    base = embeddings.select("vec_id", "embedding")
    dim = _vec_dim(base, "embedding")
    if dim != meta["dim"]:
        raise ValueError(
            f"append_pq_index: batch dimension {dim} != index dimension "
            f"{meta['dim']} at {path} — codebooks are dimension-specific; "
            "rebuild the index or fix the batch."
        )
    head = ann_head(spark, path)
    if head is None:
        adopt_legacy(spark, path, "pq")
        head = ann_head(spark, path)
    n_new = base.count()
    gen, gdir = new_generation(path)
    (
        spark.createDataFrame(
            [(meta["m"], meta["k"], meta["dim"], meta["n"] + n_new, meta["packed"])],
            "m int, k int, dim int, n bigint, packed boolean",
        )
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(f"{gdir}/meta")
    )
    books = load_pq_books(spark, path)
    pq_encode(base, books, packed=meta["packed"]).write.mode("overwrite").parquet(
        f"{gdir}/codes"
    )
    dirs = {
        **head["dirs"],
        "meta": f"{gen}/meta",
        "codes": head["dirs"]["codes"] + [f"{gen}/codes"],
    }
    if resolve_artifact(spark, path, "vectors"):
        base.write.mode("overwrite").parquet(f"{gdir}/vectors")
        dirs["vectors"] = head["dirs"]["vectors"] + [f"{gen}/vectors"]
    ann_commit(spark, path, "pq", dirs, head["v"])
    gc_ann_index(spark, path)


# --- persisted IVF-PQ composed index (the FAISS-IVFPQ serving shape:
# --- coarse routing partitions + PQ codes, frozen artifacts) ----------


def build_ivf_pq_index(
    embeddings: DataFrame,
    path: str,
    n_centroids: int = 8,
    m: int = 8,
    k: int = 16,
    train: bool = False,
    train_iters: int = 2,
    train_init: str = "hash",
    train_sample_size: int | None = None,
    packed: bool = False,
    keep_vectors: bool = False,
    skew_guard: str = "warn",
    residual: bool = False,
) -> None:
    """Persist the composed IVF+PQ index — the configuration a real
    100 TB retrieval system actually runs (FAISS IVFPQ): coarse
    centroids route probes to a fraction of the corpus, PQ codes make
    the routed scan lookup-bound. The corpus is touched twice at build
    (assignment + encode) and NEVER at query time.

    Layout under ``path`` (reference parity: the reference's closest
    artifact is its single uploaded index blob — this is that idea as
    a partition-pruned lake table):

    - ``meta/`` — one row (n_centroids, m, k, dim, n, packed);
    - ``centroids/`` — the coarse router (tiny, ``array<double>`` —
      the same schema/read path as ``build_ivf_index``);
    - ``books/`` — the m×k PQ codewords (tiny, broadcast by probes);
    - ``codes/`` — (vec_id, codes, recon_norm) **partitioned by
      list_id**: a probe's ``n_probe``-of-``n_centroids`` list scan is
      parquet partition pruning over rows that are ~24 logical bytes
      each — the two compressions (prune fraction × code width)
      multiply;
    - ``vectors/`` — floats for the exact re-rank, only with
      ``keep_vectors=True`` (not storing floats IS the compression
      contract; rerank can take any external float relation).

    Both artifacts are written FIRST and read BACK before any
    corpus-sized job, so the persisted values are by construction the
    ones the codes were built against (the ``build_ivf_index`` rule).
    ``residual=False`` (default) encodes RAW vectors — the same
    contract as the in-plan ``ivf_pq_topk``, so indexed and in-plan
    answers are identical for identical centroids/books (the oracle
    row pins it). ``residual=True`` encodes ``v − centroid(list)``
    (Jégou et al. §IV, the FAISS IVFPQ default) — the codebooks are
    trained on the residual relation (assignment must precede codebook
    fitting, so the artifact write order flips: centroids first, read
    back, assign, then books), and ``meta.residual`` tells probes to
    add the ``<q, c_list>`` first-order term back at scoring. Recall
    lift over raw ADC is pinned by pytest at k=16 AND k=256.
    """
    from .ann_commit import ann_commit, ann_head, gc_ann_index, new_generation, sweep_superseded_fixed
    from .similarity import _train_or_seed

    spark = embeddings.sparkSession
    head = ann_head(spark, path)
    parent = head["v"] if head else None
    gen, gdir = new_generation(path)
    base = embeddings.select("vec_id", "embedding")
    dim = _vec_dim(base, "embedding")
    n = base.count()
    cents = _train_or_seed(
        base, n_centroids, train, train_iters, train_init,
        train_sample_size=train_sample_size,
    )
    (
        cents.select(
            "centroid_id",
            F.col("c_embedding").cast("array<double>").alias("c_embedding"),
        )
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(f"{gdir}/centroids")
    )
    saved_cents = spark.read.schema(
        "centroid_id int, c_embedding array<double>"
    ).parquet(f"{gdir}/centroids")
    assigned = _assign_nearest_list(base, saved_cents).select("vec_id", "list_id")
    if residual:
        # books describe the residual geometry: fit AFTER assignment,
        # against the read-back centroids the codes will subtract
        assigned = assigned.localCheckpoint()
        book_input = _residuals(base, assigned, saved_cents).select(
            "vec_id", "embedding"
        )
    else:
        book_input = base
    books = train_pq_codebooks(
        book_input, m=m, k=k, train=train, train_iters=train_iters,
        train_sample_size=train_sample_size,
    )
    books.coalesce(1).write.mode("overwrite").parquet(f"{gdir}/books")
    (
        spark.createDataFrame(
            [(n_centroids, m, k, dim, n, packed, residual)],
            "n_centroids int, m int, k int, dim int, n bigint, "
            "packed boolean, residual boolean",
        )
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(f"{gdir}/meta")
    )
    saved_books = spark.read.schema(
        "subspace int, centroid_id int, c_subvec array<double>"
    ).parquet(f"{gdir}/books")
    encoded = (
        pq_encode_residual(base, assigned, saved_cents, saved_books, packed=packed)
        if residual
        else pq_encode(base, saved_books, packed=packed).join(assigned, "vec_id")
    )
    (
        encoded
        # same rationale as build_ivf_index: rebalance pins each list to
        # few tasks without the one-file-per-(task,list) explosion
        .hint("rebalance", "list_id")
        .write.mode("overwrite")
        .partitionBy("list_id")
        .parquet(f"{gdir}/codes")
    )
    dirs = {
        "meta": f"{gen}/meta",
        "centroids": f"{gen}/centroids",
        "books": f"{gen}/books",
        "codes": [f"{gen}/codes"],
    }
    if keep_vectors:
        base.write.mode("overwrite").parquet(f"{gdir}/vectors")
        dirs["vectors"] = [f"{gen}/vectors"]
    # one atomic visibility switch for all five artifacts: a crash at
    # ANY prior point leaves the previous commit serving a consistent
    # set — never new-centroids/old-codes (the pre-r9 torn state).
    ann_commit(spark, path, "ivf_pq", dirs, parent)
    gc_ann_index(spark, path)
    sweep_superseded_fixed(spark, path, "ivf_pq")
    from .similarity import _guard_list_occupancy

    _guard_list_occupancy(
        spark, f"{gdir}/codes", n_centroids, "build_ivf_pq_index", skew_guard
    )


def load_ivf_pq_meta(spark, path: str) -> dict:
    from .ann_commit import read_artifact

    row = read_artifact(
        spark,
        path,
        "meta",
        "n_centroids int, m int, k int, dim int, n bigint, "
        "packed boolean, residual boolean",
    ).first()
    out = row.asDict()
    out["residual"] = bool(out["residual"])  # pre-residual-era meta reads NULL
    return out


def ivf_pq_topk_indexed(
    spark,
    path: str,
    queries: DataFrame,
    k: int = 5,
    n_probe: int = 2,
    shortlist: int | None = None,
    embeddings: DataFrame | None = None,
) -> DataFrame:
    """Serve IVF-PQ top-k from the persisted index: route each query to
    its ``n_probe`` nearest lists (broadcast centroid table), plant the
    probed list ids as a literal ``IN`` predicate on the partition
    column (parquet partition pruning — unprobed lists' files are never
    opened), and ADC-score ONLY the probed codes against broadcast
    per-query lookup tables. Zero shuffle before the top-k window; the
    float corpus is never read unless ``shortlist`` asks for the exact
    re-rank (served from ``vectors/`` or a caller-supplied
    ``embeddings`` relation — only the nominated rows fetch floats).

    A ``residual=True`` index (``meta.residual``) scores as
    ``(<q, c_list> + ADC) / (|q|·recon_norm)``: the first-order term is
    one broadcast join of the probed (query, list) pairs against the
    centroid table — |Q|·n_probe rows — on top of the identical
    partition-pruned code scan."""
    from .similarity import load_ivf_centroids

    meta = load_ivf_pq_meta(spark, path)
    cents = load_ivf_centroids(spark, path)
    books = load_pq_books(spark, path)
    query_lists_full = _probe_query_lists(queries, cents, n_probe)
    query_lists = query_lists_full.select("query_id", "list_id")
    probed = sorted(
        r["list_id"] for r in query_lists.select("list_id").distinct().collect()
    )
    from .ann_commit import apply_tombstones, read_artifact, resolve_artifact

    codes_type = "bigint" if meta["packed"] else "array<int>"
    codes = apply_tombstones(
        spark,
        path,
        read_artifact(
            spark,
            path,
            "codes",
            f"vec_id bigint, codes {codes_type}, recon_norm double, list_id int",
        ).where(F.col("list_id").isin(probed)),
    )
    luts = _query_luts(queries, books, meta["m"])
    adc = (
        _adc_score_packed(F.col("codes"), F.col("lut"), meta["m"])
        if meta["packed"]
        else _adc_score(F.col("codes"), F.col("lut"))
    )
    joined = codes.join(query_lists, "list_id").join(F.broadcast(luts), "query_id")
    if meta["residual"]:
        qc = _query_list_cosims(query_lists_full, cents)
        joined = joined.join(F.broadcast(qc), ["query_id", "list_id"])
        num = F.col("qc") + adc
    else:
        num = adc
    scored = joined.where(F.col("vec_id") != F.col("query_id")).select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        F.try_divide(num, F.col("q_norm") * F.col("recon_norm")).alias("score"),
    )
    ranked = _rank_topk_stable(scored, shortlist if shortlist is not None else k)
    if shortlist is None:
        return ranked
    if embeddings is None:
        if not resolve_artifact(spark, path, "vectors"):
            raise ValueError(
                f"IVF-PQ index at {path} was built without keep_vectors "
                "and no `embeddings` relation was passed — the exact "
                "re-rank needs a float source. Rebuild with "
                "keep_vectors=True or pass the original embeddings."
            )
        embeddings = read_artifact(
            spark, path, "vectors", "vec_id bigint, embedding array<float>"
        )
    nominated = ranked.select("query_id", F.col("neighbor_id").alias("vec_id"))
    emb_n = embeddings.select(
        "vec_id", "embedding", l2_norm(F.col("embedding")).alias("_nrm")
    )
    q_n = queries.select(
        "query_id", "q_embedding", l2_norm(F.col("q_embedding")).alias("_qnrm")
    )
    exact = (
        nominated.join(emb_n, "vec_id")
        .join(F.broadcast(q_n), "query_id")
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.try_divide(
                dot(F.col("q_embedding"), F.col("embedding")),
                F.col("_qnrm") * F.col("_nrm"),
            ).alias("score"),
        )
    )
    return _rank_topk(exact, k)


def append_ivf_pq_index(embeddings: DataFrame, path: str) -> None:
    """Grow a persisted IVF-PQ index by O(new batch): assign the batch
    against the FROZEN coarse centroids, encode it against the FROZEN
    codebooks, and append its rows to the ``codes/`` list partitions.
    The composition inherits both parents' contracts: PQ-side appends
    are exact by construction (codewords are stored parameters —
    codes(build ∪ batch) ≡ codes(build) ∪ codes(batch)); IVF-side
    appends carry the FAISS-``add`` drift caveat (frozen centroids stop
    tracking the distribution — skewed ``codes/list_id=`` partition
    sizes are the rebuild signal, observable from the file listing).
    The r9 commit protocol makes the append atomic — count update and
    codes in ONE CAS-fenced commit, concurrent appenders refused
    loudly; ``vec_id`` uniqueness and replay discipline are the
    caller's contract, as with every append."""
    from .ann_commit import adopt_legacy, ann_commit, ann_head, gc_ann_index, new_generation, resolve_artifact
    from .similarity import _assign_nearest_list, load_ivf_centroids

    spark = embeddings.sparkSession
    meta = load_ivf_pq_meta(spark, path)
    base = embeddings.select("vec_id", "embedding")
    dim = _vec_dim(base, "embedding")
    if dim != meta["dim"]:
        raise ValueError(
            f"append_ivf_pq_index: batch dimension {dim} != index "
            f"dimension {meta['dim']} at {path} — centroids and "
            "codebooks are dimension-specific; rebuild the index or fix "
            "the batch."
        )
    head = ann_head(spark, path)
    if head is None:
        adopt_legacy(spark, path, "ivf_pq")
        head = ann_head(spark, path)
    n_new = base.count()
    gen, gdir = new_generation(path)
    (
        spark.createDataFrame(
            [
                (
                    meta["n_centroids"],
                    meta["m"],
                    meta["k"],
                    meta["dim"],
                    meta["n"] + n_new,
                    meta["packed"],
                    meta["residual"],
                )
            ],
            "n_centroids int, m int, k int, dim int, n bigint, "
            "packed boolean, residual boolean",
        )
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(f"{gdir}/meta")
    )
    cents = load_ivf_centroids(spark, path)
    books = load_pq_books(spark, path)
    assigned = _assign_nearest_list(base, cents).select("vec_id", "list_id")
    encoded = (
        # residual index: the batch encodes against the SAME frozen
        # geometry (centroid subtraction + residual codebooks)
        pq_encode_residual(base, assigned, cents, books, packed=meta["packed"])
        if meta["residual"]
        else pq_encode(base, books, packed=meta["packed"]).join(assigned, "vec_id")
    )
    (
        encoded
        .hint("rebalance", "list_id")
        .write.mode("overwrite")
        .partitionBy("list_id")
        .parquet(f"{gdir}/codes")
    )
    dirs = {
        **head["dirs"],
        "meta": f"{gen}/meta",
        "codes": head["dirs"]["codes"] + [f"{gen}/codes"],
    }
    if resolve_artifact(spark, path, "vectors"):
        base.write.mode("overwrite").parquet(f"{gdir}/vectors")
        dirs["vectors"] = head["dirs"]["vectors"] + [f"{gen}/vectors"]
    ann_commit(spark, path, "ivf_pq", dirs, head["v"])
    gc_ann_index(spark, path)
