"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` maps every implemented operator from SURVEY.md §2 (O-rows)
and §2.b (X-rows) to a (spark, sf_dir) → DataFrame callable;
``oracle_sql()`` provides the DuckDB twin for each. Column names and
integer/double types are aligned on both sides (BIGINT for counts/ids,
doubles rounded to 6 dp before the driver's 9-sig-digit canonicalization).

The DuckDB twins intentionally re-express the *semantics* (not the Spark
plan): tokenization via regexp+string_split, hashes via the portable
md5-hex60 integer (functions/hashing.py), LSH constructions replayed
arithmetically.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
import pyspark.sql.functions as F

from map_reduce_using_cloud_functions_spark.sources import load_table, load_tables, documents_as_corpus
from map_reduce_using_cloud_functions_spark.operators import index as ix
from map_reduce_using_cloud_functions_spark.operators import dedup as dd
from map_reduce_using_cloud_functions_spark.operators import similarity as sim
from map_reduce_using_cloud_functions_spark.operators import text_analysis as ta
from map_reduce_using_cloud_functions_spark.operators import multimodal as mm
from map_reduce_using_cloud_functions_spark.operators import prep as pp
from map_reduce_using_cloud_functions_spark.plans import relational as rel
from map_reduce_using_cloud_functions_spark.plans import events as ev


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the reference's whole job — inverted index over the
    corpus (SURVEY §2 O7–O14) + the vocabulary-level rollup."""
    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    postings = ix.build_index(documents_as_corpus(docs))
    return (
        postings.groupBy("word")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("count").alias("total_count"),
        )
        .orderBy(F.desc("total_count"), F.asc("word"))
        .limit(100)
    )


# ---------------------------------------------------------------- helpers

def _corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    return documents_as_corpus(load_table(spark, sf_dir, "documents"))


def _q_index_build(spark, sf):
    return ix.build_index(_corpus(spark, sf))


def _q_index_partition_invariance(spark, sf):
    # O5/O6/O11: result must be invariant to input partitioning — the
    # property the reference's splitter/LPT/routing machinery preserves.
    return ix.build_index(_corpus(spark, sf).repartition(8))


def _q_index_lookup(spark, sf):
    return ix.lookup(_q_index_build(spark, sf), "The!")  # normalization folds to 'the'


def _q_index_incremental_additive(spark, sf):
    # O15 reference bit-parity: re-indexing docs < 50 on top of the full
    # index ADDS their counts (the reference's double-count behavior,
    # master/main.py:112-121).
    corpus = _corpus(spark, sf)
    old = ix.build_index(corpus)
    delta = ix.build_index(corpus.where(F.col("document").cast("bigint") < 50))
    return ix.merge_index(old, delta, additive=True)


def _q_index_incremental_upsert(spark, sf):
    # O15 sane default: overlapping re-index replaces per-document
    # postings; two overlapping batches == one-shot build.
    corpus = _corpus(spark, sf)
    old = ix.build_index(corpus.where(F.col("document").cast("bigint") < 300))
    delta = ix.build_index(corpus.where(F.col("document").cast("bigint") >= 250))
    return ix.merge_index(old, delta, additive=False)


def _tables(spark, sf):
    return load_tables(spark, sf)


def _q_corpus_upsample_shuffle(spark, sf):
    # Epoch upsampling (en 2.4 epochs, zh 1.5) composed with the
    # deterministic global shuffle — the 'repeat then permute' step of a
    # pretraining data schedule. Replicas get a distinct shuffle key via
    # doc_id#epoch so epochs interleave instead of clustering.
    ups = pp.upsample_strata(
        load_table(spark, sf, "documents"), {"en": 2.4, "zh": 1.5}
    ).withColumn(
        "replica_id",
        F.concat(
            F.col("doc_id").cast("string"), F.lit("#"), F.col("epoch").cast("string")
        ),
    )
    return pp.deterministic_shuffle(ups, key_col="replica_id").select(
        "doc_id", "stratum", "epoch", "shuffle_key"
    )


def _q_corpus_decontaminate(spark, sf):
    # Benchmark decontamination: docs with doc_id % 20 == 0 play the
    # held-out eval set; every other doc is flagged if it shares any
    # 8-token gram with it (planted near-dups guarantee real hits).
    docs = load_table(spark, sf, "documents")
    bench = docs.where(F.col("doc_id") % 20 == 0)
    train = docs.where(F.col("doc_id") % 20 != 0)
    return pp.decontaminate(train, bench, n=8)


def _q_events_asof_join(spark, sf):
    # Point-in-time lookup: each purchase gets the value/time of the
    # user's most recent click at-or-before it. Clicks deduplicated per
    # (user, ts) so the as-of tie semantics are engine-independent.
    from map_reduce_using_cloud_functions_spark.operators.joins import as_of_join

    events = load_table(spark, sf, "events")
    purchases = events.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", F.round("value", 6).alias("purchase_value")
    )
    clicks = (
        events.where(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.round(F.max("value"), 6).alias("click_value"))
    )
    return as_of_join(
        purchases, clicks, key="user_id", ts_col="ts", value_cols=("click_value",)
    ).select(
        "event_id", "user_id", "purchase_value", "asof_click_value", "asof_ts"
    )


def _q_training_corpus_prep(spark, sf):
    from map_reduce_using_cloud_functions_spark.operators.pipelines import (
        prepare_training_corpus,
    )

    return prepare_training_corpus(load_table(spark, sf, "documents"), min_quality=0.35)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Exactly 50 entries — the driver checks the first 50 in dict
    order, so the dict is capped there and ordered family-flagship-first
    (index → dedup → text → prep → multimodal → pipeline → ANN →
    events → relational). Retirees (operator classes already covered by
    a remaining row): round 1 — index_distinct_words,
    customers_with_big_orders, running_order_totals,
    top_expensive_orders, cube_order_counts, orders_above_global_avg,
    big_customers_having, events_funnel; round 2 (making room for the
    prep family) — segment_order_stats, part_type_margins,
    order_priority_counts, deterministic_sample_agg (hash-sampling
    class now judged via sample_corpus_mix), top_customer_per_nation
    (per-group-extreme class judged via top_orders_per_customer; made
    room for corpus_upsample_shuffle), index_top_words (the identical
    rollup runs as ``entry()`` under the driver's per-round smoke
    check; agg + global-sort classes stay pinned by index_build and
    index_lookup — made room for corpus_decontaminate),
    events_sliding_daily (windowed-agg class stays pinned by
    events_tumbling_hourly + running-frame windows by the sessionize
    lag plan; made room for events_asof_join, an operator class Spark
    has no built-in for), dedup_minhash_signatures (an intermediate
    relation whose values ride through the judged dedup_minhash_pairs
    band hashes, partition-invariance pinned in pytest; made room for
    dedup_simhash_pairs). All implementations stay
    (plans/relational.py, plans/events.py) with sql-twin pytest
    coverage (tests/test_joins_and_sql.py)."""
    return {
        # ---- inverted-index core (SURVEY §2 O1–O17) ----
        "index_build": _q_index_build,
        "index_partition_invariance": _q_index_partition_invariance,
        "index_lookup": _q_index_lookup,
        "index_incremental_additive": _q_index_incremental_additive,
        "index_incremental_upsert": _q_index_incremental_upsert,
        # ---- dedup family (X1/X2) ----
        "dedup_exact_groups": lambda s, d: dd.exact_dedup_groups(load_table(s, d, "documents")),
        "dedup_minhash_pairs": lambda s, d: dd.minhash_dedup_pairs(load_table(s, d, "documents"), threshold=0.25),
        "dedup_clusters": lambda s, d: dd.dedup_clusters(
            dd.minhash_dedup_pairs(load_table(s, d, "documents"), threshold=0.25)
        ),
        "near_dedup_survivors": lambda s, d: dd.near_dedup(
            load_table(s, d, "documents"), threshold=0.25
        ).select("doc_id"),
        "dedup_simhash": lambda s, d: dd.simhash_fingerprints(load_table(s, d, "documents")),
        "dedup_simhash_pairs": lambda s, d: dd.simhash_pairs(load_table(s, d, "documents"), max_hamming=3),
        # judged in the scale-safe max_df-guarded config: tokens present
        # in more than half the corpus never enter the inverted-index
        # join (the unguarded exact variant stays available as a
        # ground-truth tool; see operators/dedup.py docstring).
        "dedup_jaccard_pairs": lambda s, d: dd.jaccard_token_pairs(
            load_table(s, d, "documents"), threshold=0.9, max_df_frac=0.5
        ),
        "dedup_shingle_jaccard": lambda s, d: dd.jaccard_shingle_pairs(load_table(s, d, "documents"), threshold=0.2),
        "dedup_embedding_pairs": lambda s, d: sim.pairwise_near_dup(load_table(s, d, "embeddings"), threshold=0.45),
        # ---- text analysis (X4) ----
        # The three featurizer queries run through the map-only
        # text_features (zero-shuffle; value-identical to the
        # explode+groupBy operators, which remain as the semantic twins
        # pinned by tests/test_prep.py parity).
        "text_stats": lambda s, d: ta.text_features(load_table(s, d, "documents")).select(
            "doc_id", "n_tokens", "n_distinct", "avg_token_len", "stopword_ratio", "digit_ratio"
        ),
        "text_quality": lambda s, d: ta.text_features(load_table(s, d, "documents")).select(
            "doc_id", "quality"
        ),
        "text_language_guess": lambda s, d: ta.text_features(load_table(s, d, "documents")).select(
            "doc_id", "lang_guess", "best_score"
        ),
        "text_token_counts": lambda s, d: ta.token_counts(load_table(s, d, "documents")),
        "text_fingerprints": lambda s, d: ta.fingerprints(load_table(s, d, "documents")),
        "text_tfidf": lambda s, d: ta.tf_idf(load_table(s, d, "documents")),
        # ---- training-data prep (X4 family: chunk / scrub / mix) ----
        "text_chunks": lambda s, d: pp.chunk_documents(load_table(s, d, "documents")),
        "text_pii_redaction": lambda s, d: pp.redact_pii(load_table(s, d, "documents")),
        "sample_corpus_mix": lambda s, d: pp.sample_corpus_mix(load_table(s, d, "documents")),
        "token_packing": lambda s, d: pp.pack_sequences(load_table(s, d, "documents")),
        "corpus_upsample_shuffle": _q_corpus_upsample_shuffle,
        "corpus_decontaminate": _q_corpus_decontaminate,
        # ---- multimodal (X5) ----
        "multimodal_asset_stats": lambda s, d: mm.asset_stats(mm.build_assets(load_table(s, d, "documents"))),
        "multimodal_decode": lambda s, d: mm.decode_assets(mm.build_assets(load_table(s, d, "documents"))),
        # ---- composed pipeline (X1+X4 end-to-end) ----
        "training_corpus_prep": _q_training_corpus_prep,
        # ---- similarity search (X3) ----
        "ann_topk_bruteforce": lambda s, d: sim.brute_force_topk(
            load_table(s, d, "embeddings"),
            sim.queries_from_ids(load_table(s, d, "embeddings"), 8),
        ),
        "ann_topk_lsh": lambda s, d: sim.lsh_bucketed_topk(
            load_table(s, d, "embeddings"),
            sim.queries_from_ids(load_table(s, d, "embeddings"), 8),
        ),
        "ann_topk_vectorized": lambda s, d: sim.brute_force_topk_vectorized(
            load_table(s, d, "embeddings"),
            sim.queries_from_ids(load_table(s, d, "embeddings"), 8),
        ),
        "ann_topk_ivf": lambda s, d: sim.ivf_topk(
            load_table(s, d, "embeddings"),
            sim.queries_from_ids(load_table(s, d, "embeddings"), 8),
        ),
        # ---- event/window analytics (X7 batch twins) ----
        "events_tumbling_hourly": lambda s, d: ev.tumbling_hourly(load_table(s, d, "events")),
        "events_sessionize": lambda s, d: ev.sessionize(load_table(s, d, "events")),
        "events_asof_join": _q_events_asof_join,
        "events_json_rollup": lambda s, d: ev.json_props_rollup(load_table(s, d, "events")),
        "events_pivot": lambda s, d: ev.events_pivot(load_table(s, d, "events")),
        "events_approx_distinct": lambda s, d: ev.approx_distinct_users_checked(load_table(s, d, "events")),
        # ---- relational core (X6) ----
        "q1_pricing_summary": lambda s, d: rel.q1_pricing_summary(_tables(s, d)),
        "revenue_by_region": lambda s, d: rel.revenue_by_region(_tables(s, d)),
        "customers_without_orders": lambda s, d: rel.customers_without_orders(_tables(s, d)),
        "top_orders_per_customer": lambda s, d: rel.top_orders_per_customer(_tables(s, d)),
        "nation_set_ops": lambda s, d: rel.nation_set_ops(_tables(s, d)),
        "rollup_acctbal": lambda s, d: rel.rollup_acctbal(_tables(s, d)),
        "scalar_function_sampler": lambda s, d: rel.scalar_function_sampler(_tables(s, d)),
        "customer_order_left_join": lambda s, d: rel.customer_order_left_join(_tables(s, d)),
        "order_value_statistics": lambda s, d: rel.order_value_statistics(_tables(s, d)),
        "price_percentiles": lambda s, d: rel.price_percentiles(_tables(s, d)),
        "embedding_array_features": lambda s, d: rel.embedding_array_features(_tables(s, d)),
    }


# ------------------------------------------------------------- oracle SQL

# Tokenizer twin (functions/text.py TOKEN_SQL): reference-exact pipeline,
# including Python's wider-than-ASCII \s set (see functions/text.py).
from map_reduce_using_cloud_functions_spark.functions.text import PY_WS_RE2

# Brace-escaped so .format(col=...) leaves the RE2 \x{..} escapes alone.
_PY_WS_RE2 = PY_WS_RE2.replace("{", "{{").replace("}", "}}")
# ONE definition of the cross-engine hash twin (functions/hashing.py
# keeps it adjacent to the Spark expression); re-exported under the
# name the oracle templates below and tools/{retired,extra}_queries use.

_TOKS_LIST = (
    "list_filter(string_split(regexp_replace(lower(regexp_replace({col}, '" + _PY_WS_RE2 + "', ' ', 'g')),"
    " '[^a-z0-9 ]', '', 'g'), ' '), w -> w <> '')"
)
from map_reduce_using_cloud_functions_spark.functions.hashing import (
    HEX64_SQL as _HEX64,
)

_TOK_CTE = f"""
WITH tok AS (
  SELECT cast(doc_id AS VARCHAR) AS document,
         unnest({_TOKS_LIST.format(col="text")}) AS word
  FROM documents
)
"""

_POSTINGS_CTE = (
    _TOK_CTE
    + ", postings AS (SELECT word, document, count(*) AS count FROM tok GROUP BY 1, 2)"
)

# Shared doc→token-list and shingle CTEs for dedup oracles.
_DOCTOKS = f"SELECT doc_id, {_TOKS_LIST.format(col='text')} AS l FROM documents"
_SHINGLES = f"""
WITH doctoks AS ({_DOCTOKS}),
grams AS (
  SELECT doc_id, l, unnest(range(1, greatest(len(l) - 2, 0) + 1)) AS i
  FROM doctoks WHERE len(l) >= 3
),
shingles AS (
  SELECT DISTINCT doc_id, (l[i] || ' ' || l[i+1] || ' ' || l[i+2]) AS shingle
  FROM grams
)
"""

# MinHash family twin (operators/dedup.py): base = md5-hex60 of the
# shingle mod p (p = 2^31-1), then h_i = ((2i+1)·base + 7919i+13) mod p.
_MINHASH_SQL = (
    _SHINGLES
    + f""",
based AS (
  SELECT doc_id, ({_HEX64.format(col="shingle")} % 2147483647) AS h FROM shingles
),
seeded AS (
  SELECT doc_id, h, unnest(range(0, 16)) AS seed FROM based
),
sigs AS (
  SELECT doc_id, seed,
         min(((2 * seed + 1) * h + 7919 * seed + 13) % 2147483647) AS minhash
  FROM seeded GROUP BY 1, 2
)
"""
)

_LSH_SKETCH = f"""
comp AS (
  SELECT vec_id, embedding, unnest(range(0, 8)) AS plane FROM embeddings
),
dims AS (
  SELECT vec_id, plane, unnest(range(1, len(embedding) + 1)) AS i, embedding
  FROM comp
),
dots AS (
  SELECT vec_id, plane,
         sum(embedding[i]::DOUBLE *
             ((({_HEX64.format(col="(plane::VARCHAR || '|' || (i-1)::VARCHAR)")}) % 2001 - 1000)::DOUBLE / 1000.0)) AS dot
  FROM dims GROUP BY 1, 2
),
buckets AS (
  SELECT vec_id, sum(CASE WHEN dot > 0 THEN (1::BIGINT << plane) ELSE 0 END)::BIGINT AS bucket
  FROM dots GROUP BY 1
)
"""

_COS = "(list_inner_product({a}::DOUBLE[], {b}::DOUBLE[]) / (sqrt(list_inner_product({a}::DOUBLE[], {a}::DOUBLE[])) * sqrt(list_inner_product({b}::DOUBLE[], {b}::DOUBLE[]))))"


def oracle_sql() -> dict[str, str]:
    sql: dict[str, str] = {}

    sql["index_build"] = _POSTINGS_CTE + "SELECT word, document, count FROM postings"
    sql["index_partition_invariance"] = sql["index_build"]
    sql["index_lookup"] = (
        _POSTINGS_CTE
        + "SELECT document, count FROM postings WHERE word = 'the' "
        + "ORDER BY count DESC, document"
    )
    sql["index_incremental_additive"] = (
        _POSTINGS_CTE
        + """
SELECT word, document,
       (count * CASE WHEN document::BIGINT < 50 THEN 2 ELSE 1 END)::BIGINT AS count
FROM postings
"""
    )
    sql["index_incremental_upsert"] = sql["index_build"]

    # ---- relational ----
    sql["q1_pricing_summary"] = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 6) AS sum_qty,
       round(sum(l_extendedprice), 6) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 6) AS sum_disc_price,
       round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 6) AS sum_charge,
       round(avg(l_quantity), 6) AS avg_qty,
       round(avg(l_discount), 6) AS avg_disc,
       count(*) AS count_order
FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""
    sql["revenue_by_region"] = """
SELECT r_name,
       round(sum(l_extendedprice * (1 - l_discount)), 6) AS revenue,
       count(*) AS n_items
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
"""
    sql["customers_without_orders"] = """
SELECT c_custkey, c_name FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
"""
    sql["top_orders_per_customer"] = """
SELECT o_custkey, o_orderkey, round(o_totalprice, 6) AS o_totalprice, rnk FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)::INT AS rnk
  FROM orders
) WHERE rnk <= 3
"""
    sql["nation_set_ops"] = """
WITH cn AS (SELECT DISTINCT c_nationkey AS nationkey FROM customer),
     sn AS (SELECT DISTINCT s_nationkey AS nationkey FROM supplier)
SELECT nationkey, 'both' AS tag FROM (SELECT nationkey FROM cn INTERSECT SELECT nationkey FROM sn)
UNION ALL
SELECT nationkey, 'cust_only' AS tag FROM (SELECT nationkey FROM cn EXCEPT SELECT nationkey FROM sn)
"""
    sql["rollup_acctbal"] = """
SELECT r_name, n_name, round(sum(c_acctbal), 6) AS total_bal, count(*) AS n_cust
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY ROLLUP (r_name, n_name)
"""
    # Convention bridges: DuckDB dayofweek is 0=Sunday (Spark 1=Sunday);
    # from_utc_timestamp = naive AT TIME ZONE 'UTC' AT TIME ZONE tz;
    # months_between uses Spark's 31-day fraction rule (integer when
    # same day-of-month or both last days — the EOY anchor is day 31,
    # so: day(s)=31 → equal-day, s at month-end → both-last-days).
    sql["scalar_function_sampler"] = """
SELECT o_orderkey,
       year(o_orderdate)::INT AS o_year,
       month(o_orderdate)::INT AS o_month,
       day(o_orderdate)::INT AS o_day,
       date_trunc('month', o_orderdate)::TIMESTAMP AS month_start,
       date_diff('day', o_orderdate::DATE, DATE '1998-12-31')::INT AS days_to_eoy,
       round((1998 - year(o_orderdate)) * 12 + (12 - month(o_orderdate))
             + CASE WHEN day(o_orderdate) = 31
                      OR o_orderdate::DATE = last_day(o_orderdate::DATE) THEN 0
                    ELSE (31 - day(o_orderdate)) / 31.0 END, 6) AS months_to_eoy,
       (o_orderdate + INTERVAL 3 MONTH)::DATE AS ship_by,
       (o_orderdate + INTERVAL 36 HOUR)::TIMESTAMP AS due_ts,
       last_day(o_orderdate::DATE) AS month_end,
       (dayofweek(o_orderdate) + 1)::INT AS dow,
       quarter(o_orderdate)::INT AS o_quarter,
       epoch(o_orderdate)::BIGINT AS epoch_s,
       weekofyear(o_orderdate)::INT AS iso_week,
       (o_orderdate AT TIME ZONE 'UTC' AT TIME ZONE 'America/New_York')::TIMESTAMP AS ny_ts,
       round(sqrt(abs(o_totalprice)), 6) AS sqrt_price,
       floor(o_totalprice / 1000)::BIGINT AS price_k,
       -- Spark's ln() returns NULL outside the domain; DuckDB raises.
       -- The guard makes the twin faithful on ALL inputs (found by the
       -- r6 orders fuzz axis), identical on the fixture's positives.
       CASE WHEN o_totalprice + 1 > 0
            THEN round(ln(o_totalprice + 1), 6) END AS ln_price,
       upper(substr(o_orderpriority, 1, 1)) AS prio_initial,
       length(o_orderstatus)::INT AS status_len,
       concat_ws('-', o_orderstatus, o_orderpriority) AS status_prio,
       CASE WHEN o_totalprice > 150000 THEN 'high'
            WHEN o_totalprice > 50000 THEN 'mid' ELSE 'low' END AS price_band,
       coalesce(nullif(o_orderstatus, 'O'), 'open') AS status_or_open
FROM orders
"""
    sql["customer_order_left_join"] = """
SELECT c_custkey, count(o_orderkey) AS n_orders,
       round(coalesce(sum(o_totalprice), 0.0), 6) AS total_spent
FROM customer LEFT JOIN orders ON c_custkey = o_custkey
GROUP BY c_custkey
"""
    sql["order_value_statistics"] = """
SELECT round(stddev_samp(l_extendedprice), 4) AS std_price,
       round(var_samp(l_quantity), 4) AS var_qty,
       round(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
       round(covar_samp(l_discount, l_tax), 6) AS cov_disc_tax
FROM lineitem
"""
    sql["price_percentiles"] = """
SELECT o_orderstatus,
       round(quantile_cont(o_totalprice, 0.5), 4) AS p50,
       round(quantile_cont(o_totalprice, 0.9), 4) AS p90
FROM orders GROUP BY o_orderstatus
"""
    sql["embedding_array_features"] = """
SELECT vec_id,
       len(embedding)::INT AS dim,
       round(embedding[1]::DOUBLE, 6) AS first_component,
       round(sqrt(list_inner_product(embedding::DOUBLE[], embedding::DOUBLE[])), 6) AS l2,
       round(list_sum(list_reverse_sort(embedding::DOUBLE[])[1:3]), 6) AS top3_sum
FROM embeddings
"""


    # ---- events ----
    sql["events_pivot"] = """
SELECT user_id,
       sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)::BIGINT AS click,
       sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)::BIGINT AS error,
       sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)::BIGINT AS purchase,
       sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)::BIGINT AS signup,
       sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)::BIGINT AS view
FROM events GROUP BY user_id
"""
    # HLL sketch VALUES are engine-specific, so the twin checks the
    # exact companion column plus the asserted bound: approx_ok must be
    # TRUE for every group (a drifting estimate flips the value hash).
    sql["events_approx_distinct"] = """
SELECT event_type,
       count(DISTINCT user_id) AS exact_users,
       TRUE AS approx_ok
FROM events GROUP BY event_type
"""
    sql["events_tumbling_hourly"] = """
SELECT date_trunc('hour', ts) AS hour_start, event_type,
       count(*) AS n_events, round(sum(value), 6) AS total_value
FROM events GROUP BY 1, 2
"""
    # As-of twin: DuckDB's native ASOF JOIN against the same
    # deduplicated click relation; the Spark side decomposes it into
    # the union + carry-forward window (operators/joins.as_of_join).
    # NULL-ts contract (r5 fuzzer): a timeless click can match nothing,
    # and a timeless purchase gets a NULL match. DuckDB's ASOF binary
    # search instead treats a NULL probe as greatest and pairs it with
    # the LATEST click — a quirk, not a semantics; the oracle routes
    # NULL-ts purchases around the ASOF join to state the contract.
    sql["events_asof_join"] = """
WITH purchases AS (
  SELECT event_id, user_id, ts, round(value, 6) AS purchase_value
  FROM events WHERE event_type = 'purchase'
),
clicks AS (
  SELECT user_id, ts, round(max(value), 6) AS click_value
  FROM events WHERE event_type = 'click' AND ts IS NOT NULL GROUP BY 1, 2
)
SELECT p.event_id, p.user_id, p.purchase_value,
       c.click_value AS asof_click_value, c.ts AS asof_ts
FROM purchases p ASOF LEFT JOIN clicks c
  ON p.user_id = c.user_id AND c.ts <= p.ts
WHERE p.ts IS NOT NULL
UNION ALL
SELECT event_id, user_id, purchase_value,
       NULL AS asof_click_value, NULL::TIMESTAMP AS asof_ts
FROM purchases WHERE ts IS NULL
"""
    sql["events_sessionize"] = """
WITH flagged AS (
  SELECT user_id, ts, event_id, value,
         -- floor(epoch): Spark's ts.cast('long') truncates to whole
         -- seconds; DuckDB epoch() is fractional — without the floor
         -- the 1800s break predicate diverges in a ~1s boundary window
         CASE WHEN floor(epoch(ts)) - lag(floor(epoch(ts))) OVER w IS NULL
                OR floor(epoch(ts)) - lag(floor(epoch(ts))) OVER w > 1800 THEN 1 ELSE 0 END AS is_start
  -- NULL-ts events excluded by contract (r5 fuzzer: NULLS FIRST vs
  -- NULLS LAST window order otherwise shifts session numbering)
  FROM events WHERE ts IS NOT NULL
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
  SELECT user_id, ts, event_id, value,
         sum(is_start) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT AS session_id
  FROM flagged
)
SELECT user_id, session_id, min(ts) AS session_start, max(ts) AS session_end,
       count(*) AS n_events, round(sum(value), 6) AS total_value
FROM sess GROUP BY 1, 2
"""
    sql["events_json_rollup"] = """
SELECT event_type, count(*) AS n,
       sum(json_extract_string(props, '$.k')::BIGINT)::BIGINT AS sum_k,
       round(avg(json_extract_string(props, '$.k')::BIGINT), 6) AS avg_k
FROM events GROUP BY event_type
"""

    # ---- dedup ----
    sql["dedup_exact_groups"] = f"""
SELECT {_HEX64.format(col='text')} AS text_hash,
       min(doc_id) AS keep_id, count(*) AS n_copies
FROM documents GROUP BY 1
"""
    sql["dedup_minhash_pairs"] = (
        _MINHASH_SQL
        + f""",
banded AS (
  SELECT doc_id, (seed // 4)::INT AS band,
         {_HEX64.format(col="string_agg(minhash::VARCHAR, ',' ORDER BY seed)")} AS band_hash
  FROM sigs GROUP BY doc_id, (seed // 4)::INT
),
cands AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM banded a JOIN banded b ON a.band = b.band AND a.band_hash = b.band_hash
  WHERE a.doc_id < b.doc_id
),
verified AS (
  SELECT c.doc_a, c.doc_b,
         (sum(CASE WHEN sa.minhash = sb.minhash THEN 1 ELSE 0 END) / 16.0) AS est_jaccard
  FROM cands c
  JOIN sigs sa ON sa.doc_id = c.doc_a
  JOIN sigs sb ON sb.doc_id = c.doc_b AND sb.seed = sa.seed
  GROUP BY 1, 2
)
SELECT doc_a, doc_b, est_jaccard FROM verified WHERE est_jaccard >= 0.25
"""
    )
    sql["dedup_simhash"] = f"""
WITH doctoks AS ({_DOCTOKS}),
tok AS (
  SELECT doc_id, unnest(l) AS word FROM doctoks
),
cnts AS (
  SELECT doc_id, word, count(*) AS cnt, {_HEX64.format(col='word')} AS h
  FROM tok GROUP BY 1, 2
),
bits AS (
  SELECT doc_id, cnt, h, unnest(range(0, 32)) AS bit FROM cnts
),
sums AS (
  SELECT doc_id, bit, sum(cnt * (2 * ((h >> bit) & 1) - 1)) AS s
  FROM bits GROUP BY 1, 2
)
SELECT doc_id,
       sum(CASE WHEN s > 0 THEN (1::BIGINT << bit) ELSE 0 END)::BIGINT AS simhash
FROM sums GROUP BY doc_id
"""
    # SimHash-pairs twin: the SEMANTIC statement (exact all-pairs
    # popcount filter over the fingerprint CTE) — the Spark side
    # reaches the same set through pigeonhole banding, completeness of
    # which is exactly the property under test.
    sql["dedup_simhash_pairs"] = (
        "WITH fpq AS (" + sql["dedup_simhash"] + ")\n"
        "SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,\n"
        "       bit_count(xor(a.simhash, b.simhash))::INT AS hamming\n"
        "FROM fpq a JOIN fpq b ON a.doc_id < b.doc_id\n"
        "WHERE bit_count(xor(a.simhash, b.simhash)) <= 3"
    )
    # max_df-guarded twin (the judged scale-safe config): the rare
    # vocabulary is tokens with df <= floor(0.5 * n_docs); sizes and
    # intersections both count only that vocabulary.
    sql["dedup_jaccard_pairs"] = f"""
WITH doctoks AS ({_DOCTOKS}),
tok AS (SELECT DISTINCT doc_id, unnest(l) AS word FROM doctoks),
nd AS (SELECT count(*) AS n_docs FROM documents),
rare AS (
  SELECT word FROM tok, nd GROUP BY word, n_docs
  HAVING count(*) <= floor(0.5 * n_docs)
),
tokf AS (SELECT tok.doc_id, tok.word FROM tok JOIN rare USING (word)),
sizes AS (SELECT doc_id, count(*) AS n FROM tokf GROUP BY 1),
common AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS common
  FROM tokf a JOIN tokf b ON a.word = b.word AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b,
       round(common / (na.n + nb.n - common), 6) AS jaccard
FROM common
JOIN sizes na ON na.doc_id = doc_a
JOIN sizes nb ON nb.doc_id = doc_b
WHERE common / (na.n + nb.n - common) >= 0.9
"""
    sql["dedup_shingle_jaccard"] = (
        _SHINGLES
        + """,
sizes AS (SELECT doc_id, count(*) AS n FROM shingles GROUP BY 1),
common AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS common
  FROM shingles a JOIN shingles b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b,
       round(common / (na.n + nb.n - common), 6) AS jaccard
FROM common
JOIN sizes na ON na.doc_id = doc_a
JOIN sizes nb ON nb.doc_id = doc_b
WHERE common / (na.n + nb.n - common) >= 0.2
"""
    )
    # Banded-LSH twin of operators/similarity.pairwise_near_dup (r=4
    # planes/band, b=4 bands, 16 global planes — same hex64-derived
    # hyperplanes): candidates = band-bucket collisions, then exact
    # cosine ≥ threshold. No cross join on either engine.
    sql["dedup_clusters"] = (
        "WITH RECURSIVE pairs AS (\n"
        + sql["dedup_minhash_pairs"]
        + """),
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION ALL SELECT doc_b, doc_a FROM pairs
),
walk AS (
  SELECT DISTINCT src, src AS reach FROM edges
  UNION
  SELECT e.src, w.reach FROM edges e JOIN walk w ON e.dst = w.src
)
SELECT src AS doc_id, min(reach) AS cluster_rep FROM walk GROUP BY 1
"""
    )
    sql["near_dedup_survivors"] = (
        sql["dedup_clusters"].rsplit("SELECT src AS doc_id", 1)[0]
        + """,
clusters AS (SELECT src AS doc_id, min(reach) AS cluster_rep FROM walk GROUP BY 1)
SELECT doc_id FROM documents
WHERE doc_id NOT IN (SELECT doc_id FROM clusters WHERE doc_id <> cluster_rep)
"""
    )
    sql["dedup_embedding_pairs"] = f"""
WITH comp AS (
  SELECT vec_id, embedding, unnest(range(0, 16)) AS plane FROM embeddings
),
dims AS (
  SELECT vec_id, plane, unnest(range(1, len(embedding) + 1)) AS i, embedding
  FROM comp
),
dots AS (
  SELECT vec_id, plane,
         sum(embedding[i]::DOUBLE *
             ((({_HEX64.format(col="(plane::VARCHAR || '|' || (i-1)::VARCHAR)")}) % 2001 - 1000)::DOUBLE / 1000.0)) AS dot
  FROM dims GROUP BY 1, 2
),
bsk AS (
  SELECT vec_id, (plane // 4)::INT AS band,
         sum(CASE WHEN dot > 0 THEN (1::BIGINT << (plane % 4)) ELSE 0 END)::BIGINT AS band_bucket
  FROM dots GROUP BY 1, 2
),
cand AS (
  SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
  FROM bsk a JOIN bsk b ON a.band = b.band AND a.band_bucket = b.band_bucket
  WHERE a.vec_id < b.vec_id
)
SELECT c.vec_a, c.vec_b,
       round({_COS.format(a='ea.embedding', b='eb.embedding')}, 6) AS score
FROM cand c
JOIN embeddings ea ON ea.vec_id = c.vec_a
JOIN embeddings eb ON eb.vec_id = c.vec_b
WHERE {_COS.format(a='ea.embedding', b='eb.embedding')} >= 0.45
"""

    # ---- similarity ----
    sql["ann_topk_bruteforce"] = f"""
WITH q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id < 8),
scored AS (
  SELECT q.query_id, e.vec_id AS neighbor_id,
         {_COS.format(a='q.qe', b='e.embedding')} AS score
  FROM embeddings e CROSS JOIN q WHERE e.vec_id <> q.query_id
),
ranked AS (
  SELECT query_id, neighbor_id,
         row_number() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id)::INT AS rank,
         score
  FROM scored
)
SELECT query_id, neighbor_id, rank, round(score, 6) AS score FROM ranked WHERE rank <= 5
"""
    sql["ann_topk_lsh"] = f"""
WITH {_LSH_SKETCH.strip().lstrip()},
q AS (
  SELECT e.vec_id AS query_id, e.embedding AS qe, b.bucket
  FROM embeddings e JOIN buckets b ON e.vec_id = b.vec_id
  WHERE e.vec_id < 8
),
scored AS (
  SELECT q.query_id, e.vec_id AS neighbor_id,
         {_COS.format(a='q.qe', b='e.embedding')} AS score
  FROM embeddings e
  JOIN buckets eb ON e.vec_id = eb.vec_id
  JOIN q ON eb.bucket = q.bucket
  WHERE e.vec_id <> q.query_id
),
ranked AS (
  SELECT query_id, neighbor_id,
         row_number() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id)::INT AS rank,
         score
  FROM scored
)
SELECT query_id, neighbor_id, rank, round(score, 6) AS score FROM ranked WHERE rank <= 5
"""

    # vectorized path computes the same exact top-k
    sql["ann_topk_vectorized"] = sql["ann_topk_bruteforce"]

    # IVF twin: deterministic centroids (min vec_id per id%97 slot),
    # 1-nearest list per corpus vector, 2 probed lists per query.
    sql["ann_topk_ivf"] = f"""
WITH cents AS (
  SELECT (vec_id % 97)::INT AS centroid_id,
         arg_min(embedding, vec_id) AS c_embedding
  FROM embeddings WHERE (vec_id % 97) < 8 GROUP BY 1
),
corpus_scored AS (
  SELECT e.vec_id, e.embedding, c.centroid_id,
         {_COS.format(a='e.embedding', b='c.c_embedding')} AS c_score
  FROM embeddings e CROSS JOIN cents c
),
corpus_lists AS (
  SELECT vec_id, embedding, centroid_id AS list_id FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id
                                 ORDER BY c_score DESC, centroid_id) AS crn
    FROM corpus_scored
  ) WHERE crn <= 1
),
q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id < 8),
q_scored AS (
  SELECT q.query_id, q.qe, c.centroid_id,
         {_COS.format(a='q.qe', b='c.c_embedding')} AS c_score
  FROM q CROSS JOIN cents c
),
query_lists AS (
  SELECT query_id, qe, centroid_id AS list_id FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id
                                 ORDER BY c_score DESC, centroid_id) AS crn
    FROM q_scored
  ) WHERE crn <= 2
),
scored AS (
  SELECT ql.query_id, cl.vec_id AS neighbor_id,
         {_COS.format(a='ql.qe', b='cl.embedding')} AS score
  FROM corpus_lists cl JOIN query_lists ql ON cl.list_id = ql.list_id
  WHERE cl.vec_id <> ql.query_id
)
SELECT query_id, neighbor_id, rank, round(score, 6) AS score FROM (
  SELECT query_id, neighbor_id,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY score DESC, neighbor_id)::INT AS rank,
         score
  FROM scored
) WHERE rank <= 5
"""

    # ---- text analysis ----
    _stop_en ="'the','and','of','to','in','is','that','with','a','an','it','on','for','as','at','by'"
    sql["text_stats"] = f"""
WITH doctoks AS ({_DOCTOKS}),
tok AS (SELECT doc_id, unnest(l) AS word FROM doctoks)
SELECT doc_id, count(*) AS n_tokens, count(DISTINCT word) AS n_distinct,
       round(avg(length(word)), 6) AS avg_token_len,
       round(avg(CASE WHEN word IN ({_stop_en}) THEN 1 ELSE 0 END), 6) AS stopword_ratio,
       round(avg(CASE WHEN regexp_full_match(word, '[0-9]+') THEN 1 ELSE 0 END), 6) AS digit_ratio
FROM tok GROUP BY doc_id
"""
    sql["text_quality"] = f"""
WITH doctoks AS ({_DOCTOKS}),
tok AS (SELECT doc_id, unnest(l) AS word FROM doctoks),
stats AS (
  SELECT doc_id, count(*) AS n_tokens, count(DISTINCT word) AS n_distinct,
         round(avg(CASE WHEN word IN ({_stop_en}) THEN 1 ELSE 0 END), 6) AS stopword_ratio
  FROM tok GROUP BY doc_id
)
SELECT doc_id,
       round(least(n_tokens / 200.0, 1.0) * 0.4
             + (n_distinct / n_tokens::DOUBLE) * 0.3
             + least(stopword_ratio * 4.0, 1.0) * 0.3, 6) AS quality
FROM stats
"""
    _langscore = {
        lang: "sum(CASE WHEN word IN (%s) THEN 1 ELSE 0 END)::BIGINT"
        % ",".join(f"'{w}'" for w in words)
        for lang, words in sorted(ta.LANG_STOPWORDS.items())
    }
    sql["text_language_guess"] = f"""
WITH doctoks AS ({_DOCTOKS}),
tok AS (SELECT doc_id, unnest(l) AS word FROM doctoks),
scored AS (
  SELECT doc_id,
         {_langscore['de']} AS s_de,
         {_langscore['en']} AS s_en,
         {_langscore['es']} AS s_es,
         {_langscore['fr']} AS s_fr
  FROM tok GROUP BY doc_id
)
SELECT doc_id,
       CASE WHEN greatest(s_de, s_en, s_es, s_fr) = 0 THEN 'und'
            WHEN s_de = greatest(s_de, s_en, s_es, s_fr) THEN 'de'
            WHEN s_en = greatest(s_de, s_en, s_es, s_fr) THEN 'en'
            WHEN s_es = greatest(s_de, s_en, s_es, s_fr) THEN 'es'
            ELSE 'fr' END AS lang_guess,
       greatest(s_de, s_en, s_es, s_fr) AS best_score
FROM scored
"""
    sql["text_token_counts"] = f"""
SELECT doc_id,
       len({_TOKS_LIST.format(col='text')})::INT AS ws_tokens,
       len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]|[^a-zA-Z0-9\\s\\x{{b}}]'))::INT AS bpe_tokens,
       length(text)::INT AS n_chars_measured
FROM documents
"""
    # raw (unescaped) pattern: _norm is concatenated into f-strings, never .format()ed
    _norm = (
        "regexp_replace(lower(regexp_replace(text, '" + PY_WS_RE2 + "', ' ', 'g')), '[^a-z0-9 ]', '', 'g')"
    )
    sql["text_fingerprints"] = f"""
WITH norms AS (SELECT doc_id, {_norm} AS norm FROM documents),
grams AS (
  SELECT doc_id, substr(norm, i, 8) AS g
  FROM (SELECT doc_id, norm, unnest(range(1, greatest(length(norm) - 7, 1) + 1)) AS i
        FROM norms WHERE length(norm) >= 1)
),
agg AS (
  SELECT doc_id, min({_HEX64.format(col='g')}) AS min_fp,
         max({_HEX64.format(col='g')}) AS max_fp,
         count(DISTINCT g) AS n_grams
  FROM grams GROUP BY doc_id
)
-- empty-normalized docs fingerprint as (NULL, NULL, 0), matching the
-- engine (the ''-gram would alias every empty doc to one fingerprint)
SELECT n.doc_id, a.min_fp, a.max_fp, coalesce(a.n_grams, 0) AS n_grams
FROM norms n LEFT JOIN agg a USING (doc_id)
"""

    sql["text_tfidf"] = f"""
WITH doctoks AS ({_DOCTOKS}),
tok AS (SELECT doc_id, unnest(l) AS word FROM doctoks),
postings AS (SELECT doc_id, word, count(*) AS cnt FROM tok GROUP BY 1, 2),
dl AS (SELECT doc_id, sum(cnt)::BIGINT AS len FROM postings GROUP BY 1),
dfq AS (SELECT word, count(*) AS df FROM postings GROUP BY 1),
n AS (SELECT count(*) AS n_docs FROM documents)
SELECT p.doc_id, p.word,
       round((cnt / len) * (ln((1 + n_docs) / (1 + df)) + 1), 6) AS tfidf
FROM postings p
JOIN dl USING (doc_id) JOIN dfq USING (word) CROSS JOIN n
"""

    # ---- training-data prep (operators/prep.py) ----
    # Plain concatenation (not f-strings): the PII regexes contain {2,}
    # / {1,3} quantifier braces that f-strings would try to interpolate.
    sql["text_chunks"] = (
        "WITH doctoks AS (" + _DOCTOKS + "),\n"
        "starts AS (\n"
        "  SELECT doc_id, l, unnest(range(1, len(l) + 1, 48)) AS start\n"
        "  FROM doctoks WHERE len(l) > 0\n"
        ")\n"
        "SELECT doc_id,\n"
        "       ((start - 1) // 48)::INT AS chunk_id,\n"
        "       len(list_slice(l, start, least(start + 63, len(l))))::INT AS n_tokens,\n"
        "       "
        + _HEX64.format(
            col="array_to_string(list_slice(l, start, least(start + 63, len(l))), ' ')"
        )
        + " AS chunk_hash\n"
        "FROM starts"
    )
    _email = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
    _phone = r"\b\d{3}[-.]\d{3}[-.]\d{4}\b"
    _ipv4 = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
    _redacted = (
        "regexp_replace(regexp_replace(regexp_replace(text, '"
        + _email
        + "', '<EMAIL>', 'g'), '"
        + _ipv4
        + "', '<IP>', 'g'), '"
        + _phone
        + "', '<PHONE>', 'g')"
    )
    sql["text_pii_redaction"] = (
        "SELECT doc_id,\n"
        "       len(regexp_extract_all(text, '" + _email + "'))::INT AS n_emails,\n"
        "       len(regexp_extract_all(text, '" + _phone + "'))::INT AS n_phones,\n"
        "       len(regexp_extract_all(text, '" + _ipv4 + "'))::INT AS n_ips,\n"
        "       " + _HEX64.format(col=_redacted) + " AS redacted_hash\n"
        "FROM documents"
    )
    # Mixing twin: weights/budget literals cast ::DOUBLE so DuckDB's
    # DECIMAL literals don't diverge from Spark's double arithmetic;
    # expression tree (w * (budget * N)) / n_s written identically.
    sql["sample_corpus_mix"] = (
        "WITH counts AS (\n"
        "  SELECT lang AS stratum, count(*) AS n_s FROM documents GROUP BY 1\n"
        "),\n"
        "tot AS (SELECT count(*) AS n_total FROM documents),\n"
        "rates AS (\n"
        "  SELECT stratum,\n"
        "         floor(least((CASE stratum WHEN 'en' THEN 0.4::DOUBLE\n"
        "                      WHEN 'de' THEN 0.15::DOUBLE WHEN 'es' THEN 0.15::DOUBLE\n"
        "                      WHEN 'fr' THEN 0.15::DOUBLE WHEN 'zh' THEN 0.15::DOUBLE\n"
        "                      ELSE 0.0::DOUBLE END * (0.6::DOUBLE * n_total)) / n_s,\n"
        "                     1.0::DOUBLE) * 1000000)::BIGINT AS keep_below\n"
        "  FROM counts, tot\n"
        ")\n"
        "SELECT doc_id, lang AS stratum, source\n"
        "FROM documents JOIN rates ON rates.stratum = documents.lang\n"
        "WHERE (" + _HEX64.format(col="(doc_id::VARCHAR || '|mix')") + " % 1000000) < keep_below"
    )

    # Packing twin: DuckDB states the SEMANTICS as the global-order
    # window cumsum the Spark side decomposes into its two-phase
    # distributed prefix sum — same numbers, scalable plan on Spark.
    # Upsample+shuffle twin: fractional epochs replayed with the same
    # IEEE-double expression tree (r - floor(r)) * 1e6, replica shuffle
    # keys as hex64(doc_id#epoch|shuf). Row order is canonicalized away
    # by the gate; the permutation itself is pinned by the key values.
    sql["corpus_upsample_shuffle"] = (
        "WITH reps AS (\n"
        "  SELECT doc_id, lang AS stratum,\n"
        "         (CASE lang WHEN 'en' THEN 2.4::DOUBLE WHEN 'zh' THEN 1.5::DOUBLE\n"
        "          ELSE 1.0::DOUBLE END) AS r\n"
        "  FROM documents\n"
        "),\n"
        "bounds AS (\n"
        "  SELECT doc_id, stratum, floor(r)::INT AS n_full,\n"
        "         floor((r - floor(r)::INT) * 1000000)::BIGINT AS frac_below\n"
        "  FROM reps\n"
        "),\n"
        "replicas AS (\n"
        "  SELECT doc_id, stratum, n_full, frac_below,\n"
        "         unnest(range(0, n_full + 1)) AS epoch\n"
        "  FROM bounds\n"
        ")\n"
        "SELECT doc_id, stratum, epoch::INT AS epoch,\n"
        "       "
        + _HEX64.format(
            col="(doc_id::VARCHAR || '#' || epoch::VARCHAR || '|shuf')"
        )
        + " AS shuffle_key\n"
        "FROM replicas\n"
        "WHERE epoch < n_full\n"
        "   OR ("
        + _HEX64.format(col="(doc_id::VARCHAR || '|ups' || epoch::VARCHAR)")
        + " % 1000000) < frac_below"
    )

    # Decontamination twin: 8-gram overlap vs the doc_id%20==0 eval
    # slice, replayed over the same tokenizer; n_hit counts DISTINCT
    # shared grams per training doc.
    _gram8 = (
        "SELECT DISTINCT doc_id, array_to_string(list_slice(l, i, i + 7), ' ') AS gram\n"
        "  FROM (SELECT doc_id, l, unnest(range(1, greatest(len(l) - 7, 0) + 1)) AS i\n"
        "        FROM doctoks WHERE len(l) >= 8 AND doc_id % 20 {op} 0)"
    )
    sql["corpus_decontaminate"] = (
        "WITH doctoks AS (" + _DOCTOKS + "),\n"
        "bench AS (SELECT DISTINCT gram FROM (" + _gram8.format(op="=") + ")),\n"
        "train_grams AS (" + _gram8.format(op="<>") + "),\n"
        "hits AS (\n"
        "  SELECT doc_id, count(*) AS n_hit FROM train_grams JOIN bench USING (gram)\n"
        "  GROUP BY 1\n"
        ")\n"
        "SELECT d.doc_id, coalesce(n_hit, 0)::BIGINT AS n_hit_grams,\n"
        "       (coalesce(n_hit, 0) > 0) AS contaminated\n"
        "FROM (SELECT doc_id FROM documents WHERE doc_id % 20 <> 0) d\n"
        "LEFT JOIN hits ON hits.doc_id = d.doc_id"
    )

    sql["token_packing"] = (
        "WITH doctoks AS (" + _DOCTOKS + "),\n"
        "lens AS (SELECT doc_id, len(l) AS n FROM doctoks WHERE len(l) > 0),\n"
        "cum AS (\n"
        "  SELECT doc_id, n,\n"
        "         (sum(n) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING\n"
        "                       AND CURRENT ROW) - n)::BIGINT AS off\n"
        "  FROM lens\n"
        ")\n"
        "SELECT doc_id, n::INT AS n_tokens, off AS global_offset,\n"
        "       (off // 2048)::BIGINT AS first_bin,\n"
        "       ((off + n - 1) // 2048)::BIGINT AS last_bin\n"
        "FROM cum"
    )

    # ---- multimodal ----
    sql["multimodal_asset_stats"] = """
WITH assets AS (
  SELECT doc_id AS asset_id,
         ['image', 'audio', 'video'][(doc_id % 3 + 1)::INT] AS kind,
         encode(text) AS payload,
         (n_chars % 640)::INT AS width,
         (n_chars % 480)::INT AS height
  FROM documents
)
SELECT kind, count(*) AS n_assets,
       sum(octet_length(payload))::BIGINT AS total_bytes,
       max(width) AS max_width, round(avg(height), 6) AS avg_height
FROM assets GROUP BY kind
"""
    # Decode twin: the Spark side runs the REAL Arrow/mapInPandas
    # plumbing; the stub codec's output is deterministic arithmetic on
    # the payload byte length, so DuckDB can replay it and the row gets
    # a full hash check (swap the stub for PIL and this oracle is the
    # line to drop).
    sql["multimodal_decode"] = """
SELECT doc_id AS asset_id,
       ['image', 'audio', 'video'][(doc_id % 3 + 1)::INT] AS kind,
       strlen(text)::BIGINT AS n_bytes,
       (strlen(text) % 640)::INT AS width,
       (strlen(text) % 480)::INT AS height,
       TRUE AS ok
FROM documents
"""

    # ---- composed pipeline: quality-gate → exact-dedup → lang-tag ----
    sql["training_corpus_prep"] = f"""
WITH doctoks AS ({_DOCTOKS}),
tok AS (SELECT doc_id, unnest(l) AS word FROM doctoks),
stats AS (
  SELECT doc_id, count(*) AS n_tokens, count(DISTINCT word) AS n_distinct,
         round(avg(CASE WHEN word IN ({_stop_en}) THEN 1 ELSE 0 END), 6) AS stopword_ratio
  FROM tok GROUP BY doc_id
),
quality AS (
  SELECT doc_id,
         round(least(n_tokens / 200.0, 1.0) * 0.4
               + (n_distinct / n_tokens::DOUBLE) * 0.3
               + least(stopword_ratio * 4.0, 1.0) * 0.3, 6) AS quality
  FROM stats
),
langscored AS (
  SELECT doc_id,
         {_langscore['de']} AS s_de,
         {_langscore['en']} AS s_en,
         {_langscore['es']} AS s_es,
         {_langscore['fr']} AS s_fr
  FROM tok GROUP BY doc_id
),
lang AS (
  SELECT doc_id,
         CASE WHEN greatest(s_de, s_en, s_es, s_fr) = 0 THEN 'und'
              WHEN s_de = greatest(s_de, s_en, s_es, s_fr) THEN 'de'
              WHEN s_en = greatest(s_de, s_en, s_es, s_fr) THEN 'en'
              WHEN s_es = greatest(s_de, s_en, s_es, s_fr) THEN 'es'
              ELSE 'fr' END AS lang_guess
  FROM langscored
),
dedup AS (
  SELECT doc_id FROM (
    SELECT doc_id,
           row_number() OVER (PARTITION BY {_HEX64.format(col='text')}
                              ORDER BY doc_id) AS rn
    FROM documents
  ) WHERE rn = 1
)
SELECT d.doc_id, lang.lang_guess, q.quality, s.n_tokens, s.n_distinct
FROM dedup d
JOIN quality q ON d.doc_id = q.doc_id AND q.quality >= 0.35
JOIN lang ON d.doc_id = lang.doc_id
JOIN stats s ON d.doc_id = s.doc_id
"""
    return sql
