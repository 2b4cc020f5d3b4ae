"""Skew-resistant join utilities — the 100 TB design point for joins on
keys with pathological hot values (the situation AQE's skew-join split
handles for sort-merge joins; salting is the explicit-plan variant and
works for any join type, including when the skewed side must aggregate
first).

Salting: the skewed (probe) side gets a deterministic salt in [0, S);
the build side is replicated S× with every salt value; the join key
becomes (key, salt), splitting each hot key's rows across S tasks.
Result is row-identical to the unsalted join (verified by property
test) — only the partitioning changes.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    key: str,
    salt_buckets: int = 8,
    how: str = "inner",
    salt_source: Column | None = None,
) -> DataFrame:
    """Join ``skewed ⋈ other`` on ``key`` with the hot-key rows of
    ``skewed`` spread over ``salt_buckets`` partitions.

    ``salt_source`` picks each row's salt. The default is a per-row
    round-robin (``monotonically_increasing_id() mod S``), which spreads
    even byte-identical duplicate rows — the classic hot key IS a value
    repeated a billion times, where any content hash would assign every
    copy the same salt and silently not spread at all. Correctness never
    depends on WHICH salt a row gets (the right side carries every
    salt), so retry/speculation nondeterminism is harmless here. A
    custom ``salt_source`` is normalized with ``pmod`` (Spark ``%`` is
    sign-preserving — a signed hash would put half the rows in negative
    buckets that match nothing, silently dropping them) and
    null-coalesced to bucket 0.

    Supported ``how``: left-preserving joins only (inner/left/semi/anti).
    Right/full-preserving joins would emit every unmatched right row
    once per salt replica (``salt_buckets``× duplication), so they are
    rejected rather than silently wrong.
    """
    allowed = {"inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi",
               "semi", "left_anti", "leftanti", "anti"}
    if how.lower() not in allowed:
        raise ValueError(
            f"salted_join supports left-preserving joins only {sorted(allowed)}; "
            f"got how={how!r} (unmatched right rows would duplicate per salt)"
        )
    if salt_source is None:
        salt_source = F.monotonically_increasing_id()
    salt = F.coalesce(
        F.pmod(salt_source, F.lit(salt_buckets)), F.lit(0)
    ).cast("int")
    salted_left = skewed.withColumn("__salt", salt)
    salts = F.explode(
        F.sequence(F.lit(0), F.lit(salt_buckets - 1))
    ).alias("__salt")
    replicated_right = other.select("*", salts)
    out = salted_left.join(replicated_right, [key, "__salt"], how)
    return out.drop("__salt")


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    value_cols: tuple[str, ...] = ("value",),
    prefix: str = "asof_",
) -> DataFrame:
    """As-of join: attach to every left row the ``value_cols`` of the
    most recent right row with ``right.ts <= left.ts`` within the same
    ``key`` (time-series point-in-time lookup — the operator Spark has
    no built-in for; DuckDB's native ``ASOF JOIN`` is the oracle twin).

    Implementation is the scalable union-and-carry-forward pattern, not
    a range join: tag both sides, union, and run ONE window per key
    ordered by (ts, side) taking ``last(value, ignoreNulls)`` — right
    rows sort before left rows at equal ts, so an exactly-simultaneous
    right row is visible. Cost: one hash shuffle on ``key`` + a
    per-partition sort — the same price as any keyed window, with no
    O(|left|·|right|) candidate blowup and no per-row Python. Rows with
    no prior right row keep NULLs (left semantics).

    Right rows should be unique per (key, ts) — pre-aggregate if not —
    otherwise which same-timestamp row wins is tie-dependent in ANY
    engine (DuckDB ASOF included).

    NULL-ts right rows are excluded by contract: a row without a time
    can never satisfy ``right.ts <= left.ts``. Found by the r5 parity
    fuzzer — without the filter, Spark's ASC NULLS FIRST window order
    carries a NULL-ts right row into EVERY later row of its key
    (asof value with NULL asof_ts), a match DuckDB's ASOF predicate
    never produces. NULL-ts LEFT rows need no filter: they sort before
    every surviving right row, so both engines give them NULL matches.
    """
    r = right.where(F.col(ts_col).isNotNull()).select(
        F.col(key),
        F.col(ts_col),
        F.col(ts_col).alias("_r_ts"),
        *[F.col(c).alias(f"_r_{c}") for c in value_cols],
    ).withColumn("_side", F.lit(0))
    l = left.withColumn("_side", F.lit(1))
    u = l.unionByName(r, allowMissingColumns=True)
    from pyspark.sql import Window

    w = (
        Window.partitionBy(key)
        .orderBy(F.col(ts_col).asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # Carry the most recent right ROW as one struct, not each column
    # independently: per-column last(ignorenulls) would skip a right row
    # whose value is genuinely NULL and resurrect an OLDER value while
    # asof_ts still reported the newer timestamp — a stale (ts, value)
    # pairing DuckDB's ASOF (the oracle) never produces. The struct is
    # non-null for EVERY right row (even all-null values), so
    # ignorenulls skips exactly the left-row placeholders.
    rstruct = F.when(
        F.col("_side") == 0,
        F.struct(
            F.col("_r_ts").alias("ts"),
            *[F.col(f"_r_{c}").alias(c) for c in value_cols],
        ),
    )
    carried = F.last(rstruct, ignorenulls=True).over(w)
    projected = [carried[c].alias(f"{prefix}{c}") for c in value_cols] + [
        carried["ts"].alias(f"{prefix}ts")
    ]
    return (
        u.select("*", *projected)
        .where(F.col("_side") == 1)
        .drop("_side", "_r_ts", *[f"_r_{c}" for c in value_cols])
    )


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    bucket_width: int,
    how: str = "inner",
) -> DataFrame:
    """Interval containment join: pair every point row with the
    interval rows where ``start <= point < end`` — Spark's planner
    turns the naive ``points.join(intervals, (s <= p) & (p < e))``
    into a BroadcastNestedLoopJoin (all pairs scanned per partition),
    which dies at scale.

    This is the bucketized decomposition: slice the domain into
    ``bucket_width`` buckets, explode each interval to the buckets it
    overlaps, equi-join points to intervals on the bucket id, then
    apply the exact predicate. The equi-join hash-partitions both
    sides — no nested loop — and each candidate pair is produced
    exactly once (a point lands in ONE bucket; an interval copy exists
    in every bucket it overlaps, so the pair meets only at the point's
    bucket).

    Cost model: interval replication = len/bucket_width + 1 copies.
    Pick ``bucket_width`` ≈ the TYPICAL interval length so replication
    stays O(1)×; skewed buckets (hot time ranges) split further via AQE
    skew-join. Inner semantics only (outer variants need a row-unique
    point key to reconstruct unmatched rows — compose with a left_anti
    on that key when needed)."""
    if how != "inner":
        raise ValueError(f"range_join supports how='inner' only, got {how!r}")
    p_bucket = (F.col(point_col) / bucket_width).cast("bigint")
    i_first = (F.col(start_col) / bucket_width).cast("bigint")
    i_last = (F.col(end_col) / bucket_width).cast("bigint")
    exploded = intervals.withColumn(
        "_bucket", F.explode(F.sequence(i_first, i_last))
    )
    return (
        points.withColumn("_bucket", p_bucket)
        .join(exploded, "_bucket", "inner")
        .where(
            (F.col(start_col) <= F.col(point_col))
            & (F.col(point_col) < F.col(end_col))
        )
        .drop("_bucket")
    )
