"""Multi-dimensional clustered layout (Z-order) for scan pruning.

Why: parquet readers skip a file or row group when the predicate
excludes its column [min, max] range — but min/max are only tight for
the column the data happens to be sorted by. Sorting by one column
makes every OTHER column's ranges span the whole domain, so a 100 TB
table laid out by date serves `WHERE user_id = ?` with a full scan.
Interleaving the bits of several columns' bucket numbers (the Z-order /
Morton curve — Morton 1966; the layout discipline behind Delta Lake's
OPTIMIZE ZORDER BY and many warehouse clustering features) keeps every
participating column's min/max tight in every file: points close on the
curve are close in ALL dimensions, so a range predicate on ANY z column
excludes most files. This module is pure layout — it never changes
answers, only which bytes a filtered scan has to read.

How it scales: the default key is min/max linear scaling (one tiny
bounds aggregate) + a static chain of JVM-side bit operations — all
whole-stage codegen, so the write costs what any clustered write costs
(one range repartition + within-partition sort). For heavily skewed
dimensions, ``scaling="quantile"`` derives balanced bucket boundaries
from one bounded driver-side ``approxQuantile`` (Greenwald–Khanna,
≤ 2^bits doubles per column) at a documented per-row comparison cost
— see ``zorder_key``.

`zorder_scan_stats` reads parquet footers (no data pages) and reports,
for a predicate, how many row groups its min/max stats already exclude
— the deterministic way to verify the layout works, independent of
scheduler timing noise.
"""

from __future__ import annotations

from functools import reduce

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

ZKEY = "_zkey"


def _bucketize(col_name: str, breaks: list[float]) -> Column:
    """Bucket number in [0, len(breaks)] — the count of breakpoints at
    or below the value, computed as a BALANCED binary-search conditional
    tree over the boundary literals: ceil(log2(n)) plain comparisons
    per row, plain codegen'd conditionals, instead of the higher-order
    array filter this used through r10 (interpreted lambda + per-row
    array traversal — the 3.2× quantile-write tax BASELINE r9
    measured). The tree is assembled as ONE parsed SQL string (the
    ``_fp_bands``/simhash r5 rescue — 2^bits nested ``when()`` Columns
    would cost seconds of py4j round-trips per z column). Assignment is
    bit-identical to the filter-count: breaks are sorted (duplicates
    from skewed quantiles included — upper-bound search counts them
    correctly), and NULLs take every ELSE branch down to bucket 0 (the
    curve's origin: they carry no range information to preserve), the
    same coalesce-to-0 the filter applied. An empty breaks list (what
    ``approxQuantile`` returns for an all-NULL column) is a degenerate
    domain: bucket 0, mirroring ``_bucketize_linear``."""
    if not breaks:
        return F.lit(0)
    bs = [float(b) for b in breaks]
    v = f"cast(`{col_name.replace('`', '``')}` as double)"

    def lit(b: float) -> str:
        # repr() of non-finite doubles ('inf', 'nan') is not SQL — a
        # column whose quantiles include them (perfectly legal input;
        # the r10 array filter handled it) must not break the parse
        if b != b:
            return "cast('NaN' as double)"
        if b == float("inf"):
            return "cast('Infinity' as double)"
        if b == float("-inf"):
            return "cast('-Infinity' as double)"
        return f"{b!r}D"

    def search(lo: int, hi: int) -> str:
        # invariant: the answer (count of breaks <= value) is in [lo, hi]
        if lo == hi:
            return str(lo)
        mid = (lo + hi + 1) // 2
        return (
            f"if({v} >= {lit(bs[mid - 1])}, {search(mid, hi)}, "
            f"{search(lo, mid - 1)})"
        )

    return F.expr(search(0, len(bs)))


def _interleave(buckets: list[Column], bits: int) -> Column:
    """Morton code: bit i of column j lands at position i*d + j. Static
    expression chain — d·bits shift/OR terms, all codegen'd."""
    d = len(buckets)
    terms = []
    for j, b in enumerate(buckets):
        for i in range(bits):
            terms.append(
                F.shiftleft(
                    F.shiftright(b.cast("long"), i).bitwiseAND(F.lit(1)),
                    i * d + j,
                )
            )
    return reduce(lambda a, t: a.bitwiseOR(t), terms)


def _bucketize_linear(col: Column, lo: float, hi: float, n: int) -> Column:
    """Bucket by min/max scaling: pure codegen arithmetic (~ns/row).
    Degenerate domains (lo == hi, or all-NULL bounds) and NULLs land
    in bucket 0."""
    if lo is None or hi is None or hi <= lo:
        return F.lit(0)
    scaled = F.floor(
        (col.cast("double") - F.lit(lo)) / F.lit(hi - lo) * F.lit(n)
    )
    return F.coalesce(
        F.least(F.greatest(scaled, F.lit(0)), F.lit(n - 1)), F.lit(0)
    ).cast("int")


QUANTILE_SAMPLE_ROWS = 100_000


def zorder_key(
    df: DataFrame,
    cols: list[str],
    bits: int = 8,
    scaling: str = "linear",
    rel_err: float = 0.01,
    quantile_sample_rows: int | None = QUANTILE_SAMPLE_ROWS,
) -> DataFrame:
    """``df`` plus a ``_zkey`` column — the Morton code of the bucket
    numbers of ``cols`` (``2^bits`` buckets each).

    ``scaling`` picks how values map to buckets — a layout-quality
    knob, never a correctness one:

    - ``"linear"`` (default): min/max scaling from one tiny bounds agg;
      the key is pure whole-stage-codegen arithmetic, so the write
      costs what any clustered write costs. Right for roughly uniform
      key domains (ids, timestamps).
    - ``"quantile"``: bucket boundaries from one bounded driver-side
      ``approxQuantile`` (Greenwald–Khanna, ≤ 2^bits doubles per
      column). Keeps the curve balanced under heavy skew, where linear
      scaling would collapse most rows into a few codes. The per-row
      key cost is a log2(2^bits)-deep binary-search conditional tree
      (r11; the r9–r10 higher-order array filter ran ~20 µs/row), and
      the boundary derivation runs over a bounded uniform row sample
      (``quantile_sample_rows``, default 100k: a 100 TB write cannot
      GK-sketch every row for 255 boundaries, and boundary error only
      shifts bucket BALANCE, never answers — pass ``None`` to sketch
      every row; deriving the sample fraction costs one ``count()``
      of the input, metadata-cheap on file sources but a full pass on
      an expensive uncached lineage, where ``None`` may be the better
      trade). Linear stays the default because its bounds agg is
      one cheap pass and its key is pure arithmetic."""
    if not (1 <= bits <= 16):
        raise ValueError(f"bits must be in [1, 16], got {bits}")
    if len(cols) < 2:
        raise ValueError(
            "z-ordering needs >= 2 columns — for one column use a plain "
            "sortWithinPartitions, it gives strictly tighter ranges"
        )
    if len(cols) * bits > 63:
        # JVM shiftleft masks the shift amount mod 64, so positions
        # past 62 would silently WRAP onto low bits (and bit 63 is the
        # sign, which would split the curve at the sign boundary) —
        # the key would lose curve locality with no error
        raise ValueError(
            f"z-key needs {len(cols)} x {bits} = {len(cols) * bits} bits "
            "but only 63 fit a signed 64-bit key — lower bits (precision "
            "beyond ~2^10 buckets per column rarely helps pruning) or "
            "drop a column"
        )
    if scaling not in ("linear", "quantile"):
        raise ValueError(f"scaling must be 'linear' or 'quantile', got {scaling!r}")
    n_buckets = 1 << bits
    numeric = df.select(
        *[F.col(c).cast("double").alias(c) for c in cols]
    )
    if scaling == "quantile":
        probs = [i / n_buckets for i in range(1, n_buckets)]
        src = numeric
        if quantile_sample_rows is not None:
            n = numeric.count()
            if n > quantile_sample_rows:
                # uniform ROW-level sample (keeps a skewed value's mass
                # share, unlike a by-value hash sample); seed pinned so
                # a re-run over the same partitioning derives the same
                # boundaries
                src = numeric.sample(quantile_sample_rows / n, seed=42)
        all_breaks = src.stat.approxQuantile(cols, probs, rel_err)
        buckets = [
            _bucketize(c, breaks) for c, breaks in zip(cols, all_breaks)
        ]
    else:
        bounds = numeric.agg(
            *[F.min(c).alias(f"_lo{j}") for j, c in enumerate(cols)],
            *[F.max(c).alias(f"_hi{j}") for j, c in enumerate(cols)],
        ).first()
        buckets = [
            _bucketize_linear(
                F.col(c), bounds[f"_lo{j}"], bounds[f"_hi{j}"], n_buckets
            )
            for j, c in enumerate(cols)
        ]
    # Two projections, NOT one: _interleave references each bucket
    # expression `bits` times, and inlining would copy the quantile
    # search tree 8× per column into one giant projection (seconds of
    # analysis, bloated codegen). Materializing the bucket numbers as
    # temp columns evaluates each tree ONCE per row; CollapseProject
    # leaves the split alone because the aliases are non-cheap and
    # multiply referenced.
    tmp = [f"_zbucket{j}" for j in range(len(cols))]
    taken = set(df.columns)
    if any(t in taken for t in tmp):
        raise ValueError(
            f"z-order scratch column name collision with {sorted(set(tmp) & taken)}"
        )
    keyed = df.select("*", *[b.alias(t) for b, t in zip(buckets, tmp)])
    return keyed.withColumn(
        ZKEY, _interleave([F.col(t) for t in tmp], bits)
    ).drop(*tmp)


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    bits: int = 8,
    num_files: int | None = None,
    scaling: str = "linear",
    quantile_sample_rows: int | None = QUANTILE_SAMPLE_ROWS,
) -> None:
    """Write ``df`` clustered on the Z-order curve of ``cols``: range-
    repartition on the z-key (contiguous curve segments per file), sort
    within partitions (tight row-group stats inside each file), drop
    the key, write parquet. Readers need nothing special — the standard
    min/max pruning does the skipping.

    Timestamps are forced to TIMESTAMP_MICROS for this write: Spark's
    default ``outputTimestampType=INT96`` writes NO parquet min/max
    statistics at all (deprecated physical type), which would silently
    disable pruning on a time dimension — the most common z column
    there is. Values are unchanged; only the physical encoding is.

    NOT thread-safe with respect to other writers on the SAME
    SparkSession: the timestamp-type override is a session-wide conf
    mutated for the duration of this write, so a concurrent write from
    another thread observes TIMESTAMP_MICROS, and two interleaved
    ``write_zordered`` calls can restore the temporary value as the
    "previous" one. Serialize z-ordered writes per session, or give a
    concurrent writer its own ``spark.newSession()``."""
    keyed = zorder_key(
        df,
        cols,
        bits=bits,
        scaling=scaling,
        quantile_sample_rows=quantile_sample_rows,
    )
    part = (
        keyed.repartitionByRange(num_files, ZKEY)
        if num_files
        else keyed.repartitionByRange(ZKEY)
    )
    spark = df.sparkSession
    conf_key = "spark.sql.parquet.outputTimestampType"
    prev = spark.conf.get(conf_key)
    spark.conf.set(conf_key, "TIMESTAMP_MICROS")
    try:
        (
            part.sortWithinPartitions(ZKEY)
            .drop(ZKEY)
            .write.mode("overwrite")
            .parquet(path)
        )
    finally:
        spark.conf.set(conf_key, prev)


def zorder_scan_stats(
    spark, path: str, col: str, lo: float, hi: float
) -> dict:
    """Footer-only pruning report for ``col BETWEEN lo AND hi``: how
    many row groups the parquet min/max statistics exclude before any
    data page is read — the deterministic measure of a clustered
    layout's worth (a scheduler-noise-free twin of timing the scan)."""
    import glob as _glob
    import os

    import pyarrow.parquet as pq

    def as_float(v) -> float:
        # timestamp stats arrive as datetimes — compare on epoch
        # seconds, the same value a Spark double-cast of the column
        # yields, so callers pass one unit for both key and report
        return v.timestamp() if hasattr(v, "timestamp") else float(v)

    local = path[len("file://"):] if path.startswith("file://") else path
    total = skipped = rows_total = rows_skipped = 0
    for f in sorted(_glob.glob(os.path.join(local, "*.parquet"))):
        md = pq.ParquetFile(f).metadata
        idx = {md.schema.column(i).name: i for i in range(md.num_columns)}[col]
        for g in range(md.num_row_groups):
            rg = md.row_group(g)
            st = rg.column(idx).statistics
            total += 1
            rows_total += rg.num_rows
            if st is not None and st.has_min_max and (
                as_float(st.min) > hi or as_float(st.max) < lo
            ):
                skipped += 1
                rows_skipped += rg.num_rows
    return {
        "row_groups": total,
        "skipped": skipped,
        "skip_frac": round(skipped / total, 4) if total else 0.0,
        "rows_total": rows_total,
        "rows_skipped": rows_skipped,
    }
