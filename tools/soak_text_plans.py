"""100x soak of the heavy non-dedup text plans (r6 verdict task 8).

``text_repetition_flags``, ``text_tfidf`` and ``text_bigram_logprob``
are the three most expensive judged text featurizers with no soak row:
each carries exactly one corpus-wide gram/posting shuffle (the stage
worth watching at 100 TB), and their BASELINE evidence so far is
sf0.1-only. Replicate the sf0.1 documents with DISTINCT doc ids per
replica — scaling the shuffle key population, not just row counts —
and measure wall + output shape through the noop sink (min-of-2, the
host-noise protocol's estimator).

Scale expectations (linear evidence = no hidden superlinearity):
- repetition_flags: map-side line/gram explodes + ONE partial-agged
  per-doc gram shuffle; doc-keyed, so distinct ids per replica grow
  the key space 100x with constant per-key work.
- tf_idf: postings shuffle + a word-keyed df join; replicas share the
  word vocabulary, so df counts grow 100x per word but the vocab (join
  key space) stays fixed — the adversarial direction for a hot-key
  join.
- bigram_logprob: the gram shuffle plus TWO vocab-sized equi-joins
  (bigram + context); same fixed-vocab regime.

Usage: python tools/soak_text_plans.py [REP] [SF_DIR]
(defaults: 100 /root/testdata/sf0.1). Prints one block for BASELINE.md.
"""

from __future__ import annotations

import sys
import time

import pyspark.sql.functions as F

sys.path.insert(0, ".")

from map_reduce_using_cloud_functions_spark.operators import text_analysis as ta  # noqa: E402
from map_reduce_using_cloud_functions_spark.session import get_spark  # noqa: E402
from map_reduce_using_cloud_functions_spark.sources import load_table  # noqa: E402


def wall(action, n: int = 2) -> float:
    best = float("inf")
    for _ in range(n):
        t0 = time.time()
        action()
        best = min(best, time.time() - t0)
    return best


def noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    rep = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    spark = get_spark("soak_text")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, sf_dir, "documents")
    n0 = docs.count()
    reps = F.broadcast(spark.range(rep).select(F.col("id").alias("rep")))
    big = docs.crossJoin(reps).select(
        (F.col("doc_id") + F.col("rep") * F.lit(10**9)).alias("doc_id"),
        "text",
        "lang",
        "source",
        "n_chars",
    )
    print(f"corpus: {n0:,} docs x {rep} replicas = {n0 * rep:,} docs (distinct ids)")

    for name, plan in (
        ("text_repetition_flags", lambda: ta.repetition_flags(big)),
        ("text_tfidf", lambda: ta.tf_idf(big)),
        ("text_bigram_logprob", lambda: ta.bigram_logprob(big)),
    ):
        t = wall(lambda p=plan: noop(p()), n=2)
        rows = plan().count()
        print(f"{name} {rep}x: {rows:,} rows, wall {t:.1f} s (min-of-2, noop sink)")


if __name__ == "__main__":
    main()
