"""Distributed BPE (byte-pair-encoding) vocabulary training + encoding.

Classic Sennrich-style BPE (Sennrich, Haddow & Birch 2016 — the public
algorithm behind GPT-2/LLaMA-class tokenizers): start from characters,
repeatedly merge the most frequent adjacent symbol pair. The tokenizer
half of an LLM data pipeline the reference engine has nothing like.

Spark-first decomposition:

- The CORPUS is scanned exactly once — ``word_symbol_counts`` folds it
  to the distinct-word relation ``(word, n, syms)``. Everything after
  runs on that relation, which is vastly smaller than the corpus
  (≈10⁷ distinct words vs 10¹¹ tokens at 100 TB) and constant-size
  across merge rounds.
- Each merge round is (a) one partial-agged pair-count aggregation
  (shuffle carries distinct (a,b) pairs, weighted map-side by word
  frequency — never one row per occurrence), (b) a 1-row
  ``orderBy().limit(1)`` argmax to the driver (the merge decision is
  the only sequential dependency — BPE is inherently ordered), and
  (c) a MAP-ONLY greedy merge application via the ``aggregate``
  higher-order function (left fold with lookback — leftmost-first
  greedy, exactly the reference algorithm's ``merge_vocab``).
- Lineage is cut after every ``checkpoint_every`` accumulated MERGE
  expressions with ``localCheckpoint`` (merges, not driver rounds —
  a batched round nests one expression per merge) so n_merges merges
  can't stack n_merges plans.

No UDFs anywhere — the per-word sequential merge walk (the part that
looks imperative) is an ``F.aggregate`` fold, JVM-side.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

from ..functions.text import tokens_array


def word_symbol_counts(documents: DataFrame, end_mark: str = "·") -> DataFrame:
    """(word, n, syms): distinct words with corpus frequency and their
    initial character-symbol arrays; the trailing ``end_mark`` makes
    word-final merges distinct from word-internal ones (the standard
    '</w>' trick, one char here so tests stay readable)."""
    words = (
        documents.select(F.explode(tokens_array(F.col("text"))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    syms = F.concat(
        F.filter(F.split(F.col("word"), ""), lambda c: c != ""),
        F.array(F.lit(end_mark)),
    )
    return words.withColumn("syms", syms)


def _merge_expr(syms: Column, a: str, b: str) -> Column:
    """Greedy leftmost application of merge rule (a, b) → a+b as a left
    fold: append each symbol unless the accumulator tail is ``a`` and
    the incoming symbol is ``b`` — then replace the tail with the
    merged symbol. Overlap semantics match the sequential reference
    walk (e.g. rule (a,a) on 'aaaa' → [aa, aa])."""
    merged = a + b
    return F.aggregate(
        syms,
        F.array().cast("array<string>"),
        lambda acc, s: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(a))
            & (s == F.lit(b)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(merged))
            ),
        ).otherwise(F.concat(acc, F.array(s))),
    )


def pair_counts(words: DataFrame) -> DataFrame:
    """(a, b, cnt): adjacent-symbol pair frequencies weighted by word
    count (all occurrences, overlaps included — the reference
    ``get_stats``). Partial-agged; the shuffle carries distinct pairs."""
    pairs = F.when(
        F.size("syms") >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size("syms") - 1),
            lambda i: F.struct(
                F.element_at(F.col("syms"), i).alias("a"),
                F.element_at(F.col("syms"), i + 1).alias("b"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<a:string,b:string>>"))
    return (
        words.select(F.col("n"), F.explode(pairs).alias("p"))
        .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .agg(F.sum("n").alias("cnt"))
    )


def _select_disjoint_batch(
    rows, batch_size: int, min_count: int, neighbor_max: dict | None = None
) -> list[tuple[str, str, int]]:
    """Greedy prefix of the (cnt desc, a, b) order that is pairwise
    symbol-disjoint. Stops at the FIRST conflicting pair (rather than
    skipping past it), so every selected rule outranks every unselected
    one — the property that keeps batched order consistent with the
    sequential argmax walk. ``a+b`` joins the used set too: a later
    rule touching the newly minted symbol must wait for a recount.

    ``neighbor_max`` closes the product-pair parity hole (found r5 on
    the tie-heavy fixture vocabulary): merging (a, b) → ab CREATES
    pairs (x, ab) / (ab, y), and the sequential argmax considers them
    immediately. A created pair's count is bounded by the pre-merge
    neighbor pair's — cnt(x, ab) ≤ cnt(x, a), cnt(ab, y) ≤ cnt(b, y) —
    so the batch may continue only while the candidate's count is
    STRICTLY above every earlier selection's max neighbor-pair count
    (ties are unsafe too: a created pair that ties can still win the
    (a asc, b asc) tie-break). ``neighbor_max`` maps
    ``("L", sym) → max cnt of pairs ending in sym`` and
    ``("R", sym) → max cnt of pairs starting with sym``; when absent
    (batch_size=1) the guard is vacuous."""
    used: set[str] = set()
    batch: list[tuple[str, str, int]] = []
    created_bound = -1  # max possible count of any pair a selection created
    for row in rows:
        a, b, cnt = row["a"], row["b"], int(row["cnt"])
        if cnt < min_count:
            break
        if a in used or b in used:
            break
        if batch and cnt <= created_bound:
            break
        batch.append((a, b, cnt))
        used.update((a, b, a + b))
        if neighbor_max is not None:
            created_bound = max(
                created_bound,
                min(
                    cnt,
                    max(
                        neighbor_max.get(("L", a), 0),
                        neighbor_max.get(("R", b), 0),
                    ),
                ),
            )
        else:
            # without neighbor data nothing below cnt is provably safe
            created_bound = cnt
        if len(batch) >= batch_size:
            break
    return batch


def train_bpe(
    documents: DataFrame,
    n_merges: int,
    min_count: int = 2,
    end_mark: str = "·",
    checkpoint_every: int = 8,
    batch_merges: int = 1,
    stats: dict | None = None,
) -> list[tuple[str, str, int]]:
    """Learn up to ``n_merges`` merge rules → [(a, b, count), ...] in
    merge order. Stops early when no pair reaches ``min_count``.
    Deterministic: ties broken by (a asc, b asc), no RNG anywhere.

    ``batch_merges > 1`` applies up to that many *symbol-disjoint*
    merges per driver round (one pair-count aggregation + one collect
    amortized over the whole batch — the standard batching trick for
    the inherently sequential Sennrich loop; r3 verdict item 5).
    Disjointness means no later batch rule touches a symbol an earlier
    one consumed or produced, and selection stops at the first
    conflict, so each selected rule was the argmax among all pairs its
    predecessors could not have changed. Counts of pairs disjoint from
    a merged {a, b} are invariant under that merge, so recorded counts
    equal the sequential trainer's. The remaining divergence window —
    a merge's PRODUCT immediately forming a pair that outcounts (or
    ties and tie-break-beats) the rest of the batch — is closed by the
    created-pair bound guard in ``_select_disjoint_batch``
    (neighbor-pair maxima cap what any created pair can count; the
    batch stops before a candidate that bound could trump). Found live
    by the r5 measurement on the tie-heavy fixture vocabulary — see
    the guard's docstring; parity is pinned by tests/test_bpe.py
    (fixture + randomized corpora + the sf0.1 relation) and measured
    rounds/wall live in BASELINE.md's BPE section.

    ``stats``: optional dict the trainer fills with ``{"rounds": N}`` —
    the driver-round count is the batching win being measured, so it is
    reported rather than re-derived by callers."""
    words = word_symbol_counts(documents, end_mark).localCheckpoint()
    merges: list[tuple[str, str, int]] = []
    rounds = 0
    uncheckpointed = 0  # MERGE expressions since the last lineage cut
    while len(merges) < n_merges:
        rounds += 1
        # fetch enough of the head to fill a batch even when some of it
        # conflicts; the stop-at-first-conflict rule needs only a prefix
        pc = pair_counts(words)
        if batch_merges > 1:
            # Materialize the pair relation once: the head sort and the
            # neighbor-maxima guard queries below reuse it instead of
            # re-running the corpus-relation aggregation 3x per round.
            pc = pc.localCheckpoint()
        head = (
            pc.orderBy(F.desc("cnt"), F.asc("a"), F.asc("b"))
            .limit(max(batch_merges * 2, 1))
            .collect()
        )
        neighbor_max = None
        if batch_merges > 1 and head:
            # created-pair bounds for the guard: max count of any pair
            # ending in a head 'a' (left neighbor) / starting with a
            # head 'b' (right neighbor) — two small aggregations over
            # the materialized pair relation, collecting |head| rows.
            a_syms = list({r["a"] for r in head})
            b_syms = list({r["b"] for r in head})
            left = pc.where(F.col("b").isin(a_syms)).select(
                F.lit("L").alias("side"), F.col("b").alias("sym"), "cnt"
            )
            right = pc.where(F.col("a").isin(b_syms)).select(
                F.lit("R").alias("side"), F.col("a").alias("sym"), "cnt"
            )
            neighbor_max = {
                (r["side"], r["sym"]): int(r["m"])
                for r in left.unionByName(right)
                .groupBy("side", "sym")
                .agg(F.max("cnt").alias("m"))
                .collect()
            }
        batch = _select_disjoint_batch(
            head,
            min(batch_merges, n_merges - len(merges)),
            min_count,
            neighbor_max,
        )
        if not batch:
            break
        merges.extend(batch)
        col = F.col("syms")
        for a, b, _ in batch:
            col = _merge_expr(col, a, b)
        words = words.withColumn("syms", col)
        # cadence counts MERGES, not driver rounds: a batched round
        # nests len(batch) _merge_expr wrappings, and the cut exists to
        # bound nested-expression depth (Catalyst analysis/codegen
        # cost), which grows per merge expression.
        uncheckpointed += len(batch)
        if uncheckpointed >= checkpoint_every:
            words = words.localCheckpoint()
            uncheckpointed = 0
    if stats is not None:
        stats["rounds"] = rounds
    return merges


def apply_merges(words: DataFrame, merges: list[tuple[str, str, int]],
                 checkpoint_every: int = 8) -> DataFrame:
    """Apply a learned merge list, in order, to a (…, syms) relation —
    the encode path (map-only per rule; lineage cut periodically so
    vocab-sized rule lists don't build unbounded expression trees)."""
    out = words
    for r, (a, b, _) in enumerate(merges):
        out = out.withColumn("syms", _merge_expr(F.col("syms"), a, b))
        if (r + 1) % checkpoint_every == 0:
            out = out.localCheckpoint()
    return out


def bpe_token_counts(
    documents: DataFrame, merges: list[tuple[str, str, int]], end_mark: str = "·"
) -> DataFrame:
    """(token, cnt): corpus token counts under the learned vocabulary —
    the 'how big is the corpus in MY tokenizer's tokens' accounting.
    One corpus scan + the distinct-word encode + one final agg."""
    words = word_symbol_counts(documents, end_mark)
    encoded = apply_merges(words, merges)
    return (
        encoded.select("n", F.explode("syms").alias("token"))
        .groupBy("token")
        .agg(F.sum("n").alias("cnt"))
    )
