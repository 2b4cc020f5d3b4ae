"""Text-analysis operators (SURVEY.md §2.b X4) over ``documents``.

All built-in Column expressions (whole-stage codegen); each has a DuckDB
twin in the oracle. These are the LLM-pipeline per-document featurizers:
stats/quality, language ID, token counting, content fingerprinting.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from ..functions.hashing import hex64
from ..functions.text import gram_array, tokens_array, normalize_text

# Tiny per-language stopword inventories for the n-gram/stopword-hit
# language heuristic. Fixed and mirrored in the oracle SQL — the point
# is agreement and plan shape, not linguistic accuracy.
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "in", "is", "that", "with"),
    "de": ("der", "die", "das", "und", "nicht", "ist", "ein", "mit"),
    "es": ("el", "la", "los", "de", "que", "es", "un", "con"),
    "fr": ("le", "la", "les", "et", "est", "un", "une", "dans"),
}

STOPWORDS_EN = LANG_STOPWORDS["en"] + ("a", "an", "it", "on", "for", "as", "at", "by")

# BPE-ish pre-tokenization classes (GPT-2-style coarse split): letter
# runs, single digits, other non-space symbols. Counting matches via
# regexp_count keeps it JVM-side.
BPE_PATTERN = "[a-zA-Z]+|[0-9]|[^a-zA-Z0-9\\s]"


def text_stats(documents: DataFrame) -> DataFrame:
    """Per-document quality features: token counts, length ratios,
    stopword ratio, digit-token ratio. Single-pass projection + one
    groupBy on exploded tokens."""
    toks = documents.select(
        "doc_id", F.explode(tokens_array(F.col("text"))).alias("word")
    )
    return (
        toks.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.countDistinct("word").alias("n_distinct"),
            F.round(F.avg(F.length("word")), 6).alias("avg_token_len"),
            F.round(
                F.avg(F.col("word").isin(*STOPWORDS_EN).cast("int")), 6
            ).alias("stopword_ratio"),
            F.round(
                F.avg(F.col("word").rlike("^[0-9]+$").cast("int")), 6
            ).alias("digit_ratio"),
        )
    )


def _quality_expr():
    """The composite quality formula over (n_tokens, n_distinct,
    stopword_ratio) columns — ONE definition shared by ``quality_score``
    and ``text_features`` so the value-identical twins cannot drift."""
    return (
        F.least(F.col("n_tokens") / 200.0, F.lit(1.0)) * 0.4
        + (F.col("n_distinct") / F.col("n_tokens")) * 0.3
        + F.least(F.col("stopword_ratio") * 4.0, F.lit(1.0)) * 0.3
    )


def _lang_argmax(scores: dict):
    """(best, guess) from per-language score columns: argmax with the
    deterministic tiebreak (score desc, language asc), ``'und'`` when no
    language scored — the cascade both the explode and map-only
    variants share (mirrored verbatim in the oracle SQL)."""
    best = F.greatest(*[scores[lang] for lang in sorted(scores)])
    guess = F.lit(None).cast("string")
    for lang in sorted(scores, reverse=True):
        guess = F.when(scores[lang] == best, F.lit(lang)).otherwise(guess)
    return best, F.when(best > 0, guess).otherwise(F.lit("und"))


def quality_score(documents: DataFrame) -> DataFrame:
    """Composite quality score in [0,1]-ish: rewards mid-length docs,
    lexical diversity, sane stopword rate. Pure arithmetic over
    text_stats — the shape of a production quality filter."""
    s = text_stats(documents)
    return s.select("doc_id", F.round(_quality_expr(), 6).alias("quality"))


def language_guess(documents: DataFrame) -> DataFrame:
    """Stopword-hit language ID: score each language by token hits,
    argmax with deterministic tiebreak (score desc, language asc).
    One explode + one groupBy; langs folded map-side."""
    toks = documents.select(
        "doc_id", F.explode(tokens_array(F.col("text"))).alias("word")
    )
    aggs = [
        F.sum(F.col("word").isin(*words).cast("int")).alias(f"s_{lang}")
        for lang, words in sorted(LANG_STOPWORDS.items())
    ]
    scored = toks.groupBy("doc_id").agg(*aggs)
    best, guess = _lang_argmax(
        {lang: F.col(f"s_{lang}") for lang in LANG_STOPWORDS}
    )
    return scored.select(
        "doc_id",
        guess.alias("lang_guess"),
        best.alias("best_score"),
    )


def token_counts(documents: DataFrame) -> DataFrame:
    """Token counting two ways: whitespace tokens and BPE-ish pieces
    (regexp_count of the GPT-2-style coarse classes) + chars — the
    standard 'how big is this corpus in tokens' accounting."""
    return documents.select(
        "doc_id",
        F.size(tokens_array(F.col("text"))).alias("ws_tokens"),
        F.regexp_count(F.col("text"), F.lit(BPE_PATTERN)).alias("bpe_tokens"),
        F.length("text").alias("n_chars_measured"),
    )


def tf_idf(documents: DataFrame, top_k: int | None = None) -> DataFrame:
    """TF-IDF over the corpus — the inverted index (O7–O14) upgraded to
    a ranked-relevance index, the standard text-featurization step.

    tf = count/doc_len; idf = ln((1+N)/(1+df)) + 1 (smoothed);
    returns (doc_id, word, tfidf) — optionally only each doc's top_k
    terms (row_number window, word tiebreak).

    Plan: postings aggregation (one shuffle), df per word rides the same
    shuffle as a second aggregation, doc lengths as a window-free
    groupBy, N broadcast as a 1-row cross join. At scale nothing here
    exceeds the postings relation's own size."""
    from pyspark.sql.window import Window

    postings = (
        documents.select(
            F.col("doc_id"), F.explode(tokens_array(F.col("text"))).alias("word")
        )
        .groupBy("doc_id", "word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    doc_len = postings.groupBy("doc_id").agg(F.sum("cnt").alias("len"))
    df_ = postings.groupBy("word").agg(F.count(F.lit(1)).alias("df"))
    n = documents.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        postings.join(doc_len, "doc_id")
        .join(df_, "word")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "word",
            (
                (F.col("cnt") / F.col("len"))
                * (F.log((1 + F.col("n_docs")) / (1 + F.col("df"))) + 1)
            ).alias("raw"),
        )
    )
    if top_k is not None:
        w = Window.partitionBy("doc_id").orderBy(F.desc("raw"), F.asc("word"))
        scored = scored.withColumn("rn", F.row_number().over(w)).where(
            F.col("rn") <= top_k
        ).drop("rn")
    return scored.select("doc_id", "word", F.round("raw", 6).alias("tfidf"))


def _char_grams(gram: int):
    """Array of all ``gram``-char windows of the normalized text column
    (shared by ``fingerprints`` and ``winnow_fingerprints`` so the
    windowing semantics — including the short-text guard — can never
    diverge between them)."""
    norm = normalize_text(F.col("text"))
    return F.transform(
        F.sequence(F.lit(1), F.greatest(F.length(norm) - (gram - 1), F.lit(1))),
        lambda i: F.substring(norm, i, gram),
    )


def fingerprints(documents: DataFrame, gram: int = 8) -> DataFrame:
    """Content fingerprint: min/max portable hash over ``gram``-char
    windows of normalized text (winnowing-style min-sampling, window
    count as a size proxy). Equal fingerprints ⇒ near-certain shared
    substring — the cheap first pass before pairwise verification.

    Map-only: the gram windows live in a per-row array, so min/max/
    distinct-count are array expressions — no explode, no groupBy, and
    (unlike the groupBy+countDistinct formulation) no shuffle of the
    full char-gram stream. One scan at any corpus size.

    Empty-normalized documents ('' or punctuation-only text) fingerprint
    as (NULL, NULL, 0): the earlier ''-gram behavior gave EVERY such doc
    identical min/max fingerprints, flooding a fingerprint-bucketed
    first-pass dedup with false near-certain candidates."""
    grams = _char_grams(gram)
    hashes = F.transform(F.col("_grams"), lambda g: hex64(g))
    # isNull first: length(NULL)==0 is NULL, which would route a
    # NULL-text doc to the otherwise-branch where size(NULL) yields -1
    empty = F.col("text").isNull() | (
        F.length(normalize_text(F.col("text"))) == 0
    )
    null_fp = F.lit(None).cast("bigint")
    return (
        documents.select("doc_id", F.col("text"), grams.alias("_grams"))
        .select(
            "doc_id",
            F.when(empty, null_fp).otherwise(F.array_min(hashes)).alias("min_fp"),
            F.when(empty, null_fp).otherwise(F.array_max(hashes)).alias("max_fp"),
            F.when(empty, F.lit(0))
            .otherwise(F.size(F.array_distinct("_grams")))
            .cast("bigint")
            .alias("n_grams"),
        )
    )


def text_features(documents: DataFrame, keep: tuple[str, ...] = ()) -> DataFrame:
    """Map-only twin of ``text_stats`` + ``quality_score`` +
    ``language_guess``: every statistic computed as array expressions
    over the token array of the row — no explode, no groupBy, ZERO
    shuffles. Returns (doc_id, n_tokens, n_distinct, avg_token_len,
    stopword_ratio, digit_ratio, lang_guess, quality), value-identical
    to the explode+groupBy versions (pinned by pytest).

    Two reasons this variant exists: (1) at 100 TB a per-document
    featurizer should cost exactly one scan — the explode+groupBy
    formulation shuffles the full exploded token stream to regroup rows
    that were already grouped; (2) per-row expressions are legal in
    Structured Streaming append mode, so the streaming corpus-prep
    pipeline (streaming/prep.py) can run the identical semantics
    without a stateful aggregation. Empty documents are dropped, same
    as explode's behavior in the groupBy twins. ``keep`` names extra
    input columns to carry through (streaming callers can't join them
    back without a stream-stream join)."""
    toks = F.col("_toks")
    n = F.size(toks)
    tok_rows = documents.select(
        "doc_id", *keep, tokens_array(F.col("text")).alias("_toks")
    ).where(F.size(toks) > 0)
    ratio = lambda pred: F.round(
        F.size(F.filter(toks, pred)) / n, 6
    )
    lang_hits = {
        lang: F.size(F.filter(toks, lambda x: x.isin(*words)))
        for lang, words in sorted(LANG_STOPWORDS.items())
    }
    best, guess = _lang_argmax(lang_hits)
    feats = tok_rows.select(
        "doc_id",
        *keep,
        n.cast("bigint").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("bigint").alias("n_distinct"),
        F.round(
            F.aggregate(toks, F.lit(0).cast("bigint"), lambda a, x: a + F.length(x))
            / n,
            6,
        ).alias("avg_token_len"),
        ratio(lambda x: x.isin(*STOPWORDS_EN)).alias("stopword_ratio"),
        ratio(lambda x: x.rlike("^[0-9]+$")).alias("digit_ratio"),
        guess.alias("lang_guess"),
        best.cast("bigint").alias("best_score"),
    )
    score = (
        F.least(F.col("n_tokens") / 200.0, F.lit(1.0)) * 0.4
        + (F.col("n_distinct") / F.col("n_tokens")) * 0.3
        + F.least(F.col("stopword_ratio") * 4.0, F.lit(1.0)) * 0.3
    )
    return feats.withColumn("quality", F.round(score, 6))


def unigram_logprob(
    documents: DataFrame, reference: DataFrame | None = None
) -> DataFrame:
    """Per-document mean token log-probability under a unigram language
    model estimated from ``reference`` (the corpus itself by default) —
    the CCNet-style perplexity filter: gibberish and boilerplate score
    far from the corpus center, so thresholding avg_logprob is the
    classic LM-based quality gate (perplexity = exp(-avg_logprob)).

    p(w) = count(w in reference) / total_reference_tokens, add-one
    smoothed over the reference vocabulary so scoring a corpus against
    a DIFFERENT reference never hits log(0) (unseen words fall back to
    the floor probability 1/(N+V)).

    Plan: the reference token stream aggregates to a (word, count)
    vocab relation (one partial-agged shuffle); the scored corpus'
    postings join it on word (both sides keyed by word — at 100 TB this
    is a plain shuffled equi-join of vocab-sized relations, or a
    broadcast when the vocab fits), then one groupBy(doc) mean. Same
    economics as tf_idf: nothing exceeds the postings relation."""
    ref = documents if reference is None else reference
    ref_counts = (
        ref.select(F.explode(tokens_array(F.col("text"))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("wc"))
    )
    totals = ref_counts.agg(
        F.sum("wc").alias("n_ref"), F.count(F.lit(1)).alias("v_ref")
    )
    postings = (
        documents.select(
            F.col("doc_id"), F.explode(tokens_array(F.col("text"))).alias("word")
        )
        .groupBy("doc_id", "word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    scored = (
        postings.join(ref_counts, "word", "left")
        .crossJoin(F.broadcast(totals))
        .select(
            "doc_id",
            "cnt",
            F.log(
                (F.coalesce(F.col("wc"), F.lit(0)) + 1)
                / (F.col("n_ref") + F.col("v_ref"))
            ).alias("lp"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.sum("cnt").cast("bigint").alias("n_tokens"),
        F.round(F.sum(F.col("lp") * F.col("cnt")) / F.sum("cnt"), 6).alias(
            "avg_logprob"
        ),
    )


def winnow_fingerprints(
    documents: DataFrame, gram: int = 8, window: int = 4
) -> DataFrame:
    """Winnowing (Schleimer/Wilkerson/Aiken): the robust local
    fingerprint set — hash every ``gram``-char window of normalized
    text, then keep the MIN hash of every ``window`` consecutive
    hashes, deduplicated. Guarantee: two documents sharing any
    substring of at least ``window + gram - 1`` chars share at least
    one fingerprint — the primitive under plagiarism/clone detection,
    far more robust than a single min/max pair (``fingerprints``).

    Map-only: grams, hashes, window-minima, and the distinct all live
    in per-row arrays — one scan, zero shuffles, ~len/2 fingerprints
    per doc on average (density 2/(window+1)).

    Returns (doc_id, fps: array<bigint>). Pair candidates come from
    ``explode(fps)`` + a self equi-join on the fingerprint — same
    economics as shingle joins but over a window-sampled subset."""
    grams = _char_grams(gram)
    hs = F.transform(F.col("_grams"), lambda g: hex64(g))
    minima = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size("_hs") - (window - 1), F.lit(1))),
        lambda i: F.array_min(F.slice("_hs", i, window)),
    )
    return (
        documents.select("doc_id", grams.alias("_grams"))
        .select("doc_id", hs.alias("_hs"))
        .select("doc_id", F.array_sort(F.array_distinct(minima)).alias("fps"))
    )


def winnow_pairs(
    documents: DataFrame, gram: int = 8, window: int = 4, min_shared: int = 1
) -> DataFrame:
    """Document pairs sharing ≥ ``min_shared`` winnowing fingerprints —
    candidates for shared substrings of length ≥ window+gram−1. One
    explode + equi-join on the fingerprint (shuffle keyed on fp values,
    never all-pairs), count folded per pair."""
    fps = winnow_fingerprints(documents, gram, window).select(
        "doc_id", F.explode("fps").alias("fp")
    )
    a = fps.select(F.col("doc_id").alias("doc_a"), "fp")
    b = fps.select(F.col("doc_id").alias("doc_b"), "fp")
    return (
        a.join(b, "fp")
        .where(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("shared_fps"))
        .where(F.col("shared_fps") >= min_shared)
    )


def repetition_flags(
    documents: DataFrame, dup_gram_n: int = 3, top_gram_n: int = 2
) -> DataFrame:
    """Gopher-style intra-document repetition signals (Rae et al. 2021,
    Table A1 — the public quality heuristics behind C4/Gopher/
    RefinedWeb-class corpus filters): per document,

    - ``n_lines``            non-empty lines
    - ``dup_line_frac``      1 − distinct/total over non-empty lines
    - ``dup_line_char_frac`` chars in lines occurring >1× (all
                             occurrences) / total line chars
    - ``top_gram``           most frequent ``top_gram_n``-token n-gram
                             (ties → lexicographically smallest)
    - ``top_gram_char_frac`` chars covered by all occurrences of
                             ``top_gram`` / normalized text chars
    - ``dup_gram_char_frac`` chars in ``dup_gram_n``-grams occurring
                             >1× / normalized text chars (Gopher's
                             uncapped definition: overlaps overcount,
                             values may exceed 1 on degenerate docs)

    Every document keeps a row (left joins from the corpus spine);
    degenerate docs (no lines / too few tokens) report zeros.

    Scale shape: ONE corpus scan (lines + both gram sizes share a
    tagged explode), one partial-agged gram-level shuffle
    (``groupBy(doc_id, kind, s)``), one doc-level aggregate whose
    argmax is a partial-aggregable ``min(struct(-c, s))`` (no window,
    no sort of the gram relation), and one doc_id join back to the
    corpus spine. All whole-stage-codegen expressions; no UDFs.
    """
    strip = lambda c: F.regexp_replace(c, r"^\s+|\s+$", "")
    toks = tokens_array(F.col("text"))
    base = documents.select(
        "doc_id",
        F.length(F.array_join(toks, " ")).alias("norm_chars"),
    )

    # ONE corpus scan: lines and both gram sizes ride a single tagged
    # explode (kind 0 = line, 1 = top-gram size, 2 = dup-gram size), so
    # there is exactly one gram-level shuffle — groupBy(doc_id, kind, s)
    # — and one doc-level aggregate. (The first cut of this operator
    # scanned the corpus 4× and sorted the full 2-gram relation in a
    # row_number window; measured 4× slower at sf0.01.)
    def grams(n: int, kind: int):
        g = gram_array(F.col("_toks"), n)
        return F.transform(
            g, lambda s: F.struct(F.lit(kind).alias("kind"), s.alias("s"))
        )

    lines_tagged = F.transform(
        F.filter(
            F.transform(F.split(F.col("text"), "\n"), strip), lambda l: l != ""
        ),
        lambda s: F.struct(F.lit(0).alias("kind"), s.alias("s")),
    )
    tagged = documents.select(
        "doc_id", F.col("text"), toks.alias("_toks")
    ).select(
        "doc_id",
        F.explode(
            F.concat(
                lines_tagged, grams(top_gram_n, 1), grams(dup_gram_n, 2)
            )
        ).alias("e"),
    )
    counted = tagged.groupBy(
        "doc_id", F.col("e.kind").alias("kind"), F.col("e.s").alias("s")
    ).agg(F.count(F.lit(1)).alias("c"))

    is_line = F.col("kind") == 0
    line_chars = F.when(is_line, F.col("c") * F.length("s"))
    # deterministic argmax without a window: min(struct(-c, s)) is
    # partial-aggregable and orders by (count desc, gram asc)
    top_struct = F.min(
        F.when(
            F.col("kind") == 1,
            F.struct((-F.col("c")).alias("nc"), F.col("s").alias("s")),
        )
    )
    per_doc = counted.groupBy("doc_id").agg(
        F.sum(F.when(is_line, F.col("c"))).alias("n_lines"),
        F.round(
            1 - F.count(F.when(is_line, F.lit(1))) / F.sum(F.when(is_line, F.col("c"))),
            6,
        ).alias("dup_line_frac"),
        F.round(
            F.sum(F.when(is_line & (F.col("c") > 1), F.col("c") * F.length("s")).otherwise(F.when(is_line, F.lit(0))))
            / F.sum(line_chars),
            6,
        ).alias("dup_line_char_frac"),
        top_struct.alias("_top"),
        F.sum(
            F.when(
                (F.col("kind") == 2) & (F.col("c") > 1),
                F.col("c") * F.length("s"),
            ).otherwise(F.when(F.col("kind") == 2, F.lit(0)))
        ).alias("dup_gram_chars"),
    )

    frac = lambda num: F.round(
        F.when(F.col("norm_chars") > 0, F.coalesce(num, F.lit(0)) / F.col("norm_chars"))
        .otherwise(0.0),
        6,
    )
    return base.join(per_doc, "doc_id", "left").select(
        "doc_id",
        F.coalesce(F.col("n_lines"), F.lit(0)).alias("n_lines"),
        F.coalesce(F.col("dup_line_frac"), F.lit(0.0)).alias("dup_line_frac"),
        F.coalesce(F.col("dup_line_char_frac"), F.lit(0.0)).alias(
            "dup_line_char_frac"
        ),
        F.col("_top.s").alias("top_gram"),
        frac((-F.col("_top.nc")) * F.length(F.col("_top.s"))).alias(
            "top_gram_char_frac"
        ),
        frac(F.col("dup_gram_chars")).alias("dup_gram_char_frac"),
    )


def hashed_doc_vectors(documents: DataFrame, dim: int = 64) -> DataFrame:
    """Hashing-trick document embeddings (HashingTF with sign hashing,
    Weinberger et al.): every token adds ±1 to bucket hex64(w) mod dim,
    sign from an independent hash bit. No trained model, no vocabulary
    — yet cosine over these vectors tracks token overlap, so the whole
    embedding toolbox (ann_topk_*, quantize_embeddings,
    embedding_near_dedup) works on text-only corpora out of the box.

    Returns (doc_id, embedding: array<double>), unnormalized (the
    consumers normalize; empty docs are dropped).

    Plan: explode → one partial-agged groupBy(doc, bucket) (shuffle
    rows = non-zero buckets ≤ dim per doc, ~16 B each) → one
    groupBy(doc) fold into the dense array via map_from_entries — the
    shuffle never carries dim-wide rows, only touched buckets."""
    h = hex64(F.col("word"))
    sign = (
        F.shiftrightunsigned(hex64(F.concat(F.col("word"), F.lit("|sgn"))), 3)
        .bitwiseAND(F.lit(1))
        * 2
        - 1
    )
    buckets = (
        documents.select(
            "doc_id", F.explode(tokens_array(F.col("text"))).alias("word")
        )
        .select("doc_id", (h % dim).cast("int").alias("bucket"), sign.alias("s"))
        .groupBy("doc_id", "bucket")
        .agg(F.sum("s").cast("double").alias("v"))
    )
    dense = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda j: F.coalesce(F.element_at(F.col("_m"), j), F.lit(0.0)),
    )
    return (
        buckets.groupBy("doc_id")
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct(F.col("bucket"), F.col("v")))
            ).alias("_m")
        )
        .select("doc_id", dense.alias("embedding"))
    )


def corpus_report(documents: DataFrame) -> DataFrame:
    """Per-(source, lang) corpus accounting — the release-notes table
    every corpus ship includes: document and token volumes, length
    percentiles, and the within-stratum exact-duplicate fraction.

    One stratum-keyed shuffle; token counts are per-row array
    expressions (no explode), percentiles are Spark's EXACT
    interpolated ``percentile`` so the DuckDB ``quantile_cont`` twin
    matches bit-for-bit (same convention as ``price_percentiles``),
    and the dup fraction rides the same aggregate as a
    ``count(DISTINCT hash)``."""
    n_toks = F.size(tokens_array(F.col("text")))
    rows = documents.select(
        "source",
        "lang",
        "n_chars",
        n_toks.alias("_ntoks"),
        hex64(F.col("text")).alias("_h"),
    )
    return rows.groupBy("source", "lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("_ntoks").alias("total_tokens"),
        F.sum("n_chars").alias("total_chars"),
        F.round(F.expr("percentile(_ntoks, 0.5)"), 4).alias("p50_tokens"),
        F.round(F.expr("percentile(_ntoks, 0.9)"), 4).alias("p90_tokens"),
        # each NULL-text doc counts as its own distinct document:
        # countDistinct skips NULLs, which would otherwise report null
        # rows as duplicates of each other
        F.round(
            1
            - (
                F.countDistinct("_h")
                + F.sum(F.col("_h").isNull().cast("long"))
            )
            / F.count(F.lit(1)),
            6,
        ).alias("dup_frac"),
    )


def bigram_logprob(
    documents: DataFrame, reference: DataFrame | None = None
) -> DataFrame:
    """Per-document mean BIGRAM log-probability — ``unigram_logprob``'s
    sharper sibling: conditional probabilities catch scrambled or
    template-stitched text that has a plausible word distribution but
    implausible word ORDER (the failure mode a unigram LM can't see).

    p(w2|w1) = (count(w1 w2) + 1) / (count(w1·) + V), add-one smoothed
    over the reference bigram-context vocabulary (V = distinct first
    words + 1 for the unseen context), estimated from ``reference``
    (the corpus itself by default). Documents with < 2 tokens score 0
    bigrams and are dropped (no conditional evidence either way).

    Plan: reference bigram counts ride the shingle machinery (one
    partial-agged shuffle of (bigram, count)); context counts are a
    second aggregation of the SAME relation (not a second corpus
    scan); the scored corpus' bigram stream joins both — word-keyed
    equi-joins of vocab-sized relations, broadcast when they fit —
    then one groupBy(doc) mean. Nothing exceeds the bigram relation.
    """
    from .dedup import _shingles

    ref = documents if reference is None else reference
    ref_bigrams = (
        _shingles(ref, n=2, distinct=False)
        .groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("bc"))
    )
    first_word = F.split(F.col("shingle"), " ")[0]
    ctx_counts = ref_bigrams.groupBy(first_word.alias("w1")).agg(
        F.sum("bc").alias("cc")
    )
    v = ctx_counts.agg((F.count(F.lit(1)) + 1).alias("v_ctx"))
    doc_bigrams = (
        _shingles(documents, n=2, distinct=False)
        .groupBy("doc_id", "shingle")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    scored = (
        doc_bigrams.join(ref_bigrams, "shingle", "left")
        .withColumn("w1", F.split(F.col("shingle"), " ")[0])
        .join(ctx_counts, "w1", "left")
        .crossJoin(F.broadcast(v))
        .select(
            "doc_id",
            "cnt",
            F.log(
                (F.coalesce(F.col("bc"), F.lit(0)) + 1)
                / (F.coalesce(F.col("cc"), F.lit(0)) + F.col("v_ctx"))
            ).alias("lp"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.sum("cnt").cast("bigint").alias("n_bigrams"),
        F.round(F.sum(F.col("lp") * F.col("cnt")) / F.sum("cnt"), 6).alias(
            "avg_logprob2"
        ),
    )
