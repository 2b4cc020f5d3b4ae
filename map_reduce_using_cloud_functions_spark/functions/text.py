"""Text-normalization expressions — the reference's tokenizer, exactly.

The reference tokenizes as (``mapper/main.py:56-60``):

    1. ``re.sub(r'\\s+', ' ', content)``  — collapse all whitespace runs
    2. ``.lower()``                       — ASCII-and-beyond lowercase
    3. ``re.sub(r'[^a-zA-Z0-9\\s]', '', …)`` — DELETE punctuation/non-ASCII,
       no space inserted: ``state-of-the-art`` → ``stateoftheart``,
       ``naïve`` → ``nave`` (SURVEY.md §2 quirks 1).
    4. ``.split()``                       — whitespace split, empties dropped

The query path applies the same normalization to the probe word
(``main/app.py:67-68``), so both sides live here. Everything is built-in
Column expressions (JVM-side, whole-stage codegen) — no Python UDF in
the hot path.

``TOKEN_SQL`` is the ANSI-SQL twin used by the DuckDB oracle; keeping it
adjacent to the Spark expression makes drift visible in review.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column

# Collapse-then-delete order matters (reference applies \s+ first); since
# the deletion class preserves spaces, the composed result equals
# delete-then-collapse, but we keep the reference's order verbatim.
#
# The reference runs PYTHON re, where \s is the str.isspace() set —
# including \x1c-\x1f, \x85, \xa0 and the Unicode space blocks. Java's
# \s is ASCII-only, so we spell out Python's set (chars embedded
# literally; valid in both Java regex and RE2). Found by the
# property test: '0\x1f0' must tokenize to ['0','0'], not ['00'].
_PY_WS_CHARS = (
    "\t\n\x0b\f\r \x1c\x1d\x1e\x1f\x85\xa0\u1680"
    "\u2000-\u200a\u2028\u2029\u202f\u205f\u3000"
)
_WS = f"[{_PY_WS_CHARS}]+"
_NON_ALNUM = "[^a-zA-Z0-9 ]"  # after collapsing, the only whitespace left is ' '


def normalize_text(text: Column) -> Column:
    """Lowercased, whitespace-collapsed, punctuation-deleted text."""
    collapsed = F.lower(F.regexp_replace(text, _WS, " "))
    return F.regexp_replace(collapsed, _NON_ALNUM, "")


def tokens_array(text: Column) -> Column:
    """``array<string>`` of tokens; empty strings dropped like str.split()."""
    return F.filter(F.split(normalize_text(text), " "), lambda w: w != "")


def gram_array(toks: Column, n: int) -> Column:
    """``array<string>`` of space-joined n-grams over a token array —
    THE gram builder shared by shingle-MinHash, duplicated-span
    detection, decontamination, and repetition scoring, so every
    gram-keyed operator agrees on gram identity by construction.

    Guard: ``sequence(1, 0)`` in Spark is the DESCENDING ``[1, 0]``,
    not empty, so token arrays shorter than ``n`` need the explicit
    empty-array branch."""
    idx = F.sequence(F.lit(1), F.size(toks) - (n - 1))
    return F.when(
        F.size(toks) >= n,
        F.transform(
            idx,
            lambda i: F.concat_ws(
                " ", *[F.element_at(toks, i + off) for off in range(n)]
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))


def normalize_query_word_py(word: str) -> str:
    """Driver-side twin of ``normalize_query_word`` (the executable spec
    of reference ``main/app.py:67-68``). Used where the engine needs the
    normalized probe as a plain value — e.g. to derive the partition key
    for index-file pruning before the query ships to executors."""
    import re

    return re.sub(r"[^a-zA-Z0-9\s]", "", word.strip().lower())


def normalize_query_word(word: Column) -> Column:
    """Probe-word normalization (reference ``main/app.py:67-68``):
    strip, lower, delete non-alphanumerics (whitespace kept by the regex
    class, but a valid query contains none — ``main/app.py:43-44``).

    Exact twin of ``normalize_query_word_py``: the deletion class keeps
    PYTHON's whitespace set (spelled out — Java ``\\s`` is ASCII-only)
    and the strip removes that same set, matching ``str.strip()``
    (``F.trim`` strips spaces only, which diverged for tab-bearing
    probes)."""
    stripped = F.regexp_replace(
        word, f"^[{_PY_WS_CHARS}]+|[{_PY_WS_CHARS}]+$", ""
    )
    return F.regexp_replace(
        F.lower(stripped), f"[^a-zA-Z0-9{_PY_WS_CHARS}]", ""
    )


def register_sql_functions(spark) -> None:
    """UDF extension surface: expose the engine's text normalization to
    SQL callers as registered functions — ``tokenize(text)`` →
    ``array<string>`` and ``normalize_query(word)`` → ``string``.

    The engine's own plans never call these (hot paths stay built-in
    codegen expressions — ``tokens_array``/``normalize_query_word``);
    they exist so a SQL-only user can apply the reference-exact
    tokenizer in ad-hoc ``spark.sql`` queries. Arrow-vectorized
    ``pandas_udf`` (batch transfer, not per-row), implemented directly
    on Python ``re`` — the same executable spec
    (``mapper/main.py:56-60``) the expression path is property-tested
    against, so the two stay equal by construction."""
    import re

    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    ws = re.compile(r"\s+")
    non_alnum = re.compile(r"[^a-zA-Z0-9\s]")

    # ONE executable pipeline for both SQL surfaces (scalar UDF + UDTF)
    # — a fix to either (e.g. the \s-set subtlety in the module
    # docstring) cannot miss the other.
    def tok(t):
        if t is None:
            return None
        return non_alnum.sub("", ws.sub(" ", t).lower()).split()

    def _tokenize(texts):
        return texts.map(tok)

    def _normalize_query(words):
        return words.map(
            lambda w: None if w is None else normalize_query_word_py(w)
        )

    # real class objects, not strings: this module uses postponed
    # annotation evaluation, which pandas_udf's hint inspection can't see
    _tokenize.__annotations__ = {"texts": pd.Series, "return": pd.Series}
    _normalize_query.__annotations__ = {"words": pd.Series, "return": pd.Series}

    spark.udf.register("tokenize", pandas_udf(_tokenize, "array<string>"))
    spark.udf.register("normalize_query", pandas_udf(_normalize_query, "string"))

    # UDTF (table function) surface: one row per (position, token) —
    # SELECT t.* FROM probe, LATERAL explode_tokens(text) t. The plan
    # path gets the same via posexplode(tokens_array(..)); this is the
    # SQL-callable twin.
    from pyspark.sql.functions import udtf

    class _ExplodeTokens:
        def eval(self, text):
            if text is None:
                return
            for pos, t in enumerate(tok(text)):
                yield pos, t

    spark.udtf.register(
        "explode_tokens", udtf(_ExplodeTokens, returnType="pos int, token string")
    )


# DuckDB twin of tokens_array(text): produces one row per token when
# wrapped in unnest(...). DuckDB regexp_replace needs the explicit 'g'
# flag for global replacement (Spark is global by default). RE2's \s is
# ASCII-only like Java's, so the same Python-whitespace extras are
# spelled out in \x{...} form.
PY_WS_RE2 = (
    # \x{b} spelled out: RE2's \s is [\t\n\f\r ] — NO vertical tab —
    # while Python/Java \s includes it; without it '0\x0b0' tokenizes
    # to ['0','0'] in Spark but ['00'] in the DuckDB twin.
    "[\\s\\x{b}\\x{1c}-\\x{1f}\\x{85}\\x{a0}\\x{1680}"
    "\\x{2000}-\\x{200a}\\x{2028}\\x{2029}\\x{202f}\\x{205f}\\x{3000}]+"
)
# Brace-escaped so the template survives str.format (the RE2 \x{..}
# escapes would otherwise be eaten as format fields).
_PY_WS_RE2_TMPL = PY_WS_RE2.replace("{", "{{").replace("}", "}}")
TOKEN_SQL = (
    "unnest(list_filter("
    "string_split(regexp_replace(lower(regexp_replace({col}, '" + _PY_WS_RE2_TMPL + "', ' ', 'g')),"
    " '[^a-z0-9 ]', '', 'g'), ' '), w -> w <> ''))"
)
