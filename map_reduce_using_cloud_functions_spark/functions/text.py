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
_WS = r"\s+"
_NON_ALNUM = "[^a-zA-Z0-9 ]"  # after collapsing, the only whitespace left is ' '


def normalize_text(text: Column) -> Column:
    """Lowercased, whitespace-collapsed, punctuation-deleted text."""
    collapsed = F.lower(F.regexp_replace(text, _WS, " "))
    return F.regexp_replace(collapsed, _NON_ALNUM, "")


def tokens_array(text: Column) -> Column:
    """``array<string>`` of tokens; empty strings dropped like str.split()."""
    return F.filter(F.split(normalize_text(text), " "), lambda w: w != "")


def normalize_query_word(word: Column) -> Column:
    """Probe-word normalization (reference ``main/app.py:67-68``):
    strip, lower, delete non-alphanumerics (whitespace kept by the regex
    class, but a valid query contains none — ``main/app.py:43-44``)."""
    return F.regexp_replace(F.lower(F.trim(word)), _NON_ALNUM, "")


# DuckDB twin of tokens_array(text): produces one row per token when
# wrapped in unnest(...). DuckDB regexp_replace needs the explicit 'g'
# flag for global replacement (Spark is global by default).
TOKEN_SQL = (
    "unnest(list_filter("
    "string_split(regexp_replace(lower(regexp_replace({col}, '\\s+', ' ', 'g')),"
    " '[^a-z0-9 ]', '', 'g'), ' '), w -> w <> ''))"
)
