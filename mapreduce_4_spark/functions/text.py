"""Text cleaning / tokenization — the reference's O3/O4 as column expressions.

Reference semantics (SURVEY.md §2.1, pinned by the golden test):
``Mapper::lowerRemovePunc`` drops ``'\\n'`` and every ``ispunct`` char then
lowercases [binary: map/MapperImpl.so]; ``Mapper::tokenize`` splits on a
single space ``' '`` (NOT ``\\s+`` — tabs survive inside tokens) and drops
empty tokens. All of that is a handful of JVM-side built-ins here: no UDF,
fully inside WholeStageCodegen, so the hot path of the flagship query never
leaves Tungsten.

The punctuation contract: C ``ispunct`` in the "C" locale is exactly the
four contiguous ASCII ranges ``!-/  :-@  [-`  {-~`` — deliberately NOT
``\\p{Punct}``/``[[:punct:]]``, whose non-ASCII behavior differs between
regex engines (SURVEY.md §7.4). The same class string is shared with the
DuckDB oracle SQL so both engines run the identical regex.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: C-locale ispunct, as a regex class valid in both Java regex and RE2.
ASCII_PUNCT_CLASS = r"[!-/:-@\[-`{-~]"

#: What the reference removes per char: '\n' plus ispunct chars.
CLEAN_CLASS = r"[\n!-/:-@\[-`{-~]"


def clean_text(col: Column | str) -> Column:
    """lower(strip ispunct + newline) — reference ``lowerRemovePunc``.

    The reference strips before lowercasing; over ASCII the two operations
    commute, so a single pass each is equivalent.
    """
    return F.lower(F.regexp_replace(col, CLEAN_CLASS, ""))


def tokens(col: Column | str) -> Column:
    """Array of tokens: split cleaned text on a single space.

    Empty tokens (from runs of spaces) are NOT filtered here — callers
    filter after ``explode`` so the filter sits next to the generator in
    the plan (same as reference ``tokenize``'s empty-string skip).
    """
    return F.split(clean_text(col), " ")


def words(col: Column | str) -> Column:
    """Token array with empties removed — convenience for array-level use."""
    return F.filter(tokens(col), lambda w: F.length(w) > 0)


def sql_words(text_expr: str = "text") -> str:
    """DuckDB twin of ``words`` for oracle SQL — identical regex class,
    identical split/filter semantics."""
    return (
        f"list_filter(string_split(lower(regexp_replace({text_expr}, "
        f"'{CLEAN_CLASS}', '', 'g')), ' '), x -> len(x) > 0)"
    )
