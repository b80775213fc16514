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

#: The same character set, spelled out for ``translate`` — newline plus
#: the four contiguous ASCII ranges ``!-/  :-@  [-`  {-~`` (string
#: equality with C ispunct is pinned by tests/test_wordcount_golden.py).
CLEAN_CHARS = "\n" + "".join(
    chr(c) for r in ((0x21, 0x2F), (0x3A, 0x40), (0x5B, 0x60), (0x7B, 0x7E))
    for c in range(r[0], r[1] + 1)
)


def clean_text(col: Column | str) -> Column:
    """lower(strip ispunct + newline) — reference ``lowerRemovePunc``.

    The reference strips before lowercasing; over ASCII the two operations
    commute, so a single pass each is equivalent.

    Implemented with ``translate`` (a per-code-unit char map, no regex
    engine) rather than ``regexp_replace`` over ``CLEAN_CLASS``: the two
    are semantically identical for a single-char class (each listed char
    deleted, everything else untouched, non-ASCII unaffected either way)
    and translate measured ~1.3x faster on the explode-heavy wordcount
    shape (round-14 optimization, guide §1.2 "per-task work"). The
    DuckDB oracle keeps the regex spelling (CLEAN_CLASS) — the
    cross-engine contract is unchanged and every text query stays
    hash-green against it.
    """
    return F.lower(F.translate(col, CLEAN_CHARS, ""))


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


def ngrams_join(w: Column, n: int) -> Column:
    """Space-joined word n-grams of a token array, one pass.

    ``n-1`` chained ``zip_with``s over the n shifted views of ``w``
    instead of ``transform(sequence(1, size-n+1), i -> concat_ws(' ',
    slice(w, i, n)))``: no per-position index array and no per-gram
    n-slot slice allocation (round-14 optimization, guide §1.2 per-task
    work; ~1.2x measured on the sf0.1 3-gram explode). Identical
    output: element i is ``w[i] .. w[i+n-1]`` space-joined either way.

    ``greatest(.., 0)`` keeps the slice length legal for rows shorter
    than n (yielding an empty gram array, exactly like the sequence
    form under its callers' ``size >= n`` guards).
    """
    cnt = F.greatest(F.size(w) - F.lit(n - 1), F.lit(0))
    out = F.slice(w, 1, cnt)
    for j in range(2, n + 1):
        out = F.zip_with(out, F.slice(w, j, cnt),
                         lambda acc, x: F.concat(acc, F.lit(" "), x))
    return out


def sql_words(text_expr: str = "text") -> str:
    """DuckDB twin of ``words`` for oracle SQL — identical regex class,
    identical split/filter semantics."""
    return (
        f"list_filter(string_split(lower(regexp_replace({text_expr}, "
        f"'{CLEAN_CLASS}', '', 'g')), ' '), x -> len(x) > 0)"
    )
