"""The user-defined-function surface — the engine's replacement for the
reference's runtime plugin mechanism (SURVEY.md §2.1 O11: dlopen +
createInputObj factories, asio_deep/main.cpp:98-149). One of each kind,
each replicating a reference operator so fidelity is oracle-checkable:

- row Python UDF        -> O3 lowerRemovePunc, as the literal char loop
- scalar pandas UDF     -> O4 token counting, Arrow-vectorized
- grouped applyInPandas -> O9 reduce: per-group word-frequency merge
- grouped-agg pandas UDF-> custom aggregate over integer state (exact)
- Python UDTF           -> O4 tokenize as a generator (1 row -> n rows)

Performance note (the reason these are NOT used by the hot-path plans):
the same semantics exist as built-ins in functions/text.py — JVM-side,
codegen'd. UDFs cross the Python boundary; pandas/Arrow variants
amortize it per batch, the row UDF pays it per row. They exist to prove
the extension surface, mirroring how a reference user would load a
custom .so.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import functions as F  # noqa: F401  (kept for parity with sibling modules)
from pyspark.sql.functions import pandas_udf, udf
from pyspark.sql.types import IntegerType, LongType, StringType

_PUNCT = set(r"""!"#$%&'()*+,-./:;<=>?@[\]^_`{|}~""")


@udf(StringType())
def clean_text_py(line: str | None) -> str | None:
    """O3 ``lowerRemovePunc`` as the reference implements it: walk chars,
    drop '\\n' and ispunct, lowercase the rest [binary:
    map/MapperImpl.so]. Row-at-a-time on purpose — the fidelity probe."""
    if line is None:
        return None
    return "".join(c.lower() for c in line if c != "\n" and c not in _PUNCT)


def _tokens_of(line: str) -> list[str]:
    # O4 tokenize: split on single space only, drop empties
    return [t for t in clean_text_py.func(line).split(" ") if t]


@pandas_udf(IntegerType())
def token_count_pandas(texts: pd.Series) -> pd.Series:
    """O4 as a vectorized count: tokens per document, one Arrow batch at
    a time (the 10-100x-over-row-UDF path)."""
    return texts.map(lambda t: 0 if t is None else len(_tokens_of(t))).astype("int32")


def wordcount_group(pdf: pd.DataFrame) -> pd.DataFrame:
    """O9 reducer body for applyInPandas: merge word counts within one
    group (the reference merges per input-file directory; here the group
    key is whatever groupBy supplies)."""
    counts: dict[str, int] = {}
    for text in pdf["text"]:
        for tok in _tokens_of(text or ""):
            counts[tok] = counts.get(tok, 0) + 1
    lang = pdf["lang"].iloc[0]
    return pd.DataFrame(
        {"lang": lang, "word": list(counts.keys()), "cnt": list(counts.values())}
    )


WORDCOUNT_GROUP_SCHEMA = "lang string, word string, cnt long"


@pandas_udf(LongType())
def k_sum_agg(k: pd.Series) -> int:
    """Grouped-agg pandas UDF over integer state — exact regardless of
    row order within the group (why no float accumulates here)."""
    return int(k.sum())


@pandas_udf(LongType())
def n_rows_agg(k: pd.Series) -> int:
    """Companion grouped-agg count (Spark disallows mixing pandas and
    JVM aggregates in one agg(), so the count is a pandas UDAF too)."""
    return int(len(k))


def register_tokenize_udtf(spark) -> None:
    """O4 as a Python UDTF: one input row -> one output row per token.
    Registered for the SQL lateral-join path, the closest analogue to
    the reference's pluggable mapper."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="word: string")
    class Tokenize:
        def eval(self, text: str | None):  # noqa: D102
            for tok in _tokens_of(text or ""):
                yield (tok,)

    spark.udtf.register("tokenize_ref", Tokenize)


def arrow_wordcount_batches(batches):
    """O7's map-side combiner through the Arrow plugin surface: consume
    raw RecordBatches of (text), emit one RecordBatch of per-batch
    PARTIAL (word, count) pairs — the shuffler's insert-or-increment map
    [binary: shuffle/ShufflerImpl.so :: shuffleFile] expressed as a
    ``mapInArrow`` iterator. The partials shrink each Arrow batch to its
    vocabulary before anything shuffles; Spark's final hash aggregate
    sums them (reference O9). Zero pandas conversion — columns move
    Arrow-native both ways."""
    import collections

    import pyarrow as pa

    for batch in batches:
        counter: collections.Counter = collections.Counter()
        for line in batch.column("text").to_pylist():
            if line is None:
                continue
            for tok in _tokens_of(line):
                counter[tok] += 1
        if counter:
            yield pa.RecordBatch.from_pydict(
                {"word": list(counter.keys()),
                 "partial": list(counter.values())}
            )


def register_leading_words_udtf(spark) -> None:
    """POLYMORPHIC Python UDTF (Spark 4 ``analyze()``): the output
    schema is computed at PLAN time from the constant ``n`` argument —
    ``leading_words(text, 3)`` yields columns (w0, w1, w2), the
    dynamic-pivot shape static UDTFs cannot express. Completes the O11
    plugin family with the schema-computing mechanism (the reference's
    plugins fix their schema at compile time; Spark's analyze() hook
    moves that decision to query planning). Tokenization is an ASCII
    whitespace-run split (``re.split(r'\\s+', ..., flags=re.ASCII)``,
    empties dropped) — NOT ``str.split()``, whose Unicode whitespace
    (NBSP, em-space, ...) DuckDB's RE2 ``\\s`` cannot see, which would
    break the oracle on non-ASCII corpora (r14 review finding). The
    oracle replays it exactly with regexp_split_to_array + an ASCII
    ``\\s`` strip; parity on tab/newline/NBSP edges is pinned in
    tests/test_unicode_parity.py."""
    from pyspark.sql.functions import udtf
    from pyspark.sql.types import StringType, StructType
    from pyspark.sql.udtf import AnalyzeArgument, AnalyzeResult

    @udtf
    class LeadingWords:
        @staticmethod
        def analyze(text: AnalyzeArgument,
                    n: AnalyzeArgument) -> AnalyzeResult:
            if not isinstance(n.value, int) or n.value < 1:
                raise ValueError(
                    "leading_words(text, n): n must be a constant "
                    f"positive integer, got {n.value!r}")
            schema = StructType()
            for i in range(n.value):
                schema = schema.add(f"w{i}", StringType())
            return AnalyzeResult(schema=schema)

        def eval(self, text: str | None, n: int):
            import re

            # ASCII \s only — RE2-parity (see class docstring); the
            # empty-string filter is the strip+split equivalence
            words = [w for w in re.split(r"\s+", text or "",
                                         flags=re.ASCII) if w]
            yield tuple((words + [None] * n)[:n])

    spark.udtf.register("leading_words", LeadingWords)
