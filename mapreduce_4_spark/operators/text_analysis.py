"""Text-analysis operators — the generalization of the reference's seed
capability (word counting, SURVEY.md §2.2 "LLM-pipeline: text analysis")
into the metrics a training-data pipeline needs: token statistics,
quality scoring, heuristic language ID, document fingerprints.

Everything is pure column expressions over the reference-fidelity
tokenizer (functions/text.py) — integer sums and single IEEE divisions,
so the SQL-expressible subset has exact DuckDB oracles. No Python in any
hot path; at 100 TB these are scan-bound single-pass projections.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from mapreduce_4_spark.functions.text import (
    ASCII_PUNCT_CLASS, ngrams_join, words,
)

#: the ASCII_PUNCT_CLASS characters spelled out for translate()
#: (C-locale ispunct: the four ranges !-/ :-@ [-` {-~)
PUNCT_CHARS = "".join(
    chr(c) for r in ((0x21, 0x2F), (0x3A, 0x40), (0x5B, 0x60), (0x7B, 0x7E))
    for c in range(r[0], r[1] + 1)
)

#: tiny per-language stopword inventories for the n-gram/stopword
#: language-ID heuristic. Deliberately small and ASCII — the point is the
#: operator shape (portable to any lexicon), not lexical coverage.
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "de": ("der", "die", "das", "und", "ist", "nicht"),
    "en": ("the", "a", "of", "and", "is", "to"),
    "es": ("el", "la", "de", "y", "es", "que"),
    "fr": ("le", "la", "et", "est", "les", "des"),
    "zh": (),  # non-Latin script: handled by the ascii-ratio feature
}


def n_words(ws: Column) -> Column:
    return F.size(ws)


def n_distinct_words(ws: Column) -> Column:
    return F.size(F.array_distinct(ws))


def sum_word_len(ws: Column) -> Column:
    """Total characters across tokens — integer aggregate, exact."""
    return F.aggregate(ws, F.lit(0), lambda acc, w: acc + F.length(w))


def punct_count(text: Column | str) -> Column:
    # translate (char map) instead of regexp_replace over the class —
    # identical single-char-delete semantics, no regex engine in the
    # per-row path (round-14; same rewrite as functions.text.clean_text)
    c = F.col(text) if isinstance(text, str) else text
    return F.length(c) - F.length(F.translate(c, PUNCT_CHARS, ""))


def stopword_hits(ws: Column, stopwords: tuple[str, ...]) -> Column:
    if not stopwords:
        return F.lit(0)
    return F.size(F.filter(ws, lambda w: w.isin(*stopwords)))


def quality_features(text_col: str = "text") -> dict[str, Column]:
    """The standard quality-signal bundle for one document."""
    ws = words(text_col)
    nw = n_words(ws)
    return {
        "n_words": nw.cast("long"),
        "n_chars": F.length(text_col).cast("long"),
        "avg_word_len": sum_word_len(ws).cast("double") / nw,
        "punct_ratio": punct_count(text_col).cast("double") / F.length(text_col),
        "uniq_ratio": n_distinct_words(ws).cast("double") / nw,
        "stopword_ratio": stopword_hits(ws, LANG_STOPWORDS["en"]).cast("double") / nw,
    }


def lang_scores(ws: Column) -> dict[str, Column]:
    return {
        lang: stopword_hits(ws, sw) for lang, sw in LANG_STOPWORDS.items() if sw
    }


def fingerprint_md5(text_col: str = "text") -> Column:
    """Normalization-robust fingerprint: md5 over the cleaned token
    stream — invariant to case, punctuation, and run-of-space layout."""
    return F.md5(F.concat_ws(" ", words(text_col)).cast("binary"))


def fingerprint_rolling(text_col: str = "text") -> Column:
    """Order-sensitive 64-bit rolling fingerprint: fold xxhash64 over the
    token stream (hash chaining). Fastest variant (pure JVM long mixing)
    but xxhash64 chaining has no ANSI-SQL twin — use
    ``fingerprint_chain_md5`` when cross-engine verifiability matters."""
    return F.aggregate(
        words(text_col),
        F.lit(0).cast("long"),
        lambda acc, w: F.xxhash64(acc, w),
    )


def fingerprint_chain_md5(text_col: str = "text") -> Column:
    """Order-sensitive chained fingerprint, engine-portable: fold
    state = md5(state || ' ' || token) over the token stream. Same
    hash-chaining shape as ``fingerprint_rolling`` but expressible in any
    engine with md5 + a list fold, so it oracle-checks bit-for-bit."""
    return F.aggregate(
        words(text_col),
        F.lit(""),
        lambda acc, w: F.md5(F.concat(acc, F.lit(" "), w).cast("binary")),
    )


def ngram_set(text_col: str | Column, n: int) -> Column:
    """Distinct space-joined word n-grams of a document.

    The tokenizer output is bound ONCE via a lambda variable (transform
    over a one-element array): referencing the words() expression
    directly in the per-position lambda would re-run the whole
    regex-tokenize pipeline for every gram position — Catalyst does not
    CSE through lambda scopes, and the difference is ~10x on gram-heavy
    plans."""
    def grams_of(w: Column) -> Column:
        # ngrams_join yields [] below n words on its own (its slice
        # count clamps at 0), so no when() guard is needed
        return F.array_distinct(ngrams_join(w, n))

    return F.element_at(F.transform(F.array(words(text_col)), grams_of), 1)


def decontaminate(train: DataFrame, evalset: DataFrame, n: int = 3,
                  min_shared: int = 3, id_col: str = "doc_id",
                  text_col: str = "text") -> DataFrame:
    """Benchmark-contamination check: for every training document, count
    how many of its distinct word n-grams also occur in the evaluation
    set, and flag docs at or above ``min_shared`` — the standard
    n-gram-overlap decontamination pass run before training.

    Shape at scale: both sides explode to (doc, gram) pairs; the eval
    gram set is aggregated small (distinct grams of a benchmark corpus)
    and BROADCAST against the training explosion, so the training corpus
    is touched once, never shuffled on gram. Returns
    (id_col, n_shared_grams, contaminated) for every training doc."""
    train_grams = train.select(
        F.col(id_col), F.explode(ngram_set(text_col, n)).alias("gram")
    )
    eval_grams = (
        evalset.select(F.explode(ngram_set(text_col, n)).alias("gram"))
        .distinct()
    )
    shared = (
        train_grams.join(F.broadcast(eval_grams), "gram")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_shared_grams"))
    )
    return (
        train.select(id_col)
        .join(shared, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_shared_grams", F.lit(0)).alias("n_shared_grams"),
            (F.coalesce("n_shared_grams", F.lit(0)) >= min_shared)
            .alias("contaminated"),
        )
    )


def chunk_text(df, chunk_chars: int = 120, overlap: int = 24,
               text_col: str = "text", id_col: str = "doc_id"):
    """Split each document into fixed-size character windows with overlap
    — the training-data chunking primitive (context-window packing).

    Chunk i covers [i*stride, i*stride + chunk_chars) with
    stride = chunk_chars - overlap; every doc yields >= 1 chunk. Pure
    built-ins (sequence + explode + substring), so the fan-out runs
    JVM-side inside codegen and scales linearly with no shuffle at all —
    chunks stay on their document's partition.
    """
    if overlap >= chunk_chars:
        raise ValueError("overlap must be smaller than chunk_chars")
    stride = chunk_chars - overlap
    n_chunks = F.greatest(
        F.lit(1).cast("long"),
        F.ceil((F.length(text_col) - F.lit(overlap)) / F.lit(float(stride))),
    )
    return (
        df.select(
            id_col,
            text_col,
            F.explode(
                F.sequence(F.lit(0).cast("long"), n_chunks - 1)
            ).alias("chunk_idx"),
        )
        .select(
            id_col,
            "chunk_idx",
            F.expr(
                f"substring({text_col}, CAST(chunk_idx * {stride} + 1 AS INT), {chunk_chars})"
            ).alias("chunk"),
        )
        .withColumn("chunk_len", F.length("chunk").cast("long"))
    )


#: PII patterns valid in both Java regex (Spark) and RE2 (DuckDB oracle):
#: no backreferences, no lookaround — engine-portable by construction.
PII_PATTERNS = (
    ("n_emails", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("n_phones", r"\d{3}[-.]\d{3}[-.]\d{4}", "<PHONE>"),
    ("n_ids", r"\d{9,}", "<ID>"),
)


def redact_pii(df, text_col: str = "text", id_col: str = "doc_id"):
    """Scrub emails, phone numbers, and long id runs from a text column,
    reporting per-pattern hit counts. Pattern order matters (emails
    first, so their digit fragments never half-match as phones); counts
    are taken on the raw text, replacements applied sequentially. All
    JVM-side regexp built-ins — the scrub runs inside codegen, no Python.
    """
    redacted = F.col(text_col)
    counts = []
    for name, pat, token in PII_PATTERNS:
        counts.append(F.regexp_count(F.col(text_col), F.lit(pat)).cast("long").alias(name))
        redacted = F.regexp_replace(redacted, pat, token)
    return df.select(id_col, redacted.alias("redacted"), *counts)
