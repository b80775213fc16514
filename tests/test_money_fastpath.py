"""Round-14 optimization equivalence pins.

The long-cents money fast path (functions/money.py) and the zip_with
n-gram/translate tokenizer rewrites (functions/text.py) claim BIT
IDENTICAL outputs to the decimal/regex forms they replaced. These tests
pin that claim structurally — per fixture column and on adversarial
synthetic rows — so a future edit that breaks the exactness contract
fails here, not in a driver hash mismatch.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from mapreduce_4_spark.functions.money import (
    cents, csum, dec, dsum, dsum_longs, unscale,
)
from mapreduce_4_spark.functions.text import CLEAN_CHARS, CLEAN_CLASS, ngrams_join
from mapreduce_4_spark.sources import load_table

SF = "/root/testdata/sf0.01"

#: every 2-dp measure column the fast path touches, with its table
MEASURES = [
    ("lineitem", "l_quantity"),
    ("lineitem", "l_extendedprice"),
    ("lineitem", "l_discount"),
    ("lineitem", "l_tax"),
    ("orders", "o_totalprice"),
    ("customer", "c_acctbal"),
    ("events", "value"),
]


@pytest.mark.parametrize("table,col", MEASURES)
def test_cents_equals_decimal_unscaled(spark, table, col):
    """cents(x) must equal the unscaled value DECIMAL(18,2) stores, for
    every row of every 2-dp fixture measure — the premise of the whole
    fast path (functions/money.py step 1)."""
    df = load_table(spark, SF, table).select(F.col(col).alias("x"))
    # dec(x) * 100 is an exact integer-valued decimal; compare as long
    bad = df.filter(
        (dec("x") * 100).cast("long") != cents("x")
    ).count()
    assert bad == 0


def test_csum_equals_dsum_per_group(spark):
    li = load_table(spark, SF, "lineitem")
    old = li.groupBy("l_returnflag").agg(dsum("l_quantity").alias("s")).collect()
    new = li.groupBy("l_returnflag").agg(csum("l_quantity").alias("s")).collect()
    assert {r["l_returnflag"]: r["s"] for r in old} == \
           {r["l_returnflag"]: r["s"] for r in new}


def test_product_sum_equals_decimal_product_sum(spark):
    """SUM(p*(1-d)) and SUM(p*(1-d)*(1+t)): decimal path vs long-cents
    products summed in DECIMAL(38,0) — bit-identical doubles."""
    li = load_table(spark, SF, "lineitem")
    dp_dec = dec("l_extendedprice") * (F.lit(1) - dec("l_discount"))
    ch_dec = dp_dec * (F.lit(1) + dec("l_tax"))
    p, d, t = cents("l_extendedprice"), cents("l_discount"), cents("l_tax")
    dp_c = p * (F.lit(100) - d)
    ch_c = dp_c * (F.lit(100) + t)
    old = li.groupBy("l_linestatus").agg(
        F.sum(dp_dec).cast("double").alias("a"),
        F.sum(ch_dec).cast("double").alias("b")).collect()
    new = li.groupBy("l_linestatus").agg(
        dsum_longs(dp_c, 4).alias("a"),
        dsum_longs(ch_c, 6).alias("b")).collect()
    assert {r["l_linestatus"]: (r["a"], r["b"]) for r in old} == \
           {r["l_linestatus"]: (r["a"], r["b"]) for r in new}


def test_unscale_is_exact_decimal_division(spark):
    """unscale must be a single correctly-rounded conversion: spot-check
    against Python's exact Fraction -> float on awkward sums."""
    from fractions import Fraction

    vals = [1, 7, 99, 10**15 + 1, 123456789012345678, -10**17 - 3]
    df = spark.createDataFrame([(v,) for v in vals], "s long")
    out = {r["s"]: (r["u2"], r["u6"]) for r in df.select(
        "s", unscale(F.col("s"), 2).alias("u2"),
        unscale(F.col("s"), 6).alias("u6")).collect()}
    for v in vals:
        assert out[v][0] == float(Fraction(v, 100))
        assert out[v][1] == float(Fraction(v, 10**6))


@pytest.mark.parametrize("n", [2, 3, 5])
def test_ngrams_join_equals_sequence_slice_form(spark, n):
    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    from mapreduce_4_spark.functions.text import words
    toks = docs.select("doc_id", words("text").alias("w"))
    old = F.when(
        F.size("w") >= n,
        F.transform(
            F.sequence(F.lit(1), F.size("w") - (n - 1)),
            lambda i: F.concat_ws(" ", F.slice("w", i, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    bad = toks.filter(ngrams_join(F.col("w"), n) != old).count()
    assert bad == 0


def test_translate_clean_equals_regexp_clean(spark):
    """translate(CLEAN_CHARS) == regexp_replace(CLEAN_CLASS) — on the
    fixture corpus AND on adversarial synthetic rows (every ASCII char,
    unicode neighbours of the stripped ranges, empties)."""
    docs = load_table(spark, SF, "documents").select("text")
    synth = spark.createDataFrame(
        [("".join(chr(c) for c in range(1, 128)),),
         ("", ), ("\n\t !~\x7f¡؟！ done",),
         ("café — naïve{x}",)],
        "text string")
    for df in (docs, synth):
        bad = df.filter(
            F.translate("text", CLEAN_CHARS, "")
            != F.regexp_replace("text", CLEAN_CLASS, "")
        ).count()
        assert bad == 0
