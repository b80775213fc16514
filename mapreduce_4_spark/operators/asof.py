"""As-of join — "latest right-side row at or before each left timestamp"
— an operator the reference lacks and Spark has no built-in for
(SURVEY.md §2.2 joins row: "as-of via window").

Implementation is the union-merge pattern, the scale-correct shape:

1. tag left (probe) and right (reference) rows, union them on aligned
   schemas,
2. one shuffle on the join key, sort within partition by (time, side),
3. ``last(right_value, ignorenulls=True)`` over an unbounded-preceding
   window carries the most recent right row forward,
4. keep probe rows.

Cost: one shuffle + one sort — same as a sort-merge join — with NO pair
explosion: a probe row never meets more than the one right row it
resolves to, unlike the naive theta-join (probe x all-earlier-rows) the
equivalent SQL states. That asymmetry is why this exists as an operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(left: DataFrame, right: DataFrame, on: str,
              left_time: str, right_time: str,
              value_cols: list[str],
              right_tiebreak: str | None = None) -> DataFrame:
    """For each left row: the ``value_cols`` of the latest right row with
    right_time <= left_time, matched on ``on``. Nulls when none precede.

    ``right_tiebreak`` (a right-side column, e.g. a unique key) makes
    the winner among right rows with equal timestamps deterministic —
    required for oracle parity and for idempotent task retries.

    All ``value_cols`` travel as ONE struct, so every output row's
    values come from the SAME winning right row — carrying columns
    independently would let a NULL in one value column stitch values
    from two different reference rows.
    """
    from pyspark.sql.types import StructField, StructType

    tb = right_tiebreak
    vals_type = StructType(
        [StructField(c, right.schema[c].dataType) for c in value_cols]
    )
    lt = left.select(
        F.col(on),
        F.col(left_time).alias("_t"),
        F.lit(1).alias("_is_probe"),
        F.lit(None).cast(right.schema[tb].dataType if tb else "long").alias("_tb"),
        F.lit(None).cast(vals_type).alias("_vals"),
        *[F.col(c) for c in left.columns if c != on and c != left_time],
    )
    rt = right.select(
        F.col(on),
        F.col(right_time).alias("_t"),
        F.lit(0).alias("_is_probe"),
        (F.col(tb) if tb else F.lit(0)).alias("_tb"),
        F.struct(*[F.col(c) for c in value_cols]).alias("_vals"),
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in left.columns
            if c != on and c != left_time
        ],
    )
    merged = lt.unionByName(rt)
    # reference rows sort before probe rows at equal timestamps (so a
    # right row at exactly left_time is visible to that probe row), and
    # among equal-time reference rows the tie-break orders the winner last
    w = (
        Window.partitionBy(on)
        .orderBy(F.col("_t"), F.col("_is_probe"), F.asc_nulls_last("_tb"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = merged.select(
        "*", F.last("_vals", ignorenulls=True).over(w).alias("_asof")
    )
    probe_cols = [c for c in left.columns if c != on and c != left_time]
    return (
        carried.filter(F.col("_is_probe") == 1)
        .select(
            F.col(on),
            F.col("_t").alias(left_time),
            *probe_cols,
            *[F.col(f"_asof.{c}").alias(c) for c in value_cols],
        )
    )
