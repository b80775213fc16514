"""Physical-layout operators: bucketing for shuffle-free joins and key
salting for skew — the two levers that decide whether a 100 TB join is a
co-located merge or a cluster-wide reshuffle (SURVEY.md §2.2 joins row;
task spec: "repartition/bucketing for co-located joins, salting for
skew").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_bucketed(df: DataFrame, table: str, bucket_cols: list[str],
                   n_buckets: int = 8) -> None:
    """Persist as a bucketed+sorted managed table. Two tables bucketed
    the same way join with ZERO exchanges — at 100 TB this converts the
    recurring fact-fact join cost into a one-time layout cost."""
    (
        df.write.mode("overwrite")
        .bucketBy(n_buckets, *bucket_cols)
        .sortBy(*bucket_cols)
        .saveAsTable(table)
    )


def salted_join(left: DataFrame, right: DataFrame, key: str,
                n_salts: int = 8, how: str = "inner") -> DataFrame:
    """Skew-resistant equi-join.

    A hot key floods one reducer in a plain hash join. Salting splits
    each left key into ``n_salts`` deterministic sub-keys (hash of the
    whole row, not rand() — retries must be idempotent) and replicates
    the right side once per salt, so the hot key's rows spread over
    ``n_salts`` tasks. Net cost: right side x n_salts — the standard
    trade when AQE's skew handling isn't available or the skew is in a
    single key within one partition.

    Column sets must be disjoint apart from ``key``.

    Only inner/left/left_semi joins are supported: the right side is
    replicated once per salt, so an unmatched RIGHT row would surface
    ``n_salts`` times under right/full-outer semantics. Those shapes
    need a different skew strategy (AQE skew join or two-phase union).
    """
    if how not in ("inner", "left", "left_outer", "left_semi"):
        raise ValueError(
            f"salted_join supports inner/left/left_semi, got {how!r}: "
            "right-side replication would duplicate unmatched right rows"
        )
    salt = F.pmod(F.xxhash64(F.struct(*[F.col(c) for c in left.columns])),
                  F.lit(n_salts))
    l_salted = left.withColumn("_salt", salt)
    r_salted = right.join(
        right.sparkSession.range(n_salts).select(F.col("id").cast("int").alias("_salt")),
        how="cross",
    )
    out = l_salted.join(r_salted, [key, "_salt"], how)
    return out.drop("_salt")
