"""Table-maintenance operators: keyed upsert and data-quality validation
— the batch bookkeeping around a long-lived 100 TB table.

Upsert here is the engine-level pattern (anti-join + union); table
formats with transaction logs (Delta/Iceberg) wrap the same plan in
commit protocol. Validation emits per-rule violation counts so a
pipeline can gate promotion on them.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def upsert(base: DataFrame, updates: DataFrame, key: str) -> DataFrame:
    """updates win on key collision; base rows without updates survive.

    One broadcast-able anti-join + shuffle-free union: at scale the
    updates side is typically small and broadcast, so the base table
    never shuffles.
    """
    surviving = base.join(updates.select(key), key, "left_anti")
    return surviving.unionByName(updates)


def validate(df: DataFrame, rules: dict[str, Column]) -> DataFrame:
    """rules: name -> boolean Column that is True when VIOLATED.
    Returns one row per rule with its violation count — a single pass
    (one aggregate, conditional counts)."""
    agg = df.agg(
        *[
            F.sum(F.when(cond, 1).otherwise(0)).cast("long").alias(name)
            for name, cond in rules.items()
        ]
    )
    # unpivot the single summary row to (rule, violations) — stays a lazy
    # plan (no driver collect), so it composes into larger pipelines
    names = list(rules)
    pairs = ", ".join(f"'{n}', `{n}`" for n in names)
    return agg.select(
        F.expr(f"stack({len(names)}, {pairs}) AS (rule, violations)")
    )
