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


def scd2_merge(dim: DataFrame, changes: DataFrame, key: str,
               tracked: list[str], ts_col: str = "change_ts",
               valid_from: str = "valid_from", valid_to: str = "valid_to",
               current: str = "is_current") -> DataFrame:
    """Slowly-changing-dimension type-2 merge: close the current row and
    open a new one when any tracked attribute changes; insert new keys;
    leave unchanged keys and all history untouched.

    ``dim`` holds (key, *tracked, valid_from, valid_to, current);
    ``changes`` holds (key, *tracked, ts_col) with AT MOST ONE row per key
    per merge (pre-aggregate upstream if arrivals can collide).

    Scale shape: history rows never move (filter + union, no shuffle);
    the current slice full-outer-joins the change set on the key — ONE
    shuffle — and each joined row emits its 0/1/2 output rows through an
    inline array-explode, so there is no second pass and no driver logic.
    Delta/Iceberg MERGE wraps this same plan in a commit protocol.
    """
    ts_type = dim.schema[valid_from].dataType
    hist = dim.filter(~F.col(current))
    cur = dim.filter(F.col(current))

    chg = changes.select(
        F.col(key).alias("__k"),
        F.col(ts_col).alias("__ts"),
        *[F.col(t).alias(f"__new_{t}") for t in tracked],
    )
    joined = cur.join(chg, F.col(key) == F.col("__k"), "full_outer")

    cur_exists = F.col(key).isNotNull()
    chg_exists = F.col("__k").isNotNull()
    differs = F.lit(False)
    for t in tracked:
        differs = differs | ~F.col(t).eqNullSafe(F.col(f"__new_{t}"))
    closing = chg_exists & differs

    old_row = F.when(
        cur_exists,
        F.struct(
            F.col(key).alias(key),
            *[F.col(t).alias(t) for t in tracked],
            F.col(valid_from).alias(valid_from),
            F.when(closing, F.col("__ts")).otherwise(F.col(valid_to)).alias(valid_to),
            (~closing).alias(current),
        ),
    )
    new_row = F.when(
        chg_exists & (differs | ~cur_exists),
        F.struct(
            F.col("__k").alias(key),
            *[F.col(f"__new_{t}").alias(t) for t in tracked],
            F.col("__ts").alias(valid_from),
            F.lit(None).cast(ts_type).alias(valid_to),
            F.lit(True).alias(current),
        ),
    )
    merged_cur = (
        joined.select(
            F.explode(
                F.filter(F.array(old_row, new_row), lambda x: x.isNotNull())
            ).alias("__r")
        )
        .select("__r.*")
    )
    return hist.unionByName(merged_cur)


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


def snapshot_diff(old: DataFrame, new: DataFrame, key: str,
                  compare: list[str]) -> DataFrame:
    """Change data feed between two snapshots of a keyed table: one row
    per changed key with ``op`` in ('I', 'U', 'D'), the compared columns
    from BOTH sides (``old_*`` / ``new_*``), unchanged keys dropped.

    This is the engine-level CDC primitive Delta's ``table_changes`` /
    Iceberg's changelog scan expose: a single full-outer join on the key
    — ONE shuffle at any scale (both sides hash-partitioned by key; with
    snapshots bucketed on the key, see sources/versioned.py, even that
    exchange disappears). Update detection is null-safe column equality
    (``<=>``), so NULL -> value and value -> NULL both count as updates.
    """
    o = old.select(key, *compare).alias("o")
    n = new.select(key, *compare).alias("n")
    joined = o.join(n, F.col(f"o.{key}") == F.col(f"n.{key}"), "full_outer")
    # Key-only table (no compared columns): rows can only appear or
    # disappear, never update — "same" is vacuously true.
    same = F.lit(True)
    for c in compare:
        same = same & F.col(f"o.{c}").eqNullSafe(F.col(f"n.{c}"))
    op = (
        F.when(F.col(f"n.{key}").isNull(), F.lit("D"))
        .when(F.col(f"o.{key}").isNull(), F.lit("I"))
        .when(~same, F.lit("U"))
    )
    out = joined.select(
        op.alias("op"),
        F.coalesce(F.col(f"o.{key}"), F.col(f"n.{key}")).alias(key),
        *[F.col(f"o.{c}").alias(f"old_{c}") for c in compare],
        *[F.col(f"n.{c}").alias(f"new_{c}") for c in compare],
    )
    return out.filter(F.col("op").isNotNull())


def snapshot_diff_aligned(old: DataFrame, new: DataFrame, key: str,
                          compare: list[str] | None = None) -> DataFrame:
    """``snapshot_diff`` tolerant of schema evolution between the two
    snapshots: ``compare`` defaults to the UNION of both sides' non-key
    columns, and a column absent on one side is padded with a typed
    null there — so a column add surfaces as 'U' rows (NULL -> value)
    instead of an AnalysisException, and a column drop as value ->
    NULL. An explicit ``compare`` naming a column absent on BOTH sides
    still fails, loudly, with the offending names. This is the diff
    every CDC read path uses (``table_changes`` and the streaming feed
    in streaming/cdc.py), so batch and feed agree on evolved schemas by
    construction."""
    old_types = {f.name: f.dataType for f in old.schema.fields}
    new_types = {f.name: f.dataType for f in new.schema.fields}
    if compare is None:
        # new's column order first (the common, un-evolved case is then
        # byte-identical to plain snapshot_diff), dropped columns after
        compare = [c for c in new.columns if c != key]
        compare += [c for c in old.columns if c != key and c not in new_types]
    missing = [c for c in compare if c not in old_types and c not in new_types]
    if missing:
        raise ValueError(
            f"compare columns {missing} exist in neither snapshot "
            f"(old: {sorted(old_types)}, new: {sorted(new_types)})"
        )
    for c in compare:
        if c not in old_types:
            old = old.withColumn(c, F.lit(None).cast(new_types[c]))
        if c not in new_types:
            new = new.withColumn(c, F.lit(None).cast(old_types[c]))
    return snapshot_diff(old, new, key, compare)


def delete_rows(base: DataFrame, keys: DataFrame | None = None,
                key: str | None = None,
                predicate: Column | str | None = None) -> DataFrame:
    """Targeted row deletion — the right-to-be-forgotten / retention
    primitive. Exactly one of two forms:

    - ``keys`` + ``key``: drop every base row whose key appears in the
      delete list (a GDPR request table). One LeftAnti join; the delete
      list is typically tiny and broadcasts, so the base never shuffles.
    - ``predicate``: drop rows where the predicate is TRUE. SQL DELETE
      semantics: rows where it evaluates NULL are KEPT (only a definite
      match deletes), which plain ``filter(~p)`` would get wrong.

    Deletion by rewrite is the honest model for immutable storage —
    Delta/Iceberg do the same per touched file; here the enclosing
    snapshot is the rewrite unit (``sources.versioned.delete_version``
    preserves the bucket/cluster/partition layout so downstream
    exchange-free joins survive the delete).
    """
    if (keys is None) == (predicate is None):
        raise ValueError("exactly one of keys or predicate is required")
    if keys is not None:
        if key is None:
            raise ValueError("key column name required with a delete list")
        return base.join(F.broadcast(keys.select(key)), key, "left_anti")
    p = F.expr(predicate) if isinstance(predicate, str) else predicate
    # keep rows where the predicate is FALSE or NULL
    return base.filter(~p.eqNullSafe(F.lit(True)))


def apply_expectations(df: DataFrame, rules: dict[str, Column],
                       ) -> tuple[dict[str, int], DataFrame]:
    """The expectations gate shared by the batch publish and the
    streaming sink: per-rule violation counts (ONE aggregate pass) plus
    the clean subset. NULL rule results are not definite violations —
    the row is kept (SQL CHECK semantics) — and an EMPTY input yields
    zero counts, not NULLs (F.sum over zero rows is NULL; the gate must
    publish an empty-but-valid batch, not crash)."""
    counts = {
        r["rule"]: int(r["violations"] or 0)
        for r in validate(df, rules).collect()
    }
    violated = None
    for cond in rules.values():
        c = cond.eqNullSafe(F.lit(True))
        violated = c if violated is None else (violated | c)
    return counts, df.filter(~violated)
