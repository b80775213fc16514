"""Query registry — the single source of truth for the engine's surface.

Every operator/query the engine claims (SURVEY.md §2.2 capability matrix)
registers here with a DataFrame builder and, where SQL-expressible, the
equivalent DuckDB oracle SQL. ``__spark_entry__.py`` exposes exactly this
registry to the driver, and ``tests/test_oracle_parity.py`` replays the
driver's comparison locally.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

Builder = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    builder: Builder
    oracle: str | None          # DuckDB SQL; None => rows-only check
    tags: tuple[str, ...] = field(default=())
    description: str = ""
    #: REQUIRED for oracle=None entries: one line saying WHY no SQL twin
    #: exists, so a driver `err: no_oracle` correctness row is
    #: self-explaining (surfaced in QUERIES.md and the CLI listing, and
    #: exported as __spark_entry__.ROWS_ONLY for the verdict to check in
    #: one glance).
    rows_only_reason: str | None = None
    #: shared-component dependencies (e.g. "mr4ver-read"): when ANY
    #: query requiring a component goes red in the LATEST driver
    #: correctness round, every query requiring that component loses
    #: its accumulated green priority and re-enters the head-50 sample
    #: — the r12 stale-green blind spot (versioned_datasource_orders
    #: broke after earning its green and the rotation hid it).
    requires: tuple[str, ...] = field(default=())


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None = None, tags: tuple[str, ...] = (),
             description: str = "",
             rows_only_reason: str | None = None,
             requires: tuple[str, ...] = ()) -> Callable[[Builder], Builder]:
    """Decorator: register ``builder(spark, sf_dir) -> DataFrame``."""

    def deco(builder: Builder) -> Builder:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        if (oracle is None) != (rows_only_reason is not None):
            raise ValueError(
                f"{name}: rows-only queries (oracle=None) must state a "
                "rows_only_reason, and oracled queries must not"
            )
        REGISTRY[name] = QuerySpec(
            name=name, builder=builder, oracle=oracle, tags=tags,
            description=description or (builder.__doc__ or "").strip().splitlines()[0]
            if (description or builder.__doc__) else "",
            rows_only_reason=rows_only_reason,
            requires=requires,
        )
        return builder

    return deco


def requires_map() -> dict[str, tuple[str, ...]]:
    """name -> shared-component dependencies, for every query that
    declares any (the rotation's red-component discount input)."""
    return {name: spec.requires for name, spec in REGISTRY.items()
            if spec.requires}


def rows_only() -> dict[str, str]:
    """name -> reason for every registered query WITHOUT a SQL oracle —
    the documented exceptions a driver `err: no_oracle` row maps to."""
    return {name: spec.rows_only_reason for name, spec in REGISTRY.items()
            if spec.oracle is None}


def queries() -> dict[str, Builder]:
    return {name: spec.builder for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: spec.oracle for name, spec in REGISTRY.items()
            if spec.oracle is not None}
