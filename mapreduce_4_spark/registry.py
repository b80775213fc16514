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


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None = None, tags: tuple[str, ...] = (),
             description: str = "") -> Callable[[Builder], Builder]:
    """Decorator: register ``builder(spark, sf_dir) -> DataFrame``."""

    def deco(builder: Builder) -> Builder:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = QuerySpec(
            name=name, builder=builder, oracle=oracle, tags=tags,
            description=description or (builder.__doc__ or "").strip().splitlines()[0]
            if (description or builder.__doc__) else "",
        )
        return builder

    return deco


def queries() -> dict[str, Builder]:
    return {name: spec.builder for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: spec.oracle for name, spec in REGISTRY.items()
            if spec.oracle is not None}
