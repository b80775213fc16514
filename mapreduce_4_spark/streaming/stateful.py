"""Custom stateful streaming operator via applyInPandasWithState —
the engine's arbitrary-state surface (task spec: "applyInPandasWithState
for custom stateful operators"), beyond what built-in windowed
aggregations express.

The example keeps a running (count, integer-cent sum) per user across
micro-batches: state lives in the state store, survives batches, and is
keyed exactly like a shuffle — the streaming analogue of the reference's
reducer merge, but incremental and unbounded.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("total_events", LongType()),
        StructField("total_value_cents", LongType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("n", LongType()),
        StructField("cents", LongType()),
    ]
)


def _update_user_totals(
    key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    n, cents = state.get if state.exists else (0, 0)
    for pdf in batches:
        n += len(pdf)
        # integer cents, not float sums: state must be exact and
        # order-independent across micro-batch boundaries
        cents += int(pdf["value_cents"].sum())
    state.update((n, cents))
    yield pd.DataFrame(
        {"user_id": [key[0]], "total_events": [n], "total_value_cents": [cents]}
    )


def stream_user_totals(stream: DataFrame) -> DataFrame:
    """Running per-user totals with explicit state management."""
    from pyspark.sql import functions as F

    prepared = stream.select(
        "user_id",
        F.round(F.col("value") * 100).cast("long").alias("value_cents"),
    )
    return prepared.groupBy("user_id").applyInPandasWithState(
        _update_user_totals,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
