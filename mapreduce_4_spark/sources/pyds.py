"""Custom Python DataSource (Spark 4 DataSource API): a deterministic
synthetic row generator with real partition planning.

This is the idiomatic-PySpark replacement for the reference's
``dlopen``-loaded input plugin (``FileProcessorInput.so`` behind
``createInputObj``, asio_deep/main.cpp:219-226): where the reference
loads a shared object that enumerates and splits input files, the new
engine registers a Python class whose ``partitions()`` method plans the
splits and whose ``read(partition)`` generates each split's rows on the
executor that owns it.

Everything is deterministic (id-derived), so the source is fully
DuckDB-oracle-able (`range(n)` + md5), and partitioning is an explicit,
testable contract: ``parts`` input partitions of contiguous id ranges,
each read independently — the shape that scales a custom source to many
executors (partition planning on the driver is O(parts); row generation
is distributed).
"""

from __future__ import annotations

import hashlib
from math import ceil

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

#: modulus for the synthetic bucket column
N_BUCKETS = 32


class _RangePartition(InputPartition):
    def __init__(self, lo: int, hi: int):
        self.lo = lo
        self.hi = hi


class SynthRowsDataSource(DataSource):
    """``spark.read.format("synthrows").option("n", N).option("parts", P)``
    -> (id bigint, bucket int, payload string) with payload = md5(id)."""

    @classmethod
    def name(cls) -> str:
        return "synthrows"

    def schema(self) -> str:
        return "id bigint, bucket int, payload string"

    def reader(self, schema) -> "SynthRowsReader":
        return SynthRowsReader(self.options)

    def simpleStreamReader(self, schema) -> "SynthRowsStreamReader":
        return SynthRowsStreamReader(self.options)


class SynthRowsReader(DataSourceReader):
    def __init__(self, options):
        self.n = int(options.get("n", 1000))
        self.parts = int(options.get("parts", 4))

    def partitions(self):
        step = max(1, ceil(self.n / self.parts))
        return [
            _RangePartition(lo, min(self.n, lo + step))
            for lo in range(0, self.n, step)
        ]

    def read(self, partition: _RangePartition):
        for i in range(partition.lo, partition.hi):
            yield (
                i,
                i % N_BUCKETS,
                hashlib.md5(str(i).encode("ascii")).hexdigest(),
            )


def register_synth_source(spark) -> None:
    """Idempotent registration (re-registering the same name is a no-op
    overwrite in the Python data source registry)."""
    spark.dataSource.register(SynthRowsDataSource)


def _row(i: int):
    return (i, i % N_BUCKETS, hashlib.md5(str(i).encode("ascii")).hexdigest())


class SynthRowsStreamReader(SimpleDataSourceStreamReader):
    """Streaming twin of :class:`SynthRowsReader`: the same deterministic
    id-derived rows arrive as micro-batches of ``batch`` rows until the
    ``n``-row corpus is exhausted — the reference's partitioned text
    source (O2) as an unbounded-source contract.

    Offsets are ``{"next": i}`` watermarks into the id space, so the
    exactly-once replay contract is trivial to honor:
    ``readBetweenOffsets`` regenerates any [start, end) slice
    bit-identically (rows are pure functions of the id), which is what
    makes checkpoint recovery deterministic for this source. A real
    connector (queue, CDC feed, object-store listing) implements the
    same three methods; the id space stands in for its log positions.
    """

    def __init__(self, options):
        self.n = int(options.get("n", 1000))
        self.batch = int(options.get("batch", 100))

    def initialOffset(self) -> dict:
        return {"next": 0}

    def read(self, start: dict):
        lo = int(start["next"])
        hi = min(self.n, lo + self.batch)
        return iter([_row(i) for i in range(lo, hi)]), {"next": hi}

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter([_row(i) for i in range(int(start["next"]),
                                            int(end["next"]))])
