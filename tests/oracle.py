"""Local replay of the driver's DuckDB-oracle comparison.

Mirrors the contract in ``__spark_entry__.py``: row-count + column names +
order-insensitive value comparison. Values are canonicalized to strings
(floats via ``repr`` — i.e. bit-exactness is the bar we hold ourselves to,
the strictest possible reading of the driver's value-hash).
"""

from __future__ import annotations

import datetime as _dt
import decimal
import math

import duckdb

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _canon(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, decimal.Decimal):
        return str(v)
    if isinstance(v, _dt.datetime):
        return v.isoformat()
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon(x) for x in v) + "]"
    if isinstance(v, bool):
        return str(v)
    return str(v)


def _rows_canonical(cols: list[str], rows: list[tuple]) -> list[tuple[str, ...]]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_canon(r[i]) for i in order) for r in rows)


#: DuckDB -> Spark type canon (duck TIMESTAMP is naive == Spark NTZ; the
#: fixtures' parquet columns read as NTZ, so computed columns align to it)
_DUCK2SPARK = {
    "INTEGER": "int", "BIGINT": "bigint", "HUGEINT": "int128",
    "SMALLINT": "smallint", "DOUBLE": "double", "FLOAT": "float",
    "VARCHAR": "string", "BOOLEAN": "boolean", "TIMESTAMP": "timestamp_ntz",
    "DATE": "date", "BLOB": "binary",
}


def _duck_canon(t: str) -> str:
    t = t.upper().strip()
    if t.endswith("[]"):
        return "array<" + _duck_canon(t[:-2]) + ">"
    if t.startswith("DECIMAL"):
        return t.lower()
    return _DUCK2SPARK.get(t, t.lower())


def compare(spark_df, sql: str, sf_dir: str) -> None:
    """Assert the Spark result and the DuckDB oracle agree — columns,
    TYPES (int widths included), and order-insensitive values."""
    spark_rows = [tuple(r) for r in spark_df.collect()]
    spark_cols = list(spark_df.columns)
    spark_types = {f.name: f.dataType.simpleString() for f in spark_df.schema.fields}

    con = duckdb_connection(sf_dir)
    try:
        cur = con.execute(sql)
        oracle_cols = [d[0] for d in cur.description]
        oracle_rows = cur.fetchall()
        oracle_types = {
            r[0]: _duck_canon(r[1]) for r in con.execute(f"DESCRIBE {sql}").fetchall()
        }
    finally:
        con.close()

    assert sorted(spark_cols) == sorted(oracle_cols), (
        f"column mismatch: spark={sorted(spark_cols)} oracle={sorted(oracle_cols)}"
    )
    type_diffs = {
        c: (spark_types.get(c), oracle_types.get(c))
        for c in spark_cols
        if spark_types.get(c) != oracle_types.get(c)
    }
    assert not type_diffs, f"type mismatch (spark, oracle): {type_diffs}"
    assert len(spark_rows) == len(oracle_rows), (
        f"row count mismatch: spark={len(spark_rows)} oracle={len(oracle_rows)}"
    )

    s = _rows_canonical(spark_cols, spark_rows)
    o = _rows_canonical(oracle_cols, oracle_rows)
    if s != o:
        diffs = [(a, b) for a, b in zip(s, o) if a != b][:5]
        raise AssertionError(f"value mismatch; first diffs (spark, oracle): {diffs}")
