"""DuckDB-oracle comparison harness (mirrors the driver's t2 check).

The driver runs each ``queries()`` entry on Spark and the matching
``oracle_sql()`` on DuckDB over the same parquet tables, then compares
row-count + schema + order-insensitive value hash. This module reproduces
that check locally so every query is validated before it ships.
"""

from __future__ import annotations

import math
import os
from decimal import Decimal
from typing import Any

import duckdb
from pyspark.sql import DataFrame, SparkSession

from openlogreplicator_spark.sources.tables import TABLES


def duck_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def _norm_value(v: Any) -> Any:
    if isinstance(v, Decimal):
        return str(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        # strip -0.0 vs 0.0 and tiny representation noise
        return repr(round(v, 9))
    if isinstance(v, (list, tuple)):
        return tuple(_norm_value(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _norm_value(x)) for k, x in v.items()))
    return v


def _rows_to_multiset(cols: list[str], rows: list[tuple]) -> list[tuple]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm_value(r[i]) for i in order) for r in rows]
    return sorted(out, key=repr)


def compare_to_oracle(
    spark: SparkSession,
    df: DataFrame,
    sql: str,
    sf_dir: str,
    name: str = "query",
) -> None:
    """Assert the Spark DataFrame and the DuckDB oracle SQL agree."""
    spark_rows = [tuple(r) for r in df.collect()]
    spark_cols = list(df.columns)

    con = duck_connect(sf_dir)
    try:
        res = con.execute(sql)
        duck_cols = [d[0] for d in res.description]
        duck_rows = res.fetchall()
    finally:
        con.close()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column mismatch spark={sorted(spark_cols)} duck={sorted(duck_cols)}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count mismatch spark={len(spark_rows)} duck={len(duck_rows)}"
    )
    a = _rows_to_multiset(spark_cols, spark_rows)
    b = _rows_to_multiset(duck_cols, duck_rows)
    if a != b:
        diffs = [(x, y) for x, y in zip(a, b) if x != y][:5]
        raise AssertionError(f"{name}: value mismatch, first diffs: {diffs}")
