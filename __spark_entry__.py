"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)


def _registry() -> tuple[dict[str, Callable], dict[str, str]]:
    queries: dict[str, Callable] = {}
    oracle: dict[str, str] = {}
    module_names = [
        "openlogreplicator_spark.operators.relational",
        "openlogreplicator_spark.operators.relational2",
        "openlogreplicator_spark.operators.relational3",
        "openlogreplicator_spark.operators.cdc",
        "openlogreplicator_spark.operators.dedup",
        "openlogreplicator_spark.operators.text",
        "openlogreplicator_spark.operators.similarity",
        "openlogreplicator_spark.operators.extras",
        "openlogreplicator_spark.streaming.windows",
    ]
    import importlib

    for mod_name in module_names:
        try:
            mod = importlib.import_module(mod_name)
        except ImportError:
            continue
        queries.update(getattr(mod, "QUERIES", {}))
        oracle.update(getattr(mod, "ORACLE", {}))
    return queries, oracle


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 shape) on /root/testdata/sf0.001."""
    from openlogreplicator_spark.operators.relational import q1_pricing_summary
    from openlogreplicator_spark.session import tune_for_session

    tune_for_session(spark)
    return q1_pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    q, _ = _registry()

    def _wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            from openlogreplicator_spark.session import tune_for_session

            tune_for_session(spark)
            return fn(spark, sf_dir)

        run.__name__ = getattr(fn, "__name__", "query")
        run.__doc__ = fn.__doc__
        return run

    return {name: _wrap(fn) for name, fn in q.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query (omitted ⇒ rows-only check)."""
    _, o = _registry()
    return o
