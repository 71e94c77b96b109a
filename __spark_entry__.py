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


# The driver verifies the FIRST 50 registry entries (round-1 lesson:
# insertion order put 47 relational variants ahead of every novel
# operator, which therefore shipped without a CORRECTNESS verdict).
# This list pins the verification window: all CDC/dedup/text/similarity/
# multimodal/streaming operators, then every query that was red in
# round 1 (now fixed), then a few representative re-verifies. Everything
# else registers after slot 50 — still runnable, checked locally by
# tests/test_queries_vs_duckdb.py.
_PRIORITY = [  # round-11 window (previous windows: git history of this list)
    # -- 5 green canaries, one per result-type family (drift detection)
    "q1_pricing_summary",
    "cdc_txn_assembly",
    "dedup_minhash_lsh",
    "agg_rollup",
    "stream_tumbling_window",
    # -- BYTES CHANGED since the r10 verdict: the OLRS1 record walk was
    #    restructured for IGNORE_DATA_ERRORS (per-record skip-and-
    #    continue, Parser.cpp:1468-1479) — every query that rides
    #    parse_redo_columns re-verifies (strict-mode results must be
    #    byte-identical to r10's).
    "cdc_txn_assembly_binary",
    "cdc_kdo_positional_binary",
    "cdc_typed_images_binary",
    "cdc_type_tail",
    "cdc_metrics",
    # -- NEW in r11: IGNORE_DATA_ERRORS skip-and-continue on a fixture
    #    with one destroyed record per redo file (r10 VERDICT #2)
    "cdc_ignore_data_errors",
    # -- STALE-VERDICT ROTATION (r10 VERDICT #3): all 16 remaining
    #    r7-latest queries; after this round no verdict predates r8.
    "array_explode_wordcount",
    "distinct_pairs",
    "higher_order_array_funcs",
    "map_funcs",
    "pivot_status_by_priority",
    "scalar_datetime_funcs",
    "scalar_json_funcs",
    "scalar_math_funcs",
    "scalar_null_handling",
    "scalar_string_funcs",
    "setop_except",
    "setop_intersect",
    "setop_union",
    "subquery_exists_correlated",
    "subquery_scalar_avg",
    "topk_orders",
    # -- oldest r8-latest block: 24 of 43, novel operators first (the
    #    19 remaining — 9 relational q*, 2 agg approx, 8 text/stream —
    #    rotate r12)
    "cdc_asof_snapshot",
    "cdc_before_image",
    "cdc_clob_charset",
    "cdc_condition_filter",
    "cdc_json_builder_debezium",
    "cdc_lob_reassembly",
    "cdc_protobuf_builder_full",
    "cdc_schema_asof_resolve",
    "cdc_txn_split",
    "cdc_unchanged_suppression",
    "dedup_canonical_pick",
    "dedup_cluster_cc",
    "dedup_incremental",
    "dedup_ngram_jaccard",
    "stream_session_window",
    "stream_sliding_window",
    "tokenizer_bpe_pairs",
    "multimodal_decode_table",
    "embedding_quantize",
    "sample_group_cap",
    "sample_temperature_mix",
    "split_train_eval",
    "text_fingerprint",
    # (window_range_interval yields its slot to cdc_ignore_data_errors;
    # it joins the r8-latest block rotating r12)
]


def _registry() -> tuple[dict[str, Callable], dict[str, str]]:
    queries: dict[str, Callable] = {}
    oracle: dict[str, str] = {}
    module_names = [
        "openlogreplicator_spark.operators.relational",
        "openlogreplicator_spark.operators.relational2",
        "openlogreplicator_spark.operators.relational3",
        "openlogreplicator_spark.operators.relational4",
        "openlogreplicator_spark.operators.relational5",
        "openlogreplicator_spark.operators.clustering",
        "openlogreplicator_spark.operators.cdc",
        "openlogreplicator_spark.operators.dedup",
        "openlogreplicator_spark.operators.text",
        "openlogreplicator_spark.operators.similarity",
        "openlogreplicator_spark.operators.extras",
        "openlogreplicator_spark.operators.history",
        "openlogreplicator_spark.operators.analytics",
        "openlogreplicator_spark.operators.lob_text",
        "openlogreplicator_spark.operators.linalg",
        "openlogreplicator_spark.operators.sampling",
        "openlogreplicator_spark.operators.tokenizer",
        "openlogreplicator_spark.operators.pipeline",
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

    ordered: dict[str, Callable] = {}
    for name in _PRIORITY:
        if name in queries:
            ordered[name] = queries[name]
    for name, fn in queries.items():
        if name not in ordered:
            ordered[name] = fn
    return ordered, oracle


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
