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
_PRIORITY = [  # round-10 window (previous windows: git history of this list)
    # -- 5 green canaries, one per result-type family (drift detection)
    "q1_pricing_summary",
    "cdc_txn_assembly",
    "dedup_minhash_lsh",
    "agg_rollup",
    "stream_tumbling_window",
    # -- BYTES CHANGED since the r9 verdict: the typed-images fixture
    #    moved to v7 — corrupt byte images (month 99, hour byte 0,
    #    mantissa >99, truncated TSTZ, …) on every k%11==0 order now
    #    exercise the columnUnknown guards end-to-end (r9 VERDICT #1);
    #    cdc_type_tail re-windowed with it per the same prescription.
    "cdc_typed_images_binary",
    "cdc_type_tail",
    #    q21 rewritten late in r10 (single distinct layer — the
    #    double-countDistinct plan fingerprint flapped): re-window
    "q21_suppliers_kept_waiting",
    # -- STALE-VERDICT ROTATION (r9 VERDICT #2): all 14 remaining
    #    r6-latest queries; after this round no verdict predates r7.
    "agg_approx_distinct",
    "agg_stats",
    "join_broadcast_dim",
    "join_left_semi",
    "join_skew_salted",
    "proj_filter_rlike",
    "q10_returned_items",
    "q12_late_lines_by_flag",
    "q18_large_orders",
    "q7_volume_shipping",
    "subquery_in",
    "text_filter_pipeline",
    "text_repetition_filter",
    "text_vocab_topk",
    # -- oldest r7-latest block: 29 of 44 (novel operators first; the
    #    15 scalar/setop/subquery stragglers rotate r11)
    "ann_cosine_topk",
    "ann_ivf",
    "ann_lsh_bucketed",
    "ann_pq",
    "cdc_config_reference",
    "cdc_json_builder",
    "cdc_protobuf_builder",
    "pipeline_pretraining_corpus",
    "stream_dedup_replay",
    "join_asof_attribution",
    "join_range_window",
    "join_shuffle_facts",
    "join_left_anti",
    "agg_cube",
    "agg_grouping_sets",
    "agg_percentiles",
    "agg_statistical",
    "window_distribution",
    "window_lag_lead",
    "window_rank_topn",
    "window_running_sum",
    "q3_shipping_priority",
    "q4_order_priority",
    "q5_local_supplier",
    "q14_promo_share",
    "q17_small_quantity_revenue",
    "q19_disjunctive_predicates",
    "q22_global_sales_opportunity",
    # (topk_orders yields its slot to the q21 re-window; it joins the
    # 15 r7-latest stragglers rotating in r11)
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
