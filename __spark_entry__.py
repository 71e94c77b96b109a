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
_PRIORITY = [  # round-8 window (previous windows: git history of this list)
    # -- 5 green canaries, one per result-type family (drift detection)
    "q1_pricing_summary",
    "cdc_txn_assembly",
    "dedup_minhash_lsh",
    "agg_rollup",
    "stream_tumbling_window",
    # -- NEW/CHANGED this round (r7 VERDICT #2/#7): the T6 split is now
    #    byte-true (greedy rendered-byte packing, Builder.h:167 /
    #    Transaction.cpp:519-538) in BOTH builders; the protobuf FULL
    #    envelope + split is a new byte-exact wire-oracle query, and
    #    cdc_txn_split re-verifies the count-capped path post-refactor.
    "cdc_protobuf_builder_full",
    "cdc_txn_split",
    "cdc_json_builder_debezium",  # bytes changed r8: preset xid is now
    #   XID_FORMAT::TEXT_REVERSED (OpenLogReplicator.cpp:707 parity);
    #   cdc_gap_detect gave up its slot (rotates r9)
    # -- STALE-VERDICT ROTATION (r7 VERDICT #1): the 23 queries whose
    #    latest driver verdict is r4, then 20 of the 41 r5-latest (the
    #    cdc parse-plane set, dedup_cluster_cc/ngram, TPC-H stragglers,
    #    tokenizer_bpe_pairs). The remaining 20 r5-latest rotate in r9;
    #    after r9 no verdict predates r6.
    "agg_approx_quantile",
    "agg_histogram",
    "cdc_asof_snapshot",
    "dedup_canonical_pick",
    "dedup_incremental",
    "embedding_quantize",
    "multimodal_decode_table",
    "q6_forecast_revenue",
    "q8_market_share",
    "q9_product_profit",
    "sample_group_cap",
    "sample_temperature_mix",
    "split_train_eval",
    "stream_session_window",
    "stream_sliding_window",
    "text_chunk_split",
    "text_commonness",
    "text_dedup_passages",
    "text_entropy_filter",
    "text_fingerprint",
    "text_tfidf_topterms",
    "text_token_count",
    "window_range_interval",
    # r5-latest block
    "cdc_txn_assembly_binary",
    "cdc_kdo_positional_binary",
    "cdc_typed_images_binary",
    "cdc_before_image",
    "cdc_clob_charset",
    "cdc_lob_reassembly",
    "cdc_schema_asof_resolve",
    "cdc_condition_filter",
    "cdc_unchanged_suppression",
    "dedup_cluster_cc",
    "dedup_ngram_jaccard",
    "q2_min_cost_supplier",
    "q11_important_stock",
    "q13_order_count_distribution",
    "q15_top_supplier",
    "q16_parts_supplier_relationship",
    "q20_potential_part_promotion",
    "q21_suppliers_kept_waiting",
    "tokenizer_bpe_pairs",
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
