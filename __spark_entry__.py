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
_PRIORITY = [  # round-12 window (previous windows: git history of this list)
    # -- 5 green canaries, one per result-type family (drift detection)
    "q1_pricing_summary",
    "cdc_txn_assembly",
    "dedup_minhash_lsh",
    "agg_rollup",
    "stream_tumbling_window",
    # -- BYTES CHANGED since the r11 verdict: the IGNORE_DATA_ERRORS
    #    fixture moved to scn-targeted damage (o_orderkey % 10 = 3,
    #    damage_records_by_scn) with the oracle deriving the damaged
    #    count from the same predicate (r12 ADVICE)
    "cdc_ignore_data_errors",
    # -- KERNEL-CHANGED re-verifies (the r11 parse-restructure
    #    convention): review passes 6/9 rewrote the date-mask year
    #    gating, the BC epoch/flip/ISO path, the binary float/double
    #    decode edges and the TSLTZ/DATE format threading; these two
    #    drive every typed kernel through the binary plane and must
    #    stay byte-identical. cdc_metrics re-verifies the falsifiable
    #    checkpoint_lag restructure (pass 8).
    "cdc_typed_images_binary",
    "cdc_type_tail",
    "cdc_metrics",
    # -- STALE-VERDICT ROTATION (r11 VERDICT #1): all 18 remaining
    #    r8-latest queries; after this round no verdict predates r9.
    "agg_approx_quantile",
    "agg_histogram",
    "q2_min_cost_supplier",
    "q6_forecast_revenue",
    "q8_market_share",
    "q9_product_profit",
    "q11_important_stock",
    "q13_order_count_distribution",
    "q15_top_supplier",
    "q16_parts_supplier_relationship",
    "q20_potential_part_promotion",
    "text_chunk_split",
    "text_commonness",
    "text_dedup_passages",
    "text_entropy_filter",
    "text_tfidf_topterms",
    "text_token_count",
    "window_range_interval",
    # -- oldest r9-latest block: 23 of 42, CDC consumers and embeddings
    #    first per the r11 verdict (the 19 remaining — events,
    #    multimodal, sampling, text scoring, tokenizer_bpe_train,
    #    embedding_moments/normalize/stats — rotate r13, finishing the
    #    backlog; three embedding re-verifies ceded their slots to the
    #    kernel-changed re-verifies above, embedding_pca stays as the
    #    family representative)
    "cdc_adaptive_schema",
    "cdc_apply_changes",
    "cdc_ddl_classify",
    "cdc_gap_detect",
    "cdc_heartbeat",
    "cdc_last_image",
    "cdc_net_changes",
    "cdc_partition_routing",
    "cdc_resume_filter",
    "cdc_scd2_history",
    "cdc_schemaless_decode",
    "cdc_sessionize",
    "cdc_txn_envelope",
    "cdc_txn_stats",
    "cdc_xmltype_decode",
    "embedding_pca",
    "dedup_cross_source",
    "dedup_embedding_cosine",
    "dedup_exact",
    "dedup_semantic",
    "dedup_simhash",
    "dedup_substring",
    "decontaminate_ngram",
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
