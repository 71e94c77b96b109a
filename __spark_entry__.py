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
_PRIORITY = [  # round-13 window (previous windows: git history of this list)
    # -- 5 green canaries, one per result-type family (drift detection)
    "q1_pricing_summary",
    "cdc_txn_assembly",
    "dedup_minhash_lsh",
    "agg_rollup",
    "stream_tumbling_window",
    # -- KERNEL-CHANGED re-verifies: r13 vectorized the binary parse
    #    plane (sources/binary_redo.py — flat-offset walk, Arrow-native
    #    output, mapInPandas → mapInArrow). These six are every
    #    registered consumer of parse_redo_files (plus the damaged-
    #    fixture and counter surfaces) and must stay byte-identical.
    "cdc_typed_images_binary",
    "cdc_kdo_positional_binary",
    "cdc_txn_assembly_binary",
    "cdc_ignore_data_errors",
    "cdc_heartbeat",
    "cdc_metrics",
    # -- r12-RESTRUCTURED, driver-unverified (r12 VERDICT #1 / "What's
    #    wrong" #3): locally oracle-green only — the driver must close
    #    the loop on each of the eleven.
    "event_funnel",
    "event_retention",
    "q21_suppliers_kept_waiting",
    "text_lang_id",
    "text_bigram_perplexity",
    "ann_pq",
    "ann_lsh_bucketed",
    "ann_ivf",
    "dedup_cluster_cc",
    "dedup_canonical_pick",
    "sample_dsir_weights",
    # -- STALE-VERDICT ROTATION, finishing the r9 backlog (r11 VERDICT
    #    #1 named these 19; the five shared with the block above sit
    #    there): after this round no verdict predates r10.
    "corpus_stats_report",
    "embedding_moments",
    "embedding_normalize",
    "embedding_stats",
    "event_anomaly_mad",
    "event_transitions",
    "multimodal_decode",
    "multimodal_features_ann",
    "multimodal_image_stats",
    "pack_training_sequences",
    "sample_training_mix",
    "text_pii_scrub",
    "text_quality_score",
    "tokenizer_bpe_train",
    # -- oldest r10-latest block: 14 of 43, headline-bench queries and
    #    the historically-red agg_cube first; the rest rotate r14+.
    "ann_cosine_topk",
    "pipeline_pretraining_corpus",
    "join_shuffle_facts",
    "join_asof_attribution",
    "join_range_window",
    "window_running_sum",
    "q3_shipping_priority",
    "q5_local_supplier",
    "q10_returned_items",
    "stream_dedup_replay",
    "cdc_json_builder",
    "cdc_protobuf_builder",
    "agg_cube",
    "join_skew_salted",
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
