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
_PRIORITY = [  # round-9 window (previous windows: git history of this list)
    # -- 5 green canaries, one per result-type family (drift detection)
    "q1_pricing_summary",
    "cdc_txn_assembly",
    "dedup_minhash_lsh",
    "agg_rollup",
    "stream_tumbling_window",
    # -- BYTES CHANGED since its last verdict: the TSTZ region-form
    #    decode (timeZoneMap + "TZ?" fallback, Builder.cpp:304-339)
    #    landed after the r8 driver run and changed the typed-images
    #    fixture to v5 (offset/region/unknown cycling) — re-window.
    "cdc_typed_images_binary",
    # -- STALE-VERDICT ROTATION (r8 VERDICT #3): ALL 21 remaining
    #    r5-latest queries; after this round no verdict predates r6.
    "cdc_gap_detect",
    "cdc_last_image",
    "cdc_net_changes",
    "cdc_partition_routing",
    "cdc_sessionize",
    "cdc_txn_stats",
    "cdc_type_tail",
    "corpus_stats_report",
    "decontaminate_ngram",
    "dedup_cross_source",
    "dedup_semantic",
    "embedding_moments",
    "embedding_normalize",
    "embedding_stats",
    "event_anomaly_mad",
    "event_funnel",
    "pack_training_sequences",
    "sample_dsir_weights",
    "sample_training_mix",
    "text_bigram_perplexity",
    "text_quality_score",
    # -- oldest r6-latest block: 23 of 37 (CDC/dedup/multimodal/text
    #    first; the 14 relational/simple-text stragglers rotate r10)
    "cdc_adaptive_schema",
    "cdc_apply_changes",
    "cdc_ddl_classify",
    "cdc_heartbeat",
    "cdc_metrics",
    "cdc_resume_filter",
    "cdc_scd2_history",
    "cdc_schemaless_decode",
    "cdc_txn_envelope",
    "cdc_xmltype_decode",
    "dedup_embedding_cosine",
    "dedup_exact",
    "dedup_simhash",
    "dedup_substring",
    "embedding_pca",
    "event_retention",
    "event_transitions",
    "multimodal_decode",
    "multimodal_features_ann",
    "multimodal_image_stats",
    "text_lang_id",
    "text_pii_scrub",
    "tokenizer_bpe_train",
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
