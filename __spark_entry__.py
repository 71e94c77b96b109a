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
_PRIORITY = [  # round-4 window (previous windows: git history of this list)
    # -- 5 green canaries, one per result-type family, to detect
    #    driver-side drift (per round-3 verdict guidance)
    "q1_pricing_summary",
    "cdc_txn_assembly",
    "dedup_minhash_lsh",
    "agg_rollup",
    "stream_tumbling_window",
    # -- re-verifies of changed code: the round-3 red (fval now DOUBLE
    #    on both sides, fixture v4c) and the two other binary parse-
    #    plane queries, whose image decode is being columnarized this
    #    round — a driver verdict proves the rework, a local rerun
    #    cannot (round 3 taught us that)
    "cdc_typed_images_binary",
    "cdc_txn_assembly_binary",
    "cdc_kdo_positional_binary",
    # -- the 42 oracled queries that have NEVER had a driver verdict
    #    (the other 10 never-verified are rows-only and would burn a
    #    slot each as err=no_oracle; they stay locally golden-tested).
    #    Flagship composition first:
    "pipeline_pretraining_corpus",
    # CDC never-verified
    "cdc_net_changes",
    "cdc_partition_routing",
    "cdc_txn_split",
    "cdc_clob_charset",
    "cdc_gap_detect",
    "cdc_asof_snapshot",
    "cdc_txn_stats",
    # event analytics
    "event_funnel",
    "event_retention",
    "event_transitions",
    # text round-2/3 family
    "text_bigram_perplexity",
    "text_chunk_split",
    "text_dedup_passages",
    "text_commonness",
    "text_token_count",
    "text_fingerprint",
    "text_pii_scrub",
    "text_repetition_filter",
    "text_tfidf_topterms",
    "text_entropy_filter",
    # sampling / mix construction
    "sample_dsir_weights",
    "sample_temperature_mix",
    "sample_group_cap",
    "split_train_eval",
    # dedup tail
    "dedup_semantic",
    "dedup_incremental",
    "dedup_canonical_pick",
    # embeddings / multimodal. embedding_stats / embedding_normalize
    # (map-only projections, the lowest-risk of this window) yield
    # their slots to the two NEW oracle-checked operators of this round:
    # the real-codec image decode (pixel-exact vs an arithmetic oracle)
    # and the type-system tail (LONG/LONG RAW unknown-type matrix +
    # EXPERIMENTAL_JSON raw-LOB passthrough). Both displaced queries
    # stay registered and locally oracle-checked.
    "embedding_quantize",
    "multimodal_image_stats",
    "cdc_type_tail",
    "multimodal_decode_table",
    # streaming windows (registered since r1, never hit the window)
    "stream_sliding_window",
    "stream_session_window",
    # relational tail
    "window_range_interval",
    "agg_histogram",
    "agg_approx_quantile",
    "q6_forecast_revenue",
    "q8_market_share",
    "q9_product_profit",
    # q13/q15 (plain SQL shapes, same cast patterns as the driver-green
    # TPC-H set) yield their slots to the two builder surfaces that
    # JUST gained byte-exact oracles — B1's JSON envelope and B2's
    # protobuf wire format reconstructed character-for-character by
    # DuckDB. Builder output is the engine's user-facing contract and
    # runs through a pandas UDF, exactly the class where a driver
    # verdict proves what a local rerun cannot. q13/q15 stay registered
    # and locally oracle-checked.
    "cdc_json_builder",
    "cdc_protobuf_builder",
]

def _registry() -> tuple[dict[str, Callable], dict[str, str]]:
    queries: dict[str, Callable] = {}
    oracle: dict[str, str] = {}
    module_names = [
        "openlogreplicator_spark.operators.relational",
        "openlogreplicator_spark.operators.relational2",
        "openlogreplicator_spark.operators.relational3",
        "openlogreplicator_spark.operators.relational4",
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
