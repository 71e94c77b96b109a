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
_PRIORITY = [  # round-4 window — see rotation note above the old list below
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

_PRIORITY_R3 = [  # retained for the rotation audit trail
    # CDC core (the engine's reason to exist)
    "cdc_txn_assembly",
    "cdc_txn_assembly_binary",
    "cdc_sessionize",
    "cdc_txn_envelope",
    "cdc_condition_filter",
    "cdc_unchanged_suppression",
    "cdc_resume_filter",
    "cdc_schema_asof_resolve",
    "cdc_ddl_classify",
    "cdc_metrics",
    # LLM-pipeline: dedup
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_embedding_cosine",
    "dedup_cluster_cc",
    "decontaminate_ngram",
    # text analysis
    "text_quality_score",
    "text_lang_id",
    # text_token_count rotated out (map-only projection, two family-
    # mates stay in-window) for the KDO positional-framing query — the
    # riskiest novel semantics of this session (col#-addressed images,
    # nulls bitmap, dictionary resolve at parse time)
    "cdc_kdo_positional_binary",
    "cdc_schemaless_decode",
    # similarity / embeddings
    "ann_cosine_topk",
    # round-3 rotation #2: embedding_stats / embedding_normalize /
    # text_fingerprint (map-only projections, lowest-risk of the window)
    # move past slot 50; their slots go to this session's riskiest novel
    # semantics — undo-pairing through the exotic assembly route and the
    # two new schema-resolution modes — which a driver verdict proves in
    # a way a local rerun cannot. All three displaced queries stay
    # registered and locally oracle-checked.
    "cdc_before_image",
    "cdc_adaptive_schema",
    "cdc_lob_reassembly",
    # round-3 rotation: the 7 oracle-less queries (cdc_heartbeat,
    # ann_lsh_bucketed, cdc_json_builder, cdc_json_builder_debezium,
    # multimodal_decode, multimodal_features_ann, cdc_protobuf_builder)
    # moved past slot 50 — round 1 showed the driver records them as
    # `err: no_oracle`, burning a verification slot each. They remain
    # registered, rows-run locally (tests/test_queries_vs_duckdb.py) and
    # golden/recall-tested in their unit suites. Their slots go to
    # oracle-checked round-2 families that have never had a driver
    # verdict:
    "cdc_scd2_history",
    "cdc_apply_changes",
    "text_vocab_topk",
    "pack_training_sequences",
    "stream_dedup_replay",
    "join_skew_salted",
    "text_filter_pipeline",
    # streaming windows
    "stream_tumbling_window",
    # stream_sliding_window rotated out (same family as tumbling/session,
    # both still in-window) for the new exact-substring dedup operator
    "dedup_substring",
    # stream_session_window rotated out (driver-green in round 1; the
    # tumbling family-mate stays in-window) for the new OLRS1 v4
    # typed-images query — TSTZ/interval/boolean/UROWID byte kernels
    # end-to-end through the physical parse plane, oracle-checked
    "cdc_typed_images_binary",
    # round-1 reds, fixed in round 2 — must be re-verified
    "q1_pricing_summary",
    "q10_returned_items",
    "proj_filter_rlike",
    "join_broadcast_dim",
    "join_left_semi",
    "agg_stats",
    "agg_rollup",
    # agg_cube rotated out: its round-1 red was the same DECIMAL-width
    # representation issue as agg_rollup/agg_stats (same fix, same cast
    # pattern); the slot goes to the novel dedup_cluster_cc instead.
    # agg_cube stays registered + locally oracle-checked after slot 50.
    "subquery_in",
    "subquery_scalar_avg",
    "q18_large_orders",
    "q7_volume_shipping",
    "q12_late_lines_by_flag",
    "agg_approx_distinct",
    # new round-2 operator families (q3/topk/cdc_last_image re-verifies
    # rotated out: green in round 1, and the 14 round-1 reds above
    # already re-verify the same result-type cast patterns)
    "cdc_xmltype_decode",
    "sample_training_mix",
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
