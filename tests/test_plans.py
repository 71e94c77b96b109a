"""Physical-plan assertions: the plans must stay scale-shaped.

These lock in the properties that matter at 100 TB — filter/column
pushdown into the parquet scan, broadcast joins for dims, partial
aggregation before exchanges, TakeOrderedAndProject for top-k, no
cartesian products — so a regression that silently de-optimizes a query
fails CI, not the cluster."""

from __future__ import annotations

import pytest

from openlogreplicator_spark.operators import relational, relational2


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _formatted(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_q1_pushdown_and_partial_agg(spark, sf_dir):
    df = relational.q1_pricing_summary(spark, sf_dir)
    plan = _formatted(df)
    # filter reaches the parquet scan
    assert "PushedFilters" in plan and "l_shipdate" in plan.split("PushedFilters")[1][:200]
    # column pruning: o_* columns never read, only the 7 needed l_* columns
    read_schema = plan.split("ReadSchema")[1][:400]
    assert "l_comment" not in read_schema
    assert "l_returnflag" in read_schema
    # partial + final aggregation around the exchange
    assert plan.count("HashAggregate") >= 2


def test_broadcast_join_for_dims(spark, sf_dir):
    plan = _plan(relational.join_broadcast_dim(spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_q5_no_shuffle_on_dims(spark, sf_dir):
    plan = _plan(relational.q5_local_supplier(spark, sf_dir))
    # all five dim joins broadcast; only the fact join may sort-merge
    assert plan.count("BroadcastHashJoin") >= 4
    assert "CartesianProduct" not in plan


def test_topk_uses_take_ordered(spark, sf_dir):
    plan = _plan(relational.topk_orders(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan


def test_semi_anti_join_operators(spark, sf_dir):
    semi = _plan(relational.join_left_semi(spark, sf_dir))
    anti = _plan(relational.join_left_anti(spark, sf_dir))
    assert "LeftSemi" in semi
    assert "LeftAnti" in anti


def test_range_join_is_equi_not_nested_loop(spark, sf_dir):
    """The bucketized range join must plan as an equi join — a nested-loop
    (BroadcastNestedLoopJoin/Cartesian) would be O(n·m) at scale."""
    plan = _plan(relational.join_range_window(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_scalar_queries_are_wholestage_codegen(spark, sf_dir):
    plan = _plan(relational.scalar_string_funcs(spark, sf_dir))
    # '*(n)' marks a WholeStageCodegen stage in the plan string
    assert "*(1)" in plan
    assert "BatchEvalPython" not in plan  # no Python in the scalar path


def test_window_query_single_exchange(spark, sf_dir):
    plan = _plan(relational.window_running_sum(spark, sf_dir))
    # one shuffle for the user_id partition; no extra exchanges
    assert plan.count("Exchange") == 1


def test_q17_window_beats_self_join(spark, sf_dir):
    plan = _plan(relational2.q17_small_quantity_revenue(spark, sf_dir))
    # windowed correlated-avg: lineitem is scanned ONCE
    assert plan.count("FileScan parquet") == 1


def test_dedup_exact_partial_aggregates(spark, sf_dir):
    from openlogreplicator_spark.operators import dedup

    plan = _plan(dedup.dedup_exact(spark, sf_dir))
    assert plan.count("HashAggregate") >= 2  # map-side combine on the digest


def test_embedding_dedup_is_bucketed_not_cross_join(spark, sf_dir):
    """Round-1 scale killer: dedup_embedding_cosine collected the corpus
    to the driver. The replacement must plan as a (table, bucket) equi
    join — no cartesian/nested-loop pair generation, no driver collect."""
    from openlogreplicator_spark.operators import similarity

    df = similarity.dedup_embedding_cosine(spark, sf_dir)
    plan = _plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # the candidate join keys on (table, bucket)
    assert "table" in plan and "bucket" in plan


def test_ngram_jaccard_caps_shingle_df(spark, sf_dir):
    """The document-frequency cap must gate the candidate self-join
    (round-2 fix; round-4: a window count over the shingle-partitioned
    frame instead of an aggregate + anti-join second pass; round-12: a
    no-sort hot-shingle anti-join variant measured parity-to-worse at
    the 10x probe — bigger cache — and was reverted to this shape)."""
    from openlogreplicator_spark.operators import dedup

    plan = _plan(dedup.dedup_ngram_jaccard(spark, sf_dir))
    assert "_df" in plan and "count(1) windowspecdefinition(shingle" in plan


def test_lob_chain_walk_is_bucketed(spark, sf_dir):
    """The LOB index-chain walk must shuffle ONCE on the hash bucket
    (one Python invocation per bucket, thousands of LOBs each) — not per
    LOB, and with no iterative join rounds in the plan."""
    from openlogreplicator_spark.operators import extras

    plan = _plan(extras.cdc_lob_reassembly(spark, sf_dir))
    assert "_bucket" in plan  # bucketed applyInPandas, not per-key
    assert "CartesianProduct" not in plan


def test_text_repetition_is_shuffle_free(spark, sf_dir):
    """Repetition signals fold inside array lambdas — a map-only scan.
    Any Exchange here would be an accidental explode/groupBy."""
    from openlogreplicator_spark.operators import text

    plan = _plan(text.text_repetition_filter(spark, sf_dir))
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan


def test_pii_scrub_is_codegen_scan(spark, sf_dir):
    from openlogreplicator_spark.operators import text

    plan = _plan(text.text_pii_scrub(spark, sf_dir))
    assert "Exchange" not in plan  # regex redaction is map-only
    assert "BatchEvalPython" not in plan


def test_ddl_classify_single_shuffle(spark, sf_dir):
    """Reassembly is one xid shuffle; classification is pure projection
    on top (no second exchange, no Python)."""
    from openlogreplicator_spark.operators import cdc

    plan = _plan(cdc.cdc_ddl_classify(spark, sf_dir))
    assert plan.count("Exchange") <= 2  # partial-agg pair around one shuffle
    assert "BatchEvalPython" not in plan


def test_engine_dictionary_join_broadcasts(spark):
    """F1 selection resolves owner/table via a broadcast join — the
    dictionary is catalog-scale and must never shuffle the event
    stream."""
    from openlogreplicator_spark.config import EngineConfig
    from openlogreplicator_spark.operators.transaction_assembly import (
        ASSEMBLED_SCHEMA,
    )
    from openlogreplicator_spark.streaming.engine import to_change_events

    assembled = spark.createDataFrame([], ASSEMBLED_SCHEMA)
    dict_obj = spark.createDataFrame(
        [(1, "APP", "T1")], "obj long, owner string, name string"
    )
    plan = _plan(to_change_events(assembled, EngineConfig(), dict_obj))
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan
    assert "SortMergeJoin" not in plan


def test_no_driver_collect_in_operators():
    """No operator may collect a data-scale frame to the driver. The only
    sanctioned collects: catalog-scale dictionaries (typed_decode) and
    scalar aggregates (sinks watermark)."""
    import pathlib
    import re

    root = pathlib.Path(__file__).resolve().parents[1] / "openlogreplicator_spark"
    offenders = []
    for p in root.rglob("*.py"):
        src = p.read_text()
        if "testing" in str(p):
            continue  # the compare harness mirrors the driver's toPandas
        for m in re.finditer(r"\.toPandas\(\)", src):
            offenders.append(f"{p.name}: toPandas")
    assert offenders == [], offenders

def test_decontaminate_single_explode_no_join(spark, sf_dir):
    """Contamination scan: ONE gram explode + ONE distinct, eval
    membership via a gram-window flag — no join at all (the previous
    train/eval branches each re-ran the explode), no cartesian shapes,
    no Python in the plan."""
    from openlogreplicator_spark.operators import dedup

    plan = _plan(dedup.decontaminate_ngram(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Join" not in plan
    assert plan.count("Generate") == 1  # the single shingle explode
    assert "count(1) windowspecdefinition(gram" in plan or "_ev" in plan
    assert "BatchEvalPython" not in plan


def test_q6_is_pushdown_scan(spark, sf_dir):
    """Q6 is the canonical scan-bound query: every predicate must reach
    the parquet scan and only the four needed columns may be read."""
    from openlogreplicator_spark.operators import relational4

    plan = _formatted(relational4.q6_forecast_revenue(spark, sf_dir))
    assert "PushedFilters" in plan
    pushed = plan.split("PushedFilters")[1][:300]
    assert "l_shipdate" in pushed and "l_quantity" in pushed
    read_schema = plan.split("ReadSchema")[1][:300]
    assert "l_returnflag" not in read_schema
    assert "l_extendedprice" in read_schema


def test_q8_dims_all_broadcast(spark, sf_dir):
    """Q8 joins five dimensions — every one must broadcast; the only
    shuffle join allowed is lineitem⋈orders."""
    from openlogreplicator_spark.operators import relational4

    plan = _plan(relational4.q8_market_share(spark, sf_dir))
    assert plan.count("BroadcastHashJoin") >= 5
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_q13_outer_join_then_double_agg(spark, sf_dir):
    from openlogreplicator_spark.operators import relational4

    plan = _plan(relational4.q13_order_count_distribution(spark, sf_dir))
    assert "LeftOuter" in plan
    # two aggregations (per-customer, then distribution), each partial+final
    assert plan.count("HashAggregate") >= 4
    assert "CartesianProduct" not in plan


def test_text_filter_pipeline_is_map_only(spark, sf_dir):
    """The composite corpus gate evaluates every signal in one projection
    — any Exchange means a signal regressed into a separate pass."""
    from openlogreplicator_spark.operators import text

    plan = _plan(text.text_filter_pipeline(spark, sf_dir))
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan


def test_cc_rounds_are_equi_joins(spark):
    """One large-star+small-star round must plan as equi joins on the
    node id — no cartesian/nested-loop neighborhood expansion."""
    from openlogreplicator_spark.operators.clustering import (
        _canon_edges,
        _large_star,
        _small_star,
    )

    e = spark.createDataFrame([(1, 2), (2, 3), (4, 3)], "src: long, dst: long")
    plan = _plan(_canon_edges(_small_star(_large_star(e))))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BatchEvalPython" not in plan


def test_vocab_topk_take_ordered(spark, sf_dir):
    """Top-k vocabulary must cut with TakeOrderedAndProject (per-partition
    heaps), not a global sort of the vocabulary."""
    from openlogreplicator_spark.operators import text

    plan = _plan(text.text_vocab_topk(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan
    assert "BatchEvalPython" not in plan

def test_chunk_split_is_map_only(spark, sf_dir):
    """Chunking must be explode-over-scan with ZERO exchanges — chunk
    boundaries never cross documents, so any shuffle is waste."""
    from openlogreplicator_spark.operators import text

    plan = _plan(text.text_chunk_split(spark, sf_dir))
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan


def test_embedding_quantize_is_map_only(spark, sf_dir):
    """Quantization is per-vector arithmetic: no shuffle, no Python."""
    from openlogreplicator_spark.operators import similarity

    plan = _plan(similarity.embedding_quantize(spark, sf_dir))
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan


def test_dedup_passages_no_cartesian(spark, sf_dir):
    """Passage scan: distinct before the passage-keyed equi-join; never
    a cartesian/nested-loop pair generation."""
    from openlogreplicator_spark.operators import text

    plan = _plan(text.text_dedup_passages(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BatchEvalPython" not in plan


def test_bigram_perplexity_model_joins_broadcast(spark, sf_dir):
    """LM model and context tables are alphabet²-bounded: both joins must
    broadcast — a sort-merge join here would shuffle the full bigram
    stream twice at data scale."""
    from openlogreplicator_spark.operators import text

    plan = _plan(text.text_bigram_perplexity(spark, sf_dir))
    assert plan.count("BroadcastHashJoin") >= 2
    assert "SortMergeJoin" not in plan
    assert "BatchEvalPython" not in plan


def test_dsir_model_join_broadcasts(spark, sf_dir):
    """DSIR vocab model joins broadcast; the scalar totals enter as a
    1-row broadcast, never a driver collect."""
    from openlogreplicator_spark.operators import text

    plan = _plan(text.sample_dsir_weights(spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "BatchEvalPython" not in plan


def test_semantic_dedup_pair_scan_is_equi_join(spark, sf_dir):
    """SemDeDup's pair scan joins on cluster id — bounded by the largest
    cluster. The only nested-loop allowed is the K-row anchor broadcast;
    the vec×vec side must never be a cartesian pair generation."""
    from openlogreplicator_spark.operators import similarity

    plan = _plan(similarity.dedup_semantic(spark, sf_dir))
    assert "CartesianProduct" not in plan
    # the anchor-assignment subtree (the only nested loop, against K
    # rows) is persisted and must be SERVED from cache to its three
    # consumers, not recomputed per subtree
    assert plan.count("InMemoryTableScan") >= 3
    assert "BatchEvalPython" not in plan


def test_pretraining_pipeline_two_shuffles(spark, sf_dir):
    """The composed gate→dedup→sample→account pipeline must stay one
    scan + two data-scale exchanges (digest window, final agg): a third
    exchange means a stage stopped fusing."""
    from openlogreplicator_spark.operators import pipeline

    plan = _plan(pipeline.pipeline_pretraining_corpus(spark, sf_dir))
    assert "BatchEvalPython" not in plan
    n_exchanges = plan.count("Exchange hashpartitioning")
    assert n_exchanges <= 2, f"expected <=2 shuffles, plan has {n_exchanges}"


def test_binary_assembly_single_parse_single_exchange(spark, sf_dir):
    """The assembly is ONE exchange with ONE consumer: the round-3
    design re-executed the binary parse plane once per exchange consumer
    (Catalyst pushes per-consumer pruning below the repartition, so
    ReuseExchange never fires). Lock the invariant structurally: exactly
    one parse kernel and one shuffle in the whole binary pipeline."""
    from openlogreplicator_spark.operators.cdc import cdc_txn_assembly_binary

    plan = cdc_txn_assembly_binary(
        spark, sf_dir
    )._jdf.queryExecution().executedPlan().toString()
    # r13: the parse kernel moved from mapInPandas to mapInArrow
    # (flat-offset walk, Arrow-native output) — the pipeline is now two
    # MapInArrow nodes (parse, assembly) around the single xid exchange,
    # with zero pandas conversions anywhere.
    assert plan.count("MapInPandas") == 0, plan[:2000]
    assert plan.count("MapInArrow") == 2, plan[:2000]
    assert plan.count("Exchange") == 1, plan[:2000]


def test_q2_min_cost_all_dims_broadcast(spark, sf_dir):
    """q2's synthesized supply relation and every dimension join must be
    broadcast; the only hash exchange is the per-part window min."""
    from openlogreplicator_spark.operators import relational5

    plan = _plan(relational5.q2_min_cost_supplier(spark, sf_dir))
    assert plan.count("BroadcastHashJoin") >= 3
    assert "SortMergeJoin" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert plan.count("Exchange hashpartitioning") <= 1


def test_q21_no_nested_loop_single_lineitem_family(spark, sf_dir):
    """q21's EXISTS/NOT-EXISTS collapse to one order-grouped aggregation
    joined back to the late lines — no nested-loop or cartesian join
    may appear, and supplier/nation ride broadcasts."""
    from openlogreplicator_spark.operators import relational5

    plan = _plan(relational5.q21_suppliers_kept_waiting(spark, sf_dir))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastHashJoin") >= 3


def test_embedding_moments_single_global_agg(spark, sf_dir):
    """The moment query is one scan + one map-side-combined global
    aggregate: partial/final HashAggregate around a single-partition
    exchange, no hash exchanges, no Python in the plan."""
    from openlogreplicator_spark.operators import linalg

    plan = _plan(linalg.embedding_moments(spark, sf_dir))
    assert "Exchange hashpartitioning" not in plan
    assert plan.count("HashAggregate") >= 2 or "SortAggregate" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_bpe_pairs_two_aggs_no_cartesian(spark, sf_dir):
    """The round-0 BPE statistics are one corpus explode + two keyed
    aggregations and a top-k sort — no joins at all may appear."""
    from openlogreplicator_spark.operators import tokenizer

    plan = _plan(tokenizer.tokenizer_bpe_pairs(spark, sf_dir))
    assert "Join" not in plan
    assert "CartesianProduct" not in plan
    assert "TakeOrderedAndProject" in plan  # top-k, not a global sort
    assert plan.count("HashAggregate") >= 4  # partial+final × 2 aggs


def test_pq_adc_scan_is_map_side_no_pair_shuffle(spark, sf_dir):
    """The r6 plan shuffled |corpus|x|queries| pairs with
    groupBy("query_id").applyInPandas — a hot-partition OOM at scale.
    The ADC scan must be a pure map over the encoded corpus
    (mapInArrow with broadcast distance tables): no grouped-pandas
    node anywhere, no join/exchange BELOW the MapInArrow node, and
    the only query_id exchanges sit ABOVE it (shortlist-scale
    top-k windows)."""
    from pyspark.sql import functions as F

    from openlogreplicator_spark.operators import similarity
    from openlogreplicator_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    qs = emb.filter(F.col("vec_id") % similarity._QUERY_MOD == 0)
    # full pipeline: the old corpus-scale pair-shuffle shape is banned
    plan = _plan(similarity.ann_pq_topk(emb, qs))
    assert "FlatMapGroupsInPandas" not in plan
    assert "CartesianProduct" not in plan
    assert "MapInArrow" in plan
    # the shortlist stage in isolation (single-trunk plan, so every
    # line printed after MapInArrow IS its subtree): pairs are scored
    # where the corpus partitions live — no exchange, no join between
    # the parquet scan and the ADC map stage; the only query_id
    # exchange feeds the top-k window ABOVE it, over per-partition
    # shortlists
    books = similarity.pq_fit(emb)
    short = _plan(similarity._pq_adc_shortlist(emb, qs, books, 5))
    assert "MapInArrow" in short
    below = short.split("MapInArrow", 1)[1]
    assert "Exchange" not in below, "exchange below the ADC map stage"
    assert "Join" not in below, "join below the ADC map stage"
    above = short.split("MapInArrow", 1)[0]
    assert above.count("Exchange hashpartitioning(query_id") <= 1


def test_plan_fingerprint_is_stable_for_lambda_plans(spark, sf_dir):
    """The noise detector's plan fingerprint must be deterministic or it
    silently stops flagging machine noise. Spark's lambda-variable
    namer (`lambda x_7#`) is a session-global counter — two builds of
    the same higher-order-function query get different variable names,
    which the r6 canonicalizer missed (every zip_with/aggregate plan
    churned per run). Pin: same query built twice → same fingerprint,
    and a genuinely different plan → different fingerprint."""
    from pyspark.sql import functions as F

    from bench import plan_fingerprint
    from openlogreplicator_spark.operators import similarity
    from openlogreplicator_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    qs = emb.filter(F.col("vec_id") % similarity._QUERY_MOD == 0)
    a = plan_fingerprint(similarity.cosine_topk(emb, qs))
    b = plan_fingerprint(similarity.cosine_topk(emb, qs))
    assert a == b, "lambda-counter churn is back in the fingerprint"
    c = plan_fingerprint(similarity.cosine_topk(emb, qs, k=3))
    assert c != a, "fingerprint blind to a real plan change"


def test_protobuf_full_envelope_single_exchange_map_side_encode(spark):
    """The protobuf FULL path (r8) must encode each op MAP-SIDE (the
    ArrowEvalPython for enc_op sits below the xid exchange, so only
    already-encoded bytes shuffle) and group with exactly ONE exchange —
    the same single-shuffle budget as the JSON FULL envelope; the
    greedy byte packer itself is a Catalyst fold, adding no exchange."""
    import datetime

    from openlogreplicator_spark.builders.protobuf_builder import (
        build_protobuf_events,
    )
    from openlogreplicator_spark.config import Format, MessageFormat
    from openlogreplicator_spark.event_model import CHANGE_EVENT_SCHEMA

    ts = datetime.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [(1, 1, 0, ts, 1, "1.1.1", "DB", "c", "U", "T", 5, "r", None,
          {"A": "x"}, {}, 0, 1)],
        CHANGE_EVENT_SCHEMA,
    )
    out = build_protobuf_events(
        df, fmt=Format(message=MessageFormat.FULL), max_message_bytes=100
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan
    # op encoding below the exchange: the Python eval node must appear
    # AFTER (deeper than) the exchange in the single-trunk plan text
    below = plan.split("Exchange", 1)[1]
    assert "ArrowEvalPython" in below or "BatchEvalPython" in below, plan
    assert "CartesianProduct" not in plan
