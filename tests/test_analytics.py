"""Event-analytics consumers: semantics units + scale-shape plan guards."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from openlogreplicator_spark.operators import analytics


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _ts(s: str) -> datetime.datetime:
    return datetime.datetime.fromisoformat(s)


def test_net_changes_semantics(spark):
    # key 1: i..d  => none; key 2: i..u => i; key 3: u..d => d;
    # key 4: u..u => u; key 5: single i => i
    rows = [
        (1, "i", 1.0, _ts("2024-01-01T00:00:00"), 1),
        (1, "u", 2.0, _ts("2024-01-01T00:01:00"), 2),
        (1, "d", 3.0, _ts("2024-01-01T00:02:00"), 3),
        (2, "i", 4.0, _ts("2024-01-01T00:00:00"), 4),
        (2, "u", 5.0, _ts("2024-01-01T00:01:00"), 5),
        (3, "u", 6.0, _ts("2024-01-01T00:00:00"), 6),
        (3, "d", 7.0, _ts("2024-01-01T00:01:00"), 7),
        (4, "u", 8.0, _ts("2024-01-01T00:00:00"), 8),
        (4, "u", 9.0, _ts("2024-01-01T00:01:00"), 9),
        (5, "i", 10.0, _ts("2024-01-01T00:00:00"), 10),
    ]
    changes = spark.createDataFrame(
        rows, "key int, op string, val double, ts timestamp, seq int"
    )
    out = {
        r["key"]: (r["net_op"], r["last_val"], r["n_ops"])
        for r in analytics.net_changes(changes, "key", "ts", "seq").collect()
    }
    assert out == {
        1: ("none", 3.0, 3),
        2: ("i", 5.0, 2),
        3: ("d", 7.0, 2),
        4: ("u", 9.0, 2),
        5: ("i", 10.0, 1),
    }


def test_net_changes_tiebreak_same_ts(spark):
    # same timestamp: the tiebreak column orders ops deterministically
    t = _ts("2024-01-01T00:00:00")
    changes = spark.createDataFrame(
        [(1, "d", 0.0, t, 2), (1, "i", 1.0, t, 1)],
        "key int, op string, val double, ts timestamp, seq int",
    )
    [r] = analytics.net_changes(changes, "key", "ts", "seq").collect()
    assert r["net_op"] == "none"  # i (seq 1) then d (seq 2)


def test_funnel_monotone_and_ordered(spark, sf_dir):
    stages = {
        r["stage"]: r["n_users"]
        for r in analytics.event_funnel(spark, sf_dir).collect()
    }
    assert set(stages) == {"1_view", "2_click", "3_purchase"}
    assert stages["1_view"] >= stages["2_click"] >= stages["3_purchase"]


def test_funnel_no_cartesian(spark, sf_dir):
    plan = _plan(analytics.event_funnel(spark, sf_dir))
    assert "CartesianProduct" not in plan


def test_retention_offsets_nonnegative(spark, sf_dir):
    df = analytics.event_retention(spark, sf_dir)
    assert df.filter(F.col("day_offset") < 0).count() == 0
    # every cohort has an offset-0 cell (the cohort day itself is active)
    cohorts = df.select("cohort_day").distinct().count()
    zero = df.filter(F.col("day_offset") == 0).count()
    assert zero == cohorts


def test_transitions_conserve_events(spark, sf_dir):
    from openlogreplicator_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    n_events = ev.count()
    n_users = ev.select("user_id").distinct().count()
    total = (
        analytics.event_transitions(spark, sf_dir)
        .agg(F.sum("n_transitions"))
        .collect()[0][0]
    )
    # each user's timeline of k events yields k-1 transitions
    assert total == n_events - n_users


def test_histogram_counts_sum_to_orders(spark, sf_dir):
    from openlogreplicator_spark.sources.tables import load_table

    df = analytics.agg_histogram(spark, sf_dir)
    total = df.agg(F.sum("n_orders")).collect()[0][0]
    assert total == load_table(spark, sf_dir, "orders").count()


def test_net_changes_single_agg_shuffle(spark, sf_dir):
    # one partial-aggregated exchange on the key, no join, no window
    plan = _plan(analytics.cdc_net_changes(spark, sf_dir))
    assert "Join" not in plan
    assert "CartesianProduct" not in plan
    assert "Window" not in plan
    # partial + final aggregate around the exchange (min_by/max_by lower
    # to SortAggregate)
    assert "partial_min_by" in plan
    assert plan.count("Aggregate") >= 2


def test_apply_changes_insert_then_update_keeps_the_row(spark):
    """r12 review-pass-10: sequential MERGE of [insert@t1, update@t2]
    for a key absent from base must end with the row existing at the
    update's balance — last-change-wins alone dropped it. A lone
    update on a missing key stays a no-op, and the insert path must
    actually insert (the old 10k offset collided with real customer
    keys at sf0.1+)."""
    from openlogreplicator_spark.operators.history import apply_changes

    base = spark.createDataFrame(
        [(1, "alice", 10.0, "SEG")],
        "c_custkey long, c_name string, c_acctbal double, "
        "c_mktsegment string",
    )
    changes = spark.createDataFrame(
        [
            (99, "i", 5.0, 1, 1),   # new key: insert...
            (99, "u", 7.0, 2, 2),   # ...then update — must survive at 7
            (50, "u", 3.0, 1, 3),   # lone update on missing key: no-op
            (1, "u", 11.0, 1, 4),   # update on base row
        ],
        "c_custkey long, op string, new_bal double, ts long, "
        "event_id long",
    )
    out = {
        r.c_custkey: r.asDict()
        for r in apply_changes(
            base, changes, "c_custkey", "ts", "event_id"
        ).collect()
    }
    assert set(out) == {1, 99}
    assert out[99]["c_acctbal"] == 7.0
    assert out[99]["c_name"] == "NEW-99" and out[99]["c_mktsegment"] == "NEW"
    assert out[1]["c_acctbal"] == 11.0
