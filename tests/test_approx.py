"""Sketch-based aggregates: error bounds vs exact (no cross-engine oracle
exists for sketches, so the bound IS the correctness contract)."""

from __future__ import annotations

from pyspark.sql import functions as F

from openlogreplicator_spark.sources.tables import load_table


def test_approx_count_distinct_error_bound(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    got = (
        ev.groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id", 0.01).alias("approx"),
            F.countDistinct("user_id").alias("exact"),
        )
        .collect()
    )
    assert got
    for r in got:
        rel_err = abs(r.approx - r.exact) / max(r.exact, 1)
        assert rel_err < 0.05, f"{r.event_type}: {r.approx} vs {r.exact}"


def test_approx_percentile_tracks_exact(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    row = orders.agg(
        F.expr("approx_percentile(o_totalprice, 0.5, 1000)").alias("ap"),
        F.expr("percentile(o_totalprice, 0.5)").alias("p"),
    ).collect()[0]
    assert abs(row.ap - row.p) / row.p < 0.02
