"""W8 Prometheus text exposition (reference:
src/common/metrics/MetricsPrometheus.cpp:41-110 — family/label layout)."""

from __future__ import annotations

from openlogreplicator_spark.functions.metrics_prometheus import render_prometheus


def test_exposition_format(spark):
    metrics = spark.createDataFrame(
        [
            ("dml_ops_insert_out", 10),
            ("dml_ops_delete_skip", 2),
            ("ddl_ops_create", 3),
            ("transactions_out", 5),
            ("bytes_parsed", 4096),
        ],
        "metric string, value long",
    )
    text = render_prometheus(metrics)
    lines = text.strip().split("\n")
    # one HELP/TYPE header pair per family, families sorted
    assert "# HELP dml_ops Number of DML operations" in lines
    assert "# TYPE dml_ops counter" in lines
    assert 'dml_ops{filter="out",type="insert"} 10' in lines
    assert 'dml_ops{filter="skip",type="delete"} 2' in lines
    assert 'ddl_ops{type="create"} 3' in lines
    assert 'transactions{filter="out"} 5' in lines
    assert "bytes_parsed 4096" in lines
    assert text.endswith("\n")
    # family order is stable (sorted) so scrape diffs are meaningful
    fams = [ln.split()[2] for ln in lines if ln.startswith("# HELP")]
    assert fams == sorted(fams)


def test_exposition_over_engine_metrics(spark, sf_dir):
    """The distributed counter query renders directly."""
    from openlogreplicator_spark.operators.cdc import cdc_metrics

    text = render_prometheus(cdc_metrics(spark, sf_dir), prefix="olr_")
    assert "# TYPE olr_dml_ops counter" in text
    assert 'olr_dml_ops{filter="out",type="insert"}' in text
    assert "olr_transactions" in text
