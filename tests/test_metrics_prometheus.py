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
    """The distributed counter query renders directly — including the
    per-table dml splits and the writer/reader counter families added
    for Metrics.h:48-140 parity."""
    from openlogreplicator_spark.operators.cdc import cdc_metrics

    text = render_prometheus(cdc_metrics(spark, sf_dir), prefix="olr_")
    assert "# TYPE olr_dml_ops counter" in text
    assert 'olr_dml_ops{filter="out",type="insert"}' in text
    assert 'olr_dml_ops{filter="skip",type="insert"}' in text
    # per-table split → owner/table labels (Metrics.h:82-87 overloads)
    assert 'owner="TPCH",table="T0",type="insert"' in text
    assert 'olr_transactions{filter="out",type="commit"}' in text
    assert "olr_bytes_sent" in text and "olr_messages_confirmed" in text
    # gauges render as gauges
    assert "# TYPE olr_checkpoint_lag gauge" in text


def test_exposition_layout_parity_with_reference():
    """Family/label/help layout parity vs MetricsPrometheus.cpp:41-110:
    the exact label keys the reference registers per family, the exact
    help strings, and counter-vs-gauge registration."""
    from openlogreplicator_spark.functions.metrics_prometheus import (
        _GAUGE_FAMILIES,
        _HELP,
        _family,
    )

    # label-set parity per family (reference ->Add({...}) call sites)
    assert _family("dml_ops_insert_out") == (
        "dml_ops", {"type": "insert", "filter": "out"}
    )
    assert _family("dml_ops_update_skip:OWNER1.T_ORDERS") == (
        "dml_ops",
        {"type": "update", "filter": "skip",
         "owner": "OWNER1", "table": "T_ORDERS"},
    )
    assert _family("ddl_ops_truncate") == ("ddl_ops", {"type": "truncate"})
    assert _family("transactions_commit_out") == (
        "transactions", {"type": "commit", "filter": "out"}
    )
    assert _family("transactions_rollback_partial") == (
        "transactions", {"type": "rollback", "filter": "partial"}
    )
    assert _family("checkpoints_skip") == ("checkpoints", {"filter": "skip"})
    assert _family("memory_used_mb_parser") == (
        "memory_used_mb", {"type": "parser"}
    )
    assert _family("log_switches_online") == (
        "log_switches", {"type": "online"}
    )
    assert _family("log_switches_lag_archived") == (
        "log_switches_lag", {"type": "archived"}
    )
    assert _family("service_state_replicating") == (
        "service_state", {"state": "replicating"}
    )
    assert _family("bytes_read") == ("bytes_read", {})

    # help-string parity (MetricsPrometheus.cpp .Help(...) literals)
    assert _HELP["bytes_read"] == "Number of bytes read from redo log files"
    assert _HELP["bytes_parsed"] == (
        "Number of bytes parsed containing redo log data"
    )
    assert _HELP["bytes_confirmed"] == "Number of bytes confirmed by output"
    assert _HELP["checkpoint_lag"] == "Checkpoint processing lag in seconds"
    assert _HELP["checkpoints"] == "Number of checkpoint records"

    # gauge-vs-counter registration parity (BuildGauge call sites)
    assert "checkpoint_lag" in _GAUGE_FAMILIES
    assert "memory_used_mb" in _GAUGE_FAMILIES
    assert "service_state" in _GAUGE_FAMILIES
    assert "swap_usage_mb" in _GAUGE_FAMILIES
    assert "dml_ops" not in _GAUGE_FAMILIES
    assert "checkpoints" not in _GAUGE_FAMILIES


def test_replication_counters_accounting(spark, sf_dir, tmp_path):
    """bytes_read / bytes_parsed / checkpoints_out over a real binary
    directory satisfy the accounting identity the metrics indicators
    assert: file bytes = parsed LWN payload bytes + one 512-byte header
    block per file."""
    from openlogreplicator_spark.operators.cdc import replication_counters
    from openlogreplicator_spark.sources.binary_redo import write_binary_redo
    from openlogreplicator_spark.sources.redo_gen import (
        generate_redo_records,
        redo_records_df,
    )

    d = str(tmp_path / "redo")
    write_binary_redo(
        redo_records_df(spark, generate_redo_records(n_txns=10, seed=7)),
        d,
        n_files=3,
    )
    vals = {
        r.metric: r.value for r in replication_counters(spark, d).collect()
    }
    assert vals["bytes_read"] == vals["bytes_parsed"] + 512 * vals["files_read"]
    assert vals["checkpoints_out"] >= 1
    assert vals["checkpoint_lag"] == 0


def test_label_values_escaped_in_exposition(spark):
    """r12 review-pass-9: Prometheus exposition label values must
    escape backslash, double-quote and newline (prometheus-cpp
    TextSerializer semantics) — a quoted Oracle identifier in a
    per-table series previously broke the whole scrape body."""
    from openlogreplicator_spark.functions.metrics_prometheus import (
        render_prometheus,
    )

    m = spark.createDataFrame(
        [('dml_ops_insert_out:OWN."A"B"', 3)], "metric string, value long"
    )
    text = render_prometheus(m, tag_names="all")
    line = [ln for ln in text.splitlines() if ln.startswith("dml_ops{")]
    assert line and '\\"' in line[0]
    # parseable: every label value's quotes are balanced after unescape
    assert 'table="' in line[0] or 'owner="' in line[0]
