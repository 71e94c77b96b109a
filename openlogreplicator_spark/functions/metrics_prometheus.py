"""W8 Prometheus text exposition for the metrics surface.

The reference exposes its counters through prometheus-cpp metric families
with labels (src/common/metrics/MetricsPrometheus.cpp:41-110 —
``dml_ops{type="insert",filter="out"}``, ``ddl_ops{type="create"}``,
``checkpoints{filter="out"}``…). The engine's counters are computed
distributed (operators/cdc.py::cdc_metrics — two partial-agg shuffles,
long-format (metric, value) rows); this module renders those rows into
the standard exposition text format, so any Prometheus scraper or
pushgateway can ingest them. Serving over HTTP is environment wiring —
the renderer is the portable part.

Scale note: the input is counter-scale (one row per metric family
member), so the collect here is a few dozen scalars per scrape.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

# help text parity with MetricsPrometheus.cpp:41-110
_HELP = {
    "dml_ops": "Number of DML operations",
    "ddl_ops": "Number of DDL operations",
    "transactions": "Number of transactions",
    "checkpoints": "Number of checkpoint records",
    "checkpoint_lag": "Checkpoint processing lag in seconds",
    "bytes_read": "Number of bytes read from redo log files",
    "bytes_parsed": "Number of bytes parsed containing redo log data",
    "bytes_sent": (
        "Number of bytes sent to output "
        "(for example to Kafka or network writer)"
    ),
    "bytes_confirmed": "Number of bytes confirmed by output",
    "messages_sent": "Number of messages sent to output",
    "messages_confirmed": "Number of messages confirmed by output",
    "memory_allocated_mb": "Amount of allocated memory",
    "memory_used_total_mb": "Total used memory",
    "swap_usage_mb": "Swap space usage",
    "log_switches": "Number of redo log switches",
}

# families the reference registers as gauges (BuildGauge call sites);
# everything else is a counter
_GAUGE_FAMILIES = {
    "checkpoint_lag", "memory_allocated_mb", "memory_used_total_mb",
    "memory_used_mb", "swap_usage_mb", "service_state",
    "log_switches_lag",
}

_DML = re.compile(
    r"^dml_ops_(insert|update|delete)_(out|skip)(?::([^.]+)\.(.+))?$"
)
_DDL = re.compile(r"^ddl_ops_(\w+)$")
_TXN = re.compile(r"^transactions_(commit|rollback)_(out|skip|partial)$")
_TXN_OLD = re.compile(r"^transactions(?:_(\w+))?$")
_CHK = re.compile(r"^checkpoints_(out|skip)$")
_MEM = re.compile(r"^memory_used_mb_(\w+)$")
_LOG = re.compile(r"^log_switches(_lag)?_(archived|online)$")
_SVC = re.compile(r"^service_state_(\w+)$")


def _family(metric: str) -> tuple[str, dict[str, str]]:
    """Long-format counter name → (family, labels) per the reference's
    family/label layout (MetricsPrometheus.cpp:41-110): dml_ops carries
    type+filter (+ owner/table when the tag-names mode splits per
    table), ddl_ops carries type, transactions carries type+filter,
    checkpoints carries filter, memory_used_mb carries the subsystem."""
    m = _DML.match(metric)
    if m:
        labels = {"type": m.group(1), "filter": m.group(2)}
        if m.group(3):
            labels["owner"] = m.group(3)
            labels["table"] = m.group(4)
        return "dml_ops", labels
    m = _DDL.match(metric)
    if m:
        return "ddl_ops", {"type": m.group(1)}
    m = _TXN.match(metric)
    if m:
        return "transactions", {"type": m.group(1), "filter": m.group(2)}
    m = _TXN_OLD.match(metric)
    if m:
        return "transactions", {"filter": m.group(1) or "out"}
    m = _CHK.match(metric)
    if m:
        return "checkpoints", {"filter": m.group(1)}
    m = _MEM.match(metric)
    if m:
        return "memory_used_mb", {"type": m.group(1)}
    m = _LOG.match(metric)
    if m:
        fam = "log_switches_lag" if m.group(1) else "log_switches"
        return fam, {"type": m.group(2)}
    m = _SVC.match(metric)
    if m:
        return "service_state", {"state": m.group(1)}
    return metric, {}


_SYS_OWNERS = {"SYS", "SYSTEM", "XDB"}


def _tag_mode_keeps(
    labels: dict[str, str], tag_names: str,
    sys_owners: frozenset | set = frozenset(_SYS_OWNERS),
) -> bool:
    """metrics ``tag-names`` gate (OpenLogReplicator.cpp:378-395;
    Metrics::TAG_NAMES): owner/table-labeled series exist only when the
    mode covers their class — FILTER for user tables, SYS for
    system tables, ALL for both, NONE (the reference default) for
    neither. Unlabeled totals always render.

    Fidelity note: the reference classifies by the table's dictionary
    OPTIONS::SYSTEM_TABLE flag; the rendering plane here sees only the
    metric name, so the class is approximated by owner — SYS/SYSTEM/XDB
    cover the dictionary tables the reference actually marks system
    (SYS.OBJ$ family, SYS.CCOL$/CDEF$/…, XDB.XDB$TTSET). A user table
    created inside those schemas would be misclassified; pass a
    narrower/wider ``sys_owners`` when the caller has the dictionary."""
    owner = labels.get("owner")
    if owner is None:
        return True
    if tag_names == "all":
        return True
    if tag_names == "filter":
        return owner.upper() not in sys_owners
    if tag_names == "sys":
        return owner.upper() in sys_owners
    return False   # "none"


def render_prometheus(
    metrics: DataFrame, prefix: str = "", tag_names: str = "all",
    sys_owners: frozenset | set = frozenset(_SYS_OWNERS),
) -> str:
    """(metric, value) rows → Prometheus text exposition format 0.0.4:
    one ``# HELP``/``# TYPE`` header per family, one sample line per
    labeled member, families sorted for a stable scrape body.
    ``tag_names`` applies the config's TAG_NAMES exposition gate to
    owner/table-labeled series ("all" keeps everything — the behavior
    direct callers always had; deployments pass their configured
    mode)."""
    rows = metrics.select("metric", "value").collect()
    families: dict[str, list[tuple[dict[str, str], float]]] = {}
    for r in rows:
        fam, labels = _family(r["metric"])
        if not _tag_mode_keeps(labels, tag_names, sys_owners):
            continue
        families.setdefault(fam, []).append((labels, r["value"]))
    out: list[str] = []
    for fam in sorted(families):
        name = f"{prefix}{fam}"
        help_text = _HELP.get(fam, fam.replace("_", " "))
        kind = "gauge" if fam in _GAUGE_FAMILIES else "counter"
        out.append(f"# HELP {name} {help_text}")
        out.append(f"# TYPE {name} {kind}")
        for labels, value in sorted(families[fam], key=lambda lv: sorted(lv[0].items())):
            if labels:
                body = ",".join(
                    f'{k}="{_esc_label(v)}"'
                    for k, v in sorted(labels.items())
                )
                out.append(f"{name}{{{body}}} {value}")
            else:
                out.append(f"{name} {value}")
    return "\n".join(out) + "\n"


def _esc_label(v: str) -> str:
    """Prometheus exposition-format label-value escaping (backslash,
    double quote, newline) — what the reference's prometheus-cpp
    TextSerializer applies; an unescaped quoted Oracle identifier
    (table 'A\"B') previously broke the whole scrape body (r12
    review-pass-9)."""
    return v.replace("\\", "\\\\").replace('"', '\\"').replace("\n", "\\n")
