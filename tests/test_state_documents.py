"""W7 portable state documents: writer checkpoint doc + schema snapshot
(reference: Writer.cpp:386-443 checkpoint write/read,
SerializerJson.cpp:52-137/539-770 schema serialize/deserialize). The
contract under test is the reference's own: a cold start positioned purely
from the exported documents resumes exactly where the previous run
confirmed."""

from __future__ import annotations

import json

import pytest

from conftest import drain
from openlogreplicator_spark.metadata.state_documents import (
    export_schema_snapshot,
    import_schema_snapshot,
    latest_schema_snapshot,
    read_checkpoint_doc,
    resume_scn,
    write_checkpoint_doc,
)


def test_checkpoint_doc_roundtrip_and_shape(tmp_path):
    d = str(tmp_path)
    path = write_checkpoint_doc(
        d, "ORCL", scn=4711, idx=3, resetlogs=17, activation=99
    )
    with open(path) as fh:
        doc = json.load(fh)
    # exact reference field set (Writer.cpp:386-395) — nothing extra, so a
    # reference-compatible tool can parse it
    assert set(doc) == {"database", "scn", "idx", "resetlogs", "activation"}
    assert doc == {
        "database": "ORCL", "scn": 4711, "idx": 3,
        "resetlogs": 17, "activation": 99,
    }
    assert read_checkpoint_doc(d, "ORCL") == doc
    assert resume_scn(d, "ORCL") == 4711
    assert resume_scn(d, "OTHER", default_scn=5) == 5


def test_checkpoint_doc_missing_field_rejected(tmp_path):
    p = tmp_path / "ORCL-chkpt.json"
    p.write_text('{"database":"ORCL","scn":1}')
    with pytest.raises(ValueError, match="missing checkpoint field"):
        read_checkpoint_doc(str(tmp_path), "ORCL")


def test_schema_snapshot_roundtrip(spark, tmp_path):
    d = str(tmp_path)
    versions = spark.createDataFrame(
        [
            (18, 100, "APP", "ORDERS", "TABLE", False),
            (18, 250, "APP", "ORDERS_V2", "TABLE", False),
            (21, 120, "APP", "ITEMS", "TABLE", False),
            (21, 300, "APP", "ITEMS", "TABLE", True),  # tombstone
        ],
        "obj long, scn_from long, owner string, name string, type string, dropped boolean",
    )
    export_schema_snapshot(versions, d, "ORCL", scn=300, resetlogs=17)
    path = latest_schema_snapshot(d, "ORCL")
    assert path and path.endswith("ORCL-schema-300.json")
    back = import_schema_snapshot(spark, path)
    assert {tuple(r) for r in back.collect()} == {
        tuple(r) for r in versions.collect()
    }


def test_cold_start_resumes_from_documents(spark, tmp_path):
    """End-to-end: run the pipeline, confirm via the idempotent sink that
    writes the W7 doc, then cold-start a second pipeline positioned ONLY
    by the document — it must emit nothing (everything already confirmed),
    and as-of resolution over the re-imported snapshot must match the
    original registry."""
    from openlogreplicator_spark.config import EngineConfig
    from openlogreplicator_spark.metadata.schema_registry import asof_resolve
    from openlogreplicator_spark.sources.binary_redo import write_binary_redo
    from openlogreplicator_spark.sources.redo_gen import (
        generate_redo_records,
        redo_records_df,
    )
    from openlogreplicator_spark.streaming.engine import build_pipeline
    from openlogreplicator_spark.streaming.sinks import foreach_batch_idempotent

    redo_dir = str(tmp_path / "redo")
    records = generate_redo_records(n_txns=12, seed=7, p_rollback=0.0)
    write_binary_redo(redo_records_df(spark, records), redo_dir, n_files=2)
    state_dir = str(tmp_path / "state")

    # first run: lake sink, then confirm everything through the
    # idempotent writer which advances the portable checkpoint doc
    q = build_pipeline(
        spark, EngineConfig(), redo_dir,
        checkpoint=str(tmp_path / "ck1"), out_dir=str(tmp_path / "lake"),
        sink="lake",
    )
    drain(q)
    events = spark.read.parquet(str(tmp_path / "lake"))
    writer = foreach_batch_idempotent(
        str(tmp_path / "confirmed"), keys=("c_scn", "xid", "num"),
        state_dir=state_dir, database="DB",
    )
    writer(events, 0)
    doc = read_checkpoint_doc(state_dir, "DB")
    max_scn = events.agg({"c_scn": "max"}).collect()[0][0]
    assert doc is not None and doc["scn"] == max_scn

    # replay: the same batch again writes zero new rows (exactly-once)
    before = spark.read.parquet(str(tmp_path / "confirmed")).count()
    writer(events, 1)
    assert spark.read.parquet(str(tmp_path / "confirmed")).count() == before

    # cold start: positioning comes from the document alone
    q2 = build_pipeline(
        spark, EngineConfig(), redo_dir,
        checkpoint=str(tmp_path / "ck2"), sink="memory",
        query_name="olr_cold", state_dir=state_dir,
    )
    drain(q2)
    # db_name default is DB; all SCNs ≤ doc scn were confirmed → no output
    assert spark.sql("select count(*) from olr_cold").collect()[0][0] == 0


def test_cold_start_keeps_straddling_transaction_whole(spark, tmp_path):
    """r10 review pass: the W7 doc carries the writer's confirmed COMMIT
    scn. A transaction in flight across that watermark (early records
    below it, commit above) must re-emit WHOLE on a doc-based cold
    start — filtering raw records on scn would silently drop its early
    operations (the reference re-reads redo and lets the writer skip
    confirmed messages, Writer.cpp:235-268)."""
    import json as _json

    from openlogreplicator_spark.config import EngineConfig
    from openlogreplicator_spark.metadata.state_documents import (
        write_checkpoint_doc,
    )
    from openlogreplicator_spark.sources.binary_redo import write_binary_redo
    from openlogreplicator_spark.sources.redo_gen import redo_records_df
    from openlogreplicator_spark.streaming.engine import build_pipeline

    def rec(scn, xid, opcode, cols=None):
        return {
            "scn": scn, "subscn": 0, "block": 0, "offset": 0, "seq": 1,
            "xid": xid, "opcode": opcode, "obj": 1, "bdba": 1, "slot": 0,
            "fb": 0, "cols": cols, "rows": None,
        }

    records = [
        rec(90, "B", "begin"),
        rec(100, "A", "begin"),
        rec(110, "A", "insert", {"v": "a-early"}),      # below the doc scn
        rec(120, "B", "insert", {"v": "b-op"}),
        rec(150, "B", "commit"),                         # doc watermark
        rec(170, "A", "insert", {"v": "a-late"}),
        rec(200, "A", "commit"),                         # past the watermark
    ]
    redo_dir = str(tmp_path / "redo")
    write_binary_redo(redo_records_df(spark, records), redo_dir, n_files=1)

    state_dir = str(tmp_path / "state")
    write_checkpoint_doc(state_dir, "DB", scn=150)

    q = build_pipeline(
        spark, EngineConfig(), redo_dir,
        checkpoint=str(tmp_path / "ck"), sink="memory",
        query_name="olr_straddle", state_dir=state_dir,
    )
    drain(q)
    rows = spark.sql("select value from olr_straddle").collect()
    vals = [
        _json.loads(r.value) for r in rows
    ]
    texts = _json.dumps(vals)
    # txn A re-emits WHOLE: the op recorded below the watermark included
    assert "a-early" in texts and "a-late" in texts
    # txn B committed at the watermark — already confirmed, not re-sent
    assert "b-op" not in texts


def test_doc_resume_predicate_matrix(spark):
    """r10 review pass 3: the doc cold-start predicate must (a) pass
    NULL-commit_scn rows — SHOW_INCOMPLETE_TRANSACTIONS diagnostics
    were never confirmed and a bare `>` NULLs them out; (b) include the
    BOUNDARY transaction for the network sink, whose doc can record a
    mid-transaction idx watermark (the server's CONTINUE skip trims the
    confirmed parts), but exclude it for the funnel sinks, whose doc is
    written only after the full batch is durable."""
    from openlogreplicator_spark.streaming.engine import (
        _doc_resume_predicate,
    )

    df = spark.createDataFrame(
        [(100,), (150,), (200,), (None,)], "commit_scn long"
    )

    def scns(sink):
        rows = df.filter(_doc_resume_predicate(150, sink)).collect()
        return sorted((r.commit_scn for r in rows), key=lambda x: (x is None, x))

    assert scns("memory") == [200, None]
    # the file funnel's doc records only COMPLETE commit scns, so
    # strict > is lossless for it (nothing at the doc scn can be
    # partial); the network doc can record a mid-transaction client
    # confirm, so the boundary re-emits whole (at-least-once)
    assert scns("file") == [200, None]
    assert scns("network") == [150, 200, None]


def test_doc_database_body_mismatch_rejected(tmp_path):
    """Writer::readCheckpoint validates the doc BODY's database name
    (Writer.cpp:424-426, error 20001), not just the filename — a doc
    copied between deployments must never position a foreign stream."""
    import json
    import os

    import pytest

    from openlogreplicator_spark.metadata.state_documents import (
        checkpoint_path,
        read_checkpoint_doc,
        write_checkpoint_doc,
    )

    write_checkpoint_doc(str(tmp_path), "OTHER", scn=500)
    os.rename(
        checkpoint_path(str(tmp_path), "OTHER"),
        checkpoint_path(str(tmp_path), "MAIN"),
    )
    with pytest.raises(ValueError, match="invalid database name"):
        read_checkpoint_doc(str(tmp_path), "MAIN")
    # the matching doc still reads
    write_checkpoint_doc(str(tmp_path), "MAIN", scn=600)
    assert read_checkpoint_doc(str(tmp_path), "MAIN")["scn"] == 600


def test_advance_checkpoint_doc_is_lexicographic_and_carries_incarnation(tmp_path):
    """r12 review pass: (1) comparing scn alone never persisted
    intra-scn idx progress — the exact field idx exists for; (2) the
    rewrite reset resetlogs/activation to 0, corrupting incarnation
    identifiers a prior write recorded."""
    from openlogreplicator_spark.metadata.state_documents import (
        advance_checkpoint_doc,
        read_checkpoint_doc,
        write_checkpoint_doc,
    )

    d = str(tmp_path)
    write_checkpoint_doc(d, "DB", scn=100, idx=2, resetlogs=7,
                         activation=9)
    # same scn, HIGHER idx → must advance
    assert advance_checkpoint_doc(d, "DB", 100, idx=5) is True
    doc = read_checkpoint_doc(d, "DB")
    assert (doc["scn"], doc["idx"]) == (100, 5)
    # incarnation identifiers carried, not zeroed
    assert (doc["resetlogs"], doc["activation"]) == (7, 9)
    # same scn, lower/equal idx → stale, never regress
    assert advance_checkpoint_doc(d, "DB", 100, idx=5) is False
    assert advance_checkpoint_doc(d, "DB", 100, idx=1) is False
    assert advance_checkpoint_doc(d, "DB", 99, idx=9) is False
    doc = read_checkpoint_doc(d, "DB")
    assert (doc["scn"], doc["idx"], doc["resetlogs"]) == (100, 5, 7)
