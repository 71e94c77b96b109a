"""S2 online source discovery: the reference's startup conversation
(ReplicatorOnline.cpp:84-377) against a DB-API catalog — ARCHIVELOG /
supplemental-log gating, SCN + resetlogs capture, archived-log listing,
SCN→sequence mapping, and the SYS.* dictionary snapshot feeding the
pipeline's schema resolve."""

from __future__ import annotations

import duckdb
import pytest

from conftest import drain
from openlogreplicator_spark.config import EngineConfig
from openlogreplicator_spark.sources.binary_redo import write_binary_redo
from openlogreplicator_spark.sources.online_catalog import (
    OnlineCatalog,
    UnsupportedDatabaseConfig,
    tz_offset_seconds,
)
from openlogreplicator_spark.sources.redo_gen import redo_records_df
from openlogreplicator_spark.streaming.engine import build_pipeline


def _fixture_catalog(
    log_mode: str = "ARCHIVELOG",
    supp_min: str = "YES",
    role: str = "PRIMARY",
) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    con.execute(
        'CREATE TABLE "V_$DATABASE" AS SELECT'
        f" '{log_mode}' AS LOG_MODE, '{supp_min}'"
        " AS SUPPLEMENTAL_LOG_DATA_MIN,"
        " 'YES' AS SUPPLEMENTAL_LOG_DATA_PK,"
        " 'NO' AS SUPPLEMENTAL_LOG_DATA_ALL,"
        " 'Linux x86 64-bit' AS PLATFORM_NAME,"
        " 'ORCL' AS NAME, 5000 AS CURRENT_SCN,"
        f" '+02:00' AS DBTIMEZONE, '{role}' AS DATABASE_ROLE"
    )
    con.execute(
        'CREATE TABLE "V_$TRANSPORTABLE_PLATFORM" AS SELECT'
        " 'Linux x86 64-bit' AS PLATFORM_NAME, 'Little' AS ENDIAN_FORMAT"
    )
    con.execute(
        'CREATE TABLE "V_$VERSION" AS SELECT'
        " 'Oracle Database 19c Enterprise Edition' AS BANNER"
    )
    # two incarnations: branch 66666 (inc 1) was the original; a
    # resetlogs at SCN 1000 opened branch 77777 (inc 2, CURRENT)
    con.execute(
        'CREATE TABLE "V_$DATABASE_INCARNATION" ('
        ' "INCARNATION#" INT, "RESETLOGS_CHANGE#" BIGINT,'
        ' "PRIOR_RESETLOGS_CHANGE#" BIGINT, STATUS VARCHAR,'
        ' RESETLOGS_ID BIGINT, "PRIOR_INCARNATION#" INT)'
    )
    con.execute(
        'INSERT INTO "V_$DATABASE_INCARNATION" VALUES'
        " (1, 1, 0, 'PARENT', 66666, 0),"
        " (2, 1000, 1, 'CURRENT', 77777, 1)"
    )
    # standby redo groups: present whatever the role; only the standby
    # resolution path reads them
    con.execute(
        'CREATE TABLE "V_$STANDBY_LOG" AS SELECT'
        ' 7 AS "SEQUENCE#", 5200 AS "FIRST_CHANGE#"'
    )
    con.execute(
        'CREATE TABLE "V_$ARCHIVED_LOG" ('
        ' NAME VARCHAR, "SEQUENCE#" BIGINT, "FIRST_CHANGE#" BIGINT,'
        ' "NEXT_CHANGE#" BIGINT, RESETLOGS_ID BIGINT)'
    )
    for seq, a, b in ((3, 1000, 2000), (4, 2000, 3500), (5, 3500, 5000)):
        con.execute(
            'INSERT INTO "V_$ARCHIVED_LOG" VALUES (?, ?, ?, ?, 77777)',
            (f"/arch/redo_{seq}.arc", seq, a, b),
        )
    con.execute(
        'CREATE TABLE "V_$LOG" AS SELECT'
        ' 6 AS "SEQUENCE#", 5000 AS "FIRST_CHANGE#"'
    )
    # SYS.* dictionary: user OLTP owns table ORDERS(obj 77) with
    # AMOUNT (NUMBER, PK) and NOTE (VARCHAR2, nullable)
    con.execute(
        'CREATE TABLE "USER$" AS SELECT 101 AS "USER#", \'OLTP\' AS NAME'
    )
    con.execute(
        'CREATE TABLE "OBJ$" ('
        ' "OBJ#" BIGINT, "DATAOBJ#" BIGINT, "OWNER#" BIGINT,'
        ' NAME VARCHAR, "TYPE#" INT)'
    )
    con.execute('INSERT INTO "OBJ$" VALUES (77, 77, 101, \'ORDERS\', 2)')
    con.execute('INSERT INTO "OBJ$" VALUES (99, 99, 101, \'AN_INDEX\', 1)')
    con.execute(
        'CREATE TABLE "COL$" ('
        ' "OBJ#" BIGINT, "COL#" INT, "SEGCOL#" INT, "INTCOL#" INT,'
        ' NAME VARCHAR, "TYPE#" INT, LENGTH INT, "PRECISION#" INT,'
        ' SCALE INT, CHARSETID BIGINT, "NULL$" INT, PROPERTY BIGINT)'
    )
    con.execute(
        'INSERT INTO "COL$" VALUES'
        " (77, 1, 1, 1, 'AMOUNT', 2, 22, 10, 2, 0, 1, 0),"
        " (77, 2, 2, 2, 'NOTE', 1, 100, NULL, NULL, 873, 0, 0)"
    )
    con.execute(
        'CREATE TABLE "CDEF$" AS SELECT 9001 AS "CON#", 2 AS "TYPE#"'
    )
    con.execute(
        'CREATE TABLE "CCOL$" AS SELECT'
        ' 9001 AS "CON#", 1 AS "INTCOL#", 77 AS "OBJ#"'
    )
    return con


def test_refuses_noarchivelog_and_missing_supplemental():
    with pytest.raises(UnsupportedDatabaseConfig, match="ARCHIVELOG"):
        OnlineCatalog(
            _fixture_catalog(log_mode="NOARCHIVELOG")
        ).database_information()
    with pytest.raises(UnsupportedDatabaseConfig, match="SUPPLEMENTAL"):
        OnlineCatalog(
            _fixture_catalog(supp_min="NO")
        ).database_information()


def test_discovery_info_logs_and_sequence():
    cat = OnlineCatalog(_fixture_catalog())
    info = cat.database_information()
    assert info.db_name == "ORCL" and info.current_scn == 5000
    assert info.supp_log_pk and not info.supp_log_all
    assert not info.big_endian
    assert info.db_timezone == "+02:00"
    assert info.resetlogs_id == 77777
    logs = cat.archive_log_list(4, 77777)
    assert [(x["sequence"], x["first_scn"]) for x in logs] == [
        (4, 2000), (5, 3500)
    ]
    # SCN 3600 lies in sequence 5's range; the online log (seq 6)
    # starts later
    assert cat.sequence_from_scn(3600, 77777) == 5
    assert cat.sequence_from_scn(5000, 77777) == 6
    assert cat.sequence_from_scn(999, 0) is None


def test_database_role_and_standby_sequence_resolution():
    """Role-aware startup positioning (ReplicatorOnline.cpp:286-311,
    1464-1476): a PRIMARY resolves through V$LOG, a PHYSICAL STANDBY
    through V$STANDBY_LOG — the archived list is shared. The fixture's
    online log is seq 6 @ 5000; its standby group is seq 7 @ 5200."""
    prim = OnlineCatalog(_fixture_catalog())
    assert prim.database_role() == "PRIMARY"
    assert prim.resolve_start_sequence(5000, 77777) == 6

    stby = OnlineCatalog(_fixture_catalog(role="PHYSICAL STANDBY"))
    assert stby.database_role() == "PHYSICAL STANDBY"
    # SCN 5000 is below the standby group's first change − 1? no:
    # 5200 − 1 ≤ 5000 is false → archived seq 5 wins on the standby
    assert stby.resolve_start_sequence(5000, 77777) == 5
    assert stby.resolve_start_sequence(5300, 77777) == 7
    # an unknown role aborts like the reference's error 10038
    with pytest.raises(UnsupportedDatabaseConfig, match="10038"):
        OnlineCatalog(_fixture_catalog(role="SNAPSHOT STANDBY")
                      ).database_role()


def test_incarnation_selection_and_resetlogs_branch_switch():
    """DbIncarnation handling (Replicator.cpp:626-662 +
    ReplicatorOnline.cpp:1504-1511): checkpointed-resetlogs selection
    beats the CURRENT flag, and the branch switch fires exactly when
    the next SCN equals a child branch's resetlogs SCN."""
    from openlogreplicator_spark.sources.online_catalog import (
        select_incarnation,
        update_resetlogs,
    )

    cat = OnlineCatalog(_fixture_catalog())
    incs = cat.incarnations()
    assert len(incs) == 2

    # fresh start: CURRENT flag wins → branch 77777
    assert select_incarnation(incs).resetlogs == 77777
    # restart with a checkpoint that tracked the OLD branch: the
    # checkpointed id wins over CURRENT
    assert select_incarnation(incs, old_resetlogs=66666).resetlogs == 66666

    # reading branch 66666 and reaching the resetlogs SCN of its child
    # (1000, prior incarnation 1) → hop to 77777, sequence restarts at 0
    assert update_resetlogs(incs, 66666, next_scn=1000) == (77777, 0)
    # same branch, any other SCN → keep reading
    assert update_resetlogs(incs, 66666, next_scn=999) is None
    # already on the child branch at its own start SCN: prior
    # incarnation doesn't match → no switch
    assert update_resetlogs(incs, 77777, next_scn=1000) is None
    # a tracked resetlogs id absent from the list is the reference's
    # hard error 10045
    with pytest.raises(RuntimeError, match="10045"):
        update_resetlogs(incs, 55555, next_scn=999)
    # no incarnation rows at all: nothing to do (cpp:657-660)
    assert update_resetlogs([], 55555, next_scn=999) is None


def test_dictionary_snapshot_shapes(spark):
    cat = OnlineCatalog(_fixture_catalog())
    dict_obj, dict_cols, pos, scn, info = cat.bootstrap(spark)
    objs = {r["obj"]: r.asDict() for r in dict_obj.collect()}
    assert set(objs) == {77}  # TYPE#=2 tables only, not the index
    assert objs[77]["name"] == "ORDERS" and objs[77]["scn_from"] == 5000
    cols = sorted(
        (r.asDict() for r in dict_cols.collect()), key=lambda c: c["intcol"]
    )
    assert [c["name"] for c in cols] == ["AMOUNT", "NOTE"]
    assert cols[0]["numpk"] == 1 and cols[1]["numpk"] == 0
    assert cols[0]["type"] == 2 and cols[1]["type"] == 1
    assert not cols[0]["nullable"] and cols[1]["nullable"]
    assert pos == {77: ["AMOUNT", "NOTE"]}
    assert scn == 5000


def test_positional_dictionary_follows_segcol_order(spark):
    """r12 review-pass-6 regression: the KDO positional dictionary must
    be ordered by SEGCOL# with virtual (segcol#=0) columns excluded —
    the reference walks SysColSeg-keyed maps skipping segCol==0
    (Schema.cpp:649-654) and addColumn asserts segCol == position+1
    (DbTable.cpp:116-120). INTCOL# order diverges after drop/reorder
    and silently mis-attributes positional values."""
    con = _fixture_catalog()
    # obj 88: intcol# order is (B, A, V) but segcol# order is (A, B);
    # V is a virtual column (segcol#=0) that never appears in KDO areas
    con.execute('INSERT INTO "OBJ$" VALUES (88, 88, 101, \'REORG\', 2)')
    con.execute(
        'INSERT INTO "COL$" VALUES'
        " (88, 1, 2, 1, 'B', 1, 100, NULL, NULL, 873, 0, 0),"
        " (88, 2, 1, 2, 'A', 2, 22, 10, 2, 0, 1, 0),"
        " (88, 3, 0, 3, 'V', 1, 100, NULL, NULL, 873, 0, 0)"
    )
    _, _, pos, _, _ = OnlineCatalog(con).bootstrap(spark)
    assert pos[88] == ["A", "B"]
    assert pos[77] == ["AMOUNT", "NOTE"]


def test_bootstrap_feeds_pipeline_end_to_end(spark, tmp_path):
    """Discovery → dictionary → KDO-positional pipeline: the catalog's
    column names resolve the positional images, exactly the reference's
    startup → schema store → Builder::processDml chain."""
    import json

    cat = OnlineCatalog(_fixture_catalog())
    dict_obj, dict_cols, pos, start_scn, info = cat.bootstrap(spark)

    d = str(tmp_path / "olrs_cat")
    records = []
    for k in range(1, 7):
        xid = str(k)
        base = start_scn + k * 100  # all redo past the discovery SCN
        records.append(
            {"scn": base, "subscn": 0, "block": 0, "offset": 0, "seq": 1,
             "xid": xid, "opcode": "begin", "obj": 0, "bdba": None,
             "slot": None, "fb": 0, "cols": None, "rows": None}
        )
        records.append(
            {"scn": base + 1, "subscn": 0, "block": 1, "offset": k,
             "seq": 1, "xid": xid, "opcode": "insert", "obj": 77,
             "bdba": k, "slot": 0, "fb": 0,
             "cols": {"AMOUNT": str(k * 10), "NOTE": f"n{k}"},
             "rows": None}
        )
        records.append(
            {"scn": base + 99, "subscn": 0, "block": 0, "offset": 0,
             "seq": 1, "xid": xid, "opcode": "commit", "obj": 0,
             "bdba": None, "slot": None, "fb": 0, "cols": None,
             "rows": None}
        )
    write_binary_redo(
        redo_records_df(spark, records), d, n_files=2,
        col_types={"AMOUNT": "number"}, pos_dicts=pos,
    )
    assert tz_offset_seconds(info.db_timezone) == 7200
    cfg = EngineConfig(
        pos_dictionary=pos,
        start_scn=start_scn,
        db_timezone_seconds=tz_offset_seconds(info.db_timezone),
    )
    q = build_pipeline(
        spark, cfg, d,
        checkpoint=str(tmp_path / "ckpt_cat"),
        sink="memory",
        query_name="olr_catalog",
        dict_obj=dict_obj,
        dict_cols=dict_cols,
    )
    drain(q)
    rows = spark.sql("select * from olr_catalog").collect()
    assert len(rows) == 6
    for r in rows:
        v = json.loads(r.value)
        for p in v["payload"]:
            # positional images resolved through the CATALOG's names
            assert set(p["after"]) == {"AMOUNT", "NOTE"}


def _with_time_functions(con):
    """Give the DuckDB double the Oracle pieces time positioning needs:
    a DUAL with an epoch-days SYSDATE, TO_DATE(str, fmt) → epoch days,
    and TIMESTAMP_TO_SCN(days) — here days × 100 so SCNs are easy to
    predict."""
    import datetime

    epoch = datetime.datetime(1970, 1, 1)

    def to_date(s: str, fmt: str) -> float:
        return (
            datetime.datetime.strptime(s, "%Y-%m-%d %H:%M:%S") - epoch
        ).total_seconds() / 86400.0

    def ts_to_scn(days: float) -> int:
        return int(days * 100)

    con.create_function("TO_DATE", to_date)
    con.create_function("TIMESTAMP_TO_SCN", ts_to_scn)
    con.execute("CREATE TABLE DUAL AS SELECT 20000.0 AS SYSDATE")
    return con


def test_scn_from_time_positioning():
    """start-time / start-time-rel → SCN through the catalog
    (ReplicatorOnline::positionReader cpp:236-273): TIMESTAMP_TO_SCN
    resolution on PRIMARY, BootException 10024/10026 on standby, and
    ReferenceDeployment.resolve_start_scn wiring both paths."""
    from openlogreplicator_spark.reference_config import (
        ConfigurationError,
        from_reference_json,
    )

    cat = OnlineCatalog(_with_time_functions(_fixture_catalog()))
    # 2024-01-02 00:00:00 = 19724 epoch days → scn 1972400
    assert cat.scn_from_time("2024-01-02 00:00:00") == 1972400
    # SYSDATE 20000 days − 8640 s (=0.1 day) → 19999.9 days → 1999990
    assert cat.scn_from_time_relative(8640) == 1999990

    stand = OnlineCatalog(
        _with_time_functions(_fixture_catalog(role="PHYSICAL STANDBY"))
    )
    with pytest.raises(UnsupportedDatabaseConfig, match="10024"):
        stand.scn_from_time("2024-01-02 00:00:00")
    with pytest.raises(UnsupportedDatabaseConfig, match="10026"):
        stand.scn_from_time_relative(60)

    doc = {
        "version": "1.9.0",
        "source": [
            {
                "alias": "S", "name": "DB",
                "reader": {
                    "type": "online", "user": "u", "password": "p",
                    "server": "s", "start-time": "2024-01-02 00:00:00",
                },
                "format": {"type": "json"},
            }
        ],
        "target": [
            {"alias": "T", "source": "S", "writer": {"type": "discard"}}
        ],
    }
    dep = from_reference_json(doc)
    assert dep.resolve_start_scn(cat) == 1972400
    with pytest.raises(ConfigurationError):
        dep.resolve_start_scn()  # time positioning is online-only
    doc["source"][0]["reader"]["start-time"] = ""
    doc["source"][0]["reader"]["start-time-rel"] = 8640
    dep2 = from_reference_json(doc)
    assert dep2.resolve_start_scn(cat) == 1999990
    doc["source"][0]["reader"]["start-time-rel"] = 0
    doc["source"][0]["reader"]["start-scn"] = 777
    dep3 = from_reference_json(doc)
    assert dep3.resolve_start_scn() == 777


def test_start_sequence_positions_pipeline(spark, tmp_path):
    """O3 sequence positioning (Replicator.cpp:123-125) through
    build_pipeline: with start-seq set to the second redo file's
    sequence, records from sequence 1 never enter the pipeline."""
    import json as _json

    from openlogreplicator_spark.sources.redo_gen import (
        generate_redo_records,
    )

    d = str(tmp_path / "redo_seq")
    records = generate_redo_records(n_txns=10, seed=21)
    write_binary_redo(redo_records_df(spark, records), d, n_files=2)

    def run(cfg, name):
        q = build_pipeline(
            spark, cfg, d,
            checkpoint=str(tmp_path / f"ckpt_{name}"),
            sink="memory", query_name=f"olr_seq_{name}",
        )
        drain(q)
        out = set()
        for r in spark.sql(f"select * from olr_seq_{name}").collect():
            out.add(_json.loads(r.value)["xid"])
        return out

    all_x = run(EngineConfig(), "all")
    tail_x = run(EngineConfig(start_seq=2), "tail")
    assert tail_x < all_x, "start-seq must drop sequence-1 transactions"
    assert tail_x, "sequence-2 transactions must still emit"
