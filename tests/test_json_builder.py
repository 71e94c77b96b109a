"""Golden JSON output for the event builder's format-toggle matrix."""

from __future__ import annotations

import datetime
import json

import pytest
from pyspark.sql import functions as F

from openlogreplicator_spark.config import (
    ColumnFormat,
    Format,
    MessageFormat,
    ScnFormat,
    SchemaFormat,
    TimestampFormat,
    XidFormat,
    debezium_preset,
)
from openlogreplicator_spark.builders.json_builder import build_events
from openlogreplicator_spark.event_model import CHANGE_EVENT_SCHEMA


@pytest.fixture(scope="module")
def events_df(spark):
    ts = datetime.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        # (scn c_scn c_idx tm seq xid db op owner table obj rid before after attrs num offset)
        (1001, 1000, 0, ts, 1, "3.7.42", "DB", "begin", None, None, None, None,
         None, None, {"OS_USER_NAME": "app"}, 0, 100),
        (1002, 1000, 0, ts, 1, "3.7.42", "DB", "c", "USR", "T1", 5001,
         "AAAB8dAAEAAAADbAAA", None, {"ID": "1", "V": "x"}, {}, 1, 110),
        (1003, 1000, 0, ts, 1, "3.7.42", "DB", "u", "USR", "T1", 5001,
         "AAAB8dAAEAAAADbAAA", {"ID": "1", "V": "x"}, {"ID": "1", "V": "y"},
         {}, 2, 120),
        (1004, 1000, 0, ts, 1, "3.7.42", "DB", "commit", None, None, None,
         None, None, None, {}, 3, 130),
    ]
    return spark.createDataFrame(rows, CHANGE_EVENT_SCHEMA)


def test_default_short_messages(events_df):
    out = build_events(events_df, Format())
    rows = {json.loads(r.value)["payload"][0]["op"]: json.loads(r.value)
            for r in out.collect()}
    assert set(rows) == {"begin", "c", "u", "commit"}
    ins = rows["c"]
    assert ins["scn"] == 1002
    assert ins["xid"] == "3.7.42"
    assert ins["tm"] == 1704110400000000  # unix micros UTC
    assert ins["payload"][0]["schema"] == {"owner": "USR", "table": "T1", "obj": 5001}
    assert ins["payload"][0]["after"] == {"ID": "1", "V": "x"}
    assert "before" not in ins["payload"][0] or ins["payload"][0].get("before") is None


def test_changed_column_suppression(events_df):
    """COLUMN_FORMAT::CHANGED drops unchanged columns from the update's
    before image (Builder.cpp:1467-1506): ID is unchanged → dropped."""
    out = build_events(events_df, Format(column=ColumnFormat.CHANGED))
    upd = next(
        json.loads(r.value) for r in out.collect()
        if json.loads(r.value)["payload"][0]["op"] == "u"
    )
    assert upd["payload"][0]["before"] == {"V": "x"}
    assert upd["payload"][0]["after"] == {"ID": "1", "V": "y"}

    full = build_events(events_df, Format(column=ColumnFormat.FULL_UPD))
    upd2 = next(
        json.loads(r.value) for r in full.collect()
        if json.loads(r.value)["payload"][0]["op"] == "u"
    )
    assert upd2["payload"][0]["before"] == {"ID": "1", "V": "x"}


def test_scn_hex_and_xid_formats(events_df):
    fmt = Format(scn=ScnFormat.HEX, xid=XidFormat.NUMERIC)
    out = build_events(events_df, fmt)
    v = json.loads(out.collect()[0].value)
    # SCN_FORMAT::TEXT_HEX renames the field scn → scns
    # (BuilderJson.h:240-252)
    assert "scn" not in v
    assert v["scns"].startswith("0x00000000000003e")
    assert v["xid"] == (3 << 48) + (7 << 32) + 42

    hexfmt = Format(xid=XidFormat.TEXT_HEX)
    v2 = json.loads(build_events(events_df, hexfmt).collect()[0].value)
    # fixed-width 0x%04x.%03x.%08x — appendHex4/3/8 emit every nibble
    # (BuilderJson.h:301-305); matches the protobuf builder's rendering
    assert v2["xid"] == "0x0003.007.0000002a"


def test_timestamp_formats(events_df):
    """The full 16-variant TIMESTAMP_FORMAT matrix (Format.h:117-134,
    BuilderJson.h:104-231): numeric UNIX variants under "tm", every
    string-rendered variant under "tms" (the reference's field
    rename)."""
    numeric = [
        (TimestampFormat.UNIX_NANO, 1704110400000000000),
        (TimestampFormat.UNIX_MICRO, 1704110400000000),
        (TimestampFormat.UNIX_MILLI, 1704110400000),
        (TimestampFormat.UNIX_SEC, 1704110400),
    ]
    strings = [
        (TimestampFormat.UNIX_NANO_STRING, "1704110400000000000"),
        (TimestampFormat.UNIX_MICRO_STRING, "1704110400000000"),
        (TimestampFormat.UNIX_MILLI_STRING, "1704110400000"),
        (TimestampFormat.UNIX_STRING, "1704110400"),
        (TimestampFormat.ISO8601_NANO_TZ, "2024-01-01T12:00:00.000000000Z"),
        (TimestampFormat.ISO8601_MICRO_TZ, "2024-01-01T12:00:00.000000Z"),
        (TimestampFormat.ISO8601_MILLI_TZ, "2024-01-01T12:00:00.000Z"),
        (TimestampFormat.ISO8601_TZ, "2024-01-01T12:00:00Z"),
        (TimestampFormat.ISO8601_NANO, "2024-01-01T12:00:00.000000000"),
        (TimestampFormat.ISO8601_MICRO, "2024-01-01T12:00:00.000000"),
        (TimestampFormat.ISO8601_MILLI, "2024-01-01T12:00:00.000"),
        (TimestampFormat.ISO8601, "2024-01-01T12:00:00"),
    ]
    for tf, expect in numeric:
        v = json.loads(
            build_events(events_df, Format(timestamp=tf)).collect()[0].value
        )
        assert v["tm"] == expect, tf
        assert "tms" not in v
    for tf, expect in strings:
        v = json.loads(
            build_events(events_df, Format(timestamp=tf)).collect()[0].value
        )
        assert v["tms"] == expect, tf
        assert "tm" not in v


def test_scn_type_bits_and_user(events_df):
    """SCN_TYPE::BEGIN/COMMIT bits add b_scn/e_scn (b_scns/e_scns under
    TEXT_HEX); USER_TYPE emits usr from the attributes' LOGIN_USER_NAME
    and omits the field when the attribute is absent — the reference's
    attributes->find miss (BuilderJson.h:255-278, 336-343)."""
    fmt = Format(scn_begin=True, scn_commit=True, show_user=True)
    vals = [json.loads(r.value) for r in build_events(events_df, fmt).collect()]
    for v in vals:
        assert v["e_scn"] == 1000      # the fixture's c_scn
        assert "b_scn" not in v        # null begin_scn → omitted
        assert "usr" not in v          # no LOGIN_USER_NAME attribute

    # a frame that carries begin_scn and the login attribute emits both
    enriched = events_df.selectExpr(
        "*",
        "CAST(999 AS BIGINT) AS begin_scn",
    ).withColumn(
        "attrs",
        F.create_map(F.lit("LOGIN_USER_NAME"), F.lit("SCOTT")),
    )
    v = json.loads(build_events(enriched, fmt).collect()[0].value)
    assert v["b_scn"] == 999 and v["e_scn"] == 1000
    assert v["usr"] == "SCOTT"

    hexfmt = Format(scn=ScnFormat.HEX, scn_commit=True)
    vh = json.loads(build_events(events_df, hexfmt).collect()[0].value)
    assert vh["e_scns"].startswith("0x")
    assert "e_scn" not in vh


def test_user_type_bits(events_df):
    """USER_TYPE per-kind bits (Format.h:110-117; the showUser argument
    at each appendHeader call site): usr rides only the selected
    message kinds."""
    enriched = events_df.withColumn(
        "attrs", F.create_map(F.lit("LOGIN_USER_NAME"), F.lit("SCOTT"))
    )

    def by_op(fmt):
        return {
            json.loads(r.value)["payload"][0]["op"]: json.loads(r.value)
            for r in build_events(enriched, fmt).collect()
        }

    begin_only = by_op(Format(show_user=1))
    assert begin_only["begin"]["usr"] == "SCOTT"
    assert "usr" not in begin_only["c"] and "usr" not in begin_only["commit"]

    dml_only = by_op(Format(show_user=2))
    assert "usr" not in dml_only["begin"]
    assert dml_only["c"]["usr"] == "SCOTT"

    commit_only = by_op(Format(show_user=4))
    assert commit_only["commit"]["usr"] == "SCOTT"
    assert "usr" not in commit_only["c"]

    all_kinds = by_op(Format(show_user=True))
    assert all(v["usr"] == "SCOTT" for v in all_kinds.values())


def test_timestamp_type_bits(events_df):
    """TIMESTAMP_TYPE bits (Format.h:92-99, BuilderJson.h:280-290):
    COMMIT_VALUE renders tm from the commit timestamp; BEGIN/COMMIT add
    b_tm/e_tm (name-shifted to b_tms/e_tms for string variants);
    missing source columns omit the fields."""
    import datetime

    fmt = Format(tm_begin=True, tm_commit=True)
    v = json.loads(build_events(events_df, fmt).collect()[0].value)
    assert "b_tm" not in v and "e_tm" not in v  # no b_tm/e_tm columns

    enriched = events_df.withColumn(
        "b_tm", F.lit(datetime.datetime(2024, 1, 1, 11, 0, 0))
    ).withColumn("e_tm", F.lit(datetime.datetime(2024, 1, 1, 13, 0, 0)))
    v = json.loads(build_events(enriched, fmt).collect()[0].value)
    assert v["b_tm"] == 1704106800000000
    assert v["e_tm"] == 1704114000000000
    assert v["tm"] == 1704110400000000  # op timestamp, not commit-value

    cv = Format(tm_commit_value=True)
    v = json.loads(build_events(enriched, cv).collect()[0].value)
    assert v["tm"] == 1704114000000000  # the commit timestamp

    iso = Format(
        timestamp=TimestampFormat.ISO8601_TZ, tm_begin=True, tm_commit=True
    )
    v = json.loads(build_events(enriched, iso).collect()[0].value)
    assert v["b_tms"] == "2024-01-01T11:00:00Z"
    assert v["e_tms"] == "2024-01-01T13:00:00Z"


def test_skip_begin_commit_and_attrs(events_df):
    fmt = Format(skip_begin=True, skip_commit=True, attributes=True)
    out = [json.loads(r.value) for r in build_events(events_df, fmt).collect()]
    assert {v["payload"][0]["op"] for v in out} == {"c", "u"}


def test_attributes_format_bits(events_df):
    """ATTRIBUTES_FORMAT bits (Format.h:28-33): attrs ride only the
    selected message kinds — begin (bit0, BuilderJson.cpp:465), DML
    (bit1, :519-637), commit (bit2, :494); a FULL envelope carries them
    iff the BEGIN bit is set (stamped at begin time)."""
    def by_op(fmt):
        return {
            json.loads(r.value)["payload"][0]["op"]: json.loads(r.value)
            for r in build_events(events_df, fmt).collect()
        }

    begin_only = by_op(Format(attributes=1))
    assert begin_only["begin"]["attrs"] == {"OS_USER_NAME": "app"}
    assert "attrs" not in begin_only["c"]
    assert "attrs" not in begin_only["commit"]

    dml_only = by_op(Format(attributes=2))
    assert "attrs" not in dml_only["begin"]
    assert "attrs" in dml_only["c"] and "attrs" in dml_only["u"]

    commit_only = by_op(Format(attributes=4))
    assert "attrs" not in commit_only["begin"]
    assert "attrs" in commit_only["commit"]

    all_kinds = by_op(Format(attributes=True))
    assert all("attrs" in v for v in all_kinds.values())

    # FULL envelope: BEGIN bit controls the single txn-level attrs
    full_on = json.loads(
        build_events(
            events_df, Format(message=MessageFormat.FULL, attributes=1)
        ).collect()[0].value
    )
    assert full_on["attrs"] == {"OS_USER_NAME": "app"}
    full_off = json.loads(
        build_events(
            events_df, Format(message=MessageFormat.FULL, attributes=4)
        ).collect()[0].value
    )
    assert "attrs" not in full_off


def test_redo_thread_format(events_df):
    """REDO_THREAD_FORMAT (Format.h:91-94): TEXT emits "rth" in the
    header after db (BuilderJson.h:346-349), defaulting to thread 1 for
    single-instance frames; SKIP (the default) omits the field entirely,
    in both SHORT and FULL message shapes."""
    default = json.loads(
        build_events(events_df, Format()).collect()[0].value
    )
    assert "rth" not in default

    on = build_events(events_df, Format(redo_thread=True)).collect()
    for r in on:
        v = json.loads(r.value)
        assert v["rth"] == 1
        # field order parity: rth renders after db (BuilderJson.h:346)
        assert r.value.index('"db"') < r.value.index('"rth"')

    full = json.loads(
        build_events(
            events_df, Format(message=MessageFormat.FULL, redo_thread=True)
        ).collect()[0].value
    )
    assert full["rth"] == 1


def test_full_message_per_transaction(events_df):
    fmt = Format(message=MessageFormat.FULL, skip_begin=True, skip_commit=True)
    rows = build_events(events_df, fmt).collect()
    assert len(rows) == 1  # one envelope for the whole transaction
    v = json.loads(rows[0].value)
    assert [p["op"] for p in v["payload"]] == ["c", "u"]  # emission order
    assert v["xid"] == "3.7.42"


def test_tag_message_key(events_df):
    out = build_events(events_df, Format(), tag_cols=("ID",))
    keyed = [r for r in out.collect()
             if json.loads(r.value)["payload"][0]["op"] == "c"]
    assert json.loads(keyed[0].key) == {"ID": "1"}


def test_debezium_preset_shape(events_df):
    fmt = debezium_preset()
    out = [json.loads(r.value) for r in build_events(events_df, fmt).collect()]
    ops = {v["payload"][0]["op"] for v in out}
    assert ops == {"c", "u"}          # begin/commit skipped
    assert all(isinstance(v["tm"], int) for v in out)  # ms timestamps
    # ▲ r6 SCN_TYPE::DEBEZIUM + USER_TYPE::DEBEZIUM in the preset:
    # e_scn present, b_scn/usr omitted on this fixture (no begin_scn
    # column / no LOGIN_USER_NAME attribute)
    assert all(v["e_scn"] == 1000 for v in out)
    assert all("usr" not in v for v in out)


# --- dictionary-driven surfaces: schema sections + column-format modes ----


@pytest.fixture(scope="module")
def dict_cols_df(spark):
    from openlogreplicator_spark.event_model import DICT_COL_SCHEMA

    rows = [
        # obj col segcol intcol name type length precision scale charsetid
        # nullable numpk property scn_from
        (5001, 0, 0, 0, "ID", 2, 22, 10, 0, 873, False, 1, 0, 0),
        (5001, 1, 1, 1, "V", 1, 20, None, None, 873, True, 0, 0, 0),
        (5001, 2, 2, 2, "W", 12, 7, None, None, 873, True, 0, 0, 0),
    ]
    return spark.createDataFrame(rows, DICT_COL_SCHEMA)


def test_full_ins_dec_materializes_all_columns(events_df, dict_cols_df):
    """FULL_INS_DEC (Builder.cpp:1578-1586): inserts carry EVERY table
    column; columns absent from the redo image become explicit nulls."""
    fmt = Format(column=ColumnFormat.FULL_INS_DEC)
    out = [json.loads(r.value) for r in
           build_events(events_df, fmt, dict_cols=dict_cols_df).collect()]
    ins = [v for v in out if v["payload"][0]["op"] == "c"][0]
    after = ins["payload"][0]["after"]
    assert set(after) == {"ID", "V", "W"}
    assert after["W"] is None and after["ID"] == "1"


def test_changed_mode_pk_completion(spark, dict_cols_df):
    """Default CHANGED shaping with a dictionary (Builder.cpp:1588-1624):
    null-valued non-key columns drop from the insert image; a missing key
    column is materialized as null so the key is always complete."""
    ts = datetime.datetime(2024, 1, 1)
    rows = [(1, 1, 0, ts, 1, "1.1.1", "DB", "c", "USR", "T1", 5001, "r",
             None, {"V": None, "X": "keep"}, {}, 0, 0)]
    df = spark.createDataFrame(rows, CHANGE_EVENT_SCHEMA)
    out = json.loads(
        build_events(df, Format(), dict_cols=dict_cols_df).collect()[0].value
    )
    after = out["payload"][0]["after"]
    assert "V" not in after          # null non-key dropped
    assert after["X"] == "keep"      # non-null entries survive
    assert after["ID"] is None       # missing PK materialized as null


def test_full_upd_null_propagation(spark, dict_cols_df):
    """FULL_UPD (Builder.cpp:1508-1536): updates carry the full column
    list on both sides; a column present on one side only propagates to
    the other."""
    ts = datetime.datetime(2024, 1, 1)
    rows = [(1, 1, 0, ts, 1, "1.1.1", "DB", "u", "USR", "T1", 5001, "r",
             {"ID": "1", "V": "x"}, {"V": "y"}, {}, 0, 0)]
    df = spark.createDataFrame(rows, CHANGE_EVENT_SCHEMA)
    fmt = Format(column=ColumnFormat.FULL_UPD)
    out = json.loads(
        build_events(df, fmt, dict_cols=dict_cols_df).collect()[0].value
    )
    p = out["payload"][0]
    assert set(p["before"]) == {"ID", "V", "W"}
    assert set(p["after"]) == {"ID", "V", "W"}
    assert p["after"]["ID"] == "1"   # propagated from before
    assert p["before"]["V"] == "x" and p["after"]["V"] == "y"
    assert p["before"]["W"] is None and p["after"]["W"] is None


def test_schema_full_descriptors_once_per_txn_table(events_df, dict_cols_df):
    """SCHEMA_FORMAT::FULL (BuilderJson.h:411-532): column descriptors
    with Oracle type rendering, emitted on the transaction's first op per
    table only."""
    from openlogreplicator_spark.config import SchemaFormat

    fmt = Format(schema=SchemaFormat.FULL)
    out = [json.loads(r.value) for r in
           build_events(events_df, fmt, dict_cols=dict_cols_df).collect()]
    dml = sorted(
        (v for v in out if v["payload"][0]["op"] in ("c", "u")),
        key=lambda v: v["scn"],
    )
    first, second = dml[0]["payload"][0], dml[1]["payload"][0]
    cols = {c["name"]: c for c in first["schema"]["columns"]}
    assert cols["ID"]["type"] == "number"
    assert cols["ID"]["precision"] == 10 and cols["ID"]["scale"] == 0
    assert cols["ID"]["nullable"] is False
    assert cols["V"]["type"] == "varchar2" and cols["V"]["length"] == 20
    assert "precision" not in cols["V"]  # length-typed, no precision
    assert cols["W"]["type"] == "date" and "length" not in cols["W"]
    assert "columns" not in second["schema"]  # only the first op carries them


def test_schema_repeated_every_message(events_df, dict_cols_df):
    from openlogreplicator_spark.config import SchemaFormat

    fmt = Format(schema=SchemaFormat.REPEATED)
    out = [json.loads(r.value) for r in
           build_events(events_df, fmt, dict_cols=dict_cols_df).collect()]
    dml = [v for v in out if v["payload"][0]["op"] in ("c", "u")]
    assert all("columns" in v["payload"][0]["schema"] for v in dml)


def test_key_override_b6(events_df, dict_cols_df):
    """B6 TableSelector.key: overrides the dictionary PK and keys the
    message by the business key when no tag is set."""
    out = build_events(
        events_df, Format(), dict_cols=dict_cols_df, key_cols=("V",)
    )
    keyed = {json.loads(r.value)["payload"][0]["op"]: r.key
             for r in out.collect()}
    assert json.loads(keyed["c"]) == {"V": "x"}
    assert json.loads(keyed["u"]) == {"V": "y"}


def test_debezium_preset_with_dict(events_df, dict_cols_df):
    """The full Debezium preset now renders schema sections + FULL_UPD."""
    out = [json.loads(r.value) for r in
           build_events(events_df, debezium_preset(),
                        dict_cols=dict_cols_df).collect()]
    upd = [v for v in out if v["payload"][0]["op"] == "u"][0]["payload"][0]
    assert set(upd["after"]) == {"ID", "V", "W"}
    first = sorted(out, key=lambda v: v["scn"])[0]["payload"][0]
    assert "columns" in first["schema"]


def test_reference_default_rendering(events_df):
    """The reference's own Format.h defaults: RID_FORMAT::SKIP drops the
    rid field, DB_FORMAT::DEFAULT drops the db field
    (OpenLogReplicator.cpp:675-680 default block)."""
    from openlogreplicator_spark.config import DbFormat, RidFormat

    fmt = Format(rid=RidFormat.SKIP, db=DbFormat.DEFAULT)
    for r in build_events(events_df, fmt).collect():
        v = json.loads(r.value)
        assert "db" not in v
        for p in v["payload"]:
            assert "rid" not in p


def test_db_format_add_dml_vs_ddl(events_df, spark):
    """DB_FORMAT::ADD_DML puts the db name on begin/commit/DML headers
    only; ADD_DDL only on ddl messages (BuilderJson.cpp:462-634)."""
    import datetime

    from openlogreplicator_spark.config import DbFormat

    ts = datetime.datetime(2024, 1, 1, 12, 0, 0)
    with_ddl = events_df.union(
        spark.createDataFrame(
            [(1005, 1000, 0, ts, 1, "3.7.42", "DB", "ddl", "USR", "T1",
              5001, None, None, {"sql": "ALTER TABLE T1 ADD C2 NUMBER"},
              {}, 4, 140)],
            CHANGE_EVENT_SCHEMA,
        )
    )
    dml = {json.loads(r.value)["payload"][0]["op"]: json.loads(r.value)
           for r in build_events(with_ddl, Format(db=DbFormat.ADD_DML)).collect()}
    assert dml["c"]["db"] == "DB" and dml["begin"]["db"] == "DB"
    assert "db" not in dml["ddl"]
    ddl = {json.loads(r.value)["payload"][0]["op"]: json.loads(r.value)
           for r in build_events(with_ddl, Format(db=DbFormat.ADD_DDL)).collect()}
    assert ddl["ddl"]["db"] == "DB"
    assert "db" not in ddl["c"] and "db" not in ddl["commit"]


def test_scn_type_commit_value(events_df):
    """SCN_TYPE::COMMIT_VALUE renders the txn's commit/checkpoint SCN in
    every header (BuilderJson.h:241-248) — here c_scn=1000 for all ops."""
    from openlogreplicator_spark.config import ScnType

    out = build_events(events_df, Format(scn_type=ScnType.COMMIT_VALUE))
    scns = {json.loads(r.value)["scn"] for r in out.collect()}
    assert scns == {1000}


def test_full_message_without_db(events_df):
    """MESSAGE_FORMAT::FULL header unpacking must track the configured
    header fields (regression: the hdr struct has no db under
    DB_FORMAT::DEFAULT)."""
    from openlogreplicator_spark.config import DbFormat

    fmt = Format(message=MessageFormat.FULL, db=DbFormat.DEFAULT)
    rows = [json.loads(r.value) for r in build_events(events_df, fmt).collect()]
    assert len(rows) == 1
    assert "db" not in rows[0]
    assert [p["op"] for p in rows[0]["payload"]] == ["begin", "c", "u", "commit"]


def test_unknown_type_hide_and_show(events_df, spark):
    """UNKNOWN_TYPE::HIDE (default, Format.h:182-186) drops columns of
    undecodable dictionary types (LONG=8, BuilderJson.h:445-448);
    SHOW renders them per UNKNOWN_FORMAT (? or hex dump)."""
    from openlogreplicator_spark.config import UnknownFormat, UnknownType
    from openlogreplicator_spark.event_model import DICT_COL_SCHEMA

    dict_cols = spark.createDataFrame(
        [
            (5001, 0, 0, 0, "ID", 2, 22, 10, 0, 873, False, 1, 0, 0),
            (5001, 1, 1, 1, "V", 8, 0, None, None, 873, True, 0, 0, 0),  # LONG
        ],
        DICT_COL_SCHEMA,
    )

    def images(fmt):
        out = [json.loads(r.value) for r in
               build_events(events_df, fmt, dict_cols=dict_cols).collect()]
        return [v for v in out if v["payload"][0]["op"] == "c"][0]["payload"][0]

    hidden = images(Format())  # default: HIDE
    assert "V" not in hidden["after"] and hidden["after"]["ID"] == "1"
    q = images(Format(unknown_type=UnknownType.SHOW))
    assert q["after"]["V"] == "?"
    dump = images(Format(unknown_type=UnknownType.SHOW,
                         unknown=UnknownFormat.DUMP))
    assert dump["after"]["V"] == "78"  # 'x' → hex


def test_full_header_every_toggle_on_golden(events_df, spark):
    """ONE golden pinning the complete header byte-surface with every
    header toggle on, in both the numeric and string render families —
    any future field rename (the r6 scns/tms/e_scn episode) must trip
    exactly this test (r6 VERDICT #8)."""
    bt = datetime.datetime(2024, 1, 1, 11, 0, 0)
    et = datetime.datetime(2024, 1, 1, 12, 0, 0)
    enriched = (
        events_df.filter(F.col("op") != "u")
        .selectExpr("*", "CAST(999 AS BIGINT) AS begin_scn")
        .withColumn("b_tm", F.lit(bt))
        .withColumn("e_tm", F.lit(et))
        .withColumn("thread", F.lit(2))
        .withColumn(
            "attrs",
            F.create_map(
                F.lit("OS_USER_NAME"), F.lit("app"),
                F.lit("LOGIN_USER_NAME"), F.lit("SCOTT"),
            ),
        )
    )
    fmt_num = Format(
        message=MessageFormat.FULL,
        scn_begin=True, scn_commit=True,
        show_user=True, attributes=True, redo_thread=True,
        tm_begin=True, tm_commit=True, tm_commit_value=True,
        add_offset=True, add_sequences=True,
    )
    v = json.loads(build_events(enriched, fmt_num).collect()[0].value)
    assert v == {
        "attrs": {"LOGIN_USER_NAME": "SCOTT", "OS_USER_NAME": "app"},
        "b_scn": 999,
        "b_tm": 1704106800000000,
        "db": "DB",
        "e_scn": 1000,
        "e_tm": 1704110400000000,
        "payload": [
            {"offset": 100, "op": "begin", "schema": {}},
            {"after": {"ID": "1", "V": "x"}, "offset": 110, "op": "c",
             "rid": "AAAB8dAAEAAAADbAAA",
             "schema": {"obj": 5001, "owner": "USR", "table": "T1"}},
            {"offset": 130, "op": "commit", "schema": {}},
        ],
        "rth": 2,
        "scn": 1001,
        "seq": 1,
        "tm": 1704110400000000,  # COMMIT_VALUE: header tm = e_tm
        "usr": "SCOTT",
        "xid": "3.7.42",
    }

    fmt_str = fmt_num.with_options(
        scn=ScnFormat.HEX, timestamp=TimestampFormat.ISO8601_NANO_TZ
    )
    v2 = json.loads(build_events(enriched, fmt_str).collect()[0].value)
    assert v2 == {
        "attrs": {"LOGIN_USER_NAME": "SCOTT", "OS_USER_NAME": "app"},
        "b_scns": "0x00000000000003e7",
        "b_tms": "2024-01-01T11:00:00.000000000Z",
        "db": "DB",
        "e_scns": "0x00000000000003e8",
        "e_tms": "2024-01-01T12:00:00.000000000Z",
        "payload": [
            {"offset": 100, "op": "begin", "schema": {}},
            {"after": {"ID": "1", "V": "x"}, "offset": 110, "op": "c",
             "rid": "AAAB8dAAEAAAADbAAA",
             "schema": {"obj": 5001, "owner": "USR", "table": "T1"}},
            {"offset": 130, "op": "commit", "schema": {}},
        ],
        "rth": 2,
        "scns": "0x00000000000003e9",
        "seq": 1,
        "tms": "2024-01-01T12:00:00.000000000Z",
        "usr": "SCOTT",
        "xid": "3.7.42",
    }


def test_byte_true_split_oversized_lob_op(spark):
    """T6 byte-true ``max-message-mb`` split (Builder.h:167;
    Transaction.cpp:519-538 splits on the builder's accumulated RENDERED
    bytes): a ~5 MiB LOB-bearing op under a 1 MiB cap must occupy a part
    of its OWN, no multi-op message may exceed the cap (the reference's
    single unavoidable overshoot is one op alone rendering past it), and
    emission order plus total op count survive the split."""
    ts = datetime.datetime(2024, 1, 1, 12, 0, 0)
    cap = 1024 * 1024
    rows = []
    for i in range(10):
        val = "L" * (5 * cap) if i == 4 else "v" * 200
        rows.append(
            (2000 + i, 1999, 0, ts, 1, "9.1.7", "DB", "c", "USR", "T1",
             5001, "AAAB8dAAEAAAADbAAA", None, {"ID": str(i), "V": val},
             {}, i, 100 + i)
        )
    df = spark.createDataFrame(rows, CHANGE_EVENT_SCHEMA)
    out = build_events(
        df, Format(message=MessageFormat.FULL), max_message_bytes=cap
    ).collect()
    parsed = sorted(
        ((json.loads(r.value), r.key, len(r.value.encode("utf-8")))
         for r in out),
        key=lambda vks: vks[0]["part"],
    )
    assert [k for _, k, _ in parsed] == [
        f"9.1.7:{v['part']}" for v, _, _ in parsed
    ]
    ids = [p["after"]["ID"] for v, _, _ in parsed for p in v["payload"]]
    assert ids == [str(i) for i in range(10)]  # order + completeness
    for v, _, size in parsed:
        if len(v["payload"]) > 1:
            assert size <= cap  # multi-op messages never exceed the cap
        if any(p["after"]["ID"] == "4" for p in v["payload"]):
            # the oversized op rides ALONE (and necessarily over-cap)
            assert len(v["payload"]) == 1 and size > cap


def test_xid_text_reversed_render(events_df):
    """XID_FORMAT::TEXT_REVERSED (the debezium preset's xid,
    OpenLogReplicator.cpp:707): hex16 of the packed 64-bit xid with
    byte pairs shuffled per appendHex16Reversed (BuilderJson.h:630-663)
    — output bytes in big-endian positions 1,0,3,2,7,6,5,4."""
    out = build_events(events_df, Format(xid=XidFormat.TEXT_REVERSED))
    v = json.loads(out.collect()[0].value)
    packed = (3 << 48) | (7 << 32) | 42  # xid 3.7.42
    h = "%016x" % packed
    expected = (h[2:4] + h[0:2] + h[6:8] + h[4:6]
                + h[14:16] + h[12:14] + h[10:12] + h[8:10])
    assert v["xid"] == expected
    # the debezium preset itself uses this rendering
    dbz = build_events(events_df, debezium_preset()).collect()
    assert json.loads(dbz[0].value)["xid"] == expected


def test_tag_is_keyless_for_markers(events_df):
    """r12 review pass: begin/commit (and ddl) carry no row image, so
    no tag can be computed — the reference sends such messages KEYLESS
    (tagSize=0 skips RD_KAFKA_VTYPE_KEY, WriterKafka.cpp:123-139). A
    constant '{}' key would funnel every transaction's markers onto one
    Kafka partition."""
    out = build_events(events_df, Format(), tag_cols=("ID",)).collect()
    by_op = {
        json.loads(r.value)["payload"][0]["op"]: r.key for r in out
    }
    assert by_op["begin"] is None and by_op["commit"] is None
    assert json.loads(by_op["c"]) == {"ID": "1"}


def test_versioned_dict_cols_use_latest_schema(spark, events_df):
    """r12 review pass: with a versioned dictionary (two scn_from
    versions of one column), build_events used to feed BOTH versions to
    map_from_entries → DUPLICATED_MAP_KEY; it must use the latest."""
    from openlogreplicator_spark.event_model import DICT_COL_SCHEMA

    rows = [
        (5001, 0, 0, 0, "ID", 2, 22, 10, 0, 873, False, 1, 0, 0),
        (5001, 1, 1, 1, "V", 1, 20, None, None, 873, True, 0, 0, 0),
        (5001, 1, 1, 1, "V", 1, 40, None, None, 873, True, 0, 0, 100),
    ]
    dc = spark.createDataFrame(rows, DICT_COL_SCHEMA)
    fmt = Format(schema=SchemaFormat.REPEATED)
    out = [
        json.loads(r.value)
        for r in build_events(events_df, fmt, dict_cols=dc).collect()
    ]
    lens = {
        c["name"]: c.get("length")
        for v in out
        for p in v["payload"]
        for c in (p.get("schema") or {}).get("columns", [])
    }
    assert "V" in lens, f"no schema columns rendered: {out}"
    assert lens["V"] == 40, f"stale column version used: {lens}"


def test_commit_value_scn_without_c_scn_column(spark):
    """r12 review pass: SCN_TYPE::COMMIT_VALUE reads c_scn through
    scn_expr's coalesce even when the c_scn FIELD toggle is off — a
    frame without the optional column must not fail plan-time."""
    from openlogreplicator_spark.config import ScnType

    import datetime as _dt

    rows = [(1000, _dt.datetime(2024, 1, 1), "3.7.42", "DB", "c", "APP",
             "T", 5001, "AAAAAAAAAAAAAAAAAA", None, {"ID": "1"}, {}, 0,
             0)]
    df = spark.createDataFrame(
        rows,
        "scn long, tm timestamp, xid string, db string, op string, "
        "owner string, table string, obj long, rid string, "
        "before map<string,string>, after map<string,string>, "
        "attrs map<string,string>, num long, offset long",
    )
    fmt = Format(scn_type=ScnType.COMMIT_VALUE, scn_commit=False)
    out = build_events(df, fmt).collect()
    assert len(out) == 1   # must not raise UNRESOLVED_COLUMN
    assert json.loads(out[0].value)["scn"] == 1000  # falls back to scn
