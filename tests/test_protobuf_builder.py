"""Protobuf wire-format golden tests — the decoder is an independent
parser, so these verify real framing (varint tags, length-delimited
nesting) against the reference's proto/OraProtoBuf.proto field numbers:
RedoResponse{scn=2, tm=4, xid=6, db=8, payload=9, c_scn=10, c_idx=11},
Payload{op enum=1, schema=2, rid=3, before*=4, after*=5, num=10},
Schema{owner=1, name=2, obj=3}, Value{name=1, value_string=5}."""

from __future__ import annotations

import datetime

from openlogreplicator_spark.builders.protobuf_builder import (
    build_protobuf_events,
    decode_message,
    encode_event,
)
from openlogreplicator_spark.event_model import CHANGE_EVENT_SCHEMA


def test_wire_format_golden():
    # code=PAYLOAD(5) → field1 varint 0x08 0x05 (BuilderProtobuf.h:98);
    # scn=1 → field2 varint: tag 0x10, value 0x01; tm → field4 varint 0x20
    raw = encode_event(
        {"scn": 1, "tm_micros": 2, "xid": "a.b.c", "db": "D", "op": "c",
         "owner": "U", "table": "T", "obj": 7, "rid": "r",
         "before": None, "after": {"K": "v"}}
    )
    assert raw.startswith(bytes([0x08, 0x05, 0x10, 0x01, 0x20, 0x02]))
    assert dict((f, v) for f, _, v in decode_message(raw))[1] == 5
    fields = dict((f, v) for f, _, v in decode_message(raw))
    assert fields[2] == 1 and fields[4] == 2
    assert fields[6] == b"a.b.c" and fields[8] == b"D"
    payload = dict((f, v) for f, _, v in decode_message(fields[9]))
    assert payload[1] == 2  # Op.INSERT
    schema = dict((f, v) for f, _, v in decode_message(payload[2]))
    assert schema[1] == b"U" and schema[2] == b"T" and schema[3] == 7
    assert payload[3] == b"r"
    col = dict((f, v) for f, _, v in decode_message(payload[5]))
    assert col[1] == b"K" and col[5] == b"v"


def test_op_enum_values():
    # proto3 Op enum: BEGIN 0 (omitted as default), COMMIT 1, INSERT 2,
    # UPDATE 3, DELETE 4, DDL 5, CHKPT 6
    for op, code in (("commit", 1), ("u", 3), ("d", 4), ("ddl", 5),
                     ("chkpt", 6)):
        raw = encode_event({"scn": 1, "op": op})
        payload = dict(
            (f, v) for f, _, v in
            decode_message(dict((f, v) for f, _, v in decode_message(raw))[9])
        )
        assert payload[1] == code, op
    raw = encode_event({"scn": 1, "op": "begin"})
    payload = decode_message(dict((f, v) for f, _, v in decode_message(raw))[9])
    assert not any(f == 1 for f, _, _ in payload)  # default omitted


def test_varint_multibyte_and_repeated_before():
    raw = encode_event(
        {"scn": 300, "tm_micros": None, "xid": None, "db": None, "op": "u",
         "owner": None, "table": None, "obj": None, "rid": None,
         "before": {"A": "1", "B": "2"}, "after": {"A": "9"}}
    )
    fields = decode_message(raw)
    assert fields[0] == (1, 0, 5)    # ResponseCode::PAYLOAD, always first
    assert fields[1] == (2, 0, 300)  # 300 needs two varint bytes
    payload_msg = [v for f, _, v in fields if f == 9][0]
    befores = [v for f, _, v in decode_message(payload_msg) if f == 4]
    assert len(befores) == 2  # repeated Value, sorted by column name


def test_null_column_value_omits_datum():
    raw = encode_event({"scn": 1, "op": "c", "after": {"NULLED": None}})
    payload = dict((f, v) for f, _, v in decode_message(
        dict((f, v) for f, _, v in decode_message(raw))[9]))
    val = decode_message(payload[5])
    assert val == [(1, 2, b"NULLED")]  # name only, no value_string field


def test_spark_protobuf_pipeline(spark):
    ts = datetime.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        (1002, 1000, 3, ts, 9, "3.7.42", "DB", "c", "USR", "T1", 5001,
         "rid1", None, {"ID": "1"}, {}, 1, 77),
        (1003, 1000, 3, ts, 9, "3.7.42", "DB", "u", "USR", "T1", 5001,
         "rid1", {"ID": "1"}, {"ID": "2"}, {}, 2, 78),
    ]
    df = spark.createDataFrame(rows, CHANGE_EVENT_SCHEMA)
    out = build_protobuf_events(df).collect()
    assert len(out) == 2
    for r in out:
        fields = dict((f, v) for f, _, v in decode_message(bytes(r.value)))
        assert fields[6] == b"3.7.42"
        assert fields[2] in (1002, 1003)
        assert fields[4] == 1704110400000000  # tm micros
        assert fields[10] == 1000 and fields[11] == 3  # c_scn / c_idx
        payload = dict((f, v) for f, _, v in decode_message(fields[9]))
        assert payload[7] == 9  # seq
        assert payload[8] in (77, 78)  # offset
        assert payload[10] in (1, 2)  # num


def test_negative_int64_varint_is_twos_complement():
    """protobuf encodes negative int64 as the two's-complement uint64
    (10-byte varint). Regression: _varint(-5) used to loop forever
    (Python's arithmetic shift never zeroes a negative), found when the
    first change stream containing scn 0 produced c_scn = -5."""
    from openlogreplicator_spark.builders.protobuf_builder import _varint

    raw = _varint(-5)
    assert len(raw) == 10
    # decode it back: little-endian 7-bit groups
    v = 0
    for i, b in enumerate(raw):
        v |= (b & 0x7F) << (7 * i)
    assert v == (1 << 64) - 5
    assert _varint(0) == b"\x00" and _varint(300) == b"\xac\x02"


def test_header_toggles_reach_protobuf_wire(spark):
    """appendHeader parity (BuilderProtobuf.h:95-190): SCN_FORMAT HEX →
    scns (field 3, 16 unprefixed hex — numToString), XID_FORMAT NUMERIC
    → xidn (field 7, packed 64-bit), TEXT_HEX → zero-padded
    0x%04x.%03x.%08x (unlike the JSON render), and the TIMESTAMP_FORMAT
    switch: numeric UNIX scales the SECOND-truncated epoch into tm,
    UNIX_*_STRING renders it into tms, bare ISO8601 renders
    'YYYY-MM-DDTHH:MM:SSZ' into tms, and the other ISO variants emit NO
    timestamp at all (the reference's `default: break`)."""
    from openlogreplicator_spark.config import (
        Format,
        ScnFormat,
        TimestampFormat,
        XidFormat,
    )

    ts = datetime.datetime(2024, 1, 1, 12, 0, 0, 123456)
    rows = [
        (4095, 1000, 3, ts, 9, "3.7.42", "DB", "c", "USR", "T1", 5001,
         "rid1", None, {"ID": "1"}, {}, 1, 77),
    ]
    df = spark.createDataFrame(rows, CHANGE_EVENT_SCHEMA)

    def one(fmt):
        r = build_protobuf_events(df, fmt=fmt).collect()[0]
        return dict((f, v) for f, _, v in decode_message(bytes(r.value)))

    hexed = one(Format(scn=ScnFormat.HEX))
    assert hexed[3] == b"0000000000000fff"  # scns, no 0x prefix
    assert 2 not in hexed

    packed = one(Format(xid=XidFormat.NUMERIC))
    assert packed[7] == (3 << 48) | (7 << 32) | 42  # xidn
    assert 6 not in packed

    xh = one(Format(xid=XidFormat.TEXT_HEX))
    assert xh[6] == b"0x0003.007.0000002a"  # setw-padded, protobuf form
    # pad-but-never-truncate: a 4-hex slt must render in full (setw
    # widens; lpad would have corrupted it to 3 chars)
    wide = spark.createDataFrame(
        [(4095, 1000, 3, ts, 9, "3.4096.42", "DB", "c", "USR", "T1",
          5001, "rid1", None, {"ID": "1"}, {}, 1, 77)],
        CHANGE_EVENT_SCHEMA,
    )
    r = build_protobuf_events(wide, fmt=Format(xid=XidFormat.TEXT_HEX)).collect()[0]
    assert dict(
        (f, v) for f, _, v in decode_message(bytes(r.value))
    )[6] == b"0x0003.1000.0000002a"

    sec = one(Format(timestamp=TimestampFormat.UNIX_MILLI))
    assert sec[4] == 1704110400 * 1000  # SECOND truncation, then scaled
    unix_s = one(Format(timestamp=TimestampFormat.UNIX_STRING))
    assert unix_s[5] == b"1704110400" and 4 not in unix_s
    iso = one(Format(timestamp=TimestampFormat.ISO8601))
    assert iso[5] == b"2024-01-01T12:00:00Z"
    none_tm = one(Format(timestamp=TimestampFormat.ISO8601_MICRO_TZ))
    assert 4 not in none_tm and 5 not in none_tm

    # no fmt → legacy self-describing header: true-microsecond tm
    legacy = dict(
        (f, v)
        for f, _, v in decode_message(
            bytes(build_protobuf_events(df).collect()[0].value)
        )
    )
    assert legacy[4] == 1704110400123456


def test_full_envelope_and_byte_true_split(spark):
    """MESSAGE_FORMAT::FULL through the protobuf builder: one
    RedoResponse per transaction carrying repeated Payload entries
    (field 9) via the same appendHeader path (BuilderProtobuf.h:95-190),
    and the byte-true T6 split (Builder.h:167): greedy wire-byte packing
    against max_message_bytes, 'xid:part' keys, no multi-payload message
    over the cap — verified with the independent wire parser."""
    from openlogreplicator_spark.config import Format, MessageFormat

    ts = datetime.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        (1002 + i, 1000, 3, ts, 9, "3.7.42", "DB", "c", "USR", "T1",
         5001, "rid1", None,
         {"ID": str(i), "V": "w" * (4000 if i == 2 else 150)}, {},
         i, 77 + i)
        for i in range(6)
    ]
    df = spark.createDataFrame(rows, CHANGE_EVENT_SCHEMA)
    fmt = Format(message=MessageFormat.FULL, add_sequences=True)

    # no cap: ONE message, header from the first op, 6 payload entries
    whole = build_protobuf_events(df, fmt=fmt).collect()
    assert len(whole) == 1 and whole[0].key == "3.7.42"
    triples = decode_message(bytes(whole[0].value))
    assert [f for f, _, _ in triples] == [1, 2, 4, 6, 8] + [9] * 6 + [10, 11]
    fields = dict((f, v) for f, _, v in triples)
    assert fields[1] == 5  # ResponseCode::PAYLOAD on data messages
    assert fields[2] == 1002  # first-op scn heads the envelope
    assert fields[6] == b"3.7.42"
    nums = [
        dict((f, v) for f, _, v in decode_message(p)).get(10, 0)
        for f, _, p in triples
        if f == 9
    ]
    assert nums == [0, 1, 2, 3, 4, 5]  # emission order inside the array

    # 1 KiB cap: the ~4 KiB op rides alone; other messages stay ≤ cap
    cap = 1024
    split = build_protobuf_events(
        df, fmt=fmt, max_message_bytes=cap
    ).collect()
    seen = []
    for r in sorted(split, key=lambda r: int(r.key.split(":")[1])):
        assert r.key.startswith("3.7.42:")
        triples = decode_message(bytes(r.value))
        pls = [p for f, _, p in triples if f == 9]
        if len(pls) > 1:
            assert len(r.value) <= cap
        for p in pls:
            seen.append(
                dict((f, v) for f, _, v in decode_message(p)).get(10, 0)
            )
        if any(
            dict((f, v) for f, _, v in decode_message(p)).get(10) == 2
            for p in pls
        ):
            assert len(pls) == 1 and len(r.value) > cap
    assert seen == [0, 1, 2, 3, 4, 5]


def test_schema_full_and_repeated_column_descriptors(spark):
    """SCHEMA_FORMAT FULL/REPEATED through the protobuf builder
    (BuilderProtobuf.h:218-322): pb::Schema carries repeated Column
    descriptors (name=1, type=2, length=3, precision=4, scale=5,
    nullable=6) — NUMBER with precision/scale, VARCHAR2 with length,
    unknown type codes as UNKNOWN(0). FULL emits them once per
    (transaction, table) first op; REPEATED on every op. (The
    reference's own loop overwrites a single add_column() slot — an
    upstream defect documented in encode_schema; this builder emits
    every column.)"""
    from openlogreplicator_spark.config import Format, SchemaFormat
    from openlogreplicator_spark.event_model import DICT_COL_SCHEMA

    ts = datetime.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        (1002 + i, 1000, 3, ts, 9, "3.7.42", "DB", "c", "USR", "T1",
         5001, "rid1", None, {"ID": str(i)}, {}, i, 77 + i)
        for i in range(3)
    ]
    df = spark.createDataFrame(rows, CHANGE_EVENT_SCHEMA)
    dict_rows = [
        (5001, 0, 0, 0, "ID", 2, 22, 10, 0, 873, False, 1, 0, 0),
        (5001, 1, 1, 1, "V", 1, 40, 0, 0, 873, True, 0, 0, 0),
        (5001, 2, 2, 2, "X", 999, 8, 0, 0, 873, True, 0, 0, 0),
    ]
    dcols = spark.createDataFrame(dict_rows, DICT_COL_SCHEMA)

    def schemas(fmt):
        out = build_protobuf_events(df, fmt=fmt, dict_cols=dcols)
        per_op = []
        for r in sorted(out.collect(), key=lambda r: bytes(r.value)):
            fields = decode_message(bytes(r.value))
            pay = [v for f, _, v in fields if f == 9]
            assert len(pay) == 1
            sch = dict(
                (f, v) for f, _, v in decode_message(pay[0])
            )[2]
            cols = [v for f, _, v in decode_message(sch) if f == 6]
            per_op.append(cols)
        return per_op

    full = schemas(Format(schema=SchemaFormat.FULL))
    with_cols = [c for c in full if c]
    assert len(with_cols) == 1, "FULL: descriptors once per txn+table"
    cols = with_cols[0]
    assert len(cols) == 3
    decoded = [
        dict((f, v) for f, _, v in decode_message(c)) for c in cols
    ]
    by_name = {d[1]: d for d in decoded}
    # NUMBER(10,0) PK: type=2, precision=4 present, no length, not null
    assert by_name[b"ID"][2] == 2 and by_name[b"ID"][4] == 10
    assert 3 not in by_name[b"ID"] and 6 not in by_name[b"ID"]
    # VARCHAR2(40) nullable: type=1, length=40, nullable=1
    assert by_name[b"V"][2] == 1 and by_name[b"V"][3] == 40
    assert by_name[b"V"][6] == 1
    # unmapped type code → UNKNOWN(0): proto3 omits the 0 enum
    assert 2 not in by_name[b"X"] and 3 not in by_name[b"X"]

    rep = schemas(Format(schema=SchemaFormat.REPEATED))
    assert all(len(c) == 3 for c in rep), "REPEATED: every op"

    # default OBJ mode: no descriptors at all
    plain = schemas(Format())
    assert all(c == [] for c in plain)


def test_xid_text_reversed_protobuf_is_plain_hex16(spark):
    """XID_FORMAT::TEXT_REVERSED on the protobuf wire is PLAIN
    zero-padded hex16 of the packed xid (BuilderProtobuf.h:182-185,
    ostringstream setw(16) — no byte-pair shuffle; the shuffle is a
    BuilderJson-only rendering)."""
    from openlogreplicator_spark.config import Format, XidFormat

    ts = datetime.datetime(2024, 1, 1, 12, 0, 0)
    df = spark.createDataFrame(
        [(4095, 1000, 3, ts, 9, "3.7.42", "DB", "c", "USR", "T1", 5001,
          "rid1", None, {"ID": "1"}, {}, 1, 77)],
        CHANGE_EVENT_SCHEMA,
    )
    r = build_protobuf_events(
        df, fmt=Format(xid=XidFormat.TEXT_REVERSED)
    ).collect()[0]
    fields = dict((f, v) for f, _, v in decode_message(bytes(r.value)))
    packed = (3 << 48) | (7 << 32) | 42
    assert fields[6] == ("%016x" % packed).encode()
    assert 7 not in fields  # not the packed-numeric oneof


def test_full_envelope_with_descriptors_hand_derived_golden(spark):
    """Byte-literal golden derived BY HAND from OraProtoBuf.proto field
    numbers (Value proto:80-89, Column proto:91-98, Schema proto:100-109,
    Payload proto:111-122, RedoResponse proto:143-158) — the expected
    bytes below are assembled from raw key/length/value octets written
    out from the proto spec, NOT from this repo's encoder or decoder, so
    an encoder/decoder shared bug cannot satisfy this test.

    One committed INSERT on APP.ORD (obj 77) with a single NUMBER(10,2)
    column descriptor under MESSAGE_FORMAT::FULL + SCHEMA_FORMAT::FULL."""
    from openlogreplicator_spark.config import (
        Format,
        MessageFormat,
        SchemaFormat,
    )

    events = spark.createDataFrame(
        [(100, "2024-03-01 12:00:00", "1.2.3", "c", "APP", "ORD", 77, 0,
          150)],
        "scn long, tm string, xid string, op string, owner string, "
        "table string, obj long, num long, c_scn long",
    ).selectExpr(
        "scn", "cast(tm as timestamp) tm", "xid", "op", "owner", "table",
        "obj", "num", "c_scn",
        "cast(0 as long) c_idx", "'FDB' db",
        "cast(null as map<string,string>) before",
        "map('ID','7') after",
        "cast(null as string) rid",
        "cast(1 as long) seq", "cast(0 as long) offset",
    )
    dict_cols = spark.createDataFrame(
        [(77, 1, "ID", 2, 0, 10, 2, False, 1)],
        "obj long, col int, name string, type int, length int, "
        "precision int, scale int, nullable boolean, numpk int",
    )
    fmt = Format(message=MessageFormat.FULL, schema=SchemaFormat.FULL)
    (row,) = build_protobuf_events(
        events, fmt=fmt, dict_cols=dict_cols
    ).collect()

    # --- hand-assembled expectation ------------------------------------
    # wire key = (field << 3) | wire_type; varints little-endian 7-bit.
    column = (                     # Column (proto:91-98)
        b"\x0a\x02ID"              # 1:name LEN "ID"         (1<<3|2=0x0a)
        b"\x10\x02"                # 2:type  VARINT 2=NUMBER (2<<3|0=0x10)
        b"\x20\x0a"                # 4:precision VARINT 10   (4<<3|0=0x20)
        b"\x28\x02"                # 5:scale VARINT 2        (5<<3|0=0x28)
    )                              # 3:length omitted (NUMBER), 6:nullable
    #                                omitted (false is proto3 default)
    schema = (                     # Schema (proto:100-109)
        b"\x0a\x03APP"             # 1:owner LEN "APP"
        b"\x12\x03ORD"             # 2:name  LEN "ORD"       (2<<3|2=0x12)
        b"\x18\x4d"                # 3:obj   VARINT 77       (3<<3|0=0x18)
        + b"\x32" + bytes([len(column)]) + column   # 6:column (6<<3|2)
    )
    value = (                      # Value (proto:80-89)
        b"\x0a\x02ID"              # 1:name LEN "ID"
        b"\x2a\x017"               # 5:value_string LEN "7"  (5<<3|2=0x2a)
    )
    payload = (                    # Payload (proto:111-122)
        b"\x08\x02"                # 1:op VARINT 2=INSERT    (1<<3|0=0x08)
        + b"\x12" + bytes([len(schema)]) + schema   # 2:schema (2<<3|2)
        + b"\x2a" + bytes([len(value)]) + value     # 5:after  (5<<3|2)
    )                              # rid empty → omitted; no seq/offset on
    #                                DML; num=0 omitted (no ADD_SEQUENCES)
    # 2024-03-01T12:00:00Z = 1709294400 s → 1709294400000000 µs, varint:
    tm_varint = b"\x80\xa0\x9d\xec\x81\xd3\x84\x03"
    assert sum(
        (b & 0x7F) << (7 * i) for i, b in enumerate(tm_varint)
    ) == 1709294400000000  # the varint itself is hand-checked too
    expected = (                   # RedoResponse (proto:143-158)
        b"\x08\x05"                # 1:code VARINT 5=PAYLOAD
        b"\x10\x64"                # 2:scn  VARINT 100       (2<<3|0=0x10)
        + b"\x20" + tm_varint      # 4:tm   VARINT µs        (4<<3|0=0x20)
        + b"\x32\x051.2.3"         # 6:xid  LEN "1.2.3"      (6<<3|2=0x32)
        + b"\x42\x03FDB"           # 8:db   LEN "FDB"        (8<<3|2=0x42)
        + b"\x4a" + bytes([len(payload)]) + payload  # 9:payload (9<<3|2)
        + b"\x50\x96\x01"          # 10:c_scn VARINT 150     (10<<3|0)
    )                              # 11:c_idx omitted (0)
    assert bytes(row.value) == expected


def test_db_format_gates_field8(spark):
    """r12 review pass: the reference's protobuf appendHeader writes
    set_db only under showDb = isDbFormatAddDml() (ADD_DDL for DDL) —
    BuilderProtobuf.h:189-190, BuilderProtobuf.cpp:104-292 — the same
    DB_FORMAT toggle the JSON builder honors. Unconditional emission
    made one deployment's two builders disagree about DEFAULT."""
    import datetime as _dt

    from openlogreplicator_spark.config import DbFormat, Format

    ts = _dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        (4095, 1000, 3, ts, 9, "3.7.42", "DB", "c", "USR", "T1", 5001,
         "rid1", None, {"ID": "1"}, {}, 1, 77),
        (4096, 1000, 3, ts, 9, "3.7.42", "DB", "ddl", "USR", "T1", 5001,
         "rid1", None, {"SQL": "ALTER ..."}, {}, 2, 78),
    ]
    df = spark.createDataFrame(rows, CHANGE_EVENT_SCHEMA)

    def fields(fmt):
        return [
            dict((f, v) for f, _, v in decode_message(bytes(r.value)))
            for r in build_protobuf_events(df, fmt=fmt).collect()
        ]

    # default fmt: db = ALL → field 8 on every message (the pinned
    # legacy behavior)
    assert all(8 in m for m in fields(Format()))
    # DEFAULT: omitted everywhere
    assert all(8 not in m for m in fields(Format(db=DbFormat.DEFAULT)))
    # ADD_DML: on the DML message only; ADD_DDL: on the DDL message only
    dml = fields(Format(db=DbFormat.ADD_DML))
    assert sum(8 in m for m in dml) == 1
    ddl = fields(Format(db=DbFormat.ADD_DDL))
    assert sum(8 in m for m in ddl) == 1
    assert [8 in m for m in dml] != [8 in m for m in ddl]
