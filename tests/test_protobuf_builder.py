"""Protobuf wire-format golden tests — the decoder is an independent
parser, so these verify real framing (varint tags, length-delimited
nesting), mirroring the reference's BuilderProtobuf output model."""

from __future__ import annotations

import datetime

from openlogreplicator_spark.builders.protobuf_builder import (
    build_protobuf_events,
    decode_message,
    encode_event,
)
from openlogreplicator_spark.event_model import CHANGE_EVENT_SCHEMA


def test_wire_format_golden():
    # scn=1 → field1 varint: 0x08 0x01 ; xid → field3 len-delim
    raw = encode_event(
        {"scn": 1, "tm_micros": 2, "xid": "a.b.c", "db": "D", "op": "c",
         "owner": "U", "table": "T", "obj": 7, "rid": "r",
         "before": None, "after": {"K": "v"}}
    )
    assert raw.startswith(bytes([0x08, 0x01, 0x10, 0x02]))
    fields = dict(
        (f, v) for f, _, v in decode_message(raw)
    )
    assert fields[1] == 1 and fields[2] == 2
    assert fields[3] == b"a.b.c" and fields[4] == b"D"
    op = dict((f, v) for f, _, v in decode_message(fields[5]))
    assert op[1] == b"c" and op[2] == b"U" and op[3] == b"T"
    assert op[4] == 7 and op[5] == b"r"
    col = dict((f, v) for f, _, v in decode_message(op[7]))
    assert col[1] == b"K" and col[2] == b"v"


def test_varint_multibyte():
    raw = encode_event(
        {"scn": 300, "tm_micros": None, "xid": None, "db": None, "op": "u",
         "owner": None, "table": None, "obj": None, "rid": None,
         "before": {"A": "1", "B": "2"}, "after": {"A": "9"}}
    )
    fields = decode_message(raw)
    assert fields[0] == (1, 0, 300)  # 300 needs two varint bytes
    op_msg = [v for f, _, v in fields if f == 5][0]
    befores = [v for f, _, v in decode_message(op_msg) if f == 6]
    assert len(befores) == 2  # repeated field, sorted by column name


def test_spark_protobuf_pipeline(spark):
    ts = datetime.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        (1002, 1000, 0, ts, 1, "3.7.42", "DB", "c", "USR", "T1", 5001,
         "rid1", None, {"ID": "1"}, {}, 1, 0),
        (1003, 1000, 0, ts, 1, "3.7.42", "DB", "u", "USR", "T1", 5001,
         "rid1", {"ID": "1"}, {"ID": "2"}, {}, 2, 0),
    ]
    df = spark.createDataFrame(rows, CHANGE_EVENT_SCHEMA)
    out = build_protobuf_events(df).collect()
    assert len(out) == 2
    for r in out:
        fields = dict((f, v) for f, _, v in decode_message(bytes(r.value)))
        assert fields[3] == b"3.7.42"
        assert fields[1] in (1002, 1003)
        assert fields[2] == 1704110400000000
