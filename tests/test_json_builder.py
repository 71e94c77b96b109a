"""Golden JSON output for the event builder's format-toggle matrix."""

from __future__ import annotations

import datetime
import json

import pytest

from openlogreplicator_spark.config import (
    ColumnFormat,
    Format,
    MessageFormat,
    ScnFormat,
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
    assert v["scn"].startswith("0x00000000000003e")
    assert v["xid"] == (3 << 48) + (7 << 32) + 42

    hexfmt = Format(xid=XidFormat.TEXT_HEX)
    v2 = json.loads(build_events(events_df, hexfmt).collect()[0].value)
    assert v2["xid"] == "0x3.7.2a"


def test_timestamp_formats(events_df):
    for tf, expect in [
        (TimestampFormat.UNIX_MICRO, 1704110400000000),
        (TimestampFormat.UNIX_MILLI, 1704110400000),
        (TimestampFormat.UNIX_SEC, 1704110400),
        (TimestampFormat.ISO8601, "2024-01-01T12:00:00.000000Z"),
    ]:
        v = json.loads(
            build_events(events_df, Format(timestamp=tf)).collect()[0].value
        )
        assert v["tm"] == expect, tf


def test_skip_begin_commit_and_attrs(events_df):
    fmt = Format(skip_begin=True, skip_commit=True, attributes=True)
    out = [json.loads(r.value) for r in build_events(events_df, fmt).collect()]
    assert {v["payload"][0]["op"] for v in out} == {"c", "u"}


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
