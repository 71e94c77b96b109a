"""Catalog-driven typed decode: COLTYPE codes → Spark types."""

from __future__ import annotations

import datetime
from decimal import Decimal

from openlogreplicator_spark.metadata.typed_decode import (
    decode_table_events,
    typed_image,
)


def test_typed_image_casts(spark):
    events = spark.createDataFrame(
        [
            (18, {"ID": "42", "PRICE": "123.45", "NAME": "x",
                  "TS": "2024-01-01 12:30:00", "RAWC": "0a0b",
                  "OK": "true", "F4": "1.5"}),
            (18, {"ID": "7", "PRICE": None, "NAME": None,
                  "TS": None, "RAWC": None, "OK": "false", "F4": "-2.25"}),
        ],
        "obj long, after map<string,string>",
    )
    columns = [
        {"col": 0, "name": "ID", "type": 2, "precision": 10, "scale": 0},
        {"col": 1, "name": "PRICE", "type": 2, "precision": 12, "scale": 2},
        {"col": 2, "name": "NAME", "type": 1},
        {"col": 3, "name": "TS", "type": 180},
        {"col": 4, "name": "RAWC", "type": 23},
        {"col": 5, "name": "OK", "type": 252},
        {"col": 6, "name": "F4", "type": 101},
    ]
    out = typed_image(events, columns)
    types = dict(out.dtypes)
    assert types["ID"] == "decimal(10,0)"
    assert types["PRICE"] == "decimal(12,2)"
    assert types["TS"] == "timestamp_ntz"
    assert types["RAWC"] == "binary"
    assert types["OK"] == "boolean"
    assert types["F4"] == "double"
    rows = {int(r.ID): r for r in out.collect()}
    assert rows[42].PRICE == Decimal("123.45")
    assert rows[42].TS == datetime.datetime(2024, 1, 1, 12, 30)
    assert bytes(rows[42].RAWC) == b"\x0a\x0b"
    assert rows[42].OK is True and rows[7].OK is False
    assert rows[7].PRICE is None and rows[7].NAME is None
    assert rows[7].F4 == -2.25


def test_decode_table_events_filters_by_obj(spark):
    events = spark.createDataFrame(
        [(18, {"A": "1"}), (19, {"A": "2"})],
        "obj long, after map<string,string>",
    )
    dict_col = spark.createDataFrame(
        [(18, 0, "A", 2, 5, 0, None)],
        "obj long, col int, name string, type int, precision int, scale int, property long",
    )
    out = decode_table_events(events, dict_col, obj=18).collect()
    assert len(out) == 1 and out[0].A == Decimal("1")
