"""Protobuf change-event builder (reference B2, BuilderProtobuf.{h,cpp}).

The environment has no protobuf runtime or spark-protobuf jar, so this
implements the protobuf *wire format* directly (varint/length-delimited
encoding is ~40 lines) for a message shaped like the reference's
``OraProtoBuf.proto``:

    message RedoResponse/Payload (subset, field numbers below):
      uint64 scn = 1;          // varint
      uint64 tm  = 2;          // varint (unix micros)
      string xid = 3;          // length-delimited
      string db  = 4;
      repeated Op payload = 5; // nested message
    message Op:
      string op    = 1;        // c|u|d|begin|commit|ddl
      string owner = 2;
      string table = 3;
      uint64 obj   = 4;
      string rid   = 5;
      repeated Col before = 6;
      repeated Col after  = 7;
    message Col:
      string name  = 1;
      string value = 2;

Encoding runs in an Arrow-batched pandas UDF (binary out); the decoder in
tests is an independent hand-written wire-format parser, so the golden
tests verify actual protobuf framing, not just round-tripping one
implementation against itself.
"""

from __future__ import annotations

from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _varint(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _key(field: int, wire: int) -> bytes:
    return _varint((field << 3) | wire)


def _ld(field: int, payload: bytes) -> bytes:
    return _key(field, 2) + _varint(len(payload)) + payload


def _vi(field: int, value: int) -> bytes:
    return _key(field, 0) + _varint(value)


def _s(field: int, value: str | None) -> bytes:
    if value is None:
        return b""
    return _ld(field, value.encode("utf-8"))


def encode_col(name: str, value: str | None) -> bytes:
    return _s(1, name) + (_s(2, value) if value is not None else b"")


def encode_op(op: dict[str, Any]) -> bytes:
    out = _s(1, op.get("op"))
    out += _s(2, op.get("owner"))
    out += _s(3, op.get("table"))
    if op.get("obj") is not None:
        out += _vi(4, int(op["obj"]))
    out += _s(5, op.get("rid"))
    for fnum, img in ((6, op.get("before")), (7, op.get("after"))):
        for k in sorted((img or {})):
            out += _ld(fnum, encode_col(k, img[k]))
    return out


def encode_event(ev: dict[str, Any]) -> bytes:
    out = _vi(1, int(ev["scn"])) if ev.get("scn") is not None else b""
    if ev.get("tm_micros") is not None:
        out += _vi(2, int(ev["tm_micros"]))
    out += _s(3, ev.get("xid"))
    out += _s(4, ev.get("db"))
    out += _ld(5, encode_op(ev))
    return out


def build_protobuf_events(events: DataFrame) -> DataFrame:
    """CHANGE_EVENT_SCHEMA rows → (key, value binary) protobuf messages."""
    prepared = events.select(
        F.col("xid").alias("key"),
        F.struct(
            "scn",
            F.unix_micros(F.col("tm").cast("timestamp")).alias("tm_micros"),
            "xid",
            "db",
            "op",
            "owner",
            "table",
            "obj",
            "rid",
            "before",
            "after",
        ).alias("ev"),
    )

    from pyspark.sql.pandas.functions import pandas_udf

    @pandas_udf("binary")
    def enc(col: "pd.DataFrame") -> "pd.Series":
        # a StructType argument arrives as a pandas DataFrame (one column
        # per struct field); maps arrive as list-of-(k,v) tuples
        out = []
        for d in col.to_dict("records"):
            for img in ("before", "after"):
                v = d.get(img)
                if v is None or (isinstance(v, float) and pd.isna(v)):
                    d[img] = None
                elif not isinstance(v, dict):
                    d[img] = dict(v)
            for f in ("scn", "tm_micros", "obj"):
                if d.get(f) is not None and pd.isna(d[f]):
                    d[f] = None
            out.append(encode_event(d))
        return pd.Series(out)

    return prepared.select("key", enc("ev").alias("value"))


# --- independent wire-format decoder (tests only) -------------------------


def decode_message(buf: bytes) -> list[tuple[int, int, Any]]:
    """Parse one protobuf message into (field, wire_type, value) triples."""
    out: list[tuple[int, int, Any]] = []
    i = 0

    def read_varint() -> int:
        nonlocal i
        shift = 0
        val = 0
        while True:
            b = buf[i]
            i += 1
            val |= (b & 0x7F) << shift
            if not b & 0x80:
                return val
            shift += 7

    while i < len(buf):
        tag = read_varint()
        field, wire = tag >> 3, tag & 0x7
        if wire == 0:
            out.append((field, 0, read_varint()))
        elif wire == 2:
            ln = read_varint()
            out.append((field, 2, bytes(buf[i: i + ln])))
            i += ln
        else:
            raise ValueError(f"unexpected wire type {wire}")
    return out
