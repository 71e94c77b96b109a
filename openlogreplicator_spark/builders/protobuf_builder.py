"""Protobuf change-event builder (reference B2, BuilderProtobuf.{h,cpp}).

The environment has no protobuf runtime or spark-protobuf jar, so this
implements the protobuf *wire format* directly (varint/length-delimited
encoding is ~40 lines), matching the reference's ``proto/OraProtoBuf.proto``
field numbers and types exactly so consumers of the reference protocol
(e.g. the Debezium connector that embeds this proto) can decode it:

    message RedoResponse:                      // OraProtoBuf.proto:143
      ResponseCode code = 1;   // varint enum (0 = READY, default: absent)
      uint64 scn  = 2;         // varint (oneof scn_val)
      uint64 tm   = 4;         // varint, unix micros (oneof tm_val)
      string xid  = 6;         // length-delimited (oneof xid_val)
      string db   = 8;
      repeated Payload payload = 9;
      uint64 c_scn = 10;  uint64 c_idx = 11;
    message Payload:                           // OraProtoBuf.proto:109
      Op op = 1;               // enum BEGIN 0 COMMIT 1 INSERT 2
                               //      UPDATE 3 DELETE 4 DDL 5 CHKPT 6
      Schema schema = 2;       // {owner=1, name=2, obj=3}
      string rid = 3;
      repeated Value before = 4;
      repeated Value after  = 5;
      string ddl = 6;  uint64 num = 10;
    message Value:                             // OraProtoBuf.proto:82
      string name = 1;  string value_string = 5;  // oneof datum

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
    # protobuf encodes negative int64 as the two's-complement uint64
    # (a 10-byte varint). Without the mask, Python's arithmetic shift
    # never zeroes a negative n — an infinite loop, found when the
    # first change stream with scn 0 produced c_scn = -5.
    if n < 0:
        n &= (1 << 64) - 1
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


# Op enum values, OraProtoBuf.proto:28-36
OP_ENUM = {"begin": 0, "commit": 1, "c": 2, "u": 3, "d": 4, "ddl": 5,
           "chkpt": 6}


def encode_value(name: str, value: str | None) -> bytes:
    """pb::Value — name=1, value_string=5 (null column: datum omitted,
    matching the reference's columnNull which sets only the name)."""
    return _s(1, name) + (_s(5, value) if value is not None else b"")


# SysCol COLTYPE code → pb::ColumnType enum (OraProtoBuf.proto:37-56,
# switch in BuilderProtobuf.h:234-318)
_PB_COLTYPE = {
    1: 1,    # VARCHAR → VARCHAR2
    2: 2,    # NUMBER
    8: 3,    # LONG
    12: 4,   # DATE
    23: 5,   # RAW
    24: 6,   # LONG_RAW
    96: 7,   # CHAR
    100: 8,  # FLOAT → BINARY_FLOAT
    101: 9,  # DOUBLE → BINARY_DOUBLE
    112: 10,  # CLOB
    113: 11,  # BLOB
    180: 12,  # TIMESTAMP
    181: 13,  # TIMESTAMP_WITH_TZ
    182: 14,  # INTERVAL_YEAR_TO_MONTH
    183: 15,  # INTERVAL_DAY_TO_SECOND
    208: 16,  # UROWID
    231: 17,  # TIMESTAMP_WITH_LOCAL_TZ
}
# pb enums whose reference case also sets length (BuilderProtobuf.h)
_PB_WITH_LENGTH = {1, 5, 7, 12, 13, 14, 15, 16, 17}


def encode_column_desc(c: dict[str, Any]) -> bytes:
    """pb::Column — name=1, type=2, length=3, precision=4, scale=5,
    nullable=6 (proto3: zero/false values are omitted on the wire).
    NUMBER carries precision+scale, the string/time/raw families carry
    length, exactly the reference's per-type switch
    (BuilderProtobuf.h:234-318); unmapped type codes → UNKNOWN(0)."""
    out = _s(1, c.get("name"))
    t = _PB_COLTYPE.get(int(c.get("type") or 0), 0)
    if t:
        out += _vi(2, t)
    if t in _PB_WITH_LENGTH and c.get("length"):
        out += _vi(3, int(c["length"]))
    if t == 2:  # NUMBER
        if c.get("precision"):
            out += _vi(4, int(c["precision"]))
        if c.get("scale"):
            out += _vi(5, int(c["scale"]))
    if c.get("nullable"):
        out += _vi(6, 1)
    return out


def encode_schema(op: dict[str, Any]) -> bytes:
    """pb::Schema — owner=1, name=2, obj=3, repeated column=6 (the
    SCHEMA_FORMAT::FULL descriptors; REPEATED re-emits them per op).
    Fidelity note: the reference's loop calls ``add_column()`` ONCE and
    then overwrites that single Column message per iteration
    (BuilderProtobuf.h:225-226), so its wire output carries only the
    LAST column's descriptor — an upstream defect; this builder emits
    one Column entry per column, the proto's evident intent and the
    JSON builder's behavior."""
    out = _s(1, op.get("owner"))
    out += _s(2, op.get("table"))
    if op.get("obj") is not None:
        out += _vi(3, int(op["obj"]))
    for c in op.get("schema_cols") or ():
        out += _ld(6, encode_column_desc(c))
    return out


def encode_payload(
    op: dict[str, Any],
    *,
    legacy: bool = True,
    add_sequences: bool = False,
    rid_skip: bool = False,
) -> bytes:
    """pb::Payload — op enum=1, schema=2, rid=3, before*=4, after*=5,
    ddl=6, seq=7, offset=8, redo=9, num=10.

    ``legacy`` (no Format supplied) keeps the original self-describing
    encoding: rid/seq/offset/num always present. With a Format the
    reference's exact field discipline applies (BuilderProtobuf.{h,cpp}):
    DML payloads carry NO seq/offset (those are CHKPT-payload fields,
    processCheckpoint:326-331, together with the ``redo`` bool), ``num``
    only under MESSAGE_FORMAT::ADD_SEQUENCES (appendRowid,
    BuilderProtobuf.h:82-83), ``rid`` only when RID_FORMAT != SKIP."""
    out = b""
    opcode = OP_ENUM.get(op.get("op") or "", None)
    if opcode:  # proto3 omits the 0 (BEGIN) default
        out += _vi(1, opcode)
    schema = encode_schema(op)
    if schema:
        out += _ld(2, schema)
    if not rid_skip:
        out += _s(3, op.get("rid"))
    for fnum, img in ((4, op.get("before")), (5, op.get("after"))):
        for k in sorted(img or {}):
            out += _ld(fnum, encode_value(k, img[k]))
    if op.get("ddl") is not None:
        out += _s(6, op["ddl"])
    is_chkpt = op.get("op") == "chkpt"
    if (legacy or is_chkpt) and op.get("seq"):
        out += _vi(7, int(op["seq"]))
    if (legacy or is_chkpt) and op.get("offset"):
        out += _vi(8, int(op["offset"]))
    if is_chkpt and op.get("redo"):
        out += _vi(9, 1)
    if (legacy or add_sequences) and op.get("num") is not None:
        out += _vi(10, int(op["num"]))
    return out


def encode_header(ev: dict[str, Any]) -> bytes:
    """pb::RedoResponse header prefix — code=1 (always PAYLOAD=5 on data
    messages, BuilderProtobuf.h:98), scn=2 / scns=3, tm=4 / tms=5,
    xid=6 / xidn=7, db=8 (everything the reference's appendHeader writes
    before the payloads, BuilderProtobuf.h:95-190).

    The oneof alternates come pre-rendered by build_protobuf_events when
    a Format is supplied: ``scns`` (16 lowercase hex, no 0x —
    numToString), ``tms`` (string unix or bare ISO8601+Z), ``xidn``
    (packed 64-bit)."""
    out = _vi(1, 5)  # ResponseCode::PAYLOAD
    if ev.get("scns") is not None:
        out += _s(3, ev["scns"])
    elif ev.get("scn") is not None:
        out += _vi(2, int(ev["scn"]))
    if ev.get("tms") is not None:
        out += _s(5, ev["tms"])
    elif ev.get("tm_micros") is not None:
        out += _vi(4, int(ev["tm_micros"]))
    if ev.get("xidn") is not None:
        out += _vi(7, int(ev["xidn"]))
    else:
        out += _s(6, ev.get("xid"))
    out += _s(8, ev.get("db"))
    return out


def encode_suffix(ev: dict[str, Any]) -> bytes:
    """Trailing RedoResponse fields after the payloads — c_scn=10,
    c_idx=11 (proto3 omits falsy values)."""
    out = b""
    if ev.get("c_scn"):
        out += _vi(10, int(ev["c_scn"]))
    if ev.get("c_idx"):
        out += _vi(11, int(ev["c_idx"]))
    return out


def encode_event(
    ev: dict[str, Any],
    *,
    legacy: bool = True,
    add_sequences: bool = False,
    rid_skip: bool = False,
) -> bytes:
    """pb::RedoResponse with one Payload: header ‖ payload=9 ‖ suffix."""
    return (
        encode_header(ev)
        + _ld(
            9,
            encode_payload(
                ev,
                legacy=legacy,
                add_sequences=add_sequences,
                rid_skip=rid_skip,
            ),
        )
        + encode_suffix(ev)
    )


def _normalize_record(d: dict[str, Any]) -> dict[str, Any]:
    """Arrow→pandas cleanup shared by the encoder UDFs: map columns
    arrive as list-of-(k,v) tuples, absent numerics as NaN floats."""
    for img in ("before", "after"):
        v = d.get(img)
        if v is None or (isinstance(v, float) and pd.isna(v)):
            d[img] = None
        elif not isinstance(v, dict):
            d[img] = dict(v)
    for f in ("scn", "c_scn", "c_idx", "tm_micros", "seq", "obj",
              "num", "offset", "xidn"):
        if d.get(f) is not None and pd.isna(d[f]):
            d[f] = None
    for f in ("scns", "tms", "xid"):
        v = d.get(f)
        if isinstance(v, float) and pd.isna(v):
            d[f] = None
    sc = d.get("schema_cols")
    if sc is None or (isinstance(sc, float) and pd.isna(sc)):
        d["schema_cols"] = None
    else:  # Arrow list<struct> → make each descriptor a plain dict
        d["schema_cols"] = [
            c if isinstance(c, dict) else dict(c) for c in sc
        ]
    return d


def build_protobuf_events(
    events: DataFrame,
    extra_cols: tuple[str, ...] = (),
    fmt=None,
    max_message_bytes: int | None = None,
    dict_cols: DataFrame | None = None,
) -> DataFrame:
    """CHANGE_EVENT_SCHEMA rows → (key, value binary) protobuf messages.
    ``extra_cols`` pass through unencoded (e.g. the network sink's
    ordering watermark), preserving row order.

    With ``fmt.message == MessageFormat.FULL`` one RedoResponse carries
    the whole transaction as repeated Payload entries (field 9), built
    through the same appendHeader path (BuilderProtobuf.h:95-190);
    ``max_message_bytes`` then applies the byte-true T6 split
    (Builder.h:167, Transaction.cpp:519-538): greedy packing of encoded
    Payload wire bytes against the cap, messages keyed 'xid:part'.

    ``dict_cols`` (DICT_COL_SCHEMA rows) + ``fmt.schema`` FULL/REPEATED
    render pb::Schema column descriptors (repeated Column field 6,
    BuilderProtobuf.h:218-322): FULL once per (transaction, table) —
    the JSON builder's convention for the reference's per-builder
    `tables` memo — REPEATED on every op. The dictionary broadcasts
    (catalog-scale) onto the event stream keyed by obj.

    ``fmt`` (a :class:`~openlogreplicator_spark.config.Format`) enables
    the reference's protobuf header toggles (BuilderProtobuf.h:95-190):
    SCN_FORMAT::TEXT_HEX → ``scns`` (16 hex chars, unprefixed —
    numToString), XID_FORMAT hex/numeric → rendered ``xid`` / packed
    ``xidn``, and the TIMESTAMP_FORMAT switch — numeric UNIX variants
    scale the SECOND-resolution epoch into ``tm`` (the reference's
    toEpoch truncation; fidelity note: the reference's clock is
    second-resolution in BOTH builders — this repo's JSON builder
    deliberately renders true sub-second values (config.py's
    TimestampFormat note), while the protobuf side follows the
    reference's time_t arithmetic exactly, so the same deployment sees
    sub-second tm under JSON and second-truncated tm under protobuf),
    UNIX_*_STRING render it into ``tms``, bare
    ISO8601 renders "YYYY-MM-DDTHH:MM:SSZ" into ``tms``, and every
    other ISO variant emits NO timestamp (the reference's `default:
    break`). Without ``fmt`` the legacy self-describing header is kept:
    decimal scn, true-microsecond tm, text xid."""
    from openlogreplicator_spark.config import RidFormat, ScnFormat, XidFormat
    from openlogreplicator_spark.config import TimestampFormat as TF

    legacy = fmt is None
    add_seqs = False if fmt is None else bool(fmt.add_sequences)
    rid_skip = fmt is not None and fmt.rid == RidFormat.SKIP
    null_s = F.lit(None).cast("string")
    null_l = F.lit(None).cast("long")
    scns = null_s
    tms = null_s
    xidn = null_l
    xid_out = F.col("xid")
    tm_col = F.col("tm").cast("timestamp")
    if fmt is not None and fmt.host_tz_seconds:
        # Time::toEpoch(hostTimezone) — BuilderProtobuf.h:96
        tm_col = F.timestamp_add(
            "SECOND", F.lit(-fmt.host_tz_seconds), tm_col
        )
    tm_micros = F.unix_micros(tm_col)
    if fmt is not None:
        if fmt.scn == ScnFormat.HEX:
            scns = F.lpad(F.lower(F.hex(F.col("scn"))), 16, "0")
        sec = F.unix_timestamp(tm_col)
        num_scale = {
            TF.UNIX_NANO: 1_000_000_000,
            TF.UNIX_MICRO: 1_000_000,
            TF.UNIX_MILLI: 1_000,
            TF.UNIX_SEC: 1,
        }
        str_scale = {
            TF.UNIX_NANO_STRING: 1_000_000_000,
            TF.UNIX_MICRO_STRING: 1_000_000,
            TF.UNIX_MILLI_STRING: 1_000,
            TF.UNIX_STRING: 1,
        }
        if fmt.timestamp in num_scale:
            tm_micros = sec * num_scale[fmt.timestamp]
        elif fmt.timestamp in str_scale:
            tm_micros = null_l
            tms = (sec * str_scale[fmt.timestamp]).cast("string")
        elif fmt.timestamp == TF.ISO8601:
            tm_micros = null_l
            tms = F.date_format(tm_col, "yyyy-MM-dd'T'HH:mm:ss'Z'")
        else:  # other ISO variants: reference emits no timestamp
            tm_micros = null_l
        if fmt.xid == XidFormat.NUMERIC:
            parts = F.split(F.col("xid"), r"\.")
            xidn = (
                F.shiftleft(F.element_at(parts, 1).cast("long"), 48)
                + F.shiftleft(F.element_at(parts, 2).cast("long"), 32)
                + F.element_at(parts, 3).cast("long")
            )
            xid_out = null_s
        elif fmt.xid == XidFormat.TEXT_HEX:
            # format_string pads like the reference's setw but never
            # truncates a wider value (lpad would corrupt e.g. a 4-hex
            # slt into 3 characters)
            parts = F.split(F.col("xid"), r"\.")
            # guard the null xid: format_string renders null args as the
            # literal 'null' instead of propagating NULL
            xid_out = F.when(
                F.col("xid").isNotNull(),
                F.format_string(
                    "0x%04x.%03x.%08x",
                    F.element_at(parts, 1).cast("long"),
                    F.element_at(parts, 2).cast("long"),
                    F.element_at(parts, 3).cast("long"),
                ),
            )
        elif fmt.xid == XidFormat.TEXT_REVERSED:
            # BuilderProtobuf.h:182-185: plain zero-padded hex16 of the
            # packed 64-bit xid (the JSON builder's byte-pair shuffle is
            # a BuilderJson-only rendering)
            parts = F.split(F.col("xid"), r"\.")
            packed = (
                F.shiftleft(F.element_at(parts, 1).cast("long"), 48)
                + F.shiftleft(F.element_at(parts, 2).cast("long"), 32)
                + F.element_at(parts, 3).cast("long")
            )
            xid_out = F.when(
                F.col("xid").isNotNull(),
                F.lpad(F.lower(F.hex(packed)), 16, "0"),
            )
    # DB_FORMAT gate (r12 review pass): the reference's appendHeader
    # writes set_db only under showDb = isDbFormatAddDml() (ADD_DDL for
    # DDL messages) — BuilderProtobuf.h:189-190, BuilderProtobuf.cpp:
    # 104-292 — the same toggle the JSON builder's _db_expr honors.
    # Unconditionally emitting field 8 made one deployment's two
    # builders disagree about DB_FORMAT::DEFAULT.
    db_out = F.col("db")
    if fmt is not None:
        from openlogreplicator_spark.config import DbFormat as _DbF

        if fmt.db == _DbF.DEFAULT:
            db_out = null_s
        elif fmt.db == _DbF.ADD_DML:
            db_out = F.when(F.col("op") != "ddl", F.col("db"))
        elif fmt.db == _DbF.ADD_DDL:
            db_out = F.when(F.col("op") == "ddl", F.col("db"))

    from pyspark.sql.pandas.functions import pandas_udf

    from openlogreplicator_spark.config import MessageFormat, SchemaFormat

    _COLS_T = (
        "array<struct<col:int,name:string,type:int,length:int,"
        "precision:int,scale:int,nullable:boolean>>"
    )
    with_schema = (
        dict_cols is not None
        and fmt is not None
        and fmt.schema in (SchemaFormat.FULL, SchemaFormat.REPEATED)
    )
    if with_schema:
        from openlogreplicator_spark.metadata.schema_registry import (
            latest_columns,
        )

        dict_cols = latest_columns(dict_cols)
        meta = dict_cols.groupBy("obj").agg(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        "col", "name", "type", "length", "precision",
                        "scale", "nullable",
                    )
                )
            ).alias("_all_cols")
        )
        events = events.join(F.broadcast(meta), "obj", "left")
        if fmt.schema == SchemaFormat.FULL:
            from pyspark.sql import Window

            w = Window.partitionBy("xid", "obj").orderBy("num")
            events = events.withColumn(
                "schema_cols",
                F.when(F.row_number().over(w) == 1, F.col("_all_cols")),
            ).drop("_all_cols")
        else:
            events = events.withColumnRenamed("_all_cols", "schema_cols")
    else:
        events = events.withColumn(
            "schema_cols", F.lit(None).cast(_COLS_T)
        )

    if fmt is not None and fmt.message == MessageFormat.FULL:
        from openlogreplicator_spark.builders.split import (
            chunk_by_parts,
            greedy_parts,
        )

        # a FULL envelope is a TRANSACTION message: the reference stamps
        # its single header with the ADD_DML bit (format-level, like the
        # JSON builder's full_message gate) — never per-payload-row
        from openlogreplicator_spark.config import DbFormat as _DbF

        db_full = (
            F.col("db")
            if fmt.db in (_DbF.ALL, _DbF.ADD_DML)
            else null_s
        )
        hdr_struct = F.struct(
            "scn",
            scns.alias("scns"),
            "c_scn",
            "c_idx",
            tm_micros.alias("tm_micros"),
            tms.alias("tms"),
            xid_out.alias("xid"),
            xidn.alias("xidn"),
            db_full.alias("db"),
        )
        op_struct = F.struct(
            "op", "owner", "table", "obj", "rid", "before", "after",
            "seq", "offset", "num", "schema_cols",
        )

        @pandas_udf("binary")
        def enc_op(col: "pd.DataFrame") -> "pd.Series":
            # one framed `payload` entry (field 9) per op
            return pd.Series(
                [
                    _ld(
                        9,
                        encode_payload(
                            _normalize_record(d),
                            legacy=False,
                            add_sequences=add_seqs,
                            rid_skip=rid_skip,
                        ),
                    )
                    for d in col.to_dict("records")
                ]
            )

        @pandas_udf("prefix binary, suffix binary")
        def enc_env(col: "pd.DataFrame") -> "pd.DataFrame":
            recs = [_normalize_record(d) for d in col.to_dict("records")]
            return pd.DataFrame(
                {
                    "prefix": [encode_header(d) for d in recs],
                    "suffix": [encode_suffix(d) for d in recs],
                }
            )

        per_event = events.select(
            *extra_cols,
            "xid",
            "num",
            hdr_struct.alias("hdr"),
            enc_op(op_struct).alias("p"),
        ).withColumn("sz", F.octet_length("p").cast("long"))
        aggs = [
            F.min_by("hdr", "num").alias("hdr"),
            F.array_sort(
                F.collect_list(F.struct("num", "p", "sz")),
                lambda l, r: F.when(l["num"] < r["num"], -1)
                .when(l["num"] > r["num"], 1)
                .otherwise(0),
            ).alias("items"),
        ] + [F.min(c).alias(c) for c in extra_cols]
        grouped = per_event.groupBy("xid").agg(*aggs).withColumn(
            "env", enc_env("hdr")
        )
        hdr_sz = F.octet_length("env.prefix") + F.octet_length("env.suffix")

        def concat_ops(chunk):
            return F.aggregate(chunk, F.lit(b""), lambda a, x: F.concat(a, x))
        if max_message_bytes:
            parts = greedy_parts(F.col("items"), max_message_bytes, hdr_sz)
            chunks = chunk_by_parts(F.col("items"), parts)
            exploded = grouped.select(
                *extra_cols, "xid", "env", F.explode(chunks).alias("pc")
            )
            return exploded.select(
                *extra_cols,
                F.concat_ws(":", "xid", "pc.part").alias("key"),
                F.concat(
                    F.col("env.prefix"),
                    concat_ops(F.col("pc.chunk")),
                    F.col("env.suffix"),
                ).alias("value"),
            )
        return grouped.select(
            *extra_cols,
            F.col("xid").alias("key"),
            F.concat(
                F.col("env.prefix"),
                concat_ops(F.transform("items", lambda s: s["p"])),
                F.col("env.suffix"),
            ).alias("value"),
        )

    prepared = events.select(
        *extra_cols,
        F.col("xid").alias("key"),
        F.struct(
            "scn",
            scns.alias("scns"),
            "c_scn",
            "c_idx",
            tm_micros.alias("tm_micros"),
            tms.alias("tms"),
            "seq",
            xid_out.alias("xid"),
            xidn.alias("xidn"),
            db_out.alias("db"),
            "op",
            "owner",
            "table",
            "obj",
            "rid",
            "before",
            "after",
            "num",
            "offset",
            "schema_cols",
        ).alias("ev"),
    )

    @pandas_udf("binary")
    def enc(col: "pd.DataFrame") -> "pd.Series":
        # a StructType argument arrives as a pandas DataFrame (one column
        # per struct field); maps arrive as list-of-(k,v) tuples
        return pd.Series(
            [
                encode_event(
                    _normalize_record(d),
                    legacy=legacy,
                    add_sequences=add_seqs,
                    rid_skip=rid_skip,
                )
                for d in col.to_dict("records")
            ]
        )

    return prepared.select(
        *extra_cols, "key", enc("ev").alias("value")
    )


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
