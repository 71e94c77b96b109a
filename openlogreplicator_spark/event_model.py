"""Canonical schemas for the CDC data plane.

Reference data model:
- change event:  src/builder/BuilderJson.cpp:452-712, proto/OraProtoBuf.proto:27-35
- redo record:   src/common/RedoLogRecord.h:33-151, dispatch Parser.cpp:310-576
- dictionary:    src/common/table/SysObj.h / SysCol.h / SysTab.h / SysUser.h
"""

from __future__ import annotations

from pyspark.sql import types as T

# Logical change event — one row per begin/commit/c/u/d/ddl/chkpt.
CHANGE_EVENT_SCHEMA = T.StructType(
    [
        T.StructField("scn", T.LongType()),          # record SCN
        T.StructField("c_scn", T.LongType()),        # checkpoint SCN
        T.StructField("c_idx", T.LongType()),        # checkpoint index
        T.StructField("tm", T.TimestampType()),      # event time
        T.StructField("seq", T.LongType()),          # redo log sequence
        T.StructField("xid", T.StringType()),        # usn.slt.sqn text
        T.StructField("db", T.StringType()),
        T.StructField("op", T.StringType()),         # begin|commit|c|u|d|ddl|chkpt
        T.StructField("owner", T.StringType()),
        T.StructField("table", T.StringType()),
        T.StructField("obj", T.LongType()),          # dictionary object id
        T.StructField("rid", T.StringType()),        # 18-char Oracle ROWID
        T.StructField("before", T.MapType(T.StringType(), T.StringType())),
        T.StructField("after", T.MapType(T.StringType(), T.StringType())),
        T.StructField("attrs", T.MapType(T.StringType(), T.StringType())),
        T.StructField("num", T.LongType()),          # position within transaction
        T.StructField("offset", T.LongType()),       # file offset
    ]
)

# Pre-decode redo record (FIXTURES.md group C) — transaction-assembly input.
# Ordering key is (scn, subscn, block, offset) per Parser.h:46-60.
REDO_RECORD_SCHEMA = T.StructType(
    [
        T.StructField("scn", T.LongType()),
        T.StructField("subscn", T.IntegerType()),
        T.StructField("block", T.LongType()),
        T.StructField("offset", T.IntegerType()),
        T.StructField("seq", T.LongType()),
        T.StructField("xid", T.StringType()),
        T.StructField("opcode", T.StringType()),   # begin|commit|rollback|prollback|
                                                   # insert|delete|update|overwrite|
                                                   # qmi|qmd|ddl|attr
        T.StructField("obj", T.LongType()),
        T.StructField("bdba", T.LongType()),       # row address — prollback match key
        T.StructField("slot", T.IntegerType()),
        T.StructField("fb", T.IntegerType()),      # chained-row piece flags
        T.StructField("cols", T.MapType(T.StringType(), T.StringType())),
        T.StructField("rows", T.ArrayType(T.MapType(T.StringType(), T.StringType()))),
    ]
)

# Versioned dictionary tables (FIXTURES.md group D) — as-of join input.
DICT_OBJ_SCHEMA = T.StructType(
    [
        T.StructField("obj", T.LongType()),
        T.StructField("dataobj", T.LongType()),
        T.StructField("owner_id", T.LongType()),
        T.StructField("name", T.StringType()),
        T.StructField("type", T.StringType()),
        T.StructField("scn_from", T.LongType()),
        T.StructField("dropped", T.BooleanType()),
    ]
)

DICT_COL_SCHEMA = T.StructType(
    [
        T.StructField("obj", T.LongType()),
        T.StructField("col", T.IntegerType()),
        T.StructField("segcol", T.IntegerType()),
        T.StructField("intcol", T.IntegerType()),
        T.StructField("name", T.StringType()),
        T.StructField("type", T.IntegerType()),    # SysCol COLTYPE codes
        T.StructField("length", T.IntegerType()),
        T.StructField("precision", T.IntegerType()),
        T.StructField("scale", T.IntegerType()),
        T.StructField("charsetid", T.LongType()),
        T.StructField("nullable", T.BooleanType()),
        T.StructField("numpk", T.IntegerType()),
        T.StructField("property", T.LongType()),   # hidden/guard/unused bits
        T.StructField("scn_from", T.LongType()),
    ]
)

# Session attribute keys (subset) — reference src/common/Attribute.h:32-66.
ATTRIBUTE_KEYS = (
    "LOGIN_USER_NAME",
    "OS_USER_NAME",
    "MACHINE_NAME",
    "TRANSACTION_NAME",
    "CLIENT_ID",
    "SESSION_ID",
)
