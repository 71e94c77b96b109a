"""JSON change-event builder — the reference's BuilderJson re-expressed as
column expressions (src/builder/BuilderJson.{h,cpp}, toggles Format.h).

Each Format toggle selects a Catalyst expression; the message itself is
`to_json(struct(...))`, so serialization happens JVM-side in one codegen
stage. MESSAGE_FORMAT::FULL (one message per transaction) becomes a
groupBy(xid) + ordered collect_list — the only shuffle in the builder.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from openlogreplicator_spark.config import (
    ColumnFormat,
    DbFormat,
    Format,
    MessageFormat,
    RidFormat,
    ScnFormat,
    ScnType,
    SchemaFormat,
    TimestampFormat,
    UnknownFormat,
    UnknownType,
    XidFormat,
)

# dictionary type codes the engine cannot decode to a value — the
# reference emits LONG / LONG RAW as unsupported (BuilderJson.h:445-448)
_UNSUPPORTED_COLTYPES = (8, 24)
# SysCol COLTYPE::JSON — raw-LOB passthrough behind EXPERIMENTAL_JSON
_JSON_COLTYPE = 119


def _shape_unknown(
    img: Column, fmt: Format, all_cols: Column | None = None
) -> Column:
    """UNKNOWN_TYPE / UNKNOWN_FORMAT shaping of one image against the
    dictionary's per-column type codes: HIDE drops unsupported-type
    columns; SHOW renders them as '?' (QUESTION_MARK) or hex (DUMP).
    JSON-typed (119) columns are their own case (Builder.cpp:154-158):
    with EXPERIMENTAL_JSON set, the LOB-assembled value passes through
    as raw hex (the reference's columnRaw); without the flag the column
    never emits. Fidelity note: the reference dumps Oracle's original
    byte image; this engine's parse plane has already decoded images to
    canonical strings, so DUMP/raw hex the decoded string's UTF-8 —
    same toggle surface, different byte source.

    ``all_cols`` is the dictionary array of {name, type} structs this
    image resolves against; it defaults to the builder's ``_all_cols``
    working column (the contract was previously implicit — r12
    review-pass-8)."""
    if all_cols is None:
        all_cols = F.col("_all_cols")
    tmap = F.map_from_entries(
        F.transform(
            all_cols,
            lambda c: F.struct(c["name"].alias("key"), c["type"].alias("value")),
        )
    )

    def unk(k: Column) -> Column:
        return F.coalesce(
            F.element_at(tmap, k).isin(*_UNSUPPORTED_COLTYPES), F.lit(False)
        )

    def is_json(k: Column) -> Column:
        return F.coalesce(
            F.element_at(tmap, k) == _JSON_COLTYPE, F.lit(False)
        )

    if fmt.experimental_json:
        img = F.map_from_entries(
            F.transform(
                F.map_entries(img),
                lambda e: F.struct(
                    e["key"].alias("key"),
                    F.when(
                        is_json(e["key"]) & e["value"].isNotNull(),
                        F.lower(F.hex(e["value"])),
                    )
                    .otherwise(e["value"])
                    .alias("value"),
                ),
            )
        )
    else:
        img = F.map_filter(img, lambda k, v: ~is_json(k))

    if fmt.unknown_type == UnknownType.HIDE:
        return F.map_filter(img, lambda k, v: ~unk(k))
    if fmt.unknown == UnknownFormat.DUMP:
        render = lambda v: F.lower(F.hex(v))  # noqa: E731
    else:
        render = lambda v: F.lit("?")  # noqa: E731
    return F.map_from_entries(
        F.transform(
            F.map_entries(img),
            lambda e: F.struct(
                e["key"].alias("key"),
                F.when(unk(e["key"]) & e["value"].isNotNull(), render(e["value"]))
                .otherwise(e["value"])
                .alias("value"),
            ),
        )
    )


def scn_expr(fmt: Format, col: str = "scn", apply_type: bool = True) -> Column:
    # SCN_TYPE::COMMIT_VALUE (BuilderJson.h:241-248): the header scn is
    # the transaction's commit/checkpoint SCN, not the op's record SCN.
    # apply_type=False for the b_scn/e_scn fields, which always show
    # their own SCN (BuilderJson.h:255-278).
    base = (
        F.coalesce(F.col("c_scn"), F.col(col))
        if apply_type and fmt.scn_type == ScnType.COMMIT_VALUE
        else F.col(col)
    )
    if fmt.scn == ScnFormat.HEX:
        return F.concat(F.lit("0x"), F.lpad(F.lower(F.hex(base)), 16, "0"))
    return base


def xid_expr(fmt: Format, col: str = "xid") -> Column:
    """xid arrives as 'usn.slt.sqn' text (Xid.h); render per XID_FORMAT."""
    parts = F.split(F.col(col), r"\.")
    usn = F.element_at(parts, 1).cast("long")
    slt = F.element_at(parts, 2).cast("long")
    sqn = F.element_at(parts, 3).cast("long")
    if fmt.xid == XidFormat.NUMERIC:
        return F.shiftleft(usn, 48) + F.shiftleft(slt, 32) + sqn
    if fmt.xid == XidFormat.TEXT_HEX:
        # fixed-width zero-padded 0x%04x.%03x.%08x — the reference's
        # appendHex4/appendHex3/appendHex8 emit EVERY nibble including
        # leading zeros (BuilderJson.h:301-305, 544-590; same layout as
        # Xid::toString, Xid.h:151-152). Unpadded hex diverged for any
        # component with a leading zero nibble (r12 review pass).
        return F.concat(
            F.lit("0x"),
            F.lpad(F.lower(F.hex(usn)), 4, "0"), F.lit("."),
            F.lpad(F.lower(F.hex(slt)), 3, "0"), F.lit("."),
            F.lpad(F.lower(F.hex(sqn)), 8, "0"),
        )
    if fmt.xid == XidFormat.TEXT_REVERSED:
        return reversed_hex16(F.shiftleft(usn, 48) + F.shiftleft(slt, 32) + sqn)
    return F.col(col)


def reversed_hex16(packed: Column) -> Column:
    """appendHex16Reversed (BuilderJson.h:630-663): hex16 of the packed
    64-bit xid with the byte PAIRS shuffled — output bytes in big-endian
    positions 1,0,3,2,7,6,5,4 (each byte's own nibbles in normal order).
    This is the Debezium preset's xid rendering."""
    h = F.lpad(F.lower(F.hex(packed)), 16, "0")
    return F.concat(
        F.substring(h, 3, 2), F.substring(h, 1, 2),
        F.substring(h, 7, 2), F.substring(h, 5, 2),
        F.substring(h, 15, 2), F.substring(h, 13, 2),
        F.substring(h, 11, 2), F.substring(h, 9, 2),
    )


def tm_field_name(fmt: Format) -> str:
    """BuilderJson.h:104: the numeric UNIX variants emit under "tm",
    every string-rendered variant (UNIX_*_STRING, ISO8601*) under
    "tms"."""
    tf = fmt.timestamp
    if tf in (
        TimestampFormat.UNIX_NANO,
        TimestampFormat.UNIX_MICRO,
        TimestampFormat.UNIX_MILLI,
        TimestampFormat.UNIX_SEC,
    ):
        return "tm"
    return "tms"


def tm_expr(fmt: Format, col="tm") -> Column:
    """The full 16-variant appendTimestamp matrix (BuilderJson.h:
    104-231). ``col`` is a column name or a prebuilt Column (the
    COMMIT_VALUE coalesce). NTZ parquet timestamps arrive as
    TIMESTAMP_NTZ; unix_* need TIMESTAMP (session TZ is UTC, so the
    cast is value-preserving)."""
    c = (col if isinstance(col, Column) else F.col(col)).cast("timestamp")
    if fmt.host_tz_seconds:
        # Time::toEpoch subtracts the host timezone from the redo
        # wall-clock before any rendering (Time.h:48-69)
        c = F.timestamp_add("SECOND", F.lit(-fmt.host_tz_seconds), c)
    tf = fmt.timestamp
    micros = F.unix_micros(c)
    if tf == TimestampFormat.UNIX_NANO:
        return micros * 1000
    if tf == TimestampFormat.UNIX_MICRO:
        return micros
    if tf == TimestampFormat.UNIX_MILLI:
        return (micros / 1000).cast("long")
    if tf == TimestampFormat.UNIX_SEC:
        return F.unix_timestamp(c)
    if tf == TimestampFormat.UNIX_NANO_STRING:
        return (micros * 1000).cast("string")
    if tf == TimestampFormat.UNIX_MICRO_STRING:
        return micros.cast("string")
    if tf == TimestampFormat.UNIX_MILLI_STRING:
        return (micros / 1000).cast("long").cast("string")
    if tf == TimestampFormat.UNIX_STRING:
        return F.unix_timestamp(c).cast("string")
    if tf == TimestampFormat.ISO8601_NANO_TZ:
        return F.date_format(c, "yyyy-MM-dd'T'HH:mm:ss.SSSSSS'000Z'")
    if tf == TimestampFormat.ISO8601_MICRO_TZ:
        return F.date_format(c, "yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'")
    if tf == TimestampFormat.ISO8601_MILLI_TZ:
        return F.date_format(c, "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'")
    if tf == TimestampFormat.ISO8601_TZ:
        return F.date_format(c, "yyyy-MM-dd'T'HH:mm:ss'Z'")
    if tf == TimestampFormat.ISO8601_NANO:
        return F.date_format(c, "yyyy-MM-dd'T'HH:mm:ss.SSSSSS'000'")
    if tf == TimestampFormat.ISO8601_MICRO:
        return F.date_format(c, "yyyy-MM-dd'T'HH:mm:ss.SSSSSS")
    if tf == TimestampFormat.ISO8601_MILLI:
        return F.date_format(c, "yyyy-MM-dd'T'HH:mm:ss.SSS")
    return F.date_format(c, "yyyy-MM-dd'T'HH:mm:ss")  # bare ISO8601


def _materialize_all(img: Column, all_cols: Column) -> Column:
    """Image re-expressed over the table's FULL column list: present
    values kept, missing columns materialized as explicit nulls
    (Builder.cpp:1578-1586, FULL_INS_DEC insert branch)."""
    return F.map_from_entries(
        F.transform(
            all_cols,
            lambda c: F.struct(
                c["name"].alias("key"),
                F.element_at(img, c["name"]).alias("value"),
            ),
        )
    )


def _keep_pk_nulls(img: Column, pk_cols: Column) -> Column:
    """Default insert/delete shaping (Builder.cpp:1588-1624): drop
    null-valued non-key entries, materialize missing key columns as
    nulls — so the key is always complete even when the redo image
    omitted it."""
    trimmed = F.map_filter(
        img, lambda k, v: v.isNotNull() | F.array_contains(pk_cols, k)
    )
    pk_nulls = F.map_from_entries(
        F.transform(
            F.filter(pk_cols, lambda c: ~F.map_contains_key(img, c)),
            lambda c: F.struct(
                c.alias("key"), F.lit(None).cast("string").alias("value")
            ),
        )
    )
    return F.map_concat(trimmed, pk_nulls)


def _images(fmt: Format, with_dict: bool = False) -> tuple[Column, Column]:
    before, after = _images_core(fmt, with_dict)
    if with_dict:
        before = _shape_unknown(before, fmt)
        after = _shape_unknown(after, fmt)
    return before, after


def _images_core(fmt: Format, with_dict: bool = False) -> tuple[Column, Column]:
    """before/after images per COLUMN_FORMAT (Builder.cpp:1467-1646).

    - CHANGED (default): updates carry only changed columns in the
      before image; with a dictionary, inserts/deletes drop null-valued
      non-key columns and always materialize the key.
    - FULL_INS_DEC: inserts/deletes materialize EVERY table column
      (missing → explicit null).
    - FULL_UPD: updates additionally carry the full column list on both
      sides, with the reference's null propagation — a column present on
      one side only is assumed unchanged-null on the other
      (Builder.cpp:1508-1536).
    Dictionary-dependent shaping needs `_all_cols`/`_pk_cols` columns
    (joined in build_events when dict_cols is supplied)."""
    before, after = F.col("before"), F.col("after")

    if fmt.column == ColumnFormat.CHANGED:
        changed_before = F.when(
            F.col("op") == "u",
            F.map_filter(
                before,
                lambda k, v: ~F.coalesce(
                    F.element_at(after, k) == v, F.lit(False)
                ),
            ),
        ).otherwise(before)
        if not with_dict:
            return changed_before, after
        # unknown tables (no dictionary row) keep the raw image, like the
        # reference's table == nullptr branch
        has_dict = F.size(F.col("_all_cols")) > 0
        return (
            F.when(
                (F.col("op") == "d") & has_dict,
                _keep_pk_nulls(before, F.col("_pk_cols")),
            ).otherwise(changed_before),
            F.when(
                (F.col("op") == "c") & has_dict,
                _keep_pk_nulls(after, F.col("_pk_cols")),
            ).otherwise(after),
        )

    if not with_dict:
        return before, after

    all_cols = F.col("_all_cols")
    has_dict = F.size(all_cols) > 0
    if fmt.column == ColumnFormat.FULL_INS_DEC:
        return (
            F.when(
                (F.col("op") == "d") & has_dict,
                _materialize_all(before, all_cols),
            ).otherwise(before),
            F.when(
                (F.col("op") == "c") & has_dict,
                _materialize_all(after, all_cols),
            ).otherwise(after),
        )

    # FULL_UPD: updates carry all columns; a side missing a column that
    # the other side has takes that side's value (null propagation)
    merged_before = _materialize_all(
        F.map_concat(
            F.map_filter(after, lambda k, v: ~F.map_contains_key(before, k)),
            before,
        ),
        all_cols,
    )
    merged_after = _materialize_all(
        F.map_concat(
            F.map_filter(before, lambda k, v: ~F.map_contains_key(after, k)),
            after,
        ),
        all_cols,
    )
    return (
        F.when((F.col("op") == "u") & has_dict, merged_before)
        .when((F.col("op") == "d") & has_dict, _materialize_all(before, all_cols))
        .otherwise(before),
        F.when((F.col("op") == "u") & has_dict, merged_after)
        .when((F.col("op") == "c") & has_dict, _materialize_all(after, all_cols))
        .otherwise(after),
    )


# SysCol COLTYPE code → rendered type descriptor (BuilderJson.h:430-517):
# (oracle type name, carries length?, carries precision/scale?)
_COLTYPE_RENDER = {
    1: ("varchar2", True, False),
    2: ("number", False, True),
    8: ("long", False, False),
    12: ("date", False, False),
    23: ("raw", True, False),
    24: ("long raw", False, False),
    96: ("char", True, False),
    100: ("binary_float", False, False),
    101: ("binary_double", False, False),
    112: ("clob", False, False),
    113: ("blob", False, False),
    180: ("timestamp", True, False),
    181: ("timestamp with time zone", True, False),
    182: ("interval year to month", True, False),
    183: ("interval day to second", True, False),
    208: ("urowid", True, False),
    231: ("timestamp with local time zone", True, False),
}


def column_descriptor(c: Column) -> Column:
    """One dictionary column row → {name, type, length?/precision?/
    scale?, nullable} descriptor struct (BuilderJson.h:421-528)."""
    type_name = F.lit("unknown")
    for code, (name, _, _) in _COLTYPE_RENDER.items():
        type_name = F.when(c["type"] == code, F.lit(name)).otherwise(type_name)
    with_len = F.lit(False)
    with_ps = F.lit(False)
    for code, (_, has_len, has_ps) in _COLTYPE_RENDER.items():
        if has_len:
            with_len = F.when(c["type"] == code, F.lit(True)).otherwise(with_len)
        if has_ps:
            with_ps = F.when(c["type"] == code, F.lit(True)).otherwise(with_ps)
    return F.struct(
        c["name"].alias("name"),
        type_name.alias("type"),
        F.when(with_len, c["length"]).alias("length"),
        F.when(with_ps, c["precision"]).alias("precision"),
        F.when(with_ps, c["scale"]).alias("scale"),
        c["nullable"].alias("nullable"),
    )


def schema_struct(fmt: Format) -> Column:
    """The per-op schema section (BuilderJson.h:367-532): owner/table,
    obj under SCHEMA_FORMAT::OBJ, column descriptors under FULL/REPEATED.
    The reference emits FULL descriptors once per table per output
    stream (stateful); the distributed analog is once per table per
    TRANSACTION (`_first_for_table` marks the txn's first op for the
    obj) — every consumer still sees the schema before any row of that
    table in the transaction stream. REPEATED emits on every op."""
    fields = [
        F.col("owner").alias("owner"),
        F.col("table").alias("table"),
        F.col("obj").alias("obj"),
    ]
    if fmt.schema in (SchemaFormat.FULL, SchemaFormat.REPEATED):
        descs = F.transform(F.col("_all_cols"), column_descriptor)
        if fmt.schema == SchemaFormat.FULL:
            descs = F.when(F.col("_first_for_table"), descs)
        fields.append(descs.alias("columns"))
    return F.struct(*fields)


def payload_struct(fmt: Format, with_dict: bool = False) -> Column:
    before, after = _images(fmt, with_dict)
    fields = [
        F.col("op").alias("op"),
        (
            schema_struct(fmt)
            if with_dict and fmt.schema != SchemaFormat.OBJ
            else F.struct(
                F.col("owner").alias("owner"),
                F.col("table").alias("table"),
                F.col("obj").alias("obj"),
            )
        ).alias("schema"),
        before.alias("before"),
        after.alias("after"),
    ]
    if fmt.rid == RidFormat.TEXT:
        # RID_FORMAT::TEXT (BuilderJson.h:94); SKIP omits the field —
        # the reference default. to_json drops null struct fields, so
        # position in the struct doesn't matter
        fields.insert(2, F.col("rid").alias("rid"))
    if fmt.add_offset:
        fields.append(F.col("offset").alias("offset"))
    return F.struct(*fields)


def _db_expr(fmt: Format, full_message: bool = False) -> Column | None:
    """DB_FORMAT guard (BuilderJson.cpp:462-634): DDL messages show the
    db name under ADD_DDL, everything else under ADD_DML; DEFAULT omits
    it. A per-row None renders as an absent JSON field. A FULL envelope
    is a transaction message — the reference stamps its single header at
    begin-processing with the ADD_DML bit (BuilderJson.cpp:462), so the
    gate is format-level there, never the content of one payload row."""
    if fmt.db == DbFormat.DEFAULT:
        return None
    if fmt.db == DbFormat.ALL:
        return F.lit(fmt.db_name)
    if full_message:
        return F.lit(fmt.db_name) if fmt.db == DbFormat.ADD_DML else None
    if fmt.db == DbFormat.ADD_DDL:
        return F.when(F.col("op") == "ddl", F.lit(fmt.db_name))
    return F.when(F.col("op") != "ddl", F.lit(fmt.db_name))


def _header_pairs(
    fmt: Format, full_message: bool = False
) -> list[tuple[str, Column]]:
    """(name, expr) header fields — the single source of truth for both
    the header struct and the FULL-path unpacking, so a new toggle can't
    silently drop out of one of them."""
    scn_name = "scns" if fmt.scn == ScnFormat.HEX else "scn"
    pairs = [(scn_name, scn_expr(fmt))]
    if fmt.scn_begin:
        # SCN_TYPE::BEGIN (BuilderJson.h:255-266): the transaction's
        # begin SCN; frames without a begin_scn column omit the field
        # (build_events injects a null column)
        pairs.append(
            (f"b_{scn_name}", scn_expr(fmt, "begin_scn", apply_type=False))
        )
    if fmt.scn_commit:
        # SCN_TYPE::COMMIT (BuilderJson.h:268-278): the commit SCN
        pairs.append(
            (f"e_{scn_name}", scn_expr(fmt, "c_scn", apply_type=False))
        )
    tm_name = tm_field_name(fmt)
    # TIMESTAMP_TYPE::COMMIT_VALUE (BuilderJson.h:280-283): tm shows the
    # commit timestamp
    tm_src = (
        F.coalesce(F.col("e_tm"), F.col("tm"))
        if fmt.tm_commit_value
        else "tm"
    )
    pairs.append((tm_name, tm_expr(fmt, tm_src)))
    if fmt.tm_begin:
        # TIMESTAMP_TYPE::BEGIN (BuilderJson.h:286-287)
        pairs.append((f"b_{tm_name}", tm_expr(fmt, "b_tm")))
    if fmt.tm_commit:
        # TIMESTAMP_TYPE::COMMIT (BuilderJson.h:288-289)
        pairs.append((f"e_{tm_name}", tm_expr(fmt, "e_tm")))
    pairs.append(("xid", xid_expr(fmt)))
    db = _db_expr(fmt, full_message)
    if db is not None:
        pairs.append(("db", db))
    usr_bits = 15 if fmt.show_user is True else int(fmt.show_user or 0)
    if usr_bits:
        # USER_TYPE (BuilderJson.h:336-343): the session login user
        # from the transaction attributes, gated per message kind
        # (begin=1, dml=2, commit=4, ddl=8 — the showUser argument at
        # each appendHeader call site); a missing attribute omits the
        # field exactly like the reference's attributes->find miss
        usr = F.element_at(F.col("attrs"), F.lit("LOGIN_USER_NAME"))
        if full_message:
            usr = usr if usr_bits & 1 else None
        elif usr_bits != 15:
            kinds = []
            if usr_bits & 1:
                kinds.append(F.col("op") == "begin")
            if usr_bits & 2:
                kinds.append(F.col("op").isin("c", "u", "d"))
            if usr_bits & 4:
                kinds.append(F.col("op") == "commit")
            if usr_bits & 8:
                kinds.append(F.col("op") == "ddl")
            cond = kinds[0]
            for k in kinds[1:]:
                cond = cond | k
            usr = F.when(cond, usr)
        if usr is not None:
            pairs.append(("usr", usr))
    if fmt.redo_thread:
        # REDO_THREAD_FORMAT::TEXT (BuilderJson.h:346-349): "rth" after
        # db/usr; build_events guarantees the `thread` column (lit 1 for
        # single-instance frames that don't carry one)
        pairs.append(("rth", F.col("thread").cast("long")))
    if fmt.add_sequences:
        pairs.append(("seq", F.col("seq")))
    bits = 7 if fmt.attributes is True else int(fmt.attributes or 0)
    if bits:
        # ATTRIBUTES_FORMAT bits: per-message-kind attrs emission
        # (BuilderJson.cpp:465 begin, :519-637 DML/DDL, :494 commit);
        # a FULL envelope is stamped at begin time → BEGIN bit
        if full_message:
            if bits & 1:
                pairs.append(("attrs", F.col("attrs")))
        else:
            kinds = []
            if bits & 1:
                kinds.append(F.col("op") == "begin")
            if bits & 2:
                kinds.append(F.col("op").isin("c", "u", "d", "ddl"))
            if bits & 4:
                kinds.append(F.col("op") == "commit")
            cond = kinds[0]
            for k in kinds[1:]:
                cond = cond | k
            pairs.append(("attrs", F.when(cond, F.col("attrs"))))
    return pairs


def header_fields(fmt: Format, full_message: bool = False) -> list[Column]:
    return [c.alias(n) for n, c in _header_pairs(fmt, full_message)]


def _header_names(fmt: Format, full_message: bool = False) -> list[str]:
    return [n for n, _ in _header_pairs(fmt, full_message)]


def tag_expr(
    tag_cols: tuple[str, ...], key_cols: tuple[str, ...] = ()
) -> Column:
    """B5 message key: rendered tag columns from the after/before image.
    With no explicit tag, the B6 key-column override (TableSelector.key)
    keys the message by the row's business key — Kafka partition-affinity
    per key — falling back to xid."""
    img = F.coalesce(F.col("after"), F.col("before"))
    cols = tag_cols or key_cols
    if not cols:
        return F.col("xid")
    # begin/commit/ddl markers carry no row image, so no tag can be
    # computed — the reference sends such messages KEYLESS (tagSize=0
    # skips RD_KAFKA_VTYPE_KEY entirely, WriterKafka.cpp:123-139), not
    # keyed by a constant '{}' that would funnel every transaction's
    # markers onto one partition (r12 review pass)
    return F.when(
        img.isNotNull(),
        F.to_json(
            F.struct(
                *[F.element_at(img, F.lit(c)).alias(c) for c in cols]
            )
        ),
    )


def build_events(
    events: DataFrame,
    fmt: Format,
    tag_cols: tuple[str, ...] = (),
    max_ops_per_message: int | None = None,
    dict_cols: DataFrame | None = None,
    key_cols: tuple[str, ...] = (),
    max_message_bytes: int | None = None,
    extra_cols: tuple[str, ...] = (),
) -> DataFrame:
    """CHANGE_EVENT_SCHEMA rows → (key, value) JSON messages.

    ``extra_cols`` pass through unencoded (e.g. the rotating file sink's
    emission-order columns); under MESSAGE_FORMAT::FULL they aggregate
    per transaction with ``min`` — the same contract as
    build_protobuf_events.

    ``max_message_bytes`` is the T6 big-transaction split on RENDERED
    bytes — the reference's actual ``max-message-mb`` contract
    (Builder.h:167, Transaction.cpp:519-538 splits when the builder's
    accumulated rendered size would cross the cap): a FULL-format
    transaction is emitted as greedily byte-packed messages keyed
    'xid:part'; no multi-op message exceeds the cap unless a SINGLE op
    renders past it alone. ``max_ops_per_message`` is the legacy
    op-count cap, used only when no byte cap is given.

    ``dict_cols`` (DICT_COL_SCHEMA rows) enables the dictionary-driven
    surfaces: SCHEMA_FORMAT FULL/REPEATED column descriptors,
    FULL_INS_DEC / FULL_UPD image materialization, and PK-completion of
    insert/delete images. It broadcasts (catalog-scale) onto the event
    stream keyed by obj. ``key_cols`` is the B6 TableSelector.key
    override: it replaces the dictionary PK for image shaping and keys
    the messages when no tag is configured."""
    df = events
    if fmt.redo_thread and "thread" not in df.columns:
        df = df.withColumn("thread", F.lit(1))
    if fmt.scn_begin and "begin_scn" not in df.columns:
        df = df.withColumn("begin_scn", F.lit(None).cast("long"))
    if (
        fmt.scn_commit or fmt.scn_type == ScnType.COMMIT_VALUE
    ) and "c_scn" not in df.columns:
        # SCN_TYPE::COMMIT_VALUE reads c_scn through scn_expr's coalesce
        # even when the c_scn FIELD is off — gating the injection on
        # scn_commit alone left an unresolved column (r12 review pass)
        df = df.withColumn("c_scn", F.lit(None).cast("long"))
    if (fmt.tm_begin or fmt.tm_commit or fmt.tm_commit_value):
        if "b_tm" not in df.columns:
            df = df.withColumn("b_tm", F.lit(None).cast("timestamp"))
        if "e_tm" not in df.columns:
            df = df.withColumn("e_tm", F.lit(None).cast("timestamp"))
    if fmt.skip_begin:
        df = df.filter(F.col("op") != "begin")
    if fmt.skip_commit:
        df = df.filter(F.col("op") != "commit")

    with_dict = dict_cols is not None
    if with_dict:
        from openlogreplicator_spark.metadata.schema_registry import (
            latest_columns,
        )

        dict_cols = latest_columns(dict_cols)
        meta = dict_cols.groupBy("obj").agg(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        "col", "name", "type", "length", "precision",
                        "scale", "nullable", "numpk",
                    )
                )
            ).alias("_all_cols"),
            F.array_sort(
                F.collect_list(F.when(F.col("numpk") > 0, F.col("name")))
            ).alias("_dict_pk"),
        )
        df = df.join(F.broadcast(meta), "obj", "left").withColumn(
            "_all_cols",
            F.coalesce(
                F.col("_all_cols"),
                F.expr(
                    "CAST(array() AS array<struct<col:int,name:string,"
                    "type:int,length:int,precision:int,scale:int,"
                    "nullable:boolean,numpk:int>>)"
                ),
            ),
        )
        if key_cols:
            df = df.withColumn(
                "_pk_cols", F.array(*[F.lit(c) for c in key_cols])
            )
        else:
            df = df.withColumn(
                "_pk_cols",
                F.coalesce(F.col("_dict_pk"), F.expr("array()")),
            )
        if fmt.schema == SchemaFormat.FULL:
            from pyspark.sql import Window

            w = Window.partitionBy("xid", "obj").orderBy("num")
            df = df.withColumn(
                "_first_for_table", F.row_number().over(w) == 1
            )

    if fmt.message == MessageFormat.FULL:
        # one message per transaction: ordered payload array (T5 emission
        # order restored via num inside the collect)
        per_event = df.select(
            *extra_cols,
            "xid",
            "num",
            F.struct(*header_fields(fmt, full_message=True)).alias("hdr"),
            payload_struct(fmt, with_dict).alias("p"),
        )
        if max_message_bytes:
            # byte-true T6 split: per-op rendered size (+1 for the array
            # separator) rides the collect so the greedy fold sees it
            per_event = per_event.withColumn(
                "sz", (F.octet_length(F.to_json("p")) + 1).cast("long")
            )
        else:
            per_event = per_event.withColumn("sz", F.lit(0).cast("long"))
        grouped = per_event.groupBy("xid").agg(
            F.min_by("hdr", "num").alias("hdr"),
            F.array_sort(
                F.collect_list(F.struct("num", "p", "sz")),
                # maps inside the payload struct aren't orderable —
                # compare on the emission index alone
                lambda l, r: F.when(l.num < r.num, -1)
                .when(l.num > r.num, 1)
                .otherwise(0),
            ).alias("items"),
            *[F.min(c).alias(c) for c in extra_cols],
        )
        hdr_names = _header_names(fmt, full_message=True)
        split_value = F.to_json(
            F.struct(
                *[F.col(f"hdr.{n}").alias(n) for n in hdr_names],
                F.col("part").alias("part"),
                F.col("payload").alias("payload"),
            )
        )
        if max_message_bytes:
            from openlogreplicator_spark.builders.split import (
                chunk_by_parts,
                greedy_parts,
            )

            # envelope bytes every part repeats: the rendered header
            # plus the ',"part":N…,"payload":[]' framing — 21 octets of
            # punctuation plus the part digits, bounded by the digits of
            # the item count (a part index can never exceed it)
            hdr_sz = (
                F.octet_length(
                    F.to_json(
                        F.struct(
                            *[F.col(f"hdr.{n}").alias(n) for n in hdr_names]
                        )
                    )
                )
                + F.lit(21)
                + F.length(F.size("items").cast("string"))
            )
            parts = greedy_parts(F.col("items"), max_message_bytes, hdr_sz)
            chunks = chunk_by_parts(F.col("items"), parts)
        elif max_ops_per_message:
            cap = max_ops_per_message
            payload = F.transform(F.col("items"), lambda s: s["p"])
            n_parts = F.ceil(F.size("items") / cap).cast("int")
            chunks = F.transform(
                F.sequence(F.lit(0), n_parts - 1),
                lambda i: F.struct(
                    i.alias("part"),
                    F.slice(payload, i * cap + 1, cap).alias("chunk"),
                ),
            )
        else:
            value = F.to_json(
                F.struct(
                    *[F.col(f"hdr.{n}").alias(n) for n in hdr_names],
                    F.transform(F.col("items"), lambda s: s["p"]).alias(
                        "payload"
                    ),
                )
            )
            return grouped.select(
                *extra_cols, F.col("xid").alias("key"), value.alias("value")
            )
        exploded = grouped.select(
            *extra_cols, "xid", "hdr", F.explode(chunks).alias("pc")
        ).select(
            *extra_cols,
            "xid",
            "hdr",
            F.col("pc.part").alias("part"),
            F.col("pc.chunk").alias("payload"),
        )
        return exploded.select(
            *extra_cols,
            F.concat_ws(":", "xid", "part").alias("key"),
            split_value.alias("value"),
        )

    value = F.to_json(
        F.struct(
            *header_fields(fmt),
            F.array(payload_struct(fmt, with_dict)).alias("payload"),
        )
    )
    return df.select(
        *extra_cols,
        tag_expr(tag_cols, key_cols).alias("key"),
        value.alias("value"),
    )
