"""Output format configuration — mirrors the reference's Format toggles.

Reference: ``src/common/Format.h:26-357`` (enum families) and the Debezium
preset applied in ``src/OpenLogReplicator.cpp:693-708``. Only the toggles
that change observable output are modeled; each maps to a column expression
choice in :mod:`openlogreplicator_spark.builders.json_builder`.
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace
from enum import Enum


class ScnFormat(Enum):
    DEC = "dec"  # SCN_FORMAT::DEC
    HEX = "hex"  # SCN_FORMAT::HEX (0x-prefixed, 16 digits)


class XidFormat(Enum):
    TEXT = "text"       # usn.slt.sqn decimal text (XID_FORMAT::TEXT_DEC)
    TEXT_HEX = "hex"    # 0xusn.slt.sqn hex (XID_FORMAT::TEXT_HEX)
    NUMERIC = "numeric"  # packed 64-bit (XID_FORMAT::DEC)
    # XID_FORMAT::TEXT_REVERSED (Format.h:195-200) — the Debezium
    # preset's format: JSON renders the packed 64-bit xid as hex16 with
    # byte pairs shuffled (appendHex16Reversed, BuilderJson.h:630-663);
    # protobuf renders plain zero-padded hex16 (BuilderProtobuf.h:182)
    TEXT_REVERSED = "reversed"


class TimestampFormat(Enum):
    """TIMESTAMP_FORMAT (Format.h:117-134) — the full 16-variant matrix
    of BuilderJson::appendTimestamp (BuilderJson.h:104-231). The four
    plain UNIX variants emit a NUMBER under "tm"; the *_STRING and
    ISO8601* variants emit a STRING under "tms" (the reference renames
    the field, BuilderJson.h:104 fieldn/fields). _TZ = UTC 'Z' suffix;
    fidelity note: the reference's metadata clock is second-resolution
    and zero-pads the sub-second digits — this engine renders the true
    sub-second value at the same digit count."""

    UNIX_NANO = "unix_nano"
    UNIX_MICRO = "unix_micro"
    UNIX_MILLI = "unix_milli"
    UNIX_SEC = "unix"
    UNIX_NANO_STRING = "unix_nano_string"
    UNIX_MICRO_STRING = "unix_micro_string"
    UNIX_MILLI_STRING = "unix_milli_string"
    UNIX_STRING = "unix_string"
    ISO8601_NANO_TZ = "iso8601_nano_tz"
    ISO8601_MICRO_TZ = "iso8601_micro_tz"
    ISO8601_MILLI_TZ = "iso8601_milli_tz"
    ISO8601_TZ = "iso8601_tz"
    ISO8601_NANO = "iso8601_nano"
    ISO8601_MICRO = "iso8601_micro"
    ISO8601_MILLI = "iso8601_milli"
    # bare ISO8601: no timezone suffix, no fraction (Format.h value 15).
    # (Historical alias: before r6 the repo's ISO8601 rendered what the
    # reference calls ISO8601_MICRO_TZ.)
    ISO8601 = "iso8601"


class MessageFormat(Enum):
    SHORT = "short"  # one message per DML op (MESSAGE_FORMAT::SHORT)
    FULL = "full"    # one message per transaction (MESSAGE_FORMAT::FULL)


class ColumnFormat(Enum):
    CHANGED = "changed"    # updates carry only changed columns (default)
    FULL_INS_DEC = "full_ins_dec"  # inserts/deletes materialize all columns
    FULL_UPD = "full_upd"  # updates carry all columns (Debezium needs this)


class SchemaFormat(Enum):
    OBJ = "obj"            # owner/table/obj only
    FULL = "full"          # + column type descriptors (SCHEMA_FORMAT::FULL)
    REPEATED = "repeated"  # re-emit schema on every message


class UnknownFormat(Enum):
    QUESTION_MARK = "question"  # UNKNOWN_FORMAT::QUESTION_MARK (emit "?")
    DUMP = "dump"               # hex dump of the raw value


class UnknownType(Enum):
    """UNKNOWN_TYPE (Format.h:182-186): what happens to columns whose
    dictionary type the engine cannot decode (LONG / LONG RAW,
    BuilderJson.h:445-448). HIDE (the reference default) drops them from
    the image; SHOW emits them rendered per UNKNOWN_FORMAT."""

    HIDE = "hide"
    SHOW = "show"


class RidFormat(Enum):
    """RID_FORMAT (Format.h:86-89; emission guard BuilderJson.h:94).
    The reference DEFAULT is SKIP; this repo defaults to TEXT because the
    engine pipelines, goldens, and oracle queries key on the ROWID —
    the reference rendering is one toggle away and golden-tested."""

    SKIP = "skip"  # no rid field in the payload
    TEXT = "text"  # 18-char base-64 ROWID


class DbFormat(Enum):
    """DB_FORMAT (Format.h:35-40; call sites BuilderJson.cpp:462-634):
    which message kinds carry the database name in the header. The
    reference DEFAULT omits it everywhere; this repo defaults to ALL
    (see RidFormat note)."""

    DEFAULT = "none"    # db name omitted
    ADD_DML = "dml"     # on begin/commit/DML messages
    ADD_DDL = "ddl"     # on DDL messages
    ALL = "all"


class ScnType(Enum):
    """SCN_TYPE::COMMIT_VALUE (Format.h:101-108, BuilderJson.h:241-248):
    the header scn renders as the transaction's commit (checkpoint) SCN
    instead of the op's own record SCN. The BEGIN/COMMIT bits of the
    same reference bitmask are separate Format booleans
    (``scn_begin``/``scn_commit`` — extra b_scn/e_scn header fields,
    BuilderJson.h:255-278)."""

    DEFAULT = "op"
    COMMIT_VALUE = "commit"


@dataclass(frozen=True)
class Format:
    """Observable-output toggles (reference Format.h defaults)."""

    scn: ScnFormat = ScnFormat.DEC
    scn_type: ScnType = ScnType.DEFAULT
    xid: XidFormat = XidFormat.TEXT
    timestamp: TimestampFormat = TimestampFormat.UNIX_MICRO
    message: MessageFormat = MessageFormat.SHORT
    column: ColumnFormat = ColumnFormat.CHANGED
    schema: SchemaFormat = SchemaFormat.OBJ
    unknown: UnknownFormat = UnknownFormat.QUESTION_MARK
    unknown_type: UnknownType = UnknownType.HIDE
    rid: RidFormat = RidFormat.TEXT
    db: DbFormat = DbFormat.ALL
    skip_begin: bool = False   # MESSAGE_FORMAT::SKIP_BEGIN
    skip_commit: bool = False  # MESSAGE_FORMAT::SKIP_COMMIT
    # REDO_FLAGS::EXPERIMENTAL_JSON (Ctx.h:104): JSON-typed (119)
    # columns pass through as raw LOB hex (Builder.cpp:154-158);
    # off ⇒ the column never emits
    experimental_json: bool = False
    add_offset: bool = False   # MESSAGE_FORMAT::ADD_OFFSET
    add_sequences: bool = False
    # reader "host-timezone" (cpp:917-921): every rendered timestamp
    # passes through Time::toEpoch(hostTimezone) (Time.h:48-69,
    # BuilderJson.h:105, BuilderProtobuf.h:96), which subtracts the
    # configured offset from the redo wall-clock before epoch/ISO
    # rendering. 0 (UTC) is this engine's default; the reference
    # defaults to the process-local zone.
    host_tz_seconds: int = 0
    # REDO_THREAD_FORMAT (Format.h:91-94): TEXT emits the redo thread
    # number as "rth" in the header (BuilderJson.h:346-349); SKIP (the
    # reference default, False here) omits it. Single-instance sources
    # are always thread 1; RAC sources carry per-record thread ids.
    redo_thread: bool = False
    # ATTRIBUTES_FORMAT (Format.h:28-33) — which message KINDS carry the
    # session-attribute map: bit0 begin, bit1 DML/DDL, bit2 commit
    # (BuilderJson.cpp:465,494,519-637). True = all kinds (7). A FULL
    # envelope carries attrs iff the BEGIN bit is set, matching the
    # reference's single begin-time header. Fidelity note (like the
    # RidFormat/DbFormat defaults): this engine emits scn/tm on EVERY
    # short message — the reference's `first || isScnTypeDml()` gate
    # would omit them from non-begin messages by default; here each
    # message is self-describing by design.
    attributes: int | bool = 0
    # SCN_TYPE::BEGIN / ::COMMIT bits (Format.h:101-108): extra header
    # fields b_scn / e_scn (b_scns/e_scns under SCN_FORMAT::TEXT_HEX),
    # BuilderJson.h:255-278. b_scn reads the events' begin_scn column
    # (absent → field omitted); e_scn reads c_scn (the commit SCN).
    scn_begin: bool = False
    scn_commit: bool = False
    # USER_TYPE (Format.h:110-117): emit "usr" (the session's login
    # user, BuilderJson.h:336-343) after db in the header — per message
    # KIND bitmask: begin=1, dml=2, commit=4, ddl=8 (the appendHeader
    # showUser argument at each call site); True = all kinds. Sourced
    # from the transaction attributes' LOGIN_USER_NAME (absent →
    # omitted, like the reference's attributes->find miss). A FULL
    # envelope carries usr iff the BEGIN bit is set.
    show_user: int | bool = 0
    # TIMESTAMP_TYPE bits (Format.h:92-99, emission BuilderJson.h:
    # 280-290): COMMIT_VALUE renders the header tm from the commit
    # timestamp (events' e_tm column, falling back to tm); BEGIN/COMMIT
    # add b_tm / e_tm fields (b_tms/e_tms for string-rendered variants)
    # reading the events' b_tm / e_tm columns — absent columns omit the
    # fields
    tm_commit_value: bool = False
    tm_begin: bool = False
    tm_commit: bool = False
    db_name: str = "DB"

    def with_options(self, **kw) -> "Format":
        return replace(self, **kw)


def debezium_preset() -> Format:
    """The reference's `"format": "debezium"` preset.

    Reference: src/OpenLogReplicator.cpp:693-708 — FULL_UPD columns, all
    schema sections, ms timestamps, reversed XID rendering.
    """
    return Format(
        column=ColumnFormat.FULL_UPD,
        # SCHEMA_FORMAT::ALL = FULL|REPEATED|OBJ (Format.h:110-116):
        # column descriptors on EVERY message, not once per table
        schema=SchemaFormat.REPEATED,
        timestamp=TimestampFormat.UNIX_MILLI,
        # OpenLogReplicator.cpp:707 — the preset forces TEXT_REVERSED
        xid=XidFormat.TEXT_REVERSED,
        skip_begin=True,
        skip_commit=True,
        # the reference debezium block also forces ridFormat=TEXT and
        # dbFormat=ALL (OpenLogReplicator.cpp:696-701) — this repo's
        # defaults already are those values; stated here for parity
        rid=RidFormat.TEXT,
        db=DbFormat.ALL,
        # ▲ r6: the block's SCN_TYPE::DEBEZIUM (BEGIN|DML|COMMIT) and
        # USER_TYPE::DEBEZIUM (OpenLogReplicator.cpp:702-707) — b_scn /
        # e_scn header fields and the usr login-user field
        scn_begin=True,
        scn_commit=True,
        show_user=True,
        # TIMESTAMP_TYPE::DEBEZIUM = BEGIN | DML | COMMIT
        tm_begin=True,
        tm_commit=True,
    )


@dataclass(frozen=True)
class TableSelector:
    """Per-table replication config (reference SchemaElement).

    Reference: src/metadata/SchemaElement.h — owner/table regex, key
    (PK override), tag (message key), condition (attrs mini-language).
    """

    owner: str = ".*"
    table: str = ".*"
    key: tuple[str, ...] = ()
    tag: tuple[str, ...] = ()
    condition: str = ""


@dataclass(frozen=True)
class EngineConfig:
    """Top-level pipeline config (reference OpenLogReplicator.cpp:145-1247)."""

    fmt: Format = field(default_factory=Format)
    selectors: tuple[TableSelector, ...] = (TableSelector(),)
    skip_xid: tuple[str, ...] = ()       # F4 skip-list
    start_scn: int | None = None         # O3 startup positioning
    # O3 sequence positioning (Replicator.cpp:123-125): the reader
    # starts at this redo-log sequence; lower sequences never enter
    start_seq: int | None = None
    transaction_max_mb: int = 1024       # T4 size guard
    checkpoint_interval_s: int = 10
    # byte cadence of the portable W7 checkpoint document
    # (state.interval-mb, Ctx.h:207 default 500; pacing semantics
    # Metadata::writeCheckpoint, Metadata.cpp:421-424): the funnel
    # sinks advance the doc when EITHER interval_s elapsed OR this many
    # MB of rendered message bytes were written since the last doc
    checkpoint_interval_mb: int = 500
    # schema resolution mode (SURVEY §1.3; REDO_FLAGS, Ctx.h:88-89):
    #   "dict"       dictionary-backed — unknown objects are dropped
    #   "adaptive"   unknown objects synthesized as USER_<obj>/TABLE_<obj>
    #                (Schema.cpp:521-526)
    #   "schemaless" no dictionary — columns emitted positionally as
    #                COL_<n> (Builder.cpp:96-100)
    schema_mode: str = "dict"
    # obj → ordered column names for OLRS1 v5 KDO-positional vectors:
    # the parse-plane dictionary resolve (Builder.cpp:1382-1426). None ⇒
    # k/v-framed files (or schemaless COL_<n> names for positional ones)
    pos_dictionary: dict | None = None
    # database timezone (seconds east of UTC) for TIMESTAMP WITH LOCAL
    # TIME ZONE decode — the reference reads metadata->dbTimezone from
    # V$/config; threads into the parse plane's TSLTZ kernel
    db_timezone_seconds: int = 2 * 3600
    # INTERVAL_DTS_FORMAT / INTERVAL_YTM_FORMAT (Format.h:54-74) —
    # rendering of INTERVAL column values, applied in the parse plane's
    # interval kernels (decode_interval_ds/_ym implement all 11+5
    # reference variants). Engine defaults keep the human-readable
    # forms; the reference's numeric defaults (UNIX_NANO / MONTHS) come
    # through reference_config.from_reference_json.
    interval_dts: str = "iso8601_space"
    interval_ytm: str = "string_ym_dash"
    # TIMESTAMP_TZ_FORMAT (Format.h:31-44) — TSTZ column-value
    # rendering; all 12 reference variants live in
    # oracle_types.decode_timestamp_tz. Engine default keeps the
    # canonical human-readable form; the reference's default
    # (UNIX_NANO_STRING, OpenLogReplicator.cpp:688) comes through
    # reference_config.from_reference_json.
    timestamp_tz: str = "iso8601_nano"
    # TIMESTAMP_FORMAT applied to column VALUES in the parse plane
    # (the header tm is Format.timestamp in the builders); canonical
    # default, reference default UNIX_NANO via the config adapter
    timestamp_column: str = "iso8601_nano"
    # CHAR_FORMAT (Format.h:42-46): "default" | "nomapping" | "hex" —
    # charset translation mode of the parse plane's text kernels
    char_format: str = "default"
    # REDO_FLAGS presentation bits (Ctx.h:91-102), each wired to the
    # engine knob that already implements the behavior:
    show_ddl: bool = False                  # bit 5: emit op='ddl' messages
    #                                         (Builder.cpp:1755 gate)
    show_hidden_columns: bool = False       # bit 6 ┐ column-visibility
    show_guard_columns: bool = False        # bit 7 │ projection at the
    show_nested_columns: bool = False       # bit 8 │ dictionary
    show_unused_columns: bool = False       # bit 9 ┘ (Builder.cpp:106-113)
    show_incomplete_transactions: bool = False  # bit 10 (Parser.cpp:585)
    show_system_transactions: bool = False  # bit 11: system-table DML
    #                                         emitted too (Builder.cpp:773)
    show_checkpoint: bool = False           # bit 12: op='chkpt' heartbeats
    #                                         reach the sink (Writer.cpp:296)
    ignore_data_errors: bool = False        # bit 4: a damaged record logs
    #                                         error + warning 60013 and the
    #                                         parse continues with the next
    #                                         record (Parser.cpp:1468-1479)
    #                                         instead of aborting the file
    experimental_xmltype: bool = False      # bit 16: XMLTYPE decode + the
    #                                         hidden-xmltype-column
    #                                         visibility carve-out
    #                                         (Schema.cpp:487,780)
    # reference "memory" element (OpenLogReplicator.cpp): max-mb bounds the
    # assembly working set → forwarded to
    # spark.olrs.assembly.spillThresholdMb; swap-path is where oversized
    # buckets stage their Arrow IPC payload (T10 swap-to-disk analog)
    memory_max_mb: int | None = None
    memory_swap_path: str = ""
