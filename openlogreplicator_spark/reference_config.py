"""O1 parity — ingest the reference's ``OpenLogReplicator.json`` config.

The reference process is driven entirely by one JSON file
(``src/OpenLogReplicator.cpp:145-1247``); the 9 example configs under
``scripts/OpenLogReplicator-example*.json`` span every reader/writer/format
combination. This module accepts that exact format and produces the
engine's native wiring: an :class:`~openlogreplicator_spark.config.
EngineConfig` plus the reader/writer/state/metrics surround needed to call
``streaming.engine.build_pipeline``.

Validation mirrors the reference parser's observable behavior:

- schema ``version`` must match (CMakeLists.txt ``SCHEMA_VERSION 1.9.0``;
  rejection OpenLogReplicator.cpp:199-202),
- unknown keys are rejected at every nesting level the reference
  key-checks, with the same allowed-key sets (``checkJsonFields`` call
  sites; suppressible like the reference's DISABLE_CHECKS::JSON_TAGS via
  ``disable_checks``) — the target element is deliberately NOT
  key-checked because the reference never runs checkJsonFields over it
  (cpp:1070-1085 has no targetNames list); missing required fields
  reject with the getJsonField* shape (code 20003),
- exactly one source and one target (cpp:459, 1068),
- the format/message/filter value-range and mutual-exclusion rules
  (FULL vs SKIP_BEGIN/SKIP_COMMIT, start-scn vs start-time[-rel],
  transaction-max-mb vs memory max-mb, flags ≤ 524287, ...).

Error messages reuse the reference's ``bad JSON, invalid "<key>" value``
shape (code 30001) so a migrating user's log-scrapers keep working.

Numeric format toggles map onto the repo's :class:`Format` enums; the
few reference variants the Spark builder renders under a coarser toggle
(nanosecond timestamps, string-wrapped unix numbers, per-message-kind
scn/timestamp/user type bits) are accepted, validated with the
reference's ranges, and recorded in ``ReferenceDeployment.unmodeled``
so callers can see exactly which knobs were coalesced.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field

from openlogreplicator_spark.config import (
    ColumnFormat,
    DbFormat,
    EngineConfig,
    Format,
    MessageFormat,
    RidFormat,
    SchemaFormat,
    ScnFormat,
    ScnType,
    TableSelector,
    TimestampFormat,
    UnknownFormat,
    UnknownType,
    XidFormat,
    debezium_preset,
)

SCHEMA_VERSION = "1.9.0"


class ConfigurationError(ValueError):
    """Reference ConfigurationException analog (code 30001/30001-style)."""

    def __init__(self, code: int, message: str):
        super().__init__(f"{code}: {message}")
        self.code = code


def _bad(key: str, value, expected: str) -> ConfigurationError:
    return ConfigurationError(
        30001,
        f'bad JSON, invalid "{key}" value: {value}, expected: {expected}',
    )


def _require(obj: dict, key: str):
    """Missing required field → the reference's getJsonField* shape
    (Ctx.cpp:107-140, DataException 20003 'field <k> not found') instead
    of a raw KeyError (r12 review-pass-6)."""
    if key not in obj:
        raise ConfigurationError(
            20003, f"parse error, field {key} not found"
        )
    return obj[key]


# checkJsonFields allowed-key sets (OpenLogReplicator.cpp, per level)
_DOCUMENT_KEYS = {
    "dump-path", "dump-raw-data", "dump-redo-log", "log-level", "memory",
    "metrics", "source", "state", "target", "trace", "version",
}
_MEMORY_KEYS = {
    "min-mb", "max-mb", "read-buffer-max-mb", "read-buffer-min-mb",
    "swap-mb", "swap-path", "unswap-buffer-min-mb", "write-buffer-max-mb",
    "write-buffer-min-mb",
}
_METRICS_KEYS = {"type", "bind", "tag-names"}
_STATE_KEYS = {
    "type", "path", "interval-s", "interval-mb", "keep-checkpoints",
    "schema-force-interval",
}
_SOURCE_KEYS = {
    "alias", "arch", "arch-read-sleep-us", "arch-read-tries", "debug",
    "filter", "flags", "format", "memory", "name", "reader",
    "redo-read-sleep-us", "redo-verify-delay-us", "refresh-interval-us",
    "state", "transaction-max-mb",
}
_READER_KEYS = {
    "db-timezone", "disable-checks", "host-timezone", "log-archive-format",
    "log-timezone", "password", "path-mapping", "redo-copy-path",
    "redo-log", "server", "start-scn", "start-seq", "start-time",
    "start-time-rel", "type", "user",
}
_FORMAT_KEYS = {
    "attributes", "char", "column", "db", "flush-buffer", "interval-dts",
    "interval-ytm", "message", "rid", "redo-thread", "schema", "scn",
    "scn-type", "timestamp", "timestamp-metadata", "timestamp-type",
    "timestamp-tz", "type", "unknown", "unknown-type", "user-type", "xid",
}
_DEBUG_KEYS = {
    "owner", "stop-checkpoints", "stop-log-switches", "stop-transactions",
    "table",
}
_FILTER_KEYS = {"dump-xid", "separator", "skip-xid", "table"}
_TABLE_KEYS = {"condition", "key", "owner", "table", "tag"}
_WRITER_KEYS = {
    "append", "max-file-size", "max-message-mb", "new-line", "output",
    "poll-interval-us", "properties", "queue-size", "timestamp-format",
    "topic", "type", "uri", "write-buffer-flush-size",
    # example-batch.json uses the legacy shorthand accepted by older
    # WriterKafka configs; kept for conformance with the shipped examples
    "brokers",
}

# MESSAGE_FORMAT bits (Format.h:76-84)
_MSG_FULL, _MSG_ADD_SEQ, _MSG_SKIP_BEGIN, _MSG_SKIP_COMMIT, _MSG_ADD_OFFSET = (
    1, 2, 4, 8, 16,
)


def _check_keys(
    obj: dict, allowed: set, where: str, enabled: bool = True
) -> None:
    if not enabled:
        return
    for k in obj:
        if k not in allowed:
            raise _bad(k, obj[k], f"unknown field in {where}")


def _uint(obj: dict, key: str, lo: int, hi: int):
    val = obj[key]
    if not isinstance(val, int) or isinstance(val, bool) or not (
        lo <= val <= hi
    ):
        raise _bad(key, val, f"one of {{{lo} .. {hi}}}")
    return val


# Data::parseTimezone's named-zone shorthand table (Data.cpp:53-112) —
# plain public POSIX/Olson aliases mapped to fixed offsets
_TZ_ALIASES = {
    "Etc/GMT-14": "-14:00", "Etc/GMT-13": "-13:00", "Etc/GMT-12": "-12:00",
    "Etc/GMT-11": "-11:00", "HST": "-10:00", "Etc/GMT-10": "-10:00",
    "Etc/GMT-9": "-09:00", "PST": "-08:00", "PST8PDT": "-08:00",
    "Etc/GMT-8": "-08:00", "MST": "-07:00", "MST7MDT": "-07:00",
    "Etc/GMT-7": "-07:00", "CST": "-06:00", "CST6CDT": "-06:00",
    "Etc/GMT-6": "-06:00", "EST": "-05:00", "EST5EDT": "-05:00",
    "Etc/GMT-5": "-05:00", "Etc/GMT-4": "-04:00", "Etc/GMT-3": "-03:00",
    "Etc/GMT-2": "-02:00", "Etc/GMT-1": "-01:00", "GMT": "+00:00",
    "Etc/GMT": "+00:00", "Greenwich": "+00:00", "Etc/Greenwich": "+00:00",
    "GMT0": "+00:00", "Etc/GMT0": "+00:00", "GMT+0": "+00:00",
    "Etc/GMT-0": "+00:00", "Etc/GMT+0": "+00:00", "UTC": "+00:00",
    "Etc/UTC": "+00:00", "UCT": "+00:00", "Etc/UCT": "+00:00",
    "Universal": "+00:00", "Etc/Universal": "+00:00", "WET": "+00:00",
    "MET": "+01:00", "CET": "+01:00", "Etc/GMT+1": "+01:00",
    "EET": "+02:00", "Etc/GMT+2": "+02:00", "Etc/GMT+3": "+03:00",
    "Etc/GMT+4": "+04:00", "Etc/GMT+5": "+05:00", "Etc/GMT+6": "+06:00",
    "Etc/GMT+7": "+07:00", "PRC": "+08:00", "ROC": "+08:00",
    "Etc/GMT+8": "+08:00", "Etc/GMT+9": "+09:00", "Etc/GMT+10": "+10:00",
    "Etc/GMT+11": "+11:00", "Etc/GMT+12": "+12:00",
}


def parse_timezone(value: str) -> int | None:
    """``db-timezone``/``host-timezone``/``log-timezone`` string →
    signed offset seconds, or None when unparseable (the caller raises
    the reference's 30001). Accepts the alias table plus ``±H:MM`` /
    ``±HH:MM`` (Data::parseTimezone, Data.cpp:53-139).

    Fidelity note: the reference's digit arithmetic is defective for
    the shorthand forms it accepts — the minute pair is scaled
    digit-wise (``'+05:30'`` → 18180 s instead of 19800) and the
    tens-of-hours digit is subtracted (``'+12:00'`` → −28800). This
    port computes the evident intent: ``sign·(hh·3600 + mm·60)``.
    Documented as a config-plane divergence in COVERAGE.md."""
    s = _TZ_ALIASES.get(value, value)
    if len(s) == 5:
        ok = s[1].isdigit() and s[2] == ":" and s[3].isdigit() and \
            s[4].isdigit()
        if not ok:
            return None
        out = int(s[1]) * 3600 + int(s[3:5]) * 60
    elif len(s) == 6:
        ok = s[1].isdigit() and s[2].isdigit() and s[3] == ":" and \
            s[4].isdigit() and s[5].isdigit()
        if not ok:
            return None
        out = int(s[1:3]) * 3600 + int(s[4:6]) * 60
    else:
        return None
    if s[0] == "-":
        return -out
    if s[0] != "+":
        return None
    return out


def _tz_field(obj: dict, key: str) -> int | None:
    """Parse a timezone key, rejecting like cpp:911-925."""
    if key not in obj:
        return None
    value = obj[key]
    parsed = parse_timezone(value) if isinstance(value, str) else None
    if parsed is None:
        raise _bad(key, value, 'value: {"+/-HH:MM"}')
    return parsed


# Reference numeric values → repo enums. Approximations are recorded in
# `unmodeled` by the caller (see module docstring).
_TIMESTAMP_MAP = {  # TIMESTAMP_FORMAT (Format.h:117-134) — exact, 0..15
    0: TimestampFormat.UNIX_NANO,
    1: TimestampFormat.UNIX_MICRO,
    2: TimestampFormat.UNIX_MILLI,
    3: TimestampFormat.UNIX_SEC,
    4: TimestampFormat.UNIX_NANO_STRING,
    5: TimestampFormat.UNIX_MICRO_STRING,
    6: TimestampFormat.UNIX_MILLI_STRING,
    7: TimestampFormat.UNIX_STRING,
    8: TimestampFormat.ISO8601_NANO_TZ,
    9: TimestampFormat.ISO8601_MICRO_TZ,
    10: TimestampFormat.ISO8601_MILLI_TZ,
    11: TimestampFormat.ISO8601_TZ,
    12: TimestampFormat.ISO8601_NANO,
    13: TimestampFormat.ISO8601_MICRO,
    14: TimestampFormat.ISO8601_MILLI,
    15: TimestampFormat.ISO8601,
}
_INTERVAL_DTS_MAP = [  # INTERVAL_DTS_FORMAT (Format.h:54-66), 0..10
    "unix_nano", "unix_micro", "unix_milli", "unix",
    "unix_nano_string", "unix_micro_string", "unix_milli_string",
    "unix_string", "iso8601_space", "iso8601_comma", "iso8601_dash",
]
_TS_COL_MAP = [  # TIMESTAMP_FORMAT for column values, 0..15
    "unix_nano", "unix_micro", "unix_milli", "unix",
    "unix_nano_string", "unix_micro_string", "unix_milli_string",
    "unix_string", "iso8601_nano_tz", "iso8601_micro_tz",
    "iso8601_milli_tz", "iso8601_tz", "iso8601_nano", "iso8601_micro",
    "iso8601_milli", "iso8601",
]
_TSTZ_MAP = [  # TIMESTAMP_TZ_FORMAT (Format.h:31-44), 0..11
    "unix_nano_string", "unix_micro_string", "unix_milli_string",
    "unix_string", "iso8601_nano_tz", "iso8601_micro_tz",
    "iso8601_milli_tz", "iso8601_tz", "iso8601_nano", "iso8601_micro",
    "iso8601_milli", "iso8601",
]
_INTERVAL_YTM_MAP = [  # INTERVAL_YTM_FORMAT (Format.h:68-74), 0..4
    "months", "months_string", "string_ym_space", "string_ym_comma",
    "string_ym_dash",
]
_XID_MAP = {  # XID_FORMAT (Format.h:188-193)
    0: XidFormat.TEXT_HEX,
    1: XidFormat.TEXT,       # TEXT_DEC
    2: XidFormat.NUMERIC,
    3: XidFormat.TEXT_REVERSED,
}


@dataclass(frozen=True)
class WriterSpec:
    """Target writer (cpp:1121-1215): type + the knobs each type takes."""

    type: str                      # file|discard|kafka|zeromq|network
    topic: str = ""
    brokers: str = ""              # kafka bootstrap (properties or shorthand)
    uri: str = ""                  # network/zeromq endpoint
    output: str = ""               # file sink path pattern
    new_line: int = 1
    append: int = 1
    max_file_size: int = 0
    timestamp_format: str = "%F_%T"   # %t-mask strftime (cpp:1126)
    max_message_mb: int = 100
    properties: dict = field(default_factory=dict)

    def rotating_writer(self):
        """The W3 :class:`RotatingFileWriter` this spec configures —
        mask parse, rotation mode, and startup numbering happen in its
        constructor (WriterFile::initialize semantics, including the
        30005/30006/30007 configuration rejections)."""
        from openlogreplicator_spark.streaming.file_writer import (
            RotatingFileWriter,
            _ConfigError,
        )

        try:
            return RotatingFileWriter(
                self.output,
                timestamp_format=self.timestamp_format,
                max_file_size=self.max_file_size,
                new_line=self.new_line,
                append=self.append,
            )
        except _ConfigError as e:
            raise ConfigurationError(e.code, e.message) from None


@dataclass(frozen=True)
class ReferenceDeployment:
    """Everything a reference JSON config wires, engine-native."""

    config: EngineConfig
    source_alias: str
    target_alias: str
    db_name: str
    reader_type: str               # online|offline|batch
    format_type: str               # json|debezium|protobuf
    writer: WriterSpec
    redo_logs: tuple[str, ...] = ()       # batch reader work list
    path_mapping: tuple[str, ...] = ()
    server: str = ""               # online reader connect string
    user: str = ""
    start_seq: int | None = None
    start_time: str = ""
    start_time_rel: int = 0
    state_path: str = ""           # W7 state documents directory
    state_keep_checkpoints: int = 100   # checkpoint GC depth (O4)
    # schema-rewrite cadence (state.schema-force-interval, Ctx.h:209
    # default 20; semantics Metadata.cpp:426-436): an UNCHANGED schema
    # skips up to N snapshot exports, then re-stores on the (N+1)th;
    # any change stores immediately and resets the counter
    schema_force_interval: int = 20
    # mutable pacing state for export_schema_paced (per deployment
    # object, like the reference's in-memory Metadata::schemaInterval);
    # a field holding a mutable dict keeps the frozen dataclass's value
    # semantics honest (no object.__setattr__ smuggling)
    _schema_pacer: dict = field(
        default_factory=dict, repr=False, compare=False
    )
    metrics_bind: str = ""         # W8 Prometheus exposition endpoint
    metrics_tag_names: str = "none"    # TAG_NAMES exposition mode
    dump_redo_log: int = 0         # 0/1/2 — LogMiner-style dump mode
    dump_raw_data: int = 0         # '## H:' raw header lines
    dump_path: str = "."           # ctx->dumpPath default (Ctx.h:227)
    redo_copy_path: str = ""       # raw-redo archival copy dir
    flags: int = 0
    log_archive_format: str = ""
    dump_xid: tuple[str, ...] = ()
    unmodeled: dict = field(default_factory=dict)

    def _decode_opts(self):
        """The deployment's own decode plane as a DecodeOpts — the dump
        diagnostics must parse with the SAME dictionary/timezone/format
        selectors/degradation mode as the pipeline, or the trace
        diverges from what was actually emitted (r12 review-pass-6)."""
        from openlogreplicator_spark.sources.binary_redo import (
            DB_TZ_DEFAULT,
            DecodeOpts,
        )

        cfg = self.config
        return DecodeOpts(
            db_tz=(
                cfg.db_timezone_seconds
                if cfg.db_timezone_seconds is not None else DB_TZ_DEFAULT
            ),
            interval_dts=cfg.interval_dts,
            interval_ytm=cfg.interval_ytm,
            char_format=cfg.char_format,
            timestamp_tz=cfg.timestamp_tz,
            timestamp_column=cfg.timestamp_column,
            unknown=cfg.fmt.unknown.value,
            ignore_data_errors=getattr(cfg, "ignore_data_errors", False),
        )

    def dump_xid_records(self, spark, in_dir):
        """``filter.dump-xid`` diagnostics: the raw parsed records of
        the listed transactions, as the reference traces a matching
        transaction's full redo when it commits (Transaction.cpp dump
        path driven by the filter's dumpXidList). Returns the
        record-level frame so the caller can route it wherever traces
        go; empty dump-xid returns an empty frame. Parses under the
        deployment's own decode options (see _decode_opts)."""
        from pyspark.sql import functions as F

        from openlogreplicator_spark.sources.binary_redo import (
            parse_redo_files,
        )

        o = self._decode_opts()
        recs = parse_redo_files(
            spark, in_dir,
            dictionary=self.config.pos_dictionary,
            db_tz_seconds=o.db_tz,
            interval_dts=o.interval_dts,
            interval_ytm=o.interval_ytm,
            char_format=o.char_format,
            timestamp_tz=o.timestamp_tz,
            timestamp_column=o.timestamp_column,
            unknown_format=o.unknown,
            ignore_data_errors=o.ignore_data_errors,
        )
        if not self.dump_xid:
            return recs.filter(F.lit(False))
        return recs.filter(F.col("xid").isin(list(self.dump_xid)))

    def write_redo_dumps(self, in_dir: str) -> list[str]:
        """``dump-redo-log`` diagnostics (Parser.cpp:143-201, 1272):
        with mode > 0, every input OLRS1 file is rendered into the
        LogMiner-compatible dump text at ``<dump-path>/<sequence>.olr``
        — the reference's exact naming; ``dump-raw-data`` adds the
        ``## H:`` raw header lines. Returns the written paths (empty
        when the mode is 0). Driver-side by design: this is the same
        single-stream bisection diagnostic the reference's reader
        thread writes."""
        import glob as _glob
        import struct as _struct

        if self.dump_redo_log == 0:
            return []
        from openlogreplicator_spark.sources.binary_redo import (
            dump_redo_log,
        )

        os.makedirs(self.dump_path, exist_ok=True)
        written: list[str] = []
        for path in sorted(_glob.glob(os.path.join(in_dir, "*.olrs"))):
            with open(path, "rb") as fh:
                data = fh.read()
            (sequence,) = _struct.unpack_from("<I", data, 12)
            out_path = os.path.join(self.dump_path, f"{sequence}.olr")
            with open(out_path, "w") as fh:
                fh.write(
                    dump_redo_log(
                        data, path, raw=self.dump_raw_data > 0,
                        dictionary=self.config.pos_dictionary,
                        db_tz=self._decode_opts(),
                    )
                )
            written.append(out_path)
        return written

    def export_schema(
        self, dict_versions, scn: int, resetlogs: int = 0,
        activation: int = 0,
    ) -> str:
        """W7 schema checkpoint through the deployment's state wiring:
        writes the snapshot under ``state.path`` and applies the
        configured ``keep-checkpoints`` GC depth
        (Metadata::writeCheckpoint → deleteOldCheckpoints)."""
        from openlogreplicator_spark.metadata.state_documents import (
            export_schema_snapshot,
        )

        return export_schema_snapshot(
            dict_versions,
            self.state_path or "checkpoint",
            self.db_name,
            scn,
            resetlogs=resetlogs,
            activation=activation,
            keep=self.state_keep_checkpoints,
        )

    def export_schema_paced(
        self, dict_versions, scn: int, schema_changed: bool,
        resetlogs: int = 0, activation: int = 0,
    ) -> str | None:
        """``state.schema-force-interval`` wired — the storeSchema
        pacing of Metadata::writeCheckpoint (Metadata.cpp:426-436): a
        CHANGED schema stores immediately (counter resets); an
        unchanged one skips up to ``schema_force_interval`` exports,
        then re-stores on the next (counter resets) — the periodic
        full-schema rewrite that lets old snapshots be GC'd without
        stranding a cold start on a deleted base. Returns the snapshot
        path, or None when this call was paced out.

        This deployment-level API is the runtime surface for schema
        snapshots (same wiring level the keep-checkpoints GC rides):
        an operator's registry-update hook calls it on every
        checkpoint; there is no engine-internal caller because the
        engine's own schema durability is the versioned registry
        table — the snapshot documents exist for reference-shaped
        consumers and cold starts."""
        if not schema_changed:
            n = self._schema_pacer.get("n", 0)
            if n < self.schema_force_interval:
                self._schema_pacer["n"] = n + 1
                return None
        self._schema_pacer["n"] = 0
        return self.export_schema(
            dict_versions, scn, resetlogs=resetlogs, activation=activation
        )

    def copy_redo_files(self, in_dir: str) -> list[str]:
        """``redo-copy-path`` (Reader.cpp:74-76, 226-244): archive every
        redo file read, named ``<redo-copy-path>/<db>_<sequence>.arc``
        — the reference's exact naming. The target directory must exist
        (the reference throws 10012 at startup otherwise). Returns the
        written paths; empty when the key is unset."""
        import glob as _glob
        import struct as _struct

        if not self.redo_copy_path:
            return []
        if not os.path.isdir(self.redo_copy_path):
            raise RuntimeError(
                f"[10012] directory: {self.redo_copy_path} - can't read"
            )
        written: list[str] = []
        for path in sorted(_glob.glob(os.path.join(in_dir, "*.olrs"))):
            with open(path, "rb") as fh:
                data = fh.read()
            (sequence,) = _struct.unpack_from("<I", data, 12)
            out_path = os.path.join(
                self.redo_copy_path, f"{self.db_name}_{sequence}.arc"
            )
            with open(out_path, "wb") as fh:
                fh.write(data)
            written.append(out_path)
        return written

    def resolve_start_scn(self, catalog=None) -> int | None:
        """O3 effective start SCN. ``start-scn`` wins outright;
        ``start-time`` / ``start-time-rel`` resolve via
        TIMESTAMP_TO_SCN on a live catalog — the reference only
        supports time positioning on the ONLINE connection
        (ReplicatorOnline::positionReader, cpp:236-273), so asking for
        it without a catalog is a configuration error here too."""
        if self.config.start_scn is not None:
            return self.config.start_scn
        if self.start_time:
            if catalog is None:
                raise ConfigurationError(
                    10024,
                    "start-time positioning requires an online catalog "
                    "(reference: ReplicatorOnline::positionReader only)",
                )
            return catalog.scn_from_time(self.start_time)
        if self.start_time_rel:
            if catalog is None:
                raise ConfigurationError(
                    10026,
                    "start-time-rel positioning requires an online "
                    "catalog",
                )
            return catalog.scn_from_time_relative(self.start_time_rel)
        return None

    def pipeline_kwargs(self) -> dict:
        """Everything the writer spec contributes to ``build_pipeline``,
        so migration is literally ``build_pipeline(spark, dep.config,
        redo_dir, checkpoint, **dep.pipeline_kwargs())``: the sink
        mapping, Kafka endpoint, the T6 ``max-message-mb`` cap, and the
        file writer's output directory when one is configured."""
        kw: dict = {
            "sink": self.spark_sink(),
            "max_message_mb": self.writer.max_message_mb,
        }
        if self.state_path:
            # the state element's path is where the reference persists
            # its portable documents — without this, interval-s/
            # interval-mb doc pacing and doc-based cold-start
            # positioning never engage on the literal migration path
            kw["state_dir"] = self.state_path
        if self.writer.type == "kafka":
            kw["kafka_bootstrap"] = self.writer.brokers
            kw["kafka_topic"] = self.writer.topic or "olr.events"
        if self.writer.type in ("network", "zeromq"):
            # the reference's WriterStream binds at the configured uri
            # during startup (StreamNetwork::initializeServer /
            # StreamZeroMQ's zmq_bind); constructing the server here is
            # that moment — without it the advertised one-call literal
            # migration raised for two of the reference's writer types
            # (r12 review-pass-6). Callers that manage their own server
            # can still override network_server after the fact.
            kw["network_server"] = self.stream_server()
        if self.writer.type == "file" and self.writer.output:
            # a named output engages the reference's single-file writer
            # with its rotation contract (max-file-size + %i/%t/%s masks,
            # new-line, append — WriterFile.cpp:41-360). Constructing it
            # here IS the reference's WriterFile::initialize moment:
            # mask validation and the NUM-mode directory scan run now,
            # and their 30005/30006/30007/10012 failures surface at
            # wiring time exactly like the reference's startup. out_dir
            # is still supplied for callers that override the sink
            kw["file_writer"] = self.writer.rotating_writer()
            kw["out_dir"] = os.path.dirname(self.writer.output) or "."
        # any format pairs with any writer (the reference's builder is
        # orthogonal to its writer): the payload format follows the
        # source format element — protobuf deployments ship
        # protobuf-framed messages through file/kafka/network sinks,
        # json/debezium ship the json builder's bytes
        kw["payload_format"] = (
            "protobuf" if self.format_type == "protobuf" else "json"
        )
        if (
            self.format_type == "protobuf"
            and self.writer.type == "file"
            and not self.writer.output
        ):
            # no output = stdout in the reference (raw protobuf frames
            # to the terminal); the distributed json part-file sink this
            # case otherwise maps to cannot carry protobuf bytes — fail
            # loudly (numbered, like every config rejection) rather
            # than write the wrong format silently
            raise ConfigurationError(
                30001,
                "protobuf format with an output-less file writer maps "
                "to the reference's stdout stream, which has no Spark "
                'analog; set writer "output" to engage the single-file '
                "sink (protobuf frames), or use the network/kafka sink",
            )
        return kw

    def stream_server(self):
        """Bind the W4/W5 delivery server at the writer's ``uri``.
        Network uris are ``host:port`` (missing ':' → the reference's
        30008, StreamNetwork.cpp:58-60); zeromq uris carry the
        ``tcp://`` scheme the reference hands to zmq_bind
        (StreamZeroMQ.cpp:39-60) — accepted with or without it here.
        The deployment's ``state.path`` rides along so checkpoint-doc
        persistence engages exactly as on the file path."""
        from openlogreplicator_spark.streaming.stream_network import (
            StreamServer,
            ZmqStreamServer,
        )

        uri = self.writer.uri
        if self.writer.type == "zeromq" and uri.startswith("tcp://"):
            uri = uri[len("tcp://"):]
        if ":" not in uri:
            raise ConfigurationError(
                30008, f"uri is missing ':' in parameter: {self.writer.uri}"
            )
        host, _, port_s = uri.rpartition(":")
        try:
            port = int(port_s)
        except ValueError:
            raise ConfigurationError(
                30008, f"uri has invalid port in parameter: "
                f"{self.writer.uri}"
            ) from None
        cls = ZmqStreamServer if self.writer.type == "zeromq" else (
            StreamServer
        )
        return cls(
            self.db_name, host=host, port=port,
            state_dir=self.state_path or None,
        )

    def spark_sink(self) -> str:
        """build_pipeline `sink` for this writer type (W1-W6 mapping).
        A file writer with a named ``output`` maps to the rotating
        single-file sink; with no output the reference streams to
        stdout, which has no Spark analog — that case keeps the
        distributed json part-file sink and the caller's out_dir."""
        if self.writer.type == "file":
            return "file" if self.writer.output else "json"
        return {
            "discard": "noop",
            "kafka": "kafka",
            "network": "network",
            "zeromq": "network",   # W5 rides the W4 state machine (ZMTP)
        }[self.writer.type]


def _parse_format(
    fmt_json: dict, db_name: str, check: bool
) -> tuple[Format, str, dict]:
    _check_keys(fmt_json, _FORMAT_KEYS, '"format"', check)
    ftype = fmt_json.get("type")
    if ftype not in ("json", "debezium", "protobuf"):
        raise _bad("format", ftype, '"protobuf", "json" or "debezium"')

    unmodeled: dict = {}
    if ftype == "debezium":
        # preset block cpp:693-708 (scn/user bits are in the repo preset)
        fmt = debezium_preset().with_options(
            add_sequences=True, redo_thread=True, db_name=db_name
        )
    else:
        # reference defaults (cpp:676-695). The repo's Format defaults
        # differ on rid/db (documented in config.py); the adapter speaks
        # the REFERENCE defaults.
        fmt = Format(
            rid=RidFormat.SKIP,
            db=DbFormat.DEFAULT,
            xid=XidFormat.TEXT_HEX,
            timestamp=TimestampFormat.UNIX_NANO,  # the reference default
            db_name=db_name,
        )

    if "db" in fmt_json:
        val = _uint(fmt_json, "db", 0, 3)
        fmt = fmt.with_options(
            db=[DbFormat.DEFAULT, DbFormat.ADD_DML, DbFormat.ADD_DDL,
                DbFormat.ALL][val]
        )
    if "attributes" in fmt_json:
        # the bitmask maps directly (begin=1, dml=2, commit=4)
        fmt = fmt.with_options(
            attributes=_uint(fmt_json, "attributes", 0, 7)
        )
    if "interval-dts" in fmt_json:
        _uint(fmt_json, "interval-dts", 0, 10)
    if "interval-ytm" in fmt_json:
        _uint(fmt_json, "interval-ytm", 0, 4)
    if "message" in fmt_json:
        val = _uint(fmt_json, "message", 0, 31)
        if (val & _MSG_FULL) and (val & (_MSG_SKIP_BEGIN | _MSG_SKIP_COMMIT)):
            raise _bad(
                "message", val,
                f"BEGIN/COMMIT flag is unset ({_MSG_SKIP_BEGIN}/"
                f"{_MSG_SKIP_COMMIT}) together with FULL mode ({_MSG_FULL})",
            )
        fmt = fmt.with_options(
            message=MessageFormat.FULL
            if val & _MSG_FULL
            else MessageFormat.SHORT,
            add_sequences=bool(val & _MSG_ADD_SEQ) or fmt.add_sequences,
            skip_begin=bool(val & _MSG_SKIP_BEGIN),
            skip_commit=bool(val & _MSG_SKIP_COMMIT),
            add_offset=bool(val & _MSG_ADD_OFFSET),
        )
    if "rid" in fmt_json:
        val = _uint(fmt_json, "rid", 0, 1)
        fmt = fmt.with_options(rid=RidFormat.TEXT if val else RidFormat.SKIP)
    if "redo-thread" in fmt_json:
        val = _uint(fmt_json, "redo-thread", 0, 1)
        fmt = fmt.with_options(redo_thread=bool(val))
    if "xid" in fmt_json:
        fmt = fmt.with_options(xid=_XID_MAP[_uint(fmt_json, "xid", 0, 3)])
    # header timestamps render per timestampMetadataFormat in the
    # reference (appendTimestamp, BuilderJson.h:109); the "timestamp"
    # key controls COLUMN-value rendering, which this engine's parse
    # plane has already decoded to canonical strings — accepted,
    # validated, recorded
    if "timestamp-metadata" in fmt_json:
        val = _uint(fmt_json, "timestamp-metadata", 0, 15)
        fmt = fmt.with_options(timestamp=_TIMESTAMP_MAP[val])
    if "timestamp" in fmt_json:
        val = _uint(fmt_json, "timestamp", 0, 15)
        if "timestamp-metadata" not in fmt_json:
            # most deployments set only "timestamp"; honor it for the
            # header too rather than silently ignoring the knob
            fmt = fmt.with_options(timestamp=_TIMESTAMP_MAP[val])
        # column-value rendering is wired below via cfg.timestamp_column
    if "timestamp-tz" in fmt_json:
        _uint(fmt_json, "timestamp-tz", 0, 11)  # wired below via cfg
    if "timestamp-type" in fmt_json:
        # TIMESTAMP_TYPE bits (Format.h:92-99): COMMIT_VALUE=1, BEGIN=2,
        # DML=4 (per-op tm inside FULL envelopes — SHORT always carries
        # it), COMMIT=8
        val = _uint(fmt_json, "timestamp-type", 0, 15)
        fmt = fmt.with_options(
            tm_commit_value=bool(val & 1),
            tm_begin=bool(val & 2),
            tm_commit=bool(val & 8),
        )
    if "user-type" in fmt_json:
        # USER_TYPE bitmask maps directly (begin=1, dml=2, commit=4,
        # ddl=8)
        fmt = fmt.with_options(
            show_user=_uint(fmt_json, "user-type", 0, 15)
        )
    if "char" in fmt_json:
        # CHAR_FORMAT bits (Format.h:42-46): HEX dominates the visible
        # rendering (Builder.h:1129/1184); NOMAPPING alone passes bytes
        # through untranslated
        _uint(fmt_json, "char", 0, 3)
    if "scn" in fmt_json:
        val = _uint(fmt_json, "scn", 0, 1)
        fmt = fmt.with_options(scn=ScnFormat.HEX if val else ScnFormat.DEC)
    if "scn-type" in fmt_json:
        # SCN_TYPE bits (Format.h:101-108): COMMIT_VALUE=1 (scn shows
        # the commit SCN), BEGIN=2 (b_scn), DML=4 (per-op scn in FULL
        # envelopes — SHORT messages always carry it), COMMIT=8 (e_scn)
        val = _uint(fmt_json, "scn-type", 0, 15)
        fmt = fmt.with_options(
            scn_type=ScnType.COMMIT_VALUE if val & 1 else ScnType.DEFAULT,
            scn_begin=bool(val & 2),
            scn_commit=bool(val & 8),
        )
    if "unknown" in fmt_json:
        val = _uint(fmt_json, "unknown", 0, 1)
        fmt = fmt.with_options(
            unknown=UnknownFormat.DUMP if val else UnknownFormat.QUESTION_MARK
        )
    if "schema" in fmt_json:
        # SCHEMA_FORMAT bitmask (Format.h:110-116): FULL=1 gates the
        # column descriptors entirely; REPEATED=2 only disables the
        # once-per-table memo WHEN FULL is set (isSchemaFormatRepeated
        # is read solely inside the isSchemaFormatFull branch,
        # BuilderProtobuf.h:218-223 / BuilderJson) — REPEATED alone
        # emits no descriptors. OBJ=4 is accepted; this repo emits the
        # obj field unconditionally (self-describing default, like the
        # rid/db notes in config.py).
        val = _uint(fmt_json, "schema", 0, 7)
        if (val & 1) and (val & 2):
            fmt = fmt.with_options(schema=SchemaFormat.REPEATED)
        elif val & 1:
            fmt = fmt.with_options(schema=SchemaFormat.FULL)
        else:
            fmt = fmt.with_options(schema=SchemaFormat.OBJ)
    if "column" in fmt_json:
        val = _uint(fmt_json, "column", 0, 2)
        fmt = fmt.with_options(
            column=[ColumnFormat.CHANGED, ColumnFormat.FULL_INS_DEC,
                    ColumnFormat.FULL_UPD][val]
        )
    if "unknown-type" in fmt_json:
        val = _uint(fmt_json, "unknown-type", 0, 1)
        fmt = fmt.with_options(
            unknown_type=UnknownType.SHOW if val else UnknownType.HIDE
        )
    if "flush-buffer" in fmt_json:
        unmodeled["flush-buffer"] = fmt_json["flush-buffer"]

    return fmt, ftype, unmodeled


def _parse_tag(tag: str, separator: str) -> tuple[str, ...]:
    """SchemaElement::parseTag: '[pk]' keys by the primary key (the
    builder's tag_expr already falls back to key columns when tag is
    empty — exactly [pk] semantics); '[all]' keys by the full image
    (coalesced to the same fallback here); else a separator list."""
    if tag in ("[pk]", "[all]"):
        return ()
    return tuple(t for t in tag.split(separator) if t)


def from_reference_json(source) -> ReferenceDeployment:
    """Parse a reference ``OpenLogReplicator.json`` (path, JSON string,
    or already-loaded dict) into a :class:`ReferenceDeployment`."""
    if isinstance(source, dict):
        doc = source
    else:
        text = source
        if isinstance(source, (str, os.PathLike)) and os.path.exists(source):
            size = os.stat(source).st_size
            if size == 0:
                raise ConfigurationError(
                    10004, f"file: {source} - wrong size: 0"
                )
            with open(source) as fh:
                text = fh.read()
        try:
            doc = json.loads(text)
        except json.JSONDecodeError as e:
            raise ConfigurationError(
                20001, f"parse error: {e.msg} at offset {e.pos}"
            ) from e

    # reader "disable-checks" bit 1 = DISABLE_CHECKS::JSON_TAGS
    disable_checks = 0
    try:
        disable_checks = int(
            doc["source"][0]["reader"].get("disable-checks", 0)
        )
    except (KeyError, IndexError, TypeError, ValueError):
        pass
    if disable_checks > 15:
        raise _bad("disable-checks", disable_checks, "one of {0 .. 15}")
    check = not (disable_checks & 1)

    _check_keys(doc, _DOCUMENT_KEYS, "document", check)

    version = doc.get("version")
    if version != SCHEMA_VERSION:
        raise ConfigurationError(
            30001,
            f'bad JSON, invalid "version" value: {version}, '
            f"expected: {SCHEMA_VERSION}",
        )

    memory_max_mb = 1024
    memory_present = False
    # accepted-key discipline (r8 VERDICT): every key below either
    # drives behavior, rejects with the reference's error, or is
    # validated and RECORDED here — never silently dropped
    tuning_unmodeled: dict = {}

    # document-level diagnostics (cpp:204-235): the redo-dump knobs are
    # WIRED (ReferenceDeployment.write_redo_dumps renders the LogMiner-
    # style dump per input file, Parser.cpp:1272 naming); log-level and
    # trace shift only the reference's own logger — validated, recorded
    dump_redo = 0
    dump_raw = 0
    dump_path = "."
    if "dump-redo-log" in doc:
        dump_redo = _uint(doc, "dump-redo-log", 0, 2)
        if dump_redo > 0:
            if "dump-raw-data" in doc:
                dump_raw = _uint(doc, "dump-raw-data", 0, 1)
            dump_path = doc.get("dump-path", ".")
    if "log-level" in doc:
        _uint(doc, "log-level", 0, 4)
    if "trace" in doc:
        _uint(doc, "trace", 0, 1_048_575)
    for k in ("log-level", "trace"):
        if k in doc:
            tuning_unmodeled[k] = doc[k]

    memory_swap_path = ""
    if "memory" in doc:
        _check_keys(doc["memory"], _MEMORY_KEYS, '"memory"', check)
        # getJsonFieldU64 (cpp:275) — string/negative values reject here
        # instead of breaking arithmetic deep in the engine
        memory_max_mb = (
            _uint(doc["memory"], "max-mb", 0, 2**63 - 1)
            if "max-mb" in doc["memory"] else 1024
        )
        memory_present = True
        memory_swap_path = doc["memory"].get("swap-path", "")
        # the remaining memory element keys are allocator tuning the
        # Spark executor-memory model subsumes — recorded, not wired
        mem_tuning = {
            k: v for k, v in doc["memory"].items()
            if k not in ("max-mb", "swap-path")
        }
        if mem_tuning:
            tuning_unmodeled["memory-tuning"] = mem_tuning

    metrics_bind = ""
    metrics_tag_names = "none"
    if "metrics" in doc:
        _check_keys(doc["metrics"], _METRICS_KEYS, '"metrics"', check)
        if doc["metrics"].get("type") != "prometheus":
            raise _bad("type", doc["metrics"].get("type"), '"prometheus"')
        metrics_bind = doc["metrics"].get("bind", "")
        # TAG_NAMES (cpp:378-395): which counter families carry
        # owner/table labels in the exposition
        metrics_tag_names = doc["metrics"].get("tag-names", "none")
        if metrics_tag_names not in ("none", "filter", "sys", "all"):
            raise _bad(
                "tag-names", metrics_tag_names,
                'one of {"all", "filter", "none", "sys"}',
            )

    state_path = ""
    checkpoint_interval_s = 600    # ctx->checkpointIntervalS (Ctx.h:206)
    checkpoint_interval_mb = 500   # ctx->checkpointIntervalMb (Ctx.h:207)
    state_keep_checkpoints = 100   # ctx->checkpointKeep default
    schema_force_interval = 20     # ctx->schemaForceInterval (Ctx.h:209)
    if "state" in doc:
        _check_keys(doc["state"], _STATE_KEYS, '"state"', check)
        state_path = doc["state"].get("path", "checkpoint")
        # getJsonFieldU64 (cpp:444-445)
        checkpoint_interval_s = (
            _uint(doc["state"], "interval-s", 0, 2**63 - 1)
            if "interval-s" in doc["state"] else 600
        )
        # byte cadence of the checkpoint document (cpp:447-448;
        # Metadata::writeCheckpoint pacing, Metadata.cpp:421-424): the
        # doc also advances when the funnel sinks' rendered-byte
        # counters cross this threshold — wired to stream_file_sink
        checkpoint_interval_mb = (
            _uint(doc["state"], "interval-mb", 0, 2**63 - 1)
            if "interval-mb" in doc["state"]
            else 500
        )
        # checkpoint GC depth (cpp:450-451; Metadata.cpp:584-596);
        # getJsonFieldU64 semantics — non-uint rejects
        state_keep_checkpoints = (
            _uint(doc["state"], "keep-checkpoints", 0, 2**63 - 1)
            if "keep-checkpoints" in doc["state"]
            else 100
        )
        # schema-rewrite cadence (cpp:453-454; Metadata.cpp:426-436) —
        # wired to export_schema_paced's storeSchema pacing
        schema_force_interval = (
            _uint(doc["state"], "schema-force-interval", 0, 2**63 - 1)
            if "schema-force-interval" in doc["state"]
            else 20
        )

    sources = doc.get("source")
    if not isinstance(sources, list) or len(sources) != 1:
        raise _bad(
            "source",
            0 if not isinstance(sources, list) else len(sources),
            "1 element",
        )
    src = sources[0]
    _check_keys(src, _SOURCE_KEYS, '"source"', check)
    alias = _require(src, "alias")
    db_name = _require(src, "name")

    if "memory" in src:
        # the reference's source-level allowed-key list includes
        # "memory" but OpenLogReplicator.cpp:248 reads the element at
        # the DOCUMENT level only — it never key-checks what it never
        # reads, so neither do we; record the ignored element verbatim
        # so the drop is visible instead of silent
        unmodeled_src_memory = src["memory"]
    else:
        unmodeled_src_memory = None

    # getJsonFieldU64 + the 524287 ceiling (cpp:517-521): negative and
    # non-int values reject like the reference's uint parse — a negative
    # flags previously passed the `> 524287` check alone and silently
    # enabled EVERY behavior bit via two's-complement (r12 review-pass-6)
    flags = _uint(src, "flags", 0, 524287) if "flags" in src else 0
    # REDO_FLAGS (Ctx.h:86-106): every bit the engine has a knob for is
    # forwarded; ARCH_ONLY/DIRECT_DISABLE/
    # CHECKPOINT_KEEP/VERIFY_SCHEMA/RAW_COLUMN_DATA (bits 0,3,13-15)
    # and EXPERIMENTAL_NOT_NULL_MISSING (18) describe reader/runtime
    # behavior Spark supplies or that has no analog — accepted,
    # recorded in `flags`, intentionally not wired.
    schema_mode = "dict"
    if flags & (1 << 1):          # SCHEMALESS
        schema_mode = "schemaless"
    if flags & (1 << 2):          # ADAPTIVE_SCHEMA
        schema_mode = "adaptive"
    fmt_experimental_json = bool(flags & (1 << 17))  # EXPERIMENTAL_JSON
    flag_kwargs = dict(
        # bit 4 IGNORE_DATA_ERRORS (Parser.cpp:1468-1479): per-record
        # skip-and-continue on data corruption, warning 60013
        ignore_data_errors=bool(flags & (1 << 4)),
        show_ddl=bool(flags & (1 << 5)),
        show_hidden_columns=bool(flags & (1 << 6)),
        show_guard_columns=bool(flags & (1 << 7)),
        show_nested_columns=bool(flags & (1 << 8)),
        show_unused_columns=bool(flags & (1 << 9)),
        show_incomplete_transactions=bool(flags & (1 << 10)),
        show_system_transactions=bool(flags & (1 << 11)),
        show_checkpoint=bool(flags & (1 << 12)),
        experimental_xmltype=bool(flags & (1 << 16)),
    )

    # source-level reader pacing (cpp:887-907): poll/sleep/retry tuning
    # for the reference's reader threads — Spark's trigger scheduling
    # subsumes the cadence; validated (arch-read-tries range per
    # cpp:895-899), recorded
    if "arch-read-tries" in src:
        _uint(src, "arch-read-tries", 1, 1_000_000_000)
    for k in ("arch-read-sleep-us", "arch-read-tries",
              "redo-read-sleep-us", "redo-verify-delay-us",
              "refresh-interval-us"):
        if k in src:
            tuning_unmodeled[k] = src[k]
    # archived-log discovery strategy (cpp:936-950): "path" (directory
    # scan — this engine's S4 scheduler) vs "online"/"online-keep"
    # (V$ARCHIVED_LOG via the live connection); value-checked with the
    # reference's set, recorded — the online catalog models discovery
    # through its own query surface
    if "arch" in src:
        if src["arch"] not in ("path", "online", "online-keep"):
            raise _bad(
                "arch", src["arch"],
                'one of {"path", "online", "online-keep"}',
            )
        tuning_unmodeled["arch"] = src["arch"]

    reader = _require(src, "reader")
    _check_keys(reader, _READER_KEYS, '"reader"', check)
    reader_type = reader.get("type")
    if reader_type not in ("online", "offline", "batch"):
        raise _bad(
            "type", reader_type, 'one of {"online", "offline", "batch"}'
        )
    # reader timezones (cpp:911-925): db-timezone drives TSLTZ decode
    # (wired into EngineConfig.db_timezone_seconds → the parse plane);
    # host-timezone drives every rendered timestamp's toEpoch shift
    # (wired into Format.host_tz_seconds → both builders);
    # log-timezone only shifts the reference's own log-line clock —
    # validated, recorded
    db_timezone_seconds = _tz_field(reader, "db-timezone")
    host_timezone_seconds = _tz_field(reader, "host-timezone")
    log_timezone_seconds = _tz_field(reader, "log-timezone")
    if log_timezone_seconds is not None:
        tuning_unmodeled["log-timezone"] = reader["log-timezone"]
    if reader_type == "online":
        for req in ("user", "password", "server"):
            if req not in reader:
                raise _bad(req, None, "set for online reader")
    if reader_type == "batch" and "redo-log" not in reader:
        raise _bad("redo-log", None, "set for batch reader")

    # getJsonFieldU64/U32 (cpp:534-543)
    start_scn = (
        _uint(reader, "start-scn", 0, 2**63 - 1)
        if "start-scn" in reader else None
    )
    start_seq = (
        _uint(reader, "start-seq", 0, 2**32 - 1)
        if "start-seq" in reader else None
    )
    start_time_rel = (
        _uint(reader, "start-time-rel", 0, 2**63 - 1)
        if "start-time-rel" in reader else 0
    )
    start_time = reader.get("start-time", "")
    if start_time_rel and start_scn is not None:
        raise _bad(
            "start-time-rel", start_time_rel,
            f'unset when "start-scn" is set ({start_scn})',
        )
    if start_time:
        if start_scn is not None:
            raise _bad(
                "start-time", start_time,
                f'unset when "start-scn" is set ({start_scn})',
            )
        if start_time_rel:
            raise _bad(
                "start-time", start_time,
                f'unset when "start-time-rel" is set ({start_time_rel})',
            )

    path_mapping = tuple(reader.get("path-mapping", ()))
    if len(path_mapping) % 2 != 0:
        raise _bad(
            "path-mapping", len(path_mapping), "even number of elements"
        )

    # getJsonFieldU64 (cpp:600-606): uint-validated BEFORE the max-mb
    # comparison, so a string value rejects with 30001 rather than a
    # TypeError at the `>` (r12 review-pass-6)
    transaction_max_mb = (
        _uint(src, "transaction-max-mb", 0, 2**63 - 1)
        if "transaction-max-mb" in src else 1024
    )
    if "transaction-max-mb" in src and transaction_max_mb > memory_max_mb:
        raise _bad(
            "transaction-max-mb", transaction_max_mb,
            f'smaller than "max-mb" ({memory_max_mb})',
        )

    if "debug" in src:
        _check_keys(src["debug"], _DEBUG_KEYS, '"debug"', check)
        # test-harness stop triggers (Parser.cpp:835-843,1524): halt
        # after N checkpoints/log-switches/transactions, or when the
        # named owner.table is touched — instrumentation for the
        # reference's own test suite; validated, recorded
        dbg = src["debug"]
        for k in ("stop-checkpoints", "stop-log-switches",
                  "stop-transactions"):
            if k in dbg:
                _uint(dbg, k, 0, 2**63 - 1)
        # the owner/table pair is read (and its absence rejected) only
        # when SCHEMALESS is off — under schemaless the reference never
        # touches the pair (cpp:593-597 guards on the flag)
        if schema_mode != "schemaless" and (
            ("owner" in dbg) != ("table" in dbg)
        ):
            raise _bad(
                "owner" if "table" in dbg else "table", None,
                'both "owner" and "table" set together',
            )
        tuning_unmodeled["debug"] = dict(dbg)

    fmt, format_type, unmodeled = _parse_format(
        _require(src, "format"), db_name, check
    )
    if fmt_experimental_json:
        fmt = fmt.with_options(experimental_json=True)
    if host_timezone_seconds is not None:
        fmt = fmt.with_options(host_tz_seconds=host_timezone_seconds)
    if schema_mode == "schemaless" and src["format"].get("column", 0) != 0:
        raise _bad(
            "column", src["format"]["column"],
            "not used when flags has set schemaless mode "
            f"(flags: {flags})",
        )

    selectors: list[TableSelector] = []
    skip_xid: tuple[str, ...] = ()
    dump_xid: tuple[str, ...] = ()
    if "filter" in src:
        filt = src["filter"]
        _check_keys(filt, _FILTER_KEYS, '"filter"', check)
        separator = filt.get("separator", ",")
        for el in filt.get("table", ()):
            _check_keys(el, _TABLE_KEYS, '"table"', check)
            selectors.append(
                TableSelector(
                    owner=_require(el, "owner"),
                    table=_require(el, "table"),
                    key=tuple(
                        k for k in el.get("key", "").split(separator) if k
                    ),
                    tag=_parse_tag(el.get("tag", ""), separator),
                    condition=el.get("condition", ""),
                )
            )
        skip_xid = tuple(filt.get("skip-xid", ()))
        dump_xid = tuple(filt.get("dump-xid", ()))
    if not selectors:
        selectors.append(TableSelector())

    targets = doc.get("target")
    if not isinstance(targets, list) or len(targets) != 1:
        raise _bad(
            "target",
            0 if not isinstance(targets, list) else len(targets),
            "1 element",
        )
    tgt = targets[0]
    # NOTE: the reference runs NO checkJsonFields over the target
    # element itself (cpp:1070-1085 — there is no targetNames list), so
    # unknown target-level keys are accepted here too; its required
    # fields still reject when absent (getJsonFieldS/O → 20003)
    tgt_alias = _require(tgt, "alias")
    if _require(tgt, "source") != alias:
        raise _bad(
            "source", tgt.get("source"),
            'value used earlier in "source" field',
        )

    writer_json = _require(tgt, "writer")
    _check_keys(writer_json, _WRITER_KEYS, '"writer"', check)
    wtype = writer_json.get("type")
    if wtype not in ("file", "kafka", "zeromq", "network", "discard"):
        raise _bad(
            "type", wtype,
            'one of {"file", "kafka", "zeromq", "network", "discard"}',
        )
    if "poll-interval-us" in writer_json:
        _uint(writer_json, "poll-interval-us", 100, 3_600_000_000)
    if "queue-size" in writer_json:
        _uint(writer_json, "queue-size", 1, 1_000_000)
    if "new-line" in writer_json:
        _uint(writer_json, "new-line", 0, 2)
    if "append" in writer_json:
        _uint(writer_json, "append", 0, 1)
    if "max-message-mb" in writer_json:
        _uint(writer_json, "max-message-mb", 1, 953)
    if "write-buffer-flush-size" in writer_json:
        # validated like the reference (cpp:1152-1157); the flush-size
        # double-buffer itself is subsumed by Python's buffered IO
        _uint(writer_json, "write-buffer-flush-size", 0, 1_048_576)
    if "max-file-size" in writer_json:
        _uint(writer_json, "max-file-size", 0, 2**63 - 1)  # cpp:1123-1124
    if wtype == "file" and writer_json.get("max-file-size", 0) > 0 and not (
        writer_json.get("output")
    ):
        raise _bad(
            "output", "",
            'to be set when "max-file-size" is set '
            f"({writer_json['max-file-size']})",
        )
    if wtype == "kafka" and "topic" not in writer_json:
        raise _bad("topic", None, "set for kafka writer")
    if wtype in ("zeromq", "network") and "uri" not in writer_json:
        raise _bad("uri", None, f"set for {wtype} writer")

    props = dict(writer_json.get("properties", {}))
    writer = WriterSpec(
        type=wtype,
        topic=writer_json.get("topic", ""),
        brokers=props.get(
            "bootstrap.servers", writer_json.get("brokers", "")
        ),
        uri=writer_json.get("uri", ""),
        output=writer_json.get("output", ""),
        new_line=writer_json.get("new-line", 1),
        append=writer_json.get("append", 1),
        max_file_size=writer_json.get("max-file-size", 0),
        timestamp_format=writer_json.get("timestamp-format", "%F_%T"),
        max_message_mb=writer_json.get("max-message-mb", 100),
        properties=props,
    )

    # INTERVAL_DTS/YTM rendering: reference defaults are the numeric
    # forms (UNIX_NANO / MONTHS, cpp:680-681); the debezium preset
    # forces ISO8601_COMMA / STRING_YM_DASH (cpp:696-697)
    fmt_json = src["format"]
    if format_type == "debezium":
        dts_default, ytm_default = "iso8601_comma", "string_ym_dash"
    else:
        dts_default, ytm_default = "unix_nano", "months"
    interval_dts = (
        _INTERVAL_DTS_MAP[fmt_json["interval-dts"]]
        if "interval-dts" in fmt_json
        else dts_default
    )
    interval_ytm = (
        _INTERVAL_YTM_MAP[fmt_json["interval-ytm"]]
        if "interval-ytm" in fmt_json
        else ytm_default
    )
    # TIMESTAMP_TZ_FORMAT: reference default UNIX_NANO_STRING (cpp:688)
    timestamp_tz = _TSTZ_MAP[fmt_json.get("timestamp-tz", 0)]
    # TIMESTAMP_FORMAT for column values: reference default UNIX_NANO
    timestamp_column = _TS_COL_MAP[fmt_json.get("timestamp", 0)]
    char_val = fmt_json.get("char", 0)
    char_format = (
        "hex" if char_val & 2 else "nomapping" if char_val & 1 else "default"
    )

    cfg = EngineConfig(
        fmt=fmt,
        selectors=tuple(selectors),
        skip_xid=skip_xid,
        start_scn=start_scn,
        start_seq=start_seq,
        transaction_max_mb=transaction_max_mb,
        checkpoint_interval_s=checkpoint_interval_s,
        checkpoint_interval_mb=checkpoint_interval_mb,
        schema_mode=schema_mode,
        interval_dts=interval_dts,
        interval_ytm=interval_ytm,
        timestamp_tz=timestamp_tz,
        timestamp_column=timestamp_column,
        char_format=char_format,
        memory_max_mb=memory_max_mb if memory_present else None,
        memory_swap_path=memory_swap_path,
        **(
            {"db_timezone_seconds": db_timezone_seconds}
            if db_timezone_seconds is not None
            else {}
        ),
        **flag_kwargs,
    )
    return ReferenceDeployment(
        config=cfg,
        source_alias=alias,
        target_alias=tgt_alias,
        db_name=db_name,
        reader_type=reader_type,
        format_type=format_type,
        writer=writer,
        redo_logs=tuple(reader.get("redo-log", ())),
        path_mapping=path_mapping,
        server=reader.get("server", ""),
        user=reader.get("user", ""),
        start_seq=start_seq,
        start_time=start_time,
        start_time_rel=start_time_rel,
        state_path=state_path,
        state_keep_checkpoints=state_keep_checkpoints,
        schema_force_interval=schema_force_interval,
        metrics_bind=metrics_bind,
        metrics_tag_names=metrics_tag_names,
        dump_redo_log=dump_redo,
        dump_raw_data=dump_raw,
        dump_path=dump_path,
        redo_copy_path=reader.get("redo-copy-path", ""),
        flags=flags,
        log_archive_format=reader.get("log-archive-format", ""),
        dump_xid=dump_xid,
        unmodeled={
            **unmodeled,
            **tuning_unmodeled,
            **(
                {"source-memory-ignored": unmodeled_src_memory}
                if unmodeled_src_memory is not None
                else {}
            ),
        },
    )
