"""S2 online source discovery — the reference's startup conversation
with the database's catalog, re-expressed over DB-API.

ReplicatorOnline (src/replicator/ReplicatorOnline.cpp:84-377,
ReplicatorOnline.h:34-200) connects to the source database at startup
and, before reading a single redo block, (1) verifies ARCHIVELOG mode
and supplemental logging from V$DATABASE, (2) captures the current SCN
and database timezone, (3) reads the resetlogs id from
V$DATABASE_INCARNATION, (4) lists archived logs from V$ARCHIVED_LOG /
maps an SCN to a sequence via V$LOG, and (5) snapshots the dictionary
(SYS.USER$ / OBJ$ / COL$ / CDEF$ / CCOL$ AS OF SCN) into its schema
store.

No Oracle driver or instance exists in this environment, so this
adapter speaks to ANY DB-API 2.0 connection exposing the same catalog
relations (tests use a DuckDB database holding the fixture catalog —
the queries keep the reference's table/column names, quoted where the
dialect needs it). Oracle-only syntax is mapped to portable SQL:
DECODE → CASE, SYS_CONTEXT('USERENV','DB_NAME') → V$DATABASE.NAME,
AS OF SCN → the snapshot SCN stamped into scn_from (the fixture catalog
is already the wanted snapshot). The OUTPUT contract is the engine's:
DICT_OBJ_SCHEMA / DICT_COL_SCHEMA frames, the positional dictionary for
KDO-resolve, and the start SCN — exactly what `build_pipeline` consumes.
"""

from __future__ import annotations

from dataclasses import dataclass, field


class UnsupportedDatabaseConfig(RuntimeError):
    """The source database cannot be replicated as configured — the
    reference refuses to start in the same situations (no ARCHIVELOG,
    no supplemental logging; ReplicatorOnline.cpp checks after
    SQL_GET_DATABASE_INFORMATION)."""


@dataclass
class DatabaseInfo:
    log_mode_archive: bool
    supp_log_min: bool
    supp_log_pk: bool
    supp_log_all: bool
    big_endian: bool
    banner: str
    db_name: str
    current_scn: int
    db_timezone: str
    resetlogs_id: int = 0
    extra: dict = field(default_factory=dict)


@dataclass(frozen=True)
class DbIncarnation:
    """One V$DATABASE_INCARNATION row (DbIncarnation.h fields read by
    SQL_GET_DATABASE_INCARNATION, ReplicatorOnline.h:75-86)."""

    incarnation: int
    resetlogs_scn: int
    prior_resetlogs_scn: int
    status: str
    resetlogs: int
    prior_incarnation: int

    @property
    def current(self) -> bool:
        return self.status == "CURRENT"


def select_incarnation(
    incarnations: list[DbIncarnation], old_resetlogs: int = 0
) -> DbIncarnation | None:
    """The reference's current-incarnation selection while loading the
    incarnation list (ReplicatorOnline.cpp:1504-1511): a checkpointed
    resetlogs id wins over the STATUS=CURRENT flag — after a resetlogs
    on the source, a restarted replicator must keep reading its own
    branch until the branch switch is performed explicitly."""
    chosen = None
    for oi in incarnations:
        if old_resetlogs != 0 and oi.resetlogs == old_resetlogs:
            return oi
        if oi.current and chosen is None:
            chosen = oi
    return chosen


def update_resetlogs(
    incarnations: list[DbIncarnation],
    current_resetlogs: int,
    next_scn: int,
) -> tuple[int, int] | None:
    """Replicator::updateResetlogs (Replicator.cpp:626-662): when the
    redo stream reaches ``next_scn`` and an incarnation exists whose
    resetlogs branch STARTS at that SCN and whose prior incarnation is
    the branch being read, the replicator hops onto the new branch —
    sequence numbering restarts at zero. Returns (new_resetlogs, 0) on
    a branch switch, None when the current branch simply continues;
    raises like the reference's 10045 when the tracked resetlogs id is
    not in the incarnation list at all."""
    current = None
    for oi in incarnations:
        if oi.resetlogs == current_resetlogs:
            current = oi
            break
    for oi in incarnations:
        if (
            current is not None
            and oi.resetlogs_scn == next_scn
            and current.resetlogs == current_resetlogs
            and oi.prior_incarnation == current.incarnation
        ):
            return oi.resetlogs, 0
    if not incarnations:
        return None
    if current is None:
        raise RuntimeError(
            f"10045: resetlogs ({current_resetlogs}) not found in "
            "incarnation list"
        )
    return None


class OnlineCatalog:
    """One discovery session over a DB-API connection."""

    def __init__(self, conn) -> None:
        self._conn = conn

    def _rows(self, sql: str, params: tuple = ()) -> list[tuple]:
        cur = self._conn.cursor()
        try:
            cur.execute(sql, params)
            return cur.fetchall()
        finally:
            cur.close()

    # -- V$ discovery (SQL_GET_DATABASE_INFORMATION et al.) ------------
    def database_information(self) -> DatabaseInfo:
        rows = self._rows(
            'SELECT'
            '  CASE WHEN D.LOG_MODE = \'ARCHIVELOG\' THEN 1 ELSE 0 END,'
            '  CASE WHEN D.SUPPLEMENTAL_LOG_DATA_MIN = \'NO\''
            '       THEN 0 ELSE 1 END,'
            '  CASE WHEN D.SUPPLEMENTAL_LOG_DATA_PK = \'YES\''
            '       THEN 1 ELSE 0 END,'
            '  CASE WHEN D.SUPPLEMENTAL_LOG_DATA_ALL = \'YES\''
            '       THEN 1 ELSE 0 END,'
            '  CASE WHEN TP.ENDIAN_FORMAT = \'Big\' THEN 1 ELSE 0 END,'
            '  VER.BANNER, D.NAME, D.CURRENT_SCN, D.DBTIMEZONE'
            ' FROM "V_$DATABASE" D'
            ' JOIN "V_$TRANSPORTABLE_PLATFORM" TP'
            '   ON TP.PLATFORM_NAME = D.PLATFORM_NAME'
            ' JOIN "V_$VERSION" VER'
            '   ON VER.BANNER LIKE \'%Oracle%Database%\''
        )
        if not rows:
            raise UnsupportedDatabaseConfig("V$DATABASE returned no rows")
        r = rows[0]
        info = DatabaseInfo(
            log_mode_archive=bool(r[0]),
            supp_log_min=bool(r[1]),
            supp_log_pk=bool(r[2]),
            supp_log_all=bool(r[3]),
            big_endian=bool(r[4]),
            banner=str(r[5]),
            db_name=str(r[6]),
            current_scn=int(r[7]),
            db_timezone=str(r[8]),
        )
        # the reference refuses to start without these
        # (ReplicatorOnline.cpp: "database not in ARCHIVELOG mode" /
        # "SUPPLEMENTAL_LOG_DATA_MIN missing")
        if not info.log_mode_archive:
            raise UnsupportedDatabaseConfig(
                "database not in ARCHIVELOG mode; "
                "run: SHUTDOWN IMMEDIATE; STARTUP MOUNT; "
                "ALTER DATABASE ARCHIVELOG; ALTER DATABASE OPEN;"
            )
        if not info.supp_log_min:
            raise UnsupportedDatabaseConfig(
                "SUPPLEMENTAL_LOG_DATA_MIN missing; run: ALTER DATABASE "
                "ADD SUPPLEMENTAL LOG DATA;"
            )
        inc = self._rows(
            'SELECT RESETLOGS_ID FROM "V_$DATABASE_INCARNATION"'
            ' WHERE STATUS = \'CURRENT\''
        )
        if inc:
            info.resetlogs_id = int(inc[0][0])
        return info

    def current_scn(self) -> int:
        return int(self._rows('SELECT CURRENT_SCN FROM "V_$DATABASE"')[0][0])

    def database_role(self) -> str:
        """SQL_GET_DATABASE_ROLE (ReplicatorOnline.h:88-94). The
        reference accepts exactly PRIMARY and PHYSICAL STANDBY and
        aborts on anything else (cpp:1464-1476 → error 10038)."""
        role = str(
            self._rows('SELECT DATABASE_ROLE FROM "V_$DATABASE"')[0][0]
        )
        if role not in ("PRIMARY", "PHYSICAL STANDBY"):
            raise UnsupportedDatabaseConfig(
                f"10038: unknown database role: {role}"
            )
        return role

    def incarnations(self) -> list[DbIncarnation]:
        """SQL_GET_DATABASE_INCARNATION (ReplicatorOnline.h:75-86): the
        full incarnation tree, feeding select_incarnation /
        update_resetlogs branch handling."""
        rows = self._rows(
            'SELECT "INCARNATION#", "RESETLOGS_CHANGE#",'
            '       "PRIOR_RESETLOGS_CHANGE#", STATUS, RESETLOGS_ID,'
            '       "PRIOR_INCARNATION#"'
            ' FROM "V_$DATABASE_INCARNATION"'
        )
        return [
            DbIncarnation(
                incarnation=int(r[0]),
                resetlogs_scn=int(r[1]),
                prior_resetlogs_scn=int(r[2] or 0),
                status=str(r[3]),
                resetlogs=int(r[4]),
                prior_incarnation=int(r[5] or 0),
            )
            for r in rows
        ]

    def archive_log_list(
        self, min_sequence: int, resetlogs_id: int
    ) -> list[dict]:
        """SQL_GET_ARCHIVE_LOG_LIST: the archived-redo work list the S4
        scheduler consumes."""
        rows = self._rows(
            'SELECT NAME, "SEQUENCE#", "FIRST_CHANGE#", "NEXT_CHANGE#"'
            ' FROM "V_$ARCHIVED_LOG"'
            ' WHERE "SEQUENCE#" >= ? AND RESETLOGS_ID = ?'
            '   AND NAME IS NOT NULL'
            ' ORDER BY "SEQUENCE#"',
            (min_sequence, resetlogs_id),
        )
        return [
            {
                "name": r[0],
                "sequence": int(r[1]),
                "first_scn": int(r[2]),
                "next_scn": int(r[3]),
            }
            for r in rows
        ]

    def sequence_from_scn(self, scn: int, resetlogs_id: int) -> int | None:
        """SQL_GET_SEQUENCE_FROM_SCN: the redo sequence to start at for
        a requested SCN (online + archived logs)."""
        rows = self._rows(
            'SELECT MAX(SEQ) FROM ('
            '  SELECT "SEQUENCE#" AS SEQ FROM "V_$LOG"'
            '   WHERE "FIRST_CHANGE#" - 1 <= ?'
            '  UNION'
            '  SELECT "SEQUENCE#" FROM "V_$ARCHIVED_LOG"'
            '   WHERE "FIRST_CHANGE#" - 1 <= ? AND RESETLOGS_ID = ?'
            ') t(SEQ)',
            (scn, scn, resetlogs_id),
        )
        v = rows[0][0] if rows else None
        return None if v is None else int(v)

    def sequence_from_scn_standby(
        self, scn: int, resetlogs_id: int
    ) -> int | None:
        """SQL_GET_SEQUENCE_FROM_SCN_STANDBY (ReplicatorOnline.h:
        139-156): on a PHYSICAL STANDBY the online groups live in
        V$STANDBY_LOG, so the sequence resolution unions that view with
        the archived list instead of V$LOG (cpp:293-304)."""
        rows = self._rows(
            'SELECT MAX(SEQ) FROM ('
            '  SELECT "SEQUENCE#" AS SEQ FROM "V_$STANDBY_LOG"'
            '   WHERE "FIRST_CHANGE#" - 1 <= ?'
            '  UNION'
            '  SELECT "SEQUENCE#" FROM "V_$ARCHIVED_LOG"'
            '   WHERE "FIRST_CHANGE#" - 1 <= ? AND RESETLOGS_ID = ?'
            ') t(SEQ)',
            (scn, scn, resetlogs_id),
        )
        v = rows[0][0] if rows else None
        return None if v is None else int(v)

    def resolve_start_sequence(
        self, scn: int, resetlogs_id: int
    ) -> int | None:
        """Role-aware startup positioning: the standby resolution path
        when DATABASE_ROLE says PHYSICAL STANDBY, the primary path
        otherwise (cpp:286-311)."""
        if self.database_role() == "PHYSICAL STANDBY":
            return self.sequence_from_scn_standby(scn, resetlogs_id)
        return self.sequence_from_scn(scn, resetlogs_id)

    def scn_from_time(self, start_time: str) -> int:
        """SQL_GET_SCN_FROM_TIME (ReplicatorOnline.h:114-115;
        positionReader cpp:236-254): resolve a wall-clock 'start-time'
        to the SCN via TIMESTAMP_TO_SCN. Standby databases reject time
        positioning (BootException 10024); an unresolvable time is
        10025."""
        if self.database_role() == "PHYSICAL STANDBY":
            raise UnsupportedDatabaseConfig(
                "10024: can't position by time for standby database"
            )
        rows = self._rows(
            "SELECT TIMESTAMP_TO_SCN("
            "TO_DATE(?, 'YYYY-MM-DD HH24:MI:SS')) FROM DUAL",
            (start_time,),
        )
        if not rows or rows[0][0] is None:
            raise UnsupportedDatabaseConfig(
                f"10025: can't find scn for: {start_time}"
            )
        return int(rows[0][0])

    def scn_from_time_relative(self, seconds: int) -> int:
        """SQL_GET_SCN_FROM_TIME_RELATIVE (ReplicatorOnline.h:117-118;
        cpp:255-273): 'start-time-rel' seconds before now → SCN.
        Standby rejects (10026); unresolvable is 10025."""
        if self.database_role() == "PHYSICAL STANDBY":
            raise UnsupportedDatabaseConfig(
                "10026: can't position by relative time for standby "
                "database"
            )
        rows = self._rows(
            "SELECT TIMESTAMP_TO_SCN(SYSDATE - (?/24/3600)) FROM DUAL",
            (seconds,),
        )
        if not rows or rows[0][0] is None:
            raise UnsupportedDatabaseConfig(
                f"10025: can't find scn for time-rel: {seconds}"
            )
        return int(rows[0][0])

    # -- SYS.* dictionary snapshot --------------------------------------
    def dictionary_rows(
        self, snapshot_scn: int, owner_like: str = "%"
    ) -> tuple[list[tuple], list[tuple]]:
        """SYS.USER$/OBJ$/COL$ (+ CDEF$/CCOL$ primary keys) → rows in
        DICT_OBJ_SCHEMA / DICT_COL_SCHEMA order. The reference reads
        these AS OF SCN; the adapter stamps the snapshot SCN into
        scn_from instead (the connection's catalog IS the snapshot)."""
        objs = self._rows(
            'SELECT O."OBJ#", O."DATAOBJ#", O."OWNER#", U.NAME, O.NAME'
            ' FROM "OBJ$" O JOIN "USER$" U ON U."USER#" = O."OWNER#"'
            ' WHERE O."TYPE#" = 2 AND U.NAME LIKE ?'
            ' ORDER BY O."OBJ#"',
            (owner_like,),
        )
        dict_obj = [
            (int(o[0]), int(o[1] if o[1] is not None else o[0]), int(o[2]),
             str(o[3]), str(o[4]), "TABLE", int(snapshot_scn), False)
            for o in objs
        ]
        # primary-key membership: CDEF$ type#=2 constraints resolved
        # through CCOL$ to (obj#, intcol#)
        pk = {
            (int(r[0]), int(r[1]))
            for r in self._rows(
                'SELECT CC."OBJ#", CC."INTCOL#"'
                ' FROM "CCOL$" CC JOIN "CDEF$" CD ON CD."CON#" = CC."CON#"'
                ' WHERE CD."TYPE#" = 2'
            )
        }
        cols = self._rows(
            'SELECT C."OBJ#", C."COL#", C."SEGCOL#", C."INTCOL#", C.NAME,'
            '       C."TYPE#", C.LENGTH, C."PRECISION#", C.SCALE,'
            '       C.CHARSETID, C."NULL$", C.PROPERTY'
            ' FROM "COL$" C'
            ' ORDER BY C."OBJ#", C."INTCOL#"'
        )
        known = {o[0] for o in dict_obj}
        dict_col = []
        for c in cols:
            obj = int(c[0])
            if obj not in known:
                continue
            npk = 1 if (obj, int(c[3])) in pk else 0
            dict_col.append(
                (obj, int(c[1]), int(c[2]), int(c[3]), str(c[4]),
                 int(c[5]), int(c[6] or 0),
                 None if c[7] is None else int(c[7]),
                 None if c[8] is None else int(c[8]),
                 int(c[9] or 0), bool(c[10] is None or int(c[10]) == 0),
                 npk, int(c[11] or 0), int(snapshot_scn))
            )
        return dict_obj, dict_col

    def bootstrap(self, spark, owner_like: str = "%"):
        """Full startup conversation → everything `build_pipeline`
        needs: (DICT_OBJ frame, DICT_COL frame, positional dictionary
        for KDO resolve, start SCN, DatabaseInfo)."""
        from openlogreplicator_spark.event_model import DICT_COL_SCHEMA

        info = self.database_information()
        obj_rows, col_rows = self.dictionary_rows(
            info.current_scn, owner_like
        )
        # engine-facing object dictionary: the schema registry and the
        # change-event resolve join on (obj) and filter on owner/name
        # STRINGS (select_tables), so the owner NAME rides along
        dict_obj = spark.createDataFrame(
            obj_rows,
            "obj long, dataobj long, owner_id long, owner string, "
            "name string, type string, scn_from long, dropped boolean",
        )
        dict_cols = spark.createDataFrame(col_rows, DICT_COL_SCHEMA)
        # KDO positional resolve wants obj → column names in SEGCOL#
        # order: the reference walks SysColSeg-keyed maps skipping
        # segCol==0 virtual columns (Schema.cpp:649-654) and
        # DbTable::addColumn asserts segCol == position+1
        # (DbTable.cpp:116-120). col_rows arrive in INTCOL# order,
        # which diverges whenever columns were dropped/reordered or
        # virtual columns exist — sorting by intcol# here silently
        # mis-attributed positional values (r12 review-pass-6).
        by_obj: dict[int, list[tuple[int, str]]] = {}
        for r in col_rows:
            if int(r[2]) == 0:  # segcol#=0: virtual, never in KDO areas
                continue
            by_obj.setdefault(r[0], []).append((int(r[2]), r[4]))
        pos: dict[int, list[str]] = {
            obj: [name for _, name in sorted(pairs)]
            for obj, pairs in by_obj.items()
        }
        return dict_obj, dict_cols, pos, info.current_scn, info


def tz_offset_seconds(dbtimezone: str) -> int:
    """DBTIMEZONE '[+-]HH:MM' → seconds east of UTC (the engine's
    db_timezone_seconds, used by the TSLTZ decode kernels)."""
    s = dbtimezone.strip()
    sign = -1 if s.startswith("-") else 1
    hh, mm = s.lstrip("+-").split(":")
    return sign * (int(hh) * 3600 + int(mm) * 60)
