"""CDC-domain operators and their driver-facing queries.

These re-express the reference's change-data-capture pipeline stages over
the driver test tables (no Oracle instance exists here): transaction
sessionization, last-image resolution, condition filters (F3), per-txn
envelopes (B1 FULL), unchanged-column suppression (F5), checkpoint resume
(F9). The real stateful core lives in transaction_assembly.py; the
`cdc_txn_assembly` query drives it end-to-end against a SQL oracle by
synthesizing a deterministic redo stream from orders+lineitem.
"""

from __future__ import annotations

import os

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from openlogreplicator_spark.functions.expr_lang import compile_condition
from openlogreplicator_spark.sources.tables import load_table


def _source_stamp(sf_dir: str, *tables: str) -> str:
    """Identity of the parquet inputs a cached OLRS fixture was built
    from: the driver REGENERATES the testdata between rounds, and a
    fixture rendered from the previous generation would hash-mismatch
    every oracle recomputed over the new parquet (same row counts,
    different values — invisible to rows/schema checks). Folding
    (size, mtime_ns) of each source file into the cache path makes
    regeneration invalidate the cache structurally."""
    import hashlib

    parts = []
    for t in tables:
        p = os.path.join(sf_dir, f"{t}.parquet")
        try:
            st = os.stat(p)
            parts.append(f"{t}:{st.st_size}:{st.st_mtime_ns}")
        except OSError:
            parts.append(f"{t}:absent")
    return hashlib.md5("|".join(parts).encode()).hexdigest()[:10]


def _publish_fixture(staging: str, out_dir: str) -> str:
    """Atomically publish a staged fixture dir and PROVE a complete
    fixture is at out_dir before returning: a rename can fail for
    reasons other than losing the race to a concurrent winner (stale
    non-empty out_dir appearing between the pre-clean and the rename),
    in which case returning the path unverified would hand callers a
    partial or missing fixture."""
    import shutil

    if os.path.isdir(out_dir) and not os.path.exists(
        os.path.join(out_dir, "_SUCCESS")
    ):
        # a dir without _SUCCESS can only be garbage from a crashed
        # legacy builder (the staging scheme never exposes one) — clear
        # it so the rename can land
        shutil.rmtree(out_dir, ignore_errors=True)
    try:
        os.rename(staging, out_dir)
    except OSError:  # lost the race — a complete fixture already exists
        shutil.rmtree(staging, ignore_errors=True)
    if not os.path.exists(os.path.join(out_dir, "_SUCCESS")):
        raise RuntimeError(
            f"fixture publish failed: {out_dir} has no _SUCCESS after rename"
        )
    return out_dir


def sessionize(
    df: DataFrame,
    key: str,
    ts_col: str,
    gap_minutes: int = 30,
    order_tiebreak: str = "event_id",
) -> DataFrame:
    """Gap-based sessionization — the batch shape of transaction assembly
    (T1/T5): one shuffle on the key, lag + running sum of boundary flags.
    State per key is O(1); scales to any key cardinality."""
    w = Window.partitionBy(key).orderBy(ts_col, order_tiebreak)
    # unix_micros over an explicit cast-to-timestamp: legal for both
    # TimestampType (no-op cast) and TIMESTAMP_NTZ (interpreted in the UTC
    # session tz) — a bare numeric cast of NTZ is a plan-time
    # AnalysisException in Spark 4, which is what broke round 2.
    ts_us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    gap = ts_us - F.lag(ts_us).over(w)
    is_new = F.when(gap.isNull() | (gap > gap_minutes * 60 * 1_000_000), 1).otherwise(0)
    return df.withColumn("_new_session", is_new).withColumn(
        "session_idx", F.sum("_new_session").over(w)
    ).drop("_new_session")


def cdc_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transaction-assembly analog over the events stream: sessions =
    transactions, events = ops, session bounds = begin/commit SCN."""
    ev = load_table(spark, sf_dir, "events")
    s = sessionize(ev, "user_id", "ts", gap_minutes=30)
    return s.groupBy("user_id", "session_idx").agg(
        F.count(F.lit(1)).alias("n_events"),
        (F.max(F.unix_micros("ts")) - F.min(F.unix_micros("ts"))).alias(
            "duration_us"
        ),
        F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("start_ts"),
    )


CDC_SESSIONIZE_SQL = """
WITH lagged AS (
    SELECT user_id, ts, event_id,
           LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
    FROM events
), flagged AS (
    SELECT *, CASE WHEN prev_ts IS NULL
                     OR epoch_us(ts) - epoch_us(prev_ts) > 30*60*1000000
                   THEN 1 ELSE 0 END AS is_new
    FROM lagged
), sessions AS (
    SELECT *, SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS session_idx
    FROM flagged
)
SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx, COUNT(*) AS n_events,
       MAX(epoch_us(ts)) - MIN(epoch_us(ts)) AS duration_us,
       strftime(MIN(ts), '%Y-%m-%d %H:%M:%S.%f') AS start_ts
FROM sessions GROUP BY user_id, session_idx
"""


def cdc_last_image(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest row image per key — the materialized-view side of a CDC
    stream (apply changes in SCN order, keep the last). max_by over one
    shuffle; no window sort needed."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("event_id").alias("last_event_id"),
            F.col("event_type").alias("last_type"),
            F.round("value", 6).alias("last_value"),
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("last_ts"),
        )
    )


CDC_LAST_IMAGE_SQL = """
SELECT user_id,
       event_id AS last_event_id,
       event_type AS last_type,
       ROUND(value, 6) AS last_value,
       strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS last_ts
FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                                 ORDER BY ts DESC, event_id DESC) AS rn
    FROM events
) WHERE rn = 1
"""


def _orders_redo_slim(
    spark: SparkSession, sf_dir: str, typed_images: bool = False
) -> DataFrame:
    """The redo-record stream WITHOUT its column-image maps: every
    REDO_RECORD_SCHEMA scalar plus the few slim source columns
    `_attach_images` needs (guide §2.3 — shuffle keys and metadata,
    build the heavy payload after the exchange). The map's l_qty value
    is `block` (qty rides there as the tie-breaking sort key) and
    l_raw's md5 input is (bdba, slot) = (orderkey, linenumber), so
    only `_price`, `_ship` (+ `_rflag`/`_lstat`/`_disc` for typed
    images) travel in addition to the REDO scalars — ~1/3 the bytes of
    the built maps, whose per-row key strings dominate."""
    li = load_table(spark, sf_dir, "lineitem")
    # (orderkey, linenumber) is NOT unique in the test data — block/offset
    # carry (qty, partkey) so the (scn, subscn, block, offset) sort key is
    # deterministic; remaining ties are content-identical records.
    _price_t = "decimal(12,2)"
    dml = li.select(
        (F.col("l_orderkey") * 1000 + F.col("l_linenumber")).alias("scn"),
        F.lit(0).alias("subscn"),
        F.col("l_quantity").cast("long").alias("block"),
        F.col("l_partkey").cast("int").alias("offset"),
        F.lit(1).cast("long").alias("seq"),
        F.col("l_orderkey").cast("string").alias("xid"),
        F.lit("insert").alias("opcode"),
        F.col("l_partkey").alias("obj"),
        F.col("l_orderkey").alias("bdba"),
        F.col("l_linenumber").alias("slot"),
        F.lit(0).alias("fb"),
        F.col("l_extendedprice").cast(_price_t).alias("_price"),
        F.col("l_shipdate").alias("_ship"),
        *(
            [
                F.col("l_returnflag").alias("_rflag"),
                F.col("l_linestatus").alias("_lstat"),
                F.col("l_discount").alias("_disc"),
            ]
            if typed_images
            else []
        ),
    )
    orders = load_table(spark, sf_dir, "orders")

    def _ctrl(scn_off: int, opcode: str) -> DataFrame:
        return orders.select(
            (F.col("o_orderkey") * 1000 + scn_off).alias("scn"),
            F.lit(0).alias("subscn"),
            F.lit(0).cast("long").alias("block"),
            F.lit(0).alias("offset"),
            F.lit(1).cast("long").alias("seq"),
            F.col("o_orderkey").cast("string").alias("xid"),
            F.lit(opcode).alias("opcode"),
            F.lit(0).cast("long").alias("obj"),
            F.lit(None).cast("long").alias("bdba"),
            F.lit(None).cast("int").alias("slot"),
            F.lit(0).alias("fb"),
            F.lit(None).cast(_price_t).alias("_price"),
            F.lit(None).cast(dml.schema["_ship"].dataType).alias("_ship"),
            *(
                [
                    F.lit(None).cast("string").alias("_rflag"),
                    F.lit(None).cast("string").alias("_lstat"),
                    F.lit(None)
                    .cast(dml.schema["_disc"].dataType)
                    .alias("_disc"),
                ]
                if typed_images
                else []
            ),
        )

    return dml.unionByName(_ctrl(999, "commit")).unionByName(
        _ctrl(0, "begin")
    )


def _attach_images(slim: DataFrame, typed_images: bool = False) -> DataFrame:
    """Build the canonical-string column-image maps from the slim
    stream's source columns and drop the carriers — placed ABOVE the
    xid exchange so the maps (per-row key strings and all) never
    shuffle. Values are byte-identical to the historical pre-shuffle
    build: l_qty from `block` (same bigint), l_price/l_ship/l_disc by
    the same casts/formats on the carried originals, l_raw's md5 over
    (bdba, slot) — concat_ws renders the longs exactly as it did the
    source columns. The binary rendering (OLRS1 v3) re-encodes
    l_qty/l_price as Oracle NUMBER bytes, l_ship as a 7-byte DATE, and
    — when typed_images is set (the binary-fixture path only) — l_note
    as JA16SJIS charset text, l_disc as BINARY_DOUBLE and l_raw as
    RAW, so every scalar byte kernel runs in the parse plane."""
    img = F.create_map(
        *(
            [
                F.lit("l_qty"),
                F.col("block").cast("string"),
                F.lit("l_price"),
                F.col("_price").cast("string"),
                F.lit("l_ship"),
                F.date_format("_ship", "yyyy-MM-dd HH:mm:ss"),
            ]
            + (
                [
                    F.lit("l_note"),
                    F.concat(
                        F.when(F.col("_rflag") == "R", F.lit("返品 "))
                        .when(F.col("_rflag") == "A", F.lit("承認 "))
                        .otherwise(F.lit("通常 ")),
                        F.col("_lstat"),
                    ),
                    F.lit("l_disc"),
                    F.col("_disc").cast("string"),
                    F.lit("l_raw"),
                    F.md5(F.concat_ws("|", "bdba", "slot")),
                ]
                if typed_images
                else []
            )
        )
    )
    return slim.select(
        "scn", "subscn", "block", "offset", "seq", "xid", "opcode",
        "obj", "bdba", "slot", "fb",
        F.when(F.col("opcode") == "insert", img)
        .otherwise(F.lit(None).cast("map<string,string>"))
        .alias("cols"),
        F.lit(None).cast("array<map<string,string>>").alias("rows"),
    )


def _orders_redo_stream(
    spark: SparkSession, sf_dir: str, typed_images: bool = False
) -> DataFrame:
    """Deterministic redo-record stream synthesized from orders+lineitem:
    each order is a transaction (xid = orderkey); its lineitems are
    inserts ordered by linenumber; commit closes it. SCNs are derived
    arithmetically so the stream is reproducible in SQL.

    r13 shape: ONE slim xid-keyed exchange, images built above it. The
    previous shape repartitioned lineitem (for image-build parallelism
    — a single-file scan yields 2-3 partitions) and then BUILT the
    maps below assembly's second, xid-keyed exchange, shuffling the
    maps' per-row key strings. Now the slim union shuffles once by xid
    and `_attach_images` runs post-exchange at full width — same build
    parallelism, one exchange instead of two, ~1/3 the shuffled bytes.
    Consumers that feed `assemble_transactions` should use
    `_orders_redo_assembled` so the kernel rides this same exchange."""
    width = spark.sparkContext.defaultParallelism
    return _attach_images(
        _orders_redo_slim(spark, sf_dir, typed_images).repartition(
            width, "xid"
        ),
        typed_images,
    )


def _orders_redo_assembled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """assemble_transactions over the synthesized stream with the slim
    single-exchange shape: the xid repartition is performed HERE on the
    slim stream (pre-aggregation-width rows), images attach above it,
    and the assembly kernel consumes in place (`pre_partitioned`) —
    the built maps never cross an exchange."""
    from openlogreplicator_spark.operators.transaction_assembly import (
        _default_buckets,
        assemble_transactions,
    )

    slim = _orders_redo_slim(spark, sf_dir)
    n_buckets = _default_buckets(slim)
    redo = _attach_images(slim.repartition(n_buckets, "xid"))
    return assemble_transactions(
        redo, n_buckets=n_buckets, pre_partitioned=True
    )


def cdc_txn_assembly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end drive of the stateful assembly core (T1-T5) against a
    SQL oracle: synthesize redo from orders+lineitem, shuffle by xid,
    assemble per-transaction in applyInPandas, emit ordered committed ops."""
    from openlogreplicator_spark.operators.transaction_assembly import (
        assemble_transactions,
    )

    assembled = _orders_redo_assembled(spark, sf_dir)
    return assembled.select(
        F.col("xid").cast("bigint").alias("order_xid"),
        "begin_scn",
        "commit_scn",
        "num",
        "op",
        F.col("obj").alias("partkey"),
        "scn",
        F.element_at("cols", F.lit("l_qty")).cast("bigint").alias("qty"),
    )


CDC_TXN_ASSEMBLY_SQL = """
SELECT l_orderkey AS order_xid,
       l_orderkey * 1000 AS begin_scn,
       l_orderkey * 1000 + 999 AS commit_scn,
       ROW_NUMBER() OVER (PARTITION BY l_orderkey
                          ORDER BY l_linenumber, CAST(l_quantity AS BIGINT),
                                   l_partkey) - 1 AS num,
       'c' AS op,
       l_partkey AS partkey,
       l_orderkey * 1000 + l_linenumber AS scn,
       CAST(l_quantity AS BIGINT) AS qty
FROM lineitem
WHERE EXISTS (SELECT 1 FROM orders WHERE o_orderkey = l_orderkey)
"""


def _binary_redo_dir(spark: SparkSession, sf_dir: str) -> str:
    """Materialize the OLRS1 binary rendering of the redo stream for this
    scale factor (cached, deterministic — the writer sorts each file by
    the assembly key, so regeneration is byte-stable)."""
    import tempfile

    from openlogreplicator_spark.sources.binary_redo import write_binary_redo

    # version in the cache path: a format bump must never reuse files
    # written by an older process on the same machine
    out_dir = os.path.join(
        tempfile.gettempdir(),
        "olrs_binary_redo_v3",
        os.path.basename(os.path.normpath(sf_dir))
        + "-" + _source_stamp(sf_dir, "lineitem", "orders"),
    )
    if not os.path.exists(os.path.join(out_dir, "_SUCCESS")):
        import shutil

        # build in a process-unique staging dir and rename into place:
        # a concurrent builder can never expose (or delete) a half-built
        # directory, and the loser of the rename race just discards its
        # copy — both processes read a complete fixture
        staging = f"{out_dir}.tmp.{os.getpid()}"
        shutil.rmtree(staging, ignore_errors=True)
        write_binary_redo(
            _orders_redo_stream(spark, sf_dir, typed_images=True),
            staging,
            col_types={
                "l_qty": "number",
                "l_price": "number",
                "l_ship": "date",
                "l_note": "varchar2:JA16SJIS",
                "l_disc": "binary_double",
                "l_raw": "raw",
            },
        )
        _publish_fixture(staging, out_dir)
    return out_dir


def _damaged_redo_dir(spark: SparkSession, sf_dir: str) -> str:
    """Binary fixture with REAL record-level damage, for the
    IGNORE_DATA_ERRORS degradation path (REDO_FLAGS bit 4,
    Parser.cpp:1468-1479): one txn per order (begin / one insert /
    commit — exactly one insert so the damaged record's OPCODE is
    deterministic), 32 hash-partitioned files, and the INSERT record
    of every order with ``o_orderkey % 10 = 3`` gets its vector opcode
    bytes destroyed with the block checksums recomputed
    (`damage_records_by_scn`), i.e. corruption the block layer cannot
    catch, only the vector analysis can. Targeting records by a KEY
    predicate instead of by file position (r12 ADVICE) makes the
    damaged set exactly derivable by the SQL oracle and total on any
    partitioning — an empty or single-order hash partition can never
    fault the build (the old per-file `damage_nth_record(data, 1)`
    raised IndexError on a <2-record file and the oracle hardcoded 32
    damaged rows)."""
    import tempfile

    from openlogreplicator_spark.sources.binary_redo import (
        damage_records_by_scn,
        write_binary_redo,
    )

    out_dir = os.path.join(
        tempfile.gettempdir(),
        "olrs_binary_redo_v3",
        os.path.basename(os.path.normpath(sf_dir))
        + "-dmg2-" + _source_stamp(sf_dir, "orders"),
    )
    if not os.path.exists(os.path.join(out_dir, "_SUCCESS")):
        import shutil

        staging = f"{out_dir}.tmp.{os.getpid()}"
        shutil.rmtree(staging, ignore_errors=True)
        orders = load_table(spark, sf_dir, "orders")

        def rec(opcode, scn_off, cols):
            return orders.select(
                (F.col("o_orderkey") * 100 + scn_off).alias("scn"),
                F.lit(0).alias("subscn"),
                F.lit(0).cast("long").alias("block"),
                F.lit(0).alias("offset"),
                F.lit(1).cast("long").alias("seq"),
                F.col("o_orderkey").cast("string").alias("xid"),
                F.lit(opcode).alias("opcode"),
                F.lit(0).cast("long").alias("obj"),
                (F.col("o_orderkey") if opcode == "insert"
                 else F.lit(None)).cast("long").alias("bdba"),
                (F.lit(0) if opcode == "insert"
                 else F.lit(None)).cast("int").alias("slot"),
                F.lit(0).alias("fb"),
                (cols if cols is not None
                 else F.lit(None).cast("map<string,string>")).alias("cols"),
                F.lit(None).cast("array<map<string,string>>").alias("rows"),
            )

        stream = (
            rec("begin", 0, None)
            .unionByName(rec(
                "insert", 1,
                F.create_map(F.lit("v"), F.col("o_orderpriority")),
            ))
            .unionByName(rec("commit", 9, None))
        )
        write_binary_redo(stream, staging, n_files=32)
        # insert scns are o_orderkey*100+1, so o_orderkey % 10 = 3
        # ⇔ scn % 1000 = 301 — the oracle's FILTER predicate, applied
        # here directly to the record headers (no driver collect of
        # the key set; begin ≡ 0 and commit ≡ 9 mod 100 can't collide)
        n_damaged = 0
        for f in os.listdir(staging):
            if f.endswith(".olrs"):
                p = os.path.join(staging, f)
                with open(p, "rb") as fh:
                    data = fh.read()
                data, n = damage_records_by_scn(
                    data, lambda scn: scn % 1000 == 301
                )
                if n:
                    with open(p, "wb") as fh:
                        fh.write(data)
                    n_damaged += n
        if n_damaged == 0:
            # remove the fully-written staging tree before failing — the
            # pid-unique path is never reused, so each failed build
            # would otherwise leak a fixture-sized directory in tempdir
            # (r12 review-pass-8)
            shutil.rmtree(staging, ignore_errors=True)
            raise AssertionError(
                "damaged-redo fixture build produced zero damaged "
                f"records from {sf_dir} — the orders table has no "
                "o_orderkey % 10 = 3 rows, so the IGNORE_DATA_ERRORS "
                "query would test nothing"
            )
        _publish_fixture(staging, out_dir)
    return out_dir


def cdc_ignore_data_errors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REDO_FLAGS::IGNORE_DATA_ERRORS end to end (Ctx.h:91 bit 4;
    consumer Parser.cpp:1468-1479, warning 60013): the insert record
    of every ``o_orderkey % 10 = 3`` order has its vector opcode bytes
    destroyed with checksums recomputed — damage the block layer
    cannot see, spread across the fixture's 32 files. Under the flag
    the parse logs the error, emits one opcode='warn' diagnostic row
    in each damaged record's place, and CONTINUES — every undamaged
    record still parses; strict mode's whole-file abort is pinned in
    tests/test_binary_redo.py. Output is record counts by opcode plus
    the warn rows' numbered code; the key-predicate targeting makes
    the damaged set exact in the SQL oracle regardless of how xids
    hash to files (r12 ADVICE)."""
    from openlogreplicator_spark.sources.binary_redo import parse_redo_files

    redo = parse_redo_files(
        spark, _damaged_redo_dir(spark, sf_dir), ignore_data_errors=True
    )
    return redo.groupBy(
        "opcode",
        F.element_at("cols", F.lit("code")).alias("code"),
    ).agg(F.count(F.lit(1)).alias("n"))


CDC_IGNORE_DATA_ERRORS_SQL = """
WITH counted AS (
    SELECT COUNT(*) AS total,
           COUNT(*) FILTER (WHERE o_orderkey % 10 = 3) AS damaged
    FROM orders
)
SELECT opcode, code, n FROM (
    SELECT 'begin' AS opcode, CAST(NULL AS VARCHAR) AS code,
           CAST(total AS BIGINT) AS n FROM counted
    UNION ALL
    SELECT 'commit', CAST(NULL AS VARCHAR), CAST(total AS BIGINT)
    FROM counted
    UNION ALL
    SELECT 'insert', CAST(NULL AS VARCHAR),
           CAST(total - damaged AS BIGINT) FROM counted
    UNION ALL
    SELECT 'warn', '60013', CAST(damaged AS BIGINT) FROM counted
) WHERE n > 0
"""


def cdc_txn_assembly_binary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's FULL front half, end to end: binary redo blocks →
    (block validation + checksum) → LWN groups → record split → typed
    vectors → transaction assembly → ordered committed ops — same oracle
    as cdc_txn_assembly, but the input is physical OLRS1 bytes, not
    pre-typed rows (Reader.cpp:109-169 + Parser.cpp:1340-1452 semantics;
    see sources/binary_redo.py). One parse task per redo file; assembly
    shuffles on the xid bucket exactly as in the typed path."""
    from openlogreplicator_spark.operators.transaction_assembly import (
        assemble_transactions,
    )
    from openlogreplicator_spark.sources.binary_redo import parse_redo_files

    redo = parse_redo_files(spark, _binary_redo_dir(spark, sf_dir))
    assembled = assemble_transactions(redo)
    return assembled.select(
        F.col("xid").cast("bigint").alias("order_xid"),
        "begin_scn",
        "commit_scn",
        "num",
        "op",
        F.col("obj").alias("partkey"),
        "scn",
        F.element_at("cols", F.lit("l_qty")).cast("bigint").alias("qty"),
        # travelled as Oracle NUMBER / 7-byte DATE / JA16SJIS charset /
        # BINARY_DOUBLE / RAW images through the physical file and back
        # through the byte kernels:
        F.element_at("cols", F.lit("l_price"))
        .cast("decimal(12,2)")
        .cast("string")
        .alias("price"),
        F.element_at("cols", F.lit("l_ship")).alias("ship_ts"),
        F.element_at("cols", F.lit("l_note")).alias("note"),
        F.element_at("cols", F.lit("l_disc")).cast("double").alias("disc"),
        F.element_at("cols", F.lit("l_raw")).alias("raw_hex"),
    )


CDC_TXN_ASSEMBLY_BINARY_SQL = """
SELECT l_orderkey AS order_xid,
       l_orderkey * 1000 AS begin_scn,
       l_orderkey * 1000 + 999 AS commit_scn,
       ROW_NUMBER() OVER (PARTITION BY l_orderkey
                          ORDER BY l_linenumber, CAST(l_quantity AS BIGINT),
                                   l_partkey) - 1 AS num,
       'c' AS op,
       l_partkey AS partkey,
       l_orderkey * 1000 + l_linenumber AS scn,
       CAST(l_quantity AS BIGINT) AS qty,
       CAST(CAST(l_extendedprice AS DECIMAL(12,2)) AS VARCHAR) AS price,
       strftime(l_shipdate, '%Y-%m-%d %H:%M:%S') AS ship_ts,
       CASE l_returnflag WHEN 'R' THEN '返品 ' WHEN 'A' THEN '承認 '
            ELSE '通常 ' END || l_linestatus AS note,
       l_discount AS disc,
       md5(CAST(l_orderkey AS VARCHAR) || '|'
           || CAST(l_linenumber AS VARCHAR)) AS raw_hex
FROM lineitem
WHERE EXISTS (SELECT 1 FROM orders WHERE o_orderkey = l_orderkey)
"""


def cdc_heartbeat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B8 checkpoint/heartbeat rows: one op=chkpt row per LWN of the
    binary redo stream (Parser.cpp:1509-1521) — emitted even when no
    subscribed table changes, the liveness signal downstream consumers
    rely on. The per-LWN grouping depends on the physical file layout
    (xid hash partitioning), which SQL over the logical tables cannot
    reproduce row-for-row — so the driver-checked surface is the
    arithmetic CONTRACT the layout must satisfy: the heartbeats'
    n_records sum to the exact record count the fixture derives from
    orders+lineitem (begin + commit per order, one insert per lineitem),
    no LWN exceeds LWN_MAX_RECORDS, the LWN count is pinched between
    ceil(total/max) and that plus one partial LWN per file, and c_scn is
    non-decreasing within every file."""
    from pyspark.sql.window import Window

    from openlogreplicator_spark.sources.binary_redo import (
        LWN_MAX_RECORDS,
        heartbeats,
    )

    hb = heartbeats(spark, _binary_redo_dir(spark, sf_dir))
    w = Window.partitionBy("seq").orderBy("block")
    per_lwn = hb.select(
        "seq",
        "n_records",
        "c_scn",
        (
            F.col("c_scn")
            >= F.coalesce(F.lag("c_scn").over(w), F.lit(0))
        ).alias("mono"),
    )
    n_files = F.countDistinct("seq")
    total = F.sum("n_records").cast("bigint")
    return per_lwn.agg(
        total.alias("total_records"),
        (F.max("n_records") <= F.lit(LWN_MAX_RECORDS)).alias("lwn_cap_ok"),
        (
            (F.count(F.lit(1)) >= F.ceil(total / F.lit(LWN_MAX_RECORDS)))
            & (
                F.count(F.lit(1))
                <= F.ceil(total / F.lit(LWN_MAX_RECORDS)) + n_files
            )
        ).alias("lwn_count_ok"),
        F.min(F.col("mono").cast("int")).cast("boolean").alias(
            "scn_monotone_ok"
        ),
    )


CDC_HEARTBEAT_SQL = """
SELECT CAST(2 * (SELECT COUNT(*) FROM orders)
            + (SELECT COUNT(*) FROM lineitem) AS BIGINT) AS total_records,
       TRUE AS lwn_cap_ok,
       TRUE AS lwn_count_ok,
       TRUE AS scn_monotone_ok
"""


def _ddl_chunk_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 24.1 DDL chunk stream synthesized from part: each
    part is one DDL transaction whose statement verb (and ddlType code)
    cycles through the reference's classification buckets
    (Builder.cpp:1810-1846); the statement is split into 12-char chunks.
    Even partkeys carry the numeric ddlType, odd ones don't — so both
    classifier paths (code table, text fallback) are driver-exercised."""
    part = load_table(spark, sf_dir, "part")
    verbs = F.array(
        F.lit("CREATE TABLE"), F.lit("ALTER TABLE"), F.lit("DROP TABLE"),
        F.lit("TRUNCATE TABLE"), F.lit("PURGE TABLE"), F.lit("COMMENT ON"),
    )
    codes = F.array(
        F.lit(1), F.lit(15), F.lit(12), F.lit(85), F.lit(198), F.lit(0)
    )
    idx = (F.col("p_partkey") % 6 + 1).cast("int")
    stmt = F.concat(
        F.element_at(verbs, idx), F.lit(" part_"), F.col("p_partkey")
    )
    chunk = 12
    n_chunks = F.ceil(F.length(stmt) / chunk).cast("int")
    return part.select(
        F.concat(F.lit("D"), F.col("p_partkey")).alias("xid"),
        F.when(F.col("p_partkey") % 2 == 0, F.element_at(codes, idx))
        .cast("int")
        .alias("ddl_type"),
        stmt.alias("_stmt"),
        n_chunks.alias("cnt"),
        F.explode(F.sequence(F.lit(1), n_chunks)).alias("seq"),
    ).select(
        "xid",
        "ddl_type",
        "seq",
        "cnt",
        F.substring("_stmt", (F.col("seq") - 1) * chunk + 1, chunk).alias(
            "text_part"
        ),
    )


def cdc_ddl_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B7 DDL reassembly + classification end-to-end: chunked 24.1
    records → seq-ordered concat per xid (P15) → category via the
    reference's ddlType code table, falling back to the statement's
    leading verb where no code was captured."""
    from openlogreplicator_spark.operators.lob_assembly import (
        classify_ddl,
        reassemble_ddl,
    )

    ddl = reassemble_ddl(_ddl_chunk_stream(spark, sf_dir))
    return classify_ddl(ddl).select(
        "xid",
        "ddl_category",
        "complete",
        F.col("n_chunks").cast("int").alias("n_chunks"),
        F.md5("ddl_text").alias("ddl_md5"),
    )


CDC_DDL_CLASSIFY_SQL = """
WITH p AS (
    SELECT p_partkey,
           CASE p_partkey % 6
               WHEN 0 THEN 'CREATE TABLE' WHEN 1 THEN 'ALTER TABLE'
               WHEN 2 THEN 'DROP TABLE'   WHEN 3 THEN 'TRUNCATE TABLE'
               WHEN 4 THEN 'PURGE TABLE'  ELSE 'COMMENT ON' END AS verb,
           CASE p_partkey % 6
               WHEN 0 THEN 'create' WHEN 1 THEN 'alter' WHEN 2 THEN 'drop'
               WHEN 3 THEN 'truncate' WHEN 4 THEN 'purge'
               ELSE 'other' END AS cat
    FROM part
)
SELECT 'D' || p_partkey AS xid,
       cat AS ddl_category,
       TRUE AS complete,
       CAST(CEIL(LENGTH(verb || ' part_' || p_partkey) / 12.0) AS INT)
           AS n_chunks,
       md5(verb || ' part_' || p_partkey) AS ddl_md5
FROM p
"""


def cdc_txn_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-transaction telemetry off the assembled stream: op count,
    distinct objects touched, SCN span, payload sum — the numbers behind
    the reference's big-transaction guard and buffer sizing (T4/T6,
    TransactionBuffer size accounting). One xid-keyed partial agg after
    assembly; no extra shuffle beyond the assembly's own."""
    from openlogreplicator_spark.operators.transaction_assembly import (
        assemble_transactions,
    )

    assembled = _orders_redo_assembled(spark, sf_dir)
    return assembled.groupBy(
        F.col("xid").cast("bigint").alias("order_xid")
    ).agg(
        F.count(F.lit(1)).alias("n_ops"),
        F.countDistinct("obj").alias("n_objs"),
        F.min("scn").alias("first_scn"),
        F.max("scn").alias("last_scn"),
        F.sum(
            F.element_at("cols", F.lit("l_qty")).cast("bigint")
        ).alias("qty_sum"),
    )


CDC_TXN_STATS_SQL = """
SELECT l_orderkey AS order_xid,
       COUNT(*) AS n_ops,
       COUNT(DISTINCT l_partkey) AS n_objs,
       MIN(l_orderkey * 1000 + l_linenumber) AS first_scn,
       MAX(l_orderkey * 1000 + l_linenumber) AS last_scn,
       CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty_sum
FROM lineitem
WHERE EXISTS (SELECT 1 FROM orders WHERE o_orderkey = l_orderkey)
GROUP BY l_orderkey
"""


def replication_counters(spark: SparkSession, redo_dir: str) -> DataFrame:
    """The reader/parser/checkpoint counter families over a binary redo
    directory (Metrics.h:48-66): bytes_read (physical file bytes),
    bytes_parsed (LWN payload blocks × block size — what the parser
    actually walks), checkpoints_out (one per LWN, Parser.cpp:1509-1521)
    and checkpoint_lag (max record SCN − last checkpointed SCN; 0 once a
    drain completes). Long-format (metric, value) rows; everything is a
    metadata-scale aggregate — two tiny scans, no data-row shuffle."""
    from openlogreplicator_spark.sources.binary_redo import (
        BLOCK_SIZE,
        heartbeats,
    )

    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.olrs")
        .load(redo_dir)
        .select("length")
        .agg(
            F.sum("length").cast("bigint").alias("bytes_read"),
            F.count(F.lit(1)).cast("bigint").alias("n_files"),
        )
    )
    hb = heartbeats(spark, redo_dir).agg(
        (F.sum("lwn_blocks") * BLOCK_SIZE).cast("bigint").alias(
            "bytes_parsed"
        ),
        F.count(F.lit(1)).cast("bigint").alias("checkpoints_out"),
        F.max("c_scn").cast("bigint").alias("last_ckpt_scn"),
    )
    wide = files.crossJoin(hb)
    # checkpoint_lag over a COMPLETED directory scan is 0 by the LWN
    # contract (lwn_scn = max record scn in the group, so the header-
    # derived max record scn and the last checkpoint coincide) — the
    # row keeps the reference's counter surface. last_ckpt_scn is
    # exposed so callers with an INDEPENDENT expected max scn can
    # compute a falsifiable lag (cdc_metrics does, against the source
    # tables — r12 review-pass-8; the previous hardcoded 0 made the
    # counter untestable).
    return wide.selectExpr(
        "stack(6, "
        "'bytes_read', bytes_read, "
        "'bytes_parsed', bytes_parsed, "
        "'checkpoints_out', checkpoints_out, "
        "'checkpoint_lag', last_ckpt_scn - last_ckpt_scn, "
        "'last_ckpt_scn', last_ckpt_scn, "
        "'files_read', n_files"
        ") as (metric, value)"
    )


# the deterministic skip-list exercised by the skip counters: every
# 50th order's transaction is filter-dropped (F4 semantics)
_METRICS_SKIP_MOD = 50


def cdc_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W8 metrics surface across every reference family the batch plane
    can feed (Metrics.h:48-140 counter names):

    - dml_ops_<type>_<out|skip> totals AND per-table splits
      (``dml_ops_insert_out:OWNER.TABLE`` — the owner/table-labeled
      variants of Metrics.h:82-87), out/skip decided by the F4
      skip-list (every 50th transaction here)
    - transactions_commit_<out|skip>
    - ddl_ops_<category> from the classified DDL stream
    - messages_sent / bytes_sent / messages_confirmed / bytes_confirmed
      from the rendered builder messages (byte-exact: the oracle
      rebuilds the same JSON bytes and sums their lengths)
    - the reader/parser plane (bytes_read, bytes_parsed,
      checkpoints_out) surfaces as accounting INDICATORS (value 1):
      physical file bytes must equal parsed LWN payload bytes plus one
      header block per file, and the checkpoint count must sit inside
      the LWN-count pinch — the layout itself is hash-partitioned and
      not SQL-reproducible, the accounting identity is
    - checkpoint_lag: 0 after a completed drain (exact)

    Long-format (metric, value BIGINT) rows — the shape
    functions/metrics_prometheus.py renders into the reference's
    labeled exposition families. All counters are distributed partial
    aggregates; no driver-side listener in the loop."""
    from openlogreplicator_spark.builders.json_builder import build_events
    from openlogreplicator_spark.config import Format
    from openlogreplicator_spark.operators.lob_assembly import (
        classify_ddl,
        reassemble_ddl,
    )
    from openlogreplicator_spark.operators.transaction_assembly import (
        assemble_transactions,
    )
    from openlogreplicator_spark.sources.binary_redo import (
        BLOCK_SIZE,
        LWN_MAX_RECORDS,
    )

    assembled = _orders_redo_assembled(spark, sf_dir)
    op_name = (
        F.when(F.col("op") == "c", "insert")
        .when(F.col("op") == "u", "update")
        .otherwise("delete")
    )
    skipped = F.col("xid").cast("bigint") % _METRICS_SKIP_MOD == 0
    filt = F.when(skipped, "skip").otherwise("out")
    # ONE pass over the assembled stream (r12): the dml / per-table /
    # transaction counters previously each consumed `assembled`
    # directly, and Spark shares no subtrees below a plan fork — the
    # whole synthesize+shuffle+Arrow-assembly pipeline executed three
    # times. This persisted pre-aggregate holds one slim row per
    # (kind, filter, tab, xid) — transaction-scale, the counters' finest
    # grain — and each family folds it down exchange-free-cheap.
    # Summing the partial counts reproduces every original groupBy
    # exactly (filter is xid-functional, so no xid straddles filters).
    # Lifetime contract (r12 ADVICE): the cached frame outlives this
    # builder; long-lived sessions must clearCache() between queries
    # (bench.py:257 and the oracle sweep do).
    pre = (
        assembled.groupBy(
            op_name.alias("kind"),
            filt.alias("filter"),
            F.concat(F.lit("TPCH.T"), F.col("obj") % 4).alias("tab"),
            F.col("xid").alias("xid"),
        )
        .agg(F.count(F.lit(1)).alias("value"))
        .persist()
    )
    dml = pre.groupBy("kind", "filter").agg(
        F.sum("value").alias("value")
    ).select(
        F.concat(
            F.lit("dml_ops_"), "kind", F.lit("_"), "filter"
        ).alias("metric"),
        "value",
    )
    # per-table splits: owner/table resolved from obj (adaptive-mode
    # synthesis keeps the mapping SQL-reproducible)
    dml_tab = pre.filter(F.col("filter") == "out").groupBy(
        "kind", "tab"
    ).agg(F.sum("value").alias("value")).select(
        F.concat(
            F.lit("dml_ops_"), "kind", F.lit("_out:"), "tab"
        ).alias("metric"),
        "value",
    )
    txns = pre.groupBy("filter").agg(
        F.countDistinct("xid").alias("value")
    ).select(
        F.concat(F.lit("transactions_commit_"), "filter").alias("metric"),
        "value",
    )
    ddl = (
        classify_ddl(reassemble_ddl(_ddl_chunk_stream(spark, sf_dir)))
        .groupBy("ddl_category")
        .agg(F.count(F.lit(1)).alias("value"))
        .select(
            F.concat(F.lit("ddl_ops_"), F.col("ddl_category")).alias(
                "metric"
            ),
            "value",
        )
    )
    # writer plane: rendered message counts + byte totals (W1 confirms
    # everything in a completed drain, so confirmed == sent)
    from openlogreplicator_spark.operators.extras import (
        _orders_as_change_events,
    )

    msgs = build_events(
        _orders_as_change_events(spark, sf_dir),
        Format(attributes=True, redo_thread=True),
        tag_cols=("O_ORDERKEY",),
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.octet_length("value")).cast("bigint").alias("b"),
    )
    writer = msgs.selectExpr(
        "stack(4, "
        "'messages_sent', n, 'messages_confirmed', n, "
        "'bytes_sent', b, 'bytes_confirmed', b"
        ") as (metric, value)"
    )
    # reader/parser plane: accounting identities over the binary fixture
    rc = (
        replication_counters(spark, _binary_redo_dir(spark, sf_dir))
        .groupBy()
        .pivot("metric")
        .agg(F.first("value"))
    )
    reader = rc.select(
        (
            F.col("bytes_read")
            == F.col("bytes_parsed") + F.col("files_read") * BLOCK_SIZE
        ).cast("bigint").alias("bytes_accounting_ok"),
        F.col("last_ckpt_scn").alias("_last_ckpt"),
        F.col("checkpoints_out").alias("_n_ckpt"),
        F.col("files_read").alias("_n_files"),
    )
    # checkpoints_out ∈ [ceil(records/LWN_MAX), that + one partial per
    # file]. Record count and max scn come CLOSED-FORM from the source
    # tables (2·|orders| + |lineitem|; commit scn of the top orderkey) —
    # the previous version re-rendered the whole orders+lineitem stream
    # (map/md5/charset images) just to count its rows (r12
    # review-pass-8). checkpoint_lag is now FALSIFIABLE: the source-
    # derived expected max scn minus the last checkpointed scn (0 on a
    # sound drain; a dropped or mis-stamped tail LWN makes it nonzero
    # and fails the oracle's pinned 0 — the hardcoded 0 it replaces
    # could never fail).
    src = (
        load_table(spark, sf_dir, "orders")
        .agg(
            F.count(F.lit(1)).alias("_no"),
            F.max("o_orderkey").alias("_mo"),
        )
        .crossJoin(
            load_table(spark, sf_dir, "lineitem").agg(
                F.count(F.lit(1)).alias("_nl")
            )
        )
        .select(
            (F.col("_no") * 2 + F.col("_nl")).cast("bigint").alias(
                "n_recs"
            ),
            (F.col("_mo") * 1000 + 999).cast("bigint").alias(
                "expected_max_scn"
            ),
        )
    )
    reader = reader.crossJoin(F.broadcast(src)).select(
        F.col("bytes_accounting_ok"),
        (F.col("expected_max_scn") - F.col("_last_ckpt")).alias(
            "checkpoint_lag"
        ),
        (
            (F.col("_n_ckpt") >= F.ceil(F.col("n_recs") / LWN_MAX_RECORDS))
            & (
                F.col("_n_ckpt")
                <= F.ceil(F.col("n_recs") / LWN_MAX_RECORDS)
                + F.col("_n_files")
            )
        ).cast("bigint").alias("checkpoints_bounded_ok"),
    )
    reader_rows = reader.selectExpr(
        "stack(3, "
        "'bytes_accounting_ok', bytes_accounting_ok, "
        "'checkpoint_lag', checkpoint_lag, "
        "'checkpoints_bounded_ok', checkpoints_bounded_ok"
        ") as (metric, value)"
    )
    return (
        dml.unionByName(dml_tab)
        .unionByName(txns)
        .unionByName(ddl)
        .unionByName(writer)
        .unionByName(reader_rows)
        .select("metric", F.col("value").cast("bigint").alias("value"))
    )


def _cdc_metrics_sql() -> str:
    """Oracle for the full W8 surface. The writer-plane byte counters
    reuse the byte-exact JSON-builder oracle as a subquery (same Format
    toggles), so bytes_sent is the literal sum of the rendered message
    lengths, not an approximation."""
    from openlogreplicator_spark.operators.extras import (
        CDC_JSON_BUILDER_SQL,
    )

    skip = f"l_orderkey % {_METRICS_SKIP_MOD}"
    return f"""
WITH li AS (
    SELECT l_orderkey, l_partkey FROM lineitem
    WHERE EXISTS (SELECT 1 FROM orders WHERE o_orderkey = l_orderkey)
),
msgs AS ({CDC_JSON_BUILDER_SQL})
SELECT metric, CAST(value AS BIGINT) AS value FROM (
    SELECT 'dml_ops_insert_' || CASE WHEN {skip} = 0 THEN 'skip'
               ELSE 'out' END AS metric, COUNT(*) AS value
    FROM li GROUP BY 1
    UNION ALL
    SELECT 'dml_ops_insert_out:TPCH.T' || (l_partkey % 4), COUNT(*)
    FROM li WHERE {skip} <> 0 GROUP BY 1
    UNION ALL
    SELECT 'transactions_commit_' || CASE WHEN {skip} = 0 THEN 'skip'
               ELSE 'out' END, COUNT(DISTINCT l_orderkey)
    FROM li GROUP BY 1
    UNION ALL
    SELECT 'ddl_ops_' || CASE p_partkey % 6
               WHEN 0 THEN 'create' WHEN 1 THEN 'alter' WHEN 2 THEN 'drop'
               WHEN 3 THEN 'truncate' WHEN 4 THEN 'purge' ELSE 'other' END,
           COUNT(*)
    FROM part GROUP BY 1
    UNION ALL SELECT 'messages_sent', COUNT(*) FROM msgs
    UNION ALL SELECT 'messages_confirmed', COUNT(*) FROM msgs
    UNION ALL SELECT 'bytes_sent', SUM(LENGTH(value)) FROM msgs
    UNION ALL SELECT 'bytes_confirmed', SUM(LENGTH(value)) FROM msgs
    UNION ALL SELECT 'bytes_accounting_ok', 1
    UNION ALL SELECT 'checkpoint_lag', 0
    UNION ALL SELECT 'checkpoints_bounded_ok', 1
) t(metric, value)
"""


# XMLTYPE tag/attr dictionaries — the XmlCtx XDB X$NM/X$QN analog
# (catalog-scale, closure-broadcast to the decode kernel)
_XML_TAGS = {1: "part", 2: "name", 3: "brand", 4: "size"}
_XML_ATTRS = {1: "id", 2: "type"}


def cdc_xmltype_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XMLTYPE column decode end-to-end (Builder::parseXml surface,
    Builder.cpp:1869-2430): each part row becomes a binary token-coded
    XMLTYPE value (dictionary-referenced tags, attribute tokens, chunked
    text — the OLRX1 format); the decode kernel re-serializes it to XML
    text, checked against an oracle that builds the same XML directly in
    SQL. Both encode and decode are one Arrow-batched map stage; the tag
    dictionary broadcasts by closure like the reference's XmlCtx."""
    from pyspark.sql.pandas.functions import pandas_udf

    from openlogreplicator_spark.functions.xmltype import (
        encode_xmltype,
        xmltype_decode_udf,
    )

    tag_ids = {v: k for k, v in _XML_TAGS.items()}
    attr_ids = {v: k for k, v in _XML_ATTRS.items()}

    @pandas_udf("binary")
    def encode(key: pd.Series, name: pd.Series, brand: pd.Series,
               ptype: pd.Series, size: pd.Series) -> pd.Series:
        out = []
        for k, n, b, t, s in zip(key, name, brand, ptype, size):
            doc = (
                "part",
                {"id": str(k), "type": t},
                [
                    ("name", {}, [n]),
                    ("brand", {}, [b]),
                    ("size", {}, [str(s)]),
                ],
            )
            out.append(encode_xmltype(doc, tag_ids, attr_ids))
        return pd.Series(out)

    part = load_table(spark, sf_dir, "part")
    with_xml = part.select(
        "p_partkey",
        encode("p_partkey", "p_name", "p_brand", "p_type", "p_size").alias(
            "xml_bin"
        ),
    )
    decoded = with_xml.select(
        "p_partkey",
        xmltype_decode_udf(_XML_TAGS, _XML_ATTRS)("xml_bin").alias("xml"),
    )
    return decoded.select(
        "p_partkey",
        F.length("xml").alias("xml_len"),
        F.md5("xml").alias("xml_md5"),
    )


CDC_XMLTYPE_SQL = """
SELECT p_partkey,
       LENGTH('<part id="' || p_partkey || '" type="' || p_type || '">'
              || '<name>' || p_name || '</name>'
              || '<brand>' || p_brand || '</brand>'
              || '<size>' || p_size || '</size></part>') AS xml_len,
       md5('<part id="' || p_partkey || '" type="' || p_type || '">'
           || '<name>' || p_name || '</name>'
           || '<brand>' || p_brand || '</brand>'
           || '<size>' || p_size || '</size></part>') AS xml_md5
FROM part
"""


def cdc_txn_envelope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-transaction envelope (B1 MESSAGE_FORMAT::FULL): one message per
    txn carrying the ordered op list — here fingerprinted with md5 so the
    ordering guarantee is oracle-checkable."""
    li = load_table(spark, sf_dir, "lineitem")
    op_key = F.concat_ws(
        ":", F.col("l_linenumber"), F.col("l_partkey"), F.col("l_quantity").cast("bigint")
    )
    per_txn = (
        li.withColumn("op_key", op_key)
        .groupBy("l_orderkey")
        .agg(
            F.count(F.lit(1)).alias("n_ops"),
            F.md5(
                F.concat_ws(
                    ",",
                    F.transform(
                        F.array_sort(
                            F.collect_list(
                                F.struct(
                                    "l_linenumber",
                                    "l_partkey",
                                    F.col("l_quantity").cast("bigint").alias("q"),
                                    "op_key",
                                )
                            )
                        ),
                        lambda s: s.op_key,
                    ),
                )
            ).alias("payload_md5"),
        )
    )
    return per_txn.withColumnRenamed("l_orderkey", "xid")


CDC_TXN_ENVELOPE_SQL = """
SELECT l_orderkey AS xid,
       COUNT(*) AS n_ops,
       md5(string_agg(l_linenumber || ':' || l_partkey || ':' ||
                      CAST(l_quantity AS BIGINT),
                      ',' ORDER BY l_linenumber, l_partkey,
                                   CAST(l_quantity AS BIGINT)))
           AS payload_md5
FROM lineitem
GROUP BY l_orderkey
"""


def cdc_condition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F3 condition mini-language compiled to a Catalyst filter:
    `([TYPE] == 'error' || [TYPE] == 'purchase') && ![USER] == '3'`
    evaluated over a session-attribute map column."""
    ev = load_table(spark, sf_dir, "events")
    with_attrs = ev.withColumn(
        "attrs",
        F.create_map(
            F.lit("TYPE"), F.col("event_type"),
            F.lit("USER"), F.col("user_id").cast("string"),
        ),
    )
    cond = compile_condition(
        "([TYPE] == 'error' || [TYPE] == 'purchase') && !([USER] == '3')"
    )
    return (
        with_attrs.filter(cond)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.countDistinct("user_id").alias("n_users"))
    )


CDC_CONDITION_SQL = """
SELECT event_type, COUNT(*) AS n, COUNT(DISTINCT user_id) AS n_users
FROM events
WHERE (event_type = 'error' OR event_type = 'purchase')
  AND NOT (CAST(user_id AS VARCHAR) = '3')
GROUP BY event_type
"""


def cdc_unchanged_suppression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F5 analog — update events carry only *changed* state: pair each
    event with its per-user predecessor (lag = the before image) and emit
    only transitions where the type actually changed."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.withColumn("before_type", F.lag("event_type").over(w))
        .filter(
            F.col("before_type").isNotNull()
            & (F.col("before_type") != F.col("event_type"))
        )
        .groupBy("before_type", F.col("event_type").alias("after_type"))
        .agg(F.count(F.lit(1)).alias("n_transitions"))
    )


CDC_UNCHANGED_SQL = """
SELECT before_type, event_type AS after_type, COUNT(*) AS n_transitions
FROM (
    SELECT user_id, event_type,
           LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS before_type
    FROM events
)
WHERE before_type IS NOT NULL AND before_type <> event_type
GROUP BY before_type, after_type
"""


def cdc_resume_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F9 checkpoint resume: only events past the confirmed position are
    re-emitted (commit_scn > checkpoint_scn). The checkpoint here is a
    deterministic quantile of event_id, resolved via a broadcast scalar."""
    ev = load_table(spark, sf_dir, "events")
    # INTEGER division on both sides (r12 review-pass-8): the previous
    # float `* 8 / 10` then cast diverged between engines whenever the
    # fraction was ≥ .5 — Spark's double→bigint cast truncates while
    # DuckDB's CAST rounds to nearest
    ckpt = ev.agg(
        F.expr("max(event_id) * 8 div 10").cast("bigint").alias("ckpt")
    )
    return (
        ev.crossJoin(F.broadcast(ckpt))
        .filter(F.col("event_id") > F.col("ckpt"))
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_after_ckpt"), F.min("event_id").alias("first_id"))
    )


CDC_RESUME_SQL = """
SELECT event_type, COUNT(*) AS n_after_ckpt, MIN(event_id) AS first_id
FROM events
WHERE event_id > (SELECT MAX(event_id) * 8 // 10 FROM events)
GROUP BY event_type
"""


def cdc_schema_asof_resolve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T9/§1.3 as-of dictionary resolution: events resolve against the
    schema version in effect at their SCN. The dictionary is synthesized
    from `part` with three SCN versions per object; events come from
    lineitem with arithmetic SCNs. Uses the union-window as-of operator
    (one shuffle on obj, no range join)."""
    from openlogreplicator_spark.metadata.schema_registry import asof_resolve

    part = load_table(spark, sf_dir, "part")
    versions = []
    for v, scn_from in (("v0", 0), ("v1", 1000), ("v2", 2000)):
        versions.append(
            part.select(
                F.col("p_partkey").alias("obj"),
                F.lit(scn_from).cast("long").alias("scn_from"),
                F.concat(F.col("p_name"), F.lit("_" + v)).alias("name"),
            )
        )
    dict_versions = versions[0].unionByName(versions[1]).unionByName(versions[2])
    li = load_table(spark, sf_dir, "lineitem")
    events = li.select(
        F.col("l_orderkey").alias("event_key"),
        F.col("l_linenumber").alias("line"),
        F.col("l_partkey").alias("obj"),
        ((F.col("l_orderkey") * 7 + F.col("l_linenumber") * 13) % 3000).alias("scn"),
    )
    resolved = asof_resolve(events, dict_versions)
    return resolved.groupBy("name").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("scn").alias("min_scn"),
        F.max("scn").alias("max_scn"),
    )


CDC_SCHEMA_ASOF_SQL = """
-- independent computation of the same as-of semantics: the synthetic
-- version boundaries are constants, so the effective version is a CASE
WITH ev AS (
    SELECT l_partkey AS obj,
           (l_orderkey * 7 + l_linenumber * 13) % 3000 AS scn
    FROM lineitem
)
SELECT p_name || CASE WHEN scn >= 2000 THEN '_v2'
                      WHEN scn >= 1000 THEN '_v1'
                      ELSE '_v0' END AS name,
       COUNT(*) AS n_events, MIN(scn) AS min_scn, MAX(scn) AS max_scn
FROM ev JOIN part ON p_partkey = obj
GROUP BY name
"""


def cdc_gap_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S4 sequence-gap detection (Replicator.cpp:456-624): the scheduler
    must notice a missing redo-log sequence before processing past it.
    Here the observed sequence set is the events stream minus a
    deterministic "lost archive" subset (event_id % 97 == 0); the
    operator reports each gap as (gap_start, gap_end, n_missing).

    100-TB shape: a global `lag` window would range-sort the whole
    sequence space through one task chain, and anti-joins on shifted
    copies would shuffle the sequence set once per join side — so each
    observed sequence instead emits three position markers (itself,
    s+1, s-1) and ONE hash aggregation over the marker position yields
    presence plus both neighbour flags: a position p starts a gap iff
    p-1 is present and p is not; ends one iff p+1 is present and p is
    not. One data-scale exchange total (partially aggregated map-side,
    and duplicate-insensitive, so no distinct prepass), with the
    bounds as a map-side min/max broadcast. Only the gap *boundaries*
    — rare by construction — survive the aggregate, and because starts
    and ends strictly alternate in position order, one `lead` window
    over that vanishingly small frame pairs them with no self-join and
    no second consumer of the aggregated subtree."""
    ev = load_table(spark, sf_dir, "events")
    obs = ev.filter(F.col("event_id") % 97 != 0).select(
        F.col("event_id").alias("seq")
    )
    triples = obs.select(
        F.explode(
            F.array(
                F.struct(F.col("seq").alias("pos"), F.lit(0).alias("kind")),
                F.struct((F.col("seq") + 1).alias("pos"), F.lit(1).alias("kind")),
                F.struct((F.col("seq") - 1).alias("pos"), F.lit(2).alias("kind")),
            )
        ).alias("m")
    ).select("m.pos", "m.kind")
    grouped = triples.groupBy("pos").agg(
        F.max(F.col("kind") == 0).alias("present"),
        F.max(F.col("kind") == 1).alias("has_prev"),
        F.max(F.col("kind") == 2).alias("has_next"),
    )
    bounds = obs.agg(F.min("seq").alias("lo"), F.max("seq").alias("hi"))
    boundaries = (
        grouped.filter(~F.col("present"))
        .join(F.broadcast(bounds))
        .withColumn(
            "is_start", F.col("has_prev") & (F.col("pos") <= F.col("hi"))
        )
        .withColumn(
            "is_end", F.col("has_next") & (F.col("pos") >= F.col("lo"))
        )
        .filter(F.col("is_start") | F.col("is_end"))
    )
    # A single missing position is its own start AND end; a longer
    # gap's start row is immediately followed (in position order) by
    # its end row, because interior missing positions never reach
    # `grouped` (no present neighbour emits a marker for them).
    w = Window.orderBy("pos")
    paired = (
        boundaries.withColumn(
            "gap_end_",
            F.when(F.col("is_end"), F.col("pos")).otherwise(
                F.lead("pos").over(w)
            ),
        )
        .filter(F.col("is_start"))
        .select(
            F.col("pos").alias("gap_start"),
            F.col("gap_end_").alias("gap_end"),
            (F.col("gap_end_") - F.col("pos") + 1).alias("n_missing"),
        )
    )
    return paired


CDC_GAP_DETECT_SQL = """
WITH seqs AS (
    SELECT DISTINCT event_id AS seq FROM events WHERE event_id % 97 <> 0
),
b AS (SELECT MIN(seq) AS lo, MAX(seq) AS hi FROM seqs),
starts AS (
    SELECT seq + 1 AS gap_start,
           ROW_NUMBER() OVER (ORDER BY seq) AS k
    FROM seqs s, b
    WHERE seq < hi
      AND NOT EXISTS (SELECT 1 FROM seqs t WHERE t.seq = s.seq + 1)
),
ends AS (
    SELECT seq - 1 AS gap_end,
           ROW_NUMBER() OVER (ORDER BY seq) AS k
    FROM seqs s, b
    WHERE seq > lo
      AND NOT EXISTS (SELECT 1 FROM seqs t WHERE t.seq = s.seq - 1)
)
SELECT gap_start, gap_end, gap_end - gap_start + 1 AS n_missing
FROM starts JOIN ends USING (k)
"""


def cdc_adaptive_schema(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adaptive-schema resolution (REDO_FLAGS::ADAPTIVE_SCHEMA, Ctx.h:89;
    Schema.cpp:521-526): a dictionary that covers only half the objects
    (even partkeys) resolves DML against known tables normally and
    synthesizes USER_<obj>/TABLE_<obj> naming for the rest instead of
    dropping them. Emits per-owner-class event counts."""
    from openlogreplicator_spark.config import EngineConfig
    from openlogreplicator_spark.operators.transaction_assembly import (
        assemble_transactions,
    )
    from openlogreplicator_spark.streaming.engine import to_change_events

    part = load_table(spark, sf_dir, "part")
    dict_obj = part.filter(F.col("p_partkey") % 2 == 0).select(
        F.col("p_partkey").alias("obj"),
        F.lit("APP").alias("owner"),
        F.concat(F.lit("PART_"), F.col("p_partkey")).alias("name"),
    )
    assembled = _orders_redo_assembled(spark, sf_dir)
    events = to_change_events(
        assembled, EngineConfig(schema_mode="adaptive"), dict_obj
    )
    return (
        events.filter(F.col("op").isin("c", "u", "d"))
        .groupBy(
            F.when(F.col("owner") == "APP", F.lit("known"))
            .otherwise(F.lit("synthesized"))
            .alias("owner_class")
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("obj").alias("n_objs"),
            F.countDistinct("table").alias("n_tables"),
        )
    )


CDC_ADAPTIVE_SCHEMA_SQL = """
WITH ev AS (
    SELECT l_partkey AS obj,
           CASE WHEN l_partkey % 2 = 0 AND EXISTS (
                    SELECT 1 FROM part WHERE p_partkey = l_partkey)
                THEN 'known' ELSE 'synthesized' END AS owner_class
    FROM lineitem
    WHERE EXISTS (SELECT 1 FROM orders WHERE o_orderkey = l_orderkey)
)
SELECT owner_class, COUNT(*) AS n_events,
       COUNT(DISTINCT obj) AS n_objs, COUNT(DISTINCT obj) AS n_tables
FROM ev GROUP BY owner_class
"""


def cdc_schemaless_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schemaless mode (REDO_FLAGS::SCHEMALESS, Ctx.h:88;
    Builder.cpp:96-100): no dictionary — objects pass as OBJ<n> and
    column images are emitted positionally as COL_<n> in wire order.
    Aggregates COL_0 (the quantity image) per synthetic table."""
    from openlogreplicator_spark.config import EngineConfig
    from openlogreplicator_spark.operators.transaction_assembly import (
        assemble_transactions,
    )
    from openlogreplicator_spark.streaming.engine import to_change_events

    assembled = _orders_redo_assembled(spark, sf_dir)
    events = to_change_events(
        assembled, EngineConfig(schema_mode="schemaless")
    )
    return (
        events.filter(F.col("op") == "c")
        .groupBy("table")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.element_at("after", F.lit("COL_0")).cast("bigint"))
            .cast("bigint")
            .alias("sum_col0"),
        )
    )


CDC_SCHEMALESS_SQL = """
SELECT 'OBJ' || l_partkey AS "table", COUNT(*) AS n_events,
       CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_col0
FROM lineitem
WHERE EXISTS (SELECT 1 FROM orders WHERE o_orderkey = l_orderkey)
GROUP BY l_partkey
"""


def cdc_asof_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flashback/as-of materialization (O3/F9 consumer shape): the state
    of every key AS OF a position cutoff — apply the change stream only
    up to half the maximum sequence, then keep the last image per key.
    The cutoff joins as a broadcast 1-row aggregate (no driver collect);
    the snapshot is one key-partitioned window."""
    ev = load_table(spark, sf_dir, "events")
    cut = ev.agg((F.max("event_id") / 2).alias("cut"))
    upto = ev.join(F.broadcast(cut)).filter(F.col("event_id") < F.col("cut"))
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        upto.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("event_id").alias("asof_event_id"),
            F.col("event_type").alias("asof_type"),
            F.round("value", 6).alias("asof_value"),
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("asof_ts"),
        )
    )


CDC_ASOF_SNAPSHOT_SQL = """
SELECT user_id,
       event_id AS asof_event_id,
       event_type AS asof_type,
       ROUND(value, 6) AS asof_value,
       strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS asof_ts
FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                                 ORDER BY ts DESC, event_id DESC) AS rn
    FROM events
    WHERE event_id < (SELECT MAX(event_id) / 2 FROM events)
) WHERE rn = 1
"""


def _orders_update_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Update-shaped redo: every lineitem is a 5.1-undo + 11.5-update
    pair at the same (bdba, slot) — the reference's vector1/vector2
    pairing (Parser.cpp:310-576) — inside per-order transactions."""
    li = load_table(spark, sf_dir, "lineitem")
    # (orderkey, linenumber) duplicates would collide in the undo
    # address map — the pairing key must identify the ROW PIECE, so the
    # slot is a per-order dense row number (unique even for
    # content-identical lines)
    uid_w = Window.partitionBy("l_orderkey").orderBy(
        "l_linenumber", F.col("l_quantity").cast("bigint"), "l_partkey"
    )
    li = li.withColumn("ln_uid", F.row_number().over(uid_w))
    # ONE scan + ONE window for both vectors of the pair: the (undo,
    # update) records explode out of an inline array, instead of two
    # plan branches each re-running the scan and the row-number window
    undo_map = F.create_map(
        F.lit("l_qty"),
        (F.col("l_quantity").cast("bigint") + 100).cast("string"),
    )
    upd_map = F.create_map(
        F.lit("l_qty"), F.col("l_quantity").cast("bigint").cast("string")
    )
    pair = F.array(
        F.struct(
            F.lit(0).alias("subscn"),
            F.lit("undo").alias("opcode"),
            undo_map.alias("cols"),
        ),
        F.struct(
            F.lit(1).alias("subscn"),
            F.lit("update").alias("opcode"),
            upd_map.alias("cols"),
        ),
    )
    both = li.select(
        (F.col("l_orderkey") * 1000 + F.col("l_linenumber")).alias("scn"),
        F.col("l_quantity").cast("long").alias("block"),
        F.col("l_partkey").cast("int").alias("offset"),
        F.lit(1).cast("long").alias("seq"),
        F.col("l_orderkey").cast("string").alias("xid"),
        F.col("l_partkey").alias("obj"),
        F.col("l_orderkey").alias("bdba"),
        F.col("ln_uid").alias("slot"),
        F.lit(0).alias("fb"),
        F.lit(None).cast("array<map<string,string>>").alias("rows"),
        F.explode(pair).alias("v"),
    )
    # one row per (undo, update) pair element — both record kinds ride
    # the single explode above
    undo_and_update = both.select(
        "scn", F.col("v.subscn").alias("subscn"), "block", "offset",
        "seq", "xid", "obj", "bdba", "slot", "fb", "rows",
        F.col("v.opcode").alias("opcode"),
        F.col("v.cols").alias("cols"),
    )
    orders = load_table(spark, sf_dir, "orders")
    def _ctl(opcode, scn_off):
        return orders.select(
            (F.col("o_orderkey") * 1000 + scn_off).alias("scn"),
            F.lit(0).alias("subscn"),
            F.lit(0).cast("long").alias("block"),
            F.lit(0).alias("offset"),
            F.lit(1).cast("long").alias("seq"),
            F.col("o_orderkey").cast("string").alias("xid"),
            F.lit(0).cast("long").alias("obj"),
            F.lit(None).cast("long").alias("bdba"),
            F.lit(None).cast("int").alias("slot"),
            F.lit(0).alias("fb"),
            F.lit(None).cast("array<map<string,string>>").alias("rows"),
            F.lit(opcode).alias("opcode"),
            F.lit(None).cast("map<string,string>").alias("cols"),
        )
    return (
        undo_and_update
        .unionByName(_ctl("begin", 0))
        .unionByName(_ctl("commit", 999))
    )


def cdc_before_image(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P5 undo-pairing through the driver gate: 5.1 undo vectors carry
    the before image; assembly pairs each with the row op at the same
    (bdba, slot) and emits it as `before_cols` (OpCode0501.h;
    Transaction.cpp pairing). Every transaction here is exotic (carries
    undo vectors), so this also drives the state-machine route of the
    split assembly under the driver's oracle check."""
    from openlogreplicator_spark.operators.transaction_assembly import (
        assemble_transactions,
    )

    redo = _orders_update_stream(spark, sf_dir)
    assembled = assemble_transactions(redo)
    return assembled.select(
        F.col("xid").cast("bigint").alias("order_xid"),
        "num",
        "op",
        "scn",
        F.element_at("cols", F.lit("l_qty")).cast("bigint").alias("qty_after"),
        F.element_at("before_cols", F.lit("l_qty"))
        .cast("bigint")
        .alias("qty_before"),
    )


CDC_BEFORE_IMAGE_SQL = """
SELECT l_orderkey AS order_xid,
       ROW_NUMBER() OVER (PARTITION BY l_orderkey
                          ORDER BY l_linenumber, CAST(l_quantity AS BIGINT),
                                   l_partkey) - 1 AS num,
       'u' AS op,
       l_orderkey * 1000 + l_linenumber AS scn,
       CAST(l_quantity AS BIGINT) AS qty_after,
       CAST(l_quantity AS BIGINT) + 100 AS qty_before
FROM lineitem
WHERE EXISTS (SELECT 1 FROM orders WHERE o_orderkey = l_orderkey)
"""




# eight region names spanning the timeZoneMap (Locales.cpp:40-640);
# indexed by (o_orderkey DIV 5) % 8 in both the fixture and the oracle
_TSTZ_REGIONS = [
    "Africa/Abidjan", "America/New_York", "America/Sao_Paulo",
    "Asia/Tokyo", "Asia/Kolkata", "Australia/Sydney",
    "Europe/Warsaw", "UTC",
]


def _typed_images_redo_dir(spark: SparkSession, sf_dir: str) -> str:
    """OLRS1 v7 fixture exercising the remaining scalar byte images:
    TIMESTAMP WITH TZ (offset, region-key and unknown-key forms),
    INTERVAL YTM/DTS, BOOLEAN, UROWID, NUMBER, TIMESTAMP — one
    transaction per order, deterministic values derived arithmetically
    from the order columns so a SQL oracle can re-render them exactly.
    v7 plants CORRUPT byte images on every k%11==0 order (month byte
    99, hour byte 0, mantissa digit >99, truncated TSTZ, out-of-range
    interval/boolean/urowid bytes) so the decode plane's columnUnknown
    guards (Builder.cpp:169-613) are exercised end-to-end — those rows
    must render the UNKNOWN_FORMAT '?' fallback, never a plausible
    wrong value."""
    import tempfile

    from openlogreplicator_spark.functions.oracle_types import rowid_expr
    from openlogreplicator_spark.sources.binary_redo import (
        CORRUPT_SENTINEL,
        write_binary_redo,
    )

    out_dir = os.path.join(
        tempfile.gettempdir(),
        "olrs_typed_images_v7",
        os.path.basename(os.path.normpath(sf_dir))
        + "-" + _source_stamp(sf_dir, "orders"),
    )
    if os.path.exists(os.path.join(out_dir, "_SUCCESS")):
        return out_dir

    orders = load_table(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    c = F.col("o_custkey")
    nanos = (k * c) % 1000000000
    tzh = k % 29 - 14
    # TSTZ tz suffix cycles through the reference's three render paths
    # (Builder.cpp:304-339): offset form (modes 0-2), a region key that
    # resolves through the timeZoneMap to an IANA name (mode 3), and a
    # key absent from the map -> the 'TZ?' fallback (mode 4).
    region = F.element_at(
        F.array(*[F.lit(n) for n in _TSTZ_REGIONS]),
        F.expr("CAST(o_orderkey DIV 5 % 8 AS INT) + 1"),
    )
    tz_suffix = (
        F.when(k % 5 == 3, F.concat(F.lit(" "), region))
        .when(k % 5 == 4, F.lit(" TZ?"))
        .otherwise(
            F.concat(
                F.when(tzh >= 0, F.lit(" +")).otherwise(F.lit(" -")),
                F.lpad(F.abs(tzh).cast("string"), 2, "0"),
                F.lit(":00"),
            )
        )
    )
    tstz = F.concat(
        F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss"),
        F.lit("."),
        F.lpad(nanos.cast("string"), 9, "0"),
        tz_suffix,
    )
    months = c % 61 - 30
    m_abs = F.abs(months)
    iym = F.concat(
        F.when(months < 0, F.lit("-")).otherwise(F.lit("")),
        F.expr("CAST(abs(o_custkey % 61 - 30) DIV 12 AS STRING)"),
        F.lit("-"),
        (m_abs % 12).cast("string"),
    )
    tot = (k % 2001 - 1000) * F.lit(987654321987).cast("long")
    a = F.abs(tot)
    ids = F.concat(
        F.when(tot < 0, F.lit("-")).otherwise(F.lit("")),
        F.expr(
            "CAST(abs((o_orderkey % 2001 - 1000) * 987654321987)"
            " DIV 86400000000000 AS STRING)"
        ),
        F.lit(" "),
        F.lpad(
            F.expr(
                "CAST(abs((o_orderkey % 2001 - 1000) * 987654321987)"
                " DIV 3600000000000 % 24 AS STRING)"
            ), 2, "0",
        ),
        F.lit(":"),
        F.lpad(
            F.expr(
                "CAST(abs((o_orderkey % 2001 - 1000) * 987654321987)"
                " DIV 60000000000 % 60 AS STRING)"
            ), 2, "0",
        ),
        F.lit(":"),
        F.lpad(
            F.expr(
                "CAST(abs((o_orderkey % 2001 - 1000) * 987654321987)"
                " DIV 1000000000 % 60 AS STRING)"
            ), 2, "0",
        ),
        F.lit("."),
        F.lpad((a % 1000000000).cast("string"), 9, "0"),
    )
    flag = F.when(F.col("o_orderstatus") == "F", F.lit("1")).otherwise(
        F.lit("0")
    )
    urid = rowid_expr(c, k % 512, k % 4194304, k % 2048)
    # TIMESTAMP WITH LOCAL TZ: the image's wall clock is o_orderdate in
    # the fixture database's +02:00 zone; the canonical (decoded) form
    # is the UTC instant, so the generator shifts the wall clock down
    ltz = F.concat(
        F.date_format(
            F.expr("o_orderdate - INTERVAL 2 HOURS"), "yyyy-MM-dd HH:mm:ss"
        ),
        F.lit("."),
        F.lpad(((k * 7919) % 1000000000).cast("string"), 9, "0"),
    )
    # BINARY_FLOAT: float32 shortest-render string; the encoder re-packs
    # it to the identical 4 bytes (shortest-roundtrip property), the
    # decoder emits repr(float64-widened)
    fval = F.col("o_totalprice").cast("float").cast("string")
    # NUMBER (integer-valued, so canonical text is identical in both
    # engines) and TIMESTAMP complete the fixture's kernel coverage
    num = ((k * 37) % 100000 - 50000).cast("string")
    ts = F.concat(
        F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss"),
        F.lit("."),
        F.lpad(((k * 31) % 1000000000).cast("string"), 9, "0"),
    )

    # Corrupt byte images (planted verbatim via the '!CORRUPT!<hex>'
    # encoder sentinel) — each hits a distinct columnUnknown guard:
    corrupt = k % 11 == 0
    alt = k % 22 == 0

    def corr(canonical, a_hex, b_hex):
        pick = F.when(alt, F.lit(CORRUPT_SENTINEL + a_hex)).otherwise(
            F.lit(CORRUPT_SENTINEL + b_hex)
        )
        return F.when(corrupt, pick).otherwise(canonical)

    # month byte 99 / hour byte 0 (Builder.cpp:242 range check)
    ts = corr(ts, "787c630515242800000000", "787c040500242800000000")
    # truncated 9-byte image / month 99 (Builder.cpp:274/342)
    tstz = corr(tstz, "787c0405152428143c",
                "787c630515242800000000143c")
    # mantissa digit 254 / lone non-zero header (parseNumber 50009 path)
    num = corr(num, "c2ff02", "c1")
    # month byte 200 ∉ [49,71] (Builder.cpp:356)
    iym = corr(iym, "80000001c8", "80000001f0")
    # minute byte 0 ∉ [1,119] / truncated 10-byte image (Builder.cpp:437)
    ids = corr(ids, "800000013c003c80000001", "800000013d3e3f800000")
    # boolean byte 5 / two-byte image (Builder.cpp:597)
    flag = corr(flag, "05", "0100")
    # wrong marker byte / short image (Builder.cpp:607)
    urid = corr(urid, "02" + "00" * 12, "01" + "00" * 9)
    # month byte 99 in the LTZ wall clock (Builder.cpp:198)
    ltz = corr(ltz, "787c630515242800000000", "787c040500242800000000")
    # 3-byte BINARY_FLOAT (Builder.cpp:262) — renders '?', which the
    # query's try_cast(double) nulls, matching the oracle's NULL
    fval = corr(fval, "c0ffee", "c0")

    def frame(scn, opcode, cols):
        return orders.select(
            scn.alias("scn"),
            F.lit(0).alias("subscn"),
            F.lit(0).cast("long").alias("block"),
            F.lit(0).alias("offset"),
            F.lit(1).cast("long").alias("seq"),
            k.cast("string").alias("xid"),
            F.lit(opcode).alias("opcode"),
            (c if opcode == "insert" else F.lit(0)).cast("long").alias("obj"),
            (k if opcode == "insert" else F.lit(None)).cast("long").alias("bdba"),
            (F.lit(0) if opcode == "insert" else F.lit(None)).cast("int").alias("slot"),
            F.lit(0).alias("fb"),
            cols.alias("cols"),
            F.lit(None).cast("array<map<string,string>>").alias("rows"),
        )

    no_cols = F.lit(None).cast("map<string,string>")
    imgs = F.create_map(
        F.lit("o_tstz"), tstz,
        F.lit("o_iym"), iym,
        F.lit("o_ids"), ids,
        F.lit("o_bool"), flag,
        F.lit("o_urowid"), urid,
        F.lit("o_ltz"), ltz,
        F.lit("o_float"), fval,
        F.lit("o_num"), num,
        F.lit("o_ts"), ts,
    )
    redo = (
        frame(k * 1000, "begin", no_cols)
        .unionByName(frame(k * 1000 + 1, "insert", imgs))
        .unionByName(frame(k * 1000 + 999, "commit", no_cols))
    )

    import shutil

    staging = f"{out_dir}.tmp.{os.getpid()}"
    shutil.rmtree(staging, ignore_errors=True)
    write_binary_redo(
        redo,
        staging,
        col_types={
            "o_tstz": "timestamp_tz",
            "o_iym": "interval_ym",
            "o_ids": "interval_ds",
            "o_bool": "boolean",
            "o_urowid": "urowid",
            "o_ltz": "timestamp_ltz",
            "o_float": "binary_float",
            "o_num": "number",
            "o_ts": "timestamp",
        },
    )
    return _publish_fixture(staging, out_dir)


def cdc_typed_images_binary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The long tail of Builder.cpp's scalar decode surface, end to end
    through physical bytes: TIMESTAMP WITH TZ (13-byte; offset, region
    timeZoneMap-name and unknown-key 'TZ?' forms, Builder.cpp:272-353 +
    Locales.cpp:40-640), INTERVAL YEAR TO MONTH / DAY TO SECOND
    (Builder.cpp:354-590), BOOLEAN (Builder.cpp:591-600) and UROWID
    (Builder.cpp:601-613 / RowId.h:114-131) images are encoded into
    OLRS1 v7 files, validated + walked by the parse plane, decoded by
    the byte kernels inside the record walk, assembled per transaction,
    and checked against a SQL oracle that re-renders every value from
    the order columns. Every k%11==0 order carries CORRUPT byte images
    (month 99, hour byte 0, mantissa >99, truncated TSTZ, …): the
    columnUnknown guards (Builder.cpp:169-613) must render those as the
    UNKNOWN_FORMAT '?' fallback, which the oracle pins per row."""
    from openlogreplicator_spark.operators.transaction_assembly import (
        assemble_transactions,
    )
    from openlogreplicator_spark.sources.binary_redo import parse_redo_files

    redo = parse_redo_files(spark, _typed_images_redo_dir(spark, sf_dir))
    assembled = assemble_transactions(redo)
    return assembled.select(
        F.col("xid").cast("bigint").alias("order_xid"),
        "scn",
        "op",
        F.element_at("cols", F.lit("o_tstz")).alias("tstz"),
        F.element_at("cols", F.lit("o_iym")).alias("iym"),
        F.element_at("cols", F.lit("o_ids")).alias("ids"),
        F.element_at("cols", F.lit("o_bool")).alias("flag"),
        F.element_at("cols", F.lit("o_urowid")).alias("urid"),
        F.element_at("cols", F.lit("o_ltz")).alias("ltz"),
        # DOUBLE on both sides: the parse plane renders the float32
        # image as a repr string, but hashing a string against the
        # oracle's DOUBLE depends on two engines' float formatters
        # coinciding. Casting to double makes both engines hash the
        # same 64-bit value through the same conversion path. try_cast:
        # corrupt-image rows render '?' (columnUnknown), which must
        # null out, not throw, under ANSI.
        F.element_at("cols", F.lit("o_float"))
        .try_cast("double").alias("fval"),
        F.element_at("cols", F.lit("o_num")).alias("num"),
        F.element_at("cols", F.lit("o_ts")).alias("ts"),
    )


def _rowid_text_sql(data_obj: str, afn: str, block: str, slot: str) -> str:
    """DuckDB re-render of the 18-char ROWID text (base-64 big-endian
    digit groups, RowId.h:1-274) from integer expressions."""
    alph = (
        "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789+/"
    )
    parts = []
    for expr, width in ((data_obj, 6), (afn, 3), (block, 6), (slot, 3)):
        for i in range(width - 1, -1, -1):
            parts.append(
                f"substr('{alph}', CAST((({expr}) >> {6 * i}) & 63 AS INT)"
                " + 1, 1)"
            )
    return " || ".join(parts)


_TSTZ_REGIONS_SQL = "[" + ", ".join(f"'{n}'" for n in _TSTZ_REGIONS) + "]"

CDC_TYPED_IMAGES_SQL = f"""
WITH base AS (
    SELECT o_orderkey AS k, o_custkey AS c, o_orderdate, o_orderstatus,
           o_totalprice,
           (o_orderkey % 2001 - 1000) * 987654321987 AS tot
    FROM orders
),
vals AS (
SELECT k,
       strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') || '.'
           || lpad(CAST((k * c) % 1000000000 AS VARCHAR), 9, '0')
           || CASE
                WHEN k % 5 = 3 THEN ' ' || list_extract(
                    {_TSTZ_REGIONS_SQL}, CAST(k // 5 % 8 AS INT) + 1)
                WHEN k % 5 = 4 THEN ' TZ?'
                ELSE CASE WHEN k % 29 - 14 >= 0 THEN ' +' ELSE ' -' END
                    || lpad(CAST(abs(k % 29 - 14) AS VARCHAR), 2, '0')
                    || ':00'
              END
           AS tstz,
       CASE WHEN c % 61 - 30 < 0 THEN '-' ELSE '' END
           || CAST(abs(c % 61 - 30) // 12 AS VARCHAR) || '-'
           || CAST(abs(c % 61 - 30) % 12 AS VARCHAR) AS iym,
       CASE WHEN tot < 0 THEN '-' ELSE '' END
           || CAST(abs(tot) // 86400000000000 AS VARCHAR) || ' '
           || lpad(CAST(abs(tot) // 3600000000000 % 24 AS VARCHAR), 2, '0')
           || ':'
           || lpad(CAST(abs(tot) // 60000000000 % 60 AS VARCHAR), 2, '0')
           || ':'
           || lpad(CAST(abs(tot) // 1000000000 % 60 AS VARCHAR), 2, '0')
           || '.'
           || lpad(CAST(abs(tot) % 1000000000 AS VARCHAR), 9, '0') AS ids,
       CASE WHEN o_orderstatus = 'F' THEN '1' ELSE '0' END AS flag,
       {_rowid_text_sql('c', 'k % 512', 'k % 4194304', 'k % 2048')} AS urid,
       strftime(o_orderdate - INTERVAL 2 HOUR, '%Y-%m-%d %H:%M:%S') || '.'
           || lpad(CAST((k * 7919) % 1000000000 AS VARCHAR), 9, '0') AS ltz,
       CAST(CAST(o_totalprice AS REAL) AS DOUBLE) AS fval,
       CAST((k * 37) % 100000 - 50000 AS VARCHAR) AS num,
       strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') || '.'
           || lpad(CAST((k * 31) % 1000000000 AS VARCHAR), 9, '0') AS ts
FROM base
)
-- k%11=0 orders carry corrupt byte images in the fixture: the decode
-- plane's columnUnknown guards render the UNKNOWN_FORMAT '?' fallback
-- ('?' try_casts to NULL for the DOUBLE column)
SELECT k AS order_xid,
       k * 1000 + 1 AS scn,
       'c' AS op,
       CASE WHEN k % 11 = 0 THEN '?' ELSE tstz END AS tstz,
       CASE WHEN k % 11 = 0 THEN '?' ELSE iym END AS iym,
       CASE WHEN k % 11 = 0 THEN '?' ELSE ids END AS ids,
       CASE WHEN k % 11 = 0 THEN '?' ELSE flag END AS flag,
       CASE WHEN k % 11 = 0 THEN '?' ELSE urid END AS urid,
       CASE WHEN k % 11 = 0 THEN '?' ELSE ltz END AS ltz,
       CASE WHEN k % 11 = 0 THEN NULL ELSE fval END AS fval,
       CASE WHEN k % 11 = 0 THEN '?' ELSE num END AS num,
       CASE WHEN k % 11 = 0 THEN '?' ELSE ts END AS ts
FROM vals
"""




_KDO_OBJ = 1001  # the fixture table's object id in the dictionary
_KDO_DICT = {_KDO_OBJ: ["l_qty", "l_price", "l_ship"]}


def _kdo_positional_redo_dir(spark: SparkSession, sf_dir: str) -> str:
    """OLRS1 v5 fixture: column images travel in the reference's KDO
    shape — identified by segment column number under a nulls bitmap,
    with NO names in the stream (OpCode.h KDO parse; nulls handling
    Builder.cpp:1382-1426). Names resolve at parse time against the
    dictionary, as Builder::processDml resolves columns against the
    schema packs. Every 7th lineitem ships a NULL l_ship so the bitmap
    path is exercised on real rows."""
    import tempfile

    from openlogreplicator_spark.sources.binary_redo import write_binary_redo

    out_dir = os.path.join(
        tempfile.gettempdir(),
        "olrs_kdo_positional_v5",
        os.path.basename(os.path.normpath(sf_dir))
        + "-" + _source_stamp(sf_dir, "lineitem", "orders"),
    )
    if os.path.exists(os.path.join(out_dir, "_SUCCESS")):
        return out_dir

    li = load_table(spark, sf_dir, "lineitem")
    dml = li.select(
        (F.col("l_orderkey") * 1000 + F.col("l_linenumber")).alias("scn"),
        F.lit(0).alias("subscn"),
        F.col("l_quantity").cast("long").alias("block"),
        F.col("l_partkey").cast("int").alias("offset"),
        F.lit(1).cast("long").alias("seq"),
        F.col("l_orderkey").cast("string").alias("xid"),
        F.lit("insert").alias("opcode"),
        F.lit(_KDO_OBJ).cast("long").alias("obj"),
        F.col("l_orderkey").alias("bdba"),
        F.col("l_linenumber").alias("slot"),
        F.lit(0).alias("fb"),
        F.map_from_arrays(
            F.array(F.lit("l_qty"), F.lit("l_price"), F.lit("l_ship")),
            F.array(
                F.col("l_quantity").cast("bigint").cast("string"),
                F.col("l_extendedprice").cast("decimal(12,2)").cast("string"),
                F.when(
                    F.col("l_linenumber") % 7 == 0, F.lit(None)
                ).otherwise(F.date_format("l_shipdate", "yyyy-MM-dd HH:mm:ss")),
            ),
        ).alias("cols"),
        F.lit(None).cast("array<map<string,string>>").alias("rows"),
    )
    orders = load_table(spark, sf_dir, "orders")

    def ctl(scn_expr, opcode):
        return orders.select(
            scn_expr.alias("scn"),
            F.lit(0).alias("subscn"),
            F.lit(0).cast("long").alias("block"),
            F.lit(0).alias("offset"),
            F.lit(1).cast("long").alias("seq"),
            F.col("o_orderkey").cast("string").alias("xid"),
            F.lit(opcode).alias("opcode"),
            F.lit(0).cast("long").alias("obj"),
            F.lit(None).cast("long").alias("bdba"),
            F.lit(None).cast("int").alias("slot"),
            F.lit(0).alias("fb"),
            F.lit(None).cast("map<string,string>").alias("cols"),
            F.lit(None).cast("array<map<string,string>>").alias("rows"),
        )

    redo = (
        ctl(F.col("o_orderkey") * 1000, "begin")
        .unionByName(dml)
        .unionByName(ctl(F.col("o_orderkey") * 1000 + 999, "commit"))
    )

    import shutil

    staging = f"{out_dir}.tmp.{os.getpid()}"
    shutil.rmtree(staging, ignore_errors=True)
    write_binary_redo(
        redo,
        staging,
        col_types={"l_qty": "number", "l_price": "number", "l_ship": "date"},
        pos_dicts=_KDO_DICT,
    )
    return _publish_fixture(staging, out_dir)


def cdc_kdo_positional_binary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KDO-shaped physical decode end to end: positional column images
    under a nulls bitmap (no names in the stream) → dictionary resolve
    at parse → transaction assembly → SQL oracle. Proves the parse
    plane works the way the reference's does: what travels is
    (obj, col#, bytes), and names/types come from the replicated
    dictionary (Schema.cpp buildMaps → Builder.cpp:1382-1426)."""
    from openlogreplicator_spark.operators.transaction_assembly import (
        assemble_transactions,
    )
    from openlogreplicator_spark.sources.binary_redo import parse_redo_files

    redo = parse_redo_files(
        spark, _kdo_positional_redo_dir(spark, sf_dir), dictionary=_KDO_DICT
    )
    assembled = assemble_transactions(redo)
    return assembled.select(
        F.col("xid").cast("bigint").alias("order_xid"),
        "scn",
        "num",
        "op",
        F.element_at("cols", F.lit("l_qty")).cast("bigint").alias("qty"),
        # Oracle NUMBER canonical text has no trailing zeros; re-widen to
        # the column's declared scale for the comparison, as the typed
        # decode layer does from SysCol precision/scale
        F.element_at("cols", F.lit("l_price"))
        .cast("decimal(12,2)")
        .cast("string")
        .alias("price"),
        F.element_at("cols", F.lit("l_ship")).alias("ship_ts"),
    )


CDC_KDO_POSITIONAL_SQL = """
SELECT l_orderkey AS order_xid,
       l_orderkey * 1000 + l_linenumber AS scn,
       ROW_NUMBER() OVER (PARTITION BY l_orderkey
                          ORDER BY l_linenumber, CAST(l_quantity AS BIGINT),
                                   l_partkey) - 1 AS num,
       'c' AS op,
       CAST(l_quantity AS BIGINT) AS qty,
       CAST(CAST(l_extendedprice AS DECIMAL(12,2)) AS VARCHAR) AS price,
       CASE WHEN l_linenumber % 7 = 0 THEN NULL
            ELSE strftime(l_shipdate, '%Y-%m-%d %H:%M:%S') END AS ship_ts
FROM lineitem
WHERE EXISTS (SELECT 1 FROM orders WHERE o_orderkey = l_orderkey)
"""




def cdc_txn_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T6 big-transaction split through the REAL builder path
    (Transaction.cpp:518-538): lineitem-derived change events →
    MESSAGE_FORMAT::FULL envelopes capped at 5 ops → one message per
    (xid, part) keyed 'xid:part'. The oracle recomputes the part layout
    arithmetically; op counts per part must match exactly."""
    from pyspark.sql import Window

    from openlogreplicator_spark.builders.json_builder import build_events
    from openlogreplicator_spark.config import Format, MessageFormat

    li = load_table(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_orderkey").orderBy(
        "l_linenumber", F.col("l_quantity").cast("bigint"), "l_partkey"
    )
    events = li.select(
        (F.col("l_orderkey") * 1000 + F.col("l_linenumber")).alias("scn"),
        (F.col("l_orderkey") * 1000).alias("c_scn"),
        F.lit(0).cast("long").alias("c_idx"),
        F.col("l_shipdate").alias("tm"),
        F.lit(1).cast("long").alias("seq"),
        F.col("l_orderkey").cast("string").alias("xid"),
        F.lit("DB").alias("db"),
        F.lit("c").alias("op"),
        F.lit("TPCH").alias("owner"),
        F.lit("LINEITEM").alias("table"),
        F.lit(19).cast("long").alias("obj"),
        F.lit("AAAAATAAEAAAADbAAA").alias("rid"),
        F.lit(None).cast("map<string,string>").alias("before"),
        F.create_map(
            F.lit("L_QTY"), F.col("l_quantity").cast("bigint").cast("string")
        ).alias("after"),
        F.lit(None).cast("map<string,string>").alias("attrs"),
        (F.row_number().over(w) - 1).cast("long").alias("num"),
        (F.col("l_orderkey") * 512).alias("offset"),
    )
    msgs = build_events(
        events, Format(message=MessageFormat.FULL), max_ops_per_message=5
    )
    return msgs.select(
        "key",
        F.json_array_length(
            F.get_json_object("value", "$.payload")
        ).alias("n_ops"),
    )


CDC_TXN_SPLIT_SQL = """
WITH n AS (
    SELECT l_orderkey, COUNT(*) AS n FROM lineitem GROUP BY l_orderkey
),
parts AS (
    SELECT l_orderkey, n,
           UNNEST(generate_series(0, CAST((n + 4) // 5 AS INT) - 1)) AS p
    FROM n
)
SELECT CAST(l_orderkey AS VARCHAR) || ':' || CAST(p AS VARCHAR) AS key,
       CAST(CASE WHEN n - p * 5 >= 5 THEN 5 ELSE n - p * 5 END
            AS INT) AS n_ops
FROM parts
"""




def cdc_partition_routing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partitioned-table DML routing (5.supported-features.adoc
    "partitioned tables"): each lineitem op lands on a partition object
    id; the SYS.TABPART$-shaped map (pobj → bo, SysTabPart.h:27-38)
    resolves it to the base table object before dictionary lookup, with
    the partition position carried for observability. Non-partition
    objects pass through with a NULL position."""
    from openlogreplicator_spark.metadata.schema_registry import (
        resolve_partitions,
    )

    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    # SYS.TABPART$ replica: every part row is one partition of a base
    # table; 97 base tables spread the key space
    part_map = part.select(
        (F.lit(10000) + F.col("p_partkey")).alias("pobj"),
        (F.lit(100) + F.col("p_partkey") % 97).alias("bobj"),
        (F.col("p_partkey") / 97).cast("int").alias("part_pos"),
    )
    events = li.select(
        "l_orderkey",
        "l_linenumber",
        (F.lit(10000) + F.col("l_partkey")).alias("obj"),
    )
    out = resolve_partitions(events, part_map)
    return out.select(
        "l_orderkey",
        "l_linenumber",
        F.col("obj").alias("base_obj"),
        "part_pos",
    )


CDC_PARTITION_ROUTING_SQL = """
WITH part_map AS (
    SELECT 10000 + p_partkey AS pobj,
           100 + p_partkey % 97 AS bobj,
           CAST(p_partkey // 97 AS INT) AS part_pos
    FROM part
)
SELECT l_orderkey, l_linenumber,
       COALESCE(m.bobj, 10000 + l_partkey) AS base_obj,
       m.part_pos
FROM lineitem
LEFT JOIN part_map m ON m.pobj = 10000 + l_partkey
"""


def cdc_type_tail(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-system tail, oracle-checked: LONG(8)/LONG RAW(24) columns
    are value-undecodable — the UNKNOWN_TYPE matrix hides them (default)
    or marks them ('?' / hex dump) per Format.h; JSON(119) columns are
    their own case: EXPERIMENTAL_JSON passes the LOB value through as
    raw hex (Builder.cpp:154-158, BuilderJson.h:445-448), without the
    flag the column never emits. One row per sampled order shows every
    branch side by side."""
    from openlogreplicator_spark.builders.json_builder import _shape_unknown
    from openlogreplicator_spark.config import (
        Format,
        UnknownFormat,
        UnknownType,
    )

    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderkey") % 10 == 0
    )
    img = F.create_map(
        F.lit("c_name"), F.col("o_orderpriority"),
        F.lit("c_long"), F.concat(
            F.lit("L-"), F.col("o_orderstatus"), F.lit("/"),
            F.col("o_orderpriority"),
        ),
        F.lit("c_lraw"), F.md5(F.col("o_orderkey").cast("string")),
        F.lit("c_json"), F.concat(
            F.lit('{"k":'), F.col("o_orderkey").cast("string"), F.lit("}")
        ),
    )
    dict_cols = F.array(
        *[
            F.struct(F.lit(n).alias("name"), F.lit(t).alias("type"))
            for n, t in (
                ("c_name", 1), ("c_long", 8), ("c_lraw", 24), ("c_json", 119)
            )
        ]
    )
    base = orders.select(
        F.col("o_orderkey").alias("order_key"),
        img.alias("_img"),
        dict_cols.alias("_dict"),
    )
    hide = Format(unknown_type=UnknownType.HIDE)
    show_dump = Format(
        unknown_type=UnknownType.SHOW,
        unknown=UnknownFormat.DUMP,
        experimental_json=True,
    )
    show_q = Format(
        unknown_type=UnknownType.SHOW, unknown=UnknownFormat.QUESTION_MARK
    )
    shaped = base.select(
        "order_key",
        _shape_unknown(F.col("_img"), hide, F.col("_dict")).alias("m_hide"),
        _shape_unknown(F.col("_img"), show_dump, F.col("_dict")).alias(
            "m_dump"
        ),
        _shape_unknown(F.col("_img"), show_q, F.col("_dict")).alias("m_q"),
    )
    return shaped.select(
        "order_key",
        F.element_at("m_hide", F.lit("c_name")).alias("name_kept"),
        F.element_at("m_hide", F.lit("c_long")).alias("long_hidden"),
        F.element_at("m_hide", F.lit("c_json")).alias("json_off"),
        F.element_at("m_dump", F.lit("c_long")).alias("long_dump"),
        F.element_at("m_dump", F.lit("c_lraw")).alias("lraw_dump"),
        F.element_at("m_dump", F.lit("c_json")).alias("json_raw"),
        F.element_at("m_q", F.lit("c_long")).alias("long_q"),
        F.element_at("m_q", F.lit("c_lraw")).alias("lraw_q"),
    )


CDC_TYPE_TAIL_SQL = """
SELECT o_orderkey AS order_key,
       o_orderpriority AS name_kept,
       CAST(NULL AS VARCHAR) AS long_hidden,
       CAST(NULL AS VARCHAR) AS json_off,
       lower(hex(encode('L-' || o_orderstatus || '/' || o_orderpriority)))
           AS long_dump,
       lower(hex(encode(md5(CAST(o_orderkey AS VARCHAR))))) AS lraw_dump,
       lower(hex(encode('{"k":' || CAST(o_orderkey AS VARCHAR) || '}')))
           AS json_raw,
       '?' AS long_q,
       '?' AS lraw_q
FROM orders WHERE o_orderkey % 10 = 0
"""


QUERIES = {
    "cdc_type_tail": cdc_type_tail,
    "cdc_ignore_data_errors": cdc_ignore_data_errors,
    "cdc_sessionize": cdc_sessionize,
    "cdc_last_image": cdc_last_image,
    "cdc_txn_assembly": cdc_txn_assembly,
    "cdc_txn_assembly_binary": cdc_txn_assembly_binary,
    "cdc_heartbeat": cdc_heartbeat,
    "cdc_txn_stats": cdc_txn_stats,
    "cdc_ddl_classify": cdc_ddl_classify,
    "cdc_metrics": cdc_metrics,
    "cdc_xmltype_decode": cdc_xmltype_decode,
    "cdc_txn_envelope": cdc_txn_envelope,
    "cdc_condition_filter": cdc_condition_filter,
    "cdc_unchanged_suppression": cdc_unchanged_suppression,
    "cdc_resume_filter": cdc_resume_filter,
    "cdc_schema_asof_resolve": cdc_schema_asof_resolve,
    "cdc_gap_detect": cdc_gap_detect,
    "cdc_adaptive_schema": cdc_adaptive_schema,
    "cdc_schemaless_decode": cdc_schemaless_decode,
    "cdc_asof_snapshot": cdc_asof_snapshot,
    "cdc_before_image": cdc_before_image,
    "cdc_typed_images_binary": cdc_typed_images_binary,
    "cdc_kdo_positional_binary": cdc_kdo_positional_binary,
    "cdc_txn_split": cdc_txn_split,
    "cdc_partition_routing": cdc_partition_routing,
}

ORACLE = {
    "cdc_type_tail": CDC_TYPE_TAIL_SQL,
    "cdc_ignore_data_errors": CDC_IGNORE_DATA_ERRORS_SQL,
    "cdc_schema_asof_resolve": CDC_SCHEMA_ASOF_SQL,
    "cdc_sessionize": CDC_SESSIONIZE_SQL,
    "cdc_last_image": CDC_LAST_IMAGE_SQL,
    "cdc_txn_assembly": CDC_TXN_ASSEMBLY_SQL,
    "cdc_txn_assembly_binary": CDC_TXN_ASSEMBLY_BINARY_SQL,
    "cdc_txn_stats": CDC_TXN_STATS_SQL,
    "cdc_ddl_classify": CDC_DDL_CLASSIFY_SQL,
    "cdc_metrics": _cdc_metrics_sql(),
    "cdc_xmltype_decode": CDC_XMLTYPE_SQL,
    "cdc_txn_envelope": CDC_TXN_ENVELOPE_SQL,
    "cdc_condition_filter": CDC_CONDITION_SQL,
    "cdc_unchanged_suppression": CDC_UNCHANGED_SQL,
    "cdc_resume_filter": CDC_RESUME_SQL,
    "cdc_gap_detect": CDC_GAP_DETECT_SQL,
    "cdc_adaptive_schema": CDC_ADAPTIVE_SCHEMA_SQL,
    "cdc_schemaless_decode": CDC_SCHEMALESS_SQL,
    "cdc_asof_snapshot": CDC_ASOF_SNAPSHOT_SQL,
    "cdc_before_image": CDC_BEFORE_IMAGE_SQL,
    "cdc_typed_images_binary": CDC_TYPED_IMAGES_SQL,
    "cdc_kdo_positional_binary": CDC_KDO_POSITIONAL_SQL,
    "cdc_txn_split": CDC_TXN_SPLIT_SQL,
    "cdc_partition_routing": CDC_PARTITION_ROUTING_SQL,
    "cdc_heartbeat": CDC_HEARTBEAT_SQL,
}
