"""Rows-only driver queries for operators whose output is not
SQL-expressible in DuckDB (JSON envelope bytes, stubbed media decode).
Their correctness is covered by golden unit tests instead
(tests/test_json_builder.py, tests/test_multimodal.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from openlogreplicator_spark.builders.json_builder import build_events
from openlogreplicator_spark.config import Format, debezium_preset
from openlogreplicator_spark.sources.tables import load_table


def _orders_as_change_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic CHANGE_EVENT_SCHEMA stream derived from orders."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        (F.col("o_orderkey") * 10).alias("scn"),
        (F.col("o_orderkey") * 10 - 5).alias("c_scn"),
        F.lit(0).cast("long").alias("c_idx"),
        F.col("o_orderdate").alias("tm"),
        F.lit(1).cast("long").alias("seq"),
        F.concat_ws(
            ".",
            (F.col("o_custkey") % 8).cast("string"),
            (F.col("o_custkey") % 16).cast("string"),
            F.col("o_orderkey").cast("string"),
        ).alias("xid"),
        F.lit("DB").alias("db"),
        F.when(F.col("o_orderstatus") == "O", "c")
        .when(F.col("o_orderstatus") == "P", "u")
        .otherwise("d")
        .alias("op"),
        F.lit("TPCH").alias("owner"),
        F.lit("ORDERS").alias("table"),
        F.lit(18).cast("long").alias("obj"),
        F.lit("AAAAASAAEAAAADbAAA").alias("rid"),
        F.when(
            F.col("o_orderstatus") != "O",
            F.create_map(
                F.lit("O_ORDERKEY"), F.col("o_orderkey").cast("string"),
                F.lit("O_PRIO"), F.col("o_orderpriority"),
            ),
        ).alias("before"),
        F.when(
            F.col("o_orderstatus") != "F",
            F.create_map(
                F.lit("O_ORDERKEY"), F.col("o_orderkey").cast("string"),
                F.lit("O_PRIO"), F.col("o_orderpriority"),
            ),
        ).alias("after"),
        F.create_map(F.lit("OS_USER_NAME"), F.lit("tpch")).alias("attrs"),
        F.lit(0).cast("long").alias("num"),
        (F.col("o_orderkey") * 512).alias("offset"),
    )


def cdc_json_builder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B1 JSON event builder over a deterministic order-derived stream —
    the DuckDB oracle reconstructs the exact message BYTES (header field
    order, per-op payload sections, COLUMN_FORMAT::CHANGED's empty
    update before-image), so the default-format envelope is
    hash-checked, not just golden-tested. redo_thread=True exercises
    REDO_THREAD_FORMAT::TEXT (Format.h:91, BuilderJson.h:346-349) —
    single-instance streams always carry "rth":1."""
    events = _orders_as_change_events(spark, sf_dir)
    return build_events(
        events,
        Format(attributes=True, redo_thread=True),
        tag_cols=("O_ORDERKEY",),
    )


CDC_JSON_BUILDER_SQL = """
SELECT '{"O_ORDERKEY":"' || o_orderkey || '"}' AS key,
       '{"scn":' || (o_orderkey * 10)
       || ',"tm":' || epoch_us(o_orderdate)
       || ',"xid":"' || (o_custkey % 8) || '.' || (o_custkey % 16) || '.'
       || o_orderkey
       || '","db":"DB","rth":1,"attrs":{"OS_USER_NAME":"tpch"},"payload":[{"op":"'
       || CASE o_orderstatus WHEN 'O' THEN 'c' WHEN 'P' THEN 'u'
          ELSE 'd' END
       || '","schema":{"owner":"TPCH","table":"ORDERS","obj":18},'
       || '"rid":"AAAAASAAEAAAADbAAA"'
       || CASE WHEN o_orderstatus <> 'O'
               THEN ',"before":{' || CASE WHEN o_orderstatus = 'P' THEN ''
                    ELSE '"O_ORDERKEY":"' || o_orderkey || '","O_PRIO":"'
                         || o_orderpriority || '"' END || '}'
               ELSE '' END
       || CASE WHEN o_orderstatus <> 'F'
               THEN ',"after":{"O_ORDERKEY":"' || o_orderkey
                    || '","O_PRIO":"' || o_orderpriority || '"}'
               ELSE '' END
       || '}]}' AS value
FROM orders
"""


def cdc_config_reference(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O1 reference-config ingestion, end to end: a config in the
    reference's OpenLogReplicator.json format (OpenLogReplicator.cpp:
    145-1247; scripts/OpenLogReplicator-example*.json) is parsed by
    reference_config.from_reference_json — version gate, unknown-key
    checks, numeric format-toggle decode — and the resulting Format
    drives the JSON builder over the deterministic order-derived stream.
    The DuckDB oracle reconstructs the exact bytes the decoded toggles
    must produce (hex scn, decimal xid, ADD_SEQUENCES seq field,
    ADD_OFFSET payload offset, rth, attrs, db=ALL), so a mis-decoded
    toggle is a hash mismatch, not just a parse error."""
    from openlogreplicator_spark.reference_config import from_reference_json

    doc = {
        "version": "1.9.0",
        "source": [
            {
                "alias": "SOURCE",
                "name": "DBNAME",
                "reader": {"type": "offline"},
                # message 18 = ADD_SEQUENCES|ADD_OFFSET; xid 1 = TEXT_DEC;
                # scn 1 = TEXT_HEX; db 3 = ALL; attributes 7 = all kinds
                "format": {
                    "type": "json", "message": 18, "rid": 1, "xid": 1,
                    "scn": 1, "db": 3, "redo-thread": 1, "attributes": 7,
                },
                "filter": {
                    "table": [
                        {"owner": "TPCH", "table": ".*",
                         "key": "O_ORDERKEY", "tag": "[pk]"}
                    ]
                },
            }
        ],
        "target": [
            {"alias": "T", "source": "SOURCE", "writer": {"type": "discard"}}
        ],
    }
    dep = from_reference_json(doc)
    sel = dep.config.selectors[0]
    return build_events(
        _orders_as_change_events(spark, sf_dir),
        dep.config.fmt,
        tag_cols=sel.tag,
        key_cols=sel.key,
    )


CDC_CONFIG_REFERENCE_SQL = """
SELECT '{"O_ORDERKEY":"' || o_orderkey || '"}' AS key,
       '{"scns":"0x' || lpad(lower(hex(o_orderkey * 10)), 16, '0')
       || '","tm":' || epoch_ns(o_orderdate)
       || ',"xid":"' || (o_custkey % 8) || '.' || (o_custkey % 16) || '.'
       || o_orderkey
       || '","db":"DBNAME","rth":1,"seq":1,'
       || '"attrs":{"OS_USER_NAME":"tpch"},"payload":[{"op":"'
       || CASE o_orderstatus WHEN 'O' THEN 'c' WHEN 'P' THEN 'u'
          ELSE 'd' END
       || '","schema":{"owner":"TPCH","table":"ORDERS","obj":18},'
       || '"rid":"AAAAASAAEAAAADbAAA"'
       || CASE WHEN o_orderstatus <> 'O'
               THEN ',"before":{' || CASE WHEN o_orderstatus = 'P' THEN ''
                    ELSE '"O_ORDERKEY":"' || o_orderkey || '","O_PRIO":"'
                         || o_orderpriority || '"' END || '}'
               ELSE '' END
       || CASE WHEN o_orderstatus <> 'F'
               THEN ',"after":{"O_ORDERKEY":"' || o_orderkey
                    || '","O_PRIO":"' || o_orderpriority || '"}'
               ELSE '' END
       || ',"offset":' || (o_orderkey * 512)
       || '}]}' AS value
FROM orders
"""


def _orders_dict_cols(spark: SparkSession) -> DataFrame:
    """Dictionary rows (DICT_COL_SCHEMA) for the synthetic ORDERS obj —
    drives schema sections + FULL_UPD/PK shaping in the builders."""
    from openlogreplicator_spark.event_model import DICT_COL_SCHEMA

    rows = [
        (18, 0, 0, 0, "O_ORDERKEY", 2, 22, 10, 0, 873, False, 1, 0, 0),
        (18, 1, 1, 1, "O_PRIO", 1, 15, None, None, 873, True, 0, 0, 0),
        (18, 2, 2, 2, "O_NOTE", 1, 64, None, None, 873, True, 0, 0, 0),
    ]
    return spark.createDataFrame(rows, DICT_COL_SCHEMA)


def cdc_json_builder_debezium(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B3 Debezium preset output shape — FULL_UPD images materialized
    over the dictionary column list plus SCHEMA_FORMAT::FULL column
    descriptors on each transaction's first op per table. The DuckDB
    oracle reconstructs the exact bytes: millisecond timestamps, the
    full column-descriptor block, per-op FULL_UPD sections with
    explicit nulls for undictionaried columns."""
    return build_events(
        _orders_as_change_events(spark, sf_dir),
        debezium_preset(),
        dict_cols=_orders_dict_cols(spark),
    )


_DBZ_SCHEMA_BLOCK = (
    '"schema":{"owner":"TPCH","table":"ORDERS","obj":18,"columns":['
    '{"name":"O_ORDERKEY","type":"number","precision":10,"scale":0,'
    '"nullable":false},'
    '{"name":"O_PRIO","type":"varchar2","length":15,"nullable":true},'
    '{"name":"O_NOTE","type":"varchar2","length":64,"nullable":true}]}'
)

CDC_JSON_DEBEZIUM_SQL = f"""
WITH src AS (
    SELECT o_orderkey AS k, o_orderpriority AS prio,
           (o_custkey % 8) || '.' || (o_custkey % 16) || '.' || o_orderkey
               AS xid,
           -- XID_FORMAT::TEXT_REVERSED (the debezium preset,
           -- OpenLogReplicator.cpp:707): hex16 of the packed xid with
           -- byte pairs shuffled (appendHex16Reversed byte order
           -- 1,0,3,2,7,6,5,4)
           printf('%016x',
                  (CAST(o_custkey % 8 AS BIGINT) << 48)
                  + (CAST(o_custkey % 16 AS BIGINT) << 32)
                  + o_orderkey) AS xh,
           CASE o_orderstatus WHEN 'O' THEN 'c' WHEN 'P' THEN 'u'
                ELSE 'd' END AS op,
           epoch_ms(o_orderdate) AS tm_ms
    FROM orders
), rev AS (
    SELECT *,
           substr(xh,3,2) || substr(xh,1,2) || substr(xh,7,2)
           || substr(xh,5,2) || substr(xh,15,2) || substr(xh,13,2)
           || substr(xh,11,2) || substr(xh,9,2) AS rxid
    FROM src
), img AS (
    SELECT *, '"O_ORDERKEY":"' || k || '","O_PRIO":"' || prio
              || '","O_NOTE":null' AS full_img
    FROM rev
)
SELECT xid AS key,
       '{{"scn":' || (k * 10) || ',"e_scn":' || (k * 10 - 5)
       || ',"tm":' || tm_ms || ',"xid":"' || rxid
       || '","db":"DB","payload":[{{"op":"' || op || '",'
       || '{_DBZ_SCHEMA_BLOCK}'
       || ',"rid":"AAAAASAAEAAAADbAAA"'
       || CASE WHEN op IN ('u', 'd')
               THEN ',"before":{{' || full_img || '}}' ELSE '' END
       || CASE WHEN op IN ('c', 'u')
               THEN ',"after":{{' || full_img || '}}' ELSE '' END
       || '}}]}}' AS value
FROM img
"""


def multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched REAL media decode (pure-Python PNG/BMP/PPM/WAV/MPNG
    codecs) over the deterministic synthetic corpus, surfaced as the
    arithmetic the synthesis formula predicts (the r4
    multimodal_image_stats pattern): decoded kind/format/dims/frame
    count per blob, the exact integer pixel sum for stills and every
    video frame, and the exact RIFF/WAVE byte length for audio. A
    decoder that misreads a header, drops a PNG filter, or truncates
    frames lands off the oracle's closed-form values."""
    from openlogreplicator_spark.operators.multimodal import (
        decode_media,
        synth_media,
    )

    dec = decode_media(synth_media(spark, 128))
    visual = F.col("kind") != "audio"
    return dec.select(
        "media_id",
        "kind",
        "decoder",
        F.coalesce(F.col("width"), F.lit(-1)).cast("bigint").alias("width"),
        F.coalesce(F.col("height"), F.lit(-1)).cast("bigint").alias("height"),
        F.col("n_frames").cast("bigint").alias("n_frames"),
        F.when(
            visual,
            F.round(
                F.col("mean_intensity") * 255.0 * F.col("width")
                * F.col("height") * 3 * F.col("n_frames")
            ),
        )
        .otherwise(F.lit(-1))
        .cast("bigint")
        .alias("pixel_sum"),
        F.when(~visual, F.col("n_bytes"))
        .otherwise(F.lit(-1))
        .cast("bigint")
        .alias("audio_bytes"),
    )


# closed-form reconstruction of synth_media + the decode statistics:
# band sums lsum/rsum from _synth_pixels(i); image dims 32+(i%8)*16 ×
# 24+(i%8)*12; video = (i%6)+2 frames of _synth_pixels(i+k) at 16×12;
# WAV bytes = 44-byte canonical header + 2 bytes per sample.
MULTIMODAL_DECODE_SQL = """
WITH m AS (SELECT CAST(i AS BIGINT) AS i FROM range(128) t(i)),
calc AS (
    SELECT i,
           CASE i % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
                ELSE 'video' END AS kind,
           CASE i % 3
                WHEN 0 THEN list_extract(['png','bmp','ppm'], (i // 3) % 3 + 1)
                WHEN 1 THEN 'wav' ELSE 'mpng' END AS decoder,
           CASE i % 3 WHEN 0 THEN 32 + (i % 8) * 16
                WHEN 1 THEN 16000 ELSE 16 END AS width,
           CASE i % 3 WHEN 0 THEN 24 + (i % 8) * 12
                WHEN 1 THEN -1 ELSE 12 END AS height,
           CASE i % 3 WHEN 2 THEN (i % 6) + 2 ELSE 1 END AS n_frames
    FROM m
)
SELECT i AS media_id, kind, decoder,
       CAST(width AS BIGINT) AS width,
       CAST(height AS BIGINT) AS height,
       CAST(n_frames AS BIGINT) AS n_frames,
       CAST(CASE kind
            WHEN 'image' THEN
                ((i % 256) + (i * 7) % 256 + (i * 13) % 256
                 + (i * 31) % 256 + (i * 3) % 256 + (i * 17) % 256)
                * (width // 2) * height
            WHEN 'video' THEN
                -- unrolled over the ≤7 frames (DuckDB lacks lateral
                -- column params to generate_series): frame k exists
                -- when k < n_frames; per-frame sum = band sums × 8×12
                (""" + " + ".join(
    f"""CASE WHEN {k} < n_frames THEN
                (((i + {k}) % 256) + ((i + {k}) * 7) % 256
                 + ((i + {k}) * 13) % 256 + ((i + {k}) * 31) % 256
                 + ((i + {k}) * 3) % 256 + ((i + {k}) * 17) % 256) * 96
             ELSE 0 END"""
    for k in range(7)
) + """)
            ELSE -1 END AS BIGINT) AS pixel_sum,
       CAST(CASE kind WHEN 'audio' THEN 44 + 2 * (400 + 40 * (i % 10))
            ELSE -1 END AS BIGINT) AS audio_bytes
FROM calc
"""


def multimodal_features_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary stills → REAL 8×8 tiny-image descriptors → cosine top-3:
    the full multimodal-to-ANN pipeline, driver-checked end to end. The
    synthetic stills are two-band images, so the 64-dim descriptor
    collapses to 32 copies of each band's truncated grayscale — the
    oracle recomputes every cosine in closed form from the band
    formula; all intermediate values (k/256 grid, exact float products)
    are exactly representable, so the hash pins the real decode →
    pool → normalize → rank chain, not an approximation of it."""
    from openlogreplicator_spark.operators.multimodal import (
        extract_features,
        synth_media,
    )
    from openlogreplicator_spark.operators.similarity import cosine_topk

    media = synth_media(spark, 128).filter(F.col("kind") == "image")
    feats = extract_features(media).select(
        F.col("media_id").alias("vec_id"), F.col("feature").alias("embedding")
    )
    queries = feats.filter(F.col("vec_id") % 12 == 0)
    return cosine_topk(feats, queries, k=3)


MULTIMODAL_FEATURES_ANN_SQL = """
WITH img AS (
    SELECT CAST(i AS BIGINT) AS i,
           ((i % 256) + (i * 7) % 256 + (i * 13) % 256) // 3 AS lg,
           ((i * 31) % 256 + (i * 3) % 256 + (i * 17) % 256) // 3 AS rg
    FROM range(128) t(i) WHERE i % 3 = 0
),
vec AS (
    SELECT i, (lg + 1) / 256.0 AS fl, (rg + 1) / 256.0 AS fr,
           SQRT(32 * ((lg + 1) / 256.0) * ((lg + 1) / 256.0)
                + 32 * ((rg + 1) / 256.0) * ((rg + 1) / 256.0)) AS nrm
    FROM img
),
pairs AS (
    SELECT q.i AS query_id, n.i AS neighbor_id,
           (32 * q.fl * n.fl + 32 * q.fr * n.fr) / (q.nrm * n.nrm) AS cos
    FROM vec q JOIN vec n ON n.i <> q.i
    WHERE q.i % 12 = 0
),
ranked AS (
    SELECT query_id, neighbor_id, cos,
           ROW_NUMBER() OVER (PARTITION BY query_id
                              ORDER BY cos DESC, neighbor_id) AS rank
    FROM pairs
)
SELECT query_id, neighbor_id, CAST(rank AS INT) AS rank,
       ROUND(cos, 6) AS cos_r
FROM ranked WHERE rank <= 3
"""


def cdc_protobuf_builder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B2 protobuf event builder (hand-rolled wire format) over the
    order-derived change stream. The value column is the message HEX so
    the DuckDB oracle can rebuild the exact wire bytes — varints,
    length-delimited framing, nested Schema/Value messages and all
    (see _pb_sql helpers); the framing is additionally golden-tested by
    an independent wire parser in tests/test_protobuf_builder.py."""
    from openlogreplicator_spark.builders.protobuf_builder import (
        build_protobuf_events,
    )

    msgs = build_protobuf_events(_orders_as_change_events(spark, sf_dir))
    return msgs.select("key", F.lower(F.hex("value")).alias("value_hex"))


def _pb_varint_sql(v: str, max_groups: int = 10) -> str:
    """DuckDB expression: hex of the protobuf varint of BIGINT ``v``.
    Negative int64 encodes as its two's-complement uint64 (the 10-byte
    varint), like the builder's _varint — the HUGEINT mask makes the
    shifts act unsigned. ``max_groups`` bounds the unrolled 7-bit
    groups (lambda-free concat of CASEs — ~10× cheaper than a
    list_reduce per value) from the caller's known value range; pass 10
    whenever the value can be negative."""
    m = f"(CAST(({v}) AS HUGEINT) & ((1::HUGEINT << 64) - 1))"
    parts = []
    for i in range(max_groups):
        cond = "TRUE" if i == 0 else f"({m} >> {7 * i}) > 0"
        byte = (
            f"printf('%02x', CAST((({m} >> {7 * i}) & 127) "
            f"+ CASE WHEN ({m} >> {7 * (i + 1)}) > 0 THEN 128 "
            "ELSE 0 END AS INT))"
        )
        parts.append(f"CASE WHEN {cond} THEN {byte} ELSE '' END")
    return "(" + " || ".join(parts) + ")"


def _pb_vi_sql(field: int, v: str, max_groups: int = 10) -> str:
    """field-keyed varint (wire type 0)."""
    key = (field << 3) | 0
    return f"'{key:02x}' || {_pb_varint_sql(v, max_groups)}"


def _pb_ld_sql(field: int, hex_expr: str) -> str:
    """field-keyed length-delimited payload given its HEX expression
    (nested messages here stay far below 16 KiB → ≤2 length groups)."""
    key = (field << 3) | 2
    ln = f"length({hex_expr}) // 2"
    return f"'{key:02x}' || {_pb_varint_sql(ln, 2)} || ({hex_expr})"


def _pb_s_sql(field: int, s: str) -> str:
    """field-keyed string (the builder's _s)."""
    return _pb_ld_sql(field, f"lower(hex(encode({s})))")


def _pb_value_sql(name_sql: str, value_sql: str) -> str:
    """pb::Value — name=1, value_string=5."""
    return f"{_pb_s_sql(1, name_sql)} || {_pb_s_sql(5, value_sql)}"


def _cdc_protobuf_sql() -> str:
    """DuckDB reconstruction of the exact RedoResponse wire bytes the
    builder emits for the order-derived stream (encode_event /
    encode_payload / encode_schema field layout, including per-column
    repeated Value framing)."""
    val_okey = _pb_value_sql("'O_ORDERKEY'", "CAST(k AS VARCHAR)")
    val_prio = _pb_value_sql("'O_PRIO'", "prio")

    def img(field: int) -> str:
        # repeated Value: one length-delimited message PER column, in
        # sorted key order (encode_payload's `for k in sorted(img)`)
        a = _pb_ld_sql(field, "(" + val_okey + ")")
        b = _pb_ld_sql(field, "(" + val_prio + ")")
        return a + " || " + b

    schema = (
        _pb_s_sql(1, "'TPCH'")
        + " || " + _pb_s_sql(2, "'ORDERS'")
        + " || " + _pb_vi_sql(3, "18", 1)
    )
    # payload: op enum(1, omitted for 0=BEGIN), schema(2), rid(3),
    # before*(4)/after*(5) by op kind, seq(7)=1, offset(8)=k*512,
    # num(10)=varint(0) → key 0x50 + 0x00
    payload = (
        _pb_vi_sql(1, "opnum", 1)
        + " || " + _pb_ld_sql(2, "(" + schema + ")")
        + " || " + _pb_s_sql(3, "'AAAAASAAEAAAADbAAA'")
        + " || CASE WHEN op <> 'c' THEN " + img(4) + " ELSE '' END"
        + " || CASE WHEN op <> 'd' THEN " + img(5) + " ELSE '' END"
        + " || " + _pb_vi_sql(7, "1", 1)
        + " || CASE WHEN k > 0 THEN " + _pb_vi_sql(8, "k * 512", 5)
        + " ELSE '' END"  # offset 0 is falsy — the builder omits it
        + " || '5000'"
    )
    event = (
        "'0805' || "  # code=1 varint ResponseCode::PAYLOAD (=5) on every
        # data message (BuilderProtobuf.h:98)
        + _pb_vi_sql(2, "k * 10", 5)
        + " || " + _pb_vi_sql(4, "tm_us", 8)
        + " || " + _pb_s_sql(6, "xid")
        + " || " + _pb_s_sql(8, "'DB'")
        + " || " + _pb_ld_sql(9, "(" + payload + ")")
        + " || " + _pb_vi_sql(10, "k * 10 - 5", 10)
    )
    return (
        """
WITH src AS (
    SELECT o_orderkey AS k, o_orderpriority AS prio,
           (o_custkey % 8) || '.' || (o_custkey % 16) || '.' || o_orderkey
               AS xid,
           CASE o_orderstatus WHEN 'O' THEN 'c' WHEN 'P' THEN 'u'
                ELSE 'd' END AS op,
           CASE o_orderstatus WHEN 'O' THEN 2 WHEN 'P' THEN 3 ELSE 4 END
               AS opnum,
           epoch_us(o_orderdate) AS tm_us
    FROM orders
)
SELECT xid AS key, """
        + event
        + """ AS value_hex
FROM src
"""
    )


def cdc_protobuf_builder_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B2+T6: protobuf MESSAGE_FORMAT::FULL envelopes — one RedoResponse
    per transaction with repeated Payload entries (BuilderProtobuf.h:
    95-190) — under the byte-true ``max-message-mb`` split
    (Builder.h:167; Transaction.cpp:519-538 closes a message when the
    accumulated rendered bytes would cross the cap). lineitem rows
    become multi-op transactions keyed by orderkey; a 400-byte cap
    forces real splits. The oracle rebuilds the exact wire bytes AND
    replays the greedy byte packing with a recursive CTE, so the hash
    pins both the envelope framing and the split boundaries."""
    from pyspark.sql import Window

    from openlogreplicator_spark.builders.protobuf_builder import (
        build_protobuf_events,
    )
    from openlogreplicator_spark.config import MessageFormat

    li = load_table(spark, sf_dir, "lineitem")
    # the synthetic lineitem does NOT key on (orderkey, linenumber) —
    # order by the full rendered projection so row_number ties can only
    # fall between byte-identical ops (any tiebreak yields the same
    # message bytes on both sides of the oracle)
    w = Window.partitionBy("l_orderkey").orderBy(
        "l_linenumber", "l_quantity", "l_returnflag", "l_shipdate"
    )
    events = li.select(
        (F.col("l_orderkey") * 1000 + F.col("l_linenumber")).alias("scn"),
        (F.col("l_orderkey") * 1000 + 999).alias("c_scn"),
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
        # variable-length value (the synthetic lineitem has no comment
        # column) so the byte packer sees uneven op sizes
        F.create_map(
            F.lit("L_CMT"),
            F.concat(
                F.repeat(F.lit("ab"), F.col("l_quantity").cast("int") % 13),
                F.col("l_returnflag"),
            ),
            F.lit("L_QTY"), F.col("l_quantity").cast("bigint").cast("string"),
        ).alias("after"),
        (F.row_number().over(w) - 1).cast("long").alias("num"),
        (F.col("l_linenumber") * 512).cast("long").alias("offset"),
    )
    msgs = build_protobuf_events(
        events,
        fmt=Format(message=MessageFormat.FULL, add_sequences=True),
        max_message_bytes=400,
    )
    return msgs.select("key", F.lower(F.hex("value")).alias("value_hex"))


def _cdc_protobuf_full_sql(cap: int = 400) -> str:
    """DuckDB reconstruction of the FULL-envelope wire bytes plus the
    greedy byte-true split: per-op framed Payload hex (field 9), header
    prefix/suffix hex from the first-op fields, then a recursive CTE
    carrying (part, running bytes) op-by-op — exactly greedy_parts'
    fold, anchored at header bytes per part."""
    val_cmt = _pb_value_sql("'L_CMT'", "cmt")
    val_qty = _pb_value_sql("'L_QTY'", "qty")
    schema = (
        _pb_s_sql(1, "'TPCH'")
        + " || " + _pb_s_sql(2, "'LINEITEM'")
        + " || " + _pb_vi_sql(3, "19", 1)
    )
    payload = (
        _pb_vi_sql(1, "2", 1)  # op 'c' → INSERT(2)
        + " || " + _pb_ld_sql(2, "(" + schema + ")")
        + " || " + _pb_s_sql(3, "'AAAAATAAEAAAADbAAA'")
        + " || " + _pb_ld_sql(5, "(" + val_cmt + ")")  # sorted after keys
        + " || " + _pb_ld_sql(5, "(" + val_qty + ")")
        + " || " + _pb_vi_sql(10, "rn - 1", 1)  # num (ADD_SEQUENCES);
        # DML payloads carry no seq/offset under a Format — those are
        # CHKPT-only fields (BuilderProtobuf.cpp:326-331)
    )
    prefix = (
        "'0805' || "  # code=1 → ResponseCode::PAYLOAD
        + _pb_vi_sql(2, "okey * 1000 + first_ln", 5)  # first-op scn
        + " || " + _pb_vi_sql(4, "tm_us", 8)
        + " || " + _pb_s_sql(6, "xid")
        + " || " + _pb_s_sql(8, "'DB'")
    )
    suffix = _pb_vi_sql(10, "okey * 1000 + 999", 5)  # c_scn; c_idx 0 omitted
    return f"""
WITH RECURSIVE src AS (
    SELECT CAST(l_orderkey AS VARCHAR) AS xid,
           l_orderkey AS okey,
           l_linenumber AS ln,
           ROW_NUMBER() OVER (PARTITION BY l_orderkey
                              ORDER BY l_linenumber, l_quantity,
                                       l_returnflag, l_shipdate) AS rn,
           repeat('ab', CAST(l_quantity AS INT) % 13) || l_returnflag AS cmt,
           CAST(CAST(l_quantity AS BIGINT) AS VARCHAR) AS qty,
           l_shipdate AS sd
    FROM lineitem
),
ops AS (
    SELECT xid, okey, rn,
           {_pb_ld_sql(9, "(" + payload + ")")} AS op_hex
    FROM src
),
sized AS (
    SELECT xid, okey, rn, op_hex, length(op_hex) // 2 AS sz FROM ops
),
hdr AS (
    SELECT xid, okey,
           {prefix} AS prefix,
           {suffix} AS suffix
    FROM (
        SELECT xid, okey, ln AS first_ln, epoch_us(sd) AS tm_us
        FROM src WHERE rn = 1
    )
),
hsz AS (
    SELECT xid, (length(prefix) + length(suffix)) // 2 AS hb FROM hdr
),
g AS (
    SELECT s.xid, s.rn, s.op_hex, h.hb,
           0 AS part, h.hb + s.sz AS bytes
    FROM sized s JOIN hsz h USING (xid) WHERE s.rn = 1
    UNION ALL
    SELECT o.xid, o.rn, o.op_hex, g.hb,
           CASE WHEN g.bytes + o.sz > {cap}
                THEN g.part + 1 ELSE g.part END,
           CASE WHEN g.bytes + o.sz > {cap}
                THEN g.hb + o.sz ELSE g.bytes + o.sz END
    FROM g JOIN sized o ON o.xid = g.xid AND o.rn = g.rn + 1
)
SELECT g.xid || ':' || CAST(g.part AS VARCHAR) AS key,
       h.prefix || string_agg(g.op_hex, '' ORDER BY g.rn) || h.suffix
           AS value_hex
FROM g JOIN hdr h ON h.xid = g.xid
GROUP BY g.xid, g.part, h.prefix, h.suffix
"""


def cdc_lob_reassembly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T8 end-to-end against a SQL oracle — through the LOB-INDEX path:
    each document's text is shredded into out-of-row chunks addressed by
    a scrambled dba (NO chunk index, reversed arrival order); page order
    is derivable only from the index dba chains (dba → next_dba), ranked
    by the hash-bucketed chain walk, exactly the reference's orderList
    model (Transaction.cpp:331-344). md5(assembled) must equal
    md5(original text)."""
    from openlogreplicator_spark.operators.lob_assembly import (
        assemble_lobs_indexed,
        chain_page_numbers,
    )

    docs = load_table(spark, sf_dir, "documents")
    chunk = 200
    # an empty document has CEIL(0/200)=0 chunks and must emit NO rows:
    # F.sequence(0, -1) yields the DESCENDING [0, -1] in Spark, which
    # fabricated two phantom chunks (one with a negative dba) while the
    # oracle's recursive walk produced none (r12 review-pass-9; latent
    # on the current min-length-44 corpus)
    docs = docs.filter(F.length("text") > 0)
    n_chunks = F.ceil(F.length("text") / chunk).cast("int")
    # dba: position-scrambled but unique per (lob, page): order is NOT
    # recoverable from the dba value — only the chains define it
    dba = lambda i: (i * F.lit(2654435761) + F.col("doc_id")) % F.lit(1 << 31)  # noqa: E731
    shredded = docs.select(
        F.concat(F.lit("L"), F.col("doc_id")).alias("lob_id"),
        F.explode(
            F.transform(
                F.sequence(F.lit(0), n_chunks - 1),
                lambda i: F.struct(
                    dba(i).alias("dba"),
                    F.substring(
                        F.col("text"), i * chunk + 1, chunk
                    ).alias("data"),
                ),
            )
        ).alias("c"),
    ).select(
        "lob_id",
        F.lit(None).cast("string").alias("xid"),
        F.col("c.dba").alias("dba"),
        F.col("c.data").alias("data"),
    )
    # reverse arrival order: reassembly must not depend on input order
    shredded = shredded.sortWithinPartitions(F.col("dba").desc())
    chains = docs.filter(n_chunks > 1).select(
        F.concat(F.lit("L"), F.col("doc_id")).alias("lob_id"),
        F.explode(
            F.transform(
                F.sequence(F.lit(0), n_chunks - 2),
                lambda i: F.struct(
                    dba(i).alias("dba"), dba(i + 1).alias("next_dba")
                ),
            )
        ).alias("e"),
    ).select("lob_id", F.col("e.dba").alias("dba"), F.col("e.next_dba").alias("next_dba"))
    single_page = docs.filter(n_chunks <= 1).select(
        F.concat(F.lit("L"), F.col("doc_id")).alias("lob_id"),
        dba(F.lit(0)).alias("dba"),
        F.lit(0).alias("page_no"),
    )
    page_map = chain_page_numbers(chains).unionByName(single_page)
    assembled = assemble_lobs_indexed(shredded, page_map)
    return assembled.select(
        F.col("lob_id"),
        F.md5("value").alias("value_md5"),
        "n_chunks",
    )


CDC_LOB_SQL = """
SELECT 'L' || doc_id AS lob_id,
       md5(text) AS value_md5,
       CAST(CEIL(LENGTH(text) / 200.0) AS BIGINT) AS n_chunks
FROM documents
"""


def multimodal_decode_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The multimodal decode stage over REAL table blobs with a SQL
    oracle: document text re-cast as opaque binary payloads runs through
    the same Arrow-batched ``decode_media`` plumbing as the synthetic
    media corpus (schema, batch shape, map-only stage), and every decoded
    statistic — byte count, checksum, mean byte intensity — is
    independently recomputed by DuckDB. Text blobs carry no media magic,
    so this drives the decoder's `raw` passthrough branch; the real
    codecs are oracle-checked by multimodal_image_stats."""
    from openlogreplicator_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        decode_media,
    )

    docs = load_table(spark, sf_dir, "documents")
    meta_t = MEDIA_SCHEMA["meta"].dataType
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("blob").alias("kind"),
        F.col("text").cast("binary").alias("data"),
        F.lit(None).cast(meta_t).alias("meta"),
    )
    out = decode_media(media)
    return out.select(
        "media_id",
        "n_bytes",
        "checksum",
        F.round("mean_intensity", 6).alias("mean_intensity"),
        "decoder",
    )


MULTIMODAL_DECODE_TABLE_SQL = """
SELECT doc_id AS media_id,
       CAST(strlen(text) AS INT) AS n_bytes,
       md5(text) AS checksum,
       ROUND(list_sum(list_transform(range(1, CAST(strlen(text) AS INT) + 1),
                 i -> ord(substring(text, i, 1))))
             / strlen(text) / 255.0, 6) AS mean_intensity,
       'raw' AS decoder
FROM documents
"""


def multimodal_image_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image decode end-to-end against an independent oracle: each
    selected order becomes a two-band BMP/PNG/PPM image (geometry and
    band colors are arithmetic functions of the order columns), encoded
    in an Arrow stage, decoded by the pure-Python codecs
    (functions/imagecodec.py), and the decoded geometry + EXACT pixel
    sum (an integer — no float-formatting race) are recomputed by
    DuckDB from the same arithmetic. A decoder column proves which
    codec ran."""
    import pandas as pd

    from openlogreplicator_spark.functions import imagecodec as ic
    from openlogreplicator_spark.operators.multimodal import (
        _synth_pixels,
        decode_media,
    )

    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderkey") % 20 == 0
    ).select("o_orderkey")

    def enc(batches):
        for pdf in batches:
            ids, blobs = [], []
            for k in pdf["o_orderkey"]:
                k = int(k)
                w = 8 + (k % 8) * 2
                h = 6 + (k % 6)
                px = _synth_pixels(k, w, h)
                fmt = ("png", "bmp", "ppm")[k % 3]
                data = {
                    "png": ic.encode_png,
                    "bmp": ic.encode_bmp,
                    "ppm": ic.encode_ppm,
                }[fmt](px)
                ids.append(k)
                blobs.append(bytearray(data))
            yield pd.DataFrame({"media_id": ids, "data": blobs})

    media = orders.mapInPandas(
        enc, schema="media_id long, data binary"
    ).select(
        "media_id",
        F.lit("image").alias("kind"),
        "data",
        F.lit(None).cast(
            "struct<format:string,width:int,height:int,"
            "sample_rate:int,n_frames:int>"
        ).alias("meta"),
    )
    out = decode_media(media)
    return out.select(
        "media_id",
        "width",
        "height",
        "decoder",
        F.round(
            F.col("mean_intensity") * 255.0 * F.col("width")
            * F.col("height") * 3
        ).cast("long").alias("pixel_sum"),
    )


MULTIMODAL_IMAGE_STATS_SQL = """
WITH src AS (
    SELECT o_orderkey AS k,
           8 + (o_orderkey % 8) * 2 AS w,
           6 + (o_orderkey % 6) AS h
    FROM orders WHERE o_orderkey % 20 = 0
)
SELECT k AS media_id,
       CAST(w AS INT) AS width,
       CAST(h AS INT) AS height,
       CASE k % 3 WHEN 0 THEN 'png' WHEN 1 THEN 'bmp' ELSE 'ppm' END
           AS decoder,
       ((k % 256) + (k * 7) % 256 + (k * 13) % 256) * (w // 2) * h
       + ((k * 31) % 256 + (k * 3) % 256 + (k * 17) % 256)
         * (w - w // 2) * h AS pixel_sum
FROM src
"""


QUERIES = {
    "cdc_json_builder": cdc_json_builder,
    "cdc_config_reference": cdc_config_reference,
    "cdc_json_builder_debezium": cdc_json_builder_debezium,
    "multimodal_decode": multimodal_decode,
    "multimodal_decode_table": multimodal_decode_table,
    "multimodal_image_stats": multimodal_image_stats,
    "multimodal_features_ann": multimodal_features_ann,
    "cdc_lob_reassembly": cdc_lob_reassembly,
    "cdc_protobuf_builder": cdc_protobuf_builder,
    "cdc_protobuf_builder_full": cdc_protobuf_builder_full,
}

ORACLE: dict[str, str] = {
    "cdc_json_builder": CDC_JSON_BUILDER_SQL,
    "cdc_config_reference": CDC_CONFIG_REFERENCE_SQL,
    "cdc_protobuf_builder": _cdc_protobuf_sql(),
    "cdc_protobuf_builder_full": _cdc_protobuf_full_sql(),
    "cdc_json_builder_debezium": CDC_JSON_DEBEZIUM_SQL,
    "cdc_lob_reassembly": CDC_LOB_SQL,
    "multimodal_decode_table": MULTIMODAL_DECODE_TABLE_SQL,
    "multimodal_image_stats": MULTIMODAL_IMAGE_STATS_SQL,
    "multimodal_decode": MULTIMODAL_DECODE_SQL,
    "multimodal_features_ann": MULTIMODAL_FEATURES_ANN_SQL,
}
