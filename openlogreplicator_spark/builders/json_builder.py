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
    Format,
    MessageFormat,
    ScnFormat,
    TimestampFormat,
    XidFormat,
)


def scn_expr(fmt: Format, col: str = "scn") -> Column:
    if fmt.scn == ScnFormat.HEX:
        return F.concat(F.lit("0x"), F.lpad(F.lower(F.hex(F.col(col))), 16, "0"))
    return F.col(col)


def xid_expr(fmt: Format, col: str = "xid") -> Column:
    """xid arrives as 'usn.slt.sqn' text (Xid.h); render per XID_FORMAT."""
    parts = F.split(F.col(col), r"\.")
    usn = F.element_at(parts, 1).cast("long")
    slt = F.element_at(parts, 2).cast("long")
    sqn = F.element_at(parts, 3).cast("long")
    if fmt.xid == XidFormat.NUMERIC:
        return F.shiftleft(usn, 48) + F.shiftleft(slt, 32) + sqn
    if fmt.xid == XidFormat.TEXT_HEX:
        return F.concat(
            F.lit("0x"),
            F.lower(F.hex(usn)), F.lit("."),
            F.lower(F.hex(slt)), F.lit("."),
            F.lower(F.hex(sqn)),
        )
    return F.col(col)


def tm_expr(fmt: Format, col: str = "tm") -> Column:
    # NTZ parquet timestamps arrive as TIMESTAMP_NTZ; unix_* need TIMESTAMP
    # (session TZ is UTC, so the cast is value-preserving)
    c = F.col(col).cast("timestamp")
    if fmt.timestamp == TimestampFormat.ISO8601:
        return F.date_format(c, "yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'")
    if fmt.timestamp == TimestampFormat.UNIX_MILLI:
        return (F.unix_micros(c) / 1000).cast("long")
    if fmt.timestamp == TimestampFormat.UNIX_SEC:
        return F.unix_timestamp(c)
    return F.unix_micros(c)


def _images(fmt: Format) -> tuple[Column, Column]:
    """before/after images per COLUMN_FORMAT. CHANGED drops unchanged
    columns from the update's before image (Builder.cpp:1467-1506)."""
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
        return changed_before, after
    return before, after


def payload_struct(fmt: Format) -> Column:
    before, after = _images(fmt)
    fields = [
        F.col("op").alias("op"),
        F.struct(
            F.col("owner").alias("owner"),
            F.col("table").alias("table"),
            F.col("obj").alias("obj"),
        ).alias("schema"),
        F.col("rid").alias("rid"),
        before.alias("before"),
        after.alias("after"),
    ]
    if fmt.add_offset:
        fields.append(F.col("offset").alias("offset"))
    return F.struct(*fields)


def header_fields(fmt: Format) -> list[Column]:
    fields = [
        scn_expr(fmt).alias("scn"),
        tm_expr(fmt).alias("tm"),
        xid_expr(fmt).alias("xid"),
        F.lit(fmt.db_name).alias("db"),
    ]
    if fmt.add_sequences:
        fields.append(F.col("seq").alias("seq"))
    if fmt.attributes:
        fields.append(F.col("attrs").alias("attrs"))
    return fields


def tag_expr(tag_cols: tuple[str, ...]) -> Column:
    """B5 message key: rendered tag columns from the after/before image."""
    img = F.coalesce(F.col("after"), F.col("before"))
    if not tag_cols:
        return F.col("xid")
    return F.to_json(
        F.struct(
            *[F.element_at(img, F.lit(c)).alias(c) for c in tag_cols]
        )
    )


def build_events(
    events: DataFrame,
    fmt: Format,
    tag_cols: tuple[str, ...] = (),
    max_ops_per_message: int | None = None,
) -> DataFrame:
    """CHANGE_EVENT_SCHEMA rows → (key, value) JSON messages.

    ``max_ops_per_message`` is the T6 big-transaction split
    (Transaction.cpp:518-538): a FULL-format transaction whose payload
    exceeds the cap is emitted as multiple messages keyed 'xid:part'."""
    df = events
    if fmt.skip_begin:
        df = df.filter(F.col("op") != "begin")
    if fmt.skip_commit:
        df = df.filter(F.col("op") != "commit")

    if fmt.message == MessageFormat.FULL:
        # one message per transaction: ordered payload array (T5 emission
        # order restored via num inside the collect)
        per_event = df.select(
            "xid",
            "num",
            F.struct(*header_fields(fmt)).alias("hdr"),
            payload_struct(fmt).alias("p"),
        )
        grouped = per_event.groupBy("xid").agg(
            F.min_by("hdr", "num").alias("hdr"),
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("num", "p")),
                    # maps inside the payload struct aren't orderable —
                    # compare on the emission index alone
                    lambda l, r: F.when(l.num < r.num, -1)
                    .when(l.num > r.num, 1)
                    .otherwise(0),
                ),
                lambda s: s.p,
            ).alias("payload"),
        )
        if max_ops_per_message:
            cap = max_ops_per_message
            n_parts = F.ceil(F.size("payload") / cap).cast("int")
            parts = F.transform(
                F.sequence(F.lit(0), n_parts - 1),
                lambda i: F.struct(
                    i.alias("part"),
                    F.slice("payload", i * cap + 1, cap).alias("chunk"),
                ),
            )
            grouped = grouped.select(
                "xid", "hdr", F.explode(parts).alias("pc")
            ).select(
                "xid",
                "hdr",
                F.col("pc.part").alias("part"),
                F.col("pc.chunk").alias("payload"),
            )
            value = F.to_json(
                F.struct(
                    F.col("hdr.scn").alias("scn"),
                    F.col("hdr.tm").alias("tm"),
                    F.col("hdr.xid").alias("xid"),
                    F.col("hdr.db").alias("db"),
                    F.col("part").alias("part"),
                    F.col("payload").alias("payload"),
                )
            )
            return grouped.select(
                F.concat_ws(":", "xid", "part").alias("key"), value.alias("value")
            )
        value = F.to_json(
            F.struct(
                F.col("hdr.scn").alias("scn"),
                F.col("hdr.tm").alias("tm"),
                F.col("hdr.xid").alias("xid"),
                F.col("hdr.db").alias("db"),
                F.col("payload").alias("payload"),
            )
        )
        return grouped.select(
            F.col("xid").alias("key"), value.alias("value")
        )

    value = F.to_json(
        F.struct(
            *header_fields(fmt),
            F.array(payload_struct(fmt)).alias("payload"),
        )
    )
    return df.select(tag_expr(tag_cols).alias("key"), value.alias("value"))
