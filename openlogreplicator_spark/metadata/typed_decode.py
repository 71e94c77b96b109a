"""Catalog-driven typed decode: string image maps → typed columns.

The reference decodes each row image against the column metadata of its
table (DbColumn type/precision/scale — src/common/DbColumn.h:28-57,
decode dispatch src/builder/Builder.cpp:89-690). Here the canonical
string values produced by the byte-decode kernels are cast to Spark
types selected by the SysCol COLTYPE code (src/common/table/SysCol.h:69-92):

    1/96   VARCHAR2/CHAR      → string
    2      NUMBER             → decimal(p,s) (or string when p unset —
                                Oracle NUMBER without precision is unbounded)
    12     DATE               → timestamp_ntz (Oracle DATE keeps time)
    180    TIMESTAMP          → timestamp_ntz
    181    TIMESTAMP WITH TZ  → string (offset-rendered)
    23     RAW                → binary (hex decode)
    100    BINARY_FLOAT       → float
    101    BINARY_DOUBLE      → double
    182/183 INTERVALS         → string (ISO-ish render)
    252    BOOLEAN            → boolean
    unknown                   → string + '?'-marking left to the builder

The whole decode is a single JVM-side projection (element_at + cast per
column) — the catalog drives the plan, no Python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_TYPE_CAST = {
    1: "string",
    96: "string",
    12: "timestamp_ntz",
    180: "timestamp_ntz",
    181: "string",
    182: "string",
    183: "string",
    100: "float",
    101: "double",
    252: "boolean",
}


def _cast_for(col_type: int, precision, scale) -> str | None:
    if col_type == 2:
        if precision:
            return f"decimal({int(precision)},{int(scale or 0)})"
        return "string"  # unbounded NUMBER
    if col_type == 23:
        return "binary"
    return _TYPE_CAST.get(col_type, "string")


def typed_image(
    events: DataFrame,
    columns: list[dict],
    image_col: str = "after",
    hidden_ok: bool = False,
    xml_ctx: tuple[dict, dict] | None = None,
) -> DataFrame:
    """Project the string map image into typed columns for one table.

    ``columns``: dictionary rows as dicts with keys name/type/precision/
    scale/property (the collected DICT_COL_SCHEMA subset for one obj,
    already filtered through visible_columns unless hidden_ok).

    ``xml_ctx``: (tag_names, attr_names) dictionaries enabling binary
    XMLTYPE decode of type-58 columns — the EXPERIMENTAL_XMLTYPE bit
    (Ctx.h:101; Schema.cpp:487 builds the XmlCtx only under the flag).
    Without it, XMLTYPE images pass through as the undecoded hex the
    byte kernels produced, matching the reference's flag-off behavior."""
    exprs: list[Column] = []
    for c in sorted(columns, key=lambda c: c.get("col", 0)):
        raw = F.element_at(F.col(image_col), F.lit(c["name"]))
        cast = _cast_for(c["type"], c.get("precision"), c.get("scale"))
        if c["type"] == 23:
            val = F.unhex(raw)
        elif c["type"] == 58 and xml_ctx is not None:
            from openlogreplicator_spark.functions.xmltype import (
                xmltype_decode_udf,
            )

            val = xmltype_decode_udf(*xml_ctx)(F.unhex(raw))
        else:
            val = raw.cast(cast)
        exprs.append(val.alias(c["name"]))
    return events.select("*", *exprs)


def decode_table_events(
    events: DataFrame,
    dict_col: DataFrame,
    obj: int,
    image_col: str = "after",
) -> DataFrame:
    """Decode all events of one table: pull its column metadata from the
    dictionary (driver-side — the dictionary is catalog-scale, not
    data-scale) and emit the typed projection."""
    cols = [
        r.asDict()
        for r in dict_col.filter(F.col("obj") == obj).collect()
    ]
    return typed_image(
        events.filter(F.col("obj") == obj), cols, image_col=image_col
    )
