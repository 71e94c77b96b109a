"""LOB reassembly — out-of-row LOB chunks → whole values (SURVEY T8).

The reference buffers LOB pages per LobId (LobCtx/LobData), orders them
via the LOB-index dba chains, and attaches the assembled value to the
owning row at transaction flush; orphaned LOBs (data arriving before the
row) are attached through the LobId↔XID map
(src/parser/Transaction.cpp:286-417, TransactionBuffer.h:64).

Spark shape: LOB chunks are their own keyed stream — ONE shuffle on
lob_id assembles pages in chunk order (partial collect_list + JVM-side
sort; memory per key = one LOB, the same envelope as the reference's
page map). Attachment to the owning event is a broadcast-or-shuffle
equi join on lob_id, never a per-row lookup. Placeholder protocol: a
column whose value is 'LOB:<lob_id>' is replaced by the assembled value
at attach time — unresolved references survive as placeholders (orphans
policy) so a later batch can still attach them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

LOB_CHUNK_SCHEMA = T.StructType(
    [
        T.StructField("lob_id", T.StringType()),
        T.StructField("xid", T.StringType()),
        T.StructField("chunk_idx", T.IntegerType()),   # page order (index dba chain)
        T.StructField("data", T.StringType()),          # page payload (hex/utf8)
    ]
)


def assemble_lobs(chunks: DataFrame) -> DataFrame:
    """(lob_id, value, n_chunks): pages concatenated in chunk order.
    collect_list is partially aggregated per partition; the comparator
    array_sort runs JVM-side after the single lob_id shuffle."""
    return (
        chunks.groupBy("lob_id")
        .agg(
            F.concat_ws(
                "",
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("chunk_idx", "data")),
                        lambda l, r: F.when(l.chunk_idx < r.chunk_idx, -1)
                        .when(l.chunk_idx > r.chunk_idx, 1)
                        .otherwise(0),
                    ),
                    lambda s: s.data,
                ),
            ).alias("value"),
            F.count(F.lit(1)).alias("n_chunks"),
        )
    )


def reassemble_ddl(ddl_chunks: DataFrame) -> DataFrame:
    """P15 DDL text reassembly (OpCode1801.h:28-103): a DDL statement
    arrives chunked across redo records as (xid, seq, cnt, text_part);
    concatenate in seq order per xid — same ordered-concat shape as LOB
    assembly, one shuffle on xid. Emits op='ddl' rows with the full
    statement and a completeness flag (got all `cnt` chunks)."""
    return (
        ddl_chunks.groupBy("xid")
        .agg(
            F.concat_ws(
                "",
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("seq", "text_part")),
                        lambda l, r: F.when(l.seq < r.seq, -1)
                        .when(l.seq > r.seq, 1)
                        .otherwise(0),
                    ),
                    lambda s: s.text_part,
                ),
            ).alias("ddl_text"),
            F.count(F.lit(1)).alias("n_chunks"),
            F.max("cnt").alias("expected_chunks"),
        )
        .withColumn("complete", F.col("n_chunks") == F.col("expected_chunks"))
        .withColumn("op", F.lit("ddl"))
    )


def attach_lobs(events: DataFrame, lobs: DataFrame, cols_field: str = "cols") -> DataFrame:
    """Replace 'LOB:<id>' placeholders inside the event's column map with
    assembled values. One equi join on the extracted lob_id (null for
    events without LOB references — those skip the join via left join)."""
    ref = F.map_filter(
        F.col(cols_field), lambda k, v: v.startswith("LOB:")
    )
    with_ref = events.withColumn(
        "_lob_id",
        F.try_element_at(F.map_values(ref), F.lit(1)).substr(F.lit(5), F.lit(1 << 10)),
    )
    joined = with_ref.join(
        lobs.select(F.col("lob_id").alias("_lob_id"), F.col("value").alias("_lob_value")),
        on="_lob_id",
        how="left",
    )
    patched = F.transform_values(
        F.col(cols_field),
        lambda k, v: F.when(
            v.startswith("LOB:") & F.col("_lob_value").isNotNull(),
            F.col("_lob_value"),
        ).otherwise(v),
    )
    return joined.withColumn(cols_field, patched).drop("_lob_id", "_lob_value")
