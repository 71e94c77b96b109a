"""CLOB path: LOB reassembly followed by charset decode.

The reference decodes CLOB/NCLOB values by first assembling the LOB
page map and THEN running the charset conversion over the assembled
bytes (Builder.cpp:160-165 → parseString): chunk boundaries fall at
arbitrary byte offsets, so decoding per-chunk would split multi-byte
characters. This operator proves the engine's pipeline has the same
property: Shift-JIS bytes are shredded at 3-byte boundaries (guaranteed
to split 2-byte characters), reassembled in chunk order, and decoded
once — md5 of the decoded text must equal md5 of the original string,
which the DuckDB oracle computes from the same column derivation.

Scale shape: the shred is a map-only explode; reassembly is the one
lob_id shuffle of assemble_lobs; the decode is one Arrow-batched kernel
over the assembled values (the designated slow path, same as the
reference's per-column charset loop).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from openlogreplicator_spark.sources.tables import load_table

# 3-byte chunks (in hex: 6 chars) split every 2-byte Shift-JIS character
# that straddles a boundary — the adversarial shred for a charset CLOB.
_CLOB_CHUNK_BYTES = 3


def _sjis_hex():
    """Fixture-side encode UDF: text → hex of its Shift-JIS bytes (the
    inverse direction of the parse plane; exists only to build the
    shredded fixture, like oracle_types' encode_* kernels). Built lazily
    — pandas_udf needs an active session."""

    @pandas_udf("string")
    def f(text):
        return text.map(lambda s: s.encode("shift_jis").hex())

    return f


def _sjis_decode_hex():
    """Parse-plane decode UDF: hex bytes → text via the Shift-JIS table
    (charset_decode's JA16SJIS path, Arrow-batched)."""

    @pandas_udf("string")
    def f(hexval):
        from openlogreplicator_spark.functions.oracle_types import (
            charset_decode,
        )

        return hexval.map(
            lambda h: charset_decode(bytes.fromhex(h), "JA16SJIS")
        )

    return f


def cdc_clob_charset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CLOB reassembly + charset decode end to end: per document, a
    mixed Japanese/ASCII string is encoded to Shift-JIS, shredded into
    3-byte chunks (characters split across chunks), reassembled by the
    LOB operator, and decoded once — (doc_id, n_chunks, md5(decoded))
    against an oracle that derives the same string relationally."""
    from openlogreplicator_spark.operators.lob_assembly import assemble_lobs

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    # printable-ASCII-sanitized body, SAME derivation as the oracle
    # (r12 review-pass-10): the oracle's byte arithmetic equates char
    # count with Shift-JIS byte count, which only holds for ASCII — a
    # regenerated corpus containing multibyte text would silently break
    # the n_chunks formula (and non-SJIS-encodable chars would crash
    # the encode); the sanitize makes the invariant structural
    ascii_body = F.regexp_replace(
        F.substring("text", 1, 80), r"[^\x20-\x7e]", ""
    )
    jp = F.concat(F.lit("返品承認テスト "), ascii_body, F.lit(" 済"))
    hexed = docs.select(
        F.concat(F.lit("C"), F.col("doc_id")).alias("lob_id"),
        _sjis_hex()(jp).alias("hx"),
    )
    hex_chunk = _CLOB_CHUNK_BYTES * 2
    n_chunks = F.ceil(F.length("hx") / hex_chunk).cast("int")
    shredded = hexed.select(
        "lob_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), n_chunks - 1),
                lambda i: F.struct(
                    i.alias("chunk_idx"),
                    F.substring("hx", i * hex_chunk + 1, hex_chunk).alias(
                        "data"
                    ),
                ),
            )
        ).alias("c"),
    ).select("lob_id", F.col("c.chunk_idx").alias("chunk_idx"), F.col("c.data").alias("data"))
    assembled = assemble_lobs(shredded)
    return assembled.select(
        F.expr("CAST(substring(lob_id, 2) AS BIGINT)").alias("doc_id"),
        F.col("n_chunks").cast("int").alias("n_chunks"),
        F.md5(_sjis_decode_hex()(F.col("value"))).alias("text_md5"),
    )


CDC_CLOB_CHARSET_SQL = """
WITH body AS (
    SELECT doc_id,
           regexp_replace(substr(text, 1, 80), '[^\\x20-\\x7e]', '', 'g')
               AS b
    FROM documents
)
SELECT doc_id,
       -- Shift-JIS bytes: 7 two-byte JP chars + space = 15, ASCII body
       -- 1 byte/char, trailing ' 済' = 3 ⇒ len + 18 bytes, 3 per chunk
       CAST(CEIL((LENGTH(b) + 18) / 3.0) AS INT) AS n_chunks,
       md5('返品承認テスト ' || b || ' 済') AS text_md5
FROM body
"""


QUERIES = {
    "cdc_clob_charset": cdc_clob_charset,
}

ORACLE = {
    "cdc_clob_charset": CDC_CLOB_CHARSET_SQL,
}
