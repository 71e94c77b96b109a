"""The composed training-corpus construction pipeline — the flagship
"documents in, training corpus out" query that chains the individual
operators end-to-end in ONE lazy DataFrame plan:

    quality gate  →  exact dedup (digest groupBy, keep min doc_id)
                  →  deterministic mix sampling  →  corpus accounting

Each stage reuses the exact operator the standalone queries expose
(`text.filter_gate`, the `dedup_exact` digest rule, `sampling.sample_mix`),
so what the composed pipeline verifies is that the pieces COMPOSE —
Catalyst fuses the gate's map-only projection into the dedup's first
shuffle, and the sampler's hash-threshold predicate runs before the
final aggregation. 100-TB shape: one scan, two data-scale shuffles
(digest groupBy + final (lang, source) agg), everything else map-only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from openlogreplicator_spark.operators.sampling import (
    _DEFAULT_PCT,
    _MIX_CASE,
    _MIX_PCT,
    _n_tokens,
    sample_mix,
)
from openlogreplicator_spark.operators.text import (
    _MAX_DUP_WORD,
    _MAX_TOP_SHARE,
    _MIN_STOP,
    _MIN_WORDS,
    _STOP_SQL,
    filter_gate,
)
from openlogreplicator_spark.sources.tables import load_table


def pipeline_pretraining_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per (lang, source) survivor counts and token mass after the full
    gate → dedup → mix-sample chain."""
    docs = load_table(spark, sf_dir, "documents")
    gated = filter_gate(docs).filter(F.col("keep"))
    # exact dedup: one survivor (min doc_id) per content digest
    w = Window.partitionBy(F.md5("text"))
    deduped = (
        gated.withColumn("_survivor", F.min("doc_id").over(w))
        .filter(F.col("doc_id") == F.col("_survivor"))
        .drop("_survivor")
    )
    sampled = sample_mix(deduped, _MIX_PCT, _DEFAULT_PCT)
    return (
        sampled.groupBy("lang", "source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(_n_tokens()).cast("bigint").alias("total_tokens"),
        )
    )


PIPELINE_PRETRAINING_SQL = f"""
WITH sig AS (
    SELECT *,
           len(string_split_regex(LOWER(TRIM(text)), '\\s+')) AS n_words,
           1.0 - len(list_distinct(string_split_regex(LOWER(TRIM(text)), '\\s+')))
                 / CAST(len(string_split_regex(LOWER(TRIM(text)), '\\s+')) AS DOUBLE)
               AS dup_ratio,
           (SELECT MAX(c) FROM (
               SELECT COUNT(*) AS c
               FROM UNNEST(string_split_regex(LOWER(TRIM(text)), '\\s+')) AS u(w)
               GROUP BY w)) /
               CAST(len(string_split_regex(LOWER(TRIM(text)), '\\s+')) AS DOUBLE)
               AS top_share,
           len(list_filter(string_split_regex(LOWER(TRIM(text)), '\\s+'),
                           w -> w IN ({_STOP_SQL})))
               / CAST(len(string_split_regex(LOWER(TRIM(text)), '\\s+')) AS DOUBLE)
               AS stop_ratio
    FROM documents
), gated AS (
    SELECT * FROM sig
    WHERE n_words >= {_MIN_WORDS}
      AND dup_ratio <= {_MAX_DUP_WORD}
      AND top_share <= {_MAX_TOP_SHARE}
      AND stop_ratio >= {_MIN_STOP}
), deduped AS (
    SELECT * FROM (
        SELECT *, MIN(doc_id) OVER (PARTITION BY md5(text)) AS survivor
        FROM gated
    ) WHERE doc_id = survivor
), sampled AS (
    SELECT * FROM deduped
    WHERE CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT)
          % 100
          < CASE lang {_MIX_CASE} ELSE {_DEFAULT_PCT} END
)
SELECT lang, source, COUNT(*) AS n_docs,
       CAST(SUM(len(string_split_regex(TRIM(text), '\\s+'))) AS BIGINT)
           AS total_tokens
FROM sampled GROUP BY lang, source
"""


QUERIES = {
    "pipeline_pretraining_corpus": pipeline_pretraining_corpus,
}

ORACLE = {
    "pipeline_pretraining_corpus": PIPELINE_PRETRAINING_SQL,
}
