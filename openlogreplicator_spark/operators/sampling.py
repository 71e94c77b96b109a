"""Training-mix construction: deterministic sampling + sequence packing.

Two operations every pretraining data pipeline runs between "corpus" and
"dataloader":

- stratified mix sampling: keep a per-stratum (language/source) fraction
  of documents, DETERMINISTICALLY — the keep decision hashes the doc id,
  so re-runs, backfills, and multi-site runs agree without coordination
  or a stored sample list. (``df.sampleBy`` is seeded-random per task and
  not reproducible across repartitions; hash-threshold sampling is.)
- sequence packing: concatenate documents into fixed token-budget
  training sequences (greedy in a deterministic order). Expressed as a
  running-sum window + integer division — one shuffle on the stratum,
  no Python.

Both are map/window-only: at 100 TB the only data movement is the
per-stratum window partition, and strata (languages × sources) are few
and balanced relative to cluster size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from openlogreplicator_spark.sources.tables import load_table

# per-language keep rate (percent) — the "training mix" weights
_MIX_PCT = {"en": 80, "de": 50, "fr": 30}
_DEFAULT_PCT = 10
_SEQ_TOKEN_BUDGET = 512


def _n_tokens():
    """Whitespace token count of `text` — must stay in lockstep with the
    DuckDB oracle's len(string_split_regex(TRIM(text), '\\s+')); defined
    once so a tokenization tweak can't desynchronize the four queries
    that share it."""
    return F.size(F.split(F.trim(F.col("text")), r"\s+"))


def _keep_bucket(id_col):
    """Deterministic 0-99 bucket from the doc id: first 8 md5 hex digits
    mod 100. md5 (not xxhash) so the DuckDB oracle reproduces it
    byte-identically."""
    return (
        F.conv(F.substring(F.md5(id_col.cast("string")), 1, 8), 16, 10)
        .cast("bigint") % 100
    )


def sample_mix(docs: DataFrame, pct: dict[str, int], default_pct: int) -> DataFrame:
    rate = F.coalesce(
        *[
            F.when(F.col("lang") == lang, F.lit(p)) for lang, p in pct.items()
        ],
        F.lit(default_pct),
    )
    return docs.withColumn("_bucket", _keep_bucket(F.col("doc_id"))).filter(
        F.col("_bucket") < rate
    )


def sample_training_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language doc counts and token mass after deterministic
    mix-weighted sampling."""
    docs = load_table(spark, sf_dir, "documents")
    kept = sample_mix(docs, _MIX_PCT, _DEFAULT_PCT)
    n_tokens = _n_tokens()
    return kept.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(n_tokens).cast("bigint").alias("total_tokens"),
    )


_MIX_CASE = " ".join(
    f"WHEN '{lang}' THEN {p}" for lang, p in _MIX_PCT.items()
)

SAMPLE_MIX_SQL = f"""
SELECT lang, COUNT(*) AS n_docs,
       CAST(SUM(len(string_split_regex(TRIM(text), '\\s+'))) AS BIGINT)
           AS total_tokens
FROM documents
WHERE CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT)
      % 100
      < CASE lang {_MIX_CASE} ELSE {_DEFAULT_PCT} END
GROUP BY lang
"""


def pack_sequences(
    docs: DataFrame, token_budget: int = _SEQ_TOKEN_BUDGET
) -> DataFrame:
    """Assign each document to a fixed-budget training sequence: docs are
    taken in deterministic (lang, doc_id) order and packed greedily by
    cumulative token count — seq_id = floor((cumsum - n_tokens) /
    budget), i.e. a document starts a new sequence when the running total
    crosses the budget. One window per language partition."""
    n_tokens = _n_tokens()
    w = Window.partitionBy("lang").orderBy("doc_id")
    with_cum = docs.select(
        "doc_id", "lang", n_tokens.alias("n_tokens")
    ).withColumn("cum", F.sum("n_tokens").over(w))
    return with_cum.select(
        "doc_id",
        "lang",
        "n_tokens",
        F.floor((F.col("cum") - F.col("n_tokens")) / token_budget)
        .cast("bigint")
        .alias("seq_id"),
    )


def pack_training_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-packing summary: per (lang, seq_id) document count and
    token fill — the dataloader's unit of work."""
    docs = load_table(spark, sf_dir, "documents")
    packed = pack_sequences(docs)
    return packed.groupBy("lang", "seq_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("seq_tokens"),
    )


PACK_SEQUENCES_SQL = f"""
WITH toks AS (
    SELECT doc_id, lang,
           len(string_split_regex(TRIM(text), '\\s+')) AS n_tokens
    FROM documents
), packed AS (
    SELECT doc_id, lang, n_tokens,
           CAST(FLOOR((SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
                                           ROWS UNBOUNDED PRECEDING)
                       - n_tokens) / {_SEQ_TOKEN_BUDGET}.0) AS BIGINT)
               AS seq_id
    FROM toks
)
SELECT lang, seq_id, COUNT(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS seq_tokens
FROM packed GROUP BY lang, seq_id
"""


# train/valid/test boundaries on the 0-99 hash bucket: [0,80) train,
# [80,90) valid, [90,100) test
_SPLIT_TRAIN, _SPLIT_VALID = 80, 90


def assign_split(docs: DataFrame) -> DataFrame:
    """Leakage-safe holdout assignment: the split is a pure function of
    the document id (md5 bucket), so a document can never change split
    between runs, re-partitions, or backfills — the property that makes
    a decontamination scan against the eval split stable over time.
    Map-only; no shuffle."""
    b = _keep_bucket(F.col("doc_id"))
    return docs.withColumn(
        "split",
        F.when(b < _SPLIT_TRAIN, F.lit("train"))
        .when(b < _SPLIT_VALID, F.lit("valid"))
        .otherwise(F.lit("test")),
    )


def split_train_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-construction audit: per (split, lang) document count and
    token mass — the table a pretraining run signs off before training.
    One hash-partitioned aggregation; the split itself is map-only."""
    docs = load_table(spark, sf_dir, "documents")
    n_tokens = _n_tokens()
    return assign_split(docs).groupBy("split", "lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(n_tokens).cast("bigint").alias("total_tokens"),
    )


SPLIT_TRAIN_EVAL_SQL = f"""
WITH assigned AS (
    SELECT lang, text,
           CASE WHEN CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)
                          AS BIGINT) % 100 < {_SPLIT_TRAIN} THEN 'train'
                WHEN CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)
                          AS BIGINT) % 100 < {_SPLIT_VALID} THEN 'valid'
                ELSE 'test' END AS split
    FROM documents
)
SELECT split, lang, COUNT(*) AS n_docs,
       CAST(SUM(len(string_split_regex(TRIM(text), '\\s+'))) AS BIGINT)
           AS total_tokens
FROM assigned GROUP BY split, lang
"""


# temperature-sampling knobs: alpha=0.5 rebalances toward low-resource
# strata; M is the target mix size as a fraction of the corpus.
# Determinism note (r12 review-pass-7): each per-language sqrt(cnt) is
# IEEE-exact, but z = SUM(sqrt(cnt)) is a float sum whose accumulation
# ORDER the engines don't guarantee to match — an ulp difference in z
# flips FLOOR only when the true rate sits exactly on an integer
# percent boundary, which the 0.4 target and organic counts make
# vanishingly unlikely but not impossible. The rates are deterministic
# PER ENGINE RUN (same data → same partial-agg tree per engine); the
# cross-engine claim is "equal except on exact integer boundaries".
_TEMP_TARGET_FRAC = 0.4


def sample_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled multilingual mixing (the p_l^alpha upsampling
    rule used by multilingual pretraining runs, alpha=0.5): per-language
    keep rates are proportional to sqrt(corpus share), normalized to hit
    a target mix size, then applied with the deterministic md5-bucket
    keep rule. Emits per-language rate and achieved counts.

    100-TB shape: one language-count aggregate (vocabulary-of-languages
    sized), the rate table broadcast back onto the scan, one final
    partial-agg rollup — the per-document work is map-only."""
    docs = load_table(spark, sf_dir, "documents")
    counts = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("cnt"))
    totals = counts.agg(
        F.sum(F.sqrt("cnt")).alias("z"), F.sum("cnt").alias("n")
    )
    rates = (
        counts.join(F.broadcast(totals))
        .withColumn(
            "rate_pct",
            F.floor(
                F.lit(100.0)
                * (
                    F.lit(_TEMP_TARGET_FRAC)
                    * F.col("n")
                    * F.sqrt("cnt")
                    / F.col("z")
                )
                / F.col("cnt")
            ).cast("bigint"),
        )
        .select("lang", "rate_pct")
    )
    kept = (
        docs.join(F.broadcast(rates), "lang")
        .withColumn("_bucket", _keep_bucket(F.col("doc_id")))
        .filter(F.col("_bucket") < F.col("rate_pct"))
    )
    return kept.groupBy("lang", "rate_pct").agg(
        F.count(F.lit(1)).alias("n_kept")
    )


SAMPLE_TEMPERATURE_SQL = f"""
WITH counts AS (SELECT lang, COUNT(*) AS cnt FROM documents GROUP BY lang),
totals AS (SELECT SUM(sqrt(cnt)) AS z, SUM(cnt) AS n FROM counts),
rates AS (
    SELECT lang,
           CAST(FLOOR(100 * ({_TEMP_TARGET_FRAC} * n * sqrt(cnt) / z) / cnt)
                AS BIGINT) AS rate_pct
    FROM counts, totals
)
SELECT d.lang, r.rate_pct, COUNT(*) AS n_kept
FROM documents d JOIN rates r ON d.lang = r.lang
WHERE CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT)
      % 100 < r.rate_pct
GROUP BY d.lang, r.rate_pct
"""


_GROUP_CAP = 10  # max docs kept per source


def cap_per_group(docs: DataFrame, cap: int = _GROUP_CAP) -> DataFrame:
    """Deterministic per-source document cap (dump balancing: one
    over-crawled domain/CommonCrawl dump must not dominate the mix).
    Docs rank within their source by md5(doc_id) — a stable, unbiased,
    partitioning-independent order — and only the first `cap` survive.
    One window shuffle keyed by source; no sampling-rate estimation pass.
    Skew note: a pathologically hot source makes the row_number partition
    large, but the window only materializes rank (no buffering of the
    frame), and the cap can be pushed pre-shuffle with a per-partition
    partial top-k if a source ever exceeds executor memory."""
    h = F.md5(F.col("doc_id").cast("string"))
    w = Window.partitionBy("source").orderBy(h, "doc_id")
    return (
        docs.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= cap)
        .drop("_rk")
    )


def sample_group_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source kept-doc counts and token mass after capping — the
    balance report a mix curator reads before locking a training mix."""
    docs = load_table(spark, sf_dir, "documents")
    kept = cap_per_group(docs)
    n_tokens = _n_tokens()
    return kept.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(n_tokens).cast("bigint").alias("total_tokens"),
    )


SAMPLE_GROUP_CAP_SQL = f"""
WITH ranked AS (
    SELECT source, text,
           ROW_NUMBER() OVER (
               PARTITION BY source
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
    FROM documents
)
SELECT source, COUNT(*) AS n_docs,
       CAST(SUM(len(string_split_regex(TRIM(text), '\\s+'))) AS BIGINT)
           AS total_tokens
FROM ranked WHERE rk <= {_GROUP_CAP}
GROUP BY source
"""


QUERIES = {
    "sample_training_mix": sample_training_mix,
    "pack_training_sequences": pack_training_sequences,
    "split_train_eval": split_train_eval,
    "sample_temperature_mix": sample_temperature_mix,
    "sample_group_cap": sample_group_cap,
}

ORACLE = {
    "sample_training_mix": SAMPLE_MIX_SQL,
    "pack_training_sequences": PACK_SEQUENCES_SQL,
    "split_train_eval": SPLIT_TRAIN_EVAL_SQL,
    "sample_temperature_mix": SAMPLE_TEMPERATURE_SQL,
    "sample_group_cap": SAMPLE_GROUP_CAP_SQL,
}
