"""Text-analysis operators for training-data pipelines.

Language-ID (marker n-gram heuristic), quality scoring, token counting
(whitespace + regex tokenizer), and document fingerprinting (polynomial
rolling hash). Everything is built from JVM-side builtins — split,
regexp_extract_all, higher-order array lambdas — so the hot path never
enters Python; at 100 TB these are embarrassingly parallel scans with
zero shuffles (per-doc) or one partial-agg shuffle (per-lang rollups).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from openlogreplicator_spark.sources.tables import load_table

_STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "on", "for", "it")
_TOKEN_RE = "[a-z]+|[0-9]+|[^a-z0-9 ]"
_HASH_P = 1_000_000_007
_HASH_B = 31

# marker words per language for the n-gram language-ID heuristic
_LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of"),
    "es": ("la", "el", "que"),
    "fr": ("le", "et", "les"),
    "de": ("der", "und", "die"),
    "zh": ("shi", "de", "le"),
}


def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document quality features: token count, average token length,
    punctuation ratio, stopword ratio, composite score."""
    docs = load_table(spark, sf_dir, "documents")
    words = F.split(F.trim(F.col("text")), r"\s+")
    n_tokens = F.size(words)
    n_chars = F.length("text")
    n_stop = F.size(
        F.filter(words, lambda w: w.isin(*[F.lit(s) for s in _STOPWORDS]))
    )
    n_punct = F.length(F.regexp_replace("text", r"[^.,;:!?]", ""))
    stop_ratio = n_stop / n_tokens
    punct_ratio = n_punct / n_chars
    return docs.select(
        "doc_id",
        "lang",
        n_chars.alias("n_chars"),
        n_tokens.alias("n_tokens"),
        F.round((n_chars - n_tokens + 1) / n_tokens, 6).alias("avg_token_len"),
        F.round(stop_ratio, 6).alias("stop_ratio"),
        F.round(punct_ratio, 6).alias("punct_ratio"),
        F.round(
            F.log(F.lit(1.0) + n_tokens) * (F.lit(1.0) + stop_ratio), 6
        ).alias("quality"),
    )


_STOP_SQL = ", ".join(f"'{s}'" for s in _STOPWORDS)

TEXT_QUALITY_SQL = f"""
SELECT doc_id, lang,
       LENGTH(text) AS n_chars,
       len(string_split_regex(TRIM(text), '\\s+')) AS n_tokens,
       ROUND((LENGTH(text) - len(string_split_regex(TRIM(text), '\\s+')) + 1)
             / len(string_split_regex(TRIM(text), '\\s+')), 6) AS avg_token_len,
       ROUND(len(list_filter(string_split_regex(TRIM(text), '\\s+'),
                             w -> w IN ({_STOP_SQL})))
             / len(string_split_regex(TRIM(text), '\\s+')), 6) AS stop_ratio,
       ROUND(LENGTH(regexp_replace(text, '[^.,;:!?]', '', 'g'))
             / LENGTH(text), 6) AS punct_ratio,
       ROUND(LN(1.0 + len(string_split_regex(TRIM(text), '\\s+')))
             * (1.0 + len(list_filter(string_split_regex(TRIM(text), '\\s+'),
                                      w -> w IN ({_STOP_SQL})))
                / len(string_split_regex(TRIM(text), '\\s+'))), 6) AS quality
FROM documents
"""


def lang_id(docs: DataFrame) -> DataFrame:
    """Marker-word language ID: argmax over per-language marker counts
    (ties → language with most markers wins alphabetically). One explode +
    broadcast join against the tiny marker table + one doc-keyed agg."""
    spark = docs.sparkSession
    markers = spark.createDataFrame(
        [(lang, w) for lang, ws in _LANG_MARKERS.items() for w in ws],
        "cand_lang string, marker string",
    )
    langs = spark.createDataFrame(
        [(lang,) for lang in _LANG_MARKERS], "cand_lang string"
    )
    tokens = docs.select(
        "doc_id", F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("tok")
    )
    counts = (
        tokens.join(F.broadcast(markers), tokens.tok == markers.marker)
        .groupBy("doc_id", "cand_lang")
        .agg(F.count(F.lit(1)).alias("score"))
    )
    scored = (
        docs.select("doc_id")
        .crossJoin(F.broadcast(langs))
        .join(counts, ["doc_id", "cand_lang"], "left")
        .fillna(0, ["score"])
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score").desc(), F.col("cand_lang")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", F.col("cand_lang").alias("pred_lang"), "score")
    )


def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    pred = lang_id(docs)
    return (
        pred.join(docs.select("doc_id", "lang"), "doc_id")
        .groupBy("pred_lang", "lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


_MARKER_VALUES = ", ".join(
    f"('{lang}', '{w}')" for lang, ws in _LANG_MARKERS.items() for w in ws
)
_LANG_VALUES = ", ".join(f"('{lang}')" for lang in _LANG_MARKERS)

TEXT_LANG_ID_SQL = f"""
WITH markers(cand_lang, marker) AS (VALUES {_MARKER_VALUES}),
langs(cand_lang) AS (VALUES {_LANG_VALUES}),
tokens AS (
    SELECT doc_id, UNNEST(string_split_regex(TRIM(text), '\\s+')) AS tok
    FROM documents
),
counts AS (
    SELECT doc_id, cand_lang, COUNT(*) AS score
    FROM tokens JOIN markers ON tok = marker
    GROUP BY doc_id, cand_lang
),
scored AS (
    SELECT d.doc_id, l.cand_lang, COALESCE(c.score, 0) AS score
    FROM (SELECT doc_id FROM documents) d
    CROSS JOIN langs l
    LEFT JOIN counts c ON c.doc_id = d.doc_id AND c.cand_lang = l.cand_lang
),
pred AS (
    SELECT doc_id, cand_lang AS pred_lang, score,
           ROW_NUMBER() OVER (PARTITION BY doc_id
                              ORDER BY score DESC, cand_lang) AS rn
    FROM scored
)
SELECT p.pred_lang, d.lang, COUNT(*) AS n_docs
FROM pred p JOIN documents d ON d.doc_id = p.doc_id
WHERE p.rn = 1
GROUP BY p.pred_lang, d.lang
"""


def text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex (BPE-ish) tokenizer counts per doc, rolled up by language —
    the pretraining "how many tokens is this corpus" question."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.regexp_extract_all(F.col("text"), F.lit(_TOKEN_RE), 0)
    ws_toks = F.split(F.trim(F.col("text")), r"\s+")
    per_doc = docs.select(
        "lang",
        F.size(toks).alias("n_re_tokens"),
        F.size(ws_toks).alias("n_ws_tokens"),
        F.length("text").alias("n_chars"),
    )
    return per_doc.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_re_tokens").alias("total_re_tokens"),
        F.sum("n_ws_tokens").alias("total_ws_tokens"),
        F.round(F.avg("n_re_tokens"), 6).alias("avg_re_tokens"),
        F.round(F.sum("n_re_tokens") / F.sum("n_chars"), 6).alias(
            "tokens_per_char"
        ),
    )


TEXT_TOKEN_COUNT_SQL = f"""
SELECT lang,
       COUNT(*) AS n_docs,
       CAST(SUM(len(regexp_extract_all(text, '{_TOKEN_RE}'))) AS BIGINT)
           AS total_re_tokens,
       CAST(SUM(len(string_split_regex(TRIM(text), '\\s+'))) AS BIGINT)
           AS total_ws_tokens,
       ROUND(AVG(len(regexp_extract_all(text, '{_TOKEN_RE}'))), 6)
           AS avg_re_tokens,
       ROUND(SUM(len(regexp_extract_all(text, '{_TOKEN_RE}')))
             / SUM(LENGTH(text)), 6) AS tokens_per_char
FROM documents
GROUP BY lang
"""


def fingerprint(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Polynomial rolling hash over the character stream (Karp-Rabin):
    acc = (acc*B + code(c)) mod P. Sequential fold inside a JVM array
    lambda — per-doc, no shuffle, no Python."""
    codes = F.transform(F.split(F.col(text_col), ""), lambda c: F.ascii(c))
    fp = F.aggregate(
        codes,
        F.lit(0).cast("bigint"),
        lambda acc, x: (acc * _HASH_B + x) % _HASH_P,
    )
    return docs.select("doc_id", fp.alias("fingerprint"))


def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return fingerprint(docs)


TEXT_FINGERPRINT_SQL = f"""
SELECT doc_id,
       list_reduce(
           list_prepend(CAST(0 AS BIGINT),
               list_transform(string_split(text, ''), c -> CAST(ascii(c) AS BIGINT))),
           (acc, x) -> (acc * {_HASH_B} + x) % {_HASH_P}
       ) AS fingerprint
FROM documents
"""


QUERIES = {
    "text_quality_score": text_quality_score,
    "text_lang_id": text_lang_id,
    "text_token_count": text_token_count,
    "text_fingerprint": text_fingerprint,
}

ORACLE = {
    "text_quality_score": TEXT_QUALITY_SQL,
    "text_lang_id": TEXT_LANG_ID_SQL,
    "text_token_count": TEXT_TOKEN_COUNT_SQL,
    "text_fingerprint": TEXT_FINGERPRINT_SQL,
}
