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
    # staged split (see repetition_signals): n_tokens is referenced by
    # four downstream expressions, and an inlined split re-evaluates per
    # reference once a higher-order lambda blocks subexpression CSE
    words = F.split(F.trim(F.col("text")), r"\s+")
    staged = docs.select("doc_id", "lang", "text", words.alias("_w"))
    w = F.col("_w")
    n_tokens = F.size(w)
    n_chars = F.length("text")
    n_stop = F.size(
        F.filter(w, lambda x: x.isin(*[F.lit(s) for s in _STOPWORDS]))
    )
    n_punct = F.length(F.regexp_replace("text", r"[^.,;:!?]", ""))
    sig = staged.select(
        "doc_id",
        "lang",
        n_chars.alias("n_chars"),
        n_tokens.alias("_nt"),
        (n_stop / n_tokens).alias("_stop"),
        (n_punct / n_chars).alias("_punct"),
    )
    return sig.select(
        "doc_id",
        "lang",
        "n_chars",
        F.col("_nt").alias("n_tokens"),
        F.round(
            (F.col("n_chars") - F.col("_nt") + 1) / F.col("_nt"), 6
        ).alias("avg_token_len"),
        F.round(F.col("_stop"), 6).alias("stop_ratio"),
        F.round(F.col("_punct"), 6).alias("punct_ratio"),
        F.round(
            F.log(F.lit(1.0) + F.col("_nt")) * (F.lit(1.0) + F.col("_stop")),
            6,
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


def lang_id(docs: DataFrame, carry: tuple[str, ...] = ()) -> DataFrame:
    """Marker-word language ID: argmax over per-language marker counts
    (ties → alphabetically-first language, the window's old
    score-desc/lang-asc order).

    r12 shape: fully MAP-SIDE. The marker table is a compile-time
    constant (5 langs × 3 words), so each language's score is a
    `size(filter(tokens, isin(markers)))` over the split array and the
    argmax is a when-fold across the five staged score columns — no
    explode, no marker join, no per-doc aggregate, no window. The old
    plan paid a token explode + (doc, lang) exchange + a doc-keyed
    window sort for what one projection computes; at any scale this is
    now zero data shuffles. Scores stay exact token counts (same
    whitespace split, same exact-match semantics — a word marking two
    languages counts for both, as the join did). ``carry`` names extra
    input columns to keep on the output row, letting callers drop
    their join-back."""
    langs = sorted(_LANG_MARKERS)
    words = F.split(F.trim(F.col("text")), r"\s+")
    # staged: each score column is referenced twice by the fold below,
    # and higher-order lambdas block subexpression elimination (the
    # filter_gate staging rule). The marker set closes over a factory —
    # a defaulted lambda parameter would make PySpark treat it as the
    # (element, index) two-arg form.
    def _is_marker(ws):
        return lambda t: t.isin(*ws)

    # coalesce pins the old join+fillna path's NULL-text behavior
    # (score 0, pred_lang = alphabetically-first language): the
    # split/filter/size chain alone would yield NULL scores for a NULL
    # text (r12 ADVICE).
    staged = docs.select(
        "doc_id",
        *carry,
        *[
            F.coalesce(
                F.size(F.filter(words, _is_marker(_LANG_MARKERS[lang]))),
                F.lit(0),
            ).alias(f"_s_{lang}")
            for lang in langs
        ],
    )
    # fold in ascending language order with a STRICT > : ties keep the
    # alphabetically-first language — exactly the old window's
    # (score DESC, cand_lang ASC) row_number()=1 pick
    best = F.struct(
        F.col(f"_s_{langs[0]}").alias("score"),
        F.lit(langs[0]).alias("lang"),
    )
    for lang in langs[1:]:
        s = F.col(f"_s_{lang}")
        best = F.when(
            s > best["score"],
            F.struct(s.alias("score"), F.lit(lang).alias("lang")),
        ).otherwise(best)
    return staged.select(
        "doc_id",
        *carry,
        best["lang"].alias("pred_lang"),
        best["score"].cast("bigint").alias("score"),
    )


def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    # lang rides the map-side projection (carry) — no join-back; the
    # only exchange left is the tiny (pred_lang, lang) partial agg
    pred = lang_id(docs, carry=("lang",))
    return (
        pred.groupBy("pred_lang", "lang")
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


# PII patterns — deliberately RE2-safe (no backrefs/lookaround) so the
# same pattern string runs in Spark (Java regex) and DuckDB (RE2).
_PHONE_RE = "[0-9]{2}-[0-9]{3}-[0-9]{3}-[0-9]{4}"
_EMAIL_RE = "[a-z0-9._]+@[a-z0-9.-]+"


def pii_scrub(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Training-data PII pass: count and redact phone numbers and email
    addresses in one scan — pure ``regexp_replace``/``regexp_count``
    builtins, zero shuffle, linear at any corpus size."""
    return df.withColumn(
        "n_phones", F.regexp_count(F.col(text_col), F.lit(_PHONE_RE))
    ).withColumn(
        "n_emails", F.regexp_count(F.col(text_col), F.lit(_EMAIL_RE))
    ).withColumn(
        "scrubbed",
        F.regexp_replace(
            F.regexp_replace(F.col(text_col), _PHONE_RE, "<PHONE>"),
            _EMAIL_RE,
            "<EMAIL>",
        ),
    )


def text_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub over a customer-contact corpus (synthesized from the
    customer table so phones/emails genuinely occur): per-row redaction
    counts + an md5 of the scrubbed text proving byte-identical output."""
    cust = load_table(spark, sf_dir, "customer")
    k = F.col("c_custkey")
    phone = F.concat_ws(
        "-",
        (k % 90 + 10).cast("string"),
        F.lpad((k * 7 % 1000).cast("string"), 3, "0"),
        F.lpad((k * 13 % 1000).cast("string"), 3, "0"),
        F.lpad((k * 31 % 10000).cast("string"), 4, "0"),
    )
    corpus = cust.select(
        "c_custkey",
        F.concat(
            F.col("c_name"), F.lit(" ("), F.col("c_mktsegment"),
            F.lit(") call "), phone,
            F.lit(" or mail u"), k, F.lit("@example.com"),
        ).alias("text"),
    )
    out = pii_scrub(corpus)
    return out.select(
        "c_custkey",
        "n_phones",
        "n_emails",
        F.md5("scrubbed").alias("scrubbed_md5"),
    )


TEXT_PII_SCRUB_SQL = f"""
WITH corpus AS (
    SELECT c_custkey,
           c_name || ' (' || c_mktsegment || ') call '
               || (c_custkey % 90 + 10)
               || '-' || lpad(CAST(c_custkey * 7 % 1000 AS VARCHAR), 3, '0')
               || '-' || lpad(CAST(c_custkey * 13 % 1000 AS VARCHAR), 3, '0')
               || '-' || lpad(CAST(c_custkey * 31 % 10000 AS VARCHAR), 4, '0')
               || ' or mail u' || c_custkey || '@example.com' AS text
    FROM customer
)
SELECT c_custkey,
       CAST(len(regexp_extract_all(text, '{_PHONE_RE}')) AS INT) AS n_phones,
       CAST(len(regexp_extract_all(text, '{_EMAIL_RE}')) AS INT) AS n_emails,
       md5(regexp_replace(regexp_replace(text, '{_PHONE_RE}', '<PHONE>', 'g'),
                          '{_EMAIL_RE}', '<EMAIL>', 'g')) AS scrubbed_md5
FROM corpus
"""


def repetition_signals(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Gopher-style repetition quality signals, all computed inside JVM
    array lambdas (no explode, no shuffle): duplicate-word fraction,
    most-common-word share (fold over the sorted token array), and
    duplicate-bigram fraction. The filter decision is a pure projection —
    at 100 TB this is a map-only scan.

    The split and the sort are STAGED through named projection columns:
    referencing the raw `split(...)` expression from every signal made
    Catalyst re-evaluate it per reference (higher-order lambdas run
    interpreted and block subexpression elimination) — measured 6.6 s →
    ~1 s at sf0.1 for the same results. CollapseProject keeps the
    staging because a non-cheap alias referenced more than once is
    never inlined."""
    words = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    staged = docs.select("doc_id", words.alias("_w"))
    w = F.col("_w")
    n = F.size(w)
    prepared = staged.select(
        "doc_id",
        n.alias("_n"),
        F.size(F.array_distinct(w)).alias("_nd"),
        F.array_sort(w).alias("_ws"),
        # adjacent-pair bigrams via two slices zipped — one pass, no
        # per-index element_at
        F.zip_with(
            F.slice(w, 1, F.greatest(n - 1, F.lit(0))),
            F.slice(w, 2, F.greatest(n - 1, F.lit(0))),
            lambda a, b: F.concat_ws(" ", a, b),
        ).alias("_bi"),
    )
    # longest run in the sorted array == max term frequency
    top_count = F.aggregate(
        F.col("_ws"),
        F.struct(
            F.lit("").alias("prev"),
            F.lit(0).alias("run"),
            F.lit(0).alias("best"),
        ),
        lambda acc, x: F.struct(
            x.alias("prev"),
            F.when(x == acc.prev, acc.run + 1).otherwise(1).alias("run"),
            F.greatest(
                acc.best,
                F.when(x == acc.prev, acc.run + 1).otherwise(1),
            ).alias("best"),
        ),
        lambda acc: acc.best,
    )
    nn = F.col("_n")
    n_bi = F.size(F.col("_bi"))
    n_bi_distinct = F.size(F.array_distinct(F.col("_bi")))
    return prepared.select(
        "doc_id",
        nn.alias("n_words"),
        F.round(F.lit(1.0) - F.col("_nd") / nn, 6).alias("dup_word_ratio"),
        F.round(top_count / nn, 6).alias("top_word_share"),
        F.round(F.lit(1.0) - n_bi_distinct / n_bi, 6).alias(
            "dup_2gram_ratio"
        ),
    )


def text_repetition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition signals + the Gopher-style keep/drop verdict (a doc
    dominated by one word or repeated bigrams is boilerplate)."""
    docs = load_table(spark, sf_dir, "documents")
    sig = repetition_signals(docs)
    return sig.withColumn(
        "keep",
        (F.col("top_word_share") < 0.2) & (F.col("dup_2gram_ratio") < 0.5),
    )


TEXT_REPETITION_SQL = """
WITH words AS (
    SELECT doc_id, string_split_regex(LOWER(TRIM(text)), '\\s+') AS w
    FROM documents
), tok AS (
    SELECT doc_id, UNNEST(w) AS word FROM words
), tf AS (
    SELECT doc_id, word, COUNT(*) AS c FROM tok GROUP BY doc_id, word
), perdoc AS (
    SELECT doc_id, SUM(c) AS n_words, COUNT(*) AS n_distinct,
           MAX(c) AS top_count
    FROM tf GROUP BY doc_id
), bi AS (
    SELECT doc_id,
           len(w) - 1 AS n_bi,
           len(list_distinct(list_transform(
               generate_series(1, len(w) - 1),
               i -> w[i] || ' ' || w[i + 1]))) AS n_bi_distinct
    FROM words
)
SELECT p.doc_id,
       CAST(p.n_words AS INT) AS n_words,
       ROUND(1.0 - p.n_distinct / CAST(p.n_words AS DOUBLE), 6)
           AS dup_word_ratio,
       ROUND(p.top_count / CAST(p.n_words AS DOUBLE), 6) AS top_word_share,
       ROUND(1.0 - b.n_bi_distinct / CAST(b.n_bi AS DOUBLE), 6)
           AS dup_2gram_ratio,
       (p.top_count / CAST(p.n_words AS DOUBLE) < 0.2
        AND 1.0 - b.n_bi_distinct / CAST(b.n_bi AS DOUBLE) < 0.5) AS keep
FROM perdoc p JOIN bi b ON b.doc_id = p.doc_id
"""


_MIN_WORDS = 25
_MAX_DUP_WORD = 0.62
_MAX_TOP_SHARE = 0.15
_MIN_STOP = 0.02


def filter_gate(docs: DataFrame) -> DataFrame:
    """Append the composite-gate signal columns (n_words, ratios, keep,
    drop_reasons) to ``docs`` in one map-only scan — shared by the
    standalone `text_filter_pipeline` query and the composed
    `pipeline_pretraining_corpus` flagship.

    Signals are STAGED through named projection columns: the previous
    single-projection form re-evaluated the split/sort/fold once per
    textual reference (reasons and keep each recompute every ratio;
    higher-order lambdas run interpreted and block subexpression
    elimination). CollapseProject never inlines a non-cheap alias
    referenced more than once, so the staging survives optimization and
    the scan stays a single map-only pass."""
    words = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    staged = docs.select("*", words.alias("_w"))
    w = F.col("_w")
    n = F.size(w)
    top_count = F.aggregate(
        F.array_sort(w),
        F.struct(
            F.lit("").alias("prev"),
            F.lit(0).alias("run"),
            F.lit(0).alias("best"),
        ),
        lambda acc, x: F.struct(
            x.alias("prev"),
            F.when(x == acc.prev, acc.run + 1).otherwise(1).alias("run"),
            F.greatest(
                acc.best,
                F.when(x == acc.prev, acc.run + 1).otherwise(1),
            ).alias("best"),
        ),
        lambda acc: acc.best,
    )
    sig = staged.select(
        "*",
        n.alias("_n"),
        (F.lit(1.0) - F.size(F.array_distinct(w)) / n).alias("_dup"),
        (top_count / n).alias("_top"),
        (
            F.size(
                F.filter(w, lambda x: x.isin(*[F.lit(s) for s in _STOPWORDS]))
            )
            / n
        ).alias("_stop"),
    ).drop("_w")
    # concat_ws skips null elements, so un-triggered reasons vanish
    reasons = F.concat_ws(
        ",",
        F.when(F.col("_n") < _MIN_WORDS, F.lit("too_short")),
        F.when(F.col("_dup") > _MAX_DUP_WORD, F.lit("repetitive")),
        F.when(F.col("_top") > _MAX_TOP_SHARE, F.lit("dominated")),
        F.when(F.col("_stop") < _MIN_STOP, F.lit("low_stopword")),
    )
    out_cols = [c for c in docs.columns]
    return sig.select(
        *out_cols,
        F.col("_n").alias("n_words"),
        F.round(F.col("_dup"), 6).alias("dup_word_ratio"),
        F.round(F.col("_top"), 6).alias("top_word_share"),
        F.round(F.col("_stop"), 6).alias("stop_ratio"),
        (reasons == "").alias("keep"),
        reasons.alias("drop_reasons"),
    )


def text_filter_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite corpus filter: every quality signal evaluated in ONE
    map-only projection (length, duplicate-word ratio, top-word share,
    stopword ratio), composed into a keep/drop verdict with a
    machine-readable drop-reason list. This is the nightly "documents
    in, training corpus out" gate; at 100 TB it is a single scan with
    zero shuffles — signals are never computed in separate passes and
    joined back."""
    docs = load_table(spark, sf_dir, "documents")
    return filter_gate(docs).select(
        "doc_id",
        "n_words",
        "dup_word_ratio",
        "top_word_share",
        "stop_ratio",
        "keep",
        "drop_reasons",
    )


TEXT_FILTER_PIPELINE_SQL = f"""
WITH sig AS (
    SELECT doc_id,
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
), flagged AS (
    SELECT doc_id, n_words, dup_ratio, top_share, stop_ratio,
           COALESCE(array_to_string(list_filter([
               CASE WHEN n_words < {_MIN_WORDS} THEN 'too_short' END,
               CASE WHEN dup_ratio > {_MAX_DUP_WORD} THEN 'repetitive' END,
               CASE WHEN top_share > {_MAX_TOP_SHARE} THEN 'dominated' END,
               CASE WHEN stop_ratio < {_MIN_STOP} THEN 'low_stopword' END
           ], x -> x IS NOT NULL), ','), '') AS drop_reasons
    FROM sig
)
SELECT doc_id, CAST(n_words AS INT) AS n_words,
       ROUND(dup_ratio, 6) AS dup_word_ratio,
       ROUND(top_share, 6) AS top_word_share,
       ROUND(stop_ratio, 6) AS stop_ratio,
       drop_reasons = '' AS keep,
       drop_reasons
FROM flagged
"""


def text_vocab_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary: the 100 most frequent tokens with term count
    and document frequency. The (count DESC, token ASC) tiebreak makes
    the top-k set a total order, so both engines cut the same boundary.

    100-TB shape: one partial-aggregated shuffle on the token (the df
    count piggybacks on the same grouping via a pre-distinct), then
    TakeOrderedAndProject for the k cut — no global sort materializes.
    """
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    toks = docs.select(
        "doc_id",
        F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("token"),
    )
    return (
        toks.groupBy("token")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("doc_id").alias("df"),
        )
        .orderBy(F.desc("n"), "token")
        .limit(100)
    )


TEXT_VOCAB_SQL = """
WITH toks AS (
    SELECT doc_id, UNNEST(string_split_regex(trim(text), '\\s+')) AS token
    FROM documents
)
SELECT token, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
FROM toks
GROUP BY token
ORDER BY n DESC, token
LIMIT 100
"""


# RAG/training chunking: fixed character windows with overlap. At 100 TB
# this is map-only (explode over a per-row sequence, no shuffle) — chunk
# boundaries never cross documents, so it parallelizes embarrassingly.
_CHUNK_SIZE = 120
_CHUNK_STRIDE = 90


def text_chunk_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping character-window chunking (the retrieval/training
    pre-tokenization split): one row per (doc, window) with the stride
    index — downstream embedding/packing consumes these directly."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    # empty text yields NO chunk rows (the oracle's generate_series(0,
    # -1) is empty); the previous greatest(...,0) clamp emitted a
    # phantom empty chunk for len=0 documents (r12 review-pass-7)
    docs = docs.filter(F.length("text") > 0)
    starts = F.sequence(
        F.lit(0), F.length("text") - 1, F.lit(_CHUNK_STRIDE)
    )
    return docs.select(
        "doc_id",
        F.posexplode(starts).alias("pos", "start"),
        F.col("text"),
    ).select(
        "doc_id",
        F.col("pos").cast("bigint").alias("chunk_idx"),
        F.col("text").substr(F.col("start") + 1, F.lit(_CHUNK_SIZE)).alias(
            "chunk"
        ),
    ).withColumn("chunk_len", F.length("chunk").cast("bigint"))


TEXT_CHUNK_SQL = f"""
WITH s AS (
    SELECT doc_id, text, UNNEST(generate_series(0, len(text) - 1,
           {_CHUNK_STRIDE})) AS start
    FROM documents
)
SELECT doc_id,
       CAST(start / {_CHUNK_STRIDE} AS BIGINT) AS chunk_idx,
       substring(text, CAST(start AS INT) + 1, {_CHUNK_SIZE}) AS chunk,
       CAST(len(substring(text, CAST(start AS INT) + 1, {_CHUNK_SIZE}))
            AS BIGINT) AS chunk_len
FROM s
"""


# Boilerplate passage scan: fixed non-overlapping word windows shared by
# ≥2 documents (the C4/RefinedWeb repeated-span removal shape). Both
# sides reduce to DISTINCT (doc, passage) before one passage-keyed
# shuffle; the join input is bounded by the distinct-passage space.
_PASSAGE_WORDS = 4


def text_dedup_passages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, n_boiler): how many of the document's passages also
    appear verbatim in at least one other document. The decontaminated
    corpus is the anti-join of documents against this frame."""
    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        # spread the passage explode across every core even when the
        # source is a single parquet split (test corpus); at production
        # scale the scan has many splits and this shuffle is noise
        # hash by doc_id (not round-robin): every downstream doc-keyed
        # distinct/aggregate/window is then satisfied by this one
        # exchange (HashPartitioning(doc_id) ⊆ any doc_id-led clustering)
        # and drops its own data-scale Exchange — r12 guide §2.4
        .repartition(spark.sparkContext.defaultParallelism, "doc_id")
    )
    words = F.split("text", " ")
    n = _PASSAGE_WORDS
    idx = F.when(
        F.size(words) >= n,
        F.sequence(F.lit(0), (F.size(words) / n).cast("int") - 1),
    ).otherwise(F.array().cast("array<int>"))
    # passages hash to 64 bits before the distinct / df-count / join
    # exchanges — 8-byte keys instead of ~50-byte strings (collision
    # odds ~1e-8 at 1e9 distinct passages; see decontaminate_ngram)
    passages = (
        docs.select(
            "doc_id",
            F.explode(
                F.transform(
                    idx,
                    lambda p: F.array_join(F.slice(words, p * n + 1, n), " "),
                )
            ).alias("_p"),
        )
        .select("doc_id", F.xxhash64("_p").alias("passage"))
        .distinct()
    )
    # rows are unique per (doc_id, passage), so a passage-window count
    # IS the document frequency — no second aggregate consumer, no
    # join-back, and the explode runs exactly once (a plan fork would
    # re-run it per branch)
    from pyspark.sql import Window

    flagged = (
        passages.repartition("passage")
        .withColumn(
            "_nd",
            F.count(F.lit(1)).over(Window.partitionBy("passage")),
        )
        .filter(F.col("_nd") >= 2)
    )
    return flagged.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_boiler")
    )


TEXT_DEDUP_PASSAGES_SQL = f"""
WITH w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
p AS (
    SELECT doc_id,
           array_to_string(list_slice(words, i * {_PASSAGE_WORDS} + 1,
               i * {_PASSAGE_WORDS} + {_PASSAGE_WORDS}), ' ') AS passage
    FROM w, UNNEST(generate_series(0,
        CAST(floor(len(words) / {_PASSAGE_WORDS}) AS INT) - 1)) AS t(i)
), d AS (SELECT DISTINCT doc_id, passage FROM p),
s AS (SELECT passage FROM d GROUP BY passage HAVING COUNT(*) >= 2)
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_boiler
FROM d JOIN s USING (passage)
GROUP BY doc_id
"""


def text_commonness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-statistics quality signal (the integer-exact stand-in for a
    perplexity filter): per document, the summed corpus term frequency of
    its tokens and the mean. Two stages — a global token-count agg
    (partial-aggregated, vocabulary-sized result) broadcast back onto the
    exploded tokens, then one doc-keyed agg. All arithmetic stays integer
    until the single final division, so the result is bit-stable under
    any partitioning (no float sum-order sensitivity)."""
    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        # hash by doc_id (not round-robin): every downstream doc-keyed
        # distinct/aggregate/window is then satisfied by this one
        # exchange (HashPartitioning(doc_id) ⊆ any doc_id-led clustering)
        # and drops its own data-scale Exchange — r12 guide §2.4
        .repartition(spark.sparkContext.defaultParallelism, "doc_id")
    )
    toks = docs.select(
        "doc_id", F.explode(F.split(F.trim("text"), r"\s+")).alias("token")
    )
    tf = toks.groupBy("token").agg(F.count(F.lit(1)).alias("tf"))
    return (
        toks.join(F.broadcast(tf), "token")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("tf").alias("tf_sum"),
        )
        .select(
            "doc_id",
            "n_tokens",
            F.col("tf_sum").cast("bigint").alias("tf_sum"),
            F.round(F.col("tf_sum") / F.col("n_tokens"), 6).alias("mean_tf"),
        )
    )


TEXT_COMMONNESS_SQL = """
WITH toks AS (
    SELECT doc_id, UNNEST(string_split_regex(trim(text), '\\s+')) AS token
    FROM documents
), tf AS (
    SELECT token, COUNT(*) AS tf FROM toks GROUP BY token
)
SELECT doc_id,
       COUNT(*) AS n_tokens,
       CAST(SUM(tf) AS BIGINT) AS tf_sum,
       ROUND(CAST(SUM(tf) AS DOUBLE) / COUNT(*), 6) AS mean_tf
FROM toks JOIN tf USING (token)
GROUP BY doc_id
"""


def text_tfidf_topterms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document top-3 characteristic terms by a tf-idf-shaped score —
    the keyword-extraction stage of a retrieval/indexing pipeline. The
    score is tf(doc,term) * (N // df(term)) in pure integer arithmetic:
    same ordering intent as tf*log(N/df), but bit-stable across engines
    and partitionings (a float log differs in the last ulp between libm
    implementations, which can flip near-ties and change the top-k set).

    100-TB shape: one (doc,token) partial-agg shuffle; df is a
    vocabulary-sized aggregate broadcast back; the corpus size N joins
    as a broadcast 1-row aggregate (no driver collect); the final top-3
    is a per-doc window over at most vocabulary-per-doc rows."""
    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        # hash by doc_id (not round-robin): every downstream doc-keyed
        # distinct/aggregate/window is then satisfied by this one
        # exchange (HashPartitioning(doc_id) ⊆ any doc_id-led clustering)
        # and drops its own data-scale Exchange — r12 guide §2.4
        .repartition(spark.sparkContext.defaultParallelism, "doc_id")
    )
    toks = docs.select(
        "doc_id", F.explode(F.split(F.trim("text"), r"\s+")).alias("token")
    )
    # persisted: referenced by both the df aggregate (broadcast build
    # job) and the scoring probe — without it the corpus explode runs
    # twice, once per job
    tf = (
        toks.groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("tf"))
        .persist()
    )
    df_tab = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(F.broadcast(df_tab), "token")
        .join(F.broadcast(n_docs))
        .withColumn(
            "score",
            (F.col("tf") * F.expr("n_docs div df")).cast("bigint"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score").desc(), F.col("token")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("doc_id", "rank", "token", "score")
    )


TEXT_TFIDF_SQL = """
WITH toks AS (
    SELECT doc_id, UNNEST(string_split_regex(trim(text), '\\s+')) AS token
    FROM documents
), tf AS (
    SELECT doc_id, token, COUNT(*) AS tf FROM toks GROUP BY doc_id, token
), dfr AS (
    SELECT token, COUNT(*) AS df FROM tf GROUP BY token
), n AS (SELECT COUNT(*) AS n_docs FROM documents),
scored AS (
    SELECT doc_id, token, CAST(tf * (n_docs // df) AS BIGINT) AS score
    FROM tf JOIN dfr USING (token), n
)
SELECT doc_id, rank, token, score FROM (
    SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY doc_id
                   ORDER BY score DESC, token) AS INTEGER) AS rank
    FROM scored
) WHERE rank <= 3
"""


def text_entropy_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-level Shannon entropy per document — the gibberish /
    binary-junk detector (natural prose sits near 4.2 bits/char; flat
    noise near log2(alphabet), repeated filler far below). Computed as
    log2(n) - sum(c*log2(c))/n over the per-character counts, the same
    expression order in the oracle so the doubles agree bit-for-bit
    before the final 6-dp round.

    100-TB shape: char explode is map-only; two partial-agg shuffles
    ((doc, char) then doc) whose reduce width is alphabet-bounded."""
    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        # hash by doc_id (not round-robin): every downstream doc-keyed
        # distinct/aggregate/window is then satisfied by this one
        # exchange (HashPartitioning(doc_id) ⊆ any doc_id-led clustering)
        # and drops its own data-scale Exchange — r12 guide §2.4
        .repartition(spark.sparkContext.defaultParallelism, "doc_id")
    )
    chars = docs.select(
        "doc_id", F.explode(F.split("text", "")).alias("ch")
    ).filter(F.length("ch") > 0)
    counts = chars.groupBy("doc_id", "ch").agg(
        F.count(F.lit(1)).alias("c")
    )
    per_doc = counts.groupBy("doc_id").agg(
        F.sum("c").alias("n"),
        F.count(F.lit(1)).alias("n_distinct_chars"),
        F.sum(F.col("c") * F.log2("c")).alias("clc"),
    )
    ent = F.round(
        F.log2("n") - F.col("clc") / F.col("n"), 6
    ).alias("entropy_r")
    return per_doc.select(
        "doc_id",
        F.col("n").cast("bigint").alias("n_chars"),
        F.col("n_distinct_chars").cast("bigint").alias("n_distinct_chars"),
        ent,
    ).withColumn(
        "keep", (F.col("entropy_r") > 2.5) & (F.col("entropy_r") < 5.2)
    )


TEXT_ENTROPY_SQL = """
WITH chars AS (
    SELECT doc_id, UNNEST(string_split(text, '')) AS ch FROM documents
), counts AS (
    SELECT doc_id, ch, COUNT(*) AS c FROM chars
    WHERE len(ch) > 0 GROUP BY doc_id, ch
), per_doc AS (
    SELECT doc_id, SUM(c) AS n, COUNT(*) AS n_distinct_chars,
           SUM(c * log2(c)) AS clc
    FROM counts GROUP BY doc_id
)
SELECT doc_id, CAST(n AS BIGINT) AS n_chars,
       CAST(n_distinct_chars AS BIGINT) AS n_distinct_chars,
       ROUND(log2(n) - clc / n, 6) AS entropy_r,
       ROUND(log2(n) - clc / n, 6) > 2.5
           AND ROUND(log2(n) - clc / n, 6) < 5.2 AS keep
FROM per_doc
"""


def text_bigram_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-bigram language-model perplexity — the CCNet-style LM
    quality filter (Wenzek et al., LREC'20) with the model trained on the
    corpus itself instead of an external KenLM (none ships here, and the
    corpus-trained form needs no side artifact). Per document:
    avg_logp = sum_bigrams ln P(c2|c1) / n_bigrams, ppl = exp(-avg_logp);
    P(c2|c1) = count(c1c2)/count(c1·) over the whole corpus. Low
    perplexity = typical prose; high = gibberish/junk.

    100-TB shape: the bigram explode is map-only; the model is
    alphabet²-bounded (tiny) so both model joins BROADCAST; the only
    data-scale shuffles are the two partial-agg exchanges ((doc,bg) then
    doc). Float safety: the per-doc sum is ~500 terms of magnitude ~5 —
    accumulated double error ~1e-11 against a 5e-7 rounding boundary at
    6 dp, the same argument as text_entropy_filter (green since r3)."""
    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .filter(F.length("text") >= 2)
        # hash by doc_id (not round-robin): every downstream doc-keyed
        # distinct/aggregate/window is then satisfied by this one
        # exchange (HashPartitioning(doc_id) ⊆ any doc_id-led clustering)
        # and drops its own data-scale Exchange — r12 guide §2.4
        .repartition(spark.sparkContext.defaultParallelism, "doc_id")
    )
    bigrams = docs.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(1, length(text) - 1),"
                " i -> substring(text, i, 2))"
            )
        ).alias("bg"),
    )
    # ONE explode + ONE (doc,bg) partial-agg shuffle; the model and
    # context tables derive from the compact per-doc counts (sum of k ==
    # count over raw bigrams, exactly), so the corpus is never exploded
    # a second or third time. Measured 1.8× on the sf0.1 bench,
    # bit-identical output.
    per = (
        bigrams.groupBy("doc_id", "bg")
        .agg(F.count(F.lit(1)).alias("k"))
        .persist()
    )
    model = per.groupBy("bg").agg(F.sum("k").alias("cnt"))
    ctx = per.groupBy(
        F.substring("bg", 1, 1).alias("c1")
    ).agg(F.sum("k").alias("tot"))
    logp = F.log(F.col("cnt").cast("double") / F.col("tot").cast("double"))
    terms = (
        per.join(F.broadcast(model), "bg")
        .join(F.broadcast(ctx), F.substring("bg", 1, 1) == F.col("c1"))
        .select("doc_id", "k", (F.col("k") * logp).alias("term"))
    )
    agg = terms.groupBy("doc_id").agg(
        F.sum("k").alias("n"), F.sum("term").alias("sumlog")
    )
    avg_logp = F.col("sumlog") / F.col("n")
    return agg.select(
        "doc_id",
        F.col("n").cast("bigint").alias("n_bigrams"),
        F.round(avg_logp, 6).alias("avg_logp"),
        F.round(F.exp(-avg_logp), 6).alias("ppl"),
    )


TEXT_BIGRAM_PPL_SQL = """
WITH big AS (
    SELECT doc_id, substring(text, i, 2) AS bg
    FROM documents, UNNEST(generate_series(1, length(text) - 1)) AS t(i)
    WHERE length(text) >= 2
), model AS (
    SELECT bg, COUNT(*) AS cnt FROM big GROUP BY bg
), ctx AS (
    SELECT substring(bg, 1, 1) AS c1, COUNT(*) AS tot FROM big GROUP BY c1
), per AS (
    SELECT doc_id, bg, COUNT(*) AS k FROM big GROUP BY doc_id, bg
), terms AS (
    SELECT p.doc_id, p.k,
           p.k * ln(CAST(m.cnt AS DOUBLE) / CAST(c.tot AS DOUBLE)) AS term
    FROM per p
    JOIN model m USING (bg)
    JOIN ctx c ON substring(p.bg, 1, 1) = c.c1
), agg AS (
    SELECT doc_id, SUM(k) AS n, SUM(term) AS sumlog
    FROM terms GROUP BY doc_id
)
SELECT doc_id, CAST(n AS BIGINT) AS n_bigrams,
       ROUND(sumlog / n, 6) AS avg_logp,
       ROUND(exp(-(sumlog / n)), 6) AS ppl
FROM agg
"""


def sample_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance weights (Xie et al., NeurIPS'23 "Data Selection
    for Language Models via Importance Resampling"): score each raw
    document by how much its unigram distribution resembles a target
    domain — here the `lang='en'` slice stands in for the target corpus —
    versus the raw pool. log w(d) = sum_tokens [ln p_tgt(tok) -
    ln p_raw(tok)], add-1 smoothed over the raw vocabulary; positive =
    more target-like than pool-average, the resampling key.

    DSIR hashes features into 2^16 buckets to bound the model; the
    feature table here is the raw vocabulary itself (already
    vocab-bounded and broadcastable at this corpus; at 100 TB swap the
    token key for `xxhash64(token) % 2^20` Spark-side — the plan shape
    is unchanged). One token explode, one vocab-sized broadcast join,
    one doc-keyed partial agg; no data-scale shuffle beyond those."""
    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "lang", "text")
        # hash by doc_id (not round-robin): every downstream doc-keyed
        # distinct/aggregate/window is then satisfied by this one
        # exchange (HashPartitioning(doc_id) ⊆ any doc_id-led clustering)
        # and drops its own data-scale Exchange — r12 guide §2.4
        .repartition(spark.sparkContext.defaultParallelism, "doc_id")
    )
    toks = docs.select(
        "doc_id",
        "lang",
        F.explode(F.split(F.trim("text"), r"\s+")).alias("token"),
    )
    # ONE explode + ONE (doc, token) partial-agg shuffle; the model
    # derives from the compact per-doc counts (sum of k == raw count,
    # exactly), the same never-explode-twice shape as
    # text_bigram_perplexity. lang is per-doc constant so it rides the
    # grouping key for the conditional target count.
    per = (
        toks.groupBy("doc_id", "lang", "token")
        .agg(F.count(F.lit(1)).alias("k"))
        .persist()
    )
    model = per.groupBy("token").agg(
        F.sum("k").alias("cnt_raw"),
        F.coalesce(
            F.sum(F.when(F.col("lang") == "en", F.col("k"))), F.lit(0)
        ).alias("cnt_tgt"),
    )
    # scalar totals enter the plan as a 1-row broadcast cross join, not a
    # driver collect — the plan stays a single lazy DAG
    totals = model.agg(
        F.sum("cnt_raw").alias("tot_raw"),
        F.sum("cnt_tgt").alias("tot_tgt"),
        F.count(F.lit(1)).alias("vocab"),
    )
    log_ratio = F.log(
        (F.col("cnt_tgt") + 1).cast("double")
        / (F.col("tot_tgt") + F.col("vocab")).cast("double")
    ) - F.log(
        (F.col("cnt_raw") + 1).cast("double")
        / (F.col("tot_raw") + F.col("vocab")).cast("double")
    )
    terms = (
        per.join(F.broadcast(model), "token")
        .crossJoin(F.broadcast(totals))
        .select("doc_id", "k", (F.col("k") * log_ratio).alias("term"))
    )
    agg = terms.groupBy("doc_id").agg(
        F.sum("k").alias("n_tokens"), F.sum("term").alias("log_w")
    )
    return agg.select(
        "doc_id",
        F.col("n_tokens").cast("bigint").alias("n_tokens"),
        F.round("log_w", 6).alias("log_weight"),
        (F.col("log_w") > 0).alias("target_like"),
    )


SAMPLE_DSIR_SQL = """
WITH toks AS (
    SELECT doc_id, lang,
           UNNEST(string_split_regex(trim(text), '\\s+')) AS token
    FROM documents
), model AS (
    SELECT token, COUNT(*) AS cnt_raw,
           COUNT(*) FILTER (WHERE lang = 'en') AS cnt_tgt
    FROM toks GROUP BY token
), totals AS (
    SELECT SUM(cnt_raw) AS tot_raw, SUM(cnt_tgt) AS tot_tgt,
           COUNT(*) AS vocab
    FROM model
), terms AS (
    SELECT t.doc_id,
           ln(CAST(m.cnt_tgt + 1 AS DOUBLE)
              / CAST(x.tot_tgt + x.vocab AS DOUBLE))
           - ln(CAST(m.cnt_raw + 1 AS DOUBLE)
                / CAST(x.tot_raw + x.vocab AS DOUBLE)) AS lr
    FROM toks t JOIN model m USING (token), totals x
), agg AS (
    SELECT doc_id, COUNT(*) AS n_tokens, SUM(lr) AS log_w
    FROM terms GROUP BY doc_id
)
SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
       ROUND(log_w, 6) AS log_weight, log_w > 0 AS target_like
FROM agg
"""


def corpus_stats_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset card in one pass: per-(source, lang), per-source and
    corpus-total statistics — document count, characters, whitespace
    token estimate, min/max length — via GROUPING SETS over ONE scan
    (the rollup the mix-construction stage reads before setting rates).
    All-integer aggregates, so the oracle is exact."""
    docs = load_table(spark, sf_dir, "documents").select(
        "source",
        "lang",
        F.length("text").alias("n_chars"),
        F.size(F.split("text", " ")).alias("n_tokens"),
    )
    return (
        docs.rollup("source", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.sum("n_tokens").alias("total_tokens"),
            F.min("n_chars").alias("min_chars"),
            F.max("n_chars").alias("max_chars"),
        )
        .select(
            F.coalesce("source", F.lit("<all>")).alias("source"),
            F.coalesce("lang", F.lit("<all>")).alias("lang"),
            "n_docs",
            "total_chars",
            "total_tokens",
            "min_chars",
            "max_chars",
        )
    )


CORPUS_STATS_SQL = """
SELECT COALESCE(source, '<all>') AS source,
       COALESCE(lang, '<all>') AS lang,
       COUNT(*) AS n_docs,
       CAST(SUM(LENGTH(text)) AS BIGINT) AS total_chars,
       CAST(SUM(LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) + 1)
            AS BIGINT) AS total_tokens,
       MIN(LENGTH(text)) AS min_chars,
       MAX(LENGTH(text)) AS max_chars
FROM documents
GROUP BY ROLLUP (source, lang)
"""


QUERIES = {
    "corpus_stats_report": corpus_stats_report,
    "text_quality_score": text_quality_score,
    "text_chunk_split": text_chunk_split,
    "text_dedup_passages": text_dedup_passages,
    "text_commonness": text_commonness,
    "text_lang_id": text_lang_id,
    "text_token_count": text_token_count,
    "text_fingerprint": text_fingerprint,
    "text_pii_scrub": text_pii_scrub,
    "text_repetition_filter": text_repetition_filter,
    "text_filter_pipeline": text_filter_pipeline,
    "text_vocab_topk": text_vocab_topk,
    "text_tfidf_topterms": text_tfidf_topterms,
    "text_entropy_filter": text_entropy_filter,
    "text_bigram_perplexity": text_bigram_perplexity,
    "sample_dsir_weights": sample_dsir_weights,
}

ORACLE = {
    "corpus_stats_report": CORPUS_STATS_SQL,
    "text_commonness": TEXT_COMMONNESS_SQL,
    "text_chunk_split": TEXT_CHUNK_SQL,
    "text_dedup_passages": TEXT_DEDUP_PASSAGES_SQL,
    "text_filter_pipeline": TEXT_FILTER_PIPELINE_SQL,
    "text_pii_scrub": TEXT_PII_SCRUB_SQL,
    "text_repetition_filter": TEXT_REPETITION_SQL,
    "text_quality_score": TEXT_QUALITY_SQL,
    "text_lang_id": TEXT_LANG_ID_SQL,
    "text_token_count": TEXT_TOKEN_COUNT_SQL,
    "text_fingerprint": TEXT_FINGERPRINT_SQL,
    "text_vocab_topk": TEXT_VOCAB_SQL,
    "text_tfidf_topterms": TEXT_TFIDF_SQL,
    "text_entropy_filter": TEXT_ENTROPY_SQL,
    "text_bigram_perplexity": TEXT_BIGRAM_PPL_SQL,
    "sample_dsir_weights": SAMPLE_DSIR_SQL,
}
