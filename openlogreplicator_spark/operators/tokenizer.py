"""Tokenizer construction over the corpus — distributed BPE.

The missing stage of the training-data pipeline family: building the
tokenizer itself from the corpus (Sennrich et al. 2016, "Neural Machine
Translation of Rare Words with Subword Units" — the published BPE
algorithm). The scale shape matters more than the loop: the corpus is
scanned ONCE into a distinct word-frequency table (vocabulary-scale,
~10⁴-10⁵ rows no matter how many TB of text), and every merge round
operates on that small table — pair counting is a groupBy over it, the
argmax is a 1-row driver collect (model-scale, same discipline as the
IVF centroids), and the merge applies via one Arrow-batched pandas pass
over the word table, never the corpus.

`tokenizer_bpe_pairs` is the driver-checkable slice (round-0 pair
statistics, exact SQL oracle); `tokenizer_bpe_train` runs the full
merge loop and is parity-tested against a pure-Python reference
implementation of the published algorithm.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from openlogreplicator_spark.sources.tables import load_table

_TOPK = 20


def _word_freq(docs: DataFrame) -> DataFrame:
    """ONE corpus scan → distinct (word, n) frequency table. Everything
    downstream is vocabulary-scale."""
    return (
        docs.select(
            F.explode(
                F.split(F.lower(F.trim(F.col("text"))), r"\s+")
            ).alias("word")
        )
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def _adjacent_pairs(symbols_col):
    """Adjacent symbol pairs of an array column, one zipped pass."""
    n = F.size(symbols_col)
    return F.zip_with(
        F.slice(symbols_col, 1, F.greatest(n - 1, F.lit(0))),
        F.slice(symbols_col, 2, F.greatest(n - 1, F.lit(0))),
        lambda a, b: F.concat_ws(" ", a, b),
    )


def tokenizer_bpe_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-0 BPE statistics: the corpus's most frequent adjacent
    character pairs weighted by word frequency — the exact quantity the
    first merge maximizes. Top 20 by (count desc, pair asc), the
    deterministic tie-break the trainer uses."""
    wf = _word_freq(load_table(spark, sf_dir, "documents"))
    chars = F.split(F.col("word"), "")
    pairs = (
        wf.select("n", F.explode(_adjacent_pairs(chars)).alias("pair"))
        .groupBy("pair")
        .agg(F.sum("n").alias("count"))
    )
    return (
        pairs.select(
            F.replace(
                F.col("pair"), F.lit(" "), F.lit("")
            ).alias("pair"),
            "count",
        )
        .orderBy(F.desc("count"), F.asc("pair"))
        .limit(_TOPK)
    )


TOKENIZER_BPE_PAIRS_SQL = f"""
WITH words AS (
    SELECT UNNEST(string_split_regex(LOWER(TRIM(text)), '\\s+')) AS word
    FROM documents
),
wf AS (
    SELECT word, COUNT(*) AS n FROM words WHERE word <> '' GROUP BY word
),
pairs AS (
    SELECT UNNEST(list_transform(
               generate_series(1, length(word) - 1),
               i -> word[i] || word[i + 1])) AS pair,
           n
    FROM wf
)
SELECT pair, CAST(SUM(n) AS BIGINT) AS count
FROM pairs
GROUP BY pair
ORDER BY count DESC, pair ASC
LIMIT {_TOPK}
"""


def bpe_train(
    word_freq: DataFrame, n_merges: int = 20
) -> list[tuple[str, str, int]]:
    """The published BPE merge loop, distributed: each round counts
    adjacent pairs over the (persisted, vocabulary-scale) symbolized
    word table, collects the single best (count desc, pair asc) row,
    and applies the merge with one Arrow-batched pass. Returns the
    merge table [(left, right, count)] — the tokenizer artifact."""
    import pandas as pd

    # localCheckpoint, not persist: each round chains a mapInPandas onto
    # the previous round's frame, and without lineage TRUNCATION the
    # logical plan doubles per round — 20 rounds of accumulated lineage
    # OOM the driver just stringifying the tree. Checkpointing each
    # round's (vocabulary-scale) table materializes the blocks and cuts
    # the plan back to a leaf, the standard iterative-algorithm shape.
    cur = word_freq.select(
        F.split(F.col("word"), "").alias("sym"), "n"
    ).localCheckpoint(eager=True)
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        best = (
            cur.select(
                "n", F.explode(_adjacent_pairs(F.col("sym"))).alias("p")
            )
            .groupBy("p")
            .agg(F.sum("n").alias("c"))
            .orderBy(F.desc("c"), F.asc("p"))
            .limit(1)
            .collect()
        )
        if not best:
            break
        left, right = best[0]["p"].split(" ")
        count = int(best[0]["c"])
        merges.append((left, right, count))

        def apply_merge(pdf_iter, left=left, right=right):
            for pdf in pdf_iter:
                out = []
                for sym in pdf["sym"]:
                    sym = list(sym)
                    i, merged = 0, []
                    while i < len(sym):
                        if (
                            i + 1 < len(sym)
                            and sym[i] == left
                            and sym[i + 1] == right
                        ):
                            merged.append(left + right)
                            i += 2
                        else:
                            merged.append(sym[i])
                            i += 1
                    out.append(merged)
                yield pd.DataFrame({"sym": out, "n": pdf["n"]})

        cur = cur.mapInPandas(
            apply_merge, schema="sym array<string>, n long"
        ).localCheckpoint(eager=True)
    return merges


def bpe_train_py(
    word_freq: list[tuple[str, int]], n_merges: int = 20
) -> list[tuple[str, str, int]]:
    """Sequential reference implementation (Sennrich Algorithm 1) used
    as the parity oracle for :func:`bpe_train`."""
    vocab = {tuple(w): n for w, n in word_freq}
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for sym, n in vocab.items():
            for i in range(len(sym) - 1):
                counts[(sym[i], sym[i + 1])] = (
                    counts.get((sym[i], sym[i + 1]), 0) + n
                )
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        (left, right), count = best
        merges.append((left, right, count))
        new_vocab: dict[tuple, int] = {}
        for sym, n in vocab.items():
            i, merged = 0, []
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == left and sym[i + 1] == right:
                    merged.append(left + right)
                    i += 2
                else:
                    merged.append(sym[i])
                    i += 1
            new_vocab[tuple(merged)] = new_vocab.get(tuple(merged), 0) + n
        vocab = new_vocab
    return merges


def tokenizer_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The trained merge table as a DataFrame. Oracled EXACTLY: the
    DuckDB side replays the full iterative merge loop in one recursive
    CTE (single-row state carrying the vocabulary as a list; per step a
    LATERAL argmax over the pair statistics and a window-function
    island-parity pass that reproduces the published algorithm's
    left-to-right non-overlapping merge — overlapping runs like 'aaaa'
    included). Also parity-tested against the sequential reference
    implementation (bpe_train_py)."""
    wf = _word_freq(load_table(spark, sf_dir, "documents"))
    merges = bpe_train(wf, n_merges=_TOPK)
    return spark.createDataFrame(
        [(i, l, r, c) for i, (l, r, c) in enumerate(merges)],
        "rank int, left string, right string, count long",
    )


# the recursive-CTE BPE trainer. State = ONE row per step holding the
# whole (vocabulary-scale) word table as a LIST of (w, n) structs, with
# symbols joined by chr(31). Per step:
#  - `best`: adjacent-pair statistics over every symbol position
#    (overlapping positions counted, like the published algorithm) →
#    argmax by (count desc, "l r" asc — the trainer's tie-break);
#  - `merged`: the merge applied with EXACT left-to-right
#    non-overlapping semantics: candidate positions are grouped into
#    consecutive-run islands and a position is merged iff its offset in
#    the island is even (provably equal to the sequential scan), then
#    identical re-symbolized words re-aggregate.
# Recursion stops after _TOPK merges or when no pair remains (the
# LATERAL argmax returns no row).
TOKENIZER_BPE_TRAIN_SQL = f"""
WITH RECURSIVE wf AS (
    SELECT word, COUNT(*)::BIGINT AS n FROM (
        SELECT UNNEST(string_split_regex(LOWER(TRIM(text)), '\\s+')) AS word
        FROM documents
    ) WHERE word <> '' GROUP BY word
),
state(step, vocab, l, r, c) AS (
    SELECT 0,
           (SELECT LIST(struct_pack(
                w := array_to_string(
                    list_transform(generate_series(1, length(word)),
                                   i -> word[i]), chr(31)),
                n := n)) FROM wf),
           CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR),
           CAST(NULL AS BIGINT)
    UNION ALL
    SELECT step + 1, merged.vocab, best.l, best.r, best.c
    FROM state,
    LATERAL (
        SELECT sym[i] AS l, sym[i + 1] AS r, SUM(n)::BIGINT AS c
        FROM (SELECT string_split(u.w, chr(31)) AS sym, u.n
              FROM UNNEST(state.vocab) AS t(u)) sw,
             UNNEST(generate_series(1, len(sym) - 1)) AS g(i)
        GROUP BY 1, 2
        ORDER BY c DESC, l || ' ' || r ASC
        LIMIT 1
    ) best,
    LATERAL (
        SELECT LIST(struct_pack(w := w2, n := n2)) AS vocab
        FROM (
            SELECT new_w AS w2, SUM(n)::BIGINT AS n2 FROM (
                SELECT wid, ANY_VALUE(n) AS n,
                       STRING_AGG(out_sym, chr(31) ORDER BY i) AS new_w
                FROM (
                    SELECT wid, n, i,
                           CASE WHEN taken THEN best.l || best.r
                                WHEN COALESCE(LAG(taken) OVER (
                                    PARTITION BY wid ORDER BY i), FALSE)
                                    THEN NULL
                                ELSE s END AS out_sym
                    FROM (
                        SELECT wid, n, i, s,
                               cand AND ((i - MAX(CASE WHEN island_start
                                   THEN i END) OVER (
                                   PARTITION BY wid ORDER BY i)) % 2 = 0)
                                   AS taken
                        FROM (
                            SELECT wid, n, i, sym[i] AS s, cand,
                                   cand AND NOT COALESCE(
                                       LAG(cand) OVER (
                                           PARTITION BY wid ORDER BY i),
                                       FALSE) AS island_start
                            FROM (
                                SELECT u.w AS wid, u.n AS n,
                                       string_split(u.w, chr(31)) AS sym,
                                       g.i AS i,
                                       g.i < len(string_split(u.w, chr(31)))
                                       AND string_split(u.w, chr(31))[g.i]
                                           = best.l
                                       AND string_split(u.w, chr(31))[g.i+1]
                                           = best.r AS cand
                                FROM UNNEST(state.vocab) AS t(u),
                                     UNNEST(generate_series(1,
                                        len(string_split(u.w, chr(31)))))
                                        AS g(i)
                            )
                        )
                    )
                ) t_out
                WHERE out_sym IS NOT NULL
                GROUP BY wid
            )
            GROUP BY new_w
        )
    ) merged
    WHERE step < {_TOPK}
)
SELECT (step - 1)::INT AS rank, l AS left, r AS right, c AS count
FROM state WHERE step >= 1
"""


QUERIES = {
    "tokenizer_bpe_pairs": tokenizer_bpe_pairs,
    "tokenizer_bpe_train": tokenizer_bpe_train,
}

ORACLE = {
    "tokenizer_bpe_pairs": TOKENIZER_BPE_PAIRS_SQL,
    "tokenizer_bpe_train": TOKENIZER_BPE_TRAIN_SQL,
}
