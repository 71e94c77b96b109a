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
    """The trained merge table as a DataFrame (rows-only query: the
    merge loop is iterative and not SQL-expressible; parity-tested
    against the sequential reference implementation)."""
    wf = _word_freq(load_table(spark, sf_dir, "documents"))
    merges = bpe_train(wf, n_merges=_TOPK)
    return spark.createDataFrame(
        [(i, l, r, c) for i, (l, r, c) in enumerate(merges)],
        "rank int, left string, right string, count long",
    )


QUERIES = {
    "tokenizer_bpe_pairs": tokenizer_bpe_pairs,
    "tokenizer_bpe_train": tokenizer_bpe_train,
}

ORACLE = {
    "tokenizer_bpe_pairs": TOKENIZER_BPE_PAIRS_SQL,
}
