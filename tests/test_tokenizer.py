"""Distributed BPE tokenizer construction: the Spark merge loop must
equal the sequential published algorithm (Sennrich et al. 2016,
Algorithm 1), including greedy left-to-right merge application and the
(count desc, pair asc) tie-break."""

from __future__ import annotations

from openlogreplicator_spark.operators.tokenizer import (
    _word_freq,
    bpe_train,
    bpe_train_py,
)
from openlogreplicator_spark.sources.tables import load_table


def test_bpe_sequential_overlapping_merge():
    # "aaaa": merge (a,a) applies greedily left-to-right → [aa, aa];
    # "aaa" → [aa, a]
    merges = bpe_train_py([("aaaa", 3), ("aaa", 2)], n_merges=2)
    assert merges[0] == ("a", "a", 3 * 3 + 2 * 2)
    # after round 1: aaaa=[aa,aa], aaa=[aa,a] → pairs (aa,aa):3, (aa,a):2
    assert merges[1] == ("aa", "aa", 3)


def test_bpe_tie_break_is_lexicographic():
    # "ab" and "cd" both appear 5 times → ties broken pair-ascending
    merges = bpe_train_py([("ab", 5), ("cd", 5)], n_merges=1)
    assert merges[0] == ("a", "b", 5)


def test_bpe_distributed_matches_sequential(spark):
    wf = _word_freq(load_table(spark, "/root/testdata/sf0.001", "documents"))
    dist = bpe_train(wf, n_merges=8)
    seq = bpe_train_py(
        [(r["word"], r["n"]) for r in wf.collect()], n_merges=8
    )
    assert dist == seq
    assert len(dist) == 8
    # merges must produce strictly growing tokens
    assert all(len(left + right) >= 2 for left, right, _ in dist)


def test_bpe_exhausts_gracefully(spark):
    # a vocab that runs out of pairs before n_merges
    df = spark.createDataFrame([("ab", 1)], "word string, n long")
    merges = bpe_train(df, n_merges=10)
    assert merges == [("a", "b", 1)]
