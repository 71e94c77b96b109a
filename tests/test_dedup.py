"""Dedup semantics beyond the oracle hash-check."""

from __future__ import annotations

from openlogreplicator_spark.operators.dedup import (
    dedup_exact,
    dedup_minhash_lsh,
    dedup_ngram_jaccard,
)


def test_exact_dedup_survivors_are_originals(spark, sf_dir):
    rows = dedup_exact(spark, sf_dir).collect()
    assert rows, "synthetic re-crawl must produce duplicate groups"
    # survivor = min doc_id → always the original (copy ids are +1e6)
    assert all(r.survivor_id < 1_000_000 for r in rows)
    assert all(r.n_copies >= 2 for r in rows)


def test_minhash_finds_mutated_near_dups(spark, sf_dir):
    pairs = {(r.id_a, r.id_b) for r in dedup_minhash_lsh(spark, sf_dir).collect()}
    assert pairs, "mutated copies should collide in LSH buckets"
    # most candidate pairs should be (original, its mutated copy)
    mirrored = sum(1 for a, b in pairs if b - a == 1_000_000)
    assert mirrored / len(pairs) > 0.5


def test_ngram_jaccard_pairs_are_high_similarity(spark, sf_dir):
    rows = dedup_ngram_jaccard(spark, sf_dir).collect()
    assert rows
    assert all(r.jaccard >= 0.6 for r in rows)
    # a first-word mutation of an n-word doc keeps ~ (n-5)/(n+1) shingles
    assert any(r.id_b - r.id_a == 1_000_000 for r in rows)
