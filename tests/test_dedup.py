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
    # precision guard: correlated seed hashes (e.g. the double-hashing
    # a + i*b scheme) inflate the estimator and flood the output with
    # false candidates — total pairs must stay near the true near-dup set
    n_docs = 500 if "0.01" in sf_dir or "0.001" in sf_dir else 5000
    assert len(pairs) < 3 * n_docs, (
        f"{len(pairs)} candidate pairs for {n_docs} docs — "
        "minhash seeds are probably not independent"
    )


def test_ngram_jaccard_pairs_are_high_similarity(spark, sf_dir):
    rows = dedup_ngram_jaccard(spark, sf_dir).collect()
    assert rows
    assert all(r.jaccard >= 0.6 for r in rows)
    # a first-word mutation of an n-word doc keeps ~ (n-5)/(n+1) shingles
    assert any(r.id_b - r.id_a == 1_000_000 for r in rows)
